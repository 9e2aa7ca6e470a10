package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * environment) behind [[MediaCodec]], with a deterministic fake so the
  * Spark-side contract — schema, batching, partitioning, output shape — is
  * real and tested. At scale the decode runs inside `mapPartitions`
  * (one codec instance per partition, streamed row batches, no
  * driver-side collection), which is the Scala analogue of `mapInPandas`.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      media_id: Long,
      kind: String,          // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long]
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      feature: Array[Float]  // fixed-size feature vector
  )

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)
  ))

  /** Decode/feature-extract seam. Real implementations would wrap an image
    * or audio codec; the deterministic fake hashes payload bytes into a
    * fixed-size vector so tests can assert exact values.
    */
  trait MediaCodec extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** STUB codec — deterministic fake standing in for a real decoder. */
  object FakeCodec extends MediaCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          out(i % dim) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
      }
      out
    }
  }

  /** Batch feature extraction: one codec per partition, streamed rows.
    * Equivalent plumbing to a Pandas-UDF `mapInPandas` stage: the codec is
    * instantiated once per task, rows flow through without materializing
    * the partition, and the output schema is fixed and typed.
    */
  def extractFeatures(ds: Dataset[MediaRecord], codec: MediaCodec = FakeCodec,
                      dim: Int = 16): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(
          r.media_id, r.kind,
          if (r.payload == null) 0L else r.payload.length.toLong,
          codec.features(r.payload, dim))
      }
    }
  }

  /** Frame sampling plumbing for video rows: emit (media_id, frame_idx)
    * pairs for every nth frame — the row-explosion pattern a real frame
    * extractor would use, with deterministic frame counts from metadata.
    */
  def sampleFrames(df: DataFrame, everyMs: Long = 1000L): DataFrame =
    df.filter(col("kind") === "video" && col("duration_ms").isNotNull)
      .select(col("media_id"),
        explode(sequence(lit(0L), (col("duration_ms") / everyMs).cast("long"))).as("frame_idx"))

  /** Perceptual-hash seam: 64-bit difference hash (dHash) of a media
    * payload. A real implementation decodes, grayscales, and resamples
    * to a 9×8 grid; the STUB resamples the raw payload BYTES to the
    * same 9×8 grid (the [[resizeMedia]] subsample trick standing in for
    * the decode) — the dHash MATH over the grid, and everything
    * downstream of the hash, is the real thing.
    */
  trait PerceptualHasher extends Serializable {
    def phash(payload: Array[Byte]): Long
  }

  /** STUB hasher: payload bytes → 9×8 grid → genuine dHash (bit set
    * where grid(r, c) < grid(r, c+1), row-major over 8×8 comparisons).
    * Deterministic; an all-equal or empty grid hashes to 0L.
    */
  object FakePHash extends PerceptualHasher {
    def phash(payload: Array[Byte]): Long = {
      if (payload == null || payload.isEmpty) return 0L
      val grid = new Array[Int](72) // 9 wide × 8 tall
      val step = payload.length.toDouble / 72
      var i = 0
      while (i < 72) {
        grid(i) = payload(math.min((i * step).toInt, payload.length - 1)) & 0xff
        i += 1
      }
      var h = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (grid(r * 9 + c) < grid(r * 9 + c + 1)) h |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      h
    }
  }

  /** Per-media perceptual hashes: one codec-seam pass (per-task hasher
    * instance, streamed rows, payload bytes never reach the driver) →
    * (media_id, kind, phash). Null payloads are dropped — no decodable
    * content, and hashing them all to one value would manufacture a
    * giant false dup group.
    */
  def perceptualHashes(ds: Dataset[MediaRecord],
                       hasher: PerceptualHasher = FakePHash): DataFrame = {
    import ds.sparkSession.implicits._
    ds.filter((r: MediaRecord) => r.payload != null)
      .mapPartitions { rows =>
        rows.map(r => (r.media_id, r.kind, hasher.phash(r.payload)))
      }.toDF("media_id", "kind", "phash")
  }

  /** Perceptual near-duplicate pairs — the LAION-style image dedup
    * shape: media whose dHashes differ by ≤ `maxDist` bits. Candidate
    * generation is the [[graft.ext.Dedup.simhashNearDups]] banding:
    * four 16-bit chunks of the hash, self-join within equal chunks —
    * by pigeonhole any pair at hamming ≤ 3 agrees on at least one
    * chunk, so recall is EXACT at the default radius (maxDist > 3
    * weakens the guarantee; widen the bands to maxDist+1 pieces
    * before trusting it). The join carries (8-byte hash, id) only —
    * payloads stay in the narrow hashing pass.
    */
  def phashNearDups(ds: Dataset[MediaRecord], maxDist: Int = 3,
                    hasher: PerceptualHasher = FakePHash): DataFrame = {
    val sigs = perceptualHashes(ds, hasher)
    val chunked = sigs.select(
      col("media_id"), col("phash"),
      explode(sequence(lit(0), lit(3))).as("chunk")
    ).withColumn("chunk_val",
      expr("phash >> (chunk * 16)").bitwiseAND(0xFFFF))
    val a = chunked.as("a")
    val b = chunked.as("b")
    val hamming = bit_count(col("a.phash").bitwiseXOR(col("b.phash")))
    a.join(b,
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** A PLANTED near-dup media view of a document table: every document
    * whose payload (UTF-8 text bytes) is ≥ 72 bytes contributes its
    * original payload AND a copy (media_id shifted by `offset`) with
    * the low bit of byte 0 flipped. Payloads ≥ 72 bytes sample byte 0
    * into dHash grid cell 0 ALONE (grid(i) reads byte (i·len/72).toInt,
    * which is ≥ 1 for every i ≥ 1 once len ≥ 72), and grid cell 0
    * participates in exactly one row-major comparison — so each planted
    * pair sits at hamming ≤ 1, inside [[phashNearDups]]'s
    * pigeonhole-exact ≤ 3 radius, and EVERY planted pair must surface
    * (the recall assertion in CorpusAndSinksSpec). The deterministic
    * fixture generator behind the registered near-dup-pairs query:
    * real corpora carry their own near-dups; a synthetic table needs
    * them planted for the operator to have something to find.
    */
  def plantedNearDupMedia(docs: DataFrame, offset: Long = 10000000L): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
      .filter((r: MediaRecord) => r.payload != null && r.payload.length >= 72)
      .flatMap { r =>
        val p = r.payload.clone()
        p(0) = (p(0) ^ 0x01).toByte
        Seq(r, r.copy(media_id = r.media_id + offset, payload = p))
      }
  }

  // ------------------------------------------- audio fingerprint dedup

  /** Audio-fingerprint geometry (chromaprint/Haitsma-Kalker style),
    * `private[graft]` because the DuckDB oracle interpolates the SAME
    * values (one definition, no drift). A real pipeline fingerprints
    * decoded PCM band energies; the codec seam stands payload BYTES in
    * for samples (the [[FakePHash]] discipline) — the fingerprint MATH
    * (band-energy deltas across time and frequency, sign-bit
    * subfingerprints, windowed keys, inverted-index matching) is the
    * real thing end to end.
    */
  private[graft] val AudioFrameLen = 32      // bytes per frame
  private[graft] val AudioHop = 16           // frame hop (50% overlap)
  private[graft] val AudioBands = 8          // 4-byte energy bands
  private[graft] val AudioMaxBytes = 400     // prefix cap: <= 24 frames
                                             // (chromaprint fingerprints a prefix window too)
  private[graft] val AudioKeySubfps = 7      // subfingerprints per key (56-bit keys)
  private[graft] val AudioMinSharedKeys = 3  // match threshold (distinct keys)
  private[graft] val AudioKeyFreqCap = 64    // stop-key cap: drop corpus-hot keys
  private[graft] val AudioPlantShift = AudioHop // planted copies drop ONE hop
  private[graft] val AudioPlantMinBytes = 192   // >= 11 frames -> >= 4 keys
                                                // -> >= 3 shared after one hop

  /** The per-payload fingerprint-key kernel: frame the (prefix-capped)
    * byte stream, sum 8 band energies per frame, take the
    * Haitsma-Kalker sign bit of the time-delta of each adjacent-band
    * energy difference with the band ring CLOSED (band 7 compares
    * against band 0 — 8 bits per frame transition, the chromaprint
    * circular-filter shape), and slide a 7-subfingerprint window into
    * 56-bit keys held in a BIGINT. The r18/r19 100× probes taught the
    * geometry lesson in two steps: the 28-bit key census saturated at
    * replica scale, and a 32-bit lane-width bump alone barely moved
    * the accidental pair mass — on low-entropy text-as-PCM payloads
    * the 4-subfp sign patterns CONCENTRATE regardless of lane width,
    * so the fix is LONGER windows (more frames per key = more entropy
    * per key, the chromaprint production shape), measured ~linear
    * pair mass in the r19 ledger. Deterministic integer math only —
    * the DuckDB oracle replays it byte for byte from the same UTF-8
    * payload.
    */
  private[graft] def audioKeys(payload: Array[Byte]): Seq[Long] = {
    if (payload == null) return Nil
    val nBytes = math.min(payload.length, AudioMaxBytes)
    if (nBytes < AudioFrameLen) return Nil
    val nFrames = (nBytes - AudioFrameLen) / AudioHop + 1
    if (nFrames < 2) return Nil
    val bandW = AudioFrameLen / AudioBands
    val e = Array.ofDim[Int](nFrames, AudioBands)
    var f = 0
    while (f < nFrames) {
      var b = 0
      while (b < AudioBands) {
        var s = 0; var i = 0
        while (i < bandW) { s += payload(f * AudioHop + b * bandW + i) & 0xff; i += 1 }
        e(f)(b) = s; b += 1
      }
      f += 1
    }
    val fp = new Array[Int](nFrames) // fp(f) defined for f >= 1
    f = 1
    while (f < nFrames) {
      var v = 0; var b = 0
      while (b < AudioBands) {
        val b2 = (b + 1) % AudioBands // closed band ring: 8 bits/frame
        val d = (e(f)(b) - e(f)(b2)) - (e(f - 1)(b) - e(f - 1)(b2))
        if (d > 0) v |= 1 << b
        b += 1
      }
      fp(f) = v; f += 1
    }
    val nSub = nFrames - 1 // subfp indices 1..nFrames-1
    if (nSub < AudioKeySubfps) return Nil
    (1 to nSub - AudioKeySubfps + 1).map { s =>
      var key = 0L
      var j = 0
      while (j < AudioKeySubfps) {
        key = (key << 8) | fp(s + j).toLong
        j += 1
      }
      key
    }
  }

  /** Distinct (media_id, fp_key) fingerprint table — one codec-seam
    * pass (per-task kernel, streamed rows, payloads never reach the
    * driver), the inverted-index side of [[audioNearDupPairs]].
    */
  def audioFingerprintKeys(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.flatMap(r => audioKeys(r.payload).distinct.map(k => (r.media_id, k)))
    }.toDF("media_id", "fp_key").distinct()
  }

  /** Audio near-duplicate PAIRS — the chromaprint inverted-index
    * match: media sharing at least [[AudioMinSharedKeys]] DISTINCT
    * fingerprint keys (after dropping corpus-hot stop keys held by
    * more than [[AudioKeyFreqCap]] media — template content, the
    * classic inverted-index guard). A copy time-shifted by a whole
    * number of hops keeps every interior subfingerprint, so shifted
    * duplicates share nearly all keys and must surface; shifts OFF the
    * hop grid break frame alignment — the honest limitation of any
    * frame-hop fingerprint, which real systems absorb with small hops.
    *
    * Scale shape: the key table is |media| × ≤20 narrow rows; the
    * candidate join is keyed on fp_key (never all-pairs — exactly the
    * [[phashNearDups]] banding discipline), the stop-key cap bounds
    * per-key fan-out at AudioKeyFreqCap², and the pair aggregate is
    * one keyed exchange.
    */
  def audioNearDupPairs(ds: Dataset[MediaRecord],
                        minShared: Int = AudioMinSharedKeys): DataFrame = {
    // the key table is |media| x <=20 narrow rows and feeds BOTH the
    // stop-key census and the semi-joined pair sides — a lazy
    // localCheckpoint shares one fingerprint pass across the three
    // references (the substringExcised discipline)
    val keys = audioFingerprintKeys(ds).localCheckpoint(false)
    val kept = keys.groupBy(col("fp_key"))
      .agg(count(lit(1)).as("n_media"))
      .filter(col("n_media") <= AudioKeyFreqCap)
      .select(col("fp_key"))
    val k = keys.join(kept, Seq("fp_key"), "left_semi")
    val a = k.as("a")
    val b = k.as("b")
    a.join(b, col("a.fp_key") === col("b.fp_key") &&
        col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared_keys"))
      .filter(col("n_shared_keys") >= minShared)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** A PLANTED time-shifted audio view of a document table: every
    * document whose payload is at least [[AudioPlantMinBytes]] bytes
    * contributes its original payload AND a copy (media_id offset)
    * with the first [[AudioPlantShift]] bytes dropped — a shift of
    * exactly one hop, so the copy's frame f IS the original's frame
    * f+1 and the two share every interior fingerprint key (≥
    * AudioMinSharedKeys by the geometry bound in the scaladoc above;
    * the recall assertion lives in CorpusAndSinksSpec). The
    * deterministic fixture generator behind the registered query —
    * real corpora carry their own shifted dups; a synthetic table
    * needs them planted.
    */
  def plantedShiftedAudio(docs: DataFrame, offset: Long = 10000000L): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id").as("media_id"), lit("audio").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[MediaRecord]
      .filter((r: MediaRecord) => r.payload != null)
      .flatMap { r =>
        if (r.payload.length >= AudioPlantMinBytes)
          Seq(r, r.copy(media_id = r.media_id + offset,
            payload = r.payload.drop(AudioPlantShift)))
        else Seq(r) // short media stay in the corpus view un-planted
      }
  }

  /** Payload→payload transform seam (resize/transcode). The STUB
    * "resize" deterministically subsamples payload bytes to the target
    * budget and updates metadata — a real codec drops in behind the same
    * mapPartitions contract (per-task instance, streamed rows, typed
    * output; payload bytes never reach the driver).
    */
  def resizeMedia(ds: Dataset[MediaRecord], targetW: Int, targetH: Int,
                  bytesPerPixel: Int = 1): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    val budget = targetW * targetH * bytesPerPixel
    ds.mapPartitions { rows =>
      rows.map { r =>
        val p = r.payload
        if (p == null || p.length <= budget) r // pass-through keeps its true metadata
        else {
          val res = new Array[Byte](budget)
          val step = p.length.toDouble / budget
          var i = 0
          while (i < budget) { res(i) = p((i * step).toInt); i += 1 }
          // dimensions stamped only when the payload was actually resized,
          // preserving width*height*bytesPerPixel == payload.length
          r.copy(payload = res, width = Some(targetW), height = Some(targetH))
        }
      }
    }
  }
}
