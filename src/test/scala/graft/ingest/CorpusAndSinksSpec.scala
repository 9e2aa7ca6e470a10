package graft.ingest

import java.nio.file.Files
import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sinks.FileSinks
import graft.ext.Multimodal

/** S2/P7/A7 corpus ingest, K3–K5 file sinks, and the multimodal plumbing. */
class CorpusAndSinksSpec extends SparkTestBase {
  import spark.implicits._

  private val corpusDir = "/root/repo/src/test/resources/corpus"

  test("S2: wholetext scan yields one row per .txt with path-derived metadata") {
    val df = CorpusSource.wholeTextCorpus(spark, corpusDir)
    val rows = df.orderBy($"filename").collect()
    assert(rows.map(_.getAs[String]("filename")).toSeq ==
      Seq("doc1.txt", "doc2.txt", "doc3.txt"))
    assert(rows.map(_.getAs[String]("domain")).toSeq ==
      Seq("vanban", "vanban", "thongtu"))
    assert(rows.forall(_.getAs[String]("content").nonEmpty))
    // P7: the .md file in the corpus dir is excluded
    assert(!rows.exists(_.getAs[String]("filename").endsWith(".md")))
  }

  test("S2 content feeds the T3-T6 extractors (Vietnamese fixtures)") {
    val df = CorpusSource.wholeTextCorpus(spark, corpusDir)
    val meta = df.select(
        $"filename",
        graft.extract.TextExtract.mainCode($"content").as("main_code"),
        graft.extract.TextExtract.signer($"content").as("signer"))
      .orderBy($"filename").collect()
    assert(meta(0).getString(1) == "123/2023/QĐ-BCT")
    assert(meta(0).getString(2) == "KT. BỘ TRƯỞNG")
    assert(meta(1).isNullAt(1)) // doc2 has no code
    assert(meta(2).isNullAt(1) && meta(2).isNullAt(2)) // doc3 unstructured
  }

  test("A7: observe() ingest counters match the corpus") {
    val obs = Observation("ingest_test")
    val df = CorpusSource.withIngestCounters(
      CorpusSource.wholeTextCorpus(spark, corpusDir), obs)
    df.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("total_files") == 3L)
    assert(m("success_count") == 3L)
    assert(m("error_count") == 0L)
    assert(m("total_chars").asInstanceOf[Long] > 100L)
  }

  test("K4: links JSON sink round-trips") {
    val path = Files.createTempDirectory("links").toString + "/links"
    val links = Seq(("Doc A", "https://example.vn/a"), ("Doc B", "https://example.vn/b"))
      .toDF("name", "link")
    FileSinks.writeLinksJson(links, path)
    val back = spark.read.json(path).orderBy($"name").collect()
    assert(back.map(r => (r.getAs[String]("name"), r.getAs[String]("link"))).toSeq ==
      Seq(("Doc A", "https://example.vn/a"), ("Doc B", "https://example.vn/b")))
  }

  test("K5: per-doc text sink partitions by domain and preserves content") {
    val path = Files.createTempDirectory("docs").toString + "/docs"
    val docs = Seq(("a", "nội dung một"), ("a", "nội dung hai"), ("b", "ba"))
      .toDF("domain", "content")
    FileSinks.writeDocsText(docs, path)
    val back = spark.read.text(s"$path/domain=a").collect().map(_.getString(0)).toSet
    assert(back == Set("nội dung một", "nội dung hai"))
    assert(spark.read.text(s"$path/domain=b").count() == 1)
  }

  test("K3/J3: stats JSON sink round-trips nested map columns") {
    val path = Files.createTempDirectory("stats").toString + "/stats"
    val docs = Seq(("a", "aaaa"), ("b", "bb")).toDF("domain", "content")
    val stats = graft.streaming.StreamingStats.batchStats(docs, 1L)
    FileSinks.writeStatsJson(stats, path)
    val back = spark.read.json(path).collect().head
    assert(back.getAs[Long]("total_documents") == 2L)
    // map round-trips as a struct in JSON; both domain keys survive
    val domains = back.getAs[org.apache.spark.sql.Row]("domains")
    assert(domains.getAs[Long]("a") == 1L && domains.getAs[Long]("b") == 1L)
  }

  test("CSV source/sink round-trips quoted multiline Vietnamese content") {
    val path = Files.createTempDirectory("csv").toString + "/docs"
    val docs = Seq(
      ("a", "doc1", "nội dung, có dấu phẩy"),
      ("b", "doc2", "xuống\ndòng và \"nháy kép\""))
      .toDF("domain", "filename", "content")
    docs.write.option("header", "true").option("quoteAll", "true")
      .option("escape", "\"").csv(path)
    val back = spark.read.option("header", "true").option("multiLine", "true")
      .option("escape", "\"").csv(path)
      .orderBy($"filename").collect()
    assert(back.map(_.getAs[String]("content")).toSeq ==
      Seq("nội dung, có dấu phẩy", "xuống\ndòng và \"nháy kép\""))
  }

  test("ORC source/sink round-trips the document schema") {
    val path = Files.createTempDirectory("orc").toString + "/docs"
    val docs = Seq((1L, "văn bản một", "vanban"), (2L, "hai", "thongtu"))
      .toDF("doc_id", "text", "source")
    docs.write.orc(path)
    val back = spark.read.orc(path).orderBy($"doc_id").collect()
    assert(back.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((1L, "văn bản một", "vanban"), (2L, "hai", "thongtu")))
  }

  test("parquet schema merge unions evolved schemas across batches") {
    val path = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$path/batch=1")
    Seq((2L, 9.5)).toDF("id", "v2").write.parquet(s"$path/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "batch"))
    val rows = merged.orderBy($"id").collect()
    assert(rows(0).getAs[String]("v1") == "a" && rows(0).isNullAt(rows(0).fieldIndex("v2")))
    assert(rows(1).getAs[Double]("v2") == 9.5 && rows(1).isNullAt(rows(1).fieldIndex("v1")))
  }

  test("multimodal: fake codec features are deterministic, computed per partition") {
    import spark.implicits._
    val records = Seq(
      Multimodal.MediaRecord(1L, "image", Array[Byte](10, 20, 30), Some(2), Some(2), None),
      Multimodal.MediaRecord(2L, "audio", Array[Byte](-1, -1), None, None, Some(2000L)),
      Multimodal.MediaRecord(3L, "image", null, None, None, None)
    ).toDS().repartition(2)
    val feats = Multimodal.extractFeatures(records, dim = 4).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).n_bytes == 3L)
    assert(feats(1L).feature.toSeq == Seq(10 / 255.0f, 20 / 255.0f, 30 / 255.0f, 0.0f))
    assert(feats(2L).feature.toSeq == Seq(255 / 255.0f, 255 / 255.0f, 0.0f, 0.0f))
    assert(feats(3L).n_bytes == 0L && feats(3L).feature.forall(_ == 0.0f))
  }

  test("multimodal: phash near-dups catch perturbed payloads, not distinct ones") {
    import spark.implicits._
    val base = Array.tabulate(720)(i => ((i * 37) % 251).toByte)
    val nearCopy = base.clone(); nearCopy(100) = (nearCopy(100) + 3).toByte
    val distinct1 = Array.tabulate(720)(i => ((i * i + 13) % 240).toByte)
    def rec(id: Long, p: Array[Byte]) =
      Multimodal.MediaRecord(id, "image", p, None, None, None)
    val records = Seq(rec(1L, base), rec(2L, nearCopy), rec(3L, distinct1),
      rec(4L, null)).toDS().repartition(2)
    // hash properties: identical grids after subsample -> equal hashes;
    // null payloads dropped rather than hashed into one giant group
    val hashes = Multimodal.perceptualHashes(records).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L), "null payload must be dropped")
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(2L)) <= 3,
      "a one-byte perturbation must stay within the dup radius")
    assert(java.lang.Long.bitCount(hashes(1L) ^ hashes(3L)) > 3,
      "structurally different payloads must not collide")
    val pairs = Multimodal.phashNearDups(records).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"exactly the planted near-pair reports: $pairs")
    // dHash stub really is the difference hash: a monotone grid sets
    // every comparison bit, a constant grid none
    assert(Multimodal.FakePHash.phash(Array.tabulate(72)(_.toByte)) == -1L)
    assert(Multimodal.FakePHash.phash(Array.fill(72)(7.toByte)) == 0L)
  }

  test("multimodal: planted near-dup media surface as pairs (pigeonhole recall)") {
    import spark.implicits._
    // four docs with >= 72-byte texts (planted) and one short doc
    // (skipped: sub-72-byte payloads alias byte 0 into several grid
    // cells, voiding the hamming <= 1 construction)
    val docs = Seq(
      (1L, (1 to 40).map(i => s"alpha$i").mkString(" ")),
      (2L, (1 to 40).map(i => s"beta$i").mkString(" ")),
      (3L, "câu chữ " * 30),
      (4L, (1 to 80).map(i => ('a' + i % 26).toChar).mkString(" ")),
      (9L, "short")).toDF("doc_id", "text")
    val planted = Multimodal.plantedNearDupMedia(docs, offset = 1000L)
    assert(planted.count() == 8, "4 eligible docs, original + perturbed copy each")
    val pairs = Multimodal.phashNearDups(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // EVERY planted pair must surface: hamming <= 1 by construction,
    // and banding recall is pigeonhole-exact at radius <= 3
    for (id <- Seq(1L, 2L, 3L, 4L)) {
      val hit = pairs.find(p => p._1 == id && p._2 == id + 1000L)
      assert(hit.isDefined, s"planted pair ($id, ${id + 1000L}) missing: $pairs")
      assert(hit.get._3 <= 1L, s"planted pair must sit at hamming <= 1: $hit")
    }
    assert(!pairs.exists(p => p._1 == 9L || p._2 == 1009L),
      "sub-72-byte docs are not planted")
  }

  test("multimodal: dedup clusters co-cluster every planted copy with its original") {
    val got = graft.analytics.ExtraQueries.mediaDedupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    // every planted copy (id + 10000000) shares its original's cluster,
    // and cluster sizes count the full membership
    val copies = got.keys.filter(_ >= 10000000L)
    assert(copies.nonEmpty, "planted copies must be in the frontier")
    copies.foreach { c =>
      val orig = c - 10000000L
      assert(got(c)._1 == got(orig)._1, s"pair ($orig, $c) split across clusters")
      assert(got(c)._2 >= 2L, s"a planted pair's cluster has at least 2 members")
    }
    val bySize = got.values.groupBy(_._1).map { case (cl, ms) => cl -> ms.size }
    got.foreach { case (id, (cl, sz)) =>
      assert(sz == bySize(cl).toLong, s"cluster size mismatch at $id")
    }
  }

  test("multimodal: resize stub bounds payloads and updates metadata deterministically") {
    import spark.implicits._
    val big = Array.tabulate(100)(i => i.toByte)
    val records = Seq(
      Multimodal.MediaRecord(1L, "image", big, Some(10), Some(10), None),
      Multimodal.MediaRecord(2L, "image", Array[Byte](1, 2), Some(2), Some(1), None),
      Multimodal.MediaRecord(3L, "image", null, None, None, None)
    ).toDS()
    val resized = Multimodal.resizeMedia(records, targetW = 4, targetH = 4)
      .collect().map(r => r.media_id -> r).toMap
    assert(resized(1L).payload.length == 16 && resized(1L).width.contains(4))
    // subsampling is deterministic: byte i comes from position floor(i*step)
    assert(resized(1L).payload.toSeq == (0 until 16).map(i => big((i * 6.25).toInt)))
    // pass-through rows keep their TRUE metadata, not fabricated dims
    assert(resized(2L).payload.toSeq == Seq[Byte](1, 2), "small payloads pass through")
    assert(resized(2L).width.contains(2) && resized(2L).height.contains(1))
    assert(resized(3L).payload == null && resized(3L).width.isEmpty)
  }

  test("multimodal: frame sampling explodes every nth frame for videos only") {
    val df = Seq(
      (1L, "video", 3500L), (2L, "image", 0L), (3L, "video", 999L)
    ).toDF("media_id", "kind", "duration_ms")
      .withColumn("duration_ms", when($"kind" === "video", $"duration_ms"))
    val frames = Multimodal.sampleFrames(df, everyMs = 1000L)
      .groupBy($"media_id").agg(count(lit(1)).as("n"), max($"frame_idx").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(frames(1L) == ((4L, 3L))) // frames 0..3 for 3.5s at 1s sampling
    assert(frames(3L) == ((1L, 0L)))
    assert(!frames.contains(2L)) // images produce no frames
  }

  test("multimodal: audio fingerprints — planted one-hop-shifted copies all surface") {
    import spark.implicits._
    // varied-content docs >= 160 bytes (planted) plus one short doc
    val docs = Seq(
      (1L, (1 to 60).map(i => s"alpha$i word$i").mkString(" ")),
      (2L, (1 to 60).map(i => s"beta${i * 7} tok${i % 13}").mkString(" ")),
      (3L, (1 to 40).map(i => s"nội_dung$i câu${i * 3}").mkString(" ")),
      // NOTE a perfectly PERIODIC text would collapse to too few
      // distinct key values to clear MinSharedKeys — the documented
      // repetitive-content caveat of any windowed fingerprint (the
      // kernel test below pins the degenerate uniform case)
      (9L, "short doc")).toDF("doc_id", "text")
    val planted = Multimodal.plantedShiftedAudio(docs, offset = 1000L)
    assert(planted.count() == 7, "3 long docs planted, short doc un-planted")
    val pairs = Multimodal.audioNearDupPairs(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every planted (original, one-hop copy) shares >= MinSharedKeys
    // interior fingerprint keys by the frame-alignment geometry
    for (id <- Seq(1L, 2L, 3L)) {
      val hit = pairs.find(p => p._1 == id && p._2 == id + 1000L)
      assert(hit.isDefined, s"planted shifted pair ($id, ${id + 1000L}) missing: $pairs")
      assert(hit.get._3 >= Multimodal.AudioMinSharedKeys.toLong)
    }
    assert(!pairs.exists(p => p._1 == 9L || p._2 == 1009L), "short docs are not planted")
  }

  test("multimodal: audio fingerprint kernel — shift by one hop drops exactly the boundary keys") {
    val payload = (1 to 500).map(i => ((i * 37 + i / 3) % 251).toByte).toArray
    val orig = Multimodal.audioKeys(payload).toSet
    val shifted = Multimodal.audioKeys(payload.drop(Multimodal.AudioPlantShift)).toSet
    // shifted keys are (almost) a subset: each shifted key equals the
    // original key one window later; only the final window (computed
    // from frames past the original's prefix cap) can be new
    assert((shifted -- orig).size <= 1, s"${(shifted -- orig).size} non-inherited keys")
    assert(shifted.intersect(orig).size >= Multimodal.AudioMinSharedKeys)
    // sub-frame payloads and nulls produce no keys, never throw
    assert(Multimodal.audioKeys(null) == Nil)
    assert(Multimodal.audioKeys(Array.fill(10)(1.toByte)) == Nil)
    // uniform content collapses every subfingerprint to zero -> 1 key value
    assert(Multimodal.audioKeys(Array.fill(300)(42.toByte)).distinct == Seq(0))
  }

}
