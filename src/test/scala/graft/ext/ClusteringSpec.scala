package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Distributed k-means: planted-cluster recovery, inertia monotonicity,
  * determinism, empty-cell behavior.
  */
class ClusteringSpec extends SparkTestBase {
  import spark.implicits._

  /** Three well-separated planted clusters in 4-d: centers at 0, 10, 20
    * on the first axis, members jittered by ±0.5 on the second axis.
    * vec_ids are interleaved so the deterministic init (3 smallest ids)
    * starts with one vector of each cluster.
    */
  private def planted(): org.apache.spark.sql.DataFrame = {
    val rows = for {
      c <- 0 until 3
      j <- 0 until 8
    } yield {
      val base = c * 10.0f
      (j.toLong * 3 + c, Array(base, j * 0.1f - 0.4f, 1.0f, 0.0f))
    }
    rows.toDF("vec_id", "embedding")
  }

  /** Micro-int centroids back to embedding units for the shared
    * assignment UDF (1e-6 quantization is far below the planted
    * separation, so assignments are unaffected).
    */
  private def toDouble(cents: Array[Array[Long]]): Array[Array[Double]] =
    cents.map(_.map(_ / 1e6))

  private def assign(df: org.apache.spark.sql.DataFrame,
                     cents: Array[Array[Long]]): Map[Long, Int] =
    df.select(col("vec_id"),
        Similarity.ivfCellUdf(toDouble(cents))(col("embedding")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("kmeans recovers planted well-separated clusters exactly") {
    val df = planted()
    val cents = Clustering.kmeansCentroids(df, k = 3, iters = 4)
    val cells = assign(df, cents)
    // every planted cluster maps to exactly one cell, bijectively
    val byPlanted = cells.groupBy { case (id, _) => (id % 3).toInt }
      .view.mapValues(_.values.toSet).toMap
    byPlanted.foreach { case (pc, cellSet) =>
      assert(cellSet.size == 1, s"planted cluster $pc split across $cellSet")
    }
    assert(byPlanted.values.flatten.toSet.size == 3, "clusters merged")
    // converged centroids sit at the planted centers on axis 0
    val axis0 = cents.map(_(0) / 1e6).sorted
    Seq(0.0, 10.0, 20.0).zip(axis0).foreach { case (want, got) =>
      assert(math.abs(want - got) < 0.01, s"centroid at $got, want $want")
    }
  }

  test("kmeans inertia is non-increasing over iterations") {
    val df = planted()
    def inertia(iters: Int): Double = {
      val cents = toDouble(Clustering.kmeansCentroids(df, k = 3, iters = iters))
      df.select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
        .map { v =>
          cents.map { c =>
            v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          }.min
        }.sum
    }
    val seq = (0 to 3).map(inertia)
    seq.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia increased: $seq")
    }
  }

  test("kmeans is deterministic and empty cells keep their centroid") {
    val df = planted()
    val a = Clustering.kmeansCentroids(df, k = 3, iters = 3)
    val b = Clustering.kmeansCentroids(df, k = 3, iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "nondeterministic fit")
    // duplicate points: k=4 over 3 distinct locations — at least one
    // cell ends empty (argmin ties go to the lower cell) and must keep
    // a finite centroid rather than NaN out
    val dup = Seq(
      (0L, Array(0f, 0f)), (1L, Array(0f, 0f)),
      (2L, Array(5f, 0f)), (3L, Array(9f, 0f)))
      .toDF("vec_id", "embedding")
    val cents = Clustering.kmeansCentroids(dup, k = 4, iters = 3)
    assert(cents.length == 4)
    // integer centroids cannot NaN — assert they stay in the coordinate
    // envelope of the data instead (an empty cell inherits, not zeros out)
    cents.foreach(c => c.foreach(x => assert(math.abs(x) <= 9L * 1000000L)))
  }

  test("cluster prune: drop counts are exact per-cluster floors, cut below mean tail") {
    val out = Clustering.clusterPrune(spark, sfDir, k = 4, iters = 2, dropFrac = 0.25)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, dropped) = (r.getLong(1), r.getLong(2))
      assert(dropped == math.floor(0.25 * n).toLong,
        s"cluster ${r.getInt(0)}: dropped $dropped of $n != floor(0.25n)")
      // the cut distance (max dropped d2) cannot exceed the cluster mean
      // by construction only when dropFrac <= 0.5 and the distribution
      // is not degenerate — assert the weaker invariant cut <= max
      if (dropped > 0) assert(r.getDouble(3) <= r.getDouble(4) * 4 + 1e-6)
    }
    val total = out.map(_.getLong(1)).sum
    val nVecs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull).count()
    assert(total == nVecs)
  }

  test("cluster prune: dropFrac 0 drops nothing, dropFrac 1 drops everything") {
    val none = Clustering.clusterPrune(spark, sfDir, k = 3, iters = 1, dropFrac = 0.0)
      .collect()
    assert(none.forall(_.getLong(2) == 0L))
    val all = Clustering.clusterPrune(spark, sfDir, k = 3, iters = 1, dropFrac = 1.0)
      .collect()
    all.foreach(r => assert(r.getLong(2) == r.getLong(1)))
  }

  test("kmeansStats on the fixture: all vectors accounted for, inertia consistent") {
    val out = Clustering.kmeansStats(spark, sfDir, k = 4, iters = 2).collect()
    assert(out.nonEmpty && out.length <= 4)
    val total = out.map(_.getLong(1)).sum
    val nVecs = graft.Tables.embeddings(spark, sfDir)
      .filter(col("embedding").isNotNull).count()
    assert(total == nVecs, s"assigned $total of $nVecs vectors")
    out.foreach { r =>
      val (n, inertia, mean) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(inertia >= 0 && mean >= 0)
      assert(math.abs(inertia / n - mean) < 1e-4,
        "mean_sq_dist must equal inertia / n_vectors")
    }
  }
}
