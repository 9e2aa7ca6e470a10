package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Link-graph analytics: exactness of the integer PageRank recurrence
  * (against an independent driver-side replay), the dangling-mass path,
  * partition invariance, the contiguity assumption the edge derivation
  * rests on, and plan shape.
  */
class GraphSpec extends SparkTestBase {

  private def docs = graft.Tables.documents(spark, sfDir)

  /** The ONE planted 10-doc graph every replay test runs on: hub-linked
    * alpha/beta/gamma corpus plus doc 9 ("solo", a single token — no
    * bigrams, no out-edges, the dangling node). Shared so the ground
    * truth cannot drift between the five tests that replay it.
    */
  private def plantedDocs = {
    import spark.implicits._
    Seq(
      0L -> "alpha beta gamma delta", 1L -> "beta gamma epsilon zeta",
      2L -> "gamma delta alpha beta", 3L -> "zeta eta theta iota",
      4L -> "iota kappa alpha gamma", 5L -> "kappa lambda mu nu",
      6L -> "mu nu alpha beta gamma", 7L -> "nu xi omicron pi",
      8L -> "pi rho alpha delta",     9L -> "solo"
    ).toDF("doc_id", "text")
  }

  test("doc_id frontier is contiguous [0, D) — the md5-mod edge targets rely on it") {
    val r = docs.agg(count(lit(1)).as("n"), min(col("doc_id")).as("mn"),
      max(col("doc_id")).as("mx"),
      countDistinct(col("doc_id")).as("nd")).head()
    assert(r.getLong(1) == 0L && r.getLong(2) == r.getLong(0) - 1 &&
      r.getLong(3) == r.getLong(0),
      s"doc_id not contiguous: $r — Graph.linkEdgesDf's mod-D targets would dangle")
  }

  test("pagerank matches an exact driver-side replay on a planted graph with a dangling node") {
    import spark.implicits._
    // doc 9 is a single token: no bigrams → no out-edges → dangling
    val fixture = plantedDocs
    val d = fixture.count()
    val edges = Graph.linkEdgesDf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    assert(!outDeg.contains(9L), "doc 9 must be dangling (no out-edges)")

    def snap(x: Double): Long = math.floor(x + 0.5).toLong
    var r = (0L until d).map(i => i -> snap(1e9 / d)).toMap
    for (_ <- 1 to 4) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => snap(r(e._1).toDouble / outDeg(e._1))).sum
      }
      val dang = r.collect { case (u, ru) if !outDeg.contains(u) => ru }.sum
      r = r.map { case (v, _) =>
        v -> (snap((1.0 - 0.85) * 1e9 / d) +
          snap(0.85 * (contrib.getOrElse(v, 0L) + snap(dang.toDouble / d)).toDouble))
      }
    }
    val got = Graph.pagerankDf(fixture, iters = 4, topK = 10).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got == r, s"spark=$got replay=$r")
    // the dangling node's mass was redistributed, not dropped
    assert(math.abs(r.values.sum - 1000000000L) < 1000000L,
      s"mass not conserved: ${r.values.sum}")
  }

  test("pagerank on fixture data: mass conserved, hubs outrank the base") {
    val n = docs.count().toInt
    val all = Graph.pagerankDf(graft.Tables.documents(spark, sfDir), 4, n).collect()
    assert(all.length == n)
    val total = all.map(_.getLong(1)).sum
    // snapping loses/gains < 0.5 nano per edge contribution per round
    assert(math.abs(total - 1000000000L) < 2000000L, s"mass drifted: $total")
    val byRank = all.sortBy(-_.getLong(1))
    val topInDeg = all.map(_.getLong(3)).max
    assert(byRank.head.getLong(3) > 0, "top-ranked page should have in-links")
    assert(topInDeg > 10, s"hub skew missing: max in_deg $topInDeg")
    // nodes with no in-links sit at the base rank floor
    val base = all.filter(_.getLong(3) == 0).map(_.getLong(1))
    if (base.nonEmpty)
      assert(base.distinct.length == 1 && base.head < byRank.head.getLong(1))
  }

  test("pagerank is partition-invariant (the integer-aggregate discipline)") {
    val a = Graph.pagerankDf(docs.repartition(1), 3, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = Graph.pagerankDf(docs.repartition(7), 3, 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("degrees: out_deg sums to |E| and equals in_deg total; zero-filled nodes present") {
    val deg = Graph.linkGraphDegreesDf(docs).collect()
    val nEdges = Graph.linkEdgesDf(docs).count()
    assert(deg.map(_.getLong(1)).sum == nEdges)
    assert(deg.map(_.getLong(2)).sum == nEdges)
    assert(deg.length == docs.count())
  }

  test("trustrank matches an exact driver-side replay (seeded teleport + dangling-to-seeds)") {
    import spark.implicits._
    val fixture = plantedDocs
    val seeds = (0L to 9L).filter(_ % 2 == 0).toSet // doc 9 (dangling) is NOT a seed
    val edges = Graph.linkEdgesDf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val outDeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    def snap(x: Double): Long = math.floor(x + 0.5).toLong
    val nS = seeds.size
    var r = (0L until 10L).map(i =>
      i -> (if (seeds(i)) snap(1e9 / nS) else 0L)).toMap
    for (_ <- 1 to 4) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.filter(e => outDeg.contains(e._1))
          .map(e => snap(r(e._1).toDouble / outDeg(e._1))).sum
      }
      val dang = r.collect { case (u, ru) if !outDeg.contains(u) => ru }.sum
      r = r.map { case (v, _) =>
        val sv = if (seeds(v)) 1L else 0L
        v -> (sv * snap((1.0 - 0.85) * 1e9 / nS) +
          snap(0.85 * (contrib.getOrElse(v, 0L) + sv * snap(dang.toDouble / nS)).toDouble))
      }
    }
    val got = Graph.trustrankDf(fixture, col("doc_id") % 2 === 0, 4, 10).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got == r, s"spark=$got replay=$r")
  }

  test("trustrank refuses an empty seed set loudly") {
    // the guard is IN-PLAN since r16 (raise_error on the broadcast
    // seed-count frame) — it fires at the r0 checkpoint
    // materialization inside the eager builder, surfacing as a Spark
    // job failure whose cause chain carries the message
    val e = intercept[Exception] {
      Graph.trustrankDf(docs, col("source") === lit("no_such_source"), 2, 10)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("seed set is empty"), msgs)
  }

  test("trustrank with the full frontier as seeds IS pagerank") {
    val pr = Graph.pagerankDf(docs, 3, 50).collect().map(_.toSeq)
    val tr = Graph.trustrankDf(docs, lit(true), 3, 50).collect()
      .map(r => Seq(r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(pr.toSeq == tr.toSeq)
  }

  test("edge derivation invariants hold across corpus shapes") {
    import spark.implicits._
    // single-token docs (no bigrams), empty strings, duplicate texts,
    // and a normal mix — the shapes a real crawl hands the deriver
    val shapes = Seq(
      Seq(0L -> "one", 1L -> "two", 2L -> "three"),
      Seq(0L -> "", 1L -> "a b c", 2L -> "a b c", 3L -> "x"),
      (0L to 19L).map(i => i -> s"w$i common w${i + 1} common tail")
    )
    for (docs <- shapes) {
      val df = docs.toDF("doc_id", "text")
      val d = docs.length
      val edges = Graph.linkEdgesDf(df).collect().map(r => (r.getLong(0), r.getLong(1)))
      // all targets inside the frontier, no self loops, no duplicates
      assert(edges.forall { case (s, t) => t >= 0 && t < d && s != t },
        s"edge out of frontier or self-loop: ${edges.toSeq}")
      assert(edges.distinct.length == edges.length)
      // derivation is deterministic across partitionings
      val again = Graph.linkEdgesDf(df.repartition(5)).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(edges.toSet == again.toSet)
      // degree table covers the whole frontier and balances
      val deg = Graph.linkGraphDegreesDf(df).collect()
      assert(deg.length == d)
      assert(deg.map(_.getLong(1)).sum == edges.length)
      assert(deg.map(_.getLong(2)).sum == edges.length)
    }
  }

  test("pagerank convergence audit: movement decays monotonically to near-fixpoint") {
    val rows = Graph.pagerankConvergenceDf(spark, docs, iters = 4).collect()
    assert(rows.length == 4)
    val l1 = rows.map(_.getLong(1))
    assert(l1.zip(l1.tail).forall { case (a, b) => b < a },
      s"L1 movement not decaying: ${l1.toSeq}")
    // after 4 rounds on the hub-skewed fixture the residual movement is
    // a tiny fraction of the 1e9 total mass
    assert(l1.last < 20000000L, s"still moving after 4 iters: ${l1.last}")
    assert(rows.map(_.getLong(2)).last <= l1.last)
  }

  test("random walks follow real edges, elect the md5-argmin hop, and end at dead ends") {
    import spark.implicits._
    val fixture = plantedDocs
    val edges = Graph.linkEdgesDf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bySrc = edges.groupBy(_._1)
    val walks = Graph.randomWalksDf(fixture, steps = 3, seeds = 2, startEvery = 1)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
    val byWalk = walks.groupBy(_._1).map { case (w, rs) =>
      w -> rs.sortBy(_._2).map(_._3).toSeq }
    // every walk starts at its start node and every hop is a real edge,
    // specifically the md5-argmin one
    def h(seed: Long, start: Long, step: Int, src: Long, dst: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"$seed:$start:$step:$src:$dst".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    for (((start, seed), path) <- byWalk) {
      assert(path.head == start)
      for (i <- 1 until path.length) {
        val (src, dst) = (path(i - 1), path(i))
        assert(edges.contains((src, dst)), s"walk used a non-edge $src->$dst")
        val expected = bySrc(src).minBy(e => h(seed, start, i, src, e._2))._2
        assert(dst == expected, s"hop $i of ($start,$seed) not the argmin")
      }
      // a full walk has steps+1 nodes unless it hit a dead end
      if (path.length < 4)
        assert(!bySrc.contains(path.last), "walk ended early without a dead end")
    }
    // the dangling solo doc walks only step 0
    assert(byWalk((9L, 1L)) == Seq(9L) && byWalk((9L, 2L)) == Seq(9L))
    // and the two seeds actually diverge somewhere
    assert(byWalk.keys.filter(_._2 == 1L).exists(k =>
      byWalk.get((k._1, 2L)).exists(_ != byWalk(k))),
      "both seeds produced identical walks everywhere")
  }

  test("hits matches an exact driver-side replay on the planted graph") {
    import spark.implicits._
    val fixture = plantedDocs
    val edges = Graph.linkEdgesDf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def snap(x: Double): Long = math.floor(x + 0.5).toLong
    var auth = (0L to 9L).map(_ -> 1000000L).toMap
    var hub = (0L to 9L).map(_ -> 1000000L).toMap
    for (_ <- 1 to 4) {
      val aRaw = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => hub(e._1)).sum }
      val aMax = aRaw.values.max
      val aN = aRaw.map { case (d, v) => d -> snap(v.toDouble / aMax * 1e6) }
      val hRaw = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => aN.getOrElse(e._2, 0L)).sum }
      val hMax = hRaw.values.max
      val hN = hRaw.map { case (s, v) => s -> snap(v.toDouble / hMax * 1e6) }
      auth = (0L to 9L).map(i => i -> aN.getOrElse(i, 0L)).toMap
      hub = (0L to 9L).map(i => i -> hN.getOrElse(i, 0L)).toMap
    }
    val got = Graph.hitsDf(fixture, iters = 4, topK = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = (0L to 9L).map(i => i -> (auth(i), hub(i))).toMap
    assert(got == expected, s"spark=$got replay=$expected")
    // the dangling solo doc is no hub; the best authority is max-normalized to 1e6
    assert(hub(9L) == 0L)
    assert(got.values.map(_._1).max == 1000000L)
  }

  test("linkComponents matches a driver-side union-find on the planted graph") {
    import spark.implicits._
    val fixture = plantedDocs
    val edges = Graph.linkEdgesDf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map((0L to 9L).map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0L to 9L).map { i =>
      // path-compress to the component minimum
      var r = find(i)
      i -> r
    }.toMap
    val sizes = expected.values.groupBy(identity).map { case (c, vs) => c -> vs.size.toLong }
    val got = Graph.linkComponentsDf(fixture, rounds = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected.map { case (d, c) => d -> (c, sizes(c)) },
      s"got=$got expected labels=$expected sizes=$sizes")
  }

  test("linkComponents converged at fixture scale (one more round is a fixpoint)") {
    val a = Graph.linkComponentsDf(docs, rounds = 8).collect().map(_.toSeq).toSeq
    val b = Graph.linkComponentsDf(docs, rounds = 9).collect().map(_.toSeq).toSeq
    assert(a == b, "label propagation had not converged after 8 rounds")
    // every component is labelled by its own minimum doc_id
    val byComp = a.groupBy(_(1).asInstanceOf[Long])
    for ((c, rows) <- byComp)
      assert(rows.map(_(0).asInstanceOf[Long]).min == c)
  }

  test("rank loop is broadcast-independent (the at-scale SMJ regime computes identical ranks)") {
    // locally the doc_id-keyed state joins broadcast; at 1e11 nodes they
    // are sort-merge joins — the integer exactness claim must not
    // depend on the join strategy
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    val normal = Graph.pagerankDf(docs, 3, 50).collect().map(_.toSeq).toSeq
    try {
      spark.conf.set(key, "-1")
      val smj = Graph.pagerankDf(docs, 3, 50).collect().map(_.toSeq).toSeq
      assert(smj == normal, "ranks changed under the no-broadcast regime")
    } finally spark.conf.set(key, prev)
  }

  test("plan shape: no cartesian products; degree query stays within its exchange budget") {
    def plan(q: String): String =
      graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
    val pd = plan("q_link_graph_degrees")
    assert(!pd.contains("CartesianProduct"), s"cartesian in degrees:\n$pd")
    // SinglePartition exchanges are 1-row scalar aggregates (the
    // frontier count), not data shuffles — excluded like round-robin
    def keyedExchanges(p: String): Int = p.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange")
        && !l.contains("Reused") && !l.contains("RoundRobinPartitioning")
        && !l.contains("SinglePartition"))
    // the corpus-sized distinct(src,dst) exchange must appear exactly
    // once (degrees come from ONE unpivoted aggregation — a second copy
    // means the edge subtree is being re-evaluated)
    val distincts = pd.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(src") && l.contains("dst"))
    assert(distincts == 1, s"edge subtree evaluated $distincts times:\n$pd")
    // + groupBy(node) + final sort (the node join broadcasts at fixture
    // scale; at 100 TB it is one more doc_id-keyed pair)
    val keyed = keyedExchanges(pd)
    assert(keyed <= 4, s"degree exchanges regressed ($keyed):\n$pd")
    // pagerank's final frame reads checkpointed per-iteration state —
    // only the in-degree join + top-K sort may shuffle
    val pp = plan("q_pagerank")
    assert(!pp.contains("CartesianProduct"), s"cartesian in pagerank:\n$pp")
    val pKeyed = keyedExchanges(pp)
    assert(pKeyed <= 3, s"pagerank final-frame exchanges regressed ($pKeyed):\n$pp")
  }

  test("personalized pagerank specializes to vanilla pagerank and trustrank") {
    val docs = plantedDocs
    // topic = everything -> the vanilla recurrence term for term
    val vanilla = Graph.pagerankDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val pprAll = Graph.personalizedPagerankDf(docs, lit(true)).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("rank_nano"))).toMap
    assert(pprAll == vanilla)
    // topic = a seed predicate -> trustrank IS personalized pagerank
    val seed = col("doc_id") % 2 === 0
    val tr = Graph.trustrankDf(docs, seed).collect().map(_.toSeq).toSet
    val ppr = Graph.personalizedPagerankDf(docs, seed).collect().map(_.toSeq).toSet
    assert(ppr == tr)
  }

  test("sccDf labels a planted cycle-vs-path graph exactly (SCC != WCC)") {
    import spark.implicits._
    // 1 -> 2 -> 3 -> 1 (a 3-cycle), 0 -> 1 (tendril in), 3 -> 4 (tendril
    // out), 5 isolated: one weak component {0..4} + {5}, but five SCCs
    val nodes = (0L to 5L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (0L, 1L), (3L, 4L))
      .toDF("src", "dst").localCheckpoint()
    val out = Graph.sccDf(nodes, edges).collect()
      .map(r => r.getLong(1) -> (r.getLong(0), r.getLong(2)))
    val byDoc = out.map { case (scc, (doc, size)) => doc -> (scc, size) }.toMap
    assert(byDoc(1L) == (1L, 3L) && byDoc(2L) == (1L, 3L) && byDoc(3L) == (1L, 3L),
      s"cycle must collapse to SCC 1: $byDoc")
    assert(byDoc(0L) == (0L, 1L) && byDoc(4L) == (4L, 1L) && byDoc(5L) == (5L, 1L),
      s"tendrils/isolated stay singletons: $byDoc")
  }

  test("sccDf: a smaller foreign root must not shadow a node's own root (min-shadowing)") {
    import spark.implicits._
    // SCC {5,6,7} (5->7->6->5) and SCC {3,4} (3->4->3), plus the trap
    // edge 7->4: node 4 confirms into SCC(3) in round 1, node 6 into
    // SCC(5); in round 2 node 7 sees successor blabels {3 (via 4),
    // 5 (via 6)} — a pre-gate MIN picks 3 ≠ flabel(7) = 5 and 7 would
    // never confirm, ending a singleton. The pair-gated backward round
    // must confirm 7 into SCC 5.
    val nodes = Seq(3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val edges = Seq((5L, 7L), (7L, 6L), (6L, 5L), (3L, 4L), (4L, 3L), (7L, 4L))
      .toDF("src", "dst").localCheckpoint()
    val byDoc = Graph.sccDf(nodes, edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byDoc(5L) == (5L, 3L) && byDoc(6L) == (5L, 3L) && byDoc(7L) == (5L, 3L),
      s"7 belongs to SCC 5 despite its edge into the smaller-rooted SCC 3: $byDoc")
    assert(byDoc(3L) == (3L, 2L) && byDoc(4L) == (3L, 2L), s"SCC 3 intact: $byDoc")
  }

  test("linkScc matches a driver-side Tarjan on the planted corpus") {
    val docs = plantedDocs
    val edges = Graph.linkEdgesDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = docs.count().toInt
    // iterative Tarjan, canonicalized to min-member labels
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val index = scala.collection.mutable.Map.empty[Long, Int]
    val low = scala.collection.mutable.Map.empty[Long, Int]
    val onStk = scala.collection.mutable.Set.empty[Long]
    val stk = scala.collection.mutable.Stack.empty[Long]
    var counter = 0
    val label = scala.collection.mutable.Map.empty[Long, Long]
    for (root <- 0L until n.toLong if !index.contains(root)) {
      var work = List((root, 0))
      while (work.nonEmpty) {
        val (v, pi) = work.head
        if (pi == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stk.push(v); onStk += v
        }
        val nbrs = adj.getOrElse(v, Array.empty[Long])
        var i = pi
        var descended = false
        while (i < nbrs.length && !descended) {
          val w = nbrs(i)
          if (!index.contains(w)) {
            work = (w, 0) :: (v, i + 1) :: work.tail
            descended = true
          } else {
            if (onStk(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!descended) {
          if (low(v) == index(v)) {
            val comp = scala.collection.mutable.Buffer.empty[Long]
            var w = -1L
            while (w != v) { w = stk.pop(); onStk -= w; comp += w }
            val m = comp.min
            comp.foreach(label(_) = m)
          }
          work = work.tail
          work.headOption.foreach { case (u, _) =>
            low(u) = math.min(low(u), low(v))
          }
        }
      }
    }
    val got = Graph.linkSccDf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == label.toMap, "peel labels must equal Tarjan's components")
  }

  test("node2vec with p = q = 1 degenerates to the uniform walk exactly") {
    val docs = plantedDocs
    val uniform = Graph.randomWalksDf(docs, startEvery = 2).collect().map(_.toSeq).toSet
    val unbiased = Graph.node2vecWalksDf(docs, p = 1.0, q = 1.0, startEvery = 2)
      .collect().map(_.toSeq).toSet
    assert(unbiased == uniform,
      "equal class weights must reproduce the md5-argmin uniform election")
  }

  test("node2vec bias is honored: return-preferring walks backtrack when they can") {
    val docs = plantedDocs
    val edges = Graph.linkEdgesDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // p tiny -> return class has top priority: whenever cur -> prev is
    // an edge, the elected hop MUST be prev
    val walks = Graph.node2vecWalksDf(docs, p = 0.01, q = 1.0, startEvery = 2)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2) -> r.getLong(3)))
      .groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2).sortBy(_._1).map(_._2)
      }
    var checked = 0
    walks.values.foreach { path =>
      path.sliding(3).filter(_.length == 3).foreach { w =>
        val (prev, cur, nxt) = (w(0), w(1), w(2))
        if (edges.contains(cur -> prev)) { assert(nxt == prev); checked += 1 }
      }
    }
    assert(checked > 0, "fixture must exercise at least one return opportunity")
    // and the DFS-like registered parameterization must differ from
    // uniform on this graph (the bias is visible, not a no-op)
    val uniform = Graph.randomWalksDf(docs, startEvery = 2).collect().map(_.toSeq).toSet
    val dfs = Graph.node2vecWalksDf(docs, p = 4.0, q = 0.25, startEvery = 2)
      .collect().map(_.toSeq).toSet
    assert(dfs != uniform, "outward bias must visibly shift the walks")
  }

  /** Collect (doc_id -> x0..x3 as doubles) from an embedding frame. */
  private def embMap(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Double]] =
    df.collect().map { r =>
      r.getLong(0) -> Array(r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        .map(_.toDouble)
    }.toMap

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("node embeddings separate a planted two-cluster pair graph (cosine margin)") {
    import spark.implicits._
    // two disjoint 4-cliques in the co-occurrence graph — walks in one
    // cluster never emit a cross-cluster pair, so training must pull
    // each clique toward its own consensus direction
    val cliques = Seq(Seq(0L, 1L, 2L, 3L), Seq(4L, 5L, 6L, 7L))
    val pairs = (for { c <- cliques; x <- c; y <- c if x != y }
      yield (x, y, 25L)).toDF("center", "context", "n_cooc")
    val emb = embMap(Graph.nodeEmbeddingsOnPairs(pairs, nTotal = 8))
    assert(emb.keySet == (0L to 7L).toSet)
    val intra = for { c <- cliques; x <- c; y <- c if x < y }
      yield cosine(emb(x), emb(y))
    val inter = for { x <- cliques.head; y <- cliques(1) }
      yield cosine(emb(x), emb(y))
    val (mi, mx) = (intra.sum / intra.size, inter.sum / inter.size)
    assert(mi > mx + 0.3,
      s"clusters not separated: mean intra cosine $mi vs mean inter $mx")
  }

  test("node embeddings are partition-invariant (micro-snapped gradient sums)") {
    import spark.implicits._
    val pairs = (for { x <- 0L to 5L; y <- 0L to 5L if x != y }
      yield (x, y, 1L + (x * 7 + y) % 5)).toDF("center", "context", "n_cooc")
    val a = embMap(Graph.nodeEmbeddingsOnPairs(pairs.repartition(1), nTotal = 6))
    val b = embMap(Graph.nodeEmbeddingsOnPairs(pairs.repartition(7), nTotal = 6))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(v.sameElements(b(k)), s"node $k drifted") }
  }

  test("link-prediction AUC: well-formed, partition-invariant, replayed driver-side") {
    val fixture = plantedDocs
    val r = Graph.linkPredictionAucDf(fixture, startEvery = 1).collect()
    assert(r.length == 1)
    val (np, nn, auc) = (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2))
    assert(np > 0, "dense walks must embed enough endpoints for positives")
    assert(auc >= 0.0 && auc <= 1.0)
    val b = Graph.linkPredictionAucDf(fixture.repartition(7), startEvery = 1).head()
    assert((b.getLong(0), b.getLong(1), b.getDouble(2)) == ((np, nn, auc)),
      "AUC must be partition-invariant (snapped scores, integer rank sums)")
  }

  test("trained embeddings are a session-scoped shared artifact (one descent per (session, dir))") {
    // the registry pair q_node_embeddings / q_link_prediction_auc must
    // share ONE training — the cache returns the same checkpointed frame
    val a = Graph.trainedNodeEmbeddings(spark, sfDir)
    val b = Graph.trainedNodeEmbeddings(spark, sfDir)
    assert(a eq b, "second lookup must reuse the cached descent, not retrain")
  }

  test("triangle family matches a brute-force enumeration on the planted graph") {
    val fixture = plantedDocs
    val (und, adj, _) = undirectedView(fixture)
    val nodes = (0L until fixture.count()).toSeq
    def tri(v: Long): Long = {
      val ns = adj.getOrElse(v, Set.empty).toSeq
      (for { i <- ns.indices; j <- i + 1 until ns.size
             if adj(ns(i)).contains(ns(j)) } yield 1L).sum
    }
    val expected = nodes.map(v => v -> tri(v)).toMap
    val got = Graph.clusteringCoefficientDf(fixture).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == nodes.toSet)
    nodes.foreach { v =>
      val (k, t, lcc) = got(v)
      assert(k == adj.getOrElse(v, Set.empty).size.toLong, s"degree of $v")
      assert(t == expected(v), s"triangles of $v: got $t want ${expected(v)}")
      val want = if (k >= 2) math.floor(2e6 * t / (k * (k - 1)) + 0.5) / 1e6 else 0.0
      assert(lcc == want, s"lcc of $v")
    }
    // global identities: Σ per-node T = 3 · total; transitivity = 3T/W
    val g = Graph.graphTransitivityDf(fixture).head()
    assert(g.getLong(3) * 3 == expected.values.sum, "each triangle counted at 3 nodes")
    assert(g.getLong(1) == und.length / 2, "undirected edge count")
    val w = nodes.map(v => { val k = adj.getOrElse(v, Set.empty).size.toLong; k * (k - 1) / 2 }).sum
    assert(g.getLong(2) == w, "wedge count")
    if (w > 0)
      assert(g.getDouble(4) == math.floor(3e6 * g.getLong(3) / w + 0.5) / 1e6)
  }

  /** Driver-side undirected view of a fixture's link graph — the
    * scaffolding every undirected replay shares: (und edge list both
    * directions, adjacency sets, degree map).
    */
  private def undirectedView(fixture: org.apache.spark.sql.DataFrame)
      : (Seq[(Long, Long)], Map[Long, Set[Long]], Map[Long, Long]) = {
    val e = Graph.linkEdgesDf(fixture).collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = e.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct.toSeq
    val adj = und.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val deg = adj.map { case (k, vs) => k -> vs.size.toLong }
    (und, adj, deg)
  }

  test("label propagation matches a driver-side synchronous replay on the planted graph") {
    val fixture = plantedDocs.withColumn("lang",
      when(col("doc_id") < 5, lit("aa")).otherwise(lit("bb")))
    val (und, adj, _) = undirectedView(fixture)
    val truth = (0L until 10L).map(v => v -> (if (v < 5) "aa" else "bb")).toMap
    var label: Map[Long, Option[String]] =
      truth.map { case (v, l) => v -> (if (v % 3 == 0) Some(l) else None) }
    for (_ <- 1 to Graph.LabelPropRounds) {
      val next = label.map { case (v, old) =>
        if (v % 3 == 0) v -> old
        else {
          val votes = adj.getOrElse(v, Set.empty).toSeq
            .flatMap(u => label(u)).groupBy(identity)
            .map { case (l, xs) => (l, xs.size) }
          if (votes.isEmpty) v -> old
          else v -> Some(votes.toSeq.minBy { case (l, n) => (-n, l) }._1)
        }
      }
      label = next
    }
    val got = Graph.labelPropagationDf(fixture).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3)),
          if (r.isNullAt(4)) None else Some(r.getBoolean(4))))).toMap
    assert(got.keySet == truth.keySet)
    got.foreach { case (v, (seed, pred, correct)) =>
      assert(seed == (v % 3 == 0))
      assert(pred == label(v), s"prediction of $v: got $pred want ${label(v)}")
      val want = if (seed || pred.isEmpty) None else Some(pred.get == truth(v))
      assert(correct == want, s"correct flag of $v")
    }
    // the fixture must actually exercise propagation: some non-seed
    // reached a prediction
    assert(got.exists { case (v, (s, p, _)) => !s && p.isDefined })
  }

  test("fused dual-rank serve table equals the two single-seed loops bit-for-bit") {
    val docs = plantedDocs.withColumn("source",
      when(col("doc_id") < 3, lit("src0")).otherwise(lit("srcX")))
    val serve = Graph.rankServeTableDf(docs, col("source") === lit("src0"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val pr = Graph.pagerankDf(docs, topK = 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tr = Graph.trustrankDf(docs, col("source") === lit("src0"), topK = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(serve.keySet == pr.keySet && serve.keySet == tr.keySet)
    serve.foreach { case (v, (rp, rt)) =>
      assert(rp == pr(v), s"fused rank of $v drifted: $rp vs ${pr(v)}")
      assert(rt == tr(v), s"fused trust of $v drifted: $rt vs ${tr(v)}")
    }
  }

  test("degree assortativity matches a driver-side Newman replay on the planted graph") {
    val fixture = plantedDocs
    val (und, _, deg) = undirectedView(fixture)
    val once = und.filter { case (a, b) => // the orientation: each edge once
      deg(a) < deg(b) || (deg(a) == deg(b) && a < b) }
    val m = once.length.toLong
    val sjk = once.map { case (a, b) => deg(a) * deg(b) }.sum
    val sjpk = once.map { case (a, b) => deg(a) + deg(b) }.sum
    val ssq = once.map { case (a, b) => deg(a) * deg(a) + deg(b) * deg(b) }.sum
    val b = sjpk.toDouble / (2.0 * m)
    val want = math.floor((sjk.toDouble / m - b * b) /
      (ssq.toDouble / (2.0 * m) - b * b) * 1e6 + 0.5) / 1e6
    val r = Graph.degreeAssortativityDf(fixture).head()
    assert(r.getLong(0) == m && r.getLong(1) == sjk &&
      r.getLong(2) == sjpk && r.getLong(3) == ssq)
    assert(r.getDouble(4) == want, s"got ${r.getDouble(4)} want $want")
    assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
  }

  test("k-core membership matches a driver-side peel on the planted graph") {
    val fixture = plantedDocs
    val (und, _, deg0) = undirectedView(fixture)
    val k = math.floor(5.0 * deg0.values.sum / (8.0 * deg0.size)).toLong
    var alive = deg0.keySet
    var changed = true
    while (changed) {
      val d = und.filter { case (a, b) => alive(a) && alive(b) }
        .groupBy(_._1).map { case (v, es) => v -> es.length.toLong }
      val next = alive.filter(v => d.getOrElse(v, 0L) >= k)
      changed = next != alive
      alive = next
    }
    val got = Graph.kcoreMembershipDf(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == (0L until fixture.count()).toSet)
    got.foreach { case (v, (ud, kt, in)) =>
      assert(kt == k, s"threshold: got $kt want $k")
      assert(ud == deg0.getOrElse(v, 0L), s"degree of $v")
      assert(in == alive(v), s"membership of $v: got $in want ${alive(v)}")
    }
    // separation is a corpus-scale property (the 10-node fixture may
    // legitimately peel to empty): on the real table the 5/8 threshold
    // must keep a nonempty core AND peel a nonempty tail
    val corpus = Graph.kcoreMembership(spark, sfDir)
      .groupBy(col("in_kcore")).agg(count(lit(1)))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(corpus.getOrElse(true, 0L) > 0 && corpus.getOrElse(false, 0L) > 0,
      s"peel must separate at corpus scale: $corpus")
  }

  test("node embeddings on the planted corpus cover exactly the walk-pair centers") {
    val docs = plantedDocs
    val pairs = Graph.walkContextPairsDf(docs, startEvery = 2).localCheckpoint()
    val emb = Graph.nodeEmbeddingsOnPairs(pairs, nTotal = docs.count()).collect()
    val centers = pairs.select("center").distinct().collect().map(_.getLong(0)).toSet
    assert(emb.map(_.getLong(0)).toSet == centers, "one embedding row per pair center")
    // n_pairs is the node's total pair weight — the gradient normalizer
    val np = pairs.groupBy(col("center")).agg(sum(col("n_cooc")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    emb.foreach(r => assert(r.getLong(1) == np(r.getLong(0))))
  }

  test("pagerankIncremental matches an exact driver-side replay of base + warm rounds") {
    import spark.implicits._
    // plantedDocs but doc 9 carries text (so the DELTA — docs with
    // doc_id >= 9*10/10 = 9 — actually contributes out-edges)
    val fixture = Seq(
      0L -> "alpha beta gamma delta", 1L -> "beta gamma epsilon zeta",
      2L -> "gamma delta alpha beta", 3L -> "zeta eta theta iota",
      4L -> "iota kappa alpha gamma", 5L -> "kappa lambda mu nu",
      6L -> "mu nu alpha beta gamma", 7L -> "nu xi omicron pi",
      8L -> "pi rho alpha delta",     9L -> "alpha beta kappa lambda"
    ).toDF("doc_id", "text")
    val d = fixture.count()
    val cutoff = Graph.IncrBaseNum.toLong * d / Graph.IncrBaseDen
    val edges = Graph.linkEdgesDf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baseEdges = edges.filter(_._1 < cutoff)
    assert(baseEdges.length < edges.length,
      "doc 9 must contribute delta edges or the test is vacuous")
    def snap(x: Double): Long = math.floor(x + 0.5).toLong
    def rounds(r0: Map[Long, Long], es: Array[(Long, Long)], n: Int): Map[Long, Long] = {
      val outDeg = es.groupBy(_._1).map { case (s, g) => s -> g.length.toLong }
      var r = r0
      for (_ <- 1 to n) {
        val contrib = es.groupBy(_._2).map { case (dst, g) =>
          dst -> g.map(e => snap(r(e._1).toDouble / outDeg(e._1))).sum
        }
        val dang = r.collect { case (u, ru) if !outDeg.contains(u) => ru }.sum
        r = r.map { case (v, _) =>
          v -> (snap((1.0 - 0.85) * 1e9 / d) +
            snap(0.85 * (contrib.getOrElse(v, 0L) + snap(dang.toDouble / d)).toDouble))
        }
      }
      r
    }
    val uniform = (0L until d).map(i => i -> snap(1e9 / d)).toMap
    val base = rounds(uniform, baseEdges, Graph.RankIters)
    val warm = rounds(base, edges, Graph.IncrRefineIters)
    val got = Graph.pagerankIncrementalDf(fixture).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == (0L until d).toSet)
    got.foreach { case (v, (rw, rb, dl)) =>
      assert(rw == warm(v), s"warm rank of $v: got $rw want ${warm(v)}")
      assert(rb == base(v), s"base rank of $v: got $rb want ${base(v)}")
      assert(dl == rw - rb, s"delta of $v")
    }
    // the delta doc's own targets gained rank mass from the arrival
    val promoted = got.count { case (_, (_, _, dl)) => dl > 0 }
    assert(promoted > 0, "some page must be promoted by the new edges")
  }

  test("webBowtie: regions exclusive and exhaustive, census consistent, core = giant SCC") {
    val rows = Graph.webBowtie(spark, sfDir).collect()
    val n = docs.count()
    assert(rows.length == n, "every doc classified exactly once")
    val byRegion = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    rows.foreach(r => assert(r.getLong(2) == byRegion(r.getString(1)).toLong,
      s"census column must equal the region row count: $r"))
    assert(byRegion.keySet.subsetOf(Set("core", "in", "out", "other")))
    // the core region is exactly the giant SCC
    val scc = Graph.linkScc(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val giant = scc.values.maxBy { case (id, size) => (size, -id) }._1
    val coreDocs = rows.filter(_.getString(1) == "core").map(_.getLong(0)).toSet
    assert(coreDocs == scc.collect { case (d, (id, _)) if id == giant => d }.toSet,
      "core must be the largest SCC's members")
    // IN members must not be reachable FROM the core (else they'd be core/out)
    assert(byRegion.getOrElse("core", 0) > 0, "a giant core must exist")
  }

  test("graphReciprocity matches a driver-side swap count on the planted graph") {
    val fixture = plantedDocs
    val edges = Graph.linkEdgesDf(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantRecip = edges.count { case (s, d) => edges((d, s)) }.toLong
    val r = Graph.graphReciprocityDf(fixture).collect()
    assert(r.length == 1)
    val (ne, nr, rec) = (r(0).getLong(0), r(0).getLong(1), r(0).getDouble(2))
    assert(ne == edges.size.toLong, s"edge count: $ne vs ${edges.size}")
    assert(nr == wantRecip, s"reciprocal count: $nr vs $wantRecip")
    val want = if (ne > 0) math.floor(1e6 * nr / ne + 0.5) / 1e6 else 0.0
    assert(rec == want, s"snapped ratio: $rec vs $want")
  }

  test("hopDistancesOn: exact depths on a planted path + diamond, unreachable excluded") {
    import spark.implicits._
    // seeds {0}: path 0 -> 1 -> 2 -> 3 and diamond 1 -> 4 -> 3 both
    // reach 3 in 3 hops, but the shortcut 0 -> 6 -> 3 wins with 2 —
    // the MIN must pick it. Node 5 has no edges; node 7 only the
    // wrong-direction 7 -> 0: both stay at the sentinel.
    val init = (0L to 7L).toDF("doc_id")
      .select(col("doc_id"),
        when(col("doc_id") === 0L, 0L)
          .otherwise(lit(Graph.BfsUnreached)).as("depth"))
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (1L, 4L), (4L, 3L),
      (0L, 6L), (6L, 3L), (7L, 0L)).toDF("src", "dst").localCheckpoint()
    val got = Graph.hopDistancesOn(init, e, Graph.BfsRounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L,
      6L -> 1L, 5L -> Graph.BfsUnreached, 7L -> Graph.BfsUnreached)
    assert(got == want, s"got $got")
    // the cap is a fixpoint at fixture scale: one extra round is identical
    val more = Graph.hopDistancesOn(init, e, Graph.BfsRounds + 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more == got, "extra round must be an identity past the fixpoint")
  }

  test("crawlDepth: seeds at depth 0, histogram consistent, reached-only rows") {
    val out = Graph.crawlDepth(spark, sfDir).collect()
    assert(out.nonEmpty, "the trusted host must reach someone")
    val byDepth = out.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    out.foreach { r =>
      assert(r.getLong(1) < Graph.BfsUnreached, "reached rows only")
      assert(r.getLong(2) == byDepth(r.getLong(1)).toLong,
        s"n_at_depth must equal the per-depth row count: $r")
    }
    assert(byDepth.contains(0L), "the seed docs themselves sit at depth 0")
    // depths form a contiguous prefix 0..max (BFS layers cannot skip)
    val ds = byDepth.keySet
    assert(ds == (0L to ds.max).toSet, s"BFS layers must be contiguous: $ds")
  }
}
