package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, GraphOps, SkewOps}

/** Connected components over entity graphs + shuffle-skew diagnostics. */
class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("connectedComponents: string nodes, two components, min-name root") {
    // chain b-c-d-e (forces >1 propagation round) and pair x-y
    val pairs = Seq(("c", "b"), ("c", "d"), ("d", "e"), ("y", "x"))
      .toDF("u", "v")
    val got = GraphOps.connectedComponents(pairs)
      .as[(String, String, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("b", "b", true), ("c", "b", false), ("d", "b", false), ("e", "b", false),
      ("x", "x", true), ("y", "x", false)))
  }

  test("connectedComponents: long chain converges within log-bounded rounds") {
    // path graph of 200 nodes: diameter 199, pointer jumping must close it
    // well inside maxIters=20 (plain propagation would need 199 rounds)
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("u", "v")
    val got = GraphOps.connectedComponents(pairs, maxIters = 20)
    assert(got.filter(col("component_id") =!= 0L).isEmpty)
    assert(got.count() == 200)
  }

  test("dedupClusters still matches its contract after the refactor") {
    val pairs = Seq((10L, 11L), (11L, 12L), (30L, 31L)).toDF("a", "b")
    val got = DedupOps.dedupClusters(pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
      (30L, 30L, true), (31L, 30L, false)))
  }

  test("reliable checkpoint mode: identical labels/ranks, refuses without a dir") {
    // no checkpoint dir configured -> loud refusal, not a deep Spark error
    val pairs = Seq(("c", "b"), ("c", "d"), ("d", "e"), ("y", "x")).toDF("u", "v")
    val prevDir = spark.sparkContext.getCheckpointDir
    if (prevDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        GraphOps.connectedComponents(pairs, reliable = true)
      }
      assert(e.getMessage.contains("setCheckpointDir"), e.getMessage)
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-reliable-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      // CC: directory-backed rounds produce the SAME labels as local mode
      val local = GraphOps.connectedComponents(pairs)
        .as[(String, String, Boolean)].collect().toSet
      val rel = GraphOps.connectedComponents(pairs, reliable = true)
        .as[(String, String, Boolean)].collect().toSet
      assert(rel == local, s"reliable CC diverged: $rel vs $local")
      // PageRank: bit-exact across modes (fixed-point integer arithmetic)
      val canonical = Seq(("甲", "乙"), ("乙", "丙"), ("丙", "甲"))
        .toDF("subj_canonical", "obj_canonical")
      val prLocal = GraphOps.entityPageRank(canonical)
        .as[(String, Long)].collect().toMap
      val prRel = GraphOps.entityPageRank(canonical, reliable = true)
        .as[(String, Long)].collect().toMap
      assert(prRel == prLocal)
      // dedupClusters threads the flag through to the shared CC core
      val clusters = DedupOps.dedupClusters(
        Seq((10L, 11L), (11L, 12L)).toDF("a", "b"), reliable = true)
        .as[(Long, Long, Boolean)].collect().toSet
      assert(clusters == Set((10L, 10L, true), (11L, 10L, false), (12L, 10L, false)))
      // the rounds really went through the reliable store
      assert(new java.io.File(ckpt).listFiles().nonEmpty,
             "reliable mode wrote nothing to the checkpoint dir")
    } finally prevDir.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("coocEdges: normalized, weighted, deterministic top-k") {
    val canonical = Seq(
      ("A", "B"), ("B", "A"), ("A", "B"),   // same undirected edge ×3
      ("B", "C"), ("C", "D"), ("C", "D"),
      ("E", "E"),                            // self loop dropped
      (null, "F"), ("F", null)               // null dropped
    ).toDF("subj_canonical", "obj_canonical")
    val all = GraphOps.coocEdges(canonical, topK = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(all == Seq(("A", "B", 3L), ("C", "D", 2L), ("B", "C", 1L)))
    // the cap keeps the strongest edges under the same total order
    val capped = GraphOps.coocEdges(canonical, topK = 2)
      .as[(String, String, Long)].collect().toSeq
    assert(capped == all.take(2))
  }

  test("coocComponents: components of the strongest-edge graph") {
    val canonical = Seq(
      ("甲", "乙"), ("乙", "丙"), ("丁", "戊")
    ).toDF("subj_canonical", "obj_canonical")
    val got = GraphOps.coocComponents(canonical)
      .as[(String, String, Boolean)].collect().toSet
    val minA = Seq("甲", "乙", "丙").min
    val minB = Seq("丁", "戊").min
    assert(got == Set(
      ("甲", minA, "甲" == minA), ("乙", minA, "乙" == minA), ("丙", minA, "丙" == minA),
      ("丁", minB, "丁" == minB), ("戊", minB, "戊" == minB)))
  }

  test("coocEdgesByThreshold keeps every edge over the floor, drops the rest") {
    val canonical = Seq(
      ("A", "B"), ("B", "A"), ("A", "B"),   // weight 3
      ("B", "C"), ("C", "D"), ("C", "D"),   // weights 1, 2
      (null, "F"), ("F", null)
    ).toDF("subj_canonical", "obj_canonical")
    val got = GraphOps.coocEdgesByThreshold(canonical, minCooc = 2)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("A", "B", 3L), ("C", "D", 2L)))
    // floor 1 = the whole graph — same edge set as an uncapped top-K
    val all = GraphOps.coocEdgesByThreshold(canonical, minCooc = 1)
      .as[(String, String, Long)].collect().toSet
    assert(all == GraphOps.coocEdges(canonical, topK = 100)
      .as[(String, String, Long)].collect().toSet)
  }

  test("full-graph components/pagerank == capped variants when nothing is capped") {
    val canonical = Seq(
      ("甲", "乙"), ("甲", "乙"), ("乙", "丙"), ("乙", "丙"), ("丁", "戊"), ("丁", "戊")
    ).toDF("subj_canonical", "obj_canonical")
    val full = GraphOps.coocComponentsFull(canonical, minCooc = 2)
      .as[(String, String, Boolean)].collect().toSet
    val capped = GraphOps.coocComponents(canonical)
      .as[(String, String, Boolean)].collect().toSet
    assert(full == capped)
    val rFull = GraphOps.entityPageRankFull(canonical, minCooc = 2)
      .as[(String, Long)].collect().toMap
    val rCapped = GraphOps.entityPageRank(canonical)
      .as[(String, Long)].collect().toMap
    assert(rFull == rCapped)
  }

  test("full-graph variants cover edges the top-K cap would drop") {
    // 3 strong pairs + K=2 cap: the capped graph loses pair (c1,c2); the
    // threshold graph keeps it
    val canonical = Seq(
      ("a1", "a2"), ("a1", "a2"), ("a1", "a2"),
      ("b1", "b2"), ("b1", "b2"), ("b1", "b2"),
      ("c1", "c2"), ("c1", "c2")
    ).toDF("subj_canonical", "obj_canonical")
    val capped = GraphOps.coocComponents(canonical, topK = 2)
      .as[(String, String, Boolean)].collect().map(_._1).toSet
    val full = GraphOps.coocComponentsFull(canonical, minCooc = 2)
      .as[(String, String, Boolean)].collect().map(_._1).toSet
    assert(!capped.contains("c1") && full.contains("c1"))
    assert(full == Set("a1", "a2", "b1", "b2", "c1", "c2"))
  }

  test("entityPageRank: a ring is an exact fixed point at 10^9") {
    // cycle A-B-C-D: every node degree 2, contribution pr/2 from two
    // neighbors → 150000000 + (850 * pr) div 1000 == pr exactly at 10^9
    val ring = Seq(("A", "B"), ("B", "C"), ("C", "D"), ("D", "A"))
      .toDF("subj_canonical", "obj_canonical")
    val got = GraphOps.entityPageRank(ring)
      .as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1000000000L, "B" -> 1000000000L,
                      "C" -> 1000000000L, "D" -> 1000000000L))
  }

  test("entityPageRank: star center outranks leaves; leaves tie exactly") {
    val star = Seq(("X", "a"), ("X", "b"), ("X", "c"))
      .toDF("subj_canonical", "obj_canonical")
    val got = GraphOps.entityPageRank(star)
      .as[(String, Long)].collect().toMap
    assert(got("X") > got("a"))
    assert(got("a") == got("b") && got("b") == got("c"))
    assert(got.size == 4)
  }

  test("entityPageRank is partition-invariant (integer sums have no order hazard)") {
    val canonical = Seq(
      ("甲", "乙"), ("乙", "丙"), ("丙", "丁"), ("甲", "丙"), ("戊", "己"),
      ("乙", "丁"), ("甲", "乙"), ("丁", "戊")
    ).toDF("subj_canonical", "obj_canonical")
    val a = GraphOps.entityPageRank(canonical.repartition(1))
      .as[(String, Long)].collect().toMap
    val b = GraphOps.entityPageRank(canonical.repartition(7))
      .as[(String, Long)].collect().toMap
    assert(a == b, "ranks must not depend on partitioning")
    assert(a.nonEmpty)
  }

  test("keySkew measures survive petascale counts (no long overflow, exact floors)") {
    // 1000 * 1e10 * 1e6 = 1e19 overflows a long (9.22e18): the decimal
    // `div` path must still produce the exact integer floors
    val row = Seq(("hot", 10000000000L, 1, 20000000000L, 1000000L))
      .toDF("key", "n_rows", "rank", "total", "n_keys")
    val got = SkewOps.skewMeasures(row, 8000L)
      .as[(String, Long, Int, Long, Long, Boolean)].head()
    assert(got == (("hot", 10000000000L, 1, 5000L, 500000000L, true)))
  }

  test("keySkew: counts, ranks, fixed-point shares, hot flag") {
    // 90 rows of 'hot', 5 of 'a', 5 of 'b' → 3 keys, total 100, mean 33.3
    val rows = (Seq.fill(90)("hot") ++ Seq.fill(5)("a") ++ Seq.fill(5)("b"))
      .toDF("pred")
    val got = SkewOps.keySkew(rows, "pred", topN = 2, hotMultX1000 = 2000L)
      .as[(String, Long, Int, Long, Long, Boolean)].collect().toSeq
    // hot: share 9000/10000, multiple 2.7× mean → hot at 2× threshold;
    // 'a' ties 'b' on count, wins rank 2 lexicographically (topN = 2 cap)
    assert(got == Seq(
      ("hot", 90L, 1, 9000L, 2700L, true),
      ("a", 5L, 2, 500L, 150L, false)))
  }
}
