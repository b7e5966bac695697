package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

/** Plan-quality regression tests — the 100 TB design properties must be
  * visible in the physical plan, not just claimed:
  *  - ingest → triples has ZERO exchanges (narrow end to end);
  *  - canonicalization joins are broadcast, never shuffled;
  *  - filters reach the parquet scan (PushedFilters) and scans are
  *    column-pruned (ReadSchema);
  *  - whole-stage codegen covers the relational queries. */
class PlanQualitySpec extends SparkSpecBase {

  private def executed(df: DataFrame): String = df.queryExecution.executedPlan.toString()
  private def shuffles(df: DataFrame): Int =
    "ShuffleExchange|Exchange hashpartitioning|Exchange rangepartitioning".r
      .findAllIn(executed(df)).length

  test("docs → sentences → triples is shuffle-free") {
    val triples = Pipeline.extractTriples(Pipeline.segmentDocs(Pipeline.synthDocs(spark, 10)))
    assert(shuffles(triples.toDF()) == 0, executed(triples.toDF()))
  }

  test("canonicalization uses broadcast joins only") {
    val t = Pipeline.extractTriples(Pipeline.segmentDocs(Pipeline.synthDocs(spark, 10)))
    val canon = Pipeline.canonicalize(t, Pipeline.synthAliases(spark))
    val plan = executed(canon)
    assert(shuffles(canon) == 0, plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("filters and projections are pushed to the parquet scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .filter(col("p_size") >= 25)
      .select(col("p_partkey"), col("p_size"))
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual(p_size,25)"), plan)
    assert(plan.contains("ReadSchema: struct<p_partkey:bigint,p_size:int>"), plan)
  }

  test("hash-bucket layout prunes partitions on bucket predicates") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-bucket").toString
    val store = new graft.pipeline.CheckpointStore(root, spark)
    store.runStage("docs", bucketCol = Some("doc_id"))(Pipeline.synthDocs(spark, 200))
    val pruned = spark.read.parquet(s"$root/docs").filter(col("_bucket") === 3)
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("_bucket"), plan)
    val rows = pruned.collect()
    assert(rows.nonEmpty)
    // only the requested bucket directory was read
    assert(rows.map(r => r.getAs[Number]("_bucket").longValue).distinct.toSeq == Seq(3L))
    // and the layout actually has many bucket directories to prune over
    val bucketDirs = new java.io.File(s"$root/docs").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("_bucket="))
    assert(bucketDirs > 10, s"$bucketDirs bucket dirs")
  }

  test("coref ⋈ nerpos is a real distributed equi-join on (doc_id, sent_id)") {
    val docs = Pipeline.synthDocs(spark, 100)
    val nerpos = Pipeline.nerPosTable(Pipeline.segmentDocs(docs))
    val corefed = Pipeline.corefedSentenceTable(docs)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Pipeline.corefNerPosJoin(nerpos, corefed)
      val plan = executed(joined)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("doc_id") && plan.contains("sent_id"), plan)
      val rows = joined.collect()
      assert(rows.nonEmpty)
      // every corefed sentence must land on exactly one nerpos row
      val corefedCount = corefed.count()
      assert(rows.count(_.getAs[String]("corefed_sent") != null) == corefedCount)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed tables co-locate joins: no exchange on the bucket key") {
    import org.apache.spark.sql.functions._
    // the Iceberg-bucketing analogue Spark can prove in-plan: two tables
    // bucketBy the same key join WITHOUT a shuffle on either side
    // (warehouse dir is the session default — spark-warehouse/, gitignored)
    val docs = Pipeline.synthDocs(spark, 200)
    val sentences = Pipeline.segmentDocs(docs)
    val triples = Pipeline.extractTriples(sentences)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      sentences.toDF().write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_sentences")
      triples.toDF().write.bucketBy(8, "doc_id").sortBy("doc_id")
        .mode("overwrite").saveAsTable("b_triples")
      val joined = spark.table("b_triples").join(
        spark.table("b_sentences").select(col("doc_id"), col("sent_id"), col("sent")),
        Seq("doc_id"))
      val plan = executed(joined)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(shuffles(joined) == 0, s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_sentences")
      spark.sql("DROP TABLE IF EXISTS b_triples")
    }
  }

  // ---- round-2 perf-win regression gates: these plans cost real time to
  // find (SortAggregate-on-strings 3→10s, ngram window-sort 6→3s, unsalted
  // kg_edges hot pairs) — fail loudly if anyone reintroduces them.

  private val sf = "/root/testdata/sf0.001"

  test("under-parallelized-scan guard fires plan-side (no RDD materialization)") {
    import spark.implicits._
    // a single tiny parquet file is ONE scan split: the hash-heavy ops
    // must inject a round-robin repartition — decided from the file
    // listing, never by forcing documents.rdd (which costs a full
    // physical-planning pass per op)
    val dir = java.nio.file.Files.createTempDirectory("graft-tiny-scan").toString
    Seq((1L, "甲 乙 丙 丁"), (2L, "乙 丙 丁 戊")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val fromFile = graft.ops.DedupOps.ngramJaccardPairs(
      spark.read.parquet(dir), n = 2, thresholdX1000 = 100)
    assert(executed(fromFile).contains("RoundRobinPartitioning"),
           s"tiny single-file scan was not repartitioned:\n${executed(fromFile)}")
    // an in-memory frame is already parallelism-partitioned: no injection
    val fromMem = graft.ops.DedupOps.ngramJaccardPairs(
      Seq((1L, "甲 乙 丙")).toDF("doc_id", "text"), n = 2, thresholdX1000 = 100)
    assert(!executed(fromMem).contains("RoundRobinPartitioning"), executed(fromMem))
  }

  test("detectJoin: AQE splits a planted hot-surface skew, result unchanged") {
    import spark.implicits._
    import graft.model.{AliasRow, SentenceRow}
    // a stopword-like surface occurring everywhere concentrates its
    // candidates on ONE join partition (the documented skew hazard of the
    // distributed entity link) — AQE's skew-join must split it at runtime
    // all aliases are length 2 and only 热词 occurs, so EVERY candidate
    // row carries the same join key — the hot partition holds the whole
    // shuffle while the median partition is empty, the worst-case shape
    val sentences = (0 until 3000).map(i =>
      SentenceRow(s"d$i", 0, 0, "热词" * 30 + s"唯一文本$i")).toDS()
    val aliases = (Seq(AliasRow("热词", "E001", "热门词")) ++
      ('a' to 't').map(c => AliasRow(s"冷$c", s"C$c", s"冷$c"))).toDS()
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> spark.conf.getOption(k)).toMap
    def set(k: String, v: String) = spark.conf.set(k, v)
    try {
      set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
      // production defaults (256 MB / 5x median) scaled down to fixture
      // size so the same rule observably fires here
      set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the join output feeds the longest-leftmost regroup (an exchange
      // either way), so the extra shuffle the split may introduce is free
      set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val joined = graft.pipeline.Mentions.detectJoin(sentences, aliases)
      val rows = joined.collect() // finalize the adaptive plan
      val plan = executed(joined.toDF())
      assert(plan.contains("skew=true"),
             s"AQE skew split did not fire on the planted hot surface:\n$plan")
      // the split is a pure re-partitioning: results identical to the
      // broadcast-trie path on the same fixture
      val viaTrie = graft.pipeline.Mentions.detect(sentences, aliases)
        .collect().map(m => (m.doc_id, m.sent_id, m.mention, m.begin,
                             m.end, m.entity_id)).toSet
      assert(rows.map(m => (m.doc_id, m.sent_id, m.mention, m.begin,
                            m.end, m.entity_id)).toSet == viaTrie)
      assert(rows.length == 90000, s"expected 30 hot mentions x 3000 docs, got ${rows.length}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("text_repetition is zero-shuffle (per-doc stats never leave the row)") {
    val df = SparkEntry.queries("text_repetition")(spark, sf)
    assert(shuffles(df) == 0, executed(df))
  }

  test("text_chunks is zero-shuffle (row-local window explode)") {
    val df = SparkEntry.queries("text_chunks")(spark, sf)
    assert(shuffles(df) == 0, executed(df))
  }

  test("minhash/winnow aggregations never fall back to SortAggregate") {
    for (q <- Seq("dedup_minhash_bands", "dedup_minhash_cand", "dedup_winnow")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("SortAggregate"),
             s"$q regressed to SortAggregate (hash values must stay fixed-width longs):\n$plan")
    }
  }

  test("text_bigram_lm has no sort and no SortAggregate (counts stay hash-agg'd)") {
    // the only ordering in the op is the row-local sort_array over each
    // doc's (pos, p) structs — a distributed SortExec or a SortAggregate
    // fallback would mean the fixed-width-long key discipline broke
    val plan = executed(SparkEntry.queries("text_bigram_lm")(spark, sf))
    assert(!plan.contains("SortAggregate"), s"bigram counts fell to SortAggregate:\n$plan")
    assert(!"\\bSort\\b \\[".r.findFirstIn(plan).isDefined &&
           !plan.contains("SortExec"), s"unexpected distributed sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dedup_lines family: hash-agg'd keeper min, no sort, sample join broadcast") {
    // the packed-long (doc_id << 21 | line_idx) keeper key exists exactly
    // so the global min stays in HashAggregate — a struct min would fall
    // back to SortAggregate and a 100 TB corpus would sort
    for (q <- Seq("dedup_lines", "dedup_lines_rw")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("SortAggregate"),
             s"$q keeper min fell to SortAggregate:\n$plan")
      assert(!plan.contains("SortExec") && !plan.contains("CartesianProduct"),
             s"$q has a distributed sort or cartesian:\n$plan")
      assert(!plan.contains("Window"), s"$q regressed to a window:\n$plan")
    }
    // the mixture-rate table is sources-sized: the corpus-side join must
    // be a broadcast, and the one-row totals join a broadcast nested loop
    val mix = executed(SparkEntry.queries("text_mix_sample")(spark, sf))
    assert(mix.contains("BroadcastHashJoin"), s"rates join not broadcast:\n$mix")
    assert(!mix.contains("SortMergeJoin") && !mix.contains("ShuffledHashJoin"), mix)
    // the rate table reads the corpus exactly ONCE: totals ride a window
    // over the sources-sized aggregate — a joined-back totals aggregate
    // would duplicate the scan subtree into both join sides
    val rates = executed(SparkEntry.queries("text_mix_rates")(spark, sf))
    val nScans = "FileScan|Scan parquet".r.findAllIn(rates).length
    assert(nScans == 1, s"text_mix_rates scans the corpus $nScans times:\n$rates")
    // cross-corpus ingestion: equi-join probes only — a cartesian or a
    // sort-based fallback here would be quadratic at ingest scale
    for (q <- Seq("dedup_cross_new", "dedup_cross_screen")) {
      val plan = executed(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct") &&
             !plan.contains("BroadcastNestedLoopJoin"), s"$q non-equi join:\n$plan")
      assert(!plan.contains("SortAggregate"), s"$q SortAggregate fallback:\n$plan")
    }
  }

  test("dedup_ngram has no Window operator (bucket cap rides the aggregation)") {
    val plan = executed(SparkEntry.queries("dedup_ngram")(spark, sf))
    assert(!plan.contains("Window"), s"dedup_ngram regressed to a window sort:\n$plan")
  }

  test("kg_edges keeps the salted two-phase top-k (skew guard)") {
    val plan = executed(SparkEntry.queries("kg_edges")(spark, sf))
    // executedPlan abbreviates the Project holding pmod(xxhash64(...)),
    // but the salt attribute itself shows in the Window/Exchange keys
    assert(plan.contains("salt#"), s"kg_edges lost the salt phase:\n$plan")
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows >= 2, s"expected salted + final Window phases, got $windows:\n$plan")
  }

  test("edge-weight surfaces: salted cap kept, scalar broadcast, no cartesian") {
    // the capped subtree is localCheckpoint'd by default (it feeds 3+
    // consumers with no reusable exchange), so the salt phase is only
    // visible in the UNmaterialized plan
    def pp = {
      val t = Pipeline.extractTriples(Pipeline.segmentDocs(Pipeline.synthDocs(spark, 30)))
      Pipeline.pairPredAggregate(Pipeline.canonicalize(t, Pipeline.synthAliases(spark)))
    }
    for (df <- Seq(Pipeline.edgeWeightsFromPairPred(pp, materializeCapped = false),
                   Pipeline.edgeWeightsSupport(pp, materializeCapped = false))) {
      val plan = executed(df)
      assert(plan.contains("salt#"), s"lost the salted cap phase:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"went cartesian:\n$plan")
    }
    // materialized == lazy, value-identical
    assert(Pipeline.edgeWeightsSupport(pp).collect().map(_.toSeq).toSet ==
      Pipeline.edgeWeightsSupport(pp, materializeCapped = false).collect().map(_.toSeq).toSet)
    // the shipped queries: the count-based surface's total-pairs scalar
    // rides a one-row BROADCAST nested-loop above the checkpointed
    // capped table, never a shuffled cross join; no cartesian anywhere
    val wplan = executed(SparkEntry.queries("kg_edge_weights")(spark, sf))
    assert(wplan.contains("BroadcastNestedLoopJoin"), wplan)
    assert(!wplan.contains("CartesianProduct"), wplan)
    // the weighted surface needs no scalar at all: equi-joins only
    val splan = executed(SparkEntry.queries("kg_edge_weights_sup")(spark, sf))
    assert(!splan.contains("NestedLoop") && !splan.contains("CartesianProduct"), splan)
  }

  test("dedup_cross_apply: equi-joins only against the seen-side indexes") {
    val df = SparkEntry.queries("dedup_cross_apply")(spark, sf)
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"cross-apply must never materialize seen x incoming:\n$plan")
    // the exact route probes a LEFT SEMI on the fingerprint index
    assert(plan.contains("LeftSemi"), plan)
  }

  test("dedup_cross_verify: suspect-bounded equi-joins only, never corpus x corpus") {
    val df = SparkEntry.queries("dedup_cross_verify")(spark, sf)
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"the pairwise verifier must stay on (id, gram) hash joins:\n$plan")
    // the gram tables are cut down to candidate docs via semi-joins
    assert(plan.contains("LeftSemi"), plan)
  }

  test("kg_edges_topk + typed twin: per-group window limit, never a global sort") {
    for (q <- Seq("kg_edges_topk", "kg_typed_edges_topk")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = executed(df)
      // the rank<=K filter must be pushed INTO the window as a group
      // limit (per-partition heap before the full window sort) — losing
      // this on a billion-predicate graph means sorting every group's
      // full fanout
      assert(plan.contains("WindowGroupLimit"),
        s"$q: rank filter not pushed into the window:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      // no global (allover) sort: every Sort in the plan is per-partition
      assert(!"Sort \\[[^\\]]*\\], true".r.findFirstIn(plan).isDefined,
        s"$q: global sort crept into the top-K surface:\n$plan")
    }
  }

  test("kg_typed_edge_weights: per-slice totals broadcast, equi-joins, no cartesian") {
    val df = SparkEntry.queries("kg_typed_edge_weights")(spark, sf)
    val plan = executed(df)
    assert(!plan.contains("CartesianProduct"), plan)
    // unlike the untyped surface there is NO one-row scalar cross join:
    // per-slice totals join on (type_s, type_o) keys and ride a broadcast
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ANN scale paths keep corpus work narrow (bounded exchanges, no cartesian)") {
    for (q <- Seq("ann_lsh", "ann_ivf")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = executed(df)
      assert(shuffles(df) <= 2, s"$q grew extra shuffles:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q went cartesian:\n$plan")
    }
  }

  test("kg_triples query plan has zero exchanges (linear ingest at any scale)") {
    val df = SparkEntry.queries("kg_triples")(spark, sf)
    assert(shuffles(df) == 0, executed(df))
  }

  test("top-N report ops stay TakeOrderedAndProject, never a global sort") {
    // keySkew's report head and coocEdges' strongest-edge cap must keep
    // the per-partition-heap shape: a full Sort before the limit would
    // be a scale killer on high-cardinality keys
    val skew = graft.ops.SkewOps.keySkew(
      spark.read.parquet(s"$sf/documents.parquet").select(col("lang").as("k")), "k")
    val skewPlan = executed(skew)
    assert(skewPlan.contains("TakeOrderedAndProject"),
           s"keySkew lost the top-N heap:\n$skewPlan")
    val cooc = graft.ops.GraphOps.coocEdges(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").cast("string").as("subj_canonical"),
                col("lang").as("obj_canonical")))
    val coocPlan = executed(cooc)
    assert(coocPlan.contains("TakeOrderedAndProject"),
           s"coocEdges lost the top-K heap:\n$coocPlan")
  }

  test("threshold edge derivation has NO sort and NO limit (uncapped contract)") {
    // coocEdgesByThreshold is the full-graph route: one aggregation + a
    // post-agg filter — a Sort/TakeOrdered/CollectLimit here would mean
    // the "uncapped" path silently reintroduced a global ordering step
    val full = graft.ops.GraphOps.coocEdgesByThreshold(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").cast("string").as("subj_canonical"),
                col("lang").as("obj_canonical")))
    val plan = executed(full)
    assert(!plan.contains("Sort") && !plan.contains("TakeOrdered") &&
           !plan.contains("CollectLimit"),
           s"threshold edge derivation grew a sort/limit:\n$plan")
    assert(shuffles(full) == 1, s"expected exactly the groupBy exchange:\n$plan")
  }

  test("sampling is shuffle-free; packing shuffles once (per-stream window)") {
    val sample = SparkEntry.queries("text_sample")(spark, sf)
    assert(shuffles(sample) == 0,
           s"stratified sampling must be one narrow filtered scan:\n${executed(sample)}")
    val pack = SparkEntry.queries("text_pack")(spark, sf)
    assert(shuffles(pack) == 1,
           s"packing must shuffle exactly once (stream partition):\n${executed(pack)}")
  }

  test("relational aggregation is whole-stage codegen'd") {
    val df = SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
    df.collect()
    val gen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(gen.contains("WholeStageCodegen"), gen.take(500))
  }
}
