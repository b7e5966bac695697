package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators over the constructed knowledge graph.
  *
  * The reference stops at triple lists (its downstream, the entailment
  * graph builder, consumes merged rel files — `merge_parsed_results.py`);
  * at 100 TB the first thing a KG consumer asks of the triple table is
  * "which entities form one connected story?" — so components over the
  * entity co-occurrence graph ship as a first-class op, built on the same
  * pointer-jumped min-label propagation that backs dedup clustering.
  */
object GraphOps {

  /** one persistence point per iteration round, in one of two modes.
    * `reliable = false` (default): `localCheckpoint` — executor-local
    * blocks, no disk round-trip through a distributed store; fastest, but
    * on a real cluster an executor loss mid-iteration kills the job (the
    * truncated lineage cannot recompute). `reliable = true`: directory-
    * backed `checkpoint()` into `sparkContext.getCheckpointDir` — an
    * executor loss recovers by re-reading the checkpoint files, the
    * cluster-faithful mode for long iterative jobs. The round is
    * PERSISTED before checkpointing and always EAGER: Spark's reliable
    * checkpoint writer re-runs the plan in a second job unless the data
    * is cached (RDD.checkpoint's own contract), so persist-then-
    * checkpoint-then-unpersist turns the would-be double compute into
    * one compute + one cache-read write. Cost vs local mode: one extra
    * cached-write job per round (PageRank loses its one-job-for-all-
    * iterations laziness — the price of fault tolerance); files of
    * superseded rounds are reclaimed only when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (set it, or
    * clean the dir after the job). */
  private def persistRound(df: DataFrame, eager: Boolean, reliable: Boolean): DataFrame =
    if (!reliable) df.localCheckpoint(eager)
    else {
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ck = df.checkpoint(eager = true)
      df.unpersist(blocking = false)
      ck
    }

  private def requireCheckpointDir(df: DataFrame, reliable: Boolean): Unit =
    require(!reliable ||
        df.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable=true needs a checkpoint directory: call " +
        "spark.sparkContext.setCheckpointDir(<fault-tolerant path>) first " +
        "(an HDFS/object-store path on a cluster)")

  /** Connected components by min-label propagation WITH POINTER JUMPING
    * (the generic core behind `DedupOps.dedupClusters`, hoisted so it
    * serves any orderable node type — long doc ids there, string entity
    * names here; component id = the component's MIN node under the
    * column type's ordering).
    *
    * `pairs` carries one row per undirected edge in columns (u, v);
    * symmetrization happens inside — the INPUT plan is checkpointed FIRST
    * and the reversed direction derived from the checkpoint, so an
    * expensive upstream pair generator (shingle hashing, LSH banding)
    * runs exactly once, not once per union branch. Every round each node
    * takes the min of its neighbors' labels, then adopts its (new)
    * label's own label — label information travels multiplicatively, so
    * rounds scale with log(diameter), not diameter (the pointer-jumping
    * half of large-star/small-star). Per round: 3 bounded shuffles and
    * ONE eager job — the round result is marked for LAZY local
    * checkpointing (lineage truncation; superseded round checkpoints are
    * dereferenced and freed by Spark's ContextCleaner) and the action
    * that materializes it IS the convergence probe (count of decreased
    * labels), so there is no separate probe job. FAILS LOUDLY if not
    * converged within `maxIters` (a silent cap would emit wrong
    * components); no cartesian, no driver-side graph.
    *
    * Output: (node, component_id, is_root) — node's type preserved.
    *
    * `reliable = true` switches every per-round persistence point to a
    * directory-backed checkpoint (see [[persistRound]]) — identical
    * labels, executor-loss-survivable, one extra write+read per round. */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20,
                          reliable: Boolean = false): DataFrame = {
    requireCheckpointDir(pairs, reliable)
    val p0 = persistRound(pairs.select(col("u"), col("v")), eager = true, reliable)
    val edges = p0.union(p0.select(col("v").as("u"), col("u").as("v")))
    // label init rides the SAME aggregation that enumerates the nodes,
    // but starts at least(node, min neighbor) instead of node — one free
    // half-round of propagation inside the init shuffle (r9; initial
    // labels are still node ids within the component and monotonically
    // decreasing, so the fixpoint — the component min — is unchanged)
    var labels = persistRound(
      edges.groupBy(col("u"))
        .agg(least(col("u"), min(col("v"))).as("lbl"))
        .select(col("u").as("node"), col("lbl")),
      eager = true, reliable)
    var converged = labels.isEmpty
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = edges
        .join(labels.select(col("node").as("v"), col("lbl").as("vlbl")), Seq("v"))
        .groupBy(col("u").as("node"))
        .agg(min(col("vlbl")).as("nbr_min"))
      // the round's mid table feeds BOTH sides of the pointer-jump
      // self-join below (as itself and as the label-of-label lookup) with
      // different projections, so the exchanges never canonicalize equal
      // — without a pin the whole join+agg chain above executes once per
      // side, doubling every round (r9). Same persistence mode as the
      // round result: local blocks by default, directory-backed when
      // `reliable` (keeping the executor-loss contract within a round).
      val stepped = persistRound(
        labels.join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("lbl"),
                  least(col("lbl"), coalesce(col("nbr_min"), col("lbl"))).as("mid")),
        eager = false, reliable)
      // pointer jump: label values are themselves node ids in this table,
      // so each node can adopt its label's label within the same round
      val s2 = stepped.select(col("node").as("j_node"), col("mid").as("j_lbl"))
      // LAZY checkpoint: the convergence count below is the first action,
      // so one job both materializes the round's partitions (cached by the
      // local-checkpoint mechanism) and answers "any label decreased?"
      val jumped = persistRound(
        stepped.join(s2, stepped("mid") === s2("j_node"), "left")
          .select(stepped("node"), stepped("lbl"),
                  least(col("mid"), coalesce(col("j_lbl"), col("mid"))).as("lbl2")),
        eager = false, reliable)
      converged = jumped.filter(col("lbl2") < col("lbl")).count() == 0
      labels = jumped.select(col("node"), col("lbl2").as("lbl"))
      it += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxIters rounds — component " +
        "diameter exceeds ~2^rounds; raise maxIters")
    labels.select(col("node"), col("lbl").as("component_id"),
                  (col("node") === col("lbl")).as("is_root"))
  }

  /** Entity co-occurrence edges from the canonical triple table: one
    * undirected edge per (subj_canonical, obj_canonical) pair, weighted
    * by triple count, restricted to the `topK` STRONGEST edges under a
    * deterministic total order (weight desc, then pair). The cap is the
    * scale contract: components below run over a bounded edge set no
    * matter how large the corpus — the global top-k is a
    * TakeOrderedAndProject (per-partition heap + driver merge), never a
    * full sort. String order note: pair normalization and the tiebreak
    * use binary string order, identical across Spark and DuckDB for the
    * BMP-only corpus (same caveat as entailmentEdges). */
  def coocEdges(canonical: DataFrame, topK: Int = 2000): DataFrame =
    canonical
      .filter(col("subj_canonical").isNotNull && col("obj_canonical").isNotNull &&
              col("subj_canonical") =!= col("obj_canonical"))
      .select(least(col("subj_canonical"), col("obj_canonical")).as("ent_a"),
              greatest(col("subj_canonical"), col("obj_canonical")).as("ent_b"))
      .groupBy(col("ent_a"), col("ent_b"))
      .agg(count(lit(1)).as("n_cooc"))
      .orderBy(desc("n_cooc"), col("ent_a"), col("ent_b"))
      .limit(topK)

  /** Entity co-occurrence edges bounded by a WEIGHT THRESHOLD instead of
    * a global top-K: every pair co-occurring at least `minCooc` times.
    * This is the UNCAPPED-coverage alternative to [[coocEdges]] for a
    * consumer that needs the whole graph above a support floor (top-K
    * keeps the K strongest edges globally; a threshold keeps every edge
    * that clears the bar, however many). The plan is one aggregation plus
    * a post-aggregation filter — NO global sort, NO limit appears
    * anywhere (gated in PlanQualitySpec), so it scales like any groupBy:
    * the output is bounded by the support floor, not by a constant.
    * Pick `minCooc` from a [[SkewOps.keySkew]]-style support histogram —
    * at 100 TB, minCooc=1 would keep every hapax pair (the full quadratic
    * fringe); real corpora concentrate mass, so a small floor drops the
    * overwhelmingly-singleton tail while keeping ALL repeated structure. */
  def coocEdgesByThreshold(canonical: DataFrame, minCooc: Long = 2): DataFrame =
    canonical
      .filter(col("subj_canonical").isNotNull && col("obj_canonical").isNotNull &&
              col("subj_canonical") =!= col("obj_canonical"))
      .select(least(col("subj_canonical"), col("obj_canonical")).as("ent_a"),
              greatest(col("subj_canonical"), col("obj_canonical")).as("ent_b"))
      .groupBy(col("ent_a"), col("ent_b"))
      .agg(count(lit(1)).as("n_cooc"))
      .filter(col("n_cooc") >= minCooc)

  /** Components of the strongest-co-occurrence entity graph:
    * (entity, component_id, is_root), component id = min entity name. */
  def coocComponents(canonical: DataFrame, topK: Int = 2000,
                     maxIters: Int = 20, reliable: Boolean = false): DataFrame =
    componentsOnEdges(coocEdges(canonical, topK), maxIters, reliable)

  /** [[coocComponents]] over the UNCAPPED weight-threshold graph
    * ([[coocEdgesByThreshold]]): full coverage above the support floor,
    * same pointer-jumped CC core, no global sort in the edge derivation. */
  def coocComponentsFull(canonical: DataFrame, minCooc: Long = 2,
                         maxIters: Int = 20, reliable: Boolean = false): DataFrame =
    componentsOnEdges(coocEdgesByThreshold(canonical, minCooc), maxIters, reliable)

  private def componentsOnEdges(edges: DataFrame, maxIters: Int,
                                reliable: Boolean = false): DataFrame =
    connectedComponents(
      edges.select(col("ent_a").as("u"), col("ent_b").as("v")), maxIters, reliable)
      .select(col("node").as("entity"), col("component_id"), col("is_root"))

  /** Entity importance: PageRank over the strongest-co-occurrence graph
    * in FIXED-POINT INTEGER arithmetic — rank ×10⁹ as BIGINT, neighbor
    * contributions floor-divided by degree, damping 0.85 applied as
    * (850·sum) div 1000, a FIXED `iters` power iterations (no float
    * anywhere, so there is no summation-order hazard and an external SQL
    * engine reproduces every rank bit-exactly; a ring graph is an exact
    * fixed point at 10⁹). The symmetrized graph has no dangling nodes by
    * construction (every node has degree ≥ 1). Per iteration: one join
    * against the (bounded, top-K) edge set + one aggregation. Unlike
    * [[connectedComponents]] there is no per-round decision to make (the
    * iteration count is FIXED), so no per-round action is needed either:
    * each iteration is marked for LAZY local checkpointing (lineage/plan
    * truncation point) and the whole power iteration materializes in ONE
    * job when the result is consumed — iters× fewer job round-trips than
    * an eager checkpoint per iteration. */
  def entityPageRank(canonical: DataFrame, topK: Int = 2000,
                     iters: Int = 10, reliable: Boolean = false): DataFrame =
    pageRankOnEdges(coocEdges(canonical, topK), iters, reliable)

  /** [[entityPageRank]] over the UNCAPPED weight-threshold graph
    * ([[coocEdgesByThreshold]]) — the documented route for ranking the
    * ENTIRE entailment-relevant co-occurrence graph, not just the K
    * strongest edges. Same fixed-point BIGINT arithmetic (bit-exactly
    * reproducible), same per-iteration join+agg shape; the edge set is
    * bounded by the support floor instead of a constant. */
  def entityPageRankFull(canonical: DataFrame, minCooc: Long = 2,
                         iters: Int = 10, reliable: Boolean = false): DataFrame =
    pageRankOnEdges(coocEdgesByThreshold(canonical, minCooc), iters, reliable)

  private def pageRankOnEdges(e0: DataFrame, iters: Int,
                              reliable: Boolean = false): DataFrame = {
    requireCheckpointDir(e0, reliable)
    val edges = e0.select(col("ent_a").as("u"), col("ent_b").as("v"))
      .union(e0.select(col("ent_b").as("u"), col("ent_a").as("v")))
    val withDeg = persistRound(
      edges.join(edges.groupBy("u").agg(count(lit(1)).as("d")), "u"),
      eager = true, reliable)  // (u, v, d) — reused every iteration
    var rank = withDeg.select(col("u").as("node")).distinct()
      .withColumn("pr", lit(1000000000L))
    for (i <- 1 to iters) {
      val next = withDeg.join(rank, withDeg("u") === rank("node"))
        .groupBy(col("v"))
        .agg(sum(expr("pr div d")).as("contrib"))
        .select(col("v").as("node"),
                expr("150000000 + (850 * contrib) div 1000").as("pr"))
      // persistence CADENCE (r9): under AQE a localCheckpoint
      // materializes its adaptive stages at CONSTRUCTION, so a per-
      // iteration checkpoint turns the power iteration into iters×
      // stage-job barriers (48 jobs measured for the 10-iteration
      // full-graph rank). Checkpointing every 5th round (and the last)
      // keeps the plan/lineage bounded at ≤5 chained join+agg pairs
      // while letting AQE run each 5-round block as one execution.
      // `reliable` mode keeps the per-round directory checkpoint — its
      // contract is executor-loss recovery, not job-count.
      rank =
        if (reliable) persistRound(next, eager = false, reliable)
        else if (i % 5 == 0 || i == iters) next.localCheckpoint(eager = false)
        else next
    }
    rank.select(col("node").as("entity"), col("pr").as("rank_x1e9"))
  }
}
