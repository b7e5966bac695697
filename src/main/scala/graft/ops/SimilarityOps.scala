package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.PortableHash

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), Spark-first:
  *  - brute-force cosine top-k as the exactness baseline (broadcast the
  *    query side — the scan side streams, no shuffle before top-k);
  *  - random-hyperplane LSH bucketing with single-bit multi-probe as a
  *    100 TB scale path (candidates only within probed buckets, then exact
  *    rerank);
  *  - IVF (inverted-file) cluster pruning as the second scale path: a
  *    small deterministic codebook, corpus partitioned into inverted
  *    lists by nearest centroid, queries scan only their nProbe nearest
  *    lists.
  * Hyperplane components are PortableHash.planeSign values — deterministic,
  * data-independent, and recomputable by the driver's DuckDB oracle — so
  * Spark folds them into literal arrays at plan time (zero per-row hashing).
  * Similarities are x10000 fixed-point (floored) for oracle-stable
  * comparison.
  */
object SimilarityOps {

  def dotExpr(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0d), (acc, x) => acc + x)

  def normExpr(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
                   lit(0.0d), (acc, x) => acc + x))

  /** the Catalyst higher-order-function composition — kept as the
    * equivalence reference (ZhFunctionsSpec property-tests the native
    * expression against it); the shipped ops use the native form. */
  def cosX10000Composed(a: Column, b: Column): Column =
    floor(lit(10000.0d) * dotExpr(a, b) / (normExpr(a) * normExpr(b))).cast("long")

  /** fixed-point cosine via the native codegen'd expression (r9, guide
    * §4): one tight JVM loop per row instead of 3 interpreted
    * per-element HOF folds. Identical values and null semantics to
    * [[cosX10000Composed]]. Requires `ZhFunctions.register` on the
    * session — every op entry point here calls it (idempotent). */
  def cosX10000(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("cos_x10000", a, b)

  /** exact top-k cosine neighbors for each query vector (vec_id < nQueries)
    * — broadcast queries, stream the corpus, per-query top-k via window.
    * Deterministic tie-break on (sim desc, neighbor id). */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    graft.functions.ZhFunctions.register(embeddings.sparkSession) // native cos_x10000
    val queries = broadcast(
      embeddings.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val scored = embeddings.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
      .join(queries) // broadcast nested loop: |corpus| x nQueries
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_x10000", cosX10000(col("qe"), col("ne")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x10000").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x10000"))
  }

  /** signature bit p = sign(sum_d planeSign(p,d) * v_d); the plane is a
    * literal ±1 array folded at plan time (dim is fixed per table). */
  private def planeBitExpr(embedding: Column, plane: Int, dim: Int): Column = {
    val signs = (0 until dim).map(d => PortableHash.planeSign(plane, d))
    // native fdot (r9): same left-to-right double fold as the previous
    // aggregate(zip_with(...)) composition, one JVM loop per row
    val signedSum = org.apache.spark.sql.functions.call_function(
      "fdot", embedding, typedLit(signs))
    when(signedSum >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** embedding dimensionality, probed once from the first row (fixed per
    * table by construction). Costs one tiny eager job at plan-build time;
    * an EMPTY table yields dim 0 (the query then returns no rows) rather
    * than throwing. */
  def embeddingDim(embeddings: DataFrame): Int =
    embeddings.select(size(col("embedding"))).head(1)
      .headOption.map(_.getInt(0)).getOrElse(0)

  /** random-hyperplane LSH bucket id per vector (nPlanes-bit signature). */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int = 12): DataFrame = {
    graft.functions.ZhFunctions.register(embeddings.sparkSession) // native fdot
    val dim = embeddingDim(embeddings)
    val sig = (0 until nPlanes).map(p => planeBitExpr(col("embedding"), p, dim) * lit(1L << p))
      .reduce(_ + _)
    embeddings.select(col("vec_id"), col("embedding"), sig.as("bucket"))
  }

  /** ANN via LSH with single-bit multi-probe: each query probes its exact
    * bucket plus all nPlanes one-bit-flip buckets (candidate iff bucket
    * Hamming distance ≤ 1 — the flip recovers near neighbors that straddle
    * one hyperplane), exact cosine rerank, per-query top-k. The probe
    * expansion rides the small broadcast query side; the corpus side joins
    * on its single exact bucket, so corpus work stays O(|corpus|). */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5,
              nPlanes: Int = 12, multiProbe: Boolean = true): DataFrame = {
    graft.functions.ZhFunctions.register(embeddings.sparkSession) // native cos_x10000
    val bucketed = lshBuckets(embeddings, nPlanes)
    val qbase = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val probeBuckets =
      if (!multiProbe) array(col("bucket"))
      else array(col("bucket") +: (0 until nPlanes).map(b =>
        col("bucket").bitwiseXOR(lit(1L << b))): _*)
    val queries = broadcast(
      qbase.select(col("query_id"), col("qe"), explode(probeBuckets).as("bucket")))
    val cands = bucketed.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("bucket"))
      .join(queries, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_x10000", cosX10000(col("qe"), col("ne")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x10000").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x10000"))
  }

  /** IVF (inverted-file) ANN — cluster-pruned search:
    *  1. coarse quantizer: `nCentroids` seed vectors chosen by a portable
    *     content-independent hash of vec_id (deterministic AND
    *     recomputable by the DuckDB oracle; a production deployment would
    *     train k-means offline and broadcast the codebook through the
    *     same literal seam);
    *  2. every corpus vector joins the inverted list of its nearest
    *     centroid (max fixed-point cosine, tie → lowest centroid id) —
    *     one narrow projection over the corpus;
    *  3. each query probes its `nProbe` nearest centroids and reranks
    *     EXACTLY only within those lists (broadcast query side, corpus
    *     work stays O(|corpus|), like lshTopK).
    * The codebook is a driver collect of nCentroids rows (tiny, like a
    * broadcast dim table). A real 100 TB corpus varies nCentroids ~
    * sqrt(n): above `literalCodebookMax` centroids the codebook is
    * attached as a ONE-ROW BROADCAST side (array<struct<cid,ce>> riding a
    * broadcast variable) instead of plan-inlined literal arrays — same
    * per-row argmin, zero shuffle, but the PLAN stays O(1) no matter how
    * many centroids (a √n-sized literal codebook would bloat analysis/
    * codegen and can exceed the JVM method-size limit). Results are
    * identical across modes (asserted in OpsSpec). */
  def ivfTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5,
              nCentroids: Int = 8, nProbe: Int = 2,
              literalCodebookMax: Int = 64): DataFrame = {
    graft.functions.ZhFunctions.register(embeddings.sparkSession) // native md5_long48
    val seedHash = PortableHash.md5Long48(
      concat(lit("ivf:"), col("vec_id").cast("string")))
    val centroids: Array[Seq[Double]] = embeddings
      .orderBy(seedHash, col("vec_id"))
      .limit(nCentroids)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble))
    if (centroids.isEmpty)
      // empty corpus → empty result with the contract schema
      return embeddings.sparkSession.emptyDataFrame
        .withColumn("query_id", lit(0L)).withColumn("rank", lit(0))
        .withColumn("neighbor_id", lit(0L)).withColumn("cos_x10000", lit(0L))
        .limit(0)
    val useLiteral = centroids.length <= literalCodebookMax
    // (neg cosine, cid) structs over the codebook: array_min / array_sort
    // give argmax-cosine with the lowest-cid tie-break — same expression
    // shape whether the codebook is literal or broadcast
    def cells(v: Column): Column =
      if (useLiteral)
        array(centroids.zipWithIndex.map {
          case (c, i) => struct((-cosX10000(v, typedLit(c))).as("neg"), lit(i).as("cid"))
        }: _*)
      else
        transform(col("_codebook"), c =>
          struct((-cosX10000(v, c.getField("ce"))).as("neg"),
                 c.getField("cid").as("cid")))
    def assignExpr(v: Column): Column = array_min(cells(v)).getField("cid")
    def probeExpr(v: Column): Column =
      slice(transform(array_sort(cells(v)), s => s.getField("cid")), 1, nProbe)
    val base =
      if (useLiteral) embeddings
      else {
        import embeddings.sparkSession.implicits._
        val cb = Seq(Tuple1(centroids.zipWithIndex.map { case (c, i) => (i, c) }))
          .toDF("cb")
          .select(transform(col("cb"), e =>
            struct(e.getField("_1").as("cid"), e.getField("_2").as("ce")))
            .as("_codebook"))
        embeddings.crossJoin(broadcast(cb)) // one broadcast row, no shuffle
      }
    val assigned = base.select(
      col("vec_id"), col("embedding"), assignExpr(col("embedding")).as("cid"))
    val queries = broadcast(
      base.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
                explode(probeExpr(col("embedding"))).as("cid")))
    val cands = assigned
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"), col("cid"))
      .join(queries, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos_x10000", cosX10000(col("qe"), col("ne")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_x10000").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_x10000"))
  }
}
