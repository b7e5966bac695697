package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>), Spark-first:
  *  - brute-force cosine top-k as the exactness baseline (broadcast the
  *    query side — the scan side streams, no shuffle before top-k);
  *  - random-hyperplane LSH bucketing as the 100 TB scale path (candidates
  *    only within shared buckets, then exact rerank).
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

  def cosX10000(a: Column, b: Column): Column =
    floor(lit(10000.0d) * dotExpr(a, b) / (normExpr(a) * normExpr(b))).cast("long")

  /** exact top-k cosine neighbors for each query vector (vec_id < nQueries)
    * — broadcast queries, stream the corpus, per-query top-k via window.
    * Deterministic tie-break on (sim desc, neighbor id). */
  def bruteForceTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
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

  /** deterministic pseudo-random hyperplanes: component h_{p,d} derived
    * from xxhash64(p, d), mapped to {-1, +1}. Signature bit p =
    * sign(sum_d h_{p,d} * v_d). */
  private def planeSignExpr(embedding: Column, plane: Int): Column = {
    val signedSum = aggregate(
      zip_with(embedding, sequence(lit(0), size(embedding) - 1),
               (x, d) => x.cast("double") *
                 when(xxhash64(lit(plane), d).bitwiseAND(lit(1L)) === 1L, lit(1.0d)).otherwise(lit(-1.0d))),
      lit(0.0d), (acc, x) => acc + x)
    when(signedSum >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** random-hyperplane LSH bucket id per vector (nPlanes-bit signature). */
  def lshBuckets(embeddings: DataFrame, nPlanes: Int = 12): DataFrame = {
    val sig = (0 until nPlanes).map(p => planeSignExpr(col("embedding"), p) * lit(1L << p))
      .reduce(_ + _)
    embeddings.select(col("vec_id"), col("embedding"), sig.as("bucket"))
  }

  /** ANN via LSH: candidates share a bucket (multi-probe: the exact bucket
    * plus its single-bit flips would go here; exact-bucket only for the
    * baseline), exact cosine rerank, per-query top-k. */
  def lshTopK(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5,
              nPlanes: Int = 12): DataFrame = {
    val bucketed = lshBuckets(embeddings, nPlanes)
    val queries = broadcast(
      bucketed.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket")))
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
}
