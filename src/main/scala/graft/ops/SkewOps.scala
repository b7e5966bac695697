package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shuffle-key skew diagnostics.
  *
  * At 100 TB the difference between a job that finishes and one that
  * straggles is usually ONE hot shuffle key (for this engine: copula-
  * family predicates concentrating entailment-edge mass — the reason
  * `Pipeline.entailmentEdges` salts). This report is what an operator
  * runs BEFORE picking salt factors: per-key row counts, global share,
  * multiple-of-mean, and a hot flag, for the heaviest keys.
  */
object SkewOps {

  /** Key-distribution report for a prospective shuffle key.
    *
    * Output (one row per top-`topN` key, heaviest first):
    * key, n_rows, rank, share_x10000 (floor of fraction-of-total ×10⁴),
    * mult_x1000 (floor of multiple-of-mean ×10³), is_hot
    * (mean-multiple > hotMultX1000/1000 — keys that need salting).
    *
    * Scale shape: one hash aggregation over the input (map-side
    * combined), a two-number global total over the REDUCED key table,
    * and a global top-N that is TakeOrderedAndProject (per-partition
    * heap + driver merge — never a full sort). The rank window runs over
    * ≤ topN already-selected rows, so the single-partition window sort
    * is bounded by the report size, not the key cardinality. All derived
    * measures are fixed-point integer math so an external engine can
    * recompute them bit-exactly.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 100,
              hotMultX1000: Long = 8000L): DataFrame = {
    val keyed = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = keyed.agg(sum(col("n_rows")).as("total"),
                           count(lit(1)).as("n_keys"))
    keyed.orderBy(desc("n_rows"), col("key")).limit(topN)
      .crossJoin(broadcast(totals))
      .withColumn("rank",
        row_number().over(Window.orderBy(desc("n_rows"), col("key"))))
      .select(col("key"), col("n_rows"), col("rank"),
        ((lit(10000L) * col("n_rows")) / col("total")).cast("long").as("share_x10000"),
        ((lit(1000L) * col("n_rows") * col("n_keys")) / col("total")).cast("long").as("mult_x1000"),
        (lit(1000L) * col("n_rows") * col("n_keys") >
          lit(hotMultX1000) * col("total")).as("is_hot"))
  }
}
