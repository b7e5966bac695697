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
    * recompute them bit-exactly: products are taken in DECIMAL(38,0)
    * (1000·n_rows·n_keys exceeds a long right at the 10^12-row/10^6-key
    * design point this report exists for) and divisions use `div`, whose
    * integral-quotient semantics on decimals match BIGINT/HUGEINT floor
    * division for these positive values.
    */
  def keySkew(df: DataFrame, keyCol: String, topN: Int = 100,
              hotMultX1000: Long = 8000L): DataFrame = {
    val keyed = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_rows"))
    val totals = keyed.agg(sum(col("n_rows")).as("total"),
                           count(lit(1)).as("n_keys"))
    skewMeasures(
      keyed.orderBy(desc("n_rows"), col("key")).limit(topN)
        .crossJoin(broadcast(totals))
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("n_rows"), col("key")))),
      hotMultX1000)
  }

  /** the measure projection over (key, n_rows, rank, total, n_keys) —
    * split out so its overflow behavior is unit-testable with planted
    * petascale counts no test can materialize as rows. */
  private[graft] def skewMeasures(report: DataFrame,
                                  hotMultX1000: Long): DataFrame = {
    val big = "CAST(1000 AS DECIMAL(38,0))"
    report.select(col("key"), col("n_rows"), col("rank"),
      expr(s"CAST((CAST(10000 AS DECIMAL(38,0)) * n_rows) div total AS BIGINT)").as("share_x10000"),
      expr(s"CAST(($big * n_rows * n_keys) div total AS BIGINT)").as("mult_x1000"),
      expr(s"$big * n_rows * n_keys > CAST($hotMultX1000 AS DECIMAL(38,0)) * total")
        .as("is_hot"))
  }
}
