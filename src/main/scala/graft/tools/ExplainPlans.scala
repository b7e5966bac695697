package graft.tools

import java.nio.file.{Files, Paths}
import graft.SparkEntry

/** Dumps explain("formatted") for every SparkEntry query — the
  * plan-quality audit trail (pushed filters, broadcast joins, shuffle
  * counts, WholeStageCodegen coverage). Usage:
  *   runMain graft.tools.ExplainPlans [sfDir] [outPath]
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val sb = new StringBuilder
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      sb.append(s"\n========== $name ==========\n")
      try {
        val df = fn(spark, sfDir)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        val plan = df.queryExecution.executedPlan.toString()
        val shuffles = "Exchange".r.findAllIn(plan).length
        sb.append(s"\n-- exchanges: $shuffles\n")
      } catch {
        case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote plans to $out")
    spark.stop()
  }
}
