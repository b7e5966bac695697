package graft.tools
import graft.Bench
object ProfKg {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0) else "8"
    val ns = if (args.length > 1) args(1).split(",").map(_.toLong).toSeq else Seq(40000L, 80000L, 160000L)
    val spark = Bench.buildSession(cpus)
    Bench.kgRun(spark, 2000)
    for (n <- ns; rep <- 1 to 2) {
      val (d, t, s) = Bench.kgRun(spark, n)
      println(f"PROF cpus=$cpus n=$d rep=$rep triples=$t sec=$s%.2f docs_per_sec=${d/s}%.0f")
    }
    spark.stop()
  }
}
