package graft.tools

/** reproduce Bench's exact query-call pattern for the first few queries to
  * isolate cold-start vs steady-state wall time (dev tool). */
object ProfBenchOrder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.Bench.kgRun(spark, 2000); graft.Bench.kgRun(spark, 2000)
    for (name <- Seq("ann_brute", "ann_lsh", "dedup_minhash_cand", "ann_brute", "ann_lsh")) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    spark.stop()
  }
}
