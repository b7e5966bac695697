package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** dev-only: run one SparkEntry query N times and print per-Spark-job
  * wall times + stage task totals — shows where a multi-pin query's
  * wall clock goes. Usage: runMain graft.tools.ProfJobs <query> [runs] */
object ProfJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val done = scala.collection.mutable.ListBuffer.empty[(Int, Double, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(), js.stageInfos.map(_.numTasks).sum))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = jobs.get(je.jobId)
        if (st != null) done.synchronized {
          done += ((je.jobId, (System.nanoTime() - st._1) / 1e9, st._2))
        }
      }
    })
    val fn = graft.SparkEntry.queries(name)
    for (pass <- 1 to runs) {
      done.synchronized(done.clear())
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val snap = done.synchronized(done.toList)
      println(f"--- $name pass $pass: wall $wall%.3f s, ${snap.length} jobs, " +
        f"sum-job ${snap.map(_._2).sum}%.3f s")
      snap.sortBy(-_._2).take(12).foreach { case (id, s, nt) =>
        println(f"    job $id%3d  $s%6.3f s  ($nt tasks)")
      }
    }
    spark.stop()
  }
}
