package graft.tools

import graft.ops.DedupOps

/** Stage-split profiler for dedup_ngram (dev tool), built to pin down the
  * round-6 driver-box constant: the same query ran 14-17 s on the driver
  * box vs 2.4 s here at identical sf/commit while every sibling query
  * agreed across boxes. Splits the op into its three plan segments and
  * times each IDLE and under SYNTHETIC CPU CONTENTION (background spinner
  * threads emulate a loaded shared host), so "which stage absorbs the
  * contention" is measured, not guessed.
  *
  * Stages (cumulative — each includes its predecessors; the deltas are
  * the per-stage costs):
  *   s1_explode  scan → tokenize → distinct-gram explode → 48-bit hash
  *   s2_buckets  + groupBy(gram_h) collect_list + bucket-size filter
  *   s3_pairs    + local pairwise flatMap emission
  *   s4_full     + final (a,b) aggregation + Jaccard filter (the query)
  *
  * Usage: runMain graft.tools.ProfNgram [sfDir] [contendThreads]
  */
object ProfNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val contendThreads =
      if (args.length > 1) args(1).toInt
      else Runtime.getRuntime.availableProcessors()
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // the stages COMPOSE DedupOps' own private[graft] sub-plan builders —
    // the shipped query is ngramPairEmission(ngramBuckets(ngramGramTable))
    // + the final aggregation, so the decomposition can never desync from
    // what s4 actually runs
    def s1() = DedupOps.ngramGramTable(docs)
    def s2() = DedupOps.ngramBuckets(s1())
    def s3() = DedupOps.ngramPairEmission(s2())
    def s4() = DedupOps.ngramJaccardPairs(docs)

    val stages = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "s1_explode" -> (() => s1()), "s2_buckets" -> (() => s2()),
      "s3_pairs" -> (() => s3()), "s4_full" -> (() => s4().toDF()))

    def time(f: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f().count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def pass(tag: String): Map[String, Double] =
      stages.map { case (name, f) =>
        val samples = (1 to 3).map(_ => time(f))
        val best = samples.map(_._1).min
        println(f"[$tag] $name%-12s min ${best}%7.2f s  " +
          f"(all ${samples.map(s => f"${s._1}%.2f").mkString("/")}, ${samples.head._2} rows)")
        name -> best
      }.toMap

    // warmup (codegen + page cache)
    stages.foreach { case (_, f) => f().count() }
    val idle = pass("idle")

    // synthetic contention, two flavors: pure-CPU spinners (timeshare
    // pressure — a co-tenant bench session) and ALLOCATING spinners
    // (GC/memory-bandwidth pressure inside this very JVM — the round-6
    // driver-box suspicion). mode = args(2): cpu | alloc | both
    val mode = if (args.length > 2) args(2) else "cpu"
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    def spin(i: Int): Runnable = () => {
      var x = i.toLong
      while (!stop.get()) { x = x * 6364136223846793005L + 1442695040888963407L }
      if (x == 42L) println(x) // defeat dead-code elimination
    }
    def alloc(i: Int): Runnable = () => {
      var keep: Array[Array[Byte]] = new Array(64) // rolling live set
      var x = i
      while (!stop.get()) {
        keep(x & 63) = new Array[Byte](64 * 1024)
        x += 1
      }
      if (keep.length == 0) println("?")
    }
    val spinners = (0 until contendThreads).map { i =>
      val body = mode match {
        case "alloc" => alloc(i)
        case "both"  => if (i % 2 == 0) spin(i) else alloc(i)
        case _       => spin(i)
      }
      val t = new Thread(body, s"contend-$mode-$i")
      t.setDaemon(true); t.start(); t
    }
    val loaded = pass(s"contend-$mode-$contendThreads")
    stop.set(true); spinners.foreach(_.join(1000))

    println("\nstage        idle(s)  contended(s)  slowdown")
    for ((name, _) <- stages) {
      val (a, b) = (idle(name), loaded(name))
      println(f"$name%-12s $a%7.2f  $b%12.2f  ${b / a}%8.2fx")
    }
    println("\ndelta costs (stage minus predecessor):")
    val order = stages.map(_._1)
    for (i <- order.indices) {
      val prev = if (i == 0) 0.0 else idle(order(i - 1))
      val prevL = if (i == 0) 0.0 else loaded(order(i - 1))
      println(f"${order(i)}%-12s idle ${idle(order(i)) - prev}%7.2f  " +
        f"contended ${loaded(order(i)) - prevL}%7.2f")
    }
    spark.stop()
  }
}
