package graft.tools

import graft.amend.PostProcess
import graft.synth.{FixtureParser, Templates}
import graft.segment.Segmenter
import java.util.concurrent.{Executors, TimeUnit}

/** Pure-JVM engine throughput harness (no Spark): N threads over fixture
  * sentences. Used standalone for profiling and by the multi-process
  * executor-emulation bench (each OS process = one emulated executor).
  * Args: threads nSents reps offset. Prints per-rep lines and a final
  * one-line JSON with the median. */
object ProfPure {

  def run(threads: Int, nSents: Int, offset: Long): (Long, Double) = {
    val pool = Executors.newFixedThreadPool(threads)
    val totals = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val per = nSents / threads
    val futures = (0 until threads).map { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var triples = 0L
          var k = offset + t.toLong * per
          val end = k + per
          while (k < end) {
            val fx = Templates.generate(k)
            val sents = Segmenter.segment(fx.sentence)
            for (s <- sents; (p, tg) <- FixtureParser.analyze(s)) {
              val r = PostProcess.processSentence(p, Some(tg))
              triples += r.fine.size + r.coarse.size + r.amendFine.size + r.amendCoarse.size + r.possible.size
            }
            k += 1
          }
          totals.addAndGet(triples)
        }
      })
    }
    futures.foreach(_.get)
    pool.shutdown(); pool.awaitTermination(5, TimeUnit.MINUTES)
    (totals.get(), (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val threads = if (args.nonEmpty) args(0).toInt else 8
    val nSents = if (args.length > 1) args(1).toInt else 400000
    val reps = if (args.length > 2) args(2).toInt else 5
    val offset = if (args.length > 3) args(3).toLong else 0L
    // warmup until throughput stabilizes (C2 on the big rule methods)
    for (_ <- 1 to 3) run(threads, nSents, offset)
    val measured = (1 to reps).map { rep =>
      val (tr, sec) = run(threads, nSents, offset)
      println(f"PURE threads=$threads rep=$rep sents=$nSents sec=$sec%.2f sents_per_sec=${nSents / sec}%.0f triples=$tr")
      (tr, sec)
    }
    val med = measured.sortBy(_._2).apply(reps / 2)
    println(f"""{"threads":$threads,"sents":$nSents,"median_sec":${med._2}%.3f,"sents_per_sec":${nSents / med._2}%.1f,"triples_per_sec":${med._1 / med._2}%.1f}""")
  }
}
