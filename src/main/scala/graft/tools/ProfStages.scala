package graft.tools
import graft.amend.{Amender, PostProcess}
import graft.extract.{DepTree, Extractor}
import graft.segment.Segmenter
import graft.synth.{FixtureParser, Templates}
/** per-stage engine microprofile (single thread). */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val fxs = (0 until n).map(k => Templates.generate(k.toLong).sentence).toArray
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-12s ${(System.nanoTime()-t0)/1e9}%.2fs  (check=$r)")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("generate") { (0 until n).map(k => Templates.generate(k.toLong).sentence.length.toLong).sum }
      time("segment") { fxs.map(s => Segmenter.segment(s).length.toLong).sum }
      time("analyze") { fxs.map(s => FixtureParser.analyze(s).map(_._1.length).getOrElse(0).toLong).sum }
      val parsed = fxs.flatMap(FixtureParser.analyze)
      time("tree") { parsed.map(p => new DepTree(p._1).n.toLong).sum }
      time("extract") { parsed.map { case (p, _) =>
        val t = new DepTree(p)
        (new Extractor(t, false).parse().length + new Extractor(t, true).parse().length).toLong }.sum }
      time("full") { parsed.map { case (p, tg) =>
        val r = PostProcess.processSentence(p, Some(tg)); (r.fine.length + r.amendFine.length).toLong }.sum }
    }
  }
}
