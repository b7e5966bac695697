package graft.tools
import graft.amend.{Amender, PostProcess}
import graft.extract.{DepTree, Extractor}
import graft.synth.{FixtureParser, Templates}
object ProfAmend {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val parsed = (0 until n).flatMap(k => FixtureParser.analyze(Templates.generate(k.toLong).sentence)).toArray
    val pre = parsed.map { case (p, tg) =>
      val tree = new DepTree(p)
      val fe = new Extractor(tree, false)
      val ce = new Extractor(tree, true)
      val f = PostProcess.tokenNormalize(PostProcess.translateNaryToBinaries(PostProcess.reformat(fe.parse())))
      val c = PostProcess.tokenNormalize(PostProcess.translateNaryToBinaries(PostProcess.reformat(ce.parse())))
      (p, tg, f, c, ce)
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-10s ${(System.nanoTime()-t0)/1e9}%.2fs (check=$r)")
    }
    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      time("prep") { parsed.map { case (p, _) =>
        val tree = new DepTree(p)
        val f = PostProcess.tokenNormalize(PostProcess.translateNaryToBinaries(PostProcess.reformat(new Extractor(tree, false).parse())))
        val c = PostProcess.tokenNormalize(PostProcess.translateNaryToBinaries(PostProcess.reformat(new Extractor(tree, true).parse())))
        (f.length + c.length).toLong }.sum }
      time("amend") { pre.map { case (p, tg, f, c, _) =>
        Amender.amendSentence(p, f, c, Some(tg)).amendFine.length.toLong }.sum }
      time("nct") { pre.map { case (p, _, f, _, _) =>
        PostProcess.checkNct(f, p).length.toLong }.sum }
      time("filter") { pre.map { case (_, _, f, _, _) =>
        PostProcess.filterTriplesStopwords(f).length.toLong }.sum }
      time("coarsify") { pre.map { case (_, _, _, c, ce) =>
        PostProcess.coarsify(ce, PostProcess.onlyKeepSvo(c)).length.toLong }.sum }
    }
  }
}
