package graft.tools

import graft.amend.PostProcess
import graft.model.DepParse
import graft.synth.Templates

/** Library-surface demo: extract triples for fixture sentences (or a
  * custom parse) and print every relation list. Usage:
  *   runMain graft.tools.ExtractDemo [k ...]
  */
object ExtractDemo {
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toLong).toSeq else Seq(0L, 4L, 6L, 12L, 16L)
    for (k <- ks) {
      val fx = Templates.generate(k)
      println(s"== ${fx.id}  ${fx.sentence}")
      println(s"   parse: ${fx.parse.words.mkString(" ")} | ${fx.parse.deprels.mkString(" ")}")
      val rels = PostProcess.processSentence(fx.parse, Some(fx.posTags))
      def show(name: String, rs: Vector[graft.model.Rel]): Unit =
        if (rs.nonEmpty) rs.foreach(r => println(f"   $name%-12s (${r.subj.getOrElse("∅")}, ${r.pred}, ${r.obj.getOrElse("∅")})"))
      show("fine", rels.fine)
      show("coarse", rels.coarse)
      show("amend_fine", rels.amendFine)
      show("amend_coarse", rels.amendCoarse)
      show("possible", rels.possible)
    }
  }
}
