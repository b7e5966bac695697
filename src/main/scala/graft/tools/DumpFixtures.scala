package graft.tools

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.synth.{RandomTrees, Templates}

/** Dumps the first N deterministic fixture sentences as JSON for the
  * differential-test oracle harness (which replays them through the
  * reference implementation in its ready-parse mode). */
object DumpFixtures {
  def main(args: Array[String]): Unit = {
    val count = if (args.nonEmpty) args(0).toInt else 2000
    val out = if (args.length > 1) args(1) else "/tmp/fixtures.json"
    val mode = if (args.length > 2) args(2) else "templates"
    // fresh-seed batteries: generate a DISJOINT k-range (the generators
    // are pure functions of k)
    val offset = if (args.length > 3) args(3).toLong else 0L
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    for (k <- offset until offset + count.toLong) {
      val fx = if (mode == "random") RandomTrees.generate(k) else Templates.generate(k)
      val node = mapper.createObjectNode()
      node.put("id", fx.id)
      node.put("k", k)
      node.put("sentence", fx.sentence)
      val parse = mapper.createObjectNode()
      val w = mapper.createArrayNode(); fx.parse.words.foreach(w.add)
      val h = mapper.createArrayNode(); fx.parse.heads.foreach(h.add)
      val d = mapper.createArrayNode(); fx.parse.deprels.foreach(d.add)
      parse.replace("word", w); parse.replace("head", h); parse.replace("deprel", d)
      node.replace("parse", parse)
      val pt = mapper.createObjectNode()
      fx.posTags.foreach { case (word, tags) =>
        val ta = mapper.createArrayNode(); tags.foreach(ta.add); pt.replace(word, ta)
      }
      node.replace("pos_tags", pt)
      arr.add(node)
    }
    Files.write(Paths.get(out), mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
    println(s"wrote $count fixtures to $out")
  }
}
