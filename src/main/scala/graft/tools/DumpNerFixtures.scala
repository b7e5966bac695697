package graft.tools

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import graft.pipeline.NerPos.AnnToken
import graft.synth.{FixtureParser, Templates}

/** Fixtures for the NER/POS assembly differential: mock annotation tokens
  * (word, pos, ner, char span) over fixture sentences, with deterministic
  * span corruption (i%6==1 offset shift, i%10==4 negative begin) to
  * exercise the misplaced-span accounting. */
object DumpNerFixtures {
  val N = 3000

  def ner(word: String): String =
    if (Templates.persons.contains(word)) "PERSON"
    else if (Templates.orgs.contains(word)) "ORGANIZATION"
    else if (Templates.places.contains(word)) "LOCATION"
    else if (word == "123" || word == "3.14") "PERCENT"
    else "O"

  def genTokens(i: Long): (String, Vector[AnnToken]) = {
    val fx = Templates.generate(i)
    val toks = FixtureParser.tokenize(fx.sentence).get
    var off = 0
    val out = toks.map { w =>
      var b = off
      var e = off + w.length
      if (i % 6 == 1 && ner(w) != "O") { b += 1; e += 1 } // misplaced shift
      if (i % 10 == 4 && ner(w) == "PERSON") { b = -w.length - 1 } // negative begin
      off += w.length
      AnnToken(w, fx.posTags.get(w).flatMap(_.headOption).getOrElse("X"), ner(w), b, e)
    }
    (fx.sentence, out)
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/ner_fixtures.json"
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    for (i <- 0L until N) {
      val (sent, toks) = genTokens(i)
      val node = mapper.createObjectNode()
      node.put("id", s"n-$i")
      node.put("sent", sent)
      val ta = mapper.createArrayNode()
      toks.foreach { t =>
        val o = mapper.createObjectNode()
        o.put("word", t.word); o.put("pos", t.pos); o.put("ner", t.ner)
        o.put("beginChar", t.beginChar); o.put("endChar", t.endChar)
        ta.add(o)
      }
      node.replace("tokens", ta)
      arr.add(node)
    }
    Files.write(Paths.get(out), mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
    println(s"wrote $N ner fixtures to $out")
  }
}
