package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.pipeline.NerPos
import graft.tools.DumpNerFixtures

/** Differential test of the NER/POS assembly against the reference's
  * ner_pos_per_sentence driven by identical mock annotations (3000
  * fixtures incl. misplaced/negative span variants). */
class NerPosSpec extends AnyFunSuite {

  test("ner/pos assembly matches the reference on 3000 mock annotations") {
    val mapper = new ObjectMapper()
    val golden = mapper.readTree(getClass.getResourceAsStream("/golden_ner.json"))
    var checked = 0
    golden.forEach { g =>
      val i = g.get("id").asText().split("-")(1).toLong
      val (sent, toks) = DumpNerFixtures.genTokens(i)
      val res = NerPos.nerPosPerSentence(sent, Seq(toks))
      // mentions: word/label/span triplets in order
      val goldM = (0 until g.get("mentions").size()).map { j =>
        val m = g.get("mentions").get(j)
        (m.get("word").asText(), m.get("label").asText(),
         m.get("span").get(0).asInt(), m.get("span").get(1).asInt())
      }
      assert(res.mentions.map(m => (m.word, m.label, m.begin, m.end)) == goldM, s"n-$i mentions")
      assert(res.misplacedSpans == g.get("misplaced").asInt(), s"n-$i misplaced")
      // pos tags as sets (the reference's list(set(...)) order is
      // process-nondeterministic; the oracle sorts)
      val goldP = {
        val it = g.get("pos").fields()
        val b = Map.newBuilder[String, Set[String]]
        while (it.hasNext) {
          val e = it.next()
          b += e.getKey -> (0 until e.getValue.size()).map(j => e.getValue.get(j).asText()).toSet
        }
        b.result()
      }
      assert(res.posTags == goldP, s"n-$i pos tags")
      // ner bucket
      val goldB = {
        val it = g.get("bucket").fields()
        val b = Map.newBuilder[String, Int]
        while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asInt() }
        b.result()
      }
      assert(res.nerBucket == goldB, s"n-$i bucket")
      checked += 1
    }
    assert(checked == 3000)
  }
}
