package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.segment.Segmenter
import graft.synth.{FixtureParser, SynthDocs, Templates}

/** Consistency of the synthetic-corpus machinery:
  *  - FixtureParser must recover exactly the fixture parse + POS tags from
  *    the sentence surface (it is the pipeline's deterministic "model");
  *  - segmenting a generated document's text spans must recover exactly
  *    the fixture sentences (so the reference's words-concat==sentence
  *    alignment assert holds downstream).
  */
class SynthSpec extends AnyFunSuite {

  test("FixtureParser recovers parse and tags for 20k fixture sentences") {
    var bad = 0
    for (k <- 0L until 20000L) {
      val fx = Templates.generate(k)
      FixtureParser.analyze(fx.sentence) match {
        case Some((parse, tags)) =>
          if (parse != fx.parse || tags != fx.posTags) {
            if (bad < 3) info(s"mismatch at $k: ${fx.sentence}\n  ${fx.parse}\n  $parse\n  ${fx.posTags}\n  $tags")
            bad += 1
          }
        case None =>
          if (bad < 3) info(s"unparseable at $k: ${fx.sentence}")
          bad += 1
      }
    }
    assert(bad == 0, s"$bad fixture sentences failed round-trip")
  }

  test("segmentation recovers the fixture sentences from generated docs") {
    var bad = 0
    for (d <- 0L until 2000L) {
      val doc = SynthDocs.genDoc(d)
      val expected = SynthDocs.expectedSentences(d)
      val got = doc.spans.filter(_.kind == "text").flatMap(s => Segmenter.segment(s.text)).toVector
      if (got != expected) {
        if (bad < 3) info(s"doc $d:\n  expected: $expected\n  got: $got")
        bad += 1
      }
    }
    assert(bad == 0, s"$bad docs failed sentence recovery")
  }

  test("media spans carry refs, text spans carry text") {
    val doc = SynthDocs.genDoc(7)
    assert(doc.spans.nonEmpty)
    assert(doc.spans.forall(s => if (s.kind == "text") s.text != null && s.media_ref == null
                                 else s.text == null && s.media_ref != null))
    assert(doc.spans.map(_.offset) == doc.spans.indices.map(identity))
  }
}
