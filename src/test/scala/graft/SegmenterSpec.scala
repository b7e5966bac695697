package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.segment.Segmenter
import graft.tools.DumpSplitTexts

/** Differential test of the sentence splitter against the reference's
  * split_str (goldens in golden_splits.json, produced by replaying the
  * same deterministic text battery through /root/reference). */
class SegmenterSpec extends AnyFunSuite {

  test("splitStr matches the reference on the text battery") {
    val mapper = new ObjectMapper()
    val stream = getClass.getResourceAsStream("/golden_splits.json")
    assert(stream != null, "golden_splits.json missing")
    val golden = mapper.readTree(stream)
    val texts = DumpSplitTexts.texts
    assert(golden.size() == texts.length, s"golden has ${golden.size()}, battery has ${texts.length}")
    val mismatches = scala.collection.mutable.ListBuffer.empty[String]
    for (i <- texts.indices) {
      val ours = Segmenter.splitStr(Seq(texts(i)))
      val g = golden.get(i)
      val goldSents = (0 until g.get("sentences").size()).map(j => g.get("sentences").get(j).asText())
      val goldIdxs = (0 until g.get("idxs").size()).map(j => g.get("idxs").get(j).asInt())
      if (ours.map(_._1) != goldSents || ours.map(_._2) != goldIdxs) {
        mismatches += s"text #$i\n  ref:  $goldSents\n  ours: ${ours.map(_._1)}"
      }
    }
    if (mismatches.nonEmpty) fail(s"${mismatches.size} mismatches:\n${mismatches.take(5).mkString("\n\n")}")
  }

  test("normalization strips whitespace, hashes and double colons") {
    assert(Segmenter.tokNorm(Seq("空  格 与\t制表符呀", "", "#井::号")) == Vector("空格与制表符呀", "井号"))
  }

  test("supplementary-plane chars: code-point lengths, no mid-surrogate splits") {
    val extB = new String(Character.toChars(0x20000)) // 𠀀 (CJK ext-B, 2 UTF-16 units)
    // a long sentence mixing BMP Chinese with ext-B chars: every re-split
    // piece must be well-formed (no lone surrogates at the boundaries)
    val long = ("中文字符串片段，" + extB) * 80 // 720 code points, 800 UTF-16 units
    val pieces = Segmenter.splitLongSentences(long)
    assert(pieces.nonEmpty)
    for (p <- pieces) {
      assert(!Character.isLowSurrogate(p.head), s"piece starts mid-pair: ${p.take(4)}")
      assert(!Character.isHighSurrogate(p.last), s"piece ends mid-pair: ${p.takeRight(4)}")
    }
    // admission window counts code points (Python len), not UTF-16 units:
    // 480 code points of which 430 zh → admitted whole (UTF-16 len is 530,
    // which a code-unit check would have re-split)
    val s = "中" * 380 + extB * 50 + "，" + "中" * 49
    val out = Segmenter.splitStr(Seq(s))
    assert(out.map(_._1) == Vector(s), out.map(_._1).toString)
  }
}
