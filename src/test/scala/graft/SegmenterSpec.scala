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

  test("vocab normalization == char spec whenever the text stays in-vocab") {
    import graft.segment.VocabNormalizer
    // vocab covering every character of the battery (single-char tokens +
    // ##-continuations so non-CJK runs always decompose) — the two
    // normalization modes must then be IDENTICAL on the full fixture set
    val texts = DumpSplitTexts.texts ++
      (0L until 50L).map(i => graft.synth.SynthDocs.genDoc(i).spans
        .filter(_.kind == "text").map(_.text).mkString)
    val chars = texts.flatMap(_.toLowerCase.toSeq).toSet
    val vocab = chars.map(_.toString) ++ chars.map("##" + _)
    val vn = new VocabNormalizer(vocab)
    for (t <- texts) {
      val sents = Segmenter.splitStr(Seq(t)).map(_._1)
      assert(vn.normalize(sents) == Segmenter.tokNorm(sents),
             s"vocab mode diverged from char spec on: ${t.take(60)}")
      assert(Segmenter.segmentWithVocab(t, vn) == Segmenter.segment(t))
    }
  }

  test("vocab normalization drops out-of-vocab chars as [UNK]s, char spec keeps them") {
    import graft.segment.VocabNormalizer
    val vocab = "奇的很生字".map(_.toString).toSet // '怪' deliberately absent
    val vn = new VocabNormalizer(vocab)
    assert(vn.normalize(Seq("奇怪的")) == Vector("奇的"),
           "out-of-vocab char must drop via [UNK] removal")
    assert(Segmenter.tokNorm(Seq("奇怪的")) == Vector("奇怪的"))
    // a sentence that is ALL [UNK]s normalizes to empty and is discarded
    assert(vn.normalize(Seq("怪怪")) == Vector.empty)
    // '#' and '::' strip applies after the vocab round-trip too
    val vn2 = new VocabNormalizer(Set("井", "号", "#", ":", "##:"))
    assert(vn2.normalize(Seq("井#号::")) == Vector("井号"))
  }

  test("vocab normalization: WordPiece continuations for non-CJK runs, file load") {
    import graft.segment.VocabNormalizer
    // greedy longest-prefix with ## continuation, lowercased basic tokens
    val vn = new VocabNormalizer(Set("bert", "##模", "##型", "模", "型", "20", "##23"))
    assert(vn.tokenize("BERT模型2023") == Vector("bert", "模", "型", "20", "##23"))
    assert(vn.normalize(Seq("BERT模型2023")) == Vector("bert模型2023"))
    // an undecomposable word is ONE [UNK] (whole word, not per char)
    assert(vn.tokenize("xyz") == Vector("[UNK]"))
    // BERT's max_input_chars_per_word: a 101-char word is one [UNK] even
    // when it would decompose
    val long = "bert" * 26 // 104 chars, all pieces in vocab
    assert(new graft.segment.VocabNormalizer(Set("bert", "##bert"))
      .tokenize(long) == Vector("[UNK]"))
    // BERT-format vocab file: one token per line
    val f = java.nio.file.Files.createTempFile("graft-vocab", ".txt")
    java.nio.file.Files.writeString(f, "甲\n乙\n##乙\n")
    val loaded = VocabNormalizer.fromFile(f.toString)
    assert(loaded.normalize(Seq("甲乙丙")) == Vector("甲乙"))
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
