package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import graft.segment.CorefFetch
import graft.tools.DumpCorefFixtures

/** Differential test of the coref front-end (merge_texts + fetch_coref)
  * against the reference driven by the same mock annotator fixtures:
  * chunking, sentence alignment, mention→span conversion, substitution
  * rewrite, and the failure/mismatch flags must all agree. */
class CorefFetchSpec extends AnyFunSuite {

  test("coref front-end matches the reference on 240 mock-annotated docs") {
    val mapper = new ObjectMapper()
    val golden = mapper.readTree(getClass.getResourceAsStream("/golden_coref.json"))
    var checked = 0
    golden.forEach { g =>
      val id = g.get("id").asText()
      val i = id.split("-")(1).toLong
      val fx = DumpCorefFixtures.genDoc(i)
      assert(g.get("merged_match").asBoolean(), s"$id: reference merge_texts disagreed with ours")
      // same merged chunks (differential for mergeTexts)
      val goldMerged = (0 until g.get("merged").size()).map(j => g.get("merged").get(j).asText())
      assert(fx.merged == goldMerged, s"$id merged chunks differ")

      val (merged, offsets) = CorefFetch.mergeTexts(fx.splitted, DumpCorefFixtures.Threshold)
      val res = CorefFetch.fetchCoref(merged, offsets, fx.splitted, { (ci, _) =>
        fx.anns(ci) match {
          case Some(ann) => ann
          case None => throw new RuntimeException("annotator failure (mock)")
        }
      })
      assert(res.corefFailed == g.get("failed").asBoolean(), s"$id failed flag")
      if (!res.corefFailed) {
        assert(res.mismatched == g.get("mismatched").asBoolean(), s"$id mismatched flag")
        assert(res.overlapCount == g.get("overlap").asInt(), s"$id overlap count")
        assert(res.nChains == g.get("nchains").asInt(), s"$id chain count")
        val goldCorefed = g.get("corefed")
        val ours = res.corefed.get
        assert(ours.length == goldCorefed.size(), s"$id chunk count")
        for (ci <- ours.indices) {
          val gc = goldCorefed.get(ci)
          if (gc.isNull) assert(ours(ci).isEmpty, s"$id chunk $ci expected None")
          else {
            val goldSents = (0 until gc.size()).map(j => gc.get(j).asText())
            assert(ours(ci).isDefined && ours(ci).get == goldSents, s"$id chunk $ci sentences")
          }
        }
      }
      checked += 1
    }
    assert(checked == 240)
  }

  test("annotator receives the chunk index — duplicate chunk texts must not collide") {
    val s = "张伟喜欢音乐。"
    // two chunks with IDENTICAL text but different sentence ranges: a
    // text-keyed lookup would hand both chunks the first chunk's range
    val splitted = Vector(s, s)
    val merged = Vector(s, s)
    val offsets = Vector((0, 1), (1, 2))
    val seen = scala.collection.mutable.ListBuffer.empty[Int]
    val res = CorefFetch.fetchCoref(merged, offsets, splitted, { (ci, text) =>
      seen += ci
      assert(text == s)
      CorefFetch.Ann(Vector(Vector(s.dropRight(1), "。")), Vector.empty)
    })
    assert(seen.toList == List(0, 1), "each chunk must be annotated under its own index")
    assert(!res.corefFailed)
  }
}
