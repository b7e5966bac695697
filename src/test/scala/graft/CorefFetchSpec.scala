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
      val annByText = merged.zip(fx.anns).toMap
      val res = CorefFetch.fetchCoref(merged, offsets, fx.splitted, { text =>
        annByText(text) match {
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
}
