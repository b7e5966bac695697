package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.amend.PostProcess
import graft.model.Rel
import graft.synth.Templates

/** Differential test: the Scala engine's per-sentence output must EXACTLY
  * match the reference implementation's output (captured by replaying the
  * same deterministic fixtures through /root/reference in its ready-parse
  * mode; goldens in src/test/resources/golden_rels.json). This is the
  * P/R-vs-reference gate — exact match means P/R = 1.0 on the fixture
  * corpus. */
class DifferentialSpec extends AnyFunSuite {

  private def relKey(rel: Rel): String = rel.serialize

  private def goldenKey(relNode: JsonNode): String = {
    val names = relNode.get(0)
    val idxs = relNode.get(2)
    def n(i: Int) = if (names.get(i).isNull) "None" else names.get(i).asText()
    def x(i: Int) = if (idxs.get(i).isNull) "None" else idxs.get(i).asText()
    s"${n(0)}::${n(1)}::${n(2)}::::${relNode.get(1).asText()}::::${x(0)}::${x(1)}::${x(2)}"
  }

  test("engine output exactly matches the reference on 6000 fixture sentences") {
    runDifferential("/golden_rels.json", 6000,
      id => Templates.generate(id.split("-")(1).toLong))
  }

  test("engine output exactly matches the reference on 20000 adversarial random trees") {
    runDifferential("/golden_random.json", 20000,
      id => graft.synth.RandomTrees.generate(id.split("-")(1).toLong))
  }

  test("engine output exactly matches the reference on a FRESH-seed 10000-tree battery") {
    // disjoint k-range (20000-29999), generated in round 3 — guards
    // against any drift that happened to fit the original battery
    runDifferential("/golden_random2.json", 10000,
      id => graft.synth.RandomTrees.generate(id.split("-")(1).toLong))
  }

  test("engine output exactly matches the reference on the round-4 fresh-seed battery") {
    // third k-range for the MAIN five-list differential (30000-39999,
    // generated in round 4): this path never saw these trees before
    // (k 30000-34999 did appear in round 3's CROSSED flag-on battery —
    // a different extraction configuration; 35000-39999 are fully new)
    runDifferential("/golden_random3.json", 10000,
      id => graft.synth.RandomTrees.generate(id.split("-")(1).toLong))
  }

  test("engine output exactly matches the reference on the round-5 fresh-seed battery") {
    // fourth k-range for the MAIN five-list differential (50000-59999,
    // generated in round 5): fully unseen by every earlier battery
    runDifferential("/golden_random4.json", 10000,
      id => graft.synth.RandomTrees.generate(id.split("-")(1).toLong))
  }

  test("engine output exactly matches the reference on the round-6 fresh-seed battery") {
    // fifth k-range for the MAIN five-list differential (65000-74999,
    // generated in round 6): fully unseen by every earlier battery
    runDifferential("/golden_random5.json", 10000,
      id => graft.synth.RandomTrees.generate(id.split("-")(1).toLong))
  }

  test("engine output exactly matches the reference on the round-7 fresh-seed battery") {
    // sixth k-range for the MAIN five-list differential (80000-89999,
    // generated in round 7): fully unseen by every earlier battery
    runDifferential("/golden_random6.json", 10000,
      id => graft.synth.RandomTrees.generate(id.split("-")(1).toLong))
  }

  test("engine output exactly matches the reference on the round-8 fresh-seed battery") {
    // seventh k-range for the MAIN five-list differential (95000-104999,
    // generated in round 8): fully unseen by every earlier battery
    runDifferential("/golden_random7.json", 10000,
      id => graft.synth.RandomTrees.generate(id.split("-")(1).toLong))
  }

  test("per-sentence decomposition equals the reference's per-document processing") {
    // the reference processes documents (lists of sentences) through one
    // post_processing call; the engine processes sentences independently.
    // golden_docs.json holds reference outputs for 400 five-sentence docs.
    val mapper = new ObjectMapper()
    val stream = getClass.getResourceAsStream("/golden_docs.json")
    assert(stream != null)
    val golden = mapper.readTree(stream)
    var checked = 0
    val mismatches = scala.collection.mutable.ListBuffer.empty[String]
    golden.forEach { g =>
      if (g.get("ok").asBoolean()) {
        val ids = (0 until g.get("ids").size()).map(i => g.get("ids").get(i).asText())
        for ((id, sentIdx) <- ids.zipWithIndex) {
          val fx = Templates.generate(id.split("-")(1).toLong)
          val rels = PostProcess.processSentence(fx.parse, Some(fx.posTags))
          val pairs = Seq("fine" -> rels.fine, "coarse" -> rels.coarse,
                          "amend_fine" -> rels.amendFine, "amend_coarse" -> rels.amendCoarse,
                          "possible" -> rels.possible)
          for ((listName, ours) <- pairs) {
            val goldList = g.get(listName).get(sentIdx)
            val goldKeys = (0 until goldList.size()).map(i => goldenKey(goldList.get(i)))
            if (goldKeys != ours.map(relKey))
              mismatches += s"$id/$listName (doc-level)"
          }
        }
        checked += 1
      }
    }
    assert(checked >= 395, s"only $checked docs checked")
    assert(mismatches.isEmpty, mismatches.take(5).mkString("\n"))
  }

  private def runDifferential(resource: String, expectedCount: Int,
                              regen: String => Templates.Fixture): Unit = {
    val mapper = new ObjectMapper()
    val stream = getClass.getResourceAsStream(resource)
    assert(stream != null, s"$resource missing from test resources")
    val golden = mapper.readTree(stream)
    var checked = 0
    val mismatches = scala.collection.mutable.ListBuffer.empty[String]
    golden.forEach { g =>
      if (g.get("ok").asBoolean()) {
        val id = g.get("id").asText()
        val fx = regen(id)
        assert(fx.id == id, s"fixture regeneration drifted for $id")
        val rels = PostProcess.processSentence(fx.parse, Some(fx.posTags))
        val pairs = Seq(
          "fine" -> rels.fine, "coarse" -> rels.coarse,
          "amend_fine" -> rels.amendFine, "amend_coarse" -> rels.amendCoarse,
          "possible" -> rels.possible)
        for ((listName, ours) <- pairs) {
          val goldList = g.get(listName).get(0) // one sentence per fixture
          val goldKeys = (0 until goldList.size()).map(i => goldenKey(goldList.get(i)))
          val ourKeys = ours.map(relKey)
          if (goldKeys != ourKeys) {
            mismatches += s"$id/$listName\n  ref:  $goldKeys\n  ours: $ourKeys\n  sent: ${fx.sentence}"
          }
        }
        checked += 1
      }
    }
    assert(checked >= expectedCount - 5, s"only $checked fixtures checked")
    if (mismatches.nonEmpty) {
      val sample = mismatches.take(10).mkString("\n\n")
      fail(s"${mismatches.size} list mismatches out of ${checked * 5}; first 10:\n$sample")
    }
  }
}
