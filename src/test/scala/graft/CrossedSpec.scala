package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.amend.PostProcess
import graft.model.Rel
import graft.synth.{RandomTrees, Templates}

/** Differential test of the dormant ADD_HALF_COARSE "crossed" projection
  * lists (reference dudepparse.py:1722,1774-1783): with addHalfCoarse
  * forced on, the engine's crossed / amend_crossed output must exactly
  * match the reference's flag-on branch (goldens produced by
  * tools/ref_oracle/crossedrun.py, which replays the same coarsify calls
  * through /root/reference). With the flag off (the shipped config), both
  * lists must be empty — schema parity with the reference's always-empty
  * entry fields. */
class CrossedSpec extends AnyFunSuite {

  private def relKey(rel: Rel): String = rel.serialize

  private def goldenKey(relNode: JsonNode): String = {
    val names = relNode.get(0)
    val idxs = relNode.get(2)
    def n(i: Int) = if (names.get(i).isNull) "None" else names.get(i).asText()
    def x(i: Int) = if (idxs.get(i).isNull) "None" else idxs.get(i).asText()
    s"${n(0)}::${n(1)}::${n(2)}::::${relNode.get(1).asText()}::::${x(0)}::${x(1)}::${x(2)}"
  }

  private def runDifferential(resource: String,
                              regen: Long => Templates.Fixture): Int = {
    val mapper = new ObjectMapper()
    val stream = getClass.getResourceAsStream(resource)
    assert(stream != null, s"$resource missing from test resources")
    val golden = mapper.readTree(stream)
    var checked = 0
    var nonEmpty = 0
    val mismatches = scala.collection.mutable.ListBuffer.empty[String]
    golden.forEach { g =>
      if (g.get("ok").asBoolean()) {
        val id = g.get("id").asText()
        val fx = regen(id.split("-")(1).toLong)
        assert(fx.id == id, s"fixture regeneration drifted for $id")
        val rels = PostProcess.processSentence(fx.parse, Some(fx.posTags), addHalfCoarse = true)
        for ((listName, ours) <- Seq("crossed" -> rels.crossed,
                                     "amend_crossed" -> rels.amendCrossed)) {
          val goldList = g.get(listName).get(0) // one sentence per fixture
          val goldKeys = (0 until goldList.size()).map(i => goldenKey(goldList.get(i)))
          if (goldKeys != ours.map(relKey))
            mismatches += s"$id/$listName\n  ref:  $goldKeys\n  ours: ${ours.map(relKey)}"
          if (goldKeys.nonEmpty) nonEmpty += 1
        }
        checked += 1
      }
    }
    assert(mismatches.isEmpty,
           s"${mismatches.size} mismatches:\n${mismatches.take(5).mkString("\n\n")}")
    assert(nonEmpty > 50, s"suite is vacuous: only $nonEmpty non-empty crossed lists")
    checked
  }

  test("crossed lists exactly match the reference with ADD_HALF_COARSE on (templates)") {
    assert(runDifferential("/golden_crossed_templates.json",
                           k => Templates.generate(k)) == 4000)
  }

  test("crossed lists exactly match the reference with ADD_HALF_COARSE on (random trees)") {
    assert(runDifferential("/golden_crossed_random.json",
                           k => RandomTrees.generate(k)) == 8000)
  }

  test("crossed lists exactly match the reference on a FRESH-seed random battery") {
    // disjoint k-range (30000-34999), generated in round 3
    assert(runDifferential("/golden_crossed_random2.json",
                           k => RandomTrees.generate(k)) == 5000)
  }

  test("crossed lists exactly match the reference on the round-4 fresh battery") {
    // disjoint k-range (40000-44999), generated in round 4
    assert(runDifferential("/golden_crossed_random3.json",
                           k => RandomTrees.generate(k)) == 5000)
  }

  test("crossed lists exactly match the reference on the round-5 fresh battery") {
    // disjoint k-range (60000-64999), generated in round 5
    assert(runDifferential("/golden_crossed_random4.json",
                           k => RandomTrees.generate(k)) == 5000)
  }

  test("crossed lists exactly match the reference on the round-6 fresh battery") {
    // disjoint k-range (75000-79999), generated in round 6
    assert(runDifferential("/golden_crossed_random5.json",
                           k => RandomTrees.generate(k)) == 5000)
  }

  test("crossed lists exactly match the reference on the round-7 fresh battery") {
    // disjoint k-range (90000-94999), generated in round 7
    assert(runDifferential("/golden_crossed_random6.json",
                           k => RandomTrees.generate(k)) == 5000)
  }

  test("crossed lists exactly match the reference on the round-8 fresh battery") {
    // disjoint k-range (105000-109999), generated in round 8
    assert(runDifferential("/golden_crossed_random7.json",
                           k => RandomTrees.generate(k)) == 5000)
  }

  test("shipped config (flag off) emits empty crossed lists — schema parity") {
    val fx = Templates.generate(0L)
    val rels = PostProcess.processSentence(fx.parse, Some(fx.posTags))
    assert(rels.crossed.isEmpty && rels.amendCrossed.isEmpty)
  }
}
