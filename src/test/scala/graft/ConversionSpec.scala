package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.amend.PostProcess
import graft.model.{DepParse, Rel}

/** The reference's dormant tense/modal/copular conversions
  * (CONVERT_* = False in dudepparse.py:1551-1553), ported flag-gated. */
class ConversionSpec extends AnyFunSuite {

  private def svo(s: String, v: String, o: String, vi: Int) =
    Rel(Vector(Some(s), Some(v), Some(o)), "SVO", Vector(Some(0), Some(vi), Some(3)))

  test("tense prefixes from ADV/MT dependents of the predicate head") {
    // 张三 昨天 访问 巴黎 — 昨天 ADV→访问
    val r = DepParse(Vector("张三", "昨天", "访问", "巴黎"), Vector(3, 3, 0, 3),
                     Vector("SBV", "ADV", "HED", "VOB"))
    val out = PostProcess.convertNct(Vector(svo("张三", "访问", "巴黎", 2)), r, tense = true)
    assert(out.head.pred == "【过去式】·访问")
    // future: 明天
    val rf = DepParse(Vector("张三", "明天", "访问", "巴黎"), Vector(3, 3, 0, 3),
                      Vector("SBV", "ADV", "HED", "VOB"))
    assert(PostProcess.convertNct(Vector(svo("张三", "访问", "巴黎", 2)), rf, tense = true)
             .head.pred == "【将来式】·访问")
    // MT 了 → past
    val rp = DepParse(Vector("张三", "访问", "了", "巴黎"), Vector(2, 0, 2, 2),
                      Vector("SBV", "HED", "MT", "VOB"))
    assert(PostProcess.convertNct(Vector(svo("张三", "访问", "巴黎", 1)), rp, tense = true)
             .head.pred == "【过去式】·访问")
  }

  test("modal markers collapse to canonical values, deduplicated") {
    // 张三 必须 要 访问 巴黎 — both map to 【要】, emitted once
    val r = DepParse(Vector("张三", "必须", "要", "访问", "巴黎"), Vector(4, 4, 4, 0, 4),
                     Vector("SBV", "ADV", "ADV", "HED", "VOB"))
    val out = PostProcess.convertNct(Vector(svo("张三", "访问", "巴黎", 3)), r, modal = true)
    assert(out.head.pred == "【要】·访问")
  }

  test("copular fold absorbs the object into the predicate") {
    val r = DepParse(Vector("张三", "是", "校长", "。"), Vector(2, 0, 2, 2),
                     Vector("SBV", "HED", "VOB", "MT"))
    val out = PostProcess.convertNct(Vector(svo("张三", "是", "校长", 1)), r, copular = true)
    assert(out.head.pred == "是·校长" && out.head.obj.isEmpty)
    // 达/高达 are NOT in check_nct's copular set (narrower than the
    // amendment-stage set, dudepparse.py:1556-1557)
    val out2 = PostProcess.convertNct(Vector(svo("产量", "达", "千吨", 1)), r, copular = true)
    assert(out2.head.pred == "达" && out2.head.obj.nonEmpty)
  }

  test("tense/modal primitives match the reference's functions on 5000 random trees") {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val golden = mapper.readTree(getClass.getResourceAsStream("/golden_tense.json"))
    var checked = 0
    golden.forEach { g =>
      val id = g.get("id").asText()
      val fx = graft.synth.RandomTrees.generate(id.split("-")(1).toLong)
      for (t <- fx.parse.words.indices) {
        val rel = Rel(Vector(None, Some(fx.parse.words(t)), None), "SVO",
                      Vector(None, Some(t), None))
        assert(PostProcess.predTense(rel, fx.parse) == g.get("tense").get(t).asText(),
               s"$id tok $t tense")
        val goldModal = if (g.get("modal").get(t).isNull) None else Some(g.get("modal").get(t).asText())
        assert(PostProcess.predModal(rel, fx.parse) == goldModal, s"$id tok $t modal")
      }
      checked += 1
    }
    assert(checked == 5000)
  }

  test("conversions are off by default (live reference config)") {
    val r = DepParse(Vector("张三", "昨天", "访问", "巴黎"), Vector(3, 3, 0, 3),
                     Vector("SBV", "ADV", "HED", "VOB"))
    val out = PostProcess.convertNct(Vector(svo("张三", "访问", "巴黎", 2)), r)
    assert(out.head.pred == "访问")
  }
}
