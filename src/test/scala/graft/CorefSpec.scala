package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.segment.Coref
import graft.segment.Coref.Replacement
import graft.model.Rel

class CorefSpec extends AnyFunSuite {

  test("substitution rewrites spans left to right") {
    assert(Coref.substitute("他去了北京。", Seq(Replacement(0, 1, "张三"))) == "张三去了北京。")
    assert(Coref.substitute("他见了她。", Seq(Replacement(0, 1, "张三"), Replacement(3, 4, "李四")))
           == "张三见了李四。")
  }

  test("first replacement always kept; overlaps dropped (reference quirk)") {
    // overlapping second replacement dropped
    assert(Coref.substitute("他们去了。", Seq(Replacement(0, 2, "张三"), Replacement(1, 3, "李四")))
           == "张三去了。")
  }

  test("broken length guard drops only empty replacements (reference quirk)") {
    // non-first empty replacement is dropped by the end-end>=len guard
    assert(Coref.substitute("他见了她。", Seq(Replacement(0, 1, "张三"), Replacement(3, 4, "")))
           == "张三见了她。")
    // but a FIRST empty replacement is kept (deletes the span)
    assert(Coref.substitute("他见了她。", Seq(Replacement(0, 1, ""))) == "见了她。")
  }

  test("newRels keeps only relations absent from the base pass") {
    def rel(s: String, v: String, o: String) =
      Rel(Vector(Some(s), Some(v), Some(o)), "SVO", Vector(Some(0), Some(1), Some(2)))
    val base = Vector(rel("甲", "见", "乙"))
    val cor = Vector(rel("甲", "见", "乙"), rel("丙", "见", "乙"))
    assert(Coref.newRels(base, cor) == Vector(rel("丙", "见", "乙")))
  }
}

/** Spark-side coref pass. */
class CorefPipelineSpec extends SparkSpecBase {
  import graft.pipeline.Pipeline

  test("coref pass recovers triples hidden behind pronoun subjects") {
    val docs = Pipeline.synthDocs(spark, 400)
    val corefed = Pipeline.corefTriples(docs).collect()
    assert(corefed.nonEmpty, "no corefed triples found")
    // pronoun subjects are stopword-filtered in the base pass, so every
    // corefed subject must be a real surface (not 他)
    assert(corefed.forall(t => !t.subj.contains("他")))
    // and the lists are the *_corefed families
    assert(corefed.map(_.rel_list).toSet.subsetOf(
      Set("fine_corefed", "coarse_corefed", "amend_fine_corefed",
          "amend_coarse_corefed", "possible_corefed")))
  }

  test("full-front-end coref path equals the direct-substitution path") {
    val docs = Pipeline.synthDocs(spark, 400)
    val direct = Pipeline.corefTriples(docs).collect().toSet
    val viaFetch = Pipeline.corefTriplesViaFetch(docs).collect().toSet
    assert(direct == viaFetch,
           s"direct=${direct.size} viaFetch=${viaFetch.size}, diff=${(direct diff viaFetch).take(3)} / ${(viaFetch diff direct).take(3)}")
    assert(direct.nonEmpty)
  }

  test("corefed crossed families: flag-gated, path-equivalent, absent when off") {
    val docs = Pipeline.synthDocs(spark, 400)
    val off = Pipeline.corefTriples(docs).collect()
    assert(!off.exists(t => t.rel_list.startsWith("crossed") || t.rel_list.startsWith("amend_crossed")),
           "crossed families must be empty under the shipped config")
    val on = Pipeline.corefTriples(docs, addHalfCoarse = true).collect().toSet
    val onFetch = Pipeline.corefTriplesViaFetch(docs, addHalfCoarse = true).collect().toSet
    assert(on == onFetch)
    // the non-crossed families are identical with the flag on or off
    val crossedNames = Set("crossed_corefed", "amend_crossed_corefed")
    assert(on.filterNot(t => crossedNames(t.rel_list)) == off.toSet)
    assert(on.map(_.rel_list).subsetOf(Set(
      "fine_corefed", "coarse_corefed", "amend_fine_corefed",
      "amend_coarse_corefed", "crossed_corefed", "amend_crossed_corefed",
      "possible_corefed")))
  }
}
