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

  test("corefRelTable's two sides reproduce the corefTriples diff exactly") {
    import org.apache.spark.sql.functions._
    val docs = Pipeline.synthDocs(spark, 400)
    val flat = Pipeline.corefRelTable(docs).toDF()
    // on the synth corpus the BASE side is structurally empty (pronoun
    // subjects are stopword-filtered, and the pronoun templates carry no
    // other extractable structure), so the corpus-level diff is the
    // corefed side verbatim — the anti-join's exclusion semantics are
    // exercised on a crafted table below
    assert(flat.filter(col("side") === "corefed").count() > 0)
    // recompute the serialize-key set diff RELATIONALLY (the kg_coref
    // oracle's exact shape: anti-join on doc/sent/list/tag/names/idxs)
    val keyCols = Seq("doc_id", "sent_id", "rel_list", "tag",
                      "subj", "pred", "obj", "subj_idx", "pred_idx", "obj_idx")
    val f = flat.filter(col("side") === "corefed").alias("f")
    val b = flat.filter(col("side") === "base").select(keyCols.map(col): _*).alias("b")
    // NULL-SAFE equality (<=>) — serialize treats None == None as a match
    val diff = f.join(b, keyCols.map(c => col(s"f.$c") <=> col(s"b.$c")).reduce(_ && _),
                      "left_anti")
      .select(col("doc_id"), col("sent_id"),
              concat(col("rel_list"), lit("_corefed")).as("rel_list"),
              col("subj"), coalesce(col("pred"), lit("")).as("pred"), col("obj"),
              col("subj_idx"), col("pred_idx"), col("obj_idx"))
      .collect().map(_.toSeq).toSet
    val direct = Pipeline.corefTriples(docs).toDF().collect().map(_.toSeq).toSet
    assert(diff == direct,
           s"flat-table diff=${diff.size} vs corefTriples=${direct.size}; " +
             s"sample=${(diff diff direct).take(2)} / ${(direct diff diff).take(2)}")
    assert(direct.nonEmpty)

    // crafted table: the anti-join must DROP a corefed row whose base twin
    // matches on every serialize field — including a NULL obj (null-safe
    // equality, the oracle's IS NOT DISTINCT FROM) — and must keep a row
    // differing only in tag (serialize keys on the tag too)
    import spark.implicits._
    val crafted = Seq(
      ("d1", 0, "base",    "fine", Some("甲"), Some("谓"), None: Option[String], Some(0), Some(1), None: Option[Int], "SVO"),
      ("d1", 0, "corefed", "fine", Some("甲"), Some("谓"), None: Option[String], Some(0), Some(1), None: Option[Int], "SVO"),
      ("d1", 0, "corefed", "fine", Some("甲"), Some("谓"), None: Option[String], Some(0), Some(1), None: Option[Int], "VV"),
      ("d1", 0, "corefed", "fine", Some("乙"), Some("谓"), Some("丙"), Some(0), Some(1), Some(2), "SVO"))
      .toDF("doc_id", "sent_id", "side", "rel_list", "subj", "pred", "obj",
            "subj_idx", "pred_idx", "obj_idx", "tag")
    val cf = crafted.filter(col("side") === "corefed").alias("cf")
    val cb = crafted.filter(col("side") === "base").select(keyCols.map(col): _*).alias("cb")
    val kept = cf.join(cb, keyCols.map(c => col(s"cf.$c") <=> col(s"cb.$c")).reduce(_ && _),
                       "left_anti")
      .select(col("subj"), col("tag")).collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("甲", "VV"), ("乙", "SVO")),
           s"anti-join exclusion semantics broken: $kept")
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
