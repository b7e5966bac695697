package graft

import org.apache.spark.sql.functions._
import graft.functions.ZhFunctions

/** Native zh_char_count expression: semantics equal to the regex
  * formulation, codegen active, nulls handled. */
class ZhFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("zh_char_count equals the regex formulation on mixed text") {
    ZhFunctions.register(spark)
    val df = Seq(
      "这是中文", "mixed 中文 and english", "", "no cjk at all 123",
      "标点。？！也不是吗", "𝔘nicode 🚀 exotic 中", "鿿一", "䷿一ꀀ"
    ).toDF("s")
    val out = df.select(
      ZhFunctions.zh_char_count($"s").as("native"),
      length(regexp_replace($"s", "[^一-鿿]", "")).as("regex")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("zh_char_count handles nulls and appears in codegen plans") {
    ZhFunctions.register(spark)
    val df = Seq(Option("中文abc"), None).toDF("s")
      .select(ZhFunctions.zh_char_count($"s").as("n"))
    assert(df.collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq == Seq(2, -1))
    // whole-stage codegen must cover the projection (no CodegenFallback)
    val wide = spark.range(4).select(ZhFunctions.zh_char_count(concat(lit("中"), $"id".cast("string"))).as("n"))
    assert(wide.collect().forall(_.getInt(0) == 1))
    val gen = wide.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(gen.contains("WholeStageCodegen") && gen.contains("ZhCharCountImpl"), gen.take(800))
  }

  test("GraftExtensions registers zh_char_count via the extensions hook") {
    // the suite's shared session is built with
    // .withExtensions(new GraftExtensions) and NO ZhFunctions.register
    // call (SparkSpecBase) — SQL resolution proves the injectFunction path
    val n = spark.sql("SELECT zh_char_count('中文abc字') AS n").head().getInt(0)
    assert(n == 3)
    // and the hook survives newSession() (extension state is inherited)
    val n2 = spark.newSession().sql("SELECT zh_char_count('汉字') AS n").head().getInt(0)
    assert(n2 == 2)
  }

  test("native cos_x10000 / fdot equal the HOF composition, incl. null semantics") {
    ZhFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    def vec(d: Int) = Seq.fill(d)(rnd.nextFloat() * 2 - 1)
    // same-dim pairs across several dims + adversarial values
    val pairs: Seq[(Seq[Float], Seq[Float])] =
      (1 to 40).map(_ => (vec(16), vec(16))) ++
      (1 to 10).map(_ => (vec(1), vec(1))) ++
      Seq((Seq(1e-30f, 0f), Seq(1e30f, 0f)),
          (vec(3), vec(4)))                        // length mismatch → null both sides
    val df = pairs.toDF("a", "b")
    val out = df.select(
      graft.ops.SimilarityOps.cosX10000($"a", $"b").as("native"),
      graft.ops.SimilarityOps.cosX10000Composed($"a", $"b").as("hof"),
      call_function("fdot", $"a", $"b").as("fnative"),
      graft.ops.SimilarityOps.dotExpr($"a", $"b").as("fhof")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString)
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
      assert(r.isNullAt(2) == r.isNullAt(3), r.toString)
      if (!r.isNullAt(2))
        assert(java.lang.Double.compare(r.getDouble(2), r.getDouble(3)) == 0, r.toString)
    }
    // zero-norm vectors: the ANSI-mode HOF form THROWS (double divide by
    // zero) — the native form is deliberately TOTAL and floors the NaN to
    // 0L; no declared query carries zero vectors (rounds 1-8 would have
    // crashed otherwise), so this only widens the domain
    val z = Seq((Seq(0f, 0f), Seq(0f, 0f))).toDF("a", "b")
      .select(graft.ops.SimilarityOps.cosX10000($"a", $"b")).head()
    assert(!z.isNullAt(0) && z.getLong(0) == 0L)
    // double-element arrays (the IVF literal-codebook side) work too
    val dd = Seq((Seq(0.5d, -0.25d), Seq(1.0d, 2.0d))).toDF("a", "b")
      .select(graft.ops.SimilarityOps.cosX10000($"a", $"b").as("native"),
              graft.ops.SimilarityOps.cosX10000Composed($"a", $"b").as("hof")).head()
    assert(dd.getLong(0) == dd.getLong(1))
    // and the native expression participates in whole-stage codegen
    // (literal frames fold to LocalTableScan, so probe over a range)
    val wide = spark.range(4).select(
      array(($"id" + 1).cast("float"), ($"id" + 2).cast("float")).as("a"),
      array(($"id" + 3).cast("float"), ($"id" + 4).cast("float")).as("b"))
      .select(graft.ops.SimilarityOps.cosX10000($"a", $"b").as("c"))
    assert(wide.collect().length == 4)
    val gen = wide.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(gen.contains("WholeStageCodegen") && gen.contains("CosX10000Impl"), gen.take(800))
  }

  test("JVM distinct-gram core equals wordNgrams as a set, incl. edge cases") {
    val texts = Seq(
      "甲 乙 丙 丁 戊", "甲 乙", "甲", "", "甲  乙 丙",          // double space → empty token
      "甲 乙 丙 甲 乙 丙 丁", "a b c d e f g", null)
    for (n <- Seq(2, 3, 8); t <- texts) {
      val jvm = {
        val it = graft.ops.DedupOps.distinctGramsJvm(t, n).iterator()
        val buf = scala.collection.mutable.ListBuffer.empty[String]
        while (it.hasNext) buf += it.next()
        buf.toList
      }
      val catalyst = Seq(Tuple1(Option(t))).toDF("text")
        .select(graft.ops.DedupOps.wordNgrams(col("text"), n).as("g"))
        .head().getSeq[String](0).toList
      assert(jvm == catalyst, s"n=$n text='$t': jvm=$jvm catalyst=$catalyst")
    }
  }

  test("mention detection finds aliases with spans and scores") {
    val docs = graft.pipeline.Pipeline.synthDocs(spark, 100)
    val sents = graft.pipeline.Pipeline.segmentDocs(docs)
    val mentions = graft.pipeline.Mentions.detect(sents, graft.pipeline.Pipeline.synthAliases(spark))
    val rows = mentions.collect()
    assert(rows.nonEmpty)
    // spans must slice back to the mention surface
    val bySent = sents.collect().map(s => (s.doc_id, s.sent_id) -> s.sent).toMap
    rows.take(200).foreach { m =>
      val sent = bySent((m.doc_id, m.sent_id))
      assert(sent.substring(m.begin, m.end) == m.mention)
    }
    assert(rows.forall(_.link_score_x1000 > 0))
  }
}
