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
