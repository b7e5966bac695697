package graft

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper

/** graft.Main — the submitted-job equivalent of the reference's run book
  * (preprocess → parse slices → ner → merge). Asserts the full output
  * layout, the excluded sink, stats.json, and checkpoint resume. */
class MainSpec extends SparkSpecBase {

  private def writeWebhose(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-main-in").toString
    Files.write(Paths.get(s"$dir/part-0.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("end-to-end webhose run produces the full output layout and resumes") {
    val mapper = new ObjectMapper()
    val text = graft.synth.SynthDocs.genDoc(2L).spans
      .filter(_.kind == "text").map(_.text).mkString
    val in = writeWebhose(Seq(
      s"""{"uuid":"m1","title":"","text":${mapper.writeValueAsString(text)}}""",
      s"""{"uuid":"m2","title":"","text":${mapper.writeValueAsString(text)}}""",
      """{"uuid":"m3","title":"","text":"english only, excluded."}"""))
    val out = Files.createTempDirectory("graft-main-out").toString
    Main.main(Array("--reader", "webhose", "--input", in, "--out", out,
                    "--coref", "--mentions"))
    for (stage <- Seq("docs", "sentences", "triples", "coref_triples",
                      "canonical", "edges", "mentions"))
      assert(new java.io.File(s"$out/$stage/_SUCCESS").exists(), s"missing stage $stage")
    // excluded sink routed the English-only entry
    val excluded = spark.read.json(s"$out/excluded")
    assert(excluded.select("doc_id").collect().map(_.getString(0)).toSet == Set("m3"))
    // stats.json parses and carries per-list totals
    val stats = mapper.readTree(Files.readString(Paths.get(s"$out/stats.json")))
    assert(stats.get("docs").asLong() == 2L)
    assert(stats.get("rel_totals").size() > 0)
    val triples1 = spark.read.parquet(s"$out/canonical").count()
    assert(triples1 > 0)
    // second invocation resumes from checkpoints and reproduces the data
    Main.main(Array("--reader", "webhose", "--input", in, "--out", out,
                    "--coref", "--mentions"))
    assert(spark.read.parquet(s"$out/canonical").count() == triples1)
  }

  test("synth reader mode runs without an input path") {
    val out = Files.createTempDirectory("graft-main-synth").toString
    Main.main(Array("--reader", "synth", "--docs", "40", "--out", out))
    assert(spark.read.parquet(s"$out/canonical").count() > 0)
    assert(!new java.io.File(s"$out/coref_triples").exists()) // flag off
  }

  test("argument errors are loud") {
    intercept[IllegalArgumentException](Main.main(Array("--out", "/tmp/x")))
    intercept[IllegalArgumentException](
      Main.main(Array("--reader", "nope", "--input", "/tmp", "--out", "/tmp/x")))
  }
}
