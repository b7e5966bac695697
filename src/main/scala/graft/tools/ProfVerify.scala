package graft.tools

import org.apache.spark.sql.functions._

/** dev-only stage-split profile of dedup_cross_verify (r9): times each
  * pinned intermediate of DedupOps.crossVerify cumulatively, mirroring
  * its exact construction, so the expensive segment is identifiable.
  * Mirrors SparkEntry's crossPlanted fixture. */
object ProfVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.ops.DedupOps
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val planted = docs.withColumn("text",
      when(col("doc_id") % 21 === 0 ||
           (col("doc_id") % 7 === 1 && col("doc_id") % 3 =!= 0),
        lit("shared boilerplate navigation footer copyright terms privacy cookie banner menu home"))
        .otherwise(col("text")))
    val incoming = planted.filter(col("doc_id") % 3 =!= 0)
    val seen = planted.filter(col("doc_id") % 3 === 0)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    for (pass <- 1 to 3) {
      println(s"--- pass $pass ---")
      val incBands = t("incBands pin") {
        val d = DedupOps.minhashBands(incoming).localCheckpoint(eager = false)
        d.count(); d
      }
      val seenBands = t("seenBands pin") {
        val d = DedupOps.minhashBands(seen)
          .select(col("doc_id").as("seen_id"), col("band"), col("bucket"))
          .localCheckpoint(eager = false)
        d.count(); d
      }
      val hits = incBands
        .join(seenBands.select(col("band"), col("bucket")).distinct(),
              Seq("band", "bucket"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_bands"))
      val suspects = t("suspects pin") {
        val d = incoming.select(col("doc_id"))
          .join(hits, Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("n_hit_bands"), lit(0L)).as("n_hit_bands"))
          .filter(col("n_hit_bands") > 0L)
          .localCheckpoint()
        d.count(); d
      }
      val okBuckets = seenBands.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("n_members"))
        .filter(col("n_members") <= 200)
        .select(col("band"), col("bucket"))
      val cand = t("cand pin") {
        val d = incBands
          .join(suspects.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .join(seenBands.join(okBuckets, Seq("band", "bucket"), "left_semi"),
                Seq("band", "bucket"))
          .select(col("doc_id"), col("seen_id")).distinct()
          .localCheckpoint()
        d.count(); d
      }
      val incGrams = t("incGrams pin") {
        val d = incoming
          .join(cand.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), explode(DedupOps.wordNgrams(col("text"), 3)).as("gram"))
          .localCheckpoint()
        d.count(); d
      }
      val seenGrams = t("seenGrams pin") {
        val d = seen
          .select(col("doc_id").as("seen_id"), col("text"))
          .join(cand.select(col("seen_id")).distinct(), Seq("seen_id"), "left_semi")
          .select(col("seen_id"), explode(DedupOps.wordNgrams(col("text"), 3)).as("gram"))
          .localCheckpoint()
        d.count(); d
      }
      t("full query") {
        graft.SparkEntry.queries("dedup_cross_verify")(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
