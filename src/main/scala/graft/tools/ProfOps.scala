package graft.tools

import graft.ops.{DedupOps, SimilarityOps}

/** one-off wall-time profiler for the training-data ops (dev tool). */
object ProfOps {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    // warmup
    t("warm:minhash_bands")(DedupOps.minhashBands(docs).count())
    t("warm:ann_brute")(SimilarityOps.bruteForceTopK(emb).count())
    for (_ <- 1 to 2) {
      t("minhash_bands")(DedupOps.minhashBands(docs).count())
      t("minhash_cand")(DedupOps.minhashCandidates(docs).count())
      t("ann_brute")(SimilarityOps.bruteForceTopK(emb).count())
      t("ann_lsh_exact")(SimilarityOps.lshTopK(emb, nPlanes = 4, multiProbe = false).count())
      t("ann_lsh_probe")(SimilarityOps.lshTopK(emb, nPlanes = 4).count())
      t("ann_ivf")(SimilarityOps.ivfTopK(emb).count())
      t("lsh_buckets")(SimilarityOps.lshBuckets(emb, 4).count())
      t("winnow")(DedupOps.winnowing(docs).count())
    }
    spark.stop()
  }
}
