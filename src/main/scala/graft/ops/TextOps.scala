package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, all
  * pure Catalyst expressions (codegen'd, no UDFs): language ID heuristic,
  * quality scoring, token counting, document fingerprinting.
  *
  * Numeric outputs are INTEGER-valued (counts and x1000 fixed-point
  * ratios via integer division) so results hash-compare exactly against
  * the DuckDB oracle — no floating-point drift.
  */
object TextOps {

  /** the shared content-hash doc ticket: `md5Long48(doc_id) mod m` —
    * ONE recipe for every sampling/packing op (stratifiedSample,
    * packSequences, temperatureSample) and their DuckDB oracle twins;
    * reproducible across runs, engines, cluster sizes and
    * partitionings (no rand()). Any change here must land in the
    * PortableHash duck* emitters' call sites in the same commit. */
  private def docTicket(mod: Long): Column = pmod(
    graft.functions.PortableHash.md5Long48(col("doc_id").cast("string")),
    lit(mod))


  /** stopword list for quality scoring (English function words — the
    * synthetic corpus is space-tokenized English-like text). */
  val stopwords: Seq[String] = Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")

  /** native codegen'd expression (graft.functions.ZhCharCount) — equal
    * semantics to length(regexp_replace(text, "[^一-鿿]", "")), verified in
    * ZhFunctionsSpec; requires ZhFunctions.register(session) once. */
  def cjkCharCount(text: Column): Column =
    graft.functions.ZhFunctions.zh_char_count(text)

  def latinCharCount(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", ""))

  def digitCharCount(text: Column): Column =
    length(regexp_replace(text, "[^0-9]", ""))

  def punctCharCount(text: Column): Column =
    length(regexp_replace(text, "[^.,!?;:]", ""))

  def wsTokens(text: Column): Column = split(text, " ")

  /** char-class language-ID heuristic: CJK-dominant → zh, latin-dominant
    * → en, neither → other. */
  def langIdExpr(text: Column): Column = {
    val cjk = cjkCharCount(text)
    val lat = latinCharCount(text)
    when(cjk * 2 > lat, lit("zh"))
      .when(lat > 0, lit("en"))
      .otherwise(lit("other"))
  }

  /** BPE-ish subword estimate: whitespace tokens + an extra unit per
    * 4 chars of any overlong token (a common len/4 proxy). Integer math. */
  def subwordEstimate(text: Column): Column = {
    val toks = wsTokens(text)
    aggregate(toks, lit(0L),
      (acc, t) => acc + greatest(lit(1L), ((length(t) + lit(3)) / lit(4)).cast("long")))
  }

  /** per-doc language ID over `documents(doc_id, text)`. */
  def langId(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
                     langIdExpr(col("text")).as("lang_pred"),
                     cjkCharCount(col("text")).cast("long").as("n_cjk"),
                     latinCharCount(col("text")).cast("long").as("n_latin"))

  /** per-doc quality features + fixed-point score. */
  def quality(documents: DataFrame): DataFrame = {
    val toks = wsTokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, t => t.isin(stopwords: _*))).cast("long")
    val nPunct = punctCharCount(col("text")).cast("long")
    val nDigit = digitCharCount(col("text")).cast("long")
    val len = length(col("text")).cast("long")
    documents.select(
      col("doc_id"),
      len.as("n_chars_m"),
      nTok.as("n_tokens"),
      nStop.as("n_stopwords"),
      nPunct.as("n_punct"),
      nDigit.as("n_digits"),
      // fixed-point ratios (x1000, integer division)
      stopRatioX1000Expr.as("stop_ratio_x1000"),
      digitRatioX1000Expr(col("text")).as("digit_ratio_x1000"))
  }

  /** token counting: whitespace tokens, CJK chars, subword estimate. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      size(wsTokens(col("text"))).cast("long").as("n_ws_tokens"),
      cjkCharCount(col("text")).cast("long").as("n_cjk_chars"),
      subwordEstimate(col("text")).as("n_subwords"))

  /** document fingerprints: md5 content hash (oracle-parity with DuckDB).
    * The shingled rolling-hash fingerprint lives in DedupOps.winnowing. */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), md5(col("text")).as("md5_fp"))

  /** occurrence-PRESERVING word n-grams (repetition analysis needs
    * counts; `DedupOps.wordNgrams` dedups for candidate generation).
    * Docs shorter than n yield NO grams (no whole-doc fallback). */
  def wordNgramsAll(text: Column, n: Int): Column = {
    val toks = wsTokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
                i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style intra-document REPETITION signals — the quality
    * filters that catch boilerplate/spam the char-class `quality` scorer
    * misses (Rae et al. 2021 §A1.1 use char-fraction variants; these are
    * the count-fraction analogues, exact in integer fixed-point so the
    * DuckDB oracle hash-matches):
    *  - top_word_frac_x10000: occurrences of the most frequent word /
    *    total words;
    *  - top_2gram_frac_x10000: same over word 2-grams;
    *  - dup_3gram_frac_x10000: fraction of 3-gram occurrences whose gram
    *    appears more than once.
    * Every statistic is PER-DOCUMENT, so the plan is ZERO-SHUFFLE
    * (plan-gated): each doc's gram hashes are sorted LOCALLY inside the
    * row (array_sort over a doc-length-bounded array) and the
    * frequencies read off as equal-run lengths — embarrassingly parallel
    * at any corpus size, one narrow scan. (The first implementation
    * aggregated (doc, n, gram) corpus-wide: two shuffles and 4.6 s at
    * sf0.1 vs ~1 s for this shape, with identical values.) */
  def repetitionScores(documents: DataFrame): DataFrame = {
    import graft.functions.PortableHash
    // equal-run lengths of a SORTED array: run starts/ends by the
    // adjacent-inequality island trick, length = end - start + 1
    def runLens(a: String) =
      s"""transform(arrays_zip(
         |  filter(transform($a, (x, i) -> CASE WHEN i = 0 OR $a[i-1] <> x THEN i END),
         |         v -> v IS NOT NULL),
         |  filter(transform($a, (x, i) -> CASE WHEN i = size($a) - 1 OR $a[i+1] <> x THEN i END),
         |         v -> v IS NOT NULL)),
         |  z -> CAST(z['1'] - z['0'] + 1 AS BIGINT))""".stripMargin
    def sortedHashes(n: Int) =
      sort_array(transform(wordNgramsAll(col("text"), n),
                           g => PortableHash.md5Long48(g)))
    documents
      // NULL-text docs carry no grams and are ABSENT (the behavior of
      // the previous exploded implementation and of the DuckDB oracle —
      // an unfiltered select would emit an all-zero row for them)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), sortedHashes(1).as("a1"), sortedHashes(2).as("a2"),
              sortedHashes(3).as("a3"))
      .select(col("doc_id"),
        expr(s"array_max(${runLens("a1")})").as("m1"),
        expr("cast(size(a1) as bigint)").as("t1"),
        expr(s"array_max(${runLens("a2")})").as("m2"),
        expr("cast(size(a2) as bigint)").as("t2"),
        expr(s"aggregate(filter(${runLens("a3")}, r -> r > 1), 0L, (acc, x) -> acc + x)").as("d3"),
        expr("cast(size(a3) as bigint)").as("t3"))
      .select(col("doc_id"),
        expr("coalesce((10000 * m1) div nullif(t1, 0), 0)").as("top_word_frac_x10000"),
        expr("coalesce((10000 * m2) div nullif(t2, 0), 0)").as("top_2gram_frac_x10000"),
        expr("coalesce((10000 * coalesce(d3, 0)) div nullif(t3, 0), 0)").as("dup_3gram_frac_x10000"))
  }

  /** corpus token-frequency table — the tokenizer-training input (BPE /
    * WordPiece training starts from exactly this count table): top-K
    * tokens by occurrence with a deterministic tie-break. One shuffle on
    * the token key (string keys hash-aggregate fine; only string
    * min/max trips SortAggregate), top-K as TakeOrderedAndProject. */
  def vocabulary(documents: DataFrame, topK: Int = 500): DataFrame =
    documents.select(explode(wsTokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occ"))
      .orderBy(desc("n_occ"), col("token")).limit(topK)

  /** sequence-length histogram in `bucket`-token bins — the
    * context-window planning input ([[packSequences]]' maxTokens is
    * chosen from this shape): per bin, document count and token mass.
    * One narrow projection + one bounded aggregation. */
  def lengthHistogram(documents: DataFrame, bucket: Int = 32): DataFrame =
    documents.select(size(wsTokens(col("text"))).cast("long").as("n_tok"))
      .groupBy(expr(s"(n_tok div $bucket) * $bucket").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  /** Bigram-LM fluency scores — the perplexity-style quality filter of
    * CCNet (Wenzek et al. 2020: rank documents by LM score, keep the
    * fluent head of the distribution). The model is a maximum-likelihood
    * bigram LM counted over `reference` (default: the corpus itself —
    * self-scoring, the in-domain ranking CCNet's wikipedia-LM
    * approximates); each document's score is the MEAN bigram probability
    *   p(cur|prev) = c(prev,cur) / c(prev-as-prefix)
    * in x1e6 fixed point. Deliberately LOG-FREE: a true log-perplexity
    * needs `ln`, which is not correctly-rounded and can differ in the
    * last ulp between the JVM and DuckDB's libm — mean probability ranks
    * documents monotonically for a fixed length profile and uses only
    * count, correctly-rounded IEEE division, ORDER-FIXED summation
    * (position-sorted left fold, the duckCos precedent) and floor, all
    * bit-portable, so the oracle hash-matches exactly.
    *
    * Scale shape: one exploded bigram pass over the reference (two
    * hash-agg counts on fixed-width 48-bit keys), two equi-joins of the
    * scored corpus's bigram occurrences against the count tables (longs;
    * AQE broadcasts them when the vocabulary is small), one per-doc
    * aggregation. A bigram unseen in the reference scores p = 0 (no
    * smoothing — smoothing exists to protect log(0), which mean
    * probability doesn't have); `n_known` reports how many bigrams the
    * model covered. Docs with < 2 tokens carry no bigrams:
    * n_bigrams = 0, fluency_x1e6 = -1. */
  def bigramLmScores(documents: DataFrame,
                     reference: Option[DataFrame] = None): DataFrame = {
    import graft.functions.PortableHash
    def occ(df: DataFrame): DataFrame = {
      val toks = wsTokens(col("text"))
      df.filter(col("text").isNotNull)
        .select(col("doc_id"), posexplode(
          when(size(toks) >= 2,
            transform(sequence(lit(0), size(toks) - 2),
              i => struct(element_at(toks, i + 1).as("pv"),
                          concat_ws(" ", element_at(toks, i + 1),
                                         element_at(toks, i + 2)).as("bg"))))
            .otherwise(array().cast("array<struct<pv:string,bg:string>>"))))
        .select(col("doc_id"), col("pos"),
                PortableHash.md5Long48(col("col.bg")).as("bh"),
                PortableHash.md5Long48(col("col.pv")).as("uh"))
    }
    val refOcc = occ(reference.getOrElse(documents))
    val bigCounts = refOcc.groupBy(col("bh")).agg(count(lit(1)).as("bc"))
    val prefCounts = refOcc.groupBy(col("uh")).agg(count(lit(1)).as("uc"))
    val scored = occ(documents)
      .join(bigCounts, Seq("bh"), "left")
      .join(prefCounts, Seq("uh"), "left")
      .select(col("doc_id"), col("pos"),
        when(col("bc").isNull, lit(0.0))
          .otherwise(col("bc").cast("double") / col("uc").cast("double")).as("p"),
        col("bc").isNotNull.cast("long").as("known"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("known")).as("n_known"),
           sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"), col("n_bigrams"), col("n_known"),
        floor(lit(1000000.0) *
              aggregate(col("ps"), lit(0.0), (acc, x) => acc + x.getField("p")) /
              col("n_bigrams")).cast("long").as("fluency_x1e6"))
    documents.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        coalesce(col("fluency_x1e6"), lit(-1L)).as("fluency_x1e6"))
  }

  /** PII patterns, deliberately CONSERVATIVE regex: no lookarounds, no
    * backreferences, ASCII digit classes — the subset on which Spark's
    * Java regex and DuckDB's RE2 agree token-for-token, so the oracle
    * recomputes scan counts and redactions exactly. Redaction order
    * matters (URLs can contain '@'): url → email → phone → long-id. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^ ]+", "[URL]"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "[0-9]{3}-[0-9]{3,4}-[0-9]{4}", "[PHONE]"),
    ("long_id", "[0-9]{15,}", "[ID]"))

  /** the per-category match-count columns over the raw text — single
    * builder shared by [[piiScan]] / [[piiReport]]. */
  private def piiCountCols: Seq[Column] =
    piiPatterns.map { case (name, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$name") }

  /** the ordered redaction fold — single builder shared by
    * [[piiRedact]] / [[piiReport]]. */
  private def piiRedactedCol: Column =
    piiPatterns.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, lit(pat), lit(repl)) }

  /** per-doc PII scan: match counts per category over the RAW text —
    * the audit pass before redaction (one narrow scan, zero shuffle).
    * Counts are per-category raw-text scans: a match inside an earlier
    * category's span (a phone in a URL) counts in both categories but is
    * redacted once, by the earliest pattern. */
  def piiScan(documents: DataFrame): DataFrame =
    documents.select(col("doc_id") +: piiCountCols: _*)

  /** scan counts + fingerprint of the redacted text in ONE narrow select
    * — the driver-query surface ([[piiScan]] and [[piiRedact]] fused). */
  def piiReport(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id") +: piiCountCols :+ md5(piiRedactedCol).as("redacted_fp"): _*)

  /** PII redaction: every match replaced by its category placeholder, in
    * the fixed [[piiPatterns]] order. Returns the redacted text plus the
    * total replacement count (cheap re-audit: the redacted text of a
    * clean doc is byte-identical to the input). */
  def piiRedact(documents: DataFrame): DataFrame = {
    val total = piiPatterns.map { case (_, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long")
    }.reduce(_ + _)
    documents.select(col("doc_id"), piiRedactedCol.as("text_redacted"),
                     total.as("n_redactions"))
  }

  /** Benchmark DECONTAMINATION check — exact n-gram overlap between the
    * corpus and an evaluation set (the standard contamination test:
    * 8-gram collision, as used for GPT-3/PaLM-style train/test
    * decontamination). Per document: its distinct n-gram count, how many
    * of those occur anywhere in the benchmark, the overlap fraction
    * (x10000 fixed-point) and a `contaminated` flag at the threshold.
    *
    * 100 TB shape: evaluation sets are tiny (MBs), so the benchmark
    * gram set is BROADCAST — the corpus-side probe is ONE narrow scan +
    * broadcast hash join, and the only shuffle is the single per-doc
    * count aggregation on doc_id. Docs with fewer than n words carry no
    * grams and are absent (nothing to test). */
  def contamination(documents: DataFrame, benchmark: DataFrame, n: Int = 8,
                    thresholdX10000: Long = 5000L): DataFrame = {
    import graft.functions.PortableHash
    val spark = documents.sparkSession
    import spark.implicits._
    // r9: corpus-side gram scan as one JVM pass (tokenize → n-token
    // windows → first-occurrence distinct → md5Long48), behind the
    // under-partitioned-scan guard — the previous Catalyst explode ran
    // the whole corpus grind on however many splits the tiny scan
    // yielded AND paid per-gram string materialization. Gram set and
    // hash values identical to array_distinct(wordNgramsAll(...)) +
    // md5Long48 (docs with < n tokens carry no grams; null text none).
    val docGrams = DedupOps.parallelized(documents)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val set = new java.util.LinkedHashSet[String]()
          if (text != null) {
            val toks = text.split(" ", -1)
            if (toks.length >= n) {
              val sb = new java.lang.StringBuilder()
              var i = 0
              while (i <= toks.length - n) {
                sb.setLength(0)
                var j = 0
                while (j < n) {
                  if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1
                }
                set.add(sb.toString)
                i += 1
              }
            }
          }
          val it = set.iterator()
          new Iterator[(Long, Long)] {
            def hasNext: Boolean = it.hasNext
            def next(): (Long, Long) = (id, PortableHash.md5Long48Jvm(it.next()))
          }
        }
      }.toDF("doc_id", "gram_h")
    val benchGrams = broadcast(
      benchmark
        .select(explode(array_distinct(wordNgramsAll(col("text"), n))).as("gram"))
        .select(PortableHash.md5Long48(col("gram")).as("gram_h")).distinct())
    // ONE corpus scan + ONE doc_id aggregation: the broadcast LEFT join
    // tags each gram with a hit flag, totals and hits aggregate together
    docGrams
      .join(benchGrams.withColumn("hit", lit(1L)), Seq("gram_h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
           sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .select(col("doc_id"), col("n_grams"), col("n_hits"),
        expr("(10000 * n_hits) div n_grams").as("overlap_x10000"))
      .withColumn("contaminated", col("overlap_x10000") >= lit(thresholdX10000))
  }

  /** stopword ratio x1000 (integer division, Python-// semantics). */
  def stopRatioX1000Expr: Column =
    expr(s"(1000 * size(filter(split(text, ' '), t -> t in (${stopwords.map("'" + _ + "'").mkString(",")}))) ) div greatest(size(split(text, ' ')), 1)")

  def digitRatioX1000Expr(text: Column): Column =
    ((lit(1000L) * digitCharCount(text).cast("long")) /
      greatest(length(text).cast("long"), lit(1L))).cast("long")

  /** Deterministic PER-LANGUAGE stratified sampling — the data-MIXING
    * primitive (training mixes are specified as per-language/source
    * quotas): a doc is kept iff `md5Long48(doc_id) mod 10000` falls
    * under its language's x10000 fraction. Content-hash thresholding
    * (not rand()) makes the sample reproducible across runs, engines
    * (the DuckDB oracle recomputes it bit-exactly), cluster sizes and
    * partitionings; the plan is a single narrow filter over one corpus
    * scan — no shuffle, no per-stratum pass. Unlisted languages default
    * to fraction 0 (dropped). */
  def stratifiedSample(documents: DataFrame,
                       fracX10000ByLang: Map[String, Int]): DataFrame = {
    val lang = langIdExpr(col("text"))
    val ticket = docTicket(10000L)
    val quota = fracX10000ByLang.foldLeft(lit(0)) {
      case (acc, (l, f)) => when(lang === l, lit(f)).otherwise(acc)
    }
    documents.select(col("doc_id"), lang.as("lang_pred"),
                     ticket.cast("long").as("ticket_x10000"), col("text"))
      .filter(col("ticket_x10000") < quota)
  }

  /** SEQUENCE PACKING for context-window training: assign docs to
    * fixed-token-budget bins. Global greedy packing is inherently
    * sequential, so the scalable contract is `nStreams` PARALLEL packing
    * streams (stream = hash(doc_id) mod nStreams — at cluster scale one
    * stream per executor-ish): within a stream, docs are packed in
    * doc_id order by running token count, bin = the doc's starting
    * cumulative sum div maxTokens. One shuffle (the per-stream window);
    * stream partitions are ~corpus/nStreams, never a global sort. A doc
    * longer than maxTokens still gets a deterministic bin (it simply
    * spans budgets — splitting oversize docs is the tokenizer's job
    * upstream). Fully deterministic → DuckDB recomputes it exactly. */
  def packSequences(documents: DataFrame, maxTokens: Long = 2048,
                    nStreams: Int = 8): DataFrame = {
    val nTok = size(wsTokens(col("text"))).cast("long")
    val stream = docTicket(nStreams.toLong).cast("int")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stream")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    documents
      .select(col("doc_id"), stream.as("stream"), nTok.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("stream"), col("n_tokens"),
              expr(s"(cum_tokens - n_tokens) div $maxTokens").cast("long").as("bin"))
  }

  /** the composed training-corpus cleaner — the end-user surface the
    * individual ops exist for: exact-dedup to the keeper copy, then
    * quality gates (token count window, stopword floor, digit ceiling),
    * then a language allowlist. Plan: ONE aggregation (dedup keepers) +
    * one semi-join back; the lang/quality features are inline projections
    * on the kept rows (codegen'd, no extra joins, single scan of the
    * corpus side). Emits the kept rows with their quality features so
    * downstream sampling can stratify.
    *
    * Gate defaults are x1000 fixed-point like everything in this file. */
  def cleanCorpus(documents: DataFrame,
                  minTokens: Int = 5, maxTokens: Int = 100000,
                  minStopRatioX1000: Int = 1, maxDigitRatioX1000: Int = 300,
                  langs: Seq[String] = Seq("en", "zh")): DataFrame = {
    // keeper ids: min doc_id per distinct text (exact dedup winner)
    val keepers = documents
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    documents.select(col("doc_id"), col("text"))
      .join(keepers, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
              langIdExpr(col("text")).as("lang_pred"),
              size(wsTokens(col("text"))).cast("long").as("n_tokens"),
              stopRatioX1000Expr.as("stop_ratio_x1000"),
              digitRatioX1000Expr(col("text")).as("digit_ratio_x1000"),
              col("text"))
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
              // the stopword floor is an ENGLISH fluency gate — other
              // languages pass it (their fluency gate is the token window
              // + digit ceiling; the stoplist is en function words)
              (col("lang_pred") =!= "en" || col("stop_ratio_x1000") >= minStopRatioX1000) &&
              col("digit_ratio_x1000") <= maxDigitRatioX1000 &&
              col("lang_pred").isin(langs: _*))
  }

  /** exact integer square root as a Column — floor(sqrt(c)) for
    * c < 2^52. IEEE-754 sqrt is correctly rounded on both engines, so
    * the double result is within one ulp of the true root; the ±1
    * integer correction makes the value EXACT regardless of which side
    * the rounding landed on (the DuckDB oracle applies the identical
    * correction), keeping the x^(1/2) temperature weight bit-portable
    * without any float in the output. */
  private[graft] def isqrt(c: Column): Column = {
    val x0 = floor(sqrt(c.cast("double"))).cast("long")
    x0 - when(x0 * x0 > c, lit(1L)).otherwise(lit(0L)) +
      when((x0 + 1) * (x0 + 1) <= c, lit(1L)).otherwise(lit(0L))
  }

  /** Document CHUNKING with overlap — the context-window splitter an
    * embedding/RAG ingest or a long-doc training pipeline runs before
    * packing: stride-stepped token windows of `chunkTokens` whitespace
    * tokens, consecutive chunks sharing `overlap` tokens
    * (stride = chunkTokens − overlap). The window rule is POSITIONAL
    * ONLY (starts at 0, stride, 2·stride, … while < n_tokens; the tail
    * window is emitted even when short) so it is partition-free,
    * order-free and exact-integer — the DuckDB oracle recomputes every
    * chunk boundary bit-identically. A NULL text behaves as the empty
    * text (one empty chunk), keeping the every-input-doc contract of
    * the other rewriting ops.
    *
    * Output: (doc_id, chunk_idx, start_tok, n_chunk_toks, chunk_text).
    *
    * Plan: ZERO SHUFFLE — one narrow scan + a row-local posexplode of
    * a doc-length-bounded window array; embarrassingly parallel at any
    * corpus size. */
  def chunkDocs(documents: DataFrame, chunkTokens: Int = 128,
                overlap: Int = 32): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need chunkTokens > overlap >= 0, got $chunkTokens/$overlap")
    val step = chunkTokens - overlap
    documents
      // split never yields an empty array (split('', ' ') = ['']), so
      // every doc has n >= 1 tokens and emits >= 1 chunk
      .select(col("doc_id"), split(coalesce(col("text"), lit("")), " ").as("t"))
      .select(col("doc_id"), expr("size(t)").as("n"), col("t"))
      .select(col("doc_id"), col("n"),
        posexplode(expr(
          s"""transform(sequence(0, n - 1, $step),
             |  s -> array_join(slice(t, s + 1, $chunkTokens), ' '))""".stripMargin))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx").cast("long") * step).as("start_tok"),
        least(lit(chunkTokens.toLong),
              col("n").cast("long") - col("chunk_idx") * step).as("n_chunk_toks"),
        col("chunk_text"))
  }

  /** Temperature-scaled SOURCE-mixing rates — the data-mixture
    * primitive of GPT-3 / Llama-style pretraining corpora (sample
    * source s with probability ∝ n_s^alpha; alpha < 1 upweights small
    * high-quality sources against the web crawl's bulk). Supported
    * temperatures are exact-integer by construction: alphaX2 ∈
    * {0 (uniform budget), 1 (sqrt — the common 0.5), 2 (proportional)}
    * — a general real alpha needs pow(), whose libm rounding differs
    * across engines and would break the oracle hash.
    *
    * Per source: weight w_s = n_s^(alphaX2/2), keep-rate
    * r_s = min(1, B·w_s / (Σw · n_s)) in x10000 fixed point where
    * B = N·budgetFracX10000/10000 is the target corpus budget —
    * expected kept mass ∝ w_s, total ≈ B. All products ride
    * DECIMAL(38,0) (exact at petascale counts; long products would
    * wrap). Plan: ONE corpus scan into one per-source aggregation; the
    * corpus-wide totals ride an unpartitioned window over the
    * sources-sized result (n_sources rows — single-partition by
    * design). A separate totals aggregate joined back would duplicate
    * the scan subtree into both join sides — two corpus scans. */
  def temperatureRates(documents: DataFrame, alphaX2: Int = 1,
                       budgetFracX10000: Int = 5000): DataFrame = {
    require(Set(0, 1, 2)(alphaX2), s"alphaX2 must be 0, 1 or 2, got $alphaX2")
    val counts = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val weighted = counts.select(col("source"), col("n_docs"),
      (alphaX2 match {
        case 0 => lit(1L)
        case 1 => isqrt(col("n_docs"))
        case 2 => col("n_docs")
      }).as("weight"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    weighted
      .withColumn("sum_w", sum(col("weight")).over(all))
      .withColumn("n_total", sum(col("n_docs")).over(all))
      .select(col("source"), col("n_docs"), col("weight"),
        expr(s"""cast(least(cast(10000 as decimal(38,0)),
                 |  (cast(n_total as decimal(38,0)) * $budgetFracX10000 * weight)
                 |    div (cast(sum_w as decimal(38,0)) * n_docs)) as long)""".stripMargin)
          .as("rate_x10000"))
  }

  /** The corpus-side application of [[temperatureRates]]: keep a doc
    * iff its content-hash ticket (same md5-derived ticket as
    * [[stratifiedSample]] — reproducible across runs, engines and
    * partitionings; no rand()) falls under its source's rate. The rate
    * table is sources-count-sized, so the join back is a BROADCAST —
    * the corpus side stays a single narrow scan + filter. */
  def temperatureSample(documents: DataFrame, alphaX2: Int = 1,
                        budgetFracX10000: Int = 5000): DataFrame = {
    graft.functions.ZhFunctions.register(documents.sparkSession) // native md5_long48
    val rates = temperatureRates(documents, alphaX2, budgetFracX10000)
      .select(col("source"), col("rate_x10000"))
    val ticket = docTicket(10000L)
    documents.select(col("doc_id"), col("source"),
                     ticket.cast("long").as("ticket_x10000"))
      .join(broadcast(rates), Seq("source"))
      .filter(col("ticket_x10000") < col("rate_x10000"))
      .select(col("doc_id"), col("source"), col("ticket_x10000"),
              col("rate_x10000"))
  }
}
