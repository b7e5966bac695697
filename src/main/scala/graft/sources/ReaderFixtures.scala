package graft.sources

import java.nio.file.{Files, Paths}

/** Deterministic corpus-reader fixtures for the driver-visible `src_*`
  * queries: tiny JSONL batteries (webhose / clue / newsspike shapes,
  * /root/reference/preprocess_corpus.py:166-355) plus a webhose
  * one-JSON-file-per-article directory tree (:166-194). Written
  * idempotently under /tmp so the DuckDB oracle re-reads the SAME files
  * via read_json.
  *
  * Fixture texts are designed so admission is DuckDB-predictable: every
  * '。'-terminated segment is either clearly admissible (>4 Chinese chars,
  * no other delimiters / whitespace / '#' / '::') or clearly excluded
  * (≤4 Chinese chars) — so the oracle's per-segment zh-count predicate
  * reproduces the Segmenter's routing exactly. Splitting CONTENT stays
  * covered by the reference-differential battery, not these oracles.
  */
object ReaderFixtures {

  val Root = "/tmp/graft_src_fixtures"

  /** webhose JSONL: {uuid, title, text} — covers multi-sentence admit,
    * English-only / empty / short-zh exclusion, and mixed segments where
    * only the long-enough one is admitted. */
  val webhoseLines: Seq[String] = Seq(
    """{"uuid":"wh-001","title":"t1","text":"今天天气很好我们出去玩。他们在公园里看到了很多花。"}""",
    """{"uuid":"wh-002","title":"t2","text":"hello world this is english only."}""",
    """{"uuid":"wh-003","title":"t3","text":""}""",
    """{"uuid":"wh-004","title":"t4","text":"好。经济发展需要更多人才支持。你好。"}""",
    """{"uuid":"wh-005","title":"t5","text":"短句。"}""")

  /** clue JSONL: {news_id, title, content}. */
  val clueLines: Seq[String] = Seq(
    """{"news_id":"cl-001","title":"a","content":"科技公司发布了新的产品。市场反应非常热烈。"}""",
    """{"news_id":"cl-002","title":"b","content":"short en text."}""",
    """{"news_id":"cl-003","title":"c","content":"政府宣布了新的政策方向。"}""",
    """{"news_id":"cl-004","title":"d","content":""}""")

  /** newsspike JSONL: pre-split {id, splitted_text, split_mapping} — the
    * mapping values are non-contiguous so lineage threading is visible in
    * the max_chunk column. */
  val newsspikeLines: Seq[String] = Seq(
    """{"id":"ns-001","splitted_text":["研究人员发现了新的方法。数据分析结果令人满意。","实验过程持续了三个月。"],"split_mapping":[0,2]}""",
    """{"id":"ns-002","splitted_text":["english only chunk.","好。"],"split_mapping":[1,3]}""",
    """{"id":"ns-003","splitted_text":[],"split_mapping":[]}""",
    """{"id":"ns-004","splitted_text":["城市建设取得了显著进展。"],"split_mapping":[7]}""")

  /** webhose directory mode: one JSON OBJECT per file in a nested tree
    * (the reference os.walk + json.load shape). */
  val webhoseDirFiles: Seq[(String, String)] = Seq(
    "a/1.json" ->
      """{"uuid":"whd-001","title":"t1","text":"今天天气很好我们出去玩。他们在公园里看到了很多花。"}""",
    "a/2.json" ->
      """{"uuid":"whd-002","title":"t2","text":"hello world this is english only."}""",
    "b/c/3.json" ->
      """{"uuid":"whd-003","title":"t3","text":"经济发展需要更多人才支持。"}""")

  /** write-if-changed (idempotent; concurrent callers serialized). Returns
    * the fixture root. */
  def ensure(): String = synchronized {
    def put(rel: String, content: String): Unit = {
      val p = Paths.get(Root, rel)
      Files.createDirectories(p.getParent)
      if (!Files.exists(p) || Files.readString(p) != content)
        Files.writeString(p, content)
    }
    put("webhose.jsonl", webhoseLines.mkString("", "\n", "\n"))
    put("clue.jsonl", clueLines.mkString("", "\n", "\n"))
    put("newsspike.jsonl", newsspikeLines.mkString("", "\n", "\n"))
    webhoseDirFiles.foreach { case (rel, content) => put(s"webhose_dir/$rel", content) }
    Root
  }
}
