package graft.pipeline

import graft.model.DepParse
import graft.synth.FixtureParser

/** Pluggable dependency-parse boundary — the second (and last) live-NLP
  * model seam, mirroring [[SentenceAnnotator]].
  *
  * The reference loads DDParser IN-PROCESS and calls it per sentence
  * batch (/root/reference/dudepparse.py:1851,1899); extraction then runs
  * over the parser's (word, head, deprel) columns plus the separately
  * attached CoreNLP POS map (main_ner.py:36-40). Neither model ships in
  * this sandbox, so the engine's default is the deterministic
  * [[FixtureDepParser]] — but the INTEGRATION SHAPE is the same concrete,
  * testable contract the annotator seam has:
  *
  *  - one connection per PARTITION: `open()` runs before the first batch,
  *    `close()` is registered on the task-completion listener so it runs
  *    even when the task fails — the `mapPartitions` analogue of the
  *    reference's model-instance-per-slice-process;
  *  - bounded request BATCHES (`batchSize` sentences per `parse` call),
  *    results aligned index-wise — a misaligned reply fails loudly
  *    instead of attaching parses to the wrong sentences;
  *  - a per-sentence `None` means "the parser cannot analyze this
  *    sentence" (the reference prints and skips such mismatches,
  *    dudepparse.py:1894-1897) — recorded in the caller's unparsed
  *    accumulator, never silently dropped;
  *  - implementations must be Serializable (the instance is shipped to
  *    executors); live connections belong in `@transient` state created
  *    by `open()`.
  */
trait DepParser extends Serializable {
  /** open the per-partition connection; called once before any batch. */
  def open(): Unit = ()
  /** parse a batch; MUST return exactly one result per input sentence,
    * aligned by index. None = sentence the parser cannot analyze. The
    * result pairs the dependency parse with the sentence's POS-tag map
    * (word → tags — the reference's corenlp_pos_tags shape,
    * main_ner.py:36-40). */
  def parse(sentences: Seq[String]): Seq[Option[(DepParse, Map[String, Seq[String]])]]
  /** release the per-partition connection; runs on task completion
    * (success or failure) — must be idempotent. */
  def close(): Unit = ()
}

/** the deterministic in-sandbox parser: template-recovered fixtures, the
  * stand-in for DDParser inference that the differential batteries pin
  * down exact against the reference. */
object FixtureDepParser extends DepParser {
  def parse(sentences: Seq[String]): Seq[Option[(DepParse, Map[String, Seq[String]])]] =
    sentences.map(FixtureParser.analyze)
}

/** a concrete remote-server client for the parser seam: POSTs one JSON
  * batch per `parse` call and parses the aligned reply — the shape a
  * DDParser-server adapter takes (a real server wraps
  * `DDParser.parse_seg`/`parse` and emits its word/head/deprel columns
  * verbatim; dudepparse.py:1899 consumes exactly those three).
  *
  * Wire contract (documented, mock-served in PipelineSpec):
  *   request  {"sentences": ["…", …]}
  *   response {"parses": [{"word":[…], "head":[…], "deprel":[…],
  *                         "pos": {"<word>": ["<tag>", …], …}}
  *                        | null, …]}
  * `null` marks a sentence the server cannot parse; `pos` is the
  * sentence's word → POS-tags map (the reference's corenlp_pos_tags
  * entry shape). word/head/deprel must be equal-length.
  *
  * One JVM-wide `java.net.http.HttpClient` (thread-safe; the parser
  * instance is deserialized per TASK and JDK 17's HttpClient has no
  * close(), so a client per task would leak selector threads — same
  * rationale as [[HttpSentenceAnnotator]]); `timeoutMs` mirrors the
  * reference client's 90 s default (main_ner.py:80). */
final class HttpDepParser(endpoint: String, timeoutMs: Long = 90000L)
    extends DepParser {
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def client: java.net.http.HttpClient = HttpDepParser.shared

  def parse(sentences: Seq[String]): Seq[Option[(DepParse, Map[String, Seq[String]])]] = {
    val root = mapper.createObjectNode()
    val arr = root.putArray("sentences")
    sentences.foreach(arr.add)
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(root), java.nio.charset.StandardCharsets.UTF_8))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString(java.nio.charset.StandardCharsets.UTF_8))
    require(resp.statusCode() == 200,
      s"parser server $endpoint returned HTTP ${resp.statusCode()}")
    val out = mapper.readTree(resp.body()).get("parses")
    require(out != null && out.size() == sentences.length,
      s"parser reply misaligned: sent ${sentences.length} sentences, " +
        s"got ${if (out == null) "none" else out.size().toString} back")
    (0 until out.size()).map { i =>
      val node = out.get(i)
      if (node == null || node.isNull) None
      else {
        def strings(field: String): IndexedSeq[String] = {
          val a = node.get(field)
          require(a != null && a.isArray, s"parser reply missing array '$field'")
          (0 until a.size()).map(j => a.get(j).asText())
        }
        val words = strings("word")
        val headsNode = node.get("head")
        require(headsNode != null && headsNode.isArray,
          "parser reply missing array 'head'")
        // strict: asInt() would silently coerce a malformed head (null,
        // string, object) to 0 = ROOT, attaching every word to the root
        // without an error — exactly the silent-wrong-attachment mode
        // this boundary promises to fail loudly on
        val heads = (0 until headsNode.size()).map { j =>
          val h = headsNode.get(j)
          require(h != null && h.canConvertToInt,
            s"parser reply head[$j] is not an integer: $h")
          h.asInt()
        }
        val deprels = strings("deprel")
        require(words.length == heads.length && words.length == deprels.length,
          s"parser reply ragged: ${words.length} words, ${heads.length} heads, " +
            s"${deprels.length} deprels")
        val posNode = node.get("pos")
        var pos = Map.empty[String, Seq[String]]
        if (posNode != null && posNode.isObject) {
          val fields = posNode.fields()
          while (fields.hasNext) {
            val e = fields.next()
            val tags = (0 until e.getValue.size()).map(j => e.getValue.get(j).asText())
            pos = pos.updated(e.getKey, tags)
          }
        }
        Some((DepParse(words, heads, deprels), pos))
      }
    }
  }
}

object HttpDepParser {
  /** JVM-wide shared client (thread-safe per the JDK contract). */
  private lazy val shared: java.net.http.HttpClient =
    java.net.http.HttpClient.newHttpClient()
}
