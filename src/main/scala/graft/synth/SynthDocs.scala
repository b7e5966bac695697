package graft.synth

import graft.model.{Doc, Span}

/** Deterministic interleaved text+media document generator — the engine's
  * synthetic stand-in for the driver-mandated input table
  * (doc_id string, spans array<struct<kind,text,media_ref,offset>>).
  *
  * Text spans concatenate 。-terminated fixture sentences (1-3 per span by
  * index arithmetic); media spans (image/audio/video) are interleaved
  * between them and must pass through the pipeline untouched — the per-row
  * span-sequence invariant (kind, text, media_ref, order).
  * No RNG: docIdx fully determines the document.
  */
object SynthDocs {

  val DefaultSentsPerDoc = 8

  def docId(docIdx: Long): String = f"doc_$docIdx%012d"

  def genDoc(docIdx: Long, sentsPerDoc: Int = DefaultSentsPerDoc): Doc = {
    val sents = (0 until sentsPerDoc).map(j => Templates.generate(docIdx * sentsPerDoc + j).sentence)
    val spans = Vector.newBuilder[Span]
    var offset = 0
    var si = 0
    var spanIdx = 0
    while (si < sents.length) {
      val group = 1 + ((docIdx + spanIdx) % 3).toInt // 1-3 sentences per text span
      val text = sents.slice(si, math.min(si + group, sents.length)).mkString
      spans += Span("text", text, null, offset)
      offset += 1
      si += group
      if ((docIdx + spanIdx) % 2 == 0) {
        val kind = Vector("image", "audio", "video")(((docIdx + spanIdx) % 3).toInt)
        spans += Span(kind, null, s"media://$docIdx/$spanIdx", offset)
        offset += 1
      }
      spanIdx += 1
    }
    Doc(docId(docIdx), spans.result())
  }

  /** the sentences the pipeline is expected to recover from genDoc(i). */
  def expectedSentences(docIdx: Long, sentsPerDoc: Int = DefaultSentsPerDoc): Vector[String] =
    (0 until sentsPerDoc).map(j => Templates.generate(docIdx * sentsPerDoc + j).sentence).toVector
}
