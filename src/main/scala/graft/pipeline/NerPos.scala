package graft.pipeline

import scala.collection.mutable

/** NER mention/span + POS-tag assembly per sentence, re-derived from the
  * reference's ner_pos_per_sentence (/root/reference/main_ner.py:9-41):
  * tokens labelled anything but O/PERCENT become mentions with char
  * spans; a span that does not slice back to the token surface only
  * increments a misplaced counter (the mention is still kept —
  * main_ner.py:25-35); POS tags accumulate per surface word as a set.
  * The annotation itself is model input (mock/fixture in-sandbox). */
object NerPos {

  final case class AnnToken(word: String, pos: String, ner: String,
                            beginChar: Int, endChar: Int)
  final case class MentionOut(word: String, label: String, begin: Int, end: Int)
  final case class NerPosResult(mentions: Vector[MentionOut],
                                spans: Vector[(Int, Int)],
                                posTags: Map[String, Set[String]],
                                nerBucket: Map[String, Int],
                                misplacedSpans: Int)

  /** Python slice semantics (negative indices wrap, bounds clamp). */
  private def pySlice(s: String, b: Int, e: Int): String = {
    val n = s.length
    val bb = if (b < 0) math.max(n + b, 0) else math.min(b, n)
    val ee = if (e < 0) math.max(n + e, 0) else math.min(e, n)
    if (bb >= ee) "" else s.substring(bb, ee)
  }

  def nerPosPerSentence(sent: String, annSentences: Seq[Seq[AnnToken]]): NerPosResult = {
    val mentions = Vector.newBuilder[MentionOut]
    val spans = Vector.newBuilder[(Int, Int)]
    val posTags = mutable.LinkedHashMap.empty[String, mutable.LinkedHashSet[String]]
    val bucket = mutable.Map.empty[String, Int].withDefaultValue(0)
    var misplaced = 0
    for (toks <- annSentences; token <- toks) {
      if (token.ner != "O" && token.ner != "PERCENT") {
        bucket(token.ner) += 1
        if (token.word != pySlice(sent, token.beginChar, token.endChar)) misplaced += 1
        mentions += MentionOut(token.word, token.ner, token.beginChar, token.endChar)
        spans += ((token.beginChar, token.endChar))
      }
      posTags.getOrElseUpdate(token.word, mutable.LinkedHashSet.empty) += token.pos
    }
    NerPosResult(mentions.result(), spans.result(),
                 posTags.map { case (k, v) => k -> v.toSet }.toMap,
                 bucket.toMap, misplaced)
  }
}
