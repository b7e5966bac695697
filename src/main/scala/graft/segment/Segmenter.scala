package graft.segment

import scala.collection.mutable.ListBuffer

/** Sentence segmentation + normalization.
  *
  * Semantics re-derived from the reference's `split_str` /
  * `split_long_sentences` (/root/reference/preprocess_corpus.py:66-163):
  * cascading split on a delimiter list with delimiter re-attachment rules,
  * a Chinese-character length admission window (4 < zh ≤ 430, total < 500),
  * greedy re-split of over-long sentences at weak boundaries, and a final
  * strip.
  *
  * The reference's `Normalizer.tok_norm` (preprocess_corpus.py:26-58) runs
  * text through a BERT tokenizer only to delete '[UNK]' tokens, '#', '::'
  * and spaces; we re-derive it as a deterministic character-level
  * normalization spec (no model dependency): remove whitespace, '#' and
  * '::', drop empty lines.
  */
object Segmenter {

  /** reference delimiter cascade (preprocess_corpus.py:11). */
  val delimiters: Seq[String] = Seq("\n", "。", "！", "？", "；", "：\"", "……", ";", "。\"")

  /** delimiters NOT re-attached to the preceding piece (py:116). */
  private val noReattach = Set(" ", "\n", "（", "：\"")
  /** delimiters whose LAST char prefixes the following piece (py:118). */
  private val prefixNext = Set("（", "：\"")

  val FilterLen = 4
  val MaxZh = 430
  val MaxLen = 500

  def countZhChars(s: String): Int = s.count(c => c >= '一' && c <= '鿿')

  /** Python str.split(sep) semantics (all occurrences, keeps empties).
    * Fast path: no separator present → single-element wrap. */
  private def pySplit(s: String, sep: String): IndexedSeq[String] = {
    var i = s.indexOf(sep)
    if (i < 0) return scala.collection.immutable.ArraySeq(s)
    val out = ListBuffer.empty[String]
    var start = 0
    while (i >= 0) {
      out += s.substring(start, i)
      start = i + sep.length
      i = s.indexOf(sep, start)
    }
    out += s.substring(start)
    out.toIndexedSeq
  }

  /** greedy re-split of an over-long sentence at the weak boundary nearest
    * below each `interval`-char window (preprocess_corpus.py:66-100).
    * Index arithmetic is over CODE POINTS, matching Python string
    * semantics — a 430-char window must never land mid-surrogate-pair for
    * supplementary-plane CJK (ext-B etc.). */
  def splitLongSentences(string: String, interval: Int = MaxZh): Vector[String] = {
    val cps = string.codePoints().toArray
    def sub(st: Int, en: Int) = new String(cps, st, en - st)
    val res = ListBuffer.empty[String]
    var offset = 0
    var break = false
    while (offset < cps.length && !break) {
      if (offset + interval >= cps.length) {
        res += sub(offset, cps.length)
        offset += interval
        break = true
      } else {
        var closest = -1
        var i = interval
        var found = false
        while (i > 0 && !found) {
          if (offset + i < cps.length) {
            val c = cps(offset + i)
            if (c == '，' || c == '；' || c == '、' || c == ' ') {
              closest = offset + i
              res += sub(offset, closest)
              offset = closest + 1
              found = true
            }
          }
          i -= 1
        }
        if (closest == -1 && offset + interval < cps.length) {
          closest = offset + interval
          res += sub(offset, closest)
          offset = closest
        }
      }
    }
    res.toVector.filter(item => countZhChars(item) > FilterLen)
  }

  /** cascading delimiter split + admission filter + strip
    * (preprocess_corpus.py:103-163). Returns sentences zipped with the
    * index of the input chunk each came from (lineage). */
  def splitStr(chunks: Seq[String]): Vector[(String, Int)] =
    splitStr(chunks, chunks.indices)

  /** mapping-threaded variant (reference split_str's `split_mapping`
    * parameter, preprocess_corpus.py:103-108): the caller supplies the
    * original-chunk id for each input chunk — the newsspike reader passes
    * a persisted mapping through a RE-split so sentence lineage survives
    * re-chunking (preprocess_corpus.py:342-355). */
  def splitStr(chunks: Seq[String], mapping: Seq[Int]): Vector[(String, Int)] = {
    require(chunks.length == mapping.length, "chunks and mapping must align")
    var splitted: Vector[(String, Int)] = chunks.zip(mapping).toVector
    for (d <- delimiters) {
      splitted = splitted.flatMap { case (s, idx) =>
        val pieces = pySplit(s, d)
        pieces.zipWithIndex.map { case (piece, pieceId) =>
          val withDelim =
            if (pieceId != pieces.length - 1 && !noReattach.contains(d)) piece + d
            else if (pieceId > 0 && prefixNext.contains(d)) d.last.toString + piece
            else piece
          (withDelim, idx)
        }
      }
    }
    val admitted = splitted.flatMap { case (s, idx) =>
      val zh = countZhChars(s)
      // total length in CODE POINTS (Python len semantics) — for
      // supplementary-plane chars UTF-16 length would overcount
      val len = s.codePointCount(0, s.length)
      if (FilterLen < zh && zh <= MaxZh && len < MaxLen) Vector((s, idx))
      else if (zh > MaxZh || len >= MaxLen) splitLongSentences(s).map((_, idx))
      else Vector.empty
    }
    admitted.map { case (s, idx) => (s.trim, idx) }
  }

  /** normalization spec replacing the reference's BERT-tokenizer round-trip
    * (see class doc): remove whitespace / '#' / '::', drop empties. */
  def tokNorm(sentences: Seq[String]): Vector[String] =
    sentences.map(_.filterNot(_.isWhitespace).replace("#", "").replace("::", ""))
      .filter(_.nonEmpty).toVector

  /** tokNorm keeping a lineage mapping aligned: pairs whose text
    * normalizes to empty are dropped TOGETHER (the reference normalizes
    * then asserts alignment, preprocess_corpus.py:349-355 — valid only
    * because admitted sentences never normalize to empty; dropping the
    * pair keeps this total instead of crashing). */
  def tokNormWithMapping(pairs: Seq[(String, Int)]): Vector[(String, Int)] =
    pairs.iterator.map { case (s, idx) =>
      (s.filterNot(_.isWhitespace).replace("#", "").replace("::", ""), idx)
    }.filter(_._1.nonEmpty).toVector

  /** full segmentation of one text payload: split → normalize. */
  def segment(text: String): Vector[String] =
    tokNorm(splitStr(Seq(text)).map(_._1))

  /** [[segment]] with VOCAB-DRIVEN normalization instead of the char
    * spec — point [[VocabNormalizer.fromFile]] at a real
    * `bert-base-chinese/vocab.txt` to reproduce the reference's
    * tokenizer round-trip on corpora where the two diverge (characters
    * outside the vocab are dropped as [UNK]s there, kept by the char
    * spec). Identical outputs whenever the text stays inside the vocab
    * (diff-tested in SegmenterSpec). */
  def segmentWithVocab(text: String, vn: VocabNormalizer): Vector[String] =
    vn.normalize(splitStr(Seq(text)).map(_._1))
}
