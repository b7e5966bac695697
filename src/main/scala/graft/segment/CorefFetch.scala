package graft.segment

import scala.collection.mutable.ListBuffer

/** Full coreference front-end, re-derived from the reference's
  * `merge_texts` + `fetch_coref` (/root/reference/main_ner.py:168-325):
  * sentence-chunk merging for bounded annotator requests, annotator-
  * sentence → source-sentence alignment, token-mention → char-span
  * conversion (with the reference's 。-token removal before offset
  * arithmetic), representative-mention substitution with the overlap /
  * empty-replacement quirks, and the failure/mismatch flags.
  *
  * The annotator itself is a function argument (`annotate`) — model
  * inference is input, exactly like the parses. Quirks preserved:
  *  - `last_splid` is initialized but never advanced (main_ner.py:225,
  *    231-232), so every annotator sentence searches from the first
  *    source sentence;
  *  - a chunk longer than the threshold at position 0 flushes an EMPTY
  *    first chunk (main_ner.py:175-187);
  *  - the representative mention substitutes itself (a no-op rewrite that
  *    still occupies a replacement slot and can shadow later overlaps);
  *  - a single token/span mismatch fails the WHOLE document
  *    (main_ner.py:273-281, returned as coref_failed).
  */
object CorefFetch {

  final case class Mention(sentenceIndex: Int, beginIndex: Int, endIndex: Int)
  final case class Chain(mentions: Vector[Mention], representative: Int)
  final case class Ann(sentences: Vector[Vector[String]], chains: Vector[Chain])

  final case class FetchResult(
      corefed: Option[Vector[Option[Vector[String]]]], // per chunk: None or sentences
      corefFailed: Boolean,
      mismatched: Boolean,
      overlapCount: Int,
      nChains: Int)

  /** chunk sentences into ≤threshold-char requests joined by 。
    * (main_ner.py:168-191). Returns (merged, [start, end) sentence
    * ranges). */
  def mergeTexts(splitted: Seq[String], threshold: Int): (Vector[String], Vector[(Int, Int)]) = {
    require(threshold > 512)
    val merged = ListBuffer.empty[String]
    val offsets = ListBuffer.empty[(Int, Int)]
    var curM = ListBuffer.empty[String]
    var accumLen = 0
    var nextOffset = 0
    for (sid <- 0 to splitted.length) {
      val sentLen = if (sid < splitted.length) splitted(sid).length else 0
      if (sid == splitted.length || accumLen + sentLen > threshold) {
        merged += curM.mkString("。")
        offsets += ((nextOffset, sid))
        nextOffset = sid
        curM = ListBuffer.empty[String]
        accumLen = 0
      }
      if (sid < splitted.length) {
        curM += splitted(sid)
        accumLen += splitted(sid).length
      }
    }
    (merged.toVector, offsets.toVector)
  }

  private def stripJuhao(s: String): String = {
    var st = 0; var en = s.length
    while (st < en && s.charAt(st) == '。') st += 1
    while (en > st && s.charAt(en - 1) == '。') en -= 1
    s.substring(st, en)
  }

  /** the reference's fetch_coref (main_ner.py:194-325). `annotate` throwing
    * marks the document coref-failed (retry-at-half-threshold is the
    * caller's policy, main_ner.py:395-399). The annotator receives the
    * CHUNK INDEX alongside the text — callers that need the chunk's
    * sentence range must use the index, never a text lookup (two merged
    * chunks can carry identical text). */
  def fetchCoref(mergedTexts: Vector[String], offsets: Vector[(Int, Int)],
                 splitted: Vector[String],
                 annotate: (Int, String) => Ann): FetchResult = {
    var nChains = 0
    val corefed = ListBuffer.empty[Option[Vector[String]]]
    var mismatched = false
    var overlapCount = 0

    for (((text, (st, en)), chunkIdx) <- mergedTexts.zip(offsets).zipWithIndex) {
      val thisSplitted = splitted.slice(st, en)
      val ann =
        try annotate(chunkIdx, text)
        catch { case _: Exception =>
          return FetchResult(None, corefFailed = true, mismatched, overlapCount, nChains)
        }

      // annotator sentence → (source sentence, char bias)
      val mapping = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      var allMapped = true
      val sentLists = ann.sentences
      for (i <- sentLists.indices) {
        val sentLem = stripJuhao(sentLists(i).mkString)
        var found = false
        var splid = 0
        while (splid < thisSplitted.length && !found) {
          val bias = thisSplitted(splid).indexOf(sentLem)
          if (bias >= 0) { mapping(i) = (splid, bias); found = true }
          splid += 1
        }
        if (!found) allMapped = false
      }

      nChains += ann.chains.length

      if (!allMapped) {
        corefed += None
        mismatched = true
      } else if (ann.chains.isEmpty) {
        corefed += None
      } else {
        val replacements = Array.fill(thisSplitted.length)(ListBuffer.empty[(Int, Int, String)])
        for (chain <- ann.chains) {
          val spans = chain.mentions.map { ment =>
            val (splid, bias) = mapping(ment.sentenceIndex)
            val noJuhao = sentLists(ment.sentenceIndex).filter(_ != "。")
            val stid = noJuhao.take(ment.beginIndex).map(_.length).sum
            val edid = noJuhao.take(ment.endIndex).map(_.length).sum
            val annTokens = noJuhao.slice(ment.beginIndex, ment.endIndex).mkString
            (splid, bias + stid, bias + edid, annTokens)
          }
          // span/text verification: one mismatch fails the whole doc
          for ((splid, s0, e0, annTokens) <- spans) {
            val spl = thisSplitted(splid)
            val splTokens = if (e0 <= spl.length) spl.substring(s0, e0) else null
            if (splTokens == null || annTokens != splTokens)
              return FetchResult(None, corefFailed = true, mismatched = false, overlapCount, 0)
          }
          val prime = spans(chain.representative)
          val primeTokens = thisSplitted(prime._1).substring(prime._2, prime._3)
          for ((splid, s0, e0, _) <- spans)
            replacements(splid) += ((s0, e0, primeTokens))
        }
        val curSlice = thisSplitted.indices.map { splid =>
          val sorted = replacements(splid).sortBy(_._1).toVector
          var overlapFlag = false
          val kept = ListBuffer.empty[(Int, Int, String)]
          for (repid <- sorted.indices) {
            val rep = sorted(repid)
            if (repid == 0) kept += rep
            else {
              val prev = sorted(repid - 1)
              if (rep._1 - prev._2 < 0) {
                if (rep._1 != prev._1 || rep._2 != prev._2 || rep._3 != prev._3) overlapFlag = true
              } else if (rep._2 - rep._2 >= rep._3.length) {
                // the reference's broken length guard (main_ner.py:307):
                // drops only empty replacement strings
              } else kept += rep
            }
          }
          var corefedSent = new StringBuilder
          var pointer = 0
          for ((s0, e0, repl) <- kept) {
            corefedSent.append(thisSplitted(splid).substring(pointer, s0)).append(repl)
            pointer = e0
          }
          corefedSent.append(thisSplitted(splid).substring(pointer))
          if (overlapFlag) overlapCount += 1
          corefedSent.toString
        }.toVector
        corefed += Some(curSlice)
      }
    }
    FetchResult(Some(corefed.toVector), corefFailed = false, mismatched, overlapCount, nChains)
  }
}
