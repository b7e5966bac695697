package graft.segment

/** Vocab-file-driven normalization — the optional mode that closes the
  * last semantic distance between [[Segmenter.tokNorm]]'s character-level
  * spec and the reference's real BERT round-trip
  * (/root/reference/preprocess_corpus.py:26-58: tokenize with
  * `bert-base-chinese`, delete '[UNK]' tokens, join, delete '#' and
  * '::', drop empties).
  *
  * The tokenization re-implements the PUBLIC WordPiece contract of the
  * BERT tokenizer for this domain (BasicTokenizer + WordPiece,
  * tokenization_bert.py): every CJK ideograph is its own token
  * (`_is_chinese_char` ranges), punctuation splits, non-CJK runs are
  * greedy-longest-prefix WordPiece with `##` continuations, and a word
  * with no vocab path becomes one `[UNK]`. The consequence the char-spec
  * cannot express: a character ABSENT from the vocab is DROPPED (its
  * token is [UNK] and [UNK]s are removed) — for corpora whose text stays
  * inside the vocab the two modes are IDENTICAL (diff-tested in
  * SegmenterSpec), and a real `bert-base-chinese/vocab.txt` makes this
  * mode match the reference bit-for-bit on vocab-covered text.
  *
  * Instances are Serializable (closed over by executor-side lambdas);
  * the vocab set is shipped once per closure like a small broadcast. */
final class VocabNormalizer(vocab: Set[String], lowercase: Boolean = true)
    extends Serializable {
  require(vocab.nonEmpty, "empty vocabulary — wrong file or wrong format")

  /** BERT's _is_chinese_char ranges (tokenization_bert.py — public). */
  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
    (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
    (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
    (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  private def isPunct(cp: Int): Boolean = {
    // BERT's _is_punctuation: ASCII non-alnum blocks + Unicode P* classes
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
    (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
      val t = Character.getType(cp)
      t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
      t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
      t == Character.INITIAL_QUOTE_PUNCTUATION ||
      t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
    }
  }

  /** basic tokenization: whitespace splits, CJK chars and punctuation
    * become single-char words, everything else accumulates into runs. */
  private def basicWords(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder
    def flush(): Unit = if (cur.length > 0) { out += cur.toString; cur.setLength(0) }
    var i = 0
    while (i < line.length) {
      val cp = line.codePointAt(i)
      val s = new String(Character.toChars(cp))
      if (Character.isWhitespace(cp)) flush()
      else if (isCjk(cp) || isPunct(cp)) { flush(); out += s }
      // Locale.ROOT: host-locale lowercasing (tr-TR dotless ı etc.) would
      // make [UNK] decisions differ per deployment host — the reference's
      // Python str.lower() is locale-independent
      else cur.append(if (lowercase) s.toLowerCase(java.util.Locale.ROOT) else s)
      i += Character.charCount(cp)
    }
    flush()
    out.result()
  }

  /** BERT WordPiece's max_input_chars_per_word: a longer word is one
    * [UNK] without attempting decomposition. */
  private val MaxWordChars = 100

  /** greedy longest-prefix WordPiece of one word; None = [UNK]. */
  private def wordPiece(word: String): Option[Vector[String]] = {
    if (word.length > MaxWordChars) return None
    val out = Vector.newBuilder[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var piece: String = null
      while (end > start && piece == null) {
        val cand = (if (start > 0) "##" else "") + word.substring(start, end)
        if (vocab.contains(cand)) piece = cand else end -= 1
      }
      if (piece == null) return None
      out += piece
      start = end
    }
    Some(out.result())
  }

  def tokenize(line: String): Vector[String] =
    basicWords(line).flatMap(w => wordPiece(w).getOrElse(Vector("[UNK]")))

  /** the reference's tok_norm over this vocab: tokenize, delete [UNK]s,
    * join, delete '#' and '::', drop empties. */
  def normalize(sentences: Seq[String]): Vector[String] =
    sentences.map { line =>
      tokenize(line).filter(_ != "[UNK]").mkString("")
        .replace("#", "").replace("::", "")
    }.filter(_.nonEmpty).toVector
}

object VocabNormalizer {
  /** load a BERT-format vocab file: one token per line, UTF-8 (the
    * `vocab.txt` that ships with `bert-base-chinese`). */
  def fromFile(path: String, lowercase: Boolean = true): VocabNormalizer = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try new VocabNormalizer(
      src.getLines().map(_.stripLineEnd).filter(_.nonEmpty).toSet, lowercase)
    finally src.close()
  }
}
