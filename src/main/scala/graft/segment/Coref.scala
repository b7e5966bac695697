package graft.segment

import graft.model.Rel

/** Coreference substitution + corefed-relation differencing.
  *
  * The chain PREDICTION is model input (the reference calls CoreNLP's
  * neural coref, main_ner.py:351-358); the SUBSTITUTION and the
  * second-pass differencing are pure algorithms re-derived here:
  *
  *  - `substitute` is the span-rewrite of main_ner.py:287-322: sort
  *    replacements by start; the first is always kept; overlapping
  *    replacements are dropped unless byte-identical to the previous one;
  *    the "pronoun not shorter than antecedent" guard at main_ner.py:307
  *    computes `end - end >= len(repl)` — i.e. it only ever drops
  *    EMPTY replacement strings (quirk preserved as spec);
  *  - `newRels` is the parse_coref set-difference (dudepparse.py:2152-2167):
  *    keep corefed relations whose serialize_rel key is absent from the
  *    base relations of the same sentence.
  */
object Coref {

  final case class Replacement(start: Int, end: Int, repl: String)

  /** apply coref replacements to one sentence (reference quirks above). */
  def substitute(sentence: String, replacements: Seq[Replacement]): String = {
    val sorted = replacements.sortBy(_.start)
    val kept = scala.collection.mutable.ListBuffer.empty[Replacement]
    for ((r, i) <- sorted.zipWithIndex) {
      if (i == 0) kept += r
      else {
        val prev = sorted(i - 1)
        if (r.start - prev.end < 0) {
          // overlap: silently dropped (identical duplicates also dropped —
          // the reference only un-flags them, main_ner.py:296-304)
        } else if (r.end - r.end >= r.repl.length) {
          // reference's broken length guard: fires only for empty repl
        } else {
          kept += r
        }
      }
    }
    val sb = new StringBuilder
    var pointer = 0
    for (r <- kept) {
      sb.append(sentence.substring(pointer, r.start))
      sb.append(r.repl)
      pointer = r.end
    }
    sb.append(sentence.substring(pointer))
    sb.toString
  }

  /** corefed-pass differencing: corefed rels not present in the base rels
    * (set membership on the serialized key, dudepparse.py:2159-2162). */
  def newRels(base: Vector[Rel], corefed: Vector[Rel]): Vector[Rel] = {
    val baseKeys = base.map(_.serialize).toSet
    corefed.filterNot(r => baseKeys.contains(r.serialize))
  }

  /** deterministic synthetic coref chains for a document's sentences:
    * a sentence-initial pronoun 他 corefers with the most recent preceding
    * person-initial sentence's subject. Returns per-sentence replacement
    * lists (empty = no chain) — this is the fixture stand-in for the model
    * prediction, like the parse fixtures. */
  def synthChains(sentences: Seq[String]): Seq[Seq[Replacement]] = {
    val persons = graft.synth.Templates.persons.toSet
    var lastPerson: Option[String] = None
    sentences.map { sent =>
      val reps =
        if (sent.startsWith("他") && !sent.startsWith("他们") && lastPerson.isDefined)
          Seq(Replacement(0, 1, lastPerson.get))
        else Seq.empty[Replacement]
      // update antecedent: longest person prefix of this sentence
      persons.find(p => sent.startsWith(p)).foreach(p => lastPerson = Some(p))
      reps
    }
  }
}
