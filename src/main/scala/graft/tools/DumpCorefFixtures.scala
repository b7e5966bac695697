package graft.tools

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.segment.CorefFetch
import graft.synth.{FixtureParser, SynthDocs}

/** Deterministic fixtures for the coref front-end differential test:
  * documents + mock annotator outputs (tokenized sentences per merged
  * chunk + coref chains), replayed through the reference's fetch_coref
  * with a mock client. Variants by doc index:
  *  - i%13==5: the annotator throws on chunk 0 → coref_failed;
  *  - i%11==3: one annotator token corrupted → sentence unmapped →
  *    mismatched, chunk corefed = None;
  *  - i%9==2: duplicated chain → overlapping replacements;
  *  - i%17==7: chain with a zero-width representative → empty-string
  *    replacement (exercises the broken length guard).
  */
object DumpCorefFixtures {

  val Threshold = 520
  val SentsPerDoc = 48
  val NDocs = 240

  final case class DocFixture(id: String, splitted: Vector[String],
                              merged: Vector[String],
                              anns: Vector[Option[CorefFetch.Ann]]) // None = annotator throws

  def genDoc(i: Long): DocFixture = {
    val splitted = SynthDocs.expectedSentences(i, SentsPerDoc)
    val (merged, offsets) = CorefFetch.mergeTexts(splitted, Threshold)
    val persons = graft.synth.Templates.persons.toSet
    val anns = merged.zip(offsets).zipWithIndex.map { case ((_, (st, en)), chunkIdx) =>
      if (i % 13 == 5 && chunkIdx == 0) None
      else {
        val chunkSents = splitted.slice(st, en)
        var sentToks = chunkSents.map(s => FixtureParser.tokenize(s).get).toVector
        if (i % 11 == 3 && chunkIdx == 0 && sentToks.nonEmpty)
          sentToks = sentToks.updated(0, sentToks(0).updated(0, sentToks(0)(0) + "字"))
        // chains: person-initial sentence ↔ next 他-initial sentence
        val chains = Vector.newBuilder[CorefFetch.Chain]
        var lastPersonSent = -1
        for (si <- chunkSents.indices) {
          val s = chunkSents(si)
          if (persons.exists(p => s.startsWith(p))) lastPersonSent = si
          else if (s.startsWith("他") && !s.startsWith("他们") && lastPersonSent >= 0) {
            val ch = CorefFetch.Chain(
              Vector(CorefFetch.Mention(lastPersonSent, 0, 1), CorefFetch.Mention(si, 0, 1)),
              representative = if (i % 2 == 0) 0 else 0)
            chains += ch
            if (i % 9 == 2) chains += ch // duplicated → overlap drops
            if (i % 17 == 7)
              chains += CorefFetch.Chain(
                Vector(CorefFetch.Mention(si, 0, 0), CorefFetch.Mention(si, 0, 1)),
                representative = 0) // zero-width representative → empty repl
          }
        }
        Some(CorefFetch.Ann(sentToks, chains.result()))
      }
    }
    DocFixture(s"c-$i", splitted, merged, anns)
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/coref_fixtures.json"
    val mapper = new ObjectMapper()
    val arr = mapper.createArrayNode()
    for (i <- 0L until NDocs) {
      val fx = genDoc(i)
      val node = mapper.createObjectNode()
      node.put("id", fx.id)
      node.put("threshold", Threshold)
      val spl = mapper.createArrayNode(); fx.splitted.foreach(spl.add); node.replace("splitted", spl)
      val mrg = mapper.createArrayNode(); fx.merged.foreach(mrg.add); node.replace("merged", mrg)
      val annsArr = mapper.createArrayNode()
      for (annOpt <- fx.anns) {
        annOpt match {
          case None => annsArr.add(mapper.nullNode())
          case Some(ann) =>
            val a = mapper.createObjectNode()
            val sents = mapper.createArrayNode()
            ann.sentences.foreach { toks =>
              val t = mapper.createArrayNode(); toks.foreach(t.add); sents.add(t)
            }
            a.replace("sentences", sents)
            val chains = mapper.createArrayNode()
            ann.chains.foreach { ch =>
              val c = mapper.createObjectNode()
              val ms = mapper.createArrayNode()
              ch.mentions.foreach { m =>
                val mm = mapper.createArrayNode(); mm.add(m.sentenceIndex); mm.add(m.beginIndex); mm.add(m.endIndex)
                ms.add(mm)
              }
              c.replace("mentions", ms)
              c.put("representative", ch.representative)
              chains.add(c)
            }
            a.replace("chains", chains)
            annsArr.add(a)
        }
      }
      node.replace("anns", annsArr)
      arr.add(node)
    }
    Files.write(Paths.get(out), mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))
    println(s"wrote $NDocs coref fixtures to $out")
  }
}
