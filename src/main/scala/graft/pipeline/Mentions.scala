package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{AliasRow, SentenceRow}

/** Batched mention detection + entity-link scoring, per partition.
  *
  * The reference attaches CoreNLP NER mentions per sentence
  * (main_ner.py:9-41: word, label, [begin,end] span) and hooks entity
  * linking via a wikidict (StanfordCoreNLP.py:139). Here the detector is a
  * deterministic Aho-Corasick-style scan over the alias dictionary
  * (broadcast once, automaton built once per executor), and the link
  * score is a deterministic surface-match score — the same per-partition
  * batched-inference shape a real NER/linker service call would have.
  */
object Mentions {

  final case class MentionRow(doc_id: String, sent_id: Int,
                              mention: String, begin: Int, end: Int,
                              entity_id: String, canonical: String,
                              link_score_x1000: Long)

  /** detect alias-dictionary mentions in each sentence (longest
    * non-overlapping match, left to right) and score the link:
    * 1000 for exact-canonical surface, else scaled by length ratio. */
  def detect(sentences: Dataset[SentenceRow], aliases: Dataset[AliasRow]): Dataset[MentionRow] = {
    val spark = sentences.sparkSession
    import spark.implicits._
    val dict = spark.sparkContext.broadcast(aliases.collect())
    sentences.mapPartitions { rows =>
      // per-partition init: build the matching automaton once (the seam
      // where a real linker would establish its batch/connection state)
      val byFirst = dict.value.groupBy(_.alias.head)
      rows.flatMap { row =>
        val s = row.sent
        val out = scala.collection.mutable.ListBuffer.empty[MentionRow]
        var i = 0
        while (i < s.length) {
          val cands = byFirst.getOrElse(s.charAt(i), Array.empty)
          var best: AliasRow = null
          for (a <- cands if s.startsWith(a.alias, i))
            if (best == null || a.alias.length > best.alias.length) best = a
          if (best != null) {
            val score =
              if (best.alias == best.canonical) 1000L
              else 1000L * best.canonical.length / best.alias.length
            out += MentionRow(row.doc_id, row.sent_id, best.alias, i, i + best.alias.length,
                              best.entity_id, best.canonical, score)
            i += best.alias.length
          } else i += 1
        }
        out
      }
    }
  }

  /** per-entity mention stats — the NER-label-bucket analogue
    * (main_ner.py:19-23). */
  def mentionStats(mentions: Dataset[MentionRow]): DataFrame =
    mentions.groupBy(col("entity_id"), col("canonical"))
      .agg(count(lit(1)).as("n_mentions"),
           countDistinct(col("doc_id")).as("n_docs"),
           min(col("link_score_x1000")).as("min_score"))
}
