package graft

import graft.model.AliasRow
import graft.pipeline.{Mentions, Pipeline}

/** Mention detection: trie longest-match semantics, equivalence with a
  * linear reference scan, and behavior at a production-ish dictionary
  * size (10⁵ aliases) — the automaton must be built from the broadcast
  * dict without per-row scans over it. */
class MentionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("trie longest-leftmost matching equals a linear scan on the synth corpus") {
    val docs = Pipeline.synthDocs(spark, 200)
    val sentences = Pipeline.segmentDocs(docs)
    val aliases = Pipeline.synthAliases(spark)
    val got = Mentions.detect(sentences, aliases).collect().toSet
    // reference: brute-force longest-match scan per position
    val dict = aliases.collect()
    val expected = sentences.collect().flatMap { row =>
      val out = scala.collection.mutable.ListBuffer.empty[Mentions.MentionRow]
      var i = 0
      while (i < row.sent.length) {
        var best: AliasRow = null
        for (a <- dict if row.sent.startsWith(a.alias, i))
          if (best == null || a.alias.length > best.alias.length) best = a
        if (best != null) {
          val score = if (best.alias == best.canonical) 1000L
                      else 1000L * best.canonical.length / best.alias.length
          out += Mentions.MentionRow(row.doc_id, row.sent_id, best.alias, i,
                                     i + best.alias.length, best.entity_id, best.canonical, score)
          i += best.alias.length
        } else i += 1
      }
      out
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("longest match wins and overlapping shorter aliases are shadowed") {
    val sents = Seq(graft.model.SentenceRow("d0", 0, 0, "张伟先生去了北京大学。")).toDS()
    val aliases = Seq(
      AliasRow("张伟", "E1", "张伟"),
      AliasRow("张伟先生", "E1", "张伟"),
      AliasRow("北京", "E2", "北京"),
      AliasRow("北京大学", "E3", "北京大学")).toDS()
    val got = Mentions.detect(sents, aliases).collect().sortBy(_.begin)
    assert(got.map(_.mention).toSeq == Seq("张伟先生", "北京大学"))
    assert(got.map(_.entity_id).toSeq == Seq("E1", "E3"))
  }

  test("consecutive detect calls with different dictionaries never serve a stale trie") {
    val sents = Seq(graft.model.SentenceRow("d0", 0, 0, "张伟和李娜见面。")).toDS()
    val dictA = Seq(AliasRow("张伟", "EA", "张伟")).toDS()
    val dictB = Seq(AliasRow("李娜", "EB", "李娜")).toDS()
    val a = Mentions.detect(sents, dictA).collect().map(_.mention).toSet
    val b = Mentions.detect(sents, dictB).collect().map(_.mention).toSet
    assert(a == Set("张伟") && b == Set("李娜"),
           s"stale trie? a=$a b=$b (the single-slot cache must evict on a new broadcast)")
    // and re-running the first dict still works (rebuilt, not corrupted)
    assert(Mentions.detect(sents, dictA).collect().map(_.mention).toSet == Set("张伟"))
  }

  test("distributed detectJoin == broadcast-trie detect on the synth corpus") {
    val docs = Pipeline.synthDocs(spark, 200)
    val sentences = Pipeline.segmentDocs(docs)
    val aliases = Pipeline.synthAliases(spark)
    val viaTrie = Mentions.detect(sentences, aliases).collect().toSet
    val viaJoin = Mentions.detectJoin(sentences, aliases).collect().toSet
    assert(viaJoin == viaTrie)
    assert(viaJoin.nonEmpty)
  }

  test("detectJoin greedy reconstruction handles shadowed and adjacent aliases") {
    val sents = Seq(
      graft.model.SentenceRow("d0", 0, 0, "张伟先生去了北京大学。"),
      graft.model.SentenceRow("d0", 0, 1, "北京北京大学。")).toDS()
    val aliases = Seq(
      AliasRow("张伟", "E1", "张伟"),
      AliasRow("张伟先生", "E1", "张伟"),
      AliasRow("北京", "E2", "北京"),
      AliasRow("北京大学", "E3", "北京大学")).toDS()
    val got = Mentions.detectJoin(sents, aliases).collect()
      .sortBy(m => (m.sent_id, m.begin))
    assert(got.map(_.mention).toSeq == Seq("张伟先生", "北京大学", "北京", "北京大学"),
           got.mkString(","))
    // trie agreement on the same input
    assert(got.toSet == Mentions.detect(sents, aliases).collect().toSet)
  }

  test("detectJoin plan is a real shuffle join: no broadcast of the dict, no cartesian") {
    val docs = Pipeline.synthDocs(spark, 50)
    val sentences = Pipeline.segmentDocs(docs)
    val aliases = Pipeline.synthAliases(spark)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Mentions.detectJoin(sentences, aliases)
        .queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("detectJoin matches supplementary-plane aliases (UTF-16 length semantics)") {
    // 𠀀 (U+20000, CJK Ext-B) is one code point but TWO UTF-16 units —
    // candidate slicing uses String.substring, so alias lengths must be
    // measured in the same units or this alias can never join
    val extB = new String(Character.toChars(0x20000))
    val sents = Seq(graft.model.SentenceRow("d0", 0, 0, s"前缀${extB}山之后。")).toDS()
    val aliases = Seq(AliasRow(s"${extB}山", "EX1", s"${extB}山")).toDS()
    val viaJoin = Mentions.detectJoin(sents, aliases).collect()
    assert(viaJoin.map(_.mention).toSeq == Seq(s"${extB}山"), viaJoin.mkString(","))
    assert(viaJoin.toSet == Mentions.detect(sents, aliases).collect().toSet)
  }

  test("detectJoin resolves duplicate alias surfaces deterministically (min payload)") {
    val sents = Seq(graft.model.SentenceRow("d0", 0, 0, "张伟来了。")).toDS()
    val aliases = Seq(
      AliasRow("张伟", "E9", "张伟九"),
      AliasRow("张伟", "E1", "张伟一"),
      AliasRow("张伟", "E1", "张伟甲")).toDS()
    val got = Mentions.detectJoin(sents, aliases).collect()
    assert(got.length == 1)
    assert(got.head.entity_id == "E1")
    assert(Set("张伟一", "张伟甲").contains(got.head.canonical))
    // min canonical within the min entity_id ("一" < "甲" in UTF-16)
    assert(got.head.canonical == Seq("张伟一", "张伟甲").min)
  }

  test("a 100k-alias dictionary is handled via the per-executor trie") {
    val big = (0 until 100000).map { i =>
      AliasRow(f"人物$i%05d", f"E$i%06d", f"人物$i%05d")
    } ++ Seq(AliasRow("张伟", "EZW", "张伟"))
    val aliases = spark.createDataset(big)
    val sents = Seq(
      graft.model.SentenceRow("d0", 0, 0, "人物00042和人物99999见了张伟。"),
      graft.model.SentenceRow("d1", 0, 0, "没有任何别名的句子呀。")).toDS()
    val got = Mentions.detect(sents, aliases).collect()
    assert(got.map(_.mention).toSet == Set("人物00042", "人物99999", "张伟"))
    // the detection plan is a single narrow mapPartitions over sentences —
    // no join, no shuffle (the dict rides a broadcast variable)
    val plan = Mentions.detect(sents, aliases).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }
}
