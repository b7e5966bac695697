package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.model.{AliasRow, Doc, SentenceRow, Span}
import graft.pipeline.{Mentions, Pipeline}
import graft.segment.Segmenter

/** Property-based robustness: deterministic ScalaCheck generators drive
  * adversarial mixed-script inputs (CJK + delimiters + ASCII + whitespace +
  * supplementary-plane chars) through the segmentation and entity-link
  * surfaces. Sampling is seeded, so failures reproduce exactly. */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // ---- generators ---------------------------------------------------
  private val zhChar: Gen[String] = Gen.choose('一', '鿿').map(_.toString)
  private val extBChar: Gen[String] = // supplementary-plane CJK (surrogate pairs)
    Gen.choose(0x20000, 0x2A6DF).map(cp => new String(Character.toChars(cp)))
  private val delim: Gen[String] = Gen.oneOf("。", "！", "？", "；", "\n", "……", ";", "：\"", "。\"")
  private val weak: Gen[String] = Gen.oneOf("，", "、", " ", "；")
  private val ascii: Gen[String] = Gen.oneOf("a", "Z", "3", " ", "#", ":", ".", "%")
  private val token: Gen[String] = Gen.frequency(
    6 -> zhChar, 1 -> extBChar, 2 -> delim, 1 -> weak, 2 -> ascii)
  private val text: Gen[String] =
    Gen.choose(0, 900).flatMap(n => Gen.listOfN(n, token)).map(_.mkString)

  test("repetitionScores equals a brute-force frequency count on random corpora") {
    import spark.implicits._
    // small vocab forces real collisions/repeats; includes 1-word docs
    val word: Gen[String] = Gen.oneOf("aa", "bb", "cc", "dd")
    val docGen: Gen[String] =
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val texts = samples(docGen, 120, 0xBEEF01)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    def brute(t: String): (Long, Long, Long) = {
      val ws = t.split(" ")
      def grams(n: Int) = if (ws.length < n) Seq.empty
        else ws.sliding(n).map(_.mkString(" ")).toSeq
      def frac(n: Int) = {
        val g = grams(n); if (g.isEmpty) 0L
        else 10000L * g.groupBy(identity).values.map(_.size).max / g.size
      }
      val g3 = grams(3)
      val dup = if (g3.isEmpty) 0L
        else 10000L * g3.groupBy(identity).values.map(_.size).filter(_ > 1).sum / g3.size
      (frac(1), frac(2), dup)
    }
    val got = graft.ops.TextOps.repetitionScores(docs)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (((t, i)) <- texts.zipWithIndex) {
      assert(got(i.toLong) == brute(t), s"doc $i '$t': got ${got(i.toLong)}, want ${brute(t)}")
    }
  }

  test("splitStr is total and every admitted sentence satisfies the zh window") {
    for (chunks <- samples(Gen.choose(0, 4).flatMap(n => Gen.listOfN(n, text)), 300, 0xC0FFEE)) {
      val out = Segmenter.splitStr(chunks) // must not throw
      for ((sent, idx) <- out) {
        assert(Segmenter.countZhChars(sent) > Segmenter.FilterLen,
               s"under-length sentence admitted: '$sent'")
        assert(sent == sent.trim, s"unstripped sentence: '$sent'")
        assert(idx >= 0 && idx < chunks.length, s"lineage $idx out of range")
      }
    }
  }

  test("mapping-threaded splitStr only emits lineage ids from the supplied mapping") {
    val gen = for {
      n <- Gen.choose(1, 4)
      chunks <- Gen.listOfN(n, text)
      mapping <- Gen.listOfN(n, Gen.choose(0, 50))
    } yield (chunks, mapping)
    for ((chunks, mapping) <- samples(gen, 200, 0xBEEF)) {
      val out = Segmenter.splitStr(chunks, mapping)
      assert(out.forall(p => mapping.contains(p._2)), s"foreign lineage in $out")
    }
  }

  test("splitLongSentences pieces stay within the interval and never split surrogates") {
    val longText = Gen.choose(400, 1600).flatMap(n => Gen.listOfN(n, token)).map(_.mkString)
    for (s <- samples(longText, 60, 0xFACE)) {
      val pieces = Segmenter.splitLongSentences(s)
      for (p <- pieces) {
        assert(p.codePointCount(0, p.length) <= Segmenter.MaxZh, s"oversize piece (${p.length})")
        assert(Segmenter.countZhChars(p) > Segmenter.FilterLen)
        // a piece starting with a low surrogate or ending with a high one
        // would mean a supplementary char was cut in half
        assert(!Character.isLowSurrogate(p.head) && !Character.isHighSurrogate(p.last),
               "surrogate pair split")
      }
    }
  }

  test("segment output never contains whitespace / '#' / '::' (tokNorm contract)") {
    for (s <- samples(text, 200, 0xD00D)) {
      for (sent <- Segmenter.segment(s)) {
        assert(sent.nonEmpty)
        assert(!sent.exists(_.isWhitespace) && !sent.contains("#") && !sent.contains("::"),
               s"unnormalized sentence: '$sent'")
      }
    }
  }

  test("detectJoin == detect on randomized dictionaries and sentences") {
    val aliasGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, zhChar)).map(_.mkString)
    val caseGen = for {
      surfaces <- Gen.listOfN(12, aliasGen).map(_.distinct)
      nSents <- Gen.choose(1, 6)
      sents <- Gen.listOfN(nSents, for {
        pre <- Gen.choose(0, 6).flatMap(Gen.listOfN(_, token)).map(_.mkString)
        embedded <- Gen.someOf(surfaces)
        post <- Gen.choose(0, 6).flatMap(Gen.listOfN(_, token)).map(_.mkString)
      } yield pre + embedded.mkString + post)
    } yield (surfaces, sents)
    for (((surfaces, sents), ci) <- samples(caseGen, 8, 0xABBA).zipWithIndex) {
      val aliases = surfaces.zipWithIndex
        .map { case (s, i) => AliasRow(s, f"E$i%03d", s) }.toDS()
      val rows = sents.zipWithIndex
        .map { case (s, i) => SentenceRow(s"d$ci", 0, i, s) }.toDS()
      val viaTrie = Mentions.detect(rows, aliases).collect().toSet
      val viaJoin = Mentions.detectJoin(rows, aliases).collect().toSet
      assert(viaJoin == viaTrie, s"case $ci: surfaces=$surfaces sents=$sents")
    }
  }

  test("dedupClusters equals brute-force union-find on random graphs") {
    val caseGen = for {
      nNodes <- Gen.choose(2, 30)
      nEdges <- Gen.choose(1, 40)
      pairs <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, nNodes.toLong - 1)
        b <- Gen.choose(0L, nNodes.toLong - 1)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield pairs.distinct
    for ((pairs, ci) <- samples(caseGen, 6, 0xCAFE).zipWithIndex if pairs.nonEmpty) {
      val got = graft.ops.DedupOps.dedupClusters(pairs.toDF("a", "b")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: plain union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- pairs) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      // canonicalize union-find roots to the component MIN id
      val byRoot = nodes.groupBy(find)
      val expected = byRoot.values.flatMap { members =>
        val m = members.min; members.map(_ -> m)
      }.toMap
      assert(got == expected, s"case $ci pairs=$pairs")
    }
  }

  test("span round trip preserves randomized docs (dup offsets, empty arrays, media spans)") {
    val spanGen = for {
      kind <- Gen.oneOf("text", "image", "video")
      t <- text
      off <- Gen.choose(0, 3) // tiny range forces duplicate offsets
    } yield Span(kind, if (kind == "text") t else null,
                 if (kind == "text") null else s"ref$off", off)
    val docGen = Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, spanGen))
    val docs = samples(docGen, 80, 0xF00D).zipWithIndex.map { case (spans, i) =>
      // stored order = (offset, original position): what any offset-sorted
      // store holds; the round trip must preserve it exactly
      Doc(f"pd$i%04d", spans.sortBy(_.offset))
    }
    val ds = spark.createDataset(docs)
    val report = Pipeline.spanInvariantReport(ds, Pipeline.reassembleDocs(ds))
    assert(report.count() == docs.length)
    val bad = report.filter(!org.apache.spark.sql.functions.col("preserved")).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("mergeSliceIncrement: doc set is the union, existing rows always win") {
    import org.apache.spark.sql.functions.col
    val docIds: Gen[Set[Int]] =
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0, 30))).map(_.toSet)
    for (seed <- 0 until 40) {
      val Seq(exIds, frIds) = Seq(0, 1).map(k =>
        samples(docIds, 1, 0xD0C5EED + seed * 2 + k).head)
      // payload marks provenance: existing rows tagged "E", fresh "F"
      val ex = exIds.toSeq.map(i => (s"d$i", "E")).toDF("doc_id", "src")
      val fr = frIds.toSeq.map(i => (s"d$i", "F")).toDF("doc_id", "src")
      val merged = Pipeline.mergeSliceIncrement(ex, fr)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val expected = exIds.map(i => (s"d$i", "E")) ++
        (frIds -- exIds).map(i => (s"d$i", "F"))
      assert(merged == expected, s"seed=$seed ex=$exIds fr=$frIds")
    }
  }
}
