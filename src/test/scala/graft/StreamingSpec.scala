package graft

import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("windowed counts run as a real stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val events = input.toDF().toDF("ts", "user_id", "event_type")
    val q = StreamingOps.windowedCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    input.addData((ts(0), 1L, "click"), (ts(0), 2L, "click"), (ts(1), 1L, "view"))
    q.processAllAvailable()
    // second micro-batch advances the watermark past the first windows,
    // which makes append mode emit them
    input.addData((ts(10), 3L, "click"))
    q.processAllAvailable()
    input.addData((ts(20), 3L, "click"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_counts").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    def winStart(t: Timestamp) = t.getTime / 60000 * 60000
    assert(rows.contains((winStart(ts(0)), "click", 2L)), rows.toString)
    assert(rows.contains((winStart(ts(1)), "view", 1L)), rows.toString)
  }

  test("sessionization groups events by inactivity gap") {
    val evs = Seq(
      Ev(1, ts(0), "a"), Ev(1, ts(5), "b"), Ev(1, ts(50), "c"), // gap 45min → 2 sessions
      Ev(2, ts(1), "a")).toDS()
    val sessions = StreamingOps.sessionizeBatch(evs).collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length == 3)
    assert(sessions(0).user_id == 1 && sessions(0).n_events == 2 &&
           sessions(0).session_end.getTime == ts(5).getTime)
    assert(sessions(1).user_id == 1 && sessions(1).n_events == 1)
    assert(sessions(2).user_id == 2 && sessions(2).n_events == 1)
  }

  test("sessionization over the events table finds plausible sessions") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .selectExpr("user_id", "ts", "event_type").as[Ev]
    val sessions = StreamingOps.sessionizeBatch(events)
    val n = sessions.count()
    assert(n > 0)
    val total = sessions.agg(org.apache.spark.sql.functions.sum($"n_events")).head.getLong(0)
    assert(total == events.count(), "every event must land in exactly one session")
  }

  test("KG extraction runs unchanged as a stream and equals the batch output") {
    implicit val sqlCtx = spark.sqlContext
    import graft.model.Doc
    val input = MemoryStream[Doc]
    val q = StreamingOps.streamingTriples(input.toDS())
      .writeStream.format("memory").queryName("stream_triples")
      .outputMode("append").start()
    val docs = (0L until 30L).map(graft.synth.SynthDocs.genDoc(_))
    input.addData(docs.take(10): _*); q.processAllAvailable()
    input.addData(docs.drop(10): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_triples").collect().map(_.toSeq).toSet
    val batch = graft.pipeline.Pipeline.extractTriples(
      graft.pipeline.Pipeline.segmentDocs(spark.createDataset(docs))).toDF()
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming triples canonicalize against the static alias dict (stream-static broadcast join)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.model.Doc
    val input = MemoryStream[Doc]
    val aliases = graft.pipeline.Pipeline.synthAliases(spark)
    // the full streaming KG path: docs stream → segment → extract →
    // canonicalize (the broadcast join is stream-static, state-free)
    val q = graft.pipeline.Pipeline.canonicalize(
        StreamingOps.streamingTriples(input.toDS()), aliases)
      .writeStream.format("memory").queryName("stream_canonical")
      .outputMode("append").start()
    val docs = (0L until 20L).map(graft.synth.SynthDocs.genDoc(_))
    input.addData(docs.take(12): _*); q.processAllAvailable()
    input.addData(docs.drop(12): _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_canonical").collect().map(_.toSeq).toSet
    val batch = graft.pipeline.Pipeline.canonicalize(
      graft.pipeline.Pipeline.extractTriples(
        graft.pipeline.Pipeline.segmentDocs(spark.createDataset(docs))), aliases)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // entity linking actually fired in the stream
    assert(streamed.exists(_.contains("E00000")) ||
           spark.table("stream_canonical")
             .filter($"subj_entity_id".isNotNull || $"obj_entity_id".isNotNull)
             .count() > 0)
  }

  test("streaming exact dedup drops duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = StreamingOps.streamingExactDedup(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    input.addData(("d1", "相同的文本"), ("d2", "不同的文本"))
    q.processAllAvailable()
    // the duplicate arrives in a LATER batch — keyed state must drop it
    input.addData(("d3", "相同的文本"), ("d4", "第三种文本"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup_out").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 3, rows.mkString(","))
    assert(rows.map(_._2).toSet == Set("相同的文本", "不同的文本", "第三种文本"))
    assert(!rows.map(_._1).contains("d3"), "cross-batch duplicate leaked through")
  }

  test("watermarked streaming dedup bounds state and re-admits past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, String)]
    val q = StreamingOps.streamingExactDedup(
        input.toDF().toDF("doc_id", "ts", "text"),
        tsCol = Some("ts"), watermark = "5 minutes")
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    input.addData(("d1", ts(0), "去重的文本"))
    q.processAllAvailable()
    // duplicate WITHIN the watermark window → dropped
    input.addData(("d2", ts(2), "去重的文本"))
    q.processAllAvailable()
    // advance the watermark far past the original...
    input.addData(("d3", ts(60), "推进水位的文本"))
    q.processAllAvailable()
    // ...the fingerprint's state has been dropped → re-admitted
    input.addData(("d4", ts(61), "去重的文本"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_wm_out").collect().map(_.getString(0)).toSet
    assert(ids == Set("d1", "d3", "d4"), ids.toString)
  }

  test("watermarked dedup rejects batch inputs loudly (stream-only op)") {
    val batch = Seq(("d1", ts(0), "文本")).toDF("doc_id", "ts", "text")
    val e = intercept[IllegalArgumentException] {
      StreamingOps.streamingExactDedup(batch, tsCol = Some("ts"))
    }
    assert(e.getMessage.contains("DedupOps.exact"), e.getMessage)
  }

  test("streaming sessionize emits a cross-batch session exactly once, on gap expiry") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingOps.sessionize(input.toDS(), gapMs = 10L * 60000)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    // session grows across two micro-batches — nothing may be emitted yet
    input.addData(Ev(1, ts(0), "a"), Ev(1, ts(2), "b"))
    q.processAllAvailable()
    input.addData(Ev(1, ts(4), "c"))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 0,
           "open session must not be emitted while it can still grow")
    // an event far past the gap advances the watermark → timeout fires,
    // the finished session is emitted exactly once
    input.addData(Ev(2, ts(60), "z"))
    q.processAllAvailable()
    input.addData(Ev(2, ts(120), "z2"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sessions_out").as[StreamingOps.SessionOut].collect()
    val u1 = rows.filter(_.user_id == 1)
    assert(u1.length == 1, s"expected exactly one user-1 session, got ${u1.toSeq}")
    assert(u1.head.n_events == 3 && u1.head.session_start.getTime == ts(0).getTime &&
           u1.head.session_end.getTime == ts(4).getTime)
  }

  test("maintainEdges: stream-fed edge table == batch edges on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Pipeline
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-edges").toString
    val aggPath = s"$dir/pairpred"
    val edgesPath = s"$dir/edges"
    val weightsPath = s"$dir/edge_weights"
    val q = StreamingOps.maintainEdges(canonical, aggPath, edgesPath,
      weightsPath = Some(weightsPath))
    // two micro-batches; batch 2 ADDS SUPPORT to a pair batch 1 opened —
    // the additive fold must re-rank, not append
    val b1 = Seq(("e1", "e2", "p1"), ("e1", "e2", "p2"), ("e1", "e2", "p1"))
    val b2 = Seq(("e1", "e2", "p2"), ("e1", "e2", "p2"),
                 ("e3", "e4", "p1"), ("e3", "e4", "p3"))
    input.addData(b1: _*)
    q.processAllAvailable()
    // after batch 1 the edge table already exists (continuous maintenance)
    assert(spark.read.parquet(edgesPath).count() > 0)
    input.addData(b2: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(edgesPath).collect().map(_.toSeq).toSet
    val batch = Pipeline.edgesFromPairPred(Pipeline.pairPredAggregate(
      (b1 ++ b2).toDF("subj_canonical", "obj_canonical", "pred")))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
           s"stream-maintained edges diverged from batch: $streamed vs $batch")
    assert(streamed.nonEmpty)
    // the weight surface rides the same merged aggregate: stream == batch
    val streamedW = spark.read.parquet(weightsPath).collect().map(_.toSeq).toSet
    val batchW = Pipeline.edgeWeightsFromPairPred(Pipeline.pairPredAggregate(
      (b1 ++ b2).toDF("subj_canonical", "obj_canonical", "pred")))
      .collect().map(_.toSeq).toSet
    assert(streamedW == batchW,
           s"stream-maintained weights diverged from batch: $streamedW vs $batchW")
    assert(streamedW.nonEmpty)
    // the idempotence marker committed the last folded batch id
    val marker = java.nio.file.Paths.get(aggPath, "_last_batch")
    assert(java.nio.file.Files.readString(marker).trim.toLong >= 1L)
    // generation protocol: exactly the committed generation survives the
    // post-commit prune — no superseded agg_0, no legacy flat `agg` dir
    val gens = java.nio.file.Files.list(java.nio.file.Paths.get(aggPath))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(n => n == "agg" || n.startsWith("agg_")).toList
    // the committed generation carries its lineage tag in the name
    // (agg_<id>-<tag>), atomic with _SUCCESS
    assert(gens.length == 1 && gens.head.matches("agg_1-[0-9a-f]+"),
      s"expected only the committed tagged generation, got $gens")

    // resume guard: the store now holds a committed aggregate — restarting
    // WITHOUT a checkpointLocation would renumber batches from 0 and the
    // marker would silently drop all new data; must refuse up front
    val input2 = MemoryStream[(String, String, String)]
    val e = intercept[IllegalArgumentException] {
      StreamingOps.maintainEdges(
        input2.toDF().toDF("subj_canonical", "obj_canonical", "pred"),
        aggPath, edgesPath)
    }
    assert(e.getMessage.contains("checkpointLocation"), e.getMessage)
  }

  test("maintainEdges: a crashed generation write never corrupts the committed history") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Pipeline
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-crash").toString
    val aggPath = s"$dir/pairpred"
    val edgesPath = s"$dir/edges"
    val weightsPath = s"$dir/edge_weights"
    val q = StreamingOps.maintainEdges(canonical, aggPath, edgesPath,
      weightsPath = Some(weightsPath))
    val b1 = Seq(("e1", "e2", "p1"), ("e1", "e2", "p2"), ("e1", "e2", "p1"))
    input.addData(b1: _*)
    q.processAllAvailable() // batch 0 committed -> agg_0
    // simulate batch 1 crashing MID-WRITE of its generation dir: a partial
    // agg_1 with no _SUCCESS. The old flat-dir layout lost the whole
    // accumulated history here (the replayed batch initialized from its
    // own delta); generations must instead replay the merge off agg_0.
    val partial = java.nio.file.Paths.get(aggPath, "agg_1")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.writeString(partial.resolve("part-garbage.parquet"), "junk")
    val b2 = Seq(("e1", "e2", "p2"), ("e3", "e4", "p1"), ("e3", "e4", "p3"))
    input.addData(b2: _*)
    q.processAllAvailable() // the "replayed" batch 1
    q.stop()
    val streamed = spark.read.parquet(edgesPath).collect().map(_.toSeq).toSet
    val batch = Pipeline.edgesFromPairPred(Pipeline.pairPredAggregate(
      (b1 ++ b2).toDF("subj_canonical", "obj_canonical", "pred")))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch,
           s"history lost across the crashed generation: $streamed vs $batch")
  }

  test("maintainEdges refuses a store with committed data but no marker") {
    implicit val sqlCtx = spark.sqlContext
    // committed generation present, marker gone (hand-deleted / damaged):
    // the old behavior silently reinitialized from one batch's delta and
    // then PRUNED the real history — must refuse instead
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-nomark").toString
    val aggPath = s"$dir/pairpred"
    val gen = java.nio.file.Paths.get(aggPath, "agg_2")
    java.nio.file.Files.createDirectories(gen)
    java.nio.file.Files.writeString(gen.resolve("_SUCCESS"), "")
    val q = StreamingOps.maintainEdges(canonical, aggPath, s"$dir/edges")
    input.addData(("e1", "e2", "p1"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    val chain = causeChain(e)
    assert(chain.contains("_last_batch is missing"), chain)
    // the committed generation survived the refusal
    assert(java.nio.file.Files.exists(gen.resolve("_SUCCESS")))
  }

  test("maintainEdges recovers a first-batch crash between parquet commit and marker write") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Pipeline
    // the IN-PROTOCOL reachable no-marker state: batch 0's generation
    // parquet landed (with _SUCCESS and this lineage's _run_id) but the
    // crash hit before the first marker write. The only committed
    // generation is the replayed batch's own — provably, because the
    // _run_id stamp matches the restarted query's checkpoint lineage —
    // so the replay must recompute and overwrite, not wedge.
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-selfcrash").toString
    val aggPath = s"$dir/pairpred"
    val ckpt = s"$dir/ckpt"
    val gen0 = java.nio.file.Paths.get(aggPath, "agg_0")
    java.nio.file.Files.createDirectories(gen0)
    java.nio.file.Files.writeString(gen0.resolve("part-stale.parquet"), "junk from the crashed attempt")
    java.nio.file.Files.writeString(gen0.resolve("_SUCCESS"), "")
    java.nio.file.Files.writeString(gen0.resolve("_run_id"), s"cp:$ckpt")
    val q = StreamingOps.maintainEdges(canonical, aggPath, s"$dir/edges",
      checkpointLocation = Some(ckpt))
    val b1 = Seq(("e1", "e2", "p1"), ("e1", "e2", "p2"), ("e1", "e2", "p1"))
    input.addData(b1: _*)
    q.processAllAvailable() // replayed batch 0 overwrites its own crashed write
    q.stop()
    val streamed = spark.read.parquet(s"$dir/edges").collect().map(_.toSeq).toSet
    val batch = Pipeline.edgesFromPairPred(Pipeline.pairPredAggregate(
      b1.toDF("subj_canonical", "obj_canonical", "pred"))).collect().map(_.toSeq).toSet
    assert(streamed == batch, s"self-crash replay diverged: $streamed vs $batch")
    // and the marker now commits batch 0
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(aggPath, "_last_batch")).trim == "0")
  }

  test("maintainEdges recovers a first-batch crash in the TAGGED layout (no stamp file at all)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.pipeline.Pipeline
    // the r7 layout: the lineage tag rides IN the dir name, atomic with
    // _SUCCESS — the state that used to wedge (generation committed,
    // separate stamp file never written) no longer EXISTS; a crashed
    // first commit is attributable from its name alone and the replay
    // must overwrite it
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-tagcrash").toString
    val aggPath = s"$dir/pairpred"
    val ckpt = s"$dir/ckpt"
    val tag = StreamingOps.lineageTagOf(s"cp:$ckpt")
    val gen0 = java.nio.file.Paths.get(aggPath, s"agg_0-$tag")
    java.nio.file.Files.createDirectories(gen0)
    java.nio.file.Files.writeString(gen0.resolve("part-stale.parquet"), "junk from the crashed attempt")
    java.nio.file.Files.writeString(gen0.resolve("_SUCCESS"), "")
    val q = StreamingOps.maintainEdges(canonical, aggPath, s"$dir/edges",
      checkpointLocation = Some(ckpt))
    val b1 = Seq(("e1", "e2", "p1"), ("e3", "e2", "p2"))
    input.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.read.parquet(s"$dir/edges").collect().map(_.toSeq).toSet
    val batch = Pipeline.edgesFromPairPred(Pipeline.pairPredAggregate(
      b1.toDF("subj_canonical", "obj_canonical", "pred"))).collect().map(_.toSeq).toSet
    assert(streamed == batch, s"tagged self-crash replay diverged: $streamed vs $batch")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(aggPath, "_last_batch")).trim == "0")
  }

  test("maintainEdges refuses a FOREIGN-tagged orphan generation despite the batch-id match") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-foreigntag").toString
    val aggPath = s"$dir/pairpred"
    val gen0 = java.nio.file.Paths.get(aggPath, "agg_0-deadbeef")
    java.nio.file.Files.createDirectories(gen0)
    java.nio.file.Files.writeString(gen0.resolve("_SUCCESS"), "")
    val q = StreamingOps.maintainEdges(canonical, aggPath, s"$dir/edges")
    input.addData(("e1", "e2", "p1"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("_last_batch is missing"), chain)
    assert(java.nio.file.Files.exists(gen0.resolve("_SUCCESS")))
  }

  test("maintainEdges refuses another lineage's orphan agg_0 despite the batch-id match") {
    implicit val sqlCtx = spark.sqlContext
    // the renumbering trap the lineage stamp exists for: a PREVIOUS
    // no-checkpoint run committed agg_0, its marker was lost, and a NEW
    // no-checkpoint query starts — whose own batch ids also start at 0.
    // The name agg_0 matches "this batch", but the _run_id (a different
    // ephemeral lineage — or, as here, a pre-stamp orphan with no _run_id
    // at all) does not: treating it as this batch's own crashed commit
    // would recompute the previous run's real history away. Must refuse.
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-foreign").toString
    val aggPath = s"$dir/pairpred"
    val gen0 = java.nio.file.Paths.get(aggPath, "agg_0")
    java.nio.file.Files.createDirectories(gen0)
    java.nio.file.Files.writeString(gen0.resolve("_SUCCESS"), "")
    java.nio.file.Files.writeString(gen0.resolve("_run_id"), "ephemeral:previous-run")
    val q = StreamingOps.maintainEdges(canonical, aggPath, s"$dir/edges")
    input.addData(("e1", "e2", "p1"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(chain.contains("_last_batch is missing"), chain)
    // the foreign generation survived the refusal
    assert(java.nio.file.Files.exists(gen0.resolve("_SUCCESS")))
    assert(java.nio.file.Files.readString(gen0.resolve("_run_id")) == "ephemeral:previous-run")
  }

  test("maintainEdges fails loudly when the committed generation is missing") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, String)]
    val canonical = input.toDF().toDF("subj_canonical", "obj_canonical", "pred")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-corrupt").toString
    val aggPath = s"$dir/pairpred"
    // a marker that commits batch 0 with NO aggregate anywhere = corruption
    // outside the protocol (hand-deleted dir) — reinitializing from one
    // batch's delta would silently discard the whole history. Batch 0 of
    // the fresh query is ≤ the marker (skipped by idempotence); batch 1
    // must then hit the missing generation and refuse.
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(aggPath))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(aggPath, "_last_batch"), "0")
    val q = StreamingOps.maintainEdges(canonical, aggPath, s"$dir/edges",
      checkpointLocation = Some(s"$dir/ckpt"))
    input.addData(("e1", "e2", "p1"))
    q.processAllAvailable() // batch 0: skipped, no error
    input.addData(("e3", "e4", "p2"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    val chain = causeChain(e)
    assert(chain.contains("corrupted"), s"expected the corruption refusal, got: $chain")
  }

  test("foldGeneration dual-aggregate replay: a committed fold skips, the lagging fold catches up") {
    // the maintainTypedEdges crash window: evidence fold commits batch N,
    // the process dies before the pair-pred fold — the replay must SKIP
    // the evidence fold (idempotence) yet still run the pair-pred fold
    // and its derived surfaces, reading the already-committed evidence
    // generation. Exercised at the foldGeneration unit level, where the
    // crash point is deterministic.
    import graft.pipeline.Pipeline
    val dir = java.nio.file.Files.createTempDirectory("graft-dualfold").toString
    val evPath = s"$dir/evidence"; val ppPath = s"$dir/pairpred"
    val runId = "cp:" + dir
    val tag = StreamingOps.lineageTagOf(runId)
    val ev0 = Seq(("e1", "PER", 2L), ("e2", "LOC", 1L))
      .toDF("canonical", "ent_type", "n_mentions")
    val pp0 = Seq(("e1", "e2", "P", 2L), ("e1", "e2", "Q", 1L))
      .toDF("arg_s", "arg_o", "pred", "support")
    // batch 0: evidence committed; "crash" = pair-pred fold never ran
    StreamingOps.foldGeneration(spark, evPath, 0L, runId, tag,
      ev0, Pipeline.mergeTypeEvidence)(_ => ())
    val evGen0 = StreamingOps.committedAggregate(spark, evPath).get
    // replay of batch 0: the evidence fold must skip (same committed
    // generation afterwards), the pair-pred fold runs and derives
    var derived = 0
    StreamingOps.foldGeneration(spark, evPath, 0L, runId, tag,
      ev0, Pipeline.mergeTypeEvidence)(_ => ())
    assert(StreamingOps.committedAggregate(spark, evPath).get == evGen0,
      "replayed evidence fold must not produce a new generation")
    StreamingOps.foldGeneration(spark, ppPath, 0L, runId, tag,
      pp0, Pipeline.mergePairPred) { merged =>
      derived += 1
      Pipeline.typedEdgeWeights(merged,
          Pipeline.entityTypesFromEvidence(spark.read.parquet(evGen0)))
        .write.mode("overwrite").parquet(s"$dir/typed")
    }
    assert(derived == 1)
    // both markers now agree on the committed id
    for (p <- Seq(evPath, ppPath))
      assert(java.nio.file.Files.readString(
        java.nio.file.Paths.get(p, "_last_batch")).trim.toLong == 0L, p)
    // the derived surface equals the direct derivation from the inputs
    val direct = Pipeline.typedEdgeWeights(pp0,
      Pipeline.entityTypesFromEvidence(ev0)).collect().map(_.toSeq).toSet
    assert(spark.read.parquet(s"$dir/typed").collect().map(_.toSeq).toSet == direct)
    assert(direct.nonEmpty)
    // a second batch folds additively into BOTH aggregates
    StreamingOps.foldGeneration(spark, evPath, 1L, runId, tag,
      Seq(("e2", "LOC", 5L)).toDF("canonical", "ent_type", "n_mentions"),
      Pipeline.mergeTypeEvidence)(_ => ())
    val evAll = spark.read.parquet(
      StreamingOps.committedAggregate(spark, evPath).get)
      .as[(String, String, Long)].collect().toSet
    assert(evAll == Set(("e1", "PER", 2L), ("e2", "LOC", 6L)), evAll.toString)
  }
}
