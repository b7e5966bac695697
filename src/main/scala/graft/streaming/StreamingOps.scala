package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, ts, user_id, event_type, value). The reference pipeline is
  * batch-only (SURVEY.md §2.9) — these are the streaming-ingest
  * counterparts a continuously-fed KG/training-data pipeline needs:
  * watermarked windowed aggregation and gap-based sessionization with
  * custom state. Both run identically over a static DataFrame (Spark's
  * unified batch/streaming semantics), which is how the specs assert
  * correctness.
  */
object StreamingOps {

  /** per-type event counts over 1-minute tumbling windows with a
    * 2-minute watermark (streaming-safe aggregation). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n_events"))

  final case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
                              session_end: Timestamp, n_events: Int)

  /** merge a sorted event run into the open session, emitting every
    * session CLOSED by a gap; returns the still-open trailing session. */
  private def mergeRun(uid: Long, sorted: Seq[Ev], init: Option[SessionState],
                       gapMs: Long,
                       out: scala.collection.mutable.ListBuffer[SessionOut]): Option[SessionState] = {
    var cur = init
    for (e <- sorted) {
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= gapMs =>
          cur = Some(s.copy(last = t, n = s.n + 1))
        case Some(s) =>
          out += SessionOut(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur
  }

  /** gap-based sessionization (gapMs inactivity closes a session) via
    * flatMapGroupsWithState with an EVENT-TIME TIMEOUT — the
    * streaming-correct primitive: a session spanning micro-batches stays
    * in state and is emitted exactly ONCE, when the watermark passes
    * last-event + gap. In Append mode nothing is ever re-emitted.
    * `watermarkDelay` is the late-data tolerance. */
  def sessionize(events: Dataset[Ev], gapMs: Long = 30L * 60 * 1000,
                 watermarkDelay: String = "10 seconds"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // gap expired with no new events: the session is final
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
            val cur = mergeRun(uid, sorted, state.getOption, gapMs, out)
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            out.iterator
          }
      }
  }

  /** streaming KG ingest: the batch extraction pipeline applied to a
    * STREAM of documents. Because docs → sentences → triples is a narrow
    * stateless chain (zero shuffles, zero state stores), the exact same
    * typed transformations run under Structured Streaming unchanged —
    * per-micro-batch output is identical to a batch run over the same
    * rows (asserted by StreamingSpec against the batch path). This is the
    * continuously-fed counterpart of `Pipeline.extractTriples`. */
  def streamingTriples(docs: Dataset[graft.model.Doc]): Dataset[graft.model.TripleRow] =
    graft.pipeline.Pipeline.extractTriples(graft.pipeline.Pipeline.segmentDocs(docs))

  /** streaming exact dedup: the first-arriving occurrence of each text
    * fingerprint passes, later duplicates are dropped — ACROSS
    * micro-batches, via keyed dedup state on `DedupOps.textFp` (the SAME
    * fingerprint the batch pass keys on — the two passes must never
    * drift).
    *  - with `tsCol`: `dropDuplicatesWithinWatermark` — state for a
    *    fingerprint is dropped once the watermark passes it, so state is
    *    BOUNDED (the 100 TB continuous-ingest shape: duplicates arrive
    *    near their originals; a re-crawl beyond the watermark re-admits,
    *    and the downstream batch `DedupOps.exact` pass catches those).
    *    STREAM-ONLY: Spark rejects dropDuplicatesWithinWatermark on batch
    *    DataFrames, so a batch input fails here with guidance instead of
    *    a deep analyzer error;
    *  - without: keyed dedup with unbounded state (fine for bounded
    *    backfills, not endless streams). On a BATCH input this keeps an
    *    ARBITRARY row per fingerprint (no arrival order exists) — use
    *    `DedupOps.exact` when a deterministic keeper matters. */
  def streamingExactDedup(docs: DataFrame, tsCol: Option[String] = None,
                          watermark: String = "10 minutes"): DataFrame = {
    val fp = docs.withColumn("text_fp", graft.ops.DedupOps.textFp)
    tsCol match {
      case Some(c) =>
        require(docs.isStreaming,
          "streamingExactDedup(tsCol=...) is stream-only (Spark rejects " +
            "dropDuplicatesWithinWatermark on batch inputs) — for batch " +
            "dedup use DedupOps.exact")
        fp.withWatermark(c, watermark).dropDuplicatesWithinWatermark("text_fp")
      case None => fp.dropDuplicates("text_fp")
    }
  }

  /** streaming → incremental-edge bridge: each micro-batch of CANONICAL
    * triples folds its additive pair-pred aggregate into a maintained
    * parquet aggregate ([[graft.pipeline.Pipeline.mergePairPred]]) and
    * re-derives the entailment edge table from the merged aggregate —
    * the SAME incremental maintenance path `graft.Main --incremental`
    * uses, fed continuously instead of per submitted slice. The corpus
    * history is never rescanned: per batch, the work is the batch's own
    * aggregate + an aggregate-sized merge + the (aggregate-sized) edge
    * re-derivation.
    *
    * Exactly-once: foreachBatch can REPLAY a batch after a failure, and
    * a replayed fold would double its counts — so the fold is made
    * idempotent the standard way: the last folded batchId is committed
    * to `<aggPath>/_last_batch` AFTER the overwrite, and a batch ≤ that
    * id is skipped. (Overwrite-then-marker leaves a window where a crash
    * between the two replays one batch into an aggregate that already
    * holds it; Iceberg's atomic snapshot commit closes that window in
    * production — the seam is this one write.) */
  def maintainEdges(canonical: DataFrame, aggPath: String, edgesPath: String,
                    trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                    checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.Pipeline
    val writer = canonical.writeStream
      .outputMode("append")
    trigger.foreach(writer.trigger)
    // a checkpointLocation makes RESTARTS resume from committed source
    // offsets with monotonically increasing batch ids — without it a new
    // query restarts at batch 0, which the idempotence marker would skip
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val marker = new org.apache.hadoop.fs.Path(aggPath, "_last_batch")
        val fs = marker.getFileSystem(conf)
        val last =
          if (!fs.exists(marker)) -1L
          else {
            val in = fs.open(marker)
            // tolerant parse: a crash between marker create and write
            // leaves an EMPTY file — treat it as "nothing committed"
            // (degrades to the documented replay-one-batch seam) instead
            // of a NumberFormatException that wedges every restart
            try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption
              .getOrElse(-1L)
            finally in.close()
          }
        if (batchId > last) {
          val delta = Pipeline.pairPredAggregate(batch.toDF())
          val aggDir = new org.apache.hadoop.fs.Path(aggPath, "agg")
          val merged =
            (if (fs.exists(new org.apache.hadoop.fs.Path(aggDir, "_SUCCESS")))
               Pipeline.mergePairPred(spark.read.parquet(aggDir.toString), delta)
             else delta)
              .localCheckpoint() // materialize BEFORE overwriting the source
          merged.write.mode("overwrite").parquet(aggDir.toString)
          Pipeline.edgesFromPairPred(merged)
            .write.mode("overwrite").parquet(edgesPath)
          val out = fs.create(marker, true)
          out.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
        }
      }
      .start()
  }

  /** batch-equivalent sessionization: same gap semantics but the trailing
    * (still-open) session of every user is flushed — the right shape for
    * a BATCH analytics pass over a closed dataset, and NOT a streaming
    * operator (in a stream the trailing session would be emitted once per
    * micro-batch as it grows; use `sessionize` there). */
  def sessionizeBatch(events: Dataset[Ev], gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (uid, evs) =>
        val sorted = evs.toSeq.sortBy(_.ts.getTime)
        val out = scala.collection.mutable.ListBuffer.empty[SessionOut]
        val cur = mergeRun(uid, sorted, None, gapMs, out)
        cur.foreach(s => out += SessionOut(uid, new Timestamp(s.start), new Timestamp(s.last), s.n))
        out.iterator
      }
  }
}
