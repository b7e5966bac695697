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
    * continuously-fed counterpart of `Pipeline.extractTriples`. `parser`
    * is the same dependency-parse seam the batch entry points take, so a
    * stream can feed a store built with a live parser without silently
    * mixing fixture-parsed triples into it. */
  def streamingTriples(docs: Dataset[graft.model.Doc],
                       parser: graft.pipeline.DepParser = graft.pipeline.FixtureDepParser)
      : Dataset[graft.model.TripleRow] =
    graft.pipeline.Pipeline.extractTriples(
      graft.pipeline.Pipeline.segmentDocs(docs), parser = parser)

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

  /** the lineage tag embedded in generation dir names: a stable hex
    * digest of the run identity (checkpoint path for checkpointed
    * queries — SAME tag across restarts; a fresh UUID per no-checkpoint
    * start). 16 hex chars of md5 (64 bits): a 32-bit hash would leave a
    * ~2^-32 chance that a foreign lineage's orphan generation collides
    * into the self-overwrite branch — the old separate-stamp design
    * compared the full runId exactly, so the name-encoded design should
    * not be meaningfully weaker. */
  private[graft] def lineageTagOf(runId: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(runId.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"${b & 0xff}%02x").mkString

  /** the committed aggregate generation of a maintained store, if any —
    * the post-drain read point for backfills (a store maintained before
    * the weight surface existed has edges but no weights; a drain with
    * no new batches never enters foreachBatch, so the backfill must read
    * the committed generation directly). Resolves tagged
    * (`agg_<id>-<tag>`), legacy bare (`agg_<id>`) and legacy flat
    * (`agg`) layouts. */
  def committedAggregate(spark: org.apache.spark.sql.SparkSession,
                         aggPath: String): Option[String] = {
    val base = new org.apache.hadoop.fs.Path(aggPath)
    val marker = new org.apache.hadoop.fs.Path(aggPath, "_last_batch")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val last = readLastBatch(fs, marker)
    if (last < 0L) None // genuinely nothing committed yet
    else {
      def ok(p: org.apache.hadoop.fs.Path) =
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
      val pat = s"^agg_$last(-[0-9a-f]+)?$$".r
      val gens =
        (if (fs.exists(base)) fs.listStatus(base).map(_.getPath).toSeq
         else Seq.empty)
          .filter(p => pat.pattern.matcher(p.getName).matches()) :+
          new org.apache.hadoop.fs.Path(aggPath, "agg")
      // a committed marker whose generation is gone is the corruption
      // case the fold protocol refuses loudly — callers must be able to
      // tell it from "nothing committed yet", so throw here too instead
      // of collapsing both states into None (a backfill would otherwise
      // silently skip real-but-damaged history)
      Some(gens.find(ok).getOrElse(sys.error(
        s"committedAggregate: $marker commits batch $last but neither an " +
          s"agg_$last generation nor the legacy agg dir has a _SUCCESS — " +
          "the store is corrupted outside the generation protocol " +
          "(mirrors maintainEdges' refusal); restore _last_batch to the " +
          "newest intact generation's id")).toString)
    }
  }

  /** tolerant `_last_batch` read: an unreadable/empty marker parses as
    * -1 ("nothing committed") instead of a NumberFormatException that
    * wedges every restart. The marker is written temp+rename (atomic),
    * so -1 WITH committed generations present means damage outside the
    * protocol — the fold refuses that loudly rather than silently
    * reinitializing over real history. */
  private def readLastBatch(fs: org.apache.hadoop.fs.FileSystem,
                            marker: org.apache.hadoop.fs.Path): Long =
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption
        .getOrElse(-1L)
      finally in.close()
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
    * Exactly-once via GENERATION directories (the plain-parquet analogue
    * of Iceberg's snapshot commit): the aggregate after folding batch N
    * lives at `<aggPath>/agg_N`; `<aggPath>/_last_batch` names the
    * committed generation. A batch merges `agg_<last>` + its own delta
    * into `agg_<batchId>` — the committed generation is NEVER mutated,
    * so a crash at ANY point before the marker write leaves `agg_<last>`
    * intact and the replayed batch (foreachBatch replays the same rows
    * for the same batchId when `checkpointLocation` is set) recomputes
    * the identical merge: no history loss, no double count. Batches
    * ≤ the committed id are skipped; superseded generations are pruned
    * only AFTER the marker commit. A MISSING marker next to committed
    * data is resolved by attribution: if the only committed generation
    * is the replayed batch's own (a crash between its parquet commit and
    * the marker write), the replay recomputes and overwrites it; any
    * other committed generation means history whose batch id is lost —
    * that fails loudly (with a recovery hint) rather than silently
    * restarting the aggregate from one batch's delta. A committed marker
    * whose generation directory is missing its _SUCCESS is corruption
    * outside the protocol and fails loudly too.
    *
    * `checkpointLocation` is REQUIRED when resuming an existing
    * maintained aggregate: without it a restarted query renumbers
    * batches from 0, and the idempotence marker would silently skip
    * every batch of genuinely new data. */
  def maintainEdges(canonical: DataFrame, aggPath: String, edgesPath: String,
                    trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                    checkpointLocation: Option[String] = None,
                    weightsPath: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.Pipeline
    locally { // resume guard — BEFORE the query starts
      val marker = new org.apache.hadoop.fs.Path(aggPath, "_last_batch")
      val fs = marker.getFileSystem(
        canonical.sparkSession.sparkContext.hadoopConfiguration)
      require(readLastBatch(fs, marker) < 0L || checkpointLocation.isDefined,
        s"maintainEdges: $aggPath holds a committed aggregate but no " +
          "checkpointLocation was given — a fresh query restarts batch ids " +
          "at 0 and the idempotence marker would silently drop all new " +
          "data; pass the original checkpointLocation (or a fresh aggPath)")
    }
    // the query-run identity stamped next to every generation: batch ids
    // are only meaningful WITHIN one checkpoint lineage, so a generation
    // may be claimed as "this batch's own crashed commit" only when it
    // was written by the same lineage. Checkpointed queries share the
    // lineage across restarts (same checkpoint → same renumbering);
    // a query WITHOUT a checkpoint renumbers batches from 0 on every
    // start, so each start is its own lineage — an orphan agg_0 from a
    // previous no-checkpoint run must hit the loud refusal below, not
    // the self-overwrite branch.
    val runId = checkpointLocation.map("cp:" + _)
      .getOrElse("ephemeral:" + java.util.UUID.randomUUID().toString)
    // the lineage tag rides IN the generation dir name (agg_<id>-<tag>),
    // so attribution commits atomically with the dir's _SUCCESS — there
    // is no window where a generation exists without its lineage (the
    // r7 review found exactly that window in the previous design, which
    // stamped a separate _run_id file AFTER the parquet job: a crash
    // between the two wedged an otherwise self-healing first-batch
    // replay). Legacy dirs (bare agg_<id> + _run_id file) stay readable.
    val lineageTag = StreamingOps.lineageTagOf(runId)
    val writer = canonical.writeStream
      .outputMode("append")
    trigger.foreach(writer.trigger)
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldGeneration(batch.sparkSession, aggPath, batchId, runId, lineageTag,
          Pipeline.pairPredAggregate(batch.toDF()), Pipeline.mergePairPred) {
          merged =>
            // BOTH derived surfaces share ONE capped materialization —
            // deriving weights through edgeWeightsFromPairPred would
            // re-run the cap (window top-k) and the pairwise expansion a
            // second time per batch
            val capped = Pipeline.cappedPairPred(merged, 32, 8)
              .localCheckpoint(eager = false)
            Pipeline.edgesFromCapped(capped)
              .write.mode("overwrite").parquet(edgesPath)
            // the entailment-weight surface rides the SAME merged
            // aggregate — a stream-fed store maintains weights exactly
            // like the batch fold does (derivation re-run per batch,
            // never corpus-scaled)
            weightsPath.foreach(p =>
              Pipeline.edgeWeightsFromCapped(capped)
                .write.mode("overwrite").parquet(p))
        }
      }
      .start()
  }

  /** ONE committed fold of `delta` into the generation-protocol
    * aggregate at `aggPath` — the exactly-once machinery maintainEdges'
    * scaladoc documents, extracted so every maintained aggregate
    * (pair-pred, type evidence) runs the IDENTICAL attribution / commit
    * / prune sequence instead of a hand-copied variant. `derive` runs
    * between the generation's parquet commit and the marker commit —
    * derived surfaces written there are recomputed by the replay on any
    * crash before the marker, so they can never lag a committed
    * generation. Batches ≤ the committed id are skipped (idempotent
    * replay). */
  private[graft] def foldGeneration(
      spark: org.apache.spark.sql.SparkSession, aggPath: String,
      batchId: Long, runId: String, lineageTag: String,
      delta: DataFrame, merge: (DataFrame, DataFrame) => DataFrame)(
      derive: DataFrame => Unit): Unit = {
    import graft.pipeline.Pipeline
    locally {
        val conf = spark.sparkContext.hadoopConfiguration
        val base = new org.apache.hadoop.fs.Path(aggPath)
        val marker = new org.apache.hadoop.fs.Path(aggPath, "_last_batch")
        val fs = marker.getFileSystem(conf)
        val last = readLastBatch(fs, marker)
        if (batchId > last) {
          // the generation THIS lineage writes for batch `id` — tag in
          // the name, attribution atomic with _SUCCESS
          def genW(id: Long) =
            new org.apache.hadoop.fs.Path(aggPath, s"agg_$id-$lineageTag")
          def hasSuccess(p: org.apache.hadoop.fs.Path) =
            fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS"))
          val legacy = new org.apache.hadoop.fs.Path(aggPath, "agg")
          // batch id of a generation dir name: tagged (agg_<id>-<tag>)
          // or legacy bare (agg_<id>)
          val GenName = "^agg_([0-9]+)(?:-[0-9a-f]+)?$".r
          def genIdOf(name: String): Option[Long] = name match {
            case GenName(id) => id.toLongOption
            case _ => None
          }
          def genRunId(p: org.apache.hadoop.fs.Path): Option[String] = {
            val f = new org.apache.hadoop.fs.Path(p, "_run_id")
            if (!fs.exists(f)) None
            else {
              val in = fs.open(f)
              try Some(new String(in.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8))
              finally in.close()
            }
          }
          // is this committed generation POSITIVELY attributable to this
          // lineage's `id`? Tagged name == ours (atomic), or a legacy
          // bare-named dir whose _run_id stamp matches.
          def ownGen(p: org.apache.hadoop.fs.Path, id: Long): Boolean =
            p.getName == s"agg_$id-$lineageTag" ||
              (p.getName == s"agg_$id" && genRunId(p).contains(runId))
          // the committed generation for batch `id`, any layout: this
          // lineage's tagged dir, a foreign/legacy tagged dir, or bare
          def genRead(id: Long): Option[org.apache.hadoop.fs.Path] = {
            val cands = Seq(genW(id), new org.apache.hadoop.fs.Path(aggPath, s"agg_$id")) ++
              (if (fs.exists(base))
                 fs.listStatus(base).map(_.getPath).toSeq
                   .filter(p => genIdOf(p.getName).contains(id))
               else Seq.empty)
            cands.distinct.find(hasSuccess)
          }
          // the committed aggregate: the marker's generation dir, or the
          // pre-generation flat `agg` layout (one-time migration read).
          // A MISSING/EMPTY marker next to committed data is corruption
          // (e.g. a crash inside the marker rewrite, or a hand-deleted
          // file): silently treating it as "fresh store" would
          // reinitialize the aggregate from one batch's delta and the
          // post-commit prune would then DELETE the real history — fail
          // loudly instead (the marker write below is temp+rename
          // atomic, so this branch indicates damage outside the
          // protocol).
          def committedGens = // only consulted when the marker is absent
            if (!fs.exists(base)) Seq.empty
            else fs.listStatus(base).map(_.getPath).toSeq.filter(p =>
              (p.getName == "agg" || genIdOf(p.getName).isDefined) &&
                hasSuccess(p))
          val current: Option[org.apache.hadoop.fs.Path] =
            if (last < 0L) {
              // no marker. Two states reach here INSIDE the protocol: a
              // genuinely fresh store (no generations), or THIS batch's
              // own crashed commit — its generation parquet landed (with
              // _SUCCESS) but the crash hit before the first marker write
              // or inside the documented delete→rename sliver. When the
              // ONLY committed generation is gen(batchId) — the batch
              // being replayed right now — that data is a previous
              // attempt's output for THIS batch: recomputing with no
              // prior aggregate and overwriting it IS the replay
              // contract. "Own" requires POSITIVE attribution: the
              // lineage tag in the dir name (atomic with _SUCCESS), or a
              // legacy bare-named dir whose _run_id stamp matches —
              // batch ids renumber from 0 across no-checkpoint restarts,
              // so a bare-name match alone would let a new run mistake a
              // previous run's orphan agg_0 for its own crashed commit
              // and recompute that history away. Any other committed
              // generation (wrong id, foreign tag, or a legacy dir whose
              // stamp was lost) is real-or-unattributable prior history —
              // refuse loudly rather than reinitialize from one batch's
              // delta and then prune it.
              val others = committedGens.filterNot(ownGen(_, batchId))
              if (others.nonEmpty) sys.error(
                s"foldGeneration($aggPath): the store holds committed aggregate data " +
                  s"(${others.map(_.getName).mkString(", ")}) but " +
                  "_last_batch is missing or unreadable. This state is " +
                  "reachable by a crash in the marker delete→rename " +
                  "sliver as well as by hand-deletion; either way the " +
                  "committed history can no longer be attributed to a " +
                  "batch id (or belongs to a different query lineage — " +
                  "batch ids renumber across no-checkpoint restarts), so " +
                  "refusing to reinitialize the aggregate from a single " +
                  "batch's delta. Recover by restoring _last_batch with " +
                  "the newest intact generation's id ('N' for agg_N)")
              None
            }
            else Some(genRead(last)
              .orElse(if (hasSuccess(legacy)) Some(legacy) else None)
              .getOrElse(sys.error(
                s"foldGeneration($aggPath): $marker commits batch $last but neither " +
                  s"an agg_$last generation nor $legacy has a _SUCCESS — " +
                  "the store is corrupted outside the generation " +
                  "protocol; refusing to reinitialize the aggregate " +
                  "from a single batch's delta")))
          val merged = current
            .map(d => merge(spark.read.parquet(d.toString), delta))
            .getOrElse(delta)
            .localCheckpoint() // one materialization, derive + gen write
          // the dir name carries the lineage tag, so attribution is
          // atomic with the parquet job's own _SUCCESS — no separate
          // stamp file, no stampless crash window
          merged.write.mode("overwrite").parquet(genW(batchId).toString)
          // derived surfaces write INSIDE the pre-marker window: a crash
          // before the marker replays the batch and recomputes them
          derive(merged)
          // atomic marker commit: write-temp-then-rename — a crash can
          // leave the OLD marker (replay recomputes the merge off the
          // old generation, harmless) or, in the delete→rename sliver,
          // no marker at all (caught loudly above); it can never leave a
          // truncated marker that silently reads as "fresh store"
          val tmp = new org.apache.hadoop.fs.Path(aggPath, "_last_batch.tmp")
          val out = fs.create(tmp, true)
          out.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          out.close()
          fs.delete(marker, false)
          require(fs.rename(tmp, marker),
            s"foldGeneration($aggPath): rename $tmp -> $marker failed")
          // prune superseded generations (and the legacy dir) only now —
          // a crash here leaves stale dirs, never a broken commit
          if (fs.exists(base))
            fs.listStatus(base).map(_.getPath).foreach { p =>
              val n = p.getName
              val stale = n == "agg" ||
                genIdOf(n).exists(_ != batchId) ||
                // a superseded same-id dir under a DIFFERENT layout than
                // the one just written (e.g. the legacy bare dir this
                // batch's replay overrode)
                (genIdOf(n).contains(batchId) && n != genW(batchId).getName)
              if (stale) fs.delete(p, true)
            }
        }
    }
  }

  /** [[maintainEdges]] over a stream of DOCUMENTS, additionally
    * maintaining the TYPED entailment-weight surface
    * ([[graft.pipeline.Pipeline.typedEdgeWeights]]). The extraction
    * chain (segment → extract → canonicalize) runs per micro-batch
    * inside foreachBatch — the same stateless narrow transformations,
    * per-batch output identical to the stream-transformation form — so
    * one batch can feed BOTH maintained aggregates:
    *
    *   - `aggPath`: the pair-pred aggregate (identical protocol and
    *     layout to [[maintainEdges]] — a store started there resumes
    *     here unchanged);
    *   - `evidencePath`: the additive type-evidence aggregate
    *     ([[graft.pipeline.Pipeline.entityTypeEvidence]]), its own
    *     generation store under the SAME lineage tag and batch ids.
    *
    * Commit order per batch: evidence folds FIRST, pair-pred second,
    * derived surfaces (edges / weights / typed weights) inside the
    * pair-pred fold's pre-marker window. Crash analysis: each fold is
    * individually idempotent (batch ≤ its marker skips), so a crash
    * between the two markers replays the batch, skips the evidence fold
    * (already committed), and recomputes the pair-pred fold — the typed
    * derivation reads the COMMITTED evidence generation, which at that
    * point is exactly this batch's. The evidence marker is always ≥ the
    * pair-pred marker; both stores reach the same id when the batch
    * commits. */
  def maintainTypedEdges(docs: Dataset[graft.model.Doc],
                         aliases: Dataset[graft.model.AliasRow],
                         aggPath: String, evidencePath: String,
                         edgesPath: String, weightsPath: String,
                         typedWeightsPath: String,
                         trigger: Option[org.apache.spark.sql.streaming.Trigger] = None,
                         checkpointLocation: Option[String] = None,
                         parser: graft.pipeline.DepParser = graft.pipeline.FixtureDepParser,
                         annotator: graft.pipeline.SentenceAnnotator = graft.pipeline.FixtureAnnotator)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.pipeline.{Mentions, Pipeline}
    locally { // resume guard — BEFORE the query starts (both aggregates)
      val conf = docs.sparkSession.sparkContext.hadoopConfiguration
      def markerOf(p: String): Long = {
        val marker = new org.apache.hadoop.fs.Path(p, "_last_batch")
        readLastBatch(marker.getFileSystem(conf), marker)
      }
      for (p <- Seq(aggPath, evidencePath)) {
        require(markerOf(p) < 0L || checkpointLocation.isDefined,
          s"maintainTypedEdges: $p holds a committed aggregate but no " +
            "checkpointLocation was given — a fresh query restarts batch " +
            "ids at 0 and the idempotence marker would silently drop all " +
            "new data; pass the original checkpointLocation (or fresh " +
            "output paths)")
      }
      // a PRE-TYPED pairpred store (built by maintainEdges) adopted here
      // starts the evidence aggregate EMPTY: entities observed only in
      // the already-folded batches carry no label evidence and type as
      // the default forever, so edge_weights_typed silently diverges
      // from the batch derivation over the same corpus. Surface it
      // loudly at adoption time — faithful typed weights need a
      // batch-side evidence rebuild over the historical corpus.
      val aggMarker = markerOf(aggPath)
      if (aggMarker >= 0L && markerOf(evidencePath) < 0L)
        System.err.println(s"[stream] WARNING: $aggPath already holds batches " +
          s"through $aggMarker but $evidencePath has no committed evidence " +
          "generation — type evidence starts empty, historical entities will " +
          "type as the default until re-observed; rebuild the evidence store " +
          "batch-side for typed weights faithful to the full corpus")
    }
    val runId = checkpointLocation.map("cp:" + _)
      .getOrElse("ephemeral:" + java.util.UUID.randomUUID().toString)
    val lineageTag = lineageTagOf(runId)
    val writer = docs.writeStream.outputMode("append")
    trigger.foreach(writer.trigger)
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer
      .foreachBatch { (batch: Dataset[graft.model.Doc], batchId: Long) =>
        val spark = batch.sparkSession
        // ONE materialization of the batch's sentences: they feed THREE
        // consumers (extraction, mention detection, the label table) —
        // unpinned, each re-runs segmentation and the source read
        val sentences = Pipeline.segmentDocs(batch).localCheckpoint()
        val canonical = Pipeline.canonicalize(
          Pipeline.extractTriples(sentences, parser = parser), aliases)
        // evidence fold FIRST (no derived surfaces of its own)
        foldGeneration(spark, evidencePath, batchId, runId, lineageTag,
          Pipeline.entityTypeEvidence(
            Mentions.detect(sentences, aliases),
            Pipeline.mentionLabelTable(sentences, annotator)),
          Pipeline.mergeTypeEvidence)(_ => ())
        // pair-pred fold second; all derived surfaces in its window
        foldGeneration(spark, aggPath, batchId, runId, lineageTag,
          Pipeline.pairPredAggregate(canonical), Pipeline.mergePairPred) {
          merged =>
            val capped = Pipeline.cappedPairPred(merged, 32, 8)
              .localCheckpoint(eager = false)
            Pipeline.edgesFromCapped(capped)
              .write.mode("overwrite").parquet(edgesPath)
            Pipeline.edgeWeightsFromCapped(capped)
              .write.mode("overwrite").parquet(weightsPath)
            val evGen = committedAggregate(spark, evidencePath).getOrElse(
              sys.error(s"maintainTypedEdges: evidence fold for batch " +
                s"$batchId left no committed generation at $evidencePath"))
            Pipeline.typedEdgeWeights(merged,
                Pipeline.entityTypesFromEvidence(spark.read.parquet(evGen)))
              .write.mode("overwrite").parquet(typedWeightsPath)
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
