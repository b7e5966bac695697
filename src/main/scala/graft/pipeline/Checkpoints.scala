package graft.pipeline

import java.nio.charset.StandardCharsets
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Stage checkpointing with per-partition lineage — the sandbox stand-in
  * for Iceberg snapshot-per-stage (no Iceberg jars ship with this image;
  * in production every `save` below is a `df.writeTo(table).append()`
  * against an Iceberg catalog and `valid` is a snapshot-existence check).
  *
  * Semantics: a stage whose checkpoint directory contains both Spark's
  * _SUCCESS marker and our _graft_meta.json WITH A MATCHING RUN
  * FINGERPRINT is complete — `runStage` reads it back instead of
  * recomputing, which is what makes a killed job resume without
  * recomputation (the reference achieves the same with its --ready_ddp
  * materialized-parse mode, dudepparse.py:1891-1899, and manual slice
  * files). The fingerprint encodes the run's input parameters; rerunning
  * against the same root with different parameters invalidates (and
  * recomputes) stale stages instead of silently returning them.
  */
final class CheckpointStore(root: String, spark: SparkSession,
                            fingerprint: String = "") {

  private def dataPath(stage: String) = s"$root/$stage"

  /** per-file lineage lives as a parquet SIDE TABLE (file, rows) under
    * `_lineage/<stage>` — NOT inside the stage dir (the data-file
    * listing would pick it up) and NOT in the meta json: at 100 TB a
    * stage has millions of part files, and a driver-side list (the
    * pre-r8 design collected per-file counts to build the json) becomes
    * the store's own scaling bottleneck. The meta json keeps only
    * bounded scalars (fingerprint, total rows, upstream); every lineage
    * comparison below is a Spark-side join, never an unbounded collect.
    * Iceberg analogue: the manifest files ARE tables. Legacy roots
    * (per-file lists still in the json) stay readable — first rewrite
    * migrates them. */
  private def lineagePath(stage: String) = s"$root/_lineage/$stage"

  private def lineageExists(stage: String): Boolean =
    fs.exists(new Path(lineagePath(stage), "_SUCCESS"))

  /** the recorded per-file lineage as a DataFrame (file, rows) — the
    * side table when present, else the legacy json list (bounded by
    * whatever an old root's meta holds). */
  private def lineageDF(stage: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.lit
    if (lineageExists(stage)) spark.read.parquet(lineagePath(stage))
    else {
      val legacy = metaFileRows(stage)
      if (legacy.isEmpty)
        spark.range(0).select(lit("").as("file"), lit(0L).as("rows")).limit(0)
      else spark.createDataFrame(legacy).toDF("file", "rows")
    }
  }

  private def hasRecordedLineage(stage: String): Boolean =
    lineageExists(stage) || metaFileRows(stage).nonEmpty

  /** per-file (file, rows) for the given data files — ONE distributed
    * pass, file name extracted plan-side (no driver mapping). */
  private def perFileCounts(files: Seq[Path]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    if (files.isEmpty)
      spark.range(0).select(lit("").as("file"), lit(0L).as("rows")).limit(0)
    else spark.read.parquet(files.map(_.toString): _*)
      .groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
      .agg(count(lit(1)).as("rows"))
  }

  /** total rows of a lineage table — a one-row aggregate, the only
    * driver-side read the lineage design allows. */
  private def lineageTotal(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.functions._
    df.agg(coalesce(sum(col("rows")), lit(0L))).collect()(0).getLong(0)
  }

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readMeta(stage: String): Option[String] = {
    val p = new Path(dataPath(stage), "_graft_meta.json")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  /** a crashed incremental fold ([[graft.pipeline.Pipeline.incrementalFold]])
    * leaves this marker at the root; while it exists the stores may be
    * mutually inconsistent (e.g. triples holding a slice canonical lacks),
    * so NO stage under this root may be treated as complete — a one-shot
    * resume would otherwise silently reuse half-mutated data. The fold
    * itself repairs forward; [[Pipeline.runFromDocs]] invalidates and
    * recomputes. */
  def foldInFlight: Boolean = fs.exists(new Path(root, "_fold_inflight"))

  /** One-shot-path recovery from a crashed fold: wipe every stage's
    * completion meta (forces full recompute), drop the fold-owned
    * `pairpred` + `type_evidence` aggregates, clear the marker. Lives HERE because the meta
    * filename and layout are this store's implementation details — a
    * caller hand-deleting `_graft_meta.json` would silently stop working
    * if the name ever changed, turning the wipe into stale-data resume.
    * Returns whether a recovery actually ran. (The INCREMENTAL path must
    * NOT call this — its repair uses the standing marker.) */
  def recoverFoldCrash(): Boolean =
    foldInFlight && {
      fs.listStatus(new Path(root)).filter(_.isDirectory).foreach { d =>
        fs.delete(new Path(d.getPath, "_graft_meta.json"), false)
      }
      fs.delete(new Path(root, "pairpred"), true)
      fs.delete(new Path(root, "type_evidence"), true)
      fs.delete(new Path(root, "_fold_inflight"), false)
      true
    }

  /** Delete data files a crashed append left UNRECORDED in the stage's
    * lineage meta (Iceberg's orphan-file semantics: files no snapshot
    * references are invisible and cleaned). A mid-job-commit crash can
    * expose a SUBSET of an append's files — a doc's rows split across
    * files would then be partially present, which doc-granular repair
    * cannot see; pruning back to the last recorded-consistent state
    * first makes the doc-level reconcile sound. No-op (returns Nil) when
    * the stage has no recorded file list to prune against. */
  def pruneUnrecorded(stage: String): Seq[String] = {
    // the meta json is the anchor tying the recorded lineage to the
    // stage's CURRENT content: lineage-without-meta is a mid-protocol
    // state (e.g. a compact crashed after the swap, before
    // markComplete) where the lineage may describe files that no longer
    // exist — pruning against it would delete valid data. Refuse.
    if (!hasRecordedLineage(stage) || readMeta(stage).isEmpty) Nil
    else {
      import org.apache.spark.sql.functions.col
      val listed = listDataFiles(stage)
      if (listed.isEmpty) Nil
      else {
        // lineage rows are built by grouping DATA rows on
        // input_file_name, so zero-row part files are never recorded —
        // a legitimately EMPTY stage has an empty lineage table, and
        // pruning against it would delete every (empty) part file,
        // leaving a _SUCCESS+meta dir with no parquet to infer a schema
        // from. Zero recorded files ⇒ nothing sound to prune against.
        val lineage = lineageDF(stage).select(col("file"))
        if (lineage.isEmpty) return Nil
        // Spark-side anti-join against the lineage table; only the
        // UNRECORDED names come back to the driver (bounded by one
        // crashed append's files — normally empty), which the driver
        // must hold anyway to issue the deletes
        val listedDF = spark.createDataFrame(
          listed.map(p => Tuple1(p.getName))).toDF("file")
        val unrecorded = listedDF
          .join(lineage, Seq("file"), "left_anti")
          .collect().map(_.getString(0)).toSet
        listed.filter(p => unrecorded(p.getName)).map { p =>
          fs.delete(p, false)
          p.getName
        }
      }
    }
  }

  /** the run fingerprint recorded in a stage's meta sidecar (None when
    * the stage has no meta) — lets preflight checks compare provenance
    * segments (e.g. the `aliases=` dictionary pin) without depending on
    * the meta layout. */
  def stageFingerprint(stage: String): Option[String] =
    readMeta(stage).flatMap(
      """"fingerprint":"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(_))
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))

  def isComplete(stage: String): Boolean =
    !foldInFlight &&
      fs.exists(new Path(dataPath(stage), "_SUCCESS")) &&
      stageFingerprint(stage).exists(stored =>
        stored == fingerprint ||
          // pin-encoding migration: the aliases= segment is the one
          // fingerprint component whose LITERAL form changed across
          // versions (raw → always-marked → marked-only-when-needed);
          // compare it decoded so an equivalent root keeps resuming —
          // see Pipeline.normalizeFingerprint for why this is safe
          Pipeline.normalizeFingerprint(stored) ==
            Pipeline.normalizeFingerprint(fingerprint))

  /** every stage under this root that is COMPLETE under THIS store's
    * fingerprint — the maintenance-pass work list (derived, never
    * hardcoded: a stage added to the pipeline can't silently escape
    * compaction). */
  def completeStages: Seq[String] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.endsWith("._compacting"))
      .filterNot(_ == "_lineage") // the lineage side tables, not a stage
      .filter(isComplete).sorted.toSeq
  }

  /** run (or resume) a stage; the dataset is persisted as parquet with a
    * meta sidecar carrying row count, partition/file lineage, the upstream
    * stage names and the run fingerprint. `bucketCol` adds an explicit
    * hash-bucket directory layout (`_bucket=pmod(xxhash64(col), nBuckets)`)
    * — the plain-parquet analogue of Iceberg's `bucket(N, col)` partition
    * transform: co-locates rows by key and prunes on bucket predicates.
    *
    * The read-back always supplies the stage's KNOWN schema: an EMPTY
    * partitionBy write produces zero part files, so schema inference
    * would fail — and a valid pipeline stage may legitimately be empty
    * (e.g. a coref pass over a corpus with no coreferent chains). */
  def runStage[T](stage: String, upstream: Seq[String] = Nil,
                  bucketCol: Option[String] = None, nBuckets: Int = 64)
                 (compute: => Dataset[T])(implicit enc: Encoder[T]): Dataset[T] = {
    val storedSchema =
      if (bucketCol.isDefined) enc.schema.add("_bucket", org.apache.spark.sql.types.LongType)
      else enc.schema
    if (!isComplete(stage)) {
      writeStage(compute.toDF(), stage, bucketCol, nBuckets)
      markComplete(stage, upstream, Some(storedSchema))
    }
    readStage(stage, Some(storedSchema)).drop("_bucket").as[T]
  }

  /** the DataFrame (dynamic-schema) variant of [[runStage]], same
    * completeness/resume/bucketing semantics. `compute` is only ever
    * PLANNED on resume (schema fallback for an empty partitioned stage
    * derives from the lazy plan, no job runs); the `_bucket` column is
    * dropped from the returned read-back. */
  def runStageDF(stage: String, upstream: Seq[String] = Nil,
                 bucketCol: Option[String] = None, nBuckets: Int = 64)
                (compute: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    lazy val computed = compute
    def stored = bucketCol match {
      case Some(_) => computed.schema.add("_bucket", org.apache.spark.sql.types.LongType)
      case None => computed.schema
    }
    if (!isComplete(stage)) {
      writeStage(computed, stage, bucketCol, nBuckets)
      markComplete(stage, upstream, Some(stored))
    }
    readStage(stage, Some(stored)).drop("_bucket")
  }

  /** the ONE writer for stage data: plain parquet, or the explicit
    * hash-bucket directory layout when `bucketCol` is set. */
  private def writeStage(df: org.apache.spark.sql.DataFrame, stage: String,
                         bucketCol: Option[String], nBuckets: Int): Unit =
    writeStageMode(df, stage, bucketCol, nBuckets, "overwrite")

  /** `clustered = false` (one-shot stage writes): fanout write — no
    * shuffle, each task writes into every bucket dir it touches
    * (tasks × buckets files; `compact()` is the maintenance answer).
    * `clustered = true` (incremental APPENDS): one slice-sized shuffle on
    * the bucket key first, so each fold adds ≈ nBuckets files instead of
    * tasks × nBuckets — repeated folds would otherwise grow the file
    * count (and every subsequent fold's read/meta cost) unboundedly. */
  private def writeStageMode(df: org.apache.spark.sql.DataFrame, stage: String,
                             bucketCol: Option[String], nBuckets: Int,
                             saveMode: String, clustered: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    bucketCol match {
      case Some(c) =>
        val withB = df.withColumn("_bucket", pmod(xxhash64(col(c)), lit(nBuckets.toLong)))
        (if (clustered) withB.repartition(col("_bucket")) else withB)
          .write.mode(saveMode).partitionBy("_bucket").parquet(dataPath(stage))
      case None =>
        df.write.mode(saveMode).parquet(dataPath(stage))
    }
  }

  /** APPEND rows into an existing bucketed stage — the incremental-
    * maintenance write (Iceberg analogue: `writeTo(table).append()`).
    * New files land in the same `_bucket=` directory layout, so bucket
    * pruning and co-located reads keep working; the meta sidecar is
    * re-derived afterwards (per-file lineage over old + new files) and
    * stamped with THIS store's fingerprint — an incremental fold changes
    * what the stage contains, so the previous run's fingerprint must not
    * keep claiming it (a later rerun of the original one-shot command
    * sees the mismatch and recomputes rather than silently reusing the
    * folded store). Caller guarantees appended rows are disjoint from
    * the stage's contents (doc-granular anti-join upstream).
    *
    * COST CONTRACT: the meta refresh is SLICE-SIZED, not store-sized —
    * per-file lineage for the NEW files only is counted (one job over the
    * appended files) and merged with the meta's recorded entries; the
    * history files are never rescanned. (If the prior meta is missing its
    * file list — hand-edited root — it falls back to one full
    * markComplete rescan rather than recording wrong lineage.) */
  def appendStage(df: org.apache.spark.sql.DataFrame, stage: String,
                  upstream: Seq[String] = Nil,
                  bucketCol: Option[String] = None, nBuckets: Int = 64): Unit = {
    require(fs.exists(new Path(dataPath(stage), "_SUCCESS")),
      s"appendStage($stage): no existing completed stage at ${dataPath(stage)}")
    import org.apache.spark.sql.functions.col
    val beforeFiles = listDataFiles(stage)
    val before = beforeFiles.map(_.getName).toSet
    // STALE lineage = pre-append data files the recorded lineage doesn't
    // know (a previous append committed its files but died before its
    // lineage write) — merging would under-count forever and wedge a
    // later compact()'s row verification. Detected Spark-side (listing
    // anti-join lineage, one count — never a per-file collect).
    val stale = !hasRecordedLineage(stage) || {
      beforeFiles.nonEmpty && {
        val beforeDF = spark.createDataFrame(
          beforeFiles.map(p => Tuple1(p.getName))).toDF("file")
        !beforeDF.join(lineageDF(stage).select(col("file")),
          Seq("file"), "left_anti").isEmpty
      }
    }
    writeStageMode(df, stage, bucketCol, nBuckets, "append", clustered = true)
    if (stale && before.nonEmpty) {
      // fall back to one full self-healing rescan
      val stored = bucketCol match {
        case Some(_) => df.schema.add("_bucket", org.apache.spark.sql.types.LongType)
        case None => df.schema
      }
      markComplete(stage, upstream, Some(stored))
    } else {
      // SLICE-SIZED lineage refresh: count the NEW files only, append
      // their rows to the lineage table, bump the meta total by the
      // delta — the history files are never rescanned
      val newFiles = listDataFiles(stage).filterNot(p => before(p.getName))
      val freshDF = perFileCounts(newFiles).localCheckpoint()
      val freshTotal = lineageTotal(freshDF)
      // previous total from the lineage table, NOT the meta json: a
      // crash between a lineage append and the meta rewrite leaves the
      // json total stale-low — preferring it here would bake the
      // under-count into every subsequent append (the compact verifier
      // already names the lineage table the source of truth). Evaluated
      // eagerly BEFORE freshDF lands in the table.
      val prevTotal = lineageTotal(lineageDF(stage))
      if (!lineageExists(stage)) // legacy root: migrate the json list once
        lineageDF(stage).write.mode("overwrite").parquet(lineagePath(stage))
      freshDF.write.mode("append").parquet(lineagePath(stage))
      writeMeta(stage, upstream, prevTotal + freshTotal)
    }
  }

  /** read a stage with INFERENCE first — a checkpoint written by an older
    * code version with a different schema must keep failing LOUDLY at
    * analysis (an explicit schema would silently null-fill missing
    * columns) — and fall back to the known schema only when inference has
    * nothing to read (an EMPTY partitioned stage writes zero part files).
    * `fallback` is by-name: runStageDF's fallback plans its compute, which
    * must stay untouched on the inference happy path. */
  private def readStage(stage: String,
                        fallback: => Option[org.apache.spark.sql.types.StructType]) =
    // an EMPTY partitioned stage writes zero part files: probe for that
    // explicitly (version-independent) instead of keying only off the
    // AnalysisException condition string — a Spark build that reports a
    // different condition must not break the empty-stage resume path
    // ORDER MATTERS: probe the filesystem BEFORE touching `fallback` —
    // the by-name fallback plans runStageDF's compute thunk, and some
    // computes (the edge-weight derivations' capped materialization
    // under AQE) launch jobs at plan CONSTRUCTION; on the happy path
    // (stage has data files) the fallback must never be evaluated, or
    // every resume of a complete root re-runs that construction work
    if (fs.exists(new Path(dataPath(stage))) &&
        listDataFiles(stage).isEmpty && fallback.isDefined)
      spark.read.schema(fallback.get).parquet(dataPath(stage))
    else
      try spark.read.parquet(dataPath(stage))
      catch {
        // belt for listings that race the probe; match the modern error
        // condition AND the legacy message text
        case e: org.apache.spark.sql.AnalysisException
            if fallback.isDefined &&
               (e.getCondition == "UNABLE_TO_INFER_SCHEMA" ||
                e.getMessage.contains("Unable to infer schema")) =>
          spark.read.schema(fallback.get).parquet(dataPath(stage))
      }

  /** read a stage's data with the empty-stage schema fallback — the
    * PUBLIC read path for consumers outside runStage (the incremental
    * fold's history reads): a legitimately EMPTY bucketed stage has zero
    * part files, where raw `spark.read.parquet` fails inference. */
  def readData(stage: String,
               fallback: Option[org.apache.spark.sql.types.StructType]): org.apache.spark.sql.DataFrame =
    readStage(stage, fallback)

  /** write the completion meta for a stage whose data was persisted by the
    * caller (DataFrame stages that don't go through runStage). `schema`
    * makes the lineage pass robust to zero-file (empty partitioned)
    * stages where inference has nothing to read. */
  def markComplete(stage: String, upstream: Seq[String],
                   schema: Option[org.apache.spark.sql.types.StructType] = None): Unit = {
    val df = readStage(stage, schema)
    // per-file lineage: row count per output file, ONE distributed pass
    // written straight to the lineage side table (never collected); the
    // stage total is a one-row aggregate of that table, not a second
    // data scan. Lineage commits BEFORE the meta json — the json's
    // fingerprint is what marks the stage complete, so a crash between
    // the two leaves an incomplete stage, never a complete stage with
    // missing lineage.
    import org.apache.spark.sql.functions._
    df.groupBy(element_at(split(input_file_name(), "/"), -1).as("file"))
      .agg(count(lit(1)).as("rows"))
      .write.mode("overwrite").parquet(lineagePath(stage))
    writeMeta(stage, upstream, lineageTotal(spark.read.parquet(lineagePath(stage))))
  }

  private def writeMeta(stage: String, upstream: Seq[String],
                        totalRows: Long): Unit = {
    val meta =
      s"""{"stage":${jstr(stage)},"snapshot_id":${System.currentTimeMillis()},
         |"fingerprint":${jstr(fingerprint)},
         |"rows":$totalRows,
         |"upstream":[${upstream.map(jstr).mkString(",")}]}""".stripMargin
    val out = fs.create(new Path(dataPath(stage), "_graft_meta.json"), true)
    out.write(meta.getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  /** the total row count recorded in a stage's meta json (None for a
    * hand-written meta without one). */
  private def metaRows(stage: String): Option[Long] =
    readMeta(stage).flatMap(""""rows":(\d+)""".r.findFirstMatchIn(_))
      .map(_.group(1).toLong)

  /** LEGACY per-file lineage from the meta json (pre-r8 layout kept the
    * list inline) — migration read only; new roots keep lineage in the
    * side table. */
  private def metaFileRows(stage: String): Seq[(String, Long)] =
    readMeta(stage).toSeq.flatMap { m =>
      """\{"file":"((?:[^"\\]|\\.)*)","rows":(\d+)\}""".r.findAllMatchIn(m)
        .map(g => (g.group(1).replace("\\\"", "\"").replace("\\\\", "\\"),
                   g.group(2).toLong)).toSeq
    }

  private def listDataFiles(stage: String): Seq[Path] = {
    val dir = new Path(dataPath(stage))
    if (!fs.exists(dir)) Nil
    else {
      val it = fs.listFiles(dir, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val p = it.next().getPath
        if (p.getName.endsWith(".parquet")) buf += p
      }
      buf.toSeq
    }
  }

  /** Rewrite a completed stage's data files into `maxRecordsPerFile`-sized
    * files — the plain-parquet analogue of Iceberg's rewrite_data_files
    * maintenance action. A 10^12-doc checkpointed run accumulates small
    * files (per-slice sinks, skewed buckets, streaming micro-batches);
    * compaction restores scan efficiency without recomputing the stage.
    *
    * Layout is preserved: a `_bucket=`-partitioned stage is rewritten
    * bucket-aligned (repartition on `_bucket`, so pruning keeps working);
    * an unbucketed stage is rewritten to ceil(rows / maxRecordsPerFile)
    * files. The rewrite's row COUNT is verified against the stage's
    * recorded lineage (`"rows"` in `_graft_meta.json` — no pre-scan of a
    * TB-scale stage just to recount it) BEFORE the swap — on any failure
    * the original files stay untouched. The swap itself is
    * delete-then-rename with the lineage meta rewritten last, so a crash
    * mid-swap leaves the stage INCOMPLETE (recomputed on next run) rather
    * than silently half-compacted; in production this whole method is one
    * atomic Iceberg snapshot commit. Fingerprint and upstream lineage
    * carry through; only file lineage and snapshot id change. */
  def compact(stage: String, maxRecordsPerFile: Long = 1L << 20): CompactionReport = {
    require(isComplete(stage), s"compact($stage): stage is not complete")
    val before = listDataFiles(stage)
    if (before.isEmpty) return CompactionReport(stage, 0L, 0L, 0, 0)
    val df = readStage(stage, None)
    val bucketed = df.columns.contains("_bucket")
    val meta = readMeta(stage)
    // expected rows come from the recorded lineage TABLE when present
    // (the source of truth — a crash between a lineage append and the
    // meta rewrite leaves the json total stale), else the json total,
    // else a scan (hand-written meta only)
    val rows =
      if (lineageExists(stage)) lineageTotal(lineageDF(stage))
      else metaRows(stage).getOrElse(df.count())
    val upstream = meta.toSeq.flatMap { m =>
      """"upstream":\[([^\]]*)\]""".r.findFirstMatchIn(m).toSeq.flatMap(
        _.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty))
    }
    val tmp = new Path(root, s"$stage._compacting")
    fs.delete(tmp, true)
    import org.apache.spark.sql.functions.col
    if (bucketed)
      df.repartition(col("_bucket"))
        .write.option("maxRecordsPerFile", maxRecordsPerFile)
        .mode("overwrite").partitionBy("_bucket").parquet(tmp.toString)
    else {
      val nFiles = math.max(1L, (rows + maxRecordsPerFile - 1) / maxRecordsPerFile).toInt
      df.repartition(nFiles)
        .write.option("maxRecordsPerFile", maxRecordsPerFile)
        .mode("overwrite").parquet(tmp.toString)
    }
    val rowsAfter = spark.read.parquet(tmp.toString).count()
    require(rowsAfter == rows,
      s"compact($stage): rewrite produced $rowsAfter rows, expected $rows — " +
        "original files left untouched")
    val dst = new Path(dataPath(stage))
    fs.delete(dst, true)
    // the lineage SIDE TABLE must die with the stage it describes: the
    // pre-r8 inline lineage lived in the meta json and vanished with the
    // dst delete above, which is exactly what made a crashed compact
    // safe — no recorded lineage, so pruneUnrecorded no-ops and the
    // incomplete stage recomputes. A surviving side table would instead
    // list the PRE-compact file names, and a later fold repair's
    // pruneUnrecorded anti-join would delete every valid compacted file.
    fs.delete(new Path(lineagePath(stage)), true)
    // a false return (HDFS-style silent failure) must not masquerade as
    // success — the stage is already gone, so fail loudly; the store's
    // completeness check then forces a recompute on the next run
    require(fs.rename(tmp, dst),
      s"compact($stage): rename $tmp -> $dst failed; stage left incomplete " +
        "(will recompute on next run)")
    markComplete(stage, upstream)
    CompactionReport(stage, rows, rowsAfter, before.size, listDataFiles(stage).size)
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}

final case class CompactionReport(stage: String, rowsBefore: Long, rowsAfter: Long,
                                  filesBefore: Int, filesAfter: Int)
