package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingest — the idiomatic upgrade of the
  * reference's capture-file relay (SURVEY §2.10: Event Hub capture →
  * 3-minute avro files → batch read). Here the same flow is a streaming
  * file source → silver transform → windowed gold aggregation, with
  * watermarks bounding state — semantics the reference approximates with
  * repeated batch jobs.
  *
  * Scale notes: file-source streaming partitions by input file; the
  * windowed aggregation state is keyed by (window, key) and pruned by the
  * watermark, so state size is bounded by (keys × windows-in-watermark),
  * independent of stream length.
  */
object StreamingIngest {

  /** Streaming read of a directory of parquet drops (the "capture
    * files"), with a declared schema (streaming sources cannot infer).
    */
  def readStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Hourly tumbling-window stats per key with a watermark for late
    * data — the streaming twin of [[graft.transform.Transforms.hourlyStats]].
    */
  def hourlyWindowStats(
      events: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), window(col(tsCol), "1 hour").as("win"))
      .agg(
        avg(col(valueCol)).as(s"avg_$valueCol"),
        sum(col(valueCol)).as(s"sum_$valueCol"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("win.start").as("event_timestamp"),
        col(s"avg_$valueCol"), col(s"sum_$valueCol"), col("n_events"))

  /** Append-mode sink to a partitioned parquet table (bronze/silver
    * landing zone).
    */
  def toParquetSink(
      df: DataFrame, path: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", path)

  /** Gap-based session windows via the built-in `session_window` — the
    * idiomatic streaming sessionizer (state merges adjacent windows,
    * watermark prunes closed sessions; a session spans
    * [first, last + gap)). Works identically on a batch DataFrame, and
    * the batch running-index formulation
    * [[graft.transform.Transforms.sessionize]] produces the SAME session
    * boundaries (equivalence pinned by StreamingSpec; q48 hash-gates the
    * batch side). On a stream add `withWatermark` upstream so state is
    * bounded by open sessions only.
    */
  def sessionWindows(
      events: DataFrame, keyCol: String, tsCol: String,
      gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sess"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol), col("sess.start").as("session_start"),
        col("sess.end").as("session_end"), col("n_events"))

  /** Streaming exact dedup with watermark-bounded state — the streaming
    * twin of [[graft.ops.Dedup.exactDuplicates]]: exactly one arrival
    * per key survives (PROCESSING-order first — within a micro-batch the
    * survivor is partition-order-arbitrary, not event-time-min; pin a
    * deterministic winner downstream with an argmax if the payload
    * matters), and the dedup state is dropped once the event-time
    * watermark passes, so state is bounded by keys-within-delay,
    * independent of stream length — plain `dropDuplicates` on a stream
    * grows state forever. Re-occurrences beyond the watermark horizon
    * are treated as new (the documented `dropDuplicatesWithinWatermark`
    * trade — size the delay to the source's real redelivery window).
    * On a batch DataFrame, `dropDuplicates(keys)` is the equivalent
    * (q16/q51 hash-gate that side).
    */
  def dedupWithinWatermark(
      events: DataFrame, keyCols: Seq[String], tsCol: String,
      delay: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** CONTINUOUS ingest-drift monitoring — the streaming face of
    * [[graft.pipelines.TrainingDataPipeline.driftIncrement]]: each
    * micro-batch of arriving documents runs the EXACT batch operator
    * (histogram persisted to `stateDir/lenhist/batch=<id>`, PSI vs the
    * summed prior histograms) keyed by the micro-batch id, and its
    * drift curve lands in `outDir/batch=<id>`. `foreachBatch` + the
    * operator's overwrite-idempotent per-batch state writes make the
    * whole monitor micro-batch-transactional for free: a replayed
    * micro-batch (failure recovery re-runs the same batchId) rewrites
    * its own partitions and recomputes the identical curve — the
    * q250/q243 retry contract, now load-bearing for exactly-once.
    * Batch ≡ streaming is spec-pinned (StreamingSpec runs the same
    * arrival slices both ways and diffs the frames).
    *
    * `keepBatches` bounds the OUTPUT curves on a long-running stream
    * (the per-batch HISTOGRAM state stays — it is the reference and is
    * only ~16 rows per arrival): after each micro-batch, curve dirs
    * older than the last `keepBatches` are deleted. 0 keeps everything.
    */
  def driftMonitor(stream: DataFrame, textCol: String, stateDir: String,
      outDir: String, checkpoint: String,
      keepBatches: Int = 0): DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        graft.pipelines.TrainingDataPipeline
          .driftIncrement(df, textCol, stateDir, batchId)
          // mb=, not batch=: the curve already carries a `batch` data
          // column; a same-named partition dir would collide on read
          .write.mode("overwrite").parquet(s"$outDir/mb=$batchId")
        pruneOldBatches(df.sparkSession, outDir, batchId, keepBatches)
      }

  /** Retention sweep shared by the foreachBatch streams: delete `mb=N`
    * output dirs older than the last `keepBatches`. Strict `mb=<digits>`
    * match — a scratch dir like `mb=5.tmp` or `mb=5_bak` must be
    * ignored, never crash the whole streaming query with a
    * NumberFormatException from inside foreachBatch.
    */
  private def pruneOldBatches(spark: SparkSession, outDir: String,
      batchId: Long, keepBatches: Int): Unit =
    if (keepBatches > 0) {
      val root = new org.apache.hadoop.fs.Path(outDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root)
        .filter(_.getPath.getName.matches("mb=\\d+"))
        .filter(_.getPath.getName.drop(3).toLong <= batchId - keepBatches)
        .foreach(s => fs.delete(s.getPath, true))
    }

  /** STREAMING-DRIVEN curation (VERDICT r13 #3) — the production
    * arrival API at micro-batch cadence: each micro-batch of arriving
    * documents runs the EXACT batch operator
    * [[graft.pipelines.TrainingDataPipeline.curateIncrement]] (gate →
    * incremental exact dedup → incremental LSH+Jaccard near-dedup
    * against the persisted arrival-partitioned state → `batch=<id>`
    * state appends) keyed by the micro-batch id, and the increment's
    * kept-doc rollup lands in `outDir/mb=<id>`. The two contracts
    * compose exactly: Structured Streaming's micro-batch ids are
    * strictly increasing and a failure-recovery replay re-runs the SAME
    * id, while `curateIncrement` requires monotone batchIds and is
    * overwrite-idempotent per batch — so the [[driftMonitor]]
    * exactly-once argument carries over verbatim (a replayed
    * micro-batch rewrites its own partitions and recomputes the
    * identical rollup). Doc ids must not recede across drops (the
    * arrival contract — ids are assigned at arrival upstream).
    * Batch ≡ streaming is spec-pinned on planted CROSS-micro-batch
    * near-dups (StreamingSpec), and the per-mb rollups are the q244
    * arrival reports, now produced by a live stream.
    *
    * `keepBatches` bounds the OUTPUT report dirs on a long-running
    * stream (the [[driftMonitor]] retention device; the curation STATE
    * is never touched here — [[graft.pipelines.CurationState]] owns its
    * compaction/retention). 0 keeps everything. `outDir` is
    * eventually-consistent under failure replay: if the micro-batch
    * dies between the state appends and the report write (or the
    * retention sweep), a concurrent outDir reader can observe a
    * missing/stale `mb=` dir until the replayed micro-batch rewrites
    * it — the STATE is never in that window (its appends are the first
    * effect and are overwrite-idempotent).
    */
  def curationStream(stream: DataFrame, idCol: String, keyCols: Seq[String],
      valueCol: String, stateDir: String, outDir: String, checkpoint: String,
      cfg: graft.pipelines.TrainingDataPipeline.Config =
        graft.pipelines.TrainingDataPipeline.Config(),
      keepBatches: Int = 0)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        graft.pipelines.TrainingDataPipeline
          .curateIncrement(df, idCol, keyCols, valueCol, stateDir, batchId,
            cfg,
            // the parquet write below IS this increment's one eager
            // execution (nothing lazy leaves the micro-batch), so the
            // extra checkpoint materialization is skipped
            checkpointResult = false)
          .write.mode("overwrite").parquet(s"$outDir/mb=$batchId")
        pruneOldBatches(df.sparkSession, outDir, batchId, keepBatches)
      }

  /** STREAMING-DRIVEN index maintenance (VERDICT r16 #4) — the
    * [[curationStream]] pattern on the ANN index side: each micro-batch
    * of arriving vectors runs the EXACT batch maintenance verbs —
    * [[graft.ops.Similarity.assignIncrement]] appends the cell-
    * partitioned postings `assign/batch=<mbId>/cid=K` (with
    * `payloadCols` riding along so the state can serve retrieval), and,
    * when `pqCodebook` is given, [[graft.ops.Similarity
    * .pqCodesIncrement]] appends the compressed `codes/batch=<mbId>`
    * rows in the same micro-batch. The exactly-once argument carries
    * over verbatim: Structured Streaming's micro-batch ids are strictly
    * increasing and a failure replay re-runs the SAME id, while both
    * increments require monotone batchIds and are overwrite-idempotent
    * per batch — a replayed micro-batch rewrites exactly its own
    * partitions. The maintained state is immediately servable between
    * micro-batches ([[graft.ops.Similarity.ivfStateTopK]] /
    * `pqAdcFromState`), and [[graft.pipelines.CurationState]] owns its
    * compaction/GC as usual.
    *
    * Empty micro-batches are SKIPPED: a zero-row partitioned write
    * leaves no readable footer, and an empty arrival adds nothing to
    * an index. Pass MATERIALIZED codebook artifacts (a
    * [[graft.core.CodebookStore]] read), not lazy training plans — the
    * version stamps are derived ONCE at stream construction (the
    * codebook is fixed for the query's lifetime) and threaded to every
    * micro-batch's increments.
    *
    * STREAMING STALENESS MONITORING (VERDICT r17 #8): pass `refHist`
    * (the train-time [[graft.ops.Similarity.assignmentCounts]]
    * reference) and a `monitorDir`, and every micro-batch ends with a
    * [[graft.ops.Similarity.codebookStalenessFromHist]] readout of the
    * MAINTAINED state ([[graft.ops.Similarity.assignHistogram]] — an
    * O(state) scan, no corpus access) landing in
    * `monitorDir/ivf/mb=<id>`; with `pqRefHist` (+`pqCodebook`) the
    * [[graft.ops.Similarity.pqCodeStaleness]] readout of the code state
    * lands in `monitorDir/pq/mb=<id>`. A streamed index no longer
    * drifts silently between manual batch checks — the monitor rides
    * the same micro-batch transaction as the increments (a failure
    * replay rewrites both), and a quiet stream (empty micro-batches)
    * writes nothing. `keepBatches` prunes old monitor outputs, the
    * [[driftMonitor]] retention device.
    */
  def indexStream(stream: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, stateDir: String, checkpoint: String,
      payloadCols: Seq[String] = Nil, codebookVersion: String = "",
      pqCodebook: Option[DataFrame] = None, pqCodebookVersion: String = "",
      nSub: Int = 8, subDim: Int = 8,
      refHist: Option[DataFrame] = None,
      pqRefHist: Option[DataFrame] = None,
      monitorDir: String = "", stalenessThreshold: Double = 0.2,
      keepBatches: Int = 0)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    require((refHist.isEmpty && pqRefHist.isEmpty) || monitorDir.nonEmpty,
      "indexStream: a reference histogram needs a monitorDir to land " +
        "readouts in")
    require(pqRefHist.isEmpty || pqCodebook.nonEmpty,
      "indexStream: pqRefHist monitors the pq code state — pass " +
        "pqCodebook too")
    // Monitor-side stamps, derived once at stream construction (the
    // artifacts are fixed for the query's lifetime by contract). The
    // INCREMENTS keep deriving their stamp per micro-batch from the
    // very collect they assign/encode with (pass codebookVersion
    // through unchanged) — that is the invariant that makes a stamp
    // trustworthy: it can never diverge from the geometry that wrote
    // the partition, even if a non-materialized codebook plan shifted
    // mid-stream (in which case the monitor reads an empty current
    // histogram rather than a silently mixed one).
    val ivfVer =
      if (codebookVersion.isEmpty)
        graft.ops.Similarity.codebookVersionOf(centroids)
      else codebookVersion
    val pqVer = pqCodebook.map { cb =>
      if (pqCodebookVersion.isEmpty)
        graft.ops.Similarity.pqCodebookVersionOf(cb)
      else pqCodebookVersion
    }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        if (!df.isEmpty) {
          val spark = df.sparkSession
          graft.ops.Similarity.assignIncrement(df, idCol, vecCol,
            centroids, stateDir, batchId, codebookVersion, payloadCols)
          pqCodebook.foreach { cb =>
            graft.ops.Similarity.pqCodesIncrement(df, idCol, vecCol,
              cb, stateDir, batchId, pqCodebookVersion, nSub, subDim)
          }
          refHist.foreach { rh =>
            val curHist = graft.ops.Similarity
              .assignHistogram(spark, stateDir, ivfVer)
              .select(org.apache.spark.sql.functions.lit("stream")
                .as("scenario"),
                org.apache.spark.sql.functions.col("cid"),
                org.apache.spark.sql.functions.col("n"))
            graft.ops.Similarity.codebookStalenessFromHist(rh, curHist,
                "scenario", centroids, stalenessThreshold)
              .write.mode("overwrite").parquet(s"$monitorDir/ivf/mb=$batchId")
            pruneOldBatches(spark, s"$monitorDir/ivf", batchId, keepBatches)
          }
          pqRefHist.foreach { prh =>
            val curHist = graft.ops.Similarity.pqCodeHistogram(
              graft.ops.Similarity.currentPqCodes(spark, stateDir,
                pqVer.get), nSub)
            graft.ops.Similarity.pqCodeStaleness(prh, curHist,
                pqCodebook.get, stalenessThreshold)
              .write.mode("overwrite").parquet(s"$monitorDir/pq/mb=$batchId")
            pruneOldBatches(spark, s"$monitorDir/pq", batchId, keepBatches)
          }
        }
      }
  }

  /** Stream-static enrichment — join a live entity stream against a
    * feature snapshot (e.g. [[graft.online.Materializer]]'s
    * latest-per-key output): the streaming counterpart of the PIT
    * retrieval's final LEFT JOIN, null-padding entities with no
    * features. Stream-static joins are STATELESS — no watermark, no
    * state store. The static side's FILE LISTING IS PINNED when the
    * streaming query starts (spec-pinned): files appended to the path
    * later are invisible to subsequent micro-batches, and overwriting
    * the path fails the running query with FAILED_READ_FILE. To serve
    * refreshing features, restart the query per snapshot, read a
    * metastore table and REFRESH TABLE it, or use a snapshot-isolated
    * table format; at online-store scale prefer per-partition KV
    * lookups ([[graft.online.KVClientOnlineStore]]) over a join.
    * Broadcast the static side when it is dimension-sized.
    */
  def enrichWithFeatures(
      stream: DataFrame, features: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(features, keys, "left")

  /** Stream-STREAM inner join within a bounded event-time interval —
    * the attribution shape: each right-side event (click) joins the
    * left-side events (impressions) of the same key that precede it by
    * at most `within`. Both sides carry watermarks and the join
    * condition carries BOTH the equality key and the time bound; that
    * pair is what lets Spark's symmetric-hash join state EVICT — each
    * side's buffered rows are dropped once the other side's watermark
    * passes their interval, where an unbounded stream-stream join
    * would grow state forever (the 100 TB/day death sentence).
    * Out-of-order arrivals within the watermark still match: both
    * sides buffer, so a late impression pairs with an already-seen
    * click (spec-pinned).
    *
    * `leftTs`/`rightTs` must be distinct names and the right side must
    * not collide with left columns (the join emits both sides; the
    * duplicate equality key is dropped here, mirroring
    * [[graft.transform.AsOfJoin]]'s collision posture).
    *
    * `joinType = "left_outer"` gives the unconverted-impression shape:
    * matches emit immediately, but an UNMATCHED left row can only emit
    * (null-padded) once the watermark passes the end of its join
    * interval — before that a matching right row could still arrive, so
    * outer results trail the watermark by `within + delay`, typically
    * surfacing a micro-batch later (spec-pinned). This is inherent to
    * event-time outer joins, not an implementation lag. Note the
    * GLOBAL watermark is the MIN across all inputs
    * (`multipleWatermarkPolicy=min`): a quiet input pins it — and with
    * it, every outer emission — in place; production attribution
    * pipelines need idle-input heartbeats or a policy override
    * (spec-pinned via the both-sides drip).
    */
  def joinWithinInterval(
      left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      delay: String = "1 hour", within: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    require(leftTs != rightTs,
      s"rename one side's event-time column ($leftTs collides)")
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinWithinInterval supports inner/left_outer, got $joinType")
    val others = right.columns.filterNot(c => c == key || c == rightTs)
    val clash = others.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty, s"right value columns collide with left: $clash")
    require(!left.columns.contains(rightTs),
      s"left already has a column named $rightTs — the joined output " +
        "would carry duplicate names")
    require(!right.columns.contains(leftTs),
      s"right already has a column named $leftTs — the joined output " +
        "would carry duplicate names")
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    l.join(r, expr(
        s"l.$key = r.$key AND r.$rightTs >= l.$leftTs " +
          s"AND r.$rightTs <= l.$leftTs + INTERVAL $within"), joinType)
      .drop(col(s"r.$key"))
  }

  // ---------------------------------------------------------- stateful
  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(n: Long, total: Double, lastTs: Long)
  final case class SessionSummary(user_id: Long, n: Long, total: Double)

  /** Custom per-key state: running session aggregates with an idle
    * timeout — the `mapGroupsWithState` surface for logic windows can't
    * express (reference has none; this is the scale-path extension).
    *
    * The timeout is REAL state lifecycle, not a pass-through: each
    * update re-arms the key's timeout (`idleGapMs` of idleness —
    * processing-time duration or event-time watermark target, per
    * `timeout`), and a fired timeout emits the key's final summary and
    * REMOVES its state. Without the re-arm + timed-out branch the
    * timeout parameter would be a silent no-op (Spark only schedules a
    * timeout for keys that call setTimeout* inside the function) and
    * per-key state would grow forever on a high-cardinality stream.
    * `EventTimeTimeout` requires a watermark on `events`; a key already
    * trailing the watermark by more than the gap times out at the next
    * trigger (a timeout target must exceed the current watermark).
    */
  def sessionize(
      spark: SparkSession, events: DataFrame,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
      idleGapMs: Long = 30L * 60L * 1000L): DataFrame = {
    import spark.implicits._
    val procTime = timeout == GroupStateTimeout.ProcessingTimeTimeout
    val eventTime = timeout == GroupStateTimeout.EventTimeTimeout
    events.as[SessionEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionSummary](timeout) {
        case (user, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle session closes: final summary out, state DROPPED
            val prev = state.get
            state.remove()
            SessionSummary(user, prev.n, prev.total)
          } else {
            val prev = state.getOption.getOrElse(SessionState(0L, 0.0, 0L))
            var n = prev.n
            var total = prev.total
            var last = prev.lastTs
            it.foreach { e =>
              n += 1; total += e.value
              last = math.max(last, e.ts.getTime)
            }
            state.update(SessionState(n, total, last))
            if (procTime) state.setTimeoutDuration(idleGapMs)
            else if (eventTime) state.setTimeoutTimestamp(
              math.max(last + idleGapMs, state.getCurrentWatermarkMs() + 1L))
            SessionSummary(user, n, total)
          }
      }.toDF()
  }

  /** Spark 4 `transformWithState` twin of [[sessionize]] — the
    * current-generation arbitrary-state API (SPARK-46815, GA in 4.0):
    * a [[org.apache.spark.sql.streaming.StatefulProcessor]] with one
    * composable named `ValueState` per key instead of the single
    * monolithic `GroupState`, RocksDB-backed (the test sets
    * `spark.sql.streaming.stateStore.providerClass` — transformWithState
    * requires the RocksDB provider), and extensible with timers/TTL
    * where the old API offered only a global timeout. Emits the same
    * running per-user (n, total) as the mapGroupsWithState face;
    * StreamingSpec pins the equivalence.
    */
  def sessionizeTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}
    // resolve the state encoder OUTSIDE the processor: an implicitly[]
    // inside the anon class resolves through spark.implicits and makes
    // the processor capture the SparkSession — and a session-capturing
    // TASK closure is a landmine: it serializes fine only until
    // anything registers an Observation on the shared session
    // (ObservationManager is not serializable), at which point every
    // such query dies with "Task not serializable". Capture VALUES,
    // never the session (the KVClient-port rule).
    val stateEnc: org.apache.spark.sql.Encoder[SessionState] =
      implicitly[org.apache.spark.sql.Encoder[SessionState]]
    val proc = new StatefulProcessor[Long, SessionEvent, SessionSummary] {
      @transient private var st: org.apache.spark.sql.streaming.ValueState[SessionState] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[SessionState]("session", stateEnc,
          TTLConfig.NONE)
      override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
          timerValues: TimerValues): Iterator[SessionSummary] = {
        val prev = if (st.exists()) st.get() else SessionState(0L, 0.0, 0L)
        var n = prev.n
        var total = prev.total
        var last = prev.lastTs
        rows.foreach { e =>
          n += 1; total += e.value
          last = math.max(last, e.ts.getTime)
        }
        st.update(SessionState(n, total, last))
        Iterator.single(SessionSummary(user, n, total))
      }
    }
    events.as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState[SessionSummary](proc, TimeMode.None(),
        OutputMode.Update())
      .toDF()
  }
}
