package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import java.nio.file.Files

/** Structured Streaming specs: file-source → windowed gold with
  * watermark, parquet sink round-trip, and custom mapGroupsWithState.
  * Memory sink + processAllAvailable make the streams synchronous.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def writeDrop(dir: String, rows: Seq[(Long, String, Double)]): Unit =
    rows.toDF("user_id", "s", "value")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"), col("value"))
      .coalesce(1).write.mode("append").parquet(dir)

  test("streaming hourly window stats over file drops") {
    val src = Files.createTempDirectory("stream_src").toString
    writeDrop(src, Seq(
      (1L, "2024-01-01 10:05:00", 10.0),
      (1L, "2024-01-01 10:35:00", 30.0),
      (1L, "2024-01-01 11:10:00", 7.0)))

    val schema = spark.read.parquet(src).schema
    val stream = StreamingIngest.readStream(spark, src, schema)
    val agg = StreamingIngest.hourlyWindowStats(stream, "user_id", "ts", "value")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .orderBy("event_timestamp")
        .select("avg_value", "sum_value", "n_events")
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
      assert(got === Seq((20.0, 40.0, 2L), (7.0, 7.0, 1L)))
    } finally q.stop()
  }

  test("streaming parquet sink appends across micro-batches") {
    val src = Files.createTempDirectory("stream_src2").toString
    val out = Files.createTempDirectory("stream_out").toString + "/t"
    val chk = Files.createTempDirectory("stream_chk").toString
    writeDrop(src, Seq((1L, "2024-01-01 10:05:00", 1.0)))

    val schema = spark.read.parquet(src).schema
    val q = StreamingIngest.toParquetSink(
      StreamingIngest.readStream(spark, src, schema), out, chk).start()
    try {
      q.processAllAvailable()
      writeDrop(src, Seq((2L, "2024-01-01 11:00:00", 2.0))) // late drop arrives
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() === 2)
    } finally q.stop()
  }

  test("continuous drift monitor: foreachBatch EMD converges to the batch answer") {
    // the streaming face of q137: a static reference slice, a streamed
    // current slice; each micro-batch recomputes W1 drift over
    // everything ingested so far, and after the last batch the
    // monitor's readout equals the one-shot batch computation exactly
    // (emdByKey is deterministic, so convergence is equality)
    import graft.transform.Stats
    val src = Files.createTempDirectory("drift_src").toString
    val chk = Files.createTempDirectory("drift_chk").toString
    val ref = (0L to 9L).map(("a", _)).toDF("k", "cents")
    writeDrop(src, Seq((1L, "2024-01-01 10:00:00", 0.09))) // cents 9
    val schema = spark.read.parquet(src).schema
    @volatile var last: Map[String, (Long, Long, Long, Option[Double])] = Map.empty
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.Row]()
    val q = graft.streaming.StreamingIngest.readStream(spark, src, schema)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(seen.add)
        val curRows = seen.toArray(Array.empty[org.apache.spark.sql.Row])
          .map(r => ("a", math.floor(r.getDouble(2) * 100 + 0.5).toLong))
        if (curRows.nonEmpty) {
          val cur = curRows.toSeq.toDF("k", "cents")
          last = Stats.emdByKey(ref, cur, Seq("k"), "cents", nBuckets = 10)
            .collect().map(r => r.getString(0) ->
              ((r.getLong(1), r.getLong(2), r.getLong(3),
                Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // second micro-batch: nine more rows, all at cents 9
      writeDrop(src, (2L to 10L).map(i =>
        (i, "2024-01-01 10:01:00", 0.09)))
      q.processAllAvailable()
      // ten current rows all in the top bucket vs uniform ref: the
      // hand-computed q137 fixture — and exactly what the one-shot
      // batch emdByKey returns on the same accumulated data
      val batchAnswer = Stats.emdByKey(ref,
          Seq.fill(10)(("a", 9L)).toDF("k", "cents"), Seq("k"), "cents", 10)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
      assert(last === batchAnswer)
      assert(last("a") === ((10L, 10L, 450L, Some(0.45))))
    } finally q.stop()
  }

  test("streaming incremental LSH dedup: foreachBatch against an accumulating band index") {
    // the streaming face of q164: each micro-batch dedups against the
    // band index of every doc KEPT so far, then kept docs' bands join
    // the index — the crawl-increment loop as a continuous query. The
    // index is only ever (band_idx, band_hash, doc_id) rows, never text.
    import graft.ops.Dedup
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t3 = "completely different content with no overlap whatsoever in shingles at all"
    val t5 = "yet another fully distinct document about spark catalyst plans and codegen"
    val src = Files.createTempDirectory("ilsh_src").toString
    val chk = Files.createTempDirectory("ilsh_chk").toString
    Seq((1L, t1)).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def bandsOf(rows: Seq[(Long, String)]) =
      Dedup.lshBands(Dedup.minhashSignaturesFused(
        rows.toDF("doc_id", "text"), "doc_id", "text"), "doc_id")
    @volatile var indexRows = Seq.empty[(Long, Int, String)] // (doc, band_idx, hash)
    val verdicts = new java.util.concurrent.ConcurrentHashMap[Long, (Long, Long, Long)]()
    val q = graft.streaming.StreamingIngest.readStream(spark, src, schema)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val docs = batch.select("doc_id", "text")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        if (docs.nonEmpty) {
          val idx = indexRows.toDF("doc_id", "band_idx", "band_hash")
          val out = Dedup.incrementalLshDedup(
              docs.toDF("doc_id", "text"), idx, "doc_id", "text")
            .collect().map(r => r.getLong(0) ->
              ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
          out.foreach { case (id, v) => verdicts.put(id, v) }
          val keptIds = out.filter(_._2._3 == 1L).keySet
          indexRows = indexRows ++ bandsOf(docs.filter(d => keptIds(d._1)))
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      // batch 2: a near-dup of the indexed t1, a fresh doc, and a
      // larger-id in-batch near-dup of that fresh doc
      Seq((2L, t1.replace("today", "tomorrow")), (3L, t3),
          (4L, t3.replace("all", "any")))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      // batch 3: a near-dup of batch 2's kept doc, plus a unique doc
      Seq((5L, t3.replace("shingles", "bands")), (6L, t5))
        .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val got = verdicts.asScala.toMap
      assert(got(1L) === ((0L, 0L, 1L)), s"first doc is kept: $got")
      assert(got(2L) === ((1L, 0L, 0L)), s"near-dup of indexed t1: $got")
      assert(got(3L) === ((0L, 0L, 1L)), s"fresh doc kept: $got")
      assert(got(4L) === ((0L, 1L, 0L)), s"in-batch dup of 3: $got")
      assert(got(5L) === ((1L, 0L, 0L)),
        s"near-dup of a doc kept in an EARLIER batch must hit the index: $got")
      assert(got(6L) === ((0L, 0L, 1L)), s"unique doc kept: $got")
      // dropped docs never polluted the index
      assert(indexRows.map(_._1).distinct.sorted === Seq(1L, 3L, 6L))
    } finally q.stop()
  }

  test("streaming DP release equals the batch release exactly — cell-keyed noise is micro-batch-invariant") {
    // the q192 noise depends only on the CELL KEY (type, day), so a
    // streaming release over completed windows and the batch release
    // over the same rows are IDENTICAL — dripped across three
    // micro-batches to prove batch boundaries don't leak into it
    val src = Files.createTempDirectory("dp_src").toString
    def drop(rows: Seq[(String, String)]): Unit =
      rows.toDF("event_type", "s")
        .select(col("event_type"), to_timestamp(col("s")).as("ts"))
        .coalesce(1).write.mode("append").parquet(src)
    drop(Seq(("click", "2024-01-01 10:00:00"), ("click", "2024-01-01 11:00:00"),
      ("view", "2024-01-01 09:00:00")))
    drop(Seq(("click", "2024-01-02 08:00:00"), ("view", "2024-01-01 23:59:59")))
    drop(Seq(("view", "2024-01-02 00:00:00")))

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val agg = stream
      .groupBy(col("event_type"),
        window(col("ts"), "1 day").getField("start").as("day"))
      .count().withColumnRenamed("count", "n")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("dp_stream").start()
    try {
      q.processAllAvailable()
      val noise = graft.Queries.dpNoise(col("event_type"), col("day"))
      val streamed = spark.table("dp_stream")
        .select(col("event_type"), col("day"), col("n"), noise.as("noise"),
          greatest(col("n") + noise, lit(0L)).as("n_noisy"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val batch = spark.read.parquet(src)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("day"), col("n"), noise.as("noise"),
          greatest(col("n") + noise, lit(0L)).as("n_noisy"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(streamed === batch)
      assert(batch.size === 4) // (click, view) × (day1, day2)
      assert(batch.values.forall { case (_, nz, _) => nz >= -8L && nz <= 8L })
    } finally q.stop()
  }

  test("append mode finalizes windows at the watermark and drops late rows") {
    val src = Files.createTempDirectory("stream_src4").toString
    // batch 1: an on-time row plus a far-ahead row that advances the
    // watermark (2h) past the 10:00 window's end
    writeDrop(src, Seq(
      (1L, "2024-01-01 10:05:00", 10.0),
      (2L, "2024-01-01 13:30:00", 1.0)))
    val schema = spark.read.parquet(src).schema
    val agg = StreamingIngest.hourlyWindowStats(
      StreamingIngest.readStream(spark, src, schema), "user_id", "ts", "value")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a LATE row for the already-finalized 10:00 window
      // (10:45 < watermark 11:30) plus another advancer
      writeDrop(src, Seq(
        (1L, "2024-01-01 10:45:00", 99.0),
        (2L, "2024-01-01 16:00:00", 1.0)))
      q.processAllAvailable()
      writeDrop(src, Seq((2L, "2024-01-01 20:00:00", 1.0)))
      q.processAllAvailable()
      val row10 = spark.table("late_out")
        .filter(col("event_timestamp") === to_timestamp(lit("2024-01-01 10:00:00")))
        .collect()
      assert(row10.length === 1, "10:00 window should be emitted exactly once")
      assert(row10(0).getAs[Long]("n_events") === 1L, "late row must be dropped")
      assert(row10(0).getAs[Double]("sum_value") === 10.0)
    } finally q.stop()
  }

  test("latenessProfile sizes the watermark: profile-derived delay keeps the late row, zero delay drops it") {
    val b1 = Seq((1L, "2024-01-01 10:05:00", 1.0), (2L, "2024-01-01 13:30:00", 1.0))
    val b2 = Seq((1L, "2024-01-01 12:40:00", 5.0), (2L, "2024-01-01 16:00:00", 1.0))
    val b3 = Seq((2L, "2024-01-01 20:00:00", 1.0))
    // batch-side: profile the log in ARRIVAL order (q169's operator)
    val all = (b1 ++ b2 ++ b3).zipWithIndex.map {
      case ((u, s, v), i) => (i.toLong, u, s, v)
    }
    val log = all.toDF("seq", "user_id", "s", "value")
      .select(col("seq"), to_timestamp(col("s")).as("ts"), lit("e").as("etype"))
    val maxLateUs = graft.transform.Temporal
      .latenessProfile(log, "seq", "ts", "etype", chunkSize = 2L)
      .agg(max("max_late_us")).head().getLong(0)
    // the 12:40 arrival behind the 13:30 high-watermark
    assert(maxLateUs === 50L * 60L * 1000000L)
    val delayMin = maxLateUs / 60000000L
    // stream the SAME arrival order under both watermark choices
    def run(wm: String, name: String): Long = {
      val dir = Files.createTempDirectory(s"lp_$name").toString
      writeDrop(dir, b1)
      val schema = spark.read.parquet(dir).schema
      val q = StreamingIngest.hourlyWindowStats(
          StreamingIngest.readStream(spark, dir, schema),
          "user_id", "ts", "value", watermark = wm)
        .writeStream.outputMode("append")
        .format("memory").queryName(s"lp_out_$name").start()
      try {
        q.processAllAvailable()
        writeDrop(dir, b2); q.processAllAvailable()
        writeDrop(dir, b3); q.processAllAvailable()
        spark.table(s"lp_out_$name")
          .filter(col("event_timestamp") === to_timestamp(lit("2024-01-01 12:00:00")))
          .agg(coalesce(sum("n_events"), lit(0L))).head().getLong(0)
      } finally q.stop()
    }
    assert(run(s"$delayMin minutes", "sized") === 1L,
      "a delay >= the profiled max lateness must keep the late row")
    assert(run("0 minutes", "zero") === 0L,
      "zero delay must drop the row the profile flagged")
  }

  test("session_window operator equals the batch running-index sessionizer") {
    import org.apache.spark.sql.functions._
    val ev = graft.Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
    // batch formulation: running index over epoch-µs gaps
    val batch = graft.transform.Transforms.sessionize(
      ev.withColumn("us", unix_micros(col("ts"))),
      "user_id", "event_id", "us", gapUs = 1800L * 1000000L)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), count(lit(1)).as("n_events"))
      .select(col("user_id"), col("start_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // built-in session_window on the same events (batch mode)
    val windowed = StreamingIngest.sessionWindows(ev, "user_id", "ts")
      .select(col("user_id"), unix_micros(col("session_start")).as("start_us"),
        col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(windowed === batch,
      s"batch-only=${(batch -- windowed).take(3)} window-only=${(windowed -- batch).take(3)}")
  }

  test("mapGroupsWithState accumulates per-key session state") {
    val src = Files.createTempDirectory("stream_src3").toString
    writeDrop(src, Seq(
      (1L, "2024-01-01 10:00:00", 5.0),
      (1L, "2024-01-01 10:01:00", 7.0),
      (2L, "2024-01-01 10:02:00", 1.0)))
    val schema = spark.read.parquet(src).schema
    val stream = StreamingIngest.readStream(spark, src, schema)
    val sessions = StreamingIngest.sessionize(spark, stream,
      GroupStateTimeout.NoTimeout)
    val q = sessions.writeStream.outputMode("update")
      .format("memory").queryName("sessions_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === Set((1L, 2L, 12.0), (2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionize event-time timeout closes the idle session and drops its state") {
    val src = Files.createTempDirectory("stream_src_to").toString
    writeDrop(src, Seq(
      (1L, "2024-01-01 10:00:00", 5.0),
      (2L, "2024-01-01 10:00:30", 1.0)))
    val schema = spark.read.parquet(src).schema
    val stream = StreamingIngest.readStream(spark, src, schema)
      .withWatermark("ts", "0 seconds")
    val sessions = StreamingIngest.sessionize(spark, stream,
      GroupStateTimeout.EventTimeTimeout, idleGapMs = 10L * 60L * 1000L)
    val q = sessions.writeStream.outputMode("update")
      .format("memory").queryName("sessions_to").start()
    try {
      q.processAllAvailable()
      // key 1 goes idle; key 2 keeps talking far past the gap, which
      // advances the watermark beyond key 1's timeout target...
      writeDrop(src, Seq((2L, "2024-01-01 11:00:00", 2.0)))
      q.processAllAvailable()
      // ...and the NEXT trigger fires the timeout (timeouts are
      // evaluated against the watermark set by the PRIOR micro-batch)
      writeDrop(src, Seq((2L, "2024-01-01 11:01:00", 3.0)))
      q.processAllAvailable()
      val afterTimeout = spark.table("sessions_to")
        .filter(col("user_id") === 1L).count()
      assert(afterTimeout === 2L,
        "the timed-out key must emit its final summary (initial row + " +
          s"timeout row): $afterTimeout")
      // state was REMOVED: the key's next event starts a FRESH session
      // (n=1, its own value) instead of accumulating onto the old one
      writeDrop(src, Seq((1L, "2024-01-01 11:30:00", 9.0)))
      q.processAllAvailable()
      val fresh = spark.table("sessions_to")
        .filter(col("user_id") === 1L)
        .orderBy(col("n")).collect()
        .map(r => (r.getLong(r.fieldIndex("n")),
          r.getDouble(r.fieldIndex("total")))).toSeq
      assert(fresh.contains((1L, 9.0)) && !fresh.contains((2L, 14.0)),
        s"timeout must have dropped the state (fresh session expected): $fresh")
    } finally q.stop()
  }

  test("transformWithState sessionizer (RocksDB) equals the mapGroupsWithState face") {
    // RocksDB is by far the heaviest /tmp writer in the suite (sst
    // upload per micro-batch) and this host's tmpdir shows I/O-level
    // flakiness under full-suite load (checksum errors in unrelated
    // threads; the ImageIO 13x-swing precedent). Two mitigations, both
    // environmental, neither weakening the assertion: the query
    // checkpoints under target/ instead of java.io.tmpdir, and ONE
    // retry from a fresh attempt dir is allowed (the test passes
    // deterministically in isolation — a second consecutive failure is
    // a real regression and still fails the suite).
    // deterministically reproduce the full-suite condition that used to
    // kill this query: one observed action materializes the session's
    // ObservationManager (not serializable), so any task closure that
    // captures the session stops serializing. sessionizeTws's processor
    // must capture only VALUES — this pins it.
    val poison = org.apache.spark.sql.Observation()
    spark.range(1).observe(poison, count(lit(1)).as("n")).collect()
    def attempt(n: Int): Unit = {
      val src = Files.createTempDirectory(s"stream_src_tws$n").toString
      writeDrop(src, Seq(
        (1L, "2024-01-01 10:00:00", 5.0),
        (1L, "2024-01-01 10:01:00", 7.0),
        (2L, "2024-01-01 10:02:00", 1.0)))
      val ckpt = new java.io.File(s"target/tws-ckpt-$n")
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) Option(x.listFiles()).getOrElse(Array.empty).foreach(rm)
        x.delete(); ()
      }
      rm(ckpt)
      val schema = spark.read.parquet(src).schema
      val confKey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(confKey)
      spark.conf.set(confKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val sessions = StreamingIngest.sessionizeTws(spark,
          StreamingIngest.readStream(spark, src, schema))
        val q = sessions.writeStream.outputMode("update")
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .format("memory").queryName(s"tws_out$n").start()
        try {
          q.processAllAvailable()
          // second batch exercises state restore across micro-batches
          writeDrop(src, Seq((1L, "2024-01-01 10:05:00", 3.0)))
          q.processAllAvailable()
          val got = spark.table(s"tws_out$n")
            .groupBy("user_id").agg(max("n").as("n"), max("total").as("total"))
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
          // same accumulation the mapGroupsWithState face produces
          assert(got === Set((1L, 3L, 15.0), (2L, 1L, 1.0)))
        } finally { q.stop(); rm(ckpt) }
      } finally {
        prev match {
          case Some(v) => spark.conf.set(confKey, v)
          case None => spark.conf.unset(confKey)
        }
      }
    }
    try attempt(0)
    catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e
      case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[StreamingSpec] tws attempt 0 hit an environmental error " +
            s"(${e.getClass.getSimpleName}: ${e.getMessage}); retrying once")
        attempt(1)
    }
  }

  test("streaming dedup suppresses in-watermark duplicates, state expires past it") {
    val src = Files.createTempDirectory("stream_src5").toString
    // batch 1: user 1 plus an in-batch duplicate → one survivor
    writeDrop(src, Seq(
      (1L, "2024-01-01 10:00:00", 5.0),
      (1L, "2024-01-01 10:10:00", 6.0)))
    val schema = spark.read.parquet(src).schema
    val deduped = StreamingIngest.dedupWithinWatermark(
      StreamingIngest.readStream(spark, src, schema),
      keyCols = Seq("user_id"), tsCol = "ts", delay = "1 hour")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a duplicate still inside the watermark horizon
      // (suppressed) and a watermark advancer far beyond it
      writeDrop(src, Seq(
        (1L, "2024-01-01 10:30:00", 7.0),
        (2L, "2024-01-01 15:00:00", 1.0)))
      q.processAllAvailable()
      // batch 3: user 1 re-occurs AFTER its state aged out past the
      // watermark (15:00 - 1h = 14:00 > 10:00+) → treated as new
      writeDrop(src, Seq((1L, "2024-01-01 16:00:00", 9.0)))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select(col("user_id"), col("value"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      // exactly one of batch-1's duplicates survives (which one is
      // partition-order-arbitrary — see the operator scaladoc); the
      // batch-2 in-watermark duplicate (7.0) is suppressed; the
      // post-expiry re-occurrence (9.0) is re-admitted
      assert(got.count(_._1 == 1L) === 2,
        s"one in-watermark survivor + one post-expiry re-admit, got $got")
      assert(!got.contains((1L, 7.0)),
        s"in-watermark duplicate must be suppressed: $got")
      assert((got.contains((1L, 5.0)) || got.contains((1L, 6.0)))
        && got.contains((1L, 9.0)) && got.contains((2L, 1.0)), s"$got")
    } finally q.stop()
  }

  test("stream-static enrichment null-pads missing keys; the snapshot is pinned at start") {
    val src = Files.createTempDirectory("stream_src6").toString
    val featDir = Files.createTempDirectory("stream_feat").toString + "/t"
    Seq((1L, 0.9)).toDF("user_id", "score").write.mode("overwrite").parquet(featDir)
    writeDrop(src, Seq(
      (1L, "2024-01-01 10:00:00", 5.0),
      (2L, "2024-01-01 10:01:00", 6.0))) // user 2 has no features
    val schema = spark.read.parquet(src).schema
    val enriched = StreamingIngest.enrichWithFeatures(
      StreamingIngest.readStream(spark, src, schema),
      spark.read.parquet(featDir), keys = Seq("user_id"))
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      // append a feature row for user 2 AFTER the query started: the
      // static side's file listing is pinned, so the next micro-batch
      // must still null-pad user 2 (the documented trade — restart or
      // REFRESH TABLE to pick up new snapshots)
      Seq((2L, 0.4)).toDF("user_id", "score")
        .coalesce(1).write.mode("append").parquet(featDir)
      writeDrop(src, Seq((2L, "2024-01-01 10:05:00", 7.0)))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select(col("user_id"), col("value"), col("score"))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got === Set(
        (1L, 5.0, Some(0.9)), // enriched
        (2L, 6.0, None),      // null-padded: no feature row
        (2L, 7.0, None)))     // appended file invisible to the pinned listing
    } finally q.stop()
  }

  test("stream-stream interval join matches within the window, buffers out-of-order sides") {
    val impDir = Files.createTempDirectory("stream_imp").toString
    val clkDir = Files.createTempDirectory("stream_clk").toString
    // impressions: u1@10:00; clicks: u1@10:10 (within 30m),
    // u1@11:00 (outside), u2@10:05 (no impression yet)
    writeDrop(impDir, Seq((1L, "2024-01-01 10:00:00", 1.0)))
    writeDrop(clkDir, Seq(
      (1L, "2024-01-01 10:10:00", 0.0),
      (1L, "2024-01-01 11:00:00", 0.0),
      (2L, "2024-01-01 10:05:00", 0.0)))
    val schema = spark.read.parquet(impDir).schema
    val imps = StreamingIngest.readStream(spark, impDir, schema)
      .select(col("user_id"), col("ts"), col("value").as("imp_value"))
    val clks = StreamingIngest.readStream(spark, clkDir, schema)
      .select(col("user_id"), col("ts").as("click_ts"))
    val joined = StreamingIngest.joinWithinInterval(
      imps, clks, key = "user_id", leftTs = "ts", rightTs = "click_ts",
      delay = "1 hour", within = "30 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_out").start()
    try {
      q.processAllAvailable()
      def rows() = spark.table("attrib_out")
        .select(col("user_id"), col("ts").cast("string"),
          col("click_ts").cast("string"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows() === Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00")))
      // the u2 impression arrives AFTER its click was processed: both
      // sides buffer within the watermark, so the pair still emits
      writeDrop(impDir, Seq((2L, "2024-01-01 10:00:00", 2.0)))
      q.processAllAvailable()
      assert(rows() === Set(
        (1L, "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
        (2L, "2024-01-01 10:00:00", "2024-01-01 10:05:00")))
      // duplicate key column was dropped; both event times survive
      assert(spark.table("attrib_out").columns.count(_ == "user_id") === 1)
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER: matches emit now, unmatched only after the watermark closes their interval") {
    val impDir = Files.createTempDirectory("stream_imp2").toString
    val clkDir = Files.createTempDirectory("stream_clk2").toString
    writeDrop(impDir, Seq(
      (1L, "2024-01-01 10:00:00", 1.0),   // will match
      (2L, "2024-01-01 10:02:00", 2.0)))  // never matches
    writeDrop(clkDir, Seq((1L, "2024-01-01 10:10:00", 0.0)))
    val schema = spark.read.parquet(impDir).schema
    val imps = StreamingIngest.readStream(spark, impDir, schema)
      .select(col("user_id"), col("ts"), col("value").as("imp_value"))
    val clks = StreamingIngest.readStream(spark, clkDir, schema)
      .select(col("user_id"), col("ts").as("click_ts"))
    val joined = StreamingIngest.joinWithinInterval(
      imps, clks, key = "user_id", leftTs = "ts", rightTs = "click_ts",
      delay = "10 minutes", within = "30 minutes", joinType = "left_outer")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("attrib_outer").start()
    try {
      q.processAllAvailable()
      def rows() = spark.table("attrib_outer")
        .select(col("user_id"),
          col("click_ts").cast("string"))
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      // u1 matched immediately; u2's interval [10:02, 10:32] is still
      // open (watermark = 10:10 - 10m), so no null row yet
      assert(rows() === Set((1L, Some("2024-01-01 10:10:00"))))
      // push the watermark past 10:32 with late unrelated events on
      // BOTH inputs (the global watermark is the MIN across inputs —
      // advancing only one side pins it); the null-padded row may
      // trail by a micro-batch — drip and drain
      var attempt = 0
      while (!rows().contains((2L, None)) && attempt < 5) {
        writeDrop(impDir, Seq(
          (98L, s"2024-01-01 11:0$attempt:00", 0.0)))
        writeDrop(clkDir, Seq(
          (99L, s"2024-01-01 11:0$attempt:00", 0.0)))
        q.processAllAvailable()
        attempt += 1
      }
      assert(rows().contains((2L, None)),
        s"unmatched impression never emitted: ${rows()}")
      // and the match did not duplicate
      assert(rows().count(_._1 == 1L) === 1)
    } finally q.stop()
  }

  test("streaming drift monitor == batch driftIncrement on the same arrivals; degraded batch alarms") {
    import graft.pipelines.TrainingDataPipeline
    val src = Files.createTempDirectory("driftm_src").toString
    val chk = Files.createTempDirectory("driftm_chk").toString
    val state = Files.createTempDirectory("driftm_state").toString
    val out = Files.createTempDirectory("driftm_out").toString
    val mix = Seq(50, 130, 200, 260, 350)
    def arrival(b: Int, lens: Seq[Int]) =
      lens.zipWithIndex.map { case (l, i) => (b * 100L + i, "x" * l) }
        .toDF("doc_id", "text")
    val arrivals = Seq(
      arrival(0, mix ++ mix), arrival(1, mix ++ mix),
      arrival(2, Seq.fill(10)(10))) // degraded: the broken-crawl drop
    // drop batch 0 BEFORE starting so micro-batch ids match arrival ids
    arrivals.head.coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingIngest.driftMonitor(
      StreamingIngest.readStream(spark, src, schema),
      "text", state, out, chk, keepBatches = 2).start()
    try {
      q.processAllAvailable()
      arrivals(1).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      arrivals(2).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    // retention: keepBatches=2 pruned mb=0 (the empty batch-0 curve);
    // the HISTOGRAM state keeps all three (it is the PSI reference)
    val outDirs = new java.io.File(out).listFiles()
      .map(_.getName).filter(_.startsWith("mb=")).sorted.toSeq
    assert(outDirs === Seq("mb=1", "mb=2"), s"curve retention: $outDirs")
    val histDirs = new java.io.File(s"$state/lenhist").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(histDirs === Seq("batch=0", "batch=1", "batch=2"),
      s"histogram state must be retained: $histDirs")
    val streamed = spark.read.parquet(out).drop("mb")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    // the batch reference: same arrivals through ingestDriftAudit
    val batch = TrainingDataPipeline.ingestDriftAudit(arrivals, "text")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed === batch,
      "the streaming monitor must equal the batch operator on the same arrivals")
    // and the degraded micro-batch alarms
    val alarms = spark.read.parquet(out)
      .groupBy(col("batch")).agg(max(col("drift")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alarms === Map(1L -> 0L, 2L -> 1L), s"alarm map: $alarms")
  }

  test("streaming-driven curation == batch-driven curateIncrement on planted cross-micro-batch near-dups") {
    import graft.pipelines.TrainingDataPipeline
    val baseA = "the quick brown fox jumps over the lazy dog and runs far " +
      "into the deep woods while the old owl watches from a tall tree and " +
      "the river flows past the quiet village under a bright morning sun today"
    val baseB = "a small ship sails on the wide sea and the crew looks to " +
      "the far shore where the light of the tower glows in the dark night " +
      "and the waves roll under the cold wind as it drifts along slowly"
    // three arrival drops; near/exact dups deliberately CROSS drops so
    // the streaming state (band index + fingerprint history) is load-
    // bearing, plus a gate reject and an in-drop near dup
    val drops = Seq(
      Seq((0L, baseA, "web"), (1L, baseB, "web")),
      Seq((2L, baseA, "pdf"),                            // exact dup of 0
        (3L, baseB.replace("crew", "sailor"), "pdf"),    // near dup of 1
        (4L, "tiny", "web")),                            // gate reject
      Seq((5L, baseA.replace("lazy", "sleepy"), "web"),  // near dup of 0
        (6L, "a brand new clean document with plenty of fresh tokens " +
          "to pass the gate easily today", "web"),
        (7L, "a brand new clean document with plenty of fresh tokens " +
          "to pass the gate easily herein", "web"))      // in-drop near dup
    ).map(_.toDF("doc_id", "text", "source"))
    val src = Files.createTempDirectory("cur_src").toString
    val chk = Files.createTempDirectory("cur_chk").toString
    val state = Files.createTempDirectory("cur_state").toString
    val out = Files.createTempDirectory("cur_out").toString
    // drop 0 lands BEFORE start so micro-batch ids match arrival ids
    drops.head.coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingIngest.curationStream(
      StreamingIngest.readStream(spark, src, schema),
      "doc_id", Seq("source"), "n_tokens", state, out, chk).start()
    try {
      q.processAllAvailable()
      drops(1).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      drops(2).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    // the batch reference: the same slices through curateIncrement
    val bState = Files.createTempDirectory("cur_bstate").toString
    val batchRolls = drops.zipWithIndex.map { case (d, b) =>
      TrainingDataPipeline.curateIncrement(d, "doc_id", Seq("source"),
        "n_tokens", bState, b.toLong).withColumn("mb", lit(b.toLong))
    }.reduce(_ unionByName _).collect().map(_.toSeq).sortBy(_.toString).toSeq
    val streamed = spark.read.parquet(out)
      .withColumn("mb", col("mb").cast("long"))
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(streamed === batchRolls,
      "streaming-driven rollups must equal batch-driven per-arrival rollups")
    // the persisted STATE matches table-for-table (decisions included)
    for (t <- graft.pipelines.CurationState.CurationTables) {
      val sRows = spark.read.parquet(s"$state/$t")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val bRows = spark.read.parquet(s"$bState/$t")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(sRows === bRows, s"state table $t diverged under streaming")
    }
    // and the cross-micro-batch evidence actually fired: exact dup of a
    // drop-0 doc, near dups of drop-0/1 docs, in-drop near dup, gate
    val led = spark.read.parquet(s"$state/ledger")
      .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
        r.getString(r.fieldIndex("reason"))).toMap
    assert(led === Map(2L -> "exact_dup", 3L -> "near_dup",
      4L -> "gate", 5L -> "near_dup", 7L -> "near_dup"), s"ledger: $led")
  }

  test("streaming-driven index maintenance == batch increments table-for-table; state serves retrieval") {
    import graft.ops.Similarity
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    // MATERIALIZED codebooks (the indexStream contract): lazy training
    // plans would re-run per micro-batch stamp
    val cents = Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3)
      .localCheckpoint(true)
    val cb = Similarity.lloydPqCodebook(e, "vec_id", "embedding")
      .localCheckpoint(true)
    val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
    val width = maxId / 3 + 1
    val slices = (0L until 3L).map(b =>
      e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width))
    val src = Files.createTempDirectory("idx_src").toString
    val chk = Files.createTempDirectory("idx_chk").toString
    val state = Files.createTempDirectory("idx_state").toString
    val mon = Files.createTempDirectory("idx_mon").toString
    // streaming staleness monitor references, persisted at train time
    val refHist = Similarity.assignmentCounts(e, "vec_id", "embedding",
      cents).localCheckpoint(true)
    val pqRefHist = Similarity.pqCodeHistogram(
      Similarity.pqCodes(e, "vec_id", "embedding", codebook = Some(cb)))
      .localCheckpoint(true)
    // a fourth, DRIFTED drop (fresh ids, component-sorted vectors — the
    // q240 mass-moving perturbation): the monitor must flip exactly here
    val drifted = e.select((col("vec_id") + maxId + 1000L).as("vec_id"),
      array_sort(col("embedding")).as("embedding"))
      .filter(col("vec_id") < maxId + 1000L + width)
      .localCheckpoint(true)
    val allDrops = slices :+ drifted
    // slice 0 lands BEFORE start so micro-batch ids match arrival ids;
    // drips coalesce(1) — multi-part drops race a running source
    slices.head.coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = StreamingIngest.indexStream(
      StreamingIngest.readStream(spark, src, schema),
      "vec_id", "embedding", cents, state, chk,
      payloadCols = Seq("embedding"), pqCodebook = Some(cb),
      refHist = Some(refHist), pqRefHist = Some(pqRefHist),
      monitorDir = mon).start()
    try {
      q.processAllAvailable()
      slices(1).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      slices(2).coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
      drifted.coalesce(1).write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    // batch reference: the same slices through the batch verbs
    val bState = Files.createTempDirectory("idx_bstate").toString
    allDrops.zipWithIndex.foreach { case (s, b) =>
      Similarity.assignIncrement(s, "vec_id", "embedding", cents,
        bState, b.toLong, payloadCols = Seq("embedding"))
      Similarity.pqCodesIncrement(s, "vec_id", "embedding", cb,
        bState, b.toLong)
    }
    for (t <- Seq("assign", "codes")) {
      def rows(d: String) = spark.read.parquet(s"$d/$t")
        .withColumn("batch", col("batch").cast("long"))
        .collect().map(_.toSeq.map {
          case s: Seq[_] => s.toString
          case x => x
        }).sortBy(_.toString).toSeq
      assert(rows(state) === rows(bState),
        s"index state table $t diverged under streaming")
    }
    // the stream-maintained state is immediately servable, and equals
    // a serve off the batch-maintained state
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
    def serve(d: String) = Similarity.ivfStateTopK(spark, d, queries,
      "vec_id", "embedding", cents, k = 5, nprobe = 8)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(serve(state).nonEmpty && serve(state) === serve(bState),
      "serving off the stream-maintained state diverged")
    // STREAMING STALENESS MONITOR (VERDICT r17 #8): one readout per
    // non-empty micro-batch, nothing else (a quiet stream is silent)
    for (side <- Seq("ivf", "pq")) {
      val mbs = new java.io.File(s"$mon/$side").listFiles()
        .map(_.getName).filter(_.startsWith("mb=")).sorted.toSeq
      assert(mbs === (0 to 3).map(i => s"mb=$i"),
        s"$side monitor must emit exactly one readout per micro-batch: $mbs")
    }
    // after the three undrifted drops the state IS the reference corpus:
    // PSI exactly 0 on every cell, trigger silent...
    val quietIvf = spark.read.parquet(s"$mon/ivf/mb=2").collect()
    assert(quietIvf.nonEmpty && quietIvf.forall(r =>
      r.getDouble(r.fieldIndex("contrib")) == 0.0 &&
        r.getLong(r.fieldIndex("stale")) == 0L),
      "undrifted stream must read PSI exactly 0")
    val quietPq = spark.read.parquet(s"$mon/pq/mb=2").collect()
    assert(quietPq.nonEmpty && quietPq.forall(r =>
      r.getLong(r.fieldIndex("stale")) == 0L),
      "undrifted stream must leave the pq monitor silent")
    // ...and the planted drift flips the flag at EXACTLY its micro-batch
    def stale(p: String) = spark.read.parquet(p).collect()
      .map(r => r.getLong(r.fieldIndex("stale"))).max
    assert(stale(s"$mon/ivf/mb=3") === 1L,
      "drifted drop must flip the ivf staleness flag at its micro-batch")
    assert(stale(s"$mon/pq/mb=3") === 1L,
      "drifted drop must flip the pq staleness flag at its micro-batch")
    // the streamed readout equals the batch monitor computed from the
    // batch-maintained state — monitor ≡ batch, like the state itself
    val ver = Similarity.codebookVersionOf(cents)
    val batchIvf = Similarity.codebookStalenessFromHist(refHist,
        Similarity.assignHistogram(spark, bState, ver)
          .select(lit("stream").as("scenario"), col("cid"), col("n")),
        "scenario", cents)
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(spark.read.parquet(s"$mon/ivf/mb=3")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq === batchIvf,
      "streamed staleness readout diverged from the batch monitor")
  }

  test("streaming->online freshness loop: the audit sees the stream's watermark advance over the loopback KV") {
    import graft.core.{Feature, FeatureView, SparkSource}
    import graft.online.{KVClientOnlineStore, OnlineFreshness, StreamingMaterializer}
    import graft.online.LoopbackKVSpec.{LineKVServer, TcpKVClient}
    import org.apache.spark.sql.types.DoubleType
    val server = new LineKVServer()
    try {
      val port = server.port // capture the PORT, not the server (CLAUDE.md)
      val store = new KVClientOnlineStore(() => new TcpKVClient(port))
      val view = FeatureView("fv", Seq("key"),
        Seq(Feature("v", DoubleType)),
        SparkSource("s", "unused", timestampField = "event_ts"))
      val src = Files.createTempDirectory("ofresh_src").toString
      val chk = Files.createTempDirectory("ofresh_chk").toString
      def drop(rows: (String, String, Double)*): Unit =
        rows.toSeq.toDF("key", "s", "v")
          .select(col("key"), to_timestamp(col("s")).as("event_ts"), col("v"))
          .coalesce(1).write.mode("append").parquet(src)
      drop(("a", "2024-01-01 10:00:00", 1.0), ("b", "2024-01-01 10:00:00", 2.0))
      val schema = spark.read.parquet(src).schema
      val q = StreamingMaterializer.stream(spark,
        spark.readStream.schema(schema).parquet(src),
        store, view, Seq("key"), chk).start()
      try {
        q.processAllAvailable()
        val expected = Seq("a", "b", "c").toDF("key")
        def auditMap() = OnlineFreshness
          .audit(spark, store, "fv", Seq("key"), expected, slaHours = 24L)
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
              Option(r.get(3)).map(_.asInstanceOf[Long]),
              r.getLong(4))).toMap
        val a1 = auditMap()
        // delivered keys are at the watermark; the never-delivered key is
        // the coverage hole only the point-lookup audit can see
        assert(a1("a") === ((1L, a1("a")._2, Some(0L), 0L)))
        assert(a1("b")._3 === Some(0L) && a1("b")._4 === 0L)
        assert(a1("c") === ((0L, None, None, 1L)))
        val wm1 = a1("a")._2.get
        // 48h later the stream delivers a and (for the first time) c —
        // the audit's watermark must ADVANCE and b must go stale
        drop(("a", "2024-01-03 10:00:00", 10.0), ("c", "2024-01-03 10:00:00", 7.0))
        q.processAllAvailable()
        val a2 = auditMap()
        val wm2 = a2("a")._2.get
        assert(wm2 === wm1 + 48L * 3600L * 1000000L,
          "audit must see the stream's watermark advance")
        assert(a2("a")._4 === 0L && a2("c")._4 === 0L)
        assert(a2("b") === ((1L, Some(wm1), Some(48L), 1L)),
          "the undelivered key must lag the advanced watermark past the SLA")
        // sub-hour cadence: a 59-minute drop advances the watermark to a
        // non-hour-aligned instant — lag_hours is FLOOR division, so c
        // (59 min behind) must read 0 and b must still read 48 (48h59m)
        drop(("a", "2024-01-03 10:59:00", 11.0))
        q.processAllAvailable()
        val a3 = auditMap()
        assert(a3("a")._2 === Some(wm2 + 59L * 60L * 1000000L),
          "watermark must advance by the sub-hour drop")
        assert(a3("c") === ((1L, Some(wm2), Some(0L), 0L)),
          "a 59-minute lag must truncate to 0 hours, not round up")
        assert(a3("b")._3 === Some(48L) && a3("b")._4 === 1L,
          "48h59m must floor to 48, not round to 49")
        // and two minutes later the same key crosses the hour boundary
        drop(("a", "2024-01-03 11:01:00", 12.0))
        q.processAllAvailable()
        val a4 = auditMap()
        assert(a4("c")._3 === Some(1L),
          "a 61-minute lag must truncate to exactly 1 hour")
        assert(a4("b")._3 === Some(49L))
      } finally q.stop()
    } finally server.close()
  }
}
