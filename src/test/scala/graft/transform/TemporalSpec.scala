package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Hand-computed pins for [[Temporal.gapFill]] (segment-emit
  * formulation vs the textbook grid-join semantics) and
  * [[Temporal.scd2]] (run-length versioning), plus seeded random
  * equivalence against driver-side references.
  */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("gapFill: dense grid, forward fill, gap flags — hand case") {
    // key A observes hours 0 (v=10) and 3 (v=30); key B only hour 2 (v=7)
    val obs = Seq((1L, ts(0), 10L), (1L, ts(3), 30L), (2L, ts(2), 7L))
      .toDF("user_id", "hour", "cents")
    val out = Temporal.gapFill(obs, "user_id", "hour", "cents")
      .orderBy("user_id", "hour")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(13),
        r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01 00", 10L, 10L, 0),
      (1L, "2024-01-01 01", 0L, 10L, 1),
      (1L, "2024-01-01 02", 0L, 10L, 1),
      (1L, "2024-01-01 03", 30L, 30L, 0),
      (2L, "2024-01-01 02", 7L, 7L, 0)))
  }

  test("gapFill: maxCarrySteps TTL truncates long segments") {
    val obs = Seq((1L, ts(0), 10L), (1L, ts(9), 90L)).toDF("user_id", "hour", "cents")
    val out = Temporal.gapFill(obs, "user_id", "hour", "cents", "1 hour",
      maxCarrySteps = 2L)
      .orderBy("hour").collect()
      .map(r => (r.getTimestamp(1).toString.take(13), r.getLong(3), r.getInt(4)))
    // hour 0 carries into 1 and 2, then dark until the hour-9 observation
    assert(out.toSeq === Seq(
      ("2024-01-01 00", 10L, 0), ("2024-01-01 01", 10L, 1),
      ("2024-01-01 02", 10L, 1), ("2024-01-01 09", 90L, 0)))
    intercept[IllegalArgumentException] {
      Temporal.gapFill(obs, "user_id", "hour", "cents", "2 hours", maxCarrySteps = 1L)
        .collect()
    }
  }

  test("gapFill: equals the grid-join reference on seeded random series") {
    val rnd = new scala.util.Random(77)
    val obs = (for {
      k <- 1 to 12
      hours = rnd.shuffle((0 until 40).toList).take(1 + rnd.nextInt(12)).sorted
      h <- hours
    } yield (k.toLong, ts(h % 24), (h * 100 + k).toLong))
      .distinct
    // same (key,bucket) only once
    val byKey = obs.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val df = byKey.toDF("user_id", "hour", "cents")
    val got = Temporal.gapFill(df, "user_id", "hour", "cents")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSet
    // driver reference: textbook grid + forward fill
    val ref = byKey.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(_._2.getTime)
      val lo = sorted.head._2.getTime
      val hi = sorted.last._2.getTime
      val byBucket = sorted.map(r => r._2.getTime -> r._3).toMap
      (lo to hi by 3600000L).scanLeft((0L, 0L, false)) { case ((_, fill, _), t) =>
        byBucket.get(t) match {
          case Some(v) => (t, v, true)
          case None    => (t, fill, false)
        }
      }.drop(1).map { case (t, fill, isObs) =>
        (k, new Timestamp(t), if (isObs) byBucket(t) else 0L, fill, if (isObs) 0 else 1)
      }
    }.toSet
    assert(got === ref)
  }

  test("scd2: run collapse, intervals, open sentinel — hand case") {
    val ev = Seq(
      (1L, "view", ts(0), 1L), (1L, "view", ts(1), 2L),
      (1L, "click", ts(2), 3L), (1L, "view", ts(3), 4L),
      (2L, "purchase", ts(5), 5L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Temporal.scd2(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("user_id", "version").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
    def us(h: Int): Long = ts(h).getTime * 1000L
    assert(out.toSeq === Seq(
      (1L, 1L, "view", us(0), 2L, us(2), 0),
      (1L, 2L, "click", us(2), 1L, us(3), 0),
      (1L, 3L, "view", us(3), 1L, -1L, 1),
      (2L, 1L, "purchase", us(5), 1L, -1L, 1)))
  }

  test("transitionMatrix: hand-counted pairs and exact shares") {
    val ev = Seq(
      (1L, "view", ts(0), 1L), (1L, "click", ts(1), 2L),
      (1L, "view", ts(2), 3L), (1L, "click", ts(3), 4L),
      (2L, "view", ts(0), 5L), (2L, "buy", ts(1), 6L),
      (3L, "view", ts(7), 7L)) // single event: no pair
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Temporal.transitionMatrix(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("from_type", "to_type").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // from view: ->click x2, ->buy x1 (n_from=3); from click: ->view x1
    assert(out.toSeq === Seq(
      ("click", "view", 1L, 1L, 1.0),
      ("view", "buy", 1L, 3L, 1.0 / 3.0),
      ("view", "click", 2L, 3L, 2.0 / 3.0)))
  }

  test("scd2: consecutive runs opening at the SAME microsecond close deterministically") {
    // attr flips between two events at an identical timestamp (tie
    // broken by event_id): version order must drive the closing lead,
    // not valid_from_us (equal for both runs)
    val ev = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(0), 2L), (1L, "b", ts(1), 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = Temporal.scd2(ev, "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(5), r.getInt(6)))
    val t0 = ts(0).getTime * 1000L
    assert(out.toSeq === Seq(
      (1L, "a", t0, t0, 0),   // closed AT its own open instant by run 2
      (2L, "b", t0, -1L, 1))) // the true open version
  }

  test("interpolateLinear: rising, falling, and non-multiple segments — hand case") {
    // rise 100->400 over 3h: 200, 300; fall 400->100 next 3h (mirror
    // spelling): 300, 200; non-multiple 0->3 over 2h: floor(1.5)=1
    val obs = Seq(
      (1L, ts(0), 100L), (1L, ts(3), 400L), (1L, ts(6), 100L),
      (2L, ts(0), 0L), (2L, ts(2), 3L))
      .toDF("user_id", "hour", "cents")
    val out = Temporal.interpolateLinear(obs, "user_id", "hour", "cents")
      .orderBy("user_id", "hour").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.take(13),
        r.getLong(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      (1L, "2024-01-01 00", 100L, 0),
      (1L, "2024-01-01 01", 200L, 1),
      (1L, "2024-01-01 02", 300L, 1),
      (1L, "2024-01-01 03", 400L, 0),
      (1L, "2024-01-01 04", 300L, 1),
      (1L, "2024-01-01 05", 200L, 1),
      (1L, "2024-01-01 06", 100L, 0),
      (2L, "2024-01-01 00", 0L, 0),
      (2L, "2024-01-01 01", 1L, 1),
      (2L, "2024-01-01 02", 3L, 0)))
  }

  test("interpolateLinear: maxSpanSteps valve only removes synthesized cells") {
    val obs = Seq((1L, ts(0), 10L), (1L, ts(2), 30L), (1L, ts(8), 90L))
      .toDF("user_id", "hour", "cents")
    val full = Temporal.interpolateLinear(obs, "user_id", "hour", "cents")
      .collect().map(r => (r.getTimestamp(1).toString.take(13), r.getLong(2))).toMap
    val gated = Temporal.interpolateLinear(obs, "user_id", "hour", "cents",
      maxSpanSteps = 3L)
      .collect().map(r => (r.getTimestamp(1).toString.take(13), r.getLong(2), r.getInt(3)))
    // the 0->2h segment (2 steps) survives interpolated; the 2->8h
    // segment (6 steps > 3) collapses to its opening observation
    assert(gated.map(_._1).sorted.toSeq === Seq(
      "2024-01-01 00", "2024-01-01 01", "2024-01-01 02", "2024-01-01 08"))
    gated.foreach { case (h, v, _) => assert(full(h) === v, h) }
  }

  test("interpolateLinear equals a driver-side bracket interpolation on seeded data") {
    val rnd = new scala.util.Random(17)
    val obs = (1 to 4).flatMap { k =>
      (0 until 40).filter(_ => rnd.nextInt(3) == 0)
        .map(h => (k.toLong, ts(h), rnd.nextInt(1000).toLong))
    }
    val df = obs.toDF("user_id", "hour", "cents")
    val got = Temporal.interpolateLinear(df, "user_id", "hour", "cents")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val want = obs.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val pts = rows.map(r => (r._2.getTime, r._3)).sortBy(_._1)
      pts.sliding(2).toSeq.flatMap {
        case Seq((t0, v0), (t1, v1)) =>
          (t0 until t1 by 3600000L).map { h =>
            val v =
              if (h == t0) v0
              else if (v1 >= v0) v0 + ((v1 - v0) * (h - t0)) / (t1 - t0)
              else v1 + ((v0 - v1) * (t1 - h)) / (t1 - t0)
            (k, h, v)
          }
        case Seq((t0, v0)) => Seq((k, t0, v0))
      } :+ ((k, pts.last._1, pts.last._2))
    }.distinct.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("purgedTimeFolds: hand-computed blocks, embargo, and train counts") {
    // 10 points at µs 0..9, k=2, embargo 2µs: span=10, end_0=5, end_1=10
    // fold0: t 0-4 (5 val), embargo [5,7) = 2, train = 10-5-2 = 3
    // fold1: t 5-9 (5 val), embargo [10,12) = 0, train = 5
    val viaMicros = (0L until 10L).map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val out = Temporal.purgedTimeFolds(viaMicros, "ts", 2, 2L)
      .orderBy("fold").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (0L, 0L, 5L, 5L, 2L, 3L),
      (1L, 5L, 10L, 5L, 0L, 5L)))
  }

  test("purgedTimeFolds: every row lands in exactly one fold; counts are consistent") {
    val rnd = new scala.util.Random(23)
    val us = (1 to 500).map(_ => rnd.nextInt(1000000).toLong)
    val df = us.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val out = Temporal.purgedTimeFolds(df, "ts", 5, 10000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.map(_._4).sum === 500L, "val counts partition the data")
    out.foreach { case (_, s, e, nv, ne, nt) =>
      assert(us.count(t => t >= s && t < e) === nv)
      assert(us.count(t => t >= e && t < e + 10000L) === ne)
      assert(nt === 500L - nv - ne)
    }
    // blocks tile the span without overlap
    val sorted = out.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Array((_, _, e0, _, _, _), (_, s1, _, _, _, _)) => assert(e0 === s1)
      case _ => ()
    }
  }

  test("windowedFunnel: stage windows expire — hand case via a temp events table") {
    // u1 full funnel in-window; u2 click too late; u3 no view;
    // u4 click ok, purchase 65min after click (out)
    val mins = (m: Int) => new Timestamp(m * 60000L)
    val ev = Seq(
      (1L, 1L, "view", mins(0)), (2L, 1L, "click", mins(30)),
      (3L, 1L, "purchase", mins(80)),
      (4L, 2L, "view", mins(0)), (5L, 2L, "click", mins(90)),
      (6L, 3L, "click", mins(0)),
      (7L, 4L, "view", mins(0)), (8L, 4L, "click", mins(10)),
      (9L, 4L, "purchase", mins(75)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.Queries.windowedFunnel(spark, dir).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3))
      === ((4L, 3L, 2L, 1L)))
  }

  test("scd2: equals a driver-side fold on seeded random logs") {
    val rnd = new scala.util.Random(99)
    val types = Seq("a", "b", "c")
    val ev = (1 to 400).map { i =>
      ((rnd.nextInt(8) + 1).toLong, types(rnd.nextInt(3)), ts(rnd.nextInt(24)), i.toLong)
    }
    val got = Temporal.scd2(ev.toDF("user_id", "event_type", "ts", "event_id"),
      "user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6)))
      .toSet
    val ref = ev.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._3.getTime, r._4))
      // collapse consecutive equal attrs into (attr, firstUs, count) runs
      val runs = sorted.foldLeft(Vector.empty[(String, Long, Long)]) { (acc, r) =>
        val us = r._3.getTime * 1000L
        acc.lastOption match {
          case Some((attr, from, n)) if attr == r._2 =>
            acc.init :+ ((attr, from, n + 1))
          case _ => acc :+ ((r._2, us, 1L))
        }
      }
      runs.zipWithIndex.map { case ((attr, from, n), i) =>
        val to = if (i + 1 < runs.length) runs(i + 1)._2 else -1L
        (k, (i + 1).toLong, attr, from, n, to, if (to == -1L) 1 else 0)
      }
    }.toSet
    assert(got === ref)
  }

  test("seasonalProfile: matches an exact-integer driver reference; flat series is zero") {
    import spark.implicits._
    // 60 hourly points per key; key "flat" constant, key "wave" has a
    // deterministic spike pattern
    def cents(key: String, h: Long): Long =
      if (key == "flat") 500L else 500L + (if (h % 24 == 5) 240L else 0L)
    val rows = for (k <- Seq("flat", "wave"); h <- 0L until 60L)
      yield (k, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(h * 3600)),
        cents(k, h) / 100.0)
    val got = Temporal.seasonalProfile(rows.toDF("k", "ts", "v"),
      Seq("k"), "ts", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    // full key × 24 grid always emitted; zero-coverage hours are
    // explicit (0, 0, NULL)
    assert(got.size === 48)
    // driver reference: same centered-24 integer arithmetic
    val ref = (for (k <- Seq("flat", "wave")) yield {
      val c = (0L until 60L).map(h => cents(k, h))
      (11 to 47).map { i => // full windows: 11 before, 12 after
        val tsum = ((i - 11) to (i + 12)).map(j => c(j.toInt)).sum
        (k, i.toLong % 24, c(i.toInt) * 24 - tsum)
      }
    }).flatten.groupBy(t => (t._1, t._2)).map { case (key, ts) =>
      val num = ts.map(_._3).sum
      key -> ((ts.size.toLong, num, Some(num.toDouble / (24.0 * ts.size))))
    }
    ref.foreach { case (key, exp) => assert(got(key) === exp, s"at $key") }
    got.filterNot(kv => ref.contains(kv._1)).values
      .foreach(v => assert(v === ((0L, 0L, None))))
    // flat series: every residual is exactly zero
    got.filter(_._1._1 == "flat").values
      .foreach { case (_, num, s) =>
        assert(num === 0L && s.forall(_ === 0.0)) }
    // the spike hour carries the max positive seasonal for "wave"
    val waveMax = got.filter(_._1._1 == "wave")
      .maxBy(_._2._3.getOrElse(Double.NegativeInfinity))
    assert(waveMax._1._2 === 5L)
  }

  test("seasonalProfile drops spliced windows across an idle-hour gap") {
    import spark.implicits._
    // 61 hourly points with hour 30 missing: any 24-row frame spanning
    // the gap splices two days and must be rejected by the span check.
    // Surviving windows: centers 11..17 before the gap (7) and
    // centers at hours 42..48 after it (7).
    val rows = ((0L until 30L) ++ (31L until 61L)).map(h =>
      ("k", java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(h * 3600)), 5.0))
    val got = Temporal.seasonalProfile(rows.toDF("k", "ts", "v"),
      Seq("k"), "ts", "v")
    assert(got.agg(sum(col("n_windows"))).collect().head.getLong(0) === 14L)
    // flat values: every surviving window is exactly detrended
    assert(got.agg(sum(col("seasonal_num"))).collect().head.getLong(0) === 0L)
  }

  test("latenessProfile chunked scan == naive global running max, chunk boundaries included") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // arrival sequence 0..99 with event-times scrambled so late rows
    // exist INSIDE chunks and ACROSS chunk boundaries (chunkSize = 8)
    val rnd = new scala.util.Random(7)
    val rows = (0L until 100L).map { seq =>
      val base = seq * 60L // one minute per arrival
      val jitter = rnd.nextInt(7200) - 3600 // +/- 1h event-time noise
      (seq, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        math.max(0L, base + jitter))), s"t${seq % 3}")
    }
    val df = rows.toDF("seq", "ts", "etype")
    val got = Temporal.latenessProfile(df, "seq", "ts", "etype",
        chunkSize = 8L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    // naive reference: one unpartitioned running-max window
    val naive = df
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("late", max(col("us")).over(
        Window.orderBy(col("seq").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
        col("us"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("late") > 0L, 1L).otherwise(0L)).as("nl"),
        sum(when(col("late") > 60000000L, 1L).otherwise(0L)).as("nl1m"),
        sum(when(col("late") > 3600000000L, 1L).otherwise(0L)).as("nl1h"),
        max(col("late")).as("mx"), sum(col("late")).as("sm"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got === naive)
    // sanity: the scramble actually produced late rows past 1 minute
    assert(got.values.map(_._3).sum > 0L)
  }

  /** Driver-side reference for the textbook sequential CUSUM recursion
    * `C⁺_h = max(0, C⁺_{h-1} + d_h)` (and the mirrored C⁻) over the
    * scaled deviations `d_h = n·x_h - total` — what the window rewrite
    * must equal.
    */
  private def cusumRef(xs: Seq[Long], den: Long = 16L) = {
    val n = xs.size.toLong
    val tot = xs.sum
    val ds = xs.map(x => n * x - tot)
    val pos = ds.scanLeft(0L)((c, d) => math.max(0L, c + d)).tail
    val neg = ds.scanLeft(0L)((c, d) => math.max(0L, c - d)).tail
    val alarms = pos.zip(neg).count { case (p, q) =>
      BigInt(p) * den > BigInt(n) * tot || BigInt(q) * den > BigInt(n) * tot
    }
    val cpIdx = pos.indexOf(pos.max) // earliest peak
    (n, tot, pos.max, neg.max, cpIdx, alarms.toLong)
  }

  test("cusumChangepoints equals the sequential CUSUM recursion (level shift + flat key)") {
    // key a: rate doubles at hour 4 (counts 2,2,2,2,8,8,8,8);
    // key b: flat 3s — no changepoint signal beyond noise-free zero
    val counts = Map("a" -> Seq(2L, 2L, 2L, 2L, 8L, 8L, 8L, 8L),
      "b" -> Seq(3L, 3L, 3L, 3L))
    val rows = for {
      (k, xs) <- counts.toSeq; (x, h) <- xs.zipWithIndex
      i <- 0L until x
    } yield (k, ts(h))
    val out = Temporal.cusumChangepoints(rows.toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getTimestamp(6)))).toMap
    for ((k, xs) <- counts) {
      val (n, tot, mp, mn, cpIdx, alarms) = cusumRef(xs)
      val (gn, gtot, gmp, gmn, galarms, gcp) = out(k)
      assert((gn, gtot, gmp, gmn, galarms) === ((n, tot, mp, mn, alarms)),
        s"key $k")
      assert(gcp === ts(cpIdx), s"changepoint hour for $k")
    }
    // the shifted key actually alarms; the flat key never does
    assert(out("a")._5 > 0L && out("b")._5 === 0L)
  }

  test("cusumChangepoints matches the recursion on seeded random series") {
    val rnd = new scala.util.Random(7)
    val counts = (0 until 6).map { k =>
      s"k$k" -> Seq.fill(20)(1L + rnd.nextInt(9).toLong)
    }.toMap
    val rows = for {
      (k, xs) <- counts.toSeq; (x, h) <- xs.zipWithIndex
      i <- 0L until x
    } yield (k, ts(h))
    val out = Temporal.cusumChangepoints(rows.toDF("k", "t"), "k", "t")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getTimestamp(6)))).toMap
    for ((k, xs) <- counts) {
      val (n, tot, mp, mn, cpIdx, alarms) = cusumRef(xs)
      assert(out(k) === ((n, tot, mp, mn, alarms, ts(cpIdx))), s"key $k")
    }
  }

  test("markovAbsorption: exact fixed-point recursion on a hand-built chain") {
    // user journeys: u1: A B P, u2: A B A, u3: B P B — transitions:
    // A→B:2, B→P:2, B→A:1, P→B:1, A from u2... recount below in asserts
    val rows = Seq(
      (1L, "A", 0L), (1L, "B", 1L), (1L, "P", 2L),
      (2L, "A", 10L), (2L, "B", 11L), (2L, "A", 12L),
      (3L, "B", 20L), (3L, "P", 21L), (3L, "B", 22L))
    val df = rows.map { case (u, a, s) =>
      (u, a, new java.sql.Timestamp(s * 1000L), s) }
      .toDF("u", "a", "t", "eid")
    val got = Temporal.markovAbsorption(df, "u", "a", "t", "eid",
        target = "P", steps = 3, scaleBits = 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val S = 1L << 20
    // transitions: A→B (u1:1, u2:1) = 2; B→P (u1:1, u3:1) = 2;
    // B→A (u2) = 1; P→B (u3) = 1. ct: A=2, B=3, P=1.
    // p0: P=S else 0
    // p1: A = (2·0)//2 = 0; B = (2·S + 1·0)//3; P = S
    val b1 = (2 * S) / 3
    // p2: A = (2·b1)//2 = b1; B = (2·S + 1·0)//3 = b1 (A was 0 at k=1); P = S
    val a2 = b1
    val b2 = (2 * S + 1 * 0) / 3
    // p3: A = (2·b2)//2 = b2; B = (2·S + a2... B→A uses p2(A)=b1:
    val b3 = (2 * S + 1 * a2) / 3
    assert(got("P") === S, "absorbing state pins at 1.0")
    assert(got("A") === b2, s"A after 3 steps")
    assert(got("B") === b3, s"B after 3 steps")
  }

  test("kaplanMeier matches the textbook estimator; censoring shrinks risk sets; d=n zeroes the tail") {
    // durations: 1(obs) 1(obs) 1(cens) 2(obs) 3(cens) 5(obs)
    // t=1: n=6 d=2 c=1 → S = 1 − 2/6 = 2/3
    // t=2: n=3 d=1     → S = 2/3 · 2/3 = 4/9
    // t=3: n=2 d=0 c=1 → S unchanged (censor-only step)
    // t=5: n=1 d=1     → everyone at risk dies → S = 0 exactly
    val subj = Seq((1L, 1L), (1L, 1L), (1L, 0L), (2L, 1L), (3L, 0L), (5L, 1L))
      .toDF("dur", "obs")
    val got = Temporal.kaplanMeier(subj, "dur", "obs")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got(1L) === ((6L, 2L, 1L, pr6(math.exp(math.log(1.0 - 2.0 / 6.0))))))
    assert(got(2L)._4 === pr6(math.exp(
      math.log(1.0 - 2.0 / 6.0) + math.log(1.0 - 1.0 / 3.0))))
    assert(got(2L)._1 === 3L)
    assert(got(3L) === ((2L, 0L, 1L, got(2L)._4)),
      "censor-only step must not move the curve")
    assert(got(5L) === ((1L, 1L, 0L, 0.0)),
      "d = n must send survival exactly to zero")
    // monotone non-increasing
    val ordered = got.toSeq.sortBy(_._1).map(_._2._4)
    assert(ordered === ordered.sorted.reverse)
  }
}
