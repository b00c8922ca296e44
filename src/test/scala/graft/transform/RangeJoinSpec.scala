package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range join and generic as-of join: result equality against the
  * naive formulations, plus the plan-shape guarantee that motivates
  * them (equi join, not nested loop / cartesian).
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoin equals the theta join, as an equi join on buckets") {
    val points = (1 to 200).map(i => (i.toLong, i * 0.7)).toDF("pid", "v")
    val intervals = Seq(
      (1L, 10.0, 25.0), (2L, 24.9, 26.1), (3L, 90.0, 140.0),
      (4L, -5.0, 0.7), (5L, 139.3, 139.3), (6L, 200.0, 300.0))
      .toDF("iid", "lo", "hi")
    val theta = points.join(intervals,
      col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = RangeJoin.rangeJoin(points, "v", intervals, "lo", "hi", 7.0)
      .select("pid", "iid")
    val got = bucketed.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === got.toSet.size, "duplicate matches emitted")
    assert(got.toSet === theta)
    // the whole point: no nested-loop/cartesian plan
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = RangeJoin.rangeJoin(points, "v", intervals, "lo", "hi", 7.0)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"range join degenerated to all-pairs:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("asofJoin equals the window formulation, nulls pad missing matches") {
    import org.apache.spark.sql.expressions.Window
    val left = Seq(
      ("a", "2024-01-10 00:00:00"), ("a", "2024-01-20 00:00:00"),
      ("b", "2024-01-10 00:00:00"), ("c", "2024-01-10 00:00:00"))
      .toDF("k", "ts").select(col("k"), to_timestamp(col("ts")).as("ts"))
    val right = Seq(
      ("a", "2024-01-05 00:00:00", 1.0), ("a", "2024-01-15 00:00:00", 2.0),
      ("a", "2024-01-25 00:00:00", 3.0), ("b", "2024-01-12 00:00:00", 9.0))
      .toDF("k", "rts", "v").select(col("k"), to_timestamp(col("rts")).as("rts"), col("v"))

    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
      .select("k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, Option(r.get(2)))).toSet

    // reference: window over the raw as-of join
    val w = Window.partitionBy(col("k"), col("ts")).orderBy(col("rts").desc)
    val ref = left.join(right.withColumnRenamed("k", "rk"),
      col("rk") === col("k") && col("rts") <= col("ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("k", "ts", "v")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, Option(r.get(2)))).toSet
    assert(got === ref)
    assert(got.exists { case (k, _, v) => k == "b" && v.isEmpty },
      "b@01-10 has no earlier right row and must null-pad")
    assert(got.exists { case (k, _, v) => k == "c" && v.isEmpty })
  }

  test("asofJoin with identical timestamp names suffixes the right ts column") {
    val left = Seq(("a", "2024-01-10 00:00:00")).toDF("k", "ts")
      .select(col("k"), to_timestamp(col("ts")).as("ts"))
    val right = Seq(("a", "2024-01-05 00:00:00", 1.0))
      .toDF("k", "ts", "v").select(col("k"), to_timestamp(col("ts")).as("ts"), col("v"))
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "ts")
    assert(out.columns.toSeq === Seq("k", "ts", "ts_right", "v"))
    val row = out.head()
    assert(row.getDouble(3) === 1.0)
    assert(row.getTimestamp(1).toString === "2024-01-10 00:00:00.0")
    assert(row.getTimestamp(2).toString === "2024-01-05 00:00:00.0")
  }

  test("asofJoin suffixes every right value column that collides with a left name") {
    val left = Seq(("a", "2024-01-10 00:00:00", 7.0)).toDF("k", "ts", "v")
      .select(col("k"), to_timestamp(col("ts")).as("ts"), col("v"))
    val right = Seq(("a", "2024-01-05 00:00:00", 1.0, "x"))
      .toDF("k", "rts", "v", "w")
      .select(col("k"), to_timestamp(col("rts")).as("rts"), col("v"), col("w"))
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts")
    assert(out.columns.toSeq === Seq("k", "ts", "v", "rts", "v_right", "w"))
    val row = out.head()
    assert(row.getDouble(2) === 7.0, "left v must keep its name and value")
    assert(row.getDouble(4) === 1.0, "right v must land under v_right")
    assert(row.getString(5) === "x")
    // selecting both by name must not throw ambiguous-reference
    assert(out.select("v", "v_right").head().getDouble(0) === 7.0)
    // irreconcilable collision (left already has v_right) fails fast
    val leftBad = left.withColumn("v_right", lit(0.0))
    intercept[IllegalArgumentException](
      AsOfJoin.asofJoin(leftBad, right, Seq("k"), "ts", "rts"))
  }

  test("rangeJoin ignores inverted intervals instead of exploding them") {
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val intervals = Seq((1L, 100.0, 0.0), (2L, 4.0, 6.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(points, "v", intervals, "lo", "hi", 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("nearestJoin picks the closest right row either direction; ties to earlier; tolerance excludes") {
    val left = Seq(("a", "2024-01-01 12:00:00"), ("b", "2024-01-01 12:00:00"))
      .toDF("k", "ts").select(col("k"), to_timestamp(col("ts")).as("ts"))
    val right = Seq(
      ("a", "2024-01-01 11:50:00", 1L), // 10 min before
      ("a", "2024-01-01 12:05:00", 2L), // 5 min after  -> nearest
      ("a", "2024-01-01 13:00:00", 3L), // outside 30 min tolerance
      ("b", "2024-01-01 11:55:00", 4L), // 5 min before -> equidistant tie
      ("b", "2024-01-01 12:05:00", 5L)  // 5 min after
    ).toDF("k", "rts", "rid")
      .select(col("k"), to_timestamp(col("rts")).as("rts"), col("rid"))
    val got = AsOfJoin.nearestJoin(left, right, Seq("k"), "ts", "rts",
        java.time.Duration.ofMinutes(30))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got("a") === 2L, "5-min-after beats 10-min-before")
    assert(got("b") === 4L, "equidistant tie must break to the EARLIER right row")
    // a left row whose only candidate is outside tolerance null-pads
    val far = Seq(("a", "2024-01-01 18:00:00")).toDF("k", "ts")
      .select(col("k"), to_timestamp(col("ts")).as("ts"))
    val padded = AsOfJoin.nearestJoin(far, right, Seq("k"), "ts", "rts",
      java.time.Duration.ofMinutes(30)).head()
    assert(padded.isNullAt(2) && padded.isNullAt(3))
  }

  test("forwardJoin picks the earliest future right row; horizon excludes; null-pads") {
    val left = Seq(("a", "2024-01-01 12:00:00"), ("b", "2024-01-01 12:00:00"))
      .toDF("k", "ts").select(col("k"), to_timestamp(col("ts")).as("ts"))
    val right = Seq(
      ("a", "2024-01-01 11:00:00", 1L), // past — never eligible
      ("a", "2024-01-01 12:30:00", 2L), // earliest future -> match
      ("a", "2024-01-01 14:00:00", 3L),
      ("b", "2024-01-03 00:00:00", 4L)  // outside the 1-day horizon
    ).toDF("k", "rts", "rid")
      .select(col("k"), to_timestamp(col("rts")).as("rts"), col("rid"))
    val got = AsOfJoin.forwardJoin(left, right, Seq("k"), "ts", "rts",
        Some(java.time.Duration.ofDays(1)))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got("a") === Some(2L), "earliest future row within horizon wins")
    assert(got("b") === None, "beyond-horizon row must null-pad")
    // no horizon: b's far-future row becomes eligible
    val open = AsOfJoin.forwardJoin(left, right, Seq("k"), "ts", "rts", None)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(open("b") === Some(4L))
  }

  test("asofJoin ttl excludes stale matches") {
    val left = Seq(("a", "2024-01-20 00:00:00")).toDF("k", "ts")
      .select(col("k"), to_timestamp(col("ts")).as("ts"))
    val right = Seq(("a", "2024-01-05 00:00:00", 1.0))
      .toDF("k", "rts", "v").select(col("k"), to_timestamp(col("rts")).as("rts"), col("v"))
    val fresh = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      ttl = Some(java.time.Duration.ofDays(30))).select("v").head()
    assert(fresh.getDouble(0) === 1.0)
    val stale = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "rts",
      ttl = Some(java.time.Duration.ofDays(7))).select("v").head()
    assert(stale.isNullAt(0), "15-day-old row must be outside the 7-day TTL")
  }

  test("intervalOverlapJoin equals the naive theta join — one row per pair, any bucket width") {
    val a = Seq((1L, 0L, 50L), (2L, 95L, 160L), (3L, 10L, 10L),
      (4L, 300L, 310L), (5L, 120L, 125L)).toDF("aid", "a_lo", "a_hi")
    val b = Seq((10L, 40L, 100L), (11L, 10L, 12L), (12L, 161L, 200L),
      (13L, 50L, 50L), (14L, 0L, 400L), (15L, 9L, 2L))
      .toDF("bid", "b_lo", "b_hi")
    // naive overlap (inverted right interval 15 matches nothing)
    val theta = a.join(b,
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi") &&
          col("b_lo") <= col("b_hi"))
      .select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(theta.contains((1L, 13L)), "touching endpoints must overlap")
    for (w <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlapJoin(
          a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("aid", "bid")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size,
        s"pair emitted from more than one bucket at width $w")
      assert(got.toSet === theta, s"width $w")
    }
    // plan shape: equi join on the bucket, never all-pairs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = RangeJoin.intervalOverlapJoin(
          a, "a_lo", "a_hi", b, "b_lo", "b_hi", 64L)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"),
        s"interval overlap degenerated to all-pairs:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("intervalOverlapJoin is exact on NEGATIVE and zero-straddling domains") {
    // bucketOf uses Spark's TRUNCATED `div`, whose buckets are wider
    // around zero than floor-division's — correctness rests only on
    // monotonicity, which holds on all of ℤ. This pins match-set
    // equality with the naive theta join on negative/straddling
    // intervals so a future one-sided "fix" to floor semantics (which
    // WOULD silently drop or duplicate pairs) fails loudly.
    val a = Seq(
      (1L, -500L, -400L), (2L, -64L, -1L), (3L, -10L, 10L),
      (4L, -128L, -65L), (5L, -1L, 0L), (6L, -300L, 300L))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, -450L, -430L), (11L, -63L, -63L), (12L, 0L, 0L),
      (13L, -129L, -128L), (14L, -1000L, 1000L), (15L, -2L, -2L),
      (16L, 64L, 128L))
      .toDF("bid", "b_lo", "b_hi")
    val theta = a.join(b,
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(theta.contains((2L, 11L)) && theta.contains((4L, 13L)),
      "fixture must exercise fully-negative matches")
    for (w <- Seq(7L, 64L, 100L)) {
      val got = RangeJoin.intervalOverlapJoin(
          a, "a_lo", "a_hi", b, "b_lo", "b_hi", w)
        .select("aid", "bid")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size,
        s"pair emitted from more than one bucket at width $w (negative domain)")
      assert(got.toSet === theta, s"width $w (negative domain)")
    }
  }
}
