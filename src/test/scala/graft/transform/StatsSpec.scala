package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Unit specs for the exact statistical-profiling operators, checked
  * against hand-computed values so the DuckDB gate is the SECOND
  * independent check, not the first.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantilesByKey interpolates dyadic quantiles exactly") {
    // n=5: positions (n-1)*p = 1.0 / 2.0 / 3.0 → exact elements
    // n=4: positions 0.75 / 1.5 / 2.25 → interpolated dyadics
    val df = Seq(
      ("a", 10L), ("a", 20L), ("a", 30L), ("a", 40L), ("a", 50L),
      ("b", 1L), ("b", 2L), ("b", 3L), ("b", 10L)).toDF("k", "cents")
    val got = Stats.quantilesByKey(df, Seq("k"), "cents", Seq(0.25, 0.5, 0.75))
      .orderBy("k").collect()
    assert(got(0) === Row("a", 5L, 20.0, 30.0, 40.0))
    // b: p25 = 1 + 0.75*(2-1) = 1.75; p50 = 2.5; p75 = 3 + 0.25*7 = 4.75
    assert(got(1) === Row("b", 4L, 1.75, 2.5, 4.75))
  }

  test("quantilesByKey rejects non-dyadic probabilities") {
    val df = Seq(("a", 1L)).toDF("k", "cents")
    intercept[IllegalArgumentException] {
      Stats.quantilesByKey(df, Seq("k"), "cents", Seq(0.9))
    }
  }

  test("madOutliers flags |x - med| > k*MAD and survives MAD = 0") {
    // group a: values 1..9 plus a 1000 outlier
    //   med of (1..9,1000) = 5.5, devs = 4.5,3.5,...,0.5,0.5,...,994.5
    //   mad = median(0.5..4.5 pairs + 994.5) = 2.5 → cut 7.5 → one outlier
    // group b: all-equal values → med = 7, mad = 0 → dev > 0 flags
    val a = (1L to 9L).map(("a", _)) :+ (("a", 1000L))
    val b = Seq(("b", 7L), ("b", 7L), ("b", 7L), ("b", 8L))
    val got = Stats.madOutliers((a ++ b).toDF("k", "cents"), Seq("k"), "cents", k = 3)
      .orderBy("k").collect()
    assert(got(0) === Row("a", 10L, 5.5, 2.5, 1L))
    // b: med of (7,7,7,8) = 7.0, devs (0,0,0,1) → mad 0.0; dev>0 → 1 outlier
    assert(got(1) === Row("b", 4L, 7.0, 0.0, 1L))
  }

  test("corrByKey: exact ±1 on linear data, NULL on zero variance") {
    val lin = (1L to 100L).flatMap(i => Seq(
      ("up", i, 3 * i + 7), ("down", i, -2 * i + 1000)))
    val const = (1L to 10L).map(i => ("flat", 5L, i))
    val got = Stats.corrByKey((lin ++ const).toDF("k", "x", "y"), Seq("k"), "x", "y")
      .orderBy("k").collect()
    assert(got(0) === Row("down", 100L, -1.0, -2.0))
    assert(got(1) === Row("flat", 10L, null, null))
    assert(got(2) === Row("up", 100L, 1.0, 3.0))
  }

  test("corrByKey survives wide sums (values past 2^26, exact decimal path)") {
    // x*y products ~ 1e14 each over 1e3 rows → sums ~ 1e17: long math in
    // doubles would stay exact (< 2^53) but a naive int sum overflows;
    // the decimal path must not lose or wrap anything. Slope of the
    // noisy-free scaled line is still exactly 2.
    val big = (1L to 1000L).map(i => ("w", i * 10000L, i * 20000L))
    val got = Stats.corrByKey(big.toDF("k", "x", "y"), Seq("k"), "x", "y").collect()
    assert(got(0) === Row("w", 1000L, 1.0, 2.0))
  }

  test("histogramFixedWidth covers [min,max] with integer bucket bounds") {
    val df = (0L to 99L).map(v => Tuple1(v)).toDF("cents")
    val got = Stats.histogramFixedWidth(df, "cents", 4).orderBy("bucket").collect()
    assert(got.toSeq === Seq(
      Row(0L, 25L, 0L, 24L), Row(1L, 25L, 25L, 49L),
      Row(2L, 25L, 50L, 74L), Row(3L, 25L, 75L, 99L)))
    // degenerate: single distinct value → everything in bucket 0
    val one = Seq(5L, 5L, 5L).map(Tuple1(_)).toDF("cents")
    val g1 = Stats.histogramFixedWidth(one, "cents", 8).collect()
    assert(g1.toSeq === Seq(Row(0L, 3L, 5L, 5L)))
  }

  test("histogram bucket ids stay in [0, n) at the max value") {
    val df = Seq(10L, 20L, 30L).map(Tuple1(_)).toDF("cents")
    val ids = Stats.histogramFixedWidth(df, "cents", 3)
      .select("bucket").as[Long].collect().toSet
    assert(ids.subsetOf((0L until 3L).toSet))
  }

  test("benford screen: hand-counted digits, excluded non-positives, chi2 recompute") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // type "x": cents 100 ×3 (digit 1), 250 ×2 (digit 2), 900 ×1
    // (digit 9); a zero and a negative must be excluded -> n_total 6
    val rows = Seq(("x", 1.00), ("x", 1.00), ("x", 1.00), ("x", 2.50),
      ("x", 2.50), ("x", 9.00), ("x", 0.0), ("x", -3.0))
      .map { case (t, v) => (1L, t, v) }
    val dir = java.nio.file.Files.createTempDirectory("benford").toString
    rows.toDF("user_id", "event_type", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.Queries.benfordScreen(spark, dir)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size === 9)
    assert(got.map { case (d, t) => d -> t._1 } ===
      Map(1L -> 3L, 2L -> 2L, 9L -> 1L) ++ (3L to 8L).map(_ -> 0L).toMap)
    assert(got.values.forall(_._2 === 6L))
    // chi2 recompute with the exact same p_d spelling
    def contrib(d: Long, obs: Long) = {
      val p = math.log(1.0 + 1.0 / d.toDouble) / math.log(10.0)
      val e = 6.0 * p
      (obs - e) * (obs - e) / e
    }
    val expCum = (1L to 9L).scanLeft(0.0) { (acc, d) =>
      acc + contrib(d, got(d)._1) }.tail
    (1L to 9L).foreach { d =>
      assert(got(d)._3 === pr6(contrib(d, got(d)._1)))
      assert(got(d)._4 === pr6(expCum(d.toInt - 1)))
    }
  }

  test("event lift: hand-computed basket pairs on four users") {
    // users: 1:{a,b} 2:{a} 3:{a,b,c} 4:{b,c} -> n_a=3 n_b=3 n_c=2 N=4
    // (a,b): n=2 lift=2*4/9  jac=2/4; (a,c): n=1 lift=4/6 jac=1/4;
    // (b,c): n=2 lift=8/6 jac=2/3
    val rows = Seq((1L, "a"), (1L, "b"), (2L, "a"), (3L, "a"), (3L, "b"),
      (3L, "c"), (4L, "b"), (4L, "c"), (1L, "a")) // dup presence row
      .map { case (u, t) => (u, t, 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("lift").toString
    rows.toDF("user_id", "event_type", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.Queries.eventLift(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    assert(got === Map(
      ("a", "b") -> ((2L, 3L, 3L, 8.0 / 9.0, 0.5)),
      ("a", "c") -> ((1L, 3L, 2L, 4.0 / 6.0, 0.25)),
      ("b", "c") -> ((2L, 3L, 2L, 8.0 / 6.0, 2.0 / 3.0))))
  }

  test("kmv distinct: exact below k, within 30% above k, salted prune lossless") {
    // key "small": 10 distinct users -> n_kept = n_exact = 10, est exact
    // key "big": 5000 distinct users -> k-th order statistic estimate
    val rows = (0L until 10L).map(u => (u, "small", 1.0)) ++
      (0L until 5000L).map(u => (u, "big", 1.0))
    val dir = java.nio.file.Files.createTempDirectory("kmv").toString
    rows.toDF("user_id", "event_type", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.Queries.kmvDistinct(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (se, sk, _, sEst) = got("small")
    assert((se, sk, sEst) === ((10L, 10L, 10.0)))
    val (be, bk, bKth, bEst) = got("big")
    assert((be, bk) === ((5000L, 64L)))
    assert(math.abs(bEst - 5000.0) / 5000.0 < 0.3,
      s"KMV estimate $bEst too far from 5000")
    // losslessness of the salted prune: k-th smallest recomputed naively
    def md5hex(v: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val naiveKth = (0L until 5000L)
      .map(u => java.lang.Long.parseLong(md5hex(u.toString).take(15), 16))
      .sorted.apply(63)
    assert(bKth === naiveKth)
  }

  test("importance weights: identical halves weigh 1.0 with full ESS; shift shrinks ESS") {
    // type a: same value pattern both halves -> every w exactly 1,
    //   ESS at the last bucket = n_train = 20
    // type b: train spreads 0..9, target all 9s -> top-bucket w > 1,
    //   ESS < 20
    val rows =
      (0 until 40).map(i => ("a", i.toLong, (i % 10) / 100.0 * 100)) ++
        (0 until 40).map(i => ("b", i.toLong,
          if (i < 20) (i % 10).toDouble else 9.0))
    val df = rows.map { case (t, sec, v) =>
      (1L, t, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(sec)), v)
    }
    val dir = java.nio.file.Files.createTempDirectory("iw").toString
    df.toDF("user_id", "event_type", "ts", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.Queries.importanceWeights(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got.size === 20)
    for (b <- 0L to 9L) assert(got(("a", b))._3 === 1.0,
      s"bucket $b of identical halves must weigh 1.0")
    assert(got(("a", 9L))._4 === Some(20.0))
    assert(got(("b", 9L))._3 > 1.0, "shifted-into bucket must upweight")
    assert(got(("b", 9L))._4.get < 20.0, "shift must shrink ESS")
  }

  test("burstiness: periodic series scores -1, bursty series positive, moments exact") {
    // type p: one user, events at 0,10,20,30s -> gaps all 10s: σ=0,
    //   cv2=0, B=-1. type b: gaps 1s,1s,58s -> strongly bursty.
    val rows =
      Seq(0L, 10L, 20L, 30L).map(sec => (1L, "p", sec)) ++
        Seq(0L, 1L, 2L, 60L).map(sec => (1L, "b", sec))
    val df = rows.map { case (u, t, sec) =>
      (u, t, java.sql.Timestamp.from(
        java.time.Instant.ofEpochSecond(sec)), 1.0)
    }
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    df.toDF("user_id", "event_type", "ts", "value").write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val got = graft.Queries.burstiness(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    val tenSec = 10L * 1000000L
    assert(got("p")._1 === 3L && got("p")._2 === 3 * tenSec)
    assert(got("p")._4 === 0.0 && got("p")._5 === -1.0)
    // driver reference for the bursty type: gaps 1s, 1s, 58s in µs
    val g = Seq(1L, 1L, 58L).map(_ * 1000000L)
    val (n, s1, s2) = (g.size.toDouble, g.sum.toDouble,
      g.map(x => BigInt(x) * BigInt(x)).sum.toDouble)
    assert(got("b")._3 === g.map(x => BigInt(x) * BigInt(x)).sum.toString)
    assert(math.abs(got("b")._4 - (n * s2 / (s1 * s1) - 1.0)) < 1e-12)
    // with n=3 gaps B is bounded near (√2−1)/(√2+1) ≈ 0.17 — positive
    // is the signal, not magnitude
    assert(got("b")._5 > 0.1, "bursty gaps must score above periodic/Poisson")
  }

  test("giniByKey: hand-computed equality/concentration, tie blocks, zero-total guard") {
    // key e: four equal docs -> perfectly even, G = 0
    //   iwx = 10+20+30+40 = 100; num = 200 - 5*40 = 0
    // key c: (1,1,1,97) -> iwx = 1+2+3+4*97 = 394; num = 788-500 = 288
    //   G = 288/400 = 0.72 (the tied 1s exercise the value-block math)
    // key z: all-zero totals -> gini NULL (ANSI guard)
    val df = (Seq.fill(4)(("e", 10L)) ++
      Seq(("c", 1L), ("c", 1L), ("c", 1L), ("c", 97L)) ++
      Seq(("z", 0L), ("z", 0L))).toDF("k", "v")
    val got = Stats.giniByKey(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got("e") === ((4L, 40L, 0L, Some(0.0))))
    assert(got("c") === ((4L, 100L, 288L, Some(0.72))))
    assert(got("z") === ((2L, 0L, 0L, None)))
  }

  test("jsdByKey: zero for identical halves, symmetric, bounded by ln 2") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val aRef = (0L to 9L).map(("a", _))
    val bRef = Seq.fill(5)(("b", 0L)) ++ Seq.fill(5)(("b", 9L))
    val bCur = Seq.fill(10)(("b", 9L))
    val ref = (aRef ++ bRef).toDF("k", "cents")
    val cur = (aRef ++ bCur).toDF("k", "cents")
    def run(r: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Stats.jsdByKey(r, c, Seq("k"), "cents", nBuckets = 10)
        .collect().map(x => (x.getString(0), x.getLong(1)) ->
          ((x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5)))).toMap
    val got = run(ref, cur)
    assert(got.size === 20)
    // identical halves: p == q -> m == p -> both KL terms ln(1) = 0
    for (bkt <- 0L to 9L)
      assert(got(("a", bkt)) === ((1L, 1L, 0.0, 0.0)))
    // hand formula on the planted shift (smoothed over nt+10 = 20)
    def contrib(nr: Long, nc: Long) = {
      val p = (nr + 1).toDouble / 20.0
      val q = (nc + 1).toDouble / 20.0
      val m = (p + q) * 0.5
      (p * math.log(p / m) + q * math.log(q / m)) * 0.5
    }
    val c0 = contrib(5, 0)
    val c9 = contrib(5, 10)
    assert(got(("b", 0L)) === ((5L, 0L, pr6(c0), pr6(c0))))
    assert(got(("b", 9L)) === ((5L, 10L, pr6(c9), pr6(c0 + c9))))
    // bounded: total JSD can never exceed ln 2 nats
    assert(got(("b", 9L))._4 <= math.log(2.0))
    // symmetric in (ref, cur) — same bounds here since min/max agree
    val swapped = run(cur, ref)
    assert(swapped(("b", 9L))._4 === got(("b", 9L))._4)
  }

  test("psiByKey: zero for identical halves, hand-formula for a planted shift") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // key a: ref == cur (0..9, one per bucket) → every contrib 0, psi 0
    val aRef = (0L to 9L).map(("a", _))
    // key b: ref mass at both ends, cur all at the top bucket
    val bRef = Seq.fill(5)(("b", 0L)) ++ Seq.fill(5)(("b", 9L))
    val bCur = Seq.fill(10)(("b", 9L))
    val ref = (aRef ++ bRef).toDF("k", "cents")
    val cur = (aRef ++ bCur).toDF("k", "cents")
    val got = Stats.psiByKey(ref, cur, Seq("k"), "cents", nBuckets = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.size === 20)
    for (bkt <- 0L to 9L) {
      val (nr, nc, c, cum) = got(("a", bkt))
      assert((nr, nc, c, cum) === ((1L, 1L, 0.0, 0.0)))
    }
    // b: smoothed p/q over nt+10 = 20: bucket 0 p=6/20 q=1/20;
    // empty buckets 1..8 p=q=1/20 → 0; bucket 9 p=6/20 q=11/20
    def contrib(nr: Long, nc: Long) = {
      val p = (nr + 1).toDouble / 20.0
      val q = (nc + 1).toDouble / 20.0
      (p - q) * math.log(p / q)
    }
    val c0 = contrib(5, 0)
    val c9 = contrib(5, 10)
    assert(got(("b", 0L)) === ((5L, 0L, pr6(c0), pr6(c0))))
    assert(got(("b", 5L)) === ((0L, 0L, 0.0, pr6(c0))))
    assert(got(("b", 9L)) === ((5L, 10L, pr6(c9), pr6(c0 + c9))))
    // the planted shift reads as severe drift on the PSI scale
    assert(got(("b", 9L))._4 > 0.25)
  }

  test("emdByKey: hand-computed W1; identical halves zero; empty current NULL") {
    // ref 0..9 (one per bucket), cur all at 9: cum gaps 10(b+1) for
    // b=0..8, 0 at b=9 -> num = 10*45 = 450; emd = 450/(10*10*10)
    val ref = ((0L to 9L).map(("a", _)) ++ (0L to 9L).map(("b", _)) ++
      Seq(("c", 1L), ("c", 2L))).toDF("k", "cents")
    val cur = (Seq.fill(10)(("a", 9L)) ++ (0L to 9L).map(("b", _)))
      .toDF("k", "cents")
    val got = Stats.emdByKey(ref, cur, Seq("k"), "cents", nBuckets = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got("a") === ((10L, 10L, 450L, Some(0.45))))
    assert(got("b") === ((10L, 10L, 0L, Some(0.0))))   // identical halves
    assert(got("c") === ((2L, 0L, 0L, None)))          // no current slice
  }

  test("winsorizeByKey clips at the dyadic fences; survivors unchanged") {
    // 17 values 0..16: p(1/16) position = 16/16 = 1 → lo = 1;
    // p(15/16) position = 15 → hi = 15. One row below, one above.
    // clipped sum = 1 + (1..15 unchanged) + 15 = 136; ×16 = 2176
    val df = (0L to 16L).map(("a", _)).toDF("k", "cents")
    val got = Stats.winsorizeByKey(df, Seq("k"), "cents").collect()
    assert(got(0) === org.apache.spark.sql.Row("a", 17L, 1L, 1L, 2176L))
    // interpolated fences: n=9, values 0,8,16,...,64? keep simple:
    // 0..8 → lo position 8/16=0.5 → lo = 0.5 → only the 0 clips up
    val df2 = (0L to 8L).map(("b", _)).toDF("k", "cents")
    val g2 = Stats.winsorizeByKey(df2, Seq("k"), "cents").collect()
    // lo=0.5, hi=7.5: sum = 0.5 + (1..7) + 7.5 = 36; ×16 = 576
    assert(g2(0) === org.apache.spark.sql.Row("b", 9L, 1L, 1L, 576L))
  }

  test("winsorizeByKey scales by the fence denominator — no truncation at k/32") {
    // n=10 values 0..9, fences 1/32 and 31/32: positions 9/32 and
    // 279/32 → lo = 0.28125, hi = 8.71875 — multiples of 1/32 that a
    // fixed ×16 scale would truncate. sum×32 = 9 + 32·(1+…+8) + 279
    val df = (0L to 9L).map(("a", _)).toDF("k", "cents")
    val got = Stats.winsorizeByKey(df, Seq("k"), "cents",
      pLo = 1.0 / 32, pHi = 31.0 / 32).collect()
    assert(got(0).schema.fieldNames.last === "sum_clipped_32ths")
    assert(got(0) === org.apache.spark.sql.Row("a", 10L, 1L, 1L,
      9L + 32L * 36L + 279L))
    // non-dyadic fences refuse instead of corrupting the exact sum
    intercept[IllegalArgumentException] {
      Stats.winsorizeByKey(df, Seq("k"), "cents", pLo = 0.3, pHi = 0.9)
    }
  }

  test("modeByKey picks the most frequent value, smallest value on ties") {
    val df = Seq(
      ("a", 5L), ("a", 5L), ("a", 3L),            // clear winner 5
      ("b", 9L), ("b", 2L), ("b", 9L), ("b", 2L), // tie → smaller (2)
      ("c", -4L), ("c", -4L), ("c", 0L)           // negative mode
    ).toDF("k", "v")
    val got = Stats.modeByKey(df, Seq("k"), "v")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", 5L, 2L), ("b", 2L, 2L), ("c", -4L, 2L)))
  }

  test("linearCountDistinct: occupied/exact bookkeeping, LC formula, saturation NULL") {
    import org.apache.spark.sql.functions.col
    // 3 distinct values in one key, 1 in the other
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 1L), ("b", 7L))
      .toDF("k", "v")
    val got = Stats.linearCountDistinct(df, Seq("k"), "v", m = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // tiny cardinality, wide sketch: no collisions expected at m=64
    assert(got("a")._1 === 3L && got("a")._2 === 3L)
    assert(got("b")._1 === 1L && got("b")._2 === 1L)
    def lc(o: Long, m: Int): Double = {
      val raw = -m.toDouble * math.log(1.0 - o.toDouble / m.toDouble)
      math.floor(raw * 1e6 + 0.5) / 1e6
    }
    assert(got("a")._3 === lc(3, 64) && got("b")._3 === lc(1, 64))
    // m=2 with 3+ distinct values saturates both buckets -> NULL estimate
    val sat = Stats.linearCountDistinct(
      (1L to 50L).map(("x", _)).toDF("k", "v"), Seq("k"), "v", m = 2)
      .collect().head
    assert(sat.getLong(1) === 2L && sat.isNullAt(3))
  }

  test("cupedByArm: hand-computed theta and adjusted means; zero-variance covariate") {
    import org.apache.spark.sql.functions.col
    // x perfectly predicts y (y = 2x): CUPED removes ALL covariate
    // imbalance — arms with different x means land on equal adjusted
    // means when their y|x relationship is identical
    val users = Seq(
      ("A", 1L, 2L), ("A", 2L, 4L), ("B", 3L, 6L), ("B", 4L, 8L))
      .toDF("arm", "x", "y")
    val out = Stats.cupedByArm(users, "arm", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // pooled: n=4, sx=10, sy=20, sxx=30, sxy=60
    // cov = 4*60-10*20 = 40, vx = 4*30-100 = 20, theta = 2
    assert(out("A")._3 === 2.0 && out("B")._3 === 2.0)
    assert(out("A")._2 === 3.0 && out("B")._2 === 7.0) // raw means differ
    // adjusted: A: 3 - 2*(1.5-2.5) = 5; B: 7 - 2*(3.5-2.5) = 5
    assert(out("A")._4 === 5.0 && out("B")._4 === 5.0)
    // constant covariate -> theta 0, adjusted == raw
    val flat = Seq(("A", 7L, 2L), ("A", 7L, 4L), ("B", 7L, 6L))
      .toDF("arm", "x", "y")
    val f = Stats.cupedByArm(flat, "arm", "x", "y")
      .collect().map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(2), r.getDouble(4)))).toMap
    assert(f("A")._1 === 0.0 && f("A")._2 === f("A")._3)
  }

  test("rangeBucketize: near-equal-frequency buckets, monotone in the value") {
    val df = (0L until 10000L).map(Tuple1(_)).toDF("cents")
    val got = Stats.rangeBucketize(df, "cents", 4)
    val sizes = got.groupBy("bucket").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === Set(0L, 1L, 2L, 3L))
    // t-digest cutpoints at 0.1% error: each quarter within 10% of 2500
    sizes.values.foreach(n => assert(math.abs(n - 2500L) <= 250L, sizes))
    // monotone: bucket id never decreases as the value grows
    val pairs = got.orderBy("cents").select("bucket").as[Long].collect()
    assert(pairs.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("aucByKey: mid-rank ties, perfect separation, degenerate class NULL") {
    // key 1: pos scores {1,3}, neg {1,2} — pairs: (1,1) tie=0.5,
    // (1,2) lose=0, (3,1) win, (3,2) win -> U=2.5, u2=5, auc=0.625
    // key 2: perfect separation -> auc=1.0
    // key 3: no negatives -> auc NULL
    val df = Seq(
      (1, 1L, 1L), (1, 3L, 1L), (1, 1L, 0L), (1, 2L, 0L),
      (2, 10L, 1L), (2, 11L, 1L), (2, 1L, 0L), (2, 2L, 0L),
      (3, 5L, 1L), (3, 6L, 1L)).toDF("k", "score", "label")
    val got = Stats.aucByKey(df, Seq("k"), "score", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got(1) === ((2L, 2L, 5L, Some(0.625))))
    assert(got(2) === ((2L, 2L, 8L, Some(1.0))))
    assert(got(3) === ((2L, 0L, 0L, None)))
  }

  test("aucByKey equals the quadratic pair count on seeded random scores") {
    val rnd = new scala.util.Random(31)
    val rows = (1 to 300).map { i =>
      (i % 2, rnd.nextInt(20).toLong, if (rnd.nextInt(3) == 0) 1L else 0L)
    }
    val df = rows.toDF("k", "score", "label")
    val got = Stats.aucByKey(df, Seq("k"), "score", "label")
      .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
    for (k <- Seq(0, 1)) {
      val pos = rows.filter(r => r._1 == k && r._3 == 1L).map(_._2)
      val neg = rows.filter(r => r._1 == k && r._3 == 0L).map(_._2)
      val wins = (for (p <- pos; n <- neg)
        yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
      assert(got(k) === wins / (pos.size.toDouble * neg.size))
    }
  }

  test("calibrationBins: hand-computed bins, exact means and rates") {
    // scores 0..9 with labels = score >= 5, 2 bins over [0,9]:
    // bin 0 = scores 0..4 (n=5, pos=0, mean=2), bin 1 = 5..9 (pos=5, mean=7)
    val df = (0L to 9L).map(s => (s, if (s >= 5) 1L else 0L))
      .toDF("score", "label")
    val got = Stats.calibrationBins(df, "score", "label", nBins = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 5L, 0L, 10L, 2.0, 0.0),
      (1L, 5L, 5L, 35L, 7.0, 1.0)))
  }

  test("calibrationBins: max score lands in the last bin; bins partition rows") {
    val rnd = new scala.util.Random(5)
    val df = (1 to 500).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(2).toLong))
      .toDF("score", "label")
    val got = Stats.calibrationBins(df, "score", "label", nBins = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.map(_._2).sum === 500L)
    assert(got.map(_._1).forall(b => b >= 0 && b < 10))
  }

  test("hllDistinct: driver-replicated registers, exact harmonic sum, multiplicity-invariant") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val values = (1 to 200).map(i => s"v$i")
    val df = (values ++ values.take(50)) // duplicates must not move registers
      .map(v => ("k", v)).toDF("key", "v")
    val got = Stats.hllDistinct(df, Seq("key"), "v", m = 64).collect().head
    // replicate the sketch on the driver
    val regs = values.groupBy { v =>
      java.lang.Long.parseLong(md5hex(v).substring(0, 4), 16) % 64
    }.map { case (b, vs) =>
      b -> vs.map { v =>
        val probe = java.lang.Long.parseLong(md5hex(v).substring(4, 8), 16)
        if (probe == 0L) 17L
        else 17L - java.lang.Long.toBinaryString(probe).length
      }.max
    }
    val harmonic = regs.values.map(r => math.pow(2.0, -r)).sum +
      (64 - regs.size).toDouble
    assert(got.getLong(1) === regs.size.toLong)         // occupied
    assert(got.getLong(2) === 200L)                     // exact_distinct
    assert(got.getDouble(3) === harmonic)               // exact dyadic sum
    assert(got.getDouble(4) === 0.709 * 64 * 64 / harmonic)
  }

  test("hllDistinct: estimate lands inside the ~1.04/sqrt(m) error envelope") {
    val df = (1 to 5000).map(i => ("k", s"value_$i")).toDF("key", "v")
    val got = Stats.hllDistinct(df, Seq("key"), "v", m = 256).collect().head
    val est = got.getDouble(4)
    assert(math.abs(est - 5000) / 5000.0 < 0.25,
      s"estimate $est too far from 5000") // 3.8 sigma at m=256
  }

  test("ksTestByKey: hand case, identical samples, driver-replicated D") {
    // k=1: grp1={1,2}, grp2={2,3} -> D = 0.5 (d_num 2 of n1*n2 4)
    // k=2: identical samples -> D = 0
    val df = Seq((1, 1L, 1L), (1, 2L, 1L), (1, 2L, 2L), (1, 3L, 2L),
      (2, 5L, 1L), (2, 7L, 1L), (2, 5L, 2L), (2, 7L, 2L))
      .toDF("k", "v", "grp")
    val got = Stats.ksTestByKey(df, Seq("k"), "v", "grp")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1) === ((2L, 2L, 2L, 0.5)))
    assert(got(2) === ((2L, 2L, 0L, 0.0)))
    // driver replication on seeded data
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map(_ =>
      (0, rnd.nextInt(30).toLong, 1L + rnd.nextInt(2)))
    val big = Stats.ksTestByKey(rows.toDF("k", "v", "grp"), Seq("k"), "v", "grp")
      .collect().head
    val s1 = rows.filter(_._3 == 1L).map(_._2)
    val s2 = rows.filter(_._3 == 2L).map(_._2)
    val dNum = (0L to 30L).map { v =>
      math.abs(s1.count(_ <= v).toLong * s2.size - s2.count(_ <= v).toLong * s1.size)
    }.max
    assert(big.getLong(3) === dNum)
    assert(big.getDouble(4) === dNum.toDouble / (s1.size.toLong * s2.size))
  }

  test("spearmanByKey: monotone nonlinear = 1, reversed = -1, matches rank Pearson") {
    val mono = (1L to 50L).map(i => ("m", i, i * i))
    val rev = (1L to 50L).map(i => ("r", i, -i))
    val df = (mono ++ rev).toDF("k", "x", "y")
    val got = Stats.spearmanByKey(df, Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("m") === 1.0)   // Pearson of x,x^2 would be < 1
    assert(got("r") === -1.0)
    // ties: driver-computed Pearson of mid-ranks
    val rnd = new scala.util.Random(29)
    val rows = (1 to 300).map(_ => ("t", rnd.nextInt(10).toLong,
      rnd.nextInt(10).toLong))
    val sp = Stats.spearmanByKey(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().head.getDouble(2)
    def midRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexOf(v) + 1
        val cnt = sorted.count(_ == v)
        v -> (lo + (cnt - 1) / 2.0)
      }.toMap
    }
    val rx = midRanks(rows.map(_._2)); val ry = midRanks(rows.map(_._3))
    val xs = rows.map(r => rx(r._2)); val ys = rows.map(r => ry(r._3))
    val n = xs.size
    val cov = n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum
    val vx = n * xs.map(a => a * a).sum - xs.sum * xs.sum
    val vy = n * ys.map(a => a * a).sum - ys.sum * ys.sum
    val want = cov / math.sqrt(vx * vy)
    assert(math.abs(sp - want) < 1e-6)
  }

  test("chi2Features: hand-computed 2x2 statistic; constant feature NULL") {
    // a=20 b=10 c=5 d=15: N=50, det=250, chi2 = 50*250^2/(30*20*25*25)
    //                                         = 3125000/375000 = 8.3333...
    val rows =
      Seq.fill(20)((1L, 1L, 1L)) ++ Seq.fill(10)((1L, 0L, 1L)) ++
        Seq.fill(5)((0L, 1L, 1L)) ++ Seq.fill(15)((0L, 0L, 1L))
    val df = rows.toDF("f_x", "label", "f_const")
    val got = Stats.chi2Features(df, Seq("f_x", "f_const"), "label")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(got("f_x") === ((20L, 10L, 5L, 15L, Some(3125000.0 / 375000.0))))
    // f_const = 1 everywhere: c = d = 0 margin -> NULL
    assert(got("f_const")._5 === None)
  }

  test("olsByKey: exact line recovered; hand-computed R²; flat x is NULL") {
    // key a: y = 3x + 7 exactly -> slope 3, intercept 7, r2 = 1
    val lin = (1L to 50L).map(i => ("a", i, 3 * i + 7))
    // key b: hand-computed on (0,0),(1,1),(2,0): n=3 sx=3 sy=1 sxx=5
    //   syy=1 sxy=1; cov=3*1-3*1=0 -> slope 0, intercept=(1-0)/3, r2=0
    val tri = Seq(("b", 0L, 0L), ("b", 1L, 1L), ("b", 2L, 0L))
    // key c: constant x -> vx = 0 -> all NULL
    val flat = (1L to 5L).map(i => ("c", 4L, i))
    val got = Stats.olsByKey((lin ++ tri ++ flat).toDF("k", "x", "y"),
      Seq("k"), "x", "y").orderBy("k").collect()
    assert(got(0) === Row("a", 50L, 3.0, 7.0, 1.0))
    assert(got(1) === Row("b", 3L, 0.0,
      math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6, 0.0))
    assert(got(2) === Row("c", 5L, null, null, null))
  }

  test("exactRankIntervals equals the naive global row_number ranking") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(5L, 3L, 3L, 9L, 3L, 5L, 1L, 9L, 9L, 9L, 2L)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "cents")
    val got = Stats.exactRankIntervals(df, "cents", nBuckets = 4)
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // naive: rank rows globally, take min/max rank per value
    val naive = df
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cents").asc, col("id").asc)).cast("long"))
      .groupBy(col("cents").as("v"))
      .agg(min("rnk").as("lo"), max("rnk").as("hi"))
      .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === naive.toSeq)
    // and the intervals tile [1, n] exactly
    assert(got.head._2 === 1L && got.last._3 === 11L)
    assert(got.sliding(2).forall {
      case Array((_, _, h), (_, l, _)) => l == h + 1; case _ => true })
  }

  test("bucketized quantileNormalize with nSlots = N recovers the exact path bitwise") {
    // with B = N: qslot = g_rank-1 and rq = g_rank, so the slot
    // representative IS the exact global value at the target rank —
    // the bucketized operator is a strict generalization of the
    // exact one, and this pin is what licenses the windowless default
    val n = graft.Tables.load(spark, sf0001, "events").count().toInt
    val key = (r: Row) => (r.getLong(0), r.getString(1))
    val b = graft.Queries.quantileNormalizeImpl(spark, sf0001, n, exact = false)
      .collect().map(r => key(r) -> r.toSeq).toMap
    val e = graft.Queries.quantileNormalizeImpl(spark, sf0001, n, exact = true)
      .collect().map(r => key(r) -> r.toSeq).toMap
    assert(b.size === n && e.size === n)
    assert(b === e)
  }

  test("mutualInformation: 0 for independent columns, H(X) for a determined one") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // perfectly independent: every (x, y) cell has n_x*n_y/n rows
    val ind = (for (x <- Seq("a", "b"); y <- Seq(0, 1, 2); _ <- 0 until 4)
      yield (x, y)).toDF("x", "y")
    val gotInd = Stats.mutualInformation(ind, "x", "y")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(gotInd.size === 6)
    assert(gotInd.values.forall { case (n, c, _) => n === 4L && c === 0.0 })
    assert(gotInd.values.forall(_._3 === 0.0))
    // y determined by x with marginals 1/4, 1/4, 1/2 -> MI = H(X)
    val det = (Seq.fill(2)(("a", 10)) ++ Seq.fill(2)(("b", 20)) ++
      Seq.fill(4)(("c", 30))).toDF("x", "y")
    val mi = Stats.mutualInformation(det, "x", "y")
      .orderBy(col("x").desc).select("mi_cum").head().getDouble(0)
    val h = -(0.25 * math.log(0.25)) * 2 - 0.5 * math.log(0.5)
    // running-sum order: cells sorted by (x, y); replicate exactly
    val terms = Seq(0.25 * math.log(0.25 / (0.25 * 0.25)),
      0.25 * math.log(0.25 / (0.25 * 0.25)),
      0.5 * math.log(0.5 / (0.5 * 0.5)))
    assert(mi === pr6(terms(0) + terms(1) + terms(2)))
    assert(math.abs(mi - h) < 1e-6)
  }

  test("wilsonLowerBound: the 1/1 group ranks below 97/100; bound mirrors the closed form") {
    val df = (Seq(("one", true)) ++
      Seq.fill(97)(("many", true)) ++ Seq.fill(3)(("many", false)) ++
      Seq.fill(5)(("zero", false)))
      .toDF("k", "hit")
    val got = Stats.wilsonLowerBound(df, Seq("k"), col("hit"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def ref(pos: Long, n: Long, z: Double = 1.96): Double = {
      val z2 = z * z; val nd = n.toDouble; val p = pos.toDouble / nd
      val lb = (p + z2 / (2.0 * nd) -
        z * math.sqrt((p * (1.0 - p) + z2 / (4.0 * nd)) / nd)) /
        (1.0 + z2 / nd)
      math.floor(lb * 1e6 + 0.5) / 1e6
    }
    assert(got("one") === ((1L, 1L, 1.0, ref(1, 1))))
    assert(got("many") === ((100L, 97L, 0.97, ref(97, 100))))
    assert(got("zero")._4 === ref(0, 5))
    // the motivating ordering: raw rate says one > many, wilson says many > one
    assert(got("one")._4 < got("many")._4)
    // the bound is a lower bound and shrinks with n
    assert(got.values.forall { case (_, _, p, lb) => lb <= p })
  }

  test("mannWhitneyU matches the hand-computed rank statistics, ties averaged") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // key X: A = {1, 2, 2}, B = {2, 3}; avg rank of the three 2s = 3
    // R_A = 1 + 3 + 3 = 7 → u2 = 2·7 − 3·4 = 2 (U_A = 1)
    val df = Seq(("X", 0L, 1L), ("X", 0L, 2L), ("X", 0L, 2L),
      ("X", 1L, 2L), ("X", 1L, 3L),
      ("Y", 0L, 5L), ("Y", 0L, 6L)) // Y: arm B empty → auc/z NULL
      .toDF("k", "arm", "v")
    val got = Stats.mannWhitneyU(df, Seq("k"), "arm", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val x = got("X")
    assert((x.getLong(1), x.getLong(2), x.getLong(3)) === ((3L, 2L, 2L)))
    assert(x.getDouble(4) === pr6(1.0 / 6.0))
    // tie term: t=3 at value 2 → 24; N=5 → var = 6/12·(6 − 24/20) = 2.4
    val z = (1.0 - 3.0) / math.sqrt(3.0 * 2.0 / 12.0 *
      ((5.0 + 1.0) - 24.0 / (5.0 * 4.0)))
    assert(x.getDouble(5) === pr6(z))
    val y = got("Y")
    assert((y.getLong(1), y.getLong(2)) === ((2L, 0L)))
    assert(y.isNullAt(4) && y.isNullAt(5),
      "empty arm must NULL the effect size and z, not divide by zero")
  }

  test("mannWhitneyU: all values tied → zero variance → NULL z, auc = 1/2") {
    val df = Seq(("k", 0L, 7L), ("k", 0L, 7L), ("k", 1L, 7L), ("k", 1L, 7L))
      .toDF("k", "arm", "v")
    val r = Stats.mannWhitneyU(df, Seq("k"), "arm", "v").head()
    // R_A = 2·(avg rank 2.5) = 5 → u2 = 10 − 6 = 4 → U = 2 = nA·nB/2
    assert(r.getLong(3) === 4L)
    assert(r.getDouble(4) === 0.5)
    assert(r.isNullAt(5), "zero-variance key must NULL z under ANSI")
  }

  test("kmvSetOps: sub-k pairs are EXACT set algebra") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // a = {1..40}, b = {21..70}: union 70, inter 20 — both sketches
    // under k, so the merged sketch IS the union and nothing estimates
    val df = ((1L to 40L).map(("a", _)) ++ (21L to 70L).map(("b", _)))
      .toDF("g", "h")
    val r = Stats.kmvSetOps(df, "g", "h", k = 128).head()
    assert((r.getString(0), r.getString(1)) === (("a", "b")))
    assert((r.getLong(2), r.getLong(3)) === ((70L, 20L)))
    assert(r.getDouble(4) === pr6(20.0 / 70.0))
    assert(r.getDouble(5) === 70.0)
    assert(r.getDouble(6) === pr6(20.0 / 70.0 * 70.0))
  }

  test("kmvSetOps: saturated estimator tracks the true union/jaccard on md5-uniform sets") {
    // ids 0..1999 vs 1000..2999 hashed 60-bit: union 3000, jaccard 1/3
    val h = (0L until 3000L).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      i -> java.lang.Long.parseLong(hex.take(15), 16)
    }.toMap
    val rows = (0L until 2000L).map(i => ("a", h(i))) ++
      (1000L until 3000L).map(i => ("b", h(i)))
    val r = Stats.kmvSetOps(rows.toDF("g", "h"), "g", "h", k = 128).head()
    assert(r.getLong(2) === 128L, "merged sketch must saturate at k")
    val (jac, union, inter) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
    // this FIXED hash draw lands ~3.5σ high (3937); the bound pins the
    // estimator is in the right regime, not its variance
    assert(math.abs(union - 3000.0) / 3000.0 < 0.35, s"union_est $union")
    assert(math.abs(jac - 1.0 / 3.0) < 0.15, s"jaccard $jac")
    assert(math.abs(inter - 1000.0) / 1000.0 < 0.45, s"inter_est $inter")
  }

  test("kendallTauB matches the closed form on a hand-checked table; degenerate keys NULL") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // key K cells: (x,y,n): (0,0,2) (0,1,1) (1,0,1) (1,1,3)
    // pairs with x1<x2: (0,0)x(1,0):2·1 tie-y; (0,0)x(1,1):2·3 C
    //                  (0,1)x(1,0):1·1 D;     (0,1)x(1,1):1·3 tie-y
    // C=6, D=1. n=7, n0=21; tx: x0=3,x1=4 → t1x = 3·2+4·3 = 18 → n1=9
    // ty: y0=3,y1=4 → n2=9 → tau = 5/sqrt(12·12) = 5/12
    val rows = Seq.fill(2)(("K", 0L, 0L)) ++ Seq(("K", 0L, 1L), ("K", 1L, 0L)) ++
      Seq.fill(3)(("K", 1L, 1L)) ++
      Seq(("Z", 0L, 0L), ("Z", 0L, 1L)) // all x tied → NULL
    val got = Stats.kendallTauB(rows.toDF("k", "x", "y"), Seq("k"), "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    val k = got("K")
    assert((k.getLong(1), k.getLong(2), k.getLong(3)) === ((7L, 6L, 1L)))
    assert(k.getDouble(4) === pr6(5.0 / math.sqrt(12.0 * 12.0)))
    assert(got("Z").isNullAt(4), "all-x-tied key must NULL tau_b")
  }

  test("hllMergeAll: register-wise max union EQUALS the from-scratch sketch of the concatenated input") {
    val df = ((1 to 400).map(i => ("a", s"v$i")) ++
      (200 to 600).map(i => ("b", s"v$i"))).toDF("g", "v")
    val merged = Stats.hllMergeAll(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // the union row must BITWISE equal hllDistinct rebuilt from scratch
    // over the same rows under one key — the mergeability theorem
    val scratch = Stats.hllDistinct(df.withColumn("g", lit("all")),
      Seq("g"), "v").head() // (g, occupied, exact_distinct, harmonic_sum, est)
    assert(merged("__union__") ===
      ((scratch.getLong(1), scratch.getDouble(3), scratch.getDouble(4))))
    assert(merged.contains("a") && merged.contains("b"))
    // and the union estimate exceeds each part's (supersets)
    assert(merged("__union__")._3 >= merged("a")._3 &&
      merged("__union__")._3 >= merged("b")._3)
  }

  test("movingBlockBootstrap: constant series collapses the CI; varying series brackets the mean") {
    val const = (0L until 96L).map(i => (i, 7L)).toDF("i", "v")
    val rc = Stats.movingBlockBootstrap(const, "i", "v",
      blockLen = 24, reps = 200).head()
    assert(rc.getLong(0) === 96L && rc.getLong(1) === 200L)
    assert(rc.getDouble(2) === 7.0 && rc.getDouble(3) === 7.0 &&
      rc.getDouble(4) === 7.0)
    assert(rc.getDouble(5) === 0.0, "constant series must have zero SE")
    // a varying series: CI must bracket the point estimate, se > 0
    val varying = (0L until 96L).map(i => (i, (i % 11) + (i / 24))).toDF("i", "v")
    val rv = Stats.movingBlockBootstrap(varying, "i", "v",
      blockLen = 24, reps = 200).head()
    assert(rv.getDouble(3) <= rv.getDouble(2) + 1.0 &&
      rv.getDouble(4) >= rv.getDouble(2) - 1.0,
      s"CI [${rv.getDouble(3)}, ${rv.getDouble(4)}] vs mean ${rv.getDouble(2)}")
    assert(rv.getDouble(3) < rv.getDouble(4) && rv.getDouble(5) > 0.0)
    // a series shorter than one block must fail FAST with the
    // precondition message, not ANSI DIVIDE_BY_ZERO / silent row drops
    val short = (0L until 3L).map(i => (i, 1L)).toDF("i", "v")
    val e = intercept[Exception] {
      Stats.movingBlockBootstrap(short, "i", "v", blockLen = 5, reps = 40).head()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("needs series length >= blockLen")),
      s"wrong failure: $e")
  }

  test("movingBlockBootstrap: non-dense index fails fast instead of biasing the sampler") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    def expectDenseFailure(df: org.apache.spark.sql.DataFrame, what: String): Unit = {
      val e = intercept[Exception] {
        Stats.movingBlockBootstrap(df, "i", "v", blockLen = 4, reps = 40).head()
      }
      assert(messages(e).exists(_.contains("dense 0-based")),
        s"$what should hit the dense-index guard, got: $e")
    }
    // 1-based index — the modular start arithmetic would silently skip index 0
    expectDenseFailure((1L to 24L).map(i => (i, 1L)).toDF("i", "v"), "1-based")
    // gapped index — missing buckets silently shrink every block
    expectDenseFailure((0L until 24L).filter(_ != 7L).map(i => (i, 1L)).toDF("i", "v"), "gapped")
    // duplicate index hidden inside a 0..n-1 min/max span ({0,1,1,3,...})
    expectDenseFailure(((0L until 24L).map(i => (i, 1L)) :+ (1L, 1L))
      .filter(_._1 != 2L).toDF("i", "v"), "duplicated")
    // and the happy path still runs after the guard
    val ok = Stats.movingBlockBootstrap(
      (0L until 24L).map(i => (i, 1L)).toDF("i", "v"), "i", "v",
      blockLen = 4, reps = 40).head()
    assert(ok.getLong(0) === 24L && ok.getDouble(2) === 1.0)
  }

  test("targetEncodeOOF: independent md5 recompute — own fold excluded, smoothing applied") {
    val rows = (0L until 400L).map(i => (if (i % 3 == 0) "a" else "b", i, i % 7))
    val df = rows.toDF("cat", "id", "v")
    val got = Stats.targetEncodeOOF(df, "cat", "id", "v",
        nFolds = 5, smoothing = 100)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // driver-side reference with its own md5 (not Spark's)
    def fold(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 5
    }
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val n = rows.size.toDouble
    val s = rows.map(_._3).sum.toDouble
    val prior = s / n
    for (((cat, f), (nOof, sOof, gotPrior, enc)) <- got) {
      val inCat = rows.filter(_._1 == cat)
      val oof = inCat.filterNot(r => fold(r._2) == f)
      assert(nOof === oof.size.toLong, s"($cat,$f) n_oof")
      assert(sOof === oof.map(_._3).sum, s"($cat,$f) s_oof")
      assert(gotPrior === pr6(prior))
      assert(enc === pr6((sOof.toDouble + 100.0 * prior) / (nOof.toDouble + 100.0)),
        s"($cat,$f) enc")
      // leakage check: the encoding never equals the WITH-fold mean when
      // the fold actually removes rows with a different mean
      val withFold = inCat
      assert(oof.size < withFold.size, s"($cat,$f) fold removed nothing")
    }
    // every (cat, fold) cell present
    assert(got.keySet === rows.map(r => (r._1, fold(r._2))).toSet)
  }
}
