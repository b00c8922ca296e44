package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit: hand-computed violation counts per rule kind") {
    val df = Seq(
      (Some(1L), 10.0, "F", 1L, 1),
      (Some(2L), 99.0, "O", 3L, 1),   // range viol (9900 > 2500), accepted viol
      (None, 5.0, "F", 1L, 2),        // null viol
      (Some(4L), -1.0, "F", 2L, 1),   // range viol (-100 < 100)
      (Some(9L), 20.0, "F", 9L, 1)    // fk 9 missing from dim
    ).toDF("fk", "qty", "status", "k1", "k2")
    val dfDup = df.union(df.limit(1)) // duplicate first row's (k1,k2)=(1,1)
    val dim = Seq(1L, 2L, 4L).toDF("k")
    val out = Quality.audit(dfDup, Seq(
      Quality.NotNull("fk"),
      Quality.InRangeCents("qty", 100L, 2500L),
      Quality.AcceptedValues("status", Seq("F")),
      Quality.Check("k2_positive", col("k2") > 0),
      Quality.UniqueKey(Seq("k1", "k2")),
      Quality.RefIntegrity("fk", dim, "k")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("not_null:fk") === ((6L, 1L)))
    assert(out("range:qty") === ((6L, 2L)))
    assert(out("accepted:status") === ((6L, 1L)))
    assert(out("check:k2_positive") === ((6L, 0L)))
    // 6 rows, 5 distinct (k1,k2) pairs -> 1 extra row in a dup group
    assert(out("unique:k1+k2") === ((6L, 1L)))
    // non-null fks: 1,2,9,4,1 (5 checked); 9 missing from dim
    assert(out("ref:fk") === ((5L, 1L)))
  }

  test("audit: NULL predicate in a Check counts as a violation") {
    val df = Seq((Some(1), 1), (None, 2), (Some(-1), 3)).toDF("v", "id")
    val out = Quality.audit(df, Seq(Quality.Check("v_pos", col("v") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("check:v_pos", 3L, 2L)))
  }

  test("audit: NULLs are not range/accepted violations (pair with NotNull)") {
    val df = Seq((None: Option[Double], None: Option[String]),
      (Some(5.0), Some("F"))).toDF("qty", "status")
    val out = Quality.audit(df, Seq(
      Quality.InRangeCents("qty", 100L, 2500L),
      Quality.AcceptedValues("status", Seq("F"))))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("range:qty") === 0L)
    assert(out("accepted:status") === 0L)
  }

  test("audit: keyed (non-broadcast) referential integrity gives identical counts") {
    val df = Seq(1L, 2L, 9L).toDF("fk")
    val dim = Seq(1L, 2L).toDF("k")
    val b = Quality.audit(df, Seq(Quality.RefIntegrity("fk", dim, "k")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val s = Quality.audit(df, Seq(Quality.RefIntegrity("fk", dim, "k")),
      broadcastDim = false)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(b.toSeq === s.toSeq && b.head === ((3L, 1L)))
  }

  test("kAnonymity: hand-computed class sizes, risk counts, realized k") {
    // group g1: classes (a,1)x5, (a,2)x2, (b,1)x1 -> 3 classes,
    //   2 below k=3, 3 rows at risk, min class 1
    // group g2: one class x4 -> anonymous at k=3
    val df = (Seq.fill(5)(("g1", "a", 1)) ++ Seq.fill(2)(("g1", "a", 2)) ++
      Seq(("g1", "b", 1)) ++ Seq.fill(4)(("g2", "a", 1)))
      .toDF("grp", "qi1", "qi2")
    val got = Quality.kAnonymity(df, "grp", Seq("qi1", "qi2"), k = 3L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "g1" -> ((3L, 2L, 3L, 1L)),
      "g2" -> ((1L, 0L, 0L, 4L))))
  }

  test("functionalDeps: holding FD scores zero, broken FD counts violators") {
    // k->v: k=1 maps to {x} (holds), k=2 maps to {x,y} (violates),
    // k=3 maps to {x,y,z} (violates, fan-out 3)
    val df = Seq((1, "x"), (1, "x"), (2, "x"), (2, "y"),
      (3, "x"), (3, "y"), (3, "z"), (3, "z")).toDF("k", "v")
    val got = Quality.functionalDeps(df, Seq(("k", "v"), ("v", "k")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got("k->v") === ((3L, 2L, 3L, 2.0 / 3.0)))
    // v->k: x maps to {1,2,3}, y to {2,3}, z to {3}
    assert(got("v->k") === ((3L, 2L, 3L, 2.0 / 3.0)))
  }

  test("lDiversity: populous-but-homogeneous classes are flagged, diverse ones pass") {
    // class (a,1): 4 rows but ONE sensitive value -> k-anonymous, NOT l-diverse
    // class (a,2): 3 rows, 3 distinct sensitive values -> diverse at l=3
    // class (b,1): 2 rows, 2 distinct -> below l=3
    val df = (Seq.fill(4)(("a", 1, "x")) ++
      Seq(("a", 2, "x"), ("a", 2, "y"), ("a", 2, "z")) ++
      Seq(("b", 1, "x"), ("b", 1, "y")))
      .toDF("qi1", "qi2", "sens")
    val got = Quality.lDiversity(df, Seq("qi1", "qi2"), "sens", l = 3L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("a", 1) -> ((4L, 1L, 1L)),
      ("a", 2) -> ((3L, 3L, 0L)),
      ("b", 1) -> ((2L, 2L, 1L))))
  }

  test("tCloseness: identical class distributions score 0; opposite-end classes hand-compute to 0.5") {
    // A all at cents 0, B all at cents 900 -> buckets 0 and 9; per class:
    // gap_b = |cum_g*n - gcum*ng| = |10*20 - 10*10| = 100 for b=0..8 (A),
    // sum 900, t = 900/(10*20*9) = 0.5 — symmetric for B
    val polar = (Seq.fill(10)(("A", 0L)) ++ Seq.fill(10)(("B", 900L)))
      .toDF("seg", "v")
    val gotP = Quality.tCloseness(polar, "seg", col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(gotP === Map("A" -> ((10L, 900.0, 0.5)), "B" -> ((10L, 900.0, 0.5))))
    // identical distributions -> every class matches the global CDF
    val same = (0 until 10).flatMap(i => Seq(("A", i * 100L), ("B", i * 100L)))
      .toDF("seg", "v")
    val gotS = Quality.tCloseness(same, "seg", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(gotS === Map("A" -> 0.0, "B" -> 0.0))
  }

  test("conformalCoverage equals the naive sorted-order-statistic recipe") {
    val scores = (0L until 200L).map(i => i -> (i * 37L) % 101L)
    val df = scores.toDF("doc_id", "s")
    val got = Quality.conformalCoverage(df, "doc_id", col("s"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // replicate the md5-parity split with the engine, then do the rest
    // naively driver-side: sort cal scores, take the k-th smallest
    val calFlag = df.select(col("doc_id"),
        substring(md5(col("doc_id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7").as("cal"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cal = scores.filter(p => calFlag(p._1)).map(_._2).sorted
    val test = scores.filterNot(p => calFlag(p._1)).map(_._2)
    for (alpha <- Seq(10, 20)) {
      val k = ((cal.size + 1) * (100 - alpha) + 99) / 100
      val thr = cal(k.toInt - 1)
      val covered = test.count(_ <= thr).toLong
      val (nCal, nTest, gotThr, gotCov, cov) = got(alpha)
      assert((nCal, nTest, gotThr, gotCov) ===
        ((cal.size.toLong, test.size.toLong, thr, covered)), s"alpha $alpha")
      assert(cov === math.floor(covered.toDouble / test.size * 1e6 + 0.5) / 1e6)
      // conformal validity on the exchangeable split: coverage near 1-α
      assert(cov >= (100 - alpha) / 100.0 - 0.1, s"alpha $alpha coverage $cov")
    }
  }

  test("conformalCoverage: an alpha the calibration set is too small for still surfaces") {
    // k = ceil((n_cal+1)(1-α)) > n_cal has no reachable order statistic;
    // the conformal convention is threshold = +infinity (every test
    // point conforms). The row used to silently VANISH from the output —
    // a caller iterating requested alphas got no signal at all.
    val tiny = (0L until 8L).map(i => i -> i).toDF("doc_id", "s")
    val got = Quality.conformalCoverage(tiny, "doc_id", col("s"),
        alphasPct = Seq(1, 50)).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(got.keySet === Set(1, 50), s"every requested alpha must surface")
    val a1 = got(1)
    assert(a1.isNullAt(a1.fieldIndex("threshold_ppm")),
      "insufficient calibration must read as the +inf threshold (NULL)")
    assert(a1.getAs[Long]("n_covered") === a1.getAs[Long]("n_test"),
      "+inf threshold means every test point conforms")
    assert(!got(50).isNullAt(got(50).fieldIndex("threshold_ppm")),
      "a reachable alpha keeps its exact order-statistic threshold")
  }

  test("audit: an empty table reads 0 violations on every rule kind, never NULL") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("x", DoubleType), StructField("k", LongType))))
    val out = Quality.audit(empty, Seq(
        Quality.NotNull("x"), Quality.InRangeCents("x", 0L, 100L),
        Quality.UniqueKey(Seq("k"))))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_checked"), r.get(r.fieldIndex("n_violations"))))
      .toMap
    assert(out.size === 3)
    out.foreach { case (rule, (checked, viol)) =>
      assert(checked === 0L, rule)
      assert(viol === 0L,
        s"$rule must read 0 violations on empty input, got $viol — " +
          "the natural all-rules-clean gate fails on NULL")
    }
  }
}
