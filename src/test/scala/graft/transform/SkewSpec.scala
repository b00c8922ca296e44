package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted aggregation/join equivalence: results must match the unsalted
  * formulation exactly (salting only changes the shuffle layout).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    // hot key "h" carries 10k rows, tail keys 10 each
    val hot = (1 to 10000).map(i => ("h", i.toDouble))
    val tail = (1 to 50).flatMap(k => (1 to 10).map(i => (s"k$k", i.toDouble)))
    (hot ++ tail).toDF("k", "v").repartition(8)
  }

  test("saltedAggregate equals plain groupBy") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), numSalts = 16,
      partial = Seq(sum("v").as("s"), count(lit(1)).as("c")),
      merge = Seq(sum("s").as("sum_v"), sum("c").as("n")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedTopK equals the single-window top-k, ranks included") {
    import org.apache.spark.sql.expressions.Window
    // v is unique within each key, so (v desc) is a total order per key
    val order = Seq(col("v").desc)
    val w = Window.partitionBy(col("k")).orderBy(order: _*)
    val plain = skewed.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 7)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Double]("v"),
        r.getAs[Long]("rn"))).toSet
    val salted = Skew.saltedTopK(skewed, Seq(col("k")), order,
      saltCol = col("v"), k = 7, numSalts = 8)
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Double]("v"),
        r.getAs[Long]("rn"))).toSet
    assert(salted === plain)
  }

  test("saltedJoin equals plain join") {
    val dim = (Seq("h") ++ (1 to 50).map(k => s"k$k")).zipWithIndex
      .map { case (k, i) => (k, s"name$i") }.toDF("k", "name")
    val plain = skewed.join(dim, "k")
      .groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", numSalts = 8)
      .groupBy("name").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted === plain)
  }

  test("saltedJoin left join preserves unmatched fact rows") {
    val dim = Seq(("h", "hot")).toDF("k", "name")
    val out = Skew.saltedJoin(skewed, dim, "k", numSalts = 4, joinType = "left")
    assert(out.count() === skewed.count())
    assert(out.filter(col("name").isNull).count() === 500) // 50 tail keys x 10
  }

  test("saltedBlockSelfJoin emits each within-block pair exactly once") {
    // planted skew: one hot block with 80 rows, 20 singleton blocks
    val rows = (1 to 80).map(i => ("hot", i.toLong)) ++
      (81 to 100).map(i => (s"b$i", i.toLong))
    val df = rows.toDF("blk", "id")
    val a = df.select(col("blk"), col("id").as("a"))
    val b = df.select(col("blk"), col("id").as("b"))
    val plain = a.join(b, "blk").filter(col("a") < col("b"))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Skew.saltedBlockSelfJoin(a, b, "blk", col("a"), col("b"), 4)
      .filter(col("a") < col("b"))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(salted.length === salted.toSet.size, "duplicate pairs emitted")
    assert(salted.toSet === plain)
  }

  test("saltedJoin rejects join types that would duplicate unmatched dim rows") {
    val dim = Seq(("h", "hot")).toDF("k", "name")
    Seq("right", "right_outer", "full", "full_outer", "outer").foreach { jt =>
      intercept[IllegalArgumentException](
        Skew.saltedJoin(skewed, dim, "k", numSalts = 4, joinType = jt))
    }
  }

  test("joinSizeForecast: hand-computed pair counts equal the executed join size") {
    import spark.implicits._
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("w")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq.fill(4)("y") ++ Seq("z")).toDF("k")
    val got = Skew.joinSizeForecast(a, b, Seq("k"), topK = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    // only shared keys contribute: x 3*2=6, y 2*4=8 -> total 14
    assert(got === Map(
      "y" -> ((2L, 4L, 8L, 14L, 8.0 / 14.0)),
      "x" -> ((3L, 2L, 6L, 14L, 6.0 / 14.0))))
    // the forecast must equal the join it predicts
    val actual = a.join(b, "k").count()
    assert(actual === 14L)
  }

  test("aggTopK equals the saltedTopK window formulation byte-for-byte") {
    // seeded random scored frame with duplicate scores, sub-k groups,
    // negative scores, and long scores — the shapes the ANN cuts feed
    val rnd = new scala.util.Random(20260819)
    val rows = (0L until 40L).flatMap { q =>
      val n = if (q % 7 == 0) 2 else 30 // some groups smaller than k
      (0L until n).map { i =>
        // duplicate scores on purpose (i % 5) so ties exercise the id pin
        (q, q * 100 + i, (rnd.nextInt(5) - 2).toDouble / 4.0, rnd.nextInt(9).toLong - 4L)
      }
    }
    val df = rows.toDF("query_id", "neighbor_id", "cos", "lscore")
      .repartition(8)
    def sorted(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).sortBy(_.toString).toSeq
    // double score, descending with asc id tiebreak (the cosine cuts)
    val win = Skew.saltedTopK(df.select("query_id", "neighbor_id", "cos"),
      Seq(col("query_id")), Seq(col("cos").desc, col("neighbor_id").asc),
      col("neighbor_id"), k = 5, numSalts = 4, rankCol = "rank",
      castRankTo = None)
      .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
    val agg = Skew.aggTopK(df,
      Seq(col("query_id")),
      struct((-col("cos")).as("__nc"), col("neighbor_id").as("neighbor_id")),
      k = 5, rankCol = "rank", castRankTo = None)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (-col("__nc")).as("cos"))
    assert(sorted(agg) === sorted(win),
      "aggTopK (min-k of (-score, id)) must replay the desc window order")
    // long score, ascending (the ADC-distance cuts), payload rides along
    val winL = Skew.saltedTopK(df, Seq(col("query_id")),
      Seq(col("lscore").asc, col("neighbor_id").asc),
      col("neighbor_id"), k = 3, numSalts = 4, rankCol = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("lscore"), col("cos"))
    val aggL = Skew.aggTopK(df, Seq(col("query_id")),
      struct(col("lscore"), col("neighbor_id").as("neighbor_id"),
        col("cos").as("cos")),
      k = 3, rankCol = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("lscore"), col("cos"))
    assert(sorted(aggL) === sorted(winL),
      "aggTopK must replay the asc window order and carry payload fields")
  }

  test("aggTopKArray equals sort_array(collect_list) of the window top-k") {
    val rnd = new scala.util.Random(20260820)
    val rows = (0L until 25L).flatMap { g =>
      val n = if (g % 6 == 0) 3 else 40 // some groups smaller than k
      (0 until n).map(i => (g, rnd.nextLong().abs))
    }.distinct
    val df = rows.toDF("g", "h").repartition(7)
    // window formulation: rank asc, keep k, collect sorted
    val win = Skew.saltedTopK(df, Seq(col("g")), Seq(col("h").asc),
        col("h"), k = 8, numSalts = 4)
      .groupBy(col("g")).agg(sort_array(collect_list(col("h"))).as("mins"))
    val agg = Skew.aggTopKArray(df, Seq(col("g")), col("h"), k = 8,
      outCol = "mins")
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(agg) === m(win),
      "aggTopKArray's sorted array must equal the window min-k list")
  }

  test("aggTopK null ordering DIVERGES from a desc window (documented contract)") {
    // A rank window ordered `score desc` puts NULL scores LAST (they
    // only surface when a group has < k non-null rows); aggTopK's
    // struct min-k is nulls-FIRST, so a NULL score WINS a heap slot.
    // This is the documented divergence behind aggTopK's non-null
    // order-field contract (every caller guarantees non-null scores) —
    // this row pins the divergence so a future nullable-score caller
    // trips here instead of silently shipping window-inequivalent cuts.
    val df = Seq[(Long, Long, java.lang.Double)](
      (1L, 10L, 0.9), (1L, 11L, null), (1L, 12L, 0.5), (1L, 13L, 0.7))
      .toDF("g", "id", "score")
    val win = Skew.saltedTopK(df, Seq(col("g")),
      Seq(col("score").desc, col("id").asc), col("id"), k = 2, numSalts = 2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val agg = Skew.aggTopK(df, Seq(col("g")),
      struct((-col("score")).as("__ns"), col("id").as("id")), k = 2)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(win === Seq(10L, 13L), "desc window ranks non-null scores first")
    assert(agg === Seq(10L, 11L),
      "aggTopK's struct min-k is nulls-first — NULL beats every score; " +
        "callers MUST keep order-prefix fields non-null")
  }

  test("joinSizeForecast reliable=true needs a checkpoint dir, then matches the default path") {
    import spark.implicits._
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y")).toDF("k")
    val b = (Seq.fill(2)("x") ++ Seq("z")).toDF("k")
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) {
      // without a checkpoint dir the reliable variant must fail fast
      // with guidance, not at job time deep inside the checkpoint
      val e = intercept[IllegalArgumentException] {
        Skew.joinSizeForecast(a, b, Seq("k"), reliable = true)
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    }
    sc.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("skew-ckpt-").toString)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(Skew.joinSizeForecast(a, b, Seq("k"), reliable = true))
      === rows(Skew.joinSizeForecast(a, b, Seq("k"))),
      "the fault-tolerant checkpoint path must not change the forecast")
  }
}
