package graft.transform

import graft.SparkSpec

class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse: hand-computed fusion with k=60") {
    // a: r1=1 r2=3 -> 1/61 + 1/63; b: r1=2 r2=1 -> 1/62 + 1/61;
    // c: r1=3 r2=2 -> 1/63 + 1/62
    // b > a > c (b has the two best ranks)
    val r1 = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "rank")
    val r2 = Seq(("b", 1), ("c", 2), ("a", 3)).toDF("id", "rank")
    val out = Ranking.rrfFuse(Seq("x" -> r1, "y" -> r2), "id", "rank")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq("b", "a", "c"))
    assert(out(0) === (("b", 2L, 1L, 1.0 / 62 + 1.0 / 61)))
    assert(out(1) === (("a", 1L, 3L, 1.0 / 61 + 1.0 / 63)))
    assert(out(2) === (("c", 3L, 2L, 1.0 / 63 + 1.0 / 62)))
  }

  test("rrfFuse: id missing from one list contributes zero, keeps NULL rank") {
    val r1 = Seq(("a", 1), ("b", 2)).toDF("id", "rank")
    val r2 = Seq(("b", 1)).toDF("id", "rank")
    val out = Ranking.rrfFuse(Seq("x" -> r1, "y" -> r2), "id", "rank")
      .collect().map(r => (r.getString(0),
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
          Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3)))).toMap
    assert(out("a") === ((Some(1L), None, 1.0 / 61)))
    assert(out("b") === ((Some(2L), Some(1L), 1.0 / 62 + 1.0 / 61)))
  }

  test("topNRanker equals the naive global window ranking cut at n") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // scores with ties (30 twice, 10 twice) — tie-break is id asc
    val df = Seq(("u1", 30L), ("u2", 50L), ("u3", 30L), ("u4", 10L),
      ("u5", 40L), ("u6", 10L), ("u7", 25L)).toDF("id", "score")
    val naive = df.withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .where(col("rank") <= 4).select("id", "rank")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Ranking.topNRanker(df, "id", "score", 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === naive)
    assert(got === Map("u2" -> 1L, "u5" -> 2L, "u1" -> 3L, "u3" -> 4L))
    // n beyond the frame: every row ranked, nothing dropped
    val all = Ranking.topNRanker(df, "id", "score", 100)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all.size === 7 && all("u6") === 7L && all("u4") === 6L)
  }
}
