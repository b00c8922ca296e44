package graft.transform

import graft.SparkSpec

/** Pins for [[Skyline.skyline2D]]: hand frontier with equal-x /
  * equal-point edge cases, and seeded-random equivalence against the
  * quadratic dominance reference.
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(String, Long, Long, Long)]) =
    pts.filter { p =>
      !pts.exists(q => q._1 == p._1
        && q._3 >= p._3 && q._4 >= p._4
        && (q._3 > p._3 || q._4 > p._4))
    }.toSet

  private def run(pts: Seq[(String, Long, Long, Long)]) =
    Skyline.skyline2D(pts.toDF("g", "id", "x", "y"), Seq("g"), "x", "y")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("hand frontier: staircase, dominated interior, equal-x and duplicate points") {
    val pts = Seq(
      ("a", 1L, 10L, 1L),  // frontier (highest x)
      ("a", 2L, 8L, 5L),   // frontier
      ("a", 3L, 8L, 3L),   // equal-x, lower y -> dominated by id 2
      ("a", 4L, 5L, 5L),   // dominated by id 2 (x strict, y equal)
      ("a", 5L, 3L, 9L),   // frontier
      ("a", 6L, 3L, 9L),   // duplicate of id 5 -> BOTH on the frontier
      ("a", 7L, 2L, 2L),   // dominated
      ("b", 8L, 1L, 1L))   // other group: alone, on its frontier
    val got = run(pts)
    assert(got === Set(
      ("a", 1L, 10L, 1L), ("a", 2L, 8L, 5L),
      ("a", 5L, 3L, 9L), ("a", 6L, 3L, 9L),
      ("b", 8L, 1L, 1L)))
    assert(got === brute(pts))
  }

  test("property: equals the quadratic dominance reference on seeded random sets") {
    val rnd = new scala.util.Random(2026)
    for (round <- 1 to 6) {
      val pts = (1 to 120).map(i =>
        (s"g${rnd.nextInt(3)}", i.toLong,
          rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      assert(run(pts) === brute(pts), s"round=$round")
    }
  }
}
