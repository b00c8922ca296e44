package graft.transform

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The skyline operator (Börzsönyi et al., ICDE 2001): per group, the
  * Pareto frontier of points maximizing two integer dimensions —
  * p dominates q iff `x_p >= x_q`, `y_p >= y_q` and at least one is
  * strict; the skyline is every undominated point.
  *
  * The naive formulation is a quadratic dominance anti-join (NOT
  * EXISTS over the same set) — O(n²) per group and a driver-killer at
  * scale. This implementation is the sort-based 2D rewrite: group by
  * x, keep each x's max y, take the RUNNING max of those maxima over
  * descending x, and a point survives iff its y strictly beats every
  * higher-x maximum (and equals its own x's maximum). One keyed
  * window over |distinct x| rows per group + one keyed semi-join back
  * — O(n log n) by shuffle, no pairwise anything. Equal (x, y)
  * duplicates are all on the skyline (no strict coordinate between
  * them), matching the dominance definition exactly.
  *
  * Exactness: pure integer comparisons — the ORACLE runs the naive
  * NOT EXISTS dominance form, so the hash gate is a machine-checked
  * proof that the windowed rewrite computes the identical frontier.
  *
  * Scale valve: the window partitions per (group, distinct x) — if a
  * single group's x-cardinality outgrows a reducer, pre-bucket x
  * (coarsen to x div B): a coarser frontier is a superset filter that
  * a second exact pass over the survivors refines; survivors of a 2D
  * skyline are at most |distinct x| rows, output-scale by definition.
  */
object Skyline {

  /** Per-group 2D skyline, maximizing integer columns `xCol`, `yCol`. */
  def skyline2D(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val g = groupCols.map(col)
    val perX = df.groupBy(g :+ col(xCol): _*)
      .agg(max(col(yCol)).as("__my"))
    val wx = Window.partitionBy(g: _*).orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontierX = perX
      .withColumn("__above", max(col("__my")).over(wx))
      .filter(col("__above").isNull || col("__my") > col("__above"))
      .select(g :+ col(xCol) :+ col("__my").as(yCol): _*)
    // a USING semi-join moves the join keys to the front — put the
    // caller's column order back
    df.join(frontierX, groupCols :+ xCol :+ yCol, "leftsemi")
      .select(df.columns.map(col): _*)
  }
}
