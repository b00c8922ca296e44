package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared scaffold under [[AsOfJoin]]'s three direction variants
  * (backward / forward / nearest): right-side prefix aliasing, the
  * `_right` collision discipline, key-space dedup, the
  * `agg(struct(order…))` argopt, `__best` unpacking, and the final
  * null-padding left join. The three variants were byte-identical
  * except for the time predicate, the optional extra order column, and
  * max-vs-min — exactly the copy-drift hazard the Stats binning
  * extraction closed (VERDICT r17 #7), applied here before the copies
  * diverge.
  */
private[transform] object AsOfJoinImpl {

  /** @param timeCond   direction predicate(s) built from
    *                   (prefixed right, key space, prefix)
    * @param extraOrder order columns PREPENDED to (ts, values…) in the
    *                   argopt struct (the nearest join's |Δ|)
    * @param useMax     true = latest-wins (backward), false =
    *                   earliest/closest-wins (forward, nearest)
    */
  def argOptJoin(
      left: DataFrame, right: DataFrame, on: Seq[String],
      leftTsCol: String, rightTsCol: String, label: String,
      timeCond: (DataFrame, DataFrame, String) => Seq[Column],
      extraOrder: (DataFrame, DataFrame, String) => Seq[Column],
      useMax: Boolean): DataFrame = {
    require(on.nonEmpty, s"$label needs at least one equi key")
    val p = "__asof_r_"
    val rightP = right.select(
      right.columns.toIndexedSeq.map(c => col(c).as(p + c)): _*)
    val valueCols = right.columns.filterNot(c => on.contains(c)).toSeq
    // output naming: every right value column whose name collides with
    // a left column (timestamp or otherwise) gets a `_right` suffix, so
    // the final using-join emits no duplicate names / ambiguous refs
    val leftCols = left.columns.toSet
    def outName(c: String): String =
      if (leftCols.contains(c)) s"${c}_right" else c
    val rightTsOut = outName(rightTsCol)
    val rightOutNames =
      rightTsOut +: valueCols.filterNot(_ == rightTsCol).map(outName)
    val residual = rightOutNames.filter(leftCols.contains) ++
      rightOutNames.diff(rightOutNames.distinct)
    require(residual.isEmpty,
      s"$label output names collide even after _right suffixing: " +
        residual.distinct.mkString(", "))

    // keyspace dedup: the result depends only on (keys, left ts)
    val keySpace =
      left.select((on :+ leftTsCol).distinct.map(col): _*).distinct()
    val equi = on.map(k => rightP(p + k) === keySpace(k))
    val cond = equi ++ timeCond(rightP, keySpace, p)
    val orderCols = extraOrder(rightP, keySpace, p) ++
      (rightP(p + rightTsCol).as("__ts") +:
        valueCols.filterNot(_ == rightTsCol).zipWithIndex.map {
          case (c, i) => rightP(p + c).as(s"__v$i")
        })
    val argOpt =
      if (useMax) max(struct(orderCols: _*)) else min(struct(orderCols: _*))
    val best = rightP.join(keySpace, cond.reduce(_ && _), "inner")
      .groupBy((on.map(keySpace(_)) :+ keySpace(leftTsCol)): _*)
      .agg(argOpt.as("__best"))
    val cleaned = best.select(
      (on :+ leftTsCol).map(col) ++
        (col("__best.__ts").as(rightTsOut) +:
          valueCols.filterNot(_ == rightTsCol).zipWithIndex.map {
            case (c, i) => col(s"__best.__v$i").as(outName(c))
          }): _*)
    left.join(cleaned, (on :+ leftTsCol).distinct, "left")
  }
}
