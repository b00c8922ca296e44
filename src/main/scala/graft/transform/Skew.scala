package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the 100 TB posture: a single
  * key with 1% of 100 TB melts one reducer). AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) covers
  * sort-merge joins at runtime; these helpers cover the cases AQE
  * doesn't: skewed aggregations and broadcast-ineligible skewed joins.
  */
object Skew {

  /** Two-phase salted aggregation for skewed groupBy keys.
    *
    * Phase 1 groups by (key, salt) — the hot key spreads over
    * `numSalts` reducers; phase 2 merges the partials by key. Caller
    * supplies both the partial aggregates and how to merge them, e.g.
    * {{{
    * Skew.saltedAggregate(df, Seq("k"), 32,
    *   partial = Seq(sum("v").as("s"), count(lit(1)).as("c")),
    *   merge   = Seq(sum("s").as("sum_v"), sum("c").as("n")))
    * }}}
    * Algebraic aggregates only (sum/count/min/max — avg must be
    * decomposed into sum+count by the caller, as above).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted join of a skewed fact side against a dimension: the fact
    * side gets a random salt in [0, numSalts); the dimension is
    * replicated once per salt value; the join key becomes (key, salt).
    * Use when the dimension is too big to broadcast but the fact side
    * has hot keys. Replication factor = numSalts × |dim|.
    */
  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      numSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    // The dimension is replicated numSalts×, so any join type that can
    // emit unmatched DIM rows (right/full outer) would emit each of them
    // numSalts times. Only fact-preserving joins are correct here.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left-family joins only, got '$joinType' " +
        "(right/full outer would duplicate unmatched dimension rows)")
    val saltedFact = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
