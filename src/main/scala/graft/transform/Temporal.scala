package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair and event-log versioning — the two
  * temporal reshapes every feature pipeline needs between raw events
  * and model-ready features: gap-fill (resample sparse per-key series
  * onto a dense grid, forward-filling the last observation) and SCD2
  * (collapse an event log into slowly-changing-dimension validity
  * intervals).
  *
  * Scale (100 TB posture): both operators shuffle ONCE on the entity
  * key and stay there. Gap-fill deliberately avoids the textbook
  * grid-LEFT-JOIN-observations plan (which shuffles three times: span
  * agg, grid↔obs join on (key, bucket), then a re-shuffle back to key
  * for the fill window): each observation instead EMITS its own carry
  * range `[bucket, next_bucket)` from one lead() window — no join
  * exists at all, the fill value rides along with the cell, and the
  * result is provably identical (every grid cell lies in exactly one
  * inter-observation segment, and its forward-fill source is that
  * segment's opening observation). SCD2's change-detection window, run
  * aggregation (grouping on (key, run) is satisfied by hash
  * partitioning on key alone) and closing lead() window all reuse one
  * key partitioning. PlanSpec pins both exchange counts.
  *
  * The gap-fill valve for a pathological key (one event in 1970, next
  * one today → a 470k-cell hourly segment) is `maxCarrySteps` — a
  * forward-fill TTL: an observation is carried at most that many grain
  * steps, after which the key's grid goes dark until its next
  * observation (exactly the staleness bound a feature store wants,
  * rather than unbounded interpolation from stale data).
  */
object Temporal {

  /** Dense per-key grid at `grain` (a Spark interval literal string
    * like "1 hour") between each key's first and last observed bucket,
    * with observation values carried forward across unobserved cells.
    * `observed` must be one row per (key, bucket) — pre-aggregate
    * first. Emits (key, bucket, value, filled_value, is_gap): `value`
    * is the observation or 0 on synthesized cells (kept non-null so
    * the cross-engine gate never meets a nullable-int column),
    * `filled_value` is the segment's opening observation, and `is_gap`
    * marks synthesized cells.
    */
  def gapFill(observed: DataFrame, keyCol: String, bucketCol: String,
      valueCol: String, grain: String = "1 hour",
      maxCarrySteps: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val segEnd0 = coalesce(
      lead(col(bucketCol), 1).over(w) - expr(s"INTERVAL $grain"),
      col(bucketCol))
    val segEnd =
      if (maxCarrySteps <= 0L) segEnd0
      else least(segEnd0,
        col(bucketCol) + expr(s"INTERVAL $maxCarrySteps ${grainUnit(grain)}"))
    observed
      .withColumn("seg_end", segEnd)
      .select(col(keyCol), col(bucketCol).as("seg_start"),
        col(valueCol).as("obs"), col("seg_end"))
      .select(col(keyCol), col("seg_start"), col("obs"),
        explode(expr(s"sequence(seg_start, seg_end, INTERVAL $grain)")).as(bucketCol))
      .select(col(keyCol), col(bucketCol),
        when(col(bucketCol) === col("seg_start"), col("obs")).otherwise(lit(0L))
          .as(valueCol),
        col("obs").as(s"filled_$valueCol"),
        (col(bucketCol) =!= col("seg_start")).cast("int").as("is_gap"))
  }

  private def grainUnit(grain: String): String = grain.split("\\s+") match {
    case Array("1", unit) => unit.toUpperCase
    case _ => throw new IllegalArgumentException(
      s"maxCarrySteps needs a unit grain like '1 hour', got '$grain'")
  }

  /** First-order Markov transition matrix of an event log: counts and
    * row-normalized probabilities of `attrCol` → next `attrCol` within
    * each key's (tsCol, tieCol)-ordered sequence. The probability is a
    * SINGLE division of two exact long counts — bit-identical
    * cross-engine, no rounding step (CLAUDE.md's reproducible-ratio
    * rule). Scale: one window pass on the key partitioning emits the
    * consecutive pairs; everything after operates on at most
    * |attr domain|² rows, so the share window's single-partition
    * stage is bounded by the domain, never the corpus.
    */
  def transitionMatrix(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val pairs = events
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col(attrCol), 1).over(w))
      .filter(col("to_type").isNotNull)
    pairs.groupBy(col(attrCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("p_next",
        col("n").cast("double") / col("n_from").cast("double"))
  }

  /** SCD Type-2 intervals from an event log: consecutive runs of equal
    * `attrCol` per key (ordered by `tsCol`, ties broken by `tieCol`)
    * become one version row with `[valid_from_us, valid_to_us)` epoch-µs
    * validity, 1-based `version`, the run's row count, and
    * `is_current` on each key's open version (whose `valid_to_us` is
    * the -1 sentinel rather than NULL — a NULL BIGINT degrades to
    * float64 in the cross-engine gate and 2^63-scale sentinels don't
    * round-trip through doubles).
    */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("us"), col(tieCol))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = events
      .select(col(keyCol), col(attrCol), unix_micros(col(tsCol)).as("us"), col(tieCol))
      .withColumn("changed",
        (lag(col(attrCol), 1).over(wOrd).isNull
          || lag(col(attrCol), 1).over(wOrd) =!= col(attrCol)).cast("long"))
      .withColumn("version", sum(col("changed")).over(wRun))
    val runs = marked.groupBy(col(keyCol), col("version"), col(attrCol))
      .agg(min(col("us")).as("valid_from_us"), count(lit(1)).as("n_events"))
    // close over VERSION order, not valid_from_us: two consecutive runs
    // can open at the same microsecond (tieCol-separated events), and
    // version is strictly increasing along the true run order while
    // equal valid_from_us ties are nondeterministic
    val wNext = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    runs
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(wNext), lit(-1L)))
      .withColumn("is_current", (col("valid_to_us") === -1L).cast("int"))
  }
}
