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

  /** Integer `div` over computed columns (the registry's IntegralDivide
    * — same operator the `a div b` SQL spelling resolves to; DuckDB's
    * `//` matches it for non-negative operands, the only way this file
    * ever calls it).
    */
  private def idiv(a: Column, b: Column): Column = call_function("div", a, b)

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

  /** Linear interpolation onto a dense grid — [[gapFill]]'s sibling
    * for continuous signals (sensor readings, prices, utilization):
    * unobserved cells get the straight line between the bracketing
    * observations instead of a carried copy. Same segment-emit plan:
    * ONE key-partitioned lead() window hands each observation its
    * successor (bucket, value), and the pair emits its own grid cells
    * `[bucket, next_bucket)` — no grid frame, no join, nothing after
    * the single key shuffle. The trailing observation emits only
    * itself (no extrapolation past the data).
    *
    * Exactness (the fixed-point interpolation recipe): values are
    * integer cents, positions integer µs, and the interpolated cell is
    * `v0 + ((v1−v0)·(h−t0)) div (t1−t0)` — but spelled from whichever
    * endpoint makes the numerator NON-negative (`v1 ≥ v0` rises from
    * v0, falls mirror from v1 with the distance complemented), because
    * Spark's `div` and DuckDB's `//` only agree on floor semantics for
    * non-negative operands (CLAUDE.md). Both spellings are the same
    * rational rounded toward the segment's lower-valued endpoint, so
    * the gate is pure-integer. Cents·µs products need
    * max_cents·segment_µs < 2⁶³ — holds for any sane signal (10⁶
    * cents over a century is 4·10¹⁷).
    *
    * Valve: `maxSpanSteps` — segments longer than that many grain
    * steps emit ONLY their opening observation (an interpolated value
    * bridging a week-long sensor outage is fabricated data, and an
    * unbounded segment is also the one way this operator's output
    * outgrows its input); TemporalSpec pins that the valve only ever
    * REMOVES synthesized cells, never changes surviving values.
    */
  def interpolateLinear(observed: DataFrame, keyCol: String,
      bucketCol: String, centsCol: String, grain: String = "1 hour",
      maxSpanSteps: Long = 0L): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(bucketCol))
    val stepUs = maxSpanSteps // steps valve evaluated on µs distance below
    val base = observed
      .select(col(keyCol), col(bucketCol), col(centsCol))
      .withColumn("next_bucket", lead(col(bucketCol), 1).over(w))
      .withColumn("next_cents", lead(col(centsCol), 1).over(w))
      .withColumn("seg_end",
        coalesce(col("next_bucket") - expr(s"INTERVAL $grain"), col(bucketCol)))
    val gated =
      if (maxSpanSteps <= 0L) base
      else base.withColumn("seg_end",
        when(col("next_bucket").isNull, col(bucketCol))
          .when(col("next_bucket") - expr(s"INTERVAL $stepUs ${grainUnit(grain)}")
            > col(bucketCol), col(bucketCol))
          .otherwise(col("seg_end")))
    val t0 = unix_micros(col(bucketCol))
    val t1 = unix_micros(col("next_bucket"))
    val h = unix_micros(col("grid_bucket"))
    val rise = col(centsCol) +
      idiv(((col("next_cents") - col(centsCol)) * (h - t0)).cast("long"),
        t1 - t0)
    val fall = col("next_cents") +
      idiv(((col(centsCol) - col("next_cents")) * (t1 - h)).cast("long"),
        t1 - t0)
    gated
      .select(col(keyCol), col(bucketCol), col(centsCol),
        col("next_bucket"), col("next_cents"),
        explode(expr(s"sequence($bucketCol, seg_end, INTERVAL $grain)"))
          .as("grid_bucket"))
      .select(col(keyCol), col("grid_bucket").as(bucketCol),
        when(col("grid_bucket") === col(bucketCol), col(centsCol))
          .when(col("next_cents") >= col(centsCol), rise)
          .otherwise(fall)
          .cast("long").as(s"interp_$centsCol"),
        (col("grid_bucket") =!= col(bucketCol)).cast("int").as("is_interp"))
  }

  /** Leakage-safe K-fold split for time-series models (purged /
    * embargoed cross-validation, de Prado 2018): the span
    * [min_ts, max_ts] divides into K contiguous validation blocks;
    * for each fold, training additionally drops the EMBARGO window —
    * the `embargoUs` microseconds immediately after the validation
    * block — so features computed from post-block rows (which overlap
    * the block through lags/windows) can't leak the validation answer
    * into training. Emits one row per fold: the block's µs bounds and
    * the val/embargo/train row counts.
    *
    * Exactness: fold of an event is `((t−mn)·K) div span` with
    * `span = mx−mn+1` (the +1 pins max into fold K−1); the block
    * boundary is the inverse image `end_f = mn + ceil((f+1)·span/K)`
    * spelled `(x + K − 1) div K` — all non-negative integer µs, so
    * both engines assign every row identically and the counts gate
    * exactly.
    *
    * Scale: ONE pass computes fold assignments row-locally against the
    * broadcast 1-row bounds frame and aggregates counts map-side (≤ K
    * groups); the embargo counts join rows to the K-row fold frame on
    * a range predicate — a broadcast loop over K rows per event, i.e.
    * O(K) comparisons per row and output bounded by the embargo hits.
    * Nothing global, no window, no sort.
    */
  def purgedTimeFolds(df: DataFrame, tsCol: String, k: Int,
      embargoUs: Long): DataFrame = {
    require(k >= 2, "purgedTimeFolds needs k >= 2")
    require(embargoUs >= 0, "embargo must be non-negative")
    val us = unix_micros(col(tsCol))
    val bounds = df.agg(min(us).as("mn"), max(us).as("mx"))
      .withColumn("span", col("mx") - col("mn") + 1L)
    val assigned = df.select(us.as("t"))
      .crossJoin(broadcast(bounds))
      .withColumn("fold", idiv((col("t") - col("mn")) * k, col("span")))
    val valCounts = assigned.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_val"))
    // every row is provably assigned a fold in [0, k-1], so the total
    // is the k-row summary's own sum — a separate df.agg would pay a
    // THIRD full input scan for a number already computed (the q184
    // derive-scalars-from-the-summary posture)
    val total = valCounts.agg(
      coalesce(sum(col("n_val")), lit(0L)).as("n_total"))
    val folds = bounds.select(
      expr(s"explode(sequence(cast(0 as bigint), cast(${k - 1} as bigint)))")
        .as("fold"),
      col("mn"), col("mx"), col("span"))
      .withColumn("val_start_us",
        col("mn") + idiv(col("fold") * col("span") + (k - 1), lit(k.toLong)))
      .withColumn("val_end_us",
        col("mn") + idiv((col("fold") + 1L) * col("span") + (k - 1),
          lit(k.toLong)))
    val embargo = assigned.join(broadcast(folds.select(
        col("fold").as("e_fold"), col("val_end_us"))),
        col("t") >= col("val_end_us") &&
          col("t") < col("val_end_us") + embargoUs)
      .groupBy(col("e_fold").as("fold"))
      .agg(count(lit(1)).as("n_embargo"))
    folds
      .join(valCounts, Seq("fold"), "left")
      .join(embargo, Seq("fold"), "left")
      .crossJoin(broadcast(total))
      .select(col("fold"), col("val_start_us"), col("val_end_us"),
        coalesce(col("n_val"), lit(0L)).as("n_val"),
        coalesce(col("n_embargo"), lit(0L)).as("n_embargo"),
        (col("n_total") - coalesce(col("n_val"), lit(0L))
          - coalesce(col("n_embargo"), lit(0L))).as("n_train"))
  }

  /** Seasonal profile extraction — the classical-decomposition
    * "seasonal" component in EXACT integer arithmetic: the per-key
    * hourly cent series is detrended by a centered 24-hour moving
    * SUM (rows [-11, +12]; only full windows count), and because
    * `residual·24 = cents·24 − trendSum` stays integer, the
    * hour-of-day seasonal means assemble as exact DECIMAL numerators
    * with ONE final division — no running double means, nothing
    * association-dependent (the corrByKey discipline applied to
    * time-series decomposition).
    *
    * Scale: the window rides the per-key HOURLY aggregate — time-
    * domain-bounded (24·365·years rows per key), never the event
    * stream (the q70 EWMA posture); everything else is keyed aggs
    * with map-side partials. `cents·24` is exact while hourly totals
    * stay < 2⁵⁸ cents.
    */
  def seasonalProfile(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valueCol: String): DataFrame = {
    require(keyCols.nonEmpty, "seasonalProfile needs key columns")
    val keys = keyCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val hourly = df
      // FLOOR division into hour buckets: bare `div` truncates toward
      // zero, which would make bucket 0 two hours wide around the epoch
      // for pre-1970 data (the oracle's date_trunc('hour') spelling
      // floors); subtracting the pmod remainder first makes div exact
      // and floor-consistent for either sign
      .select(keys :+ expr(s"(unix_timestamp($tsCol) - " +
        s"pmod(unix_timestamp($tsCol), 3600)) div 3600").as("__hr") :+
        graft.transform.Stats.cents(col(valueCol)).as("__cents"): _*)
      .groupBy(keys :+ col("__hr"): _*)
      .agg(sum(col("__cents")).as("__c"))
    val w = Window.partitionBy(keys: _*).orderBy(col("__hr").asc)
      .rowsBetween(-11, 12)
    val prof = hourly
      .withColumn("__tsum", sum(col("__c")).over(w))
      .withColumn("__tn", count(col("__c")).over(w))
      // full AND CONTIGUOUS windows only: a ROWS frame spans 24
      // observed rows, so an idle-hour gap would silently splice
      // non-adjacent hours into one "day" — the integer span check
      // (max−min = 23) rejects spliced frames exactly
      .withColumn("__hspan", max(col("__hr")).over(w) - min(col("__hr")).over(w))
      .filter(col("__tn") === 24L && col("__hspan") === 23L)
      // pmod, never %: Spark % takes the dividend's sign, so pre-1970
      // hours (negative __hr) would land in [-23, 0] and silently miss
      // the 0..23 grid join — zero coverage reported on full data
      .select(keys :+ pmod(col("__hr"), lit(24L)).as("hour_of_day") :+
        (col("__c") * 24L - col("__tsum")).as("__r24"): _*)
      .groupBy(keys :+ col("hour_of_day"): _*)
      .agg(count(lit(1)).as("n_windows"),
        sum(col("__r24").cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("long").as("seasonal_num"))
    // emit the FULL key × 24 grid: a series too sparse for any full
    // contiguous day reads as explicit zero coverage (n_windows = 0,
    // seasonal NULL), not as silently missing hours
    val grid = df.select(keys: _*).distinct()
      .select(keys :+ explode(sequence(lit(0L), lit(23L)))
        .as("hour_of_day"): _*)
    grid.join(prof, keyCols :+ "hour_of_day", "left")
      .select(keys ++ Seq(col("hour_of_day"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("seasonal_num"), lit(0L)).as("seasonal_num")): _*)
      .withColumn("seasonal",
        when(col("n_windows") > 0L, col("seasonal_num").cast("double") /
          (lit(24.0) * col("n_windows").cast("double"))))
  }

  /** CUSUM changepoint scan over per-hour event counts — the classic
    * Page (1954) cumulative-sum detector a pipeline runs on every
    * ingestion stream to catch level shifts (a source going quiet, a
    * crawler doubling its rate) that per-hour threshold alerts miss.
    * For each key the hourly count series `x_h` is centered on the
    * key's own mean and scanned both ways:
    * `C⁺_h = max(0, C⁺_{h-1} + (x_h - mean))` catches upward shifts,
    * `C⁻_h` downward. The recursion is rewritten join-free as
    * prefix-sum minus running-min (`C⁺_h = cum_h - min_{0≤j≤h} cum_j`
    * with the virtual `cum_0 = 0` — TemporalSpec pins the equivalence
    * against the sequential recursion) — the same recurrence, but
    * expressible as two frame windows instead of a sequential loop.
    *
    * Exactness: the mean is never divided out — deviations are scaled
    * by the key's bucket count (`d_h = n_h·x_h - total`, an integer),
    * so every prefix sum, extremum, and the `1/thresholdDen`
    * mass-fraction alarm test (`den·C > n_h·total`, compared in
    * DECIMAL so no overflow) are exact integer arithmetic —
    * bit-identical cross-engine with no rounding step anywhere.
    *
    * Scale: the only event-scale work is the (key, hour) counting agg
    * (map-side partials). Everything after rides the hourly frame,
    * whose per-key partition is time-range-bounded (a year is 8.8k
    * rows), so the scan windows are partitioned by key — never global;
    * the per-key totals frame is key-cardinality-sized and broadcast.
    *
    * @return one audit row per key: bucket count, total events, peak
    *         CUSUM each way, the changepoint hour (peak-C⁺ argmax,
    *         ties to the earliest hour), and the alarm-hour count.
    */
  def cusumChangepoints(events: DataFrame, keyCol: String, tsCol: String,
      thresholdDen: Int = 16): DataFrame = {
    require(thresholdDen >= 2, "cusumChangepoints needs thresholdDen >= 2")
    val hourly = events
      .select(col(keyCol).as("__k"), date_trunc("hour", col(tsCol)).as("__h"))
      .groupBy(col("__k"), col("__h")).agg(count(lit(1)).as("__x"))
    val tot = hourly.groupBy(col("__k"))
      .agg(count(lit(1)).as("__nh"), sum(col("__x")).as("__tot"))
    val wc = Window.partitionBy(col("__k")).orderBy(col("__h").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = "decimal(38,0)"
    val scanned = hourly.join(broadcast(tot), Seq("__k"))
      .withColumn("__d", col("__nh") * col("__x") - col("__tot"))
      .withColumn("__cum", sum(col("__d")).over(wc))
      // the running extrema must include the virtual cum_0 = 0 (the
      // recursion starts at C=0), hence the least/greatest clamps
      .withColumn("__pos", col("__cum") - least(min(col("__cum")).over(wc), lit(0L)))
      .withColumn("__neg", greatest(max(col("__cum")).over(wc), lit(0L)) - col("__cum"))
      .withColumn("__alarm",
        (col("__pos").cast(dec) * thresholdDen >
          col("__nh").cast(dec) * col("__tot")) ||
        (col("__neg").cast(dec) * thresholdDen >
          col("__nh").cast(dec) * col("__tot")))
    scanned.groupBy(col("__k").as(keyCol))
      .agg(
        max(col("__nh")).as("n_hours"),
        max(col("__tot")).as("total_events"),
        max(col("__pos")).as("max_cusum_pos"),
        max(col("__neg")).as("max_cusum_neg"),
        max(struct(col("__pos"), (-unix_micros(col("__h"))).as("__nus")))
          .as("__cp"),
        sum(when(col("__alarm"), 1L).otherwise(0L)).as("n_alarm_hours"))
      .withColumn("cp_hour", timestamp_micros(-col("__cp.__nus")))
      .drop("__cp")
  }

  /** Watermark-delay planning: the event-time LATENESS profile of a log
    * under its arrival order. Lateness of an event is how far the
    * high-watermark (max event-time seen so far, in arrival order =
    * `seqCol`) has already advanced past the event's own timestamp —
    * exactly the quantity Structured Streaming's `withWatermark` delay
    * must exceed for the event NOT to be dropped. The profile (late
    * counts at 0 / 1 min / 1 h, max, exact µs sum per `byCol`) is how
    * one picks the delay before turning on a streaming aggregation.
    *
    * Scale: the naive formulation is a running max over the GLOBAL
    * arrival order — an unpartitioned window, the canonical single-
    * reducer scale-killer. This implementation is the classic two-level
    * distributed prefix scan instead: (1) events bucket into contiguous
    * arrival chunks of `chunkSize` (`seqCol div chunkSize`); (2) a keyed
    * agg reduces each chunk to its max timestamp — the summary frame is
    * 1/chunkSize the input (12k rows per 100M events) and the ONLY
    * unpartitioned window runs over that metadata-scale frame to form
    * exclusive prefix maxima (recurse the same construction if even that
    * frame ever outgrows one reducer); (3) the prefix max broadcasts
    * back onto the events, where a CHUNK-PARTITIONED running max
    * finishes the scan locally. The oracle is spelled as the naive
    * global window, so the hash gate doubles as a machine-checked proof
    * that the chunked scan is lossless.
    */
  def latenessProfile(events: DataFrame, seqCol: String, tsCol: String,
      byCol: String, chunkSize: Long = 8192L): DataFrame = {
    require(chunkSize >= 2, "latenessProfile needs chunkSize >= 2")
    val e = events.select(col(seqCol).as("__seq"), col(byCol),
        unix_micros(col(tsCol)).as("__us"))
      .withColumn("__chunk", expr(s"__seq div ${chunkSize}L"))
    val chunkMax = e.groupBy(col("__chunk")).agg(max(col("__us")).as("__cmax"))
    val wc = Window.orderBy(col("__chunk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = chunkMax
      .withColumn("__pmax", max(col("__cmax")).over(wc))
      .select(col("__chunk"), col("__pmax"))
    val wi = Window.partitionBy(col("__chunk")).orderBy(col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.join(broadcast(prefix), Seq("__chunk"))
      .withColumn("__run", max(col("__us")).over(wi))
      .withColumn("__late",
        greatest(coalesce(col("__pmax"), col("__run")), col("__run")) -
          col("__us"))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__late") > 0L, 1L).otherwise(0L)).as("n_late"),
        sum(when(col("__late") > 60L * 1000000L, 1L).otherwise(0L))
          .as("n_late_1m"),
        sum(when(col("__late") > 3600L * 1000000L, 1L).otherwise(0L))
          .as("n_late_1h"),
        max(col("__late")).as("max_late_us"),
        sum(col("__late")).as("sum_late_us"))
  }

  /** k-step Markov absorption probability — "what's the chance this
    * state reaches `target` within `steps` transitions?" on the
    * empirical transition matrix (the forward-looking companion to the
    * q88 transition readout and the q101/q120 funnels). The target is
    * IMPOSED absorbing (p = 1 at every step) and the recursion is
    * `p'(s) = Σ_t c(s,t)·p(t) div c(s)` in FIXED-POINT integers
    * (scale 2²⁰) — the q91 PageRank device — so every round is exact
    * integer arithmetic and the whole recursion replays in a DuckDB
    * recursive CTE, floor-divisions and all. The emitted probability
    * `p/2²⁰` is a dyadic division: exact in both engines, no rounding
    * column needed.
    *
    * Scale: the event log is touched ONCE (per-key lag window → counts);
    * the iteration runs on the states² transition frame — metadata,
    * checkpointed once; `steps` tiny broadcast joins follow. States
    * with no outgoing transitions re-enter each round with p = 0 via
    * the left join (they can't reach anything).
    */
  def markovAbsorption(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String, target: String, steps: Int = 8,
      scaleBits: Int = 20): DataFrame = {
    require(steps >= 1 && scaleBits >= 10 && scaleBits <= 30,
      "markovAbsorption needs steps >= 1 and a sane fixed-point scale")
    val scale = 1L << scaleBits
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val tr = events
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__to", lead(col(attrCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(attrCol).as("from_s"), col("__to").as("to_s"))
      .agg(count(lit(1)).as("c"))
    val totals = tr.groupBy(col("from_s")).agg(sum(col("c")).as("ct"))
    val trC = tr.join(totals, "from_s").localCheckpoint(true)
    val states = events.select(col(attrCol).as("s")).distinct()
      .localCheckpoint(true)
    def absorb(p: Column): Column =
      when(col("s") === target, lit(scale)).otherwise(p)
    var p = states.select(col("s"), absorb(lit(0L)).as("p"))
      .localCheckpoint(true)
    for (_ <- 1 to steps) {
      val stepped = trC
        .join(p.select(col("s").as("to_s"), col("p").as("__pt")), "to_s")
        .groupBy(col("from_s"))
        .agg(sum(col("c") * col("__pt")).as("__num"), max(col("ct")).as("__ct"))
        .select(col("from_s").as("s"), expr("__num div __ct").as("__pn"))
      p = states.join(stepped, Seq("s"), "left")
        .select(col("s"), absorb(coalesce(col("__pn"), lit(0L))).as("p"))
        .localCheckpoint(true)
    }
    p.select(col("s"), col("p").as("p_scaled"),
      (col("p").cast("double") / lit(scale.toDouble)).as("prob"))
  }

  /** Kaplan-Meier survival estimator — the retention/churn curve with
    * right-censoring done honestly: subjects still active at the
    * observation cutoff aren't counted as churned, they leave the risk
    * set at their censoring time. Input is one row per SUBJECT with an
    * integer duration (`durCol`, e.g. hours from first to last event)
    * and `observedCol` ∈ {0,1} (1 = the terminal event happened, 0 =
    * censored). Emits, per distinct duration t (ascending): the risk
    * set `n_risk` (subjects with duration ≥ t), events `d_events`,
    * censored `c_censored`, and `s_hat = Π_{s≤t, d_s>0}(1 − d_s/n_s)`.
    *
    * Scale: one keyed aggregation collapses subjects to the
    * DISTINCT-duration frame (bounded by the time domain — hours in a
    * month: ≤744 — not the subject count), and the product runs as a
    * single unpartitioned window over that metadata-scale frame (the
    * q184 posture). `n_risk` derives from `N − Σ prior counts` — no
    * per-subject window, no self-join.
    *
    * Exactness: `n/d/c` are exact longs; `ln(1 − d/n)` terms accumulate
    * on the frame-order-pinned running sum (≤ domain-size terms × 1 ulp,
    * inside the pround(6) budget — the PMI/PSI ln rule); a step where
    * EVERYONE at risk dies (d = n) sends the product exactly to 0 from
    * that step on (flagged via a running max, since ln(0) can't ride
    * the sum).
    */
  def kaplanMeier(subjects: DataFrame, durCol: String,
      observedCol: String): DataFrame = {
    val byDur = subjects
      .groupBy(col(durCol).cast("long").as("t"))
      .agg(sum(when(col(observedCol) === 1L, 1L).otherwise(0L)).as("d_events"),
        sum(when(col(observedCol) === 1L, 0L).otherwise(1L)).as("c_censored"))
    val total = byDur.agg(
      sum(col("d_events") + col("c_censored")).as("__n_total"))
    val wPrior = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = byDur.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("__n_total") -
          coalesce(sum(col("d_events") + col("c_censored")).over(wPrior),
            lit(0L)))
    val term = when(col("d_events") === 0L, lit(0.0))
      .when(col("d_events") < col("n_risk"),
        log(lit(1.0) - col("d_events").cast("double") /
          col("n_risk").cast("double")))
    val zeroed = max(when(col("d_events") === col("n_risk"), 1L)
      .otherwise(0L)).over(wRun)
    withRisk
      .withColumn("__lns", sum(term).over(wRun))
      .withColumn("__zero", zeroed)
      .select(col("t"), col("n_risk"), col("d_events"), col("c_censored"),
        when(col("__zero") === 1L, lit(0.0))
          .otherwise(graft.util.Rounding.pround(exp(col("__lns")), 6))
          .as("s_hat"))
  }
}
