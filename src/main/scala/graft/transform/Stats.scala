package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust / exact statistical profiling operators over integer-cents
  * columns — the corpus-health side of a training-data pipeline
  * (feature distributions, outlier screens, cross-feature drift).
  *
  * Everything here is built to be HASH-GATEABLE against a second
  * engine, which constrains the arithmetic (see CLAUDE.md's
  * wide-double-sum rule):
  *   - inputs are integer cents (exact in binary64 far past 2^31),
  *   - exact quantiles are taken only at dyadic probabilities
  *     (k/2^m — 0.25, 0.5, 0.75, …): the interpolation position
  *     `(n-1)*p` then has a dyadic fractional part, so
  *     `lo*(1-d) + hi*d` and `lo + d*(hi-lo)` both evaluate to the
  *     same exact rational on integer inputs — the result is
  *     bit-identical across engines REGARDLESS of which interpolation
  *     spelling they use,
  *   - moment sums are DECIMAL (Spark) / HUGEINT (DuckDB) — exact —
  *     and only converted to double for the final closed-form ratio,
  *     which both engines then evaluate with the identical IEEE op
  *     sequence.
  *
  * Scale posture: exact per-group quantiles buffer each group's value
  * multiset on one reducer (Spark's `percentile` keeps a value→count
  * map, so memory is per-group CARDINALITY, bounded here by the cents
  * value range, not row count). For unbounded-cardinality columns at
  * 100 TB the valve is `approx_percentile` (t-digest, mergeable
  * map-side) at the cost of leaving the hash gate — same trade as
  * [[graft.ops.Corpus.profileApprox]]. Everything else below is plain
  * keyed aggregation with map-side partials plus broadcast joins of
  * group-cardinality-sized stats frames — no windows, no driver loops.
  */
object Stats {

  private def centsExpr(valueCol: Column): Column =
    floor(valueCol * 100 + 0.5).cast("long")

  /** Exact interpolated quantiles per key at dyadic probabilities.
    * Emits one row per key: `n` plus one double column per requested
    * probability, named `p25`, `p50`, … (`p` + round(prob*100)).
    */
  def quantilesByKey(df: DataFrame, keyCols: Seq[String], centsCol: String,
      probs: Seq[Double]): DataFrame = {
    require(keyCols.nonEmpty, "quantilesByKey needs at least one key column")
    require(probs.nonEmpty, "quantilesByKey needs at least one probability")
    require(probs.forall(p => p > 0 && p < 1 && (p * 64).isWhole),
      s"probabilities must be dyadic in (0,1) (k/64) for cross-engine " +
        s"bit-exactness, got $probs")
    val arr = probs.map(p => p.toString).mkString(", ")
    val qs = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        expr(s"percentile($centsCol, array($arr))").as("__q"))
    val named = probs.zipWithIndex.map { case (p, i) =>
      element_at(col("__q"), i + 1).as(s"p${math.round(p * 100)}")
    }
    qs.select(keyCols.map(col) ++ (col("n") +: named): _*)
  }

  /** Median / MAD (median absolute deviation) outlier screen per key —
    * the robust alternative to [[Transforms.zscoreNormalize]]'s
    * mean/stddev (which a single corrupt value can drag arbitrarily;
    * the median breaks down only past 50% contamination). Flags values
    * with `|x - median| > k * MAD`.
    *
    * Exactness: median of integer cents is a multiple of 0.5,
    * deviations are multiples of 0.5, MAD is a multiple of 0.25, and
    * `k*MAD` is exact for integer k — so the outlier comparison and
    * every emitted number are bit-identical cross-engine with no
    * rounding step at all.
    *
    * Two aggregation passes (MAD is a quantile OF deviations from a
    * quantile — inherently two-phase); the deviation frame is persisted
    * so the input is scanned once across them (no eager unpersist — the
    * frame must stay registered until the CALLER's action runs, and
    * the CacheManager dedupes identical plans on repeat invocations,
    * the catalog-wide pattern since q60); both stats frames are
    * group-cardinality-sized broadcasts.
    */
  def madOutliers(df: DataFrame, keyCols: Seq[String], centsCol: String,
      k: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "madOutliers needs at least one key column")
    val keys = keyCols.map(col)
    val med = df.groupBy(keys: _*)
      .agg(expr(s"percentile($centsCol, 0.5)").as("med"))
    val dev = df.join(broadcast(med), keyCols)
      .withColumn("__dev", abs(col(centsCol).cast("double") - col("med")))
      .persist()
    val mad = dev.groupBy(keys: _*)
      .agg(expr("percentile(__dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), keyCols)
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum((col("__dev") > col("mad") * k).cast("long")).as("n_outliers"))
  }

  /** Pearson correlation + OLS slope per key from EXACT moment sums.
    * `xCol`/`yCol` must be long (integer cents). Sums accumulate as
    * DECIMAL(38,0) (products of two DECIMAL(19,0) casts — exact), and
    * the closed forms
    * `corr = (n·Sxy − Sx·Sy) / sqrt((n·Sxx − Sx²)(n·Syy − Sy²))`,
    * `slope = (n·Sxy − Sx·Sy) / (n·Sxx − Sx²)`
    * are evaluated in double with a fixed op sequence (sqrt is
    * IEEE-correctly-rounded, so the whole expression is reproducible;
    * the 6dp pround absorbs the one non-deterministic step — the
    * DECIMAL→double conversions round identically anyway).
    *
    * This is why the built-in `corr()` is NOT used: it accumulates
    * running double moments whose value depends on partition order.
    * Zero-variance groups (the ANSI DIVIDE_BY_ZERO trap) yield NULL.
    * One keyed shuffle with map-side partials; output is
    * group-cardinality rows.
    */
  def corrByKey(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "corrByKey needs at least one key column")
    val x = col(xCol).cast("decimal(19,0)")
    val y = col(yCol).cast("decimal(19,0)")
    val sums = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n").cast("double")
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val vx = nD * d("sxx") - d("sx") * d("sx")
    val vy = nD * d("syy") - d("sy") * d("sy")
    import graft.util.Rounding.pround
    sums.select(keyCols.map(col) ++ Seq(
      col("n"),
      when(vx > 0 && vy > 0, pround(cov / sqrt(vx * vy), 6))
        .otherwise(lit(null).cast("double")).as("corr"),
      when(vx > 0, pround(cov / vx, 6))
        .otherwise(lit(null).cast("double")).as("slope")): _*)
  }

  /** Per-key ordinary least squares — slope, intercept, and R² of
    * y on x, the drift-trend readout for feature monitoring ("is this
    * feature's mean moving, and how fast"). Same exact-moment
    * discipline as [[corrByKey]]: DECIMAL(38,0) ↔ HUGEINT sums (exact
    * in any aggregation order at any scale), ONE correctly-rounded
    * conversion to double per sum, then a closed-form expression tree
    * spelled identically in the oracle — bit-reproducible before the
    * final pround(6). Degenerate keys (zero x-variance) emit NULLs.
    * One keyed agg with map-side partials; no window, no join.
    */
  def olsByKey(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "olsByKey needs at least one key column")
    val x = col(xCol).cast("decimal(19,0)")
    val y = col(yCol).cast("decimal(19,0)")
    val sums = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"),
        sum(x * y).as("sxy"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n").cast("double")
    val cov = nD * d("sxy") - d("sx") * d("sy")
    val vx = nD * d("sxx") - d("sx") * d("sx")
    val vy = nD * d("syy") - d("sy") * d("sy")
    import graft.util.Rounding.pround
    sums.select(keyCols.map(col) ++ Seq(
      col("n"),
      when(vx > 0, pround(cov / vx, 6))
        .otherwise(lit(null).cast("double")).as("slope"),
      when(vx > 0, pround((d("sy") - (cov / vx) * d("sx")) / nD, 6))
        .otherwise(lit(null).cast("double")).as("intercept"),
      when(vx > 0 && vy > 0, pround((cov * cov) / (vx * vy), 6))
        .otherwise(lit(null).cast("double")).as("r2")): _*)
  }

  /** Equal-width histogram over an integer-cents column: `nBuckets`
    * buckets spanning [min, max], bucket id assigned with PURE integer
    * arithmetic (`(v − min) · n div (max − min + 1)`) so boundaries are
    * exact in any engine — no float width, no edge-epsilon. Emits
    * per-bucket count and observed lo/hi. The bounds row is a 1-row
    * broadcast; assignment is row-local; one keyed agg on the bucket id
    * (≤ nBuckets groups — map-side partials collapse each task's
    * contribution to ≤ nBuckets rows, so the shuffle is trivially
    * small at any scale).
    */
  def histogramFixedWidth(df: DataFrame, centsCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, "histogramFixedWidth needs at least one bucket")
    val bounds = df.agg(min(col(centsCol)).as("__mn"), max(col(centsCol)).as("__mx"))
    df.crossJoin(broadcast(bounds))
      .select(
        // own-bounds values are always in range, so bucketExpr's edge
        // clamp is an identity here — one formula definition everywhere
        bucketExpr(centsCol, nBuckets).as("bucket"),
        col(centsCol))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col(centsCol)).as("lo_cents"),
        max(col(centsCol)).as("hi_cents"))
  }

  /** The 100 TB valve for equal-frequency bucketing (q56's NTILE and
    * [[quantilesByKey]]'s exact percentile both funnel a whole group
    * through one reducer): approximate quantile cutpoints via the
    * mergeable t-digest sketch (`approxQuantile`, map-side combinable,
    * driver gets only `nBuckets-1` doubles), then row-LOCAL bucket
    * assignment against the literal cutpoints — no window, no
    * per-group reducer, bounded memory at any scale. The trade is
    * approximate bucket boundaries (relativeError-controlled), which
    * is why this is spec-covered rather than hash-gated — the exact
    * forms remain the oracle surface.
    *
    * Assignment is a chain of `(v > cutᵢ)` increments — codegen-
    * friendly branch-free comparisons, fine for the tens-of-buckets
    * regime this is for (use [[histogramFixedWidth]]'s integer
    * arithmetic for fixed-width at higher bucket counts).
    */
  def rangeBucketize(df: DataFrame, centsCol: String, nBuckets: Int,
      relativeError: Double = 0.001): DataFrame = {
    require(nBuckets >= 2, "rangeBucketize needs at least two buckets")
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val cuts = df.stat.approxQuantile(centsCol, probs, relativeError)
    val bucket = cuts.foldLeft(lit(0L)) { (acc, c) =>
      acc + (col(centsCol) > c).cast("long")
    }
    df.withColumn("bucket", bucket)
  }

  /** The reference-defined equal-width bucket id of `centsCol` —
    * `((x − __mn) · B) div (__mx − __mn + 1)`, edge-clamped into
    * [0, B): drift INTO the tails must land somewhere visible, not
    * drop. Expects the `__mn`/`__mx` bounds columns in scope (the
    * broadcast-bounds device). ONE definition (VERDICT r17 #7) — this
    * formula used to be spelled in eight places across this file and
    * the copies were one edit away from drifting apart; every oracle
    * replays it literally, so it must stay a single source of truth.
    */
  private[graft] def bucketExpr(centsCol: String, nBuckets: Int): Column =
    least(lit(nBuckets - 1L), greatest(lit(0L),
      expr(s"(($centsCol - __mn) * $nBuckets) div (__mx - __mn + 1)")))
      .cast("long")

  /** The shared binning scaffold under the ref/cur drift monitors
    * ([[psiByKey]] / [[jsdByKey]] / [[emdByKey]] — VERDICT r17 #7):
    * reference bounds broadcast onto both slices, [[bucketExpr]]
    * bucket counts per (key, bucket), per-key totals, and the DENSE
    * keys×buckets grid left-joined with zero-coalesced counts —
    * emitting exactly (keys..., bucket, n_ref, n_cur, nt_ref, nt_cur).
    * A bucket that lost ALL current mass (the strongest drift signal)
    * still contributes a row. Scale posture shared by all three
    * monitors: two keyed bucket-count aggs with map-side partials,
    * broadcast count frames, nothing corpus-sized past the first
    * aggregation.
    */
  private def refCurBucketGrid(ref: DataFrame, cur: DataFrame,
      keyCols: Seq[String], centsCol: String, nBuckets: Int): DataFrame = {
    val keys = keyCols.map(col)
    val bounds = ref.agg(min(col(centsCol)).as("__mn"),
      max(col(centsCol)).as("__mx"))
    def bucketed(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(bounds))
        .select(keys :+ bucketExpr(centsCol, nBuckets).as("bucket"): _*)
        .groupBy(keys :+ col("bucket"): _*)
        .agg(count(lit(1)).as("n"))
    val refCounts = bucketed(ref).withColumnRenamed("n", "n_ref")
    val curCounts = bucketed(cur).withColumnRenamed("n", "n_cur")
    val refTotals = ref.groupBy(keys: _*).agg(count(lit(1)).as("nt_ref"))
    val curTotals = cur.groupBy(keys: _*).agg(count(lit(1)).as("nt_cur"))
    val grid = ref.select(keys: _*).distinct()
      .select(keys :+ explode(sequence(lit(0L), lit(nBuckets - 1L)))
        .as("bucket"): _*)
    grid
      .join(broadcast(refCounts), keyCols :+ "bucket", "left")
      .join(broadcast(curCounts), keyCols :+ "bucket", "left")
      .join(broadcast(refTotals), keyCols)
      .join(broadcast(curTotals), keyCols, "left")
      .select(keys ++ Seq(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        col("nt_ref"), coalesce(col("nt_cur"), lit(0L)).as("nt_cur")): _*)
  }

  /** Population Stability Index between a reference and a current
    * slice, per key — THE production drift monitor for feature
    * distributions (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25
    * alarm). Reference data defines `nBuckets` equal-width bins (its
    * own min/max; current values outside clamp into the edge bins —
    * drift INTO the tails must land somewhere visible, not drop);
    * counts are Laplace-smoothed (+1 per bin) so empty bins stay
    * finite without an arbitrary epsilon; the per-bin contribution is
    * `(p−q)·ln(p/q)`.
    *
    * Gate-ability: every probability is a single division of exact
    * integers (identical binary64 cross-engine), `ln` is the one
    * ±1-ulp step (absorbed by the 6dp pround on a bins×keys-bounded
    * output), and the headline PSI is emitted as a RUNNING sum over
    * the bucket order (`psi_cum` at the last bucket) — a window frame
    * sums sequentially in frame order in any engine, so the
    * association is pinned where a plain `sum()`'s grouping-order
    * dependence would break the hash.
    *
    * Scale: two keyed bucket-count aggs (map-side partials; output is
    * keys×bins rows), a keys×bins grid from the distinct-keys frame,
    * and broadcast joins of the count/total frames. Nothing
    * corpus-sized past the first aggregation.
    */
  def psiByKey(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
      centsCol: String, nBuckets: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "psiByKey needs at least one key column")
    require(nBuckets >= 2, "psiByKey needs at least two buckets")
    val keys = keyCols.map(col)
    val p = (col("n_ref") + 1).cast("double") /
      (col("nt_ref") + nBuckets).cast("double")
    val q = (col("n_cur") + 1).cast("double") /
      (col("nt_cur") + nBuckets).cast("double")
    val contrib = (p - q) * log(p / q)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    import graft.util.Rounding.pround
    refCurBucketGrid(ref, cur, keyCols, centsCol, nBuckets)
      .select(keys ++ Seq(col("bucket"), col("n_ref"), col("n_cur"),
        pround(contrib, 6).as("contrib"),
        pround(sum(contrib).over(w), 6).as("psi_cum")): _*)
  }

  /** Weight-of-evidence / information-value feature screen (the
    * credit-scoring classic, the third member of the screening family
    * beside q109's χ² and q216's AUC): per feature, `nBuckets`
    * equal-width bins over its own min/max, per-bin
    * `WOE = ln(p_good/p_bad)` on Laplace-smoothed (+1) shares and
    * `IV = Σ (p_good − p_bad)·WOE` — IV < 0.02 useless, 0.1–0.3
    * medium, > 0.5 suspicious. Same gate-ability contract as
    * [[psiByKey]]: exact-integer divisions, one ±1-ulp `ln` absorbed
    * by pround(6) on a bins-bounded output, and the headline IV as a
    * RUNNING sum in bucket order (`iv_cum` at the last bucket).
    *
    * Scale: per-feature bounds (keyed agg, broadcast back), two keyed
    * aggs, a features×bins grid — nothing corpus-sized past the first
    * aggregation.
    */
  def woeIv(df: DataFrame, keyCols: Seq[String], centsCol: String,
      labelCol: String, nBuckets: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "woeIv needs at least one key column")
    require(nBuckets >= 2, "woeIv needs at least two buckets")
    val keys = keyCols.map(col)
    val bounds = df.groupBy(keys: _*)
      .agg(min(col(centsCol)).as("__mn"), max(col(centsCol)).as("__mx"))
    val binned = df.join(broadcast(bounds), keyCols)
      .select(keys ++ Seq(
        bucketExpr(centsCol, nBuckets).as("bucket"),
        col(labelCol).cast("long").as("__lab")): _*)
      .groupBy(keys :+ col("bucket"): _*)
      .agg(sum(col("__lab")).as("n_good"),
        sum(lit(1L) - col("__lab")).as("n_bad"))
    val totals = df.groupBy(keys: _*)
      .agg(sum(col(labelCol).cast("long")).as("__g"),
        sum(lit(1L) - col(labelCol).cast("long")).as("__b"))
    val grid = df.select(keys: _*).distinct()
      .select(keys :+ explode(sequence(lit(0L), lit(nBuckets - 1L))).as("bucket"): _*)
    val pg = (col("n_good") + 1).cast("double") /
      (col("__g") + nBuckets).cast("double")
    val pb = (col("n_bad") + 1).cast("double") /
      (col("__b") + nBuckets).cast("double")
    val woe = log(pg / pb)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    import graft.util.Rounding.pround
    grid
      .join(broadcast(binned), keyCols :+ "bucket", "left")
      .join(broadcast(totals), keyCols)
      .select(keys ++ Seq(col("bucket"),
        coalesce(col("n_good"), lit(0L)).as("n_good"),
        coalesce(col("n_bad"), lit(0L)).as("n_bad"),
        col("__g"), col("__b")): _*)
      .select(keys ++ Seq(col("bucket"), col("n_good"), col("n_bad"),
        pround(woe, 6).as("woe"),
        pround(sum((pg - pb) * woe).over(w), 6).as("iv_cum")): _*)
  }

  /** Exact per-key Gini coefficient over an integer measure — the
    * concentration audit (is a source's token budget dominated by a
    * few documents?): `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over the
    * ascending sort of x.
    *
    * Scale (the q104 lesson applied up front): the textbook
    * formulation ranks every ROW with a per-key window — a whole key
    * through one reducer. This computes the identical sums from the
    * VALUE-DOMAIN aggregation instead: group by (key, value) first
    * (map-side partials), then for each value-block of size c
    * starting after `start` prior rows, `Σ i over the block =
    * c·start + c(c+1)/2`, so `Σ i·x` needs only a running count over
    * the per-key DISTINCT-value frame — bounded by the value domain
    * (token counts: thousands), not the corpus. Σ i·x over tied
    * values is permutation-invariant, which is exactly why the
    * block substitution is lossless — and the ORACLE is written in
    * the naive row-ranked form, so the hash gate machine-checks that
    * equivalence.
    *
    * Exactness: block terms assemble in DECIMAL and re-emit as longs
    * (exact while Σ i·x < 2⁶³ — i·x tops out at n·max(x), so fine
    * until a single key holds ~10⁹ docs of ~10⁴ tokens; past that
    * emit the DECIMAL raw); `gini` is one division of exact
    * once-converted operands (`num / (n·total)` with the denominator
    * as a product of two exact doubles — deterministic IEEE both
    * engines). Degenerate keys (total = 0) guard to NULL under ANSI.
    */
  def giniByKey(df: DataFrame, keyCols: Seq[String], valCol: String): DataFrame = {
    require(keyCols.nonEmpty, "giniByKey needs at least one key column")
    val keys = keyCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(col(valCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column) = c.cast("decimal(19,0)")
    val vals = df.groupBy(keys :+ col(valCol): _*).agg(count(lit(1)).as("__c"))
    val blocks = vals
      .withColumn("__start", sum(col("__c")).over(w) - col("__c"))
      .withColumn("__inner",
        (dec(col("__c")) * dec(col("__start")) +
          dec(expr("(__c * (__c + 1)) div 2"))).cast("decimal(38,0)")
          .cast("long"))
    val agg = blocks.groupBy(keys: _*)
      .agg(sum(col("__c")).as("n"),
        sum(col(valCol) * col("__c")).as("total"),
        sum((dec(col(valCol)) * dec(col("__inner"))).cast("decimal(38,0)"))
          .cast("decimal(38,0)").cast("long").as("__iwx"))
    val num = lit(2L) * col("__iwx") - (col("n") + 1L) * col("total")
    agg.select(keys ++ Seq(col("n"), col("total"), num.as("gini_num"),
      when(col("total") > 0L, num.cast("double") /
        (col("n").cast("double") * col("total").cast("double")))
        .as("gini")): _*)
  }

  /** Jensen-Shannon divergence between a reference and a current
    * slice, per key — the BOUNDED, symmetric drift monitor that
    * completes the battery: PSI ([[psiByKey]]) explodes to ∞ as a bin
    * empties, KS ([[ksTestByKey]]) sees only the worst single CDF
    * gap, W₁ ([[emdByKey]]) is scale-dependent; JSD is symmetric,
    * finite by construction (≤ ln 2 nats), and the natural alarm when
    * distributions may drift into regions the reference never saw.
    * `JSD = ½·KL(p‖m) + ½·KL(q‖m)` with `m = (p+q)/2`, over the same
    * binning contract as PSI (reference-defined equal-width bins,
    * edge-clamped current, Laplace-smoothed counts).
    *
    * Gate-ability (the [[psiByKey]] discipline): p and q are each ONE
    * division of exact integers; `m = (p+q)·0.5` is one addition and
    * an exact dyadic halving; each `ln` is the ±1-ulp step, absorbed
    * by the 6dp pround on a keys×bins-bounded output; the headline
    * rides the frame-order-pinned running sum (`jsd_cum` at the last
    * bucket).
    *
    * Scale: identical posture to PSI — two keyed bucket-count aggs
    * with map-side partials, a keys×bins grid, broadcast count
    * frames; nothing corpus-sized past the first aggregation.
    */
  def jsdByKey(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
      centsCol: String, nBuckets: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "jsdByKey needs at least one key column")
    require(nBuckets >= 2, "jsdByKey needs at least two buckets")
    val keys = keyCols.map(col)
    val p = (col("n_ref") + 1).cast("double") /
      (col("nt_ref") + nBuckets).cast("double")
    val q = (col("n_cur") + 1).cast("double") /
      (col("nt_cur") + nBuckets).cast("double")
    val m = (p + q) * 0.5
    val contrib = (p * log(p / m) + q * log(q / m)) * 0.5
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    import graft.util.Rounding.pround
    refCurBucketGrid(ref, cur, keyCols, centsCol, nBuckets)
      .select(keys ++ Seq(col("bucket"), col("n_ref"), col("n_cur"),
        pround(contrib, 6).as("contrib"),
        pround(sum(contrib).over(w), 6).as("jsd_cum")): _*)
  }

  /** Earth-mover (Wasserstein-1) drift between a reference and a
    * current slice, per key — the metric-space drift monitor beside
    * [[psiByKey]] (density ratios) and [[ksTestByKey]] (max CDF gap):
    * W₁ integrates the WHOLE CDF gap, so it sees gradual mass shifts
    * KS's single max understates and PSI's log-ratios blur. Same
    * binning contract as PSI (reference defines `nBuckets` equal-width
    * bins; current clamps into the edge bins).
    *
    * Exactness: per bucket the normalized CDF gap rides the exact
    * integer cross product `|cum_ref·nt_cur − cum_cur·nt_ref|` in
    * DECIMAL(38,0) ↔ HUGEINT (the [[corrByKey]] discipline — no
    * float CDFs, so the bucket sum is associative), and the headline
    * `emd = Σ|·| / (nt_ref·nt_cur·B)` is ONE division of two
    * once-converted exact operands — bitwise cross-engine, no
    * rounding column. Cumulative counts ride key-partitioned running
    * windows over the bin order (frame-order-pinned).
    *
    * Scale: identical posture to PSI — two keyed bucket aggs with
    * map-side partials, a keys×bins grid, broadcast count frames;
    * nothing corpus-sized past the first aggregation. The emitted
    * numerator is cast to BIGINT for the gate — exact while
    * `nt_ref·nt_cur ≤ ~9·10¹⁸` (beyond that emit the DECIMAL raw).
    */
  def emdByKey(ref: DataFrame, cur: DataFrame, keyCols: Seq[String],
      centsCol: String, nBuckets: Int = 10): DataFrame = {
    require(keyCols.nonEmpty, "emdByKey needs at least one key column")
    require(nBuckets >= 2, "emdByKey needs at least two buckets")
    val keys = keyCols.map(col)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys: _*).orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column) = c.cast("decimal(19,0)")
    val joined = refCurBucketGrid(ref, cur, keyCols, centsCol, nBuckets)
      .withColumn("cum_ref", sum(col("n_ref")).over(w))
      .withColumn("cum_cur", sum(col("n_cur")).over(w))
      .withColumn("gap",
        abs(dec(col("cum_ref")) * dec(col("nt_cur")) -
          dec(col("cum_cur")) * dec(col("nt_ref"))).cast("decimal(38,0)"))
    joined
      .groupBy(keys ++ Seq(col("nt_ref"), col("nt_cur")): _*)
      .agg(sum(col("gap")).cast("decimal(38,0)").as("__num"))
      .select(keys ++ Seq(col("nt_ref"), col("nt_cur"),
        col("__num").cast("long").as("emd_num"),
        when(col("nt_ref") > 0 && col("nt_cur") > 0,
          col("__num").cast("double") /
            (dec(col("nt_ref")) * dec(col("nt_cur")) * lit(nBuckets.toLong))
              .cast("decimal(38,0)").cast("double"))
          .otherwise(lit(null).cast("double")).as("emd")): _*)
  }

  /** Winsorization — clip a cents column at per-key quantile bounds
    * before aggregating, the standard tame-the-tails step ahead of
    * mean-based features (unlike [[madOutliers]]' flag-and-drop, every
    * row survives, pulled to the fence). The fences are DYADIC
    * quantiles (1/16 and 15/16 by default — see [[quantilesByKey]] for
    * why dyadic probs are bit-exact cross-engine), so each clipped
    * value is an exact multiple of 1/16: the emitted sum is over
    * `clipped·16` INTEGERS — exact in any aggregation order at any
    * scale, no rounding step.
    */
  def winsorizeByKey(df: DataFrame, keyCols: Seq[String], centsCol: String,
      pLo: Double = 0.0625, pHi: Double = 0.9375): DataFrame = {
    require(pLo < pHi, s"need pLo < pHi, got $pLo >= $pHi")
    // exact-sum contract: each clipped value is a multiple of
    // 1/denom(p) (integer values, dyadic interpolation position), so
    // the integer-sum scale must be the probabilities' own dyadic
    // denominator — a fixed ×16 silently truncates for k/32 or k/64
    // fences, which quantilesByKey permits
    val scale = Seq(pLo, pHi).map { p =>
      Iterator.iterate(1L)(_ * 2).take(7).find(s => (p * s).isWhole)
        .getOrElse(throw new IllegalArgumentException(
          s"winsorize fences must be dyadic (k/64 at most), got $p"))
    }.max
    val fences = quantilesByKey(df, keyCols, centsCol, Seq(pLo, pHi))
      .withColumnRenamed(s"p${math.round(pLo * 100)}", "lo")
      .withColumnRenamed(s"p${math.round(pHi * 100)}", "hi")
      .drop("n")
    val c = col(centsCol).cast("double")
    val clipped = least(greatest(c, col("lo")), col("hi"))
    df.join(broadcast(fences), keyCols)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum((c < col("lo")).cast("long")).as("n_clipped_lo"),
        sum((c > col("hi")).cast("long")).as("n_clipped_hi"),
        sum((clipped * scale).cast("long")).as(s"sum_clipped_${scale}ths"))
  }

  /** Deterministic mode — the most frequent value per key, ties broken
    * toward the SMALLEST value so the result is a total-order argmax
    * rather than engine whim (DuckDB's `arg_max`/Spark's `mode` leave
    * ties unspecified — ungateable). One keyed counting agg over
    * (key, value) then ONE argmax agg via max(struct(n, −value)) — no
    * window, so no distinct-value-sized reducer partition; map-side
    * partials apply to both shuffles.
    */
  def modeByKey(df: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame = {
    // the smallest-value tie-break is spelled as max(struct(n, -v)):
    // a non-numeric value column would fail UnaryMinus analysis under
    // ANSI (or silently null out the tie-break without it) — reject it
    // with a named error instead
    require(df.schema(valueCol).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"modeByKey: value column '$valueCol' is " +
        s"${df.schema(valueCol).dataType.simpleString} — the smallest-" +
        "value tie-break negates the column, so it must be numeric " +
        "(encode categorical values to codes first)")
    df.groupBy(keyCols.map(col) :+ col(valueCol): _*)
      .agg(count(lit(1)).as("n"))
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col("n").as("__n"),
        (-col(valueCol)).as("__negv"))).as("__best"))
      .select(keyCols.map(col) ++ Seq(
        (-col("__best.__negv")).as("mode_value"),
        col("__best.__n").as("mode_n")): _*)
  }

  /** Rounded-cents helper shared by the catalog queries: `floor(v*100
    * + 0.5)` as long — the one rounding spelling that matches DuckDB's
    * `CAST(floor(value*100+0.5) AS BIGINT)` bit-for-bit. */
  def cents(valueCol: Column): Column = centsExpr(valueCol)

  /** CUPED variance reduction (Deng et al., WSDM 2013) — the A/B-test
    * readout adjusted by a pre-experiment covariate:
    * `ȳ_cuped(arm) = ȳ(arm) − θ·(x̄(arm) − x̄(global))` with
    * `θ = cov(x,y)/var(x)` POOLED across arms. Same exactness spine as
    * [[corrByKey]]: moments are DECIMAL(38,0) sums of integer
    * covariate/metric values (↔ DuckDB HUGEINT), converted to double
    * once; θ and each mean are single divisions, the adjustment is one
    * multiply + two subtractions in pinned order, pround(6) at the
    * end. Zero covariate variance → θ = 0 (no adjustment), not a
    * division error.
    *
    * Scale: one keyed agg per arm + a 1-row global moment frame that
    * cross-joins as a broadcast literal — the per-user frame never
    * shuffles twice. Arm cardinality bounds the output.
    */
  def cupedByArm(df: DataFrame, armCol: String, xCol: String,
      yCol: String): DataFrame = {
    import graft.util.Rounding.pround
    val x = col(xCol).cast("decimal(19,0)")
    val y = col(yCol).cast("decimal(19,0)")
    val g = df.agg(count(lit(1)).as("n_g"),
      sum(x).as("sx_g"), sum(y).as("sy_g"),
      sum(x * x).as("sxx_g"), sum(x * y).as("sxy_g"))
    val arms = df.groupBy(col(armCol))
      .agg(count(lit(1)).as("n_arm"),
        sum(x).as("sx_arm"), sum(y).as("sy_arm"))
    def d(c: String) = col(c).cast("double")
    val nG = col("n_g").cast("double")
    val cov = nG * d("sxy_g") - d("sx_g") * d("sy_g")
    val vx = nG * d("sxx_g") - d("sx_g") * d("sx_g")
    val theta = when(vx > 0, cov / vx).otherwise(lit(0.0))
    val nA = col("n_arm").cast("double")
    val meanY = d("sy_arm") / nA
    val adj = theta * (d("sx_arm") / nA - d("sx_g") / nG)
    arms.crossJoin(broadcast(g))
      .select(col(armCol), col("n_arm"),
        pround(meanY, 6).as("mean_y"),
        pround(theta, 6).as("theta"),
        pround(meanY - adj, 6).as("mean_y_cuped"))
  }

  /** Linear-counting distinct estimate per key (Whang et al. 1990) —
    * the bounded-state approximate-cardinality sketch: hash each value
    * into one of `m` md5 buckets, count occupied buckets `o`, estimate
    * `-m·ln(1 − o/m)`. Alongside the estimate the operator emits the
    * EXACT distinct count, which is what the oracle checks both
    * against — at 100 TB you drop the exact column (it shuffles the
    * full per-key value set; that is the point of the sketch) and keep
    * the sketch path, whose shuffled state is capped at `m` rows per
    * key no matter how many values arrive. A saturated sketch
    * (`o = m`, estimate −∞) yields NULL rather than a junk number —
    * size `m` well above the expected cardinality.
    *
    * Exactness: the bucket id is integer md5 arithmetic (identical hex
    * text cross-engine), `o` and the exact count are integers, and the
    * single `ln` rides CLAUDE.md's libm budget — one call per KEY
    * (domain-bounded output rows), rounded via pround(6).
    */
  def linearCountDistinct(df: DataFrame, keyCols: Seq[String],
      valueCol: String, m: Int = 4096): DataFrame = {
    require(m >= 2, "m must be >= 2")
    val keys = keyCols.map(col)
    val bucket = (conv(substring(md5(col(valueCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % m).as("bucket")
    // NULL values are excluded from both columns (countDistinct already
    // skips them; without this filter md5(NULL)'s NULL bucket would
    // count as occupied and the pair would disagree on null semantics)
    val occupied = df.filter(col(valueCol).isNotNull)
      .select(keys :+ bucket: _*).distinct()
      .groupBy(keys: _*).agg(count(lit(1)).as("occupied"))
    val exact = df.groupBy(keys: _*)
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    // left from exact so an all-NULL key still reports (0, 0, 0.0)
    exact.join(occupied, keyCols, "left")
      .withColumn("occupied", coalesce(col("occupied"), lit(0L)))
      .select((keyCols.map(col) :+ col("occupied") :+ col("exact_distinct")): _*)
      .withColumn("lc_estimate",
        when(col("occupied") >= m, lit(null).cast("double"))
          .otherwise(graft.util.Rounding.pround(
            lit(-m.toDouble) * log(lit(1.0) - col("occupied") / m.toDouble), 6)))
  }

  /** Exact ROC AUC per key from an INTEGER score column — the
    * Mann-Whitney rank-sum readout for model / ranking evaluation.
    * Ties use the standard mid-rank convention via the pair identity
    * `2U = Σ_s (2·pos(s)·negBelow(s) + pos(s)·neg(s))`: every term is
    * an exact long (pos/neg counts per distinct score, a running sum
    * of negatives strictly below), so `u2 = 2U` is exact and
    * `auc = u2 / (2·n_pos·n_neg)` is ONE IEEE division of exactly
    * represented integers — bit-identical in any engine, no rounding
    * step needed (requires 2·n_pos·n_neg < 2^53; at 2^53 pairs you
    * are past the point of an exact AUC anyway). Keys with no
    * positives or no negatives yield NULL.
    *
    * Scale: one keyed agg on (key, score) — map-side partials collapse
    * duplicate scores per task — then one per-key window over DISTINCT
    * scores and a final agg that reuses the same partitioning. State
    * is bounded by distinct scores per key; if an integer score is
    * genuinely unbounded-cardinality (raw µs latencies), pre-bucket it
    * ([[rangeBucketize]] / [[histogramFixedWidth]]'s integer buckets)
    * for a binned AUC with fixed state — the standard large-scale
    * trade.
    */
  def aucByKey(df: DataFrame, keyCols: Seq[String], scoreCol: String,
      labelCol: String): DataFrame = {
    require(keyCols.nonEmpty, "aucByKey needs at least one key column")
    val keys = keyCols.map(col)
    val byScore = df
      .groupBy(keys :+ col(scoreCol).cast("long").as("score"): _*)
      .agg(count(lit(1)).as("n_at"),
        sum(col(labelCol).cast("long")).as("pos_at"))
      .withColumn("neg_at", col("n_at") - col("pos_at"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("score").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val withBelow = byScore
      .withColumn("neg_below", coalesce(sum(col("neg_at")).over(w), lit(0L)))
    withBelow.groupBy(keys: _*)
      .agg(sum(col("pos_at")).as("n_pos"),
        sum(col("neg_at")).as("n_neg"),
        sum(lit(2L) * col("pos_at") * col("neg_below") +
          col("pos_at") * col("neg_at")).as("u2"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double")))
  }

  /** Flajolet–Martin / HyperLogLog-style distinct sketch per key —
    * the LOG-LOG state regime beyond [[linearCountDistinct]]: LC needs
    * a bucket per expected distinct value (m ≳ cardinality), HLL's m
    * registers of ~5 bits each estimate cardinalities orders of
    * magnitude beyond m. Value → md5; hex digits 1-? pick one of `m`
    * registers, and the register keeps the MAX of
    * `rho = 1 + zeros` — the 1-based position of the first set bit in
    * a 16-bit md5-derived probe word, spelled `17 − length(bin(v))`
    * (both engines' `bin()` of a positive integer is the minimal
    * binary string; no log2 near-power-of-two ulp hazard). Estimate:
    * `alpha_m · m² / Σ 2^−rho` with empty registers contributing 2⁰.
    *
    * Exactness: every 2^−rho is an exact dyadic double
    * (`power(2.0, −k)` is exact for integer k — CLAUDE.md) spanning
    * 2⁰..2⁻¹⁷, so the 64-term harmonic sum is EXACT in any
    * aggregation order — the one FP sum in this file that is safely
    * associative; the estimate is then one multiply by the
    * alpha·m² literal and one division, bit-identical cross-engine,
    * no rounding column. The EXACT distinct count rides along for the
    * gate (and is what you drop at 100 TB — register state is m rows
    * per key no matter how many values arrive, and MAX is the ideal
    * map-side partial).
    *
    * Bias note: the raw estimate is emitted without HLL's small-range
    * (linear-counting) or large-range corrections — [[
    * linearCountDistinct]] IS the small-range correction in this
    * catalog; pick by expected regime.
    */
  def hllDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    require(m <= 65536, "m beyond the 4-digit bucket slice")
    // the standard HLL bias constants (Flajolet et al. 2007)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val alphaM2 = alpha * m * m
    val keys = keyCols.map(col)
    val h = md5(col(valueCol).cast("string"))
    val bucket = conv(substring(h, 1, 4), 16, 10).cast("long") % m
    val probe = conv(substring(h, 5, 4), 16, 10).cast("long")
    val rho = when(probe === 0L, lit(17L))
      .otherwise(lit(17L) - length(bin(probe)))
    val registers = df.filter(col(valueCol).isNotNull)
      .select(keys :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy(keys :+ col("bucket"): _*)
      .agg(max(col("rho")).as("r"))
    val sketch = registers.groupBy(keys: _*)
      .agg(count(lit(1)).as("occupied"),
        sum(pow(lit(2.0), -col("r"))).as("harmonic_occ"))
      .withColumn("harmonic_sum",
        col("harmonic_occ") + (lit(m.toLong) - col("occupied")).cast("double"))
      .withColumn("hll_estimate", lit(alphaM2) / col("harmonic_sum"))
    val exact = df.groupBy(keys: _*)
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    exact.join(sketch, keyCols, "left")
      .select(keys ++ Seq(
        coalesce(col("occupied"), lit(0L)).as("occupied"),
        col("exact_distinct"),
        coalesce(col("harmonic_sum"), lit(m.toDouble)).as("harmonic_sum"),
        col("hll_estimate")): _*)
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic per key — the
    * distribution-drift test beside [[psiByKey]]: PSI needs reference
    * bins, KS compares the raw empirical CDFs and its statistic
    * `D = max |F₁(v) − F₂(v)|` is binning-free. Cleared of division:
    * `d_num = max |cum₁(v)·n₂ − cum₂(v)·n₁|` over the merged value
    * order — every term an exact long — and the emitted
    * `d = d_num/(n₁·n₂)` is ONE IEEE division, so the readout gates
    * bitwise with no rounding column (requires n₁·n₂ < 2⁶³ alongside
    * cum·n products — fine through ~10⁹-row groups).
    *
    * Scale: one keyed agg on (key, value) collapses duplicates
    * map-side, one per-key window over DISTINCT values accumulates
    * both CDFs (the group totals ride the same window, full-frame —
    * integer sums, order-insensitive), one final keyed max. State is
    * distinct values per key — same valve as [[aucByKey]]: pre-bucket
    * ([[rangeBucketize]]) an unbounded-cardinality value for a binned
    * D with fixed state.
    */
  def ksTestByKey(df: DataFrame, keyCols: Seq[String], valueCol: String,
      grpCol: String): DataFrame = {
    require(keyCols.nonEmpty, "ksTestByKey needs at least one key column")
    val keys = keyCols.map(col)
    val byValue = df
      .groupBy(keys :+ col(valueCol).cast("long").as("v"): _*)
      .agg(sum(when(col(grpCol) === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col(grpCol) === 2, 1L).otherwise(0L)).as("c2"))
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col("v").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
    byValue
      .withColumn("cum1", sum(col("c1")).over(wOrd))
      .withColumn("cum2", sum(col("c2")).over(wOrd))
      .withColumn("n1", sum(col("c1")).over(wAll))
      .withColumn("n2", sum(col("c2")).over(wAll))
      .groupBy(keys: _*)
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
          .as("d_num"))
      .withColumn("ks_d",
        when(col("n1") > 0 && col("n2") > 0,
          col("d_num").cast("double") / (col("n1") * col("n2")).cast("double")))
  }

  /** Spearman rank correlation per key — the robust, monotone-
    * association complement to [[corrByKey]]'s Pearson: correlate the
    * mid-rank-tied RANKS instead of the values. Ranks are exact
    * integers via `2·avgrank = 2·minrank + ties − 1` (the [[aucByKey]]
    * doubling trick — the ×2 cancels in the correlation), and the
    * correlation itself reuses [[corrByKey]]'s DECIMAL(38,0) ↔ HUGEINT
    * moment sums, so the only FP is the final closed form (pround 6).
    * Built-in `corr()` on ranks would be partition-order-dependent;
    * this is not.
    *
    * Scale: two rank windows + a tie-count window on ONE key
    * partitioning, then the single moment-sum agg. Per-key state is
    * the key's row count (a total order per key — the same boundary
    * as every exact-rank operator here; [[rangeBucketize]] is the
    * valve).
    */
  def spearmanByKey(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "spearmanByKey needs at least one key column")
    val keys = keyCols.map(col)
    val wX = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(xCol).asc)
    val wY = org.apache.spark.sql.expressions.Window
      .partitionBy(keys: _*).orderBy(col(yCol).asc)
    val wTieX = org.apache.spark.sql.expressions.Window
      .partitionBy(keys :+ col(xCol): _*)
    val wTieY = org.apache.spark.sql.expressions.Window
      .partitionBy(keys :+ col(yCol): _*)
    val ranked = df
      .withColumn("rx2",
        lit(2L) * rank().over(wX) + count(lit(1)).over(wTieX) - 1L)
      .withColumn("ry2",
        lit(2L) * rank().over(wY) + count(lit(1)).over(wTieY) - 1L)
    corrByKey(ranked, keyCols, "rx2", "ry2")
      .withColumnRenamed("corr", "spearman")
      .drop("slope")
  }

  /** Reliability-diagram calibration bins — [[aucByKey]]'s companion
    * model-eval readout: AUC checks RANKING, this checks whether the
    * score's magnitude means what it claims (do entities in the
    * 0.8-score bin convert 80% of the time?). Scores are integer
    * cents bucketed into `nBins` equal-width bins with
    * [[histogramFixedWidth]]'s pure-integer assignment against a
    * broadcast 1-row bounds frame; per bin the row count, positive
    * count, mean score and observed positive rate — each emitted
    * value is either an exact long or ONE IEEE division of two exact
    * longs, so the readout gates bitwise with no rounding column.
    * One keyed agg on the bin id (≤ nBins groups, map-side partials);
    * nothing global, no window.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, "calibrationBins needs at least 2 bins")
    val bounds = df.agg(min(col(scoreCol)).as("__mn"),
      max(col(scoreCol)).as("__mx"))
    df.select(col(scoreCol).cast("long").as("score"),
        col(labelCol).cast("long").as("label"))
      .crossJoin(broadcast(bounds))
      .withColumn("bin", bucketExpr("score", nBins))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("label")).as("n_pos"),
        sum(col("score")).as("score_sum"))
      .withColumn("mean_score",
        col("score_sum").cast("double") / col("n").cast("double"))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n").cast("double"))
  }

  /** Chi-squared (2×2) feature screen: for each binary feature column
    * vs a binary label, the contingency counts a/b/c/d and the test
    * statistic `χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))` — the
    * classic filter-method feature-selection score. Input is ONE row
    * per entity with the feature flags and label (build it with a
    * keyed agg upstream); the operator stacks the declared feature
    * columns and runs one agg per feature on a feature-count-bounded
    * key — two narrow shuffles total, output rows = |features|.
    *
    * Exactness ([[corrByKey]]'s DECIMAL discipline): counts are exact
    * longs; `N·(ad−bc)²` can exceed int64 (≈3·10²¹ at 20k entities) so
    * both numerator and denominator are assembled in DECIMAL(38,0) ↔
    * DuckDB HUGEINT, each converted to double with one correct
    * rounding, then ONE division — reproducible bitwise, no pround.
    * Degenerate margins (a constant feature or label) yield NULL.
    */
  def chi2Features(entityDf: DataFrame, featureCols: Seq[String],
      labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "chi2Features needs feature columns")
    val stackArgs = featureCols
      .map(f => s"'$f', cast($f as long)").mkString(", ")
    val long = entityDf.select(col(labelCol).cast("long").as("label"),
      expr(s"stack(${featureCols.size}, $stackArgs) AS (feature, f)"))
    val counts = long.groupBy(col("feature")).agg(
      sum(col("f") * col("label")).as("a"),
      sum(col("f") * (lit(1L) - col("label"))).as("b"),
      sum((lit(1L) - col("f")) * col("label")).as("c"),
      sum((lit(1L) - col("f")) * (lit(1L) - col("label"))).as("d"))
    def dec(c: Column) = c.cast("decimal(19,0)")
    val n = dec(col("a") + col("b") + col("c") + col("d"))
    val det = dec(col("a")) * dec(col("d")) - dec(col("b")) * dec(col("c"))
    val num = (n * det * det).cast("decimal(38,0)")
    val den = (dec(col("a") + col("b")) * dec(col("c") + col("d")) *
      dec(col("a") + col("c")) * dec(col("b") + col("d"))).cast("decimal(38,0)")
    counts.withColumn("chi2",
      when(den === 0, lit(null).cast("double"))
        .otherwise(num.cast("double") / den.cast("double")))
  }

  /** Exact GLOBAL-rank intervals for every distinct value of an
    * integer column, with NO unpartitioned window anywhere in the
    * plan: value `v` occupies global ascending ranks `[lo, hi]` under
    * any total order that sorts by value (tie-break order only
    * permutes rows WITHIN a value's interval, never across values).
    *
    * Two-level plan, every stage domain-scale rather than row-scale:
    *   1. distinct-value histogram — one keyed agg with map-side
    *      partials (state per task ≤ value-domain cardinality);
    *   2. fixed-width integer bucketing of the value DOMAIN
    *      ([[histogramFixedWidth]]'s `(v−mn)·B div (mx−mn+1)`
    *      arithmetic — exact in any engine);
    *   3. per-bucket totals, prefix-summed via a broadcast non-equi
    *      self-join over the ≤`nBuckets`-row bucket frame (≤ B² pair
    *      evaluations of trivially small frames — NOT row-scale);
    *   4. in-bucket running sum on a window PARTITIONED by bucket.
    *
    * Every shuffle is keyed, every join broadcast, every window
    * partitioned; intermediate frame sizes depend on the distinct-
    * value domain (bounded for cents-quantized measures), not on row
    * count — the single-reducer global sort that
    * `row_number().over(Window.orderBy(...))` plans is gone. For a
    * genuinely unbounded value domain the valve is quantizing the
    * value first ([[rangeBucketize]] / coarser cents), which bounds
    * stage-1 state by construction.
    */
  def exactRankIntervals(df: DataFrame, centsCol: String,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets >= 1, "exactRankIntervals needs at least one bucket")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(col(centsCol).cast("long").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val bounds = df.agg(min(col(centsCol)).cast("long").as("__mn"),
      max(col(centsCol)).cast("long").as("__mx"))
    val hb = hist.crossJoin(broadcast(bounds))
      .select(col("v"), col("cnt"), bucketExpr("v", nBuckets).as("bkt"))
    val totals = hb.groupBy(col("bkt")).agg(sum(col("cnt")).as("bn"))
    val before = totals.as("a")
      .join(broadcast(totals.as("b")), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bn")), lit(0L)).as("cum0"))
    val wb = Window.partitionBy(col("bkt")).orderBy(col("v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hb.join(broadcast(before), Seq("bkt"))
      .withColumn("run", sum(col("cnt")).over(wb))
      .select(col("v"),
        (col("cum0") + col("run") - col("cnt") + 1L).as("lo"),
        (col("cum0") + col("run")).as("hi"))
  }

  /** Mutual information between two categorical columns — the
    * feature-selection / leakage screen (does `lang` predict the
    * length quartile? does a feature column secretly encode the
    * label?): per observed cell, the contribution
    * `(n_xy/n)·ln(n_xy·n / (n_x·n_y))`, and the running MI total
    * accumulated over the (x, y)-pinned cell order. Zero cells
    * contribute 0 and are omitted. The last row's `mi_cum` is the MI
    * in nats; per-cell contributions show WHERE the association
    * lives.
    *
    * Exactness: a groupBy SUM of double terms is
    * partition-order-dependent, so the total is emitted as a RUNNING
    * window sum over the pinned cell order instead (the psiByKey
    * device) — frames sum in frame order in every engine. ln rides
    * the domain-bounded cell frame under pround(6).
    *
    * Scale: one keyed count agg on (x, y) (map-side partials, state
    * bounded by the attribute domains — the point of categorical
    * columns); marginals DERIVE from the cell frame (no second
    * scan) and broadcast; the one unpartitioned window rides the
    * |X|×|Y| cell frame — metadata-scale.
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol), col(yCol))
      .agg(count(lit(1)).as("n_xy")).persist()
    val xm = cells.groupBy(col(xCol)).agg(sum(col("n_xy")).as("n_x"))
    val ym = cells.groupBy(col(yCol)).agg(sum(col("n_xy")).as("n_y"))
    val n = cells.agg(sum(col("n_xy")).as("n"))
    val contrib = (col("n_xy").cast("double") / col("n").cast("double")) *
      log((col("n_xy").cast("double") * col("n").cast("double")) /
        (col("n_x").cast("double") * col("n_y").cast("double")))
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col(xCol).asc, col(yCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .join(broadcast(xm), Seq(xCol))
      .join(broadcast(ym), Seq(yCol))
      .crossJoin(broadcast(n))
      .select(col(xCol), col(yCol), col("n_xy"),
        graft.util.Rounding.pround(contrib, 6).as("contrib"),
        graft.util.Rounding.pround(sum(contrib).over(w), 6).as("mi_cum"))
  }

  /** Wilson score lower bound per key — the small-sample-honest way to
    * rank groups by a success rate (Agresti & Coull, Am. Stat. 1998;
    * the "how not to sort by average rating" ranking): the raw rate
    * `p̂ = pos/n` puts a 1/1 group above a 97/100 one, while the
    * Wilson interval's lower bound shrinks toward 0 exactly as fast
    * as the sample is small. Emits per key `(n, n_pos, p, wilson_lb)`
    * — rank by `wilson_lb` descending.
    *
    * Cross-engine exactness without integer tricks: the bound is a
    * fixed dag of +,−,×,÷,√ over `(pos, n)` with the z constants
    * inlined as literals — every one of those IEEE ops is correctly
    * rounded in both engines, so identical spelling ⇒ identical
    * binary64 result; the only rounding step is the final pround.
    * (This is the corrByKey closed-form argument without the DECIMAL
    * stage — counts are exact in binary64 to 2^53.)
    *
    * Scale: ONE keyed count agg (map-side partials), then row-local
    * arithmetic on the key-cardinality frame. No window, no join.
    */
  def wilsonLowerBound(df: DataFrame, keyCols: Seq[String], pos: Column,
      z: Double = 1.96): DataFrame = {
    require(keyCols.nonEmpty, "wilsonLowerBound needs at least one key")
    require(z > 0, "wilsonLowerBound needs z > 0")
    val z2 = z * z
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(pos, 1L).otherwise(0L)).as("n_pos"))
    val nD = col("n").cast("double")
    val p = col("n_pos").cast("double") / nD
    val lb = (p + lit(z2) / (lit(2.0) * nD) -
      lit(z) * sqrt((p * (lit(1.0) - p) + lit(z2) / (lit(4.0) * nD)) / nD)) /
      (lit(1.0) + lit(z2) / nD)
    counts.select(keyCols.map(col) ++ Seq(col("n"), col("n_pos"),
      graft.util.Rounding.pround(p, 6).as("p"),
      graft.util.Rounding.pround(lb, 6).as("wilson_lb")): _*)
  }

  /** Per-key Mann-Whitney U — the nonparametric two-sample test for the
    * A/B toolkit (beside the parametric q133 z-test): does arm A's value
    * distribution stochastically dominate arm B's, without assuming
    * normality? Emits exact `u2 = 2·U_A` (ties make U half-integral, so
    * the doubled form stays an integer), the rank-biserial effect size
    * `auc = U_A/(n_A·n_B)` (= P(A > B) + ½P(A = B)), and the tie-corrected
    * normal-approximation `z`.
    *
    * Scale (the Gini/Spearman device): the textbook form ranks every row
    * — a corpus-sized per-key window. This computes the identical rank
    * sums from the VALUE-DOMAIN aggregation: group by (key, value) with
    * per-arm counts (map-side partials), then for a tie block of size t
    * after `cum` prior rows every member's average rank is
    * `cum + (t+1)/2`, so `2·R_A = Σ t_A·(2·cum + t + 1)` needs only a
    * running count over the per-key DISTINCT-value frame. The ORACLE is
    * written in the naive row-ranked form (`2·rank + tiecount − 1`), so
    * the hash gate machine-checks the rewrite lossless.
    *
    * Exactness: rank sums assemble in DECIMAL(38,0) (↔ DuckDB HUGEINT —
    * both convert to double with one correct rounding); the tie term
    * `Σ t³−t` likewise. `z` is a fixed IEEE dag over those converted
    * operands, pround(6); degenerate keys (an empty arm, or every value
    * tied ⇒ zero variance) guard to NULL under ANSI.
    */
  def mannWhitneyU(df: DataFrame, keyCols: Seq[String], armCol: String,
      centsCol: String): DataFrame = {
    require(keyCols.nonEmpty, "mannWhitneyU needs at least one key column")
    val keys = keyCols.map(col)
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column) = c.cast("decimal(38,0)")
    val byValue = df
      .groupBy(keys :+ col(centsCol).as("__v"): _*)
      .agg(count(lit(1)).as("__t"),
        sum(when(col(armCol) === 0L, 1L).otherwise(0L)).as("__ta"))
    val w = Window.partitionBy(keys: _*).orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = coalesce(sum(col("__t")).over(w), lit(0L))
    val agg = byValue
      .select(keys ++ Seq(col("__t"), col("__ta"),
        (dec(col("__ta")) * dec(lit(2L) * cum + col("__t") + 1L)).as("__r2c"),
        (dec(col("__t")) * dec(col("__t")) * dec(col("__t")) -
          dec(col("__t"))).as("__tiec")): _*)
      .groupBy(keys: _*)
      .agg(sum(col("__ta")).as("n_a"),
        sum(col("__t") - col("__ta")).as("n_b"),
        sum(col("__r2c")).cast("decimal(38,0)").as("__r2"),
        sum(col("__tiec")).cast("decimal(38,0)").as("__tie"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val n = nA + nB
    // u2 = 2·R_A − n_A(n_A+1), exact in DECIMAL then emitted as long
    val u2 = (col("__r2") - dec(col("n_a")) * dec(col("n_a") + 1L))
      .cast("long")
    val u = col("u2").cast("double") / lit(2.0)
    val mu = nA * nB / lit(2.0)
    val variance = nA * nB / lit(12.0) *
      ((n + lit(1.0)) - col("__tie").cast("double") / (n * (n - lit(1.0))))
    val z = (u - mu) / sqrt(variance)
    agg
      .select(keys ++ Seq(col("n_a"), col("n_b"), u2.as("u2"), col("__tie")): _*)
      .select(keys ++ Seq(col("n_a"), col("n_b"), col("u2"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          graft.util.Rounding.pround(u / (nA * nB), 6)).as("auc"),
        when(col("n_a") > 0L && col("n_b") > 0L && variance > lit(0.0),
          graft.util.Rounding.pround(z, 6)).as("z")): _*)
  }

  /** Moving-block bootstrap CI for the mean of an autocorrelated
    * series — the honest uncertainty readout the iid bootstrap gets
    * wrong on time series (hourly counts are dependent; resampling
    * single hours understates the variance). Each of `reps` replicates
    * rebuilds the series from ⌈n/L⌉ length-`L` blocks whose starts are
    * DETERMINISTIC Knuth-hash picks (`(b·2654435761 + j·40503) mod
    * (n−L+1)` — the q73 replayable-sampling device), truncated to
    * exactly n values; the CI is the 2.5%/97.5% ORDER STATISTICS of
    * the replicate means (pure rank selection, no interpolation) and
    * the SE comes from exact DECIMAL moments of the replicate sums.
    *
    * Scale: the series frame is metadata-sized (one value per time
    * bucket) and BROADCASTS into the reps×⌈n/L⌉×L selection grid; the
    * ranking window rides the `reps`-row frame. Nothing corpus-scale
    * is touched here — building the series is the caller's (one-agg)
    * job.
    */
  def movingBlockBootstrap(series: DataFrame, idxCol: String,
      valueCol: String, blockLen: Int, reps: Int): DataFrame = {
    require(blockLen >= 1 && reps >= 40,
      "bootstrap needs blockLen >= 1 and reps >= 40 for 2.5% tails")
    import org.apache.spark.sql.expressions.Window
    def dec(c: Column) = c.cast("decimal(38,0)")
    val s = series.select(col(idxCol).cast("long").as("__i"),
      col(valueCol).cast("long").as("__v"))
    // runtime precondition: a series shorter than one block makes the
    // start modulus (n − L + 1) zero or negative — fail fast with a
    // real message instead of ANSI DIVIDE_BY_ZERO (or silent row drops)
    val nf = s.agg(count(lit(1)).as("__n"), sum(col("__v")).as("__tot"),
        min(col("__i")).as("__imin"), max(col("__i")).as("__imax"),
        count_distinct(col("__i")).as("__nd"))
      .filter(assert_true(col("__n") >= lit(blockLen.toLong),
        lit(s"movingBlockBootstrap needs series length >= blockLen ($blockLen)")).isNull)
      // the block sampler's modular start arithmetic assumes idxCol is a
      // dense 0-based sequence; gaps, duplicates, or a 1-based index would
      // silently sample a WRONG distribution — fail fast instead
      .filter(assert_true(
        col("__imin") === lit(0L) && col("__imax") === col("__n") - lit(1L) &&
          col("__nd") === col("__n"),
        lit(s"movingBlockBootstrap requires '$idxCol' to be a dense 0-based " +
          "index (exactly 0..n-1, no gaps or duplicates); re-index the series " +
          "with row_number()-1 over the time order first")).isNull)
      .select(col("__n"), col("__tot"))
    val spark = series.sparkSession
    val grid = spark.range(reps).select(col("id").as("b"))
      .crossJoin(broadcast(nf))
      .select(col("b"), col("__n"), col("__tot"),
        explode(sequence(lit(0L),
          expr(s"(__n + ${blockLen - 1}L) div ${blockLen}L - 1L"))).as("j"))
      .select(col("b"), col("__n"), col("__tot"), col("j"),
        ((col("b") * 2654435761L + col("j") * 40503L) %
          (col("__n") - blockLen + 1L)).as("start"))
      .select(col("b"), col("__n"), col("__tot"), col("j"), col("start"),
        explode(sequence(lit(0L), lit(blockLen - 1L))).as("off"))
      .filter(col("j") * blockLen + col("off") < col("__n"))
      .select(col("b"), col("__n"), col("__tot"),
        (col("start") + col("off")).as("__i"))
    val repSums = grid.join(broadcast(s), Seq("__i"))
      .groupBy(col("b"))
      .agg(max(col("__n")).as("__n"), max(col("__tot")).as("__tot"),
        sum(col("__v")).as("__s"))
    val wRank = Window.orderBy(col("__mean").asc, col("b").asc)
    val loRank = math.max(1, reps * 25 / 1000)
    val hiRank = reps - loRank + 1
    val ranked = repSums
      .withColumn("__mean",
        col("__s").cast("double") / col("__n").cast("double"))
      .withColumn("__rn", row_number().over(wRank))
    val moments = ranked.agg(
      max(col("__n")).as("n"),
      max(col("__tot")).as("__tot"),
      count(lit(1)).as("b_reps"),
      sum(dec(col("__s"))).cast("decimal(38,0)").as("__s1"),
      sum(dec(col("__s")) * dec(col("__s"))).cast("decimal(38,0)").as("__s2"),
      min(when(col("__rn") === loRank, col("__mean"))).as("__lo"),
      min(when(col("__rn") === hiRank, col("__mean"))).as("__hi"))
    val bD = lit(reps.toDouble)
    val nD = col("n").cast("double")
    val varNum = bD * col("__s2").cast("double") -
      col("__s1").cast("double") * col("__s1").cast("double")
    moments.select(col("n"), col("b_reps"),
      graft.util.Rounding.pround(
        col("__tot").cast("double") / nD, 6).as("mean_hat"),
      graft.util.Rounding.pround(col("__lo"), 6).as("boot_lo"),
      graft.util.Rounding.pround(col("__hi"), 6).as("boot_hi"),
      graft.util.Rounding.pround(
        // clamp: the exact-moment numerator can land −1 ulp below zero
        // on constant series and DuckDB errors on sqrt(negative)
        sqrt(greatest(varNum, lit(0.0)) / (bD * (bD - lit(1.0)))) / nD, 6)
        .as("boot_se"))
  }

  /** HLL sketch MERGE — the mergeability that justifies sketching at
    * all: per-key 64-register HLL sketches ([[hllDistinct]]'s layout)
    * union by REGISTER-WISE MAX into one `__union__` row, without
    * re-touching the raw values. `max` is associative/idempotent, so
    * the merged registers are IDENTICAL to the sketch built over the
    * concatenated input — HllMergeSpec machine-checks that equality
    * bitwise (max-of-maxes = global max), which is the property that
    * lets 1000 executors sketch shards independently and a coordinator
    * fold the frames.
    *
    * All arithmetic is the [[hllDistinct]] dyadic spelling (`2⁻ʳ` sums
    * span < 53 bits → exact, association-free), so per-key AND merged
    * estimates hash-gate bitwise.
    */
  /** The corpus-touching stage of [[hllMergeAll]]: per-(key, bucket)
    * max-rho registers — ONE scan, one keyed agg. Exposed so PlanSpec
    * can pin the single-scan shape pre-checkpoint.
    */
  def hllRegisters(df: DataFrame, keyCol: String, valueCol: String,
      m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    require(m <= 65536, "m beyond the 4-digit bucket slice")
    val h = md5(col(valueCol).cast("string"))
    val bucket = conv(substring(h, 1, 4), 16, 10).cast("long") % m
    val probe = conv(substring(h, 5, 4), 16, 10).cast("long")
    val rho = when(probe === 0L, lit(17L))
      .otherwise(lit(17L) - length(bin(probe)))
    df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("k"), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col("k"), col("bucket"))
      .agg(max(col("rho")).as("r"))
  }

  def hllMergeAll(df: DataFrame, keyCol: String, valueCol: String,
      m: Int = 64): DataFrame = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val alphaM2 = alpha * m * m
    // the keys×m register frame feeds TWO consumers (the merged row and
    // the union) — checkpoint it eagerly so the scan + register agg
    // lineage runs once, not per consumer (the kmvSetOps rule)
    val registers = hllRegisters(df, keyCol, valueCol, m).localCheckpoint(true)
    // union = register-wise max across keys — touches only the
    // keys×m register frame
    val merged = registers.groupBy(col("bucket"))
      .agg(max(col("r")).as("r"))
      .select(lit("__union__").as("k"), col("bucket"), col("r"))
    def estimate(regs: DataFrame): DataFrame =
      regs.groupBy(col("k"))
        .agg(count(lit(1)).as("occupied"),
          sum(pow(lit(2.0), -col("r"))).as("__hocc"))
        .select(col("k"), col("occupied"),
          (col("__hocc") + (lit(m.toLong) - col("occupied")).cast("double"))
            .as("harmonic_sum"))
        .withColumn("hll_estimate", lit(alphaM2) / col("harmonic_sum"))
    estimate(registers.union(merged))
  }

  /** Per-key Kendall tau-b on bucketed ordinals — the concordance
    * companion to Spearman (q122): P(agreeing order) − P(disagreeing),
    * tie-corrected. The corpus collapses to the (key, x, y) CELL frame
    * first (one keyed agg, map-side partials); concordant/discordant
    * pair counts come from the cells×cells self-join WITHIN a key with
    * `x1 < x2` — bounded by the bucket-domain square (e.g. 10×24 cells
    * → ≤ 28k cell pairs per key), never the row count. All pair
    * products assemble in DECIMAL (↔ HUGEINT); tau-b is one final
    * IEEE dag over the converted sums. Degenerate keys (all x tied or
    * all y tied ⇒ zero denominator) guard to NULL under ANSI.
    */
  def kendallTauB(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    require(keyCols.nonEmpty, "kendallTauB needs at least one key column")
    val keys = keyCols.map(col)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val cells = df
      .groupBy(keys :+ col(xCol).as("__x") :+ col(yCol).as("__y"): _*)
      .agg(count(lit(1)).as("__n"))
    val a = cells.select(keys ++ Seq(col("__x").as("__xa"),
      col("__y").as("__ya"), col("__n").as("__na")): _*)
    val b = cells.select(keys ++ Seq(col("__x").as("__xb"),
      col("__y").as("__yb"), col("__n").as("__nb")): _*)
    val cd = a.join(b, keyCols).filter(col("__xa") < col("__xb"))
      .groupBy(keys: _*)
      .agg(
        sum(when(col("__yb") > col("__ya"),
          dec(col("__na")) * dec(col("__nb"))).otherwise(dec(lit(0L))))
          .cast("decimal(38,0)").as("__c"),
        sum(when(col("__yb") < col("__ya"),
          dec(col("__na")) * dec(col("__nb"))).otherwise(dec(lit(0L))))
          .cast("decimal(38,0)").as("__d"))
    val xTies = cells.groupBy(keys :+ col("__x"): _*)
      .agg(sum(col("__n")).as("__tx"))
      .groupBy(keys: _*)
      .agg(sum((dec(col("__tx")) * dec(col("__tx") - 1L))).cast("decimal(38,0)")
          .as("__t1x"),
        sum(col("__tx")).as("__nx"))
    val yTies = cells.groupBy(keys :+ col("__y"): _*)
      .agg(sum(col("__n")).as("__ty"))
      .groupBy(keys: _*)
      .agg(sum((dec(col("__ty")) * dec(col("__ty") - 1L))).cast("decimal(38,0)")
        .as("__t1y"))
    // drive from the ties frame (one row per key) and LEFT-join the
    // pair counts: an all-x-tied key has no x-ordered cell pair but
    // must still emit (with NULL tau), not vanish
    val joined = xTies
      .join(broadcast(yTies), keyCols)
      .join(broadcast(cd), keyCols, "left")
      .withColumn("__cc", coalesce(col("__c"), lit(java.math.BigDecimal.ZERO)
        .cast("decimal(38,0)")))
      .withColumn("__dd", coalesce(col("__d"), lit(java.math.BigDecimal.ZERO)
        .cast("decimal(38,0)")))
    val nD = col("__nx").cast("double")
    val n0 = nD * (nD - lit(1.0)) / lit(2.0)
    val n1 = col("__t1x").cast("double") / lit(2.0)
    val n2 = col("__t1y").cast("double") / lit(2.0)
    val num = col("__cc").cast("double") - col("__dd").cast("double")
    val den = (n0 - n1) * (n0 - n2)
    joined.select(keys ++ Seq(
      col("__nx").as("n"),
      col("__cc").cast("long").as("concordant"),
      col("__dd").cast("long").as("discordant"),
      when(den > lit(0.0),
        graft.util.Rounding.pround(num / sqrt(den), 6)).as("tau_b")): _*)
  }

  /** KMV sketch SET OPERATIONS — pairwise union / intersection /
    * Jaccard estimates between groups from k-minimum-value sketches
    * (the theta-sketch workflow beside q150's single-group KMV
    * cardinality): per group keep the k smallest hashes; for a pair,
    * the k smallest of the UNION of the two sketches IS the true
    * min-k sketch of the union (the KMV merge property), so
    * `union_est = (k−1)·2⁶⁰/h₍ₖ₎` on the merged sketch,
    * `jaccard = |both-flagged ∩ merged-k| / k` (the standard KMV
    * Jaccard estimator), and `inter_est = jaccard · union_est`.
    * Audience-overlap / cross-source containment sizing WITHOUT
    * touching raw id sets twice.
    *
    * Scale: the corpus is touched ONCE (distinct + per-group min-k via
    * the mergeable bounded-heap aggregate — map-side heaps bound every
    * group at k hashes before the shuffle); everything pairwise happens
    * on the groups×k sketch frame — groups²·2k rows of metadata, never
    * data. Groups whose merged union holds < k hashes are EXACT (est =
    * the count); k a power of two makes `shared/k` dyadic-exact.
    *
    * Fully hash-gateable: sketches are integer hashes, the merge is
    * min-k (replayed as a row_number window), and the estimates are
    * single divisions of exact operands (pround 6).
    */
  /** The corpus-touching stage of [[kmvSetOps]]: distinct (group, hash)
    * → per-group k smallest via [[graft.transform.Skew.aggTopK]] (r22 —
    * was the salted two-phase window prune). Public so PlanSpec pins
    * THIS stage's plan (one scan, no rank window) — the pairwise stage
    * runs on its checkpointed output, whose explain truncates at
    * LogicalRDD. */
  def kmvSketch(hashes: DataFrame, groupCol: String, hashCol: String,
      k: Int): DataFrame = {
    val distinctH = hashes.select(col(groupCol).as("__g"), col(hashCol).as("__h"))
      .distinct()
    graft.transform.Skew.aggTopK(
      distinctH, Seq(col("__g")), struct(col("__h").as("__h")), k = k)
  }

  def kmvSetOps(hashes: DataFrame, groupCol: String, hashCol: String,
      k: Int = 128): DataFrame = {
    require(k >= 2, "kmvSetOps needs k >= 2")
    import org.apache.spark.sql.expressions.Window
    // materialize the groups×k sketch ONCE — every pairwise branch
    // below re-reads this frame, not the corpus lineage (without the
    // checkpoint the plan re-scans the input ~6×)
    val sketch = kmvSketch(hashes, groupCol, hashCol, k)
      .localCheckpoint(true)
    val groups = sketch.select(col("__g")).distinct()
    val pairs = groups.select(col("__g").as("g1"))
      .join(groups.select(col("__g").as("g2")), col("g1") < col("g2"))
    val tagged =
      pairs.join(broadcast(sketch.select(col("__g").as("g1"), col("__h"))),
          Seq("g1"))
        .select(col("g1"), col("g2"), col("__h"), lit(1L).as("__ina"),
          lit(0L).as("__inb"))
      .union(
        pairs.join(broadcast(sketch.select(col("__g").as("g2"), col("__h"))),
            Seq("g2"))
          .select(col("g1"), col("g2"), col("__h"), lit(0L).as("__ina"),
            lit(1L).as("__inb")))
    val merged = tagged
      .groupBy(col("g1"), col("g2"), col("__h"))
      .agg(max(col("__ina")).as("__a"), max(col("__inb")).as("__b"))
    val wk = Window.partitionBy(col("g1"), col("g2")).orderBy(col("__h").asc)
    val topk = merged
      .withColumn("__rn", row_number().over(wk))
      .filter(col("__rn") <= k)
    val perPair = topk.groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_merged"),
        sum(col("__a") * col("__b")).as("shared"),
        max(col("__h")).as("__kth"))
    val exactSmall = col("n_merged") < k
    val unionEst = when(exactSmall, col("n_merged").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1152921504606846976.0) /
        col("__kth").cast("double"))
    val jac = col("shared").cast("double") /
      when(exactSmall, col("n_merged").cast("double")).otherwise(lit(k.toDouble))
    perPair.select(col("g1"), col("g2"), col("n_merged"), col("shared"),
      graft.util.Rounding.pround(jac, 6).as("jaccard"),
      graft.util.Rounding.pround(unionEst, 6).as("union_est"),
      graft.util.Rounding.pround(jac * unionEst, 6).as("inter_est"))
  }

  /** Leakage-safe (out-of-fold) target encoding — the categorical →
    * numeric feature transform for training pipelines: each (category,
    * fold) cell is encoded with the target mean computed EXCLUDING that
    * fold's own rows, so no row's label leaks into its own feature. The
    * fold is a deterministic md5 split on the row id (the q43 device),
    * and the encoding is smoothed toward the global prior with strength
    * `m` (`enc = (Σ_oof + m·prior)/(n_oof + m)`) so rare categories
    * don't memorize their few labels.
    *
    * Scale: two keyed aggregations (per category×fold, per category) +
    * one 1-row global — the out-of-fold sums derive by subtraction
    * (`total − fold`), never by an n-fold self-join. All sums are exact
    * integer cents; `prior` and `enc` are single divisions of exact
    * operands, pround(6). `n_oof + m > 0` always (m ≥ 1), so ANSI-safe
    * without guards.
    */
  def targetEncodeOOF(df: DataFrame, catCol: String, idCol: String,
      centsCol: String, nFolds: Int = 5, smoothing: Int = 100): DataFrame = {
    require(nFolds >= 2, "targetEncodeOOF needs at least two folds")
    require(smoothing >= 1, "targetEncodeOOF needs smoothing >= 1")
    val fold = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % nFolds
    val cells = df
      .groupBy(col(catCol), fold.as("fold"))
      .agg(count(lit(1)).as("n_f"), sum(col(centsCol)).as("s_f"))
    val totals = cells.groupBy(col(catCol))
      .agg(sum(col("n_f")).as("n_c"), sum(col("s_f")).as("s_c"))
    val global = totals.agg(sum(col("n_c")).as("__n"), sum(col("s_c")).as("__s"))
    val prior = col("__s").cast("double") / col("__n").cast("double")
    val enc = ((col("s_c") - col("s_f")).cast("double") +
      lit(smoothing.toDouble) * prior) /
      ((col("n_c") - col("n_f")).cast("double") + lit(smoothing.toDouble))
    cells.join(broadcast(totals), Seq(catCol))
      .crossJoin(broadcast(global))
      .select(col(catCol), col("fold"),
        (col("n_c") - col("n_f")).as("n_oof"),
        (col("s_c") - col("s_f")).as("s_oof"),
        graft.util.Rounding.pround(prior, 6).as("prior"),
        graft.util.Rounding.pround(enc, 6).as("enc"))
  }
}
