package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the expectation-suite operator
  * (the Deequ / Great Expectations shape) a feature pipeline runs
  * before publishing a table: each rule declares what must hold, the
  * audit emits one row per rule with `(rule, n_checked, n_violations)`
  * and the caller gates the publish on the counts. The reference's
  * notebooks validate by eyeballing `display()` samples
  * (`infra/on-prem/workspace-dev/trip_stats_fv.ipynb` cell 7); this
  * is that check made total, declarative, and cheap.
  *
  * Scale posture: the audit COMPILES to the minimal plan rather than
  * running rule-at-a-time scans —
  *   - every row-local rule (not-null, range, accepted values, custom
  *     predicate) fuses into ONE aggregation over ONE scan: each task
  *     reduces to a single partial-sum row regardless of rule count,
  *     so auditing 50 row-local rules on 100 TB costs one pass;
  *   - a uniqueness rule is one keyed agg on its key columns
  *     (map-side partials; violations = Σ(run−1));
  *   - a referential-integrity rule is one LEFT ANTI join against the
  *     deduped dimension key, broadcast by default — pass
  *     `broadcastDim = false` when the "dimension" is itself huge and
  *     the anti join should stay keyed.
  * Counts are exact longs; output is rule-count sized.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** `column` must not be NULL. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null:$column"
  }

  /** Integer-cents range check: `floor(column·100+0.5)` must lie in
    * `[loCents, hiCents]` (NULL is not a range violation — pair with
    * [[NotNull]]). Cents avoid float boundary ambiguity at the fences.
    */
  final case class InRangeCents(column: String, loCents: Long, hiCents: Long)
      extends Rule {
    val name = s"range:$column"
  }

  /** `column` must be one of `values` (NULL is not a violation). */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Rule {
    val name = s"accepted:$column"
  }

  /** Arbitrary row-local expectation: a violation is a row where
    * `predicate` is false or NULL.
    */
  final case class Check(label: String, predicate: Column) extends Rule {
    val name = s"check:$label"
  }

  /** `columns` must identify rows uniquely; violations are the rows
    * beyond the first in each duplicate group (NULL key values group
    * like values, as in a GROUP BY).
    */
  final case class UniqueKey(columns: Seq[String]) extends Rule {
    val name = s"unique:${columns.mkString("+")}"
  }

  /** Every non-NULL `column` must exist in `dim.dimColumn` (NULL
    * foreign keys are skipped — declare [[NotNull]] separately if they
    * are illegal; `n_checked` counts only the non-NULL rows).
    */
  final case class RefIntegrity(column: String, dim: DataFrame,
      dimColumn: String) extends Rule {
    val name = s"ref:$column"
  }

  /** Run the expectation suite; one output row per rule. */
  def audit(df: DataFrame, rules: Seq[Rule],
      broadcastDim: Boolean = true): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowLocal = rules.collect {
      case r: NotNull => r.name -> col(r.column).isNull
      case r: InRangeCents =>
        // the ONE cents spelling (Stats.cents) — a second inline copy
        // of the rounding formula would drift from every Stats operator
        val cents = graft.transform.Stats.cents(col(r.column))
        r.name -> (col(r.column).isNotNull &&
          (cents < r.loCents || cents > r.hiCents))
      case r: AcceptedValues =>
        r.name -> (col(r.column).isNotNull && !col(r.column).isin(r.values: _*))
      case r: Check => r.name -> !coalesce(r.predicate, lit(false))
    }
    val fused: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = rowLocal.zipWithIndex.map { case ((_, viol), i) =>
          // coalesce: sum over ZERO rows is NULL — an empty table must
          // read 0 violations like the structural rules already do,
          // or the natural "all rules clean" gate fails on a
          // legitimately empty partition
          coalesce(sum(viol.cast("long")), lit(0L)).as(s"v_$i")
        }
        val one = df.agg(count(lit(1)).as("n"), aggs: _*)
        val stackArgs = rowLocal.zipWithIndex
          .map { case ((name, _), i) => s"'${name.replace("'", "")}', v_$i" }
          .mkString(", ")
        Some(one.select(
          expr(s"stack(${rowLocal.size}, $stackArgs) AS (rule, n_violations)"),
          col("n").as("n_checked"))
          .select(col("rule"), col("n_checked"), col("n_violations")))
      }
    val structural: Seq[DataFrame] = rules.collect {
      case r: UniqueKey =>
        df.groupBy(r.columns.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(coalesce(sum(col("c")), lit(0L)).as("n_checked"),
            coalesce(sum(col("c") - 1L), lit(0L)).as("n_violations"))
          .select(lit(r.name).as("rule"), col("n_checked"),
            col("n_violations"))
      case r: RefIntegrity =>
        val nonNull = df.select(col(r.column)).filter(col(r.column).isNotNull)
        val keys0 = r.dim.select(col(r.dimColumn).as("__dim_key")).distinct()
        val keys = if (broadcastDim) broadcast(keys0) else keys0
        val checked = nonNull.agg(count(lit(1)).as("n_checked"))
        val viol = nonNull
          .join(keys, col(r.column) === col("__dim_key"), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        checked.crossJoin(viol)
          .select(lit(r.name).as("rule"), col("n_checked"),
            col("n_violations"))
    }
    (fused.toSeq ++ structural).reduce(_ unionByName _)
  }

  /** k-anonymity audit over declared quasi-identifier columns — the
    * re-identification-risk readout beside the PII scrub (q37) and
    * opt-out purge (q59): rows whose QI equivalence class holds fewer
    * than `k` members are individually re-identifiable by anyone who
    * knows those attributes. Emits one summary row per `byCol` value:
    * class count, classes below k, rows at risk, and the minimum
    * class size (the table's actual anonymity level).
    *
    * Scale: ONE keyed agg on the QI tuple (map-side partials — state
    * per task is QI-domain-bounded, which is the point of QIs) + one
    * rollup agg; exact longs throughout; no window, no join.
    */
  def kAnonymity(df: DataFrame, byCol: String, qiCols: Seq[String],
      k: Long): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymity needs quasi-identifier columns")
    require(k >= 2, "k < 2 makes every class anonymous")
    val classes = df.groupBy((byCol +: qiCols).map(col): _*)
      .agg(count(lit(1)).as("n"))
    classes.groupBy(col(byCol))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_rows_at_risk"),
        min(col("n")).as("min_class_size"))
  }

  /** Functional-dependency profiler (the Metanome-style data-profiling
    * primitive): for each declared candidate `det → dep`, does the
    * determinant column actually determine the dependent one? Emits
    * per candidate: distinct determinant values, how many of them map
    * to >1 dependent value (violations), the worst fan-out, and the
    * violation rate — the readout that catches "order_id no longer
    * determines customer" schema rot before a downstream join fans
    * out.
    *
    * Scale: one distinct-agg per candidate (Spark's two-phase partial
    * distinct — map-side state bounded by the (det, dep) domain) plus
    * a 1-row rollup; candidates scan independently (they aggregate on
    * DIFFERENT keys, so they cannot share one shuffle — scans prune
    * to two columns each and a persisted source amortizes the I/O
    * when the candidate list is long). No window, no join.
    */
  def functionalDeps(df: DataFrame, deps: Seq[(String, String)]): DataFrame = {
    require(deps.nonEmpty, "functionalDeps needs at least one candidate")
    deps.map { case (det, dep) =>
      df.select(col(det), col(dep)).groupBy(col(det))
        .agg(countDistinct(col(dep)).as("__d"))
        .agg(count(lit(1)).as("n_det"),
          sum(when(col("__d") > 1L, 1L).otherwise(0L)).as("n_violating"),
          max(col("__d")).as("max_fanout"))
        .select(lit(s"$det->$dep").as("fd"), col("n_det"),
          col("n_violating"), col("max_fanout"),
          (col("n_violating").cast("double") / col("n_det").cast("double"))
            .as("violation_rate"))
    }.reduce(_ unionByName _)
  }

  /** l-diversity audit — the homogeneity companion to [[kAnonymity]]:
    * a QI class can hold k ≥ 5 members and STILL leak the sensitive
    * attribute if all members share one sensitive value, so each
    * class is graded by its count of DISTINCT sensitive values.
    * Emits the class-level frame `(qiCols*, n_rows, n_sensitive,
    * low_diversity)` — callers roll it up or join it back to flag
    * releasable partitions.
    *
    * Scale: ONE distinct-agg on the QI tuple (Spark plans
    * `countDistinct` as the two-phase partial-distinct expand — state
    * per task is bounded by |QI domain| × |sensitive domain|, both
    * attribute-bounded by construction); exact longs; no window, no
    * join.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String], sensCol: String,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "lDiversity needs quasi-identifier columns")
    require(l >= 2, "l < 2 makes every class diverse")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensCol)).as("n_sensitive"))
      .withColumn("low_diversity", (col("n_sensitive") < l).cast("long"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * distributional companion to [[kAnonymity]]/[[lDiversity]]: a QI
    * class leaks even with diverse sensitive values if its sensitive
    * DISTRIBUTION differs from the table's (a class skewed to the top
    * income decile reveals income regardless of diversity). Each
    * class's numeric sensitive attribute is histogrammed onto the
    * table-global equi-width grid and graded by Earth Mover's Distance
    * to the global histogram (ordered EMD = mean |CDF gap|, normalized
    * to [0,1] by the max-transport distance `buckets-1`).
    *
    * Exactness: bucketing is the q137 integer floor-division grid; the
    * CDF gap `|cumG·n − cum·nG|` is exact DECIMAL(38,0) (common
    * denominator, never divided early); the two emitted doubles each
    * convert/round once — bit-identical cross-engine.
    *
    * Scale: one event-scale keyed agg onto (class, bucket); everything
    * after rides the class×bucket frame (QI-domain-bounded by
    * construction). The per-class CDF window partitions on the class;
    * the only unpartitioned window rides the `buckets`-row global
    * histogram — metadata-scale, the latenessProfile summary-frame
    * pattern. The global histogram is DERIVED from the class counts
    * (no second scan); bounds are a 1-row broadcast.
    */
  def tCloseness(df: DataFrame, qiCol: String, cents: Column,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "tCloseness needs >= 2 buckets")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(qiCol).as("__qi"), cents.as("__c"))
    val bounds = base.agg(min(col("__c")).as("__mn"), max(col("__c")).as("__mx"))
    val classCnt = base.crossJoin(broadcast(bounds))
      // the ONE bucket-formula definition (Stats.bucketExpr) — this was
      // the ninth inline copy of the equal-width spelling
      .select(col("__qi"),
        graft.transform.Stats.bucketExpr("__c", buckets).as("__b"))
      .groupBy(col("__qi"), col("__b")).agg(count(lit(1)).as("__cnt"))
      // eager localCheckpoint, not persist(): the repo idiom for a
      // tiny multi-consumer intermediate — a persist with no reachable
      // unpersist leaked one cache entry per invocation for the life
      // of the session
      .localCheckpoint(true)
    val spark = df.sparkSession
    val bucketIds = spark.range(buckets).select(col("id").as("__b"))
    val grid = classCnt.select(col("__qi")).distinct()
      .crossJoin(broadcast(bucketIds))
    // densify the GLOBAL histogram too: a bucket no class populates must
    // still carry its cumulative count, or the per-bucket CDF-gap join
    // silently drops it (QualitySpec's polar hand case pins this)
    val globalCnt = bucketIds.join(
      classCnt.groupBy(col("__b")).agg(sum(col("__cnt")).as("__gcnt")),
      Seq("__b"), "left").na.fill(0L, Seq("__gcnt"))
    val wg = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val globalCum = globalCnt
      .withColumn("__gcum", sum(col("__gcnt")).over(wg))
      .select(col("__b"), col("__gcum"))
    val wq = Window.partitionBy(col("__qi")).orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dec = "decimal(38,0)"
    val joined = grid
      .join(classCnt, Seq("__qi", "__b"), "left")
      .na.fill(0L, Seq("__cnt"))
      .withColumn("__cum", sum(col("__cnt")).over(wq))
      .join(broadcast(globalCum), Seq("__b"))
    val totals = classCnt.groupBy(col("__qi")).agg(sum(col("__cnt")).as("__ng"))
    val n = classCnt.agg(sum(col("__cnt")).as("__n"))
    joined
      .join(broadcast(totals), Seq("__qi"))
      .crossJoin(broadcast(n))
      .withColumn("__gap", abs(col("__cum").cast(dec) * col("__n") -
        col("__gcum").cast(dec) * col("__ng")))
      .groupBy(col("__qi").as(qiCol))
      .agg(max(col("__ng")).as("n_group"),
        sum(col("__gap")).as("__emd"))
      .crossJoin(broadcast(n))
      .select(col(qiCol), col("n_group"),
        col("__emd").cast("double").as("emd_num"),
        graft.util.Rounding.pround(col("__emd").cast("double") /
          (col("n_group").cast(dec) * col("__n") * (buckets - 1L))
            .cast("double"), 6).as("t"))
  }

  /** Split-conformal calibration readout (Vovk et al.; the
    * distribution-free prediction-threshold recipe): documents split
    * into calibration/test halves by md5 parity of the id (the q43
    * deterministic-split device), the nonconformity score is quantized
    * to an integer grid (parts-per-million), and for each miscoverage
    * level α the threshold is the ⌈(n_cal+1)(1−α)⌉-th SMALLEST
    * calibration score — an exact order statistic, no interpolation —
    * with the achieved test-side coverage reported beside the 1−α
    * target. The conformal guarantee (coverage ≥ 1−α in expectation)
    * is what a filtering pipeline quotes when it promises "this
    * quality gate passes ≥90% of clean docs".
    *
    * Exactness: rank `k = ⌈(n+1)(100−α)/100⌉` is computed in integer
    * arithmetic; the threshold is a MIN over histogram rows whose
    * cumulative count reaches k; coverage is one division, rounded
    * once.
    *
    * Scale: one event-scale agg builds the calibration score
    * HISTOGRAM; the cumulative window rides that histogram, whose row
    * count is bounded by the ppm grid (≤1e6, data-independent) — the
    * summary-frame pattern, pinned metadata-scale. The α table, rank
    * frame, and thresholds are all row-count-≤|α| broadcasts; the
    * test side needs only one agg against the broadcast thresholds.
    */
  def conformalCoverage(df: DataFrame, idCol: String, scorePpm: Column,
      alphasPct: Seq[Int] = Seq(10, 20)): DataFrame = {
    require(alphasPct.nonEmpty && alphasPct.forall(a => a >= 1 && a <= 99),
      "conformalCoverage needs alpha percents in [1, 99]")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val base = df.select(col(idCol).as("__id"), scorePpm.as("__s"))
      .withColumn("__cal",
        substring(md5(col("__id").cast("string")), 1, 1)
          .isin("0", "1", "2", "3", "4", "5", "6", "7"))
    val hist = base.filter(col("__cal"))
      .groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    val wcum = Window.orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(wcum))
    val nCal = hist.agg(sum(col("__c")).as("__ncal"))
    import spark.implicits._
    val alphas = alphasPct.toDF("alpha_pct")
    val ranks = alphas.crossJoin(broadcast(nCal))
      .withColumn("__k", expr("((__ncal + 1) * (100 - alpha_pct) + 99) div 100"))
    val found = cum.crossJoin(broadcast(ranks))
      .filter(col("__cum") >= col("__k"))
      .groupBy(col("alpha_pct"), col("__ncal"), col("__k"))
      .agg(min(col("__s")).as("threshold_ppm"))
    // an alpha whose rank k exceeds n_cal (calibration set too small
    // for that level) has NO histogram row reaching k — it must still
    // SURFACE, with the conformal convention threshold = +infinity
    // (every test point conforms), reported as a NULL threshold_ppm
    // rather than silently vanishing from the requested-alphas output
    val thresholds = ranks
      .join(found, Seq("alpha_pct", "__ncal", "__k"), "left")
    val test = base.filter(!col("__cal"))
    test.crossJoin(broadcast(thresholds))
      .groupBy(col("alpha_pct"), col("__ncal"), col("threshold_ppm"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("threshold_ppm").isNull ||
            col("__s") <= col("threshold_ppm"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("alpha_pct"), col("__ncal").as("n_cal"), col("n_test"),
        col("threshold_ppm"), col("n_covered"),
        graft.util.Rounding.pround(col("n_covered").cast("double") /
          col("n_test").cast("double"), 6).as("coverage"))
  }
}
