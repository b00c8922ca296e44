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
        val cents = floor(col(r.column) * 100 + 0.5).cast("long")
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
          sum(viol.cast("long")).as(s"v_$i")
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
}
