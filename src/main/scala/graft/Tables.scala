package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table loader with timestamp normalization.
  *
  * The synthetic `events` table has shipped `ts` in two physical forms
  * across testdata generations:
  *
  *   - parquet TIMESTAMP(NANOS), which Spark cannot read natively
  *     (SPARK-40819): sessions must set
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, surfacing the column
  *     as a raw nanosecond LongType. Converted here to engine-precision
  *     (µs) TimestampType — `timestamp_micros(ns div 1000)`, the same
  *     truncation DuckDB applies on `CAST(ts AS TIMESTAMP)`.
  *   - parquet `timestamp[us]` without UTC adjustment, which Spark reads
  *     as TIMESTAMP_NTZ. Cast here to TimestampType — value-preserving
  *     under the library's pinned UTC session timezone (wall-clock fields
  *     are reinterpreted as UTC instants, identical microsecond values).
  *
  * Either way the rest of the library only ever sees real (LTZ µs)
  * timestamps, so the 26 `unix_micros(col("ts"))` call sites and every
  * time-bucket expression analyze identically against both generations.
  */
object Tables {
  /** Columns that are nanos/NTZ timestamps in the testdata parquet. */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // runtime (session-level) conf — set defensively for externally
    // provided sessions; no-op when already set in the builder.
    scala.util.Try(
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosToTimestamp(df, nanosColumns.getOrElse(name, Nil))
  }

  /** Testdata schema canary: loads each table through [[load]] and
    * verifies the post-normalization dtypes the library depends on, so a
    * driver-side testdata regeneration fails in ONE place with the
    * offending column named — not as dozens of scattered analysis errors.
    * (The r8 regeneration flipped `events.ts` TIMESTAMP(NANOS) →
    * `timestamp[us]`/NTZ and broke 22 queries before this existed.)
    *
    * Returns problem descriptions; empty = healthy.
    */
  def schemaCanary(spark: SparkSession, dir: String): Seq[String] = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val problems = scala.collection.mutable.ArrayBuffer[String]()
    val schemas = tables.flatMap { t =>
      try Some(t -> load(spark, dir, t).schema)
      catch {
        case scala.util.control.NonFatal(e) =>
          problems += s"table '$t' failed to load from $dir: ${e.getMessage}"
          None
      }
    }.toMap
    for (s <- schemas.get("events")) {
      if (!s.fieldNames.contains("ts"))
        problems += s"events lacks column 'ts' (has ${s.fieldNames.mkString(",")})"
      else if (s("ts").dataType != TimestampType)
        problems += ("events.ts is " + s("ts").dataType.simpleString +
          " after Tables.load normalization — expected timestamp. The " +
          "testdata generation changed physical form again; extend " +
          "Tables.nanosToTimestamp for the new encoding.")
    }
    for (s <- schemas.get("embeddings"); f <- s.find(_.name == "embedding")) {
      if (!f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        problems += s"embeddings.embedding is ${f.dataType.simpleString} — expected array"
      else {
        // the ANN stack's subspace constants (PQ 8×8, token 8×8,
        // Matryoshka 16) assume 64 dims — a regenerated fixture with a
        // different width must fail HERE, not as 20 scattered gates.
        // min/max over the whole column (not head) so RAGGED arrays are
        // caught too; a read failure reports its own message instead of
        // masquerading as a bad dimension.
        import org.apache.spark.sql.functions.{col, min, max, size}
        try {
          val r = load(spark, dir, "embeddings")
            .agg(min(size(col("embedding"))).as("mn"),
              max(size(col("embedding"))).as("mx")).head()
          (Option(r.get(0)), Option(r.get(1))) match {
            case (Some(mn: Int), Some(mx: Int)) =>
              if (mn != 64 || mx != 64)
                problems += (s"embeddings dims span [$mn, $mx] — expected " +
                  "uniform 64 (PQ/token subspace constants assume 8×8)")
            case _ => problems += "embeddings table is empty — dim canary has nothing to check"
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            problems += s"embeddings dim canary failed to read the table: ${e.getMessage}"
        }
      }
    }
    for (s <- schemas.get("documents"))
      Seq("doc_id", "text").foreach { c =>
        if (!s.fieldNames.contains(c)) problems += s"documents lacks column '$c'"
      }
    problems.toSeq
  }

  /** Normalize a raw-nanosecond long or NTZ column to µs TimestampType. */
  def nanosToTimestamp(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (!d.schema.fieldNames.contains(c)) d
      else d.schema(c).dataType match {
        case LongType => d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
        case TimestampNTZType => d.withColumn(c, col(c).cast(TimestampType))
        case _ => d
      }
    }
}
