package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table loader with nanosecond-timestamp normalization.
  *
  * The synthetic `events` table stores `ts` as parquet
  * TIMESTAMP(NANOS) (TESTDATA.md), which Spark cannot read natively
  * (SPARK-40819): sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true`, which surfaces the column
  * as a raw nanosecond LongType. This loader converts such columns to
  * engine-precision (µs) TimestampType — `timestamp_micros(ns div 1000)`,
  * the same truncation DuckDB applies on `CAST(ts AS TIMESTAMP)` — so the
  * rest of the library only ever sees real timestamps.
  */
object Tables {
  /** Columns that are TIMESTAMP(NANOS) in the testdata parquet. */
  private val nanosColumns: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // runtime (session-level) conf — set defensively for externally
    // provided sessions; no-op when already set in the builder.
    scala.util.Try(
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosColumns.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
  }

  /** Normalize any raw-nanosecond long column to µs TimestampType. */
  def nanosToTimestamp(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      if (d.schema.fieldNames.contains(c) && d.schema(c).dataType == LongType)
        d.withColumn(c, timestamp_micros(expr(s"$c div 1000")))
      else d
    }
}
