package graft.sources

import graft.core.SparkSource
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry-described scan: resolve a [[SparkSource]] to a DataFrame at
  * retrieval time (reference S7, `CASE.MD:155-161`,
  * `Untitled.ipynb:235-242`).
  *
  * Formats map straight onto Spark's built-in file sources (S4 parquet,
  * S6 csv-with-header, json). S5 avro requires the external spark-avro
  * module on the classpath; we pass the format through so deployments that
  * ship it work unchanged. Paths are any Hadoop FS URI (S8: hdfs://,
  * abfss://, s3a://, local).
  *
  * Schema validation: a registered time-series source MUST expose its
  * `timestamp_field` (and `created_timestamp_column` when declared) —
  * checked eagerly so misconfiguration fails at read, not mid-join.
  */
object SourceReader {
  /** Option key: comma-separated columns stored as parquet
    * TIMESTAMP(NANOS), surfaced by Spark as raw-ns longs under
    * `spark.sql.legacy.parquet.nanosAsLong` and normalized here to µs
    * TimestampType (see [[graft.Tables]]).
    */
  val NanosColumnsOption = "graft.nanosColumns"

  def read(spark: SparkSession, src: SparkSource): DataFrame =
    read(spark, src, None, None)

  /** Read a source as a STATIC corpus — same format dispatch and
    * nanos/NTZ normalization, but no `timestamp_field` requirement:
    * index builds (codebook training, ANALYZE over non-temporal
    * tables) consume the rows as a set, not as a time series.
    */
  def readStatic(spark: SparkSession, src: SparkSource): DataFrame = {
    val reader = spark.read.options(src.options - NanosColumnsOption)
    val raw = src.fileFormat.toLowerCase match {
      case "parquet" => reader.parquet(src.path)
      case "csv"     => reader.option("header", "true").csv(src.path)
      case "json"    => reader.json(src.path)
      case "avro"    => AvroReader.read(spark, src.path)
      case other     => reader.format(other).load(src.path)
    }
    val nanosCols = src.options.get(NanosColumnsOption)
      .map(_.split(",").toSeq).getOrElse(Seq.empty)
    graft.Tables.nanosToTimestamp(raw, nanosCols)
  }

  /** Read with optional bounds on the source's `timestamp_field`.
    *
    * Bounds MUST be applied here, not as a post-read `.filter`, when the
    * timestamp column is stored in a form the loader normalizes (raw-ns
    * long or TIMESTAMP_NTZ): the normalization is a projection/cast, and
    * a filter on the computed column cannot push down to the parquet
    * scan — so the bound is translated to an equivalent predicate on the
    * raw column and lands in `PushedFilters`, where row-group stats /
    * partition pruning see it:
    *   - raw-ns long: `ts_µs <= U  ⇔  ts_ns < (U+1µs)·1000`;
    *   - TIMESTAMP_NTZ: the literal is cast to NTZ (value-preserving
    *     under the pinned UTC session), keeping the column side bare.
    * For ordinary timestamp columns the filter pushes down as-is.
    */
  def read(
      spark: SparkSession,
      src: SparkSource,
      tsLowerBound: Option[java.sql.Timestamp],
      tsUpperBound: Option[java.sql.Timestamp]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val reader = spark.read.options(src.options - NanosColumnsOption)
    val raw = src.fileFormat.toLowerCase match {
      case "parquet" => reader.parquet(src.path)
      case "csv"     => reader.option("header", "true").csv(src.path)
      case "json"    => reader.json(src.path)
      case "avro"    => AvroReader.read(spark, src.path)
      case other     => reader.format(other).load(src.path)
    }
    val nanosCols = src.options.get(NanosColumnsOption)
      .map(_.split(",").toSeq).getOrElse(Seq.empty)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    val tsRawType =
      if (nanosCols.contains(src.timestampField) &&
        raw.columns.contains(src.timestampField))
        Some(raw.schema(src.timestampField).dataType)
      else None
    val tsIsRawNanos = tsRawType.contains(org.apache.spark.sql.types.LongType)
    val tsIsNtz = tsRawType.contains(org.apache.spark.sql.types.TimestampNTZType)
    // NTZ column: keep the column side bare and move the cast onto the
    // literal (foldable), so the comparison still reaches PushedFilters.
    def bound(t: java.sql.Timestamp): org.apache.spark.sql.Column =
      if (tsIsNtz) lit(t).cast(org.apache.spark.sql.types.TimestampNTZType)
      else lit(t)
    val bounded0 = tsUpperBound.fold(raw) { u =>
      if (tsIsRawNanos) raw.filter(col(src.timestampField) < lit((micros(u) + 1) * 1000L))
      else raw.filter(col(src.timestampField) <= bound(u))
    }
    val bounded = tsLowerBound.fold(bounded0) { l =>
      if (tsIsRawNanos) bounded0.filter(col(src.timestampField) >= lit(micros(l) * 1000L))
      else bounded0.filter(col(src.timestampField) >= bound(l))
    }
    val df = graft.Tables.nanosToTimestamp(bounded, nanosCols)
    require(df.columns.contains(src.timestampField),
      s"source '${src.name}' at ${src.path} lacks timestamp_field '${src.timestampField}'")
    src.createdTimestampColumn.foreach { c =>
      require(df.columns.contains(c),
        s"source '${src.name}' at ${src.path} lacks created_timestamp_column '$c'")
    }
    df
  }
}
