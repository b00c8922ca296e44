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

  def read(spark: SparkSession, src: SparkSource): DataFrame = {
    val reader = spark.read.options(src.options - NanosColumnsOption)
    val raw = src.fileFormat.toLowerCase match {
      case "parquet" => reader.parquet(src.path)
      case "csv"     => reader.option("header", "true").csv(src.path)
      case "json"    => reader.json(src.path)
      case other     => reader.format(other).load(src.path)
    }
    val df = src.options.get(NanosColumnsOption) match {
      case Some(cols) => graft.Tables.nanosToTimestamp(raw, cols.split(",").toSeq)
      case None       => raw
    }
    require(df.columns.contains(src.timestampField),
      s"source '${src.name}' at ${src.path} lacks timestamp_field '${src.timestampField}'")
    src.createdTimestampColumn.foreach { c =>
      require(df.columns.contains(c),
        s"source '${src.name}' at ${src.path} lacks created_timestamp_column '$c'")
    }
    df
  }
}
