package graft.pipelines

import graft.transform.Transforms
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Executable replicas of the reference's medallion pipelines (SURVEY
  * §3.1-3.2), re-expressed as composable `DataFrame => DataFrame` stages
  * over the test fixtures:
  *
  *   - ingest: driver-fetched records → partitioned bronze append
  *     (reference `ingest_taxy.py:27-76`);
  *   - taxi silver: dynamic map-column flatten + prune + typed partition
  *     key (reference `chicago_taxi_trips_silver.ipynb:38-76`);
  *   - taxi gold: hour-truncated keyed aggregates (reference
  *     `chicago_taxi_trips_hourly_gold.ipynb:66-99`);
  *   - weather bronze→silver→gold: JSON parse with declared schema →
  *     recode/cast → hourly agg with collect_set + priority collapse
  *     (reference `chicago_weather_bronze.py`, `chicago_weather_silver
  *     .py`, `chicago_weather_hourly_fs.py`).
  *
  * Scale: every write goes through [[Transforms.writePartitioned]]
  * (repartition-by-partition-column before partitionBy — small-files
  * control); aggregation stages are single keyed shuffles.
  */
object Medallion {

  // ------------------------------------------------------------- ingest
  /** S1/S2: rows fetched on the driver (API page results) land as a
    * (created, Body) bronze table, partitioned by ingest date. `slices`
    * mirrors the reference's numSlices=31 task-size bound.
    */
  def ingestBronze(
      spark: SparkSession,
      records: Seq[(String, Map[String, String])],
      path: String,
      slices: Int = 31): Unit = {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(records, slices)
      .toDF("created_raw", "Body")
      .select(to_date(col("created_raw")).as("created"), col("Body"))
    // through writePartitioned (repartition on the partition column
    // first): a direct partitionBy write from `slices` tasks emits up
    // to slices FILES per date dir per ingest — daily appends would
    // accumulate hundreds of small files per partition, the exact
    // problem the module doc claims is controlled
    graft.transform.Transforms.writePartitioned(
      df, path, "created", mode = "append")
  }

  // ------------------------------------------------------------- taxi
  /** Silver: discover the dynamic key set of the `Body` map, flatten to
    * columns, prune to `keep`, add the typed partition date.
    */
  def taxiSilver(bronze: DataFrame, keep: Seq[String], tsKey: String): DataFrame = {
    val flat = Transforms.flattenMapColumn(bronze, "Body")
    val pruned = flat.select(keep.map(col): _*)
    pruned.withColumn("created", to_date(col(tsKey)))
  }

  /** Gold: hourly stats per entity key (the flagship feature table). */
  def taxiGold(silver: DataFrame, keyCol: String, tsCol: String, valueCol: String): DataFrame =
    Transforms.hourlyStats(
      silver.withColumn(tsCol, to_timestamp(col(tsCol))),
      Seq(keyCol), tsCol, valueCol)
      .withColumn("created", to_date(col("event_timestamp")))

  // ------------------------------------------------------------- weather
  /** The reference's 18-field all-string declared schema
    * (`chicago_weather_bronze.py:17-36`), abbreviated to the fields the
    * downstream stages read.
    */
  val weatherSchema: StructType = StructType(Seq(
    "station_id", "event_ts", "air_temperature", "precipitation_code",
    "total_rain").map(StructField(_, StringType)))

  /** Bronze: parse the raw JSON payload with the declared schema and
    * expand (`selectExpr("value.*", ...)` idiom).
    */
  def weatherBronze(raw: DataFrame, payloadCol: String = "body"): DataFrame =
    raw.withColumn("value", from_json(col(payloadCol), weatherSchema))
      .select(col("value.*"), col("created"))

  /** Silver: typed casts, recode of the precipitation code, hour-bucket
    * event timestamp.
    */
  def weatherSilver(bronze: DataFrame): DataFrame =
    bronze.select(
      col("station_id"),
      to_timestamp(col("event_ts")).as("event_ts"),
      col("air_temperature").cast("double").as("air_temperature"),
      Transforms.recode(col("precipitation_code"),
        Map("0" -> "no", "60" -> "rain", "70" -> "snow"), lit("no"))
        .as("precipitation_type"),
      Transforms.nullDefault(col("total_rain").cast("double"), 0.0).as("total_rain"),
      col("created"))

  /** Gold: hourly aggregates — avg temperature, the precipitation set
    * collapsed by priority, summed rain; surrogate read_id minted from
    * the hour bucket (reference `chicago_weather_hourly_fs.py:38-53`).
    */
  def weatherGold(silver: DataFrame): DataFrame =
    silver
      .groupBy(Transforms.hourBucket(col("event_ts")).as("event_timestamp"))
      .agg(
        avg(col("air_temperature")).as("avg_temperature"),
        collect_set(col("precipitation_type")).as("precipitation_set"),
        sum(col("total_rain")).as("total_rain"))
      .withColumn("precipitation",
        Transforms.precipitationPriority(col("precipitation_set")))
      .withColumn("read_id",
        unix_timestamp(col("event_timestamp")).cast("string"))
      .drop("precipitation_set")
}
