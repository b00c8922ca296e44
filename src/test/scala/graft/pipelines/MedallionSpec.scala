package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** End-to-end medallion pipeline replica on fixture data (SURVEY §5.4):
  * ingest → bronze → silver (dynamic flatten) → gold (hourly agg), plus
  * the weather JSON chain.
  */
class MedallionSpec extends SparkSpec {
  import spark.implicits._

  test("ingest -> taxi silver -> gold end-to-end") {
    val bronzePath = Files.createTempDirectory("bronze").toString + "/t"
    val records = Seq(
      ("2022-04-01", Map("taxi_id" -> "t1", "trip_start" -> "2022-04-01 10:10:00",
        "fare" -> "10.5", "extra_key" -> "x")),
      ("2022-04-01", Map("taxi_id" -> "t1", "trip_start" -> "2022-04-01 10:40:00",
        "fare" -> "20.5")),
      ("2022-04-02", Map("taxi_id" -> "t2", "trip_start" -> "2022-04-02 09:00:00",
        "fare" -> "7.0")))
    Medallion.ingestBronze(spark, records, bronzePath, slices = 2)

    val bronze = spark.read.parquet(bronzePath)
    assert(bronze.columns.toSet === Set("created", "Body"))
    assert(bronze.count() === 3)

    val silver = Medallion.taxiSilver(bronze,
      keep = Seq("taxi_id", "trip_start", "fare"), tsKey = "trip_start")
    assert(silver.columns.toSet === Set("taxi_id", "trip_start", "fare", "created"))

    val gold = Medallion.taxiGold(
      silver.withColumn("fare", col("fare").cast("double")),
      "taxi_id", "trip_start", "fare")
    val t1hour = gold.filter(col("taxi_id") === "t1").head()
    assert(t1hour.getAs[Double]("avg_fare") === 15.5)
    assert(t1hour.getAs[Long]("n_events") === 2L)
  }

  test("ingest append accumulates batches (bronze is immutable log)") {
    val p = Files.createTempDirectory("bronze2").toString + "/t"
    val r = Seq(("2022-04-01", Map("k" -> "v")))
    Medallion.ingestBronze(spark, r, p, slices = 1)
    Medallion.ingestBronze(spark, r, p, slices = 1)
    assert(spark.read.parquet(p).count() === 2)
  }

  test("weather bronze -> silver -> gold chain") {
    val raw = Seq(
      ("""{"station_id":"s1","event_ts":"2022-04-01 10:10:00","air_temperature":"10.0","precipitation_code":"60","total_rain":"1.5"}""", "2022-04-01"),
      ("""{"station_id":"s1","event_ts":"2022-04-01 10:50:00","air_temperature":"12.0","precipitation_code":"70","total_rain":"2.5"}""", "2022-04-01"),
      ("""{"station_id":"s1","event_ts":"2022-04-01 11:20:00","air_temperature":"14.0","precipitation_code":"0","total_rain":null}""", "2022-04-01")
    ).toDF("body", "created")

    val bronze = Medallion.weatherBronze(raw)
    assert(bronze.columns.contains("station_id"))

    val silver = Medallion.weatherSilver(bronze)
    val types = silver.select("precipitation_type").as[String].collect().toSet
    assert(types === Set("rain", "snow", "no"))

    val gold = Medallion.weatherGold(silver).orderBy("event_timestamp")
    val rows = gold.select("avg_temperature", "total_rain", "precipitation")
      .collect()
    assert(rows(0).getDouble(0) === 11.0)   // 10:00 bucket: (10+12)/2
    assert(rows(0).getDouble(1) === 4.0)    // 1.5 + 2.5
    assert(rows(0).getString(2) === "snow") // snow > rain priority
    assert(rows(1).getString(2) === "no")   // null rain defaulted, code 0
    assert(rows(1).getDouble(1) === 0.0)
  }
}
