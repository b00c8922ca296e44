package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B of the two PIT formulations on the dense workload:
  *
  *   - `argmax` (graft's): join + `max(struct(ts, features))` groupBy —
  *     one shuffle for the join, one (ObjectHash/Sort) aggregate;
  *   - `window` (the reference's generated-SQL shape): join +
  *     ROW_NUMBER window + rn=1 filter + join-back.
  *
  * Prints timings for both and asserts identical results. Run:
  * `sbt "runMain graft.examples.PitStrategies [sfDir]"`.
  */
object PitStrategies {

  def windowPit(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.load(spark, dir, "events")
    val entity = events
      .select(col("user_id"), col("ts").as("event_timestamp")).distinct()
    val feat = events.select(col("user_id").as("f_user"), col("ts").as("f_ts"),
      col("value"))
    val joined = feat.join(entity,
      col("f_user") === col("user_id")
        && col("f_ts") <= col("event_timestamp")
        && col("f_ts") >= col("event_timestamp") - expr("INTERVAL 3 DAY"))
    val w = Window.partitionBy(col("user_id"), col("event_timestamp"))
      .orderBy(col("f_ts").desc, col("value").desc)
    val cleaned = joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_timestamp"),
        col("value").as("events_fv__value"))
    entity.join(cleaned, Seq("user_id", "event_timestamp"), "left")
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, dir) finally spark.stop()
  }

  /** The A/B body, session-agnostic so the spec suite can smoke it at
    * sf0.001 (ExamplesSmokeSpec) — the equivalence requires inside are
    * the pin; returns (strategy diff rows, coarse-vs-direct diff rows),
    * both 0 on success.
    */
  def run(spark: SparkSession, dir: String): (Long, Long) = {
    def time(name: String)(f: => DataFrame): DataFrame = {
      val df = f
      df.count() // warm plan
      val t0 = System.nanoTime()
      df.count()
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      df
    }

    val argmax = time("argmax  (graft)")(graft.Queries.pitDense(spark, dir))
    val window = time("window  (reference shape)")(windowPit(spark, dir))

    val diff = argmax.exceptAll(window).count() + window.exceptAll(argmax).count()
    println(s"result diff rows: $diff")
    require(diff == 0, "strategies disagree!")

    // TTL-less dense retrieval: direct as-of (history × cutoffs blow-up
    // risk) vs the coarse-bucket pre-reduction (bounded).
    def ttlLess(coarse: Option[Long]): graft.api.RetrievalJob = {
      import graft.core._
      val fs = new graft.api.FeatureStore(
        spark, graft.api.RepoConfig("demo"), new InMemoryRegistry)
      fs.applyObjects(Seq(
        Entity("user", Seq("user_id"), ValueType.INT64),
        FeatureView("events_fv", Seq("user"),
          Seq(Feature("value", org.apache.spark.sql.types.DoubleType)),
          SparkSource("events_src", s"$dir/events.parquet",
            timestampField = "ts",
            options = Map(graft.sources.SourceReader.NanosColumnsOption -> "ts")))))
      val entity = graft.Tables.load(spark, dir, "events")
        .select(col("user_id"), col("ts").as("event_timestamp")).distinct()
      fs.getHistoricalFeatures(entity, Seq("events_fv:value"),
        coarseBucketSeconds = coarse)
    }
    val directJob = ttlLess(None)
    val coarseJob = ttlLess(Some(86400L))
    val direct = time("ttl-less direct        ")(directJob.toDf)
    val coarse = time("ttl-less coarse-bucket ")(coarseJob.toDf)
    val cdiff = direct.exceptAll(coarse).count() + coarse.exceptAll(direct).count()
    println(s"coarse-vs-direct diff rows: $cdiff")
    require(cdiff == 0, "coarse path disagrees!")
    directJob.release()
    coarseJob.release()
    (diff, cdiff)
  }
}
