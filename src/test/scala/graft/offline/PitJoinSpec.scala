package graft.offline

import graft.SparkSpec
import graft.api.{FeatureStore, RepoConfig}
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

/** PIT join edge-case suite (SURVEY §5.1, §7.4.1/3/4): TTL exclusion,
  * tie-on-event_ts resolved by max created, null padding for entities
  * without eligible rows, multi-view fold, entity-less view.
  */
class PitJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Feature fixture written to parquet so scans/pruning run for real. */
  private lazy val featPath: String = {
    val dir = Files.createTempDirectory("graft_pit").toString
    Seq(
      // (key, event_ts, created_ts, value, label)
      ("a", "2024-01-01 10:00:00", "2024-01-01 10:05:00", 1.0, "first"),
      ("a", "2024-01-02 10:00:00", "2024-01-02 10:05:00", 2.0, "second"),
      // tie on event_ts for key a at 01-03: created decides → "late-wins"
      ("a", "2024-01-03 10:00:00", "2024-01-03 10:01:00", 3.0, "early-created"),
      ("a", "2024-01-03 10:00:00", "2024-01-03 10:09:00", 4.0, "late-wins"),
      // key b: only an old row (outside a 2-day TTL for late cutoffs)
      ("b", "2024-01-01 00:00:00", "2024-01-01 00:00:00", 9.0, "b-old"),
      // key c: only a FUTURE row relative to all cutoffs → always null
      ("c", "2024-09-01 00:00:00", "2024-09-01 00:00:00", 7.0, "c-future")
    ).toDF("key", "event_ts", "created_ts", "value", "label")
      .select(col("key"), to_timestamp(col("event_ts")).as("event_ts"),
        to_timestamp(col("created_ts")).as("created_ts"), col("value"), col("label"))
      .write.mode("overwrite").parquet(dir + "/feat")
    dir + "/feat"
  }

  private def store(ttl: Option[Duration]): FeatureStore = {
    val fs = new FeatureStore(spark, RepoConfig("t"), new InMemoryRegistry)
    fs.applyObjects(Seq(
      Entity("key", Seq("key"), ValueType.STRING),
      FeatureView("fv", Seq("key"),
        Seq(Feature("value", DoubleType), Feature("label", StringType)),
        SparkSource("src", featPath, timestampField = "event_ts",
          createdTimestampColumn = Some("created_ts")),
        ttl)))
    fs
  }

  private def entity(rows: (String, String)*) =
    rows.toSeq.toDF("key", "cut")
      .select(col("key"), to_timestamp(col("cut")).as("event_timestamp"))

  private def retrieve(fs: FeatureStore, ent: org.apache.spark.sql.DataFrame) =
    fs.getHistoricalFeatures(ent, Seq("fv:value", "fv:label")).toDf
      .select("key", "event_timestamp", "fv__value", "fv__label")
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.get(2)), Option(r.get(3)))).toSet

  test("as-of picks latest eligible row per entity timestamp") {
    val got = retrieve(store(None), entity(
      ("a", "2024-01-01 12:00:00"), ("a", "2024-01-02 12:00:00")))
    assert(got === Set(
      ("a", ts("2024-01-01 12:00:00"), Some(1.0), Some("first")),
      ("a", ts("2024-01-02 12:00:00"), Some(2.0), Some("second"))))
  }

  test("tie on event_ts resolved by max created_ts") {
    val got = retrieve(store(None), entity(("a", "2024-01-04 00:00:00")))
    assert(got === Set(("a", ts("2024-01-04 00:00:00"), Some(4.0), Some("late-wins"))))
  }

  test("TTL excludes stale rows and null-pads") {
    val got = retrieve(store(Some(Duration.ofDays(2))), entity(
      ("b", "2024-01-02 00:00:00"),  // within 2d of b-old → match
      ("b", "2024-01-20 00:00:00"))) // b-old outside TTL → null
    assert(got === Set(
      ("b", ts("2024-01-02 00:00:00"), Some(9.0), Some("b-old")),
      ("b", ts("2024-01-20 00:00:00"), None, None)))
  }

  test("future-only feature rows never match (no leakage) and unknown keys null-pad") {
    val got = retrieve(store(None), entity(
      ("c", "2024-01-02 00:00:00"),  // c only has a September row → null
      ("zz", "2024-01-02 00:00:00")))
    assert(got === Set(
      ("c", ts("2024-01-02 00:00:00"), None, None),
      ("zz", ts("2024-01-02 00:00:00"), None, None)))
  }

  test("left join preserves duplicate entity rows and extra columns") {
    val ent = Seq(("a", "2024-01-02 12:00:00", "x1"), ("a", "2024-01-02 12:00:00", "x2"))
      .toDF("key", "cut", "tag")
      .select(col("key"), to_timestamp(col("cut")).as("event_timestamp"), col("tag"))
    val out = store(None).getHistoricalFeatures(ent, Seq("fv:value")).toDf
    assert(out.count() === 2)
    assert(out.select("tag").as[String].collect().toSet === Set("x1", "x2"))
    assert(out.select("fv__value").as[Double].collect().toSeq === Seq(2.0, 2.0))
  }

  test("multi-view fold joins each view independently") {
    val dir2 = Files.createTempDirectory("graft_pit2").toString + "/feat2"
    Seq(("a", "2024-01-01 00:00:00", 100L))
      .toDF("key", "event_ts", "score")
      .select(col("key"), to_timestamp(col("event_ts")).as("event_ts"), col("score"))
      .write.mode("overwrite").parquet(dir2)
    val fs = store(None)
    fs.applyObjects(Seq(FeatureView("fv2", Seq("key"),
      Seq(Feature("score", org.apache.spark.sql.types.LongType)),
      SparkSource("src2", dir2, timestampField = "event_ts"))))
    val out = fs.getHistoricalFeatures(
      entity(("a", "2024-01-02 12:00:00"), ("b", "2024-01-02 12:00:00")),
      Seq("fv:value", "fv2:score")).toDf
    val rows = out.select("key", "fv__value", "fv2__score")
      .collect().map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(rows === Set(
      ("a", Some(2.0), Some(100L)),
      ("b", Some(9.0), None))) // b matches fv (no TTL) but not fv2
  }

  test("entity-less view (no join keys) attaches global latest as-of") {
    val fs = new FeatureStore(spark, RepoConfig("t"), new InMemoryRegistry)
    fs.applyObjects(Seq(FeatureView("gv", Seq.empty,
      Seq(Feature("value", DoubleType)),
      SparkSource("src", featPath, timestampField = "event_ts",
        createdTimestampColumn = Some("created_ts")))))
    val out = fs.getHistoricalFeatures(
      entity(("whatever", "2024-01-02 12:00:00")), Seq("gv:value")).toDf
    // global latest row with event_ts <= cutoff is ("a", 01-02 10:00, 2.0)
    assert(out.select("gv__value").as[Double].collect().toSeq === Seq(2.0))
  }

  test("output row count always equals entity row count (left-join totality)") {
    val ent = graft.Queries.pitEntityGrid(spark, sf0001)
    val out = graft.Queries.pitJoin(spark, sf0001)
    assert(out.count() === ent.count())
  }

  test("release() unpersists the cached entity df (no leaked blocks)") {
    import org.apache.spark.storage.StorageLevel
    val ent = graft.Queries.pitEntityGrid(spark, sf0001)
    ent.unpersist(true) // clear anything another suite leaked for this plan
    assert(ent.storageLevel === StorageLevel.NONE)
    val fs = graft.Queries.pitFeatureStore(spark, sf0001)
    val job = fs.getHistoricalFeatures(ent, Seq("events_fv:value"),
      cacheEntity = true)
    assert(job.toDf.count() > 0)
    assert(ent.storageLevel !== StorageLevel.NONE,
      "expected the entity df to be cached during retrieval")
    job.release()
    assert(ent.storageLevel === StorageLevel.NONE,
      "entity cache leaked after release()")
  }
}
