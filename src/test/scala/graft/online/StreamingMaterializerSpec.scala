package graft.online

import graft.SparkSpec
import graft.core.{Feature, FeatureView, SparkSource}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import java.nio.file.Files

/** Streaming materialization: micro-batches of file drops keep the
  * online store's latest vectors fresh, including out-of-order batches
  * and partial-key upserts for both store implementations.
  */
class StreamingMaterializerSpec extends SparkSpec {
  import spark.implicits._

  private val view = FeatureView("fv", Seq("key"),
    Seq(Feature("v", DoubleType)),
    SparkSource("s", "unused", timestampField = "event_ts"))

  private def batch(rows: (String, String, Double)*) =
    rows.toSeq.toDF("key", "s", "v")
      .select(col("key"), to_timestamp(col("s")).as("event_ts"), col("v"))

  test("micro-batches update latest vectors; stale out-of-order rows don't regress") {
    val store = new InMemoryOnlineStore
    def push(b: org.apache.spark.sql.DataFrame): Unit =
      StreamingMaterializer.mergeLatest(store, view, Seq("key"),
        StreamingMaterializer.latestPerKey(b, view, Seq("key")))

    push(batch(("a", "2024-01-01 10:00:00", 1.0), ("b", "2024-01-01 10:00:00", 2.0)))
    assert(store.get("fv", Seq("a")).get("v") === 1.0)

    // newer value for a only
    push(batch(("a", "2024-01-02 10:00:00", 10.0)))
    assert(store.get("fv", Seq("a")).get("v") === 10.0)
    assert(store.get("fv", Seq("b")).get("v") === 2.0) // untouched key survives

    // out-of-order older row must NOT regress the stored vector
    push(batch(("a", "2024-01-01 00:00:00", 99.0)))
    assert(store.get("fv", Seq("a")).get("v") === 10.0)
  }

  test("a null incoming event_timestamp never beats a stored vector (and never NPEs)") {
    val store = new InMemoryOnlineStore
    def push(b: org.apache.spark.sql.DataFrame): Unit =
      StreamingMaterializer.mergeLatest(store, view, Seq("key"),
        StreamingMaterializer.latestPerKey(b, view, Seq("key")))
    push(batch(("a", "2024-01-01 10:00:00", 1.0)))
    // dirty source: the key's whole micro-batch arrives with null ts —
    // Timestamp.after(null) used to NPE inside foreachBatch and kill
    // the streaming query; the null row must simply lose to the stored
    // vector
    val nullTs = Seq(("a", 7.0), ("c", 9.0)).toDF("key", "v")
      .select(col("key"), lit(null).cast("timestamp").as("event_ts"),
        col("v"))
    push(nullTs)
    assert(store.get("fv", Seq("a")).get("v") === 1.0,
      "a null-ts row must not replace a stored vector")
    // a key with no stored vector still lands (nothing to lose to)
    assert(store.get("fv", Seq("c")).map(_("v")) === Some(9.0))
  }

  test("parquet store upsert keeps untouched keys (whole-table override)") {
    val root = Files.createTempDirectory("kvup").toString
    val store = new ParquetOnlineStore(spark, root)
    store.write("fv", Seq("key"),
      batch(("a", "2024-01-01 00:00:00", 1.0), ("b", "2024-01-01 00:00:00", 2.0))
        .withColumnRenamed("event_ts", "event_timestamp"))
    store.upsert("fv", Seq("key"),
      batch(("a", "2024-01-02 00:00:00", 5.0))
        .withColumnRenamed("event_ts", "event_timestamp"))
    // fresh store instance reloads from disk
    val reloaded = new ParquetOnlineStore(spark, root)
    assert(reloaded.get("fv", Seq("a")).get("v") === 5.0)
    assert(reloaded.get("fv", Seq("b")).get("v") === 2.0)
  }

  test("end-to-end streaming query materializes continuously") {
    val src = Files.createTempDirectory("smat").toString
    val chk = Files.createTempDirectory("smat_chk").toString
    val store = new InMemoryOnlineStore

    batch(("a", "2024-01-01 10:00:00", 1.0))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = StreamingMaterializer.stream(spark, stream, store, view, Seq("key"), chk)
      .start()
    try {
      q.processAllAvailable()
      assert(store.get("fv", Seq("a")).get("v") === 1.0)
      batch(("a", "2024-01-03 10:00:00", 42.0), ("c", "2024-01-03 10:00:00", 7.0))
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      assert(store.get("fv", Seq("a")).get("v") === 42.0)
      assert(store.get("fv", Seq("c")).get("v") === 7.0)
    } finally q.stop()
  }
}
