package graft.online

import graft.SparkSpec
import graft.api.{FeatureStore, RepoConfig}
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import java.nio.file.Files
import java.sql.Timestamp

/** Materialize → online lookup loop (reference M5/M6), for both the
  * in-memory and parquet-backed stores.
  */
class OnlineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val featPath: String = {
    val dir = Files.createTempDirectory("graft_online").toString + "/f"
    Seq(
      ("a", "2024-01-01 00:00:00", 1.0),
      ("a", "2024-01-05 00:00:00", 5.0),   // latest in range for a
      ("a", "2024-02-01 00:00:00", 99.0),  // outside range
      ("b", "2024-01-03 00:00:00", 3.0)
    ).toDF("key", "s", "value")
      .select(col("key"), to_timestamp(col("s")).as("event_ts"), col("value"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def fixture(store: OnlineStore): FeatureStore = {
    val fs = new FeatureStore(spark, RepoConfig("t"), new InMemoryRegistry, store)
    fs.applyObjects(Seq(
      Entity("key", Seq("key"), ValueType.STRING),
      FeatureView("fv", Seq("key"), Seq(Feature("value", DoubleType)),
        SparkSource("s", featPath, timestampField = "event_ts"))))
    fs.materialize(
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-31 00:00:00"), Seq("fv"))
    fs
  }

  private def lookupValue(fs: FeatureStore, key: String): Option[Any] =
    fs.getOnlineFeatures(Seq(Map("key" -> key)), Seq("fv:value"))
      .head.get("fv__value").filter(_ != null)

  test("in-memory store serves latest-in-range vectors") {
    val fs = fixture(new InMemoryOnlineStore)
    assert(lookupValue(fs, "a") === Some(5.0))
    assert(lookupValue(fs, "b") === Some(3.0))
    assert(lookupValue(fs, "zz") === None)
  }

  test("parquet store round-trips through disk") {
    val root = Files.createTempDirectory("graft_kv").toString
    val fs = fixture(new ParquetOnlineStore(spark, root))
    assert(lookupValue(fs, "a") === Some(5.0))
    // fresh store instance reloads from disk
    val fs2 = new FeatureStore(spark, RepoConfig("t"), new InMemoryRegistry,
      new ParquetOnlineStore(spark, root))
    fs2.applyObjects(Seq(
      Entity("key", Seq("key"), ValueType.STRING),
      FeatureView("fv", Seq("key"), Seq(Feature("value", DoubleType)),
        SparkSource("s", featPath, timestampField = "event_ts"))))
    assert(lookupValue(fs2, "b") === Some(3.0))
  }

  test("materialize re-run overwrites with newer window (upsert)") {
    val store = new InMemoryOnlineStore
    val fs = fixture(store)
    fs.materialize(
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-03-01 00:00:00"), Seq("fv"))
    assert(lookupValue(fs, "a") === Some(99.0))
  }

  test("kv-client store writes executor-parallel and serves the full loop") {
    val fs = fixture(new KVClientOnlineStore(() => new OnlineSpec.FakeKVClient))
    assert(lookupValue(fs, "a") === Some(5.0))
    assert(lookupValue(fs, "b") === Some(3.0))
    assert(lookupValue(fs, "zz") === None)
    assert(OnlineSpec.fakeKvOpened.get() >= 2,
      "expected one client per partition plus the driver lookup client")
  }

  test("composite keys with separator/backslash content never collide") {
    val store = new InMemoryOnlineStore
    // ("ab", "c") vs ("a", "bc") concatenate identically
    // without escaping; so do ("x\\", "y") vs ("x", "\\y"); and a null
    // vs the literal strings "\\N" / "N".
    val rows = Seq(
      (Some("ab"), Some("c"), 1.0),
      (Some("a"), Some("bc"), 2.0),
      (Some("x\\"), Some("y"), 3.0),
      (Some("x"), Some("\\y"), 4.0),
      (None: Option[String], Some("z"), 5.0),
      (Some("\\N"), Some("z"), 6.0),
      (Some("N"), Some("z"), 7.0))
    val df = rows.toDF("k1", "k2", "v")
    store.write("cv", Seq("k1", "k2"), df)
    rows.foreach { case (k1, k2, v) =>
      assert(store.get("cv", Seq(k1.orNull, k2.orNull)).map(_("v")) === Some(v),
        s"lookup ($k1, $k2)")
    }
  }

  test("float32 narrowing applies only to declared-FLOAT features") {
    val store = new InMemoryOnlineStore
    store.write("tv", Seq("key"), Seq(("a", 10.04, 10.04)).toDF("key", "vd", "vf"))
    val fs = new FeatureStore(spark, RepoConfig("t"), new InMemoryRegistry, store)
    fs.applyObjects(Seq(
      Entity("key", Seq("key"), ValueType.STRING),
      FeatureView("tv", Seq("key"),
        Seq(Feature("vd", DoubleType),
          Feature("vf", org.apache.spark.sql.types.FloatType)),
        SparkSource("s", featPath, timestampField = "event_ts"))))
    val out = fs.getOnlineFeatures(Seq(Map("key" -> "a")), Seq("tv:vd", "tv:vf")).head
    assert(out("tv__vd") === 10.04) // DoubleType serves full precision
    assert(out("tv__vf") === 10.04f.toDouble) // declared FLOAT narrows
    assert(out("tv__vd") !== out("tv__vf"))
  }
}

object OnlineSpec {
  import scala.collection.concurrent.TrieMap
  import java.util.concurrent.atomic.AtomicInteger

  /** Shared-JVM stand-in for a networked KV service (local-mode executors
    * share the test JVM, so a static map observes executor-side puts).
    */
  val fakeKvData: TrieMap[String, Map[String, Any]] = TrieMap.empty
  val fakeKvOpened = new AtomicInteger(0)

  final class FakeKVClient extends KVClient {
    fakeKvOpened.incrementAndGet()
    override def put(key: String, vector: Map[String, Any]): Unit =
      fakeKvData.put(key, vector)
    override def get(key: String): Option[Map[String, Any]] = fakeKvData.get(key)
    override def close(): Unit = ()
  }
}
