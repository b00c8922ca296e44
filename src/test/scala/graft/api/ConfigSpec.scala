package graft.api

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

/** M1: `feature_store.yaml` loading — parser subset + the full
  * register → materialize → online-lookup loop driven from a repo dir,
  * mirroring the reference workflow that starts at
  * `FeatureStore(repo_path)` (`CASE.MD:129-141`).
  */
class ConfigSpec extends SparkSpec {
  import spark.implicits._

  test("yaml subset: nesting, quotes, comments, value-with-colon") {
    val doc = Yaml.parse(
      """# full-line comment
        |registry:
        |  registry_store_type: some.provider.RegistryStore
        |  path: "hdfs://nn:8020/feast/registry.db"
        |project: production
        |provider: local
        |online_store:
        |    type: redis
        |    connection_string: "host:6379,password=a#b,ssl=True"
        |    namespace: "quoted#value" # trailing comment after quoted value
        |offline_store:
        |    type: spark # will use the active SparkSession
        |    spark_conf:
        |        spark.master: "spark://spark-master:7077"
        |        spark.sql.session.timeZone: "UTC"
        |""".stripMargin)
    assert(Yaml.str(doc, "project") === Some("production"))
    assert(Yaml.str(Yaml.sub(doc, "registry"), "path") ===
      Some("hdfs://nn:8020/feast/registry.db"))
    // trailing comment stripped, quoted '#' preserved
    assert(Yaml.str(Yaml.sub(doc, "offline_store"), "type") === Some("spark"))
    assert(Yaml.str(Yaml.sub(doc, "online_store"), "connection_string") ===
      Some("host:6379,password=a#b,ssl=True"))
    // trailing comment after a QUOTED value is stripped, quotes removed
    assert(Yaml.str(Yaml.sub(doc, "online_store"), "namespace") ===
      Some("quoted#value"))
    assert(Yaml.str(Yaml.sub(Yaml.sub(doc, "offline_store"), "spark_conf"),
      "spark.master") === Some("spark://spark-master:7077"))
  }

  test("fromRepo wires registry + parquet online store and runs the full loop") {
    val repo = Files.createTempDirectory("graft_repo").toString
    Files.writeString(Paths.get(repo, "feature_store.yaml"),
      """project: yaml_demo
        |registry:
        |  path: data/registry.json
        |provider: local
        |online_store:
        |    type: parquet
        |    path: data/online
        |offline_store:
        |    type: spark
        |""".stripMargin)
    val feat = repo + "/feat"
    Seq(
      ("a", "2024-01-01 00:00:00", 1.5),
      ("a", "2024-01-05 00:00:00", 5.5),
      ("b", "2024-01-03 00:00:00", 3.5)
    ).toDF("key", "s", "value")
      .select(col("key"), to_timestamp(col("s")).as("event_ts"), col("value"))
      .write.mode("overwrite").parquet(feat)

    val fs = FeatureStore.fromRepo(spark, repo)
    assert(fs.config.project === "yaml_demo")
    assert(fs.config.onlineStoreType === "parquet")
    fs.applyObjects(Seq(
      Entity("key", Seq("key"), ValueType.STRING),
      FeatureView("fv", Seq("key"), Seq(Feature("value", DoubleType)),
        SparkSource("s", feat, timestampField = "event_ts"))))
    fs.materialize(
      Timestamp.valueOf("2024-01-01 00:00:00"),
      Timestamp.valueOf("2024-01-31 00:00:00"), Seq("fv"))

    // a second store built from the same repo dir sees both the registry
    // (HadoopRegistry at data/registry.json) and the parquet KV on disk
    val fs2 = FeatureStore.fromRepo(spark, repo)
    assert(fs2.listFeatureViews().map(_.name) === Seq("fv"))
    val out = fs2.getOnlineFeatures(Seq(Map("key" -> "a")), Seq("fv:value"))
    assert(out.head("fv__value") === 5.5)
  }

  test("fromRepo with registry shorthand and memory store defaults") {
    val repo = Files.createTempDirectory("graft_repo2").toString
    Files.writeString(Paths.get(repo, "feature_store.yaml"),
      """project: p2
        |registry: data/reg.json
        |online_store:
        |    type: memory
        |""".stripMargin)
    val fs = FeatureStore.fromRepo(spark, repo)
    fs.applyObjects(Seq(Entity("k", Seq("k"), ValueType.INT64)))
    assert(new java.io.File(repo, "data/reg.json").exists(),
      "registry shorthand path not honored")
    assert(fs.listEntities().map(_.name) === Seq("k"))
  }
}
