package graft.examples

import graft.api.FeatureStore
import graft.core._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end example of the feature-store loop on sf0.001 — the rebuild
  * of the reference's flagship flow (`explore_features.ipynb` cells 2-9):
  * register → get_historical_features → materialize → get_online_features.
  *
  * Run: `sbt "runMain graft.examples.FullLoop"`.
  */
object FullLoop {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, dir) finally spark.stop()
  }

  /** The demo body, session-agnostic so the spec suite can smoke it
    * (ExamplesSmokeSpec) without owning the session lifecycle. Returns
    * (historical PIT rows, online lookup rows, facade-served retrieval
    * rows, post-retrain serving rows, post-repair-and-GC serving rows,
    * corpus size) — the flagship facade demo carries retrain → health →
    * repair → GC and must not silently rot.
    */
  def run(spark: SparkSession, dir: String)
      : (Long, Seq[Map[String, Any]], Long, Long, Long, Long) = {
    // M1: the loop starts the way the reference's does — a repo dir with
    // a feature_store.yaml describing registry + online store.
    val repo = java.nio.file.Files.createTempDirectory("graft_repo")
    java.nio.file.Files.writeString(repo.resolve("feature_store.yaml"),
      """project: graft_demo
        |registry:
        |  path: data/registry.json
        |online_store:
        |    type: memory
        |offline_store:
        |    type: spark
        |""".stripMargin)
    val fs = FeatureStore.fromRepo(spark, repo.toString)
    println(s"loaded config: project=${fs.config.project} registry=${fs.config.registryPath.get}")

    // 1. register (M2)
    fs.applyObjects(Seq(
      Entity("user", Seq("user_id"), ValueType.INT64),
      FeatureView(
        name = "events_fv",
        entities = Seq("user"),
        features = Seq(
          Feature("value", org.apache.spark.sql.types.DoubleType),
          Feature("event_type", org.apache.spark.sql.types.StringType)),
        source = SparkSource("events_src", s"$dir/events.parquet",
          timestampField = "ts",
          options = Map(graft.sources.SourceReader.NanosColumnsOption -> "ts")),
        ttl = Some(java.time.Duration.ofDays(7)))))
    println(s"registered: ${fs.listFeatureViews().map(_.name)} / ${fs.listEntities().map(_.name)}")

    // 1b. ANALYZE at register time: persist the per-join-key histogram
    // next to the registry, then drive a join-size forecast from the
    // REGISTRY statistics — no source rescan at decision time.
    val statsPath = fs.analyze("events_fv")
    val counts = fs.statsFor("events_fv").get
    val forecast = graft.transform.Skew.joinSizeForecastFromCounts(
      counts.withColumnRenamed("n", "n_a"),
      counts.withColumnRenamed("n", "n_b"), Seq("user_id"), topK = 3)
    println(s"stats at $statsPath; self-join forecast (from registry stats):")
    forecast.show(false)

    // 2. historical PIT retrieval (M4)
    import spark.implicits._
    val entityDf = Seq(
      (3L, "2024-01-15 00:00:00"),
      (7L, "2024-01-15 00:00:00"),
      (3L, "2024-01-29 00:00:00")
    ).toDF("user_id", "cutoff")
      .select(col("user_id"), to_timestamp(col("cutoff")).as("event_timestamp"))
    val job = fs.getHistoricalFeatures(entityDf,
      Seq("events_fv:value", "events_fv:event_type"))
    job.toDf.show(false)
    val histRows = job.toDf.count()
    job.release() // free the entity cache after the terminal action

    // 3. materialize latest vectors to the online store (M5)
    fs.materialize(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-31 23:59:59"),
      Seq("events_fv"))

    // 4. online lookup (M6) — no Spark job
    val online = fs.getOnlineFeatures(
      Seq(Map("user_id" -> 3L), Map("user_id" -> 7L)),
      Seq("events_fv:value", "events_fv:event_type"))
    online.foreach(println)

    // 5. the ANN index lifecycle THROUGH the facade (r17): register an
    // embedding view, train-and-persist its codebook beside the
    // registry, absorb the corpus as arrivals into the maintained
    // cell-partitioned index state, and serve retrieval from it — no
    // hand-wired stateDir or centroids anywhere.
    fs.applyObjects(Seq(
      Entity("vec", Seq("vec_id"), ValueType.INT64),
      FeatureView("emb_fv", Seq("vec"),
        Seq(Feature("embedding",
          org.apache.spark.sql.types.DataType.fromDDL("array<double>"))),
        SparkSource("emb_src", s"$dir/embeddings.parquet"))))
    fs.trainCodebook("emb_fv", "vec_id", "embedding")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val vMax = emb.agg(max(col("vec_id"))).head.getLong(0)
    val vWidth = vMax / 2 + 1
    for (b <- 0L until 2L)
      fs.indexIncrement("emb_fv",
        emb.filter(col("vec_id") >= b * vWidth && col("vec_id") < (b + 1) * vWidth),
        "vec_id", "embedding", b)
    // count NOW: the retrieval frame's captured file listing dies when
    // the maintenance below rewrites the assign partitions (the
    // repo-wide stale-listing rule) — never re-execute it post-GC
    val hitRows = fs.searchIndex("emb_fv",
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 104),
      "vec_id", "embedding", topK = 5, nprobe = 8).count()
    println(s"facade-served IVF retrieval: $hitRows results " +
      s"for 4 queries from ${fs.indexStatePath("emb_fv")}")

    // 6. the MAINTENANCE half of the lifecycle, same API (r18): a
    // retrain strands the accumulated state (every serve silently
    // version-filters it out — indexHealth makes that loud), repair
    // re-absorbs the history under the stored codebook, and GC folds
    // the partitions, dropping anything a repair chose to abandon.
    def servingRows() = fs.indexHealth("emb_fv").collect()
      .filter(_.getAs[Long]("is_serving") == 1L)
      .map(_.getAs[Long]("n_rows")).sum
    graft.core.CodebookStore.save( // a retrain under new settings
      graft.ops.Similarity.lloydCentroids(emb, "vec_id", "embedding", 16, 1),
      graft.core.CodebookStore.codebookPath(
        fs.config.registryPath.get, "emb_fv__ivf16x3"))
    val stale = servingRows()
    val repairedBatches = fs.repairIndex("emb_fv", emb, "vec_id", "embedding")
    fs.gcIndex("emb_fv")
    val repaired = servingRows()
    println(s"index maintenance: post-retrain serving rows $stale -> " +
      s"$repaired after repairing batches " +
      s"${repairedBatches.mkString(",")} + GC")

    (histRows, online, hitRows, stale, repaired, emb.count())
  }
}
