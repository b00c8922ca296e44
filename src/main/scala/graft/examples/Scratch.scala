package graft.examples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B harness for optimization experiments (r22: ledger-write
  * Jaccard decomposition for q250/q244).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.pipelines.TrainingDataPipeline
    import graft.ops.Dedup

    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s median=${ts.sorted.apply(1)}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val d = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"),
        graft.ops.TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    // build persisted state for 3 arrivals once
    val root = java.nio.file.Files.createTempDirectory("graft-scratch-").toString
    TrainingDataPipeline.arrivalReports(d, "doc_id", Seq("source"), "n_tokens",
      nBatches = 3, stateDir = Some(root)).count()
    println(s"state at $root")
    val cfg = TrainingDataPipeline.Config()
    val b = 2L
    val maxId = d.agg(max(col("doc_id"))).head.getLong(0)
    val width = maxId / 3 + 1
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val ann = TrainingDataPipeline.annotate(
      d.filter(col("doc_id") >= b * width && col("doc_id") < (b + 1) * width))
      .localCheckpoint(true)
    val batch = ann.filter(TrainingDataPipeline.gatePredicate(cfg))
    val dd = spark.read.parquet(s"$root/dd/batch=$b")
    // candidates exactly as curateIncrement builds them
    val bandsB = spark.read.parquet(s"$root/bands/batch=$b")
    val index = spark.read.parquet(s"$root/bands")
      .filter(col("batch") < b)
      .select(col("doc_id").as("a"), col("band_idx"), col("band_hash"),
        col("batch").cast("long").as("a_batch"))
    val cross = bandsB.join(index, Seq("band_idx", "band_hash"))
      .select(col("a"), col("doc_id").as("b"), col("a_batch"))
    val inBatch = Dedup.candidatePairs(bandsB, "doc_id")
      .withColumn("a_batch", lit(b))
    time("pairs checkpoint") {
      cross.unionByName(inBatch)
        .select(col("a"), col("b")).distinct().localCheckpoint(true)
    }
    val pairs = cross.unionByName(inBatch)
      .select(col("a"), col("b")).distinct().localCheckpoint(true)
    println(s"pairs = ${pairs.count()}")
    val candBatches = Seq(0L, 1L, 2L)
    def post = spark.read.parquet(s"$root/postings")
      .filter(col("batch").isin(candBatches: _*)).drop("batch")
    def sizes = spark.read.parquet(s"$root/sizes")
      .filter(col("batch").isin(candBatches: _*)).drop("batch")
    println(s"postings rows (pruned dirs) = ${post.count()}")
    val candIds = pairs.select(col("a").as("doc_id"))
      .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
    println(s"candIds = ${candIds.count()}, pruned postings = ${post.join(candIds, Seq("doc_id"), "left_semi").count()}")

    def verified = TrainingDataPipeline.prunedJaccardStage(pairs, post, sizes, "doc_id")
      .filter(col("jaccard") >= cfg.jaccardThreshold)
    time("verification noop") {
      verified.write.format("noop").mode("overwrite").save()
    }
    // variant: checkpoint the candidate-pruned postings once, reuse both sides
    def verifiedCk = {
      val pp = post.join(candIds, Seq("doc_id"), "left_semi").localCheckpoint(true)
      val ss = sizes.join(candIds, Seq("doc_id"), "left_semi")
      Dedup.ngramJaccardWithSizes(pairs, pp, ss, "doc_id")
        .filter(col("jaccard") >= cfg.jaccardThreshold)
    }
    time("verification ck-postings") {
      verifiedCk.write.format("noop").mode("overwrite").save()
    }
    // full ledger write (the real action)
    def ledgerWrite(out: String): Unit = {
      val losers = verified.select(col("b").as("doc_id")).distinct()
      ann.filter(not(coalesce(TrainingDataPipeline.gatePredicate(cfg), lit(false))))
        .select(col("doc_id"), lit("gate").as("reason"))
        .unionByName(dd.filter(col("kept") === 0L)
          .select(col("doc_id"), lit("exact_dup").as("reason")))
        .unionByName(losers.select(col("doc_id"), lit("near_dup").as("reason")))
        .write.mode("overwrite").parquet(out)
    }
    time("ledger write") { ledgerWrite(s"$root/scratch-ledger") }
    // variant: SHJ preference
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    time("ledger write SHJ") { ledgerWrite(s"$root/scratch-ledger2") }
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    // variant: loop width 32
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    time("ledger write w32") { ledgerWrite(s"$root/scratch-ledger3") }
    spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.stop()
  }
}
