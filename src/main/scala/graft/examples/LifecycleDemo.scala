package graft.examples

import graft.pipelines.{CorpusManifest, TrainingDataPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end example of the TRAINING-DATA lifecycle on sf0.001 — the
  * curation twin of [[FullLoop]]'s feature-store loop, stringing the
  * production arrival APIs together the way a daily crawl job would:
  *
  *  1. per arrival: [[TrainingDataPipeline.curateIncrement]] (gate →
  *     incremental exact dedup → incremental LSH near-dedup against
  *     persisted state) + [[TrainingDataPipeline.driftIncrement]] (the
  *     persisted-histogram PSI monitor) — one O(increment) pass each;
  *  2. mid-stream state maintenance: [[graft.pipelines.CurationState
  *     .compactState]] folds the old arrival partitions and
  *     [[graft.pipelines.CurationState.purgeDocs]] forgets the
  *     outright rejects (both decision-free — q250's hash gate);
  *  3. a PLANTED degraded arrival (truncated docs) trips the monitor;
  *  4. publish: [[CorpusManifest.write]] (key-partitioned data,
  *     manifest last) and both verify tiers (full + sampled).
  *
  * Run: `sbt "runMain graft.examples.LifecycleDemo"`.
  */
object LifecycleDemo {
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
    * (per-arrival (kept, drift), full-verify ok count, key count,
    * state-manifest tables ok, state-served retrieval rows).
    */
  def run(spark: SparkSession,
      dir: String): (Seq[(Long, Long)], Long, Long, Long, Long) = {
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    val width = maxId / 3 + 1
    val natural = (0L until 3L).map(b =>
      docs.filter(col("doc_id") >= b * width && col("doc_id") < (b + 1) * width))
    // the broken-crawl arrival: batch 0's docs truncated to 64 chars
    val degraded = natural.head.select(
      (col("doc_id") + maxId + 1L).as("doc_id"),
      substring(col("text"), 1, 64).as("text"), col("source"))
    val arrivals = natural :+ degraded

    val state = java.nio.file.Files.createTempDirectory("lifecycle_state").toString
    val perArrival = arrivals.zipWithIndex.map { case (arrival, b) =>
      val report = TrainingDataPipeline.curateIncrement(
        arrival, "doc_id", Seq("source"), "n_tokens", state, b.toLong)
      val drift = TrainingDataPipeline.driftIncrement(
        arrival, "text", state, b.toLong)
      val kept = report.agg(sum(col("n"))).head.getLong(0)
      val psiRow = drift.agg(max(col("psi_cum")), max(col("drift"))).head
      val driftFlag = if (b == 0 || psiRow.isNullAt(1)) 0L else psiRow.getLong(1)
      val psi = if (b == 0) "   (no reference)"
        else f"psi=${psiRow.getDouble(0)}%7.4f drift=$driftFlag"
      println(f"arrival $b%d: in=${arrival.count()}%4d kept=$kept%4d  $psi")
      // state maintenance mid-stream (round-14): after arrival 1, fold
      // the old partitions into one per table and forget the outright
      // rejects (gate/exact-dup) — q250 hash-proves neither moves any
      // later decision, so the demo's downstream readout is unchanged
      if (b == 1) {
        import graft.pipelines.CurationState
        CurationState.compactState(spark, state, 1L,
          tables = CurationState.CurationTables :+ "lenhist")
        CurationState.purgeDocs(spark, state,
          CurationState.rejectedIds(spark, state, "doc_id", 1L), "doc_id")
        println("maintenance: compacted batches {0,1}; purged outright rejects")
      }
      (kept, driftFlag)
    }

    // the curated corpus = every arrival's kept docs, rebuilt purely
    // from persisted decisions (dd keepers minus ledger near-dup
    // losers) — the state IS the source of truth, no recompute
    val keptIds = spark.read.parquet(s"$state/dd")
      .filter(col("kept") === 1L).select("doc_id")
      .join(spark.read.parquet(s"$state/ledger")
        .filter(col("reason") === "near_dup").select("doc_id"),
        Seq("doc_id"), "left_anti")
    val union = arrivals.reduce(_ unionByName _)
    val keptDocs = union.join(keptIds, "doc_id")

    val pub = java.nio.file.Files.createTempDirectory("lifecycle_pub").toString
    CorpusManifest.write(keptDocs, pub, Seq("source"), "doc_id", "text")
    val full = CorpusManifest.verify(spark, pub, Seq("source"), "doc_id", "text")
    val nOk = full.filter(col("ok") === 1L).count()
    val nAll = full.count()
    println(s"published to $pub: manifest verify $nOk/$nAll keys ok")
    val sampled = CorpusManifest.verify(spark, pub, Seq("source"),
      "doc_id", "text", sampleKeys = 3)
    println(s"sampled verify (3 keys, partition-pruned): " +
      s"${sampled.filter(col("ok") === 1L).count()}/3 ok")

    // round-16: the persisted STATE is publish/verifiable too — digest
    // every curation table and re-verify (q250's digest device; a tampered or
    // lost partition would flip its table's ok to 0)
    import graft.pipelines.CurationState
    // CurationTables :+ lenhist — the drift monitor's histogram is a
    // state table this demo wrote (and already compacts above); a
    // manifest that omits it prints "5/6 tables ok" on a HEALTHY state
    // (verifyState surfaces the on-disk-but-unstored table as ok=0)
    val stateStored = CorpusManifest.stateManifest(
      spark, state, CurationState.CurationTables :+ "lenhist")
      .localCheckpoint(true)
    val sVerify = CorpusManifest.verifyState(spark, state, stateStored)
    val sOk = sVerify.filter(col("ok") === 1L).count()
    println(s"state manifest verify: $sOk/${sVerify.count()} tables ok")

    // round-16: the ANN index lifecycle's QUERY verb — absorb the
    // embedding corpus as arrivals into the assign state (vectors ride
    // as payload) and answer retrieval FROM the state, never
    // re-assigning the corpus (q253's claim, serving-shaped)
    import graft.ops.Similarity
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val cents = Similarity.lloydCentroids(emb, "vec_id", "embedding", 16, 3)
    val vMax = emb.agg(max(col("vec_id"))).head.getLong(0)
    val vWidth = vMax / 3 + 1
    for (b <- 0L until 3L)
      Similarity.assignIncrement(
        emb.filter(col("vec_id") >= b * vWidth && col("vec_id") < (b + 1) * vWidth),
        "vec_id", "embedding", cents, state, b,
        payloadCols = Seq("embedding"))
    val hits = Similarity.ivfStateTopK(spark, state,
      emb.filter(col("vec_id") >= 100 && col("vec_id") < 104),
      "vec_id", "embedding", cents, k = 5, nprobe = 8)
    val nHits = hits.count()
    println(s"state-served IVF retrieval: $nHits results for 4 queries")
    (perArrival, nOk, nAll, sOk, nHits)
  }
}
