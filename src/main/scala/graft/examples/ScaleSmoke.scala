package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale smoke (VERDICT r7 #3): synthesize a ~10x corpus by
  * unioning id-shifted copies of the sf0.1 tables — no new datagen —
  * and run the headline operator family against it, logging wall time
  * and per-query task-skew (max/median task duration; a straggler
  * >10x the median is the 100 TB red flag this smoke exists to catch).
  *
  * Document copies alternate exact duplicates and near duplicates
  * (odd copies get a one-token suffix), so the dedup family sees the
  * realistic mixture a 10x-duplicated crawl would supply, not a
  * cardinality-free no-op.
  *
  * Env: SPARK_GRAFT_SF_DIR (source, default sf0.1),
  * SPARK_GRAFT_SCALE_COPIES (default 10),
  * SPARK_GRAFT_SCALE_DIR (default /tmp/graft_scale10, regenerated only
  * if missing), SPARK_GRAFT_CPUS (default 32).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SCALE_COPIES", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // task-duration listener: PER-STAGE straggler stats. Skew must be
    // judged within a stage — max over all tasks vs median over all
    // tasks conflates a uniformly-heavy stage (fine: that is just
    // work) with one hot task in an otherwise-idle stage (the actual
    // 100 TB red flag). The q113 false alarm this metric replaced:
    // global skew read 142x while the heavy stage's own tasks were
    // 27.0-27.6 s — perfectly balanced.
    val stageTasks =
      scala.collection.concurrent.TrieMap.empty[Int, List[Long]]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null && te.taskInfo.successful)
          stageTasks.updateWith(te.stageId)(
            l => Some(te.taskInfo.duration :: l.getOrElse(Nil)))
    })

    def shifted(t: String, shifts: Map[String, Long],
        perturbText: Boolean = false): DataFrame = {
      val df = graft.Tables.load(spark, src, t)
      (0 until copies).map { k =>
        var d = df
        shifts.foreach { case (c, m) =>
          d = d.withColumn(c, col(c) + lit(k * m)) }
        if (perturbText && k % 2 == 1)
          d = d.withColumn("text", concat(col("text"), lit(s" c$k")))
        d
      }.reduce(_ unionByName _)
    }

    val gen: Map[String, () => DataFrame] = Map(
      "events" -> (() => shifted("events",
        Map("event_id" -> 1000000000L, "user_id" -> 1000000L))),
      "documents" -> (() => shifted("documents",
        Map("doc_id" -> 10000000L), perturbText = true)),
      "orders" -> (() => shifted("orders",
        Map("o_orderkey" -> 100000000L, "o_custkey" -> 1000000L))),
      "lineitem" -> (() => shifted("lineitem",
        Map("l_orderkey" -> 100000000L, "l_suppkey" -> 1000000L))),
      // copy 0 keeps vec_id 0..15, so the deterministic codebook/
      // centroid seeds are unchanged while the corpus is 10x
      "embeddings" -> (() => shifted("embeddings",
        Map("vec_id" -> 1000000L))))

    val passthrough = Seq("region", "nation", "customer", "supplier",
      "part")
    val fsDir = new java.io.File(out)
    if (!new java.io.File(fsDir, "_SCALE_READY").exists()) {
      println(s"generating ${copies}x tables under $out ...")
      fsDir.mkdirs()
      gen.foreach { case (t, f) =>
        f().write.mode("overwrite").parquet(s"$out/$t.parquet") }
      passthrough.foreach { t =>
        graft.Tables.load(spark, src, t)
          .write.mode("overwrite").parquet(s"$out/$t.parquet") }
      new java.io.FileOutputStream(new java.io.File(fsDir, "_SCALE_READY")).close()
    }

    // the listener bus is async: onTaskEnd events for a just-finished
    // action can still be in flight when the action returns, so reading
    // stageTasks immediately under-reports (or bleeds a query's tail
    // into the NEXT query's cleared map). listenerBus/waitUntilEmpty
    // are private[spark] — public in bytecode, so reflection reaches
    // them; fall back to a bounded sleep if the internals ever move.
    def drainListenerBus(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case scala.util.control.NonFatal(_) => Thread.sleep(500) }

    def run(tag: String)(f: => Long): Unit = {
      drainListenerBus() // a PRIOR query's stragglers must not bleed in
      stageTasks.clear()
      val t0 = System.nanoTime()
      val rows = f
      val secs = (System.nanoTime() - t0) / 1e9
      drainListenerBus()
      val stages = stageTasks.values.map(_.sorted.toIndexedSeq).toSeq
      val nTasks = stages.map(_.size).sum
      // worst WITHIN-stage skew among stages whose max task is > 1 s
      // (sub-second stages cannot straggle meaningfully)
      val worst = stages.filter(_.last > 1000)
        .map(ds => (ds.last.toDouble / math.max(1L, ds(ds.size / 2)), ds.last))
        .sortBy(-_._1).headOption
      val (skew, mx) = worst.getOrElse((1.0, stages.map(_.last).maxOption.getOrElse(0L)))
      // a straggler must MATTER: one slow task in a stage is only a
      // red flag when it is also a material fraction of the wall
      val flag = if (skew > 10 && mx > secs * 1000 * 0.2) "  STRAGGLER!" else ""
      println(f"$tag%-22s ${secs}%7.2f s  rows=$rows%-9d tasks=$nTasks%-5d " +
        f"worst stage: max=${mx}%5d ms skew=${skew}%5.1fx$flag")
    }

    // headline dedup/join/graph family + the temporal/events family the
    // r8 testdata break took out (sessionize/funnel/retention/drift are
    // the first queries a real user runs on the events table — their 10x
    // behavior needs the same empirical evidence)
    val names = Seq("q06b_pit_dense", "q17_minhash_lsh", "q34_curation",
      "q91_pagerank", "q113_jaccard_prefix", "q104_quantile_normalize",
      "q141_dup_passages",
      "q48_sessionize", "q82_funnel", "q83_retention", "q87_scd2",
      "q75_psi_drift", "q162_lm_perplexity",
      // round-9 additions: cluster-safe split (CC at 10x), incremental
      // LSH (band-index join at 10x), nearest-asof (banded argmin at 10x)
      "q163_cluster_safe_split", "q164_incremental_lsh", "q166_nearest_asof",
      // round-9 operators: simhash banding meets 10x the duplicate
      // pairs, the lateness prefix scan meets 10x chunks, PQ assignment
      // meets the same broadcast codebook at 10x rows
      "q168_simhash_join", "q169_lateness_profile", "q170_balanced_shards",
      "q171_pq_codes",
      // round-9 late additions: the interval-overlap bucket join meets
      // 10x the user-day intervals, winnowing's doc-keyed window-min
      // meets 10x docs (and the duplicate mixture), the value-domain
      // Mann-Whitney meets 10x rows on the same value domain, DSIR's
      // broadcast feature stats meet 10x the doc-feature stream, and
      // the KMV sketch prune meets 10x the shingle stream
      "q185_interval_overlap", "q190_winnowing", "q186_mann_whitney",
      "q195_dsir", "q189_kmv_setops",
      // session closers: shared spans meets 10x the fingerprint pairs
      // (and the duplicate mixture), recommendations meet 10x baskets,
      // the training matrix meets 10x users end-to-end
      "q200_shared_spans", "q212_recommendations", "q211_training_matrix",
      // round-10: the label-noise screen's two kNN legs side by side —
      // brute is O(n²) in corpus size (the 100x extrapolation to avoid),
      // the IVF leg scores only nprobe/numCentroids of the pairs; the
      // gap between these two walls IS the subquadratic evidence
      "q174_label_noise", "q174b_label_noise_ann",
      // integer Lloyd's trains on the 10x corpus (full-corpus config;
      // trainFilter is the beyond-10x valve), PQ-ADC searches it
      "q25b_ivf_trained", "q172b_pq_adc_trained",
      // vector-QA family at 10x: scalar quantization's broadcast-range
      // coding pass, late interaction's corpus-token stream, the probe
      // sweep's shared scored pass
      "q221_scalar_quant", "q223_late_interaction", "q227_ivf_probe_sweep",
      // the calibration harness doubles the 10x corpus with planted
      // near-dups — the detector's full signature+band chain at 1.1M docs
      "q229_dedup_calibration",
      // round-11: the composed incremental proofs — four arrival
      // batches of the 10x corpus through gate→dedup→rollup (exact) and
      // through the accumulating band index (LSH); the per-batch
      // checkpoint cadence and the growing index join are what 10x
      // stresses
      "q235_incremental_pipeline", "q236_incremental_lsh",
      // round-14: the full two-stage incremental curation over
      // persisted arrival-partitioned state with mid-stream compaction
      // + reject purge — the heaviest composed pipeline on the board;
      // 10x stresses the per-batch append, the candidate-BATCH
      // partition-pruned Jaccard reads, and both maintenance sweeps
      "q250_lifecycle_curation",
      // round-13 lifecycle additions: the ingest drift monitor's
      // per-arrival histogram scan meets 10x docs (state stays 16 rows
      // per arrival — the point), the per-arrival report re-runs the
      // curation loop with per-batch eager checkpoints at 10x, and the
      // manifest digest is one map-side-combinable agg over 10x text
      "q243_ingest_drift", "q244_arrival_report", "q245_corpus_manifest",
      // round-16: the SERVED index paths at 10x — assign/encode the 10x
      // corpus into persisted state, then answer retrieval from the
      // state alone (broadcast probe/distance-table onto the postings/
      // codes scan; the no-corpus-reassign claim is exactly what must
      // survive scale). The state-integrity digest (one map-side-
      // combinable agg per table over the 10x state) now rides q250.
      "q253_ivf_state_serve", "q255_pq_state_serve",
      // round-17: the PQ retrain→repair lifecycle at 10x — stale-
      // partition re-encode is per-partition in-place rewrites, so the
      // repair is O(stale state), never O(corpus × versions)
      "q256_pq_lifecycle_serve",
      // round-18: the state-fed staleness monitor at 10x — the monitor
      // you run most often; its current leg must stay O(index state)
      // (one per-cid sum of the assign partitions, no corpus rescan)
      "q257_ivf_staleness_from_state",
      // the video chain at 10x is fixture-independent (synthetic
      // clips), so q242/q246 are NOT here — their scale posture is the
      // banded join already smoked via q237's family
      )
    // warm scans once
    (gen.keys ++ passthrough).foreach { t =>
      try graft.Tables.load(spark, out, t).count()
      catch { case _: Throwable => () } }
    names.foreach { n =>
      run(n)(graft.SparkEntry.queries(n)(spark, out).count()) }
    run("q104 exact (opt-in)")(
      graft.Queries.quantileNormalizeImpl(spark, out, 1024, exact = true).count())
    spark.stop()
  }
}
