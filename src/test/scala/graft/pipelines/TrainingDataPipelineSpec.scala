package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end curation: planted junk, exact dups, and near-dups must
  * each be removed by the right stage while clean docs survive.
  */
class TrainingDataPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and runs far into the woods again today"

  private lazy val fixture = Seq(
    (1L, goodText),                               // keeper
    (2L, goodText),                               // exact dup of 1 → dropped
    (3L, goodText.replace("today", "tomorrow")),  // near dup of 1 → dropped
    (4L, "the big data engine sorts and merges all of the partitioned rows quite quickly indeed"), // distinct keeper
    (5L, "tiny"),                                 // too short → dropped
    (6L, "el perro y los gatos en la casa y el sol y la luna y mas cosas") // not en → dropped
  ).toDF("doc_id", "text")

  test("curate keeps clean distinct docs and drops junk/dups/near-dups") {
    val out = TrainingDataPipeline.curate(fixture,
      cfg = TrainingDataPipeline.Config(jaccardThreshold = 0.5))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 4L))
  }

  test("stages are individually correct") {
    val cfg = TrainingDataPipeline.Config(jaccardThreshold = 0.5)
    val gated = TrainingDataPipeline.annotateAndFilter(fixture, cfg)
    assert(gated.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    val exact = TrainingDataPipeline.dropExactDuplicates(gated, "doc_id")
    assert(exact.select("doc_id").as[Long].collect().toSet === Set(1L, 3L, 4L))
    val near = TrainingDataPipeline.dropNearDuplicates(exact, "doc_id", cfg)
    assert(near.select("doc_id").as[Long].collect().toSet === Set(1L, 4L))
  }

  test("incremental rollup == one-shot recompute with planted cross-batch dups") {
    // ids 0..11 → 4 batches of width 3; duplicates planted WITHIN a
    // batch (0,1), ACROSS adjacent batches (2,3), and ACROSS distant
    // batches (4,10); gated-out junk in the middle (8); distinct docs
    // elsewhere. The incremental composition must drop every later
    // arrival of a seen fingerprint and still match the one-shot
    // global-min-keeper recompute per (source) group.
    def t(suffix: String) = s"$goodText $suffix"
    val arrivals = Seq(
      (0L, goodText, "web"),
      (1L, goodText, "web"),                 // dup in batch 0 → dropped
      (2L, t("alpha words here now"), "web"),
      (3L, t("alpha words here now"), "pdf"), // dup of 2, next batch → dropped
      (4L, t("beta tokens flow fast"), "pdf"),
      (5L, t("gamma rows sort well"), "web"),
      (6L, t("delta keys merge fine"), "pdf"),
      (7L, t("epsilon data joins up"), "web"),
      (8L, "tiny", "web"),                    // gated out (too short)
      (9L, t("zeta text reads long"), "pdf"),
      (10L, t("beta tokens flow fast"), "web"), // dup of 4, batch 3 → dropped
      (11L, t("eta docs pack tight"), "pdf")
    ).toDF("doc_id", "text", "source")
    val inc = TrainingDataPipeline
      .incrementalRollup(arrivals, "doc_id", Seq("source"), "n_tokens")
    // one-shot: gate, global min-id keeper per fingerprint, aggregate once
    val gated = TrainingDataPipeline.annotateAndFilter(
      arrivals, TrainingDataPipeline.Config())
    val oneShot = graft.transform.Transforms.mergeableRollup(
      TrainingDataPipeline.dropExactDuplicates(gated, "doc_id"),
      Seq("source"), col("n_tokens"))
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    assert(inc.collect().sortBy(key).map(_.toSeq).toSeq
      === oneShot.collect().sortBy(key).map(_.toSeq).toSeq)
    // the cross-batch drops actually happened: 12 arrivals, 1 gated out,
    // 3 dropped as duplicates → 8 survivors
    assert(inc.agg(sum("n")).head.getLong(0) === 8L)
  }

  // ids 0..11 → 4 batches of width 3. ~40-token bases so a single
  // mid-token change costs 3 of ~37 shingles (jaccard ≈ 0.85 ≥ 0.8:
  // near-dup) while TWO changes land ≈ 0.72 < 0.8 (kept apart).
  // Planted: an exact dup ACROSS batches (0→3), a near dup WITHIN a
  // batch (0→2), a near dup ACROSS batches (0→4, needs the band
  // index), a chain where 10 is a near dup ONLY of the already-
  // DROPPED 7 (needs dropped docs' bands kept in the index per the
  // greedy rule), gated-out junk (6), distinct keepers elsewhere.
  private val baseA = "the quick brown fox jumps over the lazy dog and runs far " +
    "into the deep woods while the old owl watches from a tall tree and " +
    "the river flows past the quiet village under a bright morning sun today"
  private val baseB = "a small ship sails on the wide sea and the crew looks to " +
    "the far shore where the light of the tower glows in the dark night " +
    "and the waves roll under the cold wind as it drifts along slowly"
  private lazy val curateArrivals = Seq(
    (0L, baseA, "web"),
    (1L, "it is a fine day to read the long book of maps and learn the " +
      "names of all the distant lands", "web"),
    (2L, baseA.replace("lazy", "sleepy"), "web"),   // near dup of 0
    (3L, baseA, "pdf"),                             // exact dup of 0
    (4L, baseA.replace("river", "creek"), "pdf"),   // near dup of 0
    (5L, baseB, "web"),
    (6L, "tiny", "web"),                            // gated out
    (7L, baseB.replace("crew", "sailor"), "pdf"),   // near dup of 5
    (8L, "the team built a fast engine to sort and merge all of the " +
      "rows in the table with care", "web"),
    (9L, "a good meal is made of fresh bread and soup and it warms the " +
      "cold traveler in the winter", "pdf"),
    (10L, baseB.replace("crew", "sailor").replace("waves", "tides"),
      "web"),                                       // near dup ONLY of 7
    (11L, "the students walk to the library in the morning and study " +
      "the history of the ancient city together", "pdf")
  ).toDF("doc_id", "text", "source")

  test("incremental curate == one-shot curate + rollup with cross-batch near-dups") {
    val cfg = TrainingDataPipeline.Config()
    val arrivals = curateArrivals
    val inc = TrainingDataPipeline
      .incrementalCurate(arrivals, "doc_id", Seq("source"), "n_tokens", cfg = cfg)
    val oneShotDocs = TrainingDataPipeline.curate(arrivals, cfg = cfg)
    val oneShot = graft.transform.Transforms.mergeableRollup(
      oneShotDocs, Seq("source"), col("n_tokens"))
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    assert(inc.collect().sortBy(key).map(_.toSeq).toSeq
      === oneShot.collect().sortBy(key).map(_.toSeq).toSeq)
    // the planted structure actually exercised every drop path
    val ids = oneShotDocs.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(3L), "cross-batch exact dup must drop")
    assert(!ids.contains(2L), "in-batch near dup must drop")
    assert(!ids.contains(4L), "cross-batch near dup must drop (band index)")
    assert(!ids.contains(7L), "cross-batch near dup of 5 must drop")
    assert(!ids.contains(10L),
      "near dup of a DROPPED doc must drop (dropped bands stay indexed)")
    assert(!ids.contains(6L), "junk must gate out")
    assert(ids === Set(0L, 1L, 5L, 8L, 9L, 11L))
  }

  test("incremental curate persists arrival-partitioned state, O(increment) appends") {
    val root = java.nio.file.Files.createTempDirectory("inc-state-").toString
    try {
      val inc = TrainingDataPipeline.incrementalCurate(
        curateArrivals, "doc_id", Seq("source"), "n_tokens",
        stateDir = Some(root))
      inc.collect() // drive all four batches
      // every state table got exactly one new batch=N partition per arrival
      for (t <- Seq("dd", "bands", "postings", "sizes")) {
        val parts = new java.io.File(s"$root/$t").listFiles()
          .filter(_.getName.startsWith("batch=")).map(_.getName).sorted
        assert(parts.toSeq === Seq("batch=0", "batch=1", "batch=2", "batch=3"),
          s"state table $t partitions: ${parts.toSeq}")
      }
      // the prior-index read partition-prunes: filtering batch < 2 must
      // reach the scan as a PartitionFilter, not a post-scan filter
      val idx = spark.read.parquet(s"$root/bands").filter(col("batch") < 2)
      val p = idx.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("PartitionFilters") && p.contains("batch"),
        s"band-index read does not partition-prune:\n$p")
      // persisted per-doc sizes equal a re-aggregation of the postings
      // (each doc's postings are written exactly once, by its own batch)
      val szPersisted = spark.read.parquet(s"$root/sizes")
        .select("doc_id", "sz")
      val szRecomputed = spark.read.parquet(s"$root/postings")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      assert(szPersisted.exceptAll(szRecomputed).isEmpty
        && szRecomputed.exceptAll(szPersisted).isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("curateIncrement: a later production arrival dedups against persisted state") {
    val root = java.nio.file.Files.createTempDirectory("inc-arrival-").toString
    try {
      // build durable state from the 4 proof batches
      TrainingDataPipeline.incrementalCurate(curateArrivals, "doc_id",
        Seq("source"), "n_tokens", stateDir = Some(root)).collect()
      // a NEW arrival, called through the single-increment production
      // API: an exact dup of doc 0 (must drop via the persisted
      // fingerprint history), a near dup of surviving doc 5 (must drop
      // via the persisted band index + pruned postings), a fresh keeper
      val arrival = Seq(
        (12L, baseA, "web"),
        (13L, baseB.replace("wind", "breeze"), "pdf"),
        (14L, "a brand new clean document with plenty of fresh tokens " +
          "to pass the gate easily today", "web")
      ).toDF("doc_id", "text", "source")
      val roll = TrainingDataPipeline.curateIncrement(arrival, "doc_id",
        Seq("source"), "n_tokens", root, batchId = 4L)
      assert(roll.agg(sum(col("n"))).head.getLong(0) === 1L,
        "only the fresh keeper may survive the arrival")
      // the arrival appended exactly its own batch=4 partitions
      for (t <- Seq("dd", "bands", "postings", "sizes"))
        assert(new java.io.File(s"$root/$t/batch=4").exists,
          s"state table $t missing the arrival's partition")
      // retry idempotency: re-running the same arrival rewrites its own
      // partitions and returns the same rollup
      val retry = TrainingDataPipeline.curateIncrement(arrival, "doc_id",
        Seq("source"), "n_tokens", root, batchId = 4L)
      assert(retry.collect().map(_.toSeq).sortBy(_.toString).toSeq
        === roll.collect().map(_.toSeq).sortBy(_.toString).toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("pruned Jaccard stage == unpruned ngramJaccard (candidate prune is lossless)") {
    import graft.ops.Dedup
    // postings carry EXTRA non-candidate docs (3, 4) the prune must drop
    // without changing any pair's scores
    val docs = Seq(
      (1L, baseA), (2L, baseA.replace("lazy", "sleepy")),
      (3L, baseB), (4L, "some other distinct text that is long enough here")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleSet(docs, "doc_id", "text")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val pruned = TrainingDataPipeline
      .prunedJaccardStage(pairs, sh, sizes, "doc_id").collect()
    val full = Dedup.ngramJaccard(pairs, sh, "doc_id").collect()
    assert(pruned.map(_.toSeq).toSeq === full.map(_.toSeq).toSeq)
  }

  test("drop ledger: every rejected doc persisted with its reason; kept derivable from state alone") {
    val root = java.nio.file.Files.createTempDirectory("ledger-").toString
    try {
      // arrivals with one planted case per drop reason
      val a0 = Seq((0L, baseA, "web"), (1L, baseB, "web")).toDF("doc_id", "text", "source")
      val a1 = Seq(
        (2L, baseA, "pdf"),                            // exact dup of 0
        (3L, baseB.replace("crew", "sailor"), "pdf"),  // near dup of 1
        (4L, "tiny", "web"),                           // gate reject
        (5L, "a brand new clean document with plenty of fresh tokens " +
          "to pass the gate easily today", "web")      // keeper
      ).toDF("doc_id", "text", "source")
      TrainingDataPipeline.curateIncrement(a0, "doc_id", Seq("source"),
        "n_tokens", root, 0L).collect()
      TrainingDataPipeline.curateIncrement(a1, "doc_id", Seq("source"),
        "n_tokens", root, 1L).collect()
      val led = spark.read.parquet(s"$root/ledger")
        .select(col("doc_id"), col("reason"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(led === Map(2L -> "exact_dup", 3L -> "near_dup", 4L -> "gate"),
        s"ledger: $led")
      // kept ids from STATE alone: dd keepers minus near-dup losers
      val kept = spark.read.parquet(s"$root/dd").filter(col("kept") === 1L)
        .join(spark.read.parquet(s"$root/ledger")
          .filter(col("reason") === "near_dup").select("doc_id"),
          Seq("doc_id"), "left_anti")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(0L, 1L, 5L), s"kept from state: $kept")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("drop ledger: NULL-annotated docs are recorded as gate rejects, not lost") {
    val root = java.nio.file.Files.createTempDirectory("ledger-null-").toString
    try {
      // a null text annotates to NULL n_tokens/quality/lang — under
      // three-valued logic it fails BOTH gatePredicate and its negation,
      // so without the coalesce it would land in neither kept nor ledger
      val a0 = Seq(
        (0L, null.asInstanceOf[String], "web"),
        (1L, baseA, "web")
      ).toDF("doc_id", "text", "source")
      val roll = TrainingDataPipeline.curateIncrement(a0, "doc_id",
        Seq("source"), "n_tokens", root, 0L)
      assert(roll.agg(sum(col("n"))).head.getLong(0) === 1L)
      val led = spark.read.parquet(s"$root/ledger")
        .collect().map(r =>
          r.getLong(r.fieldIndex("doc_id")) ->
            r.getString(r.fieldIndex("reason"))).toMap
      assert(led === Map(0L -> "gate"),
        s"null-annotated doc must have a recorded fate: $led")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("arrival reports: every batch's report == one-shot curation restricted to that batch") {
    val cfg = TrainingDataPipeline.Config()
    val got = TrainingDataPipeline
      .arrivalReports(curateArrivals, "doc_id", Seq("source"), "n_tokens",
        cfg = cfg)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("batch")), r.getString(0)) ->
        (r.getLong(r.fieldIndex("n")), r.getLong(r.fieldIndex("sum_cents"))))
      .toMap
    // the one-shot recompute, split by the same id-range batching
    val width = 11L / 4 + 1 // max id 11, 4 batches
    val oneShot = TrainingDataPipeline.curate(curateArrivals, cfg = cfg)
      .select(expr(s"doc_id div $width").as("batch"), col("source"),
        col("n_tokens"))
      .groupBy(col("batch"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_tokens")).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === oneShot,
      s"per-batch incremental reports must match the one-shot split:\n$got\nvs\n$oneShot")
    // empty corpus degrades to an empty report with the schema
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val er = TrainingDataPipeline
      .arrivalReports(empty, "doc_id", Seq("source"), "n_tokens")
    assert(er.count() === 0L && er.columns.contains("batch"))
  }

  test("ingest drift monitor: degraded arrival fires, natural stays quiet, state is bucket-domain-sized") {
    val root = java.nio.file.Files.createTempDirectory("drift-").toString
    try {
      // three natural arrivals with the same length mix, then a
      // degraded one (all short — the broken-crawl signature)
      val mix = Seq(50, 130, 200, 260, 350)
      def arrival(b: Int, lens: Seq[Int]) =
        lens.zipWithIndex.map { case (l, i) =>
          (b * 100L + i, "x" * l)
        }.toDF("doc_id", "text")
      val natural = (0 until 3).map(b => arrival(b, mix ++ mix))
      val degraded = arrival(3, Seq.fill(10)(10))
      val curve = TrainingDataPipeline.ingestDriftAudit(
        natural :+ degraded, "text", stateDir = Some(root))
      val byBatch = curve.groupBy(col("batch"))
        .agg(max(col("psi_cum")).as("psi"), max(col("drift")).as("drift"))
        .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
        .toMap
      assert(byBatch.keySet === Set(1L, 2L, 3L), "batch 0 has no reference")
      // identical length mixes: natural arrivals are quiet
      assert(byBatch(1L)._2 === 0L && byBatch(2L)._2 === 0L,
        s"natural arrivals must not alarm: $byBatch")
      // the degraded arrival fires, and by a wide margin
      assert(byBatch(3L)._2 === 1L, s"degraded arrival must alarm: $byBatch")
      assert(byBatch(3L)._1 > 4 * math.max(byBatch(1L)._1, byBatch(2L)._1),
        s"degraded PSI must dominate the natural ones: $byBatch")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("keyed drift monitor: source-mix remap fires where the length monitor is provably blind") {
    // q251's motivating blindness contrast: a batch whose TEXTS are
    // identical but whose source labels all collapse to a new value
    // moves no length mass at all — only the keyed source-mix monitor
    // can see it
    def arrival(b: Int, src: Int => String) =
      (0 until 12).map(i =>
        (b * 100L + i, "w" * (40 + 17 * (i % 5)), src(i)))
        .toDF("doc_id", "text", "source")
    val natural = (0 until 3).map(b => arrival(b, i => s"src${i % 4}"))
    val remapped = arrival(3, _ => "wildcrawl")
    val arrivals = natural :+ remapped
    val srcBucket = expr(
      "cast(conv(substring(md5(source),1,8),16,10) as bigint) % 16")
    val keyed = TrainingDataPipeline.keyedDriftAudit(arrivals, srcBucket)
      .groupBy(col("batch")).agg(max(col("drift")).as("drift"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keyed === Map(1L -> 0L, 2L -> 0L, 3L -> 1L),
      s"keyed monitor must fire ONLY on the remapped batch: $keyed")
    val lenBlind = TrainingDataPipeline.ingestDriftAudit(arrivals, "text")
      .groupBy(col("batch")).agg(max(col("drift")).as("drift"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lenBlind.values.forall(_ === 0L),
      s"the length monitor must be blind to a pure source remap: $lenBlind")
  }

  test("keyed drift monitor fails fast on an out-of-domain bucket instead of dropping its mass") {
    val root = java.nio.file.Files.createTempDirectory("drift-oob-").toString
    try {
      val docs = Seq((0L, "src1")).toDF("doc_id", "source")
      // a forgotten `% k` (bucket 99 of 16) must error loudly — the
      // readout grid would otherwise silently drop the row's mass and
      // understate the drift
      val e = intercept[Exception] {
        TrainingDataPipeline.driftIncrementBy(
          docs, lit(99L), root, 0L, nBuckets = 16).collect()
      }
      def rootCause(t: Throwable): Throwable =
        if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
      assert((e.getMessage + rootCause(e).getMessage)
        .contains("bucket out of"), s"unexpected error: $e")
      val eNull = intercept[Exception] {
        TrainingDataPipeline.driftIncrementBy(
          docs, lit(null).cast("long"), root, 0L, nBuckets = 16).collect()
      }
      assert((eNull.getMessage + rootCause(eNull).getMessage)
        .contains("bucket out of"), s"unexpected error: $eNull")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("log-bucket drift mode: per-octave resolution where fixed-width saturates blind") {
    def docs(b: Int, exp: Int) =
      (0 until 20).map(i => (b * 100L + i, "z" * ((1 << exp) + i)))
        .toDF("doc_id", "text")
    def psi(logB: Boolean): Double = {
      val root = java.nio.file.Files.createTempDirectory("drift-log-").toString
      try {
        // reference arrival ~2^10 chars, drifted arrival ~2^13 chars —
        // BOTH beyond fixed-width's 16×64 = 1024-char ceiling
        TrainingDataPipeline.driftIncrement(
          docs(0, 10), "text", root, 0L, logBuckets = logB).collect()
        TrainingDataPipeline.driftIncrement(
          docs(1, 13), "text", root, 1L, logBuckets = logB)
          .agg(max(col("psi_cum"))).head.getDouble(0)
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(root))
      }
    }
    val fixedPsi = psi(logB = false)
    val logPsi = psi(logB = true)
    // fixed width: every doc lands in the saturated tail bucket on both
    // sides — the histograms are identical and the monitor is BLIND
    assert(fixedPsi <= 0.001, s"fixed-width should be blind here: $fixedPsi")
    // log buckets: octave 10 vs octave 13 — the same drift alarms
    assert(logPsi > 0.25, s"log mode must see the octave shift: $logPsi")
  }

  test("driftIncrement: persisted histogram state, retry-idempotent, O(increment) reads") {
    val root = java.nio.file.Files.createTempDirectory("drift-inc-").toString
    try {
      def arrival(b: Int, lens: Seq[Int]) =
        lens.zipWithIndex.map { case (l, i) =>
          (b * 100L + i, "y" * l)
        }.toDF("doc_id", "text")
      TrainingDataPipeline.driftIncrement(
        arrival(0, Seq(40, 90, 150)), "text", root, 0L).collect()
      val first = TrainingDataPipeline.driftIncrement(
        arrival(1, Seq(45, 95, 155)), "text", root, 1L)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      // persisted state is the bucket histogram only — never documents
      for (b <- Seq(0L, 1L)) {
        val dir = s"$root/lenhist/batch=$b"
        assert(new java.io.File(dir).exists, s"missing $dir")
        val rows = spark.read.parquet(dir)
        assert(rows.count() <= 16L, "state must be bucket-domain-sized")
        assert(rows.columns.toSet === Set("bucket", "n"))
      }
      // retry of the same arrival overwrites its own partition and
      // returns the identical curve
      val retry = TrainingDataPipeline.driftIncrement(
        arrival(1, Seq(45, 95, 155)), "text", root, 1L)
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      assert(retry === first)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("incremental rollup and curate handle an empty corpus (NULL max id)") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TrainingDataPipeline
      .incrementalRollup(empty, "doc_id", Seq("source"), "n_tokens")
      .count() === 0L)
    assert(TrainingDataPipeline
      .incrementalCurate(empty, "doc_id", Seq("source"), "n_tokens")
      .count() === 0L)
  }

  test("batch slicers fail fast on negative ids instead of silently dropping them") {
    // a negative id falls outside every [b·width, (b+1)·width) range —
    // without the guard the doc would vanish from the curation with no
    // error, the worst failure mode a data-loss-sensitive pipeline has
    val neg = Seq(
      (-1L, goodText, "web"),
      (5L, goodText + " plus some extra distinct words", "web")
    ).toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      TrainingDataPipeline.incrementalRollup(neg, "doc_id",
        Seq("source"), "n_tokens")
    }
    assert(e.getMessage.contains("negative"))
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.incrementalCurate(neg, "doc_id",
        Seq("source"), "n_tokens")
    }
    intercept[IllegalArgumentException] {
      TrainingDataPipeline.arrivalReports(neg, "doc_id",
        Seq("source"), "n_tokens")
    }
  }

  test("batch slicers accept IntegerType ids (no ClassCast at the span read)") {
    def docs = Seq(
      (0, goodText, "web"),
      (1, goodText, "web"), // exact dup → dropped
      (2, goodText.replace("woods", "fields loudly"), "pdf"),
      (3, goodText.replace("dog", "cat") + " entirely different tail", "web")
    )
    val intIds = docs.toDF("doc_id", "text", "source")
    val longIds = docs.map { case (i, t, s) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val key = (r: org.apache.spark.sql.Row) => r.getString(0)
    assert(TrainingDataPipeline
      .incrementalRollup(intIds, "doc_id", Seq("source"), "n_tokens")
      .collect().sortBy(key).map(_.toSeq).toSeq
      === TrainingDataPipeline
      .incrementalRollup(longIds, "doc_id", Seq("source"), "n_tokens")
      .collect().sortBy(key).map(_.toSeq).toSeq)
    // the STATEFUL path too (persisted dedup state, partition writes)
    assert(TrainingDataPipeline
      .incrementalCurate(intIds, "doc_id", Seq("source"), "n_tokens")
      .collect().sortBy(key).map(_.toSeq).toSeq
      === TrainingDataPipeline
      .incrementalCurate(longIds, "doc_id", Seq("source"), "n_tokens")
      .collect().sortBy(key).map(_.toSeq).toSeq)
  }

  test("driftIncrement: NULL text lands in bucket 0 with the empty strings, never the tail bucket") {
    // least() SKIPS nulls, so least(15, NULL) = 15: without the
    // coalesce a crawler bug nulling texts read as LONG-document drift
    for (logB <- Seq(false, true)) {
      val root = java.nio.file.Files
        .createTempDirectory("drift-null-").toString
      try {
        val docs = Seq((0L, null: String), (1L, "x" * 40), (2L, "y" * 500))
          .toDF("doc_id", "text")
        TrainingDataPipeline.driftIncrement(docs, "text", root, 0L,
          logBuckets = logB).collect()
        val hist = spark.read.parquet(s"$root/lenhist/batch=0")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(hist.getOrElse(0L, 0L) >= 1L,
          s"null text must land in bucket 0 (logBuckets=$logB): $hist")
        assert(hist.getOrElse(15L, 0L) === 0L,
          s"null text must not read as a max-length doc (logBuckets=$logB): $hist")
        assert(hist.values.sum === 3L, s"every doc must be counted: $hist")
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(root))
      }
    }
  }

  test("driftIncrementBy: empty arrivals and empty references emit a well-defined PSI, never NULLs") {
    val root = java.nio.file.Files.createTempDirectory("drift-empty-").toString
    try {
      val bucket = expr("cast(doc_id % 16 as bigint)")
      def arrival(ids: Seq[Long]) = ids.map(i => (i, s"doc $i"))
        .toDF("doc_id", "text")
      // real batch 0, EMPTY batch 1: Laplace smoothing makes the PSI of
      // an empty increment exact (every q_i = 1/nBuckets) — all-NULL
      // output would NPE any consumer reading the drift flag
      TrainingDataPipeline.driftIncrementBy(
        arrival(0L until 20L), bucket, root, 0L).collect()
      val emptyArr = TrainingDataPipeline.driftIncrementBy(
        arrival(Nil), bucket, root, 1L).collect()
      assert(emptyArr.length === 16)
      assert(emptyArr.forall(r => !r.isNullAt(r.fieldIndex("contrib")) &&
        !r.isNullAt(r.fieldIndex("psi_cum")) &&
        !r.isNullAt(r.fieldIndex("drift"))),
        "empty arrival must emit a well-defined curve")
      // empty REFERENCE (batch 0 had no docs): same contract
      val root2 = java.nio.file.Files
        .createTempDirectory("drift-empty2-").toString
      try {
        TrainingDataPipeline.driftIncrementBy(
          arrival(Nil), bucket, root2, 0L).collect()
        val emptyRef = TrainingDataPipeline.driftIncrementBy(
          arrival(0L until 20L), bucket, root2, 1L).collect()
        assert(emptyRef.length === 16 &&
          emptyRef.forall(r => !r.isNullAt(r.fieldIndex("psi_cum"))),
          "empty reference must emit a well-defined curve")
      } finally {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(new java.io.File(root2))
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("incrementalRollup: each arrival checkpoints O(batch), never the accumulated history") {
    // the history fold must checkpoint only the NEW batch's
    // fingerprints and union lazily — re-materializing the accumulated
    // union each round is the O(nBatches × corpus) block-storage shape
    // the repo bans (every round caches a FULL COPY of all history
    // so far). Observable: the accumulated form caches a history RDD
    // whose partition count GROWS ~4 per round (union partitions add,
    // localCheckpoint preserves them — ~36 at nBatches=8); the O(batch)
    // form caches only batch-shaped frames (≤ ~8 partitions each,
    // shuffle.partitions = 4 here).
    val corpus = (0 until 24).map(i =>
      (i.toLong, s"$goodText unique tail number $i marker", "web"))
      .toDF("doc_id", "text", "source")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    TrainingDataPipeline.incrementalRollup(corpus, "doc_id",
      Seq("source"), "n_tokens", nBatches = 8).collect()
    val grown = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before.contains(id) }
      .map { case (id, rdd) => id -> rdd.partitions.length }
      .filter(_._2 > 12)
    assert(grown.isEmpty,
      s"an accumulated-history-sized frame was checkpointed (RDD id -> " +
        s"partitions: $grown) — per-arrival state must be O(batch)")
  }

  test("curate runs on the synthetic corpus without shrinking it to zero") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = TrainingDataPipeline.curate(docs)
    val n = out.count()
    assert(n > 0 && n <= docs.count())
  }
}
