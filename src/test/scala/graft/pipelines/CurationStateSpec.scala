package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** State maintenance over the arrival-partitioned curation store
  * (VERDICT r13 #2 compaction, #5 retention): both ops preserve every
  * curation decision bit-for-bit (q250 gates the composition at sf
  * scale; these specs pin each mechanism in isolation plus the crash /
  * idempotence / forget-semantics corners the gate can't see).
  */
class CurationStateSpec extends SparkSpec {
  import spark.implicits._
  import TrainingDataPipeline.{curateIncrement, incrementalCurate}

  private val baseA = "the quick brown fox jumps over the lazy dog and runs far " +
    "into the deep woods while the old owl watches from a tall tree and " +
    "the river flows past the quiet village under a bright morning sun today"
  private val baseB = "a small ship sails on the wide sea and the crew looks to " +
    "the far shore where the light of the tower glows in the dark night " +
    "and the waves roll under the cold wind as it drifts along slowly"
  // the TrainingDataPipelineSpec planted structure: exact + near dups
  // that cross the 4-batch id-range slicing (width 3: {0..2}{3..5}…)
  private lazy val corpus = Seq(
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

  private def withRoot[A](f: String => A): A = {
    val root = java.nio.file.Files.createTempDirectory("cstate-").toString
    try f(root) finally {
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
      }
      rm(new java.io.File(root))
    }
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("curation with mid-stream compaction + reject purge == plain incremental == one-shot") {
    val plain = incrementalCurate(corpus, "doc_id", Seq("source"), "n_tokens")
    val lifed = incrementalCurate(corpus, "doc_id", Seq("source"), "n_tokens",
      compactAfter = Some(1L), purgeRejectedAfter = Some(2L))
    assert(sortedRows(lifed) === sortedRows(plain),
      "compaction + reject purge must not move any curation decision")
  }

  test("sf0.001 fixture: post-compaction-and-purge arrivals still drop cross-state near dups") {
    // the q250 gate proves equality; this pins that the fixture
    // actually EXERCISES the interesting path — batch 2 (curated
    // against compacted + purged state) must still see near-dup
    // evidence that lives in the folded batches
    withRoot { root => withRoot { root2 =>
      val d = graft.Tables.load(spark, sf0001, "documents")
      val plain = TrainingDataPipeline.incrementalCurate(
        d, "doc_id", Seq("source"), "n_tokens", nBatches = 3,
        stateDir = Some(root2))
      val lifed = TrainingDataPipeline.incrementalCurate(
        d, "doc_id", Seq("source"), "n_tokens", nBatches = 3,
        stateDir = Some(root),
        compactAfter = Some(1L), purgeRejectedAfter = Some(1L))
      assert(sortedRows(lifed) === sortedRows(plain))
      val lastLedger = spark.read.parquet(s"$root/ledger")
        .filter(col("batch") === 2L)
        .groupBy(col("reason")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(lastLedger.getOrElse("near_dup", 0L) > 0L,
        s"batch 2 must drop near dups against folded state: $lastLedger")
      // the purge deleted every gate/exact-dup reject of batches <= 1
      // from the lifecycle state (the sf0.001 corpus has no
      // identical-text pairs — exact-dup mechanics are pinned by the
      // planted-fixture tests below; PLAIN state keeps its gate rows)
      val plainGates = spark.read.parquet(s"$root2/ledger")
        .filter(col("batch") < 2L && col("reason") === "gate").count()
      assert(plainGates > 0L, "plain state must retain early gate rejects")
      val purgedLeft = spark.read.parquet(s"$root/ledger")
        .filter(col("batch") < 2L && col("reason") =!= "near_dup").count()
      assert(purgedLeft === 0L,
        "gate/exact-dup rejects of folded batches must be forgotten")
      // compaction actually folded: tables hold {batch=1, batch=2} only
      val parts = new java.io.File(s"$root/postings").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
      assert(parts === Seq("batch=1", "batch=2"), s"postings: $parts")
    } }
  }

  test("compaction folds batches into one partition; reads see identical rows; re-run idempotent") {
    withRoot { root =>
      for (b <- 0L until 2L) {
        val lo = b * 6; val hi = lo + 6
        curateIncrement(
          corpus.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", Seq("source"), "n_tokens", root, b).collect()
      }
      val before = CurationState.CurationTables.map { t =>
        t -> sortedRows(spark.read.parquet(s"$root/$t").drop("batch"))
      }.toMap
      CurationState.compactState(spark, root, upTo = 1L)
      for (t <- CurationState.CurationTables) {
        val parts = new java.io.File(s"$root/$t").listFiles()
          .map(_.getName).filter(_.startsWith("batch=")).toSeq
        assert(parts === Seq("batch=1"), s"$t partitions after compact: $parts")
        assert(sortedRows(spark.read.parquet(s"$root/$t").drop("batch"))
          === before(t), s"$t rows changed across compaction")
        // the merged rows live at the HIGHEST folded batch value, so
        // the next arrival's `batch < b` prior-state read still sees them
        assert(spark.read.parquet(s"$root/$t")
          .filter(col("batch") < 2L).count() ===
          spark.read.parquet(s"$root/$t").count())
      }
      CurationState.compactState(spark, root, upTo = 1L) // re-run
      for (t <- CurationState.CurationTables)
        assert(sortedRows(spark.read.parquet(s"$root/$t").drop("batch"))
          === before(t), s"$t not idempotent under repeated compaction")
    }
  }

  test("crashed compaction (complete tmp, originals partially deleted) recovers by re-run") {
    withRoot { root =>
      for (b <- 0L until 2L) {
        val lo = b * 6; val hi = lo + 6
        curateIncrement(
          corpus.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", Seq("source"), "n_tokens", root, b).collect()
      }
      val t = "postings"
      val before = sortedRows(spark.read.parquet(s"$root/$t").drop("batch"))
      // simulate the crash window: replacement fully written (_SUCCESS
      // committed), batch=0 already deleted, batch=1 not yet, no rename
      spark.read.parquet(s"$root/$t").filter(col("batch") <= 1L)
        .drop("batch")
        .write.mode("overwrite").parquet(s"$root/$t/.compact-tmp-1")
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
      }
      rm(new java.io.File(s"$root/$t/batch=0"))
      CurationState.compactState(spark, root, upTo = 1L, tables = Seq(t))
      assert(sortedRows(spark.read.parquet(s"$root/$t").drop("batch"))
        === before, "recovery must restore the full pre-crash row set")
      assert(!new java.io.File(s"$root/$t/.compact-tmp-1").exists)
    }
  }

  test("purged ids appear in no state read, survive later arrivals, and forgetting un-suppresses") {
    withRoot { root =>
      val a0 = Seq((0L, baseA, "web"), (1L, baseB, "web")).toDF("doc_id", "text", "source")
      curateIncrement(a0, "doc_id", Seq("source"), "n_tokens", root, 0L).collect()
      // forget KEPT doc 1 (exercises postings/sizes/bands/dd deletion)
      CurationState.purgeDocs(spark, root, Seq(1L).toDF("doc_id"), "doc_id")
      for (t <- CurationState.CurationTables) {
        val hit = spark.read.parquet(s"$root/$t")
          .filter(col("doc_id") === 1L).count()
        assert(hit === 0L, s"purged id still present in $t")
      }
      // a later arrival: near dup of the FORGOTTEN doc must now be
      // judged fresh (the forget semantics), while a near dup of the
      // still-remembered doc 0 must still drop
      val a1 = Seq(
        (2L, baseB.replace("crew", "sailor"), "pdf"), // near dup of purged 1
        (3L, baseA.replace("lazy", "sleepy"), "pdf")  // near dup of kept 0
      ).toDF("doc_id", "text", "source")
      curateIncrement(a1, "doc_id", Seq("source"), "n_tokens", root, 1L).collect()
      val led = spark.read.parquet(s"$root/ledger")
        .collect().map(r => r.getLong(r.fieldIndex("doc_id")) ->
          r.getString(r.fieldIndex("reason"))).toMap
      assert(!led.contains(2L), s"near dup of a forgotten doc must be kept: $led")
      assert(led.get(3L).contains("near_dup"),
        s"near dup of a remembered doc must still drop: $led")
      // and the purged id never reappears in any state read
      for (t <- CurationState.CurationTables)
        assert(spark.read.parquet(s"$root/$t")
          .filter(col("doc_id") === 1L).count() === 0L,
          s"purged id reappeared in $t after a later arrival")
    }
  }

  test("compaction applies unchanged to ANN assign state and drift histograms (doc'd claims)") {
    import graft.ops.Similarity
    withRoot { root =>
      val e = graft.Tables.load(spark, sf0001, "embeddings")
      val cents = Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3)
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 3 + 1
      for (b <- 0L until 3L)
        Similarity.assignIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cents, root, b)
      val before = sortedRows(
        spark.read.parquet(s"$root/assign").select("vec_id", "cid"))
      CurationState.compactState(spark, root, upTo = 1L,
        tables = Seq("assign"))
      val parts = new java.io.File(s"$root/assign").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
      assert(parts === Seq("batch=1", "batch=2"), s"assign: $parts")
      assert(sortedRows(
        spark.read.parquet(s"$root/assign").select("vec_id", "cid"))
        === before, "assign rows changed across compaction")
      // the fold must preserve the nested cid=K cell layout (r17's
      // cell-pruned serving) — a flattened folded partition would mix
      // layouts under one table and poison partition inference
      val foldedCells = new java.io.File(s"$root/assign/batch=1")
        .listFiles().map(_.getName).filter(_.startsWith("cid=")).toSeq
      assert(foldedCells.nonEmpty,
        s"compaction flattened the cid=K layout: $foldedCells")
    }
    withRoot { root =>
      // dead-version GC (r17, opt-in keepVersions): superseded-version
      // rows drop during the fold; the served current version is
      // bit-identical before and after, and a re-run is idempotent
      val e = graft.Tables.load(spark, sf0001, "embeddings")
      val cents = Similarity
        .lloydCentroids(e, "vec_id", "embedding", 16, 3)
        .localCheckpoint(true)
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 3 + 1
      // batches 0-1 stamped with a superseded version, batch 2 current:
      // the shape a crashed repair (or a purge-by-policy) leaves behind
      for (b <- 0L until 2L)
        Similarity.assignIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cents, root, b,
          codebookVersion = "dead", payloadCols = Seq("embedding"))
      Similarity.assignIncrement(
        e.filter(col("vec_id") >= 2 * width && col("vec_id") < 3 * width),
        "vec_id", "embedding", cents, root, 2L,
        codebookVersion = "live", payloadCols = Seq("embedding"))
      val queries = e.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      def serve() = sortedRows(Similarity.ivfStateTopK(spark, root,
        queries, "vec_id", "embedding", cents, k = 5, nprobe = 8,
        codebookVersion = "live"))
      def liveRows() = sortedRows(Similarity
        .currentAssignments(spark, root, "live").select("vec_id", "cid"))
      val (serveBefore, liveBefore) = (serve(), liveRows())
      assert(spark.read.parquet(s"$root/assign")
        .filter(col("codebook_version") === "dead").count() > 0L)
      CurationState.compactState(spark, root, upTo = 2L,
        tables = Seq("assign"), keepVersions = Some(Set("live")))
      assert(spark.read.parquet(s"$root/assign")
        .filter(col("codebook_version") === "dead").count() === 0L,
        "GC must drop every superseded-version row in the fold's scope")
      assert(Similarity.assignStateVersions(spark, root) === Seq("live"))
      assert(liveRows() === liveBefore,
        "GC changed the current-version rows")
      assert(serve() === serveBefore, "GC changed the served results")
      // idempotent: re-running the same GC fold is a no-op
      CurationState.compactState(spark, root, upTo = 2L,
        tables = Seq("assign"), keepVersions = Some(Set("live")))
      assert(liveRows() === liveBefore, "GC re-run must be idempotent")
      // zero-survivor GC REFUSES: an empty fold would swap in a
      // footerless partition (a zero-row partitionBy write emits only
      // _SUCCESS) and poison every later read of the table — the op
      // must throw before anything is written or deleted
      val ex = intercept[IllegalArgumentException] {
        CurationState.compactState(spark, root, upTo = 2L,
          tables = Seq("assign"), keepVersions = Some(Set("ghost")))
      }
      assert(ex.getMessage.contains("survives"), ex.getMessage)
      assert(liveRows() === liveBefore,
        "a refused GC must leave the state untouched")
      assert(Similarity.assignStateVersions(spark, root) === Seq("live"))
    }
    withRoot { root =>
      // drift histogram state: folded per-batch rows re-aggregate to
      // the same reference sums, so the NEXT increment's curve is
      // bit-identical with or without compaction
      def arrival(b: Int) =
        (0 until 10).map(i => (b * 100L + i, "x" * (40 + 30 * (i % 3))))
          .toDF("doc_id", "text")
      withRoot { root2 =>
        for (b <- 0 until 3)
          TrainingDataPipeline.driftIncrement(
            arrival(b), "text", root2, b.toLong).collect()
        val plainCurve = TrainingDataPipeline.driftIncrement(
          arrival(3), "text", root2, 3L)
        for (b <- 0 until 3)
          TrainingDataPipeline.driftIncrement(
            arrival(b), "text", root, b.toLong).collect()
        CurationState.compactState(spark, root, upTo = 2L,
          tables = Seq("lenhist"))
        val compCurve = TrainingDataPipeline.driftIncrement(
          arrival(3), "text", root, 3L)
        assert(sortedRows(compCurve) === sortedRows(plainCurve),
          "drift curve must be identical against compacted histograms")
      }
    }
  }

  test("purge sweep skips partitions disjoint from the opt-out ids — files untouched") {
    withRoot { root =>
      val a0 = Seq((0L, baseA, "web"), (1L, baseB, "web"))
        .toDF("doc_id", "text", "source")
      val a1 = Seq(
        (2L, "the team built a fast engine to sort and merge all of the " +
          "rows in the table with care", "web"),
        (3L, "tiny", "web")).toDF("doc_id", "text", "source")
      curateIncrement(a0, "doc_id", Seq("source"), "n_tokens", root, 0L).collect()
      curateIncrement(a1, "doc_id", Seq("source"), "n_tokens", root, 1L).collect()
      def listing(t: String, b: Long) =
        Option(new java.io.File(s"$root/$t/batch=$b").listFiles())
          .getOrElse(Array.empty)
          .map(f => (f.getName, f.lastModified, f.length)).sorted.toSeq
      val before = CurationState.CurationTables.map(t => t -> listing(t, 0L))
      // the opt-out id lives only in batch 1 (the gate reject 3)
      CurationState.purgeDocs(spark, root, Seq(3L).toDF("doc_id"), "doc_id")
      for ((t, b) <- before)
        assert(listing(t, 0L) === b,
          s"$t/batch=0 is id-disjoint from the opt-out set and must not be rewritten")
      assert(spark.read.parquet(s"$root/ledger")
        .filter(col("doc_id") === 3L).count() === 0L)
    }
  }

  test("cross-op recovery: purge after a crashed compaction cannot resurrect purged ids") {
    // the ADVICE r14 medium ordering: compactState crashes after
    // committing its tmp (_SUCCESS written, originals partially
    // deleted); purgeDocs runs NEXT; a later compactState re-run must
    // not rename the stale pre-purge tmp over the purge's work
    withRoot { root =>
      val a0 = Seq((0L, baseA, "web"), (1L, baseB, "web"),
        (2L, "tiny", "web")).toDF("doc_id", "text", "source")
      val a1 = Seq((6L, "the team built a fast engine to sort and merge " +
        "all of the rows in the table with care", "web"))
        .toDF("doc_id", "text", "source")
      curateIncrement(a0, "doc_id", Seq("source"), "n_tokens", root, 0L).collect()
      curateIncrement(a1, "doc_id", Seq("source"), "n_tokens", root, 1L).collect()
      val t = "ledger"
      // simulate the crashed-compaction window on the ledger table
      spark.read.parquet(s"$root/$t").filter(col("batch") <= 1L)
        .drop("batch")
        .write.mode("overwrite").parquet(s"$root/$t/.compact-tmp-1")
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
      }
      rm(new java.io.File(s"$root/$t/batch=0"))
      // purge doc 2 (the gate reject) — recovery must FIRST finish the
      // compaction, then the purge rewrites the folded partition
      CurationState.purgeDocs(spark, root, Seq(2L).toDF("doc_id"),
        "doc_id", tables = Seq(t))
      assert(spark.read.parquet(s"$root/$t")
        .filter(col("doc_id") === 2L).count() === 0L,
        "purge must see the recovered fold, not half-deleted originals")
      // the later compaction re-run must not resurrect the purged id
      CurationState.compactState(spark, root, upTo = 1L, tables = Seq(t))
      assert(spark.read.parquet(s"$root/$t")
        .filter(col("doc_id") === 2L).count() === 0L,
        "compaction re-run resurrected a forgotten id (stale tmp trusted)")
      assert(!new java.io.File(s"$root/$t/.compact-tmp-1").exists)
    }
  }

  test("cross-op recovery: compaction folds a crashed purge's completed swap, losing no rows") {
    withRoot { root =>
      val a0 = Seq((0L, baseA, "web"), (1L, baseB, "web"))
        .toDF("doc_id", "text", "source")
      val a1 = Seq((6L, "the students walk to the library in the morning " +
        "and study the history of the ancient city together", "pdf"))
        .toDF("doc_id", "text", "source")
      curateIncrement(a0, "doc_id", Seq("source"), "n_tokens", root, 0L).collect()
      curateIncrement(a1, "doc_id", Seq("source"), "n_tokens", root, 1L).collect()
      val t = "dd"
      val rows = sortedRows(spark.read.parquet(s"$root/$t").drop("batch"))
      // crash window: completed purge tmp (no rows removed — pure
      // rewrite), original deleted, no rename
      spark.read.parquet(s"$root/$t/batch=0")
        .write.mode("overwrite").parquet(s"$root/$t/.purge-tmp-0")
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
      }
      rm(new java.io.File(s"$root/$t/batch=0"))
      // without cross-op recovery the fold would silently drop batch 0
      CurationState.compactState(spark, root, upTo = 1L, tables = Seq(t))
      assert(sortedRows(spark.read.parquet(s"$root/$t").drop("batch"))
        === rows, "fold must include the crashed purge's completed swap")
    }
  }

  test("purge fails fast on a non-long id column instead of silently no-opping") {
    withRoot { root =>
      Seq(("a", 1L), ("b", 2L)).toDF("doc_id", "v")
        .write.mode("overwrite").parquet(s"$root/custom/batch=0")
      val ex = intercept[IllegalArgumentException] {
        CurationState.purgeDocs(spark, root, Seq("a").toDF("doc_id"),
          "doc_id", tables = Seq("custom"))
      }
      assert(ex.getMessage.contains("cannot be range-pruned"))
    }
  }

  test("ranges manifest drives the purge prune; compaction folds it in lockstep") {
    withRoot { root =>
      val a0 = Seq((0L, baseA, "web"), (1L, baseB, "web"))
        .toDF("doc_id", "text", "source")
      val a1 = Seq(
        (6L, "the team built a fast engine to sort and merge all of the " +
          "rows in the table with care", "web"),
        (7L, "tiny", "web")).toDF("doc_id", "text", "source")
      curateIncrement(a0, "doc_id", Seq("source"), "n_tokens", root, 0L).collect()
      curateIncrement(a1, "doc_id", Seq("source"), "n_tokens", root, 1L).collect()
      // manifest rows (the writers add these at append time; written
      // explicitly here so the spec pins the consumer in isolation)
      CurationState.writeRange(spark, root, 0L, Some(0L), Some(1L), 2L, "doc_id")
      CurationState.writeRange(spark, root, 1L, Some(6L), Some(7L), 2L, "doc_id")
      def listing(t: String, b: Long) =
        Option(new java.io.File(s"$root/$t/batch=$b").listFiles())
          .getOrElse(Array.empty)
          .map(f => (f.getName, f.lastModified, f.length)).sorted.toSeq
      val before = CurationState.CurationTables.map(t => t -> listing(t, 0L))
      CurationState.purgeDocs(spark, root, Seq(7L).toDF("doc_id"), "doc_id")
      for ((t, b) <- before)
        assert(listing(t, 0L) === b,
          s"$t/batch=0 is manifest-disjoint from the opt-out and must not be rewritten")
      assert(spark.read.parquet(s"$root/ledger")
        .filter(col("doc_id") === 7L).count() === 0L)
      // compaction folds ranges ALONGSIDE the data tables even when not
      // named, so a post-compaction purge of an arrival-0 id still
      // rewrites the folded partition (a stale manifest would skip it)
      CurationState.compactState(spark, root, upTo = 1L)
      val rparts = new java.io.File(s"$root/${CurationState.RangesTable}")
        .listFiles().map(_.getName).filter(_.startsWith("batch=")).toSeq
      assert(rparts === Seq("batch=1"), s"ranges partitions: $rparts")
      CurationState.purgeDocs(spark, root, Seq(0L).toDF("doc_id"), "doc_id")
      for (t <- CurationState.CurationTables)
        assert(spark.read.parquet(s"$root/$t")
          .filter(col("doc_id") === 0L).count() === 0L,
          s"post-compaction manifest prune missed the folded partition in $t")
    }
  }

  test("purge sweep is idempotent and recovers a crashed per-partition swap") {
    withRoot { root =>
      val a0 = Seq((0L, baseA, "web"), (1L, baseB, "web"),
        (2L, "tiny", "web")).toDF("doc_id", "text", "source")
      curateIncrement(a0, "doc_id", Seq("source"), "n_tokens", root, 0L).collect()
      val optOut = Seq(2L).toDF("doc_id") // the gate reject
      CurationState.purgeDocs(spark, root, optOut, "doc_id")
      val after = CurationState.CurationTables.map { t =>
        t -> sortedRows(spark.read.parquet(s"$root/$t"))
      }.toMap
      CurationState.purgeDocs(spark, root, optOut, "doc_id") // re-run
      for (t <- CurationState.CurationTables)
        assert(sortedRows(spark.read.parquet(s"$root/$t")) === after(t),
          s"$t not idempotent under repeated purge")
      // crash window: completed replacement tmp, original deleted, no
      // rename — the next sweep must finish the swap, not lose the rows
      val t = "ledger"
      val rows = sortedRows(spark.read.parquet(s"$root/$t"))
      spark.read.parquet(s"$root/$t/batch=0")
        .write.mode("overwrite").parquet(s"$root/$t/.purge-tmp-0")
      def rm(x: java.io.File): Unit = {
        if (x.isDirectory) x.listFiles().foreach(rm); x.delete()
      }
      rm(new java.io.File(s"$root/$t/batch=0"))
      CurationState.purgeDocs(spark, root, optOut, "doc_id", tables = Seq(t))
      assert(sortedRows(spark.read.parquet(s"$root/$t")) === rows,
        "crashed swap must be completed by the next sweep")
    }
  }

  test("manifest prune is id-space-aware: a purge keyed on a different id column probes instead") {
    withRoot { root =>
      // a curation-era manifest row whose doc-id cover is numerically
      // DISJOINT from the index table's vec-id space — the shared-root
      // shape (curation + index state in one dir). Without the recorded
      // id column, the range join would classify every partition
      // untouched and silently no-op the sweep.
      CurationState.writeRange(spark, root, 0L,
        Some(100000L), Some(100010L), 11L, "doc_id")
      Seq((1L, "v1"), (2L, "v1")).toDF("vec_id", "codebook_version")
        .write.parquet(s"$root/codes/batch=0")
      CurationState.purgeDocs(spark, root,
        Seq(1L).toDF("vec_id"), "vec_id", tables = Seq("codes"))
      val left = spark.read.parquet(s"$root/codes")
        .select("vec_id").collect().map(_.getLong(0)).toSeq.sorted
      assert(left === Seq(2L),
        s"cross-id-space purge must fall back to the probe path: $left")
      // and a matching-column purge still rides the manifest: the
      // disjoint cover proves no doc partition can hold the id, so the
      // (nonexistent) doc tables are untouched and the sweep is a no-op
      CurationState.purgeDocs(spark, root, Seq(5L).toDF("doc_id"), "doc_id")
      assert(spark.read.parquet(s"$root/codes").count() === 1L)
    }
  }

  test("compaction refuses to fold unmanifested arrivals into a manifested state") {
    withRoot { root =>
      // batch 0 predates the manifest; batch 1 is covered. Folding them
      // together would leave a half-covered partition the purge prune
      // silently skips — the fold must refuse until rows are backfilled
      Seq((0L, "aa", 1L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=0")
      Seq((6L, "bb", 1L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=1")
      CurationState.writeRange(spark, root, 1L, Some(6L), Some(6L), 1L,
        "doc_id")
      val ex = intercept[IllegalStateException] {
        CurationState.compactState(spark, root, upTo = 1L,
          tables = Seq("dd"))
      }
      assert(ex.getMessage.contains("batch=0"), ex.getMessage)
      val parts = new java.io.File(s"$root/dd").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
      assert(parts === Seq("batch=0", "batch=1"),
        s"a refused fold must leave the state untouched: $parts")
      // backfilling the pre-manifest arrival's cover unblocks the fold
      CurationState.writeRange(spark, root, 0L, Some(0L), Some(0L), 1L,
        "doc_id")
      CurationState.compactState(spark, root, upTo = 1L, tables = Seq("dd"))
      val folded = new java.io.File(s"$root/dd").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq
      assert(folded === Seq("batch=1"), s"backfilled fold: $folded")
      assert(spark.read.parquet(s"$root/dd").count() === 2L)
    }
  }

  test("compaction mixing check is id-space-aware in a shared state root (ADVICE r17)") {
    withRoot { root =>
      // the q250 shared-root shape: curation doc-id tables manifested,
      // index vec-id tables whose increments never write manifest rows
      Seq((0L, "aa", 1L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=0")
      CurationState.writeRange(spark, root, 0L, Some(0L), Some(0L), 1L,
        "doc_id")
      Seq((1L, 3L, "v1"), (2L, 5L, "v1"))
        .toDF("vec_id", "cid", "codebook_version")
        .write.parquet(s"$root/codes/batch=0")
      Seq((7L, 4L, "v1")).toDF("vec_id", "cid", "codebook_version")
        .write.parquet(s"$root/codes/batch=1")
      // (b) folding the INDEX tables against the doc-space cover used
      // to spuriously throw (codes batch=1 is covered by no doc-space
      // arrival — nor should it need to be): scoped to its own id
      // space, no vec_id manifest rows exist, the check skips, and the
      // fold proceeds (those partitions fall to the purge probe path)
      CurationState.compactState(spark, root, upTo = 1L,
        tables = Seq("codes"), idCol = Some("vec_id"))
      val parts = new java.io.File(s"$root/codes").listFiles()
        .map(_.getName).filter(_.startsWith("batch=")).toSeq
      assert(parts === Seq("batch=1"), s"index fold must proceed: $parts")
      assert(spark.read.parquet(s"$root/codes").count() === 3L)
      // (a) the converse: a DIFFERENT-space manifest row must not mark
      // a doc partition covered. The vec-space row at arrival 4 maps to
      // doc batch=5 under the prefix-fold rule; the doc-space purge
      // ignores that row, so the doc-space fold must refuse the
      // unmanifested batch instead of trusting the cross-space cover
      Seq((9L, "cc", 1L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=5")
      CurationState.writeRange(spark, root, 4L, Some(1L), Some(7L), 3L,
        "vec_id")
      val ex = intercept[IllegalStateException] {
        CurationState.compactState(spark, root, upTo = 5L,
          tables = Seq("dd"), idCol = Some("doc_id"))
      }
      assert(ex.getMessage.contains("batch=5"),
        s"a cross-space cover must not unblock the doc fold: $ex")
      // backfill under the RIGHT column unblocks it
      CurationState.writeRange(spark, root, 5L, Some(9L), Some(9L), 1L,
        "doc_id")
      CurationState.compactState(spark, root, upTo = 5L,
        tables = Seq("dd"), idCol = Some("doc_id"))
      assert(spark.read.parquet(s"$root/dd").count() === 2L)
    }
  }
}
