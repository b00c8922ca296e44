package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit specs for the feature-engineering transforms (SURVEY §2.2-2.4). */
class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("hourBucket truncates to hour, hourBucketString matches reference format") {
    val df = Seq("2024-03-05 17:42:31").toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val r = df.select(
      Transforms.hourBucket(col("ts")).cast("string"),
      Transforms.hourBucketString(col("ts"))).head()
    assert(r.getString(0) === "2024-03-05 17:00:00")
    assert(r.getString(1) === "2024-03-05 17:00:00")
  }

  test("recode maps known codes and falls through to default") {
    val df = Seq("0", "60", "70", "99").toDF("code")
    val got = df.select(Transforms.recode(col("code"),
      Map("0" -> "no", "60" -> "rain", "70" -> "snow"), lit("unknown")).as("t"))
      .as[String].collect().toSeq
    assert(got === Seq("no", "rain", "snow", "unknown"))
  }

  test("precipitationPriority collapses with snow > rain > no") {
    val df = Seq(
      Seq("no", "rain", "snow"), Seq("rain", "no"), Seq("no"), Seq.empty[String]
    ).toDF("set")
    val got = df.select(Transforms.precipitationPriority(col("set")).as("p"))
      .as[String].collect().toSeq
    assert(got === Seq("snow", "rain", "no", "no"))
  }

  test("flattenMapColumn pivots dynamic keys into columns") {
    val df = Seq(
      ("r1", Map("a" -> "1", "b" -> "2")),
      ("r2", Map("b" -> "3", "c" -> "4"))
    ).toDF("id", "body")
    val flat = Transforms.flattenMapColumn(df, "body", keep = Seq("id"))
    assert(flat.columns.toSeq === Seq("id", "a", "b", "c"))
    val r2 = flat.filter(col("id") === "r2").head()
    assert(r2.getString(1) === null && r2.getString(2) === "3" && r2.getString(3) === "4")
  }

  test("hourlyStats aggregates per key per hour") {
    val df = Seq(
      (1L, "2024-01-01 10:15:00", 10.0),
      (1L, "2024-01-01 10:45:00", 30.0),
      (1L, "2024-01-01 11:05:00", 5.0)
    ).toDF("k", "s", "v").select(col("k"), to_timestamp(col("s")).as("ts"), col("v"))
    val got = Transforms.hourlyStats(df, Seq("k"), "ts", "v")
      .orderBy("event_timestamp")
      .select("avg_v", "sum_v", "min_v", "max_v", "n_events")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got === Seq((20.0, 40.0, 10.0, 30.0, 2L), (5.0, 5.0, 5.0, 5.0, 1L)))
  }

  test("sessionize splits on inactivity gaps per key, 1-based, tie-pinned") {
    val gap = 1800L * 1000000L
    val events = Seq(
      // user 1: two sessions — gap of 3900s between rows 2 and 3
      (1L, 10L, 0L), (1L, 11L, 100L * 1000000L),
      (1L, 12L, 4000L * 1000000L), (1L, 13L, 4100L * 1000000L),
      // user 2: one event, one session
      (2L, 20L, 0L),
      // user 3: two events at the SAME timestamp — id pins the order,
      // zero gap keeps them in one session
      (3L, 31L, 0L), (3L, 30L, 0L)
    ).toDF("user_id", "event_id", "us")
    val got = Transforms.sessionize(events, "user_id", "event_id", "us", gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got === Map(
      (1L, 10L) -> 1L, (1L, 11L) -> 1L, (1L, 12L) -> 2L, (1L, 13L) -> 2L,
      (2L, 20L) -> 1L,
      (3L, 31L) -> 1L, (3L, 30L) -> 1L))
    // boundary: a gap of exactly gapUs DOES split — session_window
    // semantics ([first, last + gap) half-open), pinned so the batch and
    // streaming sessionizers stay equivalent
    val edge = Seq((1L, 1L, 0L), (1L, 2L, gap)).toDF("user_id", "event_id", "us")
    val sessions = Transforms.sessionize(edge, "user_id", "event_id", "us", gap)
      .select(max(col("session_id"))).head.getLong(0)
    assert(sessions === 2L)
  }

  test("sessionize matches a driver-side reference on seeded random streams") {
    val rnd = new scala.util.Random(23L)
    val gap = 100L
    for (trial <- 1 to 3) {
      val events = (1L to 200L).map { id =>
        (rnd.nextInt(5).toLong, id, rnd.nextInt(2000).toLong)
      }
      // reference: per user, sort by (us, id), running index with >= gap
      val want = events.groupBy(_._1).flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e._3, e._2))
        var sess = 0L
        var last = Long.MinValue
        sorted.map { case (_, id, us) =>
          if (last == Long.MinValue || us - last >= gap) sess += 1
          last = us
          (u, id) -> sess
        }
      }
      val got = Transforms.sessionize(
        events.toDF("user_id", "event_id", "us"), "user_id", "event_id", "us", gap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(got === want, s"trial $trial")
    }
  }

  test("sessionizeBucketed equals sessionize for any bucket width") {
    val rnd = new scala.util.Random(41L)
    val gap = 100L
    val events = (1L to 300L).map { id =>
      (rnd.nextInt(4).toLong, id, rnd.nextInt(3000).toLong)
    }.toDF("user_id", "event_id", "us")
    val want = Transforms.sessionize(events, "user_id", "event_id", "us", gap)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // bucket narrower than, equal to, wider than the gap; and one so wide
    // everything lands in a single bucket (degenerates to the plain form)
    for (bucket <- Seq(7L, 100L, 640L, 1000000L)) {
      val got = Transforms.sessionizeBucketed(
        events, "user_id", "event_id", "us", gap, bucket)
        .select(col("user_id"), col("event_id"), col("session_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got === want, s"bucketUs=$bucket")
    }
  }

  test("writePartitioned lays out hive-style partitions") {
    val out = java.nio.file.Files.createTempDirectory("wp").toString + "/t"
    val df = Seq(("2024-01-01", 1), ("2024-01-02", 2)).toDF("created", "v")
    Transforms.writePartitioned(df, out, "created")
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("created="))
    assert(dirs.toSet === Set("created=2024-01-01", "created=2024-01-02"))
    val back = spark.read.parquet(out)
    assert(back.count() === 2)
  }

  test("compact rewrites many small files into few") {
    val out = java.nio.file.Files.createTempDirectory("cmp").toString + "/t"
    (1 to 20).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(20).write.parquet(out)
    val before = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 10)
    val n = Transforms.compact(spark, out, targetFileSizeMB = 128)
    val after = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after === n && after <= 2)
    assert(spark.read.parquet(out).count() === 20)
  }

  test("compact recovers a table stranded mid-swap instead of failing on a missing path") {
    import org.apache.hadoop.fs.Path
    val path = java.nio.file.Files.createTempDirectory("cmpcrash").toString + "/t"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1 to 12).map(i => (i, s"row$i")).toDF("id", "s")
      .repartition(6).write.parquet(path)
    // simulate a crash between rename(p -> __precompact) and
    // rename(tmp -> p): the table sits at __precompact, p is gone —
    // the next compact must restore it, then compact normally
    assert(fs.rename(new Path(path), new Path(path + "__precompact")))
    Transforms.compact(spark, path, targetFileSizeMB = 128)
    assert(spark.read.parquet(path).count() === 12L,
      "interrupted table must be restored, not lost")
    assert(!fs.exists(new Path(path + "__precompact")))
    // crash AFTER swap-in but before cleanup: stale __precompact beside
    // a healthy table is deleted, the healthy table is kept
    (13 to 14).map(i => (i, s"row$i")).toDF("id", "s")
      .write.mode("overwrite").parquet(path + "__precompact")
    Transforms.compact(spark, path, targetFileSizeMB = 128)
    assert(spark.read.parquet(path).count() === 12L,
      "healthy table must win over a stale pre-swap copy")
    assert(!fs.exists(new Path(path + "__precompact")))
  }

  test("PIT retrieval accepts string-typed entity timestamps") {
    val featDir = java.nio.file.Files.createTempDirectory("strts").toString + "/f"
    Seq(("a", "2024-01-01 00:00:00", 1.0), ("a", "2024-01-03 00:00:00", 3.0))
      .toDF("key", "ts", "v")
      .select(col("key"), to_timestamp(col("ts")).as("ts"), col("v"))
      .write.parquet(featDir)
    val fs = new graft.api.FeatureStore(spark,
      graft.api.RepoConfig("t"), new graft.core.InMemoryRegistry)
    fs.applyObjects(Seq(
      graft.core.Entity("key", Seq("key"), graft.core.ValueType.STRING),
      graft.core.FeatureView("fv", Seq("key"),
        Seq(graft.core.Feature("v", org.apache.spark.sql.types.DoubleType)),
        graft.core.SparkSource("s", featDir, timestampField = "ts"))))
    // entity ts is a plain STRING column
    val ent = Seq(("a", "2024-01-02 00:00:00")).toDF("key", "event_timestamp")
    val out = fs.getHistoricalFeatures(ent, Seq("fv:v")).toDf
    assert(out.select("fv__v").as[Double].collect().toSeq === Seq(1.0))
  }

  test("compact refuses partitioned tables without partitionCols, preserves layout with them") {
    val out = java.nio.file.Files.createTempDirectory("cmp2").toString + "/t"
    val df = (1 to 20).map(i => (s"2024-01-0${i % 2 + 1}", i)).toDF("created", "v")
    Transforms.writePartitioned(df, out, "created")
    val e = intercept[IllegalArgumentException](Transforms.compact(spark, out))
    assert(e.getMessage.contains("hive-partitioned"))
    Transforms.compact(spark, out, partitionCols = Seq("created"))
    val dirs = new java.io.File(out).listFiles().map(_.getName).filter(_.startsWith("created="))
    assert(dirs.toSet === Set("created=2024-01-01", "created=2024-01-02"))
    assert(spark.read.parquet(out).count() === 20)
  }

  test("PIT retrieval fails fast on unparseable entity timestamp strings") {
    val featDir = java.nio.file.Files.createTempDirectory("badts").toString + "/f"
    Seq(("a", "2024-01-01 00:00:00", 1.0)).toDF("key", "ts", "v")
      .select(col("key"), to_timestamp(col("ts")).as("ts"), col("v"))
      .write.parquet(featDir)
    val fs = new graft.api.FeatureStore(spark,
      graft.api.RepoConfig("t"), new graft.core.InMemoryRegistry)
    fs.applyObjects(Seq(
      graft.core.Entity("key", Seq("key"), graft.core.ValueType.STRING),
      graft.core.FeatureView("fv", Seq("key"),
        Seq(graft.core.Feature("v", org.apache.spark.sql.types.DoubleType)),
        graft.core.SparkSource("s", featDir, timestampField = "ts"))))
    val ent = Seq(("a", "01/02/2024")).toDF("key", "event_timestamp")
    // ANSI mode (Spark 4 default) throws SparkDateTimeException at parse;
    // with ANSI off, the null-count guard raises IllegalArgumentException.
    val e = intercept[Exception] {
      fs.getHistoricalFeatures(ent, Seq("fv:v")).toDf.count()
    }
    assert(e.getClass.getSimpleName == "SparkDateTimeException"
      || e.getMessage.contains("null/unparseable"))
    // the guard must hold even with the range prefilter DISABLED: the
    // bounds agg that carries it is lazy, and to_timestamp-minted nulls
    // would otherwise silently null-pad every feature (ANSI-off mode)
    val e2 = intercept[Exception] {
      graft.offline.PointInTimeJoin.retrieve(spark, ent,
        Seq(graft.offline.PointInTimeJoin.ViewRequest(
          fs.getFeatureView("fv"),
          Seq(graft.core.Feature("v", org.apache.spark.sql.types.DoubleType)),
          Seq("key"))),
        prefilterByEntityRange = false).count()
    }
    assert(e2.getClass.getSimpleName == "SparkDateTimeException"
      || e2.getMessage.contains("null/unparseable"))
    // an already-TIMESTAMP-typed column carrying NULLs must hit the
    // same guard even with the prefilter disabled (ADVICE r19): no
    // string normalization runs, but the nullable schema forces the
    // bounds agg — without it, those rows silently null-padded
    val entTyped = Seq(("a", Some("2024-01-02 00:00:00")), ("b", None))
      .toDF("key", "raw")
      .select(col("key"), to_timestamp(col("raw")).as("event_timestamp"))
    val e3 = intercept[IllegalArgumentException] {
      graft.offline.PointInTimeJoin.retrieve(spark, entTyped,
        Seq(graft.offline.PointInTimeJoin.ViewRequest(
          fs.getFeatureView("fv"),
          Seq(graft.core.Feature("v", org.apache.spark.sql.types.DoubleType)),
          Seq("key"))),
        prefilterByEntityRange = false).count()
    }
    assert(e3.getMessage.contains("null/unparseable"), e3.getMessage)
  }

  test("zscoreNormalize matches a driver-side reference and is group-local") {
    val rows = Seq(
      ("a", 100L), ("a", 200L), ("a", 300L), ("a", 400L),
      ("b", 10L), ("b", 20L), ("b", 60L))
    val df = rows.toDF("g", "cents")
    val got = Transforms.zscoreNormalize(df, Seq("g"), "cents")
      .select(col("g"), col("cents"), col("zscore"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // sample-variance reference per group
    def ref(xs: Seq[Long]): Map[Long, Double] = {
      val n = xs.size.toDouble
      val mean = xs.sum.toDouble / n
      val variance = (xs.map(x => x.toDouble * x).sum - xs.sum.toDouble * xs.sum / n) / (n - 1.0)
      xs.map(x => x -> (x - mean) / math.sqrt(variance)).toMap
    }
    for ((g, xs) <- rows.groupBy(_._1); (x, z) <- ref(xs.map(_._2))) {
      assert(math.abs(got((g, x)) - z) < 1e-12, s"group $g value $x")
    }
    // a one-row group has zero sample variance → NaN zscore, never a wrong number
    val single = Transforms.zscoreNormalize(Seq(("c", 5L)).toDF("g", "cents"),
      Seq("g"), "cents").select("zscore").head().getDouble(0)
    assert(single.isNaN)
  }

  test("purgeByKey drops exactly the blocklisted keys, broadcast or shuffled") {
    val data = Seq((1L, "x"), (2L, "y"), (3L, "z"), (2L, "w")).toDF("k", "v")
    val block = Seq(2L, 2L, 9L).toDF("k") // dupes + a key absent from data
    for (bcast <- Seq(true, false)) {
      val kept = Transforms.purgeByKey(data, Seq("k"), block, broadcastList = bcast)
        .select("k").as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 3L), s"broadcastList=$bcast")
    }
  }

  test("upsertByKey: inserts, newer-version overwrites, stale no-ops, tie prefers update") {
    val path = java.nio.file.Files.createTempDirectory("upsert").toString + "/t"
    def read() = spark.read.parquet(path)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // bootstrap write path: batch itself deduped by version
    Transforms.upsertByKey(spark, path,
      Seq((1L, 10L, "a0"), (2L, 10L, "b0"), (2L, 9L, "b_stale"))
        .toDF("k", "ver", "v"), Seq("k"), "ver")
    assert(read() === Map(1L -> ((10L, "a0")), 2L -> ((10L, "b0"))))
    // merge: new key, newer version, stale version, same-version tie
    Transforms.upsertByKey(spark, path,
      Seq((3L, 11L, "c1"), (2L, 11L, "b1"), (1L, 9L, "a_stale"))
        .toDF("k", "ver", "v"), Seq("k"), "ver")
    assert(read() === Map(
      1L -> ((10L, "a0")),  // stale update ignored
      2L -> ((11L, "b1")),  // newer version wins
      3L -> ((11L, "c1")))) // insert
    Transforms.upsertByKey(spark, path,
      Seq((1L, 10L, "a_tie")).toDF("k", "ver", "v"), Seq("k"), "ver")
    assert(read()(1L) === ((10L, "a_tie"))) // version tie → update wins
    // schema drift fails loudly instead of silently dropping columns
    intercept[IllegalArgumentException] {
      Transforms.upsertByKey(spark, path,
        Seq((1L, 12L)).toDF("k", "ver"), Seq("k"), "ver")
    }
  }

  test("upsertByKey: recovers a table stranded mid-swap instead of discarding it") {
    import org.apache.hadoop.fs.Path
    val fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)
    val path = java.nio.file.Files.createTempDirectory("upsertcrash").toString + "/t"
    def read() = spark.read.parquet(path)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    Transforms.upsertByKey(spark, path,
      Seq((1L, 10L, "a0"), (2L, 10L, "b0")).toDF("k", "ver", "v"),
      Seq("k"), "ver")
    // simulate a crash between rename(p -> __preupsert) and
    // rename(tmp -> p): the table sits at __preupsert, p is gone
    assert(fs.rename(new Path(path), new Path(path + "__preupsert")))
    Transforms.upsertByKey(spark, path,
      Seq((3L, 11L, "c1")).toDF("k", "ver", "v"), Seq("k"), "ver")
    // without recovery this branch saw !exists(p) and wrote ONLY the
    // update batch, silently discarding rows 1 and 2
    assert(read() === Map(
      1L -> ((10L, "a0")), 2L -> ((10L, "b0")), 3L -> ((11L, "c1"))))
    assert(!fs.exists(new Path(path + "__preupsert")))
    // crash AFTER swap-in but before cleanup: stale __preupsert beside
    // a live table is dropped, the (already-merged) table is the truth
    assert(fs.mkdirs(new Path(path + "__preupsert")))
    Transforms.upsertByKey(spark, path,
      Seq((2L, 12L, "b2")).toDF("k", "ver", "v"), Seq("k"), "ver")
    assert(read() === Map(
      1L -> ((10L, "a0")), 2L -> ((12L, "b2")), 3L -> ((11L, "c1"))))
    assert(!fs.exists(new Path(path + "__preupsert")))
  }

  test("zOrderWrite clusters both dimensions: per-file spread <= half the global") {
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    // 64x64 grid: a lexicographic (x, y) sort into 16 files would give
    // every file the FULL y spread; z-order must bound both
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    Transforms.zOrderWrite(grid.toDF("x", "y"), path, "x", "y", numFiles = 16)
    val byFile = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg(max(col("x")) - min(col("x")), max(col("y")) - min(col("y")))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(byFile.length >= 8, s"expected ~16 files, got ${byFile.length}")
    byFile.foreach { case (sx, sy) =>
      assert(sx <= 32 && sy <= 32, s"file spread ($sx, $sy) not clustered")
    }
  }

  test("morton 1024-blocks are ALIGNED 32x32 rectangles (q144's file invariant)") {
    // full 256x256 grid: every run of 1024 consecutive z-values must be
    // an aligned 32x32 block — 1024 rows each, spans exactly 32, and
    // origins on 32-boundaries (4^5 = 1024 ⇒ 5 bits of each dim)
    val grid = (for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y))
      .toDF("x", "y")
    val files = grid
      .withColumn("z", graft.functions.functions.interleave_bits(col("x"), col("y")))
      .groupBy(expr("z div 1024").as("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("mnx"), max(col("x")).as("mxx"),
        min(col("y")).as("mny"), max(col("y")).as("mxy"))
      .collect()
    assert(files.length === 64)
    files.foreach { r =>
      assert(r.getLong(1) === 1024L)
      assert(r.getLong(3) - r.getLong(2) === 31L, "x span must be 32")
      assert(r.getLong(5) - r.getLong(4) === 31L, "y span must be 32")
      assert(r.getLong(2) % 32 === 0L && r.getLong(4) % 32 === 0L,
        "block origin must align to 32")
    }
  }

  test("mergeRollups: merged split == from-scratch; one-sided keys survive") {
    val rows = Seq(("a", 1L), ("a", 5L), ("b", 3L), ("b", -2L), ("c", 7L))
    val df = rows.toDF("k", "v")
    // split so key c exists ONLY in the delta and key a only in state
    val state = Transforms.mergeableRollup(
      df.filter(col("k") === "a"), Seq("k"), col("v"))
    val delta = Transforms.mergeableRollup(
      df.filter(col("k") =!= "a"), Seq("k"), col("v"))
    val merged = Transforms.mergeRollups(state, delta, Seq("k"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val scratch = Transforms.mergeableRollup(df, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(merged === scratch, s"merge diverged: $merged vs $scratch")
    assert(merged.keySet === Set("a", "b", "c"))
    assert(merged("b") === ((2L, 1L, -2L, 3L)))
  }
}
