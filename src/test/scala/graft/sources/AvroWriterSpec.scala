package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** S5 writer/reader boundary hardening (r17 verdict items #1/#2):
  *
  *  - [[AvroWriter.writePartition]] must survive a DUPLICATE task
  *    attempt (speculation, retry after a lost executor) without
  *    truncating the committed part file — attempt-unique hidden tmp +
  *    rename-into-place, loser deletes its own tmp.
  *  - [[AvroReader]] must not leak open streams on PARTIAL consumption
  *    (`limit(1)` over multi-file input) — a task-completion listener
  *    closes what the exhaustion path never reaches.
  */
class AvroWriterSpec extends SparkSpec {
  import spark.implicits._

  private def readBytes(f: java.io.File): Array[Byte] =
    java.nio.file.Files.readAllBytes(f.toPath)

  test("duplicate task attempt cannot truncate a committed part file") {
    val dir = Files.createTempDirectory("avro_attempt").toString
    val df = (0L until 50L).map(i => (i, s"doc$i")).toDF("id", "text")
    val schemaJson = AvroWriter.toAvroSchema(df.schema, "spark_record").toString
    val rows = df.collect()
    val conf = spark.sparkContext.hadoopConfiguration

    // attempt 0 commits partition 0
    AvroWriter.writePartition(conf, dir, schemaJson, df.schema,
      pid = 0, attemptId = 0L, rows = rows.iterator)
    val finalFile = new java.io.File(dir, "part-00000.avro")
    assert(finalFile.exists(), "attempt 0 must commit the final file")
    val committed = readBytes(finalFile)

    // attempt 1 (same partition, e.g. a speculative copy) replays the
    // SAME rows: it must not touch the committed bytes and must clean
    // up after itself. Avro embeds a random sync marker per container,
    // so byte-stability proves the loser never reached the final path.
    AvroWriter.writePartition(conf, dir, schemaJson, df.schema,
      pid = 0, attemptId = 1L, rows = rows.iterator)
    assert(readBytes(finalFile).sameElements(committed),
      "losing attempt must leave the committed file byte-identical")
    val leftovers = new java.io.File(dir).listFiles()
      .filter(f => f.getName != "part-00000.avro" && !f.getName.endsWith(".crc"))
    assert(leftovers.isEmpty, s"losing attempt left: ${leftovers.mkString(", ")}")

    // the committed file is complete and readable end-to-end
    val back = AvroReader.read(spark, s"$dir/*.avro")
    assert(back.count() === 50L)
    assert(back.agg(sum(col("id"))).head().getLong(0) === (0L until 50L).sum)
  }

  test("tmp files are hidden from the reader while a write is in flight") {
    // A dot-prefixed tmp must be invisible to directory-glob reads —
    // that is what makes a concurrently-retrying writer safe to read past.
    val dir = Files.createTempDirectory("avro_hidden").toString
    val df = (0L until 10L).map(i => (i, s"d$i")).toDF("id", "text")
    val schemaJson = AvroWriter.toAvroSchema(df.schema, "spark_record").toString
    val conf = spark.sparkContext.hadoopConfiguration
    AvroWriter.writePartition(conf, dir, schemaJson, df.schema,
      pid = 0, attemptId = 0L, rows = df.collect().iterator)
    // plant a stale tmp (an attempt that died mid-write)
    val stale = new java.io.File(dir, ".part-00000-99.avro.tmp")
    java.nio.file.Files.write(stale.toPath, Array[Byte](1, 2, 3))
    val back = AvroReader.read(spark, s"$dir/*")
    assert(back.count() === 10L, "hidden tmp must not reach the reader")
  }

  test("orphaned attempt tmps are swept after commit; committed parts untouched") {
    // an attempt killed mid-write leaves its hidden tmp with no owner
    // (a RETRY cleans only its own attempt id); the end-of-write sweep
    // must remove exactly the orphans — invisible-to-readers is not a
    // license to leak disk across job failures
    val dir = Files.createTempDirectory("avro_sweep").toString
    val df = (0L until 20L).map(i => (i, s"d$i")).toDF("id", "text")
    AvroWriter.write(df, dir)
    val orphan = new java.io.File(dir, ".part-00007-12345.avro.tmp")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](9, 9))
    val root = new org.apache.hadoop.fs.Path(dir)
    AvroWriter.sweepOrphanTmps(
      root.getFileSystem(spark.sparkContext.hadoopConfiguration), root)
    val leftovers = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro.tmp"))
    assert(leftovers.isEmpty, s"sweep missed: ${leftovers.mkString(", ")}")
    assert(AvroReader.read(spark, s"$dir/*.avro").count() === 20L)
  }

  test("reader closes every stream under partial consumption (limit over multi-file input)") {
    val dir = Files.createTempDirectory("avro_leak").toString
    val df = (0L until 400L).map(i => (i, s"doc$i")).toDF("id", "text")
      .repartition(8) // 8 container files
    AvroWriter.write(df, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) === 8)

    val opened0 = AvroReader.openedStreams.get()
    val closed0 = AvroReader.closedStreams.get()
    // partial consumption: limit(1) abandons 7+ iterators mid-file
    assert(AvroReader.read(spark, s"$dir/*.avro").limit(1).collect().length === 1)
    val openedPartial = AvroReader.openedStreams.get() - opened0
    assert(openedPartial >= 1L)
    assert(AvroReader.closedStreams.get() - closed0 === openedPartial,
      "every stream opened by a partial read must be closed by task completion")

    // full consumption stays balanced too (eager close + idempotent listener)
    val opened1 = AvroReader.openedStreams.get()
    val closed1 = AvroReader.closedStreams.get()
    assert(AvroReader.read(spark, s"$dir/*.avro").count() === 400L)
    assert(AvroReader.openedStreams.get() - opened1 === 8L)
    assert(AvroReader.closedStreams.get() - closed1 === 8L)
  }
}
