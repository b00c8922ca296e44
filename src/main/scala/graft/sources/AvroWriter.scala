package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed Avro file writer — the sink side of [[AvroReader]] (S5),
  * needing only avro-core. Each partition writes its own container file
  * through the Hadoop FS API (`part-NNNNN.avro` under `path`), so the
  * write is executor-parallel and works against any Hadoop URI; no
  * driver collect. Same supported shape as the reader: records of
  * primitive fields, nullable via unions.
  *
  * Task-attempt isolation: each attempt writes a HIDDEN attempt-unique
  * tmp (`.part-NNNNN-ATTEMPT.avro.tmp` — dot-prefixed so Hadoop's
  * hidden-file filter keeps it out of every listing/glob) and renames
  * into the final name only once complete. A speculative or retried
  * attempt of the same partition therefore can never truncate a
  * committed part file: rename-to-existing returns false on both HDFS
  * and the local FS, and the loser deletes its own tmp. Whichever
  * attempt wins, the final file is one complete container.
  */
object AvroWriter {

  /** SINGLE WRITER PER DIRECTORY: write() clears `path` up front
    * (mode = overwrite) and its post-job orphan sweep deletes every
    * leftover attempt tmp under it, so two concurrent write() calls
    * into one directory are mutually destructive BY CONTRACT — the
    * second clears the first's committed parts and the sweep would eat
    * its in-flight tmps. Concurrent jobs each get their own path;
    * within one job, task attempts are isolated (see above).
    */
  def write(df: DataFrame, path: String): Unit = {
    val schema = toAvroSchema(df.schema, "spark_record")
    val schemaJson = schema.toString
    val sparkSchema = df.schema
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)

    val root = new org.apache.hadoop.fs.Path(path)
    val fsRoot = root.getFileSystem(conf.value)
    if (fsRoot.exists(root)) fsRoot.delete(root, true)
    fsRoot.mkdirs(root)

    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (rows.isEmpty) Iterator.empty
      else {
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        writePartition(conf.value, path, schemaJson, sparkSchema, pid, attempt, rows)
        Iterator.single(pid)
      }
    }.count() // force the write
    sweepOrphanTmps(fsRoot, root)
  }

  /** Sweep orphaned attempt tmps after all partitions committed: an
    * attempt killed mid-write never reaches its own cleanup, and a
    * RETRY cleans only its own attempt-id tmp — anything still matching
    * the hidden tmp pattern is dead weight (invisible to readers, but
    * it would leak disk across job failures). Best-effort.
    */
  private[sources] def sweepOrphanTmps(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit =
    try fs.globStatus(new org.apache.hadoop.fs.Path(root, ".part-*.avro.tmp"))
      .foreach(st => fs.delete(st.getPath, false))
    catch { case scala.util.control.NonFatal(_) => () }

  /** One task attempt's write of partition `pid`: attempt-unique hidden
    * tmp, then rename into `part-NNNNN.avro`. Losing the rename (another
    * attempt already committed) is success — delete the tmp and return.
    * Factored out so a spec can simulate two attempts of one partition.
    */
  private[sources] def writePartition(
      hadoopConf: org.apache.hadoop.conf.Configuration,
      path: String,
      schemaJson: String,
      sparkSchema: StructType,
      pid: Int,
      attemptId: Long,
      rows: Iterator[org.apache.spark.sql.Row]): Unit = {
    val schema = new Schema.Parser().parse(schemaJson)
    val finalFile = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
    val tmpFile = new org.apache.hadoop.fs.Path(path, f".part-$pid%05d-$attemptId.avro.tmp")
    val fs = finalFile.getFileSystem(hadoopConf)
    val out = fs.create(tmpFile, true)
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, out)
    try rows.foreach { row =>
      val rec = new GenericData.Record(schema)
      var i = 0
      while (i < sparkSchema.length) {
        rec.put(sparkSchema(i).name, toAvro(row.get(i)))
        i += 1
      }
      writer.append(rec)
    } finally writer.close()
    // Commit: first attempt to rename wins. On HDFS rename-to-existing
    // returns false; on the local FS rename(2) REPLACES the destination
    // atomically (still a complete container either way, readers with an
    // open fd keep the old inode) — the exists() pre-check narrows the
    // window, and the postcondition below is the real guarantee: after
    // this method returns, a committed final file EXISTS. A rename that
    // returns false with no committed final (transient FS condition)
    // must throw, never silently drop the partition — the tmp is
    // complete, so a task retry recovers.
    val renamed = !fs.exists(finalFile) && fs.rename(tmpFile, finalFile)
    if (!renamed) {
      if (!fs.exists(finalFile))
        throw new java.io.IOException(
          s"avro commit rename failed for $tmpFile with no committed " +
            s"$finalFile — retry the task (tmp is complete)")
      fs.delete(tmpFile, false) // another attempt won; drop our copy
    }
  }

  private def toAvro(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other => other
  }

  private[sources] def toAvroSchema(s: StructType, name: String): Schema = {
    val fields = s.fields.map { f =>
      val base = f.dataType match {
        case StringType  => Schema.create(Schema.Type.STRING)
        case IntegerType => Schema.create(Schema.Type.INT)
        case LongType    => Schema.create(Schema.Type.LONG)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case other => throw new IllegalArgumentException(
          s"unsupported type for avro envelope: ${other.catalogString} " +
            "(cast timestamps to long micros and land nested data in parquet)")
      }
      val tpe =
        if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base)
        else base
      new Schema.Field(f.name, tpe, null, null)
    }
    Schema.createRecord(name, null, "graft", false, fields.toSeq.asJava)
  }
}
