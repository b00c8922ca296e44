package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed Avro file reader (reference S5: the Event-Hub capture
  * files, `chicago_weather_bronze.py:10-12,38-40`). The spark-avro
  * connector module is not always on the classpath; this reader needs
  * only avro-core (shipped with Spark) — files are opened per-partition
  * via `binaryFiles`, so the read scales with the file count like any
  * non-splittable container format (capture files are small by design:
  * 3-minute buffers).
  *
  * Supported Avro shapes: records of primitive fields (string, int,
  * long, float, double, boolean, bytes) and nullable unions thereof —
  * the capture-file envelope shape. Nested records/arrays should land in
  * parquet before entering the feature pipeline (as the reference's
  * bronze step does).
  *
  * Stream hygiene: each file's `DataFileStream` is closed eagerly when
  * the iterator exhausts AND via a task-completion listener, so partial
  * consumption (`limit(1)`, `take(n)` over multi-file input) cannot leak
  * open streams for the life of the executor. The close is idempotent
  * (guarded), so the two paths compose.
  */
object AvroReader {

  /** Test hooks: per-file stream open/close counters, visible in
    * local mode (executors share the JVM). Cost: two atomic increments
    * per FILE — not per row. */
  private[graft] val openedStreams = new java.util.concurrent.atomic.AtomicLong
  private[graft] val closedStreams = new java.util.concurrent.atomic.AtomicLong

  def read(spark: SparkSession, path: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(path)
    val sample = files.take(1).headOption.getOrElse(
      throw new IllegalArgumentException(s"no avro files at $path"))
    val avroSchema = {
      val in = sample._2.open()
      try new DataFileStream(in, new GenericDatumReader[GenericRecord]()).getSchema
      finally in.close()
    }
    val structType = toStructType(avroSchema)
    val schemaJson = avroSchema.toString

    val rows = files.flatMap { case (_, pds) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val in = pds.open()
      val stream = new DataFileStream(in,
        new GenericDatumReader[GenericRecord](schema))
      openedStreams.incrementAndGet()
      val closedFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
      def closeOnce(): Unit = if (closedFlag.compareAndSet(false, true)) {
        try stream.close() finally in.close()
        closedStreams.incrementAndGet()
      }
      // Partial consumption (limit/take) never exhausts the iterator —
      // the task-completion listener is the only close on that path.
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val fieldNames = schema.getFields.asScala.map(_.name).toArray
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = stream.hasNext
          if (!h) closeOnce()
          h
        }
        override def next(): Row = {
          val rec = stream.next()
          Row.fromSeq(fieldNames.toSeq.map(f => convert(rec.get(f))))
        }
      }
    }
    spark.createDataFrame(rows, structType)
  }

  private def convert(v: Any): Any = v match {
    case null                    => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case b: java.nio.ByteBuffer  =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case other                   => other
  }

  private[sources] def toStructType(s: Schema): StructType = {
    require(s.getType == Schema.Type.RECORD, s"expected avro record, got ${s.getType}")
    StructType(s.getFields.asScala.map { f =>
      val (tpe, nullable) = fieldType(f.schema())
      StructField(f.name, tpe, nullable)
    }.toSeq)
  }

  private def fieldType(s: Schema): (DataType, Boolean) = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union ${s}")
      (fieldType(nonNull.head)._1, true)
    case Schema.Type.STRING  => (StringType, false)
    case Schema.Type.INT     => (IntegerType, false)
    case Schema.Type.LONG    => (LongType, false)
    case Schema.Type.FLOAT   => (FloatType, false)
    case Schema.Type.DOUBLE  => (DoubleType, false)
    case Schema.Type.BOOLEAN => (BooleanType, false)
    case Schema.Type.BYTES   => (BinaryType, false)
    case other => throw new IllegalArgumentException(
      s"unsupported avro type in capture envelope: $other")
  }
}
