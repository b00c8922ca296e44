package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata schema canary + loader normalization contract.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed `events.ts`'s physical encoding once (TIMESTAMP(NANOS) →
  * plain `timestamp[us]`/NTZ in r8, silently breaking 22 queries). This
  * suite makes the NEXT such change fail here, in one named place.
  */
class TablesSpec extends SparkSpec {

  test("schema canary: all testdata tables load with canonical dtypes") {
    val problems = Tables.schemaCanary(spark, sf0001)
    assert(problems.isEmpty, problems.mkString("; "))
  }

  test("events.ts is TimestampType after load — never NTZ or raw long") {
    val ev = Tables.load(spark, sf0001, "events")
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts surfaced as ${ev.schema("ts").dataType.simpleString}")
    // and the call pattern the 26 query sites depend on must analyze
    ev.select(unix_micros(col("ts"))).head()
  }

  test("nanosToTimestamp normalizes long-ns, NTZ, and leaves timestamps alone") {
    import spark.implicits._
    val base = Seq(1723500000123456L).toDF("us")
    val ntz = base.select(timestamp_micros(col("us"))
      .cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fromNtz = Tables.nanosToTimestamp(ntz, Seq("ts"))
    assert(fromNtz.schema("ts").dataType == TimestampType)

    val ns = base.select((col("us") * 1000).cast(LongType).as("ts"))
    val fromNs = Tables.nanosToTimestamp(ns, Seq("ts"))
    assert(fromNs.schema("ts").dataType == TimestampType)

    val already = base.select(timestamp_micros(col("us")).as("ts"))
    val fromTs = Tables.nanosToTimestamp(already, Seq("ts"))
    assert(fromTs.schema("ts").dataType == TimestampType)

    // all three normalize to the same instant (UTC session)
    val vals = Seq(fromNtz, fromNs, fromTs)
      .map(_.select(unix_micros(col("ts"))).head().getLong(0))
    assert(vals.distinct == Seq(1723500000123456L), vals.toString)
    // absent column: no-op, no error
    Tables.nanosToTimestamp(base, Seq("nope")).collect()
  }
}
