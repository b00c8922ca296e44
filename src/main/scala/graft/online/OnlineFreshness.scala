package graft.online

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving-tier freshness audit — the q234 freshness readout pointed at
  * the ONLINE STORE instead of the raw event log, closing the
  * streaming→online loop (VERDICT r11 #4 / r12 "what's missing"):
  * while [[StreamingMaterializer]] continuously upserts latest vectors,
  * the audit reads back, per EXPECTED entity key, the stored
  * `event_timestamp` and reports its lag behind the serving watermark
  * (the max stored timestamp — the same corpus-watermark device as
  * q234, derived from the audited rows themselves so the audit needs
  * no second clock).
  *
  * Auditing through the point-lookup API has a property a store SCAN
  * cannot give: a key the stream never delivered (`present = 0`) is
  * exactly the row a coverage SLA must see — a scan does not know what
  * is missing. It also means the audit runs against ANY
  * [[OnlineStore]], including a networked KV, with no extra server
  * surface (StreamingSpec drives it over the loopback TCP store).
  *
  * `expectedKeys` is the audited key universe — registry entities, the
  * batch source's key list, or a sample at serving scale. It is
  * collected to the driver (the audit is point-lookup-bound by
  * construction), so pass a bounded or sampled frame: the same
  * contract as every other point-lookup consumer.
  */
object OnlineFreshness {

  /** Per-key freshness rows: (key, present, last_us, lag_hours, stale).
    * `last_us` is the stored event time in µs (null when absent);
    * `lag_hours` the whole-hour lag behind the serving watermark;
    * `stale` fires for missing keys, for present keys with no usable
    * stored timestamp (null `last_us`), and for keys lagging more than
    * `slaHours` — coverage and freshness in one flag, separable via
    * `present`.
    */
  def audit(spark: SparkSession, store: OnlineStore, view: String,
      joinKeys: Seq[String], expectedKeys: DataFrame,
      slaHours: Long = 24L): DataFrame = {
    require(joinKeys.nonEmpty, "audit needs join keys")
    val keyRows = expectedKeys
      .select(joinKeys.map(col): _*).distinct().collect()
    val keyValues = keyRows.toSeq.map { r =>
      joinKeys.map(k => r.get(r.fieldIndex(k)))
    }
    // one pipelined multi-GET, not one round-trip per key
    val looked: Seq[(String, Long, Option[Long])] =
      keyValues.zip(store.getBatch(view, keyValues)).map { case (kv, vec) =>
        val us = vec
          .flatMap(v => Option(v.getOrElse("event_timestamp", null)))
          .collect { case t: java.sql.Timestamp =>
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          }
        // present = the KEY is in the store — a vector whose stored
        // event_timestamp is null (or not a Timestamp) is a FRESHNESS
        // failure (null last_us → stale below), not a coverage one;
        // conflating them would fire a false missing-key alarm for a
        // key the stream actually delivered
        (OnlineStore.encodeKey(kv), if (vec.isDefined) 1L else 0L, us)
      }
    import spark.implicits._
    val base = looked.toDF("key", "present", "last_us")
    // serving watermark over the audited rows — one unpartitioned window
    // on a frame that is key-domain-sized by contract
    val wm = max(col("last_us")).over(
      org.apache.spark.sql.expressions.Window.partitionBy())
    base
      .withColumn("__wm", wm)
      .select(col("key"), col("present"), col("last_us"),
        expr("(__wm - last_us) div 3600000000").as("lag_hours"),
        (col("present") === 0L || col("last_us").isNull ||
          expr("(__wm - last_us) div 3600000000") > slaHours)
          .cast("long").as("stale"))
  }
}
