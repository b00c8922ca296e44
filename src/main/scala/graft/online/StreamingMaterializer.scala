package graft.online

import graft.core.FeatureView
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Continuous materialization: keep the online store's latest vectors
  * fresh from a stream instead of re-running batch `materialize` windows
  * (the reference's cadence, `chicago_taxi_trips_hourly_gold
  * .ipynb:474-478`, re-reads the whole window each time).
  *
  * Per micro-batch: reduce the batch to latest-per-key with the same
  * argmax-by-struct as [[Materializer]], then upsert into the store.
  * Cross-batch freshness holds because upserts are per key and a later
  * batch's rows are (in event-time order under a watermark) newer; an
  * out-of-order row older than the stored vector is guarded by the
  * conditional merge in [[mergeLatest]].
  */
object StreamingMaterializer {

  /** Reduce one (micro-)batch to latest-per-key vectors. */
  def latestPerKey(
      batch: DataFrame, view: FeatureView, joinKeys: Seq[String]): DataFrame = {
    val tsField = view.source.timestampField
    val createdOpt = view.source.createdTimestampColumn
    val featNames = view.featureNames
    val orderCols =
      Seq(col(tsField).as("__ts")) ++
        createdOpt.map(c => col(c).as("__created")) ++
        featNames.zipWithIndex.map { case (f, i) => col(f).as(s"__v$i") }
    val grouped =
      if (joinKeys.isEmpty) batch.agg(max(struct(orderCols: _*)).as("__best"))
      else batch.groupBy(joinKeys.map(col): _*).agg(max(struct(orderCols: _*)).as("__best"))
    grouped.select(
      joinKeys.map(col) ++
        Seq(col("__best.__ts").as("event_timestamp")) ++
        featNames.zipWithIndex.map { case (f, i) => col(s"__best.__v$i").as(f) }: _*)
  }

  /** Upsert batch-latest vectors, keeping the stored vector when it is
    * newer (out-of-order protection across micro-batches) — delegates
    * to [[OnlineStore.upsertIfNewer]], so the in-memory/parquet stores
    * compare driver-side while [[KVClientOnlineStore]] merges
    * executor-parallel (a wide materialization window must never
    * collect to the driver). A null incoming timestamp never beats a
    * stored vector ([[OnlineStore.incomingWins]]).
    */
  def mergeLatest(
      store: OnlineStore, view: FeatureView, joinKeys: Seq[String],
      batchLatest: DataFrame): Unit =
    store.upsertIfNewer(view.name, joinKeys, batchLatest)

  /** Wire a streaming source to continuous online-store upserts. Caller
    * starts/stops the returned query writer.
    */
  def stream(
      spark: SparkSession,
      events: DataFrame, // streaming df with the view's columns
      store: OnlineStore,
      view: FeatureView,
      joinKeys: Seq[String],
      checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeLatest(store, view, joinKeys, latestPerKey(batch, view, joinKeys))
      }
}
