package graft.online

import org.apache.spark.sql.{DataFrame, Row}

/** Client contract for a networked KV online store (Redis, Cassandra,
  * DynamoDB, …): one instance is opened PER PARTITION on the executors
  * during writes (amortizing connection setup over the batch, the same
  * reason the reference's Redis sink pipelines per connection) and one
  * on the driver for point lookups. Implementations wrap their client
  * library here; values are the feature vectors as name→value maps —
  * bring your own wire encoding (the reference uses proto-serialized
  * values in Redis, `station_reads_hourly_fs/feature_store.yaml:6-8`).
  */
trait KVClient extends AutoCloseable {
  def put(key: String, vector: Map[String, Any]): Unit
  def get(key: String): Option[Map[String, Any]]

  /** Bulk upsert of one partition's vectors. Default = per-key [[put]]s;
    * networked implementations should override to pipeline (Redis
    * MULTI/pipe, Cassandra batch): at billions of keys per
    * materialization window, one round-trip PER KEY — not per batch —
    * is what dominates the write path.
    */
  def putBatch(entries: Iterator[(String, Map[String, Any])]): Unit =
    entries.foreach { case (k, v) => put(k, v) }

  /** Bulk lookup. Default = per-key [[get]]s; networked implementations
    * should override to pipeline (flush every GET, then drain the
    * responses — the [[putBatch]] device on the read path): an audit
    * enumerating thousands of expected keys pays one round-trip total,
    * not one per key.
    */
  def getBatch(keys: Seq[String]): Seq[Option[Map[String, Any]]] =
    keys.map(get)
}

/** Executor-parallel [[OnlineStore]] over any [[KVClient]]: `write`
  * streams every partition through its own client connection via
  * `foreachPartition` — no driver collect, no whole-table rewrite; the
  * materialized batch flows executor→store directly, which is the only
  * write path that holds up when a materialization window covers
  * billions of keys. Point lookups (`get`) use a lazily opened
  * driver-side client and never touch the cluster (M6 semantics).
  *
  * `clientFactory` must be serializable (it ships in the task closure);
  * capture connection strings, not live clients.
  *
  * Per-key puts make the default partial-batch [[upsert]] (= [[write]])
  * correct: keys absent from the batch keep their previous vectors.
  */
final class KVClientOnlineStore(clientFactory: () => KVClient)
    extends OnlineStore with Serializable {

  @transient private lazy val driverClient: KVClient = clientFactory()

  // the view rides through the same escaped encoding as the key values:
  // a bare `view + "/" + encoded` separator is not injective (view "a"
  // with key "b/c" collides with view "a/b" with key "c" — one view's
  // write could silently clobber another's vector)
  private def fullKey(view: String, keyValues: Seq[Any]): String =
    OnlineStore.encodeKey(view +: keyValues)

  override def write(view: String, keyColumns: Seq[String], df: DataFrame): Unit = {
    val featureCols = df.columns.filterNot(keyColumns.contains)
    val factory = clientFactory // avoid serializing `this`
    df.foreachPartition { rows: Iterator[Row] =>
      val client = factory()
      try client.putBatch(rows.map { row =>
        val key = OnlineStore.encodeKey(
          view +: keyColumns.map(k => row.get(row.fieldIndex(k))))
        key -> featureCols.map(c => c -> row.get(row.fieldIndex(c))).toMap
      }) finally client.close()
    }
  }

  /** Executor-parallel conditional merge: each partition opens its own
    * client, pipelines ONE bulk GET of the chunk's stored vectors,
    * filters to the rows that win ([[OnlineStore.incomingWins]]), and
    * pipelines the PUTs — the materialize-window path stays
    * executor→store with NO driver collect, which is the
    * billions-of-keys contract of this store (the trait's driver-side
    * default would cap the window at driver memory). Chunked so each
    * partition's GET/PUT pipeline depth stays bounded.
    */
  override def upsertIfNewer(view: String, keyColumns: Seq[String],
      df: DataFrame, tsCol: String = "event_timestamp"): Unit = {
    val featureCols = df.columns.filterNot(keyColumns.contains)
    val factory = clientFactory // avoid serializing `this`
    df.foreachPartition { rows: Iterator[Row] =>
      val client = factory()
      try rows.grouped(1024).foreach { chunk =>
        val keys = chunk.map(row => OnlineStore.encodeKey(
          view +: keyColumns.map(k => row.get(row.fieldIndex(k)))))
        val stored = client.getBatch(keys)
        client.putBatch(
          chunk.zip(keys).zip(stored).iterator.collect {
            case ((row, key), vec) if OnlineStore.incomingWins(
                Option(row.getAs[java.sql.Timestamp](tsCol)),
                vec.flatMap(v => Option(v.getOrElse(tsCol, null))).collect {
                  case t: java.sql.Timestamp => t
                }) =>
              key -> featureCols.map(c =>
                c -> row.get(row.fieldIndex(c))).toMap
          })
      } finally client.close()
    }
  }

  override def get(view: String, keyValues: Seq[Any]): Option[Map[String, Any]] =
    driverClient.get(fullKey(view, keyValues))

  override def getBatch(view: String,
      keys: Seq[Seq[Any]]): Seq[Option[Map[String, Any]]] =
    driverClient.getBatch(keys.map(fullKey(view, _)))
}
