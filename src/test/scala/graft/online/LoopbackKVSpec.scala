package graft.online

import graft.SparkSpec
import graft.api.{FeatureStore, RepoConfig}
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetAddress, ServerSocket, Socket}
import java.sql.Timestamp
import java.util.Base64

/** SURVEY §2.8 M5/M6 over a REAL wire boundary (VERDICT r9 stretch):
  * a minimal line-protocol TCP KV server on loopback stands in for
  * Redis, and [[KVClientOnlineStore]] drives materialize → lookup
  * through sockets — executor-opened connections, pipelined putBatch
  * (all PUTs flushed before the OKs are drained), partial-batch upsert
  * semantics, all exercised across an actual network stack rather than
  * a simulated seam.
  */
class LoopbackKVSpec extends SparkSpec {
  import spark.implicits._
  import LoopbackKVSpec._

  test("materialize -> TCP server -> online lookup round-trips; putBatch pipelines on the wire") {
    val server = new LineKVServer()
    try {
      val port = server.port
      val store = new KVClientOnlineStore(() => new TcpKVClient(port))
      val featPath = {
        val dir = java.nio.file.Files.createTempDirectory("graft_tcp").toString + "/f"
        Seq(
          ("a", "2024-01-01 00:00:00", 1.0),
          ("a", "2024-01-05 00:00:00", 5.0),
          ("a", "2024-02-01 00:00:00", 99.0),
          ("b", "2024-01-03 00:00:00", 3.0)
        ).toDF("key", "s", "value")
          .select(col("key"), to_timestamp(col("s")).as("event_ts"), col("value"))
          .write.mode("overwrite").parquet(dir)
        dir
      }
      val fs = new FeatureStore(spark, RepoConfig("t"), new InMemoryRegistry, store)
      fs.applyObjects(Seq(
        Entity("key", Seq("key"), ValueType.STRING),
        FeatureView("fv", Seq("key"), Seq(Feature("value", DoubleType)),
          SparkSource("s", featPath, timestampField = "event_ts"))))
      fs.materialize(
        Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-01-31 00:00:00"), Seq("fv"))
      def lookup(key: String): Option[Any] =
        fs.getOnlineFeatures(Seq(Map("key" -> key)), Seq("fv:value"))
          .head.get("fv__value").filter(_ != null)
      assert(lookup("a") === Some(5.0))
      assert(lookup("b") === Some(3.0))
      assert(lookup("zz") === None)
      // the write crossed the wire in pipelined batches, one per
      // non-empty partition, not one round-trip per key
      assert(server.batchesSeen.get() >= 1 &&
        server.putsSeen.get() >= server.batchesSeen.get(),
        s"puts=${server.putsSeen.get()} batches=${server.batchesSeen.get()}")

      // partial-batch upsert over the socket: touched key replaced,
      // untouched keys keep serving
      store.upsert("fv", Seq("key"),
        Seq(("b", 20.0)).toDF("key", "value").repartition(2))
      assert(store.get("fv", Seq("b")).map(_("value")) === Some(20.0))
      assert(store.get("fv", Seq("a")).isDefined)

      // multiple executor connections: local[4] write of 4 partitions
      // opens one socket per non-empty partition + the driver client
      val df = (1 to 20).map(i => (s"k$i", i.toDouble)).toDF("key", "value")
        .repartition(4)
      val before = server.connectionsSeen.get()
      store.write("fv2", Seq("key"), df)
      assert(server.connectionsSeen.get() - before >= 2,
        "expected per-partition executor connections")
      (1 to 20).foreach { i =>
        assert(store.get("fv2", Seq(s"k$i")).map(_("value")) === Some(i.toDouble))
      }
    } finally server.close()
  }

  test("interleaved materialize windows on the TCP store: last event ts wins, order-independent") {
    val server = new LineKVServer()
    try {
      val port = server.port // closure must capture the port, not the server
      val store = new KVClientOnlineStore(() => new TcpKVClient(port))
      val featPath = {
        val dir = java.nio.file.Files.createTempDirectory("graft_tcp_rw").toString + "/f"
        Seq(
          ("a", "2024-01-02 00:00:00", 1.0),
          ("a", "2024-01-20 00:00:00", 7.0),
          ("b", "2024-01-04 00:00:00", 2.0),
          ("b", "2024-01-25 00:00:00", 9.0),
          ("c", "2024-01-06 00:00:00", 3.0)
        ).toDF("key", "s", "value")
          .select(col("key"), to_timestamp(col("s")).as("event_ts"), col("value"))
          .write.mode("overwrite").parquet(dir)
        dir
      }
      def view(name: String) = FeatureView(name, Seq("key"),
        Seq(Feature("value", DoubleType)),
        SparkSource("s", featPath, timestampField = "event_ts"))
      val full = (Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-01-31 00:00:00"))
      val oldWin = (Timestamp.valueOf("2024-01-01 00:00:00"),
        Timestamp.valueOf("2024-01-10 00:00:00"))
      def matLW(v: String, w: (Timestamp, Timestamp)): Unit =
        Materializer.materializeLatestWins(spark, store, view(v), Seq("key"),
          w._1, w._2)
      // newer window first, older re-run second (the regression hazard)
      matLW("fvA", full); matLW("fvA", oldWin)
      // older first, newer second (the natural order)
      matLW("fvB", oldWin); matLW("fvB", full)
      for (v <- Seq("fvA", "fvB"); (k, want) <- Seq("a" -> 7.0, "b" -> 9.0, "c" -> 3.0)) {
        assert(store.get(v, Seq(k)).map(_("value")) === Some(want),
          s"$v/$k must serve the latest-event vector regardless of window order")
      }
      // contrast: UNGUARDED materialize of the older window regresses
      // newer vectors — exactly why overlapping windows use latestWins
      Materializer.materialize(spark, store, view("fvA"), Seq("key"),
        oldWin._1, oldWin._2)
      assert(store.get("fvA", Seq("a")).map(_("value")) === Some(1.0))
    } finally server.close()
  }

  test("pipelined multi-GET drains ordered responses with misses interleaved") {
    val server = new LineKVServer()
    try {
      val port = server.port
      val client = new TcpKVClient(port)
      try {
        client.put("k1", Map("v" -> 1.0))
        client.put("k3", Map("v" -> 3.0))
        // one flush of three GETs, three responses in request order —
        // the middle miss must not desynchronize the stream
        val got = client.getBatch(Seq("k1", "nope", "k3"))
        assert(got.map(_.map(_("v"))) === Seq(Some(1.0), None, Some(3.0)))
      } finally client.close()
      // and the store-level surface rides the same pipeline
      val store = new KVClientOnlineStore(() => new TcpKVClient(port))
      import spark.implicits._
      store.write("fv", Seq("key"),
        Seq(("a", 1.5), ("b", 2.5)).toDF("key", "v"))
      assert(store.getBatch("fv", Seq(Seq("a"), Seq("zz"), Seq("b")))
        .map(_.map(_("v"))) === Seq(Some(1.5), None, Some(2.5)))
    } finally server.close()
  }
}

object LoopbackKVSpec {

  /** Line protocol: `PUT\t<key>\t<base64 java-serialized map>` → `OK`;
    * `GET\t<key>` → `VAL\t<base64>` | `NONE`. Thread-per-connection;
    * responses are written per request line, so a client that flushes N
    * PUTs before draining N OKs gets true pipelining.
    */
  final class LineKVServer extends AutoCloseable {
    private val data = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val putsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val batchesSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val connectionsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    private val ss = new ServerSocket(0, 32, InetAddress.getLoopbackAddress)
    def port: Int = ss.getLocalPort
    private val acceptor = new Thread(() => {
      try while (!ss.isClosed) {
        val sock = ss.accept()
        connectionsSeen.incrementAndGet()
        new Thread(() => serve(sock)).start()
      } catch { case _: Exception => () } // closed
    })
    acceptor.setDaemon(true)
    acceptor.start()

    private def serve(sock: Socket): Unit = {
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, "UTF-8"))
      val out = new PrintWriter(sock.getOutputStream, true)
      var inBatch = false
      try {
        var line = in.readLine()
        while (line != null) {
          line.split("\t", 3) match {
            case Array("PUT", k, v) =>
              data.put(k, v); putsSeen.incrementAndGet()
              if (!inBatch) { batchesSeen.incrementAndGet(); inBatch = true }
              out.println("OK")
            case Array("GET", k) =>
              inBatch = false
              Option(data.get(k)) match {
                case Some(v) => out.println(s"VAL\t$v")
                case None => out.println("NONE")
              }
            case _ => out.println("ERR")
          }
          line = in.readLine()
        }
      } catch { case _: Exception => () } finally sock.close()
    }

    override def close(): Unit = ss.close()
  }

  /** Socket client for [[LineKVServer]]; the factory closure captures
    * only the port (serializable), each partition opens its own
    * connection. putBatch flushes every PUT before draining the OKs —
    * the pipelining a networked client owes the write path.
    */
  final class TcpKVClient(port: Int) extends KVClient {
    private val sock = new Socket(InetAddress.getLoopbackAddress, port)
    private val out = new PrintWriter(sock.getOutputStream, true)
    private val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, "UTF-8"))

    private def enc(m: Map[String, Any]): String = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(m); oos.close()
      Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    private def dec(s: String): Map[String, Any] =
      new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(
        Base64.getDecoder.decode(s))).readObject().asInstanceOf[Map[String, Any]]

    override def put(key: String, vector: Map[String, Any]): Unit = {
      out.println(s"PUT\t$key\t${enc(vector)}")
      require(in.readLine() == "OK", "put failed")
    }
    override def putBatch(entries: Iterator[(String, Map[String, Any])]): Unit = {
      var n = 0
      entries.foreach { case (k, v) =>
        out.println(s"PUT\t$k\t${enc(v)}"); n += 1
      }
      (1 to n).foreach(_ => require(in.readLine() == "OK", "pipelined put failed"))
    }
    override def get(key: String): Option[Map[String, Any]] = {
      out.println(s"GET\t$key")
      in.readLine() match {
        case s if s != null && s.startsWith("VAL\t") => Some(dec(s.substring(4)))
        case _ => None
      }
    }
    // pipelined multi-GET: flush every request, then drain the responses
    // in order (the putBatch device on the read path)
    override def getBatch(keys: Seq[String]): Seq[Option[Map[String, Any]]] = {
      keys.foreach(k => out.println(s"GET\t$k"))
      keys.map { _ =>
        in.readLine() match {
          case s if s != null && s.startsWith("VAL\t") => Some(dec(s.substring(4)))
          case _ => None
        }
      }
    }
    override def close(): Unit = sock.close()
  }
}
