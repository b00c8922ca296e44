package graft.offline

import graft.SparkSpec
import graft.api.{FeatureStore, RepoConfig}
import graft.core._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.scalacheck.{Gen, Prop, Test => SCTest}

import java.nio.file.Files
import java.sql.Timestamp
import java.time.Duration

/** Property-based PIT invariants (SURVEY §5.2): for every output row the
  * joined feature is the argmax over (event_ts, created_ts) among
  * eligible rows (ts <= entity ts, within TTL), and row count equals the
  * entity row count.
  *
  * The oracle here is a driver-side brute force over the generated
  * fixture — independent of the Spark implementation under test.
  */
class PitPropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime

  private case class FeatRow(key: String, ts: Long, created: Long, value: Double)

  private val genFeat: Gen[FeatRow] = for {
    k <- Gen.oneOf("a", "b", "c")
    ts <- Gen.choose(0L, 100L)
    created <- Gen.choose(0L, 100L)
    v <- Gen.choose(0, 1000).map(_.toDouble)
  } yield FeatRow(k, ts, created, v)

  private val genCase = for {
    feats <- Gen.listOfN(40, genFeat)
    entities <- Gen.listOfN(15, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      ts <- Gen.choose(0L, 120L)
    } yield (k, ts))
    ttlHours <- Gen.oneOf(None, Some(24L), Some(48L))
  } yield (feats, entities, ttlHours)

  private def t(hours: Long) = new Timestamp(base + hours * 3600 * 1000)

  test("PIT join equals brute-force argmax oracle on random fixtures") {
    val prop = Prop.forAllNoShrink(genCase) { case (feats, entities, ttlHours) =>
      val dir = Files.createTempDirectory("graft_prop").toString + "/f"
      feats.map(f => (f.key, t(f.ts), t(f.created), f.value))
        .toDF("key", "event_ts", "created_ts", "value")
        .write.mode("overwrite").parquet(dir)

      val fs = new FeatureStore(spark, RepoConfig("p"), new InMemoryRegistry)
      fs.applyObjects(Seq(
        Entity("key", Seq("key"), ValueType.STRING),
        FeatureView("fv", Seq("key"), Seq(Feature("value", DoubleType)),
          SparkSource("s", dir, timestampField = "event_ts",
            createdTimestampColumn = Some("created_ts")),
          ttlHours.map(Duration.ofHours))))

      val ent = entities.map { case (k, ts) => (k, t(ts)) }
        .toDF("key", "event_timestamp")
      def run(coarse: Option[Long]) =
        fs.getHistoricalFeatures(ent, Seq("fv:value"),
          coarseBucketSeconds = coarse).toDf
          .select("key", "event_timestamp", "fv__value")
          .collect()
          .map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2))))
          .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).toSeq).toMap
      val got = run(None)

      // brute-force oracle
      def expected(k: String, ets: Long): Option[Double] = {
        val lower = ttlHours.map(ets - _).getOrElse(Long.MinValue)
        val elig = feats.filter(f =>
          f.key == k && f.ts <= ets && f.ts >= lower)
        if (elig.isEmpty) None
        else Some(elig.maxBy(f => (f.ts, f.created, f.value)).value)
      }

      val countOk = got.values.map(_.size).sum == entities.size
      val valuesOk = entities.distinct.forall { case (k, ts) =>
        val want = expected(k, ts)
        got((k, t(ts))).forall(_ == want)
      }
      // TTL-less coarse-bucket path must match the direct path exactly
      // (6h buckets deliberately misaligned with the hourly fixture grid)
      val coarseOk = ttlHours.nonEmpty || {
        val gc = run(Some(6 * 3600L))
        gc == got
      }
      countOk && valuesOk && coarseOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
