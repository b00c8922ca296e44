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

  test("multi-view fold: colliding feature names, distinct join keys and TTLs") {
    // the reference's retrieval spans N feature views with different
    // join keys and TTLs; the LEFT-JOIN fold must keep the entity row
    // count and compute each view's argmax INDEPENDENTLY even though
    // every view names its feature identically ("value")
    def genFeatK(pool: Seq[String]): Gen[FeatRow] = for {
      k <- Gen.oneOf(pool)
      ts <- Gen.choose(0L, 100L)
      created <- Gen.choose(0L, 100L)
      v <- Gen.choose(0, 1000).map(_.toDouble)
    } yield FeatRow(k, ts, created, v)
    val genMulti = for {
      f0 <- Gen.listOfN(40, genFeatK(Seq("a", "b", "c")))
      f1 <- Gen.listOfN(40, genFeatK(Seq("a", "b", "c")))
      f2 <- Gen.listOfN(40, genFeatK(Seq("x", "y"))) // entity draws x,y,z: misses happen
      entities <- Gen.listOfN(15, for {
        u <- Gen.oneOf("a", "b", "c", "d")
        it <- Gen.oneOf("x", "y", "z")
        ts <- Gen.choose(0L, 120L)
      } yield (u, it, ts))
    } yield (Seq(f0, f1, f2), entities)
    val ttls: Seq[Option[Long]] = Seq(Some(24L), None, Some(48L))
    val viewKey = Seq("user", "user", "item")

    val prop = Prop.forAllNoShrink(genMulti) { case (featLists, entities) =>
      val dirBase = Files.createTempDirectory("graft_mvprop").toString
      val views = featLists.zipWithIndex.map { case (feats, i) =>
        val dir = s"$dirBase/f$i"
        feats.map(f => (f.key, t(f.ts), t(f.created), f.value))
          .toDF(viewKey(i), "event_ts", "created_ts", "value")
          .write.mode("overwrite").parquet(dir)
        FeatureView(s"fv$i", Seq(viewKey(i)), Seq(Feature("value", DoubleType)),
          SparkSource(s"s$i", dir, timestampField = "event_ts",
            createdTimestampColumn = Some("created_ts")),
          ttls(i).map(Duration.ofHours))
      }
      val fs = new FeatureStore(spark, RepoConfig("p"), new InMemoryRegistry)
      fs.applyObjects(
        Seq(Entity("user", Seq("user"), ValueType.STRING),
          Entity("item", Seq("item"), ValueType.STRING)) ++ views)

      val ent = entities.map { case (u, it, ts) => (u, it, t(ts)) }
        .toDF("user", "item", "event_timestamp")
      val out = fs.getHistoricalFeatures(ent,
          Seq("fv0:value", "fv1:value", "fv2:value")).toDf
        .select("user", "item", "event_timestamp",
          "fv0__value", "fv1__value", "fv2__value")
        .collect()
        .map(r => ((r.getString(0), r.getString(1), r.getTimestamp(2)),
          (0 to 2).map(i => Option(r.get(3 + i))).toSeq))

      def expected(feats: Seq[FeatRow], k: String, ets: Long,
          ttl: Option[Long]): Option[Double] = {
        val lower = ttl.map(ets - _).getOrElse(Long.MinValue)
        val elig = feats.filter(f => f.key == k && f.ts <= ets && f.ts >= lower)
        if (elig.isEmpty) None
        else Some(elig.maxBy(f => (f.ts, f.created, f.value)).value)
      }
      val countOk = out.length == entities.size
      val valuesOk = entities.distinct.forall { case (u, it, ts) =>
        val want = (0 to 2).map { i =>
          expected(featLists(i), if (viewKey(i) == "user") u else it, ts, ttls(i))
        }
        out.filter(_._1 == ((u, it, t(ts)))).forall(_._2 == want)
      }
      countOk && valuesOk
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(result.passed, result.status.toString)
  }
}
