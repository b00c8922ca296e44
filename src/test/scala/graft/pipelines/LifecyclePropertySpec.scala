package graft.pipelines

import graft.SparkSpec
import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the round-13 lifecycle surfaces: the video
  * demuxer's degrade contract under arbitrary corruption, and the
  * manifest merge law under arbitrary slicings.
  */
class LifecyclePropertySpec extends SparkSpec {
  import spark.implicits._

  test("demuxVideo never throws: arbitrary bytes and corrupted containers degrade to None or parse") {
    val genGarbage: Gen[Array[Byte]] =
      Gen.choose(0, 64).flatMap(n =>
        Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))
    val genCorrupted: Gen[Array[Byte]] = for {
      id <- Gen.choose(0L, 239L)
      mode <- Gen.choose(0, 2)
      pos <- Gen.choose(0, 200)
      flip <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield {
      val good = Multimodal.syntheticVideo(id, 60)
      mode match {
        case 0 => good.take(math.min(pos, good.length)) // truncate
        case 1 => // flip one byte somewhere in the header/frame table
          val b = good.clone(); b(pos % good.length) = flip; b
        case _ => good ++ Array.fill(pos % 7 + 1)(flip) // trailing junk
      }
    }
    val prop = Prop.forAllNoShrink(Gen.oneOf(genGarbage, genCorrupted)) { bytes =>
      // the contract: parse fully or degrade to None — NEVER throw.
      // (A flipped byte inside a PNG payload may still demux — the
      // per-frame decode degrades downstream — but the container walk
      // itself must be total.)
      Multimodal.demuxVideo(bytes) match {
        case None => true
        case Some(frames) => frames.forall(_ != null)
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("drift monitor on an EMPTY arrival: well-defined Laplace PSI, no crash, state still written") {
    val root = java.nio.file.Files.createTempDirectory("drift-empty-").toString
    try {
      TrainingDataPipeline.driftIncrement(
        Seq((0L, "x" * 100), (1L, "x" * 200)).toDF("doc_id", "text"),
        "text", root, 0L).collect()
      val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      val curve = TrainingDataPipeline.driftIncrement(empty, "text", root, 1L)
        .collect()
      // an empty increment's smoothed distribution is exactly uniform
      // (Laplace: every q_i = 1/nBuckets), so the PSI is a well-defined
      // REAL number — NULLs would NPE any consumer reading the drift
      // flag (r18 deferred #2). The monitor does not crash, and the
      // batch's (empty) histogram partition still lands so later
      // arrivals' `batch < b` reads stay consistent
      assert(curve.length === 16)
      assert(curve.forall(r => !r.isNullAt(5) && !r.isNullAt(6)),
        "psi_cum/drift must be well-defined on an empty arrival")
      assert(new java.io.File(s"$root/lenhist/batch=1").exists)
      // and the NEXT arrival still computes a real PSI against batch 0
      val next = TrainingDataPipeline.driftIncrement(
        Seq((2L, "x" * 100), (3L, "x" * 200)).toDF("doc_id", "text"),
        "text", root, 2L)
        .agg(max(col("psi_cum"))).head
      assert(!next.isNullAt(0), "recovery arrival must see a real reference")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("digest canonical rendering is injective over adversarial alphabets (property)") {
    // the r19 length-prefix fix, generalized: for ANY two distinct
    // 2-column rows drawn from an alphabet stacked with the rendering's
    // own metacharacters ('|' separator, ':' prefix delimiter, '<NULL>'
    // token, digits) — including NULLs — the digests differ. A
    // rendering collision would be an md5-input collision, so equal
    // digests ⇔ the canonical strings collided (md5 collisions are not
    // constructible from these tiny strings).
    val token: Gen[String] = Gen.oneOf(
      Gen.const("<NULL>"), Gen.const(""), Gen.const("|"), Gen.const(":"),
      Gen.choose(0, 99).map(_.toString),
      Gen.listOfN(3, Gen.oneOf('a', 'b', '|', ':', '1')).map(_.mkString))
    val cell: Gen[Option[String]] =
      Gen.option(Gen.listOf(token).map(_.mkString))
    val row: Gen[(Option[String], Option[String])] = Gen.zip(cell, cell)
    def dig(r: (Option[String], Option[String])): String =
      CorpusManifest.frameDigest(Seq(r).toDF("x", "y"), "t")
        .head.getString(2)
    val prop = Prop.forAllNoShrink(row, row) { (a, b) =>
      a == b || dig(a) != dig(b)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }

  test("manifest merge law: any 2-slicing of any corpus folds to the one-shot manifest") {
    val genDoc = for {
      id <- Gen.choose(0L, 500L)
      len <- Gen.choose(0, 40)
      text <- Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString)
      src <- Gen.oneOf("web", "pdf", "txt")
    } yield (id, text, src)
    val genCase = for {
      n <- Gen.choose(1, 30)
      docs0 <- Gen.listOfN(n, genDoc)
      cut <- Gen.choose(0, n)
    } yield {
      // distinct ids (manifest ids are identities, duplicates are a
      // SEPARATE tamper story); arbitrary split point after a shuffle
      val docs = docs0.distinctBy(_._1)
      (docs, docs.splitAt(math.min(cut, docs.size)))
    }
    val prop = Prop.forAllNoShrink(genCase) { case (all, (s1, s2)) =>
      val whole = CorpusManifest.manifest(
        all.toDF("doc_id", "text", "source"), Seq("source"), "doc_id", "text")
        .collect().map(_.toSeq).toSet
      def m(s: Seq[(Long, String, String)]) = CorpusManifest.manifest(
        s.toDF("doc_id", "text", "source"), Seq("source"), "doc_id", "text")
      val merged =
        CorpusManifest.mergeManifests(m(s1), m(s2), Seq("source"))
          .collect().map(_.toSeq).toSet
      merged == whole
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }
}
