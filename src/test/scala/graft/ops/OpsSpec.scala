package graft.ops

import graft.SparkSpec
import graft.functions.{SimHash64, functions => gf}
import org.apache.spark.sql.functions._

/** Dedup / similarity / text / multimodal operator specs, including
  * planted near-duplicates (the synthetic corpus has none) and recall of
  * the approximate paths against exact baselines.
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(sf0001)
  private object Tables {
    def load(dir: String) = graft.Tables.load(spark, dir, "documents")
  }

  test("exact dedup finds planted copies and keeps min id") {
    val base = Seq(
      (1L, "alpha beta gamma"),
      (2L, "  alpha   beta gamma "), // whitespace-normalized copy of 1
      (3L, "something else entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.exactDuplicates(base, "doc_id", "text")
      .orderBy("keeper_id")
      .select("keeper_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 2L), (3L, 1L)))
  }

  test("duplicate passages: hand-computed window counts on planted boilerplate") {
    // window=2 for a tractable hand check. Tokens per doc:
    //   d1: "a b c d"   -> windows "a b", "c d"
    //   d2: "a b x"     -> windows "a b", "x"
    //   d3: "x y"       -> windows "x y"
    //   d4: "a b a b"   -> windows "a b", "a b" (intra-doc repeat counts)
    // corpus counts: "a b"=4, "c d"=1, "x"=1, "x y"=1
    val df = Seq(
      (1L, "a b c d"), (2L, "a b x"), (3L, "x y"), (4L, "a b a b")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatePassages(df, "doc_id", "text", window = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 0L), (4L, 2L, 2L)))
    // whitespace-only docs emit no passages — two blank docs must NOT
    // mark each other as 100%-duplicated boilerplate
    val withBlanks = df.unionByName(
      Seq((5L, ""), (6L, "   ")).toDF("doc_id", "text"))
    val ids = Dedup.duplicatePassages(withBlanks, "doc_id", "text", window = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 3L, 4L))
  }

  test("minhash LSH surfaces planted near-duplicates") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = t1.replace("today", "tomorrow") // one-token change → near dup
    val t3 = "completely different content with no overlap whatsoever in shingles at all"
    val df = Seq((1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental LSH dedup: index dups, in-batch dups, and uniques classified") {
    val t1 = "the quick brown fox jumps over the lazy dog again and again today"
    val t2 = t1.replace("today", "tomorrow") // near dup of the indexed t1
    val t3 = "completely different content with no overlap whatsoever in shingles at all"
    val t4 = t3.replace("all", "any") // near dup WITHIN the batch (of t3)
    val t5 = "yet another fully distinct document about spark catalyst plans and codegen"
    val index = Seq((100L, t1)).toDF("doc_id", "text")
    val batch = Seq((1L, t2), (2L, t3), (3L, t4), (4L, t5)).toDF("doc_id", "text")
    val idxBands = Dedup.lshBands(
      Dedup.minhashSignaturesFused(index, "doc_id", "text"), "doc_id")
    val got = Dedup.incrementalLshDedup(batch, idxBands, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((1L, 0L, 0L)), s"t2 must be a dup of the index: $got")
    assert(got(2L) === ((0L, 0L, 1L)), s"t3 is the batch keeper: $got")
    assert(got(3L) === ((0L, 1L, 0L)), s"t4 collides with smaller-id t3: $got")
    assert(got(4L) === ((0L, 0L, 1L)), s"t5 is unique: $got")
  }

  test("cluster-safe split: no near-dup pair straddles splits; singletons match the plain hash split") {
    val d = graft.Tables.load(spark, sf0001, "documents")
    val split = Dedup.clusterSafeSplit(d, "doc_id", "text")
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text")
    // the leakage invariant this operator exists for
    val crossSplit = pairs
      .join(split.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(split.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .filter(col("sa") =!= col("sb")).count()
    assert(crossSplit === 0L, s"$crossSplit near-dup pairs straddle splits")
    // every cluster lands in exactly one split
    val multiSplit = split.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(multiSplit === 0L)
    // docs in no near-dup pair keep the q43 per-doc assignment (the
    // operator only moves docs whose leakage status demands it)
    val inPairs = pairs.select(col("a").as("doc_id"))
      .union(pairs.select(col("b").as("doc_id"))).distinct()
    val mismatch = split.join(inPairs, Seq("doc_id"), "left_anti")
      .join(graft.ops.Corpus.hashSplit(d, "doc_id")
        .withColumnRenamed("split", "plain"), "doc_id")
      .filter(col("split") =!= col("plain")).count()
    assert(mismatch === 0L)
  }

  test("ngram containment flags a doc-plus-boilerplate subset that jaccard understates") {
    // doc 2 = doc 1 plus a long boilerplate tail: containment of 1 in 2
    // is 1.0 while jaccard is diluted below any dedup threshold
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta one two three four five six seven " +
        "eight nine ten eleven twelve"),
      (3L, "totally unrelated content here")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val sh = Dedup.shingleSet(d, "doc_id", "text")
    val got = Dedup.ngramContainment(pairs, sh, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getLong(7)))).toMap
    // doc1: 2 shingles, both inside doc2 (16 tokens -> 14 shingles)
    assert(got((1L, 2L)) === ((2L, 2L, 14L, 1.0, 1L)))
    // jaccard on the same pair would be 2/14 ≈ 0.14 — far below 0.9
    assert(got((1L, 3L))._1 === 0L && got((1L, 3L))._5 === 0L)
  }

  test("ngram jaccard is 1.0 for identical docs and 0 for disjoint") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "x y z w v"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("a", "b")
    val got = Dedup.ngramJaccard(pairs, Dedup.shingleSet(df, "doc_id", "text"), "doc_id")
      .orderBy("b").select("jaccard").as[Double].collect().toSeq
    assert(got === Seq(1.0, 0.0))
  }

  test("ngramJaccardArrays equals ngramJaccardWithSizes byte-for-byte") {
    // the r22 candidate-scale formulation must replay the explode-join
    // verification exactly: overlapping, identical, disjoint (jaccard
    // 0 via the zero-common survival rule), and a pair whose side has
    // NO shingles (dropped by both formulations)
    val df = Seq(
      (1L, "a b c d e f"), (2L, "a b c d x y"), (3L, "p q r s t u"),
      (4L, "a b c d e f"), (5L, "ab")) // doc 5: no 3-gram shingles
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val sh = Dedup.shingleSet(df, "doc_id", "text")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    def m(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val oldForm = Dedup.ngramJaccardWithSizes(pairs, sh, sizes, "doc_id")
    val newForm = Dedup.ngramJaccardArrays(pairs, sh, "doc_id")
    assert(m(newForm) === m(oldForm),
      "array formulation must equal the explode-join verification")
    assert(oldForm.columns.toSeq === newForm.columns.toSeq)
    assert(newForm.count() === 3L, "pair with a shingle-less side drops")
  }

  test("centroid drift: identical halves cos 1, orthogonal halves cos 0, empty half NULL") {
    val df = Seq(
      (0L, Seq(1.0f, 2.0f, 3.0f), 1),
      (1L, Seq(1.0f, 2.0f, 3.0f), 1),
      (2L, Seq(-4.0f, 5.0f, 0.5f), 1),
      (3L, Seq(-4.0f, 5.0f, 0.5f), 1),
      (4L, Seq(1.0f, 0.0f, 0.0f), 2), // ref half only
      (6L, Seq(0.0f, 2.0f, 0.0f), 3), // orthogonal halves
      (7L, Seq(0.0f, 0.0f, 3.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = graft.ops.Similarity
      .centroidDrift(df, "label", "embedding", "vec_id")
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(got(1).getLong(1) === 2L && got(1).getLong(2) === 2L)
    assert(got(1).getDouble(3) === 1.0)
    assert(got(2).isNullAt(3), "empty current half must emit NULL, not error")
    assert(got(3).getDouble(3) === 0.0)
  }

  test("simhash16 of near-identical docs is close in hamming distance") {
    val t1 = (1 to 50).map(i => s"tok$i").mkString(" ")
    val t2 = t1 + " extra"
    val df = Seq((1L, t1), (2L, t2), (3L, "wholly other words entirely"))
      .toDF("doc_id", "text")
    val sig = Dedup.simhash16(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sig(1L), sig(2L)) <= 3)
    assert(ham(sig(1L), sig(3L)) > 3)
  }

  test("simhash hamming pairs == naive all-pairs; banding loses nothing at radius 3") {
    val t1 = (1 to 80).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, t1),
      (2L, t1),                       // exact copy -> hamming 0
      (3L, t1 + " tail"),             // near-dup -> small hamming
      (4L, "all different everything other entirely"),
      (5L, "yet another unrelated body of words here")
    ).toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(df, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    // naive all-pairs reference from the raw signatures
    val sigs = df.select(col("doc_id"),
        gf.simhash64(TextAnalysis.tokens(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSeq.sorted
    assert(got === naive)
    assert(got.contains((1L, 2L, 0)), "exact copy must surface at hamming 0")
    // the lossy hot-bucket valve stays a subset of the exact result
    val capped = Dedup.simhashHammingPairs(df, "doc_id", "text",
        maxHamming = 3, blockCap = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(capped.subsetOf(naive.toSet))
  }

  test("pqCodes: seed vectors self-assign with zero distortion; assignment matches driver-side argmin") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    val got = Similarity.pqCodes(emb, "vec_id", "embedding",
        nSub = 8, subDim = 8, nCentroids = 16)
      .collect().map(r => r.getLong(0) ->
        (((0 until 8).map(i => r.getLong(1 + i)), r.getLong(9)))).toMap
    // every codebook seed (vec_id < 16) is its own nearest centroid in
    // every subspace, at exactly zero quantization error
    (0L until 16L).foreach { id =>
      assert(got(id)._1.forall(_ == id), s"seed $id codes: ${got(id)._1}")
      assert(got(id)._2 === 0L, s"seed $id distortion: ${got(id)._2}")
    }
    // codes stay in the codebook range
    got.values.foreach { case (codes, d) =>
      assert(codes.forall(c => c >= 0L && c < 16L)); assert(d >= 0L)
    }
    // driver-side naive argmin reference on a few non-seed vectors
    val vecs = emb.filter(col("vec_id") < 40).orderBy("vec_id")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray).toMap
    val cents = (0L until 16L).map(i => i -> vecs(i)).toMap
    (16L until 40L).foreach { id =>
      val v = vecs(id)
      (0 until 8).foreach { m =>
        val best = (0L until 16L).minBy { c =>
          val d = (m * 8 until (m + 1) * 8).map { i =>
            val diff = v(i) - cents(c)(i); diff * diff
          }.sum
          (d, c)
        }
        assert(got(id)._1(m) === best, s"vec $id subspace $m")
      }
    }
  }

  test("pqAdcTopK: recall@10 vs exact integer-micros L2 beats random by an order of magnitude") {
    val emb = graft.Tables.load(spark, sf0001, "embeddings")
    // query ids DISJOINT from the codebook seeds 0..15 (recall-A/B rule)
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") <= 107)
    val adc = Similarity.pqAdcTopK(emb, queries, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    // exact L2 top-10 on the same integer-micros representation
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray).toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map { i => val d = a(i) - b(i); d * d }.sum
    val recalls = (100L to 107L).map { q =>
      val exact = vecs.keys.toSeq
        .sortBy(id => (l2(vecs(q), vecs(id)), id)).take(10).toSet
      (adc(q) & exact).size / 10.0
    }
    val avg = recalls.sum / recalls.size
    // random top-10 from a 500-vector corpus lands at 0.02; the first-16
    // stub codebook measures ~0.2 here — gate at 5x random so a
    // regression to chance fails while codebook-quality wiggle passes
    // (trained per-subspace k-means is the recall upgrade path, same
    // trade as IVF's kmeansCentroids opt-in)
    assert(avg >= 0.1, s"ADC recall collapsed toward random: $avg ($recalls)")
    // self-match sanity: a query's own code-cell should put it at rank 1
    // more often than not; at minimum every query retrieves 10 rows
    assert(adc.values.forall(_.size === 10))
  }

  test("knnLabelNoise flags a planted label flip and stays quiet on clean clusters") {
    val rnd = new scala.util.Random(3)
    // two tight, well-separated clusters of 12; vector 23 gets cluster
    // B's geometry but cluster A's LABEL — the planted mislabel
    def vec(center: Double): Seq[Float] =
      (0 until 8).map(_ => (center + rnd.nextGaussian() * 0.01).toFloat)
    val rows = (0L until 12L).map(i => (i, vec(1.0), 0)) ++
      (12L until 23L).map(i => (i, vec(-1.0), 1)) :+ ((23L, vec(-1.0), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnLabelNoise(df, "vec_id", "embedding", "label")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // label 0: 13 vectors, exactly the planted flip flagged confidently
    assert(got(0L) === ((13L, 1L, 1L)), s"label 0 audit: $got")
    // label 1: clean
    assert(got(1L) === ((11L, 0L, 0L)), s"label 1 audit: $got")
    // the pluggable neighbor source: an IVF leg whose 16 first-N cells
    // cover both clusters (seeds 0..15 span 12 A + 4 B vectors) must
    // reproduce the brute audit on this well-separated fixture — the
    // scale configuration changes the kNN leg, not the verdicts
    val ann = Similarity.knnLabelNoise(df, "vec_id", "embedding", "label",
        neighbors = (c, q, id, vec, k) =>
          Similarity.ivfTopK(c, q, id, vec, k, numCentroids = 16, nprobe = 4))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(ann === got, s"ANN-legged audit diverged: $ann vs $got")
  }

  test("hardNegatives excludes same-label neighbors however close, ranks the different-label frontier") {
    val rnd = new scala.util.Random(5)
    def vec(center: Double): Seq[Float] =
      (0 until 8).map(_ => (center + rnd.nextGaussian() * 0.01).toFloat)
    // anchor 0 and its same-label twin 1 sit at center 1.0; different-
    // label vectors at 0.9 (near) and -1.0 (far)
    val df = Seq(
      (0L, vec(1.0), 0), (1L, vec(1.0), 0),
      (2L, vec(0.9), 1), (3L, vec(0.9), 1), (4L, vec(-1.0), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(df, df.filter(col("vec_id") === 0L),
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getLong(3))).toSeq
    // the same-label twin (rank-1 by raw cosine) must be absent;
    // near different-label vectors outrank the far one
    assert(!got.map(_._1).contains(1L), s"same-label twin leaked: $got")
    assert(got.map(_._1).toSet === Set(2L, 3L, 4L))
    assert(got.last._1 === 4L, s"far negative must rank last: $got")
    assert(got.forall(_._2 === 1L))
  }

  test("simhash64 expression: interpreted == codegen, near-dup property holds") {
    val t1 = (1 to 80).map(i => s"w$i").mkString(" ")
    val t2 = t1 + " tail"
    val df = Seq((1L, t1), (2L, t2), (3L, "all different everything other"))
      .toDF("id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val sig = df.select(col("id"), gf.simhash64(toks).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(SimHash64.hamming(sig(1L), sig(2L)) <= 6)
    assert(SimHash64.hamming(sig(1L), sig(3L)) > 10)
    // SQL registration path (forces a separate plan; both must agree)
    gf.registerAll(spark)
    df.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      "SELECT id, simhash64(split(trim(text), '\\\\s+')) s FROM sh_docs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql === sig)
  }

  test("rolling_hash matches a driver-side reference implementation") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val inputs = Seq("", "a", "abc", "hello world", "ünïcødé £ 中文")
    val got = inputs.toDF("s").select(gf.rolling_hash(col("s")))
      .as[Long].collect().toSeq
    assert(got === inputs.map(ref))
    // null-safety
    val n = Seq[Option[String]](None).toDF("s")
      .select(gf.rolling_hash(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("brute-force KNN: neighbors are genuinely top-k (spot-check vs local compute)") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val topk = Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    // local recompute
    val all = e.select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val q = all.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val want = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSeq
    assert(topk.map(_.getLong(1)).toSeq === want)
  }

  test("retrievalNdcg: perfect cluster retrieval scores 1, buried relevant scores < 1, lone label scores 0") {
    // two tight 3-clusters (labels 0/1) + one lone label-2 vector near
    // cluster 0: cluster members retrieve their 2 mates first (but the
    // lone intruder outranks nothing relevant -> still perfect at the
    // ideal R = min(k, 2)); the lone vector has NO relevant docs -> 0
    val vecs = Seq(
      (0L, Array(1.00f, 0.00f), 0), (1L, Array(0.99f, 0.01f), 0),
      (2L, Array(0.98f, 0.02f), 0),
      (3L, Array(0.00f, 1.00f), 1), (4L, Array(0.01f, 0.99f), 1),
      (5L, Array(0.02f, 0.98f), 1),
      (6L, Array(0.97f, 0.03f), 2))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = Similarity.retrievalNdcg(df, df, "vec_id", "embedding",
      "label", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val w = Similarity.ndcgWeightsMicro(2)
    // query 0: top-2 = (1, 2) both label 0 -> perfect
    assert(got(0L) === ((w.sum, 2L, 1.0)))
    // query 2 (0.98, 0.02): mate 1 at 0.59 deg still edges out the
    // label-2 intruder at 0.60 deg, but the intruder takes rank 2 from
    // mate 0 -> dcg = W1 only, idcg = W1+W2
    assert(got(2L) === ((w(0), 1L,
      math.floor(w(0).toDouble / w.sum * 1e6 + 0.5) / 1e6)))
    assert(got(2L)._3 < 1.0)
    // lone label: zero relevant in the corpus -> ndcg 0 by convention
    assert(got(6L) === ((0L, 0L, 0.0)))
    // cluster-1 members are unaffected by the intruder
    assert(Seq(3L, 4L, 5L).forall(q => got(q)._3 === 1.0))
  }

  test("IVF KNN recall@5 >= 0.6 vs brute force on the fixture") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    // query ids disjoint from the first-N centroid seeds (vec_id 0..15) —
    // otherwise the first-N path gets a free win (each query IS its own
    // centroid, so its bucket trivially holds its neighborhood)
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") < 120)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(e, queries, "vec_id", "embedding", 5,
      numCentroids = 16, nprobe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // trained centroids must match or beat the first-N stub at equal probes
    val trained = Similarity.ivfTopK(e, queries, "vec_id", "embedding", 5,
      numCentroids = 16, nprobe = 8,
      centroids = Some(Similarity.kmeansCentroids(e, "embedding", 16)))
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trainedHits = (exact & trained).size
    val firstNHits = (exact & approx).size
    val trainedRecall = trainedHits.toDouble / exact.size
    val recall = firstNHits.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
    // the trained path exists to BEAT the first-N stub at equal nprobe —
    // hold it to that, not just a floor (both sides are deterministic:
    // fixed fixture, seeded k-means)
    assert(trainedHits >= firstNHits,
      s"trained centroids ($trainedHits/${exact.size} hits) must match or beat " +
        s"first-N centroids ($firstNHits/${exact.size})")
    assert(trainedRecall >= 0.5, s"trained-IVF recall too low: $trainedRecall")
    // both paths are fully deterministic (fixed fixture, min-id ties,
    // seeded k-means|| init) — pin the exact hit counts so quality drift
    // in either path is loud, not silent
    assert((firstNHits, trainedHits) === ((77, 83)),
      s"recall hits moved: first-N=$firstNHits trained=$trainedHits (was 77/83)")
  }

  test("Lloyd-trained codebooks: IVF recall@10 >= 0.7, trained PQ-ADC beats the first-16 stub") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    // query ids disjoint from the Lloyd seeds 0..15 (recall-A/B rule)
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") < 120)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 10))
    // the q25b configuration: 16 trained cells, 3 integer Lloyd rounds,
    // nprobe 8 — trained-quality recall, not the 5x-random stub floor
    val lloyd = pairs(Similarity.ivfTopK(e, queries, "vec_id", "embedding", 10,
      numCentroids = 16, nprobe = 8,
      centroids = Some(Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3))))
    val lloydRecall = (lloyd & exact).size.toDouble / exact.size
    assert(lloydRecall >= 0.7, s"trained-IVF recall@10 $lloydRecall below 0.7")
    // the 100 TB configuration: training on a half-corpus sample via the
    // wired trainFilter parameter must stay near full-corpus quality
    val sampled = pairs(Similarity.ivfTopK(e, queries, "vec_id", "embedding", 10,
      numCentroids = 16, nprobe = 8,
      centroids = Some(Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3,
        trainFilter = Some(col("vec_id") % 2 === 0 || col("vec_id") < 16)))))
    val sampledRecall = (sampled & exact).size.toDouble / exact.size
    assert(sampledRecall >= 0.6,
      s"sample-trained IVF recall collapsed: $sampledRecall")
    // the q172b configuration: trained per-subspace codewords must beat
    // the first-16 stub at identical code budget (both deterministic —
    // pin the hit counts so quality drift is loud)
    val adcStub = pairs(Similarity.pqAdcTopK(e, queries, "vec_id", "embedding", k = 10))
    val adcTrained = pairs(Similarity.pqAdcTopK(e, queries, "vec_id", "embedding",
      k = 10, codebook = Some(Similarity.lloydPqCodebook(e, "vec_id", "embedding"))))
    val stubHits = (adcStub & exact).size
    val trainedHits = (adcTrained & exact).size
    assert(trainedHits > stubHits,
      s"trained PQ codebook must beat the stub: $trainedHits vs $stubHits of ${exact.size}")
    assert((stubHits, trainedHits) === ((32, 45)),
      s"ADC recall hits moved: stub=$stubHits trained=$trainedHits (was 32/45)")
  }

  test("ivfProbeSweep degenerates cleanly to a single probe budget of 1") {
    // the keep==1 argmax branch must still emit crank for keepRank
    // callers (ADVICE r10) — nprobes=Seq(1) used to throw unresolved-
    // column on crank
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val one = Similarity.ivfProbeSweep(e,
      e.filter(col("vec_id") >= 100 && col("vec_id") < 110),
      "vec_id", "embedding", k = 5, numCentroids = 16, nprobes = Seq(1))
      .collect()
    assert(one.length == 1 && one.head.getLong(0) == 1L)
    // and the single-budget row must agree with the nprobe=1 row of the
    // multi-budget sweep (shared-scoring-pass losslessness)
    val multi = Similarity.ivfProbeSweep(e,
      e.filter(col("vec_id") >= 100 && col("vec_id") < 110),
      "vec_id", "embedding", k = 5, numCentroids = 16, nprobes = Seq(1, 4))
      .filter(col("nprobe") === 1L).collect()
    assert(one.map(_.toSeq).toSeq === multi.map(_.toSeq).toSeq)
  }

  test("scalarQuantize: step-aligned components reconstruct exactly; error bounded by the step") {
    // per-dim micros spanning exactly [0, 255]: code == q - mn, so the
    // affine roundtrip is lossless and total_sq_err must be 0
    val exactRows = (0 until 16).map { i =>
      (i.toLong, Array.fill(4)((i * 17) / 1e6).map(_.toFloat).toSeq)
    }
    val exact = Similarity.scalarQuantize(
      exactRows.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect()
    assert(exact.forall(_.getLong(2) === 0L),
      s"step-aligned inputs must quantize losslessly: ${exact.mkString(",")}")
    // general inputs: per-dim error can't exceed the quantization step
    // (range/255 + 1 micros), so total_sq_err <= dims * step^2
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val got = Similarity.scalarQuantize(e, "vec_id", "embedding").collect()
    val comps = e.collect().map(r => r.getSeq[Float](1)
      .map(v => math.floor(v.toDouble * 1e6 + 0.5).toLong).toArray)
    val steps = (0 until 64).map { d =>
      val vals = comps.map(_(d)); (vals.max - vals.min) / 255 + 1
    }
    val bound = steps.map(s => s * s).sum
    assert(got.forall(_.getLong(2) <= bound),
      s"reconstruction error beyond the step bound $bound")
  }

  test("lateInteractionTopK: token-swapped content scores as a perfect match — the pooled-cosine blind spot") {
    // query q = [t1 | t2]; a = [t2 | t1] (same tokens, swapped order);
    // b shares no token. MaxSim finds each query token's twin wherever
    // it sits, so a's score equals the self-match dot sum and a >> b.
    val t1 = Seq(1.0f, 0.0f); val t2 = Seq(0.0f, 1.0f)
    val df = Seq(
      (0L, t1 ++ t2), (1L, t2 ++ t1), (2L, Seq(-1.0f, 0.0f, 0.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.lateInteractionTopK(df, df.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 2, nTok = 2, tokDim = 2)
      .orderBy("rank").collect()
    assert(got.head.getLong(1) === 1L, s"swapped twin must rank first: ${got.toSeq}")
    // exact int64 maxsim of the twin = 2 tokens x (1e6)^2 self dots
    assert(got.head.getLong(3) === 2L * 1000000L * 1000000L)
  }

  test("rrfFusePerQuery: a both-legs candidate outranks single-leg rank-1 candidates") {
    // weights: 2 legs at rank 2 -> 2*(1e6 div 62) = 32258 beats one
    // leg's rank 1 -> 1e6 div 61 = 16393
    val legA = Seq((1L, 10L, 1L), (1L, 30L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val legB = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val fused = Similarity.rrfFusePerQuery(Seq(legA, legB), k = 3)
      .orderBy("rank").collect()
    assert(fused.head.getLong(1) === 30L, s"consensus must win: ${fused.toSeq}")
    assert(fused.head.getLong(3) === 2L && fused.head.getLong(4) === 32258L)
    assert(fused.map(_.getLong(1)).toSeq === Seq(30L, 10L, 20L))
  }

  test("lloydTrainingCurve: full assignment every round; training reduces distortion from the raw seeds") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val curve = Similarity.lloydTrainingCurve(e, "vec_id", "embedding", 16, 3)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(curve.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(curve.forall(_._2 === 500L), s"every vector assigned each round: ${curve.toSeq}")
    // round 1 measures the first-16 RAW seeds; later rounds measure
    // trained integer means — strictly better on this fixture
    assert(curve(1)._3 < curve(0)._3 && curve(2)._3 <= curve(1)._3,
      s"training must reduce distortion: ${curve.toSeq}")
  }

  test("salted two-phase top-k equals the single-window ranking") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val q = e.filter(col("vec_id") < 10)
    def rows(numSalts: Int) =
      Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5, numSalts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSet
    // bucket winners always contain the global winners, and the final
    // window re-ranks under the same total order — any salt count gives
    // the identical result set
    assert(rows(7) === rows(1))
    assert(rows(16) === rows(1))
  }

  test("blockedCosinePairs blockCap bounds pair generation per block") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), "b"), (2L, Array(0.0f, 1.0f), "b"),
      (3L, Array(1.0f, 1.0f), "b"), (4L, Array(1.0f, 2.0f), "b"),
      (5L, Array(2.0f, 1.0f), "b"), (6L, Array(3.0f, 1.0f), "b")
    ).toDF("id", "vec", "block")
    val pairs = Similarity.blockedCosinePairs(df, "id", "vec", "block",
      threshold = -2.0, numSalts = 2, blockCap = Some(3))
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the 3 smallest ids participate: C(3,2) pairs, none involving 4..6
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("semanticDedup drops the higher id of near-dup pairs within clusters only") {
    // centroids = first 2 ids: (1,0) and (0,1). Cluster 1 = {1,3,4},
    // cluster 2 = {2,5,6}. At threshold 0.999 only the exact duplicates
    // (4 of 1, 6 of 2) cross it; 3 and 5 are near but kept.
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.99f, 0.1f)), (4L, Array(1.0f, 0.0f)),
      (5L, Array(0.1f, 0.99f)), (6L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.999, numCentroids = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> (1L, 1L), 3L -> (1L, 1L), 4L -> (1L, 0L),
      2L -> (2L, 1L), 5L -> (2L, 1L), 6L -> (2L, 0L)))
    // cross-cluster exact duplicates are NOT caught (clustering is the
    // approximation boundary, as in SemDeDup) — verify the scope contract:
    // identical vectors in different clusters both survive
    val split = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 1.0f))) // dup of 2; centroid set = {1, 2}
      .toDF("vec_id", "embedding")
    val keptSplit = Similarity.semanticDedup(split, "vec_id", "embedding",
      threshold = 0.999, numCentroids = 2)
      .filter(col("kept") === 1L).count()
    assert(keptSplit === 2L) // 1 and 2 survive; 3 dropped within cluster 2
  }

  test("semanticDedup: trained k-means centroids and blockCap paths") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val firstN = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.15, numCentroids = 16)
    val total = e.count()
    assert(firstN.count() === total) // one decision per vector, total
    val trained = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.15,
      centroids = Some(Similarity.kmeansCentroids(e, "embedding", 16)))
    assert(trained.count() === total)
    // Both paths are deterministic (fixture + seeded k-means), so pin the
    // exact drop counts — quality drift in either becomes loud. Note the
    // counts are NOT ordered by "trained is better": duplicate discovery
    // is scoped to within-cluster pairs, so the skewed first-N clusters
    // (fewer, larger) examine MORE pairs and surface more drops than the
    // balanced trained clusters — the classic SemDeDup recall-vs-pair-
    // budget tradeoff, not a quality signal.
    val dropsFirstN = firstN.filter(col("kept") === 0L).count()
    val dropsTrained = trained.filter(col("kept") === 0L).count()
    assert((dropsFirstN, dropsTrained) === ((474L, 448L)),
      s"semanticDedup drop counts moved: first-N=$dropsFirstN trained=$dropsTrained (was 474/448)")
    // blockCap bounds the per-cluster pair work; decisions for uncapped
    // members are unchanged, truncated members always survive
    val capped = Similarity.semanticDedup(e, "vec_id", "embedding",
      threshold = 0.15, numCentroids = 16, blockCap = Some(10))
    assert(capped.count() === total)
    val cappedDrops = capped.filter(col("kept") === 0L).count()
    assert(cappedDrops <= dropsFirstN)
  }

  test("fixture contract: documents.text is oracle-parity-safe") {
    // The text oracles rely on text being non-null, non-blank, and free
    // of leading/trailing or non-space whitespace (see OpsQueries
    // scaladoc). Enforce it here so a regenerated fixture that breaks
    // the contract fails loudly instead of silently diverging the gate.
    Seq(graft.SparkSpec.session).foreach { s =>
      Seq(sf0001, "/root/testdata/sf0.01").foreach { dir =>
        val d = graft.Tables.load(s, dir, "documents")
        assert(d.filter(col("text").isNull).count() === 0, s"$dir: null text")
        assert(d.filter(trim(col("text")) === "").count() === 0, s"$dir: blank text")
        assert(d.filter(col("text").rlike("^\\s|\\s$")).count() === 0,
          s"$dir: leading/trailing whitespace")
        assert(d.filter(col("text").rlike("[\\t\\n\\r\\x0b\\f]")).count() === 0,
          s"$dir: non-space whitespace")
        // q29's map-flatten oracle assumes props is the single-key
        // {"k": N} shape; q26's oracle inlines hyperplanes of length 64
        val ev = graft.Tables.load(graft.SparkSpec.session, dir, "events")
        assert(ev.filter(!col("props").rlike("^\\{\"k\": -?\\d+\\}$")).count() === 0,
          s"$dir: props shape changed — q29 oracle must be regenerated")
        val emb = graft.Tables.load(graft.SparkSpec.session, dir, "embeddings")
        assert(emb.filter(size(col("embedding")) =!= graft.OpsQueries.EmbeddingDim)
          .count() === 0,
          s"$dir: embedding dim != ${graft.OpsQueries.EmbeddingDim} — q26 planes must be regenerated")
      }
    }
  }

  test("pii scrub redacts planted emails and phone numbers") {
    val planted = Seq(
      (1L, "contact alice.smith+x@example.co.uk or 555-123-4567 today"),
      (2L, "two mails a@b.io c@d.org and 555 987 6543 plus 555.111.2222"),
      (3L, "no pii here at all")).toDF("doc_id", "text")
    val got = planted.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"),
        lit(TextAnalysis.EmailPattern), lit(0))).as("ne"),
      size(regexp_extract_all(col("text"),
        lit(TextAnalysis.PhonePattern), lit(0))).as("np"),
      TextAnalysis.redactPii(col("text")).as("red"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(got(0) === ((1L, 1, 1,
      "contact [EMAIL] or [PHONE] today")))
    assert(got(1) === ((2L, 2, 2,
      "two mails [EMAIL] [EMAIL] and [PHONE] plus [PHONE]")))
    assert(got(2)._4 === "no pii here at all")
  }

  test("repetition ratio is high for degenerate docs and 0 for all-unique shingles") {
    val planted = Seq(
      (1L, "spam spam spam spam spam spam"),  // 4 identical shingles
      (2L, "all words here are unique now")).toDF("doc_id", "text")
    val out = Dedup.shingleBag(planted, "doc_id", "text")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("shingle")).as("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((4L, 1L)))
    assert(out(2L) === ((4L, 4L)))
  }

  test("sequence packing: per-source contiguous packs within token budget") {
    val packed = graft.OpsQueries.seqPacking(spark, sf0001).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // pack ids start at 0 and are non-decreasing in id order
      assert(ordered.head._4 === 0L)
      assert(ordered.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      // definitional invariant: pack = floor(prefix-tokens / cap)
      var prefix = 0L
      ordered.foreach { case (_, _, nTok, pack) =>
        assert(pack === prefix / 2048L, s"pack mismatch at prefix=$prefix")
        prefix += nTok
      }
      // pack count is within one of the ideal bin count
      assert(ordered.map(_._4).distinct.size <= prefix / 2048L + 1)
    }
  }

  test("stratified sample: exactly min(k, group) rows per source, deterministic") {
    val s1 = graft.OpsQueries.stratifiedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val s2 = graft.OpsQueries.stratifiedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(s1 === s2, "sampling must be deterministic across runs")
    val groupSizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = s1.groupBy(_._2).view.mapValues(_.size).toMap
    groupSizes.foreach { case (src, n) =>
      assert(perSource.getOrElse(src, 0) === math.min(20L, n).toInt, src)
    }
  }

  test("spreadBlobs spreads media rows by id without changing content") {
    val media = Multimodal.mediaFromDocuments(docs)
    val spread = Multimodal.spreadBlobs(media)
    assert(spread.count() === media.count())
    assert(spread.select("media_id").exceptAll(media.select("media_id")).count() === 0)
    val p = spread.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("Exchange") && p.contains("hashpartitioning(media_id"),
      s"spreadBlobs must hash-partition by media_id:\n$p")
  }

  test("multimodal feature extraction preserves ids and emits normalized histograms") {
    val media = Multimodal.mediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(spark, media).collect()
    assert(feats.length === docs.count())
    feats.take(20).foreach { f =>
      assert(f.features.length === 8)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, s"histogram not normalized: ${f.media_id}")
    }
    // deterministic: known bytes → known histogram
    val h = Multimodal.fakeDecode("aaaa".getBytes) // 'a'=97 → bin 3
    assert(h(3) === 1.0f && h.sum === 1.0f)
  }

  test("golden records: members partition the corpus; keeper is the naive argmax") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.load(spark, sf0001, "documents")
    val out = graft.OpsQueries.goldenRecords(spark, sf0001)
    // every document lands in exactly one cluster
    assert(out.agg(sum("n_members")).head().getLong(0) === d.count())
    // the argmax-agg keeper equals the naive per-cluster window pick
    val clusters = graft.OpsQueries.dedupClusters(spark, sf0001)
    val wc = d.select(col("doc_id"), length(col("text")).cast("long").as("nc"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val naive = wc.withColumn("rn", row_number().over(
        Window.partitionBy("cluster_id")
          .orderBy(col("nc").desc, col("doc_id").asc)))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("k2"), col("nc").as("c2"))
    assert(out.count() === naive.count())
    assert(out.join(naive, Seq("cluster_id"))
      .filter(col("keep_doc_id") =!= col("k2") ||
        col("keep_chars") =!= col("c2")).count() === 0)
  }

  test("source novelty: hand-computed first-seen attribution and exclusives") {
    import spark.implicits._
    // shingles (3-word): d1(s1): [a b c], [b c d]; d2(s2): [a b c];
    // d3(s2): [x y z]. First-seen: all of d1's at s1; [x y z] at s2.
    // Exclusive: [b c d] (only s1), [x y z] (only s2); [a b c] in both.
    val d = Seq(
      (1L, "s1", "a b c d"), (2L, "s2", "a b c"), (3L, "s2", "x y z"))
      .toDF("doc_id", "source", "text")
    val sh = graft.ops.Dedup.shingleSet(d, "doc_id", "text")
      .join(d.select(col("doc_id"), col("source")), Seq("doc_id"))
    val nTypes = sh.select("source", "shingle").distinct()
      .groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nTypes === Map("s1" -> 2L, "s2" -> 2L))
    val got = {
      val dir = java.nio.file.Files.createTempDirectory("novelty").toString
      d.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.OpsQueries.sourceNovelty(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    }
    assert(got === Map(
      "s1" -> ((2L, 2L, 1L)),   // types {abc,bcd}; both first here; bcd exclusive
      "s2" -> ((2L, 1L, 1L))))  // types {abc,xyz}; xyz first+exclusive
  }

  test("novelty curve: hand-computed first-seen checkpoints and cumulative types") {
    import spark.implicits._
    // 3-shingles: d0: {a b c, b c d}; d1: {a b c} (seen); d2: {x y z,
    // y z w}; d3: {b c d (seen), c d e}. max id 3 -> checkpoint =
    // first_seen * 20 div 4 = 5 * first_seen.
    val d = Seq(
      (0L, "a b c d"), (1L, "a b c"), (2L, "x y z w"), (3L, "b c d e")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("heaps").toString
    d.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.OpsQueries.noveltyCurve(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === 20)
    assert(got(0L) === ((2L, 2L)))
    assert(got(5L) === ((0L, 2L)))
    assert(got(10L) === ((2L, 4L)))
    assert(got(15L) === ((1L, 5L)))
    assert(got(19L) === ((0L, 5L)))
  }

  test("oov rate: matches an independent driver-side recompute on a fixture") {
    import spark.implicits._
    val rows = Seq(
      (0L, "s1", "a a b c"), (1L, "s1", "a b d"), (2L, "s2", "c c e"),
      (3L, "s2", "a f b"), (4L, "s1", "g a a"), (5L, "s2", "b b h"),
      (6L, "s1", "a c i"), (7L, "s2", "j a b"))
    val dir = java.nio.file.Files.createTempDirectory("oov").toString
    rows.toDF("doc_id", "source", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // independent reference: same md5 split, top-2-of-train vocab
    def md5hex(v: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(v.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def arm(id: Long) = Integer.parseInt(md5hex(id.toString).substring(0, 1), 16) < 8
    val (train, hold) = rows.partition(r => arm(r._1))
    assert(train.nonEmpty && hold.nonEmpty, "fixture must split both ways")
    val counts = train.flatMap(_._3.split("\\s+")).groupBy(identity)
      .view.mapValues(_.size.toLong).toSeq
    val vocab = counts.sortBy { case (t, n) => (-n, t) }.take(16).map(_._1).toSet
    val expected = hold.groupBy(_._2).map { case (src, ds) =>
      val toks = ds.flatMap(_._3.split("\\s+"))
      src -> ((toks.size.toLong, toks.count(t => !vocab(t)).toLong))
    }
    val got = graft.OpsQueries.oovRate(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("dedup eval: deterministic P/R/F1; precision ≈ base rate exposes label-flat fixture") {
    val r = graft.OpsQueries.dedupEval(spark, sf0001).collect().head
    val (nPred, nTp, nTruth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (p, rec, f1) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
    // fully deterministic (seeded planes, fixed fixture) — pin the counts
    assert((nPred, nTp, nTruth) === ((532L, 50L, 12432L)))
    assert(nTp <= nPred && nTp <= nTruth)
    assert(p === nTp.toDouble / nPred && rec === nTp.toDouble / nTruth)
    assert(f1 === 2.0 * p * rec / (p + rec))
    // the fixture's labels are NOT cosine-clustered: precision must sit
    // near the random base rate — the eval telling us this config finds
    // nothing real is exactly the operator doing its job
    val baseRate = nTruth.toDouble / (500.0 * 499.0 / 2.0)
    assert(math.abs(p - baseRate) < 0.05, s"precision $p vs base $baseRate")
  }

  test("mmr rerank: picks match a driver-side greedy reference; diversity beats greed") {
    import spark.implicits._
    // query reaches candidates through TWO axes (e1 and e2): c1/c2 are
    // near-duplicates on the e1 route; c3 matches equally well via e2
    // but is ~orthogonal to c1 — diversity must promote it over c2
    val vecs = Map(
      0L -> Array(1f, 1f, 0f, 0f),
      1L -> Array(1f, 0f, 0.04f, 0f), 2L -> Array(1f, 0f, 0.05f, 0f),
      3L -> Array(0f, 1f, 0f, 0.05f), 4L -> Array(0.2f, 0.1f, 1f, 0f),
      5L -> Array(0f, 0.1f, 0.2f, 1f))
    val df = vecs.toSeq.sortBy(_._1).toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df, df.filter(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, topN = 5, relWeight = 0.7,
      divWeight = 0.3)
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // driver-side reference with the same left-fold arithmetic
    def dot(a: Array[Double], b: Array[Double]) = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val q = vecs(0L).map(_.toDouble)
    val cands = (1L to 5L).map(i => i -> vecs(i).map(_.toDouble)).toMap
    val rel = cands.map { case (i, v) => i -> cos(q, v) }
    var sel = Vector.empty[(Long, Double)]
    for (t <- 1 to 3) {
      val rem = cands.keySet -- sel.map(_._1)
      val scoresAll = rem.toSeq.map { i =>
        val ms = if (sel.isEmpty) 0.0
          else sel.map(s => cos(cands(i), cands(s._1))).max
        val sc = if (sel.isEmpty) 0.7 * rel(i) else 0.7 * rel(i) - 0.3 * ms
        (i, sc)
      }
      val best = scoresAll.minBy { case (i, sc) => (-sc, i) }
      sel = sel :+ best
    }
    val expected = sel.zipWithIndex.map { case ((i, sc), t) =>
      (t + 1L, i, pr6(sc)) }
    assert(got.toSeq === expected)
    // the diversity term must actually change the ranking: pure-greedy
    // order would take the near-duplicate c2 second
    val greedyOrder = rel.toSeq.sortBy { case (i, r) => (-r, i) }
      .take(3).map(_._1)
    assert(got.map(_._2).toSeq !== greedyOrder,
      "MMR must diverge from pure relevance ranking on this fixture")
  }

  test("semantic decontamination: planted near-copy of a holdout vector is caught") {
    import spark.implicits._
    // holdout = ids 0..15; id 20 is a near-copy of holdout 3 (cos ~1);
    // everything else lives on axes orthogonal to holdout 3
    def unit(i: Int, d: Double = 1.0) = {
      val a = Array.fill(8)(0f); a(i) = d.toFloat; a
    }
    val rows =
      (0L until 16L).map(i => (i, unit((i % 8).toInt))) ++
        Seq((20L, unit(3, 0.999)), (21L, unit(6)), (22L, unit(7)))
    val dir = java.nio.file.Files.createTempDirectory("decontam").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val got = graft.OpsQueries.semanticDecontamination(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.size === 16)
    // every holdout scanned the same 3-row corpus
    assert(got.values.forall(_._1 === 3L))
    // holdout 3 (and 11, same axis) see the planted copy at cos 1.0
    assert(got(3L) === ((3L, 1L, 1L, 1.0)))
    assert(got(11L) === ((3L, 1L, 1L, 1.0)))
    // a holdout on an axis no corpus vector shares sees nothing
    assert(got(0L)._2 === 0L && got(0L)._4 === 0.0)
    // threshold monotonicity everywhere
    got.values.foreach { case (_, a30, a15, mx) =>
      assert(a30 <= a15 && mx <= 1.0)
    }
  }

  test("source boilerplate matrix: planted shared template links exactly its two sources") {
    import spark.implicits._
    // s1/s2 share the 8-token template as a full window; s3 disjoint
    val tpl = "t1 t2 t3 t4 t5 t6 t7 t8"
    val d = Seq(
      (1L, "s1", tpl), (2L, "s2", tpl + " extra tail tokens here"),
      (3L, "s3", "x1 x2 x3 x4 x5 x6 x7 x8"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("bpm").toString
    d.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.OpsQueries.sourceBoilerplateMatrix(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === Map(("s1", "s2") -> 1L))
  }

  test("dedup savings: copies charge their full chars to the savable pool") {
    import spark.implicits._
    // s1: doc 1 kept, doc 2 an exact copy (savable), doc 3 unique
    // s2: one unique doc
    val d = Seq(
      (1L, "s1", "alpha beta gamma"), (2L, "s1", " alpha  beta gamma "),
      (3L, "s1", "unique content one"), (4L, "s2", "solo text"))
      .toDF("doc_id", "source", "text")
    val dir = java.nio.file.Files.createTempDirectory("savings").toString
    d.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.OpsQueries.dedupSavings(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // doc 2 has 19 chars (with padding), doc1 16, doc3 18
    assert(got("s1") === ((3L, 1L, 16L + 19L + 18L, 19L)))
    assert(got("s2") === ((1L, 0L, 9L, 0L)))
  }

  test("source interleave: every sorted prefix holds each source in proportion ±1") {
    val out = graft.OpsQueries.sourceInterleave(spark, sf0001)
      .orderBy(col("interleave_key"), col("source"), col("r"))
      .select("source", "n_s").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = out.length
    val totals = out.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for (p <- Seq(n / 10, n / 3, n / 2, (9 * n) / 10)) {
      val prefix = out.take(p).groupBy(_._1).view.mapValues(_.length.toLong).toMap
      totals.foreach { case (src, ns) =>
        val ideal = p.toDouble * ns / n
        val got = prefix.getOrElse(src, 0L).toDouble
        assert(math.abs(got - ideal) <= 1.0,
          s"source $src holds $got of prefix $p, ideal $ideal")
      }
    }
  }

  test("rendezvous shards: only the removed shard's docs move (HRW theorem)") {
    val out = graft.OpsQueries.rendezvousShards(spark, sf0001).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size === 8)
    (0L to 6L).foreach(sh =>
      assert(out(sh)._2 === 0L, s"shard $sh must keep all docs on 8->7"))
    assert(out(7L)._1 === out(7L)._2, "every doc of the removed shard moves")
    val p = graft.OpsQueries.rendezvousShards(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length <= 1,
      s"assignment is row-local; only the final agg may shuffle:\n$p")
  }

  test("kCenterCoreset: hand-computed farthest-point sequence with coverage sims") {
    import spark.implicits._
    // unit-ish 2-d vectors: seed is min id (1, pointing +x); farthest
    // from it is -x (cos -1); then +y (max-cos 0); the diagonal last
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(1f, 1f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(vecs, "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    assert(got === Seq(
      (1L, 1L, None),            // seed
      (2L, 4L, Some(-1.0)),      // cos(+x, -x) = -1: farthest
      (3L, 2L, Some(0.0)),       // +y orthogonal to both centers
      (4L, 3L, Some(0.707107)))) // diagonal: cos 1/sqrt(2) to +x and +y
    // k beyond the corpus exhausts cleanly after n rounds (no throw)
    val over = Similarity.kCenterCoreset(vecs, "vec_id", "embedding", k = 9)
    assert(over.count() === 4L)
  }

  test("real PNG decode: golden pixels round-trip through ImageIO bit-exactly") {
    // 2x2 golden image with hand-picked colors
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000) // luma 0   -> bin 0
    img.setRGB(1, 0, 0xffffff) // luma 255 -> bin 7
    img.setRGB(0, 1, 0xff0000) // luma 299*255/1000 = 76  -> bin 2
    img.setRGB(1, 1, 0x00ff00) // luma 587*255/1000 = 149 -> bin 4
    val png = Multimodal.encodePng(img)
    val back = Multimodal.decodeImage(png).get
    assert(back.getWidth === 2 && back.getHeight === 2)
    for (x <- 0 to 1; y <- 0 to 1)
      assert((back.getRGB(x, y) & 0xffffff) === (img.getRGB(x, y) & 0xffffff),
        s"pixel ($x,$y) changed in the PNG round-trip")
    assert(Multimodal.lumaHistogram(back).toSeq ===
      Seq(1L, 0L, 1L, 0L, 1L, 0L, 0L, 1L))
    // undecodable bytes -> None -> fake fallback, same output shape
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeOrFake("not a png".getBytes).length === 8)
    // decodable bytes -> the REAL path: normalized pixel histogram
    assert(Multimodal.decodeOrFake(png).toSeq ===
      Seq(0.25f, 0f, 0.25f, 0f, 0.25f, 0f, 0f, 0.25f))
  }

  test("image dHash dedup: planted variants detected; banding == naive all-pairs") {
    val nBases = 200
    // driver-side signatures straight from the real decode path
    val sig = (0L until 600L).map { id =>
      val img = Multimodal.decodeImage(
        Multimodal.syntheticPngVariant(id, nBases)).get
      id -> Multimodal.dHash64(img)
    }.toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // bases (id < nBases) are unperturbed syntheticPng-style images;
    // generation-1 variants must mostly land within the radius,
    // generation-2 must mostly drift out — the graded planted structure
    val gen1In = (nBases until 2 * nBases).count(
      i => ham(sig(i.toLong), sig((i % nBases).toLong)) <= 3)
    val gen2In = (2 * nBases until 3 * nBases).count(
      i => ham(sig(i.toLong), sig((i % nBases).toLong)) <= 3)
    assert(gen1In >= 50, s"generation-1 recall collapsed: $gen1In/200")
    assert(gen2In < gen1In / 2,
      s"generation-2 must drift out of radius: gen1=$gen1In gen2=$gen2In")
    // distributed banded join loses NOTHING vs naive all-pairs at r=3
    val sigDf = sig.toSeq.toDF("media_id", "dhash")
    val banded = Dedup.hammingPairs64(sigDf, "media_id", "dhash", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val naive = (for {
      a <- sig.keys; b <- sig.keys if a < b
      h = ham(sig(a), sig(b)) if h <= 3
    } yield (a, b, h)).toSeq.sorted
    assert(banded === naive, "pigeonhole banding must be complete at radius 3")
  }

  test("hammingPairs64 == naive on adversarial random signatures (property)") {
    val rnd = new scala.util.Random(42)
    // cluster structure: seeds + perturbed copies at controlled radii
    val seeds = Seq.fill(12)(rnd.nextLong())
    val sigs = seeds.zipWithIndex.flatMap { case (s0, i) =>
      (0 until 5).map { k =>
        var s = s0
        (0 until k).foreach(_ => s ^= 1L << rnd.nextInt(64))
        (i * 5L + k, s)
      }
    }
    val df = sigs.toDF("id", "sig")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val m = sigs.toMap
    for (r <- 0 to 3) {
      val got = Dedup.hammingPairs64(df, "id", "sig", maxHamming = r)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).sorted.toSeq
      val naive = (for {
        a <- m.keys; b <- m.keys if a < b
        h = ham(m(a), m(b)) if h <= r
      } yield (a, b, h)).toSeq.sorted
      assert(got === naive, s"radius $r mismatch")
    }
  }

  test("WAV roundtrip: javax.sound decode recovers the exact PCM16 samples") {
    // replay the syntheticWav sample formula driver-side and compare to
    // the REAL decode — the codec roundtrip must be bit-lossless
    val nBases = 200
    for (id <- Seq(0L, 7L, 199L, 200L, 433L, 599L)) {
      val base = id % nBases
      val mag = id / nBases
      val n = (1300 + (base % 7) * 130).toInt
      val expect = Array.tabulate(n) { t =>
        val s0 = ((base * 37 + t * 13 + (t % 19) * (base % 23) * 31) % 4096) - 2048
        val s1 = s0 * ((t / 64 + base) % 4 + 1)
        (if (mag > 0 && (t + id) % 7 == 0) s1 + mag * mag * 500 else s1).toInt
      }
      val got = Multimodal.decodeWav(Multimodal.syntheticWav(id, nBases))
      assert(got.isDefined, s"clip $id must decode")
      assert(got.get.toSeq === expect.toSeq,
        s"PCM16 roundtrip changed samples for clip $id")
    }
    // degrade contracts: junk bytes -> None; short clip -> None fingerprint
    assert(Multimodal.decodeWav("not a wav".getBytes).isEmpty)
    assert(Multimodal.audioFingerprint64(Array.fill(64)(1)).isEmpty,
      "clips shorter than 65 samples must degrade to None, not throw")
    assert(Multimodal.audioFingerprint64(Array.fill(65)(1)).isDefined)
  }

  test("audio fingerprint dedup: planted variants detected within radius 3") {
    val nBases = 200
    val sig = (0L until 600L).map { id =>
      val samples = Multimodal.decodeWav(Multimodal.syntheticWav(id, nBases)).get
      id -> Multimodal.audioFingerprint64(samples).get
    }.toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // graded planted structure: generation-1 variants mostly in-radius,
    // generation-2 drift out (observed: gen1 167/200, gen2 87/200)
    val gen1In = (nBases until 2 * nBases).count(
      i => ham(sig(i.toLong), sig((i % nBases).toLong)) <= 3)
    val gen2In = (2 * nBases until 3 * nBases).count(
      i => ham(sig(i.toLong), sig((i % nBases).toLong)) <= 3)
    assert(gen1In >= 120, s"generation-1 recall collapsed: $gen1In/200")
    assert(gen2In < gen1In * 3 / 4,
      s"generation-2 must drift out of radius: gen1=$gen1In gen2=$gen2In")
    // distributed banded join loses NOTHING vs naive all-pairs at r=3
    import spark.implicits._
    val sigDf = sig.toSeq.toDF("clip_id", "afp")
    val banded = Dedup.hammingPairs64(sigDf, "clip_id", "afp", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    val naive = (for {
      a <- sig.keys; b <- sig.keys if a < b
      h = ham(sig(a), sig(b)) if h <= 3
    } yield (a, b, h)).toSeq.sorted
    assert(banded === naive, "pigeonhole banding must be complete at radius 3")
  }

  test("audio calibration sweep: recall monotone in perturbation magnitude, gen-1 operating point holds") {
    val rows = graft.OpsQueries
      .audioCalibrationQ(spark, sf0001)
      .orderBy(col("mag"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getDouble(7)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    // the curve the detector's operating point is read from: stronger
    // perturbations must never be EASIER to catch
    val recalls = rows.map(_._4)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      s"recall must be monotone non-increasing in magnitude: ${recalls.toSeq}")
    assert(recalls.head >= 0.7,
      s"generation-1 operating point collapsed: ${recalls.head}")
    assert(rows.forall(_._3 == 1L),
      "banding must be complete at every magnitude")
  }

  test("video calibration sweep: recall monotone in perturbation density, banding complete per magnitude") {
    val rows = graft.OpsQueries.videoCalibrationQ(spark, sf0001)
      .orderBy(col("mag"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getDouble(6)))
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    val recalls = rows.map(_._4)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      s"recall must be monotone non-increasing in density: ${recalls.toSeq}")
    assert(recalls.head >= 0.9,
      s"sparse-perturbation operating point collapsed: ${recalls.head}")
    assert(recalls.last <= 0.2,
      s"densest perturbation must mostly escape radius 3: ${recalls.last}")
    assert(rows.forall(_._3 == 1L),
      "banding must be complete at every magnitude")
  }

  test("cross-modal dedup: signal fusion classifies planted duplicate/caption-reuse/image-reuse") {
    val rows = graft.OpsQueries.crossModalDedupQ(spark, sf0001).collect()
    val byKind = rows.groupBy(_.getString(4)).view.mapValues(_.length).toMap
    // fixture-exact (integer-deterministic end to end): 19 pairs where
    // BOTH signals fire, 131 caption-only, 161 image-only
    assert(byKind === Map(
      "duplicate" -> 19, "caption_reuse" -> 131, "image_reuse" -> 161),
      s"kind histogram: $byKind")
    // every 'duplicate' must be a planted same-concept pair with both
    // signals present
    rows.filter(_.getString(4) == "duplicate").foreach { r =>
      assert(r.getLong(2) === 1L && !r.isNullAt(3) &&
        r.getLong(5) === 1L, s"bad duplicate row: $r")
    }
    // caption_reuse rows carry NO image hamming (the fusion's outer
    // side), image_reuse rows carry no caption match
    assert(rows.filter(_.getString(4) == "caption_reuse").forall(_.isNullAt(3)))
    assert(rows.filter(_.getString(4) == "image_reuse").forall(_.getLong(2) == 0L))
  }

  test("video container: demux recovers every PNG frame exactly; garbage degrades to None") {
    val nBases = 60
    for (id <- Seq(0L, 59L, 60L, 137L, 239L)) {
      val blob = Multimodal.syntheticVideo(id, nBases)
      val frames = Multimodal.demuxVideo(blob)
      assert(frames.isDefined, s"video $id must demux")
      assert(frames.get.length === Multimodal.VideoFrames)
      val base = id % nBases
      frames.get.zipWithIndex.foreach { case (png, f) =>
        val img = Multimodal.decodeImage(png)
        assert(img.isDefined, s"frame $f of video $id must decode")
        assert(img.get.getWidth === (base % 5 + 8).toInt &&
          img.get.getHeight === (base % 4 + 6).toInt,
          s"frame $f of video $id has wrong dims")
      }
    }
    // degrade contracts: junk, truncation, and a lying frame length all
    // parse to None (downgrade the row), never throw
    assert(Multimodal.demuxVideo(null).isEmpty)
    assert(Multimodal.demuxVideo("not a video".getBytes).isEmpty)
    val good = Multimodal.syntheticVideo(0L, nBases)
    assert(Multimodal.demuxVideo(good.take(good.length / 2)).isEmpty,
      "truncated container must degrade, not throw")
    val lying = good.clone()
    lying(8) = 0x7f.toByte // first frame length prefix -> absurd
    assert(Multimodal.demuxVideo(lying).isEmpty,
      "frame length beyond remaining bytes must degrade, not throw")
  }

  test("video near-dup: ±1 temporal tolerance recovers shifted variants exact alignment misses") {
    val nBases = 60
    val k = Multimodal.VideoFrames
    // driver-side per-frame signatures straight from the real
    // demux -> decode -> dHash chain
    val sig: Map[(Long, Int), Long] = (0L until 240L).flatMap { id =>
      Multimodal.demuxVideo(Multimodal.syntheticVideo(id, nBases)).get
        .zipWithIndex.map { case (png, f) =>
          (id, f) -> Multimodal.dHash64(Multimodal.decodeImage(png).get)
        }
    }.toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // per generation: videos whose planted variant matches >= 6 of the
    // base's 8 frames, under exact alignment vs ±1 tolerance
    def detected(gen: Int, tol: Int): Int = (0 until nBases).count { b =>
      val v = b + gen * nBases
      (0 until k).count { fa =>
        (math.max(fa - tol, 0) to math.min(fa + tol, k - 1)).exists { fb =>
          ham(sig((b.toLong, fa)), sig((v.toLong, fb))) <= 3
        }
      } >= 6
    }
    // the graded planted structure (sim-derived, integer-exact):
    // gen 1 (sparse pixel bump): in-radius frame-wise — detected both ways
    assert(detected(1, 1) >= 55, s"gen-1 recall collapsed: ${detected(1, 1)}/60")
    // gen 2 (same bump + one-frame temporal shift): the tolerance IS the
    // detector — exact alignment sees nothing
    assert(detected(2, 0) === 0,
      s"exact alignment must miss the shifted generation: ${detected(2, 0)}")
    assert(detected(2, 1) >= 50,
      s"±1 tolerance must recover the shifted generation: ${detected(2, 1)}/60")
    // gen 3 (dense 3x bump): the must-miss control
    assert(detected(3, 1) === 0,
      s"heavy drift must stay out of radius: ${detected(3, 1)}")
    // the distributed rollup agrees with the driver-side count per gen
    // (video_a < nBases anchors each pair at the unperturbed base —
    // same_base also covers variant↔variant pairs of one base)
    val q = graft.OpsQueries.videoDedupQ(spark, sf0001)
      .filter(col("same_base") === 1L && col("detected") === 1L &&
        col("video_a") < nBases.toLong)
      .groupBy(col("gen")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q.getOrElse(1L, 0L) === detected(1, 1).toLong &&
      q.getOrElse(2L, 0L) === detected(2, 1).toLong &&
      q.getOrElse(3L, 0L) === 0L,
      s"distributed rollup disagrees with driver-side truth: $q")
  }

  test("real resize: nearest-neighbor pixel mapping survives the PNG re-encode") {
    // 4x4 image, pixel value encodes its coordinates; resize to 2x2
    // picks in(0,0), in(2,0), in(0,2), in(2,2)
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 to 3; y <- 0 to 3) img.setRGB(x, y, (x << 16) | (y << 8) | 0x40)
    val out = Multimodal.decodeImage(
      Multimodal.resizeOrFake(Multimodal.encodePng(img), 2, 2)).get
    assert(out.getWidth === 2 && out.getHeight === 2)
    assert((out.getRGB(0, 0) & 0xffffff) === 0x000040)
    assert((out.getRGB(1, 0) & 0xffffff) === 0x020040)
    assert((out.getRGB(0, 1) & 0xffffff) === 0x000240)
    assert((out.getRGB(1, 1) & 0xffffff) === 0x020240)
    // mixed batch through the OPERATOR: a real PNG row resizes via the
    // codec, a text row takes the byte-stream fake — same schema
    import spark.implicits._
    val mixed = Seq(
      (1L, Multimodal.syntheticPng(1L), "png"),
      (2L, "plain text bytes".getBytes, "txt"))
      .toDF("media_id", "media", "format")
    val rs = Multimodal.resizeMedia(spark, mixed, 2, 2).collect()
      .map(r => r.media_id -> r).toMap
    assert(Multimodal.decodeImage(rs(1L).media).isDefined, "png row must re-encode as png")
    assert(rs(2L).media.length === 4, "text row must take the 4-byte fake path")
  }

  test("resize stage: nearest-neighbor byte subsample with target metadata") {
    // bytes 0..9 to 2x2: out(i) = bytes((i*10)/4) -> indices 0,2,5,7
    assert(Multimodal.fakeResize(Array.tabulate(10)(_.toByte), 2, 2).toSeq ===
      Seq[Byte](0, 2, 5, 7))
    // shrinking and growing both land exactly tw*th bytes; empty stays empty
    assert(Multimodal.fakeResize(Array[Byte](7), 4, 2).toSeq ===
      Seq.fill(8)(7.toByte))
    assert(Multimodal.fakeResize(Array.emptyByteArray, 4, 4).isEmpty)
    val media = Multimodal.mediaFromDocuments(
      graft.Tables.load(spark, sf0001, "documents"))
    val out = Multimodal.resizeMedia(spark, media, 16, 8).toDF()
    assert(out.count() === media.count())
    val r = out.filter(col("media_id") === 1L).head()
    assert(r.getAs[Int]("width") === 16 && r.getAs[Int]("height") === 8)
    assert(r.getAs[Array[Byte]]("media").length === 128)
  }

  test("frame sampling emits n_frames frames covering the blob prefix") {
    val media = Multimodal.mediaFromDocuments(docs.limit(10))
    val frames = Multimodal.sampleFrames(media)
    val counts = frames.groupBy("media_id").count()
      .join(media.select(col("media_id"), col("n_frames").cast("long").as("nf")), "media_id")
    assert(counts.filter(col("count") =!= col("nf")).count() === 0)
  }

  test("language id obeys marker priority and CJK short-circuit") {
    val df = Seq(
      (1L, "the cat and the dog"),        // en
      (2L, "der hund und die katze ist"), // de
      (3L, "el perro y los gatos"),       // es
      (4L, "le chat et la souris une"),   // fr
      (5L, "对酒当歌 人生几何"),            // zh via CJK
      (6L, "zzz qqq www")                 // unknown
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr",
      5L -> "zh", 6L -> "unknown"))
  }

  test("RP-LSH KNN recall@5 >= 0.5 vs brute force and signatures are deterministic") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val queries = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.rpLshTopK(e, queries, "vec_id", "embedding", 5,
      dim = 64, numBits = 6, probeHamming = 2)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"RP-LSH recall $recall too low")
    // determinism: same seed -> same buckets
    val s1 = e.select(Similarity.rpSignature(col("embedding").cast("array<double>"), 64).as("s"))
      .collect().map(_.getInt(0)).toSeq
    val s2 = e.select(Similarity.rpSignature(col("embedding").cast("array<double>"), 64).as("s"))
      .collect().map(_.getInt(0)).toSeq
    assert(s1 === s2)
  }

  test("group centroids: per-(group, dim) means against a hand fixture") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)),
      (1, Array(10.0f, 20.0f))).toDF("label", "embedding")
    val got = Similarity.groupCentroids(df, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === Map(
      (0, 0L) -> 2.0, (0, 1L) -> 3.0,
      (1, 0L) -> 10.0, (1, 1L) -> 20.0))
  }

  test("negative sampling: k per anchor, no self-pairs, hash formula, deterministic") {
    import spark.implicits._
    val n = 10L
    val df = (0L until n).map(i =>
      (i, Array(i.toFloat, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.negativePairs(df, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.length === (n * 2).toInt)
    assert(got.forall { case (a, _, neg) => a != neg }, got)
    // replay the multiplicative hash for a couple of anchors
    def expect(a: Long, j: Long): Long = {
      val raw = (a * 2654435761L + j * 40503L) % n
      if (raw == a) (raw + 1) % n else raw
    }
    val byAnchor = got.map { case (a, j, neg) => (a, j) -> neg }.toMap
    for (a <- Seq(0L, 3L, 9L); j <- Seq(1L, 2L))
      assert(byAnchor((a, j)) === expect(a, j), s"anchor $a j $j")
    // rerun is bit-identical (no RNG state)
    val again = Similarity.negativePairs(df, "vec_id", "embedding", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(again.toSet === got.toSet)
  }

  test("chunkDocuments: overlapping windows, clamped tail, short-doc floor") {
    val words20 = (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, words20), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "doc_id", "text",
      chunkTokens = 16, overlap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(t => (t._1, t._2))
    // doc 1: ceil((20-4)/12) = 2 chunks; chunk 1 starts at token 13
    assert(out.length === 3)
    assert(out(0) === ((1L, 0L, 16L, (1 to 16).map(i => s"w$i").mkString(" "))))
    assert(out(1) === ((1L, 1L, 8L, (13 to 20).map(i => s"w$i").mkString(" "))))
    assert(out(2) === ((2L, 0L, 3L, "a b c")))
  }

  test("chunkDocuments: every token covered; adjacent chunks overlap by `overlap`") {
    val rnd = new scala.util.Random(13)
    val docs = (1 to 30).map(i =>
      (i.toLong, (1 to (1 + rnd.nextInt(60))).map(j => s"t$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(df, "doc_id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
    docs.foreach { case (id, text) =>
      val toks = text.split(" ")
      val cs = chunks(id).sortBy(_._2).map(_._3.split(" "))
      assert(cs.flatten.toSet === toks.toSet, s"doc $id coverage")
      cs.sliding(2).foreach {
        case Array(a, b) => assert(a.takeRight(4).sameElements(b.take(4))
          || b.length < 4, s"doc $id overlap")
        case _ => ()
      }
    }
  }

  test("retrievalMrrMap: hand-ranked neighborhood — first-hit reciprocal, AP over min(k, R)") {
    def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val e = Seq(
      (0L, Seq(1.0f, 0.0f), 1),
      (1L, Seq(0.99f, 0.14f), 0),  // rank 1, not relevant
      (2L, Seq(0.95f, 0.31f), 1),  // rank 2, relevant
      (3L, Seq(0.7f, 0.71f), 1),   // rank 3, relevant
      (4L, Seq(0.0f, 1.0f), 0),
      (5L, Seq(-1.0f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = Similarity.retrievalMrrMap(e, e.filter(col("vec_id") === 0L),
      "vec_id", "embedding", "label", k = 5).head()
    assert(r.getLong(0) === 0L && r.getLong(1) === 1L)
    assert(r.getLong(2) === 2L, "first relevant at rank 2")
    assert(r.getDouble(3) === 0.5)
    assert(r.getLong(4) === 2L)
    // R = min(5, 3 labeled-1 minus self) = 2; AP = (1/2 + 2/3)/2
    assert(r.getDouble(5) === pr6((0.5 + 2.0 / 3.0) / 2.0))
  }

  test("sharedSpans: planted shared run is recovered at full extent; disjoint docs emit nothing") {
    // a 20-token planted run: first/last fully-shared windows select in
    // disjoint gram ranges, so the recovered extent is provably >= 14
    // tokens regardless of which grams win their windows
    val shared = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen nineteen twenty"
    val df = Seq(
      (1L, s"aa bb $shared cc dd"),
      (2L, s"xx $shared yy zz qq"),
      (3L, "totally different words without any overlap here at all")
    ).toDF("doc_id", "text")
    val got = Dedup.sharedSpans(df, "doc_id", "text",
        n = 3, window = 4, maxDocsPerFp = 8, minSpanTokens = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === Set((1L, 2L)), s"only the planted pair: $got")
    val (aStart, bStart, spanTokens) = got((1L, 2L))
    assert(spanTokens >= 14L && spanTokens <= 20L, s"span $spanTokens")
    assert(aStart - bStart === 1L,
      s"diagonal must reflect the 1-token offset: a=$aStart b=$bStart")
  }

  test("winnowing matches the driver-side reference (ties rightmost) and keeps the coverage guarantee") {
    def h60(gram: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def ref(text: String, n: Int = 3, w: Int = 4): Set[(Long, Long)] = {
      val toks = text.trim.split("\\s+").toVector.filter(_.nonEmpty)
      if (toks.size < n) return Set.empty
      val hs = toks.sliding(n).map(g => h60(g.mkString(" "))).toVector
      (0 to math.max(hs.size - w, 0)).flatMap { p =>
        val frame = hs.slice(p, math.min(p + w, hs.size)).zipWithIndex
          .map { case (hh, i) => (hh, (p + i).toLong) }
        // min hash, tie to RIGHTMOST position (= min (h, -pos))
        Some(frame.minBy { case (hh, pos) => (hh, -pos) })
      }.toSet
    }
    val texts = Map(
      "share1" -> "u v COMMON RUN OF SEVEN SHARED TOKENS HERE w x y",
      "share2" -> "p q r COMMON RUN OF SEVEN SHARED TOKENS HERE s t",
      "ties"   -> "a a a a a a a a", // every gram identical → constant tie
      "short"  -> "only two",        // no 3-gram → absent from output
      "single" -> "just three tokens") // one gram, partial window
    val df = texts.toSeq.map { case (k, v) => (k, v) }.toDF("doc_id", "text")
    val got = Dedup.winnowingFingerprints(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(!got.contains("short"), "sub-gram doc must be absent")
    for ((id, text) <- texts if id != "short") {
      val fp = ref(text)
      val nGrams = text.trim.split("\\s+").count(_.nonEmpty) - 2
      val (gn, gf2, gmin, gdig, gden) = got(id)
      assert(gn === nGrams.toLong, s"$id n_grams")
      assert(gf2 === fp.size.toLong, s"$id n_fp")
      assert(gmin === fp.map(_._1).min, s"$id fp_min")
      assert(gdig === fp.toSeq.map { case (h, p) => (h ^ p) % 1000000007L }.sum,
        s"$id fp_digest")
      assert(gden === math.floor(fp.size.toDouble / nGrams * 1e6 + 0.5) / 1e6)
    }
    // the MOSS guarantee: a shared run of >= w + n - 1 = 6 tokens must
    // produce at least one shared fingerprint HASH between the two docs
    val shared = ref(texts("share1")).map(_._1)
      .intersect(ref(texts("share2")).map(_._1))
    assert(shared.nonEmpty, "coverage guarantee violated in the reference")
    // and the ties doc selects exactly the rightmost-of-each-window
    assert(got("ties")._2 === ref(texts("ties")).size.toLong)
  }

  test("codebook_argmin == least-of-structs composition == assignmentCounts histogram (byte equivalence)") {
    // the CLAUDE.md rule: a custom codegen Expression replacing a
    // built-in composition ships a byte-equivalence spec vs that
    // composition — here the per-vector argmin vs (a) the explicit
    // quantize → per-centroid distance → least(struct) pipeline and
    // (b) the join-formulated assignment histogram
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cents = Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3)
    val fast = Similarity.assignToCodebook(e, "vec_id", "embedding", cents)
    // (a) the composition, built inline (interpreted fallback is fine
    // in a spec — that inefficiency is WHY the expression exists)
    val cl: Array[(Long, Array[Long])] = cents
      .select(col("centroid_id").cast("long"),
        col("centv").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).map(v =>
        math.floor(v * 1e6 + 0.5).toLong + 2000000L).toArray))
      .sortBy(_._1)
    val dims = cl.head._2.length
    val vd = col("embedding").cast("array<double>")
    val qd = e.select(col("vec_id") +: (0 until dims).map(d =>
      (floor(element_at(vd, d + 1) * 1e6 + 0.5).cast("long") + 2000000L)
        .as(s"q$d")): _*)
    val slow = qd.select(col("vec_id"), least(cl.map { case (cid, cq) =>
      struct((0 until dims).map { d =>
        val diff = col(s"q$d") - lit(cq(d)); diff * diff
      }.reduce(_ + _).as("dist"), lit(cid).as("cid"))
    }: _*).getField("cid").as("cid"))
    val f = fast.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val s2 = slow.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(f === s2, "custom expression diverged from the composition")
    // (b) grouped counts equal the join-formulated histogram
    val viaExpr = fast.groupBy(col("cid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoin = Similarity.assignmentCounts(e, "vec_id", "embedding", cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr === viaJoin,
      "expression-assigned histogram diverged from assignmentCounts")
  }

  test("assignIncrement: accumulated arrival assignments == from-scratch; retry idempotent") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cents = Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3)
    val root = java.nio.file.Files.createTempDirectory("annapp-").toString
    try {
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 3 + 1
      for (b <- 0L until 3L)
        Similarity.assignIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cents, root, b)
      val acc = spark.read.parquet(s"$root/assign")
        .select(col("vec_id"), col("cid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val scratch = Similarity.assignToCodebook(e, "vec_id", "embedding", cents)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(acc === scratch,
        "accumulated increments must equal the from-scratch assignment")
      // a replayed arrival rewrites its own partition, state unchanged
      Similarity.assignIncrement(
        e.filter(col("vec_id") >= 0L && col("vec_id") < width),
        "vec_id", "embedding", cents, root, 0L)
      val retry = spark.read.parquet(s"$root/assign")
        .select(col("vec_id"), col("cid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(retry === scratch, "retry must be idempotent")
      // version stamping: a retrain between arrivals must be visible —
      // mixed-version state is detectable, and the current-version
      // readout excludes the stale partitions. The DEFAULT stamp is the
      // codebook's content identity (ADVICE r14: a static code-version
      // stamp let a retrain under unchanged code reuse the stale stamp)
      val v1 = Similarity.codebookVersionOf(cents)
      assert(Similarity.assignStateVersions(spark, root) === Seq(v1))
      Similarity.assignIncrement(
        e.filter(col("vec_id") >= 0L && col("vec_id") < width),
        "vec_id", "embedding", cents, root, 0L, codebookVersion = "t999")
      assert(Similarity.assignStateVersions(spark, root)
        === Seq(v1, "t999").sorted,
        "a mixed-version assign state must be detectable")
      val cur = Similarity.currentAssignments(spark, root, "t999")
      assert(cur.select("batch").distinct().collect()
        .map(_.get(0).toString.toLong).toSeq === Seq(0L),
        "current-version readout must see only the re-assigned partition")
      // REPAIR: retrain on a perturbed corpus, then reassignStale —
      // every stale partition is rewritten under the new codebook and
      // the state equals the from-scratch assignment of its ids
      val drifted = e.select(col("vec_id"),
        when(col("vec_id") % 3 === 0, array_sort(col("embedding")))
          .otherwise(col("embedding")).as("embedding"))
      val cents2 = Similarity.lloydCentroids(
        drifted, "vec_id", "embedding", 16, 3)
      // the stamp identifies the codebook ARTIFACT: a retrain under
      // UNCHANGED training code derives a fresh stamp by itself — the
      // exact ADVICE r14 hazard the content hash exists to close
      assert(Similarity.codebookVersionOf(cents2) !== v1,
        "a retrained codebook must derive a fresh content stamp")
      // the retrained codebook gets its own version, and EVERY prior
      // partition (content-derived default and t999 alike) is stale
      // relative to it
      val repaired = Similarity.reassignStale(
        root, e, "vec_id", "embedding", cents2, codebookVersion = "t1000")
      assert(repaired === Seq(0L, 1L, 2L), s"stale set: $repaired")
      assert(Similarity.assignStateVersions(spark, root) === Seq("t1000"),
        "repair must leave a single-version state")
      val after = spark.read.parquet(s"$root/assign")
        .select(col("vec_id"), col("cid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val scratch2 = Similarity
        .assignToCodebook(e, "vec_id", "embedding", cents2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(after === scratch2,
        "repaired state must equal from-scratch assignment under the new codebook")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("assignHistogram: monitor's current leg from state == corpus assignmentCounts; quiet without drift") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cents = Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3)
    val root = java.nio.file.Files.createTempDirectory("annhist-").toString
    try {
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 3 + 1
      for (b <- 0L until 3L)
        Similarity.assignIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cents, root, b)
      val ver = Similarity.codebookVersionOf(cents)
      // the state sum IS the corpus histogram — O(state), no rescan
      val fromState = Similarity.assignHistogram(spark, root, ver)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val fromCorpus = Similarity
        .assignmentCounts(e, "vec_id", "embedding", cents)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(fromState === fromCorpus,
        "state-read histogram must equal the from-scratch corpus histogram")
      // cell pruning reaches the same counts for the probed subset
      val someCells = fromCorpus.take(3).map(_._1)
      val prunedHist = Similarity.assignHistogram(spark, root, ver, someCells)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(prunedHist === fromCorpus.filter(p => someCells.contains(p._1)))
      // state-fed monitor with reference == absorbed corpus: every cell
      // count matches, so PSI is EXACTLY zero and the trigger is silent
      val refHist = Similarity.assignmentCounts(e, "vec_id", "embedding", cents)
      val curHist = Similarity.assignHistogram(spark, root, ver)
        .select(lit("state").as("scenario"), col("cid"), col("n"))
      val out = Similarity
        .codebookStalenessFromHist(refHist, curHist, "scenario", cents)
        .collect()
      assert(out.length === 16)
      assert(out.forall(r => r.getDouble(r.fieldIndex("contrib")) === 0.0),
        "undrifted state must read PSI exactly 0 per cell")
      assert(out.forall(r => r.getLong(r.fieldIndex("stale")) === 0L))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("ivfStateTopK: served-from-state retrieval — recall, version pinning, serve-after-repair") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cents = Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3)
    // query ids disjoint from the Lloyd seeds 0..15 (recall-A/B rule)
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") < 120)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val root = java.nio.file.Files.createTempDirectory("annserve-").toString
    try {
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 3 + 1
      for (b <- 0L until 3L)
        Similarity.assignIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cents, root, b,
          payloadCols = Seq("embedding"))
      // the served index must deliver trained-IVF quality (the q25b
      // configuration probes 8 of 16 cells) without touching the corpus
      val exact = pairs(
        Similarity.bruteForceTopK(e, queries, "vec_id", "embedding", 10))
      val served = pairs(Similarity.ivfStateTopK(spark, root, queries,
        "vec_id", "embedding", cents, k = 10, nprobe = 8))
      val recall = (served & exact).size.toDouble / exact.size
      assert(recall >= 0.7, s"state-served IVF recall@10 $recall below 0.7")
      // serving is version-pinned: after a retrain REPAIRS the state
      // (content-derived stamps on both sides), the old codebook serves
      // nothing — a mid-retrain mixed state can never leak into results
      val drifted = e.select(col("vec_id"),
        when(col("vec_id") % 3 === 0, array_sort(col("embedding")))
          .otherwise(col("embedding")).as("embedding"))
      val cents2 = Similarity.lloydCentroids(
        drifted, "vec_id", "embedding", 16, 3)
      Similarity.reassignStale(root, e, "vec_id", "embedding", cents2,
        payloadCols = Seq("embedding"))
      assert(Similarity.ivfStateTopK(spark, root, queries, "vec_id",
        "embedding", cents, k = 10, nprobe = 8).isEmpty,
        "stale-codebook serve must see no current postings after a repair")
      val reServed = pairs(Similarity.ivfStateTopK(spark, root, queries,
        "vec_id", "embedding", cents2, k = 10, nprobe = 8))
      val reRecall = (reServed & exact).size.toDouble / exact.size
      assert(reRecall >= 0.6,
        s"post-repair served recall collapsed: $reRecall")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("pqCodesIncrement/pqAdcFromState: accumulated codes == from-scratch; served == direct ADC; version-pinned") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cb = Similarity.lloydPqCodebook(e, "vec_id", "embedding")
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") <= 107)
    val root = java.nio.file.Files.createTempDirectory("pqserve-").toString
    try {
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 3 + 1
      for (b <- 0L until 3L)
        Similarity.pqCodesIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cb, root, b)
      // accumulated increments == from-scratch encoding of the union
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.head.toString.toLong).toSeq
      val acc = rows(spark.read.parquet(s"$root/codes")
        .drop("batch", "codebook_version"))
      val scratch = rows(Similarity.pqCodes(e, "vec_id", "embedding",
        codebook = Some(cb)))
      assert(acc === scratch,
        "accumulated code increments must equal the from-scratch encoding")
      // served retrieval == the direct trained-ADC retrieval, row for row
      val served = rows(Similarity.pqAdcFromState(
        spark, root, queries, "vec_id", "embedding", cb, k = 10))
      val direct = rows(Similarity.pqAdcTopK(e, queries, "vec_id",
        "embedding", k = 10, codebook = Some(cb)))
      assert(served === direct,
        "state-served ADC must equal the from-scratch retrieval")
      // version pinning: a retrained codebook derives a fresh stamp, so
      // serving under it sees no stale codes until re-encoding
      val drifted = e.select(col("vec_id"),
        when(col("vec_id") % 3 === 0, array_sort(col("embedding")))
          .otherwise(col("embedding")).as("embedding"))
      val cb2 = Similarity.lloydPqCodebook(drifted, "vec_id", "embedding")
      assert(Similarity.pqCodebookVersionOf(cb2)
        !== Similarity.pqCodebookVersionOf(cb),
        "a retrained PQ codebook must derive a fresh content stamp")
      assert(Similarity.pqAdcFromState(spark, root, queries, "vec_id",
        "embedding", cb2, k = 10).isEmpty,
        "stale-codebook serve must see no current codes")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("reencodeStale: mixed-version detection, in-place repair == from-scratch, retry idempotent") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    // stale generation: 1-round codebook; serving generation: 3-round.
    // EAGER — a lazy codebook plan re-runs training per derived stamp
    val cb1 = Similarity.lloydPqCodebook(e, "vec_id", "embedding",
      iters = 1).localCheckpoint(true)
    val cb2 = Similarity.lloydPqCodebook(e, "vec_id", "embedding")
      .localCheckpoint(true)
    val v2 = Similarity.pqCodebookVersionOf(cb2)
    val root = java.nio.file.Files.createTempDirectory("pqrepair-").toString
    try {
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 3 + 1
      for (b <- 0L until 2L)
        Similarity.pqCodesIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cb1, root, b)
      // the third arrival already encodes under the retrained codebook:
      // a mid-retrain mixed state — the probe must see BOTH versions
      Similarity.pqCodesIncrement(
        e.filter(col("vec_id") >= 2 * width && col("vec_id") < 3 * width),
        "vec_id", "embedding", cb2, root, 2L)
      val mixed = Similarity.pqStateVersions(spark, root)
      assert(mixed.size == 2 && mixed.contains(v2),
        s"mixed-version code state must be detectable: $mixed")
      // repair touches exactly the stale partitions (0, 1); batch 2 is
      // already current and keeps its files
      def listing(b: Long) =
        new java.io.File(s"$root/codes/batch=$b").listFiles()
          .map(f => (f.getName, f.lastModified, f.length)).sorted.toSeq
      val before2 = listing(2L)
      val repaired = Similarity.reencodeStale(
        root, e, "vec_id", "embedding", cb2)
      assert(repaired === Seq(0L, 1L), s"stale set: $repaired")
      assert(listing(2L) === before2,
        "a current partition must keep its files across a repair")
      assert(Similarity.pqStateVersions(spark, root) === Seq(v2),
        "repair must leave a single-version state")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.head.toString.toLong).toSeq
      val after = rows(spark.read.parquet(s"$root/codes")
        .drop("batch", "codebook_version"))
      val scratch = rows(Similarity.pqCodes(e, "vec_id", "embedding",
        codebook = Some(cb2)))
      assert(after === scratch,
        "repaired code state must equal the from-scratch encoding under v2")
      // a repeated repair is a no-op (nothing stale) and state-stable
      assert(Similarity.reencodeStale(root, e, "vec_id", "embedding", cb2)
        === Seq.empty, "re-running a completed repair must find no stale")
      assert(rows(spark.read.parquet(s"$root/codes")
        .drop("batch", "codebook_version")) === scratch,
        "retry must be idempotent")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("repair swaps are crash-safe: a torn partition rewrite is recovered, not lost") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cb1 = Similarity.lloydPqCodebook(e, "vec_id", "embedding",
      iters = 1).localCheckpoint(true)
    val cb2 = Similarity.lloydPqCodebook(e, "vec_id", "embedding")
      .localCheckpoint(true)
    val v2 = Similarity.pqCodebookVersionOf(cb2)
    val root = java.nio.file.Files.createTempDirectory("pqcrash-").toString
    try {
      val maxId = e.agg(max(col("vec_id"))).head.getLong(0)
      val width = maxId / 2 + 1
      for (b <- 0L until 2L)
        Similarity.pqCodesIncrement(
          e.filter(col("vec_id") >= b * width && col("vec_id") < (b + 1) * width),
          "vec_id", "embedding", cb1, root, b)
      // simulate a repair of batch 0 that crashed AFTER completing its
      // hidden tmp (with _SUCCESS) and deleting the original, BEFORE
      // the rename — the torn state a bare in-place overwrite would
      // turn into permanent silent loss (the partition vanishes from
      // the next run's stale listing too)
      val vecs0 = e.join(
        spark.read.parquet(s"$root/codes/batch=0").select(col("vec_id")),
        Seq("vec_id"), "left_semi").localCheckpoint(true)
      Similarity.pqCodes(vecs0, "vec_id", "embedding",
        codebook = Some(cb2))
        .withColumn("codebook_version", lit(v2))
        .write.mode("overwrite").parquet(s"$root/codes/.repair-tmp-0")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(s"$root/codes/batch=0"))
      // the table now lists only batch 1 — a re-run must FIRST finish
      // the completed swap, then repair the remaining stale partition
      val repaired = Similarity.reencodeStale(
        root, e, "vec_id", "embedding", cb2)
      assert(repaired === Seq(1L),
        s"recovery should restore batch 0, leaving only 1 stale: $repaired")
      assert(Similarity.pqStateVersions(spark, root) === Seq(v2))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.head.toString.toLong).toSeq
      assert(rows(spark.read.parquet(s"$root/codes")
          .drop("batch", "codebook_version"))
        === rows(Similarity.pqCodes(e, "vec_id", "embedding",
          codebook = Some(cb2))),
        "recovered + repaired state must equal the from-scratch encode")
      // an INCOMPLETE tmp (no _SUCCESS) over an intact original is an
      // abandoned write: discarded on the next run, original untouched
      val junk = new java.io.File(s"$root/codes/.repair-tmp-1")
      junk.mkdirs()
      java.nio.file.Files.writeString(
        junk.toPath.resolve("part-junk.parquet"), "not parquet")
      assert(Similarity.reencodeStale(root, e, "vec_id", "embedding", cb2)
        === Seq.empty, "nothing stale after the repair above")
      assert(!junk.exists(), "incomplete repair tmp must be discarded")
      assert(rows(spark.read.parquet(s"$root/codes")
          .drop("batch", "codebook_version"))
        === rows(Similarity.pqCodes(e, "vec_id", "embedding",
          codebook = Some(cb2))), "state stable across tmp cleanup")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(new java.io.File(root))
    }
  }

  test("pqCodeHistogram/pqCodeStaleness: histogram from state == from-scratch; PSI flags planted drift only") {
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cb = Similarity.lloydPqCodebook(e, "vec_id", "embedding")
      .localCheckpoint(true)
    val codes = Similarity.pqCodes(e, "vec_id", "embedding",
      codebook = Some(cb))
    def hrows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
        .sortBy(_._1).toSeq
    val ref = Similarity.pqCodeHistogram(codes)
    // the histogram really is the per-(m, code) count of the codes
    val direct = codes.selectExpr(
      "stack(8, 0, code_0, 1, code_1, 2, code_2, 3, code_3, 4, code_4," +
        " 5, code_5, 6, code_6, 7, code_7) as (m, code)")
      .groupBy(col("m").cast("long"), col("code").cast("long"))
      .agg(count(lit(1)))
    assert(hrows(ref) === hrows(direct), "pqCodeHistogram diverged")
    // identical distributions: every contribution is exactly 0 (p == q
    // bitwise), nothing flags
    val same = Similarity.pqCodeStaleness(ref, ref, cb)
    assert(same.filter(col("stale") === 1L).count() === 0L,
      "identical code distributions must not flag")
    assert(same.agg(max(abs(col("contrib")))).head.getDouble(0) === 0.0,
      "identical distributions must contribute exactly zero PSI")
    // planted drift MOVES MASS (array_sort concentrates each subspace
    // slice — the q240 fixture rule): the monitor must flag it
    val drifted = e.select(col("vec_id"),
      array_sort(col("embedding")).as("embedding"))
    val cur = Similarity.pqCodeHistogram(
      Similarity.pqCodes(drifted, "vec_id", "embedding",
        codebook = Some(cb)))
    val flagged = Similarity.pqCodeStaleness(ref, cur, cb)
    assert(flagged.filter(col("stale") === 1L).count() > 0L,
      "sorted-vector drift must flag at least one subspace stale")
  }

  test("codebook staleness: control silent (PSI exactly 0), planted drift fires, retrain clears") {
    import org.apache.spark.sql.DataFrame
    val e = graft.Tables.load(spark, sf0001, "embeddings")
    val cents = Similarity.lloydCentroids(e, "vec_id", "embedding", 16, 3)
    val refHist = Similarity.assignmentCounts(e, "vec_id", "embedding", cents)
    val drifted = e.select(col("vec_id"),
      when(col("vec_id") % 3 === 0, array_sort(col("embedding")))
        .otherwise(col("embedding")).as("embedding"))
    def scen(name: String, df: DataFrame) =
      df.select(lit(name).as("scenario"), col("vec_id"), col("embedding"))
    val out = Similarity.codebookStaleness(refHist,
      scen("control", e).unionByName(scen("drifted", drifted)),
      "vec_id", "embedding", "scenario", cents)
    val staleBy = out.groupBy("scenario").agg(max(col("stale")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(staleBy("control") === 0L, "trigger fired with zero drift")
    assert(staleBy("drifted") === 1L, "trigger missed planted drift")
    // the no-drift PSI is EXACTLY zero (identical cell counts => p == q)
    assert(out.filter(col("scenario") === "control")
      .agg(max(abs(col("psi_cum")))).head.getDouble(0) === 0.0)
    // the retrain the trigger asks for: refit on the drifted corpus,
    // refresh the reference histogram -> the monitor goes quiet
    val cents2 = Similarity.lloydCentroids(drifted, "vec_id", "embedding", 16, 3)
    val ref2 = Similarity.assignmentCounts(drifted, "vec_id", "embedding", cents2)
    val out2 = Similarity.codebookStaleness(ref2,
      scen("post_retrain", drifted), "vec_id", "embedding", "scenario", cents2)
    assert(out2.agg(max(col("stale"))).head.getLong(0) === 0L,
      "freshly retrained codebook must not report stale against its own reference")
    // the most-broken scenario of all — every vector unassignable
    // (null embeddings; posexplode emits nothing, so the assignment
    // histogram has ZERO rows for it) — must still SURFACE with its
    // full cell grid and all-zero current mass, never silently drop
    // from the readout. (Laplace smoothing reads an EMPTY slice as the
    // uniform distribution, so PSI itself stays small against a
    // near-uniform reference — the signal an operator acts on here is
    // nt_cur = 0 across the grid, not the stale flag.)
    val broken = e.select(lit("broken").as("scenario"), col("vec_id"),
      lit(null).cast("array<double>").as("embedding"))
    val out3 = Similarity.codebookStaleness(refHist,
      scen("control", e).unionByName(broken),
      "vec_id", "embedding", "scenario", cents)
    val brokenRows = out3.filter(col("scenario") === "broken").collect()
    assert(brokenRows.length === 16,
      "an all-unassignable scenario must keep its full cell grid")
    assert(brokenRows.forall(r => r.getLong(r.fieldIndex("n_cur")) == 0L),
      "an all-unassignable scenario must read as zero current mass")
  }

}
