package graft.functions

import graft.{SparkSpec, Tables}
import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._

/** Equivalence pins for the codegen text expressions: each must produce
  * byte-identical results to the built-in composition it replaces, on
  * both adversarial literals and the real documents fixture — the
  * oracle-parity guarantee that lets the hot path swap implementations
  * without touching the DuckDB SQL.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val edgeStrings = Seq(
    "",
    " ",
    "   ",
    "\t\t",
    "plain text",
    "  Leading And   Trailing  ",
    "tabs\tand\nnewlines\r\nand\u000bvt\fff",
    "MiXeD CaSe ÄÖÜ ß İstanbul ΣΊΣΥΦΟΣ",
    "中文 文本 with spaces",
    "a  b   c    d",
    "\t leading tab run",
    "trailing run \n ",
    "punct!!! ... ???")

  test("normalized_md5 == md5(lower(regexp_replace(trim(text), \\s+, ' ')))") {
    val lit = edgeStrings.toDF("text")
    val docs = Tables.load(spark, sf0001, "documents").select(col("text"))
    Seq(lit, docs).foreach { df =>
      val bad = df.select(
        gf.normalized_md5(col("text")).as("fast"),
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("ref"))
        .filter(!(col("fast") <=> col("ref")))
      assert(bad.count() === 0, bad.collect().mkString("\n"))
    }
  }

  test("count_in_set == size(filter(toks, isin)) including duplicates and nulls") {
    val words = graft.ops.TextAnalysis.StopwordsEn
    val toks = Seq(
      Seq("the", "the", "the"),
      Seq("a", "b", "of", "of"),
      Seq.empty[String],
      Seq("none", "match"),
      Seq("The", "the")).toDF("toks")
    val docs = Tables.load(spark, sf0001, "documents")
      .select(graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
    Seq(toks, docs).foreach { df =>
      val bad = df.select(
        gf.count_in_set(col("toks"), words).as("fast"),
        size(filter(col("toks"), t => t.isin(words.map(w => w: Any): _*))).as("ref"))
        .filter(!(col("fast") <=> col("ref")))
      assert(bad.count() === 0, bad.collect().mkString("\n"))
    }
  }

  test("nfc_normalize == java.text.Normalizer NFC (udf reference)") {
    val nfcEdge = Seq(
      "",
      "plain ascii only",
      "cafe\u0301",               // decomposed e + combining acute
      "caf\u00e9",                // already precomposed (NFC fixpoint)
      "e\u0327\u0301",            // stacked combining marks (cedilla+acute)
      "A\u030Angstro\u0308m",     // ring and diaeresis from combining forms
      "\u1100\u1161",             // Hangul jamo -> precomposed syllable
      "\u00c4\u00d6\u00dc \u00df \u0130stanbul", // non-ASCII already NFC
      "mixed ascii e\u0301 tail")
    val ref = udf((s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    val litDf = nfcEdge.toDF("text")
    val docs = Tables.load(spark, sf0001, "documents")
      .select(concat(col("text"), lit("e\u0301")).as("text"))
    Seq(litDf, docs).foreach { df =>
      val bad = df.select(
        gf.nfc_normalize(col("text")).as("fast"),
        ref(col("text")).as("ref"))
        .filter(!(col("fast") <=> col("ref")))
      assert(bad.count() === 0, bad.collect().mkString("\n"))
    }
    // null in -> null out
    val n = Seq[Option[String]](None).toDF("text")
      .select(gf.nfc_normalize(col("text")).as("v"))
    assert(n.filter(col("v").isNull).count() === 1)
  }

  test("interleave_bits == naive bit-loop Morton reference; 33-bit input throws") {
    def naive(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32)
        z |= (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      z
    }
    val rnd = new scala.util.Random(42)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xffffffffL, 0L),
      (0L, 0xffffffffL), (0xffffffffL, 0xffffffffL), (12345L, 67890L)) ++
      Seq.fill(200)((rnd.nextInt(Int.MaxValue).toLong, rnd.nextInt(Int.MaxValue).toLong))
    for ((a, b) <- cases)
      assert(InterleaveBits.evalImpl(a, b) === naive(a, b), s"($a, $b)")
    // the column path agrees with the kernel
    val df = cases.toDF("a", "b")
      .select(gf.interleave_bits(col("a"), col("b")).as("z"),
        col("a"), col("b")).collect()
    df.foreach(r => assert(r.getLong(0) === naive(r.getLong(1), r.getLong(2))))
    intercept[IllegalArgumentException] {
      InterleaveBits.evalImpl(1L << 32, 0L)
    }
  }

  test("fused minhash signatures == explode+groupBy formulation") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val viaAgg = graft.ops.Dedup.minhashSignatures(
      graft.ops.Dedup.shingleBag(docs, "doc_id", "text"), "doc_id")
    val fused = graft.ops.Dedup.minhashSignaturesFused(docs, "doc_id", "text")
    assert(fused.columns.toSeq === viaAgg.columns.toSeq)
    assert(fused.count() === viaAgg.count())
    assert(fused.exceptAll(viaAgg).count() === 0)
    assert(viaAgg.exceptAll(fused).count() === 0)
    // short docs (< n tokens) are dropped by both formulations
    val short = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.minhashSignaturesFused(short, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("q_grams_occ == sliding-window reference with per-gram occurrence counters") {
    def ref(s: String, q: Int): Seq[String] = {
      val seen = scala.collection.mutable.Map.empty[String, Int]
      (0 to s.length - q).map { i =>
        val g = s.substring(i, i + q)
        val occ = seen.getOrElse(g, 0)
        seen(g) = occ + 1
        g + "\u0001" + occ
      }
    }
    val cases = edgeStrings ++ Seq("aaaa", "abab", "xy", "x")
    for (s <- cases; q <- Seq(2, 3)) {
      val got = QGramsWithOcc.evalImpl(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), q)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
      assert(got === ref(s, q), s"input=$s q=$q")
    }
    // column path agrees and null propagates
    val df = Seq(Some("abab"), None).toDF("s")
      .select(gf.q_grams_occ(col("s"), 2).as("g"))
    val rows = df.collect()
    assert(rows.exists(_.isNullAt(0)))
    assert(rows.exists(r => !r.isNullAt(0) &&
      r.getSeq[String](0) === ref("abab", 2)))
  }

  test("quantize_i8 == transform() composition; zero vector and clamp edges") {
    val maxabs = greatest(array_max(col("v")), -array_min(col("v")))
    val scale = maxabs / lit(127.0)
    val refCodes = when(maxabs === 0.0,
      // when() with no otherwise: null components stay null codes
      transform(col("v"), x => when(x.isNotNull, lit(0))))
      .otherwise(transform(col("v"), x =>
        // the null guard is part of the reference spelling: least/
        // greatest SKIP nulls, so an unguarded clamp would resurrect a
        // null code into ±127 — garbage, not a semantic to match
        when(x.isNotNull,
          greatest(lit(-127), least(lit(127),
            floor(x / scale + 0.5).cast("int"))))))
    val edge = Seq(
      Seq(0.0, 0.0, 0.0),                  // zero vector -> zero codes
      Seq(1.0, -1.0, 0.5),
      Seq(1e-300, -1e-300),                // denormal-adjacent scales
      Seq(127.0, -127.0, 126.5),
      Seq(3.25)).toDF("v")
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    Seq(edge, emb).foreach { df =>
      val bad = df.select(
        graft.functions.functions.quantize_i8(col("v")).as("fast"),
        refCodes.as("ref"))
        .filter(!(col("fast") <=> col("ref")))
      assert(bad.count() === 0, bad.collect().take(3).mkString("\n"))
    }
    // sparse arrays: null components skip the scale (array_max
    // semantics) and pass through as null codes (transform semantics) —
    // previously they were silently read as 0.0, diverging from the
    // composition this expression claims byte-equivalence with
    val sparse = spark.range(1).select(
        array(lit(1.0), lit(null).cast("double"), lit(0.5)).as("v"))
      .unionAll(spark.range(1).select(
        array(lit(0.0), lit(null).cast("double")).as("v")))
    val badSparse = sparse.select(
        graft.functions.functions.quantize_i8(col("v")).as("fast"),
        refCodes.as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(badSparse.count() === 0, badSparse.collect().mkString("\n"))
    val sparseGot = sparse
      .select(graft.functions.functions.quantize_i8(col("v")).as("c"))
      .collect().map(_.getSeq[Any](0).toSeq).toSeq
    assert(sparseGot === Seq(Seq(127, null, 64), Seq(0, null)),
      s"sparse codes: $sparseGot")
    // null propagates
    val n = Seq[Option[Seq[Double]]](None).toDF("v")
      .select(graft.functions.functions.quantize_i8(col("v")).as("c"))
    assert(n.filter(col("c").isNull).count() === 1)
  }

  test("dot_product == zip_with+aggregate composition (bitwise, dense); skip-null semantics pinned") {
    // the CLAUDE.md contract: a custom codegen expression replacing a
    // built-in composition ships a byte-equivalence spec vs that
    // composition — this was the one expression missing its pin
    val gfn = graft.functions.functions
    val hof = aggregate(
      zip_with(col("v"), col("w"), (x, y) => x * y),
      lit(0.0), (a, x) => a + x)
    val emb = Tables.load(spark, sf0001, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
    val pairs = emb.crossJoin(
      broadcast(emb.limit(3).select(col("v").as("w"))))
    val bad = pairs.select(gfn.dot_product(col("v"), col("w")).as("fast"),
        hof.as("ref"))
      .filter(!(col("fast") <=> col("ref")))
    assert(bad.count() === 0, bad.collect().take(3).mkString("\n"))
    // sparse inputs: the DOCUMENTED divergence — a null component pair
    // is skipped (contributes 0, the sparse-dot reading) where the HOF
    // null-propagates the whole sum; pinned so it cannot drift silently
    val sp = spark.range(1).select(
      array(lit(2.0), lit(null).cast("double")).as("v"),
      array(lit(3.0), lit(4.0)).as("w"))
    assert(sp.select(gfn.dot_product(col("v"), col("w"))).head.getDouble(0) === 6.0)
    assert(sp.select(hof.as("h")).head.isNullAt(0),
      "composition should null-propagate — if this changed, revisit the doc")
  }

  test("max_sim_micros == exploded join+two-agg composition (exact int64)") {
    // the CLAUDE.md contract: byte-equivalence vs the composition the
    // fused expression replaced (lateInteractionTopK's r21 shape) —
    // including negative components, a SHORT array (missing trailing
    // components are absent from the dots, not zero), and a NULL
    // element (the null product is skipped by sum)
    val gfn = graft.functions.functions
    val nTok = 2
    val tokDim = 3
    val rnd = new scala.util.Random(20260821)
    val dense = (0L until 12L).map(i =>
      (i, Seq.fill(nTok * tokDim)(rnd.nextDouble() * 4.0 - 2.0)))
    val short = Seq((100L, Seq(0.5, -1.5, 2.5, 0.25))) // 2nd token partial
    val withNull = Seq((101L,
      Seq[java.lang.Double](1.0, null, -2.0, 3.0, 0.5, -0.5)))
    val corpus = (dense.map { case (i, v) => (i, v.map(x => x: java.lang.Double)) }
      ++ short.map { case (i, v) => (i, v.map(x => x: java.lang.Double)) }
      ++ withNull)
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
    val queries = corpus.filter(col("vec_id").isin(0L, 1L, 100L, 101L))
    // composition (the replaced r21 formulation), spelled inline
    def comps(df: org.apache.spark.sql.DataFrame, side: String) =
      df.select(col("vec_id").as(s"${side}_id"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .filter(col("dim") < nTok * tokDim)
        .select(col(s"${side}_id"), expr(s"dim div $tokDim").as(s"${side}_tok"),
          (col("dim") % tokDim).as("off"),
          floor(col("v") * 1e6 + 0.5).cast("long").as(s"${side}_q"))
    val ref = comps(corpus, "neighbor").join(
        broadcast(comps(queries, "query")), Seq("off"))
      .groupBy(col("query_id"), col("neighbor_id"), col("query_tok"),
        col("neighbor_tok"))
      .agg(sum(col("query_q") * col("neighbor_q")).as("dot"))
      .groupBy(col("query_id"), col("neighbor_id"), col("query_tok"))
      .agg(max(col("dot")).as("best"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("best")).as("maxsim"))
    val fused = corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("cv"))
      .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv"))))
      .select(col("query_id"), col("neighbor_id"),
        gfn.max_sim_micros(col("qv"), col("cv"), nTok, tokDim).as("maxsim"))
      .filter(col("maxsim").isNotNull)
    def m(d: org.apache.spark.sql.DataFrame) =
      d.select("query_id", "neighbor_id", "maxsim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (got, want) = (m(fused), m(ref))
    assert(got === want, s"fused=$got\nref=$want")
    assert(got.nonEmpty && got.keys.exists(_._1 == 100L))
  }

  test("all custom expressions compile under CODEGEN_ONLY (no interpreted fallback)") {
    // Explain output keeps its '*' markers even when Janino fails at runtime
    // and Spark silently falls back to interpreted execution — so this test
    // makes compilation failures fatal instead of inspecting explain text.
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val docs = Tables.load(spark, sf0001, "documents").limit(50)
      val scalar = docs.select(
        gf.normalized_md5(col("text")).as("h"),
        gf.rolling_hash(col("text")).as("rh"),
        gf.simhash64(graft.ops.TextAnalysis.tokens(col("text"))).as("sh"),
        gf.word_shingles(col("text"), 3).as("sg"),
        gf.minhash_sigs(col("text"), 3).as("mh"),
        gf.count_in_set(graft.ops.TextAnalysis.tokens(col("text")),
          graft.ops.TextAnalysis.StopwordsEn).as("c"),
        gf.nfc_normalize(concat(col("text"), lit("e\u0301"))).as("nfc"),
        gf.interleave_bits(col("doc_id"), col("doc_id")).as("z"),
        gf.q_grams_occ(col("text"), 2).as("qg"))
      assert(scalar.count() === 50)
      assert(scalar.filter(col("h").isNull || col("rh").isNull).count() === 0)
      val quant = Tables.load(spark, sf0001, "embeddings").limit(10)
        .select(gf.quantize_i8(col("embedding").cast("array<double>")).as("q"))
      assert(quant.filter(col("q").isNull).count() === 0)
      val emb = Tables.load(spark, sf0001, "embeddings").limit(10)
        .select(col("embedding").cast("array<double>").as("v"))
      val dot = emb.crossJoin(broadcast(emb.select(col("v").as("v2")).limit(1)))
        .select(gf.dot_product(col("v"), col("v2")).as("d"))
      assert(dot.filter(col("d").isNull).count() === 0)
      // codebook_argmin: the expression that exists PRECISELY because
      // its built-in composition blows Janino's method limit and
      // silently degrades to interpreted — a compile failure in ITS
      // generated code must be fatal here, not a silent q252-class
      // hot-path crawl (the one custom expression this pin was missing)
      val cents = (0L until 16L).map(c =>
        (c, (0 until 8).map(d => (c * 8 + d) * 1000L)))
      val argmin = Tables.load(spark, sf0001, "embeddings").limit(10)
        .select(gf.codebook_argmin(
          col("embedding").cast("array<double>"),
          cents.map(_._1), cents.map(_._2)).as("cid"))
      assert(argmin.filter(col("cid").isNull).count() === 0)
      val ms = Tables.load(spark, sf0001, "embeddings").limit(10)
        .select(col("embedding").cast("array<double>").as("v"))
      val maxsim = ms.crossJoin(broadcast(ms.select(col("v").as("v2")).limit(1)))
        .select(gf.max_sim_micros(col("v"), col("v2"), 8, 8).as("s"))
      assert(maxsim.filter(col("s").isNull).count() === 0)
    } finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }
}
