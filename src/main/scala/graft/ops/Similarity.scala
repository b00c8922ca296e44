package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.util.Rounding.pround

/** Similarity search over embedding columns (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, an IVF-bucketed
  * variant as the scale path, and embedding-cosine near-dup pairs.
  *
  * All math runs in double after an explicit cast (the float32 values
  * are exact in double, so both engines see identical operands) as a
  * sequential left fold — `zip_with` + `aggregate` — which keeps results
  * reproducible and inside WholeStageCodegen.
  *
  * Scale notes: brute force is O(Q×N) — fine when the query set is small
  * and broadcastable, the pattern used here; IVF assigns vectors to their
  * nearest of C fixed centroids so a probe touches nprobe/C of the data;
  * both shuffle only on compact keys (query id / centroid id).
  */
object Similarity {

  /** Version key of the deterministic codebook-training code (the
    * integer-Lloyd's family: [[lloydCentroids]], [[lloydPqCodebook]],
    * [[lloydMicroCodebooks]] and their seeding/quantization). Served
    * artifacts are cached under a name that includes this key, so a
    * SEMANTIC change to training (different seeding, rounds,
    * quantization) must bump it — otherwise a long-lived host keeps
    * serving bitwise-stale artifacts trained by the old code and the
    * train≡serve equivalence specs go silently vacuous.
    */
  val TrainingCodeVersion: String = "t1"

  /** Sequential-fold dot product of two double arrays — the native
    * codegen'd [[graft.functions.DotProduct]] expression (identical
    * left-fold order to the `zip_with`+`aggregate` HOF formulation it
    * replaced, so oracle results are unchanged bitwise; ~5× faster since
    * HOFs evaluate interpreted).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.functions.dot_product(a, b)

  /** L2 norm (sqrt of self-dot). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Int8 scalar quantization of every vector — (id, maxabs, scale,
    * codes): the compression pass a 100 TB vector store runs before
    * indexing (4× over float32, 8× over float64; distance math then
    * runs on SIMD-friendly int8). Row-local and codegen'd via
    * [[graft.functions.QuantizeI8]] — embarrassingly parallel, no
    * shuffle, stays in whole-stage codegen. `maxabs` and `scale` ride
    * along because dequantization (`code * scale`) needs them and both
    * are exact (max over exact casts; one IEEE division).
    */
  def quantizeI8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = asDouble(col(vecCol))
    val maxabs = greatest(array_max(v), -array_min(v))
    df.select(col(idCol), maxabs.as("maxabs"),
      (maxabs / 127.0).as("scale"),
      graft.functions.functions.quantize_i8(v).as("codes"))
  }

  /** Product-quantization code assignment (Jégou, Douze & Schmid,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
    * the memory layer under billion-scale ANN (IVF-PQ): each vector
    * splits into `nSub` contiguous subvectors of `subDim` dims, each
    * subvector snaps to its nearest codebook centroid in that subspace,
    * and the vector is stored as `nSub` small codes (here 8×4 bits =
    * 4 bytes per 64-dim vector, a 64× compression over float64) plus
    * the exact total squared quantization error (`distortion`) — the
    * quantity PQ training monitors.
    *
    * Codebooks here are the first-`nCentroids`-by-id vectors' subvectors
    * (the deterministic seeding the IVF path also uses — swap in
    * per-subspace k-means for trained codebooks; same assignment join).
    * All distance math runs on integer-micros quantized components
    * (`⌊v·10⁶+0.5⌋`), so per-subspace squared L2 is EXACT int64
    * arithmetic and the oracle replays bitwise.
    *
    * Scale: one posexplode to components, codebook side broadcast
    * (nCentroids·dim rows), per-(vector, subspace, centroid) distances
    * reduce through map-side partial aggregation, argmin is an
    * `min(struct(dist, cid))` agg (NO per-vector window), and the final
    * code pivot is `nSub` conditional aggregates in ONE pass — keyed
    * aggs and a broadcast join only, nothing corpus-scale ever windows
    * or cross-shuffles.
    */
  /** Integer-micros subvector components: (__id, dim, m, q). */
  private def pqComponents(df: DataFrame, idCol: String, vecCol: String,
      subDim: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("__id"), col("dim"),
        expr(s"dim div $subDim").as("m"),
        floor(col("v") * 1e6 + 0.5).cast("long").as("q"))

  /** Per-(vector, subspace) nearest-codebook assignment in long form:
    * (__id, m, code, dist) — the shared stage under [[pqCodes]] and
    * [[pqAdcTopK]].
    */
  private def pqAssignments(comps: DataFrame, cents: DataFrame): DataFrame =
    comps.join(broadcast(cents), Seq("dim"))
      .groupBy(col("__id"), col("m"), col("cid"))
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("dist"))
      .groupBy(col("__id"), col("m"))
      .agg(min(struct(col("dist"), col("cid"))).as("__b"))
      .select(col("__id"), col("m"), col("__b.cid").as("code"),
        col("__b.dist").as("dist"))

  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
      nSub: Int = 8, subDim: Int = 8, nCentroids: Int = 16,
      codebook: Option[DataFrame] = None): DataFrame = {
    require(nSub >= 1 && subDim >= 1 && nCentroids >= 2,
      "pqCodes needs nSub, subDim >= 1 and nCentroids >= 2")
    // dims beyond nSub*subDim are dropped EXPLICITLY, so the emitted
    // distortion always corresponds to exactly the emitted codes
    val comps = pqComponents(df, idCol, vecCol, subDim)
      .filter(col("m") < nSub)
    val cents = codebook.getOrElse(comps.filter(col("__id") < nCentroids)
      .select(col("__id").as("cid"), col("dim"), col("q").as("cq")))
    val best = pqAssignments(comps, cents)
    val codeCols = (0 until nSub).map { i =>
      max(when(col("m") === i, col("code"))).as(s"code_$i")
    }
    best.groupBy(col("__id").as(idCol))
      .agg(codeCols.head, (codeCols.tail :+
        sum(col("dist")).as("distortion")): _*)
  }

  /** PQ asymmetric-distance (ADC) top-k search — the query leg of
    * IVF-PQ (Jégou et al., TPAMI 2011 §IV): the query stays EXACT while
    * the corpus is represented only by its PQ codes, so the per-pair
    * distance is a sum of `nSub` precomputed query↔centroid subspace
    * distances — a table of `nQueries × nSub × nCentroids` entries
    * (1 KB-scale) built once and BROADCAST, after which scoring the
    * whole corpus is one lookup-join + keyed sum, never touching the
    * original vectors. On integer-micros components every entry and
    * every ADC sum is exact int64, so ranks hash-gate.
    *
    * Scale: corpus → long-form codes (nSub rows/vector, row-local after
    * one broadcast assignment join), distance-table join is broadcast,
    * the per-(query, vector) sum partial-aggregates map-side, and the
    * top-k cut is [[graft.transform.Skew.aggTopK]] (r21) — a mergeable
    * bounded heap per query, cut map-side. Recall vs exact brute
    * force is pinned in OpsSpec on query ids DISJOINT from the
    * codebook seeds.
    */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, nSub: Int = 8, subDim: Int = 8,
      nCentroids: Int = 16, numSalts: Int = 8,
      codebook: Option[DataFrame] = None): DataFrame = {
    require(k >= 1 && nSub >= 1 && subDim >= 1 && nCentroids >= 2,
      "pqAdcTopK needs k, nSub, subDim >= 1 and nCentroids >= 2")
    val comps = pqComponents(corpus, idCol, vecCol, subDim)
      .filter(col("m") < nSub)
    val cents = codebook.getOrElse(comps.filter(col("__id") < nCentroids)
      .select(col("__id").as("cid"), col("dim"), col("q").as("cq")))
    val codes = pqAssignments(comps, cents).drop("dist")
    val dtable = pqComponents(queries, idCol, vecCol, subDim)
      .filter(col("m") < nSub)
      .withColumnRenamed("__id", "query_id")
      .join(broadcast(cents), Seq("dim"))
      .groupBy(col("query_id"), col("m").as("qm"), col("cid"))
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d"))
    val scored = codes
      .join(broadcast(dtable),
        col("m") === col("qm") && col("code") === col("cid"))
      .groupBy(col("query_id"), col("__id").as("neighbor_id"))
      .agg(sum(col("d")).as("adc_dist"))
    graft.transform.Skew.aggTopK(scored,
      partitionCols = Seq(col("query_id")),
      entry = struct(col("adc_dist"), col("neighbor_id")),
      k = k, rankCol = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adc_dist"))
  }

  /** Shared top-k-per-query stanza for the ANN paths: rank scored
    * candidate rows (columns `query_id`, `neighbor_id`, `cos`) and keep
    * the k best per query, ties pinned by neighbor id.
    *
    * r21 (guide §2.3): the cut is [[graft.transform.Skew.aggTopK]] — a
    * bounded per-query heap built MAP-SIDE and merged, so only k
    * entries per query per map partition ever shuffle. The previous
    * salted two-phase window still shuffled every scored row once
    * (brute force scores |queries|·|corpus| rows); the aggregate cut
    * measured 6.7 s → 3.3 s on the q174 kNN leg at sf0.1 and is
    * byte-identical (SkewSpec pins it; the (−cos, id) min-k replays
    * the (cos desc, id asc) window order exactly — double negation is
    * exact, and ±0.0 compare equal in Spark's ordering either way).
    * `numSalts` is retained for API stability; the aggregate cut needs
    * no salting (a giant query key reduces map-side by construction).
    */
  private def topKPerQuery(scored: DataFrame, k: Int, numSalts: Int): DataFrame =
    graft.transform.Skew.aggTopK(scored,
      partitionCols = Seq(col("query_id")),
      entry = struct((-col("cos")).as("__nc"),
        col("neighbor_id").as("neighbor_id")),
      k = k, rankCol = "rank", castRankTo = None)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        graft.util.Rounding.pround(-col("__nc"), 6).as("cosine"))

  /** Precompute (id, vector-as-double, norm) — norms are computed once
    * per row, not once per pair.
    */
  def withNorm(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), asDouble(col(vecCol)).as("__vec"))
      .withColumn("__norm", norm(col("__vec")))

  /** Deterministic negative sampling for contrastive training — `k`
    * pseudo-random negatives per anchor, picked by a Knuth-style
    * multiplicative hash over the CONTIGUOUS id space [0, N):
    * `neg = (id·2654435761 + j·40503) mod N`, bumped by one (mod N) on
    * self-collision. Hash-based picks are the reproducible-pipeline
    * device (same trade as [[Corpus.hashSplit]]): stable under reruns
    * and partitioning, no RNG state to ship, and — unlike `rand()` —
    * replayable by a second engine, so the emitted cosine of each
    * (anchor, negative) pair hash-gates. Requires ids 0..N−1 (true of
    * any post-[[graft.transform.Transforms]] surrogate-keyed corpus);
    * N itself is a 1-row broadcast.
    *
    * Scale: the anchor side explodes to N·k rows and joins the corpus
    * on the UNIFORM pseudo-random neg id — an ordinary keyed shuffle
    * with no hot key by construction (the multiplier scrambles any
    * anchor-id skew). Nothing is driver-side.
    */
  def negativePairs(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 4): DataFrame = {
    require(k >= 1, "negativePairs needs k >= 1")
    val n = df.agg(count(lit(1)).as("n_total"))
    val anchors = df.select(col(idCol).as("anchor_id"),
      asDouble(col(vecCol)).as("av"))
    val cand = df.select(col(idCol).as("neg_id"),
      asDouble(col(vecCol)).as("nv"))
    anchors.crossJoin(broadcast(n))
      .select(col("anchor_id"), col("av"), col("n_total"),
        explode(array((1 to k).map(lit): _*)).as("j"))
      .withColumn("raw",
        (col("anchor_id") * 2654435761L + col("j") * 40503L) % col("n_total"))
      .withColumn("neg_id",
        when(col("raw") === col("anchor_id"),
          (col("raw") + 1) % col("n_total")).otherwise(col("raw")))
      .join(cand, Seq("neg_id"))
      .select(col("anchor_id"), col("j").cast("long").as("j"), col("neg_id"),
        pround(cosine(col("av"), col("nv")), 6).as("cosine"))
  }

  /** Exact brute-force cosine top-k: for every query row, the k corpus
    * rows with highest cosine (ties pinned by neighbor id). The query
    * side is broadcast — the corpus streams by once, no all-pairs
    * shuffle. Self-matches (same id) are excluded.
    *
    * @return (query_id, neighbor_id, rank, cosine rounded to 6dp)
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, numSalts: Int = 16): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("__vec").as("cv"), col("__norm").as("cn"))
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__vec").as("qv"), col("__norm").as("qn"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topKPerQuery(scored, k, numSalts)
  }

  /** kNN label-noise screen (the confident-learning-style mislabel
    * detector, Northcutt et al., JAIR 2021 flavor): every vector's
    * 5-nearest neighbors vote with their labels; a vector whose
    * neighborhood majority disagrees with its own label is a mislabel
    * candidate, and a ≥`confidentVotes`-vote disagreement is a
    * confident one. Output is the per-label audit (n, majority-flag
    * count, confident-flag count, noise rate) a labeling pipeline
    * watches per ingestion batch.
    *
    * Scale: the kNN leg is pluggable via `neighbors` — any
    * `(corpus, queries, idCol, vecCol, k) => (query_id, neighbor_id, …)`
    * source. The default is [[bruteForceTopK]] with the corpus as its
    * own query set — the exact baseline, O(n·m) compute, fine for
    * audit-sized batches but quadratic when the corpus screens itself.
    * For the billion-row corpus pass the [[ivfTopK]] or [[pqAdcTopK]]
    * leg (partially applied): both are bucketed, the voting chain from
    * there on is identical keyed integer aggs. The majority is a
    * `max(struct)` argmax (ties to the smaller label), never a
    * per-vector window beyond the already-salted top-k.
    */
  def knnLabelNoise(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String, k: Int = 5, confidentVotes: Int = 4,
      neighbors: (DataFrame, DataFrame, String, String, Int) => DataFrame =
        bruteForceTopK(_, _, _, _, _)): DataFrame = {
    require(k >= 1 && confidentVotes >= 1 && confidentVotes <= k,
      "knnLabelNoise needs 1 <= confidentVotes <= k")
    val labels = df.select(col(idCol).as("__lid"),
      col(labelCol).cast("long").as("__lab"))
    val knn = neighbors(df, df, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    // plain keyed joins: the (id, label) map is corpus-scale, so it must
    // NOT be broadcast-hinted (AQE still broadcasts it when it is in
    // fact small); the knn frame is k rows per vector either way
    val voted = knn
      .join(labels.select(col("__lid").as("query_id"),
        col("__lab").as("qlab")), Seq("query_id"))
      .join(labels.select(col("__lid").as("neighbor_id"),
        col("__lab").as("nlab")), Seq("neighbor_id"))
      .groupBy(col("query_id"), col("qlab"), col("nlab"))
      .agg(count(lit(1)).as("v"))
    val majority = voted
      .groupBy(col("query_id"), col("qlab"))
      .agg(max(struct(col("v"), (-col("nlab")).as("negl"))).as("__m"))
      .select(col("query_id"), col("qlab"),
        (-col("__m.negl")).as("mlab"), col("__m.v").as("mv"))
    majority.groupBy(col("qlab").as("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("mlab") =!= col("qlab"), 1L).otherwise(0L))
          .as("n_majority_flag"),
        sum(when(col("mlab") =!= col("qlab") &&
          col("mv") >= confidentVotes, 1L).otherwise(0L))
          .as("n_confident_flag"))
      .withColumn("noise_rate", graft.util.Rounding.pround(
        col("n_majority_flag").cast("double") / col("n_vecs").cast("double"), 6))
  }

  /** ColBERT-style late-interaction MaxSim top-k (Khattab & Zaharia,
    * SIGIR 2020): vectors are treated as `nTok` contiguous token
    * subvectors of `tokDim` dims; the pair score is
    * Σ_queryToken max_corpusToken ⟨q_t, c_t⟩ — each query token finds
    * its best-matching corpus token, so partial/local matches score
    * where a single pooled cosine washes them out. On integer-micros
    * components every token dot, max, and sum is EXACT int64, so the
    * whole ranking hash-gates.
    *
    * Scale: the query side (queries × nTok × tokDim component rows) is
    * BROADCAST onto the corpus component stream keyed by within-token
    * offset — the corpus is touched once, dots partial-aggregate
    * map-side, the token-max and score-sum are keyed aggs, and the
    * final cut is the salted top-k. Nothing corpus-scale ever windows
    * or cross-shuffles.
    */
  def lateInteractionTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nTok: Int = 8,
      tokDim: Int = 8, numSalts: Int = 16): DataFrame = {
    require(k >= 1 && nTok >= 1 && tokDim >= 1,
      "lateInteractionTopK needs k, nTok, tokDim >= 1")
    // fused row-local MaxSim (r22): the exploded composition (per-
    // component rows joined on the offset, two aggregations) pushed
    // |corpus comps| × |query comps per offset| rows through the first
    // aggregation; the [[graft.functions.MaxSimMicros]] codegen loop
    // does the identical exact-int64 arithmetic once per (query,
    // corpus) PAIR row — no join key, no aggregation state, and the
    // query side broadcasts onto one corpus stream exactly like
    // [[bruteForceTopK]] (BroadcastNestedLoopJoin under the non-equi
    // id guard). FunctionsSpec pins byte-equivalence with the
    // composition; the q223/q224 oracles replay the composition in SQL,
    // so the hash gates are the end-to-end proof. The isNotNull filter
    // mirrors the composition exactly: a pair with no contributing
    // component never produced a maxSim row at all.
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("__qv"))
    val maxSim = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.functions
          .max_sim_micros(col("__qv"), col("__cv"), nTok, tokDim).as("maxsim"))
      .filter(col("maxsim").isNotNull)
    graft.transform.Skew.aggTopK(maxSim,
      partitionCols = Seq(col("query_id")),
      entry = struct((-col("maxsim")).as("__nm"),
        col("neighbor_id").as("neighbor_id")),
      k = k, rankCol = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        (-col("__nm")).as("maxsim"))
  }

  /** Per-dimension affine int8 scalar quantization — the cheap 4×
    * compression tier below PQ (what a vector store applies before any
    * codebook exists): per-dim corpus min/max of the integer-micros
    * components, `code = (q − mn)·255 div (mx − mn)` (∈ [0, 255], all
    * integer, exact), reconstruction `mn + code·(mx − mn) div 255`, and
    * the per-vector readout a quantization rollout monitors: total
    * squared reconstruction error (exact int64) plus an md5 fingerprint
    * of the code string (the cross-engine witness that every code byte
    * matches). Constant dims (mx = mn) code to 0 and reconstruct
    * exactly.
    *
    * Scale: one pass for the 2·dim-row min/max frame (broadcast back),
    * one row-local coding pass, one keyed rollup. The per-vector code
    * assembly is a dim-bounded collect_list — fixed width, never
    * corpus-bounded.
    */
  def scalarQuantize(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val comps = corpus.select(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("__id"), col("dim"),
        floor(col("v") * 1e6 + 0.5).cast("long").as("q"))
    val ranges = comps.groupBy(col("dim"))
      .agg(min(col("q")).as("mn"), max(col("q")).as("mx"))
    val coded = comps.join(broadcast(ranges), Seq("dim"))
      .withColumn("code",
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(expr("((q - mn) * 255) div (mx - mn)")))
      .withColumn("recon", col("mn") + expr("(code * (mx - mn)) div 255"))
    coded
      // stringify BEFORE the aggregate: GetArrayStructFields (`.code_str`)
      // is codegen'd, unlike an interpreted transform(...) lambda over
      // every vector's array (the no-HOF-in-hot-paths rule); dim is
      // unique per vector so the sort order is unchanged
      .withColumn("code_str", col("code").cast("string"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_dims"),
        sum((col("q") - col("recon")) * (col("q") - col("recon")))
          .as("total_sq_err"),
        md5(concat_ws(",",
          expr("array_sort(collect_list(struct(dim, code_str))).code_str")))
          .as("code_md5"))
  }

  /** PER-QUERY reciprocal-rank fusion — the hybrid-retrieval merge for
    * multi-leg SEARCH (dense cosine + late-interaction + BM25 …): every
    * (query, candidate) scores Σ_legs `1e6 div (rrfK + rank)` and
    * re-ranks within its query. The single-list rank-aggregation
    * variant is [[graft.transform.Ranking.rrfFuse]] (q116), which sums
    * IEEE divisions in declared list order — that device needs a
    * per-ranker column fold and cannot survive this shape: here the
    * legs meet in a UNION and a keyed SUM whose order no engine pins,
    * so the weights must be exact integers for the fused scores (and
    * hence the gate) to be order-independent.
    *
    * Input rankings: (query_id, neighbor_id, rank, …); candidates
    * missing from a leg simply contribute nothing (standard RRF).
    *
    * Scale: each leg is already top-k-per-query (k·queries rows); the
    * fuse is one union + one keyed sum + the salted cut — dimension-
    * scale work no matter the corpus.
    */
  def rrfFusePerQuery(rankings: Seq[DataFrame], k: Int = 10, rrfK: Int = 60,
      numSalts: Int = 8): DataFrame = {
    require(rankings.nonEmpty && k >= 1 && rrfK >= 0,
      "rrfFuse needs rankings, k >= 1, rrfK >= 0")
    val weighted = rankings.map(_.select(col("query_id"), col("neighbor_id"),
        expr(s"1000000 div ($rrfK + cast(rank as bigint))").as("__w")))
      .reduce(_ unionByName _)
    val fused = weighted.groupBy(col("query_id"), col("neighbor_id"))
      .agg(count(lit(1)).as("n_legs"), sum(col("__w")).as("rrf_micro"))
    graft.transform.Skew.aggTopK(fused,
      partitionCols = Seq(col("query_id")),
      entry = struct((-col("rrf_micro")).as("__nr"),
        col("neighbor_id").as("neighbor_id"), col("n_legs").as("n_legs")),
      k = k, rankCol = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("n_legs"), (-col("__nr")).as("rrf_micro"))
  }

  /** Embedding-space anisotropy audit (Ethayarajh, EMNLP 2019 flavor)
    * — the corpus-level readout that predicts whether cosine retrieval
    * will discriminate: mean pairwise dot vs mean self dot. Anisotropic
    * spaces (mean pairwise cosine ≫ 0) squash the usable similarity
    * range. The identity `Σ_{i≠j}⟨vᵢ,vⱼ⟩ = |Σᵢvᵢ|² − Σᵢ|vᵢ|²` turns
    * the O(n²) pair sum into per-dimension component sums: all
    * assembly is exact integer micros (component sums int64, their
    * squares in DECIMAL ↔ HUGEINT), then ONE fixed double-op sequence
    * per emitted statistic — bitwise cross-engine.
    *
    * Scale: one pass to the 64-row per-dim sum frame + one scalar agg;
    * no pair ever materializes.
    */
  def embeddingAnisotropy(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val comps = corpus.select(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("__id"), col("dim"),
        floor(col("v") * 1e6 + 0.5).cast("long").as("q"))
    val perDim = comps.groupBy(col("dim"))
      .agg(sum(col("q")).as("s"), sum(col("q") * col("q")).as("t"))
    val n = corpus.agg(count(lit(1)).as("n_vectors"))
    perDim.agg(
        sum(dec(col("s").cast("decimal(19,0)")) *
          dec(col("s").cast("decimal(19,0)"))).cast("decimal(38,0)").as("__s2"),
        sum(dec(col("t"))).cast("decimal(38,0)").as("__t"))
      .crossJoin(broadcast(n))
      .select(col("n_vectors"),
        graft.util.Rounding.pround(
          col("__t").cast("double") / col("n_vectors").cast("double")
            / 1e12, 6).as("mean_self_cos"),
        // ANSI guard: a 1-vector corpus has no pairs (n·(n−1) = 0)
        when(col("n_vectors") > 1L, graft.util.Rounding.pround(
          (col("__s2") - col("__t")).cast("decimal(38,0)").cast("double")
            / (col("n_vectors") * (col("n_vectors") - 1)).cast("double")
            / 1e12, 6)).as("mean_pair_cos"))
  }

  /** Per-dimension variance spectrum — the dead-dimension screen a
    * vector pipeline runs before trusting distance math: exact DECIMAL
    * moments per dim (the corrByKey device), variance =
    * `(n·Σq² − (Σq)²)/n²` on integer micros, dead = zero spread.
    * 64-row output, one component pass.
    */
  def dimVarianceSpectrum(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    def dec(c: Column) = c.cast("decimal(38,0)")
    val comps = corpus.select(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("__id"), col("dim").cast("long").as("dim"),
        floor(col("v") * 1e6 + 0.5).cast("long").as("q"))
    comps.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), min(col("q")).as("min_micro"),
        max(col("q")).as("max_micro"),
        sum(dec(col("q"))).cast("decimal(38,0)").as("__s1"),
        sum(dec(col("q").cast("decimal(19,0)")) *
          dec(col("q").cast("decimal(19,0)"))).cast("decimal(38,0)").as("__s2"))
      .select(col("dim"), col("n"), col("min_micro"), col("max_micro"),
        graft.util.Rounding.pround(
          (dec(col("n")) * col("__s2") - col("__s1") * col("__s1"))
            .cast("decimal(38,0)").cast("double")
            / (col("n") * col("n")).cast("double") / 1e12, 6)
          .as("variance"),
        (col("max_micro") === col("min_micro")).cast("long").as("dead"))
  }

  /** Integer-micro DCG position weights `round(1e6 / log2(i+1))` for
    * ranks 1..k. Computed ONCE driver-side and inlined as literals into
    * both the Spark plan and the SQL oracle (the hyperplane-literal
    * device), so no engine ever evaluates a transcendental: DCG becomes
    * exact integer arithmetic in both engines.
    */
  def ndcgWeightsMicro(k: Int): Seq[Long] =
    (1 to k).map(i => math.round(1e6 / (math.log(i + 1.0) / math.log(2.0))))

  /** Retrieval-quality NDCG@k (Järvelin & Kekäläinen, TOIS 2002) of a
    * label-match run: each query's k nearest corpus vectors (exact
    * brute-force cosine, [[bruteForceTopK]]) are graded relevant when
    * they carry the query's label, and the ranking is scored
    * `DCG@k / IDCG@k` with the standard `1/log2(rank+1)` discount —
    * the eval a retrieval pipeline quotes per index build. A query
    * with zero relevant neighbors scores 0 by convention.
    *
    * Exactness: discounts are the [[ndcgWeightsMicro]] integer-micro
    * literals, so DCG/IDCG are exact longs (association-free — no
    * double group-sum anywhere) and the single final division rounds
    * once. IDCG@R is the literal prefix-sum table looked up at
    * `R = min(k, corpus docs sharing the query's label − 1)` — the
    * CORPUS-wide relevant count, so a run that buries reachable
    * relevant docs below rank k is penalized (an IDCG from the
    * retrieved-relevant count alone would score any
    * relevant-first prefix 1.0 regardless of misses).
    *
    * Scale: the kNN leg is [[bruteForceTopK]] (query side broadcast,
    * salted top-k — swap the ANN paths in at billion-row scale); the
    * label attach is two keyed joins of the Q×k hit frame against the
    * corpus label projection (no broadcast hint — corpus-scale); the
    * scoring is one keyed agg + row-local literal lookups.
    */
  def retrievalNdcg(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int = 10,
      numSalts: Int = 16): DataFrame = {
    require(k >= 1, "retrievalNdcg needs k >= 1")
    val w = ndcgWeightsMicro(k)
    val idcg = w.scanLeft(0L)(_ + _).tail // IDCG@R for R = 1..k
    val labels = corpus.select(col(idCol).as("__lid"),
      col(labelCol).cast("long").as("__lab"))
    // corpus-wide relevant counts per label: label-cardinality-sized,
    // broadcast (this is what makes IDCG the true ideal, see scaladoc)
    val labelCounts = labels.groupBy(col("__lab").as("qlab"))
      .agg(count(lit(1)).as("__labn"))
    val hits = bruteForceTopK(corpus, queries, idCol, vecCol, k, numSalts)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("int").as("rank"))
      .join(labels.select(col("__lid").as("query_id"), col("__lab").as("qlab")),
        Seq("query_id"))
      .join(labels.select(col("__lid").as("neighbor_id"), col("__lab").as("nlab")),
        Seq("neighbor_id"))
      .withColumn("__rel", when(col("qlab") === col("nlab"), 1L).otherwise(0L))
      .withColumn("__gain",
        col("__rel") * element_at(array(w.map(lit): _*), col("rank")))
    hits.groupBy(col("query_id"), col("qlab"))
      .agg(sum(col("__gain")).as("dcg_micro"),
        sum(col("__rel")).as("n_rel"))
      .join(broadcast(labelCounts), Seq("qlab"))
      .withColumn("__r", least(lit(k.toLong), col("__labn") - 1L).cast("int"))
      .withColumn("ndcg", when(col("__r") <= 0, lit(0.0)).otherwise(
        pround(col("dcg_micro").cast("double") /
          element_at(array(idcg.map(lit): _*), col("__r")).cast("double"), 6)))
      .select(col("query_id"), col("qlab").as("label"), col("dcg_micro"),
        col("n_rel"), col("ndcg"))
  }

  /** MRR + MAP@k — the other two thirds of the retrieval-eval triple
    * beside [[retrievalNdcg]]: mean-reciprocal-rank rewards the FIRST
    * relevant hit's position, average precision integrates precision
    * at every relevant position. Same label-match relevance, same
    * exact cosine ranking replay (q20), so both gate cross-engine:
    * `rr = 1/first_rel_rank` is a single division of exact operands,
    * and the AP accumulation runs as a rank-ordered running sum on the
    * per-query k-row frame (frame-pinned association), normalized by
    * `min(k, R)` with R the corpus-truth relevant count — the same
    * ideal-denominator honesty as NDCG's IDCG@R.
    */
  def retrievalMrrMap(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int = 10,
      numSalts: Int = 16): DataFrame = {
    require(k >= 1, "retrievalMrrMap needs k >= 1")
    import org.apache.spark.sql.expressions.Window
    val labels = corpus.select(col(idCol).as("__lid"),
      col(labelCol).cast("long").as("__lab"))
    val labelCounts = labels.groupBy(col("__lab").as("qlab"))
      .agg(count(lit(1)).as("__labn"))
    val hits = bruteForceTopK(corpus, queries, idCol, vecCol, k, numSalts)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .join(labels.select(col("__lid").as("query_id"), col("__lab").as("qlab")),
        Seq("query_id"))
      .join(labels.select(col("__lid").as("neighbor_id"), col("__lab").as("nlab")),
        Seq("neighbor_id"))
      .withColumn("__rel", when(col("qlab") === col("nlab"), 1L).otherwise(0L))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("rank").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = hits
      .withColumn("__cumrel", sum(col("__rel")).over(wq))
      .withColumn("__apterm", when(col("__rel") === 1L,
        col("__cumrel").cast("double") / col("rank").cast("double"))
        .otherwise(lit(0.0)))
      .withColumn("__apcum", sum(col("__apterm")).over(wq))
    val per = scored.groupBy(col("query_id"), col("qlab"))
      .agg(min(when(col("__rel") === 1L, col("rank"))).as("first_rel_rank"),
        sum(col("__rel")).as("n_rel"),
        max(struct(col("rank"), col("__apcum"))).as("__last"))
    per.join(broadcast(labelCounts), Seq("qlab"))
      .withColumn("__r", least(lit(k.toLong), col("__labn") - 1L))
      .select(col("query_id"), col("qlab").as("label"),
        col("first_rel_rank"),
        when(col("first_rel_rank").isNotNull,
          lit(1.0) / col("first_rel_rank").cast("double")).as("rr"),
        col("n_rel"),
        when(col("__r") <= 0L, lit(0.0)).otherwise(
          pround(col("__last.__apcum") / col("__r").cast("double"), 6))
          .as("ap"))
  }

  /** Hard-negative mining for contrastive training: for each anchor,
    * the `k` most-similar corpus vectors carrying a DIFFERENT label —
    * the negatives that actually shape a contrastive margin, vs the
    * uniform pseudo-random draws of [[negativePairs]] (the easy
    * baseline). The different-label constraint is part of the JOIN, so
    * the ranking is exact over the full eligible set (no
    * filter-after-top-k pool that could starve an anchor whose
    * neighborhood is same-label).
    *
    * Scale: identical posture to [[bruteForceTopK]] — anchor side
    * broadcast, corpus scanned once, salted per-anchor top-k; swap the
    * ANN paths in for the billion-row corpus.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int = 5,
      numSalts: Int = 16): DataFrame = {
    // labels project alongside the vector in ONE pass — no re-join of
    // the corpus against itself just to recover a sibling column
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(labelCol).cast("long").as("nlab"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
        col(labelCol).cast("long").as("qlab"),
        asDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val scored = c.join(broadcast(q),
        col("query_id") =!= col("neighbor_id") && col("qlab") =!= col("nlab"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    graft.transform.Skew.aggTopK(scored,
      partitionCols = Seq(col("query_id"), col("qlab")),
      entry = struct((-col("cos")).as("__nc"),
        col("neighbor_id").as("neighbor_id"), col("nlab").as("nlab")),
      k = k, rankCol = "rank")
      .select(col("query_id"), col("qlab"), col("neighbor_id"), col("nlab"),
        col("rank"), graft.util.Rounding.pround(-col("__nc"), 6).as("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs within a blocking key (e.g. a
    * cluster/label/LSH bucket): pairs (a < b) in the same block with
    * cosine above `threshold`. The join key is the block — never
    * all-pairs — and the within-block self-join is salted
    * ([[graft.transform.Skew.saltedBlockSelfJoin]]) so one hot block's
    * O(B²) pair work spreads over numSalts² reducers instead of one.
    * Salting costs numSalts× input replication, which pays off exactly
    * when block cardinality is small relative to parallelism (blocks ARE
    * hot — a handful of labels/clusters over millions of rows, the
    * typical near-dup shape). For many small uniform blocks pass
    * `numSalts = 1` to skip replication.
    *
    * Salting spreads the O(B²) pair work but does not shrink it — when
    * block sizes are unbounded, pass `blockCap` to truncate each block
    * to its `cap` smallest ids ([[Dedup.capBlocks]]) before pair
    * generation, bounding output at O(cap²) per block.
    */
  def blockedCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, blockCol: String,
      threshold: Double, numSalts: Int = 8,
      blockCap: Option[Int] = None): DataFrame = {
    val members = blockCap.fold(df.select(col(idCol), col(blockCol)))(cap =>
      Dedup.capBlocksDistinct(
        df.select(col(idCol), col(blockCol)), blockCol, idCol, cap))
    val n = withNorm(df, idCol, vecCol)
      .join(members, idCol)
    val a = n.select(col(blockCol).as("block"), col(idCol).as("a"),
      col("__vec").as("va"), col("__norm").as("na"))
    val b = n.select(col(blockCol).as("block"), col(idCol).as("b"),
      col("__vec").as("vb"), col("__norm").as("nb"))
    val joined =
      if (numSalts > 1)
        graft.transform.Skew.saltedBlockSelfJoin(a, b, "block", col("a"), col("b"), numSalts)
      else a.join(b, "block")
    joined
      .filter(col("a") < col("b"))
      .withColumn("cos", graft.util.Rounding.pround(
        dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") > threshold)
      .select(col("block"), col("a"), col("b"), col("cos"))
  }

  /** MLlib k-means centroids for IVF, in the (centroid_id, centv, centn)
    * shape [[ivfTopK]] consumes. Deterministic under a fixed seed. The
    * scale path: k-means|| init + Lloyd iterations are all
    * executor-parallel; only the k centers come back to the driver.
    */
  def kmeansCentroids(
      corpus: DataFrame, vecCol: String, k: Int,
      seed: Long = 42L, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(corpus.select(
        array_to_vector(col(vecCol).cast("array<double>")).as("features")))
    model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toArray) }
      .toDF("centroid_id", "centv")
      .withColumn("centn", norm(col("centv")))
  }

  // ------------------------------------------------- trained codebooks
  /** Deterministic integer Lloyd's (k-means) over micro-quantized
    * components — the TRAINED-codebook path for IVF and PQ that is
    * still fully hash-gateable: unlike MLlib's [[kmeansCentroids]]
    * (float means, partition-order-dependent sums), every quantity
    * here is exact integer arithmetic, so a second engine replays the
    * whole training loop bitwise.
    *
    * The device: components are shifted micros `qs = ⌊v·10⁶+0.5⌋ +
    * 2·10⁶ ≥ 0` (the shift keeps floor-division semantics identical
    * across engines — Spark `div` == DuckDB `//` for non-negative
    * operands, CLAUDE.md rule). Assignment is exact int64 squared-L2
    * (shift-invariant); the centroid update is the INTEGER mean
    * `sum(qs) div count` — one deterministic rounding per component
    * per round, associative, engine-independent. Centroids that lose
    * all members simply drop out (both engines agree). A fixed
    * iteration count, not a convergence test, keeps the replay static.
    *
    * Input `comps`: (__id, m, dim, qs) — `m` is the subspace id
    * (constant 0 for full-vector IVF training); init is the first-`k`
    * ids' components (the established seeding). Output: (m, cid, dim,
    * cq) shifted micros.
    *
    * Scale: each round is one broadcast join against the ≤ k·dim-row
    * codebook, one map-side-combining keyed agg per stage; the
    * codebook is eagerly checkpointed per round (the greedy-loop
    * rule — replanning compounds otherwise). `sum(qs)` overflows int64
    * only beyond ~3·10¹² rows per (cluster, dim); train on a
    * hash-split sample long before that (standard ANN practice — the
    * codebook needs thousands of points per centroid, not the corpus):
    * [[lloydCentroids]]/[[lloydPqCodebook]] take the sample predicate
    * as `trainFilter`, a WIRED parameter so the billion-row
    * configuration is a call-site choice, not a code edit.
    */
  /** One Lloyd round's assignment: nearest centroid per (__id, m) with
    * its exact int64 distance — (__id, m, cid, dist).
    */
  private def lloydAssign(comps: DataFrame, cents: DataFrame): DataFrame =
    comps.join(broadcast(cents.drop("m")), Seq("dim"))
      .groupBy(col("__id"), col("m"), col("cid"))
      .agg(sum((col("qs") - col("cq")) * (col("qs") - col("cq"))).as("dist"))
      .groupBy(col("__id"), col("m"))
      .agg(min(struct(col("dist"), col("cid"))).as("__b"))
      .select(col("__id"), col("m"), col("__b.cid").as("cid"),
        col("__b.dist").as("dist"))

  /** One Lloyd round's centroid update: integer mean per (m, cid, dim). */
  private def lloydUpdate(comps: DataFrame, assign: DataFrame): DataFrame =
    comps.join(assign.select(col("__id"), col("m"), col("cid")), Seq("__id", "m"))
      .groupBy(col("m"), col("cid"), col("dim"))
      .agg(sum(col("qs")).as("sq"), count(lit(1)).as("cnt"))
      .select(col("m"), col("cid"), col("dim"),
        expr("sq div cnt").as("cq"))

  private def lloydInit(comps: DataFrame, k: Int): DataFrame =
    comps.filter(col("__id") < k)
      .select(col("m"), col("__id").as("cid"), col("dim"), col("qs").as("cq"))

  private[ops] def lloydMicroCodebooks(
      comps: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 2 && iters >= 1, "lloydMicroCodebooks needs k >= 2, iters >= 1")
    var cents = lloydInit(comps, k).localCheckpoint(true)
    for (_ <- 1 to iters) {
      cents = lloydUpdate(comps, lloydAssign(comps, cents)).localCheckpoint(true)
    }
    cents
  }

  /** Lloyd training-convergence curve — the monitor a codebook-training
    * job watches per round: for each round t, the exact int64 TOTAL
    * DISTORTION (sum of nearest-centroid squared-L2) of the assignment
    * against round t−1's centroids, plus the assigned unit count. The
    * same exact-integer arithmetic as [[lloydMicroCodebooks]], so every
    * round's readout hash-gates bitwise (approximate-monotone decrease;
    * the integer means can tick a round up by a rounding quantum, which
    * is exactly why the curve is worth emitting).
    *
    * Output: (round, n_assigned, total_distortion), rounds 1..iters.
    */
  def lloydTrainingCurve(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 3,
      trainFilter: Option[Column] = None): DataFrame = {
    require(k >= 2 && iters >= 1, "lloydTrainingCurve needs k >= 2, iters >= 1")
    val comps = trainFilter.map(corpus.filter).getOrElse(corpus)
      .select(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("__id"), lit(0).as("m"), col("dim"),
        (floor(col("v") * 1e6 + 0.5).cast("long") + 2000000L).as("qs"))
    var cents = lloydInit(comps, k).localCheckpoint(true)
    val rounds = (1 to iters).map { t =>
      val assign = lloydAssign(comps, cents).localCheckpoint(true)
      cents = lloydUpdate(comps, assign).localCheckpoint(true)
      assign.agg(count(lit(1)).as("n_assigned"),
          sum(col("dist")).as("total_distortion"))
        .select(lit(t.toLong).as("round"), col("n_assigned"),
          col("total_distortion"))
    }
    rounds.reduce(_ unionByName _)
  }

  /** Trained full-vector IVF centroids via [[lloydMicroCodebooks]], in
    * the (centroid_id, centv, centn) shape [[ivfTopK]] consumes — the
    * hash-gateable alternative to [[kmeansCentroids]]. Element
    * `cq/10⁶ − 2` converts back to a double with one rounding each
    * engine performs identically.
    */
  def lloydCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 3,
      trainFilter: Option[Column] = None): DataFrame = {
    val comps = trainFilter.map(corpus.filter).getOrElse(corpus)
      .select(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("__id"), lit(0).as("m"), col("dim"),
        (floor(col("v") * 1e6 + 0.5).cast("long") + 2000000L).as("qs"))
    // tiny frame from here on (k rows): collect_list + transform are
    // fine outside the hot path
    lloydMicroCodebooks(comps, k, iters)
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"),
        ((col("cq") - 2000000L).cast("double") / 1e6).as("v")))).as("__a"))
      .select(col("cid").as("centroid_id"),
        expr("transform(__a, x -> x.v)").as("centv"))
      .withColumn("centn", norm(col("centv")))
  }

  /** Exact nearest-centroid assignment HISTOGRAM of a corpus against a
    * served codebook — the reference snapshot a staleness monitor
    * persists at train time and the current-side readout it recomputes
    * per run ([[codebookStaleness]]). Assignment is the exact int64
    * squared-L2 argmin of [[lloydMicroCodebooks]]' own arithmetic
    * (both sides micro-quantized; `centv` doubles round-trip back to
    * the trained integer micros exactly), so the histogram hash-gates:
    * no float ever enters the cell decision. `extraKeys` prepends
    * grouping columns (the scenario axis in q240).
    *
    * Scale: one corpus scan, the ≤ k·dim-row codebook broadcast onto
    * it, one map-side-combining keyed agg; output is k rows per key
    * group — metadata scale.
    */
  def assignmentCounts(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = extraKeys.map(col)
    val comps = corpus
      .select(keys ++ Seq(col(idCol).as("__id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v"))): _*)
      .select(keys ++ Seq(col("__id"), col("dim"),
        (floor(col("v") * 1e6 + 0.5).cast("long") + 2000000L).as("qs")): _*)
    val ccomps = centroids
      .select(col("centroid_id").cast("long").as("cid"),
        posexplode(asDouble(col("centv"))).as(Seq("dim", "cv")))
      .select(col("cid"), col("dim"),
        (floor(col("cv") * 1e6 + 0.5).cast("long") + 2000000L).as("cq"))
    comps.join(broadcast(ccomps), Seq("dim"))
      .groupBy(keys ++ Seq(col("__id"), col("cid")): _*)
      .agg(sum((col("qs") - col("cq")) * (col("qs") - col("cq"))).as("dist"))
      .groupBy(keys :+ col("__id"): _*)
      .agg(min(struct(col("dist"), col("cid"))).as("__b"))
      .select(keys :+ col("__b.cid").as("cid"): _*)
      .groupBy(keys :+ col("cid"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Row-local exact nearest-centroid assignment — one (id, cid) row
    * per vector. The codebook is COLLECTED and embedded into a single
    * custom codegen expression
    * ([[graft.functions.CodebookArgmin]] — a bounded driver valve:
    * k·dim values by construction, 16×8 here; the limit case of
    * broadcasting it), so assignment is ONE tight generated loop per
    * row: scan → codegen'd project, ZERO shuffle and zero join of the
    * increment. A composition of built-in expressions (per-centroid
    * sum trees + least-of-structs) computes the same argmin but blows
    * Janino's method limit at this k×dim and silently degrades to
    * interpreted evaluation — SimilaritySpec pins byte-equivalence of
    * the expression against exactly that composition, and against
    * [[assignmentCounts]]' join-formulated histogram. The (dist ASC,
    * cid ASC) tie-break matches the oracles' row_number spelling. That
    * plan shape is what makes per-arrival index maintenance
    * O(increment) scan-only ([[assignIncrement]]); PlanSpec pins the
    * no-Exchange plan.
    */
  def assignToCodebook(newVecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, keep: Seq[String] = Nil): DataFrame =
    assignCollected(newVecs, idCol, vecCol, collectCodebook(centroids), keep)

  /** [[assignToCodebook]] from an ALREADY-collected codebook — what lets
    * one collect drive both the version stamp and every partition
    * write of a maintenance verb (ADVICE r16: with a LAZY centroids
    * plan each collect re-executes the whole training job, so
    * [[assignIncrement]]/[[reassignStale]] must collect exactly once).
    */
  private def assignCollected(newVecs: DataFrame, idCol: String,
      vecCol: String, cents: Array[(Long, Array[Long])],
      keep: Seq[String] = Nil): DataFrame = {
    require(cents.nonEmpty, "assignToCodebook needs a non-empty codebook")
    newVecs.select((col(idCol) +: keep.map(col)) :+
      graft.functions.functions.codebook_argmin(
        asDouble(col(vecCol)), cents.map(_._1).toIndexedSeq,
        cents.map(_._2.toIndexedSeq).toIndexedSeq).as("cid"): _*)
  }

  /** The collected micro-quantized codebook — the bounded driver valve
    * shared by [[assignToCodebook]] and [[codebookVersionOf]]: k·dim
    * longs by construction.
    */
  private def collectCodebook(
      centroids: DataFrame): Array[(Long, Array[Long])] = centroids
    .select(col("centroid_id").cast("long"), asDouble(col("centv")))
    .collect()
    .map(r => (r.getLong(0),
      r.getSeq[Double](1).map(v =>
        math.floor(v * 1e6 + 0.5).toLong + 2000000L).toArray))
    .sortBy(_._1)

  /** Content-derived identity stamp of a codebook ARTIFACT — md5 over
    * the canonical (cid, micro-quantized components) rows, the exact
    * integers assignment runs on (so two codebooks assign identically
    * iff their stamps match). This is what [[assignIncrement]] /
    * [[reassignStale]] stamp by DEFAULT (ADVICE r14): a retrain under
    * unchanged training code still yields a fresh stamp, so
    * [[assignStateVersions]] detects the mix and [[reassignStale]] sees
    * the stale partitions — the failure the static
    * [[TrainingCodeVersion]] stamp could not catch.
    */
  def codebookVersionOf(centroids: DataFrame): String =
    versionOfCollected(collectCodebook(centroids))

  /** [[codebookVersionOf]] from an already-collected codebook — see
    * [[assignCollected]] for why maintenance verbs collect once and
    * derive both the stamp and the argmin literals from the same array.
    */
  private def versionOfCollected(cents: Array[(Long, Array[Long])]): String =
    "cb-" + md5Hex16(cents
      .map { case (cid, qs) => s"$cid:${qs.mkString(",")}" }
      .mkString(";"))

  /** [[codebookVersionOf]] for the PQ per-subspace codebook shape
    * (cid, dim, cq) — the artifact [[pqCodesIncrement]] stamps by
    * default. Bounded driver valve: nSub·nCentroids·subDim longs.
    */
  def pqCodebookVersionOf(codebook: DataFrame): String =
    "pq-" + md5Hex16(codebook
      .select(col("cid").cast("long"), col("dim").cast("long"),
        col("cq").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.map { case (c, d, q) => s"$c:$d:$q" }.mkString(";"))

  private def md5Hex16(canonical: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(16)

  /** Incremental ANN index maintenance (VERDICT r13 #8): assign ONE
    * arrival of new vectors to the SERVED codebook and append the
    * assignments as `stateDir/assign/batch=<batchId>` — the
    * arrival-partitioned curation-state pattern on the index side.
    * Between retrains (q240 decides WHEN; q241 is the retrain) the
    * accumulated partitions ARE the incrementally-maintained index
    * metadata: summing them per cid yields the staleness monitor's
    * current-side histogram with no corpus rescan, and per-cell posting
    * lists for IVF probing are exactly these rows grouped by cid.
    * Assignment is per-vector independent, so accumulated increments
    * equal the from-scratch assignment of the union — q252 hash-gates
    * that INCLUDING the persistence plumbing (the oracle replays
    * training + assignment from scratch in SQL). Same contracts as the
    * curation state: monotone batchIds, overwrite-idempotent retries,
    * `batch`-pruned reads, [[graft.pipelines.CurationState]] compaction
    * applies unchanged (pass `tables = Seq("assign")` — its rewrites
    * preserve the nested layout below).
    *
    * Layout (VERDICT r16 #1): each arrival writes
    * `assign/batch=N/cid=K` — the cell is a PARTITION DIRECTORY, not
    * just a column, so [[ivfStateTopK]]'s probed-cell union reaches the
    * scan's PartitionFilters and a serve touches ~nprobe/cells of the
    * state files. `cid` therefore surfaces on read as an inferred
    * partition column (IntegerType); readers here cast it back to
    * long. Arrivals must be non-empty (a zero-row partitioned write
    * leaves no readable footer — skip empty micro-batches upstream,
    * [[graft.streaming.StreamingIngest]] does).
    */
  def assignIncrement(newVecs: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, stateDir: String, batchId: Long,
      codebookVersion: String = "", payloadCols: Seq[String] = Nil): DataFrame = {
    val spark = newVecs.sparkSession
    // ONE collect drives both the stamp and the argmin literals — with
    // a lazy centroids plan a second collect would re-run the whole
    // training job (ADVICE r16)
    val cents = collectCodebook(centroids)
    // the assignment is only meaningful relative to the codebook that
    // made it: stamp the version so a retrain (q241) between arrivals
    // cannot silently blend assignments from different codebooks —
    // readers filter/assert via [[currentAssignments]] /
    // [[assignStateVersions]]. The default ("" = derive) stamps the
    // codebook ARTIFACT's content identity ([[codebookVersionOf]]), so
    // a retrain under unchanged training code cannot silently reuse a
    // stale stamp (ADVICE r14); pass an explicit registry version id
    // to pin the stamp to an external artifact catalog instead.
    val ver =
      if (codebookVersion.isEmpty) versionOfCollected(cents)
      else codebookVersion
    writeAssignBatch(newVecs, idCol, vecCol, cents, ver, stateDir,
      batchId, payloadCols)
    spark.read.parquet(s"$stateDir/assign/batch=$batchId")
      .withColumn("cid", col("cid").cast("long"))
  }

  /** One arrival's partition write — shared by [[assignIncrement]] and
    * [[reassignStale]] so each verb collects the codebook exactly once
    * (ADVICE r16). `partitionBy("cid")` is the cell-pruned layout
    * (VERDICT r16 #1); mode overwrite truncates the whole `batch=N`
    * dir first, so a retried arrival leaves no orphan cell dirs.
    */
  private def writeAssignBatch(newVecs: DataFrame, idCol: String,
      vecCol: String, cents: Array[(Long, Array[Long])], ver: String,
      stateDir: String, batchId: Long, payloadCols: Seq[String]): Unit =
    // payloadCols ride along into the persisted postings (typically the
    // vector itself) so the index can SERVE searches without joining
    // back to the corpus ([[ivfStateTopK]])
    assignCollected(newVecs, idCol, vecCol, cents, keep = payloadCols)
      .withColumn("codebook_version", lit(ver))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$stateDir/assign/batch=$batchId")

  /** Crash-safe in-place rewrite of one state partition — the
    * [[graft.pipelines.CurationState]] hidden-tmp + `_SUCCESS` + rename
    * protocol shared by the repair verbs ([[reassignStale]] /
    * [[reencodeStale]]). The repair CANNOT use a bare in-place
    * overwrite the way an increment retry can: an increment retry is
    * re-driven by the caller with the original arrival data, but the
    * repair's worklist is derived from the very partition being
    * rewritten — a crash between SaveMode.Overwrite's delete and its
    * commit would leave the partition footerless AND remove it from
    * the next run's stale listing, silently losing the arrival
    * forever. Here the replacement is built in a dot-dir invisible to
    * Spark listings, the original is deleted only after `_SUCCESS`
    * certifies it, and a crash at any point is recovered by
    * [[graft.pipelines.CurationState.recoverOrphanSwaps]] on the next
    * maintenance op (the repair verbs run it on entry).
    */
  private def swapRepairedPartition(
      fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path, batchId: Long)(
      writeTo: String => Unit): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(table, s".repair-tmp-$batchId")
    fs.delete(tmp, true)
    writeTo(tmp.toString)
    val part = new org.apache.hadoop.fs.Path(table, s"batch=$batchId")
    fs.delete(part, true)
    if (!fs.rename(tmp, part))
      throw new java.io.IOException(
        s"repair swap rename failed for $tmp — re-run the repair to " +
          "recover (tmp is complete)")
  }

  /** Distinct codebook versions present in the persisted assign state,
    * sorted — more than one means arrivals were assigned under
    * different codebooks (a retrain happened without re-assigning or
    * purging the stale partitions): the accumulated histogram is a
    * cross-version blend and must not feed the staleness monitor.
    */
  def assignStateVersions(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): Seq[String] =
    spark.read.parquet(s"$stateDir/assign")
      .select(col("codebook_version")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** The assign state restricted to ONE codebook version (pass the
    * serving codebook's [[codebookVersionOf]] stamp, or the explicit
    * registry id the increments were stamped with) — the safe readout
    * after a retrain, until stale partitions are repaired
    * ([[reassignStale]]) or purged
    * ([[graft.pipelines.CurationState.purgeDocs]] /
    * `compactState(tables = Seq("assign"))` apply unchanged).
    *
    * `cells`, when non-empty, restricts the read to those cell ids as a
    * LITERAL predicate on the `cid` partition directories — it reaches
    * the scan's PartitionFilters, so a probe-bounded serve lists and
    * opens only ~nprobe/cells of the state files (the cast back to
    * long sits above the scan and does not block pruning).
    */
  def currentAssignments(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, codebookVersion: String,
      cells: Seq[Long] = Nil): DataFrame = {
    val st = spark.read.parquet(s"$stateDir/assign")
    val pruned =
      if (cells.isEmpty) st else st.filter(col("cid").isin(cells: _*))
    pruned
      .filter(col("codebook_version") === codebookVersion)
      .withColumn("cid", col("cid").cast("long"))
  }

  /** The staleness monitor's current-side histogram read FROM the
    * maintained assign state — O(state scan), NO corpus rescan
    * (VERDICT r17 #4; the claim [[assignIncrement]]'s docstring made,
    * now a verb — the IVF mirror of [[pqCodeHistogram]]). Summing the
    * accumulated `assign/batch=N/cid=K` partitions per cid IS the
    * [[assignmentCounts]] histogram of everything absorbed so far,
    * because assignment is per-vector independent and each arrival was
    * assigned under the version being read. At 100 TB the monitor is
    * the verb you run most often; this makes its cost proportional to
    * the index metadata, not the corpus.
    */
  def assignHistogram(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, codebookVersion: String,
      cells: Seq[Long] = Nil): DataFrame =
    currentAssignments(spark, stateDir, codebookVersion, cells)
      .groupBy(col("cid")).agg(count(lit(1)).as("n"))

  /** REPAIR after a retrain — the missing third verb of the index
    * lifecycle (q240 detects staleness, q241 retrains, this re-absorbs
    * the history): every assign partition written under a codebook
    * version OTHER than the serving one is rewritten in place by
    * re-assigning its ids' vectors (looked up in `corpus` by semi-join)
    * under the serving `centroids`. Partitions are version-uniform by
    * construction (one [[assignIncrement]] call writes one partition
    * under one version), so staleness is a per-PARTITION property and
    * the repair touches exactly the stale partitions — current ones
    * keep their files. Ids no longer in `corpus` (purged docs) simply
    * drop out of the rewritten partition: a forgotten doc leaves the
    * index on the next repair. Each partition rewrite goes through the
    * crash-safe swap ([[swapRepairedPartition]] — hidden tmp +
    * `_SUCCESS` + rename, orphans recovered on entry): unlike an
    * increment retry, the repair's worklist lives in the rows being
    * rewritten, so a torn in-place overwrite would lose the partition
    * AND its worklist entry at once. After a successful repair
    * [[assignStateVersions]] returns exactly the serving version and
    * [[currentAssignments]] equals the full state. Returns the
    * repaired batch ids (bounded driver valve — one value per stale
    * partition).
    */
  def reassignStale(stateDir: String, corpus: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, codebookVersion: String = "",
      payloadCols: Seq[String] = Nil): Seq[Long] = {
    val spark = corpus.sparkSession
    // ONE collect for the whole repair — the stamp and every stale
    // partition's rewrite derive from the same array (ADVICE r16: a
    // per-batch collect of a lazy centroids plan would re-run training
    // once per stale partition)
    val cents = collectCodebook(centroids)
    val ver =
      if (codebookVersion.isEmpty) versionOfCollected(cents)
      else codebookVersion
    val table = new org.apache.hadoop.fs.Path(s"$stateDir/assign")
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(table))
      graft.pipelines.CurationState.recoverOrphanSwaps(spark, fs, table)
    val staleBatches = spark.read.parquet(s"$stateDir/assign")
      .filter(col("codebook_version") =!= ver)
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    // per-PARTITION repairs are independent (each reads and swaps only
    // its own batch=N dir) — overlap them so one repair's scheduling
    // tail back-fills with the next partition's work (guide §2.6)
    graft.util.Par.run(staleBatches.map(b => () => {
      // EAGER: the id list reads the very partition the swap below
      // replaces — a lazy frame would re-list it mid-rewrite (the
      // purgeDocs FAILED_READ_FILE trap)
      val vecs = corpus.join(
        spark.read.parquet(s"$stateDir/assign/batch=$b")
          .select(col(idCol)),
        Seq(idCol), "left_semi").localCheckpoint(true)
      swapRepairedPartition(fs, table, b) { tmp =>
        assignCollected(vecs, idCol, vecCol, cents, keep = payloadCols)
          .withColumn("codebook_version", lit(ver))
          .write.mode("overwrite").partitionBy("cid").parquet(tmp)
      }
    }))
    staleBatches
  }

  /** IVF top-k served FROM the maintained assign state (VERDICT r14 #1)
    * — the query verb that completes the index lifecycle: arrivals are
    * absorbed by [[assignIncrement]] (with the vector as a payload
    * column), staleness is monitored ([[codebookStaleness]]), retrains
    * repair ([[reassignStale]]), and THIS serves retrieval from the
    * accumulated `stateDir/assign/batch=N` partitions — base corpus
    * plus appended increments — without ever re-assigning the corpus at
    * query time. Cell probing uses the SAME exact int64 squared-L2 the
    * index was built with (micro-quantized queries vs the broadcast
    * codebook, (dist, cid) ties), so the probed-cell set is
    * deterministic and the whole retrieval hash-gates: the oracle
    * replays training, a from-scratch assignment of the union (equal to
    * the accumulated state — the q252-proven property), the probe
    * ranking, and the cosine top-k.
    *
    * Scale: the index scan is the ONLY corpus-sized input — it is
    * CELL-PRUNED (the probed-cell union becomes a literal predicate on
    * the `cid` partition dirs, so the scan lists/opens ~nprobe/cells of
    * the state files — VERDICT r16 #1) and never shuffles (the probe
    * frame, queries × nprobe rows, BROADCASTS onto it; cosine is a
    * codegen'd projection) until the salted top-k cut, which moves
    * k·numSalts survivors per query. Version pinning keeps a mid-retrain
    * mixed state out of results ([[currentAssignments]]).
    */
  def ivfStateTopK(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, queries: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int = 10, nprobe: Int = 4,
      codebookVersion: String = "", numSalts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // ONE collect drives BOTH the version stamp and the probe's
    // centroid components (ADVICE r16): with a lazy centroids plan,
    // codebookVersionOf plus a separate ccomps subtree would each
    // silently re-run the whole training job per serve. The collected
    // array is the bounded k·dim driver valve assignment already uses.
    val cents = collectCodebook(centroids)
    val ver =
      if (codebookVersion.isEmpty) versionOfCollected(cents)
      else codebookVersion
    // probe: rank cells per query by the index's own exact int64
    // squared-L2 (the assignment geometry — probing by a different
    // metric would scan cells the index never routes to)
    val qcomps = queries
      .select(col(idCol).as("query_id"),
        posexplode(asDouble(col(vecCol))).as(Seq("dim", "v")))
      .select(col("query_id"), col("dim"),
        (floor(col("v") * 1e6 + 0.5).cast("long") + 2000000L).as("qs"))
    val ccomps = cents.toSeq
      .flatMap { case (cid, qs) =>
        qs.zipWithIndex.map { case (q, d) => (cid, d, q) } }
      .toDF("cid", "dim", "cq")
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("cid").asc)
    // bounded driver valve (the same order as the broadcast it feeds):
    // the probed (query, cell) pairs are queries × nprobe rows — collect
    // them ONCE, so the distinct cells become a LITERAL partition filter
    // on the postings scan and the probe frame rebuilds as a local
    // relation instead of being computed twice in the big plan
    val probedRows = qcomps.join(broadcast(ccomps), Seq("dim"))
      .groupBy(col("query_id"), col("cid"))
      .agg(sum((col("qs") - col("cq")) * (col("qs") - col("cq"))).as("dist"))
      .withColumn("__r", row_number().over(wProbe))
      .filter(col("__r") <= nprobe)
      .select(col("query_id"), col("cid"))
    val collected = probedRows.collect().toIndexedSeq
    val cells = collected.map(_.getLong(1)).distinct.sorted
    import scala.jdk.CollectionConverters._
    val probed = spark.createDataFrame(collected.asJava, probedRows.schema)
    // the persisted postings: (cell, neighbor id, vector payload),
    // restricted to the probed cells at the PARTITION level. The norm
    // is computed once per posting row, in the same scan.
    val postings = currentAssignments(spark, stateDir, ver, cells = cells)
      .select(col("cid"), col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("cv"))
      .withColumn("cn", norm(col("cv")))
    val qvecs = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")).withColumn("qn", norm(col("qv")))
    val probe = probed.join(qvecs, "query_id")
    val scored = postings.join(broadcast(probe), Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("cos"))
    topKPerQuery(scored, k, numSalts)
  }

  /** Incremental PQ-code index maintenance — [[assignIncrement]]'s
    * append pattern for the COMPRESSED artifact: encode one arrival
    * against the served per-subspace codebook ([[pqCodes]] — exact
    * int64 subspace argmin) and append the wide code rows
    * (`code_0..code_{nSub-1}` + `distortion`, the 4-byte/vector form a
    * PQ store actually persists) as `stateDir/codes/batch=N`. Encoding
    * is per-vector independent, so accumulated increments equal the
    * from-scratch encoding of the union (OpsSpec pins it; q255 gates
    * the SERVED retrieval). Same contracts as the assign state:
    * monotone batchIds, overwrite-idempotent retries, version stamps
    * (default: the codebook's content identity,
    * [[pqCodebookVersionOf]]), [[graft.pipelines.CurationState]]
    * compaction/purge apply unchanged (`tables = Seq("codes")`).
    */
  def pqCodesIncrement(newVecs: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, stateDir: String, batchId: Long,
      codebookVersion: String = "", nSub: Int = 8, subDim: Int = 8): DataFrame = {
    val spark = newVecs.sparkSession
    val ver =
      if (codebookVersion.isEmpty) pqCodebookVersionOf(codebook)
      else codebookVersion
    writeCodesBatch(newVecs, idCol, vecCol, codebook, ver, stateDir,
      batchId, nSub, subDim)
    spark.read.parquet(s"$stateDir/codes/batch=$batchId")
  }

  /** One arrival's code-partition write — shared by [[pqCodesIncrement]]
    * and [[reencodeStale]] so the repair derives ONE stamp for every
    * partition it rewrites (the [[writeAssignBatch]] discipline on the
    * codes side).
    */
  private def writeCodesBatch(newVecs: DataFrame, idCol: String,
      vecCol: String, codebook: DataFrame, ver: String, stateDir: String,
      batchId: Long, nSub: Int, subDim: Int): Unit =
    pqCodes(newVecs, idCol, vecCol, nSub, subDim,
      codebook = Some(codebook))
      .withColumn("codebook_version", lit(ver))
      .write.mode("overwrite").parquet(s"$stateDir/codes/batch=$batchId")

  /** The PQ-code state restricted to one codebook version — the
    * [[currentAssignments]] readout on the codes side.
    */
  def currentPqCodes(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, codebookVersion: String): DataFrame =
    spark.read.parquet(s"$stateDir/codes")
      .filter(col("codebook_version") === codebookVersion)

  /** Distinct codebook versions present in the persisted code state —
    * [[assignStateVersions]] on the codes side (VERDICT r16 #2: the PQ
    * state has the same lifecycle verbs as the assign state). More than
    * one version means a retrain happened without re-encoding or
    * purging the stale partitions: [[currentPqCodes]] silently
    * version-filters them out of every serve, so without this probe a
    * forgotten repair shrinks the served index with no error anywhere.
    */
  def pqStateVersions(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): Seq[String] =
    spark.read.parquet(s"$stateDir/codes")
      .select(col("codebook_version")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** REPAIR after a PQ retrain — [[reassignStale]] on the codes side
    * (VERDICT r16 #2): every `codes/batch=N` partition stamped with a
    * codebook version OTHER than the serving one is rewritten in place
    * by re-encoding its ids' vectors (semi-joined out of `corpus`)
    * against the serving `codebook`. Partitions are version-uniform by
    * construction (one [[pqCodesIncrement]] call, one version), so
    * staleness is per-partition and the repair touches exactly the
    * stale partitions; purged ids drop out of the rewrite. Each
    * partition rewrite goes through the crash-safe swap
    * ([[swapRepairedPartition]] — the repair's worklist lives in the
    * rows being rewritten, so a torn in-place overwrite would lose the
    * partition AND its worklist entry at once; orphans recovered on
    * entry). After a successful repair [[pqStateVersions]] returns
    * exactly the serving version and [[currentPqCodes]] equals the
    * full state. Returns the repaired batch ids (bounded driver
    * valve — one value per stale partition). Callers on hot paths
    * should pass a MATERIALIZED codebook (or an explicit version): the
    * default stamp collects `codebook` once, and the encode joins it
    * per partition.
    */
  def reencodeStale(stateDir: String, corpus: DataFrame, idCol: String,
      vecCol: String, codebook: DataFrame, codebookVersion: String = "",
      nSub: Int = 8, subDim: Int = 8): Seq[Long] = {
    val spark = corpus.sparkSession
    val ver =
      if (codebookVersion.isEmpty) pqCodebookVersionOf(codebook)
      else codebookVersion
    val table = new org.apache.hadoop.fs.Path(s"$stateDir/codes")
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(table))
      graft.pipelines.CurationState.recoverOrphanSwaps(spark, fs, table)
    val staleBatches = spark.read.parquet(s"$stateDir/codes")
      .filter(col("codebook_version") =!= ver)
      .select(col("batch").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    // independent per-partition repairs, overlapped (guide §2.6 — see
    // [[reassignStale]])
    graft.util.Par.run(staleBatches.map(b => () => {
      // EAGER: the id list reads the very partition the swap below
      // replaces — a lazy frame would re-list it mid-rewrite (the
      // purgeDocs FAILED_READ_FILE trap)
      val vecs = corpus.join(
        spark.read.parquet(s"$stateDir/codes/batch=$b")
          .select(col(idCol)),
        Seq(idCol), "left_semi").localCheckpoint(true)
      swapRepairedPartition(fs, table, b) { tmp =>
        pqCodes(vecs, idCol, vecCol, nSub, subDim,
          codebook = Some(codebook))
          .withColumn("codebook_version", lit(ver))
          .write.mode("overwrite").parquet(tmp)
      }
    }))
    staleBatches
  }

  /** Per-(subspace, code) histogram of persisted PQ code rows — the
    * current side of [[pqCodeStaleness]]. Unlike the assign-side
    * monitor's current leg ([[assignmentCounts]], a corpus rescan),
    * this comes FREE from the maintained code state: the wide
    * `code_0..code_{nSub-1}` rows unpivot row-locally (one `stack`
    * projection) and one map-side-combining keyed count produces the
    * nSub × nCentroids-row histogram — O(state scan), zero joins.
    */
  def pqCodeHistogram(codes: DataFrame, nSub: Int = 8): DataFrame = {
    val stackExpr = (0 until nSub).map(i => s"$i, code_$i").mkString(", ")
    codes.selectExpr(s"stack($nSub, $stackExpr) as (m, code)")
      .groupBy(col("m").cast("long").as("m"),
        col("code").cast("long").as("code"))
      .agg(count(lit(1)).as("n"))
  }

  /** PQ codebook staleness monitor — [[codebookStaleness]]'s PSI on the
    * COMPRESSED index (VERDICT r16 #2): drift of the per-subspace code
    * distribution against the reference histogram persisted when the
    * codebook was trained. The subspace `m` plays the scenario role:
    * each subspace's codewords partition its own 8-dim slice, so mass
    * moving between codes WITHIN a subspace is exactly the drift that
    * degrades ADC distances. Same pinned arithmetic as the assign-side
    * monitor (exact integer counts, Laplace-smoothed p/q, ln budgeted
    * on code-bounded outputs with pround(6), frame-ordered psi_cum,
    * per-subspace total vs threshold after pround) — OpsSpec gates it
    * against planted drift on both sides of the threshold.
    *
    * Grid codes = codebook cids ∪ reference codes, so a code orphaned
    * by version skew (refHist from a different codebook generation)
    * surfaces as drifted mass instead of silently dropping out.
    *
    * @param refHist (m, code, n) — [[pqCodeHistogram]] of the training
    *                corpus's codes, persisted at train time
    * @param curHist (m, code, n) — [[pqCodeHistogram]] of the CURRENT
    *                accumulated code state ([[currentPqCodes]])
    */
  def pqCodeStaleness(refHist: DataFrame, curHist: DataFrame,
      codebook: DataFrame, threshold: Double = 0.2): DataFrame = {
    import graft.util.Rounding.pround
    import org.apache.spark.sql.expressions.Window
    val ref = refHist.select(col("m").cast("long").as("m"),
      col("code").cast("long").as("code"), col("n").as("n_ref"))
    val cur = curHist.select(col("m").cast("long").as("m"),
      col("code").cast("long").as("code"), col("n").as("n_cur"))
    val codeIds = codebook.select(col("cid").cast("long").as("code"))
      .unionByName(ref.select(col("code"))).distinct()
    val cells = codeIds.agg(count(lit(1)).as("ncells"))
    val refTot = ref.groupBy(col("m")).agg(sum(col("n_ref")).as("nt_ref"))
    val curTot = cur.groupBy(col("m")).agg(sum(col("n_cur")).as("nt_cur"))
    val grid = ref.select(col("m")).unionByName(cur.select(col("m")))
      .distinct().crossJoin(codeIds)
    val p = (col("n_ref") + 1).cast("double") /
      (col("nt_ref") + col("ncells")).cast("double")
    val q = (col("n_cur") + 1).cast("double") /
      (col("nt_cur") + col("ncells")).cast("double")
    val contrib = (p - q) * log(p / q)
    val wCum = Window.partitionBy(col("m")).orderBy(col("code").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("m"))
    grid
      .join(broadcast(ref), Seq("m", "code"), "left")
      .join(broadcast(cur), Seq("m", "code"), "left")
      .join(broadcast(refTot), Seq("m"), "left")
      .join(broadcast(curTot), Seq("m"), "left")
      .crossJoin(broadcast(cells))
      .select(col("m"), col("code"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        coalesce(col("nt_ref"), lit(0L)).as("nt_ref"),
        coalesce(col("nt_cur"), lit(0L)).as("nt_cur"),
        col("ncells"))
      .select(col("m"), col("code"), col("n_ref"), col("n_cur"),
        pround(contrib, 6).as("contrib"),
        pround(sum(contrib).over(wCum), 6).as("psi_cum"),
        (pround(sum(contrib).over(wAll), 6) > threshold)
          .cast("long").as("stale"))
  }

  /** PQ-ADC top-k served FROM the persisted code state — the query verb
    * of the compressed index ([[ivfStateTopK]]'s claim on the PQ side):
    * retrieval never touches the original vectors OR re-encodes the
    * corpus. The query-side distance table (queries × codebook subspace
    * distances, exact int64) BROADCASTS onto the code scan; the wide
    * persisted codes unpivot row-locally (one `stack` projection), the
    * lookup join + keyed sum produce exact ADC distances, and the
    * salted top-k cuts k·numSalts survivors per query. Version pinning
    * keeps a mid-retrain mixed code state out of results.
    */
  def pqAdcFromState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, queries: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, k: Int = 10, nSub: Int = 8, subDim: Int = 8,
      codebookVersion: String = "", numSalts: Int = 8): DataFrame = {
    val ver =
      if (codebookVersion.isEmpty) pqCodebookVersionOf(codebook)
      else codebookVersion
    val stackExpr = (0 until nSub).map(i => s"$i, code_$i").mkString(", ")
    val codes = currentPqCodes(spark, stateDir, ver)
      .selectExpr(s"$idCol as __id", s"stack($nSub, $stackExpr) as (m, code)")
    val dtable = pqComponents(queries, idCol, vecCol, subDim)
      .filter(col("m") < nSub)
      .withColumnRenamed("__id", "query_id")
      .join(broadcast(codebook), Seq("dim"))
      .groupBy(col("query_id"), col("m").as("qm"), col("cid"))
      .agg(sum((col("q") - col("cq")) * (col("q") - col("cq"))).as("d"))
    val scored = codes
      .join(broadcast(dtable),
        col("m") === col("qm") && col("code") === col("cid"))
      .groupBy(col("query_id"), col("__id").as("neighbor_id"))
      .agg(sum(col("d")).as("adc_dist"))
    graft.transform.Skew.aggTopK(scored,
      partitionCols = Seq(col("query_id")),
      entry = struct(col("adc_dist"), col("neighbor_id")),
      k = k, rankCol = "rank")
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("adc_dist"))
  }

  /** Codebook staleness monitor (VERDICT r11 #3 / r12 #2): PSI of the
    * CURRENT corpus's nearest-centroid assignment distribution against
    * the REFERENCE histogram persisted when the codebook was trained.
    * A codebook is a frozen partition of embedding space; when the
    * corpus drifts, mass moves between cells, and the assignment-
    * distribution PSI is exactly the drift a retrain trigger should
    * watch — it measures the partition the index actually serves, not
    * raw component distributions.
    *
    * Arithmetic contract (what makes the flag gateable): cell counts
    * are exact integers ([[assignmentCounts]]); smoothed Laplace
    * p/q and the `(p−q)·ln(p/q)` contributions follow the pinned
    * [[graft.transform.Stats.psiByKey]] spelling (ln budgeted on
    * k-cell-bounded outputs with pround(6)); `psi_cum` is the running
    * frame-ordered sum; `stale` compares the per-scenario TOTAL
    * (a k-row bounded window sum) against the threshold AFTER
    * pround(6) — with a planted-drift fixture the total sits far from
    * the boundary on both sides.
    *
    * Scale: the only corpus-sized work is the current-side assignment
    * scan; everything else joins k-row broadcast frames. The grid is
    * cells × scenarios so a cell that lost ALL current mass (the
    * strongest drift signal) still contributes.
    *
    * @param refHist (cid, n) — persisted at train time
    * @param cur     current corpus, may carry several labeled
    *                scenarios in `scenarioCol`
    * @param threshold PSI action threshold (0.2 is the standard
    *                "significant shift, act" line)
    */
  def codebookStaleness(refHist: DataFrame, cur: DataFrame, idCol: String,
      vecCol: String, scenarioCol: String, centroids: DataFrame,
      threshold: Double = 0.2): DataFrame =
    codebookStalenessFromHist(refHist,
      assignmentCounts(cur, idCol, vecCol, centroids, Seq(scenarioCol)),
      scenarioCol, centroids, threshold,
      // scenario domain from the RAW corpus, not the histogram: a
      // scenario whose vectors all fail assignment (null/empty arrays —
      // posexplode emits nothing) has NO histogram rows, and deriving
      // the grid from the histogram would silently drop the
      // most-broken scenario from the readout; from the corpus it
      // surfaces with its full cell grid and all-zero current mass
      // (nt_cur = 0 — the operator signal; smoothing reads an empty
      // slice as uniform, so the PSI flag alone would not fire)
      scenarios = Some(cur.select(col(scenarioCol)).distinct()))

  /** [[codebookStaleness]] from a PRE-COMPUTED current-side histogram —
    * the state-fed monitor (VERDICT r17 #4, the IVF mirror of
    * [[pqCodeStaleness]]'s histogram-in signature): feed it
    * [[assignHistogram]] (plus a literal scenario column) and the
    * monitor costs O(index state), never a corpus rescan. Identical
    * arithmetic to the corpus-fed form — [[codebookStaleness]] is now a
    * one-line delegation, and q257 hash-gates this path end to end
    * (state-accumulated counts vs a from-scratch SQL replay).
    *
    * @param curHist (scenarioCol, cid, n) — [[assignmentCounts]] of the
    *                current corpus, or [[assignHistogram]] of the
    *                maintained state with a `lit(...)` scenario
    */
  def codebookStalenessFromHist(refHist: DataFrame, curHistIn: DataFrame,
      scenarioCol: String, centroids: DataFrame,
      threshold: Double = 0.2,
      scenarios: Option[DataFrame] = None): DataFrame = {
    import graft.util.Rounding.pround
    import org.apache.spark.sql.expressions.Window
    val curHist = curHistIn
      .select(col(scenarioCol), col("cid").cast("long").as("cid"),
        col("n").as("n_cur"))
    val ref = refHist.select(col("cid").cast("long").as("cid"),
      col("n").as("n_ref"))
    // grid cells = centroid cids ∪ reference cids: a refHist trained
    // against a DIFFERENT codebook generation (version skew) contributes
    // orphaned cells whose current mass is necessarily zero — they
    // surface as PSI drift instead of silently dropping from the grid
    val cellIds = centroids
      .select(col("centroid_id").cast("long").as("cid"))
      .unionByName(ref.select(col("cid")))
      .distinct()
    val cells = cellIds.agg(count(lit(1)).as("ncells"))
    val refTot = ref.agg(sum(col("n_ref")).as("nt_ref"))
    val curTot = curHist.groupBy(col(scenarioCol))
      .agg(sum(col("n_cur")).as("nt_cur"))
    // the scenario domain defaults to the histogram's own (the state
    // path, where the scenario is a literal); pass `scenarios`
    // explicitly when a scenario could have ZERO histogram rows (all
    // assignments failed) and must still surface — see
    // [[codebookStaleness]]
    val grid = scenarios
      .getOrElse(curHist.select(col(scenarioCol)).distinct())
      .select(col(scenarioCol)).distinct().crossJoin(cellIds)
    val p = (col("n_ref") + 1).cast("double") /
      (col("nt_ref") + col("ncells")).cast("double")
    val q = (col("n_cur") + 1).cast("double") /
      (col("nt_cur") + col("ncells")).cast("double")
    val contrib = (p - q) * log(p / q)
    val wCum = Window.partitionBy(col(scenarioCol)).orderBy(col("cid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(scenarioCol))
    grid
      .join(broadcast(ref), Seq("cid"), "left")
      .join(broadcast(curHist), Seq(scenarioCol, "cid"), "left")
      .join(broadcast(curTot), Seq(scenarioCol), "left")
      .crossJoin(broadcast(cells))
      .crossJoin(broadcast(refTot))
      .select(col(scenarioCol), col("cid"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        col("nt_ref"), coalesce(col("nt_cur"), lit(0L)).as("nt_cur"),
        col("ncells"))
      .select(col(scenarioCol), col("cid"), col("n_ref"), col("n_cur"),
        pround(contrib, 6).as("contrib"),
        pround(sum(contrib).over(wCum), 6).as("psi_cum"),
        (pround(sum(contrib).over(wAll), 6) > threshold)
          .cast("long").as("stale"))
  }

  /** Trained per-subspace PQ codebook via [[lloydMicroCodebooks]] —
    * all `nSub` subspaces train jointly in one keyed loop. Output
    * (cid, dim, cq) in UNSHIFTED micros, the exact shape
    * [[pqCodes]]/[[pqAdcTopK]] consume through their `codebook`
    * parameter (distances are shift-invariant, so downstream is
    * unchanged).
    */
  def lloydPqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      nSub: Int = 8, subDim: Int = 8, nCentroids: Int = 16,
      iters: Int = 3, trainFilter: Option[Column] = None): DataFrame =
    lloydMicroCodebooks(
      pqComponents(trainFilter.map(corpus.filter).getOrElse(corpus),
        idCol, vecCol, subDim)
        .filter(col("m") < nSub)
        .select(col("__id"), col("m"), col("dim"),
          (col("q") + 2000000L).as("qs")),
      nCentroids, iters)
      .select(col("cid"), col("dim"), (col("cq") - 2000000L).as("cq"))

  /** First-N-by-id corpus vectors as IVF centroids, in the
    * (centroid_id, centv, centn) shape the assignment join consumes —
    * deterministic and engine-reproducible (the SQL oracles replay it
    * with ORDER BY + LIMIT); [[kmeansCentroids]] is the trained
    * alternative in the same shape.
    */
  private[ops] def firstNCentroids(
      corpus: DataFrame, idCol: String, vecCol: String, n: Int): DataFrame =
    withNorm(corpus.orderBy(col(idCol)).limit(n), idCol, vecCol)
      .select(col(idCol).as("centroid_id"), col("__vec").as("centv"),
        col("__norm").as("centn"))

  /** Nearest-centroid(s) assignment for a `withNorm`-shaped frame whose
    * id column is `${side}_id`. `keep = 1` is the corpus-side bulk
    * assignment; `keep > 1` the query-side multi-probe.
    */
  private[ops] def nearestCentroids(
      df: DataFrame, cents: DataFrame, side: String, keep: Int,
      keepRank: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = df.join(broadcast(cents), expr("true"))
      .withColumn("simc",
        dot(col("__vec"), col("centv")) / (col("__norm") * col("centn")))
    if (keep == 1) {
      // Corpus-side assignment: argmax instead of a row_number window.
      // The window shuffles ALL id×C scored rows just to rank them;
      // max(struct(...)) partial-aggregates map-side, so only id-many
      // pre-reduced rows reach the exchange — the difference between
      // shuffling 16× the corpus and 1× at 100 TB. Tie-break matches
      // the window's (simc desc, centroid_id asc) via the negated id.
      val best = scored
        .groupBy(col(s"${side}_id"))
        .agg(max(struct(col("simc"), (-col("centroid_id")).as("negc"),
          col("__vec"), col("__norm"))).as("__best"))
        .select(col(s"${side}_id"), (-col("__best.negc")).as("centroid_id"),
          col("__best.__vec").as("__vec"), col("__best.__norm").as("__norm"))
      // the argmax row IS rank 1 — a keepRank caller (probe sweep with
      // max(nprobes) == 1) must still see crank
      if (keepRank) best.withColumn("crank", lit(1)) else best
    } else {
      val w = Window.partitionBy(col(s"${side}_id"))
        .orderBy(col("simc").desc, col("centroid_id").asc)
      val ranked = scored
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("centv", "centn", "simc")
      if (keepRank) ranked else ranked.drop("crank")
    }
  }

  /** IVF nprobe recall/cost sweep — the tuning readout that DECIDES
    * nprobe before production pays for it: for each probe budget p,
    * recall@k of the IVF ranking against the exact brute-force top-k,
    * next to the scanned-candidate count (the cost axis). One corpus
    * assignment, ONE probe ranking at max(nprobes), one scoring pass —
    * each budget is a `crank ≤ p` filter over the shared scored frame,
    * so the sweep costs one IVF query plus k-sized bookkeeping, not
    * |nprobes| queries. All hits/candidates are exact integers; recall
    * is one division.
    *
    * Output: (nprobe, n_queries, n_candidates, n_hits, recall).
    */
  def ivfProbeSweep(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 10, numCentroids: Int = 16,
      nprobes: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    require(nprobes.nonEmpty && nprobes.forall(_ >= 1),
      "ivfProbeSweep needs probe budgets >= 1")
    import org.apache.spark.sql.expressions.Window
    val cents = firstNCentroids(corpus, idCol, vecCol, numCentroids)
    val assigned = nearestCentroids(
      withNorm(corpus, idCol, vecCol).withColumnRenamed(idCol, "corpus_id"),
      cents, "corpus", 1)
      .select(col("centroid_id"), col("corpus_id").as("neighbor_id"),
        col("__vec").as("cv"), col("__norm").as("cn"))
    val probed = nearestCentroids(
      withNorm(queries, idCol, vecCol).withColumnRenamed(idCol, "query_id"),
      cents, "query", nprobes.max, keepRank = true)
      .select(col("centroid_id"), col("query_id"), col("crank"),
        col("__vec").as("qv"), col("__norm").as("qn"))
    val scored = probed.join(assigned, "centroid_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("neighbor_id"), col("crank"), col("cos"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val probesDf = nprobes.map(_.toLong).toDF("nprobe")
    val perBudget = scored.join(broadcast(probesDf), col("crank") <= col("nprobe"))
    val wTop = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val topk = perBudget.withColumn("__r", row_number().over(wTop))
      .filter(col("__r") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"))
    val exact = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = topk.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
    val nQ = queries.agg(count(lit(1)).as("n_queries"))
    perBudget.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_candidates"))
      .join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(nQ))
      .select(col("nprobe"), col("n_queries"), col("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        graft.util.Rounding.pround(
          coalesce(col("n_hits"), lit(0L)).cast("double") /
            (col("n_queries") * k).cast("double"), 6).as("recall"))
  }

  /** IVF (inverted-file) approximate top-k. Centroids default to the
    * first `numCentroids` corpus vectors by id — deterministic and
    * engine-reproducible, which is what the SQL oracle replays — or pass
    * [[kmeansCentroids]] output via `centroids` for trained buckets
    * (better recall at equal nprobe; pinned in OpsSpec). Every vector is
    * assigned to its nearest centroid (one broadcast pass); a query
    * scans only its `nprobe` nearest centroid buckets.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, numCentroids: Int = 16, nprobe: Int = 4,
      centroids: Option[DataFrame] = None, numSalts: Int = 16): DataFrame = {
    val cents = centroids.getOrElse(
      firstNCentroids(corpus, idCol, vecCol, numCentroids))

    val assigned = nearestCentroids(
      withNorm(corpus, idCol, vecCol).withColumnRenamed(idCol, "corpus_id"),
      cents, "corpus", 1)
      .select(col("centroid_id"), col("corpus_id").as("neighbor_id"),
        col("__vec").as("cv"), col("__norm").as("cn"))
    val probed = nearestCentroids(
      withNorm(queries, idCol, vecCol).withColumnRenamed(idCol, "query_id"),
      cents, "query", nprobe)
      .select(col("centroid_id"), col("query_id"), col("__vec").as("qv"),
        col("__norm").as("qn"))

    val scored = probed.join(assigned, "centroid_id")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topKPerQuery(scored, k, numSalts)
  }

  /** IVF cell-balance audit — the index-health readout that decides
    * nprobe and recall budgets BEFORE queries pay for them: per-cell
    * vector counts and the load ratio vs the uniform ideal
    * (`n·k/total`). A cell at 5× ideal makes every probe touching it
    * 5× the work; empty cells waste probes. One broadcast-centroid
    * assignment pass (exactly [[ivfTopK]]'s), one k-row aggregate.
    */
  def ivfCellBalance(corpus: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int = 16,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cents = centroids.getOrElse(
      firstNCentroids(corpus, idCol, vecCol, numCentroids))
    val assigned = nearestCentroids(
      withNorm(corpus, idCol, vecCol).withColumnRenamed(idCol, "corpus_id"),
      cents, "corpus", 1)
    val cells = assigned.groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vectors"))
    val tot = cells.agg(sum(col("n_vectors")).as("__t"))
    cells.crossJoin(broadcast(tot))
      .select(col("centroid_id"), col("n_vectors"),
        pround(col("n_vectors").cast("double") * lit(numCentroids.toDouble) /
          col("__t").cast("double"), 6).as("load_ratio"))
  }

  // ---------------------------------------------------------------- semdedup
  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, then drop all but
    * one member of every within-cluster near-duplicate pair — the
    * embedding-level analogue of MinHash dedup, catching paraphrases
    * exact/fuzzy text hashes miss.
    *
    * Determinism contract (what the SQL oracle replays): centroids are
    * the first `numCentroids` corpus vectors by id (pass
    * [[kmeansCentroids]] for trained clusters — better partitions, spec-
    * gated instead of oracle-gated), assignment ties pin to the lowest
    * centroid id, pair cosines round to 6dp before the threshold
    * compare (the [[blockedCosinePairs]] convention), and the kept
    * representative of a duplicate pair is the lower id.
    *
    * Scale: assignment is one broadcast-centroids argmax pass (the
    * corpus shuffles once, on its own id); pair generation is the salted
    * within-cluster self-join — O(B²) per cluster, so `blockCap` bounds
    * B for degenerate clusters; the loser set is distinct duplicate ids,
    * joined back null-safe. No stage is all-pairs, nothing collects.
    *
    * @return one row per corpus vector: (id, cluster_id, kept 0/1)
    */
  def semanticDedup(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numCentroids: Int = 16,
      centroids: Option[DataFrame] = None, numSalts: Int = 8,
      blockCap: Option[Int] = None): DataFrame = {
    val cents = centroids.getOrElse(
      firstNCentroids(corpus, idCol, vecCol, numCentroids))
    val assigned = nearestCentroids(
      withNorm(corpus, idCol, vecCol).withColumnRenamed(idCol, "corpus_id"),
      cents, "corpus", 1)
      .select(col("corpus_id").as(idCol), col("centroid_id").as("cluster_id"),
        col("__vec"), col("__norm"))
    val members = assigned.select(col(idCol), col("cluster_id"))
    // re-join vectors through blockedCosinePairs' own withNorm would
    // recompute norms; feed the already-normed frame directly instead
    val a = assigned.select(col("cluster_id").as("block"), col(idCol).as("a"),
      col("__vec").as("va"), col("__norm").as("na"))
    val b = assigned.select(col("cluster_id").as("block"), col(idCol).as("b"),
      col("__vec").as("vb"), col("__norm").as("nb"))
    val capped = blockCap.fold((a, b)) { cap =>
      val keep = Dedup.capBlocksDistinct(
        members.select(col(idCol), col("cluster_id")), "cluster_id", idCol, cap)
        .select(col(idCol))
      (a.join(keep.withColumnRenamed(idCol, "a"), "a"),
        b.join(keep.withColumnRenamed(idCol, "b"), "b"))
    }
    val joined =
      if (numSalts > 1)
        graft.transform.Skew.saltedBlockSelfJoin(
          capped._1, capped._2, "block", col("a"), col("b"), numSalts)
      else capped._1.join(capped._2, "block")
    val losers = joined
      .filter(col("a") < col("b"))
      .filter(graft.util.Rounding.pround(
        dot(col("va"), col("vb")) / (col("na") * col("nb")), 6) > threshold)
      .select(col("b").as(idCol)).distinct()
    members
      .join(losers.withColumn("__lost", lit(1L)), Seq(idCol), "left")
      .select(col(idCol), col("cluster_id"),
        when(col("__lost").isNull, 1L).otherwise(0L).as("kept"))
  }

  // ---------------------------------------------------------------- rp-lsh
  /** Random-hyperplane LSH bucket signature: bit i of the signature is
    * `sign(v · h_i)` for `numBits` fixed hyperplanes generated from
    * `seed` (deterministic — the same plane set on every call/engine).
    * Cosine-similar vectors collide with probability
    * `(1 - θ/π)^numBits`.
    */
  def rpSignature(vec: Column, dim: Int, numBits: Int = 8, seed: Long = 42L): Column =
    rpPlanes(dim, numBits, seed).zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.toIndexedSeq.map(lit(_)): _*)
      when(dot(vec, planeCol) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** The fixed hyperplane set behind [[rpSignature]] — exposed so an
    * external oracle (e.g. the DuckDB replica in
    * [[graft.OpsQueries.rpLshKnnSql]]) can reproduce the exact same
    * signatures from the literal plane values.
    */
  def rpPlanes(dim: Int, numBits: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** RP-LSH approximate top-k: corpus vectors bucket by signature; each
    * query probes its own bucket plus all buckets within Hamming
    * distance `probeHamming` (multi-probe — signature bits near the
    * decision boundary are the likeliest to differ). The probe fan-out
    * is a compact int join key, so the shuffle is (queries × probes) ×
    * bucket contents, never all-pairs.
    */
  def rpLshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, numBits: Int = 6, probeHamming: Int = 1,
      seed: Long = 42L, numSalts: Int = 16): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol)
      .withColumn("bucket", rpSignature(col("__vec"), dim, numBits, seed))
      .select(col(idCol).as("neighbor_id"), col("bucket"),
        col("__vec").as("cv"), col("__norm").as("cn"))

    // probe set: signature XOR masks with popcount <= probeHamming
    val masks = (0 until (1 << numBits))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val q = withNorm(queries, idCol, vecCol)
      .withColumn("sig", rpSignature(col("__vec"), dim, numBits, seed))
      .withColumn("mask", explode(array(masks.map(lit(_)): _*)))
      .withColumn("bucket", expr("int(sig ^ mask)"))
      .select(col(idCol).as("query_id"), col("bucket"),
        col("__vec").as("qv"), col("__norm").as("qn"))

    val scored = q.join(c, "bucket")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    topKPerQuery(scored, k, numSalts)
  }

  /** Label-BLIND LSH near-duplicate candidate pairs: vectors bucket by
    * the seeded [[rpSignature]]; same-bucket `(a < b)` pairs verify by
    * exact cosine against `threshold` (6dp-rounded, the q21 gate
    * discipline). This is the honest production near-dup pipeline —
    * blocking never peeks at labels — which is what makes it
    * evaluable AGAINST labels (see [[graft.OpsQueries.dedupEval]]).
    *
    * Scale: the pair fan-out is per-bucket quadratic; bucket
    * occupancy is corpus/2^numBits, so numBits must grow with the
    * corpus (≈ log₂(N/target-bucket-size)), and a hot bucket routes
    * through [[Dedup.capBlocks]] / [[graft.transform.Skew]] valves —
    * same posture as the minhash band join (q17).
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, numBits: Int = 6, seed: Long = 42L,
      threshold: Double = 0.15): DataFrame = {
    val v = withNorm(df, idCol, vecCol)
      .withColumn("bucket", rpSignature(col("__vec"), dim, numBits, seed))
    val a = v.select(col("bucket"), col(idCol).as("a"),
      col("__vec").as("va"), col("__norm").as("na"))
    val b = v.select(col("bucket"), col(idCol).as("b"),
      col("__vec").as("vb"), col("__norm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("a") < col("b"))
      .withColumn("cos",
        pround(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos") > threshold)
      .select(col("a"), col("b"), col("cos"))
  }

  /** Maximal-marginal-relevance re-ranking — the RAG retrieval-
    * diversification pass: from each query's `topN` candidates, pick
    * `k` greedily by `score = relWeight·rel − divWeight·maxSimToSel`
    * (first pick: `maxSimToSel ≡ 0`), so the final context window
    * trades pure relevance for coverage. Ties pin by candidate id.
    *
    * The greedy loop is UNROLLED as k−1 dataframe steps — each step a
    * query-keyed join of the ≤topN remaining candidates against the
    * ≤k selected rows plus a per-query argmax window over ≤topN rows:
    * every frame after candidate generation is (queries × topN)-
    * bounded, so the loop costs k·O(queries·topN) regardless of
    * corpus size. Candidate generation here is brute-force scoring
    * (the q20 baseline); at 100 TB candidates come from the IVF/LSH
    * paths (q25/q26) and MMR consumes their bounded output unchanged.
    *
    * Exactness: rel and pairwise cosines are the left-fold
    * [[dot]]/[[norm]] kernels (bitwise equal to the SQL list
    * functions — q20 precedent); `max` over identical doubles and the
    * fixed-spelling affine score (`relWeight`/`divWeight` are BOTH
    * explicit literals — never compute `1−λ` in one engine and write
    * `0.3` in the other: binary64 `1−0.7` is NOT `0.3`) make every
    * greedy pick engine-identical, so the oracle replays the whole
    * recursion as unrolled CTEs and the gate pins each PICK, not just
    * scores.
    */
  /** [[mmrRerank]]'s candidate stage, exposed un-checkpointed so plan
    * pins can see the real physical shape (the checkpoint in
    * mmrRerank truncates explain at a LogicalRDD): brute scoring with
    * the broadcast query side, then the salted top-N prune.
    */
  def mmrCandidates(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, topN: Int, numSalts: Int = 16): DataFrame = {
    val c = withNorm(corpus, idCol, vecCol)
      .select(col(idCol).as("cand_id"), col("__vec").as("cv"),
        col("__norm").as("cn"))
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("__vec").as("qv"),
        col("__norm").as("qn"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select(col("query_id"), col("cand_id").as("neighbor_id"), col("cos"),
        col("cv"), col("cn"))
    graft.transform.Skew.saltedTopK(scored,
      partitionCols = Seq(col("query_id")),
      orderCols = Seq(col("cos").desc, col("neighbor_id").asc),
      saltCol = col("neighbor_id"), k = topN, numSalts = numSalts)
      .select(col("query_id"), col("neighbor_id").as("cand_id"),
        col("cos").as("rel"), col("cv"), col("cn"))
  }

  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, topN: Int = 8,
      relWeight: Double = 0.7, divWeight: Double = 0.3,
      numSalts: Int = 16): DataFrame = {
    require(k >= 1 && topN >= k, s"need topN >= k >= 1, got k=$k topN=$topN")
    import org.apache.spark.sql.expressions.Window
    // eager checkpoint at FULL parallelism: the corpus-sized scoring
    // stage must run before the loop narrows shuffle partitions below
    // (it also truncates the final plan, which is why PlanSpec pins
    // the candidate stage via mmrCandidates directly)
    val cands = mmrCandidates(corpus, queries, idCol, vecCol, topN, numSalts)
      .localCheckpoint()
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    // EAGER localCheckpoint per step: the greedy lineage otherwise
    // compounds (step t replans steps 1..t−1), and with k−1 unions the
    // optimizer/codegen cost dwarfs the data — the checkpointed frame
    // is (queries × step)-bounded, so materializing it is free. The
    // loop's frames are also queries-bounded, so shuffles inside the
    // scope run at 4 partitions (both the Graph.pagerankFixedPoint
    // discipline; the eager checkpoints EXECUTE inside the scope,
    // which is what makes the conf scoping effective)
    val sess = corpus.sparkSession
    val prevParts = sess.conf.get("spark.sql.shuffle.partitions")
    sess.conf.set("spark.sql.shuffle.partitions", "4")
    try {
    var selected = cands
      .withColumn("score", lit(relWeight) * col("rel"))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") <= 1)
      .select(col("query_id"), col("cand_id"), lit(1L).as("step"),
        col("score"), col("cv"), col("cn"))
      .localCheckpoint()
    for (t <- 2 to k) {
      val rem = cands.join(
        selected.select(col("query_id"), col("cand_id"))
          .withColumn("__sel", lit(1)),
        Seq("query_id", "cand_id"), "left")
        .filter(col("__sel").isNull).drop("__sel")
      val sims = rem
        .join(selected.select(col("query_id"), col("cv").as("sv"),
          col("cn").as("sn")), Seq("query_id"))
        .groupBy(col("query_id"), col("cand_id"))
        .agg(max(dot(col("cv"), col("sv")) / (col("cn") * col("sn")))
          .as("__maxSim"))
      val pick = rem.join(sims, Seq("query_id", "cand_id"))
        .withColumn("score",
          lit(relWeight) * col("rel") - lit(divWeight) * col("__maxSim"))
        .withColumn("__rn", row_number().over(wPick))
        .filter(col("__rn") <= 1)
        .select(col("query_id"), col("cand_id"), lit(t.toLong).as("step"),
          col("score"), col("cv"), col("cn"))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected.select(col("query_id"), col("step"), col("cand_id"),
      pround(col("score"), 6).as("score"))
    } finally sess.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  /** Per-group mean vectors ("class centroids") in long form — one row
    * per (group, dimension): the dataset-cartography / IVF-seeding /
    * per-class-drift primitive. Long form keeps the plan a plain
    * posexplode → keyed agg: ONE shuffle on the uniform (group, dim)
    * key with map-side partials, no array re-assembly (callers that
    * need array centroids collect_list over the bounded dim range).
    *
    * Determinism: float→double casts are exact; the mean is a double
    * sum whose order differs between engines, so values are pround'd —
    * safe while groups stay bounded (the wide-double-sum rule; at
    * ~10⁶+ rows/group switch the gate to integer fixed-point).
    */
  def groupCentroids(df: DataFrame, groupCol: String, vecCol: String,
      out: String = "centroid", roundDp: Int = 6): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy(col(groupCol), col("dim").cast("long").as("dim"))
      .agg(pround(avg(col("__v").cast("double")), roundDp).as(out))

  /** Embedding centroid drift — the embedding-space counterpart of the
    * PSI/KS feature-drift battery: per group, the cosine similarity
    * between the REFERENCE half's centroid (`idCol` even) and the
    * CURRENT half's (`idCol` odd). A cosine near 1 means the embedding
    * distribution's first moment is stable; a drop is the retrain/
    * re-embed alarm. Counts ride along so a thin half is visible.
    *
    * Exactness (the corrByKey DECIMAL↔HUGEINT pattern, not the bounded
    * double-sum exemption [[groupCentroids]] uses): components are
    * quantized to integer micros (`floor(v·10⁶ + 0.5)` of the exact
    * float→double value — identical in both engines), per-dim sums are
    * exact BIGINT, and the cross/self products are summed in
    * DECIMAL(38,0) (operands pre-cast to decimal(19,0)). Only the final
    * `dot / (√na · √nb)` runs in double — a fixed sequence of correctly
    * rounded ops on identical operands, then pround(6). The n factors of
    * the true centroid cosine cancel, so integer sums ARE the centroids
    * here. Degenerate halves (empty or all-zero) emit NULL, guarding
    * ANSI division.
    *
    * Scale: one posexplode + a (group, dim)-keyed exact agg + a
    * group-keyed fold over the bounded dim range; the per-group count
    * frame is group-cardinality-sized and broadcasts.
    */
  def centroidDrift(df: DataFrame, groupCol: String, vecCol: String,
      idCol: String): DataFrame = {
    val dec = "decimal(19,0)"
    val q = df.select(col(groupCol), (col(idCol) % 2 === 0).as("__ref"),
        posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .select(col(groupCol), col("__ref"), col("dim"),
        floor(col("__v").cast("double") * lit(1000000.0) + lit(0.5)).as("q"))
    val perDim = q.groupBy(col(groupCol), col("dim"))
      .agg(sum(when(col("__ref"), col("q")).otherwise(0L)).as("a"),
        sum(when(!col("__ref"), col("q")).otherwise(0L)).as("b"))
    val agg = perDim.groupBy(col(groupCol))
      .agg(sum(col("a").cast(dec) * col("b").cast(dec)).as("dot"),
        sum(col("a").cast(dec) * col("a").cast(dec)).as("na"),
        sum(col("b").cast(dec) * col("b").cast(dec)).as("nb"))
    val counts = df.groupBy(col(groupCol))
      .agg(sum(when(col(idCol) % 2 === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col(idCol) % 2 =!= 0, 1L).otherwise(0L)).as("n_cur"))
    agg.join(broadcast(counts), groupCol)
      .select(col(groupCol), col("n_ref"), col("n_cur"),
        when(col("na") === 0 || col("nb") === 0, lit(null).cast("double"))
          .otherwise(pround(col("dot").cast("double") /
            (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
            6))
          .as("cos_drift"))
  }

  /** Greedy k-center (farthest-point) coreset selection — the
    * diversity-sampling pass of an embedding pipeline (Sener & Savarese
    * 2018's core-set heuristic): seed with the smallest id, then
    * repeatedly add the point FARTHEST from the chosen set, i.e. the
    * one minimizing its maximum cosine similarity to any chosen center.
    * Returns (round, vec_id, sim) — `sim` is the point's max-similarity
    * to the previously chosen set at selection time (NULL for the
    * seed): the classic 2-approximation of the k-center cover radius,
    * so the emitted column doubles as a coverage certificate.
    *
    * Scale: per round the state update is one NARROW map (greatest of
    * the running best and the cosine to the single new center, a
    * broadcast literal vector) and the selection is one TakeOrdered-1
    * — no shuffle grows with k, no corpus-sized frame ever sits on the
    * driver; the loop collects exactly k single rows (a bounded driver
    * valve, like the CC probe). Lineage grows one column per round —
    * fine for coreset-sized k; localCheckpoint the state for k ≫ 100.
    *
    * Gate-ability: every similarity is pround(6)-pinned BEFORE it
    * enters the running max and the argmin (ties then break on id), so
    * the selection sequence replays exactly from DuckDB's
    * `list_cosine_similarity` — the q20 discipline, but load-bearing
    * for control flow rather than just output.
    */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "kCenterCoreset needs k >= 1")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"),
      asDouble(col(vecCol)).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    import spark.implicits._
    try {
      val seedOpt = base.orderBy(col("id").asc).limit(1).collect().headOption
      if (seedOpt.isEmpty)
        return Seq.empty[(Long, Long, Option[Double])]
          .toDF("round", "vec_id", "sim")
      val seed = seedOpt.get
      var chosen = List((1L, seed.getLong(0), Option.empty[Double]))
      var centerVec: Seq[Double] = seed.getSeq[Double](1)
      var state = base.withColumn("best", lit(null).cast("double"))
      var round = 2L
      var exhausted = false
      // k beyond the corpus size exhausts cleanly after n rounds
      // instead of throwing on an empty argmin frame
      while (round <= k.toLong && !exhausted) {
        val cv = array(centerVec.map(lit): _*)
        state = state.withColumn("best",
          greatest(coalesce(col("best"), lit(-2.0)),
            pround(cosine(col("v"), cv), 6)))
        val nextOpt = state.filter(!col("id").isin(chosen.map(_._2): _*))
          .orderBy(col("best").asc, col("id").asc).limit(1)
          .collect().headOption
        nextOpt match {
          case None => exhausted = true
          case Some(next) =>
            chosen ::= ((round, next.getLong(0), Some(next.getDouble(2))))
            centerVec = next.getSeq[Double](1)
            round += 1
        }
      }
      chosen.reverse.toDF("round", "vec_id", "sim")
    } finally base.unpersist()
  }
}
