package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond connected components (which
  * lives with its dedup consumer in [[Dedup.connectedComponents]]):
  * fixed-point PageRank.
  *
  * Exactness design: floating-point PageRank is NOT cross-engine
  * reproducible (per-node sums accumulate in partition order), so
  * ranks here are FIXED-POINT integers — rank mass starts at `scale`
  * per node and every update is integer arithmetic only:
  * `r'(v) = scale div 8 + (7 * Σ_u→v (r(u) div deg(u))) div 8`,
  * i.e. damping 7/8 (dyadic, so the div-8 spelling is exact) and
  * floor division for the per-edge contribution split. Integer sums
  * are associative — partition order cannot change the result — and
  * DuckDB replays the identical recursion with `//` (same floor
  * semantics for the non-negative operands here) in a recursive CTE
  * that aggregates per iteration. Overflow headroom: ranks are
  * bounded by the total mass `n_nodes * scale`; the `7 *` step needs
  * `7 * n * scale < 2^63`, i.e. ~1.3e18 of mass — 1e9 nodes at the
  * default scale.
  *
  * Scale (100 TB posture): each of the `iters` rounds is one
  * edges↔ranks equi-join on the source key plus one keyed agg on the
  * destination — the canonical iterative-join shape. Edges are
  * symmetrized, so no dangling-mass bookkeeping is needed (every node
  * has out-degree >= 1 and receives its mirror's contribution). The
  * valves for long runs are the same as the CC loop's: `iters` is an
  * explicit bounded budget (diameter-scale rounds, typically < 10 for
  * web-ish graphs), and each round's frame is `localCheckpoint`ed so
  * the plan (and its task-retry lineage) stays one round deep instead
  * of `iters` joins deep. A hub node's fat reducer in the destination
  * agg is partial-aggregated map-side (plain longs sum; no per-key
  * state beyond a counter).
  */
object Graph {

  /** Fixed-point PageRank over the symmetric closure of `edges`
    * (columns `src`, `dst`; any extra columns ignored). Returns
    * (node, deg, rank) after exactly `iters` rounds.
    *
    * @param checkpoint localCheckpoint each round (executor-local,
    *   lineage truncation — see the CC loop precedent); disable for
    *   plan-shape tests.
    */
  def pagerankFixedPoint(edges: DataFrame, iters: Int,
      scale: Long = 1000000000L, checkpoint: Boolean = true,
      smallGraphThreshold: Long = 0L,
      loopShufflePartitions: Int = 0): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val sym = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .distinct()
    // Small-graph valve (opt-in, CC-loop economics — see
    // Dedup.connectedComponents): below the threshold, `iters` rounds
    // of join+agg scheduling (~0.5 s fixed cost each at local[32])
    // collapse into one collect + a driver loop running the IDENTICAL
    // integer recursion — GraphSpec pins mode equality. Sizing counts
    // boxed Rows (~100 B/edge), per the CC valve's rule. Apply it ONLY
    // to output-scale graphs (candidate pairs, per-cohort subgraphs):
    // for a corpus-scale graph the probe itself costs a cached
    // materialization and the fall-through pays it for nothing —
    // measured slower on the 1.2M-edge trade graph, which is why q91
    // leaves it off.
    if (smallGraphThreshold > 0) {
      val cached = sym.persist()
      val probeCap = math.min(smallGraphThreshold, Int.MaxValue - 1L).toInt
      val n = cached.limit(probeCap + 1).count()
      if (n <= smallGraphThreshold) {
        val es = cached.collect().map(r => (r.getLong(0), r.getLong(1)))
        cached.unpersist()
        val deg = es.groupBy(_._1).map { case (u, g) => u -> g.length.toLong }
        var rank = deg.keys.map(_ -> scale).toMap
        for (_ <- 1 to iters) {
          val contrib = scala.collection.mutable.Map.empty[Long, Long]
            .withDefaultValue(0L)
          es.foreach { case (u, v) => contrib(v) += rank(u) / deg(u) }
          rank = contrib.map { case (v, s) => v -> (scale / 8 + 7 * s / 8) }.toMap
        }
        val spark = edges.sparkSession
        return spark.createDataFrame(
          rank.toSeq.map { case (node, r) => (node, deg(node), r) })
          .toDF("node", "deg", "rank")
      }
      cached.unpersist()
    }
    // Loop-scoped shuffle-partition reduction: each round's frames are
    // node/edge-scale, so 32 reducer tasks/round are pure scheduling
    // overhead at local[*] (measured ~15% of q91's wall). When
    // `loopShufflePartitions` > 0 the rounds plan with that many
    // shuffle partitions and the RESULT is eagerly checkpointed inside
    // the scope (execution is lazy — without the eager step the
    // caller's action would replan under the restored setting, making
    // the scope a no-op); the session conf is restored in finally.
    // Single-writer assumption on the session conf, same as Bench's.
    val sess = edges.sparkSession
    val prevParts = if (loopShufflePartitions > 0)
      Some(sess.conf.get("spark.sql.shuffle.partitions")) else None
    if (loopShufflePartitions > 0)
      sess.conf.set("spark.sql.shuffle.partitions", loopShufflePartitions)
    try {
      val withDeg = sym.join(
        sym.groupBy(col("src")).agg(count(lit(1)).as("deg")), Seq("src"))
      val e = (if (checkpoint) withDeg.localCheckpoint(false) else withDeg)
      var rank = e.select(col("src").as("node"), col("deg")).distinct()
        .withColumn("rank", lit(scale))
      for (_ <- 1 to iters) {
        val next = e.join(rank.select(col("node"), col("rank")),
            e("src") === col("node"))
          .select(col("dst"), expr("rank div deg").as("contrib"))
          .groupBy(col("dst"))
          .agg((lit(scale / 8) + expr("7 * sum(contrib) div 8")).as("rank"))
          .select(col("dst").as("node"), col("rank"))
        rank = if (checkpoint) next.localCheckpoint(false) else next
      }
      val out = rank
        .join(e.select(col("src").as("node"), col("deg")).distinct(), Seq("node"))
        .select(col("node"), col("deg"), col("rank"))
      if (loopShufflePartitions > 0) out.localCheckpoint(true) else out
    } finally prevParts.foreach(p =>
      sess.conf.set("spark.sql.shuffle.partitions", p))
  }

  /** Synchronous label-propagation communities (Raghavan et al. 2007)
    * — the cheap community detector beside the min-label connected
    * components of [[graft.ops.Dedup.connectedComponents]] (which
    * finds REACHABILITY classes; LPA finds densely-connected groups
    * inside them): labels start as node ids and each round every node
    * adopts its neighbors' MODE label, ties to the smallest label —
    * `min(struct(-count, label))`, so every round is exact integer
    * arithmetic with a deterministic tiebreak and the whole fixed
    * `rounds` budget replays as a DuckDB recursive CTE (two-level
    * aggregation inside the recursive term: counts, then argmax).
    * Synchronous updates can oscillate on bipartite islands — that's
    * deterministic too and the fixed budget pins it.
    *
    * Scale posture = [[pagerankFixedPoint]]: per round one keyed
    * join + two keyed aggs on node/edge-scale frames, lazy local
    * checkpoints keep lineage one round deep, optional loop-scoped
    * shuffle partitions for the local[*] scheduling floor.
    */
  def labelPropagation(edges: DataFrame, rounds: Int,
      loopShufflePartitions: Int = 0): DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val sym = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .union(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .distinct()
    val sess = edges.sparkSession
    val prevParts = if (loopShufflePartitions > 0)
      Some(sess.conf.get("spark.sql.shuffle.partitions")) else None
    if (loopShufflePartitions > 0)
      sess.conf.set("spark.sql.shuffle.partitions", loopShufflePartitions)
    try {
      val e = sym.localCheckpoint(false)
      var lab = e.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (_ <- 1 to rounds) {
        val next = e.join(lab, e("src") === lab("node"))
          .select(col("dst"), col("label"))
          .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("__c"))
          .groupBy(col("dst"))
          .agg(min(struct((-col("__c")).as("nc"), col("label"))).as("__m"))
          .select(col("dst").as("node"), col("__m.label").as("label"))
        lab = next.localCheckpoint(false)
      }
      val out = lab.join(
        lab.groupBy(col("label")).agg(count(lit(1)).as("community_size")),
        Seq("label"))
        .select(col("node"), col("label"), col("community_size"))
      if (loopShufflePartitions > 0) out.localCheckpoint(true) else out
    } finally prevParts.foreach(p =>
      sess.conf.set("spark.sql.shuffle.partitions", p))
  }

  /** k-core decomposition by iterative peeling: drop every node whose
    * degree in the INDUCED surviving subgraph is below `k`, recompute,
    * repeat. Returns each surviving node with its core degree after at
    * most `rounds` peels (with early exit once the edge set is stable
    * — identical output to running the full budget, since peeling a
    * fixpoint is a no-op; the oracle always runs the full budget).
    *
    * Exactness: peeling is pure set arithmetic on integer degrees —
    * no ordering, no floats — so a fixed round budget replays exactly
    * as a DuckDB recursive CTE. The induced degree needs BOTH
    * endpoints' survival, which would reference the recursive table
    * twice; the oracle sidesteps the single-reference restriction by
    * computing both endpoint degrees as WINDOW counts over the one
    * allowed scan of the directed edge list (count OVER (PARTITION BY
    * x) == out-degree == degree, because edges are symmetrized).
    *
    * Scale: each round is one keyed degree agg + one keyed join —
    * same shape and valves as the CC loop (bounded `rounds` budget,
    * lazy local checkpoints so lineage stays one round deep; the
    * per-round count() actions that drive early exit are the same
    * price the CC convergence check pays).
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int,
      checkpoint: Boolean = true, smallGraphThreshold: Long = 0L,
      loopShufflePartitions: Int = 0): DataFrame = {
    require(k >= 1, "k must be positive")
    require(rounds >= 1, "rounds must be positive")
    val und = edges.filter(col("src") =!= col("dst"))
      .select(col("src").cast("long").as("x"), col("dst").cast("long").as("y"))
    val sym0 = und.union(und.select(col("y").as("x"), col("x").as("y"))).distinct()
    // Small-graph valve — same shape and sizing rule as pagerank's.
    if (smallGraphThreshold > 0) {
      val cached = sym0.persist()
      val probeCap = math.min(smallGraphThreshold, Int.MaxValue - 1L).toInt
      val n = cached.limit(probeCap + 1).count()
      if (n <= smallGraphThreshold) {
        var es = cached.collect().map(r => (r.getLong(0), r.getLong(1)))
        cached.unpersist()
        var r = 0
        var stable = false
        while (r < rounds && !stable) {
          val deg = es.groupBy(_._1).map { case (u, g) => u -> g.length }
          val next = es.filter { case (x, y) => deg(x) >= k && deg(y) >= k }
          stable = next.length == es.length
          es = next
          r += 1
        }
        val spark = edges.sparkSession
        return spark.createDataFrame(
          es.groupBy(_._1).toSeq.map { case (u, g) => (u, g.length.toLong) })
          .toDF("node", "core_deg")
      }
      cached.unpersist()
    }
    // loop-scoped shuffle-partition reduction — see pagerank's note;
    // here the per-round count() actions already execute inside the
    // scope, so only the final agg needs the eager checkpoint
    val sess = edges.sparkSession
    val prevParts = if (loopShufflePartitions > 0)
      Some(sess.conf.get("spark.sql.shuffle.partitions")) else None
    if (loopShufflePartitions > 0)
      sess.conf.set("spark.sql.shuffle.partitions", loopShufflePartitions)
    try {
      var e = if (checkpoint) sym0.localCheckpoint(false) else sym0
      // carry the cardinality across rounds: one count() per round, not
      // two (the previous round's next.count() IS this round's e.count())
      var eCount = e.count()
      var stable = false
      var r = 0
      while (r < rounds && !stable) {
        val deg = e.groupBy(col("x")).agg(count(lit(1)).as("d"))
        val next0 = e
          .join(deg.select(col("x"), col("d").as("dx")), Seq("x"))
          .join(deg.select(col("x").as("y"), col("d").as("dy")), Seq("y"))
          .filter(col("dx") >= k && col("dy") >= k)
          .select(col("x"), col("y"))
        val next = if (checkpoint) next0.localCheckpoint(false) else next0
        val nextCount = next.count()
        stable = nextCount == eCount
        eCount = nextCount
        e = next
        r += 1
      }
      val out = e.groupBy(col("x").as("node")).agg(count(lit(1)).as("core_deg"))
      if (loopShufflePartitions > 0) out.localCheckpoint(true) else out
    } finally prevParts.foreach(p =>
      sess.conf.set("spark.sql.shuffle.partitions", p))
  }

  /** Item-item cosine similarity from a bipartite basket graph (the
    * collaborative-filtering projection): items co-occurring in the
    * same basket score `cos(i,j) = n_ij / sqrt(n_i · n_j)` over basket
    * counts, and each item keeps its `topK` neighbors.
    *
    * Exactness: the counts are integers, their product stays exact in
    * binary64 far past any real catalog (< 2^53), IEEE `sqrt` is an
    * EXACT-ROUNDED operation (unlike ln/exp, both engines return the
    * identical bits), and the final division is one more rounding — so
    * cosines are bit-identical cross-engine with NO rounding step, and
    * the (cos desc, neighbor asc) top-k replays deterministically.
    *
    * Scale: the pair explosion is quadratic in basket size — the
    * whale-basket valve is `basketCap` via [[Dedup.capBlocks]]
    * (deterministic lowest-item-id truncation, salted two-phase), after
    * which pair fan-out is ≤ C(cap,2) per basket. Counts n_i are taken
    * over the SAME capped universe so the cosine is internally
    * consistent. The item-count frame broadcasts (item catalogs are
    * dimension-sized); the per-item top-k window partitions on the
    * uniform item key.
    */
  def cooccurrenceSimilarity(baskets: DataFrame, basketCol: String,
      itemCol: String, basketCap: Int = 6, topK: Int = 3): DataFrame = {
    // eager checkpoint of the capped baskets in ARRAY form (r22): the
    // bounded heap aggregates each basket straight into its sorted item
    // array (the same aggregation the row cap paid), the checkpoint cuts
    // the basket-build lineage for all consumers, the n_i counts explode
    // it row-locally, and the pair leg emits every i<j pair with the
    // slice device (Dedup.cappedBlockPairs) — the capped self-join and
    // its two shuffles are gone. pairs stays checkpointed (two
    // symmetrization consumers).
    val cappedArr = graft.transform.Skew.aggTopKArray(
      baskets.select(col(basketCol), col(itemCol)).distinct(),
      Seq(col(basketCol)), col(itemCol), basketCap, outCol = "__items")
      .localCheckpoint(true)
    val ni = cappedArr.select(explode(col("__items")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n"))
    val pairs = cappedArr
      .select(posexplode(col("__items")).as(Seq("__pos", "i")), col("__items"))
      .select(col("i"), explode(slice(col("__items"), col("__pos") + lit(2),
        size(col("__items")))).as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n_ij"))
      .localCheckpoint(true)
    val sym = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j"), col("n_ij")))
    val scored = sym
      .join(broadcast(ni.select(col("item").as("i"), col("n").as("n_i"))), Seq("i"))
      .join(broadcast(ni.select(col("item").as("j"), col("n").as("n_j"))), Seq("j"))
      .withColumn("cos", col("n_ij").cast("double")
        / sqrt(col("n_i").cast("double") * col("n_j").cast("double")))
    // per-item neighbor cut via the bounded heap (r22): (-cos, j) min-k
    // == (cos desc, j asc) window rank; double negation restores
    // identical bits
    graft.transform.Skew.aggTopK(scored, Seq(col("i")),
        entry = struct((-col("cos")).as("__nc"), col("j").as("j"),
          col("n_ij").as("n_ij"), col("n_i").as("n_i"), col("n_j").as("n_j")),
        k = topK, rankCol = "rank")
      .select(col("i"), col("j"), col("n_ij"), col("n_i"), col("n_j"),
        col("rank"), (-col("__nc")).as("cos"))
  }

  /** Batch recommendation GENERATION — the serving job on top of
    * [[cooccurrenceSimilarity]]'s item-item model: for every basket
    * owner, score every unseen neighbor item by the SUM of its
    * similarities to the owner's items, and emit the top `recTopK`.
    * The classic item-CF batch recommender (Sarwar et al. 2001), end
    * to end in one query.
    *
    * Scale: the capped basket frame (owners × ≤cap items) is
    * CHECKPOINTED once — five consumers otherwise re-run the basket
    * build five times; the similarity model is output-bounded
    * (items × simTopK) and checkpointed too; candidate fan-out is
    * bounded by cap·simTopK per owner; seen items drop via a keyed
    * LEFT ANTI join; the neighbor and final cuts are mergeable
    * bounded-heap top-k aggregates, never a corpus window.
    *
    * Determinism: the score is a sum of DOUBLES — accumulated as a
    * running window sum in pinned contributing-item order (the
    * psi_cum device) so the association is engine-independent, and
    * ranked UNROUNDED (identical bits both engines) with (score desc,
    * item asc) tie-pins; the emitted score is pround(6).
    */
  def recommendItems(baskets: DataFrame, basketCol: String, itemCol: String,
      basketCap: Int = 6, simTopK: Int = 3, recTopK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // capped baskets checkpointed in ARRAY form (r22): one bounded-heap
    // aggregation, row views explode it row-locally, and the pair leg
    // uses the slice device — no capped self-join (see
    // cooccurrenceSimilarity's note)
    val cappedArr = graft.transform.Skew.aggTopKArray(
      baskets.select(col(basketCol), col(itemCol)).distinct(),
      Seq(col(basketCol)), col(itemCol), basketCap, outCol = "__items")
      .select(col(basketCol).as("bk"), col("__items"))
      .localCheckpoint(true)
    val capped = cappedArr.select(col("bk"),
      explode(col("__items")).as("item"))
    val ni = capped.groupBy(col("item").as("i")).agg(count(lit(1)).as("n"))
    val pairs = cappedArr
      .select(posexplode(col("__items")).as(Seq("__pos", "i")), col("__items"))
      .select(col("i"), explode(slice(col("__items"), col("__pos") + lit(2),
        size(col("__items")))).as("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("n_ij"))
    val sym = pairs.unionByName(
      pairs.select(col("j").as("i"), col("i").as("j"), col("n_ij")))
    val scored = sym
      .join(broadcast(ni), Seq("i"))
      .join(broadcast(ni.select(col("i").as("j"), col("n").as("__nj"))), Seq("j"))
      .withColumn("cos", col("n_ij").cast("double") /
        sqrt(col("n").cast("double") * col("__nj").cast("double")))
    // per-item neighbor cut via the bounded heap (r22): (-cos, j) min-k
    // == (cos desc, j asc) window rank; un-negation restores identical
    // double bits for the downstream running sum
    val sims = graft.transform.Skew.aggTopK(
        scored, Seq(col("i")),
        entry = struct((-col("cos")).as("__nc"), col("j").as("j")),
        k = simTopK)
      .select(col("i"), col("j"), (-col("__nc")).as("cos"))
      .localCheckpoint(true)
    val cand = capped.select(col("bk"), col("item").as("i"))
      .join(sims, Seq("i"))
      .join(capped.select(col("bk"), col("item").as("j")), Seq("bk", "j"),
        "left_anti")
    val wOrd = Window.partitionBy(col("bk"), col("j")).orderBy(col("i").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pinned = cand
      .withColumn("__cum", sum(col("cos")).over(wOrd))
      .groupBy(col("bk"), col("j"))
      .agg(count(lit(1)).as("n_contrib"),
        max(struct(col("i"), col("__cum"))).as("__last"))
      .select(col("bk"), col("j"), col("n_contrib"),
        col("__last.__cum").as("__score"))
    // final cut via the mergeable bounded-heap top-k (r22): (-score, j)
    // min-k replays the (score desc, j asc) window order exactly (double
    // negation is exact; ±0.0 compare equal); n_contrib rides as payload
    graft.transform.Skew.aggTopK(
        pinned, Seq(col("bk")),
        entry = struct((-col("__score")).as("__ns"), col("j").as("j"),
          col("n_contrib").as("n_contrib")),
        k = recTopK, rankCol = "rank")
      .select(col("bk").as(basketCol), col("j").as("rec_item"),
        col("n_contrib"), col("rank"),
        graft.util.Rounding.pround(-col("__ns"), 6).as("score"))
  }

  /** Per-node triangle counts via DEGREE-ORDERED wedge closing (the
    * Cohen / Suri-Vassilvitskii MapReduce scheme): orient every
    * undirected edge from its lower-(degree, id) endpoint to the
    * higher one, build wedges only at each edge's low end, and close
    * them against the oriented edge set. Orientation bounds the wedge
    * fan-out at O(m^1.5) total (each node's out-degree is at most
    * ~sqrt(m) under degree ordering) — the id-ordered naive plan
    * instead explodes around high-degree hubs, which is exactly the
    * skew that kills this operator at 100 TB.
    *
    * Exactness: triangle membership is orientation-INVARIANT, so the
    * oracle can count with the naive id-ordered 3-way self-join and
    * must land on identical per-node integers — the gate doubles as a
    * proof that the degree-ordered rewrite is lossless. Nodes in no
    * triangle are omitted (both formulations agree).
    *
    * Input: undirected edge list (`src`, `dst`); self-loops dropped,
    * duplicates collapsed. Output: (node, n_triangles).
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // eager checkpoints (r21): `und` feeds the degree agg TWICE and the
    // orientation join once, and `oriented` feeds three consumers (two
    // wedge legs + the closing edge set) — un-cut, each consumer re-ran
    // the whole upstream lineage (the caller's edge build included: the
    // q93 co-supplier edges are themselves a distinct+cap+self-join
    // pipeline, 60 parquet scans in the static plan). Both frames are
    // edge-scale. Measured 3.08 s → 2.07 s at sf0.1 on q93.
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient: u -> v iff (deg(u), u) < (deg(v), v)
    val withDegs = und
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
    val oriented = withDegs.select(
      when(col("deg_a") < col("deg_b")
        || (col("deg_a") === col("deg_b") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("deg_a").as("du"), col("deg_b").as("dv")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("v"), col("deg_b").as("du"), col("deg_a").as("dv")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"),
        col("e.du").as("du"), col("e.dv").as("dv"))
      .localCheckpoint(true)
    // wedges at the low endpoint, second leg strictly above the first
    // in the same (deg, id) order so each triangle closes exactly once
    val e1 = oriented.select(col("u"), col("v").as("w1"), col("dv").as("d1"))
    val e2 = oriented.select(col("u"), col("v").as("w2"), col("dv").as("d2"))
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("d1") < col("d2")
        || (col("d1") === col("d2") && col("w1") < col("w2")))
    val closing = oriented.select(col("u").as("w1"), col("v").as("w2"))
    val tris = wedges.join(closing, Seq("w1", "w2"))
      .select(col("u"), col("w1"), col("w2"))
    tris.select(explode(array(col("u"), col("w1"), col("w2"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
  }
}
