package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys (the 100 TB posture: a single
  * key with 1% of 100 TB melts one reducer). AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here) covers
  * sort-merge joins at runtime; these helpers cover the cases AQE
  * doesn't: skewed aggregations and broadcast-ineligible skewed joins.
  */
object Skew {

  /** Two-phase salted aggregation for skewed groupBy keys.
    *
    * Phase 1 groups by (key, salt) — the hot key spreads over
    * `numSalts` reducers; phase 2 merges the partials by key. Caller
    * supplies both the partial aggregates and how to merge them, e.g.
    * {{{
    * Skew.saltedAggregate(df, Seq("k"), 32,
    *   partial = Seq(sum("v").as("s"), count(lit(1)).as("c")),
    *   merge   = Seq(sum("s").as("sum_v"), sum("c").as("n")))
    * }}}
    * Algebraic aggregates only (sum/count/min/max — avg must be
    * decomposed into sum+count by the caller, as above).
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      partial: Seq[Column],
      merge: Seq[Column]): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Block-local pair generation (a self-join on a blocking key) with a
    * hot block's quadratic work spread over `numSalts²` tasks instead of
    * one reducer. Each side is assigned a deterministic salt from its
    * own id and replicated over the other side's salt space, so every
    * (a, b) pair within a block meets in exactly ONE task — results are
    * identical to `a.join(b, blockCol)`, but a block holding 1% of a
    * 100 TB corpus no longer lands on a single reducer. Output size is
    * still O(B²) per block: cap block sizes upstream when B itself is
    * unbounded. Replication cost: numSalts× each input.
    */
  def saltedBlockSelfJoin(
      a: DataFrame,
      b: DataFrame,
      blockCol: String,
      saltKeyA: Column,
      saltKeyB: Column,
      numSalts: Int): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    val aS = a
      .withColumn("__pa", pmod(hash(saltKeyA), lit(numSalts)))
      .withColumn("__pb", explode(sequence(lit(0), lit(numSalts - 1))))
    val bS = b
      .withColumn("__pb", pmod(hash(saltKeyB), lit(numSalts)))
      .withColumn("__pa", explode(sequence(lit(0), lit(numSalts - 1))))
    aS.join(bS, Seq(blockCol, "__pa", "__pb")).drop("__pa", "__pb")
  }

  /** Two-phase top-k per key for skewed/huge groups: rows first split
    * into `numSalts` hash buckets per key (on `saltCol`, which must be
    * part of the total order so bucket winners are well-defined), each
    * bucket keeps its own top-k, then the survivors — numSalts×k per
    * key, not the whole group — are ranked globally. The global top-k
    * is a subset of the bucket winners and the final window applies the
    * same total order, so the result (including the emitted `rankCol`)
    * is identical to a single per-key window — but no reducer ever
    * sees more than one bucket of one key.
    */
  def saltedTopK(
      df: DataFrame,
      partitionCols: Seq[Column],
      orderCols: Seq[Column],
      saltCol: Column,
      k: Int,
      numSalts: Int,
      rankCol: String = "rn",
      castRankTo: Option[String] = Some("long")): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pruned =
      if (numSalts <= 1) df
      else {
        // bucket as a materialized column, not a partitionBy expression —
        // an expression there defeats the rank-limit pushdown
        // (WindowGroupLimit), which is most of the point of the prune
        val wb = Window
          .partitionBy(partitionCols :+ col("__bucket"): _*)
          .orderBy(orderCols: _*)
        df.withColumn("__bucket", pmod(hash(saltCol), lit(numSalts)))
          .withColumn("__brank", row_number().over(wb))
          .filter(col("__brank") <= k).drop("__bucket", "__brank")
      }
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val rn = row_number().over(w)
    pruned
      .withColumn(rankCol, castRankTo.map(rn.cast).getOrElse(rn))
      .filter(col(rankCol) <= k)
  }

  /** Exact top-k per key as a MERGEABLE AGGREGATE (r21, guide §2.3
    * "aggregate before you shuffle"): one bounded heap of k entries per
    * key, built map-side and merged — so the shuffle carries k entries
    * per key per map partition instead of EVERY candidate row reaching
    * a rank window. This is the 100 TB shape for pair-scale scored
    * frames (brute-force kNN scores |queries|·|corpus| rows; the salted
    * two-phase window still shuffles all of them once): the map-side
    * cut is also strictly more skew-proof than salting — a single
    * giant key reduces to (#map partitions)·k heap entries at one
    * reducer.
    *
    * `entry` must be a STRUCT whose leading fields are the ASCENDING
    * total order (spell a descending field by negating it — exact for
    * longs below Long.MaxValue magnitudes and for doubles, where ±0.0
    * compare equal in Spark's ordering anyway) and whose order prefix
    * is UNIQUE per key (score + tiebreak id); later fields are payload
    * the comparison never reaches. NULL orderings differ from a rank
    * window (nulls-first structs vs desc-nulls-last windows) — callers
    * guarantee non-null order fields, which every ANN scorer here does
    * (ANSI division throws on zero norms long before a null cosine).
    *
    * Output: `partitionCols`, `rankCol` (1..k in `entry`'s ascending
    * order), and the entry's fields expanded — the caller re-projects
    * (and un-negates) as needed. SkewSpec pins byte-equivalence with
    * the [[saltedTopK]] window formulation.
    */
  def aggTopK(df: DataFrame, partitionCols: Seq[Column], entry: Column,
      k: Int, rankCol: String = "rn",
      castRankTo: Option[String] = Some("long")): DataFrame = {
    require(k >= 1, "aggTopK needs k >= 1")
    val rn0 = col("__pos") + 1
    aggTopKArray(df, partitionCols, entry, k, outCol = "__tk")
      .select(partitionCols :+
        posexplode(col("__tk")).as(Seq("__pos", "__e")): _*)
      .select(partitionCols ++ Seq(
        castRankTo.map(rn0.cast).getOrElse(rn0).as(rankCol),
        col("__e.*")): _*)
  }

  /** [[aggTopK]]'s aggregation stage, returning the per-key minimal-k
    * entries as ONE ascending-sorted ARRAY column instead of exploded
    * ranked rows — for consumers that want the list itself (inverted-
    * index postings, KMV min-k sketches), this removes aggTopK's
    * posexplode + the re-collect a list consumer would pay on top.
    * `entry` may be any orderable column (a bare long/string works —
    * no struct wrapper needed when there is no payload); same non-null
    * ordering contract as [[aggTopK]]. Keys with fewer than k rows keep
    * them all.
    */
  def aggTopKArray(df: DataFrame, partitionCols: Seq[Column], entry: Column,
      k: Int, outCol: String = "topk"): DataFrame = {
    require(k >= 1, "aggTopKArray needs k >= 1")
    val tk = org.apache.spark.sql.GraftSqlBridge
      .collectTopK(entry, k, reverse = true)
    df.groupBy(partitionCols: _*).agg(array_sort(tk).as(outCol))
  }

  /** Pre-flight join-size and skew forecast — compute the EXACT output
    * cardinality of `a ⋈ b` on `keyCols` and its hottest keys WITHOUT
    * running the join: per-key counts on each side (map-side
    * partials), a key-domain-sized count join, `pairs = n_a·n_b` per
    * key in DECIMAL, Σ as the forecast total, and the topK
    * contributors via TakeOrdered. This is how a 100 TB pipeline
    * DECIDES between plain join / broadcast / salting / capBlocks
    * before paying for the wrong one — the q113 hot-prefix incident
    * as a reusable audit: a key carrying >1% of a quadratic output
    * is visible here for the cost of two aggregations.
    *
    * Output: one row per top-K key — `(keyCols*, n_a, n_b, pairs,
    * total_pairs, share)`; `pairs`/`total_pairs` are exact (DECIMAL
    * assembly, emitted as longs — exact while the forecast output
    * < 2⁶³ rows, which is already far past runnable), `share` one
    * division.
    */
  def joinSizeForecast(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      topK: Int = 10, reliable: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "joinSizeForecast needs join keys")
    val keys = keyCols.map(col)
    joinSizeForecastFromCounts(
      a.groupBy(keys: _*).agg(count(lit(1)).as("n_a")),
      b.groupBy(keys: _*).agg(count(lit(1)).as("n_b")),
      keyCols, topK, reliable)
  }

  /** [[joinSizeForecast]] from PRE-HARVESTED per-key count frames
    * (`keyCols*, n_a` / `keyCols*, n_b`) — the registry-statistics
    * path: when both sides were ANALYZEd at register time
    * ([[graft.core.StatsStore]]), the forecast costs a key-domain-sized
    * join instead of two table scans. Identical output to the scanning
    * form by construction (the scan form delegates here).
    */
  def joinSizeForecastFromCounts(ca: DataFrame, cb: DataFrame,
      keyCols: Seq[String], topK: Int = 10,
      reliable: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "joinSizeForecast needs join keys")
    val keys = keyCols.map(col)
    // EAGER checkpoint of the per-key frame, then a DISTRIBUTED agg for
    // the total + broadcast crossJoin of the 1-row result (ADVICE r17).
    // The two prior forms each failed one way: a separate .agg subtree
    // co-planned the whole lineage twice (both input tables' scans — two
    // scans per 100 TB side; ReuseExchange never fires across the
    // column-pruned copies), and an unpartitioned window over `per`
    // funneled the entire distinct-key domain through ONE reducer — for
    // the 100 TB pre-flight this tool exists for, the joint key domain
    // can be billions of rows, so the forecast itself became the
    // single-reducer scale-killer it is meant to predict. The
    // checkpoint pays one key-domain materialization and buys both:
    // inputs scanned once, total computed with map-side partials.
    //
    // CALL-TIME EXECUTION + durability (ADVICE r18): the checkpoint
    // makes this method EAGER — the key-domain materialization runs at
    // call time, not first action. The default localCheckpoint stores
    // NON-REPLICATED executor-local blocks: on executor loss the
    // forecast job fails outright instead of recomputing (acceptable
    // for a pre-flight — rerun it), but a very-large-domain run that
    // must survive preemption should pass `reliable = true` to use a
    // fault-tolerant checkpoint into sc.setCheckpointDir's HDFS dir.
    val perStage = forecastPerKey(ca, cb, keyCols)
    val per =
      if (reliable) {
        require(ca.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "joinSizeForecast(reliable = true) needs " +
            "SparkContext.setCheckpointDir — a reliable checkpoint " +
            "writes the key-domain frame to fault-tolerant storage")
        perStage.checkpoint(eager = true)
      } else perStage.localCheckpoint(true)
    val total = per.agg(
      sum(col("pairs").cast("decimal(38,0)"))
        .cast("decimal(38,0)").cast("long").as("total_pairs"))
    per.crossJoin(broadcast(total))
      .orderBy(col("pairs").desc +: keys.map(_.asc): _*).limit(topK)
      .select(keys ++ Seq(col("n_a"), col("n_b"), col("pairs"),
        col("total_pairs"),
        (col("pairs").cast("double") / col("total_pairs").cast("double"))
          .as("share")): _*)
  }

  /** The forecast's per-key stage — exposed pre-checkpoint so PlanSpec
    * can pin the input-side plan (checkpoints truncate explain at
    * LogicalRDD; the mmrCandidates pattern).
    */
  private[graft] def forecastPerKey(ca: DataFrame, cb: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    def dec(c: Column) = c.cast("decimal(19,0)")
    ca.join(cb, keyCols)
      .withColumn("pairs",
        (dec(col("n_a")) * dec(col("n_b"))).cast("decimal(38,0)").cast("long"))
  }

  /** Salted join of a skewed fact side against a dimension: the fact
    * side gets a random salt in [0, numSalts); the dimension is
    * replicated once per salt value; the join key becomes (key, salt).
    * Use when the dimension is too big to broadcast but the fact side
    * has hot keys. Replication factor = numSalts × |dim|.
    */
  def saltedJoin(
      skewed: DataFrame,
      dim: DataFrame,
      key: String,
      numSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    // The dimension is replicated numSalts×, so any join type that can
    // emit unmatched DIM rows (right/full outer) would emit each of them
    // numSalts times. Only fact-preserving joins are correct here.
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"saltedJoin supports inner/left-family joins only, got '$joinType' " +
        "(right/full outer would duplicate unmatched dimension rows)")
    val saltedFact = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(numSalts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
