package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rank aggregation for retrieval pipelines: reciprocal-rank fusion
  * (Cormack, Clarke & Büttcher, SIGIR 2009) — the standard way to
  * merge heterogeneous rankers (BM25 + embedding kNN, spend +
  * engagement) without score calibration: each list contributes
  * `1/(k + rank)` and the fused order is by the summed contribution.
  * RRF is rank-only, so it composes rankers whose raw scores live on
  * incomparable scales — exactly the situation after q94 (BM25) and
  * q20/q25 (vector kNN) produce candidates for the same query.
  *
  * Exactness: each contribution is ONE IEEE division of exact
  * integers (`1.0/(k + rank)`), and the fused score sums the
  * contributions in DECLARED LIST ORDER (a left fold spelled the same
  * way in the oracle), so the doubles are bit-identical cross-engine
  * — no rounding column, ties at the cut broken by id.
  *
  * Scale: one full-outer equi-join per extra ranker on the id key
  * (rankers emit top-k lists, so these frames are k-sized, not
  * corpus-sized — broadcast them when k is small); the final cut is
  * TakeOrdered (no global sort). An id absent from a list contributes
  * 0, the RRF convention for beyond-top-k documents.
  */
object Ranking {

  /** Fuse `rankings` — (name, DataFrame with `idCol` and `rankCol`,
    * rank 1-based) — into the top `topK` ids by RRF score. Output:
    * id, one `rank_<name>` column per ranker (NULL if absent), and
    * `rrf_score`.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
      rankCol: String, k: Int = 60, topK: Int = 25): DataFrame = {
    require(rankings.size >= 2, "fusing fewer than two rankers is a no-op")
    val renamed = rankings.map { case (name, df) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"rank_$name"))
    }
    val joined = renamed.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = rankings.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(k.toLong) + col(s"rank_$name")).cast("double"),
        lit(0.0))
    }.reduce(_ + _)
    joined.withColumn("rrf_score", score)
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** Deterministic top-`n` ranker WITHOUT a global window: the cut is
    * `orderBy(score desc, id asc).limit(n)` — planned as TakeOrdered
    * (per-partition partial top-n, then a tree reduce; nothing ever
    * funnels the full id set through one reducer) — and ranks attach
    * to the n-row result by counting strict predecessors via a
    * broadcast self-join (≤ n² pair evaluations of an n-row frame).
    * The total order (score desc, id asc) makes both the cut and the
    * ranks reproducible; an oracle spelled as the NAIVE global
    * `row_number() … QUALIFY rank <= n` proves the rewrite lossless.
    *
    * This is the scale-correct way to MANUFACTURE the top-k lists RRF
    * consumes: ranking the entire id universe first (then fusing the
    * top of it) plans an unpartitioned window over the corpus — the
    * canonical 100× scale-killer.
    */
  def topNRanker(df: DataFrame, idCol: String, scoreCol: String,
      n: Int): DataFrame = {
    require(n >= 1, "topNRanker needs n >= 1")
    val top = df.orderBy(col(scoreCol).desc, col(idCol).asc).limit(n)
      .select(col(idCol), col(scoreCol))
    val strictlyBefore =
      col(s"b.$scoreCol") > col(s"a.$scoreCol") ||
        (col(s"b.$scoreCol") === col(s"a.$scoreCol") &&
          col(s"b.$idCol") < col(s"a.$idCol"))
    top.as("a").join(broadcast(top.as("b")), strictlyBefore, "left")
      .groupBy(col(s"a.$idCol").as(idCol))
      .agg((count(col(s"b.$idCol")) + 1L).as("rank"))
  }
}
