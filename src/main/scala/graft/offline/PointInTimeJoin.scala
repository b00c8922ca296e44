package graft.offline

import graft.core.{Feature, FeatureView}
import graft.sources.SourceReader
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-in-time-correct (as-of) historical retrieval — the defining
  * operator of the system (reference `CASE.MD:337-501`, the Feast
  * spark-offline-store generated SQL, executed at
  * `Untitled.ipynb:682-868`).
  *
  * Semantics reproduced from the reference SQL:
  *   - J1 base join: feature rows with `feature.ts <= entity.ts`, equi on
  *     join keys, plus TTL lower bound `feature.ts >= entity.ts - ttl`
  *     when ttl > 0 (`CASE.MD:385-386,407-422`);
  *   - global upper-bound pre-filter `WHERE ts <= max(entity.ts)` pushed
  *     into the feature scan (`CASE.MD:394-405`) so parquet row-group
  *     stats / partition pruning bound the read;
  *   - A6 entity dedup (`GROUP BY join_key, ts`, `CASE.MD:365-375`);
  *   - A7 + W1 latest-row selection: MAX(created) dedup then
  *     `ROW_NUMBER() OVER (... ORDER BY event_ts DESC, created DESC)`
  *     (`CASE.MD:424-463`);
  *   - J4 final per-view LEFT JOIN that null-pads entities with no
  *     eligible feature rows (`CASE.MD:486-501`).
  *
  * Spark-first redesign (NOT a translation): the reference needs a
  * synthetic `entity_row_unique_id` plus a dedup GROUP BY, a window, and
  * two self-joins because it composes SQL text. Natively we collapse
  * A7+W1+J2+J3 into ONE aggregation: `max(struct(event_ts, created_ts,
  * feature...))` keyed by (view join keys, entity_ts). Struct ordering is
  * lexicographic, so the max IS the argmax by (event_ts DESC, created
  * DESC) — and any residual tie resolves deterministically on the feature
  * values themselves (pinning the nondeterminism called out in SURVEY
  * §7.4.1). Per view this costs exactly one shuffle for the join and one
  * for the agg (both keyed on the join keys, so AQE can reuse the
  * exchange), versus the reference's join + window + two more joins. No
  * pandas round-trip, no task-closure shipping of the entity df (the
  * reference's 4247 KiB closures, SURVEY §4 last row): the entity df
  * stays a distributed DataFrame end-to-end, and at 1000-executor scale
  * the per-view fold keeps every boundary a keyed exchange.
  */
object PointInTimeJoin {

  /** One retrieval unit: a view, the features wanted from it, and its
    * registry-resolved entity join keys.
    */
  final case class ViewRequest(
      view: FeatureView,
      features: Seq[Feature],
      joinKeys: Seq[String])

  /** @param coarseBucketSeconds scale valve for TTL-less views: a view
    *   WITHOUT a TTL has no J1 lower bound, so its pre-argmax join output
    *   is |history per key| × |cutoffs per key| — a blow-up on
    *   long-history keys at 100×. With a granularity g set, the feature
    *   side is first argmax-reduced to latest-per-(key, g-bucket); a
    *   cutoff then joins the reduced rows of FULL earlier buckets (all
    *   eligible by construction) plus the raw rows of its own partial
    *   bucket — max is associative, so the final argmax over that union
    *   equals the argmax over all eligible rows (PitPropertySpec pins
    *   equality). Join cost per key drops from O(history × cutoffs) to
    *   O(buckets × cutoffs + bucket_width × cutoffs). Views WITH a TTL
    *   are already bounded and skip this.
    */
  def retrieve(
      spark: SparkSession,
      entityDf0: DataFrame,
      requests: Seq[ViewRequest],
      entityTsCol: String = "event_timestamp",
      fullFeatureNames: Boolean = true,
      prefilterByEntityRange: Boolean = true,
      cacheEntity: Boolean = false,
      coarseBucketSeconds: Option[Long] = None): DataFrame = {

    require(entityDf0.columns.contains(entityTsCol),
      s"entity dataframe lacks timestamp column '$entityTsCol'")

    // The reference mixes string- and timestamp-typed event timestamps
    // (SURVEY §7.4.2); normalize string entity timestamps at the boundary
    // so the as-of comparisons are always typed.
    val entityDf1 =
      if (entityDf0.schema(entityTsCol).dataType ==
        org.apache.spark.sql.types.StringType)
        entityDf0.withColumn(entityTsCol, to_timestamp(col(entityTsCol)))
      else entityDf0

    // The entity df is consumed 2×V+1 times (per-view keyspace, final
    // left joins, min/max bounds). For non-trivial entity inputs,
    // persisting avoids recomputing its lineage for every pass — the
    // distributed analogue of the reference materializing the entity df
    // as a temp view (without its driver round-trip). NOTE: a caller
    // passing cacheEntity=true owns the unpersist; the FeatureStore
    // facade instead persists caller-side and releases via
    // RetrievalJob.release(). That ownership contract is only
    // honorable when the frame we persist IS the caller's frame: the
    // string-timestamp normalization above builds a NEW plan the
    // caller holds no reference to, so caching it would pin blocks no
    // unpersist can ever reach — refuse loudly instead of leaking.
    require(!cacheEntity || (entityDf1 eq entityDf0),
      s"cacheEntity=true with a string-typed '$entityTsCol' would persist " +
        "an internal normalized frame the caller can never unpersist — " +
        "cast the column to timestamp caller-side first (to_timestamp), " +
        "or use FeatureStore.getHistoricalFeatures, which owns its cache")
    val entityDf =
      if (cacheEntity)
        entityDf1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else entityDf1

    // Driver-side scalar bounds for scan pruning (one tiny agg job, the
    // same trick as the reference's interpolated '<max entity ts>' literal,
    // CASE.MD:403). Skippable for purely lazy plans. Doubles as the
    // guard against unparseable string timestamps: to_timestamp maps bad
    // strings to null, which would otherwise silently null-pad features.
    lazy val (minEntityTs, maxEntityTs) = {
      val row = entityDf.agg(
        min(col(entityTsCol)).cast("timestamp"),
        max(col(entityTsCol)).cast("timestamp"),
        count(col(entityTsCol)),
        count(lit(1))).head()
      val (nonNull, total) = (row.getLong(2), row.getLong(3))
      require(total > 0, "entity dataframe is empty")
      require(nonNull == total,
        s"entity timestamp column '$entityTsCol' has ${total - nonNull} " +
          "null/unparseable values (string timestamps must be " +
          "'yyyy-MM-dd HH:mm:ss'-parseable)")
      (row.getTimestamp(0), row.getTimestamp(1))
    }
    // the bounds agg doubles as the null/unparseable guard, but it is
    // lazy and prefilterByEntityRange=false never forces it — when the
    // string normalization above ran, to_timestamp may have minted
    // nulls, and an already-TIMESTAMP-typed column whose schema admits
    // nulls can carry them too (ADVICE r19); either way, skipping the
    // guard would silently null-pad every feature for those rows.
    // Force it whenever normalization happened OR the typed column is
    // nullable — the cost is one tiny agg job; only a provably
    // non-nullable typed column keeps the fully lazy behavior.
    // INTENDED side effect (ADVICE r20): since typed columns are
    // nullable in almost all real sources, an EMPTY entity df now
    // fails fast here ("entity dataframe is empty") even with
    // prefilterByEntityRange=false — matching the prefilter=true path
    // rather than lazily returning an empty result. An empty entity df
    // in a PIT retrieval is a caller bug, not a degenerate input.
    if (!(entityDf1 eq entityDf0) ||
      entityDf1.schema(entityTsCol).nullable) { val _ = minEntityTs }

    requests.foldLeft(entityDf) { case (acc, ViewRequest(fv, feats, joinKeys)) =>
      joinKeys.foreach { k =>
        require(entityDf.columns.contains(k),
          s"entity dataframe lacks join key '$k' required by view '${fv.name}'")
      }
      val tsField = fv.source.timestampField
      val createdOpt = fv.source.createdTimestampColumn

      // Feature-side scan: read only join keys + time columns + requested
      // features (column pruning reaches the parquet scan); the entity
      // time range lands inside the read so it pushes to PushedFilters
      // even for raw-nanosecond sources (see SourceReader.read bounds).
      val featCols = (joinKeys ++ Seq(tsField) ++ createdOpt ++ feats.map(_.name)).distinct
      val upper = if (prefilterByEntityRange) Some(maxEntityTs) else None
      val lower =
        if (prefilterByEntityRange)
          fv.ttl.map(ttl => new java.sql.Timestamp(minEntityTs.getTime - ttl.toMillis))
        else None
      val feat = SourceReader.read(spark, fv.source, lower, upper)
        .select(featCols.map(col): _*)

      // Disambiguate: prefix every feature-side column.
      val p = "__graft_f_"
      val featP = feat.select(feat.columns.toIndexedSeq.map(c => col(c).as(p + c)): _*)

      // A6: entity keyspace dedup — the PIT result depends only on
      // (join keys, entity_ts), so aggregate over that compact keyspace,
      // not the full entity df.
      val keySpace = entityDf
        .select((joinKeys :+ entityTsCol).distinct.map(col): _*)
        .distinct()

      // A7+W1+J2+J3 in one argmax: max of (event_ts, created_ts, features)
      // struct == latest eligible row per (join keys, entity_ts).
      val orderCols =
        Seq(featP(p + tsField).as("__ts")) ++
          createdOpt.map(c => featP(p + c).as("__created")) ++
          feats.zipWithIndex.map { case (f, i) => featP(p + f.name).as(s"__v$i") }
      val outCols = joinKeys.map(keySpace(_)) :+ keySpace(entityTsCol)

      // J1: equi join on keys with the as-of range as residual predicate,
      // producing (join keys, entity_ts, candidate struct) rows.
      val candidates: DataFrame = (fv.ttl, coarseBucketSeconds) match {
        case (None, Some(g)) =>
          // TTL-less scale path: pre-reduce to latest-per-(key, bucket),
          // then full-earlier-buckets (reduced) ∪ own-partial-bucket (raw).
          val gMicros = g * 1000000L
          // integral division spelled `div`, never `/` (DOUBLE division
          // rounds for |micros| ≥ 2^53 — far-future sentinel timestamps
          // in dirty feeds; the full/partial split only stayed correct
          // because both sides shared the same monotone rounding — an
          // invariant nothing pinned). The numerator is pmod-floored to
          // an EXACT multiple of gMicros, so `div` is exact either sign;
          // spelled through a named projection because `div` exists only
          // in SQL-expression space (CLAUDE.md rule).
          def withBucket(df: DataFrame, src: Column, out: String): DataFrame =
            df.withColumn("__bsrc",
                unix_micros(src) - pmod(unix_micros(src), lit(gMicros)))
              .withColumn(out, expr(s"__bsrc div ${gMicros}L"))
              .drop("__bsrc")
          val bucketed = withBucket(featP, featP(p + tsField), "__fb")
          val reduced = bucketed
            .groupBy((joinKeys.map(k => col(p + k)) :+ col("__fb")): _*)
            .agg(max(struct(orderCols: _*)).as("__cand"))
          val keyed = withBucket(keySpace, col(entityTsCol), "__eb")
          val equiR = joinKeys.map(k => reduced(p + k) === keyed(k))
          val full = reduced
            .join(keyed, (equiR :+ (reduced("__fb") < keyed("__eb"))).reduce(_ && _))
            .select(outCols :+ col("__cand"): _*)
          val equiB = joinKeys.map(k => bucketed(p + k) === keyed(k))
          val partial = bucketed
            .join(keyed, (equiB :+ (bucketed("__fb") === keyed("__eb")) :+
              (bucketed(p + tsField) <= keyed(entityTsCol))).reduce(_ && _))
            .select(outCols :+ struct(orderCols: _*).as("__cand"): _*)
          full.unionByName(partial)
        case _ =>
          val equi = joinKeys.map(k => featP(p + k) === keySpace(k))
          val asOf = featP(p + tsField) <= keySpace(entityTsCol)
          val ttlBound = fv.ttl.map { ttl =>
            // toMillis, not getSeconds: a sub-second TTL must not
            // silently truncate to zero
            featP(p + tsField) >=
              keySpace(entityTsCol) - expr(s"INTERVAL ${ttl.toMillis} MILLISECOND")
          }
          val cond = (equi :+ asOf) ++ ttlBound
          featP.join(keySpace, cond.reduce(_ && _), "inner")
            .select(outCols :+ struct(orderCols: _*).as("__cand"): _*)
      }

      val best = candidates
        .groupBy((joinKeys :+ entityTsCol).map(col): _*)
        .agg(max(col("__cand")).as("__best"))

      def outName(f: Feature): String =
        if (fullFeatureNames) s"${fv.name}__${f.name}" else f.name
      val cleaned = best.select(
        (joinKeys :+ entityTsCol).map(col) ++
          feats.zipWithIndex.map { case (f, i) =>
            col(s"__best.__v$i").as(outName(f))
          }: _*)

      // J4: null-padding LEFT JOIN back onto the (possibly wider,
      // possibly duplicated) entity df.
      acc.join(cleaned, (joinKeys :+ entityTsCol).distinct, "left")
    }
  }
}
