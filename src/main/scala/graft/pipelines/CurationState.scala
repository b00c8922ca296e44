package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance operations over the arrival-partitioned curation state
  * ([[TrainingDataPipeline.curateIncrement]]'s
  * `stateDir/<table>/batch=N` layout): compaction (VERDICT r13 #2) and
  * retention / right-to-forget purges (VERDICT r13 #5).
  *
  * Both rewrite persisted partitions, and a partition overwrite on a
  * real filesystem is delete+write — never atomic. Every rewrite here
  * therefore goes through the same three-step swap:
  *
  *   1. write the replacement rows to a HIDDEN sibling dir
  *      (`.compact-tmp-*` / `.purge-tmp-*` / the index repair verbs'
  *      `.repair-tmp-*` — dot-prefixed, so Spark's file listing never
  *      sees it) and let the committed `_SUCCESS` marker certify
  *      completeness;
  *   2. delete the partitions being replaced;
  *   3. rename the tmp into place (single-directory rename — atomic on
  *      HDFS, and on local FS a one-shot move of an already-complete
  *      directory).
  *
  * Crash recovery: EVERY maintenance op first recovers ALL orphan
  * swaps — its own kind AND the other op's ([[recoverOrphanSwaps]]) —
  * before listing partitions. Recovery order matters and is pinned:
  * a tmp WITH `_SUCCESS` is the completed replacement (the originals
  * may be partially deleted — exactly why the tmp is built before
  * anything is removed), so it is swapped into place; a tmp WITHOUT
  * `_SUCCESS` is an incomplete write over intact originals and is
  * discarded. Without the cross-op recovery, op ordering after a crash
  * could lose or resurrect rows: a purge running over a crashed
  * compaction's visible partitions would let the later compaction
  * re-run trust its stale pre-purge tmp and resurrect forgotten ids
  * (a right-to-forget violation), and a crashed purge's completed tmp
  * would be invisible to a compaction's fold (ADVICE r14 medium;
  * CurationStateSpec pins both orderings).
  *
  * Ops must not run concurrently with arrivals or each other on one
  * stateDir (the same single-writer contract arrivals already carry
  * via monotone batchIds).
  */
object CurationState {

  /** The state tables [[TrainingDataPipeline.curateIncrement]] writes. */
  val CurationTables: Seq[String] =
    Seq("dd", "bands", "postings", "sizes", "ledger")

  /** The per-arrival id-range manifest table (VERDICT r14 #2): ONE row
    * per arrival, `(arrival, id_min, id_max, n_rows)` under
    * `ranges/batch=N`, written at append time from aggregates the
    * arrival was already materializing (an `observe` on the increment
    * scan — zero extra jobs). The row is a CONSERVATIVE id cover for
    * every state table of that arrival (each table's ids are a subset
    * of the arrival's), so by-id maintenance derives its
    * touched-partition set from nBatches metadata rows instead of
    * probing every partition with a Spark job ([[purgeDocs]]); purges
    * never narrow a recorded range (conservative stays conservative).
    *
    * The arrival id is a ROW COLUMN, not just the partition value:
    * compaction folds a prefix of arrivals into one `batch=upTo`
    * partition (of the data tables, of this manifest, or of both —
    * crash recovery can complete one table's fold before another's),
    * so a consumer maps an arrival to the DATA partition that holds it
    * by the prefix-fold rule `min{B ∈ partitions : B >= arrival}` —
    * correct whether or not the manifest's own partitions were folded
    * in the same sweep. Arrivals written before the manifest existed
    * (pre-r15 state) simply have no row; their partitions keep the
    * probe path. A state mixing pre-manifest arrivals WITH manifested
    * ones must not be compacted before backfilling rows (the folded
    * partition would be half-covered) — [[compactState]] CHECKS this
    * and refuses the fold.
    */
  val RangesTable: String = "ranges"

  private def hfs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def hasSuccess(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))

  /** List a table's `batch=N` partition values, ascending. */
  private def batchesOf(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path): Seq[Long] =
    fs.listStatus(table).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).sorted

  /** Partition columns NESTED below a table's `batch=N` level (the
    * assign state's `batch=N/cid=K` cell layout,
    * [[graft.ops.Similarity.assignIncrement]]): the first non-empty
    * batch partition's chain of `col=value` directory levels. Every
    * rewrite here (compaction fold, purge partition rewrite) must
    * re-emit these via `partitionBy`, or the rewritten partition would
    * flatten the layout — mixing flat and nested partitions under one
    * table poisons partition inference for every later read.
    */
  private def nestedPartitionCols(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path,
      batches: Seq[Long]): Seq[String] = {
    def levels(dir: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
        .map(_.getPath)
        .find(_.getName.contains("=")) match {
          case Some(p) => p.getName.split("=")(0) +: levels(p)
          case None => Nil
        }
    batches.iterator
      .map(n => levels(new org.apache.hadoop.fs.Path(table, s"batch=$n")))
      .find(_.nonEmpty).getOrElse(Nil)
  }

  /** Append one arrival's id-range manifest row (`batch=<batchId>`,
    * overwrite-idempotent like every other state write). `idMin`/`idMax`
    * are None for an EMPTY arrival — the row is still written so the
    * batch counts as manifest-covered (an empty partition can never
    * hold a purgeable id; null bounds match no range probe).
    *
    * `idCol` records WHICH id column the cover describes: a range is a
    * fact about one id SPACE, and a purge keyed on a different column
    * (the index tables' vec ids vs the curation tables' doc ids in a
    * shared state root) must not trust it — [[purgeDocs]] consults only
    * rows recorded under its own id column and probes everything else.
    * Without the field, a doc-id cover numerically disjoint from the
    * vec-id space would classify every index partition untouched and
    * silently no-op a compliance sweep.
    */
  def writeRange(spark: SparkSession, stateDir: String, batchId: Long,
      idMin: Option[Long], idMax: Option[Long], nRows: Long,
      idCol: String): Unit = {
    require(!idCol.contains(","), s"idCol '$idCol' breaks the line format")
    val dir = new org.apache.hadoop.fs.Path(
      s"$stateDir/$RangesTable/batch=$batchId")
    val fs = hfs(spark, dir)
    fs.mkdirs(dir)
    writeLines(fs, dir, Seq(
      s"$batchId,${idMin.getOrElse("")},${idMax.getOrElse("")},$nRows," +
        idCol))
  }

  /** One parsed manifest row: (arrival, id_min, id_max, n_rows,
    * recorded id column). The id column is None for rows written before
    * the field existed — consumers treat those as matching (they
    * predate multi-id-space state roots).
    */
  type RangeRow = (Long, Option[Long], Option[Long], Long, Option[String])

  /** Driver-side read of the whole [[RangesTable]] manifest — the
    * manifest is metadata (≤ one row per arrival) and every consumer
    * collects it, so it is stored as plain text lines and read with
    * filesystem calls only: NO Spark job on either side of the
    * manifest (the point of VERDICT r14 #2 — a sweep's touched set
    * from footer-scale metadata, not per-partition jobs). Orphan swaps
    * are recovered first, like every other state read path.
    */
  def readRanges(spark: SparkSession, stateDir: String): Seq[RangeRow] = {
    val table = new org.apache.hadoop.fs.Path(s"$stateDir/$RangesTable")
    val fs = hfs(spark, table)
    if (!fs.exists(table)) Seq.empty
    else {
      recoverOrphanSwaps(spark, fs, table)
      batchesOf(fs, table).flatMap { n =>
        val dir = new org.apache.hadoop.fs.Path(table, s"batch=$n")
        readLines(fs, dir).map { line =>
          val f = line.split(",", -1)
          (f(0).toLong,
            if (f(1).isEmpty) None else Some(f(1).toLong),
            if (f(2).isEmpty) None else Some(f(2).toLong),
            f(3).toLong,
            f.lift(4).filter(_.nonEmpty))
        }
      }.sortBy(_._1)
    }
  }

  /** Write manifest lines to `dir/ranges.csv` plus the `_SUCCESS`
    * marker the swap/recovery protocol keys on. Overwrite-idempotent.
    */
  private def writeLines(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, lines: Seq[String]): Unit = {
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "ranges.csv"), true)
    try out.write((lines.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true).close()
  }

  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[String] = {
    val f = new org.apache.hadoop.fs.Path(dir, "ranges.csv")
    if (!fs.exists(f)) Seq.empty
    else {
      val in = fs.open(f)
      try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toList
      finally in.close()
    }
  }

  /** Merge every `batch <= upTo` partition of each state table into the
    * single partition `batch=upTo` (VERDICT r13 #2). The arrival store
    * appends one `batch=N` directory per arrival forever — at daily
    * cadence that is thousands of small partitions per table within a
    * few years, and partition listing plus per-file open costs grow
    * with arrival count even though reads prune. Compaction folds the
    * old tail into one partition while PRESERVING both pruning
    * contracts by construction:
    *
    *   - `batch < b` (fingerprint history, band index): every merged
    *     row keeps living at partition value `upTo`, and arrivals after
    *     a compaction have `batchId > upTo` (the monotone-batchId
    *     contract), so `upTo < b` still selects it;
    *   - `batch IN (candidate batches)` (postings/sizes verification
    *     reads): candidate batches are read off the band index's
    *     `batch` column, which after compaction names `upTo` for every
    *     merged row — the candidate set and the postings partitions
    *     move together.
    *
    * The merged rows are byte-identical to the originals (a pure
    * re-partitioning, no re-aggregation), so every downstream read sees
    * the same multiset of rows — q250 hash-gates exactly that: a
    * curation run with a mid-stream compaction equals the one-shot
    * recompute. Histogram state ([[TrainingDataPipeline.driftIncrement]]
    * `lenhist`, keyed monitors) compacts with the same call: its reads
    * re-aggregate per bucket, so multiple per-batch rows folding into
    * one partition are summed identically.
    *
    * The [[RangesTable]] manifest, when present, is ALWAYS folded
    * alongside whatever `tables` were named (same `upTo`): the manifest
    * partition must keep tracking where its arrivals' data rows live,
    * or the purge prune would consult a stale cover. Folding preserves
    * one row per original arrival, each with its own bounds — the
    * folded partition's cover is their union, read row-by-row.
    *
    * Re-running a crashed or repeated compaction is idempotent (see the
    * object doc); a compaction re-run AFTER later arrivals appended
    * `batch > upTo` partitions only touches `batch <= upTo`.
    *
    * `keepVersions` (opt-in, VERDICT r16 #3) is the DEAD-VERSION GC:
    * after a retrain repair ([[graft.ops.Similarity.reassignStale]] /
    * `reencodeStale`) rewrites every stale partition, rows stamped with
    * superseded `codebook_version`s can still survive (a crash between
    * repair and re-run, or an operator purging by policy instead of
    * repairing) and are filter-pruned on every serve forever. With
    * `keepVersions = Some(set)`, tables that CARRY a
    * `codebook_version` column drop rows of other versions during the
    * fold — the only compaction mode that is not a pure
    * re-partitioning, which is why it is opt-in and never the default.
    * Tables without the column fold unchanged. GC only reaches rows in
    * `batch <= upTo` (the fold's scope); run it after repairs with
    * `upTo` = the newest batch to sweep the whole state. The swap
    * protocol (hidden tmp + `_SUCCESS` + rename, cross-op recovery)
    * applies unchanged, so a crashed GC is recovered like any
    * compaction.
    */
  def compactState(spark: SparkSession, stateDir: String, upTo: Long,
      tables: Seq[String] = CurationTables,
      keepVersions: Option[Set[String]] = None,
      idCol: Option[String] = None): Unit = {
    // the mixing contract, CHECKED (previously documentation-only): when
    // a manifest exists, every partition being folded must be covered by
    // some manifest arrival (prefix-fold rule). Folding an unmanifested
    // arrival together with manifested ones would create a HALF-COVERED
    // partition: the purge prune maps the manifested arrivals to it,
    // classifies it handled, and the unmanifested rows inside are never
    // probed — a silently incomplete right-to-forget sweep. The remedy
    // is backfilling writeRange rows for the pre-manifest arrivals
    // before the first fold.
    //
    // Id-space discipline (ADVICE r17): a manifest row is a fact about
    // ONE id space, and [[purgeDocs]] consults only rows recorded under
    // its own id column — so the check must apply the SAME filter.
    // `idCol = Some(c)` restricts the cover to rows recorded under `c`
    // (legacy rows without the field match, as in the purge); in a
    // shared state root (curation doc-id tables beside index vec-id
    // tables, the q250 layout) that closes both failure modes: a
    // different-space row can no longer mark a folded partition
    // "covered" that its own-space purge will probe-skip, and
    // compacting index tables whose increments never write manifest
    // rows no longer spuriously throws against the doc-space cover
    // (no same-space rows -> check skipped; those partitions fall to
    // the purge's probe path). `idCol = None` means a single-id-space
    // root: every manifest row applies, the original behavior.
    val manifestedArrivals = readRanges(spark, stateDir)
      .filter(r => idCol.forall(c => r._5.forall(_ == c)))
      .map(_._1)
    // per-TABLE folds are independent (disjoint directories, each with
    // its own swap) — overlap them so the next table's fold back-fills
    // the current one's scheduling tail (guide §2.6; at increment scale
    // the per-fold fixed cost dominates, and the sequential loop paid
    // it once per table end-to-end)
    graft.util.Par.run(tables.filter(_ != RangesTable).map(t => () => {
      val table = new org.apache.hadoop.fs.Path(s"$stateDir/$t")
      val fs = hfs(spark, table)
      if (fs.exists(table)) {
        recoverOrphanSwaps(spark, fs, table)
        val all = batchesOf(fs, table)
        val toMerge = all.filter(_ <= upTo)
        if (toMerge.nonEmpty && manifestedArrivals.nonEmpty) {
          val covered = manifestedArrivals.flatMap(a => all.find(_ >= a)).toSet
          val uncovered = toMerge.filterNot(covered)
          if (uncovered.nonEmpty) throw new IllegalStateException(
            s"compactState($t): partitions batch=" +
              s"${uncovered.mkString(",")} are covered by no manifest " +
              "arrival — folding them with manifested ones would leave " +
              "a half-covered partition the purge prune silently " +
              "skips. Backfill writeRange rows for the pre-manifest " +
              "arrivals first")
        }
        if (toMerge.nonEmpty) {
          val sub = nestedPartitionCols(fs, table, all)
          val tmp = new org.apache.hadoop.fs.Path(
            s"$stateDir/$t/.compact-tmp-$upTo")
          // originals intact (recovery above cleared any orphan tmp):
          // build the replacement FIRST. The tmp is hidden from Spark
          // listings, so a crashed re-run still sees only the original
          // partitions until the swap below. Nested partition levels
          // (the assign state's cid=K cells) are re-emitted as written.
          val folded0 = spark.read.parquet(table.toString)
            .filter(col("batch") <= upTo).drop("batch")
          val folded = keepVersions match {
            case Some(keep) if folded0.columns.contains("codebook_version") =>
              val kept = folded0.filter(
                col("codebook_version").isin(keep.toSeq.sorted: _*))
              // a GC that empties the fold would swap in a footerless
              // dir (a zero-row partitioned write emits only _SUCCESS)
              // and poison every later read of the table — refuse
              // LOUDLY before anything is written or deleted; an
              // operator whose whole state is dead wants to delete the
              // table, not compact it
              if (kept.isEmpty) throw new IllegalArgumentException(
                s"compactState($t, keepVersions=$keep): no row in " +
                  s"batch <= $upTo survives the version GC — refusing " +
                  "to swap in an empty (unreadable) partition; delete " +
                  "the table instead, or keep at least one live version")
              kept
            case _ => folded0
          }
          folded
            .write.mode("overwrite").partitionBy(sub: _*)
            .parquet(tmp.toString)
          toMerge.foreach { n =>
            fs.delete(new org.apache.hadoop.fs.Path(table, s"batch=$n"), true)
          }
          // a silently-false rename here would lose the folded rows
          // (originals are already gone) — fail loudly; the complete
          // tmp is still on disk and a re-run recovers
          if (!fs.rename(tmp,
              new org.apache.hadoop.fs.Path(table, s"batch=$upTo")))
            throw new java.io.IOException(
              s"compaction swap rename failed for $tmp — re-run " +
                "compactState($upTo) to recover (tmp is complete)")
        }
      }
    }))
    compactRanges(spark, stateDir, upTo)
  }

  /** Fold the manifest's `batch <= upTo` partitions into one — the
    * [[compactState]] partition-count hygiene applied to the
    * metadata-only [[RangesTable]]: pure driver-side line
    * concatenation under the same hidden-tmp + `_SUCCESS` + rename
    * swap (and the same [[recoverOrphanSwaps]] coverage), preserving
    * one line per original arrival. Consumers never depend on WHERE a
    * manifest row lives (the arrival id is in the row), so this fold
    * is free to lag or lead the data tables' folds.
    */
  private def compactRanges(spark: SparkSession, stateDir: String,
      upTo: Long): Unit = {
    val table = new org.apache.hadoop.fs.Path(s"$stateDir/$RangesTable")
    val fs = hfs(spark, table)
    if (fs.exists(table)) {
      recoverOrphanSwaps(spark, fs, table)
      val toMerge = batchesOf(fs, table).filter(_ <= upTo)
      if (toMerge.nonEmpty) {
        val lines = toMerge.flatMap(n =>
          readLines(fs, new org.apache.hadoop.fs.Path(table, s"batch=$n")))
        val tmp = new org.apache.hadoop.fs.Path(
          s"$stateDir/$RangesTable/.compact-tmp-$upTo")
        fs.delete(tmp, true)
        fs.mkdirs(tmp)
        writeLines(fs, tmp, lines)
        toMerge.foreach { n =>
          fs.delete(new org.apache.hadoop.fs.Path(table, s"batch=$n"), true)
        }
        if (!fs.rename(tmp,
            new org.apache.hadoop.fs.Path(table, s"batch=$upTo")))
          throw new java.io.IOException(
            s"manifest compaction swap rename failed for $tmp — re-run " +
              "compactState to recover (tmp is complete)")
      }
    }
  }

  /** Right-to-forget / retention sweep (VERDICT r13 #5): delete every
    * row whose `idCol` is in `optOut` from every state table — ledger
    * (the drop-reason audit rows), dd (content fingerprints), bands,
    * postings, sizes (content-derived shingles). After the sweep the
    * purged ids appear in NO state read (spec-pinned), so a later
    * arrival that re-submits the forgotten content is judged fresh: the
    * forgotten doc no longer suppresses anything — that asymmetry is
    * the semantic content of forgetting, and it is why the q250 gate
    * purges only docs that provably influence no future decision
    * (gate/exact-dup rejects: their only state rows are ledger entries
    * and `kept = 0` dd rows that every history read already filters
    * out), proving decisions for unaffected docs are bit-identical.
    *
    * Cost: the sweep REWRITES only the partitions that can hold an
    * opt-out id — ids are arrival-ranged (the q235 contract), so the
    * touched-partition set comes from the [[RangesTable]] manifest
    * where present (ONE bounded range join of the opt-out ids against
    * the ≤ nBatches-row manifest, shared by every table — zero
    * per-partition jobs), falling back to a column-pruned per-partition
    * (min, max) probe only for partitions written before the manifest
    * existed. The probe FAILS FAST when `idCol` does not cast to long
    * on a non-empty partition (ADVICE r14 low: a non-numeric or
    * all-null id column would otherwise classify every partition
    * disjoint and silently no-op a compliance sweep). Disjoint
    * partitions are skipped with their files untouched (spec-pinned via
    * unchanged part-file listings). A retention-cadence job, not a
    * per-arrival one (arrivals stay O(increment)); each
    * touched-partition rewrite is a distributed anti-join. Re-running
    * with the same opt-out set is idempotent; a crashed sweep is
    * recovered by re-running it (completed swaps of EITHER op are
    * detected and finished first, see [[recoverOrphanSwaps]]).
    */
  def purgeDocs(spark: SparkSession, stateDir: String, optOut: DataFrame,
      idCol: String, tables: Seq[String] = CurationTables): Unit = {
    // eager: optOut may itself read the state being swept (the
    // [[rejectedIds]] ledger read) — a lazy frame would re-list a
    // partition mid-rewrite (FAILED_READ_FILE on the deleted files).
    // Opt-out sets are id-scale, so the checkpoint is cheap.
    val ids = optOut.select(col(idCol)).distinct().localCheckpoint(true)
    // manifest-driven prune, computed ONCE for all tables: which
    // ARRIVALS' id covers intersect the opt-out set. The manifest is
    // driver-side metadata ([[readRanges]] — filesystem calls only, no
    // Spark job, orphan swaps recovered inside), so the only job here
    // is ONE bounded broadcast range join of the opt-out ids against
    // the ≤ nBatches-row cover. Bounded driver valve — ≤ one arrival
    // value per manifest row.
    // a manifest row is a fact about ONE id space: only rows recorded
    // under THIS purge's id column may prune (legacy rows without the
    // field predate multi-id-space roots and are treated as matching).
    // Rows recorded under a different column (the curation tables' doc
    // ids vs the index tables' vec ids in a shared root) are ignored
    // entirely, so their partitions fall to the probe path instead of
    // being silently classified untouched.
    val manRows = readRanges(spark, stateDir)
      .filter(_._5.forall(_ == idCol))
    val (manifestArrivals: Set[Long], touchedArrivals: Set[Long]) =
      if (manRows.isEmpty) (Set.empty[Long], Set.empty[Long])
      else {
        import spark.implicits._
        // null bounds (empty arrival) satisfy no range predicate — an
        // empty partition can never hold a purgeable id
        val man = manRows.map { case (a, mn, mx, _, _) => (a, mn, mx) }
          .toDF("__arrival", "__pmin", "__pmax")
        val touched = ids.join(broadcast(man),
            col(idCol) >= col("__pmin") && col(idCol) <= col("__pmax"))
          .select(col("__arrival")).distinct()
          .collect().map(_.getLong(0)).toSet
        (manRows.map(_._1).toSet, touched)
      }
    // per-TABLE sweeps are independent (disjoint directories; the
    // manifest prune above was computed once, read-only here) — overlap
    // them like the compaction folds (guide §2.6). Probe jobs and
    // touched-partition rewrites WITHIN a table keep their order.
    graft.util.Par.run(tables.map(t => () => {
      val table = new org.apache.hadoop.fs.Path(s"$stateDir/$t")
      val fs = hfs(spark, table)
      if (fs.exists(table)) {
        recoverOrphanSwaps(spark, fs, table)
        val batches = batchesOf(fs, table)
        // an arrival's rows live in the LOWEST partition value >= its
        // id (the prefix-fold rule — see [[RangesTable]]); partitions
        // no manifest arrival maps to keep the probe path
        def partitionOf(arrival: Long): Option[Long] =
          batches.find(_ >= arrival)
        val mappedParts = manifestArrivals.flatMap(partitionOf)
        val manifestTouched = touchedArrivals.flatMap(partitionOf)
        // pre-manifest partitions only: probe each for its id range
        val ranges = batches.filterNot(mappedParts).flatMap { n =>
          val r = spark.read
            .parquet(new org.apache.hadoop.fs.Path(table, s"batch=$n").toString)
            // try_cast: under ANSI mode a plain cast THROWS on a
            // non-numeric id mid-probe; the null-check below turns that
            // into the intended diagnostic instead
            .agg(count(lit(1)), expr(s"try_cast(min(`$idCol`) as long)"),
              expr(s"try_cast(max(`$idCol`) as long)"))
            .head
          if (r.getLong(0) == 0L) None // empty partition: nothing to purge
          else if (r.isNullAt(1))
            // ADVICE r14 low: a null min over a NON-empty partition means
            // idCol is non-numeric or all-null — range pruning is
            // impossible and treating it as disjoint would silently
            // no-op a right-to-forget sweep. Fail loudly instead.
            throw new IllegalArgumentException(
              s"purgeDocs: $t/batch=$n has ${r.getLong(0)} rows but " +
                s"min($idCol) does not cast to a long — non-numeric or " +
                "all-null ids cannot be range-pruned; fix the id column " +
                "or purge with an exact rewrite")
          else Some((n, r.getLong(1), r.getLong(2)))
        }
        val probedTouched: Set[Long] =
          if (ranges.isEmpty) Set.empty
          else {
            import spark.implicits._
            val rdf = ranges.toDF("__batch", "__pmin", "__pmax")
            // bounded driver valve: ≤ one value per probed partition
            ids.join(broadcast(rdf),
                col(idCol) >= col("__pmin") && col(idCol) <= col("__pmax"))
              .select(col("__batch")).distinct()
              .collect().map(_.getLong(0)).toSet
          }
        val touched = manifestTouched ++ probedTouched
        val sub = nestedPartitionCols(fs, table, batches)
        for (n <- batches if touched(n)) {
          val part = new org.apache.hadoop.fs.Path(table, s"batch=$n")
          val tmp = new org.apache.hadoop.fs.Path(table, s".purge-tmp-$n")
          spark.read.parquet(part.toString)
            .join(ids, Seq(idCol), "left_anti")
            .write.mode("overwrite").partitionBy(sub: _*)
            .parquet(tmp.toString)
          fs.delete(part, true)
          // see compactState: a false rename after the delete is data
          // loss unless surfaced — the complete tmp survives for the
          // re-run's recoverOrphanSwaps
          if (!fs.rename(tmp, part))
            throw new java.io.IOException(
              s"purge swap rename failed for $tmp — re-run purgeDocs " +
                "to recover (tmp is complete)")
        }
      }
    }))
    ()
  }

  /** Complete (or discard) EVERY orphan swap a crashed maintenance op
    * left behind on one table — `.purge-tmp-*`, `.repair-tmp-*` (the
    * index repair verbs [[graft.ops.Similarity.reassignStale]] /
    * `reencodeStale` share this protocol), and `.compact-tmp-*`,
    * regardless of which op is about to run (the cross-op recovery
    * contract from the object doc):
    *
    *   - `.purge-tmp-N` / `.repair-tmp-N` WITH `_SUCCESS` whose
    *     `batch=N` was already deleted is the finished replacement —
    *     move it into place; one whose `batch=N` still exists crashed
    *     before the delete — the re-run rebuilds it, so drop it; one
    *     WITHOUT `_SUCCESS` is an incomplete write — drop it (its
    *     original is intact).
    *   - `.compact-tmp-U` WITH `_SUCCESS` is a complete fold of every
    *     `batch <= U` partition, some of which may already be deleted —
    *     finishing it (delete the rest, rename to `batch=U`) is the
    *     ONLY row-preserving option, and it must happen before any
    *     other op lists partitions (a purge over the half-deleted
    *     originals plus a later compaction re-run trusting the stale
    *     tmp would resurrect purged rows). One WITHOUT `_SUCCESS` is an
    *     incomplete write over intact originals — drop it.
    *
    * Single-partition tmps (purge/repair) are recovered FIRST: a
    * completed swap restores its partition before a completed
    * compaction fold counts partitions to delete. (By the
    * single-writer contract at most one crashed op can exist per
    * table; the ordering makes recovery correct even if that contract
    * was violated.)
    */
  private[graft] def recoverOrphanSwaps(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path): Unit = {
    val tmps = fs.listStatus(table).toSeq.map(_.getPath)
    tmps.filter(p => p.getName.startsWith(".purge-tmp-") ||
        p.getName.startsWith(".repair-tmp-")).foreach { tmp =>
      val n = tmp.getName.replaceFirst("^\\.(purge|repair)-tmp-", "")
      val part = new org.apache.hadoop.fs.Path(table, s"batch=$n")
      if (hasSuccess(fs, tmp) && !fs.exists(part)) {
        if (!fs.rename(tmp, part))
          throw new java.io.IOException(
            s"orphan-swap completion rename failed for $tmp")
      } else fs.delete(tmp, true)
    }
    tmps.filter(_.getName.startsWith(".compact-tmp-")).foreach { tmp =>
      val u = tmp.getName.stripPrefix(".compact-tmp-").toLong
      if (hasSuccess(fs, tmp)) {
        batchesOf(fs, table).filter(_ <= u).foreach { n =>
          fs.delete(new org.apache.hadoop.fs.Path(table, s"batch=$n"), true)
        }
        if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(table, s"batch=$u")))
          throw new java.io.IOException(
            s"orphan-compaction completion rename failed for $tmp")
      } else fs.delete(tmp, true)
    }
  }

  /** Ids of docs rejected OUTRIGHT (gate / exact-dup) in batches
    * `<= upTo`, read off the persisted ledger — the data-minimization
    * purge set: content we decided not to train on has no reason to
    * keep even its fingerprints, and by construction (see [[purgeDocs]])
    * deleting it changes no future curation decision, which is what
    * lets q250 keep the one-shot oracle unchanged.
    */
  def rejectedIds(spark: SparkSession, stateDir: String, idCol: String,
      upTo: Long): DataFrame =
    spark.read.parquet(s"$stateDir/ledger")
      .filter(col("batch") <= upTo &&
        col("reason").isin("gate", "exact_dup"))
      .select(col(idCol))
}
