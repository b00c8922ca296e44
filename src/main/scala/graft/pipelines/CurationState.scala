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
  *      (`.compact-tmp-*` / `.purge-tmp-*` — dot-prefixed, so Spark's
  *      file listing never sees it) and let the committed `_SUCCESS`
  *      marker certify completeness;
  *   2. delete the partitions being replaced;
  *   3. rename the tmp into place (single-directory rename — atomic on
  *      HDFS, and on local FS a one-shot move of an already-complete
  *      directory).
  *
  * Crash recovery is RE-RUN THE SAME OP: a tmp without `_SUCCESS` is
  * rebuilt from the still-intact originals; a tmp WITH `_SUCCESS` is
  * trusted (the originals may be partially deleted — exactly why the
  * tmp is built before anything is removed) and the op skips straight
  * to steps 2–3. Ops must not run concurrently with arrivals or each
  * other on one stateDir (the same single-writer contract arrivals
  * already carry via monotone batchIds).
  */
object CurationState {

  /** The state tables [[TrainingDataPipeline.curateIncrement]] writes. */
  val CurationTables: Seq[String] =
    Seq("dd", "bands", "postings", "sizes", "ledger")

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
    * Re-running a crashed or repeated compaction is idempotent (see the
    * object doc); a compaction re-run AFTER later arrivals appended
    * `batch > upTo` partitions only touches `batch <= upTo`.
    */
  def compactState(spark: SparkSession, stateDir: String, upTo: Long,
      tables: Seq[String] = CurationTables): Unit = {
    for (t <- tables) {
      val table = new org.apache.hadoop.fs.Path(s"$stateDir/$t")
      val fs = hfs(spark, table)
      if (fs.exists(table)) {
        val tmp = new org.apache.hadoop.fs.Path(
          s"$stateDir/$t/.compact-tmp-$upTo")
        val toMerge = batchesOf(fs, table).filter(_ <= upTo)
        if (toMerge.nonEmpty || hasSuccess(fs, tmp)) {
          if (!hasSuccess(fs, tmp))
            // originals intact: build the replacement FIRST. The tmp is
            // hidden from Spark listings, so concurrent readers (none,
            // by contract) and a crashed re-run both still see only the
            // original partitions until the swap below.
            spark.read.parquet(table.toString)
              .filter(col("batch") <= upTo).drop("batch")
              .write.mode("overwrite").parquet(tmp.toString)
          batchesOf(fs, table).filter(_ <= upTo).foreach { n =>
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
    * opt-out id — ids are arrival-ranged (the q235 contract), so each
    * partition's (min, max) id range is probed with a column-pruned
    * two-value aggregate and an exact touched-set is derived by ONE
    * range join of the opt-out ids against the ≤ nBatches-row range
    * frame (driver-bounded); disjoint partitions are skipped with
    * their files untouched (spec-pinned via unchanged part-file
    * listings). A retention-cadence job, not a per-arrival one
    * (arrivals stay O(increment)); each touched-partition rewrite is a
    * distributed anti-join. Re-running with the same opt-out set is
    * idempotent; a crashed sweep is recovered by re-running it
    * (completed per-partition swaps are detected and finished, see
    * [[finishOrphanSwaps]]).
    */
  def purgeDocs(spark: SparkSession, stateDir: String, optOut: DataFrame,
      idCol: String, tables: Seq[String] = CurationTables): Unit = {
    // eager: optOut may itself read the state being swept (the
    // [[rejectedIds]] ledger read) — a lazy frame would re-list a
    // partition mid-rewrite (FAILED_READ_FILE on the deleted files).
    // Opt-out sets are id-scale, so the checkpoint is cheap.
    val ids = optOut.select(col(idCol)).distinct().localCheckpoint(true)
    for (t <- tables) {
      val table = new org.apache.hadoop.fs.Path(s"$stateDir/$t")
      val fs = hfs(spark, table)
      if (fs.exists(table)) {
        finishOrphanSwaps(fs, table)
        val batches = batchesOf(fs, table)
        val ranges = batches.flatMap { n =>
          val r = spark.read
            .parquet(new org.apache.hadoop.fs.Path(table, s"batch=$n").toString)
            .agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long"))
            .head
          if (r.isNullAt(0)) None // empty partition: nothing to purge
          else Some((n, r.getLong(0), r.getLong(1)))
        }
        val touched: Set[Long] =
          if (ranges.isEmpty) Set.empty
          else {
            import spark.implicits._
            val rdf = ranges.toDF("__batch", "__pmin", "__pmax")
            // bounded driver valve: ≤ one value per existing partition
            ids.join(broadcast(rdf),
                col(idCol) >= col("__pmin") && col(idCol) <= col("__pmax"))
              .select(col("__batch")).distinct()
              .collect().map(_.getLong(0)).toSet
          }
        for (n <- batches if touched(n)) {
          val part = new org.apache.hadoop.fs.Path(table, s"batch=$n")
          val tmp = new org.apache.hadoop.fs.Path(table, s".purge-tmp-$n")
          spark.read.parquet(part.toString)
            .join(ids, Seq(idCol), "left_anti")
            .write.mode("overwrite").parquet(tmp.toString)
          fs.delete(part, true)
          // see compactState: a false rename after the delete is data
          // loss unless surfaced — the complete tmp survives for the
          // re-run's finishOrphanSwaps
          if (!fs.rename(tmp, part))
            throw new java.io.IOException(
              s"purge swap rename failed for $tmp — re-run purgeDocs " +
                "to recover (tmp is complete)")
        }
      }
    }
  }

  /** Complete (or discard) per-partition purge swaps a crashed sweep
    * left behind: a `.purge-tmp-N` WITH `_SUCCESS` whose `batch=N` was
    * already deleted is the finished replacement — move it into place;
    * one whose `batch=N` still exists crashed before the delete — the
    * re-run rebuilds it, so drop it; one WITHOUT `_SUCCESS` is an
    * incomplete write — drop it (its original is intact).
    */
  private def finishOrphanSwaps(fs: org.apache.hadoop.fs.FileSystem,
      table: org.apache.hadoop.fs.Path): Unit = {
    fs.listStatus(table).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(".purge-tmp-")).foreach { tmp =>
        val n = tmp.getName.stripPrefix(".purge-tmp-")
        val part = new org.apache.hadoop.fs.Path(table, s"batch=$n")
        if (hasSuccess(fs, tmp) && !fs.exists(part)) {
          if (!fs.rename(tmp, part))
            throw new java.io.IOException(
              s"orphan-swap completion rename failed for $tmp")
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
