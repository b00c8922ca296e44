package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic parquet-artifact persistence on any Hadoop filesystem — the
  * shared mechanics under [[StatsStore]] (ANALYZE histograms) and
  * [[CodebookStore]] (trained ANN codebooks).
  *
  * A parquet artifact is a DIRECTORY, and directory rename-with-
  * overwrite is delete+rename on several real filesystems (local FS,
  * object stores) — a reader can catch the window and FAILED_READ_FILE
  * (the `FileContext.rename(OVERWRITE)` caveat, CLAUDE.md). So instead
  * of swapping directories this store versions them:
  *
  *   base/v-<uuid>/part-*.parquet   — immutable version directories
  *   base/CURRENT                   — one small pointer file naming the
  *                                    live version
  *
  * `save` writes a FRESH version dir, then repoints CURRENT via the
  * [[HadoopRegistry]] device (write `CURRENT.tmp`, FileContext
  * rename-OVERWRITE; readers retry the missing-but-tmp-present window).
  * Readers resolve CURRENT first and then read an immutable directory,
  * so a half-written artifact is never observable. After the pointer
  * moves, stale versions are garbage-collected with BOTH a count gate
  * ({new, previous} always survive) and an age gate (anything newer
  * than [[gcHorizonMs]] survives regardless of position) — a reader
  * that resolved CURRENT several swaps ago under a fast refresh cadence
  * keeps its directory until the horizon passes, not just for one swap.
  */
object ArtifactStore {

  /** Minimum age before a superseded version directory is deletable.
    * Bounds how long a straggling reader may hold a resolved version;
    * refresh cadences faster than this horizon never strand a reader.
    */
  val gcHorizonMs: Long = 10L * 60 * 1000

  /** Age beyond which a `CURRENT.tmp` with NO final pointer is treated
    * as a crashed writer's orphan rather than an in-flight swap (live
    * swaps hold the tmp for milliseconds).
    */
  val orphanTmpHorizonMs: Long = 60L * 1000

  /** Path-component sanitizer: artifact names are derived from user
    * metadata (table names, key columns) — a '/' or other special
    * character must not change the directory layout.
    */
  def sanitize(s: String): String = {
    val cleaned = s.map { c =>
      if (c.isLetterOrDigit || c == '.' || c == '-' || c == '_') c else '_'
    }
    if (cleaned.isEmpty) "_" else cleaned
  }

  /** Directory of the registry document — the one derivation every
    * registry-sited artifact family ([[CodebookStore]], [[StatsStore]])
    * shares.
    */
  private[core] def registryDir(registryPath: String): String = {
    val slash = registryPath.lastIndexOf('/')
    if (slash >= 0) registryPath.substring(0, slash) else "."
  }

  /** UNAMBIGUOUS path component for a user-derived artifact name:
    * [[sanitize]] is lossy ('a b' and 'a/b' both sanitize to 'a_b'), so
    * two distinct views/tables could share one artifact path and
    * silently serve each other's codebook, index state, or statistics.
    * An 8-hex md5 of the RAW name disambiguates while keeping the
    * readable sanitized prefix.
    */
  private[core] def artifactComponent(name: String): String =
    sanitize(name) + "-" + java.security.MessageDigest
      .getInstance("MD5").digest(name.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString

  private def hfs(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def currentPath(base: String) =
    new org.apache.hadoop.fs.Path(s"$base/CURRENT")
  private def currentTmpPath(base: String) =
    new org.apache.hadoop.fs.Path(s"$base/CURRENT.tmp")

  /** The filesystem's OWN current time, sampled by touching a hidden
    * probe file and reading its mtime. Judging a tmp's age against the
    * CLIENT's wall clock misclassifies a live in-flight swap as an
    * orphan when client and namenode clocks skew past the horizon
    * (remote HDFS); the probe's mtime and the tmp's mtime come from the
    * same clock, so their difference is skew-free. Hidden name (leading
    * dot) keeps it out of Spark's file listing; falls back to client
    * time if the probe can't be written (read-only mount — there a
    * crashed writer can't have left a tmp anyway).
    */
  private def fsNow(fs: org.apache.hadoop.fs.FileSystem,
      base: String): Long = {
    // unique name per probe: two readers racing the same orphan window
    // must not create/delete each other's probe (a shared name makes
    // the loser silently fall back to the client clock)
    val probe = new org.apache.hadoop.fs.Path(
      s"$base/.clock-probe-${java.util.UUID.randomUUID()}")
    try {
      val out = fs.create(probe, true)
      out.close()
      val t = fs.getFileStatus(probe).getModificationTime
      try fs.delete(probe, false)
      catch { case scala.util.control.NonFatal(_) => () }
      t
    } catch {
      case scala.util.control.NonFatal(_) => System.currentTimeMillis
    }
  }

  /** Read the CURRENT pointer; retries the transient rename window
    * (final missing, .tmp present) like [[HadoopRegistry]] — on a
    * filesystem where the pointer swap degrades to delete+rename a
    * reader must not conclude "no artifact" mid-swap.
    */
  private def readCurrent(spark: SparkSession, base: String): Option[String] = {
    val p = currentPath(base)
    val fs = hfs(spark, p)
    val deadline = System.nanoTime + 5L * 1000 * 1000 * 1000
    var sleepMs = 1L
    while (true) {
      if (fs.exists(p)) {
        try {
          val in = fs.open(p)
          try {
            val bytes = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, bytes, 4096, false)
            return Some(new String(bytes.toByteArray, "UTF-8").trim)
          } finally in.close()
        } catch {
          case _: java.io.FileNotFoundException => () // vanished mid-swap
        }
      } else {
        val tmp = currentTmpPath(base)
        val tmpSt =
          try Some(fs.getFileStatus(tmp))
          catch { case _: java.io.FileNotFoundException => None }
        tmpSt match {
          case None =>
            return None // neither pointer nor in-flight swap: no artifact
          case Some(st)
              if fsNow(fs, base) - st.getModificationTime >
                orphanTmpHorizonMs =>
            // a crashed writer left CURRENT.tmp behind with no final
            // pointer: a live swap completes in milliseconds, so a
            // minutes-old tmp with nothing to point at is an orphan —
            // report "no artifact" instead of spinning out the retry
            // deadline (the next save's fs.create(tmp, true) overwrites).
            // Age is judged against the FS's own clock ([[fsNow]]), not
            // the client's — client/namenode skew must not turn a live
            // swap into a false orphan
            return None
          case _ => () // fresh tmp: a writer is mid-swap, retry below
        }
      }
      if (System.nanoTime >= deadline)
        throw new java.io.IOException(
          s"artifact pointer at $p unreadable (writer stuck mid-swap?)")
      Thread.sleep(sleepMs)
      sleepMs = math.min(sleepMs * 2, 100L)
    }
    None // unreachable
  }

  /** Persist `df` as the new live artifact under `base`. */
  def save(df: DataFrame, base: String): Unit = {
    val spark = df.sparkSession
    val version = "v-" + java.util.UUID.randomUUID().toString
    df.write.mode("errorifexists").parquet(s"$base/$version")
    val prev = readCurrent(spark, base)
    // repoint: tmp file + FileContext rename-OVERWRITE (atomic on HDFS;
    // readCurrent's retry covers FSes where it is delete+rename)
    val cur = currentPath(base)
    val tmp = currentTmpPath(base)
    val fs = hfs(spark, cur)
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      fs.makeQualified(cur).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fs.makeQualified(tmp), fs.makeQualified(cur),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // GC: keep {new, previous} plus anything younger than the age
    // horizon; delete the rest (best effort). The cutoff derives from
    // the FILESYSTEM's clock ([[fsNow]]), like the orphan gate — a
    // client clock ahead of the namenode by more than the horizon
    // would otherwise age-qualify versions written seconds ago and
    // delete a straggling reader's resolved dir out from under it
    val keep = Set(version) ++ prev
    val cutoff = fsNow(fs, base) - gcHorizonMs
    try {
      fs.listStatus(new org.apache.hadoop.fs.Path(base)).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith("v-") && !keep.contains(n) &&
            st.getModificationTime < cutoff)
          fs.delete(st.getPath, true)
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Load the live artifact; None if never saved. */
  def load(spark: SparkSession, base: String): Option[DataFrame] =
    readCurrent(spark, base).map(v => spark.read.parquet(s"$base/$v"))
}

/** Registry-held trained ANN artifacts (VERDICT r10 #1) — the
  * [[StatsStore]] pattern for codebooks: at 100 TB, codebook training
  * (integer Lloyd's over a corpus sample,
  * [[graft.ops.Similarity.lloydCentroids]] /
  * [[graft.ops.Similarity.lloydPqCodebook]]) is an offline INDEX BUILD
  * paid once at register/materialize time, not a per-query cost. The
  * artifact is the deterministic integer-arithmetic codebook itself, so
  * store→load→serve is bitwise identical to train-in-query
  * (CodebookStoreSpec pins it), and hash-gated oracles are unchanged.
  *
  * Layout: `<registry dir>/codebooks/<sanitized name>/` as an
  * [[ArtifactStore]] versioned parquet.
  */
object CodebookStore {

  /** Deterministic codebook location beside the registry document
    * ([[ArtifactStore.artifactComponent]]: distinct view names can
    * never share a path, even when they sanitize identically).
    */
  def codebookPath(registryPath: String, name: String): String =
    s"${ArtifactStore.registryDir(registryPath)}/codebooks/" +
      ArtifactStore.artifactComponent(name)

  /** Deterministic MAINTAINED-INDEX state location beside the registry
    * — [[codebookPath]]'s sibling for the arrival-partitioned index
    * state (`assign/batch=N/cid=K` postings, `codes/batch=N`). NOT an
    * [[ArtifactStore]] versioned artifact: increments append,
    * maintenance rewrites partitions crash-safely
    * ([[graft.pipelines.CurationState]]'s swap protocol), and serving
    * reads version-filter on the codebook stamp instead of a CURRENT
    * pointer.
    */
  def indexStatePath(registryPath: String, name: String): String =
    s"${ArtifactStore.registryDir(registryPath)}/indexstate/" +
      ArtifactStore.artifactComponent(name)

  def save(codebook: DataFrame, base: String): Unit =
    ArtifactStore.save(codebook, base)

  def load(spark: SparkSession, base: String): Option[DataFrame] =
    ArtifactStore.load(spark, base)

  /** Serve the stored codebook, training-and-persisting on first use.
    * The returned frame always reads from the STORE (a bounded
    * parquet scan of a k·dim-row artifact), never from the training
    * lineage — re-invocations pay serving cost only.
    */
  def getOrTrain(spark: SparkSession, base: String)(
      train: => DataFrame): DataFrame =
    load(spark, base).getOrElse {
      save(train, base)
      load(spark, base).getOrElse(throw new IllegalStateException(
        s"codebook at $base unreadable immediately after save"))
    }
}
