package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registry-held table statistics (VERDICT r9 #6) — the ANALYZE
  * analogue for the feature-store registry: the per-join-key count
  * histogram of a registered source, persisted as a SMALL parquet next
  * to the registry document, so planning-time consumers
  * ([[graft.transform.Skew.joinSizeForecastFromCounts]], the q154
  * join-size forecast) read harvested statistics instead of rescanning
  * the table per decision. The histogram is key-domain-sized (one row
  * per distinct key), which for forecast-worthy keys is orders of
  * magnitude below the table — the whole point of paying the scan ONCE
  * at register/materialize time.
  *
  * Layout: `<registry dir>/stats/<name>__<keys>.parquet/` as an
  * [[ArtifactStore]] versioned parquet (columns `keyCols*, n`):
  * re-ANALYZE atomically repoints, matching the registry's
  * last-writer-wins semantics, and a concurrent `statsFor` reader can
  * never hit a half-replaced directory. Name/key components are
  * sanitized — a '/' in user metadata must not change the layout.
  */
object StatsStore {

  /** Deterministic stats location for (table, keys) beside the registry
    * document.
    */
  def statsPath(registryPath: String, table: String,
      keyCols: Seq[String]): String = {
    // keys join on an unprintable separator in the RAW name so the
    // disambiguating hash ([[ArtifactStore.artifactComponent]]) tells
    // ("a", "b") from ("a_b") even though both sanitize identically
    val name = ArtifactStore.artifactComponent(
      s"${table}__${keyCols.mkString("\u0000")}")
    s"${ArtifactStore.registryDir(registryPath)}/stats/$name.parquet"
  }

  /** The ANALYZE pass: exact per-key counts (one keyed shuffle with
    * map-side partials — the same aggregation the forecast would run,
    * now run once and persisted).
    */
  def analyze(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "analyze needs key columns")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
  }

  def write(counts: DataFrame, path: String): Unit =
    ArtifactStore.save(counts, path)

  /** Read a persisted histogram; None if never analyzed. Falls back to
    * a PLAIN parquet directory at `path` (the pre-[[ArtifactStore]]
    * layout: `df.write.parquet(path)` with no CURRENT pointer) so
    * registries analyzed by an older build stay readable — the next
    * [[write]] migrates them to the versioned layout in place (version
    * dirs and the pointer live inside `path` alongside the old part
    * files, and the pointer then takes precedence on every read).
    */
  def read(spark: SparkSession, path: String): Option[DataFrame] =
    ArtifactStore.load(spark, path).orElse {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val legacyParts =
        try {
          if (!fs.exists(p)) Array.empty[String]
          else fs.listStatus(p).map(_.getPath)
            .filter(_.getName.startsWith("part-")).map(_.toString)
        } catch { case _: java.io.FileNotFoundException =>
          Array.empty[String]
        }
      if (legacyParts.nonEmpty)
        // read ONLY the legacy part files: a half-migrated dir may also
        // hold v-*/ subdirs that plain spark.read.parquet would merge
        // in. Pass the EXPLICIT listed paths, not a "$path/part-*" glob
        // string — a path containing glob metacharacters (brackets,
        // braces; registry paths derive from user table names) would
        // mis-resolve or throw as a glob pattern. Spark still runs each
        // path through Hadoop's glob resolution, so metacharacters in
        // the listed paths are backslash-escaped to read as literals.
        Some(spark.read.parquet(legacyParts.toIndexedSeq
          .map(_.replaceAll("([*?\\[\\]{}\\\\])", "\\\\$1")): _*))
      else None
    }
}
