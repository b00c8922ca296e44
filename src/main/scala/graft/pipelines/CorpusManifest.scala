package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus snapshot manifest — the PUBLISH/VERIFY integrity step a
  * training-data pipeline runs when a curated snapshot is handed to a
  * trainer: per key (source, shard, …) the row count, exact char mass,
  * id range, and an ORDER-INDEPENDENT exact content digest. A reader
  * can re-derive the manifest from the data alone and diff — partial
  * writes, dropped files, duplicated files, or tampered rows all
  * surface as a per-key mismatch instead of a silent training-set
  * change.
  *
  * Digest design: per row `conv(substring(md5(text), 1, 15), 16, 10)`
  * (60 bits of the md5, the CLAUDE.md hex→integer device), summed as
  * DECIMAL(38,0). The sum is order- and partition-independent (integer
  * addition is associative-commutative and decimal(38,0) cannot
  * overflow before ~10²⁰ rows), exact in both engines (Spark decimal ↔
  * DuckDB HUGEINT), and unlike an XOR fold it does NOT cancel
  * duplicate rows — a double-counted file changes the digest. Rendered
  * as a string so the cross-engine hash gate compares digits, not
  * engine decimal encodings.
  *
  * Scale: one map-side-combinable keyed aggregation per manifest —
  * O(corpus) scan, key-domain output. Verify is the same scan plus a
  * broadcast join of two manifest frames.
  */
object CorpusManifest {

  /** Derive the manifest frame: one row per key. */
  def manifest(df: DataFrame, keyCols: Seq[String], idCol: String,
      textCol: String): DataFrame = {
    require(keyCols.nonEmpty, "manifest needs at least one key column")
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(expr(s"cast(length($textCol) as bigint)")).as("sum_chars"),
        min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"),
        sum(expr(s"cast(conv(substring(md5($textCol), 1, 15), 16, 10)" +
          " as decimal(38,0))")).cast("string").as("content_digest"))
  }

  /** Publish: write the corpus AND its manifest side by side. The
    * manifest goes last — a crashed publish leaves data without a
    * manifest (visibly unpublished), never a manifest describing data
    * that is not fully there.
    */
  def write(df: DataFrame, dir: String, keyCols: Seq[String], idCol: String,
      textCol: String): Unit = {
    df.write.mode("overwrite").parquet(s"$dir/data")
    val spark = df.sparkSession
    manifest(spark.read.parquet(s"$dir/data"), keyCols, idCol, textCol)
      .write.mode("overwrite").parquet(s"$dir/manifest")
  }

  /** Verify a published snapshot: re-derive the manifest from the data
    * and diff against the stored one, per key. `ok = 1` only when every
    * field matches; keys present on one side only surface with the
    * other side's fields NULL (a dropped source is a mismatch, not an
    * absence). The stored manifest is key-domain-sized — it broadcasts.
    */
  def verify(spark: SparkSession, dir: String, keyCols: Seq[String],
      idCol: String, textCol: String): DataFrame = {
    val actual = manifest(spark.read.parquet(s"$dir/data"), keyCols,
      idCol, textCol)
    val stored = spark.read.parquet(s"$dir/manifest")
    val fields = Seq("n_docs", "sum_chars", "min_id", "max_id",
      "content_digest")
    val a = fields.foldLeft(actual) { (d, f) => d.withColumnRenamed(f, s"${f}_actual") }
    val s = fields.foldLeft(stored) { (d, f) => d.withColumnRenamed(f, s"${f}_stored") }
    val matched = fields.map(f => col(s"${f}_actual") <=> col(s"${f}_stored"))
      .reduce(_ && _)
    a.join(broadcast(s), keyCols, "full_outer")
      .withColumn("ok", matched.cast("long"))
  }
}
