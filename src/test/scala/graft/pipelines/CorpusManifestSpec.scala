package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Publish/verify integrity lifecycle: a clean roundtrip verifies, and
  * every corruption mode a filesystem can inflict on a snapshot —
  * appended rogue file, deleted data file, in-place row tamper — trips
  * the per-key diff.
  */
class CorpusManifestSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, "alpha beta gamma", "web"),
    (2L, "delta epsilon", "web"),
    (3L, "zeta eta theta iota", "pdf"),
    (4L, "kappa lambda", "pdf"),
    (5L, "mu nu xi", "txt")
  ).toDF("doc_id", "text", "source")

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(); ()
  }

  test("manifest fields are exact and order-independent") {
    val m1 = CorpusManifest.manifest(fixture, Seq("source"), "doc_id", "text")
    val m2 = CorpusManifest.manifest(
      fixture.orderBy(col("doc_id").desc).repartition(7),
      Seq("source"), "doc_id", "text")
    val k = (r: org.apache.spark.sql.Row) => r.getString(0)
    assert(m1.collect().sortBy(k).map(_.toSeq).toSeq
      === m2.collect().sortBy(k).map(_.toSeq).toSeq,
      "manifest must not depend on row order or partitioning")
    val web = m1.filter(col("source") === "web").head
    assert(web.getLong(web.fieldIndex("n_docs")) === 2L)
    assert(web.getLong(web.fieldIndex("sum_chars")) ===
      ("alpha beta gamma".length + "delta epsilon".length).toLong)
    assert(web.getLong(web.fieldIndex("min_id")) === 1L &&
      web.getLong(web.fieldIndex("max_id")) === 2L)
    // a duplicated row SHIFTS the digest (the anti-XOR property)
    val dup = CorpusManifest.manifest(
      fixture.unionByName(fixture.filter(col("doc_id") === 1L)),
      Seq("source"), "doc_id", "text")
      .filter(col("source") === "web").head
    assert(dup.getString(dup.fieldIndex("content_digest"))
      !== web.getString(web.fieldIndex("content_digest")),
      "a double-counted row must change the digest")
  }

  test("mergeManifests: fold of disjoint-slice manifests == one-shot manifest") {
    // slices split web across both sides, keep pdf on one side only,
    // and txt on the other — exercising add-merge AND one-sided keys
    val m1 = CorpusManifest.manifest(
      fixture.filter(col("doc_id") <= 2), Seq("source"), "doc_id", "text")
    val m2 = CorpusManifest.manifest(
      fixture.filter(col("doc_id") > 2), Seq("source"), "doc_id", "text")
    val k = (r: org.apache.spark.sql.Row) => r.getString(0)
    val merged = CorpusManifest.mergeManifests(m1, m2, Seq("source"))
      .collect().sortBy(k).map(_.toSeq).toSeq
    val whole = CorpusManifest.manifest(fixture, Seq("source"), "doc_id", "text")
      .collect().sortBy(k).map(_.toSeq).toSeq
    assert(merged === whole,
      "merging per-slice manifests must equal the one-shot manifest")
  }

  test("publish/verify roundtrip, then every tamper mode trips its key") {
    val root = java.nio.file.Files.createTempDirectory("manifest-").toString
    try {
      CorpusManifest.write(fixture, root, Seq("source"), "doc_id", "text")
      def okMap() = CorpusManifest
        .verify(spark, root, Seq("source"), "doc_id", "text")
        .select(col("source"), col("ok"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(okMap() === Map("web" -> 1L, "pdf" -> 1L, "txt" -> 1L))
      // tamper 1: a rogue file appended INSIDE web's partition dir
      // (double-counts a web row)
      fixture.filter(col("doc_id") === 1L).drop("source")
        .write.mode("append").parquet(s"$root/data/source=web")
      val t1 = okMap()
      assert(t1("web") === 0L, s"appended rows must trip web: $t1")
      assert(t1("pdf") === 1L && t1("txt") === 1L,
        s"untouched keys must stay ok: $t1")
    } finally rm(new java.io.File(root))
  }

  test("sampled verify: partition-pruned spot check catches a sampled-key tamper") {
    val root = java.nio.file.Files.createTempDirectory("manifest3-").toString
    try {
      CorpusManifest.write(fixture, root, Seq("source"), "doc_id", "text")
      // the deterministic sample: first 2 of 3 keys in md5 order
      val sampled = CorpusManifest
        .verify(spark, root, Seq("source"), "doc_id", "text", sampleKeys = 2)
      val rows = sampled.select(col("source"), col("ok"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows.size === 2 && rows.values.forall(_ == 1L),
        s"clean sampled verify must pass its 2 keys: $rows")
      // the key filter must reach the scan as a PartitionFilter — the
      // O(sample) claim, not a post-scan filter over the whole snapshot
      val p = spark.read.parquet(s"$root/data")
        .filter(col("source") === rows.keySet.head)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(p.contains("PartitionFilters") &&
        p.matches("(?s).*PartitionFilters: \\[[^\\]]*source[^\\]]*\\].*"),
        s"sampled keys must partition-prune:\n$p")
      // tamper every partition: whichever keys the sample picks, it
      // must flag them
      for (src <- Seq("web", "pdf", "txt"))
        fixture.filter(col("source") === src).limit(1).drop("source")
          .write.mode("append").parquet(s"$root/data/source=$src")
      val tampered = CorpusManifest
        .verify(spark, root, Seq("source"), "doc_id", "text", sampleKeys = 2)
        .select(col("ok")).collect().map(_.getLong(0)).toSeq
      assert(tampered === Seq(0L, 0L),
        s"sampled verify must flag tampered sampled keys: $tampered")
    } finally rm(new java.io.File(root))
  }

  test("verify surfaces one-sided keys as mismatches, never silently drops them") {
    val root = java.nio.file.Files.createTempDirectory("manifest2-").toString
    try {
      CorpusManifest.write(fixture, root, Seq("source"), "doc_id", "text")
      // rewrite the data WITHOUT the txt source (a dropped-shard publish
      // bug) and with a brand-new source the manifest never saw
      val mutated = fixture.filter(col("source") =!= "txt")
        .unionByName(Seq((9L, "rho sigma", "epub")).toDF("doc_id", "text", "source"))
      mutated.write.mode("overwrite").partitionBy("source")
        .parquet(s"$root/data")
      val rows = CorpusManifest
        .verify(spark, root, Seq("source"), "doc_id", "text")
        .select(col("source"), col("ok"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("txt") === 0L, s"dropped source must be a mismatch: $rows")
      assert(rows("epub") === 0L, s"unmanifested source must be a mismatch: $rows")
      assert(rows("web") === 1L && rows("pdf") === 1L, s"$rows")
    } finally rm(new java.io.File(root))
  }

  test("stateManifest/verifyState: clean roundtrip, per-table tamper + lost-partition detection") {
    val root = java.nio.file.Files.createTempDirectory("statemani-").toString
    try {
      // arrival-partitioned state in the curation layout: two tables,
      // two batches each (the shapes dd/ledger actually carry)
      Seq((1L, "aa", 1L), (2L, "bb", 1L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=0")
      Seq((3L, "cc", 0L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=1")
      Seq((3L, "gate")).toDF("doc_id", "reason")
        .write.parquet(s"$root/ledger/batch=1")
      val tables = Seq("dd", "ledger")
      val stored = CorpusManifest.stateManifest(spark, root, tables)
        .localCheckpoint(true)
      def okMap(st: org.apache.spark.sql.DataFrame) = CorpusManifest
        .verifyState(spark, root, st)
        .select(col("tbl"), col("ok"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(okMap(stored) === Map("dd" -> 1L, "ledger" -> 1L))
      // order/partitioning independence: digests come from a SUM, so a
      // pure re-partitioning (compaction) verifies unchanged
      CurationState.compactState(spark, root, upTo = 1L, tables = tables)
      assert(okMap(stored) === Map("dd" -> 1L, "ledger" -> 1L),
        "compaction is a pure re-partitioning — the manifest must still verify")
      // tamper: flip one dd row's kept flag in place — only dd trips
      spark.read.parquet(s"$root/dd/batch=1")
        .withColumn("kept", lit(1L) - col("kept"))
        .write.mode("append").parquet(s"$root/dd/batch=1")
      val t = okMap(stored)
      assert(t("dd") === 0L, s"tampered dd must trip: $t")
      assert(t("ledger") === 1L, s"untouched ledger must stay ok: $t")
      // lost table: remove ledger entirely — it must surface as a loud
      // ok=0 mismatch row (stored count vs the explicit zero re-derive),
      // never a read error and never a silent absence (ADVICE r16)
      rm(new java.io.File(s"$root/ledger"))
      val lost = okMap(stored)
      assert(lost("ledger") === 0L, s"lost table must trip ok=0: $lost")
      // unexpected EXTRA on-disk table: the manifest never saw it, so it
      // must surface as ok=0 with the stored side null — not go unaudited
      Seq((9L, "zz", 1L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/extra/batch=0")
      val extra = okMap(stored)
      assert(extra.contains("extra") && extra("extra") === 0L,
        s"an unaudited extra table must surface: $extra")
      rm(new java.io.File(s"$root/extra"))
      // an extra table the audit cannot even DIGEST (payload column
      // with no dropCols entry) still surfaces as ok=0 via the
      // (-1, "<undigestable>") sentinel — never an abort that leaves
      // the REST of the state unaudited
      Seq((1L, Array(0.5, 0.25))).toDF("vec_id", "embedding")
        .write.parquet(s"$root/undig/batch=0")
      val undig = okMap(stored)
      assert(undig.contains("undig") && undig("undig") === 0L,
        s"undigestable extra table must trip ok=0: $undig")
      assert(undig.contains("dd") && undig.contains("ledger"),
        s"the rest of the audit must still run: $undig")
      rm(new java.io.File(s"$root/undig"))
      // non-atomic columns must be named in dropCols, never silently
      // excluded from the digest
      Seq((1L, Array(0.5, 0.25))).toDF("vec_id", "embedding")
        .write.parquet(s"$root/assign/batch=0")
      val bad = intercept[IllegalArgumentException] {
        CorpusManifest.stateManifest(spark, root, Seq("assign"))
      }
      assert(bad.getMessage.contains("dropCols"))
      val withDrop = CorpusManifest
        .stateManifest(spark, root, Seq("assign"), dropCols = Seq("embedding"))
        .collect()
      assert(withDrop.length === 1 && withDrop.head.getLong(1) === 1L)
      // null-safe canonical rendering (ADVICE r16): two rows differing
      // only in WHICH column is null must digest DIFFERENTLY — concat_ws
      // would skip the null and collapse them into one rendering
      Seq((Some("a"), None: Option[String]), (None: Option[String], Some("a")))
        .toDF("x", "y").write.parquet(s"$root/nulls/batch=0")
      val d2 = CorpusManifest.stateManifest(spark, root, Seq("nulls"))
        .collect().head
      Seq((Some("a"), None: Option[String]), (Some("a"), None: Option[String]))
        .toDF("x", "y").write.mode("overwrite")
        .parquet(s"$root/nulls/batch=0")
      val d2b = CorpusManifest.stateManifest(spark, root, Seq("nulls"))
        .collect().head
      assert(d2.getString(2) !== d2b.getString(2),
        "null-position swaps must shift the digest")
      // fold-law totality (ADVICE r16): a table NO arrival ever wrote
      // folds to the same explicit zero the whole-state side derives
      val never = CorpusManifest.stateManifest(spark, root, Seq("ghost"))
        .collect().head
      assert((never.getString(0), never.getLong(1), never.getString(2))
        === (("ghost", 0L, "0")),
        "an absent table must derive the explicit zero row")
    } finally rm(new java.io.File(root))
  }

  test("stateManifestIncrement: per-arrival folds == whole-state manifest; absent partitions are zero rows") {
    val root = java.nio.file.Files.createTempDirectory("statemani2-").toString
    try {
      Seq((1L, "aa", 1L), (2L, "bb", 1L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=0")
      Seq((3L, "cc", 0L)).toDF("doc_id", "fingerprint", "kept")
        .write.parquet(s"$root/dd/batch=1")
      // ledger only exists for arrival 1 — arrival 0's increment must
      // still carry an explicit zero row for it
      Seq((3L, "gate")).toDF("doc_id", "reason")
        .write.parquet(s"$root/ledger/batch=1")
      val tables = Seq("dd", "ledger")
      val incs = Seq(0L, 1L).map(b =>
        CorpusManifest.stateManifestIncrement(spark, root, tables, b))
      val i0 = incs.head.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
      assert(i0("ledger") === ((0L, "0")),
        s"absent partition must contribute an explicit zero row: $i0")
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).sortBy(_.head.toString).toSeq
      val folded = rows(incs.reduce(CorpusManifest.mergeStateManifests))
      val whole = rows(CorpusManifest.stateManifest(spark, root, tables))
      assert(folded === whole,
        "fold of per-arrival state-manifest increments must equal the " +
          "whole-state manifest")
    } finally rm(new java.io.File(root))
  }

  test("frameDigest canonical rendering is injective: separator straddles and literal-<NULL> tampers flip the digest") {
    def dig(df: org.apache.spark.sql.DataFrame): String =
      CorpusManifest.frameDigest(df, "t").head.getString(2)
    // a '|' inside a value must not straddle the column boundary: the
    // unescaped rendering digested ('a|b','c') and ('a','b|c')
    // identically — an invisible tamper that moves content across
    // columns. The length prefix (prefix-free code) separates them.
    assert(dig(Seq(("a|b", "c")).toDF("x", "y"))
      !== dig(Seq(("a", "b|c")).toDF("x", "y")),
      "a separator-straddling tamper must flip the digest")
    // ... and the same for a value that IS the old multi-column
    // rendering of its neighbors
    assert(dig(Seq(("a|b|c", "")).toDF("x", "y"))
      !== dig(Seq(("a", "b|c|")).toDF("x", "y")))
    // a literal '<NULL>' string must be distinguishable from NULL
    // (it renders length-prefixed, `6:<NULL>`; NULL renders bare)
    assert(dig(Seq(("<NULL>", 1L)).toDF("x", "n"))
      !== dig(Seq((Option.empty[String], 1L)).toDF("x", "n")),
      "a literal '<NULL>' value must not collide with a real NULL")
    // nulls in DIFFERENT columns still digest differently (the r16
    // property, preserved through the rendering change)
    assert(dig(Seq((Option.empty[String], Some("v"))).toDF("x", "y"))
      !== dig(Seq((Some("v"), Option.empty[String])).toDF("x", "y")))
  }

  test("verify(sampleKeys > 0) on an empty stored manifest is the empty diff, not a crash") {
    // publish of a fully-gated-away snapshot: zero keys to sample —
    // the key-predicate fold must not reduce an empty collection
    val dir = java.nio.file.Files.createTempDirectory("emptypub-").toString
    try {
      val empty = fixture.filter(lit(false))
      empty.write.parquet(s"$dir/data")
      CorpusManifest.manifest(empty, Seq("source"), "doc_id", "text")
        .write.parquet(s"$dir/manifest")
      val out = CorpusManifest.verify(spark, dir, Seq("source"),
        "doc_id", "text", sampleKeys = 3)
      assert(out.count() === 0L)
    } finally rm(new java.io.File(dir))
  }

  test("existing-but-footerless state dirs contribute the zero row, not a schema error") {
    // a crashed writer's empty commit (bare dir, or _SUCCESS only) is
    // the documented zero-row case for both manifest verbs
    val root = java.nio.file.Files.createTempDirectory("footerless-").toString
    try {
      assert(new java.io.File(s"$root/dd/batch=0").mkdirs())
      new java.io.FileOutputStream(
        new java.io.File(s"$root/dd/batch=0/_SUCCESS")).close()
      val inc = CorpusManifest.stateManifestIncrement(
        spark, root, Seq("dd"), 0L).head
      assert((inc.getString(0), inc.getLong(1), inc.getString(2))
        === (("dd", 0L, "0")))
      val whole = CorpusManifest.stateManifest(spark, root, Seq("dd")).head
      assert((whole.getString(0), whole.getLong(1), whole.getString(2))
        === (("dd", 0L, "0")))
    } finally rm(new java.io.File(root))
  }
}
