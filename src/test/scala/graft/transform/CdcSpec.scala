package graft.transform

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val keyCols = Seq("id")
  private val cmpCols = Seq("a", "b")

  test("snapshotDiff: hand-computed I/D/U with exact changed-column lists") {
    val oldDf = Seq(
      (1L, "x", 10),            // unchanged
      (2L, "x", 20),            // b changes
      (3L, "y", 30),            // a and b change
      (4L, "z", 40)             // deleted
    ).toDF("id", "a", "b")
    val newDf = Seq(
      (1L, "x", 10),
      (2L, "x", 21),
      (3L, "q", 31),
      (5L, "w", 50)             // inserted
    ).toDF("id", "a", "b")
    val out = Cdc.snapshotDiff(oldDf, newDf, keyCols, cmpCols)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq === Seq(
      (2L, "U", Some("b")),
      (3L, "U", Some("a,b")),
      (4L, "D", None),
      (5L, "I", None)))
  }

  test("snapshotDiff: NULL transitions are updates, NULL==NULL is not") {
    val oldDf = Seq((1L, Some("x")), (2L, None: Option[String]),
      (3L, None: Option[String])).toDF("id", "a")
    val newDf = Seq((1L, None: Option[String]), (2L, Some("y")),
      (3L, None: Option[String])).toDF("id", "a")
    val out = Cdc.snapshotDiff(oldDf, newDf, keyCols, Seq("a"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, "U", "a"), (2L, "U", "a")))
  }

  test("partitionDigests: row order and layout never change the digest; any row does") {
    val base = Seq((0, 1L, "x", 10), (0, 2L, "y", 20), (1, 3L, "z", 30))
      .toDF("p", "id", "a", "b")
    val shuffled = base.orderBy(col("b").desc).repartition(7)
    val d1 = Cdc.partitionDigests(base, Seq("p"), Seq("id", "a", "b"))
      .orderBy("p").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val d2 = Cdc.partitionDigests(shuffled, Seq("p"), Seq("id", "a", "b"))
      .orderBy("p").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(d1.toSeq === d2.toSeq)
    val edited = Seq((0, 1L, "x", 11), (0, 2L, "y", 20), (1, 3L, "z", 30))
      .toDF("p", "id", "a", "b")
    val d3 = Cdc.partitionDigests(edited, Seq("p"), Seq("id", "a", "b"))
      .orderBy("p").collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(d3(0) !== d1(0), "edited partition must change digest")
    assert(d3(1) === d1(1), "untouched partition must keep its digest")
  }

  test("prunedSnapshotDiff equals the full diff on seeded random snapshots") {
    val rnd = new scala.util.Random(7)
    def snap(edit: Boolean) = (1 to 400).flatMap { id =>
      val keep = if (edit) rnd.nextInt(10) != 0 else true
      if (!keep) None
      else {
        val a = if (edit && rnd.nextInt(5) == 0) "mut" else s"v${id % 13}"
        Some((id % 8, id.toLong, a, id % 31))
      }
    }.toDF("p", "id", "a", "b")
    val oldDf = (1 to 400).map(id => (id % 8, id.toLong, s"v${id % 13}", id % 31))
      .toDF("p", "id", "a", "b")
    val newDf = snap(edit = true)
    val full = Cdc.snapshotDiff(oldDf, newDf, Seq("id"), Seq("a", "b"))
      .orderBy("id").collect().map(_.toSeq)
    val pruned = Cdc.prunedSnapshotDiff(oldDf, newDf, Seq("p"), Seq("id"),
      Seq("a", "b")).orderBy("id").collect().map(_.toSeq)
    assert(full.nonEmpty && full.toSeq === pruned.toSeq)
  }

  test("prunedSnapshotDiff: partitions only on one side survive pruning") {
    val oldDf = Seq((0, 1L, "x"), (1, 2L, "y")).toDF("p", "id", "a")
    val newDf = Seq((0, 1L, "x"), (2, 3L, "z")).toDF("p", "id", "a")
    val out = Cdc.prunedSnapshotDiff(oldDf, newDf, Seq("p"), Seq("id"), Seq("a"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((2L, "D"), (3L, "I")))
  }

  test("prunedSnapshotDiff: changed rows in a NULL-valued partition are not lost") {
    // equality-based digest compare and semi-joins never match NULL
    // keys, so NULL partitions bypass the prune and always enter the
    // row diff — changed NULL-partition rows must surface, unchanged
    // ones must add nothing
    val oldDf = Seq(
      (Some(0), 1L, "x"), (None, 2L, "y"), (None, 3L, "keep"))
      .toDF("p", "id", "a")
    val newDf = Seq(
      (Some(0), 1L, "x"), (None, 2L, "MUTATED"), (None, 3L, "keep"))
      .toDF("p", "id", "a")
    val full = Cdc.snapshotDiff(oldDf, newDf, Seq("id"), Seq("a"))
      .orderBy("id").collect().map(_.toSeq)
    val pruned = Cdc.prunedSnapshotDiff(oldDf, newDf, Seq("p"), Seq("id"),
      Seq("a")).orderBy("id").collect().map(_.toSeq)
    assert(full.toSeq === pruned.toSeq)
    assert(pruned.map(_.head).toSeq === Seq(2L))
  }

  test("digest sees values moving across NULL columns (hash null-skip closed)") {
    // Spark hash expressions SKIP null children, so a bare
    // xxhash64(cols...) digested ('x', NULL) and (NULL, 'x')
    // identically — this exact update used to leave the digest AND the
    // row count unchanged and the partition pruned out of the diff
    val o = Seq((1L, 1L, Some("x"), Option.empty[String]))
      .toDF("p", "id", "a", "b")
    val n = Seq((1L, 1L, Option.empty[String], Some("x")))
      .toDF("p", "id", "a", "b")
    val got = Cdc.prunedSnapshotDiff(o, n, Seq("p"), Seq("id"), Seq("a", "b"))
      .collect()
    assert(got.length === 1 &&
      got.head.getAs[String]("change_type") === "U" &&
      got.head.getAs[String]("changed_cols") === "a,b",
      s"null-adjacent column move must survive pruning: ${got.toSeq}")
    // and it still equals the unpruned diff
    val full = Cdc.snapshotDiff(o, n, Seq("id"), Seq("a", "b")).collect()
    assert(full.map(_.toSeq).toSeq === got.map(r =>
      Seq(r.getAs[Long]("id"), r.getAs[String]("change_type"),
        r.getAs[String]("changed_cols"))).toSeq)
  }

  test("a NULL-key old-only row reads as a DELETE, never an INSERT") {
    // presence used to be inferred from key.isNotNull: an old-side row
    // with a NULL head key was silently emitted as an INSERT —
    // downstream incremental materialization re-pushed a deleted row
    val o = Seq((Option.empty[Long], "v1"), (Some(2L), "keep"))
      .toDF("k", "v")
    val n = Seq((Some(2L), "keep")).toDF("k", "v")
    val got = Cdc.snapshotDiff(o, n, Seq("k"), Seq("v"))
      .collect().map(r => (Option(r.get(0)), r.getString(1)))
    assert(got.toSeq === Seq((None, "D")),
      s"old-side null-key row must read as D: ${got.toSeq}")
  }

  test("a compare column literally named 'present' does not collide with the markers") {
    // the prefix map already emits `_old_present` for a column named
    // `present` — a marker with that spelling duplicated the name and
    // failed with an ambiguous reference far from the cause
    val o = Seq((1L, "yes"), (2L, "no")).toDF("id", "present")
    val n = Seq((1L, "no"), (3L, "yes")).toDF("id", "present")
    val out = Cdc.snapshotDiff(o, n, Seq("id"), Seq("present"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq === Seq(
      (1L, "U", Some("present")),
      (2L, "D", None),
      (3L, "I", None)))
    // even the marker-adjacent spelling is a legitimate input: the
    // prefix map renders `_old__cdc_old_present`, which can never equal
    // the `__cdc_`-prefixed markers — identical snapshots diff to empty
    val markerish = Seq((1L, "x"), (2L, "y")).toDF("id", "_cdc_old_present")
    assert(Cdc.snapshotDiff(markerish, markerish,
      Seq("id"), Seq("_cdc_old_present")).isEmpty)
    val changed = Cdc.snapshotDiff(markerish,
      Seq((1L, "x"), (2L, "z")).toDF("id", "_cdc_old_present"),
      Seq("id"), Seq("_cdc_old_present")).collect()
    assert(changed.map(r => (r.getLong(0), r.getString(1),
      r.getString(2))).toSeq === Seq((2L, "U", "_cdc_old_present")))
  }

  test("a column listed as both key and compare is projected once, not ambiguous") {
    // keyCols ++ compareCols used to render duplicate `_old_id` names
    // and die with AMBIGUOUS_REFERENCE at the join cond; deduped, the
    // key participates in compare harmlessly (matched rows joined on
    // key equality never differ on it — changed_cols never lists it)
    val o = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val n = Seq((1L, "x"), (2L, "z"), (3L, "w")).toDF("id", "v")
    val out = Cdc.snapshotDiff(o, n, Seq("id"), Seq("id", "v"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq === Seq((2L, "U", Some("v")), (3L, "I", None)))
  }

  test("a column duplicated within compareCols lists once in changed_cols") {
    // ADVICE r20: after the key∩compare dedup, Seq("v","v") no longer
    // failed loudly — it silently rendered "v,v". Declared-order dedup
    // keeps each changed column listed exactly once.
    val o = Seq((1L, "x", 1L), (2L, "y", 2L)).toDF("id", "v", "w")
    val n = Seq((1L, "x", 9L), (2L, "z", 2L)).toDF("id", "v", "w")
    val out = Cdc.snapshotDiff(o, n, Seq("id"), Seq("v", "v", "w"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, "U", "w"), (2L, "U", "v")))
  }
}
