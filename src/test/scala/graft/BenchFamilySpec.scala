package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's family classifier exists to make round-over-round
  * subtotals diffable — so the assignment of representative queries
  * must never silently move between rounds.
  */
class BenchFamilySpec extends AnyFunSuite {
  test("representative board queries keep their families") {
    val expected = Map(
      "q06_pit_join" -> "feature_store",
      "q07_materialize_latest" -> "feature_store",
      "q234_freshness" -> "feature_store",
      "q15_exact_dedup" -> "dedup",
      "q17_minhash_lsh" -> "dedup",
      "q237_image_dedup" -> "dedup",
      "q25b_ivf_trained" -> "ann",
      "q172b_pq_adc_trained" -> "ann",
      "q91_pagerank" -> "graph",
      "q114_cms_hitters" -> "stats",
      "q177_column_stats" -> "stats",
      "q34_curation" -> "text",
      "q235_incremental_pipeline" -> "text",
      "q01_hourly_agg" -> "core",
      "q03_join_agg" -> "core",
      // round-14 additions (append-only — the classifier rules are
      // frozen, these pin where the new names landed)
      "q250_lifecycle_curation" -> "text",
      "q251_source_mix_drift" -> "stats",
      "q252_ann_append_assign" -> "ann")
    expected.foreach { case (q, f) =>
      assert(Bench.family(q) == f, s"$q moved family")
    }
    // every registered query classifies without throwing, and the board
    // never collapses into a single bucket
    val fams = SparkEntry.queries.keys.map(Bench.family).toSet
    assert(fams.size >= 5, s"family partition collapsed: $fams")
  }
}
