package graft

/** Catalog-wide sanity: every query in the driver contract runs at
  * sf0.001 and returns rows (candidate-pair queries may legitimately be
  * empty on the dup-free synthetic corpus), and `entry` works on a
  * vanilla session the way the driver's smoke check invokes it.
  */
class QueriesSpec extends SparkSpec {

  private val mayBeEmpty = Set("q17_minhash_lsh", "q21_embedding_dedup")

  test("every catalog query executes at sf0.001") {
    val counts = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf0001).count()
    }
    val unexpected = counts.filter { case (n, c) => c == 0 && !mayBeEmpty(n) }
    assert(unexpected.isEmpty, s"empty results: $unexpected")
    assert(counts.size === SparkEntry.queries.size)
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("entry returns rows on the smoke fixture (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
