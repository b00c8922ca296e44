package graft.examples

import graft.SparkSpec

/** CI smoke for the runnable lifecycle example — the demo must not rot:
  * the degraded arrival alarms, the natural ones don't, kept counts are
  * sane, and the state-rebuilt publish verifies clean on every key.
  */
class ExamplesSmokeSpec extends SparkSpec {

  test("LifecycleDemo: arrivals curate + monitor, state-rebuilt publish verifies") {
    val (perArrival, nOk, nAll, sOk, nHits) = LifecycleDemo.run(spark, sf0001)
    assert(perArrival.size === 4)
    // every arrival kept SOMETHING and only the degraded one alarmed
    assert(perArrival.forall(_._1 > 0L), s"kept counts: $perArrival")
    assert(perArrival.map(_._2) === Seq(0L, 0L, 0L, 1L),
      s"only the degraded arrival may alarm: $perArrival")
    // the manifest over the state-rebuilt corpus verifies on EVERY key
    assert(nAll > 0L && nOk === nAll, s"verify: $nOk/$nAll")
    // the state manifest verifies on every curation table, and the
    // state-served retrieval answers k=5 for all 4 queries
    assert(sOk === graft.pipelines.CurationState.CurationTables.size.toLong,
      s"state manifest: $sOk tables ok")
    assert(nHits === 20L, s"state-served retrieval rows: $nHits")
  }
}
