package graft.pipelines

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end curation: planted junk, exact dups, and near-dups must
  * each be removed by the right stage while clean docs survive.
  */
class TrainingDataPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val goodText =
    "the quick brown fox jumps over the lazy dog and runs far into the woods again today"

  private lazy val fixture = Seq(
    (1L, goodText),                               // keeper
    (2L, goodText),                               // exact dup of 1 → dropped
    (3L, goodText.replace("today", "tomorrow")),  // near dup of 1 → dropped
    (4L, "the big data engine sorts and merges all of the partitioned rows quite quickly indeed"), // distinct keeper
    (5L, "tiny"),                                 // too short → dropped
    (6L, "el perro y los gatos en la casa y el sol y la luna y mas cosas") // not en → dropped
  ).toDF("doc_id", "text")

  test("curate keeps clean distinct docs and drops junk/dups/near-dups") {
    val out = TrainingDataPipeline.curate(fixture,
      cfg = TrainingDataPipeline.Config(jaccardThreshold = 0.5))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids === Set(1L, 4L))
  }

  test("stages are individually correct") {
    val cfg = TrainingDataPipeline.Config(jaccardThreshold = 0.5)
    val gated = TrainingDataPipeline.annotateAndFilter(fixture, cfg)
    assert(gated.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 3L, 4L))
    val exact = TrainingDataPipeline.dropExactDuplicates(gated, "doc_id")
    assert(exact.select("doc_id").as[Long].collect().toSet === Set(1L, 3L, 4L))
    val near = TrainingDataPipeline.dropNearDuplicates(exact, "doc_id", cfg)
    assert(near.select("doc_id").as[Long].collect().toSet === Set(1L, 4L))
  }

  test("curate runs on the synthetic corpus without shrinking it to zero") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = TrainingDataPipeline.curate(docs)
    val n = out.count()
    assert(n > 0 && n <= docs.count())
  }
}
