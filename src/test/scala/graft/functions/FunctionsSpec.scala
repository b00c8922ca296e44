package graft.functions

import graft.{SparkSpec, Tables}
import graft.functions.{functions => gf}
import org.apache.spark.sql.functions._

/** Equivalence pins for the codegen text expressions: each must produce
  * byte-identical results to the built-in composition it replaces, on
  * both adversarial literals and the real documents fixture — the
  * oracle-parity guarantee that lets the hot path swap implementations
  * without touching the DuckDB SQL.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val edgeStrings = Seq(
    "",
    " ",
    "   ",
    "\t\t",
    "plain text",
    "  Leading And   Trailing  ",
    "tabs\tand\nnewlines\r\nand\u000bvt\fff",
    "MiXeD CaSe ÄÖÜ ß İstanbul ΣΊΣΥΦΟΣ",
    "中文 文本 with spaces",
    "a  b   c    d",
    "\t leading tab run",
    "trailing run \n ",
    "punct!!! ... ???")

  test("normalized_md5 == md5(lower(regexp_replace(trim(text), \\s+, ' ')))") {
    val lit = edgeStrings.toDF("text")
    val docs = Tables.load(spark, sf0001, "documents").select(col("text"))
    Seq(lit, docs).foreach { df =>
      val bad = df.select(
        gf.normalized_md5(col("text")).as("fast"),
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("ref"))
        .filter(!(col("fast") <=> col("ref")))
      assert(bad.count() === 0, bad.collect().mkString("\n"))
    }
  }

  test("count_in_set == size(filter(toks, isin)) including duplicates and nulls") {
    val words = graft.ops.TextAnalysis.StopwordsEn
    val toks = Seq(
      Seq("the", "the", "the"),
      Seq("a", "b", "of", "of"),
      Seq.empty[String],
      Seq("none", "match"),
      Seq("The", "the")).toDF("toks")
    val docs = Tables.load(spark, sf0001, "documents")
      .select(graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
    Seq(toks, docs).foreach { df =>
      val bad = df.select(
        gf.count_in_set(col("toks"), words).as("fast"),
        size(filter(col("toks"), t => t.isin(words.map(w => w: Any): _*))).as("ref"))
        .filter(!(col("fast") <=> col("ref")))
      assert(bad.count() === 0, bad.collect().mkString("\n"))
    }
  }

  test("fused minhash signatures == explode+groupBy formulation") {
    val docs = Tables.load(spark, sf0001, "documents").select("doc_id", "text")
    val viaAgg = graft.ops.Dedup.minhashSignatures(
      graft.ops.Dedup.shingleBag(docs, "doc_id", "text"), "doc_id")
    val fused = graft.ops.Dedup.minhashSignaturesFused(docs, "doc_id", "text")
    assert(fused.columns.toSeq === viaAgg.columns.toSeq)
    assert(fused.count() === viaAgg.count())
    assert(fused.exceptAll(viaAgg).count() === 0)
    assert(viaAgg.exceptAll(fused).count() === 0)
    // short docs (< n tokens) are dropped by both formulations
    val short = Seq((1L, "one two"), (2L, "a b c d")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.minhashSignaturesFused(short, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("normalized_md5 and count_in_set stay inside codegen") {
    val df = Tables.load(spark, sf0001, "documents").select(
      gf.normalized_md5(col("text")).as("h"),
      gf.count_in_set(graft.ops.TextAnalysis.tokens(col("text")),
        graft.ops.TextAnalysis.StopwordsEn).as("c"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("* Project"), s"fell out of codegen:\n$p")
  }
}
