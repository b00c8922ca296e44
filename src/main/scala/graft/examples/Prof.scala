package graft.examples
import org.apache.spark.sql.SparkSession
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q14_text_stats","q17_minhash_lsh","q18_ngram_jaccard",
               "q20_knn_brute","q34_curation","q41_dedup_clusters",
               "q91_pagerank","q93_triangles","q95_item_similarity",
               "q96_kcore")
    for (q <- qs) {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val tPlan = System.nanoTime()
        df.count()
        println(f"$q run$i build=${(tPlan-t0)/1e9}%.2f exec=${(System.nanoTime()-tPlan)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
