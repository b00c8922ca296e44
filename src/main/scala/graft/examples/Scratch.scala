package graft.examples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway A/B harness for optimization experiments (r21). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.ops.Similarity

    def time(tag: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-14s median=${ts.sorted.apply(1)}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def emb: DataFrame = graft.Tables.load(spark, dir, "embeddings")
    def scored: DataFrame = {
      val c = Similarity.withNorm(emb, "vec_id", "embedding")
        .select(col("vec_id").as("neighbor_id"), col("__vec").as("cv"), col("__norm").as("cn"))
      val q = Similarity.withNorm(emb, "vec_id", "embedding")
        .select(col("vec_id").as("query_id"), col("__vec").as("qv"), col("__norm").as("qn"))
      c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
        .withColumn("cos",
          graft.functions.functions.dot_product(col("qv"), col("cv")) / (col("qn") * col("cn")))
        .select("query_id", "neighbor_id", "cos")
    }

    def aggCut(rev: Boolean): DataFrame = {
      import org.apache.spark.sql.GraftSqlBridge
      val e = struct((-col("cos")).as("nc"), col("neighbor_id").as("id"))
      val tk = GraftSqlBridge.collectTopK(e, 5, rev)
      scored.groupBy(col("query_id"))
        .agg(array_sort(tk).as("__tk"))
        .select(col("query_id"), posexplode(col("__tk")))
        .select(col("query_id"), col("col.id").as("neighbor_id"),
          (col("pos") + 1).as("rank"),
          graft.util.Rounding.pround(-col("col.nc"), 6).as("cosine"))
    }
    // correctness vs current salted window form
    val cur = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", 5)
    for (rev <- Seq(false, true)) {
      try {
        val got = aggCut(rev)
        val d1 = cur.exceptAll(got).count()
        val d2 = got.exceptAll(cur).count()
        println(s"rev=$rev diff cur-got=$d1 got-cur=$d2 rows=${got.count()}")
      } catch { case e: Throwable => println(s"rev=$rev FAILED ${e.getMessage.take(120)}") }
    }
    time("agg-cut-false")(aggCut(false))
    time("salted-cur")(cur)
    spark.stop()
  }
}
