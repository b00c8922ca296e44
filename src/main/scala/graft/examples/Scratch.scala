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
    val o = graft.Tables.load(spark, dir, "orders")

    def time(tag: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-12s median=${ts.sorted.apply(1)}%.3f  runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    // current: one agg, multi-distinct Expand
    time("expand")(graft.Queries.relational("q177_column_stats")(spark, dir))

    // alternative: one branch per column, single-distinct each, union
    val specs: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)] = Seq(
      ("o_orderkey", col("o_orderkey"), col("o_orderkey")),
      ("o_custkey", col("o_custkey"), col("o_custkey")),
      ("o_orderstatus", col("o_orderstatus"), col("o_orderstatus")),
      ("o_totalprice", col("o_totalprice"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long")),
      ("o_orderdate", col("o_orderdate"),
        unix_micros(col("o_orderdate").cast("timestamp"))),
      ("o_orderpriority", col("o_orderpriority"), col("o_orderpriority")))
    def unionForm: DataFrame = specs.map { case (name, raw, canon) =>
      o.agg(
        lit(name).as("col_name"),
        count(lit(1)).as("n_total"),
        count(raw).as("n_nonnull"),
        countDistinct(raw).as("n_distinct"),
        min(canon).cast("string").as("min_val"),
        max(canon).cast("string").as("max_val"))
        .select("col_name", "n_total", "n_nonnull", "n_distinct", "min_val", "max_val")
    }.reduce(_ unionByName _)
    time("union6")(unionForm)
    spark.stop()
  }
}
