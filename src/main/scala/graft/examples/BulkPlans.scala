package graft.examples
import org.apache.spark.sql.SparkSession

/** Dump every query's formatted physical plan to plans/tmp/<name>.txt
  * in one session (r21 optimization survey). Composite queries execute
  * their state machinery during construction — that is fine here; the
  * point is the final frame's plan inventory.
  */
object BulkPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val out = new java.io.File("plans/tmp")
    out.mkdirs()
    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val s = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val w = new java.io.PrintWriter(new java.io.File(out, s"$q.txt"))
        try w.println(s) finally w.close()
      } catch {
        case e: Throwable => println(s"FAILPLAN $q: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
