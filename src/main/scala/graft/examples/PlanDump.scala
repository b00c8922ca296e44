package graft.examples
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q06_pit_join")
    val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
