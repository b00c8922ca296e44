package graft.examples
import org.apache.spark.sql.SparkSession
/** Reproduces the driver's smoke check: a plain session (no graft confs
  * in the builder) calling SparkEntry.entry — verifies the runtime
  * nanosAsLong defensive set in Tables.load suffices.
  */
object VanillaEntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
