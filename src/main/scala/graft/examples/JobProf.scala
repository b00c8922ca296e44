package graft.examples
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Diagnostic main (bench-family of Prof/PlanDump): run one query warm,
  * then re-run it with a SparkListener recording every job's wall time
  * and callsite, so composite queries' time decomposes into jobs.
  * Usage: runMain graft.examples.JobProf <query> [<query> ...]
  */
object JobProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qs = if (args.nonEmpty) args.toSeq else Seq("q250_lifecycle_curation")
    for (q <- qs) {
      // warm run (JIT/codegen/page cache)
      graft.SparkEntry.queries(q)(spark, dir).count()
      val jobs = mutable.ArrayBuffer.empty[(Int, Long, String)]
      val starts = mutable.Map.empty[Int, (Long, String)]
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val p = Option(js.properties)
          def prop(k: String) = p.flatMap(x => Option(x.getProperty(k)))
          starts(js.jobId) = (js.time,
            prop("spark.job.description")
              .orElse(prop("callSite.short"))
              .getOrElse("") + " [exec " +
              prop("spark.sql.execution.id").getOrElse("-") + "]")
        }
        override def onJobEnd(je: SparkListenerJobEnd): Unit =
          starts.remove(je.jobId).foreach { case (t0, cs) =>
            jobs += ((je.jobId, je.time - t0, cs))
          }
      }
      spark.sparkContext.addSparkListener(listener)
      val execs = mutable.ArrayBuffer.empty[(String, Long, String)]
      val qel = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val head = qe.optimizedPlan.toString.linesIterator
            .take(2).mkString(" | ").take(150)
          execs.synchronized { execs += ((funcName, durationNs, head)) }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ex: Exception): Unit = ()
      }
      spark.listenerManager.register(qel)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      spark.listenerManager.unregister(qel)
      val jobSum = jobs.map(_._2).sum / 1e3
      val execSum = execs.map(_._2).sum / 1e9
      println(f"== $q wall=$wall%.2f s, ${jobs.size} jobs, job-sum=$jobSum%.2f s, ${execs.size} actions, action-sum=$execSum%.2f s")
      execs.sortBy(-_._2)
        .take(sys.env.getOrElse("JOBPROF_TOP", "60").toInt)
        .foreach { case (fn, ns, head) =>
          println(f"  act ${ns / 1e9}%7.3f s  $fn%-18s $head")
        }
    }
    spark.stop()
  }
}
