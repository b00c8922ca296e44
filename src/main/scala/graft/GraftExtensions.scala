package graft

import org.apache.spark.sql.SparkSessionExtensions

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions (`rolling_hash`, `simhash64`, `dot_product`) as
  * SQL functions in every session built with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def info(name: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)
    ext.injectFunction((FunctionIdentifier("rolling_hash"), info("rolling_hash"),
      (es: Seq[Expression]) => graft.functions.RollingHash(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => graft.functions.SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (es: Seq[Expression]) => graft.functions.DotProduct(es(0), es(1))))
  }
}
