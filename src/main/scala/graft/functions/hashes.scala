package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for document fingerprinting — native
  * codegen'd scalar functions (no UDF serialization, stays inside
  * WholeStageCodegen; SURVEY §7.3 optional-custom-Expression path).
  */

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `h = Σ h*31 + byte (mod 2^64)` — the classic Rabin–Karp/Java-style
  * rolling fingerprint, byte-order sensitive and stable across engines
  * and JVMs. Null-safe (null in → null out).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

/** 64-bit SimHash over a token array: each token hashes to 64 bits
  * (xxhash-style mix of the rolling hash); a document bit is set when
  * the token-weighted bit-sum is positive. The production-scale sibling
  * of [[graft.ops.Dedup.simhash16]] (which stays md5-portable for the
  * DuckDB oracle). Interpreted + codegen paths share [[SimHash64.eval]].
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    SimHash64.eval(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash64.eval($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Mix a rolling hash into 64 well-distributed bits (splitmix64). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def eval(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val bytes = tokens.getUTF8String(t).getBytes
        var h = 0L
        var i = 0
        while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xffL); i += 1 }
        h = mix(h)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}

/** Column-level API + SQL registration for the custom expressions. */
object functions {
  def rolling_hash(c: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c)))
  def simhash64(c: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(c)))

  /** Register `rolling_hash` / `simhash64` for SQL use in a session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
  }
}
