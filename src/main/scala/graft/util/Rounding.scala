package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{floor, lit}

/** Engine-portable fixed-point rounding.
  *
  * `round(x, n)` is NOT portable across engines at half-way boundaries:
  * Spark rounds HALF_UP on the value's shortest *decimal* rendering
  * (BigDecimal.valueOf) while DuckDB rounds the *binary* double — for a
  * value whose decimal rendering ends in ...5 but whose binary value
  * sits just below it, the two disagree in the last digit (observed:
  * quality score 0.2337 vs 0.2338 at sf0.1). `floor(x·10ⁿ + 0.5)/10ⁿ`
  * is pure IEEE arithmetic, bit-identical in any engine; the DuckDB
  * oracle uses the same formula.
  */
object Rounding {
  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** The SQL spelling of [[pround]] for oracle queries. */
  def proundSql(expr: String, n: Int): String = {
    val p = "1" + ("0" * n) + ".0"
    s"floor(($expr) * $p + 0.5) / $p"
  }
}
