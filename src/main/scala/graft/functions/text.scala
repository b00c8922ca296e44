package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen text expressions for the dedup/quality hot paths — single-pass
  * replacements for regex chains and interpreted higher-order-function
  * lambdas (the two per-row cost centers the bench flagged in q14-q17).
  */

/** `md5(lower(regexp_replace(trim(text), "\s+", " ")))` in ONE byte-level
  * pass plus one digest — no regex engine, no three intermediate strings.
  * Byte-exact with the composed formulation (verified in FunctionsSpec):
  * space-only trim (Spark `trim` semantics), ASCII `\s` run collapse
  * (Java regex `\s` = space, \t, \n, \x0B, \f, \r — multi-byte UTF-8
  * sequences all have the high bit set, so a byte scan can't false-match),
  * then `UTF8String.toLowerCase` (the exact `lower()` implementation)
  * before hashing. Null in → null out.
  */
case class NormalizedMd5(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"normalized_md5 needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NormalizedMd5.evalImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizedMd5.evalImpl($c);")

  override protected def withNewChildInternal(newChild: Expression): NormalizedMd5 =
    copy(child = newChild)
  override def prettyName: String = "normalized_md5"
}

object NormalizedMd5 {
  private def isAsciiWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  // Named evalImpl, NOT eval: the case class inherits Expression.eval, which
  // suppresses scalac's static forwarder for a companion `eval` — generated
  // Java calling graft.functions.NormalizedMd5.eval would fail Janino
  // compilation and silently fall back to interpreted execution.
  def evalImpl(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    // Spark trim(): leading/trailing 0x20 only.
    var start = 0
    var end = bytes.length
    while (start < end && bytes(start) == 0x20) start += 1
    while (end > start && bytes(end - 1) == 0x20) end -= 1
    // regexp_replace(_, "\s+", " "): collapse ASCII whitespace runs.
    val out = new Array[Byte](end - start)
    var n = 0
    var i = start
    var inWs = false
    while (i < end) {
      val b = bytes(i)
      if (isAsciiWs(b)) {
        if (!inWs) { out(n) = 0x20; n += 1 }
        inWs = true
      } else {
        out(n) = b; n += 1
        inWs = false
      }
      i += 1
    }
    val lowered = UTF8String.fromBytes(out, 0, n).toLowerCase
    UTF8String.fromString(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(lowered.getBytes))
  }
}

/** Count of `array<string>` elements contained in a fixed word set — the
  * codegen replacement for `size(filter(toks, t => t.isin(words)))`,
  * whose lambda evaluates interpreted per element. Multiplicity-counting
  * (duplicates count), null elements skipped, null array → null. The set
  * is hashed once per operator, not per row.
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"count_in_set needs array<string>, got ${other.catalogString}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = CountInSet.build(words)

  override def nullSafeEval(input: Any): Any =
    CountInSet.evalImpl(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CountInSet.evalImpl($c, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
  override def prettyName: String = "count_in_set"
}

object CountInSet {
  def build(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  // evalImpl, not eval — see NormalizedMd5's companion note.
  def evalImpl(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    var cnt = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }
}

/** Unicode NFC normalization (UAX #15 canonical composition) — Spark has
  * no built-in for it, yet it is the mandatory first step of any text
  * dedup/fingerprint pipeline over web text: `e` + U+0301 and the
  * precomposed `é` must hash identically or every downstream exact-dup
  * and minhash key silently splits. Backed by `java.text.Normalizer`
  * (the JDK's ICU-derived implementation of the same Unicode standard
  * DuckDB's `nfc_normalize`/utf8proc implements, so outputs agree
  * cross-engine for any codepoint both Unicode versions cover).
  *
  * Codegen with an all-ASCII byte-scan fast path: ASCII is NFC by
  * definition, so the dominant case (English web text) returns the
  * input UTF8String untouched — no String materialization, no
  * Normalizer call. Non-ASCII falls back to `isNormalized` (cheap
  * quick-check pass, returns input if already composed) before paying
  * for the rewrite. Null in → null out.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize needs a string input, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.evalImpl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.evalImpl($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  // evalImpl, not eval — see NormalizedMd5's companion note.
  def evalImpl(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Occurrence-indexed character q-grams — the join key of the q-gram
  * count filter for edit-distance joins (Gravano et al., VLDB 2001:
  * `ed(s,t) <= k` implies the q-gram multisets share at least
  * `max(|s|,|t|) - q + 1 - k*q` elements). Returns `array<string>`
  * of `gram \\u0001 decimalOccurrenceIndex`: tagging the i-th
  * occurrence of a
  * repeated gram makes a plain equi-join count
  * `min(mult_s(g), mult_t(g))` matches per gram — the multiset
  * intersection — without positional bookkeeping. Grams are built over
  * UTF-16 code units (deterministic for any input; the keys are only
  * ever compared for equality). Strings shorter than `q` return an
  * empty array; null in → null out.
  *
  * Scale: row-local and codegen'd; the expensive part of the fuzzy
  * join is never this expansion but the gram-key shuffle it feeds
  * (see [[graft.ops.Fuzzy]] for the skew valve).
  */
case class QGramsWithOcc(child: Expression, q: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType] && q >= 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"q_grams_occ needs (string, q>=1), got ${child.dataType.catalogString}, q=$q")

  override def nullSafeEval(input: Any): Any =
    QGramsWithOcc.evalImpl(input.asInstanceOf[UTF8String], q)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.QGramsWithOcc.evalImpl($c, $q);")

  override protected def withNewChildInternal(newChild: Expression): QGramsWithOcc =
    copy(child = newChild)
  override def prettyName: String = "q_grams_occ"
}

object QGramsWithOcc {
  // evalImpl, not eval — see NormalizedMd5's companion note.
  def evalImpl(s: UTF8String, q: Int): ArrayData = {
    val str = s.toString
    val n = str.length - q + 1
    if (n <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashMap[String, Integer](n * 2)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val gram = str.substring(i, i + q)
      val occ: Int = seen.merge(gram, 1, (a, b) => a + b) - 1
      out(i) = UTF8String.fromString(gram + "\u0001" + occ)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
