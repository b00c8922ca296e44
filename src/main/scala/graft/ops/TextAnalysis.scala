package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting (whitespace + BPE-ish regex), quality
  * scoring, language ID (marker-token heuristic), and document
  * fingerprinting. All pure `functions._` expressions — codegen'd,
  * shuffle-free per row, embarrassingly parallel at 100 TB.
  *
  * Determinism note: quality components avoid transcendentals so the
  * DuckDB oracle reproduces results bitwise (double +,*,/ are IEEE-exact
  * in both engines given identical operand order).
  */
object TextAnalysis {

  /** Whitespace tokens; empty/blank text → empty array (not [""]). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and symbol runs each
    * count as one token (GPT-2-style pre-tokenizer shape, simplified to a
    * regex portable across Java regex and RE2).
    */
  val BpePattern = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** English stopword markers used for quality scoring. */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "is", "in", "to", "it")

  /** Marker-token count via the codegen [[graft.functions.CountInSet]]
    * expression (a `size(filter(toks, isin))` HOF lambda evaluates
    * interpreted per element — the repo's banned-in-hot-path pattern).
    * Multiplicity-counting, identical to the HOF formulation.
    */
  def countIn(toks: Column, words: Seq[String]): Column =
    graft.functions.functions.count_in_set(toks, words)

  /** Characters excluding spaces. */
  def charCount(text: Column): Column = length(regexp_replace(text, " ", ""))

  /** Punctuation (non-alphanumeric, non-space) character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))

  /** Mean token length in characters (0 for empty docs). */
  def avgTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0)).otherwise(charCount(text).cast("double") / n)
  }

  /** Stopword ratio over whitespace tokens (0 for empty docs). */
  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(countIn(tokens(text), StopwordsEn).cast("double") / n)
  }

  /** Punctuation ratio over characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / length(text))

  /** Composite quality score in ~[0,1]: rewards stopword presence and
    * moderate word length, penalizes punctuation soup. Linear on purpose
    * (oracle bitwise parity — no exp/log).
    */
  def qualityScore(text: Column): Column =
    graft.util.Rounding.pround(
      lit(0.5) * stopwordRatio(text)
        + lit(0.05) * least(avgTokenLength(text), lit(10.0))
        - lit(0.3) * punctRatio(text),
      4)

  /** Marker-token sets per language for the n-gram/stopword language-ID
    * heuristic. CJK script presence short-circuits to zh.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "y", "en", "que"),
    "fr" -> Seq("le", "la", "les", "et", "une"))

  /** Heuristic language ID: CJK regexp → zh; otherwise the marker set
    * with the highest hit count wins, ties broken in [[LangMarkers]]
    * order; no hits → "unknown".
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = LangMarkers.map { case (lang, markers) =>
      lang -> countIn(toks, markers)
    }
    val hasCjk = text.rlike("[\\u4e00-\\u9fff]")
    val ordered = counts.zipWithIndex.map { case ((lang, c), i) =>
      val laterCounts = counts.drop(i + 1).map(_._2)
      val geAllLater = laterCounts.foldLeft(c > 0) { (acc, o) => acc && c >= o }
      (lang, geAllLater)
    }
    ordered.foldLeft(when(hasCjk, "zh")) { case (acc, (lang, cond)) =>
      acc.when(cond, lang)
    }.otherwise("unknown")
  }

  /** PII patterns kept inside the Java-regex ∩ RE2 subset (no
    * backrefs/lookaround) so the DuckDB oracle replays redaction
    * byte-identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** PII scrubbing — emails then phone numbers replaced with typed
    * placeholder tokens. Row-local, codegen'd, the standard pre-training
    * redaction pass.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "[EMAIL]"),
      PhonePattern, "[PHONE]")

  /** Exact-dup fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Portable across engines (md5 hex). Computed by the single-pass
    * codegen [[graft.functions.NormalizedMd5]] — byte-identical to
    * `md5(lower(regexp_replace(trim(text), "\s+", " ")))` (FunctionsSpec)
    * without three regex/string materializations per row.
    */
  /** Feature hashing (the hashing trick, Weinberger et al. 2009):
    * project an unbounded vocabulary onto `dim` buckets with a SIGNED
    * md5 hash, so collisions cancel in expectation instead of biasing
    * upward. Returns the long-form sparse vector — one (bucket,
    * weight) per distinct bucket per document after the caller's
    * groupBy — via two pure columns: `featureBucket` (md5 hex 1-8 mod
    * dim) and `featureSign` (+1 if md5 hex digit 9 < '8', else −1).
    * All-integer md5 arithmetic: identical cross-engine, no vocabulary
    * state at all — THE fixed-memory featurizer at 100 TB (a vocab
    * dictionary is a corpus-sized broadcast that must be rebuilt per
    * snapshot; the hash needs nothing).
    */
  def featureBucket(token: Column, dim: Int): Column =
    conv(substring(md5(token), 1, 8), 16, 10).cast("long") % dim

  /** Signed-hash sign: +1 / −1 from the 9th md5 hex digit. */
  def featureSign(token: Column): Column =
    when(conv(substring(md5(token), 9, 1), 16, 10).cast("int") < 8, lit(1L))
      .otherwise(lit(-1L))

  def fingerprintMd5(text: Column): Column =
    graft.functions.functions.normalized_md5(text)

  /** Token-window document chunking — the RAG/embedding-pipeline
    * reshape: split each document into `chunkTokens`-token windows
    * overlapping by `overlap` tokens (stride = chunkTokens − overlap),
    * so every token appears in ≥1 chunk and chunk boundaries never cut
    * more than `overlap` tokens of context. Emits (id, chunk_id,
    * chunk_tokens, chunk_text); documents shorter than one stride
    * still yield exactly one chunk.
    *
    * Exactness: chunk count is `max(1, ceil((n − overlap)/stride))` in
    * pure integer arithmetic; chunk text is a 1-based array slice
    * (both engines clamp the final partial window) joined with single
    * spaces — byte-identical output, no float anywhere.
    *
    * Scale: entirely row-local — tokenize, count, explode the chunk
    * index range, slice. No shuffle at all; output is input-linear
    * (≤ n/stride + 1 chunks per doc). The chunk-count column is
    * materialized in a SEPARATE select before the explode —
    * `explode(sequence(...))` cannot consume a lateral alias from the
    * same projection (CLAUDE.md).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 16, overlap: Int = 4): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0,
      "need chunkTokens > overlap >= 0")
    val stride = chunkTokens - overlap
    df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("__nc",
        greatest(lit(1L), expr(s"(__n - $overlap + ${stride - 1}) div $stride")))
      .select(col(idCol), col("__t"), col("__n"),
        explode(expr("sequence(cast(0 as bigint), __nc - 1)")).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkTokens.toLong), col("__n") - col("chunk_id") * stride)
          .as("chunk_tokens"),
        concat_ws(" ", slice(col("__t"),
          (col("chunk_id") * stride + 1).cast("int"), lit(chunkTokens)))
          .as("chunk_text"))
  }
}
