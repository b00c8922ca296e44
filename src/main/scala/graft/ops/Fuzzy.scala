package graft.ops

import graft.functions.{functions => gf}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching: the exact edit-distance self-join, via the
  * classic filter–verify decomposition (q-gram count filtering,
  * Gravano et al., VLDB 2001). The output is EXACT — identical to the
  * brute-force all-pairs `levenshtein(a, b) <= k` join — but the plan
  * never materializes all pairs: candidates come from an equi-join on
  * occurrence-indexed q-grams, are pruned by the count filter, and only
  * survivors pay the O(|s|·|t|) verification.
  *
  * Completeness argument (what makes this gateable against a
  * brute-force oracle): if `ed(s,t) = e`, each edit operation destroys
  * at most `q` of the longer string's `len - q + 1` q-grams, so the
  * multiset intersection of their q-grams has size at least
  * `T = max(|s|,|t|) - q + 1 - k*q` when `e <= k`. The equi-join on
  * [[graft.functions.QGramsWithOcc]] keys counts exactly
  * `Σ_g min(mult_s(g), mult_t(g))` — the multiset intersection — so
  * filtering candidate pairs to `shared >= T` keeps every true pair.
  * The filter only prunes when `T >= 1`, i.e. `max(len) >= q*(k+1)`;
  * pairs where BOTH strings are shorter go through an explicit
  * brute-force short bucket (they may share zero grams yet be within
  * distance k, e.g. "ab"/"cd" at k=2). The two paths partition the
  * pair space on `max(len)`, so no overlap dedup is needed.
  *
  * Scale (100 TB posture): the only corpus-sized shuffle is the gram
  * equi-join. Gram keys over natural-language names are Zipfian — the
  * valve for a firehose gram (e.g. "th" in English) is `maxGramFreq`:
  * grams whose name frequency exceeds it are dropped from the join,
  * compensated by lowering the count threshold by the number of grams
  * dropped from each side. Dropping is budgeted per name at
  * `⌊(T_self − 1) / 2⌋` where `T_self = len − q + 1 − k·q`, which makes
  * the valve PROVABLY lossless: for any true pair, `drop_a + drop_b <=
  * T − 1`, so at least one shared gram survives to produce the join
  * match and the weakened threshold `shared >= T − drop_a − drop_b`
  * still never prunes it. The short bucket is alphabet-bounded (at
  * most |Σ|^(q·(k+1)-1) distinct strings) and plans as a broadcast
  * loop join, never a corpus-sized cartesian. The length filter
  * `|len_a - len_b| <= k` prunes both paths before any distance is
  * computed.
  */
object Fuzzy {

  /** All unordered pairs of distinct `nameCol` values within Levenshtein
    * distance `k`, as (name_a < name_b, dist). Exact: equals the
    * brute-force all-pairs join (FuzzySpec pins this property).
    *
    * @param maxGramFreq drop grams appearing in more than this many
    *   distinct names from the candidate join (budgeted per name so
    *   completeness is preserved — see the object doc); 0 disables.
    */
  def editDistancePairs(df: DataFrame, nameCol: String, k: Int, q: Int = 2,
      maxGramFreq: Long = 0L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(q >= 2, s"q must be >= 2 for the count filter, got $q")
    val shortMax = q * (k + 1) - 1 // max(len) <= shortMax ⇒ T < 1: filter can't prune

    val names = df.select(col(nameCol).cast("string").as("name"))
      .filter(col("name").isNotNull).distinct()
      .select(col("name"), length(col("name")).as("len"))

    // -------- gram path: every pair with max(len) > shortMax ----------
    val gramsAll = names
      .select(col("name"), col("len"), explode(gf.q_grams_occ(col("name"), q)).as("gram"))
    val grams =
      if (maxGramFreq <= 0L) gramsAll.withColumn("dropped", lit(0))
      else {
        // Firehose-gram valve: drop hot grams (hottest first, budgeted
        // per name at ⌊(T_self − 1)/2⌋ so losslessness is provable) and
        // weaken the count threshold by each side's dropped count.
        import org.apache.spark.sql.expressions.Window
        val hot = gramsAll.groupBy("gram")
          .agg(count(lit(1)).as("gram_df"))
          .filter(col("gram_df") > maxGramFreq)
        val tagged = gramsAll.join(broadcast(hot), Seq("gram"), "left")
        val hotRank = row_number().over(Window.partitionBy(col("name"))
          .orderBy(col("gram_df").desc_nulls_last, col("gram")))
        val budget = greatest(lit(0),
          ((col("len") - q - k * q) / 2).cast("int"))
        val marked = tagged.withColumn("is_dropped",
          col("gram_df").isNotNull && hotRank <= budget)
        val droppedPerName = marked.groupBy("name")
          .agg(sum(col("is_dropped").cast("int")).as("dropped"))
        marked.filter(!col("is_dropped"))
          .join(droppedPerName, Seq("name"))
          .select(col("name"), col("len"), col("gram"),
            col("dropped").cast("int").as("dropped"))
      }
    val a = grams.select(col("name").as("name_a"), col("len").as("len_a"),
      col("dropped").as("drop_a"), col("gram"))
    val b = grams.select(col("name").as("name_b"), col("len").as("len_b"),
      col("dropped").as("drop_b"), col("gram"))
    val gramPairs = a.join(b, Seq("gram"))
      .filter(col("name_a") < col("name_b")
        && abs(col("len_a") - col("len_b")) <= k
        && greatest(col("len_a"), col("len_b")) > shortMax)
      .groupBy("name_a", "name_b", "len_a", "len_b", "drop_a", "drop_b")
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") + col("drop_a") + col("drop_b")
        >= greatest(col("len_a"), col("len_b")) - q + 1 - k * q)
      .select(col("name_a"), col("name_b"))

    // -------- short bucket: both strings have len <= shortMax ----------
    val shorts = names.filter(col("len") <= shortMax)
    val shortPairs = shorts.select(col("name").as("name_a"), col("len").as("len_a"))
      .join(shorts.select(col("name").as("name_b"), col("len").as("len_b")),
        col("name_a") < col("name_b") && abs(col("len_a") - col("len_b")) <= k)
      .select(col("name_a"), col("name_b"))

    gramPairs.unionByName(shortPairs)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= k)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
  }
}
