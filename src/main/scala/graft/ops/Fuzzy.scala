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

  /** EXACT Jaccard-threshold set-similarity self-join via prefix
    * filtering (SSJoin, Chaudhuri et al. ICDE 2006; PPJoin, Xiao et
    * al. WWW 2008) — the deterministic sibling of the MinHash+LSH path
    * (q17): same all-pairs-above-τ semantics, no probability of a
    * missed pair. Input is the set representation (one row per
    * (id, element), pre-deduped — [[Dedup.shingleSet]] for documents).
    *
    * Completeness argument: order every set's elements by GLOBAL
    * document frequency ascending (rarest first, ties by element).
    * If `J(A,B) ≥ τ = tNum/tDen` then `|A∩B| ≥ ceil(τ·|A|)`, so at
    * most `|A| − ceil(τ·|A|)` of A's elements are outside the
    * intersection and A's first `|A| − ceil(τ·|A|) + 1` elements
    * (its PREFIX) must contain an intersection element; same for B;
    * and the prefix-filtering lemma gives a SHARED element in the two
    * prefixes. Candidates therefore come from an equi-join of prefixes
    * only — the rarest elements of each set, which is what keeps the
    * join fan-out far below the full inverted index (the hot tokens
    * every document shares sort LAST and never enter a prefix unless
    * a set is nearly all-hot). `ceil(τ·n)` is `(tNum·n + tDen − 1)
    * div tDen` — integer, engine-exact.
    *
    * Verify is a keyed equi-join of candidate pairs back to the two
    * element lists, counting `|A∩B|`; the final filter
    * `(tNum+tDen)·inter ≥ tNum·(n_a+n_b)` is the threshold cleared of
    * division, and the emitted `jaccard = inter/(n_a+n_b−inter)` is
    * ONE IEEE division of exact longs — hash-gates with no rounding.
    *
    * Scale: sizes and prefix positions come from ONE id-partitioned
    * window (no size join); the df table is vocabulary-sized and
    * BROADCAST (Zipfian element key must not shuffle-join — same rule
    * as TF-IDF; `saltedDfJoin` is the web-scale-vocabulary valve). If
    * a corpus is so self-similar that even prefixes go hot (tiny
    * vocabulary, near-identical sets), the exact join's output is
    * itself quadratic — that is the signal to fall back to
    * [[Dedup.minhashLshPairs]] + clustering rather than enumerate it.
    */
  def jaccardPrefixJoin(sets0: DataFrame, idCol: String, elemCol: String,
      tNum: Int = 4, tDen: Int = 5, saltedDfJoin: Boolean = false,
      numSalts: Int = 16, reuseSets: Boolean = true,
      saltedPairGen: Boolean = false,
      hotTokenThreshold: Int = 512): DataFrame = {
    require(tNum > 0 && tDen > tNum, "threshold must be in (0,1)")
    // the set frame feeds FOUR subtrees (df counts, the ordering
    // window, and both verify joins); Spark reuses neither scans nor
    // exchanges across differently-pruned copies, so materialize it
    // once (measured 12 parquet scans + 6 explodes -> 2 + 1 on the
    // document fixture). At 100 TB pass `reuseSets = false` and hand
    // in a set table already written to storage (bucketed by id) —
    // executor memory is the wrong home for a corpus-sized frame.
    val sets =
      if (reuseSets) sets0.select(col(idCol), col(elemCol)).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else sets0
    val dfreq = sets.groupBy(col(elemCol)).agg(count(lit(1)).as("__df"))
    val joined =
      if (saltedDfJoin)
        graft.transform.Skew.saltedJoin(sets, dfreq, elemCol, numSalts)
      else sets.join(broadcast(dfreq), elemCol)
    val wId = org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))
    val ordered = joined
      .withColumn("__n", count(lit(1)).over(wId))
      .withColumn("__pos", row_number().over(
        wId.orderBy(col("__df").asc, col(elemCol).asc)))
    val prefix0 = ordered.filter(col("__pos") <=
      col("__n") - call_function("div",
        col("__n") * tNum + (tDen - 1), lit(tDen.toLong)) + 1)
      .select(col(idCol), col(elemCol), col("__n"))
    // the hot/cold routing below reads the prefix frame five times
    // (bucket sizes + two sides x two routes); materialize it once —
    // prefix-scale (~1/tDen of the set frame), same storage posture
    // and 100 TB escape hatch as `reuseSets`
    val prefix =
      if (saltedPairGen) prefix0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else prefix0
    // Candidate pair generation: a self-join keyed on the prefix
    // token. A HOT prefix token (duplicated corpora drive every
    // shingle's df up until moderately-common shingles land in many
    // docs' prefixes) funnels its whole C(m,2) pair fan-out through
    // ONE sort-merge task — the 10x ScaleSmoke measured a 43 s
    // straggler against a 0.2 s median from exactly this; AQE's skew
    // split never fires because the hot partition is INPUT-small and
    // only its pair OUTPUT is quadratic. The valve routes by token
    // frequency: tokens whose prefix bucket exceeds
    // `hotTokenThreshold` go through Skew.saltedBlockSelfJoin (id-hash
    // chunk cells — every pair meets exactly once, results provably
    // identical, the hash gate doubles as the proof); the cold
    // majority keeps the plain keyed join with zero replication, so an
    // unskewed corpus pays only one bucket-size agg and four broadcast
    // semi/anti routes (measured noise-level vs unconditional salting's
    // +80% at sf0.1). Every pair shares its token, so routing is
    // class-closed — no hot×cold pairs exist to lose.
    val pa = prefix.select(col(idCol).as("id_a"), col(elemCol),
      col("__n").as("n_a"))
    val pb = prefix.select(col(idCol).as("id_b"), col(elemCol),
      col("__n").as("n_b"))
    val paired =
      if (saltedPairGen) {
        val hot = prefix.groupBy(col(elemCol))
          .agg(count(lit(1)).as("__m"))
          .filter(col("__m") > hotTokenThreshold)
          .select(col(elemCol))
        graft.transform.Skew.saltedBlockSelfJoin(
            pa.join(broadcast(hot), Seq(elemCol), "left_semi"),
            pb.join(broadcast(hot), Seq(elemCol), "left_semi"),
            elemCol, col("id_a"), col("id_b"), numSalts)
          .unionByName(
            pa.join(broadcast(hot), Seq(elemCol), "left_anti")
              .join(pb.join(broadcast(hot), Seq(elemCol), "left_anti"),
                Seq(elemCol)))
      } else pa.join(pb, Seq(elemCol))
    val cand = paired
      .filter(col("id_a") < col("id_b") &&
        col("n_a") * tDen >= col("n_b") * tNum &&
        col("n_b") * tDen >= col("n_a") * tNum)
      .select("id_a", "id_b", "n_a", "n_b").distinct()
    val inter = cand
      .join(sets.select(col(idCol).as("id_a"), col(elemCol)), Seq("id_a"))
      .join(sets.select(col(idCol).as("id_b"), col(elemCol)),
        Seq("id_b", elemCol))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .filter(col("inter") * (tNum + tDen) >= (col("n_a") + col("n_b")) * tNum)
      .withColumn("jaccard", col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"))
  }
}
