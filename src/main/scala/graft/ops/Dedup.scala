package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket join),
  * SimHash, and n-gram Jaccard verification.
  *
  * Scale design (100 TB posture): every stage is a keyed shuffle —
  * shingles explode locally, signatures reduce with map-side partial
  * aggregation, candidate generation joins on band hash (only docs
  * sharing a bucket ever meet), and Jaccard verification runs only on
  * blocked/candidate pairs, never all-pairs. Hashes are md5-based so the
  * DuckDB oracle reproduces signatures exactly.
  */
object Dedup {

  // -------------------------------------------------------------- exact
  /** Exact dedup: group by normalized-text fingerprint; keeper = min id.
    * One hash shuffle on the fingerprint (reference A7-analogue for
    * documents).
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup — the daily-snapshot shape: dedup a NEW
    * batch against the fingerprint history of everything already
    * ingested, without touching the historical documents themselves.
    * Returns every new row with its fingerprint and a 0/1 `kept` flag:
    * kept = the fingerprint is unseen in history AND this row is the
    * batch's keeper (min id) for it. Append `kept=1` fingerprints to the
    * history table afterwards and the invariant (one surviving doc per
    * fingerprint across all batches) holds forever.
    *
    * Scale: history is touched only as a fingerprint column (16-byte
    * md5s, not documents); the join is keyed on the fingerprint hash —
    * uniformly distributed by construction, no skew — and the
    * within-batch keeper choice is one keyed argmin. At 100 TB the
    * history fingerprint table is the thing you bucket
    * ([[graft.transform.Transforms.writeBucketed]]) so daily runs join
    * exchange-free.
    */
  def incrementalExactDedup(
      newDocs: DataFrame, knownFingerprints: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val fp = newDocs.select(col(idCol),
      TextAnalysis.fingerprintMd5(col(textCol)).as("fingerprint"))
    val keeper = fp.groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("__keeper"))
    val known = knownFingerprints.select(col("fingerprint")).distinct()
      .withColumn("__seen", lit(1L))
    fp.join(keeper, "fingerprint")
      .join(known, Seq("fingerprint"), "left")
      .select(col(idCol), col("fingerprint"),
        (col("__seen").isNull && col(idCol) === col("__keeper"))
          .cast("long").as("kept"))
  }

  /** Corpus-level duplicate-passage audit — the CCNet/"repeated
    * passage" boilerplate screen, adapted to whitespace-token docs:
    * each document is cut into consecutive stride-`window` token
    * windows ("passages"); a passage is boilerplate when its exact
    * text occurs at least `minCount` times corpus-WIDE (q38's
    * repetition score is intra-doc; this is the cross-doc companion
    * that catches headers/footers/licenses shared between documents).
    * Returns one row per doc: `(idCol, n_windows, n_dup_windows)`.
    *
    * Scale (100 TB): passages never shuffle as text — each window
    * reduces to a 60-bit md5-prefix fingerprint (8-byte shuffle key,
    * replayable in SQL as `('0x'||substr(md5(p),1,15))::BIGINT`), and
    * the corpus count aggregates per (doc, fp) FIRST (map-side
    * partials bound a firehose passage: a boilerplate string appearing
    * in every doc contributes one row per doc, not per occurrence,
    * to the global count agg). The count join-back is fp-keyed and
    * 1:1 on the totals side, so a hot fingerprint fans out to its
    * per-doc rows only — no pair explosion anywhere. No windows.
    */
  def duplicatePassages(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8, minCount: Long = 2L): DataFrame = {
    require(window >= 1, "duplicatePassages needs a positive window")
    require(minCount >= 2, "minCount < 2 marks every passage duplicated")
    // whitespace-only docs emit NO passages (split of "" yields [""],
    // which would otherwise count as one empty-string window and make
    // blank docs mark each other 100% boilerplate); window count is
    // materialized BEFORE the explode: explode(sequence) cannot
    // consume a lateral alias from the same select
    val toks = df.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), split(trim(col(textCol)), "\\s+").as("__t"))
      .withColumn("__nw", expr(s"(size(__t) + ${window - 1}) div $window"))
    val fps = toks
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0L), col("__nw") - 1)).as("__i"))
      .select(col(idCol),
        conv(substring(md5(concat_ws(" ",
          slice(col("__t"), (col("__i") * window + 1).cast("int"),
            lit(window)))), 1, 15), 16, 10).cast("long").as("fp"))
    val perDoc = fps.groupBy(col(idCol), col("fp"))
      .agg(count(lit(1)).as("__k"))
    val totals = perDoc.groupBy(col("fp")).agg(sum(col("__k")).as("__c"))
    perDoc.join(totals, Seq("fp"))
      .groupBy(col(idCol))
      .agg(sum(col("__k")).as("n_windows"),
        sum(when(col("__c") >= minCount, col("__k")).otherwise(0L))
          .as("n_dup_windows"))
  }

  // -------------------------------------------------------------- shingles
  /** Word n-gram shingles of the whitespace tokens; docs with fewer than
    * `n` tokens produce no shingles.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.functions.word_shingles(text, n)

  /** (id, shingle) exploded + deduped per doc — the set representation
    * Jaccard is defined over.
    */
  def shingleSet(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    shingleBag(df, idCol, textCol, n).distinct()

  /** (id, shingle) exploded WITHOUT set-dedup. MinHash consumes this
    * directly: `min(md5(...))` is multiplicity-invariant, so skipping the
    * distinct saves a full shuffle on the widest intermediate.
    */
  def shingleBag(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol), explode(shingles(col(textCol), n)).as("shingle"))

  // -------------------------------------------------------------- minhash
  /** MinHash signature: for each of `numHashes` hash functions, the
    * minimum hash value over the doc's shingle set. Hex-string min of an
    * md5-derived chunk is a valid uniform min-hash and is
    * engine-portable.
    *
    * Accepts a bag (duplicates fine -- min is multiplicity-invariant, so
    * no distinct shuffle). Hash economy: instead of one salted md5 per
    * hash function (numHashes x |shingles| digests), two md5s per shingle
    * are sliced into four 32-bit hex chunks each -- 8 independent
    * min-hash functions from 2 digests, a 4x cut in the dominant hashing
    * cost. One groupBy shuffle of narrow (id, 2 x md5) rows with map-side
    * partial min.
    *
    * (A per-row `array_min(transform(...))` formulation with zero
    * shuffles was tried and is ~10x SLOWER: ProjectCollapsing inlines the
    * shingle-array construction into every one of the 8 signature
    * expressions, and higher-order functions evaluate interpreted.)
    */
  def minhashSignatures(
      shingleBag: DataFrame, idCol: String, numHashes: Int = 8): DataFrame = {
    require(numHashes <= 8, "8 hash functions per 2 md5 digests supported")
    val hashed = shingleBag.select(col(idCol),
      md5(col("shingle")).as("h1"), md5(concat(lit("~"), col("shingle"))).as("h2"))
    val aggs = (0 until numHashes).map { k =>
      val src = if (k < 4) col("h1") else col("h2")
      min(substring(src, (k % 4) * 8 + 1, 8)).as(s"mh$k")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: group `rowsPerBand` consecutive minhashes, hash each
    * band → (id, band_idx, band_hash) rows. Docs sharing any band hash
    * are candidate near-duplicates.
    */
  def lshBands(
      signatures: DataFrame, idCol: String,
      numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val bands = (0 until numHashes / rowsPerBand).map { b =>
      val cols = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band_idx"), md5(concat(cols: _*)).as("band_hash"))
    }
    signatures.select(col(idCol), explode(array(bands: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate pairs: self-join on (band_idx, band_hash), `a < b`,
    * distinct. The join key is the band hash, so only same-bucket docs
    * shuffle together — the core of LSH's sub-quadratic scaling.
    */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("a"), col("band_idx"), col("band_hash"))
    val b = bands.select(col(idCol).as("b"), col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Row-local minhash signatures via the fused codegen
    * [[graft.functions.MinHashSigs]] expression: one pass over each doc,
    * no exploded shingle bag, NO shuffle — the widest stage of the
    * aggregation formulation ([[minhashSignatures]]) disappears. Output
    * schema and values are identical (FunctionsSpec pins it); docs
    * with no shingles are dropped, exactly as the groupBy dropped them.
    */
  def minhashSignaturesFused(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8): DataFrame = {
    require(numHashes <= 8, "8 hash functions per 2 md5 digests supported")
    df.select(col(idCol),
      graft.functions.functions.minhash_sigs(col(textCol), shingleN).as("__mh"))
      .filter(col("__mh").isNotNull)
      .select(col(idCol) +:
        (0 until numHashes).map(k => col("__mh").getItem(k).as(s"mh$k")): _*)
  }

  /** Full MinHash-LSH near-dup pipeline: text → signatures (fused,
    * row-local) → bands → candidate pairs. The only shuffles left are
    * the narrow (id, band_hash) self-join and the final distinct.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame =
    candidatePairs(
      lshBands(
        minhashSignaturesFused(df, idCol, textCol, shingleN, numHashes),
        idCol, numHashes, rowsPerBand),
      idCol)

  // -------------------------------------------------------------- blocking
  /** Deterministically cap a blocking key's membership: keep only the
    * first `cap` rows per block by ascending `idCol` (two-phase salted
    * ranking, [[graft.transform.Skew.saltedTopK]] — narrow (block, id)
    * rows, no reducer sees more than one hash bucket of one block).
    * Pair generation over a block is O(B²); an uncapped dominant block
    * melts the downstream no matter how the join is salted, so bound B
    * before the self-join. The min-id convention is engine-portable (a
    * SQL oracle replays it with `row_number()`), and stable under
    * reruns.
    *
    * `logDropped = true` runs one extra count job and warns with the
    * number of rows truncated away — turn it on when auditing coverage;
    * leave it off in benchmarked/production paths (the cap itself is
    * free of extra jobs).
    */
  def capBlocks(df: DataFrame, blockCol: String, idCol: String, cap: Int,
      logDropped: Boolean = false, numSalts: Int = 16): DataFrame = {
    require(cap > 1, "cap must be > 1 (a block of one generates no pairs)")
    // two-phase salted ranking: a plain per-block window would funnel
    // the dominant block through one reducer — the very hotspot the cap
    // exists to prevent
    val capped = graft.transform.Skew.saltedTopK(
      df, Seq(col(blockCol)), Seq(col(idCol).asc), saltCol = col(idCol),
      k = cap, numSalts = numSalts, rankCol = "__rn", castRankTo = None)
      .drop("__rn")
    if (logDropped) {
      val dropped = df.count() - capped.count()
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"capBlocks($blockCol, cap=$cap): dropped $dropped rows from oversized blocks")
    }
    capped
  }

  /** [[capBlocks]] for the common DISTINCT two-column shape (rows
    * unique per (block, id) — every co-occurrence/edge-build call
    * site): the ≤`cap` lowest ids per block via the mergeable
    * bounded-heap cut ([[graft.transform.Skew.aggTopK]], r21) instead
    * of the two-phase salted windows — one aggregation whose map-side
    * heaps never let a hot block's rows reach a reducer at all, and
    * ~half the shuffle passes. Same min-id convention, byte-identical
    * output (CorpusSpec pins equality with [[capBlocks]]); inputs with
    * duplicate (block, id) rows or payload columns must keep using
    * [[capBlocks]] — duplicates are NOT collapsed here (the bounded heap
    * keeps equal entries, so duplicate (block, id) rows would consume
    * cap slots and emit duplicate ranked rows); the contract simply
    * requires unique (block, id) inputs.
    */
  def capBlocksDistinct(df: DataFrame, blockCol: String, idCol: String,
      cap: Int): DataFrame = {
    require(cap > 1, "cap must be > 1 (a block of one generates no pairs)")
    graft.transform.Skew.aggTopK(df.select(col(blockCol), col(idCol)),
      Seq(col(blockCol)), org.apache.spark.sql.functions.struct(
        col(idCol).as(idCol)), cap, rankCol = "__rn", castRankTo = None)
      .select(col(blockCol), col(idCol))
  }

  /** Within-block pair generation over CAPPED blocks, join-free (r22):
    * instead of materializing the ≤`cap` lowest ids per block as rows
    * and self-joining on the block key (two shuffles of the capped
    * stream + the pair distinct), aggregate each block straight into
    * its sorted id ARRAY via the bounded heap
    * ([[graft.transform.Skew.aggTopKArray]]) and emit every i<j pair
    * ROW-LOCALLY: posexplode picks the lower element, `slice(arr,
    * pos+2, size(arr))` explodes exactly the elements AFTER it — the
    * ascending sort makes that precisely the `a < b` convention of the
    * capped self-join, with no join key and no shuffle between the cap
    * and the pairs. (`slice` is a codegen expression — no interpreted
    * higher-order lambda, the r21-rejected variant's flaw.) Output:
    * (blockCol, src, dst) with src < dst, one row per (block, pair) —
    * callers `.distinct()` across blocks or `groupBy(src, dst).count`
    * exactly as they did after the self-join. Equality with
    * capBlocksDistinct + self-join is pinned by OpsSpec and by the
    * q93/q95/q96/q204/q212 oracle hashes (spelled as the naive window
    * cap + self-join).
    */
  def cappedBlockPairs(df: DataFrame, blockCol: String, idCol: String,
      cap: Int): DataFrame = {
    require(cap > 1, "cap must be > 1 (a block of one generates no pairs)")
    graft.transform.Skew.aggTopKArray(df.select(col(blockCol), col(idCol)),
        Seq(col(blockCol)), col(idCol), cap, outCol = "__blk")
      .select(col(blockCol), posexplode(col("__blk")).as(Seq("__pos", "src")),
        col("__blk"))
      .select(col(blockCol), col("src"),
        explode(slice(col("__blk"), col("__pos") + lit(2),
          size(col("__blk")))).as("dst"))
  }

  // -------------------------------------------------------------- jaccard
  /** Exact n-gram Jaccard for a given set of pairs (blocked upstream —
    * never call on an unblocked cross product at scale). `pairs` has
    * columns (a, b); result adds intersection/union sizes and the
    * similarity.
    */
  def ngramJaccard(
      pairs: DataFrame, shingleSet: DataFrame, idCol: String): DataFrame =
    ngramJaccardWithSizes(pairs, shingleSet,
      shingleSet.groupBy(col(idCol)).agg(count(lit(1)).as("sz")), idCol)

  /** [[ngramJaccard]] with the per-doc set sizes PRECOMPUTED — the
    * incremental-state shape: an increment pipeline persists each doc's
    * shingle count ONCE when the doc's postings are appended, so later
    * batches never re-aggregate the accumulated posting table just to
    * recover sizes (the O(corpus)-per-arrival trap, VERDICT r12 #1).
    * `sizes` must have columns (idCol, sz) covering every id in
    * `pairs`; the inner joins make missing ids drop their pairs, so an
    * incomplete sizes frame fails loudly in the hash gate rather than
    * silently zeroing.
    */
  def ngramJaccardWithSizes(
      pairs: DataFrame, shingleSet: DataFrame, sizes: DataFrame,
      idCol: String): DataFrame = {
    val sa = shingleSet.select(col(idCol).as("a"), col("shingle"))
    val sb = shingleSet.select(col(idCol).as("b"), col("shingle"))
    val common = pairs
      .join(sa, "a").join(sb, Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
    pairs
      .join(common, Seq("a", "b"), "left")
      .na.fill(0L, Seq("n_common"))
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sz_a")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("sz_b")), "b")
      .withColumn("jaccard",
        graft.util.Rounding.pround(col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")), 6))
      .select("a", "b", "n_common", "sz_a", "sz_b", "jaccard")
  }

  /** Exact n-gram Jaccard over per-doc shingle ARRAYS — the
    * CANDIDATE-SCALE verification formulation (r22): aggregate the
    * (candidate-pruned) posting rows into one array + size per doc,
    * attach both sides' arrays to the pairs through two id-keyed joins,
    * and compute `n_common = size(array_intersect(...))` ROW-LOCALLY.
    * Versus [[ngramJaccardWithSizes]]'s explode-intersection join this
    * removes the (id, shingle)-keyed shuffle of the posting stream, the
    * (a,b) re-aggregation, and the two sizes joins (~10 stages → ~3 at
    * increment scale, where fixed per-stage cost dominates), and it has
    * no shingle join key at all — a stopword shingle shared by every
    * candidate can't create a hot reducer. Identical output by
    * construction: inputs are distinct per (id, shingle), so
    * array_intersect's set semantics give the same n_common; sizes come
    * from the same aggregation; pairs with no common shingles emit
    * jaccard 0 through the same inner-join survival rule (a doc with no
    * postings row drops its pairs, exactly as a missing sizes row did).
    *
    * Scale contract: `shingleSet` must be CANDIDATE-pruned (or
    * otherwise bounded) — per-doc arrays are doc-length-bounded, but
    * collecting arrays for a full 100 TB corpus is the wrong shape;
    * corpus-scale verification keeps [[ngramJaccardWithSizes]].
    */
  def ngramJaccardArrays(
      pairs: DataFrame, shingleSet: DataFrame, idCol: String): DataFrame = {
    val pp = shingleSet.groupBy(col(idCol))
      .agg(collect_list(col("shingle")).as("__sh"), count(lit(1)).as("__sz"))
    pairs
      .join(pp.select(col(idCol).as("a"), col("__sh").as("__sha"),
        col("__sz").as("sz_a")), "a")
      .join(pp.select(col(idCol).as("b"), col("__sh").as("__shb"),
        col("__sz").as("sz_b")), "b")
      .withColumn("n_common",
        size(array_intersect(col("__sha"), col("__shb"))).cast("long"))
      .withColumn("jaccard",
        graft.util.Rounding.pround(col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")), 6))
      .select("a", "b", "n_common", "sz_a", "sz_b", "jaccard")
  }

  /** Shingle-set CONTAINMENT verify — the asymmetric companion to
    * [[ngramJaccard]]: `cont_a = |A∩B|/|A|` and `cont_b = |A∩B|/|B|`.
    * Jaccard misses the crawl pathology where one document IS another
    * plus boilerplate (|A∩B|/|A∪B| stays low when |B| ≫ |A|);
    * containment flags it from either side. The `subset_flag` is an
    * exact INTEGER comparison (`10·|A∩B| ≥ 9·min(|A|,|B|)` — a ≥0.9
    * threshold with no float in the decision), so the gate pins the
    * drop decision, not just the scores. Same candidate/intersection
    * plan shape (and scale posture) as [[ngramJaccard]].
    */
  def ngramContainment(
      pairs: DataFrame, shingleSet: DataFrame, idCol: String): DataFrame = {
    val sizes = shingleSet.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val sa = shingleSet.select(col(idCol).as("a"), col("shingle"))
    val sb = shingleSet.select(col(idCol).as("b"), col("shingle"))
    val common = pairs
      .join(sa, "a").join(sb, Seq("b", "shingle"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_common"))
    pairs
      .join(common, Seq("a", "b"), "left")
      .na.fill(0L, Seq("n_common"))
      .join(sizes.select(col(idCol).as("a"), col("sz").as("sz_a")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("sz_b")), "b")
      .select(col("a"), col("b"), col("n_common"), col("sz_a"), col("sz_b"),
        (col("n_common").cast("double") / col("sz_a").cast("double"))
          .as("cont_a"),
        (col("n_common").cast("double") / col("sz_b").cast("double"))
          .as("cont_b"),
        (col("n_common") * 10L >= least(col("sz_a"), col("sz_b")) * 9L)
          .cast("long").as("subset_flag"))
  }

  // -------------------------------------------------------------- decontamination
  /** Benchmark decontamination: per training document, the number of its
    * distinct word n-grams that also appear anywhere in the holdout
    * (eval/benchmark) corpus — the n-gram-collision test-set-leak gate
    * used by large-pretraining pipelines. Returns every training row with
    * `n_overlap` and a 0/1 `contaminated` flag (as long — portable for
    * the oracle compare); downstream drops or audits flagged docs.
    *
    * Scale: the holdout n-gram set is tiny next to the training corpus
    * (benchmarks are small by definition) — it is deduped and BROADCAST,
    * so training shingles never shuffle: explode, map-side hash-join
    * against the broadcast set, partial-agg counts per doc. O(train)
    * scan, no train-side wide shuffle.
    */
  def decontaminationOverlap(
      train: DataFrame, holdout: DataFrame,
      idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val holdGrams = shingleSet(holdout, idCol, textCol, n)
      .select(col("shingle")).distinct()
    val overlap = shingleSet(train, idCol, textCol, n)
      .join(broadcast(holdGrams), "shingle")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  /** Bloom-filter decontamination — the scale valve for
    * [[decontaminationOverlap]] when the holdout n-gram set outgrows a
    * comfortable exact-set broadcast (the exact set of a large benchmark
    * suite can run to GBs of strings; the filter is `numBits` bytes
    * regardless of gram count — sized by the bit budget, not the data). Same output schema; `n_overlap` becomes an UPPER BOUND
    * (false positives inflate it at rate ~(1-e^(-kn/m))^k) and
    * `contaminated` a conservative superset — zero false NEGATIVES, so
    * no leaked document ever slips through; some clean ones are
    * over-flagged. Pair it with the exact path on the flagged subset for
    * a two-phase exact gate at scale.
    *
    * Mechanics — everything stays inside built-in codegen expressions:
    * each holdout gram sets `numHashes` bits (`xxhash64(seed, gram) mod
    * numBits`); bit positions reduce executor-side to ≤ numBits/64
    * (word-index, OR-mask) rows before the driver assembles the word
    * array — the collect is bounded by the filter size, never the gram
    * count. Training grams then probe the filter as a broadcast array
    * literal via `element_at` + `shiftrightunsigned` — row-local,
    * whole-stage-codegen, no join at all (the exact path's broadcast
    * hash join disappears; probing is pure projection).
    */
  def decontaminationOverlapBloom(
      train: DataFrame, holdout: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    require(numBits % 64 == 0, "numBits must be a multiple of 64")
    require(numHashes >= 1, "need at least one hash function")
    val numWords = numBits / 64
    def posSql(seed: Int): String =
      s"pmod(xxhash64($seed, shingle), ${numBits}L)"
    // holdout grams -> bit positions -> per-word OR-reduced masks
    val positions = shingleSet(holdout, idCol, textCol, n)
      .select(explode(array((0 until numHashes).map(s =>
        expr(posSql(s))): _*)).as("pos"))
      .select(expr("pos div 64").as("word"),
        expr("shiftleft(1L, int(pos % 64))").as("mask"))
      .groupBy(col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
      .collect()
    val words = Array.ofDim[Long](numWords)
    positions.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    // Ship the filter as one boolean per bit (numBits bytes, 8x the
    // packed words — still filter-sized, never gram-sized) so the probe
    // is a single `element_at` per hash function: a packed-word probe
    // needs the position subtree twice (word index + bit index), and
    // FilterExec does NOT common-subexpression-eliminate, which would
    // silently double the per-shingle hash cost of the hot path.
    val bits = Array.tabulate(numBits)(i => (words(i / 64) >>> (i % 64) & 1L) == 1L)
    val mightContain: Column =
      (0 until numHashes).map { s =>
        expr(s"element_at(__bf, int(${posSql(s)}) + 1)")
      }.reduce(_ && _)
    val overlap = shingleSet(train, idCol, textCol, n)
      .withColumn("__bf", typedLit(bits))
      .filter(mightContain)
      .drop("__bf")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol))
      .join(overlap, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).cast("long").as("contaminated"))
  }

  // -------------------------------------------------------------- clusters
  /** Connected components over a candidate-pair graph (columns `a`, `b`):
    * assigns every node appearing in a pair the minimum node id reachable
    * from it — the canonical "dedup cluster" id that turns LSH pairs into
    * keep-one-per-cluster decisions. Returns (node, component).
    *
    * Algorithm: min-label propagation with pointer doubling — each round
    * every node takes the min of its own label, its neighbors' labels,
    * and its label's label (`comp(comp(node))`, the path-halving jump
    * that makes long chains converge in O(log diameter) rounds instead
    * of O(diameter)); converged when no label decreases. Each round is
    * two equi-joins + one groupBy-min on the pair set — no driver-side
    * data, scales with the candidate pairs, not the corpus.
    *
    * Lineage is truncated each round (iterative-DataFrame standard
    * practice). By default that uses `localCheckpoint`, whose blocks
    * live on executors — fast, but a single lost executor after round k
    * fails the job unrecoverably (the lineage needed to recompute is
    * gone). On a real cluster under executor churn pass
    * `reliableCheckpointDir` (an HDFS/object-store path, unique per
    * clustering run): each round's labels are then snapshotted as
    * parquet under it and read back — fault-tolerant lineage truncation
    * with no session-global `setCheckpointDir` mutation — and round
    * k-1's snapshot is deleted as soon as round k lands, so the
    * directory holds at most two label snapshots at any time. The final
    * round's snapshot backs the RETURNED DataFrame: delete the
    * directory only when done with the result. On the local path each
    * round runs ONE job (the convergence probe materializes the lazy
    * checkpoint); the reliable path adds the snapshot-write job. The
    * probe exploits
    * monotonicity: every label only ever decreases (neighborMin folds
    * the node's own label in; pointer doubling uses `least`), and the
    * node set is fixed, so `sum(comp)` is strictly decreasing until the
    * fixpoint — comparing one DECIMAL aggregate per round replaces a
    * join against the previous labels.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
      reliableCheckpointDir: Option[String] = None,
      smallGraphThreshold: Long = 0L,
      loopShufflePartitions: Int = 0): DataFrame = {
    // Small-graph valve (opt-in): the candidate-pair graph is OUTPUT-
    // scale (it holds near-duplicates, not the corpus), so it routinely
    // fits the driver even when the corpus is 100 TB. Below the
    // threshold a local union-find (O(E α(E)), one job to collect, no
    // iteration) replaces O(log d) distributed rounds — the same
    // economics as a broadcast join's build side, with the same explicit
    // size bound. Default 0 keeps the distributed path authoritative.
    if (smallGraphThreshold > 0) {
      val cached = pairs.select(col("a"), col("b")).persist()
      // threshold probe bounded by the threshold itself, not the graph:
      // an over-threshold graph must not pay a full count before falling
      // through to the distributed path
      val probeCap = math.min(smallGraphThreshold, Int.MaxValue - 1L).toInt
      val n = cached.limit(probeCap + 1).count()
      if (n <= smallGraphThreshold) {
        val spark = pairs.sparkSession
        val edges = cached.collect().map(r => (r.getLong(0), r.getLong(1)))
        cached.unpersist()
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        // iterative find (walk to root, then compress): recursion depth
        // equals chain length, which at valve scale overflows the stack
        def find(x: Long): Long = {
          var root = x
          while (parent.getOrElseUpdate(root, root) != root) root = parent(root)
          var cur = x
          while (parent(cur) != root) { val next = parent(cur); parent(cur) = root; cur = next }
          root
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        import spark.implicits._
        return parent.keys.toSeq.map(k => (k, find(k))).toDF("node", "comp")
      }
      cached.unpersist() // over threshold: fall through to the real path
    }
    // loop-scoped shuffle-partition reduction (see Graph.pagerank's
    // note): label frames are node-scale, and every round's convergence
    // probe executes inside the scope; the returned labels are already
    // materialized (checkpointed/parquet-backed), so no extra eager
    // step is needed here
    val sess = pairs.sparkSession
    val prevParts = if (loopShufflePartitions > 0)
      Some(sess.conf.get("spark.sql.shuffle.partitions")) else None
    if (loopShufflePartitions > 0)
      sess.conf.set("spark.sql.shuffle.partitions", loopShufflePartitions)
    try {
    var round = 0
    def snap(df: DataFrame): DataFrame = reliableCheckpointDir match {
      // LAZY local checkpoint: the convergence probe that always follows
      // a snap is the materializing action, so each round runs ONE job
      // (probe+materialize fused) instead of two — the lineage is
      // truncated at first computation either way. (The reliable path
      // keeps its two jobs: the parquet write IS the snapshot.)
      case None => df.localCheckpoint(false)
      case Some(base) =>
        val spark = df.sparkSession
        val path = s"$base/cc-round-$round"
        df.write.mode("overwrite").parquet(path)
        if (round > 0) { // round k-1 is unreferenced once round k lands
          val prev = new org.apache.hadoop.fs.Path(s"$base/cc-round-${round - 1}")
          prev.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(prev, true)
        }
        round += 1
        spark.read.parquet(path)
    }
    val edges = pairs.select(col("a").as("x"), col("b").as("y"))
      .union(pairs.select(col("b").as("x"), col("a").as("y")))
      .persist()
    // Seed labels at least(node, min neighbor) — exactly what round 1's
    // propagate+min produces over the identity labeling, but as a single
    // groupBy of the edge list with no join: one full round saved.
    var labels = snap(edges
      .groupBy(col("x")).agg(min(col("y")).as("__mn"))
      .select(col("x").as("node"), least(col("x"), col("__mn")).as("comp")))
    // DECIMAL(38,0) keeps the label sum exact far beyond long range
    // (billions of 2^63-scale ids); null on an empty graph
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("comp").cast("decimal(38,0)")))
        .head().getDecimal(0))
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = prevSum.isEmpty // empty graph: nothing to propagate
    while (!converged && iter < maxIter) {
      val prop = edges.join(labels.withColumnRenamed("node", "x"), "x")
        .select(col("y").as("node"), col("comp"))
      val neighborMin = labels.union(prop)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
      // pointer doubling: follow the label one more hop (labels are node
      // ids, so comp resolves against the same table; comp(c) <= c by
      // construction, so least() only ever improves)
      val next = snap(neighborMin
        .join(neighborMin.select(col("node").as("comp"), col("comp").as("comp2")),
          Seq("comp"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("comp2"), col("comp"))).as("comp")))
      val curSum = labelSum(next)
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      iter += 1
    }
    edges.unpersist()
    require(converged,
      s"connectedComponents did not converge within $maxIter rounds " +
        "(graph diameter exceeds maxIter — raise it)")
    labels
    } finally prevParts.foreach(p =>
      sess.conf.set("spark.sql.shuffle.partitions", p))
  }

  // -------------------------------------------------------------- simhash
  /** 16-bit SimHash from md5 hex digits: bit b of a token's hash is
    * (hex digit b >= '8'); the doc bit is the sign of the token-count
    * weighted sum. Engine-portable; the 64-bit production variant is the
    * custom codegen expression [[graft.functions.SimHash64]].
    */
  /** Incremental near-dup dedup — the crawl-increment workflow: dedup a
    * NEW batch against an already-indexed corpus without recomputing the
    * corpus. The index side enters only as its persisted LSH band table
    * (`(band_idx, band_hash)` — 16-byte hashes, never the documents), so
    * a 100 TB corpus costs one hash-table-sized scan per increment; the
    * batch computes row-local fused signatures and joins on the uniform
    * md5 band key (no skew by construction).
    *
    * Survivor rule (one-pass, no CC — the increment analogue of
    * [[incrementalExactDedup]]'s min-id keeper): a batch doc is
    * `dup_of_index` if any band collides with the index,
    * `dup_in_batch` if any band collides with a SMALLER-id batch doc
    * (the greedy prefix-survivor rule — deterministic, replayable, and
    * exactly the order-of-arrival semantics of a streaming increment);
    * kept = neither.
    */
  def incrementalLshDedup(batch: DataFrame, indexBands: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 8,
      rowsPerBand: Int = 2): DataFrame =
    incrementalLshDedupBands(
      lshBands(
        minhashSignaturesFused(batch, idCol, textCol, shingleN, numHashes),
        idCol, numHashes, rowsPerBand),
      indexBands, batch.select(col(idCol)), idCol)

  /** [[incrementalLshDedup]] with the batch's band table precomputed —
    * the production shape: bands are the thing an increment PERSISTS
    * (they become the next increment's index side), so computing them
    * once and feeding both the dedup decision and the index append
    * avoids a second signature pass over the batch text.
    */
  def incrementalLshDedupBands(newBands: DataFrame, indexBands: DataFrame,
      batchIds: DataFrame, idCol: String): DataFrame = {
    val idxHits = newBands
      .join(indexBands.select(col("band_idx"), col("band_hash")).distinct(),
        Seq("band_idx", "band_hash"))
      .select(col(idCol)).distinct()
      .withColumn("__idx", lit(1L))
    val batchHits = candidatePairs(newBands, idCol)
      .select(col("b").as(idCol)).distinct()
      .withColumn("__bat", lit(1L))
    batchIds
      .join(idxHits, Seq(idCol), "left")
      .join(batchHits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__idx"), lit(0L)).as("dup_of_index"),
        coalesce(col("__bat"), lit(0L)).as("dup_in_batch"),
        when(col("__idx").isNull && col("__bat").isNull, 1L).otherwise(0L)
          .as("kept"))
  }

  /** Leakage-safe train/val/test split: assign each document's near-dup
    * CLUSTER (not the document) to a split, so no near-duplicate pair
    * ever straddles train and eval — the standard guard against
    * train/test contamination that a plain per-doc hash split
    * ([[Corpus.hashSplit]]) cannot give. Cluster labels come from the
    * same minhash-LSH → connected-components chain as the dedup-cluster
    * operator; singletons (docs in no near-dup pair) are their own
    * cluster. The split rule is the q43 convention — first md5 hex digit
    * of the cluster id: c,d → val; e,f → test; else train (75/12.5/12.5
    * in expectation).
    *
    * Scale: the label frame is OUTPUT-scale (only docs that appear in a
    * near-dup pair), so the left join back to the corpus broadcasts in
    * practice; everything upstream rides the pinned LSH/CC plans. The
    * split is pure row-local hashing — adding corpus does not reshuffle
    * existing assignments unless a new edge merges clusters (exactly the
    * rows whose leakage status changed).
    */
  def clusterSafeSplit(df: DataFrame, idCol: String, textCol: String,
      smallGraphThreshold: Long = 1L << 20,
      loopShufflePartitions: Int = 8): DataFrame = {
    val labels = connectedComponents(
      minhashLshPairs(df, idCol, textCol),
      smallGraphThreshold = smallGraphThreshold,
      loopShufflePartitions = loopShufflePartitions)
      .select(col("node").as(idCol), col("comp").as("cluster_id"))
    df.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
      .withColumn("__h",
        substring(md5(col("cluster_id").cast("string")), 1, 1))
      .select(col(idCol), col("cluster_id"),
        when(col("__h").isin("c", "d"), "val")
          .when(col("__h").isin("e", "f"), "test")
          .otherwise("train").as("split"))
  }

  /** SimHash near-duplicate PAIRS within a Hamming radius via pigeonhole
    * banding (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for Web
    * Crawling", WWW'07 — the production simhash-dedup design; reference
    * exposes only per-doc fingerprints, `explore_features.ipynb`-style
    * batch scoring): the 64-bit [[graft.functions.SimHash64]] signature
    * splits into 4 contiguous 16-bit bands; two signatures within Hamming
    * distance ≤ 3 differ in at most 3 bit positions, so at least one of
    * the 4 bands matches EXACTLY (pigeonhole). Candidate generation is
    * therefore a self-equi-join keyed on (band_index, band_value) — only
    * docs sharing a 16-bit band bucket ever meet — and each candidate is
    * verified once with the exact `bit_count(a.sh XOR b.sh)` popcount.
    *
    * Scale: signatures are row-local codegen; the only shuffle is the
    * (band, value) bucket join; output is pair-scale. 2¹⁶ bucket values
    * per band keep random buckets tiny; a corpus whose signatures
    * collapse onto few buckets (boilerplate-dominated) routes the hot
    * buckets through [[capBlocks]] via `blockCap` — opt-in because the
    * cap is lossy, and the DEFAULT path is exact: the oracle is spelled
    * as the NAIVE all-pairs O(n²) Hamming join, so the hash gate doubles
    * as a machine-checked proof that 4×16 banding loses no pair at
    * radius 3.
    */
  def simhashHammingPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, blockCap: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16 pigeonhole banding is complete only up to Hamming radius 3")
    import graft.functions.{functions => gf}
    val sigs = df.select(col(idCol).as("id"),
      gf.simhash64(TextAnalysis.tokens(col(textCol))).as("sh"))
    hammingPairs64(sigs, "id", "sh", maxHamming, blockCap)
  }

  /** Generic 64-bit Hamming near-dup join via 4×16 pigeonhole banding
    * (Manku et al.): complete up to radius 3 — a pair within the radius
    * differs in ≤ 3 of the 4 bands, so at least one band collides
    * exactly. Works over ANY 64-bit signature column (simhash, image
    * dHash, audio fingerprint); `blockCap` is the boilerplate valve for
    * degenerate hot bands. Emits (doc_a, doc_b, hamming), doc_a < doc_b.
    */
  def hammingPairs64(sigFrame: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, blockCap: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16 pigeonhole banding is complete only up to Hamming radius 3")
    val sigs = sigFrame.select(col(idCol).as("id"), col(sigCol).as("sh"))
    val banded0 = sigs.select(col("id"), col("sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          expr(s"shiftrightunsigned(sh, ${b * 16}) & 65535").as("bv"))
      }: _*)).as("bd"))
      .select(col("id"), col("sh"), col("bd.band").as("band"),
        col("bd.bv").as("bv"))
    val banded = blockCap match {
      case Some(cap) =>
        capBlocks(banded0.withColumn("blk",
            concat_ws(":", col("band"), col("bv"))),
          "blk", "id", cap).drop("blk")
      case None => banded0
    }
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        expr("cast(bit_count(a.sh ^ b.sh) as int)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  def simhash16(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bitSums = (0 until 16).map { b =>
      sum(when(substring(col("h"), b + 1, 1)
        .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"s$b")
    }
    val sums = tok.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 16).map { b =>
      when(col(s"s$b") > 0, math.pow(2, b).toLong).otherwise(0L)
    }.reduce(_ + _)
    sums.select(col(idCol), sig.as("simhash16"))
  }

  /** Robust winnowing fingerprints (Schleimer/Wilkerson/Aiken, MOSS) —
    * the guaranteed-coverage local fingerprint selection the stride-8
    * passage screen ([[duplicatePassages]]) can't give: every window of
    * `window` consecutive n-gram hashes contributes its MINIMUM hash
    * (ties break to the RIGHTMOST position), so any shared substring of
    * ≥ `window + n − 1` tokens between two documents is certain to
    * share a fingerprint — the detection guarantee stride sampling
    * lacks. Expected density is 2/(window+1), i.e. the representation
    * is ~2× sparser than the grams while keeping the guarantee.
    *
    * Emits one row per document: `n_grams`, `n_fp` (distinct selected
    * (hash, pos) pairs), `density` (n_fp/n_grams, pround 6), and
    * `fp_min`/`fp_xor` (order-invariant integer digests of the
    * fingerprint set, so the gate pins the exact SELECTION, not just
    * its size).
    *
    * Scale: hashes are row-local codegen md5; the min-selection runs on
    * per-DOC windows (keyed by id — never a corpus sort); docs shorter
    * than one full window winnow their single partial window, so every
    * non-empty doc is covered.
    */
  /** The selection frame behind [[winnowingFingerprints]]: one row per
    * distinct selected (hash, position) per doc, plus the doc's gram
    * count. Public so span extraction ([[sharedSpans]]) and the
    * per-doc stats share one definition. */
  def winnowingSelections(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, window: Int = 4): DataFrame = {
    require(n >= 1 && window >= 2, "winnowing needs n >= 1, window >= 2")
    import org.apache.spark.sql.expressions.Window
    val grams = df
      .select(col(idCol), posexplode(shingles(col(textCol), n)).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("h"))
    val wDoc = Window.partitionBy(col(idCol))
    val wWin = Window.partitionBy(col(idCol)).orderBy(col("pos").asc)
      .rowsBetween(0, window - 1)
    grams
      .withColumn("__n", count(lit(1)).over(wDoc))
      .withColumn("__sel", min(struct(col("h"), (-col("pos")).as("np"))).over(wWin))
      // only anchors with a full window select — except pos 0, which
      // covers the whole doc when the doc is shorter than one window
      .filter(col("pos") <= greatest(col("__n") - window, lit(0L)))
      .select(col(idCol), col("__n").as("n_grams"),
        col("__sel.h").as("fp_h"), (-col("__sel.np")).as("fp_pos"))
      .distinct()
  }

  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, window: Int = 4): DataFrame = {
    val selected = winnowingSelections(df, idCol, textCol, n, window)
    selected.groupBy(col(idCol), col("n_grams"))
      .agg(count(lit(1)).as("n_fp"),
        min(col("fp_h")).as("fp_min"),
        // exact order-invariant digest of the selected set: associative
        // long sum of (h⊕pos) mod 1e9+7 — each term < 2³⁰·…, the sum
        // stays far inside int64 for any realistic doc
        sum(col("fp_h").bitwiseXOR(col("fp_pos")) % 1000000007L)
          .as("fp_digest"))
      .select(col(idCol), col("n_grams"), col("n_fp"), col("fp_min"),
        col("fp_digest"),
        graft.util.Rounding.pround(
          col("n_fp").cast("double") / col("n_grams").cast("double"), 6)
          .as("density"))
  }

  /** Maximal SHARED-SPAN extraction — the exact-substring-dedup readout
    * (Lee et al. 2022's "deduplicating training data makes LMs better"
    * concern, at winnowing granularity): for every doc pair sharing
    * winnowing fingerprints, chain the matches lying on one DIAGONAL
    * (`posA − posB` constant — the same relative alignment) with gaps
    * ≤ `window` into maximal spans, and report spans of ≥
    * `minSpanTokens` tokens with both start offsets. The winnowing
    * guarantee makes this COMPLETE for shared runs of ≥ `window+n−1`
    * tokens: every such run selects at least one common fingerprint,
    * and a long run selects one at least every `window` positions, so
    * the gap-≤-window chain reconstructs its full extent.
    *
    * Scale: candidate pairs come from a fingerprint-keyed equi join —
    * never all-pairs; boilerplate fingerprints shared by many docs are
    * capped at `maxDocsPerFp` docs (the [[capBlocks]] valve —
    * keep-min-ids, deterministic, dropped mass loggable). Islands form
    * on per-(pair, diagonal) keyed windows. Everything is exact
    * integers — the whole chain hash-gates.
    */
  def sharedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, window: Int = 4, maxDocsPerFp: Int = 8,
      minSpanTokens: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // eager checkpoint (r22): fps otherwise re-runs the winnowing pass
    // (the most CPU-expensive stage) once per consumer — the docsPerFp
    // cap chain plus BOTH sides of the diagonal self-join = 3 runs
    val fps = winnowingSelections(df, idCol, textCol, n, window)
      .select(col(idCol).as("__id"), col("fp_h"), col("fp_pos"))
      .localCheckpoint(true)
    val docsPerFp = fps.select(col("fp_h"), col("__id")).distinct()
    // distinct (block, id) shape — the heap cut applies (r22; the
    // PAYLOAD-carrying winnowing frame below still joins by key)
    val allowed = capBlocksDistinct(docsPerFp, "fp_h", "__id", maxDocsPerFp)
    val capped = fps.join(allowed, Seq("fp_h", "__id"))
    val a = capped.select(col("fp_h"), col("__id").as("doc_a"),
      col("fp_pos").as("pos_a"))
    val b = capped.select(col("fp_h"), col("__id").as("doc_b"),
      col("fp_pos").as("pos_b"))
    val matches = a.join(b, Seq("fp_h")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("pos_a") - col("pos_b")).as("diag"),
        col("pos_a"), col("pos_b"))
    val wDiag = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a").asc)
    val wRun = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pos_a").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = matches
      .withColumn("__gap",
        when(col("pos_a") - lag(col("pos_a"), 1).over(wDiag) > window, 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__gap")).over(wRun))
    islands
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("__island"))
      .agg(min(col("pos_a")).as("a_start"), max(col("pos_a")).as("__a_end"),
        min(col("pos_b")).as("b_start"), count(lit(1)).as("n_fps"))
      .select(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"),
        (col("__a_end") - col("a_start") + n).as("span_tokens"),
        col("n_fps"))
      .filter(col("span_tokens") >= minSpanTokens)
  }
}
