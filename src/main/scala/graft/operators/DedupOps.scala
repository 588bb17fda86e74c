package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (the BASELINE.json
  * north-star surface): exact, MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: signatures are computed as per-row array expressions (no
  * explode of shingles into rows, no cross join). Candidate generation
  * shuffles only (band_id, band_hash) keys; exact verification runs on the
  * candidate pairs, whose count LSH keeps near-linear. At 100 TB the only
  * quadratic danger is a hot bucket — the banding hash is 64-bit, so buckets
  * collapse only for genuinely similar content.
  */
object DedupOps {

  /** Exact-dup flags: first doc (by `orderCol`) per content hash is kept. */
  def exactDupFlags(df: DataFrame, text: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(md5(text)).orderBy(orderCol)
    df.withColumn("is_dup", row_number().over(w) > 1)
  }

  /** MinHash signature as an array<long> of `k` values over word shingles.
    * Each shingle string is hashed ONCE; the k hash families re-hash the
    * resulting 8-byte long (k string hashes per shingle would dominate the
    * signature cost at corpus scale).
    */
  def minhashSignature(shingles: Column, k: Int): Column = {
    val hs = transform(shingles, s => xxhash64(s))
    transform(
      sequence(lit(0), lit(k - 1)),
      j => array_min(transform(hs, h => xxhash64(j, h))))
  }

  /** LSH banding: the signature split into `bands` hashed chunks. */
  def bands(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline: shingle → signature (k hashes) → band → explode bands →
    * self-join on (band index, band hash) → distinct candidate pairs →
    * exact Jaccard on shingle sets → filter by threshold.
    *
    * @return DataFrame[id_a, id_b, jaccard] with id_a < id_b.
    */
  def minhashNearDups(
      df: DataFrame, idCol: String, textCol: String,
      shingleWords: Int = 3, k: Int = 32, nBands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // widen a single-row-group scan BEFORE the two signature expressions —
    // the heaviest narrow work in the operator (identity at scale)
    val base = graft.core.Fanout.spread(
        df.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(
        col("id"),
        // hashed shingle sets for the exact-verify step (native one-pass
        // ShingleHashSet; Jaccard in hash space ≡ string space modulo 64-bit
        // collisions — same contract as ngramJaccardPairs)
        graft.expressions.GraftFunctions.shingleHashes(col("__t"), shingleWords).as("shingles"),
        // native one-pass signature (graft.expressions.MinHashSig); the HOF
        // equivalent `minhashSignature` is kept for the parity spec
        graft.expressions.GraftFunctions.minhashSig(col("__t"), shingleWords, k).as("sig"))

    // band join over bare ids — the (potentially large) shingle arrays do NOT
    // ride through the band-collision shuffle; they are re-attached only to
    // the surviving candidate pairs for exact verification
    val sigBands = base
      .select($"id", posexplode(bands($"sig", nBands, k / nBands)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
    val candidates = sigBands.alias("a")
      .join(sigBands.alias("b"), Seq("band_idx", "band_hash"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .filter($"id_a" < $"id_b")
      .dropDuplicates("id_a", "id_b")

    val shingles = base.select($"id", $"shingles")
    candidates
      .join(shingles.select($"id".as("id_a"), $"shingles".as("sh_a")), Seq("id_a"))
      .join(shingles.select($"id".as("id_b"), $"shingles".as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** 64-bit SimHash of the token stream: per bit, sign of the sum of ±1
    * contributions from each token's hash bit. Delegates to the native
    * Catalyst expression (graft.expressions.SimHash64) — single pass,
    * codegen'd; `simhashHof` is the built-in-functions-only equivalent kept
    * for the parity spec.
    */
  def simhash(text: Column): Column = graft.expressions.GraftFunctions.simhash64(text)

  def simhashHof(text: Column): Column = {
    // hash each token once; the fold's lambda variable is the 64-bit hash,
    // so the 64 bit-tests don't re-hash the token string
    val tokens = transform(split(trim(text), "\\s+"), t => xxhash64(t))
    val counts = aggregate(
      tokens,
      array_repeat(lit(0), 64),
      (acc, h) =>
        zip_with(acc, transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1).otherwise(-1)),
          (a, c) => a + c))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs: candidates share at least one of four 16-bit
    * chunks (guarantees recall for Hamming distance <= 3), verified by exact
    * Hamming distance via bit_count(xor).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NOT spread (round-20 driver record: widening regressed t08 1 s -> 3 s
    // at 32 cores): SimHash64 is a native single-pass codegen'd expression —
    // cheap enough per row that round-robin-shuffling the text payload costs
    // more than the one-task saving, and `sig` feeds a self-join whose two
    // consumers each replay the exchange
    val sig = df.select(col(idCol).as("id"), col(textCol).as("__t"))
      .select(col("id"), simhash(col("__t")).as("sh"))
      .select($"id", $"sh", posexplode(
        transform(sequence(lit(0), lit(3)),
          c => call_function("shiftright", $"sh", c * 16).bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    val a = sig.select($"id".as("id_a"), $"sh".as("sh_a"), $"chunk_idx", $"chunk_val")
    val b = sig.select($"id".as("id_b"), $"sh".as("sh_b"), $"chunk_idx", $"chunk_val")
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter($"id_a" < $"id_b")
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count($"sh_a".bitwiseXOR($"sh_b")))
      .filter($"hamming" <= maxHamming)
      .select($"id_a", $"id_b", $"hamming")
  }

  /** Prefix-filtered exact Jaccard join (SSJoin/PPJoin prefix principle):
    * with shingle sets ordered by a fixed total order (global document
    * frequency, rarest first), two sets with J >= t MUST share one of each
    * other's first `|S| - ceil(t*|S|) + 1` elements — so only those prefix
    * shingles are indexed. Exact same output as [[ngramJaccardPairs]] but
    * the posting index shrinks with the threshold, and hot (frequent)
    * shingles land OUTSIDE prefixes — killing the skew that dominates the
    * plain inverted-index join at high thresholds.
    */
  /** Per-doc distinct shingle sets, hashed to 8-byte longs. Every posting
    * shuffle, frequency aggregation and set intersection downstream runs on
    * longs instead of multi-word strings — an order-of-magnitude shuffle
    * volume cut. Jaccard in hash space equals Jaccard in string space unless
    * xxhash64 collides inside one document (~|S|²/2⁶⁵ per doc — negligible,
    * and spec/oracle-verified empirically).
    */
  private def hashedSets(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int): DataFrame =
    // NOT spread (round-20 driver record: widening regressed t23 2 s -> 5 s
    // at 32 cores, t09/t22/t42 flat at best): shingleHashes is a native
    // one-pass codegen'd expression, and this relation is consumed 2-3x by
    // every caller (freq ranking, posting explode, verify re-attach) — each
    // consumer replays the round-robin exchange of the full text payload,
    // where the unwidened plan re-scans a KB-scale parquet footprint
    df.select(col(groupCol).as("g"), col(idCol).as("id"),
        col(textCol).as("__t"))
      .select(col("g"), col("id"),
        // native one-pass expression (codegen'd); semantically identical to
        // array_distinct(transform(wordShingles(text, n), xxhash64))
        graft.expressions.GraftFunctions.shingleHashes(col("__t"), n).as("sh"))
      .withColumn("sz", size(col("sh")))

  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    // The prefix principle only pays off when it actually shrinks the index:
    // prefix length is |S|·(1-t)+1, so at t=0.5 HALF of every set is still
    // indexed and the df-ranking machinery (explode → freq join → groupBy →
    // sort_array(collect_list)) costs more than it prunes. Below the
    // crossover, route to the plain inverted-index join — identical output
    // (maxDf left at its complete default Int.MaxValue: this route must
    // honor prefixJaccardPairs' no-false-negatives contract), strictly
    // cheaper plan.
    if (threshold < 0.5)
      return ngramJaccardPairs(df, idCol, textCol, groupCol, n, threshold,
        maxDf = Int.MaxValue)
    val spark = df.sparkSession
    import spark.implicits._
    val base = hashedSets(df, idCol, textCol, groupCol, n)

    // global rarest-first total order on shingles ((df, hash) is total)
    val freq = base.select(explode($"sh").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("df"))

    // All pruning arithmetic carries a 1e-7 slack: IEEE doubles can round
    // ABOVE the exact rational (0.8/1.8 > 4/9, sz·0.8 can exceed an exact
    // integer), and a strict compare then drops pairs sitting exactly on
    // the qualification boundary. Slack only ADMITS a few extra candidates
    // (verification is exact); without it the prune is subtly lossy.
    val eps = 1e-7
    val prefixLen = ($"sz" - ceil($"sz" * threshold - eps) + 1).cast("int")
    // posexplode: `p` is the token's 0-based rank in the doc's full sorted
    // set (the prefix IS the head of that order) — feeds the position filter
    val prefixes = base
      .select($"g", $"id", $"sz", explode($"sh").as("h"))
      .join(freq, "h")
      .groupBy($"g", $"id", $"sz")
      .agg(sort_array(collect_list(struct($"df", $"h"))).as("ordered"))
      .select($"g", $"id", $"sz",
        posexplode(slice(transform($"ordered", o => o.getField("h")), lit(1), prefixLen)))
      .withColumnRenamed("pos", "p")
      .withColumnRenamed("col", "h")

    // Two lossless candidate prunes BEFORE the dedup/verify shuffles
    // (PPJoin, Xiao et al. — public algorithm):
    //  - length filter: J(A,B) <= min/max size, so sizes differing by more
    //    than factor t can never qualify;
    //  - position filter: both sets share the same total order, so for a
    //    shared prefix token at ranks (p_a, p_b) the overlap can be at most
    //    1 + min(|A|-p_a-1, |B|-p_b-1); J >= t needs overlap >=
    //    t/(1+t)·(|A|+|B|). A qualifying pair always survives via its FIRST
    //    shared token (maximal bound), so filtering per posting row and
    //    deduplicating after loses nothing.
    val a = prefixes.select($"g", $"h", $"id".as("id_a"), $"sz".as("sz_a"), $"p".as("p_a"))
    val b = prefixes.select($"g", $"h", $"id".as("id_b"), $"sz".as("sz_b"), $"p".as("p_b"))
    val candidates = a.join(b, Seq("g", "h"))
      .filter($"id_a" < $"id_b" &&
        $"sz_b" >= $"sz_a" * threshold - eps && $"sz_a" >= $"sz_b" * threshold - eps &&
        (lit(1) + least($"sz_a" - $"p_a" - 1, $"sz_b" - $"p_b" - 1)) >=
          lit(threshold / (1 + threshold)) * ($"sz_a" + $"sz_b") - eps)
      .select($"id_a", $"id_b")
      .dropDuplicates("id_a", "id_b")

    val sets = base.select($"id", $"sh")
    candidates
      .join(sets.select($"id".as("id_a"), $"sh".as("sh_a")), Seq("id_a"))
      .join(sets.select($"id".as("id_b"), $"sh".as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect($"sh_a", $"sh_b")).cast("double") /
          size(array_union($"sh_a", $"sh_b")))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** Exact n-gram Jaccard between all pairs within `groupCol` (bounded-group
    * variant for when LSH is overkill; cross-group pairs are never compared).
    *
    * Inverted-index formulation: explode each doc's (distinct) shingle set
    * into postings and self-join on (group, shingle) — only pairs that share
    * a shingle are ever materialized. The one skew source is a hot shingle
    * (df docs in one group contain it → df² candidate rows): the OPT-IN
    * `maxDf` drops postings for shingles appearing in more than `maxDf` docs
    * of their group from CANDIDATE GENERATION only; surviving candidates are
    * verified with a hot-shingle correction, so every EMITTED Jaccard value
    * is exact. df is counted PER GROUP — the same scope the candidate join
    * runs in — so a shingle common across groups but rare within each is
    * never dropped. The hot set is tiny by construction (a (group, shingle)
    * needs > maxDf docs to get in), so it is removed via a broadcast
    * anti-join — no extra shuffle of the posting table.
    *
    * Completeness: the default (`maxDf = Int.MaxValue`) is unconditionally
    * complete. With a finite `maxDf`, a pair is missed iff EVERY shingle it
    * shares is hot in its group — which includes the important case of a
    * duplicate cluster larger than `maxDf` docs (mass boilerplate), where
    * every shared shingle exceeds the cutoff. Only set `maxDf` when hot-
    * shingle skew is the measured bottleneck AND clusters wider than `maxDf`
    * are acceptable to miss (e.g. they are caught by exact-hash dedup first).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 3, threshold: Double = 0.5,
      maxDf: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val withCommon = ngramJaccardCore(df, idCol, textCol, groupCol, n,
      threshold, maxDf)
    withCommon
      .withColumn("jaccard",
        $"common".cast("double") / ($"sz_a" + $"sz_b" - $"common"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }

  /** The candidate/verify machinery shared by [[ngramJaccardPairs]] and
    * [[jaccardThresholdSensitivity]]: every length-compatible pair sharing
    * at least one (surviving) shingle, with the EXACT integer overlap.
    * Returns (id_a, id_b, sz_a, sz_b, common); the Jaccard filter itself is
    * the caller's (the length prune is lossless only down to `threshold`).
    */
  private def ngramJaccardCore(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int, threshold: Double, maxDf: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = hashedSets(df, idCol, textCol, groupCol, n)
    val postings = base.select($"g", $"id", $"sz", explode($"sh").as("h"))

    // With no cutoff (the default) the posting table joins as-is — no df
    // aggregation, no correction join. The count-based Jaccard below is the
    // groupBy of the posting self-join: common = shared-posting count.
    val (rare, hotPerDoc) =
      if (maxDf == Int.MaxValue) (postings, None)
      else {
        // The hot set is tiny by construction (a (group, shingle) needs
        // > maxDf docs to get in), so it broadcasts: removing it from the
        // posting join is an anti-join with no extra shuffle. Each doc's hot
        // sub-set is a short array re-attached to candidate pairs below —
        // NOT hint-broadcast, since hotPerDoc can approach one row per doc
        // (stopword shingles are everywhere); AQE picks broadcast when it
        // actually fits.
        val hot = postings.groupBy($"g", $"h").agg(count(lit(1)).as("df"))
          .filter($"df" > maxDf).select($"g", $"h")
        (postings.join(broadcast(hot), Seq("g", "h"), "left_anti"),
          Some(postings.join(broadcast(hot), Seq("g", "h"))
            .groupBy($"id").agg(collect_list($"h").as("hot_sh"))))
      }

    // Count-based exact Jaccard (the groupBy IS the pair dedup): common =
    // shared-rare count + |hot_a ∩ hot_b| correction, union by inclusion-
    // exclusion — no full shingle arrays ever ride a shuffle.
    val a = rare.select($"g", $"h", $"id".as("id_a"), $"sz".as("sz_a"))
    val b = rare.select($"g", $"h", $"id".as("id_b"), $"sz".as("sz_b"))
    // length filter (lossless, see prefixJaccardPairs — incl. the 1e-7
    // slack note): prunes posting collisions between incompatibly-sized
    // docs before the pair groupBy
    val counted = a.join(b, Seq("g", "h"))
      .filter($"id_a" < $"id_b" &&
        $"sz_b" >= $"sz_a" * threshold - 1e-7 && $"sz_a" >= $"sz_b" * threshold - 1e-7)
      .groupBy($"id_a", $"id_b", $"sz_a", $"sz_b")
      .agg(count(lit(1)).as("common_rare"))
    val withCommon = hotPerDoc match {
      case None => counted.withColumn("common", $"common_rare")
      case Some(hpd) => counted
        .join(hpd.select($"id".as("id_a"), $"hot_sh".as("hot_a")),
          Seq("id_a"), "left")
        .join(hpd.select($"id".as("id_b"), $"hot_sh".as("hot_b")),
          Seq("id_b"), "left")
        .withColumn("common", $"common_rare" +
          coalesce(size(array_intersect($"hot_a", $"hot_b")), lit(0)))
    }
    withCommon.select($"id_a", $"id_b", $"sz_a", $"sz_b", $"common")
  }

  /** Dedup threshold-SENSITIVITY report: how many documents (and candidate
    * pairs) a near-dup pass would remove at EVERY threshold of a grid, from
    * one candidate-generation pass — the number a curation run needs before
    * committing to a threshold, without re-running the join per setting.
    *
    * Grid: thresholds `minT/den .. (den-1)/den`. All threshold tests are
    * INTEGER arithmetic — a pair qualifies at `t/den` iff
    * `den·common ≥ t·union`, so each pair's maximal qualifying step is
    * `tmax = (den·common) div union` and the per-threshold counts are
    * suffix sums of tiny tmax histograms. No float compare sits on a
    * boundary, and any SQL engine replays the report value-for-value.
    *
    * `docs_removed` counts documents with at least one SMALLER-id partner
    * at the threshold — exact first-wins PAIR semantics (the upper bound a
    * transitive-cluster pass refines; cluster-level resolution is
    * [[DedupClusters]]' job). One pass of [[ngramJaccardCore]] at the grid
    * minimum feeds every row; everything after the pair groupBy runs on
    * histogram-scale data (≤ den rows).
    */
  def jaccardThresholdSensitivity(df: DataFrame, idCol: String,
      textCol: String, groupCol: String, n: Int = 3, den: Int = 20,
      minT: Int = 10, maxDf: Int = Int.MaxValue): DataFrame = {
    require(den >= 2 && minT >= 1 && minT < den,
      s"need 1 <= minT < den, got minT=$minT den=$den")
    val spark = df.sparkSession
    import spark.implicits._
    val pairs = ngramJaccardCore(df, idCol, textCol, groupCol, n,
      minT.toDouble / den, maxDf)
      .select($"id_a", $"id_b",
        expr(s"($den * common) div (sz_a + sz_b - common)").as("tmax"))
      .filter($"tmax" >= minT)
    // ONE linear chain off the single candidate pass — a docs-histogram /
    // pairs-histogram branch pair would silently recompute the whole
    // posting self-join twice (static plans don't reuse exchanges): reduce
    // pairs to (doc, step) counts, explode each row into the grid steps it
    // covers (tmax = den when common = union, so cap at den-1), then fold
    // both report columns in one aggregation. Explode factor <= den - minT
    // over doc-scale rows; no theta join, no second pass.
    val hi = lit((den - 1).toLong)
    val perT = pairs.groupBy($"id_b", $"tmax").agg(count(lit(1)).as("cnt"))
      .select(explode(sequence(lit(minT.toLong), least($"tmax", hi))).as("t"),
        $"id_b", $"cnt")
      .groupBy($"t")
      .agg(countDistinct($"id_b").as("docs_removed"), sum($"cnt").as("pairs"))
    spark.range(minT.toLong, den.toLong).toDF("t")
      .join(perT, Seq("t"), "left")
      .select($"t".cast("int").as("t"),
        ($"t".cast("double") / den).as("threshold"),
        coalesce($"docs_removed", lit(0L)).as("docs_removed"),
        coalesce($"pairs", lit(0L)).as("pairs"))
  }
}
