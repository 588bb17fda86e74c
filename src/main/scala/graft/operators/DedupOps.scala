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
    val base = df.select(
      col(idCol).as("id"),
      array_distinct(TextAnalysis.wordShingles(col(textCol), shingleWords)).as("shingles"),
      // native one-pass signature (graft.expressions.MinHashSig); the HOF
      // equivalent `minhashSignature` is kept for the parity spec
      graft.expressions.GraftFunctions.minhashSig(col(textCol), shingleWords, k).as("sig"))

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
    val sig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
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
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      array_distinct(TextAnalysis.wordShingles(col(textCol), n)).as("sh"))
      .withColumn("sz", size(col("sh")))

    // global rarest-first total order on shingles
    val freq = base.select(explode($"sh").as("shingle"))
      .groupBy($"shingle").agg(count(lit(1)).as("df"))

    val prefixLen = ($"sz" - ceil($"sz" * threshold) + 1).cast("int")
    val prefixes = base
      .select($"g", $"id", $"sz", explode($"sh").as("shingle"))
      .join(freq, "shingle")
      .groupBy($"g", $"id", $"sz")
      .agg(sort_array(collect_list(struct($"df", $"shingle"))).as("ordered"))
      .select($"g", $"id",
        explode(slice(transform($"ordered", o => o.getField("shingle")), lit(1), prefixLen))
          .as("shingle"))

    val a = prefixes.select($"g", $"shingle", $"id".as("id_a"))
    val b = prefixes.select($"g", $"shingle", $"id".as("id_b"))
    val candidates = a.join(b, Seq("g", "shingle"))
      .filter($"id_a" < $"id_b")
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
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Inverted-index formulation: instead of the quadratic within-group cross
    // join, explode each doc's (distinct) shingle set into postings and
    // self-join on (group, shingle). Only pairs that actually share a shingle
    // are ever materialized, and |A∩B| falls out of the pair count:
    // J = common / (|A| + |B| - common). Near-linear when shingles are
    // diverse; a pathologically common shingle is the one skew source (it
    // would need a doc-frequency prefix filter, at the cost of exactness).
    val base = df.select(col(groupCol).as("g"), col(idCol).as("id"),
      array_distinct(TextAnalysis.wordShingles(col(textCol), n)).as("sh"))
      .withColumn("sz", size(col("sh")))
    val postings = base.select($"g", $"id", $"sz", explode($"sh").as("shingle"))
    val a = postings.select($"g", $"shingle", $"id".as("id_a"), $"sz".as("sz_a"))
    val b = postings.select($"g", $"shingle", $"id".as("id_b"), $"sz".as("sz_b"))
    a.join(b, Seq("g", "shingle"))
      .filter($"id_a" < $"id_b")
      .groupBy($"id_a", $"id_b", $"sz_a", $"sz_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        $"common".cast("double") / ($"sz_a" + $"sz_b" - $"common"))
      .filter($"jaccard" >= threshold)
      .select($"id_a", $"id_b", $"jaccard")
  }
}
