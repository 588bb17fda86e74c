package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-preparation operators for LLM training pipelines: context-window
  * chunking and PII redaction.
  *
  * Both are narrow per-row transformations built entirely from codegen'd
  * built-ins (split/slice/sequence/explode, regexp_replace), so they scale
  * embarrassingly: no shuffle, no state, predicates and projections still
  * push past them to the scan.
  */
object TextPipeline {

  /** Splits each document into overlapping token-window chunks — the
    * standard prep for embedding/training models with a bounded context:
    * chunk `i` covers tokens `[i·stride, i·stride + window)` of the
    * whitespace tokenization, and every document yields at least one chunk
    * (short docs yield exactly one). The final chunk may be shorter than
    * `window`; with `stride < window` consecutive chunks overlap by
    * `window - stride` tokens so no span falls across a chunk boundary
    * unseen.
    *
    * Output: `id` (= `idCol`), `chunk_id` (0-based), `chunk_text`,
    * `n_tokens`.
    */
  def chunk(df: DataFrame, idCol: Column, textCol: Column, window: Int, stride: Int): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window)
    val tokens = split(trim(textCol), "\\s+")
    // nChunks = 1 + ceil((n - window) / stride) for n > window, else 1;
    // integer `div` keeps the arithmetic exact (no FP floor hazards).
    val nChunks = when(size(col("__toks")) <= window, lit(1L))
      .otherwise(expr(s"((size(__toks) - $window + ${stride - 1}) div $stride) + 1"))
    df.select(idCol.as("__id"), tokens.as("__toks"))
      .select(col("__id"), col("__toks"), nChunks.as("__nc"))
      .select(col("__id"), col("__toks"),
        explode(sequence(lit(0L), col("__nc") - 1L)).as("chunk_id"))
      .select(
        col("__id").as("id"),
        col("chunk_id"),
        array_join(slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window)), " ")
          .as("chunk_text"),
        size(slice(col("__toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window)))
          .cast("bigint").as("n_tokens"))
  }

  /** Sequence packing — the GPT-style "concatenate everything in a fixed
    * shuffle order and cut every `capacity` tokens" batch-prep step. Each
    * document gets its position in the packed token stream: a global
    * sequence number, its start offset, and the first/last training bin it
    * lands in (a doc may straddle a bin boundary — that is the point of this
    * packing style: zero padding waste).
    *
    * The order is the deterministic md5 shuffle (`md5(id), id`), so the
    * result is a pure function of the data — same packing on any cluster.
    *
    * Scale: a naive `sum(...).over(Window.orderBy(...))` global running sum
    * funnels the whole table through ONE window partition. This is the
    * textbook two-phase distributed scan instead: range-partition by the
    * order key (contiguous, sorted ranges), cumsum WITHIN each partition
    * (that window is per-partition, parallel), then broadcast-join each
    * partition's prefix offset — computed from one `numPartitions`-row
    * aggregate — on `spark_partition_id()`. The one materialization
    * (`localCheckpoint`) pins partition identity so both subplans read the
    * SAME shuffle output; everything after it is embarrassingly parallel.
    *
    * Output: `id`, `seq` (1-based global rank), `n_tokens`, `start_token`,
    * `bin_first`, `bin_last`, `offset_in_bin`.
    */
  def packSequences(df: DataFrame, idCol: Column, nTokensCol: Column, capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val keyed = df.select(
      idCol.as("id"),
      nTokensCol.cast("bigint").as("n_tokens"),
      md5(idCol.cast("string")).as("__h"),
      idCol.cast("string").as("__t"))
    // Contiguous sorted ranges; eager localCheckpoint fixes the partition
    // boundaries AND spark_partition_id() so the totals branch and the
    // cumsum branch below cannot see two different shuffles.
    val parted = keyed.repartitionByRange(col("__h"), col("__t")).localCheckpoint()
    val withPid = parted.withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid")).orderBy(col("__h"), col("__t"))
    val cum = withPid
      .withColumn("__cin", sum(col("n_tokens")).over(inPart))
      .withColumn("__rin", row_number().over(inPart).cast("bigint"))
    // Prefix offsets over partition ids: numPartitions rows — the single-
    // partition window here is over driver-sized data by construction.
    val prefix = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withPid.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("__ptot"), count(lit(1)).as("__pcnt"))
      .select(col("__pid"),
        coalesce(sum(col("__ptot")).over(prefix), lit(0L)).as("__toff"),
        coalesce(sum(col("__pcnt")).over(prefix), lit(0L)).as("__roff"))
    val start = col("__toff") + col("__cin") - col("n_tokens")
    cum.join(broadcast(offsets), "__pid")
      .select(
        col("id"),
        (col("__roff") + col("__rin")).as("seq"),
        col("n_tokens"),
        start.as("start_token"),
        expr(s"(__toff + __cin - n_tokens) div $capacity").as("bin_first"),
        expr(s"(__toff + __cin - n_tokens + greatest(n_tokens, 1L) - 1L) div $capacity")
          .as("bin_last"),
        pmod(start, lit(capacity)).as("offset_in_bin"))
  }

  /** PII patterns chosen to mean the same thing in Java regex and RE2
    * (no backtracking-dependent constructs), so the DuckDB oracle can apply
    * the byte-identical patterns.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  /** Replaces URLs, then emails, then IPv4 literals with typed placeholder
    * tokens. URL first: a URL may embed an email-shaped or IP-shaped
    * substring, and redacting the containing span first makes the pass
    * order-insensitive for the remaining patterns.
    */
  def redactPii(text: Column): Column = {
    val noUrl = regexp_replace(text, UrlRe, "<URL>")
    val noEmail = regexp_replace(noUrl, EmailRe, "<EMAIL>")
    regexp_replace(noEmail, Ipv4Re, "<IP>")
  }

  /** Count of non-overlapping matches of `pattern` — redaction audit data. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("bigint")

  /** Gopher-style repetition score: the fraction of a document's word
    * n-grams that are DISTINCT (low ratio = heavy internal repetition, the
    * classic low-quality signal boilerplate/keyword-stuffed pages show).
    * Distinct counting rides the native one-pass `shingle_hashes`
    * expression; the total is pure token arithmetic — no per-row HOF in
    * the plan, so this is scan-speed at any corpus size.
    *
    * Output: `id`, `n_shingles` (total including repeats), `distinct_ratio`
    * (null for docs shorter than n tokens).
    */
  def repetitionScore(df: DataFrame, idCol: Column, textCol: Column, n: Int = 3): DataFrame = {
    val total = greatest(size(split(trim(textCol), "\\s+")) - (n - 1), lit(0)).cast("bigint")
    val distinctN = size(graft.expressions.GraftFunctions.shingleHashes(textCol, n)).cast("bigint")
    df.select(
      idCol.as("id"),
      total.as("n_shingles"),
      when(total === 0, lit(null).cast("double"))
        .otherwise(distinctN.cast("double") / total.cast("double")).as("distinct_ratio"))
  }

  /** Benchmark-contamination check: for every corpus document, the fraction
    * of its distinct word n-grams that appear ANYWHERE in the benchmark
    * corpus — the train/test overlap scan every serious dataset release
    * runs. Shingles are hashed to longs natively before the explode, so
    * only 8-byte keys cross the shuffle, and the benchmark side reduces to
    * a distinct hash set (broadcastable whenever the benchmark is
    * dimension-sized, which it is by definition).
    *
    * Output: `id`, `n_shingles` (distinct), `overlap_ratio` (null for docs
    * shorter than n tokens).
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
      idCol: Column, textCol: Column, n: Int = 3): DataFrame = {
    // A doc shorter than n tokens has ZERO n-gram shingles. shingle_hashes
    // intentionally emits one partial (tail) shingle for such docs — the
    // right behavior for MinHash signatures, where a degenerate all-MaxValue
    // signature would band-collide every short doc with every other — but
    // contamination's contract (and its range-based oracle) counts full
    // n-grams only, so short docs are gated to an empty set here: they score
    // n_shingles = 0 / null ratio, and a short BENCHMARK doc contributes
    // nothing to the benchmark shingle set.
    val nToks = size(split(trim(textCol), "\\s+"))
    val sh = when(nToks < n, array().cast("array<bigint>"))
      .otherwise(graft.expressions.GraftFunctions.shingleHashes(textCol, n))
    val corpusSh = corpus.select(idCol.as("id"), sh.as("__sh"))
    val benchSet = benchmark.select(explode(sh).as("__s")).distinct()
    val exploded = corpusSh.select(col("id"), explode(col("__sh")).as("__s"))
    val overlap = exploded.join(benchSet, Seq("__s"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("__hits"))
    corpusSh.select(col("id"), size(col("__sh")).cast("bigint").as("n_shingles"))
      .join(overlap, Seq("id"), "left_outer")
      .select(
        col("id"),
        col("n_shingles"),
        when(col("n_shingles") === 0, lit(null).cast("double"))
          .otherwise(coalesce(col("__hits"), lit(0L)).cast("double") /
            col("n_shingles").cast("double")).as("overlap_ratio"))
  }

  /** Stateless formulation of [[contamination]] — identical output, no
    * aggregation on the corpus side, so it runs unchanged on a STREAMING
    * corpus in append mode (the batch version's per-doc groupBy would need
    * watermarked state). The benchmark's distinct shingle hashes collapse to
    * a single array row (dimension-sized by definition) cross-joined in as a
    * broadcast; per-doc overlap is then one `array_intersect` — a narrow
    * projection, which is exactly what makes it stream-safe. Prefer the
    * join-based [[contamination]] for batch at scale (the semi join prunes
    * shuffle volume); use this one under `readStream`.
    */
  def contaminationStateless(corpus: DataFrame, benchmark: DataFrame,
      idCol: Column, textCol: Column, n: Int = 3): DataFrame = {
    val nToks = size(split(trim(textCol), "\\s+"))
    val sh = when(nToks < n, array().cast("array<bigint>"))
      .otherwise(graft.expressions.GraftFunctions.shingleHashes(textCol, n))
    val benchSet = benchmark.select(explode(sh).as("__s")).distinct()
      .agg(collect_list(col("__s")).as("__bench"))
    corpus.select(idCol.as("id"), sh.as("__sh"))
      .crossJoin(broadcast(benchSet))
      .select(
        col("id"),
        size(col("__sh")).cast("bigint").as("n_shingles"),
        when(size(col("__sh")) === 0, lit(null).cast("double"))
          .otherwise(size(array_intersect(col("__sh"), col("__bench"))).cast("double") /
            size(col("__sh")).cast("double")).as("overlap_ratio"))
  }
}
