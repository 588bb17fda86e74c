package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.{DedupOps, IncrementalDedup, QuantileHist, TextAnalysis, TextPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 wave: incremental corpus admission against a persisted
  * fingerprint index, sketch-driven per-group threshold filtering, and
  * within-document content extraction. Same contract as
  * [[ExtensionQueries]]: Spark-first builder + DuckDB oracle that must
  * hash-match exactly at sf0.01 and sf0.001.
  */
object ExtensionQueries7 {

  // t103 fixtures, shared verbatim by the Spark page builder and the DuckDB
  // oracle (hash parity requires byte-identical literals on both sides):
  // CJK prose with no word spaces, Cyrillic prose, and a long dash rule
  // that must die on line shape in any script.
  private val CjkLine = "这是一段足够长的中文正文内容，其中包含许多汉字，" +
    "用来验证提取器在没有空格的文字系统里也能保留正文。"
  private val CyrLine = "Это довольно длинная строка русской прозы, которая " +
    "проверяет плотность букв в тексте страницы."
  private val DashRule =
    "— — — — — — — — — — — — — — — — — — — — — — — — — — — — — — — —"

  val queries: Seq[GraftQuery] = Seq(
    // --------------------------------------------------------------- t101
    GraftQuery(
      "t101_incremental_dedup",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        // "already admitted" corpus = every third document; the index the
        // next crawl batch dedups against is its distinct fingerprints ONLY
        val index = IncrementalDedup.buildIndex(
          docs.where($"doc_id" % 3 === 0), TextAnalysis.fingerprint($"text"))
        IncrementalDedup.admit(
          docs.where($"doc_id" % 3 =!= 0), index,
          TextAnalysis.fingerprint($"text"), $"doc_id")
          .select($"doc_id".cast("bigint").as("doc_id"), $"fp")
          .orderBy($"doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
             |  FROM documents),
             |fresh AS (
             |  SELECT doc_id, fp FROM f b
             |  WHERE doc_id % 3 <> 0
             |    AND NOT EXISTS (
             |      SELECT 1 FROM f i WHERE i.doc_id % 3 = 0 AND i.fp = b.fp)),
             |firsts AS (
             |  SELECT doc_id, fp,
             |    ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
             |  FROM fresh)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, fp
             |FROM firsts WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      doc = "Incremental corpus admission: a new batch dedups against the " +
        "persisted fingerprint index of everything already admitted (LEFT " +
        "ANTI on 16-byte hashes — history never re-enters the job), then " +
        "first-wins within the batch via a map-side-combining min_by " +
        "aggregation instead of a rank window. The continuous-crawl shape: " +
        "each snapshot's work is proportional to the snapshot, not the corpus."
    ),
    // --------------------------------------------------------------- t102
    GraftQuery(
      "t102_sketch_threshold_filter",
      (s, d) => {
        import s.implicits._
        QuantileHist.thresholdFilter(
          Tables.documents(s, d).select($"doc_id", $"lang", $"n_chars"),
          $"lang", $"n_chars", num = 1L, den = 4L, subBits = 4)
          .select($"doc_id".cast("bigint").as("doc_id"), $"lang",
            $"n_chars".cast("bigint").as("n_chars"))
          .orderBy($"doc_id")
      },
      Some("""WITH b AS (
             |  SELECT lang, (n_chars >> s) << s AS bucket_lo FROM (
             |    SELECT lang, n_chars, GREATEST(length(bin(n_chars)) - 5, 0) AS s
             |    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)),
             |sk AS (SELECT lang, bucket_lo, COUNT(*) AS n FROM b GROUP BY 1, 2),
             |c AS (SELECT lang, bucket_lo, n,
             |    SUM(n) OVER (PARTITION BY lang ORDER BY bucket_lo) AS cum,
             |    SUM(n) OVER (PARTITION BY lang) AS total FROM sk),
             |cut AS (SELECT lang, bucket_lo AS est_lo FROM c
             |    WHERE cum >= (total + 3) // 4 AND cum - n < (total + 3) // 4)
             |SELECT CAST(v.doc_id AS BIGINT) AS doc_id, v.lang,
             |  CAST(v.n_chars AS BIGINT) AS n_chars
             |FROM documents v JOIN cut ON v.lang = cut.lang
             |WHERE v.n_chars >= cut.est_lo
             |ORDER BY doc_id""".stripMargin),
      doc = "Sketch-driven per-language length floor (drop each language's " +
        "shortest quarter, CCNet-style): per-group quantile cutoffs come " +
        "off the mergeable QuantileHist sketch (one hash aggregation, " +
        "bounded state), then ONE broadcast join + filter over the corpus " +
        "— never a per-group rank window over the data. The oracle " +
        "re-derives the bucket arithmetic, the exact-integer ceil rank and " +
        "the cutoff join from first principles in DuckDB."
    ),
    // --------------------------------------------------------------- t103
    GraftQuery(
      "t103_content_extract",
      (s, d) => {
        import s.implicits._
        // synthesized crawl page: nav header, body, separator rule, tag
        // line and footer around each document's text — plus non-Latin
        // prose lines (CJK with no word spaces, Cyrillic) that MUST
        // survive and a long dash-rule that must die on shape alone: the
        // density test counts Unicode letters/digits, so scripts with ~0%
        // ASCII alphanumerics pass while punctuation chrome fails in any
        // script
        val page = concat_ws("\n",
          lit("Home | About | Contact"),
          $"text",
          lit(CjkLine),
          lit(CyrLine),
          lit("| | --- | |"),
          lit(DashRule),
          concat(lit("Tags: "), $"lang"),
          lit("(c) 2026 - Integritet - Villkor"))
        TextPipeline.extractContent(
          Tables.documents(s, d).select($"doc_id", page.as("page")),
          $"doc_id", $"page", minLineChars = 32, minAlnumPct = 50)
          .select($"id".cast("bigint").as("doc_id"), $"content",
            $"n_kept", $"n_total")
          .orderBy($"doc_id")
      },
      Some(("""WITH p AS (SELECT doc_id,
             |    'Home | About | Contact' || chr(10) || text || chr(10) ||
             |    'CJK' || chr(10) ||
             |    'CYR' || chr(10) ||
             |    '| | --- | |' || chr(10) ||
             |    'DASHRULE' || chr(10) ||
             |    'Tags: ' || lang || chr(10) ||
             |    '(c) 2026 - Integritet - Villkor' AS page
             |  FROM documents),
             |l AS (SELECT doc_id, string_split(page, chr(10)) AS lines FROM p),
             |k AS (SELECT doc_id, lines,
             |    list_filter(lines, x -> length(x) >= 32 AND
             |      100 * (length(x) - length(regexp_replace(x, '[\pL\p{Nd}]', '', 'g')))
             |        >= 50 * length(x)) AS keep
             |  FROM l)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  array_to_string(keep, chr(10)) AS content,
             |  CAST(len(keep) AS BIGINT) AS n_kept,
             |  CAST(len(lines) AS BIGINT) AS n_total
             |FROM k ORDER BY doc_id""").stripMargin
        .replace("CJK", CjkLine)
        .replace("CYR", CyrLine)
        .replace("DASHRULE", DashRule)),
      doc = "Within-document main-content extraction by line density " +
        "(readability/trafilatura-class heuristic as exact integer " +
        "arithmetic): a line survives iff it has >= 32 codepoints and >= " +
        "50% Unicode letters/digits (Character.isLetterOrDigit, mirrored " +
        "in DuckDB by the RE2 class [\\pL\\p{Nd}] — the t83/t93 " +
        "regex-parity playbook). The synthesized nav/separator/tag/footer " +
        "chrome and a 32-codepoint dash rule fail on line shape; Latin, " +
        "CJK and Cyrillic body prose all pass — the density test is " +
        "script-agnostic, so multilingual pages are not destroyed. ONE " +
        "narrow codegen'd projection (graft_extract_content): no explode, " +
        "no reassembly shuffle, no corpus statistics — the per-page " +
        "complement of the cross-corpus boilerplate removers (t53/t85)."
    ),
    // --------------------------------------------------------------- t104
    GraftQuery(
      "t104_neardup_admission_gate",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val indexDocs = docs.where($"doc_id" % 3 === 0)
        val batch = docs.where($"doc_id" % 3 =!= 0)
        val sigIndex = IncrementalDedup
          .buildSigIndex(indexDocs, $"doc_id", $"text").localCheckpoint()
        val admitted = IncrementalDedup
          .admitNearDup(batch, sigIndex, "doc_id", "text").localCheckpoint()
        // spec twin, brute force end to end: score EVERY batch x index pair
        // (positional band share via the same banded predicate, exact
        // signature match count), derive the expected survivor set, then
        // re-cluster the survivors over an ALL-pairs collision graph with
        // the label-propagation components implementation (the operator
        // uses star contraction — independently gated by t26/t32) and keep
        // each cluster's min id. The operator's admitted set must equal
        // this spec EXACTLY — one id off in either direction is a red row.
        val sigs = graft.expressions.GraftFunctions.minhashSig($"text", 3, 32)
        def withBands(df: org.apache.spark.sql.DataFrame, p: String) =
          df.select($"id".as(s"${p}id"), $"sig".as(s"${p}sig"),
            graft.operators.DedupOps.bands($"sig", 8, 4).as(s"${p}bands"))
        val bSig = batch.select($"doc_id".as("id"), sigs.as("sig"))
        val sharesBand = (a: String, b: String) =>
          graft.expressions.GraftFunctions
            .sigMatchCount(col(s"${a}bands"), col(s"${b}bands")) >= 1
        val scoreOk = (a: String, b: String) =>
          graft.expressions.GraftFunctions
            .sigMatchCount(col(s"${a}sig"), col(s"${b}sig")) >= 26
        val bruteRejected = withBands(bSig, "b")
          .crossJoin(broadcast(withBands(sigIndex, "i")))
          .where(sharesBand("b", "i") && scoreOk("b", "i"))
          .select($"bid".as("id")).distinct()
        // materialized: the survivor set feeds the all-pairs cross, the
        // component node list AND the final compare — without the
        // checkpoint the batch x index brute force re-executes per consumer
        val expSurvivors = bSig.join(bruteRejected, Seq("id"), "left_anti")
          .localCheckpoint()
        val expPairs = withBands(expSurvivors, "a")
          .crossJoin(broadcast(withBands(expSurvivors, "z")))
          .where($"aid" < $"zid" && sharesBand("a", "z") && scoreOk("a", "z"))
          .select($"aid".as("id_a"), $"zid".as("id_b"))
        val expComps = graft.operators.DedupClusters.connectedComponents(
          expSurvivors.select($"id"), expPairs, "id")
        val expAdmitted = expComps.where($"id" === $"component").select($"id")
          .localCheckpoint()
        val got = admitted.select($"id")
        val viol = got.exceptAll(expAdmitted)
          .select($"id".as("id_a"), lit(-1L).as("id_b"),
            lit("admitted_not_in_spec").as("reason"))
          .unionAll(expAdmitted.exceptAll(got)
            .select($"id".as("id_a"), lit(-1L).as("id_b"),
              lit("spec_not_admitted").as("reason")))
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        viol.unionAll(sentinel).orderBy($"id_a", $"id_b", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b, 'sentinel' AS reason"),
      doc = "NEAR-dup incremental admission gate: admitNearDup (banded " +
        "LSH candidates, exact signature scoring, star-contraction batch " +
        "clusters, min-id representatives) must produce EXACTLY the " +
        "admitted set that the brute-force spec derives by scoring every " +
        "batch x index and survivor x survivor pair and re-clustering with " +
        "the independent label-propagation components implementation. " +
        "Violations + sentinel, constant oracle. Proves the banded " +
        "equi-joins implement the candidate spec losslessly and exact " +
        "duplicates can never slip past the index.",
      gate = true
    ),
    // --------------------------------------------------------------- t105
    GraftQuery(
      "t105_recrawl_priority",
      (s, d) => {
        import s.implicits._
        // synthesized fetch history: 4 fetches per URL, content version
        // cycles mod (doc_id % 4 + 1) — so each URL has exactly
        // doc_id % 4 + 1 distinct content hashes across its fetches
        val hist = Tables.documents(s, d)
          .select($"doc_id", $"text",
            explode(sequence(lit(0), lit(3))).as("k"))
          .select(
            concat(lit("https://h"), ($"doc_id" % 50).cast("string"),
              lit(".example/p/"), $"doc_id".cast("string")).as("url"),
            ($"doc_id" * 1000 + $"k" * 250).cast("bigint").as("ts"),
            md5(concat($"text",
              ($"k" % (pmod($"doc_id", lit(4)) + 1)).cast("string"))).as("hash"))
        graft.operators.WebOps
          .recrawlPriority(hist, $"url", $"ts", $"hash", asOfTs = 10000000000L)
          .orderBy($"url")
      },
      Some("""WITH h AS (
             |  SELECT 'https://h' || (doc_id % 50) || '.example/p/' || doc_id AS url,
             |    doc_id * 1000 + k * 250 AS ts,
             |    md5(text || CAST(k % (doc_id % 4 + 1) AS VARCHAR)) AS hash
             |  FROM documents CROSS JOIN range(0, 4) AS t(k)),
             |g AS (SELECT url, COUNT(*) AS n_fetches,
             |    COUNT(DISTINCT hash) AS n_versions, MAX(ts) AS last_ts
             |  FROM h GROUP BY 1)
             |SELECT url, CAST(n_fetches AS BIGINT) AS n_fetches,
             |  CAST(n_versions AS BIGINT) AS n_versions,
             |  CAST(last_ts AS BIGINT) AS last_ts,
             |  CAST((n_versions - 1) * (10000000000 - last_ts) AS BIGINT) AS priority
             |FROM g ORDER BY url""".stripMargin),
      doc = "Recrawl prioritization from fetch history: change count x " +
        "staleness in exact BIGINT arithmetic (URLs that never changed " +
        "score 0 regardless of age), one partial-aggregating hash " +
        "aggregation over the history — the revisit-policy input of a " +
        "continuous crawl, with the as-of instant passed in so runs are " +
        "reproducible."
    ),
    // --------------------------------------------------------------- t106
    GraftQuery(
      "t106_crawl_budget",
      (s, d) => {
        import s.implicits._
        graft.operators.WebOps.allocateBudget(
          Tables.documents(s, d), $"source", $"n_chars", totalBudget = 10000L)
          .select($"domain", $"weight".cast("bigint").as("weight"), $"share")
          .orderBy($"domain")
      },
      Some("""WITH w AS (SELECT source AS domain,
             |    CAST(SUM(n_chars) AS HUGEINT) AS wt FROM documents GROUP BY 1),
             |t AS (SELECT SUM(wt) AS tot FROM w),
             |sc AS (SELECT domain, wt, (wt * 10000) // tot AS fl,
             |    (wt * 10000) % tot AS rem FROM w CROSS JOIN t),
             |l AS (SELECT 10000 - SUM(fl) AS leftover FROM sc),
             |r AS (SELECT domain, wt, fl,
             |    ROW_NUMBER() OVER (ORDER BY rem DESC, domain ASC) AS rk FROM sc)
             |SELECT domain, CAST(wt AS BIGINT) AS weight,
             |  CAST(fl + CASE WHEN rk <= (SELECT leftover FROM l)
             |    THEN 1 ELSE 0 END AS BIGINT) AS share
             |FROM r ORDER BY domain""".stripMargin),
      doc = "Largest-remainder (Hamilton) crawl-budget allocation over " +
        "content mass per source: integer shares that sum EXACTLY to the " +
        "budget, DECIMAL(38,0) products (DuckDB mirrors in HUGEINT), " +
        "rounding error assigned to the largest remainders with a " +
        "deterministic name tiebreak; the bounded domain table is the only " +
        "thing the remainder window ever sorts."
    ),
    // --------------------------------------------------------------- t107
    GraftQuery(
      "t107_image_decode",
      (s, d) => {
        import s.implicits._
        import graft.operators.Multimodal
        // REAL image payloads: a 24-bpp BMP is encoded per document with
        // dimensions and a gray gradient derived from doc_id, then decoded
        // back through the JDK's javax.imageio reader — so width/height/
        // pix_sum/ahash_bits are measured from DECODED PIXELS while the
        // oracle computes the same quantities closed-form from the gradient
        // formula. Any encode, decode, orientation (BMP rows are stored
        // bottom-up), padding, or hash-cell error breaks the hash match.
        val media = Tables.documents(s, d).select($"doc_id")
          .where($"doc_id" < 48).as[Long].map { id =>
            val w = 8 * (1 + (id % 4).toInt)
            val h = 8 * (1 + (id % 3).toInt)
            Multimodal.MediaRow(id, "image", Multimodal.encodeBmp(w, h,
              (x, y) => ((x * 7 + y * 13 + id) % 256).toInt))
          }
        Multimodal.pixelFeatures(media).toDF()
          .select($"doc_id", $"width", $"height", $"pix_sum", $"ahash_bits")
          .orderBy($"doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id,
             |    8 * (1 + CAST(doc_id % 4 AS INT)) AS w,
             |    8 * (1 + CAST(doc_id % 3 AS INT)) AS h
             |  FROM documents WHERE doc_id < 48),
             |s AS (
             |  SELECT doc_id, w, h,
             |    list_sum(flatten(list_transform(range(0, h), y ->
             |      list_transform(range(0, w), x ->
             |        (x*7 + y*13 + doc_id) % 256)))) AS pix_sum
             |  FROM p)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |  CAST(pix_sum AS BIGINT) AS pix_sum,
             |  list_aggregate(list_transform(range(0, 64), b ->
             |    CASE WHEN 64 * list_sum(flatten(list_transform(
             |        range((b // 8) * h // 8, (b // 8 + 1) * h // 8), y ->
             |          list_transform(range((b % 8) * w // 8, (b % 8 + 1) * w // 8), x ->
             |            (x*7 + y*13 + doc_id) % 256)))) > pix_sum
             |      THEN '1' ELSE '0' END), 'string_agg', '') AS ahash_bits
             |FROM s ORDER BY doc_id""".stripMargin),
      doc = "Real image decode round trip: per-doc 24-bpp BMP payloads " +
        "(deterministic gray gradient, doc_id-derived dimensions) decoded " +
        "with the JDK's javax.imageio reader; true width/height, exact " +
        "integer luminance sum and the 8x8 average-hash over decoded " +
        "pixels (cross-multiplied integer compares, emitted as a 64-char " +
        "bit string) must hash-match the oracle's closed-form computation " +
        "of the same gradient. One narrow mapPartitions projection, no " +
        "shuffle; payloads never leave their partition."
    ),
    // --------------------------------------------------------------- t108
    GraftQuery(
      "t108_exact_mix",
      (s, d) => {
        import s.implicits._
        // fr's budget exceeds its mass (keep-everything / all-buckets-full
        // path); the other four bind mid-corpus (boundary-bucket path)
        graft.operators.Sampling.exactTokenBudgets(
          Tables.documents(s, d), $"lang", $"doc_id", $"n_chars",
          Seq("en" -> 30000L, "de" -> 9000L, "es" -> 7000L,
            "fr" -> 50000000L, "zh" -> 8000L))
          .select($"doc_id".cast("bigint").as("doc_id"), $"lang",
            $"n_chars".cast("bigint").as("n_tokens"))
          .orderBy($"doc_id")
      },
      Some("""WITH b(grp, budget) AS (VALUES
             |    ('en', CAST(30000 AS BIGINT)), ('de', CAST(9000 AS BIGINT)),
             |    ('es', CAST(7000 AS BIGINT)), ('fr', CAST(50000000 AS BIGINT)),
             |    ('zh', CAST(8000 AS BIGINT))),
             |t AS (SELECT doc_id, lang, n_chars,
             |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
             |sel AS (SELECT t.doc_id, t.lang, t.n_chars, b.budget,
             |    COALESCE(SUM(t.n_chars) OVER (PARTITION BY t.lang
             |      ORDER BY t.h, CAST(t.doc_id AS VARCHAR)
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             |  FROM t JOIN b ON b.grp = t.lang)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
             |  CAST(n_chars AS BIGINT) AS n_tokens
             |FROM sel WHERE cumb < budget ORDER BY doc_id""".stripMargin),
      doc = "EXACT token-budget mix assembly (deterministic-prefix sibling " +
        "of t69's rate sampler): per group, admit the maximal md5-ordered " +
        "document prefix whose running token mass stays strictly under the " +
        "budget. The operator decomposes the hash order into 4096 buckets " +
        "— full buckets admit via a broadcast ledger join with NO window, " +
        "only the (at most one per group) boundary bucket pays a " +
        "running-sum window bounded to ~1/4096 of its group — while the " +
        "oracle recomputes the naive whole-group window; the hash match " +
        "proves the skew-wall-free decomposition exact."
    ),
    // --------------------------------------------------------------- t109
    GraftQuery(
      "t109_image_neardup",
      (s, d) => {
        import s.implicits._
        import graft.operators.Multimodal
        // doc i and doc i+24 get IDENTICAL images (dims and gradient depend
        // on id mod 24, whose period divides both dim cycles), so pixel
        // near-dup pairs exist by construction; everything flows through
        // the REAL path — BMP encode, JDK decode, pixel average-hash,
        // pigeonhole band join, exact Hamming verify — while the oracle
        // recomputes the hashes closed-form and brute-forces ALL pairs.
        val media = Tables.documents(s, d).select($"doc_id")
          .where($"doc_id" < 48).as[Long].map { id =>
            val c = id % 24
            val w = 8 * (1 + (c % 4).toInt)
            val h = 8 * (1 + (c % 3).toInt)
            Multimodal.MediaRow(id, "image", Multimodal.encodeBmp(w, h,
              (x, y) => ((x * 7 + y * 13 + c * 11) % 256).toInt))
          }
        Multimodal.pixelNearDupPairs(media)
          .select($"id_a", $"id_b", $"hamming")
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, doc_id % 24 AS c,
             |    8 * (1 + CAST(doc_id % 24 % 4 AS INT)) AS w,
             |    8 * (1 + CAST(doc_id % 24 % 3 AS INT)) AS h
             |  FROM documents WHERE doc_id < 48),
             |s AS (
             |  SELECT doc_id, c, w, h,
             |    list_sum(flatten(list_transform(range(0, h), y ->
             |      list_transform(range(0, w), x ->
             |        (x*7 + y*13 + c*11) % 256)))) AS pix_sum
             |  FROM p),
             |hsh AS (
             |  SELECT doc_id,
             |    list_aggregate(list_transform(range(0, 64), b ->
             |      CASE WHEN 64 * list_sum(flatten(list_transform(
             |          range((b // 8) * h // 8, (b // 8 + 1) * h // 8), y ->
             |            list_transform(range((b % 8) * w // 8, (b % 8 + 1) * w // 8), x ->
             |              (x*7 + y*13 + c*11) % 256)))) > pix_sum
             |        THEN '1' ELSE '0' END), 'string_agg', '') AS bits
             |  FROM s)
             |SELECT CAST(a.doc_id AS BIGINT) AS id_a,
             |  CAST(b.doc_id AS BIGINT) AS id_b,
             |  CAST(len(list_filter(range(1, 65),
             |    i -> substr(a.bits, CAST(i AS INT), 1) <> substr(b.bits, CAST(i AS INT), 1))) AS INT) AS hamming
             |FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
             |WHERE len(list_filter(range(1, 65),
             |    i -> substr(a.bits, CAST(i AS INT), 1) <> substr(b.bits, CAST(i AS INT), 1))) <= 3
             |ORDER BY id_a, id_b""".stripMargin),
      doc = "Pixel-space banded near-dup over real decoded images — the " +
        "cross-format duplicate detector (a re-encode shares no payload " +
        "bytes but is pixel-identical): BMP encode -> JDK decode -> 8x8 " +
        "average-hash -> 16-bit pigeonhole band join -> exact Hamming " +
        "verify, against a DuckDB oracle that recomputes every hash " +
        "closed-form and brute-forces ALL pairs. The match proves the " +
        "banding lossless at Hamming<=3 AND the decode byte-exact."
    ),
    // --------------------------------------------------------------- t110
    GraftQuery(
      "t110_audio_decode",
      (s, d) => {
        import s.implicits._
        import graft.operators.Multimodal
        // REAL audio payloads: a 16-bit PCM mono WAV is synthesized per
        // document (deterministic sawtooth-ish wave from doc_id), decoded
        // back through the JDK's javax.sound.sampled parser, and the exact
        // integer statistics — squared-sample energy, zero crossings — are
        // measured from DECODED samples while the oracle computes the same
        // quantities closed-form. Any header, endianness, or sample-walk
        // error breaks the hash match.
        val media = Tables.documents(s, d).select($"doc_id")
          .where($"doc_id" < 48).as[Long].map { id =>
            val k = 3 + (id % 5)
            val n = 800 + (id % 5).toInt * 160
            val rate = 8000 + (id % 3).toInt * 4000
            Multimodal.MediaRow(id, "audio", Multimodal.encodeWav(rate,
              Array.tabulate[Short](n)(i => ((i * k + id) % 65536 - 32768).toShort)))
          }
        Multimodal.audioFeatures(media).toDF()
          .select($"doc_id", $"sample_rate",
            $"n_samples", $"energy_sq_sum", $"zero_crossings")
          .orderBy($"doc_id")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, 3 + doc_id % 5 AS k,
             |    800 + CAST(doc_id % 5 AS INT) * 160 AS n,
             |    8000 + CAST(doc_id % 3 AS INT) * 4000 AS rate
             |  FROM documents WHERE doc_id < 48)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(rate AS INT) AS sample_rate,
             |  CAST(n AS BIGINT) AS n_samples,
             |  CAST(list_sum(list_transform(range(0, n), i ->
             |    ((i*k + doc_id) % 65536 - 32768) * ((i*k + doc_id) % 65536 - 32768))) AS BIGINT) AS energy_sq_sum,
             |  CAST(list_sum(list_transform(range(1, n), i ->
             |    CASE WHEN ((i*k + doc_id) % 65536 - 32768 >= 0)
             |           <> (((i-1)*k + doc_id) % 65536 - 32768 >= 0)
             |      THEN 1 ELSE 0 END)) AS BIGINT) AS zero_crossings
             |FROM p ORDER BY doc_id""".stripMargin),
      doc = "Real audio decode round trip: per-doc 16-bit PCM mono WAV " +
        "payloads (deterministic wave, doc_id-derived rate and length) " +
        "decoded with the JDK's javax.sound.sampled parser; true sample " +
        "rate, exact integer squared-sample energy and zero-crossing " +
        "count from DECODED samples must hash-match the oracle's " +
        "closed-form computation. One narrow mapPartitions projection, " +
        "no shuffle; payloads never leave their partition."
    ),
    // --------------------------------------------------------------- t111
    GraftQuery(
      "t111_video_decode",
      (s, d) => {
        import s.implicits._
        import graft.operators.Multimodal
        // REAL video payloads: an uncompressed AVI (BI_RGB 24-bpp DIB
        // frames — a format any player opens) is synthesized per document,
        // then decoded by the RIFF container walk + exact per-frame
        // luminance sums; the oracle recomputes every frame closed-form.
        // Any chunk-alignment, header, or scanline error breaks the match.
        val media = Tables.documents(s, d).select($"doc_id")
          .where($"doc_id" < 24).as[Long].map { id =>
            val nf = 2 + (id % 3).toInt
            val w = 8 + (id % 4).toInt * 4
            val h = 6 + (id % 3).toInt * 2
            val fps = 10 + (id % 2).toInt * 5
            Multimodal.MediaRow(id, "video", Multimodal.encodeAvi(w, h, fps,
              (0 until nf).map(f =>
                (x: Int, y: Int) => ((x * 3 + y * 7 + f * 11 + id) % 256).toInt)))
          }
        Multimodal.videoFrames(media).toDF()
          .select($"doc_id", $"frame_idx", $"width", $"height", $"fps",
            $"frame_sum")
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, 2 + CAST(doc_id % 3 AS INT) AS nf,
             |    8 + CAST(doc_id % 4 AS INT) * 4 AS w,
             |    6 + CAST(doc_id % 3 AS INT) * 2 AS h,
             |    10 + CAST(doc_id % 2 AS INT) * 5 AS fps
             |  FROM documents WHERE doc_id < 24)
             |SELECT CAST(p.doc_id AS BIGINT) AS doc_id,
             |  CAST(f AS INT) AS frame_idx,
             |  CAST(w AS INT) AS width, CAST(h AS INT) AS height,
             |  CAST(fps AS INT) AS fps,
             |  CAST(list_sum(flatten(list_transform(range(0, h), y ->
             |    list_transform(range(0, w), x ->
             |      (x*3 + y*7 + f*11 + p.doc_id) % 256)))) AS BIGINT) AS frame_sum
             |FROM p CROSS JOIN range(0, 4) AS t(f)
             |WHERE f < nf
             |ORDER BY doc_id, frame_idx""".stripMargin),
      doc = "Real video decode round trip for uncompressed AVI (BI_RGB " +
        "24-bpp DIB frames): RIFF container walk (word-aligned chunks, " +
        "BITMAPINFOHEADER dims, avih frame rate) + exact integer per-frame " +
        "luminance sums, one output row per frame, against a DuckDB oracle " +
        "computing every frame closed-form. Compressed codecs stay on the " +
        "byte-level fingerprint path (no native libraries on the JVM)."
    ),
    // --------------------------------------------------------------- t112
    GraftQuery(
      "t112_frame_neardup",
      (s, d) => {
        import s.implicits._
        import graft.operators.Multimodal
        // frame content depends on (doc_id mod 8, frame), so videos id and
        // id+8 carry identical frames — duplicate frames exist within and
        // across videos by construction. Everything flows through the real
        // path (AVI encode -> container walk -> top-down per-frame hash ->
        // pigeonhole band join -> exact Hamming) while the oracle
        // recomputes every frame hash closed-form and brute-forces ALL
        // frame pairs.
        val media = Tables.documents(s, d).select($"doc_id")
          .where($"doc_id" < 24).as[Long].map { id =>
            val nf = 2 + (id % 2).toInt
            val c0 = (id % 8) * 3
            Multimodal.MediaRow(id, "video", Multimodal.encodeAvi(16, 8, 10,
              (0 until nf).map(f =>
                (x: Int, y: Int) => ((x * 5 + y * 11 + (c0 + f) * 7) % 256).toInt)))
          }
        Multimodal.frameNearDupPairs(media)
          .orderBy($"id_a", $"frame_a", $"id_b", $"frame_b")
      },
      Some("""WITH p AS (
             |  SELECT doc_id, 2 + CAST(doc_id % 2 AS INT) AS nf
             |  FROM documents WHERE doc_id < 24),
             |fr AS (
             |  SELECT doc_id, f, (doc_id % 8) * 3 + f AS c
             |  FROM p CROSS JOIN range(0, 3) AS t(f) WHERE f < nf),
             |s AS (
             |  SELECT doc_id, f, c,
             |    list_sum(flatten(list_transform(range(0, 8), y ->
             |      list_transform(range(0, 16), x ->
             |        (x*5 + y*11 + c*7) % 256)))) AS pix_sum
             |  FROM fr),
             |hsh AS (
             |  SELECT doc_id, f,
             |    list_aggregate(list_transform(range(0, 64), b ->
             |      CASE WHEN 64 * list_sum(flatten(list_transform(
             |          range((b // 8) * 8 // 8, (b // 8 + 1) * 8 // 8), y ->
             |            list_transform(range((b % 8) * 16 // 8, (b % 8 + 1) * 16 // 8), x ->
             |              (x*5 + y*11 + c*7) % 256)))) > pix_sum
             |        THEN '1' ELSE '0' END), 'string_agg', '') AS bits
             |  FROM s)
             |SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(a.f AS INT) AS frame_a,
             |  CAST(b.doc_id AS BIGINT) AS id_b, CAST(b.f AS INT) AS frame_b,
             |  CAST(len(list_filter(range(1, 65),
             |    i -> substr(a.bits, CAST(i AS INT), 1) <> substr(b.bits, CAST(i AS INT), 1))) AS INT) AS hamming
             |FROM hsh a JOIN hsh b
             |  ON (a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.f < b.f))
             |WHERE len(list_filter(range(1, 65),
             |    i -> substr(a.bits, CAST(i AS INT), 1) <> substr(b.bits, CAST(i AS INT), 1))) <= 3
             |ORDER BY id_a, frame_a, id_b, frame_b""".stripMargin),
      doc = "Video-frame near-dup across and within videos — the dedup " +
        "step before captioning spends model budget on near-identical " +
        "frames: real AVI decode per frame, top-down 8x8 average-hash, " +
        "pigeonhole band join on (video, frame) struct keys, exact Hamming " +
        "verify; the oracle recomputes every frame hash closed-form and " +
        "brute-forces all frame pairs. The match proves banding lossless " +
        "AND the bottom-up scanline flip correct (the t111 sums cannot " +
        "catch a missed flip; cell hashes can)."
    ),
    // --------------------------------------------------------------- t113
    GraftQuery(
      "t113_bpe_token_count",
      (s, d) => {
        import s.implicits._
        import graft.operators.{Bpe, TextAnalysis}
        // a FIXED merge list (the artifact `pipeline --bpe-merges` loads,
        // with a chaining merge: th+e consumes t+h's output): the oracle
        // replays the identical NUL-wrapped literal-replace chain, so the
        // REAL-tokenizer count the packing stage sizes bins with is checked
        // value-for-value against an independent engine, next to the
        // whitespace count it replaces — the divergence between the two
        // columns is the packing error a whitespace-sized bin would carry.
        val model = Bpe.BpeModel(Seq(("e", "r"), ("t", "h"), ("th", "e")))
        Tables.documents(s, d).select($"doc_id",
            TextAnalysis.tokenCount($"text").as("ws_tokens"),
            Bpe.tokenCount($"text", model).as("bpe_tokens"))
          .orderBy($"doc_id")
      },
      Some("""WITH w AS (
             |  SELECT doc_id, text,
             |    list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ws
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
             |  CAST(coalesce(list_sum(list_transform(ws, wd ->
             |    len(list_filter(string_split(
             |      replace(replace(replace(
             |        regexp_replace(wd, '(.)', chr(0) || '\1' || chr(0), 'g'),
             |        chr(0)||'e'||chr(0)||chr(0)||'r'||chr(0), chr(0)||'er'||chr(0)),
             |        chr(0)||'t'||chr(0)||chr(0)||'h'||chr(0), chr(0)||'th'||chr(0)),
             |        chr(0)||'th'||chr(0)||chr(0)||'e'||chr(0), chr(0)||'the'||chr(0)),
             |      chr(0)), x -> x <> '')))), 0) AS BIGINT) AS bpe_tokens
             |FROM w ORDER BY doc_id""".stripMargin),
      doc = "Real-tokenizer token counts under a fixed BPE merge list (the " +
        "packing/budget weight a training run consumes) vs the whitespace " +
        "count: the oracle replays the NUL-wrapped literal-replace merge " +
        "chain per word, proving encode's greedy left-to-right merge " +
        "application value-identical cross-engine."
    ),
    // --------------------------------------------------------------- t114
    GraftQuery(
      "t114_ivf_append",
      (s, d) => {
        import s.implicits._
        import graft.operators.Similarity
        val emb = graft.core.Tables.embeddings(s, d)
        // the continuous-crawl shape for vectors: the index is built on the
        // corpus that existed at build time (even vec_ids), the rest
        // arrives later and is appended under the FROZEN quantizer — no
        // retrain, no history reads. The grown index must then behave as
        // a first-class index over the whole corpus: every AnnGates claim
        // (exact sims, dense ranks, no self/dups) plus a recall floor vs
        // brute force over ALL vectors. A fresh temp dir per invocation:
        // ivfAppend appends, so a reused dir would double-insert.
        val dir = java.nio.file.Files.createTempDirectory("graft_t114").toString
        Similarity.ivfBuild(emb.where($"vec_id" % 2 === 0),
          "vec_id", "embedding", nCells = 8, dir)
        Similarity.ivfAppend(s, dir, emb.where($"vec_id" % 2 =!= 0),
          "vec_id", "embedding")
        val queries = emb.filter($"vec_id" < 3)
        val topk = Similarity.ivfQuery(s, dir, queries,
          "vec_id", "embedding", k = 5, nProbe = 5)
        // measured (GateProbe ann): 0.60/0.80/1.00 at sf0.001/0.01/0.1 —
        // the half-corpus quantizer costs recall exactly where the corpus
        // is tiny (centroids from 250 vectors), and the floor locks that
        // measured state
        AnnGates.verdict(emb, queries, topk, k = 5, recallFloor = 0.6)
      },
      Some(AnnGates.oracle),
      doc = "Incremental IVF: build on half the corpus, append the rest " +
        "under the frozen quantizer, query the grown index — sims exact, " +
        "ranks dense, no self/dups, recall@5 vs brute force over the FULL " +
        "corpus above the floor; violations + sentinel, constant oracle.",
      gate = true
    ),
    // --------------------------------------------------------------- t115
    GraftQuery(
      "t115_train_shards",
      (s, d) => {
        import s.implicits._
        // shard assignment for the materialized training order (the files
        // a data loader consumes): floor(bucket(md5(epoch:id)) * n / 2^32)
        // — exact in IEEE doubles (bucket*n < 2^53; /2^32 is a power of
        // two), so DuckDB's integer `//` reproduces it bit-for-bit. Two
        // epochs checked: a new epoch is a fresh deterministic permutation.
        graft.core.Tables.documents(s, d).select($"doc_id",
            graft.operators.TrainingOrder.shard($"doc_id", epoch = 0, nShards = 8).as("shard"),
            graft.operators.TrainingOrder.shard($"doc_id", epoch = 1, nShards = 8).as("shard_e1"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(CAST(concat('0x', substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) * 8 // 4294967296 AS INT) AS shard,
             |  CAST(CAST(concat('0x', substr(md5('1:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) * 8 // 4294967296 AS INT) AS shard_e1
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Deterministic training-shard assignment (TrainingOrder.shard) " +
        "for two epochs vs DuckDB's integer md5-bucket arithmetic — the " +
        "shard layout writeShards materializes is a pure, engine-" +
        "independent function of (epoch, id)."
    ),
    // --------------------------------------------------------------- t116
    GraftQuery(
      "t116_mixture_shards",
      (s, d) => {
        import s.implicits._
        // shard the INTERLEAVED mixture order (the t82 construction) into
        // exact-balanced rank ranges and read the written layout back: the
        // loader-facing contract is engine-independent integer arithmetic —
        // shard = (0-based rank by global_pos) * n // total — which DuckDB
        // replays against its own window interleave. Exercises the real
        // write path (range shuffle + pinned-partition rank + partitioned
        // write), not just the shard formula.
        val ordered = graft.operators.TrainingOrder
          .interleave(Tables.documents(s, d), $"lang", $"doc_id",
            Seq("de", "en", "es", "fr", "zh"))
        val dir = java.nio.file.Files.createTempDirectory("graft_t116").toString
        graft.operators.TrainingOrder
          .writeMixtureShards(ordered, $"global_pos", s"$dir/shards", 8)
          .select($"doc_id", $"lang", $"global_pos",
            $"shard".cast("int").as("shard"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
             |    md5('0:' || CAST(doc_id AS VARCHAR)) AS skey,
             |    CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
             |      WHEN 'fr' THEN 3 WHEN 'zh' THEN 4 END AS source_idx
             |  FROM documents),
             |o AS (SELECT doc_id, lang,
             |    CAST((row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) - 1) * 5
             |      + source_idx AS BIGINT) AS global_pos
             |  FROM t WHERE source_idx IS NOT NULL)
             |SELECT doc_id, lang, global_pos,
             |  CAST((row_number() OVER (ORDER BY global_pos) - 1) * 8
             |    // (SELECT count(*) FROM o) AS INT) AS shard
             |FROM o ORDER BY doc_id""".stripMargin),
      doc = "Mixture-order training shards (TrainingOrder.writeMixtureShards): " +
        "the interleaved corpus lands in exact-balanced rank-range shard " +
        "dirs whose (shard, file, row) read order replays the round-robin " +
        "mixture — shard ids verified value-for-value against DuckDB's " +
        "rank arithmetic over its own replay of the interleave."
    ),
    // --------------------------------------------------------------- t117
    GraftQuery(
      "t117_pq_rerank",
      (s, d) => {
        import s.implicits._
        import graft.operators.{ProductQuantizer => PQ}
        // the PQ STORAGE tier (codes are 16 small ints per 64-float vector;
        // the query scan reads codes only) queried in the production shape:
        // ADC retrieves a 100-candidate pool, exact cosine re-ranks the
        // pool — so emitted sims are exact and every AnnGates theorem
        // applies unchanged. Measured recall@5 at the locked config
        // (m=16, nCodes=16, rerank=100, GateProbe ann sweep, re-confirmed
        // round 15): 0.933/1.000/0.867 at sf0.001/0.01/0.1 — floor 0.8.
        // The model is the shared per-corpus fixture (deterministic per
        // corpus; t118 remains the train-in-query canary).
        val emb = graft.core.Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 3)
        val model = AnnGates.Fixture.rawModel(s, d)
        val topk = PQ.pqTopKReranked(emb, queries, "vec_id", "embedding",
          k = 5, model, rerank = 100)
        AnnGates.verdict(emb, queries, topk, k = 5, recallFloor = 0.8)
      },
      Some(AnnGates.oracle),
      doc = "Product-quantization ANN (storage tier): per-subspace k-means " +
        "codebooks, code-only ADC scan via the native graft_pq_adc " +
        "expression, exact cosine re-rank of the candidate pool (the FAISS " +
        "refine shape) — sims exact, ranks dense, no self/dups, recall@5 " +
        ">= 0.8 vs brute force; violations + sentinel, constant oracle.",
      gate = true
    ),
    // --------------------------------------------------------------- t118
    GraftQuery(
      "t118_ivfpq",
      (s, d) => {
        import s.implicits._
        import graft.operators.{ProductQuantizer => PQ}
        // the composed billion-scale layout (FAISS IVFPQ + refine) in the
        // RESIDUAL encoding — codes quantize unit(vec) − centroid(cell)
        // with the coarse quantizer trained ON THE UNIT SPHERE, the
        // classic IVF-ADC layout (round-15 sweep, same code budget: pool
        // recall at rerank=25 on the sf0.1 corpus 0.333 → 0.733 — the
        // residual encoding halves the rerank I/O a recall target costs).
        // One cell-partitioned table carrying PQ codes AND raw vectors; a
        // query pays three strictly shrinking reads — probed-cell
        // partition pruning, codes-only ADC pool, pool-only exact refine
        // (plan shape pinned in PlanShapeSpec). Measured recall@5 at the
        // locked config (nCells=8, nProbe=5, m=16/nCodes=16, rerank=100,
        // GateProbe ann sweep): 0.800/0.867/0.800 at sf0.001/0.01/0.1 —
        // floor 0.8, the same at-the-floor determinism contract as t22.
        // This gate is the END-TO-END canary: it trains both quantizers
        // in-query (the other PQ gates assert against the shared fixture).
        val emb = graft.core.Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 3)
        val dir = java.nio.file.Files.createTempDirectory("graft_t118").toString
        PQ.ivfPqBuildResidual(emb, "vec_id", "embedding", nCells = 8,
          m = 16, nCodes = 16, indexDir = dir)
        val topk = PQ.ivfPqQuery(s, dir, queries, "vec_id", "embedding",
          k = 5, nProbe = 5, rerank = 100)
        AnnGates.verdict(emb, queries, topk, k = 5, recallFloor = 0.8)
      },
      Some(AnnGates.oracle),
      doc = "IVF-PQ composed index (RESIDUAL encoding — classic IVF-ADC): " +
        "cell-partitioned PQ codes + vectors, probed-cell pruning at the " +
        "scan, codes-only ADC pool, exact cosine refine of pool rows — " +
        "sims exact, ranks dense, no self/dups, recall@5 >= 0.8 vs brute " +
        "force; violations + sentinel, constant oracle. Trains both " +
        "quantizers in-query (the end-to-end canary).",
      gate = true
    ),
    // --------------------------------------------------------------- t119
    GraftQuery(
      "t119_ivfpq_append",
      (s, d) => {
        import s.implicits._
        import graft.operators.{ProductQuantizer => PQ}
        // the composed layout's incremental lifecycle (t114's analog)
        // under the RESIDUAL encoding: build on the half that existed,
        // append the rest under BOTH frozen quantizers (coarse cells +
        // residual PQ codebooks — the anchors are float-table functions,
        // so appended codes match what a build over the union would
        // write), then hold the grown index to every AnnGates theorem
        // plus a recall floor over the fixture corpus (the REDUCED
        // residue class since round-18 — see AnnGates.Fixture.reduced;
        // re-measured there: 1.000/0.600/0.933 at sf0.001/0.01/0.1, the
        // 0.6 floor holds unchanged). The index is the shared per-corpus
        // fixture (t118 is the train-in-query canary; the lifecycle
        // itself is spec-pinned in ProductQuantizerSpec's associativity
        // test).
        val emb = AnnGates.Fixture.reduced(s, d)
        val queries = emb.filter($"vec_id" < 9)
        val dir = AnnGates.Fixture.halfAppendedResidualDir(s, d)
        val topk = PQ.ivfPqQuery(s, dir, queries, "vec_id", "embedding",
          k = 5, nProbe = 5, rerank = 100)
        AnnGates.verdict(emb, queries, topk, k = 5, recallFloor = 0.6)
      },
      Some(AnnGates.oracle),
      doc = "Incremental IVF-PQ (residual encoding): build on half the " +
        "corpus, append the rest under the frozen coarse + residual PQ " +
        "quantizers, query the grown index — sims exact, ranks dense, no " +
        "self/dups, recall@5 vs brute force over the FULL corpus >= 0.6 " +
        "(raised from 0.5: the residual encoding lifted the measured " +
        "small-corpus floor); violations + sentinel, constant oracle.",
      gate = true
    ),
    // --------------------------------------------------------------- t127
    GraftQuery(
      "t127_rule_impact",
      (s, d) => {
        import s.implicits._
        // default thresholds ON PURPOSE: the report's job is to show that
        // r_stopwords is the binding rule on this corpus (100% fail — the
        // very insight t123's threshold choice encodes), and n_unique_fail
        // quantifies what relaxing each rule would actually buy
        graft.operators.QualityRules.ruleImpact(
          Tables.documents(s, d), $"lang", $"text")
      },
      Some("""WITH w AS (SELECT lang, text,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS ws,
             |    string_split_regex(trim(text), '\s+') AS ws0,
             |    string_split(text, chr(10)) AS ls
             |  FROM documents),
             |s AS (SELECT lang, CAST(len(ws) AS BIGINT) AS n_words,
             |  CASE WHEN len(ws) > 0
             |    THEN CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) END AS mean_word_len,
             |  CASE WHEN len(ws) > 0
             |    THEN CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(ws) END AS alpha_frac,
             |  CASE WHEN len(ws) > 0 THEN CAST(
             |      (length(text) - length(replace(text, '#', '')))
             |      + (length(text) - length(replace(text, '...', ''))) // 3
             |      + (length(text) - length(replace(text, '…', ''))) AS DOUBLE) / len(ws) END AS symbol_ratio,
             |  (CASE WHEN list_contains(ws0, 'the') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'be') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'to') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'of') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'and') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'that') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'have') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'with') THEN 1 ELSE 0 END) AS stop_hits,
             |  CASE WHEN len(ls) > 0
             |    THEN CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE) / len(ls) END AS bullet_frac,
             |  CASE WHEN len(ls) > 0
             |    THEN CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE) / len(ls) END AS ellipsis_frac
             |  FROM w),
             |f AS (SELECT lang,
             |  CASE WHEN COALESCE(n_words BETWEEN 10 AND 100000, false) THEN 0 ELSE 1 END AS f_wc,
             |  CASE WHEN COALESCE(mean_word_len BETWEEN 2.0 AND 10.0, false) THEN 0 ELSE 1 END AS f_mwl,
             |  CASE WHEN COALESCE(symbol_ratio <= 0.1, false) THEN 0 ELSE 1 END AS f_sym,
             |  CASE WHEN COALESCE(bullet_frac <= 0.9, false) THEN 0 ELSE 1 END AS f_bul,
             |  CASE WHEN COALESCE(ellipsis_frac <= 0.3, false) THEN 0 ELSE 1 END AS f_ell,
             |  CASE WHEN COALESCE(alpha_frac >= 0.8, false) THEN 0 ELSE 1 END AS f_alp,
             |  CASE WHEN COALESCE(stop_hits >= 2, false) THEN 0 ELSE 1 END AS f_stp
             |  FROM s),
             |g AS (SELECT *, f_wc+f_mwl+f_sym+f_bul+f_ell+f_alp+f_stp AS nf FROM f),
             |u AS (
             |  SELECT lang, 'r_word_count' AS rule, COUNT(*) AS n_docs,
             |    CAST(SUM(f_wc) AS BIGINT) AS n_fail,
             |    CAST(SUM(CASE WHEN f_wc = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_fail
             |  FROM g GROUP BY 1
             |  UNION ALL SELECT lang, 'r_mean_word_len', COUNT(*),
             |    CAST(SUM(f_mwl) AS BIGINT),
             |    CAST(SUM(CASE WHEN f_mwl = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g GROUP BY 1
             |  UNION ALL SELECT lang, 'r_symbol_ratio', COUNT(*),
             |    CAST(SUM(f_sym) AS BIGINT),
             |    CAST(SUM(CASE WHEN f_sym = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g GROUP BY 1
             |  UNION ALL SELECT lang, 'r_bullet_lines', COUNT(*),
             |    CAST(SUM(f_bul) AS BIGINT),
             |    CAST(SUM(CASE WHEN f_bul = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g GROUP BY 1
             |  UNION ALL SELECT lang, 'r_ellipsis_lines', COUNT(*),
             |    CAST(SUM(f_ell) AS BIGINT),
             |    CAST(SUM(CASE WHEN f_ell = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g GROUP BY 1
             |  UNION ALL SELECT lang, 'r_alpha_words', COUNT(*),
             |    CAST(SUM(f_alp) AS BIGINT),
             |    CAST(SUM(CASE WHEN f_alp = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g GROUP BY 1
             |  UNION ALL SELECT lang, 'r_stopwords', COUNT(*),
             |    CAST(SUM(f_stp) AS BIGINT),
             |    CAST(SUM(CASE WHEN f_stp = 1 AND nf = 1 THEN 1 ELSE 0 END) AS BIGINT) FROM g GROUP BY 1)
             |SELECT lang AS "group", rule, n_docs, n_fail, n_unique_fail,
             |  CAST(n_fail AS DOUBLE) / n_docs AS fail_rate
             |FROM u ORDER BY "group", rule""".stripMargin),
      doc = "Per-(language, rule) impact breakdown of the Gopher chain — " +
        "the WHY behind t123's kill counts: docs failing each rule and " +
        "docs failing ONLY that rule (what relaxing it would actually " +
        "buy — multi-rule failures are not recovered by relaxing one). " +
        "ONE scan, 7 structs per doc, one hash agg to (group, rule) " +
        "cardinality; counts exact, fail_rate a single IEEE division. " +
        "On this corpus it shows r_stopwords binding at 100% — the " +
        "insight t123's threshold choice encodes."
    ),
    // --------------------------------------------------------------- t125
    GraftQuery(
      "t125_ivf_filtered",
      (s, d) => {
        import s.implicits._
        // filtered ANN over the persisted index: top-k among the 1/3 of
        // vectors the predicate allows. The semi-join restricts candidates
        // AFTER partition pruning, so probes are chosen by the query alone
        // and a selective filter thins probed cells — measured recall@5 at
        // the production config (nCells=8, nProbe=5): 0.667 / 0.800 at
        // sf0.001 / sf0.01 vs the FILTERED brute force; floor 0.6 locks
        // that regime (the t119 pattern: measure, then lock).
        val emb = graft.core.Tables.embeddings(s, d)
        val allowed = emb.where($"vec_id" % 3 === 0)
        val queries = emb.filter($"vec_id" < 3)
        val dir = java.nio.file.Files.createTempDirectory("graft_t125").toString
        graft.operators.Similarity.ivfBuild(emb, "vec_id", "embedding", 8, dir)
        val topk = graft.operators.Similarity.ivfQueryFiltered(s, dir,
          queries, "vec_id", "embedding", allowed, "vec_id", k = 5, nProbe = 5)
        AnnGates.verdict(allowed, queries, topk, k = 5, recallFloor = 0.6)
      },
      Some(AnnGates.oracle),
      doc = "Filtered ANN gate: top-k under an allowed-id predicate via the " +
        "persisted IVF index — sims exact, ranks dense, no self/dups, no " +
        "disallowed id can surface (semi-join before scoring), recall@5 vs " +
        "brute force over the FILTERED corpus above the floor; the " +
        "exhaustive-probe theorem (nProbe = nCells ≡ filtered brute force " +
        "row-for-row) is spec-pinned at both driver SFs.",
      gate = true
    ),
    // --------------------------------------------------------------- t126
    GraftQuery(
      "t126_ivfpq_filtered",
      (s, d) => {
        import s.implicits._
        import graft.operators.{ProductQuantizer => PQ}
        // t125's composed sibling over the RESIDUAL layout: the
        // allowed-id semi-join restricts the CODES scan before ADC
        // pooling, so the rerank budget is spent on allowed candidates
        // only. Since round-18 the query target is the SHARED appended
        // fixture over the reduced corpus (a second full-build fixture
        // bought nothing but its training wall); re-measured there at
        // the production config (nCells=8, nProbe=5, rerank=100,
        // 1/3-selective filter — GateProbe fixtures sweep):
        // 0.867/0.667/0.733 at sf0.001/0.01/0.1, floor 0.6 holds.
        // Harsher selectivities are covered by t128 and the
        // adaptive-probe spec.
        val emb = AnnGates.Fixture.reduced(s, d)
        val allowed = emb.where($"vec_id" % 9 === 0)
        val queries = emb.filter($"vec_id" < 9)
        val dir = AnnGates.Fixture.halfAppendedResidualDir(s, d)
        val topk = PQ.ivfPqQueryFiltered(s, dir, queries, "vec_id",
          "embedding", allowed, "vec_id", k = 5, nProbe = 5, rerank = 100)
        AnnGates.verdict(allowed, queries, topk, k = 5, recallFloor = 0.6)
      },
      Some(AnnGates.oracle),
      doc = "Filtered IVF-PQ gate (residual encoding, shared fixture " +
        "index): top-k under an allowed-id predicate via the composed " +
        "index — the semi-join precedes ADC pooling (honest rerank " +
        "budget), sims exact, ranks dense, no self/dups/disallowed, " +
        "recall@5 vs brute force over the FILTERED corpus above the floor; " +
        "the exhaustive theorem (all cells + pool >= allowed corpus ≡ " +
        "filtered brute force) is spec-pinned at both driver SFs.",
      gate = true
    ),
    // --------------------------------------------------------------- t120
    GraftQuery(
      "t120_dist_drift",
      (s, d) => {
        import s.implicits._
        val before = Tables.documents(s, d)
        // deterministic "next snapshot" with a genuine SHAPE shift (t62's
        // profile drift cannot see it: null rates and ranges barely move):
        // 10% of rows dropped by the keyed Bernoulli, every 7th doc
        // relabeled to a new language — the changed-crawl-frontier signal
        val after = before
          .where(graft.operators.Sampling.bernoulli($"doc_id", 0.9))
          .withColumn("lang",
            when($"doc_id" % 7 === 0, lit("xx")).otherwise($"lang"))
        graft.operators.Profiler.distributionDrift(before, after, Seq(
          "lang" -> $"lang",
          "n_chars" -> graft.operators.Profiler.log2Bucket($"n_chars")))
          .orderBy($"dim", $"value")
      },
      Some("""WITH aft AS (
             |  SELECT CASE WHEN doc_id % 7 = 0 THEN 'xx' ELSE lang END AS lang,
             |    n_chars
             |  FROM documents
             |  WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             |    < 0.9 * 4294967296.0),
             |vb AS (
             |  SELECT 'lang' AS dim, COALESCE(CAST(lang AS VARCHAR), '(null)') AS value FROM documents
             |  UNION ALL
             |  SELECT 'n_chars', CASE WHEN n_chars IS NOT NULL AND n_chars > 0
             |    THEN CAST(((CAST(n_chars AS BIGINT) >> GREATEST(length(bin(CAST(n_chars AS BIGINT))) - 5, 0))
             |               << GREATEST(length(bin(CAST(n_chars AS BIGINT))) - 5, 0)) AS VARCHAR)
             |    ELSE '(null)' END FROM documents),
             |va AS (
             |  SELECT 'lang' AS dim, COALESCE(CAST(lang AS VARCHAR), '(null)') AS value FROM aft
             |  UNION ALL
             |  SELECT 'n_chars', CASE WHEN n_chars IS NOT NULL AND n_chars > 0
             |    THEN CAST(((CAST(n_chars AS BIGINT) >> GREATEST(length(bin(CAST(n_chars AS BIGINT))) - 5, 0))
             |               << GREATEST(length(bin(CAST(n_chars AS BIGINT))) - 5, 0)) AS VARCHAR)
             |    ELSE '(null)' END FROM aft),
             |cb AS (SELECT dim, value, COUNT(*) AS nb FROM vb GROUP BY 1, 2),
             |ca AS (SELECT dim, value, COUNT(*) AS na FROM va GROUP BY 1, 2),
             |j AS (
             |  SELECT COALESCE(cb.dim, ca.dim) AS dim, COALESCE(cb.value, ca.value) AS value,
             |    COALESCE(nb, 0) AS n_before, COALESCE(na, 0) AS n_after
             |  FROM cb FULL OUTER JOIN ca ON cb.dim = ca.dim AND cb.value = ca.value),
             |tt AS (SELECT dim, SUM(n_before) AS tb, SUM(n_after) AS ta FROM j GROUP BY 1),
             |w AS (
             |  SELECT j.dim, j.value, n_before, n_after, tb, ta,
             |    abs(CAST(n_after AS HUGEINT) * tb - CAST(n_before AS HUGEINT) * ta) AS num
             |  FROM j JOIN tt USING (dim))
             |SELECT dim, value, n_before, n_after,
             |  CAST(n_before AS DOUBLE) / tb AS share_before,
             |  CAST(n_after AS DOUBLE) / ta AS share_after,
             |  (CAST(n_after AS DOUBLE) / ta) - (CAST(n_before AS DOUBLE) / tb) AS share_delta,
             |  CAST(SUM(num) OVER (PARTITION BY dim) AS DOUBLE)
             |    / (2.0 * CAST(tb AS DOUBLE) * CAST(ta AS DOUBLE)) AS tv
             |FROM w ORDER BY dim, value""".stripMargin),
      doc = "Distribution-shape drift between snapshots: per-(dim, value) " +
        "share deltas plus a per-dimension total-variation distance — the " +
        "corpus-side analog of the ANN quantizer-drift diagnostic (a " +
        "shifted mix is a changed training recipe). TV folds as an EXACT " +
        "integer sum divided once, shares are single divisions — every " +
        "double is bit-replayable cross-engine. One scan + one hash agg " +
        "per side; everything after is category-scale."
    ),
    // --------------------------------------------------------------- t121
    GraftQuery(
      "t121_dedup_sensitivity",
      (s, d) => {
        import s.implicits._
        DedupOps.jaccardThresholdSensitivity(Tables.documents(s, d),
          "doc_id", "text", groupCol = "source", n = 3, den = 20, minT = 10)
          .orderBy($"t")
      },
      Some("""WITH sets AS (
             |  SELECT doc_id, source, list_distinct(list_transform(
             |    range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
             |    i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |  FROM documents),
             |p AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |    (20 * len(list_intersect(a.sh, b.sh)))
             |      // (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS tmax
             |  FROM sets a JOIN sets b
             |    ON a.source = b.source AND a.doc_id < b.doc_id
             |  WHERE len(list_intersect(a.sh, b.sh)) > 0),
             |q AS (SELECT * FROM p WHERE tmax >= 10),
             |dh AS (SELECT id_b, MAX(tmax) AS dmax FROM q GROUP BY 1),
             |g AS (SELECT t FROM range(10, 20) r(t))
             |SELECT CAST(g.t AS INTEGER) AS t,
             |  CAST(g.t AS DOUBLE) / 20 AS threshold,
             |  (SELECT COUNT(*) FROM dh WHERE dmax >= g.t) AS docs_removed,
             |  (SELECT COUNT(*) FROM q WHERE tmax >= g.t) AS pairs
             |FROM g ORDER BY t""".stripMargin),
      doc = "Near-dup threshold sensitivity: docs/pairs a first-wins dedup " +
        "pass would remove at EVERY threshold of the 0.50-0.95 grid, from " +
        "ONE candidate pass — the report a curation run reads before " +
        "committing to a threshold. All threshold tests are integer " +
        "(den*common >= t*union), so the brute-force DuckDB oracle replays " +
        "the counts exactly; suffix sums run on <= 11-row histograms."
    ),
    // --------------------------------------------------------------- t122
    GraftQuery(
      "t122_mix_feasibility",
      (s, d) => {
        import s.implicits._
        // recipe chosen to exercise every status against the shipped
        // corpus: en downsamples (budget < supply at both SFs), de repeats
        // (budget >> supply), xx is missing (recipe typo / empty source),
        // es/fr/zh are unbudgeted (their mass is all surplus)
        graft.operators.Sampling.mixFeasibility(
          Tables.documents(s, d), $"lang",
          graft.operators.QualityRules.wordCount($"text"),
          Seq("de" -> 40000L, "en" -> 5000L, "xx" -> 1000L))
      },
      Some("""WITH t AS (
             |  SELECT lang AS grp, COUNT(*) AS docs,
             |    CAST(SUM(len(list_filter(string_split_regex(trim(text), '\s+'),
             |      x -> length(x) > 0))) AS BIGINT) AS toks
             |  FROM documents GROUP BY 1),
             |b AS (SELECT * FROM (VALUES
             |  ('de', CAST(40000 AS BIGINT)), ('en', CAST(5000 AS BIGINT)),
             |  ('xx', CAST(1000 AS BIGINT))) v(grp, budget)),
             |j AS (
             |  SELECT COALESCE(t.grp, b.grp) AS grp,
             |    COALESCE(docs, CAST(0 AS BIGINT)) AS docs_available,
             |    COALESCE(toks, CAST(0 AS BIGINT)) AS tokens_available, budget
             |  FROM t FULL OUTER JOIN b ON t.grp = b.grp)
             |SELECT grp AS "group", docs_available, tokens_available, budget,
             |  CASE WHEN budget IS NULL OR tokens_available = 0 THEN NULL
             |       WHEN budget >= tokens_available THEN 1.0
             |       ELSE CAST(budget AS DOUBLE) / CAST(tokens_available AS DOUBLE)
             |  END AS keep_rate,
             |  CASE WHEN budget IS NULL OR tokens_available = 0 THEN NULL
             |       ELSE CAST(budget AS DOUBLE) / CAST(tokens_available AS DOUBLE)
             |  END AS epochs,
             |  CASE WHEN budget IS NULL THEN CAST(0 AS BIGINT)
             |       ELSE GREATEST(budget - tokens_available, CAST(0 AS BIGINT))
             |  END AS deficit_tokens,
             |  CASE WHEN budget IS NULL THEN tokens_available
             |       ELSE GREATEST(tokens_available - budget, CAST(0 AS BIGINT))
             |  END AS surplus_tokens,
             |  CASE WHEN budget IS NULL THEN 'unbudgeted'
             |       WHEN tokens_available = 0 THEN 'missing'
             |       WHEN budget > tokens_available THEN 'repeat'
             |       WHEN budget = tokens_available THEN 'exact'
             |       ELSE 'downsample' END AS status
             |FROM j ORDER BY "group"""".stripMargin),
      doc = "Mix-feasibility forecast: for every group in the recipe OR the " +
        "corpus, available docs/tokens vs budget, the sampler's keep rate, " +
        "epochs (= budget/tokens; > 1 is the data-constrained repetition " +
        "regime), deficit/surplus, and a status line — the planning report " +
        "read BEFORE committing to a token recipe. Full outer join makes " +
        "both failure directions (typo'd recipe key, surprise corpus group) " +
        "rows instead of silent zero-samples. One scan + one hash agg; " +
        "rates are single IEEE divisions of exact integers."
    ),
    // --------------------------------------------------------------- t123
    GraftQuery(
      "t123_filter_impact",
      (s, d) => {
        import s.implicits._
        // minStopHits = 1: the synthetic corpus has no doc with two
        // English stopwords (the published default of 2 removes 100% —
        // a vacuous keep side); at 1, ~78% survive with real per-language
        // spread, so BOTH sides of every rate exercise non-trivially
        graft.operators.Profiler.filterImpact(Tables.documents(s, d),
          $"lang", graft.operators.QualityRules.keep($"text",
            graft.operators.QualityRules.Thresholds(minStopHits = 1L)),
          graft.operators.QualityRules.wordCount($"text"))
      },
      Some("""WITH w AS (SELECT lang, text,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS ws,
             |    string_split_regex(trim(text), '\s+') AS ws0,
             |    string_split(text, chr(10)) AS ls
             |  FROM documents),
             |s AS (SELECT lang, CAST(len(ws) AS BIGINT) AS n_words,
             |  CASE WHEN len(ws) > 0
             |    THEN CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) END AS mean_word_len,
             |  CASE WHEN len(ws) > 0
             |    THEN CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(ws) END AS alpha_frac,
             |  CASE WHEN len(ws) > 0 THEN CAST(
             |      (length(text) - length(replace(text, '#', '')))
             |      + (length(text) - length(replace(text, '...', ''))) // 3
             |      + (length(text) - length(replace(text, '…', ''))) AS DOUBLE) / len(ws) END AS symbol_ratio,
             |  (CASE WHEN list_contains(ws0, 'the') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'be') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'to') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'of') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'and') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'that') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'have') THEN 1 ELSE 0 END
             |   + CASE WHEN list_contains(ws0, 'with') THEN 1 ELSE 0 END) AS stop_hits,
             |  CASE WHEN len(ls) > 0
             |    THEN CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•]'))) AS DOUBLE) / len(ls) END AS bullet_frac,
             |  CASE WHEN len(ls) > 0
             |    THEN CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS DOUBLE) / len(ls) END AS ellipsis_frac
             |  FROM w),
             |k AS (SELECT lang, n_words,
             |  (COALESCE(n_words BETWEEN 10 AND 100000, false)
             |   AND COALESCE(mean_word_len BETWEEN 2.0 AND 10.0, false)
             |   AND COALESCE(symbol_ratio <= 0.1, false)
             |   AND COALESCE(bullet_frac <= 0.9, false)
             |   AND COALESCE(ellipsis_frac <= 0.3, false)
             |   AND COALESCE(alpha_frac >= 0.8, false)
             |   AND COALESCE(stop_hits >= 1, false)) AS keep
             |  FROM s),
             |g AS (SELECT lang AS grp, COUNT(*) AS docs_before,
             |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
             |  CAST(SUM(n_words) AS BIGINT) AS tokens_before,
             |  CAST(SUM(CASE WHEN keep THEN n_words ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS tokens_kept
             |  FROM k GROUP BY 1),
             |t AS (SELECT CAST(SUM(tokens_before) AS BIGINT) AS tot_b,
             |  CAST(SUM(tokens_kept) AS BIGINT) AS tot_k FROM g)
             |SELECT grp AS "group", docs_before, docs_kept,
             |  docs_before - docs_kept AS docs_removed,
             |  tokens_before, tokens_kept,
             |  tokens_before - tokens_kept AS tokens_removed,
             |  CAST(docs_kept AS DOUBLE) / docs_before AS doc_keep_rate,
             |  CASE WHEN tokens_before > 0
             |    THEN CAST(tokens_kept AS DOUBLE) / tokens_before END AS token_keep_rate,
             |  CASE WHEN tot_b > 0
             |    THEN CAST(tokens_before AS DOUBLE) / tot_b END AS share_before,
             |  CASE WHEN tot_k > 0
             |    THEN CAST(tokens_kept AS DOUBLE) / tot_k END AS share_after,
             |  COALESCE(CASE WHEN tot_k > 0
             |      THEN CAST(tokens_kept AS DOUBLE) / tot_k END, 0.0)
             |    - COALESCE(CASE WHEN tot_b > 0
             |      THEN CAST(tokens_before AS DOUBLE) / tot_b END, 0.0) AS share_delta
             |FROM g CROSS JOIN t ORDER BY "group"""".stripMargin),
      doc = "Filter-impact report: what the Gopher rule chain (t73) does to " +
        "the per-language MIX — docs/tokens kept and removed, keep rates, " +
        "and each language's token share before vs after the filter. " +
        "share_delta is the recipe-change signal: a filter that halves a " +
        "language's share is a mix decision, not a cleanup. ONE scan, one " +
        "hash agg (kept masses as conditional sums — the filtered side is " +
        "never re-scanned); every rate/share a single IEEE division."
    ),
    // --------------------------------------------------------------- t124
    GraftQuery(
      "t124_repeat_to_budget",
      (s, d) => {
        import s.implicits._
        // de's budget is ~2.3x its mass (k = 2 full epochs + a boundary
        // prefix at both SFs), en's is under-mass (partial-only — the
        // exactTokenBudgets regime), zh's is zero (emits nothing);
        // es/fr are unbudgeted (dropped, the recipe convention)
        graft.operators.Sampling.repeatToBudget(
          Tables.documents(s, d), $"lang", $"doc_id", $"n_chars",
          Seq("de" -> 50000L, "en" -> 5000L, "zh" -> 0L))
          .select($"doc_id".cast("bigint").as("doc_id"), $"lang", $"epoch")
          .orderBy($"lang", $"epoch", $"doc_id")
      },
      Some("""WITH b(grp, budget) AS (VALUES
             |    ('de', CAST(50000 AS BIGINT)), ('en', CAST(5000 AS BIGINT)),
             |    ('zh', CAST(0 AS BIGINT))),
             |t AS (SELECT doc_id, lang, n_chars,
             |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
             |tot AS (SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tok
             |  FROM t GROUP BY 1),
             |s AS (SELECT b.grp, b.budget, tot.tok,
             |    CASE WHEN tok > 0 THEN budget // tok ELSE CAST(0 AS BIGINT) END AS k,
             |    CASE WHEN tok > 0 THEN budget % tok ELSE budget END AS rem
             |  FROM b JOIN tot ON b.grp = tot.lang),
             |eps AS (SELECT grp, unnest(range(k)) AS epoch FROM s),
             |fullep AS (
             |  SELECT t.doc_id, t.lang, eps.epoch
             |  FROM t JOIN eps ON t.lang = eps.grp),
             |cums AS (SELECT doc_id, lang,
             |    COALESCE(SUM(n_chars) OVER (PARTITION BY lang
             |      ORDER BY h, CAST(doc_id AS VARCHAR)
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
             |  FROM t),
             |part AS (
             |  SELECT c.doc_id, c.lang, s.k AS epoch
             |  FROM cums c JOIN s ON c.lang = s.grp
             |  WHERE c.cumb < s.rem)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, epoch FROM fullep
             |UNION ALL
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, epoch FROM part
             |ORDER BY lang, epoch, doc_id""".stripMargin),
      doc = "Data-constrained recipe execution (the 'repeat' status of t122 " +
        "materialized): k = budget div mass FULL epochs per group plus a " +
        "partial epoch holding the exact md5-ordered prefix under the " +
        "remainder — emitted multiplicity is a pure function of the data, " +
        "and budget <= mass degenerates to t108's exactTokenBudgets with " +
        "an epoch column. Full epochs are a broadcast join + narrow " +
        "explode (NO shuffle — the k-fold blowup is the requested output); " +
        "only the boundary prefix pays the bucket-ledger machinery. The " +
        "oracle replays epochs via unnest(range(k)) and the prefix via the " +
        "naive whole-group window; integer div/mod replays exactly."
    ),
    // --------------------------------------------------------------- t128
    GraftQuery(
      "t128_ann_adaptive_filter",
      (s, d) => {
        import s.implicits._
        import graft.operators.{ProductQuantizer => PQ}
        // the filtered-ANN probe correction AS A GATE: at a 1/10-selective
        // filter the FIXED production probe count reads as low as 0.500
        // (round-15 annfilter sweep — the table lives in the
        // ivfQueryFiltered scaladoc), while nProbeFor from MEASURED
        // selectivity walks probes toward the exhaustive regime and read
        // 1.000 at every SF/selectivity (one 0.867, rerank-pool bound) —
        // re-confirmed 1.000 everywhere on the round-18 shared/reduced
        // fixture (GateProbe fixtures sweep). Floor 0.6 locks the
        // adaptive contract over the shared appended fixture index.
        val emb = AnnGates.Fixture.reduced(s, d)
        val allowed = emb.where($"vec_id" % 30 === 0)
        val queries = emb.filter($"vec_id" < 9)
        val dir = AnnGates.Fixture.halfAppendedResidualDir(s, d)
        val topk = PQ.ivfPqQueryFilteredAdaptive(s, dir, queries, "vec_id",
          "embedding", allowed, "vec_id", k = 5, baseNProbe = 5, rerank = 100)
        AnnGates.verdict(allowed, queries, topk, k = 5, recallFloor = 0.6)
      },
      Some(AnnGates.oracle),
      doc = "Adaptive filtered ANN gate: probes corrected from measured " +
        "selectivity (nProbeFor — hold the allowed-candidate volume, cap " +
        "at nCells) under a 1/10-selective filter on the composed " +
        "residual index — sims exact, ranks dense, no self/dups/" +
        "disallowed, recall@5 vs FILTERED brute force >= 0.6 where the " +
        "fixed probe count measured as low as 0.500; violations + " +
        "sentinel, constant oracle.",
      gate = true
    ),
    // --------------------------------------------------------------- t129
    GraftQuery(
      "t129_shard_seq_read",
      (s, d) => {
        import s.implicits._
        // the NO-SHUFFLE loader read path over the t116 release: each
        // shard as per-file partition-ordered frames (numeric part order,
        // coalesce(1) + in-partition sort — no Exchange anywhere,
        // plan-pinned in TrainingOrderSpec). The oracle pins that the
        // sequential path reads back exactly the rows/shards the range-
        // shuffled writer laid down; the replay ORDER itself is the
        // spec-pinned half of the contract.
        val ordered = graft.operators.TrainingOrder
          .interleave(Tables.documents(s, d), $"lang", $"doc_id",
            Seq("de", "en", "es", "fr", "zh"))
        val dir = java.nio.file.Files.createTempDirectory("graft_t129").toString
        graft.operators.TrainingOrder
          .writeMixtureShards(ordered, $"global_pos", s"$dir/shards", 8)
        // infer the release schema once; the other 7 shards (and every part
        // file inside each) skip their per-file footer round trips
        var sch: Option[org.apache.spark.sql.types.StructType] = None
        (0 until 8).map { sh =>
            val f = graft.operators.TrainingOrder
              .readShardSequential(s, s"$dir/shards", sh, "global_pos", sch)
            if (sch.isEmpty) sch = Some(f.schema)
            f
          }
          .reduce(_ unionByName _)
          .select($"doc_id", $"lang", $"global_pos",
            $"shard".cast("int").as("shard"))
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
             |    md5('0:' || CAST(doc_id AS VARCHAR)) AS skey,
             |    CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
             |      WHEN 'fr' THEN 3 WHEN 'zh' THEN 4 END AS source_idx
             |  FROM documents),
             |o AS (SELECT doc_id, lang,
             |    CAST((row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) - 1) * 5
             |      + source_idx AS BIGINT) AS global_pos
             |  FROM t WHERE source_idx IS NOT NULL)
             |SELECT doc_id, lang, global_pos,
             |  CAST((row_number() OVER (ORDER BY global_pos) - 1) * 8
             |    // (SELECT count(*) FROM o) AS INT) AS shard
             |FROM o ORDER BY doc_id""".stripMargin),
      doc = "Sequential (no-shuffle) shard read of a mixture release " +
        "(TrainingOrder.readShardSequential): per-file partition-ordered " +
        "frames in numeric part order — the training-loader consumption " +
        "pattern — read back value-for-value what writeMixtureShards " +
        "laid down, verified against DuckDB's replay of the interleave + " +
        "rank-range shard arithmetic (t116's oracle through the " +
        "exchange-free path)."
    )
  )
}
