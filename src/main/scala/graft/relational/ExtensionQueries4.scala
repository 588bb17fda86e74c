package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.{CountMin, LanguageModel, WebOps}
import org.apache.spark.sql.functions._

/** Round-8 additions: URL-level dedup (the crawl-frontier step before any
  * content dedup) and corpus-trained n-gram LM fluency scoring (the
  * CCNet-style perplexity-filter slot). Same contract as
  * [[ExtensionQueries]]: Spark-first builder + DuckDB oracle that must
  * hash-match exactly at sf0.01 and sf0.001.
  */
object ExtensionQueries4 {

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- t65
    GraftQuery(
      "t65_url_canon",
      (s, d) => {
        import s.implicits._
        // Deterministic URL synthesis (documents has no URL column), built
        // to exercise every canonicalization rule: scheme/host case, www,
        // default vs real ports, root path, tracking params in first /
        // middle / only position, fragments, and cross-doc collisions
        // (path keyed on doc_id % 50) so the dedup actually bites.
        val url = concat(
          when($"doc_id" % 2 === 0, lit("HTTPS")).otherwise(lit("https")), lit("://"),
          when($"doc_id" % 3 === 0, lit("WWW.")).otherwise(lit("www.")),
          $"source", lit("-"), $"lang", lit(".org"),
          when($"doc_id" % 5 === 0, lit(":443"))
            .when($"doc_id" % 10 === 3, lit(":8443")).otherwise(lit("")),
          when($"doc_id" % 9 === 0, lit("/"))
            .otherwise(concat(lit("/p/"), ($"doc_id" % 50).cast("string"))),
          when($"doc_id" % 4 === 0,
            concat(lit("?utm_source=x&id="), ($"doc_id" % 7).cast("string")))
            .when($"doc_id" % 4 === 1,
              concat(lit("?id="), ($"doc_id" % 7).cast("string"), lit("&utm_campaign=y")))
            .when($"doc_id" % 4 === 2, lit("?utm_medium=z"))
            .otherwise(lit("")),
          when($"doc_id" % 6 === 0, lit("#frag")).otherwise(lit("")))
        val docs = Tables.documents(s, d).withColumn("url", url)
        WebOps.dedupByCanonicalUrl(docs, $"url", $"doc_id")
          .select($"doc_id".cast("bigint").as("doc_id"),
            $"url", $"canonical_url", $"url_survivor")
          .orderBy($"doc_id")
      },
      Some("""WITH u AS (SELECT doc_id,
             |  CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' ||
             |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE 'www.' END ||
             |  source || '-' || lang || '.org' ||
             |  CASE WHEN doc_id % 5 = 0 THEN ':443'
             |       WHEN doc_id % 10 = 3 THEN ':8443' ELSE '' END ||
             |  CASE WHEN doc_id % 9 = 0 THEN '/'
             |       ELSE '/p/' || CAST(doc_id % 50 AS VARCHAR) END ||
             |  CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&id=' || CAST(doc_id % 7 AS VARCHAR)
             |       WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_campaign=y'
             |       WHEN doc_id % 4 = 2 THEN '?utm_medium=z' ELSE '' END ||
             |  CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END AS url
             |  FROM documents),
             |parts AS (SELECT doc_id, url,
             |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             |  regexp_replace(lower(regexp_extract(regexp_extract(
             |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1),
             |    '([^@]*)$', 1), '^(\[[^\]]*\]|[^:\[][^:]*)', 1)), '^www\.', '') AS h,
             |  regexp_extract(regexp_extract(
             |    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1),
             |    '([^@]*)$', 1), ':([0-9]+)$', 1) AS port,
             |  regexp_extract(regexp_extract(url,
             |    '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '^([^?]*)', 1) AS path0,
             |  regexp_replace(regexp_replace(
             |    '&' || regexp_extract(regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), '\?(.*)$', 1),
             |    '&(utm_[a-z0-9_]*|gclid|fbclid|ref)=[^&]*', '', 'g'), '^&', '') AS q
             |  FROM u),
             |canon AS (SELECT doc_id, url,
             |  CASE WHEN scheme = '' OR h = '' THEN NULL
             |  ELSE scheme || '://' || h ||
             |    CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
             |        OR (scheme = 'https' AND port = '443'))
             |      THEN ':' || port ELSE '' END ||
             |    CASE WHEN path0 = '/' AND q = '' THEN '' ELSE path0 END ||
             |    CASE WHEN q = '' THEN '' ELSE '?' || q END
             |  END AS canonical_url FROM parts),
             |keep AS (SELECT canonical_url AS cu, min(doc_id) AS keeper
             |  FROM canon WHERE canonical_url IS NOT NULL GROUP BY 1)
             |SELECT CAST(c.doc_id AS BIGINT) AS doc_id, c.url, c.canonical_url,
             |  (k.keeper IS NULL OR c.doc_id = k.keeper) AS url_survivor
             |FROM canon c LEFT JOIN keep k ON c.canonical_url = k.cu
             |ORDER BY doc_id""".stripMargin),
      doc = "URL canonicalization + first-wins canonical dedup (the crawl-" +
        "frontier step before content dedup): lowercase scheme/host, www/" +
        "userinfo/default-port/fragment/tracking-param removal, query " +
        "repair, root-path normalization — every step an RE2-safe codegen'd " +
        "regex the oracle applies byte-identically; the dedup is one hash " +
        "agg on the canonical string + an equi-join, no window."
    ),
    // ---------------------------------------------------------------- t66
    GraftQuery(
      "t66_bigram_lm",
      (s, d) => {
        import s.implicits._
        LanguageModel.bigramFluency(Tables.documents(s, d), $"doc_id", $"text")
          .select($"doc_id".cast("bigint").as("doc_id"),
            $"n_bigrams", $"known_frac", $"avg_count", $"min_p")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS w
             |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
             |        FROM documents)),
             |tk AS (SELECT * FROM tok WHERE len(w) > 0),
             |bg AS (SELECT doc_id, w AS w1,
             |  lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tk),
             |pd AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS m
             |  FROM bg WHERE w2 IS NOT NULL GROUP BY 1, 2, 3),
             |c12 AS (SELECT w1, w2, CAST(sum(m) AS BIGINT) AS c12 FROM pd GROUP BY 1, 2),
             |c1 AS (SELECT w1, CAST(sum(m) AS BIGINT) AS c1 FROM pd GROUP BY 1),
             |v AS (SELECT count(DISTINCT w1) AS v FROM pd),
             |model AS (SELECT w1, w2, c12,
             |  (CAST(c12 AS DOUBLE) + 0.5) / (CAST(c1 AS DOUBLE) + 0.5 * CAST(v AS DOUBLE)) AS p
             |  FROM c12 JOIN c1 USING (w1) CROSS JOIN v)
             |SELECT CAST(pd.doc_id AS BIGINT) AS doc_id,
             |  CAST(sum(pd.m) AS BIGINT) AS n_bigrams,
             |  CAST(sum(CASE WHEN model.c12 >= 2 THEN pd.m ELSE 0 END) AS DOUBLE)
             |    / CAST(sum(pd.m) AS BIGINT) AS known_frac,
             |  CAST(sum(pd.m * model.c12) AS DOUBLE)
             |    / CAST(sum(pd.m) AS BIGINT) AS avg_count,
             |  min(model.p) AS min_p
             |FROM pd JOIN model USING (w1, w2)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      doc = "Corpus-trained bigram LM fluency scoring (the CCNet perplexity-" +
        "filter slot, parity-safe): perplexity's log is libm-unstable, so " +
        "the statistics are exact integers, single IEEE divisions, and an " +
        "order-invariant min of smoothed per-transition probabilities " +
        "(c12+1/2)/(c1+V/2). Tokens/pairs shuffle, never text; the model " +
        "joins back on the pair key; per-doc window state is doc-bounded."
    ),
    // ---------------------------------------------------------------- t67
    GraftQuery(
      "t67_bpe_gate",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val model = graft.operators.Bpe.train(docs, $"text", numMerges = 16)
        // (1) the first learned merge must be the true argmax of the
        // independently recomputed initial pair counts (same tiebreak)
        val top = graft.operators.Bpe.initialPairCounts(docs, $"text")
          .orderBy($"c".desc, $"pair").limit(1).collect()(0).getString(0)
        val firstOk = model.merges.headOption
          .exists { case (a, b) => graft.operators.Bpe.pairKey(a, b) == top }
        // (2) decode round-trip over the WHOLE corpus: concatenating each
        // word's symbols must reproduce the word byte-for-byte
        val enc = docs.select(
          graft.operators.Bpe.words($"text").as("ws"),
          graft.operators.Bpe.encode($"text", model).as("toks"))
        val stats = enc.select(
          sum(size(filter(zip_with($"ws", $"toks",
            (w, sy) => concat_ws("", sy) =!= w), x => x))).as("viol"),
          sum(size(flatten($"toks"))).cast("bigint").as("n_syms"),
          sum(aggregate(transform($"ws", w => length(w).cast("long")),
            lit(0L), (acc, x) => acc + x)).cast("bigint").as("n_chars"))
          .collect()(0)
        // (3) merges are distinct and (4) encoding strictly compresses
        val distinctOk = model.merges.distinct.size == model.merges.size
        Seq((model.merges.size.toLong, stats.getLong(0), firstOk,
          distinctOk, stats.getLong(1) < stats.getLong(2)))
          .toDF("merges_n", "roundtrip_violations", "first_merge_argmax",
            "merges_distinct", "tokens_shrunk")
      },
      Some("SELECT CAST(16 AS BIGINT) AS merges_n, " +
        "CAST(0 AS BIGINT) AS roundtrip_violations, " +
        "true AS first_merge_argmax, true AS merges_distinct, " +
        "true AS tokens_shrunk"),
      doc = "Distributed BPE tokenizer-training gate: 16 merges learned " +
        "over the word-frequency dictionary (ONE corpus scan, then " +
        "corpus-sublinear pair aggregations; only the winning pair ever " +
        "reaches the driver). Verifies the first argmax independently, a " +
        "corpus-wide decode round-trip, merge distinctness, and strict " +
        "compression — all SF-independent booleans.",
      gate = true
    ),
    // ---------------------------------------------------------------- t68
    GraftQuery(
      "t68_cms_gate",
      (s, d) => {
        import s.implicits._
        val depth = 4; val width = 2048
        val toks = Tables.documents(s, d)
          .select(explode(graft.operators.Bpe.words($"text")).as("w"))
        val exact = toks.groupBy($"w").agg(count(lit(1)).cast("bigint").as("exact"))
        val sk = CountMin.sketch(toks, $"w", depth, width)
        val est = CountMin.estimate(sk, toks, $"w", depth, width)
        val err = exact.join(est, $"w" === $"k")
          .agg(
            sum(when($"est" < $"exact", 1L).otherwise(0L)).as("under"),
            max($"est" - $"exact").as("maxover"),
            sum($"exact").cast("bigint").as("n"))
          .collect()(0)
        val cells = sk.count()
        // One-sided error is the CMS contract: never under, and over is
        // bounded by the per-row collision mass (4x the N/width expectation
        // leaves margin; min-over-depth lands far below it in practice).
        Seq((err.getLong(0), err.getLong(1) <= 4.0 * err.getLong(2) / width,
          cells <= depth.toLong * width))
          .toDF("underestimates", "overestimate_bounded", "cells_bounded")
      },
      Some("SELECT CAST(0 AS BIGINT) AS underestimates, " +
        "true AS overestimate_bounded, true AS cells_bounded"),
      doc = "Count-min sketch guarantee gate over corpus token frequencies: " +
        "estimates never undercount (hard one-sided CMS property), the max " +
        "overcount stays within the bounded per-row collision mass, and the " +
        "sketch is at most depth x width cells regardless of key " +
        "cardinality — the fixed-size point-frequency complement of the " +
        "t40 Misra-Gries heavy hitters.",
      gate = true
    ),
    // ---------------------------------------------------------------- t69
    GraftQuery(
      "t69_token_budget",
      (s, d) => {
        import s.implicits._
        graft.operators.Sampling.toTokenBudgets(
          Tables.documents(s, d), $"lang", $"doc_id",
          graft.operators.TextAnalysis.tokenCount($"text"),
          Seq("en" -> 20000L, "de" -> 8000L, "es" -> 8000L,
            "fr" -> 8000L, "zh" -> 50000000L))
          .select($"doc_id".cast("bigint").as("doc_id"), $"lang")
          .orderBy($"doc_id")
      },
      Some("""WITH b(grp, budget) AS (VALUES
             |    ('en', CAST(20000 AS BIGINT)), ('de', CAST(8000 AS BIGINT)),
             |    ('es', CAST(8000 AS BIGINT)), ('fr', CAST(8000 AS BIGINT)),
             |    ('zh', CAST(50000000 AS BIGINT))),
             |tot AS (SELECT lang AS grp,
             |    CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS tok
             |  FROM documents GROUP BY 1),
             |r AS (SELECT grp, CASE WHEN budget >= tok THEN 1.0
             |    ELSE CAST(budget AS DOUBLE) / CAST(tok AS DOUBLE) END AS rate
             |  FROM tot JOIN b USING (grp))
             |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
             |FROM documents d JOIN r ON d.lang = r.grp
             |WHERE CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             |  < rate * 4294967296.0
             |ORDER BY doc_id""".stripMargin),
      doc = "Token-budget recipe sampling: each source keeps rows at rate " +
        "min(1, budget/tokens) — mixtures are specified in tokens, not " +
        "rows. One exact-integer sum per group, a single IEEE division, " +
        "keyed-md5 membership (repartition-proof; the zh budget exceeds " +
        "its mass and exercises the keep-everything branch). No window."
    ),
    // ---------------------------------------------------------------- t70
    GraftQuery(
      "t70_hll_registers",
      (s, d) => {
        import s.implicits._
        graft.operators.HllTable.build(Tables.documents(s, d), $"lang", $"doc_id")
          .select($"group".as("lang"), $"bucket".cast("bigint").as("bucket"),
            $"rho".cast("bigint").as("rho"))
          .orderBy($"lang", $"bucket")
      },
      Some("""WITH h AS (SELECT lang,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
             |  FROM documents),
             |r AS (SELECT lang, h % 1024 AS bucket,
             |    CASE WHEN h // 1024 = 0 THEN 51
             |         ELSE 51 - length(bin(h // 1024)) END AS rho
             |  FROM h)
             |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
             |  CAST(max(rho) AS BIGINT) AS rho
             |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      doc = "Per-group HLL REGISTER table (p = 10, md5-derived hash): the " +
        "mergeable distinct-count state itself is hash-gated — DuckDB " +
        "recomputes every (group, bucket, max rho) register bit-identically " +
        "(bin() prints unpadded in both engines). Deliberately classic HLL, " +
        "not DataSketches: the HIP estimator there is insertion-order-" +
        "dependent, which would break determinism under merge."
    ),
    // ---------------------------------------------------------------- t71
    GraftQuery(
      "t71_hll_table_gate",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val whole = graft.operators.HllTable.build(docs, $"lang", $"doc_id")
        // (1) merge-exactness: sketch two disjoint halves, max-merge, must
        // be ROW-IDENTICAL to sketching everything at once
        val even = graft.operators.HllTable.build(docs.filter($"doc_id" % 2 === 0), $"lang", $"doc_id")
        val odd = graft.operators.HllTable.build(docs.filter($"doc_id" % 2 =!= 0), $"lang", $"doc_id")
        val merged = graft.operators.HllTable.merge(even, odd)
        val mismatch = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
        // (2) estimates within 8% of the exact distinct per group
        val est = graft.operators.HllTable.estimates(whole)
        val exact = docs.groupBy($"lang".as("group"))
          .agg(countDistinct($"doc_id").as("exact"))
        val worst = est.join(exact, "group")
          .select(max(abs($"estimate" - $"exact") / $"exact").as("rel"))
          .collect()(0).getDouble(0)
        Seq((mismatch, worst <= 0.08)).toDF("merge_mismatch_rows", "est_within_8pct")
      },
      Some("SELECT CAST(0 AS BIGINT) AS merge_mismatch_rows, " +
        "true AS est_within_8pct"),
      doc = "HLL table guarantee gate: max-merged half sketches are row-" +
        "identical to the whole-corpus sketch (exact mergeability — the " +
        "property DataSketches HIP breaks), and per-group estimates stay " +
        "within 8% of exact distincts (1024 registers, ~3.25% standard " +
        "error, classic-HLL mid-range bias allowed for).",
      gate = true
    ),
    // ---------------------------------------------------------------- t72
    GraftQuery(
      "t72_mad_outliers",
      (s, d) => {
        import s.implicits._
        graft.operators.RobustStats
          .flagOutliers(Tables.documents(s, d), $"n_chars", k = 3.0)
          .select($"doc_id".cast("bigint").as("doc_id"), $"n_chars",
            $"robust_med", $"robust_mad", $"is_outlier")
          .orderBy($"doc_id")
      },
      Some("""WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
             |  WHERE n_chars IS NOT NULL),
             |n AS (SELECT count(*) AS n FROM s),
             |o AS (SELECT list(v ORDER BY v) AS sv FROM s),
             |med AS (SELECT sv[CAST((n-1)//2 AS BIGINT)+1] AS med FROM o, n),
             |dl AS (SELECT list(abs(v - med) ORDER BY abs(v - med)) AS dv FROM s, med),
             |mad AS (SELECT dv[CAST((n-1)//2 AS BIGINT)+1] AS mad FROM dl, n)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_chars,
             |  med AS robust_med, mad AS robust_mad,
             |  CASE WHEN n_chars IS NULL THEN NULL
             |       ELSE abs(CAST(n_chars AS DOUBLE) - med) > 3.0 * mad END AS is_outlier
             |FROM documents CROSS JOIN med CROSS JOIN mad
             |ORDER BY doc_id""".stripMargin),
      doc = "Robust outlier flagging by median/MAD — mean/stddev break " +
        "exactly when the hunted outliers drag them; both statistics are " +
        "exact lower-median ORDER STATISTICS (rank (n-1)/2, selection not " +
        "interpolation), deviations are one correctly-rounded op each, so " +
        "the k*MAD flag is bit-reproducible cross-engine. Two range-" +
        "partitioned single-column sorts, no global window."
    )
  )
}
