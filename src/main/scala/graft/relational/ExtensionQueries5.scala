package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.{LanguageModel, QualityRules}
import org.apache.spark.sql.functions._

/** Round-8 continuation: curation-report quality rules, leakage-safe
  * splits, corpus-wide paragraph dedup, projection/join blocking
  * operators. Same contract as [[ExtensionQueries]]: Spark-first builder +
  * DuckDB oracle that must hash-match exactly at sf0.01 and sf0.001.
  */
object ExtensionQueries5 {

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- t73
    GraftQuery(
      "t73_gopher_rules",
      (s, d) => {
        import s.implicits._
        val rules = QualityRules.rules($"text")
        Tables.documents(s, d)
          .select(Seq(
            $"doc_id",
            QualityRules.wordCount($"text").as("n_words"),
            QualityRules.meanWordLen($"text").as("mean_word_len"),
            QualityRules.alphaWordFrac($"text").as("alpha_frac"),
            QualityRules.symbolWordRatio($"text").as("symbol_ratio"),
            QualityRules.stopwordHits($"text").as("stop_hits")) ++
            rules.map { case (n, c) => c.as(n) } :+
            QualityRules.keep($"text").as("keep"): _*)
          .orderBy($"doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, text,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS ws,
             |    string_split_regex(trim(text), '\s+') AS ws0,
             |    string_split(text, chr(10)) AS ls
             |  FROM documents),
             |s AS (SELECT doc_id,
             |  CAST(len(ws) AS BIGINT) AS n_words,
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
             |r AS (SELECT doc_id, n_words, mean_word_len, alpha_frac, symbol_ratio,
             |  CAST(stop_hits AS BIGINT) AS stop_hits,
             |  COALESCE(n_words BETWEEN 10 AND 100000, false) AS r_word_count,
             |  COALESCE(mean_word_len BETWEEN 2.0 AND 10.0, false) AS r_mean_word_len,
             |  COALESCE(symbol_ratio <= 0.1, false) AS r_symbol_ratio,
             |  COALESCE(bullet_frac <= 0.9, false) AS r_bullet_lines,
             |  COALESCE(ellipsis_frac <= 0.3, false) AS r_ellipsis_lines,
             |  COALESCE(alpha_frac >= 0.8, false) AS r_alpha_words,
             |  COALESCE(stop_hits >= 2, false) AS r_stopwords
             |  FROM s)
             |SELECT *,
             |  (r_word_count AND r_mean_word_len AND r_symbol_ratio AND r_bullet_lines
             |   AND r_ellipsis_lines AND r_alpha_words AND r_stopwords) AS keep
             |FROM r ORDER BY doc_id""".stripMargin),
      doc = "Gopher-style quality RULE CHAIN (word count, mean word length, " +
        "symbol ratio, bullet/ellipsis lines, alphabetic-word fraction, " +
        "required stopwords): each rule a named boolean with its statistic " +
        "exposed — the curation-report complement of the t04 score and the " +
        "t64 learned model. Exact integer counts, deterministic array-order " +
        "folds, one IEEE division per ratio; pure codegen'd projection, " +
        "no shuffle."
    ),
    // ---------------------------------------------------------------- t74
    {
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val cuts = graft.operators.Splits.cutPoints(splits)
      GraftQuery(
        "t74_leakage_split",
        (s, d) => {
          import s.implicits._
          val grp = concat($"source", lit("-"), $"lang")
          Tables.documents(s, d)
            .select($"doc_id", grp.as("grp"),
              graft.operators.Splits.assign(grp, splits).as("split"))
            .orderBy($"doc_id")
        },
        Some(s"""WITH g AS (SELECT doc_id, source || '-' || lang AS grp,
               |  CAST(concat('0x', substr(md5(source || '-' || lang), 1, 8)) AS BIGINT) AS b
               |  FROM documents)
               |SELECT doc_id, grp,
               |  CASE WHEN b < ${cuts(0)} THEN 'train'
               |       WHEN b < ${cuts(1)} THEN 'val'
               |       ELSE 'test' END AS split
               |FROM g ORDER BY doc_id""".stripMargin),
        doc = "Leakage-safe train/val/test assignment: the md5 bucket of the " +
          "LEAKAGE GROUP key (source-lang here; registrable domain or cluster " +
          "id in a crawl) is compared against cumulative cut points held as " +
          "exact longs over the 2^32 key space — whole groups land in one " +
          "split, assignment survives repartition/rescale, and there is no " +
          "accumulated floating-point boundary for engines to disagree " +
          "about. Pure projection, no shuffle."
      )
    },
    // ---------------------------------------------------------------- t75
    GraftQuery(
      "t75_para_dedup",
      (s, d) => {
        import s.implicits._
        // Deterministic paragraph synthesis (the corpus text is single-line):
        // 4-8 paragraphs per doc drawn from a 50-paragraph space keyed on
        // (doc_id*7 + pos*13) % 50, so cross-doc and within-doc duplicates
        // both occur and first-wins has real work to do.
        val nPar = $"doc_id" % 5 + 4
        val paras = transform(sequence(lit(0L), nPar - 1), j => {
          val k = ($"doc_id" * 7 + j * 13) % 50
          concat(lit("para "), k.cast("string"), lit(" body "),
            repeat(lit("w"), (k % 7 + 1).cast("int")))
        })
        val synth = Tables.documents(s, d)
          .select($"doc_id", concat_ws("\n\n", paras).as("ptext"))
        graft.operators.ParagraphDedup
          .dedupParagraphs(synth, $"doc_id", $"ptext")
          .select($"id".as("doc_id"), $"text_dedup", $"n_paras", $"n_kept")
          .orderBy($"doc_id")
      },
      Some("""WITH synth AS (SELECT doc_id,
             |    array_to_string(list_transform(range(0, doc_id % 5 + 4),
             |      j -> 'para ' || CAST((doc_id*7 + j*13) % 50 AS VARCHAR) || ' body ' ||
             |           repeat('w', (doc_id*7 + j*13) % 50 % 7 + 1)),
             |      chr(10) || chr(10)) AS ptext
             |  FROM documents),
             |p AS (SELECT doc_id, generate_subscripts(ps, 1) AS pos, unnest(ps) AS para
             |  FROM (SELECT doc_id, string_split(ptext, chr(10) || chr(10)) AS ps FROM synth)),
             |pn AS (SELECT * FROM p WHERE length(para) > 0),
             |k AS (SELECT para, min(doc_id * 1048576 + pos) AS first FROM pn GROUP BY 1),
             |kept AS (SELECT pn.doc_id, pn.pos, pn.para FROM pn JOIN k
             |  ON pn.para = k.para AND pn.doc_id * 1048576 + pn.pos = k.first),
             |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_dedup
             |  FROM kept GROUP BY 1),
             |tot AS (SELECT doc_id, CAST(len(list_filter(string_split(ptext, chr(10) || chr(10)),
             |    x -> length(x) > 0)) AS BIGINT) AS n_paras FROM synth)
             |SELECT t.doc_id, COALESCE(r.text_dedup, '') AS text_dedup,
             |  t.n_paras, CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept
             |FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id
             |ORDER BY t.doc_id""".stripMargin),
      doc = "Corpus-wide first-wins PARAGRAPH dedup with document " +
        "reassembly (the RefinedWeb recipe): keeper per distinct paragraph " +
        "is the min (doc, pos) struct — deterministic, rerun-stable; " +
        "paragraphs shuffle once by content hash for the dedup decision " +
        "and survivors once by doc for reassembly; the keeper table " +
        "carries (hash, id, pos) only, never text; fully-deduped docs stay " +
        "in the corpus with empty text. No window, no driver state."
    ),
    // ---------------------------------------------------------------- t76
    {
      val k = 8
      val dim = 64
      val w = graft.operators.Projection.sparseWeights(dim, k)
      val oracleCols = w.zipWithIndex.map { case (wj, j) =>
        s"  list_reduce(list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * " +
          s"CAST(([${wj.mkString(",")}])[i] AS DOUBLE)), (a, b) -> a + b) + 0.0 AS p$j"
      }.mkString(",\n")
      GraftQuery(
        "t76_sparse_projection",
        (s, d) => {
          import s.implicits._
          val proj = graft.operators.Projection.project($"embedding", w)
          Tables.embeddings(s, d)
            .select($"vec_id" +: proj.zipWithIndex.map { case (c, j) => c.as(s"p$j") }: _*)
            .orderBy($"vec_id")
        },
        Some(s"SELECT vec_id,\n$oracleCols\nFROM embeddings ORDER BY vec_id"),
        doc = "Achlioptas sparse random projection 64-dim -> 8-dim: the JL " +
          "dimensionality-reduction step in front of clustering/ANN that " +
          "cuts shuffle bytes by dim/k. The {+1,-1,0} weight matrix is a " +
          "pure md5-of-seed function embedded as plan literals (both " +
          "engines re-derive it), and every dot product is a deterministic " +
          "ARRAY-ORDER left fold with a final +0.0 zero-sign " +
          "normalization — bit-stable under repartition and cross-engine. " +
          "Zero shuffle, zero driver state, pure codegen'd projection."
      )
    },
    // ---------------------------------------------------------------- t77
    GraftQuery(
      "t77_bucket_interval_join",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d).withColumn("sec", unix_timestamp($"ts"))
        val p = ev.where($"event_type" === "purchase")
          .select($"event_id".as("p_event_id"), $"sec".as("pt"))
        val iv = ev.where($"event_type" === "signup")
          .select($"event_id".as("i_event_id"), $"sec".as("lo"),
            ($"sec" + 300 + ($"event_id" % 7) * 600).as("hi"))
        graft.operators.IntervalJoin
          .pointInInterval(p, $"pt", iv, $"lo", $"hi", bucketWidth = 1800L)
          .select($"p_event_id", $"i_event_id", $"pt", $"lo", $"hi")
          .orderBy($"p_event_id", $"i_event_id")
      },
      Some("""WITH ev AS (SELECT event_id, event_type,
             |    epoch_ns(ts) // 1000000000 AS sec FROM events),
             |p AS (SELECT event_id AS p_event_id, sec AS pt FROM ev
             |  WHERE event_type = 'purchase'),
             |iv AS (SELECT event_id AS i_event_id, sec AS lo,
             |    sec + 300 + (event_id % 7) * 600 AS hi FROM ev
             |  WHERE event_type = 'signup')
             |SELECT p_event_id, i_event_id, pt, lo, hi
             |FROM p JOIN iv ON pt >= lo AND pt <= hi
             |ORDER BY p_event_id, i_event_id""".stripMargin),
      doc = "KEYLESS point-in-interval join via bucket blocking: Spark " +
        "plans a raw range join as BroadcastNestedLoopJoin/cartesian — " +
        "quadratic death at scale. Intervals register in each overlapped " +
        "fixed-width bucket, points live in exactly one, so the join is a " +
        "shuffled EQUI-join refined by the exact predicate and every pair " +
        "emerges exactly once with no dedup. Replication is len/width+1 " +
        "per interval; the oracle is the naive inequality join the " +
        "operator replaces. Complements the keyed t21 interval join and " +
        "the t10 as-of join."
    ),
    // ---------------------------------------------------------------- t78
    GraftQuery(
      "t78_containment_join",
      (s, d) => {
        import s.implicits._
        // widen the single-row-group scan BEFORE the shingle expression so
        // the set construction parallelizes (identity at scale — see Fanout)
        val docs = graft.core.Fanout.spread(
            Tables.documents(s, d).select($"doc_id", $"text"))
          .select($"doc_id", graft.operators.TextAnalysis.wordShingles($"text", 3).as("sh"))
        graft.operators.ContainmentJoin
          .containmentJoin(docs, $"doc_id", $"sh", tauNum = 9, tauDen = 10)
          .select($"a", $"b", $"inter", $"sz_a", $"containment")
          .orderBy($"a", $"b")
      },
      Some("""WITH sh AS (SELECT doc_id, list_distinct(list_transform(
             |      range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
             |      i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |    FROM documents)
             |SELECT a.doc_id AS a, b.doc_id AS b,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS inter,
             |  CAST(len(a.sh) AS BIGINT) AS sz_a,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
             |FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
             |WHERE len(list_intersect(a.sh, b.sh)) * 10 >= 9 * len(a.sh) AND len(a.sh) > 0
             |ORDER BY a, b""".stripMargin),
      doc = "Asymmetric CONTAINMENT join over 3-gram shingles (|A∩B|/|A| " +
        ">= 9/10): the quote-inclusion / subset-duplicate detector Jaccard " +
        "misses when |B| >> |A|. Rarest-first prefix blocking (at least one " +
        "of A's |A|-ceil(tau|A|)+1 rarest shingles must be in B — hot " +
        "shingles never form candidates), exact integer threshold " +
        "arithmetic, array verification on pruned pairs only; the oracle " +
        "is the naive all-pairs join the blocking provably loses nothing " +
        "against."
    ),
    // ---------------------------------------------------------------- t79
    GraftQuery(
      "t79_politeness_rounds",
      (s, d) => {
        import s.implicits._
        val urls = Tables.documents(s, d).select($"doc_id", $"n_chars",
          concat(lit("https://"), $"source", lit("-"), $"lang",
            lit(".org/p/"), $"doc_id".cast("string")).as("url"))
        graft.operators.WebOps
          .politenessRounds(urls, $"url", $"n_chars", $"doc_id", perRound = 4)
          .select($"doc_id", $"domain",
            $"n_chars".cast("bigint").as("priority"), $"fetch_round")
          .orderBy($"doc_id")
      },
      Some("""WITH u AS (SELECT doc_id, source || '-' || lang || '.org' AS domain,
             |    n_chars FROM documents)
             |SELECT doc_id, domain, CAST(n_chars AS BIGINT) AS priority,
             |  CAST((row_number() OVER (PARTITION BY domain
             |    ORDER BY n_chars DESC, doc_id) - 1) // 4 AS BIGINT) AS fetch_round
             |FROM u ORDER BY doc_id""".stripMargin),
      doc = "Crawl-frontier politeness scheduling: fetch rounds per " +
        "registrable domain with at most 4 urls per round, highest " +
        "priority first, unique-id tiebreak — the frontier-side " +
        "enforcement of crawl-delay. One keyed window whose partitions " +
        "are domain-bounded (a mega-domain sorts only its own urls, " +
        "never the frontier)."
    ),
    // ---------------------------------------------------------------- t80
    GraftQuery(
      "t80_trigram_lm",
      (s, d) => {
        import s.implicits._
        LanguageModel.trigramFluency(Tables.documents(s, d), $"doc_id", $"text")
          .select($"doc_id".cast("bigint").as("doc_id"),
            $"n_trigrams", $"known3_frac", $"avg_c123", $"min_p3")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS w
             |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
             |        FROM documents)),
             |tk AS (SELECT * FROM tok WHERE len(w) > 0),
             |tg AS (SELECT doc_id, w AS w1,
             |  lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
             |  lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3 FROM tk),
             |pd AS (SELECT doc_id, w1, w2, w3, CAST(count(*) AS BIGINT) AS m
             |  FROM tg WHERE w2 IS NOT NULL AND w3 IS NOT NULL GROUP BY 1, 2, 3, 4),
             |tri AS (SELECT w1, w2, w3, CAST(sum(m) AS BIGINT) AS c123
             |  FROM pd GROUP BY 1, 2, 3),
             |ctx12 AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12,
             |  CAST(count(*) AS BIGINT) AS n1p12 FROM tri GROUP BY 1, 2),
             |bi23 AS (SELECT w2, w3, CAST(sum(c123) AS BIGINT) AS c23 FROM tri GROUP BY 1, 2),
             |ctx2 AS (SELECT w2, CAST(sum(c23) AS BIGINT) AS c2,
             |  CAST(count(*) AS BIGINT) AS n1p2 FROM bi23 GROUP BY 1),
             |uni AS (SELECT w3, CAST(sum(c123) AS BIGINT) AS c3 FROM tri GROUP BY 1),
             |tot AS (SELECT CAST(sum(c3) AS BIGINT) AS t FROM uni),
             |p AS (SELECT pd.doc_id, pd.m, tri.c123,
             |  (GREATEST(CAST(tri.c123 AS DOUBLE) - 0.75, 0.0)
             |   + 0.75 * CAST(ctx12.n1p12 AS DOUBLE) *
             |     ((GREATEST(CAST(bi23.c23 AS DOUBLE) - 0.75, 0.0)
             |       + 0.75 * CAST(ctx2.n1p2 AS DOUBLE) *
             |         (CAST(uni.c3 AS DOUBLE) / CAST(tot.t AS DOUBLE)))
             |      / CAST(ctx2.c2 AS DOUBLE)))
             |  / CAST(ctx12.c12 AS DOUBLE) AS p_tri
             |  FROM pd JOIN tri USING (w1, w2, w3) JOIN ctx12 USING (w1, w2)
             |    JOIN bi23 USING (w2, w3) JOIN ctx2 USING (w2)
             |    JOIN uni USING (w3) CROSS JOIN tot)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(sum(m) AS BIGINT) AS n_trigrams,
             |  CAST(sum(CASE WHEN c123 >= 2 THEN m ELSE 0 END) AS DOUBLE)
             |    / CAST(sum(m) AS BIGINT) AS known3_frac,
             |  CAST(sum(m * c123) AS DOUBLE) / CAST(sum(m) AS BIGINT) AS avg_c123,
             |  min(p_tri) AS min_p3
             |FROM p GROUP BY 1 ORDER BY doc_id""".stripMargin),
      doc = "Trigram LM fluency with interpolated ABSOLUTE DISCOUNTING " +
        "(Ney 1994, D = 3/4 binary-exact) — the order CCNet's KenLM " +
        "exploits, log-free: probabilities are fixed trees of correctly-" +
        "rounded double ops over exact integer counts (normalization to 1 " +
        "is spec-asserted), statistics are exact sums, one division each, " +
        "and an order-invariant min. Unseen contexts back off a level, so " +
        "fit-on-reference / score-the-crawl is total. One corpus " +
        "tokenization; all model tables are sublinear re-aggregations " +
        "joining back on n-gram keys."
    ),
    // ---------------------------------------------------------------- t81
    GraftQuery(
      "t81_phrase_search",
      (s, d) => {
        import s.implicits._
        graft.operators.TextSearch
          .phraseCount(Tables.documents(s, d), $"doc_id", $"text",
            Seq("table", "hash"))
          .select($"id".as("doc_id"), $"n_matches")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, generate_subscripts(ts, 1) AS pos, unnest(ts) AS w
             |  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ts
             |        FROM documents)),
             |tk AS (SELECT * FROM tok WHERE len(w) > 0)
             |SELECT a.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_matches
             |FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
             |WHERE a.w = 'table' AND b.w = 'hash'
             |GROUP BY 1 ORDER BY doc_id""".stripMargin),
      doc = "Exact PHRASE search via positional postings: the (n-1)-fold " +
        "position-offset equi-join over per-term index slices — each join " +
        "input is one term's postings, so work scales with the phrase " +
        "terms' frequencies, not the corpus; overlapping matches count, " +
        "order matters (the bag-of-words t50 BM25 cannot tell \"hash " +
        "table\" from \"table hash\"). Postings shuffle (term, doc, pos) " +
        "rows, never text."
    ),
    // ---------------------------------------------------------------- t82
    GraftQuery(
      "t82_training_order",
      (s, d) => {
        import s.implicits._
        graft.operators.TrainingOrder
          .interleave(Tables.documents(s, d), $"lang", $"doc_id",
            Seq("de", "en", "es", "fr", "zh"))
          .select($"doc_id", $"lang", $"skey", $"source_idx", $"global_pos")
          .orderBy($"doc_id")
      },
      Some("""WITH t AS (SELECT doc_id, lang,
             |    md5('0:' || CAST(doc_id AS VARCHAR)) AS skey,
             |    CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2
             |      WHEN 'fr' THEN 3 WHEN 'zh' THEN 4 END AS source_idx
             |  FROM documents)
             |SELECT doc_id, lang, skey, CAST(source_idx AS BIGINT) AS source_idx,
             |  CAST((row_number() OVER (PARTITION BY lang ORDER BY skey, doc_id) - 1) * 5
             |    + source_idx AS BIGINT) AS global_pos
             |FROM t WHERE source_idx IS NOT NULL ORDER BY doc_id""".stripMargin),
      doc = "Deterministic TRAINING ORDER: strict round-robin interleave " +
        "across sources at per-epoch md5-shuffled within-source order — " +
        "global_pos = (rank-1)*S + source_idx, collision-free, " +
        "reproducible under any partitioning (resume step N, re-run an " +
        "ablation, re-shard for a new world size). The companion " +
        "shuffleKey path is the window-free 100 TB ordering; the strict " +
        "interleave's per-source windows are for bounded curated sources."
    ),
    // ---------------------------------------------------------------- t83
    GraftQuery(
      "t83_unicode_normalize",
      (s, d) => {
        import s.implicits._
        // Deterministic mojibake synthesis (the corpus is clean ASCII):
        // decomposed accents, a parity-dependent ZERO WIDTH SPACE, doubled
        // blanks, a tab, and a BEL — every class the normalizer handles.
        val raw = concat($"text", lit(" cafe\u0301 A\u0308pfel"),
          when($"doc_id" % 2 === 0, lit("\u200B")).otherwise(lit("")),
          lit("  x\t"), lit("\u0007end"))
        Tables.documents(s, d)
          .select($"doc_id",
            length(raw).cast("bigint").as("n_raw"),
            graft.operators.TextAnalysis.normalizeText(raw).as("norm"),
            length(graft.operators.TextAnalysis.normalizeText(raw))
              .cast("bigint").as("n_norm"))
          .orderBy($"doc_id")
      },
      Some("""WITH r AS (SELECT doc_id,
             |    text || ' cafe' || chr(769) || ' A' || chr(776) || 'pfel' ||
             |    CASE WHEN doc_id % 2 = 0 THEN chr(8203) ELSE '' END ||
             |    '  x' || chr(9) || chr(7) || 'end' AS raw
             |  FROM documents)
             |SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
             |  trim(regexp_replace(regexp_replace(nfc_normalize(raw),
             |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]|\p{Cf}', '', 'g'),
             |    '\s+', ' ', 'g')) AS norm,
             |  CAST(length(trim(regexp_replace(regexp_replace(nfc_normalize(raw),
             |    '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]|\p{Cf}', '', 'g'),
             |    '\s+', ' ', 'g'))) AS BIGINT) AS n_norm
             |FROM r ORDER BY doc_id""".stripMargin),
      doc = "Unicode text normalization: NFC canonical composition as a " +
        "native codegen'd Catalyst expression (JDK Normalizer, quick-check " +
        "fast path — no UDF), then control/format-char strip (C0 minus " +
        "tab/newline/CR, DEL, Cf like ZERO WIDTH SPACE) and whitespace " +
        "collapse — the pass that makes dedup keys see e+COMBINING ACUTE " +
        "and é as the same bytes. DuckDB recomputes the whole " +
        "pipeline (nfc_normalize + identical RE2-safe patterns) " +
        "byte-for-byte. Pure projection, no shuffle."
    ),
    // ---------------------------------------------------------------- t84
    GraftQuery(
      "t84_pagerank_gate",
      (s, d) => {
        import s.implicits._
        // synthesized 50-host link graph. Round-16 gate-cost fix (the
        // t57/AnnGates.Fixture playbook, applied as a deterministic
        // sub-sampled graph): both out-edges are PURE functions of
        // doc_id mod 50, so one representative per residue class carries
        // the complete edge structure — the doc-derived multigraph only
        // added uniform per-src duplicate mass, which PageRank's
        // out-degree shares divide away. Every assertion below (mass
        // conservation, delta contraction, repartition identity, teleport
        // floor) holds for any graph by the operator's own math; what the
        // doc-scaled version added was 12 iterations × |docs|×2 edge
        // re-scans of pure gate cost (isolated quiet-box: 18.0 s at
        // sf0.1 before, SF-independent after).
        val ids = s.range(0, 50).select($"id".as("doc_id"))
        val e1 = ids.select(
          concat(lit("h"), ($"doc_id" % 50).cast("string")).as("src"),
          concat(lit("h"), (($"doc_id" * 7 + 3) % 50).cast("string")).as("dst"))
        val e2 = ids.select(
          concat(lit("h"), ($"doc_id" % 50).cast("string")).as("src"),
          concat(lit("h"), (($"doc_id" * 13 + 11) % 50).cast("string")).as("dst"))
        val edges = e1.union(e2)
        // 3 iterations, t89's accounting: every gated property (mass per
        // iteration, contraction across the delta sequence, repartition
        // row-identity, teleport floor) is established by then, and the
        // isolated measure showed the cost was never the edge volume but
        // the per-iteration fixed overhead (scheduling + decimal agg +
        // stat collects + checkpoint) × 2 runs — halving iterations
        // halves exactly that
        val r = graft.operators.PageRank.pageRank(edges, $"src", $"dst", iters = 3)
        val massOk = r.masses.forall(m => (m - 1).abs < BigDecimal("1e-9"))
        val contracting = r.deltas.sliding(2).forall {
          case Seq(x, y) => y <= x
          case _ => true
        }
        // the repartition twin only needs final ranks; skipping its
        // delta/mass collects saves one job per iteration of pure gate cost
        val again = graft.operators.PageRank
          .pageRank(edges.repartition(7), $"src", $"dst", iters = 3,
            trackStats = false)
        val identical = r.ranks.exceptAll(again.ranks).count() +
          again.ranks.exceptAll(r.ranks).count() == 0
        val teleport = BigDecimal("0.15") / r.ranks.count()
        val positive = BigDecimal(r.ranks
          .agg(min($"rank")).collect()(0).getDecimal(0)) >= teleport.setScale(18, BigDecimal.RoundingMode.DOWN)
        Seq((massOk, contracting, identical, positive))
          .toDF("mass_conserved", "deltas_contract", "repartition_identical",
            "rank_at_least_teleport")
      },
      Some("SELECT true AS mass_conserved, true AS deltas_contract, " +
        "true AS repartition_identical, true AS rank_at_least_teleport"),
      doc = "Deterministic PageRank gate over a synthesized host graph — " +
        "the crawl-prioritization / domain-authority signal as a fixed-" +
        "point DECIMAL(38,18) power iteration: mass stays 1 within " +
        "bounded rounding, L1 deltas contract (damped-operator " +
        "contraction), ranks are ROW-IDENTICAL under repartitioning " +
        "(decimal sums are exact and order-invariant — the property " +
        "double ranks cannot give), and every rank clears the teleport " +
        "floor. One rank-onto-edges equi-join and one groupBy per " +
        "iteration; lineage truncated per step.",
      gate = true
    )
  )
}
