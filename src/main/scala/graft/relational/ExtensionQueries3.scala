package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.{Clustering, FuzzyJoin, Sampling, Similarity, TextPipeline, TextSearch, WebOps}
import org.apache.spark.sql.functions._

/** Round-6 additions: the dataset-assembly layer — mixture balancing,
  * sequence packing, relevance retrieval, fuzzy matching, and semantic
  * clustering. Same contract as [[ExtensionQueries]]: Spark-first builder +
  * DuckDB oracle that must hash-match exactly at sf0.01 and sf0.001.
  */
object ExtensionQueries3 {

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- t48
    GraftQuery(
      "t48_mixture",
      (s, d) => {
        import s.implicits._
        Sampling.toShares(
          Tables.documents(s, d), $"lang", $"doc_id",
          Seq("en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15))
          .select($"doc_id".cast("bigint").as("doc_id"), $"lang")
          .orderBy($"doc_id")
      },
      Some("""WITH sh(grp, share) AS (VALUES
             |    ('en', CAST(0.4 AS DOUBLE)), ('de', CAST(0.15 AS DOUBLE)),
             |    ('es', CAST(0.15 AS DOUBLE)), ('fr', CAST(0.15 AS DOUBLE)),
             |    ('zh', CAST(0.15 AS DOUBLE))),
             |cnt AS (SELECT lang AS grp, count(*) AS c FROM documents GROUP BY 1),
             |b AS (SELECT MIN(CAST(c AS DOUBLE) / share) AS budget
             |      FROM cnt JOIN sh USING (grp)),
             |r AS (SELECT grp, budget * share / CAST(c AS DOUBLE) AS rate
             |      FROM cnt JOIN sh USING (grp) CROSS JOIN b)
             |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
             |FROM documents d JOIN r ON d.lang = r.grp
             |WHERE CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             |      < rate * 4294967296.0
             |ORDER BY doc_id""".stripMargin),
      doc = "Mixture balancing: largest keyed-Bernoulli sample at target " +
        "per-language shares without upsampling — no per-group window, so " +
        "no skew wall; membership is a pure function of the key."
    ),
    // ---------------------------------------------------------------- t49
    GraftQuery(
      "t49_pack",
      (s, d) => {
        import s.implicits._
        TextPipeline.packSequences(
          Tables.documents(s, d), $"doc_id",
          size(split(trim($"text"), "\\s+")), capacity = 512L)
          .select($"id".cast("bigint").as("doc_id"), $"seq", $"n_tokens",
            $"start_token", $"bin_first", $"bin_last", $"offset_in_bin")
          .orderBy($"seq")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n,
             |    md5(CAST(doc_id AS VARCHAR)) AS h, CAST(doc_id AS VARCHAR) AS t
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n,
             |    ROW_NUMBER() OVER (ORDER BY h, t) AS seq,
             |    COALESCE(SUM(n) OVER (ORDER BY h, t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
             |  FROM tok)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(seq AS BIGINT) AS seq,
             |  CAST(n AS BIGINT) AS n_tokens, CAST(st AS BIGINT) AS start_token,
             |  CAST(st // 512 AS BIGINT) AS bin_first,
             |  CAST((st + GREATEST(n, 1) - 1) // 512 AS BIGINT) AS bin_last,
             |  CAST(st % 512 AS BIGINT) AS offset_in_bin
             |FROM c ORDER BY seq""".stripMargin),
      doc = "GPT-style sequence packing: concatenate in deterministic md5 " +
        "order, cut every 512 tokens. Spark side is the two-phase " +
        "distributed prefix sum (per-partition cumsum + broadcast offsets), " +
        "NOT a single-partition global window; the oracle re-derives it " +
        "with one."
    ),
    // ---------------------------------------------------------------- t50
    GraftQuery(
      "t50_bm25",
      (s, d) => {
        import s.implicits._
        TextSearch.bm25TopK(Tables.documents(s, d), $"doc_id", $"text",
          terms = Seq("spark", "merge", "window"), k = 20)
          .select($"id".cast("bigint").as("doc_id"), $"dl", $"tf0", $"tf1", $"tf2", $"score")
          .orderBy($"score".desc, $"doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
             |d AS (SELECT doc_id,
             |  CAST(len(t) AS BIGINT) AS dl,
             |  CAST(len(list_filter(t, x -> x = 'spark')) AS BIGINT) AS tf0,
             |  CAST(len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS tf1,
             |  CAST(len(list_filter(t, x -> x = 'window')) AS BIGINT) AS tf2
             |  FROM tok),
             |s AS (SELECT count(*) AS n, SUM(CAST(dl AS DECIMAL(20,0))) AS sumdl,
             |  SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
             |  SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
             |  SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
             |  FROM d)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, dl, tf0, tf1, tf2,
             |  ((CAST(n - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
             |    * ((CAST(tf0 AS DOUBLE) * 2.5) / (CAST(tf0 AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))
             |  + ((CAST(n - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
             |    * ((CAST(tf1 AS DOUBLE) * 2.5) / (CAST(tf1 AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))
             |  + ((CAST(n - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
             |    * ((CAST(tf2 AS DOUBLE) * 2.5) / (CAST(tf2 AS DOUBLE)
             |        + 1.5 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))))
             |  AS score
             |FROM d CROSS JOIN s
             |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),
      doc = "BM25 top-20 retrieval (rational idf, k1=1.5, b=0.75 — all " +
        "constants binary-exact, every op IEEE + * /, so the score is " +
        "bit-identical cross-engine); corpus stats are one broadcast row, " +
        "top-k is a heap, never a global sort."
    ),
    // ---------------------------------------------------------------- t51
    GraftQuery(
      "t51_fuzzy_join",
      (s, d) => {
        import s.implicits._
        val part = Tables.part(s, d)
        // Deterministic misspellings: delete the (p_partkey mod len)-th char.
        val pos = pmod($"p_partkey", length($"p_name")).cast("int")
        val probes = part.filter(pmod($"p_partkey", lit(40)) === 0)
          .select($"p_partkey".cast("bigint").as("probe_id"),
            concat($"p_name".substr(lit(1), pos),
              $"p_name".substr(pos + lit(2), length($"p_name"))).as("s"))
        FuzzyJoin.editDistanceJoin(
          probes, $"probe_id", $"s",
          part.select($"p_partkey".cast("bigint").as("pk"), $"p_name"),
          $"pk", $"p_name", maxDist = 2)
          .orderBy($"id_l", $"id_r")
      },
      Some("""WITH pr AS (
             |  SELECT CAST(p_partkey AS BIGINT) AS probe_id,
             |    substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
             |      || substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2, length(p_name)) AS s
             |  FROM part WHERE p_partkey % 40 = 0)
             |SELECT pr.probe_id AS id_l, CAST(p.p_partkey AS BIGINT) AS id_r,
             |  CAST(levenshtein(pr.s, p.p_name) AS BIGINT) AS dist
             |FROM pr CROSS JOIN part p
             |WHERE levenshtein(pr.s, p.p_name) <= 2
             |ORDER BY id_l, id_r""".stripMargin),
      doc = "Edit-distance similarity join (maxDist 2): Spark side blocks " +
        "on the lossless length band (every edit moves length by <= 1) and " +
        "verifies with the thresholded banded DP; the oracle is the " +
        "unblocked all-pairs join — hash equality PROVES the blocking " +
        "dropped nothing.",
      gate = true
    ),
    // ---------------------------------------------------------------- t52
    GraftQuery(
      "t52_kmeans_gate",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val (assigned, model) =
          Clustering.kmeans(emb, $"vec_id", $"embedding", k = 8, maxIters = 4)
        // Re-derive the assignment from the final centroids with a second,
        // independent evaluation — any nondeterminism in the distance math
        // or centroid state shows up as a mismatch row.
        val re = Clustering.assign(emb, $"vec_id", $"embedding", model.centroids)
        val viol = assigned.as("a").join(re.as("r"), "id")
          .filter(col("a.cluster") =!= col("r.cluster")).count()
        val mono = model.inertia.zip(model.inertia.tail)
          .forall { case (a, b) => b.compareTo(a) <= 0 }
        val improved = model.inertia.last.compareTo(model.inertia.head) < 0
        Seq((viol, mono, improved))
          .toDF("assign_violations", "inertia_monotone", "improved")
      },
      Some("SELECT CAST(0 AS BIGINT) AS assign_violations, " +
        "true AS inertia_monotone, true AS improved"),
      doc = "Deterministic k-means fixed-point gate: re-assignment against " +
        "the final centroids must match exactly, and the exact-decimal " +
        "inertia sequence must be monotone non-increasing and strictly " +
        "improved — Lloyd's invariants, checked on every run.",
      gate = true
    ),
    // ---------------------------------------------------------------- t53
    GraftQuery(
      "t53_boilerplate",
      (s, d) => {
        import s.implicits._
        // documents.text is newline-free, so the query derives a lined view
        // first (4-token lines) — the operator itself is delimiter-generic.
        val toks = split(trim($"text"), "\\s+")
        // widen the single-row-group scan BEFORE the line-view transform:
        // dedupLines consumes the lined view twice and each replay otherwise
        // rebuilds it on one task (identity at scale — see Fanout)
        val lined = graft.core.Fanout.spread(
            Tables.documents(s, d).select($"doc_id", $"text"))
          .select($"doc_id", toks.as("__toks"))
          .select($"doc_id",
            concat_ws("\n",
              transform(sequence(lit(0), ((size($"__toks") - 1) / 4).cast("int")),
                i => array_join(slice($"__toks", i * 4 + 1, lit(4)), " "))).as("text"))
        TextPipeline.dedupLines(lined, $"doc_id", $"text", "\n", minDf = 3)
          .select($"id".cast("bigint").as("doc_id"), $"clean_text",
            $"n_lines", $"n_removed")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
             |b AS (
             |  SELECT doc_id, array_to_string(
             |    [array_to_string(ts[(i-1)*4+1 : least(i*4, len(ts))], ' ')
             |     FOR i IN range(1, ((len(ts)-1)//4)+2)], chr(10)) AS text FROM tok),
             |l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM b),
             |e AS (SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line FROM l),
             |bp AS (SELECT line FROM (
             |  SELECT line, count(DISTINCT doc_id) AS c FROM e GROUP BY 1) WHERE c >= 3),
             |kept AS (SELECT e.doc_id, e.pos, e.line FROM e ANTI JOIN bp USING (line)),
             |agg AS (SELECT doc_id,
             |  array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
             |  count(*) AS nk FROM kept GROUP BY 1)
             |SELECT CAST(l.doc_id AS BIGINT) AS doc_id,
             |  COALESCE(a.clean_text, '') AS clean_text,
             |  CAST(len(l.ls) AS BIGINT) AS n_lines,
             |  CAST(len(l.ls) - COALESCE(a.nk, 0) AS BIGINT) AS n_removed
             |FROM l LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin),
      doc = "CCNet-style line-level boilerplate removal: lines occurring in " +
        ">= 3 distinct docs are dropped everywhere, docs reassembled in " +
        "order. Lines are hashed to longs pre-shuffle; the oracle works on " +
        "the raw line text."
    ),
    // ---------------------------------------------------------------- t54
    GraftQuery(
      "t54_dupspans",
      (s, d) => {
        import s.implicits._
        TextPipeline.duplicateSpans(
          Tables.documents(s, d), $"doc_id", $"text", k = 8, minDocs = 2)
          .select($"id".cast("bigint").as("doc_id"), $"n_tokens", $"n_windows",
            $"n_dup_windows", $"n_dup_spans", $"dup_tokens", $"dup_frac")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
             |base AS (SELECT doc_id, len(ts) AS n,
             |  greatest(len(ts) - 7, 0) AS nw, ts FROM tok),
             |w AS (SELECT doc_id, unnest(range(0, nw)) AS pos, ts FROM base),
             |g AS (SELECT doc_id, pos,
             |  array_to_string(ts[pos+1 : pos+8], ' ') AS gram FROM w),
             |dfreq AS (SELECT gram FROM (
             |  SELECT gram, count(DISTINCT doc_id) AS c FROM g GROUP BY 1) WHERE c >= 2),
             |f AS (SELECT g.doc_id, g.pos FROM g SEMI JOIN dfreq USING (gram)),
             |isl AS (SELECT doc_id, pos,
             |  CASE WHEN max(pos + 7) OVER pw IS NULL
             |    OR pos > max(pos + 7) OVER pw + 1 THEN 1 ELSE 0 END AS nf
             |  FROM f WINDOW pw AS (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |isl2 AS (SELECT doc_id, pos, sum(nf) OVER (PARTITION BY doc_id
             |  ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
             |  FROM isl),
             |sp AS (SELECT doc_id, isl, min(pos) AS s, max(pos) + 7 AS e,
             |  count(*) AS nw2 FROM isl2 GROUP BY 1, 2),
             |pd AS (SELECT doc_id, count(*) AS ns, sum(e - s + 1) AS dt,
             |  sum(nw2) AS ndw FROM sp GROUP BY 1)
             |SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
             |  CAST(n AS BIGINT) AS n_tokens, CAST(nw AS BIGINT) AS n_windows,
             |  CAST(COALESCE(ndw, 0) AS BIGINT) AS n_dup_windows,
             |  CAST(COALESCE(ns, 0) AS BIGINT) AS n_dup_spans,
             |  CAST(COALESCE(dt, 0) AS BIGINT) AS dup_tokens,
             |  CASE WHEN nw = 0 THEN NULL
             |    ELSE CAST(COALESCE(dt, 0) AS DOUBLE) / n END AS dup_frac
             |FROM base b LEFT JOIN pd USING (doc_id) ORDER BY doc_id""".stripMargin),
      doc = "Exact-substring duplication scan (token-window formulation of " +
        "span dedup): 8-token windows shared by >= 2 docs, merged into " +
        "maximal per-doc spans via gaps-and-islands. Only window hashes " +
        "cross the shuffle; the oracle re-derives from the raw gram text."
    ),
    // ---------------------------------------------------------------- t55
    GraftQuery(
      "t55_domains",
      (s, d) => {
        import s.implicits._
        // Deterministic URL synthesis (documents has no URL column): some
        // rows carry userinfo and ports so the host extraction is exercised.
        val url = concat(
          lit("https://"),
          when($"doc_id" % 7 === 0, lit("u.ser:pw@")).otherwise(lit("")),
          lit("www."), $"source", lit("-"), $"lang", lit(".org"),
          when($"doc_id" % 5 === 0, lit(":8443")).otherwise(lit("")),
          lit("/p/"), $"doc_id".cast("string"), lit("?ref=x#frag"))
        val docs = Tables.documents(s, d).withColumn("url", url)
        val blocked = Seq("src1-en.org", "src4-de.org").toDF("domain")
        WebOps.domainStats(
          WebOps.blocklistFilter(docs, $"url", blocked), $"url", $"n_chars")
          .orderBy($"domain")
      },
      Some("""WITH u AS (SELECT doc_id, n_chars,
             |  'https://' || CASE WHEN doc_id % 7 = 0 THEN 'u.ser:pw@' ELSE '' END ||
             |  'www.' || source || '-' || lang || '.org' ||
             |  CASE WHEN doc_id % 5 = 0 THEN ':8443' ELSE '' END ||
             |  '/p/' || doc_id || '?ref=x#frag' AS url FROM documents),
             |h AS (SELECT doc_id, n_chars, lower(regexp_extract(regexp_extract(
             |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1),
             |  '([^@]*)$', 1), '^(\[[^\]]*\]|[^:\[][^:]*)', 1)) AS host FROM u),
             |r AS (SELECT doc_id, n_chars, CASE
             |  WHEN len(string_split(host, '.')) >= 2
             |  THEN array_to_string((string_split(host, '.'))[-2:], '.')
             |  ELSE host END AS domain FROM h)
             |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM r WHERE domain NOT IN ('src1-en.org', 'src4-de.org')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      doc = "Web-provenance layer: host extraction (userinfo/port-safe, " +
        "RE2-identical regexes), registrable-domain rollup, broadcast " +
        "blocklist anti join — the corpus never shuffles for the filter."
    ),
    // ---------------------------------------------------------------- t56
    GraftQuery(
      "t56_temperature",
      (s, d) => {
        import s.implicits._
        Sampling.temperatureBalance(Tables.documents(s, d), $"lang", $"doc_id")
          .select($"doc_id".cast("bigint").as("doc_id"), $"lang")
          .orderBy($"doc_id")
      },
      Some("""WITH cnt AS (SELECT lang, count(*) AS c FROM documents GROUP BY 1),
             |m AS (SELECT min(c) AS mc FROM cnt),
             |r AS (SELECT lang, sqrt(CAST(mc AS DOUBLE) / CAST(c AS DOUBLE)) AS rate
             |  FROM cnt CROSS JOIN m)
             |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
             |FROM documents d JOIN r USING (lang)
             |WHERE CAST(CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             |  < rate * 4294967296.0
             |ORDER BY doc_id""".stripMargin),
      doc = "Temperature-balanced sampling at alpha = 1/2: group g keeps " +
        "rows at rate sqrt(c_min/c_g) — division and sqrt are both IEEE " +
        "correctly-rounded (pow/ln are not), so membership is bit-identical " +
        "cross-engine."
    ),
    // ---------------------------------------------------------------- t57
    GraftQuery(
      "t57_semdedup_gate",
      (s, d) => {
        import s.implicits._
        // Deterministic quarter of the corpus: the gate checks
        // IMPLEMENTATION INVARIANTS (partition property, zero surviving
        // near-dup pairs, something collapsed) which are size-independent,
        // while both semDedup's candidate join and the independent verify
        // join below are quadratic in cluster size — at the full sf0.1
        // corpus the gate's cost breathed 6↔26 s with box contention
        // (r9/r10 records). A quarter cuts the quadratic work 16× and
        // pins the gate's wall clock; full-scale operator cost remains
        // covered by the stress run's sem_dedup stage and
        // repartition-invariance by ClusteringSpec.
        val emb = Tables.embeddings(s, d).where($"vec_id" % 4 === 0)
        // k = 16: the within-cluster candidate join is the dominant cost and
        // shrinks quadratically in the cluster size, so more clusters = a
        // cheaper gate AND the scale posture the operator documents.
        val res = Clustering.semDedup(emb, $"vec_id", $"embedding",
          k = 16, tau = 0.3, maxIters = 4).cache()
        val total = emb.count()
        // one aggregation job for all three scalar assertions (row count,
        // id uniqueness, something-removed) — the gate used to re-traverse
        // the cached result three times for these
        val stats = res.agg(count(lit(1)).as("n"),
          count_distinct($"id").as("nd"),
          count(when(!$"survivor", 1)).as("removed")).head()
        val partitionOk = stats.getLong(0) == total && stats.getLong(1) == total
        val removed = stats.getLong(2)
        // Two survivors of the same cluster at cosine >= tau would have been
        // one component — zero such pairs is the operator's core guarantee.
        val sv = res.filter($"survivor")
          .join(emb.select($"vec_id".as("id"), $"embedding"), Seq("id"))
        val dupPairs = sv.as("a").join(sv.as("b"),
            col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
          .filter(Similarity.cosine(col("a.embedding"), col("b.embedding")) >= 0.3)
          .count()
        res.unpersist(blocking = false)
        Seq((partitionOk, dupPairs, removed > 0))
          .toDF("partition_ok", "survivor_dup_pairs", "some_removed")
      },
      Some("SELECT true AS partition_ok, CAST(0 AS BIGINT) AS survivor_dup_pairs, " +
        "true AS some_removed"),
      doc = "SemDeDup gate: k-means-bounded semantic dedup must (a) emit " +
        "every id exactly once, (b) leave no surviving near-dup pair " +
        "within a cluster, (c) actually collapse something on this corpus " +
        "— pure invariants, so the oracle is constant. Repartition " +
        "invariance is pinned in ClusteringSpec.",
      gate = true
    ),
    // ---------------------------------------------------------------- t58
    GraftQuery(
      "t58_jsonl",
      (s, d) => {
        import s.implicits._
        // Deterministic JSONL synthesis: every 13th record is truncated
        // mid-object — the malformed-upload shape real crawls contain.
        val json = concat(
          lit("{\"id\":"), $"doc_id", lit(",\"lang\":\""), $"lang",
          lit("\",\"nc\":"), $"n_chars", lit("}"))
        val raw = Tables.documents(s, d).select(
          $"doc_id",
          when($"doc_id" % 13 === 0, substring(json, 1, 12))
            .otherwise(json).as("line"))
        graft.sources.JsonlCorpus
          .parseLines(raw, $"line", "id BIGINT, lang STRING, nc BIGINT")
          .select($"doc_id".cast("bigint").as("doc_id"),
            $"id", $"lang", $"nc", $"is_corrupt")
          .orderBy($"doc_id")
      },
      Some("""WITH j AS (SELECT doc_id,
             |  '{"id":' || doc_id || ',"lang":"' || lang || '","nc":' || n_chars || '}' AS whole
             |  FROM documents),
             |l AS (SELECT doc_id,
             |  CASE WHEN doc_id % 13 = 0 THEN substr(whole, 1, 12) ELSE whole END AS line
             |  FROM j)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CASE WHEN json_valid(line) THEN CAST(line->>'$.id' AS BIGINT) END AS id,
             |  CASE WHEN json_valid(line) THEN line->>'$.lang' END AS lang,
             |  CASE WHEN json_valid(line) THEN CAST(line->>'$.nc' AS BIGINT) END AS nc,
             |  NOT json_valid(line) AS is_corrupt
             |FROM l ORDER BY doc_id""".stripMargin),
      doc = "JSONL ingest with corrupt-record quarantine: PERMISSIVE parse " +
        "against an explicit schema (never inferred — inference is an " +
        "extra full pass at 100 TB), malformed lines flagged and " +
        "preserved, fields normalized null on corrupt rows so validity " +
        "semantics are engine-comparable."
    ),
    // ---------------------------------------------------------------- t59
    GraftQuery(
      "t59_profile",
      (s, d) =>
        graft.operators.Profiler
          .profile(Tables.documents(s, d), Seq("lang", "source", "n_chars"))
          .orderBy(col("column")),
      Some("""SELECT 'lang' AS "column", count(*) AS n_rows,
             |  CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct,
             |  CAST(min(lang) AS VARCHAR) AS min_value,
             |  CAST(max(lang) AS VARCHAR) AS max_value FROM documents
             |UNION ALL
             |SELECT 'n_chars', count(*),
             |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(count(DISTINCT n_chars) AS BIGINT),
             |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
             |UNION ALL
             |SELECT 'source', count(*),
             |  CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |  CAST(count(DISTINCT source) AS BIGINT),
             |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
             |ORDER BY "column"""".stripMargin),
      doc = "Dataset profile (release QA report): nulls / exact distinct / " +
        "min / max per column from ONE scan (multi-distinct via Expand), " +
        "stack-unpivoted to long format. approx variant keeps the shape " +
        "at 100 TB."
    ),
    // ---------------------------------------------------------------- t60
    GraftQuery(
      "t60_privacy",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val audit = graft.operators.Privacy
          .kAnonymityAudit(docs, Seq($"lang", $"source"), k = 8)
        docs.join(audit, Seq("lang", "source"))
          .select($"doc_id".cast("bigint").as("doc_id"),
            graft.operators.Privacy
              .pseudonymize($"doc_id", "release-2026-08").as("pseudo_id"),
            $"lang", $"source", $"n".as("group_n"), $"meets_k")
          .orderBy($"doc_id")
      },
      Some("""WITH a AS (SELECT lang, source, count(*) AS n
             |  FROM documents GROUP BY 1, 2)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  sha256('release-2026-08' || CAST(doc_id AS VARCHAR)) AS pseudo_id,
             |  d.lang, d.source, CAST(n AS BIGINT) AS group_n,
             |  n >= 8 AS meets_k
             |FROM documents d JOIN a USING (lang, source)
             |ORDER BY doc_id""".stripMargin),
      doc = "Privacy layer: salted SHA-256 pseudonymization (deterministic, " +
        "join-preserving, engine-independent lower hex) plus the " +
        "k-anonymity audit over quasi-identifier combinations — one " +
        "partial-aggregated groupBy, corpus never shuffles."
    ),
    // ---------------------------------------------------------------- t61
    GraftQuery(
      "t61_curriculum",
      (s, d) => {
        import s.implicits._
        graft.operators.Curriculum
          .bucketBy(Tables.documents(s, d), $"n_chars".cast("double"), nBuckets = 4)
          .select($"doc_id".cast("bigint").as("doc_id"), $"n_chars", $"bucket")
          .orderBy($"doc_id")
      },
      Some("""WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents WHERE n_chars IS NOT NULL),
             |n AS (SELECT count(*) AS n FROM s),
             |o AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM s),
             |c AS (SELECT list(v ORDER BY r) AS sv FROM o),
             |cuts AS (SELECT [sv[CAST((n-1)*1//4 AS BIGINT)+1], sv[CAST((n-1)*2//4 AS BIGINT)+1],
             |  sv[CAST((n-1)*3//4 AS BIGINT)+1]] AS cuts FROM c, n)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_chars,
             |  CAST(len(list_filter(cuts, x -> x < CAST(n_chars AS DOUBLE))) AS BIGINT) AS bucket
             |FROM documents CROSS JOIN cuts ORDER BY doc_id""".stripMargin),
      doc = "Curriculum bucketing by exact interior quantile ORDER " +
        "STATISTICS (rank (n-1)*i/nBuckets, integer arithmetic): selected " +
        "elements are bit-identical cross-engine where interpolated " +
        "percentiles can differ in the last ulp and flip the strict-< tie " +
        "rule. Range-partitioned single-column sort + literal-array " +
        "assignment (ties to the lower bucket) — no ntile window, no " +
        "single-partition skew wall."
    ),
    // ---------------------------------------------------------------- t62
    GraftQuery(
      "t62_drift",
      (s, d) => {
        import s.implicits._
        val before = Tables.documents(s, d)
        // Deterministic "next snapshot": 10% of rows dropped by the keyed
        // Bernoulli, lang nulled for every 10th doc — the broken-extractor
        // shape the drift report exists to catch.
        val after = before
          .where(Sampling.bernoulli($"doc_id", 0.9))
          .withColumn("lang",
            when($"doc_id" % 10 === 0, lit(null).cast("string"))
              .otherwise($"lang"))
        graft.operators.Profiler.drift(before, after, Seq("lang", "n_chars"))
          .select(col("column"),
            col("rows_before"), col("nulls_before"), col("distinct_before"),
            col("min_before"), col("max_before"),
            col("rows_after"), col("nulls_after"), col("distinct_after"),
            col("min_after"), col("max_after"), col("null_rate_delta"))
          .orderBy(col("column"))
      },
      Some("""WITH aft AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 10 = 0 THEN NULL ELSE lang END AS lang,
             |    n_chars
             |  FROM documents
             |  WHERE CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
             |    < 0.9 * 4294967296.0),
             |pb AS (
             |  SELECT 'lang' AS col, count(*) AS r,
             |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl,
             |    CAST(count(DISTINCT lang) AS BIGINT) AS nd,
             |    CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
             |  FROM documents
             |  UNION ALL
             |  SELECT 'n_chars', count(*),
             |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT n_chars) AS BIGINT),
             |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
             |  FROM documents),
             |pa AS (
             |  SELECT 'lang' AS col, count(*) AS r,
             |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nl,
             |    CAST(count(DISTINCT lang) AS BIGINT) AS nd,
             |    CAST(min(lang) AS VARCHAR) AS mn, CAST(max(lang) AS VARCHAR) AS mx
             |  FROM aft
             |  UNION ALL
             |  SELECT 'n_chars', count(*),
             |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             |    CAST(count(DISTINCT n_chars) AS BIGINT),
             |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
             |  FROM aft)
             |SELECT pb.col AS "column",
             |  pb.r AS rows_before, pb.nl AS nulls_before, pb.nd AS distinct_before,
             |  pb.mn AS min_before, pb.mx AS max_before,
             |  pa.r AS rows_after, pa.nl AS nulls_after, pa.nd AS distinct_after,
             |  pa.mn AS min_after, pa.mx AS max_after,
             |  (CAST(pa.nl AS DOUBLE) / pa.r) - (CAST(pb.nl AS DOUBLE) / pb.r) AS null_rate_delta
             |FROM pb JOIN pa USING (col) ORDER BY "column"""".stripMargin),
      doc = "Snapshot drift report: per-column null-rate / distinct / " +
        "min-max deltas between two releases from one profile each — the " +
        "early-warning signal for a broken upstream extractor. Delta " +
        "arithmetic is pure IEEE division/subtraction, so it is " +
        "bit-comparable cross-engine."
    ),
    // ---------------------------------------------------------------- t63
    GraftQuery(
      "t63_vocab_encode",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val vocab = graft.operators.Vocab.build(docs, $"text", size = 25)
        graft.operators.Vocab.encode(docs, $"doc_id", $"text", vocab)
          .select($"id".cast("bigint").as("doc_id"),
            $"n_tokens", $"n_oov",
            aggregate($"ids", lit(0L), (a, x) => a + x).as("id_sum"),
            element_at($"ids", 1).as("id_first"),
            element_at($"ids", -1).as("id_last"))
          .orderBy($"doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents),
             |tok AS (SELECT doc_id, generate_subscripts(ts, 1) AS pos,
             |  unnest(ts) AS token FROM base),
             |cnt AS (SELECT token, count(*) AS c FROM tok
             |  WHERE len(token) > 0 GROUP BY 1),
             |voc AS (SELECT token,
             |  CAST(row_number() OVER (ORDER BY c DESC, token) AS BIGINT) AS id
             |  FROM (SELECT * FROM cnt ORDER BY c DESC, token LIMIT 25)),
             |enc AS (SELECT t.doc_id, t.pos, COALESCE(v.id, 0) AS tid
             |  FROM tok t LEFT JOIN voc v USING (token))
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
             |  CAST(sum(tid) AS BIGINT) AS id_sum,
             |  CAST(arg_min(tid, pos) AS BIGINT) AS id_first,
             |  CAST(arg_max(tid, pos) AS BIGINT) AS id_last
             |FROM enc GROUP BY 1 ORDER BY doc_id""".stripMargin),
      doc = "Vocabulary build + corpus encoding: top-V tokens by frequency " +
        "(token-string tiebreak; TakeOrdered, never a global sort), ids " +
        "assigned over the driver-bounded V rows, encoding via a broadcast " +
        "join with OOV -> 0. The oracle re-derives the id sequences and " +
        "checks order-sensitive scalars (first/last/sum) per doc."
    ),
    // ---------------------------------------------------------------- t64
    GraftQuery(
      "t64_quality_model",
      (s, d) => {
        import s.implicits._
        graft.operators.QualityClassifier
          .classify(Tables.documents(s, d), $"text")
          .select($"doc_id".cast("bigint").as("doc_id"),
            $"quality_logit", $"quality_score", $"keep")
          .orderBy($"doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
             |      CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text) END AS f_punct,
             |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
             |      CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / length(text) END AS f_upper,
             |    CASE WHEN length(text) = 0 THEN 0.0 ELSE
             |      CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / length(text) END AS f_digit,
             |    CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0.0 ELSE
             |      CAST((length(text) - length(replace(text, ' the ', ''))) // 5 AS DOUBLE)
             |      / CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS f_stop,
             |    CAST(least(length(text), 20000) AS DOUBLE) / 20000.0 AS f_len,
             |    CASE WHEN len(string_split_regex(trim(text), '\s+')) = 0 THEN 0.0 ELSE
             |      CAST(length(text) AS DOUBLE)
             |      / CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS f_tok_len
             |  FROM documents),
             |z AS (SELECT doc_id,
             |  0.5 + -2.0 * f_punct + -1.5 * f_upper + -2.0 * f_digit
             |    + 4.0 * f_stop + 1.0 * f_len + -0.125 * f_tok_len AS quality_logit
             |  FROM f)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, quality_logit,
             |  0.5 + 0.5 * quality_logit / (1.0 + abs(quality_logit)) AS quality_score,
             |  0.5 + 0.5 * quality_logit / (1.0 + abs(quality_logit)) >= 0.5 AS keep
             |FROM z ORDER BY doc_id""".stripMargin),
      doc = "Linear document-quality classifier (the corpus-filtering step " +
        "between cleaning and sampling): codegen'd feature projection, " +
        "literal-folded dot product in fixed order, RATIONAL squash " +
        "0.5 + 0.5*z/(1+|z|) instead of a sigmoid — +, *, /, abs are " +
        "correctly-rounded IEEE where exp/log differ across libms, so " +
        "scores hash bit-identically cross-engine. No shuffle, no UDF."
    )
  )
}
