package graft.relational

import graft.core.{Exact, GraftQuery, Tables}
import graft.operators.{BloomJoin, DedupClusters, DedupOps, HeavyHitters, Layout, Merge, Sampling, TextPipeline}
import org.apache.spark.sql.functions._

/** Round-5 additions: data-layout and training-pipeline operators.
  *
  * Same contract as [[ExtensionQueries]]: every entry is a Spark-first
  * formulation plus a DuckDB oracle that must hash-match it exactly at
  * sf0.01 (parity rules in `graft/core/GraftQuery.scala`).
  */
object ExtensionQueries2 {

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- t35
    GraftQuery(
      "t35_zorder",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .select(
            $"l_orderkey".cast("bigint").as("l_orderkey"),
            $"l_linenumber".cast("bigint").as("l_linenumber"),
            Layout.zorderValue(pmod($"l_partkey", lit(4096)), pmod($"l_suppkey", lit(4096)), 12)
              .cast("bigint").as("zval"))
          .orderBy($"zval", $"l_orderkey", $"l_linenumber")
      },
      Some(s"""SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
              |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
              |  CAST(${Layout.zorderSql("(l_partkey % 4096)", "(l_suppkey % 4096)", 12)} AS BIGINT) AS zval
              |FROM lineitem
              |ORDER BY zval, l_orderkey, l_linenumber""".stripMargin),
      doc = "Morton (z-order) interleave of two key columns — the layout key " +
        "LayoutSpec proves narrows per-file min/max on both dimensions."
    ),
    // ---------------------------------------------------------------- t36
    GraftQuery(
      "t36_chunk",
      (s, d) => {
        import s.implicits._
        TextPipeline.chunk(Tables.documents(s, d), $"doc_id", $"text", window = 20, stride = 10)
          .select(
            $"id".cast("bigint").as("doc_id"),
            $"chunk_id".cast("bigint").as("chunk_id"),
            md5($"chunk_text").as("chunk_md5"),
            $"n_tokens")
          .orderBy($"doc_id", $"chunk_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
             |), n AS (
             |  SELECT doc_id, t,
             |    CASE WHEN len(t) <= 20 THEN 1 ELSE ((len(t) - 20 + 9) // 10) + 1 END AS nc
             |  FROM tok
             |), c AS (
             |  SELECT doc_id, t, unnest(range(0, nc)) AS i FROM n
             |)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(i AS BIGINT) AS chunk_id,
             |  md5(array_to_string(t[i*10+1 : i*10+20], ' ')) AS chunk_md5,
             |  CAST(len(t[i*10+1 : i*10+20]) AS BIGINT) AS n_tokens
             |FROM c
             |ORDER BY doc_id, chunk_id""".stripMargin),
      doc = "Overlapping token-window chunking (window 20, stride 10) — " +
        "context-window prep; chunk text emitted as md5 to keep the dump lean."
    ),
    // ---------------------------------------------------------------- t37
    GraftQuery(
      "t37_redact",
      (s, d) => {
        import s.implicits._
        // The synthetic docs carry no PII, so both engines splice a
        // deterministic email/URL/IP per doc into the text first — the
        // redaction then has real work whose counts the oracle re-derives.
        val pii = concat(
          $"text", lit(" Contact user"), $"doc_id".cast("string"),
          lit("@mail.example.com or http://ref"), ($"doc_id" % 50).cast("string"),
          lit(".example.net/p/"), $"doc_id".cast("string"),
          lit(" from 10."), ($"doc_id" % 200).cast("string"),
          lit(".3."), ($"doc_id" % 97).cast("string"))
        Tables.documents(s, d)
          .select(
            $"doc_id".cast("bigint").as("doc_id"),
            md5(TextPipeline.redactPii(pii)).as("red_md5"),
            TextPipeline.piiCount(pii, TextPipeline.EmailRe).as("n_email"),
            TextPipeline.piiCount(pii, TextPipeline.UrlRe).as("n_url"),
            TextPipeline.piiCount(pii, TextPipeline.Ipv4Re).as("n_ip"))
          .orderBy($"doc_id")
      },
      Some("""WITH pii AS (
             |  SELECT doc_id,
             |    text || ' Contact user' || CAST(doc_id AS VARCHAR)
             |      || '@mail.example.com or http://ref' || CAST(doc_id % 50 AS VARCHAR)
             |      || '.example.net/p/' || CAST(doc_id AS VARCHAR)
             |      || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
             |      || '.3.' || CAST(doc_id % 97 AS VARCHAR) AS t
             |  FROM documents
             |)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  md5(regexp_replace(regexp_replace(regexp_replace(t,
             |    'https?://[^\s]+', '<URL>', 'g'),
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g')) AS red_md5,
             |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
             |  CAST(len(regexp_extract_all(t, 'https?://[^\s]+')) AS BIGINT) AS n_url,
             |  CAST(len(regexp_extract_all(t, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ip
             |FROM pii
             |ORDER BY doc_id""".stripMargin),
      doc = "PII redaction (URL, then email, then IPv4 — patterns valid and " +
        "identical in Java regex and RE2) with per-type audit counts."
    ),
    // ---------------------------------------------------------------- t38
    GraftQuery(
      "t38_split",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select(
            $"doc_id".cast("bigint").as("doc_id"),
            Layout.hashBucket($"doc_id").as("bucket"),
            Layout.hashSplit($"doc_id", trainPct = 80, valPct = 10).as("split"))
          .orderBy($"doc_id")
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
             |  CASE
             |    WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
             |    WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
             |    ELSE 'test'
             |  END AS split
             |FROM documents
             |ORDER BY doc_id""".stripMargin),
      doc = "Deterministic md5-hash train/val/test split (80/10/10) — " +
        "stable across runs, engines, and cluster sizes; no RNG state."
    ),
    // ---------------------------------------------------------------- t39
    GraftQuery(
      "t39_bloomjoin",
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d).where($"c_mktsegment" === "BUILDING")
        BloomJoin.semiJoin(Tables.orders(s, d), $"o_custkey", cust, $"c_custkey")
          .groupBy($"o_orderpriority")
          .agg(
            count(lit(1)).cast("bigint").as("n_orders"),
            Exact.sumDec($"o_totalprice").as("sum_price"))
          .orderBy($"o_orderpriority")
      },
      Some(s"""SELECT o_orderpriority,
              |  CAST(COUNT(*) AS BIGINT) AS n_orders,
              |  ${Exact.sqlSumDec("o_totalprice")} AS sum_price
              |FROM orders
              |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin),
      doc = "Bloom-prefiltered semi join: probe rows that cannot match are " +
        "dropped pre-shuffle; the exact join removes false positives, so the " +
        "composition is exactly the plain semi join the oracle runs."
    ),
    // ---------------------------------------------------------------- t40
    GraftQuery(
      "t40_heavyhit",
      (s, d) => {
        import s.implicits._
        // Guarantee gate in the t27-t34 sentinel style: the surviving
        // counter SET of Misra-Gries depends on merge order, but its three
        // guarantees hold under ANY order — so violations (not the sketch
        // itself) are the deterministic output.
        val k = 50
        val toks = Tables.documents(s, d)
          .select(explode(split(lower($"text"), "\\s+")).as("tok"))
          .where(length($"tok") > 0)
        val n = toks.count()
        val thresh = n.toDouble / (k + 1)
        val mg = HeavyHitters.frequentItems(toks, "tok", k)
        val exact = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
        val missing = exact.where($"cnt" > thresh)
          .join(mg, exact("tok") === mg("item"), "left_anti")
          .select($"tok".as("item"), lit("missing_heavy_hitter").as("reason"))
        val bounds = mg.join(exact, mg("item") === exact("tok"))
          .where($"est" > $"cnt" || ($"cnt" - $"est").cast("double") > thresh)
          .select($"item", lit("bound_violated").as("reason"))
        val sentinel = Seq(("zz_sentinel", "sentinel")).toDF("item", "reason")
        missing.unionAll(bounds).unionAll(sentinel).orderBy($"item", $"reason")
      },
      Some("SELECT 'zz_sentinel' AS item, 'sentinel' AS reason"),
      doc = "Misra-Gries heavy hitters accuracy gate: completeness above " +
        "n/(k+1), no overcounts, undercount bounded by n/(k+1); violations + sentinel.",
      gate = true
    ),
    // ---------------------------------------------------------------- t41
    GraftQuery(
      "t41_sample",
      (s, d) => {
        import s.implicits._
        Sampling.perGroup(Tables.documents(s, d), $"lang", $"doc_id", k = 5)
          .select(
            $"doc_id".cast("bigint").as("doc_id"),
            $"lang",
            Sampling.bernoulli($"doc_id", 0.25).as("in_quarter"))
          .orderBy($"lang", $"doc_id")
      },
      Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
             |  CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) < 1073741824 AS in_quarter
             |FROM (
             |  SELECT doc_id, lang, ROW_NUMBER() OVER (
             |    PARTITION BY lang
             |    ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(doc_id AS VARCHAR)) AS rn
             |  FROM documents)
             |WHERE rn <= 5
             |ORDER BY lang, doc_id""".stripMargin),
      doc = "Deterministic sampling: k-per-group reservoir (k smallest md5 " +
        "draws, partition-independent) plus a keyed Bernoulli flag — the " +
        "same rows come back on any cluster size, and any engine can " +
        "reproduce the selection."
    ),
    // ---------------------------------------------------------------- t42
    GraftQuery(
      "t42_bestdup",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val pairs = DedupOps.prefixJaccardPairs(docs, "doc_id", "text",
          groupCol = "source", n = 3, threshold = 0.8)
        DedupClusters.dropDuplicateClustersBy(docs, pairs, "doc_id", $"n_chars")
          .select($"doc_id".cast("bigint").as("doc_id"),
            $"n_chars".cast("bigint").as("n_chars"))
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE sets AS (
             |  SELECT doc_id, source, list_distinct(list_transform(
             |      range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
             |      i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |  FROM documents),
             |pairs AS (
             |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |  FROM sets a JOIN sets b
             |    ON a.source = b.source AND a.doc_id < b.doc_id
             |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8),
             |edges AS (
             |  SELECT id_a AS src, id_b AS dst FROM pairs
             |  UNION SELECT id_b, id_a FROM pairs),
             |reach(src, dst) AS (
             |  SELECT src, dst FROM edges
             |  UNION
             |  SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
             |comp AS (SELECT src AS doc_id, MIN(dst) AS m FROM reach GROUP BY src),
             |labeled AS (
             |  SELECT d.doc_id, d.n_chars,
             |    COALESCE(LEAST(c.m, d.doc_id), d.doc_id) AS component
             |  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
             |ranked AS (
             |  SELECT doc_id, n_chars, ROW_NUMBER() OVER (
             |    PARTITION BY component ORDER BY n_chars DESC, doc_id ASC) AS rk
             |  FROM labeled)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(n_chars AS BIGINT) AS n_chars
             |FROM ranked WHERE rk = 1
             |ORDER BY doc_id""".stripMargin),
      doc = "Quality-aware cluster dedup: the HIGHEST-n_chars doc survives " +
        "each near-dup cluster (id tiebreak) vs the recursive-CTE closure " +
        "plus arg-max oracle — keep the best copy, not the first-crawled one."
    ),
    // ---------------------------------------------------------------- t43
    GraftQuery(
      "t43_upsert",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val updates = docs.where($"doc_id" % 7 === 0)
          .withColumn("text", concat(lit("UPDATED "), $"doc_id".cast("string")))
          .unionByName(docs.where($"doc_id" < 3)
            .withColumn("doc_id", $"doc_id" + 100000)
            .withColumn("text", lit("NEW DOC")))
        Merge.upsert(docs, updates, "doc_id")
          .select($"doc_id".cast("bigint").as("doc_id"),
            md5($"text").as("text_md5"),
            $"n_chars".cast("bigint").as("n_chars"))
          .orderBy($"doc_id")
      },
      Some("""WITH updates AS (
             |  SELECT doc_id, 'UPDATED ' || CAST(doc_id AS VARCHAR) AS text, lang, source, n_chars
             |  FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT doc_id + 100000, 'NEW DOC', lang, source, n_chars
             |  FROM documents WHERE doc_id < 3)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS text_md5,
             |  CAST(n_chars AS BIGINT) AS n_chars
             |FROM (
             |  SELECT * FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM updates)
             |  UNION ALL SELECT * FROM updates)
             |ORDER BY doc_id""".stripMargin),
      doc = "Keyed snapshot upsert (anti-join + union, one equi-shuffle): " +
        "updated keys take the update row, unseen keys insert, the rest " +
        "carry over — the between-rebuilds merge a parquet corpus needs."
    ),
    // ---------------------------------------------------------------- t44
    GraftQuery(
      "t44_diff",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val updates = docs.where($"doc_id" % 7 === 0)
          .withColumn("text", concat(lit("UPDATED "), $"doc_id".cast("string")))
          .unionByName(docs.where($"doc_id" < 3)
            .withColumn("doc_id", $"doc_id" + 100000)
            .withColumn("text", lit("NEW DOC")))
        val newSnap = Merge.applyDeletes(
          Merge.upsert(docs, updates, "doc_id"),
          docs.where($"doc_id" % 13 === 5), "doc_id")
        Merge.diff(docs, newSnap, "doc_id")
          .select($"doc_id".cast("bigint").as("doc_id"), $"change")
          .orderBy($"doc_id")
      },
      Some("""WITH updates AS (
             |  SELECT doc_id, 'UPDATED ' || CAST(doc_id AS VARCHAR) AS text, lang, source, n_chars
             |  FROM documents WHERE doc_id % 7 = 0
             |  UNION ALL
             |  SELECT doc_id + 100000, 'NEW DOC', lang, source, n_chars
             |  FROM documents WHERE doc_id < 3),
             |newsnap AS (
             |  SELECT * FROM (
             |    SELECT * FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM updates)
             |    UNION ALL SELECT * FROM updates)
             |  WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id % 13 = 5))
             |SELECT doc_id, change FROM (
             |  SELECT CAST(COALESCE(o.doc_id, n.doc_id) AS BIGINT) AS doc_id,
             |    CASE WHEN o.doc_id IS NULL THEN 'inserted'
             |         WHEN n.doc_id IS NULL THEN 'deleted'
             |         WHEN (o.text IS DISTINCT FROM n.text)
             |           OR (o.lang IS DISTINCT FROM n.lang)
             |           OR (o.source IS DISTINCT FROM n.source)
             |           OR (o.n_chars IS DISTINCT FROM n.n_chars) THEN 'changed'
             |    END AS change
             |  FROM documents o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id)
             |WHERE change IS NOT NULL
             |ORDER BY doc_id""".stripMargin),
      doc = "CDC-style snapshot diff (one full outer join, non-key columns " +
        "compared via a row fingerprint): inserted/deleted/changed per key, " +
        "unchanged keys absent — dataset version diffing at corpus scale."
    ),
    // ---------------------------------------------------------------- t45
    GraftQuery(
      "t45_contam",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val bench = docs.where(Layout.hashBucket($"doc_id") >= 95)
        val corpus = docs.where(Layout.hashBucket($"doc_id") < 95)
        TextPipeline.contamination(corpus, bench, $"doc_id", $"text", n = 3)
          .select($"id".cast("bigint").as("doc_id"), $"n_shingles", $"overlap_ratio")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket,
             |    list_distinct(list_transform(
             |      range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 2, 0) + 1),
             |      i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |  FROM documents),
             |bench AS (SELECT DISTINCT unnest(sh) AS s FROM tok WHERE bucket >= 95),
             |benchlist AS (SELECT list(s) AS bl FROM bench)
             |SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
             |  CAST(len(t.sh) AS BIGINT) AS n_shingles,
             |  CASE WHEN len(t.sh) = 0 THEN NULL
             |       ELSE CAST(len(list_intersect(t.sh, b.bl)) AS DOUBLE) / len(t.sh)
             |  END AS overlap_ratio
             |FROM tok t CROSS JOIN benchlist b
             |WHERE t.bucket < 95
             |ORDER BY doc_id""".stripMargin),
      doc = "Benchmark-contamination scan: per corpus doc, the fraction of " +
        "its distinct 3-gram shingles found anywhere in the held-out 5% " +
        "benchmark split — shingles hashed to longs before the shuffle."
    ),
    // ---------------------------------------------------------------- t46
    GraftQuery(
      "t46_rep",
      (s, d) => {
        import s.implicits._
        TextPipeline.repetitionScore(Tables.documents(s, d), $"doc_id", $"text", n = 3)
          .select($"id".cast("bigint").as("doc_id"), $"n_shingles", $"distinct_ratio")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
             |sh AS (
             |  SELECT doc_id, GREATEST(len(t) - 2, 0) AS total,
             |    list_distinct(list_transform(
             |      range(1, GREATEST(len(t) - 2, 0) + 1),
             |      i -> array_to_string(t[i : i + 2], ' '))) AS ds
             |  FROM tok)
             |SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |  CAST(total AS BIGINT) AS n_shingles,
             |  CASE WHEN total = 0 THEN NULL
             |       ELSE CAST(len(ds) AS DOUBLE) / total END AS distinct_ratio
             |FROM sh
             |ORDER BY doc_id""".stripMargin),
      doc = "Gopher-style repetition score: fraction of each doc's word " +
        "3-grams that are distinct (low = internal repetition); distinct " +
        "count via the native one-pass shingle_hashes expression."
    ),
    // ---------------------------------------------------------------- t47
    GraftQuery(
      "t47_emblsh_sound",
      (s, d) => {
        import s.implicits._
        import graft.operators.Similarity
        val emb = Tables.embeddings(s, d)
        // SRP-LSH-banded near-dups with no blocking assumption, tuned for
        // the corpus's similarity regime (max pairwise cosine ~0.5): 3-bit
        // bands give ~0.98 per-pair recall at s = 0.3
        val lsh = Similarity.embeddingNearDupsLsh(emb, "vec_id", "embedding",
          threshold = 0.3, bandBits = 3, nBands = 16)
        // unconditionally complete twin: the blocked-exact operator over ONE
        // global block (the same family the t18 oracle hash-validates)
        val exact = Similarity.embeddingNearDups(
          emb.withColumn("blk", lit(1)), "vec_id", "embedding", "blk", threshold = 0.3)
        // soundness: every emitted pair must exist in the complete join with
        // the identical exact cosine
        val phantom = lsh.join(exact, Seq("id_a", "id_b"), "left_anti")
          .select($"id_a", $"id_b", lit("not_a_pair").as("reason"))
        val wrongSim = lsh.as("m").join(exact.as("e"), Seq("id_a", "id_b"))
          .filter(col("m.sim") =!= col("e.sim"))
          .select($"id_a", $"id_b", lit("sim_mismatch").as("reason"))
        // recall floor: banding is deterministic (hash-derived hyperplanes),
        // so a silent recall collapse emits a violation row, not drift
        val lowRecall = lsh.join(exact, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("hits"))
          .crossJoin(exact.agg(count(lit(1)).as("denom")))
          .filter($"hits".cast("double") < $"denom".cast("double") * 0.8)
          .select(lit(-2L).as("id_a"), lit(-2L).as("id_b"), lit("low_recall").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        phantom.unionAll(wrongSim).unionAll(lowRecall).unionAll(sentinel)
          .orderBy($"id_a", $"id_b", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b, 'sentinel' AS reason"),
      doc = "SRP-LSH embedding near-dup soundness: emitted pairs must be a " +
        "subset of the complete blocked-exact join with identical sims, and " +
        "recall must clear a 0.8 floor; emits violations + sentinel.",
      gate = true
    )
  )
}
