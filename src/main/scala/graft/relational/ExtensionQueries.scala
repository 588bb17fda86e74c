package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.functions.Normalize
import graft.operators._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The training-data extension surface (BASELINE.json north star):
  * deduplication, similarity search, text analysis, multimodal plumbing —
  * plus oracle-checked wirings of the reference's own normalization/dedup
  * operators (SURVEY.md §2.2 P1/P4, §2.5 O1, §2.6 F2) onto the driver
  * testdata.
  *
  * Sketch-based operators (MinHash, SimHash, SRP-LSH) have no SQL oracle —
  * they get rows-only checks here and exact-recomputation assertions in
  * ScalaTest specs.
  */
object ExtensionQueries {

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- t01
    GraftQuery(
      "t01_dedup_exact",
      (s, d) => {
        import s.implicits._
        DedupOps.exactDupFlags(Tables.documents(s, d), $"text", $"doc_id")
          .select($"doc_id", $"is_dup")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, (rn > 1) AS is_dup FROM (
             |  SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin),
      doc = "Exact dedup via content hash; first doc per hash kept."
    ),
    // ---------------------------------------------------------------- t02
    GraftQuery(
      "t02_fingerprint",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Whitespace/punctuation-insensitive document fingerprint."
    ),
    // ---------------------------------------------------------------- t03
    GraftQuery(
      "t03_tokens",
      (s, d) => {
        import s.implicits._
        val t = Tables.documents(s, d)
        t.select(
          $"doc_id",
          TextAnalysis.tokenCount($"text").as("n_tokens"),
          length($"text").cast("long").as("n_chars_measured"),
          (length(regexp_replace($"text", "\\s", "")).cast("double") /
            TextAnalysis.tokenCount($"text")).as("avg_token_len"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             |  CAST(length(text) AS BIGINT) AS n_chars_measured,
             |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
             |    / CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS avg_token_len
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Whitespace tokenizer + average token length."
    ),
    // ---------------------------------------------------------------- t04
    GraftQuery(
      "t04_quality",
      (s, d) => {
        import s.implicits._
        val stopHits = TextAnalysis.occurrences($"text", " the ")
        Tables.documents(s, d)
          .select(
            $"doc_id",
            length($"text").cast("long").as("n_chars_measured"),
            TextAnalysis.punctRatio($"text").as("punct_ratio"),
            stopHits.as("stop_hits"),
            TextAnalysis.qualityScore($"text", stopHits).as("quality"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_chars_measured,
             |  CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
             |  (length(text) - length(replace(text, ' the ', ''))) // 5 AS stop_hits,
             |  (CASE WHEN (length(text) - length(replace(text, ' the ', ''))) // 5 > 0 THEN 0.4 ELSE 0.0 END)
             |    + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE) / length(text))
             |    + (CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 0.3 ELSE 0.0 END) AS quality
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Length/punctuation/stopword quality heuristics."
    ),
    // ---------------------------------------------------------------- t05
    GraftQuery(
      "t05_langid",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", $"lang", TextAnalysis.langId($"text").as("pred_lang"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang,
             |  CASE WHEN instr(text, ' och ') > 0 OR instr(text, ' att ') > 0 THEN 'sv'
             |       WHEN instr(text, ' the ') > 0 OR instr(text, ' and ') > 0 THEN 'en'
             |       WHEN instr(text, ' und ') > 0 OR instr(text, ' der ') > 0 THEN 'de'
             |       WHEN instr(text, ' le ') > 0 OR instr(text, ' et ') > 0 THEN 'fr'
             |       WHEN instr(text, ' el ') > 0 OR instr(text, ' la ') > 0 THEN 'es'
             |       ELSE 'und' END AS pred_lang
             |FROM documents ORDER BY doc_id""".stripMargin),
      doc = "Function-word heuristic language ID."
    ),
    // ---------------------------------------------------------------- t06
    GraftQuery(
      "t06_ngram_profile",
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .filter(length($"text") >= 3)
          .select($"lang", explode(TextAnalysis.charNgrams($"text", 3)).as("g"))
          .groupBy($"lang", $"g")
          .agg(count(lit(1)).as("n"))
          .filter($"n" >= 20)
          .orderBy($"lang", $"g")
      },
      Some("""SELECT lang, g, COUNT(*) AS n FROM (
             |  SELECT lang, unnest(list_transform(range(1, length(text) - 1),
             |    i -> substring(text, i, 3))) AS g
             |  FROM documents WHERE length(text) >= 3)
             |GROUP BY lang, g HAVING COUNT(*) >= 20
             |ORDER BY lang, g""".stripMargin),
      doc = "Per-language character-trigram frequency profile (explode + agg)."
    ),
    // ---------------------------------------------------------------- t07
    GraftQuery(
      "t07_dedup_minhash",
      (s, d) => {
        import s.implicits._
        // Deterministic quarter (the t57 playbook): every assertion below is
        // a PER-PAIR theorem (soundness subset, value identity, banding
        // recall on identical signatures) — banding collisions are a
        // function of the two docs alone, so restricting the corpus
        // restricts the pair set without changing any pair's verdict, while
        // the complete exact twin (quadratic) costs 1/16. Recall on the
        // quarter equals recall restricted to quarter-pairs — measured 1.0
        // at every SF (GateProbe), same as the full corpus. Full-scale
        // operator cost stays covered by the stress run's minhash stages.
        val docs = Tables.documents(s, d).where(col("doc_id") % 4 === 0)
        // the banded operator under test; materialized once — the four
        // violation branches below each consume it, and without the
        // checkpoint the banded join (and the complete twin) re-execute
        // per branch (measured 7.0 -> ~2.5 s at sf0.1)
        val mh = DedupOps.minhashNearDups(docs, "doc_id", "text",
          threshold = 0.5).localCheckpoint()
        // unconditionally complete twin: the inverted-index exact join over
        // ONE global block (the family the t09 oracle hash-validates), same
        // shingle hashing — so surviving pairs must agree on jaccard exactly
        val exact = DedupOps.ngramJaccardPairs(
          docs.withColumn("blk", lit(1)), "doc_id", "text", groupCol = "blk",
          n = 3, threshold = 0.5).localCheckpoint()
        // soundness: every emitted pair exists in the complete join with the
        // identical exact jaccard (the operator verifies candidates exactly,
        // so both are theorems, not tuning)
        val phantom = mh.join(exact, Seq("id_a", "id_b"), "left_anti")
          .select($"id_a", $"id_b", lit("not_a_pair").as("reason"))
        val wrongJ = mh.as("m").join(exact.as("e"), Seq("id_a", "id_b"))
          .filter(col("m.jaccard") =!= col("e.jaccard"))
          .select($"id_a", $"id_b", lit("jaccard_mismatch").as("reason"))
        // guaranteed recall (theorem): an identical full signature collides
        // in every band, so such a pair at exact jaccard >= threshold MUST
        // be emitted
        val sig = docs.select($"doc_id",
          graft.expressions.GraftFunctions.minhashSig($"text", 3, 32).as("sig"))
        val sameSig = sig.as("a").join(sig.as("b"),
            col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        val missedSame = sameSig.join(exact, Seq("id_a", "id_b"))
          .join(mh, Seq("id_a", "id_b"), "left_anti")
          .select($"id_a", $"id_b", lit("missed_identical_sig").as("reason"))
        // empirical recall floor: banding is deterministic (xxhash-derived),
        // so recall is byte-stable per corpus — measured 1.0 on the FULL
        // corpus at every driver SF (GateProbe; full-corpus coverage lives
        // there and in the stress minhash stages), and the quarter's green
        // verify runs at all three SFs pin it above the floor; 0.6 turns a
        // silent recall collapse into a violation row instead of drift
        val lowRecall = mh.join(exact, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("hits"))
          .crossJoin(exact.agg(count(lit(1)).as("denom")))
          .filter($"hits".cast("double") < $"denom".cast("double") * 0.6)
          .select(lit(-2L).as("id_a"), lit(-2L).as("id_b"),
            lit("low_recall").as("reason"))
        // vacuity guard: `hits < denom * 0.6` is trivially false at denom 0,
        // so a corpus/testdata change that collapses the exact-pair set
        // would silently reduce this gate to soundness-only — an empty
        // denominator must fail LOUDLY, not pass vacuously (7 pairs at
        // sf0.001, 1 at sf0.01 today)
        val noPairs = exact.agg(count(lit(1)).as("denom"))
          .filter($"denom" === 0)
          .select(lit(-3L).as("id_a"), lit(-3L).as("id_b"),
            lit("no_pairs").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        phantom.unionAll(wrongJ).unionAll(missedSame).unionAll(lowRecall)
          .unionAll(noPairs).unionAll(sentinel)
          .orderBy($"id_a", $"id_b", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b, 'sentinel' AS reason"),
      doc = "MinHash+LSH near-dup soundness gate: emitted pairs must be a " +
        "subset of the complete exact-jaccard join with identical values, " +
        "identical-signature pairs above threshold must be found (banding " +
        "theorem), and recall must clear a 0.6 floor; emits violations + " +
        "sentinel against a constant oracle.",
      gate = true
    ),
    // ---------------------------------------------------------------- t08
    GraftQuery(
      "t08_dedup_simhash",
      (s, d) => {
        import s.implicits._
        // Deterministic quarter (t57 playbook, as in t07): both bandings'
        // completeness claims are pigeonhole theorems on a pair's two
        // signatures — corpus size only scales the candidate-join cost, so
        // a quarter preserves every assertion at ~1/16 the join work.
        val docs = Tables.documents(s, d).where(col("doc_id") % 4 === 0)
        // the operator under test: 4x16-bit chunk banding, complete for
        // hamming <= 3 by pigeonhole, exact-verified to maxHamming = 10.
        // Both bandings are materialized once: the four violation branches
        // below otherwise re-execute the ~10^6-candidate 8-bit chunk join
        // per branch (measured 14-20 s -> ~4 s at sf0.1)
        val sh4 = DedupOps.simhashNearDups(docs, "doc_id", "text",
          maxHamming = 10).localCheckpoint()
        // independent twin: 8x8-bit banding over the same signatures —
        // different chunking, same bit_count verify, complete for
        // hamming <= 7 by the same pigeonhole argument
        val sig = docs
          .select($"doc_id".as("id"), DedupOps.simhash($"text").as("sh"))
          .select($"id", $"sh", posexplode(
            transform(sequence(lit(0), lit(7)),
              c => call_function("shiftright", $"sh", c * 8).bitwiseAND(0xFFL))))
          .withColumnRenamed("pos", "chunk_idx")
          .withColumnRenamed("col", "chunk_val")
        val a8 = sig.select($"id".as("id_a"), $"sh".as("sh_a"), $"chunk_idx", $"chunk_val")
        val b8 = sig.select($"id".as("id_b"), $"sh".as("sh_b"), $"chunk_idx", $"chunk_val")
        val sh8 = a8.join(b8, Seq("chunk_idx", "chunk_val"))
          .filter($"id_a" < $"id_b")
          .dropDuplicates("id_a", "id_b")
          .withColumn("hamming", bit_count($"sh_a".bitwiseXOR($"sh_b")))
          .filter($"hamming" <= 10)
          .select($"id_a", $"id_b", $"hamming")
          .localCheckpoint()
        // both bandings are complete at hamming <= 3 → set equality there
        // is a theorem; the 8-chunk twin is complete at <= 7 → any emitted
        // pair at <= 7 must appear in it; value identity on shared pairs
        val low4 = sh4.filter($"hamming" <= 3)
        val low8 = sh8.filter($"hamming" <= 3)
        val onlyIn4 = low4.join(low8, Seq("id_a", "id_b"), "left_anti")
          .select($"id_a", $"id_b", lit("le3_only_in_4chunk").as("reason"))
        val onlyIn8 = low8.join(low4, Seq("id_a", "id_b"), "left_anti")
          .select($"id_a", $"id_b", lit("le3_only_in_8chunk").as("reason"))
        val sub7miss = sh4.filter($"hamming" <= 7)
          .join(sh8, Seq("id_a", "id_b"), "left_anti")
          .select($"id_a", $"id_b", lit("le7_not_in_8chunk").as("reason"))
        val wrongH = sh4.as("m").join(sh8.as("e"), Seq("id_a", "id_b"))
          .filter(col("m.hamming") =!= col("e.hamming"))
          .select($"id_a", $"id_b", lit("hamming_mismatch").as("reason"))
        // vacuity guard (same rule as t07): every assertion above is a
        // set/value comparison that holds trivially over empty pair sets —
        // if the complete-to-7 twin finds NOTHING the gate is proving
        // nothing, and a collapsed corpus must fail loudly (the twin holds
        // >= the le3 pairs by completeness: 5 at sf0.001, 1 at sf0.01)
        val noPairs = sh8.agg(count(lit(1)).as("denom"))
          .filter($"denom" === 0)
          .select(lit(-3L).as("id_a"), lit(-3L).as("id_b"),
            lit("no_pairs").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        onlyIn4.unionAll(onlyIn8).unionAll(sub7miss).unionAll(wrongH)
          .unionAll(noPairs).unionAll(sentinel)
          .orderBy($"id_a", $"id_b", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b, 'sentinel' AS reason"),
      doc = "SimHash near-dup gate vs an independent 8x8-bit banding of the " +
        "same signatures: the two bandings must agree exactly at hamming " +
        "<= 3 (both complete there by pigeonhole), emitted pairs at <= 7 " +
        "must appear in the 8-chunk twin (complete to <= 7), and shared " +
        "pairs must agree on hamming; violations + sentinel, constant oracle.",
      gate = true
    ),
    // ---------------------------------------------------------------- t09
    GraftQuery(
      "t09_ngram_jaccard",
      (s, d) => {
        import s.implicits._
        // maxDf opt-in here (the complete default is Int.MaxValue): this
        // query exercises the skew-cutoff plan shape (PlanShapeSpec pins the
        // broadcast anti-join) and the brute-force oracle proves the cutoff
        // loses nothing on this corpus.
        DedupOps.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          groupCol = "source", n = 3, threshold = 0.2, maxDf = 1000)
          .orderBy($"id_a", $"id_b")
      },
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
             |FROM (SELECT doc_id, source, list_distinct(list_transform(
             |        range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
             |        i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |      FROM documents) a
             |JOIN (SELECT doc_id, source, list_distinct(list_transform(
             |        range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
             |        i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |      FROM documents) b
             |  ON a.source = b.source AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.2
             |ORDER BY id_a, id_b""".stripMargin),
      doc = "Exact n-gram Jaccard within source groups: df-cutoff posting index, full-set verification, vs a brute-force DuckDB pair oracle."
    ),
    // ---------------------------------------------------------------- t10
    GraftQuery(
      "t10_emb_norm",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .select($"vec_id",
            size($"embedding").cast("long").as("dim"),
            Similarity.norm2($"embedding").as("norm2"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
             |  list_sum(list_transform(embedding,
             |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm2
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      doc = "Embedding squared norm in double precision, element-order fold."
    ),
    // ---------------------------------------------------------------- t11
    GraftQuery(
      "t11_ann_bruteforce",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(
          emb, emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 5)
          .orderBy($"query_id", $"rank")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
             |scored AS (
             |  SELECT q.query_id, e.vec_id AS neighbor_id,
             |    list_sum(list_transform(list_zip(q.qv, e.embedding),
             |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             |    / (sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |       * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
             |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
             |SELECT query_id, rank, neighbor_id, sim FROM (
             |  SELECT query_id, neighbor_id, sim,
             |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
             |  FROM scored)
             |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
      doc = "Brute-force cosine top-k: broadcast queries, one corpus pass, ranking window."
    ),
    // ---------------------------------------------------------------- t12
    GraftQuery(
      "t12_ann_lsh",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 3)
        // the TUNED multi-probe configuration (bits=2, probe the bucket +
        // both 1-bit neighbors): measured recall@5 0.93/0.53/0.73 at
        // sf0.001/0.01/0.1 (GateProbe ann sweep, 2026-08-14) — the
        // single-probe baseline is recall-weak by construction (one bucket
        // = 1/2^bits of the corpus) and stays covered by t30's soundness
        // gate + t25's floored lsh row
        val topk = Similarity.lshTopK(
          emb, queries, "vec_id", "embedding", k = 5, bits = 2, multiProbe = 2)
        AnnGates.verdict(emb, queries, topk, k = 5, recallFloor = 0.5)
      },
      Some(AnnGates.oracle),
      doc = "SRP-LSH bucketed approximate top-k gate at the tuned " +
        "multi-probe config: emitted sims must equal the exact cosine " +
        "recomputed from the corpus, ranks must be dense and ordered by " +
        "(sim desc, neighbor asc), no self/duplicate neighbors, and " +
        "recall@5 vs brute force must clear the 0.5 floor (measured " +
        "0.53-0.93 across SFs); violations + sentinel, constant oracle.",
      gate = true
    ),
    // ---------------------------------------------------------------- t13
    GraftQuery(
      "t13_multimodal",
      (s, d) => {
        import s.implicits._
        Multimodal
          .featurize(Multimodal.mediaFromDocuments(Tables.documents(s, d)))
          .toDF()
          .select($"doc_id", $"modality", $"payload_len", $"checksum",
            $"width", $"height")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS payload_len,
             |  CAST(list_sum(list_transform(range(1, LEAST(length(d.text), 64) + 1),
             |    i -> unicode(substring(d.text, i, 1)))) AS BIGINT) AS checksum,
             |  CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN CAST(octet_length(encode(text)) % 1920 AS INT)
             |    WHEN 1 THEN CAST(octet_length(encode(text)) % 48000 AS INT)
             |    ELSE CAST(octet_length(encode(text)) % 1920 AS INT) END AS width,
             |  CASE CAST(doc_id % 3 AS INT)
             |    WHEN 0 THEN CAST(octet_length(encode(text)) % 1080 AS INT)
             |    WHEN 1 THEN 1
             |    ELSE CAST(octet_length(encode(text)) % 60 AS INT) END AS height
             |FROM documents d ORDER BY doc_id""".stripMargin),
      doc = "Multimodal binary plumbing: payload bytes + stub decode via per-partition batch operator."
    ),
    // ---------------------------------------------------------------- t17
    GraftQuery(
      "t17_asof_join",
      (s, d) => {
        import s.implicits._
        // each purchase joined to the user's most recent signup/login at or
        // before it — the canonical time-series enrichment join
        // Tables.events absorbs the stored ts type (ns-long vs timestamp[us]);
        // unix_micros matches the oracle's epoch_ns(ts) // 1000 under UTC.
        val ev = Tables.events(s, d)
          .select($"event_id", $"user_id", $"event_type",
            unix_micros($"ts").as("us"), $"value")
        val purchases = ev.filter($"event_type" === "purchase")
          .select($"event_id", $"user_id", $"us", $"value")
        // unique (user, us) on the right: keep max event_id per timestamp
        val sessions = FirstWinsDedup(
          ev.filter($"event_type".isin("signup", "login"))
            .select($"event_id", $"user_id", $"us"),
          Seq($"user_id", $"us"), (-$"event_id").asc)
        AsOfJoin(purchases, sessions, key = "user_id",
          leftTime = "us", rightTime = "us",
          rightPayload = Seq("event_id", "us"), rightOrder = "event_id")
          .select($"event_id", $"user_id", $"us", $"value",
            $"asof_event_id".as("session_event_id"),
            $"asof_us".as("session_us"))
          .orderBy($"event_id")
      },
      Some("""SELECT p.event_id, p.user_id, p.us, p.value,
             |  s.event_id AS session_event_id, s.us AS session_us
             |FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us, value
             |      FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (
             |  SELECT user_id, us, MAX(event_id) AS event_id FROM
             |    (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
             |     FROM events WHERE event_type IN ('signup', 'login'))
             |  GROUP BY user_id, us) s
             |ON p.user_id = s.user_id AND p.us >= s.us
             |ORDER BY p.event_id""".stripMargin),
      doc = "As-of join composed from window carry-forward (graft.operators.AsOfJoin) vs DuckDB's native ASOF JOIN."
    ),
    // ---------------------------------------------------------------- t18
    GraftQuery(
      "t18_emb_dedup",
      (s, d) => {
        import s.implicits._
        Similarity.embeddingNearDups(
          Tables.embeddings(s, d), "vec_id", "embedding",
          blockCol = "label", threshold = 0.3)
          .orderBy($"id_a", $"id_b")
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  list_sum(list_transform(list_zip(a.embedding, b.embedding),
             |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             |  / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
             |    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             |  / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.3
             |ORDER BY id_a, id_b""".stripMargin),
      doc = "Embedding-cosine near-dup pairs with label blocking; scale path = SRP-LSH buckets."
    ),
    // ---------------------------------------------------------------- t19
    GraftQuery(
      "t19_skew_join",
      (s, d) => {
        import s.implicits._
        // salting changes the physical plan, not the result — the oracle is
        // the plain join, which is exactly the operator's correctness claim
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_partkey", $"l_quantity")
        val orders = Tables.orders(s, d)
          .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
        SkewJoin.salted(li, orders, "l_orderkey", salt = 16, saltFrom = "l_partkey")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum($"l_quantity".cast("decimal(12,2)")).cast("double").as("sum_qty"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "Salted skew join (operators.SkewJoin) — result provably identical to the plain join."
    ),
    // ---------------------------------------------------------------- t20
    GraftQuery(
      "t20_tfidf",
      (s, d) => {
        import s.implicits._
        TextAnalysis.tfidfTopTerms(Tables.documents(s, d), "doc_id", "text")
          .orderBy($"doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM tok GROUP BY doc_id, term),
             |tot AS (SELECT doc_id, COUNT(*) AS total FROM tok GROUP BY doc_id),
             |dfreq AS (SELECT term, COUNT(*) AS df FROM
             |           (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
             |n AS (SELECT COUNT(DISTINCT doc_id) AS nd FROM documents)
             |SELECT doc_id, term AS top_term, score FROM (
             |  SELECT tf.doc_id, tf.term,
             |    (CAST(tf.cnt AS DOUBLE) / tot.total) * (CAST(n.nd AS DOUBLE) / dfreq.df) AS score,
             |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id ORDER BY
             |      (CAST(tf.cnt AS DOUBLE) / tot.total) * (CAST(n.nd AS DOUBLE) / dfreq.df) DESC,
             |      tf.term) AS rn
             |  FROM tf JOIN tot USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n)
             |WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      doc = "TF-IDF top term per doc (rational idf — log differs across libm impls in the last bit)."
    ),
    // ---------------------------------------------------------------- t21
    GraftQuery(
      "t21_interval_join",
      (s, d) => {
        import s.implicits._
        // the stream-stream interval join evaluated in batch (withWatermark
        // is a no-op on batch frames) — same operator the streaming spec
        // drives with the micro-batch engine
        graft.streaming.StreamingOps
          .purchaseAttribution(Tables.events(s, d), intervalSeconds = 3600)
          .select($"p_event_id", $"user_id",
            date_format($"p_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("p_time"),
            $"value", $"s_event_id",
            date_format($"s_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").as("s_time"))
          .orderBy($"p_event_id", $"s_event_id")
      },
      Some("""SELECT p.event_id AS p_event_id, p.user_id,
             |  strftime(make_timestamp(epoch_ns(p.ts) // 1000), '%Y-%m-%d %H:%M:%S.%f') AS p_time,
             |  p.value, s.event_id AS s_event_id,
             |  strftime(make_timestamp(epoch_ns(s.ts) // 1000), '%Y-%m-%d %H:%M:%S.%f') AS s_time
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT * FROM events WHERE event_type IN ('signup', 'login')) s
             |  ON p.user_id = s.user_id
             | AND s.ts <= p.ts
             | AND s.ts >= p.ts - INTERVAL 3600 SECONDS
             |ORDER BY p_event_id, s_event_id""".stripMargin),
      doc = "Stream-stream interval join (StreamingOps.purchaseAttribution) in its batch evaluation."
    ),
    // ---------------------------------------------------------------- t22
    GraftQuery(
      "t22_ann_ivf",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter($"vec_id" < 3)
        // the PRODUCTION ANN path (round-13: designated and tuned): at the
        // driver corpora the per-cell structure is weak (500-2000 random-ish
        // 64-dim vectors), so clearing recall 0.8 takes probing 5 of 8
        // cells — measured 0.80/0.87/0.87 at sf0.001/0.01/0.1 (GateProbe
        // ann sweep, 2026-08-14; nCells=16/nProbe=8 collapses to 0.47 at
        // n=500 while winning at n=2000 — cell count must not outrun the
        // corpus). At real scale nCells grows ~sqrt(N) and the probe
        // FRACTION falls as cells gain internal coherence; the floor locks
        // the recall CONTRACT, ivfBuild/ivfQuery lock the partition-pruned
        // disk layout (t27).
        val topk = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          k = 5, nCells = 8, nProbe = 5)
        AnnGates.verdict(emb, queries, topk, k = 5, recallFloor = 0.8)
      },
      Some(AnnGates.oracle),
      doc = "IVF (k-means coarse quantizer) approximate top-k gate — the " +
        "designated production ANN path: sims must equal the exact cosine, " +
        "ranks dense and correctly ordered, no self/duplicate neighbors, " +
        "recall@5 vs brute force >= 0.8 (measured 0.80-0.87 across SFs); " +
        "violations + sentinel, constant oracle.",
      gate = true
    ),
    // ---------------------------------------------------------------- t23
    GraftQuery(
      "t23_prefix_jaccard",
      (s, d) => {
        import s.implicits._
        // 0.8 is where the prefix principle earns its keep: only ~20% of each
        // set is indexed. Below t≈0.5 prefixJaccardPairs self-routes to the
        // inverted-index join (t09's shape) — benchmarked there.
        DedupOps.prefixJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          groupCol = "source", n = 3, threshold = 0.8)
          .orderBy($"id_a", $"id_b")
      },
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
             |FROM (SELECT doc_id, source, list_distinct(list_transform(
             |        range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
             |        i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |      FROM documents) a
             |JOIN (SELECT doc_id, source, list_distinct(list_transform(
             |        range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
             |        i -> array_to_string(string_split_regex(trim(text), '\s+')[i : i + 2], ' '))) AS sh
             |      FROM documents) b
             |  ON a.source = b.source AND a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.8
             |ORDER BY id_a, id_b""".stripMargin),
      doc = "Prefix-filtered exact Jaccard join (SSJoin prefix principle) at a pruning-effective threshold vs a brute-force DuckDB pair oracle."
    ),
    // ---------------------------------------------------------------- t24
    GraftQuery(
      "t24_topk_plan",
      (s, d) => {
        import s.implicits._
        // the custom LogicalPlan+Strategy+SparkPlan operator (bounded heaps,
        // no sort) vs the oracle's window formulation — same rows required
        val orders = Tables.orders(s, d)
          .withColumn("score", $"o_totalprice" * 1000000.0 + $"o_orderkey")
        graft.plans.TopKPerKey(orders, Seq("o_custkey"), "score", 3)
          .select($"o_custkey", $"o_orderkey", $"o_totalprice")
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice * 1000000.0 + o_orderkey DESC) AS rn
             |  FROM orders)
             |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "Custom physical operator (TopKPerKeyExec: per-key bounded heaps, sort-free) vs the window oracle."
    ),
    // ---------------------------------------------------------------- t25
    GraftQuery(
      "t25_ann_recall",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        // the TUNED configurations of t12 (multi-probe SRP-LSH) and t22
        // (IVF, the designated production path), plus the single-probe LSH
        // baseline; recall vs the t11 brute-force oracle. Everything is
        // deterministic (fixed k-means seed, hash-derived hyperplanes,
        // unique tiebreaks), so the recalls are byte-stable — gated against
        // per-method floors that hold at every driver SF (GateProbe ann
        // sweep 2026-08-14, sf0.001/0.01/0.1: ivf 0.80/0.87/0.87 at
        // nCells=8 nProbe=5; lsh_mp 0.93/0.53/0.73 at bits=2 mp=2; lsh
        // single-probe 0.53/0.20/0.40). Floors ivf 0.8 / lsh_mp 0.5 /
        // lsh 0.15 LOCK the tuned recall: a regression to the r12 state
        // (ivf 0.5-0.73, lsh 0.067) is a red row now, not a passing 0.05.
        Similarity.annRecall(emb, emb.filter($"vec_id" < 3), "vec_id", "embedding",
          k = 5, bits = 2, nCells = 8, nProbe = 5)
          .select($"method",
            ($"recall" >= when($"method" === "ivf", 0.8)
              .when($"method" === "lsh_mp", 0.5)
              .otherwise(0.15))
              .cast("bigint").as("recall_ok"))
          .orderBy($"method")
      },
      Some("""SELECT 'ivf' AS method, CAST(1 AS BIGINT) AS recall_ok
             |UNION ALL
             |SELECT 'lsh' AS method, CAST(1 AS BIGINT) AS recall_ok
             |UNION ALL
             |SELECT 'lsh_mp' AS method, CAST(1 AS BIGINT) AS recall_ok
             |ORDER BY method""".stripMargin),
      doc = "Recall@5 of the tuned SRP-LSH and IVF ANN paths vs brute " +
        "force, deterministic and gated against per-method floors (ivf 0.8, " +
        "lsh_mp 0.5, lsh 0.15) via a constant oracle.",
      gate = true
    ),
    // ---------------------------------------------------------------- t26
    GraftQuery(
      "t26_dup_components",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        // prefix-filtered generator at a pruning-effective threshold — the
        // pair source a production dedup would use (complete: no maxDf)
        val pairs = DedupOps.prefixJaccardPairs(docs, "doc_id", "text",
          groupCol = "source", n = 3, threshold = 0.8)
        DedupClusters.connectedComponents(docs.select($"doc_id"), pairs, "doc_id")
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE sets AS (
             |  SELECT doc_id, source, list_distinct(list_transform(
             |      range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
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
             |comp AS (SELECT src AS doc_id, MIN(dst) AS m FROM reach GROUP BY src)
             |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
             |  CAST(COALESCE(LEAST(c.m, d.doc_id), d.doc_id) AS BIGINT) AS component
             |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "Near-dup pairs resolved to connected components (min-label propagation) vs a DuckDB recursive-CTE transitive-closure oracle."
    ),
    // ---------------------------------------------------------------- t14
    GraftQuery(
      "t14_ref_normalize",
      (s, d) => {
        import s.implicits._
        val raw = Tables.documents(s, d).select(
          $"doc_id",
          when($"doc_id" % 7 === 0, "N/A")
            .when($"doc_id" % 11 === 0, "  ").otherwise($"lang").as("raw_lang"),
          concat($"n_chars".cast("string"), lit(".0")).as("num_str"),
          when($"doc_id" % 2 === 0, "12.5").otherwise("-7.0").as("mixed"))
        raw.select(
          $"doc_id",
          Normalize.normalizeMissing($"raw_lang").as("norm_lang"),
          Normalize.formatNumber($"num_str").as("n_chars_fmt"),
          Normalize.formatNumber($"mixed").as("mixed_fmt"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id,
             |  CASE WHEN raw_lang IS NULL OR trim(raw_lang) = '' OR upper(trim(raw_lang)) = 'N/A'
             |       THEN '[Data Saknas]' ELSE trim(raw_lang) END AS norm_lang,
             |  CASE WHEN regexp_full_match(num_str, '-?\d+\.0')
             |       THEN CAST(CAST(CAST(num_str AS DOUBLE) AS BIGINT) AS VARCHAR) ELSE num_str END AS n_chars_fmt,
             |  CASE WHEN regexp_full_match(mixed, '-?\d+\.0')
             |       THEN CAST(CAST(CAST(mixed AS DOUBLE) AS BIGINT) AS VARCHAR) ELSE mixed END AS mixed_fmt
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 7 = 0 THEN 'N/A' WHEN doc_id % 11 = 0 THEN '  ' ELSE lang END AS raw_lang,
             |    CAST(n_chars AS VARCHAR) || '.0' AS num_str,
             |    CASE WHEN doc_id % 2 = 0 THEN '12.5' ELSE '-7.0' END AS mixed
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin),
      doc = "Reference P1 missing-normalize + F2 number-format, oracle-checked on testdata."
    ),
    // ---------------------------------------------------------------- t15
    GraftQuery(
      "t15_ref_first_wins",
      (s, d) => {
        import s.implicits._
        FirstWinsDedup(Tables.documents(s, d), Seq("lang", "source"), "doc_id")
          .select($"lang", $"source", $"doc_id")
          .orderBy($"lang", $"source")
      },
      Some("""SELECT lang, source, doc_id FROM (
             |  SELECT lang, source, doc_id,
             |    ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
             |  FROM documents)
             |WHERE rn = 1 ORDER BY lang, source""".stripMargin),
      doc = "Reference O1 deterministic first-wins dedup on testdata."
    ),
    // ---------------------------------------------------------------- t16
    GraftQuery(
      "t16_ref_year_coalesce",
      (s, d) => {
        import s.implicits._
        val raw = Tables.documents(s, d).select(
          $"doc_id",
          when($"doc_id" % 3 === 0, lit(null).cast("string"))
            .when($"doc_id" % 3 === 1, "N/A").otherwise($"lang").as("v_new"),
          when($"doc_id" % 5 === 0, "").otherwise($"source").as("v_old"))
        raw.select($"doc_id",
          Normalize.yearCoalesce(Seq($"v_new", $"v_old")).as("resolved"))
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, COALESCE(
             |  CASE WHEN v_new IS NULL OR trim(v_new) = '' OR upper(trim(v_new)) = 'N/A'
             |       THEN NULL ELSE trim(v_new) END,
             |  CASE WHEN v_old IS NULL OR trim(v_old) = '' OR upper(trim(v_old)) = 'N/A'
             |       THEN NULL ELSE trim(v_old) END,
             |  '[Data Saknas]') AS resolved
             |FROM (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 3 = 0 THEN NULL WHEN doc_id % 3 = 1 THEN 'N/A' ELSE lang END AS v_new,
             |    CASE WHEN doc_id % 5 = 0 THEN '' ELSE source END AS v_old
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin),
      doc = "Reference P4 year-preference coalesce, oracle-checked on testdata."
    ),
    // ------------------------------------------------------------- t27-t31
    // One-sided SOUNDNESS gates for the sketch/approx operators whose full
    // output has no SQL oracle (the generators are lossy by design, so the
    // result can't equal a brute-force set — but every row it DOES emit makes
    // verifiable claims). Each gate recomputes those claims through an
    // INDEPENDENT formulation (the HOF parity twins, the separately
    // oracle-validated inverted-index join, the in-memory path vs the
    // persisted one) and emits violations plus one deterministic sentinel
    // row; the oracle is the sentinel alone, so ANY violation breaks the
    // row-count/hash match. Sound = exactly the sentinel.
    // ---------------------------------------------------------------- t27
    GraftQuery(
      "t27_ivf_persisted",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val idx = s"${System.getProperty("java.io.tmpdir")}/graft-ivf-${math.abs(d.hashCode)}"
        Similarity.ivfBuild(emb, "vec_id", "embedding", nCells = 8, idx)
        val persisted = Similarity.ivfQuery(s, idx, emb.filter($"vec_id" < 3),
          "vec_id", "embedding", k = 5, nProbe = 3)
        val inMemory = Similarity.ivfTopK(emb, emb.filter($"vec_id" < 3),
          "vec_id", "embedding", k = 5, nCells = 8, nProbe = 3)
        def norm(df: org.apache.spark.sql.DataFrame) = df.select(
          $"query_id".cast("long"), $"rank".cast("long"),
          $"neighbor_id".cast("long"), $"sim".cast("double"))
        val diff = norm(persisted).exceptAll(norm(inMemory))
          .withColumn("side", lit("persisted_only"))
          .unionAll(norm(inMemory).exceptAll(norm(persisted))
            .withColumn("side", lit("memory_only")))
        val sentinel = Seq((-1L, -1L, -1L, -1.0, "sentinel"))
          .toDF("query_id", "rank", "neighbor_id", "sim", "side")
        diff.unionAll(sentinel)
          .orderBy($"query_id", $"rank", $"neighbor_id", $"side")
      },
      Some("""SELECT CAST(-1 AS BIGINT) AS query_id, CAST(-1 AS BIGINT) AS rank,
             |  CAST(-1 AS BIGINT) AS neighbor_id, CAST(-1.0 AS DOUBLE) AS sim,
             |  'sentinel' AS side""".stripMargin),
      doc = "Persisted IVF index (build once, partition-pruned query) must be row-identical to the in-memory ivfTopK; emits differences + sentinel.",
      gate = true
    ),
    // ---------------------------------------------------------------- t28
    GraftQuery(
      "t28_minhash_sound",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val mh = DedupOps.minhashNearDups(docs, "doc_id", "text", threshold = 0.8)
        // the unconditionally complete inverted-index join over ONE global
        // group — the same operator family the t09/t23 brute-force oracles
        // validate, here with no df cutoff, so minhash pairs must be a
        // subset with identical Jaccard values
        val exact = DedupOps.ngramJaccardPairs(
          docs.withColumn("g", lit(1)), "doc_id", "text", "g",
          n = 3, threshold = 0.8)
        val missing = mh.join(exact, Seq("id_a", "id_b"), "left_anti")
          .select($"id_a", $"id_b", lit("not_in_complete_join").as("reason"))
        val wrongJ = mh.as("m")
          .join(exact.as("e"), Seq("id_a", "id_b"))
          .filter(col("m.jaccard") =!= col("e.jaccard"))
          .select($"id_a", $"id_b", lit("jaccard_mismatch").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        missing.unionAll(wrongJ).unionAll(sentinel)
          .orderBy($"id_a", $"id_b", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b, 'sentinel' AS reason"),
      doc = "MinHash-LSH soundness: every emitted pair must appear in the complete exact Jaccard join with the same value; emits violations + sentinel.",
      gate = true
    ),
    // ---------------------------------------------------------------- t29
    GraftQuery(
      "t29_simhash_sound",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val pairs = DedupOps.simhashNearDups(docs, "doc_id", "text", maxHamming = 10)
        // recompute signatures through the built-in-functions HOF twin (a
        // disjoint code path from the native SimHash64 expression)
        val members = pairs.select($"id_a".as("doc_id"))
          .unionAll(pairs.select($"id_b".as("doc_id"))).distinct()
        val sigs = docs.join(members, Seq("doc_id"))
          .select($"doc_id", DedupOps.simhashHof($"text").as("sh2"))
        val viol = pairs
          .join(sigs.select($"doc_id".as("id_a"), $"sh2".as("sh2_a")), Seq("id_a"))
          .join(sigs.select($"doc_id".as("id_b"), $"sh2".as("sh2_b")), Seq("id_b"))
          .withColumn("hamming2", bit_count($"sh2_a".bitwiseXOR($"sh2_b")))
          .filter($"hamming2" =!= $"hamming" || $"hamming2" > 10)
          .select($"id_a", $"id_b", lit("hamming_mismatch").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel")).toDF("id_a", "id_b", "reason")
        viol.unionAll(sentinel).orderBy($"id_a", $"id_b", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS id_a, CAST(-1 AS BIGINT) AS id_b, 'sentinel' AS reason"),
      doc = "SimHash soundness: emitted Hamming distances re-derived via the HOF parity twin must agree and respect the cutoff; emits violations + sentinel.",
      gate = true
    ),
    // ---------------------------------------------------------------- t30
    GraftQuery(
      "t30_lsh_sound",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val res = Similarity.lshTopK(emb, emb.filter($"vec_id" < 3),
          "vec_id", "embedding", k = 5, bits = 4)
        val sig = emb.select($"vec_id",
          Similarity.srpSignature($"embedding", 4).as("bkt"), $"embedding")
        val viol = res
          .join(sig.select($"vec_id".as("neighbor_id"), $"bkt".as("bkt_n"),
            $"embedding".as("nv")), Seq("neighbor_id"))
          .join(sig.select($"vec_id".as("query_id"), $"bkt".as("bkt_q"),
            $"embedding".as("qv")), Seq("query_id"))
          // independent recompute: HOF cosine vs the native expression
          .withColumn("sim2", Similarity.cosineHof($"qv", $"nv"))
          .filter($"bkt_n" =!= $"bkt_q" || $"sim2" =!= $"sim")
          .select($"query_id", $"neighbor_id",
            lit("bucket_or_sim_mismatch").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel"))
          .toDF("query_id", "neighbor_id", "reason")
        viol.unionAll(sentinel).orderBy($"query_id", $"neighbor_id", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS query_id, CAST(-1 AS BIGINT) AS neighbor_id, 'sentinel' AS reason"),
      doc = "SRP-LSH soundness: every returned neighbor must share the query's bucket and carry the HOF-recomputed cosine; emits violations + sentinel.",
      gate = true
    ),
    // ---------------------------------------------------------------- t31
    GraftQuery(
      "t31_ivf_sound",
      (s, d) => {
        import s.implicits._
        val emb = Tables.embeddings(s, d)
        val qs = emb.filter($"vec_id" < 3)
        val res = Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
          k = 5, nCells = 8, nProbe = 3)
        val (assigned, probes) = Similarity.ivfAssignAndProbes(
          emb, qs, "vec_id", "embedding", nCells = 8, nProbe = 3)
        val viol = res
          .join(assigned.select($"neighbor_id", $"cell", $"cv"), Seq("neighbor_id"))
          // left join: a neighbor whose cell the query did NOT probe gets a
          // null qv and is flagged
          .join(probes.select($"query_id", $"cell", $"qv"),
            Seq("query_id", "cell"), "left")
          .withColumn("sim2", Similarity.cosineHof($"qv", $"cv"))
          .filter($"qv".isNull || $"sim2" =!= $"sim")
          .select($"query_id", $"neighbor_id",
            lit("unprobed_cell_or_sim_mismatch").as("reason"))
        val sentinel = Seq((-1L, -1L, "sentinel"))
          .toDF("query_id", "neighbor_id", "reason")
        viol.unionAll(sentinel).orderBy($"query_id", $"neighbor_id", $"reason")
      },
      Some("SELECT CAST(-1 AS BIGINT) AS query_id, CAST(-1 AS BIGINT) AS neighbor_id, 'sentinel' AS reason"),
      doc = "IVF soundness: every returned neighbor must sit in one of its query's probed cells with the HOF-recomputed cosine; emits violations + sentinel.",
      gate = true
    ),
    // ---------------------------------------------------------------- t32
    GraftQuery(
      "t32_dup_components_stars",
      (s, d) => {
        import s.implicits._
        // same pairs and oracle as t26, resolved by the O(log² n)
        // large-star/small-star contraction instead of label propagation —
        // the two implementations are gated against the SAME recursive-CTE
        // transitive closure
        val docs = Tables.documents(s, d)
        val pairs = DedupOps.prefixJaccardPairs(docs, "doc_id", "text",
          groupCol = "source", n = 3, threshold = 0.8)
        DedupClusters.connectedComponentsStars(docs.select($"doc_id"), pairs, "doc_id")
          .orderBy($"doc_id")
      },
      Some("""WITH RECURSIVE sets AS (
             |  SELECT doc_id, source, list_distinct(list_transform(
             |      range(1, GREATEST(len(string_split_regex(trim(text), '\s+')) - 3, 0) + 2),
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
             |comp AS (SELECT src AS doc_id, MIN(dst) AS m FROM reach GROUP BY src)
             |SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
             |  CAST(COALESCE(LEAST(c.m, d.doc_id), d.doc_id) AS BIGINT) AS component
             |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
             |ORDER BY doc_id""".stripMargin),
      doc = "Large-star/small-star connected components (diameter-independent round count) vs the same recursive-CTE transitive-closure oracle as t26."
    ),
    // ---------------------------------------------------------------- t33
    GraftQuery(
      "t33_hll_bound",
      (s, d) => {
        import s.implicits._
        // accuracy gate for the q22 sketch: HLL++ at rsd=0.01 must land
        // within ±5% of the exact distinct counts (deterministic sketch, so
        // this is byte-stable; 5x the configured rsd leaves no flake room)
        val li = Tables.lineitem(s, d)
        // Keep exact and approximate distincts in SEPARATE aggregates:
        //  - two different countDistincts in one agg plans as an Expand
        //    (full-table row multiplication — 29 s at sf0.1);
        //  - mixing one countDistinct with the HLL in one agg drags the HLL
        //    buffer through the distinct rewrite's re-aggregation (~7.5 s).
        // One plain scan computes both HLLs; each exact distinct is its own
        // partial-aggregated pass; the three 1-row frames cross-join for free.
        val approx = li.agg(
          approx_count_distinct($"l_partkey", 0.01).as("ap"),
          approx_count_distinct($"l_orderkey", 0.01).as("ao"))
        val exactP = li.agg(countDistinct($"l_partkey").as("ep"))
        val exactO = li.agg(countDistinct($"l_orderkey").as("eo"))
        val errs = approx.crossJoin(exactP).crossJoin(exactO)
          .select(
            (abs($"ap" - $"ep").cast("double") / $"ep").as("parts"),
            (abs($"ao" - $"eo").cast("double") / $"eo").as("orders"))
        val viol = errs.select(
          explode(map(lit("parts"), $"parts", lit("orders"), $"orders")).as(Seq("metric", "rel_err")))
          .filter($"rel_err" > 0.05)
          .select($"metric", lit("hll_out_of_bound").as("reason"))
        val sentinel = Seq(("zz_sentinel", "sentinel")).toDF("metric", "reason")
        viol.unionAll(sentinel).orderBy($"metric", $"reason")
      },
      Some("SELECT 'zz_sentinel' AS metric, 'sentinel' AS reason"),
      doc = "HLL++ accuracy gate: q22's approx distinct counts within 5% of exact; emits violations + sentinel.",
      gate = true
    ),
    // ---------------------------------------------------------------- t34
    GraftQuery(
      "t34_quantile_bound",
      (s, d) => {
        import s.implicits._
        // accuracy gate for the q36 sketch: each approximate percentile must
        // lie between the exact percentiles at rank ±1% (the GK sketch at
        // accuracy=1000 guarantees rank error <= 0.1%; 10x slack)
        val o = Tables.orders(s, d)
        val g = o.groupBy($"o_orderpriority").agg(
          percentile_approx($"o_totalprice", lit(0.5), lit(1000)).as("a50"),
          percentile_approx($"o_totalprice", lit(0.95), lit(1000)).as("a95"),
          expr("percentile(o_totalprice, 0.49)").as("lo50"),
          expr("percentile(o_totalprice, 0.51)").as("hi50"),
          expr("percentile(o_totalprice, 0.94)").as("lo95"),
          expr("percentile(o_totalprice, 0.96)").as("hi95"))
        val viol = g.filter(
          $"a50" < $"lo50" || $"a50" > $"hi50" ||
            $"a95" < $"lo95" || $"a95" > $"hi95")
          .select($"o_orderpriority".as("grp"), lit("quantile_out_of_bound").as("reason"))
        val sentinel = Seq(("zz_sentinel", "sentinel")).toDF("grp", "reason")
        viol.unionAll(sentinel).orderBy($"grp", $"reason")
      },
      Some("SELECT 'zz_sentinel' AS grp, 'sentinel' AS reason"),
      doc = "Quantile-sketch accuracy gate: q36's approx percentiles within rank +/-1% of exact; emits violations + sentinel.",
      gate = true
    )
  )
}
