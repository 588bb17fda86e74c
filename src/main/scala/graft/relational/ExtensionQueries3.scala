package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.{Clustering, FuzzyJoin, Sampling, TextPipeline, TextSearch}
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
        "dropped nothing."
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
        "improved — Lloyd's invariants, checked on every run."
    )
  )
}
