package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.TextPipeline
import org.apache.spark.sql.functions._

/** Round-8 third wave: span-removal enforcement, mergeable quantile
  * sketches, HITS link analysis, snapshot diffing. Same contract as
  * [[ExtensionQueries]]: Spark-first builder + DuckDB oracle that must
  * hash-match exactly at sf0.01 and sf0.001.
  */
object ExtensionQueries6 {

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- t85
    GraftQuery(
      "t85_span_removal",
      (s, d) => {
        import s.implicits._
        TextPipeline.removeDuplicateSpans(
          Tables.documents(s, d), $"doc_id", $"text", k = 8, minDocs = 2)
          .select($"id".cast("bigint").as("doc_id"), $"clean_text",
            $"n_tokens", $"removed_tokens")
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
             |sp AS (SELECT doc_id, isl, min(pos) AS s, max(pos) + 7 AS e
             |  FROM isl2 GROUP BY 1, 2),
             |cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS p FROM sp),
             |tp AS (SELECT doc_id, generate_subscripts(ts, 1) - 1 AS p,
             |  unnest(ts) AS tok FROM base),
             |kept AS (SELECT tp.doc_id, tp.p, tp.tok
             |  FROM tp ANTI JOIN cov USING (doc_id, p)),
             |agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS ct,
             |  count(*) AS nk FROM kept GROUP BY 1)
             |SELECT CAST(b.doc_id AS BIGINT) AS doc_id,
             |  COALESCE(a.ct, '') AS clean_text,
             |  CAST(n AS BIGINT) AS n_tokens,
             |  CAST(n - COALESCE(a.nk, 0) AS BIGINT) AS removed_tokens
             |FROM base b LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin),
      doc = "Exact-substring span REMOVAL (the ExactSubstr enforcement of " +
        "the t54 report): 8-token windows shared by >= 2 docs merge into " +
        "maximal spans, covered tokens are cut from every occurrence, and " +
        "documents are reassembled from surviving tokens in order. Only " +
        "window hashes cross the detection shuffle; the oracle re-derives " +
        "from raw gram text and rebuilds with an ordered string_agg."
    )
  )
}
