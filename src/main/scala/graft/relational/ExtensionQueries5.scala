package graft.relational

import graft.core.{GraftQuery, Tables}
import graft.operators.QualityRules
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
    }
  )
}
