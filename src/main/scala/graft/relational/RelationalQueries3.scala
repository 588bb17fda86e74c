package graft.relational

import graft.core.{Exact, GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third relational batch: exact quantiles via windows, explode/unnest,
  * null-handling scalars, regexp_extract_all, and batch sliding windows
  * (the oracle-checkable twin of the streaming sliding aggregation).
  */
object RelationalQueries3 {
  import Exact._

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- q31
    GraftQuery(
      "q31_median",
      (s, d) => {
        import s.implicits._
        // exact lower/upper median by explicit ranking — identical
        // construction on both engines, so no interpolation semantics to match
        val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
        Tables.customer(s, d)
          .select($"c_mktsegment", $"c_acctbal", $"c_custkey")
          .withColumn("rn", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy($"c_mktsegment")))
          .groupBy($"c_mktsegment")
          .agg(
            max(when($"rn" === (($"n" + 1) / 2).cast("long"), $"c_acctbal")).as("median_lo"),
            max(when($"rn" === (($"n" + 2) / 2).cast("long"), $"c_acctbal")).as("median_hi"),
            count(lit(1)).as("n_rows"))
          .orderBy($"c_mktsegment")
      },
      Some("""SELECT c_mktsegment,
             |  MAX(CASE WHEN rn = (n + 1) // 2 THEN c_acctbal END) AS median_lo,
             |  MAX(CASE WHEN rn = (n + 2) // 2 THEN c_acctbal END) AS median_hi,
             |  COUNT(*) AS n_rows
             |FROM (
             |  SELECT c_mktsegment, c_acctbal,
             |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS rn,
             |    COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
             |  FROM customer)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      doc = "Exact medians via ranking windows (no engine-specific interpolation)."
    ),
    // ---------------------------------------------------------------- q32
    GraftQuery(
      "q32_explode_words",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select(explode(split($"p_type", " ")).as("word"))
          .groupBy($"word")
          .agg(count(lit(1)).as("n"))
          .orderBy($"word")
      },
      Some("""SELECT word, COUNT(*) AS n FROM (
             |  SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
             |GROUP BY word ORDER BY word""".stripMargin),
      doc = "Row-generating explode (UDTF-shaped) over split tokens."
    ),
    // ---------------------------------------------------------------- q33
    GraftQuery(
      "q33_null_scalars",
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .filter($"c_custkey" % 10 === 0)
          .select(
            $"c_custkey",
            coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
            least($"c_acctbal", lit(1000.0)).as("capped_lo"),
            greatest($"c_acctbal", lit(0.0)).as("capped_hi"),
            when($"c_acctbal" < 0, "overdrawn").otherwise("ok").as("status"))
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey,
             |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
             |  LEAST(c_acctbal, 1000.0) AS capped_lo,
             |  GREATEST(c_acctbal, 0.0) AS capped_hi,
             |  CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS status
             |FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey""".stripMargin),
      doc = "Null-handling scalars: nullif/coalesce/least/greatest/case."
    ),
    // ---------------------------------------------------------------- q34
    GraftQuery(
      "q34_regexp_extract_all",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select(
            $"p_partkey",
            concat_ws(",", regexp_extract_all($"p_name", lit("[a-z]{5,}"), lit(0)))
              .as("long_words"),
            size(regexp_extract_all($"p_name", lit("[a-z]{5,}"), lit(0)))
              .cast("long").as("n_long"))
          .orderBy($"p_partkey")
      },
      Some("""SELECT p_partkey,
             |  COALESCE(array_to_string(regexp_extract_all(p_name, '[a-z]{5,}', 0), ','), '') AS long_words,
             |  CAST(len(regexp_extract_all(p_name, '[a-z]{5,}', 0)) AS BIGINT) AS n_long
             |FROM part ORDER BY p_partkey""".stripMargin),
      doc = "regexp_extract_all surfaced as a joined string (array-compare-safe)."
    ),
    // ---------------------------------------------------------------- q35
    GraftQuery(
      "q35_sliding_window_batch",
      (s, d) => {
        import s.implicits._
        // batch evaluation of the streaming sliding window (1h length, 30m
        // slide): every event lands in exactly two windows
        Tables.events(s, d)
          .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
          .agg(count(lit(1)).as("n"), sumDec($"value").as("sum_value"))
          .select(
            date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
            $"event_type", $"n", $"sum_value")
          .orderBy($"window_start", $"event_type")
      },
      Some(s"""SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
              |  event_type, COUNT(*) AS n, ${sqlSumDec("value")} AS sum_value
              |FROM (
              |  SELECT unnest([
              |      (epoch_ns(ts) // 1000 // 1800000000) * 1800000000,
              |      (epoch_ns(ts) // 1000 // 1800000000) * 1800000000 - 1800000000
              |    ]) AS ws, event_type, value
              |  FROM events)
              |GROUP BY ws, event_type ORDER BY window_start, event_type""".stripMargin),
      doc = "Sliding event-time windows evaluated in batch; oracle assigns each event to its two windows explicitly."
    ),
    // ---------------------------------------------------------------- q37
    GraftQuery(
      "q37_array_hof",
      (s, d) => {
        import s.implicits._
        // higher-order array functions: filter / exists / forall / transform
        Tables.embeddings(s, d)
          .select(
            $"vec_id",
            size(filter($"embedding", x => x > 0f)).cast("long").as("n_pos"),
            exists($"embedding", x => x > 0.3f).as("has_large"),
            forall($"embedding", x => abs(x) < 1.0f).as("all_bounded"),
            aggregate(
              filter($"embedding", x => x > 0f),
              lit(0.0), (acc, x) => acc + x.cast("double")).as("sum_pos"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
             |  len(list_filter(embedding, x -> x > 0.3)) > 0 AS has_large,
             |  len(list_filter(embedding, x -> NOT (abs(x) < 1.0))) = 0 AS all_bounded,
             |  COALESCE(list_sum(list_transform(list_filter(embedding, x -> x > 0),
             |    x -> CAST(x AS DOUBLE))), 0.0) AS sum_pos
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      doc = "Higher-order array functions (filter/exists/forall/aggregate) over embeddings."
    ),
    // ---------------------------------------------------------------- q38
    GraftQuery(
      "q38_unpivot",
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .select($"p_partkey", $"p_size".cast("double").as("size"),
            $"p_retailprice".as("retailprice"))
          .unpivot(
            Array($"p_partkey"),
            Array($"size", $"retailprice"),
            "metric", "value")
          .orderBy($"p_partkey", $"metric")
      },
      Some("""SELECT p_partkey, metric, value FROM (
             |  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size, p_retailprice AS retailprice
             |  FROM part)
             |UNPIVOT (value FOR metric IN (size, retailprice))
             |ORDER BY p_partkey, metric""".stripMargin),
      doc = "UNPIVOT / melt to long form (the inverse of q28's pivot)."
    ),
    // ---------------------------------------------------------------- q36
    GraftQuery(
      "q36_approx_quantile",
      (s, d) => {
        import s.implicits._
        // Greenwald-Khanna sketch values are implementation-defined, so the
        // oracle-comparable surface is the RANK bound, not the value: each
        // approx percentile must lie between the exact percentiles at rank
        // +/-1% (accuracy=1000 guarantees rank error <= 0.1%; 10x slack —
        // t34 gates the same sketch in violations+sentinel form). Exact
        // medians are value-checked by q31.
        // widen the single-row-group scan: the exact-percentile buffers and
        // the GK sketches otherwise build on one task. The emitted columns
        // are rank-bound BOOLEANS with 10x slack, so GK merge order cannot
        // flip them (exact percentiles are order-independent by definition).
        graft.core.Fanout.spread(Tables.orders(s, d)
            .select($"o_orderpriority", $"o_totalprice"))
          .groupBy($"o_orderpriority")
          .agg(
            percentile_approx($"o_totalprice", lit(0.5), lit(1000)).as("p50"),
            percentile_approx($"o_totalprice", lit(0.95), lit(1000)).as("p95"),
            expr("percentile(o_totalprice, 0.49)").as("lo50"),
            expr("percentile(o_totalprice, 0.51)").as("hi50"),
            expr("percentile(o_totalprice, 0.94)").as("lo95"),
            expr("percentile(o_totalprice, 0.96)").as("hi95"))
          .select($"o_orderpriority",
            ($"p50" >= $"lo50" && $"p50" <= $"hi50").as("p50_ok"),
            ($"p95" >= $"lo95" && $"p95" <= $"hi95").as("p95_ok"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority, true AS p50_ok, true AS p95_ok
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "Approximate quantile sketch (GK), the 100 TB-scale percentile " +
        "path, oracle-gated on its rank-error bound vs exact percentiles " +
        "(the values themselves are sketch-defined).",
      gate = true
    )
  )
}
