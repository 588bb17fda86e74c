package graft.relational

import graft.core.{Exact, GraftQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational batch: batch sessionization (gaps-and-islands),
  * analytic window functions, range frames, ordered-arg aggregates, string
  * aggregation, pivoting, date arithmetic, and array access — each with a
  * deterministic DuckDB oracle (see GraftQuery parity rules).
  */
object RelationalQueries2 {
  import Exact._

  val queries: Seq[GraftQuery] = Seq(
    // ---------------------------------------------------------------- q23
    GraftQuery(
      "q23_sessionize_batch",
      (s, d) => {
        import s.implicits._
        // gaps-and-islands sessionization on exact microsecond longs — the
        // batch twin of streaming session windows (StreamingOps.sessionCounts)
        // Tables.events absorbs the stored ts type (ns-long vs timestamp[us]
        // — it drifted once already); unix_micros on the normalized column
        // matches the oracle's epoch_ns(ts) // 1000 under the UTC session.
        val raw = Tables.events(s, d)
          .select($"user_id", $"event_id", unix_micros($"ts").as("us"), $"value")
        val byUser = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
        val flagged = raw.withColumn("new_session",
          when(lag($"us", 1).over(byUser).isNull, 1L)
            .when($"us" - lag($"us", 1).over(byUser) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        flagged
          .withColumn("session_id", sum($"new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"), sumDec($"value").as("sum_value"),
            min($"us").as("session_start_us"), max($"us").as("session_end_us"))
          .orderBy($"user_id", $"session_id")
      },
      Some(s"""SELECT user_id, session_id, COUNT(*) AS n_events,
              |  ${sqlSumDec("value")} AS sum_value,
              |  MIN(us) AS session_start_us, MAX(us) AS session_end_us
              |FROM (
              |  SELECT user_id, value, us,
              |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              |  FROM (
              |    SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS us,
              |      CASE WHEN lag(epoch_ns(ts) // 1000) OVER
              |             (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) IS NULL THEN 1
              |           WHEN epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000) OVER
              |             (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
              |             > 1800 * 1000000 THEN 1
              |           ELSE 0 END AS new_session
              |    FROM events))
              |GROUP BY user_id, session_id
              |ORDER BY user_id, session_id""".stripMargin),
      doc = "Batch sessionization via lag + running-sum session ids (30 min gap)."
    ),
    // ---------------------------------------------------------------- q24
    GraftQuery(
      "q24_window_analytics",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        Tables.orders(s, d)
          .filter($"o_custkey" % 20 === 0)
          .select(
            $"o_custkey", $"o_orderkey",
            lag($"o_totalprice", 1).over(w).as("prev_price"),
            lead($"o_totalprice", 1).over(w).as("next_price"),
            dense_rank().over(w).cast("long").as("drank"),
            percent_rank().over(w).as("prank"),
            cume_dist().over(w).as("cdist"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  lead(o_totalprice, 1) OVER w AS next_price,
             |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
             |  percent_rank() OVER w AS prank,
             |  cume_dist() OVER w AS cdist,
             |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
             |FROM orders WHERE o_custkey % 20 = 0
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "Analytic window functions: lag/lead/dense_rank/percent_rank/cume_dist/ntile."
    ),
    // ---------------------------------------------------------------- q25
    GraftQuery(
      "q25_range_frame",
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey")
          .orderBy(unix_timestamp($"o_orderdate".cast("timestamp")))
          .rangeBetween(-30L * 86400, 0)
        Tables.orders(s, d)
          .filter($"o_custkey" % 25 === 0)
          .select($"o_custkey", $"o_orderkey",
            sum(dec($"o_totalprice")).over(w).cast("double").as("spend_30d"),
            count(lit(1)).over(w).as("n_orders_30d"))
          .orderBy($"o_custkey", $"o_orderkey")
      },
      Some(s"""SELECT o_custkey, o_orderkey,
              |  CAST(SUM(${sqlDec("o_totalprice")}) OVER w AS DOUBLE) AS spend_30d,
              |  COUNT(*) OVER w AS n_orders_30d
              |FROM orders WHERE o_custkey % 25 = 0
              |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
              |             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
              |ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "Value-range window frame (trailing 30 days) over epoch seconds."
    ),
    // ---------------------------------------------------------------- q26
    GraftQuery(
      "q26_minmax_by",
      (s, d) => {
        import s.implicits._
        // tie-free ordering key: price dominates, unique orderkey disambiguates
        val key = $"o_totalprice" * 1000000.0 + $"o_orderkey"
        Tables.orders(s, d)
          .groupBy($"o_orderpriority")
          .agg(
            max_by($"o_orderkey", key).as("top_order"),
            min_by($"o_orderkey", key).as("bottom_order"),
            max($"o_totalprice").as("max_price"),
            min($"o_totalprice").as("min_price"))
          .orderBy($"o_orderpriority")
      },
      Some("""SELECT o_orderpriority,
             |  max_by(o_orderkey, o_totalprice * 1000000.0 + o_orderkey) AS top_order,
             |  min_by(o_orderkey, o_totalprice * 1000000.0 + o_orderkey) AS bottom_order,
             |  MAX(o_totalprice) AS max_price, MIN(o_totalprice) AS min_price
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      doc = "Ordered-argument aggregates (max_by/min_by) with a tie-free key."
    ),
    // ---------------------------------------------------------------- q27
    GraftQuery(
      "q27_listagg",
      (s, d) => {
        import s.implicits._
        Tables.nation(s, d)
          .groupBy($"n_regionkey")
          .agg(
            concat_ws(",", array_sort(collect_list($"n_name"))).as("nations"),
            count(lit(1)).as("n"))
          .orderBy($"n_regionkey")
      },
      Some("""SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations,
             |  COUNT(*) AS n
             |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin),
      doc = "Ordered string aggregation (sorted collect_list ≡ string_agg ORDER BY)."
    ),
    // ---------------------------------------------------------------- q28
    GraftQuery(
      "q28_pivot",
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .groupBy($"l_linestatus")
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sumDec($"l_quantity"))
          .orderBy($"l_linestatus")
      },
      Some(s"""SELECT l_linestatus,
              |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS A,
              |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS N,
              |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS R
              |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin),
      doc = "Pivot (wide conditional aggregation) with a fixed value list."
    ),
    // ---------------------------------------------------------------- q29
    GraftQuery(
      "q29_date_arith",
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderkey" % 100 === 0)
          .select(
            $"o_orderkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("d"),
            date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("d_plus30"),
            date_format(last_day($"o_orderdate".cast("date")), "yyyy-MM-dd").as("month_end"),
            datediff(lit("1998-12-31").cast("date"), $"o_orderdate".cast("date"))
              .cast("long").as("days_to_eoy"),
            dayofweek($"o_orderdate".cast("date")).cast("long").as("dow"),
            quarter($"o_orderdate".cast("date")).cast("long").as("qtr"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS d,
             |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS d_plus30,
             |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS BIGINT) AS days_to_eoy,
             |  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
             |  CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr
             |FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey""".stripMargin),
      doc = "Date arithmetic: add/diff/last_day/dow/quarter (Spark dow is 1=Sunday; DuckDB 0=Sunday)."
    ),
    // ---------------------------------------------------------------- q30
    GraftQuery(
      "q30_array_access",
      (s, d) => {
        import s.implicits._
        Tables.embeddings(s, d)
          .select(
            $"vec_id",
            element_at($"embedding", 1).cast("double").as("first_dim"),
            element_at($"embedding", -1).cast("double").as("last_dim"),
            size($"embedding").cast("long").as("dim"),
            array_max($"embedding").cast("double").as("max_dim"),
            array_min($"embedding").cast("double").as("min_dim"),
            element_at(array_sort($"embedding"), 32).cast("double").as("median_lo"))
          .orderBy($"vec_id")
      },
      Some("""SELECT vec_id,
             |  CAST(embedding[1] AS DOUBLE) AS first_dim,
             |  CAST(embedding[-1] AS DOUBLE) AS last_dim,
             |  CAST(len(embedding) AS BIGINT) AS dim,
             |  CAST(list_max(embedding) AS DOUBLE) AS max_dim,
             |  CAST(list_min(embedding) AS DOUBLE) AS min_dim,
             |  CAST(list_sort(embedding)[32] AS DOUBLE) AS median_lo
             |FROM embeddings ORDER BY vec_id""".stripMargin),
      doc = "Array element access, sort, and extrema over the embedding column."
    )
  )
}
