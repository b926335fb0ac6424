package graft.queries

import graft.{QDef, Tables}
import graft.QDef._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5 — window functions (W1-W6), Hive 1.1 windowing surface by
  * delegation. Every window orders by a unique (o_orderdate, o_orderkey) pair
  * so ranks and frames are total-order deterministic in both engines.
  */
object WindowQueries {

  private val byDate = Window.partitionBy("o_custkey")
    .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)

  val defs: Seq[QDef] = Seq(

    QDef("w1_row_number_rank",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(byDate))
        .withColumn("rk_status", rank().over(
          Window.partitionBy("o_custkey").orderBy(col("o_orderstatus").asc)))
        .withColumn("drk_status", dense_rank().over(
          Window.partitionBy("o_custkey").orderBy(col("o_orderstatus").asc)))
        .select("o_custkey", "o_orderkey", "rn", "rk_status", "drk_status")
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey,
             |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
             |  rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rk_status,
             |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drk_status
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    QDef("w2_lag_lead",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("prev_price", coalesce(d182(lag(col("o_totalprice"), 1).over(byDate)), lit(-1).cast("decimal(18,2)")))
        .withColumn("next_price", coalesce(d182(lead(col("o_totalprice"), 1).over(byDate)), lit(-1).cast("decimal(18,2)")))
        .select("o_custkey", "o_orderkey", "prev_price", "next_price")
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey,
             |  coalesce(CAST(lag(o_totalprice, 1) OVER w AS DECIMAL(18,2)), -1) AS prev_price,
             |  coalesce(CAST(lead(o_totalprice, 1) OVER w AS DECIMAL(18,2)), -1) AS next_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Running aggregate with an explicit ROWS frame. Summand is DECIMAL so
    // the prefix sums are exact regardless of evaluation order.
    QDef("w3_running_sum",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("running_spend",
          sum(d182(col("o_totalprice")))
            .over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("decimal(38,4)"))
        .select("o_custkey", "o_orderkey", "running_spend")
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,4)) AS running_spend
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // RANGE frame over a numeric ordering key.
    QDef("w4_range_frame",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("n_near", count(lit(1)).over(
          Window.partitionBy("o_orderstatus").orderBy(col("o_orderkey").asc)
            .rangeBetween(-100, 0)))
        .select("o_orderkey", "o_orderstatus", "n_near")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_orderstatus,
             |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey
             |                 RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_near
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QDef("w5_ntile_percentiles",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("quartile", ntile(4).over(byDate))
        .withColumn("pct_rank", dec4(percent_rank().over(byDate)))
        .withColumn("cume", dec4(cume_dist().over(byDate)))
        .select("o_custkey", "o_orderkey", "quartile", "pct_rank", "cume")
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey,
             |  ntile(4) OVER w AS quartile,
             |  CAST(percent_rank() OVER w AS DECIMAL(38,4)) AS pct_rank,
             |  CAST(cume_dist() OVER w AS DECIMAL(38,4)) AS cume
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Session windows (gap-based) in batch: Spark's session_window vs the
    // classic gaps-and-islands SQL formulation. End = last event + gap.
    QDef("w7_session_window",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          expr("unix_millis(session_window.start)").as("start_ms"),
          expr("unix_millis(session_window.end)").as("end_ms"),
          col("n"))
        .orderBy("user_id", "start_ms"),
      Some("""WITH marked AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >= 1800000
             |         THEN 1 ELSE 0 END AS new_sess
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |sess AS (
             |  SELECT user_id, ts,
             |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
             |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |  FROM marked)
             |SELECT user_id, epoch_ms(min(ts)) AS start_ms,
             |  epoch_ms(max(ts)) + 1800000 AS end_ms, count(*) AS n
             |FROM sess GROUP BY user_id, sid
             |ORDER BY user_id, start_ms""".stripMargin)),

    // Sequence-pattern matching (MATCH_RECOGNIZE-lite): each user's event
    // history collapses to an ordered initial-letter string, and a regex
    // recognizes the view→…→click→…→purchase pattern over it. One
    // hash-partitioned aggregation — the per-user event list is the only
    // grouped state (bounded by events-per-user, the same bound every
    // sessionizer carries), and the regex runs post-agg on one short
    // string per user. Tie-broken by event_id so both engines agree on
    // same-timestamp ordering.
    QDef("w8_seq_pattern",
      (s, dir) => Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(
              col("ts"), col("event_id"),
              substring(col("event_type"), 1, 1).as("c")))),
            x => x.getField("c")), "").as("seq"))
        .select(col("user_id"), col("seq"),
          col("seq").rlike("v.*c.*p").as("reached"))
        .orderBy("user_id"),
      Some("""WITH s AS (
             |  SELECT user_id,
             |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
             |  FROM events GROUP BY 1)
             |SELECT user_id, seq, regexp_matches(seq, 'v.*c.*p') AS reached
             |FROM s ORDER BY 1""".stripMargin)),

    // Top-N per group: classic rank-and-filter.
    QDef("w6_topn_per_group",
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), d182(col("o_totalprice")).as("price"))
        .orderBy("o_custkey", "rn"),
      Some("""SELECT o_custkey, rn, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
             |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) t
             |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // Time-series resample + gap-fill: hourly bins over a FIXED grid (720
    // hours of the fixture month), empty hours surfaced as zeros — the
    // downsample shape every metrics/time-series pipeline needs. One
    // aggregation shuffle; the generated grid is tiny and broadcasts, so
    // gap-filling adds no data-sized work at any scale. Timestamps cross
    // the engine boundary as epoch-millis (determinism contract).
    QDef("w9_resample_gapfill",
      (s, dir) => {
        val agg = Tables.load(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"),
            sum(d182(col("value"))).cast("decimal(38,4)").as("sum_v"))
        val grid = s.sql(
          """SELECT explode(sequence(timestamp'2024-01-01 00:00:00',
            |  timestamp'2024-01-30 23:00:00', interval 1 hour)) AS h""".stripMargin)
        grid.join(agg, Seq("h"), "left")
          .select(unix_millis(col("h")).as("h_ms"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("sum_v"), lit(0).cast("decimal(38,4)")).as("sum_v"))
          .orderBy("h_ms")
      },
      Some("""WITH grid AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
             |    TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR)) AS h),
             |agg AS (
             |  SELECT date_trunc('hour', ts) AS h, count(*) AS n,
             |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sum_v
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT CAST(epoch_ms(g.h) AS BIGINT) AS h_ms,
             |       COALESCE(a.n, 0) AS n,
             |       COALESCE(a.sum_v, CAST(0 AS DECIMAL(38,4))) AS sum_v
             |FROM grid g LEFT JOIN agg a ON a.h = g.h
             |ORDER BY h_ms""".stripMargin)),

    // Cohort retention: users grouped by first-activity week, activity
    // counted per week offset — the classic retention triangle. Two
    // aggregations + one join, all hash-partitioned on user_id until the
    // final (tiny) cohort matrix; ISO Monday week truncation agrees
    // between Spark and DuckDB.
    QDef("w10_cohort_retention",
      (s, dir) => {
        val wk = Tables.load(s, dir, "events")
          .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
          .distinct()
        val first = wk.groupBy("user_id").agg(min(col("wk")).as("cohort"))
        wk.join(first, Seq("user_id"))
          .select(col("cohort").cast("date").as("cohort_week"),
            expr("datediff(cast(wk as date), cast(cohort as date)) div 7").as("week_n"))
          .groupBy("cohort_week", "week_n")
          .agg(count(lit(1)).as("active_users"))
          .orderBy("cohort_week", "week_n")
      },
      Some("""WITH wk AS (
             |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
             |first AS (SELECT user_id, min(wk) AS cohort FROM wk GROUP BY 1)
             |SELECT CAST(f.cohort AS DATE) AS cohort_week,
             |       (CAST(w.wk AS DATE) - CAST(f.cohort AS DATE)) // 7 AS week_n,
             |       count(*) AS active_users
             |FROM wk w JOIN first f ON w.user_id = f.user_id
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),
  )
}
