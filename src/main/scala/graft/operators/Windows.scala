package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.engine.{GQuery, Tables}
import graft.engine.GQuery._

/** Window functions (SURVEY.md §2.B.5) + the windowed batch twins of the
  * streaming operators (B.10) and the relational gapply instance (B.9).
  * One shuffle per distinct partitioning; every orderBy carries a unique
  * tiebreak (§5.2 rule 1). Window sums accumulate in decimal: DuckDB
  * evaluates windowed aggs over a segment tree, so double addition order
  * differs from Spark's running accumulation — decimal is exact in both.
  */
object Windows {

  /** Ranking family: row_number / rank / dense_rank / ntile. */
  val qWinRank: GQuery = GQuery(
    "q_win_rank",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(spark, dir)
        .select(
          $"c_mktsegment", $"c_custkey",
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          // exact rationals (rank-1)/(n-1): identical doubles both engines
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy($"c_mktsegment", $"rn")
    },
    Some("""
      SELECT c_mktsegment, c_custkey,
        cast(row_number() OVER w as int) AS rn,
        cast(rank() OVER w as int) AS rnk,
        cast(dense_rank() OVER w as int) AS drnk,
        cast(ntile(4) OVER w as int) AS quartile,
        percent_rank() OVER w AS pct_rank,
        cume_dist() OVER w AS cume
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_mktsegment, rn"""),
  )

  /** Analytic family: lag / lead / first_value over per-customer order
    * history. */
  val qWinAnalytic: GQuery = GQuery(
    "q_win_analytic",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables.orders(spark, dir)
        .select(
          $"o_custkey", $"o_orderkey",
          round(lag($"o_totalprice", 1).over(w), 2).as("prev_price"),
          round(lead($"o_totalprice", 1).over(w), 2).as("next_price"),
          round(first($"o_totalprice").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
            .as("first_price"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        round(lag(o_totalprice, 1) OVER w, 2) AS prev_price,
        round(lead(o_totalprice, 1) OVER w, 2) AS next_price,
        round(first_value(o_totalprice) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS first_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, o_orderkey"""),
  )

  /** Frames: running revenue (expanding frame) + 3-row moving average,
    * decimal-accumulated for cross-engine determinism. */
  val qWinFrame: GQuery = GQuery(
    "q_win_frame",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val dec = $"o_totalprice".cast(DecimalType(30, 6))
      Tables.orders(spark, dir)
        .select(
          $"o_custkey", $"o_orderkey",
          r2(sum(dec).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")).as("running_total"),
          r6(sum(dec).over(w.rowsBetween(-2, Window.currentRow))
              .cast("double") /
            count(lit(1)).over(w.rowsBetween(-2, Window.currentRow)))
            .as("moving_avg3"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey,
        floor(cast(sum(cast(o_totalprice as decimal(30,6))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double)
          * 1e2 + 0.5) / 1e2 AS running_total,
        floor((cast(sum(cast(o_totalprice as decimal(30,6))) OVER w3 as double)
          / count(*) OVER w3) * 1e6 + 0.5) / 1e6 AS moving_avg3
      FROM orders
      WINDOW w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY o_custkey, o_orderkey"""),
  )

  /** Top-k per group via the row_number ≤ k pattern — the scalable top-k
    * (partial top-k per partition, no global sort of the fact table). */
  val qTopkGroup: GQuery = GQuery(
    "q_topk_group",
    (spark, dir) => {
      import spark.implicits._
      val joined = Tables.orders(spark, dir)
        .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      joined
        .select($"c_mktsegment", $"o_orderkey",
          round($"o_totalprice", 2).as("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .orderBy($"c_mktsegment", $"rn")
    },
    Some("""
      SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
          cast(row_number() OVER (PARTITION BY c_mktsegment
                             ORDER BY o_totalprice DESC, o_orderkey) as int) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey) t
      WHERE rn <= 3
      ORDER BY c_mktsegment, rn"""),
  )

  /** Batch twin of the streaming tumbling-window aggregation (B.10):
    * hourly event counts per type. */
  val qWinTumble: GQuery = GQuery(
    "q_win_tumble",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .orderBy($"hour", $"event_type")
    },
    Some(s"""
      SELECT date_trunc('hour', ts) AS hour, event_type,
             count(*) AS n_events, ${dsumSql("value")} AS sum_value
      FROM events
      GROUP BY date_trunc('hour', ts), event_type
      ORDER BY hour, event_type"""),
  )

  /** Batch twin of session windows: gaps-and-islands sessionization
    * (lag → gap flag → cumulative session id → per-session agg).
    * 30-minute inactivity gap.
    *
    * The maker takes an `expand` replica count (the xdocs
    * explode-of-sequence idiom) for the ×10 events scaling twin (r14
    * verdict item 6: the windows/sessionization family had no scale
    * point): each replica shifts user_id by k·10,000,000, so replicas
    * are disjoint window partitions and the lag + cumulative-sum +
    * per-session aggregate chain moves 10× the rows through the ONE
    * user-keyed shuffle the plan has. */
  private def mkSessionize(name: String, expand: Int): GQuery = GQuery(
    name,
    (spark, dir) => {
      import spark.implicits._
      val ev0 = Tables.events(spark, dir)
        .select($"user_id", $"event_id", $"ts")
      val ev =
        if (expand <= 1) ev0
        else ev0.select($"user_id", $"event_id", $"ts",
            explode(expr(s"sequence(0, ${expand - 1})")).as("k"))
          .select(($"user_id" + $"k".cast("long") * lit(10000000L))
            .as("user_id"), $"event_id", $"ts")
      val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev
        .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
        .withColumn("new_session",
          when($"prev_ts".isNull ||
            unix_timestamp($"ts") - unix_timestamp($"prev_ts") > 1800, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum($"new_session").over(
            wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min($"ts").as("session_start"),
          max($"ts").as("session_end"))
        .orderBy($"user_id", $"session_id")
    },
    Some(s"""
      WITH ev AS (${
        if (expand <= 1) "SELECT user_id, event_id, ts FROM events"
        else
          s"""SELECT user_id + k * 10000000 AS user_id, event_id, ts
        FROM events, unnest(generate_series(0, ${expand - 1})) AS xk(k)"""
      })
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
      FROM (
        SELECT user_id, event_id, ts,
          cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
            AS session_id
        FROM (
          SELECT user_id, event_id, ts,
            CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1
                 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, event_id, date_trunc('second', ts) AS ts,
              lag(date_trunc('second', ts), 1) OVER (
                PARTITION BY user_id
                ORDER BY date_trunc('second', ts), event_id) AS prev_ts
            FROM ev) a) b) c
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id"""),
  )

  val qSessionize: GQuery = mkSessionize("q_sessionize", 1)

  /** ×10 scaling twin: 10 disjoint user-shifted replicas of the events
    * table, so the sessionization window chain and per-session rollup
    * process 10× the rows — the events-family scale point (r14 verdict
    * item 6). */
  val qSessionizeXxl: GQuery = mkSessionize("q_sessionize_xxl", 10)

  /** Relational instance of gapply (B.9): per-user demeaning as a window
    * expression — the SQL-expressible twin of groupByKey.flatMapGroups. */
  val qGapplyAgg: GQuery = GQuery(
    "q_gapply_agg",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id")
      val dec = $"value".cast(DecimalType(30, 6))
      Tables.events(spark, dir)
        .select($"event_id", $"user_id",
          r6($"value" -
            sum(dec).over(w).cast("double") / count(lit(1)).over(w))
            .as("demeaned"))
        .orderBy($"event_id")
    },
    Some("""
      SELECT event_id, user_id,
        floor((value - cast(sum(cast(value as decimal(30,6))) OVER w as double)
          / count(*) OVER w) * 1e6 + 0.5) / 1e6 AS demeaned
      FROM events
      WINDOW w AS (PARTITION BY user_id)
      ORDER BY event_id"""),
  )

  /** RANGE frame on a numeric day axis: 7-day trailing order count per
    * customer — a value-based frame (all rows within 7 days), unlike the
    * row-count frames in q_win_frame. */
  val qWinRange: GQuery = GQuery(
    "q_win_range",
    (spark, dir) => {
      import spark.implicits._
      val withDays = Tables.orders(spark, dir)
        .withColumn("day",
          datediff(to_date($"o_orderdate"), lit("1995-01-01").cast("date")))
      val w = Window.partitionBy($"o_custkey").orderBy($"day")
        .rangeBetween(-7, Window.currentRow)
      withDays
        .select($"o_custkey", $"o_orderkey", $"day",
          count(lit(1)).over(w).as("orders_7d"),
          sum($"o_totalprice".cast(DecimalType(30, 6))).over(w)
            .cast("double").as("spend_7d_raw"))
        .select($"o_custkey", $"o_orderkey", $"day", $"orders_7d",
          r2($"spend_7d_raw").as("spend_7d"))
        .orderBy($"o_custkey", $"o_orderkey")
    },
    Some("""
      SELECT o_custkey, o_orderkey, day, orders_7d,
             floor(spend_7d_raw * 1e2 + 0.5) / 1e2 AS spend_7d
      FROM (
        SELECT o_custkey, o_orderkey, day,
          count(*) OVER w AS orders_7d,
          cast(sum(cast(o_totalprice as decimal(30,6))) OVER w as double)
            AS spend_7d_raw
        FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            cast(datediff('day', DATE '1995-01-01', cast(o_orderdate as date))
              as int) AS day
          FROM orders) d
        WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                     RANGE BETWEEN 7 PRECEDING AND CURRENT ROW)) t
      ORDER BY o_custkey, o_orderkey"""),
  )

  /** Keep-latest dedup (CDC compaction): one row per (user_id, event_type),
    * the one with the greatest timestamp. The row_number ≤ 1 pattern is the
    * scalable form — partial top-1 per partition before the shuffle, no
    * global sort. Ordering ties break on raw sub-second ticks then event_id,
    * so the survivor is deterministic on any cluster. */
  val qDedupLatest: GQuery = GQuery(
    "q_dedup_latest",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts_ticks".desc, $"event_id".desc)
      Tables.events(spark, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id", $"ts", $"value")
        .orderBy($"user_id", $"event_type")
    },
    Some("""
      SELECT user_id, event_type, event_id,
             date_trunc('second', ts) AS ts, value
      FROM (
        SELECT user_id, event_type, event_id, ts, value,
          row_number() OVER (PARTITION BY user_id, event_type
            ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
      WHERE rn = 1
      ORDER BY user_id, event_type"""),
  )

  /** Spark's native session_window operator in batch mode (the same
    * operator Structured Streaming uses for stateful sessionization): 30-min
    * gap sessions per user, one groupBy — Catalyst plans the session merge
    * without a window-function sort pass. Oracle derives the identical
    * sessions via gaps-and-islands; session_end = last event + gap. */
  val qWinSession: GQuery = GQuery(
    "q_win_session",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"session_window.start".as("session_start"),
          $"session_window.end".as("session_end"), $"n_events")
        .orderBy($"user_id", $"session_start")
    },
    Some("""
      SELECT user_id, min(ts) AS session_start,
             max(ts) + INTERVAL 30 MINUTE AS session_end,
             count(*) AS n_events
      FROM (
        SELECT user_id, ts,
          cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
            AS session_id
        FROM (
          SELECT user_id, event_id, ts,
            CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1
                 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, event_id, date_trunc('second', ts) AS ts,
              lag(date_trunc('second', ts), 1) OVER (
                PARTITION BY user_id
                ORDER BY date_trunc('second', ts), event_id) AS prev_ts
            FROM events) a) b) c
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start"""),
  )

  /** Sliding (hopping) windows — batch twin of the streaming hop: 10-minute
    * windows every 5 minutes, so each event lands in exactly two windows.
    * Spark's `window(ts, width, slide)` plans an Expand (2 rows/event) +
    * one hash-agg — no self-join, no shuffle amplification beyond the 2×
    * expand. The oracle reconstructs the same window starts arithmetically:
    * start ∈ {⌊e/300⌋·300, ⌊e/300⌋·300 − 300} for width 600 / slide 300. */
  val qWinSlide: GQuery = GQuery(
    "q_win_slide",
    (spark, dir) => {
      import spark.implicits._
      Tables.events(spark, dir)
        .groupBy(window($"ts", "10 minutes", "5 minutes"), $"event_type")
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("sum_value"))
        .select($"window.start".as("win_start"), $"event_type",
          $"n_events", $"sum_value")
        .orderBy($"win_start", $"event_type")
    },
    Some(s"""
      SELECT make_timestamp(
               ((cast(epoch(date_trunc('second', ts)) as bigint) // 300) * 300
                 - k.k * 300) * 1000000) AS win_start,
             event_type, count(*) AS n_events,
             ${dsumSql("value")} AS sum_value
      FROM events, unnest([0, 1]) AS k(k)
      GROUP BY win_start, event_type
      ORDER BY win_start, event_type"""),
  )

  /** Gap-filling a daily time series (the feature-store resample op): a
    * generated day spine × observed event types, left-joined to the daily
    * aggregate, zeros for missing days. The spine is tiny (days × types),
    * so Spark broadcasts it; the only shuffle is the daily aggregation of
    * the fact table — at 100 TB the spine join stays broadcast. */
  val qGapfill: GQuery = GQuery(
    "q_gapfill",
    (spark, dir) => {
      import spark.implicits._
      val e = Tables.events(spark, dir)
        .select(to_date($"ts").as("day"), $"event_type", $"value")
      val spine = e.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(explode(sequence($"d0", $"d1")).as("day"))
      val types = e.select($"event_type").distinct()
      val daily = e.groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n_raw"), dsum($"value").as("sum_raw"))
      spine.crossJoin(broadcast(types))
        .join(daily, Seq("day", "event_type"), "left")
        .select($"day", $"event_type",
          coalesce($"n_raw", lit(0L)).as("n_events"),
          coalesce($"sum_raw", lit(0.0)).as("sum_value"))
        .orderBy($"day", $"event_type")
    },
    Some(s"""
      WITH e AS (
        SELECT cast(date_trunc('second', ts) as date) AS day, event_type, value
        FROM events),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      spine AS (
        SELECT cast(unnest(generate_series(cast(d0 as timestamp),
          cast(d1 as timestamp), INTERVAL 1 DAY)) as date) AS day FROM b),
      types AS (SELECT DISTINCT event_type FROM e),
      daily AS (
        SELECT day, event_type, count(*) AS n_raw,
               ${dsumSql("value")} AS sum_raw
        FROM e GROUP BY day, event_type)
      SELECT s.day, t.event_type,
             coalesce(d.n_raw, 0) AS n_events,
             coalesce(d.sum_raw, 0.0) AS sum_value
      FROM spine s CROSS JOIN types t
      LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
      ORDER BY s.day, t.event_type"""),
  )

  /** Per-group standardization (z-score) — the feature-engineering
    * normalize step, windowed so every row keeps its identity. Mean and
    * std come from exact decimal window moments finished with fixed-order
    * IEEE arithmetic (same determinism posture as q_agg_stats: no float
    * accumulates in partition-merge order). */
  val qZscore: GQuery = GQuery(
    "q_zscore",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy($"user_id")
      val dec = $"value".cast(DecimalType(30, 6))
      Tables.events(spark, dir)
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(dec).over(w).cast("double"))
        .withColumn("sxx", sum(dec * dec).over(w).cast("double"))
        .filter($"n" >= 2)
        .select($"event_id", $"user_id",
          r6(($"value" - $"sx" / $"n") /
            sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1))).as("zscore"))
        .orderBy($"event_id")
    },
    Some(s"""
      SELECT event_id, user_id,
        ${rNSql("(value - sx / n) / sqrt((sxx - sx*sx/n) / (n-1))", 6)}
          AS zscore
      FROM (
        SELECT event_id, user_id, value,
          count(*) OVER w AS n,
          cast(sum(x) OVER w as double) AS sx,
          cast(sum(x*x) OVER w as double) AS sxx
        FROM (SELECT event_id, user_id, value,
                cast(value as decimal(30,6)) AS x FROM events) t
        WINDOW w AS (PARTITION BY user_id)) m
      WHERE n >= 2
      ORDER BY event_id"""),
  )

  /** Per-user EWMA (α = 0.3) over the last 10 events — the time-series
    * smoother behind anomaly baselines and trend features. A true
    * recursive EWMA is not cross-engine-expressible, so this is the
    * bounded-memory form: a 10-term convolution of lag() values. Every
    * coefficient is built by literal repeated multiplication (0.3·0.7·…)
    * and the terms are summed left-associatively, so both engines compute
    * bit-identical doubles — no rounding contract beyond the final 6dp.
    * One shuffle by user; the 10 lags share a single window frame. */
  val qEwma: GQuery = GQuery(
    "q_ewma",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_ticks", $"event_id")
      def coef(k: Int): org.apache.spark.sql.Column =
        (1 to k).foldLeft(lit(0.3): org.apache.spark.sql.Column)(
          (c, _) => c * lit(0.7))
      val terms = (0 until 10).map { k =>
        val v = if (k == 0) $"value" else lag($"value", k).over(w)
        coalesce(v, lit(0.0)) * coef(k)
      }
      Tables.events(spark, dir)
        .select($"event_id", $"user_id", $"ts_ticks", $"value")
        .select($"event_id", $"user_id",
          r6(terms.reduceLeft(_ + _)).as("ewma_value"))
        .orderBy($"event_id")
    },
    Some {
      // DuckDB parses bare 0.3 as DECIMAL and would fold the coefficient
      // product exactly — cast every factor to double so both engines run
      // the same IEEE multiplication chain
      def coefSql(k: Int): String =
        "cast(0.3 as double)" + (" * cast(0.7 as double)" * k)
      val terms = (0 until 10).map { k =>
        if (k == 0) s"coalesce(value, 0.0) * (${coefSql(0)})"
        else s"coalesce(lag(value, $k) OVER w, 0.0) * (${coefSql(k)})"
      }.mkString(" + ")
      s"""
      SELECT event_id, user_id, ${rNSql("e", 6)} AS ewma_value
      FROM (
        SELECT event_id, user_id, $terms AS e
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
      ORDER BY event_id"""
    },
  )

  /** Relative-standing analytics: percent_rank and cume_dist per market
    * segment (the remaining two ranking-family functions after
    * q_win_rank's row_number/rank/dense_rank/ntile). The window ORDER BY
    * carries the unique custkey tiebreak, so ranks are total and both
    * engines derive identical (rank-1)/(n-1) and k/n doubles; r6 keeps
    * the contract explicit. One shuffle by segment — NOTE the honest
    * scale caveat: segment cardinality is tiny (5), so per-row exact
    * percent_rank at 100 TB would funnel each segment through one task;
    * at that scale report relative standing via broadcast quantile
    * breakpoints (q_rfm's pattern) and reserve exact per-row ranks for
    * bounded slices like this one. */
  val qWinPctRank: GQuery = GQuery(
    "q_win_pctrank",
    (spark, dir) => {
      import spark.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables.customer(spark, dir)
        .filter($"c_custkey" <= 400)
        .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
          r6(percent_rank().over(w)).as("pct_rank"),
          r6(cume_dist().over(w)).as("cume"))
        .orderBy($"c_mktsegment", $"c_custkey")
    },
    Some(s"""
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ${r6Sql("percent_rank() OVER (PARTITION BY c_mktsegment " +
               "ORDER BY c_acctbal DESC, c_custkey)")} AS pct_rank,
             ${r6Sql("cume_dist() OVER (PARTITION BY c_mktsegment " +
               "ORDER BY c_acctbal DESC, c_custkey)")} AS cume
      FROM customer
      WHERE c_custkey <= 400
      ORDER BY c_mktsegment, c_custkey"""),
  )

  /** Forward-fill / LOCF resample — q_gapfill's other half: where
    * gap-fill zero-fills counts, a sensor/price series must carry the
    * LAST OBSERVED value across missing days (last-observation-carried-
    * forward). The spine join is the same broadcast day-spine; the fill
    * is one `last_value(... ignore nulls)` running frame per user — the
    * IGNORE NULLS semantics both engines share. Daily values are
    * decimal-summed BEFORE the fill so the carried value is already
    * rounding-stable; users bounded to keep the dump small, the plan
    * identical at any population (one shuffle by user). */
  val qLocf: GQuery = GQuery(
    "q_locf",
    (spark, dir) => {
      import spark.implicits._
      val e = Tables.events(spark, dir)
        .filter($"user_id" < 20)
        .select($"user_id", to_date($"ts").as("day"), $"value")
      val spine = e.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(explode(sequence($"d0", $"d1")).as("day"))
      val users = e.select($"user_id").distinct()
      val daily = e.groupBy($"user_id", $"day").agg(dsum($"value").as("day_value"))
      val w = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.crossJoin(broadcast(users))
        .join(daily, Seq("user_id", "day"), "left")
        .select($"user_id", $"day", $"day_value",
          last($"day_value", ignoreNulls = true).over(w).as("filled"))
        .orderBy($"user_id", $"day")
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, cast(date_trunc('second', ts) as date) AS day, value
        FROM events WHERE user_id < 20),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      spine AS (
        SELECT cast(unnest(generate_series(cast(d0 as timestamp),
          cast(d1 as timestamp), INTERVAL 1 DAY)) as date) AS day FROM b),
      users AS (SELECT DISTINCT user_id FROM e),
      daily AS (
        SELECT user_id, day, ${dsumSql("value")} AS day_value
        FROM e GROUP BY user_id, day)
      SELECT u.user_id, s.day, d.day_value,
             last_value(d.day_value IGNORE NULLS) OVER (
               PARTITION BY u.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM spine s CROSS JOIN users u
      LEFT JOIN daily d ON d.day = s.day AND d.user_id = u.user_id
      ORDER BY u.user_id, s.day"""),
  )

  /** Linear interpolation resample — the third fill strategy beside
    * q_gapfill (zero) and q_locf (carry-forward): a missing day takes the
    * value on the straight line between its nearest observed neighbors,
    * falling back to LOCF/NOCB at the series edges. Two IGNORE NULLS
    * frames per user (backward last, forward first) carry both the
    * neighbor values AND their days; the interpolation itself is pure
    * IEEE arithmetic on decimal-summed endpoints and integer day gaps,
    * IEEE-rounded — the cross-engine contract every computed double here
    * uses. Same single shuffle by user as q_locf. */
  val qFillLinear: GQuery = GQuery(
    "q_fill_linear",
    (spark, dir) => {
      import spark.implicits._
      val e = Tables.events(spark, dir)
        .filter($"user_id" < 20)
        .select($"user_id", to_date($"ts").as("day"), $"value")
      val spine = e.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(explode(sequence($"d0", $"d1")).as("day"))
      val users = e.select($"user_id").distinct()
      val daily = e.groupBy($"user_id", $"day").agg(dsum($"value").as("v"))
      val wb = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy($"user_id").orderBy($"day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val joined = spine.crossJoin(broadcast(users))
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("pv", last($"v", ignoreNulls = true).over(wb))
        .withColumn("pd", last(when($"v".isNotNull, $"day"), ignoreNulls = true).over(wb))
        .withColumn("nv", first($"v", ignoreNulls = true).over(wf))
        .withColumn("nd", first(when($"v".isNotNull, $"day"), ignoreNulls = true).over(wf))
      joined.select($"user_id", $"day", $"v".as("day_value"),
        r6(when($"v".isNotNull, $"v")
          .when($"pv".isNull, $"nv")
          .when($"nv".isNull, $"pv")
          .otherwise($"pv" + ($"nv" - $"pv") *
            (datediff($"day", $"pd").cast("double") /
              datediff($"nd", $"pd").cast("double"))))
          .as("filled"))
        .orderBy($"user_id", $"day")
    },
    Some(s"""
      WITH e AS (
        SELECT user_id, cast(date_trunc('second', ts) as date) AS day, value
        FROM events WHERE user_id < 20),
      b AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
      spine AS (
        SELECT cast(unnest(generate_series(cast(d0 as timestamp),
          cast(d1 as timestamp), INTERVAL 1 DAY)) as date) AS day FROM b),
      users AS (SELECT DISTINCT user_id FROM e),
      daily AS (
        SELECT user_id, day, ${dsumSql("value")} AS v
        FROM e GROUP BY user_id, day),
      j AS (
        SELECT u.user_id, s.day, d.v,
          last_value(d.v IGNORE NULLS) OVER (PARTITION BY u.user_id
            ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          last_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
            OVER (PARTITION BY u.user_id ORDER BY s.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
          first_value(d.v IGNORE NULLS) OVER (PARTITION BY u.user_id
            ORDER BY s.day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN d.v IS NOT NULL THEN s.day END IGNORE NULLS)
            OVER (PARTITION BY u.user_id ORDER BY s.day
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        FROM spine s CROSS JOIN users u
        LEFT JOIN daily d ON d.day = s.day AND d.user_id = u.user_id)
      SELECT user_id, day, v AS day_value,
        ${r6Sql(
          "CASE WHEN v IS NOT NULL THEN v " +
            "WHEN pv IS NULL THEN nv " +
            "WHEN nv IS NULL THEN pv " +
            "ELSE pv + (nv - pv) * (cast(date_diff('day', pd, day) as double) " +
            "/ cast(date_diff('day', pd, nd) as double)) END")} AS filled
      FROM j
      ORDER BY user_id, day"""),
  )

  /** Classical seasonal decomposition of the per-type daily event count:
    * additive trend + weekly seasonal + residual — the time-series op
    * behind capacity planning and seasonal-aware anomaly detection.
    * The series is SPINE-COMPLETED first (day × type grid, zero-filled,
    * like q_gapfill) so the ROWS-framed window equals calendar days even
    * when a sparse (type, day) slice is empty. Trend = centered 7-day
    * moving average (exact: integer frame sum, one double division),
    * defined only on full frames; seasonal = per-(type, weekday) mean of
    * the detrended series, decimal-staged (shuffle-order-free); residual
    * = n − trend − seasonal. Weekday is epoch-day mod 7 in BOTH engines
    * — Spark's dayofweek (1=Sunday) and DuckDB's (0=Sunday) disagree,
    * the epoch modulus doesn't. One partitioning by type serves the
    * window; the spine and seasonal tables are broadcast-sized at any
    * SF (days × types). */
  /** Shared decomposition frame for q_seasonal / q_anomaly: day×type
    * spine-completed daily counts with trend/seasonal/raw-residual
    * columns. `spike` injects a deterministic +400 on one mid-series
    * day — the planted anomaly that keeps q_anomaly non-vacuous (the
    * decomposition partially absorbs it into trend/seasonal, exactly
    * as a real spike would). */
  private def seasonalFrame(spark: org.apache.spark.sql.SparkSession,
      dir: String, spike: Boolean) = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(to_date($"ts").as("day"), $"event_type")
    val daily = ev.groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n"))
    val spine = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .crossJoin(ev.select($"event_type").distinct())
    val zeroFilled = spine.join(daily, Seq("day", "event_type"), "left_outer")
      .select($"day", $"event_type", coalesce($"n", lit(0L)).as("n"))
    val full =
      if (spike) zeroFilled.select($"day", $"event_type",
        ($"n" + when($"day" === to_date(lit("2024-01-15")), 400L)
          .otherwise(0L)).as("n"))
      else zeroFilled
    val fr = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-3, 3)
    val w = full
      .withColumn("trend",
        when(count(lit(1)).over(fr) === 7,
          sum($"n").over(fr).cast("double") / 7.0))
      .withColumn("dow",
        (datediff($"day", to_date(lit("1970-01-01"))) % 7).cast("int"))
    val seasonal = w.filter($"trend".isNotNull)
      .groupBy($"event_type", $"dow")
      .agg((sum(($"n" - $"trend").cast(DecimalType(30, 6))).cast("double")
        / count(lit(1))).as("seasonal"))
    w.join(seasonal, Seq("event_type", "dow"))
      .select($"day", $"event_type", $"n",
        $"trend", $"seasonal", ($"n" - $"trend" - $"seasonal").as("resid"))
  }

  /** SQL twin of [[seasonalFrame]]: the shared CTE block ending in a
    * relation `d(day, event_type, n, trend, seasonal, resid)`. */
  private def seasonalCte(spike: Boolean): String = {
    val spikeExpr =
      if (spike) "n + CASE WHEN day = DATE '2024-01-15' THEN 400 ELSE 0 END"
      else "n"
    s"""ev AS (
        SELECT cast(date_trunc('day', ts) as date) AS day, event_type
        FROM events),
      daily AS (
        SELECT day, event_type, count(*) AS n FROM ev GROUP BY day,
        event_type),
      bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      spine AS (
        SELECT cast(unnest(generate_series(cast(d0 as timestamp),
                 cast(d1 as timestamp), INTERVAL 1 DAY)) as date) AS day
        FROM bounds),
      grid AS (
        SELECT day, event_type
        FROM spine CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
      f AS (
        SELECT day, event_type, $spikeExpr AS n FROM (
          SELECT grid.day, grid.event_type, coalesce(n, 0) AS n
          FROM grid LEFT JOIN daily
            ON grid.day = daily.day AND grid.event_type = daily.event_type)
          f0),
      w AS (
        SELECT day, event_type, n,
               CASE WHEN count(*) OVER fr = 7
                    THEN cast(sum(n) OVER fr as double) / 7.0 END AS trend,
               cast(date_diff('day', DATE '1970-01-01', day) % 7 as int)
                 AS dow
        FROM f
        WINDOW fr AS (PARTITION BY event_type ORDER BY day
                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      s AS (
        SELECT event_type, dow,
               cast(sum(cast(n - trend as decimal(30,6))) as double)
                 / count(*) AS seasonal
        FROM w WHERE trend IS NOT NULL GROUP BY event_type, dow),
      d AS (
        SELECT day, w.event_type, n, trend, seasonal,
               n - trend - seasonal AS resid
        FROM w JOIN s ON w.event_type = s.event_type AND w.dow = s.dow)"""
  }

  val qSeasonal: GQuery = GQuery(
    "q_seasonal",
    (spark, dir) => {
      import spark.implicits._
      seasonalFrame(spark, dir, spike = false)
        .select($"day", $"event_type", $"n".cast("int").as("n"),
          r6($"trend").as("trend"), r6($"seasonal").as("seasonal"),
          r6($"resid").as("residual"))
        .orderBy($"event_type", $"day")
    },
    Some(s"""
      WITH ${seasonalCte(spike = false)}
      SELECT day, event_type, cast(n as int) AS n,
             ${r6Sql("trend")} AS trend,
             ${r6Sql("seasonal")} AS seasonal,
             ${r6Sql("resid")} AS residual
      FROM d
      ORDER BY event_type, day"""),
  )

  /** Seasonal-aware robust anomaly detection — the composition the
    * decomposition exists for: a point is anomalous when its RESIDUAL
    * (what trend and weekly seasonality cannot explain) exceeds 3
    * robust sigmas, with sigma = 1.4826·MAD of the type's residuals —
    * so a legitimate weekly peak is NOT flagged and one planted spike
    * cannot inflate the threshold that should catch it (a stddev-based
    * gate dilutes itself; the MAD one doesn't, same argument as q_mad).
    * The per-type MAD is two exact medians over ~|days| values — tiny
    * after the decomposition's aggregations; at 100 TB the same plan
    * swaps GK quantiles in unchanged (GkSwapSpec contract). A +400
    * spike planted on one mid-series day (inside the shared
    * [[seasonalFrame]]) keeps the output non-vacuous at every SF. */
  val qAnomaly: GQuery = GQuery(
    "q_anomaly",
    (spark, dir) => {
      import spark.implicits._
      val d = seasonalFrame(spark, dir, spike = true)
        .filter($"resid".isNotNull)
        .select($"day", $"event_type", $"n", r6($"resid").as("resid"))
      val med = d.groupBy($"event_type")
        .agg(expr("percentile(resid, 0.5)").as("med"))
      val sigma = d.join(med, Seq("event_type"))
        .groupBy($"event_type")
        .agg(expr("percentile(abs(resid - med), 0.5)").as("mad"))
      d.join(sigma, Seq("event_type"))
        .select($"event_type", $"day", $"n".cast("int").as("n"), $"resid",
          r6(abs($"resid") / (lit(1.4826) * $"mad")).as("score"))
        .filter($"score" > 3.0)
        .orderBy($"event_type", $"day")
    },
    Some(s"""
      WITH ${seasonalCte(spike = true)},
      dd AS (
        SELECT day, event_type, n, ${r6Sql("resid")} AS resid
        FROM d WHERE resid IS NOT NULL),
      med AS (
        SELECT event_type, quantile_cont(resid, 0.5) AS med
        FROM dd GROUP BY event_type),
      sig AS (
        SELECT dd.event_type,
               quantile_cont(abs(resid - med), 0.5) AS mad
        FROM dd JOIN med ON dd.event_type = med.event_type
        GROUP BY dd.event_type)
      SELECT event_type, day, cast(n as int) AS n, resid,
             ${r6Sql("abs(resid) / (cast(1.4826 as double) * mad)")}
               AS score
      FROM dd JOIN sig USING (event_type)
      WHERE ${r6Sql("abs(resid) / (cast(1.4826 as double) * mad)")}
              > cast(3.0 as double)
      ORDER BY event_type, day"""),
  )

  /** NTILE bucketing — equal-frequency quartiles of customers by
    * account balance, with per-quartile integer-cent spend stats.
    * Determinism: the ntile ORDER BY carries the §5.2 unique tiebreak
    * (acctbal, custkey), so bucket boundaries are identical on any
    * cluster; both engines assign remainder rows to the LEADING
    * buckets (SQL-standard ntile). Balances aggregate in exact cents;
    * the only doubles are the final per-quartile means. */
  val qWinNtile: GQuery = GQuery(
    "q_win_ntile",
    (spark, dir) => {
      import spark.implicits._
      val cents = floor($"c_acctbal" * lit(100.0) + lit(0.5)).cast("long")
      Tables.customer(spark, dir)
        .select($"c_custkey", cents.as("bal"))
        .withColumn("q", ntile(4).over(
          Window.orderBy($"bal", $"c_custkey")).cast("int"))
        .groupBy($"q")
        .agg(count(lit(1)).as("n_customers"),
          min($"bal").as("min_cents"),
          max($"bal").as("max_cents"),
          r2(sum($"bal").cast("double") / count(lit(1)) / lit(100.0))
            .as("mean_balance"))
        .orderBy($"q")
    },
    Some(s"""
      SELECT q, count(*) AS n_customers,
             min(bal) AS min_cents, max(bal) AS max_cents,
             ${r2Sql("cast(sum(bal) as double) / count(*) " +
               "/ cast(100.0 as double)")} AS mean_balance
      FROM (
        SELECT c_custkey,
               cast(floor(c_acctbal * cast(100.0 as double)
                 + cast(0.5 as double)) as bigint) AS bal,
               cast(ntile(4) OVER (ORDER BY
                 cast(floor(c_acctbal * cast(100.0 as double)
                   + cast(0.5 as double)) as bigint), c_custkey) as int) AS q
        FROM customer) t
      GROUP BY q ORDER BY q"""),
  )

  /** STRENGTH OF TREND / SEASONALITY (Hyndman's variance-ratio form)
    * per event type, computed over the SAME decomposition frame as
    * q_seasonal (one shared code path, so the two queries can never
    * disagree about what "trend" means): Fₜ = max(0, 1 −
    * var(resid)/var(deseasonalized)) and Fₛ likewise against the
    * detrended series. The decomposition parts are SNAPPED TO A 3 DP
    * GRID with the pure-IEEE rN before any decimal staging — their raw
    * values are sums of sevenths (trend/seasonal divisions) whose 6 dp
    * decimal casts sit on rounding ties where the two engines' cast
    * semantics diverge (observed at sf0.1: shortest-repr HALF_UP vs
    * binary-value rounding flipped single rows); on the 3 dp grid the
    * values AND their squares are exact decimal(30,6) citizens, so the
    * staged moments are tie-free. One combinable groupBy; everything
    * after is a fixed IEEE expression on ≤\|types\| rows. */
  val qSeasonStrength: GQuery = GQuery(
    "q_season_strength",
    (spark, dir) => {
      import spark.implicits._
      val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(30, 6))
      val f = seasonalFrame(spark, dir, spike = false)
        .filter($"trend".isNotNull)
        .select($"event_type",
          rN($"resid", 3).as("r"),
          rN($"n" - $"seasonal", 3).as("des"),
          rN($"seasonal" + $"resid", 3).as("det"))
      val g = f.groupBy($"event_type").agg(
        count(lit(1)).as("cnt"),
        sum(dec($"r")).cast("double").as("sr"),
        sum(dec($"r" * $"r")).cast("double").as("qr"),
        sum(dec($"des")).cast("double").as("sd"),
        sum(dec($"des" * $"des")).cast("double").as("qd"),
        sum(dec($"det")).cast("double").as("st"),
        sum(dec($"det" * $"det")).cast("double").as("qt"))
      val n = $"cnt".cast("double")
      def v(s: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
        (q - s * s / n) / (n - lit(1.0))
      g.select($"event_type", $"cnt".as("n_days"),
          r6(greatest(lit(0.0),
            lit(1.0) - v($"sr", $"qr") / v($"sd", $"qd")))
            .as("strength_trend"),
          r6(greatest(lit(0.0),
            lit(1.0) - v($"sr", $"qr") / v($"st", $"qt")))
            .as("strength_seasonal"))
        .orderBy($"event_type")
    },
    Some(s"""
      WITH ${seasonalCte(spike = false)},
      parts AS (
        SELECT event_type,
               ${rNSql("resid", 3)} AS r,
               ${rNSql("n - seasonal", 3)} AS des,
               ${rNSql("seasonal + resid", 3)} AS det
        FROM d WHERE trend IS NOT NULL),
      mom AS (
        SELECT event_type, count(*) AS cnt,
               cast(sum(cast(r as decimal(30,6))) as double) AS sr,
               cast(sum(cast(r * r as decimal(30,6))) as double) AS qr,
               cast(sum(cast(des as decimal(30,6))) as double) AS sd,
               cast(sum(cast(des * des as decimal(30,6))) as double) AS qd,
               cast(sum(cast(det as decimal(30,6))) as double) AS st,
               cast(sum(cast(det * det as decimal(30,6))) as double) AS qt
        FROM parts GROUP BY event_type)
      SELECT event_type, cnt AS n_days,
             ${r6Sql("greatest(cast(0.0 as double), cast(1.0 as double) - " +
               "((qr - sr * sr / cast(cnt as double)) / " +
               "(cast(cnt as double) - 1.0)) / " +
               "((qd - sd * sd / cast(cnt as double)) / " +
               "(cast(cnt as double) - 1.0)))")} AS strength_trend,
             ${r6Sql("greatest(cast(0.0 as double), cast(1.0 as double) - " +
               "((qr - sr * sr / cast(cnt as double)) / " +
               "(cast(cnt as double) - 1.0)) / " +
               "((qt - st * st / cast(cnt as double)) / " +
               "(cast(cnt as double) - 1.0)))")} AS strength_seasonal
      FROM mom ORDER BY event_type"""),
  )

  /** HOURLY OHLC CANDLES of the event value stream — the
    * downsample-to-candles aggregation every metrics store runs. Open
    * and close are the chronologically first/last value per hour with
    * the (ts_ticks, event_id) unique tiebreak (total order — no
    * same-second ambiguity across engines; DuckDB orders by raw µs ts,
    * which is tick-equivalent); high/low/volume are plain combinable
    * aggregates. One shuffle on the hour key; ~720 output rows at any
    * SF. */
  val qOhlc: GQuery = GQuery(
    "q_ohlc",
    (spark, dir) => {
      import spark.implicits._
      val ev = Tables.events(spark, dir)
        .select(date_trunc("hour", $"ts").as("hr"), $"value",
          $"ts_ticks", $"event_id")
      val wa = Window.partitionBy($"hr").orderBy($"ts_ticks", $"event_id")
      val wd = Window.partitionBy($"hr")
        .orderBy($"ts_ticks".desc, $"event_id".desc)
      ev.withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy($"hr")
        .agg(count(lit(1)).as("n"),
          max(when($"ra" === 1, $"value")).as("open"),
          max($"value").as("high"),
          min($"value").as("low"),
          max(when($"rd" === 1, $"value")).as("close"),
          dsum($"value", 2).as("volume"))
        .orderBy($"hr")
    },
    Some(s"""
      WITH ev AS (
        SELECT date_trunc('hour', ts) AS hr, "value", ts, event_id
        FROM events),
      rk AS (
        SELECT hr, "value",
               row_number() OVER (PARTITION BY hr
                 ORDER BY ts, event_id) AS ra,
               row_number() OVER (PARTITION BY hr
                 ORDER BY ts DESC, event_id DESC) AS rd
        FROM ev)
      SELECT hr, count(*) AS n,
             max(CASE WHEN ra = 1 THEN "value" END) AS open,
             max("value") AS high,
             min("value") AS low,
             max(CASE WHEN rd = 1 THEN "value" END) AS close,
             ${dsumSql("\"value\"", 2)} AS volume
      FROM rk GROUP BY hr ORDER BY hr"""),
  )

  /** ROLLING 7-DAY QUANTILES (p50/p90) of daily order revenue — the
    * moving-percentile band behind burn-rate and SLO dashboards, where
    * a rolling MEAN hides the tail. The daily series is exact integer
    * dollars (cents div 100 — q_hurst's convention), so the windowed
    * interpolated percentile rides the established percentile ≡
    * quantile_cont bit-contract on integers; the 7-row frame over the
    * calendar-bounded daily aggregate costs nothing at any SF. Output
    * is the last 60 complete-window days. */
  val qRollingPctl: GQuery = GQuery(
    "q_rolling_pctl",
    (spark, dir) => {
      import spark.implicits._
      val daily = Tables.orders(spark, dir)
        .groupBy(to_date($"o_orderdate").as("day"))
        .agg(expr("sum(cast(floor(o_totalprice * cast(100.0 as double) " +
          "+ cast(0.5 as double)) as long)) div 100").as("x"))
      val w = Window.orderBy($"day")
      val w7 = Window.orderBy($"day").rowsBetween(-6, 0)
      daily
        .withColumn("i", row_number().over(w))
        .withColumn("p50_7d", round(expr("percentile(x, 0.5)").over(w7), 6))
        .withColumn("p90_7d", round(expr("percentile(x, 0.9)").over(w7), 6))
        .filter($"i" >= 7)
        .orderBy($"day".desc).limit(60)
        .select($"day", $"x".as("revenue"), $"p50_7d", $"p90_7d")
        .orderBy($"day")
    },
    Some("""
      WITH daily AS (
        SELECT cast(date_trunc('day', o_orderdate) as date) AS day,
               cast(sum(cast(floor(o_totalprice * cast(100.0 as double)
                 + cast(0.5 as double)) as bigint)) as bigint) // 100 AS x
        FROM orders GROUP BY 1),
      r AS (
        SELECT day, x,
               cast(row_number() OVER (ORDER BY day) as bigint) AS i,
               round(quantile_cont(x, 0.5) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS p50_7d,
               round(quantile_cont(x, 0.9) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS p90_7d
        FROM daily)
      SELECT day, x AS revenue, p50_7d, p90_7d
      FROM (SELECT * FROM r WHERE i >= 7 ORDER BY day DESC LIMIT 60) t
      ORDER BY day"""),
  )

  val all: Seq[GQuery] = Seq(
    qWinRank, qWinAnalytic, qWinFrame, qWinRange, qTopkGroup,
    qWinTumble, qSessionize, qGapplyAgg, qDedupLatest, qWinSession,
    qWinSlide, qGapfill, qZscore, qEwma, qWinPctRank, qLocf, qFillLinear,
    qSeasonal, qAnomaly, qWinNtile, qSeasonStrength, qOhlc, qRollingPctl,
    qSessionizeXxl)
}
