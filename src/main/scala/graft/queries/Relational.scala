package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** General relational operator coverage (SURVEY §2.5-§2.7, §2.10): hash
  * aggregation, broadcast joins, semi/anti joins, windows, top-k,
  * rollup, substring search with lag/lead context, event-time windowed
  * aggregation and sessionization. Every query here has a DuckDB oracle.
  *
  * Determinism rules: every float aggregate is rounded; every window /
  * top-k has a total tie-break order.
  */
object Relational {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // broadcast-joined star aggregation: fact ⨝ small dims
    "q2_join_broadcast" -> ((s, dir) => {
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      val n = tbl(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    // per-group top-k via window + row_number (T2 idiom)
    "q3_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"), col("rn"))
    }),

    // left-semi + left-anti (EXISTS / NOT EXISTS)
    "q4_semi_anti" -> ((s, dir) => {
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("status"))
      val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("status"))
      withOrders.union(withoutOrders)
    }),

    // rollup with grouping-set markers
    "q5_rollup" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))),

    // global top-k (TakeOrderedAndProject) with total order
    "q6_global_topk" -> ((s, dir) =>
      tbl(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))),

    // scalar-subquery / join-on-aggregate: parts above their type's avg price
    "q7_above_avg" -> ((s, dir) => {
      val p = tbl(s, dir, "part")
      val avgByType = p.groupBy(col("p_type")).agg(avg(col("p_retailprice")).as("avg_price"))
      p.join(avgByType, Seq("p_type"))
        .where(col("p_retailprice") > col("avg_price"))
        .select(col("p_partkey"), col("p_type"),
          round(col("p_retailprice"), 2).as("p_retailprice"))
    }),

    // R1 — exact substring search over documents with ±1-token context via
    // lag/lead windows (/root/reference/app_enhanced.py:1393-1441 analog;
    // cleaned docs have no newlines so the "line" unit is the word)
    "q8_search_context" -> ((s, dir) => {
      val words = tbl(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      words
        .withColumn("prev", lag(col("word"), 1).over(w))
        .withColumn("next", lead(col("word"), 1).over(w))
        .where(col("word") === "spark")
        .select(col("doc_id"), col("pos"),
          concat_ws(" ", col("prev"), col("word"), col("next")).as("context"))
    }),

    // event-time tumbling-window aggregation (streaming-shaped, batch run)
    "q9_events_hourly" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))),

    // sessionization: 30-min-gap sessions per user (lag + running flag sum)
    "q10_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      tbl(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            // floor-of-epoch-seconds diff (events carry µs precision)
            floor(col("ts").cast("timestamp").cast("double")) -
              floor(col("prev_ts").cast("timestamp").cast("double")) > 1800d, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
    }),

    // full grouping-set lattice (CUBE): all four (flag, status) slices
    "q15_cube" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"))),

    // pivot: per-user wide event-type counts (fixed pivot values so the
    // output schema is static; absent combos filled 0 to match the
    // oracle's conditional aggregation)
    "q16_pivot" -> ((s, dir) =>
      tbl(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // salted equi-join under the hard gate: results must be IDENTICAL to
    // the plain join (the oracle is the plain SQL join) while the salt
    // spreads any hot key over nSalts reducers
    "q17_salted_join" -> ((s, dir) =>
      graft.ops.Skew.saltedJoin(
        tbl(s, dir, "customer")
          .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
        tbl(s, dir, "nation").select(col("n_nationkey").as("c_nationkey"), col("n_name")),
        "c_nationkey", "c_custkey", 8)),

    // two-phase salted aggregation ≡ plain GROUP BY (hot groups split
    // across reducers in the partial phase)
    "q18_salted_agg" -> ((s, dir) =>
      graft.ops.Skew.saltedSum(
        tbl(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity", "l_orderkey", 8)
        .select(col("l_returnflag"), round(col("sum_l_quantity"), 2).as("sum_qty"))),

    // distinct + set-op coverage: union of two projections, deduped
    "q11_union_distinct" -> ((s, dir) => {
      val hi = tbl(s, dir, "orders").where(col("o_totalprice") > 200000)
        .select(col("o_custkey").as("custkey"))
      val prio = tbl(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      hi.union(prio).distinct()
    }),

    // as-of join (no native Spark operator): for each error event, the
    // user's latest click at-or-before it — union + running-last window,
    // one shuffle on user_id, no join node. The oracle is DuckDB's
    // NATIVE ASOF LEFT JOIN — an independent first-class implementation.
    "q12_asof_join" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val probes = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val refs = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"), col("value").as("click_value"))
      graft.ops.Temporal.asofJoin(probes, "ts", refs, "click_ts", "user_id")
        .select(col("event_id"), col("user_id"), col("click_id"), col("click_value"),
          // ts is TIMESTAMP_NTZ; the session is pinned UTC, so the cast
          // to TIMESTAMP makes unix_micros == DuckDB epoch_us(naive)
          (unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("click_ts").cast("timestamp"))).as("gap_us"))
    }),

    // the hot-key-bounded as-of variant under the same independent
    // oracle (DuckDB native ASOF): identical matches to q12, computed
    // with per-slice window partitions over numeric epoch-micro times
    "q19_asof_sliced" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts").cast("timestamp")))
      val probes = ev.where(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val refs = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("click_us"),
          col("event_id").as("click_id"))
      // 1-day slices over the event horizon
      graft.ops.Temporal.asofJoinTimeSliced(
          probes, "ts_us", refs, "click_us", "user_id", 86400000000L)
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("ts_us") - col("click_us")).as("gap_us"))
    }),

    // range join: each purchase assigned to its containing 8-hour-gap
    // activity period built from the user's OTHER events (events per
    // user average ~5 h apart, so a 30-min gap would make zero-width
    // intervals; purchases in a gap are dropped — inner
    // point-in-interval semantics). Implemented as as-of-on-start + end
    // filter; the oracle is DuckDB's plain BETWEEN theta-join — an
    // independent formulation
    "q13_range_join" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sessions = ev.where(col("event_type") =!= "purchase")
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            floor(col("ts").cast("timestamp").cast("double")) -
              floor(col("prev_ts").cast("timestamp").cast("double")) > 28800d, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("t_start"), max(col("ts")).as("t_end"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      graft.ops.Temporal.pointInInterval(purchases, "ts", sessions, "t_start", "t_end", "user_id")
        .select(col("event_id"), col("user_id"), col("session_id"), col("value"))
    }),

    // OVERLAPPING-interval range join (binned): attribute each purchase
    // to every view whose [ts, ts + value·3600 s] attention window
    // contains it (windows up to ~40 h overlap heavily per user).
    // Interval replication to 1-hour bins + equi-join — the scale path
    // where a BETWEEN theta-join nests per key
    "q14_range_join_overlap" -> ((s, dir) => {
      val ev = tbl(s, dir, "events")
      val epochS = (c: Column) => floor(c.cast("timestamp").cast("double")).cast("long")
      val points = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), epochS(col("ts")).as("p_ts"))
      val windows = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          epochS(col("ts")).as("w_start"),
          (epochS(col("ts")) + floor(col("value") * 3600).cast("long")).as("w_end"))
      graft.ops.Temporal.rangeJoinBinned(points, "p_ts", windows,
        "w_start", "w_end", "user_id", 3600L)
        .select(col("event_id"), col("user_id"), col("view_id"))
    }))

  val oracles: Map[String, String] = Map(
    "q2_join_broadcast" ->
      """SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""".stripMargin,
    "q3_window_topk" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,
    "q4_semi_anti" ->
      """SELECT c_custkey, 'has_orders' AS status FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS status FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "q5_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q15_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "q16_pivot" ->
      """SELECT user_id,
        |       count(*) FILTER (event_type = 'click') AS click,
        |       count(*) FILTER (event_type = 'view') AS "view",
        |       count(*) FILTER (event_type = 'purchase') AS purchase,
        |       count(*) FILTER (event_type = 'signup') AS signup,
        |       count(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1""".stripMargin,
    "q17_salted_join" ->
      """SELECT c_custkey, c_name, c_nationkey, n_name
        |FROM customer JOIN nation ON n_nationkey = c_nationkey""".stripMargin,
    "q18_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q6_global_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q7_above_avg" ->
      """SELECT p_partkey, p_type, round(p_retailprice, 2) AS p_retailprice
        |FROM part JOIN (SELECT p_type, avg(p_retailprice) AS avg_price FROM part GROUP BY 1) USING (p_type)
        |WHERE p_retailprice > avg_price""".stripMargin,
    "q8_search_context" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
        |  FROM documents)
        |SELECT doc_id, pos,
        |       concat_ws(' ',
        |         lag(word) OVER (PARTITION BY doc_id ORDER BY pos),
        |         word,
        |         lead(word) OVER (PARTITION BY doc_id ORDER BY pos)) AS context
        |FROM words QUALIFY word = 'spark'""".stripMargin,
    "q9_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q10_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events, min(ts) AS t_start, max(ts) AS t_end
        |FROM sessions GROUP BY 1, 2""".stripMargin,
    "q11_union_distinct" ->
      """SELECT DISTINCT custkey FROM (
        |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        |  UNION ALL
        |  SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,

    "q12_asof_join" ->
      """WITH probes AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
        |refs AS (
        |  SELECT user_id, ts AS click_ts, event_id AS click_id, value AS click_value
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, r.click_id, r.click_value,
        |       epoch_us(p.ts) - epoch_us(r.click_ts) AS gap_us
        |FROM probes p ASOF LEFT JOIN refs r
        |  ON p.user_id = r.user_id AND p.ts >= r.click_ts""".stripMargin,

    "q19_asof_sliced" ->
      """WITH probes AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'error'),
        |refs AS (
        |  SELECT user_id, epoch_us(ts) AS click_us, event_id AS click_id
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, r.click_id, p.ts_us - r.click_us AS gap_us
        |FROM probes p ASOF LEFT JOIN refs r
        |  ON p.user_id = r.user_id AND p.ts_us >= r.click_us""".stripMargin,

    "q13_range_join" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 28800 THEN 1 ELSE 0 END AS new_session
        |  FROM events WHERE event_type <> 'purchase'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts,
        |         (sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                 ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
        |  FROM flagged),
        |iv AS (SELECT user_id, session_id, min(ts) AS t_start, max(ts) AS t_end
        |       FROM sessions GROUP BY 1, 2),
        |p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, iv.session_id, p.value
        |FROM p JOIN iv ON p.user_id = iv.user_id AND p.ts BETWEEN iv.t_start AND iv.t_end""".stripMargin,

    "q14_range_join_overlap" ->
      """WITH p AS (
        |  SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS p_ts
        |  FROM events WHERE event_type = 'purchase'),
        |iv AS (
        |  SELECT user_id, event_id AS view_id, floor(epoch(ts))::BIGINT AS w_start,
        |         floor(epoch(ts))::BIGINT + floor(value * 3600)::BIGINT AS w_end
        |  FROM events WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, iv.view_id
        |FROM p JOIN iv ON p.user_id = iv.user_id AND p.p_ts BETWEEN iv.w_start AND iv.w_end""".stripMargin)
}
