package graft.queries

/** DuckDB oracle SQL — one entry per StarQueries key, same column
  * aliases as the Spark side (the driver's compare sorts columns by
  * name before hashing values). Kept in lockstep with StarQueries;
  * every numeric aggregate goes through the identical DECIMAL → DOUBLE
  * path as the Spark plan so values are bit-equal.
  */
object StarOracles {

  val sql: Map[String, String] = Map(

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_fastest_leaderboard" ->
      """SELECT l_suppkey, l_extendedprice AS best_price, l_shipdate, l_orderkey, l_linenumber
        |FROM (
        |  SELECT l_suppkey, l_extendedprice, l_shipdate, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice, l_shipdate, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL) t
        |WHERE rn = 1
        |ORDER BY best_price, l_suppkey""".stripMargin,

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q_interval_join" ->
      """SELECT band, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l
        |LEFT JOIN (VALUES ('small', 1.0, 10.0), ('mid', 11.0, 25.0),
        |                  ('large', 26.0, 50.0)) AS b(band, lo, hi)
        |  ON l.l_quantity BETWEEN b.lo AND b.hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q_pivot" ->
      """SELECT n_name,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_unpivot" ->
      """WITH m AS (
        |  SELECT n_name,
        |    COUNT(*) FILTER (o_orderstatus = 'F') AS f,
        |    COUNT(*) FILTER (o_orderstatus = 'O') AS o,
        |    COUNT(*) FILTER (o_orderstatus = 'P') AS p
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, o_orderstatus, n_orders FROM (
        |  SELECT n_name, 'F' AS o_orderstatus, f AS n_orders FROM m
        |  UNION ALL SELECT n_name, 'O', o FROM m
        |  UNION ALL SELECT n_name, 'P', p FROM m) t
        |ORDER BY n_name, o_orderstatus""".stripMargin,

    "q_union_grid" ->
      """WITH urgent AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS grid_position
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 5),
        |rest AS (
        |  SELECT o_orderkey, o_orderpriority, o_totalprice,
        |    5 + row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS grid_position
        |  FROM orders WHERE o_orderpriority <> '1-URGENT'
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 5)
        |SELECT * FROM urgent UNION ALL SELECT * FROM rest ORDER BY grid_position""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS g_rf,
        |  CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_no_orders
        |FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_set_ops" ->
      """SELECT user_id FROM events WHERE event_type = 'view' AND value > 95
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 95
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error' AND value > 99
        |ORDER BY user_id""".stripMargin,

    "q_ntile" ->
      """SELECT o_orderpriority, quartile, COUNT(*) AS n,
        |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |FROM (SELECT o_orderpriority, o_totalprice,
        |    ntile(4) OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS quartile
        |  FROM orders) t
        |GROUP BY o_orderpriority, quartile
        |ORDER BY o_orderpriority, quartile""".stripMargin,

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS g_rf,
        |  CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS g_ls
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,

    "q_minmax_stats" ->
      """SELECT min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
        |  min(l_shipdate) AS min_shipdate, max(l_shipdate) AS max_shipdate,
        |  COUNT(*) AS n_rows,
        |  max(CASE WHEN l_quantity IS NULL OR l_discount IS NULL THEN 1 ELSE 0 END) AS has_nulls
        |FROM lineitem""".stripMargin,

    "q_avg_by_group" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_format_lap_time" ->
      """SELECT l_orderkey, l_linenumber,
        |  printf('%d:%02d.%03d',
        |    CAST(floor(l_extendedprice / 100.0 * 1000) AS BIGINT) // 60000,
        |    (CAST(floor(l_extendedprice / 100.0 * 1000) AS BIGINT) % 60000) // 1000,
        |    CAST(floor(l_extendedprice / 100.0 * 1000) AS BIGINT) % 1000) AS lap_str
        |FROM lineitem WHERE l_orderkey % 97 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_format_lap_time_expr" ->
      """SELECT l_orderkey, l_linenumber,
        |  printf('%d:%02d.%03d',
        |    CAST(floor(l_extendedprice / 100.0 * 1000) AS BIGINT) // 60000,
        |    (CAST(floor(l_extendedprice / 100.0 * 1000) AS BIGINT) % 60000) // 1000,
        |    CAST(floor(l_extendedprice / 100.0 * 1000) AS BIGINT) % 1000) AS lap_str
        |FROM lineitem WHERE l_orderkey % 89 = 0""".stripMargin,

    "q_phase_label" ->
      """SELECT CASE WHEN ts < TIMESTAMP '2024-01-10' THEN 'Q1'
        |            WHEN ts < TIMESTAMP '2024-01-20' THEN 'Q2'
        |            ELSE 'Q3' END AS phase,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  min(ts) AS min_ts, max(ts) AS max_ts
        |FROM events GROUP BY phase ORDER BY phase""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events""".stripMargin,

    "q_sliding_window" ->
      """WITH cand AS (SELECT event_type, value, ts,
        |    unnest([time_bucket(INTERVAL 30 MINUTE, ts),
        |            time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE]) AS ws
        |  FROM events)
        |SELECT ws, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM cand
        |WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR
        |GROUP BY ws, event_type""".stripMargin,

    "q_session_window" ->
      """WITH o AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM o)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL 10 MINUTE AS session_end,
        |  user_id, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    "q_custom_sessions" ->
      """WITH o AS (SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 600000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM o),
        |g AS (SELECT user_id, min(ts) AS session_start,
        |        max(ts) + INTERVAL 10 MINUTE AS session_end,
        |        epoch_us(max(ts)) + 600000000 AS end_us,
        |        COUNT(*) AS n
        |      FROM s GROUP BY user_id, sid),
        |wm AS (SELECT (epoch_us(max(ts)) // 1000 - 600000) * 1000 AS wm_us
        |       FROM events)
        |SELECT user_id, session_start, session_end, n
        |FROM g, wm WHERE g.end_us <= wm.wm_us""".stripMargin,

    "q_star_join" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // the skew report: hot keys over the 1000-row target + the
    // minimal sufficient salt, ceil via (cnt + target - 1) // target
    "q_skew_audit" ->
      """SELECT event_type, COUNT(*) AS cnt,
        |  (COUNT(*) + 999) // 1000 AS suggested_salt
        |FROM events GROUP BY event_type
        |HAVING COUNT(*) > 1000""".stripMargin,

    "q_salted_join" ->
      """SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value * CAST(weight AS DOUBLE) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS weighted_value
        |FROM events e
        |JOIN (VALUES ('view', 1.0), ('click', 2.0), ('purchase', 10.0),
        |             ('signup', 5.0), ('error', 0.0)) AS w(event_type, weight)
        |  ON e.event_type = w.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bucket,
        |  COUNT(*) AS n, min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |FROM lineitem GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_corr" ->
      """WITH m AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  (n * sxy - sx * sy) /
        |    (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend
        |FROM orders""".stripMargin,

    "q_lag_delta" ->
      """SELECT event_id, user_id, ts,
        |  lag(ts) OVER w AS prev_ts,
        |  epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q_asof_backward" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type IN ('view','click','error')),
        |r AS (SELECT user_id, ts, value AS cp_value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts, l.value, r.ts AS ts_right, r.cp_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    "q_asof_tolerance" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type IN ('view','click','error')),
        |r AS (SELECT user_id, ts, value AS cp_value FROM events
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT l.event_id, l.user_id, l.ts, l.value,
        |        r.ts AS rts, r.cp_value AS rcp
        |      FROM l ASOF LEFT JOIN r
        |        ON l.user_id = r.user_id AND l.ts >= r.ts)
        |SELECT event_id, user_id, ts, value,
        |  CASE WHEN rts IS NOT NULL
        |        AND epoch_us(ts) - epoch_us(rts) <= 1800000000
        |       THEN rts END AS ts_right,
        |  CASE WHEN rts IS NOT NULL
        |        AND epoch_us(ts) - epoch_us(rts) <= 1800000000
        |       THEN rcp END AS cp_value
        |FROM j""".stripMargin,

    "q_asof_forward" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'signup'),
        |r AS (SELECT user_id, ts, value AS cp_value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts, l.value, r.ts AS ts_right, r.cp_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,

    "q_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'signup'),
        |r AS (SELECT user_id, ts, value AS cp_value FROM events
        |      WHERE event_type = 'purchase'),
        |b AS (SELECT l.event_id, r.ts AS bts, r.cp_value AS bval
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.ts AS fts, r.cp_value AS fval
        |      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts)
        |SELECT l.event_id, l.user_id, l.ts, l.value,
        |  CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
        |       WHEN epoch_us(l.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(l.ts)
        |       THEN bts ELSE fts END AS ts_right,
        |  CASE WHEN bts IS NULL THEN fval WHEN fts IS NULL THEN bval
        |       WHEN epoch_us(l.ts) - epoch_us(bts) <= epoch_us(fts) - epoch_us(l.ts)
        |       THEN bval ELSE fval END AS cp_value
        |FROM l LEFT JOIN b USING(event_id) LEFT JOIN f USING(event_id)""".stripMargin,

    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY ws, event_type""".stripMargin,

    "q_stream_join" ->
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |  v.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        | AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR""".stripMargin,

    "q_stream_left_join" ->
      """WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM p))
        |         - INTERVAL 10 MINUTE AS w)
        |SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |  v.user_id AS user_id, v.ts AS view_ts, p.ts AS purchase_ts
        |FROM v
        |LEFT JOIN p ON v.user_id = p.user_id
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR, wm
        |WHERE p.event_id IS NOT NULL OR v.ts + INTERVAL 1 HOUR < wm.w""".stripMargin,

    "q_stream_full_join" ->
      """WITH v AS (SELECT * FROM events WHERE event_type = 'view'),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM p))
        |         - INTERVAL 10 MINUTE AS w)
        |SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |  COALESCE(v.user_id, p.user_id) AS user_id,
        |  v.ts AS view_ts, p.ts AS purchase_ts
        |FROM v
        |FULL JOIN p ON v.user_id = p.user_id
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR, wm
        |WHERE (v.event_id IS NOT NULL AND p.event_id IS NOT NULL)
        |   OR (p.event_id IS NULL AND v.ts + INTERVAL 1 HOUR < wm.w)
        |   OR (v.event_id IS NULL AND p.ts < wm.w)""".stripMargin,

    // ingest-drift monitor: per (hour window, type) stream volume vs
    // the static per-type reference rate, routed low/ok/high with
    // integer cross-multiplies (1.5x / 0.5x the reference rate)
    "q_stream_drift" ->
      """WITH ref AS (SELECT event_type, COUNT(*) AS ref_cnt
        |  FROM events GROUP BY event_type),
        |hrs AS (SELECT COUNT(DISTINCT date_trunc('hour', ts))
        |    AS ref_hours FROM events),
        |win AS (SELECT date_trunc('hour', ts) AS ws, event_type,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT w.ws, w.event_type, w.n, r.ref_cnt, h.ref_hours,
        |  CASE WHEN w.n * h.ref_hours * 100 > r.ref_cnt * 150 THEN 'high'
        |    WHEN w.n * h.ref_hours * 100 < r.ref_cnt * 50 THEN 'low'
        |    ELSE 'ok' END AS drift
        |FROM win w
        |JOIN ref r ON r.event_type = w.event_type
        |CROSS JOIN hrs h""".stripMargin,

    "q_stream_static_join" ->
      """SELECT date_trunc('hour', ts) AS ws, e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value * CAST(weight AS DOUBLE) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS weighted_value
        |FROM events e
        |JOIN (VALUES ('view', 1.0), ('click', 2.0), ('purchase', 10.0),
        |             ('signup', 5.0), ('error', 0.0)) AS w(event_type, weight)
        |  ON e.event_type = w.event_type
        |GROUP BY ws, e.event_type""".stripMargin,

    "q_quantiles" ->
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.25) AS p25,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.75) AS p75,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_sql_surface" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  printf('%d:%02d.%03d',
        |    CAST(floor(min(l_extendedprice) / 100.0 * 1000) AS BIGINT) // 60000,
        |    (CAST(floor(min(l_extendedprice) / 100.0 * 1000) AS BIGINT) % 60000) // 1000,
        |    CAST(floor(min(l_extendedprice) / 100.0 * 1000) AS BIGINT) % 1000) AS min_price_fmt
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |GROUP BY l_returnflag""".stripMargin,

    "q_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS ws, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY ws, event_type ORDER BY ws, event_type""".stripMargin,

    "q_shipmode_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_promo_share" ->
      """WITH a AS (SELECT
        |    SUM(CASE WHEN p_type LIKE 'PROMO%'
        |             THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
        |             ELSE CAST(0 AS DECIMAL(18,4)) END) AS promo,
        |    SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |    AND l_shipdate < TIMESTAMP '1997-10-01')
        |SELECT 100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE)
        |    AS promo_share_pct,
        |  CAST(promo AS DOUBLE) AS promo_revenue,
        |  CAST(total AS DOUBLE) AS total_revenue
        |FROM a""".stripMargin,

    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |v AS (SELECT user_id, min(tus) AS v FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.tus) AS c FROM ev e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.tus > v.v GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.tus) AS p FROM ev e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.tus > c.c GROUP BY e.user_id)
        |SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
        |  (SELECT COUNT(*) FROM c) AS n_click_users,
        |  (SELECT COUNT(*) FROM p) AS n_purchase_users""".stripMargin,

    "q_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
        |  FROM events),
        |firsts AS (SELECT user_id, min(d) AS d0 FROM days GROUP BY user_id)
        |SELECT CAST(f.d0 AS TIMESTAMP) AS d0, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM days x WHERE
        |    x.user_id = f.user_id AND x.d = f.d0 + INTERVAL 1 DAY)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS retained_d1,
        |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM days x WHERE
        |    x.user_id = f.user_id AND x.d = f.d0 + INTERVAL 7 DAY)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS retained_d7
        |FROM firsts f GROUP BY f.d0 ORDER BY f.d0""".stripMargin,

    "q_rolling_1h" ->
      """SELECT event_id, user_id, ts,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice, o_orderkey)""".stripMargin,

    "q_quality_checks" ->
      """SELECT "check", violations FROM (
        |  SELECT 'customer_dup_keys' AS "check", CAST(COUNT(*) AS BIGINT) AS violations
        |  FROM (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1)
        |  UNION ALL
        |  SELECT 'events_null_user', CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'lineitem_orphans', CAST(COUNT(*) AS BIGINT)
        |  FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem_qty_range',
        |    CAST(COUNT(*) FILTER (l_quantity NOT BETWEEN 1 AND 50) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_null_priority',
        |    CAST(COUNT(*) FILTER (o_orderpriority IS NULL) AS BIGINT)
        |  FROM orders) t
        |ORDER BY "check"""".stripMargin,

    "q_stream_dedup" ->
      """SELECT event_id, user_id, event_type FROM events""".stripMargin,

    // streaming exact-substring contamination: the completed stream
    // must equal the batch gram join — incoming suffix positions
    // (chr(1)-joined first-10-token keys) against the index corpus's
    // DISTINCT per-doc gram set
    "q_stream_substr" ->
      """WITH inc AS (
        |  SELECT doc_id + 600000 AS new_id,
        |    text || ' graftincr end' AS text
        |  FROM documents WHERE doc_id % 13 = 0),
        |ig AS (SELECT new_id, array_to_string(w[pos:pos+9], chr(1)) AS bkt
        |  FROM (SELECT new_id, w, unnest(range(1, len(w) - 8)) AS pos
        |    FROM (SELECT new_id, string_split(text, ' ') AS w FROM inc)
        |    WHERE len(w) >= 10)),
        |idx AS (SELECT DISTINCT doc_id AS index_id,
        |    array_to_string(w[pos:pos+9], chr(1)) AS bkt
        |  FROM (SELECT doc_id, w, unnest(range(1, len(w) - 8)) AS pos
        |    FROM (SELECT doc_id, string_split(text, ' ') AS w
        |      FROM documents) WHERE len(w) >= 10))
        |SELECT g.new_id, x.index_id, CAST(COUNT(*) AS BIGINT)
        |    AS n_positions
        |FROM ig g JOIN idx x ON x.bkt = g.bkt
        |GROUP BY 1, 2""".stripMargin,

    // streaming incremental near-dup: the completed stream must equal
    // the batch band join — same md5 minhash/band derivation as the
    // ext dedup oracles, agreeing-band count per (new, index) pair
    "q_stream_neardup" ->
      """WITH inc AS (
        |  SELECT doc_id + 600000 AS doc_id, text || ' graftincr end' AS text
        |  FROM documents WHERE doc_id % 13 = 0),
        |ti AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |tn AS (SELECT doc_id, string_split(text, ' ') AS w FROM inc),
        |shi AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |  FROM ti WHERE len(w) >= 3) t),
        |shn AS (SELECT DISTINCT doc_id, shingle FROM (
        |  SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
        |  FROM tn WHERE len(w) >= 3) t),
        |mhi AS (SELECT doc_id, sd.seed,
        |    min(md5(sd.seed::VARCHAR || '|' || shingle)) AS h
        |  FROM shi CROSS JOIN (SELECT unnest(range(8)) AS seed) sd
        |  GROUP BY doc_id, sd.seed),
        |mhn AS (SELECT doc_id, sd.seed,
        |    min(md5(sd.seed::VARCHAR || '|' || shingle)) AS h
        |  FROM shn CROSS JOIN (SELECT unnest(range(8)) AS seed) sd
        |  GROUP BY doc_id, sd.seed),
        |bi AS (SELECT doc_id, seed // 2 AS band,
        |    min(CASE WHEN seed % 2 = 0 THEN h END)
        |      || min(CASE WHEN seed % 2 = 1 THEN h END) AS bkey
        |  FROM mhi GROUP BY doc_id, seed // 2),
        |bn AS (SELECT doc_id, seed // 2 AS band,
        |    min(CASE WHEN seed % 2 = 0 THEN h END)
        |      || min(CASE WHEN seed % 2 = 1 THEN h END) AS bkey
        |  FROM mhn GROUP BY doc_id, seed // 2)
        |SELECT n.doc_id AS new_id, i.doc_id AS index_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_bands
        |FROM bn n JOIN bi i ON i.band = n.band AND i.bkey = n.bkey
        |GROUP BY n.doc_id, i.doc_id""".stripMargin,

    "q_batch_sessions" ->
      """WITH o AS (SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 21600000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM o)
        |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // ordered funnel, first-touch anchored, 7-day span — the step
    // chain replayed as dependent min-agg CTEs
    "q_funnel_span" ->
      """WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS t1
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(s1.t1) AS t1,
        |    MIN(epoch_us(e.ts)) AS t2
        |  FROM events e JOIN s1 ON s1.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
        |    AND epoch_us(e.ts) <= s1.t1 + 604800000000
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
        |  FROM events e JOIN s2 ON s2.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
        |    AND epoch_us(e.ts) <= s2.t1 + 604800000000
        |  GROUP BY e.user_id)
        |SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step,
        |  CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
        |UNION ALL SELECT CAST(2 AS BIGINT), 'click',
        |  CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        |UNION ALL SELECT CAST(3 AS BIGINT), 'purchase',
        |  CAST((SELECT COUNT(*) FROM s3) AS BIGINT)""".stripMargin,

    // last-touch attribution: DuckDB's native ASOF join (the proven
    // q_asof_backward pattern) against the Spark as-of operator
    "q_attribution" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id AS click_id FROM events
        |      WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts, p.value, c.click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,

    // hourly rate spikes vs a trailing-6 observed-bucket baseline,
    // integer cross-multiplied (shared verbatim with q_stream_rate —
    // one constant IS the batch-equivalence contract)
    "q_rate_anomaly" -> rateAnomalySql,

    // multi-touch attribution: 10000 bp split integer-exactly across
    // the 24h window's clicks, remainder to the closing click
    "q_attribution_multi" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id,
        |    epoch_us(ts) AS p_us FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id,
        |    epoch_us(ts) AS c_us FROM events
        |  WHERE event_type = 'click'),
        |pr AS (SELECT p.purchase_id, c.click_id, p.user_id,
        |    p.p_us, c.c_us
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.c_us >= p.p_us - 86400000000 AND c.c_us <= p.p_us),
        |x AS (SELECT purchase_id, click_id, user_id,
        |    p_us - c_us AS gap_us,
        |    CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
        |      AS n_touches,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY c_us DESC, click_id DESC) AS rk
        |  FROM pr)
        |SELECT purchase_id, click_id, user_id, gap_us, n_touches,
        |  CAST(10000 // n_touches + CASE WHEN rk = 1
        |    THEN 10000 - n_touches * (10000 // n_touches)
        |    ELSE 0 END AS BIGINT) AS credit_bp
        |FROM x""".stripMargin,

    // the capped variant: keep the LATEST 3 clicks per (user, 24h
    // bucket), then the identical split — the oracle ignores the
    // engine's bucketed join shape (an execution detail) and applies
    // the cap directly: result = split over kept in-window clicks
    "q_attribution_capped" ->
      """WITH p AS (SELECT user_id, event_id AS purchase_id,
        |    epoch_us(ts) AS p_us FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, event_id AS click_id,
        |    epoch_us(ts) AS c_us,
        |    epoch_us(ts) // 86400000000 AS b FROM events
        |  WHERE event_type = 'click'),
        |k AS (SELECT user_id, click_id, c_us FROM (
        |  SELECT c.*, row_number() OVER (PARTITION BY user_id, b
        |    ORDER BY c_us DESC, click_id DESC) AS ck FROM c) t
        |  WHERE ck <= 3),
        |pr AS (SELECT p.purchase_id, k.click_id, p.user_id,
        |    p.p_us, k.c_us
        |  FROM p JOIN k ON p.user_id = k.user_id
        |    AND k.c_us >= p.p_us - 86400000000 AND k.c_us <= p.p_us),
        |x AS (SELECT purchase_id, click_id, user_id,
        |    p_us - c_us AS gap_us,
        |    CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT)
        |      AS n_touches,
        |    row_number() OVER (PARTITION BY purchase_id
        |      ORDER BY c_us DESC, click_id DESC) AS rk
        |  FROM pr)
        |SELECT purchase_id, click_id, user_id, gap_us, n_touches,
        |  CAST(10000 // n_touches + CASE WHEN rk = 1
        |    THEN 10000 - n_touches * (10000 // n_touches)
        |    ELSE 0 END AS BIGINT) AS credit_bp
        |FROM x""".stripMargin,

    // the cap's pricing row: uncapped per-user join mass vs the
    // bucketed capped mass, plus the cap's bite — pure key-count
    // arithmetic, no pair ever materialized
    "q_attribution_cap_audit" ->
      """WITH p AS (SELECT user_id, epoch_us(ts) AS p_us FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) // 86400000000 AS b
        |  FROM events WHERE event_type = 'click'),
        |pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_p
        |  FROM p GROUP BY 1),
        |cb AS (SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n_cb
        |  FROM c GROUP BY 1, 2),
        |cu AS (SELECT user_id, CAST(SUM(n_cb) AS BIGINT) AS n_c
        |  FROM cb GROUP BY 1),
        |um AS (SELECT CAST(COALESCE(SUM(n_p * n_c), 0) AS BIGINT)
        |  AS pairs_uncapped FROM pu JOIN cu USING (user_id)),
        |px AS (SELECT user_id,
        |    unnest([p_us // 86400000000, p_us // 86400000000 - 1]) AS b
        |  FROM p),
        |pb AS (SELECT user_id, b, CAST(COUNT(*) AS BIGINT) AS n_pb
        |  FROM px GROUP BY 1, 2),
        |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_user_windows,
        |  CAST(COALESCE(SUM(CASE WHEN n_cb > 3 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_capped_windows,
        |  CAST(COALESCE(SUM(GREATEST(n_cb - 3, 0)), 0) AS BIGINT)
        |    AS clicks_dropped FROM cb),
        |cm AS (SELECT CAST(COALESCE(SUM(n_pb * LEAST(n_cb, 3)), 0)
        |    AS BIGINT) AS pairs_capped
        |  FROM pb JOIN cb USING (user_id, b))
        |SELECT * FROM bs, um, cm""".stripMargin,

    // first-order Markov transitions, event_id tiebreak on tied ts
    "q_event_transitions" ->
      """WITH s AS (SELECT user_id, event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_transitions
        |FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // the bucket-decomposed variant must equal the total-order
    // counts exactly — the oracle IS the global-sort formulation
    "q_transitions_bucketed" ->
      """WITH s AS (SELECT user_id, event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_transitions
        |FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2""".stripMargin,

    // conversion-lag histogram: integer log2 buckets via bit length
    // (length(bin(x)) — exact in both engines), -1 = unattributed
    "q_conversion_lag" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, event_id AS click_id FROM events
        |      WHERE event_type = 'click'),
        |a AS (SELECT p.event_id, c.click_id,
        |    epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
        |  FROM p ASOF LEFT JOIN c
        |    ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT CASE WHEN click_id IS NULL THEN CAST(-1 AS BIGINT)
        |    ELSE CAST(length(bin(gap_us)) AS BIGINT) END AS lag_bits,
        |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(COALESCE(MIN(gap_us), -1) AS BIGINT) AS min_gap_us,
        |  CAST(COALESCE(MAX(gap_us), -1) AS BIGINT) AS max_gap_us
        |FROM a GROUP BY 1""".stripMargin,

    // interval-overlap join: per-user daily click spans x view spans;
    // the oracle uses the bare overlap predicate (no bins) — equality
    // proves the binned plan's exactly-once first-bin trick
    "q_overlap_join" ->
      """WITH c AS (SELECT user_id,
        |    CAST(MIN(epoch_us(ts)) AS BIGINT) AS c_lo,
        |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS c_hi
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, epoch_us(ts) // 86400000000),
        |v AS (SELECT user_id,
        |    CAST(MIN(epoch_us(ts)) AS BIGINT) AS v_lo,
        |    CAST(MAX(epoch_us(ts)) AS BIGINT) AS v_hi
        |  FROM events WHERE event_type = 'view'
        |  GROUP BY user_id, epoch_us(ts) // 86400000000)
        |SELECT c.user_id, c_lo, c_hi, v_lo, v_hi
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND c_lo <= v_hi AND v_lo <= c_hi""".stripMargin,

    // streaming face of the spike detector: completed stream + the
    // bucket-table flag pass equal the SAME SQL constant as the
    // batch query — the batch-equivalence contract, by construction
    "q_stream_rate" -> rateAnomalySql,

    // weekly cohort retention over integer epoch weeks
    "q_cohort_triangle" ->
      """WITH f AS (SELECT user_id,
        |    MIN(epoch_us(ts)) // 604800000000 AS cw
        |  FROM events GROUP BY 1)
        |SELECT f.cw AS cohort_week,
        |  epoch_us(e.ts) // 604800000000 - f.cw AS week_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM events e JOIN f ON f.user_id = e.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_interval_binned" ->
      """SELECT band, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem l
        |JOIN (VALUES ('small', 1.0, 10.0), ('mid', 11.0, 25.0),
        |             ('large', 26.0, 50.0)) AS b(band, lo, hi)
        |  ON l.l_quantity BETWEEN b.lo AND b.hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CASE WHEN GROUPING(l_returnflag) THEN 1 ELSE 0 END AS g_rf,
        |  CASE WHEN GROUPING(l_linestatus) THEN 1 ELSE 0 END AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_linestatus), ())""".stripMargin,

    "q_ship_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey IN
        |    (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_bloom_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(q.qty_dec AS DOUBLE) AS sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) q
        |  ON o_orderkey = q.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,
  )

  /** The rate-spike SQL, bound ONCE and mapped from both
    * q_rate_anomaly and q_stream_rate: the streaming face's contract
    * is "equals the batch oracle verbatim", so a single constant is
    * that contract — an edit cannot reach one and miss the other.
    * (A `def` below the map is safe; a `val` would be null during
    * the map's initialization — the ExtOracles init-order gotcha.) */
  private def rateAnomalySql: String =
    """WITH h AS (SELECT event_type,
      |    epoch_us(ts) // 3600000000 AS hour_bucket,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, hour_bucket, n_events,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
      |  CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT)
      |    AS trail_events,
      |  CAST(CASE WHEN COUNT(*) OVER w = 6
      |    AND n_events * (COUNT(*) OVER w) >
      |        (COALESCE(SUM(n_events) OVER w, 0)) * 2
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_spike
      |FROM h
      |WINDOW w AS (PARTITION BY event_type ORDER BY hour_bucket
      |  ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING)""".stripMargin
}
