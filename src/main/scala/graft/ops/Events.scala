package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Num._

/** Batch analytics over the stream-shaped `events` table: tumbling and
  * sliding time windows and gap-based sessionization. The streaming twins
  * live in [[graft.streaming.EventStream]]; these batch forms are the
  * oracle-checkable semantics.
  */
object Events {

  // ---- q60: tumbling 1-hour windows ---------------------------------------
  def q60Hourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value")).as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("hour_start", "event_type")

  val q60Sql: String =
    s"""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, event_type,
       |  COUNT(*) AS n,
       |  ${sqlDsum("value")} AS total_value,
       |  MIN(value) AS min_value,
       |  MAX(value) AS max_value,
       |  COUNT(DISTINCT user_id) AS n_users
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_start, event_type""".stripMargin

  // ---- q61: sliding windows (2h size, 1h slide) via offset explode --------
  // Each event belongs to the windows starting at trunc(ts) and trunc(ts)−1h
  // — the generator form of a sliding window, shuffle-free until the agg.
  def q61Sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("window_start", explode(array(
        date_trunc("hour", col("ts")),
        date_trunc("hour", col("ts")) - expr("INTERVAL 1 HOUR"))))
      .groupBy("window_start", "event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
      .orderBy("window_start", "event_type")

  val q61Sql: String =
    s"""SELECT window_start, event_type, COUNT(*) AS n, ${sqlDsum("value")} AS total_value
       |FROM (
       |  SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)),
       |                 date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR]) AS window_start,
       |         event_type, value
       |  FROM events) w
       |GROUP BY 1, 2
       |ORDER BY window_start, event_type""".stripMargin

  // ---- q62: gap-based sessionization (30-min inactivity) ------------------
  // lag → gap flag → running sum = session id; pure integer/window logic,
  // hence engine-exact.
  def q62Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || col("ts") - col("prev_ts") > expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(runSum))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        dsum(col("value")).as("session_value"))
      .orderBy("user_id", "session_id")
  }

  val q62Sql: String =
    s"""SELECT user_id, session_id, COUNT(*) AS n_events,
       |  MIN(ts) AS session_start, MAX(ts) AS session_end,
       |  ${sqlDsum("value")} AS session_value
       |FROM (
       |  SELECT user_id, event_id, value, ts,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       |  FROM (
       |    SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
       |      CASE WHEN lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |              > INTERVAL 30 MINUTE
       |           THEN 1 ELSE 0 END AS new_session
       |    FROM events) flagged) sess
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  // ---- q65: semi-structured JSON column (from_json) -----------------------
  // `props` is a JSON string; Spark parses it with a typed schema
  // (from_json), the oracle extracts the same field by regex — equal
  // results prove the parse.
  def q65EventsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q65Sql: String =
    """SELECT event_type,
      |  COUNT(k) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k,
      |  MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INT) AS k
      |      FROM events) j
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q66: as-of join (composed from union + window) ---------------------
  // For each event, the customer's most recent order at or before the
  // event time. Spark lacks a native as-of join; rather than a custom
  // SparkPlan, this composes built-ins (preference (a) of the build
  // brief): tag both sides, union, and carry the last order attributes
  // forward with an ignore-nulls window — one shuffle by key, no range
  // explosion, scales as a plain keyed sort. Orders are deduped per
  // (custkey, date) first so ties can't make the match nondeterministic.
  // The DuckDB oracle is its native ASOF JOIN.
  def q66AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.t(s, dir, "orders")
      .groupBy("o_custkey", "o_orderdate")
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val oTagged = o.select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("src"), col("o_orderkey"), col("o_orderdate"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"))
    val e = Tables.events(s, dir)
    val eTagged = e.select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("src"), lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("timestamp_ntz").as("o_orderdate"),
      col("event_id"), col("value"))
    // at equal t the order sorts first (src 0 < 1) → "at or before" matches
    val w = Window.partitionBy("k").orderBy("t", "src")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    oTagged.union(eTagged)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("asof_orderdate", last(col("o_orderdate"), ignoreNulls = true).over(w))
      .filter(col("src") === 1 && col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("asof_orderkey"), col("asof_orderdate"),
        datediff(col("t").cast("date"), col("asof_orderdate").cast("date")).as("days_since_order"))
      .orderBy("event_id")
  }

  val q66Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      |  FROM orders GROUP BY o_custkey, o_orderdate)
      |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
      |  o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
      |  CAST(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) AS INT) AS days_since_order
      |FROM events e
      |ASOF JOIN o ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.o_orderdate
      |ORDER BY event_id""".stripMargin

  // ---- q67: range/interval join -------------------------------------------
  // Events within 3 days after each of the customer's first 3 orders —
  // an equi-join on the key FIRST (bounding the pair count), then the
  // range predicate; never a pure range cross-product. The 2024-vs-2001
  // testdata time ranges would make the natural version empty, so event
  // times are projected onto the order-date era deterministically.
  def q67RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.t(s, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        // deterministic projection into 1995–2001: day index from event id
        (lit("1995-01-01").cast("timestamp_ntz")
          + make_dt_interval(pmod(col("event_id"), lit(2400)).cast("int"))).as("ts2"))
    e.join(o, col("user_id") === col("o_custkey")
        && col("ts2") >= col("o_orderdate")
        && col("ts2") < col("o_orderdate") + expr("INTERVAL 3 DAYS"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_events"), min(col("ts2")).as("first_event"))
      .orderBy("o_orderkey")
  }

  val q67Sql: String =
    """SELECT o_orderkey, COUNT(*) AS n_events, MIN(ts2) AS first_event
      |FROM (
      |  SELECT event_id, user_id,
      |    TIMESTAMP '1995-01-01 00:00:00' + INTERVAL (event_id % 2400) DAY AS ts2
      |  FROM events) e
      |JOIN (SELECT o_orderkey, o_custkey, o_orderdate FROM orders WHERE o_orderkey % 10 = 0) o
      |  ON e.user_id = o.o_custkey
      | AND e.ts2 >= o.o_orderdate
      | AND e.ts2 < o.o_orderdate + INTERVAL 3 DAY
      |GROUP BY o_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // ---- q96: RANGE-frame window (trailing 1-hour per-user totals) ----------
  // The value-range frame family no other query exercises: for every event,
  // the count and value-sum of the SAME user's events in the preceding hour
  // (inclusive). The frame is keyed on INTEGER epoch seconds on both
  // engines (Spark `cast(ts as long)` floors; DuckDB `date_diff('second',
  // epoch, ts)` truncates — identical for post-1970 data), and the summed
  // value is floored integer cents, so frame membership and the aggregate
  // are both engine-exact. A RANGE frame is also tie-safe where ROWS is
  // not: equal-second rows are all in-frame regardless of sort order.
  //
  // Scale shape: one shuffle by user_id, then a per-partition sort — the
  // same cost as any per-key window; the frame never widens the shuffle.
  def q96RangeWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("sec"))
      .rangeBetween(-3600L, 0L)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        // NTZ has no direct long cast; via session-UTC timestamp, which
        // floors to seconds — matching the oracle's date_diff truncation
        col("ts").cast("timestamp").cast("long").as("sec"),
        floor(col("value") * 100).cast("long").as("cents"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("cents_1h", sum(col("cents")).over(w))
      .select("event_id", "user_id", "n_1h", "cents_1h")
      .orderBy("event_id")
  }

  val q96Sql: String =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(cents) OVER w AS BIGINT) AS cents_1h
      |FROM (SELECT event_id, user_id,
      |        date_diff('second', TIMESTAMP '1970-01-01 00:00:00',
      |                  CAST(ts AS TIMESTAMP)) AS sec,
      |        CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |      FROM events) e
      |WINDOW w AS (PARTITION BY user_id ORDER BY sec
      |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---- q97: ordered event funnel (view → click → purchase) ----------------
  // The classic product-analytics funnel with STRICT ordering: a user
  // converts at stage k only via an event strictly after their stage-k−1
  // time. Each stage is one keyed aggregate plus one equi-join against the
  // (shrinking) prior-stage user set — at scale the prior-stage side is
  // the small one and AQE broadcasts it; there is never a per-user event
  // sort or a cross-stage window. Counts are integers — engine-exact.
  def q97Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    val view = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val click = e.filter(col("event_type") === "click")
      .join(view, "user_id").filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val purchase = e.filter(col("event_type") === "purchase")
      .join(click, "user_id").filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_purchase"))
    view.agg(count(lit(1)).as("n_view_users"))
      .crossJoin(click.agg(count(lit(1)).as("n_click_users")))
      .crossJoin(purchase.agg(count(lit(1)).as("n_purchase_users")))
  }

  val q97Sql: String =
    """WITH v AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t_view
      |  FROM events WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_click
      |  FROM events e JOIN v ON v.user_id = e.user_id
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.t_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t_purchase
      |  FROM events e JOIN c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.t_click
      |  GROUP BY e.user_id)
      |SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
      |       (SELECT COUNT(*) FROM c) AS n_click_users,
      |       (SELECT COUNT(*) FROM p) AS n_purchase_users""".stripMargin

  // -------------------------------------------------------------------------
  // ---- q166: interval sweep — peak session concurrency per hour -----------
  // The classic interval-overlap question ("how many sessions were open at
  // once, and when?") answered without a global sort: q62's gap sessions
  // become ±1 boundary deltas on the µs grid (+1 at start, −1 at
  // end + 1µs — inclusive ends, so point sessions count), and the running
  // level is swept TWO-PHASE: a window per hour bucket computes the local
  // prefix, per-bucket delta totals prefix-sum over the tiny bucket
  // relation (the q145/q156 shape) and broadcast back as each hour's
  // carry-in. A synthetic level-probe delta (dd = 0) at each active
  // hour's start makes the hour's INCOMING level a sampled point, so the
  // hourly peak is the true sweep maximum over the hour, not just the
  // post-transition levels. Tie order at equal timestamps is dd
  // ascending (−1 < 0 < +1) — closes before probes before opens —
  // identical in both engines. Output: hours that contain any boundary,
  // with the peak level and the earliest instant achieving it.
  def q166MaxConcurrency(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull
          || col("ts") - col("prev_ts") > expr("INTERVAL 30 MINUTE"), 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(runSum))
      .groupBy("user_id", "session_id")
      .agg(expr("unix_micros(CAST(MIN(ts) AS TIMESTAMP))").as("start_us"),
        expr("unix_micros(CAST(MAX(ts) AS TIMESTAMP))").as("end_us"))
    val hourUs = 3600000000L
    val deltas = sessions.select(col("start_us").as("t"), lit(1).as("dd"))
      .unionByName(sessions.select((col("end_us") + 1).as("t"), lit(-1).as("dd")))
    val withB = deltas.withColumn("hb", expr(s"t div $hourUs"))
    val probes = withB.select(col("hb")).distinct()
      .select((col("hb") * hourUs).as("t"), lit(0).as("dd"), col("hb"))
    val all = withB.unionByName(probes)
    val wLocal = Window.partitionBy("hb").orderBy("t", "dd")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = all.withColumn("run", sum("dd").over(wLocal))
    val wCarry = Window.orderBy("hb").rowsBetween(Window.unboundedPreceding, -1)
    val carries = all.groupBy("hb").agg(sum("dd").as("tot"))
      .withColumn("carry", coalesce(sum("tot").over(wCarry), lit(0L)))
      .select(col("hb"), col("carry"))
    local.join(broadcast(carries), "hb")
      .withColumn("conc", col("run") + col("carry"))
      .groupBy("hb")
      .agg(max(struct(col("conc"), (-col("t")).as("nt"))).as("m"))
      .select(expr(s"CAST(timestamp_micros(hb * $hourUs) AS timestamp_ntz)")
        .as("hour_start"),
        col("m.conc").as("peak_concurrency"),
        (-col("m.nt")).as("peak_at_us"))
      .orderBy("hour_start")
  }

  val q166Sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       |    CASE WHEN lag(CAST(ts AS TIMESTAMP), 1) OVER w IS NULL
       |         OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP), 1) OVER w
       |            > INTERVAL 30 MINUTE
       |         THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id,
       |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id,
       |    ts
       |  FROM flagged),
       |bounds AS (
       |  SELECT epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us
       |  FROM sess GROUP BY user_id, session_id),
       |deltas AS (
       |  SELECT start_us AS t, 1 AS dd FROM bounds
       |  UNION ALL
       |  SELECT end_us + 1, -1 FROM bounds
       |  UNION ALL
       |  SELECT DISTINCT (start_us // 3600000000) * 3600000000, 0 FROM bounds
       |  UNION ALL
       |  SELECT DISTINCT ((end_us + 1) // 3600000000) * 3600000000, 0 FROM bounds),
       |run AS (
       |  SELECT t, dd,
       |    CAST(SUM(dd) OVER (ORDER BY t, dd
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS conc
       |  FROM deltas),
       |hourly AS (SELECT t // 3600000000 AS hb, t, conc FROM run),
       |peaks AS (SELECT hb, MAX(conc) AS mc FROM hourly GROUP BY 1)
       |SELECT make_timestamp(p.hb * 3600000000) AS hour_start,
       |  p.mc AS peak_concurrency, MIN(h.t) AS peak_at_us
       |FROM peaks p JOIN hourly h ON h.hb = p.hb AND h.conc = p.mc
       |GROUP BY 1, 2
       |ORDER BY 1""".stripMargin

  // ---- q165: calendar-spine gap fill + LOCF densify -----------------------
  // The time-series densify every reporting/feature pipeline needs: the
  // per-(user, day) revenue series has holes (most users do not transact
  // daily); downstream models want a DENSE series. A calendar spine
  // (min..max day × distinct users — a 1→k generator off a 1-row bounds
  // aggregate, repartitioned before the explode per the scan-split note)
  // left-joins the observed days; missing days carry the LAST OBSERVED
  // value forward (LOCF) with an is_observed flag and the staleness in
  // days — leading days before a user's first observation fill with 0 and
  // staleness −1. The LOCF itself is formulated engine-portably: the
  // running MAX of the conditional observation date (a plain window max —
  // no IGNORE NULLS dialect differences) keyed back to the observed
  // relation, so Spark and DuckDB share exact semantics. Scale shape: the
  // window and both joins all partition on the series key (one shuffle
  // family); the spine is |keys| × |days| rows, never a corpus product.
  def q165GapFillLocf(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("user_id", "d")
      .agg(sum("cents").as("cents"))
    val bounds = daily.agg(min("d").as("mn"), max("d").as("mx"))
    val spine = daily.select(col("user_id")).distinct()
      .transform(graft.Tables.barrier(_, col("user_id"))) // the 1→k explode note: spread the span
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(expr("sequence(mn, mx, interval 1 day)")).as("d"))
    val w = Window.partitionBy("user_id").orderBy("d")
    spine.join(daily, Seq("user_id", "d"), "left")
      .withColumn("lo_day",
        max(when(col("cents").isNotNull, col("d"))).over(w))
      .join(daily.select(col("user_id"), col("d").as("lo_day"),
        col("cents").as("lo_cents")), Seq("user_id", "lo_day"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("lo_cents"), lit(0L)).as("cents_filled"),
        col("cents").isNotNull.as("is_observed"),
        coalesce(datediff(col("d"), col("lo_day")), lit(-1)).as("days_since_obs"))
      .orderBy("user_id", "d")
  }

  val q165Sql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY 1, 2),
      |bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM daily),
      |days AS (
      |  SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM bounds),
      |spine AS (
      |  SELECT u.user_id, days.d
      |  FROM (SELECT DISTINCT user_id FROM daily) u CROSS JOIN days),
      |j AS (
      |  SELECT s.user_id, s.d, dy.cents,
      |    MAX(CASE WHEN dy.cents IS NOT NULL THEN s.d END)
      |      OVER (PARTITION BY s.user_id ORDER BY s.d) AS lo_day
      |  FROM spine s LEFT JOIN daily dy ON dy.user_id = s.user_id AND dy.d = s.d)
      |SELECT j.user_id, j.d,
      |  COALESCE(lo.cents, 0) AS cents_filled,
      |  j.cents IS NOT NULL AS is_observed,
      |  CAST(COALESCE(date_diff('day', j.lo_day, j.d), -1) AS INT) AS days_since_obs
      |FROM j LEFT JOIN daily lo ON lo.user_id = j.user_id AND lo.d = j.lo_day
      |ORDER BY 1, 2""".stripMargin

  // ---- q190: VARIANT semi-structured column (open-schema successor to q65)
  // q65 parses `props` with a FIXED from_json schema; VARIANT (Spark 4's
  // binary semi-structured type, the Parquet/Iceberg `variant` logical
  // type) needs none: `parse_json` ingests arbitrary JSON once into a
  // typed binary encoding and `variant_get` extracts typed paths lazily —
  // the shape a 100 TB metadata column actually has (heterogeneous,
  // evolving, mostly-unread). The document built here nests an object, an
  // array, and the raw `props` object verbatim; extraction exercises
  //   - a nested object path cast to BIGINT ($.meta.u),
  //   - an array index ($.vals[1]),
  //   - a path INTO the embedded open JSON ($.props.k),
  //   - try_variant_get with an impossible cast (STRING→INT ⇒ NULL, not
  //     error), and
  //   - schema_of_variant (per-row inferred logical schema, constant here
  //     because the corpus is shape-uniform — grouped to prove it).
  // Every extracted value is predictable from the source columns, so the
  // whole binary encode→path-walk round trip is DuckDB-hash-checkable.
  // Scale shape: pure per-row expressions + one partial-final aggregate —
  // no shuffle beyond the group-by; VARIANT decode stays inside codegen.
  def q190VariantProps(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        parse_json(concat(
          lit("""{"meta": {"t": """"), col("event_type"),
          lit("""", "u": """), col("user_id"),
          lit("""}, "vals": ["""), col("event_id") % 7,
          lit(", "), (col("event_id") % 7) * 2,
          lit("""], "props": """), col("props"), lit("}"))).as("v"))
      .select(col("event_type"),
        expr("variant_get(v, '$.meta.u', 'bigint')").as("u"),
        expr("variant_get(v, '$.vals[1]', 'int')").as("v1"),
        expr("variant_get(v, '$.props.k', 'int')").as("pk"),
        expr("try_variant_get(v, '$.meta.t', 'int')").as("bad_cast"),
        expr("schema_of_variant(v)").as("vschema"))
      .groupBy("event_type", "vschema")
      .agg(count(lit(1)).as("n"),
        sum(col("u")).as("sum_u"),
        sum(col("v1")).cast("long").as("sum_v1"),
        sum(col("pk")).cast("long").as("sum_pk"),
        count(col("bad_cast")).as("n_bad_cast"))
      .orderBy("event_type")

  val q190Sql: String =
    """SELECT event_type,
      |  'OBJECT<meta: OBJECT<t: STRING, u: BIGINT>, props: OBJECT<k: BIGINT>, vals: ARRAY<BIGINT>>' AS vschema,
      |  COUNT(*) AS n,
      |  CAST(SUM(user_id) AS BIGINT) AS sum_u,
      |  CAST(SUM((event_id % 7) * 2) AS BIGINT) AS sum_v1,
      |  CAST(SUM(CAST(regexp_extract(props, '"k": (-?\d+)', 1) AS INT)) AS BIGINT) AS sum_pk,
      |  0 AS n_bad_cast
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- q195: native batch session windows (session_window) ----------------
  // q62 hand-builds gap sessions from lag + running sum; q64/q72 do it in
  // streaming state. This is the NATIVE batch operator: `session_window`
  // turns each row into a provisional [ts, ts+gap) window and the
  // aggregation MERGES overlapping windows per key — physically a
  // partial-merge aggregate after one shuffle on user_id, no per-user
  // window function pass at all (the plan q62's lag() can never have).
  // Boundary semantics differ from q62 deliberately and the oracle
  // encodes them: windows are half-open, so a gap of EXACTLY 30:00 starts
  // a new session (q62's `>` keeps it). session_end is the window end
  // (last ts + gap), not the last event time — both are emitted.
  // Scale shape: one hash shuffle on the session key; merge work is
  // per-key linear. At 100 TB this beats q62's sort-based window exchange.
  def q195SessionWindowBatch(s: SparkSession, dir: String): DataFrame = {
    val sessions = Tables.events(s, dir)
      .select(col("user_id"), col("ts"),
        floor(col("value") * 100).cast("long").as("cents"))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("cents"))
    sessions
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("cents"))
      .orderBy("user_id", "session_start")
  }

  val q195Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN LAG(CAST(ts AS TIMESTAMP)) OVER w IS NULL
      |           OR CAST(ts AS TIMESTAMP) - LAG(CAST(ts AS TIMESTAMP)) OVER w
      |              >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))),
      |s AS (
      |  SELECT user_id, ts, cents,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                     ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM e)
      |SELECT user_id,
      |  MIN(ts) AS session_start,
      |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(cents) AS BIGINT) AS cents
      |FROM s
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_events_hourly" -> q60Hourly _,
    "q61_events_sliding" -> q61Sliding _,
    "q62_sessionize" -> q62Sessionize _,
    "q65_events_json" -> q65EventsJson _,
    "q66_asof_join" -> q66AsofJoin _,
    "q67_range_join" -> q67RangeJoin _,
    "q96_range_window" -> q96RangeWindow _,
    "q97_event_funnel" -> q97Funnel _,
    "q165_gap_fill_locf" -> q165GapFillLocf _,
    "q166_max_concurrency" -> q166MaxConcurrency _,
    "q190_variant_props" -> q190VariantProps _,
    "q195_session_window_batch" -> q195SessionWindowBatch _,
  )

  val oracle: Map[String, String] = Map(
    "q60_events_hourly" -> q60Sql,
    "q61_events_sliding" -> q61Sql,
    "q62_sessionize" -> q62Sql,
    "q65_events_json" -> q65Sql,
    "q66_asof_join" -> q66Sql,
    "q67_range_join" -> q67Sql,
    "q96_range_window" -> q96Sql,
    "q97_event_funnel" -> q97Sql,
    "q165_gap_fill_locf" -> q165Sql,
    "q166_max_concurrency" -> q166Sql,
    "q190_variant_props" -> q190Sql,
    "q195_session_window_batch" -> q195Sql,
  )
}
