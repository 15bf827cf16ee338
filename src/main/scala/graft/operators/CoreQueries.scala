package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Core SQL analytics block (SURVEY.md §2.B). Declarative
  * DataFrame plans — Catalyst handles pushdown/pruning/join selection;
  * we add explicit `broadcast()` hints on the small dimension tables so
  * the plan stays shuffle-free on the dim side at any scale factor.
  *
  * Determinism-for-oracle rules (SURVEY.md §5): monetary sums rounded
  * to 2dp, ratios to 6dp, temporal outputs formatted as strings, all
  * top-k orderings fully tie-broken. Column names match the DuckDB
  * oracle exactly (the driver sorts columns by name before hashing).
  *
  * Reference behavior mirrored: the query surface exercised by
  * /root/reference/src/test/scala/.../BasicCreateAndInsertTest.scala
  * (counts, partition-filtered scans) generalized to a TPC-H-ish set.
  */
object CoreQueries {

  private def money(c: Column): Column = round(c, 2)

  /** B1: pricing summary (grouped agg, partial-agg friendly). */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(sum(col("l_quantity"))).as("sum_qty"),
        money(sum(col("l_extendedprice"))).as("sum_base_price"),
        money(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** B2: shipping-priority join + grouped topN. NO broadcast hint on
    * customer: it grows linearly with scale factor (150 k rows × SF),
    * so a hard hint that is convenient at sf0.1 is a multi-GB
    * driver/executor OOM at the 100 TB target. AQE broadcasts it
    * whenever its post-filter size is actually under
    * `autoBroadcastJoinThreshold` — the size-gated decision belongs to
    * the runtime, not the query text. orders⋈lineitem shuffles on the
    * join key only.
    */
  def q3Join(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(money(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1998-03-15'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** B3: 5-way join. Broadcast hints ONLY on the genuinely fixed-size
    * dims — nation (25 rows) and region (5) never grow with scale
    * factor. customer and supplier are SF-proportional facts in dim
    * clothing: hinting them broadcast works at sf0.1 and OOMs at the
    * 100× target, so their join strategy is left to AQE's size-gated
    * runtime decision. lineitem⋈orders shuffles once on orderkey.
    */
  def q5MultiJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1997-01-01").cast("timestamp"))
    val cust = Tables.customer(s, d)
    val supp = Tables.supplier(s, d)
    val nat  = Tables.nation(s, d)
    val reg  = Tables.region(s, d).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(money(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5MultiJoinSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** B4: selective filter + global agg (pushdown exercise: only 4
    * columns of lineitem are read, filters reach the parquet scan).
    */
  def q6FilterAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(money(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"),
           count(lit(1)).as("n_rows"))

  val q6FilterAggSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate <  TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** B5: left semi join (EXISTS). Broadcast the filtered orders side
    * is wrong at scale (orders is a fact table) — shuffle semi join on
    * the key is the scalable plan; Catalyst picks it.
    */
  def qSemiJoin(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
    Tables.customer(s, d)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val qSemiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  /** B6: left anti join (NOT EXISTS) — customers with no pending order. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  val qAntiJoinSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** B7: window rank — top-3 parts by retail price per brand.
    * Single shuffle on p_brand; rank cast to long to match DuckDB.
    */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"), col("rnk"))
      .orderBy(col("p_brand"), col("rnk"))
  }

  val qWindowRankSql: String =
    """SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
      |  SELECT p_brand, p_partkey, p_retailprice,
      |    row_number() OVER (PARTITION BY p_brand
      |                       ORDER BY p_retailprice DESC, p_partkey) AS rnk
      |  FROM part) t
      |WHERE rnk <= 3
      |ORDER BY p_brand, rnk""".stripMargin

  /** B8: running sum per supplier ordered by ship date (cumulative
    * frame; order fully tie-broken so both engines fold identically).
    */
  def qWindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("shipdate"),
        round(sum(col("l_quantity")).over(w), 2).as("running_qty"))
      .orderBy(col("l_suppkey"), col("shipdate"), col("l_orderkey"), col("l_linenumber"))
  }

  val qWindowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  strftime(l_shipdate, '%Y-%m-%d') AS shipdate,
      |  round(sum(l_quantity) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2001-01-01'
      |ORDER BY l_suppkey, shipdate, l_orderkey, l_linenumber""".stripMargin

  /** B23 `q_window_lag`: lead/lag navigation — per-customer inter-order
    * gap in days (repeat-purchase cadence). One keyed window sort; the
    * partition key is the shuffle key, so the plan is a single exchange
    * + in-partition sort at any scale. Deterministic tie-break by
    * order key inside the frame ordering.
    */
  def qWindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") < 200)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("gap_days"))
      .orderBy(col("o_custkey"), col("orderdate"), col("o_orderkey"))
  }

  val qWindowLagSql: String =
    """SELECT o_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  date_diff('day',
      |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey
      |                              ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS gap_days
      |FROM orders WHERE o_custkey < 200
      |ORDER BY o_custkey, orderdate, o_orderkey""".stripMargin

  /** B9: rollup (multi-level aggregate in one pass). */
  def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(money(sum(col("l_quantity"))).as("sum_qty"),
           count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("cnt"))
      .orderBy(col("rf"), col("ls"))

  val qRollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin

  /** B10: exact distinct counts. (At 100 TB prefer
    * approx_count_distinct — HLL sketches merge map-side; exact
    * distinct forces a full shuffle of the distinct keys. Exact kept
    * here because the oracle must match bit-for-bit.)
    */
  def qDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"))

  val qDistinctSql: String =
    """SELECT count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem""".stripMargin

  /** B11: global top-k (TakeOrderedAndProject — no full sort; each
    * partition keeps k rows, driver merges k·p rows).
    */
  def qTopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val qTopKSql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** B12: scalar-subquery filter (above 1.1× average price). */
  def qSubqueryAvg(s: SparkSession, d: String): DataFrame = {
    val part = Tables.part(s, d)
    val thresh = part.agg((avg(col("p_retailprice"))).as("t"))
    part.join(broadcast(thresh))
      .filter(col("p_retailprice") > col("t"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  val qSubqueryAvgSql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** B13: time-bucketed event aggregation (the batch shape of the
    * streaming windowed agg in streaming/).
    */
  def qEventsWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
           money(sum(col("value"))).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  val qEventsWindowSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
      |  event_type, count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** B14: conditional (pivot-style) aggregation — one pass, no joins. */
  def qConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        money(sum(when(col("l_linestatus") === "F", col("l_quantity")).otherwise(0.0))).as("qty_f"),
        money(sum(when(col("l_linestatus") === "O", col("l_quantity")).otherwise(0.0))).as("qty_o"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  val qConditionalAggSql: String =
    """SELECT l_returnflag,
      |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END), 2) AS qty_f,
      |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END), 2) AS qty_o,
      |  count(*) AS cnt
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** B15: as-of join — each 'error' event matched to the latest
    * 'click' of the same user at-or-before it. Uses the generic
    * [[AsOfJoin]] operator (union + single shuffle + window; never a
    * per-key cross product).
    */
  def qAsOfJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_event_id"), col("user_id"), col("ts"))
    AsOfJoin(errors, clicks, keys = Seq("user_id"), leftTs = "ts", rightTs = "ts")
      .filter(col("click_event_id").isNotNull)
      .select(
        col("event_id"),
        col("click_event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("err_ts"),
        date_format(col("right_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
      .orderBy(col("event_id"))
  }

  val qAsOfJoinSql: String =
    """SELECT e.event_id, c.click_event_id,
      |  strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS err_ts,
      |  strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
      |ASOF JOIN (SELECT event_id AS click_event_id, user_id, ts FROM events
      |           WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND e.ts >= c.ts
      |ORDER BY e.event_id""".stripMargin

  /** B16: semi-structured access — JSON property extraction + agg
    * (get_json_object is codegen'd; at scale prefer from_json with an
    * explicit schema once the shape is known, so the parse happens once
    * per row, not per extracted key).
    */
  def qJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        round(avg(col("k")), 6).as("avg_k"))
      .orderBy(col("event_type"))

  val qJsonExtractSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** B17: cube — all grouping-set combinations in one pass. */
  def qCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), substring(col("o_orderpriority"), 1, 1).as("prio"))
      .agg(count(lit(1)).as("n"), money(sum(col("o_totalprice"))).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("prio"), lit("ALL")).as("prio"),
        col("n"), col("total"))
      .orderBy(col("status"), col("prio"))

  val qCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(substring(o_orderpriority, 1, 1), 'ALL') AS prio,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, substring(o_orderpriority, 1, 1))
      |ORDER BY status, prio""".stripMargin

  /** B29 `q_session_window`: native `session_window` in BATCH mode —
    * gap-based sessionization as one aggregation (the same operator
    * D3 runs with streaming state; here Catalyst merges overlapping
    * [ts, ts+gap) windows per key in a sort-based aggregate). The
    * oracle derives identical sessions relationally: a session breaks
    * where the gap to the previous event is ≥ 30 min (Spark merges
    * while the next start is strictly inside the window), so
    * cumulative-sum-of-breaks numbers the sessions. One shuffle on
    * user_id; per-user work is a sorted scan.
    */
  def qSessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  val qSessionWindowSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |           >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |sess AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start,
      |  count(*) AS n_events, round(sum(value), 2) AS session_value
      |FROM sess GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** B28 `q_variant`: Spark 4's VARIANT type — semi-structured data
    * held in the binary variant encoding instead of strings, with
    * typed path extraction (`parse_json` → `variant_get('$.a.b',
    * type)`). The entry builds a nested document from raw columns,
    * round-trips it through VARIANT, and aggregates the typed
    * extractions; the oracle recomputes from the raw columns, so any
    * loss in the encode→extract path mismatches. At scale VARIANT
    * beats repeated `get_json_object` calls: one parse, shredded
    * binary access per path, no re-tokenizing the JSON per extraction.
    */
  def qVariant(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_var")
    s.sql(
      """SELECT event_type, count(*) AS n,
        |  sum(variant_get(v, '$.meta.k', 'long')) AS sum_k,
        |  round(sum(variant_get(v, '$.val', 'double')), 2) AS sum_val
        |FROM (
        |  SELECT event_type,
        |    parse_json(to_json(named_struct(
        |      'meta', from_json(props, 'k INT'),
        |      'val', value))) AS v
        |  FROM events_var) t
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  val qVariantSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  round(sum(value), 2) AS sum_val
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** B26 `q_window_range`: a RANGE frame bounded by a calendar
    * INTERVAL — per customer, the rolling 30-day order spend ending at
    * each order's date. Distinct capability from the ROWS frames of
    * B8/B23: the frame is value-bounded (all peers at a date are
    * included, frame width varies per row), which is what rolling
    * time-window features over behavioral data actually need. One
    * shuffle on the partition key; the frame scan is a per-partition
    * sliding aggregation, never a self-join.
    */
  def qWindowRange(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_wr")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL '30' DAY PRECEDING AND CURRENT ROW), 2)
        |    AS spend_30d
        |FROM orders_wr ORDER BY o_orderkey""".stripMargin)
  }

  val qWindowRangeSql: String =
    """SELECT o_orderkey, o_custkey,
      |  round(sum(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)
      |    AS spend_30d
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** B27 `q_lateral`: correlated LATERAL subquery — top-2 orders by
    * spend for every 10th customer, the per-entity-top-k shape as ANSI
    * SQL (the DataFrame twin is B7's window rank). Spark plans the
    * correlated limit as a domain join + ranked window, fully
    * distributed.
    */
  def qLateral(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_lat")
    Tables.orders(s, d).createOrReplaceTempView("orders_lat")
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer_lat, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_lat
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) top_orders
        |WHERE c_custkey % 10 = 0
        |ORDER BY c_custkey, o_orderkey""".stripMargin)
  }

  val qLateralSql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) top_orders
      |WHERE c_custkey % 10 = 0
      |ORDER BY c_custkey, o_orderkey""".stripMargin

  /** B25 `q_recursive_cte`: WITH RECURSIVE (Spark 4's UnionLoop
    * execution) — referral-chain walk over `customer`: each odd
    * custkey roots a chain that hops to custkey*2 while that customer
    * exists, then the depth distribution rolls up. Each recursion
    * level executes as one distributed join of the previous level
    * against the (broadcastable) customer key set, and the level count
    * is log₂(max key) — so the plan is #levels bounded scans, never a
    * driver loop. For UNBOUNDED graph closure (millions of levels /
    * arbitrary components) the scale path is C16's hash-min label
    * propagation; the recursive CTE is the ANSI SQL surface for
    * hierarchy walks of bounded depth.
    */
  def qRecursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer_rc")
    s.sql(
      """WITH RECURSIVE chain AS (
        |  SELECT c_custkey AS root, c_custkey AS cur, 0 AS depth
        |  FROM customer_rc WHERE c_custkey % 2 = 1
        |  UNION ALL
        |  SELECT chain.root, c.c_custkey, chain.depth + 1
        |  FROM chain JOIN customer_rc c ON c.c_custkey = chain.cur * 2
        |)
        |SELECT depth, count(*) AS n_chains,
        |       CAST(sum(root) AS BIGINT) AS sum_roots
        |FROM chain GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val qRecursiveCteSql: String =
    """WITH RECURSIVE chain AS (
      |  SELECT c_custkey AS root, c_custkey AS cur, 0 AS depth
      |  FROM customer WHERE c_custkey % 2 = 1
      |  UNION ALL
      |  SELECT chain.root, c.c_custkey, chain.depth + 1
      |  FROM chain JOIN customer c ON c.c_custkey = chain.cur * 2
      |)
      |SELECT depth, count(*) AS n_chains,
      |       CAST(sum(root) AS BIGINT) AS sum_roots
      |FROM chain GROUP BY depth ORDER BY depth""".stripMargin

  /** B18: skew-safe exact distinct aggregation — the two-stage salted
    * plan for hot group keys. `events` has only a handful of
    * event_types over the whole stream, so a naive per-type exact
    * distinct funnels every row of a hot type through one reducer;
    * instead: stage 1 dedups (type, user) spread across reducers by the
    * (high-cardinality) user key, stage 2 counts the now-small distinct
    * sets, and the measure aggregates ride a separately-salted partial
    * pass. Identical results to the naive plan — only the shuffle shape
    * changes — so the oracle is the plain GROUP BY.
    */
  def qSkewSaltedAgg(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // stage 1: distinct pairs, shuffled by (type, user) — no hot reducer
    val distinctPairs = ev.select(col("event_type"), col("user_id")).distinct()
    val userCounts = distinctPairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"))
    // salted partial aggregation for the measures: 16-way salt splits a
    // hot type across reducers, then the tiny partials combine
    val partial = ev
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16L)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
    val measures = partial.groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"), money(sum(col("pv"))).as("total_value"))
    userCounts.join(measures, Seq("event_type"))
      .select(col("event_type"), col("n_users"), col("n_events"), col("total_value"))
      .orderBy(col("event_type"))
  }

  val qSkewSaltedAggSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** queries + oracles exported to SparkEntry. */
  /** B19 `q_percentile`: exact quantiles per group — Spark's
    * `percentile` and DuckDB's `quantile_cont` both do linear
    * interpolation over the sorted set, so exact equality holds after
    * 6-dp rounding. (The approx twin at scale is approx_percentile /
    * t-digest; exact is the oracle-able form.)
    */
  def qPercentile(s: SparkSession, d: String): DataFrame = {
    import graft.Tables
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("price_p90"))
      .orderBy(col("l_returnflag"))
  }

  val qPercentileSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 6) AS p25,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 6) AS p75,
      |  round(quantile_cont(l_extendedprice, 0.9), 6) AS price_p90
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** B20 `q_string_agg`: ordered string aggregation — collect_set +
    * array_sort + array_join gives a deterministic csv regardless of
    * shuffle order (the naive collect_list would be nondeterministic
    * across partitionings).
    */
  def qStringAgg(s: SparkSession, d: String): DataFrame = {
    import graft.Tables
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy(col("o_orderpriority"))
  }

  val qStringAggSql: String =
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |  count(DISTINCT o_orderstatus) AS n_statuses
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** B21 `q_set_ops`: INTERSECT / EXCEPT — customers having both F and
    * O orders vs only-F customers, stitched into one result. Set ops
    * plan as aggregates/joins on the key — fully keyed, no data
    * movement beyond one shuffle each.
    */
  def qSetOps(s: SparkSession, d: String): DataFrame = {
    import graft.Tables
    val o = Tables.orders(s, d)
    def custsWith(st: String) =
      o.filter(col("o_orderstatus") === st).select(col("o_custkey")).distinct()
    val both = custsWith("F").intersect(custsWith("O"))
      .withColumn("kind", lit("both"))
    val onlyF = custsWith("F").except(custsWith("O"))
      .withColumn("kind", lit("only_f"))
    both.unionByName(onlyF)
      .groupBy(col("kind")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("kind"))
  }

  val qSetOpsSql: String =
    """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
      |o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
      |u AS (
      |  SELECT 'both' AS kind, o_custkey FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
      |  UNION ALL
      |  SELECT 'only_f' AS kind, o_custkey FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o))
      |SELECT kind, count(*) AS n_customers FROM u GROUP BY kind ORDER BY kind""".stripMargin

  /** B22 `q_range_join`: interval join at scale — for each purchase,
    * count the same user's clicks in the preceding 30 minutes
    * (attribution). The naive plan is an inequality join
    * (BroadcastNestedLoopJoin, O(n²)); here both sides are bucketed
    * into 30-minute cells and equi-joined on (user, cell) for the
    * purchase's cell and its predecessor — any event within the
    * interval is in one of those two cells, so the exact interval
    * filter after the keyed join loses nothing. Shuffle is
    * O(events × 2), never O(events²).
    */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    import graft.Tables
    val e = Tables.events(s, d)
    val W = 1800000000L // 30 min in micros
    val buys = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts").as("bts"),
        expr(s"unix_micros(ts) DIV $W").as("cell0"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"),
        expr(s"unix_micros(ts) DIV $W").as("cell"))
    val probed = buys.select(col("user_id"), col("event_id"), col("bts"),
      explode(array(col("cell0"), col("cell0") - 1)).as("cell"))
    probed.join(clicks, Seq("user_id", "cell"))
      .filter(col("cts") >= col("bts") - expr(s"INTERVAL 30 MINUTE") &&
              col("cts") < col("bts"))
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_prior_clicks"))
      .orderBy(col("event_id"))
  }

  val qRangeJoinSql: String =
    """SELECT b.event_id, count(*) AS n_prior_clicks
      |FROM events b JOIN events c
      |  ON b.user_id = c.user_id
      | AND c.ts >= b.ts - INTERVAL 30 MINUTE AND c.ts < b.ts
      |WHERE b.event_type = 'purchase' AND c.event_type = 'click'
      |GROUP BY b.event_id ORDER BY b.event_id""".stripMargin

  /** B24 `q_unpivot`: wide→long reshape via the native `unpivot`
    * (melt) operator — three lineitem measure columns become
    * (measure, amount) rows, then a grouped rollup per
    * (returnflag, measure). Unpivot is a narrow projection (each input
    * row emits 3 rows, no shuffle); the only shuffle is the final
    * partial-agg'd groupBy, so the reshape itself is free at any
    * scale. Oracle spells the same reshape as a UNION ALL, the
    * engine-portable equivalent.
    */
  def qUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "measure", "amount")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), money(sum(col("amount"))).as("total"),
        round(avg(col("amount")), 6).as("avg_amount"))
      .orderBy(col("l_returnflag"), col("measure"))

  val qUnpivotSql: String =
    """WITH u AS (
      |  SELECT l_returnflag, 'l_extendedprice' AS measure, l_extendedprice AS amount FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
      |SELECT l_returnflag, measure, count(*) AS n,
      |  round(sum(amount), 2) AS total, round(avg(amount), 6) AS avg_amount
      |FROM u GROUP BY l_returnflag, measure
      |ORDER BY l_returnflag, measure""".stripMargin

  /** B30 `q7_volume` (TPC-H Q7 shape): revenue flowing between two
    * trading blocs by ship year — the SAME nation⋈region dimension
    * joined twice under different roles (supplier side, customer
    * side), a symmetric disjunctive pair filter, and year extraction.
    * Regions rather than single nations keep the pair non-vacuous at
    * every scale factor (sf0.001 has 10 suppliers). Both dimension
    * aliases broadcast; the fact tables shuffle only on their keys.
    */
  def q7Volume(s: SparkSession, d: String): DataFrame = {
    def bloc(nk: String, out: String) = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as(nk), col("r_name").as(out))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(bloc("s_nk", "supp_region")), col("s_nationkey") === col("s_nk"))
      .join(broadcast(bloc("c_nk", "cust_region")), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
        (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
      .groupBy(col("supp_region"), col("cust_region"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(money(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
  }

  val q7VolumeSql: String =
    """SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE')
      |    OR (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** B31 `q8_share` (TPC-H Q8 shape): NATION_3's market share of
    * PROMO-part revenue inside the ASIA region by order year — a
    * 6-table join tree whose result is re-aggregated into a
    * conditional-sum / total-sum ratio per group (the share), computed
    * in one aggregation pass, never a self-join.
    */
  def q8Share(s: SparkSession, d: String): DataFrame = {
    val custNation = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("c_nk"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("s_nk"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        col("supp_nation"))
      .groupBy(col("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", col("volume")).otherwise(lit(0.0))) /
          sum(col("volume")), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8ShareSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  round(sum(CASE WHEN sn.n_name = 'NATION_3'
      |                 THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END)
      |        / sum(l_extendedprice * (1.0 - l_discount)), 6) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation cnn ON c_nationkey = cnn.n_nationkey
      |JOIN region ON cnn.n_regionkey = r_regionkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** B32 `q13_histogram` (TPC-H Q13 shape): the distribution of
    * per-customer order counts INCLUDING the zero bucket — a LEFT
    * OUTER join feeding two stacked aggregations (count per customer,
    * then customers per count). The zero bucket is exactly what an
    * inner join would silently lose.
    */
  def q13Histogram(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  val q13HistogramSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** B33 `q15_top_supplier` (TPC-H Q15 shape): the supplier(s) whose
    * quarterly revenue equals the global maximum — an aggregate OF an
    * aggregate (max over per-supplier sums) matched back by equality,
    * tie-safe by construction. Revenue is rounded BEFORE the max on
    * both engines so the equality compares identical values.
    */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    // rev feeds BOTH the global max and the equality match; without the
    // eager checkpoint each consumer re-plans the whole fact aggregation
    // (the r13 post-execution plan showed two identical lineitem scans +
    // shuffles — AQE does not reuse across these subtrees). rev is
    // |suppliers| rows — supplier-dimension-sized at any SF.
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(money(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("total_revenue"))
      .localCheckpoint(true)
    val top = rev.agg(max(col("total_revenue")).as("mx"))
    Tables.supplier(s, d)
      .join(rev, col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(top), col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** B34 `q18_bigorders` (TPC-H Q18 shape): large-volume orders — a
    * HAVING filter over a grouped fact aggregation whose survivors are
    * joined BACK to the detail tables for full rows. The big
    * aggregation is one map-side-combined shuffle on the order key.
    * The having-survivor set is TINY under TPC-H semantics, but it is
    * derived from the fact table, so its size is a data property, not
    * a schema guarantee — no broadcast hint; AQE sees the runtime size
    * and picks broadcast when it fits (the same deliberate policy as
    * q3/q5's dimension-derived sides), which is the uniformly
    * scale-safe choice at 100 TB.
    */
  def q18BigOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(money(sum(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 300.0)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        money(col("o_totalprice")).as("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val q18BigOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300.0)
      |SELECT c_custkey, c_name, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      |  round(o_totalprice, 2) AS o_totalprice, total_qty
      |FROM orders JOIN big ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  /** B35: waiting-supplier report (TPC-H Q21 plan shape adapted to the
    * sandbox schema, which carries no l_receiptdate/l_commitdate —
    * "late" is ship-lag > 180 days after the order date). The shape
    * under test: the SAME projected fact leg consumed three times —
    * once as the probe, once as a LEFT SEMI (some OTHER supplier
    * shipped on the order) and once as a LEFT ANTI (no OTHER supplier
    * shipped late) — each an equi-join on l_orderkey with a residual
    * `suppkey <>` inequality, never a nested loop. The shared leg is
    * materialized once (eager checkpoint, r13) — the planner does NOT
    * reuse the exchange across the probe/semi/anti consumers, so the
    * unchecked form executed the fact join three times; supplier is
    * joined un-hinted (it grows with SF — AQE broadcasts it while it
    * fits, the q3/q5 policy).
    * Reference parity: the multi-EXISTS SQL surface of
    * /root/reference/src/test/scala/org/apache/spark/sql/iceberg/AbstractTest.scala
    * generalized to the classic waiting-supplier chain.
    */
  def q21Waiting(s: SparkSession, d: String): DataFrame = {
    // the projected fact leg is consumed THREE times (probe, semi,
    // anti); without the eager materialization each leg re-planned the
    // lineitem⋈orders join (3 scans of each table in the r13
    // before-plan — AQE does not reuse across the legs). Narrow
    // projection first (two keys + one boolean), then materialize once.
    // Fault-tolerant persist, not localCheckpoint (r14): this leg is
    // FACT-cardinality — lineage must survive executor loss at 100 TB
    // (graft.Mat; the dimension-sized q15/q11 aggregates keep their
    // checkpoints).
    val base = graft.Mat.fact(Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 180).as("late")))
    val l1 = base.filter(col("late"))
    val others = base.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOthers = l1.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    l1.join(others,
        col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"), "leftsemi")
      .join(lateOthers,
        col("l_orderkey") === col("ok3") && col("l_suppkey") =!= col("sk3"), "leftanti")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  val q21WaitingSql: String =
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey,
      |    date_diff('day', o_orderdate, l_shipdate) > 180 AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, count(*) AS numwait
      |FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM l l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin

  /** B36: idle high-balance customers (TPC-H Q22 plan shape; the
    * sandbox schema has no c_phone, so the "country-prefix" predicate
    * becomes a mktsegment filter and "no orders" becomes "no orders
    * since 2000-01-01" — every customer has SOME order in this
    * generator). The shape under test: an uncorrelated scalar
    * aggregate (global avg of positive balances) broadcast into the
    * filter, composed with a LEFT ANTI join against the filtered
    * orders — the NOT EXISTS decorrelation — then a grouped rollup.
    * The scalar side is a one-row broadcast at any SF; the anti join
    * shuffles on custkey only.
    */
  def q22IdleCustomers(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val avgPos = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.join(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "leftanti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
           money(sum(col("c_acctbal"))).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  val q22IdleCustomersSql: String =
    """SELECT c_mktsegment, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** B37: disjunctive-predicate join (TPC-H Q19 plan shape; no
    * p_container / l_shipmode in the sandbox schema, so the brand ×
    * size × quantity arms carry the disjunction). The shape under
    * test: an OR-of-ANDs join predicate where the planner must still
    * extract the common `l_partkey = p_partkey` equi-key and evaluate
    * the disjunction as a residual join filter — a hash join, never
    * the nested-loop a naive OR-join plans. part is un-hinted (grows
    * with SF; AQE broadcasts while it fits).
    */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p  = Tables.part(s, d)
    val arm1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 15) && col("l_quantity").between(1, 21)
    val arm2 = col("p_brand") === "Brand#23" &&
      col("p_size").between(1, 25) && col("l_quantity").between(10, 30)
    val arm3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(1, 35) && col("l_quantity").between(20, 40)
    li.join(p, col("l_partkey") === col("p_partkey") && (arm1 || arm2 || arm3))
      .agg(money(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue"),
           count(lit(1)).as("matched_rows"))
  }

  val q19DisjunctiveSql: String =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  count(*) AS matched_rows
      |FROM lineitem JOIN part ON l_partkey = p_partkey AND (
      |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
      |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
      |  OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40))""".stripMargin

  /** B38 `q2_min_cost` (TPC-H Q2 plan shape; the sandbox schema has no
    * partsupp, so the part×supplier cost surface is DERIVED from the
    * fact table: min observed unit price per (partkey, suppkey)). The
    * shape under test: a per-group minimum computed over a join-derived
    * surface, with the full supplier rows recovered by an equality
    * filter against that minimum — Q2's correlated MIN subquery
    * decorrelated as min-over-window (since r13; the earlier
    * aggregate-then-rejoin form planned the cost subtree twice). The
    * cost surface stays an UNROUNDED double end to end: min() is
    * order-independent, so the equality compares bit-identical values
    * on both engines. region/nation dims are broadcast (fixed size),
    * supplier joins un-hinted (AQE).
    */
  def q2MinCost(s: SparkSession, d: String): DataFrame = {
    val ps = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
    val eu = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // unit_cost stays the RAW min double: min() is order-independent so
    // both engines hold bit-identical values, and a cosmetic 2-dp round
    // would flip on the .xx5 ties that 2-dp-price / even-qty quotients
    // produce constantly (observed at sf0.1).
    // min-over-window instead of aggregate-then-rejoin (r13
    // optimization): the rejoin form planned the whole ps⋈eu subtree —
    // including the fact-table groupBy — TWICE with no exchange reuse
    // (9 scans in the before-plan, plans/r13/q2_min_cost_before.txt);
    // the window computes the same per-part min from one pass and the
    // equality filter keeps bit-identical rows (same min over the same
    // doubles).
    val cost = ps.join(eu, col("l_suppkey") === col("s_suppkey"))
    val wMin = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    cost.withColumn("min_cost", min(col("unit_cost")).over(wMin))
      .filter(col("unit_cost") === col("min_cost"))
      .join(Tables.part(s, d).filter(col("p_type") === "LARGE" && col("p_size") <= 25),
        col("p_partkey") === col("l_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"), col("n_name"),
        money(col("s_acctbal")).as("s_acctbal"), col("unit_cost"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  val q2MinCostSql: String =
    """WITH ps AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      |cost AS (
      |  SELECT ps.*, eu.s_name, eu.s_acctbal, eu.n_name
      |  FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey),
      |mn AS (SELECT l_partkey AS mk, min(unit_cost) AS min_cost FROM cost GROUP BY l_partkey)
      |SELECT p_partkey, p_name, s_name, n_name, round(s_acctbal, 2) AS s_acctbal, unit_cost
      |FROM cost JOIN mn ON l_partkey = mk AND unit_cost = min_cost
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_type = 'LARGE' AND p_size <= 25
      |ORDER BY p_partkey, s_name""".stripMargin

  /** B39 `q4_priority` (TPC-H Q4 plan shape; no l_commitdate /
    * l_receiptdate in the sandbox — "late" is shipping >60 days after
    * the order date). The shape under test: an EXISTS whose correlated
    * predicate references BOTH sides (l_shipdate vs o_orderdate), so
    * the semi-join carries a residual non-equi condition on top of the
    * orderkey equi-key, feeding a priority histogram. One shuffle on
    * the order key; the date arithmetic is integer-day, float-exact on
    * both engines.
    */
  def q4Priority(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-07-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("lk"), col("l_shipdate"))
    ord.join(li,
        col("lk") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "leftsemi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** B40 `q9_profit` (TPC-H Q9 plan shape; no ps_supplycost — the cost
    * leg is a deterministic proxy, 10% of the part's retail price per
    * unit). The shape under test: a LIKE-filtered dimension driving a
    * 5-table join with a computed measure that mixes columns from
    * three tables, grouped by (nation, year). part is LIKE-filtered
    * then un-hinted (SF-proportional; AQE broadcasts while it fits),
    * nation broadcast, one fact shuffle on each join key.
    */
  def q9Profit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").like("%widget%")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
      // The per-line measure is an EXACT 4-dp decimal in real arithmetic
      // (2-dp price × 2-dp discount factor, minus 3-dp cost × integer
      // qty), so both engines recover the identical DECIMAL(18,4) from
      // the double product and the sum is exact integer arithmetic —
      // order-independent, no ULP flip at the 2-dp rounding boundary
      // (a double sum here differed between engines by 1 ulp).
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        lit(0.1) * col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")), 2)
        .cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)

  val q9ProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** B41 `q10_returns` (TPC-H Q10 shape): top-20 customers by revenue
    * lost to returned items in a quarter — a returnflag-filtered fact
    * joined through orders to customer + nation, grouped on the full
    * customer row, top-N with the customer key as the tiebreak. The
    * grouped key set is wide (5 columns) but functionally determined
    * by c_custkey — one shuffle, no re-join needed.
    */
  def q10Returns(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") <  lit("1996-04-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      // DECIMAL(18,4) sum: the per-line revenue is an exact 4-dp value,
      // so the decimal sum is order-independent on both engines (see
      // q9Profit — a double sum here flipped a 2-dp rounding boundary).
      // Round while STILL decimal: an exact ....5950 sum is a genuine
      // 2-dp tie, and decimal rounding is half-up on both engines,
      // where double rounding sees the binary sub-half value.
      .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        money(col("c_acctbal")).as("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  val q10ReturnsSql: String =
    """SELECT c_custkey, c_name, CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
      |  round(c_acctbal, 2) AS c_acctbal, n_name
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** B42 `q11_important_stock` (TPC-H Q11 plan shape; no partsupp —
    * the "stock" surface is the quantity shipped per part by the
    * filtered nation group). The shape under test: a grouped aggregate
    * filtered by a scalar aggregate OVER ITS OWN RESULT (HAVING
    * part_qty > 1.5 × avg) — the threshold is computed once, broadcast
    * into the filter, never recomputed per row. Quantities are
    * integer-valued doubles, so sums and the avg are float-exact on
    * both engines at any scale (the original Q11 fraction is
    * SF-dependent; 1.5 × mean is the scale-free equivalent).
    */
  def q11ImportantStock(s: SparkSession, d: String): DataFrame = {
    val sn = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    // value feeds both the threshold aggregate and the filter; the
    // eager checkpoint materializes the fact aggregation ONCE (the
    // unchecked form planned the lineitem semi-join + groupBy twice —
    // same finding as q15/q2, r13 optimization). |parts| rows at any SF.
    val value = Tables.lineitem(s, d)
      .join(sn, col("l_suppkey") === col("s_suppkey"), "leftsemi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("pq"))
      .localCheckpoint(true)
    val thresh = value.agg((lit(1.5) * avg(col("pq"))).as("t"))
    value.join(broadcast(thresh))
      .filter(col("pq") > col("t"))
      .select(col("l_partkey").as("p_partkey"), money(col("pq")).as("part_qty"))
      .orderBy(col("part_qty").desc, col("p_partkey"))
  }

  val q11ImportantStockSql: String =
    """WITH sn AS (
      |  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_1','NATION_2','NATION_3')),
      |val AS (
      |  SELECT l_partkey, sum(l_quantity) AS part_qty
      |  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM sn)
      |  GROUP BY l_partkey)
      |SELECT l_partkey AS p_partkey, round(part_qty, 2) AS part_qty
      |FROM val WHERE part_qty > (SELECT 1.5 * avg(part_qty) FROM val)
      |ORDER BY part_qty DESC, p_partkey""".stripMargin

  /** B43 `q14_promo` (TPC-H Q14 shape): the promo share of one
    * month's revenue — a date-sliced fact ⋈ part feeding a single
    * conditional-sum / total-sum ratio with NO group key (one output
    * row). The month filter is pushed to the scan; part joins
    * un-hinted (AQE broadcasts while it fits).
    */
  def q14Promo(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      // Both sums are exact DECIMAL(18,4) (order-independent); only the
      // final division runs in doubles — one deterministic operation on
      // identical inputs in both engines.
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).otherwise(lit(0.0))
          .cast("decimal(18,4)")).cast("double") /
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 6).as("promo_revenue"))

  val q14PromoSql: String =
    """SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
      |       / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin

  /** B44 `q16_parts_supplier` (TPC-H Q16 plan shape; the part×supplier
    * surface is the distinct fact pairs, and the "complaints" supplier
    * exclusion is the deterministic low-balance list). The shape under
    * test: NOT IN decorrelated to a LEFT ANTI against a derived
    * exclusion list, feeding a count(DISTINCT) over a three-column
    * group — two shuffles (pair-distinct, then group), the exclusion
    * side broadcast by AQE.
    */
  def q16PartsSupplier(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 1000.0).select(col("s_suppkey"))
    pairs
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "leftanti")
      .join(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16PartsSupplierSql: String =
    """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
      |SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM pairs
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** B45 `q17_small_qty` (TPC-H Q17 shape): revenue that would be lost
    * by dropping small-quantity lines — a CORRELATED per-part average
    * (each line compares against ITS part's avg quantity), decorrelated
    * to a per-part window over the brand-joined lines (since r13; the
    * earlier aggregate-then-rejoin scanned the fact table twice and
    * shuffled every part's average). Distinct from
    * B12/`q_subquery_avg`, whose scalar subquery is uncorrelated
    * (one global threshold). Quantities are integer-valued doubles, so
    * the per-part avg and the 0.5× threshold are float-exact on both
    * engines — the inequality cannot flip between them.
    */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    // the correlated per-part avg as a window OVER the Brand#5-joined
    // lines (r13 optimization): the part join keeps EVERY line of a
    // matching part, so the window sees the part's complete line set
    // and equals the old full-fact aggregate-then-rejoin — which
    // scanned lineitem twice and shuffled the per-part avg of ALL
    // parts, not just the brand's. avg of integer-valued doubles is
    // order-independent, so the inequality cannot flip.
    val wPart = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_brand") === "Brand#5"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty", avg(col("l_quantity")).over(wPart))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      // 2-dp prices sum exactly as DECIMAL(18,4) — order-independent.
      .agg(money(sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") / 7.0)
        .as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17SmallQtySql: String =
    """WITH pa AS (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty FROM lineitem GROUP BY l_partkey)
      |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS avg_yearly, count(*) AS n_lines
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN pa ON pk = l_partkey
      |WHERE p_brand = 'Brand#5' AND l_quantity < 0.5 * avg_qty""".stripMargin

  /** B46 `q20_potential` (TPC-H Q20 plan shape; no ps_availqty — the
    * correlated "excess stock" test becomes "shipped more than half
    * its all-time volume of this part inside 1996", a per-pair
    * conditional-sum vs total-sum comparison). The shape under test:
    * DOUBLE-NESTED semi-joins — suppliers IN (pairs whose correlated
    * aggregate clears the threshold AND whose part IN a LIKE-filtered
    * list) — each nesting level a LEFT SEMI, the innermost list
    * broadcast. Quantity sums are float-exact; the final nation filter
    * and ordering are fully deterministic.
    */
  def q20Potential(s: SparkSession, d: String): DataFrame = {
    val smallParts = Tables.part(s, d)
      .filter(col("p_name").like("small%")).select(col("p_partkey"))
    val sp = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(when(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                 col("l_shipdate") <  lit("1997-01-01").cast("timestamp"),
          col("l_quantity")).otherwise(lit(0.0))).as("qty_96"),
        sum(col("l_quantity")).as("qty_all"))
    val surplus = sp.filter(col("qty_96") > lit(0.5) * col("qty_all"))
      .join(smallParts, col("l_partkey") === col("p_partkey"), "leftsemi")
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(surplus, col("s_suppkey") === col("l_suppkey"), "leftsemi")
      .join(broadcast(Tables.nation(s, d).filter(col("n_nationkey") < 13)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
      .orderBy(col("s_suppkey"))
  }

  val q20PotentialSql: String =
    """WITH sp AS (
      |  SELECT l_partkey, l_suppkey,
      |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |             THEN l_quantity ELSE 0 END) AS qty_96,
      |    sum(l_quantity) AS qty_all
      |  FROM lineitem GROUP BY l_partkey, l_suppkey),
      |surplus AS (
      |  SELECT DISTINCT l_suppkey FROM sp
      |  WHERE qty_96 > 0.5 * qty_all
      |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'))
      |SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (SELECT l_suppkey FROM surplus)
      |  AND n_nationkey < 13
      |ORDER BY s_suppkey""".stripMargin

  /** B47 `q12_shipmode` (TPC-H Q12 plan shape — the last of the 22; no
    * l_shipmode / l_commitdate / l_receiptdate in the sandbox, so the
    * ship mode is a deterministic derivation from the line number and
    * "late" is shipping >30 days after the order date). The shape under
    * test: the GROUP key comes from the fact side while the conditional
    * measure tests the JOINED dimension's attribute (o_orderpriority
    * split into urgent/other counts) — a fact→orders equi-join with a
    * residual cross-side date predicate, feeding a two-arm conditional
    * histogram over a 3-value derived key. One shuffle on the order
    * key (AQE picks the join side); all measures are integer counts —
    * exact on both engines.
    */
  def q12ShipMode(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey").as("lk"), col("l_shipdate"),
        when(pmod(col("l_linenumber"), lit(3)) === 0, "AIR")
          .when(pmod(col("l_linenumber"), lit(3)) === 1, "SHIP")
          .otherwise("TRUCK").as("ship_mode"))
    Tables.orders(s, d)
      .join(li, col("lk") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("ship_mode"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_mode"))
  }

  val q12ShipModeSql: String =
    """SELECT
      |  CASE l_linenumber % 3 WHEN 0 THEN 'AIR' WHEN 1 THEN 'SHIP' ELSE 'TRUCK' END AS ship_mode,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      |GROUP BY 1 ORDER BY ship_mode""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q12_shipmode"    -> (q12ShipMode _),
    "q2_min_cost"     -> (q2MinCost _),
    "q4_priority"     -> (q4Priority _),
    "q9_profit"       -> (q9Profit _),
    "q10_returns"     -> (q10Returns _),
    "q11_important_stock" -> (q11ImportantStock _),
    "q14_promo"       -> (q14Promo _),
    "q16_parts_supplier" -> (q16PartsSupplier _),
    "q17_small_qty"   -> (q17SmallQty _),
    "q20_potential"   -> (q20Potential _),
    "q21_waiting"     -> (q21Waiting _),
    "q22_idle_customers" -> (q22IdleCustomers _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q7_volume"       -> (q7Volume _),
    "q8_share"        -> (q8Share _),
    "q13_histogram"   -> (q13Histogram _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q18_bigorders"   -> (q18BigOrders _),
    "q_unpivot"         -> (qUnpivot _),
    "q_range_join"      -> (qRangeJoin _),
    "q_percentile"      -> (qPercentile _),
    "q_string_agg"      -> (qStringAgg _),
    "q_set_ops"         -> (qSetOps _),
    "q1_agg"            -> (q1Agg _),
    "q3_join"           -> (q3Join _),
    "q5_multijoin"      -> (q5MultiJoin _),
    "q6_filter_agg"     -> (q6FilterAgg _),
    "q_semi_join"       -> (qSemiJoin _),
    "q_anti_join"       -> (qAntiJoin _),
    "q_window_rank"     -> (qWindowRank _),
    "q_window_running"  -> (qWindowRunning _),
    "q_window_lag"      -> (qWindowLag _),
    "q_rollup"          -> (qRollup _),
    "q_distinct"        -> (qDistinct _),
    "q_topk"            -> (qTopK _),
    "q_subquery_avg"    -> (qSubqueryAvg _),
    "q_events_window"   -> (qEventsWindow _),
    "q_conditional_agg" -> (qConditionalAgg _),
    "q_asof_join"       -> (qAsOfJoin _),
    "q_json_extract"    -> (qJsonExtract _),
    "q_cube"            -> (qCube _),
    "q_recursive_cte"   -> (qRecursiveCte _),
    "q_window_range"    -> (qWindowRange _),
    "q_lateral"         -> (qLateral _),
    "q_variant"         -> (qVariant _),
    "q_session_window"  -> (qSessionWindow _),
    "q_skew_salted_agg" -> (qSkewSaltedAgg _))

  val oracles: Map[String, String] = Map(
    "q12_shipmode"    -> q12ShipModeSql,
    "q2_min_cost"     -> q2MinCostSql,
    "q4_priority"     -> q4PrioritySql,
    "q9_profit"       -> q9ProfitSql,
    "q10_returns"     -> q10ReturnsSql,
    "q11_important_stock" -> q11ImportantStockSql,
    "q14_promo"       -> q14PromoSql,
    "q16_parts_supplier" -> q16PartsSupplierSql,
    "q17_small_qty"   -> q17SmallQtySql,
    "q20_potential"   -> q20PotentialSql,
    "q21_waiting"     -> q21WaitingSql,
    "q22_idle_customers" -> q22IdleCustomersSql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q7_volume"       -> q7VolumeSql,
    "q8_share"        -> q8ShareSql,
    "q13_histogram"   -> q13HistogramSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q18_bigorders"   -> q18BigOrdersSql,
    "q_unpivot"         -> qUnpivotSql,
    "q_range_join"      -> qRangeJoinSql,
    "q_percentile"      -> qPercentileSql,
    "q_string_agg"      -> qStringAggSql,
    "q_set_ops"         -> qSetOpsSql,
    "q1_agg"            -> q1AggSql,
    "q3_join"           -> q3JoinSql,
    "q5_multijoin"      -> q5MultiJoinSql,
    "q6_filter_agg"     -> q6FilterAggSql,
    "q_semi_join"       -> qSemiJoinSql,
    "q_anti_join"       -> qAntiJoinSql,
    "q_window_rank"     -> qWindowRankSql,
    "q_window_running"  -> qWindowRunningSql,
    "q_window_lag"      -> qWindowLagSql,
    "q_rollup"          -> qRollupSql,
    "q_distinct"        -> qDistinctSql,
    "q_topk"            -> qTopKSql,
    "q_subquery_avg"    -> qSubqueryAvgSql,
    "q_events_window"   -> qEventsWindowSql,
    "q_conditional_agg" -> qConditionalAggSql,
    "q_asof_join"       -> qAsOfJoinSql,
    "q_json_extract"    -> qJsonExtractSql,
    "q_cube"            -> qCubeSql,
    "q_recursive_cte"   -> qRecursiveCteSql,
    "q_window_range"    -> qWindowRangeSql,
    "q_lateral"         -> qLateralSql,
    "q_variant"         -> qVariantSql,
    "q_session_window"  -> qSessionWindowSql,
    "q_skew_salted_agg" -> qSkewSaltedAggSql)
}
