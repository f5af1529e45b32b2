package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.DetMathSql

import Ops._

/** Relational query catalog over the driver testdata — re-expresses every
  * operator family from SURVEY.md §2 (scans, projections/casts, filters,
  * dedup-window, joins, aggregates, windows, sorts/top-k, set ops, scalar
  * functions) plus the analytics surface the reference delegates to Athena
  * (`README.md:33,67`) and the declared gold layer (`README.md:130`).
  *
  * Scale posture: dimension joins broadcast; fact-fact joins shuffle on the
  * join key with AQE; every aggregate is a built-in hash agg with map-side
  * partial aggregation; filters/projections push into the Parquet scans.
  */
object Relational {

  val defs: Seq[QueryDef] = Seq(

    // ── Aggregation core (§2.6 A1-A3; TPC-H Q1 shape) ──────────────────
    QueryDef("q01_pricing_summary", (s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          // scale 6: price*(1-disc)*(1+tax) has exactly 6 decimals (2+2+2),
          // so no rounding happens — scale 4 would hit round-half ties where
          // Spark (HALF_UP) and DuckDB (HALF_EVEN) disagree.
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)/COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""),
      notes = "SURVEY §2.6 A3, §2.10 X8; TPC-H Q1 shape"),

    // ── Filter + projection (§2.4 F1, §2.3 P1) ─────────────────────────
    QueryDef("q02_filter_project", (s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_discount") >= 0.05 &&
          col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             l_extendedprice*(1-l_discount) AS revenue
      FROM lineitem
      WHERE l_quantity > 45 AND l_discount >= 0.05
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"""),
      notes = "SURVEY §2.4 F1 conjunction + comparison; pushdown-checked"),

    // ── IN-list filters (§2.4 F2/F3) ───────────────────────────────────
    QueryDef("q03_filter_in", (s, d) => {
      t(s, d, "orders")
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_orderstatus").isin("O", "F"))
        .select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_orderpriority, o_orderstatus
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        AND o_orderstatus IN ('O','F')"""),
      notes = "SURVEY §2.4 F2/F3 isin"),

    // ── CASE curation (§2.3 P4) ────────────────────────────────────────
    QueryDef("q04_case_curate", (s, d) => {
      t(s, d, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderstatus") === "O", "OPEN")
          .when(col("o_orderstatus") === "F", "FULFILLED")
          .when(col("o_orderstatus") === "P", "PARTIAL")
          .otherwise("UNKNOWN").as("status_curated"))
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
        CASE WHEN o_orderstatus='O' THEN 'OPEN'
             WHEN o_orderstatus='F' THEN 'FULFILLED'
             WHEN o_orderstatus='P' THEN 'PARTIAL'
             ELSE 'UNKNOWN' END AS status_curated
      FROM orders"""),
      notes = "SURVEY §2.3 P4 when/otherwise chain (silver curate_status shape)"),

    // ── Cast / derive (§2.3 P1, P3) ────────────────────────────────────
    QueryDef("q05_cast_derive", (s, d) => {
      t(s, d, "orders").select(
        col("o_orderkey"),
        // cast through DECIMAL(12,2) (the P1 semantics under test), then
        // surface as DOUBLE per the determinism contract (QueryDef) — the
        // oracle harness fetches DuckDB decimals as float64, so a DECIMAL
        // output column hash-mismatches even when every value is equal
        // (CORRECTNESS_r01 q05).
        col("o_totalprice").cast("decimal(12,2)").cast("double").as("total_dec"),
        col("o_orderdate").cast("date").as("o_date"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    }, Some("""
      SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_dec,
        CAST(o_orderdate AS DATE) AS o_date,
        CAST(year(o_orderdate) AS BIGINT) AS o_year
      FROM orders"""),
      notes = "SURVEY §2.3 P1 cast to Decimal(12,2) + P3 to_date (bronze cast_dtypes shape)"),

    // ── String normalisation (§2.3 P2, bug-B1-fixed semantics) ─────────
    QueryDef("q06_normalise_strings", (s, d) => {
      t(s, d, "customer").select(
        col("c_custkey"),
        upper(trim(col("c_name"))).as("name_norm"),
        lower(col("c_mktsegment")).as("segment_lower"),
        length(col("c_name")).cast("long").as("name_len"))
    }, Some("""
      SELECT c_custkey,
        UPPER(TRIM(c_name)) AS name_norm,
        LOWER(c_mktsegment) AS segment_lower,
        CAST(LENGTH(c_name) AS BIGINT) AS name_len
      FROM customer"""),
      notes = "SURVEY §2.3 P2 normalise_strings intended semantics (B1 fix)"),

    // ── Dedup keep-latest (§2.7 W1 + §2.4 F4 + §2.3 P5) ────────────────
    QueryDef("q07_dedup_latest", (s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .withColumn("row_num", row_number().over(w))
        .filter(col("row_num") === 1)
        .drop("row_num")
        .select("user_id", "event_id", "event_type", "value")
    }, Some("""
      SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS row_num
        FROM events) WHERE row_num = 1"""),
      notes = "SURVEY §2.7 W1 dedup window, deterministic tiebreak (B3)"),

    // ── Top-k per group (§2.8 argmax-per-group generalized) ────────────
    QueryDef("q08_topk_per_group", (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        FROM orders) WHERE rn <= 3"""),
      notes = "top-3 per customer; single window shuffle"),

    // ── Analytic lag (§2.7 extension: lead/lag surface) ────────────────
    QueryDef("q09_window_lag", (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
             lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
      FROM orders"""),
      notes = "lag analytic window"),

    // ── Running total (explicit ROWS frame) ────────────────────────────
    QueryDef("q10_running_total", (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
          .cast("double").as("run_total"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
      FROM orders"""),
      notes = "running decimal-exact sum, explicit ROWS frame"),

    // ── Broadcast dimension joins (§2.5 analytics surface) ─────────────
    QueryDef("q11_join_dims", (s, d) => {
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select("c_custkey", "c_name", "n_name", "r_name")
    }, Some("""
      SELECT c_custkey, c_name, n_name, r_name
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey"""),
      notes = "broadcast hash joins — dims never shuffle the fact side"),

    // ── Multi-join aggregate (gold revenue-by-nation shape) ────────────
    QueryDef("q12_revenue_by_nation", (s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n = broadcast(t(s, d, "nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
    }, Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(DISTINCT o_orderkey) AS n_orders
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name"""),
      notes = "fact-fact shuffle join on orderkey + broadcast dims; AQE-sized"),

    // ── TPC-H Q3 shape: filtered join + agg + global top-k ─────────────
    QueryDef("q13_top_unshipped", (s, d) => {
      val cutoff = lit("1997-06-01").cast("timestamp")
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < cutoff)
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > cutoff)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }, Some("""
      SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
        AND l_shipdate  > TIMESTAMP '1997-06-01 00:00:00'
      GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10"""),
      notes = "TPC-H Q3 shape; deterministic total order on the top-k"),

    // ── Semi / anti joins ──────────────────────────────────────────────
    QueryDef("q14_semi_join", (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    }, Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')"""),
      notes = "left_semi join = EXISTS"),

    QueryDef("q15_anti_join", (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }, Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')"""),
      notes = "left_anti join = NOT EXISTS (complement of q14)"),

    // ── Outer join + aggregate ─────────────────────────────────────────
    QueryDef("q16_outer_join_agg", (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spent"))
    }, Some("""
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey"""),
      notes = "left outer join preserving empty customers"),

    // ── Distinct (§2.6 A2 / §2.3 P6) ───────────────────────────────────
    QueryDef("q17_distinct", (s, d) => {
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()
    }, Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"),
      notes = "SURVEY §2.6 A2 distinct"),

    // ── Global top-k (§2.8) ────────────────────────────────────────────
    QueryDef("q18_topk_orders", (s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""),
      notes = "TakeOrderedAndProject — no full sort at scale"),

    // ── Set operations (§2.9) ──────────────────────────────────────────
    QueryDef("q19_union_distinct", (s, d) => {
      val cn = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.union(sn).distinct()
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey AS nationkey FROM supplier"""),
      notes = "union + distinct = SQL UNION"),

    QueryDef("q19b_intersect", (s, d) => {
      val cn = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn)
    }, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier"""),
      notes = "intersect"),

    // ── EXCEPT ALL (multiset difference — completes the set-op family) ─
    QueryDef("q19c_except_all", (s, d) => {
      val cn = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.exceptAll(sn)
        .groupBy("nationkey").agg(count(lit(1)).as("n")) // stable multiset view
    }, Some("""
      SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier)
      GROUP BY nationkey"""),
      notes = "EXCEPT ALL multiset semantics, aggregated to a deterministic per-key view"),

    // ── Unpivot (inverse of q28's pivot; stack/UNPIVOT reshape) ────────
    QueryDef("q28b_unpivot", (s, d) => {
      t(s, d, "customer")
        .select(col("c_custkey"),
          expr("stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE)) AS (metric, value)"))
        // stack keeps NULL values; SQL UNPIVOT (the oracle) excludes them
        // by default — align semantics explicitly
        .filter(col("value").isNotNull)
    }, Some("""
      SELECT c_custkey, metric, value FROM (
        SELECT c_custkey, c_acctbal AS acctbal,
               CAST(c_nationkey AS DOUBLE) AS nationkey
        FROM customer)
      UNPIVOT (value FOR metric IN (acctbal, nationkey))"""),
      notes = "wide→long reshape via stack ≡ SQL UNPIVOT (inverse of q28 pivot)"),

    // ── Rollup / cube (gold superset) ──────────────────────────────────
    QueryDef("q20_rollup", (s, d) => {
      t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"))
    }, Some("""
      SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
             COALESCE(l_linestatus, 'ALL') AS linestatus,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"""),
      notes = "rollup grouping sets"),

    QueryDef("q21_cube", (s, d) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
          col("n"))
    }, Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
             COALESCE(o_orderpriority, 'ALL') AS orderpriority,
             COUNT(*) AS n
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""),
      notes = "cube grouping sets"),

    // ── Statistical aggregates (decimal-exact moments) ─────────────────
    QueryDef("q22_stats", (s, d) => {
      val sumQ = dsum(col("l_quantity"), 6)
      val sumSq = dsum(col("l_quantity") * col("l_quantity"), 6)
      val n = count(lit(1))
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          n.as("n"),
          sumQ.as("sum_qty"),
          // sample variance from exact decimal moments, assembled in DOUBLE;
          // undefined (NULL) for 1-row groups — ANSI throws on the n-1=0
          // division that IEEE would have turned into Infinity
          when(n > 1, (sumSq - sumQ * sumQ / n) / (n - lit(1)))
            .otherwise(lit(null).cast("double")).as("var_qty"))
    }, Some("""
      SELECT l_returnflag,
        MIN(l_quantity) AS min_qty,
        MAX(l_quantity) AS max_qty,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        CASE WHEN COUNT(*) > 1 THEN
          (CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(18,6))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1)
        ELSE NULL END AS var_qty
      FROM lineitem GROUP BY l_returnflag"""),
      notes = "variance from exact decimal moments — order-insensitive across engines"),

    // ── Scalar function zoo (§2.10 X1-X13 + strings/math) ──────────────
    QueryDef("q23_scalar_zoo", (s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        upper(col("p_brand")).as("brand_upper"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        abs(col("p_retailprice") - 1000.0).as("price_dist"),
        (col("p_size") % 7).cast("long").as("size_mod"),
        coalesce(col("p_brand"), lit("?")).as("brand_nn"))
    }, Some("""
      SELECT p_partkey,
        concat_ws('/', p_brand, p_type) AS brand_type,
        substring(p_name, 1, 8) AS name_prefix,
        CAST(length(p_name) AS BIGINT) AS name_len,
        upper(p_brand) AS brand_upper,
        regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        abs(p_retailprice - 1000.0) AS price_dist,
        CAST(p_size % 7 AS BIGINT) AS size_mod,
        COALESCE(p_brand, '?') AS brand_nn
      FROM part"""),
      notes = "scalar function surface (§2.10)"),

    // ── Date/time functions ────────────────────────────────────────────
    QueryDef("q24_date_funcs", (s, d) => {
      t(s, d, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch95"))
    }, Some("""
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS BIGINT) AS o_year,
        CAST(month(o_orderdate) AS BIGINT) AS o_month,
        CAST(day(o_orderdate) AS BIGINT) AS o_day,
        CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
          AS days_since_epoch95
      FROM orders"""),
      notes = "temporal scalar functions (§2.10 X3/X4 family)"),

    // ── Event-time tumbling window (streaming-shaped batch agg) ────────
    QueryDef("q25_events_daily", (s, d) => {
      // ts arrives as nanos-since-epoch LONG (nanosAsLong read path).
      // FLOOR-divide to micros = DuckDB's epoch_ns(ts)//1000 exactly:
      // `div` truncates toward zero, so pre-1970 (negative) nanos need the
      // -1 correction when not on a whole microsecond.
      t(s, d, "events")
        .groupBy(
          to_date(timestamp_micros(
            expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
            .as("day"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("value")).as("total_value"),
          countDistinct(col("user_id")).as("n_users"))
    }, Some("""
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY 1, 2"""),
      notes = "tumbling daily window as batch groupBy (streaming twin in graft.streaming)"),

    // ── Sliding event-time windows (30 min window, 15 min slide) ───────
    // The sliding counterpart of q25's tumbling day: every event lands in
    // exactly window/slide = 2 windows, generated by explicit floor-div
    // bucket arithmetic (the MicrosFloorDivSpec-pinned q25/q26 pattern)
    // instead of the built-in `window()` struct — bucket starts stay
    // BIGINT micros, bit-identical to the DuckDB `//` twin even for
    // pre-1970 timestamps, so the query is fully hash-gated. Shape: one
    // narrow 2× explode then a (window, type)-keyed hash-agg with
    // map-side partials — the overlap tax is the bounded ×2 fan-out, the
    // shuffle carries only group rows. The streaming twin is a
    // `window(col, "30 minutes", "15 minutes")` groupBy under a
    // watermark; this batch form is its backfill/replay equivalent.
    QueryDef("q85_sliding_windows", (s, d) => {
      val slide = 900000000L // 15 min in micros; window = 2 slides
      t(s, d, "events")
        .withColumn("t_us",
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"))
        .withColumn("base",
          expr(s"t_us div ${slide}L - (CASE WHEN t_us % ${slide}L < 0 THEN 1 ELSE 0 END)"))
        .withColumn("k", explode(array(lit(0L), lit(1L))))
        .select(((col("base") - col("k")) * slide).as("window_start_us"),
          col("event_type"), col("value"))
        .groupBy("window_start_us", "event_type")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
    }, Some("""
      WITH e AS (
        SELECT epoch_ns(ts) // 1000 AS t_us, event_type, value FROM events),
      x AS (
        SELECT (t_us // 900000000 - k.k) * 900000000 AS window_start_us,
          event_type, value
        FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
      SELECT CAST(window_start_us AS BIGINT) AS window_start_us, event_type,
        COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM x GROUP BY 1, 2"""),
      notes = "sliding 30-min/15-min event windows via floor-div bucket arithmetic (exact cross-engine), 2x bounded fan-out + keyed agg"),

    // ── Sessionization (gap-based, window-over-window) ─────────────────
    QueryDef("q26_sessionize", (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events")
        // nanos LONG → micros with true FLOOR (matches epoch_ns//1000 for
        // negative pre-1970 nanos too; `div` alone truncates toward zero)
        .withColumn("us",
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"))
        .withColumn("prev_us", lag(col("us"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_us").isNull ||
            col("us") - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy("user_id")
        .agg(sum(col("new_session")).as("n_sessions"),
          count(lit(1)).as("n_events"))
    }, Some("""
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      FROM (
        SELECT user_id,
          CASE WHEN prev_us IS NULL
                 OR us - prev_us > 1800000000
               THEN 1 ELSE 0 END AS new_session
        FROM (
          SELECT user_id, epoch_ns(ts)//1000 AS us,
            lag(epoch_ns(ts)//1000, 1) OVER (
              PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_us
          FROM events))
      GROUP BY user_id"""),
      notes = "30-min-gap sessionization; microsecond-exact both engines"),

    // ── JSON extraction ────────────────────────────────────────────────
    QueryDef("q27_json_extract", (s, d) => {
      t(s, d, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
    }, Some("""
      SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events"""),
      notes = "JSON path extraction over the events.props column"),

    // ── Pivot (conditional aggregation) ────────────────────────────────
    QueryDef("q28_pivot_status", (s, d) => {
      t(s, d, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
    }, Some("""
      SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus='F' THEN 1 END) AS "F",
        COUNT(CASE WHEN o_orderstatus='O' THEN 1 END) AS "O",
        COUNT(CASE WHEN o_orderstatus='P' THEN 1 END) AS "P"
      FROM orders GROUP BY o_orderpriority"""),
      notes = "pivot = conditional aggregation (gold statusMix shape)"),

    // ── Analytic window-function zoo ───────────────────────────────────
    QueryDef("q42_window_funcs", (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        first(col("o_orderkey")).over(w).as("first_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(rank() OVER w AS BIGINT) AS rnk,
        CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        lead(o_orderkey, 1) OVER w AS next_orderkey,
        first_value(o_orderkey) OVER w AS first_orderkey
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)"""),
      notes = "rank/dense_rank/ntile/lead/first_value over one deterministic window"),

    // ── Distribution window functions (completes the analytic family) ──
    QueryDef("q42c_distribution_funcs", (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_orderkey"))
    }, Some("""
      SELECT o_custkey, o_orderkey,
        ROUND(percent_rank() OVER w, 6) AS pct_rank,
        ROUND(cume_dist() OVER w, 6) AS cume,
        nth_value(o_orderkey, 2) OVER w AS second_orderkey
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)"""),
      notes = "percent_rank/cume_dist/nth_value; deterministic total order, 6-dp rounding"),

    // ── SQL surface (the Athena stand-in): spark.sql over registered views ──
    QueryDef("q43_sql_surface", (s, d) => {
      graft.io.TestTables.registerAll(s, d)
      s.sql("""
        SELECT n_name,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_sales,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderstatus = 'F'
        GROUP BY n_name""")
    }, Some("""
      SELECT n_name,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_sales,
        COUNT(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderstatus = 'F'
      GROUP BY n_name"""),
      notes = "ad-hoc ANSI SQL through spark.sql on registered tables (README.md:33,67 Athena equivalent)"),

    // ── Explicit GROUPING SETS (beyond rollup/cube) ────────────────────
    QueryDef("q58_grouping_sets", (s, d) => {
      graft.io.TestTables.registerAll(s, d)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""),
      notes = "explicit GROUPING SETS + GROUPING() disambiguators (rollup/cube generalization)"),

    // ── Deterministic argmax aggregate (struct-max idiom) ──────────────
    // max_by() is indeterminate on ties; max(struct(v, tiebreak...)) is the
    // deterministic argmax — lexicographic struct order == ORDER BY v DESC,
    // tiebreaks DESC, which the oracle mirrors with a rank-1 window.
    QueryDef("q59_argmax", (s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(max(struct(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"))).as("top"))
        .select(col("l_returnflag"),
          col("top.l_extendedprice").as("top_price"),
          col("top.l_orderkey").as("top_orderkey"),
          col("top.l_linenumber").as("top_linenumber"))
    }, Some("""
      SELECT l_returnflag, l_extendedprice AS top_price,
             l_orderkey AS top_orderkey,
             CAST(l_linenumber AS BIGINT) AS top_linenumber
      FROM (
        SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        FROM lineitem)
      WHERE rn = 1"""),
      notes = "deterministic argmax via struct-max (no indeterminate max_by ties)"),

    // ── TPC-H Q5 shape: region-filtered multi-join revenue rollup ──────
    QueryDef("q46_region_revenue", (s, d) => {
      val li = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val su = t(s, d, "supplier")
      val n = broadcast(t(s, d, "nation"))
      val r = broadcast(t(s, d, "region").filter(col("r_name") === "EUROPE"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(su, li("l_suppkey") === su("s_suppkey") &&
          c("c_nationkey") === su("s_nationkey")) // local supplier, Q5 twist
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    }, Some("""
      SELECT n_name,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
      GROUP BY n_name"""),
      notes = "TPC-H Q5 shape: 5-way join, region filter pruned before join"),

    // ── Correlated subquery (decorrelated to a join by Catalyst) ───────
    QueryDef("q47_above_avg_orders", (s, d) => {
      val o = t(s, d, "orders")
      val avgPerCust = o.groupBy(col("o_custkey").as("ac_custkey"))
        .agg((sum(col("o_totalprice").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("avg_price"))
      o.join(avgPerCust, o("o_custkey") === avgPerCust("ac_custkey"))
        .filter(col("o_totalprice") > col("avg_price"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders o
      WHERE o_totalprice > (
        SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)"""),
      notes = "correlated scalar subquery ≡ decorrelated agg-join; decimal-exact threshold"),

    // ── Exact median (interpolated percentile on integral values) ──────
    QueryDef("q48_median_qty", (s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, array(0.25, 0.75))").as("iqr"))
        .select(col("l_returnflag"), col("median_qty"),
          col("iqr")(0).as("q25"), col("iqr")(1).as("q75"))
    }, Some("""
      SELECT l_returnflag,
        quantile_cont(l_quantity, 0.5) AS median_qty,
        quantile_cont(l_quantity, 0.25) AS q25,
        quantile_cont(l_quantity, 0.75) AS q75
      FROM lineitem GROUP BY l_returnflag"""),
      notes = "linear-interpolated percentiles; l_quantity integral so interpolation is exact"),

    // ── As-of join (time-series: last event at-or-before each order) ───
    // Composed from existing ops per the custom-operator preference order:
    // equi-join on the entity key with the time bound as a residual, then a
    // hash-agg argmax via max(struct(ts, id)) — NO per-key window sort over
    // the joined set. At 100 TB both sides shuffle once on the entity key
    // (AQE handles hot users); a dedicated merge-based as-of SparkPlan is
    // only worth it when the joined set can't be re-aggregated (it can).
    QueryDef("q49_asof_join", (s, d) => {
      val ev = t(s, d, "events").select(
        col("user_id"),
        col("event_id"),
        // nanos LONG → micros, true floor (see q26)
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)").as("us"))
      val o = t(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        // o_orderdate is TIMESTAMP_NTZ; session TZ is pinned UTC everywhere,
        // so the cast to TIMESTAMP is the identity DuckDB's epoch_us assumes
        unix_micros(col("o_orderdate").cast("timestamp")).as("odate_us"))
      ev.join(o, col("o_custkey") === col("user_id") &&
          col("odate_us") <= col("us"))
        .groupBy("event_id")
        .agg(max(struct(col("odate_us"), col("o_orderkey"))).as("last"))
        .select(col("event_id"),
          col("last.o_orderkey").as("last_orderkey"),
          col("last.odate_us").as("last_order_us"))
    }, Some("""
      SELECT event_id, o_orderkey AS last_orderkey, odate_us AS last_order_us
      FROM (
        SELECT e.event_id, o.o_orderkey, epoch_us(o.o_orderdate) AS odate_us,
          row_number() OVER (PARTITION BY e.event_id
            ORDER BY epoch_us(o.o_orderdate) DESC, o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o ON o.o_custkey = e.user_id
          AND epoch_us(o.o_orderdate) <= epoch_ns(e.ts)//1000)
      WHERE rn = 1"""),
      notes = "as-of join: latest order at-or-before each event, argmax(ts,key); deterministic tiebreak"),

    // ── Range join via time-bucketing (the Spark-native scale path) ────
    // Spark has no native band/range join; the idiomatic equivalent is an
    // equi-join on (entity, time_bucket) with the right side replicated
    // into the two buckets a match can live in, then an exact residual
    // filter. Shuffle is keyed (user, bucket) — pair work is bounded by
    // true pair density, never |left|×|right| per user. DuckDB's oracle
    // runs the same semantics as a plain inequality join.
    QueryDef("q52_range_join", (s, d) => {
      val usCol = expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")
      val W = 30000000L // 30 s in micros = bucket width
      val ev = t(s, d, "events")
        .select(col("user_id"), usCol.as("us"))
        .withColumn("bkt", expr(s"us div $W"))
      val right = ev.select(
        col("user_id").as("b_user"), col("us").as("b_us"),
        explode(array(col("bkt"), col("bkt") - 1)).as("b_bkt"))
      ev.join(right,
          col("user_id") === col("b_user") && col("bkt") === col("b_bkt") &&
          col("b_us") > col("us") && col("b_us") <= col("us") + W)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
    }, Some("""
      SELECT a.user_id, COUNT(*) AS n_pairs
      FROM events a JOIN events b ON b.user_id = a.user_id
        AND epoch_ns(b.ts)//1000 >  epoch_ns(a.ts)//1000
        AND epoch_ns(b.ts)//1000 <= epoch_ns(a.ts)//1000 + 30000000
      GROUP BY a.user_id"""),
      notes = "range join (pairs within 30s) via bucket replication + residual filter"),

    // ── Exact correlation (decimal sums → closed form, cross-engine) ───
    // Built-in corr() accumulates doubles (summation-order drift); this
    // computes Pearson r from six EXACT decimal aggregates and does the
    // one double division at the end — deterministic on both engines.
    QueryDef("q53_corr", (s, d) => {
      // work in the exact INTEGER domain: q is integral, y in cents
      // (Pearson r is invariant under linear scaling of either variable);
      // every moment sum is then an exact integer on both engines (DuckDB
      // overflows multiplying two DECIMAL(18)s, HUGEINT doesn't). Four of
      // the five moments provably fit BIGINT (q≤2^6, pc≤2^24, rows≪2^31)
      // and stay in codegen'd primitive-long hash-agg; only Σpc² can pass
      // 2^63, so that one column pays the decimal path.
      val q = col("l_quantity").cast("long")
      val pc = round(col("l_extendedprice") * 100).cast("long")
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("n"),
          sum(q).cast("double").as("sx"), sum(pc).cast("double").as("sy"),
          sum(q * pc).cast("double").as("sxy"),
          sum(q * q).cast("double").as("sxx"),
          sum((pc * pc).cast("decimal(38,0)")).cast("double").as("syy"))
        .select(col("l_returnflag"),
          // r is undefined when either variable has zero variance in the
          // group (denominator 0) — NULL, not an ANSI div-by-zero abort
          when((col("n") * col("sxx") - col("sx") * col("sx")) *
               (col("n") * col("syy") - col("sy") * col("sy")) > 0,
            round((col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                   (col("n") * col("syy") - col("sy") * col("sy"))), 6))
            .otherwise(lit(null).cast("double"))
            .as("corr_qty_price"))
    }, Some("""
      WITH s AS (
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sx,
          CAST(SUM(CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS DOUBLE) AS sy,
          CAST(SUM(CAST(l_quantity AS HUGEINT) * CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(l_quantity AS HUGEINT) * CAST(l_quantity AS HUGEINT)) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(ROUND(l_extendedprice*100) AS HUGEINT) * CAST(ROUND(l_extendedprice*100) AS HUGEINT)) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag,
        CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0 THEN
          ROUND((n*sxy - sx*sy) / SQRT((n*sxx - sx*sx) * (n*syy - sy*sy)), 6)
        ELSE NULL END AS corr_qty_price
      FROM s"""),
      notes = "Pearson r from exact integer moments (order-insensitive, unlike corr())"),

    // ── Histogram binning (fixed-width buckets, closed-form) ───────────
    QueryDef("q54_histogram", (s, d) => {
      t(s, d, "orders")
        .select(least(floor(col("o_totalprice") / 60000).cast("long"), lit(9L))
          .as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))
    }, Some("""
      SELECT LEAST(CAST(FLOOR(o_totalprice / 60000) AS BIGINT), 9) AS bucket,
             COUNT(*) AS n
      FROM orders GROUP BY 1"""),
      notes = "fixed-width histogram (10 buckets, top-clamped) via closed-form binning"),

    // ── String similarity: edit distance to a per-group anchor ─────────
    // One window (anchor = name of the min custkey per nation) + a narrow
    // levenshtein per row — the LINEAR string-similarity shape (vs the
    // quadratic all-pairs form, which would need blocking like q38).
    QueryDef("q55_edit_distance", (s, d) => {
      val w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
      t(s, d, "customer")
        .withColumn("anchor", first(col("c_name")).over(w))
        .select(col("c_custkey"), col("c_nationkey"),
          levenshtein(col("c_name"), col("anchor")).cast("long")
            .as("dist_to_anchor"))
    }, Some("""
      SELECT c_custkey, c_nationkey,
        CAST(levenshtein(c_name, first_value(c_name) OVER (
          PARTITION BY c_nationkey ORDER BY c_custkey)) AS BIGINT)
          AS dist_to_anchor
      FROM customer"""),
      notes = "levenshtein to per-nation anchor; linear (window + narrow map)"),

    // ── RANGE window frame (value-based sliding window) ────────────────
    // Distinct from every ROWS-frame window in the catalog: the frame is
    // defined by the ORDER-BY VALUE (trailing 7 days), so tied days all
    // see the same frame and the decimal sum is deterministic without a
    // row-level tiebreak. One shuffle per customer partition.
    QueryDef("q61_range_frame", (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("day"))
        .rangeBetween(-6, 0)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("day"),
          col("o_totalprice"))
        .withColumn("trailing_7d",
          sum(col("o_totalprice").cast("decimal(18,4)")).over(w)
            .cast("double"))
        .drop("o_totalprice")
    }, Some("""
      SELECT o_orderkey, o_custkey,
        CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
          PARTITION BY o_custkey
          ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_7d
      FROM orders"""),
      notes = "RANGE frame: trailing-7-day sum per customer (value-based frame, tie-safe)"),

    // ── Approximate distinct (no cross-engine oracle: sketch differs) ──
    QueryDef("q29_approx_distinct", (s, d) => {
      t(s, d, "orders").agg(
        approx_count_distinct(col("o_custkey")).as("approx_custs"),
        countDistinct(col("o_custkey")).as("exact_custs"))
    }, None,
      notes = "HLL++ sketch — rows-only check (sketches are engine-specific)"),

    // ── Mergeable HLL sketch rollup (the pre-aggregated distinct table) ─
    // q29 is a one-shot approx distinct; THIS is the pattern that makes
    // sketches matter at 100 TB: materialize per-(day, event_type)
    // DataSketches HLL sketches ONCE (a daily rollup table of a few KB per
    // row), then answer any date-range distinct-users question by UNIONING
    // sketches — never rescanning events. HLL union takes the per-bucket
    // register max, exactly what a direct build over the concatenated data
    // computes, so merging daily sketches loses nothing vs sketching raw
    // (HllSketchSpec pins estimate equality, plus a ±5% accuracy band vs
    // exact and cross-run determinism). Two hash-agg shuffles, both
    // map-side partial: (day, type)-keyed build, then type-keyed union of
    // DAYS-many sketch blobs, not rows. Rows-only: the sketch registers
    // are engine-specific (DuckDB's approx sketch differs).
    QueryDef("q82_hll_sketch_rollup", (s, d) => {
      val day = to_date(timestamp_micros(
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")))
      t(s, d, "events")
        .groupBy(day.as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        .groupBy("event_type")
        .agg(
          hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
            .as("est_users"),
          count(lit(1)).as("n_days"))
    }, None,
      notes = "per-day HLL sketch rollup unioned per event_type (mergeable distinct-count table); rows-only (sketch registers are engine-specific)"),

    // ── Global contiguous row numbering (two-pass, no global window) ───
    // `row_number() OVER (ORDER BY ...)` with an empty PARTITION BY pulls
    // the ENTIRE table through one Exchange SinglePartition — the classic
    // 100 TB killer (one task sorts everything). This is the distributed
    // twin: (1) range-partition on the order key so partition i holds a
    // contiguous slice of the global order, sort within partitions, and
    // let `monotonically_increasing_id` stamp pid<<33|row — a NARROW
    // projection, no window at all on the data path; (2) aggregate the
    // per-partition counts (32 rows), cumulative-sum them into offsets —
    // the only single-partition work is over partition COUNT, not rows —
    // and broadcast-join the offsets back. global_id = offset + local + 1
    // reproduces the exact rank in total order because RangePartitioning
    // orders partitions and the local sort completes the total order
    // ((source, doc_id) is a unique key). The double reference to the
    // ranged base plans two IDENTICAL range exchanges that AQE's
    // exchange-reuse collapses to one shuffle at runtime (the plan
    // contract tolerates 1-2 in the pre-AQE plan). Plan contract in
    // PlanContractSpec: every Window / SinglePartition exchange sits
    // above the tiny count aggregate, never the raw table.
    QueryDef("q89_global_ids", (s, d) => {
      graft.operators.GlobalOrder.withRowNumbers(
        t(s, d, "documents").select("doc_id", "source"),
        Seq(col("source"), col("doc_id")))
        .select("doc_id", "source", "global_id")
    }, Some("""
      SELECT doc_id, source,
        row_number() OVER (ORDER BY source, doc_id) AS global_id
      FROM documents"""),
      notes = "global contiguous ids WITHOUT a single-partition window: range partition + local sort + monotonic ids + 32-row offset table broadcast back"),

    // ── Bloom-prefiltered semi join ────────────────────────────────────
    // The shuffled-semi-join killer at 100 TB: when the dim key set can't
    // broadcast exactly but its bloom SKETCH can, prefilter the fact with
    // a codegen'd membership probe BEFORE the exchange — shuffle volume
    // drops by the join selectivity (~80% here), and the exact semi join
    // afterwards removes the sketch's false positives, so the result is
    // bit-identical to the plain semi join the oracle runs. See
    // BloomPrune's scaladoc for the relationship to AQE's runtime bloom
    // filters; BloomPruneSpec pins no-false-negatives, fpp sanity, and
    // the filter-below-the-join plan shape.
    QueryDef("q90_bloom_semi", (s, d) => {
      val dim = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      graft.operators.BloomPrune
        .semiJoin(t(s, d, "lineitem"), "l_orderkey", dim, "o_orderkey", fpp = 0.01)
        .groupBy("l_returnflag")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
    }, Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        COUNT(*) AS n
      FROM lineitem
      WHERE l_orderkey IN (
        SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      GROUP BY l_returnflag"""),
      notes = "bloom-prefiltered exact semi join (sketch prunes the probe side pre-shuffle; exact join removes false positives)"),

    // ── Z-order key (Morton interleave, cross-engine exact) ────────────
    // The clustering key behind ZOrderLayout, surfaced as an oracled
    // query: both engines compute the SAME bit-interleave — Spark via the
    // codegen graft_zorder expression, DuckDB via the identical magic-mask
    // shift chain spelled out in SQL (16-bit inputs keep every shift
    // overflow-free in BIGINT). Hash-gating this pins the expression's
    // arithmetic against an independent implementation; ZOrderSpec pins
    // the layout consequence (min/max skipping on both dimensions).
    QueryDef("q91_zorder_key", (s, d) => {
      graft.functions.GraftFunctions.register(s)
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          call_function("graft_zorder",
            col("l_partkey") % 32768L, col("l_suppkey") % 32768L).as("z"))
        .orderBy(col("z").asc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100)
    }, Some("""
      WITH b AS (
        SELECT l_orderkey, l_linenumber,
          l_partkey % 32768 AS xa, l_suppkey % 32768 AS xb
        FROM lineitem),
      s1 AS (SELECT l_orderkey, l_linenumber,
        ((xa | (xa << 8)) & 16711935) AS a1,
        ((xb | (xb << 8)) & 16711935) AS b1 FROM b),
      s2 AS (SELECT l_orderkey, l_linenumber,
        ((a1 | (a1 << 4)) & 252645135) AS a2,
        ((b1 | (b1 << 4)) & 252645135) AS b2 FROM s1),
      s3 AS (SELECT l_orderkey, l_linenumber,
        ((a2 | (a2 << 2)) & 858993459) AS a3,
        ((b2 | (b2 << 2)) & 858993459) AS b3 FROM s2),
      s4 AS (SELECT l_orderkey, l_linenumber,
        ((a3 | (a3 << 1)) & 1431655765) AS a4,
        ((b3 | (b3 << 1)) & 1431655765) AS b4 FROM s3)
      SELECT l_orderkey, l_linenumber, CAST(a4 | (b4 << 1) AS BIGINT) AS z
      FROM s4
      ORDER BY z ASC, l_orderkey ASC, l_linenumber ASC
      LIMIT 100"""),
      notes = "Morton z-order key, bit-exact across engines (independent shift/mask oracle); top-100 with total tiebreak"),

    // ── Calendar gap-fill (time-series densification) ──────────────────
    // Feature pipelines need DENSE per-entity daily series (a model can't
    // learn from missing rows); the naive global calendar cross join is a
    // cartesian. This fills each user's OWN [first_day, last_day] span:
    // per-(user, day) agg, per-user span agg (Catalyst prunes the span
    // branch to keys, collapsing its two-level agg into one user-keyed
    // pass), bounded sequence-explode spine (fan-out = span days, never
    // a cross join), left join actuals back, zeros for gaps.
    // Day buckets use the q25/q26 floor-div micros pattern — exact
    // cross-engine even pre-1970.
    QueryDef("q96_gap_fill", (s, d) => {
      val ev = t(s, d, "events")
        .withColumn("us",
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"))
        .withColumn("day",
          expr("us div 86400000000 - (CASE WHEN us % 86400000000 < 0 THEN 1 ELSE 0 END)"))
      val daily = ev.groupBy("user_id", "day")
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("day_value"))
      val spans = daily.groupBy("user_id")
        .agg(min("day").as("d0"), max("day").as("d1"))
      val spine = spans.select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(col("day_value"), lit(0.0)).as("day_value"))
    }, Some("""
      WITH e AS (
        SELECT user_id,
          (epoch_ns(ts) // 1000) // 86400000000 AS day, value
        FROM events),
      daily AS (
        SELECT user_id, CAST(day AS BIGINT) AS day,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS day_value
        FROM e GROUP BY 1, 2),
      spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                FROM daily GROUP BY 1),
      spine AS (SELECT user_id, unnest(generate_series(d0, d1)) AS day
                FROM spans)
      SELECT s.user_id, CAST(s.day AS BIGINT) AS day,
        COALESCE(d.n_events, 0) AS n_events,
        COALESCE(d.day_value, 0.0) AS day_value
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day"""),
      notes = "per-user daily gap-fill: bounded sequence-explode spine + left join, zeros for missing days (no calendar cross join)"),

    // ── Retention cohorts (week-offset activity matrix) ────────────────
    // The Athena-style product question: of users first seen in week W,
    // how many were active W+k weeks later. Two aggs off one distinct
    // (user, week) frame — cohort = min(week) per user — then a user-keyed
    // broadcast-scale join and a (cohort, offset)-keyed count distinct.
    // Week index = floor(day / 7) in exact integer micros arithmetic.
    QueryDef("q97_retention", (s, d) => {
      val ev = t(s, d, "events")
        .withColumn("us",
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"))
        .withColumn("day",
          expr("us div 86400000000 - (CASE WHEN us % 86400000000 < 0 THEN 1 ELSE 0 END)"))
        .withColumn("week",
          expr("day div 7 - (CASE WHEN day % 7 < 0 THEN 1 ELSE 0 END)"))
      val uw = ev.select("user_id", "week").distinct()
      val cohorts = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
      uw.join(cohorts, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }, Some("""
      WITH e AS (
        SELECT user_id,
          ((epoch_ns(ts) // 1000) // 86400000000) // 7 AS week
        FROM events),
      uw AS (SELECT DISTINCT user_id, CAST(week AS BIGINT) AS week FROM e),
      c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1)
      SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
        CAST(COUNT(DISTINCT uw.user_id) AS BIGINT) AS n_users
      FROM uw JOIN c ON uw.user_id = c.user_id
      GROUP BY 1, 2"""),
      notes = "weekly retention cohort matrix: first-seen week x offset, distinct users; exact integer week buckets"),

    // ── Conversion funnel (signup → purchase within 7 days) ────────────
    // Ordered-step funnel per signup-day cohort: first signup per user,
    // then any purchase inside the 7-day window after it. One user-keyed
    // agg per step, one user-keyed join (semi-scale: purchases filtered
    // to funnel users), exact micros window arithmetic, and a day-keyed
    // rollup of cohort size / conversions / exact-double rate.
    QueryDef("q98_funnel", (s, d) => {
      val ev = t(s, d, "events")
        .withColumn("us",
          expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)"))
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("us").as("s_us"))
        .withColumn("s_day",
          expr("s_us div 86400000000 - (CASE WHEN s_us % 86400000000 < 0 THEN 1 ELSE 0 END)"))
      val purchase = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us").as("p_us"))
      val win = 7L * 86400000000L
      val converted = purchase.join(signup, "user_id")
        .filter(col("p_us") >= col("s_us") && col("p_us") <= col("s_us") + win)
        .select("user_id").distinct()
        .withColumn("converted", lit(1L))
      signup.join(converted, Seq("user_id"), "left")
        .groupBy("s_day")
        .agg(count(lit(1)).as("n_signups"),
          sum(coalesce(col("converted"), lit(0L))).as("n_converted"))
        .withColumn("conversion_rate",
          col("n_converted").cast("double") / col("n_signups"))
    }, Some("""
      WITH e AS (
        SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
      s AS (
        SELECT user_id, MIN(us) AS s_us,
          CAST(MIN(us) // 86400000000 AS BIGINT) AS s_day
        FROM e WHERE event_type = 'signup' GROUP BY 1),
      conv AS (
        SELECT DISTINCT p.user_id
        FROM e p JOIN s ON p.user_id = s.user_id
        WHERE p.event_type = 'purchase'
          AND p.us >= s.s_us AND p.us <= s.s_us + 604800000000)
      SELECT s.s_day,
        CAST(COUNT(*) AS BIGINT) AS n_signups,
        CAST(COUNT(conv.user_id) AS BIGINT) AS n_converted,
        CAST(COUNT(conv.user_id) AS DOUBLE) / COUNT(*) AS conversion_rate
      FROM s LEFT JOIN conv ON s.user_id = conv.user_id
      GROUP BY 1"""),
      notes = "signup->purchase-within-7d funnel per signup-day cohort; exact micros window, exact-double conversion rate"),

    // ── Cross-table referential-integrity audit ────────────────────────
    // The DQ check a lake runs before promoting a snapshot: per declared
    // FK relation, orphaned children (fk with no parent — broken joins
    // downstream) and childless parents (coverage holes; nonzero is often
    // FINE — customers without orders — but the number should be known).
    // Shape per relation: two LEFT ANTI joins + two scan counts,
    // oracled with NOT EXISTS — the form whose NULL semantics MATCH the
    // anti join (a NULL fk is an orphan on both engines; NOT IN would
    // return zero rows the moment the parent side held a single NULL),
    // composed via 1-row broadcast cross joins (whitelisted BNLJ). At
    // 100 TB each anti join is one fk-keyed shuffle (or broadcast when
    // the parent key set fits); nothing quadratic.
    QueryDef("q99_ref_integrity", (s, d) => {
      def audit(relName: String, parent: org.apache.spark.sql.DataFrame,
          pk: String, child: org.apache.spark.sql.DataFrame, fk: String) = {
        val p = parent.select(col(pk).as("k"))
        val c = child.select(col(fk).as("k"))
        val orphan = c.join(p.distinct(), Seq("k"), "left_anti")
          .agg(count(lit(1)).as("orphan_children"))
        val childless = p.distinct().join(c.distinct(), Seq("k"), "left_anti")
          .agg(count(lit(1)).as("childless_parents"))
        p.agg(count(lit(1)).as("n_parents"))
          .crossJoin(c.agg(count(lit(1)).as("n_children")))
          .crossJoin(orphan).crossJoin(childless)
          .select(lit(relName).as("relation"), col("n_parents"),
            col("n_children"), col("orphan_children"), col("childless_parents"))
      }
      audit("orders->customer", t(s, d, "customer"), "c_custkey",
          t(s, d, "orders"), "o_custkey")
        .union(audit("lineitem->orders", t(s, d, "orders"), "o_orderkey",
          t(s, d, "lineitem"), "l_orderkey"))
        .union(audit("lineitem->part", t(s, d, "part"), "p_partkey",
          t(s, d, "lineitem"), "l_partkey"))
        .union(audit("embeddings->documents", t(s, d, "documents"), "doc_id",
          t(s, d, "embeddings"), "vec_id"))
    }, Some("""
      SELECT 'orders->customer' AS relation,
        (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_parents,
        (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_children,
        (SELECT CAST(count(*) AS BIGINT) FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)) AS orphan_children,
        (SELECT CAST(count(*) AS BIGINT) FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS childless_parents
      UNION ALL
      SELECT 'lineitem->orders',
        (SELECT CAST(count(*) AS BIGINT) FROM orders),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)),
        (SELECT CAST(count(*) AS BIGINT) FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey))
      UNION ALL
      SELECT 'lineitem->part',
        (SELECT CAST(count(*) AS BIGINT) FROM part),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        (SELECT CAST(count(*) AS BIGINT) FROM lineitem
         WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)),
        (SELECT CAST(count(*) AS BIGINT) FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey))
      UNION ALL
      SELECT 'embeddings->documents',
        (SELECT CAST(count(*) AS BIGINT) FROM documents),
        (SELECT CAST(count(*) AS BIGINT) FROM embeddings),
        (SELECT CAST(count(*) AS BIGINT) FROM embeddings
         WHERE NOT EXISTS (SELECT 1 FROM documents WHERE doc_id = vec_id)),
        (SELECT CAST(count(*) AS BIGINT) FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM embeddings WHERE vec_id = d.doc_id))"""),
      notes = "per-FK-relation orphan/coverage audit via anti joins; the pre-promotion DQ gate over the whole lake"),

    // ── Order-invariant table checksums (replication equality audit) ───
    // "Is the replica byte-equal to the source" without moving either
    // table: per-row md5 over a canonical '|'-joined column string,
    // folded to a 60-bit integer (15 hex chars — portable: Spark conv(),
    // DuckDB '0x' cast), then SUMMED in exact DECIMAL(38,0). Addition is
    // commutative, so the checksum is invariant under row order AND
    // partitioning — two copies match iff multisets of canonical rows
    // match (unlike XOR folds, duplicate rows don't cancel). One
    // full-scan hash-agg per table, single row out: the cheapest possible
    // cross-site comparison at 100 TB (ship 3 rows, not 100 TB).
    QueryDef("q100_table_checksum", (s, d) => {
      def check(name: String, df: org.apache.spark.sql.DataFrame,
          cols: Seq[String]) = {
        val rowStr = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
        val h = conv(substring(md5(rowStr), 1, 15), 16, 10)
          .cast("decimal(38,0)")
        // checksum surfaces as STRING: DECIMAL(38,0) survives parquet but
        // dataframe tooling (the oracle compare included) coerces wide
        // decimals to float and destroys the exactness the audit IS
        df.agg(count(lit(1)).as("n_rows"),
            sum(h).cast("string").as("checksum"))
          .select(lit(name).as("tbl"), col("n_rows"), col("checksum"))
      }
      check("orders", t(s, d, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .union(check("lineitem", t(s, d, "lineitem"),
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")))
        .union(check("documents", t(s, d, "documents"),
          Seq("doc_id", "source", "lang", "n_chars")))
    }, Some("""
      SELECT 'orders' AS tbl, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(CAST('0x' || substr(md5(
          o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
          o_orderpriority), 1, 15) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS checksum
      FROM orders
      UNION ALL
      SELECT 'lineitem', CAST(count(*) AS BIGINT),
        CAST(SUM(CAST(CAST('0x' || substr(md5(
          l_orderkey || '|' || l_partkey || '|' || l_suppkey || '|' ||
          l_linenumber), 1, 15) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)
      FROM lineitem
      UNION ALL
      SELECT 'documents', CAST(count(*) AS BIGINT),
        CAST(SUM(CAST(CAST('0x' || substr(md5(
          doc_id || '|' || source || '|' || lang || '|' ||
          n_chars), 1, 15) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR)
      FROM documents"""),
      notes = "order/partitioning-invariant md5-fold checksums per table (exact decimal sum); cross-copy equality audit shipping rows, not tables"),

    // ── Partitioned checksums (incremental re-verify) ──────────────────
    // q100 answers "are two copies equal" with one number per TABLE —
    // which means any incremental write forces a full-table re-hash. The
    // production replication-audit workflow wants PARTITION subtotals:
    // after a day's append, re-verify THAT day's subtotal and trust the
    // untouched partitions' stored subtotals (the q70 incremental
    // posture applied to auditing). Same per-row md5 fold and exact
    // DECIMAL(38,0) sum as q100, grouped by the natural partition key
    // (order date) — so subtotals are row-order invariant within a
    // partition AND fold across partitions to exactly the q100 total
    // (ChecksumFoldSpec pins the algebra). One hash shuffle keyed by
    // partition, no joins; output is one row per partition-day.
    QueryDef("q106_partition_checksum", (s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      val rowStr = concat_ws("|", cols.map(c => col(c).cast("string")): _*)
      val h = conv(substring(md5(rowStr), 1, 15), 16, 10).cast("decimal(38,0)")
      t(s, d, "orders")
        .groupBy(to_date(col("o_orderdate")).as("pdate"))
        .agg(count(lit(1)).as("n_rows"),
          sum(h).cast("string").as("checksum"))
    }, Some("""
      SELECT CAST(o_orderdate AS DATE) AS pdate,
        CAST(count(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(CAST('0x' || substr(md5(
          o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' ||
          o_orderpriority), 1, 15) AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS checksum
      FROM orders
      GROUP BY 1"""),
      notes = "per-partition-day checksum subtotals (same md5 fold + exact decimal sum as q100): incremental re-verify after a day's append without re-hashing the table"),

    // ── Column-level table profile (crawler statistics pass) ───────────
    // The post-load sanity/statistics sweep the reference delegates to
    // its catalog crawler: one row per column with row/null/distinct
    // counts and min/max, all surfaced as STRING so one schema fits every
    // column type. Each column profiles in ONE global aggregate over a
    // scan pruned to that column (k columns ⇒ k single-column parquet
    // page streams, never k full-table scans — ReadSchema-visible). This
    // is the exact form (COUNT DISTINCT, oracle-able); TableProfile
    // .profileApprox is the documented 100 TB path (HLL++ sketches fold
    // map-side, the q82/q108 blobs-not-rows posture) with the same
    // output schema. Min/max on strings compare binary/codepoint order
    // identically in both engines; BIGINT→STRING renders identically.
    QueryDef("q112_profile", (s, d) =>
      graft.operators.TableProfile.profile(
        t(s, d, "documents"), Seq("doc_id", "lang", "source", "n_chars")),
      Some("""
      SELECT 'doc_id' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        CAST(MIN(doc_id) AS VARCHAR) AS min_repr,
        CAST(MAX(doc_id) AS VARCHAR) AS max_repr
      FROM documents
      UNION ALL
      SELECT 'lang', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(DISTINCT lang) AS BIGINT),
        CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'source', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(DISTINCT source) AS BIGINT),
        CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'n_chars', CAST(COUNT(*) AS BIGINT),
        CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        CAST(COUNT(DISTINCT n_chars) AS BIGINT),
        CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
      FROM documents"""),
      notes = "column-level profile (rows/nulls/distinct/min/max as strings): one pruned single-column scan per column; profileApprox is the HLL++ scale twin"),

    // ── Manifest-pruned scan (file-level data skipping) ────────────────
    // The scan-planning layer q91's z-order layout exists to feed: a
    // per-file min/max manifest (built once per layout rewrite, cached
    // like the q104/q105 indexes) decides which files a 2-D range
    // predicate can touch BEFORE any data file is opened — the
    // Delta/Iceberg file-statistics idea from Spark primitives. Pruning
    // is speculative (survivors are a superset), so the ranges re-apply
    // as a residual filter and the result is structurally equal to a
    // plain WHERE over the unclustered table — which is exactly what the
    // oracle runs, so the hash gate re-proves skipping soundness every
    // round. SkippingIndexSpec pins the yield (survivors ≪ files on the
    // z-layout) and soundness across a predicate grid; the manifest read
    // is driver-sized metadata (one row per file), never data.
    QueryDef("q115_skipping_scan", (s, d) => {
      val root = graft.IndexCache.ensureZLayout(s, d)
      import graft.operators.SkippingIndex.ColRange
      graft.operators.SkippingIndex.prunedRead(s, root, Seq(
          ColRange("l_partkey", 40, 120), ColRange("l_suppkey", 2, 30)))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"))
    }, Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM lineitem
      WHERE l_partkey BETWEEN 40 AND 120 AND l_suppkey BETWEEN 2 AND 30
      GROUP BY 1"""),
      notes = "file-level min/max skipping over the z-ordered layout: manifest-pruned read + residual filter, hash-gated against a plain WHERE on the unclustered table (soundness re-proven every round)"),

    // ── Distribution drift: PSI between time halves ────────────────────
    // The monitoring primitive that tells a pipeline its data CHANGED:
    // Population Stability Index of the per-type `value` distribution,
    // early half vs late half of the event-time range (the production
    // form compares yesterday vs a reference window; the data-derived
    // midpoint keeps this self-contained and deterministic). PSI =
    // Σ_buckets (p−q)·ln(p/q) over 10 fixed-width bins with add-1
    // smoothing (so empty bins contribute finitely); >0.2 is the
    // conventional "investigate" threshold. Exactness: timestamps go
    // through the q25/q26 floor-div micros idiom; bins are exact integer
    // buckets of identical doubles; each bucket term rounds to 1e-6
    // micro-units BEFORE the per-type sum (the q77 order-independent
    // integer-sum trick); the surfaced psi is the exact micro-unit sum
    // divided in DOUBLE. Shape: one (type, period, bucket) hash-agg with
    // map-side partials over the events scan, then everything downstream
    // is |types|×10 rows — broadcast joins, no second data shuffle. At
    // 100 TB the data pass is one agg; the PSI algebra is metadata-sized.
    QueryDef("q133_psi_drift", (s, d) => {
      val ev = t(s, d, "events").select(col("event_type"),
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")
          .as("us"),
        col("value"))
      val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
      // ONE data pass: per-(type, bucket) early/late counts via conditional
      // aggregation (no period self-join — Spark would re-scan per branch)
      val counts = ev.crossJoin(broadcast(mid))
        .withColumn("bucket", least(floor(col("value") / lit(50.0)), lit(9L))
          .cast("long"))
        .groupBy("event_type", "bucket")
        .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("ca"),
          sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("cb"))
      // metadata from here: |types| rows carrying per-bucket count maps, so
      // the 10-bin spine explodes WITHOUT re-reading (or re-joining) data;
      // try_element_at gives the ANSI-safe miss → 0 for empty bins
      val perType = counts.groupBy("event_type").agg(
        map_from_arrays(collect_list("bucket"), collect_list("ca")).as("ma"),
        map_from_arrays(collect_list("bucket"), collect_list("cb")).as("mb"),
        sum("ca").as("na"), sum("cb").as("nb"))
      perType
        .select(col("event_type"), col("na"), col("nb"), col("ma"), col("mb"),
          explode(sequence(lit(0L), lit(9L))).as("bucket"))
        .withColumn("ca", coalesce(expr("try_element_at(ma, bucket)"), lit(0L)))
        .withColumn("cb", coalesce(expr("try_element_at(mb, bucket)"), lit(0L)))
        .withColumn("p",
          (col("ca") + lit(1)).cast("double") / (col("na") + lit(10)))
        .withColumn("q",
          (col("cb") + lit(1)).cast("double") / (col("nb") + lit(10)))
        .withColumn("m", round((col("p") - col("q")) * log(col("p") / col("q"))
          * lit(1e6)).cast("long"))
        .groupBy("event_type")
        .agg(max("na").as("n_early"), max("nb").as("n_late"),
          (sum(col("m")).cast("double") / lit(1e6)).as("psi"))
    }, Some("""
      WITH ev AS (
        SELECT event_type, epoch_ns(ts) // 1000 AS us, value FROM events),
      mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM ev),
      counts AS (
        SELECT event_type,
          CASE WHEN us < mid THEN 'early' ELSE 'late' END AS period,
          CAST(least(floor(value / 50.0), 9.0) AS BIGINT) AS bucket,
          COUNT(*) AS c
        FROM ev CROSS JOIN mid GROUP BY 1, 2, 3),
      spine AS (
        SELECT t.event_type, b.bucket
        FROM (SELECT DISTINCT event_type FROM ev) t
        CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bucket) b),
      j AS (
        SELECT s.event_type, s.bucket,
          COALESCE(e.c, 0) AS ca, COALESCE(l.c, 0) AS cb
        FROM spine s
        LEFT JOIN counts e ON e.event_type = s.event_type
          AND e.bucket = s.bucket AND e.period = 'early'
        LEFT JOIN counts l ON l.event_type = s.event_type
          AND l.bucket = s.bucket AND l.period = 'late'),
      tot AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb FROM j GROUP BY 1),
      terms AS (
        SELECT j.event_type, tot.na, tot.nb,
          CAST(ca + 1 AS DOUBLE) / (na + 10) AS p,
          CAST(cb + 1 AS DOUBLE) / (nb + 10) AS q
        FROM j JOIN tot USING (event_type))
      SELECT event_type,
        CAST(MAX(na) AS BIGINT) AS n_early,
        CAST(MAX(nb) AS BIGINT) AS n_late,
        CAST(SUM(CAST(round((p - q) * ln(p / q) * 1000000) AS BIGINT)) AS DOUBLE)
          / 1000000.0 AS psi
      FROM terms GROUP BY event_type"""),
      notes = "PSI drift monitor: per-type value-distribution shift between event-time halves (10 fixed bins, add-1 smoothing, micro-unit exact terms); one data-pass hash-agg, then metadata-sized PSI algebra on broadcast joins"),

    // ── Equi-depth binning WITHOUT a global window (quantile bucketizer) ─
    // Feature-engineering's quantile bucketizer as an exact distributed
    // op: assign every order its k=16 equi-depth bin over totalprice and
    // report per-bin count + value range (the bin edges a model or a
    // monitoring layer consumes). NTILE's semantics need each row's
    // GLOBAL rank — the naive form is `ntile(16) OVER (ORDER BY ...)`,
    // an Exchange SinglePartition that funnels the table through one
    // task. Here rank comes from GlobalOrder.withRowNumbers (range
    // partition + local numbering + broadcast offsets — the q89 shape),
    // the row count from a 1-row broadcast, and the bin is pure integer
    // arithmetic ((gid-1)*k) div n + 1 — identical on both engines, and
    // the same formula the oracle's row_number() form evaluates, so NTILE
    // tie-handling ambiguity never enters. Total tiebreak (price, key)
    // makes ranks — and therefore bins — unique and deterministic.
    QueryDef("q144_equidepth_bins", (s, d) => {
      val k = 16
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
      val ranked = graft.operators.GlobalOrder.withRowNumbers(
        o, Seq(col("o_totalprice"), col("o_orderkey")), out = "gid")
      ranked.crossJoin(broadcast(o.agg(count(lit(1)).as("n"))))
        .withColumn("bin", expr(s"(gid - 1) * $k div n + 1"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_rows"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
    }, Some("""
      WITH r AS (
        SELECT o_totalprice,
          row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
          (SELECT COUNT(*) FROM orders) AS n
        FROM orders)
      SELECT (rn - 1) * 16 // n + 1 AS bin,
        COUNT(*) AS n_rows,
        MIN(o_totalprice) AS min_price,
        MAX(o_totalprice) AS max_price
      FROM r GROUP BY 1"""),
      notes = "exact k=16 equi-depth bins via GlobalOrder ranks (no single-partition NTILE window): range partition + local numbering + broadcast offsets, then integer bin arithmetic shared with the oracle"),

    // ── Rolling control-chart anomaly gate (rate monitoring) ───────────
    // The operations-side drift twin of q133: per event_type daily
    // volumes checked against a trailing 7-day control band — a day is
    // anomalous when its count exceeds mean + 3σ of the PRIOR 7 days
    // (current day excluded, so a spike cannot mask itself). All
    // arithmetic derives from exact BIGINT window sums (Σx, Σx², n over
    // a ROWS frame): mean, population variance ((Σx² − (Σx)²/n)/n) and
    // the 3σ limit are then identical IEEE doubles on both engines — no
    // summation-order drift, no libm calls beyond sqrt on identical
    // inputs. Shapes: one (type, day)-keyed count agg over the events
    // scan, then a type-keyed bounded window (≤ days-per-month rows per
    // partition — metadata-sized forever); emits only flagged days.
    QueryDef("q145_rate_anomaly", (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("(ts div 1000) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      daily
        .withColumn("w_n", count(lit(1)).over(w))
        .withColumn("w_sum", sum(col("n")).over(w))
        .withColumn("w_sumsq", sum(col("n") * col("n")).over(w))
        .filter(col("w_n") === 7)
        .withColumn("mean", col("w_sum").cast("double") / col("w_n"))
        .withColumn("variance",
          (col("w_sumsq").cast("double") -
            col("w_sum").cast("double") * col("w_sum") / col("w_n")) /
            col("w_n"))
        .withColumn("limit3", col("mean") + lit(3.0) * sqrt(col("variance")))
        .filter(col("n").cast("double") > col("limit3"))
        .select(col("event_type"), col("day"), col("n"),
          round(col("mean"), 6).as("mean7"),
          round(col("limit3"), 6).as("limit3"))
    }, Some("""
      WITH daily AS (
        SELECT event_type, epoch_ns(ts) // 1000 // 86400000000 AS day,
          COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      win AS (
        SELECT event_type, day, n,
          COUNT(*) OVER w AS w_n,
          SUM(n) OVER w AS w_sum,
          SUM(n * n) OVER w AS w_sumsq
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
      stats AS (
        SELECT event_type, day, n,
          CAST(w_sum AS DOUBLE) / w_n AS mean,
          (CAST(w_sumsq AS DOUBLE) - CAST(w_sum AS DOUBLE) * w_sum / w_n)
            / w_n AS variance
        FROM win WHERE w_n = 7)
      SELECT event_type, day, CAST(n AS BIGINT) AS n,
        round(mean, 6) AS mean7,
        round(mean + 3.0 * sqrt(variance), 6) AS limit3
      FROM stats
      WHERE CAST(n AS DOUBLE) > mean + 3.0 * sqrt(variance)"""),
      notes = "trailing-7-day mean+3sigma control chart per event_type (spike cannot mask itself — current day excluded); exact BIGINT window sums make the band identical cross-engine; type-keyed bounded window"),

    // ── Join-cardinality estimation (the CBO planning primitive) ───────
    // The System-R containment estimator every cost-based optimizer
    // runs before picking a join order: |L ⋈ R| ≈ |L|·|R| / max(d_L,
    // d_R) (distinct key counts, containment-of-value-sets assumption),
    // audited here against the exact join count for two relations — the
    // FK-clean orders⋈customer (estimator exact by construction) and
    // the fact-fact lineitem⋈orders. At 100 TB the estimator's inputs
    // are table statistics (exact counts here; the q29/q82 HLL family
    // is the sketch path) — METADATA, which is the whole point: the
    // planner prices a join without running it. The exact join exists
    // in this query only to gate the estimator. Integer arithmetic
    // throughout (BIGINT product + floor division; greatest(…,1)
    // guards the ANSI division); rel_err divides exact BIGINTs in
    // DOUBLE.
    QueryDef("q183_join_estimate", (s, d) => {
      def est(relName: String, l: org.apache.spark.sql.DataFrame, lk: String,
          r: org.apache.spark.sql.DataFrame, rk: String) = {
        val ls = l.agg(count(lit(1)).as("n_left"),
          count_distinct(col(lk)).as("d_left"))
        val rs = r.agg(count(lit(1)).as("n_right"),
          count_distinct(col(rk)).as("d_right"))
        val ex = l.join(r, col(lk) === col(rk))
          .agg(count(lit(1)).as("exact_join"))
        ls.crossJoin(rs).crossJoin(ex)
          // DOUBLE estimate arithmetic: the BIGINT product overflowed
          // (and ANSI-threw) past ~3e9 rows per side — the very scale the
          // estimator exists to price; the double product is exact-rounded
          // identically on both engines and rounds once at the end
          .withColumn("est_join",
            round(col("n_left").cast("double") * col("n_right").cast("double")
              / greatest(col("d_left"), col("d_right"), lit(1L)).cast("double"))
              .cast("long"))
          .select(lit(relName).as("relation"), col("n_left"), col("d_left"),
            col("n_right"), col("d_right"), col("est_join"),
            col("exact_join"),
            when(col("exact_join") > 0,
              round((col("est_join") - col("exact_join")).cast("double") /
                col("exact_join").cast("double"), 6))
              .otherwise(lit(0.0)).as("rel_err"))
      }
      est("orders_customer", t(s, d, "orders"), "o_custkey",
          t(s, d, "customer"), "c_custkey")
        .unionAll(est("lineitem_orders", t(s, d, "lineitem"), "l_orderkey",
          t(s, d, "orders"), "o_orderkey"))
    }, Some("""
      WITH r1 AS (
        SELECT 'orders_customer' AS relation,
          (SELECT COUNT(*) FROM orders) AS n_left,
          (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS d_left,
          (SELECT COUNT(*) FROM customer) AS n_right,
          (SELECT COUNT(DISTINCT c_custkey) FROM customer) AS d_right,
          (SELECT COUNT(*) FROM orders JOIN customer
             ON o_custkey = c_custkey) AS exact_join),
      r2 AS (
        SELECT 'lineitem_orders' AS relation,
          (SELECT COUNT(*) FROM lineitem) AS n_left,
          (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS d_left,
          (SELECT COUNT(*) FROM orders) AS n_right,
          (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS d_right,
          (SELECT COUNT(*) FROM lineitem JOIN orders
             ON l_orderkey = o_orderkey) AS exact_join),
      u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2)
      SELECT relation, n_left, d_left, n_right, d_right,
        CAST(ROUND(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
          / CAST(greatest(d_left, d_right, 1) AS DOUBLE)) AS BIGINT)
          AS est_join,
        exact_join,
        CASE WHEN exact_join > 0 THEN
          round(CAST(CAST(ROUND(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
              / CAST(greatest(d_left, d_right, 1) AS DOUBLE)) AS BIGINT)
              - exact_join AS DOUBLE) / CAST(exact_join AS DOUBLE), 6)
          ELSE 0.0 END AS rel_err
      FROM u"""),
      notes = "System-R join-cardinality estimation audited against the exact join: |L||R|/max(d_L,d_R) over exact distinct-key stats (the q29/q82 HLL family is the 100 TB sketch path) for FK-clean and fact-fact relations; the planner prices a join from metadata without running it"),

    // ── Benford first-digit audit (the payments-fraud screen) ──────────
    // The classic forensic-accounting screen over the reference's OWN
    // domain (payment amounts): the first significant digit of
    // naturally-occurring amounts follows log10(1+1/d); fabricated or
    // structured amounts don't. Digit extraction is engine-portable
    // integer arithmetic on exact cents — `c div 10^(len(str(c))-1)`
    // (integer-to-string length, no float log10 knife edge). The
    // explicit 1..9 spine keeps absent digits in the χ² (they are the
    // loudest evidence); per-digit χ² terms are micro-unit rounded
    // BIGINTs so the statistic is deterministic cross-engine. One
    // map-side-combined digit agg (9 result rows) + metadata algebra;
    // df=8, α=0.05 critical value 15.507. TPC-H totalprice is a sum of
    // uniforms, NOT log-uniform — the audit CORRECTLY flags it
    // (significant=1), which is the point: the screen detects
    // non-Benford generators, and this one isn't.
    QueryDef("q192_benford", (s, d) => {
      val obs = t(s, d, "orders")
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
        .filter(col("cents") > 0)
        .withColumn("digit", expr(
          "cents div CAST(power(10, length(CAST(cents AS STRING)) - 1) AS BIGINT)"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val spine = s.range(1, 10).select(col("id").as("digit"))
        .join(obs, Seq("digit"), "left_outer")
        .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      val tot = spine.agg(sum("n_obs").as("n_total"))
      val terms = spine.crossJoin(broadcast(tot))
        // detLn: ln(1+1/d) = ln(d+1) − ln d; ln 10 pinned as a literal
        .withColumn("benford_share",
          graft.functions.DetMath.detLnRatio(col("digit") + lit(1L), col("digit")) /
            lit(2.302585092994046))
        .withColumn("exp_n",
          col("n_total").cast("double") * col("benford_share"))
        .withColumn("term_u", when(col("exp_n") > 0, round(
          (col("n_obs").cast("double") - col("exp_n")) *
            (col("n_obs").cast("double") - col("exp_n")) / col("exp_n") *
            lit(1e6)).cast("long")).otherwise(lit(0L)))
      val chi2 = terms.agg(sum("term_u").as("chi2_u"))
      terms.crossJoin(broadcast(chi2))
        .select(col("digit"), col("n_obs"),
          when(col("n_total") > 0, round(col("n_obs").cast("double") /
            col("n_total").cast("double"), 6)).otherwise(lit(0.0))
            .as("obs_share"),
          round(col("benford_share"), 6).as("benford_share"),
          round(col("chi2_u").cast("double") / lit(1e6), 6).as("chi2"),
          (col("chi2_u").cast("double") / lit(1e6) > 15.507).cast("long")
            .as("significant"))
    }, Some(s"""
      WITH cents AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
        FROM orders WHERE CAST(ROUND(o_totalprice * 100) AS BIGINT) > 0),
      obs AS (
        SELECT c // CAST(power(10, length(CAST(c AS VARCHAR)) - 1) AS BIGINT)
          AS digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM cents GROUP BY 1),
      spine AS (
        SELECT CAST(dd AS BIGINT) AS digit, COALESCE(n_obs, 0) AS n_obs
        FROM (SELECT unnest(range(1, 10)) AS dd) sp
        LEFT JOIN obs ON obs.digit = sp.dd),
      tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM spine),
      termb AS (
        SELECT digit, n_obs, n_total,
          (${DetMathSql.lnLong("digit + 1")} - ${DetMathSql.lnLong("digit")})
            / CAST(2.302585092994046 AS DOUBLE) AS benford_share
        FROM spine, tot),
      terms AS (
        SELECT digit, n_obs, n_total, benford_share,
          CAST(n_total AS DOUBLE) * benford_share AS exp_n
        FROM termb),
      tu AS (
        SELECT *, CASE WHEN exp_n > 0 THEN CAST(ROUND(
            (CAST(n_obs AS DOUBLE) - exp_n) * (CAST(n_obs AS DOUBLE) - exp_n)
              / exp_n * 1000000) AS BIGINT) ELSE 0 END AS term_u
        FROM terms),
      chi AS (SELECT CAST(SUM(term_u) AS BIGINT) AS chi2_u FROM tu)
      SELECT digit, n_obs,
        CASE WHEN n_total > 0 THEN
          round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
          ELSE 0.0 END AS obs_share,
        round(benford_share, 6) AS benford_share,
        round(CAST(chi2_u AS DOUBLE) / 1000000.0, 6) AS chi2,
        CAST(CAST(chi2_u AS DOUBLE) / 1000000.0 > 15.507 AS BIGINT)
          AS significant
      FROM tu, chi"""),
      notes = "Benford first-digit audit over payment amounts (the forensic-accounting screen for the reference's own domain): portable integer digit extraction on exact cents, explicit 1..9 spine, micro-unit chi-square vs log10(1+1/d) at the df=8 critical value; one digit agg + metadata algebra"),

    // ── Transaction-velocity rule (trailing-window burst detection) ────
    // The streaming-fraud rule every payments platform runs, in batch
    // form: per user, the trailing-24h event count at every event (a
    // KEYED time-range window — user-partitioned, so no global sort),
    // flagging events where the burst reaches 6. The frame is RANGE
    // over exact nanosecond LONGs (the catalog's ts contract;
    // ties-as-peers semantics identical cross-engine), counts are
    // exact integers. Output is the per-user risk summary a rules
    // engine materializes daily: total events, peak burst, flagged
    // events, and the user-level flag. At 100 TB: one user-keyed
    // shuffle; the window state is bounded by a user's 24h event
    // count. StreamingSlidingWindows is the continuous twin of this
    // shape.
    QueryDef("q193_velocity", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"))
        .rangeBetween(-86400000000000L, 0L) // trailing 24h in nanos
      t(s, d, "events")
        .select(col("user_id"), col("ts"))
        .withColumn("burst", count(lit(1)).over(w))
        .groupBy("user_id").agg(
          count(lit(1)).as("n_events"),
          max(col("burst")).as("max_burst"),
          sum(when(col("burst") >= 6, 1L).otherwise(0L)).as("n_flagged"))
        .select(col("user_id"), col("n_events"), col("max_burst"),
          col("n_flagged"),
          (col("n_flagged") > 0).cast("long").as("velocity_flag"))
    }, Some("""
      WITH w AS (
        SELECT user_id,
          CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts)
            RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS burst
        FROM events)
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        CAST(MAX(burst) AS BIGINT) AS max_burst,
        CAST(SUM(CASE WHEN burst >= 6 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_flagged,
        CAST(SUM(CASE WHEN burst >= 6 THEN 1 ELSE 0 END) > 0 AS BIGINT)
          AS velocity_flag
      FROM w GROUP BY user_id"""),
      notes = "trailing-24h transaction-velocity rule per user (the payments-fraud burst screen): keyed RANGE window over exact nanosecond LONGs (ties-as-peers identical cross-engine), per-user risk summary with peak burst + flag; one user-keyed shuffle, bounded window state"),

    // ── Kaplan-Meier survival estimate (time-to-conversion, censored) ──
    // The time-to-event primitive beside q97's retention and q98's
    // funnel: per user, duration (whole days) from first activity to
    // first purchase, RIGHT-CENSORED at the last observed event for
    // users who never convert — censoring is the whole point of KM
    // (dropping non-converters overstates conversion speed). The
    // estimator Ŝ(t) = Π_{t_i ≤ t} (1 − d_i/n_i) runs over the
    // per-day event table — a METADATA axis (observation-span days),
    // so both prefix quantities (prior removals for n_at_risk, prior
    // ln-terms for the product) come from the GlobalOrder-offsets
    // pattern: bounded day < day self-joins on the daily aggregate —
    // no window anywhere, no single-partition stage over data. The
    // product is exact-input ln terms in nano-units (q77's residual
    // class; (n−d)/n clamped at 1e-12 so a last-day total failure
    // stays ANSI-finite), exponentiated once per emitted row.
    QueryDef("q199_kaplan_meier", (s, d) => {
      val perUser = t(s, d, "events").groupBy("user_id").agg(
          min(col("ts")).as("t0"),
          max(col("ts")).as("t_end"),
          min(when(col("event_type") === "purchase", col("ts"))).as("t_conv"))
        .select(col("user_id"),
          (coalesce(col("t_conv"), col("t_end")) - col("t0")).as("span_ns"),
          col("t_conv").isNotNull.cast("long").as("converted"))
        .withColumn("day", expr("span_ns div 86400000000000"))
      val nTotal = perUser.agg(count(lit(1)).as("n_total"))
      val daily = perUser.groupBy("day").agg(
          sum(col("converted")).as("d_events"),
          sum(lit(1L) - col("converted")).as("c_censored"))
        .localCheckpoint(true) // tiny; read by two self-joins below
      val atRisk = daily.as("a")
        .join(broadcast(daily.as("b")), col("b.day") < col("a.day"),
          "left_outer")
        .groupBy(col("a.day").as("day"), col("a.d_events").as("d_events"),
          col("a.c_censored").as("c_censored"))
        .agg(coalesce(sum(col("b.d_events") + col("b.c_censored")), lit(0L))
          .as("prior_removed"))
        .crossJoin(broadcast(nTotal))
        .withColumn("n_at_risk", col("n_total") - col("prior_removed"))
        // detLn keeps the term bit-identical cross-engine; the total-
        // failure day (n==d) pins the old greatest(..., 1e-12) clamp as
        // the precomputed constant round(ln(1e-12)*1e9) = -27631021116
        .withColumn("term_u", when(col("d_events") > 0,
          when(col("n_at_risk") > col("d_events"),
            round(graft.functions.DetMath.detLnRatio(
              col("n_at_risk") - col("d_events"), col("n_at_risk"))
              * lit(1e9)).cast("long"))
          .otherwise(lit(-27631021116L))).otherwise(lit(0L)))
        .localCheckpoint(true) // ≤ span-days rows; read by the cum join
      atRisk.as("x")
        .join(broadcast(atRisk.as("y")), col("y.day") <= col("x.day"))
        .groupBy(col("x.day").as("day"), col("x.n_at_risk").as("n_at_risk"),
          col("x.d_events").as("n_events"),
          col("x.c_censored").as("n_censored"))
        .agg(sum(col("y.term_u")).as("cum_ln_u"))
        .filter(col("n_events") > 0)
        // detExp (domain-floored at -86: e^-86 already rounds to 0 at
        // 6 dp, and the floor keeps the 2^k split inside BIGINT even if
        // many total-failure days stack); micro-first 6-dp surfacing
        .select(col("day"), col("n_at_risk"), col("n_events"),
          col("n_censored"),
          (round(graft.functions.DetMath.detExp(greatest(
            col("cum_ln_u").cast("double") / lit(1e9), lit(-86.0)))
            * lit(1e6)).cast("long") / lit(1e6)).as("survival"))
    }, Some(s"""
      WITH pu AS (
        SELECT user_id,
          min(epoch_ns(ts)) AS t0, max(epoch_ns(ts)) AS t_end,
          min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
            AS t_conv
        FROM events GROUP BY user_id),
      durs AS (
        SELECT user_id,
          (COALESCE(t_conv, t_end) - t0) // 86400000000000 AS day,
          CAST(t_conv IS NOT NULL AS BIGINT) AS converted
        FROM pu),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM durs),
      daily AS (
        SELECT day, CAST(SUM(converted) AS BIGINT) AS d_events,
          CAST(SUM(1 - converted) AS BIGINT) AS c_censored
        FROM durs GROUP BY day),
      ar AS (
        SELECT day, d_events, c_censored,
          nt.n_total - CAST(COALESCE(SUM(d_events + c_censored) OVER
            (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS n_at_risk
        FROM daily, nt),
      arp AS (SELECT *, n_at_risk - d_events AS srv FROM ar),
      terms AS (
        SELECT *, CASE WHEN d_events > 0 THEN
            (CASE WHEN n_at_risk > d_events THEN CAST(ROUND(
              (${DetMathSql.lnLong("srv")} -
               ${DetMathSql.lnLong("n_at_risk")}) * 1000000000) AS BIGINT)
             ELSE -27631021116 END)
          ELSE 0 END AS term_u
        FROM arp),
      km AS (
        SELECT day, n_at_risk, d_events AS n_events,
          c_censored AS n_censored,
          CAST(SUM(term_u) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_ln_u
        FROM terms),
      kmx AS (SELECT *,
          greatest(CAST(cum_ln_u AS DOUBLE) / 1000000000.0, -86.0) AS dx
        FROM km),
      kmk AS (SELECT *, ${DetMathSql.expK("dx")} AS ek FROM kmx),
      kmr AS (SELECT *, ${DetMathSql.expR("dx", "ek")} AS er,
          ${DetMathSql.expK1("ek")} AS ek1 FROM kmk),
      kmq AS (SELECT *, ek - ek1 AS ek2, ${DetMathSql.expPoly("er")} AS ep
        FROM kmr)
      SELECT day, n_at_risk, n_events, n_censored,
        CAST(ROUND(
          ${DetMathSql.expScale(DetMathSql.expScale("ep", "ek1"), "ek2")}
          * 1000000) AS BIGINT) / 1000000.0 AS survival
      FROM kmq WHERE n_events > 0"""),
      notes = "Kaplan-Meier time-to-conversion with right-censoring at last observation: per-user durations in one keyed agg, KM product as nano-unit exact ln terms over the metadata day axis — both prefixes (at-risk, cumulative ln) via bounded day<day self-joins (the GlobalOrder-offsets pattern), NO window in the Spark plan"),

    // ── Cohort LTV curves (cumulative revenue per user by cohort age) ──
    // The payments-analytics completion of q97's retention matrix:
    // per first-seen-week cohort and week offset, active users and
    // purchase revenue, accumulated into LTV (cumulative revenue per
    // cohort member). Revenue sums exact integer CENTS
    // (round(value·100) — the q192 exactness trick), the cumulative
    // runs in a COHORT-KEYED window (partitioned — no single-partition
    // stage), and LTV divides two exact integers per row. Weeks use
    // the q97 floor-div convention, exact for pre-1970 nanos.
    QueryDef("q200_cohort_ltv", (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("value"))
        // true FLOOR division (q97's negative-remainder correction) so
        // pre-1970 nanos bucket identically to DuckDB's `//`
        .withColumn("week", expr("ts div 604800000000000 - " +
          "(CASE WHEN ts % 604800000000000 < 0 THEN 1 ELSE 0 END)"))
      val firstSeen = ev.groupBy("user_id").agg(min(col("week")).as("cweek"))
      val sized = firstSeen.groupBy("cweek").agg(
        count(lit(1)).as("cohort_size"))
      val weekly = ev.join(firstSeen, "user_id")
        .withColumn("offset", col("week") - col("cweek"))
        .groupBy(col("cweek"), col("offset")).agg(
          count_distinct(col("user_id")).as("active_users"),
          sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L))
            .as("revenue_cents"))
      val wCum = Window.partitionBy("cweek").orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      weekly.join(broadcast(sized), "cweek")
        .withColumn("cum_revenue_cents", sum("revenue_cents").over(wCum))
        .select(col("cweek").as("cohort_week"), col("offset").as("week_offset"),
          col("cohort_size"), col("active_users"), col("revenue_cents"),
          col("cum_revenue_cents"),
          round(col("cum_revenue_cents").cast("double") / lit(100.0) /
            col("cohort_size").cast("double"), 6).as("ltv"))
    }, Some("""
      WITH ev AS (
        SELECT user_id, event_type, value,
          epoch_ns(ts) // 604800000000000 AS week
        FROM events),
      fs AS (SELECT user_id, MIN(week) AS cweek FROM ev GROUP BY user_id),
      sized AS (SELECT cweek, CAST(COUNT(*) AS BIGINT) AS cohort_size
        FROM fs GROUP BY cweek),
      weekly AS (
        SELECT fs.cweek, ev.week - fs.cweek AS woff,
          CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS active_users,
          CAST(SUM(CASE WHEN ev.event_type = 'purchase'
            THEN CAST(ROUND(ev.value * 100) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS revenue_cents
        FROM ev JOIN fs ON fs.user_id = ev.user_id
        GROUP BY fs.cweek, ev.week - fs.cweek),
      cum AS (
        SELECT w.*, s.cohort_size,
          CAST(SUM(revenue_cents) OVER (PARTITION BY w.cweek ORDER BY woff
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum_revenue_cents
        FROM weekly w JOIN sized s ON s.cweek = w.cweek)
      SELECT cweek AS cohort_week, woff AS week_offset, cohort_size,
        active_users, revenue_cents, cum_revenue_cents,
        round(CAST(cum_revenue_cents AS DOUBLE) / 100.0 /
          CAST(cohort_size AS DOUBLE), 6) AS ltv
      FROM cum"""),
      notes = "cohort LTV curves (q97 retention's revenue completion): per (first-seen-week cohort, offset) active users + purchase revenue in exact integer cents, cohort-keyed cumulative window (partitioned — no single-partition stage), LTV = cumulative cents per cohort member"),

    // ── RFM customer segmentation (the CRM classic) ────────────────────
    // Recency / Frequency / Monetary quintile scoring — the
    // segmentation every payments CRM ships: per customer, last order
    // time, order count, exact-cents spend; each metric ranked
    // corpus-wide by GlobalOrder (the q144/q147 shape — three range
    // partitions, NO single-partition window) and mapped to a 1–5
    // quintile by the q148 integer formula (rank−1)·5 div n + 1, so
    // score 5 = most recent / most frequent / biggest spender. The
    // segment label is a fixed CASE policy (champion / loyal /
    // big_spender / at_risk / hibernating / regular), mirrored
    // branch-for-branch in the oracle — policy order is semantics.
    // Deterministic throughout: ranks tiebreak on custkey, money is
    // integer cents.
    QueryDef("q201_rfm", (s, d) => {
      val base = t(s, d, "orders").groupBy(col("o_custkey").as("c_custkey"))
        .agg(
          unix_micros(max(col("o_orderdate")).cast("timestamp"))
            .as("last_us"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long"))
            .as("monetary_cents"))
      val n = base.agg(count(lit(1)).as("n_c"))
      // withRowNumbersMulti: pins the base internally and runs three
      // INDEPENDENT rank passes — the chained-rank misuse (q201's own
      // regression class) is unexpressible through this API
      val ranked = graft.operators.GlobalOrder.withRowNumbersMulti(
        base, Seq("c_custkey"), Seq(
          (Seq(col("last_us").asc, col("c_custkey").asc), "r_r"),
          (Seq(col("freq").asc, col("c_custkey").asc), "f_r"),
          (Seq(col("monetary_cents").asc, col("c_custkey").asc), "m_r")))
      ranked.crossJoin(broadcast(n))
        .select(col("c_custkey"), col("last_us"), col("freq"),
          col("monetary_cents"),
          expr("(r_r - 1) * 5 div n_c + 1").as("r_score"),
          expr("(f_r - 1) * 5 div n_c + 1").as("f_score"),
          expr("(m_r - 1) * 5 div n_c + 1").as("m_score"))
        .withColumn("segment",
          when(col("r_score") >= 4 && col("f_score") >= 4 &&
            col("m_score") >= 4, "champion")
          .when(col("f_score") >= 4, "loyal")
          .when(col("m_score") >= 4, "big_spender")
          .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
          .when(col("r_score") <= 2, "hibernating")
          .otherwise("regular"))
    }, Some("""
      WITH base AS (
        SELECT o_custkey AS c_custkey,
          epoch_us(MAX(o_orderdate)) AS last_us,
          COUNT(*) AS freq,
          CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS monetary_cents
        FROM orders GROUP BY 1),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_c FROM base),
      rk AS (SELECT *,
          row_number() OVER (ORDER BY last_us ASC, c_custkey ASC) AS r_r,
          row_number() OVER (ORDER BY freq ASC, c_custkey ASC) AS f_r,
          row_number() OVER (ORDER BY monetary_cents ASC, c_custkey ASC)
            AS m_r
        FROM base),
      sc AS (SELECT c_custkey, last_us, freq, monetary_cents,
          (r_r - 1) * 5 // nn.n_c + 1 AS r_score,
          (f_r - 1) * 5 // nn.n_c + 1 AS f_score,
          (m_r - 1) * 5 // nn.n_c + 1 AS m_score
        FROM rk, nn)
      SELECT c_custkey, last_us, freq, monetary_cents,
        r_score, f_score, m_score,
        CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
               THEN 'champion'
             WHEN f_score >= 4 THEN 'loyal'
             WHEN m_score >= 4 THEN 'big_spender'
             WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
             WHEN r_score <= 2 THEN 'hibernating'
             ELSE 'regular' END AS segment
      FROM sc"""),
      notes = "RFM quintile segmentation (the payments CRM classic): per-customer recency/frequency/exact-cents monetary, corpus-wide quintiles via GlobalOrder ranks (no single-partition window) + the q148 integer formula, fixed CASE segment policy mirrored branch-for-branch in the oracle")
  )
}
