package graft.rel

import graft.{NamedQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [engine-added] Relational operator inventory over the driver fixture
  * tables (SURVEY.md §2.B): scans with pushed filters, projections, every
  * join flavor (inner, broadcast, semi, anti), hash aggregation with
  * partial/map-side combine, ranking + running-window functions, set
  * operations, rollup, top-k (`TakeOrderedAndProject`), scalar
  * string/date/JSON functions, and a scalar subquery. Every query here is
  * hash-checked against a DuckDB oracle by the driver.
  *
  * Determinism rules (driver compares row/schema/hash): every floating
  * aggregate is `round()`ed identically on both sides, every output is
  * fully `ORDER BY`-determined with unique tie-breakers, dates are
  * formatted to strings, and column names/aliases match the oracle SQL
  * exactly.
  *
  * Scale notes: fact-to-fact joins key on the join column and let AQE pick
  * shuffle vs broadcast; dimension joins (`nation`, `region`, `customer`,
  * `supplier`) are explicitly `broadcast()` — at 100 TB the fact side never
  * shuffles for those. Filters sit directly on the scan so Parquet gets
  * them pushed (`PushedFilters` in explain).
  */
object RelQueries {
  import Tables.t

  /** Exact money arithmetic for COARSE-group revenue aggregates (whole-
    * table / per-nation group sizes): the fixture's price columns are
    * 2-decimal values stored as DOUBLE, so a double sum's error grows
    * with group magnitude and, under a different summation order than
    * the oracle's, can flip a round(…, 2) boundary — it DID at the 10×
    * measured point's ~1e10 revenues (q05: …500.76 vs …500.77), and a
    * 100 TB sum is 6 orders further out. Re-anchoring each operand to
    * DECIMAL (exact: the doubles are within 1e-9 of their true cent
    * value, so both engines round to the same cent) keeps every product
    * and the whole sum exact — order-independent by construction.
    * Fine-group sums (per-order, per-customer: ≤ a few hundred rows)
    * stay double: their absolute error is ~1e-11, never near a
    * boundary. `money` for 2-decimal amounts, `frac` for the (1 ± rate)
    * factors — (18,2)·(3,2)·(3,2) → DECIMAL(26,6), whose 38-capped sum
    * never truncates. */
  private def money(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(18,2)")
  private def frac(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c.cast("decimal(3,2)")

  val defs: Seq[NamedQuery] = Seq(
    // --- scan + filter + aggregate (TPC-H Q1 shape) ------------------
    NamedQuery(
      "q01_pricing_summary",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            round(sum(money(col("l_quantity"))), 2).cast("double").as("sum_qty"),
            round(sum(money(col("l_extendedprice"))), 2).cast("double").as("sum_base_price"),
            round(sum(money(col("l_extendedprice")) * frac(lit(1) - col("l_discount"))), 2)
              .cast("double").as("sum_disc_price"),
            round(sum(money(col("l_extendedprice")) * frac(lit(1) - col("l_discount")) *
              frac(lit(1) + col("l_tax"))), 2).cast("double").as("sum_charge"),
            round(avg("l_quantity"), 4).as("avg_qty"),
            round(avg("l_extendedprice"), 4).as("avg_price"),
            round(avg("l_discount"), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some(
        "SELECT l_returnflag, l_linestatus, " +
          "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_qty, " +
          "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_base_price, " +
          "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(3,2))),2) AS DOUBLE) AS sum_disc_price, " +
          "CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(3,2))*CAST(1+l_tax AS DECIMAL(3,2))),2) AS DOUBLE) AS sum_charge, " +
          "round(avg(l_quantity),4) AS avg_qty, round(avg(l_extendedprice),4) AS avg_price, " +
          "round(avg(l_discount),4) AS avg_disc, count(*) AS count_order " +
          "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
          "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus")),

    // --- tight predicate pushdown (TPC-H Q6 shape) -------------------
    NamedQuery(
      "q02_revenue_forecast",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
          .agg(
            round(sum(money(col("l_extendedprice")) * frac(col("l_discount"))), 2)
              .cast("double").as("revenue"),
            count(lit(1)).as("n_rows")),
      Some(
        "SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(l_discount AS DECIMAL(3,2))),2) AS DOUBLE) AS revenue, count(*) AS n_rows " +
          "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
          "AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24")),

    // --- 3-way join + agg + top-k (TPC-H Q3 shape) -------------------
    NamedQuery(
      "q03_top_orders",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
        val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey")
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            first(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("orderdate"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some(
        "SELECT o_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, " +
          "strftime(any_value(o_orderdate), '%Y-%m-%d') AS orderdate " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "JOIN customer ON o_custkey = c_custkey " +
          "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1996-07-01' " +
          "AND l_shipdate > TIMESTAMP '1996-07-01' " +
          "GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10")),

    // --- semi join (EXISTS) ------------------------------------------
    NamedQuery(
      "q04_priority_with_big_items",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val big = t(s, dir, "lineitem").filter(col("l_quantity") >= 48).select("l_orderkey")
        o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      Some(
        "SELECT o_orderpriority, count(*) AS order_count FROM orders " +
          "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48) " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    // --- star join through two broadcast dims (TPC-H Q5 flavor) ------
    NamedQuery(
      "q05_nation_revenue",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
        val sup = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            round(sum(money(col("l_extendedprice")) * frac(lit(1) - col("l_discount"))), 2)
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some(
        "SELECT r_name, n_name, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))*CAST(1-l_discount AS DECIMAL(3,2))),2) AS DOUBLE) AS revenue, count(*) AS n_items " +
          "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
          "JOIN nation ON s_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
          "GROUP BY r_name, n_name ORDER BY r_name, n_name")),

    // --- ranking window ----------------------------------------------
    NamedQuery(
      "q06_top3_orders_per_segment",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val w = Window
          .partitionBy("c_mktsegment")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("c_mktsegment"), col("rnk"), col("o_orderkey"), col("o_totalprice"))
          .orderBy("c_mktsegment", "rnk")
      },
      Some(
        "SELECT c_mktsegment, rnk, o_orderkey, o_totalprice FROM (" +
          "SELECT c_mktsegment, o_orderkey, o_totalprice, " +
          "row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk " +
          "FROM orders JOIN customer ON o_custkey = c_custkey) " +
          "WHERE rnk <= 3 ORDER BY c_mktsegment, rnk")),

    // --- running-total window ----------------------------------------
    NamedQuery(
      "q07_customer_running_spend",
      (s, dir) => {
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .filter(col("o_custkey") <= 100)
          .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
          .select("o_custkey", "o_orderkey", "running_spend")
          .orderBy("o_custkey", "o_orderkey")
      },
      Some(
        "SELECT o_custkey, o_orderkey, round(sum(o_totalprice) OVER (" +
          "PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_spend " +
          "FROM orders WHERE o_custkey <= 100 ORDER BY o_custkey, o_orderkey")),

    // --- anti join (NOT EXISTS) --------------------------------------
    NamedQuery(
      "q08_customers_without_orders",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders").select("o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      Some(
        "SELECT c_custkey, c_name FROM customer " +
          "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey")),

    // --- set operations ----------------------------------------------
    NamedQuery(
      "q09_segment_set_algebra",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val rich = c.filter(col("c_acctbal") > 8000).select("c_custkey")
        val open = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("c_custkey"))
        val machinery = c.filter(col("c_mktsegment") === "MACHINERY").select("c_custkey")
        rich.union(open).distinct().except(machinery).orderBy("c_custkey")
      },
      Some(
        "(SELECT c_custkey FROM customer WHERE c_acctbal > 8000 " +
          "UNION SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O') " +
          "EXCEPT SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY' ORDER BY c_custkey")),

    // --- rollup --------------------------------------------------------
    NamedQuery(
      "q10_returnflag_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"), round(sum("l_quantity"), 2).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
            coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
            col("n_rows"),
            col("sum_qty"))
          .orderBy("rf", "ls"),
      Some(
        "SELECT coalesce(l_returnflag,'(all)') AS rf, coalesce(l_linestatus,'(all)') AS ls, " +
          "count(*) AS n_rows, round(sum(l_quantity),2) AS sum_qty " +
          "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls")),

    // --- distinct aggregation ----------------------------------------
    NamedQuery(
      "q11_nation_customer_profile",
      (s, dir) =>
        t(s, dir, "customer")
          .groupBy("c_nationkey")
          .agg(
            count(lit(1)).as("n_customers"),
            countDistinct(col("c_mktsegment")).as("n_segments"),
            round(sum("c_acctbal"), 2).as("total_bal"))
          .orderBy("c_nationkey"),
      Some(
        "SELECT c_nationkey, count(*) AS n_customers, count(DISTINCT c_mktsegment) AS n_segments, " +
          "round(sum(c_acctbal),2) AS total_bal FROM customer GROUP BY c_nationkey ORDER BY c_nationkey")),

    // --- scalar string functions -------------------------------------
    NamedQuery(
      "q12_part_strings",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_uc"),
            substring(col("p_name"), 1, 8).as("name_pfx"),
            length(col("p_name")).as("name_len"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            regexp_replace(col("p_type"), " ", "_").as("type_snake"),
            col("p_name").like("%a%").as("has_a"))
          .orderBy("p_partkey")
          .limit(50),
      Some(
        "SELECT p_partkey, upper(p_brand) AS brand_uc, substring(p_name,1,8) AS name_pfx, " +
          "length(p_name) AS name_len, concat_ws('|', p_brand, p_type) AS brand_type, " +
          "replace(p_type, ' ', '_') AS type_snake, p_name LIKE '%a%' AS has_a " +
          "FROM part ORDER BY p_partkey LIMIT 50")),

    // --- date functions + agg ----------------------------------------
    NamedQuery(
      "q13_orders_by_month",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("order_month"))
          .agg(
            count(lit(1)).as("n_orders"),
            round(sum(money(col("o_totalprice"))), 2).cast("double").as("total"),
            round(avg("o_totalprice"), 4).as("avg_price"))
          .orderBy("order_month"),
      Some(
        "SELECT strftime(o_orderdate, '%Y-%m') AS order_month, count(*) AS n_orders, " +
          "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE) AS total, round(avg(o_totalprice),4) AS avg_price " +
          "FROM orders GROUP BY 1 ORDER BY order_month")),

    // --- JSON extraction ---------------------------------------------
    NamedQuery(
      "q14_json_props",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS bigint)"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
          // Spark sorts ASC nulls-first, DuckDB nulls-last — pin it so the
          // driver's ordered hash can't diverge on a null bucket.
          .orderBy(col("k_bucket").asc_nulls_last),
      Some(
        "SELECT TRY_CAST(json_extract_string(props,'$.k') AS BIGINT) % 10 AS k_bucket, " +
          "count(*) AS n_events, round(sum(value),2) AS total_value " +
          "FROM events GROUP BY 1 ORDER BY k_bucket NULLS LAST")),

    // --- event-time tumbling windows (batch form) --------------------
    NamedQuery(
      "q15_daily_event_stats",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            round(sum("value"), 2).as("sum_value"),
            round(min("value"), 2).as("min_value"),
            round(max("value"), 2).as("max_value"))
          .orderBy("day", "event_type"),
      Some(
        "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*) AS n_events, " +
          "round(sum(value),2) AS sum_value, round(min(value),2) AS min_value, round(max(value),2) AS max_value " +
          "FROM events GROUP BY 1, 2 ORDER BY day, event_type")),

    // --- scalar subquery ---------------------------------------------
    NamedQuery(
      "q16_above_average_orders",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val a = o.agg(avg("o_totalprice").as("ap"))
        o.crossJoin(a)
          .filter(col("o_totalprice") > col("ap"))
          .agg(
            count(lit(1)).as("n_above"),
            round(sum(money(col("o_totalprice"))), 2).cast("double").as("sum_above"))
      },
      Some(
        "SELECT count(*) AS n_above, CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_above FROM orders " +
          "WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)")),

    // --- global top-k (TakeOrderedAndProject) ------------------------
    NamedQuery(
      "q17_most_expensive_items",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_extendedprice")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(20),
      Some(
        "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
          "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20")),

    // --- cube + grouping id ------------------------------------------
    NamedQuery(
      "q18_status_cube",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube("l_returnflag", "l_linestatus")
          .agg(
            grouping_id().as("gid"),
            count(lit(1)).as("n_rows"),
            round(sum(money(col("l_extendedprice"))), 2).cast("double").as("sum_price"))
          .select(
            coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
            coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
            col("gid"),
            col("n_rows"),
            col("sum_price"))
          .orderBy("gid", "rf", "ls"),
      Some(
        "SELECT coalesce(l_returnflag,'(all)') AS rf, coalesce(l_linestatus,'(all)') AS ls, " +
          "GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid, " +
          "count(*) AS n_rows, CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))),2) AS DOUBLE) AS sum_price " +
          "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus) ORDER BY gid, rf, ls")),

    // --- exact interpolated percentiles ------------------------------
    NamedQuery(
      "q19_quantity_percentiles",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            // one percentile buffer per COLUMN, not per requested quantile —
            // the array form makes l_quantity's 600k-value multiset buffer
            // once for both cut points
            expr("percentile(l_quantity, array(0.5, 0.9))").as("qp"),
            round(expr("percentile(l_extendedprice, 0.95)"), 4).as("price_p95"))
          .select(
            col("l_returnflag"),
            round(element_at(col("qp"), 1), 4).as("p50"),
            round(element_at(col("qp"), 2), 4).as("p90"),
            col("price_p95"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, round(quantile_cont(l_quantity, 0.5), 4) AS p50, " +
          "round(quantile_cont(l_quantity, 0.9), 4) AS p90, " +
          "round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95 " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // --- ordered array aggregation -----------------------------------
    NamedQuery(
      "q20_order_linenumbers",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 50)
          .groupBy("l_orderkey")
          .agg(
            count(lit(1)).as("n_items"),
            array_join(array_sort(collect_list(col("l_linenumber"))), ",").as("linenumbers"))
          .orderBy("l_orderkey"),
      Some(
        "SELECT l_orderkey, count(*) AS n_items, " +
          "array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers " +
          "FROM lineitem WHERE l_orderkey <= 50 GROUP BY l_orderkey ORDER BY l_orderkey")),

    // --- sessionization (gap > 30 min ⇒ new session) ------------------
    NamedQuery(
      "q22_user_sessions",
      (s, dir) => {
        val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("prev", lag("us", 1).over(wOrd))
          .withColumn(
            "is_new",
            when(col("prev").isNull || col("us") - col("prev") > 30L * 60 * 1000000L, 1L).otherwise(0L))
          .withColumn("session_idx", sum("is_new").over(wRun))
          .groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_events"),
            min("us").as("start_us"),
            (max(col("us")) - min(col("us"))).as("dur_us"))
          .orderBy("user_id", "session_idx")
      },
      Some(
        "SELECT user_id, session_idx, count(*) AS n_events, min(us) AS start_us, " +
          "max(us) - min(us) AS dur_us FROM (" +
          // CAST: DuckDB's window sum(int) yields HUGEINT; Spark emits BIGINT —
          // hash-compare needs both engines to serialize a 64-bit integer.
          "SELECT user_id, us, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx FROM (" +
          "SELECT user_id, event_id, us, CASE WHEN prev IS NULL OR us - prev > 30*60*1000000 " +
          "THEN 1 ELSE 0 END AS is_new FROM (" +
          "SELECT user_id, event_id, epoch_us(ts) AS us, " +
          "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev " +
          "FROM events))) GROUP BY user_id, session_idx ORDER BY user_id, session_idx")),

    // --- pivot via filtered aggregates --------------------------------
    NamedQuery(
      "q23_daily_type_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val aggs = types.map(ty => count(when(col("event_type") === ty, 1)).as(s"n_$ty")) :+
          round(coalesce(sum(when(col("event_type") === "purchase", col("value"))), lit(0.0)), 2)
            .as("purchase_value")
        t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(aggs.head, aggs.tail: _*)
          .orderBy("day")
      },
      Some(
        "SELECT strftime(ts, '%Y-%m-%d') AS day, " +
          Seq("click", "error", "purchase", "signup", "view")
            .map(ty => s"count(*) FILTER (WHERE event_type = '$ty') AS n_$ty")
            .mkString(", ") +
          ", round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0.0), 2) AS purchase_value " +
          "FROM events GROUP BY 1 ORDER BY day")),

    // --- unpivot (melt): the wide-to-long inverse of q23 --------------
    // Spark's native Dataset.unpivot turns q23's per-type count columns
    // back into (day, event_type, n) rows — the round-trip proves pivot
    // and unpivot are exact inverses INCLUDING the zero-count cells the
    // wide form materializes and a bare groupBy would omit. The oracle
    // replays the long form as a zero-filled day × type grid.
    NamedQuery(
      "q36_daily_type_unpivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val aggs = types.map(ty => count(when(col("event_type") === ty, 1)).as(s"n_$ty"))
        val wide = t(s, dir, "events")
          .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
          .agg(aggs.head, aggs.tail: _*)
        wide.unpivot(
          ids = Array(col("day")),
          values = types.map(ty => col(s"n_$ty")).toArray,
          variableColumnName = "type_col",
          valueColumnName = "n")
          .select(
            col("day"),
            expr("substring(type_col, 3)").as("event_type"),
            col("n"))
          .orderBy("day", "event_type")
      },
      Some(
        "WITH days AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS day FROM events), " +
          "types AS (SELECT unnest(['click', 'error', 'purchase', 'signup', 'view']) AS event_type), " +
          "grid AS (SELECT day, event_type FROM days CROSS JOIN types), " +
          "cnt AS (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, " +
          "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2) " +
          "SELECT g.day, g.event_type, coalesce(c.n, 0) AS n " +
          "FROM grid g LEFT JOIN cnt c ON g.day = c.day AND g.event_type = c.event_type " +
          "ORDER BY 1, 2")),

    // --- full outer join ----------------------------------------------
    NamedQuery(
      "q24_customer_order_coverage",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
        val o = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
        c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_custkey").isNotNull.as("has_customer"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("spend"), lit(0.0)).as("spend"))
          .orderBy("custkey")
      },
      Some(
        "SELECT coalesce(c_custkey, o_custkey) AS custkey, c_custkey IS NOT NULL AS has_customer, " +
          "coalesce(n_orders, 0) AS n_orders, coalesce(spend, 0.0) AS spend " +
          "FROM customer FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders, " +
          "round(sum(o_totalprice),2) AS spend FROM orders GROUP BY o_custkey) o " +
          "ON c_custkey = o_custkey ORDER BY custkey")),

    // --- intersect ----------------------------------------------------
    NamedQuery(
      "q25_buyers_in_both_segments",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
        val closed = o.filter(col("o_orderstatus") === "F").select("o_custkey")
        open.intersect(closed).orderBy("o_custkey")
      },
      Some(
        "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' " +
          "INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' ORDER BY o_custkey")),

    // --- statistical aggregates (corr, stddev, variance) -------------
    NamedQuery(
      "q21_stats_profile",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(corr("l_quantity", "l_extendedprice").cast("float").cast("double"), 4).as("qty_price_corr"),
            round(stddev_samp("l_quantity").cast("float").cast("double"), 4).as("qty_stddev"),
            round(var_samp("l_discount").cast("float").cast("double"), 4).as("disc_var"))
          .orderBy("l_returnflag"),
      Some(
        "SELECT l_returnflag, " +
          "round(CAST(CAST(corr(l_quantity, l_extendedprice) AS REAL) AS DOUBLE), 4) AS qty_price_corr, " +
          "round(CAST(CAST(stddev_samp(l_quantity) AS REAL) AS DOUBLE), 4) AS qty_stddev, " +
          "round(CAST(CAST(var_samp(l_discount) AS REAL) AS DOUBLE), 4) AS disc_var " +
          "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // --- as-of join (AsOfJoin: union-tag + window, no row multiplication)
    // Each event picks up the user's most recent order at-or-before the
    // event time (ties on order date broken toward the greatest order key
    // — AsOfJoin's documented backward rule, mirrored in the QUALIFY
    // ordering). The oracle states the same thing as a prune-latest join.
    NamedQuery(
      "q26_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events").select("event_id", "user_id", "ts")
        val ord = t(s, dir, "orders")
          .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        AsOfJoin
          .backward(ev, "user_id", "ts", ord, "o_custkey", "o_orderdate",
            Seq("o_orderkey", "o_totalprice"), "o_orderkey")
          .select(
            col("event_id"),
            coalesce(col("o_orderkey"), lit(-1L)).as("o_orderkey"),
            coalesce(round(col("o_totalprice"), 2), lit(0.0)).as("o_totalprice"))
          .orderBy("event_id")
      },
      Some(
        "SELECT e.event_id AS event_id, coalesce(o.o_orderkey, -1) AS o_orderkey, " +
          "coalesce(round(o.o_totalprice, 2), 0.0) AS o_totalprice " +
          "FROM events e LEFT JOIN orders o ON o.o_custkey = e.user_id " +
          "AND o.o_orderdate <= date_trunc('microseconds', e.ts) " +
          "QUALIFY row_number() OVER (PARTITION BY e.event_id " +
          "ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) = 1 ORDER BY event_id")),

    // --- range join (RangeJoin: bucketed point-in-interval equi-join) ---
    // Within-the-hour attribution: for each purchase event, how many
    // events (any type, same user) land in [t, t+1h)? Anchors become
    // half-open intervals on the µs epoch axis, points bucket by hour,
    // and the match is an equi-join on (bucket, user) + residual filter —
    // never a BroadcastNestedLoopJoin (asserted in SamplingRangeSpec).
    NamedQuery(
      "q27_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val points = ev.select(
          col("user_id").as("p_user"),
          unix_micros(col("ts")).as("p_ts"))
        val hourUs = 3600L * 1000000L
        val anchors = ev
          .filter(col("event_type") === "purchase")
          .select(
            col("event_id").as("anchor_id"),
            col("user_id").as("a_user"),
            unix_micros(col("ts")).as("s0"),
            (unix_micros(col("ts")) + lit(hourUs)).as("e0"))
        RangeJoin
          .pointInInterval(points, "p_ts", anchors, "s0", "e0", hourUs, Seq("p_user" -> "a_user"))
          .groupBy(col("anchor_id"))
          .agg(count(lit(1)).as("n_follow"))
          .orderBy("anchor_id")
      },
      Some(
        "SELECT a.event_id AS anchor_id, count(*) AS n_follow " +
          "FROM events a JOIN events b ON b.user_id = a.user_id " +
          "AND date_trunc('microseconds', b.ts) >= date_trunc('microseconds', a.ts) " +
          "AND date_trunc('microseconds', b.ts) < date_trunc('microseconds', a.ts) + INTERVAL 1 HOUR " +
          "WHERE a.event_type = 'purchase' GROUP BY 1 ORDER BY 1")),

    // --- salted join (Skew: explicit hot-key spreading) ----------------
    // The fact⨝fact join executed through the salting path: lineitem rows
    // spread over 8 sub-keys, orders replicated once per salt. The result
    // must be salt-invariant — identical to the plain join the oracle
    // computes — which is exactly what the hash check proves.
    NamedQuery(
      "q28_salted_join",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        val ord = t(s, dir, "orders")
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        Skew
          .saltedJoin(li, ord, "l_orderkey", factor = 8)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_items"), round(sum("rev"), 2).as("revenue"))
          .orderBy("o_orderpriority")
      },
      Some(
        "SELECT o_orderpriority, count(*) AS n_items, " +
          "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
          "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
          "GROUP BY o_orderpriority ORDER BY o_orderpriority")))
}
