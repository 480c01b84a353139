package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q._

/** Relational operator inventory (SURVEY.md §2.1-§2.10): scans, filters,
  * joins (inner/left/semi/anti), aggregation, windows, sorts/limits, set
  * ops, rollup, subqueries, scalar/date/string/null/JSON functions,
  * LISTAGG, explode. Each query is the idiomatic Spark plan — broadcastable
  * dims are broadcast, aggregates are partial+final hash aggs, top-k is
  * TakeOrderedAndProject — and every result is deterministic (explicit
  * ORDER BY with unique tie-breakers, exact-decimal money math).
  */
object Relational {

  private def lineitem(s: SparkSession, dir: String) = t(s, dir, "lineitem")
  private def orders(s: SparkSession, dir: String) = t(s, dir, "orders")
  private def customer(s: SparkSession, dir: String) = t(s, dir, "customer")
  private def supplier(s: SparkSession, dir: String) = t(s, dir, "supplier")
  private def nation(s: SparkSession, dir: String) = t(s, dir, "nation")
  private def region(s: SparkSession, dir: String) = t(s, dir, "region")
  private def part(s: SparkSession, dir: String) = t(s, dir, "part")
  private def events(s: SparkSession, dir: String) = t(s, dir, "events")

  private val one = lit(1).cast(org.apache.spark.sql.types.DecimalType(4, 2))

  val defs: Seq[QDef] = Seq(

    // ---- scan + grouped aggregation (TPC-H Q1 shape) ------------------
    QDef("q01_pricing_summary",
      (s, dir) => lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          // the group sums are decimal-exact (order-independent), but at
          // sf1 they reach 17 significant digits and the final
          // decimal->double cast rounds differently per engine (observed:
          // sum_charge 1 ulp apart at 4.6e10). Publishing round(x, 2)
          // keeps the compare exact at any corpus size.
          round(sumd(d(col("l_quantity"))), 2).as("sum_qty"),
          round(sumd(d(col("l_extendedprice"))), 2).as("sum_base_price"),
          round(sumd(d(col("l_extendedprice")) * (one - r(col("l_discount")))), 2).as("sum_disc_price"),
          round(sumd(d(col("l_extendedprice")) * (one - r(col("l_discount"))) * (one + r(col("l_tax")))), 2).as("sum_charge"),
          (sumd(d(col("l_quantity"))) / count(lit(1))).as("avg_qty"),
          (sumd(d(col("l_extendedprice"))) / count(lit(1))).as("avg_price"),
          (sumd(r(col("l_discount"))) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_disc_price,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE), 2) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""")),

    // ---- selective filter + ungrouped aggregate (TPC-H Q6 shape) ------
    QDef("q02_revenue_filter",
      (s, dir) => lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
        .agg(sumd(d(col("l_extendedprice")) * r(col("l_discount"))).as("revenue")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""")),

    // ---- 3-way join + agg + top-k (TPC-H Q3 shape) --------------------
    QDef("q03_top_orders",
      (s, dir) => customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sumd(d(col("l_extendedprice")) * (one - r(col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---- semi join (EXISTS) -------------------------------------------
    QDef("q04_semi_join_priority",
      (s, dir) => orders(s, dir)
        .join(lineitem(s, dir).filter(col("l_quantity") >= 49)
          .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ---- 6-way join with broadcast dims (TPC-H Q5 shape) --------------
    QDef("q05_nation_revenue",
      (s, dir) => customer(s, dir)
        .join(orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
        .join(supplier(s, dir),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .groupBy(col("n_name"))
        .agg(sumd(d(col("l_extendedprice")) * (one - r(col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name")),
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // ---- anti join (NOT EXISTS) ---------------------------------------
    QDef("q06_anti_join_customers",
      (s, dir) => customer(s, dir)
        .join(orders(s, dir).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- left outer join + null-aware aggregation ---------------------
    QDef("q07_left_join_balance",
      (s, dir) => broadcast(nation(s, dir))
        .join(customer(s, dir), col("c_nationkey") === col("n_nationkey"), "left_outer")
        .groupBy(col("n_name"))
        .agg(
          count(col("c_custkey")).as("n_customers"),
          coalesce(sum(d(col("c_acctbal"))), lit(0)).cast("double").as("total_bal"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name, COUNT(c_custkey) AS n_customers,
        CAST(COALESCE(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_bal
        FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---- HAVING --------------------------------------------------------
    QDef("q08_having",
      (s, dir) => customer(s, dir)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 40)
        .orderBy(col("c_nationkey")),
      Some("""SELECT c_nationkey, COUNT(*) AS cnt FROM customer
        GROUP BY c_nationkey HAVING COUNT(*) > 40 ORDER BY c_nationkey""")),

    // ---- IN subquery ---------------------------------------------------
    QDef("q09_in_subquery",
      (s, dir) => orders(s, dir)
        .join(customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")),
      Some("""SELECT COUNT(*) AS n FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""")),

    // ---- scalar subquery ----------------------------------------------
    QDef("q10_scalar_subquery",
      (s, dir) => Q.sql(s, dir,
        """SELECT p_partkey, p_name, p_retailprice FROM part
           WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM part)
           ORDER BY p_partkey"""),
      Some("""SELECT p_partkey, p_name, p_retailprice FROM part
        WHERE p_retailprice > (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM part)
        ORDER BY p_partkey""")),

    // ---- order by + limit (top-k) -------------------------------------
    QDef("q11_topk",
      (s, dir) => orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(5),
      Some("""SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 5""")),

    // ---- distinct ------------------------------------------------------
    QDef("q12_distinct",
      (s, dir) => lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        ORDER BY l_returnflag, l_linestatus""")),

    // ---- set ops -------------------------------------------------------
    QDef("q13_union",
      (s, dir) => nation(s, dir).select(col("n_name").as("name"))
        .union(region(s, dir).select(col("r_name").as("name")))
        .distinct().orderBy(col("name")),
      Some("""SELECT n_name AS name FROM nation UNION SELECT r_name AS name FROM region ORDER BY name""")),

    QDef("q14_intersect",
      (s, dir) => customer(s, dir).select(col("c_nationkey").as("nk"))
        .intersect(supplier(s, dir).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk")),
      Some("""SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""")),

    QDef("q15_except",
      (s, dir) => nation(s, dir).select(col("n_nationkey").as("nk"))
        .except(supplier(s, dir).select(col("s_nationkey").as("nk")))
        .orderBy(col("nk")),
      Some("""SELECT n_nationkey AS nk FROM nation EXCEPT SELECT s_nationkey AS nk FROM supplier ORDER BY nk""")),

    // ---- rollup (grouping sets) ---------------------------------------
    QDef("q16_rollup",
      (s, dir) => lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sumd(d(col("l_quantity"))).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""")),

    // ---- window: rank within partition --------------------------------
    QDef("q17_window_rank",
      (s, dir) => orders(s, dir)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .filter(col("rn") <= 3)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"), col("rn"))
        .orderBy(col("o_orderpriority"), col("rn")),
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice, rn FROM (
          SELECT o_orderkey, o_orderpriority, o_totalprice,
            CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
          FROM orders) sub
        WHERE rn <= 3 ORDER BY o_orderpriority, rn""")),

    // ---- window: running total ----------------------------------------
    QDef("q18_window_running",
      (s, dir) => events(s, dir)
        .withColumn("running_total",
          sum(d(col("value"))).over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts"), col("event_id"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select(col("event_id"), col("user_id"), col("running_total"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        FROM events ORDER BY event_id""")),

    // ---- window: lag / session gaps -----------------------------------
    QDef("q19_window_lag",
      (s, dir) => events(s, dir)
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(
            Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .select(col("event_id"), col("user_id"), col("gap_us"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id, user_id,
        epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events ORDER BY event_id""")),

    // ---- CASE buckets --------------------------------------------------
    QDef("q20_case_buckets",
      (s, dir) => customer(s, dir)
        .withColumn("bucket",
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("bucket")),
      Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bucket,
        COUNT(*) AS cnt FROM customer GROUP BY 1 ORDER BY bucket""")),

    // ---- date functions (incl. the Snowflake DATEADD/DATEDIFF surface) -
    QDef("q21_date_parts",
      (s, dir) => orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          expr("sf_dateadd('day', 30, o_orderdate)").as("plus30"),
          expr("sf_datediff('day', o_orderdate, timestamp'2002-01-01')").as("days_to_2002"),
          date_trunc("month", col("o_orderdate")).as("mon_start"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
        CAST(month(o_orderdate) AS INTEGER) AS mo,
        o_orderdate + INTERVAL 30 DAY AS plus30,
        date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
        date_trunc('month', o_orderdate) AS mon_start
        FROM orders ORDER BY o_orderkey""")),

    // ---- string functions ---------------------------------------------
    QDef("q22_string_funcs",
      (s, dir) => customer(s, dir)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_name")).as("lo"),
          substring(col("c_name"), 1, 8).as("pre"),
          length(col("c_name")).as("len"),
          concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"),
          expr("replace(c_name, 'Customer', 'Cust')").as("rep"),
          reverse(col("c_name")).as("rev"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("pad"),
          expr("split_part(c_name, '#', 2)").as("num"))
        .orderBy(col("c_custkey")).limit(100),
      Some("""SELECT c_custkey, UPPER(c_name) AS up, LOWER(c_name) AS lo,
        SUBSTR(c_name, 1, 8) AS pre, CAST(LENGTH(c_name) AS INTEGER) AS len,
        c_name || '-' || c_mktsegment AS cat,
        REPLACE(c_name, 'Customer', 'Cust') AS rep, REVERSE(c_name) AS rev,
        LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS pad,
        SPLIT_PART(c_name, '#', 2) AS num
        FROM customer ORDER BY c_custkey LIMIT 100""")),

    // ---- null-handling functions (Snowflake IFF/NVL/NVL2 surface) -----
    QDef("q23_null_funcs",
      (s, dir) => Q.sql(s, dir,
        """SELECT event_id,
             nvl(nullif(event_type, 'error'), 'was-error') AS et,
             nvl2(nullif(value, 0.0D), 'nonzero', 'zero') AS vz,
             iff(value > 100, 'big', 'small') AS sz,
             coalesce(nullif(event_type, 'click'), 'clicked') AS cc,
             ifnull(nullif(user_id, 0), -1) AS uid
           FROM events ORDER BY event_id"""),
      Some("""SELECT event_id,
        COALESCE(NULLIF(event_type, 'error'), 'was-error') AS et,
        CASE WHEN NULLIF(value, 0.0) IS NOT NULL THEN 'nonzero' ELSE 'zero' END AS vz,
        CASE WHEN value > 100 THEN 'big' ELSE 'small' END AS sz,
        COALESCE(NULLIF(event_type, 'click'), 'clicked') AS cc,
        COALESCE(NULLIF(user_id, 0), -1) AS uid
        FROM events ORDER BY event_id""")),

    // ---- JSON / semi-structured (VARIANT-as-JSON-text model) ----------
    QDef("q24_json_funcs",
      (s, dir) => events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          expr("object_construct('id', event_id, 'type', event_type)").as("obj"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
        CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        CAST(json_object('id', event_id, 'type', event_type) AS VARCHAR) AS obj
        FROM events ORDER BY event_id""")),

    // ---- LISTAGG (order-stable variant) -------------------------------
    QDef("q25_listagg",
      (s, dir) => broadcast(nation(s, dir))
        .join(customer(s, dir), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(array_join(array_sort(collect_list(col("c_name"))), ",").as("names"))
        .orderBy(col("n_name")),
      Some("""SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS names
        FROM nation JOIN customer ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")),

    // ---- explode / FLATTEN --------------------------------------------
    QDef("q26_explode_words",
      (s, dir) => t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("word"))
        .limit(20),
      Some("""SELECT word, COUNT(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents) sub
        WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 20""")),

    // ---- conditional aggregation (pivot shape) ------------------------
    QDef("q27_cond_agg",
      (s, dir) => events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
          sum(when(col("event_type") === "purchase", d(col("value")))
            .otherwise(lit(0).cast(org.apache.spark.sql.types.DecimalType(12, 2))))
            .cast("double").as("purchase_value"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2)) ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS purchase_value
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- exact percentiles --------------------------------------------
    QDef("q28_percentiles",
      (s, dir) => lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25D)").as("q25"),
          expr("percentile(l_quantity, 0.5D)").as("med"),
          expr("percentile(l_quantity, 0.75D)").as("q75"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS q25,
        quantile_cont(l_quantity, 0.5) AS med,
        quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- CTEs (WITH): multi-CTE chain joined back to a base table -----
    QDef("q34_cte",
      (s, dir) => Q.sql(s, dir,
        """WITH recent AS (
             SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01'
           ), per_cust AS (
             SELECT o_custkey, COUNT(*) AS n_orders FROM recent GROUP BY o_custkey
           )
           SELECT c_mktsegment, COUNT(*) AS n_cust,
             CAST(SUM(n_orders) AS BIGINT) AS total_orders
           FROM customer JOIN per_cust ON c_custkey = o_custkey
           GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      Some("""WITH recent AS (
          SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01'
        ), per_cust AS (
          SELECT o_custkey, COUNT(*) AS n_orders FROM recent GROUP BY o_custkey
        )
        SELECT c_mktsegment, COUNT(*) AS n_cust,
          CAST(SUM(n_orders) AS BIGINT) AS total_orders
        FROM customer JOIN per_cust ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- TO_VARIANT (JSON-text VARIANT model) -------------------------
    // DuckDB's to_json is the reference's own rewrite target for
    // TO_VARIANT (translator.go:61-67): strings quote, numbers verbatim.
    QDef("q35_to_variant",
      (s, dir) => Q.sql(s, dir,
        """SELECT event_id, to_variant(event_type) AS v_type,
             to_variant(user_id) AS v_uid
           FROM events ORDER BY event_id"""),
      Some("""SELECT event_id, CAST(to_json(event_type) AS VARCHAR) AS v_type,
        CAST(to_json(user_id) AS VARCHAR) AS v_uid
        FROM events ORDER BY event_id""")),

    // ---- small-quantity revenue (TPC-H Q17 shape): per-part average
    // threshold as a pre-aggregated join (Catalyst's decorrelation target
    // shape), all-decimal arithmetic so both engines compare exactly ----
    QDef("q37_small_qty",
      (s, dir) => {
        val li = lineitem(s, dir).select(col("l_partkey"),
          d(col("l_quantity")).as("qd"), d(col("l_extendedprice")).as("ep"))
        val per = li.groupBy(col("l_partkey"))
          .agg(sum(col("qd")).as("sq"), count(lit(1)).as("cn"))
        li.join(per, "l_partkey")
          .join(broadcast(part(s, dir)), col("p_partkey") === col("l_partkey"))
          // l_quantity < 0.2 * avg  ==  5 * cn * qty < sum (exact decimals)
          .filter(col("qd") * lit(5) * col("cn") < col("sq"))
          .groupBy(col("p_brand"))
          .agg((sumd(col("ep")) / lit(7.0)).as("avg_yearly"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH per AS (
          SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
                 COUNT(*) AS cn
          FROM lineitem GROUP BY 1)
        SELECT p_brand,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem
        JOIN per USING (l_partkey)
        JOIN part ON p_partkey = l_partkey
        WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cn < sq
        GROUP BY p_brand ORDER BY p_brand""")),

    // ---- PARSE_JSON (validate + canonicalize JSON text) ---------------
    // json_extract(x, '$') is DuckDB's canonical re-serialization, the
    // same minified form Jackson produces on the Spark side.
    QDef("q36_parse_json",
      (s, dir) => Q.sql(s, dir,
        "SELECT event_id, parse_json(props) AS pj FROM events ORDER BY event_id"),
      Some("""SELECT event_id, CAST(json_extract(props, '$') AS VARCHAR) AS pj
        FROM events ORDER BY event_id""")),

    // ---- OBJECT_INSERT / TRY_PARSE_JSON / ZEROIFNULL (r10 ADVICE: the
    // last dbt-visible scalar gaps). DuckDB mirrors: json_merge_patch
    // appends the new key last and minifies, matching Jackson's
    // insertion-order serialization; TRY_PARSE_JSON of a non-JSON string
    // nulls on both engines; ZEROIFNULL is COALESCE(x, 0). ------------
    QDef("q38_object_insert",
      (s, dir) => Q.sql(s, dir,
        """SELECT event_id,
             object_insert(parse_json(props), 'tag', event_type) AS obj,
             CAST(zeroifnull(try_to_number(event_type)) AS BIGINT) AS z,
             try_parse_json(event_type) AS bad,
             try_parse_json(props) AS good
           FROM events ORDER BY event_id"""),
      Some("""SELECT event_id,
          CAST(json_merge_patch(json_extract(props, '$'),
               json_object('tag', event_type)) AS VARCHAR) AS obj,
          CAST(COALESCE(TRY_CAST(event_type AS DECIMAL(38,0)), 0) AS BIGINT) AS z,
          CAST(TRY_CAST(event_type AS JSON) AS VARCHAR) AS bad,
          CAST(json_extract(props, '$') AS VARCHAR) AS good
        FROM events ORDER BY event_id"""))
  )
}
