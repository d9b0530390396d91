package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The driver-verified operator corpus over the synthetic star schema.
  *
  * Every operator class in SURVEY.md §2 appears here as a named
  * DataFrame program (`all`) paired with an ANSI/DuckDB SQL equivalent
  * (`oracle`) run by the driver's DuckDB oracle on the same parquet
  * tables. The XML property-graph semantics themselves are verified by
  * the ScalaTest golden suites; these queries prove the same relational
  * machinery (joins, aggregations, windows, recursion, set ops, scalar
  * functions) on data large enough to exercise shuffles.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - every query ends in a total ORDER BY over a unique key set;
  *  - double SUMs go through decimal casts (exact, order-independent)
  *    and come back as doubles; AVGs divide an exact decimal sum by a
  *    count; remaining doubles are `round(_, 2-3)`;
  *  - LIMIT always has a full tie-break.
  */
object StarQueries {

  /** Memo of base-table PLANS per (session, file). The cached value
    * is a lazy DataFrame — no data is materialized and every action
    * still scans the parquet file — but a bare `s.read.parquet`
    * re-runs schema inference (a footer-reading driver action,
    * measured 60-120 ms per call at sf0.1) on every construction:
    * across the 275-query surface × 3 bench runs × 1-3 tables per
    * query that was tens of seconds of pure metadata re-resolution.
    * A production deployment reads these tables through a catalog,
    * which resolves the schema exactly once per session — this memo
    * is that catalog behavior, not result caching. */
  private val tableMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]()

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    tableMemo.computeIfAbsent((s, s"$dir/$name.parquet"),
      k => k._1.read.parquet(k._2))

  /** Exact order-independent sum of a double column: route through
    * decimal(18,scale). Returned as double to keep output schemas
    * engine-neutral. */
  def sumd(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Engine-neutral rounding: Spark's round(double) rounds the
    * shortest decimal representation HALF_UP while DuckDB rounds the
    * binary value, so doubles that ARE exact decimals near a half
    * boundary (0.5075 → .508 vs .507) diverge. Routing through a
    * scale-10 decimal first makes both engines see the same decimal
    * before the final rounding; oracle side mirrors this as
    * CAST(ROUND(CAST(x AS DECIMAL(28,10)), n) AS DOUBLE). */
  def roundd(c: Column, n: Int): Column =
    round(c.cast(DecimalType(28, 10)), n).cast("double")

  // ---------------------------------------------------------------
  // Aggregations (SURVEY §2.4)
  // ---------------------------------------------------------------

  /** A1/O5: grouped multi-aggregate with filter pushdown (the
    * reference's group-count-by-type, test_sql_operations.rb:119-137,
    * generalized to the classic pricing-summary shape). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("2000-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(col("l_quantity")).as("sum_qty"),
        sumd(col("l_extendedprice")).as("sum_base_price"),
        sumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("sum_disc_price"),
        roundd(sumd(col("l_quantity")) / count(lit(1)), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_qty,
       COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-01'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  /** A2: per-group COUNT/AVG/MIN/MAX/COUNT DISTINCT (the relationship
    * summary shape, examples/sql_queries.md:108-120). */
  def q02PrioritySummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("total_count"),
        roundd(sumd(col("o_totalprice")) / count(lit(1)), 2)
          .as("avg_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        countDistinct(col("o_custkey")).as("unique_customers"))
      .orderBy(col("o_orderpriority"))

  private val q02Sql =
    """SELECT o_orderpriority,
       COUNT(*) AS total_count,
       CAST(ROUND(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS DECIMAL(28,10)), 2) AS DOUBLE) AS avg_price,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(DISTINCT o_custkey) AS unique_customers
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** A3/S9: global stats + scalar subquery via single-row cross join
    * (main.rb:124-132, test_sql_operations.rb:217-233). */
  def q03GlobalStats(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_lineitems"),
      countDistinct(col("l_orderkey")).as("n_orders_ref"),
      countDistinct(col("l_partkey")).as("n_parts_ref"))
    val o = t(s, dir, "orders").agg(count(lit(1)).as("n_orders"))
    li.crossJoin(o)
  }

  private val q03Sql =
    """SELECT li.n_lineitems, li.n_orders_ref, li.n_parts_ref, o.n_orders
       FROM (SELECT COUNT(*) AS n_lineitems,
                    COUNT(DISTINCT l_orderkey) AS n_orders_ref,
                    COUNT(DISTINCT l_partkey) AS n_parts_ref
             FROM lineitem) li
       CROSS JOIN (SELECT COUNT(*) AS n_orders FROM orders) o"""

  /** A6/O4: top-k with full tie-break — plans as TakeOrderedAndProject,
    * no global sort (sql_queries.md:144-156's LIMIT 10 shape). */
  def q04TopCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("order_cnt"),
        sumd(col("o_totalprice")).as("total_spent"))
      .orderBy(col("order_cnt").desc, col("o_custkey"))
      .limit(10)

  private val q04Sql =
    """SELECT o_custkey, COUNT(*) AS order_cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
       FROM orders GROUP BY o_custkey
       ORDER BY order_cnt DESC, o_custkey LIMIT 10"""

  // ---------------------------------------------------------------
  // Joins (SURVEY §2.3)
  // ---------------------------------------------------------------

  /** J1: selective equi inner join with a broadcast dimension
    * (README.md:150-156's search-nodes-by-attribute shape). */
  def q05SegmentRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sumd(col("o_totalprice")).as("revenue"))
      .orderBy(col("n_name"))

  private val q05Sql =
    """SELECT n_name, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE c_mktsegment = 'BUILDING'
       GROUP BY n_name ORDER BY n_name"""

  /** J2/U4: left-semi join (the reference's Ruby `Set#include?`
    * membership probe, attribute_reference_adapter.rb:22-30). */
  def q06BigSpenders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
    c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val q06Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_totalprice > 400000.0)
       ORDER BY c_custkey"""

  /** J10: left-anti join (the broken-references shape,
    * sql_queries.md:193-199). */
  def q07NeverUrgent(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val q07Sql =
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')
       ORDER BY c_custkey"""

  /** J9: left outer joins against grouped counts + COALESCE(…,0)
    * (the most/least-referenced-nodes shape, sql_queries.md:123-141). */
  def q08OrderCounts(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val orders = t(s, dir, "orders")
    val f = orders.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("fk")).agg(count(lit(1)).as("f_raw"))
    val o = orders.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("ok")).agg(count(lit(1)).as("o_raw"))
    c.join(f, c("c_custkey") === f("fk"), "left_outer")
      .join(o, c("c_custkey") === o("ok"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("f_raw"), lit(0L)).as("finished_orders"),
        coalesce(col("o_raw"), lit(0L)).as("open_orders"))
      .orderBy(col("c_custkey"))
  }

  private val q08Sql =
    """SELECT c_custkey,
       COALESCE(f.cnt, 0) AS finished_orders,
       COALESCE(o.cnt, 0) AS open_orders
       FROM customer c
       LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders
                  WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
         ON c.c_custkey = f.o_custkey
       LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders
                  WHERE o_orderstatus = 'O' GROUP BY o_custkey) o
         ON c.c_custkey = o.o_custkey
       ORDER BY c_custkey"""

  /** J4: same-key pair self-join with i<j dedup (the sibling-pair
    * enumeration, structural_adapter.rb:43-60). */
  def q12LinePairs(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") < 500)
    val a = li.select(col("l_orderkey"), col("l_linenumber").as("a_line"),
      col("l_suppkey").as("a_supp"))
    val b = li.select(col("l_orderkey").as("b_orderkey"),
      col("l_linenumber").as("b_line"), col("l_suppkey").as("b_supp"))
    a.join(b, col("l_orderkey") === col("b_orderkey") &&
        col("a_line") < col("b_line"))
      .select(col("l_orderkey"), col("a_line"), col("b_line"),
        (col("b_line") - col("a_line") === 1).as("adjacent"),
        (col("a_supp") === col("b_supp")).as("same_supplier"))
      .orderBy(col("l_orderkey"), col("a_line"), col("b_line"))
  }

  private val q12Sql =
    """SELECT a.l_orderkey, a.l_linenumber AS a_line, b.l_linenumber AS b_line,
       (b.l_linenumber - a.l_linenumber = 1) AS adjacent,
       (a.l_suppkey = b.l_suppkey) AS same_supplier
       FROM lineitem a JOIN lineitem b
         ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
       WHERE a.l_orderkey < 500
       ORDER BY a.l_orderkey, a_line, b_line"""

  /** J11: bidirectional-pair self-join on a derived edge set
    * (sql_queries.md:159-174). */
  def q13Bidirectional(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("src"), (col("l_partkey") % 20).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val e2 = e.select(col("src").as("src2"), col("dst").as("dst2"))
    e.join(e2, col("src") === col("dst2") && col("dst") === col("src2"))
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
      .orderBy(col("src"), col("dst"))
  }

  private val q13Sql =
    """WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey % 20 AS dst
                 FROM lineitem WHERE l_suppkey <> l_partkey % 20)
       SELECT a.src, a.dst FROM e a JOIN e b
         ON a.src = b.dst AND a.dst = b.src
       WHERE a.src < a.dst ORDER BY a.src, a.dst"""

  /** J12: disjunctive OR-join, rewritten Spark-side as a union of two
    * equi-joins (Catalyst would otherwise plan a nested-loop join —
    * SURVEY.md §4.3); the oracle runs the literal OR form, proving the
    * rewrite equivalent. */
  def q14MostConnected(s: SparkSession, dir: String): DataFrame = {
    // uncached: the two endpoint projections share the distinct's
    // shuffle via ReuseExchange, and a cache here could never be
    // unpersisted by the caller
    val e = t(s, dir, "lineitem")
      .select(col("l_suppkey").as("src"), (col("l_partkey") % 97).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val endpoints = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id")))
    endpoints.groupBy(col("id")).agg(count(lit(1)).as("connections"))
      .orderBy(col("connections").desc, col("id"))
      .limit(10)
  }

  private val q14Sql =
    """WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey % 97 AS dst
                 FROM lineitem WHERE l_suppkey <> l_partkey % 97),
       n AS (SELECT src AS id FROM e UNION SELECT dst FROM e)
       SELECT n.id, COUNT(*) AS connections
       FROM n JOIN e ON n.id = e.src OR n.id = e.dst
       GROUP BY n.id ORDER BY connections DESC, id LIMIT 10"""

  /** J14: multi-way star join (the EAV multi-self-join generalized,
    * test_sql_operations.rb:141-155) with broadcast dims. */
  def q15RegionRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(sumd(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
        .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("r_name"))

  private val q15Sql =
    """SELECT r_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE o_orderdate >= TIMESTAMP '1996-01-01'
         AND o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY r_name ORDER BY r_name"""

  /** P9: DISTINCT projection over a join (test_sql_operations.rb:142,
    * sql_queries.md:195). */
  def q16DistinctPairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .select(col("c_mktsegment"), col("o_orderpriority"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("o_orderpriority"))

  private val q16Sql =
    """SELECT DISTINCT c_mktsegment, o_orderpriority
       FROM customer JOIN orders ON c_custkey = o_custkey
       ORDER BY c_mktsegment, o_orderpriority"""

  // ---------------------------------------------------------------
  // Windows (SURVEY §2.5)
  // ---------------------------------------------------------------

  /** P3: row_number ranking per group (the sibling-position window). */
  def q09TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q09Sql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) x
       WHERE rn <= 3 ORDER BY o_custkey, rn"""

  /** J5: lead/lag adjacency window (the adjacent-sibling rewrite of the
    * reference's O(n²) pair scan, structural_adapter.rb:63-71). */
  def q10AdjacentLines(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 1000)
      .withColumn("next_partkey", lead(col("l_partkey"), 1).over(w))
      .withColumn("prev_partkey", lag(col("l_partkey"), 1).over(w))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("next_partkey"), col("prev_partkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val q10Sql =
    """SELECT l_orderkey, l_linenumber, l_partkey,
       LEAD(l_partkey, 1) OVER w AS next_partkey,
       LAG(l_partkey, 1) OVER w AS prev_partkey
       FROM lineitem WHERE l_orderkey < 1000
       WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
       ORDER BY l_orderkey, l_linenumber"""

  /** Running aggregate frame (rowsBetween unbounded-preceding → current). */
  def q11RunningSpend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .filter(col("o_custkey") < 100)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q11Sql =
    """SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_spend
       FROM orders WHERE o_custkey < 100
       ORDER BY o_custkey, o_orderkey"""

  // ---------------------------------------------------------------
  // Set ops / recursion (SURVEY §2.7)
  // ---------------------------------------------------------------

  /** U1: UNION ALL + aggregate (sql_queries.md:144-156's endpoint
    * union). */
  def q20UnionCounts(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.select(col("l_suppkey").as("key"))
      .unionAll(li.select((col("l_partkey") % 50).as("key")))
      .groupBy(col("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("key"))
  }

  private val q20Sql =
    """SELECT key, COUNT(*) AS n FROM (
         SELECT l_suppkey AS key FROM lineitem
         UNION ALL SELECT l_partkey % 50 AS key FROM lineitem) u
       GROUP BY key ORDER BY key"""

  /** U2: depth-capped recursive traversal with path accumulation over
    * the region→nation→{supplier,customer} hierarchy (the
    * descendants-CTE shape, sql_queries.md:79-103). Spark side runs the
    * iterative frontier expansion in [[Recursion.descend]]. */
  def q21Descendants(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region")
    val nation = t(s, dir, "nation")
    val supplier = t(s, dir, "supplier")
    val customer = t(s, dir, "customer")
    val edges =
      nation.select(concat(lit("r_"), col("n_regionkey")).as("src"),
          concat(lit("n_"), col("n_nationkey")).as("dst"))
        .unionAll(supplier.select(
          concat(lit("n_"), col("s_nationkey")).as("src"),
          concat(lit("s_"), col("s_suppkey")).as("dst")))
        .unionAll(customer.filter(col("c_custkey") < 200).select(
          concat(lit("n_"), col("c_nationkey")).as("src"),
          concat(lit("c_"), col("c_custkey")).as("dst")))
    val seeds = region.select(concat(lit("r_"), col("r_regionkey")).as("node"))
    Recursion.descend(edges, seeds, maxDepth = 10)
      .orderBy(col("depth"), col("node"), col("path"))
  }

  /** U2 (native form): the same traversal as [[q21Descendants]], but
    * through Spark 4's native `WITH RECURSIVE` SQL path (planned as
    * `UnionLoopExec`) instead of the hand-rolled iterative frontier
    * loop — pinning that the engine's SQL-text surface accepts the
    * recursive-CTE dialect a reference user would write directly. Same
    * oracle as q21. */
  def q21DescendantsNative(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "region").createOrReplaceTempView("g21_region")
    t(s, dir, "nation").createOrReplaceTempView("g21_nation")
    t(s, dir, "supplier").createOrReplaceTempView("g21_supplier")
    t(s, dir, "customer").createOrReplaceTempView("g21_customer")
    s.sql(
      """WITH RECURSIVE e AS (
           SELECT 'r_' || CAST(n_regionkey AS STRING) AS src,
                  'n_' || CAST(n_nationkey AS STRING) AS dst FROM g21_nation
           UNION ALL
           SELECT 'n_' || CAST(s_nationkey AS STRING),
                  's_' || CAST(s_suppkey AS STRING) FROM g21_supplier
           UNION ALL
           SELECT 'n_' || CAST(c_nationkey AS STRING),
                  'c_' || CAST(c_custkey AS STRING) FROM g21_customer
           WHERE c_custkey < 200),
         d(node, depth, path) AS (
           SELECT 'r_' || CAST(r_regionkey AS STRING), 0,
                  'r_' || CAST(r_regionkey AS STRING) FROM g21_region
           UNION ALL
           SELECT e.dst, d.depth + 1, d.path || ' -> ' || e.dst
           FROM d JOIN e ON e.src = d.node WHERE d.depth < 10)
         SELECT node, depth, path FROM d ORDER BY depth, node, path""")
  }

  private val q21Sql =
    """WITH RECURSIVE e AS (
         SELECT 'r_' || CAST(n_regionkey AS VARCHAR) AS src,
                'n_' || CAST(n_nationkey AS VARCHAR) AS dst FROM nation
         UNION ALL
         SELECT 'n_' || CAST(s_nationkey AS VARCHAR),
                's_' || CAST(s_suppkey AS VARCHAR) FROM supplier
         UNION ALL
         SELECT 'n_' || CAST(c_nationkey AS VARCHAR),
                'c_' || CAST(c_custkey AS VARCHAR) FROM customer
         WHERE c_custkey < 200),
       d(node, depth, path) AS (
         SELECT 'r_' || CAST(r_regionkey AS VARCHAR), 0,
                'r_' || CAST(r_regionkey AS VARCHAR) FROM region
         UNION ALL
         SELECT e.dst, d.depth + 1, d.path || ' -> ' || e.dst
         FROM d JOIN e ON e.src = d.node WHERE d.depth < 10)
       SELECT node, depth, path FROM d ORDER BY depth, node, path"""

  // ---------------------------------------------------------------
  // Scalar functions / projections (SURVEY §2.2, §2.8)
  // ---------------------------------------------------------------

  /** F8/F9/F11/F12/F14: CASE, COALESCE-ish, abs, confidence clamp with
    * the reference's exact additive-boost shape, concat, round. */
  def q17ScalarPack(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000.0, "high")
          .when(col("o_totalprice") > 150000.0, "mid")
          .otherwise("low").as("price_band"),
        roundd(least(lit(1.0), lit(0.8) +
          when(col("o_orderpriority").like("%URGENT%"), 0.15).otherwise(0.0) +
          when(col("o_orderstatus") === "F", 0.05).otherwise(0.0)), 2)
          .as("confidence"),
        roundd(col("o_totalprice") / 1000.0, 2).as("price_k"),
        roundd(abs(col("o_totalprice") - 200000.0), 2).as("dist_from_200k"),
        concat(col("o_orderstatus"), lit("-"), col("o_orderpriority"))
          .as("status_priority"))
      .orderBy(col("o_orderkey"))

  private val q17Sql =
    """SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000.0 THEN 'high'
            WHEN o_totalprice > 150000.0 THEN 'mid'
            ELSE 'low' END AS price_band,
       CAST(ROUND(CAST(CAST(LEAST(1.0, 0.8 +
         (CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 0.15 ELSE 0.0 END) +
         (CASE WHEN o_orderstatus = 'F' THEN 0.05 ELSE 0.0 END)) AS DOUBLE)
         AS DECIMAL(28,10)), 2) AS DOUBLE) AS confidence,
       CAST(ROUND(CAST(o_totalprice / 1000.0 AS DECIMAL(28,10)), 2)
         AS DOUBLE) AS price_k,
       CAST(ROUND(CAST(ABS(o_totalprice - 200000.0) AS DECIMAL(28,10)), 2)
         AS DOUBLE) AS dist_from_200k,
       o_orderstatus || '-' || o_orderpriority AS status_priority
       FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey"""

  /** P4: the reference's type-inference CASE chain over a mixed value
    * relation (document_parser.rb:77-92 — same regexes, same
    * precedence), then a group-count per inferred tag. */
  def q18TypeInference(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders").filter(col("o_orderkey") < 200)
    val events = t(s, dir, "events").filter(col("event_id") < 200)
    val vals =
      orders.select(col("o_orderdate").cast("string").as("v"))
        .unionAll(orders.select(
          when(col("o_orderstatus") === "O", "true").otherwise("false")
            .as("v")))
        .unionAll(events.select(
          regexp_extract(col("props"), "(\\d+)", 1).as("v")))
        .unionAll(events.select(col("event_type").as("v")))
        .unionAll(events.select(
          round(col("value"), 2).cast("decimal(12,2)").cast("string").as("v")))
    vals.select(graft.ingest.TypeInference.inferTypeCol(col("v"))
        .as("data_type"))
      .groupBy(col("data_type")).agg(count(lit(1)).as("n"))
      .orderBy(col("data_type"))
  }

  private val q18Sql =
    """WITH vals AS (
         SELECT CAST(o_orderdate AS VARCHAR) AS v FROM orders WHERE o_orderkey < 200
         UNION ALL
         SELECT CASE WHEN o_orderstatus = 'O' THEN 'true' ELSE 'false' END
         FROM orders WHERE o_orderkey < 200
         UNION ALL
         SELECT regexp_extract(props, '(\d+)', 1) FROM events WHERE event_id < 200
         UNION ALL
         SELECT event_type FROM events WHERE event_id < 200
         UNION ALL
         SELECT CAST(CAST(ROUND(value, 2) AS DECIMAL(12,2)) AS VARCHAR)
         FROM events WHERE event_id < 200)
       SELECT CASE
         WHEN v IS NULL OR v = '' THEN 'string'
         WHEN regexp_matches(v, '^\d+\n?$') THEN 'integer'
         WHEN regexp_matches(v, '^\d+\.\d+\n?$') THEN 'float'
         WHEN regexp_matches(v, '(?i)^(true|false)\n?$') THEN 'boolean'
         WHEN regexp_matches(v, '^\d{4}-\d{2}-\d{2}')
           OR regexp_matches(v, '^\d{2}:\d{2}:\d{2}') THEN 'datetime'
         ELSE 'string' END AS data_type,
       COUNT(*) AS n
       FROM vals GROUP BY 1 ORDER BY data_type"""

  /** P8/F6: LIKE '%…%' text search (README.md:161's xpath LIKE). */
  def q19TextSearch(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("text").like("%window merge%"))
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val q19Sql =
    """SELECT doc_id, lang, n_chars FROM documents
       WHERE text LIKE '%window merge%' ORDER BY doc_id"""

  /** P2/F4/F5: explode(split) tokenization + group-count (the
    * attribute-explode and multi-ref split shapes). */
  def q22TokenCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .filter(col("doc_id") < 100)
      .select(explode(split(lower(col("text")), "\\W+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("token"))

  private val q22Sql =
    """SELECT token, COUNT(*) AS n FROM (
         SELECT unnest(string_split_regex(lower(text), '\W+')) AS token
         FROM documents WHERE doc_id < 100) u
       WHERE token <> '' GROUP BY token ORDER BY token"""

  /** J14 proper: EAV double self-join pivot — find entities where
    * attr1=v1 AND attr2 matches v2 (test_sql_operations.rb:141-155),
    * over an EAV projection of orders. */
  def q23EavPivot(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val eav = o.select(col("o_orderkey").as("id"),
        lit("status").as("pname"), col("o_orderstatus").as("pval"))
      .unionAll(o.select(col("o_orderkey").as("id"),
        lit("priority").as("pname"), col("o_orderpriority").as("pval")))
    val a = eav.filter(col("pname") === "status" && col("pval") === "F")
      .select(col("id"))
    val b = eav.filter(col("pname") === "priority" && col("pval").like("1%"))
      .select(col("id").as("id2"))
    a.join(b, col("id") === col("id2"))
      .select(col("id"))
      .orderBy(col("id"))
  }

  private val q23Sql =
    """WITH eav AS (
         SELECT o_orderkey AS id, 'status' AS pname, o_orderstatus AS pval FROM orders
         UNION ALL
         SELECT o_orderkey, 'priority', o_orderpriority FROM orders)
       SELECT a.id FROM eav a JOIN eav b ON a.id = b.id
       WHERE a.pname = 'status' AND a.pval = 'F'
         AND b.pname = 'priority' AND b.pval LIKE '1%'
       ORDER BY a.id"""

  /** Beyond-parity: CUBE aggregation (all grouping-set combinations of
    * status × priority) — the multidimensional-summary shape a
    * warehouse load wants; NULL marks the rolled-up dimensions. */
  def q24Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sumd(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  private val q24Sql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
       ORDER BY o_orderstatus ASC NULLS FIRST,
                o_orderpriority ASC NULLS FIRST"""

  // ---------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------

  val core: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_priority_summary" -> (q02PrioritySummary _),
    "q03_global_stats" -> (q03GlobalStats _),
    "q04_top_customers" -> (q04TopCustomers _),
    "q05_segment_revenue" -> (q05SegmentRevenue _),
    "q06_semi_join" -> (q06BigSpenders _),
    "q07_anti_join" -> (q07NeverUrgent _),
    "q08_left_coalesce" -> (q08OrderCounts _),
    "q09_window_rank" -> (q09TopOrdersPerCustomer _),
    "q10_window_leadlag" -> (q10AdjacentLines _),
    "q11_running_sum" -> (q11RunningSpend _),
    "q12_pair_selfjoin" -> (q12LinePairs _),
    "q13_bidirectional" -> (q13Bidirectional _),
    "q14_or_join_rewrite" -> (q14MostConnected _),
    "q15_multiway_join" -> (q15RegionRevenue _),
    "q16_distinct" -> (q16DistinctPairs _),
    "q17_scalar_pack" -> (q17ScalarPack _),
    "q18_type_inference" -> (q18TypeInference _),
    "q19_text_search" -> (q19TextSearch _),
    "q20_union_counts" -> (q20UnionCounts _),
    "q21_recursive_descend" -> (q21Descendants _),
    "q21_recursive_native" -> (q21DescendantsNative _),
    "q22_token_counts" -> (q22TokenCounts _),
    "q23_eav_pivot" -> (q23EavPivot _),
    "q24_cube" -> (q24Cube _))

  val coreOracle: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_priority_summary" -> q02Sql,
    "q03_global_stats" -> q03Sql,
    "q04_top_customers" -> q04Sql,
    "q05_segment_revenue" -> q05Sql,
    "q06_semi_join" -> q06Sql,
    "q07_anti_join" -> q07Sql,
    "q08_left_coalesce" -> q08Sql,
    "q09_window_rank" -> q09Sql,
    "q10_window_leadlag" -> q10Sql,
    "q11_running_sum" -> q11Sql,
    "q12_pair_selfjoin" -> q12Sql,
    "q13_bidirectional" -> q13Sql,
    "q14_or_join_rewrite" -> q14Sql,
    "q15_multiway_join" -> q15Sql,
    "q16_distinct" -> q16Sql,
    "q17_scalar_pack" -> q17Sql,
    "q18_type_inference" -> q18Sql,
    "q19_text_search" -> q19Sql,
    "q20_union_counts" -> q20Sql,
    "q21_recursive_descend" -> q21Sql,
    "q21_recursive_native" -> q21Sql,
    "q22_token_counts" -> q22Sql,
    "q23_eav_pivot" -> q23Sql,
    "q24_cube" -> q24Sql)

  def all: Map[String, (SparkSession, String) => DataFrame] =
    core ++ PipelineQueries.all ++ EventQueries.all ++
      ExtendedQueries.all ++ XmlQueries.all

  def oracle: Map[String, String] =
    coreOracle ++ PipelineQueries.oracle ++ EventQueries.oracle ++
      ExtendedQueries.oracle ++ XmlQueries.oracle
}
