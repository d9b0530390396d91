package graft.queries

import graft.pipeline.ZOrder
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-2 operator widening: grouping-set rollups, as-of joins,
  * range/band joins, sketch-accuracy contracts, salted skew joins,
  * exact percentiles, pivots, and hash-based deterministic sampling —
  * the relational machinery a training-data pipeline layers on top of
  * the reference's query surface. Same contract as [[StarQueries]]:
  * every query is deterministic (total ORDER BY, decimal-routed sums,
  * engine-neutral rounding) and hash-matched against a DuckDB oracle.
  */
object ExtendedQueries {
  import StarQueries.{t, sumd, roundd}

  // ---------------------------------------------------------------
  // q25: ROLLUP grouping sets (super-aggregate hierarchy in one pass;
  // Spark plans this as a single Expand + hash aggregate — one
  // shuffle for all three grouping levels)
  // ---------------------------------------------------------------

  def q25Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"),
        sumd(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n"))
      .select(col("gid"), col("o_orderpriority"), col("o_orderstatus"),
        col("sum_price"), col("n"))
      .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  private val q25Sql =
    """SELECT CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT)
         AS gid,
       o_orderpriority, o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price,
       COUNT(*) AS n
       FROM orders
       GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
       ORDER BY gid, o_orderpriority NULLS FIRST,
         o_orderstatus NULLS FIRST"""

  // ---------------------------------------------------------------
  // q26: as-of join — for every purchase, the most recent click by
  // the same user at or before it. The scalable shape is NOT a theta
  // join (quadratic) but a union-tag + running-max window: one
  // shuffle by user_id, one sort, linear scan. Ties at equal
  // timestamp: clicks sort before purchases (kind 0 < 1), so a
  // same-instant click is visible to the purchase.
  // ---------------------------------------------------------------

  def q26AsofJoin(s: SparkSession, dir: String): DataFrame = {
    // µs precision is the comparable timeline under BOTH physical ts
    // contracts (DuckDB coerces TIMESTAMP_NS to µs; timestamp[us] is
    // already there) — EventStream.tsMicrosCol dispatches on the type
    val raw = t(s, dir, "events")
    val e = raw
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"),
        graft.streaming.EventStream.tsMicrosCol(raw).as("ts_us"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("asof_click_us",
        max(when(col("kind") === 0, col("ts_us"))).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("asof_click_us"),
        (col("ts_us") - col("asof_click_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  private val q26Sql =
    """WITH e AS (
         SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
         FROM events WHERE event_type IN ('click', 'purchase')),
       w AS (
         SELECT *, MAX(CASE WHEN kind = 0 THEN ts_us END) OVER
           (PARTITION BY user_id ORDER BY ts_us, kind, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS asof_click_us
         FROM e)
       SELECT event_id, user_id, ts_us, asof_click_us,
         ts_us - asof_click_us AS gap_us
       FROM w WHERE kind = 1 ORDER BY event_id"""

  // ---------------------------------------------------------------
  // q27: range (band) join against an inline tier dimension. The dim
  // is broadcast, so the non-equi predicate evaluates as a broadcast
  // nested-loop over 5 rows — a streaming pass over the fact table,
  // no shuffle before the final aggregation.
  // ---------------------------------------------------------------

  private val tierRows = Seq(
    ("t1_budget", 0.0, 100000.0), ("t2_mid", 100000.0, 200000.0),
    ("t3_high", 200000.0, 300000.0), ("t4_premium", 300000.0, 400000.0),
    ("t5_top", 400000.0, 1000000.0))

  def q27RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tiers = broadcast(tierRows.toDF("tier", "lo", "hi"))
    t(s, dir, "orders")
      .join(tiers, col("o_totalprice") >= col("lo") &&
        col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"),
        sumd(col("o_totalprice")).as("sum_price"))
      .orderBy(col("tier"))
  }

  private val q27Sql =
    """WITH tiers(tier, lo, hi) AS (VALUES
         ('t1_budget', 0.0, 100000.0), ('t2_mid', 100000.0, 200000.0),
         ('t3_high', 200000.0, 300000.0),
         ('t4_premium', 300000.0, 400000.0),
         ('t5_top', 400000.0, 1000000.0))
       SELECT tier, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
       FROM orders JOIN tiers
         ON o_totalprice >= lo AND o_totalprice < hi
       GROUP BY tier ORDER BY tier"""

  // ---------------------------------------------------------------
  // q28: sketch-accuracy contract for HyperLogLog++ distinct
  // counting. The estimate itself is engine-specific, so the oracle
  // pins (a) the exact distinct count and (b) the CONTRACT that
  // Spark's approx_count_distinct lands within 10% of it (default
  // rsd = 5%) — the property a 100 TB pipeline actually relies on
  // when it swaps countDistinct (full shuffle of the key set) for a
  // fixed-size mergeable sketch.
  // ---------------------------------------------------------------

  // rsd pinned at 0.02, not the 0.05 default: the contract asserts a
  // 10% band, and a 5%-rsd sketch sits only ~2 sigma inside it — at
  // sf1 (~130k distinct per group) one group's estimate drifted to
  // 11% and failed the gate. 2% rsd keeps the band a 5-sigma margin
  // at every scale while the sketch stays a few KB.
  def q28HllContract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"),
        approx_count_distinct(col("o_custkey"), 0.02).as("n_approx"))
      .select(col("o_orderpriority"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) <=
          col("n_exact") * 0.10).as("approx_ok"))
      .orderBy(col("o_orderpriority"))

  private val q28Sql =
    """SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_exact, TRUE AS approx_ok
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------
  // q29: salted skew join — the explicit-salting form of the
  // fact⋈dim join ([[Skew.saltedJoin]]): fact rows get a
  // deterministic salt, the dim side is replicated per salt, the key
  // becomes (key, salt) so one hot key spreads over numSalts
  // partitions. The oracle runs the plain join, pinning result
  // equivalence.
  // ---------------------------------------------------------------

  def q29SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    // project the fact side to the join key + aggregated column BEFORE
    // salting: the salt hash and the shuffle then touch 2 columns, not
    // the full lineitem row
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    Skew.saltedJoin(fact, dim, "l_orderkey", numSalts = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sumd(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  private val q29Sql =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------
  // q30: exact continuous percentiles (quartiles of order value per
  // priority). Spark's `percentile` aggregate and DuckDB's
  // quantile_cont both linearly interpolate over the sorted values.
  // ---------------------------------------------------------------

  def q30Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        roundd(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        roundd(expr("percentile(o_totalprice, 0.50)"), 2).as("p50"),
        roundd(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"))
      .orderBy(col("o_orderpriority"))

  private val q30Sql =
    """SELECT o_orderpriority,
       CAST(ROUND(CAST(quantile_cont(o_totalprice, 0.25)
         AS DECIMAL(28,10)), 2) AS DOUBLE) AS p25,
       CAST(ROUND(CAST(quantile_cont(o_totalprice, 0.50)
         AS DECIMAL(28,10)), 2) AS DOUBLE) AS p50,
       CAST(ROUND(CAST(quantile_cont(o_totalprice, 0.75)
         AS DECIMAL(28,10)), 2) AS DOUBLE) AS p75
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // ---------------------------------------------------------------
  // q31: pivot (status categories → columns) with an explicit value
  // list, so the output schema is static and no extra
  // distinct-values job runs.
  // ---------------------------------------------------------------

  def q31Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("F"),
        coalesce(col("O"), lit(0L)).as("O"),
        coalesce(col("P"), lit(0L)).as("P"))
      .orderBy(col("o_orderpriority"))

  private val q31Sql =
    """SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** UNPIVOT — the inverse of q31: melt the wide per-status count
    * columns back to (priority, status, n) long form via
    * `DataFrame.unpivot` (Spark's native melt; one Expand, no join or
    * shuffle beyond q31's aggregate). Round-tripping q31's own output
    * keeps the oracle a plain conditional aggregate + UNION ALL. */
  def q45Unpivot(s: SparkSession, dir: String): DataFrame =
    q31Pivot(s, dir)
      .unpivot(Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")), "o_orderstatus", "n")
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  private val q45Sql =
    """WITH wide AS (
         SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_n,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_n
         FROM orders GROUP BY o_orderpriority)
       SELECT o_orderpriority, o_orderstatus, n FROM (
         SELECT o_orderpriority, 'F' AS o_orderstatus, f_n AS n FROM wide
         UNION ALL
         SELECT o_orderpriority, 'O', o_n FROM wide
         UNION ALL
         SELECT o_orderpriority, 'P', p_n FROM wide)
       ORDER BY o_orderpriority, o_orderstatus"""

  /** Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): null keys
    * match each other — the join form a plain `=` silently drops.
    * Key = NULLIF(priority, '1-URGENT'), so one real null group
    * exercises the null-matching path on both sides. */
  def q46NullsafeJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(nullif(col("o_orderpriority"), lit("1-URGENT")).as("k"),
        col("o_orderkey"))
    val counts = o.groupBy(col("k")).agg(count(lit(1)).as("grp_n"))
    // derived-frame self-join: explicit aliases or the analyzer flags
    // the shared lineage as ambiguous
    o.alias("o").join(counts.alias("c"), col("o.k") <=> col("c.k"))
      .groupBy(col("o.k").as("k"), col("grp_n"))
      .agg(count(lit(1)).as("n_joined"))
      .orderBy(col("k").asc_nulls_first)
  }

  private val q46Sql =
    """WITH o AS (
         SELECT NULLIF(o_orderpriority, '1-URGENT') AS k, o_orderkey
         FROM orders),
       counts AS (SELECT k, COUNT(*) AS grp_n FROM o GROUP BY k)
       SELECT o.k, c.grp_n, COUNT(*) AS n_joined
       FROM o JOIN counts c ON o.k IS NOT DISTINCT FROM c.k
       GROUP BY o.k, c.grp_n
       ORDER BY o.k ASC NULLS FIRST"""

  // ---------------------------------------------------------------
  // q32: deterministic hash sampling — an engine-portable ~2.3%
  // Bernoulli sample (md5 prefix < '06' ⇒ 6/256) keyed on the row
  // id, so the same rows are selected on any engine, any partition
  // count, any run. This is how a 100 TB pipeline takes auditable
  // dev subsamples (sample() is seed- and partitioning-dependent and
  // reproduces nowhere else).
  // ---------------------------------------------------------------

  def q32HashSample(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(substring(
        md5(col("o_orderkey").cast("string").cast("binary")), 1, 2)
        < "06")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sumd(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))

  private val q32Sql =
    """SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
       FROM orders
       WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '06'
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // ---------------------------------------------------------------
  // ta_bigrams: top-3 bigrams per source — n-gram frequency mining
  // over the documents table (map-side explode → one shuffle on
  // (source, bigram) with partial aggregation → per-group top-k
  // window).
  // ---------------------------------------------------------------

  def taBigrams(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= 2)
    val pairs = toks.select(col("source"),
      explode(expr(
        "transform(sequence(0, size(tk) - 2)," +
          " i -> concat(tk[i], ' ', tk[i + 1]))")).as("bigram"))
    pairs.groupBy(col("source"), col("bigram"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("n").desc, col("bigram"))))
      .filter(col("rank") <= 3)
      .select(col("source"), col("rank"), col("bigram"), col("n"))
      .orderBy(col("source"), col("rank"))
  }

  private val taBigramsSql =
    """WITH toks AS (
         SELECT source, string_split(text, ' ') AS tk FROM documents),
       pairs AS (
         SELECT source, tk[i + 1] || ' ' || tk[i + 2] AS bigram
         FROM toks CROSS JOIN unnest(range(len(tk) - 1)) AS r(i)),
       counted AS (
         SELECT source, bigram, COUNT(*) AS n
         FROM pairs GROUP BY source, bigram),
       ranked AS (
         SELECT source, bigram, n,
           ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY n DESC, bigram) AS rank
         FROM counted)
       SELECT source, rank, bigram, n
       FROM ranked WHERE rank <= 3 ORDER BY source, rank"""

  // ---------------------------------------------------------------
  // q33: INTERSECT / EXCEPT set operations (distinct semantics both
  // engines) — customers with urgent orders vs customers with
  // finished orders.
  // ---------------------------------------------------------------

  def q33SetOps(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val finished = orders.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    urgent.intersect(finished)
      .select(lit("both").as("src"), col("o_custkey"))
      .unionByName(urgent.except(finished)
        .select(lit("urgent_only").as("src"), col("o_custkey")))
      .orderBy(col("src"), col("o_custkey"))
  }

  private val q33Sql =
    """SELECT 'both' AS src, o_custkey FROM (
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         INTERSECT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
       UNION ALL
       SELECT 'urgent_only' AS src, o_custkey FROM (
         SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
         EXCEPT
         SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
       ORDER BY src, o_custkey"""

  // ---------------------------------------------------------------
  // q34: RANGE window frame — per-customer trailing-7-day revenue
  // (value-based frame; peers at the same day aggregate together,
  // unlike the ROWS frames in q11).
  // ---------------------------------------------------------------

  def q34RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val days = t(s, dir, "orders")
      .select(col("o_custkey"),
        // NTZ → TIMESTAMP is identity under the UTC session timezone;
        // NTZ has no direct long cast
        expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
          .as("d"),
        col("o_totalprice"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-7, Window.currentRow)
    days
      .withColumn("weekly",
        sum(col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double"))
      .select(col("o_custkey"), col("d"), col("weekly"))
      .orderBy(col("o_custkey"), col("d"))
  }

  private val q34Sql =
    """SELECT o_custkey, d,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
         (PARTITION BY o_custkey ORDER BY d
          RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS weekly
       FROM (SELECT o_custkey,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,
               o_totalprice
             FROM orders)
       ORDER BY o_custkey, d"""

  // ---------------------------------------------------------------
  // q35: correlated LATERAL subquery, submitted as SQL text — the one
  // entry exercised through spark.sql() rather than the DataFrame
  // API. Catalyst decorrelates the per-customer aggregate into a
  // join + group-by; customers with no orders keep n_orders=0 /
  // max_price NULL (LATERAL of an aggregate is row-preserving).
  // ---------------------------------------------------------------

  def q35Lateral(s: SparkSession, dir: String): DataFrame =
    s.sql(
      s"""SELECT c.c_custkey, o.n_orders, o.max_price
          FROM parquet.`$dir/customer.parquet` c,
          LATERAL (
            SELECT COUNT(*) AS n_orders,
              CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS max_price
            FROM parquet.`$dir/orders.parquet`
            WHERE o_custkey = c.c_custkey) o
          WHERE c.c_mktsegment = 'BUILDING'
          ORDER BY c.c_custkey""")

  private val q35Sql =
    """SELECT c.c_custkey, o.n_orders, o.max_price
       FROM customer c, LATERAL (
         SELECT COUNT(*) AS n_orders,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS max_price
         FROM orders WHERE o_custkey = c.c_custkey) o
       WHERE c.c_mktsegment = 'BUILDING'
       ORDER BY c.c_custkey"""

  // ---------------------------------------------------------------
  // q36: NTILE quartiles + per-bucket rollup — the distribution-
  // bucketing window (standard larger-buckets-first split in both
  // engines; ties broken by orderkey for determinism).
  // ---------------------------------------------------------------

  def q36Ntile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_orderpriority"), col("o_totalprice"),
        ntile(4).over(w).as("q"))
      .groupBy(col("o_orderpriority"), col("q"))
      .agg(count(lit(1)).as("n"),
        sumd(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"), col("q"))
  }

  private val q36Sql =
    """SELECT o_orderpriority, q, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
       FROM (SELECT o_orderpriority, o_totalprice,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey) AS q
             FROM orders)
       GROUP BY o_orderpriority, q ORDER BY o_orderpriority, q"""

  // ---------------------------------------------------------------
  // q37: calendar-month temporal rollup (date_trunc) — the calendar
  // grouping the epoch-bucket event queries don't cover.
  // ---------------------------------------------------------------

  def q37Monthly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
        .as("month"))
      .agg(count(lit(1)).as("n"),
        sumd(col("o_totalprice")).as("sum_price"))
      .orderBy(col("month"))

  private val q37Sql =
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
       FROM orders GROUP BY month ORDER BY month"""

  // ---------------------------------------------------------------
  // ta_ttr: lexical diversity (type-token ratio) per source — a
  // standard corpus-quality signal: low TTR flags repetitive/
  // boilerplate-heavy sources. countDistinct is exact here for the
  // gate; at 100 TB swap approx_count_distinct under the q28-style
  // accuracy contract.
  // ---------------------------------------------------------------

  def taTtr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("source"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("tok")).as("n_distinct"))
      .select(col("source"), col("n_tokens"), col("n_distinct"),
        roundd(col("n_distinct").cast("double") / col("n_tokens"), 4)
          .as("ttr"))
      .orderBy(col("source"))

  private val taTtrSql =
    """SELECT source, COUNT(*) AS n_tokens,
       COUNT(DISTINCT tok) AS n_distinct,
       CAST(ROUND(CAST(CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*)
         AS DECIMAL(28,10)), 4) AS DOUBLE) AS ttr
       FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
             FROM documents)
       GROUP BY source ORDER BY source"""

  // ---------------------------------------------------------------
  // q38: ordered array aggregation — collect per group, sort by
  // (-price, key) for a deterministic order, slice the top 3 keys.
  // collect_list is unordered in Spark (partition-dependent), so the
  // determinism comes from array_sort AFTER collection — the pattern
  // that makes array aggregation reproducible at any parallelism.
  // The ordered top-3 is serialized to a comma-joined string so the
  // driver comparator (pandas hash/sort) sees a scalar column; the
  // order inside the string still pins the array semantics.
  // ---------------------------------------------------------------

  def q38CollectTop(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(collect_list(struct((-col("o_totalprice")).as("np"),
        col("o_orderkey").as("k"))).as("xs"))
      .select(col("o_orderpriority"),
        expr("concat_ws(',', transform(slice(array_sort(xs), 1, 3)," +
          " x -> cast(x.k AS STRING)))").as("top_keys"))
      .orderBy(col("o_orderpriority"))

  private val q38Sql =
    """SELECT o_orderpriority,
       array_to_string(
         (list(o_orderkey ORDER BY o_totalprice DESC, o_orderkey))[1:3],
         ',') AS top_keys
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Per-key top-k through the custom LogicalPlan/SparkStrategy/
    * SparkPlan tier ([[graft.plans.TopKPerKey]]): bounded heaps
    * instead of Window's full per-group sort — top 3 customers by
    * account balance per market segment. The oracle runs the window
    * formulation, proving the custom physical operator equivalent. */
  def q39TopkPerKey(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey(
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal")),
      keys = Seq("c_mktsegment"),
      order = Seq(("c_acctbal", true), ("c_custkey", false)), k = 3)
      .orderBy(col("c_mktsegment"), col("rank"))

  private val q39Sql =
    """SELECT c_mktsegment, c_custkey, c_acctbal, rank FROM (
         SELECT c_mktsegment, c_custkey, c_acctbal,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey) AS rank
         FROM customer)
       WHERE rank <= 3 ORDER BY c_mktsegment, rank"""

  /** The same top-k written in the WINDOW idiom and then passed
    * through [[graft.plans.TopKRewriteRule]] — the optimizer-rule leg
    * of the custom-operator tier: user code keeps the row_number
    * pattern, the plan runs the bounded-heap exec. Same oracle as
    * [[q39TopkPerKey]]. */
  def q40TopkRewrite(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val windowForm = t(s, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))))
      .filter(col("rank") <= 3)
    graft.plans.TopKPerKey.rewrite(windowForm)
      .orderBy(col("c_mktsegment"), col("rank"))
  }

  /** Explicit GROUPING SETS (the general form behind q24's CUBE and
    * q25's ROLLUP): a hand-picked mix — (status, priority), (status),
    * and the grand total — still one Expand + one hash aggregate, with
    * `grouping_id` disambiguating the levels. */
  def q44GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("v_orders_gs")
    // Spark's multi-column grouping function is GROUPING_ID; DuckDB's
    // variadic GROUPING produces the same bit encoding (first column =
    // most significant bit), so the two sides agree on gid
    s.sql(
      """SELECT CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT)
           AS gid,
         o_orderstatus, o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price,
         COUNT(*) AS n
         FROM v_orders_gs
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                 (o_orderstatus), ())
         ORDER BY gid, o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""")
  }

  private val q44Sql =
    """SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
         AS gid,
       o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price,
       COUNT(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderstatus), ())
       ORDER BY gid, o_orderstatus ASC NULLS FIRST,
                o_orderpriority ASC NULLS FIRST"""

  /** The SQL-TEXT entry surface: the same star-join rollup a
    * DataFrame query would build, but authored as `spark.sql` text
    * over temp views — the path a reference user speaking SQL takes
    * (the engine's views + Catalyst parse/analyze/optimize pipeline,
    * not just the DataFrame DSL). Deterministic: decimal-routed sum,
    * total ORDER BY. */
  def q43SqlTextEntry(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("v_orders")
    t(s, dir, "customer").createOrReplaceTempView("v_customer")
    t(s, dir, "nation").createOrReplaceTempView("v_nation")
    s.sql(
      """SELECT n.n_name AS nation,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           COUNT(*) AS n_orders
         FROM v_orders o
         JOIN v_customer c ON o.o_custkey = c.c_custkey
         JOIN v_nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY n.n_name
         ORDER BY nation""")
  }

  private val q43Sql =
    """SELECT n.n_name AS nation,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS total_price,
       COUNT(*) AS n_orders
       FROM orders o
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name
       ORDER BY nation"""

  /** The other mergeable-sketch contract (q28's HLL sibling): at
    * 100 TB exact per-group percentiles need a full sort per group,
    * while `approx_percentile` merges fixed-size KLL-style sketches —
    * this pins the ≤5%-of-range error contract that swap relies on.
    * n_exact (the true median, exact interpolation) is hash-compared;
    * approx_ok must be uniformly true. */
  def q42PercentileContract(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val rng = li.agg((max(col("l_extendedprice")) -
      min(col("l_extendedprice"))).as("rng"))
    li.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("p50_approx"),
        expr("percentile(l_extendedprice, 0.5)").as("p50_exact"))
      .crossJoin(rng)
      .select(col("l_returnflag"),
        round(col("p50_exact")
          .cast(org.apache.spark.sql.types.DecimalType(28, 10)), 2)
          .cast("double").as("p50_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          col("rng") * 0.05).as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  private val q42Sql =
    """SELECT l_returnflag,
       CAST(ROUND(CAST(quantile_cont(l_extendedprice, 0.5)
         AS DECIMAL(28,10)), 2) AS DOUBLE) AS p50_exact,
       TRUE AS approx_ok
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Two-phase salted aggregation over the (skew-prone) lineitem
    * return-flag rollup — saltedJoin's GROUP-BY counterpart; the
    * oracle runs the plain single-phase aggregate, proving the
    * partial/merge decomposition exact (decimal-routed sum). */
  def q41SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("q"))
    Skew.saltedAgg(li, "l_returnflag", "q", numSalts = 16)
      .select(col("l_returnflag"),
        col("sum_value").cast("double").as("sum_qty"), col("cnt"))
      .orderBy(col("l_returnflag"))
  }

  private val q41Sql =
    """SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS cnt
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------------------------------------------------------------
  // q47/q48: Z-order (Morton) clustering + multi-dimensional pruning
  // — ONE clustering key giving box-query pruning over (order date ×
  // total price). Fixed literal grid: 32 date cells of 76 days from
  // epoch-day 9131 (1995-01-01), 32 price cells of 15 625 from 0.

  private val zDayLo = 9131.0
  private val zDayStep = 76.0
  private val zPriceStep = 15625.0
  private val zCellBits = 5
  private val zBucketBits = 3

  private def zOrderCells(s: SparkSession, dir: String) =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
          .as("d"))
      .withColumn("day_cell",
        ZOrder.cellIndex(col("d"), zDayLo, zDayStep, zCellBits))
      .withColumn("price_cell",
        ZOrder.cellIndex(col("o_totalprice"), 0.0, zPriceStep,
          zCellBits))

  /** The curve itself: per-order cells + Z-value (exact integer
    * interleave — the oracle replays every shift). */
  def q47Zorder(s: SparkSession, dir: String): DataFrame =
    zOrderCells(s, dir)
      .filter(col("o_orderkey") < 200)
      .withColumn("z",
        ZOrder.interleave2(col("day_cell"), col("price_cell"),
          zCellBits))
      .select(col("o_orderkey"), col("day_cell"), col("price_cell"),
        col("z"))
      .orderBy(col("o_orderkey"))

  private lazy val q47Sql = {
    val cellSql =
      s"""SELECT o_orderkey,
          GREATEST(0, LEAST(31, CAST(FLOOR(
            (CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
              AS DOUBLE) - $zDayLo) / $zDayStep) AS BIGINT)))
            AS day_cell,
          GREATEST(0, LEAST(31, CAST(FLOOR(
            (CAST(o_totalprice AS DOUBLE) - 0.0) / $zPriceStep)
            AS BIGINT))) AS price_cell
          FROM orders WHERE o_orderkey < 200"""
    s"""SELECT o_orderkey, day_cell, price_cell,
       CAST(${ZOrder.interleave2Sql("day_cell", "price_cell", zCellBits)}
         AS BIGINT) AS z
       FROM ($cellSql) ORDER BY o_orderkey"""
  }

  /** Box query over the Z-bucket-partitioned at-rest layout: the
    * 1997 × [100k, 200k) box touches 6 of 64 `zb=` partitions
    * ([[ZOrder.bucketsForBox]] → literal partition filter,
    * PlanSpec-pinned), then the exact residual WHERE. The oracle is
    * the PLAIN full-scan box query with no Z anywhere — pruning
    * drops no rows. */
  def q48ZorderPruned(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val out = PipelineQueries.layoutDir(dir, "orders",
      s"zorder_b${zBucketBits}_c$zCellBits")
    if (!new java.io.File(out, "_SUCCESS").exists())
      ZOrder.writeZOrdered(zOrderCells(s, dir), col("day_cell"),
        col("price_cell"), zCellBits, zBucketBits, out)
    // query box in fine cells (from the same literal grid)
    val dayCellLo = ((9862 - zDayLo) / zDayStep).toLong // 1997-01-01
    val dayCellHi = ((10226 - zDayLo) / zDayStep).toLong // 1997-12-31
    val priceCellLo = (100000.0 / zPriceStep).toLong
    val priceCellHi = (199999.99 / zPriceStep).toLong
    val zbs = ZOrder.bucketsForBox(zBucketBits, zCellBits,
      dayCellLo, dayCellHi, priceCellLo, priceCellHi)
    s.read.parquet(s"$out/rows")
      .filter(col("zb").isin(zbs.map(Integer.valueOf): _*))
      .filter(col("d").between(9862L, 10226L) &&
        col("o_totalprice") >= 100000.0 && col("o_totalprice") < 200000.0)
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
  }

  private val q48Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
       FROM orders
       WHERE CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400
         BETWEEN 9862 AND 10226
         AND o_totalprice >= 100000.0 AND o_totalprice < 200000.0"""

  // ---------------------------------------------------------------
  // q49: dynamic partition pruning — the fact scan's partition filter
  // is only knowable at RUNTIME (it comes from the dim side's
  // filtered join keys), and Catalyst injects it as a
  // dynamicpruningexpression on the month-partitioned layout. The
  // "let the optimizer do it" counterpart of q48's driver-enumerated
  // static pruning.

  private def orderMonth(c: Column): Column =
    (year(c.cast("timestamp")) * 100 + month(c.cast("timestamp")))
      .cast("int")

  /** Q2-1997 revenue by month, where "Q2-1997" arrives as a FILTER ON
    * THE DIM SIDE of a month-dim join — the fact side is the
    * `om=`-partitioned at-rest orders layout, and only DPP can prune
    * it (the predicate never mentions the fact table). The oracle is
    * the plain WHERE over the source table; PlanSpec pins the
    * dynamicpruningexpression and the partitions-read count. */
  def q49Dpp(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val out = PipelineQueries.layoutDir(dir, "orders", "orders_by_month")
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          orderMonth(col("o_orderdate")).as("om"))
        .repartition(col("om"))
        .write.mode("overwrite").partitionBy("om")
        .parquet(s"$out/rows")
      new java.io.File(out, "_SUCCESS").createNewFile(): Unit
    }
    // month dim DERIVED FROM THE SOURCE TABLE (a separate relation —
    // the fact layout's pruning cannot be folded statically)
    val dim = t(s, dir, "orders")
      .select(orderMonth(col("o_orderdate")).as("om"))
      .distinct()
      .withColumn("yr", (col("om") / 100).cast("int"))
      .withColumn("qtr",
        (((col("om") % 100) - 1) / 3).cast("int") + 1)
    s.read.parquet(s"$out/rows")
      .join(dim.filter(col("yr") === 1997 && col("qtr") === 2),
        Seq("om"))
      .groupBy(col("om"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .orderBy(col("om"))
  }

  private val q49Sql =
    """SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
         AS INTEGER) AS om,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
       FROM orders
       WHERE year(o_orderdate) = 1997
         AND month(o_orderdate) BETWEEN 4 AND 6
       GROUP BY om ORDER BY om"""

  // ---------------------------------------------------------------
  // q50: bucketed co-located join — both sides live in at-rest
  // layouts bucketBy'd on the join key (catalog-registered, one file
  // per bucket, sorted within), so the SortMergeJoin needs NO shuffle
  // exchange and NO sort: the pre-shuffled-layout pattern that
  // replaces the per-query exchange for the recurring 100 TB
  // fact-fact join. PlanSpec pins the exchange-free join subtree.

  /** Register `table` over a bucketed at-rest layout, writing it
    * first if the layout cache is cold. A warm layout in a FRESH
    * session (in-memory catalog starts empty) is re-registered with
    * a CLUSTERED BY DDL over the existing files — never rewritten. */
  private[queries] def ensureBucketedTable(s: SparkSession,
      src: DataFrame, table: String, out: String, key: String,
      nBuckets: Int): Unit = {
    if (!s.catalog.tableExists(table)) {
      if (!new java.io.File(out, "_SUCCESS").exists()) {
        // repartition by the bucket key with nBuckets tasks uses the
        // same murmur-hash-mod placement as bucketBy, so each task
        // holds exactly one bucket → one file per bucket; sortBy
        // keeps each file clustered (compression + min/max skipping —
        // the scan no longer REPORTS the order since Spark 3.0, so a
        // bucket-local SortExec remains in the join plan)
        src.repartition(nBuckets, col(key))
          .write.mode("overwrite")
          .bucketBy(nBuckets, key).sortBy(key)
          .option("path", out).saveAsTable(table)
      } else {
        s.sql(s"""CREATE TABLE $table (${src.schema.toDDL})
          USING parquet
          CLUSTERED BY ($key) SORTED BY ($key) INTO $nBuckets BUCKETS
          LOCATION '$out'""")
      }
    }
  }

  /** Revenue by order priority over a lineitem⋈orders join where BOTH
    * sides read from 8-bucket layouts keyed on the join column. The
    * merge hint keeps the broadcast planner honest at gate scale; the
    * oracle is the plain join over the source tables — the layout is
    * provably lossless. */
  def q50BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val liOut = PipelineQueries.layoutDir(dir, "lineitem", "li_bucket8")
    val ordOut = PipelineQueries.layoutDir(dir, "orders", "ord_bucket8")
    ensureBucketedTable(s,
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount")),
      "graft_li_bucket8", liOut, "l_orderkey", 8)
    ensureBucketedTable(s,
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority")),
      "graft_ord_bucket8", ordOut, "o_orderkey", 8)
    s.table("graft_li_bucket8").hint("merge")
      .join(s.table("graft_ord_bucket8"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  private val q50Sql =
    """SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
         AS DECIMAL(18,6))) AS DOUBLE) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_rollup" -> (q25Rollup _),
    "q26_asof_join" -> (q26AsofJoin _),
    "q27_range_join" -> (q27RangeJoin _),
    "q28_hll_contract" -> (q28HllContract _),
    "q29_salted_join" -> (q29SaltedJoin _),
    "q30_percentiles" -> (q30Percentiles _),
    "q31_pivot" -> (q31Pivot _),
    "q32_hash_sample" -> (q32HashSample _),
    "q33_setops" -> (q33SetOps _),
    "q34_range_frame" -> (q34RangeFrame _),
    "q35_lateral" -> (q35Lateral _),
    "q36_ntile" -> (q36Ntile _),
    "q37_monthly" -> (q37Monthly _),
    "q38_collect_top" -> (q38CollectTop _),
    "q39_topk_per_key" -> (q39TopkPerKey _),
    "q40_topk_rewrite" -> (q40TopkRewrite _),
    "q41_salted_agg" -> (q41SaltedAgg _),
    "q42_percentile_contract" -> (q42PercentileContract _),
    "q43_sql_text_entry" -> (q43SqlTextEntry _),
    "q44_grouping_sets" -> (q44GroupingSets _),
    "q45_unpivot" -> (q45Unpivot _),
    "q46_nullsafe_join" -> (q46NullsafeJoin _),
    "q47_zorder" -> (q47Zorder _),
    "q48_zorder_pruned" -> (q48ZorderPruned _),
    "q49_dpp" -> (q49Dpp _),
    "q50_bucketed_join" -> (q50BucketedJoin _),
    "ta_bigrams" -> (taBigrams _),
    "ta_ttr" -> (taTtr _))

  val oracle: Map[String, String] = Map(
    "q25_rollup" -> q25Sql,
    "q26_asof_join" -> q26Sql,
    "q27_range_join" -> q27Sql,
    "q28_hll_contract" -> q28Sql,
    "q29_salted_join" -> q29Sql,
    "q30_percentiles" -> q30Sql,
    "q31_pivot" -> q31Sql,
    "q32_hash_sample" -> q32Sql,
    "q33_setops" -> q33Sql,
    "q34_range_frame" -> q34Sql,
    "q35_lateral" -> q35Sql,
    "q36_ntile" -> q36Sql,
    "q37_monthly" -> q37Sql,
    "q38_collect_top" -> q38Sql,
    "q39_topk_per_key" -> q39Sql,
    "q40_topk_rewrite" -> q39Sql,
    "q41_salted_agg" -> q41Sql,
    "q42_percentile_contract" -> q42Sql,
    "q43_sql_text_entry" -> q43Sql,
    "q44_grouping_sets" -> q44Sql,
    "q45_unpivot" -> q45Sql,
    "q46_nullsafe_join" -> q46Sql,
    "q47_zorder" -> q47Sql,
    // pruned probe shares the PLAIN full-scan box oracle — the
    // Z-curve + bucket enumeration provably drop no rows
    "q48_zorder_pruned" -> q48Sql,
    // plain-WHERE oracle again: runtime pruning must drop no rows
    "q49_dpp" -> q49Sql,
    // bucketed layout shares the plain-join oracle — the layout is
    // lossless; what changes is the PLAN (no exchange under the SMJ)
    "q50_bucketed_join" -> q50Sql,
    "ta_bigrams" -> taBigramsSql,
    "ta_ttr" -> taTtrSql)
}
