package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Logical per-key top-k: the first `k` rows of each `keys` group in
  * `order`, each with its 1-based `rank` — the semantics of
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k`,
  * expressed as a first-class operator so the planner can pick a
  * bounded-heap physical strategy instead of Window's full per-group
  * sort (build-brief preference order (c): custom LogicalPlan +
  * SparkStrategy + SparkPlan via SparkSessionExtensions).
  *
  * `order` must be a total order within each key for the ranks to be
  * deterministic — same contract as the window form. */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: AttributeReference, child: LogicalPlan)
  extends UnaryNode {
  require(keys.nonEmpty, "TopKPerKey requires at least one key")
  require(k >= 1, s"TopKPerKey requires k >= 1, got $k")
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst
    .expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKeyNode = copy(child = newChild)
}

/** Physical per-key top-k: one bounded max-heap of size `k` per
  * distinct key per partition. Memory is O(keys-per-partition × k)
  * rows — never the full group — and each input row costs O(log k),
  * versus Window's full per-partition sort (O(n log n) and a
  * spillable sort buffer holding every row). The required
  * `ClusteredDistribution(keys)` makes `EnsureRequirements` insert
  * the same hash shuffle the window form needs, so the plans differ
  * exactly where it matters: sort-everything vs heap-k. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst
    .expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val outTypes = (child.output :+ rankAttr).map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap by the sort order: head = worst kept row of the group
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = new java.util.PriorityQueue[InternalRow](limit, cmp)
          heaps.put(key.copy(), q)
        }
        if (q.size < limit) q.add(row.copy())
        else if (ord.compare(row, q.peek()) < 0) {
          q.poll()
          q.add(row.copy())
        }
      }
      val groups = heaps.values().iterator()
      // downstream operators expect UnsafeRow — project the joined
      // (row, rank) through the output schema
      val outProj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var current: Iterator[InternalRow] = Iterator.empty
        override def hasNext: Boolean = {
          while (!current.hasNext && groups.hasNext) {
            val q = groups.next()
            val rows = new Array[InternalRow](q.size)
            var i = rows.length - 1
            // heap drains worst-first → fill back-to-front for rank order
            while (i >= 0) { rows(i) = q.poll(); i -= 1 }
            current = rows.iterator.zipWithIndex.map { case (r, idx) =>
              outProj(joined(r, new GenericInternalRow(Array[Any](idx + 1))))
            }
          }
          current.hasNext
        }
        override def next(): InternalRow = current.next()
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}

/** Planner strategy for [[TopKPerKeyNode]]. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rankAttr, child) =>
      TopKPerKeyExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level entry: `TopKPerKey(df, keys, order, k)` appends a
  * `rank` column and keeps the first k rows per key. Sort columns are
  * named with a descending flag (`("price", true)` = price DESC) and
  * resolved against the analyzed plan — no dependence on Column
  * internals. Registers the strategy on the session if the
  * [[graft.functions.GraftExtensions]] injector isn't installed. */
object TopKPerKey {

  def apply(df: DataFrame, keys: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    // resolve like the analyzer would: honor the session's
    // case-sensitivity conf and refuse ambiguous names (a join can
    // carry duplicate column names; silently taking the first would
    // pick a side arbitrarily)
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute =
      analyzed.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"TopKPerKey: no column '$name' in ${analyzed.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"TopKPerKey: ambiguous column '$name' matches " +
            s"${many.map(_.name)} — disambiguate with select/alias first")
      }
    val sortOrder = order.map { case (name, desc) =>
      if (desc) SortOrder(attr(name), org.apache.spark.sql.catalyst
        .expressions.Descending)
      else SortOrder(attr(name), org.apache.spark.sql.catalyst
        .expressions.Ascending)
    }
    val rankAttr = AttributeReference("rank", IntegerType,
      nullable = false)()
    GraftPlanBridge.ofRows(spark,
      TopKPerKeyNode(keys.map(attr), sortOrder, k, rankAttr, analyzed))
  }

  /** Idempotent per-session strategy injection for sessions built
    * without `spark.sql.extensions=graft.functions.GraftExtensions`. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val extra = spark.experimental.extraStrategies
    if (!extra.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = extra :+ TopKPerKeyStrategy
  }

  /** Apply [[TopKRewriteRule]] to one DataFrame: if its optimized plan
    * ends in the `Filter(rank <= k, Window(row_number))` idiom, return
    * the same query through [[TopKPerKeyNode]]; otherwise return the
    * input unchanged. Deterministic per-DataFrame opt-in — unlike a
    * session-level rule, it cannot make other queries' plans depend on
    * what ran earlier in the session. */
  def rewrite(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val optimized = df.queryExecution.optimizedPlan
    val rewritten = TopKRewriteRule(optimized)
    if (rewritten eq optimized) df
    else GraftPlanBridge.ofRows(spark, rewritten)
  }
}
