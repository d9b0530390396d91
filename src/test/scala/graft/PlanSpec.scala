package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan assertions — the 100 TB design contract. Correctness
  * is the oracle's job; these tests pin the *plan shapes* that make the
  * queries scale: filters reaching the parquet scan, column pruning,
  * broadcast joins for dimensions, TakeOrderedAndProject for top-k, and
  * whole-stage codegen coverage. A regression here is a performance
  * bug even while every oracle still matches. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001"))
      .queryExecution.explainString(FormattedMode)

  test("q01: shipdate filter is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("LessThanOrEqual(l_shipdate"), p)
  }

  test("q01: scan is pruned to the referenced columns only") {
    val p = plan("q01_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse("")
    assert(readSchema.contains("l_returnflag"))
    assert(!readSchema.contains("l_partkey"),
      s"scan reads unneeded column: $readSchema")
    assert(!readSchema.contains("l_tax"), readSchema)
  }

  test("q05/q15: dimension joins broadcast") {
    assert(plan("q05_segment_revenue").contains("BroadcastHashJoin"))
    val p15 = plan("q15_multiway_join")
    assert(p15.contains("BroadcastHashJoin"))
  }

  test("q04: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q04_top_customers")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q06/q07: semi/anti joins plan as joins, not subquery loops") {
    assert(plan("q06_semi_join").contains("LeftSemi"))
    assert(plan("q07_anti_join").contains("LeftAnti"))
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    // codegen spans only materialize in the AQE final plan — execute
    val df = SparkEntry.queries("q01_pricing_summary")(spark, sf("sf0.001"))
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("*("),
      s"no WholeStageCodegen stage in executed plan:\n$executed")
  }

  test("semi-join filters stay pushed for the attribute search") {
    // flagship search shape: property filter must reach the scan side
    val t = graft.queries.XmlQueries.tables(spark)
    val q = graft.queries.GraphQueries
      .searchByAttribute(t, "category", "cat_fiction")
    val p = q.queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("entry flagship broadcasts both dimension tables") {
    val p = SparkEntry.entry(spark).queryExecution
      .explainString(FormattedMode)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }
}
