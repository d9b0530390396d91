package graft

import graft.queries._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract wiring invariants. `SparkEntry.queries` is five
  * maps merged with `++`, where a duplicate key would silently drop
  * one module's query from the graded surface — these checks make any
  * such wiring mistake a test failure instead. Pure map algebra: no
  * SparkSession needed. */
class ContractSpec extends AnyFunSuite {

  private val parts = Seq(
    "core" -> StarQueries.core.keySet,
    "pipeline" -> PipelineQueries.all.keySet,
    "events" -> EventQueries.all.keySet,
    "extended" -> ExtendedQueries.all.keySet,
    "xml" -> XmlQueries.all.keySet)

  test("query names are unique across all modules (no silent merge loss)") {
    for (Seq((na, a), (nb, b)) <- parts.combinations(2)) {
      val overlap = a & b
      assert(overlap.isEmpty, s"$na and $nb both define: $overlap")
    }
    assert(SparkEntry.queries.size === parts.map(_._2.size).sum)
  }

  test("every oracle key names a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty,
      s"oracle SQL with no matching query (would fail the gate): $dangling")
  }

  test("every registered query has an oracle (no rows-only checks)") {
    // Since round 3 the xml_* fixture queries carry VALUES-relation
    // goldens (XmlGoldens), so the driver hash-verifies every entry.
    // Pinned at empty so a query silently LOSING its oracle fails here.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set.empty[String])
  }

  test("bench timing reports a failure as Left, never a booked time") {
    assert(Bench.timeMedian(()).isRight)
    assert(Bench.timeMedian { throw new IllegalStateException("boom") }
      === Left("IllegalStateException"))
  }

  test("per-module oracle maps never reference foreign queries") {
    val oraclesByModule = Seq(
      "core" -> (StarQueries.coreOracle.keySet, StarQueries.core.keySet),
      "pipeline" -> (PipelineQueries.oracle.keySet, PipelineQueries.all.keySet),
      "events" -> (EventQueries.oracle.keySet, EventQueries.all.keySet),
      "extended" -> (ExtendedQueries.oracle.keySet, ExtendedQueries.all.keySet),
      "xml" -> (XmlQueries.oracle.keySet, XmlQueries.all.keySet))
    for ((name, (oracleKeys, queryKeys)) <- oraclesByModule)
      assert((oracleKeys -- queryKeys).isEmpty,
        s"$name oracle keys outside its query map: ${oracleKeys -- queryKeys}")
  }
}
