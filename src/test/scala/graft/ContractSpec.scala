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
    assert(Bench.timeRuns(()).isRight)
    assert(Bench.timeRuns { throw new IllegalStateException("boom") }
      === Left("IllegalStateException: boom"))
    // message-less throwable: no trailing ": "
    assert(Bench.timeRuns { throw new IllegalStateException() }
      === Left("IllegalStateException"))
    // control chars in the message must not survive into the JSON string
    assert(Bench.timeRuns {
      throw new IllegalStateException("a\u0000b\bc\fd\"e\\f")
    }.left.exists(s => s.forall(c => c >= ' ' && c != '"' && c != '\\')))
  }

  test("layoutBacked covers every gate whose body reaches ensureLayout") {
    // Bench warms EXACTLY PipelineQueries.layoutBacked before timing;
    // a layout-backed gate missing from the set books its one-time
    // cold-cache build as an apparent query regression (BENCH_r09's
    // 12× artifact; 10 gates had drifted out of the set by round 14).
    // Pin the "keep in sync with the ensureLayout call sites"
    // scaladoc mechanically: scan the source for top-level gate
    // bodies that reach ensureLayout / a layoutLock-guarded
    // maintainer, directly or through up to two private helpers.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/queries/PipelineQueries.scala")), "UTF-8")
    val defPat = """\n  (?:private(?:\[graft\])? )?def (\w+)\(""".r
    val defs = defPat.findAllMatchIn(src).map(m => (m.start, m.group(1))).toSeq
    val bodies: Map[String, String] = defs.zipWithIndex.map {
      case ((pos, name), i) =>
        val end = if (i + 1 < defs.size) defs(i + 1)._1 else src.length
        name -> src.substring(pos, end)
    }.toMap
    val calleePat = """(\w+)\((?:s, dir|spark)""".r
    val helperPat = """(\w+Layout|\w+Guarded)\(""".r
    def usesLayout(fn: String, depth: Int): Boolean =
      bodies.get(fn).exists { b =>
        b.contains("ensureLayout(") || b.contains("layoutLock(") ||
          (depth < 2 && (calleePat.findAllMatchIn(b).map(_.group(1)) ++
            helperPat.findAllMatchIn(b).map(_.group(1)))
            .exists(c => c != fn && usesLayout(c, depth + 1)))
      }
    val regPat = """"([a-z0-9_]+)" -> \((\w+) _\)""".r
    val reg = regPat.findAllMatchIn(src)
      .map(m => m.group(1) -> m.group(2)).toMap
    val missing = reg.collect {
      case (q, fn) if usesLayout(fn, 0) &&
        !PipelineQueries.layoutBacked(q) => q
    }
    assert(missing.isEmpty,
      s"gates reaching ensureLayout but absent from layoutBacked " +
        s"(bench would time their cold build): ${missing.toSeq.sorted}")
    // and the set never names an unregistered query
    val unknown = PipelineQueries.layoutBacked -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"layoutBacked names no query: $unknown")
    // sessionCached (warmed by the same Bench pass, for caches the
    // scan above can't see) must also name only registered queries,
    // and never overlap layoutBacked (a gate is warmed by exactly
    // one mechanism)
    val unknownSc =
      PipelineQueries.sessionCached -- SparkEntry.queries.keySet
    assert(unknownSc.isEmpty, s"sessionCached names no query: $unknownSc")
    assert((PipelineQueries.sessionCached &
      PipelineQueries.layoutBacked).isEmpty,
      "a gate must be warmed by exactly one mechanism")
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
