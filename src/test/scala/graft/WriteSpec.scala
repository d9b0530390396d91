package graft

import graft.engine.{Converter, GraphTables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Parquet sink round-trip: the durable form of the four tables
  * (SURVEY.md S6 — capability replacement for the SQLite file). */
class WriteSpec extends SparkSpec {
  import spark.implicits._

  test("write + read round-trips all four tables") {
    val out = Files.createTempDirectory("graft-write").toString
    val t = new Converter(spark, Converter.coreAdapters)
      .convertAndWrite(fixturesDir, out)
    val back = GraphTables.read(spark, out)
    assert(back.documents.count() === t.documents.count())
    assert(back.nodes.count() === 40)
    assert(back.properties.count() === t.properties.count())
    assert(back.crossReferences.count() === t.crossReferences.count())
    // nodes are partitioned by node_type → type filters prune partitions
    assert(new java.io.File(s"$out/nodes/node_type=book").exists())
    val plan = back.nodes.filter($"node_type" === "book")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters"), plan)
    // round-tripped rows are value-identical (modulo created_at order)
    val a = t.nodes.select($"id", $"node_type", $"parent_id", $"position",
      $"content", $"xpath").as[(String, String, Option[String], Int,
      Option[String], String)].collect().toSet
    val b = back.nodes.select($"id", $"node_type", $"parent_id",
      $"position", $"content", $"xpath").as[(String, String,
      Option[String], Int, Option[String], String)].collect().toSet
    assert(a === b)
  }

  test("CLI main converts a directory and prints stats") {
    val out = Files.createTempDirectory("graft-cli").toString + "/db"
    val stdout = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(stdout)) {
      Main.main(Array("-i", fixturesDir, "-o", out, "--examples",
        "--force", "-c", "4"))
    }
    val printed = stdout.toString
    assert(printed.contains("Conversion complete!"))
    assert(printed.contains("Nodes: 40"))
    assert(new java.io.File(s"$out/cross_references").exists())
    val back = GraphTables.read(spark, out)
    // examples adapters add multi/semantic edge families
    val types = back.crossReferences.select($"reference_type").distinct()
      .as[String].collect().toSet
    assert(types.contains("same_type"))
  }

  test("CLI main reports unparseable files in the stats") {
    val in = Files.createTempDirectory("graft-cli-bad")
    Files.copy(java.nio.file.Paths.get(s"$fixturesDir/simple.xml"),
      in.resolve("simple.xml"))
    // no root element ever opens ⇒ nothing to salvage ⇒ skipped (a
    // merely-unclosed file would now be prefix-salvaged instead)
    Files.write(in.resolve("broken.xml"),
      "this is not xml at all".getBytes("UTF-8"))
    val out = Files.createTempDirectory("graft-cli-bad-out").toString + "/db"
    val stdout = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(stdout)) {
      Main.main(Array("-i", in.toString, "-o", out, "--force"))
    }
    val printed = stdout.toString
    assert(printed.contains("Documents: 1 ("), printed)
    assert(printed.contains("Skipped (unparseable): 1"), printed)
  }
}
