package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom LogicalPlan/SparkStrategy/SparkPlan tier: per-key top-k
  * must agree exactly with the window formulation it replaces, plan
  * through the custom exec node, and keep bounded state semantics. */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame,
      key: String, order: Seq[org.apache.spark.sql.Column], k: Int) =
    df.withColumn("rank", row_number().over(
        Window.partitionBy(col(key)).orderBy(order: _*)))
      .filter(col("rank") <= k)

  test("TopKPerKey equals the row_number window form on customer") {
    val c = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
    val viaWindow = windowForm(c, "c_mktsegment",
      Seq($"c_acctbal".desc, $"c_custkey"), 3)
      .as[(String, Long, Double, Int)].collect().toSet
    val viaCustom = TopKPerKey(c, Seq("c_mktsegment"),
      Seq(("c_acctbal", true), ("c_custkey", false)), 3)
      .as[(String, Long, Double, Int)].collect().toSet
    assert(viaCustom === viaWindow)
  }

  test("TopKRewriteRule fires on the ANN/retrieval row_number idiom") {
    // the injected optimizer rule must recognize the per-query top-k
    // shape every search operator emits (the full oracle gate runs
    // green with SPARK_GRAFT_EXTENSIONS=1, proving the rewrite
    // equivalence-preserving corpus-wide; this pins that it actually
    // FIRES there rather than silently declining)
    for (q <- Seq("ann_brute_topk", "pp_bm25_search")) {
      val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
      val rewritten =
        graft.plans.TopKRewriteRule(df.queryExecution.optimizedPlan)
      assert(rewritten.exists(
        _.isInstanceOf[graft.plans.TopKPerKeyNode]),
        s"$q: rule declined on\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("TopKPerKey plans through the custom exec, not Window") {
    val c = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
    val df = TopKPerKey(c, Seq("c_mktsegment"),
      Seq(("c_acctbal", true), ("c_custkey", false)), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    // EnsureRequirements inserted the key shuffle the semantics need
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("TopKPerKey: k larger than every group ranks all rows") {
    val d = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("g", "v")
    val got = TopKPerKey(d, Seq("g"), Seq(("v", false)), 10)
      .as[(String, Int, Int)].collect().toSet
    assert(got === Set(("a", 1, 1), ("a", 2, 2), ("b", 5, 1)))
  }

  test("TopKRewriteRule: window idiom rewrites to the custom node; guards hold") {
    val c = spark.read.parquet(sf("sf0.001") + "/customer.parquet")
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal")
    val idiom = windowForm(c, "c_mktsegment",
      Seq($"c_acctbal".desc, $"c_custkey"), 3)
    // positive: the rewrite fires, results are identical, plan runs
    // the custom exec instead of Window
    val rewritten = TopKPerKey.rewrite(idiom)
    assert(rewritten.queryExecution.optimizedPlan.collectFirst {
      case n: graft.plans.TopKPerKeyNode => n }.nonEmpty)
    rewritten.collect()
    val plan = rewritten.queryExecution.executedPlan.toString
    // the Window exec ("Window [...") must be gone; Spark's own
    // map-side WindowGroupLimit prune is kept as the exec's child —
    // the rewrite composes with InferWindowGroupLimit, so fewer rows
    // even reach the shuffle
    assert(plan.contains("TopKPerKey") && !plan.contains("Window ["), plan)
    assert(rewritten.as[(String, Long, Double, Int)].collect().toSet ===
      idiom.as[(String, Long, Double, Int)].collect().toSet)
    // negative guards: equality filter, global window → untouched
    val eqFilter = c.withColumn("rank", row_number().over(
        Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal".desc, $"c_custkey")))
      .filter($"rank" === 2)
    assert(TopKPerKey.rewrite(eqFilter).queryExecution.optimizedPlan
      .collectFirst { case n: graft.plans.TopKPerKeyNode => n }.isEmpty)
    def nodeCount(df: org.apache.spark.sql.DataFrame): Int =
      TopKPerKey.rewrite(df).queryExecution.optimizedPlan.collect {
        case n: graft.plans.TopKPerKeyNode => n }.size
    // memory guard: k above spark.graft.topk.maxK keeps the spillable
    // window form (the heap exec holds keys×k rows on-heap, no spill)
    spark.conf.set("spark.graft.topk.maxK", "2")
    try {
      assert(nodeCount(windowForm(c, "c_mktsegment",
        Seq($"c_acctbal".desc, $"c_custkey"), 3)) === 0)
      assert(nodeCount(windowForm(c, "c_mktsegment",
        Seq($"c_acctbal".desc, $"c_custkey"), 2)) === 1)
    } finally spark.conf.unset("spark.graft.topk.maxK")
    // misconfiguration guard: a non-numeric conf value must name the
    // conf key instead of surfacing a bare NumberFormatException from
    // inside the optimizer
    spark.conf.set("spark.graft.topk.maxK", "lots")
    try {
      val e = intercept[Exception] {
        TopKPerKey.rewrite(windowForm(c, "c_mktsegment",
          Seq($"c_acctbal".desc, $"c_custkey"), 3)).queryExecution
          .optimizedPlan
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ messages(x.getCause))
      assert(messages(e).exists(_.contains("spark.graft.topk.maxK")), e)
    } finally spark.conf.unset("spark.graft.topk.maxK")
    // overflow guard: `rank < Int.MinValue` is always-false; the old
    // `v - 1` Int arithmetic wrapped it to k = Int.MaxValue
    val minLit = c.withColumn("rank", row_number().over(
        Window.partitionBy($"c_mktsegment")
          .orderBy($"c_acctbal".desc, $"c_custkey")))
      .filter($"rank" < Int.MinValue)
    assert(nodeCount(minLit) === 0)
    assert(minLit.count() === 0L)
  }

  test("TopKPerKey: null keys and null sort values match the window form") {
    val d = Seq[(Option[String], Option[java.lang.Double], Long)](
      (Some("a"), Some(3.0), 1L), (Some("a"), None, 2L),
      (Some("a"), Some(9.0), 3L), (None, Some(5.0), 4L),
      (None, None, 5L), (Some("b"), None, 6L))
      .toDF("g", "v", "tb")
    val viaWindow = windowForm(d, "g", Seq($"v".desc, $"tb"), 2)
      .as[(Option[String], Option[Double], Long, Int)].collect().toSet
    val viaCustom = TopKPerKey(d, Seq("g"),
      Seq(("v", true), ("tb", false)), 2)
      .as[(Option[String], Option[Double], Long, Int)].collect().toSet
    assert(viaCustom === viaWindow)
    // null keys group together (one group), like the window's
    // partitioning; DESC ranks nulls last, like SortOrder's default
    assert(viaCustom.contains((None, Some(5.0), 4L, 1)))
    assert(viaCustom.contains((None, None, 5L, 2)))
  }

  test("property: TopKPerKey equals window form on random frames") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRows = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 4), Gen.choose(0L, 20L), Gen.choose(0L, 9L)))
    val prop = Prop.forAll(genRows, Gen.choose(1, 5)) { (rows, k) =>
      // (payload, tiebreak) is made unique per group so ranks are
      // deterministic in both forms
      val fact = rows.zipWithIndex
        .map { case ((g, v, _), i) => (s"g$g", v, i.toLong) }
        .toDF("g", "v", "tb")
      val viaWindow = windowForm(fact, "g", Seq($"v".desc, $"tb"), k)
        .as[(String, Long, Long, Int)].collect().toSet
      val viaCustom = TopKPerKey(fact, Seq("g"),
        Seq(("v", true), ("tb", false)), k)
        .as[(String, Long, Long, Int)].collect().toSet
      viaCustom === viaWindow
    }
    val params = SCTest.Parameters.default.withMinSuccessfulTests(6)
    assert(SCTest.check(params, prop).passed)
  }
}
