package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Graph centrality over pair relations the pipeline already produces
  * (near-dup candidate pairs, cross-references): which nodes sit at
  * the center of a duplication cluster or reference web. The classic
  * use in a curation pipeline is canonical-document selection — rank
  * the members of a dup cluster and keep the most central — and
  * template-farm detection (hub pages rank far above their cluster's
  * median).
  */
object GraphRank {

  /** Deterministic damped PageRank over an undirected pair relation
    * `(aCol, bCol)`: a fixed number of power iterations of
    * `r(v) ← (1−d)/N + d·Σ_{u~v} r(u)/deg(u)` over the symmetrized
    * edge set, N = number of distinct endpoints (isolated vertices
    * carry no edge and are out of scope — their rank is the floor
    * `(1−d)/N` by definition). Fixed iterations, no convergence
    * collect — the same budget discipline as
    * [[Similarity.kmeansCentroids]].
    *
    * Determinism (the oracle-replay contract): per-edge contributions
    * `r/deg` are exact double divisions routed through DECIMAL(28,15)
    * so the per-vertex sum is partition-order-invariant; the damping
    * update is fixed-order double arithmetic. This is why the
    * relational form gates instead of GraphX's `staticPageRank`,
    * whose float message sums are combine-order-dependent — the
    * GraphX path is the drop-in for when bit-replay is not required.
    *
    * Scale shape: per iteration one src-keyed join (edges × ranks)
    * and one dst-keyed partial-sum aggregate — identical to GraphX's
    * message/combine structure. The edge relation is the loop
    * invariant: checkpointed once here; at real scale written
    * pre-partitioned by src so every iteration's join is co-located
    * (the degree table rides along keyed the same way). Ranks are
    * vertex-sized. `localCheckpoint` per iteration truncates lineage
    * (the iterative-loop Catalyst trap). Output `(id, pr)` rounded to
    * 6 decimals. */
  def pageRank(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, "pageRank: iters >= 1")
    val dec = DecimalType(28, 15)
    val sym = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(false) // loop invariant — scanned every iteration
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val n = deg.count()
    require(n > 0, "pageRank: empty edge relation")
    val base = (1.0 - damping) / n
    var r = deg.select(col("src").as("id"), col("outdeg"),
      lit(1.0 / n).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = sym
        .join(r.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          (col("rank") / col("outdeg")).cast(dec).as("c"))
      r = contrib.groupBy(col("dst"))
        .agg(sum(col("c")).as("csum"))
        .join(deg.withColumnRenamed("src", "dst"), Seq("dst"))
        .select(col("dst").as("id"), col("outdeg"),
          (lit(base) + lit(damping) * col("csum").cast("double"))
            .as("rank"))
        .localCheckpoint()
    }
    r.select(col("id"), Similarity.r6(col("rank")).as("pr"))
  }

  /** The GraphX path for the same computation — `staticPageRank` over
    * the symmetrized pair graph, rescaled from GraphX's
    * sum-N convention to the probability-mass convention
    * [[pageRank]] uses. Float message combines make it
    * combine-order-dependent (NOT oracle-replayable — PipelineSpec
    * pins agreement with the relational form to 1e-6 instead), but at
    * extreme scale its Pregel runtime owns vertex/edge placement and
    * in-place state. Same block-release discipline as
    * [[Dedup.componentClusters]]: materialize, then unpersist both
    * graphs. */
  def pageRankGraphX(pairs: DataFrame, aCol: String, bCol: String,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    val spark = pairs.sparkSession
    val edges = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .rdd.flatMap { r =>
        Seq(Edge(r.getLong(0), r.getLong(1), 1.0),
          Edge(r.getLong(1), r.getLong(0), 1.0))
      }.distinct()
    val g = Graph.fromEdges(edges, 0.0)
    val ranked = g.staticPageRank(iters, 1.0 - damping)
    val n = g.numVertices
    val out = spark.createDataFrame(
      ranked.vertices.map { case (id, pr) => (id, pr / n) })
      .toDF("id", "pr_graphx")
      .localCheckpoint() // materialize BEFORE releasing graph blocks
    ranked.unpersist(blocking = false)
    g.unpersist(blocking = false)
    out
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected pair relation — the density signal that separates a
    * genuine duplicate clique (LCC ≈ 1) from a hub-and-spoke template
    * farm (high degree, LCC ≈ 0), and the standard community-structure
    * probe on co-occurrence graphs.
    *
    * Algorithm: degree-ordered orientation (Cohen's MR triangle
    * counting / Latapy's compact-forward). Each undirected edge is
    * oriented from its lower-(degree, id) endpoint, which bounds every
    * out-neighborhood by O(√m) regardless of skew — the wedge
    * self-join on a hub node of degree d generates O(d²) candidates
    * un-oriented but only O(m) total once oriented, which is what
    * makes the plan survive a power-law graph at 100 TB. Wedges
    * (x→y, x→z) ordered by the same (degree, id) key close into a
    * triangle iff the oriented edge y→z exists: one equi-join against
    * the oriented edge set, no Cartesian anywhere. Both shuffles key
    * on node ids — AQE handles residual skew.
    *
    * Output: `(node, degree, n_triangles, lcc)` for every edge
    * endpoint, `lcc = 2·T/(deg·(deg−1))` (0.0 for degree-1 nodes),
    * totally ordered by node. Exact integer counts; the one double
    * division is decimal-routed to 6 dp. */
  def triangleStats(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val e = canonicalEdges(pairs, aCol, bCol)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val tris = orientedTriangles(e, deg)
    val perNode = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        round((when(col("deg") >= 2,
          lit(2.0) * coalesce(col("n_triangles"), lit(0L))
            .cast("double") /
            (col("deg") * (col("deg") - 1)).cast("double"))
          .otherwise(lit(0.0))).cast(DecimalType(28, 10)), 6)
          .cast("double").as("lcc"))
      .orderBy(col("node"))
  }

  /** The canonical undirected edge set of a pair relation: endpoints
    * least/greatest-ordered, self-loops dropped, distinct. */
  private def canonicalEdges(pairs: DataFrame, aCol: String,
      bCol: String): DataFrame =
    pairs
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** The degree-ordered-orientation triangle relation over a
    * canonical edge set `(u, v)` with its degree table `(node, deg)`:
    * one row `(x, y, z)` per triangle (each triangle exactly once —
    * the wedge opens at its lowest-(degree, id) corner). The
    * machinery [[triangleStats]] and [[triangleCountApprox]] share;
    * out-neighborhoods are O(√m) regardless of skew, no Cartesian. */
  private def orientedTriangles(e: DataFrame,
      deg: DataFrame): DataFrame = {
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")),
        Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")),
        Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.filter(uFirst)
      .select(col("u").as("src"), col("v").as("dst"),
        col("dv").as("ddst"))
      .unionAll(withDeg.filter(!uFirst)
        .select(col("v").as("src"), col("u").as("dst"),
          col("du").as("ddst")))
    val o1 = oriented.alias("o1")
    // (the wedge SELF-join deliberately stays sort-merge: a
    // shuffle-hash hint here was measured SLOWER — it breaks the
    // self-join's exchange sharing, and both sides are the same small
    // relation anyway; the blow-up happens in the OUTPUT, which SMJ
    // streams)
    val o2 = oriented.alias("o2")
    val wedges = o1.join(o2,
      col("o1.src") === col("o2.src") &&
        (col("o1.ddst") < col("o2.ddst") ||
          (col("o1.ddst") === col("o2.ddst") &&
            col("o1.dst") < col("o2.dst"))))
      .select(col("o1.src").as("x"), col("o1.dst").as("y"),
        col("o2.dst").as("z"))
    // Closure join strategy: SHUFFLE_HASH on the EDGE side. The wedge
    // relation is the Θ(Σd_out²) blow-up (41M rows off 1.2M edges at
    // sf0.1) and sort-merge would sort IT — the single most expensive
    // step of the whole operator — while the edge side is the small,
    // already-distinct relation a per-partition hash table holds
    // cheaply (m/numPartitions rows). Skew is impossible by
    // construction (orientation bounds every out-neighborhood by
    // O(√m), so no (y,z) key repeats more than once on the build side
    // and the wedge side's per-key multiplicity is ≤ √m), which is
    // exactly the case where shuffled-hash strictly dominates
    // sort-merge.
    wedges.join(
      oriented.select(col("src").as("y"), col("dst").as("z"))
        .hint("shuffle_hash"),
      Seq("y", "z"))
  }

  /** DOULION-style approximate GLOBAL triangle count (Tsourakakis et
    * al., KDD'09): keep each canonical edge independently with
    * probability `p = keep/256`, count triangles EXACTLY on the
    * sparsified graph with the same degree-ordered orientation, and
    * scale by `1/p³` (each triangle survives iff all three edges do).
    * Sampling is deterministic and engine-portable — an edge is kept
    * iff the first two hex chars of `md5('u|v')` sort below the
    * two-hex-digit `keep` threshold (the q32 hash-sampling idiom), so
    * the SAME edges are kept on any engine, any partition count, any
    * run, and a DuckDB oracle replays the estimate bit-for-bit.
    *
    * This is the 100 TB scale story the exact form cannot offer:
    * triangle MASS grows super-linearly on a densifying graph (the
    * measured sf0.1→sf1 exponent of gr_triangles is ~1.16), but the
    * sparsified count runs on ~p·m edges with wedge work shrinking
    * ~p³ in dense regions — p is the knob that keeps a fixed compute
    * budget while the unbiased estimator (variance bounds in the
    * paper) tracks the true count. Degrees for the orientation are
    * computed ON the sparsified graph (the paper's form — the
    * orientation only needs SOME total order; sampled degrees keep
    * the O(√(pm)) neighborhood bound).
    *
    * Output: ONE row `(n_edges, n_sampled, tri_sampled,
    * est_triangles)` — the full and kept edge counts (the audit
    * trail), the exact sampled-graph triangle count, and the scaled
    * estimate decimal-routed to 6 dp (`tri_sampled / p³` — exact
    * double arithmetic both engines reproduce). */
  def triangleCountApprox(pairs: DataFrame, aCol: String, bCol: String,
      keep: Int = 128): DataFrame = {
    require(keep >= 1 && keep <= 255,
      "triangleCountApprox: keep must be in [1, 255] (p = keep/256; " +
        "p = 1 is the exact form — use triangleStats)")
    val p = keep / 256.0
    // NO checkpoint on the shared edge relation: a LAZY
    // localCheckpoint consumed several times within the one final
    // action does not dedupe (round-10 rule — it measurably slowed
    // this operator), and an EAGER one writes a corpus-sized relation
    // to block storage. The consumers therefore re-run the edge
    // derivation — same trade the exact [[triangleStats]] makes — and
    // the asymptotically heavy stage (the O((pm)^1.5) wedge join +
    // closure) still runs exactly once. A deployment sampling a
    // 100 TB graph repeatedly would persist the sampled edge set as
    // an at-rest relation instead (the layout tier's job, orthogonal
    // to the estimator).
    val hex = f"$keep%02x"
    // The keep flag is computed INSIDE the distinct aggregate (max of
    // a group-constant expression) rather than as a filter over the
    // distinct edge set: a deterministic predicate on the group keys
    // gets pushed BELOW the aggregate, which splits the exchange —
    // the round-19 executed-plan audit showed the pair-explosion join
    // and a full edge distinct running TWICE, once md5-filtered for
    // the sampled side and once unfiltered for the n_edges audit
    // column (plans/r19/gr_triangles_approx_before.txt, Exchanges
    // 10811 vs 10844). An aggregate-output column cannot be pushed
    // through, so every consumer — the sampled triangle machinery AND
    // the audit count — now shares ONE exchange via AQE's
    // ReusedExchange. The md5 work is unchanged (it already ran
    // per pre-distinct pair row on the filtered side); the audit
    // column forces the full-edge shuffle regardless, so sharing it
    // is strictly fewer bytes than full + p·full.
    val eFlag = pairs
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .groupBy(col("u"), col("v"))
      .agg(max(substring(
        md5(concat(col("u").cast("string"), lit("|"),
          col("v").cast("string")).cast("binary")), 1, 2)).as("h2"))
    val kept = eFlag.filter(col("h2") < hex).select(col("u"), col("v"))
    val deg = kept.select(col("u").as("node"))
      .unionAll(kept.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val tri = orientedTriangles(kept, deg)
      .agg(count(lit(1)).as("tri_sampled"))
    // n_edges AND n_sampled from ONE aggregate over eFlag: a separate
    // `eFlag.agg(count)` lets column pruning drop the unused h2
    // aggregate, which re-splits the canonical subplan from the kept
    // side's and brings the second pair join back (observed in the
    // first cut of this fix). Referencing h2 in the same agg keeps
    // the audit-count subtree bit-identical to the kept side's below
    // the exchange. coalesce: sum over zero rows is NULL where the
    // old count() was 0.
    eFlag.agg(count(lit(1)).as("n_edges"),
        coalesce(sum(when(col("h2") < hex, 1L).otherwise(0L)),
          lit(0L)).as("n_sampled"))
      .crossJoin(broadcast(tri))
      .select(col("n_edges"), col("n_sampled"), col("tri_sampled"),
        round((col("tri_sampled").cast("double") / lit(p * p * p))
          .cast(DecimalType(28, 10)), 6)
          .cast("double").as("est_triangles"))
  }
}
