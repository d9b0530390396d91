package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Runs per query; the median is reported. Three samples cost ~2 min
    * at sf0.1 and collapse the 10-30% single-shot machine-load drift
    * documented in BASELINE.md, so round-over-round comparisons track
    * plan changes instead of noise. */
  private val Runs = 3

  /** Fully materialize a query result through the noop sink. The
    * previous action (`df.count()`) let Catalyst prune everything a
    * row count doesn't need — pure projections collapsed to bare
    * row-count scans, aggregate expressions dropped out of terminal
    * groupBys, and left joins against provably-unique keys
    * (aggregate-derived frames) were join-ELIMINATED outright, so
    * several gates' bench entries timed a fraction of their real
    * work (pp_split_decontam's full-corpus MinHash booked 0.25 s at
    * sf10; pp_filter_ppl_e2e's KN-scoring join vanished). The noop
    * sink evaluates EVERY output column of every row and discards
    * them — the plan that runs is the plan verify writes, minus only
    * the parquet encoder. Round-16 bench records re-base on this
    * action; earlier rounds' totals are count()-action records. */
  private def exec(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  /** Time `body` [[Runs]] times and return Right(all raw samples, in
    * run order), or Left(error) if any run throws — a failure must
    * surface as an explicit red flag in the JSON, never as a
    * silently-booked elapsed time (a missing table at a new sf would
    * otherwise look like a normal timing). All raw samples are kept
    * (not just the median) so a load-inflated run is diagnosable from
    * the artifact alone: sustained machine load shows up as *every*
    * sample elevated, while a one-off GC/compile hiccup shows one
    * outlier the median already discards (BENCH_r06 was the former). */
  private[graft] def timeRuns(body: => Unit): Either[String, Seq[Double]] =
    try {
      Right(Seq.fill(Runs) {
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      })
    } catch {
      // class name alone ("AnalysisException") gives no hint which
      // table/column broke at a new scale factor — carry a truncated,
      // JSON-safe slice of the message too
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse("")
          .replaceAll("[\\\\\"\\p{Cntrl}]", " ").take(80).trim
        Left(e.getClass.getSimpleName +
          (if (msg.nonEmpty) s": $msg" else ""))
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_EXTENSIONS=1: install GraftExtensions so the bench
    // measures the optimizer-rule path (TopKRewriteRule/VecFusionRule)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // localCheckpoint blocks are freed by the ContextCleaner only
      // after a DRIVER GC makes their weak references collectable, and
      // Spark's safety-net GC fires every 30 MINUTES by default —
      // far longer than a bench run, so checkpoint blocks from earlier
      // queries accumulated until the store thrashed (round-10 sf10:
      // ann_ivf_topk samples [68, 178, 199] s under pressure vs 16 s
      // clean). A long-lived production driver tunes this the same way.
      .config("spark.cleaner.periodicGC.interval", "15s")
    val spark = (if (sys.env.get("SPARK_GRAFT_EXTENSIONS").contains("1"))
      builder.config("spark.sql.extensions",
        "graft.functions.GraftExtensions")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT + parquet footer caches on a small query so
    // one-time JVM costs don't land on the first timed query; likewise
    // materialize the fixture conversion the xml_* queries share
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    try graft.queries.XmlQueries.tables(spark).nodes.count()
    catch { case _: Throwable => () }
    // optional comma-separated allowlist for targeted iteration runs;
    // the default (unset) path is the full corpus plus the conversion
    // bench, unchanged
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // warm the partitioned-at-rest layouts: they are written once per
    // (data fingerprint, layout) into tmpdir, so the first run after a
    // testdata regeneration otherwise pays a full layout write inside
    // the timed region — BENCH_r09 recorded that as an apparent 12×
    // query regression. One untimed pass per layout-backed query makes
    // runs_s steady-state at every cache state.
    selected.collect {
      case (name, fn) if graft.queries.PipelineQueries.layoutBacked(name) =>
        try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    // gates cached outside the ensureLayout graph (session- or
    // fingerprint-keyed — e.g. the streamed-ingest parity gate): warm
    // them like the fixture conversion above, or their one-time build
    // lands inside timed run 1 (5.1 s vs 0.6 s steady-state in the
    // sf1 record — the median absorbs it, but a known cold build
    // shouldn't ride in runs_s). The set is pinned in PipelineQueries
    // next to layoutBacked so additions can't silently drift out.
    selected.collect {
      case (name, fn)
          if graft.queries.PipelineQueries.sessionCached(name) =>
        try exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val results = (selected.map {
      case (name, fn) =>
        // release the previous query's checkpoint/broadcast blocks
        // before timing the next (see periodicGC.interval above) so
        // each entry measures the query, not the allocator's history
        System.gc()
        name -> timeRuns(exec(fn(spark, sfDir)))
    } ++ (if (only.forall(_.contains("xml_convert_2000docs")))
            Seq("xml_convert_2000docs" -> xmlConvertBench(spark))
          else Seq())).toMap
    def median(rs: Seq[Double]): Double = rs.sorted.apply(rs.size / 2)
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map {
      case (k, Right(rs)) => s"\"" + k + "\":" + fmt(median(rs))
      case (k, Left(_)) => s"\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    // all raw per-run times, run order preserved — the self-diagnosing
    // record the median alone can't be (see timeRuns scaladoc)
    val raw = results.collect {
      case (k, Right(rs)) =>
        s"\"" + k + "\":" + rs.map(fmt).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(e)) => s"\"$k:$e\"" }.toSeq
    val total = results.values.collect { case Right(rs) => median(rs) }.sum
    // two tiers (see PipelineQueries.inlineBaseline): the recommended
    // probe paths vs the inline rebuild-per-call baselines kept for
    // measurement — summed separately so a regression in the paths a
    // production deployment actually runs is visible at a glance
    // instead of drowning under the baselines' corpus-sized cost
    val baselineTotal = results.collect {
      case (k, Right(rs))
          if graft.queries.PipelineQueries.inlineBaseline(k) =>
        median(rs)
    }.sum
    // the driver's artifact capture keeps only the TAIL of stdout,
    // which truncated the r8/r9 records mid-JSON — the complete line
    // is also persisted to a file (overwritten per invocation), and
    // the stdout JSON ENDS with that path so even a tail-truncated
    // capture still names where the full record lives
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_last.json")
    val record = new java.io.File(outFile).getAbsolutePath
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","probe_total":${fmt(total - baselineTotal)},"baseline_total":${fmt(baselineTotal)},"queries":$qs,"runs_s":$raw,"runs":$Runs,"errors":${failed.size},"failed":${failed.sorted.mkString("[", ",", "]")},"sf":"$sfDir","record":"$record"}"""
    println(line)
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    // the full line above is ~16 KB and the driver's artifact capture
    // keeps only a ~2 KB stdout TAIL — r14's capture cut it mid-line
    // and recorded parsed:null. A COMPACT summary line printed LAST
    // always fits whole inside any tail window; per-query detail
    // lives in the full line and the persisted record file.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","probe_total":${fmt(total - baselineTotal)},"baseline_total":${fmt(baselineTotal)},"queries_n":${results.size},"runs":$Runs,"errors":${failed.size},"sf":"$sfDir","record":"$record","compact":true}""")
    spark.stop()
  }

  /** Time the engine's core function — XML directory → full
    * property-graph conversion (core adapters) — over a generated
    * 2000-file corpus (12 identified nodes + ~40 attributes each).
    * Reported like any query (median of [[Runs]] full conversions);
    * docs/sec = 2000 / seconds. */
  private def xmlConvertBench(spark: SparkSession): Either[String, Seq[Double]] = {
    val dir = graft.tools.BenchCorpus.generate(2000)
    def convert(): Unit = {
      val tables = new graft.engine.Converter(spark).convert(dir.toString)
      tables.crossReferences.count()
      tables.properties.count()
    }
    // one untimed warmup conversion: first-touch costs (directory
    // listing, ingest codegen, parser classloading) previously landed
    // on sample 1 and made the reported median swing 4.7s cold vs 1.9s
    // warm across back-to-back bench invocations
    try convert() catch { case scala.util.control.NonFatal(_) => () }
    timeRuns(convert())
  }
}
