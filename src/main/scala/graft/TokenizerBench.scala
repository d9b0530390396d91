package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial-vocabulary measurement for the capped tokenizer
  * trainers (round-14 verdict directive #3): synthesizes a corpus
  * with ~10⁶ DISTINCT pseudo-words (the shape of a 100 TB web crawl's
  * typo/URL/id tail, which no driver should ever hold in full) and
  * times [[graft.pipeline.TextAnalysis.bpeMergesFast]] /
  * [[graft.pipeline.TextAnalysis.unigramTrain]] capped vs uncapped.
  *
  * The corpus is DETERMINISTIC (md5-derived words, fixed grouping) so
  * runs are comparable across machines. A Zipf-ish head is added by
  * repeating the first `n/100` words 20×, so the (cnt DESC, md5) cut
  * has real mass to keep: the capped trainer sees the words carrying
  * ~⅔ of occurrences while holding `cap` rows on the driver instead
  * of `n`.
  *
  * Usage: `runMain graft.TokenizerBench [nWords] [cap]`; prints one
  * JSON line (seconds, distinct-word count, occurrence coverage of
  * the cap). Recorded in SCALE.md.
  */
object TokenizerBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // spark.driver.memory set via builder is a NO-OP in local mode
    // (the driver JVM is already running) — the heap comes from sbt's
    // JVM options. If SPARK_DRIVER_MEM is set, fail fast unless -Xmx
    // actually reflects it, so recorded numbers never silently run at
    // the sbt default heap.
    sys.env.get("SPARK_DRIVER_MEM").foreach { want =>
      val wantBytes = want.toLowerCase match {
        case s if s.endsWith("g") => s.dropRight(1).toLong << 30
        case s if s.endsWith("m") => s.dropRight(1).toLong << 20
        case s => s.toLong
      }
      val have = Runtime.getRuntime.maxMemory()
      require(have >= (wantBytes * 0.8).toLong,
        s"TokenizerBench: SPARK_DRIVER_MEM=$want but the JVM -Xmx is " +
          s"${have >> 20} MiB — in local mode the driver heap must " +
          "be passed as a JVM option to sbt (e.g. " +
          "SBT_OPTS=-Xmx48g), not via SparkSession config")
    }
    val spark = SparkSession.builder()
      .appName("graft-tokenizer-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.TextAnalysis

    // n distinct-ish words, 10-31 hex chars (md5 prefix lengths vary
    // with id so the pair/piece space isn't degenerate); the first
    // n/100 words repeat 20× to give the frequency cut a real head
    val word = expr(
      "substring(md5(cast(id as string)), 1, cast(10 + id % 22 as int))")
    val tail = spark.range(n).select(col("id"), word.as("word"))
    val head = spark.range(n / 100)
      .crossJoin(spark.range(20).select(col("id").as("rep")))
      .select((col("id") * lit(1000003L) + col("rep")).as("id"),
        word.as("word"))
    val docs = tail.unionByName(head)
      .groupBy((col("id") % lit(n / 200)).as("doc_id"))
      .agg(concat_ws(" ", collect_list(col("word"))).as("text"))
      .localCheckpoint() // materialize so trainers don't re-synthesize
    val nDocs = docs.count()
    val wc = docs.select(explode(split(lower(col("text")), "\\W+"))
        .as("w")).filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val distinctWords = wc.count()
    val totalOcc = wc.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val headOcc = wc.orderBy(col("cnt").desc, md5(col("w")))
      .limit(cap).agg(sum(col("cnt"))).collect()(0).getLong(0)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      (System.nanoTime() - t0) / 1e9
    }
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString

    val bpeCapped = time {
      TextAnalysis.bpeMergesFast(docs, "text", rounds = 8,
        minCount = 1L, maxVocab = cap).collect(): Unit
    }
    val bpeUncapped = time {
      TextAnalysis.bpeMergesFast(docs, "text", rounds = 8,
        minCount = 1L).collect(): Unit
    }
    val ugCapped = time {
      TextAnalysis.unigramTrain(docs, "text", rounds = 1,
        maxPieceLen = 4, minCount = 3L, maxVocab = cap).collect(): Unit
    }
    val ugUncapped = time {
      TextAnalysis.unigramTrain(docs, "text", rounds = 1,
        maxPieceLen = 4, minCount = 3L).collect(): Unit
    }
    println(s"""{"metric":"tokenizer_bench","n_words":$n,"cap":$cap,""" +
      s""""n_docs":$nDocs,"distinct_words":$distinctWords,""" +
      s""""cap_occurrence_coverage":${fmt(
        headOcc.toDouble / totalOcc.toDouble)},""" +
      s""""bpe_capped_s":${fmt(bpeCapped)},""" +
      s""""bpe_uncapped_s":${fmt(bpeUncapped)},""" +
      s""""unigram_capped_s":${fmt(ugCapped)},""" +
      s""""unigram_uncapped_s":${fmt(ugUncapped)}}""")
    spark.stop()
  }
}
