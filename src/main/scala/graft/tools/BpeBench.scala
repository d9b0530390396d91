package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Production-vocabulary BPE probe — the measurement behind SCALE.md's
  * claim that the fast forms survive merge counts the gate forms
  * cannot reach.
  *
  * Two measurements:
  *  1. On the DRIVER corpus (pass a testdata dir): train to the
  *     corpus's merge ceiling with BOTH trainers (the driver corpus is
  *     templated — 31 distinct words, exhausting at 89 merges — so
  *     this measures per-round overhead: a full Spark job per round
  *     for [[TextAnalysis.bpeMerges]] vs one collect + driver-local
  *     delta updates for [[TextAnalysis.bpeMergesFast]]).
  *  2. On a SYNTHETIC corpus with a real vocabulary (seeded generator,
  *     `vocab` distinct words × `rows` documents): train `rounds`
  *     merges with the fast trainer only (the chain trainer would need
  *     `rounds` sequential Spark jobs; the chain segmenter cannot even
  *     EXPRESS the merge list — the nested-replace Column conversion
  *     StackOverflows past ~100 calls), then segment + tokenize the
  *     corpus under the trained list.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.BpeBench
  * /tmp/testdata/sf1 1000 20000 2000000"` → one JSON line
  * (args: sfDir, rounds, vocab, rows; all optional).
  */
object BpeBench {
  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(1000)
    val vocab = args.lift(2).map(_.toInt).getOrElse(20000)
    val rows = args.lift(3).map(_.toInt).getOrElse(2000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. driver corpus, both trainers, corpus merge ceiling
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm footers
    val ceiling = 89 // the templated corpus's max (31 distinct words)
    val (slowM, slowS) =
      time(TextAnalysis.bpeMerges(docs, "text", ceiling).count())
    val (fastM, fastS) =
      time(TextAnalysis.bpeMergesFast(docs, "text", ceiling).count())

    // 2. synthetic real-vocabulary corpus: seeded words, Zipf-ish
    // repetition via doc_id mod (low ids recur often)
    val rng = new scala.util.Random(7)
    val words = (0 until vocab).map { _ =>
      val len = 4 + rng.nextInt(9)
      (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    }.toArray
    val bc = spark.sparkContext.broadcast(words)
    val synth = spark.range(rows.toLong)
      .select(col("id").as("doc_id"),
        col("id").as("seed"))
      .as[(Long, Long)]
      .map { case (id, seed) =>
        val w = bc.value
        // 12 words per doc: two-thirds drawn from a hot 997-word head
        // (Zipf-ish repetition so pair counts have real mass), one
        // third uniform over the FULL vocabulary (so the trainable
        // merge ceiling scales with `vocab`, not the head)
        val text = (0 until 12).map { k =>
          val z = math.abs(((seed * 31 + k * 17) % w.length).toInt)
          w(if (k % 3 == 0) z else z % 997)
        }.mkString(" ")
        (id, text)
      }
      .toDF("doc_id", "text")
      .localCheckpoint()
    val (merges, trainS) = time {
      val m = TextAnalysis.bpeMergesFast(synth, "text", rounds)
        .orderBy(col("round"))
        .select(col("lhs"), col("rhs"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      m
    }
    val (_, segS) = time(
      TextAnalysis.bpeSegmentFast(synth, "text", merges).count())
    val (_, tokS) = time(
      TextAnalysis.bpeTokenizeFast(synth, "text", "doc_id", merges)
        .count())
    println(s"""{"metric":"bpe_bench","sf":"$sfDir","ceiling_rounds":$ceiling,"train_slow_s":${f"$slowS%.2f"},"train_fast_s":${f"$fastS%.2f"},"slow_merges":$slowM,"fast_merges":$fastM,"synthetic":{"vocab":$vocab,"rows":$rows,"rounds_requested":$rounds,"rounds_trained":${merges.length},"train_s":${f"$trainS%.2f"},"segment_s":${f"$segS%.2f"},"tokenize_s":${f"$tokS%.2f"}}}""")
    spark.stop()
  }
}
