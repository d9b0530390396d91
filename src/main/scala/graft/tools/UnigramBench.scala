package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.TextAnalysis

/** Production-vocabulary unigram-LM probe — the [[BpeBench]]
  * measurement applied to the other tokenizer family: train the
  * hard-EM unigram model on a synthetic corpus with a REAL vocabulary
  * (seeded generator, `vocab` distinct words × `rows` documents),
  * then Viterbi-segment the corpus under the trained model.
  *
  * What the numbers prove: training cost is per-round
  * vocabulary-sized (one corpus shuffle to the distinct-word table,
  * then candidate explode + model-sized collects), and segmentation
  * is one scan-local pass with the model broadcast — neither grows
  * with the corpus beyond the word count, the same scale shape the
  * BPE fast forms were measured to.
  *
  * Usage: `SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.UnigramBench
  * /tmp/testdata/sf1 2 20000 2000000 6"` → one JSON line
  * (args: sfDir, rounds, vocab, rows, maxPieceLen; all optional).
  */
object UnigramBench {
  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val vocab = args.lift(2).map(_.toInt).getOrElse(20000)
    val rows = args.lift(3).map(_.toInt).getOrElse(2000000)
    val maxPieceLen = args.lift(4).map(_.toInt).getOrElse(6)
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

    // 1. the driver corpus at the gate's parameters
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm footers
    val (gateModel, gateTrainS) = time(
      TextAnalysis.unigramTrain(docs, "text", rounds = rounds,
        maxPieceLen = 4, minCount = 3).collect())
    val (_, gateSegS) = time(
      TextAnalysis.unigramSegment(docs, "text",
        gateModel.map(r => (r.getString(0),
          new java.math.BigDecimal(r.getDouble(2)).setScale(6,
            java.math.RoundingMode.HALF_UP))).toSeq,
        maxPieceLen = 4).count())

    // 2. synthetic real-vocabulary corpus (the BpeBench generator)
    val rng = new scala.util.Random(7)
    val words = (0 until vocab).map { _ =>
      val len = 4 + rng.nextInt(9)
      (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    }.toArray
    val bc = spark.sparkContext.broadcast(words)
    val synth = spark.range(rows.toLong)
      .select(col("id").as("doc_id"), col("id").as("seed"))
      .as[(Long, Long)]
      .map { case (id, seed) =>
        val w = bc.value
        val text = (0 until 12).map { k =>
          val z = math.abs(((seed * 31 + k * 17) % w.length).toInt)
          w(if (k % 3 == 0) z else z % 997)
        }.mkString(" ")
        (id, text)
      }
      .toDF("doc_id", "text")
      .localCheckpoint()
    val (model, trainS) = time {
      val trained = TextAnalysis.unigramTrain(synth, "text",
        rounds = rounds, maxPieceLen = maxPieceLen, minCount = 3)
      TextAnalysis.unigramModel(trained)
    }
    val (_, segS) = time(
      TextAnalysis.unigramSegment(synth, "text", model,
        maxPieceLen = maxPieceLen).count())
    println(s"""{"metric":"unigram_bench","sf":"$sfDir","rounds":$rounds,"gate_pieces":${gateModel.length},"gate_train_s":${f"$gateTrainS%.2f"},"gate_segment_s":${f"$gateSegS%.2f"},"synthetic":{"vocab":$vocab,"rows":$rows,"max_piece_len":$maxPieceLen,"pieces":${model.length},"train_s":${f"$trainS%.2f"},"segment_s":${f"$segS%.2f"}}}""")
    spark.stop()
  }
}
