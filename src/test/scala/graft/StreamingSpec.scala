package graft

import graft.streaming.{EventStream, NormalizedEvent}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Structured Streaming behavior: the same transforms the ev_* batch
  * queries pin via the oracle, driven through MemoryStream. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowed aggregates over a stream match the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val expected = EventStream.windowedAggregates(batchDf)
      .orderBy($"bucket_start", $"event_type")
      .as[(Long, String, Long, Double)].collect().toSeq

    val source = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = source.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.windowedAggregates(streamDf)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      val rows = batchDf
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[(Long, Long, Long, String, Double)].collect()
      source.addData(rows.toSeq)
      q.processAllAvailable()
      // watermark advances on the next (empty-triggering) batch
      source.addData(Seq.empty)
      q.processAllAvailable()
      val got = spark.table("win_out")
        .orderBy($"bucket_start", $"event_type")
        .as[(Long, String, Long, Double)].collect().toSeq
      // append mode emits only windows the watermark has passed — all
      // but the tail of the stream
      assert(got.nonEmpty)
      assert(got.toSet.subsetOf(expected.toSet))
      assert(got.size >= expected.size - 8,
        s"only ${got.size} of ${expected.size} windows emitted")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped from append output") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = source.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.windowedAggregates(streamDf)
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    def ns(sec: Long): Long = sec * 1000000000L
    try {
      // watermark = max(event_ts) - 10min; window [0,300) closes once
      // the watermark passes 300s
      source.addData(Seq((1L, ns(10), 1L, "x", 1.0),
        (2L, ns(1200), 1L, "x", 1.0)))
      q.processAllAvailable()
      // late arrival into the already-closed [0,300) window
      source.addData(Seq((3L, ns(50), 1L, "x", 1.0)))
      q.processAllAvailable()
      // advance far enough to flush every window
      source.addData(Seq((4L, ns(7200), 1L, "x", 1.0)))
      q.processAllAvailable()
      source.addData(Seq.empty)
      q.processAllAvailable()
      val bucket0 = spark.table("late_out")
        .filter($"bucket_start" === 0L)
        .select($"n_events").as[Long].collect()
      // the late event never lands: bucket 0 keeps exactly 1 event
      assert(bucket0.toSeq === Seq(1L))
    } finally q.stop()
  }

  test("streaming XML ingest converts files as they appear") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val in = Files.createTempDirectory("graft-stream-in")
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    Files.copy(Paths.get(s"$fixturesDir/simple.xml"),
      in.resolve("simple.xml"), StandardCopyOption.REPLACE_EXISTING)
    val q = graft.streaming.XmlStreamIngest.run(spark, in.toString, out,
      ckpt, org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      val nodes1 = spark.read.parquet(s"$out/nodes")
      assert(nodes1.count() === 4) // simple.xml's identified nodes
      // a new file appears → next micro-batch picks it up
      Files.copy(Paths.get(s"$fixturesDir/sample_library.xml"),
        in.resolve("sample_library.xml"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      val nodes2 = spark.read.parquet(s"$out/nodes")
      assert(nodes2.count() === 40)
      assert(nodes2.filter($"document_id" === "sample_library").count()
        === 36)
      // a later batch rewrites the same document (same basename ⇒ same
      // ids); compaction must keep only the newest version per key
      val sub = in.resolve("v2")
      Files.createDirectories(sub)
      val v2 = new String(Files.readAllBytes(
        Paths.get(s"$fixturesDir/simple.xml")), "UTF-8")
        .replace("Hello World", "Hello Again")
      Files.write(sub.resolve("simple.xml"), v2.getBytes("UTF-8"))
      q.processAllAvailable()
      graft.streaming.XmlStreamIngest.compact(spark, out)
      val compacted = spark.read.parquet(s"$out/compacted/nodes")
      assert(compacted.count() === 40) // one version per node id
      assert(compacted.filter($"id" === "child_1")
        .select($"content").as[String].head() === "Hello Again")
      assert(!compacted.columns.contains("_batch"))
    } finally q.stop()
  }

  test("stateful sessionization matches the batch window form") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val expected = EventStream.sessionizeBatch(
      EventStream.normalize(batchDf).toDF())
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val source = MemoryStream[NormalizedEvent]
    val q = EventStream.sessionize(source.toDS())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("update").start()
    try {
      val events = EventStream.normalize(batchDf).collect()
      // feed in two chronological chunks to exercise state carry-over
      val (first, second) = events.sortBy(e => (e.ts_sec, e.event_id))
        .splitAt(events.length / 2)
      source.addData(first.toSeq)
      q.processAllAvailable()
      source.addData(second.toSeq)
      q.processAllAvailable()
      val got = spark.table("sess_out")
        .groupBy($"user_id")
        .agg(max($"n_sessions").as("n_sessions"),
          max($"n_events").as("n_events"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === expected)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val expected = EventStream.purchaseClickJoin(batchDf)
      .select($"purchase_id", $"click_id").as[(Long, Long)]
      .collect().toSet
    assert(expected.nonEmpty, "fixture data yields no join pairs")

    val source = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = source.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.purchaseClickJoin(streamDf)
      .writeStream.format("memory").queryName("ivj_out")
      .outputMode("append").start()
    try {
      val rows = batchDf
        .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
        .as[(Long, Long, Long, String, Double)].collect()
      source.addData(rows.toSeq)
      q.processAllAvailable()
      source.addData(Seq.empty)
      q.processAllAvailable()
      val got = spark.table("ivj_out")
        .select($"purchase_id", $"click_id").as[(Long, Long)]
        .collect().toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("stream-static enrichment matches the batch join, keeps unmatched") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val source = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = source.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.enriched(streamDf, dim)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      source.addData(Seq((1L, 1L, 1L, "click", 1.0),
        (2L, 2L, 2L, "view", 2.0), (3L, 3L, 9L, "view", 3.0)))
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select($"event_id", $"tier").as[(Long, Option[String])]
        .collect().toMap
      assert(got === Map(1L -> Some("gold"), 2L -> Some("silver"),
        3L -> None))
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicates, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Long, Long, String, Double)]
    val streamDf = source.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStream.deduplicated(streamDf)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    def ns(sec: Long): Long = sec * 1000000000L
    try {
      // same event_id delivered three times inside the watermark window
      source.addData(Seq((1L, ns(10), 1L, "click", 1.0),
        (1L, ns(12), 1L, "click", 1.0), (2L, ns(20), 1L, "view", 2.0)))
      q.processAllAvailable()
      source.addData(Seq((1L, ns(30), 1L, "click", 1.0),
        (3L, ns(40), 2L, "view", 3.0)))
      q.processAllAvailable()
      val got = spark.table("dedup_out")
        .select($"event_id").as[Long].collect().toSeq.sorted
      assert(got === Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
