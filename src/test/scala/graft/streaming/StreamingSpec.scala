package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sessionize

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedEventAgg over a MemoryStream emits closed windows") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = StreamOps.windowedEventAgg(events, "5 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:40:00"), "click", 2.0),
        (ts("2024-01-01 10:50:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark past 11:05 so the 10:00 window closes
      mem.addData((ts("2024-01-01 12:00:00"), "click", 0.5))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select("event_type", "n_events", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming dedup twin: dropDuplicatesWithinWatermark drops replays") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = mem.toDF().toDF("doc_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")),
                  (2L, ts("2024-01-01 10:02:00")))
      q.processAllAvailable()
      mem.addData((1L, ts("2024-01-01 10:03:00"))) // replay within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("text scoring runs UNCHANGED on a stream: quality+langId per micro-batch == batch") {
    // the per-document operators are pure map-side column expressions, so
    // the SAME library call scores documents as they arrive — no streaming
    // variant needed; this pins that property so a future stateful rewrite
    // can't silently break it
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val scored = graft.operators.TextAnalysis.quality(
      graft.operators.TextAnalysis.langId(docs, "text"), "text")
    assert(scored.isStreaming, "map-side scoring must preserve streaminess")
    val q = scored
      .select("doc_id", "predicted_lang", "quality_score")
      .writeStream.format("memory").queryName("stream_scores")
      .outputMode("append").start()
    try {
      val batchDocs = Seq(
        (1L, "the cat and the dog is in a house of wonder it runs to town"),
        (2L, "le la et les des un une est le la et les"),
        (3L, "x")).toDF("doc_id", "text")
      mem.addData((1L, "the cat and the dog is in a house of wonder it runs to town"),
        (2L, "le la et les des un une est le la et les"), (3L, "x"))
      q.processAllAvailable()
      val streamed = spark.table("stream_scores")
        .as[(Long, String, Option[Double])].collect().toSet
      val batch = graft.operators.TextAnalysis.quality(
          graft.operators.TextAnalysis.langId(batchDocs, "text"), "text")
        .select("doc_id", "predicted_lang", "quality_score")
        .as[(Long, String, Option[Double])].collect().toSet
      assert(streamed == batch && streamed.size == 3)
      assert(streamed.exists { case (id, lang, _) => id == 2L && lang == "fr" })
    } finally q.stop()
  }

  test("url canonicalization + BPE tokens run UNCHANGED on a stream") {
    // both are map-side (regex/array expressions; fused BPE encoder), so
    // the SAME library calls process arriving documents — pinned like the
    // text-scoring parity above
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val merges = graft.functions.Bpe.train(Seq("low low low lower lowest"), 5).toSeq
    def transform(df: org.apache.spark.sql.DataFrame) =
      graft.operators.UrlOps.canonicalize(df, "url")
        .withColumn("n_bpe",
          size(graft.functions.TextFunctions.bpeTokens(col("text"), merges)))
        .select("id", "canonical_url", "host", "n_bpe")
    val mem = MemoryStream[(Long, String, String)]
    val streaming = transform(mem.toDF().toDF("id", "url", "text"))
    assert(streaming.isStreaming, "map-side url/bpe ops must preserve streaminess")
    val q = streaming.writeStream.format("memory").queryName("stream_urls")
      .outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "HTTP://WWW.A.COM:80/x/?utm_s=1&b=2", "low lower"),
        (2L, "https://b.org:8443/p", "lowest low low"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_urls")
        .as[(Long, String, String, Int)].collect().toSet
      val batch = transform(rows.toDF("id", "url", "text"))
        .as[(Long, String, String, Int)].collect().toSet
      assert(streamed == batch && streamed.size == 2)
      assert(streamed.exists { case (id, cu, h, _) =>
        id == 1L && cu == "http://a.com/x?b=2" && h == "a.com" })
    } finally q.stop()
  }

  test("htmlExtract + chunkDocs run UNCHANGED on a stream (extract-then-chunk)") {
    // extraction is a map-side projection, chunking a map-side generator —
    // both streaming-legal, so the arriving-page pipeline (extract markup,
    // window into training chunks) is the SAME library composition
    implicit val sq = spark.sqlContext
    def transform(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.chunkDocs(
        graft.operators.TextAnalysis.htmlExtract(df, "html")
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("extracted_text").as("text")),
        "doc_id", "text", chunkTokens = 4, overlap = 1)
    val mem = MemoryStream[(Long, String)]
    val streaming = transform(mem.toDF().toDF("doc_id", "html"))
    assert(streaming.isStreaming, "extract+chunk must preserve streaminess")
    val q = streaming.writeStream.format("memory").queryName("stream_chunks")
      .outputMode("append").start()
    try {
      val rows = Seq(
        (1L, "<p>one two three four five six seven</p>"),
        (2L, "<script>junk()</script><b>tiny doc</b>"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_chunks")
        .as[(Long, Int, String, Int)].collect().toSet
      val batch = transform(rows.toDF("doc_id", "html"))
        .as[(Long, Int, String, Int)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      assert(streamed.contains((1L, 0, "one two three four", 4)))
      assert(streamed.contains((2L, 0, "tiny doc", 2)))
    } finally q.stop()
  }

  test("splitCorpus assigns arriving documents to splits, identical to batch") {
    // the carve-out is a per-doc hash, so routing documents to
    // train/valid/test AS THEY ARRIVE is the same library call — and a
    // doc's split matches what a later batch pass would assign
    implicit val sq = spark.sqlContext
    val fracs = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val mem = MemoryStream[(Long, String)]
    val streaming = graft.operators.CorpusOps.splitCorpus(
      mem.toDF().toDF("doc_id", "text"), "doc_id", fracs)
    assert(streaming.isStreaming, "map-side split must preserve streaminess")
    val q = streaming.select("doc_id", "split").writeStream.format("memory")
      .queryName("stream_split").outputMode("append").start()
    try {
      val rows = (0L until 50L).map(i => (i, s"doc $i"))
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_split")
        .as[(Long, String)].collect().toMap
      val batch = graft.operators.CorpusOps.splitCorpus(
          rows.toDF("doc_id", "text"), "doc_id", fracs)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(streamed == batch && streamed.size == 50)
    } finally q.stop()
  }

  test("streaming store probe: arriving docs dedup against the fingerprint store") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    def doc(family: String, tail: String) =
      s"the $family quick brown fox jumps over the lazy dog near $tail"
    val history = Seq((1L, doc("red", "rivers")), (2L, doc("blue", "harbors")))
      .toDF("doc_id", "text")
    val store = java.nio.file.Files.createTempDirectory("graft-stream-store").toString
    graft.operators.DedupStore.save(history, "doc_id", "text", store)
    val static = graft.operators.DedupStore.load(spark, store)
    val mem = MemoryStream[(Long, String)]
    val probe = graft.operators.DedupStore.streamingCandidates(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", static)
    assert(probe.isStreaming, "store probe must stay streaming")
    val q = probe.writeStream.format("memory").queryName("stream_probe")
      .outputMode("append").start()
    try {
      val arriving = Seq((10L, doc("red", "valleys")), (11L, doc("green", "cities")))
      mem.addData(arriving: _*)
      q.processAllAvailable()
      val streamed = spark.table("stream_probe")
        .as[(Long, Long, Double)].collect().toSet
      val batch = graft.operators.DedupStore.streamingCandidates(
          arriving.toDF("doc_id", "text"), "doc_id", "text", static)
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == batch && streamed.nonEmpty)
      // the near-dup of history doc 1 is caught as it arrives
      assert(streamed.exists { case (n, h, _) => n == 10L && h == 1L })
      // unrelated arrival matches nothing
      assert(!streamed.exists(_._1 == 11L))
    } finally q.stop()
  }

  test("continuous expectations: per-batch reports land; a red batch kills the gated stream") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.operators.Expectations._
    val root = java.nio.file.Files.createTempDirectory("graft-dq-stream").toString
    val (reports, ckpt) = (s"$root/reports", s"$root/ckpt")
    val checks = Seq(NotNull("v"), InRange("v", 0.0, 100.0))
    val mem = MemoryStream[(Long, Option[Double])]
    val q = ExpectationsStream.run(mem.toDF().toDF("k", "v"),
      checks, reports, ckpt, gate = true)
    try {
      mem.addData((1L, Some(5.0)), (2L, Some(50.0))) // clean batch
      q.processAllAvailable()
      assert(q.isActive)
      val r0 = spark.read.parquet(reports)
        .select("check", "violations", "pass")
        .as[(String, Long, Boolean)].collect().toSet
      assert(r0 == Set(("not_null(v)", 0L, true), ("range(v,0.0,100.0)", 0L, true)))

      mem.addData((3L, None), (4L, Some(500.0))) // violates both checks
      val e = intercept[Exception] { q.processAllAvailable() }
      assert(String.valueOf(e.getMessage).contains("data-quality gate") ||
        Option(e.getCause).exists(c =>
          String.valueOf(c.getMessage).contains("data-quality gate")))
    } finally q.stop()
    // the audit trail SURVIVED the kill: the red batch's report is there
    val all = spark.read.parquet(reports)
      .select(col("_batch_id").cast("long"), col("check"),
        col("violations"), col("pass"))
      .as[(Long, String, Long, Boolean)].collect()
    val red = all.filter(_._1 == 1L).map(r => (r._2, r._3, r._4)).toSet
    assert(red == Set(("not_null(v)", 1L, false), ("range(v,0.0,100.0)", 1L, false)))
    // replay of the red batch converges (report replaced, gate still red)
    intercept[Exception] {
      ExpectationsStream.applyBatch(
        Seq((3L, Option.empty[Double]), (4L, Option(500.0))).toDF("k", "v"),
        1L, checks, reports, gate = true)
    }
    assert(spark.read.parquet(reports)
      .select(col("_batch_id").cast("long"), col("check"), col("violations"),
        col("pass"))
      .as[(Long, String, Long, Boolean)].collect().toSet == all.toSet)
  }

  test("dedup loop: two copies in ONE micro-batch — exactly one survives; replay converges") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    def doc(family: String, tail: String) =
      s"the $family quick brown fox jumps over the lazy dog near $tail"
    val root = java.nio.file.Files.createTempDirectory("graft-dedup-loop").toString
    val (store, verdicts, ckpt) = (s"$root/store", s"$root/verdicts", s"$root/ckpt")
    val mem = MemoryStream[(Long, String)]
    val q = DedupStream.run(mem.toDF().toDF("doc_id", "text"),
      "doc_id", "text", store, verdicts, ckpt)
    try {
      // batch 0: ids 20 and 21 are IDENTICAL copies in the SAME batch —
      // the leg streamingCandidates alone cannot see — plus a unique doc
      mem.addData((20L, doc("red", "rivers")), (21L, doc("red", "rivers")),
        (22L, doc("blue", "harbors")))
      q.processAllAvailable()
      // batch 1: a copy of the batch-0 survivor + a fresh doc
      mem.addData((30L, doc("red", "rivers")), (31L, doc("green", "cities")))
      q.processAllAvailable()
    } finally q.stop()

    def verdictMap() = spark.read.parquet(verdicts)
      .select("doc_id", "is_dup", "dup_of")
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val v = verdictMap()
    // within-batch: exactly the lower id of the same-batch pair survives
    assert(v(20L) == ((false, None)) && v(21L) == ((true, Some(20L))))
    assert(v(22L) == ((false, None)))
    // across batches: the later copy dedups against the stored survivor
    assert(v(30L) == ((true, Some(20L))) && v(31L) == ((false, None)))
    // the store holds ONLY survivors' fingerprints
    val storedIds = spark.read.parquet(store).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(storedIds == Set(20L, 22L, 31L))

    // crash-replay of batch 1 (its writes already landed): verdicts and
    // store byte-semantics converge — the half-landed-own-ids case
    DedupStream.applyBatch(
      Seq((30L, doc("red", "rivers")), (31L, doc("green", "cities")))
        .toDF("doc_id", "text"),
      1L, "doc_id", "text", store, verdicts)
    assert(verdictMap() == v)
    assert(spark.read.parquet(store).select("doc_id").distinct()
      .as[Long].collect().toSet == storedIds)
  }

  test("intervalJoin: stream-stream pairs events within the window, drops outside") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamOps.intervalJoin(
        clicks.toDF().toDF("user_id", "ts", "event_id"),
        purchases.toDF().toDF("user_id", "ts", "event_id", "value"),
        "user_id", "30 minutes", "10 minutes")
      .select("user_id", "event_id", "r_event_id")
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L),
                     (2L, ts("2024-01-01 10:00:00"), 101L))
      purchases.addData(
        (1L, ts("2024-01-01 10:20:00"), 200L, 9.99), // within 30 min -> pair
        (2L, ts("2024-01-01 11:30:00"), 201L, 5.0),  // outside -> dropped
        (3L, ts("2024-01-01 10:05:00"), 202L, 1.0))  // no matching click
      q.processAllAvailable()
      // advance both watermarks so results finalize
      clicks.addData((9L, ts("2024-01-01 13:00:00"), 999L))
      purchases.addData((9L, ts("2024-01-01 13:00:00"), 998L, 0.0))
      q.processAllAvailable()
      val rows = spark.table("attrib").where($"user_id" < 9)
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 200L)))
    } finally q.stop()
  }

  test("StreamSink: micro-batches land partitioned; a replayed batch never duplicates") {
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val stream = mem.toDF().toDF("user_id", "ts", "value")
      .withColumn("event_date", to_date($"ts"))
    val q = StreamSink.partitionedParquet(stream, out, ckpt, "event_date")
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 1.0),
                  (2L, ts("2024-01-02 10:00:00"), 2.0))
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-02 11:00:00"), 3.0))
      q.processAllAvailable()
      val landed = spark.read.parquet(out)
      assert(landed.count() == 3) // two batches appended, nothing replaced
      assert(landed.select("event_date").distinct().count() == 2)

      // crash-replay: re-running an already-landed batch id rewrites its own
      // (date, batch) partitions — counts unchanged, no duplicates
      val batch1 = Seq((3L, ts("2024-01-02 11:00:00"), 3.0))
        .toDF("user_id", "ts", "value")
        .withColumn("event_date", to_date($"ts"))
      StreamSink.writeBatch(batch1, 1L, out, "event_date")
      StreamSink.writeBatch(batch1, 1L, out, "event_date")
      assert(spark.read.parquet(out).count() == 3)
      // but genuinely new data (a new batch id) appends
      StreamSink.writeBatch(batch1.withColumn("user_id", lit(9L)), 2L, out, "event_date")
      assert(spark.read.parquet(out).count() == 4)
      // readers prune on event_date across batch subdirectories
      assert(spark.read.parquet(out)
        .where($"event_date" === "2024-01-02").count() == 3)
      // partition-grain overwrite is a per-write option: the session conf
      // must be untouched, or co-resident batch jobs' plain `overwrite`
      // would silently become partition-grain for the application's life
      assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        .equalsIgnoreCase("static"))
    } finally q.stop()
  }

  test("intervalJoin: custom event-time column name; missing column fails up front") {
    // batch frames exercise the same join shape (watermarks skipped)
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("user_id", "occurred_at")
    val r = Seq((1L, ts("2024-01-01 10:10:00"))).toDF("user_id", "occurred_at")
    val joined = StreamOps.intervalJoin(l, r, "user_id", "30 minutes",
      tsCol = "occurred_at")
    assert(joined.columns.toSeq == Seq("user_id", "occurred_at", "r_occurred_at"))
    assert(joined.count() == 1)
    val e = intercept[IllegalArgumentException](
      StreamOps.intervalJoin(l, r, "user_id", "30 minutes")) // default 'ts' absent
    assert(e.getMessage.contains("no event-time column 'ts'"))
  }

  test("streaming sessionize == batch sessionize on the full sf0.001 events table") {
    implicit val sq = spark.sqlContext
    import graft.queries.StarQueries
    val events = StarQueries.events(spark, sf001)
      .select($"user_id", $"ts", $"value").as[StreamOps.Event]
      .collect().toSeq.sortBy(_.ts.getTime)

    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_full")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // sentinel far in the future closes every open session
      mem.addData(StreamOps.Event(9999L, ts("2030-01-01 00:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_full")
        .where($"user_id" =!= 9999L)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet

      val batch = Sessionize.sessionize(
          StarQueries.events(spark, sf001), "user_id", "ts", "value", 30, "event_id")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size} sessions")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stream-static join: streaming events enrich against a static dim") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = mem.toDF().toDF("user_id", "ts", "value")
      .join(dim, "user_id") // stream-static equi-join, no state needed
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("2024-01-01 10:00:00"), 5.0),
                  (2L, ts("2024-01-01 10:01:00"), 6.0),
                  (9L, ts("2024-01-01 10:02:00"), 7.0)) // no dim row → dropped
      q.processAllAvailable()
      val rows = spark.table("enriched").select("user_id", "tier")
        .as[(Long, String)].collect().toSet
      assert(rows == Set((1L, "gold"), (2L, "silver")))
    } finally q.stop()
  }

  test("streaming sessionize matches the batch operator on the same events") {
    implicit val sq = spark.sqlContext
    val data = Seq(
      StreamOps.Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      StreamOps.Event(1L, ts("2024-01-01 10:10:00"), 2.0),
      StreamOps.Event(1L, ts("2024-01-01 11:30:00"), 3.0),
      StreamOps.Event(2L, ts("2024-01-01 10:00:00"), 4.0))

    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // push watermark far forward → every session times out and emits
      mem.addData(StreamOps.Event(99L, ts("2024-01-02 00:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet

      val batch = Sessionize.sessionize(
          data.toDF(), "user_id", "ts", "value", 30, "value")
        .select("user_id", "n_events", "total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(streamed == Set((1L, 2L, 3.0), (1L, 1L, 3.0), (2L, 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming ANN probe: arriving vectors against a static PQ index") {
    implicit val sq = spark.sqlContext
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cb = graft.operators.Pq.fit(emb, "embedding", m = 16, ksub = 64, seed = 42L)
    val codes = graft.operators.Pq.encode(emb, "vec_id", "embedding", cb)
      .persist()
    codes.count()
    try {
      // arriving queries: two real corpus vectors (exact duplicates of
      // their own corpus entries, offset ids) and their batch twin
      val arriving = emb.where(col("vec_id").isin(3L, 7L))
        .select((col("vec_id") + 1000L).as("q_id"),
          col("embedding").as("q_vec"))
        .as[(Long, Array[Float])].collect().toSeq
      val mem = MemoryStream[(Long, Array[Float])]
      val stream = graft.operators.Pq.streamingNeighbors(
        mem.toDF().toDF("q_id", "q_vec"), "q_id", "q_vec",
        codes, cb, "vec_id", emb, "embedding", minCos = 0.45)
      assert(stream.isStreaming, "PQ probe must stay streaming")
      val q = stream.writeStream.format("memory").queryName("stream_ann")
        .outputMode("append").start()
      try {
        mem.addData(arriving: _*)
        q.processAllAvailable()
        val streamed = spark.table("stream_ann")
          .as[(Long, Long, Double)].collect().toSet
        val batch = graft.operators.Pq.streamingNeighbors(
            arriving.toDF("q_id", "q_vec"), "q_id", "q_vec",
            codes, cb, "vec_id", emb, "embedding", minCos = 0.45)
          .as[(Long, Long, Double)].collect().toSet
        assert(streamed == batch, "streaming diverged from the batch twin")
        // each planted duplicate finds its own corpus original at cos 1.0
        assert(streamed.contains((1003L, 3L, 1.0)))
        assert(streamed.contains((1007L, 7L, 1.0)))
      } finally q.stop()
    } finally codes.unpersist()
  }

  test("streaming IVF-PQ probe: cell equi-join per batch, no stream-side crossJoin") {
    implicit val sq = spark.sqlContext
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val index = graft.operators.IvfPq.build(emb, "vec_id", "embedding",
      nCells = 8, m = 16, ksub = 64, seed = 42L)
    try {
      val arriving = emb.where(col("vec_id").isin(3L, 7L))
        .select((col("vec_id") + 1000L).as("q_id"),
          col("embedding").as("q_vec"))
        .as[(Long, Array[Float])].collect().toSeq
      val mem = MemoryStream[(Long, Array[Float])]
      val stream = graft.operators.IvfPq.streamingNeighbors(
        mem.toDF().toDF("q_id", "q_vec"), "q_id", "q_vec",
        index, emb, "embedding", minCos = 0.45, nProbe = 3)
      assert(stream.isStreaming, "IVF-PQ probe must stay streaming")
      val q = stream.writeStream.format("memory").queryName("stream_ivfpq")
        .outputMode("append").start()
      try {
        mem.addData(arriving: _*)
        q.processAllAvailable()
        val streamed = spark.table("stream_ivfpq")
          .as[(Long, Long, Double)].collect().toSet

        val batchDf = graft.operators.IvfPq.streamingNeighbors(
          arriving.toDF("q_id", "q_vec"), "q_id", "q_vec",
          index, emb, "embedding", minCos = 0.45, nProbe = 3)
        val batch = batchDf.as[(Long, Long, Double)].collect().toSet
        assert(streamed == batch, "streaming diverged from the batch twin")
        // a planted exact duplicate's nearest cell is its original's own
        // cell (rank-1 probe), so it must find it at cos 1.0
        assert(streamed.contains((1003L, 3L, 1.0)))
        assert(streamed.contains((1007L, 7L, 1.0)))

        // plan shape: candidates come from an equi-join on cell — never a
        // cross/nested-loop of the batch against the whole code relation
        val plan = batchDf.queryExecution.executedPlan.toString
        assert(!plan.contains("CartesianProduct") &&
          !plan.contains("BroadcastNestedLoop"),
          s"streaming IVF-PQ probe degenerated to a cross join:\n$plan")
        assert(plan.contains("cell"), s"no cell equi-join in:\n$plan")
      } finally q.stop()
    } finally index.unpersist()
  }
}
