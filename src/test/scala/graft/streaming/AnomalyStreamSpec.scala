package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RollingFeatures

/** [[AnomalyStream]]: streamed trailing z-score flags must equal the
  * batch [[RollingFeatures.anomalies]] on the same data — under
  * out-of-order arrival and arbitrary batch boundaries — once the
  * watermark passes; pending verdicts hold back until it does. */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // key 1: 15 steady points (10/11/12 cycle, 2-min cadence) + one spike
  // — a self-inclusive window bounds a single outlier's z at
  // (n−1)/√n, so z=3 needs n ≳ 11 to be reachable at all; key 2: thin
  // (never flags under minN=5)
  private val data = (0 until 15).map { i =>
    StreamOps.Event(1L, ts(f"2024-01-01 10:${i * 2}%02d:00"), 10.0 + (i % 3))
  } ++ Seq(
    StreamOps.Event(1L, ts("2024-01-01 10:29:00"), 500.0),
    StreamOps.Event(2L, ts("2024-01-01 10:00:00"), 1.0),
    StreamOps.Event(2L, ts("2024-01-01 10:10:00"), 999.0))

  private def batchFlags = {
    val df = data.toDF()
    RollingFeatures.anomalies(df, "user_id", "ts", "value",
        RollingFeatures.Horizon("1h", 3600L), z = 3.0, minN = 5L)
      .select(col("user_id"), col("ts"), col("value"),
        col("n_1h"), col("mean_1h"), col("sd_1h"))
      .as[(Long, Timestamp, Double, Long, Double, Double)].collect().toSet
  }

  private def runStream(batches: Seq[Seq[StreamOps.Event]],
                        name: String): Set[(Long, Timestamp, Double, Long, Double, Double)] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = AnomalyStream.anomalies(mem.toDS(), horizonSeconds = 3600L,
        watermarkDelay = "5 minutes", z = 3.0, minN = 5L)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // advance the watermark far past every verdict
      mem.addData(StreamOps.Event(99L, ts("2024-01-02 00:00:00"), 1.0))
      q.processAllAvailable()
      spark.table(name).where(col("user_id") =!= 99L)
        .as[(Long, Timestamp, Double, Long, Double, Double)].collect().toSet
    } finally q.stop()
  }

  test("in-order feed == batch anomalies once the watermark passes") {
    val want = batchFlags
    assert(want.nonEmpty && want.exists(_._3 == 500.0) &&
      !want.exists(_._1 == 2L), s"fixture sanity: $want")
    assert(runStream(Seq(data), "anom_inorder") == want)
  }

  test("out-of-order arrival across many batches emits the identical verdicts") {
    // disorder WITHIN the 5-minute lateness bound: adjacent events
    // swapped inside each batch, ragged batch boundaries — every event
    // still arrives before the watermark passes its second (events
    // later than that are dropped by the stream, by design)
    val k1 = data.filter(_.user_id == 1L).sortBy(_.ts.getTime)
    val k2 = data.filter(_.user_id == 2L)
    val batches = Seq(
      k2 ++ Seq(k1(1), k1(0), k1(3), k1(2)),
      Seq(k1(5), k1(4), k1(7), k1(6), k1(9), k1(8)),
      Seq(k1(11), k1(10), k1(13), k1(12), k1(15), k1(14)))
    assert(batches.flatten.toSet == data.toSet, "fixture covers all events")
    assert(runStream(batches, "anom_ooo") == batchFlags)
  }

  test("same-second straggler: a second is emitted only once the watermark PASSES it, so a " +
      "peer arriving with ts >= watermark still lands in the verdict (ADVICE r17)") {
    implicit val sq = spark.sqlContext
    // steady history, then TWO events in second 10:30:00 — the second of
    // them arrives only after the watermark has reached (not passed)
    // that second. It is not late (Spark drops ts < wm only), so the
    // 10:30:00 verdicts must include it — emitting at sec == wmSec
    // would both mis-score the first peer and swallow the straggler
    val steady = (0 until 12).map { i =>
      StreamOps.Event(1L, ts(f"2024-01-01 10:${i * 2}%02d:00"), 10.0 + (i % 3))
    }
    val peer = StreamOps.Event(1L, ts("2024-01-01 10:30:00.2"), 11.0)
    val straggler = StreamOps.Event(1L, ts("2024-01-01 10:30:00.5"), 500.0)
    val pusher = StreamOps.Event(99L, ts("2024-01-01 10:35:00"), 1.0)
    val full = steady ++ Seq(peer, straggler, pusher)

    val want = RollingFeatures.anomalies(full.toDF(), "user_id", "ts", "value",
        RollingFeatures.Horizon("1h", 3600L), z = 3.0, minN = 5L)
      .where(col("user_id") === 1L)
      .select(col("user_id"), col("ts"), col("value"),
        col("n_1h"), col("mean_1h"), col("sd_1h"))
      .as[(Long, Timestamp, Double, Long, Double, Double)].collect().toSet
    assert(want.exists(_._3 == 500.0), s"fixture sanity: $want")

    val mem = MemoryStream[StreamOps.Event]
    val q = AnomalyStream.anomalies(mem.toDS(), horizonSeconds = 3600L,
        watermarkDelay = "5 minutes", z = 3.0, minN = 5L)
      .writeStream.format("memory").queryName("anom_straggle")
      .outputMode("append").start()
    try {
      mem.addData(steady :+ peer: _*); q.processAllAvailable()
      // watermark now REACHES second 10:30:00 exactly (10:35 − 5min):
      // nothing in that second may emit yet
      mem.addData(pusher); q.processAllAvailable()
      val early = spark.table("anom_straggle")
        .where(col("ts") >= ts("2024-01-01 10:30:00")).count()
      assert(early == 0, "second 10:30:00 emitted before the watermark passed it")
      // straggler: same second, ts >= watermark — NOT late, must count
      mem.addData(straggler); q.processAllAvailable()
      mem.addData(StreamOps.Event(99L, ts("2024-01-01 11:00:00"), 1.0))
      q.processAllAvailable()
      val got = spark.table("anom_straggle").where(col("user_id") === 1L)
        .as[(Long, Timestamp, Double, Long, Double, Double)].collect().toSet
      assert(got == want, s"stream $got != batch $want")
    } finally q.stop()
  }

  test("verdicts hold until the watermark passes their second") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = AnomalyStream.anomalies(mem.toDS(), horizonSeconds = 3600L,
        watermarkDelay = "5 minutes", z = 3.0, minN = 5L)
      .writeStream.format("memory").queryName("anom_hold")
      .outputMode("append").start()
    try {
      mem.addData(data.filter(_.user_id == 1L): _*)
      q.processAllAvailable()
      // watermark after this batch = 10:36 - 5min = 10:31: the 10:29
      // spike is ripe, the 10:36 row itself pending — and on the FIRST
      // batch the watermark was still 0, so nothing emitted until now
      mem.addData(StreamOps.Event(1L, ts("2024-01-01 10:36:00"), 11.0))
      q.processAllAvailable()
      val sofar = spark.table("anom_hold").as[AnomalyStream.Flag].collect()
      assert(sofar.map(_.value).toSeq == Seq(500.0),
        s"spike ripe, later rows pending: ${sofar.toSeq}")
    } finally q.stop()
  }
}
