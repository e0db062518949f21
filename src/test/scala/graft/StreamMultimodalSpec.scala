package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DocOps, Multimodal}
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val dir = "/root/testdata/sf0.001"

  test("streaming hourly windows (Complete mode) == batch hourlyWindow") {
    spark.sparkContext.setLogLevel("WARN")
    val stream = EventsStream.hourlyCounts(EventsStream.readEvents(spark, dir))
    val q = EventsStream.runToMemory(spark, stream, "hourly_test",
      org.apache.spark.sql.streaming.OutputMode.Complete)
    try {
      val got = spark.table("hourly_test")
        .orderBy("hour", "event_type").collect().toSeq
      val exp = DocOps.hourlyWindow(spark, dir).collect().toSeq
      assert(got.map(_.toSeq) == exp.map(_.toSeq))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization emits exactly the closed sessions of the batch result") {
    spark.sparkContext.setLogLevel("WARN")
    val sess = EventsStream.sessionize(spark,
      EventsStream.readEvents(spark, dir), idleTimeout = false)
    val q = EventsStream.runToMemory(spark, sess.toDF, "sess_test")
    try {
      val got = spark.table("sess_test")
        .select(col("user_id"), col("n_events"), round(col("sum_value"), 6).as("sum_value"))
        .collect().map(_.toSeq).toSet
      // batch sessions minus each user's LAST session (still open at EOF)
      val batch = DocOps.sessionize(spark, dir)
      val lastPerUser = batch.groupBy("user_id").agg(max("sess_no").as("sess_no"))
      val closed = batch.join(lastPerUser, Seq("user_id", "sess_no"), "left_anti")
        .select("user_id", "n_events", "sum_value")
        .collect().map(_.toSeq).toSet
      assert(got == closed)
    } finally q.stop()
  }

  test("sessionize with EventTimeTimeout closes an idle session once the watermark passes its gap horizon") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = ms.toDF.toDF("user_id", "ts", "value")
    val sess = EventsStream.sessionize(spark, df,
      gapMinutes = 30, idleTimeout = true, watermarkDelay = "10 minutes")
    val q = sess.toDF.writeStream.outputMode("append")
      .format("memory").queryName("sess_timeout_test").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
      ms.addData((1L, ts(0), 1.0), (1L, ts(5), 2.0))
      q.processAllAvailable()
      // watermark (t0-5min) hasn't passed user 1's horizon (t0+35min) yet
      assert(spark.table("sess_timeout_test").isEmpty)
      // a much-later event advances the watermark to t0+110min > horizon:
      // user 1's idle session must emit WITHOUT any further user-1 event
      ms.addData((2L, ts(120), 5.0))
      q.processAllAvailable()
      val rows = spark.table("sess_timeout_test")
        .select("user_id", "n_events", "sum_value", "closed")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      assert(rows == Set((1L, 2L, 3.0, true)))
    } finally q.stop()
  }

  test("a late-but-within-watermark event must not regress the session horizon and split it") {
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, java.sql.Timestamp, Double)]
    val df = ms.toDF.toDF("user_id", "ts", "value")
    val sess = EventsStream.sessionize(spark, df,
      gapMinutes = 30, idleTimeout = true, watermarkDelay = "30 minutes")
    val q = sess.toDF.writeStream.outputMode("append")
      .format("memory").queryName("sess_late_test").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
      def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
      ms.addData((1L, ts(60), 1.0)) // on-time; watermark → t+30
      q.processAllAvailable()
      ms.addData((1L, ts(45), 2.0)) // LATE but above watermark: folds in
      q.processAllAvailable()
      // an on-time event 20 min after the session's true horizon (60):
      // with a regressed lastTs (45) the 35-min apparent gap would
      // wrongly close the session here
      ms.addData((1L, ts(80), 4.0))
      q.processAllAvailable()
      assert(spark.table("sess_late_test").isEmpty,
        "no session may close: the true max gap is 20 min < 30")
      // advance the watermark far past the horizon → the ONE true
      // session (3 events) times out and emits
      ms.addData((2L, ts(300), 9.0))
      q.processAllAvailable()
      val rows = spark.table("sess_late_test")
        .select("user_id", "n_events", "sum_value", "closed")
        .as[(Long, Long, Double, Boolean)].collect().toSet
      assert(rows == Set((1L, 3L, 7.0, true)))
    } finally q.stop()
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val dir = "/root/testdata/sf0.001"
  lazy val media = { spark.sparkContext.setLogLevel("WARN"); Multimodal.syntheticMedia(spark, dir).cache() }

  test("decode stub roundtrips header metadata for every row") {
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.nonEmpty)
    assert(meta.forall(_.getAs[Boolean]("decode_ok")))
    assert(meta.forall(_.getAs[Boolean]("meta_consistent")))
  }

  test("corrupt payload → decode_ok=false, job survives") {
    import spark.implicits._
    val corrupt = media.limit(3).map(m => m.copy(payload = Array[Byte](1, 2, 3)))
    val meta = Multimodal.decodeMeta(corrupt).collect()
    assert(meta.length == 3 && meta.forall(!_.getAs[Boolean]("decode_ok")))
  }

  test("a corrupted duration field is flagged inconsistent; n<=0 frame sampling is total") {
    import spark.implicits._
    // intact w/h, corrupted duration: header re-encoded with dur+1
    val badDur = media.limit(3).map(m => m.copy(payload =
      Multimodal.StubCodec.encodeHeader(m.width, m.height, m.duration_ms + 1) ++
        m.payload.drop(16)))
    val meta = Multimodal.decodeMeta(badDur).collect()
    assert(meta.length == 3 && meta.forall(_.getAs[Boolean]("decode_ok")))
    assert(meta.forall(!_.getAs[Boolean]("meta_consistent")),
      "duration mismatch must fail the consistency check")
    assert(Multimodal.sampleFrames(media, 0).count() == 0L,
      "n=0 means sample nothing, not a division by zero")
  }

  test("feature extraction: histogram sums to payload body length; deterministic") {
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.media_id).toSeq == f2.map(_.media_id).toSeq)
    f1.zip(f2).foreach { case (a, b) =>
      assert(a.histogram.toSeq == b.histogram.toSeq && a.mean_byte == b.mean_byte)
    }
    f1.foreach(f => assert(f.histogram.sum == f.n_bytes))
  }

  test("resize bounds dimensions and keeps payload body") {
    val r = Multimodal.resize(media, 32).collect()
    r.foreach { m =>
      assert(m.width <= 32 && m.height <= 32 && m.width >= 1 && m.height >= 1)
      assert(Multimodal.StubCodec.decode(m.payload).contains((m.width, m.height, m.duration_ms)))
    }
  }

  test("video frame sampling: n evenly-sized slices reassemble a prefix") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
    assert(frames.nonEmpty)
    val byMedia = frames.groupBy(_.media_id)
    byMedia.foreach { case (_, fs) =>
      assert(fs.map(_.frame_no).sorted.toSeq == (0 until fs.length))
    }
  }
}
