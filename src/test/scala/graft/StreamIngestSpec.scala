package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.model.{FieldSch, FieldType}
import graft.streaming.StreamIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ingestion E2E: line-protocol text files stream through the
  * typed decode into a checkpointed parquet sink; the watermarked
  * windowed aggregation closes windows once the event-time watermark
  * passes and drops later-than-watermark points (SURVEY.md §2.9). */
class StreamIngestSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  val fields = Map(
    "v" -> FieldSch("v", FieldType.Float),
    "n" -> FieldSch("n", FieldType.Integer))

  def minuteNs(m: Long): Long = m * 60L * 1000000000L

  def writeBatch(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8)): Unit

  test("typed decode streams to a checkpointed parquet sink") {
    val in = Files.createTempDirectory("graft_ing_in").toString
    val out = Files.createTempDirectory("graft_ing_out").toString
    val ckpt = Files.createTempDirectory("graft_ing_ck").toString
    writeBatch(in, "b0.lp", Seq(
      s"m,host=h1 v=1.5,n=7i ${minuteNs(1)}",
      s"m,host=h2 v=2.5 ${minuteNs(2)}"))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"), fields)
    val q = StreamIngest.toParquet(typed, out, ckpt)
    try {
      q.processAllAvailable()
      // second file arrives — offsets ensure it's processed exactly once
      writeBatch(in, "b1.lp", Seq(s"m,host=h1 v=9.0,n=1i ${minuteNs(3)}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 3)
    val r = got.filter(col("time_ns") === minuteNs(1)).head()
    assert(r.getAs[String]("tag_host") == "h1")
    assert(r.getAs[Double]("v") == 1.5)
    assert(r.getAs[Long]("n") == 7L)
    // field absent on the wire → null after decode
    assert(got.filter(col("time_ns") === minuteNs(2))
      .head().isNullAt(got.columns.indexOf("n")))
  }

  test("watermarked windowed agg closes windows in append mode and " +
    "drops later-than-watermark points") {
    val in = Files.createTempDirectory("graft_win_in").toString
    val out = Files.createTempDirectory("graft_win_out").toString
    val ckpt = Files.createTempDirectory("graft_win_ck").toString
    // window 1m, watermark 2m
    writeBatch(in, "b0.lp", Seq(
      s"m,host=h1 v=1.0 ${minuteNs(10)}",
      s"m,host=h1 v=3.0 ${minuteNs(10) + 30L * 1000000000L}",
      s"m,host=h2 v=5.0 ${minuteNs(11)}"))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val agg = StreamIngest.windowedSeriesAgg(typed, Seq("tag_host"), "v",
      "1 minute", "2 minutes")
    val q = StreamIngest.toParquet(agg, out, ckpt)
    try {
      q.processAllAvailable()
      // advance event time far past the earlier windows; the watermark
      // itself only moves at the END of this batch (to 30:00 − 2m)
      writeBatch(in, "b1.lp", Seq(s"m,host=h1 v=100.0 ${minuteNs(30)}"))
      q.processAllAvailable()
      // next batch runs under watermark 28:00 → the minute-10/11 windows
      // close and emit, and a point back at minute 10 is LATE → dropped
      writeBatch(in, "b2.lp", Seq(
        s"m,host=h1 v=999.0 ${minuteNs(10)}", // later than watermark
        s"m,host=h1 v=101.0 ${minuteNs(31)}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    // closed windows: [10:00,10:01) h1 (2 points), [11:00,11:02) h2
    val w10 = got.filter(col("tag_host") === "h1" &&
      col("n_points") === 2L).collect()
    assert(w10.length == 1)
    assert(w10.head.getAs[Double]("avg_value") == 2.0)
    assert(w10.head.getAs[Double]("max_value") == 3.0)
    // the late 999.0 point never contaminated the closed window
    assert(got.filter(col("max_value") === 999.0).isEmpty)
    val w11 = got.filter(col("tag_host") === "h2").collect()
    assert(w11.length == 1 && w11.head.getAs[Double]("avg_value") == 5.0)
  }

  test("streaming heavy hitters: per-window top-k ranking emits once " +
    "the watermark closes the window; counts exact below capacity") {
    val in = Files.createTempDirectory("graft_hh_in").toString
    val out = Files.createTempDirectory("graft_hh_out").toString
    val ckpt = Files.createTempDirectory("graft_hh_ck").toString
    // one minute-10 window: h1×3, h2×2, h3×1
    writeBatch(in, "b0.lp", Seq(
      s"m,host=h1 v=1.0 ${minuteNs(10)}",
      s"m,host=h1 v=1.0 ${minuteNs(10) + 1}",
      s"m,host=h1 v=1.0 ${minuteNs(10) + 2}",
      s"m,host=h2 v=1.0 ${minuteNs(10) + 3}",
      s"m,host=h2 v=1.0 ${minuteNs(10) + 4}",
      s"m,host=h3 v=1.0 ${minuteNs(10) + 5}"))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val hh = StreamIngest.windowedHeavyHitters(typed, "tag_host",
      "1 minute", "2 minutes", k = 2, capacity = 16)
    val q = StreamIngest.toParquet(hh, out, ckpt)
    try {
      q.processAllAvailable()
      // nothing emitted yet — the window is still open
      assert(spark.read.parquet(out).isEmpty)
      // advance event time; the watermark closes minute 10 next batch
      writeBatch(in, "b1.lp", Seq(s"m,host=h9 v=1.0 ${minuteNs(30)}"))
      q.processAllAvailable()
      writeBatch(in, "b2.lp", Seq(s"m,host=h9 v=1.0 ${minuteNs(31)}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // top-2 of the closed minute-10 window, exact counts, zero error
    assert(got.toSeq === Seq((1L, "h1", 3L, 0L), (2L, "h2", 2L, 0L)))
  }

  test("streaming heavy hitters: NULL keys (untagged points) are " +
    "excluded, not a map-serializer crash") {
    val in = Files.createTempDirectory("graft_hhn_in").toString
    val out = Files.createTempDirectory("graft_hhn_out").toString
    val ckpt = Files.createTempDirectory("graft_hhn_ck").toString
    // untagged lines decode to tag_host = null — pre-guard these killed
    // the query ("Cannot use null as map key" inside the SpaceSaving
    // buffer's map serializer)
    writeBatch(in, "b0.lp", Seq(
      s"m v=1.0 ${minuteNs(10)}",
      s"m v=1.0 ${minuteNs(10) + 1}",
      s"m,host=h1 v=1.0 ${minuteNs(10) + 2}",
      s"m,host=h1 v=1.0 ${minuteNs(10) + 3}",
      s"m,host=h2 v=1.0 ${minuteNs(10) + 4}"))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val hh = StreamIngest.windowedHeavyHitters(typed, "tag_host",
      "1 minute", "2 minutes", k = 3, capacity = 16)
    val q = StreamIngest.toParquet(hh, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", Seq(s"m,host=h9 v=1.0 ${minuteNs(30)}"))
      q.processAllAvailable()
      writeBatch(in, "b2.lp", Seq(s"m,host=h9 v=1.0 ${minuteNs(31)}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    // the two null-key points are excluded; tagged counts are exact
    assert(got.toSeq === Seq((1L, "h1", 2L), (2L, "h2", 1L)))
  }

  test("poison lines (blank / malformed) are dropped, not crash-looped") {
    val in = Files.createTempDirectory("graft_poison_in").toString
    val out = Files.createTempDirectory("graft_poison_out").toString
    val ckpt = Files.createTempDirectory("graft_poison_ck").toString
    writeBatch(in, "b0.lp", Seq(
      s"m,host=h1 v=1.0 ${minuteNs(1)}",
      "",                       // blank
      "garbage with no fields", // malformed: parseLine would throw
      s"m,host=h2 v=2.0 notanumber", // bad timestamp
      s"m,host=h3 v=3.0 ${minuteNs(3)}"))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val q = StreamIngest.toParquet(typed, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 2) // the two well-formed lines survived
    // dead-letter stream quarantines exactly the malformed lines
    val dlOut = Files.createTempDirectory("graft_dl_out").toString
    val dlCk = Files.createTempDirectory("graft_dl_ck").toString
    val dq = StreamIngest.toParquet(
      StreamIngest.deadLetters(spark, in), dlOut, dlCk)
    try dq.processAllAvailable() finally dq.stop()
    val dl = spark.read.parquet(dlOut).collect().map(_.getString(0)).toSet
    assert(dl == Set("garbage with no fields",
      s"m,host=h2 v=2.0 notanumber"))
  }

  test("streaming dedup suppresses replayed (series, ts) points within " +
    "the watermark and state does not block fresh points") {
    val in = Files.createTempDirectory("graft_dd_in").toString
    val out = Files.createTempDirectory("graft_dd_out").toString
    val ckpt = Files.createTempDirectory("graft_dd_ck").toString
    writeBatch(in, "b0.lp", Seq(
      s"m,host=h1 v=1.0 ${minuteNs(10)}",
      s"m,host=h1 v=1.0 ${minuteNs(10)}", // in-batch duplicate
      s"m,host=h2 v=5.0 ${minuteNs(10)}")) // same ts, OTHER series → kept
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val dedup = StreamIngest.dedupStream(typed, Seq("tag_host"),
      watermarkDelay = "10 minutes")
    val q = StreamIngest.toParquet(dedup, out, ckpt)
    try {
      q.processAllAvailable()
      // a replayed copy of the h1 point arrives a batch later (the
      // sink-retry/upsert scenario) plus one genuinely new point
      writeBatch(in, "b1.lp", Seq(
        s"m,host=h1 v=1.0 ${minuteNs(10)}", // cross-batch duplicate
        s"m,host=h1 v=2.0 ${minuteNs(12)}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 3) // h1@10, h2@10, h1@12 — duplicates gone
    assert(got.filter(col("tag_host") === "h1" &&
      col("time_ns") === minuteNs(10)).count() == 1)
  }

  test("stream-stream interval join pairs points with same-series " +
    "alerts inside the window; state is watermark-bounded") {
    val inP = Files.createTempDirectory("graft_ssj_p").toString
    val inA = Files.createTempDirectory("graft_ssj_a").toString
    val out = Files.createTempDirectory("graft_ssj_out").toString
    val ckpt = Files.createTempDirectory("graft_ssj_ck").toString
    val fieldsV = Map("v" -> FieldSch("v", FieldType.Float))
    // alerts at minute 10 (h1); points at 12 (h1, in-window), 50 (h1,
    // out-of-window), 12 (h2, other series)
    writeBatch(inA, "a0.lp", Seq(s"al,host=h1 v=1.0 ${minuteNs(10)}"))
    writeBatch(inP, "p0.lp", Seq(
      s"m,host=h1 v=2.0 ${minuteNs(12)}",
      s"m,host=h1 v=9.0 ${minuteNs(50)}",
      s"m,host=h2 v=3.0 ${minuteNs(12)}"))
    val joined = StreamIngest.streamIntervalJoin(
      StreamIngest.typedStream(spark, inP, Seq("host"), fieldsV),
      StreamIngest.typedStream(spark, inA, Seq("host"), fieldsV),
      keyCol = "tag_host", joinWindow = "10 minutes",
      watermarkDelay = "5 minutes")
    val q = StreamIngest.toParquet(joined, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("tag_host"), col("time_ns"), col("alert_time_ns"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // exactly one pair: h1 point at minute 12 ⋈ h1 alert at minute 10
    assert(got.toSeq == Seq(("h1", minuteNs(12), minuteNs(10))))
  }

  test("session windows close after the event-time gap per series") {
    val in = Files.createTempDirectory("graft_sess_in").toString
    val out = Files.createTempDirectory("graft_sess_out").toString
    val ckpt = Files.createTempDirectory("graft_sess_ck").toString
    // h1: two points 1 min apart (one session), then 20 min of silence,
    // then one more point (a second session); gap = 5 min
    writeBatch(in, "b0.lp", Seq(
      s"m,host=h1 v=1.0 ${minuteNs(10)}",
      s"m,host=h1 v=3.0 ${minuteNs(11)}",
      s"m,host=h1 v=7.0 ${minuteNs(31)}"))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val agg = StreamIngest.sessionizedSeriesAgg(typed, Seq("tag_host"),
      "v", gapDuration = "5 minutes", watermarkDelay = "1 minute")
    val q = StreamIngest.toParquet(agg, out, ckpt)
    try {
      q.processAllAvailable()
      // advance the watermark far past both sessions so they emit
      writeBatch(in, "b1.lp", Seq(s"m,host=h1 v=0.0 ${minuteNs(120)}"))
      q.processAllAvailable()
      writeBatch(in, "b2.lp", Seq(s"m,host=h1 v=0.0 ${minuteNs(121)}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
    val sessions = got.filter(col("n_points") >= 1).collect()
      .map(r => (r.getAs[Long]("n_points"), r.getAs[Double]("avg_value")))
      .toSet
    assert(sessions.contains((2L, 2.0)), sessions) // minutes 10-11
    assert(sessions.contains((1L, 7.0)), sessions) // minute 31
  }

  test("streaming seasonal Holt-Winters matches the batch operator " +
    "point-for-point across micro-batch boundaries (ring state " +
    "carried); planted period-3 sawtooth learns nonzero seasonals") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_hw_in").toString
    val out = Files.createTempDirectory("graft_hw_out").toString
    val ckpt = Files.createTempDirectory("graft_hw_ck").toString
    // period-3 sawtooth on a drifting base; the batch split lands
    // mid-cycle so the ring must survive the micro-batch boundary
    val pts = (1L to 17L).map(m =>
      (m, 10.0 + (m % 3) * 4.0 + m * 0.5))
    def lp(m: Long, v: Double) = s"m,host=h1 v=$v ${minuteNs(m)}"
    writeBatch(in, "b0.lp", pts.take(7).map(p => lp(p._1, p._2)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val hw = StreamIngest.holtWintersStream(typed, "tag_host", "v",
      1L, 4L, 1L, 4L, 1L, 4L, season = 3)
    val q = StreamIngest.toParquet(hw, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", pts.drop(7).map(p => lp(p._1, p._2)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("time_ns") ->
        ((r.getAs[Long]("level"), r.getAs[Long]("trend"),
          r.getAs[Long]("seasonal"), r.getAs[Long]("forecast"))))
      .toMap
    val batch = graft.operators.SeriesOps.holtWintersFixed(
        pts.map(p => ("h1", minuteNs(p._1), math.round(p._2 * 100)))
          .toDF("key", "b", "vc"),
        Seq("key"), "b", "vc", 1L, 4L, 1L, 4L, 1L, 4L, season = 3)
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got == batch)
    // the sawtooth is learned: post-first-cycle seasonal components
    // are not all zero
    assert(pts.drop(6).exists(p => got(minuteNs(p._1))._3 != 0L))
  }

  test("streaming anomaly scoring matches the batch operator " +
    "point-for-point across micro-batch boundaries; spike off a flat " +
    "baseline flags") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_anom_in").toString
    val out = Files.createTempDirectory("graft_anom_out").toString
    val ckpt = Files.createTempDirectory("graft_anom_ck").toString
    // h1: flat 10.0 for 14 points then a 99.0 spike; h2: varied, never
    // anomalous. Warm-up spans the micro-batch boundary, exercising
    // state continuity.
    val h1 = (1L to 14L).map(m => (m, 10.0)) :+ ((15L, 99.0))
    val h2 = Seq((1L, 5.0), (2L, 7.0), (3L, 6.0), (4L, 5.5), (5L, 6.5),
      (6L, 5.0), (7L, 7.0), (8L, 6.0))
    def lp(host: String, m: Long, v: Double) =
      s"m,host=$host v=$v ${minuteNs(m)}"
    writeBatch(in, "b0.lp",
      h1.take(6).map(p => lp("h1", p._1, p._2)) ++
        h2.take(4).map(p => lp("h2", p._1, p._2)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val scored = StreamIngest.anomalyStream(typed, "tag_host", "v",
      lookback = 8, minPrior = 4, sigma = 3)
    val q = StreamIngest.toParquet(scored, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp",
        h1.drop(6).map(p => lp("h1", p._1, p._2)) ++
          h2.drop(4).map(p => lp("h2", p._1, p._2)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("time_ns")) ->
        ((r.getAs[Long]("n_prior"),
          Option(r.getAs[Any]("z")).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("is_anomaly"))))
      .toMap
    // batch differential: same points, same cent units, same params
    val frame = (h1.map(p => ("h1", minuteNs(p._1),
        math.round(p._2 * 100))) ++
      h2.map(p => ("h2", minuteNs(p._1), math.round(p._2 * 100))))
      .toDF("key", "b", "vc")
    val batch = graft.operators.SeriesOps.rollingAnomalies(frame,
        Seq("key"), "b", "vc", lookback = 8, minPrior = 4, sigma = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          r.getBoolean(5))))
      .toMap
    assert(got == batch)
    // flat baseline + spike: flags with null z (V = 0, D != 0)
    assert(got(("h1", minuteNs(15L))) == ((8L, None, true)))
    // flat baseline, on-baseline points never flag
    assert(!got(("h1", minuteNs(14L)))._3)
    assert(h2.forall(p => !got(("h2", minuteNs(p._1)))._3))
  }

  test("streaming path transitions match the batch operator's " +
    "adjacency pairs across micro-batch boundaries (last-event state " +
    "carried); rollup of the pair stream equals batch counts") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_tr_in").toString
    val out = Files.createTempDirectory("graft_tr_out").toString
    val ckpt = Files.createTempDirectory("graft_tr_ck").toString
    // u1's a→b boundary-straddling chain; u2's single cross-batch pair
    val pts = Seq(("u1", 1L, "a"), ("u1", 2L, "b"), ("u2", 1L, "x"),
      ("u1", 3L, "a"), ("u1", 4L, "c"), ("u2", 5L, "y"))
    def lp(u: String, m: Long, t: String) =
      s"m,host=$u,et=$t v=1 ${minuteNs(m)}"
    writeBatch(in, "b0.lp", pts.take(3).map(p => lp(p._1, p._2, p._3)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host", "et"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val tr = StreamIngest.transitionsStream(typed, "tag_host",
      "tag_et", "time_ns")
    val q = StreamIngest.toParquet(tr, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", pts.drop(3).map(p => lp(p._1, p._2, p._3)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("from_type"),
        r.getAs[String]("to_type"), r.getAs[Long]("time_ns")))
      .toSet
    // exact adjacency differential (stronger than count parity): each
    // pair stamped at its destination event's time
    assert(got === Set(
      ("u1", "a", "b", minuteNs(2)), ("u1", "b", "a", minuteNs(3)),
      ("u1", "a", "c", minuteNs(4)), ("u2", "x", "y", minuteNs(5))))
    // and the bounded-domain rollup equals the batch operator's counts
    val batchCounts = graft.operators.Behavior.pathTransitions(
        pts.zipWithIndex.map { case ((u, m, t), i) =>
          (i.toLong, minuteNs(m), u, t) }
          .toDF("event_id", "ts", "user_id", "event_type"),
        "user_id", "ts", "event_type", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val streamCounts = got.toSeq.groupBy(p => (p._2, p._3))
      .map { case (k, v) => k -> v.size.toLong }
    assert(streamCounts === batchCounts)
  }

  test("streaming CUSUM matches the batch operator point-for-point " +
    "across micro-batch boundaries (target/sums carried); the level " +
    "shift alarms continuously") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_cu_in").toString
    val out = Files.createTempDirectory("graft_cu_out").toString
    val ckpt = Files.createTempDirectory("graft_cu_ck").toString
    // flat 1.00 then a +0.10 shift straddling the batch boundary
    val pts = (1L to 10L).map(m => (m, if (m <= 5) 1.0 else 1.1))
    def lp(m: Long, v: Double) = s"m,host=h1 v=$v ${minuteNs(m)}"
    writeBatch(in, "b0.lp", pts.take(6).map(p => lp(p._1, p._2)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val cu = StreamIngest.cusumStream(typed, "tag_host", "v",
      drift = 2L, threshold = 20L)
    val q = StreamIngest.toParquet(cu, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", pts.drop(6).map(p => lp(p._1, p._2)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("time_ns") ->
        ((r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg"),
          r.getAs[Boolean]("alarm_pos"))))
      .toMap
    val batch = graft.operators.SeriesOps.cusumFixed(
        pts.map(p => ("h1", minuteNs(p._1), math.round(p._2 * 100)))
          .toDF("key", "b", "vc"),
        Seq("key"), "b", "vc", drift = 2L, threshold = 20L)
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got === batch)
    // shift of +10 cents, drift 2 → s⁺ grows 8/point from m=6; alarm
    // from the third shifted point on, and it stays on
    assert(!got(minuteNs(7))._3 && got(minuteNs(8))._3 &&
      got(minuteNs(10))._3)
  }

  test("streaming counter rate: the last emitted row per key equals " +
    "the batch counterRate aggregate across micro-batch boundaries, " +
    "including a reset straddling the boundary") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_rt_in").toString
    val out = Files.createTempDirectory("graft_rt_out").toString
    val ckpt = Files.createTempDirectory("graft_rt_ck").toString
    // counter climbs 0.10→0.40, resets to 0.05 EXACTLY at the batch
    // boundary, climbs again, resets once more within batch 1
    val pts = Seq((1L, 0.10), (2L, 0.25), (3L, 0.40), (4L, 0.05),
      (5L, 0.30), (6L, 0.12), (7L, 0.20))
    def lp(m: Long, v: Double) = s"m,host=h1 v=$v ${minuteNs(m)}"
    writeBatch(in, "b0.lp", pts.take(3).map(p => lp(p._1, p._2)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val rt = StreamIngest.rateStream(typed, "tag_host", "v")
    val q = StreamIngest.toParquet(rt, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", pts.drop(3).map(p => lp(p._1, p._2)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("time_ns") ->
        ((r.getAs[Long]("n_resets"), r.getAs[Long]("increase_c"))))
      .toMap
    // per-point recurrence: +15, +15, reset(+5), +25, reset(+12), +8
    assert(rows(minuteNs(3)) === ((0L, 30L)))
    assert(rows(minuteNs(4)) === ((1L, 35L)))
    val last = rows(minuteNs(7))
    val batch = graft.operators.SeriesOps.counterRate(
        pts.map(p => ("h1", p._1 * 60000000L, math.round(p._2 * 100)))
          .toDF("key", "t_us", "vc"),
        Seq("key"), "t_us", "vc")
      .collect().head
    assert(last === ((batch.getLong(2), batch.getLong(3))))
    assert(last === ((2L, 80L)))
  }

  test("streaming SCD2: closed intervals equal the batch operator's " +
    "non-current rows across micro-batch boundaries, including a " +
    "value change straddling the boundary; the open run never " +
    "reaches the sink") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_s2_in").toString
    val out = Files.createTempDirectory("graft_s2_out").toString
    val ckpt = Files.createTempDirectory("graft_s2_ck").toString
    // state a,a,b | b,c,c → closed runs a@[1,3) and b@[3,4); c open
    val pts = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"),
      (5L, "c"), (6L, "c"))
    def lp(m: Long, v: String) = s"m,host=h1,st=$v f=1 ${minuteNs(m)}"
    writeBatch(in, "b0.lp", pts.take(3).map(p => lp(p._1, p._2)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host", "st"),
      Map("f" -> FieldSch("f", FieldType.Float)))
    val sc = StreamIngest.scd2Stream(typed, "tag_host", "tag_st")
    val q = StreamIngest.toParquet(sc, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", pts.drop(3).map(p => lp(p._1, p._2)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("value"),
        r.getAs[Long]("valid_from_ns"), r.getAs[Long]("valid_to_ns")))
      .toSet
    assert(got === Set(
      ("a", minuteNs(1), minuteNs(3)),
      ("b", minuteNs(3), minuteNs(5))))
    val batch = graft.operators.Incremental.scd2(
        pts.map(p => ("h1", minuteNs(p._1), p._2)).toDF("k", "t", "v"),
        "k", "t", "v")
      .filter(!col("is_current"))
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === batch)
  }

  test("streaming heavy hitters: exact-mode snapshots carry true " +
    "running counts across micro-batch boundaries and the merged " +
    "bucket tops equal the batch aggregate") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_hh_in").toString
    val out = Files.createTempDirectory("graft_hh_out").toString
    val ckpt = Files.createTempDirectory("graft_hh_ck").toString
    // a×5, b×3, c×2, d×1 split unevenly across two batches
    val words = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") :+ "d"
    def lp(w: String, i: Int) = s"m,host=h,w=$w v=1 ${minuteNs(i + 1L)}"
    val lines = words.zipWithIndex.map((lp _).tupled)
    writeBatch(in, "b0.lp", lines.take(4))
    val typed = StreamIngest.typedStream(spark, in, Seq("host", "w"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val hh = StreamIngest.heavyHittersStream(typed, "tag_w",
      buckets = 4, capacity = 16, k = 8)
    val q = StreamIngest.toParquet(hh, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", lines.drop(4))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("ver"),
        r.getAs[String]("item"), r.getAs[Long]("cnt"),
        r.getAs[Long]("err")))
    // exact mode: every error is zero
    assert(rows.forall(_._5 == 0L), rows.mkString(", "))
    // merge each bucket's LATEST snapshot → true totals
    val latest = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      val top = rs.map(_._2).max
      rs.filter(_._2 == top).toSeq
    }
    val got = latest.map(r => r._3 -> r._4).toMap
    assert(got === Map("a" -> 5L, "b" -> 3L, "c" -> 2L, "d" -> 1L))
  }

  test("streaming funnel: greedy advance over in-order input equals " +
    "the batch min-time chaining across micro-batch boundaries; " +
    "out-of-order stages never advance") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_fn_in").toString
    val out = Files.createTempDirectory("graft_fn_out").toString
    val ckpt = Files.createTempDirectory("graft_fn_ck").toString
    // u1 converts a@1 → b@3 (the b@1-at-same-minute trap is below);
    // u2 sees b before ever doing a — must reach nothing;
    // u3 reaches a in batch 0, b only arrives in batch 1 (state carry)
    val pts = Seq(
      ("u1", 1L, "a"), ("u2", 1L, "b"), ("u3", 2L, "a"),
      ("u1", 3L, "b"), ("u2", 4L, "c"), ("u3", 5L, "b"),
      ("u3", 6L, "c"))
    def lp(u: String, m: Long, t: String) =
      s"m,host=$u,et=$t v=1 ${minuteNs(m)}"
    writeBatch(in, "b0.lp", pts.take(3).map(p => lp(p._1, p._2, p._3)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host", "et"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val fn = StreamIngest.funnelStream(typed, "tag_host", "tag_et",
      "time_ns", Seq("a", "b", "c"))
    val q = StreamIngest.toParquet(fn, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", pts.drop(3).map(p => lp(p._1, p._2, p._3)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("stage"),
        r.getAs[String]("stage_name"), r.getAs[Long]("time_ns")))
      .toSet
    assert(got === Set(
      ("u1", 1L, "a", minuteNs(1)), ("u1", 2L, "b", minuteNs(3)),
      ("u3", 1L, "a", minuteNs(2)), ("u3", 2L, "b", minuteNs(5)),
      ("u3", 3L, "c", minuteNs(6))))
    // rollup equals the batch operator's stage counts
    val batch = graft.operators.Behavior.funnel(
        pts.zipWithIndex.map { case ((u, m, t), i) =>
          (i.toLong, minuteNs(m), u, t) }
          .toDF("event_id", "ts", "user_id", "event_type"),
        "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val streamCounts2 = got.toSeq.groupBy(_._2)
      .map { case (k, v) => k -> v.size.toLong }
    assert(streamCounts2 === batch.filter(_._2 > 0))
  }

  test("streaming quantile sketch: the latest snapshot equals the " +
    "batch ddQuantiles bit-for-bit across micro-batch boundaries " +
    "(additive bucket counts — no merge-order sensitivity)") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_qs_in").toString
    val out = Files.createTempDirectory("graft_qs_out").toString
    val ckpt = Files.createTempDirectory("graft_qs_ck").toString
    val rnd = new scala.util.Random(13)
    val pts = (1 to 200).map(i =>
      (if (i % 2 == 0) "h1" else "h2", i.toLong,
        (rnd.nextInt(5000) + 1) / 100.0))
    def lp(p: (String, Long, Double)) =
      s"m,host=${p._1} v=${p._3} ${minuteNs(p._2)}"
    writeBatch(in, "b0.lp", pts.take(120).map(lp))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val qs = Seq((50L, 100L), (90L, 100L), (99L, 100L))
    val names = Seq("p50_r", "p90_r", "p99_r")
    val sk = StreamIngest.quantileSketchStream(typed, "tag_host", "v",
      alphaBp = 200, maxBuckets = 1000, qs = qs, names = names)
    val q = StreamIngest.toParquet(sk, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", pts.drop(120).map(lp))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out).collect()
    val latest = rows.groupBy(_.getAs[String]("key")).map {
      case (k, rs) =>
        val top = rs.maxBy(_.getAs[Long]("ver"))
        k -> ((top.getAs[Long]("n"), top.getAs[Boolean]("collapsed"),
          names.map(top.getAs[Double](_))))
    }
    val batch = graft.operators.QuantileSketch.ddQuantiles(
        pts.map(p => (p._1, math.round(p._3 * 100)))
          .toDF("key", "vc"),
        Seq("key"), "vc", alphaBp = 200, qs = qs, names = names)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), names.map(r.getAs[Double](_))))).toMap
    assert(latest.keySet === batch.keySet)
    latest.foreach { case (k, (n, collapsed, ests)) =>
      assert(!collapsed, s"$k collapsed in exact mode")
      assert(n === batch(k)._1, s"$k n")
      assert(ests === batch(k)._2, s"$k estimates")
    }
  }

  test("sessionized streaming quantiles: per-session DDSketch " +
    "percentiles match the batch operator across BOTH micro-batch " +
    "and session-gap boundaries") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_sq_in").toString
    val out = Files.createTempDirectory("graft_sq_out").toString
    val ckpt = Files.createTempDirectory("graft_sq_ck").toString
    // gap 5m: h1 session A = minutes 10, 11 (batch 0) + 12 (batch 1 —
    // the session SPANS the micro-batch boundary); h1 session B =
    // minute 30 (18m of silence > gap); h2 session C spans batches
    // too (minutes 10, 13)
    writeBatch(in, "b0.lp", Seq(
      s"m,host=h1 v=1.0 ${minuteNs(10)}",
      s"m,host=h1 v=5.0 ${minuteNs(11)}",
      s"m,host=h2 v=2.5 ${minuteNs(10)}"))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val qs = Seq((50L, 100L), (95L, 100L))
    val names = Seq("p50_r", "p95_r")
    val sk = StreamIngest.sessionQuantileStream(typed, Seq("tag_host"),
      "v", gapDuration = "5 minutes", watermarkDelay = "2 minutes",
      alphaBp = 200, maxBuckets = 1000, qs = qs, names = names)
    val q = StreamIngest.toParquet(sk, out, ckpt)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).isEmpty) // all sessions open
      writeBatch(in, "b1.lp", Seq(
        s"m,host=h1 v=9.0 ${minuteNs(12)}",
        s"m,host=h2 v=7.5 ${minuteNs(13)}",
        s"m,host=h1 v=42.0 ${minuteNs(30)}"))
      q.processAllAvailable()
      // advance the watermark far past every session, twice (it only
      // moves at batch end)
      writeBatch(in, "b2.lp", Seq(s"m,host=h9 v=1.0 ${minuteNs(60)}"))
      q.processAllAvailable()
      writeBatch(in, "b3.lp", Seq(s"m,host=h9 v=1.0 ${minuteNs(61)}"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .filter(col("tag_host").isin("h1", "h2")).collect()
      .map(r => (r.getAs[String]("tag_host"),
        r.getAs[java.sql.Timestamp]("session_start").getTime) ->
        ((r.getAs[Long]("n"), r.getAs[Boolean]("collapsed"),
          names.map(r.getAs[Double](_)))))
      .toMap
    // three closed sessions, none collapsed (exact mode)
    assert(got.size === 3)
    assert(got.values.forall(!_._2))
    // batch differential: the SAME cents through the batch ddQuantiles
    // face, sessions labelled by construction — estimates must match
    // bit-for-bit (shared bucketing, rank rule, estimate formula and
    // rounding)
    val batch = graft.operators.QuantileSketch.ddQuantiles(
        Seq(("h1", "A", 100L), ("h1", "A", 500L), ("h1", "A", 900L),
          ("h1", "B", 4200L), ("h2", "C", 250L), ("h2", "C", 750L))
          .toDF("host", "sess", "vc"),
        Seq("host", "sess"), "vc", alphaBp = 200, qs = qs,
        names = names)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n"), names.map(r.getAs[Double](_))))).toMap
    val sessionStartMin = Map(("h1", "A") -> 10L, ("h1", "B") -> 30L,
      ("h2", "C") -> 10L)
    batch.foreach { case (k, (n, ests)) =>
      val stream = got((k._1, sessionStartMin(k) * 60000L))
      assert(stream._1 === n, s"$k n")
      assert(stream._3 === ests, s"$k estimates")
    }
  }

  test("DdSketchAggregator collapse keeps the upper-quantile " +
    "guarantee: a maxBuckets-bounded sketch reports the SAME p95 as " +
    "the unbounded one (collapse only fuses the lowest buckets)") {
    val qs = Seq((50L, 100L), (95L, 100L))
    def fold(maxBuckets: Int) = {
      val a = new graft.operators.QuantileSketch.DdSketchAggregator(
        200, maxBuckets, qs)
      // cents 1..400 in a shuffled but fixed order — dozens of
      // distinct buckets at α=2%
      val vals = new scala.util.Random(7).shuffle((1L to 400L).toList)
      a.finish(vals.foldLeft(a.zero)(a.reduce))
    }
    val exact = fold(1000)
    val bounded = fold(5)
    assert(!exact.collapsed && bounded.collapsed)
    assert(exact.n === bounded.n) // collapse never loses mass
    assert(bounded.ests(1) === exact.ests(1), "p95 must survive collapse")
  }

  test("streaming lateness audit: points below a PRIOR batch's " +
    "high-water mark count late with exact worst skew; in-batch " +
    "disorder does not (the watermark's own visibility)") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_lt_in").toString
    val out = Files.createTempDirectory("graft_lt_out").toString
    val ckpt = Files.createTempDirectory("graft_lt_ck").toString
    def lp(m: Long) = s"m,host=h1 v=1.0 ${minuteNs(m)}"
    // batch 0: minutes 5, 9, 2 (disorder INSIDE one batch: not late)
    writeBatch(in, "b0.lp", Seq(lp(5), lp(9), lp(2)))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val lt = StreamIngest.latenessStream(typed, "tag_host")
    val q = StreamIngest.toParquet(lt, out, ckpt)
    try {
      q.processAllAvailable()
      // batch 1: minute 4 and 7 are BELOW the batch-0 mark (9): late
      // with skews 5 and 2 minutes; 12 advances the mark
      writeBatch(in, "b1.lp", Seq(lp(4), lp(12), lp(7)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("ver") ->
        ((r.getAs[Long]("hwm_ns"), r.getAs[Long]("n"),
          r.getAs[Long]("n_late"), r.getAs[Long]("late_bp"),
          r.getAs[Long]("max_skew_ns")))).toMap
    assert(rows(1L) === ((minuteNs(9), 3L, 0L, 0L, 0L)))
    assert(rows(2L) === ((minuteNs(12), 6L, 2L, 3333L,
      minuteNs(9) - minuteNs(4))))
  }

  test("streaming drift monitor: the latest snapshot's KS distance " +
    "vs the reference equals the batch ksTest over identically " +
    "bucketed cohorts, across micro-batch boundaries; a planted " +
    "shift screams while an in-distribution feed stays quiet") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_dr_in").toString
    val out = Files.createTempDirectory("graft_dr_out").toString
    val ckpt = Files.createTempDirectory("graft_dr_ck").toString
    val alphaBp = 200
    val lnG = math.log(graft.operators.QuantileSketch.gamma(alphaBp))
    val rnd = new scala.util.Random(17)
    // reference: uniform cents 100..5000
    val refVals = (1 to 500).map(_ => (rnd.nextInt(4900) + 100).toLong)
    val reference = refVals
      .map(graft.operators.QuantileSketch.bucketOf(_, lnG))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    // h1 streams in-distribution; h2 streams a 10x upshift
    val cur = (1 to 120).map { i =>
      val inDist = (rnd.nextInt(4900) + 100).toLong
      (i.toLong, "h1", inDist / 100.0)
    } ++ (1 to 120).map { i =>
      val shifted = (rnd.nextInt(4900) + 100).toLong * 10
      ((i + 200).toLong, "h2", shifted / 100.0)
    }
    def lp(p: (Long, String, Double)) =
      s"m,host=${p._2} v=${p._3} ${minuteNs(p._1)}"
    val shuffled = rnd.shuffle(cur)
    writeBatch(in, "b0.lp", shuffled.take(140).map(lp))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val dr = StreamIngest.driftStream(typed, "tag_host", "v",
      alphaBp, reference)
    val q = StreamIngest.toParquet(dr, out, ckpt)
    try {
      q.processAllAvailable()
      writeBatch(in, "b1.lp", shuffled.drop(140).map(lp))
      q.processAllAvailable()
    } finally q.stop()
    val latest = spark.read.parquet(out).collect()
      .groupBy(_.getAs[String]("key")).map { case (k, rs) =>
        val top = rs.maxBy(_.getAs[Long]("ver"))
        k -> ((top.getAs[Long]("n"), top.getAs[Long]("d_num"),
          top.getAs[Double]("d_r")))
      }
    // batch differential: ksTest over the SAME bucket domain
    for (h <- Seq("h1", "h2")) {
      val curB = cur.filter(_._2 == h).map(p =>
        ("cur", graft.operators.QuantileSketch.bucketOf(
          math.round(p._3 * 100), lnG)))
      val refB = refVals.map(v =>
        ("ref", graft.operators.QuantileSketch.bucketOf(v, lnG)))
      val batch = graft.operators.Profiling.ksTest(
          (curB ++ refB).toDF("g", "b"), "g", "b", "cur", "ref")
        .collect().head
      assert(latest(h)._1 === batch.getLong(0), s"$h n")
      assert(latest(h)._2 === batch.getLong(2), s"$h d_num")
      assert(latest(h)._3 === batch.getDouble(3), s"$h d_r")
    }
    // polarity: the shifted feed screams, the in-dist one does not
    assert(latest("h2")._3 > 0.9, latest("h2").toString)
    assert(latest("h1")._3 < 0.2, latest("h1").toString)
  }

  test("streaming quantile sketch: per-key state SURVIVES a query " +
    "restart from the checkpoint — the resumed snapshot still " +
    "equals the batch operator over all points") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_qr_in").toString
    val out = Files.createTempDirectory("graft_qr_out").toString
    val ckpt = Files.createTempDirectory("graft_qr_ck").toString
    val rnd = new scala.util.Random(23)
    val pts = (1 to 160).map(i =>
      (i.toLong, (rnd.nextInt(4000) + 1) / 100.0))
    def lp(p: (Long, Double)) = s"m,host=h1 v=${p._2} ${minuteNs(p._1)}"
    writeBatch(in, "b0.lp", pts.take(90).map(lp))
    val qs = Seq((1L, 2L), (9L, 10L))
    val names = Seq("p50_r", "p90_r")
    def startQuery() = {
      val typed = StreamIngest.typedStream(spark, in, Seq("host"),
        Map("v" -> FieldSch("v", FieldType.Float)))
      val sk = StreamIngest.quantileSketchStream(typed, "tag_host",
        "v", alphaBp = 200, maxBuckets = 1000, qs = qs, names = names)
      StreamIngest.toParquet(sk, out, ckpt)
    }
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // RESTART: a brand-new query on the same checkpoint must resume
    // the per-key bucket state, not start from zero
    writeBatch(in, "b1.lp", pts.drop(90).map(lp))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val top = spark.read.parquet(out).collect()
      .maxBy(_.getAs[Long]("ver"))
    val batch = graft.operators.QuantileSketch.ddQuantiles(
        pts.map(p => ("h1", math.round(p._2 * 100))).toDF("k", "vc"),
        Seq("k"), "vc", alphaBp = 200, qs = qs, names = names)
      .collect().head
    assert(top.getAs[Long]("n") === batch.getLong(1), "state lost")
    assert(names.map(top.getAs[Double](_)) ===
      names.map(batch.getAs[Double](_)))
  }

  test("streaming quantile sketch: past maxBuckets the LOWEST " +
    "buckets collapse — the snapshot flags it and upper quantiles " +
    "keep their relative-error guarantee") {
    val s = spark
    import s.implicits._
    val in = Files.createTempDirectory("graft_qc_in").toString
    val out = Files.createTempDirectory("graft_qc_out").toString
    val ckpt = Files.createTempDirectory("graft_qc_ck").toString
    // values 1..400 cents: far more than 8 distinct buckets
    val pts = (1 to 400).map(i => (i.toLong, i / 100.0))
    def lp(p: (Long, Double)) = s"m,host=h1 v=${p._2} ${minuteNs(p._1)}"
    writeBatch(in, "b0.lp", pts.map(lp))
    val typed = StreamIngest.typedStream(spark, in, Seq("host"),
      Map("v" -> FieldSch("v", FieldType.Float)))
    val sk = StreamIngest.quantileSketchStream(typed, "tag_host", "v",
      alphaBp = 200, maxBuckets = 8,
      qs = Seq((99L, 100L)), names = Seq("p99_r"))
    val q = StreamIngest.toParquet(sk, out, ckpt)
    try q.processAllAvailable() finally q.stop()
    val r = spark.read.parquet(out).collect()
      .maxBy(_.getAs[Long]("ver"))
    assert(r.getAs[Boolean]("collapsed"))
    assert(r.getAs[Long]("n") === 400L)
    val p99 = r.getAs[Double]("p99_r")
    assert(math.abs(p99 - 396.0) / 396.0 <= 0.02 + 1e-6, s"p99=$p99")
  }

  test("growing-index dedup stream: micro-batches mark against and " +
    "extend the ON-DISK banded index (state is the shared persistent " +
    "index, not executor memory); batch-mode ingest of the same " +
    "increments produces identical marks, and duplicates never enter " +
    "the index") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_lsh_in").toString
    val idx = Files.createTempDirectory("graft_lsh_idx").toString
    val marks = Files.createTempDirectory("graft_lsh_mk").toString
    val ckpt = Files.createTempDirectory("graft_lsh_ck").toString
    def doc(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    // batch 0: two novel docs
    Files.write(Paths.get(in, "b0.json"), Seq(
      doc(1, "alpha beta gamma delta epsilon"),
      doc(2, "one two three four five")).mkString("\n")
      .getBytes(StandardCharsets.UTF_8)): Unit
    val src = spark.readStream
      .schema("id LONG, text STRING").json(in)
    val q = StreamIngest.lshIndexIngestStream(src, "id", "text",
      idx, marks, ckpt)
    try {
      q.processAllAvailable()
      // batch 1: a dup of doc 1, a novel doc, and a within-batch
      // duplicate pair (12, 13)
      Files.write(Paths.get(in, "b1.json"), Seq(
        doc(10, "alpha beta gamma delta epsilon"),
        doc(11, "completely different words here now"),
        doc(12, "brand new template words appear"),
        doc(13, "brand new template words appear")).mkString("\n")
        .getBytes(StandardCharsets.UTF_8)): Unit
      q.processAllAvailable()
    } finally q.stop()
    val m = spark.read.parquet(marks).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(m === Map(1L -> false, 2L -> false, 10L -> true,
      11L -> false, 12L -> false, 13L -> true), m.toString)
    // the index holds exactly the canonicals, 4 band rows each
    val (bandsDf, sigsDf) = StreamIngest.readLshIndex(spark, idx)
    val ids = bandsDf.select("id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L, 11L, 12L), ids.toString)
    assert(bandsDf.count() === 16L)
    assert(sigsDf.select("id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 11L, 12L))
    // differential: batch-mode sequential ingest of the same two
    // increments yields the same final decision for the second batch
    def sigsOf(rows: Seq[(Long, String)]) =
      graft.operators.Dedup.minhashSignatures(
        rows.toDF("doc_id", "text"), "doc_id", "text", 8, 3)
    val storeSigs = sigsOf(Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five"))
    val (bMarks, _) = graft.operators.Dedup.lshIndexIngest(
      sigsOf(Seq(10L -> "alpha beta gamma delta epsilon",
        11L -> "completely different words here now",
        12L -> "brand new template words appear",
        13L -> "brand new template words appear")),
      graft.operators.Dedup.lshBandsFromSig(storeSigs, 4, 8),
      storeSigs, 4, 8, minMatches = 4, withinBatch = true)
    val bm = bMarks.collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(bm === m.filter(_._1 >= 10L), s"$bm vs $m")
  }

  test("IVF index stream: micro-batches assign against the persisted " +
    "codebook and grow the on-disk index; the index-served nProbe=1 " +
    "top-k equals the batch ivfTopKFixed over the same corpus " +
    "(stored assignments are never recomputed)") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_ivf_in").toString
    val idx = Files.createTempDirectory("graft_ivf_idx").toString
    val ckpt = Files.createTempDirectory("graft_ivf_ck").toString
    val anchors = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    StreamIngest.ivfIndexInit(spark, idx, anchors)
    assert(StreamIngest.readIvfCentroids(spark, idx) != null)
    def doc(id: Long, x: Double, y: Double) =
      s"""{"id": $id, "vec": [$x, $y]}"""
    Files.write(Paths.get(in, "b0.json"), Seq(
      doc(1, 0.9, 0.1), doc(2, 0.1, 0.9)).mkString("\n")
      .getBytes(StandardCharsets.UTF_8)): Unit
    val src = spark.readStream
      .schema("id LONG, vec ARRAY<DOUBLE>").json(in)
    val q = StreamIngest.ivfIngestStream(src, "id", "vec", idx, ckpt)
    try {
      q.processAllAvailable()
      Files.write(Paths.get(in, "b1.json"), Seq(
        doc(3, 0.8, 0.2), doc(4, 0.2, 0.8), doc(5, 0.7, 0.7))
        .mkString("\n").getBytes(StandardCharsets.UTF_8)): Unit
      q.processAllAvailable()
    } finally q.stop()
    val index = StreamIngest.readIvfIndex(spark, idx)
    assert(index.count() == 5L)
    // stored assignments match the operator's rule
    val lists = index.select("vec_id", "list").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lists === Map(1L -> 0L, 2L -> 1L, 3L -> 0L, 4L -> 1L,
      5L -> 0L), lists.toString) // tie at 5 → smallest list
    // differential: index-served top-k == batch ivfTopKFixed over the
    // same corpus frame
    val corpus = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.1, 0.9)),
      (3L, Seq(0.8, 0.2)), (4L, Seq(0.2, 0.8)), (5L, Seq(0.7, 0.7)))
      .toDF("id", "vec")
    val queries = corpus.filter(col("id") <= 2L)
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))).toSet
    val served = asRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx, k = 3))
    val batchMode = asRows(graft.operators.Similarity.ivfTopKFixed(
      queries, corpus, "id", "vec", anchors, k = 3))
    assert(served === batchMode, s"$served vs $batchMode")
    assert(served.nonEmpty)
    // epoch compaction: row-identical index, identical served answers
    assert(StreamIngest.compactIvfIndex(spark, idx) == 5L)
    assert(StreamIngest.readIvfIndex(spark, idx).count() == 5L)
    assert(asRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx, k = 3)) === batchMode)
  }

  test("compactLshIndex folds per-batch partitions into one epoch: " +
    "row-identical contents, one partition dir left, and a later " +
    "ingest still dedups against the compacted index") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_lshc_idx").toString
    val marks = Files.createTempDirectory("graft_lshc_mk").toString
    def batchDf(rows: (Long, String)*) = rows.toDF("id", "text")
    StreamIngest.lshIngestBatch(
      batchDf(1L -> "alpha beta gamma delta epsilon"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    StreamIngest.lshIngestBatch(
      batchDf(2L -> "one two three four five"),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    def bandSet = {
      val (b, _) = StreamIngest.readLshIndex(spark, idx)
      b.select("id", "band", "band_hash").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    }
    val before = bandSet
    assert(before.size == 8)
    val (nb, ns) = StreamIngest.compactLshIndex(spark, idx)
    assert(nb == 8L && ns == 2L, s"($nb, $ns)")
    assert(bandSet === before, "compaction changed the index contents")
    // hot tail cleared; epoch carries the pruned layout (bb= dirs +
    // _layout descriptor with the watermark and bucket count)
    val hotLeft = Option(new java.io.File(s"$idx/bands").listFiles())
      .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
    assert(hotLeft == 0, s"$hotLeft hot dirs left after compaction")
    val epochDirs = Option(
      new java.io.File(s"$idx/bands_epoch").listFiles()).toSeq.flatten
      .filter(_.isDirectory)
      .map(d => Option(d.listFiles()).toSeq.flatten
        .count(_.getName.startsWith("bb=")))
      .sum
    assert(epochDirs >= 1, s"$epochDirs bb= partitions in the epoch")
    val layout = StreamIngest.readLayout(spark, s"$idx/bands_epoch")
    // watermark = highest folded batch; bucket count auto-sized from
    // bytes (tiny fixture -> 1) and recorded per segment for the
    // probes; both folded batches landed in ONE segment
    assert(layout.exists(l => l.wm == 1L && l.segs.nonEmpty &&
      l.segs.forall(_.buckets == 1)), layout.toString)
    // a later micro-batch still marks against the compacted epoch
    StreamIngest.lshIngestBatch(
      batchDf(10L -> "alpha beta gamma delta epsilon",
        11L -> "novel unseen words entirely fresh"),
      "id", "text", idx, marks, 2L, 8, 4, 3, 4)
    val m = spark.read.parquet(marks)
      .filter(col("batch") === 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(m === Map(10L -> true, 11L -> false), m.toString)
    // the dup stayed out; the novel doc joined the compacted epoch
    assert(bandSet.map(_._1) === Set(1L, 2L, 11L))
  }

  test("lshIngestBatch replay (same batchId) is idempotent: the " +
    "retry never matches the batch against its own prior attempt's " +
    "rows, so marks and index contents equal the first attempt's " +
    "(the foreachBatch at-least-once contract)") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_lshr_idx").toString
    val marks = Files.createTempDirectory("graft_lshr_mk").toString
    def batchDf(rows: (Long, String)*) = rows.toDF("id", "text")
    StreamIngest.lshIngestBatch(
      batchDf(1L -> "alpha beta gamma delta epsilon"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    val b1 = Seq(10L -> "alpha beta gamma delta epsilon",
      11L -> "novel unseen words entirely fresh")
    def marksOf(batch: Long) = spark.read.parquet(marks)
      .filter(col("batch") === batch).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup")).toMap
    def indexIds = {
      val (b, s) = StreamIngest.readLshIndex(spark, idx)
      (b.select("id").distinct().collect().map(_.getLong(0)).toSet,
        s.select("id").distinct().collect().map(_.getLong(0)).toSet)
    }
    StreamIngest.lshIngestBatch(batchDf(b1: _*),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    val firstMarks = marksOf(1L)
    val firstIndex = indexIds
    assert(firstMarks === Map(10L -> true, 11L -> false), firstMarks)
    assert(firstIndex === (Set(1L, 11L), Set(1L, 11L)), firstIndex)
    // replay the SAME batchId — pre-fix this marked 10 AND 11 dup
    // (self-match against the prior attempt) and erased 11's rows
    StreamIngest.lshIngestBatch(batchDf(b1: _*),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    assert(marksOf(1L) === firstMarks, marksOf(1L))
    assert(indexIds === firstIndex, indexIds)
  }

  test("index retention (r16): an expiry fold drops expired ids from " +
    "bands+sigs, a copy of the EXPIRED canonical's content is NOT a " +
    "dup (it becomes the new canonical and enters the index), and " +
    "later copies chain to the successor") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_lshex_idx").toString
    val marks = Files.createTempDirectory("graft_lshex_mk").toString
    def batchDf(rows: (Long, String)*) = rows.toDF("id", "text")
    val textA = "alpha beta gamma delta epsilon zeta"
    val textB = "one two three four five six"
    StreamIngest.lshIngestBatch(batchDf(1L -> textA, 2L -> textB),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    StreamIngest.compactLshIndex(spark, idx)
    // canonical 1 alive: its copy is a dup and stays OUT of the index
    StreamIngest.lshIngestBatch(batchDf(20L -> textA),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    def marksOf(b: Long) = spark.read.parquet(marks)
      .filter(col("batch") === b).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup")).toMap
    assert(marksOf(1L) === Map(20L -> true))
    // retention: id 1 expires; the fold drops its rows from BOTH frames
    StreamIngest.compactLshIndex(spark, idx,
      liveIds = Some(Seq(2L).toDF("id")))
    val (b, sg) = StreamIngest.readLshIndex(spark, idx)
    assert(b.select("id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(2L))
    assert(sg.select("id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(2L))
    // successor rule: the next copy of A is NOT a dup — it becomes
    // the new canonical and enters the index
    StreamIngest.lshIngestBatch(batchDf(21L -> textA),
      "id", "text", idx, marks, 2L, 8, 4, 3, 4)
    assert(marksOf(2L) === Map(21L -> false))
    // and later copies chain to the SUCCESSOR, not the ghost
    StreamIngest.lshIngestBatch(batchDf(22L -> textA),
      "id", "text", idx, marks, 3L, 8, 4, 3, 4)
    assert(marksOf(3L) === Map(22L -> true))
    val ids = StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L, 21L), ids.toString)
  }

  test("streaming SemDeDup over the persistent IVF index (r16): " +
    "micro-batches take within-list verdicts against the GROWN index " +
    "(no re-clustering), non-dups extend the same index top-k " +
    "serves, and batch-mode ingest of the same increments produces " +
    "identical marks — incl. the within-batch earlier-sibling rule " +
    "and same-batchId replay idempotence") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_sem_in").toString
    val idx = Files.createTempDirectory("graft_sem_idx").toString
    val marks = Files.createTempDirectory("graft_sem_mk").toString
    val ckpt = Files.createTempDirectory("graft_sem_ck").toString
    val anchors = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
    StreamIngest.ivfIndexInit(spark, idx, anchors)
    def doc(id: Long, x: Double, y: Double) =
      s"""{"id": $id, "vec": [$x, $y]}"""
    // batch 0: two canonicals, one per list
    Files.write(Paths.get(in, "b0.json"), Seq(
      doc(1, 1.0, 0.05), doc(2, 0.05, 1.0)).mkString("\n")
      .getBytes(StandardCharsets.UTF_8)): Unit
    val src = spark.readStream
      .schema("id LONG, vec ARRAY<DOUBLE>").json(in)
    val q = StreamIngest.semanticDedupStream(src, "id", "vec", idx,
      marks, ckpt, threshold = 0.95)
    try {
      q.processAllAvailable()
      // batch 1: a near-copy of 1 (dup), a diagonal newcomer in
      // list 0 (novel), and 12/13: 12 is a within-batch near-dup of
      // 11 (cos ~ 0.965) AND 13 of 12 -- the earlier-sibling chain
      Files.write(Paths.get(in, "b1.json"), Seq(
        doc(10, 0.99, 0.08), doc(11, 0.75, 0.66),
        doc(12, 0.9, 0.44), doc(13, 0.89, 0.45)).mkString("\n")
        .getBytes(StandardCharsets.UTF_8)): Unit
      q.processAllAvailable()
    } finally q.stop()
    val m = spark.read.parquet(marks).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Boolean]("is_dup")).toMap
    assert(m === Map(1L -> false, 2L -> false, 10L -> true,
      11L -> false, 12L -> true, 13L -> true), m.toString)
    // the index holds exactly the canonicals — and SERVES them
    val index = StreamIngest.readIvfIndex(spark, idx)
    assert(index.select("vec_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 11L))
    val served = StreamIngest.ivfIndexTopK(spark,
      Seq((100L, Seq(1.0, 0.0))).toDF("id", "vec"), "id", "vec",
      idx, 2).select("neighbor_id").collect()
      .map(_.getLong(0)).toSet
    assert(served === Set(1L, 11L), served.toString)
    // batch-mode differential: the same increments through
    // semanticDedupIngest give the SAME batch-1 decisions
    val stored = Seq((1L, 0L, Seq(1.0, 0.05)), (2L, 1L, Seq(0.05, 1.0)))
      .toDF("vec_id", "list", "vec")
    val b1 = Seq((10L, Seq(0.99, 0.08)), (11L, Seq(0.75, 0.66)),
      (12L, Seq(0.9, 0.44)), (13L, Seq(0.89, 0.45))).toDF("id", "vec")
    val (bm, _) = graft.operators.Similarity.semanticDedupIngest(
      b1, "id", "vec", stored, anchors, threshold = 0.95)
    assert(bm.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      === m.filter(_._1 >= 10L))
    // replay (foreachBatch at-least-once): same batchId, same result
    StreamIngest.semanticIngestBatch(b1.withColumnRenamed("id", "vid")
      .select(col("vid").as("id"), col("vec")), "id", "vec", idx,
      marks, 1L, threshold = 0.95)
    val m2 = spark.read.parquet(marks).filter(col("batch") === 1)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Boolean]("is_dup")).toMap
    assert(m2 === m.filter(_._1 >= 10L), m2.toString)
    assert(StreamIngest.readIvfIndex(spark, idx)
      .select("vec_id").collect().map(_.getLong(0)).toSet
      === Set(1L, 2L, 11L))
  }

  test("compaction cadence (r16): a LIVE ingest stream grows hot " +
    "batch dirs; the tick-side policy folds past the threshold " +
    "(below it: no-op), and served dedup decisions are identical " +
    "before and after the fold") {
    import spark.implicits._
    val in = Files.createTempDirectory("graft_cad_in").toString
    val idx = Files.createTempDirectory("graft_cad_idx").toString
    val marks = Files.createTempDirectory("graft_cad_mk").toString
    val ckpt = Files.createTempDirectory("graft_cad_ck").toString
    def doc(id: Long, text: String) =
      s"""{"id": $id, "text": "$text"}"""
    val src = spark.readStream
      .schema("id LONG, text STRING").json(in)
    val q = StreamIngest.lshIndexIngestStream(src, "id", "text",
      idx, marks, ckpt)
    try {
      for (b <- 0 until 3) {
        Files.write(Paths.get(in, s"b$b.json"), Seq(
          doc(10L * b + 1, s"unique batch $b words alpha$b beta$b"),
          doc(10L * b + 2, s"other batch $b words gamma$b delta$b"))
          .mkString("\n").getBytes(StandardCharsets.UTF_8)): Unit
        q.processAllAvailable()
      }
    } finally q.stop()
    def hotDirs = Option(new java.io.File(s"$idx/bands").listFiles())
      .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
    assert(hotDirs == 3)
    // served decision BEFORE the fold: a dup of batch 0's doc
    val probe = Seq(100L -> "unique batch 0 words alpha0 beta0")
      .toDF("id", "text")
    def decide(): Map[Long, Boolean] = {
      val sigs = graft.operators.Dedup.minhashSignatures(
        probe, "id", "text", 8, 3)
      val (sb, ss) = StreamIngest.readLshIndex(spark, idx)
      graft.operators.Dedup.lshIndexIngest(sigs, sb, ss, 4, 8, 4)._1
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    }
    val before = decide()
    assert(before === Map(100L -> true))
    // below threshold: no-op (the stream is quiesced — the contract)
    assert(!StreamIngest.maybeCompactLshIndex(spark, idx,
      maxHotBatches = 3))
    assert(hotDirs == 3)
    // past threshold: the tick folds, hot tail clears, decisions hold
    assert(StreamIngest.maybeCompactLshIndex(spark, idx,
      maxHotBatches = 2))
    assert(hotDirs == 0)
    assert(new java.io.File(s"$idx/bands_epoch").exists())
    assert(decide() === before)
    // maintainIndexes detects the face from the layout alone
    assert(StreamIngest.maintainIndexes(spark, Seq(idx),
      maxHotBatches = 2) === Seq(idx -> false)) // freshly folded
  }

  test("IVF index retention (r16): the expiry fold drops expired " +
    "vec_ids and the served top-k ranks only survivors") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ivfex_idx").toString
    StreamIngest.ivfIndexInit(spark, idx, Seq(
      0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))
    val corpus = Seq((1L, Seq(0.9, 0.1)), (2L, Seq(0.8, 0.2)),
      (3L, Seq(0.7, 0.3)), (4L, Seq(0.1, 0.9))).toDF("id", "vec")
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    // vec 2 expires
    assert(StreamIngest.compactIvfIndex(spark, idx,
      liveIds = Some(Seq(1L, 3L, 4L).toDF("vec_id"))) == 3L)
    val queries = Seq((100L, Seq(0.95, 0.05))).toDF("id", "vec")
    val got = StreamIngest.ivfIndexTopK(spark, queries, "id", "vec",
      idx, 5).select("neighbor_id").collect()
      .map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L), got.toString) // list-0 survivors only
  }

  test("multi-probe index serve (r16): nProbe=2 recalls a cross-list " +
    "true neighbor nProbe=1 misses; nProbe=nlist equals brute-force " +
    "over the stored index (exhaustive differential); the serve stays " +
    "deterministic end to end") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_mp_idx").toString
    // anchors 45 degrees apart on the circle: a query BETWEEN lists
    // has near neighbors in its second-best list too
    StreamIngest.ivfIndexInit(spark, idx, Seq(
      0 -> Array(1.0, 0.0), 1 -> Array(math.sqrt(0.5), math.sqrt(0.5)),
      2 -> Array(0.0, 1.0)))
    def v(a: Double) = Seq(math.cos(a), math.sin(a))
    val corpus = Seq(
      (1L, v(0.05)), (2L, v(0.30)),          // list 0
      (3L, v(0.55)), (4L, v(0.80)),          // list 1
      (5L, v(1.35)), (6L, v(1.50)))          // list 2
      .toDF("id", "vec")
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.compactIvfIndex(spark, idx)
    // query at 0.35 rad: best list 1 wait -- assignment picks its own
    // best anchor; its TRUE 2-NN straddle the list-0/list-1 boundary
    val q = Seq((100L, v(0.40))).toDF("id", "vec")
    def serve(nProbe: Int) = StreamIngest.ivfIndexTopK(spark, q,
      "id", "vec", idx, 2, nProbe)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    val one = serve(1)
    val two = serve(2)
    // true 2-NN of 0.40 are 2 (0.30) and 3 (0.55) -- different lists;
    // nProbe=1 can only see ONE list's side, nProbe=2 sees both
    assert(two === Set(2L, 3L), two.toString)
    assert(one !== two, s"nProbe=1 $one should miss a cross-list NN")
    // exhaustive differential: nProbe = nlist == brute force over the
    // stored index (same rounded ranking, same exclusions)
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine_r"))).toSet
    val all = asRows(StreamIngest.ivfIndexTopK(spark, q, "id", "vec",
      idx, 4, nProbe = 3))
    val brute = asRows(graft.operators.Similarity.bruteForceTopK(
      q.toDF("vec_id", "embedding"),
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", 4))
    assert(all === brute, s"$all vs $brute")
  }

  test("PQ/codes face of the persistent IVF index (r17): the index " +
    "stores codes only (no raw vectors), the IVFADC serve re-ranks " +
    "against the corpus frame, the exhaustive corner equals brute " +
    "force before AND after compaction, and nProbe=1 stays within " +
    "the probed list") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_pq_idx").toString
    StreamIngest.ivfIndexInit(spark, idx, Seq(
      0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))
    def v(a: Double) = Seq(math.cos(a), math.sin(a))
    val corpus = Seq(
      (1L, v(0.05)), (2L, v(0.30)), (3L, v(0.55)),
      (4L, v(1.00)), (5L, v(1.30)), (6L, v(1.50)),
      (7L, v(0.70)), (8L, v(1.15))).toDF("id", "vec")
    StreamIngest.pqBooksInit(spark, idx,
      graft.operators.Similarity.trainPqBooks(corpus, "id", "vec",
        numSub = 2, ksub = 4, iters = 5, sampleN = 8))
    assert(StreamIngest.readPqBooks(spark, idx).length == 2)
    StreamIngest.ivfPqIngestBatch(corpus, "id", "vec", idx, 0L)
    // the codes face must never store a raw vector
    val hotCols = spark.read
      .parquet(s"$idx/codes/batch=0").columns.toSet
    assert(hotCols === Set("vec_id", "list", "codes"), hotCols)
    val q = Seq((100L, v(0.40)), (101L, v(1.20))).toDF("id", "vec")
    def asRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine_r"))).toSet
    val brute = asRows(graft.operators.Similarity.bruteForceTopK(
      q.toDF("vec_id", "embedding"),
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding", 3))
    def degenerate() = asRows(StreamIngest.ivfPqIndexTopK(spark, q,
      "id", "vec", idx, corpus, k = 3, nProbe = 2, refine = 100))
    // hot-tier serve (pre-compaction)
    assert(degenerate() === brute)
    // fold into the list= epoch; same answers from the pruned serve
    assert(StreamIngest.compactIvfIndex(spark, idx) == 8L)
    assert(degenerate() === brute)
    // nProbe=1 ranks only within each query's own best list
    val one = StreamIngest.ivfPqIndexTopK(spark, q, "id", "vec", idx,
      corpus, k = 8, nProbe = 1, refine = 100)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    // query 100 (0.40 rad) assigns to list 0 = {1,2,3,7}; query 101
    // (1.20 rad) to list 1 = {4,5,6,8}
    assert(one === Set(100L -> 1L, 100L -> 2L, 100L -> 3L,
      100L -> 7L, 101L -> 4L, 101L -> 5L, 101L -> 6L, 101L -> 8L),
      one.toString)
  }

  test("LSM-tiered epoch (r17): a fold with a small hot tail leaves " +
    "the big bottom segment UNTOUCHED (O(hot), not O(store)); " +
    "same-size segments merge geometrically; contents and dedup " +
    "decisions are identical throughout") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_lsm_idx").toString
    val marks = Files.createTempDirectory("graft_lsm_mk").toString
    def batchDf(rows: (Long, String)*) = rows.toDF("id", "text")
    def segNames = StreamIngest
      .readLayout(spark, s"$idx/bands_epoch").toSeq
      .flatMap(_.segs.map(s => (s.name, s.bytes)))
    // a BIG bottom segment (big enough that parquet's per-file
    // metadata floor can't bring a one-doc tail within the merge
    // ratio of it): 300 docs folded once
    val store = (1L to 300L).map(i =>
      (i, s"stored document $i alpha$i beta$i gamma$i delta$i"))
    StreamIngest.lshIngestBatch(batchDf(store: _*), "id", "text",
      idx, marks, 0L, 8, 4, 3, 4)
    StreamIngest.compactLshIndex(spark, idx)
    val bottom = segNames
    assert(bottom.length == 1, bottom.toString)
    def allIds = StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    val idsAfterBottom = allIds
    // ONE tiny hot batch folds -> a NEW small segment; the bottom
    // segment survives BY NAME with IDENTICAL bytes (never re-read,
    // never rewritten — the r16 weak was rewriting it every fold)
    StreamIngest.lshIngestBatch(
      batchDf(1001L -> "tiny novel tail document epsilon zeta eta"),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    StreamIngest.compactLshIndex(spark, idx)
    val twoTiers = segNames
    assert(twoTiers.length == 2 && twoTiers.head == bottom.head,
      s"bottom segment must be untouched: $bottom -> $twoTiers")
    assert(allIds === idsAfterBottom + 1001L)
    // similar-size tails MERGE (the log policy) instead of accreting
    // unbounded segments: fold several more tiny batches — the stack
    // never exceeds bottom + O(log) small segments, and the newest
    // two always satisfy the geometric invariant
    for (b <- 2L to 6L) {
      StreamIngest.lshIngestBatch(
        batchDf((1000L + b) -> s"tail doc $b theta$b iota$b kappa$b"),
        "id", "text", idx, marks, b, 8, 4, 3, 4)
      StreamIngest.compactLshIndex(spark, idx)
      val segs = segNames
      assert(segs.head == bottom.head, s"bottom rewritten: $segs")
      assert(segs.length <= 4, s"stack must stay logarithmic: $segs")
    }
    assert(allIds === idsAfterBottom ++ (1001L to 1006L).toSet)
    // and the probe still dedups against every tier
    StreamIngest.lshIngestBatch(
      batchDf(2000L -> "stored document 7 alpha7 beta7 gamma7 delta7",
        2001L -> "tiny novel tail document epsilon zeta eta",
        2002L -> "fresh unseen content nothing matches this"),
      "id", "text", idx, marks, 7L, 8, 4, 3, 4)
    val m = spark.read.parquet(marks).filter(col("batch") === 7)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup"))
      .toMap
    assert(m === Map(2000L -> true, 2001L -> true, 2002L -> false), m)
  }

  test("single-writer gate (r17): an _inflight_ marker (a batch that " +
    "failed mid-write) stops the fold at the stalled batch — its " +
    "rows never reach the epoch, the watermark never passes it, and " +
    "the successful retry clears the stall so the next fold " +
    "proceeds") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_gate_idx").toString
    val marks = Files.createTempDirectory("graft_gate_mk").toString
    def batchDf(rows: (Long, String)*) = rows.toDF("id", "text")
    StreamIngest.lshIngestBatch(
      batchDf(1L -> "alpha beta gamma delta epsilon"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    // batch 1 "fails mid-write": its bands/sigs landed but the marks
    // write didn't — simulated as the on-disk state such a failure
    // leaves: batch=1 dirs present AND the _inflight_1 marker present
    StreamIngest.lshIngestBatch(
      batchDf(10L -> "novel words entirely fresh content"),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    val markerPath = java.nio.file.Paths.get(idx, "_inflight_1")
    java.nio.file.Files.createFile(markerPath): Unit
    // batch 2 succeeds after the stall
    StreamIngest.lshIngestBatch(
      batchDf(20L -> "another later acknowledged batch text"),
      "id", "text", idx, marks, 2L, 8, 4, 3, 4)
    // the fold must stop BELOW batch 1: folding batch 2 past the
    // stall would advance the watermark over it and make the retry's
    // rewritten batch=1 dir invisible to every reader
    StreamIngest.compactLshIndex(spark, idx)
    val l1 = StreamIngest.readLayout(spark, s"$idx/bands_epoch").get
    assert(l1.wm == 0L, s"fold passed an in-flight batch: $l1")
    assert(new java.io.File(s"$idx/bands/batch=1").exists())
    assert(new java.io.File(s"$idx/bands/batch=2").exists())
    // every reader still sees all three batches exactly once
    assert(StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect().map(_.getLong(0)).toSet
      === Set(1L, 10L, 20L))
    // the retry rewrites batch 1 whole and clears the marker; the
    // next fold folds everything
    StreamIngest.lshIngestBatch(
      batchDf(10L -> "novel words entirely fresh content"),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    assert(!java.nio.file.Files.exists(markerPath),
      "successful retry must clear its in-flight marker")
    StreamIngest.compactLshIndex(spark, idx)
    val l2 = StreamIngest.readLayout(spark, s"$idx/bands_epoch").get
    assert(l2.wm == 2L, l2.toString)
    assert(StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect().map(_.getLong(0)).toSet
      === Set(1L, 10L, 20L))
  }

  test("empty expiry fold (r17): retention that drops EVERY row " +
    "commits an empty epoch (no crash on the empty write), clears " +
    "the hot tail, and the index restarts cleanly from the next " +
    "ingest") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_empty_idx").toString
    val marks = Files.createTempDirectory("graft_empty_mk").toString
    def batchDf(rows: (Long, String)*) = rows.toDF("id", "text")
    StreamIngest.lshIngestBatch(
      batchDf(1L -> "alpha beta gamma delta epsilon",
        2L -> "one two three four five"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    // liveIds disjoint from the index: everything expires — r16 threw
    // 'Unable to infer schema' reading back the fileless empty epoch
    val (nb, ns) = StreamIngest.compactLshIndex(spark, idx,
      liveIds = Some(Seq(999L).toDF("id")))
    assert(nb == 0L && ns == 0L, s"($nb, $ns)")
    val (b, sg) = StreamIngest.readLshIndex(spark, idx)
    assert(b.count() == 0L && sg.count() == 0L)
    val hotLeft = Option(new java.io.File(s"$idx/bands").listFiles())
      .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
    assert(hotLeft == 0, s"$hotLeft hot dirs after the empty fold")
    // the next copy of an expired canonical is the new canonical
    StreamIngest.lshIngestBatch(
      batchDf(30L -> "alpha beta gamma delta epsilon"),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    val m = spark.read.parquet(marks).filter(col("batch") === 1)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_dup"))
      .toMap
    assert(m === Map(30L -> false), m.toString)
    // and a fold AFTER the restart works (wm advances past the void)
    StreamIngest.compactLshIndex(spark, idx)
    assert(StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect().map(_.getLong(0)).toSet
      === Set(30L))
  }

  test("manifest crash recovery (r17): a crash between the manifest " +
    "delete and the tmp rename leaves only _layout.tmp — readers " +
    "recover it as the committed state (no silent empty-index " +
    "window; the r16 two-rename epoch swap had an unrecoverable " +
    "gap)") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_rec_idx").toString
    val marks = Files.createTempDirectory("graft_rec_mk").toString
    StreamIngest.lshIngestBatch(
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    StreamIngest.compactLshIndex(spark, idx)
    val layout = java.nio.file.Paths.get(idx, "bands_epoch", "_layout")
    val tmp = java.nio.file.Paths.get(idx, "bands_epoch", "_layout.tmp")
    // simulate the crash window: the new manifest was fully written
    // as tmp, the old was deleted, the rename never ran
    java.nio.file.Files.move(layout, tmp): Unit
    val recovered = StreamIngest
      .readLayout(spark, s"$idx/bands_epoch")
    assert(recovered.exists(_.wm == 0L), recovered.toString)
    assert(java.nio.file.Files.exists(layout) &&
      !java.nio.file.Files.exists(tmp),
      "recovery must promote the tmp manifest")
    assert(StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect().map(_.getLong(0)).toSet
      === Set(1L))
  }

  test("manifest format-version gate (r20): a manifest NEWER than " +
    "this binary refuses loudly instead of misparsing (the r18→r19 " +
    "retired-stamp change showed silent downgrade misparses weaken " +
    "the grace and id-reuse guards); current and key-less manifests " +
    "read fine") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ver_idx").toString
    val marks = Files.createTempDirectory("graft_ver_mk").toString
    StreamIngest.lshIngestBatch(
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    StreamIngest.compactLshIndex(spark, idx)
    val layout = java.nio.file.Paths.get(idx, "bands_epoch", "_layout")
    val txt = new String(java.nio.file.Files.readAllBytes(layout),
      "UTF-8")
    assert(txt.startsWith("manifest=3\n"),
      s"this binary must stamp its format version: $txt")
    // out-of-band rewrites must drop the local-FS checksum sidecar
    def rewrite(body: String): Unit = {
      java.nio.file.Files.write(layout, body.getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(
        layout.resolveSibling("._layout.crc")): Unit
    }
    // current version reads
    assert(StreamIngest.readLayout(spark, s"$idx/bands_epoch").nonEmpty)
    // a key-less (pre-r20) manifest reads — the key is opt-in history
    rewrite(txt.stripPrefix("manifest=3\n"))
    assert(StreamIngest.readLayout(spark, s"$idx/bands_epoch").nonEmpty)
    // a NEWER version refuses loudly
    rewrite("manifest=99\n" + txt.stripPrefix("manifest=3\n"))
    val e = intercept[IllegalArgumentException] {
      StreamIngest.readLayout(spark, s"$idx/bands_epoch")
    }
    assert(e.getMessage.contains("format v99"), e.getMessage)
  }

  test("tombstone retention (r18): an expiry fold writes O(expired) " +
    "tombstones instead of rewriting the store — data segments stay " +
    "byte-identical on disk, reads suppress expired ids, an id " +
    "re-added AFTER the tombstone is NOT suppressed (covers " +
    "scoping), and the next geometric merge drops the dead rows " +
    "physically and retires the spent tombstone") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_tomb_idx").toString
    val marks = Files.createTempDirectory("graft_tomb_mk").toString
    def batchDf(rows: (Long, String)*) = rows.toDF("id", "text")
    StreamIngest.lshIngestBatch(batchDf(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    StreamIngest.compactLshIndex(spark, idx)
    def segState(seg: String) = Option(new java.io.File(
      s"$idx/bands_epoch/$seg").listFiles()).toSeq.flatten
      .flatMap(d => Option(d.listFiles()).toSeq.flatten)
      .map(f => (f.getName, f.lastModified(), f.length())).toSet
    val seg1Before = segState("seg_1")
    assert(seg1Before.nonEmpty)
    // expiry: id 1 dies — O(expired) tombstone, NOT a store rewrite
    val (nb, ns) = StreamIngest.compactLshIndex(spark, idx,
      liveIds = Some(Seq(2L).toDF("id")))
    assert(nb == 4L && ns == 1L, s"live rows after expiry: ($nb, $ns)")
    val l1 = StreamIngest.readLayout(spark, s"$idx/bands_epoch").get
    assert(l1.tombs.map(t => (t.rows, t.covers)) === Seq((1L, 1L)),
      l1.toString)
    assert(l1.segs.map(_.name) === Seq("seg_1"), l1.toString)
    assert(l1.segs.head.rows == 8L, "physical rows untouched")
    assert(segState("seg_1") === seg1Before,
      "expiry must not rewrite the data segment")
    // reads suppress the expired id everywhere
    val (b1, s1) = StreamIngest.readLshIndex(spark, idx)
    assert(b1.select("id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(2L))
    assert(s1.select("id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(2L))
    // the stats frame sees the tombstone
    val st = StreamIngest.indexStats(spark, Seq(idx)).collect()
      .find(_.getString(1) == "bands").get
    assert(st.getInt(st.fieldIndex("tombstones")) == 1)
    assert(st.getLong(st.fieldIndex("tomb_rows")) == 1L)
    // id 1 re-added with NEW content: younger than the tombstone's
    // coverage, so it must NOT be suppressed (the successor rule
    // extends to id re-use) — visible from the hot tail...
    StreamIngest.lshIngestBatch(batchDf(
      1L -> "fresh successor content entirely new",
      3L -> "nine ten eleven twelve thirteen"),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    assert(StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
    // ...and after the fold: similar segment sizes force the
    // geometric merge, which drops the dead rows PHYSICALLY and
    // retires the spent tombstone
    StreamIngest.compactLshIndex(spark, idx)
    val l2 = StreamIngest.readLayout(spark, s"$idx/bands_epoch").get
    assert(l2.tombs.isEmpty,
      s"merged-away coverage must retire the tombstone: $l2")
    assert(l2.segs.map(_.rows).sum == 12L,
      s"dead rows must be physically gone: $l2")
    assert(StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect()
      .map(_.getLong(0)).toSet === Set(1L, 2L, 3L))
  }

  test("LSM merge policy under adversarial shapes (r18): many tiny " +
    "batches keep the stack logarithmic (cascades run), a giant " +
    "batch lands cleanly, expiry interleaves without breaking " +
    "either, and a kill mid-cascade (orphan segment dirs) never " +
    "changes a read and is cleaned by the next fold's commit") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_casc_idx").toString
    val marks = Files.createTempDirectory("graft_casc_mk").toString
    def doc(id: Long) = (id,
      (1 to 8).map(k => s"w${id}_$k").mkString(" "))
    var batch = 0L
    def ingest(ids: Seq[Long]): Unit = {
      StreamIngest.lshIngestBatch(ids.map(doc).toDF("id", "text"),
        "id", "text", idx, marks, batch, 8, 4, 3, 4)
      batch += 1
    }
    // 12 tiny batches, folding after each: the stack must stay
    // logarithmic in fold count, never one segment per batch
    (0 until 12).foreach { k =>
      ingest((k * 3 until (k + 1) * 3).map(_.toLong))
      StreamIngest.compactLshIndex(spark, idx)
      val l = StreamIngest.readLayout(spark, s"$idx/bands_epoch").get
      val bound = math.ceil(math.log(k + 2.0) / math.log(2.0)).toInt + 1
      assert(l.segs.length <= bound,
        s"fold $k: ${l.segs.length} segments > O(log) bound $bound")
    }
    assert(StreamIngest.readLshIndex(spark, idx)._1.count() == 144L)
    // giant batch: 3x everything so far in ONE micro-batch
    ingest((100L until 208L))
    StreamIngest.compactLshIndex(spark, idx)
    assert(StreamIngest.readLshIndex(spark, idx)._1.count() == 576L)
    // interleaved expiry (every id % 3 == 0 dies) over the stack
    val live = ((0L until 36L) ++ (100L until 208L))
      .filter(_ % 3 != 0)
    StreamIngest.compactLshIndex(spark, idx,
      liveIds = Some(live.toDF("id")))
    def liveIdSet = StreamIngest.readLshIndex(spark, idx)._1
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(liveIdSet === live.toSet)
    assert(StreamIngest.readLshIndex(spark, idx)._1.count() ==
      live.length * 4L)
    // kill mid-cascade: a crashed cascade leaves fully-written but
    // UNCOMMITTED segment dirs — readers must ignore them and the
    // next fold's commit must clean them
    Seq(1L, 2L).toDF("id")
      .write.parquet(s"$idx/bands_epoch/seg_999")
    assert(liveIdSet === live.toSet,
      "an uncommitted segment must be invisible")
    ingest(Seq(300L, 301L))
    StreamIngest.compactLshIndex(spark, idx)
    assert(!new java.io.File(s"$idx/bands_epoch/seg_999").exists(),
      "the next commit must clear crashed-cascade garbage")
    assert(liveIdSet === live.toSet ++ Set(300L, 301L))
  }

  // ---- codebook drift repair (r18) ---------------------------------

  /** Drift fixture: two clean clusters that BOTH assign to list 0
    * under the stale 2-anchor codebook ([1,0] / [0,1]) — cluster A
    * hugs [1, 0], cluster B hugs [0.8, 0.6] (cos 0.8 vs 0.6 against
    * the stale anchors → list 0 for all) — so the stored index is
    * maximally skewed (skew = 2.0) and a k=2 re-train must separate
    * them (balanced lists, skew 1.0). */
  private def driftCorpus = {
    import spark.implicits._
    val a = (0 until 7).map(i => (10L + i, Seq(1.0, 0.01 * i)))
    val b = (0 until 7).map(i => (20L + i, Seq(0.8, 0.6 + 0.01 * i)))
    (a ++ b).toDF("id", "vec")
  }

  private def staleAnchors =
    Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))

  private def asTopkRows(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "neighbor_id", "cosine_r")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet

  test("codebook drift repair on the tick (r18, r19 per-list): a " +
    "skewed stream crosses the index-max-skew threshold, " +
    "maintainIndexes runs the INCREMENTAL repair (splitIvfLists: " +
    "sub-centroids for the skewed list only, delta segments + " +
    "ltombs, starved-anchor pruning, per-face versioned manifests), " +
    "lists come out balanced, and BOTH faces' serves still equal " +
    "brute force across the swap") {
    val idx = Files.createTempDirectory("graft_drift_idx").toString
    val corpus = driftCorpus
    StreamIngest.ivfIndexInit(spark, idx, staleAnchors)
    StreamIngest.pqBooksInit(spark, idx,
      graft.operators.Similarity.trainPqBooks(corpus, "id", "vec",
        numSub = 2, ksub = 4))
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.ivfPqIngestBatch(corpus, "id", "vec", idx, 1L)
    assert(StreamIngest.compactIvfIndex(spark, idx) == 28L)
    // every vector crowded into list 0 under the stale codebook
    val skew0 = StreamIngest.ivfListSkew(spark, idx)
    assert(skew0 > 1.9, s"fixture must be skewed, got $skew0")
    // below the threshold: the tick does NOT re-cluster
    assert(StreamIngest.maintainIndexes(spark, Seq(idx),
      maxHotBatches = 8, maxSkew = 2.5).forall(!_._2))
    assert(StreamIngest.ivfListSkew(spark, idx) == skew0)
    // above it: the tick re-clusters
    val ticked = StreamIngest.maintainIndexes(spark, Seq(idx),
      maxHotBatches = 8, maxSkew = 1.5)
    assert(ticked.forall(_._2), ticked.toString)
    // lists balanced: the two real clusters separated (skew 1.0)
    val skew1 = StreamIngest.ivfListSkew(spark, idx)
    assert(skew1 < 1.2, s"re-cluster must balance lists, got $skew1")
    // BOTH faces committed the same versioned codebook
    for (face <- Seq("assign", "codes")) {
      val l = StreamIngest.readLayout(spark, s"$idx/${face}_epoch")
      assert(l.flatMap(_.codebook)
        === Some("centroids_v2.parquet"), s"$face: $l")
    }
    // serves across the swap still equal brute force at the
    // degenerate-exact corner (nProbe = nlist = 2, shortlist ≥ all)
    val queries = corpus.filter(col("id").isin(10L, 20L, 15L))
    val brute = asTopkRows(graft.operators.Similarity
      .bruteForceTopK(queries, corpus, "id", "vec", 3))
    assert(brute.nonEmpty)
    assert(asTopkRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx, 3, nProbe = 2)) === brute, "assign serve")
    assert(asTopkRows(StreamIngest.ivfPqIndexTopK(spark, queries,
      "id", "vec", idx, corpus, 3, nProbe = 2, refine = 10))
      === brute, "codes serve")
    // a re-cluster with NO codes face also works (assign-only root)
    val idx2 = Files.createTempDirectory("graft_drift2_idx").toString
    StreamIngest.ivfIndexInit(spark, idx2, staleAnchors)
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx2, 0L)
    StreamIngest.compactIvfIndex(spark, idx2): Unit
    assert(StreamIngest.reclusterIvfIndex(spark, idx2))
    assert(asTopkRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx2, 3, nProbe = 2)) === brute)
  }

  test("index observability (r18): indexStats reports per-tier " +
    "manifest state, hot depth, and live _inflight_ stalls; a " +
    "stalled root past the cadence threshold WARNS on the tick " +
    "instead of silently re-skipping forever") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_obs_idx").toString
    val marks = Files.createTempDirectory("graft_obs_mk").toString
    StreamIngest.lshIngestBatch(
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("id", "text"),
      "id", "text", idx, marks, 0L, 8, 4, 3, 4)
    StreamIngest.compactLshIndex(spark, idx): Unit
    StreamIngest.lshIngestBatch(
      Seq((2L, "one two three four five")).toDF("id", "text"),
      "id", "text", idx, marks, 1L, 8, 4, 3, 4)
    val st = StreamIngest.indexStats(spark, Seq(idx))
      .collect().map(r => r.getString(1) -> r).toMap
    assert(st.keySet === Set("bands", "sigs"), st.keySet.toString)
    val b = st("bands")
    assert(b.getLong(b.fieldIndex("wm")) == 0L)
    assert(b.getInt(b.fieldIndex("segments")) == 1)
    assert(b.getLong(b.fieldIndex("seg_rows")) == 4L) // 4 bands/doc
    assert(b.getLong(b.fieldIndex("seg_bytes")) > 0L)
    assert(b.getInt(b.fieldIndex("hot_batches")) == 1)
    assert(b.getLong(b.fieldIndex("hot_rows")) == 4L)
    assert(b.getInt(b.fieldIndex("inflight")) == 0)
    assert(b.isNullAt(b.fieldIndex("codebook")), "LSH tier: no book")
    assert(b.isNullAt(b.fieldIndex("list_skew")))
    // an abandoned stream's marker (written, never cleared) stalls
    // the fold at batch 1 — the stats surface it with an age
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(idx, "_inflight_1")): Unit
    val st2 = StreamIngest.indexStats(spark, Seq(idx)).collect()
    assert(st2.forall(r => r.getInt(r.fieldIndex("inflight")) == 1))
    assert(st2.forall(r =>
      r.getLong(r.fieldIndex("oldest_inflight_ms")) >= 0L))
    // the tick refuses to fold past the marker AND warns once the
    // hot tail has outgrown the cadence threshold
    val buf = new java.io.ByteArrayOutputStream()
    val old = System.err
    System.setErr(new java.io.PrintStream(buf, true, "UTF-8"))
    try StreamIngest.maintainIndexes(spark, Seq(idx),
      maxHotBatches = 0): Unit
    finally System.setErr(old)
    val warned = buf.toString("UTF-8")
    assert(warned.contains("stalling compaction") &&
      warned.contains(idx), warned)
    assert(StreamIngest.indexStats(spark, Seq(idx)).collect()
      .find(_.getString(1) == "bands")
      .exists(r => r.getInt(r.fieldIndex("hot_batches")) == 1))
    // marker cleared (operator action) -> the next tick folds
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(idx, "_inflight_1"))
    StreamIngest.maintainIndexes(spark, Seq(idx),
      maxHotBatches = 0): Unit
    val b3 = StreamIngest.indexStats(spark, Seq(idx)).collect()
      .find(_.getString(1) == "bands").get
    assert(b3.getLong(b3.fieldIndex("wm")) == 1L)
    assert(b3.getInt(b3.fieldIndex("hot_batches")) == 0)
    assert(b3.getLong(b3.fieldIndex("seg_rows")) == 8L)
  }

  test("re-cluster kill between the two face commits (r18): the " +
    "codes face lands on the new codebook, the assign face stays on " +
    "the old — BOTH serves stay correct (per-face codebook " +
    "resolution pairs each face's rows with its own anchors), a new " +
    "codes ingest labels against the CODES manifest's anchors, and " +
    "the next re-cluster converges the versions") {
    val idx = Files.createTempDirectory("graft_kill_idx").toString
    val corpus = driftCorpus
    StreamIngest.ivfIndexInit(spark, idx, staleAnchors)
    StreamIngest.pqBooksInit(spark, idx,
      graft.operators.Similarity.trainPqBooks(corpus, "id", "vec",
        numSub = 2, ksub = 4))
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.ivfPqIngestBatch(corpus, "id", "vec", idx, 1L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    StreamIngest.reclusterCrashBeforeAssignCommit = true
    try intercept[RuntimeException] {
      StreamIngest.reclusterIvfIndex(spark, idx)
    } finally StreamIngest.reclusterCrashBeforeAssignCommit = false
    // the crash window: faces one codebook version apart...
    assert(StreamIngest.readLayout(spark, s"$idx/codes_epoch")
      .flatMap(_.codebook) === Some("centroids_v2.parquet"))
    assert(StreamIngest.readLayout(spark, s"$idx/assign_epoch")
      .flatMap(_.codebook) === None, "assign must still be stale")
    // ...but each self-consistent: both serves still equal brute
    // force (the r17 shape resolved the codes face through the
    // ASSIGN manifest and served wrong pruned answers here)
    val queries = corpus.filter(col("id").isin(10L, 20L, 15L))
    val brute = asTopkRows(graft.operators.Similarity
      .bruteForceTopK(queries, corpus, "id", "vec", 3))
    assert(asTopkRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx, 3, nProbe = 2)) === brute,
      "assign serve in the crash window")
    assert(asTopkRows(StreamIngest.ivfPqIndexTopK(spark, queries,
      "id", "vec", idx, corpus, 3, nProbe = 2, refine = 10))
      === brute, "codes serve in the crash window")
    // a NEW codes ingest inside the window labels with the CODES
    // manifest's (new) anchors, keeping the face self-consistent
    import spark.implicits._
    val late = Seq((30L, Seq(0.81, 0.59))).toDF("id", "vec")
    StreamIngest.ivfPqIngestBatch(late, "id", "vec", idx, 2L)
    val v2 = StreamIngest.readIvfCentroidsFace(spark, idx, "codes")
    val expected = graft.operators.Similarity
      .ivfAssignFixed(late, "id", "vec", v2)
      .select("vec_id", "list").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = spark.read
      .parquet(s"$idx/codes/batch=2")
      .select("vec_id", "list").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored === expected, s"$stored vs $expected")
    // recovery: the next re-cluster converges both faces (v3) and
    // serves stay exact (corpus now includes the late row)
    assert(StreamIngest.reclusterIvfIndex(spark, idx))
    for (face <- Seq("assign", "codes"))
      assert(StreamIngest.readLayout(spark, s"$idx/${face}_epoch")
        .flatMap(_.codebook) === Some("centroids_v3.parquet"), face)
    val corpus2 = corpus.unionByName(late)
    val brute2 = asTopkRows(graft.operators.Similarity
      .bruteForceTopK(queries, corpus2, "id", "vec", 3))
    assert(asTopkRows(StreamIngest.ivfPqIndexTopK(spark, queries,
      "id", "vec", idx, corpus2, 3, nProbe = 2, refine = 10))
      === brute2, "codes serve after recovery")
  }

  test("_hist sidecars survive a re-cluster (r18): the re-assigned " +
    "segment carries a fresh sidecar labeled with the NEW lists, so " +
    "the drift trigger keeps reading O(segments) after the swap it " +
    "itself caused") {
    val idx = Files.createTempDirectory("graft_histrc_idx").toString
    val corpus = driftCorpus
    StreamIngest.ivfIndexInit(spark, idx, staleAnchors)
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    // all 14 vectors crowd list 0 under the stale codebook
    assert(StreamIngest.ivfListHistogram(spark, idx)
      === Map(0L -> 14L))
    assert(StreamIngest.reclusterIvfIndex(spark, idx))
    val l = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    for (s <- l.segs)
      assert(new java.io.File(
        s"$idx/assign_epoch/${s.name}/_hist").exists(),
        s"re-clustered segment ${s.name} must carry a sidecar")
    // sidecar answers equal a live scan AND reflect the new balance
    val hist = StreamIngest.ivfListHistogram(spark, idx)
    val brute = StreamIngest.readIvfIndex(spark, idx)
      .groupBy("list").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === brute)
    assert(hist.values.toSeq.sorted === Seq(7L, 7L),
      s"re-cluster must separate the two true clusters: $hist")
    assert(StreamIngest.ivfListSkew(spark, idx) === 1.0)
  }

  test("cross-process single-writer lease (r18): a LIVE foreign " +
    "_maint_lease fails maintenance fast, a STALE one is broken and " +
    "work proceeds, and the lease is released on success AND on " +
    "failure") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_lease_idx").toString
    val corpus = (0 until 8).map(i => (i.toLong, Seq(1.0, 0.01 * i)))
      .toDF("id", "vec")
    StreamIngest.ivfIndexInit(spark, idx,
      Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    // success path: no residue
    assert(StreamIngest.compactIvfIndex(spark, idx) == 8L)
    val lease = new java.io.File(s"$idx/_maint_lease")
    assert(!lease.exists(), "lease must be released after success")
    // a LIVE foreign lease (fresh mtime, different owner id): the
    // single-writer contract fails the op fast instead of running two
    // writers' folds interleaved
    StreamIngest.ivfIngestBatch(corpus
      .withColumn("id", col("id") + lit(100L)), "id", "vec", idx, 1L)
    java.nio.file.Files.write(lease.toPath,
      "some-other-process".getBytes("UTF-8"))
    val e = intercept[RuntimeException] {
      StreamIngest.compactIvfIndex(spark, idx)
    }
    assert(e.getMessage.contains("another process"), e.getMessage)
    assert(lease.exists() &&
      new String(java.nio.file.Files.readAllBytes(lease.toPath),
        "UTF-8") == "some-other-process",
      "a live foreign lease must never be deleted")
    // STALE foreign lease (its owner crashed): broken, work proceeds,
    // and the new owner's release leaves nothing behind
    assert(lease.setLastModified(System.currentTimeMillis() -
      StreamIngest.LeaseBreakMs - 60000L))
    assert(StreamIngest.compactIvfIndex(spark, idx) == 16L)
    assert(!lease.exists(), "broken-then-reacquired lease must be " +
      "released after the fold")
    // failure path: a poisoned manifest makes the fold throw AFTER
    // lease acquisition — the lease must still be released
    StreamIngest.ivfIngestBatch(corpus
      .withColumn("id", col("id") + lit(200L)), "id", "vec", idx, 2L)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$idx/assign_epoch/_layout"),
      "wm=notanumber\nbuckets=2\nsegs=0\n".getBytes("UTF-8"))
    intercept[Exception] {
      StreamIngest.compactIvfIndex(spark, idx)
    }
    assert(!lease.exists(), "lease must be released after a failure")
  }

  test("maintainIndexes fault isolation (r18): a poisoned root " +
    "(unparseable manifest) is logged and reported false — it does " +
    "NOT abort the tick for the healthy roots behind it") {
    import spark.implicits._
    val bad = Files.createTempDirectory("graft_badroot_idx").toString
    val good = Files.createTempDirectory("graft_goodroot_idx").toString
    // poison: a manifest whose wm= is not a number
    new java.io.File(s"$bad/assign_epoch").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$bad/assign_epoch/_layout"),
      "wm=notanumber\nbuckets=2\nsegs=0\n".getBytes("UTF-8"))
    val corpus = (0 until 8).map(i => (i.toLong, Seq(1.0, 0.01 * i)))
      .toDF("id", "vec")
    StreamIngest.ivfIndexInit(spark, good,
      Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", good, 0L)
    // bad roots FIRST in the list: a poisoned manifest AND a root
    // whose fs/probe construction itself fails (unparseable URI —
    // r19: the guard must wrap the fs construction and has() probes
    // too, not only the stage bodies) must not stop the good root
    val badUri = "hdfs://:-1/nonsense"
    val out = StreamIngest.maintainIndexes(
      spark, Seq(badUri, bad, good), maxHotBatches = 0).toMap
    assert(out(badUri) === false)
    assert(out(bad) === false)
    assert(out(good) === true, out.toString)
    assert(StreamIngest.readLayout(spark, s"$good/assign_epoch")
      .exists(_.wm == 0L), "the healthy root must have folded")
  }

  test("retirement grace (r18): a commit RETIRES the prior manifest's " +
    "merged-away segments instead of deleting them — a concurrent " +
    "reader holding that manifest can still open its files for one " +
    "fold cycle — the NEXT commit deletes them, and fresh ids never " +
    "re-use a name still on grace") {
    import spark.implicits._
    // grace age floor 0: this spec pins the fold-COUNT half of the
    // grace in isolation (the time half has its own spec below)
    val priorGrace = StreamIngest.retireGraceMs
    StreamIngest.retireGraceMs = 0L
    try {
    val idx = Files.createTempDirectory("graft_grace_idx").toString
    def batch(off: Long) = (0 until 16)
      .map(i => (off + i, Seq(1.0, 0.01 * i))).toDF("id", "vec")
    StreamIngest.ivfIndexInit(spark, idx,
      Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))
    StreamIngest.ivfIngestBatch(batch(0L), "id", "vec", idx, 0L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    val l1 = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    assert(l1.segs.map(_.name) === Seq("seg_1") && l1.retired.isEmpty)
    // a second same-sized fold cascades: seg_2 (the tail) merges with
    // seg_1 into seg_3. seg_1 was COMMITTED (a reader could hold it)
    // -> retired; seg_2 never reached any manifest (no reader could
    // ever list it) -> deleted immediately
    StreamIngest.ivfIngestBatch(batch(100L), "id", "vec", idx, 1L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    val l2 = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    assert(l2.segs.map(_.name) === Seq("seg_3"), l2.toString)
    assert(l2.retired.map(_._1) === Seq("seg_1"), l2.toString)
    assert(!new java.io.File(s"$idx/assign_epoch/seg_2").exists(),
      "a never-committed intermediate must not linger")
    for ((n, _) <- l2.retired)
      assert(new java.io.File(s"$idx/assign_epoch/$n").exists(),
        s"$n must stay on disk for the grace cycle")
    // the stale reader's view: the PRIOR manifest's segment is still
    // fully readable after the swap
    assert(spark.read.parquet(s"$idx/assign_epoch/seg_1").count()
      == 16L)
    // the next commit clears the grace generation
    StreamIngest.ivfIngestBatch(batch(200L), "id", "vec", idx, 2L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    val l3 = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    assert(!new java.io.File(s"$idx/assign_epoch/seg_1").exists(),
      "seg_1 must be deleted one commit later")
    // fresh ids cleared the retired names at every step: no live
    // segment ever re-used a name that was on grace when it was born
    assert(l3.segs.map(_.name).toSet
      .intersect(l2.retired.map(_._1).toSet).isEmpty, l3.toString)
    assert((l3.segs.map(_.name) ++ l3.retired.map(_._1))
      .distinct.length == l3.segs.length + l3.retired.length)
    } finally StreamIngest.retireGraceMs = priorGrace
  }

  test("time-bounded retirement grace (r19): under a rapid fold " +
    "cadence a retiree SURVIVES multiple commits until past the age " +
    "floor — a paused reader outlives two back-to-back folds — while " +
    "never-committed crash dirs are still deleted instantly") {
    import spark.implicits._
    val priorGrace = StreamIngest.retireGraceMs
    StreamIngest.retireGraceMs = 3000L
    try {
      val idx = Files.createTempDirectory("graft_tgrace_idx").toString
      def batch(off: Long) = (0 until 16)
        .map(i => (off + i, Seq(1.0, 0.01 * i))).toDF("id", "vec")
      StreamIngest.ivfIndexInit(spark, idx,
        Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))
      StreamIngest.ivfIngestBatch(batch(0L), "id", "vec", idx, 0L)
      StreamIngest.compactIvfIndex(spark, idx): Unit
      // two RAPID further folds: each cascades seg_1 away and then
      // re-commits — under the r18 one-fold rule the second commit
      // deleted seg_1 milliseconds after its retirement
      StreamIngest.ivfIngestBatch(batch(100L), "id", "vec", idx, 1L)
      StreamIngest.compactIvfIndex(spark, idx): Unit
      StreamIngest.ivfIngestBatch(batch(200L), "id", "vec", idx, 2L)
      StreamIngest.compactIvfIndex(spark, idx): Unit
      val l = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
      assert(l.retired.map(_._1).contains("seg_1"),
        s"young retiree must stay on grace across rapid folds: $l")
      // the paused reader's view still opens
      assert(spark.read.parquet(s"$idx/assign_epoch/seg_1").count()
        == 16L)
      // crash garbage (a dir no manifest ever referenced) is NOT
      // granted grace — same commit cleans it
      val junk = new java.io.File(s"$idx/assign_epoch/seg_999")
      junk.mkdirs()
      StreamIngest.ivfIngestBatch(batch(300L), "id", "vec", idx, 3L)
      StreamIngest.compactIvfIndex(spark, idx): Unit
      assert(!junk.exists(),
        "never-committed dirs must be cleared instantly")
      // past the age floor, the next commit finally deletes
      Thread.sleep(3200L)
      StreamIngest.ivfIngestBatch(batch(400L), "id", "vec", idx, 4L)
      StreamIngest.compactIvfIndex(spark, idx): Unit
      assert(!new java.io.File(s"$idx/assign_epoch/seg_1").exists(),
        "a retiree past both the fold and the age floor must go")
      val lf = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
      assert(!lf.retired.map(_._1).contains("seg_1"))
    } finally StreamIngest.retireGraceMs = priorGrace
  }

  test("ivfListHistogram (r18): answered from per-segment _hist " +
    "sidecars — sidecar-exact vs a live scan, hot tail rides on " +
    "top, a missing sidecar falls back to the scan, and a live " +
    "tombstone's segment counts LIVE rows only") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_hist_idx").toString
    // two real lists under the stale anchors: ids 0-9 -> list 0,
    // ids 100-105 -> list 1
    val b0 = ((0 until 10).map(i => (i.toLong, Seq(1.0, 0.01 * i))) ++
      (0 until 6).map(i => (100L + i, Seq(0.01 * i, 1.0))))
      .toDF("id", "vec")
    StreamIngest.ivfIndexInit(spark, idx, staleAnchors)
    StreamIngest.ivfIngestBatch(b0, "id", "vec", idx, 0L)
    assert(StreamIngest.compactIvfIndex(spark, idx) == 16L)
    def bruteHist = StreamIngest.readIvfIndex(spark, idx)
      .groupBy("list").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val layout0 = StreamIngest.readLayout(spark, s"$idx/assign_epoch")
      .get
    assert(layout0.segs.nonEmpty)
    for (s <- layout0.segs)
      assert(new java.io.File(
        s"$idx/assign_epoch/${s.name}/_hist").exists(),
        s"segment ${s.name} must carry a _hist sidecar")
    assert(StreamIngest.ivfListHistogram(spark, idx) === bruteHist)
    assert(bruteHist === Map(0L -> 10L, 1L -> 6L))
    // hot tail (unfolded batch) rides on top of the sidecar answers
    val b1 = (0 until 4).map(i => (200L + i, Seq(0.01 * i, 1.0)))
      .toDF("id", "vec")
    StreamIngest.ivfIngestBatch(b1, "id", "vec", idx, 1L)
    assert(StreamIngest.ivfListHistogram(spark, idx) === bruteHist)
    assert(StreamIngest.ivfListHistogram(spark, idx)(1L) == 10L)
    // a segment without a sidecar (pre-r18 store) scans instead
    for (s <- layout0.segs)
      new java.io.File(s"$idx/assign_epoch/${s.name}/_hist").delete()
    assert(StreamIngest.ivfListHistogram(spark, idx) === bruteHist)
    // fold, then expire every even id WITHOUT new hot rows: the
    // expiry is a tombstone (no segment rewrite) and the histogram
    // must count live rows only
    assert(StreamIngest.compactIvfIndex(spark, idx) == 20L)
    val live = ((0L until 10L) ++ (100L until 106L) ++
      (200L until 204L)).filter(_ % 2 == 1)
    StreamIngest.compactIvfIndex(spark, idx,
      liveIds = Some(live.toDF("id"))): Unit
    val lt = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    assert(lt.tombs.nonEmpty,
      "the expiry must have committed a live tombstone")
    assert(StreamIngest.ivfListHistogram(spark, idx) === bruteHist)
    assert(StreamIngest.ivfListHistogram(spark, idx)
      .values.sum == live.length)
  }

  // ---- per-list incremental drift repair (r19) ----------------------

  /** 20 rows crowding list 0 as two separable true clusters, 6 rows
    * honestly in list 1; anchor 2 is starved (nothing ever lands
    * there). */
  private def splitCorpus = {
    import spark.implicits._
    val c1 = (0 until 12).map(i => (10L + i, Seq(1.0, 0.01 * i)))
    val c2 = (0 until 8).map(i => (30L + i, Seq(0.85, 0.5 + 0.01 * i)))
    val b = (0 until 6).map(i => (50L + i, Seq(0.05 * i, 1.0)))
    (c1 ++ c2 ++ b).toDF("id", "vec")
  }

  private def splitAnchors = Seq(
    0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0),
    2 -> Array(-1.0, -1.0))

  test("splitIvfLists (r19): ONLY the over-threshold list is split " +
    "— its rows land in a fresh delta segment under new sub-list " +
    "ids, an ltomb suppresses the old partitions, untouched lists " +
    "keep their segments byte-for-byte, the starved anchor is " +
    "pruned, the histogram stays sidecar-exact, and both faces' " +
    "serves still equal brute force") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_split_idx").toString
    val corpus = splitCorpus
    StreamIngest.ivfIndexInit(spark, idx, splitAnchors)
    StreamIngest.pqBooksInit(spark, idx,
      graft.operators.Similarity.trainPqBooks(corpus, "id", "vec",
        numSub = 2, ksub = 4))
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.ivfPqIngestBatch(corpus, "id", "vec", idx, 1L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    val pre = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    val preHist = StreamIngest.ivfListHistogram(spark, idx)
    assert(preHist === Map(0L -> 20L, 1L -> 6L))
    val skew0 = StreamIngest.ivfListSkew(spark, idx)

    assert(StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.3))

    val post = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    // old segments survive untouched (same names AND bytes) — the
    // repair never rewrites the store
    for (s <- pre.segs)
      assert(post.segs.exists(p =>
        p.name == s.name && p.bytes == s.bytes),
        s"pre-split segment ${s.name} must survive byte-for-byte")
    assert(post.segs.length == pre.segs.length + 1,
      "exactly one delta segment")
    assert(post.ltombs.map(_.lists) === Seq(Seq(0L)),
      s"one ltomb over the split list: ${post.ltombs}")
    // codebook: list 0 split away, starved anchor 2 pruned, list 1
    // kept, two fresh sub-lists (base = 3)
    // k = ceil(20 / mean(26/3)) = 3 sub-lists at base id 3
    val cb = StreamIngest.readIvfCentroids(spark, idx).map(_._1)
    assert(cb === Seq(1, 3, 4, 5), cb.toString)
    // live rows: same vec_ids, list-1 rows bit-identical, split rows
    // relabeled into the sub-lists
    val live = StreamIngest.readIvfIndex(spark, idx)
    val brute = live.groupBy("list").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(brute(1L) == 6L)
    assert(brute.values.sum == 26L)
    val subs = brute.filter(_._1 >= 3L)
    assert(subs.values.sum == 20L,
      s"every split row must land in a sub-list: $brute")
    assert(subs.size >= 2 && subs.values.max < 20L,
      s"the crowded list must really split: $brute")
    val keptRows = live.filter(col("list") === 1L)
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(keptRows === (50L until 56L).toArray)
    // histogram: sidecar-subtraction path equals the live scan
    assert(StreamIngest.ivfListHistogram(spark, idx) === brute)
    assert(StreamIngest.ivfListSkew(spark, idx) < skew0)
    // fold return (liveTotal) is exact under live ltombs on BOTH
    // faces (assign 26 + codes 26)
    assert(StreamIngest.compactIvfIndex(spark, idx) == 52L)
    // serves at the exhaustive corner equal brute force
    val queries = corpus.filter(col("id").isin(10L, 30L, 50L))
    val bf = asTopkRows(graft.operators.Similarity
      .bruteForceTopK(queries, corpus, "id", "vec", 3))
    val nAll = cb.length
    assert(asTopkRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx, 3, nProbe = nAll)) === bf, "assign serve")
    assert(asTopkRows(StreamIngest.ivfPqIndexTopK(spark, queries,
      "id", "vec", idx, corpus, 3, nProbe = nAll, refine = 10))
      === bf, "codes serve")
    // both faces on the same fresh codebook version
    for (face <- Seq("assign", "codes"))
      assert(StreamIngest.readLayout(spark, s"$idx/${face}_epoch")
        .flatMap(_.codebook) === Some("centroids_v2.parquet"), face)
    // observability: the repair residue is visible per tier
    val st = StreamIngest.indexStats(spark, Seq(idx)).collect()
      .map(r => r.getString(1) ->
        (r.getInt(r.fieldIndex("ltombs")),
          r.getInt(r.fieldIndex("retired")))).toMap
    assert(st("assign")._1 == 1 && st("codes")._1 == 1,
      s"each face must report its live ltomb: $st")
  }

  test("splitIvfLists IO pruning (r19): the repair reads ONLY the " +
    "skewed lists' partitions — with every OTHER list's data file " +
    "corrupted on disk, the repair still succeeds (touching one of " +
    "them would throw)") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_splitio_idx").toString
    val corpus = splitCorpus
    StreamIngest.ivfIndexInit(spark, idx, splitAnchors)
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    // corrupt every parquet under list=1 in every assign segment:
    // any read of a non-skewed partition now fails loudly
    val epoch = new java.io.File(s"$idx/assign_epoch")
    val poisoned = epoch.listFiles().filter(_.isDirectory).flatMap {
      seg =>
        val l1 = new java.io.File(seg, "list=1")
        if (!l1.exists()) Array.empty[java.io.File]
        else l1.listFiles().filter(_.getName.endsWith(".parquet"))
    }
    assert(poisoned.nonEmpty, "fixture must have list=1 files")
    for (f <- poisoned)
      java.nio.file.Files.write(f.toPath,
        "not a parquet file".getBytes("UTF-8"))
    assert(StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.3),
      "repair must succeed without opening non-skewed partitions")
    // and the split lists really did move
    assert(StreamIngest.ivfListHistogram(spark, idx)
      .filterNot(_._1 == 1L).values.sum == 20L)
    // the read-side half of the same proof, pinned at the PLAN: the
    // ltomb suppression must reach the covered segment's scan as a
    // PartitionFilter (pruned at the file listing), never as a
    // post-scan row filter. (Corruption can't prove this half —
    // schema inference legitimately opens one footer per segment
    // dir — so the pin is on the physical plan, PlanSpec-style.)
    val live = StreamIngest.readIvfIndex(spark, idx)
    val plan = live.queryExecution.executedPlan.toString
    val scans = plan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("seg_1"))
      .toSeq
    assert(scans.nonEmpty, s"covered-segment scan not found:\n$plan")
    assert(scans.forall(l => l.contains("PartitionFilters") &&
      l.replaceAll(".*PartitionFilters", "").contains("list")),
      "the ltomb NOT-IN must be a PartitionFilter on the covered " +
        s"segment's scan:\n${scans.mkString("\n")}")
    // and the data really is gone from the live view
    assert(live.filter(col("list").cast("long") === 0L).count() == 0L)
  }

  test("splitIvfLists crash between the face commits (r19): codes " +
    "lands on the new codebook, assign stays stale, BOTH serves " +
    "stay correct in the window, and re-running the repair " +
    "CONVERGES the faces (deterministic sub-anchors: same ids, same " +
    "content, bumped version) with no codes row stranded") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_splitkill_idx").toString
    val corpus = splitCorpus
    StreamIngest.ivfIndexInit(spark, idx, splitAnchors)
    StreamIngest.pqBooksInit(spark, idx,
      graft.operators.Similarity.trainPqBooks(corpus, "id", "vec",
        numSub = 2, ksub = 4))
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.ivfPqIngestBatch(corpus, "id", "vec", idx, 1L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    StreamIngest.reclusterCrashBeforeAssignCommit = true
    try intercept[RuntimeException] {
      StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.3)
    } finally StreamIngest.reclusterCrashBeforeAssignCommit = false
    assert(StreamIngest.readLayout(spark, s"$idx/codes_epoch")
      .flatMap(_.codebook) === Some("centroids_v2.parquet"))
    assert(StreamIngest.readLayout(spark, s"$idx/assign_epoch")
      .flatMap(_.codebook) === None, "assign must still be stale")
    // each face self-consistent in the window
    val queries = corpus.filter(col("id").isin(10L, 30L, 50L))
    val bf = asTopkRows(graft.operators.Similarity
      .bruteForceTopK(queries, corpus, "id", "vec", 3))
    // window nlists: assign still v1 (3 anchors), codes on v2 (4)
    assert(asTopkRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx, 3, nProbe = 3)) === bf,
      "assign serve in the crash window")
    assert(asTopkRows(StreamIngest.ivfPqIndexTopK(spark, queries,
      "id", "vec", idx, corpus, 3, nProbe = 4, refine = 10))
      === bf, "codes serve in the crash window")
    // recovery: the repair re-derives the SAME sub-anchors from the
    // unchanged assign face, so the codes rows labeled by v2 stay
    // addressable under v3
    assert(StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.3))
    for (face <- Seq("assign", "codes"))
      assert(StreamIngest.readLayout(spark, s"$idx/${face}_epoch")
        .flatMap(_.codebook) === Some("centroids_v3.parquet"), face)
    val cbIds = StreamIngest.readIvfCentroids(spark, idx)
      .map(_._1.toLong).toSet
    val codesLists = StreamIngest
      .readLayout(spark, s"$idx/codes_epoch").get.segs
    assert(codesLists.nonEmpty)
    val codeRows = spark.read.option("basePath", s"$idx/codes_epoch")
      .parquet(s"$idx/codes_epoch/${codesLists.last.name}")
      .select(col("list").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(codeRows.subsetOf(cbIds),
      s"no codes row may sit in a list the codebook lacks: " +
        s"$codeRows vs $cbIds")
    assert(asTopkRows(StreamIngest.ivfPqIndexTopK(spark, queries,
      "id", "vec", idx, corpus, 3, nProbe = cbIds.size,
      refine = 10)) === bf, "codes serve after convergence")
  }

  test("ltomb lifecycle (r19): the split composes with an id " +
    "tombstone (retention before repair), a SECOND split stacks its " +
    "own ltomb, and a cascading fold merges the suppressed " +
    "partitions OUT physically — the spent ltombs fall off the " +
    "manifest and no suppressed list survives on disk") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_ltlife_idx").toString
    val corpus = splitCorpus
    StreamIngest.ivfIndexInit(spark, idx, splitAnchors)
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    // retention first: expire half of list 1 (ids 50,52,54) — an id
    // tombstone now covers the segment the split will also suppress
    val live = corpus.select(col("id"))
      .filter(col("id") < 50L || pmod(col("id"), lit(2)) === 1L)
    StreamIngest.compactIvfIndex(spark, idx,
      liveIds = Some(live)): Unit
    assert(StreamIngest.readLayout(spark, s"$idx/assign_epoch")
      .get.tombs.nonEmpty, "fixture needs a live id tombstone")
    def brute = StreamIngest.readIvfIndex(spark, idx)
      .groupBy("list").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(brute === Map(0L -> 20L, 1L -> 3L))
    // split over the tombstoned store: exact through both mechanisms
    assert(StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.3))
    assert(StreamIngest.ivfListHistogram(spark, idx) === brute)
    assert(brute.values.sum == 23L)
    val l1 = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    assert(l1.ltombs.map(_.lists) === Seq(Seq(0L)))
    // SECOND split: crowd one surviving sub-list with fresh separable
    // rows, fold, repair again — its ltomb stacks on the first
    val hist1 = StreamIngest.ivfListHistogram(spark, idx)
    val hot = hist1.filterNot(_._1 == 1L).maxBy(_._2)._1
    val anchors1 = StreamIngest.readIvfCentroids(spark, idx)
    val target = anchors1.find(_._1.toLong == hot).get._2
    val flood = (0 until 40).map { i =>
      val v = target.clone()
      v(0) = v(0) + (if (i % 2 == 0) 0.0 else 0.15)
      (900L + i, v.toSeq)
    }.toDF("id", "vec")
    StreamIngest.ivfIngestBatch(flood, "id", "vec", idx, 1L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    assert(StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.5))
    val l2 = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    assert(l2.ltombs.length == 2, l2.ltombs.toString)
    assert(l2.ltombs.flatMap(_.lists).contains(hot))
    val full = brute
    assert(StreamIngest.ivfListHistogram(spark, idx) === full)
    assert(full.values.sum == 63L)
    assert(!full.keySet.contains(hot) && !full.keySet.contains(0L),
      s"split lists must be empty in the live view: $full")
    // serve exact at the exhaustive corner over the stacked state
    val all = StreamIngest.readIvfIndex(spark, idx)
      .select(col("vec_id").as("id"), col("vec"))
    val queries = all.filter(col("id").isin(10L, 51L, 900L))
    val bf = asTopkRows(graft.operators.Similarity
      .bruteForceTopK(queries, all, "id", "vec", 3))
    assert(asTopkRows(StreamIngest.ivfIndexTopK(spark, queries,
      "id", "vec", idx, 3,
      nProbe = StreamIngest.readIvfCentroids(spark, idx).length))
      === bf)
    // cascade: grow fresh batches until the geometric merge consumes
    // every covered segment — suppressed partitions drop PHYSICALLY,
    // spent ltombs fall off the manifest (the merge policy is
    // byte-ratio-driven, so the batch doubles until the stack folds)
    var bulkRows = 0L
    var batchId = 2L
    var n = 80
    while (StreamIngest.readLayout(spark, s"$idx/assign_epoch")
        .get.ltombs.nonEmpty && batchId < 10L) {
      val bulk = (0 until n).map(i =>
        (100000L * batchId + i, Seq(0.02 * (i % 7), 1.0)))
        .toDF("id", "vec")
      StreamIngest.ivfIngestBatch(bulk, "id", "vec", idx, batchId)
      StreamIngest.compactIvfIndex(spark, idx): Unit
      bulkRows += n; batchId += 1; n *= 2
    }
    val l3 = StreamIngest.readLayout(spark, s"$idx/assign_epoch").get
    assert(l3.ltombs.isEmpty,
      s"ltombs with no covered live segment must drop: $l3")
    assert(l3.tombs.isEmpty, "the id tombstone must also be spent")
    val suppressed = Set("list=0", s"list=$hot")
    for (seg <- l3.segs) {
      val segDir = new java.io.File(s"$idx/assign_epoch/${seg.name}")
      val lists = Option(segDir.listFiles()).toSeq.flatten
        .filter(_.isDirectory).map(_.getName).toSet
      assert(lists.intersect(suppressed).isEmpty,
        s"merged segment ${seg.name} must not carry suppressed " +
          s"partitions: $lists")
    }
    // and nothing was lost in the cascade
    assert(StreamIngest.readIvfIndex(spark, idx).count()
      == 63L + bulkRows)
  }

  test("_hist backfill (r19): a pre-r18 store (segments without " +
    "sidecars) gets them written by ONE maintenance tick, after " +
    "which the histogram is answered WITHOUT opening any data file " +
    "— proven by moving the data partitions aside and asking again") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_backfill_idx").toString
    val corpus = splitCorpus
    StreamIngest.ivfIndexInit(spark, idx, splitAnchors)
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    val expected = StreamIngest.ivfListHistogram(spark, idx)
    assert(expected === Map(0L -> 20L, 1L -> 6L))
    // simulate the pre-sidecar layout
    val epoch = new java.io.File(s"$idx/assign_epoch")
    val sidecars = epoch.listFiles().filter(_.isDirectory)
      .map(d => new java.io.File(d, "_hist")).filter(_.exists())
    assert(sidecars.nonEmpty)
    sidecars.foreach(f => assert(f.delete()))
    // one tick backfills (and reports the root as changed)
    val out = StreamIngest.maintainIndexes(spark, Seq(idx),
      maxHotBatches = 8).toMap
    assert(out(idx) === true, "backfill must report a change")
    for (f <- sidecars)
      assert(f.exists(), s"sidecar ${f.getPath} must be rewritten")
    // second tick: nothing left to do
    assert(StreamIngest.maintainIndexes(spark, Seq(idx),
      maxHotBatches = 8).toMap.apply(idx) === false)
    // the no-data-open proof: with every data partition moved aside,
    // the histogram still answers exactly (a data open would throw)
    val moved = epoch.listFiles().filter(_.isDirectory).flatMap(seg =>
      seg.listFiles().filter(d =>
        d.isDirectory && d.getName.startsWith("list=")).map { d =>
        val dst = new java.io.File(d.getParentFile,
          s"moved_${d.getName}")
        assert(d.renameTo(dst)); (dst, d)
      })
    assert(moved.nonEmpty)
    try
      assert(StreamIngest.ivfListHistogram(spark, idx) === expected,
        "sidecar-only answer must survive without data files")
    finally moved.foreach { case (dst, orig) =>
      assert(dst.renameTo(orig))
    }
  }

  test("splitIvfLists guards (r19): a clone-heavy list (<2 distinct " +
    "vectors) is reported unsplittable, not split forever; below " +
    "the threshold nothing commits") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft_splitdup_idx").toString
    val clones = (0 until 20).map(i => (10L + i, Seq(1.0, 0.0)))
    val b = (0 until 6).map(i => (50L + i, Seq(0.05 * i, 1.0)))
    val corpus = (clones ++ b).toDF("id", "vec")
    StreamIngest.ivfIndexInit(spark, idx,
      Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))
    StreamIngest.ivfIngestBatch(corpus, "id", "vec", idx, 0L)
    StreamIngest.compactIvfIndex(spark, idx): Unit
    // over threshold but all-clones: refuses, commits nothing
    assert(!StreamIngest.splitIvfLists(spark, idx, maxSkew = 1.3))
    assert(StreamIngest.readLayout(spark, s"$idx/assign_epoch")
      .get.ltombs.isEmpty)
    // below threshold: no-op
    assert(!StreamIngest.splitIvfLists(spark, idx, maxSkew = 10.0))
  }
}
