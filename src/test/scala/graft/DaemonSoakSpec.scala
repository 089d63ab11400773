package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicReference

import graft.agent.{Agent, AgentConfig}
import graft.streaming.StreamIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Composed-daemon soak (r19): every per-component spec is thorough,
  * but nothing drove ALL the daemon's planes at once — supervisor
  * ticks (CQ refresh + rewind drain + index fold cadence + `_hist`
  * backfill + drift repair) racing concurrent /write batches and
  * LSH + IVF ingest batches, with a mid-run repair CRASH injected
  * through the commit-window seam. The invariants under test are the
  * CROSS-component ones: no plane loses rows, no `_inflight_` marker
  * or `_maint_lease` is left behind, the crashed repair converges on
  * a later tick, and every plane still answers exactly afterwards. */
class DaemonSoakSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val S = 1704412800000000000L
  val E = 1705708800000000000L
  val Day = 86400000000000L

  test("daemon soak: ticks + /write + LSH ingest + IVF ingest + CQ " +
    "drain + fold/backfill/drift maintenance, with a mid-run repair " +
    "crash — no lost rows, no stalled markers, lease released, " +
    "repair converged, all planes exact") {
    import spark.implicits._
    val master = Files.createTempDirectory("graft_soak_m").toString
    spark.read.parquet(s"${SparkSpec.Sf0001}/events.parquet")
      .write.parquet(s"$master/events.parquet")
    val dst = Files.createTempDirectory("graft_soak_d").toString
    val lshIdx = Files.createTempDirectory("graft_soak_l") + "/idx"
    val ivfIdx = Files.createTempDirectory("graft_soak_v") + "/idx"
    val marks = Files.createTempDirectory("graft_soak_mk").toString

    // IVF root: stale 2-anchor codebook, every vector will crowd
    // list 0 -> the tick's drift policy (index-max-skew) must repair
    StreamIngest.ivfIndexInit(spark, ivfIdx,
      Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0)))

    @volatile var now = E
    val agent = new Agent(spark,
      AgentConfig(masterRoot = master, slaveRoot = dst,
        measRegex = "^events$", newDb = "replica", newRp = "rp30d",
        chunk = "120h", start = (S / 1000000000L).toString,
        end = (E / 1000000000L).toString,
        monitorRetryIntervalMs = 0L,
        initialReplication = "none",
        indexDirs = s"$lshIdx,$ivfIdx",
        indexMaxHotBatches = 2, indexMaxSkew = 1.3),
      slaveProbeOpt = Some(() => true), nowNs = () => now)
    val monitor = agent.hamonitor()
    val dp = agent.daemonPlane
    // a CQ over the served plane, fed by the concurrent /write batches
    agent.cqService.registerOnly(
      """create continuous query "soak" begin select count(value) """ +
        """into "soak_rollup" from "soaked" group by time(1d) end""")

    val failures = new AtomicReference[List[Throwable]](Nil)
    def runner(name: String)(body: => Unit): Thread = {
      val t = new Thread(() =>
        try body
        catch { case e: Throwable =>
          failures.updateAndGet(e :: _): Unit
        }, name)
      t.start(); t
    }

    val writes = 12
    // the SERVED /query plane, wired exactly as the daemon wires the
    // status server (r20): a concurrent reader races every /write
    // batch through the chunk snapshot manifest — the criterion is
    // ZERO task failures (no FILE_NOT_EXIST, no retries attributable
    // to the write plane) and every read seeing a committed count
    val qlExec = graft.ql.QlPlanner.executorScoped(spark, dst,
      dp.liveCatalog())
    // seed the measurement (first-day bucket, its own series) so the
    // reader never races auto-create itself
    assert(dp.write(s"soaked,host=seed value=0.5 ${S + 20 * Day}",
      None, 1L) == 1L)
    // count task failures ATTRIBUTABLE TO THE WRITE PLANE (the r19
    // transient's signature: a missing file under a rewritten chunk).
    // The session is shared across the whole sbt suite run, so a
    // blanket != Success filter would also catch e.g. tasks killed
    // when an earlier suite's leaked stream winds down — noise the
    // criterion is not about.
    val failedTasks = new java.util.concurrent.atomic.AtomicLong()
    val taskListener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val r = String.valueOf(te.reason)
        if (te.reason != org.apache.spark.Success &&
            (r.contains("FileNotFound") || r.contains("FILE_NOT_EXIST")))
          failedTasks.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(taskListener)
    val readerStop = new java.util.concurrent.atomic.AtomicBoolean()
    val lshBatches = 6
    val ivfBatches = 6
    // the injected kill: every drift-repair attempt dies between the
    // two face commits while the seam is up (the tick's per-root
    // fault isolation must swallow it and keep every other plane
    // running); cleared before the quiesce ticks, which must converge
    StreamIngest.reclusterCrashBeforeAssignCommit = true
    try {
      val writer = runner("soak-writer") {
        for (i <- 0 until writes) {
          val ts = S + (20 + i) * Day
          assert(dp.write(s"soaked,host=h$i value=${i + 0.5} $ts",
            None, 1L) == 1L)
          Thread.sleep(30L)
        }
      }
      val lsher = runner("soak-lsh") {
        for (b <- 0 until lshBatches) {
          StreamIngest.lshIngestBatch(
            Seq((100L + b, s"soak document number $b unique alpha$b"))
              .toDF("id", "text"),
            "id", "text", lshIdx, s"$marks/lsh", b.toLong, 8, 4, 3, 4)
          Thread.sleep(40L)
        }
      }
      val ivfer = runner("soak-ivf") {
        for (b <- 0 until ivfBatches) {
          // two separable sub-clusters crowding list 0
          val rows = (0 until 8).map { i =>
            val id = 1000L * (b + 1) + i
            if (i % 2 == 0) (id, Seq(1.0, 0.001 * i))
            else (id, Seq(0.85, 0.5 + 0.001 * i))
          }.toDF("id", "vec")
          StreamIngest.ivfIngestBatch(rows, "id", "vec", ivfIdx,
            b.toLong)
          Thread.sleep(40L)
        }
      }
      val ticker = runner("soak-ticker") {
        for (_ <- 0 until 10) {
          now += 20000000000L
          monitor.tick()
          Thread.sleep(60L)
        }
      }
      // STRICT reader — no tolerated exception classes: the catalog
      // walk skips mid-rewrite measurements (the rollup racing its
      // own CQ refresh used to 500 a /query here; storageCatalog now
      // defers them to the next walk), and 'soaked' itself is
      // manifest-pinned, so every read must succeed with a committed
      // count
      val reader = runner("soak-reader") {
        while (!readerStop.get()) {
          val n = qlExec("select count(value) from soaked", None)
            .collect().head.getLong(1)
          // committed-state-only: the seed plus 0..writes batches —
          // never a torn or duplicated view of a mid-rewrite chunk
          assert(n >= 1L && n <= (writes + 1).toLong,
            s"served count $n outside any committed state")
          Thread.sleep(10L)
        }
      }
      Seq(writer, lsher, ivfer, ticker).foreach(_.join(120000L))
      readerStop.set(true); reader.join(60000L)
    } finally {
      StreamIngest.reclusterCrashBeforeAssignCommit = false
      readerStop.set(true)
      spark.sparkContext.removeSparkListener(taskListener)
    }
    assert(failedTasks.get() == 0L,
      s"${failedTasks.get()} failed tasks — the /write plane must " +
        "not cost the served readers (or any plane) retries")
    assert(failures.get().isEmpty,
      s"no plane may fail during the soak: ${failures.get()}")

    // quiesce: ticks with the seam down — folds catch up, the
    // crashed repair re-runs and converges
    for (_ <- 0 until 3) { now += 20000000000L; monitor.tick() }

    // --- invariants ---------------------------------------------------
    // 1. no lost rows on either index plane
    val (bands, _) = StreamIngest.readLshIndex(spark, lshIdx)
    assert(bands.select("id").distinct().count() == lshBatches.toLong,
      "every LSH batch's doc must survive the soak")
    val ivfLive = StreamIngest.readIvfIndex(spark, ivfIdx)
    assert(ivfLive.select("vec_id").distinct().count()
      == (ivfBatches * 8).toLong,
      "every IVF row must survive the soak + crashed repairs")
    // 2. no stalled markers, no leaked lease
    for (root <- Seq(lshIdx, ivfIdx)) {
      assert(StreamIngest.inflightIds(spark, root).isEmpty,
        s"$root: no _inflight_ marker may remain")
      assert(!new java.io.File(s"$root/_maint_lease").exists(),
        s"$root: the maintenance lease must be released")
    }
    // 3. the drift repair converged after the crash window: both
    // faces (assign-only root: assign) carry a repaired codebook and
    // the skew is back under the threshold
    val al = StreamIngest.readLayout(spark, s"$ivfIdx/assign_epoch")
    assert(al.flatMap(_.codebook).exists(_.startsWith("centroids_v")),
      s"repair must have committed: $al")
    assert(al.get.ltombs.nonEmpty, "the repair must be the per-list " +
      "split (ltomb present), not a rewrite")
    assert(StreamIngest.ivfListSkew(spark, ivfIdx) <= 1.3 + 0.3,
      "post-repair skew must be near the threshold")
    // 4. the IVF serve is still exact at the exhaustive corner
    val corpus = ivfLive.select(col("vec_id").as("id"), col("vec"))
    val queries = corpus.limit(3)
    val nAll = StreamIngest.readIvfCentroids(spark, ivfIdx).length
    val brute = graft.operators.Similarity
      .bruteForceTopK(queries, corpus, "id", "vec", 3)
      .select("query_id", "rank", "neighbor_id", "cosine_r").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val served = StreamIngest.ivfIndexTopK(spark, queries, "id",
      "vec", ivfIdx, 3, nProbe = nAll)
      .select("query_id", "rank", "neighbor_id", "cosine_r").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(served === brute, "IVF serve must stay exact after the soak")
    // 5. the CQ consumed the concurrent writes: rollup buckets cover
    // every written day, counts match the served measurement
    val cq = new graft.operators.ContinuousQuery(spark)
    val roll = cq.readRollup(s"$dst/soak_rollup.parquet")
    val expected = (0 until writes)
      .map(i => (S + (20 + i) * Day) / Day * Day).toSet
    assert(roll.select("bucket_ns").collect().map(_.getLong(0)).toSet
      === expected, "every written day must reach the rollup")
    assert(roll.agg(sum(col("n_points"))).head().getLong(0)
      == (writes + 1).toLong) // + the served-reader seed point
    // 5b. the served /query answer settles on the fully-committed
    // state the reader raced toward
    assert(qlExec("select count(value) from soaked", None)
      .collect().head.getLong(1) == (writes + 1).toLong)
    // 6. folds kept up: hot tails are back under the cadence bound
    for ((root, tier) <- Seq((lshIdx, "bands"), (ivfIdx, "assign"))) {
      val hot = Option(new java.io.File(s"$root/$tier").listFiles())
        .map(_.count(_.getName.startsWith("batch="))).getOrElse(0)
      assert(hot <= 2 + 1,
        s"$root/$tier: $hot hot dirs — the fold cadence stalled")
    }
  }
}
