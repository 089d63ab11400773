package graft

import java.nio.file.Files

import graft.agent.{Agent, AgentConfig}
import graft.model.ClusterState
import graft.operators.CopyJob
import graft.sources.Tables
import graft.streaming.{ClusterFSM, FsmStateStore, StreamingMonitor}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming replication plane: kill/revive a fake slave, assert the
  * outage window is backfilled exactly once, and that FSM state survives
  * a monitor restart (the improvement over the reference's in-memory-only
  * supervisor, hacluster.go:27-44; SURVEY.md §7.3 hard part 6). */
class StreamingMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val S = 1704412800000000000L
  val E = 1705708800000000000L

  def freshDir(): String =
    Files.createTempDirectory("graft_stream").toString

  def agentFor(dst: String, ckpt: String, slaveUp: () => Boolean,
      clock: () => Long): Agent =
    new Agent(spark,
      AgentConfig(masterRoot = SparkSpec.Sf0001, slaveRoot = dst,
        measRegex = "^events$", newDb = "replica", newRp = "rp30d",
        chunk = "120h",
        start = (S / 1000000000L).toString,
        end = (E / 1000000000L).toString,
        monitorRetryIntervalMs = 0L, checkpointDir = ckpt,
        initialReplication = "both"),
      slaveProbeOpt = Some(slaveUp),
      nowNs = clock)

  test("outage backfilled exactly once; state survives a monitor restart") {
    val dst = freshDir()
    val ckpt = freshDir()
    @volatile var slaveUp = true
    var now = E
    val agent = agentFor(dst, ckpt, () => slaveUp, () => now)
    val m1 = agent.hamonitorStreaming()
    val direct = Tables.timeRange(
      spark.read.parquet(s"${SparkSpec.Sf0001}/events.parquet"),
      "ts", S, E).count()
    assert(new CopyJob(spark)
      .readCopied(s"$dst/replica/rp30d/events.parquet").count() == direct)

    // outage
    slaveUp = false; now += 20000000000L
    m1.tick()
    assert(m1.state.state == ClusterState.CheckSlaveDown)
    // still down — holds, no backfill
    now += 20000000000L
    m1.tick()
    assert(m1.backfillCount == 0)
    // revive → exactly one backfill, state persisted
    slaveUp = true; now += 20000000000L
    m1.tick()
    assert(m1.backfillCount == 1)
    assert(m1.state.state == ClusterState.Ok)
    assert(m1.state.numRecovers == 1)
    // further healthy ticks never re-backfill
    now += 20000000000L
    m1.tick()
    assert(m1.backfillCount == 1)
    // no duplicates from the overlapping recovery window
    assert(new CopyJob(spark)
      .readCopied(s"$dst/replica/rp30d/events.parquet").count() == direct)

    // RESTART: a new monitor on the same checkpoint resumes the state
    val m2 = agentFor(dst, ckpt, () => slaveUp, () => now)
      .hamonitorStreaming()
    assert(m2.state.numRecovers == 1)
    assert(m2.state.state == ClusterState.Ok)
    assert(m2.state.slaveLastOkNs == m1.state.slaveLastOkNs)
  }

  test("crash mid-recovery resumes as CHECK_SLAVE_DOWN and re-runs the " +
    "backfill with the un-advanced lastOK (at-least-once, idempotent sink)") {
    val ckpt = freshDir()
    val store = new FsmStateStore(
      spark.sessionState.newHadoopConf(), ckpt)
    // simulate a crash: RECOVERING was persisted, recoveryDone never ran
    store.save(ClusterFSM.FsmState(ClusterState.Recovering,
      masterLastOkNs = 100L, slaveLastOkNs = 42L,
      numRecovers = 7L, lastRecoverDurationNs = 0L))
    val loaded = store.load().get
    assert(loaded.state == ClusterState.CheckSlaveDown)
    assert(loaded.slaveLastOkNs == 42L) // un-advanced → window re-emitted
    assert(loaded.numRecovers == 7L)
  }

  test("failed backfill does NOT mark the outage recovered: FSM reverts " +
    "to CHECK_SLAVE_DOWN with lastOK un-advanced and retries next tick") {
    val ckpt = freshDir()
    @volatile var succeed = false
    var attempts = 0
    var now = 1000000000000L
    // seed the checkpoint at the down→up edge
    val store = new FsmStateStore(spark.sessionState.newHadoopConf(), ckpt)
    store.save(ClusterFSM.FsmState(ClusterState.CheckSlaveDown,
      now, 42L, 0L, 0L))
    val m = new StreamingMonitor(spark, () => true, () => true,
      10000000000L, _ => { attempts += 1; succeed }, ckpt, () => now)
    m.tick() // backfill fails (master data unreachable, say)
    assert(attempts == 1)
    assert(m.state.state == ClusterState.CheckSlaveDown)
    assert(m.state.slaveLastOkNs == 42L) // un-advanced
    assert(m.backfillCount == 0)
    // next tick re-emits the SAME window; now it succeeds
    succeed = true; now += 10000000000L
    m.tick()
    assert(attempts == 2)
    assert(m.state.state == ClusterState.Ok)
    assert(m.state.numRecovers == 1)
  }

  test("streaming plane end-to-end: rate-source query drives probe/FSM " +
    "ticks through foreachBatch") {
    val dst = freshDir()
    val ckpt = freshDir()
    @volatile var slaveUp = true
    @volatile var backfilled = 0
    val monitor = new StreamingMonitor(spark,
      masterProbe = () => true,
      slaveProbe = () => slaveUp,
      checkIntervalNs = 1000000000L,
      backfill = _ => { backfilled += 1; true },
      checkpointDir = ckpt)
    val q = monitor.start(triggerMs = 100L)
    try {
      def awaitTicks(min: Long, timeoutMs: Long = 30000L): Unit = {
        val t0 = System.currentTimeMillis()
        while (q.recentProgress.length < min &&
          System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(50)
      }
      awaitTicks(2)
      slaveUp = false
      val t0 = System.currentTimeMillis()
      while (monitor.state.state != ClusterState.CheckSlaveDown &&
        System.currentTimeMillis() - t0 < 30000L) Thread.sleep(50)
      assert(monitor.state.state == ClusterState.CheckSlaveDown)
      slaveUp = true
      val t1 = System.currentTimeMillis()
      while (monitor.backfillCount < 1 &&
        System.currentTimeMillis() - t1 < 30000L) Thread.sleep(50)
      assert(monitor.backfillCount == 1)
      assert(backfilled == 1)
    } finally q.stop()
  }
}
