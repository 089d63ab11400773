package graft.streaming

import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import scala.util.Try

import graft.model.ClusterState
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Durable FSM state — the deliberate improvement over the reference,
  * whose supervisor state (incl. `SlaveLastOK`) dies with the process
  * (in-memory struct only, /root/reference/pkg/agent/hacluster.go:27-44;
  * SURVEY.md §7.3 hard part 6): a restart of the reference forgets the
  * outage window and never backfills it. Here every transition is
  * persisted (atomic tmp+rename through the Hadoop FileSystem, so the
  * checkpoint can live on HDFS/S3A alongside the data), and a restarted
  * monitor resumes from the persisted `lastOK` — the outage window is
  * recovered even across monitor crashes. */
final class FsmStateStore(conf: Configuration, dir: String) {

  private def fsAnd(p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(conf), path)
  }

  private val stateName: Map[ClusterState, String] = Map(
    ClusterState.Ok -> "OK",
    ClusterState.CheckSlaveDown -> "CHECK_SLAVE_DOWN",
    ClusterState.Recovering -> "RECOVERING")
  private val nameState = stateName.map(_.swap)

  def save(st: ClusterFSM.FsmState): Unit = {
    val json =
      s"""{"state":"${stateName(st.state)}",""" +
        s""""master_last_ok_ns":${st.masterLastOkNs},""" +
        s""""slave_last_ok_ns":${st.slaveLastOkNs},""" +
        s""""num_recovers":${st.numRecovers},""" +
        s""""last_recover_duration_ns":${st.lastRecoverDurationNs}}"""
    val (fs, tmp) = fsAnd(s"$dir/.fsm_state.json.tmp")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // crash-safe swap: move current aside, promote tmp, drop backup —
    // any crash leaves current or .bak present, and load() falls back
    // to .bak, so a mid-save crash can't silently reset the FSM to OK
    // (which would forget the outage window)
    val dst = new Path(s"$dir/fsm_state.json")
    val bak = new Path(s"$dir/.fsm_state.json.bak")
    fs.delete(bak, false)
    if (fs.exists(dst)) fs.rename(dst, bak): Unit
    require(fs.rename(tmp, dst), s"cannot promote FSM state file $tmp")
    fs.delete(bak, false): Unit
  }

  def load(): Option[ClusterFSM.FsmState] =
    loadFrom("fsm_state.json").orElse(loadFrom(".fsm_state.json.bak"))

  private def loadFrom(name: String): Option[ClusterFSM.FsmState] = {
    val (fs, p) = fsAnd(s"$dir/$name")
    if (!Try(fs.exists(p)).getOrElse(false)) None
    else Try {
      val in = fs.open(p)
      val raw =
        try {
          val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
          in.readFully(bytes)
          new String(bytes, StandardCharsets.UTF_8)
        } finally in.close()
      def longOf(k: String): Long =
        s""""$k":(-?\\d+)""".r.findFirstMatchIn(raw).get.group(1).toLong
      val st = """"state":"([A-Z_]+)"""".r
        .findFirstMatchIn(raw).get.group(1)
      ClusterFSM.FsmState(
        // a crash mid-RECOVERING resumes as CHECK_SLAVE_DOWN: the
        // backfill did not complete, so the next up-probe re-triggers it
        // with the still-persisted (un-advanced) slaveLastOkNs
        if (st == "RECOVERING") ClusterState.CheckSlaveDown
        else nameState(st),
        longOf("master_last_ok_ns"),
        longOf("slave_last_ok_ns"),
        longOf("num_recovers"),
        longOf("last_recover_duration_ns"))
    }.toOption
  }
}

/** Structured-Streaming replication monitor — the hamonitor plane
  * (agent.go:242-271) on Spark's streaming runtime: a rate source drives
  * the supervisor cadence, each micro-batch evaluates the probes and
  * steps the `ClusterFSM`, and the down→up edge triggers the bounded
  * backfill batch over `[slaveLastOK − checkInterval, now]`
  * (hacluster.go:305-342) — exactly the "reprocess an overlap window on
  * recovery" late-data pattern (SURVEY.md §2.9 T3). Every transition is
  * checkpointed via `FsmStateStore`, so a restarted monitor resumes where
  * it died instead of forgetting the outage like the reference does.
  */
final class StreamingMonitor(
    spark: SparkSession,
    masterProbe: () => Boolean,
    slaveProbe: () => Boolean,
    checkIntervalNs: Long,
    // returns whether the backfill SUCCEEDED — a false (or a throw)
    // reverts to CHECK_SLAVE_DOWN so the window is re-emitted
    backfill: ClusterFSM.RecoveryWindow => Boolean,
    checkpointDir: String,
    nowNs: () => Long = () => System.currentTimeMillis() * 1000000L,
    // per-tick maintenance hook (CQ refresh + /write-rewind drain in
    // the daemon) — exceptions swallowed so a broken registration
    // cannot take the supervisor down, same as HAMonitor's onTick
    onTick: () => Unit = () => ()) {

  private val store = new FsmStateStore(
    spark.sessionState.newHadoopConf(), checkpointDir)
  private val ref = new AtomicReference(
    store.load().getOrElse(ClusterFSM.initial(nowNs())))
  private val backfills = new AtomicLong(0L)

  def state: ClusterFSM.FsmState = ref.get()
  def backfillCount: Long = backfills.get()

  def status: graft.model.ClusterStatus =
    ClusterFSM.toStatus(ref.get(), masterProbe(), slaveProbe())

  /** One supervisor evaluation: probe → FSM step → persist; backfill runs
    * synchronously on the recovery edge (the reference also blocks its
    * supervisor during ReplicateData, hacluster.go:333). State is
    * persisted BEFORE the backfill too, so a crash mid-backfill resumes
    * as CHECK_SLAVE_DOWN with the un-advanced lastOK and re-runs it —
    * at-least-once, made exactly-once-effective by the sink's
    * upsert-idempotent re-copy. */
  def tick(): ClusterFSM.FsmState = {
    try onTick() catch { case _: Exception => () }
    val (mUp, sUp) = (masterProbe(), slaveProbe())
    val t = nowNs()
    val (next, win) = ClusterFSM.step(ref.get(), t, mUp, sUp, checkIntervalNs)
    store.save(next)
    val after = win match {
      case Some(w) =>
        val t0 = nowNs()
        val ok = try backfill(w) catch { case _: Throwable => false }
        if (ok) {
          backfills.incrementAndGet(): Unit
          // stamp what the backfill PROVED (w.endNs), not wall-now: a
          // slave that flapped down during a long copy would otherwise
          // get its next window anchored past the data actually
          // replicated (lost span — see ClusterFSM.recoveryDone)
          ClusterFSM.recoveryDone(next, w.endNs, nowNs() - t0)
        } else ClusterFSM.recoveryFailed(next)
      case None => next
    }
    ref.set(after)
    if (after != next) store.save(after)
    after
  }

  /** Start the streaming plane: rate source → foreachBatch(tick) at the
    * supervisor cadence (min-sync-interval). The returned query runs
    * until `stop()`/`awaitTermination`. */
  def start(triggerMs: Long): StreamingQuery =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", 1)
      .load()
      .writeStream
      .queryName("graft-hamonitor")
      .option("checkpointLocation", s"$checkpointDir/stream")
      .trigger(Trigger.ProcessingTime(triggerMs))
      // a failed tick (probe timeout, transient FS error during the
      // backfill) must not terminate the daemon: the reference
      // supervisor loops forever through errors, and the scheduler-mode
      // HAMonitor catches throwables the same way — next tick retries
      .foreachBatch((_: DataFrame, _: Long) =>
        try tick(): Unit catch { case _: Throwable => () })
      .start()
}
