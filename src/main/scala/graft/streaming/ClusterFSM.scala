package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.model._

/** HA supervisor state machine — the `hamonitor` control plane
  * (/root/reference/pkg/agent/hacluster.go:259-390 `SuperVisor` /
  * `checkCluster`).
  *
  * Pure-transition core (`step`) so probe traces can drive it in tests
  * (FIXTURES.md §B.5); a thin runner wires it to real probes and to the
  * CopyJob backfill. Unlike the reference, whose FSM state dies with the
  * process, callers can persist `FsmState` (checkpointing — a deliberate
  * improvement, SURVEY.md §7.3 hard part 6).
  *
  * Transitions (hacluster.go:266-370):
  *   OK                ─ slave down ─▶ CHECK_SLAVE_DOWN  (284-295)
  *   CHECK_SLAVE_DOWN  ─ still down ─▶ (hold)            (297-303)
  *   CHECK_SLAVE_DOWN  ─ slave up   ─▶ RECOVERING        (305-342)
  *       with recovery window [slaveLastOkNs − checkIntervalNs, nowNs]
  *       (window math hacluster.go:310,321 — the one-interval overlap
  *        guards against boundary loss; InfluxDB-style idempotent
  *        upsert/our partition-overwrite sink makes it safe)
  *   RECOVERING        ─ backfill done ─▶ OK, numRecovers++ (337-341)
  */
object ClusterFSM {

  final case class FsmState(
      state: ClusterState,
      masterLastOkNs: Long,
      slaveLastOkNs: Long,
      numRecovers: Long,
      lastRecoverDurationNs: Long)

  final case class RecoveryWindow(startNs: Long, endNs: Long)

  def initial(nowNs: Long): FsmState =
    FsmState(ClusterState.Ok, nowNs, nowNs, 0L, 0L)

  /** One supervisor evaluation (period = min-sync-interval, 20s default,
    * conf/sample.syncflux.toml:67). Returns the new state and, on the
    * down→up edge, the backfill window to replicate. */
  def step(
      st: FsmState,
      nowNs: Long,
      masterUp: Boolean,
      slaveUp: Boolean,
      checkIntervalNs: Long): (FsmState, Option[RecoveryWindow]) = {
    val mOk = if (masterUp) nowNs else st.masterLastOkNs
    val sOk = if (slaveUp) nowNs else st.slaveLastOkNs
    st.state match {
      case ClusterState.Ok =>
        if (!slaveUp)
          (st.copy(state = ClusterState.CheckSlaveDown,
            masterLastOkNs = mOk), None)
        else (st.copy(masterLastOkNs = mOk, slaveLastOkNs = sOk), None)

      case ClusterState.CheckSlaveDown =>
        if (slaveUp) {
          // recovery window = [lastOK − checkInterval, now]
          // (hacluster.go:310,321)
          val w = RecoveryWindow(st.slaveLastOkNs - checkIntervalNs, nowNs)
          (st.copy(state = ClusterState.Recovering, masterLastOkNs = mOk),
            Some(w))
        } else (st.copy(masterLastOkNs = mOk), None)

      case ClusterState.Recovering =>
        // runner calls recoveryDone() when the backfill batch finishes
        (st.copy(masterLastOkNs = mOk, slaveLastOkNs = sOk), None)
    }
  }

  /** Backfill completion → OK, counters updated (hacluster.go:337-341).
    *
    * `coveredThroughNs` must be what the backfill PROVED — the recovery
    * window's END, not the wall clock after the copy. The backfill can
    * far outlast one check interval, and a FLAPPING slave can drop
    * again while it runs: stamping wall-now would anchor the NEXT
    * recovery window at `now − checkInterval`, silently losing
    * `(window.end, now − checkInterval)` — exactly the overlapping/
    * lost-window chaos the reference's supervisor is vulnerable to
    * (hacluster.go:297-342 stamps `time.Now()` with no re-probe and no
    * re-entrancy guard). With the covered-through stamp, consecutive
    * windows always chain with the one-interval overlap and never a
    * gap (FsmChaosSpec). A healthy slave loses nothing: the next OK
    * tick advances `slaveLastOkNs` to its probe time anyway. */
  def recoveryDone(st: FsmState, coveredThroughNs: Long,
      durationNs: Long): FsmState =
    st.copy(state = ClusterState.Ok, slaveLastOkNs = coveredThroughNs,
      numRecovers = st.numRecovers + 1, lastRecoverDurationNs = durationNs)

  /** Backfill FAILURE → back to CHECK_SLAVE_DOWN with the slave's lastOK
    * UN-advanced, so the next healthy tick re-emits the same window. The
    * reference has no equivalent guard: a backfill that copied nothing
    * (e.g. master still down — the FSM enters RECOVERING on the slave's
    * edge regardless of master state) would mark the cluster OK and
    * permanently forget the outage. */
  def recoveryFailed(st: FsmState): FsmState =
    st.copy(state = ClusterState.CheckSlaveDown)

  def toStatus(st: FsmState, masterUp: Boolean, slaveUp: Boolean)
      : ClusterStatus = {
    val name = st.state match {
      case ClusterState.Ok             => "OK"
      case ClusterState.CheckSlaveDown => "CHECK_SLAVE_DOWN"
      case ClusterState.Recovering     => "RECOVERING"
    }
    ClusterStatus(name, st.numRecovers, st.lastRecoverDurationNs,
      masterUp, st.masterLastOkNs, slaveUp, st.slaveLastOkNs)
  }
}

/** Driver-side monitor runner: periodic probes (check-interval, 10s
  * default) + supervisor loop + backfill trigger. The Spark scheduler
  * runs the backfill itself; probing is control-plane-only, matching
  * `StartMonitor` (/root/reference/pkg/agent/influxmonitor.go:163-187).
  */
final class HAMonitor(
    masterProbe: () => Boolean,
    slaveProbe: () => Boolean,
    checkIntervalNs: Long,
    // returns whether the backfill SUCCEEDED — a false (or a throw)
    // keeps the FSM in CHECK_SLAVE_DOWN so the window is re-emitted
    backfill: ClusterFSM.RecoveryWindow => Boolean,
    // epoch ns (NOT System.nanoTime, whose arbitrary origin would put
    // recovery windows in a coordinate system matching no data)
    nowNs: () => Long = () => System.currentTimeMillis() * 1000000L,
    // runs once per supervisor tick AFTER the FSM step — the periodic
    // work that rides the supervisor cadence (the agent wires the CQ
    // service's incremental re-runs here, the way InfluxDB's CQ
    // service ticks beside its own monitors). Failures are swallowed:
    // a broken scheduled job must not stall cluster supervision.
    onTick: () => Unit = () => ()) {

  private val ref = new AtomicReference(ClusterFSM.initial(nowNs()))
  private val scheduler = new AtomicReference[
    java.util.concurrent.ScheduledExecutorService](null)

  def state: ClusterFSM.FsmState = ref.get()

  /** Start the periodic supervisor (period = min-sync-interval; the
    * reference's supervisor goroutine, hacluster.go:259-262,372-390).
    * Idempotent; `stop()` ends it. */
  def start(periodMs: Long): Unit = {
    val exec = java.util.concurrent.Executors
      .newSingleThreadScheduledExecutor(r => {
        val t = new Thread(r, "graft-hamonitor")
        t.setDaemon(true)
        t
      })
    if (scheduler.compareAndSet(null, exec)) {
      exec.scheduleAtFixedRate(
        () => try tick(): Unit catch { case _: Throwable => () },
        periodMs, periodMs, java.util.concurrent.TimeUnit.MILLISECONDS): Unit
    } else exec.shutdownNow(): Unit
  }

  def stop(): Unit = {
    val exec = scheduler.getAndSet(null)
    if (exec != null) exec.shutdownNow(): Unit
  }

  /** One supervisor tick; runs backfill synchronously on the recovery
    * edge (the reference also blocks its supervisor goroutine during
    * ReplicateData, hacluster.go:333). */
  def tick(): ClusterFSM.FsmState = {
    val (mUp, sUp) = (masterProbe(), slaveProbe())
    val t = nowNs()
    val (next, win) = ClusterFSM.step(ref.get(), t, mUp, sUp, checkIntervalNs)
    val after = win match {
      case Some(w) =>
        val t0 = nowNs()
        val ok = try backfill(w) catch { case _: Throwable => false }
        // stamp what the backfill PROVED (w.endNs), not wall-now: the
        // slave may have flapped down again during a long copy
        if (ok) ClusterFSM.recoveryDone(next, w.endNs, nowNs() - t0)
        else ClusterFSM.recoveryFailed(next)
      case None => next
    }
    ref.set(after)
    try onTick() catch { case _: Exception => () }
    after
  }

  def status: ClusterStatus =
    ClusterFSM.toStatus(ref.get(), masterProbe(), slaveProbe())
}
