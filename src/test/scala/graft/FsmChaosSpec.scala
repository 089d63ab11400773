package graft

import graft.model.ClusterState
import graft.streaming.{ClusterFSM, HAMonitor, StreamingMonitor}
import org.scalatest.funsuite.AnyFunSuite

/** Chaos traces for the HA supervisor: a slave that flaps (down/up/down
  * within one min-sync-interval, and down again DURING a long backfill)
  * must never produce overlapping-beyond-design or LOST recovery
  * windows. The coverage invariant: consecutive windows chain —
  * `w(i+1).start <= w(i).end` (the deliberate one-interval overlap is
  * fine, an idempotent sink absorbs it; a GAP is silent data loss).
  *
  * The reference's supervisor is vulnerable to exactly this: it stamps
  * `time.Now()` as the slave's lastOK after ReplicateData with no
  * re-probe and no re-entrancy guard
  * (/root/reference/pkg/agent/hacluster.go:297-342), so a slave that
  * drops during a copy longer than one interval loses the span between
  * the copied window's end and `now − interval`. The engine stamps the
  * window end the backfill PROVED instead (ClusterFSM.recoveryDone). */
class FsmChaosSpec extends AnyFunSuite {
  val I = 10L // check interval ns

  /** Drive a scripted probe trace through step/recoveryDone, emulating
    * the monitor runners (synchronous backfill, always succeeding).
    * Returns every emitted recovery window in order. */
  private def drive(trace: Seq[(Long, Boolean)], checkNs: Long)
      : Vector[ClusterFSM.RecoveryWindow] = {
    var st = ClusterFSM.initial(trace.head._1)
    var wins = Vector.empty[ClusterFSM.RecoveryWindow]
    for ((t, slaveUp) <- trace) {
      val (next, win) = ClusterFSM.step(st, t, true, slaveUp, checkNs)
      st = win match {
        case Some(w) =>
          wins :+= w
          ClusterFSM.recoveryDone(next, w.endNs, 1L)
        case None => next
      }
    }
    wins
  }

  test("flapping slave (down/up alternating every tick): every outage " +
    "gets a window, consecutive windows chain with no gap") {
    // ticks every interval; slave: up, down, up, down, up, down, up
    val trace = Seq(
      (100L, true), (110L, false), (120L, true), (130L, false),
      (140L, true), (150L, false), (160L, true))
    val wins = drive(trace, I)
    assert(wins.size == 3) // one per down→up edge
    // window 1 anchors at the last healthy probe − I
    assert(wins.head == ClusterFSM.RecoveryWindow(100L - I, 120L))
    // chain invariant: no window starts after the previous one ended
    for (Seq(a, b) <- wins.sliding(2))
      assert(b.startNs <= a.endNs, s"GAP between $a and $b")
    // full coverage: the union reaches from before the first outage
    // to the last recovery probe
    assert(wins.last.endNs == 160L)
  }

  test("sub-interval flap (down and back up between two ticks, then " +
    "down again within the same interval) never loses coverage") {
    // the probe plane SAMPLES at tick cadence — a flap faster than a
    // tick is observable only as consecutive down samples; what must
    // hold is that the sampled edges chain windows without gaps even
    // when the up-sample lasts exactly one tick
    val trace = Seq(
      (0L, true), (3L, false), (6L, true), (9L, false), (12L, true))
    val wins = drive(trace, I)
    assert(wins.size == 2)
    assert(wins(0) == ClusterFSM.RecoveryWindow(0L - I, 6L))
    // second window anchors at the PROVEN covered-through stamp (6),
    // not at a wall clock: [6 − I, 12]
    assert(wins(1) == ClusterFSM.RecoveryWindow(6L - I, 12L))
    assert(wins(1).startNs <= wins(0).endNs)
  }

  test("slave drops DURING a backfill longer than one interval: the " +
    "next window still chains from the covered-through point (the " +
    "wall-clock stamp would lose the span)") {
    var slaveUp = true
    var clock = 0L
    var wins = Vector.empty[ClusterFSM.RecoveryWindow]
    val mon = new HAMonitor(() => true, () => slaveUp, I,
      w => {
        wins :+= w
        // the copy takes 5 intervals, and the slave flaps down
        // mid-copy — exactly the re-entrancy chaos window
        clock += 5 * I
        slaveUp = false
        true
      }, () => clock)
    clock = 10L; mon.tick() // healthy baseline, lastOK=10
    slaveUp = false; clock = 20L; mon.tick() // down observed
    slaveUp = true; clock = 30L; mon.tick() // up → backfill [0, 30]
    assert(wins == Vector(ClusterFSM.RecoveryWindow(0L, 30L)))
    assert(mon.state.state == ClusterState.Ok)
    // covered-through stamp, NOT the post-copy wall clock (80)
    assert(mon.state.slaveLastOkNs == 30L)
    clock = 90L; mon.tick() // still down → CHECK_SLAVE_DOWN
    assert(mon.state.state == ClusterState.CheckSlaveDown)
    slaveUp = true; clock = 100L; mon.tick() // recovery #2
    assert(wins.size == 2)
    // chains from 30 − I = 20 ≤ 30: master writes in (30, 80 − I)
    // are INSIDE the window — the wall-clock stamp would have
    // anchored at 80 − I = 70 and lost (30, 70)
    assert(wins(1) == ClusterFSM.RecoveryWindow(30L - I, 100L))
    assert(wins(1).startNs <= wins(0).endNs, s"GAP: $wins")
    assert(mon.state.numRecovers == 2L)
  }

  test("StreamingMonitor under the same mid-backfill flap: persisted " +
    "state chains windows across the checkpoint too") {
    val spark = SparkSpec.spark
    val dir = java.nio.file.Files
      .createTempDirectory("graft_fsm_chaos").toString
    var slaveUp = true
    var clock = 0L
    var wins = Vector.empty[ClusterFSM.RecoveryWindow]
    def mk() = new StreamingMonitor(spark, () => true, () => slaveUp, I,
      w => { wins :+= w; clock += 5 * I; slaveUp = false; true },
      dir, () => clock)
    val mon = mk()
    clock = 10L; mon.tick()
    slaveUp = false; clock = 20L; mon.tick()
    slaveUp = true; clock = 30L; mon.tick()
    assert(mon.state.slaveLastOkNs == 30L)
    // monitor restarts (process crash after the copy): the persisted
    // covered-through stamp survives
    val mon2 = mk()
    assert(mon2.state.slaveLastOkNs == 30L)
    clock = 90L; mon2.tick()
    slaveUp = true; clock = 100L; mon2.tick()
    assert(wins.size == 2)
    assert(wins(1) == ClusterFSM.RecoveryWindow(20L, 100L))
    assert(wins(1).startNs <= wins(0).endNs)
  }

  test("backfill failure during a flap re-emits an EXTENDED window, " +
    "never a shrunken or disjoint one") {
    var slaveUp = true
    var clock = 0L
    var fail = true
    var wins = Vector.empty[ClusterFSM.RecoveryWindow]
    val mon = new HAMonitor(() => true, () => slaveUp, I,
      w => { wins :+= w; !fail }, () => clock)
    clock = 10L; mon.tick()
    slaveUp = false; clock = 20L; mon.tick()
    slaveUp = true; clock = 30L; mon.tick() // backfill FAILS
    assert(mon.state.state == ClusterState.CheckSlaveDown)
    fail = false; clock = 40L; mon.tick() // retry succeeds
    assert(wins.size == 2)
    // same anchor (lastOK unchanged by the failure), extended end
    assert(wins(0) == ClusterFSM.RecoveryWindow(0L, 30L))
    assert(wins(1) == ClusterFSM.RecoveryWindow(0L, 40L))
    assert(mon.state.state == ClusterState.Ok)
    assert(mon.state.numRecovers == 1L)
  }
}
