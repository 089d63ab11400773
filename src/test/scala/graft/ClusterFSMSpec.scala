package graft

import graft.model.ClusterState
import graft.streaming.{ClusterFSM, HAMonitor}
import org.scalatest.funsuite.AnyFunSuite

/** FSM probe traces per /root/reference/pkg/agent/hacluster.go:266-370
  * (FIXTURES.md §B.5). */
class ClusterFSMSpec extends AnyFunSuite {
  val I = 10L // check interval ns

  test("OK → CHECK_SLAVE_DOWN → RECOVERING → OK with correct window") {
    val st = ClusterFSM.initial(100L)
    // t=110 both up: stays OK, lastOK advances
    val (s1, w1) = ClusterFSM.step(st, 110L, true, true, I)
    assert(s1.state == ClusterState.Ok && s1.slaveLastOkNs == 110L)
    assert(w1.isEmpty)
    // t=120 slave down
    val (s2, w2) = ClusterFSM.step(s1, 120L, true, false, I)
    assert(s2.state == ClusterState.CheckSlaveDown && w2.isEmpty)
    // t=130 still down: hold
    val (s3, w3) = ClusterFSM.step(s2, 130L, true, false, I)
    assert(s3.state == ClusterState.CheckSlaveDown && w3.isEmpty)
    // t=140 slave back: RECOVERING with window [lastOK - I, now]
    val (s4, w4) = ClusterFSM.step(s3, 140L, true, true, I)
    assert(s4.state == ClusterState.Recovering)
    assert(w4.contains(ClusterFSM.RecoveryWindow(110L - I, 140L)))
    // backfill done → OK, counters
    val s5 = ClusterFSM.recoveryDone(s4, 150L, 7L)
    assert(s5.state == ClusterState.Ok)
    assert(s5.numRecovers == 1L && s5.lastRecoverDurationNs == 7L)
  }

  test("master flap does not trigger recovery") {
    val st = ClusterFSM.initial(0L)
    val (s1, w1) = ClusterFSM.step(st, 10L, false, true, I)
    assert(s1.state == ClusterState.Ok && w1.isEmpty)
    assert(s1.masterLastOkNs == 0L) // not advanced while down
  }

  test("HAMonitor runner drives backfill exactly once per outage") {
    var slaveUp = true
    var clock = 0L
    var backfills = Vector.empty[ClusterFSM.RecoveryWindow]
    val mon = new HAMonitor(() => true, () => slaveUp, I,
      w => { backfills :+= w; true }, () => clock)
    clock = 10L; mon.tick()
    slaveUp = false; clock = 20L; mon.tick()
    clock = 30L; mon.tick()
    slaveUp = true; clock = 40L; mon.tick()
    clock = 50L; mon.tick()
    assert(backfills == Vector(ClusterFSM.RecoveryWindow(0L, 40L)))
    assert(mon.state.numRecovers == 1L)
    assert(mon.state.state == ClusterState.Ok)
  }
}
