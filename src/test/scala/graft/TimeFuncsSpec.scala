package graft

import graft.functions.TimeFuncs
import org.scalatest.funsuite.AnyFunSuite

/** Flexible time / duration parsing per /root/reference/pkg/util.go:9-28
  * and client.go:198-207 (FIXTURES.md §B; SURVEY.md §2.8 F2/F4). */
class TimeFuncsSpec extends AnyFunSuite {
  val now = 1700000000L * TimeFuncs.NsPerSecond

  test("unix epoch seconds") {
    assert(TimeFuncs.parseInputTimeNs("1704067200", now) ==
      1704067200L * TimeFuncs.NsPerSecond)
  }

  test("negative Go duration = now - d (util.go:17-21)") {
    assert(TimeFuncs.parseInputTimeNs("-10h", now) ==
      now - 10L * 3600 * TimeFuncs.NsPerSecond)
    assert(TimeFuncs.parseInputTimeNs("-90s", now) ==
      now - 90L * TimeFuncs.NsPerSecond)
  }

  test("RFC3339") {
    assert(TimeFuncs.parseInputTimeNs("2024-01-01T00:00:00Z", now) ==
      1704067200L * TimeFuncs.NsPerSecond)
    assert(TimeFuncs.parseInputTimeNs("2024-01-01T01:00:00+01:00", now) ==
      1704067200L * TimeFuncs.NsPerSecond)
  }

  test("Go durations incl. compound and RP-style (8760h)") {
    assert(TimeFuncs.parseGoDurationNs("8760h") ==
      8760L * 3600 * TimeFuncs.NsPerSecond)
    assert(TimeFuncs.parseGoDurationNs("1h30m") ==
      5400L * TimeFuncs.NsPerSecond)
    assert(TimeFuncs.parseGoDurationNs("500ms") == 500000000L)
    assert(TimeFuncs.parseGoDurationNs("0") == 0L)
  }

  test("unparseable duration throws") {
    intercept[IllegalArgumentException] {
      TimeFuncs.parseGoDurationNs("banana")
    }
  }
}
