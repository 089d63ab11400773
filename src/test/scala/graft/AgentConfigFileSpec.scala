package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.agent.{AgentCli, AgentConfig, AgentConfigFile}
import org.scalatest.funsuite.AnyFunSuite

/** Config-file parity: the reference's TOML surface (sections, the
  * [[influxdb]] server array, name-based master/slave resolution, flag
  * override; mainconfig.go:10-44, main.go:84-85). */
class AgentConfigFileSpec extends AnyFunSuite {

  val sample = """
    |[general]
    | logdir = "./log"          # comment after value
    | check-interval = "10s"
    | min-sync-interval = "20s"
    | master-db = "influxdb01"
    | slave-db = "influxdb02"
    | initial-replication = "both"
    | monitor-retry-interval = "1m"
    | data-chuck-duration = "5m"
    | max-retention-interval = "8760h" # 1 year
    | rw-max-retries = 5
    | rw-retry-delay = "10s"
    | num-workers = 4
    |
    |[http]
    | bind-addr = "0.0.0.0:4090"
    | admin-user = "adm"
    | admin-passwd = "pw"
    |
    |[[influxdb]]
    | release = "1x"
    | name = "influxdb01"
    | location = "/data/master"
    |
    |[[influxdb]]
    | name = "influxdb02"
    | location = "/data/replica"
    |""".stripMargin

  test("parses sections, server array, durations, ints") {
    val p = AgentConfigFile.parse(sample)
    assert(p.general("master-db") == "influxdb01")
    assert(p.http("admin-user") == "adm")
    assert(p.servers.map(s => (s.name, s.location)) == Seq(
      ("influxdb01", "/data/master"), ("influxdb02", "/data/replica")))
    val c = AgentConfigFile.apply(p, AgentConfig("", ""))
    assert(c.masterRoot == "/data/master")  // resolved by name
    assert(c.slaveRoot == "/data/replica")
    assert(c.initialReplication == "both")
    assert(c.chunk == "5m")
    assert(c.maxRetention == "8760h")
    assert(c.rwMaxRetries == 5)
    assert(c.rwRetryDelayMs == 10000L)
    assert(c.numWorkers == 4)
    assert(c.checkIntervalMs == 10000L)
    assert(c.minSyncIntervalMs == 20000L)
    assert(c.monitorRetryIntervalMs == 60000L)
    assert(c.httpPort == 4090)
    assert(c.adminUser == "adm" && c.adminPassword == "pw")
  }

  test("'#' inside quoted values is data, not a comment") {
    val p = AgentConfigFile.parse("""
      |[http]
      | admin-passwd = "p#w"   # real comment
      |[[influxdb]]
      | name = "x"
      | location = "s3a://bucket/root#frag"
      |""".stripMargin)
    assert(p.http("admin-passwd") == "p#w")
    assert(p.servers.head.location == "s3a://bucket/root#frag")
  }

  test("trailing value-taking flag fails with a clear error, not AIOOBE") {
    val e = intercept[IllegalArgumentException] {
      AgentCli.parse(Array("-master", "/m", "-slave", "/s", "-action"))
    }
    assert(e.getMessage.contains("-action"))
  }

  test("-master/-slave flags override the file's master-db/slave-db " +
    "(name or literal URI)") {
    val p = AgentConfigFile.parse(sample)
    val c = AgentConfigFile.apply(p, AgentConfig("", ""),
      master = "influxdb02", slave = "/elsewhere")
    assert(c.masterRoot == "/data/replica") // name resolved
    assert(c.slaveRoot == "/elsewhere")     // literal URI passes through
  }

  test("AgentCli wires -config end-to-end with flag overrides") {
    val f = Files.createTempFile("graft_conf", ".toml")
    Files.write(f, sample.getBytes(StandardCharsets.UTF_8))
    val (action, c) = AgentCli.parse(Array(
      "-config", f.toString, "-action", "copy",
      "-master", "influxdb01", "-chunk", "30m"))
    assert(action == "copy")
    assert(c.masterRoot == "/data/master")
    assert(c.slaveRoot == "/data/replica") // from slave-db in the file
    assert(c.chunk == "30m")               // flag overrides file's 5m
    assert(c.initialReplication == "both")
  }

  test("the shipped conf/sample.graft.toml parses and lands every " +
    "documented key (the sample cannot drift from the loader)") {
    val text = new String(Files.readAllBytes(
      java.nio.file.Paths.get("conf/sample.graft.toml")),
      StandardCharsets.UTF_8)
    val p = AgentConfigFile.parse(text)
    assert(p.servers.map(_.name) == Seq("influxdb01", "influxdb02"))
    val c = AgentConfigFile.apply(p, AgentConfig("", ""))
    assert(c.masterRoot == "/var/lib/graft/master")
    assert(c.slaveRoot == "/var/lib/graft/slave")
    assert(c.httpPort == 4090)
    assert(c.adminUser == "admin" && c.checkIntervalMs == 10000L)
    assert(c.chunk == "60m" && c.numWorkers == 4)
    // the data-plane keys ship commented out (auth-disabled default);
    // uncommented they land (pinned by the TOML auth E2E); here pin
    // the DEFAULTS the sample documents
    assert(c.dataUser.isEmpty && !c.allowMutations)
    // index-maintenance keys ship commented out too (no roots owned)
    assert(c.indexDirs.isEmpty && c.indexMaxHotBatches == 8)
  }

  test("index-maintenance keys land from [general] (r16: index-dirs, " +
    "index-max-hot-batches — the daemon tick's compaction cadence; " +
    "r18: index-max-skew — the tick's drift-repair threshold, " +
    "default-disabled; r19: index-retire-grace-sec — the retirement " +
    "age floor, default 600)") {
    val p = AgentConfigFile.parse("""
      |[general]
      | master-db = "m"
      | slave-db = "s"
      | index-dirs = "/idx/a,/idx/b"
      | index-max-hot-batches = 3
      | index-max-skew = 2.5
      | index-retire-grace-sec = 45
      |[[influxdb]]
      | name = "m"
      | location = "/m"
      |[[influxdb]]
      | name = "s"
      | location = "/s"
      |""".stripMargin)
    val c = AgentConfigFile.apply(p, AgentConfig("", ""))
    assert(c.indexDirs == "/idx/a,/idx/b")
    assert(c.indexMaxHotBatches == 3)
    assert(c.indexMaxSkew == 2.5)
    assert(c.indexRetireGraceSec == 45L)
    // absent key keeps the drift policy OFF (a repair moves data —
    // strictly operator-opt-in) and the grace at its safe default
    assert(AgentConfig("", "").indexMaxSkew == 0.0)
    assert(AgentConfig("", "").indexRetireGraceSec == 600L)
  }
}
