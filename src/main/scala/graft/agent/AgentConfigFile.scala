package graft.agent

import java.nio.charset.StandardCharsets

import graft.functions.TimeFuncs
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Config-file loader — the reference's TOML config surface
  * (/root/reference/pkg/config/mainconfig.go:10-44;
  * conf/sample.syncflux.toml): a `[general]` section with the sync knobs,
  * `[http]` with the API credentials, and an `influxdb` array-of-tables (double-bracket TOML sections)
  * whose entries are addressed by NAME via `master-db`/`slave-db` (or the
  * `-master`/`-slave` flags, main.go:84-85). In the engine a server's
  * `location` is a storage root URI instead of an HTTP endpoint.
  *
  * Parser is a deliberate TOML subset — sections, array-of-table headers,
  * `key = value` with quoted strings / ints / bools — which covers the
  * reference's entire config file; no external dependency.
  */
object AgentConfigFile {

  final case class Server(name: String, location: String)

  final case class Parsed(
      general: Map[String, String],
      http: Map[String, String],
      servers: Seq[Server])

  def parse(text: String): Parsed = {
    var section = ""
    var general = Map.empty[String, String]
    var http = Map.empty[String, String]
    var servers = Vector.empty[Map[String, String]]
    // strip comments quote-aware: '#' inside a quoted value is data
    // (passwords, URIs with fragments), not a comment
    def stripComment(raw: String): String = {
      val sb = new StringBuilder
      var inQuotes = false
      var done = false
      raw.foreach { ch =>
        if (!done) {
          if (ch == '"') inQuotes = !inQuotes
          if (ch == '#' && !inQuotes) done = true else sb.append(ch)
        }
      }
      sb.toString
    }
    text.linesIterator.foreach { raw =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        if (line.startsWith("[[") && line.endsWith("]]")) {
          section = line.drop(2).dropRight(2).trim
          if (section == "influxdb") servers :+= Map.empty[String, String]
        } else if (line.startsWith("[") && line.endsWith("]")) {
          section = line.drop(1).dropRight(1).trim
        } else line.split("=", 2) match {
          case Array(k, v) =>
            val key = k.trim
            val value = v.trim.stripPrefix("\"").stripSuffix("\"")
            section match {
              case "general" => general += (key -> value)
              case "http"    => http += (key -> value)
              case "influxdb" if servers.nonEmpty =>
                servers = servers.init :+ (servers.last + (key -> value))
              case _ => ()
            }
          case _ => ()
        }
      }
    }
    Parsed(general, http,
      servers.collect {
        case m if m.contains("name") && m.contains("location") =>
          Server(m("name"), m("location"))
      })
  }

  def read(path: String, conf: Configuration): Parsed = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes)
      parse(new String(bytes, StandardCharsets.UTF_8))
    } finally in.close()
  }

  private def durMs(s: String): Long =
    TimeFuncs.parseGoDurationNs(s) / 1000000L

  /** Apply the parsed file onto a base AgentConfig. `master`/`slave` are
    * server NAMES resolved through the `influxdb` array-of-tables (empty →
    * `master-db`/`slave-db` from [general], agent.go:69-74); a name not
    * in the array is taken as a literal root URI (engine extension). */
  def apply(parsed: Parsed, base: AgentConfig,
      master: String = "", slave: String = ""): AgentConfig = {
    val g = parsed.general
    def resolve(nameOrUri: String): String =
      parsed.servers.find(_.name == nameOrUri).map(_.location)
        .getOrElse(nameOrUri)
    val masterName =
      if (master.nonEmpty) master else g.getOrElse("master-db", "")
    val slaveName =
      if (slave.nonEmpty) slave else g.getOrElse("slave-db", "")
    var c = base
    if (masterName.nonEmpty) c = c.copy(masterRoot = resolve(masterName))
    if (slaveName.nonEmpty) c = c.copy(slaveRoot = resolve(slaveName))
    g.get("initial-replication").foreach(v =>
      c = c.copy(initialReplication = v))
    g.get("data-chuck-duration").foreach(v => c = c.copy(chunk = v))
    g.get("max-retention-interval").foreach(v =>
      c = c.copy(maxRetention = v))
    g.get("rw-max-retries").foreach(v =>
      c = c.copy(rwMaxRetries = v.toInt))
    g.get("rw-retry-delay").foreach(v =>
      c = c.copy(rwRetryDelayMs = durMs(v)))
    g.get("num-workers").foreach(v => c = c.copy(numWorkers = v.toInt))
    g.get("check-interval").foreach(v =>
      c = c.copy(checkIntervalMs = durMs(v)))
    g.get("min-sync-interval").foreach(v =>
      c = c.copy(minSyncIntervalMs = durMs(v)))
    g.get("monitor-retry-interval").foreach(v =>
      c = c.copy(monitorRetryIntervalMs = durMs(v)))
    g.get("max-points-on-single-write").foreach(_ => ()) // sink-level knob
    // engine extension: post-copy checksum verification
    g.get("verify-after-copy").foreach(v =>
      c = c.copy(verifyAfterCopy = v.toBoolean))
    // engine extension: `-action curate` pipeline keys
    g.get("curate-min-chars").foreach(v => c = c.copy(curateMinChars = v))
    g.get("curate-max-chars").foreach(v => c = c.copy(curateMaxChars = v))
    g.get("curate-langs").foreach(v => c = c.copy(curateLangs = v))
    g.get("curate-dedupe").foreach(v =>
      c = c.copy(curateDedupe = v.toBoolean))
    g.get("curate-sample").foreach(v => c = c.copy(curateSample = v))
    g.get("curate-split").foreach(v =>
      c = c.copy(curateSplit = v.toBoolean))
    // engine extension: growing-index maintenance roots — the daemon
    // tick folds each root's hot tail past the threshold (single-
    // writer contract: list a root only if THIS daemon owns its
    // ingest). CLI twins: -indexdirs / -index-maxhot.
    g.get("index-dirs").foreach(v => c = c.copy(indexDirs = v))
    g.get("index-max-hot-batches").foreach(v =>
      c = c.copy(indexMaxHotBatches = v.toInt))
    // IVF drift repair: list-skew threshold for the tick's
    // re-cluster policy; 0 = disabled. CLI twin: -index-maxskew.
    g.get("index-max-skew").foreach(v =>
      c = c.copy(indexMaxSkew = v.toDouble))
    // retirement-grace age floor for retired epoch dirs (seconds).
    // CLI twin: -index-retiregrace.
    g.get("index-retire-grace-sec").foreach(v =>
      c = c.copy(indexRetireGraceSec = v.toLong))
    // [http]: bind-addr port + admin credentials (mainconfig.go:39-44)
    parsed.http.get("bind-addr").foreach { ba =>
      ba.split(':').lastOption.flatMap(p => scala.util.Try(p.toInt).toOption)
        .foreach(p => c = c.copy(httpPort = p))
    }
    parsed.http.get("admin-user").foreach(v => c = c.copy(adminUser = v))
    parsed.http.get("admin-passwd").foreach(v =>
      c = c.copy(adminPassword = v))
    // engine extension: the served data plane's credentials + the
    // destructive-statement opt-in (the reference's hamonitor serves
    // only the ops UI; this engine also serves /query + /write)
    parsed.http.get("data-user").foreach(v => c = c.copy(dataUser = v))
    parsed.http.get("data-passwd").foreach(v =>
      c = c.copy(dataPassword = v))
    parsed.http.get("allow-mutations").foreach(v =>
      c = c.copy(allowMutations = v.toBoolean))
    c
  }
}
