package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model.ClusterStatus

/** Minimal ops HTTP API over the cluster status — the webui analog
  * (/root/reference/pkg/webui/api.go):
  *   GET /api/health       → cluster status JSON (api.go:15,24-28;
  *                           payload per hacluster.go:46-72)
  *   GET /api/queryactive  → names of currently-healthy servers
  *                           (api.go:18,30-45)
  * JDK built-in httpserver: zero new dependencies, driver-side only
  * (SURVEY.md §2.11).
  */
final class StatusServer(
    port: Int,
    status: () => ClusterStatus,
    serverNames: () => Seq[(String, Boolean)]) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    os.write(bytes); os.close()
  }

  /** JSON string escape: backslash, quote, and all control chars — server
    * names and state strings are caller-supplied, so interpolating them
    * raw could emit invalid JSON. */
  private def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def healthJson(s: ClusterStatus): String =
    s"""{"ClusterState":${jstr(s.clusterState)},""" +
      s""""ClusterNumRecovers":${s.clusterNumRecovers},""" +
      s""""ClusterLastRecoverDuration":${s.clusterLastRecoverDurationNs},""" +
      s""""MID":{"Active":${s.masterState},"LastOK":${s.masterLastOkNs}},""" +
      s""""SID":{"Active":${s.slaveState},"LastOK":${s.slaveLastOkNs}}}"""

  def queryActiveJson(names: Seq[(String, Boolean)]): String =
    names.collect { case (n, true) => jstr(n) }
      .mkString("[", ",", "]")

  def start(): Unit = {
    server.createContext("/api/health",
      (ex: HttpExchange) => respond(ex, 200, healthJson(status())))
    server.createContext("/api/queryactive",
      (ex: HttpExchange) => respond(ex, 200, queryActiveJson(serverNames())))
    server.setExecutor(null)
    server.start()
  }

  def stop(): Unit = server.stop(0)

  def boundPort: Int = server.getAddress.getPort
}
