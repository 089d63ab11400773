package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.api.StatusServer
import graft.model.ClusterStatus
import org.scalatest.funsuite.AnyFunSuite

/** /api/health + /api/queryactive per /root/reference/pkg/webui/api.go. */
class StatusServerSpec extends AnyFunSuite {

  test("health and queryactive endpoints serve cluster state JSON") {
    val status = ClusterStatus("OK", 2L, 2473620691L, masterState = true,
      masterLastOkNs = 111L, slaveState = false, slaveLastOkNs = 99L)
    val srv = new StatusServer(0, () => status,
      () => Seq("influxdb01" -> true, "influxdb02" -> false))
    srv.start()
    try {
      val client = HttpClient.newHttpClient()
      def get(path: String): String = client.send(
        HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:${srv.boundPort}$path")).GET().build(),
        HttpResponse.BodyHandlers.ofString()).body()

      val health = get("/api/health")
      assert(health.contains("\"ClusterState\":\"OK\""))
      assert(health.contains("\"ClusterNumRecovers\":2"))
      assert(health.contains("\"ClusterLastRecoverDuration\":2473620691"))
      assert(health.contains("\"Active\":false"))

      val active = get("/api/queryactive")
      assert(active == "[\"influxdb01\"]")
    } finally srv.stop()
  }
}
