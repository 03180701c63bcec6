package graft

import graft.streaming.GatewayConfig
import org.scalatest.funsuite.AnyFunSuite

/** A realistic oemgateway.conf (the reference's documented ConfigObj
  * shape) must assemble the equivalent GatewayConf: listener types map
  * to dialects/ports, buffer runtime settings map to the active flag
  * and send period, inactive and active buffers both survive parsing.
  */
class GatewayConfigSpec extends AnyFunSuite {

  private val ini =
    """# oemgateway.conf — reference-shaped ConfigObj INI
      |[gateway]
      |loglevel = DEBUG
      |
      |[listeners]
      |    [[RFM2Pi]]
      |        type = OemGatewayRFM2PiListener
      |        [[[init_settings]]]
      |            com_port = /dev/ttyAMA0
      |            bridge_port = 50012
      |        [[[runtime_settings]]]
      |            frequency = 433
      |            group = 210
      |    [[Socket]]
      |        type = OemGatewaySocketListener
      |        [[[init_settings]]]
      |            port_nb = 50011
      |        [[[runtime_settings]]]
      |
      |[buffers]
      |    [[emoncms_local]]
      |        type = OemGatewayEmoncmsBuffer
      |        [[[init_settings]]]
      |        [[[runtime_settings]]]
      |            domain = localhost
      |            active = True
      |            period = 0
      |    [[emoncms_remote]]
      |        type = OemGatewayEmoncmsBuffer
      |        [[[init_settings]]]
      |        [[[runtime_settings]]]
      |            domain = emoncms.org
      |            active = False
      |            period = 30
      |""".stripMargin

  test("reference-shaped INI assembles the equivalent GatewayConf") {
    val c = GatewayConfig.parse(ini, sinkRoot = "/tmp/sinks", checkpointRoot = "/tmp/ckpt")

    assert(c.listeners.map(_.name) === Seq("RFM2Pi", "Socket"))
    val rfm = c.listeners.head
    assert(rfm.dialect === "rfm2pi" && rfm.port === 50012)
    val sock = c.listeners(1)
    assert(sock.dialect === "socket" && sock.port === 50011)

    assert(c.buffers.map(_.name) === Seq("emoncms_local", "emoncms_remote"))
    val local = c.buffers.head
    assert(local.active && local.periodSeconds === 0L && local.outDir === "/tmp/sinks/emoncms_local")
    val remote = c.buffers(1)
    assert(!remote.active && remote.periodSeconds === 30L)
  }
}
