package graft.streaming

import graft.streaming.Gateway.{BufferConf, GatewayConf, ListenerConf}

/** Reads the reference's ConfigObj-style INI (※ oemgateway.conf[.dist]
  * — nested sections `[listeners]` / `[buffers]`, one `[[name]]` block
  * per component with `type` and `[[[init_settings]]]` /
  * `[[[runtime_settings]]]` sub-blocks) and assembles a [[GatewayConf]],
  * so an existing gateway deployment's config file drives this engine
  * unchanged. No dependency — ConfigObj INI is line-oriented and ~40
  * lines to read.
  *
  * Type mapping (reflective class names → Spark sources):
  *  - OemGatewaySocketListener            → socket dialect, `port_nb`
  *  - OemGatewayRFM2PiListener / Serial…  → rfm2pi dialect over the
  *    serial→TCP bridge port (`bridge_port`, default 50011) — see
  *    [[Gateway.serialBridgeNote]]
  *  - OemGatewayEmoncmsBuffer             → BufferConf; `domain`+`path`
  *    become the sink identity (out dir under `sinkRoot`), `active` and
  *    `period` map 1:1.
  */
object GatewayConfig {

  def parse(ini: String, sinkRoot: String, checkpointRoot: String): GatewayConf = {
    // section path tracking by bracket depth: [a] → depth 1, [[b]] → 2…
    var path = List.empty[String]
    val sections = scala.collection.mutable.LinkedHashMap.empty[List[String], scala.collection.mutable.LinkedHashMap[String, String]]
    val secRe = """^(\[+)([^\[\]]+)(\]+)\s*$""".r
    val kvRe = """^([^=#\s][^=]*)=(.*)$""".r
    ini.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case secRe(open, name, close) if open.length == close.length =>
        path = path.take(open.length - 1) :+ name.trim
        sections.getOrElseUpdate(path, scala.collection.mutable.LinkedHashMap.empty)
      case kvRe(k, v) =>
        sections.getOrElseUpdate(path, scala.collection.mutable.LinkedHashMap.empty)
          .update(k.trim, v.trim.stripPrefix("\"").stripSuffix("\""))
      case _ => () // tolerate stray lines, as ConfigObj does
    }

    def setting(component: List[String], key: String): Option[String] =
      Seq("init_settings", "runtime_settings")
        .flatMap(sub => sections.get(component :+ sub).flatMap(_.get(key)))
        .headOption

    def componentsOf(group: String): Seq[List[String]] =
      sections.keys.toSeq.filter(p => p.length == 2 && p.head == group)

    val listeners = componentsOf("listeners").map { p =>
      val name = p(1)
      val tpe = sections(p).getOrElse("type", "")
      tpe match {
        case "OemGatewaySocketListener" =>
          ListenerConf(name, dialect = "socket",
            port = setting(p, "port_nb").map(_.toInt).getOrElse(50011))
        case _ => // RFM2Pi / Serial listeners arrive via the TCP bridge
          ListenerConf(name, dialect = "rfm2pi",
            port = setting(p, "bridge_port").map(_.toInt).getOrElse(50011))
      }
    }

    val buffers = componentsOf("buffers").map { p =>
      val name = p(1)
      // ※ OemGatewayEmoncmsBuffer: domain+path+apikey form the bulk
      // endpoint `http://<domain><path>/input/bulk.json?apikey=…`.
      // When the conf names a domain the buffer POSTs for real (S5);
      // without one it falls back to the parquet stand-in sink.
      val postUrl = setting(p, "domain").map { domain =>
        val path = setting(p, "path").getOrElse("")
        val key = setting(p, "apikey").map(k => s"?apikey=$k").getOrElse("")
        s"http://$domain$path/input/bulk.json$key"
      }
      BufferConf(
        name,
        outDir = s"$sinkRoot/$name",
        active = setting(p, "active").forall(_.equalsIgnoreCase("True")),
        periodSeconds = setting(p, "period").map(_.toDouble.toLong).getOrElse(10L),
        postUrl = postUrl)
    }

    GatewayConf(listeners, buffers, checkpointRoot)
  }
}
