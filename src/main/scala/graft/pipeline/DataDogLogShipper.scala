package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper

import java.net.{DatagramPacket, DatagramSocket, InetAddress, URI}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

/** DataDog-shape log shipper — the offline-feasible analog of the
  * reference's logback DataDog appender (`/root/reference/src/main/
  * resources/logback.datadog.xml`: a LogstashEncoder envelope with
  * service/ddsource/host custom fields over TCP to the datadoghq intake).
  * The intake needs egress and an API key, so this shipper targets the two
  * destinations a collector can drain anywhere — a UDP datagram endpoint
  * (`udp://host:port`, the DogStatsD transport pattern used by
  * [[StatsdEmitter]]) or an append-only file (`file:/path`) — while
  * emitting the exact LogstashEncoder field shape the DataDog pipeline
  * ingests: `@timestamp`, `@version`, `message`, `logger_name`,
  * `thread_name`, `level`, `level_value`, plus the custom `service` /
  * `ddsource` / `host` fields and every JsonLog event field and stream
  * tag.
  *
  * Shipping failures are counted and DROPPED, never thrown — the log path
  * must not take down the stream (stderr still carries every line).
  */
final class DataDogLogShipper(dest: String, service: String = "graft-stream-runner") {
  private val mapper = new ObjectMapper()
  // A malformed destination must not take down the stream either: the
  // shipper degrades to drop-and-count, honoring the never-throw contract
  // even for a config typo.
  private val uri: Option[URI] =
    try Some(new URI(dest)) catch { case _: Exception => None }
  private val droppedLines = new AtomicLong(0)
  private lazy val socket = new DatagramSocket()
  private val host =
    try InetAddress.getLocalHost.getHostName catch { case _: Exception => "unknown" }

  /** Lines that failed to ship (observability for the observability). */
  def dropped: Long = droppedLines.get()

  /** Re-envelope one JsonLog line into the LogstashEncoder/DataDog shape.
    * JsonLog's `ts`/`level`/`logger` map onto `@timestamp`/`level` +
    * `level_value`/`logger_name`; every other field (event name, stream
    * tags, per-event fields) is carried through verbatim.
    */
  def envelope(jsonLogLine: String): String = {
    val src = mapper.readTree(jsonLogLine)
    val root = mapper.createObjectNode()
    root.put("@timestamp",
      if (src.has("ts")) src.get("ts").asText() else java.time.Instant.now().toString)
    root.put("@version", "1")
    root.put("message", if (src.has("event")) src.get("event").asText() else jsonLogLine)
    root.put("logger_name",
      if (src.has("logger")) src.get("logger").asText() else "graft.pipeline")
    root.put("thread_name", Thread.currentThread().getName)
    val level = if (src.has("level")) src.get("level").asText() else "INFO"
    root.put("level", level)
    root.put("level_value", level match {
      case "ERROR" => 40000
      case "WARN"  => 30000
      case _       => 20000
    })
    root.put("service", service)
    root.put("ddsource", "java")
    root.put("host", host)
    src.properties().asScala.foreach { e =>
      if (e.getKey != "ts" && e.getKey != "level" && e.getKey != "logger")
        root.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue)
    }
    root.toString
  }

  def ship(jsonLogLine: String): Unit = uri match {
    case None => droppedLines.incrementAndGet()
    case Some(u) =>
      try {
        val line = envelope(jsonLogLine)
        u.getScheme match {
          case "udp" =>
            val bytes = line.getBytes(StandardCharsets.UTF_8)
            socket.send(new DatagramPacket(bytes, bytes.length,
              InetAddress.getByName(u.getHost), u.getPort))
          case _ =>
            Files.write(Paths.get(u.getPath), (line + "\n").getBytes(StandardCharsets.UTF_8),
              StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        }
      } catch { case _: Exception => droppedLines.incrementAndGet() }
  }

  def close(): Unit =
    try if (uri.exists(_.getScheme == "udp")) socket.close() catch { case _: Exception => () }
}

object DataDogLogShipper {
  // One live shipper per JVM: each JsonLog.install (stream start, backfill)
  // replaces the sink, so the previous shipper's UDP socket would otherwise
  // leak for the JVM lifetime in a runner hosting streams sequentially.
  @volatile private var current: Option[DataDogLogShipper] = None

  /** JsonLog sink that keeps the stderr line AND ships the DataDog
    * envelope when a destination is configured; closes the previously
    * installed shipper, if any.
    */
  def sinkFor(dest: Option[String]): String => Unit = synchronized {
    current.foreach(_.close())
    current = None
    dest match {
      case None => System.err.println(_)
      case Some(d) =>
        val shipper = new DataDogLogShipper(d)
        current = Some(shipper)
        line => { System.err.println(line); shipper.ship(line) }
    }
  }
}
