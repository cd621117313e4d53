package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

import java.net.{DatagramPacket, DatagramSocket, InetSocketAddress}
import java.nio.charset.StandardCharsets

/** Observability — the reference emits DataDog StatsD metrics for stream
  * progress (SURVEY.md §2.A26; `/root/reference/src/main/scala/main.scala:28,112-114`,
  * CRD beta:137-148). Spark-native equivalent: a `StreamingQueryListener`
  * publishing micro-batch progress as DogStatsD-format UDP datagrams (the
  * protocol is plain text — `metric:value|type|#tags` — so no client
  * library is needed) plus log lines. With no StatsD address configured it
  * degrades to logging only.
  */
final class StatsdEmitter(address: String, globalTags: Map[String, String]) {

  def this(host: String, port: Int, globalTags: Map[String, String]) =
    this(s"$host:$port", globalTags)

  private sealed trait Transport {
    def send(bytes: Array[Byte]): Unit
    def close(): Unit
  }

  // `unix:///path/to/dsd.socket` → DogStatsD over a Unix-domain socket
  // (the reference's containerized transport, main.scala:112-114 — no UDP
  // hop, kernel-local). The JDK's AF_UNIX support (JEP 380) is
  // SOCK_STREAM-only, so this speaks the dogstatsd agent's UDS-STREAM
  // transport: each metric framed with a 4-byte little-endian length
  // prefix. The channel connects lazily and reconnects on failure, so an
  // agent restart drops metrics (never the stream), not the emitter.
  private val transport: Transport =
    if (address.startsWith("unix://")) {
      val target = java.net.UnixDomainSocketAddress.of(
        java.nio.file.Path.of(address.stripPrefix("unix://")))
      new Transport {
        private var ch: java.nio.channels.SocketChannel = _
        private def channel(): java.nio.channels.SocketChannel = {
          if (ch == null || !ch.isConnected)
            ch = java.nio.channels.SocketChannel.open(target)
          ch
        }
        def send(bytes: Array[Byte]): Unit = {
          val framed = java.nio.ByteBuffer.allocate(4 + bytes.length)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          framed.putInt(bytes.length).put(bytes).flip()
          try {
            val c = channel()
            while (framed.hasRemaining) c.write(framed)
          } catch {
            case _: java.io.IOException =>
              if (ch != null) { try ch.close() catch { case _: java.io.IOException => () }; ch = null }
              throw new java.io.IOException("dogstatsd uds send failed") // swallowed by caller
          }
        }
        def close(): Unit = if (ch != null) ch.close()
      }
    } else {
      val (host, port) = address.split(":", 2) match {
        case Array(h, p) => (h, p.toInt)
        case Array(h)    => (h, 8125)
      }
      val socket = new DatagramSocket()
      val target = new InetSocketAddress(host, port)
      new Transport {
        def send(bytes: Array[Byte]): Unit = socket.send(new DatagramPacket(bytes, bytes.length, target))
        def close(): Unit = socket.close()
      }
    }

  private val tagSuffix =
    if (globalTags.isEmpty) ""
    else "|#" + globalTags.map { case (k, v) => s"$k:$v" }.mkString(",")

  def gauge(name: String, value: Double): Unit = send(s"$name:$value|g$tagSuffix")
  def count(name: String, value: Long): Unit = send(s"$name:$value|c$tagSuffix")

  // metrics must never fail the stream — but a systematically-failing
  // transport (e.g. unix:// pointed at a SOCK_DGRAM agent socket, which
  // the stream transport cannot connect to) is logged ONCE so the drop
  // is visible instead of silent
  @volatile private var sendFailureLogged = false
  private def send(payload: String): Unit =
    try transport.send(payload.getBytes(StandardCharsets.UTF_8))
    catch {
      case e: java.io.IOException =>
        if (!sendFailureLogged) {
          sendFailureLogged = true
          System.err.println(s"statsd[$address]: send failed (${e.getMessage}) — " +
            "metrics are being dropped; for unix:// targets the agent socket must be " +
            "SOCK_STREAM (dogstatsd_stream_socket), not the datagram dsd.socket")
        }
    }

  def close(): Unit = transport.close()
}

/** Listener publishing per-batch throughput/latency — the same signal set
  * the reference's framework tracks (rows in, processing rate, batch
  * duration, watermark).
  */
final class GraftMetricsListener(
    statsd: Option[StatsdEmitter],
    prefix: String = "graft.stream",
    session: Option[SparkSession] = None
) extends StreamingQueryListener {

  import StreamingQueryListener._

  // The listener is installed BEFORE its stream starts (Spark offers no
  // per-query listener registration), so it binds to the first query that
  // starts after installation and ignores every other query on the shared
  // session — without this, a JVM hosting streams sequentially stacks
  // unscoped listeners that double-count every batch under stale tags.
  private val boundId = new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)

  private def owns(id: java.util.UUID): Boolean = {
    val b = boundId.get
    b != null && b == id
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    boundId.compareAndSet(null, event.id)

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (owns(p.id)) statsd.foreach { s =>
      s.count(s"$prefix.rows", p.numInputRows)
      s.gauge(s"$prefix.rows_per_second", Option(p.processedRowsPerSecond).getOrElse(0.0))
      Option(p.durationMs.get("triggerExecution")).foreach(d => s.gauge(s"$prefix.batch_ms", d.toDouble))
      s.count(s"$prefix.batches", 1L)
    }
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit =
    if (owns(event.id)) {
      statsd.foreach(_.count(s"$prefix.terminated", 1L))
      // self-uninstall: the bound stream is gone — stop listening and
      // release the emitter socket instead of leaking both for the JVM
      // lifetime of a sequential-stream runner
      session.foreach(_.streams.removeListener(this))
      statsd.foreach(_.close())
    }
}

object Metrics {
  /** Install the metrics listener on a session. StatsD target comes from
    * `statsdAddress` — `host:port` (UDP) or `unix:///path/to/socket` for a
    * Unix-domain STREAM socket (the dogstatsd agent's
    * `dogstatsd_stream_socket`; the JDK's AF_UNIX support is stream-only,
    * so the agent's datagram `dsd.socket` is NOT a valid target — sends
    * to it fail and are dropped with a one-time warning); absent →
    * log-only listener is skipped (Spark already logs progress JSON). The
    * listener binds to the next query started on the session and removes
    * itself (closing its socket) when that query terminates.
    */
  def install(spark: SparkSession, statsdAddress: Option[String], tags: Map[String, String] = Map.empty): Option[GraftMetricsListener] =
    statsdAddress.map { addr =>
      val listener = new GraftMetricsListener(
        Some(new StatsdEmitter(addr, tags)), session = Some(spark))
      spark.streams.addListener(listener)
      listener
    }
}
