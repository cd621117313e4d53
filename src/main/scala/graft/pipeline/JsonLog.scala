package graft.pipeline

import com.fasterxml.jackson.databind.ObjectMapper

/** Structured JSON-line logging for the engine's own lifecycle events —
  * parity with the reference's DataDog JSON log shipping
  * (`/root/reference/src/main/scala/main.scala:112-114`,
  * `logback.datadog.xml`): one JSON object per line with timestamp, level,
  * event name, global stream tags and per-event fields, written to stderr
  * where any collector (DataDog agent, fluentd, k8s log pipeline) picks it
  * up. Offline there is no agent to ship to, so the shippable FORMAT is the
  * contract; the sink is injectable for tests.
  *
  * Deliberately tiny: the engine's operational events are few (stream
  * start/stop, batch commit, backfill, maintenance, failures) — Spark's own
  * logging stays on log4j and is not rerouted.
  */
object JsonLog {
  private val mapper = new ObjectMapper()

  @volatile private var globalTags: Map[String, String] = Map.empty
  @volatile private var sink: String => Unit = System.err.println(_)

  /** Install global tags (reference: per-stream DD_TAGS — entity, stream
    * id) and optionally a sink override for tests.
    */
  def install(tags: Map[String, String], out: String => Unit = System.err.println(_)): Unit = {
    globalTags = tags
    sink = out
  }

  def info(event: String, fields: (String, Any)*): Unit = emit("INFO", event, fields)
  def warn(event: String, fields: (String, Any)*): Unit = emit("WARN", event, fields)
  def error(event: String, fields: (String, Any)*): Unit = emit("ERROR", event, fields)

  private def emit(level: String, event: String, fields: Seq[(String, Any)]): Unit = {
    val root = mapper.createObjectNode()
    root.put("ts", java.time.Instant.now().toString)
    root.put("level", level)
    root.put("logger", "graft.pipeline")
    root.put("event", event)
    val tags = root.putObject("tags")
    globalTags.foreach { case (k, v) => tags.put(k, v) }
    fields.foreach {
      case (k, v: Long)    => root.put(k, v)
      case (k, v: Int)     => root.put(k, v)
      case (k, v: Double)  => root.put(k, v)
      case (k, v: Boolean) => root.put(k, v)
      case (k, null)       => root.putNull(k)
      case (k, v)          => root.put(k, v.toString)
    }
    sink(root.toString)
  }
}
