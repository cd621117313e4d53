package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Minimal RFC-4180 CSV record parser for Synapse Link incremental CSV
  * chunks: comma-separated, double-quote quoting, `""` escapes a quote
  * inside a quoted field, embedded commas/newlines allowed inside quotes,
  * empty (unquoted zero-length) field = null.
  *
  * Value shapes per the reference fixtures
  * (`/root/reference/src/test/scala/integration/SynapseMetadata.scala:7-22`):
  * `50bff458-...,"1/1/2020 0:00:00 PM",...,,True` — note the bare trailing
  * comma producing a final null field.
  *
  * Spark's own CSV datasource isn't used on the hot path because the source
  * streams whole-blob contents from a custom listing (folder-scoped file
  * identity — same chunk names recur across folders, SURVEY.md §7 hard-part
  * 5); this parser is the per-partition record decoder.
  */
object CsvRecordParser {

  /** Convenience overload for in-memory content (tests, tiny blobs). */
  def parse(content: String, expectedCols: Int): Iterator[Array[String]] =
    parse(new java.io.StringReader(content), expectedCols)

  /** Parse a char stream into records; `null` entries are empty fields.
    * Streaming: the chunk is never materialized as one String, so an
    * arbitrarily large chunk file parses in constant memory (bounded by the
    * longest single record). One-char pushback handles the `""` escape
    * lookahead across buffer boundaries.
    */
  def parse(reader: java.io.Reader, expectedCols: Int): Iterator[Array[String]] = new Iterator[Array[String]] {
    private val in = reader match {
      case b: java.io.BufferedReader => b
      case r => new java.io.BufferedReader(r, 1 << 16)
    }
    private var pushback: Int = -2 // -2 = empty; -1..0xFFFF = pending char/EOF
    private def readChar(): Int =
      if (pushback != -2) { val c = pushback; pushback = -2; c } else in.read()
    private def unread(c: Int): Unit = pushback = c

    private var nextRec: Array[String] = advance()

    private def advance(): Array[String] = {
      var lead = readChar()
      while (lead == '\n' || lead == '\r') lead = readChar()
      if (lead == -1) return null
      unread(lead)
      val fields = new ArrayBuffer[String](expectedCols.max(8))
      val sb = new StringBuilder
      var quoted = false
      var wasQuoted = false
      var done = false
      while (!done) {
        val c = readChar()
        if (c == -1) {
          fields += finishField(sb, wasQuoted)
          done = true
        } else if (quoted) {
          if (c == '"') {
            val nxt = readChar()
            if (nxt == '"') sb.append('"')
            else { quoted = false; unread(nxt) }
          } else sb.append(c.toChar)
        } else c.toChar match {
          case '"' => quoted = true; wasQuoted = true
          case ',' =>
            fields += finishField(sb, wasQuoted)
            sb.clear(); wasQuoted = false
          case '\r' | '\n' =>
            fields += finishField(sb, wasQuoted)
            done = true
          case other => sb.append(other)
        }
      }
      fields.toArray
    }

    private def finishField(sb: StringBuilder, wasQuoted: Boolean): String =
      if (sb.isEmpty && !wasQuoted) null else sb.toString

    override def hasNext: Boolean = nextRec != null
    override def next(): Array[String] = {
      val r = nextRec
      nextRec = advance()
      r
    }
  }
}
