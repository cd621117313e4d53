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

  /** Parse a full chunk into records; `null` entries are empty fields. */
  def parse(content: String, expectedCols: Int): Iterator[Array[String]] = new Iterator[Array[String]] {
    private var i = 0
    private val n = content.length
    private var nextRec: Array[String] = advance()

    private def advance(): Array[String] = {
      while (i < n && (content.charAt(i) == '\n' || content.charAt(i) == '\r')) i += 1
      if (i >= n) return null
      val fields = new ArrayBuffer[String](expectedCols.max(8))
      val sb = new StringBuilder
      var quoted = false
      var wasQuoted = false
      var done = false
      while (!done) {
        if (i >= n) {
          fields += finishField(sb, wasQuoted)
          done = true
        } else {
          val c = content.charAt(i)
          if (quoted) {
            if (c == '"') {
              if (i + 1 < n && content.charAt(i + 1) == '"') { sb.append('"'); i += 2 }
              else { quoted = false; i += 1 }
            } else { sb.append(c); i += 1 }
          } else c match {
            case '"' => quoted = true; wasQuoted = true; i += 1
            case ',' =>
              fields += finishField(sb, wasQuoted)
              sb.clear(); wasQuoted = false; i += 1
            case '\r' | '\n' =>
              fields += finishField(sb, wasQuoted)
              done = true
            case other => sb.append(other); i += 1
          }
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
