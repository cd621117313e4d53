package graft

import graft.queries.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared surface (implemented in
  * [[graft.queries.Queries]]); `oracleSql` gives the DuckDB-equivalent SQL
  * for every query whose semantics are SQL-expressible. Queries built on
  * engine-specific primitives (xxhash sketches, LSH banding, stub codecs)
  * are deliberately absent from `oracleSql` → rows-only check.
  *
  * Float determinism contract with the oracles: aggregates over doubles go
  * through exact decimal summation on BOTH sides (see Queries.xsum), and
  * per-row double expressions use structurally identical IEEE op sequences,
  * so hashes match bit-for-bit.
  */
object SparkEntry {

  /** DuckDB oracle for q_unicode_clean, generated from the SAME
    * [[graft.ext.TextAnalysis.MojibakeTable]] and the same dirty-prefix
    * constant the Spark query plants — a table edit can never
    * desynchronize engine and oracle. The regex character classes are the
    * RE2 spellings of the Java-regex constants in TextAnalysis
    * (`\x{...}` for code points above 0x7F inside classes); nfc_normalize
    * is DuckDB's NFC, verified equal to java.text.Normalizer on the
    * planted cases.
    */
  private def unicodeCleanOracle: String = {
    def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"
    val inner = sqlLit(graft.queries.Queries.UnicodeDirtyPrefix) + " || text"
    val moji = graft.ext.TextAnalysis.MojibakeTable.foldLeft(inner) {
      case (e, (from, to)) => s"replace($e, ${sqlLit(from)}, ${sqlLit(to)})"
    }
    val nfc = s"nfc_normalize($moji)"
    val ctrl = s"""regexp_replace($nfc, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]', '', 'g')"""
    val invis = s"""regexp_replace($ctrl, '[\\x{200B}\\x{FEFF}\\x{00AD}]', '', 'g')"""
    val spaces =
      s"""regexp_replace($invis, '[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]', ' ', 'g')"""
    val collapsed = s"""regexp_replace($spaces, ' {2,}', ' ', 'g')"""
    s"""SELECT doc_id, trim($collapsed) AS clean_text
       |FROM documents WHERE doc_id < 300
       |ORDER BY doc_id""".stripMargin
  }

  /** Render a double array as a DuckDB list literal. Double.toString is the
    * shortest round-trip decimal form, so DuckDB parses back the exact same
    * IEEE value — the oracle's plane/centroid constants are bit-identical
    * to the Spark plan literals.
    */
  private def sqlArr(xs: Array[Double]): String = xs.mkString("[", ", ", "]")

  /** DuckDB oracle for q_ann_lsh, generated from the SAME hyperplane
    * constants the Spark query uses (Similarity.hyperplanes(4, 64)): sign
    * buckets, Hamming-1 multi-probe, cosine top-10 — the oracle replays the
    * exact approximate semantics, so the gate proves the distributed
    * bucketed join implements the declared LSH algorithm bit-exactly.
    */
  private def annLshOracle: String = {
    val planes = graft.ext.Similarity.hyperplanes(numPlanes = 4, dim = 64)
    val bits = planes.zipWithIndex
      .map { case (p, i) =>
        s"CASE WHEN list_dot_product(v, ${sqlArr(p)}) >= 0 THEN ${1L << i} ELSE 0 END" }
      .mkString("\n      + ")
    val probes = (0 until planes.length).map(i => s"xor(bucket, ${1L << i})").mkString(", ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (
       |  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
       |    CAST($bits AS BIGINT) AS bucket
       |  FROM e),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, nrm AS qn,
       |    unnest([bucket, $probes]) AS probe
       |  FROM b WHERE vec_id < 50),
       |scored AS (
       |  SELECT query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(qv, c.v) / (qn * c.nrm) AS score
       |  FROM probes JOIN b c ON c.bucket = probes.probe AND probes.query_id <> c.vec_id)
       |SELECT query_id, neighbor_id FROM (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
       |  FROM scored) t
       |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin
  }

  /** DuckDB oracle for q_text_langid, generated from the SAME marker table
    * the Spark expression uses (TextAnalysis.LangMarkers): per-language
    * marker-occurrence counts, argmax with (score, lang) lexicographic
    * tie-break, 'und' when nothing scores.
    */
  /** The marker-scoring SQL fragments shared by [[langIdOracle]] and
    * [[langSegmentsOracle]] — generated from the SAME marker table the
    * Spark expression uses, so both gates stay formula-locked to it.
    */
  private def langScoreCols: String = {
    val langs = graft.ext.TextAnalysis.LangMarkers.toSeq.sortBy(_._1)
    langs.map { case (lang, markers) =>
      val terms = markers
        .map { m =>
          val esc = m.replace("'", "''")
          s"(len(pad) - len(replace(pad, '$esc', ''))) // ${m.length}" }
        .mkString(" + ")
      s"$terms AS s_$lang"
    }.mkString(",\n    ")
  }

  private def langScoreBranches(keyCols: String): String =
    graft.ext.TextAnalysis.LangMarkers.keys.toSeq.sorted.map { lang =>
      s"SELECT $keyCols, '$lang' AS lang, s_$lang AS score FROM s" }.mkString("\n  UNION ALL ")

  private def langIdOracle: String =
    s"""WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS pad FROM documents),
       |s AS (
       |  SELECT doc_id,
       |    $langScoreCols
       |  FROM p),
       |x AS (
       |  ${langScoreBranches("doc_id")}),
       |r AS (
       |  SELECT doc_id, lang, score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
       |  FROM x)
       |SELECT doc_id, CASE WHEN score <= 0 THEN 'und' ELSE lang END AS lang_id
       |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for q_lang_segments: per-LINE marker argmax (the
    * [[langIdOracle]] formulation keyed on (doc_id, line_no)) fused into
    * same-language islands — lines derive from documents by the same
    * div/mod grouping the Spark query uses.
    */
  private def langSegmentsOracle: String =
    s"""WITH l AS (SELECT doc_id // 5 AS doc_id, doc_id % 5 AS line_no, text AS line
       |  FROM documents WHERE text IS NOT NULL),
       |p AS (SELECT doc_id, line_no, ' ' || lower(line) || ' ' AS pad FROM l),
       |s AS (
       |  SELECT doc_id, line_no,
       |    $langScoreCols
       |  FROM p),
       |x AS (
       |  ${langScoreBranches("doc_id, line_no")}),
       |r AS (
       |  SELECT doc_id, line_no, lang, score,
       |    row_number() OVER (PARTITION BY doc_id, line_no ORDER BY score DESC, lang DESC) AS rn
       |  FROM x),
       |lng AS (SELECT doc_id, line_no,
       |    CASE WHEN score <= 0 THEN 'und' ELSE lang END AS lang FROM r WHERE rn = 1),
       |lagd AS (SELECT doc_id, line_no, lang,
       |  lag(lang) OVER (PARTITION BY doc_id ORDER BY line_no) AS prev FROM lng),
       |isl AS (SELECT doc_id, line_no, lang,
       |  sum(CASE WHEN prev IS NULL OR prev <> lang THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY line_no) AS seg FROM lagd)
       |SELECT doc_id, lang, min(line_no) AS seg_start, max(line_no) AS seg_end,
       |  count(*) AS n_lines
       |FROM isl GROUP BY doc_id, seg, lang
       |ORDER BY doc_id, seg_start""".stripMargin

  /** DuckDB oracle for q_bpe_train: the 8 BPE merge rounds unrolled as
    * CTEs — per round the pair counts over the word-repr table, the
    * (count desc, pair) top-1, and the sentinel-space `replace`
    * re-segmentation, replaying `TextAnalysis.bpeTrain` verbatim
    * (strings + integers, bit-exact; both engines' `replace` is
    * left-to-right non-overlapping).
    */
  private def bpeTrainOracle(rounds: Int): String = {
    val sel = (1 to rounds)
      .map(k => s"SELECT $k AS round, pair, replace(pair, ' ', '') AS merged, cnt FROM t$k")
      .mkString(" UNION ALL ")
    s"WITH ${bpeCtes(rounds)}\nSELECT * FROM ($sel) ORDER BY round"
  }

  /** Shared CTE block for the BPE oracles: word-count table, per-round
    * pair counts / top pair / replace re-segmentation. The word `w` rides
    * along every round so [[bpeEncodeOracle]] can join documents back
    * against the final segmentation (the train oracle ignores it).
    *
    * Every CTE is `AS MATERIALIZED`: DuckDB otherwise inlines the chain
    * (r8 → r7 twice: once via p8, once directly), re-evaluating r0
    * exponentially many times — measured >400 s vs 0.5 s materialized at
    * sf0.01. Spark never sees this SQL, so the DuckDB-specific keyword
    * is safe.
    */
  private def bpeCtes(rounds: Int): String = {
    val head = Seq(
      """tok AS MATERIALIZED (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS w FROM documents WHERE text IS NOT NULL)""".stripMargin,
      "w0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w)",
      """r0 AS MATERIALIZED (SELECT w, array_to_string(list_transform(range(1, len(w) + 1),
        |    i -> substr(w, CAST(i AS INT), 1)), ' ') AS repr, cnt FROM w0)""".stripMargin)
    val perRound = (1 to rounds).flatMap { k =>
      Seq(
        s"""p$k AS MATERIALIZED (SELECT s[CAST(i AS INT)] || ' ' || s[CAST(i AS INT) + 1] AS pair,
           |    CAST(sum(cnt) AS BIGINT) AS cnt
           |  FROM (SELECT string_split(repr, ' ') AS s, cnt FROM r${k - 1}),
           |    LATERAL unnest(range(1, len(s))) t(i) GROUP BY 1)""".stripMargin,
        s"t$k AS MATERIALIZED (SELECT pair, cnt FROM p$k ORDER BY cnt DESC, pair LIMIT 1)",
        s"""r$k AS MATERIALIZED (SELECT w, trim(replace(' ' || repr || ' ',
           |    ' ' || (SELECT pair FROM t$k) || ' ',
           |    ' ' || replace((SELECT pair FROM t$k), ' ', '') || ' ')) AS repr, cnt
           |  FROM r${k - 1})""".stripMargin)
    }
    (head ++ perRound).mkString(",\n")
  }

  /** DuckDB oracle for q_bpe_encode: the training rounds unrolled (same
    * CTEs as the train oracle), then documents' words joined against the
    * final segmentation and piece counts summed per doc — replaying
    * `TextAnalysis.bpeEncode` verbatim.
    */
  private def bpeEncodeOracle(rounds: Int): String =
    s"""WITH ${bpeCtes(rounds)},
       |docw AS (SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |j AS (SELECT d.doc_id,
       |    CAST(len(string_split(r.repr, ' ')) AS BIGINT) AS pieces
       |  FROM docw d JOIN r$rounds r ON d.w = r.w)
       |SELECT doc_id, CAST(sum(pieces) AS BIGINT) AS bpe_tokens,
       |  CAST(count(*) AS BIGINT) AS n_words
       |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for q_blocklist: per-length gram comprehensions
    * (guarded so texts shorter than n contribute nothing for that
    * length), one membership join against the VALUES blocklist, per
    * (doc, phrase) counts — derived from Queries.GateBlocklist so the
    * two sides cannot drift.
    */
  private def blocklistOracle: String = {
    val phrases = graft.queries.Queries.GateBlocklist
      .map(p => p.trim.toLowerCase.split("\\s+").mkString(" ")).distinct
    val values = phrases.map(p => s"('${p.replace("'", "''")}')").mkString(", ")
    val lengths = phrases.map(_.split(" ").length).distinct.sorted
    val perLen = lengths.map { n =>
      val gram = if (n == 1) "array_to_string(tk[i:i], ' ')"
      else s"array_to_string(tk[i:i+${n - 1}], ' ')"
      val rng = s"range(1, len(tk) - ${n - 1} + 1)"
      if (n == 1) s"[$gram for i in $rng]"
      else s"CASE WHEN len(tk) >= $n THEN [$gram for i in $rng] ELSE [] END"
    }
    val concat = perLen.reduce((a, b) => s"list_concat($a, $b)")
    s"""WITH toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |    x -> len(x) > 0) AS tk
       |  FROM documents WHERE text IS NOT NULL),
       |g AS (SELECT doc_id, unnest($concat) AS gram FROM toks),
       |bl(phrase) AS (VALUES $values)
       |SELECT doc_id, phrase, count(*) AS n_hits
       |FROM g JOIN bl ON gram = phrase
       |GROUP BY doc_id, phrase ORDER BY doc_id, phrase""".stripMargin
  }

  /** DuckDB oracle for q_gopher_rules: every ratio rule replayed in the
    * cross-multiplied INTEGER form of `TextAnalysis.gopherRules` — no
    * float division on either side — with the stopword list generated
    * from the same [[graft.ext.TextAnalysis.Stopwords]] constant so the
    * two sides cannot drift.
    */
  private def gopherRulesOracle: String = {
    val stops = graft.ext.TextAnalysis.Stopwords.map(s => s"'$s'")
      .mkString("[", ", ", "]")
    s"""WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
       |tk AS (SELECT doc_id, text,
       |  list_filter(string_split_regex(lower(trim(text)), '\\s+'),
       |    x -> len(x) > 0) AS tk
       |  FROM d),
       |m AS (SELECT doc_id,
       |  CAST(len(tk) AS BIGINT) AS n_words,
       |  CAST(coalesce(list_sum(list_transform(tk,
       |    x -> CAST(len(x) AS BIGINT))), 0) AS BIGINT) AS sum_len,
       |  list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS lines,
       |  CAST(len(regexp_extract_all(text, '[#…]')) AS BIGINT) AS hash_ellipsis,
       |  CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha_words,
       |  CAST(len(list_filter(tk, x -> list_contains($stops, x))) AS BIGINT) AS stop_hits
       |  FROM tk),
       |mm AS (SELECT doc_id, n_words, sum_len, hash_ellipsis, alpha_words, stop_hits,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(len(list_filter(lines,
       |    l -> regexp_matches(trim(l), '^[-*•]'))) AS BIGINT) AS bullet_lines,
       |  CAST(len(list_filter(lines,
       |    l -> regexp_matches(trim(l), '(\\.\\.\\.|…)$$'))) AS BIGINT) AS ellipsis_lines
       |  FROM m)
       |SELECT doc_id,
       |  n_words > 0 AND n_words >= 50 AND n_words <= 100000 AS r_word_count,
       |  n_words > 0 AND sum_len >= n_words * 3 AND sum_len <= n_words * 10 AS r_mean_word_len,
       |  n_words > 0 AND hash_ellipsis * 10 <= n_words AS r_hash_ellipsis,
       |  n_words > 0 AND bullet_lines * 10 < n_lines * 9 AS r_bullet_lines,
       |  n_words > 0 AND ellipsis_lines * 10 < n_lines * 3 AS r_ellipsis_lines,
       |  n_words > 0 AND alpha_words * 10 >= n_words * 8 AS r_alpha_words,
       |  n_words > 0 AND stop_hits >= 2 AS r_stopwords,
       |  (n_words > 0 AND n_words >= 50 AND n_words <= 100000)
       |    AND (sum_len >= n_words * 3 AND sum_len <= n_words * 10)
       |    AND (hash_ellipsis * 10 <= n_words)
       |    AND (bullet_lines * 10 < n_lines * 9)
       |    AND (ellipsis_lines * 10 < n_lines * 3)
       |    AND (alpha_words * 10 >= n_words * 8)
       |    AND (stop_hits >= 2) AS keep
       |FROM mm ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for q_bpe_fertility: [[bpeEncodeOracle]]'s encode
    * join rolled up per language in truncating integer permille.
    */
  private def bpeFertilityOracle(rounds: Int): String =
    s"""WITH ${bpeCtes(rounds)},
       |docw AS (SELECT doc_id, unnest(list_filter(
       |    string_split_regex(lower(trim(text)), '\\s+'), x -> len(x) > 0)) AS w
       |  FROM documents WHERE text IS NOT NULL),
       |j AS (SELECT d.doc_id,
       |    CAST(len(string_split(r.repr, ' ')) AS BIGINT) AS pieces
       |  FROM docw d JOIN r$rounds r ON d.w = r.w),
       |agg AS (SELECT doc_id, CAST(sum(pieces) AS BIGINT) AS bt,
       |    CAST(count(*) AS BIGINT) AS nw
       |  FROM j GROUP BY doc_id)
       |SELECT dd.lang, CAST(sum(bt) AS BIGINT) AS sum_bpe_tokens,
       |  CAST(sum(nw) AS BIGINT) AS sum_words,
       |  (1000 * CAST(sum(bt) AS BIGINT)) // CAST(sum(nw) AS BIGINT) AS fertility_permille
       |FROM agg JOIN documents dd USING (doc_id)
       |GROUP BY dd.lang ORDER BY dd.lang""".stripMargin

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q5LocalSupplierVolume(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2 + north-star ext ops. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** DuckDB oracles. Table names resolve to `<sfDir>/<name>.parquet`.
    * q_export_iceberg_mor restates q_cdc_merge_mor verbatim: the gate
    * drives the exact same scenario but reads the uncompacted
    * merge-on-read table exclusively THROUGH the exported Iceberg v2
    * metadata (data manifests plus the content=1 equality-delete manifest
    * applied by sequence number), so the relational truth is identical.
    */
  def oracleSql: Map[String, String] =
    oracleSqlBase +
      ("q_export_iceberg_mor" -> oracleSqlBase("q_cdc_merge_mor")) +
      // the Delta leg of the same scenario: the uncompacted MoR table read
      // through _delta_log with protocol deletion vectors applied
      ("q_export_delta_mor" -> oracleSqlBase("q_cdc_merge_mor")) +
      // the persisted-index path answers the same question as the direct
      // operator (same corpus, increment, parameters, threshold), so the
      // exhaustive cross-join truth is identical — recall 1.0 through the
      // stored signatures too
      ("q_incremental_near_dup_indexed" -> oracleSqlBase("q_incremental_near_dup")) +
      // the Delta leg's pruned point lookup drives the same lifecycle as
      // the Iceberg leg's (the change batch lands as mergeOnRead DVs, but
      // upsert/tombstone truth is identical), so the oracle is shared
      ("q_export_delta_point_lookup" -> oracleSqlBase("q_export_point_lookup"))

  private lazy val oracleSqlBase: Map[String, String] = Map(
    // SCD2 replay: same (ts, event_id) total order, first-row detection
    // via row_number (NOT `prev IS NULL` — a NULL attribute in the prior
    // row must not look like "no prior row"), NULL-safe change test via
    // IS DISTINCT FROM, validity bounds as exact epoch micros.
    "q_scd2_history" ->
      """WITH w AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |chg AS (
        |  SELECT user_id, event_id, ts, event_type FROM w
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |v AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version,
        |    ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM chg)
        |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
        |  epoch_us(valid_from) AS valid_from_us,
        |  epoch_us(valid_to) AS valid_to_us,
        |  valid_to IS NULL AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,

    // HTML extraction replay: identical page synthesis, then the exact
    // regex chain (RE2 ⊆ Java semantics for every construct used: inline
    // (?is), non-greedy, no backreferences), entity decode in the same
    // order (&amp; last), whitespace collapse + trim. chr(39) is the
    // single quote (avoids SQL-escape noise).
    "q_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |    '</title><style>p { color: red; }</style>' ||
        |    '<script>var x = "<b>bold</b>"; if (1 < 2) { y = "&amp;"; }</script></head>' ||
        |    '<body><!-- hidden --><h1>Heading ' || CAST(doc_id AS VARCHAR) ||
        |    '</h1><p>' || text || '</p>' ||
        |    CASE WHEN doc_id % 3 = 0
        |      THEN '<ul><li>alpha &amp; beta</li><li>&lt;tag&gt; &quot;q&quot; &#39;s&#39; x&nbsp;y</li></ul>'
        |      ELSE '' END ||
        |    '</body></html>' AS html
        |  FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, html,
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |        '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g') AS raw
        |  FROM h),
        |d AS (SELECT doc_id, html,
        |    replace(replace(replace(replace(replace(replace(raw,
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |      '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&') AS dec
        |  FROM s)
        |SELECT doc_id,
        |  regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS title,
        |  trim(regexp_replace(dec, '\s+', ' ', 'g')) AS body_text,
        |  CAST(len(trim(regexp_replace(dec, '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_gopher_rules" -> gopherRulesOracle,

    // Native session-window replay: gaps-and-islands in exact epoch
    // micros. Spark's `session_window` spans are [start, last + gap] and
    // MERGE when the next event lands on-or-before the current end — an
    // event at EXACTLY prev + gap still extends the session (pinned by
    // StreamOpsSpec), so the break condition is the STRICT diff > gap;
    // end = last event + gap.
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
        |l AS (SELECT user_id, event_id, t, value,
        |  lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev FROM e),
        |m AS (SELECT user_id, event_id, t, value,
        |  CASE WHEN prev IS NULL OR t - prev > 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT user_id, t, value,
        |  CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id) AS BIGINT) AS sid FROM m)
        |SELECT user_id, min(t) AS start_us, max(t) + 1800000000 AS end_us,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS session_value
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_us""".stripMargin,

    // Windowed distinct replay: exact per-(hour, type) distinct users;
    // the HLL estimate is engine-specific, so the oracle pins its
    // contract column to true (like q_approx_distinct).
    "q_window_distinct" ->
      """WITH w AS (SELECT event_type, user_id,
        |    epoch_us(ts) - (epoch_us(ts) % 3600000000) AS wstart_us FROM events)
        |SELECT wstart_us, event_type, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users_exact, true AS within_5pct
        |FROM w GROUP BY wstart_us, event_type
        |ORDER BY wstart_us, event_type""".stripMargin,

    // Interval-overlap replay: the plain inequality join the bucketized
    // operator must exactly reproduce.
    "q_interval_join" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS lo,
        |    epoch_us(ts) + 300000000 AS hi FROM events),
        |a AS (SELECT user_id, event_id AS a_id, lo AS a_lo, hi AS a_hi
        |  FROM e WHERE event_id % 2 = 0),
        |b AS (SELECT user_id, event_id AS b_id, lo AS b_lo, hi AS b_hi
        |  FROM e WHERE event_id % 2 = 1)
        |SELECT a.user_id, a_id, b_id,
        |  least(a_hi, b_hi) - greatest(a_lo, b_lo) AS overlap_us
        |FROM a JOIN b ON a.user_id = b.user_id
        |  AND a_lo <= b_hi AND b_lo <= a_hi
        |ORDER BY a.user_id, a_id, b_id""".stripMargin,

    // Keep-best dedup: q_dedup_groups' independent recursive-CTE closure
    // over the odd-id planted corpus, winners by (len(text) DESC, id),
    // survivors = corpus minus non-winning component members.
    "q_dedup_keep_best" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id,
        |    regexp_replace(text, '\s+\S+\s*$', '') AS text
        |  FROM documents WHERE doc_id % 2 = 1),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND len(list_distinct(list_concat(a.s, b.s))) > 0
        |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b AS u, id_a AS v FROM p),
        |reach AS (
        |  SELECT u AS id, u AS comp FROM (SELECT DISTINCT u FROM edges) t
        |  UNION
        |  SELECT e.u AS id, r.comp FROM edges e JOIN reach r ON e.v = r.id),
        |cc AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id),
        |scored AS (SELECT cc.id, cc.comp, len(d.text) AS s
        |  FROM cc JOIN corpus d ON d.doc_id = cc.id),
        |win AS (SELECT id FROM (
        |  SELECT id, row_number() OVER (PARTITION BY comp ORDER BY s DESC, id) AS rn
        |  FROM scored) WHERE rn = 1),
        |losers AS (SELECT id FROM scored WHERE id NOT IN (SELECT id FROM win))
        |SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars
        |FROM corpus WHERE doc_id NOT IN (SELECT id FROM losers)
        |ORDER BY doc_id""".stripMargin,

    "q_bpe_encode" -> bpeEncodeOracle(8),

    "q_bpe_fertility" -> bpeFertilityOracle(8),

    // Stupid-backoff replay (self-scoring → trigram branch only): the
    // trigram counts, the (w1,w2) context sums derived FROM those counts
    // (not a separate bigram scan — same derivation as the Spark side),
    // and the truncating permille division.
    "q_stupid_backoff" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS l
        |  FROM documents WHERE text IS NOT NULL),
        |tg AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2, l[i+2] AS w3
        |  FROM t, LATERAL unnest(range(1, len(l) - 1)) r(i) WHERE len(l) >= 3),
        |tri AS (SELECT w1, w2, w3, count(*) AS c123 FROM tg GROUP BY 1, 2, 3),
        |ctx AS (SELECT w1, w2, CAST(sum(c123) AS BIGINT) AS c12 FROM tri GROUP BY 1, 2),
        |sc AS (SELECT g.doc_id, (1000 * tri.c123) // ctx.c12 AS pm
        |  FROM tg g
        |  JOIN tri ON g.w1 = tri.w1 AND g.w2 = tri.w2 AND g.w3 = tri.w3
        |  JOIN ctx ON g.w1 = ctx.w1 AND g.w2 = ctx.w2)
        |SELECT doc_id, count(*) AS n_trigrams, CAST(sum(pm) AS BIGINT) AS sum_permille,
        |  CAST(sum(pm) AS BIGINT) // count(*) AS mean_permille
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Sentence stats replay: identical regex (no lookbehind — RE2-safe),
    // whitespace-only fragments dropped, q_text_tokens' word count,
    // truncating permille mean.
    "q_sentences" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(len(list_filter(regexp_extract_all(text, '[^.!?]+[.!?]*'),
        |    x -> len(trim(x)) > 0)) AS BIGINT) AS n_sentences,
        |  CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_words
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, n_sentences, n_words,
        |  (1000 * n_words) // n_sentences AS words_per_sentence_permille
        |FROM s WHERE n_sentences > 0 ORDER BY doc_id""".stripMargin,

    // CCNet bucketing replay: the q_bigram_surprisal CTEs for the
    // fluency permille, the q_quantile_norm window form per language,
    // thirds → head/middle/tail, per-(lang, bucket) counts.
    "q_ccnet_buckets" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS l
        |  FROM documents WHERE text IS NOT NULL),
        |occ AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
        |  FROM t, LATERAL unnest(range(1, len(l))) r(i) WHERE len(l) >= 2),
        |uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(l) AS w FROM t) GROUP BY 1),
        |bg AS (SELECT w1, w2, count(*) AS c12 FROM occ GROUP BY 1, 2),
        |sc AS (SELECT o.doc_id, (1000 * bg.c12) // uni.c1 AS pm
        |  FROM occ o JOIN bg ON o.w1 = bg.w1 AND o.w2 = bg.w2 JOIN uni ON o.w1 = uni.w),
        |sup AS (SELECT doc_id, CAST(sum(pm) AS BIGINT) // count(*) AS mp
        |  FROM sc GROUP BY doc_id),
        |sl AS (SELECT s.doc_id, d.lang, s.mp
        |  FROM sup s JOIN documents d USING (doc_id)),
        |qn AS (SELECT lang, doc_id, mp,
        |  row_number() OVER (PARTITION BY lang ORDER BY mp, doc_id) AS rk,
        |  count(*) OVER (PARTITION BY lang) AS n FROM sl),
        |b AS (SELECT lang,
        |  CASE WHEN n = 1 THEN 0 ELSE (1000 * (rk - 1)) // (n - 1) END AS q FROM qn)
        |SELECT lang,
        |  CASE WHEN q >= 667 THEN 'head' WHEN q >= 334 THEN 'middle' ELSE 'tail' END AS bucket,
        |  count(*) AS n_docs
        |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin,

    "q1_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q3_join_revenue" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_multijoin_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q6_filter_agg" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2024-01-01' AND l_shipdate < TIMESTAMP '2024-07-01'
        |  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24""".stripMargin,

    "q4_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_string_funcs" ->
      """SELECT p_partkey,
        |  substring(p_name, 1, 8) AS prefix,
        |  upper(p_brand) AS brand_upper,
        |  regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
        |  p_brand || '#' || p_type AS brand_type,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  p_name LIKE '%al%' AS has_al
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS d,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  date_trunc('month', o_orderdate) AS month_start
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.95) AS p95,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // Scale-path percentile gate (planted-property oracle): the Spark side
    // emits whether approx_percentile(accuracy=10000) landed between the
    // exact interpolated percentiles at p ± 0.001; the contract says it
    // always must, so the oracle is the literal `true` per group. A sketch
    // regression (rank error beyond the declared bound) flips a boolean
    // and fails the hash compare.
    "q_percentiles_approx" ->
      """SELECT o_orderstatus,
        |  true AS p50_in_bound,
        |  true AS p95_in_bound,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_window_top_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_set_ops" ->
      """SELECT nationkey FROM (
        |  SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 1000
        |  EXCEPT
        |  SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 1000) t
        |ORDER BY nationkey""".stripMargin,

    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS event_hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Sliding windows: every event belongs to exactly window/slide = 2
    // epoch-aligned windows; floor-to-second is membership-safe because
    // boundaries are 1800 s multiples.
    "q_events_sliding" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    (CAST(floor(epoch(ts)) AS BIGINT) // 1800) * 1800 AS s1
        |  FROM events),
        |x AS (SELECT event_type, value, unnest([s1, s1 - 1800]) AS ws FROM ev)
        |SELECT CAST(to_timestamp(ws) AS TIMESTAMP) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_events_sessionize" ->
      """SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS session_value
        |FROM (
        |  SELECT user_id, value,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
        |  FROM (
        |    SELECT user_id, ts, event_id, value,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |        OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT) > 1800
        |        THEN 1 ELSE 0 END AS new_session
        |    FROM events) t1) t2
        |GROUP BY user_id, session_seq ORDER BY user_id, session_seq""".stripMargin,

    // Funnel interval self-join: click → purchase by the same user within
    // 30 minutes; latency summed in exact integer microseconds (Spark
    // reads the nanos column truncated to micros; the generator emits
    // micro-precision timestamps, so the truncation is lossless).
    "q_events_funnel" ->
      """WITH f AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |t AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT f.user_id, date_diff('microsecond', f.ts, t.ts) AS lat
        |  FROM f JOIN t ON f.user_id = t.user_id
        |    AND t.ts > f.ts AND t.ts <= f.ts + INTERVAL 30 MINUTE)
        |SELECT user_id, COUNT(*) AS n_funnels, CAST(SUM(lat) AS BIGINT) AS sum_latency_us
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Left-outer funnel: every click row survives, NULL-extended when no
    // purchase follows within 30 minutes; per-user converted/abandoned
    // counts are integer-exact.
    "q_funnel_abandoned" ->
      """WITH f AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |t AS (SELECT user_id, event_id AS to_id, ts AS tts FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT f.user_id, f.event_id, t.to_id
        |  FROM f LEFT JOIN t ON f.user_id = t.user_id
        |    AND t.tts > f.ts AND t.tts <= f.ts + INTERVAL 30 MINUTE)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(to_id) AS BIGINT) AS n_converted,
        |  CAST(SUM(CASE WHEN to_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    // Funnel conversion rates per hourly start window: LEFT JOIN pairs
    // fold to one 0/1 flag per start, then an hourly rollup; the 1-hour
    // tumbling window start is epoch-aligned = date_trunc hour under the
    // UTC session. Rate = double(converted)/started on both engines.
    "q_funnel_rates" ->
      """WITH f AS (SELECT user_id, event_id AS from_id, ts AS from_ts FROM events WHERE event_type = 'click'),
        |t AS (SELECT user_id, event_id AS to_id, ts AS to_ts FROM events WHERE event_type = 'purchase'),
        |pf AS (
        |  SELECT date_trunc('hour', f.from_ts) AS window_start, f.from_id,
        |    max(CASE WHEN t.to_id IS NOT NULL THEN 1 ELSE 0 END) AS conv
        |  FROM f LEFT JOIN t ON f.user_id = t.user_id
        |    AND t.to_ts > f.from_ts AND t.to_ts <= f.from_ts + INTERVAL 30 MINUTE
        |  GROUP BY 1, 2)
        |SELECT window_start, CAST(COUNT(*) AS BIGINT) AS started,
        |  CAST(SUM(conv) AS BIGINT) AS converted,
        |  CAST(SUM(conv) AS DOUBLE) / COUNT(*) AS conversion_rate
        |FROM pf GROUP BY window_start ORDER BY window_start""".stripMargin,

    // Last-touch attribution: interval-join candidates, then the
    // per-conversion argmax (from_ts desc, from_id desc) — the same
    // (struct-max) order the Spark side folds with.
    "q_attribution" ->
      """WITH f AS (SELECT user_id, event_id AS from_id, ts AS from_ts FROM events WHERE event_type = 'view'),
        |t AS (SELECT user_id, event_id AS to_id, ts AS to_ts FROM events WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT t.to_id, t.user_id, f.from_id, f.from_ts, t.to_ts
        |  FROM t JOIN f ON t.user_id = f.user_id
        |    AND t.to_ts > f.from_ts AND t.to_ts <= f.from_ts + INTERVAL 30 MINUTE),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY to_id ORDER BY from_ts DESC, from_id DESC) AS rn,
        |    count(*) OVER (PARTITION BY to_id) AS n_candidates
        |  FROM p)
        |SELECT to_id, user_id, from_id, from_ts, to_ts, CAST(n_candidates AS BIGINT) AS n_candidates
        |FROM r WHERE rn = 1 ORDER BY to_id""".stripMargin,

    "q_cdc_latest" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q_cdc_merge" ->
      """WITH cut AS (SELECT 500 * greatest(1, COUNT(*) // 1000) AS c FROM events),
        |tgt AS (
        |  SELECT * FROM (
        |    SELECT user_id, event_id, event_type,
        |      row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_id < (SELECT c FROM cut)) x WHERE rn = 1),
        |stg AS (
        |  SELECT *, event_type = 'error' AS is_delete FROM (
        |    SELECT user_id, event_id, event_type,
        |      row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_id >= (SELECT c FROM cut)) y WHERE rn = 1)
        |SELECT coalesce(s.user_id, t.user_id) AS user_id,
        |  CASE WHEN s.event_id IS NOT NULL THEN s.event_id ELSE t.event_id END AS event_id,
        |  CASE WHEN s.event_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type
        |FROM tgt t FULL OUTER JOIN stg s ON t.user_id = s.user_id
        |WHERE NOT coalesce(s.is_delete, false)
        |ORDER BY user_id""".stripMargin,

    // Merge-on-read replay: the same three-step sequential fold the gate
    // drives through the real table (backfill on segment 1 with tombstones
    // dropped; merge segment 3; then the now-STALE segment 2) expressed as
    // a CASE cascade per user. A later merge's winner takes only with a
    // strictly higher version (event_id); a tombstone removes the key
    // WITHOUT version memory, so a subsequently merged lower-version row
    // re-inserts — exactly the table's sequential semantics.
    "q_cdc_merge_mor" ->
      """WITH n AS (SELECT COUNT(*) // 3 AS third FROM events),
        |w1 AS (SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id < (SELECT third FROM n)) x WHERE rn = 1),
        |w2 AS (SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id >= (SELECT third FROM n)
        |    AND event_id < 2 * (SELECT third FROM n)) x WHERE rn = 1),
        |w3 AS (SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id >= 2 * (SELECT third FROM n)) x WHERE rn = 1),
        |s AS (SELECT u.user_id,
        |    w1.event_id AS e1, w1.event_type AS t1,
        |    w2.event_id AS e2, w2.event_type AS t2,
        |    w3.event_id AS e3, w3.event_type AS t3
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN w1 USING (user_id) LEFT JOIN w2 USING (user_id)
        |  LEFT JOIN w3 USING (user_id)),
        |a AS (SELECT user_id, e2, t2, e3, t3,
        |    CASE WHEN t1 IS NOT NULL AND t1 <> 'error' THEN e1 END AS ae,
        |    CASE WHEN t1 IS NOT NULL AND t1 <> 'error' THEN t1 END AS at
        |  FROM s),
        |b AS (SELECT user_id, e2, t2,
        |    CASE WHEN e3 IS NOT NULL AND (ae IS NULL OR e3 > ae)
        |      THEN (CASE WHEN t3 = 'error' THEN NULL ELSE e3 END) ELSE ae END AS be,
        |    CASE WHEN e3 IS NOT NULL AND (ae IS NULL OR e3 > ae)
        |      THEN (CASE WHEN t3 = 'error' THEN NULL ELSE t3 END) ELSE at END AS bt
        |  FROM a),
        |c AS (SELECT user_id,
        |    CASE WHEN e2 IS NOT NULL AND (be IS NULL OR e2 > be)
        |      THEN (CASE WHEN t2 = 'error' THEN NULL ELSE e2 END) ELSE be END AS ce,
        |    CASE WHEN e2 IS NOT NULL AND (be IS NULL OR e2 > be)
        |      THEN (CASE WHEN t2 = 'error' THEN NULL ELSE t2 END) ELSE bt END AS ct
        |  FROM b)
        |SELECT user_id, ce AS event_id, ct AS event_type
        |FROM c WHERE ce IS NOT NULL ORDER BY user_id""".stripMargin,

    // Incremental-aggregate replay: the post-merge table state derived
    // relationally (latest-per-user fold, tombstones out), then the
    // grouped count/sum recomputed FROM SCRATCH — the gate's incremental
    // path must land on exactly these numbers. DECIMAL sums both sides.
    "q_incr_agg" ->
      """WITH cut AS (SELECT COUNT(*) // 2 AS c FROM events),
        |w1 AS (SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id < (SELECT c FROM cut)) x WHERE rn = 1),
        |w2 AS (SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id >= (SELECT c FROM cut)) x WHERE rn = 1),
        |fin AS (
        |  SELECT
        |    CASE WHEN w2.user_id IS NOT NULL THEN w2.event_type ELSE w1.event_type END AS event_type,
        |    CASE WHEN w2.user_id IS NOT NULL THEN w2.value ELSE w1.value END AS value
        |  FROM w1 FULL OUTER JOIN w2 ON w1.user_id = w2.user_id
        |  WHERE (CASE WHEN w2.user_id IS NOT NULL THEN w2.event_type ELSE w1.event_type END) <> 'error')
        |SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
        |FROM fin GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Oracle for the END-TO-END CDC pipeline run (CSV export → DSv2 source →
    // cast → dedup → backfill → streaming MERGE): the same fold expressed
    // relationally. Backfill drops tombstones (latest-per-key first-half rows
    // whose type is 'error'); the streamed second half then deletes /
    // updates / inserts by latest version.
    // Schema-churn scan: folder 1 was exported under a HISTORICAL model.json
    // (versionnumber/eventtype swapped, no value column) — the source must
    // parse it under that folder's own schema, so first-half rows align
    // correctly and read NULL for the later-added value column.
    "q_cdc_schema_churn" ->
      """WITH cut AS (SELECT 500 * greatest(1, COUNT(*) // 1000) AS c FROM events)
        |SELECT user_id, event_id, event_type,
        |  CASE WHEN event_id < (SELECT c FROM cut) THEN NULL ELSE value END AS value
        |FROM events ORDER BY user_id, event_id""".stripMargin,

    "q_cdc_pipeline_e2e" ->
      """WITH cut AS (SELECT 500 * greatest(1, COUNT(*) // 1000) AS c FROM events),
        |t1 AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id < (SELECT c FROM cut)),
        |tgt AS (SELECT user_id, event_id, event_type FROM t1 WHERE rn = 1 AND event_type <> 'error'),
        |s1 AS (
        |  SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id >= (SELECT c FROM cut)),
        |stg AS (SELECT user_id, event_id, event_type, event_type = 'error' AS is_delete FROM s1 WHERE rn = 1)
        |SELECT coalesce(s.user_id, t.user_id) AS user_id,
        |  CASE WHEN s.user_id IS NOT NULL THEN s.event_id ELSE t.event_id END AS event_id,
        |  CASE WHEN s.user_id IS NOT NULL THEN s.event_type ELSE t.event_type END AS event_type
        |FROM tgt t FULL OUTER JOIN stg s ON t.user_id = s.user_id
        |WHERE NOT coalesce(s.is_delete, false)
        |ORDER BY user_id""".stripMargin,

    // Streaming content-dedup e2e: the oracle states the PLANTED truth of
    // the 5-batch fixture (CdcFixtureGen.materializeStreamDocs — exact
    // duplicate bodies are suppressed by the maintained band index before
    // each merge, tombstones apply, fresh families survive with their
    // arrival version). Duplicates are exact copies, so LSH suppression is
    // certain and the expected table is exactly: batch-1 rows minus the %7
    // tombstones, plus the %5 / %4 / %6 / %9 fresh families at versions
    // 2..5. The %11 live keys are IN-PLACE UPDATED at v5 with their own
    // near-dup text — the same-key exemption must admit the version bump.
    "q_stream_near_dup_e2e" ->
      """SELECT CAST(doc_id AS BIGINT) AS id,
        |  CAST(CASE WHEN doc_id % 11 = 0 THEN 5 ELSE 1 END AS BIGINT) AS v
        |FROM documents WHERE doc_id % 7 <> 0
        |UNION ALL SELECT CAST(2000000 + doc_id AS BIGINT), CAST(2 AS BIGINT)
        |FROM documents WHERE doc_id % 5 = 0
        |UNION ALL SELECT CAST(4000000 + doc_id AS BIGINT), CAST(3 AS BIGINT)
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL SELECT CAST(5000000 + doc_id AS BIGINT), CAST(4 AS BIGINT)
        |FROM documents WHERE doc_id % 6 = 0
        |UNION ALL SELECT CAST(9000000 + doc_id AS BIGINT), CAST(5 AS BIGINT)
        |FROM documents WHERE doc_id % 9 = 0
        |ORDER BY id""".stripMargin,

    // External-readability gate: the oracle does NOT re-derive the result
    // relationally — it reads the symlink-manifest EXPORT of the live
    // snapshot (written by the Spark side into a fixed tmp location) with
    // DuckDB's own parquet reader. A bit-exact match proves any external
    // engine can query the live table through the export: dead files from
    // superseded snapshots excluded, carried (unmerged) buckets included.
    // Correctness runs at sf0.01, hence the pinned path segment.
    "q_export_symlink" ->
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal, v, is_del
        |FROM read_parquet('${graft.queries.Queries.ExportGateRoot}/current/export/data/*.parquet')
        |ORDER BY c_custkey""".stripMargin,

    // Iceberg-interop gate: the Spark side reads the table exclusively
    // through the exported Iceberg v2 metadata chain (version-hint →
    // metadata.json → manifest-list avro → manifest avro → file paths);
    // the oracle restates the post-merge state relationally. Evens
    // created at v=1; keys %10==0 merged at v=2 with doubled acctbal;
    // keys %100==0 tombstoned.
    // Bucket-pruned point lookups through the Iceberg export: the same
    // CREATE + MERGE lifecycle as q_export_iceberg, probed at fixed keys
    // (untouched / updated / tombstoned) through the published bucket[N]
    // partition spec — the pruned read must lose nothing.
    "q_export_point_lookup" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 0
        |       THEN CAST(c_acctbal AS DOUBLE) * 2
        |       ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
        |  CAST(CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END AS BIGINT) AS v,
        |  false AS is_del
        |FROM customer
        |WHERE c_custkey IN (2, 4, 6, 8, 10, 30, 100, 200)
        |  AND c_custkey % 2 = 0 AND c_custkey % 100 <> 0
        |ORDER BY c_custkey""".stripMargin,

    "q_export_iceberg" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 0
        |       THEN CAST(c_acctbal AS DOUBLE) * 2
        |       ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
        |  CAST(CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END AS BIGINT) AS v,
        |  false AS is_del
        |FROM customer
        |WHERE c_custkey % 2 = 0 AND c_custkey % 100 <> 0
        |ORDER BY c_custkey""".stripMargin,

    // Delta log export: identical lifecycle truth as q_export_iceberg —
    // the engine result comes exclusively through _delta_log replay.
    "q_export_delta" ->
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 10 = 0
        |       THEN CAST(c_acctbal AS DOUBLE) * 2
        |       ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
        |  CAST(CASE WHEN c_custkey % 10 = 0 THEN 2 ELSE 1 END AS BIGINT) AS v,
        |  false AS is_del
        |FROM customer
        |WHERE c_custkey % 2 = 0 AND c_custkey % 100 <> 0
        |ORDER BY c_custkey""".stripMargin,

    // Adopt-external lifecycle restated relationally: evens created
    // natively, odds adopted from a foreign parquet write, then one staged
    // batch (keys ending 3 or 4) doubles acctbal at v=2 and tombstones
    // keys = 3 (mod 100). Matching the table's read-back proves the
    // adopted file's rows entered the table AND were absorbed/updated by
    // the merge exactly like native rows.
    "q_adopt_external" ->
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_custkey % 10 IN (3, 4)
        |       THEN CAST(c_acctbal AS DOUBLE) * 2
        |       ELSE CAST(c_acctbal AS DOUBLE) END AS c_acctbal,
        |  CAST(CASE WHEN c_custkey % 10 IN (3, 4) THEN 2 ELSE 1 END AS BIGINT) AS v,
        |  false AS is_del
        |FROM customer
        |WHERE c_custkey % 100 <> 3
        |ORDER BY c_custkey""".stripMargin,

    // JSONL round-trip: the Spark side re-reads the documents table
    // through the JSON-Lines writer+PERMISSIVE reader (planted corrupt
    // line dropped); the oracle is simply the parquet truth.
    "q_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id",

    "q_merge_key_projection" ->
      """SELECT event_id, user_id, lower(CAST(user_id AS VARCHAR)) AS arcane_merge_key, event_type
        |FROM events ORDER BY event_id""".stripMargin,

    // Order-invariant checksum: sum over rows of the md5 digest's last 8
    // bytes little-endian (DuckDB's md5_number_lower) folded mod 2^31.
    "q_table_checksum" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CAST(md5_number_lower(
        |    concat_ws(chr(1),
        |      coalesce(CAST(c_custkey AS VARCHAR), chr(2) || 'NULL'),
        |      coalesce(c_name, chr(2) || 'NULL'),
        |      coalesce(CAST(c_nationkey AS VARCHAR), chr(2) || 'NULL'))
        |  ) % 2147483648 AS BIGINT)) AS BIGINT) AS checksum
        |FROM customer""".stripMargin,

    // JSON extraction: path-string and schema'd parse must agree with
    // DuckDB's json_extract_string on the same payload.
    "q_json_extract" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,

    // Asymmetric GROUPING SETS — identical syntax and NULL-group
    // semantics in DuckDB; decimal-exact revenue.
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    // Array/HOF surface: list size, distinct-sort-slice, length fold, min
    // element — DuckDB's list functions compute the same exact values.
    "q_array_funcs" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0) AS ls
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(ls) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(list_sort(list_distinct(ls)), 1, 3), ',') AS first3_csv,
        |  CAST(list_sum(list_transform(ls, t -> len(t))) AS BIGINT) AS total_chars,
        |  list_min(ls) AS min_tok
        |FROM d ORDER BY doc_id""".stripMargin,

    // Levenshtein between raw and normalized 40-char prefixes — integer
    // edit distance, exact in both engines.
    "q_string_distance" ->
      """SELECT doc_id,
        |  CAST(levenshtein(
        |    substring(text, 1, 40),
        |    substring(trim(regexp_replace(
        |      translate(lower(text), 'áàâäãåéèêëíìîïóòôöõúùûüçñýÿ', 'aaaaaaeeeeiiiiooooouuuucnyy'),
        |      '\s+', ' ', 'g')), 1, 40)) AS BIGINT) AS lev
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Fuzzy pairs: the oracle is a BOUNDED brute-force cross join with
    // exact levenshtein over the same planted union — exhaustive truth
    // for every pair the SymSpell blocking may find or miss.
    "q_fuzzy_pairs" ->
      """WITH c AS (
        |  SELECT p_partkey AS id, lower(p_name) AS s FROM part WHERE p_partkey < 1000
        |  UNION ALL
        |  SELECT p_partkey + 1000000 AS id, 'x' || substr(lower(p_name), 2) AS s
        |  FROM part WHERE p_partkey < 500)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // Capped fuzzy pairs: the oracle replays the DEGRADED (skew-guarded)
    // semantics exactly — 1-deletion neighborhoods, per-variant bucket
    // counts, buckets over the cap (64) dropped, candidate equi-join,
    // exact levenshtein verify — over the same corpus + planted hot
    // variant family (FuzzyHotBase restated verbatim). The 81 true pairs
    // reachable only through the hot variant must be absent from BOTH
    // sides; the part-name typo pairs must all survive.
    "q_fuzzy_pairs_capped" ->
      (s"""WITH hotbase AS (SELECT '${graft.queries.Queries.FuzzyHotBase}' AS b),""" +
        """
        |c AS (
        |  SELECT p_partkey AS id, lower(p_name) AS s FROM part WHERE p_partkey < 500
        |  UNION ALL
        |  SELECT p_partkey + 1000000 AS id, 'x' || substr(lower(p_name), 2) AS s
        |  FROM part WHERE p_partkey < 250
        |  UNION ALL
        |  SELECT 2000000 AS id, b AS s FROM hotbase
        |  UNION ALL
        |  SELECT 2000001 AS id, b || '@' AS s FROM hotbase
        |  UNION ALL
        |  SELECT 3000000 + i AS id,
        |    substr(b, 1, i) || '@' || substr(b, i + 1, len(b) - i) AS s
        |  FROM hotbase, unnest(generate_series(0, 79)) AS t(i)),
        |v AS (
        |  SELECT id, unnest(list_distinct(list_prepend(s,
        |    [substr(s, 1, i - 1) || substr(s, i + 1, len(s) - i)
        |     for i in range(1, len(s) + 1)]))) AS vk
        |  FROM c),
        |counts AS (SELECT vk, count(*) AS n FROM v GROUP BY vk),
        |ok AS (SELECT v.id, v.vk FROM v JOIN counts USING (vk) WHERE n <= 64),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM ok a JOIN ok b ON a.vk = b.vk AND a.id < b.id)
        |SELECT cand.id_a, cand.id_b,
        |  CAST(levenshtein(ca.s, cb.s) AS BIGINT) AS dist
        |FROM cand
        |JOIN c ca ON ca.id = cand.id_a
        |JOIN c cb ON cb.id = cand.id_b
        |WHERE levenshtein(ca.s, cb.s) <= 1
        |ORDER BY id_a, id_b""").stripMargin,

    // d=2 fuzzy pairs: same exhaustive shape, two-substitution typos.
    "q_fuzzy_pairs2" ->
      """WITH c AS (
        |  SELECT p_partkey AS id, lower(p_name) AS s FROM part WHERE p_partkey < 1000
        |  UNION ALL
        |  SELECT p_partkey + 1000000 AS id,
        |    'x' || substr(lower(p_name), 2, len(p_name) - 2) || 'q' AS s
        |  FROM part WHERE p_partkey < 500)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // Weighted sample: replay the A-Res key formula verbatim — both
    // engines must draw the same 200 documents.
    "q_weighted_sample" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    CAST(len(trim(text)) + 1 AS DOUBLE) AS weight
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, lang, weight,
        |    pow((((doc_id * 2654435761) % 4294967296) + 1.0) / 4294967297.0,
        |        1.0 / weight) AS wkey
        |  FROM w WHERE weight > 0)
        |SELECT doc_id, lang, weight FROM
        |  (SELECT * FROM k ORDER BY wkey DESC, doc_id LIMIT 200)
        |ORDER BY doc_id""".stripMargin,

    // Per-group weighted sample: the oracle is the per-group WINDOW
    // formulation of the same A-Res keys (id DESC tiebreak mirrors the
    // heap's all-descending struct order).
    "q_weighted_sample_grouped" ->
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    CAST(len(trim(text)) + 1 AS DOUBLE) AS weight
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, lang, weight,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      pow((((doc_id * 2654435761) % 4294967296) + 1.0) / 4294967297.0,
        |          1.0 / weight) DESC, doc_id DESC) AS rn
        |  FROM w WHERE weight > 0)
        |SELECT doc_id, lang, weight FROM k WHERE rn <= 40
        |ORDER BY doc_id""".stripMargin,

    // Bloom pre-filter changes only the physical shape — oracle is the
    // plain semi join.
    "q_bloom_semi_join" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    // Salting preserves join multiplicity exactly — oracle is the plain
    // inner join.
    "q_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_totalprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_quantity >= 40.0
        |ORDER BY l.l_orderkey, l.l_linenumber, l.l_quantity""".stripMargin,

    // Bucketized range join ≡ the plain BETWEEN join — oracle is DuckDB's
    // native range join over identically-constructed interval bounds.
    "q_range_join" ->
      """WITH iv AS (
        |  SELECT p_partkey,
        |    p_retailprice - (p_partkey % 97) AS lo,
        |    p_retailprice + (p_partkey % 89) AS hi
        |  FROM part WHERE p_partkey < 200)
        |SELECT l.l_orderkey, l.l_linenumber, iv.p_partkey
        |FROM lineitem l JOIN iv ON l.l_extendedprice BETWEEN iv.lo AND iv.hi
        |ORDER BY l.l_orderkey, l.l_linenumber, iv.p_partkey""".stripMargin,

    // CMS estimates over a collision-free domain equal the exact counts —
    // the oracle is the plain GROUP BY; the sketch's collision structure
    // is data-volume independent, so the equality is SF-stable.
    "q_cms_freq" ->
      """SELECT event_type, count(*) AS est_count
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Bounded-heap grouped top-k ≡ the window formulation — the oracle IS
    // the row_number window SQL, so the heap path must reproduce it
    // exactly (total ordering via the orderkey tiebreaker).
    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey DESC""".stripMargin,

    // As-of join gated by DuckDB's NATIVE ASOF LEFT JOIN — an independent
    // as-of implementation, so the union-merge window formulation is
    // checked against another engine's semantics (inclusive ties, latest
    // right row ≤ left ts, unmatched → NULL).
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.click_id, c.user_id, c.ts AS click_ts, p.purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.click_id""".stripMargin,

    // forward variant: the NEXT purchase at-or-after each click
    "q_asof_join_fwd" ->
      """WITH clicks AS (
        |  SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.click_id, c.user_id, c.ts AS click_ts, p.purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.click_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT doc_id, fingerprint FROM (
        |  SELECT doc_id,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint,
        |    row_number() OVER (
        |      PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Planted-property oracles for the three engine-specific sketches
    // (values use xxhash64 — no DuckDB equivalent; the VALUES are pinned
    // differentially in SketchPinningSpec). The Spark side re-sketches
    // planted transforms of the first 100 docs through SEPARATE frames and
    // emits whether each algebraic property held; the properties are
    // constant-true by contract, so the oracle states them as literals and
    // any determinism/algebra regression fails the hash compare.
    "q_minhash_lsh" ->
      """SELECT doc_id, true AS copy_sig_matches, true AS copy_bands_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_simhash" ->
      """SELECT doc_id, true AS order_insensitive, true AS extra_token_differs
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_rolling_hash" ->
      """SELECT doc_id, true AS copy_matches, true AS reorder_differs
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DSIR importance resampling (scores hash n-grams with xxhash64 — no
    // DuckDB equivalent; the planted-class VALUE behavior is pinned in
    // ExtOpsSpec): partition-invariant scoring, replayable Gumbel-top-k
    // selection, and positive target affinity are constant-true by
    // contract, so any determinism/algebra regression fails the hash.
    "q_dsir_select" ->
      """SELECT doc_id, true AS stable, true AS select_stable,
        |       true AS affinity_positive
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Model-based quality filter (fastText-style classifier): xxhash64
    // featurization has no DuckDB replay, so the gate pins the planted-
    // marker CONTRACT — holdout docs classified correctly and scores
    // partition-invariant (both would fail on any train/score float-order
    // or algebra regression). Value behavior lives in ClassifierSpec.
    "q_quality_classifier" ->
      """SELECT doc_id, true AS correct, true AS stable
        |FROM documents WHERE doc_id >= 160 AND doc_id < 360
        |ORDER BY doc_id""".stripMargin,

    // K-anonymity suppression: window-count replay; NULL quasi values
    // group together on both sides (grouping equality, not join equality).
    "q_k_anonymity" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_nationkey AS nk, c_mktsegment AS seg FROM customer
        |  UNION ALL
        |  SELECT 1000000 + c_custkey, 0, CAST(NULL AS VARCHAR) FROM customer WHERE c_custkey <= 20
        |  UNION ALL
        |  SELECT 2000000 + c_custkey, 1, CAST(NULL AS VARCHAR) FROM customer WHERE c_custkey <= 3)
        |SELECT id FROM (
        |  SELECT id, count(*) OVER (PARTITION BY nk, seg) AS n FROM base) t
        |WHERE n >= 10 ORDER BY id""".stripMargin,

    // Distinct l-diversity: per-quasi-group distinct sensitive count with
    // NULL counted as a value of its own (bool_or correction), NULL-safe
    // group join via IS NOT DISTINCT FROM — grouping equality on both sides.
    "q_l_diversity" ->
      """WITH base AS (
        |  SELECT c_custkey AS id, c_nationkey AS nk, c_mktsegment AS seg FROM customer
        |  UNION ALL
        |  SELECT 1000000 + c_custkey, 100, 'HOMOG' FROM customer WHERE c_custkey <= 20
        |  UNION ALL
        |  SELECT 2000000 + c_custkey, 101,
        |    CASE WHEN c_custkey <= 10 THEN CAST(NULL AS VARCHAR) ELSE 'X' END
        |  FROM customer WHERE c_custkey <= 20
        |  UNION ALL
        |  SELECT 3000000 + c_custkey, 102, CAST(NULL AS VARCHAR) FROM customer WHERE c_custkey <= 12
        |  UNION ALL
        |  SELECT 4000000 + c_custkey, CAST(NULL AS INTEGER),
        |    CASE WHEN c_custkey <= 4 THEN 'A' ELSE 'B' END
        |  FROM customer WHERE c_custkey <= 8),
        |g AS (
        |  SELECT nk FROM base GROUP BY nk
        |  HAVING count(DISTINCT seg)
        |       + CASE WHEN bool_or(seg IS NULL) THEN 1 ELSE 0 END >= 2)
        |SELECT id FROM base JOIN g ON base.nk IS NOT DISTINCT FROM g.nk
        |ORDER BY id""".stripMargin,

    // Within-document line dedup: the PER-DOC first-occurrence window
    // (PARTITION BY doc_id, line) — deliberately different from
    // q_line_dedup's corpus-global rule; shared lines survive in every doc.
    "q_line_dedup_doc" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'visit our sponsors' || chr(10) || chr(10)
        |         || substr(text, 1, 60) || chr(10) || text
        |         || chr(10) || 'visit our sponsors' AS text
        |  FROM documents),
        |l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, len(ls))) - 1 AS pos,
        |    unnest(ls) AS line
        |  FROM l0),
        |nz AS (SELECT doc_id, pos, line FROM lines WHERE len(trim(line)) > 0),
        |firsts AS (
        |  SELECT doc_id, pos, line,
        |    row_number() OVER (PARTITION BY doc_id, line ORDER BY pos) AS rn
        |  FROM nz)
        |SELECT doc_id,
        |  string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |  CAST(count(*) AS BIGINT) AS kept_lines
        |FROM firsts WHERE rn = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Compression-ratio signal: deflate byte counts are zlib-build
    // properties with stable ORDER but unspecified exact values, so the
    // gate pins the planted-property contract (repeated text compresses
    // below threshold and below the doc's own text); values in ExtOpsSpec.
    "q_compression_signal" ->
      """SELECT doc_id, true AS repetitive_low, true AS ordered
        |FROM documents WHERE doc_id < 400 AND length(text) >= 8
        |ORDER BY doc_id""".stripMargin,

    // Exact incremental dedup vs stored corpus: the oracle is the PLAIN
    // fingerprint anti-join (same md5 normalization as q_dedup_exact) —
    // the engine's bloom-split + broadcast-verify plan must be invisible
    // in the result. NULL-text rows pass through (no content to match).
    "q_dedup_exact_increment" ->
      """WITH inc AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |         regexp_replace(text, ' ', '  ', 'g') AS text
        |  FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |         text || ' uniq' || CAST(doc_id + 2000000 AS VARCHAR) AS text
        |  FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 3000000 AS doc_id, CAST(NULL AS VARCHAR) AS text
        |  FROM documents WHERE doc_id < 5),
        |cfp AS (
        |  SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id FROM inc
        |WHERE text IS NULL
        |   OR md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) NOT IN (SELECT fp FROM cfp)
        |ORDER BY doc_id""".stripMargin,

    // Incremental near-dup: exhaustive exact-Jaccard cross join of the
    // planted increment (paraphrases +1e6, token-reversed +2e6) against
    // the full corpus — brute-force truth for the broadcast/semi-join
    // plan, recall 1.0 required.
    "q_incremental_near_dup" ->
      """WITH incoming AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    regexp_replace(text, '\s+\S+\s*$', '') AS text
        |  FROM documents WHERE doc_id < 80
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(list_reverse(
        |      list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)), ' ') AS text
        |  FROM documents WHERE doc_id >= 80 AND doc_id < 160),
        |itoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM incoming),
        |ctoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |ish AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM itoks),
        |csh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM ctoks)
        |SELECT i.doc_id AS inc_id, c.doc_id AS corpus_id,
        |  CAST(len(list_intersect(i.s, c.s)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(i.s, c.s))) AS DOUBLE) AS jaccard
        |FROM ish i, csh c
        |WHERE len(list_distinct(list_concat(i.s, c.s))) > 0
        |  AND CAST(len(list_intersect(i.s, c.s)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(i.s, c.s))) AS DOUBLE) >= 0.5
        |ORDER BY inc_id, corpus_id""".stripMargin,

    // Composed increment filter: incoming minus the exact match set.
    "q_dedup_increment" ->
      """WITH incoming AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    regexp_replace(text, '\s+\S+\s*$', '') AS text
        |  FROM documents WHERE doc_id < 80
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id,
        |    array_to_string(list_reverse(
        |      list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)), ' ') AS text
        |  FROM documents WHERE doc_id >= 80 AND doc_id < 160),
        |itoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM incoming),
        |ctoks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |ish AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM itoks),
        |csh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM ctoks),
        |dups AS (
        |  SELECT DISTINCT i.doc_id
        |  FROM ish i, csh c
        |  WHERE len(list_distinct(list_concat(i.s, c.s))) > 0
        |    AND CAST(len(list_intersect(i.s, c.s)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(i.s, c.s))) AS DOUBLE) >= 0.5)
        |SELECT doc_id FROM incoming WHERE doc_id NOT IN (SELECT doc_id FROM dups)
        |ORDER BY doc_id""".stripMargin,

    // Real correctness gate for the MinHash-LSH near-dup path: the exact
    // 3-gram-shingle Jaccard ≥ 0.5 pair set over the planted corpus
    // (documents ∪ last-word-dropped copies, id+1e6), computed directly in
    // DuckDB. The LSH banding output must recover EXACTLY this set (recall
    // 1.0 on the planted data) with bit-matching jaccard values — int/int
    // division of identical intersection/union counts on both sides.
    "q_near_dup_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, regexp_replace(text, '\s+\S+\s*$', '') AS text FROM documents),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND len(list_distinct(list_concat(a.s, b.s))) > 0
        |  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    // OPH near-dup: identical brute-force truth at threshold 0.8 — the
    // one-permutation signature path must reproduce exhaustive exact
    // Jaccard with zero misses, same bar as q_near_dup_pairs.
    "q_near_dup_oph" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, regexp_replace(text, '\s+\S+\s*$', '') AS text FROM documents),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND len(list_distinct(list_concat(a.s, b.s))) > 0
        |  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // Duplicate groups: recursive-CTE transitive closure over the exact
    // Jaccard >= 0.5 pair set (the same CTE as q_near_dup_pairs), min
    // reachable id as the canonical component.
    // Hot-bucket stress gates: the oracle states the PLANTED truth (25k /
    // 15k identical copies of item 0 resolve through representative 0);
    // matching is only possible if the skew guard bounds the hot bucket to
    // linear rep-vs-rest edges (an unguarded bucket emits ~10^8 pairs) while
    // keeping the duplicate group connected.
    // Long-chain depth stress: a planted 10k-node path (min id at the
    // chain's middle) has exactly one component with canon 0; the oracle
    // states that planted truth. The engine can only match if min-label
    // propagation with path halving fully converges within maxIters = 20
    // rounds (plain propagation would need ~10 000).
    "q_cc_long_chain" ->
      """SELECT CAST(g AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS component
        |FROM range(10000) t(g) ORDER BY doc_id""".stripMargin,

    "q_hot_bucket_groups" ->
      """SELECT CAST(0 AS BIGINT) AS doc_id, CAST(0 AS BIGINT) AS component
        |UNION ALL
        |SELECT CAST(2000000 + g AS BIGINT), CAST(0 AS BIGINT) FROM range(25000) t(g)
        |ORDER BY doc_id""".stripMargin,

    "q_hot_bucket_embedding" ->
      """SELECT CAST(0 AS BIGINT) AS id_a, CAST(3000000 + g AS BIGINT) AS id_b
        |FROM range(15000) t(g) ORDER BY id_a, id_b""".stripMargin,

    // End-to-end cleaning composition: the same independent recursive-CTE
    // closure as q_dedup_groups (even-id half corpus), then survivors =
    // corpus minus non-canonical group members.
    "q_dedup_clean_corpus" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, regexp_replace(text, '\s+\S+\s*$', '') AS text
        |  FROM documents WHERE doc_id % 2 = 0),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND len(list_distinct(list_concat(a.s, b.s))) > 0
        |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b AS u, id_a AS v FROM p),
        |reach AS (
        |  SELECT u AS id, u AS comp FROM (SELECT DISTINCT u FROM edges) t
        |  UNION
        |  SELECT e.u AS id, r.comp FROM edges e JOIN reach r ON e.v = r.id),
        |labels AS (SELECT id, min(comp) AS comp FROM reach GROUP BY id)
        |SELECT CAST(c.doc_id AS BIGINT) AS doc_id FROM corpus c
        |WHERE c.doc_id NOT IN (SELECT id FROM labels WHERE comp <> id)
        |ORDER BY doc_id""".stripMargin,

    "q_dedup_groups" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, regexp_replace(text, '\s+\S+\s*$', '') AS text FROM documents),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM corpus),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a, sh b
        |  WHERE a.doc_id < b.doc_id
        |    AND len(list_distinct(list_concat(a.s, b.s))) > 0
        |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |      / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.5),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM p UNION SELECT id_b AS u, id_a AS v FROM p),
        |reach AS (
        |  SELECT u AS id, u AS comp FROM (SELECT DISTINCT u FROM edges) t
        |  UNION
        |  SELECT e.u AS id, r.comp FROM edges e JOIN reach r ON e.v = r.id)
        |SELECT id AS doc_id, CAST(min(comp) AS BIGINT) AS component
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS s
        |  FROM documents WHERE doc_id < 100)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) AS jaccard
        |FROM d a, d b
        |WHERE a.doc_id < b.doc_id
        |  AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.s, b.s))) AS DOUBLE) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // Int8 quantization contract (planted-property oracle): per-component
    // reconstruction within scale/2 and cosine ≥ 0.999 hold by
    // construction; rounding-direction differences between engines make
    // the codes themselves un-oracle-able, the contract is not.
    "q_embedding_quantize" ->
      """SELECT vec_id, true AS within_half_scale, true AS cosine_preserved
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    // Decontamination: the benchmark is every 50th doc's text (planted
    // eval-set leak); a doc is contaminated iff it shares any word 8-gram
    // with the benchmark. Same shingling CASE as the near-dup oracle.
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+7], ' ') for i in range(1, len(tk) - 6)])
        |    END AS s
        |  FROM toks),
        |bench AS (SELECT DISTINCT g FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 50 = 0)),
        |hits AS (
        |  SELECT doc_id, count(DISTINCT g) AS n_overlaps
        |  FROM (SELECT doc_id, unnest(s) AS g FROM sh) x JOIN bench USING (g)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(h.n_overlaps, 0) AS n_overlaps,
        |  coalesce(h.n_overlaps, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // Document chunking: 64-token windows, 16-token overlap (step 48);
    // window starts replayed with range(0, n, 48), slices 1-based
    // inclusive in both engines.
    "q_doc_chunk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
        |         ELSE string_split_regex(trim(text), '\s+') END AS tk
        |  FROM documents),
        |s AS (SELECT doc_id, tk, unnest(range(0, len(tk), 48)) AS start FROM t)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_index,
        |  array_to_string(tk[start + 1 : start + 64], ' ') AS chunk_text,
        |  CAST(least(64, len(tk) - start) AS BIGINT) AS n_tokens
        |FROM s ORDER BY doc_id, chunk_index""".stripMargin,

    // Token-budget sampling: greedy fill in multiplicative-hash order,
    // exclusive prefix sum below the budget keeps the crossing doc. The
    // window cumsum replays the distributed prefix sum relationally.
    "q_token_budget_sample" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
        |    (doc_id * 2654435761) % 2147483648 * 4294967296 + doc_id AS ord
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY ord ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
        |  FROM d)
        |SELECT doc_id, n_tokens, tokens_before
        |FROM c WHERE tokens_before < 25000 ORDER BY doc_id""".stripMargin,

    // SEMANTIC decontamination: every 47th embedding is the planted eval
    // set; max cosine over the eval set per corpus row, flag >= 0.999.
    // Same dot/norm accumulation order as the Spark-side broadcast kernel,
    // so the doubles are bit-identical.
    "q_decontaminate_semantic" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ev AS (SELECT v FROM base WHERE vec_id % 47 = 0),
        |scored AS (
        |  SELECT b.vec_id,
        |    max(list_dot_product(b.v, e.v) /
        |        (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(e.v, e.v)))) AS max_eval_sim
        |  FROM base b, ev e GROUP BY b.vec_id)
        |SELECT vec_id, max_eval_sim, max_eval_sim >= 0.999 AS contaminated
        |FROM scored ORDER BY vec_id""".stripMargin,

    // Repetition ratio over NON-distinct 2-grams (every occurrence kept):
    // 1 − distinct/total, 0 for empty docs. int/int division in double on
    // both engines → bit-exact.
    "q_text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 2 THEN [array_to_string(tk, ' ')]
        |      ELSE [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |    END AS gs
        |  FROM toks)
        |SELECT doc_id,
        |  CASE WHEN len(gs) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / CAST(len(gs) AS DOUBLE) END AS rep_ratio,
        |  len(gs) AS n_ngrams
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_ann_brute_force" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) DESC,
        |      b.vec_id) AS rn
        |  FROM e a, e b WHERE a.vec_id < 50 AND a.vec_id <> b.vec_id) t
        |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin,

    "q_embedding_near_dup" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id < 200),
        |corpus AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id + 1000000 AS vec_id, v FROM base)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM corpus a, corpus b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.999
        |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_lsh" -> annLshOracle,

    // Keyed pseudonymization: DuckDB replays SHA-256(salt || value) hex;
    // NULL identifiers pass through untouched.
    "q_pseudonymize" ->
      """SELECT c_custkey AS id,
        |  sha256('graft-gate-key' || c_name) AS name,
        |  CASE WHEN c_custkey % 97 = 0 THEN CAST(NULL AS VARCHAR)
        |       ELSE sha256('graft-gate-key' || c_mktsegment) END AS seg
        |FROM customer ORDER BY id""".stripMargin,

    // PCA contract gate: invariants are computed by the ENGINE (component
    // orthonormality, eigen ordering, axis-optimality, bit-stable refit,
    // per-row Parseval energy preservation) — the oracle echoes true, the
    // same pattern as q_quality_classifier. A truncation-recall floor
    // would gate the DATA (isotropic test embeddings), not the operator.
    "q_pca_contract" ->
      """SELECT vec_id, true AS fitted_ok, true AS energy_ok
        |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin,

    // Embedding standardization: replay the fixed-point per-dimension
    // moments (floor onto the 1e-12 grid → exact integer sums — the
    // double→decimal cast is a round-half trap on dyadic floats), the
    // z-projection (0 where std = 0) and the standardized cosine top-10.
    // list(z ORDER BY pos) rebuilds the array so the dot product runs in
    // the engine's sequential array order.
    "q_embed_standardize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |           FROM embeddings WHERE embedding IS NOT NULL),
        |x AS (SELECT vec_id,
        |        unnest(generate_series(1, len(v))) - 1 AS pos,
        |        unnest(v) AS x
        |      FROM e),
        |st AS (
        |  SELECT pos,
        |    (CAST(SUM(CAST(floor(x * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12) / COUNT(*) AS mean,
        |    (CAST(SUM(CAST(floor(x * x * 1e12) AS DECIMAL(38,0))) AS DOUBLE) / 1e12) / COUNT(*) AS ex2
        |  FROM x GROUP BY pos),
        |sd AS (SELECT pos, mean, sqrt(greatest(ex2 - mean * mean, 0.0)) AS std FROM st),
        |zs AS (
        |  SELECT x.vec_id, x.pos,
        |    CASE WHEN sd.std > 0 THEN (x.x - sd.mean) / sd.std ELSE 0.0 END AS z
        |  FROM x JOIN sd USING (pos)),
        |zv AS (SELECT vec_id, list(z ORDER BY pos) AS z FROM zs GROUP BY vec_id),
        |b AS (SELECT vec_id, z, sqrt(list_dot_product(z, z)) AS nrm FROM zv)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_dot_product(a.z, c.z) / (a.nrm * c.nrm) DESC, c.vec_id) AS rn
        |  FROM b a, b c WHERE a.vec_id < 50 AND a.vec_id <> c.vec_id) t
        |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin,

    // Int8-quantized ANN + exact rerank: replay the quantization (max-abs
    // /127 scale, round-half-away codes), the code-cosine coarse top-40
    // (scales cancel in cosine; every coarse score is integer-exact) and
    // the full-precision rerank to top-10. Zero vectors cannot rank.
    "q_ann_int8_rerank" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |qz AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM e),
        |codes AS (
        |  SELECT vec_id, v,
        |    CASE WHEN scale = 0 THEN NULL
        |         ELSE list_transform(v, x -> round(x / scale)) END AS c
        |  FROM qz),
        |b AS (
        |  SELECT vec_id, v, c,
        |    sqrt(list_dot_product(c, c)) AS cn,
        |    sqrt(list_dot_product(v, v)) AS vn
        |  FROM codes WHERE c IS NOT NULL AND list_dot_product(c, c) > 0),
        |pool AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        list_dot_product(q.c, t.c) / (q.cn * t.cn) DESC, t.vec_id) AS rn
        |    FROM b q, b t WHERE q.vec_id < 50 AND q.vec_id <> t.vec_id) s
        |  WHERE rn <= 40),
        |rer AS (
        |  SELECT pool.query_id, pool.neighbor_id,
        |    row_number() OVER (PARTITION BY pool.query_id ORDER BY
        |      list_dot_product(q.v, t.v) / (q.vn * t.vn) DESC, pool.neighbor_id) AS rn
        |  FROM pool
        |  JOIN b q ON q.vec_id = pool.query_id
        |  JOIN b t ON t.vec_id = pool.neighbor_id)
        |SELECT query_id, neighbor_id FROM rer WHERE rn <= 10
        |ORDER BY query_id, neighbor_id""".stripMargin,

    // SimHash exact-collision pairs: over distinct-token sets a SimHash
    // collision ⟺ identical token set on this corpus (verified), so the
    // oracle enumerates equal-set pairs directly.
    "q_simhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents),
        |ts AS (
        |  SELECT doc_id,
        |    list_sort(list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0))) AS s
        |  FROM corpus)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS BIGINT) AS hamming
        |FROM ts a, ts b WHERE a.doc_id < b.doc_id AND a.s = b.s
        |ORDER BY id_a, id_b""".stripMargin,

    "q_text_langid" -> langIdOracle,

    "q_unicode_clean" -> unicodeCleanOracle,

    "q_lang_segments" -> langSegmentsOracle,

    // IVF ANN: centroids are the first 8 corpus vectors by id, so the
    // oracle reads them straight from the embeddings table and replays the
    // coarse quantization (argmax assignment with (score, list) tie-break),
    // the nprobe=1 list join and the cosine top-10 exactly.
    "q_ann_ivf" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, v, nrm, list FROM (
        |    SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, c.list,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |    FROM e, cents c) t
        |  WHERE rn = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS score
        |  FROM assign q JOIN assign c ON q.list = c.list AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 50)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) t
        |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin,

    // Incremental IVF index (q_ann_ivf_increment): the q_ann_ivf replay
    // over the MERGED corpus (base ∪ exact copies at vec_id+1e6), with the
    // centroids still derived from the BASE's first 8 vectors — appends
    // assign against the frozen quantizer, so a from-scratch assignment of
    // the union is the exact truth the stored-index path must reproduce.
    "q_ann_ivf_increment" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (SELECT vec_id, v FROM e0 UNION ALL SELECT vec_id + 1000000, v FROM e0),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e0 WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, v, nrm, list FROM (
        |    SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, c.list,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |    FROM e, cents c) t
        |  WHERE rn = 1),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS score
        |  FROM assign q JOIN assign c ON q.list = c.list AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 50)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) t
        |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin,

    // Incremental IVF-PQ index (q_ann_ivfpq_increment): the q_ann_ivfpq
    // replay over the MERGED corpus (base ∪ exact copies at vec_id+1e6) —
    // centroids AND codebooks still derived from the BASE's first rows,
    // because appends encode under the frozen artifacts; every union
    // vector is encoded/assigned exactly as a from-scratch build would.
    "q_ann_ivfpq_increment" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (SELECT vec_id, v FROM e0 UNION ALL SELECT vec_id + 1000000, v FROM e0),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e0 WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, v, nrm, list FROM (
        |    SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, c.list,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |    FROM e, cents c) t
        |  WHERE rn = 1),
        |cbk AS (
        |  SELECT r.m, e0.vec_id AS j,
        |    list_slice(e0.v, r.m*8+1, r.m*8+8) AS c,
        |    list_dot_product(list_slice(e0.v, r.m*8+1, r.m*8+8), list_slice(e0.v, r.m*8+1, r.m*8+8)) AS nsq
        |  FROM e0, range(8) r(m) WHERE e0.vec_id < 16),
        |enc AS (
        |  SELECT vec_id, m, j AS code FROM (
        |    SELECT e.vec_id, b.m, b.j,
        |      row_number() OVER (PARTITION BY e.vec_id, b.m
        |        ORDER BY list_dot_product(list_slice(e.v, b.m*8+1, b.m*8+8), b.c) - b.nsq/2 DESC, b.j ASC) AS rn
        |    FROM e, cbk b) t WHERE rn = 1),
        |recon AS (
        |  SELECT enc.vec_id, flatten(list(b.c ORDER BY enc.m)) AS r
        |  FROM enc JOIN cbk b ON b.m = enc.m AND b.j = enc.code
        |  GROUP BY enc.vec_id),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, r.r) / (q.nrm * sqrt(list_dot_product(r.r, r.r))) AS score
        |  FROM assign q
        |  JOIN assign c ON q.list = c.list AND q.vec_id <> c.vec_id
        |  JOIN recon r ON r.vec_id = c.vec_id
        |  WHERE q.vec_id < 50)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) t
        |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin,

    // IVF multi-probe (nprobe=2): queries take their TWO nearest centroid
    // lists (score DESC, list DESC — the engine's tie order), corpus stays
    // single-list; otherwise the q_ann_ivf replay.
    "q_ann_ivf_mp" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e WHERE vec_id < 8),
        |ranked AS (
        |  SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, c.list,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |  FROM e, cents c),
        |assign AS (SELECT vec_id, v, nrm, list FROM ranked WHERE rn = 1),
        |probes AS (SELECT vec_id, v, nrm, list FROM ranked WHERE rn <= 2 AND vec_id < 50),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS score
        |  FROM probes q JOIN assign c ON q.list = c.list AND q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) t
        |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin,

    // IVF-PQ: coarse layer replays q_ann_ivf; PQ codebooks are the 8-dim
    // slices of the first 16 corpus vectors, so the oracle re-derives them
    // from the table, encodes every vector (argmax dot - nsq/2, tie
    // smaller code — the engine's exact op order), reconstructs the
    // quantized vector by concatenating chosen codewords, and scores
    // candidates by asymmetric cosine (exact query, reconstructed corpus).
    "q_ann_ivfpq" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, v, nrm, list FROM (
        |    SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, c.list,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |    FROM e, cents c) t
        |  WHERE rn = 1),
        |cbk AS (
        |  SELECT r.m, e.vec_id AS j,
        |    list_slice(e.v, r.m*8+1, r.m*8+8) AS c,
        |    list_dot_product(list_slice(e.v, r.m*8+1, r.m*8+8), list_slice(e.v, r.m*8+1, r.m*8+8)) AS nsq
        |  FROM e, range(8) r(m) WHERE e.vec_id < 16),
        |enc AS (
        |  SELECT vec_id, m, j AS code FROM (
        |    SELECT e.vec_id, b.m, b.j,
        |      row_number() OVER (PARTITION BY e.vec_id, b.m
        |        ORDER BY list_dot_product(list_slice(e.v, b.m*8+1, b.m*8+8), b.c) - b.nsq/2 DESC, b.j ASC) AS rn
        |    FROM e, cbk b) t WHERE rn = 1),
        |recon AS (
        |  SELECT enc.vec_id, flatten(list(b.c ORDER BY enc.m)) AS r
        |  FROM enc JOIN cbk b ON b.m = enc.m AND b.j = enc.code
        |  GROUP BY enc.vec_id),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(q.v, r.r) / (q.nrm * sqrt(list_dot_product(r.r, r.r))) AS score
        |  FROM assign q
        |  JOIN assign c ON q.list = c.list AND q.vec_id <> c.vec_id
        |  JOIN recon r ON r.vec_id = c.vec_id
        |  WHERE q.vec_id < 50)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rn
        |  FROM scored) t
        |WHERE rn <= 10 ORDER BY query_id, neighbor_id""".stripMargin,

    // Incremental SemDedup through the stored IVF index: replay the
    // frozen-centroid assignment of corpus AND increment, then the
    // exists-a-same-cluster-dominator decision (cosine >= 0.99 against any
    // STORED vector; arrival order makes every stored vector a valid
    // dominator, no keep-order predicate) — identical IEEE op order to
    // IvfIndex.semDedupIncrement.
    "q_semdedup_increment" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e WHERE vec_id < 8),
        |corp AS (
        |  SELECT vec_id, v, nrm, list FROM (
        |    SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, c.list,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |    FROM e, cents c) t
        |  WHERE rn = 1),
        |inc0 AS (
        |  SELECT vec_id + 1000000 AS vec_id, v FROM e WHERE vec_id < 150
        |  UNION ALL
        |  SELECT vec_id + 2000000, list_reverse(v) FROM e WHERE vec_id >= 150 AND vec_id < 300),
        |iass AS (
        |  SELECT vec_id, v, nrm, list FROM (
        |    SELECT i.vec_id, i.v, sqrt(list_dot_product(i.v, i.v)) AS nrm, c.list,
        |      row_number() OVER (PARTITION BY i.vec_id
        |        ORDER BY list_dot_product(i.v, c.cv) / sqrt(list_dot_product(i.v, i.v)) DESC, c.list DESC) AS rn
        |    FROM inc0 i, cents c) t
        |  WHERE rn = 1)
        |SELECT i.vec_id FROM iass i
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM corp s
        |  WHERE s.list = i.list
        |    AND list_dot_product(i.v, s.v) / (i.nrm * s.nrm) >= 0.99)
        |ORDER BY vec_id""".stripMargin,

    // SemDeDup: the corpus plus a planted exact copy of every vector
    // (ids +1e6), assigned to the q_ann_ivf readable centroids; a row is
    // pruned when a same-cluster neighbor at cosine >= 0.999 precedes it
    // in the (centroid-sim ASC, id ASC) keep order. Survivors replayed
    // with the identical IEEE op sequences.
    "q_semdedup" ->
      """WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |e AS (SELECT vec_id, v FROM e0 UNION ALL SELECT vec_id + 1000000, v FROM e0),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e0 WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, v, nrm, list, sim FROM (
        |    SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, c.list,
        |      list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) AS sim,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |    FROM e, cents c) t
        |  WHERE rn = 1)
        |SELECT r.vec_id FROM assign r
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM assign s
        |  WHERE s.list = r.list AND s.vec_id <> r.vec_id
        |    AND list_dot_product(r.v, s.v) / (r.nrm * s.nrm) >= 0.999
        |    AND (s.sim < r.sim OR (s.sim = r.sim AND s.vec_id < r.vec_id)))
        |ORDER BY r.vec_id""".stripMargin,

    // Cluster-then-curate (graft.ext.Clustering): argmax-cosine assignment
    // to the q_ann_ivf readable centroids (tie -> larger list), then two
    // per-cluster windows — prototypicality prune keeps the hardest 400‰
    // (centroid_sim ASC, vec_id ASC; ⌈n·400/1000⌉ in exact integer
    // cross-multiplication) and the balanced sample keeps the first 20 in
    // the Datasets golden-ratio hash order. Booleans only in the output.
    "q_cluster_curation" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cents AS (SELECT vec_id AS list, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv FROM e WHERE vec_id < 8),
        |assign AS (
        |  SELECT vec_id, list AS cluster_id, sim FROM (
        |    SELECT e.vec_id, c.list,
        |      list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) AS sim,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY list_dot_product(e.v, c.cv) / sqrt(list_dot_product(e.v, e.v)) DESC, c.list DESC) AS rn
        |    FROM e, cents c) t
        |  WHERE rn = 1),
        |ranked AS (
        |  SELECT vec_id, cluster_id, sim,
        |    row_number() OVER (PARTITION BY cluster_id ORDER BY sim ASC, vec_id ASC) AS prn,
        |    count(*) OVER (PARTITION BY cluster_id) AS n,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY (vec_id * 2654435761) % 2147483648 ASC, vec_id ASC) AS brn
        |  FROM assign)
        |SELECT vec_id, cluster_id,
        |  (prn * 1000 <= n * 400 + 999) AS kept,
        |  (brn <= 20) AS balanced
        |FROM ranked ORDER BY vec_id""".stripMargin,

    // Exact-substring duplicate spans: 40-char grams sampled every 10
    // chars, grams in >= 2 distinct docs (min doc <> max doc), per-doc
    // gaps-and-islands merge (break when pos > prev + gramLen), span end
    // exclusive at last gram + gramLen.
    "q_dup_spans" ->
      """WITH g AS (
        |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
        |    substr(text, CAST(p AS INT) + 1, 40) AS gram
        |  FROM documents, LATERAL unnest(range(0, len(text) - 39, 10)) t(p)
        |  WHERE len(text) >= 40),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |occ AS (SELECT doc_id, pos FROM g JOIN d USING (gram)),
        |lagd AS (SELECT doc_id, pos,
        |  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM occ),
        |isl AS (SELECT doc_id, pos,
        |  sum(CASE WHEN prev IS NULL OR pos > prev + 40 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM lagd)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 40 AS span_end
        |FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,

    // Fixed-point integer PageRank, 3 unrolled iterations. Every term is
    // long arithmetic (scale 10^12, damping 850/1000, truncating division)
    // so DuckDB's replay is bit-exact: base = ((S//n)*150)//1000, per-edge
    // contribution rank//deg, dangling share dang//n, and the damped sum
    // (850*(inflow + dang//n))//1000. Operands are all non-negative so
    // floor (DuckDB //) and truncate (Spark div) agree.
    "q_pagerank" ->
      """WITH e AS (
        |  SELECT user_id AS src, event_id % 150 AS dst FROM events
        |  WHERE event_type = 'click' AND value > 10),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |p AS (SELECT count(*) AS n, ((1000000000000 // count(*)) * 150) // 1000 AS base FROM nodes),
        |r0 AS (SELECT node, 1000000000000 // n AS rank FROM nodes, p),
        |d0 AS (SELECT coalesce(sum(r.rank), 0) AS dang FROM r0 r LEFT JOIN od ON r.node = od.src WHERE od.deg IS NULL),
        |i0 AS (SELECT e.dst, sum(r.rank // od.deg) AS fl FROM e JOIN r0 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |r1 AS (SELECT node, CAST(base + (850 * (coalesce(fl, 0) + (dang // n))) // 1000 AS BIGINT) AS rank
        |  FROM nodes CROSS JOIN p CROSS JOIN d0 LEFT JOIN i0 ON node = i0.dst),
        |d1 AS (SELECT coalesce(sum(r.rank), 0) AS dang FROM r1 r LEFT JOIN od ON r.node = od.src WHERE od.deg IS NULL),
        |i1 AS (SELECT e.dst, sum(r.rank // od.deg) AS fl FROM e JOIN r1 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |r2 AS (SELECT node, CAST(base + (850 * (coalesce(fl, 0) + (dang // n))) // 1000 AS BIGINT) AS rank
        |  FROM nodes CROSS JOIN p CROSS JOIN d1 LEFT JOIN i1 ON node = i1.dst),
        |d2 AS (SELECT coalesce(sum(r.rank), 0) AS dang FROM r2 r LEFT JOIN od ON r.node = od.src WHERE od.deg IS NULL),
        |i2 AS (SELECT e.dst, sum(r.rank // od.deg) AS fl FROM e JOIN r2 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |r3 AS (SELECT node, CAST(base + (850 * (coalesce(fl, 0) + (dang // n))) // 1000 AS BIGINT) AS rank
        |  FROM nodes CROSS JOIN p CROSS JOIN d2 LEFT JOIN i2 ON node = i2.dst)
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,

    // Fixed-point integer HITS, 2 unrolled iterations. Raw sums are long
    // additions; each L1 normalization is (raw * 10^12) // total with the
    // multiply in 128-bit integers (HUGEINT here, DECIMAL(38,0) on the
    // Spark side) truncated back to BIGINT — non-negative operands, so
    // floor and truncate agree and the replay is bit-exact.
    "q_hits" ->
      """WITH e AS (
        |  SELECT user_id AS src, event_id % 97 AS dst FROM events
        |  WHERE event_type = 'view' AND value > 5),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |p AS (SELECT count(*) AS n FROM nodes),
        |h0 AS (SELECT node, 1000000000000 // n AS score FROM nodes, p),
        |ar1 AS (SELECT nd.node, coalesce(s.raw, 0) AS raw FROM nodes nd LEFT JOIN
        |  (SELECT e.dst, sum(h.score) AS raw FROM e JOIN h0 h ON e.src = h.node GROUP BY e.dst) s
        |  ON nd.node = s.dst),
        |a1 AS (SELECT node, CAST(CAST(raw AS HUGEINT) * 1000000000000 // (SELECT sum(raw) FROM ar1) AS BIGINT) AS score FROM ar1),
        |hr1 AS (SELECT nd.node, coalesce(s.raw, 0) AS raw FROM nodes nd LEFT JOIN
        |  (SELECT e.src, sum(a.score) AS raw FROM e JOIN a1 a ON e.dst = a.node GROUP BY e.src) s
        |  ON nd.node = s.src),
        |h1 AS (SELECT node, CAST(CAST(raw AS HUGEINT) * 1000000000000 // (SELECT sum(raw) FROM hr1) AS BIGINT) AS score FROM hr1),
        |ar2 AS (SELECT nd.node, coalesce(s.raw, 0) AS raw FROM nodes nd LEFT JOIN
        |  (SELECT e.dst, sum(h.score) AS raw FROM e JOIN h1 h ON e.src = h.node GROUP BY e.dst) s
        |  ON nd.node = s.dst),
        |a2 AS (SELECT node, CAST(CAST(raw AS HUGEINT) * 1000000000000 // (SELECT sum(raw) FROM ar2) AS BIGINT) AS score FROM ar2),
        |hr2 AS (SELECT nd.node, coalesce(s.raw, 0) AS raw FROM nodes nd LEFT JOIN
        |  (SELECT e.src, sum(a.score) AS raw FROM e JOIN a2 a ON e.dst = a.node GROUP BY e.src) s
        |  ON nd.node = s.src),
        |h2 AS (SELECT node, CAST(CAST(raw AS HUGEINT) * 1000000000000 // (SELECT sum(raw) FROM hr2) AS BIGINT) AS score FROM hr2)
        |SELECT h2.node, h2.score AS hub, a2.score AS auth
        |FROM h2 JOIN a2 ON h2.node = a2.node ORDER BY h2.node""".stripMargin,

    // Triangle counts by an algorithm INDEPENDENT of the Spark side's
    // degree-ordered orientation: the ordered 3-way self-join u<v<w finds
    // each triangle exactly once with no degree table at all. Integer
    // counts + truncating-division permille -> bit-exact.
    "q_triangles" ->
      """WITH raw AS (
        |  SELECT user_id % 120 AS a, event_id % 120 AS b FROM events
        |  WHERE event_type = 'click'),
        |e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v FROM raw WHERE a <> b),
        |deg AS (SELECT node, count(*) AS deg FROM
        |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY node),
        |tris AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tc AS (SELECT node, count(*) AS tri FROM
        |  (SELECT a AS node FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris)
        |  GROUP BY node)
        |SELECT d.node, d.deg, coalesce(t.tri, 0) AS tri,
        |  CAST(CASE WHEN d.deg >= 2
        |    THEN (2000 * coalesce(t.tri, 0)) // (d.deg * (d.deg - 1))
        |    ELSE 0 END AS BIGINT) AS lcc_permille
        |FROM deg d LEFT JOIN tc t ON d.node = t.node ORDER BY d.node""".stripMargin,

    // Exact Jaccard-threshold join, verified by brute force: the oracle
    // cross-joins ALL doc pairs (independent of the Spark side's
    // prefix-filter candidate generation), so a single false negative in
    // the prefix filter would surface as a row-count mismatch. Integer
    // counts + truncating-division permille -> bit-exact.
    "q_jaccard_join" ->
      """WITH d AS (
        |  SELECT * FROM documents
        |  WHERE (doc_id * 2654435761) % 1000 < 100),
        |tok AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> len(t) > 0)) AS la
        |  FROM d WHERE text IS NOT NULL),
        |t2 AS (SELECT * FROM tok WHERE len(la) > 0),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(len(list_intersect(a.la, b.la)) AS BIGINT) AS inter_size,
        |    CAST(len(a.la) + len(b.la) - len(list_intersect(a.la, b.la)) AS BIGINT) AS union_size
        |  FROM t2 a JOIN t2 b ON a.doc_id < b.doc_id)
        |SELECT id_a, id_b, inter_size, union_size,
        |  (1000 * inter_size) // union_size AS jacc_permille
        |FROM pairs WHERE 1000 * inter_size >= 900 * union_size
        |ORDER BY id_a, id_b""".stripMargin,

    // KMV sketch state replay: DISTINCT hash ORDER BY LIMIT k IS the
    // algorithm — integer state, bit-exact.
    "q_kmv_sketch" ->
      """SELECT DISTINCT (o_orderkey * 2654435761) % 4294967296 AS hv
        |FROM orders WHERE o_orderkey IS NOT NULL
        |ORDER BY hv LIMIT 512""".stripMargin,

    // Grouped KMV state replay: per group, the k smallest distinct hashes
    // by definition (row_number over the distinct pairs). Spark's kmv_agg
    // buffer computes the same state without ever shuffling the pairs.
    "q_kmv_grouped" ->
      """WITH h AS (
        |  SELECT DISTINCT o_orderpriority, (o_custkey * 2654435761) % 4294967296 AS hv
        |  FROM orders WHERE o_custkey IS NOT NULL),
        |r AS (SELECT o_orderpriority, hv,
        |  row_number() OVER (PARTITION BY o_orderpriority ORDER BY hv) AS rn FROM h)
        |SELECT o_orderpriority, hv FROM r WHERE rn <= 64
        |ORDER BY o_orderpriority, hv""".stripMargin,

    // Markov transition matrix: identical lag window (total order via the
    // event_id tiebreak) + hash agg + truncating-division permille in both
    // engines -> bit-exact.
    "q_event_transitions" ->
      """WITH s AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |m AS (SELECT from_type, event_type AS to_type, count(*) AS n
        |  FROM s WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
        |  (1000 * n) // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_permille
        |FROM m ORDER BY from_type, to_type""".stripMargin,

    // Robust outlier screen replay: the same counting-median (rank
    // ceil(n/2), "2*cum >= n") formulation on the permille-quantized
    // value — every step integer, bit-exact.
    "q_mad_outliers" ->
      """WITH v AS (SELECT event_type AS g, CAST(floor(value * 1000) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |cm AS (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2),
        |med AS (SELECT g, min(x) AS median FROM (
        |    SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum,
        |           sum(c) OVER (PARTITION BY g) AS n FROM cm) s
        |  WHERE 2 * cum >= n GROUP BY g),
        |d AS (SELECT v.g, abs(v.x - med.median) AS ad, med.median AS median
        |  FROM v JOIN med ON v.g = med.g),
        |cd AS (SELECT g, ad, count(*) AS c FROM d GROUP BY 1, 2),
        |mad AS (SELECT g, min(ad) AS mad FROM (
        |    SELECT g, ad, sum(c) OVER (PARTITION BY g ORDER BY ad) AS cum,
        |           sum(c) OVER (PARTITION BY g) AS n FROM cd) s
        |  WHERE 2 * cum >= n GROUP BY g)
        |SELECT d.g AS event_type, max(d.median) AS median, max(mad.mad) AS mad,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN d.ad > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM d JOIN mad ON d.g = mad.g GROUP BY d.g ORDER BY event_type""".stripMargin,

    // BFS hop levels: independent recursive-CTE formulation — UNION
    // dedups (node, lvl) pairs so cyclic graphs stay bounded; min(lvl)
    // per node is the hop distance. Integer arithmetic -> bit-exact.
    "q_bfs_levels" ->
      """WITH RECURSIVE e AS (
        |  SELECT (user_id % 120) AS u, (event_id % 120) AS v FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT (event_id % 120) AS u, (user_id % 120) AS v FROM events WHERE event_type = 'click'),
        |walk(node, lvl) AS (
        |  SELECT CAST(s.node AS BIGINT), 0 FROM (VALUES (0), (1), (2)) s(node)
        |  UNION
        |  SELECT e.v, walk.lvl + 1 FROM walk JOIN e ON e.u = walk.node
        |  WHERE walk.lvl < 20)
        |SELECT node, min(lvl) AS level FROM walk GROUP BY node ORDER BY node""".stripMargin,

    // Perceptual-hash gate: the oracle restates the PLANTED pixel
    // arithmetic (gray gradient / RGB channel formulas from doc_id) and
    // replays the integer aHash — block partition (y*8//h, x*8//w),
    // truncating block/global means, strict > threshold — while the
    // Spark side must recover identical bits by actually decoding the
    // planted PNG pixels. Hash reported as unsigned 32-bit halves (an
    // engine cannot state 1<<63 in a signed BIGINT).
    "q_image_phash" ->
      """WITH d AS (SELECT doc_id, CAST(16 + doc_id % 120 AS BIGINT) AS w,
        |    CAST(16 + (doc_id // 7) % 120 AS BIGINT) AS h, (doc_id % 4 = 0) AS gray
        |  FROM documents WHERE doc_id < 200),
        |px AS (
        |  SELECT doc_id, w, h, x, y,
        |    CASE WHEN gray THEN ((x * 31 + y * 17 + doc_id) % 256) * 1000
        |         ELSE ((x + doc_id) % 256) * 299 + ((y + 2 * doc_id) % 256) * 587 + (xor(x, y) % 256) * 114
        |    END AS luma,
        |    ((y * 8) // h) * 8 + ((x * 8) // w) AS bi
        |  FROM d, LATERAL unnest(range(0, w)) t1(x), LATERAL unnest(range(0, h)) t2(y)),
        |g AS (SELECT doc_id, CAST(sum(luma) AS BIGINT) // (max(w) * max(h)) AS gmean FROM px GROUP BY doc_id),
        |b AS (SELECT doc_id, bi, CAST(sum(luma) AS BIGINT) // count(*) AS bmean FROM px GROUP BY doc_id, bi),
        |bits AS (SELECT b.doc_id AS doc_id, bi, (b.bmean > g.gmean) AS on_bit
        |  FROM b JOIN g ON b.doc_id = g.doc_id)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN on_bit AND bi >= 32 THEN (CAST(1 AS BIGINT) << CAST(bi - 32 AS INT)) ELSE 0 END) AS BIGINT) AS phash_hi,
        |  CAST(sum(CASE WHEN on_bit AND bi < 32 THEN (CAST(1 AS BIGINT) << CAST(bi AS INT)) ELSE 0 END) AS BIGINT) AS phash_lo
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // k-core replay: 4 unrolled peel rounds (degree >= 3 on the
    // symmetrized distinct edge set, both endpoints must survive) —
    // integer degrees, bit-exact.
    "q_kcore" ->
      """WITH raw AS (SELECT user_id % 120 AS a, event_id % 120 AS b FROM events
        |  WHERE event_type = 'view'),
        |e0 AS (SELECT u, v FROM (
        |  SELECT a AS u, b AS v FROM raw WHERE a <> b
        |  UNION SELECT b AS u, a AS v FROM raw WHERE a <> b)),
        |n1 AS (SELECT u FROM e0 GROUP BY u HAVING count(*) >= 3),
        |e1 AS (SELECT e.u, e.v FROM e0 e JOIN n1 x ON e.u = x.u JOIN n1 y ON e.v = y.u),
        |n2 AS (SELECT u FROM e1 GROUP BY u HAVING count(*) >= 3),
        |e2 AS (SELECT e.u, e.v FROM e1 e JOIN n2 x ON e.u = x.u JOIN n2 y ON e.v = y.u),
        |n3 AS (SELECT u FROM e2 GROUP BY u HAVING count(*) >= 3),
        |e3 AS (SELECT e.u, e.v FROM e2 e JOIN n3 x ON e.u = x.u JOIN n3 y ON e.v = y.u),
        |n4 AS (SELECT u FROM e3 GROUP BY u HAVING count(*) >= 3),
        |e4 AS (SELECT e.u, e.v FROM e3 e JOIN n4 x ON e.u = x.u JOIN n4 y ON e.v = y.u)
        |SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM e4
        |GROUP BY u ORDER BY node""".stripMargin,

    // RRF replay: the q_bm25 score CTEs drive ranking A (float scores are
    // bit-exact cross-engine, so derived ranks agree), document length
    // drives ranking B; integer points 1000 // (60 + rank) summed.
    "q_rrf_fusion" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
        |    CAST((SELECT sum(len(tk)) FROM tk WHERE tk IS NOT NULL) AS DOUBLE) /
        |      CAST((SELECT count(tk) FROM tk) AS DOUBLE) AS avgdl),
        |toks AS (
        |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term FROM tk),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
        |  FROM toks WHERE term IN ('dup', 'merge', 'vector', 'window')
        |  GROUP BY doc_id, term),
        |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |per_term AS (
        |  SELECT doc_id, term,
        |    ((n - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
        |      (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)) AS score
        |  FROM tf JOIN dft USING (term) CROSS JOIN stats),
        |bm AS (SELECT doc_id,
        |  coalesce(max(CASE WHEN term = 'dup' THEN score END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'merge' THEN score END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'vector' THEN score END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'window' THEN score END), 0.0) AS bm25
        |  FROM per_term GROUP BY doc_id),
        |ra AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM bm)
        |  WHERE rank <= 50),
        |rb AS (SELECT doc_id, rank FROM (
        |  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents WHERE n_chars IS NOT NULL) WHERE rank <= 50),
        |u AS (SELECT doc_id, 1000 // (60 + rank) AS pts FROM ra
        |  UNION ALL SELECT doc_id, 1000 // (60 + rank) AS pts FROM rb)
        |SELECT doc_id, CAST(sum(pts) AS BIGINT) AS rrf_score, count(*) AS n_systems
        |FROM u GROUP BY doc_id ORDER BY rrf_score DESC, doc_id LIMIT 20""".stripMargin,

    // Vocab-coverage replay: same tokenization, (count desc, token) rank,
    // cumulative permille of the total — sums CAST from HUGEINT.
    "q_vocab_coverage" ->
      """WITH tok AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS w FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
        |r AS (SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank FROM c)
        |SELECT rank, w AS token, cnt,
        |  (1000 * CAST(sum(cnt) OVER (ORDER BY rank) AS BIGINT)) // total AS cum_permille
        |FROM r CROSS JOIN tot WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // BPE-pair replay: per-token adjacent char pairs via 1-based substr
    // over range(1, len) — identical char semantics both engines.
    "q_bpe_pairs" ->
      """WITH tok AS (SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS w FROM documents WHERE text IS NOT NULL),
        |pr AS (SELECT substr(w, CAST(i AS INT), 2) AS pair
        |  FROM tok, LATERAL unnest(range(1, len(w))) t(i) WHERE len(w) >= 2),
        |c AS (SELECT pair, count(*) AS cnt FROM pr GROUP BY pair)
        |SELECT rank, pair, cnt FROM (
        |  SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rank FROM c)
        |WHERE rank <= 40 ORDER BY rank""".stripMargin,

    // Temperature-mix replay: per-lang counts, pa = sqrt(c) (IEEE
    // correctly rounded both engines), the FIXED weight expression tree
    // (N·pa / Σpa) / c, then the floor + hash-gated fractional copy.
    "q_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS c FROM documents WHERE lang IS NOT NULL GROUP BY lang),
        |p AS (SELECT lang, c, sqrt(CAST(c AS DOUBLE)) AS pa FROM c),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot, sum(pa) AS pa_tot FROM p),
        |w AS (SELECT lang,
        |  ((CAST(n_tot AS DOUBLE) * pa / pa_tot) / CAST(c AS DOUBLE)) AS w
        |  FROM p CROSS JOIN t),
        |d AS (SELECT doc_id, documents.lang AS lang, coalesce(w.w, 1.0) AS w
        |  FROM documents LEFT JOIN w ON documents.lang = w.lang),
        |n AS (SELECT doc_id, lang,
        |  CAST(floor(w) AS BIGINT) +
        |    CASE WHEN (doc_id * 2654435789) % 1000 <
        |              CAST(round((w - floor(w)) * 1000) AS BIGINT)
        |         THEN 1 ELSE 0 END AS n
        |  FROM d)
        |SELECT lang, CAST(sum(n) AS BIGINT) AS n_out
        |FROM n WHERE n > 0 GROUP BY lang ORDER BY lang""".stripMargin,

    // Content-defined chunking replay: per-position window-hash fold
    // (list_reduce seeded via list_prepend(0, …) = Spark's aggregate
    // init 0), boundary rule % 16, chunk slicing and the md5 60-bit
    // chunk hash — then the recurring-chunk rollup.
    "q_chunk_dedup" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0) AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |nz AS (SELECT doc_id, tk FROM toks WHERE len(tk) > 0),
        |h AS (SELECT doc_id, tk,
        |  [CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) for t in tk] AS hv FROM nz),
        |w AS (SELECT doc_id, tk,
        |  [list_reduce(list_prepend(0, hv[greatest(1, i - 3):i]),
        |     (a, b) -> (a * 31 + b) % 1000000007)
        |   for i in range(1, len(tk) + 1)] AS wh FROM h),
        |b AS (SELECT doc_id, tk, list_sort(list_distinct(list_append(
        |    [CAST(i AS BIGINT) for i in range(1, len(tk) + 1) if wh[i] % 16 = 0],
        |    CAST(len(tk) AS BIGINT)))) AS bs FROM w),
        |c AS (SELECT doc_id,
        |    CAST(('0x' || substring(md5(array_to_string(
        |      tk[CAST((CASE WHEN k = 1 THEN 0 ELSE bs[CAST(k AS INT) - 1] END) + 1 AS INT):
        |         CAST(bs[CAST(k AS INT)] AS INT)], ' ')), 1, 15)) AS BIGINT) AS chunk_hash,
        |    bs[CAST(k AS INT)] - (CASE WHEN k = 1 THEN 0 ELSE bs[CAST(k AS INT) - 1] END) AS chunk_len
        |  FROM b, LATERAL unnest(range(1, len(bs) + 1)) t(k))
        |SELECT chunk_hash, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs, min(chunk_len) AS chunk_len
        |FROM c GROUP BY chunk_hash HAVING count(*) >= 2
        |ORDER BY chunk_hash""".stripMargin,

    // Hashed linear classifier replay: same unigram+bigram explode, the
    // pinned md5 60-bit bucket hash mod 4096, the same regenerated
    // sparse weight table, left join + integer sum.
    "q_linear_score" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0) AS tk
        |  FROM documents WHERE text IS NOT NULL),
        |f AS (
        |  SELECT doc_id, unnest(list_concat(tk,
        |    CASE WHEN len(tk) >= 2
        |         THEN [array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]
        |         ELSE [] END)) AS f
        |  FROM toks),
        |b AS (SELECT doc_id,
        |  CAST(('0x' || substring(md5(f), 1, 15)) AS BIGINT) % 4096 AS bucket FROM f),
        |w AS (SELECT i AS bucket, (i * 2654435761) % 2001 - 1000 AS weight
        |  FROM range(4096) t(i) WHERE i % 3 <> 2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_features,
        |  CAST(sum(coalesce(weight, 0)) AS BIGINT) AS raw_score
        |FROM b LEFT JOIN w USING (bucket)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Canonical-URL dedup replay: rebuild the synthesized URLs, then
    // every urlCanonicalize step — fragment, query split, scheme/host
    // lowercase, www./default-port strip, tracking-param filter + sort,
    // trailing slash — in DuckDB string functions (right() stands in for
    // Spark's negative-index substring; equal for the compare-to-suffix
    // use both make of it).
    "q_url_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, 'HTTPS://WWW.' || upper(source) || '.Example.COM:443/Docs/' ||
        |    CAST(doc_id % 40 AS VARCHAR) ||
        |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
        |    '?utm_source=feed&id=' || CAST(doc_id % 160 AS VARCHAR) || '&b=2&a=1' ||
        |    CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |c2 AS (SELECT doc_id,
        |  CASE WHEN strpos(trim(url), '#') > 0
        |       THEN substr(trim(url), 1, strpos(trim(url), '#') - 1)
        |       ELSE trim(url) END AS u FROM d),
        |c3 AS (SELECT doc_id,
        |  CASE WHEN strpos(u, '?') > 0 THEN substr(u, 1, strpos(u, '?') - 1) ELSE u END AS base,
        |  CASE WHEN strpos(u, '?') > 0
        |       THEN substr(u, strpos(u, '?') + 1, len(u) - strpos(u, '?')) ELSE '' END AS rawq
        |  FROM c2),
        |c4 AS (SELECT doc_id, rawq,
        |  CASE WHEN strpos(base, '://') > 0
        |       THEN lower(substr(base, 1, strpos(base, '://') - 1)) ELSE '' END AS scheme,
        |  CASE WHEN strpos(base, '://') > 0
        |       THEN substr(base, strpos(base, '://') + 3, len(base)) ELSE base END AS rest
        |  FROM c3),
        |c5 AS (SELECT doc_id, rawq, scheme,
        |  lower(CASE WHEN strpos(rest, '/') > 0
        |             THEN substr(rest, 1, strpos(rest, '/') - 1) ELSE rest END) AS hostport,
        |  CASE WHEN strpos(rest, '/') > 0
        |       THEN substr(rest, strpos(rest, '/'), len(rest)) ELSE '' END AS path0
        |  FROM c4),
        |c6 AS (SELECT doc_id, rawq, scheme, path0,
        |  CASE WHEN substr(hostport, 1, 4) = 'www.'
        |       THEN substr(hostport, 5, len(hostport)) ELSE hostport END AS nw
        |  FROM c5),
        |c7 AS (SELECT doc_id, rawq, scheme, path0,
        |  CASE WHEN scheme = 'https' AND right(nw, 4) = ':443' THEN substr(nw, 1, len(nw) - 4)
        |       WHEN scheme = 'http' AND right(nw, 3) = ':80' THEN substr(nw, 1, len(nw) - 3)
        |       ELSE nw END AS host
        |  FROM c6),
        |c8 AS (SELECT doc_id, scheme, host,
        |  CASE WHEN len(path0) > 1 AND right(path0, 1) = '/'
        |       THEN substr(path0, 1, len(path0) - 1) ELSE path0 END AS path,
        |  array_to_string(list_sort(list_filter(string_split(rawq, '&'),
        |    p -> len(p) > 0 AND NOT starts_with(p, 'utm_')
        |      AND NOT (split_part(p, '=', 1) IN ('fbclid', 'gclid', 'ref')))), '&') AS q
        |  FROM c7),
        |canon AS (SELECT doc_id,
        |  (CASE WHEN scheme = '' THEN '' ELSE scheme || '://' END) || host || path ||
        |  (CASE WHEN q = '' THEN '' ELSE '?' || q END) AS canonical_url
        |  FROM c8)
        |SELECT canonical_url, min(doc_id) AS keeper_id, count(*) AS n_dups
        |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,

    // Containment replay: EXHAUSTIVE brute-force cross join over the
    // bounded corpus (base doc_id < 400 + planted first-12-token prefix
    // docs at id+2e6) — the prefix-filtered Spark join must reproduce it
    // exactly (no false negatives). Shingle rule identical to the
    // near-dup gates (3-gram, short-text whole-string fallback).
    "q_containment_pairs" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id < 400),
        |tk0 AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0) AS tk
        |  FROM base WHERE text IS NOT NULL),
        |corpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL
        |  SELECT doc_id + 2000000, array_to_string(tk[1:12], ' ')
        |  FROM tk0 WHERE doc_id % 20 = 0 AND len(tk) >= 15),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0) AS tk
        |  FROM corpus WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks),
        |d AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
        |p AS (
        |  SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
        |    CAST(len(list_intersect(a.s, b.s)) AS BIGINT) AS inter_size,
        |    CAST(len(a.s) AS BIGINT) AS src_size
        |  FROM d a, d b WHERE a.doc_id <> b.doc_id)
        |SELECT src_id, dst_id, inter_size, src_size,
        |  (1000 * inter_size) // src_size AS containment_permille
        |FROM p WHERE 1000 * inter_size >= 500 * src_size
        |ORDER BY src_id, dst_id""".stripMargin,

    // Blocklist replay: multi-length gram comprehension + VALUES join
    // (see blocklistOracle — built from the same phrase seq).
    "q_blocklist" -> blocklistOracle,

    // Full BPE training replay: 8 unrolled merge rounds (see
    // bpeTrainOracle) — the same word-count table, top-pair choice and
    // replace-based re-segmentation as TextAnalysis.bpeTrain.
    "q_bpe_train" -> bpeTrainOracle(8),

    // Span-decontamination replay: dense (stride-1) eval grams from the
    // doc_id % 37 subset, stride-10 corpus grams, membership semi join,
    // and q_dup_spans' island merge — strings + integers, bit-exact.
    "q_decontaminate_spans" ->
      """WITH ev AS (
        |  SELECT DISTINCT substr(text, CAST(p AS INT) + 1, 40) AS gram
        |  FROM documents, LATERAL unnest(range(0, len(text) - 39, 1)) t(p)
        |  WHERE doc_id % 37 = 0 AND len(text) >= 40),
        |g AS (
        |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
        |    substr(text, CAST(p AS INT) + 1, 40) AS gram
        |  FROM documents, LATERAL unnest(range(0, len(text) - 39, 10)) t(p)
        |  WHERE len(text) >= 40),
        |occ AS (SELECT doc_id, pos FROM g JOIN ev USING (gram)),
        |lagd AS (SELECT doc_id, pos,
        |  lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM occ),
        |isl AS (SELECT doc_id, pos,
        |  sum(CASE WHEN prev IS NULL OR pos > prev + 40 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM lagd)
        |SELECT doc_id, min(pos) AS span_start, max(pos) + 40 AS span_end
        |FROM isl GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,

    // Corpus-diff replay: rebuild the derived new corpus (drop %7, edit
    // %5 with a ' v2' suffix, add %11 at id+1e6), fingerprint both sides
    // (the q_text_fingerprint formulation) and compare null-safely.
    "q_corpus_diff" ->
      """WITH oldc AS (SELECT doc_id,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp FROM documents),
        |newc AS (
        |  SELECT doc_id, md5(lower(regexp_replace(trim(
        |      CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE doc_id % 11 = 0)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oldc o FULL JOIN newc n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin,

    // Bigram-surprisal replay: the same tokenization, 1-based list-index
    // bigram extraction, vocabulary-level count tables and truncating
    // permille — integers end to end (sums CAST from DuckDB's HUGEINT).
    "q_bigram_surprisal" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS l
        |  FROM documents WHERE text IS NOT NULL),
        |occ AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
        |  FROM t, LATERAL unnest(range(1, len(l))) r(i) WHERE len(l) >= 2),
        |uni AS (SELECT w, count(*) AS c1 FROM (SELECT unnest(l) AS w FROM t) GROUP BY 1),
        |bg AS (SELECT w1, w2, count(*) AS c12 FROM occ GROUP BY 1, 2),
        |sc AS (SELECT o.doc_id, (1000 * bg.c12) // uni.c1 AS pm
        |  FROM occ o JOIN bg ON o.w1 = bg.w1 AND o.w2 = bg.w2 JOIN uni ON o.w1 = uni.w)
        |SELECT doc_id, count(*) AS n_bigrams, CAST(sum(pm) AS BIGINT) AS sum_permille,
        |  CAST(sum(pm) AS BIGINT) // count(*) AS mean_permille
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Corpus-card replay: plain aggregates plus the global duplicate
    // fingerprint set attributed per source — md5 fingerprint and token
    // count reuse the q_text_fingerprint / q_text_tokens formulations.
    "q_corpus_card" ->
      """WITH f AS (SELECT doc_id, source, lang, text,
        |    CASE WHEN text IS NOT NULL
        |      THEN md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) END AS fp
        |  FROM documents),
        |d AS (SELECT fp FROM f WHERE fp IS NOT NULL GROUP BY fp HAVING count(*) > 1),
        |dup AS (SELECT f.source, count(*) AS n_dup_docs FROM f JOIN d ON f.fp = d.fp GROUP BY 1)
        |SELECT f.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN f.text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
        |  count(DISTINCT f.lang) AS n_langs,
        |  CAST(sum(CASE WHEN f.text IS NULL THEN 0 ELSE len(f.text) END) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN f.text IS NULL THEN 0
        |    WHEN len(trim(f.text)) = 0 THEN 0
        |    ELSE len(string_split_regex(trim(f.text), '\s+')) END) AS BIGINT) AS sum_tokens,
        |  coalesce(max(dup.n_dup_docs), 0) AS n_dup_docs
        |FROM f LEFT JOIN dup ON f.source = dup.source
        |GROUP BY f.source ORDER BY f.source""".stripMargin,

    // Domain-cap replay: k smallest id hashes per source via row_number —
    // the survivor set (not ranks) is the contract; integer hashes.
    "q_source_cap" ->
      """WITH h AS (SELECT doc_id, source,
        |    (doc_id * 2654435761) % 4294967296 AS hv
        |  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
        |r AS (SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn FROM h)
        |SELECT doc_id, source FROM r WHERE rn <= 60
        |ORDER BY source, doc_id""".stripMargin,

    // Epoch-shuffle replay: positions are row_number - 1 over the same
    // per-epoch hash — epoch 3's multiplier is (2654435761·7) mod 2^32 =
    // 1401181143, additive term 3·40503 — id tiebreak; integers.
    "q_epoch_shuffle" ->
      """SELECT doc_id,
        |  row_number() OVER (ORDER BY (doc_id * 1401181143 + 121509) % 4294967296, doc_id)
        |    - 1 AS epoch_pos
        |FROM documents WHERE doc_id IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // Personalized PageRank, 3 unrolled iterations: q_pagerank's integer
    // arithmetic with restart + dangling mass confined to seeds {0,1,2}
    // (S div 3 initial mass on seeds, base and dang//3 added to seeds
    // only). Non-negative longs -> floor == truncate -> bit-exact.
    "q_ppr" ->
      """WITH e AS (
        |  SELECT user_id % 150 AS src, event_id % 150 AS dst FROM events
        |  WHERE event_type = 'purchase'),
        |seeds AS (SELECT CAST(s.node AS BIGINT) AS node FROM (VALUES (0), (1), (2)) s(node)),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e UNION ALL SELECT node FROM seeds)),
        |ns AS (SELECT n.node, (s.node IS NOT NULL) AS is_seed
        |  FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
        |od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, CASE WHEN is_seed THEN 1000000000000 // 3 ELSE 0 END AS rank FROM ns),
        |d0 AS (SELECT coalesce(sum(r.rank), 0) AS dang FROM r0 r LEFT JOIN od ON r.node = od.src WHERE od.deg IS NULL),
        |i0 AS (SELECT e.dst, sum(r.rank // od.deg) AS fl FROM e JOIN r0 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |r1 AS (SELECT ns.node, CAST(
        |    CASE WHEN ns.is_seed THEN ((1000000000000 // 3) * 150) // 1000 ELSE 0 END +
        |    (850 * (coalesce(fl, 0) + CASE WHEN ns.is_seed THEN dang // 3 ELSE 0 END)) // 1000
        |  AS BIGINT) AS rank
        |  FROM ns CROSS JOIN d0 LEFT JOIN i0 ON ns.node = i0.dst),
        |d1 AS (SELECT coalesce(sum(r.rank), 0) AS dang FROM r1 r LEFT JOIN od ON r.node = od.src WHERE od.deg IS NULL),
        |i1 AS (SELECT e.dst, sum(r.rank // od.deg) AS fl FROM e JOIN r1 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |r2 AS (SELECT ns.node, CAST(
        |    CASE WHEN ns.is_seed THEN ((1000000000000 // 3) * 150) // 1000 ELSE 0 END +
        |    (850 * (coalesce(fl, 0) + CASE WHEN ns.is_seed THEN dang // 3 ELSE 0 END)) // 1000
        |  AS BIGINT) AS rank
        |  FROM ns CROSS JOIN d1 LEFT JOIN i1 ON ns.node = i1.dst),
        |d2 AS (SELECT coalesce(sum(r.rank), 0) AS dang FROM r2 r LEFT JOIN od ON r.node = od.src WHERE od.deg IS NULL),
        |i2 AS (SELECT e.dst, sum(r.rank // od.deg) AS fl FROM e JOIN r2 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst),
        |r3 AS (SELECT ns.node, CAST(
        |    CASE WHEN ns.is_seed THEN ((1000000000000 // 3) * 150) // 1000 ELSE 0 END +
        |    (850 * (coalesce(fl, 0) + CASE WHEN ns.is_seed THEN dang // 3 ELSE 0 END)) // 1000
        |  AS BIGINT) AS rank
        |  FROM ns CROSS JOIN d2 LEFT JOIN i2 ON ns.node = i2.dst)
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,

    // Quantile-normalization replay: the same rank-permille window
    // formula, single-row groups -> 0 — integer arithmetic.
    "q_quantile_norm" ->
      """SELECT doc_id, source, n_chars,
        |  CAST(CASE WHEN count(*) OVER (PARTITION BY source) = 1 THEN 0
        |    ELSE (1000 * (row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1))
        |         // (count(*) OVER (PARTITION BY source) - 1) END AS BIGINT) AS q_permille
        |FROM documents WHERE n_chars IS NOT NULL
        |ORDER BY doc_id""".stripMargin,

    // Label propagation, 3 unrolled synchronous rounds: plurality vote
    // with min-label tie-break = row_number over (count DESC, label) —
    // integer comparisons only, bit-exact.
    "q_label_prop" ->
      """WITH raw AS (SELECT user_id % 120 AS a, event_id % 120 AS b FROM events
        |  WHERE event_type = 'purchase'),
        |e0 AS (SELECT DISTINCT a AS u, b AS v FROM raw WHERE a <> b),
        |sym AS (SELECT u, v FROM e0 UNION SELECT v AS u, u AS v FROM e0),
        |lab0 AS (SELECT DISTINCT u AS node, u AS label FROM sym),
        |v1 AS (SELECT s.v AS node, l.label, count(*) AS c FROM sym s
        |  JOIN lab0 l ON s.u = l.node GROUP BY 1, 2),
        |lab1 AS (SELECT node, label FROM (SELECT node, label,
        |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn FROM v1) WHERE rn = 1),
        |v2 AS (SELECT s.v AS node, l.label, count(*) AS c FROM sym s
        |  JOIN lab1 l ON s.u = l.node GROUP BY 1, 2),
        |lab2 AS (SELECT node, label FROM (SELECT node, label,
        |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn FROM v2) WHERE rn = 1),
        |v3 AS (SELECT s.v AS node, l.label, count(*) AS c FROM sym s
        |  JOIN lab2 l ON s.u = l.node GROUP BY 1, 2),
        |lab3 AS (SELECT node, label FROM (SELECT node, label,
        |  row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn FROM v3) WHERE rn = 1)
        |SELECT node, label FROM lab3 ORDER BY node""".stripMargin,

    // Random-walk replay: the same neighbor-sorted adjacency index
    // (row_number - 1), out-degree table, and per-step index arithmetic
    // (walk*1000003 + node*40503 + step*9973) mod deg — all operands
    // non-negative integers, so Spark's pmod and DuckDB's % agree.
    "q_random_walks" ->
      """WITH raw AS (SELECT user_id % 150 AS a, event_id % 150 AS b FROM events
        |  WHERE event_type = 'view'),
        |e AS (SELECT DISTINCT a AS u, b AS v FROM raw WHERE a <> b),
        |adj AS (SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) - 1 AS idx FROM e),
        |deg AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
        |w0 AS (SELECT DISTINCT u AS walk_id, CAST(0 AS BIGINT) AS step, u AS node FROM e WHERE u < 30),
        |s1 AS (SELECT w.walk_id, CAST(1 AS BIGINT) AS step, a.v AS node
        |  FROM w0 w JOIN deg d ON w.node = d.u
        |  JOIN adj a ON a.u = w.node AND a.idx = (w.walk_id * 1000003 + w.node * 40503 + 9973) % d.deg),
        |s2 AS (SELECT w.walk_id, CAST(2 AS BIGINT) AS step, a.v AS node
        |  FROM s1 w JOIN deg d ON w.node = d.u
        |  JOIN adj a ON a.u = w.node AND a.idx = (w.walk_id * 1000003 + w.node * 40503 + 19946) % d.deg),
        |s3 AS (SELECT w.walk_id, CAST(3 AS BIGINT) AS step, a.v AS node
        |  FROM s2 w JOIN deg d ON w.node = d.u
        |  JOIN adj a ON a.u = w.node AND a.idx = (w.walk_id * 1000003 + w.node * 40503 + 29919) % d.deg),
        |s4 AS (SELECT w.walk_id, CAST(4 AS BIGINT) AS step, a.v AS node
        |  FROM s3 w JOIN deg d ON w.node = d.u
        |  JOIN adj a ON a.u = w.node AND a.idx = (w.walk_id * 1000003 + w.node * 40503 + 39892) % d.deg)
        |SELECT walk_id, step, node FROM (
        |  SELECT * FROM w0 UNION ALL SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |  UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
        |ORDER BY walk_id, step""".stripMargin,

    // KMV source-overlap replay: the k-smallest-distinct-hash sketch per
    // source IS the algorithm (row_number over the md5-derived integer
    // hash), the merged sketch is the k smallest of the deduped union,
    // and every output is an integer — bit-exact. The token hash parses
    // the first 15 md5 hex digits (60 bits) into a BIGINT on both sides.
    "q_source_overlap" ->
      """WITH tok AS (
        |  SELECT DISTINCT source AS label,
        |    CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) AS hv
        |  FROM documents, LATERAL unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> len(x) > 0)) AS u(t)
        |  WHERE text IS NOT NULL AND source IS NOT NULL),
        |sk AS (SELECT label, hv FROM (
        |    SELECT label, hv, row_number() OVER (PARTITION BY label ORDER BY hv) AS rn FROM tok)
        |  WHERE rn <= 128),
        |p AS (SELECT a.label AS la, b.label AS lb FROM (SELECT DISTINCT label FROM sk) a
        |  JOIN (SELECT DISTINCT label FROM sk) b ON a.label < b.label),
        |uni AS (SELECT p.la, p.lb, s.hv FROM p JOIN sk s ON s.label = p.la
        |  UNION SELECT p.la, p.lb, s.hv FROM p JOIN sk s ON s.label = p.lb),
        |m AS (SELECT la, lb, hv FROM (
        |    SELECT la, lb, hv, row_number() OVER (PARTITION BY la, lb ORDER BY hv) AS rn FROM uni)
        |  WHERE rn <= 128),
        |msz AS (SELECT la, lb, count(*) AS sketch_union FROM m GROUP BY 1, 2),
        |cmn AS (SELECT m.la, m.lb, count(*) AS n_common FROM m
        |  JOIN sk x ON x.label = m.la AND x.hv = m.hv
        |  JOIN sk y ON y.label = m.lb AND y.hv = m.hv GROUP BY 1, 2)
        |SELECT msz.la AS label_a, msz.lb AS label_b, msz.sketch_union,
        |  coalesce(cmn.n_common, 0) AS n_common,
        |  (1000 * coalesce(cmn.n_common, 0)) // msz.sketch_union AS jacc_permille
        |FROM msz LEFT JOIN cmn ON msz.la = cmn.la AND msz.lb = cmn.lb
        |ORDER BY label_a, label_b""".stripMargin,

    // Hard negatives: q_ann_brute_force's replay with the label
    // inequality instead of the self-exclusion — double-precision dot
    // products are bit-identical cross-engine; ids only.
    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT query_id, neighbor_id FROM (
        |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |    row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |      list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) DESC,
        |      b.vec_id) AS rn
        |  FROM e a JOIN e b ON b.label <> a.label WHERE a.vec_id < 40) t
        |WHERE rn <= 5 ORDER BY query_id, neighbor_id""".stripMargin,

    // Data-quality report replay: each rule's (violations, checked) pair
    // recomputed directly. Rule-name strings must match graft.ext.Quality's
    // exactly — they ARE the join key of the report.
    "q_dq_checks" ->
      """SELECT 'not_null(l_orderkey)' AS rule,
        |  count(*) FILTER (WHERE l_orderkey IS NULL) AS violations,
        |  count(*) AS checked FROM lineitem
        |UNION ALL
        |SELECT 'in_range(l_quantity,1.0,25.0)',
        |  count(*) FILTER (WHERE NOT (CAST(l_quantity AS DOUBLE) >= 1.0
        |    AND CAST(l_quantity AS DOUBLE) <= 25.0)),
        |  count(*) FILTER (WHERE l_quantity IS NOT NULL) FROM lineitem
        |UNION ALL
        |SELECT 'in_set(l_returnflag,A|N)',
        |  count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N')),
        |  count(*) FILTER (WHERE l_returnflag IS NOT NULL) FROM lineitem
        |UNION ALL
        |SELECT 'matches(l_linestatus,^[OF]$)',
        |  count(*) FILTER (WHERE NOT regexp_matches(l_linestatus, '^[OF]$')),
        |  count(*) FILTER (WHERE l_linestatus IS NOT NULL) FROM lineitem
        |UNION ALL
        |SELECT 'predicate(discount_le_5pct)',
        |  count(*) FILTER (WHERE NOT coalesce(l_discount <= 0.05, false)),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'unique(l_orderkey,l_linenumber)',
        |  count(*) - (SELECT count(*) FROM
        |    (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem) d),
        |  count(*) FROM lineitem
        |UNION ALL
        |SELECT 'foreign_key(l_orderkey->o_orderkey)',
        |  count(*) FILTER (WHERE o_orderkey IS NULL),
        |  count(*)
        |FROM (SELECT l.l_orderkey, o.o_orderkey FROM lineitem l
        |  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey
        |  WHERE l.l_orderkey IS NOT NULL) j
        |ORDER BY rule""".stripMargin,

    // Winsorized summary replay: counting-quantile thresholds (the
    // q_counting_quantiles CTE), least/greatest clip, integer clip
    // counts and clipped sum — bit-exact.
    "q_winsorize" ->
      """WITH v AS (SELECT event_type AS g, CAST(floor(value * 1000) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |cm AS (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2),
        |cw AS (SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum,
        |         sum(c) OVER (PARTITION BY g) AS n FROM cm),
        |th AS (SELECT g,
        |    min(CASE WHEN 1000 * cum >= 50 * n THEN x END) AS lo,
        |    min(CASE WHEN 1000 * cum >= 950 * n THEN x END) AS hi
        |  FROM cw GROUP BY g)
        |SELECT v.g AS event_type, max(th.lo) AS lo, max(th.hi) AS hi, count(*) AS n,
        |  CAST(sum(CASE WHEN v.x < th.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN v.x > th.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(sum(least(greatest(v.x, th.lo), th.hi)) AS BIGINT) AS sum_w
        |FROM v JOIN th ON v.g = th.g GROUP BY v.g ORDER BY event_type""".stripMargin,

    // Retention-cohort replay: weekly integer epoch buckets, per-user
    // min period, distinct (user, period) activity, cohort-offset grid.
    "q_retention_cohorts" ->
      """WITH a AS (SELECT DISTINCT user_id AS u,
        |    CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS p
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |c AS (SELECT u, min(p) AS cohort FROM a GROUP BY u)
        |SELECT c.cohort AS cohort_period, a.p - c.cohort AS period_offset,
        |  count(DISTINCT a.u) AS n_users
        |FROM a JOIN c ON a.u = c.u
        |GROUP BY 1, 2 ORDER BY cohort_period, period_offset""".stripMargin,

    // Trimmed-summary replay: q_winsorize's thresholds with the tails
    // EXCLUDED from the aggregate instead of clipped into it.
    "q_trimmed_summary" ->
      """WITH v AS (SELECT event_type AS g, CAST(floor(value * 1000) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |cm AS (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2),
        |cw AS (SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum,
        |         sum(c) OVER (PARTITION BY g) AS n FROM cm),
        |th AS (SELECT g,
        |    min(CASE WHEN 1000 * cum >= 50 * n THEN x END) AS lo,
        |    min(CASE WHEN 1000 * cum >= 950 * n THEN x END) AS hi
        |  FROM cw GROUP BY g)
        |SELECT v.g AS event_type, count(*) AS n_total,
        |  CAST(sum(CASE WHEN v.x >= th.lo AND v.x <= th.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN v.x >= th.lo AND v.x <= th.hi THEN v.x ELSE 0 END) AS BIGINT) AS kept_sum,
        |  max(th.lo) AS lo, max(th.hi) AS hi
        |FROM v JOIN th ON v.g = th.g GROUP BY v.g ORDER BY event_type""".stripMargin,

    // Sorted-neighborhood replay: same sanitized key, row_number rank,
    // rank-difference window, levenshtein threshold — all integer/string
    // ops both engines evaluate identically.
    "q_sorted_neighborhood" ->
      """WITH k AS (SELECT doc_id, text,
        |    substring(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), 1, 16) AS key
        |  FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id, text, row_number() OVER (ORDER BY key, doc_id) AS rn FROM k)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  levenshtein(a.text, b.text) AS dist
        |FROM r a JOIN r b ON b.rn > a.rn AND b.rn - a.rn < 10
        |WHERE levenshtein(a.text, b.text) <= 5
        |ORDER BY 1, 2""".stripMargin,

    // Counting-quantile replay: identical counts CTE + "1000*cum >= q*n"
    // rank predicate per quantile — integer-exact.
    "q_counting_quantiles" ->
      """WITH v AS (SELECT event_type AS g, CAST(floor(value * 1000) AS BIGINT) AS x
        |  FROM events WHERE value IS NOT NULL),
        |cm AS (SELECT g, x, count(*) AS c FROM v GROUP BY 1, 2),
        |cw AS (SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x) AS cum,
        |         sum(c) OVER (PARTITION BY g) AS n FROM cm)
        |SELECT g AS event_type, q_permille, min(x) AS value
        |FROM cw CROSS JOIN (VALUES (500), (900), (990)) q(q_permille)
        |WHERE 1000 * cum >= q_permille * n
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // HyperLogLog p=12 register replay: multiplicative 32-bit hash, top 12
    // bits -> bucket, rank = 21 - bitlen(low 20 bits) via the binary-string
    // length (bin() emits no leading zeros in either engine; no float
    // log2). Register max is associative & duplicate-idempotent, so the
    // sketch STATE is bit-exact across engines.
    "q_hll_registers" ->
      """WITH h AS (
        |  SELECT (o_orderkey * 2654435761) % 4294967296 AS h32 FROM orders
        |  WHERE o_orderkey IS NOT NULL),
        |r AS (SELECT h32 // 1048576 AS bucket, h32 % 1048576 AS w FROM h)
        |SELECT bucket,
        |  max(CAST(CASE WHEN w = 0 THEN 21 ELSE 21 - length(ltrim(bin(w), '0')) END AS BIGINT)) AS max_rank
        |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    // REAL video decode gate: the Spark side plants one MJPEG AVI per doc
    // and must demux the RIFF container (frame count = counted movi
    // chunks, fps = strh rate/scale) and JPEG-decode every second frame
    // for its dims; the oracle restates the planted arithmetic with a
    // lateral unnest(range(...)) per doc.
    "q_video_frames" ->
      """WITH d AS (SELECT doc_id, (3 + doc_id % 6) AS n_frames FROM documents),
        |f AS (SELECT doc_id, n_frames, unnest(range(0, n_frames, 2)) AS i FROM d)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_index,
        |  CAST(16 + doc_id % 48 AS BIGINT) AS width,
        |  CAST(16 + (doc_id // 5) % 48 AS BIGINT) AS height,
        |  CAST(10 + doc_id % 20 AS BIGINT) AS fps,
        |  CAST(n_frames AS BIGINT) AS n_frames
        |FROM f ORDER BY doc_id, frame_index""".stripMargin,

    // Byte-offset sampling is pure arithmetic over the payload length
    // (every 64th byte offset), so the mapPartitions flatMap gets a
    // full oracle: generate_series over octet_length.
    "q_frame_sample" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS blen FROM documents),
        |f AS (SELECT doc_id, unnest(range(0, blen, 64)) AS off FROM d)
        |SELECT doc_id, CAST(off // 64 AS BIGINT) AS frame_index, CAST(off AS BIGINT) AS frame_offset
        |FROM f ORDER BY doc_id, frame_index""".stripMargin,

    // LSH scale-path embedding near-dup: oracle = the exact cosine >= 0.999
    // pair set over the full planted corpus; exact duplicates always share
    // a sign bucket, so the bucketed join must recover it all.
    "q_embedding_near_dup_lsh" ->
      """WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |corpus AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id + 1000000 AS vec_id, v FROM base)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM corpus a, corpus b
        |WHERE a.vec_id < b.vec_id
        |  AND list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.999
        |ORDER BY id_a, id_b""".stripMargin,

    // Rational-idf tf-idf: tf * (N/df) — no transcendentals, so scores are
    // bit-identical cross-engine; ties break on term ascending.
    "q_text_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, term,
        |    CAST(tf AS DOUBLE) * (CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST(df AS DOUBLE)) AS score
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, score, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT doc_id, term, score, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        |  FROM scored) t
        |WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin,

    // Word 8-gram shingles with the short-text rule (texts under 8 tokens
    // contribute their whole token string), then document frequency >= 2.
    // N-gram novelty replay: same trigram comprehension (distinct per
    // doc, whole-text fallback under 3 tokens), df table, integer
    // permille — over the corpus + its planted copies.
    "q_ngram_novelty" ->
      """WITH d AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id < 50),
        |toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM d WHERE text IS NOT NULL),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)])
        |    END AS s
        |  FROM toks),
        |x AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE len(s) > 0),
        |dfreq AS (SELECT g, count(*) AS dfc FROM x GROUP BY g)
        |SELECT x.doc_id, count(*) AS n_distinct_grams,
        |  CAST(sum(CASE WHEN dfreq.dfc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  (1000 * CAST(sum(CASE WHEN dfreq.dfc = 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*)
        |    AS novelty_permille
        |FROM x JOIN dfreq ON x.g = dfreq.g
        |GROUP BY x.doc_id ORDER BY x.doc_id""".stripMargin,

    "q_boilerplate_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE
        |      WHEN len(tk) = 0 THEN CAST([] AS VARCHAR[])
        |      WHEN len(tk) < 8 THEN [array_to_string(tk, ' ')]
        |      ELSE list_distinct([array_to_string(tk[i:i+7], ' ') for i in range(1, len(tk) - 6)])
        |    END AS s
        |  FROM toks),
        |x AS (SELECT doc_id, unnest(s) AS shingle FROM sh)
        |SELECT shingle, COUNT(DISTINCT doc_id) AS n_docs
        |FROM x GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
        |ORDER BY n_docs DESC, shingle""".stripMargin,

    // Same RE2-compatible replacement chain as TextAnalysis.redactPii
    // (email → URL → phone), over text with planted PII.
    "q_text_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        text || ' contact: user' || doc_id || '@example.com or https://ex.example/p/' || doc_id || ' tel 555-010-1234',
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      'https?://[^\s]+', '<URL>', 'g'),
        |    '\b\d{3}[-. ]\d{3,4}[-. ]\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Multiplicative-hash per-mille split: (id * 2654435761) mod 1000.
    "q_dataset_split" ->
      """SELECT doc_id,
        |  CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
        |       WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Extended window functions: lag/lead/ntile/percent_rank/cume_dist.
    // Rank ratios are exact integer divisions — engine-stable doubles.
    "q_window_funcs" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  lag(o_totalprice) OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // BM25 with rational idf (N-df+0.5)/(df+0.5) — mirrors bm25Score's
    // exact IEEE expression tree: exact-integer avgdl (Σ token counts /
    // doc count, one division), identical operator nesting, and the
    // per-doc sum as a FIXED-ORDER pivot chain over the term-sorted
    // query set (dup, merge, vector, window) — adding a coalesced 0.0
    // for a missing term is bit-neutral (x + 0.0 = x for x > 0), so the
    // chain equals the operator's term-sorted left fold.
    "q_bm25" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |stats AS (
        |  SELECT CAST((SELECT count(*) FROM documents) AS DOUBLE) AS n,
        |    CAST((SELECT sum(len(tk)) FROM tk WHERE tk IS NOT NULL) AS DOUBLE) /
        |      CAST((SELECT count(tk) FROM tk) AS DOUBLE) AS avgdl),
        |toks AS (
        |  SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl, unnest(tk) AS term FROM tk),
        |tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
        |  FROM toks WHERE term IN ('dup', 'merge', 'vector', 'window')
        |  GROUP BY doc_id, term),
        |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |per_term AS (
        |  SELECT doc_id, term,
        |    ((n - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1.0)) /
        |      (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl)) AS score
        |  FROM tf JOIN dft USING (term) CROSS JOIN stats)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |  coalesce(max(CASE WHEN term = 'dup' THEN score END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'merge' THEN score END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'vector' THEN score END), 0.0)
        |    + coalesce(max(CASE WHEN term = 'window' THEN score END), 0.0) AS bm25
        |FROM per_term GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Token commonness: Σ document-frequency over each doc's distinct
    // tokens; integer-exact with one final double division. Corpus size
    // comes from a subquery, so the same SQL is valid at any SF.
    "q_token_rarity" ->
      """WITH pairs AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok
        |  FROM documents),
        |dft AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY tok),
        |per_doc AS (
        |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_distinct_tokens,
        |    CAST(sum(df) AS BIGINT) AS df_sum
        |  FROM pairs p JOIN dft USING (tok) GROUP BY p.doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_distinct_tokens, 0) AS n_distinct_tokens,
        |  coalesce(df_sum, 0) AS df_sum,
        |  CASE WHEN coalesce(n_distinct_tokens, 0) = 0 THEN 0.0
        |       ELSE CAST(df_sum AS DOUBLE) /
        |            CAST(n_distinct_tokens * (SELECT count(*) FROM documents) AS DOUBLE)
        |  END AS commonness
        |FROM documents d LEFT JOIN per_doc USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Log2-bucketed token-count histogram per language. Bucket boundaries
    // are powers of two where log2 is IEEE-exact, so floor is stable.
    "q_token_histogram" ->
      """WITH c AS (
        |  SELECT lang,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents)
        |SELECT lang AS label,
        |  CAST(floor(log2(CAST(n_tokens AS DOUBLE) + 1.0)) AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(n_tokens) AS BIGINT) AS min_v,
        |  CAST(max(n_tokens) AS BIGINT) AS max_v,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_v
        |FROM c GROUP BY lang, bucket
        |ORDER BY label, bucket""".stripMargin,

    // Approximate distinct: the exact count is oracle-checked; the HLL++
    // estimate is engine-specific, so its ≤5% relative-error contract is
    // the gated value (literal true — any blowout fails the hash compare).
    "q_approx_distinct" ->
      """WITH pairs AS (
        |  SELECT DISTINCT lang,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_exact, true AS approx_within_bound
        |FROM pairs GROUP BY lang ORDER BY lang""".stripMargin,

    // Fixed-size per-group sample: the 20 smallest multiplicative hashes
    // per language (id tiebreak; the hash is injective so ties can't occur).
    "q_fixed_sample" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin,

    // Token frequency head: exact counts + deterministic rank, top 100.
    "q_token_freq" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok
        |  FROM documents),
        |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY tok),
        |r AS (SELECT tok, n, CAST(row_number() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rank FROM c)
        |SELECT tok, n, rank FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,

    // Full outer join: unmatched rows on either side surface with NULLs /
    // zero counts.
    "q_full_outer_join" ->
      """WITH o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey)
        |SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
        |  coalesce(o.n_orders, 0) AS n_orders
        |FROM customer c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,

    // Inverted index with a 50-posting skew cap: true df from a full
    // count, postings = first 50 doc ids per token, CSV-serialized.
    "q_inverted_index" ->
      """WITH pairs AS (
        |  SELECT DISTINCT doc_id,
        |    unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> len(t) > 0)) AS tok
        |  FROM documents),
        |r AS (
        |  SELECT tok, doc_id,
        |    CAST(count(*) OVER (PARTITION BY tok) AS BIGINT) AS df,
        |    row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
        |  FROM pairs)
        |SELECT tok, max(df) AS df,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings_csv
        |FROM r WHERE rn <= 50 GROUP BY tok ORDER BY tok""".stripMargin,

    // Diacritic/whitespace normalization with planted accents on every row
    // — explicit fold table, no locale-dependent library call.
    "q_text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    translate(lower(text || '  Résumé  Çédille  ÀÉÎÕÜ niño façade'),
        |      'áàâäãåéèêëíìîïóòôöõúùûüçñýÿ', 'aaaaaaeeeeiiiiooooouuuucnyy'),
        |    '\s+', ' ', 'g')) AS norm_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Sequence packing: the distributed two-pass prefix sum must equal a
    // plain ordered window cumsum (exclusive), and pack_id its integer
    // division by the 2048-token budget. Pure integer arithmetic — exact.
    "q_doc_pack" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT) AS token_offset
        |  FROM c)
        |SELECT doc_id, n_tokens, token_offset,
        |  token_offset // 2048 AS pack_id
        |FROM s ORDER BY doc_id""".stripMargin,

    // Pack materialization: per-pack doc concat in id order + token totals.
    "q_pack_concat" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |    CAST(CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, text, n_tokens,
        |    (CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS BIGINT)) // 2048 AS pack_id
        |  FROM c)
        |SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |  string_agg(text, chr(10) ORDER BY doc_id) AS pack_text
        |FROM s GROUP BY pack_id ORDER BY pack_id""".stripMargin,

    // Cross-document line dedup with two PLANTED boilerplate lines per doc:
    // first occurrence (min of doc_id·2^20 + pos) survives, later copies
    // and blank lines are removed, docs reassemble in line order.
    "q_line_dedup" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    text || chr(10) || 'subscribe to our newsletter today'
        |         || chr(10) || 'all rights reserved example corp' AS text
        |  FROM documents),
        |l0 AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
        |lines AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, len(ls))) - 1 AS pos,
        |    unnest(ls) AS line
        |  FROM l0),
        |nz AS (
        |  SELECT doc_id, pos, line
        |  FROM lines WHERE len(trim(line)) > 0),
        |firsts AS (SELECT line, min(struct_pack(i := doc_id, p := pos)) AS f FROM nz GROUP BY line),
        |kept AS (
        |  SELECT n.doc_id, n.pos, n.line
        |  FROM nz n JOIN firsts f ON n.line = f.line AND n.doc_id = f.f.i AND n.pos = f.f.p),
        |agg AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
        |    CAST(count(*) AS BIGINT) AS kept_lines
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(a.clean_text, '') AS clean_text,
        |  coalesce(a.kept_lines, 0) AS kept_lines
        |FROM d LEFT JOIN agg a USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // Weighted corpus mixing: src0 2.3× (2 copies + hash-gated 3rd),
    // src1 0.4× (hash-gated single copy), default 1× — same multiplicative
    // hash as q_dataset_split, copies replayed via generate_series.
    "q_corpus_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source = 'src0'
        |           THEN 2 + CASE WHEN (doc_id * 2654435789) % 1000 < 300 THEN 1 ELSE 0 END
        |         WHEN source = 'src1'
        |           THEN CASE WHEN (doc_id * 2654435789) % 1000 < 400 THEN 1 ELSE 0 END
        |         ELSE 1 END AS n_copies
        |  FROM documents)
        |SELECT * FROM (
        |  SELECT doc_id, source,
        |    CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS copy_idx
        |  FROM d WHERE n_copies > 0)
        |ORDER BY doc_id, copy_idx""".stripMargin,

    // End-to-end corpus curation: quality ≥ 0.72 → fingerprint-dedup
    // winner → split assignment → per-(split, lang) counts. Composes the
    // q_text_quality, q_dedup_exact and q_dataset_split oracle fragments.
    "q_corpus_curation" ->
      """WITH q AS (
        |  SELECT doc_id, lang, text,
        |    (least(CAST(CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS DOUBLE) / 50.0, 1.0)
        |     + (1.0 - least(CASE WHEN len(text) = 0 THEN 0.0 ELSE CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE) END * 5.0, 1.0))
        |     + least(CASE WHEN len(trim(text)) = 0 THEN 0.0 ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |         x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','this','by','at','be','are'], x))) AS DOUBLE)
        |         / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) END * 4.0, 1.0)) / 3.0 AS score
        |  FROM documents),
        |kept AS (SELECT doc_id, lang, text FROM q WHERE score >= 0.72),
        |dedup AS (
        |  SELECT doc_id, lang FROM (
        |    SELECT doc_id, lang,
        |      row_number() OVER (
        |        PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
        |        ORDER BY doc_id) AS rn
        |    FROM kept) t WHERE rn = 1),
        |assigned AS (
        |  SELECT lang,
        |    CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
        |         WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM dedup)
        |SELECT split, lang, COUNT(*) AS n_docs
        |FROM assigned GROUP BY split, lang ORDER BY split, lang""".stripMargin,

    // Stratified rebalancing: per-label keep rates over the same
    // multiplicative hash (en 30%, fr 50%, everything else kept whole).
    "q_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id * 2654435761) % 1000 <
        |  CASE WHEN lang = 'en' THEN 300 WHEN lang = 'fr' THEN 500 ELSE 1000 END
        |ORDER BY doc_id""".stripMargin,

    "q_text_tokens" ->
      """SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """SELECT doc_id, punct_ratio, stopword_ratio,
        |  (least(CAST(ws_tokens AS DOUBLE) / 50.0, 1.0)
        |   + (1.0 - least(punct_ratio * 5.0, 1.0))
        |   + least(stopword_ratio * 4.0, 1.0)) / 3.0 AS quality_score
        |FROM (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END AS ws_tokens,
        |    CASE WHEN len(text) = 0 THEN 0.0
        |      ELSE CAST(len(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS DOUBLE) / CAST(len(text) AS DOUBLE) END AS punct_ratio,
        |    CASE WHEN len(trim(text)) = 0 THEN 0.0
        |      ELSE CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','this','by','at','be','are'], x))) AS DOUBLE)
        |        / CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS DOUBLE) END AS stopword_ratio
        |  FROM documents) t
        |ORDER BY doc_id""".stripMargin,

    "q_text_fingerprint" ->
      """SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_pivot_event_counts" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    // REAL ImageIO decode gate: the oracle states the PLANTED dims
    // arithmetic (Queries.plantedImageDims); the Spark side must recover
    // the same numbers by parsing the planted PNG bytes (grayscale color
    // type -> 1 channel, truecolor -> 3).
    "q_image_features" ->
      """SELECT doc_id,
        |  CAST(16 + doc_id % 120 AS BIGINT) AS width,
        |  CAST(16 + (doc_id // 7) % 120 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 3 END AS BIGINT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Fit-within resize arithmetic replay: scale = min(1, 64/w, 64/h),
    // out dim = max(1, floor(dim*scale)) — same IEEE double op order as
    // ImageCodec.resizeImage; the Spark side RE-DECODES the resized PNG to
    // report dims.
    "q_multimodal_resize" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(16 + doc_id % 120 AS DOUBLE) AS w,
        |    CAST(16 + (doc_id // 7) % 120 AS DOUBLE) AS h
        |  FROM documents),
        |s AS (SELECT doc_id, w, h, least(1.0, least(64.0 / w, 64.0 / h)) AS sc FROM d)
        |SELECT doc_id,
        |  CAST(greatest(1.0, floor(w * sc)) AS BIGINT) AS width,
        |  CAST(greatest(1.0, floor(h * sc)) AS BIGINT) AS height
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_length, md5(text) AS content_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    // REAL javax.sound WAV decode gate: planted PCM format arithmetic
    // (Queries.qAudioFeatures) restated; duration is integer ms both sides.
    "q_audio_features" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |    CAST(200 + doc_id % 600 AS BIGINT) AS n_frames
        |  FROM documents)
        |SELECT doc_id, sample_rate, channels, n_frames,
        |  CAST(n_frames * 1000 // sample_rate AS BIGINT) AS duration_ms
        |FROM d ORDER BY doc_id""".stripMargin
  )
}
