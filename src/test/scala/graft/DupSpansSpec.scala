package graft

import graft.ext.Dedup
import org.apache.spark.sql.functions._

/** [[graft.ext.Dedup.duplicateSpans]] — the sampled-char-gram
  * reformulation of exact-substring dedup (Lee et al. 2021). The DuckDB
  * oracle (q_dup_spans) replays the raw-text path; these pin the planted
  * geometry and that the hashed 100 TB shuffle key changes nothing.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  // 100-char distinctive passage, planted at stride-aligned offsets in two
  // docs (detection is guaranteed only at matching alignment — the
  // declared sampling semantics).
  private val passage =
    "the quick brown fox jumps over the lazy dog while reciting digits 0123456789 abcdefghijklmnopqrstuvw"
  require(passage.length == 100)

  private def planted = Seq(
    (0L, passage + ("u" * 30)),
    (1L, ("y" * 20) + passage + ("v" * 15)),
    (2L, "z" * 120)
  ).toDF("doc_id", "text")

  test("planted shared passage resolves to one maximal span per doc at exact offsets") {
    for (hashed <- Seq(false, true)) {
      val spans = Dedup.duplicateSpans(planted, gramLen = 40, stride = 10, hashGrams = hashed)
        .as[(Long, Long, Long)].collect().toSet
      // doc 0: grams at 0,10,...,60 inside the passage → island [0, 100);
      // doc 1: same passage offsets shifted by its 20-char prefix.
      assert(spans == Set((0L, 0L, 100L), (1L, 20L, 120L)),
        s"hashGrams=$hashed gave $spans")
    }
  }

  test("span invariants: length >= gramLen, per-doc spans disjoint with gaps > 0") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val spans = Dedup.duplicateSpans(docs, gramLen = 40, stride = 10)
      .as[(Long, Long, Long)].collect()
    assert(spans.nonEmpty, "test corpus has known cross-doc boilerplate; expected spans")
    assert(spans.forall { case (_, s, e) => e - s >= 40 })
    spans.groupBy(_._1).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 > e1, s"doc $doc spans overlap or touch: $sorted")
        case _ =>
      }
    }
  }

  test("hashed gram key (100 TB shuffle cut) yields spans identical to raw text") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val raw = Dedup.duplicateSpans(docs, gramLen = 40, stride = 10, hashGrams = false)
      .as[(Long, Long, Long)].collect().toSet
    val hashed = Dedup.duplicateSpans(docs, gramLen = 40, stride = 10, hashGrams = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(raw == hashed, s"raw ${raw.size} vs hashed ${hashed.size} spans differ")
  }

  test("a passage below gramLen + boundary effects is not reported from unaligned sampling") {
    // Same passage but planted at a NON-stride-aligned offset in doc 1:
    // sampled grams never line up, so the declared semantics find nothing.
    val docs = Seq(
      (0L, passage + ("u" * 30)),
      (1L, ("y" * 23) + passage + ("v" * 15))
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, gramLen = 40, stride = 10)
      .as[(Long, Long, Long)].collect()
    assert(spans.isEmpty, s"unaligned plant should be invisible to sampled grams, got ${spans.toSeq}")
  }

  test("contaminatedSpans catches an UNALIGNED eval leak (dense eval grams) at exact offsets") {
    // Unlike doc-vs-doc sampling, the eval side enumerates every offset —
    // a leak planted at a non-stride-aligned position must still be hit
    // by whichever stride-10 corpus grams fall inside it.
    val corpus = Seq(
      (0L, ("y" * 23) + passage + ("v" * 27)),  // unaligned 100-char leak
      (1L, "z" * 150)                            // clean
    ).toDF("doc_id", "text")
    val evalDocs = Seq((100L, passage)).toDF("doc_id", "text")
    val spans = Dedup.contaminatedSpans(corpus, evalDocs, gramLen = 40, stride = 10)
      .as[(Long, Long, Long)].collect()
    // Leak occupies [23, 123). Sampled corpus grams start at 0,10,...;
    // those fully inside the leak start at 30..80 (need start >= 23 and
    // start+40 <= 123) -> island [30, 120).
    assert(spans.toSeq == Seq((0L, 30L, 120L)), s"got ${spans.toSeq}")
  }

  test("contaminatedSpans: hashed eval-key path identical to raw grams; clean corpus empty") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val evalDocs = docs.where(col("doc_id") % 37 === 0)
    val raw = Dedup.contaminatedSpans(docs, evalDocs, hashGrams = false)
      .as[(Long, Long, Long)].collect().toSet
    val hashed = Dedup.contaminatedSpans(docs, evalDocs, hashGrams = true)
      .as[(Long, Long, Long)].collect().toSet
    assert(raw == hashed, s"raw ${raw.size} vs hashed ${hashed.size} spans differ")
    val clean = Dedup.contaminatedSpans(
      Seq((0L, "entirely novel text with no benchmark overlap whatsoever, padded to length " + ("q" * 60)))
        .toDF("doc_id", "text"),
      Seq((100L, passage)).toDF("doc_id", "text"))
    assert(clean.isEmpty)
  }
}
