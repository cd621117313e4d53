package graft

import graft.ext.{Dedup, TextAnalysis}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Differential pinning of the hash-sketch pipeline. The sketches that are
  * too engine-specific for a DuckDB oracle (MinHash signatures, SimHash,
  * rolling hash — all xxhash-based) are re-derived here independently: the
  * same XXH64 primitive, but plain Scala collection folds instead of the
  * Catalyst expressions ([[graft.sql.MinHashSig]], [[graft.sql.SimHash64]])
  * or higher-order-function trees, over fixed inputs covering the edge
  * cases (empty text, short text, duplicate tokens, unicode). Exact
  * equality pins the whole hash pipeline — this is the correctness evidence
  * behind the rows-only gate queries q_minhash_lsh / q_simhash /
  * q_text_rolling_hash.
  */
class SketchPinningSpec extends SparkSpec {
  import spark.implicits._

  private val Fixtures = Seq(
    1L -> "The quick brown fox jumps over the lazy dog",
    2L -> "the the the repeated token stream the the",
    3L -> "short",
    4L -> "two tokens",
    5L -> "",
    6L -> "   ",
    7L -> "Ünïcode tëxt with àccents and 中文 characters mixed in",
    8L -> "a b c d e f g h i j k l m n o p")

  private def df = Fixtures.toDF("doc_id", "text")

  // ------------------------------------------- independent re-derivations

  private val P31 = 2147483647L

  private def xx(s: String): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  private def tokens(text: String): Seq[String] =
    text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq

  private def shinglesRef(text: String, n: Int): Seq[String] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    if (toks.isEmpty) Seq.empty
    else if (toks.length < n) Seq(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  private def minhashRef(text: String, numHashes: Int, seed: Long): Seq[Long] = {
    val rnd = new scala.util.Random(seed)
    val as = Array.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val bs = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    val hs = shinglesRef(text, 3).map(s => java.lang.Math.floorMod(xx(s), P31))
    (0 until numHashes).map { j =>
      if (hs.isEmpty) P31 else hs.map(h => (h * as(j) + bs(j)) % P31).min
    }
  }

  private def simhashRef(text: String): Long = {
    val sums = new Array[Int](64)
    tokens(text).distinct.foreach { t =>
      val h = xx(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
        j += 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, j) => if (sums(j) > 0) acc | (1L << j) else acc)
  }

  private def rollingRef(text: String): Long = {
    val p = 1000000007L
    tokens(text).foldLeft(0L) { (acc, t) =>
      java.lang.Math.floorMod(acc * 31L + java.lang.Math.floorMod(xx(t), p), p)
    }
  }

  // ------------------------------------------------------------- the pins

  test("word_shingles matches the independent shingle derivation exactly") {
    graft.sql.GraftExtensions.ensureRegistered(spark)
    val got = df.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    Fixtures.foreach { case (id, text) =>
      assert(got(id) == shinglesRef(text, 3), s"doc $id shingles diverge")
    }
  }

  test("minhash_sig matches the independent MinHash derivation exactly") {
    val got = Dedup.minHashSignatures(df, numHashes = 128)
      .as[(Long, Seq[Long])].collect().toMap
    Fixtures.foreach { case (id, text) =>
      assert(got(id) == minhashRef(text, 128, 42L), s"doc $id signature diverges")
    }
  }

  test("simhash64 matches the independent SimHash derivation exactly") {
    val got = Dedup.simHashes(df).as[(Long, Long)].collect().toMap
    Fixtures.foreach { case (id, text) =>
      assert(got(id) == simhashRef(text), s"doc $id simhash diverges")
    }
  }

  test("rolling hash matches the independent polynomial-fold derivation exactly") {
    val got = df.select(col("doc_id"), TextAnalysis.rollingHash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    Fixtures.foreach { case (id, text) =>
      assert(got(id) == rollingRef(text), s"doc $id rolling hash diverges")
    }
  }

  test("simHashPairs hamming-tolerant mode reports exact block-join distances") {
    val near = "spark is a distributed engine for large scale data processing workloads"
    val nearB = near.replace("workloads", "pipelines")
    val corpus = Seq(
      1L -> near, 2L -> near, 3L -> nearB,
      4L -> "cats purr when they are content and sleepy in warm places").toDF("doc_id", "text")
    val out = Dedup.simHashPairs(corpus, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    // Identical texts must collide exactly.
    assert(out.get((1L, 2L)).contains(0))
    // The one-word-off pair appears iff its true hamming distance clears the
    // pigeonhole threshold, and the reported distance must be the true one.
    val refHam = java.lang.Long.bitCount(simhashRef(near) ^ simhashRef(nearB))
    if (refHam <= 3) assert(out.get((1L, 3L)).contains(refHam))
    // The unrelated doc is far from everything (distance way above 3).
    assert(!out.contains((1L, 4L)) && !out.contains((2L, 4L)))
  }
}
