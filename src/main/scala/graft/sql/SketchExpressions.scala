package graft.sql

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass sketch expressions for the dedup operators.
  *
  * `minhash_sig(shingles, numHashes, seed)` and `simhash64(tokens)` replace
  * the explode → groupBy formulation: that plan materializes
  * |docs| × |shingles| rows and updates `numHashes` aggregation buffers per
  * row; these expressions compute the whole sketch in one tight loop per
  * document — a pure map operation with NO shuffle, which is the correct
  * 100 TB plan (the sketch is embarrassingly row-parallel).
  *
  * Hashing uses Spark's own XXH64 (same family as the `xxhash64` SQL
  * function) with the per-permutation affine transform
  * `(a_j·h + b_j) mod (2^31−1)` from a fixed-seed PRNG — deterministic
  * across runs, sessions and cluster sizes.
  *
  * `CodegenFallback` is deliberate: the op is arithmetic-dominated inside
  * its own loop, so generated-vs-interpreted dispatch around the loop is
  * noise, and the expression sits in a dedicated projection.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 - 1

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    val a = Array.fill(numHashes)(1L + rnd.nextInt(Int.MaxValue - 1).toLong)
    val b = Array.fill(numHashes)(rnd.nextInt(Int.MaxValue).toLong)
    (a, b)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h64 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        val h = java.lang.Math.floorMod(h64, P)
        var j = 0
        while (j < numHashes) {
          val v = (h * as(j) + bs(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSig].getName, null, "minhash_sig",
    "_FUNC_(shingles, numHashes, seed) - MinHash signature of a string-array shingle set.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, s"minhash_sig expects 3 arguments, got ${args.length}")
    val n = args(1).eval().asInstanceOf[Number].intValue()
    val seed = args(2).eval().asInstanceOf[Number].longValue()
    MinHashSig(args.head, n, seed)
  }
}

/** One-permutation MinHash with rotation densification (Li/Owen/Zhang
  * NIPS'12; Shrivastava & Li ICML'14): ONE xxhash per shingle assigns the
  * element to bin `h mod k` and ranks it by `h mod p`; each bin keeps its
  * min rank, and empty bins borrow circularly from the nearest non-empty
  * bin to the right with a distance-salted offset (so different borrow
  * distances never alias). Same signature shape and estimator
  * (bin-equality fraction ≈ Jaccard) as [[MinHashSig]], but the per-
  * shingle cost is O(1) instead of O(k) — the k-permutation inner loop of
  * k multiply-mods per shingle is the dominant cost of MinHash at
  * corpus scale, and this removes it. Empty input keeps the all-`p`
  * sentinel (never densified — there is nothing to borrow).
  */
case class MinHashSigOPH(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  private val P = 2147483647L // 2^31 - 1
  // distance salt for densification borrows; any constant < P works, it
  // only needs to separate borrow distances deterministically
  private val BorrowSalt = 0x9E3779B9L % 2147483647L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"minhash_sig_oph requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(P)
    var any = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h64 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
        val bin = java.lang.Math.floorMod(h64, numHashes.toLong).toInt
        val v = java.lang.Math.floorMod(h64, P)
        if (v < mins(bin)) mins(bin) = v
        any = true
      }
      i += 1
    }
    if (!any) return new GenericArrayData(mins) // all-sentinel: empty doc
    // rotation densification over the PRE-densification bins
    val out = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      if (mins(j) < P) out(j) = mins(j)
      else {
        var t = 1
        while (mins((j + t) % numHashes) == P) t += 1
        out(j) = (mins((j + t) % numHashes) + t * BorrowSalt) % P
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "minhash_sig_oph"
}

object MinHashSigOPH {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSigOPH].getName, null, "minhash_sig_oph",
    "_FUNC_(shingles, numHashes, seed) - one-permutation MinHash signature with rotation densification.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 3, s"minhash_sig_oph expects 3 arguments, got ${args.length}")
    val n = args(1).eval().asInstanceOf[Number].intValue()
    val seed = args(2).eval().asInstanceOf[Number].longValue()
    MinHashSigOPH(args.head, n, seed)
  }
}

/** 64-bit SimHash of a string-array token set (Charikar '02): per hash bit,
  * sum ±1 over tokens; bit set iff positive. Single pass, map-only.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (sums(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SimHash64].getName, null, "simhash64",
    "_FUNC_(tokens) - 64-bit SimHash of a string-array token set.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, s"simhash64 expects 1 argument, got ${args.length}")
    SimHash64(args.head)
  }
}

/** Distinct lowercase word n-gram shingles of a text column in ONE pass:
  * lowercase → whitespace-split → join every n consecutive tokens with a
  * space → dedupe (insertion order). Texts shorter than n tokens yield
  * their whole token string; empty/blank text yields an empty array.
  *
  * Replaces a 5-deep higher-order-function chain
  * (split/filter/transform/slice/concat_ws) that allocated intermediate
  * arrays per gram — this is the MinHash input, evaluated per document on
  * the full corpus, so it is on the critical path of every dedup sketch.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"word_shingles requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (toks.nonEmpty) {
      if (toks.length < n) out.add(UTF8String.fromString(toks.mkString(" ")))
      else {
        var i = 0
        val sb = new java.lang.StringBuilder(64)
        while (i + n <= toks.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out.add(UTF8String.fromString(sb.toString))
          i += 1
        }
      }
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordShingles].getName, null, "word_shingles",
    "_FUNC_(text, n) - distinct lowercase word n-gram shingles.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"word_shingles expects 2 arguments, got ${args.length}")
    WordShingles(args.head, args(1).eval().asInstanceOf[Number].intValue())
  }
}

/** Set-Jaccard similarity of two string arrays: |A∩B| / |A∪B|, duplicates
  * ignored. One hash-set pass instead of the `array_intersect` +
  * `array_union` pair, which materializes two intermediate arrays per
  * comparison — this runs once per CANDIDATE PAIR in the near-dup verify
  * join, so the constant factor matters at scale.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"jaccard_sim requires two array<string>, got $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      if (!a.isNullAt(i)) setA.add(a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      if (!b.isNullAt(i)) {
        val s = b.getUTF8String(i)
        if (setB.add(s) && setA.contains(s)) inter += 1
      }
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sim"
}

object JaccardSim {
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JaccardSim].getName, null, "jaccard_sim",
    "_FUNC_(a, b) - set-Jaccard similarity of two string arrays.", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, s"jaccard_sim expects 2 arguments, got ${args.length}")
    JaccardSim(args.head, args(1))
  }
}

/** Deflate-compressed byte length of a string's UTF-8 bytes at a fixed
  * zlib level — the kernel of the compression-ratio quality signal
  * (CCNet/RedPajama-v2's `compression_ratio`, Dolma's gzip
  * compressibility): highly repetitive machine text compresses far
  * below natural language. One tight Deflater loop per row, map-only,
  * no shuffle — the correct 100 TB plan for a per-document signal.
  *
  * Determinism: a FIXED level (6), strategy (default) and a fresh
  * Deflater per evaluation make output a pure function of the bytes for
  * a given zlib build; gates therefore surface threshold BOOLEANS, not
  * raw lengths (zlib builds may differ across JREs — the signal's
  * ordering is stable, its exact byte count is not guaranteed by spec).
  */
case class DeflateLen(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"deflate_len requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // One native Deflater per executor thread, reset between rows — a
    // fresh Deflater per row would malloc/init a native zlib stream in
    // the hot path. reset() restores the exact initial state, so output
    // is identical to a fresh instance.
    val d = DeflateLen.local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = DeflateLen.buf.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "deflate_len"
}

object DeflateLen {
  private val local: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() => new java.util.zip.Deflater(6, /* nowrap = */ true))
  private val buf: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DeflateLen].getName, null, "deflate_len",
    "_FUNC_(s) - deflate-compressed byte length of the string's UTF-8 bytes (zlib level 6, raw).", "")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, s"deflate_len expects 1 argument, got ${args.length}")
    DeflateLen(args.head)
  }
}
