package graft.ext

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Durable pipeline state for the trained/curation artifacts the corpus
  * operators produce: classifier weights ([[Classifier.LinearModel]]),
  * DSIR importance models ([[Datasets.DsirModel]]), exact-membership
  * bloom indexes ([[Dedup.exactIndex]] bytes) and ANN/cluster centroid
  * matrices. A 100 TB pipeline runs these stages on DIFFERENT jobs and
  * days — fit once on the labeled/seed job, store beside the corpus,
  * score in every later job — so the model must be a file, not a JVM
  * object.
  *
  * Format: versioned JSON (doubles as JSON numbers round-trip exactly —
  * Jackson serializes binary64 shortest-round-trip, so a loaded model
  * scores BIT-identically); bloom indexes are raw bytes (the filter is
  * already a serialized format). Writes publish atomically (temp +
  * rename, the version-hint pattern) so a reader never sees a torn
  * model, and loads FAIL LOUDLY on a kind/version mismatch rather than
  * mis-scoring with someone else's weights.
  *
  * Paths go through the Hadoop FileSystem API — local, HDFS and object
  * stores all work.
  */
object ModelStore {

  private val mapper = new ObjectMapper()

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def writeAtomic(fs: FileSystem, p: Path, bytes: Array[Byte]): Unit = {
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp.${java.util.UUID.randomUUID()}")
    val o = fs.create(tmp, true)
    try o.write(bytes) finally o.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"failed to publish model at $p (rename returned false)")
  }

  private def readAll(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try in.readAllBytes() finally in.close()
  }

  private def header(kind: String) = {
    val root = mapper.createObjectNode()
    root.put("format", "graft-model")
    root.put("version", 1)
    root.put("kind", kind)
    root
  }

  private def checkHeader(node: com.fasterxml.jackson.databind.JsonNode,
      kind: String, path: String): Unit = {
    require(node.path("format").asText() == "graft-model" &&
      node.path("version").asInt() == 1 && node.path("kind").asText() == kind,
      s"$path is not a graft-model/$kind v1 file " +
        s"(found ${node.path("kind").asText("<none>")})")
  }

  // ------------------------------------------------------- classifier

  def saveClassifier(spark: SparkSession, path: String,
      model: Classifier.LinearModel): Unit = {
    val (fs, p) = fsFor(spark, path)
    val root = header("classifier")
    root.put("bias", model.bias)
    val w = root.putArray("weights")
    model.weights.foreach(w.add)
    writeAtomic(fs, p, mapper.writeValueAsBytes(root))
  }

  def loadClassifier(spark: SparkSession, path: String): Classifier.LinearModel = {
    val (fs, p) = fsFor(spark, path)
    val node = mapper.readTree(readAll(fs, p))
    checkHeader(node, "classifier", path)
    Classifier.LinearModel(
      node.get("weights").elements().asScala.map(_.asDouble()).toSeq,
      node.get("bias").asDouble())
  }

  // ------------------------------------------------------------- dsir

  def saveDsir(spark: SparkSession, path: String,
      model: Datasets.DsirModel): Unit = {
    val (fs, p) = fsFor(spark, path)
    val root = header("dsir")
    root.put("smoothing", model.smoothing)
    val w = root.putArray("logRatio")
    model.logRatio.foreach(w.add)
    writeAtomic(fs, p, mapper.writeValueAsBytes(root))
  }

  def loadDsir(spark: SparkSession, path: String): Datasets.DsirModel = {
    val (fs, p) = fsFor(spark, path)
    val node = mapper.readTree(readAll(fs, p))
    checkHeader(node, "dsir", path)
    Datasets.DsirModel(
      node.get("logRatio").elements().asScala.map(_.asDouble()).toSeq,
      node.get("smoothing").asDouble())
  }

  // ------------------------------------------------- bloom index bytes

  /** The bloom filter is already a self-describing serialized format
    * (Spark's BloomFilterImpl stream) — store the bytes verbatim with a
    * tiny magic prefix so a JSON model can't be loaded as a bloom index
    * by mistake.
    */
  private val BloomMagic = "GRAFTBLOOM1\n".getBytes("UTF-8")

  def saveBloomIndex(spark: SparkSession, path: String, index: Array[Byte]): Unit = {
    val (fs, p) = fsFor(spark, path)
    writeAtomic(fs, p, BloomMagic ++ index)
  }

  def loadBloomIndex(spark: SparkSession, path: String): Array[Byte] = {
    val (fs, p) = fsFor(spark, path)
    val all = readAll(fs, p)
    require(all.length > BloomMagic.length &&
      java.util.Arrays.equals(all.take(BloomMagic.length), BloomMagic),
      s"$path is not a graft bloom-index file")
    all.drop(BloomMagic.length)
  }

  // --------------------------------------------------- centroid matrix

  def saveCentroids(spark: SparkSession, path: String,
      centroids: Array[Array[Double]]): Unit = {
    require(centroids.nonEmpty && centroids.map(_.length).distinct.length == 1,
      "centroid matrix must be non-empty and rectangular")
    val (fs, p) = fsFor(spark, path)
    val root = header("centroids")
    root.put("dim", centroids.head.length)
    val rows = root.putArray("rows")
    centroids.foreach { c => val r = rows.addArray(); c.foreach(r.add) }
    writeAtomic(fs, p, mapper.writeValueAsBytes(root))
  }

  def loadCentroids(spark: SparkSession, path: String): Array[Array[Double]] = {
    val (fs, p) = fsFor(spark, path)
    val node = mapper.readTree(readAll(fs, p))
    checkHeader(node, "centroids", path)
    val dim = node.get("dim").asInt()
    val rows = node.get("rows").elements().asScala
      .map(_.elements().asScala.map(_.asDouble()).toArray).toArray
    require(rows.forall(_.length == dim), s"$path: corrupt centroid matrix")
    rows
  }

  // ------------------------------------- parquet-backed index artifacts

  /** Corpus-sized artifacts (SQ8 code tables, MinHash signature indexes)
    * are DATA, not weights: they store as a parquet directory plus the
    * usual versioned header (`_model.json`, written LAST — a reader that
    * finds the header finds complete data; loads without it fail loudly).
    * This is what lets a 100 TB search/dedup job reconstruct its trained
    * index from storage instead of re-running the corpus-sized
    * quantization/signature pass every increment.
    */
  private def saveIndexFrame(spark: SparkSession, dir: String, kind: String,
      df: org.apache.spark.sql.DataFrame,
      extra: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    val (fs, p) = fsFor(spark, dir)
    df.write.mode("overwrite").parquet(new Path(p, "data").toString)
    val root = header(kind)
    extra(root)
    writeAtomic(fs, new Path(p, "_model.json"), mapper.writeValueAsBytes(root))
  }

  private def loadIndexHeader(spark: SparkSession, dir: String,
      kind: String): com.fasterxml.jackson.databind.JsonNode = {
    val (fs, p) = fsFor(spark, dir)
    val hp = new Path(p, "_model.json")
    require(fs.exists(hp), s"$dir is not a graft $kind index (no _model.json)")
    val node = mapper.readTree(readAll(fs, hp))
    checkHeader(node, kind, dir)
    node
  }

  /** Persist an SQ8 quantization table ([[Similarity.sq8Index]]:
    * `(id, scale, codes)`). A reloaded index drives
    * [[Similarity.int8RerankTopKFromIndex]] hash-identically to inline
    * quantization (pinned by ModelStoreSpec).
    */
  def saveSq8Index(spark: SparkSession, dir: String,
      index: org.apache.spark.sql.DataFrame, idCol: String = "vec_id"): Unit = {
    require(Seq(idCol, "scale", "codes").forall(index.columns.contains),
      s"sq8 index needs ($idCol, scale, codes), got ${index.columns.mkString(",")}")
    saveIndexFrame(spark, dir, "sq8-index", index, root => { root.put("idCol", idCol); () })
  }

  def loadSq8Index(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    loadIndexHeader(spark, dir, "sq8-index")
    spark.read.parquet(new Path(new Path(dir), "data").toString)
  }

  /** Persist a MinHash signature index (`(id, signature)` from
    * [[Dedup.minHashSignatures]]) WITH its generation/banding parameters
    * ([[Dedup.MinHashParams]] — hash count, bands, shingle width, seed,
    * OPH) so a later job signs its increment with the identical family:
    * mismatched parameters would silently collapse candidate recall.
    */
  def saveMinHashIndex(spark: SparkSession, dir: String,
      sigs: org.apache.spark.sql.DataFrame, params: Dedup.MinHashParams): Unit = {
    require(Seq("id", "signature").forall(sigs.columns.contains),
      s"minhash index needs (id, signature), got ${sigs.columns.mkString(",")}")
    saveIndexFrame(spark, dir, "minhash-index", sigs, { root =>
      root.put("numHashes", params.numHashes)
      root.put("numBands", params.numBands)
      root.put("shingleSize", params.shingleSize)
      root.put("seed", params.seed)
      root.put("oph", params.oph)
      ()
    })
  }

  def loadMinHashIndex(spark: SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, Dedup.MinHashParams) = {
    val node = loadIndexHeader(spark, dir, "minhash-index")
    val params = Dedup.MinHashParams(
      node.get("numHashes").asInt(), node.get("numBands").asInt(),
      node.get("shingleSize").asInt(), node.get("seed").asLong(),
      node.get("oph").asBoolean())
    (spark.read.parquet(new Path(new Path(dir), "data").toString), params)
  }
}
