package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset assembly operators for training pipelines: reproducible
  * splitting and sampling. North-star extension (SURVEY.md §2.C).
  *
  * Both use MULTIPLICATIVE hashing of the record id (Knuth's 2654435761,
  * the golden-ratio constant) instead of an RNG: the assignment is a pure
  * per-row function — deterministic across runs, engines, partitionings
  * and cluster sizes, with no seed state to ship. Map-only, no shuffle;
  * scales linearly to any corpus size.
  */
object Datasets {

  /** Knuth's multiplicative-hash constant (2^32 / φ). */
  val GoldenRatioHash = 2654435761L

  /** Per-mille bucket of an integer id — the basis for splits/samples.
    * ids are bounded well below 2^31 in practice so the product stays in
    * long range; callers with arbitrary longs should pre-fold.
    */
  def permilleBucket(id: Column): Column = pmod(id * GoldenRatioHash, lit(1000L))

  /** Deterministic train/valid/test assignment by per-mille thresholds
    * (defaults 80/10/10).
    */
  def deterministicSplit(
      df: DataFrame,
      idCol: String = "doc_id",
      trainPermille: Int = 800,
      validPermille: Int = 900
  ): DataFrame = {
    val b = permilleBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPermille, "train").when(b < validPermille, "valid").otherwise("test"))
  }

  /** Deterministic sample: keep rows whose per-mille bucket falls below
    * the rate. Same rows selected on every engine and every run.
    */
  def hashSample(df: DataFrame, permille: Int, idCol: String = "doc_id"): DataFrame =
    df.where(permilleBucket(col(idCol)) < permille)

  /** Stratified deterministic sampling: a per-label keep rate (per mille),
    * labels absent from `rates` keep `defaultPermille` — the standard
    * corpus-rebalancing step (e.g. downsample the dominant language,
    * keep the tail whole). Same multiplicative-hash basis as
    * [[hashSample]]: per-label selections are NESTED as the rate grows
    * (raising one label's rate only adds rows), and assignment stays a
    * pure per-row function — map-only, no shuffle, engine- and
    * partitioning-independent.
    */
  def stratifiedSample(
      df: DataFrame,
      rates: Map[String, Int],
      labelCol: String = "lang",
      idCol: String = "doc_id",
      defaultPermille: Int = 1000
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille).cast("long")) {
      case (acc, (label, p)) => when(col(labelCol) === label, lit(p.toLong)).otherwise(acc)
    }
    df.where(permilleBucket(col(idCol)) < rate)
  }
}
