package graft.cdm

import org.apache.spark.sql.types._

/** CDM attribute types → Spark `StructType`.
  *
  * Type mapping evidence (reference fixture
  * `/root/reference/src/test/scala/integration/SynapseMetadata.scala`):
  *   - `guid`            → StringType        (36-char UUID; the merge identity, :49-53)
  *   - `string`          → StringType        (`is.constrained`/`maximumLength` kept as
  *                                            StructField metadata, :100-114)
  *   - `int64`           → LongType          (:64-68)
  *   - `decimal`         → DecimalType(p, s) (`is.dataFormat.numeric.shaped`
  *                                            precision/scale traits, :132-150)
  *   - `dateTime`        → TimestampNTZType  (no zone; mixed source formats, :55-58)
  *   - `dateTimeOffset`  → TimestampType     (offset-carrying, UTC-normalized, :407-410)
  *   - `boolean`         → BooleanType       (CSV literals `True`/`False`, :417-420)
  *   - `binary` (anticipated by the reference's size estimator, CRD beta:447-450)
  *                       → BinaryType
  *
  * Field names are normalized by stripping special characters, per
  * `/root/reference/docs/crd.md:186-188`.
  */
object CdmSchema {

  val MaxLengthMetadataKey = "cdm.maxLength"
  val CdmTypeMetadataKey = "cdm.dataType"

  /** Strip special characters from a source field name
    * (`/root/reference/docs/crd.md:186-188` names `$`, `/`, `\` as examples).
    * Keeps `[A-Za-z0-9_]`, drops everything else.
    */
  def normalizeFieldName(name: String): String =
    name.filter(c => c.isLetterOrDigit || c == '_')

  def toSparkType(attr: CdmAttribute): DataType = attr.dataType match {
    case "guid"           => StringType
    case "string"         => StringType
    case "int64"          => LongType
    case "int32" | "int"  => IntegerType
    case "double"         => DoubleType
    case "decimal" =>
      val shaped = attr.trait_("is.dataFormat.numeric.shaped")
      val p = shaped.flatMap(_.argument("precision")).map(_.toInt).getOrElse(38)
      val s = shaped.flatMap(_.argument("scale")).map(_.toInt).getOrElse(6)
      DecimalType(p, s)
    case "dateTime"       => TimestampNTZType
    case "dateTimeOffset" => TimestampType
    case "boolean"        => BooleanType
    case "binary"         => BinaryType
    case other =>
      // Unknown CDM types degrade to string rather than failing the stream;
      // the raw text is preserved and a later schema migration can re-type.
      StringType
  }

  def toStructField(attr: CdmAttribute): StructField = {
    val mb = new MetadataBuilder().putString(CdmTypeMetadataKey, attr.dataType)
    if (attr.maxLength > 0) mb.putLong(MaxLengthMetadataKey, attr.maxLength.toLong)
    StructField(normalizeFieldName(attr.name), toSparkType(attr), nullable = true, mb.build())
  }

  /** Schema of one entity; field order == CSV column order. */
  def forEntity(entity: CdmEntity): StructType =
    StructType(entity.attributes.map(toStructField))

  def forEntity(model: CdmModel, entityName: String): StructType =
    model
      .entity(entityName)
      .map(forEntity)
      .getOrElse(throw new IllegalArgumentException(
        s"entity '$entityName' not found in model.json (has: ${model.entities.map(_.name).mkString(", ")})"))

  /** All-string schema with the same (normalized) field names — the shape the
    * raw CSV is read with before [[CsvCast]] applies typed casts.
    */
  def rawStringSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true, f.metadata)))
}
