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

  /** One detected schema change between two model.json generations. */
  final case class SchemaChange(
      entity: String,
      change: String, // added-column | removed-column | retyped-column | added-entity | removed-entity
      column: String, // "" for entity-level changes
      fromType: String,
      toType: String)

  /** Schema-drift report between two model versions — the operational
    * check a CDC operator runs before pointing the pipeline at a new
    * export generation (the reference's runtime reacts to drift with
    * ADD COLUMNS / fail-fast, cf.
    * /root/reference/src/main/scala/main.scala:106-110 via the framework's
    * schema provider; this surfaces the drift as data). Column identity is
    * the NORMALIZED name ([[normalizeFieldName]] — the same identity the
    * pipeline reads with), so a special-character-only rename
    * (`cur$$code` → `curcode`) is NOT drift, while a case change IS
    * (the reader is case-sensitive). Removed columns are reported but
    * non-fatal by the pipeline's
    * contract (old columns read as NULL); retyped columns are the
    * fail-fast case.
    */
  def diff(oldModel: CdmModel, newModel: CdmModel): Seq[SchemaChange] = {
    val oldEnts = oldModel.entities.map(e => e.name -> e).toMap
    val newEnts = newModel.entities.map(e => e.name -> e).toMap
    val entityChanges =
      newEnts.keySet.diff(oldEnts.keySet).toSeq.sorted
        .map(n => SchemaChange(n, "added-entity", "", "", "")) ++
      oldEnts.keySet.diff(newEnts.keySet).toSeq.sorted
        .map(n => SchemaChange(n, "removed-entity", "", "", ""))
    val columnChanges = oldEnts.keySet.intersect(newEnts.keySet).toSeq.sorted.flatMap { n =>
      val o = oldEnts(n).attributes
        .map(a => normalizeFieldName(a.name) -> a.dataType).toMap
      val w = newEnts(n).attributes
        .map(a => normalizeFieldName(a.name) -> a.dataType).toMap
      val added = w.keySet.diff(o.keySet).toSeq.sorted
        .map(c => SchemaChange(n, "added-column", c, "", w(c)))
      val removed = o.keySet.diff(w.keySet).toSeq.sorted
        .map(c => SchemaChange(n, "removed-column", c, o(c), ""))
      val retyped = o.keySet.intersect(w.keySet).toSeq.sorted
        .filter(c => o(c) != w(c))
        .map(c => SchemaChange(n, "retyped-column", c, o(c), w(c)))
      added ++ removed ++ retyped
    }
    entityChanges ++ columnChanges
  }
}
