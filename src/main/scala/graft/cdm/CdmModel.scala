package graft.cdm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Parsed Common Data Model `model.json` document.
  *
  * A Synapse Link "Incremental CSV" export writes one `model.json` per batch
  * folder describing every exported entity: entity name plus an ordered list
  * of attributes `{name, dataType, maxLength, cdm:traits}`. The attribute
  * order IS the CSV column order (columns are positional, there is no
  * header row).
  *
  * Shape evidenced by the reference fixture
  * `/root/reference/src/test/scala/integration/SynapseMetadata.scala:24-829`
  * and the framework classes named in
  * `/root/reference/configs/reflect-config.json:335-347`
  * (`SimpleCdmModel`, `SimpleCdmEntity`, `SimpleCdmAttribute`).
  */
final case class CdmTraitArgument(name: String, value: String)
final case class CdmTrait(traitReference: String, arguments: Seq[CdmTraitArgument]) {
  def argument(name: String): Option[String] =
    arguments.find(_.name == name).map(_.value)
}
final case class CdmAttribute(
    name: String,
    dataType: String,
    maxLength: Int,
    traits: Seq[CdmTrait]
) {
  def trait_(ref: String): Option[CdmTrait] = traits.find(_.traitReference == ref)
}
final case class CdmEntity(name: String, attributes: Seq[CdmAttribute])
final case class CdmModel(name: String, version: String, entities: Seq[CdmEntity]) {
  def entity(name: String): Option[CdmEntity] = entities.find(_.name == name)
}

object CdmModel {
  // ObjectMapper is thread-safe after configuration; one per JVM is the
  // idiomatic (and cheapest) usage.
  private val mapper = new ObjectMapper()

  /** Parse a `model.json` document. Tolerant of absent optional fields
    * (`description`, `annotations`, `cdm:traits`) — only `entities[].name`
    * and `entities[].attributes[].{name,dataType}` are required.
    */
  def parse(json: String): CdmModel = {
    val root = mapper.readTree(json)
    val entities = arr(root, "entities").map { e =>
      val attrs = arr(e, "attributes").map { a =>
        CdmAttribute(
          name = a.path("name").asText(),
          dataType = a.path("dataType").asText(),
          maxLength = if (a.has("maxLength")) a.path("maxLength").asInt(-1) else -1,
          traits = arr(a, "cdm:traits").map { t =>
            CdmTrait(
              t.path("traitReference").asText(),
              arr(t, "arguments").map(g => CdmTraitArgument(g.path("name").asText(), g.path("value").asText()))
            )
          }
        )
      }
      CdmEntity(e.path("name").asText(), attrs)
    }
    CdmModel(root.path("name").asText(""), root.path("version").asText(""), entities)
  }

  private def arr(node: JsonNode, field: String): Seq[JsonNode] =
    if (node.has(field) && node.get(field).isArray) node.get(field).elements().asScala.toSeq
    else Seq.empty
}
