package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.OffsetDateTime
import java.time.format.DateTimeFormatter

/** Generates a local-filesystem Synapse Link export layout for tests —
  * the same storage shape and change-scenario the reference's integration
  * fixture drives against Azurite
  * (`/root/reference/src/test/scala/integration/Fixtures.scala:25-72`,
  * `SynapseMetadata.scala:7-22`): batch folders named
  * `yyyy-MM-dd'T'HH.mm.ss'Z'`, per-folder `model.json`, CSV chunks per
  * entity, and a `Changelog/changelog.info` blob naming the newest closed
  * folder.
  */
object CdmFixture {
  val entityName = "dimensionattributelevelvalue"
  val folderFormatter: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH.mm.ss")

  /** The 25-attribute entity of the reference fixture (FIXTURES.md §1.2). */
  private val attributes: Seq[(String, String)] = Seq(
    "Id" -> "guid",
    "SinkCreatedOn" -> "dateTime",
    "SinkModifiedOn" -> "dateTime",
    "sysdatastatecode" -> "int64",
    "dimensionattributevalue" -> "int64",
    "dimensionattributevaluegroup" -> "int64",
    "displayvalue" -> "string",
    "ordinal" -> "int64",
    "backingrecorddataareaid" -> "string",
    "modifieddatetime" -> "dateTime",
    "modifiedby" -> "string",
    "modifiedtransactionid" -> "int64",
    "createddatetime" -> "dateTime",
    "createdby" -> "string",
    "createdtransactionid" -> "int64",
    "dataareaid" -> "string",
    "recversion" -> "int64",
    "partition" -> "int64",
    "sysrowversion" -> "int64",
    "recid" -> "int64",
    "tableid" -> "int64",
    "versionnumber" -> "int64",
    "createdon" -> "dateTimeOffset",
    "modifiedon" -> "dateTime",
    "IsDelete" -> "boolean"
  )

  def modelJson(extraAttributes: Seq[(String, String)] = Seq.empty): String =
    modelJsonFor(Seq(entityName), extraAttributes)

  /** model.json declaring SEVERAL entities (the real Synapse export shape:
    * one model.json lists every exported entity; each app instance streams
    * one of them — SURVEY.md §1.1).
    */
  def modelJsonFor(
      names: Seq[String], extraAttributes: Seq[(String, String)] = Seq.empty): String = {
    val attrJson = (attributes ++ extraAttributes).map { case (n, t) =>
      s"""{"name": "$n", "dataType": "$t", "maxLength": -1}"""
    }.mkString(",\n        ")
    val entJson = names.map { en =>
      s"""{
      "$$type": "LocalEntity",
      "name": "$en",
      "attributes": [
        $attrJson
      ]
    }"""
    }.mkString(",\n    ")
    s"""{
  "name": "cdm", "description": "cdm", "version": "1.0",
  "entities": [
    $entJson
  ]
}"""
  }

  /** One full change row in the fixture's CSV shape: D365-format Sink
    * timestamps (hour-0-with-PM quirk included), ISO timestamps with 7-digit
    * fractions, quoted strings, trailing empty IsDelete.
    */
  def insertRow(id: String, seq: Int, version: Long, display: String): String = {
    val iso = f"2020-01-01T00:${15 + seq}%02d:00.0000000"
    Seq(
      id,
      "\"1/1/2020 0:00:01 PM\"",
      "\"1/1/2020 0:00:01 PM\"",
      "0",
      s"${1111000000L + seq}",
      s"${1111000010L + seq}",
      s""""$display"""",
      "1",
      "",
      s""""${iso}Z"""",
      "\"acc1\"",
      s"${111111110L + seq}",
      s""""${iso}Z"""",
      "\"acc1\"",
      "0",
      "\"dat\"",
      "1",
      s"${1111000001L + seq}",
      s"${2111000001L + seq}",
      s"${1111000001L}",
      "21111",
      version.toString,
      s""""$iso+00:00"""",
      s""""${iso}Z"""",
      "" // IsDelete empty → NULL
    ).mkString(",")
  }

  /** Delete tombstone: key + Sink timestamps + versionnumber populated, 18
    * empty middle fields, `True` in the last column.
    */
  def deleteRow(id: String, version: Long): String =
    Seq(
      id,
      "\"1/1/2020 0:00:00 PM\"",
      "\"1/1/2020 0:00:00 PM\"",
      "", "", "", "", "", "", "", "", "", "", "", "", "", "", "", "", "", "",
      version.toString,
      "\"0001-01-03T00:00:00.0000000\"",
      "",
      "True"
    ).mkString(",")

  // The five backfill identities + versions of the reference scenario
  // (SynapseMetadata.scala:7-12). Row 1 is later deleted; row 2 is later
  // upserted to version 2111000012.
  val id1 = "50bff458-d47a-4924-804b-31c0a83108e6"
  val id2 = "5b4bc74e-2132-4d8e-8572-48ce4260f182"
  val baseIds: Seq[(String, Long)] = Seq(
    id1 -> 2111000001L,
    id2 -> 2111000002L,
    "aae2094d-cd17-42b4-891e-3b268e2b6713" -> 2111000003L,
    "9633be9a-c485-4afa-8bb7-4ba380eaa206" -> 2111000004L,
    "b62c7b67-b8f8-4635-8cef-1c23591d5c4c" -> 2111000005L
  )
  val baseFile: String =
    baseIds.zipWithIndex.map { case ((id, v), i) => insertRow(id, i, v, s"F123456$i") }.mkString("\n") + "\n"

  // Upsert file (SynapseMetadata.scala:15-19): one new id, one update of id2
  // with HIGHER version 2111000012, one more new id.
  val upsertIds: Seq[(String, Long)] = Seq(
    "40bff458-d47a-4924-804b-31c0a83108e6" -> 2111000011L,
    id2 -> 2111000012L,
    "bae2094d-2132-4d8e-5571-18cf4260f182" -> 2111111111L
  )
  val upsertFile: String =
    upsertIds.zipWithIndex.map { case ((id, v), i) => insertRow(id, i, v, s"F12345$i") }.mkString("\n") + "\n"

  val deleteFile: String = deleteRow(id1, 3111000001L) + "\n"

  def folderName(ts: OffsetDateTime): String = s"${folderFormatter.format(ts)}Z"

  /** Upload one batch folder (mirrors Fixtures.uploadBatch: base file always;
    * optional delete + upsert chunks with colliding small-int names;
    * optionally stamp the changelog).
    */
  def uploadBatch(
      root: String,
      ts: OffsetDateTime,
      addDelete: Boolean = false,
      addUpsert: Boolean = false,
      updateChangelog: Boolean = false,
      chunkSeed: Int = 7
  ): String = {
    val folder = folderName(ts)
    val fdir = Paths.get(root, folder, entityName)
    Files.createDirectories(fdir)
    write(Paths.get(root, folder, "model.json"), modelJson())
    write(fdir.resolve(s"${2020 + (chunkSeed % 6)}.csv"), baseFile)
    if (addDelete) write(fdir.resolve(s"${1 + (chunkSeed % 9)}.csv"), deleteFile)
    if (addUpsert) write(fdir.resolve(s"${1 + ((chunkSeed + 3) % 9)}.csv"), upsertFile)
    if (updateChangelog) stampChangelog(root, folder)
    folder
  }

  /** Upload one batch folder carrying SEVERAL entities, each with
    * per-entity row content (displayvalue prefixed by the entity name, so
    * any cross-entity leak in the source/merge path shows up as a wrong
    * prefix in the target table).
    */
  def uploadBatchEntities(
      root: String,
      ts: OffsetDateTime,
      names: Seq[String],
      addBase: Boolean = true,
      addDelete: Boolean = false,
      addUpsert: Boolean = false,
      updateChangelog: Boolean = false,
      chunkSeed: Int = 7
  ): String = {
    val folder = folderName(ts)
    Files.createDirectories(Paths.get(root, folder))
    write(Paths.get(root, folder, "model.json"), modelJsonFor(names))
    names.foreach { en =>
      val fdir = Paths.get(root, folder, en)
      Files.createDirectories(fdir)
      if (addBase) {
        val base = baseIds.zipWithIndex.map { case ((id, v), i) =>
          insertRow(id, i, v, s"$en-F$i") }.mkString("\n") + "\n"
        write(fdir.resolve(s"${2020 + (chunkSeed % 6)}.csv"), base)
      }
      if (addDelete) write(fdir.resolve(s"${1 + (chunkSeed % 9)}.csv"), deleteFile)
      if (addUpsert) {
        val up = upsertIds.zipWithIndex.map { case ((id, v), i) =>
          insertRow(id, i, v, s"$en-U$i") }.mkString("\n") + "\n"
        write(fdir.resolve(s"${1 + ((chunkSeed + 3) % 9)}.csv"), up)
      }
    }
    if (updateChangelog) stampChangelog(root, folder)
    folder
  }

  def stampChangelog(root: String, folder: String): Unit = {
    Files.createDirectories(Paths.get(root, "Changelog"))
    write(Paths.get(root, "Changelog", "changelog.info"), folder)
  }

  def initRoot(root: String): Unit = {
    Files.createDirectories(Paths.get(root))
    write(Paths.get(root, "model.json"), modelJson())
  }

  private def write(p: Path, content: String): Unit =
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
}
