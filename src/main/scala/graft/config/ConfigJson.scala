package graft.config

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.model.SourceConfig

/** Reader for the reference's `logsuck.json` configuration format
  * (logsuck-config.schema.json; converters at
  * pkg/logsuck/config/JsonConverter.go:100-176 and
  * JsonFileTypeConfigConverter.go:24-157) — a user of the reference points
  * this at their existing config and gets the engine's `SourceConfig`
  * dimension.
  *
  * Mapping, mirroring `indexedfiles.ReadFileConfig` merge semantics
  * (internal: first listed fileType's parser wins; the special DEFAULT
  * fileType applies to every file; built-in defaults when absent):
  *   - files[].fileName (glob)            -> source_glob
  *   - parser.type Regex                  -> file_type "kv" (+fieldExtractors)
  *   - parser.type JSON                   -> file_type "json"
  *   - regexConfig.timeField / jsonConfig.timeField -> time_field
  *     (defaults "_time" / "ts" per the schema)
  *   - fileType.timeLayout                -> time_layout
  *     (default "2006/01/02 15:04:05")
  *   - host.name / host.type              -> host, host_type
  *     (defaults "localhost" / "DEFAULT")
  * Per-fileType `eventDelimiter` (JsonConverter.go:50-55) flows through
  * `Parsed.eventDelimiters` into TextIngest's per-file split. Watcher-level
  * knobs with no batch meaning (readInterval, forwarder/recipient/web
  * blocks) are intentionally ignored — SURVEY §2.1 maps them to Spark
  * machinery.
  */
object ConfigJson {

  /** `eventDelimiters` is ordered (glob, delimiter-regex) pairs — first
    * matching glob wins, like every other per-file config resolution.
    */
  final case class Parsed(hostName: String, hostType: String,
      configs: Seq[SourceConfig], eventDelimiters: Seq[(String, String)])

  val DEFAULT_TIME_LAYOUT = "2006/01/02 15:04:05"

  private final case class FileType(
      name: String,
      timeLayout: String,
      parserType: String, // "Regex" | "JSON"
      extractors: Seq[String],
      timeField: String,
      eventDelimiter: String)

  private def text(n: JsonNode, field: String, dflt: String = ""): String = {
    val v = if (n == null) null else n.get(field)
    if (v == null || v.isNull) dflt else v.asText()
  }

  private def defaultFileType(name: String) = FileType(
    name, DEFAULT_TIME_LAYOUT, "Regex",
    SourceConfig.defaultExtractors, "_time", "\n")

  def parse(json: String): Parsed = {
    val root = new ObjectMapper().readTree(json)

    val hostName = text(root.get("host"), "name", "localhost") match {
      case "" => "localhost"
      case h => h
    }
    val hostType = text(root.get("host"), "type", "DEFAULT") match {
      case "" => "DEFAULT"
      case t => t
    }

    val fileTypes: Map[String, FileType] = {
      val declared = Option(root.get("fileTypes")).toSeq
        .flatMap(_.elements().asScala)
        .map { ft =>
          val name = text(ft, "name")
          val timeLayout = text(ft, "timeLayout", DEFAULT_TIME_LAYOUT) match {
            case "" => DEFAULT_TIME_LAYOUT
            case l => l
          }
          val parser = ft.get("parser")
          val ptype = text(parser, "type", "Regex") match {
            case "" => "Regex"
            case t => t
          }
          val (extractors, timeField, delim) =
            if (ptype == "JSON") {
              val jc = if (parser == null) null else parser.get("jsonConfig")
              (Seq.empty[String],
                text(jc, "timeField", "ts") match { case "" => "ts"; case f => f },
                text(jc, "eventDelimiter", "\n") match { case "" => "\n"; case d => d })
            } else {
              val rc = if (parser == null) null else parser.get("regexConfig")
              val exs = Option(rc).flatMap(r => Option(r.get("fieldExtractors")))
                .map(_.elements().asScala.map(_.asText()).toSeq)
                .filter(_.nonEmpty)
                .getOrElse(SourceConfig.defaultExtractors)
              (exs,
                text(rc, "timeField", "_time") match { case "" => "_time"; case f => f },
                text(rc, "eventDelimiter", "\n") match { case "" => "\n"; case d => d })
            }
          name -> FileType(name, timeLayout, ptype, extractors, timeField, delim)
        }.toMap
      declared.updatedWith("DEFAULT")(_.orElse(Some(defaultFileType("DEFAULT"))))
    }

    // one resolution pass per file: "first listed type wins; DEFAULT backs
    // every file" must stay a single rule feeding BOTH the SourceConfig and
    // the delimiter table (two copies would silently diverge)
    val files = Option(root.get("files")).toSeq.flatMap(_.elements().asScala)
    val resolved: Seq[(SourceConfig, (String, String))] = files.map { f =>
      val glob = text(f, "fileName")
      val listed = Option(f.get("fileTypes")).toSeq
        .flatMap(_.elements().asScala).map(_.asText())
        .filter(fileTypes.contains)
      val merged = (listed.map(fileTypes) :+ fileTypes("DEFAULT")).head
      val fileType = if (merged.parserType == "JSON") "json" else "kv"
      (SourceConfig(glob, fileType, merged.extractors, merged.timeField,
        merged.timeLayout, hostName, hostType),
        glob -> merged.eventDelimiter)
    }

    Parsed(hostName, hostType, resolved.map(_._1), resolved.map(_._2))
  }

  def parseFile(path: String): Parsed =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))

  /** The GUI's enum-provider values (internal/web/EnumProvider.go: the
    * fileTypes / files / hostTypes providers read the live config source
    * and answer the map keys). Derived from the same JSON the engine
    * parses, with the same normalization [[parse]] applies — fileTypes
    * always includes the implicit DEFAULT backing type, hostTypes the
    * DEFAULT host type. Unknown provider name -> None.
    */
  def enumValues(json: String, name: String): Option[Seq[String]] = {
    val root = new ObjectMapper().readTree(json)
    def arr(field: String): Seq[JsonNode] =
      Option(root.get(field)).toSeq.flatMap(_.elements().asScala)
    name match {
      case "fileTypes" =>
        Some(("DEFAULT" +: arr("fileTypes").map(text(_, "name"))).distinct)
      case "files" => Some(arr("files").map(text(_, "fileName")).distinct)
      case "hostTypes" =>
        Some(("DEFAULT" +: Option(root.get("host"))
          .flatMap(h => Option(h.get("type")).map(_.asText())).toSeq).distinct)
      case _ => None
    }
  }

  /** JSON Schema of the config subset THIS reader honors (served by the
    * REST surface like the reference's `GET config/schema`,
    * internal/web/ConfigWeb.go:28-30). Authored against [[parse]] — one
    * schema per supported knob, defaults matching the code — rather than
    * shipping the reference's full schema file, most of which (forwarder,
    * recipient, web, tasks blocks) maps to Spark machinery here and would
    * advertise knobs the engine ignores.
    */
  val SCHEMA_JSON: String =
    """{
      |  "$schema": "http://json-schema.org/draft-07/schema#",
      |  "title": "graft engine configuration (logsuck.json subset)",
      |  "type": "object",
      |  "properties": {
      |    "host": {
      |      "type": "object",
      |      "properties": {
      |        "name": {"type": "string", "default": "localhost"},
      |        "type": {"type": "string", "default": "DEFAULT"}
      |      }
      |    },
      |    "files": {
      |      "type": "array",
      |      "items": {
      |        "type": "object",
      |        "properties": {
      |          "fileName": {"type": "string", "description": "glob over sources"},
      |          "fileTypes": {"type": "array", "items": {"type": "string"},
      |            "description": "first listed type wins; DEFAULT backs every file"}
      |        },
      |        "required": ["fileName"]
      |      }
      |    },
      |    "fileTypes": {
      |      "type": "array",
      |      "items": {
      |        "type": "object",
      |        "properties": {
      |          "name": {"type": "string"},
      |          "timeLayout": {"type": "string", "default": "2006/01/02 15:04:05"},
      |          "parser": {
      |            "type": "object",
      |            "properties": {
      |              "type": {"type": "string", "enum": ["Regex", "JSON"], "default": "Regex"},
      |              "regexConfig": {
      |                "type": "object",
      |                "properties": {
      |                  "fieldExtractors": {"type": "array", "items": {"type": "string"}},
      |                  "timeField": {"type": "string", "default": "_time"},
      |                  "eventDelimiter": {"type": "string", "default": "\n"}
      |                }
      |              },
      |              "jsonConfig": {
      |                "type": "object",
      |                "properties": {
      |                  "timeField": {"type": "string", "default": "ts"},
      |                  "eventDelimiter": {"type": "string", "default": "\n"}
      |                }
      |              }
      |            }
      |          }
      |        },
      |        "required": ["name"]
      |      }
      |    }
      |  }
      |}""".stripMargin
}
