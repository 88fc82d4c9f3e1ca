package graft.dag

import java.nio.file.{Files, Paths, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

import graft.quality.Checks

/** dbt schema-YAML metadata artifacts — the reference's
  * `write_model_yml` (datanika `services/dbt_project.py:677-719`),
  * `write_sources_yml` (`:721-748`) and the tests-from-yml path
  * (`write_tests_config`, `:349-380`): model/source docs plus
  * column tests config written as `.yml` files that dbt later
  * compiles into test SQL.
  *
  * The round-trip is the point: graft EMITS the same `version: 2`
  * document shape dbt consumes, PARSES it back (snakeyaml, which
  * ships with Spark), and lowers the parsed tests config onto
  * `quality.Checks` — so a declared `tests:` block is executable,
  * not just documentation. Metadata files are driver-side artifacts
  * (KBs); nothing here touches the data plane until Checks runs its
  * single-scan aggregates.
  */
object ModelYaml {

  final case class ColumnDoc(
      name: String,
      dataType: String = "",
      description: Option[String] = None,
      tests: Seq[TestSpec] = Nil)

  final case class ModelDoc(
      name: String,
      description: Option[String] = None,
      config: Map[String, String] = Map.empty,
      columns: Seq[ColumnDoc] = Nil)

  final case class SourceTableDoc(
      name: String,
      description: Option[String] = None,
      loadedAtField: Option[String] = None)

  final case class SourceDoc(
      name: String,
      schema: String,
      tables: Seq[SourceTableDoc],
      freshness: Map[String, Long] = Map.empty)

  /** dbt's four generic tests, as declared in YAML. `Relationships`
    * keeps the raw `to:` text (`source('lake', 'customer')` or
    * `ref('model')`) — resolution to a frame happens at run time.
    */
  sealed trait TestSpec
  case object NotNullT extends TestSpec
  case object UniqueT extends TestSpec
  final case class AcceptedValuesT(values: Seq[String]) extends TestSpec
  final case class RelationshipsT(to: String, field: String) extends TestSpec

  // ---------------------------------------------------------------
  // emit
  // ---------------------------------------------------------------

  private def yamlDump(root: Any): String = {
    val opts = new org.yaml.snakeyaml.DumperOptions
    // matches the reference's yaml.safe_dump(default_flow_style=False)
    opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
    new org.yaml.snakeyaml.Yaml(opts).dump(root)
  }

  private def jmap(pairs: (String, Any)*): java.util.Map[String, Any] = {
    val m = new java.util.LinkedHashMap[String, Any]()
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private def testNode(t: TestSpec): Any = t match {
    case NotNullT => "not_null"
    case UniqueT => "unique"
    case AcceptedValuesT(vs) =>
      jmap("accepted_values" -> jmap("values" -> vs.asJava))
    case RelationshipsT(to, field) =>
      jmap("relationships" -> jmap("to" -> to, "field" -> field))
  }

  /** `models/<schema>/<model>.yml` — the reference's write_model_yml
    * document: one model entry with description, config, and columns
    * (each with data_type / description / tests). Returns the path.
    */
  def writeModelYml(projectDir: String, schemaName: String, doc: ModelDoc): Path = {
    val entry = jmap("name" -> doc.name)
    doc.description.foreach(d => entry.put("description", d))
    if (doc.config.nonEmpty)
      entry.put("config", jmap(doc.config.toSeq.sortBy(_._1): _*))
    if (doc.columns.nonEmpty) entry.put("columns", doc.columns.map { c =>
      val ce = jmap("name" -> c.name, "data_type" -> c.dataType)
      c.description.foreach(d => ce.put("description", d))
      if (c.tests.nonEmpty) ce.put("tests", c.tests.map(testNode).asJava)
      ce
    }.asJava)
    val dir = Paths.get(projectDir, "models", schemaName)
    Files.createDirectories(dir)
    val out = dir.resolve(s"${doc.name}.yml")
    Files.writeString(out,
      yamlDump(jmap("version" -> 2, "models" -> Seq(entry).asJava)))
    out
  }

  /** `models/sources.yml` — write_sources_yml: source name/schema,
    * table list, optional freshness thresholds (seconds).
    */
  def writeSourcesYml(projectDir: String, doc: SourceDoc): Path = {
    val tables = doc.tables.map { t =>
      val te = jmap("name" -> t.name)
      t.description.foreach(d => te.put("description", d))
      t.loadedAtField.foreach(f => te.put("loaded_at_field", f))
      te
    }.asJava
    val src = jmap("name" -> doc.name, "schema" -> doc.schema, "tables" -> tables)
    if (doc.freshness.nonEmpty)
      src.put("freshness", jmap(doc.freshness.toSeq.sortBy(_._1).map {
        case (k, v) => k -> (v: Any)
      }: _*))
    val dir = Paths.get(projectDir, "models")
    Files.createDirectories(dir)
    val out = dir.resolve("sources.yml")
    Files.writeString(out,
      yamlDump(jmap("version" -> 2, "sources" -> Seq(src).asJava)))
    out
  }

  // ---------------------------------------------------------------
  // parse
  // ---------------------------------------------------------------

  private def asMap(o: Any): Map[String, Any] = o match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> (v: Any) }.toMap
    case other => throw new IllegalArgumentException(s"expected mapping, got $other")
  }

  private def asList(o: Any): Seq[Any] = o match {
    case l: java.util.List[_] => l.asScala.toSeq
    case null => Nil
    case other => throw new IllegalArgumentException(s"expected sequence, got $other")
  }

  private def parseTest(node: Any): TestSpec = node match {
    case "not_null" => NotNullT
    case "unique" => UniqueT
    case m: java.util.Map[_, _] =>
      asMap(m).toSeq match {
        case Seq(("accepted_values", body)) =>
          AcceptedValuesT(asList(asMap(body)("values")).map(_.toString))
        case Seq(("relationships", body)) =>
          val b = asMap(body)
          RelationshipsT(b("to").toString, b("field").toString)
        case other =>
          throw new IllegalArgumentException(s"unknown test: $other")
      }
    case other => throw new IllegalArgumentException(s"unknown test: $other")
  }

  /** Parse a model .yml back into docs — the consuming half of the
    * round-trip (dbt's schema-file load).
    */
  def parseModelYml(text: String): Seq[ModelDoc] = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](text))
    require(root.get("version").map(_.toString).contains("2"),
      s"expected version: 2 schema file, got ${root.get("version")}")
    asList(root.getOrElse("models", Nil)).map { m0 =>
      val m = asMap(m0)
      ModelDoc(
        name = m("name").toString,
        description = m.get("description").map(_.toString),
        config = m.get("config").map(asMap(_).map { case (k, v) =>
          k -> v.toString
        }).getOrElse(Map.empty),
        columns = asList(m.getOrElse("columns", Nil)).map { c0 =>
          val c = asMap(c0)
          ColumnDoc(
            name = c("name").toString,
            dataType = c.getOrElse("data_type", "").toString,
            description = c.get("description").map(_.toString),
            tests = asList(c.getOrElse("tests", Nil)).map(parseTest))
        })
    }
  }

  /** Parse a sources.yml back into docs. */
  def parseSourcesYml(text: String): Seq[SourceDoc] = {
    val root = asMap(new org.yaml.snakeyaml.Yaml().load[Any](text))
    asList(root.getOrElse("sources", Nil)).map { s0 =>
      val s = asMap(s0)
      SourceDoc(
        name = s("name").toString,
        schema = s.getOrElse("schema", "").toString,
        tables = asList(s.getOrElse("tables", Nil)).map { t0 =>
          val t = asMap(t0)
          SourceTableDoc(t("name").toString,
            t.get("description").map(_.toString),
            t.get("loaded_at_field").map(_.toString))
        },
        freshness = s.get("freshness").map(asMap(_).map { case (k, v) =>
          k -> v.toString.toLong
        }).getOrElse(Map.empty))
    }
  }

  // ---------------------------------------------------------------
  // lower onto Checks
  // ---------------------------------------------------------------

  /** Declared tests → an executable `Checks.run` config. `resolve`
    * turns a `to:` reference (`source('s','t')` / `ref('m')`) into
    * the parent frame — the same indirection SqlModels.compile uses.
    */
  def testsConfig(
      doc: ModelDoc,
      resolve: String => DataFrame): Map[String, Seq[Checks.CheckSpec]] =
    doc.columns.filter(_.tests.nonEmpty).map { c =>
      c.name -> c.tests.map {
        case NotNullT => Checks.NotNull
        case UniqueT => Checks.Unique
        case AcceptedValuesT(vs) => Checks.AcceptedValues(vs)
        case RelationshipsT(to, field) => Checks.Relationships(resolve(to), field)
      }
    }.toMap
}
