package graft.dag

import org.apache.spark.sql.{DataFrame, SparkSession}

/** dbt-style SQL-TEXT models — the reference's primary authoring
  * surface (datanika `services/dbt_project.py:141-191` `write_model`
  * stores models as .sql bodies with a materialization config;
  * `:437-489` `compile_model` resolves `ref()`/`source()` into
  * relations and returns the compiled SQL).
  *
  * A model is a SQL string; its dependencies are declared INLINE via
  * `ref('other_model')` and `source('schema', 'table')` calls and
  * auto-extracted — no hand-maintained dep lists. Execution converts
  * each model into a `Dag.Model` (topo sort, cycle detection, and all
  * four materializations come from Dag for free) whose build step
  * registers every dependency's frame as a temp view and runs the
  * compiled SQL through `spark.sql`.
  *
  * Temp-view indirection keeps dbt's ephemeral semantics: a Spark
  * temp view is a logical plan, so Catalyst inlines it into the
  * reader's plan exactly like dbt inlines an ephemeral model's CTE —
  * a chain of ephemeral SQL models still optimizes as ONE plan
  * (filter pushdown through model boundaries included). Table /
  * incremental deps resolve to the POST-write read-back frame
  * (`Dag.runMaterialized` passes it in `built`), so downstream models
  * read the persisted relation, exactly as dbt does.
  */
object SqlModels {

  final case class SqlModel(
      name: String,
      sql: String,
      materialization: Dag.Materialization = Dag.Ephemeral)

  // braced (Jinja) forms replace including the braces; bare forms
  // replace only the call itself (no whitespace swallowing)
  private val RefBraced = """\{\{\s*ref\(\s*'([^']+)'\s*\)\s*\}\}""".r
  private val RefRe = """ref\(\s*'([^']+)'\s*\)""".r
  private val SourceBraced =
    """\{\{\s*source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)\s*\}\}""".r
  private val SourceRe = """source\(\s*'([^']+)'\s*,\s*'([^']+)'\s*\)""".r

  /** Distinct models referenced via ref('...') in authoring order. */
  def refs(sql: String): Seq[String] =
    RefRe.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct

  /** Distinct (schema, table) pairs referenced via source(...). */
  def sources(sql: String): Seq[(String, String)] =
    SourceRe.findAllMatchIn(sql).map(m => (m.group(1), m.group(2))).toSeq.distinct

  /** Relation a model resolves to (a session temp view). */
  def relation(model: String): String = s"graft_model_$model"

  /** Relation a source table resolves to. */
  def sourceRelation(schema: String, table: String): String =
    s"graft_src_${schema}_$table"

  /** The compiled SQL — ref()/source() calls (with or without Jinja
    * braces) replaced by relation names; the `compiled_code` surface
    * of the reference's compile_model.
    */
  def compile(sql: String): String = {
    val s1 = RefBraced.replaceAllIn(sql, m => relation(m.group(1)))
    val s2 = SourceBraced.replaceAllIn(s1,
      m => sourceRelation(m.group(1), m.group(2)))
    val s3 = RefRe.replaceAllIn(s2, m => relation(m.group(1)))
    SourceRe.replaceAllIn(s3, m => sourceRelation(m.group(1), m.group(2)))
  }

  /** Lower SQL-text models onto the Dag engine. Source views register
    * eagerly (they are leaf inputs); each model's build registers its
    * DEPENDENCIES' frames — which under runMaterialized are the
    * post-write read-back frames — then runs its compiled SQL.
    */
  def toDag(
      spark: SparkSession,
      models: Seq[SqlModel],
      loadSource: (String, String) => DataFrame): Seq[Dag.Model] = {
    models.flatMap(m => sources(m.sql)).distinct.foreach { case (sch, tbl) =>
      loadSource(sch, tbl).createOrReplaceTempView(sourceRelation(sch, tbl))
    }
    models.map { m =>
      val deps = refs(m.sql)
      val compiled = compile(m.sql)
      Dag.Model(m.name, deps, built => {
        deps.foreach(d => built(d).createOrReplaceTempView(relation(d)))
        spark.sql(compiled)
      }, m.materialization)
    }
  }

  /** Build all models lazily (ephemeral everywhere) — one composed
    * Catalyst plan per sink.
    */
  def run(
      spark: SparkSession,
      models: Seq[SqlModel],
      loadSource: (String, String) => DataFrame): Map[String, DataFrame] =
    Dag.run(toDag(spark, models, loadSource))

  /** Build AND persist per materialization (see Dag.runMaterialized). */
  def runMaterialized(
      spark: SparkSession,
      models: Seq[SqlModel],
      warehouseDir: String,
      loadSource: (String, String) => DataFrame,
      fullRefresh: Boolean = false): Map[String, DataFrame] =
    Dag.runMaterialized(spark, toDag(spark, models, loadSource), warehouseDir,
      fullRefresh = fullRefresh)
}
