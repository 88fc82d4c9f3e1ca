package graft.dag

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.types.StructType

/** Column-level lineage for SQL-text models — the dbt-docs surface
  * (dbt's catalog/docs generate renders exactly this: which SOURCE
  * columns feed each model column, across ref()/source() hops).
  * Reference scope: datanika's dependency service tracks model-level
  * edges; this refines them to column granularity, derived from the
  * ANALYZED Catalyst plan rather than SQL text parsing — expression
  * semantics (aliases, CASE arms, aggregates, window frames, UNION
  * positional merge) come from the same resolver that will execute
  * the query, so the lineage cannot disagree with execution.
  *
  * Method: each model's compiled SQL is ANALYZED (never executed)
  * against schema-only temp views — planning is a driver-side,
  * metadata-only operation, so lineage over a 100 TB warehouse costs
  * zero data access. Walking the plan bottom-up, every attribute's
  * ExprId maps to the set of (sourceTable, sourceColumn) leaves it
  * transitively references; model→model hops resolve through the
  * upstream model's already-computed output lineage (models are
  * processed in topological order).
  *
  * Scope: Project/Aggregate/Window expression nodes introduce
  * edges; Filter/Join/Sort/Limit/Distinct/SubqueryAlias pass
  * attributes through unchanged (Catalyst preserves ExprIds there);
  * Union merges children BY POSITION. Predicate-only references
  * (a WHERE column that never reaches the output) are intentionally
  * excluded — dbt-docs lineage is projection lineage.
  */
object Lineage {

  /** model.column ← srcTable.srcColumn */
  final case class Edge(model: String, column: String,
      srcTable: String, srcColumn: String)

  private type Lin = Map[Long, Set[(String, String)]]

  private def exprLineage(ne: NamedExpression, child: Lin): Set[(String, String)] =
    ne.references.iterator.flatMap(a => child.getOrElse(a.exprId.id, Set.empty)).toSet

  private def merge(ms: Seq[Lin]): Lin =
    ms.foldLeft(Map.empty: Lin) { (acc, m) =>
      m.foldLeft(acc) { case (a, (k, v)) =>
        a.updated(k, a.getOrElse(k, Set.empty) ++ v)
      }
    }

  /** Attribute→sources map for one analyzed plan. `sources` maps a
    * relation (view) name to the table name it represents;
    * `modelOuts` maps an upstream model's relation name to its
    * per-column lineage.
    */
  private def planLineage(
      plan: LogicalPlan,
      sources: Map[String, String],
      modelOuts: Map[String, Map[String, Set[(String, String)]]]): Lin =
    plan match {
      case s: SubqueryAlias if sources.contains(s.alias) =>
        val table = sources(s.alias)
        s.output.map(a => a.exprId.id -> Set((table, a.name))).toMap
      case s: SubqueryAlias if modelOuts.contains(s.alias) =>
        val up = modelOuts(s.alias)
        s.output.map(a => a.exprId.id -> up.getOrElse(a.name, Set.empty)).toMap
      case p: Project =>
        val child = merge(p.children.map(planLineage(_, sources, modelOuts)))
        child ++ p.projectList.map(ne => ne.exprId.id -> exprLineage(ne, child))
      case a: Aggregate =>
        val child = merge(a.children.map(planLineage(_, sources, modelOuts)))
        child ++ a.aggregateExpressions.map(ne => ne.exprId.id -> exprLineage(ne, child))
      case w: Window =>
        val child = merge(w.children.map(planLineage(_, sources, modelOuts)))
        child ++ w.windowExpressions.map(ne => ne.exprId.id -> exprLineage(ne, child))
      case u: Union =>
        val childMaps = u.children.map(planLineage(_, sources, modelOuts))
        val byPos = u.output.zipWithIndex.map { case (a, i) =>
          val srcs = u.children.zip(childMaps).flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId.id, Set.empty)
          }.toSet
          a.exprId.id -> srcs
        }
        merge(childMaps) ++ byPos
      case other =>
        // pass-through nodes (Filter/Join/Sort/Limit/Distinct/View/
        // CTE shells): attributes keep their ExprIds, so the merged
        // child map already covers `other.output`
        merge(other.children.map(planLineage(_, sources, modelOuts)))
    }

  /** Column lineage for a topo-ordered model set. Registers
    * schema-only temp views for every source and every model output
    * (analysis needs resolvable relations, never data), then walks
    * each analyzed plan. Returns edges sorted (model, column,
    * srcTable, srcColumn).
    *
    * @param models       in dependency order (upstream first) —
    *                     enforced via SqlModels.refs
    * @param sourceSchema schema for each (schema, table) source
    */
  def columnLineage(
      spark: SparkSession,
      models: Seq[SqlModels.SqlModel],
      sourceSchema: Map[(String, String), StructType]): Seq[Edge] = {
    val seen = scala.collection.mutable.Set.empty[String]
    models.foreach { m =>
      SqlModels.refs(m.sql).foreach { r =>
        require(seen.contains(r),
          s"model ${m.name} refs '$r' before it is defined — pass models upstream-first")
      }
      seen += m.name
    }

    def emptyView(name: String, schema: StructType): Unit =
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)
        .createOrReplaceTempView(name)

    val srcRelations: Map[String, String] = sourceSchema.map {
      case ((sch, tbl), st) =>
        val rel = SqlModels.sourceRelation(sch, tbl)
        emptyView(rel, st)
        rel -> s"$sch.$tbl"
    }

    var modelOuts = Map.empty[String, Map[String, Set[(String, String)]]]
    val edges = Seq.newBuilder[Edge]
    models.foreach { m =>
      val df = spark.sql(SqlModels.compile(m.sql))
      val analyzed = df.queryExecution.analyzed
      val lin = planLineage(analyzed, srcRelations, modelOuts)
      val outCols = analyzed.output.map { a =>
        val srcs = lin.getOrElse(a.exprId.id, Set.empty)
        srcs.foreach { case (t, c) => edges += Edge(m.name, a.name, t, c) }
        a.name -> srcs
      }.toMap
      modelOuts += (SqlModels.relation(m.name) -> outCols)
      // register the model's OUTPUT as a schema-only view so
      // downstream compiled SQL resolves — analysis only, no data
      emptyView(SqlModels.relation(m.name), df.schema)
    }
    edges.result().sortBy(e => (e.model, e.column, e.srcTable, e.srcColumn))
  }

  /** Edges as a DataFrame (model, column, src_table, src_column). */
  def toDF(spark: SparkSession, edges: Seq[Edge]): DataFrame = {
    import spark.implicits._
    edges.toDF("model", "column", "src_table", "src_column")
  }

  /** PII taint propagation — governance over the lineage graph:
    * declare which SOURCE columns hold PII, and every model column
    * whose (already-transitive) source set touches one is tainted —
    * the "which report columns secretly carry names" audit that
    * makes q55/q146/q208 actionable downstream of the raw tables.
    * Projection-lineage caveat applies: a column DERIVED only
    * through a predicate is not flagged (documented in the class
    * header — dbt-docs semantics).
    *
    * @return (model, column, tainted, pii_sources) for every model
    *   column, pii_sources the sorted comma-joined offenders.
    */
  def taint(edges: Seq[Edge],
      pii: Set[(String, String)]): Seq[(String, String, Boolean, String)] =
    edges.groupBy(e => (e.model, e.column)).toSeq.map { case ((m, c), es) =>
      val hits = es.collect {
        case e if pii((e.srcTable, e.srcColumn)) =>
          s"${e.srcTable}.${e.srcColumn}"
      }.distinct.sorted
      (m, c, hits.nonEmpty, hits.mkString(","))
    }.sortBy(t => (t._1, t._2))
}
