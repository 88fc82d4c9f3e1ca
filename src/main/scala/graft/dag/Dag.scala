package graft.dag

import org.apache.spark.sql.DataFrame

/** DAG orchestration — the reference's dependency graph with
  * topological execution and cycle detection (datanika
  * `services/dependency_service.py`, `services/dependency_check.py`,
  * `tasks/dependency_helpers.py`; the UI's DAG page executes
  * pipelines/transformations in topological order).
  *
  * Models are lazy DataFrame builders, so "executing" the DAG
  * composes ONE Catalyst plan across all models — the optimizer sees
  * through model boundaries (this is what dbt's ephemeral
  * materialization approximates with CTE inlining, and it is the
  * reason a 12-model pipeline doesn't write 11 intermediate tables).
  */
object Dag {
  final case class Model(
      name: String,
      deps: Seq[String],
      build: Map[String, DataFrame] => DataFrame)

  final class CycleError(msg: String) extends RuntimeException(msg)

  /** Kahn's algorithm; deterministic (name-ordered) among ready
    * nodes. Throws CycleError naming the cycle participants.
    */
  def topoSort(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    models.foreach { m =>
      m.deps.foreach { d =>
        require(byName.contains(d), s"model ${m.name} depends on unknown model $d")
      }
    }
    var inDeg = models.map(m => m.name -> m.deps.size).toMap
    val dependents = models
      .flatMap(m => m.deps.map(d => d -> m.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val order = scala.collection.mutable.ArrayBuffer.empty[Model]
    var ready = models.filter(m => inDeg(m.name) == 0).map(_.name).sorted.toList
    while (ready.nonEmpty) {
      val n = ready.head
      ready = ready.tail
      order += byName(n)
      for (dep <- dependents.getOrElse(n, Nil).sorted) {
        val d = inDeg(dep) - 1
        inDeg += dep -> d
        if (d == 0) ready = (dep :: ready).sorted
      }
    }
    if (order.size != models.size) {
      val stuck = models.map(_.name).filterNot(order.map(_.name).toSet)
      throw new CycleError(s"dependency cycle among: ${stuck.sorted.mkString(", ")}")
    }
    order.toSeq
  }

  /** Build every model in topological order; returns name -> frame.
    * Frames stay lazy — callers materialize only the sinks they need.
    */
  def run(models: Seq[Model], inputs: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] = {
    topoSort(models).foldLeft(inputs) { (built, m) =>
      built + (m.name -> m.build(built))
    }
  }
}
