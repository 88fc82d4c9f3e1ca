package graft.ops

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Right-to-be-forgotten semantics + plan shape (q146). */
class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private val facts = Seq(
    (1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c"), (97L, "x"), (97L, "y"))
    .toDF("uid", "payload")
  // duplicated request id on purpose — must not double-count
  private val requests = Seq(2L, 2L, 97L, 555L).toDF("k")

  it("purge removes every requested key and nothing else") {
    val out = Forget.purge(facts, "uid", requests)
      .select("uid").as[Long].collect().sorted
    out shouldBe Array(1L, 3L)
  }

  it("audit counts before/purged/after and checksums survivors") {
    val a = Forget.audit(Seq(("facts", facts, "uid")), requests).head()
    a.getAs[String]("table_name") shouldBe "facts"
    a.getAs[Long]("rows_before") shouldBe 6L
    a.getAs[Long]("rows_purged") shouldBe 4L
    a.getAs[Long]("rows_after") shouldBe 2L
    a.getAs[Long]("sum_remaining_keys") shouldBe 4L
  }

  it("audit of an untouched table reports zero purged") {
    val clean = Seq((5L, "z")).toDF("uid", "payload")
    val a = Forget.audit(Seq(("clean", clean, "uid")), requests).head()
    a.getAs[Long]("rows_purged") shouldBe 0L
    a.getAs[Long]("rows_after") shouldBe 1L
  }

  it("plans the purge as a broadcast anti-join (fact side never shuffles)") {
    def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: nodes(a.executedPlan)
      case q: QueryStageExec => p +: nodes(q.plan)
      case other => other +: other.children.flatMap(nodes)
    }
    val out = Forget.purge(facts, "uid", requests)
    out.collect()
    val plan = nodes(out.queryExecution.executedPlan)
    plan.collect { case b: BroadcastHashJoinExec => b } should not be empty
  }
}
