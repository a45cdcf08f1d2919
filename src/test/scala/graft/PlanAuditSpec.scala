package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Design-for-scale audits: filters and projections must reach the
  * parquet scan (pushdown/pruning), aggregates must be partial+final,
  * top-k must compile to TakeOrderedAndProject, and no declared query may
  * plan a cartesian product. */
class PlanAuditSpec extends SparkTestBase {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  test("keyset scan pushes its predicate into the parquet scan (S1)") {
    val plan = executedPlan("s1_keyset_scan")
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("GreaterThan(l_orderkey,300"),
      s"predicate not pushed:\n$plan")
  }

  test("projection prunes the read schema to selected columns (P1)") {
    val plan = executedPlan("p1_projection")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_extendedprice"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipdate"),
      s"scan reads unprojected columns: $readSchema")
  }

  test("q1 aggregate is partial+final (map-side combine before the shuffle)") {
    val plan = executedPlan("q1_agg")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"),
      s"no partial aggregation:\n$plan")
  }

  test("sort+limit compiles to TakeOrderedAndProject (O1/O2)") {
    val plan = executedPlan("o1_sort_limit")
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not optimized:\n$plan")
  }

  test("no declared query plans a cartesian product") {
    // brute-force ANN intentionally broadcasts a tiny query set (a
    // BroadcastNestedLoopJoin over 10 rows); CartesianProduct — a
    // shuffled all-pairs product — must appear nowhere.
    for (name <- SparkEntry.queries.keys if !name.startsWith("transfer")) {
      val plan = executedPlan(name)
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian:\n$plan")
    }
  }

  test("whole-stage codegen covers the hot paths") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(codegen.contains("WholeStageCodegen"), s"q1 not codegen'd:\n$codegen")
  }
}
