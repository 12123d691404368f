package graft

import org.scalatest.funsuite.AnyFunSuite

/** Systematic scale-guard over the WHOLE registry: every registered
  * query must plan successfully at sf0.001 and must never plan a
  * CartesianProduct — the one join strategy that cannot survive a
  * corpus-sized input on either side. (Blessed broadcast-1-row scalar
  * combines plan as BroadcastNestedLoopJoin, which is allowed; a true
  * CartesianProduct appears only when Spark must pair two non-broadcast
  * sides, i.e. when somebody's join lost its keys.) Construction-time
  * side effects (session-materialized artifacts) run at sf0.001, so the
  * guard costs planning time, not execution time.
  */
class PlanGuardSpec extends SparkSpec {

  test("every registered query plans, and none plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val cartesian = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) cartesian += name
      } catch {
        case e: Throwable => failures += s"$name: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, s"queries that failed to plan: $failures")
    assert(cartesian.isEmpty,
      s"queries planning a CartesianProduct (keyless join at corpus scale): $cartesian")
  }
}
