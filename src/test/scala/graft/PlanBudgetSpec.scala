package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.dev.PlanBudget

/** The plan-shape budget sweep (round-9 VERDICT #8): every registered
  * query's pre-AQE physical plan must carry EXACTLY the committed number
  * of shuffle exchanges / broadcast exchanges / sorts / nested-loop joins
  * (`src/test/resources/plan_budget.tsv`). Any drift — a regression OR an
  * improvement — fails here, so plan changes are always a reviewed diff
  * of the budget file, never a silent property of the binary:
  * regenerate with `sbt 'runMain graft.dev.PlanBudget'` and commit.
  */
class PlanBudgetSpec extends AnyFunSuite {
  lazy val spark = Tables.localSession("plan-budget-spec", cores = 8)

  test("every query's plan-node counts match the committed budget exactly") {
    val budget = PlanBudget.load()
    val actual = PlanBudget.measure(spark).toMap

    val missing = (actual.keySet -- budget.keySet).toSeq.sorted
    val stale = (budget.keySet -- actual.keySet).toSeq.sorted
    val drifted = actual.toSeq.sortBy(_._1).collect {
      case (n, c) if budget.contains(n) && budget(n) != c =>
        s"$n: budget=${budget(n)} actual=$c"
    }
    val failures =
      missing.map(n => s"$n: NEW query, no committed budget") ++
        stale.map(n => s"$n: stale budget entry (query no longer exists)") ++
        drifted
    assert(failures.isEmpty,
      "plan budget drift (regenerate via sbt 'runMain graft.dev.PlanBudget' " +
        "and review the diff):\n  " + failures.mkString("\n  "))
    // sentinel rows (construction failures) must never be committed
    assert(!budget.valuesIterator.exists(_.shuffles < 0),
      "committed budget contains a -1 sentinel row — the query failed to " +
        "construct when the budget was generated")
  }
}
