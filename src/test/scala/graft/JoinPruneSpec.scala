package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinPrune

/** Bloom semi-join reduction: the pruned join is EXACTLY the plain
  * inner join (no false negatives + exact join removes false
  * positives), the prune keeps a superset of the true matches, NULL
  * fact keys prune like inner-join semantics, and the probe runs as a
  * scan-side might_contain — no exchange feeds the filter. */
class JoinPruneSpec extends SparkSpec {
  import spark.implicits._

  private val dim = Seq((2L, "b"), (4L, "d"), (6L, "f"))
    .toDF("dk", "dname")
  private val fact = (1L to 10L).map(i => (i, s"row$i"))
    .toDF("fk", "payload")
    .union(Seq((null.asInstanceOf[java.lang.Long], "rownull"))
      .toDF("fk", "payload"))

  test("bloomPrunedJoin ≡ the exact inner join, row for row") {
    val pruned = JoinPrune.bloomPrunedJoin(fact, "fk", dim, "dk",
        expectedItems = 100)
      .select("fk", "payload", "dk", "dname")
      .collect().map(_.toSeq).sortBy(_.toString)
    val exact = fact.join(dim, fact("fk") === dim("dk"))
      .select("fk", "payload", "dk", "dname")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(pruned.toSeq === exact.toSeq)
    assert(pruned.length === 3)
  }

  test("bloomPrune keeps a superset of the true matches, drops NULL keys") {
    val kept = JoinPrune.bloomPrune(fact, "fk", dim, "dk",
        expectedItems = 100)
      .select("fk").collect().map(_.getLong(0)).toSet
    assert(Set(2L, 4L, 6L).subsetOf(kept)) // no false negatives
    // NULL fact keys cannot inner-join; the prune drops them up front
    val keptPayloads = JoinPrune.bloomPrune(fact, "fk", dim, "dk", 100)
      .select("payload").as[String].collect().toSet
    assert(!keptPayloads.contains("rownull"))
  }

  test("empty dim side prunes everything (constant-false predicate)") {
    val none = JoinPrune.bloomPrune(fact, "fk", dim.filter(lit(false)),
      "dk", expectedItems = 100)
    assert(none.count() === 0)
  }

  test("the probe is a scan-side might_contain, not a join") {
    // a Range-backed fact: LocalRelation fixtures constant-fold
    // through ConvertToLocalRelation and leave no Filter to inspect
    val bigFact = spark.range(1, 1000).toDF("fk")
    val pruned = JoinPrune.bloomPrune(bigFact, "fk", dim, "dk",
      expectedItems = 100)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("might_contain"),
      s"expected a bloom might_contain probe in the plan:\n$plan")
    // the pruned frame's plan has no shuffle at all: the blob is a
    // literal, the filter is narrow over the fact scan
    assert(!plan.contains("Exchange"),
      s"prune must not shuffle the fact side:\n$plan")
  }
}
