package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val facts = Seq(
    (1L, Some(10.0), Some("a")),
    (2L, Some(60.0), Some("b")),  // out of [0, 50]
    (3L, Option.empty[Double], Some("c")), // null value: fails range too
    (3L, Some(20.0), Option.empty[String]) // dup id, null name
  ).toDF("id", "v", "name")

  private val dim = Seq(1L, 2L, 3L).toDF("pk")

  test("verdicts: exact count ratios, both pass and fail, long format") {
    val out = DataQuality.runChecks(facts, Seq(
        Completeness("complete_name", "name"),
        Completeness("mostly_complete_name", "name", minRatio = 0.7),
        InRange("range_v", "v", 0, 50),
        Uniqueness("unique_id", Seq("id"))))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(out("complete_name") === ((0.75, false)))
    assert(out("mostly_complete_name") === ((0.75, true)))
    assert(out("range_v") === ((0.5, false))) // null + 60.0 fail
    assert(out("unique_id") === ((0.75, false))) // 3 distinct / 4 rows
  }

  test("referential integrity: non-null FKs against the dimension, nulls excluded") {
    val orders = Seq(Some(1L), Some(1L), Some(99L), Option.empty[Long])
      .toDF("fk")
    val out = DataQuality.runChecks(orders, Seq(
        ReferentialIntegrity("ref", "fk", dim, "pk", minRatio = 0.9)))
      .collect().head
    // 2 of 3 non-null FKs resolve; the null row is not FK evidence
    assert(out.getDouble(1) === 2.0 / 3.0)
    assert(!out.getBoolean(2))
  }

  test("empty frame: ratios pass vacuously (1.0, never NULL/NaN); MinRows is the emptiness gate") {
    val empty = facts.filter(col("id") < 0)
    val out = DataQuality.runChecks(empty, Seq(
        Completeness("c", "name"), InRange("r", "v", 0, 50),
        Uniqueness("u", Seq("id")),
        ReferentialIntegrity("f", "id", dim, "pk"),
        MinRows("nonempty", 1L)))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getBoolean(2)))).toMap
    // every ratio is a definite 1.0/true — no 0/0 NaN, no NULL verdict
    assert(out("c") === ((1.0, true)) && out("r") === ((1.0, true)))
    assert(out("u") === ((1.0, true)) && out("f") === ((1.0, true)))
    // ...and the check that actually owns emptiness fails loudly
    assert(out("nonempty") === ((0.0, false)))
    val ok = DataQuality.runChecks(facts, Seq(MinRows("enough", 4L)))
      .collect().head
    assert(ok.getDouble(1) === 4.0 && ok.getBoolean(2))
  }

  test("validation: duplicate names and empty suites rejected") {
    intercept[IllegalArgumentException](
      DataQuality.runChecks(facts, Seq.empty))
    intercept[IllegalArgumentException](
      DataQuality.runChecks(facts, Seq(
        Completeness("x", "name"), InRange("x", "v", 0, 1))))
  }
}
