package graft

class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("query column names match oracle aliases (sorted-column hash contract)") {
    // cheap structural check: no unaliased aggregate names like sum(value)
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sf).columns
      cols.foreach { c =>
        assert(!c.contains("("), s"$name column '$c' looks unaliased")
      }
    }
  }
}
