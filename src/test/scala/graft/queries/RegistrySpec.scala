package graft.queries

import graft.SparkSpec

/** Smoke-level guardrails for the driver contract; value-level checks
  * are the DuckDB oracle gate (tools/selfcheck.py). */
class RegistrySpec extends SparkSpec {
  test("no duplicate names; every oracle key has a query") {
    assert(Registry.byName.size == Registry.all.size)
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001 and probe-only ones are empty by design") {
    val emptyByDesign = Set("q06_schema_probe", "q16_anti_join", "q17_except")
    Registry.all.foreach { q =>
      val n = q.run(spark, sf0001).count()
      assert(n >= 0, s"${q.name} failed")
      if (!emptyByDesign.contains(q.name))
        assert(n > 0, s"${q.name} returned 0 rows")
    }
  }
}
