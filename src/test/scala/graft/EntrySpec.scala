package graft

/** Driver-contract smoke: entry() returns rows on sf0.001, every oracle has
  * a query, and every query runs against the smallest fixture.
  */
class EntrySpec extends SparkSpec {

  test("entry() returns rows > 0 (t1 smoke)") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(0)).contains(0L)) // self-match ranks first
  }

  test("every oracleSql key has a queries twin; oracle coverage never shrinks") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    // a typo'd key silently downgrades a query to rows-only — pin the floor
    // at the round-12 surface (84 oracles / 86 queries)
    assert(SparkEntry.oracleSql.size >= 84, s"oracle count ${SparkEntry.oracleSql.size}")
    assert(SparkEntry.queries.size >= 86, s"query count ${SparkEntry.queries.size}")
  }

  test("all declared queries execute on sf0.001 and return rows") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, Sf0001).count()
      if (n == 0) Some(name) else None
    }
    // events_setops may legitimately be empty at this sf; everything else must
    // produce rows.
    assert(empties.toSet.subsetOf(Set("events_setops")), s"empty results: $empties")
  }
}
