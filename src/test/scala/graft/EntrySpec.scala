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
    // at the round-20 surface (142 oracles / 142 queries: every declared
    // query has an oracle twin)
    assert(SparkEntry.oracleSql.size >= 142, s"oracle count ${SparkEntry.oracleSql.size}")
    assert(SparkEntry.queries.size >= 142, s"query count ${SparkEntry.queries.size}")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracles (rows-only): $rowsOnly")
  }

  test("round-13 IVF invariant rows equal the constants their oracles pin") {
    val ivf = SparkEntry.queries("ivf_topk")(spark, Sf0001).collect()
    assert(ivf.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((10L, 1L, 1L)), s"ivf_topk flags: ${ivf.mkString(",")}")
    val sp = SparkEntry.queries("stream_ivf_probe")(spark, Sf0001).collect()
    assert(sp.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((20L, 1L, 1L)), s"stream_ivf_probe flags: ${sp.mkString(",")}")
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
