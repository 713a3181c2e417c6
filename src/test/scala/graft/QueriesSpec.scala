package graft

/** Registry-level invariants + smoke: every declared query runs at
  * sf0.001 and the contract the driver relies on holds. */
class QueriesSpec extends SparkSpec {

  test("query names are unique and oracle keys are a subset") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes and returns rows at sf0.001") {
    val empties = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    // embedding near-dup pairs may legitimately be sparse at sf0.001, but
    // should not be empty for the rest
    assert(empties.filterNot(_ == "dedup_embedding_cosine").isEmpty,
      s"queries with empty results: $empties")
  }
}
