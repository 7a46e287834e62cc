package graft

/** Guards on the driver contract itself: the flagship entry must return
  * rows (the driver smoke-checks exactly this), and every oracle key
  * must name a real query (a dangling oracle would silently never be
  * checked).
  */
class SparkEntrySpec extends SparkSpec {

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("query names are unique across parity and pipeline maps") {
    import graft.queries.{ParityQueries, PipelineQueries}
    val overlap = ParityQueries.queries.keySet
      .intersect(PipelineQueries.queries.keySet)
    assert(overlap.isEmpty, s"colliding query names: $overlap")
  }
}
