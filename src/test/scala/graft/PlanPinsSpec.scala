package graft

/** Plan-shape pins for claims that live in query comments: a Spark
  * upgrade (or an innocent-looking query edit) must not silently
  * regress an optimized physical shape the 100 TB story depends on.
  * Style follows RangeJoinSpec's no-BNLJ pin: assert on the physical
  * plan string of the REGISTERED query. */
class PlanPinsSpec extends SparkSpec {

  test("tfidf_topk's rank<=3 cut compiles to WindowGroupLimit (partial " +
      "per-group top-k before the exchange, not a full per-doc sort)") {
    // the claim at TrainingQueries' tfidf comment: row_number over
    // (doc_id) filtered to rank<=3 triggers Spark's WindowGroupLimit
    // rewrite — each map task keeps only 3 rows per doc before the
    // window exchange, so the shuffle carries ~3·docs rows instead of
    // every (doc, token) score
    val df = SparkEntry.queries("tfidf_topk")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=3 no longer compiles to WindowGroupLimit:\n$plan")
    // both the partial (pre-exchange) and final passes are present
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 2,
      s"expected partial+final WindowGroupLimit passes:\n$plan")
  }
}
