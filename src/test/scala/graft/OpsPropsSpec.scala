package graft

import org.apache.spark.sql.functions._

/** Property pins for the governance/analytics tier — invariants the
  * oracle's value-equality can't articulate: interval algebra for the
  * SCD2 build, quartile balance for RFM, post-salt bounds for the
  * advisor, and the merge-arithmetic identities of cdc_merge.
  */
class OpsPropsSpec extends SparkSpec {

  test("scd2_dimension intervals tile each customer's history: " +
      "versions are contiguous (valid_to = next valid_from), " +
      "exactly one open current row per customer, priorities " +
      "alternate (no same-priority adjacent versions)") {
    import spark.implicits._
    val v = SparkEntry.queries("scd2_dimension")(spark, sf001)
      .select("o_custkey", "version", "priority", "valid_from",
        "valid_to")
      .as[(Long, Int, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().groupBy(_._1)
    assert(v.nonEmpty)
    v.foreach { case (cust, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"customer $cust: version numbering has gaps")
      // exactly one open row, and it is the last version
      assert(sorted.count(_._5.isEmpty) == 1 && sorted.last._5.isEmpty,
        s"customer $cust: open-interval rows wrong")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4),
            s"customer $cust: v${a._2} does not close at v${b._2}'s start")
          assert(a._3 != b._3,
            s"customer $cust: adjacent versions share priority ${a._3} " +
              "— the run-collapse failed")
        case _ =>
      }
    }
  }

  test("rfm_segments quartiles are balanced on every axis (ntile " +
      "law: cell sizes differ by at most 1) and cover all customers") {
    import spark.implicits._
    val cells = SparkEntry.queries("rfm_segments")(spark, sf001)
      .select("r_quartile", "f_quartile", "m_quartile", "n_customers")
      .as[(Int, Int, Int, Long)].collect()
    val total = cells.map(_._4).sum
    val nCust = graft.sources.Tables.orders(spark, sf001)
      .select("o_custkey").distinct().count()
    assert(total === nCust, "segment grid lost or duplicated customers")
    for (axis <- 0 to 2) {
      val byQ = cells.groupBy(c => axis match {
        case 0 => c._1; case 1 => c._2; case 2 => c._3
      }).view.mapValues(_.map(_._4).sum)
      assert(byQ.keySet == Set(1, 2, 3, 4), s"axis $axis: missing quartile")
      assert(byQ.values.max - byQ.values.min <= 1,
        s"axis $axis: ntile balance violated: $byQ")
    }
  }

  test("salt_advisor: every recommended fan-out lands the per-cell " +
      "share at or under the 5 permille target (the ceil-division " +
      "guarantee: salt >= exact_share/5 implies floor(share/salt) " +
      "<= 5)") {
    import spark.implicits._
    val rows = SparkEntry.queries("salt_advisor")(spark, sf001)
      .select("n_events", "permille", "salt_factor", "post_permille")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, pm, salt, post) =>
      assert(salt >= 1)
      assert(post <= 5,
        s"post-salt share $post exceeds the 5 permille target")
      assert(pm >= 7, s"sub-threshold key leaked into the report: $pm")
    }
  }

  test("cdc_merge action counts satisfy the construction arithmetic " +
      "on sf0.01 (deletes = ids%13, updates = %7 minus overlap, " +
      "inserts = %11, total preserved)") {
    import spark.implicits._
    val acts = SparkEntry.queries("cdc_merge")(spark, sf001)
      .select("action", "n_rows").as[(String, Long)].collect().toMap
    val ids = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id").as[Long].collect()
    val d = ids.count(_ % 13 == 0)
    val u = ids.count(i => i % 13 != 0 && i % 7 == 0)
    val ins = ids.count(_ % 11 == 0)
    assert(acts("deleted") === d)
    assert(acts("updated") === u)
    assert(acts("inserted") === ins)
    assert(acts("unchanged") === ids.length - d - u)
  }
}
