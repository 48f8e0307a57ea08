package graft

import graft.tools.ElisionAudit

/** Pins the count()-elision set (r15 verdict task #5): Bench times
  * queries via `df.count()`, and Spark's duplicate-agnostic outer-join
  * elimination silently drops subtrees behind a left join to a
  * unique-keyed aggregate from that plan — so a count()-timed bench
  * row measures only the surviving side. The 16 shapes where that
  * happens are KNOWN and carry a full-materialization bench column;
  * this suite fails when a NEW query joins the set (add it to the
  * expected list CONSCIOUSLY — its bench row under-measures and its
  * full row is the instrument) or when a listed query leaves it
  * (delete it here and celebrate: its count() timing became honest).
  */
class ElisionPinSpec extends SparkSpec {

  /** The documented count()-elided set, r15 SCALE.md + Bench
    * scaladoc. r18 added the three pair-overlap rows whose
    * zero-overlap LEFT joins (r17 ADVICE) are row-preserving over
    * unique-keyed aggregates — count() elides the joined branch
    * (the exact audit / n_match side), so their full rows are the
    * honest bench instrument. r20 adds kmv_pair_from_table — the
    * persisted-table twin of kmv_pair_estimate, elided for the same
    * row-preserving n_match LEFT join. */
  private val documented = Set(
    "ann_ndcg_report", "ann_recall_pq", "ann_recall_report",
    "ann_recall_trained", "containment_survivors", "decontaminate",
    "dedup_span_trim", "dup_span_report", "heaps_law",
    "ivf_probe_sweep", "minhash_calibration", "quality_dup_crosstab",
    "semantic_dedup", "simhash_calibration", "t_closeness_report",
    "vocab_coverage",
    "hll_pair_overlap", "kmv_pair_overlap", "kmv_pair_estimate",
    "kmv_pair_from_table")

  test("every registered query's plan audits cleanly and the " +
      "count()-elided set equals the documented 20 — a new elided " +
      "query must not ship a silently partial bench row") {
    val rows = ElisionAudit.audit(spark, sf0001)
    assert(rows.size === SparkEntry.queries.size)
    val broken = rows.collect { case (n, -1, -1) => n }
    assert(broken.isEmpty,
      s"queries whose construction/optimization threw: $broken")
    val elided = rows.collect { case (n, f, c) if c < f => n }.toSet
    val joined = (elided -- documented).toSeq.sorted
    val left = (documented -- elided).toSeq.sorted
    assert(joined.isEmpty && left.isEmpty,
      s"elision set drifted — newly elided: $joined; no longer " +
        s"elided: $left. Update the documented list, Bench scaladoc " +
        "and SCALE.md together.")
  }
}
