package graft

import graft.queries.TrainingQueries

/** Pins quota_sample's edge contract (r16 verdict task #8): quotas
  * are `least(hamilton_alloc, n)`, and that one cap is exact in every
  * regime — K > corpus returns the WHOLE corpus (every stratum caps
  * at its population; no seat is lost to a phantom quota), while for
  * K ≤ corpus the cap provably never binds, so the capped query is
  * byte-identical to the original uncapped Hamilton apportionment
  * and fills the budget exactly. */
class QuotaSampleSpec extends SparkSpec {

  // 3 strata with populations 5 / 3 / 2 — small enough to reason
  // about by hand, imbalanced enough that remainders differ
  private def corpus = {
    import spark.implicits._
    (Seq.tabulate(5)(i => (i.toLong, "en")) ++
      Seq.tabulate(3)(i => (100L + i, "de")) ++
      Seq.tabulate(2)(i => (200L + i, "fr")))
      .toDF("doc_id", "lang")
  }

  test("K > corpus size: every stratum's quota caps at its " +
      "population and the sample is exactly the whole corpus, each " +
      "doc once") {
    val out = TrainingQueries.quotaSample(corpus, 25).collect()
    assert(out.length === 10, s"expected the whole 10-doc corpus")
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === 10,
      "a doc was sampled twice")
    val byLang = out.groupBy(_.getAs[String]("lang"))
      .map { case (l, rows) =>
        l -> (rows.length,
          rows.map(_.getAs[Long]("k_alloc")).distinct.toSeq)
      }
    assert(byLang("en") === ((5, Seq(5L))), s"en: ${byLang("en")}")
    assert(byLang("de") === ((3, Seq(3L))), s"de: ${byLang("de")}")
    assert(byLang("fr") === ((2, Seq(2L))), s"fr: ${byLang("fr")}")
  }

  test("K = corpus size: zero remainders, every quota is exactly the " +
      "population") {
    val out = TrainingQueries.quotaSample(corpus, 10).collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === 10)
  }

  test("K < corpus size: the cap never binds — quotas equal the " +
      "uncapped Hamilton apportionment and the budget fills exactly") {
    // independent re-derivation of Hamilton for K = 6 over (5, 3, 2):
    // base = floor(6*n/10) = (3, 1, 1), sum 5, one leftover seat to
    // the largest remainder: rem = (6n mod 10) = (0, 8, 2) -> de
    val out = TrainingQueries.quotaSample(corpus, 6).collect()
    assert(out.length === 6, "budget must fill exactly when K <= N")
    val kByLang = out.groupBy(_.getAs[String]("lang"))
      .map { case (l, rows) => l ->
        (rows.length.toLong, rows.map(_.getAs[Long]("k_alloc")).head) }
    assert(kByLang("en") === ((3L, 3L)))
    assert(kByLang("de") === ((2L, 2L)))
    assert(kByLang("fr") === ((1L, 1L)))
    // picked rows are the per-stratum TOP-k_alloc draws: ranks are a
    // prefix 1..k_alloc within each stratum
    out.groupBy(_.getAs[String]("lang")).foreach { case (l, rows) =>
      val rks = rows.map(_.getAs[Long]("rk")).sorted.toSeq
      assert(rks === (1L to rks.length).toSeq,
        s"$l ranks are not a 1..k prefix: $rks")
    }
  }
}
