package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** Pins [[AsofJoin.backward]]: latest at-or-before match per key,
  * inclusive tie rule (a right row AT the left row's time matches),
  * null-key/null-time semantics, the tolerance bound, and a brute-force
  * cross-check on a pseudo-random dataset so the window formulation is
  * verified against the quadratic definition it replaces.
  */
class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def join(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, String)],
      tol: Option[Long] = None) = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("rk", "rt", "v")
    AsofJoin.backward(l, r, l("k"), r("rk"), l("t"), r("rt"),
        payload = Seq("v" -> r("v")),
        matchedTimeCol = Some("mt"),
        tolerance = tol.map(lit(_)))
      .select("id", "v", "mt")
      .as[(Long, Option[String], Option[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
  }

  test("latest at-or-before right row matches; ties are inclusive; " +
      "earlier-than-all lefts get null") {
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
    val out = join(Seq(
      (100L, 1L, 5L),   // before any right row for k=1
      (101L, 1L, 10L),  // exactly AT the first right row: inclusive
      (102L, 1L, 19L),  // between: latest at-or-before is t=10
      (103L, 1L, 25L),  // after both: t=20 wins
      (104L, 2L, 15L),  // other key, tie again
      (105L, 3L, 99L)), // key with no right rows at all
      right)
    assert(out === Map(
      100L -> ((None, None)),
      101L -> ((Some("a"), Some(10L))),
      102L -> ((Some("a"), Some(10L))),
      103L -> ((Some("b"), Some(20L))),
      104L -> ((Some("c"), Some(15L))),
      105L -> ((None, None))))
  }

  test("null-keyed or null-timed right rows match nobody; null-keyed " +
      "left rows survive with a null match") {
    val l = Seq((1L, Option(1L), Option(10L)), (2L, None, Option(10L)),
      (3L, Option(1L), None)).toDF("id", "k", "t")
    val r = Seq((Option(1L), Option(5L), "ok"), (None, Option(1L), "nullk"),
      (Option(1L), None, "nullt")).toDF("rk", "rt", "v")
    val out = AsofJoin.backward(l, r, l("k"), r("rk"), l("t"), r("rt"),
        payload = Seq("v" -> r("v")))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    // id=1: only the non-null right row matches; id=2: null key → no
    // partition mate; id=3: null time sorts first → nothing before it
    assert(out === Map(1L -> Some("ok"), 2L -> None, 3L -> None))
  }

  test("tolerance drops matches older than leftTime - tol") {
    val right = Seq((1L, 10L, "a"))
    val out = join(
      Seq((1L, 1L, 12L), (2L, 1L, 30L)), right, tol = Some(5L))
    // t=12: age 2 ≤ 5 keeps the match; t=30: age 20 > 5 drops it
    assert(out === Map(
      1L -> ((Some("a"), Some(10L))),
      2L -> ((None, None))))
  }

  test("matches the brute-force quadratic definition on a " +
      "pseudo-random dataset") {
    // deterministic LCG so the case is reproducible
    var seed = 12345L
    def next(mod: Long): Long = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      math.floorMod(seed >>> 16, mod)
    }
    val left = (0 until 300).map(i => (i.toLong, next(7), next(1000)))
    val right = (0 until 120)
      .map(i => (next(7), next(1000), s"v$i"))
    val expected = left.map { case (id, k, t) =>
      val cand = right.filter(r => r._1 == k && r._2 <= t)
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(r => (r._2, r._3.drop(1).toInt)))
      // tie-break inside equal (k, t): the window keeps the LAST right
      // row in sort order; make expectation deterministic by dropping
      // ids whose best time is shared by two right rows
      id -> best
    }.filter { case (_, best) => best match {
      case Some((k, t, _)) => right.count(r => r._1 == k && r._2 == t) == 1
      case None => true
    }}.map { case (id, b) => id -> ((b.map(_._3), b.map(_._2))) }.toMap
    val got = join(left, right).filter(kv => expected.contains(kv._1))
    assert(got === expected)
  }

  private def joinF(
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, String)],
      tol: Option[Long] = None) = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("rk", "rt", "v")
    AsofJoin.forward(l, r, l("k"), r("rk"), l("t"), r("rt"),
        payload = Seq("v" -> r("v")),
        matchedTimeCol = Some("mt"),
        tolerance = tol.map(lit(_)))
      .select("id", "v", "mt")
      .as[(Long, Option[String], Option[Long])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
  }

  test("forward: earliest at-or-after right row matches; ties are " +
      "inclusive; later-than-all lefts get null") {
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "c"))
    val out = joinF(Seq(
      (100L, 1L, 5L),   // before both: earliest at-or-after is t=10
      (101L, 1L, 10L),  // exactly AT a right row: inclusive
      (102L, 1L, 11L),  // between: t=20 is next
      (103L, 1L, 25L),  // after all right rows for k=1
      (104L, 2L, 15L),  // other key, tie again
      (105L, 3L, 1L)),  // key with no right rows at all
      right)
    assert(out === Map(
      100L -> ((Some("a"), Some(10L))),
      101L -> ((Some("a"), Some(10L))),
      102L -> ((Some("b"), Some(20L))),
      103L -> ((None, None)),
      104L -> ((Some("c"), Some(15L))),
      105L -> ((None, None))))
  }

  test("forward: null-timed left rows match nothing (they sort first, " +
      "where the following frame would otherwise hand them the " +
      "earliest right row)") {
    val l = Seq((1L, Option(1L), Option(3L)), (2L, Option(1L), None),
      (3L, None, Option(3L))).toDF("id", "k", "t")
    val r = Seq((Option(1L), Option(5L), "ok"), (Option(1L), None, "nullt"))
      .toDF("rk", "rt", "v")
    val out = AsofJoin.forward(l, r, l("k"), r("rk"), l("t"), r("rt"),
        payload = Seq("v" -> r("v")))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> Some("ok"), 2L -> None, 3L -> None))
  }

  test("forward: tolerance drops matches further ahead than " +
      "leftTime + tol") {
    val right = Seq((1L, 10L, "a"))
    val out = joinF(
      Seq((1L, 1L, 8L), (2L, 1L, 2L)), right, tol = Some(5L))
    // t=8: 2 ahead ≤ 5 keeps it; t=2: 8 ahead > 5 drops it
    assert(out === Map(
      1L -> ((Some("a"), Some(10L))),
      2L -> ((None, None))))
  }

  test("forward matches the brute-force quadratic definition on a " +
      "pseudo-random dataset") {
    var seed = 54321L
    def next(mod: Long): Long = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      math.floorMod(seed >>> 16, mod)
    }
    val left = (0 until 300).map(i => (i.toLong, next(7), next(1000)))
    val right = (0 until 120)
      .map(i => (next(7), next(1000), s"v$i"))
    val expected = left.map { case (id, k, t) =>
      val cand = right.filter(r => r._1 == k && r._2 >= t)
      val best = if (cand.isEmpty) None
        else Some(cand.minBy(r => (r._2, r._3.drop(1).toInt)))
      id -> best
    }.filter { case (_, best) => best match {
      case Some((k, t, _)) => right.count(r => r._1 == k && r._2 == t) == 1
      case None => true
    }}.map { case (id, b) => id -> ((b.map(_._3), b.map(_._2))) }.toMap
    val got = joinF(left, right).filter(kv => expected.contains(kv._1))
    assert(got === expected)
  }

  test("output-name collisions fail fast at the call site, not " +
      "ambiguously downstream") {
    val l = Seq((1L, 1L, 10L)).toDF("id", "k", "t")
    val r = Seq((1L, 5L, "x")).toDF("rk", "rt", "v")
    // payload name shadows a left column
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.backward(l, r, l("k"), r("rk"), l("t"), r("rt"),
        payload = Seq("id" -> r("v")))
    }
    assert(e1.getMessage.contains("id"))
    // matchedTimeCol shadows a left column
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.backward(l, r, l("k"), r("rk"), l("t"), r("rt"),
        payload = Seq("v" -> r("v")), matchedTimeCol = Some("t"))
    }
    assert(e2.getMessage.contains("t"))
    // two payloads under one name
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.backward(l, r, l("k"), r("rk"), l("t"), r("rt"),
        payload = Seq("v" -> r("v"), "v" -> r("rt")))
    }
    assert(e3.getMessage.contains("duplicate"))
  }
}
