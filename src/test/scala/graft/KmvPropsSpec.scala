package graft

import scala.util.Random

import graft.functions.KmvAgg

/** Property-style checks of [[KmvAgg]]'s algebra — the claims the
  * KMV sketch's distributed execution rests on (seeded generator,
  * pure JVM, no Spark jobs):
  *
  *  - the fold of any input stream equals bottom-k of the distinct
  *    set (duplicates and order irrelevant);
  *  - merge is commutative and associative, and merging the folds of
  *    ANY partitioning of the stream equals the fold of the whole —
  *    why a 1000-partition partial aggregate (and the shard-merge /
  *    salted-streaming paths) are EXACT, not approximate;
  *  - the buffer invariant (sorted ascending, distinct, ≤ k) holds
  *    at every step.
  */
class KmvPropsSpec extends SparkSpec {

  private val rnd = new Random(42)
  private val K = 16
  private val agg = new KmvAgg(K)

  private def fold(vs: Seq[Long]): Seq[Long] =
    vs.foldLeft(agg.zero)(agg.reduce)

  private def truth(vs: Seq[Long]): Seq[Long] =
    vs.distinct.sorted.take(K)

  private def randomStream(): Seq[Long] = {
    val n = 1 + rnd.nextInt(120)
    // small value domain forces duplicates; occasional negatives and
    // extremes probe the ordering edges
    Seq.fill(n)(rnd.nextInt(60).toLong) ++
      Seq(Long.MaxValue, 0L).filter(_ => rnd.nextBoolean())
  }

  test("fold == bottom-k of the distinct set, for any duplicate mix " +
      "and arrival order") {
    (1 to 200).foreach { _ =>
      val vs = randomStream()
      assert(fold(vs) === truth(vs), s"fold diverged on $vs")
      assert(fold(rnd.shuffle(vs)) === truth(vs),
        s"fold is order-sensitive on $vs")
    }
  }

  test("merge is commutative + associative, and merging the folds " +
      "of ANY partitioning equals the fold of the whole stream") {
    (1 to 200).foreach { _ =>
      val vs = randomStream()
      // random 3-way partitioning
      val parts = vs.groupBy(_ => rnd.nextInt(3)).values.toSeq
        .padTo(3, Seq.empty[Long])
      val Seq(a, b, c) = parts.take(3).map(fold)
      assert(agg.merge(a, b) === agg.merge(b, a), "merge not commutative")
      assert(agg.merge(agg.merge(a, b), c) ===
        agg.merge(a, agg.merge(b, c)), "merge not associative")
      assert(agg.merge(agg.merge(a, b), c) === truth(vs),
        s"partitioned merge diverged from the whole-stream fold on $vs")
    }
  }

  test("duplicate-heavy + adversarial orderings (r19: the binary-" +
      "search reduce's worst cases): domain smaller than k, strictly " +
      "descending arrival (every value accepted at slot 0), repeated " +
      "boundary values") {
    // domain < k: every distinct value retained, duplicates must all
    // be rejected by the search probe (never create a double entry)
    val tiny = Seq.fill(500)(rnd.nextInt(K - 3).toLong)
    assert(fold(tiny) === truth(tiny))
    // strictly descending: each new value is the new minimum — insert
    // always lands at index 0 and, once full, evicts the current max
    val desc = (200L to 1L by -1L)
    assert(fold(desc) === (1L to K.toLong))
    // descending with each value tripled: accepted-then-duplicate
    val descDup = desc.flatMap(v => Seq(v, v, v))
    assert(fold(descDup) === (1L to K.toLong))
    // boundary repeats: the buffer max re-arriving when full (h ==
    // buf.last takes the O(1) rejection), and the min re-arriving
    val base = (1L to K.toLong)
    val full = fold(base)
    assert(agg.reduce(full, K.toLong) === full)
    assert(agg.reduce(full, 1L) === full)
    assert(agg.reduce(full, 0L) === (0L to (K - 1).toLong))
  }

  test("linear merge (r20: single-pass bounded zip replacing the " +
      "distinct.sorted.take rebuild) — overlapping buffers, " +
      "duplicates across shards, empty/full asymmetries") {
    // heavy cross-shard overlap: shards share most of their bottom-k
    val shared = (0L until K.toLong).map(_ * 3)
    val a = fold(shared ++ Seq(100L, 101L))
    val b = fold(shared ++ Seq(200L, 201L))
    assert(agg.merge(a, b) === truth(shared ++ Seq(100L, 101L, 200L,
      201L)), "overlapping merge diverged")
    // identical buffers: merge must be idempotent (pure duplicates)
    assert(agg.merge(a, a) === a, "self-merge not idempotent")
    // disjoint interleaved ranges: exercises strict alternation
    val odd = fold((1L to 40L by 2))
    val even = fold((2L to 40L by 2))
    assert(agg.merge(odd, even) === (1L to K.toLong),
      "interleaved merge diverged")
    // empty sides
    assert(agg.merge(agg.zero, a) === a)
    assert(agg.merge(a, agg.zero) === a)
    // one side shorter than k, the other full
    val short = fold(Seq(5L, 500L))
    assert(agg.merge(short, b) === truth(Seq(5L, 500L) ++ shared ++
      Seq(200L, 201L)), "short-vs-full merge diverged")
    // randomized cross-check vs the definitional rebuild
    (1 to 200).foreach { _ =>
      val x = fold(randomStream())
      val y = fold(randomStream())
      assert(agg.merge(x, y) === (x ++ y).distinct.sorted.take(K),
        s"linear merge diverged from rebuild on $x / $y")
    }
  }

  test("buffer invariant holds at every reduce step: sorted " +
      "ascending, distinct, never more than k") {
    (1 to 50).foreach { _ =>
      val vs = randomStream()
      vs.scanLeft(agg.zero)(agg.reduce).foreach { buf =>
        assert(buf.size <= K, s"buffer overflow: $buf")
        assert(buf === buf.distinct.sorted, s"invariant broken: $buf")
      }
    }
  }
}
