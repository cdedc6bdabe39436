package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** PassJoin edit-distance pairs: planted edits at every position class,
  * sub-segment-count strings, and a random-corpus equivalence property
  * against a driver-side exhaustive DP — the blocking must never lose a
  * pair (completeness), and the thresholded verify must never admit one
  * beyond maxDist (soundness). */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  /** Classic O(nm) Levenshtein DP — the trusted driver-side oracle. */
  private def lev(a: String, b: String): Int = {
    val (n, m) = (a.length, b.length)
    val prev = Array.tabulate(m + 1)(identity)
    val cur = new Array[Int](m + 1)
    for (i <- 1 to n) {
      cur(0) = i
      for (j <- 1 to m) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, m + 1)
    }
    prev(m)
  }

  private def exhaustive(strs: Seq[String], t: Int): Set[(String, String, Int)] = {
    val u = strs.distinct
    (for {
      a <- u; b <- u if a < b
      d = lev(a, b) if d >= 1 && d <= t
    } yield (a, b, d)).toSet
  }

  private def run(strs: Seq[String], t: Int): Set[(String, String, Int)] =
    Dedup.editDistancePairs(strs.toDF("s"), "s", t)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("planted single edits at head, middle, and tail are all found at maxDist 1") {
    val strs = Seq("abcdef", "xbcdef", "abcXef", "abcdeY", "abcdefZ", "bcdef")
    assert(run(strs, 1) === exhaustive(strs, 1))
    // and the planted ones specifically
    val got = run(strs, 1)
    assert(got.contains(("abcdef", "xbcdef", 1))) // head substitution
    assert(got.contains(("abcXef", "abcdef", 1))) // middle substitution
    assert(got.contains(("abcdeY", "abcdef", 1))) // tail substitution
    assert(got.contains(("abcdef", "abcdefZ", 1))) // tail insertion
    assert(got.contains(("abcdef", "bcdef", 1))) // head deletion
  }

  test("distance-2 pairs found, distance-3 pairs excluded at maxDist 2") {
    val strs = Seq("spark engine", "spark enginX", "sparX enginX", "spXrX enginX")
    val got = run(strs, 2)
    // NB 'X' < lowercase, so the X-variants sort first in each pair
    assert(got.contains(("spark enginX", "spark engine", 1)))
    assert(got.contains(("sparX enginX", "spark engine", 2)))
    assert(!got.exists { case (a, b, _) =>
      (a, b) == (("spXrX enginX", "spark engine")) ||
        (a, b) == (("spark engine", "spXrX enginX"))
    })
    assert(got === exhaustive(strs, 2))
  }

  test("strings shorter than the segment count (incl. empty) stay complete") {
    val strs = Seq("", "a", "b", "ab", "ba", "abc", "xyz")
    for (t <- 1 to 3)
      assert(run(strs, t) === exhaustive(strs, t), s"maxDist $t")
  }

  test("duplicate input rows collapse to the distinct-string universe") {
    val strs = Seq("kitten", "kitten", "sitten", "sitten", "mitten")
    val got = run(strs, 1)
    assert(got === exhaustive(strs, 1))
    assert(got.contains(("kitten", "sitten", 1)))
    assert(got.contains(("mitten", "sitten", 1)))
  }

  test("random small-alphabet corpus ≡ exhaustive DP for maxDist 1..3") {
    val rnd = new scala.util.Random(42)
    val strs = Seq.fill(80)(
      (0 until rnd.nextInt(9)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    for (t <- 1 to 3)
      assert(run(strs, t) === exhaustive(strs, t), s"maxDist $t")
  }

  test("across: left×right candidates only, dist-0 cross matches reported") {
    val leftS = Seq("kitten", "mitten", "shared", "lonely")
    val rightS = Seq("sitten", "shared", "mittenX", "unrelated")
    val got = Dedup.editDistancePairsAcross(
        leftS.toDF("s"), "s", rightS.toDF("s"), "s", 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val expected = (for {
      a <- leftS; b <- rightS
      d = lev(a, b) if d <= 1
    } yield (a, b, d)).toSet
    assert(got === expected)
    assert(got.contains(("shared", "shared", 0))) // exact cross-contamination
    assert(got.contains(("kitten", "sitten", 1)))
    assert(got.contains(("mitten", "mittenX", 1)))
    // no within-side pairs: kitten/mitten are both LEFT, never emitted
    assert(!got.exists { case (a, b, _) => a == "kitten" && b == "mitten" })
  }

  test("across ≡ exhaustive cross DP on random corpora, maxDist 1..3") {
    val rnd = new scala.util.Random(99)
    def corpus(n: Int) = Seq.fill(n)(
      (0 until rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
    val l = corpus(50); val r = corpus(50)
    for (t <- 1 to 3) {
      val got = Dedup.editDistancePairsAcross(
          l.toDF("s"), "s", r.toDF("s"), "s", t)
        .collect().map(x => (x.getString(0), x.getString(1), x.getInt(2))).toSet
      val expected = (for {
        a <- l.distinct; b <- r.distinct
        d = lev(a, b) if d <= t
      } yield (a, b, d)).toSet
      assert(got === expected, s"maxDist $t")
    }
  }

  test("part-name fixture at maxDist 2 ≡ exhaustive (the registered query's shape)") {
    val names = spark.read.parquet(s"$sf/part.parquet")
      .select("p_name").distinct().collect().map(_.getString(0)).toSeq
    val got = Dedup.editDistancePairs(
        spark.read.parquet(s"$sf/part.parquet").select("p_name"), "p_name", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got === exhaustive(names, 2))
    assert(got.nonEmpty) // fixture actually contains near-dup names
  }
}
