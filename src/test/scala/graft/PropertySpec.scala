package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Ecommerce}
import org.apache.spark.sql.functions._

/** Property tests (SURVEY.md §5): aggregation ≡ per-key fold under any
  * arrival order, dedup invariants, fingerprint determinism. Uses raw
  * ScalaCheck generators with fixed seeds (the scalatest bridge isn't in
  * the offline dependency set) — deterministic, N samples per property. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1L to n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i)))

  private def forAllSamples[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    samples(g, n).foreach(body)

  private val cats = Seq("electronic", "fashion", "grocery", "home")
  private val txGen = for {
    id <- Gen.uuid.map(_.toString)
    cat <- Gen.oneOf(cats)
    amt <- Gen.chooseNum(1, 100000).map(_ / 100.0)
    day <- Gen.chooseNum(1, 28)
  } yield Transaction(id, "p", "n", cat, amt, 1, "b", amt, "USD", "c",
    Timestamp.valueOf(f"2024-11-$day%02d 10:00:00"), "card")

  test("salesPerCategory ≡ sequential per-key fold, any arrival order") {
    forAllSamples(Gen.listOfN(60, txGen), 5) { txs =>
      if (txs.nonEmpty) {
        val expected = txs.groupBy(_.productCategory)
          .view.mapValues(_.foldLeft(0.0)(_ + _.totalAmount)).toMap
        val shuffled = scala.util.Random.shuffle(txs)
        val got = Ecommerce
          .salesPerCategory(shuffled.toDF(), "productCategory", "totalAmount")
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        assert(got.keySet === expected.keySet)
        got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-6) }
      }
    }
  }

  private val textGen =
    Gen.listOf(Gen.oneOf("the", "cat", "sat", "mat", "dog", "a", "ran"))
      .map(_.mkString(" "))

  test("exactDedup output ids ⊆ input ids and one survivor per text") {
    forAllSamples(Gen.listOfN(30, textGen), 5) { texts =>
      if (texts.nonEmpty) {
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val kept = Dedup.exactDedup(df, "doc_id", "text")
          .collect().map(_.getLong(0)).toSet
        assert(kept.subsetOf(texts.indices.map(_.toLong).toSet))
        assert(kept.size === texts.distinct.size)
        // survivors are the minimum id of each text group
        val expected = texts.zipWithIndex.groupBy(_._1)
          .values.map(_.map(_._2).min.toLong).toSet
        assert(kept === expected)
      }
    }
  }

  test("jaccard pairs are canonical (a<b) with J in (0,1]") {
    forAllSamples(Gen.listOfN(12, textGen), 3) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val pairs = Dedup.jaccardNearDupPairs(df, "doc_id", "text", 1, 0.01)
        .collect()
      pairs.foreach { r =>
        assert(r.getLong(0) < r.getLong(1))
        val j = r.getDouble(2)
        assert(j > 0.0 && j <= 1.0 + 1e-12)
      }
    }
  }

  test("fingerprint is a pure function: equal text ⇔ equal hash (no collisions observed)") {
    forAllSamples(Gen.listOfN(20, textGen), 3) { texts =>
      val fps = texts.toDF("t")
        .select(col("t"), TextAnalysis.fingerprint(col("t")).as("fp"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val byText = fps.groupBy(_._1).view.mapValues(_.map(_._2).distinct)
      byText.foreach { case (_, hashes) => assert(hashes.size === 1) }
    }
  }

  test("dedupSpans: every output is an aligned-span subsequence of its input") {
    // random small-vocabulary corpora (small vocab forces cross-doc
    // span collisions): each surviving doc's token stream must be the
    // concatenation, in order, of a subset of its input's disjoint
    // spanTokens-windows — never reordered, truncated mid-span (except
    // the input's own tail span), or invented
    val wordGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.chooseNum(1, 17).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    val span = 4
    forAllSamples(Gen.listOfN(12, docGen), 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val inputSpans: Map[Long, Seq[Seq[String]]] = docs.map { case (id, t) =>
        id -> t.split("\\s+").toSeq.grouped(span).toSeq
      }.toMap
      val out = Dedup.dedupSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
          spanTokens = span)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      out.foreach { case (id, text, nKept) =>
        val kept = text.split("\\s+").toSeq.grouped(span).toSeq
        assert(kept.size === nKept)
        // kept spans appear in the input's span list, in order
        val input = inputSpans(id)
        val matched = kept.foldLeft(0) { (from, sp) =>
          val idx = input.indexOf(sp, from)
          assert(idx >= 0, s"doc $id: span $sp not found in order in $input")
          idx + 1
        }
        assert(matched <= input.size)
      }
    }
  }

  test("dedupLines invariants: idempotent, subsequence, count arithmetic") {
    val lineGen = Gen.oneOf("menu", "body", "", "footer", "x y", "the end")
    val docGen = Gen.chooseNum(0, 9).flatMap(n =>
      Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val docs = samples(docGen, 60).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val once = TextAnalysis.dedupLines(docs, "doc_id", "text")
    val rows = once.orderBy("doc_id").collect()
    val input = docs.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val in = input(r.getLong(0)).split("\n", -1).toSeq
      val out = r.getString(1).split("\n", -1).toSeq
      assert(out === in.distinct)                   // first-occurrence order
      assert(r.getLong(2) === in.length.toLong)     // n_lines
      assert(r.getLong(3) === (in.length - in.distinct.length).toLong)
    }
    // idempotence: a second pass changes nothing and drops nothing
    val twice = TextAnalysis.dedupLines(
        once.select(col("doc_id"), col("text")), "doc_id", "text")
      .orderBy("doc_id").collect()
    rows.zip(twice).foreach { case (a, b) =>
      assert(a.getString(1) === b.getString(1))
      assert(b.getLong(3) === 0L)
    }
  }

  test("groupQuantiles invariants: member value, monotone in p, tie-stable") {
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(0, 20).map(_.toDouble) // small range forces ties
    } yield (g, v)
    forAllSamples(Gen.listOfN(40, rowGen), 5) { rows =>
      val ps = Seq(0.25, 0.5, 0.75, 1.0)
      val got = graft.operators.Scale
        .groupQuantiles(rows.toDF("g", "v"), "g", "v", ps)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
        .toMap
      rows.groupBy(_._1).foreach { case (g, members) =>
        val vals = members.map(_._2).sorted
        ps.foreach { p =>
          val q = got((g, p))
          assert(vals.contains(q), s"$g p=$p: $q not a member value")
          // definitional check: value at position max(1, ceil(p·n))
          val idx = math.max(1, math.ceil(p * vals.size).toInt)
          assert(q === vals(idx - 1), s"$g p=$p")
        }
        // monotone in p
        ps.sliding(2).foreach { case Seq(p1, p2) =>
          assert(got((g, p1)) <= got((g, p2)))
        }
        assert(got((g, 1.0)) === vals.max)
      }
    }
  }

  test("histogram invariants: counts partition the rows, edges bound values") {
    val valGen = Gen.chooseNum(-1000, 1000).map(_ / 7.0)
    forAllSamples(Gen.listOfN(60, valGen), 5) { vs =>
      val nBins = 8
      val out = graft.operators.Scale.histogram(vs.toDF("v"), "v", nBins)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(out.map(_._3).sum === vs.size)
      assert(out.forall(b => b._1 >= 0 && b._1 < nBins))
      val (lo, hi) = (vs.min, vs.max)
      val width = (hi - lo) / nBins
      out.foreach { case (bucket, binLo, n) =>
        assert(n > 0) // sparse output: empty bins absent
        if (hi > lo) {
          // every value of the bucket lies in [binLo, binLo + width]
          // (right edge closed only for the clamped max)
          val members = vs.filter { v =>
            val b = math.min(nBins - 1L,
              math.floor(((v - lo) * nBins) / (hi - lo)).toLong)
            b == bucket
          }
          assert(members.size.toLong === n)
          members.foreach { v =>
            assert(v >= binLo - 1e-9 && v <= binLo + width + 1e-9)
          }
        }
      }
    }
  }

  test("scd2History invariants: intervals chain and partition each key's timeline") {
    val evGen = for {
      user <- Gen.chooseNum(1, 3)
      attr <- Gen.oneOf("A", "B", "C")
      minute <- Gen.chooseNum(0, 59)
    } yield (user.toLong, attr, minute)
    forAllSamples(Gen.listOfN(30, evGen), 5) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, a, m), i) =>
        (i.toLong, u, a, Timestamp.valueOf(f"2024-01-01 10:$m%02d:00"))
      }
      val out = graft.operators.Analytics
        .scd2History(rows.toDF("event_id", "user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", "event_id")
        .collect()
        .map(r => (r.getLong(0), r.getInt(4), r.getString(1),
          r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(5)))
      out.groupBy(_._1).foreach { case (user, versions) =>
        val sorted = versions.sortBy(_._2)
        // versions are 1..n dense
        assert(sorted.map(_._2).toSeq === (1 to sorted.length))
        // intervals chain: valid_to(k) == valid_from(k+1); only the
        // last is open/current
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._5.contains(b._4), s"user $user: gap between versions")
            assert(!a._6)
          case _ => ()
        }
        assert(sorted.last._5.isEmpty && sorted.last._6)
        // consecutive versions always change value (runs collapsed)
        sorted.sliding(2).foreach {
          case Array(a, b) => assert(a._3 != b._3)
          case _ => ()
        }
        // first interval starts at the user's earliest event
        val userMin = rows.filter(_._2 == user).map(_._4.getTime).min
        assert(sorted.head._4.getTime === userMin)
      }
    }
  }

  test("pmi ratio invariant: scores agree with exact counts on any corpus") {
    val wordGen = Gen.oneOf("p", "q", "r", "s")
    val docGen = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))
    forAllSamples(Gen.listOfN(10, docGen), 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val toks = texts.map(_.split(" ").toSeq)
      val bigrams = toks.flatMap(ts => ts.zip(ts.tail))
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val bi = bigrams.groupBy(identity).view.mapValues(_.size).toMap
      val n = bigrams.size
      val got = graft.functions.TextAnalysis
        .pmiBigrams(docs.toDF("doc_id", "text"), "text", minCount = 1, k = 100)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet === bi.keySet.map(identity))
      got.foreach { case ((w1, w2), (cnt, ratio)) =>
        assert(cnt === bi((w1, w2)).toLong)
        val expected = (bi((w1, w2)).toDouble * n) / (uni(w1).toDouble * uni(w2))
        assert(ratio === expected, s"($w1, $w2)")
      }
    }
  }

  test("summary merge is split-invariant: any partition of rows, same summary") {
    // the monoid contract behind incremental ETL: however history is cut
    // into batches, merging the batch summaries equals the full scan.
    // cnt/mn/mx are exact; sums compare within float re-association noise.
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-10000, 10000).map(_ / 100.0)
    } yield (k, v)
    val splitGen = for {
      rows <- Gen.listOfN(80, rowGen)
      cut1 <- Gen.chooseNum(0, 80)
      cut2 <- Gen.chooseNum(0, 80)
    } yield (rows, math.min(cut1, cut2), math.max(cut1, cut2))
    forAllSamples(splitGen, 5) { case (rows, lo, hi) =>
      val df = rows.toDF("k", "v")
      val parts = Seq(rows.take(lo), rows.slice(lo, hi), rows.drop(hi))
        .map(p => graft.operators.Scale.keySummary(
          if (p.isEmpty) df.limit(0) else p.toDF("k", "v"), "k", "v"))
      val merged = parts.reduce(
          graft.operators.Scale.mergeSummaries(_, _, "k"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      val scratch = graft.operators.Scale.keySummary(df, "k", "v")
        .collect()
        .map(r => r.getString(0) ->
          ((r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
        .toMap
      assert(merged.keySet === scratch.keySet)
      merged.foreach { case (k, (s, cnt, mn, mx)) =>
        val (s2, cnt2, mn2, mx2) = scratch(k)
        assert(math.abs(s - s2) < 1e-9 && cnt === cnt2
          && mn === mn2 && mx === mx2, k)
      }
    }
  }

  test("applyChangelog ∘ snapshotDiff: the diff of a merge is exactly the effective changes") {
    import graft.operators.Analytics
    val rnd = new scala.util.Random(31)
    // random snapshot over keys 0-59, random changelog over keys 0-79
    // (some keys new, some untouched), 1-3 changes per touched key
    val snapKeys = (0L until 60L).filter(_ => rnd.nextBoolean())
    val snapshot = snapKeys.map(k => (k, rnd.nextInt(100), s"s$k"))
      .toDF("k", "v", "tag")
    val changes = (0L until 80L).flatMap { k =>
      if (rnd.nextInt(3) == 0) {
        val n = 1 + rnd.nextInt(3)
        (1 to n).map(seq => (k, rnd.nextInt(100), s"c$k-$seq", seq.toLong,
          if (rnd.nextInt(4) == 0) "D" else "U"))
      } else Seq.empty
    }.toDF("k", "v", "tag", "seq", "op")
    val merged = Analytics.applyChangelog(snapshot, changes, "k", Seq("seq"), "op")
    val diff = Analytics.snapshotDiff(snapshot, merged, "k", Seq("v", "tag"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // driver-side reference: latest op per key decides the expected status
    val latest = changes.collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getInt(1), r.getString(2), r.getString(4))))
      .groupBy(_._1).map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    val snapMap = snapshot.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    for (k <- (snapMap.keySet ++ latest.keySet)) {
      val expected = (snapMap.get(k), latest.get(k)) match {
        case (Some(_), Some((_, _, _, "D"))) => Some("removed")
        case (Some(old), Some((_, v, t, _))) =>
          Some(if ((old._1, old._2) == ((v, t))) "unchanged" else "changed")
        case (Some(_), None) => Some("unchanged")
        case (None, Some((_, _, _, "D"))) => None // insert+delete never lands
        case (None, Some(_)) => Some("added")
        case (None, None) => None
      }
      assert(diff.get(k) === expected, s"key $k")
    }
  }
}
