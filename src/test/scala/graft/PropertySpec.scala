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
}
