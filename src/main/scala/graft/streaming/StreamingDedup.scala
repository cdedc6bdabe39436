package graft.streaming

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: incremental MinHash+LSH against
  * keyed state — every incoming document is checked against all
  * previously seen documents sharing an LSH band bucket, emitting
  * candidate pairs with an estimated Jaccard (fraction of agreeing
  * signature components — the standard unbiased MinHash estimator).
  *
  * Architecture: the signature is computed per record in plain JVM code
  * inside the typed pipeline (the idiomatic shape for per-record
  * streaming operators — no Catalyst expression re-evaluation pitfalls),
  * then records fan out to `bands` bucket keys and
  * `flatMapGroupsWithState` holds the per-bucket membership list.
  *
  * Scale/state: state is (id, signature) per doc per band — k longs per
  * entry — partitioned by the bucket-key shuffle like any keyed
  * aggregation. `maxPerBucket` bounds each bucket's list (an over-full
  * bucket means the band is degenerate for this corpus; new docs still
  * compare against the retained members). A pair sharing multiple
  * buckets is emitted once per shared bucket — downstream consumers
  * dedup by (id_a, id_b), exactly like the batch operator's
  * `.distinct()`.
  */
object StreamingDedup {

  final case class Doc(id: Long, text: String)
  final case class BandedDoc(bucket: String, id: Long, sig: Array[Long])
  final case class CandidatePair(id_a: Long, id_b: Long, est_jaccard: Double)

  /** Word n-gram shingles, same tokenization semantics as
    * `TextAnalysis.wordNgrams` (space-trim, `\s+` splits). */
  def shingles(text: String, n: Int): Set[String] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** k MinHash components via seeded 32→64 Murmur3 mixes. Independent of
    * the batch operator's xxhash64 seeds — signatures are compared only
    * against other signatures from THIS operator. */
  def signature(sh: Set[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    sh.foreach { s =>
      val base = MurmurHash3.stringHash(s)
      var i = 0
      while (i < k) {
        // cheap per-seed remix: splitmix64 over (base, i)
        var z = base.toLong * 0x9E3779B97F4A7C15L + i * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= z >>> 31
        if (z < sig(i)) sig(i) = z
        i += 1
      }
    }
    sig
  }

  def bandBuckets(sig: Array[Long], bands: Int): Seq[String] = {
    val rows = sig.length / bands
    (0 until bands).map { b =>
      var h = 0xcbf29ce484222325L
      var i = b * rows
      while (i < (b + 1) * rows) { h ^= sig(i); h *= 0x100000001b3L; i += 1 }
      s"$b:$h"
    }
  }

  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    var eq = 0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / n
  }

  /** Candidate near-dup pair stream. Use with `outputMode("update")`
    * (alias "append" is rejected: flatMapGroupsWithState declares
    * Update). Pairs may repeat across shared buckets — dedup downstream.
    *
    * Default banding is 32 bands × 2 rows: a LOW-threshold detection
    * curve (50% collision at J ≈ 0.18). Streaming dedup prefers recall —
    * a missed near-dup is gone forever, while a spurious candidate just
    * costs one signature comparison before the `threshold` filter drops
    * it. (Batch minhash uses 16×4 because it re-verifies with exact
    * Jaccard and can afford a sharper curve.) */
  def candidatePairs(docs: Dataset[Doc], n: Int = 3, numHashes: Int = 64,
      bands: Int = 32, threshold: Double = 0.6,
      maxPerBucket: Int = 1000): Dataset[CandidatePair] = {
    require(numHashes % bands == 0)
    implicit val bandedEnc: Encoder[BandedDoc] = Encoders.product[BandedDoc]
    implicit val pairEnc: Encoder[CandidatePair] = Encoders.product[CandidatePair]
    implicit val stringEnc: Encoder[String] = Encoders.STRING
    implicit val stateEnc: Encoder[List[(Long, Array[Long])]] = ExpressionEncoder()

    val banded = docs.flatMap { d =>
      val sh = shingles(d.text, n)
      if (sh.isEmpty) Seq.empty[BandedDoc]
      else {
        val sig = signature(sh, numHashes)
        bandBuckets(sig, bands).map(b => BandedDoc(b, d.id, sig))
      }
    }

    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[List[(Long, Array[Long])], CandidatePair](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (_, rows: Iterator[BandedDoc], state: GroupState[List[(Long, Array[Long])]]) =>
          var members = state.getOption.getOrElse(Nil)
          val out = Seq.newBuilder[CandidatePair]
          rows.foreach { r =>
            if (!members.exists(_._1 == r.id)) {
              members.foreach { case (oid, osig) =>
                val est = estJaccard(r.sig, osig)
                if (est >= threshold) {
                  val (a, b) = if (oid < r.id) (oid, r.id) else (r.id, oid)
                  out += CandidatePair(a, b, est)
                }
              }
              if (members.size < maxPerBucket) members = (r.id, r.sig) :: members
            }
          }
          state.update(members)
          out.result().iterator
      }
  }
}
