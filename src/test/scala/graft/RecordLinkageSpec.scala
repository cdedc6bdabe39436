package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.FieldSim

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  // (id, name, city-block, balance)
  private val recs = Seq(
    (1L, "alice johnson", "east", 100.0),
    (2L, "alice jonson", "east", 100.0),   // typo'd dup of 1: lev 1
    (3L, "alice johnsen", "east", 250.0),  // similar name, DIFFERENT entity
    (4L, "bob smith", "east", 300.0),
    (5L, "alice johnson", "west", 100.0)   // identical but other block
  ).toDF("id", "name", "block", "bal")

  private val fields =
    Seq(FieldSim("name", 0.6), FieldSim("bal", 0.4, exact = true))

  test("scores are the exact weighted chain; exact field disambiguates") {
    val pairs = RecordLinkage.dedupePairs(recs, "id", Seq("block"),
        fields, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // (1,2): lev=1, maxlen=13 → 0.6·(12/13) + 0.4
    assert(pairs.keySet === Set((1L, 2L)))
    assert(math.abs(pairs((1L, 2L)) - (0.6 * (12.0 / 13) + 0.4)) < 1e-12)
    // (1,3): lev=1 but balances differ → 0.6·(12/13) ≈ 0.554 < 0.9:
    // the exact field is what separates near-name non-dups
    val low = RecordLinkage.dedupePairs(recs, "id", Seq("block"),
        fields, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(low.contains((1L, 3L)) && low.contains((2L, 3L)))
  }

  test("blocking: cross-block pairs are never compared (recall owned by the key)") {
    // id 5 is IDENTICAL to id 1 except the block — no candidate, by design
    val all = RecordLinkage.dedupePairs(recs, "id", Seq("block"),
      fields, threshold = 0.1)
    assert(!all.collect().exists(r => r.getLong(1) == 5L))
  }

  test("null field values contribute 0, never null-poison the score") {
    val withNull = Seq(
      (1L, "alice", "east", Some(10.0)),
      (2L, "alice", "east", None)
    ).toDF("id", "name", "block", "bal")
    val p = RecordLinkage.dedupePairs(withNull, "id", Seq("block"),
        fields, threshold = 0.5)
      .collect()
    // name exact match: 0.6; bal null → 0
    assert(p.length === 1 && math.abs(p.head.getDouble(2) - 0.6) < 1e-12)
  }

  test("linkAcross ≡ dedupePairs restricted to cross-side candidates") {
    val left = recs.filter(col("id") <= 2)
    val right = recs.filter(col("id") > 2)
    val across = RecordLinkage.linkAcross(left, "id", right, "id",
        Seq("block"), fields, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val restricted = RecordLinkage.dedupePairs(recs, "id", Seq("block"),
        fields, threshold = 0.3)
      .filter(col("id_a") <= 2 && col("id_b") > 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(across == restricted)
  }

  test("streaming linkage: incoming records match a static reference, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sql = spark.sqlContext
    val reference = recs
    val input = MemoryStream[(Long, String, String, Double)]
    val incoming = input.toDF().toDF("id", "name", "block", "bal")
    // the same blocked+scored linkage, stream-static: the reference
    // side is a broadcastable equality join, NO streaming state
    val matched = RecordLinkage.linkAcross(incoming, "id",
      reference, "id", Seq("block"), fields, threshold = 0.9)
    val q = matched.writeStream.format("memory").queryName("link_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (100L, "alice jonsonn", "east", 100.0), // lev 2 vs id 1, bal match
        (101L, "zz totally new", "east", 5.0),  // matches nothing
        (102L, "bob smith", "west", 300.0))     // right name, WRONG block
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0),
        "stream-static linkage must hold no streaming state")
      val out = spark.table("link_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      // 100→1 ("alice johnson", lev 2, bal match): 0.6·(11/13) + 0.4
      // ≈ 0.908; 100→2 (the typo'd dup "alice jonson", lev 1 —
      // drop the trailing n — and same balance): 0.6·(12/13) + 0.4
      // ≈ 0.954. Both clear 0.9; nothing else does
      assert(out.keySet === Set((100L, 1L), (100L, 2L)))
      assert(math.abs(out((100L, 1L)) - (0.6 * (11.0 / 13) + 0.4)) < 1e-12)
      assert(math.abs(out((100L, 2L)) - (0.6 * (12.0 / 13) + 0.4)) < 1e-12)
    } finally q.stop()
  }

  test("parameter validation rejects nonsense") {
    intercept[IllegalArgumentException] {
      RecordLinkage.dedupePairs(recs, "id", Seq("block"), fields, 1.5)
    }
    intercept[IllegalArgumentException] {
      RecordLinkage.dedupePairs(recs, "id", Seq(), fields, 0.5)
    }
  }

  test("sortedNeighborhood: sort-adjacency candidates, cross-block recall, ≡ exhaustive band") {
    import spark.implicits._
    // records whose BLOCK keys disagree (the blocking scheme's miss)
    // but whose names sort adjacent: SNM must find the pair
    val recs2 = Seq(
      (1L, "alpha corp", 10.0, "EU"),
      (2L, "alpha corpx", 10.0, "US"), // near-dup of 1, different block
      (3L, "beta llc", 5.0, "EU"),
      (4L, "zeta gmbh", 7.0, "EU")
    ).toDF("id", "name", "bal", "region")
    val fs = Seq(RecordLinkage.FieldSim("name", 0.6),
      RecordLinkage.FieldSim("bal", 0.4, exact = true))
    val snm = RecordLinkage.sortedNeighborhood(recs2, "id", "name",
        fs, threshold = 0.9, window = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(snm === Set((1L, 2L)))
    // equality blocking on region misses exactly that pair
    val blocked = RecordLinkage.dedupePairs(recs2, "id", Seq("region"),
        fs, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked === Set.empty)

    // window semantics ≡ the exhaustive rank-band reference on a
    // bigger frame, across bucket boundaries (buckets = 4 forces them)
    val many = (1 to 200).map { i =>
      val base = f"name${(i * 2654435761L) % 1000}%04d"
      (i.toLong, if (i % 17 == 0) base + " x" else base,
        (i % 13).toDouble, "B")
    }.toDF("id", "name", "bal", "region")
    val got = RecordLinkage.sortedNeighborhood(many, "id", "name",
        fs, threshold = 0.8, window = 5, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    val rows = many.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    val ranked = rows.sortBy(t => (t._2, t._1)).zipWithIndex
    val lev = org.apache.commons.text.similarity.LevenshteinDistance
      .getDefaultInstance
    val want = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb > ra && rb <= ra + 5
      simN = 1.0 - lev.apply(a._2, b._2).toDouble /
        math.max(math.max(a._2.length, b._2.length), 1)
      score = simN * 0.6 + (if (a._3 == b._3) 0.4 else 0.0)
      if score >= 0.8
    } yield (math.min(a._1, b._1), math.max(a._1, b._1),
      BigDecimal(score).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
    assert(got === want)
  }
}
