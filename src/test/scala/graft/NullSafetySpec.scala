package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Multimodal, Scale, Similarity}

/** Null-robustness contract: a 100 TB corpus WILL contain null text,
  * null embeddings, and null payloads (failed fetches, schema drift).
  * Every operator must degrade to "row contributes nothing" — never an
  * NPE that kills a task hours into a scan, and never a null key that
  * hijacks a join or ranks first. */
class NullSafetySpec extends SparkSpec {
  import spark.implicits._

  private val docsWithNulls = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "the quick brown fox jumps over the lazy dog"),
        Row(2L, "the quick brown fox jumps over the lazy dog"),
        Row(3L, null),
        Row(4L, null),
        Row(5L, ""),
        Row(6L, "completely different content here today"))),
      schema)
  }

  test("text functions null-propagate instead of throwing") {
    val out = docsWithNulls.select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("bpe"),
        TextAnalysis.scrubPii(col("text")).as("scrub"),
        TextAnalysis.qualityScore(col("text")).as("q"),
        TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    assert(out.length === 6)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2)) // null text → null features
    assert(out(4).getInt(1) === 0)                   // empty text → 0 tokens
  }

  test("gopherRules/stripHtml/UrlOps null-propagate instead of throwing") {
    val out = docsWithNulls.select(
        col("doc_id"),
        TextAnalysis.gopherRules(col("text")).as("g"),
        TextAnalysis.stripHtml(col("text")).as("h"),
        graft.functions.UrlOps.canonical(col("text")).as("c"))
      .orderBy("doc_id").collect()
    // null text → null struct fields / null strings, no NPE anywhere
    assert(out(2).getStruct(1).isNullAt(0) ||
      out(2).getStruct(1).getAs[Any]("n_words") == null ||
      out(2).isNullAt(1)) // engine may null the struct or its fields
    assert(out(2).isNullAt(2))
    assert(out(2).isNullAt(3))
    // empty text measures as zero words and fails the gate cleanly
    val empty = out(4).getStruct(1)
    assert(empty.getAs[Long]("n_words") === 0L)
    assert(!empty.getAs[Boolean]("pass"))
    assert(out(4).getString(2) === "")
  }

  test("termCounts skips null and empty docs") {
    val counts = TextAnalysis.termCounts(docsWithNulls, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("the") === 4L) // only from the two real docs
    assert(!counts.contains(null) && !counts.contains(""))
  }

  test("dedup family: null texts group together, never join-explode") {
    // exactDedup: sha2(null) is null — all-null texts form one group
    val kept = Dedup.exactDedup(docsWithNulls, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 5L, 6L)) // dup text 2 and null-dup 4 dropped
    // pairwise ops: null/empty docs simply produce no pairs
    val jp = Dedup.jaccardNearDupPairs(docsWithNulls, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jp === Set((1L, 2L)))
    val sp = Dedup.simhashNearDupPairs(docsWithNulls, "doc_id", "text", 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sp === Set((1L, 2L)))
    val mp = Dedup.minhashNearDupPairs(docsWithNulls, "doc_id", "text", 3, 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp === Set((1L, 2L)))
  }

  test("similarity: null embeddings are excluded like zero vectors") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, Seq(1.0f, 0.0f)),
        Row(1L, Seq(0.9f, 0.1f)),
        Row(2L, null))),
      schema)
    val topk = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0),
        "vec_id", "embedding", 3)
      .collect().map(_.getLong(1)).toSet
    assert(topk === Set(1L)) // null row neither ranks nor throws
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("multimodal: null payload is an empty asset, not an NPE") {
    implicit val sp = spark
    val schema = StructType(Seq(
      StructField("assetId", LongType, nullable = false),
      StructField("mediaType", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("durationMs", LongType, nullable = false)))
    val assets = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", "abc".getBytes("UTF-8"), 0, 0, 0L),
        Row(2L, "image", null, 0, 0, 0L))),
      schema).as[Multimodal.MediaAsset]
    val out = Multimodal.extractFeatures(assets).collect().sortBy(_.assetId)
    assert(out.length === 2)
    assert(out(1).byteLen === 0 && !out(1).decoded && out(1).brightness === 0.0)
  }

  test("dedupSpans: null and empty docs vanish silently, never NPE") {
    val out = Dedup.dedupSpans(docsWithNulls, "doc_id", "text", spanTokens = 4)
      .collect().map(_.getLong(0)).toSet
    // docs 1/2 are exact dups — their single span is cross-doc
    // duplicated, both vanish; 3/4 (null) and 5 (empty) yield no spans;
    // 6 survives intact
    assert(out === Set(6L))
  }

  test("cross-corpus pairs: null texts on either side contribute nothing") {
    val pairs = Dedup.jaccardNearDupPairsAcross(
        docsWithNulls, "doc_id", "text", docsWithNulls, "doc_id", "text",
        n = 2, threshold = 0.5)
      .collect()
    // identical corpora: every shingled doc matches itself, 1 and 2
    // match each other; nulls (3, 4) and the empty doc (5) must not
    // join-match anything
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 1L), (2L, 2L), (1L, 2L), (2L, 1L), (6L, 6L)))
  }

  test("rankBins: null values order first (Spark default) without NPE") {
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0)))
      .toDF("id", "v")
    val out = Scale.rankBins(df, "v", "id", nBins = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out.size === 3)
    // NULLS FIRST in Spark's default ascending order: the null row
    // lands in bin 1
    assert(out(2L) === 1)
  }

  test("editDistancePairs drops null strings; empty string still pairs") {
    val df = Seq(Some("abc"), None, Some("abd"), Some(""), Some("a"))
      .toDF("s")
    val got = Dedup.editDistancePairs(df, "s", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("abc", "abd"), ("", "a")))
  }

  test("coOccurrencePairs: null items and null groups contribute nothing") {
    val df = Seq(
      (Some(1L), Some("x")), (Some(1L), Some("y")), (Some(1L), None),
      (None, Some("x")), (None, Some("y")),
      (Some(2L), Some("x")), (Some(2L), Some("y"))
    ).toDF("g", "i")
    val got = graft.operators.Analytics.coOccurrencePairs(df, "g", "i")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // null item never pairs (null-rejecting <); null group never joins
    assert(got === Map(("x", "y") -> 2L))
  }

  test("groupQuantiles/madOutliers drop null values, keep null groups") {
    val df = Seq(
      (1L, Some("a"), Some(1.0)), (2L, Some("a"), Some(9.0)),
      (3L, Some("a"), None), (4L, Option.empty[String], Some(5.0)),
      (5L, None, Some(7.0))
    ).toDF("id", "g", "v")
    val q = Scale.groupQuantiles(df, "g", "v", Seq(1.0))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(2)).toMap
    // null group is a real partition (groupBy keeps nulls); null value dropped
    assert(q === Map(Some("a") -> 9.0, None -> 7.0))
    // both 2-element groups have MAD = 0 (lower median = the smaller
    // value, deviations [0, d], median deviation 0) → the off-median
    // row of EACH group flags, including the NULL group's (the
    // null-safe <=> join keeps it; a USING-style join would silently
    // drop null-group rows)
    val out = Scale.madOutliers(df, "g", "v", "id")
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(2L, 5L))
  }

  test("oovRate/sentences: null and empty texts contribute nothing") {
    val oov = TextAnalysis.oovRate(docsWithNulls, "doc_id", "text", vocabK = 5)
      .collect().map(_.getLong(0)).toSet
    assert(oov === Set(1L, 2L, 6L)) // null/empty docs have no bigrams
    val sent = TextAnalysis.sentences(docsWithNulls, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(sent === Set(1L, 2L, 6L)) // null split → null → generator drops
  }

  test("LM scorers / dsir / dedupLines: null and empty texts are safe") {
    // scorers: null/empty docs contribute nothing to the model OR the
    // output; the non-null docs still score
    val uni = TextAnalysis.unigramCrossEntropy(docsWithNulls, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(uni === Set(1L, 2L, 6L))
    val bi = TextAnalysis.bigramCrossEntropy(docsWithNulls, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(bi === Set(1L, 2L, 6L))
    val ds = TextAnalysis.dsirLogWeights(docsWithNulls, "doc_id", "text",
        col("doc_id") <= 2L)
      .collect().map(_.getLong(0)).toSet
    assert(ds === Set(1L, 2L, 6L))
    // line dedup is a projection: null text stays a null-text row
    // (nothing to dedup), it must not throw or fabricate lines
    val dl = TextAnalysis.dedupLines(docsWithNulls, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(dl.length === 6)
    assert(dl(2).isNullAt(1) && dl(3).isNullAt(1))
    assert(dl(4).getString(1) === "")
  }

  test("embedding-across: null vectors on either side are excluded") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType), nullable = true)))
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(0L, Seq(1.0f, 0.0f)),
        Row(5L, Seq(0.9f, 0.1f)),  // batch side (mod 5)
        Row(10L, null),            // batch side, null
        Row(3L, null))),           // reference side, null
      schema)
    val pairs = Similarity.lshNearDupPairsAcross(
        vecs.filter(col("vec_id") % 5 =!= 0), vecs.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", 0.5, bitsPerTable = 2, numTables = 8,
        multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set()) // only the null rows could cross-match; excluded
    val vecs2 = vecs.union(Seq((8L, Seq(1.0f, 0.05f))).toDF("vec_id", "embedding"))
    val pairs2 = Similarity.lshNearDupPairsAcross(
        vecs2.filter(col("vec_id") % 5 =!= 0), vecs2.filter(col("vec_id") % 5 === 0),
        "vec_id", "embedding", 0.5, bitsPerTable = 2, numTables = 8,
        multiProbe = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 (reference) pairs with both non-null batch vectors 0 and 5
    assert(pairs2 === Set((8L, 0L), (8L, 5L)))
  }

  test("scd2History: null timestamps cannot silently corrupt ordering") {
    // ts is the interval clock; the operator assumes non-null ts (the
    // events contract). A null-ts row orders NULLS FIRST and becomes
    // the first version with a real valid_to — documented, not thrown.
    val df = Seq(
      (1L, 10L, "A", Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00"))),
      (2L, 10L, "B", Option.empty[java.sql.Timestamp])
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = graft.operators.Analytics
      .scd2History(df, "user_id", "event_type", "ts", "event_id")
      .orderBy("version").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) === "B" && out(0).isNullAt(2))
  }

  test("applyChangelog: null payload values pass through; null key is a key") {
    import graft.operators.Analytics
    val snap = Seq((Some(1L), Some(10))).toDF("k", "v")
    val chg = Seq(
      (Some(1L), Option.empty[Int], 1L, "U"),   // null payload survives as-is
      (Option.empty[Long], Some(99), 1L, "U")   // NULL key groups/joins <=>-
        // free here: groupBy keeps it; anti-join equality can't match it,
        // so a null-key snapshot row would be untouchable — documented
    ).toDF("k", "v", "seq", "op")
    val out = Analytics.applyChangelog(snap, chg, "k", Seq("seq"), "op")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out === Map(Some(1L) -> None, None -> Some(99)))
  }

  test("funnelWindowed: null ts/type rows never anchor; single-step funnel") {
    import graft.operators.Analytics
    val ev = Seq(
      ("u1", Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")), Some("view")),
      ("u1", Option.empty[java.sql.Timestamp], Some("click")), // null ts: no anchor
      ("u1", Some(java.sql.Timestamp.valueOf("2024-01-01 10:30:00")), Option.empty[String]),
      ("u2", Some(java.sql.Timestamp.valueOf("2024-01-01 09:00:00")), Some("view"))
    ).toDF("user_id", "t", "event_type")
    val out = Analytics.funnelWindowed(ev, "user_id", "t", "event_type",
        Seq("view", "click"), windowSeconds = 3600)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    // u1's click has a null ts (min ignores it), the null-typed row
    // matches no step — nobody reaches step 2
    assert(out === Map(1 -> 2L, 2 -> 0L))
    // a one-step funnel degenerates to the step-1 count
    val one = Analytics.funnelWindowed(ev, "user_id", "t", "event_type",
        Seq("view"), windowSeconds = 60)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(one === Map(1 -> 2L))
  }

  test("mergeComponents: pairs naming unknown ids are ignored, not invented") {
    import graft.operators.Dedup
    val base = Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "component_id")
    val fresh = Seq(Tuple1(3L)).toDF("doc_id")
    // 99 exists nowhere: the (3, 99) edge must not conjure a node or
    // crash — 3 stays its own component (documented contract: pairs
    // must reference known ids; unknown endpoints drop in contraction)
    val pairs = Seq((3L, 99L)).toDF("id_a", "id_b")
    val out = Dedup.mergeComponents(base, fresh, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("uniform/weighted samplers: NULL group is a real group, not dropped") {
    import graft.operators.Scale
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, Some("a"), 10.0),
      (3L, Option.empty[String], 5.0), (4L, Option.empty[String], 5.0)
    ).toDF("id", "grp", "w")
    // k=1 keeps exactly one row per group INCLUDING the null group
    val u = Scale.uniformGroupSample(df, "grp", "id", 1).collect()
    assert(u.length === 2 && u.exists(_.isNullAt(1)))
    val w = Scale.weightedGroupSample(df, "grp", "id", "w", 1).collect()
    assert(w.length === 2 && w.exists(_.isNullAt(1)))
  }

  test("gapFillForward/activeIntervals: null days and bounds stay sane") {
    import graft.operators.Analytics
    // a null day never joins a calendar cell and never extends bounds
    val daily = Seq(
      ("a", Some(java.sql.Date.valueOf("2024-01-01")), 1.0),
      ("a", Option.empty[java.sql.Date], 99.0)
    ).toDF("k", "day", "v")
    val rows = Analytics.gapFillForward(daily, "k", "day", "v").collect()
    assert(rows.length === 1 && rows.head.getDouble(2) === 1.0)
    // null interval ends contribute no boundary; counts stay exact
    val iv = Seq(
      (Some(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
        Some(java.sql.Timestamp.valueOf("2024-01-01 11:00:00"))),
      (Option.empty[java.sql.Timestamp],
        Some(java.sql.Timestamp.valueOf("2024-01-01 10:30:00")))
    ).toDF("s", "e")
    val act = Analytics.activeIntervals(iv, "s", "e")
      .filter(col("t").isNotNull)
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    assert(act("2024-01-01 10:00:00.0") === 1L)
    assert(act("2024-01-01 11:00:00.0") === 1L)
  }

  test("session-4 operators: nulls and NaN degrade to nothing, never poison") {
    import spark.implicits._
    import graft.operators.Analytics
    // dbscan: an EMPTY pair frame means every point is noise
    val pts = Seq(1L, 2L, 3L).toDF("id")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val roles = Similarity.dbscan(pts, "id", noPairs, minPts = 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(roles === Set(("noise", -1L)))
    // MRL: null AND NaN values are dropped, not folded into quantiles
    val vals = Seq((1L, Some(1.0)), (1L, Some(3.0)),
      (1L, Option.empty[Double]), (1L, Some(Double.NaN))).toDF("g", "v")
    val mrl = graft.functions.Mrl.groupQuantiles(vals, "g", "v",
        k = 8, Seq(0.5, 1.0)).collect().head
    assert(mrl.getAs[Long]("n") === 2L)
    assert(mrl.getAs[scala.collection.Seq[Double]]("values").toSeq ===
      Seq(1.0, 3.0))
    // attribution: null user/ts rows neither convert nor credit
    val ev = Seq(
      (Some(1L), Some("2024-01-01 10:00:00"), "click", 1L),
      (Some(1L), Some("2024-01-01 11:00:00"), "purchase", 2L),
      (Option.empty[Long], Some("2024-01-01 10:30:00"), "click", 3L),
      (Some(1L), Option.empty[String], "purchase", 4L)
    ).toDF("user_id", "ts", "event_type", "event_id")
      .withColumn("ts", col("ts").cast("timestamp"))
    val att = Analytics.touchAttribution(ev, "user_id", "ts",
        "event_type", "event_id", "purchase", Seq("click", "view"), 7)
      .collect()
    val credited = att.filter(!_.isNullAt(5)).map(_.getLong(1))
    assert(credited.toSeq === Seq(2L)) // only the real conversion
    // keyphrases: null/empty texts contribute no candidates
    val docs = Seq((1L, "big data the big data"),
      (2L, null.asInstanceOf[String]), (3L, "")).toDF("doc_id", "text")
    val kp = TextAnalysis.keyphrases(docs, "doc_id", "text",
        minLen = 2, maxLen = 4, minCount = 1L)
      .collect().map(_.getString(0)).toSeq
    assert(kp === Seq("big data"))
    // sequenceGaps: null ids excluded, not a gap terminus
    val gaps = Analytics.sequenceGaps(
        Seq(Some(1L), Some(2L), Option.empty[Long], Some(5L)).toDF("id"),
        "id", bucketSize = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(gaps === Seq((3L, 4L)))
  }
}
