package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The SQL function surface injected by `GraftExtensions` must resolve
  * in a `GraftSession` and compute exactly what the DataFrame-side
  * Column wrappers compute. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("injected SQL functions resolve and match the Column API") {
    Seq((1L, "the cat is here", "café"))
      .toDF("id", "text", "accented")
      .createOrReplaceTempView("ext_docs")
    val row = spark.sql(
      """SELECT nfc_normalize(accented) AS nfc,
                lang_id(text) AS lang,
                text_stats(text).token_count AS tc,
                simhash64(split(trim(text), '\\s+')) AS sig,
                random_project(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)), 4) AS proj
         FROM ext_docs""").collect().head
    assert(row.getString(0) === "caf\u00e9")
    assert(row.getString(1) === "en")
    assert(row.getInt(2) === 4)
    val viaColumns = Seq("the cat is here").toDF("text")
      .select(
        graft.expressions.SimHashExpressions.simhash64(
          TextAnalysis.tokens(col("text")), portable = false).as("sig"))
      .collect().head.getLong(0)
    assert(row.getLong(3) === viaColumns)
    assert(row.getSeq[Double](4).length === 4)
  }

  test("confusable_skeleton / confusable_count: SQL ≡ Column API") {
    // "pаypаl" with Cyrillic а (U+0430) twice + a fullwidth Ａ
    Seq(Tuple1("pаypаl ＡBC plain")).toDF("text")
      .createOrReplaceTempView("ext_conf")
    val row = spark.sql(
      """SELECT confusable_skeleton(text) AS skel,
                confusable_count(text) AS n
         FROM ext_conf""").collect().head
    assert(row.getString(0) === "paypal ABC plain")
    assert(row.getLong(1) === 3L)
    val viaColumns = Seq(Tuple1("pаypаl ＡBC plain"))
      .toDF("text")
      .select(TextAnalysis.confusableSkeleton(col("text")).as("s"),
        TextAnalysis.confusableCount(col("text")).as("n"))
      .collect().head
    assert(row.getString(0) === viaColumns.getString(0))
    assert(row.getLong(1) === viaColumns.getLong(1))
  }

  test("literal-argument validation fails loudly, not silently") {
    Seq(Tuple1(Array(1.0f))).toDF("v").createOrReplaceTempView("ext_vecs")
    val e = intercept[Exception] {
      spark.sql("SELECT random_project(v, CAST(2 AS BIGINT)) FROM ext_vecs")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("zorder_key: SQL ≡ Column API on anchors and a round trip") {
    val rows = spark.sql(
      """SELECT zorder_key(1, 0) AS a, zorder_key(0, 1) AS b,
                zorder_key(3, 0) AS c, zorder_key(12345, 67890) AS d""")
      .collect().head
    assert(rows.getLong(0) === 1L)
    assert(rows.getLong(1) === 2L)
    assert(rows.getLong(2) === 5L)
    val viaColumn = Seq((12345L, 67890L)).toDF("x", "y")
      .select(graft.functions.ZOrder.zValue(col("x"), col("y")))
      .collect().head.getLong(0)
    assert(rows.getLong(3) === viaColumn)
  }

  test("gopher_stats / dedup_lines: SQL ≡ operator semantics") {
    Seq((1L, "menu\nThe cat sat down.\nmenu\n- item"))
      .toDF("id", "text").createOrReplaceTempView("ext_docs2")
    val row = spark.sql(
      """SELECT gopher_stats(text).n_words AS nw,
                gopher_stats(text).n_lines AS nl,
                gopher_stats(text).bullet_lines AS bl,
                dedup_lines(text) AS dl
         FROM ext_docs2""").collect().head
    assert(row.getInt(0) === 8)   // whitespace tokens across all lines
    assert(row.getInt(1) === 4)
    assert(row.getInt(2) === 1)   // "- item"
    assert(row.getString(3) === "menu\nThe cat sat down.\n- item")
    // dedup_lines(SQL) ≡ TextAnalysis.dedupLines text column
    val viaOp = TextAnalysis.dedupLines(
        Seq((1L, "menu\nThe cat sat down.\nmenu\n- item")).toDF("id", "t"),
        "id", "t")
      .collect().head.getString(1)
    assert(row.getString(3) === viaOp)
  }

  // ----- table-valued functions: SQL-only end-to-end drives -----

  test("simhash_near_dups TVF: a SQL-only dedup run ≡ the Scala operator") {
    Tables.documents(spark, sf).createOrReplaceTempView("tvf_docs")
    val sqlRows = spark.sql(
      """SELECT id_a, id_b, hamming
         FROM simhash_near_dups('tvf_docs', 'doc_id', 'text', 3)
         ORDER BY id_a, id_b""").collect().toSeq
    val apiRows = graft.operators.Dedup.simhashNearDupPairs(
        Tables.documents(spark, sf), "doc_id", "text", maxDist = 3)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(sqlRows === apiRows)
    assert(sqlRows.nonEmpty)
  }

  test("boilerplate_lines TVF ≡ the Scala operator") {
    Tables.documents(spark, sf)
      .select(col("doc_id"),
        regexp_replace(col("text"), " the ", "\n").as("text"))
      .createOrReplaceTempView("tvf_bp_docs")
    val sqlRows = spark.sql(
      """SELECT doc_id, text, n_lines, n_dropped
         FROM boilerplate_lines('tvf_bp_docs', 'doc_id', 'text', 3)
         ORDER BY doc_id""").collect().toSeq
    val apiRows = graft.operators.Dedup.boilerplateLines(
        spark.table("tvf_bp_docs"), "doc_id", "text", minDupDocs = 3)
      .orderBy("doc_id").collect().toSeq
    assert(sqlRows === apiRows)
    assert(sqlRows.exists(_.getLong(3) > 0)) // real drops on the fixture
  }

  test("main_content TVF ≡ the Scala operator") {
    Tables.documents(spark, sf)
      .select(col("doc_id"), concat(
        lit("<html><body><div class=\"nav\"><a href=\"/\">Home</a></div><p>"),
        col("text"),
        lit("</p><footer>Copyright</footer></body></html>")).as("html"))
      .createOrReplaceTempView("tvf_mc_docs")
    val sqlRows = spark.sql(
      """SELECT doc_id, main_text, n_blocks, n_kept
         FROM main_content('tvf_mc_docs', 'doc_id', 'html', 5)
         ORDER BY doc_id""").collect().toSeq
    val apiRows = graft.functions.TextAnalysis.mainContent(
        spark.table("tvf_mc_docs"), "doc_id", "html", minWords = 5)
      .orderBy("doc_id").collect().toSeq
    assert(sqlRows === apiRows)
    assert(sqlRows.forall(_.getLong(3) >= 1)) // body paragraph survives
    assert(sqlRows.forall(!_.getString(1).contains("Home"))) // nav gone
  }

  test("embedding_topk TVF: a SQL-only ANN query ≡ the Scala operator") {
    val emb = Tables.embeddings(spark, sf)
    emb.createOrReplaceTempView("tvf_emb")
    emb.filter(col("vec_id") < 5).createOrReplaceTempView("tvf_q")
    val sqlRows = spark.sql(
      """SELECT query_id, neighbor_id, rank, cos
         FROM embedding_topk('tvf_emb', 'tvf_q', 'vec_id', 'embedding', 5)
         ORDER BY query_id, rank""").collect().toSeq
    val apiRows = graft.operators.Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(sqlRows === apiRows)
    assert(sqlRows.size === 25)
  }

  test("asof_join TVF ≡ the Scala operator, composable with further SQL") {
    import spark.implicits._
    Seq((1L, 10L, "a1"), (1L, 20L, "a2"), (2L, 15L, "b1"))
      .toDF("k", "ts", "obs").createOrReplaceTempView("tvf_left")
    Seq((1L, 5L, 100.0), (1L, 18L, 200.0), (2L, 30L, 300.0))
      .toDF("k", "ts", "px").createOrReplaceTempView("tvf_right")
    val sqlRows = spark.sql(
      """SELECT k, ts, obs, px
         FROM asof_join('tvf_left', 'tvf_right', 'k', 'ts', 'px')
         ORDER BY k, ts""").collect().toSeq
    val apiRows = graft.operators.AsOf.asofJoin(
        spark.table("tvf_left"), "k", "ts",
        spark.table("tvf_right"), "k", "ts", Seq("px"))
      .select("k", "ts", "obs", "px")
      .orderBy("k", "ts").collect().toSeq
    assert(sqlRows === apiRows)
    // backward semantics spot-check: (1, 20) sees the ts=18 price;
    // (2, 15) has no right row at-or-before → NULL
    val byKey = sqlRows.map(r => (r.getLong(0), r.getLong(1)) -> r.get(3)).toMap
    assert(byKey((1L, 20L)) === 200.0)
    assert(byKey((2L, 15L)) === null)
  }

  test("TVF argument validation fails loudly") {
    Tables.documents(spark, sf).createOrReplaceTempView("tvf_docs2")
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM simhash_near_dups('tvf_docs2', 'doc_id', 'text', 'wide')")
      .collect())
    assert(e.getMessage.contains("max_dist") ||
      Option(e.getCause).exists(_.getMessage.contains("max_dist")))
  }
}
