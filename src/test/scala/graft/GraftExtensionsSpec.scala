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
}
