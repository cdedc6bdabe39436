package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType}

import org.apache.spark.sql.catalyst.{expressions => cexpr}

import graft.expressions.{FoldAccents, LangId, NfcNormalize, RandomProject, SimHash64, TextStats}
import graft.{expressions => gexpr}

/** `SparkSessionExtensions` entry point: registers graft's custom
  * Catalyst expressions as SQL FUNCTIONS, so `spark.sql` users get the
  * same codegen'd operators the DataFrame API exposes —
  *
  * {{{
  *   spark.conf: spark.sql.extensions=graft.GraftExtensions
  *   SELECT nfc_normalize(text),
  *          lang_id(text),
  *          text_stats(text).token_count,
  *          simhash64(split(trim(text), '\\s+')),
  *          random_project(embedding, 16)
  *   FROM documents
  * }}}
  *
  * This is the `injectFunction` face of the extension API only: graft
  * deliberately ships NO custom optimizer rules or physical strategies,
  * because every operator composes from Catalyst-native plans that the
  * built-in optimizer already handles (SURVEY.md §4 — the "custom
  * `Rule`/`SparkStrategy`: none required" verdict). Wired into
  * `GraftSession` so every engine session has the SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def boolLit(e: Expression, fn: String, arg: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a boolean literal, got $other")
  }

  private def strLit(e: Expression, fn: String, arg: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String,
      org.apache.spark.sql.types.StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  /** TVF table argument: resolved through the ACTIVE session's catalog
    * (temp views included) — TVF arguments are expressions, so the
    * table rides in as a name literal. */
  private def tableOf(name: String): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.SparkSession.active.table(name)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize", "nfc_normalize(str) - Unicode NFC canonical composition"),
      { case Seq(child) => NfcNormalize(child) }))

    ext.injectFunction((FunctionIdentifier("fold_accents"),
      info("fold_accents",
        "fold_accents(str) - strip diacritics (NFD, drop Mn, NFC); DuckDB strip_accents twin"),
      { case Seq(child) => FoldAccents(child) }))

    ext.injectFunction((FunctionIdentifier("confusable_skeleton"),
      info("confusable_skeleton",
        "confusable_skeleton(str) - fold UTS #39 homoglyph confusables " +
          "(Cyrillic/Greek Latin-lookalikes, fullwidth block) onto " +
          "their Latin skeletons"),
      { case Seq(child) =>
        cexpr.StringTranslate(child,
          Literal(graft.functions.TextAnalysis.ConfusableFrom),
          Literal(graft.functions.TextAnalysis.ConfusableTo)) }))

    ext.injectFunction((FunctionIdentifier("confusable_count"),
      info("confusable_count",
        "confusable_count(str) - number of confusable codepoints in " +
          "str (the spoofing signal)"),
      { case Seq(child) =>
        cexpr.Cast(cexpr.Subtract(
          cexpr.Length(child),
          cexpr.Length(cexpr.StringTranslate(child,
            Literal(graft.functions.TextAnalysis.ConfusableFrom),
            Literal("")))),
          org.apache.spark.sql.types.LongType) }))

    ext.injectFunction((FunctionIdentifier("lang_id"),
      info("lang_id", "lang_id(str) - marker-word language identification"),
      { case Seq(child) =>
        LangId(child, graft.functions.TextAnalysis.langMarkers) }))

    ext.injectFunction((FunctionIdentifier("text_stats"),
      info("text_stats",
        "text_stats(str) - struct(token_count, char_count, punct_count, stopword_count, token_len_sum) in one scan"),
      { case Seq(child) =>
        TextStats(child, graft.functions.TextAnalysis.stopwords) }))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64",
        "simhash64(array<string>[, portable]) - 64-bit SimHash of a token array"),
      {
        case Seq(child) => SimHash64(child, portable = false)
        case Seq(child, p) =>
          SimHash64(child, boolLit(p, "simhash64", "portable"))
      }))

    ext.injectFunction((FunctionIdentifier("random_project"),
      info("random_project",
        "random_project(array<float>, out_dim) - JL projection with the hash-derived ±1 matrix"),
      { case Seq(child, dim) =>
        RandomProject(child, intLit(dim, "random_project", "out_dim")) }))

    // zorder_key composes built-in bitwise expressions rather than a
    // custom Expression — same codegen path either way, and SQL users
    // get the layout key for free
    ext.injectFunction((FunctionIdentifier("zorder_key"),
      info("zorder_key",
        "zorder_key(x, y) - 64-bit Morton interleave of two unsigned-32-bit keys"),
      { case Seq(x, y) => graft.functions.ZOrder.zValueExpr(x, y) }))

    ext.injectFunction((FunctionIdentifier("gopher_stats"),
      info("gopher_stats",
        "gopher_stats(str) - one-scan Gopher rule measurements struct " +
          "(n_words, token_len_sum, symbols, n_lines, bullet_lines, " +
          "ellipsis_lines, alpha_words, stop_hits)"),
      { case Seq(child) =>
        gexpr.GopherStats(child, graft.functions.TextAnalysis.gopherStops) }))

    // the RefinedWeb boilerplate pass as a scalar: keep each distinct
    // line at its first occurrence — composed from codegen'd built-ins,
    // zero shuffle
    ext.injectFunction((FunctionIdentifier("dedup_lines"),
      info("dedup_lines",
        "dedup_lines(str) - drop repeated lines, first occurrence kept in order"),
      { case Seq(child) =>
        cexpr.ArrayJoin(
          cexpr.ArrayDistinct(cexpr.StringSplit(child,
            Literal("\n"), Literal(-1))),
          Literal("\n"), None) }))

    // ----- table-valued functions: the flagship TABLE-level operators,
    // SQL-callable so a SQL-only user can drive the engine end to end
    // (`SELECT * FROM simhash_near_dups('docs', 'doc_id', 'text', 3)`).
    // Each TVF resolves its table-name literals against the active
    // session's catalog, builds the SAME DataFrame pipeline the Scala
    // API returns, and hands its analyzed plan to the resolver — one
    // implementation, two surfaces, zero drift.

    ext.injectTableFunction((FunctionIdentifier("simhash_near_dups"),
      info("simhash_near_dups",
        "simhash_near_dups(table, id_col, text_col, max_dist) - SimHash " +
          "near-duplicate pairs (id_a, id_b, hamming) via banded signatures"),
      { case Seq(t, id, text, d) =>
        graft.operators.Dedup.simhashNearDupPairs(
            tableOf(strLit(t, "simhash_near_dups", "table")),
            strLit(id, "simhash_near_dups", "id_col"),
            strLit(text, "simhash_near_dups", "text_col"),
            intLit(d, "simhash_near_dups", "max_dist"))
          .queryExecution.logical }))

    ext.injectTableFunction((FunctionIdentifier("embedding_topk"),
      info("embedding_topk",
        "embedding_topk(corpus_table, queries_table, id_col, vec_col, k) - " +
          "exact cosine top-k (query_id, neighbor_id, rank, cos)"),
      { case Seq(c, q, id, vec, k) =>
        graft.operators.Similarity.bruteForceTopK(
            tableOf(strLit(c, "embedding_topk", "corpus_table")),
            tableOf(strLit(q, "embedding_topk", "queries_table")),
            strLit(id, "embedding_topk", "id_col"),
            strLit(vec, "embedding_topk", "vec_col"),
            intLit(k, "embedding_topk", "k"))
          .queryExecution.logical }))

    ext.injectTableFunction((FunctionIdentifier("asof_join"),
      info("asof_join",
        "asof_join(left_table, right_table, key_col, ts_col, value_col) - " +
          "backward as-of: each left row takes value_col from the latest " +
          "right row at-or-before its timestamp"),
      { case Seq(l, r, key, ts, v) =>
        val keyC = strLit(key, "asof_join", "key_col")
        val tsC = strLit(ts, "asof_join", "ts_col")
        graft.operators.AsOf.asofJoin(
            tableOf(strLit(l, "asof_join", "left_table")), keyC, tsC,
            tableOf(strLit(r, "asof_join", "right_table")), keyC, tsC,
            Seq(strLit(v, "asof_join", "value_col")))
          .queryExecution.logical }))

    ext.injectTableFunction((FunctionIdentifier("boilerplate_lines"),
      info("boilerplate_lines",
        "boilerplate_lines(table, id_col, text_col, min_dup_docs) - " +
          "remove lines occurring in >= min_dup_docs distinct documents " +
          "(id, text, n_lines, n_dropped)"),
      { case Seq(t, id, text, m) =>
        graft.operators.Dedup.boilerplateLines(
            tableOf(strLit(t, "boilerplate_lines", "table")),
            strLit(id, "boilerplate_lines", "id_col"),
            strLit(text, "boilerplate_lines", "text_col"),
            intLit(m, "boilerplate_lines", "min_dup_docs"))
          .queryExecution.logical }))

    ext.injectTableFunction((FunctionIdentifier("main_content"),
      info("main_content",
        "main_content(table, id_col, html_col, min_words) - block-level " +
          "main-content extraction (text-density + link-density gates); " +
          "(doc_id, main_text, n_blocks, n_kept)"),
      { case Seq(t, id, html, mw) =>
        graft.functions.TextAnalysis.mainContent(
            tableOf(strLit(t, "main_content", "table")),
            strLit(id, "main_content", "id_col"),
            strLit(html, "main_content", "html_col"),
            minWords = intLit(mw, "main_content", "min_words"))
          .queryExecution.logical }))
  }
}
