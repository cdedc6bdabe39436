package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Classifier-grade language ID: hashed character-n-gram INTEGER-weight
  * linear heads, one per language — the [[ClassifierScore]] machinery
  * with k heads, upgrading the marker-word argmax ([[LangId]]) to the
  * Cavnar–Trenkle n-gram-profile method (Cavnar & Trenkle '94) in
  * hashed-feature form. Each whitespace token is boundary-padded
  * (`_tok_`) and its char 2- and 3-grams hashed to `buckets` via the
  * repo's portable sha52; score_l = Σ_g c_g · w_l[bucket(g)] in pure
  * BIGINT, so every score — and therefore the argmax, the margin, and
  * the oracle compare — is engine-exact. Profile n-grams match PARTIAL
  * word evidence ("der" inside "oder", "la" inside "tabla") where the
  * marker argmax needs exact function-word hits — the upgrade that
  * routes non-English text after `scriptMix`.
  *
  * Tokenization parity: space-only trim + Java `\s+` split (the
  * [[ClassifierScore]] contract); BMP text only (grams are UTF-16 char
  * slices, the [[BpeEncode]] constraint — DuckDB's codepoint substring
  * agrees on the BMP). Heads ship dense (`langs.length × buckets`
  * longs, model-sized) inside the codegen reference object — one
  * scan-local pass, ZERO shuffles, no join.
  *
  * Output struct (lang string, score long, margin long): lang = argmax
  * (ties → declaration order), "und" when the best score is 0; margin
  * = best − second-best (how confident the routing is — the gate a
  * pipeline thresholds before trusting the label). Null text → null. */
case class LangIdScores(child: Expression, langs: Seq[String],
    flatWeights: Array[Long]) extends UnaryExpression {

  require(langs.nonEmpty, "lang_id_scores needs at least one language head")
  require(flatWeights.length % langs.length == 0,
    s"weight matrix ${flatWeights.length} not a multiple of ${langs.length} langs")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string, got $t")
  }

  override def dataType: DataType = LangIdScores.schema

  override def prettyName: String = "lang_id_scores"

  @transient private lazy val table: LangIdScores.Heads =
    new LangIdScores.Heads(langs.toArray, flatWeights,
      flatWeights.length / langs.length)

  override protected def nullSafeEval(input: Any): Any =
    LangIdScores.compute(input.asInstanceOf[UTF8String].toString, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("langHeads", table,
      "graft.expressions.LangIdScores$Heads")
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.expressions.LangIdScores.compute(" +
        s"$input.toString(), $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdScores =
    copy(child = newChild)
}

object LangIdScores {

  val schema: StructType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("score", LongType, nullable = false),
    StructField("margin", LongType, nullable = false)))

  final class Heads(val langs: Array[String], val w: Array[Long],
      val buckets: Int) extends Serializable

  private def spaceTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private def sha52(md: MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(6) & 0xffL) >>> 4)
  }

  /** Boundary-padded char 2-/3-grams of one token — THE feature
    * definition, shared by head-building ([[profileHeads]]) and doc
    * scoring so the two can never drift. */
  def tokenGrams(tok: String): Seq[String] = {
    val p = "_" + tok + "_"
    (2 to 3).flatMap { n =>
      (0 to p.length - n).map(i => p.substring(i, i + n))
    }
  }

  /** Build the dense per-language head matrix from marker lexicons:
    * w_l[bucket] = multiplicity of language l's profile n-grams hashing
    * there. Deterministic, engine-free — the same triples feed the
    * oracle's VALUES literal. */
  def profileHeads(markers: Seq[(String, Seq[String])],
      buckets: Int): (Seq[String], Array[Long]) = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    val md = MessageDigest.getInstance("SHA-256")
    val langs = markers.map(_._1)
    val w = new Array[Long](langs.length * buckets)
    markers.zipWithIndex.foreach { case ((_, words), l) =>
      words.foreach { word =>
        tokenGrams(word).foreach { g =>
          w(l * buckets + (sha52(md, g) % buckets).toInt) += 1L
        }
      }
    }
    (langs, w)
  }

  /** The nonzero (lang, bucket, w) triples of [[profileHeads]] — the
    * artifact the oracle ships as a VALUES literal. */
  def headTriples(markers: Seq[(String, Seq[String])],
      buckets: Int): Seq[(String, Int, Long)] = {
    val (langs, w) = profileHeads(markers, buckets)
    for {
      l <- langs.indices
      b <- 0 until buckets
      if w(l * buckets + b) != 0L
    } yield (langs(l), b, w(l * buckets + b))
  }

  def compute(text: String, t: Heads): GenericInternalRow = {
    val k = t.langs.length
    val scores = new Array[Long](k)
    val trimmed = spaceTrim(text)
    if (trimmed.nonEmpty) {
      val md = MessageDigest.getInstance("SHA-256")
      val toks = trimmed.split("\\s+", -1)
      var ti = 0
      while (ti < toks.length) {
        val tok = toks(ti)
        if (tok.nonEmpty) {
          val p = "_" + tok + "_"
          var n = 2
          while (n <= 3) {
            var i = 0
            while (i + n <= p.length) {
              val b = (sha52(md, p.substring(i, i + n)) % t.buckets).toInt
              var l = 0
              while (l < k) { scores(l) += t.w(l * t.buckets + b); l += 1 }
              i += 1
            }
            n += 1
          }
        }
        ti += 1
      }
    }
    var best = 0
    var l = 1
    while (l < k) { if (scores(l) > scores(best)) best = l; l += 1 }
    var second = 0L
    l = 0
    while (l < k) {
      if (l != best && scores(l) > second) second = scores(l)
      l += 1
    }
    val lang = if (scores(best) == 0L) "und" else t.langs(best)
    new GenericInternalRow(Array[Any](UTF8String.fromString(lang),
      scores(best), if (k == 1) scores(best) else scores(best) - second))
  }

  def score(text: Column, markers: Seq[(String, Seq[String])],
      buckets: Int): Column = {
    val (langs, w) = profileHeads(markers, buckets)
    Bridge.column(LangIdScores(Bridge.expression(text), langs, w))
  }
}
