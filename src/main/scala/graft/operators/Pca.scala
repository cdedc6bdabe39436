package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed PCA for embedding columns — the preprocessing step the
  * semantic-dedup / clustering literature applies before SemDeDup-style
  * pipelines (reduce d, whiten, THEN cluster).
  *
  * Architecture is the mini-batch-k-means split
  * (`Similarity.trainCentroidsMiniBatch`): the corpus-sized work is ONE
  * streaming pass that accumulates the d-vector of sums and the
  * d(d+1)/2 upper triangle of the second-moment matrix in a bounded
  * typed-Aggregator buffer — each partition contributes ONE ≈d²/2
  * -double buffer to the merge, no explode, no shuffle of vectors —
  * while the d×d eigenproblem is solved on the driver (for d = 64,
  * 32 KB — the same "k·dim doubles on the driver" budget as centroid
  * training; the driver never sees a row). Eigenvectors come from
  * FIXED-ITERATION power iteration with deflation: a deterministic,
  * engine-replayable construction (the PageRank fixed-recurrence
  * precedent) rather than a library eigensolver the DuckDB oracle
  * could not restate.
  *
  * Float caveat (the ANN family's standing one): partial-buffer merge
  * order varies with partitioning, so second moments carry last-ulp
  * noise run to run; normalized power iteration is
  * perturbation-stable (contraction ≤ λ₂/λ₁ per step), so projections
  * agree cross-engine to ~1e-13 — far inside the oracle tolerance.
  *
  * Reference scope: extension surface (no vector ops in the 485-line
  * reference job).
  */
object Pca {

  /** n rows, Σx (d doubles), upper-triangular Σxxᵀ (d(d+1)/2). Arrays
    * are mutated in place during a partition's reduce — only the merge
    * boundary pays encoding. */
  final case class GramBuf(n: Long, s: Array[Double], g: Array[Double])

  private def triIndex(d: Int, i: Int, j: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i) // requires i <= j

  def gramAggregator(d: Int): Aggregator[Seq[Double], GramBuf, GramBuf] =
    new Aggregator[Seq[Double], GramBuf, GramBuf] {
      override def zero: GramBuf =
        GramBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
      override def reduce(b: GramBuf, x: Seq[Double]): GramBuf = {
        require(x.length == d,
          s"dimension mismatch: expected $d, got ${x.length}")
        val xa = x.toArray
        var i = 0
        var t = 0
        while (i < d) {
          b.s(i) += xa(i)
          var j = i
          while (j < d) { b.g(t) += xa(i) * xa(j); j += 1; t += 1 }
          i += 1
        }
        b.copy(n = b.n + 1)
      }
      override def merge(a: GramBuf, b: GramBuf): GramBuf = {
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        var t = 0
        while (t < a.g.length) { a.g(t) += b.g(t); t += 1 }
        a.copy(n = a.n + b.n)
      }
      override def finish(r: GramBuf): GramBuf = r
      override def bufferEncoder: Encoder[GramBuf] = ExpressionEncoder()
      override def outputEncoder: Encoder[GramBuf] = ExpressionEncoder()
    }

  /** One pass over `df(vecCol)` (array<numeric>): (n, mean, covariance)
    * with cov = E[xxᵀ] − μμᵀ, driver-resident (d×d). Null vectors are
    * dropped; inconsistent dimensions throw. */
  def covariance(df: DataFrame, vecCol: String): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>")).as[Seq[Double]]
    val dim = vecs.head().length
    val buf = vecs.select(gramAggregator(dim).toColumn).head()
    require(buf.n > 0, "covariance of an empty frame")
    val n = buf.n.toDouble
    val mean = buf.s.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = buf.g(triIndex(dim, i, j)) / n - mean(i) * mean(j)
        cov(i)(j) = c
        cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    (buf.n, mean, cov)
  }

  /** Top-r eigenpairs of a symmetric matrix by FIXED-count power
    * iteration + deflation, from the deterministic uniform init
    * v₀ = 1/√d. Returns (eigenvector, λ = vᵀCv) in decreasing order.
    * Fixed iterations make the construction engine-replayable; callers
    * wanting convergence raise `iters`. */
  def topComponents(cov: Array[Array[Double]], r: Int,
      iters: Int): Seq[(Array[Double], Double)] = {
    val d = cov.length
    require(r >= 1 && r <= d && iters >= 1)
    val c = cov.map(_.clone())
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var acc = 0.0
        var j = 0
        while (j < d) { acc += c(i)(j) * v(j); j += 1 }
        acc
      }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    (0 until r).map { _ =>
      var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      for (_ <- 0 until iters) {
        val w = matVec(v)
        val nw = norm(w)
        require(nw > 0, "power iteration collapsed to the null space")
        v = w.map(_ / nw)
      }
      val lambda = {
        val cv = matVec(v)
        var acc = 0.0
        var i = 0
        while (i < d) { acc += v(i) * cv(i); i += 1 }
        acc
      }
      // deflate: C ← C − λ v vᵀ
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { c(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (v, lambda)
    }
  }

  /** Project each vector onto `comps` about `mean`:
    * (idCol, proj array<double>) with proj_k = ⟨x, v_k⟩ − ⟨μ, v_k⟩ —
    * the centering collapses to one constant per component, so the row
    * side is r codegen'd dot products against broadcast literals. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      mean: Array[Double], comps: Seq[Array[Double]]): DataFrame = {
    val projCols = comps.map { v =>
      val mu = mean.zip(v).map { case (m, w) => m * w }.sum
      Similarity.dotProduct(col(vecCol).cast("array<double>"),
        array(v.map(lit).toIndexedSeq: _*)) - lit(mu)
    }
    df.filter(col(vecCol).isNotNull)
      .select(col(idCol), array(projCols: _*).as("proj"))
  }

  /** The registered composition: covariance pass → `iters`-step top
    * component → per-row scalar projection (idCol, proj double). */
  def projectTop(df: DataFrame, idCol: String, vecCol: String,
      iters: Int = 10): DataFrame = {
    val (_, mean, cov) = covariance(df, vecCol)
    val Seq((v1, _)) = topComponents(cov, 1, iters)
    project(df, idCol, vecCol, mean, Seq(v1))
      .select(col(idCol), element_at(col("proj"), 1).as("proj"))
  }
}
