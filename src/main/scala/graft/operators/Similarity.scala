package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column:
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH-bucketed variant as the approximate scale path.
  *
  * All arithmetic is `zip_with`/`aggregate` over the array columns,
  * cast to double BEFORE multiplying so Spark and the DuckDB oracle
  * (`::DOUBLE[]` + `list_dot_product`) accumulate identically within
  * float tolerance. No UDFs — the dot products live inside whole-stage
  * codegen next to the scan.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, sequential left fold (matches DuckDB).
    * Backed by the custom codegen'd `DotProductDouble` Catalyst
    * expression — a `zip_with`+`aggregate` formulation is semantically
    * identical but runs interpreted (HOFs don't codegen), which costs
    * ~an order of magnitude on pairwise similarity joins. */
  def dotProduct(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.dotDouble(a, b)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * Plan shape: broadcast the (small) query set against the corpus —
    * a BroadcastNestedLoopJoin that streams the 100 TB side once with
    * no shuffle — then one exchange on query_id for the per-query top-k
    * window. Norms are computed once per side, not once per pair.
    * Deterministic: ties break on neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cnorm", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qnorm", l2Norm(col("qv")))

    // project the arrays away BEFORE the ranking window: only
    // (query_id, neighbor_id, cos) shuffles into the per-query sort
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotProduct(col("cv"), col("qv")) / (col("cnorm") * col("qnorm"))).as("cos"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic random hyperplanes: `numPlanes × dim` entries in
    * {-1,+1} from a fixed-seed PRNG, embedded as a literal array — no
    * data, no broadcast variable, identical on every executor. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  /** Sign-bucket id of a vector under one table of `planes`: bit h =
    * sign(v · plane_h). Packed to an int. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { p =>
      val planeCol = array(p.map(lit): _*)
      when(dotProduct(vec, planeCol) >= 0, 1).otherwise(0)
    }
    bits.reduceLeft((acc, b) => acc * 2 + b)
  }

  /** Approximate top-k: candidates = corpus vectors sharing an LSH
    * bucket with the query in ANY of `numTables` independent tables;
    * exact cosine + top-k on the candidates only.
    *
    * Scale: each table is an equi-join on (table, bucket) — a hash
    * shuffle whose key cardinality is 2^bitsPerTable × numTables; the
    * 100 TB side is scanned once to emit numTables bucket rows per
    * vector, and the expensive exact cosine runs on the candidate set
    * only (expected n × bucketOccupancy ≪ n²). Recall tunes with
    * numTables; bucket width with bitsPerTable.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bitsPerTable: Int = 4, numTables: Int = 16,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val allPlanes = hyperplanes(bitsPerTable * numTables, dim, seed)
    def bucketed(df: DataFrame, side: String): DataFrame = {
      val buckets = (0 until numTables).map { t =>
        struct(lit(t).as("tbl"),
          lshBucket(col(s"${side}v"),
            allPlanes.slice(t * bitsPerTable, (t + 1) * bitsPerTable)).as("bkt"))
      }
      df.withColumn("tb", explode(array(buckets: _*)))
        .select(df.columns.map(col) :+ col("tb.tbl").as("tbl") :+ col("tb.bkt").as("bkt"): _*)
    }

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cnorm", l2Norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qnorm", l2Norm(col("qv")))

    // candidates travel as bare id pairs through the dedup shuffle;
    // vectors are joined back once per surviving pair, and the arrays
    // are projected away again before the ranking window
    val cand = bucketed(c.select("neighbor_id", "cv"), "c")
      .select("tbl", "bkt", "neighbor_id")
      .join(broadcast(bucketed(q.select("query_id", "qv"), "q")
        .select("tbl", "bkt", "query_id")), Seq("tbl", "bkt"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id")
      .distinct()

    val scored = cand
      .join(c, Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotProduct(col("cv"), col("qv")) / (col("cnorm") * col("qnorm"))).as("cos"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF (inverted-file) approximate top-k — the FAISS-style scale
    * path: partition the corpus into `numCentroids` coarse cells by
    * nearest centroid, and probe only the `nProbe` cells closest to
    * each query.
    *
    * Centroids are the first `numCentroids` corpus vectors by id
    * (Forgy initialization — deterministic, no iterative k-means;
    * callers wanting tighter cells can pass refined centroids).
    *
    * Scale shape: centroids are driver-collected (C×dim floats — KBs)
    * and broadcast; cell assignment is a broadcast nested-loop over C
    * per vector in one scan pass (codegen'd dot products); the probe
    * join is an equi-join on cell id touching ~nProbe/C of the corpus
    * per query, vs 100% for brute force. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = corpus.orderBy(col(idCol)).limit(numCentroids)
      .select(col(idCol).cast("long").as("cell"), col(vecCol).as("centv"))

    def assign(df: DataFrame, keep: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(centroids))
        .withColumn("cdist", dotProduct(col("v"), col("centv"))
          / (col("vnorm") * l2Norm(col("centv"))))
      val w = Window.partitionBy(col("rid")).orderBy(col("cdist").desc, col("cell"))
      scored.withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("centv", "cdist", "crank")
    }

    val c = assign(corpus.select(col(idCol).as("rid"), col(vecCol).as("v"))
      .withColumn("vnorm", l2Norm(col("v"))), keep = 1)
      .select(col("rid").as("neighbor_id"), col("v").as("cv"),
        col("vnorm").as("cnorm"), col("cell"))
    val q = assign(queries.select(col(idCol).as("rid"), col(vecCol).as("v"))
      .withColumn("vnorm", l2Norm(col("v"))), keep = nProbe)
      .select(col("rid").as("query_id"), col("v").as("qv"),
        col("vnorm").as("qnorm"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotProduct(col("cv"), col("qv")) / (col("cnorm") * col("qnorm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Per-label centroid of an embedding column, one output row per
    * (label, dimension). The explode/aggregate shape is deliberate for
    * scale: `posexplode` widens rows 64× but keeps them 3 columns
    * narrow, and the (label × dim) key space is tiny, so map-side
    * partial aggregation collapses nearly everything before the single
    * shuffle. (The array-typed alternative — aggregating whole vectors
    * — ships full arrays through the shuffle and needs a custom
    * aggregator for elementwise mean.) */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("v")).as("centroid"))

  /** Embedding near-duplicate pairs: all (a,b) with cosine ≥ threshold,
    * a < b. Exact variant = self-join (quadratic — fixture scale only);
    * the scale path reuses the LSH bucketing so only bucket-mates are
    * compared. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("norm", l2Norm(col("v")))
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("norm").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("norm").as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dotProduct(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** LSH-bucketed near-dup pairs — the 100 TB shape of
    * `cosineNearDupPairs`: only vectors sharing a bucket in some table
    * are compared exactly. */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bitsPerTable: Int = 4, numTables: Int = 16,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val allPlanes = hyperplanes(bitsPerTable * numTables, dim, seed)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("norm", l2Norm(col("v")))
    val banded = v.select(col("id"), col("v"), col("norm"),
      posexplode(array((0 until numTables).map { t =>
        lshBucket(col("v"),
          allPlanes.slice(t * bitsPerTable, (t + 1) * bitsPerTable))
      }: _*)).as(Seq("tbl", "bkt")))

    banded.select(col("tbl"), col("bkt"), col("id").as("id_a"),
        col("v").as("va"), col("norm").as("na"))
      .join(banded.select(col("tbl"), col("bkt"), col("id").as("id_b"),
        col("v").as("vb"), col("norm").as("nb")), Seq("tbl", "bkt"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", dotProduct(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
