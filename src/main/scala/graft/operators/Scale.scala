package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Scale-management operators: skew-resistant aggregation and
  * deterministic sampling. These don't add new query semantics — they
  * re-shape existing ones so the plan survives hot keys and 100 TB
  * inputs. Results are bit-identical (modulo float summation order) to
  * their naive counterparts, which is what their oracles check.
  */
object Scale {

  /** The group samplers round-trip the id through `cast("long")` for
    * the TopK semi-join back; a non-integral id would cast to NULL (or
    * truncate and collide), silently returning an EMPTY (or wrong)
    * sample instead of failing. Same hazard guard as
    * `Dedup.keepBestPerComponent`, restricted to the integral types the
    * long round-trip is lossless for. */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit =
    require(Set[DataType](LongType, IntegerType, ShortType, ByteType)(
        df.schema(idCol).dataType),
      s"$op needs an integral id column for the cast-to-long semi-join; " +
        s"$idCol is ${df.schema(idCol).dataType}")

  /** Two-stage "salted" sum for skewed grouping keys.
    *
    * A single `groupBy(keys).sum` sends every row of a hot key to one
    * reducer; with, say, 40% of a 100 TB stream in one category, that
    * task runs for hours while the rest idle. Salting splits each key
    * into `buckets` sub-keys for a partial aggregate, then combines the
    * (keys × buckets) partials — the second shuffle moves only
    * `|keys| × buckets` rows. (Spark's map-side partial aggregation
    * covers mild skew already; explicit salting is the escape hatch
    * when one key exceeds what a single final-agg task can absorb, and
    * AQE skew handling only covers joins, not aggregations.)
    *
    * The salt is derived from `saltFrom` (pick any spread-out column —
    * an id, a timestamp) so the operator stays deterministic. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], valCol: String,
      outCol: String, saltFrom: String, buckets: Int = 16): DataFrame = {
    val keys = keyCols.map(col)
    df.withColumn("__salt", pmod(xxhash64(col(saltFrom)), lit(buckets)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(col(valCol)).as("__partial"))
      .groupBy(keys: _*)
      .agg(sum(col("__partial")).as(outCol))
  }

  /** Deterministic modulo sample: keeps rows where `id % den < num`
    * (an exact `num/den` fraction for dense ids). Reproducible across
    * runs and engines — the property a training-data pipeline needs so
    * a sample can be re-materialized bit-for-bit. For non-uniform or
    * sparse keys use `hashSample`, which decorrelates via xxhash64. */
  def modSample(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame = {
    require(num >= 0 && num <= den && den > 0)
    df.filter(pmod(col(idCol), lit(den)) < lit(num))
  }

  /** Hash-based deterministic sample: uniform regardless of key
    * distribution (sparse, clustered, or adversarial ids), still fully
    * reproducible. Not DuckDB-oracle-able (different hash function) —
    * covered by property tests instead. */
  def hashSample(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame = {
    require(num >= 0 && num <= den && den > 0)
    df.filter(pmod(xxhash64(col(idCol)), lit(den)) < lit(num))
  }

  /** Per-group head-cap sampling rates — temperature rebalancing at
    * α = 0.5: `rate(g) = min(1, c / sqrt(n_g))`, so a group's EXPECTED
    * surviving count is `min(n_g, c·sqrt(n_g))` — head domains (the
    * crawl dump with 10⁹ docs) are damped toward sqrt growth while tail
    * domains (the curated book corpus) survive intact. This is the
    * standard mixture-flattening step before training (multilingual /
    * multi-source corpora are sampled at `n^α`, α ∈ [0.2, 0.7]).
    *
    * α is FIXED at 0.5 deliberately: sqrt and division are correctly
    * rounded under IEEE 754 in every engine, so the rates — and the
    * thresholds `headCapSample` derives from them — are bit-identical
    * in Spark and DuckDB, which makes the whole pipeline oracle-exact.
    * A general `pow(n, α)` is NOT correctly rounded across libms; an
    * engine-portable general-α variant would need a rational
    * approximation and buys nothing the 0.5 family doesn't for
    * rebalancing. Output: (group, n_docs, rate). */
  def headCapRates(df: DataFrame, groupCol: String, c: Double): DataFrame = {
    require(c > 0, s"need a positive rate scale, got $c")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rate", least(lit(1.0), lit(c) / sqrt(col("n_docs"))))
  }

  /** Temperature-based sampling DISTRIBUTION over groups — the
    * multilingual-mixing formula (mT5/XLM-R): sample group g with
    * probability p_g^α / Σ_h p_h^α, flattening the head and boosting
    * the tail as α → 0. Complements [[headCapRates]] (per-group
    * SURVIVAL rates): this is the recipe for drawing a fixed token
    * budget across languages/sources, not for capping a corpus.
    *
    * α is quantized to quarters (k/4, k ∈ 1..4) for the same
    * engine-portability reason headCapRates pins α = 0.5: `pow` is not
    * correctly rounded across libms, but `sqrt` is under IEEE 754
    * everywhere, so p^(1/4) = sqrt(sqrt(p)), p^(1/2) = sqrt(p) and
    * p^(3/4) = sqrt(p)·sqrt(sqrt(p)) are bit-identical chains in Spark
    * and DuckDB (deterministic even where the composition isn't the
    * correctly-rounded power).
    *
    * Scale: two group-cardinality-sized aggregations with broadcast
    * scalar totals — nothing data-sized shuffles.
    * Output: (group, n, p, p_temp). */
  def temperatureRates(df: DataFrame, groupCol: String,
      alphaQuarters: Int = 2): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 4,
      s"alpha is quantized to quarters in (0, 1]: need 1..4, got $alphaQuarters")
    def powq(p: Column): Column = alphaQuarters match {
      case 1 => sqrt(sqrt(p))
      case 2 => sqrt(p)
      case 3 => sqrt(p) * sqrt(sqrt(p))
      case 4 => p
    }
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__N"))
    val scored = counts.crossJoin(broadcast(tot))
      .withColumn("p", col("n").cast("double") / col("__N"))
      .withColumn("__q", powq(col("p")))
    val z = scored.agg(sum(col("__q")).as("__Z"))
    scored.crossJoin(broadcast(z))
      .select(col(groupCol), col("n"), col("p"),
        (col("__q") / col("__Z")).as("p_temp"))
  }

  /** Token-budget allocation — the mixture-planning step between a
    * weight recipe ([[headCapRates]] / [[temperatureRates]] produce
    * one; DoReMi-style tuning produces another) and a training run:
    * given integer weight SHARES per source and a total token budget,
    * how many tokens of each source to draw and how many epochs of its
    * corpus that is (epochs > 1 ⇒ the loader repeats the source —
    * [[upsampleByWeight]]'s regime; ≪ 1 ⇒ it subsamples).
    *
    * target_tokens = budget · share / Σshares in pure BIGINT
    * arithmetic (exact, engine-portable; the ±1-token floor remainder
    * is the price); epochs_micro = target · 10⁶ / n_tokens, ALSO pure
    * BIGINT — the whole row is integer-exact and hash-portable across
    * engines (r8's DOUBLE epochs was the registry's one hash-fragile
    * column; micro-epochs carry the same information at fixed
    * precision). Token counts are whitespace-word counts
    * ([[TextAnalysis]] conventions); swap in BPE counts upstream for
    * model-true budgets. Sources missing from `weights` are excluded
    * (weight 0); weighted sources absent from the corpus don't appear
    * (nothing to draw from). Overflow bound: target_tokens · 10⁶ must
    * fit in an Int64, i.e. budgets up to ~9.2 Pt are fine.
    *
    * Scale: ONE map-side-combined token-count aggregation over the
    * corpus; weights and the share total are broadcast 1-row/tiny
    * frames. Output: (source, n_tokens, w_parts, target_tokens,
    * epochs_micro). */
  def tokenBudgetPlan(df: DataFrame, sourceCol: String, textCol: String,
      weights: DataFrame, budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    val w = weights.select(col("source"), col("w_parts").cast("long")
      .as("w_parts"))
    val tot = w.agg(sum(col("w_parts")).as("__parts"))
    val counts = df
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(sourceCol).as("source"),
        graft.functions.TextAnalysis.tokenCount(col(textCol)).cast("long")
          .as("__n"))
      .groupBy("source").agg(sum(col("__n")).as("n_tokens"))
    counts.join(broadcast(w), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        expr(s"CAST($budgetTokens AS BIGINT) * w_parts DIV __parts"))
      .select(col("source"), col("n_tokens"), col("w_parts"),
        col("target_tokens"),
        expr("target_tokens * CAST(1000000 AS BIGINT) DIV n_tokens")
          .as("epochs_micro"))
  }

  /** Capacity-constrained token-budget allocation — [[tokenBudgetPlan]]
    * with the constraint a real mixture hits first: a source can only
    * supply `n_tokens · maxEpochs` tokens before repetition passes the
    * epoch cap (the Muennighoff "data-constrained scaling" regime). The
    * allocator is deterministic integer WATERFILL: each round gives
    * every unsaturated source `rem · w DIV W_unsat`, clips at its cap,
    * returns the overflow (plus the floor residue) to the pool, and
    * repeats for exactly `rounds` rounds — a FIXED unroll (the
    * labelPropagation/pageRank oracle pattern) because each round
    * either saturates a source or changes nothing, so
    * `rounds ≥ #sources` certifies the true fixpoint. Undistributed
    * budget (everything saturated, or a sub-`|unsat|` residue) is
    * `budget − Σ alloc`, derivable from the output.
    *
    * Weights/caps are registry-sized (a mixture has tens of sources):
    * both tables collect to the driver under a hard `maxSources` cap
    * (the interleaveOrder budget) and the arithmetic runs in BigInt
    * (rem·w overflows an Int64 at large budgets). Sources missing from
    * `weights` are excluded; weighted sources missing from `avail`
    * don't appear. Output: (source, n_tokens, w_parts, cap_tokens,
    * alloc_tokens, saturated). */
  def cappedBudgetPlan(avail: DataFrame, weights: DataFrame,
      budgetTokens: Long, maxEpochs: Int, rounds: Int = 24,
      maxSources: Int = 4096): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = avail.sparkSession
    val av = avail
      .select(col("source").cast("string"), col("n_tokens").cast("long"))
      .limit(maxSources + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(av.length <= maxSources,
      s"more than maxSources=$maxSources sources — not a registry-sized mix")
    require(av.map(_._1).distinct.length == av.length,
      "duplicate sources in avail")
    val wm = weights
      .select(col("source").cast("string"), col("w_parts").cast("long"))
      .limit(maxSources + 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val rows = av.filter(r => wm.contains(r._1)).sortBy(_._1)
    val n = rows.length
    val cap = rows.map(r => math.multiplyExact(r._2, maxEpochs.toLong))
    val w = rows.map(r => wm(r._1))
    val alloc = new Array[Long](n)
    var rem = budgetTokens
    var round = 0
    while (round < rounds && rem > 0) {
      var wSum = BigInt(0)
      var i = 0
      while (i < n) {
        if (alloc(i) < cap(i) && w(i) > 0) wSum += w(i)
        i += 1
      }
      if (wSum > 0) {
        var given = 0L
        var returned = 0L
        i = 0
        while (i < n) {
          if (alloc(i) < cap(i) && w(i) > 0) {
            val give = (BigInt(rem) * w(i) / wSum).toLong
            val room = cap(i) - alloc(i)
            val take = math.min(give, room)
            alloc(i) += take
            given += give
            returned += give - take
          }
          i += 1
        }
        rem = rem - given + returned
        if (given == 0) round = rounds // sub-|unsat| residue: fixpoint
      } else round = rounds // everything saturated or weightless
      round += 1
    }
    import spark.implicits._
    rows.indices.map { i =>
      (rows(i)._1, rows(i)._2, w(i), cap(i), alloc(i), alloc(i) == cap(i))
    }.toDF("source", "n_tokens", "w_parts", "cap_tokens", "alloc_tokens",
      "saturated")
  }

  /** Deterministic head-cap sample: keep a row iff
    * `id % den < floor(rate(group) · den)`. Same dense-id uniform
    * variate as [[modSample]] (swap in xxhash64 for sparse/clustered
    * ids, at the cost of the DuckDB oracle). The rates frame is
    * group-cardinality-sized — broadcast, so the data pass is one
    * scan-local filter with no shuffle; NULL groups match null-safely
    * and are capped like any other group (the groupQuota lesson). */
  def headCapSample(df: DataFrame, groupCol: String, idCol: String,
      c: Double, den: Int = 1000000): DataFrame = {
    require(den > 0)
    val thresh = headCapRates(df, groupCol, c)
      .select(col(groupCol).as("__g"),
        floor(col("rate") * den).as("__thresh"))
    df.join(broadcast(thresh), col(groupCol) <=> col("__g"))
      .filter(pmod(col(idCol), lit(den)) < col("__thresh"))
      .drop("__g", "__thresh")
  }

  /** Winsorization: clip `valCol` at its group's `p`-quantile — outlier
    * damping before averaging. `exact = true` computes the interpolated
    * exact percentile (DuckDB `quantile_cont` parity — the
    * oracle-checked form, but its aggregation buffers every value of a
    * group on one reducer: fixture-fine, OOM for a trillion-row group);
    * `exact = false` is the 100 TB path — Greenwald–Khanna
    * `approx_percentile` with bounded per-group sketch state, spec'd
    * within tolerance of exact. Cuts are broadcast back onto the
    * stream, so the data pass itself is shuffle-free either way. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String, p: Double,
      outCol: String, exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p")
    val cut =
      if (exact) percentile(col(valCol), lit(p))
      else approx_percentile(col(valCol), lit(p), lit(accuracy))
    val cuts = df.groupBy(col(groupCol)).agg(cut.as("__cut"))
    df.join(broadcast(cuts), Seq(groupCol))
      .withColumn(outCol, least(col(valCol), col("__cut")))
      .drop("__cut")
  }

  /** Per-group quota: keep the `k` smallest-id rows of each group — the
    * domain-cap curation rule ("at most k documents per source/domain",
    * the standard defense against a crawl where one domain is 40% of
    * the corpus). Deterministic (id order), so the same recipe always
    * yields the same corpus.
    *
    * Scale shape: the quota runs through the map-side-combining
    * `TopKAggregator` — each input partition contributes ≤ k ids per
    * group to the shuffle, where the row_number window formulation (the
    * oracle) sorts every row of the hottest domain in one partition.
    * Kept ids then semi-join back, so full rows never enter the quota
    * shuffle. Group and id must be string-/long-castable. */
  def groupQuota(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame =
    groupQuota(df, Seq(groupCol), idCol, k)

  /** Composite-key form: the quota group is the tuple of `groupCols`
    * (e.g. (source, lang) — "at most k docs per domain per language").
    * The aggregation key is an `array<string>` of the group columns, so
    * any arity shares one Aggregator instantiation, and the semi-join
    * back uses null-safe `<=>` per column: rows whose group column is
    * NULL form their own group (capped at k like any other) rather than
    * being silently dropped by null-rejecting equality — matching the
    * row_number-window oracle formulation, where NULL is an ordinary
    * partition value. */
  def groupQuota(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && groupCols.nonEmpty)
    requireIntegralId(df, idCol, "groupQuota")
    val spark = df.sparkSession
    import spark.implicits._
    // TopKAggregator keeps highest score, ties by smaller id; score
    // -id makes "smallest k ids" the kept set
    val keyExpr = array(groupCols.map(c => col(c).cast("string")): _*)
    val kept = graft.functions.TopKAggregator.topKPerGroup(
        df.select(keyExpr.as("__k"),
          negate(col(idCol)).cast("double"), col(idCol).cast("long"))
          .as[(Seq[String], Double, Long)], k)
      .select(col("key").as("__g"), col("id").as("__quota_id"))
    // semi-join on (group, id), not id alone: with ids that repeat
    // across groups, an id kept under one group must not smuggle the
    // same id's rows through under another
    val groupMatch = groupCols.zipWithIndex
      .map { case (c, i) => col(c).cast("string") <=> col("__g").getItem(i) }
      .reduce(_ && _)
    df.join(kept, groupMatch && col(idCol).cast("long") === col("__quota_id"),
      "left_semi")
  }

  /** Quality-preferenced per-group quota: keep the `k` BEST rows of
    * each group by `scoreCol` (ties to the smaller id — total order,
    * deterministic corpus) — the curation rule "at most k docs per
    * domain, and make them the good ones", where [[groupQuota]]'s
    * min-id policy keeps whatever crawled first. NULL scores lose to
    * every non-null score (a doc the scorer skipped must not beat a
    * scored one), tie-broken by id among themselves.
    *
    * Same scale shape as groupQuota: the map-side-combining
    * [[graft.functions.TopKAggregator]] admits ≤ k (group, score, id)
    * rows per partition into the shuffle — no per-domain window sort —
    * and kept ids semi-join back so full rows never enter the quota
    * shuffle. Scores must be double-castable; ids integral. */
  def groupQuotaBest(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    requireIntegralId(df, idCol, "groupQuotaBest")
    val spark = df.sparkSession
    import spark.implicits._
    // aggregator keeps highest score, ties by smaller id; null scores
    // map to -Infinity so they lose to every real score
    val score = coalesce(col(scoreCol).cast("double"),
      lit(Double.NegativeInfinity))
    val kept = graft.functions.TopKAggregator.topKPerGroup(
        df.select(array(col(groupCol).cast("string")).as("__k"),
          score, col(idCol).cast("long"))
          .as[(Seq[String], Double, Long)], k)
      .select(col("key").getItem(0).as("__g"), col("id").as("__quota_id"))
    df.join(kept, col(groupCol).cast("string") <=> col("__g") &&
      col(idCol).cast("long") === col("__quota_id"), "left_semi")
  }

  /** Uniform per-group sample: keep `k` rows per group chosen by a
    * deterministic sha256 rank of the id — the UNBIASED counterpart to
    * `groupQuota`'s keep-smallest-id policy (min-id correlates with
    * crawl order; a hash rank is exchangeable, so the kept set is a
    * uniform draw at every k, yet stable across runs and engines).
    * `seed` re-draws the sample without changing the recipe shape.
    *
    * Scale: same TopKAggregator shape as `groupQuota` — each partition
    * contributes ≤ k (rank, id) pairs per group to the shuffle, full
    * rows semi-join back on (group, id). The rank is the first 13 hex
    * chars of sha256 (52 bits): exactly representable in the
    * aggregator's double score, so Spark's comparisons and the
    * oracle's integer ORDER BY can never disagree. */
  def uniformGroupSample(df: DataFrame, groupCol: String, idCol: String,
      k: Int, seed: String = ""): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    requireIntegralId(df, idCol, "uniformGroupSample")
    val spark = df.sparkSession
    import spark.implicits._
    val rank = conv(substring(
      sha2(concat(lit(seed), col(idCol).cast("string")), 256), 1, 13),
      16, 10).cast("double")
    val kept = graft.functions.TopKAggregator.topKPerGroup(
        df.select(array(col(groupCol).cast("string")).as("__k"),
          negate(rank), col(idCol).cast("long"))
          .as[(Seq[String], Double, Long)], k)
      .select(col("key").getItem(0).as("__g"), col("id").as("__samp_id"))
    df.join(kept, col(groupCol).cast("string") <=> col("__g") &&
      col(idCol).cast("long") === col("__samp_id"), "left_semi")
  }

  /** Exact dense global rank 1..N by (`valCol`, `idCol`) — WITHOUT the
    * single-partition window a naive `row_number() OVER (ORDER BY v)`
    * plans (the whole corpus through one task). Two-level
    * decomposition, the same carry-in idiom as `activeIntervals` and
    * the bucketed as-of join:
    *   1. rows land in value-range buckets cut at approximate quantiles
    *      (one driver-resident array of ≤ `buckets` doubles — the IVF
    *      centroid trade). Cut SKEW only unbalances partitions; rank
    *      EXACTNESS never depends on the cuts, because buckets are
    *      value-ordered and equal values never split across buckets.
    *   2. a per-bucket (partitioned) row_number plus an exclusive
    *      prefix over the B-row bucket-size table gives the offset.
    * Rows with a NULL value have no rank and are dropped (callers that
    * need them keep them aside). `idCol` must be unique — it is the
    * tie-break that makes the order total and the rank dense.
    * Output: the input columns + `rank` (long, 1-based). */
  def globalRank(df: DataFrame, valCol: String, idCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val clean = df.filter(col(valCol).isNotNull)
    val cuts =
      if (buckets == 1) Array.empty[Double]
      else clean.select(col(valCol).cast("double").as("__v"))
        .stat.approxQuantile("__v",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(valCol).cast("double") > lit(c), 1).otherwise(0)
    }
    val bucketed = clean.withColumn("__b", bucket)
    val local = Window.partitionBy(col("__b"))
      .orderBy(col(valCol), col(idCol))
    // exclusive prefix over ≤ `buckets` rows — the only unpartitioned
    // window, and it is bounded by construction
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("__b").agg(count(lit(1)).as("__n"))
      .select(col("__b"),
        coalesce(sum(col("__n")).over(wOff), lit(0L)).as("__off"))
    bucketed.withColumn("__rl", row_number().over(local))
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("rank", col("__off") + col("__rl"))
      .drop("__b", "__rl", "__off")
  }

  /** Key-skew profile: the distribution of group sizes under a key —
    * the diagnostic that decides between a plain shuffle, salting
    * ([[saltedSum]]), and AQE skew handling BEFORE a job burns hours on
    * one hot partition. Two map-side-combinable aggregations; the
    * output is ≤ distinct-group-sizes rows (tiny at any corpus size).
    * Output: (group_size, n_keys). */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keySkewProfile needs at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .groupBy(col("__n").as("group_size"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /** Scan rounds the last [[exactRankSelect]] call spent (one round =
    * one pivot aggregation + one below/eq count over a candidate
    * frame). Test-only single-threaded instrumentation, the
    * `Dedup.lastComponentsRounds` convention — ScaleSpec pins that
    * multi-rank calls SHARE rounds instead of multiplying them. */
  val lastSelectRounds = new java.util.concurrent.atomic.AtomicInteger(-1)

  /** Exact k-th order statistics (1-based ranks over the non-null
    * values) by distributed MULTI-PIVOT QUICKSELECT — no global sort,
    * and unlike [[globalRank]] no shuffle at all. Each round over a
    * candidate frame is exactly two aggregation jobs, SHARED by every
    * rank still pending in that frame:
    *
    *  1. bracket pivots: `percentile_approx` at each pending rank's
    *     own quantile position ± a margin wider than the sketch's
    *     rank-error bound (1/accuracy), so each rank's true value is
    *     (almost always) bracketed by two returned pivots;
    *  2. one fused (below, eq) count per distinct pivot.
    *
    * Every rank then either pins on a pivot's equal-run or descends
    * into the inter-pivot interval holding it — ~2·margin of the
    * frame, so a frame drops under `localThreshold` (driver sort of
    * the surviving interval) after one or two rounds, and ranks share
    * every scan over the large early frames: k quantiles cost ≈ one
    * rank's scans, not k×. Sketch error never affects CORRECTNESS —
    * pivots are actual frame elements and the interval arithmetic is
    * exact whatever the sketch returns (a mis-bracketed rank just
    * lands in a wider interval); each child also strictly excludes its
    * boundary pivots, so frames shrink even in the adversarial case.
    *
    * At 100 TB this is the selection pattern: O(1) targeted rounds of
    * scans over geometrically shrinking, single-column frames vs.
    * sorting (full shuffle) or bucketed ranking (one shuffle +
    * window). Returns (rank → value). */
  def exactRankSelect(df: DataFrame, valCol: String, ranks: Seq[Long],
      localThreshold: Long = 1 << 16): Map[Long, Double] = {
    require(ranks.nonEmpty, "exactRankSelect needs at least one rank")
    val accuracy = 100
    val margin = 2.0 / accuracy // 2× the sketch's rank-error bound
    // one shared cache of the base column for every requested rank
    val vals0 = df.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v")).persist()
    val n0 = vals0.count()
    ranks.foreach(rank =>
      require(rank >= 1 && rank <= n0, s"rank $rank out of [1, $n0]"))
    val out = scala.collection.mutable.Map[Long, Double]()
    var rounds = 0
    // (frame, its size, pending (frame-local rank, original rank))
    var queue = List((vals0, n0, ranks.distinct.map(r => (r, r))))
    while (queue.nonEmpty) {
      val (cur, n, pending) = queue.head
      queue = queue.tail
      if (n <= localThreshold) {
        val local = cur.collect().map(_.getDouble(0)).sorted
        pending.foreach { case (lr, or) => out(or) = local(lr.toInt - 1) }
      } else {
        rounds += 1
        val qs = pending.flatMap { case (lr, _) =>
          val q = lr.toDouble / n
          Seq(math.max(q - margin, 0.0), math.min(q + margin, 1.0))
        }.distinct.sorted
        val pivots = cur
          .agg(percentile_approx(col("v"),
            array(qs.map(lit): _*), lit(accuracy)))
          .collect().head.getSeq[Double](0).distinct.sorted
        val cntCols = pivots.flatMap(p => Seq(
          sum(when(col("v") < p, 1L).otherwise(0L)),
          sum(when(col("v") === p, 1L).otherwise(0L))))
        val cnts = cur.agg(cntCols.head, cntCols.tail: _*).collect().head
        val below = pivots.indices.map(i => cnts.getLong(2 * i))
        val eq = pivots.indices.map(i => cnts.getLong(2 * i + 1))
        // per rank: pinned on a pivot's equal-run, or assigned to the
        // open interval between adjacent pivots that holds it
        val byInterval =
          scala.collection.mutable.Map[Int, List[(Long, Long)]]()
        pending.foreach { case (lr, or) =>
          pivots.indices.find(j => lr > below(j) && lr <= below(j) + eq(j))
            match {
              case Some(j) => out(or) = pivots(j)
              case None =>
                // interval i: values strictly between pivot i−1 and i
                // (i = 0 → below all pivots; i = m → above all)
                val i = pivots.indices
                  .find(j => lr <= below(j)).getOrElse(pivots.length)
                val base = if (i == 0) 0L else below(i - 1) + eq(i - 1)
                byInterval(i) = (lr - base, or) :: byInterval.getOrElse(i, Nil)
            }
        }
        val children = byInterval.toSeq.map { case (i, rs) =>
          val lo = if (i == 0) lit(true) else col("v") > pivots(i - 1)
          val hi = if (i == pivots.length) lit(true) else col("v") < pivots(i)
          val size =
            (if (i == pivots.length) n else below(i)) -
              (if (i == 0) 0L else below(i - 1) + eq(i - 1))
          val child = cur.filter(lo && hi).persist()
          child.count() // materialize before dropping parent
          (child, size, rs)
        }
        queue = children.toList ++ queue
      }
      // children (if any) are materialized — the parent cache can go
      if (cur ne vals0) cur.unpersist()
    }
    vals0.unpersist()
    lastSelectRounds.set(rounds)
    ranks.map(r => r -> out(r)).toMap
  }

  /** Quantile normalization: replace each row's value with the GLOBAL
    * value at its within-group quantile position — source A's p95 doc
    * maps to the corpus-wide p95 value, so per-source score
    * distributions become comparable (the batch-effect correction a
    * quality-scoring pipeline needs when sources were scored by
    * different heuristics). Position mapping is pure integer
    * arithmetic: target = ⌈rank_in_group · N / n_group⌉ — no float
    * quantile ever computed, so both engines agree exactly.
    *
    * Scale: one window shuffle per group column (partitioned), the
    * global side through [[globalRank]] (bucketed — no corpus-wide
    * single-partition sort), and two broadcast joins (the 1-row N and
    * the B-row offsets). NULL values are excluded like in globalRank.
    * Output: input columns + `outCol` (the normalized value). */
  def quantileNormalize(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, outCol: String = "v_norm",
      buckets: Int = 64): DataFrame = {
    val clean = df.filter(col(valCol).isNotNull)
    val nFrame = clean.agg(count(lit(1)).as("__N"))
    val wg = Window.partitionBy(col(groupCol)).orderBy(col(valCol), col(idCol))
    val wgAll = Window.partitionBy(col(groupCol))
    val targets = clean
      .withColumn("__rs", row_number().over(wg).cast("long"))
      .withColumn("__ns", count(lit(1)).over(wgAll))
      .crossJoin(broadcast(nFrame))
      .withColumn("__t", expr("(__rs * __N + __ns - 1) div __ns"))
      .drop("__rs", "__ns", "__N")
    val global = globalRank(clean.select(col(valCol), col(idCol)),
        valCol, idCol, buckets)
      .select(col("rank").as("__t"), col(valCol).as(outCol))
    targets.join(global, Seq("__t")).drop("__t")
  }

  /** Weighted sample without replacement: `k` rows per group with
    * inclusion odds proportional to `weightCol` — Efraimidis–Spirakis
    * A-ES keys: each row draws u ∈ (0,1] from the deterministic sha256
    * rank and keeps the group's k largest u^(1/w). The quality-weighted
    * recipe op ("sample 10k docs per source, favoring high quality")
    * where `uniformGroupSample` treats every doc alike. Deterministic
    * and seeded like its uniform sibling; rows with NULL or
    * non-positive weight are excluded (E-S is defined for w > 0).
    *
    * Scale: identical TopKAggregator shuffle shape — ≤ k candidates per
    * group per partition, full rows semi-join back. The u^(1/w) key is
    * one pow() per row; pow is ~1-ulp across engines while distinct
    * keys differ by ≥ ~2⁻²⁶ (52-bit uniforms), so the oracle's ORDER BY
    * cannot flip the cut in practice. */
  def weightedGroupSample(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, k: Int, seed: String = ""): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    requireIntegralId(df, idCol, "weightedGroupSample")
    val spark = df.sparkSession
    import spark.implicits._
    val u = (conv(substring(
      sha2(concat(lit(seed), col(idCol).cast("string")), 256), 1, 13),
      16, 10).cast("double") + lit(1.0)) / lit(4503599627370496.0) // 2^52
    val key = pow(u, lit(1.0) / col(weightCol))
    val kept = graft.functions.TopKAggregator.topKPerGroup(
        df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
          .select(array(col(groupCol).cast("string")).as("__k"),
            key, col(idCol).cast("long"))
          .as[(Seq[String], Double, Long)], k)
      .select(col("key").getItem(0).as("__g"), col("id").as("__samp_id"))
    df.join(kept, col(groupCol).cast("string") <=> col("__g") &&
      col(idCol).cast("long") === col("__samp_id"), "left_semi")
  }

  /** k-anonymity suppression: keep only rows whose quasi-identifier
    * tuple is shared by at least `k` rows — the release gate a privacy
    * review applies before shipping a dataset whose column combination
    * (language × source × length band, zip × age × gender, …) could
    * re-identify members of small groups. Suppression (dropping the
    * tiny groups) is the exact, conservative half of k-anonymization;
    * generalization (coarsening values until groups merge) is a policy
    * choice layered on top by passing pre-coarsened quasi columns —
    * e.g. a banded `n_chars div 200` instead of raw lengths.
    *
    * Scale: one map-side-combinable count per quasi tuple, then a
    * semi-join of the (usually tiny) surviving-group list back onto the
    * corpus. Null-safe `<=>` per column: a NULL quasi value is an
    * ordinary group (counted and gated like any other), not silently
    * dropped — same contract as `groupQuota`. Quasi columns may be
    * expressions only if pre-projected; pass column NAMES here so the
    * semi-join keys match the count keys byte-for-byte. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1 && quasiCols.nonEmpty,
      s"need k >= 1 and at least one quasi-identifier, got k=$k, $quasiCols")
    val big = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .select(quasiCols.map(c => col(c).as(s"__q_$c")): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(big, cond, "left_semi")
  }

  /** l-diversity profile — [[kAnonymize]]'s partner check: a group can
    * be k-anonymous yet still leak when everyone in it shares the SAME
    * sensitive value (the homogeneity attack: "all 12 users in that
    * zip-age bucket have the diagnosis"). Per quasi-identifier tuple,
    * the row count, the number of DISTINCT sensitive values, and the
    * ≥-l verdict; the release gate drops or re-coarsens the
    * non-diverse groups. NULL sensitive values carry no information
    * and are excluded before counting; NULL quasi values are ordinary
    * groups (the [[kAnonymize]] contract).
    *
    * Scale: one aggregation — Spark plans exact count-distinct as the
    * two-level Expand/partial-agg pipeline, map-side combined; output
    * is group-sized. Output: (quasiCols..., n_rows, n_sensitive,
    * diverse). */
  def lDiversityProfile(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, l: Int): DataFrame = {
    require(l >= 2 && quasiCols.nonEmpty,
      s"need l >= 2 and at least one quasi-identifier, got l=$l, $quasiCols")
    df.filter(col(sensitiveCol).isNotNull)
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** t-closeness profile — the third member of the release-gate trio
    * ([[kAnonymize]] floors group SIZE, [[lDiversityProfile]] floors
    * distinct sensitive VALUES; this bounds how far a group's
    * sensitive-value DISTRIBUTION drifts from the global one — the
    * skewness attack l-diversity misses: a group can hold l distinct
    * diagnoses yet be 95% "positive" against a 2% base rate).
    *
    * Distance = total variation (the equal-ground-distance EMD for
    * categorical attributes): ½·Σᵥ |p_g(v) − p(v)|. Restated over the
    * group-PRESENT values only via
    *   Σ_{v∈domain} |n_gv·N − n_v·n_g| =
    *     n_g·N + Σ_{v∈group} (|n_gv·N − n_v·n_g| − n_v·n_g)
    * (absent values contribute n_v·n_g, and Σᵥ n_v = N), so the whole
    * numerator is BIGINT-exact and the single final division is the
    * only float op — cross-engine-identical. NULL sensitive values are
    * excluded before counting (the [[lDiversityProfile]] contract).
    *
    * Scale: one (quasi, v) aggregation, one broadcast join against the
    * domain-sized global value counts, one per-group re-aggregation —
    * map-side combinable throughout; nothing is ever domain × groups.
    * Output: (quasiCols..., n_rows, tvd, close = tvd ≤ t). */
  def tClosenessProfile(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: String, t: Double): DataFrame = {
    require(t > 0 && t < 1 && quasiCols.nonEmpty,
      s"need 0 < t < 1 and at least one quasi-identifier, got t=$t, $quasiCols")
    val clean = df.filter(col(sensitiveCol).isNotNull)
    val cells = clean
      .groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__ngv"))
    val globalCounts = clean.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("__nv"))
    val total = globalCounts.agg(sum("__nv").as("__N"))
    // group totals via a window over the CELLS frame (group-sized,
    // partitioned by the quasi keys — reuses the cells shuffle)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    cells
      .join(broadcast(globalCounts), Seq(sensitiveCol))
      .crossJoin(broadcast(total))
      .withColumn("__ng", sum(col("__ngv")).over(wq))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__ng")).as("n_rows"), max(col("__N")).as("__N"),
        sum(abs(col("__ngv") * col("__N") - col("__nv") * col("__ng"))
          - col("__nv") * col("__ng")).as("__part"))
      .select(quasiCols.map(col) ++ Seq(
        col("n_rows"),
        ((col("n_rows") * col("__N") + col("__part")).cast("double")
          / (lit(2L) * col("n_rows") * col("__N")).cast("double")).as("tvd")): _*)
      .withColumn("close", col("tvd") <= t)
  }

  /** Leakage-safe train/val/test split: every document is assigned a
    * split by its near-dup COMPONENT id, not its own id — so two
    * near-duplicate documents (or a whole transitive dup cluster) can
    * never straddle splits. Plain per-doc hash splits leak: a train doc
    * and its test near-twin let the model "memorize" eval answers, the
    * exact failure mode dedup-aware eval protocols exist for. `pairs`
    * is a precomputed near-dup pair frame (id_a, id_b) from any
    * generator in the family (Jaccard, MinHash, SimHash, embedding
    * LSH) — the same contract `dropNearDups`/`nearDupComponents` take.
    *
    * Assignment is `component_id mod 100` against cumulative percent
    * boundaries — deterministic and engine-portable (component ids are
    * the component's minimum member id; integral ids required, like the
    * quota operator). Singleton docs are their own component, so clean
    * docs split ~trainPct/valPct/test. Scale shape: the split adds ONE
    * scan-local CASE on top of the components computation — the
    * components cost (subgraph-sized loop or driver union-find) IS the
    * cost. Output: (idCol, component_id, split ∈ train|val|test). */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 <= valPct, trainPct + valPct < 100; " +
        s"got $trainPct/$valPct")
    Dedup.nearDupComponents(df, idCol, pairs)
      .withColumn("split",
        when(pmod(col("component_id"), lit(100)) < trainPct, lit("train"))
          .when(pmod(col("component_id"), lit(100)) < trainPct + valPct,
            lit("val"))
          .otherwise(lit("test")))
  }

  /** Training-sequence packing assignment — the "concatenate and cut
    * every `budget` tokens" step that turns a curated corpus into
    * fixed-length pretraining rows. Within each `partitionCol` shard,
    * docs are laid out in `idCol` order and the token stream is cut at
    * multiples of `budget`; each doc gets its global layout position:
    *   - `start_tok`: the doc's first token's offset in the shard
    *     stream (an exclusive prefix sum),
    *   - `seq_id` / `seq_offset`: which training sequence the doc
    *     starts in, and where,
    *   - `n_seqs`: how many sequences the doc spans (boundary docs
    *     straddle two or more).
    * Deterministic: same corpus + same budget ⇒ identical layout, the
    * property that makes a data recipe auditable and resumable.
    *
    * Scale shape: one window aggregation partitioned by the shard
    * column — state is a single running sum per shard, and the shuffle
    * is the partitionBy hash. The sort-by-id inside each shard is the
    * cost of ORDERED packing (inherent to the semantics, not the
    * implementation); a shard too large for one task should be
    * sub-sharded upstream (e.g. by doc_id range) exactly as a real
    * packer does. */
  def packSequences(df: DataFrame, partitionCol: String, idCol: String,
      tokenCount: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partitionCol)).orderBy(col(idCol))
    df.select(col(idCol), col(partitionCol),
        tokenCount.cast("long").as("n_tokens"))
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id",
        floor(col("start_tok") / lit(budget.toDouble)).cast("long"))
      .withColumn("seq_offset", pmod(col("start_tok"), lit(budget.toLong)))
      .withColumn("n_seqs",
        floor((col("start_tok") + col("n_tokens") - 1) / lit(budget.toDouble))
          .cast("long") - col("seq_id") + lit(1L))
  }

  /** Length-bucketed batch planning — the padding-efficiency layout for
    * VARIABLE-length training (fine-tuning, reranking, embedding jobs
    * that pad to the batch max instead of packing): docs land in token-
    * length buckets of `bucketWidth`, each bucket is cut into batches
    * of `batchSize` in `idCol` order, and every batch reports its
    * padded cost — `padding_waste` = max_tokens·n_docs − n_tokens, the
    * number the layout exists to minimize (batching UNbucketed pads
    * every short doc to the global max).
    *
    * Deterministic: same corpus ⇒ identical batches (the
    * [[packSequences]] auditability property). Scale shape: one window
    * partitioned by bucket (running row count only) + one (bucket,
    * batch) aggregation — no global sort, no single-partition stage;
    * bucket skew is bounded by `bucketWidth`, and a bucket too large
    * for one task sub-shards upstream exactly like a packer shard.
    * Output: (bucket, batch_id, n_docs, min_tokens, max_tokens,
    * n_tokens, padding_waste). */
  def lengthBucketBatches(df: DataFrame, idCol: String,
      tokenCount: Column, bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      s"need bucketWidth >= 1 and batchSize >= 1, got $bucketWidth/$batchSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(idCol))
    df.select(col(idCol), tokenCount.cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("bucket", expr(s"(__n - 1) DIV $bucketWidth"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("batch_id", expr(s"(__rn - 1) DIV $batchSize"))
      .groupBy("bucket", "batch_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col("__n")).as("min_tokens"),
        max(col("__n")).as("max_tokens"),
        sum(col("__n")).as("n_tokens"))
      .withColumn("padding_waste",
        col("max_tokens") * col("n_docs") - col("n_tokens"))
  }

  /** First-fit-decreasing WHOLE-DOC packing into fixed `capacity`-token
    * context windows — the no-split dual of [[packSequences]]
    * (which concatenates and lets docs straddle window boundaries):
    * SFT/reranker-style training keeps each document intact in exactly
    * one window, so the loader question becomes bin packing. Greedy
    * FFD (Johnson '73, ≤ 11/9·OPT + 6/9): docs in (tokens desc, id asc)
    * order, each into the FIRST window with room, else a new window.
    * `eosTokens` separator overhead is charged per doc; docs longer
    * than `capacity` get a singleton window with `truncated = true`
    * (cost capped at `capacity` — the loader truncates, the plan says
    * so loudly).
    *
    * Scale shape — FFD is sequential, so the corpus is cut into BLOCKS
    * of `blockDocs` consecutive ranks of the global (tokens desc, id)
    * order ([[globalRank]], no single-partition sort) and packing is
    * exact FFD within each block: per-task state is ≤ `blockDocs`
    * (seq, id, n) triples + open-bin loads, blocks pack in parallel,
    * and determinism survives any executor count — same corpus ⇒ same
    * windows, the [[packSequences]] auditability property. Block-local
    * FFD is how a distributed packer really runs (a global first-fit
    * scan of 10¹¹ docs is not a thing); the efficiency loss vs global
    * FFD is bounded by one underfull window per block. Emitted
    * `window_id` = block·blockDocs + bin is globally unique (bins per
    * block ≤ docs per block).
    *
    * Output: (idCol, n_tokens [charged cost incl. EOS, capped],
    * truncated, block, bin [1-based within block], window_id). Ids
    * must be long-castable and unique; null token counts are dropped. */
  def ffdPack(df: DataFrame, idCol: String, tokenCount: Column,
      capacity: Int, eosTokens: Int = 1, blockDocs: Int = 512): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(eosTokens >= 0, s"eosTokens must be >= 0, got $eosTokens")
    require(eosTokens < capacity,
      s"eosTokens $eosTokens leaves no room in capacity $capacity")
    require(blockDocs >= 1 && blockDocs <= (1 << 20),
      s"blockDocs must be in [1, 2^20], got $blockDocs")
    val spark = df.sparkSession
    import spark.implicits._
    val cap = capacity.toLong
    val sized = df
      .select(col(idCol).cast("long").as("__id"),
        (tokenCount.cast("long") + lit(eosTokens.toLong)).as("__raw"))
      .filter(col("__id").isNotNull && col("__raw").isNotNull)
      .select(col("__id"), least(col("__raw"), lit(cap)).as("__n"),
        (col("__raw") > cap).as("__tr"))
    val ranked = Scale.globalRank(
      sized.withColumn("__negn", -col("__n").cast("double")),
      "__negn", "__id")
    val blocked = ranked.select(
        expr(s"(rank - 1) DIV $blockDocs").as("__blk"),
        ((col("rank") - 1) % blockDocs).cast("int").as("__seq"),
        col("__id"), col("__n"), col("__tr"))
      .as[(Long, Int, Long, Long, Boolean)]
    val packed = blocked.groupByKey(_._1).flatMapGroups { (blk, it) =>
      val docs = it.toArray.sortBy(_._2)
      val bins = scala.collection.mutable.ArrayBuffer.empty[Long]
      docs.iterator.map { case (_, _, id, n, tr) =>
        var pos = -1
        var j = 0
        while (pos < 0 && j < bins.length) {
          if (bins(j) + n <= cap) pos = j
          j += 1
        }
        if (pos < 0) { bins += n; pos = bins.length - 1 }
        else bins(pos) += n
        (id, n, tr, blk, (pos + 1).toLong, blk * blockDocs + pos + 1)
      }
    }
    packed.toDF(idCol, "n_tokens", "truncated", "block", "bin", "window_id")
  }

  /** Deterministic source-interleaved dataloader order: the row at
    * per-source position p of source s gets global ordinal
    * rank-of(p, s) under (p asc, s asc) — round-robin across sources,
    * so consecutive training rows cycle through the corpus mix instead
    * of clumping source-by-source (the order-sensitivity failure mode
    * mixture weights don't fix; once a source exhausts, the remaining
    * sources keep cycling).
    *
    * The ordinal is computed ANALYTICALLY, not with a global window —
    * `row_number() OVER (ORDER BY pos, source)` would pull the whole
    * corpus through one task. With per-source counts c(s') (a
    * source-cardinality table, collected driver-side like a vocab):
    *   ordinal(p, s) = Σ_{s'} min(p−1, c(s')) + |{s' < s : c(s') ≥ p}|
    * — rows strictly before position p across all sources, plus
    * same-position rows of lexicographically earlier sources. The
    * per-row cost is one O(#sources) scan-local expression; the only
    * shuffle is the per-source row_number window (partitioned). Source
    * cardinality is registry-sized (a corpus has tens of sources, not
    * millions) — `maxSources` guards the expression loudly.
    * Output: (idCol, sourceCol, pos [1-based within source], ordinal
    * [0-based global]). */
  def interleaveOrder(df: DataFrame, sourceCol: String, idCol: String,
      maxSources: Int = 4096): DataFrame = {
    val src = df.select(col(idCol), col(sourceCol).cast("string").as(sourceCol))
    val counts = src.groupBy(col(sourceCol)).agg(count(lit(1)).as("__c"))
      .limit(maxSources + 1)
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    require(counts.nonEmpty, "interleaveOrder: empty input")
    require(counts.length <= maxSources,
      s"more than maxSources=$maxSources sources — not a registry-sized mix")
    require(counts.forall(_._1 != null),
      "interleaveOrder: null source — fill a sentinel upstream")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol)).orderBy(col(idCol))
    val before = counts.map { case (_, c) =>
      least(col("pos") - 1L, lit(c)) }.reduce(_ + _)
    val sameRow = counts.map { case (s, c) =>
      when(lit(s) < col(sourceCol) && lit(c) >= col("pos"), 1L)
        .otherwise(0L) }.reduce(_ + _)
    src
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("ordinal", (before + sameRow).cast("long"))
  }

  /** Curriculum dataloader order — [[interleaveOrder]] staged by a
    * difficulty bin: all of bin 1 streams before any of bin 2 (easy →
    * hard, e.g. short → long or high-quality-decile first via
    * [[rankBins]]), and WITHIN each bin rows round-robin across
    * sources so the mix stays balanced at every curriculum stage.
    *
    * Ordinal is ANALYTIC, like interleaveOrder's: with per-(bin,
    * source) counts c(b, s) (a cells-sized table collected like a
    * vocab),
    *   ordinal(b, s, p) = Σ_{b' < b} total(b')            (stage offset)
    *                    + Σ_{s'} min(p−1, c(b, s'))        (earlier laps)
    *                    + |{s' < s : c(b, s') ≥ p}|        (same lap)
    * — no corpus-wide `row_number() OVER (ORDER BY bin, pos, source)`
    * single-partition window. The only shuffle is the (bin, source)-
    * partitioned position window; the per-row expression is
    * O(sources-in-bin), guarded by `maxCells` (codegen size is the
    * binding constraint, not driver memory). Null bins/sources must be
    * filled upstream. Output: (idCol, sourceCol, bin, pos [1-based
    * within (bin, source)], ordinal [0-based global]). */
  def curriculumOrder(df: DataFrame, binCol: String, sourceCol: String,
      idCol: String, maxCells: Int = 1024): DataFrame = {
    val src = df.select(col(idCol),
      col(binCol).cast("long").as("bin"),
      col(sourceCol).cast("string").as(sourceCol))
    val cells = src.groupBy("bin", sourceCol).agg(count(lit(1)).as("__c"))
      .limit(maxCells + 1)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
    require(cells.nonEmpty, "curriculumOrder: empty input")
    require(cells.length <= maxCells,
      s"more than maxCells=$maxCells (bin, source) cells — the per-row " +
        "expression would not codegen; coarsen bins or sources")
    require(cells.forall { case ((b, s), _) => s != null },
      "curriculumOrder: null source — fill a sentinel upstream")
    val binTotals = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
      .toMap
    val bins = binTotals.keys.toSeq.sorted
    val offsets = bins.zip(bins.scanLeft(0L)((acc, b) =>
      acc + binTotals(b)).dropRight(1)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bin"), col(sourceCol)).orderBy(col(idCol))
    val withPos = src.withColumn("pos", row_number().over(w).cast("long"))
    val ordinal = bins.map { b =>
      val inBin = cells.filter(_._1._1 == b).map { case ((_, s), c) => (s, c) }
        .sortBy(_._1)
      val before = inBin.map { case (_, c) =>
        least(col("pos") - 1L, lit(c)) }.reduce(_ + _)
      val sameLap = inBin.map { case (s, c) =>
        when(lit(s) < col(sourceCol) && lit(c) >= col("pos"), 1L)
          .otherwise(0L) }.reduce(_ + _)
      (b, lit(offsets(b)) + before + sameLap)
    }.foldLeft(lit(null).cast("long")) { case (acc, (b, e)) =>
      when(col("bin") === b, e).otherwise(acc)
    }
    withPos.withColumn("ordinal", ordinal.cast("long"))
  }

  /** Deterministic per-epoch dataloader shuffles: epoch e's global
    * order is the rank of the portable sha52 hash of "e:id" — a fresh,
    * reproducible, seed-free permutation per epoch (the property a
    * multi-epoch training run needs: epoch orders decorrelated from
    * each other AND from crawl/id order, yet bit-reproducible across
    * reruns and engines). Ranks come from the bucketed [[globalRank]]
    * — approximate quantile cuts shape only the buckets, the rank
    * itself is exact — so there is no corpus-wide single-partition
    * sort at any epoch count.
    * Output: (idCol, ord_e<N> for each epoch), 1-based. */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Seq[Int]): DataFrame = {
    require(epochs.nonEmpty && epochs.distinct.size == epochs.size,
      s"need distinct epochs, got $epochs")
    epochs.map { e =>
      globalRank(df.select(col(idCol),
          graft.functions.Kmv.sha52(
            concat(lit(s"$e:"), col(idCol).cast("string"))).as("__h")),
        "__h", idCol)
        .select(col(idCol), col("rank").cast("long").as(s"ord_e$e"))
    }.reduce(_.join(_, Seq(idCol)))
  }

  /** Per-epoch dataloader MANIFEST — the artifact a training run
    * actually reads: [[ffdPack]] windows (whole-doc FFD into fixed
    * `capacity`-token contexts) crossed with [[epochShuffle]]'s
    * reproducible per-epoch window order. One row per window:
    * its docs in pack-insertion order (FFD rank order: tokens desc,
    * id asc — joined to a comma list so the row is engine-portable and
    * hash-stable), the token fill, and one `ord_e<N>` position per
    * requested epoch. A loader seeks epoch e's window stream by
    * ordering on ord_e<N>; re-running any engine reproduces the byte-
    * identical manifest.
    *
    * Scale: ffdPack's block-local packing + a per-window aggregation
    * (windows ≈ docs/avg-fill rows) + the bucketed epoch ranks — no
    * corpus-wide single-partition sort anywhere.
    * Output: (window_id, n_docs, fill_tokens, doc_list, ord_e<N>...). */
  def epochManifest(df: DataFrame, idCol: String, tokenCount: Column,
      capacity: Int, epochs: Seq[Int], eosTokens: Int = 1,
      blockDocs: Int = 512): DataFrame = {
    // doc_list renders ids via cast("long"); a non-integral id column
    // would silently render NULL entries into the loader artifact —
    // fail loudly up front instead
    val idType = df.schema(idCol).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(idType),
      s"epochManifest: id column '$idCol' must be an integral type " +
        s"(doc_list renders ids as longs), got $idType")
    epochManifestPacked(
      ffdPack(df, idCol, tokenCount, capacity, eosTokens, blockDocs),
      idCol, epochs)
  }

  /** [[epochManifest]] over an ALREADY-PACKED frame (the [[ffdPack]]
    * output) — the packing plan is a per-corpus loader artifact several
    * consumers read (window list, efficiency rollup, epoch order), so a
    * caller that materializes it once passes it here instead of
    * re-packing per consumer. */
  def epochManifestPacked(packed: DataFrame, idCol: String,
      epochs: Seq[Int]): DataFrame = {
    val idType = packed.schema(idCol).dataType
    require(Seq[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(idType),
      s"epochManifestPacked: id column '$idCol' must be an integral " +
        s"type (doc_list renders ids as longs), got $idType")
    val windows = packed.groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill_tokens"),
        concat_ws(",", transform(
          sort_array(collect_list(struct((-col("n_tokens")).as("o"),
            col(idCol).cast("long").as("i")))),
          x => x.getField("i").cast("string"))).as("doc_list"))
    val orders = epochShuffle(windows.select("window_id"), "window_id",
      epochs)
    windows.join(orders, Seq("window_id"))
      .select(col("window_id") +: col("n_docs") +: col("fill_tokens") +:
        col("doc_list") +: epochs.map(e => col(s"ord_e$e")): _*)
  }

  /** Subsample plan that MATCHES a target mixture (the "reproduce the
    * published dataset weights" knob, vs [[headCapRates]]' flattening):
    * given per-source target weights w_s, the largest corpus whose
    * source shares equal w_s/W exactly is bounded by the scarcest
    * source — kept_s = floor(w_s · min_{s'} n_{s'}/w_{s'}). Computed
    * entirely in INTEGER arithmetic as min over s' of
    * (n_{s'}·w_s) div w_{s'} (floor of a min of rationals = min of the
    * floors of the cross-multiplied forms), so the plan is bit-exact
    * cross-engine — no double ratio ever forms. The sources² cross
    * join is registry-sized and broadcast.
    * Output: (sourceCol, n_docs, w, kept, rate_micro), where the
    * actual row selection composes via [[budgetFill]]-style hash-order
    * cuts downstream.
    *
    * Contract: `weights` must cover every observed source with w > 0 —
    * a silent inner-join drop (source vanishes from the plan) or a
    * NULL/zero w (nulls propagate through the integer div into the
    * min) would corrupt the mixture without an error, so both fail
    * loudly at execution via an in-plan check (no extra jobs). */
  def matchMixture(df: DataFrame, sourceCol: String,
      weights: DataFrame): DataFrame = {
    require(Set(sourceCol, "w").subsetOf(weights.columns.toSet),
      s"weights needs ($sourceCol, w) columns, got " +
        weights.columns.mkString(", "))
    val counts = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
    // weights and the kept table are registry-sized — broadcast, never
    // a sort-merge shuffle of 20-row frames across 1000 executors
    val cw = counts.join(
        broadcast(weights.select(col(sourceCol),
          col("w").cast("long").as("__w0"))),
        Seq(sourceCol), "left")
      .select(col(sourceCol), col("n_docs"),
        when(col("__w0").isNull || col("__w0") <= 0,
          raise_error(concat(lit("matchMixture: source '"),
            col(sourceCol),
            lit("' has no positive weight — weights must cover every " +
              "observed source with w > 0"))))
          .otherwise(col("__w0")).as("w"))
    val b = cw.select(col(sourceCol).as("__s2"),
      col("n_docs").as("__n2"), col("w").as("__w2"))
    val kept = cw.crossJoin(broadcast(b))
      .select(col(sourceCol),
        expr("(__n2 * w) div __w2").as("__k"))
      .groupBy(col(sourceCol)).agg(min(col("__k")).as("kept"))
    cw.join(broadcast(kept), Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"), col("w"), col("kept"),
        expr("(CAST(1000000 AS BIGINT) * kept) div n_docs")
          .as("rate_micro"))
  }

  /** Greedy per-source token-budget FILL — the selection step after
    * budget ALLOCATION (q_token_budget's proportional shares, the
    * capped waterfill): given a per-source token budget, choose WHICH
    * documents fill it. Docs are taken in sha-hash order (the
    * [[graft.functions.HashSample]] rank — a deterministic unbiased
    * sample order, immune to crawl/id ordering bias), and a doc is
    * kept iff its inclusive running token sum stays within the budget
    * (strict rule: the boundary doc that would overflow is cut, so
    * kept sources never exceed budget).
    *
    * Scale: a plain (source)-partitioned running-sum window serializes
    * each source onto ONE task — at 100 TB with a dominant web-crawl
    * source that is a single-task sort of most of the corpus. Instead
    * the hash domain is cut into `buckets` ranges by global
    * approx-quantile cuts on the sha52 (the hash is uniform, so one
    * global cut set balances EVERY source's buckets simultaneously),
    * the running sum is a per-(source, bucket) window, and a broadcast
    * carry-in prefix over per-(source, bucket) totals (sources ×
    * buckets rows — registry-sized) lifts local ranks/sums to exact
    * per-source ones: the [[globalRank]] /
    * `Analytics.activeIntervals` two-level-prefix pattern. The bucket
    * is a pure function of the hash value, so (bucket, hash, id) order
    * ≡ the per-source (hash, id) order and the result is bit-identical
    * to the single-window form (ScaleSpec pins the equivalence).
    * Output: (idCol, sourceCol, n_tokens, fill_rank [1-based hash
    * order], cum_tokens, keep). */
  def budgetFill(df: DataFrame, sourceCol: String, idCol: String,
      tokenCount: Column, budgetPerSource: Long,
      buckets: Int = 64): DataFrame = {
    require(budgetPerSource >= 0,
      s"need a non-negative budget, got $budgetPerSource")
    fillRanked(df, sourceCol, idCol, tokenCount, buckets)
      .withColumn("keep", col("cum_tokens") <= budgetPerSource)
  }

  /** [[budgetFill]] with PER-SOURCE budgets — the form the full
    * mixture chain needs ([[tokenBudgetPlan]]'s target_tokens differ
    * by source). `budgets` must carry (`sourceCol`, budget_tokens);
    * it is registry-sized and broadcast. Sources absent from
    * `budgets` get budget 0 (ranked, kept = false) — the plan stays
    * total over the corpus. Same bucketed two-level prefix and output
    * shape as [[budgetFill]]. */
  def budgetFillPlan(df: DataFrame, sourceCol: String, idCol: String,
      tokenCount: Column, budgets: DataFrame,
      buckets: Int = 64): DataFrame = {
    require(Set(sourceCol, "budget_tokens").subsetOf(budgets.columns.toSet),
      s"budgets needs ($sourceCol, budget_tokens), got " +
        budgets.columns.mkString(", "))
    fillRanked(df, sourceCol, idCol, tokenCount, buckets)
      .join(broadcast(budgets.select(col(sourceCol),
        col("budget_tokens").cast("long").as("__budget"))),
        Seq(sourceCol), "left")
      .withColumn("keep",
        col("cum_tokens") <= coalesce(col("__budget"), lit(0L)))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        col("fill_rank"), col("cum_tokens"), col("keep"))
  }

  /** Shared core of [[budgetFill]] / [[budgetFillPlan]]: hash order,
    * per-source rank and inclusive running token sum via the bucketed
    * two-level prefix. Output: (idCol, sourceCol, n_tokens, fill_rank,
    * cum_tokens). */
  private def fillRanked(df: DataFrame, sourceCol: String, idCol: String,
      tokenCount: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"need buckets >= 1, got $buckets")
    val base = df.select(col(idCol), col(sourceCol),
      tokenCount.cast("long").as("n_tokens"),
      graft.functions.Kmv.sha52(col(idCol).cast("string")).as("__h"))
    val cuts =
      if (buckets == 1) Array.empty[Double]
      else base.select(col("__h").cast("double").as("__v"))
        .stat.approxQuantile("__v",
          (1 until buckets).map(_.toDouble / buckets).toArray, 0.01)
        .distinct.sorted
    // sha52 fits a double exactly (52 bits), so the > against a cut is
    // exact and equal hashes always land in one bucket
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("__h").cast("double") > lit(c), 1).otherwise(0)
    }
    val bucketed = base.withColumn("__b", bucket)
    val wLoc = Window.partitionBy(col(sourceCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
    // exclusive per-source prefix over bucket totals: ≤ buckets rows
    // per source — bounded by construction
    val wOff = Window.partitionBy(col("__osrc")).orderBy(col("__ob"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(col(sourceCol).as("__osrc"), col("__b").as("__ob"))
      .agg(count(lit(1)).as("__n"), sum(col("n_tokens")).as("__t"),
        count(col("n_tokens")).as("__nn"))
      .select(col("__osrc"), col("__ob"),
        coalesce(sum(col("__n")).over(wOff), lit(0L)).as("__roff"),
        coalesce(sum(col("__t")).over(wOff), lit(0L)).as("__coff"),
        coalesce(sum(col("__nn")).over(wOff), lit(0L)).as("__nnoff"))
    bucketed
      .withColumn("__rl", row_number().over(wLoc).cast("long"))
      .withColumn("__cl",
        sum(col("n_tokens")).over(wLoc.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets),
        col(sourceCol) <=> col("__osrc") && col("__b") === col("__ob"))
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        (col("__roff") + col("__rl")).as("fill_rank"),
        // single-window sum is null IFF every token in the per-source
        // prefix is null — replicate via the carry-in non-null count
        when(col("__cl").isNull && col("__nnoff") === 0L,
          lit(null).cast("long"))
          .otherwise(col("__coff") + coalesce(col("__cl"), lit(0L)))
          .as("cum_tokens"))
  }

  /** Global rank binning: each row gets its quantile bin (1..nBins,
    * ntile semantics) and percent rank by `valCol`, ties broken by
    * `idCol` so the order — and therefore every bin edge — is unique
    * and deterministic. The curation use: quality-decile labels for
    * mixing recipes ("train on deciles 7–10, hold 4–6 for ablations").
    *
    * `exact = true` is the oracle-checked form: ONE global window sort
    * — inherently single-ordered (the semantics, not the plan, demand a
    * total order), fine up to ~10⁸ rows per driver-sized task.
    * `exact = false` is the 100 TB path: Greenwald–Khanna quantile cuts
    * broadcast against the stream, bin = 1 + #cuts below the value —
    * scan-local, no global sort, no percent_rank (a total rank is
    * exactly what the approximation avoids materializing); spec'd
    * within ±1 bin of exact. */
  def rankBins(df: DataFrame, valCol: String, idCol: String, nBins: Int,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    if (exact) {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(valCol), col(idCol))
      df.select(col(idCol), col(valCol),
        ntile(nBins).over(w).as("bin"),
        percent_rank().over(w).as("pct_rank"))
    } else {
      val ps = (1 until nBins).map(_.toDouble / nBins)
      val cuts = df.agg(approx_percentile(col(valCol),
        typedlit(ps), lit(accuracy)).as("__cuts"))
      df.crossJoin(broadcast(cuts))
        .select(col(idCol), col(valCol),
          (size(filter(col("__cuts"), c => c < col(valCol))) + 1).as("bin"))
    }
  }

  /** Shard manifest: the per-shard accounting a training-data export
    * writes next to its shards (doc counts, token totals, id ranges —
    * what a loader needs to plan epochs without scanning data). Shard
    * assignment is deterministic `id mod nShards` (the engine-portable
    * default; swap xxhash64 for clustered ids, at the cost of the
    * DuckDB oracle — the `modSample`/`hashSample` trade). One
    * map-side-combined aggregation; output is nShards rows. */
  def shardManifest(df: DataFrame, idCol: String, nShards: Int,
      tokenCount: Column): DataFrame = {
    require(nShards >= 1)
    df.select(pmod(col(idCol), lit(nShards)).as("shard"),
        col(idCol).as("__id"), tokenCount.cast("long").as("__tok"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"))
  }

  /** Sketch-based corpus statistics — the 100 TB form of the exact
    * `q_corpus_stats` aggregation. Exact `percentile` buffers every
    * value of a group on the final reducer (memory ∝ group size — fine
    * at fixture scale, a straight OOM for a trillion-row group);
    * `approx_percentile` (Greenwald–Khanna) and `approx_count_distinct`
    * (HyperLogLog++) keep bounded per-group state and combine map-side,
    * so the shuffle carries sketches, not values. Error is tunable:
    * `accuracy` (GK inverse-ε) and `rsd` (HLL relative SD). Not
    * DuckDB-oracle-able — different sketch algorithms produce different
    * approximations — so the contract is the spec's tolerance check
    * against the exact aggregate; the exact query remains the
    * hash-adjudicated one. */
  def corpusStatsApprox(df: DataFrame, groupCol: String, valCol: String,
      distinctCol: String, accuracy: Int = 10000, rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        avg(col(valCol)).as("avg_val"),
        approx_percentile(col(valCol), lit(0.5), lit(accuracy)).as("p50_val"),
        approx_percentile(col(valCol), lit(0.95), lit(accuracy)).as("p95_val"),
        approx_count_distinct(col(distinctCol), rsd).as("n_distinct_approx"))

  /** Deterministic per-group UPsampling — the other direction of the
    * mixing knob from `headCapSample`/`stratifiedModSample`: a mixture
    * recipe that weights a source ABOVE 1 ("2.5 epochs of the curated
    * book corpus per 1 of the crawl") needs row repetition, not
    * survival rates. Each row is emitted `⌊w⌋` times, plus once more
    * for the deterministic `id mod den` fraction that covers the
    * fractional part — so a group's emitted count is exactly
    * `⌊w⌋·n + |{id : id mod den < (w−⌊w⌋)·den}|`, reproducible across
    * runs and engines. Weights below 1 degrade to plain deterministic
    * downsampling (0 = drop the group). The `rep ∈ [0, copies)` output
    * column keeps (id, rep) unique for downstream shuffles/packing.
    *
    * Scale shape: one scan-local CASE + an explode whose output size
    * is the recipe's own epoch total — no shuffle, no per-group pass;
    * weights are recipe constants like `stratifiedModSample`'s rates. */
  def upsample(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      den: Int = 1000000): DataFrame = {
    (weights.values.toSeq :+ defaultWeight).foreach(w =>
      require(w >= 0 && w <= 1000, s"weight out of [0, 1000]: $w"))
    require(den > 0)
    def copiesFor(w: Double): Column = {
      val ip = math.floor(w).toLong
      val thresh = math.floor((w - ip) * den).toLong
      lit(ip) + when(pmod(col(idCol), lit(den)) < lit(thresh), 1L).otherwise(0L)
    }
    val copies = weights.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (g, w)) => acc.when(col(groupCol) === g, copiesFor(w))
    }.otherwise(copiesFor(defaultWeight))
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn("rep", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Stratified deterministic sample: a per-stratum `num/den` modulo
    * rate — the training-data mixing knob ("keep 50% of purchases, 10%
    * of views, 5% of the rest"). Pure scan-local filter: no shuffle, no
    * per-stratum pass over the input (a groupBy-based sampler would
    * shuffle the corpus once per rate change), fully reproducible across
    * runs and engines — re-materializing the same mixture bit-for-bit
    * is what makes a dataset recipe auditable. Strata not in `rates`
    * fall back to `defaultRate`. */
  def stratifiedModSample(df: DataFrame, strataCol: String, idCol: String,
      rates: Map[String, (Int, Int)],
      defaultRate: (Int, Int) = (0, 1)): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach { case (num, den) =>
      require(num >= 0 && num <= den && den > 0, s"bad rate $num/$den")
    }
    def keep(num: Int, den: Int): Column = pmod(col(idCol), lit(den)) < lit(num)
    val pred = rates.foldLeft(when(lit(false), lit(false))) {
      case (acc, (stratum, (num, den))) =>
        acc.when(col(strataCol) === stratum, keep(num, den))
    }.otherwise(keep(defaultRate._1, defaultRate._2))
    df.filter(pred)
  }

  /** Exact per-group discrete quantiles: the p-quantile is the value at
    * 1-based sorted position max(1, ceil(p·n)) — an actual group member
    * (quantile_disc semantics), so no interpolation arithmetic can
    * diverge cross-engine; `ceil(p·n)` is one IEEE multiply both
    * engines round identically. Duplicate values make row_number's
    * tie order nondeterministic, but the VALUE at a fixed sorted
    * position is invariant under tie permutation — the output is
    * deterministic anyway.
    *
    * Scale: one shuffle on the group key + an in-partition sort (the
    * same budget as any windowed group op); each group must fit a
    * partition — for the million-key telemetry case that holds by
    * construction, for few giant groups use `corpusStatsApprox`'s GK
    * sketch instead (bounded state, rank-error tolerance). This is the
    * exact path; the approx path is its documented 100 TB escape hatch.
    * Output: (group, p, quantile), one row per group × p. */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"bad ps $ps")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valCol))
    val ranked = df
      .select(col(groupCol), col(valCol))
      .na.drop(Seq(valCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(groupCol))))
    val wanted = ps.map(p =>
      struct(lit(p).as("p"),
        greatest(lit(1L), ceil(lit(p) * col("__n"))).as("idx")))
    ranked
      .select(col(groupCol), col(valCol),
        col("__rn"), explode(array(wanted: _*)).as("q"))
      .filter(col("__rn") === col("q.idx"))
      .select(col(groupCol), col("q.p").as("p"),
        col(valCol).as("quantile"))
  }

  /** Exact per-group trimmed mean — the robust-location member between
    * the mean (outlier-dragged) and the median ([[groupQuantiles]]
    * p=0.5): drop the lowest and highest ⌊n·trimTenths/10⌋ values by
    * rank, average the rest. Rank cuts are pure integer arithmetic;
    * value ties at a cut boundary cannot change the answer (whichever
    * tied row is kept contributes the same value), so the row_number
    * tie order needs no tiebreak column. The one double is the final
    * sum/count — within cross-engine summation tolerance like every
    * grouped mean.
    *
    * Scale: one per-group ranking window (the [[groupQuantiles]]
    * shuffle) + one grouped aggregation.
    * Output: (group, n_total, n_kept, trimmed_mean). */
  def trimmedMean(df: DataFrame, groupCol: String, valCol: String,
      trimTenths: Int = 1): DataFrame = {
    require(trimTenths >= 0 && trimTenths <= 4,
      s"trim fraction is tenths per side in [0, 4], got $trimTenths")
    val ranked = df
      .select(col(groupCol), col(valCol))
      .na.drop(Seq(valCol))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col(valCol))))
      .withColumn("__n", count(lit(1)).over(
        Window.partitionBy(col(groupCol))))
      .withColumn("__cut", expr(s"(__n * $trimTenths) DIV 10"))
    ranked
      .filter(col("__rn") > col("__cut") &&
        col("__rn") <= col("__n") - col("__cut"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_total"),
        count(lit(1)).as("n_kept"),
        (sum(col(valCol)) / count(lit(1))).as("trimmed_mean"))
  }

  /** Robust per-group outliers by median absolute deviation: flag rows
    * with |v − median| > k · 1.4826 · MAD (1.4826 ≈ 1/Φ⁻¹(3/4) scales
    * MAD to σ under normality). Both medians are the discrete
    * [[groupQuantiles]] p=0.5 — actual data values — so every quantity
    * compared is a short chain of IEEE ops written identically in the
    * oracle: bit-exact flags, no tolerance. MAD is the production
    * choice over z-scores because mean/stddev are themselves dragged by
    * the outliers being hunted (and a parallel stddev is
    * summation-order-dependent — not oracle-able bit-exactly).
    *
    * Scale: two grouped-quantile passes (group-keyed shuffles) + one
    * broadcast-sized (one row per group) join back to the data.
    * Output: the outlier rows, (id, group, value, center, spread). */
  def madOutliers(df: DataFrame, groupCol: String, valCol: String,
      idCol: String, k: Double = 3.0): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    // null-safe <=> joins: a NULL group is a real partition (groupBy
    // keeps it), so the per-group medians must join back to its rows —
    // a null-rejecting equi-join would silently drop them (the same
    // trap groupQuota's semi-join fixed in round 4). Note MAD = 0
    // (≥ half the group at the median) degenerates to "any off-median
    // value flags" — standard MAD behavior, spec-pinned.
    val med = groupQuantiles(df, groupCol, valCol, Seq(0.5))
      .select(col(groupCol).as("__mg"), col("quantile").as("center"))
    val withDev = df.select(col(idCol), col(groupCol), col(valCol))
      .na.drop(Seq(valCol))
      .join(med, col(groupCol) <=> col("__mg"))
      .drop("__mg")
      .withColumn("__dev", abs(col(valCol) - col("center")))
    val mad = groupQuantiles(withDev, groupCol, "__dev", Seq(0.5))
      .select(col(groupCol).as("__mg"), col("quantile").as("mad"))
    withDev.join(mad, col(groupCol) <=> col("__mg"))
      .drop("__mg")
      .withColumn("spread", (lit(k) * lit(1.4826)) * col("mad"))
      .filter(col("__dev") > col("spread"))
      .select(col(idCol), col(groupCol), col(valCol), col("center"),
        col("spread"))
  }

  /** Fixed-width histogram over a numeric column: `nBins` equal bins
    * spanning [min, max], max landing in the last bin. Bin assignment
    * `floor(((v − lo) · nBins) / (hi − lo))` and the reported left edge
    * `lo + (bucket · (hi − lo)) / nBins` are each one IEEE
    * multiply-divide chain mirrored verbatim in the oracle — bit-exact
    * bins and edges. Degenerate all-equal columns collapse to bin 0.
    *
    * Scale: one min/max aggregate (broadcast back as a single row) +
    * one map-side-combinable count by bin — two scans, no wide
    * shuffle; empty bins are absent (sparse output).
    * Output: (bucket, bin_lo, n). */
  def histogram(df: DataFrame, valCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, s"need nBins >= 1, got $nBins")
    val bounds = df.na.drop(Seq(valCol))
      .agg(min(col(valCol)).cast("double").as("lo"),
        max(col(valCol)).cast("double").as("hi"))
    df.select(col(valCol)).na.drop(Seq(valCol))
      .join(broadcast(bounds))
      .withColumn("bucket",
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(lit(nBins - 1L),
            floor(((col(valCol) - col("lo")) * lit(nBins)) /
              (col("hi") - col("lo"))))))
      .groupBy("bucket", "lo", "hi")
      .agg(count(lit(1)).as("n"))
      .withColumn("bin_lo",
        col("lo") + (col("bucket") * (col("hi") - col("lo"))) / lit(nBins))
      .select("bucket", "bin_lo", "n")
  }

  /** Column profile — per-column null and exact distinct counts in ONE
    * pass over the table (Spark plans the multi-distinct aggregate via
    * Expand: rows replicate per distinct-column, counts stay partial-
    * aggregated; no per-column rescan of the 100 TB input). The
    * data-quality dashboard every ingest runs before anything else.
    * Output: (column_name, n_rows, n_nulls, n_distinct) — distinct
    * excludes NULLs, both engines' COUNT(DISTINCT) convention. */
  /** Reaggregatable per-key summary — the incremental-ETL contract: a
    * nightly pipeline does NOT rescan history, it merges yesterday's
    * summary with today's batch. That only works for aggregates that
    * form a commutative monoid, so the summary carries (sum, cnt, min,
    * max) — each mergeable — and NEVER a finished mean (means don't
    * merge; they re-derive from sum/cnt at read time via
    * [[finishSummary]]). The same decomposition is what Spark's own
    * partial aggregation does inside one job; this surfaces it ACROSS
    * jobs, where the engine can't.
    *
    * Scale: one map-side-combined aggregation each; the merge shuffles
    * only |keys| summary rows, never the raw corpus. */
  def keySummary(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.filter(col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(col(valCol)).as("s"),
        count(lit(1)).as("cnt"),
        min(col(valCol)).as("mn"),
        max(col(valCol)).as("mx"))

  /** Merge two summaries keyed on `keyCol`: the monoid operation.
    * Outer union semantics — a key present in only one side keeps its
    * summary unchanged. */
  def mergeSummaries(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.unionByName(b)
      .groupBy(col(keyCol))
      .agg(sum(col("s")).as("s"),
        sum(col("cnt")).as("cnt"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Finish a summary for reading: derived mean from the mergeable
    * parts. */
  def finishSummary(s: DataFrame): DataFrame =
    s.withColumn("mean", col("s") / col("cnt"))

  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__nd_$c")))
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    row.select(explode(array(cols.map(c =>
        struct(lit(c).as("column_name"),
          col("__total").as("n_rows"),
          (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__nd_$c").as("n_distinct"))): _*)).as("p"))
      .select("p.*")
  }
}
