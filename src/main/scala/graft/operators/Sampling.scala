package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. At 100 TB, sampling
  * must be (a) shuffle-free — a scan-side filter that parquet row groups
  * stream through, (b) reproducible across runs and engines, and (c)
  * stratified — per-class rates, since web-scale corpora are wildly
  * imbalanced. Hash-mod bucketing gives all three; `TABLESAMPLE`/`rand()`
  * give none (nondeterministic, non-stratified).
  */
object Sampling {

  /** Keep rows where `bucket` (0..buckets-1, derived deterministically from
    * a unit column) falls under the class's per-mille/percent rate.
    * `rates` maps class value → kept buckets; unlisted classes use
    * `defaultRate`. Pure filter: no shuffle, pushdown-friendly.
    *
    * Pass `bucket = pmod(xxhash64(col(id)), lit(buckets))` in production —
    * uniform even when ids are clustered; any deterministic bucketing
    * expression works (the oracle-checked query uses a plain modulus so a
    * SQL engine can reproduce it).
    */
  def stratified(
      df: DataFrame,
      classCol: String,
      bucket: Column,
      buckets: Int,
      rates: Map[String, Int],
      defaultRate: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (cls, r)) =>
      when(col(classCol) === cls, lit(r)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Sample the corpus DOWN to a target domain mixture — the data-mixing
    * step of a pretraining pipeline (DoReMi-style static weights): given
    * target shares `weights` (per `classCol` value) and a total `budget` of
    * documents, each class keeps `rate = min(1, budget·w / n_class)` of its
    * rows. Classes without a weight are dropped; a class too small for its
    * target share caps at rate 1 (can't oversample without replacement) and
    * the achieved mixture under-shoots there — report, don't resample.
    *
    * Scale shape: class cardinalities are ONE map-side-combined
    * `groupBy(classCol).count` over a column-pruned scan (the per-class
    * table is domains-sized, tiny); rates join back as a BROADCAST, and the
    * keep decision is a scan-side filter on a deterministic per-row hash —
    * the corpus itself is never shuffled. Reproducible across runs, engines
    * and partitionings: the uniform is the top 40 bits of
    * `fnvMix(idCol, seed)` (engine-portable, DuckDB-replayable), not
    * `rand()`.
    */
  def toMixture(
      df: DataFrame,
      idCol: String,
      classCol: String,
      weights: Map[String, Double],
      budget: Long,
      seed: Long): DataFrame = {
    val weight = weights.foldLeft(lit(0.0)) { case (acc, (cls, w)) =>
      when(col(classCol) === cls, lit(w)).otherwise(acc)
    }
    val rates = df.groupBy(col(classCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", weight)
      .filter(col("_w") > 0)
      .select(col(classCol),
        least(lit(1.0),
          lit(budget.toDouble) * col("_w") / col("_n").cast("double")).as("_rate"))
    val u = shiftrightunsigned(
        graft.plans.HashExpressions.fnvMix(col(idCol).cast("string"), seed), 24)
      .cast("double") / lit(1099511627776.0) // top 40 bits → uniform [0, 1)
    df.join(broadcast(rates), Seq(classCol))
      .filter(u < col("_rate"))
      .drop("_rate")
  }

  /** Temperature-balanced downsampling (α = 1/2): resample the corpus so
    * class shares flatten from ∝ n_c to ∝ n_c^α — the standard multilingual
    * data-balancing move (temperature / exponent-smoothed sampling as in
    * multilingual LM and MT training), which up-weights tail languages
    * without flattening to uniform. α is FIXED at 1/2 because `sqrt` is the
    * one power IEEE-754 requires to be correctly rounded — `pow(x, α)` for
    * general α is NOT bit-portable across libm implementations, so α = 1/2
    * is the only temperature with an engine-exact, oracle-replayable rate.
    *
    * Rates: the smallest class keeps everything, and every class keeps
    * `rate_c = sqrt(n_min) / sqrt(n_c)` — expected kept counts ∝ sqrt(n_c),
    * i.e. shares ∝ n_c^(1/2), without replacement (no class oversamples).
    *
    * Scale shape, same as [[toMixture]]: class cardinalities are one
    * map-side-combined count (a classes-sized table), n_min folds it to one
    * broadcast row, and the keep decision is a scan-side filter on the
    * portable FnvMix uniform — the corpus is never shuffled.
    */
  def temperatureBalance(
      df: DataFrame,
      idCol: String,
      classCol: String,
      seed: Long): DataFrame = {
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("_n"))
    val nMin = counts.agg(min("_n").as("_n_min"))
    val rates = counts.crossJoin(broadcast(nMin))
      .select(col(classCol),
        (sqrt(col("_n_min").cast("double")) /
          sqrt(col("_n").cast("double"))).as("_rate"))
    val u = shiftrightunsigned(
        graft.plans.HashExpressions.fnvMix(col(idCol).cast("string"), seed), 24)
      .cast("double") / lit(1099511627776.0)
    df.join(broadcast(rates), Seq(classCol))
      .filter(u < col("_rate"))
      .drop("_rate")
  }

  /** Deterministic FIXED-SIZE sample per stratum: exactly `min(k, |stratum|)`
    * rows from each stratum, chosen as the k smallest portable-hash uniforms
    * — the eval-set / human-review draw ("500 docs per language, same 500
    * every run"), where [[stratified]]/[[toMixture]]'s rate-based keeps give
    * only an EXPECTED size. Selection is a pure function of (id, seed):
    * reruns, retries, and re-partitions return the identical sample, and a
    * grown corpus changes the draw only where new ids hash below a kept
    * one.
    *
    * Scale shape: the naive form — `row_number() over (partition by stratum
    * order by u)` — sorts the ENTIRE corpus through as many tasks as there
    * are strata (a handful of languages ⇒ a handful of tasks at 100 TB).
    * This routes through [[graft.plans.TopKPerKey]] instead: bounded
    * k-element heaps after the stratum repartition, O(n) scan per task, and
    * the retained set is min(strata·k, spill threshold) rows — the heap
    * discards above-k rows on sight instead of sorting them.
    *
    * `idCol` must be non-null and unique: a null id yields a null uniform,
    * and NULLS FIRST ordering would hand it a permanent heap slot.
    */
  /** Cumulative split boundaries for [[splitAssign]] — public so the oracle
    * and the operator embed the IDENTICAL doubles (0.9 + 0.05 is
    * 0.9500000000000001 in IEEE; both engines must compare against that
    * exact value, not a re-derived one).
    */
  def cumFractions(splits: Seq[(String, Double)]): Seq[Double] =
    splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail

  /** Deterministic train/val/test split assignment: every row gets exactly
    * one split label from its portable-hash uniform vs the cumulative
    * fraction ladder — disjoint and exhaustive by construction (the last
    * split is the catch-all, so float edges cannot drop a row). Assignment
    * is a pure function of (id, seed): stable across reruns, partitionings,
    * and engines, and a new row never moves existing rows between splits —
    * the leakage-safety property a random() split does not have.
    *
    * A null id hashes to a null uniform, which falls through every ladder
    * rung into the LAST split (exhaustiveness is preserved); filter or fix
    * null ids upstream if that is not wanted.
    *
    * Scale shape: one scan-side projection, zero shuffle.
    */
  def splitAssign(
      df: DataFrame,
      idCol: String,
      seed: Long,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0), s"fractions must be positive: $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${splits.map(_._2).sum}")
    val u = shiftrightunsigned(
        graft.plans.HashExpressions.fnvMix(col(idCol).cast("string"), seed), 24)
      .cast("double") / lit(1099511627776.0)
    val cums = cumFractions(splits)
    val ladder = splits.init.zip(cums.init).foldLeft(Option.empty[Column]) {
      case (None, ((name, _), c)) => Some(when(u < lit(c), lit(name)))
      case (Some(e), ((name, _), c)) => Some(e.when(u < lit(c), lit(name)))
    }
    df.withColumn(splitCol, ladder.get.otherwise(lit(splits.last._1)))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006
    * A-ES priority sampling): keep exactly `k` rows with inclusion
    * probability ∝ `weightCol`, no row twice — the data-mixing
    * workhorse (sample documents ∝ quality score / token count). Each
    * row draws the priority key `u^(1/w)` and the global top-k by key
    * is exactly an A-ES sample; equivalently top-k by `log2(u)/w`,
    * which is what runs here.
    *
    * Engine-exactness: `u = (u40+1)/2^40` from the top 40 bits of the
    * portable FnvMix draw, and the key is the QUANTIZED integer
    * rational `−((40·2^16 − ilog2q(u40+1)) · 2^20 div w)` —
    * [[Unigram.ilog2q]]'s exact piecewise-linear log2, so the whole
    * draw replays bit-identically in SQL. Quantization (1/2^16 log2
    * grid, then the div-w floor) only perturbs near-ties vs the real
    * ln-based key; ties break on `idCol`. Rows with weight < 1 never
    * sample (by contract — weights are positive integers).
    *
    * Scale shape: the key is scan-side arithmetic on a pruned scan and
    * the top-k is one TakeOrdered (per-partition heaps + a k-row driver
    * merge) — the corpus is never shuffled or sorted.
    */
  /** The A-ES priority key of ([[weightedFixedK]])'s contract — exposed
    * so the streaming fold draws the IDENTICAL key per row. */
  def aesKey(idCol: String, weightCol: String, seed: Long): Column = {
    val u40 = shiftrightunsigned(
      graft.plans.HashExpressions.fnvMix(col(idCol).cast("string"), seed), 24)
    val negL = lit(40L * 65536L) - Unigram.ilog2q(u40 + lit(1L))
    val x = call_function("shiftleft", negL, lit(20))
    val w = col(weightCol).cast("long")
    -(((x - pmod(x, w)) / w).cast("long"))
  }

  def weightedFixedK(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.filter(col(weightCol).cast("long") >= 1L)
      .withColumn("_aes_key", aesKey(idCol, weightCol, seed))
      .orderBy(col("_aes_key").desc, col(idCol))
      .limit(k)
      .drop("_aes_key")
  }

  def fixedPerStratum(
      df: DataFrame,
      strataCols: Seq[String],
      idCol: String,
      k: Int,
      seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val u = shiftrightunsigned(
        graft.plans.HashExpressions.fnvMix(col(idCol).cast("string"), seed), 24)
      .cast("double") / lit(1099511627776.0)
    graft.plans.TopK.perKey(
      df.withColumn("sample_u", u),
      strataCols,
      Seq(col("sample_u").asc, col(idCol).asc),
      k)
  }
}
