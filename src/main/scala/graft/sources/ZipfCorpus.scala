package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic OPEN-VOCABULARY (Zipf-ish) document corpus, derived
  * in-plan from the `documents` table's `doc_id` column — the realistic
  * counterpart to the driver corpus's adversarial 30-word vocabulary.
  *
  * Why it exists: the prefix-filtered pair-mining core (Dedup.scala) is
  * corpus-shape-sensitive by design — on the dense driver corpus every
  * shingle's doc frequency grows with corpus size (the worst case the
  * hot-shingle cap exists for), while production corpora have power-law
  * word frequencies where almost every shingle is rare. Gating the near-dup
  * family on BOTH shapes pins correctness where each mechanism (prefix
  * filter, df cap, banding) actually fires.
  *
  * Every construct here is chosen to be BYTE-IDENTICAL between Spark and
  * DuckDB so the gate can hash-compare:
  *   - randomness = md5 of "<doc_id>:<salt>" (the one hash family both
  *     engines share), first 5 hex chars → a 20-bit uniform integer;
  *   - the Zipf-ish rank map is pure int64 arithmetic
  *     (rank = ((u³ >> 40) · 20000) >> 20, density ∝ rank^(-2/3), heavy
  *     head + 20k-word tail) — no pow/log/float whose last-ulp behavior
  *     could differ between libm implementations;
  *   - word length 10..100 via the same integer scaling.
  *
  * Planted structure (all decided by portable 20-bit draws):
  *   - 25 % of docs get an 8-word boilerplate header (the segment-dedup
  *     target; its 3-shingles also cross the hot-shingle cap at sf≥0.1,
  *     exercising suppression on the realistic corpus);
  *   - ~4 % of docs duplicate the previous doc's BASE words (pre-planting
  *     — a dup-of-a-dup reproduces base words, not the neighbor's final
  *     text; both engines copy the same thing so hashes agree), odd ids
  *     with one trailing extra word (jaccard ≈ 0.94 for an unchained
  *     plant — near-dup, not exact);
  *   - ~2 % quote the previous doc's first 12 BASE words (containment 1.0
  *     against an unchained neighbor, jaccard far below threshold — the
  *     quote-inclusion case).
  * Pair volume is therefore ~6 % of N: linear, like real corpora.
  */
object ZipfCorpus {

  private val VocabSize = 20000L
  private val BoilerWords =
    Seq("terms", "of", "service", "apply", "all", "rights", "reserved", "inc")
  // thresholds on the 20-bit draw (2^20 = 1048576)
  private val BoilerLt = 262144L // 25 %
  private val DupLt = 42000L     // ~4 %
  private val QuoteLt = 63000L   // ~2 % more

  /** First 5 hex chars of md5(s) as a 20-bit long — Spark side. Public:
    * this is the library's engine-portable uniform-draw primitive (also
    * used by the synthetic geo-point construction in SparkEntry).
    */
  def u20(s: Column): Column =
    conv(substring(md5(s), 1, 5), 16, 10).cast("long")

  private def seed(salt: String): Column =
    u20(concat(col("doc_id").cast("string"), lit(s":$salt")))

  /** The corpus: (doc_id, text), one row per `documents` row.
    *
    * `materializeBase = true` pins the per-doc generated word arrays with
    * ONE eager localCheckpoint before the prev-doc self-join: the
    * generation expressions (per-word md5 draws through interpreted
    * higher-order `transform` lambdas — the dominant cost, measured
    * ~2× the scorer legs on the r17 board triage) are otherwise
    * evaluated TWICE, once per join side. Byte-identical text either
    * way. Keep the default (lazy) wherever a caller filters the id space
    * first (q_dedup_eval's constant-size audit block) so pushdown keeps
    * generation O(block), not O(corpus). */
  def docs(
      spark: SparkSession,
      dir: String,
      materializeBase: Boolean = false): DataFrame = {
    val ids = Tables.documents(spark, dir).select(col("doc_id"))
    // one native codegen kernel per doc replaces the r17-and-earlier
    // interpreted `transform(sequence(1, n), wi -> u20(...))` chain
    // (HOFs are CodegenFallback — every word paid an interpreted
    // cast/concat/md5/conv walk); bit-identical output, pinned by
    // ZipfWordsSpec against the old formulation and by the untouched
    // DuckDB CTE replay below
    val zw = graft.plans.ZipfExpressions.zipfWords(col("doc_id"))
    val base0 = ids.select(
      col("doc_id"),
      when(seed("boil") < BoilerLt,
        concat(array(BoilerWords.map(lit): _*), zw)).otherwise(zw).as("words"))
    val base = if (materializeBase) base0.localCheckpoint(true) else base0
    val prev = base.select(
      (col("doc_id") + 1L).as("doc_id"), col("words").as("_prev"))
    val up = seed("plant")
    base.join(prev, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        array_join(
          when(col("_prev").isNotNull && up < DupLt,
            when(pmod(col("doc_id"), lit(2L)) === 1L,
              concat(col("_prev"), array(lit("extra"))))
              .otherwise(col("_prev")))
            .when(col("_prev").isNotNull && up < QuoteLt,
              slice(col("_prev"), 1, 12))
            .otherwise(col("words")),
          " ").as("text"))
  }

  // ---- DuckDB replay ------------------------------------------------------

  /** First 5 hex chars of md5(`a`) folded to a BIGINT — DuckDB side,
    * digit-for-digit the same value as [[u20]].
    */
  def u20Sql(a: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(split(substring(md5($a), 1, 5), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), " +
      "(acc, d) -> acc * 16 + d)"

  private val BoilerListSql = BoilerWords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** CTE chain ending in `zdocs(doc_id, text)` — byte-identical to
    * [[docs]]. Embed as `WITH $ZdocsSql, ...` in an oracle query.
    */
  val ZdocsSql: String =
    s"""zl AS (SELECT doc_id,
       |    10 + ((${u20Sql("CAST(doc_id AS varchar) || ':len'")} * 91) >> 20) AS n
       |  FROM documents),
       |zb AS (SELECT doc_id,
       |    CASE WHEN ${u20Sql("CAST(doc_id AS varchar) || ':boil'")} < $BoilerLt
       |      THEN $BoilerListSql || zw ELSE zw END AS words
       |  FROM (SELECT doc_id,
       |      list_transform(
       |        list_transform(range(1, n + 1),
       |          wi -> ${u20Sql("CAST(doc_id AS varchar) || ':' || CAST(wi AS varchar)")}),
       |        u -> 'w' || CAST((((u * u * u) >> 40) * $VocabSize) >> 20 AS varchar)) AS zw
       |    FROM zl)),
       |zdocs AS (SELECT z.doc_id,
       |    array_to_string(
       |      CASE WHEN p.words IS NOT NULL AND z.up < $DupLt THEN
       |             CASE WHEN z.doc_id % 2 = 1 THEN p.words || ['extra'] ELSE p.words END
       |           WHEN p.words IS NOT NULL AND z.up < $QuoteLt THEN list_slice(p.words, 1, 12)
       |           ELSE z.words END, ' ') AS text
       |  FROM (SELECT doc_id, words,
       |      ${u20Sql("CAST(doc_id AS varchar) || ':plant'")} AS up FROM zb) z
       |  LEFT JOIN zb p ON p.doc_id = z.doc_id - 1)""".stripMargin
}
