package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (the BERT vocabulary; Schuster & Nakajima 2012,
  * Devlin et al. 2018) — the third standard subword family next to
  * [[Bpe]] and [[Unigram]]: training merges the adjacent symbol pair
  * with the best LIKELIHOOD ratio `freq(ab) / (freq(a)·freq(b))` (not
  * the raw pair count — BPE's one differing rule), non-initial symbols
  * carry the `##` continuation prefix, and application is GREEDY
  * LONGEST-MATCH-FIRST against the final vocabulary (no merge replay) —
  * a word with any unmatchable remainder becomes one `[UNK]` token.
  *
  * Scale shape — the [[Bpe]] vocab-table discipline end to end: ONE
  * corpus scan builds the (word, cnt) vocabulary; each merge round runs
  * a vocab-sized pair count + a vocab-sized symbol count + a 1-row
  * argmax collect + one literal scan-side `replace`
  * (`localCheckpoint` per round, plans never nest). Application never
  * joins: the final vocabulary is BOUNDED (alphabet + one symbol per
  * merge), rides into the scan as a reference object of the native
  * whole-stage-codegen kernel [[graft.plans.WordPieceEncode]], and each
  * DISTINCT word encodes once (documents re-assemble by position).
  *
  * Engine-exactness: the likelihood score is the exact-integer
  * quantized log `ilog2q(pcnt) − ilog2q(cnt_a) − ilog2q(cnt_b)`
  * ([[Unigram.ilog2q]] — monotone piecewise-linear log2, identical in
  * any engine with integer shifts), ties toward the lexically smaller
  * pair; symbol sequences use [[Bpe]]'s sentinel-delimited string
  * encoding, so a merge is ONE literal `replace` with identical
  * semantics in any SQL engine. The full trajectory — pair counts,
  * symbol counts, scores, merges, greedy segmentation — replays
  * hash-exact in DuckDB recursive CTEs. No floats anywhere.
  */
object WordPiece {

  /** The continuation prefix of non-initial symbols. */
  val Cont = "##"

  /** The unknown-word token greedy application falls back to. */
  val Unk = "[UNK]"

  import Bpe.{D, symsOf}

  /** Sentinel-delimited WordPiece symbol encoding: first char plain,
    * every later char `##`-prefixed — `abc` → `⟨a⟩⟨##b⟩⟨##c⟩`. */
  private def symStrWp(word: Column): Column =
    concat(lit(D),
      concat_ws(D + D,
        transform(
          sequence(lit(1), length(word)),
          i => when(i === 1, substring(word, 1, 1))
            .otherwise(concat(lit(Cont), word.substr(i, lit(1)))))),
      lit(D))

  /** Per-symbol corpus frequencies over a (s, cnt) vocab frame. */
  private[operators] def symCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"), explode(symsOf(col("s"))).as("sym"))
      .groupBy(col("sym"))
      .agg(sum(col("cnt")).as("scnt"))

  /** The merged symbol of pair (a, b): `##` is an affix, not content —
    * `a + strip##(b)`, keeping a's own prefix if it has one. */
  private def mergedSym(a: String, b: String): String =
    a + (if (b.startsWith(Cont)) b.substring(Cont.length) else b)

  /** Train `m` likelihood-scored merges over the corpus word vocab.
    * Returns (step, sym_a, sym_b, pair_cnt, score_q) — score_q is the
    * quantized integer log-likelihood the argmax ran on. Stops early if
    * no pair remains.
    */
  def train(
      docs: DataFrame,
      textCol: String,
      m: Int): Array[(Int, String, String, Long, Long)] =
    trainOnWords(Bpe.wordVocab(docs, textCol), m)

  /** [[train]] over a prepared `(word, cnt)` vocab frame. The symbol
    * vocab is materialized ONCE; each round's merge is a CHAINED literal
    * `replace` over that base (the [[Bpe]] trainOnVocab discipline:
    * one Spark job per round — the argmax — instead of two; identical
    * pair/symbol statistics, so the merge trajectory is bit-identical),
    * with the chain folded into a fresh checkpoint every
    * [[Bpe.CheckpointEvery]] merges so expression depth stays bounded
    * for production-sized m (shared constant: the two merge loops must
    * not drift if the fold interval is retuned). */
  def trainOnWords(
      wordVocab: DataFrame,
      m: Int): Array[(Int, String, String, Long, Long)] = {
    require(m > 0, s"need at least one merge, got $m")
    var base = wordVocab
      .select(symStrWp(col("word")).as("s"), col("cnt"))
      .localCheckpoint(true)
    var sym: org.apache.spark.sql.Column = col("s")
    var depth = 0
    val merges = Array.newBuilder[(Int, String, String, Long, Long)]
    var step = 1
    var done = false
    while (step <= m && !done) {
      val vocab = base.select(sym.as("s"), col("cnt"))
      val syms = symCounts(vocab)
      val best = Bpe.pairCounts(vocab)
        .join(syms.select(col("sym").as("a"), col("scnt").as("ca")), "a")
        .join(syms.select(col("sym").as("b"), col("scnt").as("cb")), "b")
        .select(col("a"), col("b"), col("pcnt"),
          (Unigram.ilog2q(col("pcnt")) - Unigram.ilog2q(col("ca")) -
            Unigram.ilog2q(col("cb"))).as("score_q"))
        .orderBy(col("score_q").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((step, a, b, best(0).getLong(2), best(0).getLong(3)))
        sym = replace(sym, lit(D + a + D + D + b + D),
          lit(D + mergedSym(a, b) + D))
        depth += 1
        if (depth >= Bpe.CheckpointEvery) {
          base = base.select(sym.as("s"), col("cnt")).localCheckpoint(true)
          sym = col("s")
          depth = 0
        }
        step += 1
      }
    }
    merges.result()
  }

  /** The merge table as a DataFrame (the training gate's output). */
  def mergeTable(
      spark: SparkSession,
      merges: Array[(Int, String, String, Long, Long)]): DataFrame = {
    import spark.implicits._
    merges.toSeq.toDF("step", "sym_a", "sym_b", "pair_cnt", "score_q")
      .select(col("step").cast("long").as("step"), col("sym_a"),
        col("sym_b"), col("pair_cnt"), col("score_q"))
  }

  /** The final vocabulary greedy application matches against: the
    * corpus alphabet (every initial and `##`-continuation single char)
    * plus one merged symbol per training step. BOUNDED — ≤ 2·|alphabet|
    * + m entries — so it collects as kernel parameters, never a join.
    */
  def finalVocab(
      docs: DataFrame,
      textCol: String,
      merges: Array[(Int, String, String, Long, Long)]): Array[String] =
    finalVocabOnWords(Bpe.wordVocab(docs, textCol), merges)

  /** [[finalVocab]] over a prepared `(word, cnt)` vocab frame. */
  def finalVocabOnWords(
      wordVocab: DataFrame,
      merges: Array[(Int, String, String, Long, Long)]): Array[String] = {
    val singles = wordVocab
      .select(explode(symsOf(symStrWp(col("word")))).as("sym"))
      .distinct()
      .orderBy(col("sym"))
      .collect()
      .map(_.getString(0))
    (singles ++ merges.map { case (_, a, b, _, _) => mergedSym(a, b) })
      .distinct
  }

  /** Greedy longest-match-first encoding of every corpus vocab word —
    * each DISTINCT word encodes once through the native kernel — with
    * per-subword corpus frequencies (top `k` by count, ties to the
    * smaller subword), the [[Bpe.subwordCounts]] /
    * [[Unigram.subwordCounts]] twin.
    */
  def subwordCounts(
      docs: DataFrame,
      textCol: String,
      vocab: Array[String],
      k: Int): DataFrame =
    subwordCountsOnWords(Bpe.wordVocab(docs, textCol), vocab, k)

  /** [[subwordCounts]] over a prepared `(word, cnt)` vocab frame. */
  def subwordCountsOnWords(
      wordVocab: DataFrame,
      vocab: Array[String],
      k: Int): DataFrame =
    wordVocab
      .select(col("cnt"),
        explode(graft.plans.TextExpressions.wordPieceEncode(
          col("word"), vocab, Unk)).as("subword"))
      .groupBy(col("subword"))
      .agg(sum(col("cnt")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("subword"))
      .limit(k)

  /** Corpus token TOTALS under a final vocabulary — the
    * tokenizer-comparison row ([[Bpe.charTokenTotals]] twin; greedy
    * encode per DISTINCT word, one vocab-sized pass). */
  def tokenTotals(
      docs: DataFrame,
      textCol: String,
      vocab: Array[String]): DataFrame =
    tokenTotalsOnWords(Bpe.wordVocab(docs, textCol), vocab)

  /** [[tokenTotals]] over a prepared `(word, cnt)` vocab frame. */
  def tokenTotalsOnWords(
      wordVocab: DataFrame,
      vocab: Array[String]): DataFrame =
    wordVocab.agg(
      sum(col("cnt")).cast("long").as("n_units"),
      sum(length(col("word")) * col("cnt")).cast("long").as("n_chars"),
      sum(size(graft.plans.TextExpressions.wordPieceEncode(
        col("word"), vocab, Unk)) * col("cnt")).cast("long").as("n_tokens"))

  /** Doc-grain WordPiece tokenization — the packing-stage consumable,
    * the [[Bpe.docByteTokens]] / [[Unigram.docTokenIds]] twin: each
    * DISTINCT eligible word greedy-encodes once, pieces map to dense
    * ids (rank over the bounded final vocab, `[UNK]` included),
    * documents re-assemble into ordered comma-joined id sequences.
    * Two vocab-sized joins + one doc-grain aggregation.
    */
  def docTokenIds(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Array[String]): DataFrame = {
    import graft.functions.Text
    val words = docs.select(col(idCol),
        posexplode(Text.tokens(col(textCol))).as(Seq("wpos", "word")))
      .filter(col("word").rlike("^[a-z0-9]+$"))
    val ids = (vocab :+ Unk).distinct.sorted.zipWithIndex
      .map { case (p, i) => (p, i.toLong + 1L) }
    val idOf = map(ids.flatMap { case (p, i) => Seq(lit(p), lit(i)) }: _*)
    val wordIds = words.select(col("word")).distinct()
      .select(col("word"),
        transform(
          graft.plans.TextExpressions.wordPieceEncode(
            col("word"), vocab, Unk),
          p => element_at(idOf, p)).as("ids"))
    words.join(wordIds, Seq("word"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("wpos"), col("ids"))).as("_t"))
      .select(col(idCol),
        graft.plans.TextExpressions.tokenSeqJoin(col("_t")).as("_r"))
      .select(col(idCol), col("_r.n_tokens").as("n_tokens"),
        col("_r.token_ids").as("token_ids"))
  }
}
