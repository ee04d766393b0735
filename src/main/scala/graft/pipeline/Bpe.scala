package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016 — the
  * public word-level BPE that GPT-class tokenizers descend from): learn
  * the `nMerges` most frequent adjacent-symbol merges over the corpus.
  *
  * Spark-first shape — the part that matters at 100 TB: the corpus is
  * touched ONCE (token explode + combinable groupBy → the word-TYPE
  * table, vocabulary-sized, with frequencies). Every training iteration
  * after that runs over word TYPES, not tokens — pair census = one
  * map-only pair expansion + one map-side-combinable groupBy(a, b)
  * weighted by word frequency; the argmax is a driver scalar (ONE pair
  * per round, the canonical BPE sync point); the merge itself is a
  * codegen'd per-row `aggregate` fold (greedy leftmost non-overlapping,
  * the reference semantics). Nothing corpus-sized moves after the first
  * shuffle, and the word-type table shrinks as merges fuse symbols.
  *
  * Determinism: ties in the pair argmax break by (a asc, b asc) — the
  * published algorithm leaves ties unspecified; fixing them makes the
  * learned vocabulary reproducible run-to-run and engine-to-engine. */
object Bpe {

  /** The word-type table: (w, n) distinct words with corpus frequencies.
    * The single corpus-sized pass. */
  def wordTypes(docs: DataFrame): DataFrame =
    docs.select(explode(Dedup.tokensCol("text")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))

  /** Initial symbol sequences: every word split into single characters
    * (codepoint-safe — `split` on the empty pattern yields code units;
    * we use a grapheme-safe regex split keeping supplementary pairs
    * intact is unnecessary for the [a-z0-9_] token alphabet, and the
    * behavior is pinned by spec). */
  private def charSyms(w: Column): Column =
    filter(split(w, ""), s => length(s) > 0)

  /** Adjacent-pair census over a (syms, n) symbol table: (a, b, n) summed
    * word-frequency-weighted counts. Map-only expansion + ONE combinable
    * groupBy. */
  def pairCensus(syms: DataFrame): DataFrame =
    syms.where(size(col("syms")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] AS a, syms[i + 1] AS b))"))
        .as("p"), col("n"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("n")).as("n"))

  /** The driver-facing initial pair census straight from documents
    * (the gate surface): character-pair counts weighted by word
    * frequency. */
  def initialPairCensus(docs: DataFrame): DataFrame =
    pairCensus(wordTypes(docs).select(charSyms(col("w")).as("syms"), col("n")))

  /** Apply ONE merge (a, b) → a+b to a symbol array, greedy leftmost
    * non-overlapping (the reference semantics: a freshly merged symbol
    * can itself absorb a following `b` only if it literally equals `a`,
    * which concatenation precludes). Pure codegen'd fold. */
  private[pipeline] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

  /** Train `nMerges` merges; returns the learned merge list in order.
    * Each round: census (one combinable shuffle over word types) →
    * driver argmax (count desc, then a asc, b asc) → map-only merge
    * application. Stops early when no pair remains. */
  def train(docs: DataFrame, nMerges: Int): Seq[(String, String)] = {
    var syms = wordTypes(docs)
      .select(charSyms(col("w")).as("syms"), col("n"))
      .localCheckpoint() // pin the corpus-sized pass; rounds re-read types only
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var done = false
      while (merges.length < nMerges && !done) {
        val top = pairCensus(syms)
          .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
        if (top.isEmpty) done = true
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          val next = syms.select(applyMerge(col("syms"), a, b).as("syms"), col("n"))
            .localCheckpoint()
          syms.unpersist()
          syms = next
        }
      }
      merges.toSeq
    } finally { syms.unpersist(); () }
  }

  /** The pair census AFTER training `nMerges` merges — the table the
    * NEXT merge would argmax over (gate surface for the full
    * argmax → greedy-merge → recount loop; an independent engine
    * reproduces round k+1 from round k via leftmost-nonoverlapping
    * string replacement of the learned pair, which is exactly the
    * greedy fold's semantics when round-k symbols are single units). */
  def censusAfter(docs: DataFrame, nMerges: Int): DataFrame = {
    val merges = train(docs, nMerges)
    val syms = merges.foldLeft(
      wordTypes(docs).select(charSyms(col("w")).as("syms"), col("n"))) {
      case (df, (a, b)) => df.select(applyMerge(col("syms"), a, b).as("syms"), col("n"))
    }
    pairCensus(syms)
  }

  /** Tokenize a word column with a learned merge list (applied in
    * training order — the standard BPE encode). */
  def encode(words: DataFrame, wordCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val start = charSyms(col(wordCol))
    val enc = merges.foldLeft(start) { case (c, (a, b)) => applyMerge(c, a, b) }
    words.withColumn("bpe", enc)
  }
}
