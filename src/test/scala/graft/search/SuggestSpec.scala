package graft.search

import graft.SparkTestSession
import graft.build.IndexBuilder
import graft.corpus.{CorpusGen, SourceFile}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Suggesters (reference: Lucene.Net.Suggest — AnalyzingSuggester.cs,
  * FuzzySuggester.cs, Spell/SpellChecker.cs): analyzed completion keys,
  * fuzzy prefixes, distance-then-popularity ranking. */
class SuggestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk(i: Int, text: String) =
    SourceFile("r", f"f$i%02d", "0" * 40, "txt", text, CorpusGen.sha256Hex(text))

  // stemming index: "merging"/"merges" index as "merg", "mergers" as "merger"
  private val fixture = Seq(
    mk(0, "merging the branches"),
    mk(1, "merges happen often and merges repeat"),
    mk(2, "vector vectors victory"),
    mk(3, "the merchant counts"))

  private lazy val (reader, analyzer) = {
    import spark.implicits._
    val d = SparkTestSession.tmpDir("graft-suggest-")
    val a = graft.analysis.Analyzer.englishStemming
    IndexBuilder.build(spark, spark.createDataset(fixture), d, numPartitions = 2,
      analyzerFor = _ => a)
    (new IndexReader(spark, d), a)
  }

  test("analyzed completion: input analyzed with index parity (stem + stop)") {
    // "The Merging" analyzes to ["merg"] (stop 'the', lowercase, Porter) —
    // raw-prefix completion over "merging" would find nothing in the
    // stemmed dictionary; analyzed completion does
    val rows = Suggest.completeAnalyzed(reader, analyzer, "The Merging", 5)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq.contains("merg"))
    // and the raw dictionary really is stemmed
    assert(reader.termDict.where(col("term") === "merging").count() === 0)
  }

  test("fuzzy completion: typo'd prefix still completes, distance-then-df ranking") {
    // 'nerg' (typo of 'merg') within 1 edit of prefixes of merg/merchant…
    val rows = Suggest.completeFuzzy(reader, "nerg", 1, 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val terms = rows.map(_._1).toSeq
    assert(terms.contains("merg"))
    // "merchant": best prefix "merc"/"mer" is 2 edits from "nerg" — excluded
    assert(!terms.contains("merchant"))
    assert(rows.forall(_._3 <= 1))
    assert(rows.sortBy(r => (r._3, -r._2, r._1)).toSeq === rows.toSeq)
  }

  test("infix completion: mid-word input, df ranking; indexed == scan") {
    // 'erg' matches merg/merger… mid-word (AnalyzingInfixSuggester shape)
    val scan = Suggest.completeInfix(reader, "erg", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(scan.map(_._1).contains("merg"))
    assert(scan === scan.sortBy { case (t, df) => (-df, t) })
    // the suffix-sidecar (scale) path returns the identical page
    val indexed = Suggest.completeInfixIndexed(Suggest.suffixTable(reader), "erg", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(indexed === scan)
    // a term containing the fragment twice still appears once
    val vv = Suggest.completeInfixIndexed(Suggest.suffixTable(reader), "c", 10)
      .collect().map(_.getString(0)).toSeq
    assert(vv.distinct === vv)
    // suffix table is exactly Σ|term| rows (suffix-array size)
    val nSuffix = Suggest.suffixTable(reader).count()
    val sumLen = reader.termDict.agg(sum(length(col("term")))).head().getLong(0)
    assert(nSuffix === sumLen)
  }

  test("grouping collectors: allGroups / count / groupFacets") {
    import spark.implicits._
    val hits = Seq((1L, "en", "s1"), (2L, "en", "s2"), (3L, "fr", "s1"),
      (4L, "en", "s1")).toDF("doc_id", "lang", "source")
    assert(Grouping.allGroups(hits, "lang").as[String].collect().toSet === Set("en", "fr"))
    assert(Grouping.allGroupsCount(hits, "lang").head().getLong(0) === 2L)
    val gf = Grouping.groupFacets(hits, "lang", "source")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(gf === Map(("en", "s1") -> 2L, ("en", "s2") -> 1L, ("fr", "s1") -> 1L))
  }

  test("blended infix: position-reciprocal coefficient reorders equal-df terms") {
    val rows = Suggest.completeBlended(reader, "e", 10)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    // merg df=2 e@2 → 1.0; merchant/repeat/vector df=1 e@2 → 0.5;
    // often e@4 → 0.25; happen e@5 → 0.2 — same-df terms ranked by how
    // early the fragment appears, which raw-df infix ranking can't do
    assert(rows.take(6).toSeq === Seq(("merg", 1.0), ("merchant", 0.5),
      ("repeat", 0.5), ("vector", 0.5), ("often", 0.25), ("happen", 0.2)))
  }

  test("free-text: bigram probability with stupid-backoff to unigrams") {
    import spark.implicits._
    val tokens = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "d")),
      (3L, Seq("x", "b"))).toDF("doc_id", "terms")
    val rows = Suggest.freeText(tokens, "a", 10)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // bigram (a,b) twice out of c1=2 → P(b|a)=1.0; everything else backs
    // off to 0.4 × unigram: a 0.4·2/8=0.1, b?—has the bigram, c/d/x 0.05
    assert(rows.head === ("b", 1.0))
    assert(rows(1) === ("a", 0.1))
    assert(rows.drop(2).toSeq === Seq(("c", 0.05), ("d", 0.05), ("x", 0.05)))
    // no cross-document bigram: doc1 ends "c", doc2 starts "a" — if the
    // stream were global, (c,a) would exist; "c" as context must back off
    val cCtx = Suggest.freeText(tokens, "c", 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    // pure backoff scores: 0.4 × cw/8 — b(3)=0.15 top, not 1.0
    assert(cCtx.head === ("b", 0.15))
    assert(cCtx.forall(_._2 < 0.2), s"c has no continuations: ${cCtx.toSeq}")
  }

  test("fuzzy completion == unbanded full-scan result") {
    val banded = Suggest.completeFuzzy(reader, "nerg", 1, 100)
      .collect().map(r => (r.getString(0), r.getInt(2))).toSeq
    val l = 4
    val dist = (math.max(1, l - 1) to (l + 1))
      .map(n => levenshtein(substring(col("term"), 1, n), lit("nerg")))
      .reduce(least(_, _))
    val full = reader.termDict
      .select(col("term"), col("df"), dist.as("dist"))
      .where(col("dist") <= 1)
      .orderBy(col("dist"), col("df").desc, col("term")).limit(100)
      .collect().map(r => (r.getString(0), r.getInt(2))).toSeq
    assert(banded === full)
  }

  test("suggestWordBreaks: all parts must be dictionary terms; ranked by max freq") {
    val spark2 = spark
    import spark2.implicits._
    val dict = Seq(("merge", 40L), ("table", 30L), ("mergetable", 0L),
      ("mer", 5L), ("getable", 7L), ("a", 2L), ("b", 3L)).toDF("term", "df")
    val got = Suggest.suggestWordBreaks(dict.where(col("df") > 0), "mergetable")
      .as[(String, Int, Long)].collect().toSeq
    // splits: merge|table (max 40), mer|getable (max 7)
    assert(got == Seq(("merge table", 1, 40L), ("mer getable", 1, 7L)))
    // maxChanges = 2: three-part splits join the pool with num_breaks 2
    val dict3 = Seq(("ab", 9L), ("cd", 8L), ("abcd", 1L), ("a", 5L), ("b", 4L),
      ("bcd", 3L)).toDF("term", "df")
    val multi = Suggest.suggestWordBreaks(dict3, "abcd", maxChanges = 2,
      minBreakWordLength = 1, maxSuggestions = 10)
      .as[(String, Int, Long)].collect().toSeq
    assert(multi.head == ("ab cd", 1, 9L)) // fewest breaks first
    assert(multi.contains(("a b cd", 2, 8L))) // then the 2-break composition
    // minFreq prunes: requiring df >= 10 kills every split of abcd
    assert(Suggest.suggestWordBreaks(dict3, "abcd", minFreq = 10L).count() == 0)
  }

  test("suggestWordCombinations: adjacent runs joined against the dictionary") {
    val spark2 = spark
    import spark2.implicits._
    val dict = Seq(("merge", 40L), ("getable", 7L)).toDF("term", "df")
    val got = Suggest.suggestWordCombinations(dict, Seq("mer", "ge", "table"))
      .as[(Int, Int, String, Long)].collect().toSeq
    assert(got == Seq((0, 1, "merge", 40L), (1, 2, "getable", 7L)))
    // maxCombineWordLength bounds the run
    val short = Suggest.suggestWordCombinations(dict, Seq("mer", "ge", "table"),
      maxCombineWordLength = 5)
      .as[(Int, Int, String, Long)].collect().toSeq
    assert(short == Seq((0, 1, "merge", 40L)))
  }

  test("suggestWordCombinations ranks FEWER combinations first, freq second") {
    val spark2 = spark
    import spark2.implicits._
    // CombinationsThenFreqComparer (WordBreakSpellChecker.cs:482-502):
    // a 1-change combine beats a 2-change combine regardless of freq
    val dict = Seq(("luce", 10L), ("lucene", 500L)).toDF("term", "df")
    val got = Suggest.suggestWordCombinations(dict, Seq("lu", "ce", "ne"),
      maxChanges = 2).as[(Int, Int, String, Long)].collect().toSeq
    assert(got == Seq((0, 1, "luce", 10L), (0, 2, "lucene", 500L)))
    val top1 = Suggest.suggestWordCombinations(dict, Seq("lu", "ce", "ne"),
      maxChanges = 2, maxSuggestions = 1)
      .as[(Int, Int, String, Long)].collect().toSeq
    assert(top1 == Seq((0, 1, "luce", 10L)))
  }
}
