package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators a training-data pipeline runs over every
  * document: language-ID heuristic, quality scoring, token counting,
  * document fingerprinting. All pure Catalyst expressions (codegen'd,
  * shuffle-free per-doc map work) except the fingerprint dictionary,
  * which is term_dict-shaped (see Dedup parity note). */
object TextAnalysis {

  /** The classic English stopword list the engine's analyzer uses
    * (reference: Lucene.Net Analysis/Core/StopAnalyzer.cs:48-51). */
  val EnglishStops: Seq[String] = Seq("a", "an", "and", "are", "as", "at",
    "be", "but", "by", "for", "if", "in", "into", "is", "it", "no", "not",
    "of", "on", "or", "such", "that", "the", "their", "then", "there",
    "these", "they", "this", "to", "was", "will", "with")

  private def ts: Column = Dedup.tokensCol("text")

  /** Language-ID heuristic: function-word hit ratios per candidate
    * language over the token stream (the classic n-gram/function-word
    * profile method, dictionary kept tiny and broadcastable). Candidate
    * marker sets are fixed public fixtures. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "des"))

  /** Per-doc language scores + argmax prediction ("und" = undetermined
    * when no marker hits). Deterministic tie-break: higher ratio wins,
    * then lexicographic language code. */
  def langId(docs: DataFrame): DataFrame = {
    val n = size(ts).cast("double")
    val ratios = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val hits = size(filter(ts, t => t.isInCollection(markers))).cast("double")
      (lang, when(n > 0, hits / n).otherwise(lit(0.0)))
    }
    val scored = ratios.foldLeft(docs.select(col("doc_id"), col("lang"), col("text"))) {
      case (df, (lang, c)) => df.withColumn(s"r_$lang", round(c, 6))
    }
    val maxR = greatest(ratios.map { case (lang, _) => col(s"r_$lang") }: _*)
    // argmax; ties pick the lexicographically first language code
    val best = ratios.foldRight(lit(null).cast("string"): Column) {
      case ((lang, _), els) => when(col(s"r_$lang") === maxR, lit(lang)).otherwise(els)
    }
    scored
      .withColumn("predicted", when(maxR > 0, best).otherwise(lit("und")))
      .drop("text")
  }

  /** Quality-score features + composite score per doc:
    * token count, mean token length, stopword ratio, punctuation ratio,
    * digit ratio. Composite = heuristic in [0,1], monotone in
    * "natural-language-ness". All ratios double, rounded to 6. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val nTok = size(ts)
    val nChar = length(col("text")).cast("double")
    val meanTokLen = when(nTok > 0,
      aggregate(ts, lit(0.0), (acc, t) => acc + length(t).cast("double")) / nTok.cast("double"))
      .otherwise(lit(0.0))
    val stopHits = size(filter(ts, t => t.isInCollection(EnglishStops)))
    val stopRatio = when(nTok > 0, stopHits.cast("double") / nTok.cast("double")).otherwise(lit(0.0))
    val punct = size(expr("regexp_extract_all(text, '[.,;:!?]', 0)"))
    val punctRatio = when(nChar > 0, punct.cast("double") / nChar).otherwise(lit(0.0))
    val digits = size(expr("regexp_extract_all(text, '[0-9]', 0)"))
    val digitRatio = when(nChar > 0, digits.cast("double") / nChar).otherwise(lit(0.0))
    val score =
      when(nTok < 5, lit(0.0)).otherwise(
        lit(0.4) * least(stopRatio * 4, lit(1.0)) +
          lit(0.3) * when(meanTokLen >= 3 && meanTokLen <= 10, 1.0).otherwise(0.0) +
          lit(0.2) * (lit(1.0) - least(digitRatio * 10, lit(1.0))) +
          lit(0.1) * least(punctRatio * 20, lit(1.0)))
    docs.select(col("doc_id"), nTok.cast("long").as("n_tokens"),
      round(meanTokLen, 6).as("mean_tok_len"),
      round(stopRatio, 6).as("stop_ratio"),
      round(punctRatio, 6).as("punct_ratio"),
      round(digitRatio, 6).as("digit_ratio"),
      round(score, 6).as("quality"))
  }

  /** Token counting three ways per doc: whitespace-split, word-regex
    * (the analyzer's `[a-z0-9_]+`), and a BPE-ish sub-word regex
    * (letter-runs / digit-runs / single other symbol) — the pre-tokenizer
    * shape GPT-style BPE vocabularies use. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(expr("regexp_extract_all(text, '[^ \\t\\n\\r]+', 0)")).cast("long").as("ws_tokens"),
      size(ts).cast("long").as("word_tokens"),
      size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\r]', 0)"))
        .cast("long").as("bpeish_tokens"))

  /** Document fingerprint: position-weighted polynomial hash over the
    * token stream (rolling-hash family). Parity path: token ids from a
    * dense dictionary, contribution of the token at 1-based position p is
    * `p * ((tid*131 + 7) mod 1000003)`, summed as int64 (no overflow at
    * sane doc lengths). Docs sharing a fingerprint are ordered-content
    * duplicates under the tokenizer. */
  def fingerprints(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), posexplode(ts).as(Seq("p0", "t")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("t"))
    val dict = Dedup.denseIds(toks, "t", "tid")
    toks.join(dict, "t")
      .select(col("doc_id"), (col("p") * ((col("tid") * 131 + 7) % 1000003)).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("fingerprint"))
  }

  /** Production-path fingerprint: token contribution from xxhash64, no
    * dictionary at all — a single map + aggregate, the 10^12-doc shape
    * (rows-only in the driver gate: independent engines can't reproduce
    * xxhash64 seeds). */
  def fingerprintsProd(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(ts).as(Seq("p0", "t")))
      .select(col("doc_id"),
        ((col("p0") + 1).cast("long") * pmod(xxhash64(col("t")), lit(1000003L))).as("c"))
      .groupBy(col("doc_id")).agg(sum(col("c")).as("fingerprint"))

  // --------------------------------------------------- repetition signals

  /** Intra-document repetition signals (the Gopher/MassiveText quality
    * filters — Rae et al. 2021 §A1.1, public: documents dominated by
    * repeated lines / n-grams are boilerplate or spam and get dropped
    * before training):
    *   - dup_line_frac:  1 − distinct(lines)/lines
    *   - dup_token_frac: 1 − distinct(tokens)/tokens
    *   - top_bigram_frac: occurrences of the most frequent bigram /
    *     total bigrams
    * Line/token fractions are pure array expressions (codegen, no
    * shuffle); the bigram mode needs one map-side-combinable
    * groupBy(doc, bigram) — the only shuffle, keyed fine at 100 TB. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val nl = size(lines).cast("double")
    val dl = size(array_distinct(lines)).cast("double")
    val nt = size(ts).cast("double")
    val dt = size(array_distinct(ts)).cast("double")
    val base = docs.select(
      col("doc_id"),
      round(when(nl > 0, (nl - dl) / nl).otherwise(0.0), 6).as("dup_line_frac"),
      round(when(nt > 0, (nt - dt) / nt).otherwise(0.0), 6).as("dup_token_frac"),
      ts.as("tks"))
    val bi = base.select(col("doc_id"), posexplode(col("tks")).as(Seq("p", "t")))
    val pairs = bi.join(
        bi.select(col("doc_id"), (col("p") - 1).as("p"), col("t").as("t2")),
        Seq("doc_id", "p"))
      .groupBy(col("doc_id"), concat(col("t"), lit(" "), col("t2")).as("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(round(max(col("c")).cast("double") / sum(col("c")).cast("double"), 6)
        .as("top_bigram_frac"))
    base.drop("tks")
      .join(pairs, Seq("doc_id"), "left_outer")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  // ------------------------------------------------------- PII redaction

  /** PII scrub patterns — deliberately lookaround-free so the same
    * pattern text runs identically under Java regex (Spark codegen) and
    * RE2-class engines (the oracle). Order matters: emails first (they
    * contain dots and digits), then SSN-shaped ids, then IPv4. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** Redacted copy of a text column — every pattern family replaced by
    * its tag. Pure regexp_replace chain: codegen'd, shuffle-free, the
    * per-doc map shape a 100 TB scrub pass needs. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (p, tag)) => regexp_replace(c, p, tag) }

  /** Per-category PII counts BEFORE redaction (audit trail: how much was
    * scrubbed per doc). Counted in redaction order on the progressively
    * redacted text, so overlapping families never double-count. */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    var cur = text
    PiiPatterns.map { case (p, tag) =>
      val n = regexp_count(cur, lit(p))
      cur = regexp_replace(cur, p, tag)
      (tag.stripPrefix("<").stripSuffix(">").toLowerCase, n.cast("long"))
    }
  }

  /** doc_id, redacted text + per-category counts for a document table. */
  def redact(docs: DataFrame): DataFrame = {
    val counts = piiCounts(col("text"))
    docs.select(
      col("doc_id") +: (redactPii(col("text")).as("redacted") +:
        counts.map { case (name, c) => c.as(s"n_$name") }): _*)
  }

  /** Eval-set decontamination (the GPT-3 appendix-C / PaLM method: a
    * training doc is contaminated when it shares enough w-gram surface
    * with any benchmark document). For every corpus doc with at least one
    * collision: the number of its DISTINCT w-token shingles that occur
    * anywhere in the eval set, and the overlap fraction a pipeline would
    * threshold on.
    *
    * Shape at scale: the eval side is benchmark-sized (thousands of docs
    * against 10^12) — its distinct shingle set broadcast-joins; the corpus
    * side is one explode + one left-semi equi-join + one map-side-
    * combinable per-doc aggregation. Nothing global, nothing driver-side. */
  def contamination(corpus: DataFrame, eval: DataFrame, w: Int = 5): DataFrame = {
    val cs = Dedup.docShingles(corpus, w)
    val es = Dedup.docShingles(eval, w).select(col("s")).distinct()
    val hits = cs.join(es, Seq("s"), "left_semi")
      .groupBy(col("doc_id")).agg(count("*").as("n_hit"))
    cs.groupBy(col("doc_id")).agg(count("*").as("n_shingles"))
      .join(hits, Seq("doc_id"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_shingles").cast("double")).as("overlap"))
  }

  /** Bigram language-model cross-entropy scoring (the CCNet/KenLM-style
    * perplexity quality filter, re-expressed as pure Spark aggregations):
    * train an add-k smoothed bigram model ON the corpus itself — the
    * "model" is just two count tables, so training is two map-side-
    * combinable groupBys and the model stays a distributed table at any
    * corpus size (no driver materialization) — then score every doc by
    * the mean negative log-probability of its token transitions:
    *
    *   ce(doc) = −(1/n) · Σ_i ln (C(u_i,v_i) + k) / (C(u_i) + k·V)
    *
    * High cross-entropy = improbable transitions = gibberish/boilerplate;
    * low = repetitive/templated — both tails are what a pipeline prunes.
    * Shape at scale: one map-only bigram expansion (transform over token
    * indices, NO posexplode self-join), counts via combinable groupBys,
    * scoring via two equi-joins on (u,v) and u, one per-doc agg. The
    * vocabulary size V is the only driver scalar. */
  def bigramCrossEntropy(docs: DataFrame, k: Double = 0.5): DataFrame = {
    val toks = docs.select(col("doc_id"), Dedup.tokensCol("text").as("ts"))
    val bigrams = toks
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> struct(ts[i] AS u, ts[i + 1] AS v))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.u").as("u"), col("bg.v").as("v"))
    val cuv = bigrams.groupBy(col("u"), col("v")).agg(count(lit(1)).as("cuv"))
    val cu = cuv.groupBy(col("u")).agg(sum(col("cuv")).as("cu"))
    val vocab = toks.select(explode(col("ts")).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    bigrams.join(cuv, Seq("u", "v")).join(cu, Seq("u"))
      .select(col("doc_id"),
        (-log((col("cuv") + lit(k)) / (col("cu") + lit(k) * lit(vocab.toDouble))))
          .as("nlp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("nlp")) / count(lit(1))).as("ce"))
  }

  // ------------------------------------------------------- HTML stripping

  /** HTML strip (reference: Analysis/CharFilter/HTMLStripCharFilter.cs —
    * there a 30k-line generated scanner that preserves original offsets
    * because the reference highlights over the raw markup; this engine
    * indexes post-strip, so the pipeline form is a codegen'd column op —
    * the web-corpus preprocessing shape, one map pass over the scan):
    * script/style blocks dropped whole, comments dropped, tags replaced
    * by a space (block boundaries must not glue words), the core named
    * entities decoded, whitespace collapsed and trimmed. Patterns are
    * lookaround-free with inline (?s)/(?i) flags only, so the identical
    * pattern text runs under Java regex (Spark codegen) and RE2-class
    * engines (the oracle). The reference's MappingCharFilter /
    * PatternReplaceCharFilter are this same regexp_replace shape by
    * construction (survey: native). */
  val HtmlStripSteps: Seq[(String, String)] = Seq(
    ("(?is)<script[^>]*>.*?</script>", " "),
    ("(?is)<style[^>]*>.*?</style>", " "),
    ("(?s)<!--.*?-->", " "),
    ("(?s)<[^>]*>", " "),
    // &amp; decodes LAST so "&amp;lt;" single-decodes to "&lt;" (the
    // reference's one-pass entity scan never re-reads its own output)
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
    ("&apos;", "'"), ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
    ("[ \\t\\r\\n]+", " "))

  def stripHtml(text: Column): Column =
    trim(HtmlStripSteps.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) })

  /** MediaWiki-markup strip for wiki-dump training corpora (the wiki
    * sibling of [[stripHtml]]; the reference's WikipediaTokenizer
    * recognizes the same constructs as typed tokens —
    * Analysis/Wikipedia/WikipediaTokenizer.cs — while a training
    * pipeline wants them REMOVED, so this is the strip formulation):
    * templates (innermost-first, three passes so nesting depth ≤ 3
    * resolves), tables, ref tags, piped/plain internal links keeping the
    * display text, labeled/bare external links, bold/italic quotes,
    * heading rails, list markers, leftover tags, whitespace collapse.
    * Lookaround-free and group-refs only in replacements, so the chain
    * runs identically under Java regex and RE2 (replacement syntax
    * translated $1→\\1 for DuckDB by the oracle builder). */
  val WikiStripSteps: Seq[(String, String)] = {
    val template = ("\\{\\{[^{}]*\\}\\}", " ")
    Seq(
      template, template, template, // nested templates, depth <= 3
      ("\\{\\|[\\s\\S]*?\\|\\}", " "),                    // tables
      ("<ref[^>/]*/>", " "),                               // empty refs
      ("<ref[^>]*>[\\s\\S]*?</ref>", " "),                 // citations
      ("\\[\\[[^\\[\\]|]*\\|([^\\[\\]]*)\\]\\]", "$1"),    // piped links
      ("\\[\\[([^\\[\\]]*)\\]\\]", "$1"),                  // plain links
      ("\\[https?://[^ \\]]+ ([^\\]]*)\\]", "$1"),         // labeled ext links
      ("\\[https?://[^\\]]*\\]", " "),                     // bare ext links
      ("'{2,5}", ""),                                       // bold/italic
      ("(?m)^=+ *([^=\\n]*?) *=+ *$", "$1"),               // headings
      ("(?m)^[*#:;]+ *", ""),                              // list markers
      ("<[^>]*>", " "),                                     // leftover tags
      ("[ \\t\\r\\n]+", " "))
  }

  def stripWiki(text: Column): Column =
    trim(WikiStripSteps.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) })

  // ------------------------------------------------ named filter rule packs

  /** Gopher document-quality rules (Rae et al. 2021, arXiv:2112.11446
    * Appendix A1.1 — the published thresholds, verbatim): word count in
    * [50, 100k], mean word length in [3, 10], symbol-to-word ratio
    * ≤ 0.1 for EACH of '#' and '…' individually (the paper removes on
    * "either the hash symbol or the ellipsis" exceeding 0.1), ≤ 90%
    * bullet-started lines (the paper removes on "more than 90% of lines
    * starting with a bullet point"), ≤ 30% ellipsis-ended lines, ≥ 80%
    * of words contain an alphabetic char, ≥ 2 of the 8 indicator stop
    * words. Every threshold is evaluated in INTEGER form (e.g.
    * hashes·10 ≤ words instead of a float ratio) so independent engines
    * agree bit-for-bit; words = whitespace split (the paper operates
    * pre-tokenizer). Map-only column expressions. */
  def gopherRules(docs: DataFrame, text: Column): DataFrame = {
    val words = filter(split(trim(text), "\\s+"), w => length(w) > 0)
    val nw = size(words).cast("long")
    val totChars = aggregate(words, lit(0L), (a, w) => a + length(w).cast("long"))
    val hashes = size(regexp_extract_all(text, lit("#"), lit(0))).cast("long")
    val ellipses = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0))).cast("long")
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("long")
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long")
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = size(filter(words, w => lower(w).isInCollection(stops))).cast("long")
    val rWordCount = nw >= 50L && nw <= 100000L
    val rMeanLen = totChars >= nw * 3L && totChars <= nw * 10L
    val rSymbol = hashes * 10L <= nw && ellipses * 10L <= nw
    val rBullet = bulletLines * 10L <= nLines * 9L
    val rEllipsis = ellipsisLines * 10L <= nLines * 3L
    val rAlpha = alphaWords * 10L >= nw * 8L
    val rStops = stopHits >= 2L
    docs.select(col("doc_id"), nw.as("n_words"),
      rWordCount.as("r_word_count"), rMeanLen.as("r_mean_len"),
      rSymbol.as("r_symbol"), rBullet.as("r_bullet"),
      rEllipsis.as("r_ellipsis"), rAlpha.as("r_alpha"), rStops.as("r_stops"),
      (rWordCount && rMeanLen && rSymbol && rBullet && rEllipsis && rAlpha
        && rStops).as("keep"))
  }

  /** C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2 —
    * minus the blocklist): retain only lines ending in terminal
    * punctuation (. ! ? ") with ≥ 3 words and no "javascript"; drop
    * pages with < 5 sentences, any "lorem ipsum", or a curly bracket.
    * Sentence count = terminal-mark count (the standard restatement).
    * Integer comparisons only; map-only column expressions. */
  def c4Rules(docs: DataFrame, text: Column): DataFrame = {
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val kept = filter(lines, l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(filter(split(trim(l), "\\s+"), w => length(w) > 0)) >= 3 &&
        !lower(l).contains("javascript"))
    val nSent = size(regexp_extract_all(text, lit("[.!?]"), lit(0))).cast("long")
    val hasLorem = lower(text).contains("lorem ipsum")
    val hasCurly = text.contains("{")
    docs.select(col("doc_id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      nSent.as("n_sentences"), hasLorem.as("has_lorem"), hasCurly.as("has_curly"),
      (nSent >= 5L && !hasLorem && !hasCurly && size(kept) > 0).as("keep"))
  }

  // --------------------------------------------------- URL canonicalization

  /** Canonical URL normalization — the web-pipeline dedup key (crawl
    * frontiers and post-crawl dedup both key on it; the rule set is the
    * common core of the public crawler canonicalizers, e.g. Nutch/
    * StormCrawler's basic normalizers): drop the fragment, lowercase
    * scheme+authority, strip default ports (:80 http, :443 https),
    * collapse duplicate path slashes, drop one trailing path slash
    * (root stays "/"), remove tracking params (utm_*, fbclid, gclid,
    * ref) and SORT the surviving query params so param order never
    * splits a dup group. Pure column expressions end to end — map-only
    * at any corpus size, and the same structural steps are plain SQL in
    * an independent engine (the q_url_canon oracle re-derives them). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val preRaw = regexp_extract(noFrag, "^([^/?]*://[^/?#]*)", 1)
    val pre = lower(preRaw)
    val rest = noFrag.substr(length(preRaw) + 1, length(noFrag))
    val preNoPort = when(pre.startsWith("http://") && pre.endsWith(":80"),
        pre.substr(lit(1), length(pre) - 3))
      .when(pre.startsWith("https://") && pre.endsWith(":443"),
        pre.substr(lit(1), length(pre) - 4))
      .otherwise(pre)
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val query0 = when(length(rest) > length(path0),
      rest.substr(length(path0) + 2, length(rest))).otherwise(lit(""))
    val path1 = regexp_replace(path0, "/{2,}", "/")
    val path2 = when(length(path1) === 0, lit("/"))
      .when(length(path1) > 1 && path1.endsWith("/"),
        path1.substr(lit(1), length(path1) - 1))
      .otherwise(path1)
    val kept = array_sort(filter(split(query0, "&"),
      x => x =!= "" && !x.rlike("^(utm_|fbclid=|gclid=|ref=)")))
    val qs = concat_ws("&", kept)
    concat(preNoPort, path2,
      when(length(qs) > 0, concat(lit("?"), qs)).otherwise(lit("")))
  }

  // --------------------------------------------------- keyword extraction

  /** TF-IDF keyword extraction: the top-k most characteristic terms per
    * document — tf(t,d) · ln(N / df(t)), the classic unsupervised
    * keyword/tag extractor a corpus-labelling pipeline runs over every
    * doc (and the per-doc view of the engine's own idf statistics;
    * reference formula family: Search/Similarities/TFIDFSimilarity.cs).
    *
    * Shape at scale: tf is one map-side-combinable groupBy(doc, term);
    * df folds FROM the tf table (second combinable groupBy, no second
    * scan); N is the one driver scalar; ranking is a window partitioned
    * by doc_id — each partition is one document's term list, so the
    * window never sees more rows than a doc has distinct terms.
    * Deterministic: ties broken by score desc, then term asc. */
  def tfidfKeywords(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = docs.count().toDouble
    val tf = docs.select(col("doc_id"), explode(ts).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "t")
      .select(col("doc_id"), col("t"),
        round(col("tf") * log(lit(n) / col("df")), 6).as("tfidf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("t").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank").cast("long").as("rank"),
        col("t").as("term"), col("tfidf"))
  }

  // --------------------------------------------------- heavy hitters

  /** Corpus-level heavy-hitter bigrams: every bigram occurring at least
    * `minCount` times across the whole corpus (the hot-n-gram census a
    * pipeline uses for boilerplate phrase lists, tokenizer-merge
    * candidates, and contamination screens). Exact path: one map-only
    * bigram expansion (same transform as [[bigramCrossEntropy]] — no
    * posexplode self-join) + one map-side-combinable groupBy. At 100 TB
    * the long tail of singleton bigrams dominates that shuffle; the
    * count-min-sketch path ([[Sketches.cmsBuild]]) bounds the state to
    * width×depth cells and this exact pass then runs only over the
    * sketch-filtered candidates. */
  def heavyHitterBigrams(docs: DataFrame, minCount: Long): DataFrame =
    docs.select(Dedup.tokensCol("text").as("ts"))
      .where(size(col("ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ts) - 2), i -> concat(ts[i], ' ', ts[i + 1]))"))
        .as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  // --------------------------------------------------- boilerplate

  /** Per-source boilerplate segments (the CCNet/RefinedWeb line-dedup
    * family, generalized to token windows because web text keeps its
    * newlines but this corpus does not): the token stream is cut into
    * non-overlapping `segLen`-token segments; a segment is boilerplate
    * when it occurs in ≥ `minDocs` DISTINCT documents of the same source
    * (nav bars, footers, license headers — template text repeated across
    * a domain). Output per doc: segment count, boilerplate-segment count
    * and the fraction a pipeline would threshold on.
    *
    * Shape at scale: one map-only segment expansion, one distinct on
    * (source, segment, doc) — combinable groupBy in disguise — one
    * combinable groupBy(source, segment) for the doc counts, one
    * equi-join back on (source, segment), one per-doc combinable agg.
    * Keys are (source, segment): hot templated domains are exactly the
    * AQE-skew-join case, never a driver problem. */
  def boilerplateSegments(docs: DataFrame, segLen: Int = 8,
                          minDocs: Int = 2): DataFrame = {
    val segs = docs
      .select(col("doc_id"), col("source"), ts.as("tks"))
      .select(col("doc_id"), col("source"), explode(expr(
        s"""transform(sequence(0, greatest(cast(size(tks) / $segLen as int) - 1, 0)),
           |  i -> array_join(slice(tks, i * $segLen + 1, $segLen), ' '))""".stripMargin))
        .as("seg"))
      .where(length(col("seg")) > 0)
    val perDocSeg = segs.select(col("source"), col("seg"), col("doc_id")).distinct()
    val segDocs = perDocSeg.groupBy(col("source"), col("seg"))
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    segs.join(segDocs, Seq("source", "seg"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("n_docs") >= minDocs, 1L).otherwise(0L)).as("n_boiler"))
      .withColumn("boiler_frac",
        round(col("n_boiler").cast("double") / col("n_segments").cast("double"), 6))
  }

  // --------------------------------------------------- domain balancing

  /** Domain-balanced sampling: cap every source at `cap` documents in
    * expectation by thinning over-represented sources with a
    * deterministic content-stable residue (the DoReMi/Pile-style domain
    * reweighting, done without an RNG so the sample is reproducible and
    * reorder-stable). Keep rate r_s = min(1, cap / n_s); doc kept iff
    * (doc_id · 48271 + 11) mod 1048573 < r_s · 1048573 — the same
    * Lehmer-class residue trick as Packing.mixtureSample, multiplier
    * small enough that the product never overflows int64 at 10^12 ids.
    *
    * Shape at scale: per-source counts are one combinable groupBy over
    * source-cardinality keys; the rate table joins back on source (a
    * broadcast at web domain-cardinality); keep/drop is a codegen'd
    * filter. No window, no shuffle of the corpus itself. */
  def balancedSample(docs: DataFrame, cap: Long): DataFrame = {
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    val rates = counts.select(col("source"),
      least(lit(1.0), lit(cap.toDouble) / col("n_src").cast("double")).as("rate"))
    docs.join(broadcast(rates), "source")
      .where(pmod(col("doc_id") * 48271L + 11L, lit(1048573L)).cast("double")
        < col("rate") * 1048573.0)
      .select(col("doc_id"), col("source"))
  }
}
