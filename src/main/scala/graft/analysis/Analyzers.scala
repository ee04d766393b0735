package graft.analysis

/** The reference's NAMED analyzer compositions (reference:
  * Analysis/Core/{SimpleAnalyzer,WhitespaceAnalyzer,StopAnalyzer,
  * KeywordAnalyzer}.cs, Standard/UAX29URLEmailAnalyzer.cs,
  * Miscellaneous/PatternAnalyzer.cs, Snowball/SnowballAnalyzer.cs,
  * Miscellaneous/LimitTokenCountAnalyzer.cs,
  * Shingle/ShingleAnalyzerWrapper.cs) — each is a composition of
  * components that already exist in this package; this registry gives
  * them their reference names so a user can switch by name.
  *
  * Case behavior matches each reference chain: Whitespace and Keyword
  * do NOT lowercase (identity lowerCaser); Simple/Stop lowercase through
  * the standard per-codepoint map. */
object Analyzers {

  private val Identity: String => String = new (String => String) with Serializable {
    def apply(s: String): String = s
  }

  /** StandardAnalyzer(LUCENE_48). */
  def standard: Analyzer = Analyzer.standard

  /** ClassicAnalyzer — the pre-3.1 grammar. */
  def classic: Analyzer = ClassicTokenizer.analyzer

  /** SimpleAnalyzer: LowerCaseTokenizer ≡ letter runs + lowercase. */
  val simple: Analyzer = new Analyzer(Set.empty, 255, Tokenizers.letterTokenize)

  /** WhitespaceAnalyzer: whitespace split, case preserved. */
  val whitespace: Analyzer =
    new Analyzer(Set.empty, 255, Tokenizers.whitespaceTokenize,
      lowerCaser = Identity)

  /** StopAnalyzer: LowerCaseTokenizer + English stop set. */
  val stop: Analyzer =
    new Analyzer(Analyzer.EnglishStopWords, 255, Tokenizers.letterTokenize)

  /** KeywordAnalyzer: the whole input, verbatim. */
  val keyword: Analyzer =
    new Analyzer(Set.empty, Int.MaxValue, Tokenizers.keyword,
      lowerCaser = Identity)

  /** BrazilianAnalyzer (Analysis/Br/BrazilianAnalyzer.cs): standard
    * chain + Portuguese stop set + [[BrazilianStemmer]] (the hand-coded
    * Orengo-style default, not Snowball). */
  val brazilian: Analyzer =
    new Analyzer(Analyzer.PortugueseStopWords, 255, UAX29Tokenizer.tokenize,
      Some(BrazilianStemmer.stemToken))

  /** UAX29URLEmailAnalyzer: URL/email-aware word break + lowercase +
    * English stop. */
  val uax29UrlEmail: Analyzer =
    new Analyzer(Analyzer.EnglishStopWords, 255, Tokenizers.urlEmailTokenize)

  /** PatternAnalyzer: regex-driven tokenization (split mode; pass
    * group >= 0 for capture mode) + lowercase + optional stop. */
  def pattern(regex: String, group: Int = -1,
              stopWords: Set[String] = Analyzer.EnglishStopWords): Analyzer =
    new Analyzer(stopWords, 255, Tokenizers.patternTokenizer(regex, group))

  /** SnowballAnalyzer(name): standard chain + the named Snowball stemmer
    * ("english", "lovins", "kp", "german2", or a language code). */
  def snowball(name: String, stopWords: Set[String] = Set.empty): Analyzer = {
    val stem = LightStemmers.snowball.getOrElse(name.toLowerCase match {
      case "english" => "en"
      case "french" => "fr"
      case "german" => "de"
      case "spanish" => "es"
      case "russian" => "ru"
      case "portuguese" => "pt"
      case "italian" => "it"
      case "dutch" => "nl"
      case "danish" => "da"
      case "norwegian" => "no"
      case "swedish" => "sv"
      case "romanian" => "ro"
      case "finnish" => "fi"
      case "hungarian" => "hu"
      case "turkish" => "tr"
      case other => other
    }, throw new IllegalArgumentException(s"unknown snowball stemmer: $name"))
    new Analyzer(stopWords, 255, UAX29Tokenizer.tokenize, Some(stem))
  }

  /** LimitTokenCountAnalyzer / ShingleAnalyzerWrapper as post-analysis
    * transforms (the reference wraps the stream; the Array[Token] model
    * composes the same way after analyze()). */
  def limited(delegate: Analyzer, maxTokens: Int)(text: String): AnalyzedDoc = {
    val d = delegate.analyze(text)
    val kept = TokenFilters.limitTokenCount(d.tokens, maxTokens)
    AnalyzedDoc(kept, math.min(d.length, kept.length), d.numOverlap)
  }

  def shingled(delegate: Analyzer, minN: Int = 2, maxN: Int = 2,
               outputUnigrams: Boolean = true)(text: String): Array[Token] =
    TokenFilters.shingle(delegate.analyze(text).tokens, minN, maxN,
      outputUnigrams = outputUnigrams)
}
