package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** An analyzed token: filtered term + position (for phrase queries) +
  * offsets. `position` already reflects stop-word gaps (removed stopwords
  * still advance positions — reference behavior:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Util/
  * FilteringTokenFilter.cs:37-60). */
final case class Token(term: String, position: Int, startOff: Int, endOff: Int,
                       payload: Array[Byte] = null)

/** Per-document field-invert state, mirroring what the reference's
  * DocInverterPerField accumulates for norms (reference:
  * /root/reference/src/Lucene.Net/Index/DocInverterPerField.cs:139-199):
  * `length` = tokens emitted post-filters, `numOverlap` = tokens with
  * position increment 0 (none here — no synonym filters). BM25 doc length
  * = length - numOverlap (BM25Similarity.cs:163-167). */
final case class AnalyzedDoc(tokens: Array[Token], length: Int, numOverlap: Int) {
  def bm25DocLen: Int = length - numOverlap
}

/** StandardAnalyzer-equivalent chain: UAX#29 tokenize → length filter
  * (tokens >255 chars dropped, position still advances — reference:
  * StandardTokenizer.cs:234-239, StandardAnalyzer.cs:51) → per-codepoint
  * lowercase (LowerCaseFilter.cs:54 — NOT String.toLowerCase, which applies
  * locale/1:N mappings) → stop filter preserving position increments.
  *
  * `stopWords` may vary per language (north-star "per-lang stop filtering");
  * the default is the classic 33-word English list
  * (reference: Analysis/Core/StopAnalyzer.cs:48-51).
  */
final class Analyzer(val stopWords: Set[String], val maxTokenLength: Int = 255,
    val tokenizer: String => Array[RawToken] = UAX29Tokenizer.tokenize,
    val stemmer: Option[String => String] = None,
    val synonyms: Map[String, Seq[String]] = Map.empty,
    val fold: Boolean = false,
    val elisionArticles: Set[String] = Set.empty,
    val lowerCaser: String => String = Analyzer.LowerCaseFn)
    extends Serializable {

  def analyze(text: String): AnalyzedDoc = {
    val raw = tokenizer(text)
    val out = new ArrayBuffer[Token](raw.length)
    var pos = -1
    var length = 0
    var numOverlap = 0
    var idx = 0
    while (idx < raw.length) {
      val t = raw(idx)
      pos += 1 // every raw token advances the position, even if dropped below
      if (t.term.length <= maxTokenLength) {
        // fold AFTER lowercase (reference ICUFoldingFilter chain order);
        // the stop check then sees folded terms, so a folding chain's
        // stop list must itself be folded (foldingForLang does this)
        val lowered0 = lowerCaser(t.term)
        val lowered1 = if (fold) Folding.fold(lowered0) else lowered0
        // elision BEFORE the stop filter (reference chain: Standard →
        // Elision → LowerCase → Stop — l'homme must stop-check as homme)
        val lowered =
          if (elisionArticles.isEmpty) lowered1
          else Analyzer.elide(lowered1, elisionArticles)
        if (!stopWords.contains(lowered)) {
          // stem AFTER the stop filter (reference EnglishAnalyzer chain:
          // ...LowerCase → Stop → PorterStemFilter)
          val emitted = stemmer.fold(lowered)(f => f(lowered))
          out += Token(emitted, pos, t.startOff, t.endOff, t.payload)
          length += 1
          // synonym injection at the SAME position (posIncr == 0): the
          // injected tokens count in Length AND NumOverlap, so the BM25
          // doc length (Length - NumOverlap) stays the base token count —
          // the reference's DocInverterPerField norm accounting
          // (DocInverterPerField.cs:139-199, SURVEY §2.1)
          synonyms.get(emitted) match {
            case Some(alts) => alts.foreach { a =>
              out += Token(a, pos, t.startOff, t.endOff)
              length += 1
              numOverlap += 1
            }
            case None =>
          }
        }
      }
      idx += 1
    }
    AnalyzedDoc(out.toArray, length, numOverlap)
  }

  /** Analyze query text exactly like index text (index/query token parity —
    * reference: Util/QueryBuilder.cs:73-105). */
  def analyzeTerms(text: String): Array[String] = analyze(text).tokens.map(_.term)
}

object Analyzer {
  /** [[lowerCase]] as a serializable default for the Analyzer param
    * (declared first: object vals initialize in order and every Analyzer
    * constructed below captures it as the default). */
  val LowerCaseFn: String => String = new (String => String) with Serializable {
    def apply(s: String): String = lowerCase(s)
  }

  /** The classic English stop set (reference: StopAnalyzer.cs:48-51). */
  val EnglishStopWords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  /** Default analyzer = StandardAnalyzer(Version.LUCENE_48) equivalent. */
  val standard: Analyzer = new Analyzer(EnglishStopWords)

  /** No stopwords (StandardAnalyzer(CharArraySet.EMPTY_SET) equivalent). */
  val noStop: Analyzer = new Analyzer(Set.empty)

  /** Opt-in English stemming analyzer (reference EnglishAnalyzer shape:
    * tokenize → lowercase → stop → PorterStemFilter) — recall-oriented
    * variant; the default index stays unstemmed for exact-term parity. */
  val englishStemming: Analyzer = new Analyzer(EnglishStopWords, 255,
    UAX29Tokenizer.tokenize, Some(PorterStemmer.stem))

  /** Per-language stop lists (the north star's "per-lang stop
    * filtering"): natural-language docs get their language's function
    * words (compact public Snowball-style subsets); source-code languages
    * and unknown tags fall back to English (comments/identifiers are
    * English-dominant). */
  // Pure Snowball accented forms only — unaccented informal text is the
  // folding chain's job ([[foldingForLang]] folds both the tokens and the
  // stop entries), not an ASCII-duplicate hack in the lists.
  val SpanishStopWords: Set[String] = Set(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque", "está", "es")
  val FrenchStopWords: Set[String] = Set(
    "de", "la", "le", "et", "les", "des", "en", "un", "du", "une", "que",
    "est", "pour", "qui", "dans", "a", "par", "plus", "pas", "au", "sur",
    "ne", "se", "ce", "il", "sont", "ces", "mais", "comme", "ou")
  val GermanStopWords: Set[String] = Set(
    "der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich",
    "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als",
    "auch", "es", "an", "werden", "aus", "er", "hat", "dass", "sie", "nach")
  val RussianStopWords: Set[String] = Set(
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как", "а",
    "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у", "же",
    "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот", "от")
  val PortugueseStopWords: Set[String] = Set(
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "é",
    "com", "não", "uma", "os", "no", "se", "na", "por", "mais", "as",
    "dos", "como", "mas", "foi", "ao", "ele", "das", "tem", "à", "seu")
  val ItalianStopWords: Set[String] = Set(
    "di", "a", "da", "in", "con", "su", "per", "tra", "fra", "il", "lo",
    "la", "i", "gli", "le", "un", "uno", "una", "e", "che", "è", "non",
    "si", "del", "della", "dei", "delle", "al", "alla", "nel", "come", "più")
  val DutchStopWords: Set[String] = Set(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als", "voor",
    "had", "er", "maar", "om", "hem", "dan", "zou", "of", "wat", "mijn")
  val DanishStopWords: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som", "på",
    "de", "med", "han", "af", "for", "ikke", "der", "var", "mig", "sig",
    "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun", "nu",
    "over", "da", "fra", "du", "ud", "sin", "dem", "os", "op", "man")
  val NorwegianStopWords: Set[String] = Set(
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er", "som",
    "på", "de", "med", "han", "av", "ikke", "der", "så", "var", "meg",
    "seg", "men", "har", "om", "vi", "min", "hadde", "hun", "nå", "over",
    "da", "ved", "fra", "du", "ut", "sin", "dem", "oss", "opp", "man")
  val SwedishStopWords: Set[String] = Set(
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
    "den", "med", "var", "sig", "för", "så", "till", "är", "men", "ett",
    "om", "hade", "de", "av", "icke", "mig", "du", "henne", "då", "sin",
    "nu", "har", "inte", "hans", "honom", "skulle", "där", "min", "man")
  val RomanianStopWords: Set[String] = Set(
    "şi", "în", "a", "fi", "de", "la", "cu", "pe", "un", "o", "că", "nu",
    "este", "mai", "pentru", "ce", "se", "sau", "din", "care", "dar",
    "au", "fost", "sunt", "ca", "îi", "lui", "său", "dacă", "el", "ea",
    "le", "al", "ale", "către", "după", "până", "fără", "când")
  val FinnishStopWords: Set[String] = Set(
    "ja", "on", "ei", "se", "että", "oli", "hän", "mutta", "ovat",
    "niin", "kun", "myös", "joka", "kuin", "sen", "sitä", "tai", "ole",
    "jo", "vain", "mitä", "nyt", "siitä", "voi", "olla", "hänen",
    "kanssa", "sitten", "tämä", "minä", "me", "he", "ne", "jos")
  val HungarianStopWords: Set[String] = Set(
    "a", "az", "és", "hogy", "nem", "is", "egy", "de", "már", "csak",
    "volt", "ha", "meg", "mint", "el", "még", "ki", "vagy", "azt", "ez",
    "én", "fel", "azért", "mert", "majd", "be", "úgy", "után", "most",
    "akkor", "ott", "van", "lesz", "itt")
  val TurkishStopWords: Set[String] = Set(
    "ve", "bir", "bu", "da", "de", "için", "ile", "mi", "ama", "o",
    "çok", "daha", "en", "gibi", "her", "ki", "kadar", "ne", "sonra",
    "ben", "sen", "biz", "siz", "onlar", "var", "yok", "olarak", "olan",
    "ancak", "şu", "hem", "ya", "veya", "diye")
  // Compact subsets of each language's standard public stop list (same
  // provenance as the reference's per-language stopwords.txt files).
  val ArabicStopWords: Set[String] = ("من ومن منها منه في وفي فيها فيه و ف ثم او " +
    "أو ب بها به ا أ اى اي أي أى لا ولا الا ألا إلا لكن ما وما كما فما عن مع")
    .split(" ").toSet
  val PersianStopWords: Set[String] = ("انان نداشته سراسر خياه ايشان وي تاكنون " +
    "بيشتري دوم پس ناشي وگو يا داشتند سپس هنگام هرگز پنج نشان امسال ديگر گروهي " +
    "شدند چطور ده و دو نخستين ولي چرا چه وسط ه كدام").split(" ").toSet
  val HindiStopWords: Set[String] = ("अंदर अत अपना अपनी अपने अभी आदि आप इत्यादि इन " +
    "इनका इन्हीं इन्हें इन्हों इस इसका इसकी इसके इसमें इसी इसे उन उनका उनकी उनके उनको उन्हीं " +
    "उन्हें उन्हों उस उसके उसी उसे एक").split(" ").toSet
  val BulgarianStopWords: Set[String] = ("а аз ако ала бе без беше би бил била " +
    "били било близо бъдат бъде бяха в вас ваш ваша вероятно вече взема ви вие " +
    "винаги все всеки всички всичко всяка във въпреки върху").split(" ").toSet
  val CzechStopWords: Set[String] = ("a s k o i u v z dnes cz tímto budeš budem " +
    "byli jseš můj svým ta tomto tohle tuto tyto jej zda proč máte tato kam " +
    "tohoto kdo kteří mi nám tom").split(" ").toSet
  val IndonesianStopWords: Set[String] = ("ada adanya adalah adapun agak agaknya " +
    "agar akan akankah akhirnya aku akulah amat amatlah anda andalah antar " +
    "diantaranya antara antaranya diantara apa apaan mengapa apabila apakah " +
    "apalagi apatah atau ataukah ataupun bagai bagaikan sebagai").split(" ").toSet
  val LatvianStopWords: Set[String] = ("aiz ap ar apakš ārpus augšpus bez caur " +
    "dēļ gar iekš iz kopš labad lejpus līdz no otrpus pa par pār pēc pie pirms " +
    "pret priekš starp šaipus uz viņpus virs virspus zem apakšpus").split(" ").toSet
  val GreekStopWords: Set[String] = ("ο η το οι τα του τησ των τον την και κι κ " +
    "ειμαι εισαι ειναι ειμαστε ειστε στο στον στη στην μα αλλα απο για προσ με " +
    "σε ωσ παρα αντι κατα μετα").split(" ").toSet
  val IrishStopWords: Set[String] = ("a ach ag agus an aon ar arna as ba beirt " +
    "chomh chuig chun cois cúig dar de deich den do don dtí dá dár faoi gach " +
    "go i le mar na nach ní ó roimh trí um ár é í").split(" ").toSet
  val CatalanStopWords: Set[String] = ("a abans ací ah així això al als " +
    "aleshores algun alguna algunes alguns alhora allà allí allò altra altre " +
    "altres amb ambdues ambdós apa aquell aquella aquelles aquells aquest " +
    "aquesta aquestes aquests aquí").split(" ").toSet
  val BasqueStopWords: Set[String] = ("al anitz arabera asko baina bat batean " +
    "batek bati batzuei batzuek batzuetan batzuk bera beraiek berau berauek " +
    "bere berori beroriek beste bezala da dago dira ditu du dute edo egin ere " +
    "eta eurak ez gainera gu gutxi guzti").split(" ").toSet
  val ArmenianStopWords: Set[String] = ("այդ այլ այն այս դու դուք եմ են ենք ես " +
    "եք է էի էին էինք էիր էիք էր ըստ թ ի ին իսկ իր կամ համար հետ հետո մենք մեջ " +
    "մի ն նա նաև նրա նրանք որ").split(" ").toSet

  /** Elision article sets (reference: Analysis/Util/ElisionFilter.cs and
    * the per-language DEFAULT_ARTICLES — FrenchAnalyzer.cs:92-96,
    * CatalanAnalyzer.cs:49-51, IrishAnalyzer.cs:42-46,
    * ItalianAnalyzer.cs:51-56): `l'homme` indexes as `homme`. */
  val ElisionArticles: Map[String, Set[String]] = Map(
    "fr" -> Set("l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu",
      "quoiqu", "lorsqu", "puisqu"),
    "ca" -> Set("d", "l", "m", "n", "s", "t"),
    "ga" -> Set("d", "m", "b"),
    "it" -> Set("c", "l", "all", "dall", "dell", "nell", "sull", "coll",
      "pell", "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t",
      "s", "v", "d"))

  /** ElisionFilter.cs semantics: if the token has an apostrophe and the
    * text before the FIRST apostrophe is a listed article, emit the text
    * after it (offsets untouched, like the reference). Both the ASCII
    * apostrophe and U+2019 count. */
  def elide(term: String, articles: Set[String]): String = {
    var i = 0
    while (i < term.length) {
      val c = term.charAt(i)
      if (c == '\'' || c == '’') {
        return if (articles.contains(term.substring(0, i))) term.substring(i + 1)
               else term
      }
      i += 1
    }
    term
  }
  val perLang: Map[String, Set[String]] = Map(
    "es" -> SpanishStopWords,
    "fr" -> FrenchStopWords,
    "de" -> GermanStopWords,
    "ru" -> RussianStopWords,
    "pt" -> PortugueseStopWords,
    "it" -> ItalianStopWords,
    "nl" -> DutchStopWords,
    "da" -> DanishStopWords,
    "no" -> NorwegianStopWords,
    "sv" -> SwedishStopWords,
    "ro" -> RomanianStopWords,
    "fi" -> FinnishStopWords,
    "hu" -> HungarianStopWords,
    "tr" -> TurkishStopWords,
    "ar" -> ArabicStopWords,
    "fa" -> PersianStopWords,
    "hi" -> HindiStopWords,
    "bg" -> BulgarianStopWords,
    "cs" -> CzechStopWords,
    "id" -> IndonesianStopWords,
    "lv" -> LatvianStopWords,
    "el" -> GreekStopWords,
    "ga" -> IrishStopWords,
    "ca" -> CatalanStopWords,
    "eu" -> BasqueStopWords,
    "hy" -> ArmenianStopWords,
  ).withDefaultValue(EnglishStopWords)

  /** Source-code chain (the WordDelimiterFilter analog for the code
    * corpus): identifiers split into sub-words (camelCase, UPPER-runs,
    * snake_case, digits) WITH the original kept, so both
    * `parseHTTPResponse` and `response` find the same doc; no stopwords
    * (code identifiers are never function words). */
  val sourceCode: Analyzer = new Analyzer(Set.empty, 255,
    WordDelimiter.tokenizer(UAX29Tokenizer.tokenize, preserveOriginal = true))

  /** CJK chain (reference CJKAnalyzer shape: tokenize → bigram → lowercase
    * → stop): overlapping Han bigrams as the indexing unit, Latin tokens
    * untouched — mixed-script docs analyze each script its own way. */
  val cjk: Analyzer = new Analyzer(EnglishStopWords, 255, CJKBigram.Tokenize)

  def forLang(lang: String): Analyzer = lang match {
    case "zh" | "ja" | "ko" => cjk
    case l => new Analyzer(perLang(l),
      elisionArticles = ElisionArticles.getOrElse(l, Set.empty),
      lowerCaser = LowerCasers.getOrElse(l, LowerCaseFn))
  }

  /** Folding chain (reference ICUFoldingFilter placement: tokenize →
    * lowercase → fold → stop): tokens AND stop entries are folded, so
    * "más"/"mas", "für"/"fur" all hit the same stop entry and accented
    * and unaccented spellings of a content word index to one term. */
  def foldingForLang(lang: String): Analyzer = lang match {
    case "zh" | "ja" | "ko" => cjk // CJK bigrams carry no diacritics
    case l => new Analyzer(perLang(l).map(Folding.fold), 255,
      UAX29Tokenizer.tokenize, None, Map.empty, fold = true)
  }

  /** Stemming per-language chain (reference per-language analyzer shape:
    * tokenize → lowercase → stop → stemmer): Porter for English,
    * Savoy-style light stemmers for fr/es/de ([[LightStemmers]]),
    * published Snowball algorithms for ru/pt/it/nl ([[SnowballRussian]],
    * [[SnowballPortuguese]], [[SnowballItalian]], [[SnowballDutch]]);
    * languages without a stemmer fall back to the stop-only chain.
    * Opt-in, like [[englishStemming]] — the default index stays
    * unstemmed for exact-term parity. */
  def stemmingForLang(lang: String): Analyzer =
    new Analyzer(perLang(lang), 255, UAX29Tokenizer.tokenize,
      LightStemmers.byLang.get(lang),
      elisionArticles = ElisionArticles.getOrElse(lang, Set.empty),
      lowerCaser = LowerCasers.getOrElse(lang, LowerCaseFn))

  /** Reference-DEFAULT per-language stemming chain: the stemmer each
    * reference `<Lang>Analyzer` actually wires at 4.8 — the UniNE light
    * stemmers for fr/es/it/pt, GermanNormalization→GermanLight for de
    * ([[LightStemmers3]], reference-parity restatements), Porter for en,
    * Snowball elsewhere ([[LightStemmers.byLang]] fallback). Use this
    * chain when index terms must match a reference index bit-for-bit;
    * [[stemmingForLang]] keeps the engine's documented independent trio. */
  def referenceStemmingForLang(lang: String): Analyzer = {
    val refStem: Option[String => String] = lang match {
      case "fr" => Some(LightStemmers3.frenchLight)
      case "es" => Some(LightStemmers3.spanishLight)
      case "it" => Some(LightStemmers3.italianLight)
      case "pt" => Some(LightStemmers3.portugueseLight)
      case "de" => Some((w: String) =>
        LightStemmers3.germanLight(Normalizers.germanNormalization(w)))
      case l => LightStemmers.byLang.get(l)
    }
    new Analyzer(perLang(lang), 255, UAX29Tokenizer.tokenize, refStem,
      elisionArticles = ElisionArticles.getOrElse(lang, Set.empty),
      lowerCaser = LowerCasers.getOrElse(lang, LowerCaseFn))
  }

  /** Full-Snowball per-language chain (reference SnowballFilter shape:
    * tokenize → lowercase → stop → SnowballStemmer) — opt-in where
    * [[stemmingForLang]]'s default is a light stemmer (es/de). */
  def snowballForLang(lang: String): Analyzer =
    new Analyzer(perLang(lang), 255, UAX29Tokenizer.tokenize,
      LightStemmers.snowball.get(lang),
      elisionArticles = ElisionArticles.getOrElse(lang, Set.empty),
      lowerCaser = LowerCasers.getOrElse(lang, LowerCaseFn))

  /** SQL-replicable tokenization: `[a-z0-9_]+` runs over the lowercased
    * text — exactly `regexp_extract_all(lower(text), '[a-z0-9_]+')` in
    * ANSI-ish SQL. Used for the driver's DuckDB-oracled queries, where the
    * oracle must reproduce token boundaries; the UAX#29 analyzer remains
    * the reference-parity default. */
  object RegexTokenizer extends (String => Array[RawToken]) with Serializable {
    private val pattern = java.util.regex.Pattern.compile("[a-z0-9_]+")
    def apply(text: String): Array[RawToken] = {
      val lowered = text.toLowerCase(java.util.Locale.ROOT)
      val m = pattern.matcher(lowered)
      val out = new scala.collection.mutable.ArrayBuffer[RawToken]()
      while (m.find()) out += RawToken(m.group(), m.start(), m.end(), "<ALPHANUM>")
      out.toArray
    }
  }

  /** Analyzer for DuckDB-oracled queries: regex tokens, no stopwords. */
  val sqlParity: Analyzer = new Analyzer(Set.empty, Int.MaxValue, RegexTokenizer)

  /** Per-language lowercasers that are NOT the generic per-codepoint map
    * (reference: Analysis/Tr/TurkishLowerCaseFilter.cs, the dotted/
    * dotless-i rules; Analysis/Ga/IrishLowerCaseFilter.cs is a stemmer-
    * slot normalizer instead, see LanguagePacks.IrishLowerCase). */
  val LowerCasers: Map[String, String => String] = Map(
    "tr" -> new (String => String) with Serializable {
      def apply(s: String): String = TurkishLowerCase(s)
    })

  /** Per-codepoint Character.toLowerCase — reference LowerCaseFilter.cs:54. */
  def lowerCase(s: String): String = {
    var i = 0
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    while (i < n) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }
}

/** PerFieldAnalyzerWrapper analog (reference:
  * Analysis/Miscellaneous/PerFieldAnalyzerWrapper.cs:51-74): route each
  * field to its own analyzer, falling back to `default`. The reference's
  * other Analyzer wrappers compose the same way: LimitTokenCountAnalyzer
  * = a wrapper applying TokenFilters.limitTokenCount, ShingleAnalyzerWrapper
  * = TokenFilters.shingle over the delegate's output. */
final case class PerFieldAnalyzer(default: Analyzer,
    overrides: Map[String, Analyzer] = Map.empty) extends Serializable {
  def forField(field: String): Analyzer = overrides.getOrElse(field, default)
  def analyze(field: String, text: String): AnalyzedDoc =
    forField(field).analyze(text)
}
