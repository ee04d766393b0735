package graft.analysis

/** Light (minimal) stemmers for French, Spanish and German — suffix
  * strippers that remove plural/gender/case inflection only, the
  * published "light stemming" approach for morphology-rich European
  * languages (J. Savoy, "Light Stemming Approaches for the French,
  * Portuguese, German and Hungarian Languages", ACM SAC 2006; J. Savoy,
  * "A stemming procedure and stopword list for general French corpora",
  * JASIST 50(10), 1999 — the UniNE family the reference also ships as
  * its *LightStemmer variants, e.g.
  * Analysis/Fr/FrenchLightStemmer.cs, Es/SpanishLightStemmer.cs,
  * De/GermanLightStemmer.cs).
  *
  * These are INDEPENDENT restatements of the published approach — the
  * rule sets below are specified here, not ported; StemmerSpec's vectors
  * are derived from these stated rules. Light stemming trades recall for
  * safety: only high-frequency inflectional endings are stripped, never
  * derivational morphology, so distinct lemmas rarely collide.
  *
  * All stemmers expect lowercased input (they run after LowerCaseFilter
  * in the chain) and never shrink a word below 3 characters.
  */
object LightStemmers {

  private def undouble(s: String): String =
    if (s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2))
      s.substring(0, s.length - 1)
    else s

  /** French: plural in -x (chevaux → cheval), plural -s, mute final -e/-é,
    * final-consonant undoubling (belle → bel). */
  def french(word: String): String = {
    var w = word
    if (w.length > 5 && w.endsWith("aux")) w = w.substring(0, w.length - 3) + "al"
    else if (w.length > 4 && w.endsWith("x")) w = w.substring(0, w.length - 1)
    if (w.length > 3 && w.endsWith("s")) w = w.substring(0, w.length - 1)
    if (w.length > 3 && (w.endsWith("e") || w.endsWith("é")))
      w = w.substring(0, w.length - 1)
    if (w.length > 3) w = undouble(w)
    w
  }

  /** Spanish: accent-folded final vowels, plural -es/-os/-as, final
    * gender vowels -o/-a/-e; -ces → -z (luces → luz). */
  def spanish(word: String): String = {
    var w = word.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'
      case c => c
    }
    if (w.length > 4 && w.endsWith("ces")) w = w.substring(0, w.length - 3) + "z"
    else if (w.length > 4 && (w.endsWith("es") || w.endsWith("os") || w.endsWith("as")))
      w = w.substring(0, w.length - 2)
    else if (w.length > 3 && (w.endsWith("o") || w.endsWith("a") || w.endsWith("e")))
      w = w.substring(0, w.length - 1)
    w
  }

  /** German: umlaut/ß normalization (häuser and hauses meet at haus),
    * case/plural endings -ern/-em/-er/-en/-es, else mute final -e. The
    * rules are mutually exclusive (no cascading) — a bare final -s/-n is
    * NOT stripped, because stem-final s/n is common in German nouns
    * (haus, glas, wagen) and light stemming must not conflate them
    * away. */
  def german(word: String): String = {
    var w = word.flatMap {
      case 'ä' => "a"; case 'ö' => "o"; case 'ü' => "u"; case 'ß' => "ss"
      case c => c.toString
    }
    if (w.length > 5 && w.endsWith("ern")) w = w.substring(0, w.length - 3)
    else if (w.length > 4 && (w.endsWith("em") || w.endsWith("er") ||
      w.endsWith("en") || w.endsWith("es"))) w = w.substring(0, w.length - 2)
    else if (w.length > 4 && w.endsWith("e")) w = w.substring(0, w.length - 1)
    w
  }

  /** Per-language default-chain stemmer registry: Porter (en), the light
    * stemmers above for fr/es/de (the reference's FrenchAnalyzer/
    * SpanishAnalyzer/GermanAnalyzer default to the *LightStemFilter
    * variants too), and the full Snowball algorithms where no light
    * variant exists here. */
  val byLang: Map[String, String => String] = Map(
    "fr" -> french, "es" -> spanish, "de" -> german,
    "en" -> PorterStemmer.stem,
    "ru" -> SnowballRussian.stem, "pt" -> SnowballPortuguese.stem,
    "it" -> SnowballItalian.stem, "nl" -> SnowballDutch.stem,
    "da" -> SnowballDanish.stem, "no" -> SnowballNorwegian.stem,
    "sv" -> SnowballSwedish.stem, "ro" -> SnowballRomanian.stem,
    "fi" -> SnowballFinnish.stem, "hu" -> SnowballHungarian.stem,
    "tr" -> SnowballTurkish.stem,
    // normalize-then-stem packs (the reference's per-language analyzer
    // chains outside Snowball — [[LanguagePacks]])
    "ar" -> ArabicStem.normStem, "fa" -> PersianStem.normalize,
    "ckb" -> SoraniStem.normStem, "hi" -> HindiStem.normStem,
    "bg" -> BulgarianStem.stem, "cs" -> CzechStem.stem,
    "lv" -> LatvianStem.stem, "id" -> IndonesianStem.stem,
    "el" -> GreekStem.foldStem)

  /** Full Snowball registry (the SnowballFilter analog — opt-in where the
    * default chain uses a light stemmer): every algorithm validated
    * against its complete official voc/output vector set. Keys are the
    * language codes plus the named English variants the reference exposes
    * through SnowballFilter's name parameter ("lovins", "porter",
    * "german2", "kp"). */
  val snowball: Map[String, String => String] = Map(
    "lovins" -> SnowballLovins.stem, "porter" -> PorterStemmer.stemStrict,
    "german2" -> SnowballGerman2.stem, "kp" -> SnowballKp.stem,
    "en" -> SnowballEnglish.stem, "fr" -> SnowballFrench.stem,
    "es" -> SnowballSpanish.stem, "de" -> SnowballGerman.stem,
    "ru" -> SnowballRussian.stem, "pt" -> SnowballPortuguese.stem,
    "it" -> SnowballItalian.stem, "nl" -> SnowballDutch.stem,
    "da" -> SnowballDanish.stem, "no" -> SnowballNorwegian.stem,
    "sv" -> SnowballSwedish.stem, "ro" -> SnowballRomanian.stem,
    "fi" -> SnowballFinnish.stem, "hu" -> SnowballHungarian.stem,
    "tr" -> SnowballTurkish.stem, "hy" -> SnowballArmenian.stem,
    "eu" -> SnowballBasque.stem, "ca" -> SnowballCatalan.stem,
    "ga" -> SnowballIrish.stem)
}
