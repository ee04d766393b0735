package graft.analysis

/** Reference-parity light/minimal stemmer pack — the remaining per-language
  * `*LightStemmer`/`*MinimalStemmer` algorithms the reference ships beyond
  * the Snowball set and the independently-specified fr/es/de trio in
  * [[LightStemmers]]. These are restatements of the PUBLISHED algorithms
  * the reference cites (Savoy's UniNE CLEF stemmers, Harman's S-stemmer,
  * Orengo et al.'s RSLP plural step), checked rule-by-rule against the
  * reference sources for exact parity — a user switching engines gets
  * identical index terms:
  *
  *  - englishMinimal — Harman, "How Effective Is Suffixing?" JASIS 42(1)
  *    (Analysis/En/EnglishMinimalStemmer.cs:30-56)
  *  - frenchLight / frenchMinimal — Savoy UniNE
  *    (Analysis/Fr/FrenchLightStemmer.cs:36-260, FrenchMinimalStemmer.cs:36-70)
  *  - germanLight / germanMinimal — (Analysis/De/GermanLightStemmer.cs:39-145,
  *    GermanMinimalStemmer.cs:37-95)
  *  - spanishLight (Analysis/Es/SpanishLightStemmer.cs:36-100)
  *  - italianLight (Analysis/It/ItalianLightStemmer.cs:36-105)
  *  - finnishLight (Analysis/Fi/FinnishLightStemmer.cs:36-220)
  *  - hungarianLight (Analysis/Hu/HungarianLightStemmer.cs:36-250)
  *  - norwegianLight / norwegianMinimal — with the reference's
  *    BOKMAAL/NYNORSK standard flags, default BOKMAAL
  *    (Analysis/No/NorwegianLightStemmer.cs:60-150, NorwegianMinimalStemmer.cs:60-110)
  *  - swedishLight (Analysis/Sv/SwedishLightStemmer.cs:36-80)
  *  - russianLight (Analysis/Ru/RussianLightStemmer.cs:36-90)
  *  - portugueseLight (Analysis/Pt/PortugueseLightStemmer.cs:36-180)
  *  - portugueseMinimal / galicianMinimal — the RSLP "Plural" step only
  *    (Analysis/Pt/PortugueseMinimalStemmer.cs:30-36, portuguese.rslp Plural;
  *    Gl/GalicianMinimalStemmer.cs:30-36, galician.rslp Plural), run
  *    through [[Rslp]]; the tables below transcribe Orengo et al.'s
  *    published plural rules as the reference resources do.
  *
  * All functions expect lowercased input (they sit after LowerCaseFilter)
  * and mirror the reference's in-place char[]-and-length mutation with an
  * Array[Char]/len pair, returning the truncated string.
  */
object LightStemmers3 {

  @inline private def ends(s: Array[Char], len: Int, suf: String): Boolean = {
    val sl = suf.length
    if (len < sl) return false
    var i = 0
    while (i < sl) {
      if (s(len - sl + i) != suf.charAt(i)) return false
      i += 1
    }
    true
  }

  /** StemmerUtil.Delete: remove the char at pos, shifting the tail left. */
  @inline private def del(s: Array[Char], pos: Int, len: Int): Int = {
    System.arraycopy(s, pos + 1, s, pos, len - pos - 1)
    len - 1
  }

  private def run(word: String)(f: (Array[Char], Int) => Int): String = {
    val s = word.toCharArray
    val len = f(s, s.length)
    new String(s, 0, len)
  }

  /** Harman's S-stemmer: plural -s with the -ies→-y rewrite and the
    * -us/-ss/-(vowel)es guards. */
  def englishMinimal(word: String): String = run(word)(englishMinimalImpl)
  private def englishMinimalImpl(s: Array[Char], len: Int): Int = {
    if (len < 3 || s(len - 1) != 's') len
    else s(len - 2) match {
      case 'u' | 's' => len
      case 'e' =>
        if (len > 3 && s(len - 3) == 'i' && s(len - 4) != 'a' && s(len - 4) != 'e') {
          s(len - 3) = 'y'; len - 2
        } else if (s(len - 3) == 'i' || s(len - 3) == 'a' || s(len - 3) == 'o' ||
                   s(len - 3) == 'e') len
        else len - 1
      case _ => len - 1
    }
  }

  /** UniNE French light: derivational suffix rewrites (-issement→-ir,
    * -ateur/-atrice→-er, -cateur→-quer, …) then the Norm fold
    * (diacritics, duplicate-letter squeeze, final -ie/-r/-e/-e, undouble). */
  def frenchLight(word: String): String = run(word)(frenchLightImpl)
  private def frenchLightImpl(s0: Array[Char], len0: Int): Int = {
    var s = s0; var len = len0

    def norm(): Int = {
      if (len > 4) {
        var i = 0
        while (i < len) {
          s(i) match {
            case 'à' | 'á' | 'â' => s(i) = 'a'
            case 'ô' => s(i) = 'o'
            case 'è' | 'é' | 'ê' => s(i) = 'e'
            case 'ù' | 'û' => s(i) = 'u'
            case 'î' => s(i) = 'i'
            case 'ç' => s(i) = 'c'
            case _ =>
          }
          i += 1
        }
        var ch = s(0)
        i = 1
        while (i < len) {
          if (s(i) == ch && Character.isLetter(ch)) { len = del(s, i, len); i -= 1 }
          else ch = s(i)
          i += 1
        }
      }
      if (len > 4 && ends(s, len, "ie")) len -= 2
      if (len > 4) {
        if (s(len - 1) == 'r') len -= 1
        if (s(len - 1) == 'e') len -= 1
        if (s(len - 1) == 'e') len -= 1
        if (s(len - 1) == s(len - 2) && Character.isLetter(s(len - 1))) len -= 1
      }
      len
    }

    if (len > 5 && s(len - 1) == 'x') {
      if (s(len - 3) == 'a' && s(len - 2) == 'u' && s(len - 4) != 'e') s(len - 2) = 'l'
      len -= 1
    }
    if (len > 3 && s(len - 1) == 'x') len -= 1
    if (len > 3 && s(len - 1) == 's') len -= 1

    if (len > 9 && ends(s, len, "issement")) { len -= 6; s(len - 1) = 'r'; return norm() }
    if (len > 8 && ends(s, len, "issant")) { len -= 4; s(len - 1) = 'r'; return norm() }
    if (len > 6 && ends(s, len, "ement")) {
      len -= 4
      if (len > 3 && ends(s, len, "ive")) { len -= 1; s(len - 1) = 'f' }
      return norm()
    }
    if (len > 11 && ends(s, len, "ficatrice")) {
      len -= 5; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm()
    }
    if (len > 10 && ends(s, len, "ficateur")) {
      len -= 4; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm()
    }
    if (len > 9 && ends(s, len, "catrice")) {
      len -= 3; s(len - 4) = 'q'; s(len - 3) = 'u'; s(len - 2) = 'e'; return norm()
    }
    if (len > 8 && ends(s, len, "cateur")) {
      len -= 2; s(len - 4) = 'q'; s(len - 3) = 'u'; s(len - 2) = 'e'; s(len - 1) = 'r'
      return norm()
    }
    if (len > 8 && ends(s, len, "atrice")) {
      len -= 4; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm()
    }
    if (len > 7 && ends(s, len, "ateur")) {
      len -= 3; s(len - 2) = 'e'; s(len - 1) = 'r'; return norm()
    }
    if (len > 6 && ends(s, len, "trice")) {
      len -= 1; s(len - 3) = 'e'; s(len - 2) = 'u'; s(len - 1) = 'r'
      // no return — the reference falls through to the next checks
    }
    if (len > 5 && ends(s, len, "ième")) { len -= 4; return norm() }
    if (len > 7 && ends(s, len, "teuse")) { len -= 2; s(len - 1) = 'r'; return norm() }
    if (len > 6 && ends(s, len, "teur")) { len -= 1; s(len - 1) = 'r'; return norm() }
    if (len > 5 && ends(s, len, "euse")) { len -= 2; return norm() }
    if (len > 8 && ends(s, len, "ère")) { len -= 1; s(len - 2) = 'e'; return norm() }
    if (len > 7 && ends(s, len, "ive")) { len -= 1; s(len - 1) = 'f'; return norm() }
    if (len > 4 && (ends(s, len, "folle") || ends(s, len, "molle"))) {
      len -= 2; s(len - 1) = 'u'; return norm()
    }
    if (len > 9 && ends(s, len, "nnelle")) { len -= 5; return norm() }
    if (len > 9 && ends(s, len, "nnel")) { len -= 3; return norm() }
    if (len > 4 && ends(s, len, "ète")) { len -= 1; s(len - 2) = 'e' } // fallthrough
    if (len > 8 && ends(s, len, "ique")) len -= 4 // fallthrough
    if (len > 8 && ends(s, len, "esse")) { len -= 3; return norm() }
    if (len > 7 && ends(s, len, "inage")) { len -= 3; return norm() }
    if (len > 9 && ends(s, len, "isation")) {
      len -= 7
      if (len > 5 && ends(s, len, "ual")) s(len - 2) = 'e'
      return norm()
    }
    if (len > 9 && ends(s, len, "isateur")) { len -= 7; return norm() }
    if (len > 8 && ends(s, len, "ation")) { len -= 5; return norm() }
    if (len > 8 && ends(s, len, "ition")) { len -= 5; return norm() }
    norm()
  }

  /** UniNE French minimal: -aux→-al / -x, then cascaded final -s,-r,-e,-é
    * and undouble; words under 6 chars untouched. */
  def frenchMinimal(word: String): String = run(word)(frenchMinimalImpl)
  private def frenchMinimalImpl(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len < 6) return len
    if (s(len - 1) == 'x') {
      if (s(len - 3) == 'a' && s(len - 2) == 'u') s(len - 2) = 'l'
      return len - 1
    }
    if (s(len - 1) == 's') len -= 1
    if (s(len - 1) == 'r') len -= 1
    if (s(len - 1) == 'e') len -= 1
    if (s(len - 1) == 'é') len -= 1
    if (s(len - 1) == s(len - 2)) len -= 1
    len
  }

  private def stEnding(ch: Char): Boolean = ch match {
    case 'b' | 'd' | 'f' | 'g' | 'h' | 'k' | 'l' | 'm' | 'n' | 't' => true
    case _ => false
  }

  /** UniNE German light: accent fold, then two cascaded suffix steps
    * (-ern/-em/-en/-er/-es/-e/-s·C, then -est/-er/-en/-st·C). Unlike the
    * independently-specified [[LightStemmers.german]] this is the
    * reference's exact cascade (both steps always run). */
  def germanLight(word: String): String = run(word)(germanLightImpl)
  private def germanLightImpl(s: Array[Char], len0: Int): Int = {
    var len = len0
    var i = 0
    while (i < len) {
      s(i) match {
        case 'ä' | 'à' | 'á' | 'â' => s(i) = 'a'
        case 'ö' | 'ò' | 'ó' | 'ô' => s(i) = 'o'
        case 'ï' | 'ì' | 'í' | 'î' => s(i) = 'i'
        case 'ü' | 'ù' | 'ú' | 'û' => s(i) = 'u'
        case _ =>
      }
      i += 1
    }
    // step 1
    len =
      if (len > 5 && s(len - 3) == 'e' && s(len - 2) == 'r' && s(len - 1) == 'n') len - 3
      else if (len > 4 && s(len - 2) == 'e' &&
               (s(len - 1) == 'm' || s(len - 1) == 'n' || s(len - 1) == 'r' || s(len - 1) == 's'))
        len - 2
      else if (len > 3 && s(len - 1) == 'e') len - 1
      else if (len > 3 && s(len - 1) == 's' && stEnding(s(len - 2))) len - 1
      else len
    // step 2
    if (len > 5 && s(len - 3) == 'e' && s(len - 2) == 's' && s(len - 1) == 't') len - 3
    else if (len > 4 && s(len - 2) == 'e' && (s(len - 1) == 'r' || s(len - 1) == 'n')) len - 2
    else if (len > 4 && s(len - 2) == 's' && s(len - 1) == 't' && stEnding(s(len - 3))) len - 2
    else len
  }

  /** UniNE German minimal: umlaut fold then ONE plural/case suffix
    * (-nen, -en/-se/-es/-er at len>5, else single -n/-e/-s/-r); words
    * under 5 chars untouched. */
  def germanMinimal(word: String): String = run(word)(germanMinimalImpl)
  private def germanMinimalImpl(s: Array[Char], len: Int): Int = {
    if (len < 5) return len
    var i = 0
    while (i < len) {
      s(i) match {
        case 'ä' => s(i) = 'a'
        case 'ö' => s(i) = 'o'
        case 'ü' => s(i) = 'u'
        case _ =>
      }
      i += 1
    }
    if (len > 6 && s(len - 3) == 'n' && s(len - 2) == 'e' && s(len - 1) == 'n') return len - 3
    if (len > 5) {
      s(len - 1) match {
        case 'n' if s(len - 2) == 'e' => return len - 2
        case 'e' if s(len - 2) == 's' => return len - 2
        case 's' if s(len - 2) == 'e' => return len - 2
        case 'r' if s(len - 2) == 'e' => return len - 2
        case _ =>
      }
    }
    s(len - 1) match {
      case 'n' | 'e' | 's' | 'r' => len - 1
      case _ => len
    }
  }

  /** UniNE Spanish light: accent fold then final -o/-a/-e, -eses→-es,
    * -ces→-z, -(o|a|e)s; words under 5 chars untouched. The reference's
    * exact variant of the independently-specified [[LightStemmers.spanish]]. */
  def spanishLight(word: String): String = run(word)(spanishLightImpl)
  private def spanishLightImpl(s: Array[Char], len: Int): Int = {
    if (len < 5) return len
    var i = 0
    while (i < len) {
      s(i) match {
        case 'à' | 'á' | 'â' | 'ä' => s(i) = 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' => s(i) = 'o'
        case 'è' | 'é' | 'ê' | 'ë' => s(i) = 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => s(i) = 'u'
        case 'ì' | 'í' | 'î' | 'ï' => s(i) = 'i'
        case _ =>
      }
      i += 1
    }
    s(len - 1) match {
      case 'o' | 'a' | 'e' => len - 1
      case 's' =>
        if (s(len - 2) == 'e' && s(len - 3) == 's' && s(len - 4) == 'e') len - 2
        else if (s(len - 2) == 'e' && s(len - 3) == 'c') { s(len - 3) = 'z'; len - 2 }
        else if (s(len - 2) == 'o' || s(len - 2) == 'a' || s(len - 2) == 'e') len - 2
        else len
      case _ => len
    }
  }

  /** UniNE Italian light: accent fold then one final-vowel rule
    * (-ie/-he→-2, -hi/-ii→-2, -ia/-io→-2, else -e/-i/-a/-o→-1);
    * words under 6 chars untouched. */
  def italianLight(word: String): String = run(word)(italianLightImpl)
  private def italianLightImpl(s: Array[Char], len: Int): Int = {
    if (len < 6) return len
    var i = 0
    while (i < len) {
      s(i) match {
        case 'à' | 'á' | 'â' | 'ä' => s(i) = 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' => s(i) = 'o'
        case 'è' | 'é' | 'ê' | 'ë' => s(i) = 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => s(i) = 'u'
        case 'ì' | 'í' | 'î' | 'ï' => s(i) = 'i'
        case _ =>
      }
      i += 1
    }
    s(len - 1) match {
      case 'e' => if (s(len - 2) == 'i' || s(len - 2) == 'h') len - 2 else len - 1
      case 'i' => if (s(len - 2) == 'h' || s(len - 2) == 'i') len - 2 else len - 1
      case 'a' => if (s(len - 2) == 'i') len - 2 else len - 1
      case 'o' => if (s(len - 2) == 'i') len - 2 else len - 1
      case _ => len
    }
  }

  private def finVowel(ch: Char): Boolean = ch match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  /** UniNE Finnish light: ä/å/ö fold, particle strip (recursive -kin/-ko),
    * possessives, the big case-ending step with its s-rewrites
    * (-den→-s·, -ksen→-s·, -nnen→-s·, -ntena→-s·, hde→ksi), then two
    * normalize passes incl. the k/p/t de-gemination squeeze. */
  def finnishLight(word: String): String = run(word)(finnishLightImpl)
  private def finnishLightImpl(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len < 4) return len
    var i = 0
    while (i < len) {
      s(i) match {
        case 'ä' | 'å' => s(i) = 'a'
        case 'ö' => s(i) = 'o'
        case _ =>
      }
      i += 1
    }

    def step1(l0: Int): Int = {
      var l = l0
      if (l > 8) {
        if (ends(s, l, "kin")) return step1(l - 3)
        if (ends(s, l, "ko")) return step1(l - 2)
      }
      if (l > 11) {
        if (ends(s, l, "dellinen")) return l - 8
        if (ends(s, l, "dellisuus")) return l - 9
      }
      l
    }
    def step2(l: Int): Int =
      if (l > 5) {
        if (ends(s, l, "lla") || ends(s, l, "tse") || ends(s, l, "sti")) l - 3
        else if (ends(s, l, "ni")) l - 2
        else if (ends(s, l, "aa")) l - 1
        else l
      } else l
    def step3(l0: Int): Int = {
      val l = l0
      if (l > 8) {
        if (ends(s, l, "nnen")) { s(l - 4) = 's'; return l - 3 }
        if (ends(s, l, "ntena")) { s(l - 5) = 's'; return l - 4 }
        if (ends(s, l, "tten")) return l - 4
        if (ends(s, l, "eiden")) return l - 5
      }
      if (l > 6) {
        if (ends(s, l, "neen") || ends(s, l, "niin") || ends(s, l, "seen") ||
            ends(s, l, "teen") || ends(s, l, "inen")) return l - 4
        if (s(l - 3) == 'h' && finVowel(s(l - 2)) && s(l - 1) == 'n') return l - 3
        if (ends(s, l, "den")) { s(l - 3) = 's'; return l - 2 }
        if (ends(s, l, "ksen")) { s(l - 4) = 's'; return l - 3 }
        if (ends(s, l, "ssa") || ends(s, l, "sta") || ends(s, l, "lla") ||
            ends(s, l, "lta") || ends(s, l, "tta") || ends(s, l, "ksi") ||
            ends(s, l, "lle")) return l - 3
      }
      if (l > 5) {
        if (ends(s, l, "na") || ends(s, l, "ne")) return l - 2
        if (ends(s, l, "nei")) return l - 3
      }
      if (l > 4) {
        if (ends(s, l, "ja") || ends(s, l, "ta")) return l - 2
        if (s(l - 1) == 'a') return l - 1
        if (s(l - 1) == 'n' && finVowel(s(l - 2))) return l - 2
        if (s(l - 1) == 'n') return l - 1
      }
      l
    }
    def norm1(l0: Int): Int = {
      val l = l0
      if (l > 5 && ends(s, l, "hde")) { s(l - 3) = 'k'; s(l - 2) = 's'; s(l - 1) = 'i' }
      if (l > 4 && (ends(s, l, "ei") || ends(s, l, "at"))) return l - 2
      if (l > 3) s(l - 1) match {
        case 't' | 's' | 'j' | 'e' | 'a' | 'i' => return l - 1
        case _ =>
      }
      l
    }
    def norm2(l0: Int): Int = {
      var l = l0
      if (l > 8 && (s(l - 1) == 'e' || s(l - 1) == 'o' || s(l - 1) == 'u')) l -= 1
      if (l > 4) {
        if (s(l - 1) == 'i') l -= 1
        if (l > 4) {
          var ch = s(0)
          var j = 1
          while (j < l) {
            if (s(j) == ch && (ch == 'k' || ch == 'p' || ch == 't')) { l = del(s, j, l); j -= 1 }
            else ch = s(j)
            j += 1
          }
        }
      }
      l
    }
    len = step1(len); len = step2(len); len = step3(len)
    len = norm1(len); norm2(len)
  }

  /** UniNE Hungarian light: accent fold, case endings, possessives,
    * plural -k, final-vowel normalize. */
  def hungarianLight(word: String): String = run(word)(hungarianLightImpl)
  private def hungarianLightImpl(s: Array[Char], len0: Int): Int = {
    var len = len0
    var i = 0
    while (i < len) {
      s(i) match {
        case 'á' => s(i) = 'a'
        case 'ë' | 'é' => s(i) = 'e'
        case 'í' => s(i) = 'i'
        case 'ó' | 'ő' | 'õ' | 'ö' => s(i) = 'o'
        case 'ú' | 'ű' | 'ũ' | 'û' | 'ü' => s(i) = 'u'
        case _ =>
      }
      i += 1
    }
    def removeCase(l: Int): Int = {
      if (l > 6 && ends(s, l, "kent")) return l - 4
      if (l > 5) {
        if (ends(s, l, "nak") || ends(s, l, "nek") || ends(s, l, "val") ||
            ends(s, l, "vel") || ends(s, l, "ert") || ends(s, l, "rol") ||
            ends(s, l, "ban") || ends(s, l, "ben") || ends(s, l, "bol") ||
            ends(s, l, "nal") || ends(s, l, "nel") || ends(s, l, "hoz") ||
            ends(s, l, "hez") || ends(s, l, "tol")) return l - 3
        if ((ends(s, l, "al") || ends(s, l, "el")) &&
            !finVowel(s(l - 3)) && s(l - 3) == s(l - 4)) return l - 3
      }
      if (l > 4) {
        if (ends(s, l, "at") || ends(s, l, "et") || ends(s, l, "ot") ||
            ends(s, l, "va") || ends(s, l, "ve") || ends(s, l, "ra") ||
            ends(s, l, "re") || ends(s, l, "ba") || ends(s, l, "be") ||
            ends(s, l, "ul") || ends(s, l, "ig")) return l - 2
        if ((ends(s, l, "on") || ends(s, l, "en")) && !finVowel(s(l - 3))) return l - 2
        s(l - 1) match {
          case 't' | 'n' => return l - 1
          case 'a' | 'e' if s(l - 2) == s(l - 3) && !finVowel(s(l - 2)) => return l - 2
          case _ =>
        }
      }
      l
    }
    def removePossessive(l: Int): Int = {
      if (l > 6) {
        if (!finVowel(s(l - 5)) &&
            (ends(s, l, "atok") || ends(s, l, "otok") || ends(s, l, "etek"))) return l - 4
        if (ends(s, l, "itek") || ends(s, l, "itok")) return l - 4
      }
      if (l > 5) {
        if (!finVowel(s(l - 4)) &&
            (ends(s, l, "unk") || ends(s, l, "tok") || ends(s, l, "tek"))) return l - 3
        if (finVowel(s(l - 4)) && ends(s, l, "juk")) return l - 3
        if (ends(s, l, "ink")) return l - 3
      }
      if (l > 4) {
        if (!finVowel(s(l - 3)) &&
            (ends(s, l, "am") || ends(s, l, "em") || ends(s, l, "om") ||
             ends(s, l, "ad") || ends(s, l, "ed") || ends(s, l, "od") ||
             ends(s, l, "uk"))) return l - 2
        if (finVowel(s(l - 3)) &&
            (ends(s, l, "nk") || ends(s, l, "ja") || ends(s, l, "je"))) return l - 2
        if (ends(s, l, "im") || ends(s, l, "id") || ends(s, l, "ik")) return l - 2
      }
      if (l > 3) s(l - 1) match {
        case 'a' | 'e' if !finVowel(s(l - 2)) => return l - 1
        case 'm' | 'd' if finVowel(s(l - 2)) => return l - 1
        case 'i' => return l - 1
        case _ =>
      }
      l
    }
    def removePlural(l: Int): Int =
      if (l > 3 && s(l - 1) == 'k') s(l - 2) match {
        case 'a' | 'o' | 'e' => if (l > 4) l - 2 else l - 1
        case _ => l - 1
      } else l
    def normalize(l: Int): Int =
      if (l > 3) s(l - 1) match {
        case 'a' | 'e' | 'i' | 'o' => l - 1
        case _ => l
      } else l
    len = removeCase(len); len = removePossessive(len)
    len = removePlural(len); normalize(len)
  }

  /** UniNE Norwegian light, with the reference's language-standard flags
    * (BOKMAAL and/or NYNORSK; default bokmål like
    * NorwegianLightStemFilter's one-arg constructor). */
  def norwegianLight(word: String, bokmaal: Boolean = true,
                     nynorsk: Boolean = false): String = {
    require(bokmaal || nynorsk, "invalid flags")
    run(word)(norwegianLightImpl(_, _, bokmaal, nynorsk))
  }
  private def norwegianLightImpl(s: Array[Char], len0: Int,
                                 bokmaal: Boolean, nynorsk: Boolean): Int = {
      var len = len0
      if (len > 4 && s(len - 1) == 's') len -= 1
      if (len > 7 && ((ends(s, len, "heter") && bokmaal) ||
          (ends(s, len, "heten") && bokmaal) || (ends(s, len, "heita") && nynorsk)))
        return len - 5
      if (len > 8 && nynorsk && (ends(s, len, "heiter") || ends(s, len, "leiken") ||
          ends(s, len, "leikar"))) return len - 6
      if (len > 5 && (ends(s, len, "dom") || (ends(s, len, "het") && bokmaal)))
        return len - 3
      if (len > 6 && nynorsk && (ends(s, len, "heit") || ends(s, len, "semd") ||
          ends(s, len, "leik"))) return len - 4
      if (len > 7 && (ends(s, len, "elser") || ends(s, len, "elsen"))) return len - 5
      if (len > 6 && ((ends(s, len, "ende") && bokmaal) || (ends(s, len, "ande") && nynorsk) ||
          ends(s, len, "else") || (ends(s, len, "este") && bokmaal) ||
          (ends(s, len, "aste") && nynorsk) || (ends(s, len, "eren") && bokmaal) ||
          (ends(s, len, "aren") && nynorsk))) return len - 4
      if (len > 5 && ((ends(s, len, "ere") && bokmaal) || (ends(s, len, "are") && nynorsk) ||
          (ends(s, len, "est") && bokmaal) || (ends(s, len, "ast") && nynorsk) ||
          ends(s, len, "ene") || (ends(s, len, "ane") && nynorsk))) return len - 3
      if (len > 4 && (ends(s, len, "er") || ends(s, len, "en") || ends(s, len, "et") ||
          (ends(s, len, "ar") && nynorsk) || (ends(s, len, "st") && bokmaal) ||
          ends(s, len, "te"))) return len - 2
      if (len > 3) s(len - 1) match {
        case 'a' | 'e' | 'n' => return len - 1
        case _ =>
      }
      len
  }

  /** UniNE Norwegian minimal: genitive -s, definite plural -ene/-ane,
    * -er/-en/-et/-ar, final -a/-e. */
  def norwegianMinimal(word: String, bokmaal: Boolean = true,
                       nynorsk: Boolean = false): String = {
    require(bokmaal || nynorsk, "invalid flags")
    run(word)(norwegianMinimalImpl(_, _, bokmaal, nynorsk))
  }
  private def norwegianMinimalImpl(s: Array[Char], len0: Int,
                                   bokmaal: Boolean, nynorsk: Boolean): Int = {
      var len = len0
      if (len > 4 && s(len - 1) == 's') len -= 1
      if (len > 5 && (ends(s, len, "ene") || (ends(s, len, "ane") && nynorsk)))
        return len - 3
      if (len > 4 && (ends(s, len, "er") || ends(s, len, "en") ||
          ends(s, len, "et") || (ends(s, len, "ar") && nynorsk))) return len - 2
      if (len > 3) s(len - 1) match {
        case 'a' | 'e' => return len - 1
        case _ =>
      }
      len
  }

  /** UniNE Swedish light: genitive -s then one suffix tier
    * (-elser/-heten, -arne/-erna/…, -are/-ast/-het, 2-char tier, final
    * -t/-a/-e/-n). */
  def swedishLight(word: String): String = run(word)(swedishLightImpl)
  private def swedishLightImpl(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len > 4 && s(len - 1) == 's') len -= 1
    if (len > 7 && (ends(s, len, "elser") || ends(s, len, "heten"))) return len - 5
    if (len > 6 && (ends(s, len, "arne") || ends(s, len, "erna") ||
        ends(s, len, "ande") || ends(s, len, "else") || ends(s, len, "aste") ||
        ends(s, len, "orna") || ends(s, len, "aren"))) return len - 4
    if (len > 5 && (ends(s, len, "are") || ends(s, len, "ast") || ends(s, len, "het")))
      return len - 3
    if (len > 4 && (ends(s, len, "ar") || ends(s, len, "er") || ends(s, len, "or") ||
        ends(s, len, "en") || ends(s, len, "at") || ends(s, len, "te") ||
        ends(s, len, "et"))) return len - 2
    if (len > 3) s(len - 1) match {
      case 't' | 'a' | 'e' | 'n' => return len - 1
      case _ =>
    }
    len
  }

  /** UniNE Russian light: case-ending strip (4/3/2/1-char tiers over the
    * Cyrillic inflection table) then -ь/-и and -нн→-н normalize. */
  def russianLight(word: String): String = run(word)(russianLightImpl)
  private def russianLightImpl(s: Array[Char], len0: Int): Int = {
    var len = len0
    def removeCase(l: Int): Int = {
      if (l > 6 && (ends(s, l, "иями") || ends(s, l, "оями"))) return l - 4
      if (l > 5 && (ends(s, l, "иям") || ends(s, l, "иях") || ends(s, l, "оях") ||
          ends(s, l, "ями") || ends(s, l, "оям") || ends(s, l, "оьв") ||
          ends(s, l, "ами") || ends(s, l, "его") || ends(s, l, "ему") ||
          ends(s, l, "ери") || ends(s, l, "ими") || ends(s, l, "ого") ||
          ends(s, l, "ому") || ends(s, l, "ыми") || ends(s, l, "оев"))) return l - 3
      if (l > 4 && (ends(s, l, "ая") || ends(s, l, "яя") || ends(s, l, "ях") ||
          ends(s, l, "юю") || ends(s, l, "ах") || ends(s, l, "ею") ||
          ends(s, l, "их") || ends(s, l, "ия") || ends(s, l, "ию") ||
          ends(s, l, "ьв") || ends(s, l, "ою") || ends(s, l, "ую") ||
          ends(s, l, "ям") || ends(s, l, "ых") || ends(s, l, "ея") ||
          ends(s, l, "ам") || ends(s, l, "ем") || ends(s, l, "ей") ||
          ends(s, l, "ём") || ends(s, l, "ев") || ends(s, l, "ий") ||
          ends(s, l, "им") || ends(s, l, "ое") || ends(s, l, "ой") ||
          ends(s, l, "ом") || ends(s, l, "ов") || ends(s, l, "ые") ||
          ends(s, l, "ый") || ends(s, l, "ым") || ends(s, l, "ми"))) return l - 2
      if (l > 3) s(l - 1) match {
        case 'а' | 'е' | 'и' | 'о' | 'у' | 'й' | 'ы' | 'я' | 'ь' => return l - 1
        case _ =>
      }
      l
    }
    def normalize(l: Int): Int =
      if (l > 3) s(l - 1) match {
        case 'ь' | 'и' => l - 1
        case 'н' if s(l - 2) == 'н' => l - 1
        case _ => l
      } else l
    len = removeCase(len); normalize(len)
  }

  /** UniNE Portuguese light: plural/adverb suffix strip with the
    * -ns→-m / -éis→-el / -ões→-ão rewrites, feminine→masculine
    * normalization, final-vowel strip, then accent/ç fold. */
  def portugueseLight(word: String): String = run(word)(portugueseLightImpl)
  private def portugueseLightImpl(s: Array[Char], len0: Int): Int = {
    var len = len0
    if (len < 4) return len
    def removeSuffix(l0: Int): Int = {
      var l = l0
      if (l > 4 && ends(s, l, "es")) s(l - 3) match {
        case 'r' | 's' | 'l' | 'z' => return l - 2
        case _ =>
      }
      if (l > 3 && ends(s, l, "ns")) { s(l - 2) = 'm'; return l - 1 }
      if (l > 4 && (ends(s, l, "eis") || ends(s, l, "éis"))) {
        s(l - 3) = 'e'; s(l - 2) = 'l'; return l - 1
      }
      if (l > 4 && ends(s, l, "ais")) { s(l - 2) = 'l'; return l - 1 }
      if (l > 4 && ends(s, l, "óis")) { s(l - 3) = 'o'; s(l - 2) = 'l'; return l - 1 }
      if (l > 4 && ends(s, l, "is")) { s(l - 1) = 'l'; return l }
      if (l > 3 && (ends(s, l, "ões") || ends(s, l, "ães"))) {
        l -= 1; s(l - 2) = 'ã'; s(l - 1) = 'o'; return l
      }
      if (l > 6 && ends(s, l, "mente")) return l - 5
      if (l > 3 && s(l - 1) == 's') return l - 1
      l
    }
    def normFeminine(l0: Int): Int = {
      var l = l0
      if (l > 7 && (ends(s, l, "inha") || ends(s, l, "iaca") || ends(s, l, "eira"))) {
        s(l - 1) = 'o'; return l
      }
      if (l > 6) {
        if (ends(s, l, "osa") || ends(s, l, "ica") || ends(s, l, "ida") ||
            ends(s, l, "ada") || ends(s, l, "iva") || ends(s, l, "ama")) {
          s(l - 1) = 'o'; return l
        }
        if (ends(s, l, "ona")) { s(l - 3) = 'ã'; s(l - 2) = 'o'; return l - 1 }
        if (ends(s, l, "ora")) return l - 1
        if (ends(s, l, "esa")) { s(l - 3) = 'ê'; return l - 1 }
        if (ends(s, l, "na")) { s(l - 1) = 'o'; return l }
      }
      l
    }
    len = removeSuffix(len)
    if (len > 3 && s(len - 1) == 'a') len = normFeminine(len)
    if (len > 4) s(len - 1) match {
      case 'e' | 'a' | 'o' => len -= 1
      case _ =>
    }
    var i = 0
    while (i < len) {
      s(i) match {
        case 'à' | 'á' | 'â' | 'ä' | 'ã' => s(i) = 'a'
        case 'ò' | 'ó' | 'ô' | 'ö' | 'õ' => s(i) = 'o'
        case 'è' | 'é' | 'ê' | 'ë' => s(i) = 'e'
        case 'ù' | 'ú' | 'û' | 'ü' => s(i) = 'u'
        case 'ì' | 'í' | 'î' | 'ï' => s(i) = 'i'
        case 'ç' => s(i) = 'c'
        case _ =>
      }
      i += 1
    }
    len
  }

  // ---------------------------------------------------------------------
  // RSLP "Plural" steps (Orengo et al., "A Stemming Algorithm for the
  // Portuguese Language", SPIRE 2001, table 1 — the reference binds just
  // this step for its Minimal stemmers; transcribed like the reference's
  // portuguese.rslp / galician.rslp resources are).

  private val ptPluralTable =
    """{ "Plural", 3, 1, {"s"},
      |{"ns",1,"m"},
      |{"ões",3,"ão"},
      |{"ães",1,"ão",{"mães"}},
      |{"ais",1,"al",{"cais","mais"}},
      |{"éis",2,"el"},
      |{"eis",2,"el"},
      |{"óis",2,"ol"},
      |{"is",2,"il",{"lápis","cais","mais","crúcis","biquínis","pois","depois","dois","leis"}},
      |{"les",3,"l"},
      |{"res",3,"r",{"árvores"}},
      |{"s",2,"",{"aliás","pires","lápis","cais","mais","mas","menos","férias","fezes","pêsames","crúcis","gás","atrás","moisés","através","convés","ês","país","após","ambas","ambos","messias","depois"}}};
      |""".stripMargin

  private val glPluralTable =
    """{ "Plural", 3, 1, {"s"},
      |{"ns",1,"n",{"luns","furatapóns","furatapons"}},
      |{"ós",3,"ón"},
      |{"ões",3,"ón"},
      |{"ães",1,"ão",{"mães","magalhães"}},
      |{"ais",2,"al",{"cais","tais","mais","pais","ademais"}},
      |{"áis",2,"al",{"cáis","táis","máis","páis","ademáis"}},
      |{"éis",2,"el"},
      |{"eis",2,"el"},
      |{"óis",2,"ol",{"escornabóis"}},
      |{"ois",2,"ol",{"escornabois"}},
      |{"ís",2,"il",{"país"}},
      |{"is",2,"il",{"menfis","pais","kinguis"}},
      |{"les",2,"l",{"ingles","marselles","montreales","senegales","manizales","móstoles","nápoles"}},
      |{"res",3,"r",{"petres","henares","cáceres","baleares","linares","londres","mieres","miraflores","mércores","venres","pires"}},
      |{"ces",2,"z"},
      |{"zes",2,"z"},
      |{"ises",3,"z"},
      |{"ás",1,"al",{"más"}},
      |{"ses",2,"s"},
      |{"s",2,"",{"barbadés","barcelonés","cantonés","gabonés","llanés","medinés","escocés","escocês","francês","barcelonês","cantonês","macramés","reves","barcelones","cantones","gabones","llanes","magallanes","medines","escoces","frances","xoves","martes","aliás","pires","lápis","cais","mais","mas","menos","férias","pêsames","crúcis","país","cangas","atenas","asturias","canarias","filipinas","honduras","molucas","caldas","mascareñas","micenas","covarrubias","psoas","óculos","nupcias","xoves","martes","llanes"}}};
      |""".stripMargin

  private lazy val ptPlural = Rslp.parse(ptPluralTable)("Plural")
  private lazy val glPlural = Rslp.parse(glPluralTable)("Plural")

  /** RSLP plural step only (PortugueseMinimalStemmer.cs:30-36). */
  def portugueseMinimal(word: String): String = ptPlural(word)

  /** RSLP plural step only (GalicianMinimalStemmer.cs:30-36). */
  def galicianMinimal(word: String): String = glPlural(word)

  /** The reference-parity registry, keyed `<lang>_light` / `<lang>_minimal`
    * (alongside [[LightStemmers.byLang]]'s default chains). */
  val byName: Map[String, String => String] = Map(
    "en_minimal" -> englishMinimal,
    "fr_light" -> frenchLight, "fr_minimal" -> frenchMinimal,
    "de_light" -> germanLight, "de_minimal" -> germanMinimal,
    "es_light" -> spanishLight, "it_light" -> italianLight,
    "fi_light" -> finnishLight, "hu_light" -> hungarianLight,
    "no_light" -> (norwegianLight(_)), "no_minimal" -> (norwegianMinimal(_)),
    "sv_light" -> swedishLight, "ru_light" -> russianLight,
    "pt_light" -> portugueseLight, "pt_minimal" -> portugueseMinimal,
    "gl_minimal" -> galicianMinimal)
}
