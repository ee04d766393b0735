package graft.analysis

/** Per-language normalizers and light stemmers beyond the Snowball pack:
  * the published lightweight algorithms the reference wires into its
  * per-language analyzers (reference: Analysis/{Ar,Bg,Ckb,Cz,Fa,Ga,Hi,Id,Lv}).
  * Each is implemented from the algorithm's published description and
  * validated against the reference's public test vectors (parsed from the
  * reference test sources at test time — LanguagePackSpec).
  *
  * All functions are pure `String => String`, chained normalizer-then-
  * stemmer into [[Analyzer]] via [[LightStemmers.byLang]].
  */
private[analysis] object StemBuf {
  /** Mutable (chars, len) work buffer with the classic in-place-stemmer
    * primitives: suffix/prefix tests against the live length and
    * char-shifting deletes. */
  final class Buf(word: String) {
    var s: Array[Char] = word.toCharArray
    var len: Int = s.length
    def endsWith(suffix: String): Boolean = {
      val sl = suffix.length
      if (sl > len) return false
      var i = 0
      while (i < sl) {
        if (s(len - sl + i) != suffix.charAt(i)) return false
        i += 1
      }
      true
    }
    def startsWith(prefix: String): Boolean = {
      val pl = prefix.length
      if (pl > len) return false
      var i = 0
      while (i < pl) {
        if (s(i) != prefix.charAt(i)) return false
        i += 1
      }
      true
    }
    /** Delete the char at `pos`, shifting the tail left. */
    def delete(pos: Int): Unit = {
      System.arraycopy(s, pos + 1, s, pos, len - pos - 1)
      len -= 1
    }
    /** Delete `n` chars starting at `pos`. */
    def deleteN(pos: Int, n: Int): Unit = {
      System.arraycopy(s, pos + n, s, pos, len - pos - n)
      len -= n
    }
    def result: String = new String(s, 0, len)
  }
}

/** Arabic light stemming (Larkey, Ballesteros & Connell, "Improving
  * Stemming for Arabic Information Retrieval", SIGIR 2002 — the light-8
  * scheme): normalize hamza-seated alef forms, teh marbuta, dotless yeh,
  * strip harakat/tatweel; then strip one definite-article/conjunction
  * prefix and the common suffixes, with minimum-remainder guards.
  * Reference behavior: Analysis/Ar/ArabicNormalizer.cs,
  * Analysis/Ar/ArabicStemmer.cs. */
object ArabicStem {
  import StemBuf.Buf

  private final val Alef = 'ا'
  private final val Yeh = 'ي'
  private final val Heh = 'ه'

  def normalize(word: String): String = {
    val b = new Buf(word)
    var i = 0
    while (i < b.len) {
      b.s(i) match {
        case 'آ' | 'أ' | 'إ' => b.s(i) = Alef // seated hamza → alef
        case 'ى' => b.s(i) = Yeh                         // dotless yeh
        case 'ة' => b.s(i) = Heh                         // teh marbuta → heh
        case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ' | 'ُ' |
             'ِ' | 'ّ' | 'ْ' => // tatweel + harakat
          b.delete(i); i -= 1
        case _ =>
      }
      i += 1
    }
    b.result
  }

  private val Prefixes = Array(
    "ال", "وال", "بال",
    "كال", "فال", "لل", "و")
  private val Suffixes = Array(
    "ها", "ان", "ات", "ون",
    "ين", "يه", "ية", "ه", "ة", "ي")

  def stem(word: String): String = {
    val b = new Buf(word)
    // one prefix at most; single-char prefix (wa-) needs ≥4 chars, others ≥ prefix+2
    var pi = 0
    var done = false
    while (pi < Prefixes.length && !done) {
      val p = Prefixes(pi)
      val minLen = if (p.length == 1) 4 else p.length + 2
      if (b.len >= minLen && b.startsWith(p)) {
        b.deleteN(0, p.length)
        done = true
      }
      pi += 1
    }
    // every suffix in table order, each at most once; ≥2 chars must remain
    var si = 0
    while (si < Suffixes.length) {
      val suf = Suffixes(si)
      if (b.len >= suf.length + 2 && b.endsWith(suf)) b.deleteN(b.len - suf.length, suf.length)
      si += 1
    }
    b.result
  }

  def normStem(word: String): String = stem(normalize(word))
}

/** Persian orthographic normalization (no stemmer in the reference chain):
  * farsi yeh / yeh barree → arabic yeh, keheh → kaf, heh+yeh & heh goal →
  * heh, drop hamza-above. Reference behavior: Analysis/Fa/PersianNormalizer.cs. */
object PersianStem {
  import StemBuf.Buf
  def normalize(word: String): String = {
    val b = new Buf(word)
    var i = 0
    while (i < b.len) {
      b.s(i) match {
        case 'ی' | 'ے' => b.s(i) = 'ي'
        case 'ک' => b.s(i) = 'ك'
        case 'ۀ' | 'ہ' => b.s(i) = 'ه'
        case 'ٔ' => b.delete(i); i -= 1
        case _ =>
      }
      i += 1
    }
    b.result
  }
}

/** Sorani Kurdish normalization + light stemming: script unification
  * (yeh/kaf variants, heh↔ae, initial reh → rreh, strip harakat/tatweel/
  * format chars) then suffix stripping of postpositions, possessive
  * pronouns, ezafe and definiteness/plural markers. Reference behavior:
  * Analysis/Ckb/SoraniNormalizer.cs, Analysis/Ckb/SoraniStemmer.cs. */
object SoraniStem {
  import StemBuf.Buf

  def normalize(word: String): String = {
    val b = new Buf(word)
    var i = 0
    while (i < b.len) {
      b.s(i) match {
        case 'ي' | 'ى' => b.s(i) = 'ی' // yeh forms → farsi yeh
        case 'ك' => b.s(i) = 'ک'            // kaf → keheh
        case '‌' =>                              // zwnj: heh before it → ae
          if (i > 0 && b.s(i - 1) == 'ه') b.s(i - 1) = 'ە'
          b.delete(i); i -= 1
        case 'ه' if i == b.len - 1 => b.s(i) = 'ە' // final heh → ae
        case 'ة' => b.s(i) = 'ە'            // teh marbuta → ae
        case 'ھ' => b.s(i) = 'ه'            // heh doachashmee → heh
        case 'ر' if i == 0 => b.s(i) = 'ڕ'  // initial reh → rreh
        case 'ڒ' => b.s(i) = 'ڕ'            // rreh-above → rreh
        case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ' | 'ُ' |
             'ِ' | 'ّ' | 'ْ' =>        // tatweel + harakat
          b.delete(i); i -= 1
        case c if Character.getType(c) == Character.FORMAT =>
          b.delete(i); i -= 1
        case _ =>
      }
      i += 1
    }
    b.result
  }

  def stem(word: String): String = {
    val b = new Buf(word)
    def ew(s: String) = b.endsWith(s)
    // postposition
    if (b.len > 5 && ew("دا")) b.len -= 2
    else if (b.len > 4 && ew("نا")) b.len -= 1
    else if (b.len > 6 && ew("ەوە")) b.len -= 3
    // possessive pronoun
    if (b.len > 6 && (ew("مان") || ew("یان") ||
        ew("تان"))) b.len -= 3
    // ezafe / definiteness / number markers: first match wins
    if (b.len > 6 && ew("ێکی")) b.len -= 3                 // indef. sg. ezafe
    else if (b.len > 7 && ew("یەکی")) b.len -= 4
    else if (b.len > 5 && ew("ێک")) b.len -= 2                  // indef. sg.
    else if (b.len > 6 && ew("یەک")) b.len -= 3
    else if (b.len > 6 && ew("ەکە")) b.len -= 3            // def. sg.
    else if (b.len > 5 && ew("کە")) b.len -= 2
    else if (b.len > 7 && ew("ەکان")) b.len -= 4      // def. pl.
    else if (b.len > 6 && ew("کان")) b.len -= 3
    else if (b.len > 7 && ew("یانی")) b.len -= 4      // indef. pl. ezafe
    else if (b.len > 6 && ew("انی")) b.len -= 3
    else if (b.len > 6 && ew("یان")) b.len -= 3            // indef. pl.
    else if (b.len > 5 && ew("ان")) b.len -= 2
    else if (b.len > 7 && ew("یانە")) b.len -= 4      // demonstrative pl.
    else if (b.len > 6 && ew("انە")) b.len -= 3
    else if (b.len > 5 && (ew("ایە") || ew("ەیە"))) b.len -= 2
    else if (b.len > 4 && ew("ە")) b.len -= 1
    else if (b.len > 4 && ew("ی")) b.len -= 1                        // abs. sg. ezafe
    b.result
  }

  def normStem(word: String): String = stem(normalize(word))
}

/** Hindi orthographic normalization (Devanagari unification per the
  * reference's composed/decomposed and long/short-vowel conflations) +
  * the Ramanathan & Rao lightweight suffix stemmer ("A Lightweight
  * Stemmer for Hindi", EACL 2003 workshop). Reference behavior:
  * Analysis/Hi/HindiNormalizer.cs, Analysis/Hi/HindiStemmer.cs. */
object HindiStem {
  import StemBuf.Buf

  def normalize(word: String): String = {
    val b = new Buf(word)
    var i = 0
    while (i < b.len) {
      b.s(i) match {
        case 'न' => // dead na (na + virama) → anusvara
          if (i + 1 < b.len && b.s(i + 1) == '्') {
            b.s(i) = 'ं'; b.delete(i + 1)
          }
        case 'ँ' => b.s(i) = 'ं' // candrabindu → bindu
        case '़' => b.delete(i); i -= 1 // nukta
        case 'ऩ' => b.s(i) = 'न'
        case 'ऱ' => b.s(i) = 'र'
        case 'ऴ' => b.s(i) = 'ळ'
        case 'क़' => b.s(i) = 'क'
        case 'ख़' => b.s(i) = 'ख'
        case 'ग़' => b.s(i) = 'ग'
        case 'ज़' => b.s(i) = 'ज'
        case 'ड़' => b.s(i) = 'ड'
        case 'ढ़' => b.s(i) = 'ढ'
        case 'फ़' => b.s(i) = 'फ'
        case 'य़' => b.s(i) = 'य'
        case '‍' | '‌' => b.delete(i); i -= 1 // zwj/zwnj
        case '्' => b.delete(i); i -= 1 // virama
        case 'ॅ' | 'ॆ' => b.s(i) = 'े' // chandra/short e
        case 'ॉ' | 'ॊ' => b.s(i) = 'ो'
        case 'ऍ' | 'ऎ' => b.s(i) = 'ए'
        case 'ऑ' | 'ऒ' => b.s(i) = 'ओ'
        case 'ॲ' => b.s(i) = 'अ'
        case 'आ' => b.s(i) = 'अ' // long → short independent vowels
        case 'ई' => b.s(i) = 'इ'
        case 'ऊ' => b.s(i) = 'उ'
        case 'ॠ' => b.s(i) = 'ऋ'
        case 'ॡ' => b.s(i) = 'ऌ'
        case 'ऐ' => b.s(i) = 'ए'
        case 'औ' => b.s(i) = 'ओ'
        case 'ी' => b.s(i) = 'ि' // long → short dependent vowels
        case 'ू' => b.s(i) = 'ु'
        case 'ॄ' => b.s(i) = 'ृ'
        case 'ॣ' => b.s(i) = 'ॢ'
        case 'ै' => b.s(i) = 'े'
        case 'ौ' => b.s(i) = 'ो'
        case _ =>
      }
      i += 1
    }
    b.result
  }

  // Ramanathan & Rao suffix classes, longest first (strip k chars when
  // length > k+1 and a class-k suffix matches)
  private val S5 = Array("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
  private val S4 = Array("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
    "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ", "ियों", "ियां")
  private val S3 = Array("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
    "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं", "ुआं")
  private val S2 = Array("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
    "ती", "ता", "ाँ", "ां", "ों", "ें")
  private val S1 = Array("ो", "े", "ू", "ु", "ी", "ि", "ा")

  def stem(word: String): String = {
    val b = new Buf(word)
    val tables = Array(S5, S4, S3, S2, S1)
    var k = 5
    var ti = 0
    while (ti < tables.length) {
      if (b.len > k + 1 && tables(ti).exists(b.endsWith)) {
        b.len -= k
        return b.result
      }
      k -= 1; ti += 1
    }
    b.result
  }

  def normStem(word: String): String = stem(normalize(word))
}

/** Bulgarian light stemming (Nakov, "BulStem: Design and evaluation of
  * inflectional stemmer for Bulgarian", as reduced to the light
  * noun/adjective rules): definite-article and plural removal with
  * ц/з/с ↔ к/г/х and е↔я alternation repair, final-vowel drop, ен→н and
  * ъN→N contractions. Reference behavior: Analysis/Bg/BulgarianStemmer.cs. */
object BulgarianStem {
  import StemBuf.Buf

  def stem(word: String): String = {
    val b = new Buf(word)
    def ew(s: String) = b.endsWith(s)
    if (b.len < 4) return b.result
    if (b.len > 5 && ew("ища")) { b.len -= 3; return b.result }
    // definite article
    if (b.len > 6 && ew("ият")) b.len -= 3
    else if (b.len > 5 && (ew("ът") || ew("то") || ew("те") || ew("та") || ew("ия"))) b.len -= 2
    else if (b.len > 4 && ew("ят")) b.len -= 2
    // plural
    if (b.len > 6 && ew("овци")) b.len -= 3
    else if (b.len > 6 && ew("ове")) b.len -= 3
    else if (b.len > 6 && ew("еве")) { b.s(b.len - 3) = 'й'; b.len -= 2 }
    else if (b.len > 5 && ew("ища")) b.len -= 3
    else if (b.len > 5 && ew("та")) b.len -= 2
    else if (b.len > 5 && ew("ци")) { b.s(b.len - 2) = 'к'; b.len -= 1 }
    else if (b.len > 5 && ew("зи")) { b.s(b.len - 2) = 'г'; b.len -= 1 }
    else if (b.len > 5 && b.s(b.len - 3) == 'е' && b.s(b.len - 1) == 'и') {
      b.s(b.len - 3) = 'я'; b.len -= 1
    }
    else if (b.len > 4 && ew("си")) { b.s(b.len - 2) = 'х'; b.len -= 1 }
    else if (b.len > 4 && ew("и")) b.len -= 1
    // final vowels
    if (b.len > 3) {
      if (ew("я")) b.len -= 1
      if (ew("а") || ew("о") || ew("е")) b.len -= 1
    }
    if (b.len > 4 && ew("ен")) { b.s(b.len - 2) = 'н'; b.len -= 1 }
    if (b.len > 5 && b.s(b.len - 2) == 'ъ') { b.s(b.len - 2) = b.s(b.len - 1); b.len -= 1 }
    b.result
  }
}

/** Czech light stemming (Dolamic & Savoy, "Indexing and stemming
  * approaches for the Czech language", IPM 2009 — the light variant):
  * case-suffix removal, possessive -ov/-in/-ův removal, and final
  * palatalization normalization (čt→ck, št→sk, c/č→k, z/ž→h, e-elision,
  * ů→o). Expects lowercased input with diacritics intact. Reference
  * behavior: Analysis/Cz/CzechStemmer.cs. */
object CzechStem {
  import StemBuf.Buf

  private val Case3 = Array("ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte",
    "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata", "aty",
    "ých", "ama", "ami", "ové", "ovi", "ými")
  private val Case2 = Array("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us",
    "ým", "mi", "ou")
  private val FinalVowels = "aeiouůyáéíýě"

  def stem(word: String): String = {
    val b = new Buf(word)
    def ew(s: String) = b.endsWith(s)
    // case endings
    if (b.len > 7 && ew("atech")) b.len -= 5
    else if (b.len > 6 && (ew("ětem") || ew("etem") || ew("atům"))) b.len -= 4
    else if (b.len > 5 && Case3.exists(ew)) b.len -= 3
    else if (b.len > 4 && Case2.exists(ew)) b.len -= 2
    else if (b.len > 3 && FinalVowels.indexOf(b.s(b.len - 1).toInt) >= 0) b.len -= 1
    // possessives
    if (b.len > 5 && (ew("ov") || ew("in") || ew("ův"))) b.len -= 2
    // palatalization normalization
    if (b.len > 0) {
      if (ew("čt")) { b.s(b.len - 2) = 'c'; b.s(b.len - 1) = 'k' }
      else if (ew("št")) { b.s(b.len - 2) = 's'; b.s(b.len - 1) = 'k' }
      else b.s(b.len - 1) match {
        case 'c' | 'č' => b.s(b.len - 1) = 'k'
        case 'z' | 'ž' => b.s(b.len - 1) = 'h'
        case _ =>
          if (b.len > 1 && b.s(b.len - 2) == 'e') { b.s(b.len - 2) = b.s(b.len - 1); b.len -= 1 }
          else if (b.len > 2 && b.s(b.len - 2) == 'ů') b.s(b.len - 2) = 'o'
      }
    }
    b.result
  }
}

/** Latvian light stemming (light version of Kreslins' "A stemming
  * algorithm for Latvian": noun/adjective case+number endings only,
  * with vowel-count guards and un-palatalization of the stem-final
  * consonant cluster when declension II/V/VI endings come off).
  * Reference behavior: Analysis/Lv/LatvianStemmer.cs. */
object LatvianStem {
  import StemBuf.Buf

  private final case class Affix(affix: String, vc: Int, palatalizes: Boolean)
  private val Affixes = Array(
    Affix("ajiem", 3, false), Affix("ajai", 3, false),
    Affix("ajam", 2, false), Affix("ajām", 2, false),
    Affix("ajos", 2, false), Affix("ajās", 2, false),
    Affix("iem", 2, true), Affix("ajā", 2, false),
    Affix("ais", 2, false), Affix("ai", 2, false),
    Affix("ei", 2, false), Affix("ām", 1, false),
    Affix("am", 1, false), Affix("ēm", 1, false),
    Affix("īm", 1, false), Affix("im", 1, false),
    Affix("um", 1, false), Affix("us", 1, true),
    Affix("as", 1, false), Affix("ās", 1, false),
    Affix("es", 1, false), Affix("os", 1, true),
    Affix("ij", 1, false), Affix("īs", 1, false),
    Affix("ēs", 1, false), Affix("is", 1, false),
    Affix("ie", 1, false), Affix("u", 1, true),
    Affix("a", 1, true), Affix("i", 1, true),
    Affix("e", 1, false), Affix("ā", 1, false),
    Affix("ē", 1, false), Affix("ī", 1, false),
    Affix("ū", 1, false), Affix("o", 1, false),
    Affix("s", 0, false), Affix("š", 0, false))
  private val Vowels = "aeiouāīēū"

  def stem(word: String): String = {
    val b = new Buf(word)
    var vowels = 0
    var i = 0
    while (i < b.len) {
      if (Vowels.indexOf(b.s(i).toInt) >= 0) vowels += 1
      i += 1
    }
    var ai = 0
    while (ai < Affixes.length) {
      val a = Affixes(ai)
      if (vowels > a.vc && b.len >= a.affix.length + 3 && b.endsWith(a.affix)) {
        b.len -= a.affix.length
        if (a.palatalizes) unpalatalize(b)
        return b.result
      }
      ai += 1
    }
    b.result
  }

  private def unpalatalize(b: Buf): Unit = {
    def ew(s: String) = b.endsWith(s)
    // the char just removed: -u endings enable the 2nd/5th/6th-declension
    // genitive-plural repairs
    if (b.s(b.len) == 'u') {
      if (ew("kš")) { b.len += 1; b.s(b.len - 2) = 's'; b.s(b.len - 1) = 't'; return }
      if (ew("ņņ")) { b.s(b.len - 2) = 'n'; b.s(b.len - 1) = 'n'; return }
    }
    if (ew("pj") || ew("bj") || ew("mj") || ew("vj")) b.len -= 1
    else if (ew("šņ")) { b.s(b.len - 2) = 's'; b.s(b.len - 1) = 'n' }
    else if (ew("žņ")) { b.s(b.len - 2) = 'z'; b.s(b.len - 1) = 'n' }
    else if (ew("šļ")) { b.s(b.len - 2) = 's'; b.s(b.len - 1) = 'l' }
    else if (ew("žļ")) { b.s(b.len - 2) = 'z'; b.s(b.len - 1) = 'l' }
    else if (ew("ļņ")) { b.s(b.len - 2) = 'l'; b.s(b.len - 1) = 'n' }
    else if (ew("ļļ")) { b.s(b.len - 2) = 'l'; b.s(b.len - 1) = 'l' }
    else if (b.s(b.len - 1) == 'č') b.s(b.len - 1) = 'c'
    else if (b.s(b.len - 1) == 'ļ') b.s(b.len - 1) = 'l'
    else if (b.s(b.len - 1) == 'ņ') b.s(b.len - 1) = 'n'
  }
}

/** Indonesian stemming (Tala, "A Study of Stemming Effects on Information
  * Retrieval in Bahasa Indonesia", 2003): particle and possessive-pronoun
  * suffixes, then first/second-order derivational prefixes and
  * derivational suffixes, with the removed-prefix flags blocking the
  * illegal prefix+suffix combinations and a syllable (vowel-count) floor
  * of 2. Reference behavior: Analysis/Id/IndonesianStemmer.cs. */
object IndonesianStem {
  import StemBuf.Buf

  private final val RemovedKe = 1
  private final val RemovedPeng = 2
  private final val RemovedDi = 4
  private final val RemovedMeng = 8
  private final val RemovedTer = 16
  private final val RemovedBer = 32
  private final val RemovedPe = 64

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  def stem(word: String): String = stem(word, stemDerivational = true)

  def stem(word: String, stemDerivational: Boolean): String = {
    val b = new Buf(word)
    var syllables = 0
    var i = 0
    while (i < b.len) { if (isVowel(b.s(i))) syllables += 1; i += 1 }
    var flags = 0

    def ew(s: String) = b.endsWith(s)
    def sw(s: String) = b.startsWith(s)

    def removeParticle(): Unit =
      if (ew("kah") || ew("lah") || ew("pun")) { syllables -= 1; b.len -= 3 }
    def removePossessive(): Unit = {
      if (ew("ku") || ew("mu")) { syllables -= 1; b.len -= 2 }
      else if (ew("nya")) { syllables -= 1; b.len -= 3 }
    }
    def removeFirstOrderPrefix(): Unit = {
      if (sw("meng")) { flags |= RemovedMeng; syllables -= 1; b.deleteN(0, 4) }
      else if (sw("meny") && b.len > 4 && isVowel(b.s(4))) {
        flags |= RemovedMeng; b.s(3) = 's'; syllables -= 1; b.deleteN(0, 3)
      }
      else if (sw("men")) { flags |= RemovedMeng; syllables -= 1; b.deleteN(0, 3) }
      else if (sw("mem")) { flags |= RemovedMeng; syllables -= 1; b.deleteN(0, 3) }
      else if (sw("me")) { flags |= RemovedMeng; syllables -= 1; b.deleteN(0, 2) }
      else if (sw("peng")) { flags |= RemovedPeng; syllables -= 1; b.deleteN(0, 4) }
      else if (sw("peny") && b.len > 4 && isVowel(b.s(4))) {
        flags |= RemovedPeng; b.s(3) = 's'; syllables -= 1; b.deleteN(0, 3)
      }
      else if (sw("peny")) { flags |= RemovedPeng; syllables -= 1; b.deleteN(0, 4) }
      else if (sw("pen") && b.len > 3 && isVowel(b.s(3))) {
        flags |= RemovedPeng; b.s(2) = 't'; syllables -= 1; b.deleteN(0, 2)
      }
      else if (sw("pen")) { flags |= RemovedPeng; syllables -= 1; b.deleteN(0, 3) }
      else if (sw("pem")) { flags |= RemovedPeng; syllables -= 1; b.deleteN(0, 3) }
      else if (sw("di")) { flags |= RemovedDi; syllables -= 1; b.deleteN(0, 2) }
      else if (sw("ter")) { flags |= RemovedTer; syllables -= 1; b.deleteN(0, 3) }
      else if (sw("ke")) { flags |= RemovedKe; syllables -= 1; b.deleteN(0, 2) }
    }
    def removeSecondOrderPrefix(): Unit = {
      if (sw("ber")) { flags |= RemovedBer; syllables -= 1; b.deleteN(0, 3) }
      else if (b.len == 7 && sw("belajar")) { flags |= RemovedBer; syllables -= 1; b.deleteN(0, 3) }
      else if (sw("be") && b.len > 4 && !isVowel(b.s(2)) && b.s(3) == 'e' && b.s(4) == 'r') {
        flags |= RemovedBer; syllables -= 1; b.deleteN(0, 2)
      }
      else if (sw("per")) { syllables -= 1; b.deleteN(0, 3) }
      else if (b.len == 7 && sw("pelajar")) { syllables -= 1; b.deleteN(0, 3) }
      else if (sw("pe")) { flags |= RemovedPe; syllables -= 1; b.deleteN(0, 2) }
    }
    def removeSuffix(): Unit = {
      if (ew("kan") && (flags & RemovedKe) == 0 && (flags & RemovedPeng) == 0 &&
          (flags & RemovedPe) == 0) { syllables -= 1; b.len -= 3 }
      else if (ew("an") && (flags & RemovedDi) == 0 && (flags & RemovedMeng) == 0 &&
          (flags & RemovedTer) == 0) { syllables -= 1; b.len -= 2 }
      else if (ew("i") && !ew("si") && (flags & RemovedBer) == 0 &&
          (flags & RemovedKe) == 0 && (flags & RemovedPeng) == 0) { syllables -= 1; b.len -= 1 }
    }

    if (syllables > 2) removeParticle()
    if (syllables > 2) removePossessive()
    if (stemDerivational) {
      var old = b.len
      if (syllables > 2) removeFirstOrderPrefix()
      if (old != b.len) { // a first-order rule fired
        old = b.len
        if (syllables > 2) removeSuffix()
        if (old != b.len && syllables > 2) removeSecondOrderPrefix()
      } else {
        if (syllables > 2) removeSecondOrderPrefix()
        if (syllables > 2) removeSuffix()
      }
    }
    b.result
  }
}

/** Irish lowercasing: before lowercasing, hyphenate the n-/t- prothetic
  * prefix off an uppercase-vowel-initial word (nAthair → n-athair) so the
  * mutation prefix and the base word separate the way Irish orthography
  * writes them in lowercase. Reference behavior:
  * Analysis/Ga/IrishLowerCaseFilter.cs. */
object IrishLowerCase {
  private def isUpperVowel(c: Char): Boolean = c match {
    case 'A' | 'E' | 'I' | 'O' | 'U' | 'Á' | 'É' | 'Í' |
         'Ó' | 'Ú' => true
    case _ => false
  }

  def apply(word: String): String = {
    val prefixed =
      if (word.length > 1 && (word.charAt(0) == 'n' || word.charAt(0) == 't') &&
          isUpperVowel(word.charAt(1)))
        word.substring(0, 1) + "-" + word.substring(1)
      else word
    Analyzer.lowerCase(prefixed)
  }
}

/** Turkish-aware lowercasing (reference:
  * Analysis/Tr/TurkishLowerCaseFilter.cs): the dotted/dotless i rules the
  * generic per-codepoint lowercase gets wrong for Turkish — İ (U+0130)
  * lowers to i, I lowers to ı (U+0131) UNLESS a combining dot above
  * follows through non-spacing marks (then I→i and the dot is consumed);
  * a combining dot above in i-or-after state is deleted. Everything else
  * is per-codepoint Character.toLowerCase, exactly the reference loop. */
object TurkishLowerCase {
  private final val DotAbove = 0x0307

  def apply(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var iOrAfter = false
    var i = 0
    while (i < s.length) {
      val ch = s.codePointAt(i)
      iOrAfter = ch == 'I' ||
        (iOrAfter && Character.getType(ch) == Character.NON_SPACING_MARK)
      var handled = false
      if (iOrAfter) {
        if (ch == DotAbove) handled = true // delete the dot
        else if (ch == 'I') {
          if (isBeforeDot(s, i + 1)) sb.append('i') // iOrAfter stays true
          else { sb.append('ı'); iOrAfter = false }
          handled = true
        }
      }
      if (!handled) {
        if (ch == 0x0130) sb.append('i') // İ — tr-culture lowercase
        else sb.appendCodePoint(Character.toLowerCase(ch))
      }
      i += Character.charCount(ch)
    }
    sb.toString
  }

  private def isBeforeDot(s: String, pos: Int): Boolean = {
    var i = pos
    while (i < s.length) {
      val ch = s.codePointAt(i)
      if (Character.getType(ch) != Character.NON_SPACING_MARK) return false
      if (ch == DotAbove) return true
      i += Character.charCount(ch)
    }
    false
  }
}
