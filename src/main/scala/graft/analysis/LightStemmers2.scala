package graft.analysis

/** Second light-stemmer pack: the remaining per-language algorithmic
  * stemmers/normalizers from Analysis.Common (reference files cited per
  * function; each is the published per-language algorithm restated as a
  * pure String function — the round-3 LightStemmers pattern). Brazilian
  * Portuguese is deliberately not duplicated here: the Snowball pt
  * stemmer plus the pt light/minimal stemmers already cover the family,
  * and [[Rslp]] supplies the engine for the published RSLP tables. */
object LightStemmers2 {

  private def pre(s: String, suf: String): String =
    s.substring(0, s.length - suf.length)

  /** BulgarianStemmer (Analysis/Bg/BulgarianStemmer.cs:32-176): the
    * Savoy/Nakov light algorithm — article removal, plural removal,
    * final-vowel trims, ен→н, and the ъN→N contraction; words under 4
    * chars pass through. */
  def bulgarian(w0: String): String = {
    if (w0.length < 4) return w0
    var w = w0
    if (w.length > 5 && w.endsWith("ища")) return pre(w, "ища")
    // article
    if (w.length > 6 && w.endsWith("ият")) w = pre(w, "ият")
    else if (w.length > 5 && (w.endsWith("ът") || w.endsWith("то") ||
      w.endsWith("те") || w.endsWith("та") || w.endsWith("ия"))) w = w.dropRight(2)
    else if (w.length > 4 && w.endsWith("ят")) w = pre(w, "ят")
    // plural
    if (w.length > 6 && w.endsWith("овци")) w = w.dropRight(3)
    else if (w.length > 6 && w.endsWith("ове")) w = w.dropRight(3)
    else if (w.length > 6 && w.endsWith("еве")) w = w.dropRight(3) + "й"
    else if (w.length > 5 && w.endsWith("ища")) w = w.dropRight(3)
    else if (w.length > 5 && w.endsWith("та")) w = w.dropRight(2)
    else if (w.length > 5 && w.endsWith("ци")) w = w.dropRight(2) + "к"
    else if (w.length > 5 && w.endsWith("зи")) w = w.dropRight(2) + "г"
    else if (w.length > 5 && w.charAt(w.length - 3) == 'е' && w.last == 'и')
      w = w.substring(0, w.length - 3) + "я" + w.charAt(w.length - 2)
    else if (w.length > 4 && w.endsWith("си")) w = w.dropRight(2) + "х"
    else if (w.length > 4 && w.endsWith("и")) w = w.dropRight(1)
    // final vowels
    if (w.length > 3) {
      if (w.endsWith("я")) w = w.dropRight(1)
      if (w.endsWith("а") || w.endsWith("о") || w.endsWith("е")) w = w.dropRight(1)
    }
    if (w.length > 4 && w.endsWith("ен")) w = w.dropRight(2) + "н"
    if (w.length > 5 && w.charAt(w.length - 2) == 'ъ')
      w = w.substring(0, w.length - 2) + w.last
    w
  }

  private val CzechCase3 = Seq("ech", "ich", "ích", "ého", "ěmi", "emi",
    "ému", "ěte", "ete", "ěti", "eti", "ího", "iho", "ími", "ímu", "imu",
    "ách", "ata", "aty", "ých", "ama", "ami", "ové", "ovi", "ými")
  private val CzechCase2 = Seq("em", "es", "ém", "ím", "ům", "at", "ám",
    "os", "us", "ým", "mi", "ou")

  /** CzechStemmer (Analysis/Cz/CzechStemmer.cs:30-145): the Dolamic &
    * Savoy light algorithm — case endings, possessives (ov/in/ův), then
    * the palatalization normalizations (čt→ck, št→sk, c/č→k, z/ž→h,
    * e-deletion, ů→o). */
  def czech(w0: String): String = {
    var w = w0
    // case
    if (w.length > 7 && w.endsWith("atech")) w = w.dropRight(5)
    else if (w.length > 6 && (w.endsWith("ětem") || w.endsWith("etem") ||
      w.endsWith("atům"))) w = w.dropRight(4)
    else if (w.length > 5 && CzechCase3.exists(w.endsWith)) w = w.dropRight(3)
    else if (w.length > 4 && CzechCase2.exists(w.endsWith)) w = w.dropRight(2)
    else if (w.length > 3 && "aeiouůyáéíýě".indexOf(w.last) >= 0) w = w.dropRight(1)
    // possessives
    if (w.length > 5 && (w.endsWith("ov") || w.endsWith("in") || w.endsWith("ův")))
      w = w.dropRight(2)
    // normalize
    if (w.nonEmpty) {
      if (w.endsWith("čt")) w = w.dropRight(2) + "ck"
      else if (w.endsWith("št")) w = w.dropRight(2) + "sk"
      else if (w.last == 'c' || w.last == 'č') w = w.dropRight(1) + "k"
      else if (w.last == 'z' || w.last == 'ž') w = w.dropRight(1) + "h"
      else if (w.length > 1 && w.charAt(w.length - 2) == 'e')
        w = w.substring(0, w.length - 2) + w.last
      else if (w.length > 2 && w.charAt(w.length - 2) == 'ů')
        w = w.substring(0, w.length - 2) + "o" + w.last
    }
    w
  }

  /** HindiNormalizer (Analysis/Hi/HindiNormalizer.cs:55-185): the
    * Devanagari orthographic normalizations of Larkey/Connell/Croft —
    * nukta decompositions folded, chandrabindu→anusvara, न+virama→
    * anusvara, virama/ZWJ/ZWNJ deleted, vowel-sign and independent-vowel
    * length folds. */
  def hindiNormalize(w: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      c match {
        case 'न' if i + 1 < w.length && w.charAt(i + 1) == '्' =>
          b.append('ं'); i += 1 // न+virama -> anusvara (virama eaten)
        case 'ँ' => b.append('ं')
        case '़' | '‍' | '‌' | '्' => // deleted
        case 'ऩ' => b.append('न')
        case 'ऱ' => b.append('र')
        case 'ऴ' => b.append('ळ')
        case 'क़' => b.append('क')
        case 'ख़' => b.append('ख')
        case 'ग़' => b.append('ग')
        case 'ज़' => b.append('ज')
        case 'ड़' => b.append('ड')
        case 'ढ़' => b.append('ढ')
        case 'फ़' => b.append('फ')
        case 'य़' => b.append('य')
        case 'ॅ' | 'ॆ' => b.append('े')
        case 'ॉ' | 'ॊ' => b.append('ो')
        case 'ऍ' | 'ऎ' => b.append('ए')
        case 'ऑ' | 'ऒ' => b.append('ओ')
        case 'ॲ' | 'आ' => b.append('अ')
        case 'ई' => b.append('इ')
        case 'ऊ' => b.append('उ')
        case 'ॠ' => b.append('ऋ')
        case 'ॡ' => b.append('ऌ')
        case 'ऐ' => b.append('ए')
        case 'औ' => b.append('ओ')
        case 'ी' => b.append('ि')
        case 'ू' => b.append('ु')
        case 'ॄ' => b.append('ृ')
        case 'ॣ' => b.append('ॢ')
        case 'ै' => b.append('े')
        case 'ौ' => b.append('ो')
        case other => b.append(other)
      }
      i += 1
    }
    b.toString
  }

  private val Hindi5 = Seq("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
  private val Hindi4 = Seq("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी",
    "एंगे", "ेंगे", "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं",
    "ियाँ", "ियों", "ियां")
  private val Hindi3 = Seq("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी",
    "ोगे", "ाने", "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं",
    "ुएं", "ुआं")
  private val Hindi2 = Seq("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना",
    "ते", "ीं", "ती", "ता", "ाँ", "ां", "ों", "ें")
  private val Hindi1 = Seq("ो", "े", "ू", "ु", "ी", "ि", "ा")

  /** HindiStemmer (Analysis/Hi/HindiStemmer.cs:32-65): the lightweight
    * Devanagari suffix strip of Ramanathan & Rao, longest-first over the
    * published 5/4/3/2/1-char suffix tables. */
  def hindi(w: String): String = {
    if (w.length > 6 && Hindi5.exists(w.endsWith)) return w.dropRight(5)
    if (w.length > 5 && Hindi4.exists(w.endsWith)) return w.dropRight(4)
    if (w.length > 4 && Hindi3.exists(w.endsWith)) return w.dropRight(3)
    if (w.length > 3 && Hindi2.exists(w.endsWith)) return w.dropRight(2)
    if (w.length > 2 && Hindi1.exists(w.endsWith)) return w.dropRight(1)
    w
  }

  // (affix, vowel count of the affix, fires palatalization)
  private val LatvianAffixes: Seq[(String, Int, Boolean)] = Seq(
    ("ajiem", 3, false), ("ajai", 3, false), ("ajam", 2, false),
    ("ajām", 2, false), ("ajos", 2, false), ("ajās", 2, false),
    ("iem", 2, true), ("ajā", 2, false), ("ais", 2, false), ("ai", 2, false),
    ("ei", 2, false), ("ām", 1, false), ("am", 1, false), ("ēm", 1, false),
    ("īm", 1, false), ("im", 1, false), ("um", 1, false), ("us", 1, true),
    ("as", 1, false), ("ās", 1, false), ("es", 1, false), ("os", 1, true),
    ("ij", 1, false), ("īs", 1, false), ("ēs", 1, false), ("is", 1, false),
    ("ie", 1, false), ("u", 1, true), ("a", 1, true), ("i", 1, true),
    ("e", 1, false), ("ā", 1, false), ("ē", 1, false), ("ī", 1, false),
    ("ū", 1, false), ("o", 1, false), ("s", 0, false), ("š", 0, false))

  /** LatvianStemmer (Analysis/Lv/LatvianStemmer.cs:30-210): the light
    * stemmer of Rīgas Tehniskā universitāte origin — first affix (in
    * table order) whose removal leaves more vowels than the affix
    * itself contains and at least 3 chars fires; palatalizing affixes
    * then undo consonant mutations (kš→kst over the cut, ņņ→nn, Cj→C,
    * šņ→sn, žņ→zn, šļ→sl, žļ→zl, ļņ→ln, ļļ→ll, č→c, ļ→l, ņ→n). */
  def latvian(w0: String): String = {
    val numVowels = w0.count(c => "aeiouāīēū".indexOf(c) >= 0)
    for ((affix, vc, pal) <- LatvianAffixes) {
      if (numVowels > vc && w0.length >= affix.length + 3 && w0.endsWith(affix)) {
        val w = pre(w0, affix)
        return if (pal) unpalatalize(w, w0) else w
      }
    }
    w0
  }

  private def unpalatalize(w: String, orig: String): String = {
    // the cut character survives in `orig` (the reference reads s[len])
    val cut = orig.charAt(w.length)
    if (cut == 'u') {
      if (w.endsWith("kš")) return w.dropRight(2) + "kst"
      if (w.endsWith("ņņ")) return w.dropRight(2) + "nn"
    }
    if (w.endsWith("pj") || w.endsWith("bj") || w.endsWith("mj") || w.endsWith("vj"))
      w.dropRight(1)
    else if (w.endsWith("šņ")) w.dropRight(2) + "sn"
    else if (w.endsWith("žņ")) w.dropRight(2) + "zn"
    else if (w.endsWith("šļ")) w.dropRight(2) + "sl"
    else if (w.endsWith("žļ")) w.dropRight(2) + "zl"
    else if (w.endsWith("ļņ")) w.dropRight(2) + "ln"
    else if (w.endsWith("ļļ")) w.dropRight(2) + "ll"
    else if (w.endsWith("č")) w.dropRight(1) + "c"
    else if (w.endsWith("ļ")) w.dropRight(1) + "l"
    else if (w.endsWith("ņ")) w.dropRight(1) + "n"
    else w
  }

  /** SoraniNormalizer (Analysis/Ckb/SoraniNormalizer.cs:55-130): Kurdish
    * orthographic normalization — yeh forms → farsi yeh, kaf → keheh,
    * heh-before-ZWNJ and final/teh-marbuta heh → ae, doachashmee → heh,
    * initial reh → rreh, rreh-above → rreh, tatweel + harakat deleted. */
  def soraniNormalize(w: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      c match {
        case 'ي' | 'ى' => b.append('ی')
        case 'ك' => b.append('ک')
        case '‌' =>
          if (b.nonEmpty && b.last == 'ه') b.setCharAt(b.length - 1, 'ە')
        case 'ه' if i == w.length - 1 => b.append('ە')
        case 'ة' => b.append('ە')
        case 'ھ' => b.append('ه')
        case 'ر' if b.isEmpty => b.append('ڕ')
        case 'ڒ' => b.append('ڕ')
        case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ'
           | 'ُ' | 'ِ' | 'ّ' | 'ْ' => // deleted
        case other => b.append(other)
      }
      i += 1
    }
    b.toString
  }

  /** SoraniStemmer (Analysis/Ckb/SoraniStemmer.cs:35-130): strip ONE
    * postposition (دا, نا, ەوە), then ONE plural/possessive
    * (مان/یان/تان), then the first matching indefinite/definite/plural
    * marker in the reference's exact cascade. Note the نا rule removes a
    * single char (the reference's len--). */
  def sorani(w0: String): String = {
    var w = w0
    if (w.length > 5 && w.endsWith("دا")) w = w.dropRight(2)
    else if (w.length > 4 && w.endsWith("نا")) w = w.dropRight(1)
    else if (w.length > 6 && w.endsWith("ەوە")) w = w.dropRight(3)
    if (w.length > 6 && (w.endsWith("مان") || w.endsWith("یان") || w.endsWith("تان")))
      w = w.dropRight(3)
    if (w.length > 6 && w.endsWith("ێکی")) w.dropRight(3)
    else if (w.length > 7 && w.endsWith("یەکی")) w.dropRight(4)
    else if (w.length > 5 && w.endsWith("ێک")) w.dropRight(2)
    else if (w.length > 6 && w.endsWith("یەک")) w.dropRight(3)
    else if (w.length > 6 && w.endsWith("ەکە")) w.dropRight(3)
    else if (w.length > 5 && w.endsWith("کە")) w.dropRight(2)
    else if (w.length > 7 && w.endsWith("ەکان")) w.dropRight(4)
    else if (w.length > 6 && w.endsWith("کان")) w.dropRight(3)
    else if (w.length > 7 && w.endsWith("یانی")) w.dropRight(4)
    else if (w.length > 6 && w.endsWith("انی")) w.dropRight(3)
    else if (w.length > 6 && w.endsWith("یان")) w.dropRight(3)
    else if (w.length > 5 && w.endsWith("ان")) w.dropRight(2)
    else if (w.length > 7 && w.endsWith("یانە")) w.dropRight(4)
    else if (w.length > 6 && w.endsWith("انە")) w.dropRight(3)
    else if (w.length > 5 && (w.endsWith("ایە") || w.endsWith("ەیە"))) w.dropRight(2)
    else if (w.length > 4 && w.endsWith("ە")) w.dropRight(1)
    else if (w.length > 4 && w.endsWith("ی")) w.dropRight(1)
    else w
  }

  /** IndonesianStemmer (Analysis/Id/IndonesianStemmer.cs:43-330): the
    * Asian/Tan/Lee algorithm for Bahasa — inflectional particles
    * (kah/lah/pun) and possessives (ku/mu/nya) at >2 syllables, then the
    * derivational dance: first-order prefix (meng/meny→s/men/mem/me/
    * peng/peny→s/peny/pen→t/pen/pem/di/ter/ke), and EITHER (suffix then
    * second-order prefix) when a first-order rule fired, OR
    * (second-order prefix ber/belajar/beCer/per/pelajar/pe then suffix)
    * when none did; suffixes kan/an/i are blocked by the recorded
    * prefix flags (the kan-after-ke/peng/pe, an-after-di/meng/ter,
    * i-after-ber/ke/peng and the -si guard). */
  def indonesian(w0: String, stemDerivational: Boolean = true): String = {
    var w = w0
    var syl = w.count(c => "aeiou".indexOf(c) >= 0)
    var flags = 0
    val KE = 1; val PENG = 2; val DI = 4; val MENG = 8; val TER = 16
    val BER = 32; val PE = 64
    def vowel(c: Char) = "aeiou".indexOf(c) >= 0

    if (syl > 2 && (w.endsWith("kah") || w.endsWith("lah") || w.endsWith("pun"))) {
      syl -= 1; w = w.dropRight(3)
    }
    if (syl > 2) {
      if (w.endsWith("ku") || w.endsWith("mu")) { syl -= 1; w = w.dropRight(2) }
      else if (w.endsWith("nya")) { syl -= 1; w = w.dropRight(3) }
    }
    if (!stemDerivational) return w

    def firstOrder(): Boolean = {
      val before = w
      if (w.startsWith("meng")) { flags |= MENG; w = w.drop(4) }
      else if (w.startsWith("meny") && w.length > 4 && vowel(w.charAt(4))) {
        flags |= MENG; w = "s" + w.drop(4)
      }
      else if (w.startsWith("men")) { flags |= MENG; w = w.drop(3) }
      else if (w.startsWith("mem")) { flags |= MENG; w = w.drop(3) }
      else if (w.startsWith("me")) { flags |= MENG; w = w.drop(2) }
      else if (w.startsWith("peng")) { flags |= PENG; w = w.drop(4) }
      else if (w.startsWith("peny") && w.length > 4 && vowel(w.charAt(4))) {
        flags |= PENG; w = "s" + w.drop(4)
      }
      else if (w.startsWith("peny")) { flags |= PENG; w = w.drop(4) }
      else if (w.startsWith("pen") && w.length > 3 && vowel(w.charAt(3))) {
        flags |= PENG; w = "t" + w.drop(3)
      }
      else if (w.startsWith("pen")) { flags |= PENG; w = w.drop(3) }
      else if (w.startsWith("pem")) { flags |= PENG; w = w.drop(3) }
      else if (w.startsWith("di")) { flags |= DI; w = w.drop(2) }
      else if (w.startsWith("ter")) { flags |= TER; w = w.drop(3) }
      else if (w.startsWith("ke")) { flags |= KE; w = w.drop(2) }
      if (w ne before) syl -= 1
      w ne before
    }
    def secondOrder(): Unit = {
      if (w.startsWith("ber")) { flags |= BER; syl -= 1; w = w.drop(3) }
      else if (w == "belajar") { flags |= BER; syl -= 1; w = w.drop(3) }
      else if (w.startsWith("be") && w.length > 4 && !vowel(w.charAt(2)) &&
               w.charAt(3) == 'e' && w.charAt(4) == 'r') {
        flags |= BER; syl -= 1; w = w.drop(2)
      }
      else if (w.startsWith("per")) { syl -= 1; w = w.drop(3) }
      else if (w == "pelajar") { syl -= 1; w = w.drop(3) }
      else if (w.startsWith("pe")) { flags |= PE; syl -= 1; w = w.drop(2) }
    }
    def suffix(): Unit = {
      if (w.endsWith("kan") && (flags & KE) == 0 && (flags & PENG) == 0 &&
          (flags & PE) == 0) { syl -= 1; w = w.dropRight(3) }
      else if (w.endsWith("an") && (flags & DI) == 0 && (flags & MENG) == 0 &&
               (flags & TER) == 0) { syl -= 1; w = w.dropRight(2) }
      else if (w.endsWith("i") && !w.endsWith("si") && (flags & BER) == 0 &&
               (flags & KE) == 0 && (flags & PENG) == 0) {
        syl -= 1; w = w.dropRight(1)
      }
    }
    val fired = if (syl > 2) firstOrder() else false
    if (fired) {
      val before = w
      if (syl > 2) suffix()
      if (w ne before) { if (syl > 2) secondOrder() }
    } else {
      if (syl > 2) secondOrder()
      if (syl > 2) suffix()
    }
    w
  }
}
