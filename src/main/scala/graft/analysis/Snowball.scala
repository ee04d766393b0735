package graft.analysis

/** Snowball stemmers for Russian, Portuguese, Italian and Dutch — the
  * published Snowball algorithms (M.F. Porter, "Snowball: A language for
  * stemming algorithms", 2001; snowballstem.org per-language definitions),
  * the same algorithm family the reference ships as generated Tartarus
  * classes (Tartarus/Snowball/Ext/RussianStemmer.cs, PortugueseStemmer.cs,
  * ItalianStemmer.cs, DutchStemmer.cs — consulted for the exact
  * era-correct suffix tables and step conditions; re-expressed here as
  * direct per-step functions over strings rather than a stack-machine
  * interpreter). Validated against the official Snowball voc/output
  * vectors (StemmerSpec, ~160k words across the four languages).
  *
  * Shared Snowball notions:
  *  - R1: region after the first non-vowel following a vowel; R2: the
  *    same, computed within R1; RV: language-specific verb region.
  *  - Backward "among" matching picks the LONGEST listed suffix that
  *    matches; if that entry's condition (R1/R2/RV/preceding-letter)
  *    fails, the step fails without falling back to a shorter entry —
  *    except where the match itself is region-limited (Russian's whole
  *    backward pass, the Romance verb-suffix steps), where a too-long
  *    candidate simply never matches and shorter entries stay in play.
  *  - Deletions are destructive: a step that deletes and THEN fails a
  *    later test keeps the deletion (Snowball `do`/`try` semantics).
  *
  * All stemmers expect lowercased input (they run after LowerCaseFilter).
  */
private[analysis] object SnowballRegions {

  /** Position after the first [vowel followed by non-vowel] at or after
    * `from`; `n` if not found. This is Snowball's `gopast v gopast non-v`. */
  def regionAfterVC(w: String, from: Int, isVowel: Char => Boolean): Int = {
    val n = w.length
    var i = from
    while (i < n && !isVowel(w.charAt(i))) i += 1
    if (i >= n) return n
    i += 1 // passed the vowel
    while (i < n && isVowel(w.charAt(i))) i += 1
    if (i >= n) return n
    i + 1 // passed the non-vowel
  }

  /** Romance RV (Spanish/Portuguese/Italian definition): if the second
    * letter is a consonant, after the next following vowel; if the first
    * two letters are vowels, after the next consonant; otherwise
    * (consonant-vowel) after the third letter. End of word if absent. */
  def romanceRV(w: String, isVowel: Char => Boolean): Int = {
    val n = w.length
    if (n < 2) return n
    def goPast(from: Int, in: Boolean): Int = { // position after first char with isVowel==in
      var i = from
      while (i < n && isVowel(w.charAt(i)) != in) i += 1
      if (i >= n) n else i + 1
    }
    if (isVowel(w.charAt(0))) {
      if (!isVowel(w.charAt(1))) goPast(2, in = true)
      else goPast(2, in = false)
    } else {
      if (!isVowel(w.charAt(1))) goPast(2, in = true)
      else if (n >= 3) 3
      else n
    }
  }

  /** Longest suffix of `w` from `entries` whose start index is >= `lb`
    * (the backward matching limit; 0 = unrestricted). `entries` must be
    * pre-sorted by length descending. Returns (suffix, code). */
  def amongB(w: String, lb: Int, entries: Array[(String, Int)]): Option[(String, Int)] = {
    var i = 0
    while (i < entries.length) {
      val (s, code) = entries(i)
      if (w.length - s.length >= lb && w.endsWith(s)) return Some((s, code))
      i += 1
    }
    None
  }

  def sortDesc(entries: Seq[(String, Int)]): Array[(String, Int)] =
    entries.sortBy(-_._1.length).toArray
}

/** Russian Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * RussianStemmer.cs; published russian.sbl). Steps, all confined to RV
  * (the region after the first vowel): perfective gerund OR
  * (reflexive?, adjectival|verb|noun); drop final и; derivational
  * ост/ость in R2; tidy (undouble нн, strip superlative ейш/ейше then
  * undouble, drop soft sign). */
object SnowballRussian {
  import SnowballRegions._

  private val V = "аеиоуыэюя".toSet
  private def isV(c: Char) = V(c)

  // group 1 entries require а/я immediately before (left in place)
  private val Gerund = sortDesc(Seq(
    "в" -> 1, "вши" -> 1, "вшись" -> 1,
    "ив" -> 2, "ыв" -> 2, "ивши" -> 2, "ывши" -> 2, "ившись" -> 2, "ывшись" -> 2))
  private val Adjective = sortDesc(Seq(
    "ее", "ие", "ое", "ые", "ими", "ыми", "ей", "ий", "ой", "ый", "ем", "им",
    "ом", "ым", "его", "ого", "ему", "ому", "их", "ых", "ею", "ою", "ую", "юю",
    "ая", "яя").map(_ -> 1))
  private val Participle = sortDesc(Seq(
    "ем" -> 1, "нн" -> 1, "вш" -> 1, "щ" -> 1, "ющ" -> 1,
    "ивш" -> 2, "ывш" -> 2, "ующ" -> 2))
  private val Verb = sortDesc(Seq(
    "ла" -> 1, "на" -> 1, "ете" -> 1, "йте" -> 1, "ли" -> 1, "й" -> 1, "л" -> 1,
    "ем" -> 1, "н" -> 1, "ло" -> 1, "но" -> 1, "ет" -> 1, "ют" -> 1, "ны" -> 1,
    "ть" -> 1, "ешь" -> 1, "нно" -> 1,
    "ила" -> 2, "ыла" -> 2, "ена" -> 2, "ейте" -> 2, "уйте" -> 2, "ите" -> 2,
    "или" -> 2, "ыли" -> 2, "ей" -> 2, "уй" -> 2, "ил" -> 2, "ыл" -> 2,
    "им" -> 2, "ым" -> 2, "ен" -> 2, "ило" -> 2, "ыло" -> 2, "ено" -> 2,
    "ят" -> 2, "ует" -> 2, "уют" -> 2, "ит" -> 2, "ыт" -> 2, "ены" -> 2,
    "ить" -> 2, "ыть" -> 2, "ишь" -> 2, "ю" -> 2, "ую" -> 2))
  private val Noun = sortDesc(Seq(
    "а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами", "еи", "ии", "и",
    "ией", "ей", "ой", "ий", "й", "иям", "ям", "ием", "ем", "ам", "ом", "о",
    "у", "ах", "иях", "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я")
    .map(_ -> 1))
  private val Derivational = sortDesc(Seq("ост" -> 1, "ость" -> 1))
  private val Tidy = sortDesc(Seq("ейше" -> 1, "ейш" -> 1, "н" -> 2, "ь" -> 3))

  def stem(word: String): String = {
    var w = word
    val n = w.length
    // mark regions: pV after first vowel; p2 after the second
    // vowel-nonvowel sequence past pV
    var i = 0
    while (i < n && !isV(w.charAt(i))) i += 1
    if (i >= n) return w // no vowel: RV empty, nothing ever matches
    val pV = i + 1
    i += 1
    while (i < n && isV(w.charAt(i))) i += 1
    var p2 = n
    if (i < n) {
      i += 1 // passed the non-vowel: that's p1 (unused by Russian)
      p2 = regionAfterVC(w, i, isV)
    }

    // within-RV grouped among (gerund/participle/verb tables): code 1
    // entries need а/я immediately before (left in place)
    def groupDel(entries: Array[(String, Int)]): Boolean =
      amongB(w, pV, entries) match {
        case Some((s, 1)) =>
          val j = w.length - s.length - 1
          if (j >= pV && (w.charAt(j) == 'а' || w.charAt(j) == 'я')) {
            w = w.substring(0, w.length - s.length); true
          } else false
        case Some((s, _)) => w = w.substring(0, w.length - s.length); true
        case None => false
      }
    // plain within-RV delete (adjective/noun tables)
    def plainDel(entries: Array[(String, Int)]): Boolean =
      amongB(w, pV, entries) match {
        case Some((s, _)) => w = w.substring(0, w.length - s.length); true
        case None => false
      }

    // step 1: perfective gerund, else (reflexive?, adjectival|verb|noun)
    if (!groupDel(Gerund)) {
      amongB(w, pV, Array("ся" -> 1, "сь" -> 1)).foreach { case (s, _) =>
        w = w.substring(0, w.length - s.length)
      }
      val adjectival = if (plainDel(Adjective)) {
        groupDel(Participle) // try; failure keeps the adjective removal
        true
      } else false
      if (!adjectival && !groupDel(Verb)) plainDel(Noun)
    }

    // step 2: final и
    if (w.endsWith("и") && w.length - 1 >= pV) w = w.substring(0, w.length - 1)

    // step 3: derivational, in R2
    amongB(w, pV, Derivational).foreach { case (s, _) =>
      if (w.length - s.length >= p2) w = w.substring(0, w.length - s.length)
    }

    // step 4: tidy up
    amongB(w, pV, Tidy) match {
      case Some((s, 1)) => // superlative; then undouble нн
        w = w.substring(0, w.length - s.length)
        if (w.endsWith("нн") && w.length - 2 >= pV) w = w.substring(0, w.length - 1)
      case Some((_, 2)) => // matched final н: undouble only if нн
        if (w.endsWith("нн") && w.length - 2 >= pV) w = w.substring(0, w.length - 1)
      case Some((_, 3)) => w = w.substring(0, w.length - 1) // soft sign
      case _ =>
    }
    w
  }
}

/** Portuguese Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * PortugueseStemmer.cs; published portuguese.sbl). Nasal vowels ã/õ are
  * spelt a~/o~ during the algorithm. */
object SnowballPortuguese {
  import SnowballRegions._

  private val V = "aeiouáéíóúâêô".toSet
  private def isV(c: Char) = V(c)

  private val Standard = sortDesc(Seq(
    "eza" -> 1, "ezas" -> 1, "ico" -> 1, "ica" -> 1, "icos" -> 1, "icas" -> 1,
    "ismo" -> 1, "ismos" -> 1, "ável" -> 1, "ível" -> 1, "ista" -> 1,
    "istas" -> 1, "oso" -> 1, "osa" -> 1, "osos" -> 1, "osas" -> 1,
    "amento" -> 1, "amentos" -> 1, "imento" -> 1, "imentos" -> 1,
    "adora" -> 1, "ador" -> 1, "aça~o" -> 1, "adoras" -> 1, "adores" -> 1,
    "aço~es" -> 1, "ante" -> 1, "antes" -> 1, "ância" -> 1,
    "logía" -> 2, "logías" -> 2,
    "ución" -> 3, "uciones" -> 3,
    "ência" -> 4, "ências" -> 4,
    "amente" -> 5,
    "mente" -> 6,
    "idade" -> 7, "idades" -> 7,
    "iva" -> 8, "ivo" -> 8, "ivas" -> 8, "ivos" -> 8,
    "ira" -> 9, "iras" -> 9))
  private val Verb = sortDesc(Seq(
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira", "ava",
    "asse", "esse", "isse", "aste", "este", "iste", "ei", "arei", "erei",
    "irei", "am", "iam", "ariam", "eriam", "iriam", "aram", "eram", "iram",
    "avam", "em", "arem", "erem", "irem", "assem", "essem", "issem", "ado",
    "ido", "ando", "endo", "indo", "ara~o", "era~o", "ira~o", "ar", "er",
    "ir", "as", "adas", "idas", "ias", "arias", "erias", "irias", "aras",
    "eras", "iras", "avas", "es", "ardes", "erdes", "irdes", "ares", "eres",
    "ires", "asses", "esses", "isses", "astes", "estes", "istes", "is",
    "ais", "eis", "areis", "ereis", "ireis", "áreis", "éreis", "íreis",
    "ásseis", "ésseis", "ísseis", "áveis", "íeis", "aríeis", "eríeis",
    "iríeis", "ados", "idos", "amos", "áramos", "éramos", "íramos",
    "ávamos", "íamos", "aríamos", "eríamos", "iríamos", "emos", "aremos",
    "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos",
    "ermos", "irmos", "ámos", "arás", "erás", "irás", "eu", "iu", "ou",
    "ará", "erá", "irá").map(_ -> 1))
  private val Residual = sortDesc(
    Seq("os", "a", "i", "o", "á", "í", "ó").map(_ -> 1))

  def stem(word: String): String = {
    var w = word.replace("ã", "a~").replace("õ", "o~")
    val rv = romanceRV(w, isV)
    val r1 = regionAfterVC(w, 0, isV)
    val r2 = regionAfterVC(w, r1, isV)

    def inR2(sufLen: Int) = w.length - sufLen >= r2
    def inRV(sufLen: Int) = w.length - sufLen >= rv
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    // step 1: standard suffix (longest match; failed condition = step fails)
    def standardSuffix(): Boolean = amongB(w, 0, Standard) match {
      case Some((s, code)) => code match {
        case 1 => if (inR2(s.length)) { del(s.length); true } else false
        case 2 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "log"; true } else false
        case 3 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "u"; true } else false
        case 4 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "ente"; true } else false
        case 5 => // amente: R1 delete; then ic/ad/os/iv chains in R2
          if (w.length - s.length < r1) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("ic" -> 0, "ad" -> 0, "os" -> 0, "iv" -> 1))) match {
              case Some((p, c)) if inR2(p.length) =>
                del(p.length)
                if (c == 1 && w.endsWith("at") && inR2(2)) del(2)
              case _ =>
            }
            true
          }
        case 6 => // mente: R2 delete; then ante/avel/ível in R2
          if (!inR2(s.length)) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("ante" -> 1, "avel" -> 1, "ível" -> 1))) match {
              case Some((p, _)) if inR2(p.length) => del(p.length)
              case _ =>
            }
            true
          }
        case 7 => // idade(s): R2 delete; then ic/abil/iv in R2
          if (!inR2(s.length)) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("ic" -> 1, "abil" -> 1, "iv" -> 1))) match {
              case Some((p, _)) if inR2(p.length) => del(p.length)
              case _ =>
            }
            true
          }
        case 8 => // iva/ivo(s): R2 delete; then at in R2
          if (!inR2(s.length)) false
          else {
            del(s.length)
            if (w.endsWith("at") && inR2(2)) del(2)
            true
          }
        case 9 => // (e)ira(s) -> (e)ir: RV, preceded by e
          if (inRV(s.length) && w.length - s.length >= 1 &&
              w.charAt(w.length - s.length - 1) == 'e') {
            w = w.substring(0, w.length - s.length) + "ir"; true
          } else false
      }
      case None => false
    }

    // step 2: verb suffixes, matched entirely within RV
    def verbSuffix(): Boolean = amongB(w, rv, Verb) match {
      case Some((s, _)) => del(s.length); true
      case None => false
    }

    val s12 = standardSuffix() || verbSuffix()
    if (s12) {
      // step 3: final i preceded by c (the era's definition carries no RV
      // guard here — PortugueseStemmer.cs r_stem step 3)
      if (w.endsWith("ci")) del(1)
    } else {
      // step 4: residual suffix in RV
      amongB(w, 0, Residual) match {
        case Some((s, _)) if inRV(s.length) => del(s.length)
        case _ =>
      }
    }

    // step 5: residual form
    amongB(w, 0, sortDesc(Seq("e" -> 1, "é" -> 1, "ê" -> 1, "ç" -> 2))) match {
      case Some((s, 1)) if inRV(s.length) =>
        del(s.length)
        if (w.endsWith("gu") && inRV(1)) del(1)
        else if (w.endsWith("ci") && inRV(1)) del(1)
      case Some((_, 2)) => w = w.substring(0, w.length - 1) + "c"
      case _ =>
    }

    w.replace("a~", "ã").replace("o~", "õ")
  }
}

/** Italian Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * ItalianStemmer.cs; published italian.sbl). The prelude marks u-after-q
  * and u/i between vowels as U/I so they are consonants for the steps. */
object SnowballItalian {
  import SnowballRegions._

  private val V = "aeiouàèìòù".toSet
  private def isV(c: Char) = V(c)

  private val Pronoun = sortDesc(Seq(
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo", "tene",
    "cela", "cele", "celi", "celo", "cene", "vela", "vele", "veli", "velo",
    "vene").map(_ -> 1))
  private val PronounPrev = sortDesc(Seq(
    "ando" -> 1, "endo" -> 1, "ar" -> 2, "er" -> 2, "ir" -> 2))
  private val Standard = sortDesc(Seq(
    "anza" -> 1, "anze" -> 1, "ico" -> 1, "ici" -> 1, "ica" -> 1, "ice" -> 1,
    "iche" -> 1, "ichi" -> 1, "ismo" -> 1, "ismi" -> 1, "abile" -> 1,
    "abili" -> 1, "ibile" -> 1, "ibili" -> 1, "ista" -> 1, "iste" -> 1,
    "isti" -> 1, "istà" -> 1, "istè" -> 1, "istì" -> 1, "oso" -> 1,
    "osi" -> 1, "osa" -> 1, "ose" -> 1, "mente" -> 1, "atrice" -> 1,
    "atrici" -> 1, "ante" -> 1, "anti" -> 1,
    "azione" -> 2, "azioni" -> 2, "atore" -> 2, "atori" -> 2,
    "logia" -> 3, "logie" -> 3,
    "uzione" -> 4, "uzioni" -> 4, "usione" -> 4, "usioni" -> 4,
    "enza" -> 5, "enze" -> 5,
    "amento" -> 6, "amenti" -> 6, "imento" -> 6, "imenti" -> 6,
    "amente" -> 7,
    "ità" -> 8,
    "ivo" -> 9, "ivi" -> 9, "iva" -> 9, "ive" -> 9))
  private val Verb = sortDesc(Seq(
    "isca", "enda", "ata", "ita", "uta", "ava", "eva", "iva", "erebbe",
    "irebbe", "isce", "ende", "are", "ere", "ire", "asse", "ate", "avate",
    "evate", "ivate", "ete", "erete", "irete", "ite", "ereste", "ireste",
    "ute", "erai", "irai", "isci", "endi", "erei", "irei", "assi", "ati",
    "iti", "eresti", "iresti", "uti", "avi", "evi", "ivi", "isco", "ando",
    "endo", "Yamo", "iamo", "avamo", "evamo", "ivamo", "eremo", "iremo",
    "assimo", "ammo", "emmo", "eremmo", "iremmo", "immo", "ano", "iscano",
    "avano", "evano", "ivano", "eranno", "iranno", "ono", "iscono",
    "arono", "erono", "irono", "erebbero", "irebbero", "assero", "essero",
    "issero", "ato", "ito", "uto", "avo", "evo", "ivo", "ar", "ir", "erà",
    "irà", "erò", "irò").map(_ -> 1))

  private def prelude(word: String): String = {
    val w = word.map {
      case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
      case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
    }.replace("qu", "qU")
    val a = w.toCharArray
    var i = 1
    while (i < a.length - 1) {
      if (isV(a(i - 1)) && isV(a(i + 1))) {
        if (a(i) == 'u') a(i) = 'U' else if (a(i) == 'i') a(i) = 'I'
      }
      i += 1
    }
    new String(a)
  }

  def stem(word: String): String = {
    var w = prelude(word)
    val rv = romanceRV(w, isV)
    val r1 = regionAfterVC(w, 0, isV)
    val r2 = regionAfterVC(w, r1, isV)

    def inR2(k: Int) = w.length - k >= r2
    def inRV(k: Int) = w.length - k >= rv
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    // step 0: attached pronoun — preceded by ando/endo (delete) or
    // ar/er/ir (replace with e), the preceding part in RV
    amongB(w, 0, Pronoun).foreach { case (p, _) =>
      val base = w.substring(0, w.length - p.length)
      amongB(base, 0, PronounPrev) match {
        case Some((q, code)) if base.length - q.length >= rv =>
          if (code == 1) w = base // ando/endo: drop the pronoun
          else w = base + "e" // ar/er/ir: pronoun becomes e
        case _ =>
      }
    }

    // step 1: standard suffixes
    def standardSuffix(): Boolean = amongB(w, 0, Standard) match {
      case Some((s, code)) => code match {
        case 1 => if (inR2(s.length)) { del(s.length); true } else false
        case 2 => // azione/atore family: R2 delete, then ic in R2
          if (!inR2(s.length)) false
          else { del(s.length); if (w.endsWith("ic") && inR2(2)) del(2); true }
        case 3 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "log"; true } else false
        case 4 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "u"; true } else false
        case 5 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "ente"; true } else false
        case 6 => if (inRV(s.length)) { del(s.length); true } else false // amento family
        case 7 => // amente: R1 delete; then iv(at)/os/ic/abil in R2
          if (w.length - s.length < r1) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("ic" -> 0, "abil" -> 0, "os" -> 0, "iv" -> 1))) match {
              case Some((p, c)) if inR2(p.length) =>
                del(p.length)
                if (c == 1 && w.endsWith("at") && inR2(2)) del(2)
              case _ =>
            }
            true
          }
        case 8 => // ità: R2 delete; then ic/abil/iv in R2
          if (!inR2(s.length)) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("ic" -> 1, "abil" -> 1, "iv" -> 1))) match {
              case Some((p, _)) if inR2(p.length) => del(p.length)
              case _ =>
            }
            true
          }
        case 9 => // ivo/ivi/iva/ive: R2 delete; then at in R2, then ic in R2
          if (!inR2(s.length)) false
          else {
            del(s.length)
            if (w.endsWith("at") && inR2(2)) {
              del(2)
              if (w.endsWith("ic") && inR2(2)) del(2)
            }
            true
          }
      }
      case None => false
    }

    // step 2: verb suffixes, matched entirely within RV
    def verbSuffix(): Boolean = amongB(w, rv, Verb) match {
      case Some((s, _)) => del(s.length); true
      case None => false
    }

    if (!standardSuffix()) verbSuffix()

    // step 3a: final vowel (and a preceding i), in RV
    val last = if (w.nonEmpty) w.charAt(w.length - 1) else ' '
    if ("aeioàèìò".indexOf(last.toInt) >= 0 && inRV(1)) {
      del(1)
      if (w.endsWith("i") && inRV(1)) del(1)
    }
    // step 3b: ch/gh -> c/g; the backward cursor sits before the c/g when
    // RV is tested, so the c/g itself must lie in RV
    if ((w.endsWith("ch") || w.endsWith("gh")) && inRV(2)) del(1)

    w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }
}

/** Spanish Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * SpanishStemmer.cs; published spanish.sbl). Attached pronouns come off
  * with their gerund/infinitive accent repaired; the postlude strips the
  * remaining acute accents. */
object SnowballSpanish {
  import SnowballRegions._

  private val V = "aeiouáéíóúü".toSet
  private def isV(c: Char) = V(c)

  private val Pronoun = sortDesc(Seq(
    "me", "se", "sela", "selo", "selas", "selos", "la", "le", "lo", "las",
    "les", "los", "nos").map(_ -> 1))
  private val PronounPrev = sortDesc(Seq(
    "iéndo" -> 1, "ándo" -> 2, "ár" -> 3, "ér" -> 4, "ír" -> 5,
    "ando" -> 6, "iendo" -> 6, "ar" -> 6, "er" -> 6, "ir" -> 6,
    "yendo" -> 7))
  private val Standard = sortDesc(Seq(
    "ica" -> 1, "icas" -> 1, "ico" -> 1, "icos" -> 1, "osa" -> 1,
    "osas" -> 1, "oso" -> 1, "osos" -> 1, "ista" -> 1, "istas" -> 1,
    "ismo" -> 1, "ismos" -> 1, "able" -> 1, "ables" -> 1, "ible" -> 1,
    "ibles" -> 1, "anza" -> 1, "anzas" -> 1, "amiento" -> 1,
    "amientos" -> 1, "imiento" -> 1, "imientos" -> 1,
    "ancia" -> 2, "ancias" -> 2, "adora" -> 2, "adoras" -> 2, "ador" -> 2,
    "adores" -> 2, "ante" -> 2, "antes" -> 2, "ación" -> 2,
    "aciones" -> 2,
    "logía" -> 3, "logías" -> 3,
    "ución" -> 4, "uciones" -> 4,
    "encia" -> 5, "encias" -> 5,
    "amente" -> 6,
    "mente" -> 7,
    "idad" -> 8, "idades" -> 8,
    "iva" -> 9, "ivas" -> 9, "ivo" -> 9, "ivos" -> 9))
  private val YVerb = sortDesc(Seq(
    "ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yas", "yes",
    "yais", "yamos", "yó").map(_ -> 1))
  private val Verb = sortDesc(Seq(
    "en" -> 1, "es" -> 1, "éis" -> 1, "emos" -> 1) ++ Seq(
    "aba", "ada", "ida", "ara", "iera", "ía", "aría", "ería", "iría",
    "ad", "ed", "id", "ase", "iese", "aste", "iste", "an", "aban", "aran",
    "ieran", "ían", "arían", "erían", "irían", "asen", "iesen", "aron",
    "ieron", "arán", "erán", "irán", "ado", "ido", "ando", "iendo", "ar",
    "er", "ir", "as", "abas", "adas", "idas", "aras", "ieras", "ías",
    "arías", "erías", "irías", "ases", "ieses", "abais", "arais",
    "ierais", "íais", "aríais", "eríais", "iríais", "aseis", "ieseis",
    "asteis", "isteis", "áis", "aréis", "eréis", "iréis", "ados", "idos",
    "amos", "aremos", "eremos", "iremos", "ábamos", "áramos", "iéramos",
    "íamos", "aríamos", "eríamos",
    "iríamos", "ásemos", "iésemos", "imos", "arás", "erás", "irás", "ís",
    "ará", "erá", "irá", "aré", "eré", "iré", "ió").map(_ -> 2))
  private val Residual = sortDesc(Seq(
    "a" -> 1, "o" -> 1, "os" -> 1, "á" -> 1, "í" -> 1, "ó" -> 1,
    "e" -> 2, "é" -> 2))

  def stem(word: String): String = {
    var w = word
    val rv = romanceRV(w, isV)
    val r1 = regionAfterVC(w, 0, isV)
    val r2 = regionAfterVC(w, r1, isV)

    def inR2(k: Int) = w.length - k >= r2
    def inRV(k: Int) = w.length - k >= rv
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    // step 0: attached pronoun; accented gerund/infinitive repaired
    amongB(w, 0, Pronoun).foreach { case (p, _) =>
      val base = w.substring(0, w.length - p.length)
      amongB(base, 0, PronounPrev) match {
        case Some((q, code)) if base.length - q.length >= rv =>
          val stemPart = base.substring(0, base.length - q.length)
          code match {
            case 1 => w = stemPart + "iendo"
            case 2 => w = stemPart + "ando"
            case 3 => w = stemPart + "ar"
            case 4 => w = stemPart + "er"
            case 5 => w = stemPart + "ir"
            case 6 => w = base
            case 7 => if (stemPart.nonEmpty && stemPart.last == 'u') w = base
          }
        case _ =>
      }
    }

    def standardSuffix(): Boolean = amongB(w, 0, Standard) match {
      case Some((s, code)) => code match {
        case 1 => if (inR2(s.length)) { del(s.length); true } else false
        case 2 => // ancia/ador/ante/ación family: R2 delete, then ic in R2
          if (!inR2(s.length)) false
          else { del(s.length); if (w.endsWith("ic") && inR2(2)) del(2); true }
        case 3 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "log"; true } else false
        case 4 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "u"; true } else false
        case 5 => if (inR2(s.length)) { w = w.substring(0, w.length - s.length) + "ente"; true } else false
        case 6 => // amente: R1 delete; then iv(at)/os/ic/ad in R2
          if (w.length - s.length < r1) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("ic" -> 0, "ad" -> 0, "os" -> 0, "iv" -> 1))) match {
              case Some((p, c)) if inR2(p.length) =>
                del(p.length)
                if (c == 1 && w.endsWith("at") && inR2(2)) del(2)
              case _ =>
            }
            true
          }
        case 7 => // mente: R2 delete; then able/ible/ante in R2
          if (!inR2(s.length)) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("able" -> 1, "ible" -> 1, "ante" -> 1))) match {
              case Some((p, _)) if inR2(p.length) => del(p.length)
              case _ =>
            }
            true
          }
        case 8 => // idad(es): R2 delete; then ic/abil/iv in R2
          if (!inR2(s.length)) false
          else {
            del(s.length)
            amongB(w, 0, sortDesc(Seq("ic" -> 1, "abil" -> 1, "iv" -> 1))) match {
              case Some((p, _)) if inR2(p.length) => del(p.length)
              case _ =>
            }
            true
          }
        case 9 => // iva/ivo(s): R2 delete; then at in R2
          if (!inR2(s.length)) false
          else { del(s.length); if (w.endsWith("at") && inR2(2)) del(2); true }
      }
      case None => false
    }

    // step 2a: y-verb forms matched within RV, preceded by u
    def yVerbSuffix(): Boolean = amongB(w, rv, YVerb) match {
      case Some((s, _)) if w.length - s.length >= 1 &&
          w.charAt(w.length - s.length - 1) == 'u' =>
        del(s.length); true
      case _ => false
    }

    // step 2b: verb suffixes matched within RV; en/es/éis/emos also eat
    // a preceding gu's u
    def verbSuffix(): Boolean = amongB(w, rv, Verb) match {
      case Some((s, code)) =>
        if (code == 1 && w.length - s.length >= 2 &&
            w.regionMatches(w.length - s.length - 2, "gu", 0, 2))
          del(s.length + 1)
        else del(s.length)
        true
      case None => false
    }

    if (!standardSuffix() && !yVerbSuffix()) verbSuffix()

    // step 3: residual vowel; e/é also eat a preceding gu's u if in RV
    amongB(w, 0, Residual) match {
      case Some((s, 1)) if inRV(s.length) => del(s.length)
      case Some((s, 2)) if inRV(s.length) =>
        del(s.length)
        if (w.endsWith("gu") && inRV(1)) del(1)
      case _ =>
    }

    w.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }
  }
}

/** Turkish Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * TurkishStemmer.cs; published turkish.sbl, E. Kapusuz Çilden). Purely
  * suffix-stripping with vowel-harmony checks and optional buffer
  * consonants (y/n/s) / buffer vowels (U = ı/i/u/ü): nominal-verb
  * suffix chains first, then noun suffix chains (with the recursive
  * ...ki chain), then postlude (final b/c/d/ğ devoicing reversal and a
  * harmony-matched buffer vowel appended to stems ending d/g).
  * Deletions are destructive mid-chain exactly as in the .sbl — a
  * failed continuation keeps earlier deletions. */
object SnowballTurkish {
  import SnowballRegions.sortDesc

  private val Vow = "aeıiouöü".toSet
  private val USet = "ıiuü".toSet
  private def harmonySet(c: Char): String = c match {
    case 'a' => "aıou"; case 'e' => "eiöü"; case 'ı' => "aı"
    case 'i' => "ei"; case 'o' => "ou"; case 'ö' => "öü"
    case 'u' => "ou"; case 'ü' => "öü"; case _ => ""
  }

  /** Suffix-vowel harmony: the last vowel of `s` (the suffix's own) must
    * be preceded, anywhere earlier, by a vowel from its harmony group. */
  private def harmony(s: String): Boolean = {
    var j = s.length - 1
    while (j >= 0 && !Vow(s.charAt(j))) j -= 1
    if (j < 0) return false
    val set = harmonySet(s.charAt(j))
    var i = j - 1
    while (i >= 0) {
      if (set.indexOf(s.charAt(i).toInt) >= 0) return true
      i -= 1
    }
    false
  }

  /** Optional buffer consonant `c` before an already-matched core at the
    * end of `s`: present -> must follow a vowel (consume it); absent ->
    * the char two back must be a vowel (consume nothing). */
  private def optCons(s: String, c: Char): Option[Int] =
    if (s.nonEmpty && s.last == c) {
      if (s.length >= 2 && Vow(s.charAt(s.length - 2))) Some(1) else None
    } else if (s.length >= 2 && Vow(s.charAt(s.length - 2))) Some(0)
    else None

  /** Optional buffer vowel (U = ı/i/u/ü): present -> must follow a
    * non-vowel; absent -> the char two back must be a non-vowel. */
  private def optU(s: String): Option[Int] =
    if (s.nonEmpty && USet(s.last)) {
      if (s.length >= 2 && !Vow(s.charAt(s.length - 2))) Some(1) else None
    } else if (s.length >= 2 && !Vow(s.charAt(s.length - 2))) Some(0)
    else None

  private def amongLen(s: String, entries: Array[String]): Option[Int] =
    entries.find(s.endsWith).map(_.length)
  private def tab(ss: String*): Array[String] =
    sortDesc(ss.map(_ -> 1)).map(_._1)

  private val Poss = tab("m", "n", "miz", "niz", "muz", "nuz", "müz",
    "nüz", "mız", "nız")
  private val LArI = tab("leri", "ları")
  private val NUt = tab("ni", "nu", "nü", "nı")
  private val NUn = tab("in", "un", "ün", "ın")
  private val YAt = tab("a", "e")
  private val NAt = tab("na", "ne")
  private val DAt = tab("da", "ta", "de", "te")
  private val NdA = tab("nda", "nde")
  private val DAn = tab("dan", "tan", "den", "ten")
  private val NdAn = tab("ndan", "nden")
  private val YlA = tab("la", "le")
  private val NcA = tab("ca", "ce")
  private val YUm = tab("im", "um", "üm", "ım")
  private val SUn = tab("sin", "sun", "sün", "sın")
  private val YUz = tab("iz", "uz", "üz", "ız")
  private val SUnUz = tab("siniz", "sunuz", "sünüz", "sınız")
  private val LAr = tab("lar", "ler")
  private val NUz = tab("niz", "nuz", "nüz", "nız")
  private val DUr = tab("dir", "tir", "dur", "tur", "dür", "tür", "dır",
    "tır")
  private val CAsInA = tab("casına", "cesine")
  private val YDU = tab("di", "ti", "dik", "tik", "duk", "tuk", "dük",
    "tük", "dık", "tık", "dim", "tim", "dum", "tum", "düm", "tüm", "dım",
    "tım", "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın", "du",
    "tu", "dü", "tü", "dı", "tı")
  private val YsA = tab("sa", "se", "sak", "sek", "sam", "sem", "san",
    "sen")
  private val YmUs = tab("miş", "muş", "müş", "mış")

  // mark_* : total suffix length at the end of `s`, or None
  private def mPoss(s: String) =
    amongLen(s, Poss).flatMap(k => optU(s.dropRight(k)).map(_ + k))
  private def mSU(s: String) =
    if (harmony(s) && s.nonEmpty && USet(s.last))
      optCons(s.dropRight(1), 's').map(_ + 1)
    else None
  private def mLArI(s: String) = amongLen(s, LArI)
  private def mYU(s: String) =
    if (harmony(s) && s.nonEmpty && USet(s.last))
      optCons(s.dropRight(1), 'y').map(_ + 1)
    else None
  private def mNU(s: String) = if (harmony(s)) amongLen(s, NUt) else None
  private def mNUn(s: String) =
    if (harmony(s))
      amongLen(s, NUn).flatMap(k => optCons(s.dropRight(k), 'n').map(_ + k))
    else None
  private def mYA(s: String) =
    if (harmony(s))
      amongLen(s, YAt).flatMap(k => optCons(s.dropRight(k), 'y').map(_ + k))
    else None
  private def mNA(s: String) = if (harmony(s)) amongLen(s, NAt) else None
  private def mDA(s: String) = if (harmony(s)) amongLen(s, DAt) else None
  private def mNdA(s: String) = if (harmony(s)) amongLen(s, NdA) else None
  private def mDAn(s: String) = if (harmony(s)) amongLen(s, DAn) else None
  private def mNdAn(s: String) = if (harmony(s)) amongLen(s, NdAn) else None
  private def mYlA(s: String) =
    if (harmony(s))
      amongLen(s, YlA).flatMap(k => optCons(s.dropRight(k), 'y').map(_ + k))
    else None
  private def mKi(s: String) = if (s.endsWith("ki")) Some(2) else None
  private def mNcA(s: String) =
    if (harmony(s))
      amongLen(s, NcA).flatMap(k => optCons(s.dropRight(k), 'n').map(_ + k))
    else None
  private def mYUm(s: String) =
    if (harmony(s))
      amongLen(s, YUm).flatMap(k => optCons(s.dropRight(k), 'y').map(_ + k))
    else None
  private def mSUn(s: String) = if (harmony(s)) amongLen(s, SUn) else None
  private def mYUz(s: String) =
    if (harmony(s))
      amongLen(s, YUz).flatMap(k => optCons(s.dropRight(k), 'y').map(_ + k))
    else None
  private def mSUnUz(s: String) = amongLen(s, SUnUz)
  private def mLAr(s: String) = if (harmony(s)) amongLen(s, LAr) else None
  private def mNUz(s: String) = if (harmony(s)) amongLen(s, NUz) else None
  private def mDUr(s: String) = if (harmony(s)) amongLen(s, DUr) else None
  private def mCAsInA(s: String) = amongLen(s, CAsInA)
  private def mYDU(s: String) =
    if (harmony(s))
      amongLen(s, YDU).flatMap(k => optCons(s.dropRight(k), 'y').map(_ + k))
    else None
  private def mYsA(s: String) =
    amongLen(s, YsA).flatMap(k => optCons(s.dropRight(k), 'y').map(_ + k))
  private def mYmUs(s: String) =
    if (harmony(s))
      amongLen(s, YmUs).flatMap(k => optCons(s.dropRight(k), 'y').map(_ + k))
    else None
  private def mYken(s: String) =
    if (s.endsWith("ken")) optCons(s.dropRight(3), 'y').map(_ + 3) else None

  /** The recursive …ki chain. Returns the rewritten string, or None if
    * it did not apply. `s` is the region ending at the current cursor. */
  private def chainKi(s: String): Option[String] = {
    if (!s.endsWith("ki")) return None
    val p = s.substring(0, s.length - 2)
    mDA(p) match {
      case Some(k) =>
        var cur = p.substring(0, p.length - k) // DA+ki deleted
        mLAr(cur) match {
          case Some(k2) =>
            cur = cur.substring(0, cur.length - k2)
            chainKi(cur).foreach(cur = _)
          case None =>
            mPoss(cur) match {
              case Some(k3) =>
                cur = cur.substring(0, cur.length - k3)
                mLAr(cur) match {
                  case Some(k4) =>
                    cur = cur.substring(0, cur.length - k4)
                    chainKi(cur).foreach(cur = _)
                  case None =>
                }
              case None =>
            }
        }
        return Some(cur)
      case None =>
    }
    mNUn(p) match {
      case Some(k) =>
        var cur = p.substring(0, p.length - k) // nUn+ki deleted
        mLArI(cur) match {
          case Some(k2) => cur = cur.substring(0, cur.length - k2)
          case None =>
            mPoss(cur).orElse(mSU(cur)) match {
              case Some(k3) =>
                cur = cur.substring(0, cur.length - k3)
                mLAr(cur) match {
                  case Some(k4) =>
                    cur = cur.substring(0, cur.length - k4)
                    chainKi(cur).foreach(cur = _)
                  case None =>
                }
              case None => chainKi(cur).foreach(cur = _)
            }
        }
        return Some(cur)
      case None =>
    }
    mNdA(p) match {
      case Some(k) =>
        val inner = p.substring(0, p.length - k)
        mLArI(inner) match {
          case Some(k2) => // lArI+ndA+ki all deleted
            return Some(inner.substring(0, inner.length - k2))
          case None =>
        }
        mSU(inner) match {
          case Some(k2) => // sU+ndA+ki deleted
            var cur = inner.substring(0, inner.length - k2)
            mLAr(cur) match {
              case Some(k3) =>
                cur = cur.substring(0, cur.length - k3)
                chainKi(cur).foreach(cur = _)
              case None =>
            }
            return Some(cur)
          case None =>
        }
        // recurse before the ndA — the ndA+ki stay in place (.sbl quirk)
        return chainKi(inner).map(_ + s.substring(inner.length))
      case None =>
    }
    None
  }

  private def nominalVerb(w0: String): (String, Boolean) = {
    var w = w0
    // branch 1: ymUs_/yDU/ysA/yken
    mYmUs(w).orElse(mYDU(w)).orElse(mYsA(w)).orElse(mYken(w)) match {
      case Some(k) => return (w.substring(0, w.length - k), true)
      case None =>
    }
    // branch 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_
    mCAsInA(w) match {
      case Some(k1) =>
        val b1 = w.substring(0, w.length - k1)
        val k2 = mSUnUz(b1).orElse(mLAr(b1)).orElse(mYUm(b1))
          .orElse(mSUn(b1)).orElse(mYUz(b1)).getOrElse(0)
        val b2 = b1.substring(0, b1.length - k2)
        mYmUs(b2) match {
          case Some(k3) => return (b2.substring(0, b2.length - k3), true)
          case None => // branch fails; nothing deleted yet
        }
      case None =>
    }
    // branch 3: lAr deleted; optional second suffix; stop noun stemming
    mLAr(w) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        mDUr(w).orElse(mYDU(w)).orElse(mYsA(w)).orElse(mYmUs(w))
          .foreach(n => w = w.substring(0, w.length - n))
        return (w, false)
      case None =>
    }
    // branch 4: nUz (yDU|ysA)
    mNUz(w) match {
      case Some(k1) =>
        val b1 = w.substring(0, w.length - k1)
        mYDU(b1).orElse(mYsA(b1)) match {
          case Some(k2) => return (b1.substring(0, b1.length - k2), true)
          case None =>
        }
      case None =>
    }
    // branch 5: (sUnUz|yUz|sUn|yUm) deleted; optional ymUs_
    mSUnUz(w).orElse(mYUz(w)).orElse(mSUn(w)).orElse(mYUm(w)) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        mYmUs(w).foreach(n => w = w.substring(0, w.length - n))
        return (w, true)
      case None =>
    }
    // branch 6: DUr deleted; then ((sUnUz|lAr|yUm|sUn|yUz|ε) ymUs_)?
    mDUr(w) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        val g = mSUnUz(w).orElse(mLAr(w)).orElse(mYUm(w)).orElse(mSUn(w))
          .orElse(mYUz(w)).getOrElse(0)
        val b = w.substring(0, w.length - g)
        mYmUs(b) match {
          case Some(k3) => w = b.substring(0, b.length - k3)
          case None => // continuation fails; DUr removal stands
        }
        return (w, true)
      case None =>
    }
    (w, true)
  }

  private def nounSuffixes(w0: String): String = {
    var w = w0
    // branch 1: lAr; then the ki chain
    mLAr(w) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        chainKi(w).foreach(w = _)
        return w
      case None =>
    }
    // branch 2: ncA; then (lArI | (poss|sU)(lAr chain?) | lAr chain!)
    mNcA(w) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        val afterNcA = w
        mLArI(w) match {
          case Some(k2) => return w.substring(0, w.length - k2)
          case None =>
        }
        mPoss(w).orElse(mSU(w)) match {
          case Some(k2) =>
            w = w.substring(0, w.length - k2)
            mLAr(w) match {
              case Some(k3) =>
                w = w.substring(0, w.length - k3)
                chainKi(w).foreach(w = _)
              case None =>
            }
            return w
          case None =>
        }
        mLAr(afterNcA) match {
          case Some(k2) =>
            val b = afterNcA.substring(0, afterNcA.length - k2)
            chainKi(b) match {
              case Some(res) => return res
              case None => return b // lAr removal persists, chain failed
            }
          case None =>
        }
        return afterNcA
      case None =>
    }
    // branch 3: (ndA|nA) — deleted only together with what follows
    mNdA(w).orElse(mNA(w)) match {
      case Some(k) =>
        val inner = w.substring(0, w.length - k)
        mLArI(inner) match {
          case Some(k2) => return inner.substring(0, inner.length - k2)
          case None =>
        }
        mSU(inner) match {
          case Some(k2) =>
            var cur = inner.substring(0, inner.length - k2)
            mLAr(cur) match {
              case Some(k3) =>
                cur = cur.substring(0, cur.length - k3)
                chainKi(cur).foreach(cur = _)
              case None =>
            }
            return cur
          case None =>
        }
        chainKi(inner) match {
          case Some(res) => return res + w.substring(inner.length)
          case None => // branch fails: fall through, nothing deleted
        }
      case None =>
    }
    // branch 4: (ndAn|nU) — sU-continuation deletes; lArI only marks
    mNdAn(w).orElse(mNU(w)) match {
      case Some(k) =>
        val inner = w.substring(0, w.length - k)
        mSU(inner) match {
          case Some(k2) =>
            var cur = inner.substring(0, inner.length - k2)
            mLAr(cur) match {
              case Some(k3) =>
                cur = cur.substring(0, cur.length - k3)
                chainKi(cur).foreach(cur = _)
              case None =>
            }
            return cur
          case None =>
        }
        if (mLArI(inner).isDefined) return w // matched, nothing deleted
      case None =>
    }
    // branch 5: DAn; then (poss(lAr chain?) | lAr(chain?) | chain!)
    mDAn(w) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        mPoss(w) match {
          case Some(k2) =>
            w = w.substring(0, w.length - k2)
            mLAr(w) match {
              case Some(k3) =>
                w = w.substring(0, w.length - k3)
                chainKi(w).foreach(w = _)
              case None =>
            }
            return w
          case None =>
        }
        mLAr(w) match {
          case Some(k2) =>
            w = w.substring(0, w.length - k2)
            chainKi(w).foreach(w = _)
            return w
          case None =>
        }
        chainKi(w).foreach(w = _)
        return w
      case None =>
    }
    // branch 6: (nUn|ylA); then (lAr chain! | (poss|sU)(lAr chain?) | chain!)
    mNUn(w).orElse(mYlA(w)) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        mLAr(w) match {
          case Some(k2) =>
            val b = w.substring(0, w.length - k2)
            chainKi(b) match {
              case Some(res) => return res
              case None => w = b // lAr removal persists; try next alt
            }
          case None =>
        }
        mPoss(w).orElse(mSU(w)) match {
          case Some(k2) =>
            w = w.substring(0, w.length - k2)
            mLAr(w) match {
              case Some(k3) =>
                w = w.substring(0, w.length - k3)
                chainKi(w).foreach(w = _)
              case None =>
            }
            return w
          case None =>
        }
        chainKi(w).foreach(w = _)
        return w
      case None =>
    }
    // branch 7: bare lArI
    mLArI(w) match {
      case Some(k) => return w.substring(0, w.length - k)
      case None =>
    }
    // branch 8: the ki chain alone
    chainKi(w) match {
      case Some(res) => return res
      case None =>
    }
    // branch 9: (DA|yU|yA); then ((poss lAr? | lAr) deleted, chain?)
    mDA(w).orElse(mYU(w)).orElse(mYA(w)) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        val marked = mPoss(w) match {
          case Some(k2) =>
            w = w.substring(0, w.length - k2)
            mLAr(w).foreach(n => w = w.substring(0, w.length - n))
            true
          case None =>
            mLAr(w) match {
              case Some(k2) => w = w.substring(0, w.length - k2); true
              case None => false
            }
        }
        if (marked) chainKi(w).foreach(w = _)
        return w
      case None =>
    }
    // branch 10: (poss|sU); then (lAr deleted, chain?)
    mPoss(w).orElse(mSU(w)) match {
      case Some(k) =>
        w = w.substring(0, w.length - k)
        mLAr(w) match {
          case Some(k2) =>
            w = w.substring(0, w.length - k2)
            chainKi(w).foreach(w = _)
          case None =>
        }
      case None =>
    }
    w
  }

  def stem(word: String): String = {
    if (word.count(Vow) < 2) return word // one syllable: untouched
    val (w1, continueNoun) = nominalVerb(word)
    if (!continueNoun) return w1
    var w = nounSuffixes(w1)
    // postlude
    if (w == "ad" || w == "soyad") return w // reserved words
    if (w.endsWith("d") || w.endsWith("g")) {
      var j = w.length - 1
      while (j >= 0 && !Vow(w.charAt(j))) j -= 1
      if (j >= 0) {
        val u = w.charAt(j) match {
          case 'a' | 'ı' => "ı"; case 'e' | 'i' => "i"
          case 'o' | 'u' => "u"; case _ => "ü"
        }
        w = w + u
      }
    }
    val last = if (w.nonEmpty) w.charAt(w.length - 1) else ' '
    last match {
      case 'b' => w = w.substring(0, w.length - 1) + "p"
      case 'c' => w = w.substring(0, w.length - 1) + "ç"
      case 'd' => w = w.substring(0, w.length - 1) + "t"
      case 'ğ' => w = w.substring(0, w.length - 1) + "k"
      case _ =>
    }
    w
  }
}

/** Finnish Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * FinnishStemmer.cs; published finnish.sbl). Agglutinative pipeline:
  * particle → possessive → case ending (sets the ending_removed flag) →
  * comparative endings → i-plural (if an ending came off) or t-plural →
  * tidy (long-vowel shortening, stray-vowel cleanup, final
  * double-consonant undoubling). */
object SnowballFinnish {
  import SnowballRegions._

  private val V1 = "aeiouyäö".toSet
  private val V2 = "aeiouäö".toSet
  private val AEI = "aeiä".toSet
  private val ParticleEnd = V1 ++ Set('n', 't')
  private def isV(c: Char) = V1(c)

  private val Particle = sortDesc(Seq(
    "pa" -> 1, "kaan" -> 1, "han" -> 1, "kin" -> 1, "hän" -> 1,
    "kään" -> 1, "ko" -> 1, "pä" -> 1, "kö" -> 1, "sti" -> 2))
  private val Poss = sortDesc(Seq(
    "si" -> 1, "ni" -> 2, "nsa" -> 3, "nsä" -> 3, "mme" -> 3, "nne" -> 3,
    "an" -> 4, "än" -> 5, "en" -> 6))
  private val An = Array("lla", "ssa", "lta", "sta", "na", "ta").map(_ -> 1)
  private val Aen = Array("llä", "ssä", "ltä", "stä", "nä", "tä").map(_ -> 1)
  private val Een = Array("lle", "ine").map(_ -> 1)
  private val Long = sortDesc(Seq(
    "aa", "ee", "ii", "oo", "uu", "ää", "öö").map(_ -> 1))
  // 11 = needs VI (…Vi before), 12 = needs LONG before; on a failed
  // condition the among backtracks to a shorter entry (Snowball
  // among-with-routine semantics)
  private val CaseEnding = sortDesc(Seq(
    "han" -> 1, "hen" -> 2, "hin" -> 3, "hon" -> 4, "hän" -> 5,
    "hön" -> 6, "n" -> 7, "a" -> 8, "ä" -> 8, "tta" -> 9, "ttä" -> 9,
    "den" -> 11, "tten" -> 11, "siin" -> 11, "seen" -> 12) ++
    Seq("lla", "na", "ssa", "ta", "lta", "sta", "lle", "ine", "ksi",
      "llä", "nä", "ssä", "tä", "ltä", "stä").map(_ -> 10))
  private val Other = sortDesc(Seq(
    "mma" -> 1, "mpa" -> 1, "mmi" -> 1, "mpi" -> 1, "mmä" -> 1,
    "mpä" -> 1) ++
    Seq("eja", "imma", "impa", "immi", "impi", "ejä", "immä", "impä")
      .map(_ -> 10))

  def stem(word: String): String = {
    var w = word
    val r1 = regionAfterVC(w, 0, isV)
    val r2 = regionAfterVC(w, r1, isV)
    var endingRemoved = false
    def del(k: Int): Unit = w = w.substring(0, w.length - k)
    def prev(k: Int): Int = w.length - k - 1 // index before a k-suffix

    // particle: matched within R1
    amongB(w, r1, Particle) match {
      case Some((s, 1)) =>
        val j = prev(s.length)
        if (j >= 0 && ParticleEnd(w.charAt(j))) del(s.length)
      case Some((s, 2)) => if (w.length - s.length >= r2) del(s.length)
      case _ =>
    }
    // possessive: matched within R1
    amongB(w, r1, Poss) match {
      case Some((s, 1)) => // si, not after k
        val j = prev(s.length)
        if (!(j >= 0 && w.charAt(j) == 'k')) del(s.length)
      case Some((s, 2)) => // ni; an exposed kse becomes ksi
        del(s.length)
        if (w.endsWith("kse")) w = w.substring(0, w.length - 3) + "ksi"
      case Some((s, 3)) => del(s.length)
      case Some((s, 4)) =>
        if (amongB(w.substring(0, w.length - s.length), 0, An).isDefined)
          del(s.length)
      case Some((s, 5)) =>
        if (amongB(w.substring(0, w.length - s.length), 0, Aen).isDefined)
          del(s.length)
      case Some((s, 6)) =>
        if (amongB(w.substring(0, w.length - s.length), 0, Een).isDefined)
          del(s.length)
      case _ =>
    }
    // case ending: matched within R1; success sets the flag. The
    // conditioned entries (den/tten/siin need …Vi before, seen needs a
    // long pair) are checked during matching — failure backtracks to a
    // shorter entry, all checks inside the R1 limit.
    def viAt(j: Int): Boolean =
      j - 1 >= r1 && w.charAt(j - 1) == 'i' && j - 2 >= r1 &&
        V2(w.charAt(j - 2))
    def longAt(j: Int): Boolean =
      j - 2 >= r1 && amongB(w.substring(0, j), r1, Long).isDefined
    CaseEnding.find { case (s, code) =>
      w.endsWith(s) && w.length - s.length >= r1 && (code match {
        case 11 => viAt(w.length - s.length)
        case 12 => longAt(w.length - s.length)
        case _ => true
      })
    } match {
      case Some((s, c)) if c == 11 || c == 12 =>
        w = w.substring(0, w.length - s.length); endingRemoved = true
      case Some((s, code)) =>
        val j = prev(s.length)
        def precededBy(c: Char) = j >= 0 && w.charAt(j) == c
        code match {
          case 1 => if (precededBy('a')) { del(s.length); endingRemoved = true }
          case 2 => if (precededBy('e')) { del(s.length); endingRemoved = true }
          case 3 => if (precededBy('i')) { del(s.length); endingRemoved = true }
          case 4 => if (precededBy('o')) { del(s.length); endingRemoved = true }
          case 5 => if (precededBy('ä')) { del(s.length); endingRemoved = true }
          case 6 => if (precededBy('ö')) { del(s.length); endingRemoved = true }
          case 7 => // n; a long pair or ie before it loses a vowel too
            del(s.length)
            val endsLong = amongB(w, 0, Long).isDefined
            if (endsLong || w.endsWith("ie")) del(1)
            endingRemoved = true
          case 8 => // a/ä after consonant+vowel
            if (j >= 1 && V1(w.charAt(j)) && !V1(w.charAt(j - 1))) {
              del(s.length); endingRemoved = true
            }
          case 9 => if (precededBy('e')) { del(s.length); endingRemoved = true }
          case 10 => del(s.length); endingRemoved = true
        }
      case _ =>
    }
    // comparative endings: matched within R2
    amongB(w, r2, Other) match {
      case Some((s, 1)) =>
        if (!(w.length - s.length >= 2 &&
            w.regionMatches(w.length - s.length - 2, "po", 0, 2)))
          del(s.length)
      case Some((s, 10)) => del(s.length)
      case _ =>
    }
    // i-plural (after a removed ending) or t-plural
    if (endingRemoved) {
      amongB(w, r1, Array("i" -> 1, "j" -> 1)) match {
        case Some((s, _)) => del(s.length)
        case None =>
      }
    } else {
      // t preceded by a vowel, both within R1
      if (w.endsWith("t") && w.length - 1 >= r1 && w.length - 2 >= r1 &&
          V1(w.charAt(w.length - 2))) {
        del(1)
        amongB(w, r2, sortDesc(Seq("mma" -> 1, "imma" -> 10))) match {
          case Some((s, 1)) =>
            if (!(w.length - s.length >= 2 &&
                w.regionMatches(w.length - s.length - 2, "po", 0, 2)))
              del(s.length)
          case Some((s, 10)) => del(s.length)
          case _ =>
        }
      }
    }
    // tidy — every touched char within R1 except the final undoubling
    if (amongB(w, r1, Long).isDefined) del(1)
    if (w.length >= 2 && w.length - 1 >= r1 && w.length - 2 >= r1 &&
        AEI(w.charAt(w.length - 1)) && !V1(w.charAt(w.length - 2))) del(1)
    if (w.endsWith("j") && w.length - 1 >= r1 && w.length - 2 >= r1 &&
        (w.charAt(w.length - 2) == 'o' || w.charAt(w.length - 2) == 'u'))
      del(1)
    if (w.endsWith("o") && w.length - 1 >= r1 && w.length - 2 >= r1 &&
        w.charAt(w.length - 2) == 'j') del(1)
    // final consonant (with only vowels after it) doubled -> single
    var c = w.length - 1
    while (c >= 0 && V1(w.charAt(c))) c -= 1
    if (c >= 1 && !V1(w.charAt(c)) && w.charAt(c - 1) == w.charAt(c))
      w = w.substring(0, c) + w.substring(c + 1)
    w
  }
}

/** Hungarian Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * HungarianStemmer.cs; published hungarian.sbl, õ/û era forms). R1
  * treats an initial consonant DIGRAPH (cs/dzs/gy/ly/ny/sz/ty/zs) as one
  * consonant; case endings strip with final á/é lowering to a/e, and
  * instrumental/factive endings undouble the exposed double consonant. */
object SnowballHungarian {
  import SnowballRegions._

  private val V = "aeiouáéíóõöúûü".toSet
  private def isV(c: Char) = V(c)
  private val A0 = Array("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
  private val Doubles = sortDesc(Seq(
    "bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk", "ll", "lly",
    "mm", "nn", "nny", "pp", "rr", "ss", "ssz", "tt", "tty", "vv", "zz",
    "zzs").map(_ -> 1))
  private val Case = sortDesc(Seq(
    "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
    "nál", "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl", "ül", "n",
    "an", "ban", "en", "ben", "képpen", "on", "ön", "képp", "kor", "t",
    "at", "et", "ként", "anként", "enként", "onként", "ot", "ért", "öt",
    "hez", "hoz", "höz", "vá", "vé").map(_ -> 1))
  private val CaseSpecial = sortDesc(Seq(
    "én" -> 1, "án" -> 2, "ánként" -> 3))
  private val CaseOther = sortDesc(Seq(
    "astul" -> 1, "estül" -> 1, "stul" -> 2, "stül" -> 2, "ástul" -> 3,
    "éstül" -> 4))
  private val Plural = sortDesc(Seq(
    "ák" -> 1, "ék" -> 2, "ök" -> 3, "ak" -> 4, "ok" -> 5, "ek" -> 6,
    "k" -> 7))
  private val Owned = sortDesc(Seq(
    "aké" -> 1, "eké" -> 1, "oké" -> 1, "öké" -> 1, "éké" -> 2,
    "áké" -> 3, "ké" -> 4, "ééi" -> 5, "áéi" -> 6, "éi" -> 7, "éé" -> 8,
    "é" -> 9))
  private val SingOwner = sortDesc(Seq(
    "unk" -> 1, "ünk" -> 1, "ánk" -> 2, "énk" -> 3, "nk" -> 4,
    "ájuk" -> 5, "éjük" -> 6, "juk" -> 7, "jük" -> 7, "uk" -> 8,
    "ük" -> 8, "am" -> 9, "em" -> 9, "om" -> 9, "ám" -> 10, "ém" -> 11,
    "m" -> 12, "ad" -> 13, "ed" -> 13, "od" -> 13, "öd" -> 13,
    "ád" -> 14, "éd" -> 15, "d" -> 16, "ja" -> 17, "je" -> 17,
    "a" -> 18, "e" -> 18, "o" -> 18, "á" -> 19, "é" -> 20))
  private val PlurOwner = sortDesc(Seq(
    "jaim" -> 1, "jeim" -> 1, "áim" -> 2, "éim" -> 3, "aim" -> 4,
    "eim" -> 4, "im" -> 5, "jaid" -> 6, "jeid" -> 6, "áid" -> 7,
    "éid" -> 8, "aid" -> 9, "eid" -> 9, "id" -> 10, "jai" -> 11,
    "jei" -> 11, "ái" -> 12, "éi" -> 13, "ai" -> 14, "ei" -> 14,
    "i" -> 15, "jaink" -> 16, "jeink" -> 16, "áink" -> 18, "éink" -> 19,
    "aink" -> 17, "eink" -> 17, "ink" -> 20, "jaitok" -> 20,
    "jeitek" -> 20, "áitok" -> 22, "éitek" -> 23, "aitok" -> 21,
    "eitek" -> 21, "itek" -> 24, "jaik" -> 25, "jeik" -> 25, "áik" -> 27,
    "éik" -> 28, "aik" -> 26, "eik" -> 26, "ik" -> 29))

  def stem(word: String): String = {
    var w = word
    val n = w.length
    // R1: word starts with a vowel -> after the first consonant (an
    // initial digraph counts once); else after the first vowel
    var r1 = n
    if (n > 0 && isV(w.charAt(0))) {
      var i = 1
      while (i < n && isV(w.charAt(i))) i += 1
      if (i < n) {
        val rest = w.substring(i)
        val dig = A0.find(rest.startsWith)
        r1 = i + dig.map(_.length).getOrElse(1)
      }
    } else if (n > 0) {
      var i = 1
      while (i < n && !isV(w.charAt(i))) i += 1
      if (i < n) r1 = i + 1
    }

    def inR1(k: Int) = w.length - k >= r1
    def del(k: Int): Unit = w = w.substring(0, w.length - k)
    def repl(k: Int, to: String): Unit = w = w.substring(0, w.length - k) + to
    // ends with a (possibly digraph) double consonant at `end`
    def isDouble(end: Int): Boolean =
      amongB(w.substring(0, end), 0, Doubles).isDefined
    def undouble(): Unit =
      if (w.length >= 2)
        w = w.substring(0, w.length - 2) + w.substring(w.length - 1)
    // final á/é lowers to a/e (R1)
    def vEnding(): Unit = {
      if (w.endsWith("á") && inR1(1)) repl(1, "a")
      else if (w.endsWith("é") && inR1(1)) repl(1, "e")
    }

    // instrum: al/el after a double consonant, R1; undouble after
    amongB(w, 0, Array("al" -> 1, "el" -> 1)) match {
      case Some((s, _)) if inR1(s.length) && isDouble(w.length - s.length) =>
        del(s.length); undouble()
      case _ =>
    }
    // case endings, then final á/é lowering
    amongB(w, 0, Case) match {
      case Some((s, _)) if inR1(s.length) => del(s.length); vEnding()
      case _ =>
    }
    // case_special
    amongB(w, 0, CaseSpecial) match {
      case Some((s, 1)) if inR1(s.length) => repl(s.length, "e")
      case Some((s, 2)) if inR1(s.length) => repl(s.length, "a")
      case Some((s, 3)) if inR1(s.length) => repl(s.length, "a")
      case _ =>
    }
    // case_other
    amongB(w, 0, CaseOther) match {
      case Some((s, c)) if inR1(s.length) => c match {
        case 1 | 2 => del(s.length)
        case 3 => repl(s.length, "a")
        case 4 => repl(s.length, "e")
      }
      case _ =>
    }
    // factive: á/é after a double consonant, R1; undouble after
    amongB(w, 0, Array("á" -> 1, "é" -> 1)) match {
      case Some((s, _)) if inR1(s.length) && isDouble(w.length - s.length) =>
        del(s.length); undouble()
      case _ =>
    }
    // owned
    val aE = Map(1 -> "", 2 -> "e", 3 -> "a", 4 -> "", 5 -> "e",
      6 -> "a", 7 -> "", 8 -> "e", 9 -> "")
    amongB(w, 0, Owned) match {
      case Some((s, c)) if inR1(s.length) =>
        if (aE(c).isEmpty) del(s.length) else repl(s.length, aE(c))
      case _ =>
    }
    // sing_owner
    val soA = Set(2, 5, 10, 14, 19); val soE = Set(3, 6, 11, 15, 20)
    amongB(w, 0, SingOwner) match {
      case Some((s, c)) if inR1(s.length) =>
        if (soA(c)) repl(s.length, "a")
        else if (soE(c)) repl(s.length, "e")
        else del(s.length)
      case _ =>
    }
    // plur_owner
    val poA = Set(2, 7, 12, 18, 22, 27); val poE = Set(3, 8, 13, 19, 23, 28)
    amongB(w, 0, PlurOwner) match {
      case Some((s, c)) if inR1(s.length) =>
        if (poA(c)) repl(s.length, "a")
        else if (poE(c)) repl(s.length, "e")
        else del(s.length)
      case _ =>
    }
    // plural
    amongB(w, 0, Plural) match {
      case Some((s, 1)) if inR1(s.length) => repl(s.length, "a")
      case Some((s, 2)) if inR1(s.length) => repl(s.length, "e")
      case Some((s, _)) if inR1(s.length) => del(s.length)
      case _ =>
    }
    w
  }
}

/** English Snowball stemmer — "Porter2" (reference: Tartarus/Snowball/
  * Ext/EnglishStemmer.cs; published english.sbl). The reference's
  * SnowballFilter("English"); [[PorterStemmer]] remains the
  * EnglishAnalyzer default (PorterStemFilter), exactly like the
  * reference's split. Differences from Porter1 it implements: special
  * R1 for gener/commun/arsen, exception word lists, y/Y marking,
  * apostrophe handling, the li/ogi rules, and the short-word test. */
object SnowballEnglish {
  import SnowballRegions._

  private val V = "aeiouy".toSet
  private def isV(c: Char) = V(c)
  private val VWXY = "aeiouywx".toSet + 'Y'
  private val ValidLI = "cdeghkmnrt".toSet

  private val Exception1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl",
    "ugly" -> "ugli", "early" -> "earli", "only" -> "onli",
    "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe",
    "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
    "andes" -> "andes")
  private val Exception2 = Set(
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed")
  private val Step2 = sortDesc(Seq(
    "tional" -> 1, "enci" -> 2, "anci" -> 3, "abli" -> 4, "entli" -> 5,
    "izer" -> 6, "ization" -> 6, "ational" -> 7, "ation" -> 7,
    "ator" -> 7, "alism" -> 8, "aliti" -> 8, "alli" -> 8,
    "fulness" -> 9, "ousli" -> 10, "ousness" -> 10, "iveness" -> 11,
    "iviti" -> 11, "biliti" -> 12, "bli" -> 12, "ogi" -> 13,
    "fulli" -> 14, "lessli" -> 15, "li" -> 16))
  private val Step2Repl = Map(1 -> "tion", 2 -> "ence", 3 -> "ance",
    4 -> "able", 5 -> "ent", 6 -> "ize", 7 -> "ate", 8 -> "al",
    9 -> "ful", 10 -> "ous", 11 -> "ive", 12 -> "ble")
  private val Step3 = sortDesc(Seq(
    "tional" -> 1, "ational" -> 2, "alize" -> 3, "icate" -> 4,
    "iciti" -> 4, "ical" -> 4, "ful" -> 5, "ness" -> 5, "ative" -> 6))
  private val Step4 = sortDesc(Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ism", "ate", "iti", "ous", "ive", "ize")
    .map(_ -> 1) ++ Seq("ion" -> 2))

  /** Backward short-vowel test at position `end` (exclusive). */
  private def shortV(w: String, end: Int): Boolean = {
    if (end >= 3 && !VWXY(w.charAt(end - 1)) && isV(w.charAt(end - 2)) &&
        !isV(w.charAt(end - 3))) true
    else end == 2 && isV(w.charAt(0)) && !isV(w.charAt(1))
  }

  def stem(word: String): String = {
    Exception1.get(word) match {
      case Some(out) => return out
      case None =>
    }
    if (word.length < 3) return word

    // prelude: strip one leading apostrophe; mark initial y and
    // y-after-vowel as consonant Y
    var yFound = false
    var w = if (word.startsWith("'")) word.substring(1) else word
    if (w.startsWith("y")) { w = "Y" + w.substring(1); yFound = true }
    val a = w.toCharArray
    var i = 1
    while (i < a.length) {
      if (a(i) == 'y' && isV(a(i - 1))) { a(i) = 'Y'; yFound = true }
      i += 1
    }
    w = new String(a)

    // R1: after gener/commun/arsen when the word starts with one
    val r1 = Seq("gener", "commun", "arsen").find(w.startsWith) match {
      case Some(p) => p.length
      case None => regionAfterVC(w, 0, isV)
    }
    val r2 = regionAfterVC(w, r1, isV)
    def inR1(k: Int) = w.length - k >= r1
    def inR2(k: Int) = w.length - k >= r2
    def del(k: Int): Unit = w = w.substring(0, w.length - k)
    def repl(k: Int, to: String): Unit = w = w.substring(0, w.length - k) + to

    // step 0 + 1a
    amongB(w, 0, sortDesc(Seq("'s'" -> 1, "'s" -> 1, "'" -> 1))).foreach {
      case (s, _) => del(s.length)
    }
    amongB(w, 0, sortDesc(Seq(
      "sses" -> 1, "ied" -> 2, "ies" -> 2, "s" -> 3, "ss" -> 4,
      "us" -> 4))) match {
      case Some((s, 1)) => repl(s.length, "ss")
      case Some((s, 2)) => // more than one letter before -> i, else ie
        if (w.length - s.length >= 2) repl(s.length, "i")
        else repl(s.length, "ie")
      case Some((s, 3)) => // a vowel somewhere before the penultimate char
        if (w.substring(0, math.max(0, w.length - 2)).exists(isV)) del(1)
      case _ => // ss/us: keep
    }

    if (Exception2.contains(w)) {
      return if (yFound) w.replace('Y', 'y') else w
    }

    // step 1b
    amongB(w, 0, sortDesc(Seq(
      "eedly" -> 1, "eed" -> 1, "edly" -> 2, "ingly" -> 2, "ed" -> 2,
      "ing" -> 2))) match {
      case Some((s, 1)) => if (inR1(s.length)) repl(s.length, "ee")
      case Some((s, 2)) =>
        if (w.substring(0, w.length - s.length).exists(isV)) {
          del(s.length)
          amongB(w, 0, sortDesc(Seq(
            "at" -> 1, "bl" -> 1, "iz" -> 1, "bb" -> 2, "dd" -> 2,
            "ff" -> 2, "gg" -> 2, "mm" -> 2, "nn" -> 2, "pp" -> 2,
            "rr" -> 2, "tt" -> 2))) match {
            case Some((_, 1)) => w = w + "e"
            case Some((_, 2)) => del(1)
            case None => // short word at R1 boundary gets its e back
              if (w.length == r1 && shortV(w, w.length)) w = w + "e"
          }
        }
      case _ =>
    }

    // step 1c: y/Y -> i after a non-vowel that isn't the first letter
    if (w.length >= 3 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isV(w.charAt(w.length - 2)))
      repl(1, "i")

    // step 2 (R1)
    amongB(w, 0, Step2) match {
      case Some((s, code)) if inR1(s.length) => code match {
        case 13 => // ogi preceded by l -> og
          if (w.length - s.length >= 1 &&
              w.charAt(w.length - s.length - 1) == 'l') repl(s.length, "og")
        case 14 => repl(s.length, "ful")
        case 15 => repl(s.length, "less")
        case 16 => // li after a valid li-letter
          if (w.length - s.length >= 1 &&
              ValidLI(w.charAt(w.length - s.length - 1))) del(s.length)
        case c => repl(s.length, Step2Repl(c))
      }
      case _ =>
    }

    // step 3 (R1; ative needs R2)
    amongB(w, 0, Step3) match {
      case Some((s, code)) if inR1(s.length) => code match {
        case 1 => repl(s.length, "tion")
        case 2 => repl(s.length, "ate")
        case 3 => repl(s.length, "al")
        case 4 => repl(s.length, "ic")
        case 5 => del(s.length)
        case 6 => if (inR2(s.length)) del(s.length)
      }
      case _ =>
    }

    // step 4 (R2)
    amongB(w, 0, Step4) match {
      case Some((s, 1)) if inR2(s.length) => del(s.length)
      case Some((s, 2)) if inR2(s.length) => // ion after s/t
        val j = w.length - s.length - 1
        if (j >= 0 && (w.charAt(j) == 's' || w.charAt(j) == 't'))
          del(s.length)
      case _ =>
    }

    // step 5
    if (w.endsWith("e") &&
        (inR2(1) || (inR1(1) && !shortV(w, w.length - 1)))) del(1)
    else if (w.endsWith("l") && inR2(1) && w.length >= 2 &&
        w.charAt(w.length - 2) == 'l') del(1)

    if (yFound) w.replace('Y', 'y') else w
  }
}

/** French Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * FrenchStemmer.cs; published french.sbl). The prelude marks
  * consonantal u/i/y (and u-after-q) as U/I/Y; RV starts after the third
  * letter when the word opens with two vowels or with par/col/tap. */
object SnowballFrench {
  import SnowballRegions._

  private val V = "aeiouyàâèéêëîïôùû".toSet
  private def isV(c: Char) = V(c)
  private val KeepWithS = "aiosuè".toSet

  private val Standard = sortDesc(Seq(
    "iqUe" -> 1, "iqUes" -> 1, "ance" -> 1, "ances" -> 1, "able" -> 1,
    "ables" -> 1, "isme" -> 1, "ismes" -> 1, "iste" -> 1, "istes" -> 1,
    "eux" -> 1,
    "atrice" -> 2, "atrices" -> 2, "ation" -> 2, "ations" -> 2,
    "ateur" -> 2, "ateurs" -> 2,
    "logie" -> 3, "logies" -> 3,
    "usion" -> 4, "usions" -> 4, "ution" -> 4, "utions" -> 4,
    "ence" -> 5, "ences" -> 5,
    "ement" -> 6, "ements" -> 6,
    "ité" -> 7, "ités" -> 7,
    "ive" -> 8, "ives" -> 8, "if" -> 8, "ifs" -> 8,
    "eaux" -> 9,
    "aux" -> 10,
    "euse" -> 11, "euses" -> 11,
    "issement" -> 12, "issements" -> 12,
    "amment" -> 13,
    "emment" -> 14,
    "ment" -> 15, "ments" -> 15))
  private val Ement = sortDesc(Seq(
    "iv" -> 1, "eus" -> 2, "abl" -> 3, "iqU" -> 3, "ièr" -> 4,
    "Ièr" -> 4))
  private val Ite = sortDesc(Seq("abil" -> 1, "ic" -> 2, "iv" -> 3))
  private val IVerb = sortDesc(Seq(
    "ira", "ie", "isse", "issante", "i", "irai", "ir", "iras", "ies",
    "îmes", "isses", "issantes", "îtes", "is", "irais", "issais",
    "irions", "issions", "irons", "issons", "issants", "it", "irait",
    "issait", "issant", "iraIent", "issaIent", "irent", "issent",
    "iront", "ît", "iriez", "issiez", "irez", "issez").map(_ -> 1))
  private val Verb = sortDesc(Seq(
    "ions" -> 1) ++ Seq(
    "era", "ée", "erai", "er", "eras", "ées", "erais", "erions",
    "erons", "és", "erait", "eraIent", "èrent", "eront", "ez", "iez",
    "eriez", "erez", "é").map(_ -> 2) ++ Seq(
    "a", "asse", "ante", "ai", "as", "âmes", "asses", "antes", "âtes",
    "ais", "assions", "ants", "ait", "ant", "aIent", "assent", "ât",
    "assiez").map(_ -> 3))
  private val Residual = sortDesc(Seq(
    "ion" -> 1, "Ière" -> 2, "ière" -> 2, "Ier" -> 2, "ier" -> 2,
    "e" -> 3, "ë" -> 4))
  private val Doubles = sortDesc(Seq(
    "ell" -> 1, "eill" -> 1, "enn" -> 1, "onn" -> 1, "ett" -> 1))

  private def prelude(word: String): String = {
    val a = word.toCharArray
    var i = 0
    while (i < a.length) {
      if (isV(a(i)) && i + 1 < a.length) {
        val c = a(i + 1)
        if (c == 'u' && i + 2 < a.length && isV(a(i + 2))) a(i + 1) = 'U'
        else if (c == 'i' && i + 2 < a.length && isV(a(i + 2))) a(i + 1) = 'I'
        else if (c == 'y') a(i + 1) = 'Y'
      }
      if (a(i) == 'y' && i + 1 < a.length && isV(a(i + 1))) a(i) = 'Y'
      if (a(i) == 'q' && i + 1 < a.length && a(i + 1) == 'u') a(i + 1) = 'U'
      i += 1
    }
    new String(a)
  }

  def stem(word: String): String = {
    var w = prelude(word)
    val n = w.length
    // RV: after the third letter when the word opens with two vowels or
    // par/col/tap; else after the first vowel past position 0
    val rv =
      if (n >= 3 && isV(w.charAt(0)) && isV(w.charAt(1))) 3
      else if (w.startsWith("par") || w.startsWith("col") ||
        w.startsWith("tap")) 3
      else {
        var i = 1
        while (i < n && !isV(w.charAt(i))) i += 1
        if (i < n) i + 1 else n
      }
    val r1 = regionAfterVC(w, 0, isV)
    val r2 = regionAfterVC(w, r1, isV)

    def inR1(k: Int) = w.length - k >= r1
    def inR2(k: Int) = w.length - k >= r2
    def inRV(k: Int) = w.length - k >= rv
    def del(k: Int): Unit = w = w.substring(0, w.length - k)
    def repl(k: Int, to: String): Unit = w = w.substring(0, w.length - k) + to

    def standardSuffix(): Boolean = amongB(w, 0, Standard) match {
      case Some((s, code)) => code match {
        case 1 => if (inR2(s.length)) { del(s.length); true } else false
        case 2 => // atrice/ation/ateur: R2 delete; then ic -> (del | iqU)
          if (!inR2(s.length)) false
          else {
            del(s.length)
            if (w.endsWith("ic")) {
              if (inR2(2)) del(2) else repl(2, "iqU")
            }
            true
          }
        case 3 => if (inR2(s.length)) { repl(s.length, "log"); true } else false
        case 4 => if (inR2(s.length)) { repl(s.length, "u"); true } else false
        case 5 => if (inR2(s.length)) { repl(s.length, "ent"); true } else false
        case 6 => // ement(s): RV delete; then the iv/eus/abl/iqU/ièr chain
          if (!inRV(s.length)) false
          else {
            del(s.length)
            amongB(w, 0, Ement) match {
              case Some((p, 1)) if inR2(p.length) =>
                del(p.length)
                if (w.endsWith("at") && inR2(2)) del(2)
              case Some((p, 2)) =>
                if (inR2(p.length)) del(p.length)
                else if (inR1(p.length)) repl(p.length, "eux")
              case Some((p, 3)) if inR2(p.length) => del(p.length)
              case Some((p, 4)) if inRV(p.length) => repl(p.length, "i")
              case _ =>
            }
            true
          }
        case 7 => // ité(s): R2 delete; then abil/ic/iv chain
          if (!inR2(s.length)) false
          else {
            del(s.length)
            amongB(w, 0, Ite) match {
              case Some((p, 1)) =>
                if (inR2(p.length)) del(p.length) else repl(p.length, "abl")
              case Some((p, 2)) =>
                if (inR2(p.length)) del(p.length) else repl(p.length, "iqU")
              case Some((p, 3)) if inR2(p.length) => del(p.length)
              case _ =>
            }
            true
          }
        case 8 => // ive/if: R2 delete; then at(ic) chain with iqU fallback
          if (!inR2(s.length)) false
          else {
            del(s.length)
            if (w.endsWith("at") && inR2(2)) {
              del(2)
              if (w.endsWith("ic")) {
                if (inR2(2)) del(2) else repl(2, "iqU")
              }
            }
            true
          }
        case 9 => repl(s.length, "eau"); true
        case 10 => if (inR1(s.length)) { repl(s.length, "al"); true } else false
        case 11 => // euse(s): R2 delete, else R1 -> eux
          if (inR2(s.length)) { del(s.length); true }
          else if (inR1(s.length)) { repl(s.length, "eux"); true }
          else false
        case 12 => // issement(s): R1, preceded by a non-vowel
          if (inR1(s.length) && w.length - s.length >= 1 &&
              !isV(w.charAt(w.length - s.length - 1))) {
            del(s.length); true
          } else false
        // 13-15 substitute and then FAIL on purpose (the .sbl returns
        // false after the slice) so the verb steps keep stripping the
        // exposed ant/ent/vowel
        case 13 => if (inRV(s.length)) repl(s.length, "ant"); false
        case 14 => if (inRV(s.length)) repl(s.length, "ent"); false
        case 15 => // ment(s): preceded by a vowel in RV; delete suffix only
          val j = w.length - s.length - 1
          if (j >= 0 && isV(w.charAt(j)) && j >= rv) del(s.length)
          false
      }
      case None => false
    }

    // i-verb forms matched within RV, preceded by a non-vowel also in RV
    def iVerbSuffix(): Boolean = amongB(w, rv, IVerb) match {
      case Some((s, _)) =>
        val j = w.length - s.length - 1
        if (j >= rv && !isV(w.charAt(j))) { del(s.length); true } else false
      case None => false
    }

    def verbSuffix(): Boolean = amongB(w, rv, Verb) match {
      case Some((s, 1)) => if (inR2(s.length)) { del(s.length); true } else false
      case Some((s, 2)) => del(s.length); true
      case Some((s, 3)) =>
        del(s.length)
        // a preceding e (still within RV) comes off too
        if (w.endsWith("e") && w.length - 1 >= rv) del(1)
        true
      case _ => false
    }

    val removed = standardSuffix() || iVerbSuffix() || verbSuffix()
    if (removed) {
      // post-fix: a bare trailing Y -> i, ç -> c
      if (w.endsWith("Y")) repl(1, "i")
      else if (w.endsWith("ç")) repl(1, "c")
    } else {
      // residual: trailing s (unless kept by a/i/o/u/s/è), then the
      // RV-matched leftovers
      if (w.endsWith("s") && w.length >= 2 &&
          !KeepWithS(w.charAt(w.length - 2))) del(1)
      amongB(w, rv, Residual) match {
        case Some((s, 1)) =>
          val j = w.length - s.length - 1
          if (inR2(s.length) && j >= rv &&
              (w.charAt(j) == 's' || w.charAt(j) == 't')) del(s.length)
        case Some((s, 2)) => repl(s.length, "i")
        case Some((s, 3)) => del(s.length)
        case Some((s, 4)) =>
          if (w.length - s.length >= 2 &&
              w.regionMatches(w.length - s.length - 2, "gu", 0, 2))
            del(s.length)
        case _ =>
      }
    }

    // un_double: ell/eill/enn/onn/ett lose the last letter
    if (amongB(w, 0, Doubles).isDefined) del(1)

    // un_accent: é/è before >= 1 trailing non-vowels becomes e
    var k = 0
    while (k < w.length && !isV(w.charAt(w.length - 1 - k))) k += 1
    if (k >= 1 && k < w.length) {
      val c = w.charAt(w.length - 1 - k)
      if (c == 'é' || c == 'è')
        w = w.substring(0, w.length - 1 - k) + "e" + w.substring(w.length - k)
    }

    w.map { case 'I' => 'i'; case 'U' => 'u'; case 'Y' => 'y'; case c => c }
  }
}

/** Romanian Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * RomanianStemmer.cs; published romanian.sbl — cedilla-era ş/ţ forms,
  * matching the official vocabulary). Distinctive shape: a REPEATED
  * combining-suffix reduction (abilitate→abil, icaţiune→ic…) before the
  * standard pass, and verb suffixes gated on a preceding non-vowel/u
  * within RV. */
object SnowballRomanian {
  import SnowballRegions._

  private val V = "aeiouâîă".toSet
  private def isV(c: Char) = V(c)

  private val Step0 = sortDesc(Seq(
    "ul" -> 1, "ului" -> 1,
    "aua" -> 2,
    "ea" -> 3, "ele" -> 3, "elor" -> 3,
    "iua" -> 4, "iile" -> 4, "iei" -> 4, "ii" -> 4, "ilor" -> 4,
    "iilor" -> 4,
    "ile" -> 5,
    "atei" -> 6,
    "aţie" -> 7, "aţia" -> 7))
  private val Combo = sortDesc(Seq(
    "abilitate" -> 1, "abilitati" -> 1, "abilităi" -> 1, "abilităţi" -> 1,
    "ibilitate" -> 2,
    "ivitate" -> 3, "ivitati" -> 3, "ivităi" -> 3, "ivităţi" -> 3,
    "icitate" -> 4, "icitati" -> 4, "icităi" -> 4, "icităţi" -> 4,
    "icatori" -> 4, "icator" -> 4,
    "icala" -> 4, "icale" -> 4, "icali" -> 4, "ical" -> 4, "icală" -> 4,
    "iciva" -> 4, "icive" -> 4, "icivi" -> 4, "iciv" -> 4, "icivă" -> 4,
    "ativa" -> 5, "ative" -> 5, "ativi" -> 5, "ativ" -> 5, "ativă" -> 5,
    "aţiune" -> 5, "atoare" -> 5, "ătoare" -> 5, "atori" -> 5,
    "ători" -> 5, "ator" -> 5, "ător" -> 5,
    "itiva" -> 6, "itive" -> 6, "itivi" -> 6, "itiv" -> 6, "itivă" -> 6,
    "iţiune" -> 6, "itoare" -> 6, "itori" -> 6, "itor" -> 6))
  private val ComboRepl = Map(1 -> "abil", 2 -> "ibil", 3 -> "iv",
    4 -> "ic", 5 -> "at", 6 -> "it")
  private val Standard = sortDesc(Seq(
    "ica", "ic", "ice", "ici", "ică",
    "abila", "abile", "abili", "abil", "abilă",
    "ibila", "ibile", "ibili", "ibil", "ibilă",
    "oasa", "oase", "osi", "os", "oasă", "oşi",
    "ata", "ate", "ati", "at", "ată",
    "ita", "ite", "iti", "it", "ită",
    "anta", "ante", "anti", "ant", "antă",
    "uta", "ute", "uti", "ut", "ută",
    "iva", "ive", "ivi", "iv", "ivă",
    "itate", "itati", "ităi", "ităţi",
    "atori", "ator").map(_ -> 1) ++
    Seq("iune" -> 2, "iuni" -> 2) ++
    Seq("isme", "iste", "isti", "işti", "ism", "ist", "ista", "istă")
      .map(_ -> 3))
  private val Verb = sortDesc(Seq(
    "ea" -> 1, "ia" -> 1, "esc" -> 1, "ăsc" -> 1, "ind" -> 1, "ând" -> 1,
    "are" -> 1, "ere" -> 1, "ire" -> 1, "âre" -> 1, "ase" -> 1,
    "ise" -> 1, "use" -> 1, "âse" -> 1, "eşte" -> 1, "ăşte" -> 1,
    "eze" -> 1, "ai" -> 1, "eai" -> 1, "iai" -> 1, "eşti" -> 1,
    "ăşti" -> 1, "ui" -> 1, "ezi" -> 1, "âi" -> 1, "aşi" -> 1,
    "aseşi" -> 1, "iseşi" -> 1, "useşi" -> 1, "âseşi" -> 1, "işi" -> 1,
    "uşi" -> 1, "âşi" -> 1, "eaţi" -> 1, "iaţi" -> 1, "arăţi" -> 1,
    "aserăţi" -> 1, "iserăţi" -> 1, "userăţi" -> 1, "âserăţi" -> 1,
    "irăţi" -> 1, "urăţi" -> 1, "ârăţi" -> 1, "am" -> 1, "eam" -> 1,
    "iam" -> 1, "asem" -> 1, "isem" -> 1, "usem" -> 1, "âsem" -> 1,
    "arăm" -> 1, "aserăm" -> 1, "iserăm" -> 1, "userăm" -> 1,
    "âserăm" -> 1, "irăm" -> 1, "urăm" -> 1, "ârăm" -> 1, "au" -> 1,
    "eau" -> 1, "iau" -> 1, "indu" -> 1, "ându" -> 1, "ez" -> 1,
    "ească" -> 1, "ară" -> 1, "aseră" -> 1, "iseră" -> 1, "useră" -> 1,
    "âseră" -> 1, "iră" -> 1, "ură" -> 1, "âră" -> 1, "ează" -> 1,
    "se" -> 2, "sese" -> 2, "sei" -> 2, "seşi" -> 2, "seseşi" -> 2,
    "aţi" -> 2, "eţi" -> 2, "iţi" -> 2, "âţi" -> 2, "serăţi" -> 2,
    "seserăţi" -> 2, "em" -> 2, "sesem" -> 2, "im" -> 2, "âm" -> 2,
    "ăm" -> 2, "serăm" -> 2, "seserăm" -> 2, "seră" -> 2, "seseră" -> 2))
  private val Vowel = sortDesc(Seq(
    "a" -> 1, "e" -> 1, "ie" -> 1, "i" -> 1, "ă" -> 1))

  private def prelude(word: String): String = {
    val a = word.toCharArray
    var i = 1
    while (i < a.length - 1) {
      if (isV(a(i - 1)) && isV(a(i + 1))) {
        if (a(i) == 'u') a(i) = 'U' else if (a(i) == 'i') a(i) = 'I'
      }
      i += 1
    }
    new String(a)
  }

  def stem(word: String): String = {
    var w = prelude(word)
    val rv = romanceRV(w, isV)
    val r1 = regionAfterVC(w, 0, isV)
    val r2 = regionAfterVC(w, regionAfterVC(w, 0, isV), isV)

    def inR1(k: Int) = w.length - k >= r1
    def inR2(k: Int) = w.length - k >= r2
    def inRV(k: Int) = w.length - k >= rv
    def del(k: Int): Unit = w = w.substring(0, w.length - k)
    def repl(k: Int, to: String): Unit =
      w = w.substring(0, w.length - k) + to

    // step 0: plural/article removal (R1)
    amongB(w, 0, Step0) match {
      case Some((s, code)) if inR1(s.length) => code match {
        case 1 => del(s.length)
        case 2 => repl(s.length, "a")
        case 3 => repl(s.length, "e")
        case 4 => repl(s.length, "i")
        case 5 => // ile -> i unless abile
          if (!(w.length - s.length >= 2 &&
              w.regionMatches(w.length - s.length - 2, "ab", 0, 2)))
            repl(s.length, "i")
        case 6 => repl(s.length, "at")
        case 7 => repl(s.length, "aţi")
      }
      case _ =>
    }

    // standard pass: repeat combining-suffix reduction, then a_3 in R2;
    // the flag gates the verb pass
    var removed = false
    var changed = true
    while (changed) {
      changed = false
      amongB(w, 0, Combo) match {
        case Some((s, code)) if inR1(s.length) =>
          repl(s.length, ComboRepl(code)); removed = true; changed = true
        case _ =>
      }
    }
    amongB(w, 0, Standard) match {
      case Some((s, code)) if inR2(s.length) => code match {
        case 1 => del(s.length); removed = true
        case 2 => // (ţ)iune/(ţ)iuni -> t
          if (w.length - s.length >= 1 &&
              w.charAt(w.length - s.length - 1) == 'ţ') {
            repl(s.length + 1, "t"); removed = true
          }
        case 3 => repl(s.length, "ist"); removed = true
      }
      case _ =>
    }

    // verb suffixes only if the standard pass removed nothing; matched
    // within RV, group 1 needs a preceding non-vowel or u — also in RV
    if (!removed) {
      amongB(w, rv, Verb) match {
        case Some((s, 1)) =>
          val j = w.length - s.length - 1
          if (j >= rv && (!isV(w.charAt(j)) || w.charAt(j) == 'u'))
            del(s.length)
        case Some((s, 2)) => del(s.length)
        case _ =>
      }
    }

    // final vowel
    amongB(w, 0, Vowel) match {
      case Some((s, _)) if inRV(s.length) => del(s.length)
      case _ =>
    }

    w.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }
}

/** German Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * GermanStemmer.cs; published german.sbl — the standard variant: umlauts
  * are kept through the steps and stripped in the postlude). */
object SnowballGerman {
  import SnowballRegions._
  import SnowballScandi.r1Min3

  private val V = "aeiouyäöü".toSet
  private def isV(c: Char) = V(c)
  private val SEnding = "bdfghklmnrt".toSet
  private val StEnding = "bdfghklmnt".toSet

  private val Step1 = sortDesc(Seq(
    "e" -> 1, "em" -> 1, "en" -> 1, "ern" -> 1, "er" -> 1, "es" -> 1,
    "s" -> 2))
  private val Step2 = sortDesc(Seq(
    "en" -> 1, "er" -> 1, "est" -> 1, "st" -> 2))
  private val Step3 = sortDesc(Seq(
    "end" -> 1, "ung" -> 1, "ig" -> 2, "ik" -> 2, "isch" -> 2,
    "lich" -> 3, "heit" -> 3, "keit" -> 4))

  private def prelude(word: String): String = {
    val ss = word.replace("ß", "ss")
    val a = ss.toCharArray
    var i = 1
    while (i < a.length - 1) {
      if (isV(a(i - 1)) && isV(a(i + 1))) {
        if (a(i) == 'u') a(i) = 'U' else if (a(i) == 'y') a(i) = 'Y'
      }
      i += 1
    }
    new String(a)
  }

  def stem(word: String): String = stemPrepared(prelude(word))

  /** The shared German suffix steps + postlude, applied to a
    * prelude-marked word (also the German2 variant's back end). */
  private[analysis] def stemPrepared(prepared: String): String = {
    var w = prepared
    val r1 = r1Min3(w, isV)
    val r2 = regionAfterVC(w, regionAfterVC(w, 0, isV), isV)

    def inR1(k: Int) = w.length - k >= r1
    def inR2(k: Int) = w.length - k >= r2
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    // step 1
    amongB(w, 0, Step1) match {
      case Some((s, 1)) => if (inR1(s.length)) del(s.length)
      case Some((s, 2)) =>
        val j = w.length - s.length - 1
        if (inR1(s.length) && j >= 0 && SEnding(w.charAt(j))) del(s.length)
      case _ =>
    }
    // step 2: st only after a valid st-ending with >= 3 letters before it
    amongB(w, 0, Step2) match {
      case Some((s, 1)) => if (inR1(s.length)) del(s.length)
      case Some((s, 2)) =>
        val j = w.length - s.length - 1
        if (inR1(s.length) && j >= 3 && StEnding(w.charAt(j))) del(s.length)
      case _ =>
    }
    // step 3: d-suffixes in R2 with their chains
    amongB(w, 0, Step3) match {
      case Some((s, code)) if inR2(s.length) => code match {
        case 1 => // end/ung; then ig (not after e) in R2
          del(s.length)
          if (w.endsWith("ig") && inR2(2) &&
              !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) del(2)
        case 2 => // ig/ik/isch, not after e
          if (!(w.length - s.length >= 1 &&
              w.charAt(w.length - s.length - 1) == 'e')) del(s.length)
        case 3 => // lich/heit; then er/en in R1
          del(s.length)
          amongB(w, 0, Array("er" -> 1, "en" -> 1)) match {
            case Some((p, _)) if inR1(p.length) => del(p.length)
            case _ =>
          }
        case 4 => // keit; then lich/ig in R2
          del(s.length)
          amongB(w, 0, sortDesc(Seq("lich" -> 1, "ig" -> 1))) match {
            case Some((p, _)) if inR2(p.length) => del(p.length)
            case _ =>
          }
      }
      case _ =>
    }

    w.map {
      case 'Y' => 'y'; case 'U' => 'u'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'; case c => c
    }
  }
}

/** German2 Snowball variant (reference: Tartarus/Snowball/Ext/
  * German2Stemmer.cs; published german2.sbl): identical suffix steps to
  * [[SnowballGerman]], but the prelude also folds the ae/oe/ue spellings
  * of umlauts (protecting qu), AFTER marking consonantal u/y as U/Y. */
object SnowballGerman2 {
  private val V = "aeiouyäöü".toSet
  private def isV(c: Char) = V(c)

  private def prelude(word: String): String = {
    val a = word.toCharArray
    var i = 1
    while (i < a.length - 1) {
      if (isV(a(i - 1)) && isV(a(i + 1))) {
        if (a(i) == 'u') a(i) = 'U' else if (a(i) == 'y') a(i) = 'Y'
      }
      i += 1
    }
    val s = new String(a)
    val out = new java.lang.StringBuilder(s.length)
    var j = 0
    var stop = false
    while (j < s.length && !stop) {
      val two = if (j + 1 < s.length) s.substring(j, j + 2) else ""
      two match {
        case "ae" => out.append('ä'); j += 2
        case "oe" => out.append('ö'); j += 2
        case "ue" => out.append('ü'); j += 2
        case "qu" => // hop 2: the two chars after qu are protected; an
          // impossible hop ends the whole repeat (rest stays unfolded)
          if (j + 4 <= s.length) { out.append(s, j, j + 4); j += 4 }
          else stop = true
        case _ =>
          if (s.charAt(j) == 'ß') { out.append("ss"); j += 1 }
          else { out.append(s.charAt(j)); j += 1 }
      }
    }
    if (j < s.length) out.append(s, j, s.length)
    out.toString
  }

  def stem(word: String): String = SnowballGerman.stemPrepared(prelude(word))
}

/** The Scandinavian Snowball stemmers share one skeleton (reference:
  * Tartarus/Snowball/Ext/{Danish,Norwegian,Swedish}Stemmer.cs; published
  * danish/norwegian/swedish.sbl): R1 starts no earlier than position 3;
  * step 1 strips a case/definiteness suffix matched WITHIN R1 (an `s`
  * only after a language-specific valid s-ending letter); step 2 drops
  * the last letter of a listed consonant pair in R1; step 3 strips
  * derivational leftovers in R1. Danish adds a final undouble step. */
private[analysis] object SnowballScandi {
  import SnowballRegions._

  def r1Min3(w: String, isVowel: Char => Boolean): Int =
    math.max(regionAfterVC(w, 0, isVowel), 3)

  /** Step 2: if a listed pair matches within R1, drop the last letter. */
  def consonantPair(w: String, r1: Int, pairs: Array[(String, Int)]): String =
    if (amongB(w, r1, pairs).isDefined) w.substring(0, w.length - 1) else w
}

/** Danish Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * DanishStemmer.cs; published danish.sbl). */
object SnowballDanish {
  import SnowballRegions._
  import SnowballScandi._

  private val V = "aeiouyæåø".toSet
  private def isV(c: Char) = V(c)
  private val SEnding = "abcdfghjklmnoprtvyzå".toSet

  private val Main = sortDesc(Seq(
    "hed" -> 1, "ethed" -> 1, "ered" -> 1, "e" -> 1, "erede" -> 1,
    "ende" -> 1, "erende" -> 1, "ene" -> 1, "erne" -> 1, "ere" -> 1,
    "en" -> 1, "heden" -> 1, "eren" -> 1, "er" -> 1, "heder" -> 1,
    "erer" -> 1, "heds" -> 1, "es" -> 1, "endes" -> 1, "erendes" -> 1,
    "enes" -> 1, "ernes" -> 1, "eres" -> 1, "ens" -> 1, "hedens" -> 1,
    "erens" -> 1, "ers" -> 1, "ets" -> 1, "erets" -> 1, "et" -> 1,
    "eret" -> 1, "s" -> 2))
  private val Pairs = sortDesc(Seq("gd" -> 1, "dt" -> 1, "gt" -> 1, "kt" -> 1))
  private val Other = sortDesc(Seq(
    "ig" -> 1, "lig" -> 1, "elig" -> 1, "els" -> 1, "løst" -> 2))

  def stem(word: String): String = {
    var w = word
    val r1 = r1Min3(w, isV)
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    // step 1: main suffix, matched within R1; s only after a valid s-ending
    amongB(w, r1, Main) match {
      case Some((s, 1)) => del(s.length)
      case Some((s, 2)) =>
        val j = w.length - s.length - 1
        if (j >= 0 && SEnding(w.charAt(j))) del(s.length)
      case _ =>
    }
    // step 2
    w = consonantPair(w, r1, Pairs)
    // step 3: igst loses st (anywhere), then R1-matched leftovers
    if (w.endsWith("igst")) del(2)
    amongB(w, r1, Other) match {
      case Some((s, 1)) => del(s.length); w = consonantPair(w, r1, Pairs)
      case Some((_, 2)) => del(1) // løst -> løs
      case _ =>
    }
    // step 4: undouble — final consonant in R1 equal to its predecessor
    if (w.length >= 2) {
      val c = w.charAt(w.length - 1)
      if (!isV(c) && w.length - 1 >= r1 && w.charAt(w.length - 2) == c) del(1)
    }
    w
  }
}

/** Norwegian Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * NorwegianStemmer.cs; published norwegian.sbl). */
object SnowballNorwegian {
  import SnowballRegions._
  import SnowballScandi._

  private val V = "aeiouyæåø".toSet
  private def isV(c: Char) = V(c)
  private val SEnding = "bcdfghjlmnoprtvyz".toSet

  private val Main = sortDesc(Seq(
    "a" -> 1, "e" -> 1, "ede" -> 1, "ande" -> 1, "ende" -> 1, "ane" -> 1,
    "ene" -> 1, "hetene" -> 1, "en" -> 1, "heten" -> 1, "ar" -> 1,
    "er" -> 1, "heter" -> 1, "as" -> 1, "es" -> 1, "edes" -> 1,
    "endes" -> 1, "enes" -> 1, "hetenes" -> 1, "ens" -> 1, "hetens" -> 1,
    "ers" -> 1, "ets" -> 1, "et" -> 1, "het" -> 1, "ast" -> 1,
    "s" -> 2, "erte" -> 3, "ert" -> 3))
  private val Pairs = sortDesc(Seq("dt" -> 1, "vt" -> 1))
  private val Other = sortDesc(Seq(
    "leg" -> 1, "eleg" -> 1, "ig" -> 1, "eig" -> 1, "lig" -> 1,
    "elig" -> 1, "els" -> 1, "lov" -> 1, "elov" -> 1, "slov" -> 1,
    "hetslov" -> 1).map(e => e))

  def stem(word: String): String = {
    var w = word
    val r1 = r1Min3(w, isV)
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    // step 1; s after an s-ending letter, or after k itself preceded by
    // a non-vowel
    amongB(w, r1, Main) match {
      case Some((s, 1)) => del(s.length)
      case Some((s, 2)) =>
        val j = w.length - s.length - 1
        val valid = j >= 0 && (SEnding(w.charAt(j)) ||
          (w.charAt(j) == 'k' && j >= 1 && !isV(w.charAt(j - 1))))
        if (valid) del(s.length)
      case Some((s, 3)) => w = w.substring(0, w.length - s.length) + "er"
      case _ =>
    }
    // step 2
    w = consonantPair(w, r1, Pairs)
    // step 3
    amongB(w, r1, Other) match {
      case Some((s, _)) => del(s.length)
      case None =>
    }
    w
  }
}

/** Swedish Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * SwedishStemmer.cs; published swedish.sbl). */
object SnowballSwedish {
  import SnowballRegions._
  import SnowballScandi._

  private val V = "aeiouyäåö".toSet
  private def isV(c: Char) = V(c)
  private val SEnding = "bcdfghjklmnoprtvy".toSet

  private val Main = sortDesc(Seq(
    "a" -> 1, "arna" -> 1, "erna" -> 1, "heterna" -> 1, "orna" -> 1,
    "ad" -> 1, "e" -> 1, "ade" -> 1, "ande" -> 1, "arne" -> 1, "are" -> 1,
    "aste" -> 1, "en" -> 1, "anden" -> 1, "aren" -> 1, "heten" -> 1,
    "ern" -> 1, "ar" -> 1, "er" -> 1, "heter" -> 1, "or" -> 1, "as" -> 1,
    "arnas" -> 1, "ernas" -> 1, "ornas" -> 1, "es" -> 1, "ades" -> 1,
    "andes" -> 1, "ens" -> 1, "arens" -> 1, "hetens" -> 1, "erns" -> 1,
    "at" -> 1, "andet" -> 1, "het" -> 1, "ast" -> 1, "s" -> 2))
  private val Pairs = sortDesc(Seq(
    "dd" -> 1, "gd" -> 1, "nn" -> 1, "dt" -> 1, "gt" -> 1, "kt" -> 1,
    "tt" -> 1))
  private val Other = sortDesc(Seq(
    "ig" -> 1, "lig" -> 1, "els" -> 1, "löst" -> 2, "fullt" -> 3))

  def stem(word: String): String = {
    var w = word
    val r1 = r1Min3(w, isV)
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    amongB(w, r1, Main) match {
      case Some((s, 1)) => del(s.length)
      case Some((s, 2)) =>
        val j = w.length - s.length - 1
        if (j >= 0 && SEnding(w.charAt(j))) del(s.length)
      case _ =>
    }
    w = consonantPair(w, r1, Pairs)
    amongB(w, r1, Other) match {
      case Some((s, 1)) => del(s.length)
      case Some((_, 2)) => del(1) // löst -> lös
      case Some((_, 3)) => del(1) // fullt -> full
      case _ =>
    }
    w
  }
}

/** Dutch Snowball stemmer (reference: Tartarus/Snowball/Ext/
  * DutchStemmer.cs; published dutch.sbl). The prelude folds umlauts and
  * acutes and marks consonantal i/y as I/Y; R1 starts no earlier than
  * position 3; en/e removals undouble a final dd/kk/tt. */
object SnowballDutch {
  import SnowballRegions._

  private val V = "aeiouyè".toSet
  private def isV(c: Char) = V(c)

  private def prelude(word: String): String = {
    val folded = word.map {
      case 'á' | 'ä' => 'a'; case 'é' | 'ë' => 'e'; case 'í' | 'ï' => 'i'
      case 'ó' | 'ö' => 'o'; case 'ú' | 'ü' => 'u'; case c => c
    }
    val a = folded.toCharArray
    if (a.nonEmpty && a(0) == 'y') a(0) = 'Y'
    var i = 1
    while (i < a.length) {
      if (isV(a(i - 1))) {
        if (a(i) == 'i' && i + 1 < a.length && isV(a(i + 1))) a(i) = 'I'
        else if (a(i) == 'y') a(i) = 'Y'
      }
      i += 1
    }
    new String(a)
  }

  def stem(word: String): String = {
    var w = prelude(word)
    var r1 = regionAfterVC(w, 0, isV)
    if (r1 < 3) r1 = 3 // at least 3 letters before R1
    val r2 = regionAfterVC(w, regionAfterVC(w, 0, isV), isV)

    var eFound = false
    def inR1(k: Int) = w.length - k >= r1
    def inR2(k: Int) = w.length - k >= r2
    def del(k: Int): Unit = w = w.substring(0, w.length - k)

    // undouble a final dd/kk/tt (after en/e removal)
    def undouble(): Unit = {
      if (w.endsWith("dd") || w.endsWith("kk") || w.endsWith("tt")) del(1)
    }
    // en/ene: R1, preceded by a non-vowel, and not by "gem"
    def enEnding(sufLen: Int): Boolean = {
      val j = w.length - sufLen - 1
      if (inR1(sufLen) && j >= 0 && !isV(w.charAt(j)) &&
          !w.regionMatches(w.length - sufLen - 3, "gem", 0, 3)) {
        del(sufLen); undouble(); true
      } else false
    }
    // e: R1, preceded by a non-vowel
    def eEnding(): Boolean = {
      eFound = false
      val j = w.length - 2
      if (w.endsWith("e") && inR1(1) && j >= 0 && !isV(w.charAt(j))) {
        del(1); eFound = true; undouble(); true
      } else false
    }

    // step 1
    amongB(w, 0, sortDesc(Seq(
      "heden" -> 1, "ene" -> 2, "en" -> 2, "se" -> 3, "s" -> 3))) match {
      case Some((s, 1)) =>
        if (inR1(s.length)) w = w.substring(0, w.length - s.length) + "heid"
      case Some((s, 2)) => enEnding(s.length)
      case Some((s, 3)) => // valid s-ending: a non-vowel other than j
        val j = w.length - s.length - 1
        if (inR1(s.length) && j >= 0 && !isV(w.charAt(j)) && w.charAt(j) != 'j')
          del(s.length)
      case _ =>
    }

    // step 2
    eEnding()

    // step 3a: heid (R2, not after c), then en
    if (w.endsWith("heid") && inR2(4) &&
        !(w.length >= 5 && w.charAt(w.length - 5) == 'c')) {
      del(4)
      if (w.endsWith("en")) enEnding(2)
    }

    // step 3b: d-suffixes
    amongB(w, 0, sortDesc(Seq(
      "end" -> 1, "ing" -> 1, "ig" -> 2, "lijk" -> 3, "baar" -> 4,
      "bar" -> 5))) match {
      case Some((s, 1)) =>
        if (inR2(s.length)) {
          del(s.length)
          if (w.endsWith("ig") && inR2(2) &&
              !(w.length >= 3 && w.charAt(w.length - 3) == 'e')) del(2)
          else undouble()
        }
      case Some((s, 2)) =>
        if (inR2(s.length) &&
            !(w.length - s.length >= 1 && w.charAt(w.length - s.length - 1) == 'e'))
          del(s.length)
      case Some((s, 3)) =>
        if (inR2(s.length)) { del(s.length); eEnding() }
      case Some((s, 4)) =>
        if (inR2(s.length)) del(s.length)
      case Some((s, 5)) =>
        if (inR2(s.length) && eFound) del(s.length)
      case _ =>
    }

    // step 4: undouble vowel — CVD with C non-vowel, V in aa/ee/oo/uu,
    // D a non-vowel other than I
    if (w.length >= 4) {
      val d = w.charAt(w.length - 1)
      val v1 = w.charAt(w.length - 2); val v0 = w.charAt(w.length - 3)
      val c = w.charAt(w.length - 4)
      if (!isV(d) && d != 'I' && v1 == v0 && "aeou".indexOf(v1.toInt) >= 0 &&
          !isV(c))
        w = w.substring(0, w.length - 2) + d
    }

    w.map { case 'Y' => 'y'; case 'I' => 'i'; case c => c }
  }
}
