package graft.analysis

/** Brazilian Portuguese stemmer (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Br/
  * BrazilianStemmer.cs:48-1420 + BrazilianStemFilter.cs:60-80 — the
  * hand-coded Orengo-style algorithm BrazilianAnalyzer defaults to,
  * distinct from both the Snowball Portuguese stemmer and the RSLP
  * tables). Restated rule-by-rule, INCLUDING the reference's own
  * quirks, which are part of the observable contract:
  *
  *  - the "logias" rule calls ReplaceSuffix without assigning the
  *    result (:1?? — a match reports "altered" but leaves the term
  *    unchanged);
  *  - Step 2's RV≥3 tier matches "ira" but removes "ava" (a no-op
  *    that still reports altered);
  *  - "areis"/"iras"/"iu" appear twice in their tiers;
  *  - region bounds exclude the last character (GetR1/GetRV loop to
  *    `i = len-1`), and accent folding covers á/â/ã, é/ê, í, ó/ô/õ,
  *    ú/ü, ç, ñ — NOT à/è (ChangeTerm's exact list).
  *
  * Filter contract (BrazilianStemFilter): a null result (term not
  * indexable: length ≤ 2 or ≥ 30 post-normalization) or an unchanged
  * result keeps the original token — [[stemToken]] implements that
  * surface; [[stem]] is the raw Stem() with its null. */
object BrazilianStemmer {

  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  private def suffix(value: String, suf: String): Boolean =
    value != null && suf.length <= value.length && value.endsWith(suf)

  private def removeSuffix(value: String, toRemove: String): String =
    if (value == null || toRemove == null || !suffix(value, toRemove)) value
    else value.substring(0, value.length - toRemove.length)

  private def replaceSuffix(value: String, toReplace: String, changeTo: String): String = {
    val v = removeSuffix(value, toReplace)
    if (v == value) value else v + changeTo
  }

  private def suffixPreceded(value: String, suf: String, preceded: String): Boolean =
    suffix(value, suf) && suffix(removeSuffix(value, suf), preceded)

  /** ChangeTerm's exact accent fold (lowercase first). */
  private def changeTerm(value: String): String = {
    val sb = new java.lang.StringBuilder(value.length)
    value.toLowerCase(java.util.Locale.ROOT).foreach {
      case 'á' | 'â' | 'ã' => sb.append('a')
      case 'é' | 'ê' => sb.append('e')
      case 'í' => sb.append('i')
      case 'ó' | 'ô' | 'õ' => sb.append('o')
      case 'ú' | 'ü' => sb.append('u')
      case 'ç' => sb.append('c')
      case 'ñ' => sb.append('n')
      case c => sb.append(c)
    }
    sb.toString
  }

  private val Punct = Set('"', '\'', '-', ',', ';', '.', '?', '!')

  private def createCT(term: String): String = {
    var ct = changeTerm(term)
    if (ct.length < 2) return ct
    if (Punct(ct.charAt(0))) ct = ct.substring(1)
    if (ct.length < 2) return ct
    if (Punct(ct.charAt(ct.length - 1))) ct = ct.substring(0, ct.length - 1)
    ct
  }

  /** GetR1: past the first non-initial vowel run — loops bounded at
    * len-1 like the reference (the final char never starts a region). */
  private def getR1(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    var j = 0
    while (j < i && !isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    while (j < i && isVowel(value.charAt(j))) j += 1
    if (j >= i) return null
    value.substring(j + 1)
  }

  private def getRV(value: String): String = {
    if (value == null) return null
    val i = value.length - 1
    if (i > 0 && !isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && !isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 1 && isVowel(value.charAt(0)) && isVowel(value.charAt(1))) {
      var j = 2
      while (j < i && isVowel(value.charAt(j))) j += 1
      if (j < i) return value.substring(j + 1)
    }
    if (i > 2) value.substring(3) else null
  }

  // Step-1 rule actions
  private final val Remove = 0
  private final val Replace = 1
  private final val Noop = 2 // the reference's unassigned ReplaceSuffix

  // (minCTLen, suffix, region: 1=R1 2=R2 3=RV+preceded-e, action, replacement)
  private val step1Rules: Array[(Int, String, Int, Int, String)] = Array(
    (0, "uciones", 2, Replace, "u"),
    (6, "imentos", 2, Remove, ""), (6, "amentos", 2, Remove, ""),
    (6, "adores", 2, Remove, ""), (6, "adoras", 2, Remove, ""),
    (6, "logias", 2, Noop, "log"), (6, "encias", 2, Replace, "ente"),
    (6, "amente", 1, Remove, ""), (6, "idades", 2, Remove, ""),
    (5, "acoes", 2, Remove, ""), (5, "imento", 2, Remove, ""),
    (5, "amento", 2, Remove, ""), (5, "adora", 2, Remove, ""),
    (5, "ismos", 2, Remove, ""), (5, "istas", 2, Remove, ""),
    (5, "logia", 2, Replace, "log"), (5, "ucion", 2, Replace, "u"),
    (5, "encia", 2, Replace, "ente"), (5, "mente", 2, Remove, ""),
    (5, "idade", 2, Remove, ""),
    (4, "acao", 2, Remove, ""), (4, "ezas", 2, Remove, ""),
    (4, "icos", 2, Remove, ""), (4, "icas", 2, Remove, ""),
    (4, "ismo", 2, Remove, ""), (4, "avel", 2, Remove, ""),
    (4, "ivel", 2, Remove, ""), (4, "ista", 2, Remove, ""),
    (4, "osos", 2, Remove, ""), (4, "osas", 2, Remove, ""),
    (4, "ador", 2, Remove, ""), (4, "ivas", 2, Remove, ""),
    (4, "ivos", 2, Remove, ""), (4, "iras", 3, Replace, "ir"),
    (3, "eza", 2, Remove, ""), (3, "ico", 2, Remove, ""),
    (3, "ica", 2, Remove, ""), (3, "oso", 2, Remove, ""),
    (3, "osa", 2, Remove, ""), (3, "iva", 2, Remove, ""),
    (3, "ivo", 2, Remove, ""), (3, "ira", 3, Replace, "ir"))

  // Step-2 verb suffixes: (minRVLen, rvSuffix, removalSuffix) — the
  // reference's exact order incl. the duplicates and the ira→ava no-op
  private val step2Rules: Array[(Int, String, String)] = Array(
    (7, "issemos", "issemos"), (7, "essemos", "essemos"), (7, "assemos", "assemos"),
    (7, "ariamos", "ariamos"), (7, "eriamos", "eriamos"), (7, "iriamos", "iriamos"),
    (6, "iremos", "iremos"), (6, "eremos", "eremos"), (6, "aremos", "aremos"),
    (6, "avamos", "avamos"), (6, "iramos", "iramos"), (6, "eramos", "eramos"),
    (6, "aramos", "aramos"), (6, "asseis", "asseis"), (6, "esseis", "esseis"),
    (6, "isseis", "isseis"), (6, "arieis", "arieis"), (6, "erieis", "erieis"),
    (6, "irieis", "irieis"),
    (5, "irmos", "irmos"), (5, "iamos", "iamos"), (5, "armos", "armos"),
    (5, "ermos", "ermos"), (5, "areis", "areis"), (5, "ereis", "ereis"),
    (5, "ireis", "ireis"), (5, "asses", "asses"), (5, "esses", "esses"),
    (5, "isses", "isses"), (5, "astes", "astes"), (5, "assem", "assem"),
    (5, "essem", "essem"), (5, "issem", "issem"), (5, "ardes", "ardes"),
    (5, "erdes", "erdes"), (5, "irdes", "irdes"), (5, "ariam", "ariam"),
    (5, "eriam", "eriam"), (5, "iriam", "iriam"), (5, "arias", "arias"),
    (5, "erias", "erias"), (5, "irias", "irias"), (5, "estes", "estes"),
    (5, "istes", "istes"), (5, "areis", "areis"), (5, "aveis", "aveis"),
    (4, "aria", "aria"), (4, "eria", "eria"), (4, "iria", "iria"),
    (4, "asse", "asse"), (4, "esse", "esse"), (4, "isse", "isse"),
    (4, "aste", "aste"), (4, "este", "este"), (4, "iste", "iste"),
    (4, "arei", "arei"), (4, "erei", "erei"), (4, "irei", "irei"),
    (4, "aram", "aram"), (4, "eram", "eram"), (4, "iram", "iram"),
    (4, "avam", "avam"), (4, "arem", "arem"), (4, "erem", "erem"),
    (4, "irem", "irem"), (4, "ando", "ando"), (4, "endo", "endo"),
    (4, "indo", "indo"), (4, "arao", "arao"), (4, "erao", "erao"),
    (4, "irao", "irao"), (4, "adas", "adas"), (4, "idas", "idas"),
    (4, "aras", "aras"), (4, "eras", "eras"), (4, "iras", "iras"),
    (4, "avas", "avas"), (4, "ares", "ares"), (4, "eres", "eres"),
    (4, "ires", "ires"), (4, "ados", "ados"), (4, "idos", "idos"),
    (4, "amos", "amos"), (4, "emos", "emos"), (4, "imos", "imos"),
    (4, "iras", "iras"), (4, "ieis", "ieis"),
    (3, "ada", "ada"), (3, "ida", "ida"), (3, "ara", "ara"),
    (3, "era", "era"), (3, "ira", "ava"), (3, "iam", "iam"),
    (3, "ado", "ado"), (3, "ido", "ido"), (3, "ias", "ias"),
    (3, "ais", "ais"), (3, "eis", "eis"), (3, "ira", "ira"),
    (3, "ear", "ear"),
    (2, "ia", "ia"), (2, "ei", "ei"), (2, "am", "am"), (2, "em", "em"),
    (2, "ar", "ar"), (2, "er", "er"), (2, "ir", "ir"), (2, "as", "as"),
    (2, "es", "es"), (2, "is", "is"), (2, "eu", "eu"), (2, "iu", "iu"),
    (2, "iu", "iu"), (2, "ou", "ou"))

  /** Raw Stem(): null when the normalized term is not indexable
    * (length ≤ 2 or ≥ 30), the unstemmed CT when not all-letter. */
  def stem(term: String): String = {
    val ct0 = createCT(term)
    if (!(ct0.length < 30 && ct0.length > 2)) return null
    if (!ct0.forall(Character.isLetter)) return ct0

    var ct = ct0
    val r1 = getR1(ct)
    val r2 = getR1(r1)
    val rv = getRV(ct)

    // Step 1
    var altered = false
    var i = 0
    while (!altered && i < step1Rules.length) {
      val (minLen, suf, region, action, repl) = step1Rules(i)
      if (ct.length >= minLen && suffix(ct, suf)) {
        val regionOk = region match {
          case 1 => suffix(r1, suf)
          case 2 => suffix(r2, suf)
          case 3 => suffix(rv, suf) && suffixPreceded(ct, suf, "e")
        }
        if (regionOk) {
          action match {
            case Remove => ct = removeSuffix(ct, suf)
            case Replace => ct = replaceSuffix(ct, suf, repl)
            case Noop => // the reference discards this ReplaceSuffix result
          }
          altered = true
        }
      }
      i += 1
    }

    // Step 2 (only when step 1 did not fire)
    if (!altered && rv != null) {
      var j = 0
      while (!altered && j < step2Rules.length) {
        val (minLen, rvSuf, rmSuf) = step2Rules(j)
        if (rv.length >= minLen && suffix(rv, rvSuf)) {
          ct = removeSuffix(ct, rmSuf)
          altered = true
        }
        j += 1
      }
    }

    if (altered) {
      // Step 3: trailing i preceded by c (both judged in RV)
      if (rv != null && suffix(rv, "i") && suffixPreceded(rv, "i", "c"))
        ct = removeSuffix(ct, "i")
    } else if (rv != null) {
      // Step 4: residual suffix
      if (suffix(rv, "os")) ct = removeSuffix(ct, "os")
      else if (suffix(rv, "a")) ct = removeSuffix(ct, "a")
      else if (suffix(rv, "i")) ct = removeSuffix(ct, "i")
      else if (suffix(rv, "o")) ct = removeSuffix(ct, "o")
    }

    // Step 5: trailing e, with gu/ci absorption
    if (rv != null && suffix(rv, "e")) {
      if (suffixPreceded(rv, "e", "gu")) {
        ct = removeSuffix(ct, "e"); ct = removeSuffix(ct, "u")
      } else if (suffixPreceded(rv, "e", "ci")) {
        ct = removeSuffix(ct, "e"); ct = removeSuffix(ct, "i")
      } else ct = removeSuffix(ct, "e")
    }
    ct
  }

  /** The BrazilianStemFilter surface: null or unchanged → original. */
  def stemToken(term: String): String = {
    val s = stem(term)
    if (s == null || s == term) term else s
  }
}
