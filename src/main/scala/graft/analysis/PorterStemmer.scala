package graft.analysis

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980), implemented from the published
  * definition including the author's two documented departures from the
  * paper (step-2 `bli→ble` replacing `abli→able`, and the added
  * `logi→log`) — the variant whose behavior the reference's
  * PorterStemFilter exhibits (reference: Analysis/En/PorterStemFilter.cs;
  * validated against Martin Porter's public voc.txt/output.txt corpus in
  * StemmerSpec). Fresh implementation from the algorithm text.
  *
  * Opt-in analyzer stage: see [[Analyzer.englishStemming]]. */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    new Impl(word.toCharArray, strict = false).run()
  }

  /** The strict 1980 paper (the Snowball `porter` algorithm): no ≤2-letter
    * guard, step-2 `abli→able` as published (not the `bli→ble` departure),
    * and no `logi→log`. Validated against the official Snowball porter
    * voc/output vectors in StemmerSpec. */
  def stemStrict(word: String): String = {
    if (word.isEmpty) return word
    new Impl(word.toCharArray, strict = true).run()
  }

  private final class Impl(var b: Array[Char], strict: Boolean) {
    private var k: Int = b.length - 1 // last valid index
    private var j: Int = 0            // stem end for the current rule

    private def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y' => if (i == 0) true else !cons(i - 1)
      case _ => true
    }

    /** Measure: number of VC sequences in b[0..j]. */
    private def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1
      if (i > j) return 0
      while (i <= j) {
        while (i <= j && !cons(i)) i += 1
        if (i > j) return n
        n += 1
        while (i <= j && cons(i)) i += 1
      }
      n
    }

    private def vowelInStem(): Boolean = (0 to j).exists(i => !cons(i))

    private def doubleC(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    /** cvc(i): consonant-vowel-consonant ending at i, last cons not w/x/y. */
    private def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false
      val c = b(i)
      c != 'w' && c != 'x' && c != 'y'
    }

    private def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    private def setTo(s: String): Unit = {
      val l = s.length
      if (j + l + 1 > b.length) b = java.util.Arrays.copyOf(b, j + l + 1)
      var i = 0
      while (i < l) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + l
    }

    private def r(s: String): Unit = if (m() > 0) setTo(s)

    private def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setTo("i")
        else if (k == 0 || b(k - 1) != 's') k -= 1
      }
      if (k < 0) return
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setTo("ate")
        else if (ends("bl")) setTo("ble")
        else if (ends("iz")) setTo("ize")
        else if (doubleC(k)) {
          val c = b(k)
          if (c != 'l' && c != 's' && c != 'z') k -= 1
        } else if (m() == 1 && cvc(k)) setTo("e")
      }
    }

    private def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    private def step2(): Unit = {
      if (k == 0) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (!strict && ends("bli")) r("ble") // departure: paper had abli→able
          else if (strict && ends("abli")) r("able")
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (!strict && ends("logi")) r("log") // departure: added rule
        case _ =>
      }
    }

    private def step3(): Unit = b(k) match {
      case 'e' =>
        if (ends("icate")) r("ic")
        else if (ends("ative")) r("")
        else if (ends("alize")) r("al")
      case 'i' =>
        if (ends("iciti")) r("ic")
      case 'l' =>
        if (ends("ical")) r("ic")
        else if (ends("ful")) r("")
      case 's' =>
        if (ends("ness")) r("")
      case _ =>
    }

    private def step4(): Unit = {
      if (k == 0) return
      val matched = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) || ends("ou")
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _ => false
      }
      if (matched && m() > 1) k = j
    }

    private def step5(): Unit = {
      // 5a
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      // 5b
      if (b(k) == 'l' && doubleC(k) && m() > 1) k -= 1
    }

    def run(): String = {
      step1ab()
      if (k < 0) return "" // strict mode: "s" is all suffix
      step1c(); step2(); step3(); step4(); step5()
      new String(b, 0, k + 1)
    }
  }
}
