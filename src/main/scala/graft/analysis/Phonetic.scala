package graft.analysis

/** Phonetic encoding (reference: Lucene.Net.Analysis.Phonetic — the
  * PhoneticFilter over commons-codec encoders; here the classic American
  * Soundex, implemented from the public NARA standard): a word maps to
  * `letter + 3 digits`, consonant classes b f p v→1, c g j k q s x z→2,
  * d t→3, l→4, m n→5, r→6; vowels (and y) separate duplicate codes,
  * while h and w do NOT; the first letter is kept and its own code never
  * emitted; pad with zeros, cut at 4. Names that sound alike collide:
  * Robert ≡ Rupert ≡ R163. Plugged into the analyzer chain through the
  * stemmer slot (term → term mapping after lowercase/stop). */
object Phonetic {

  private def code(c: Char): Int = c match {
    case 'b' | 'f' | 'p' | 'v' => 1
    case 'c' | 'g' | 'j' | 'k' | 'q' | 's' | 'x' | 'z' => 2
    case 'd' | 't' => 3
    case 'l' => 4
    case 'm' | 'n' => 5
    case 'r' => 6
    case _ => 0 // vowels, y, h, w
  }

  def soundex(word: String): String = {
    if (word.isEmpty || !word.head.isLetter) return word
    val w = word.toLowerCase(java.util.Locale.ROOT)
    val sb = new StringBuilder(4)
    sb += Character.toUpperCase(w.head)
    var lastCode = code(w.head)
    var i = 1
    while (i < w.length && sb.length < 4) {
      val c = w.charAt(i)
      val k = code(c)
      if (k > 0) {
        if (k != lastCode) sb += ('0' + k).toChar
        lastCode = k
      } else if (c != 'h' && c != 'w') {
        // vowels and y reset the duplicate suppression; h/w do not
        lastCode = 0
      }
      i += 1
    }
    while (sb.length < 4) sb += '0'
    sb.toString
  }

  /** Phonetic analyzer: words index as their Soundex codes — queries for
    * misspelled names hit (the PhoneticFilter idea). */
  val analyzer: Analyzer =
    new Analyzer(Set.empty, 255, UAX29Tokenizer.tokenize, Some(soundex))
}
