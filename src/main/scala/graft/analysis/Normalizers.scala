package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Per-language normalizers + the hyphenation re-joiner + the Thai
  * tokenizer from Analysis.Common (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/). */
object Normalizers {

  /** ScandinavianFoldingFilter (Miscellaneous/ScandinavianFoldingFilter
    * .cs:67-125): åäæ→a, öø→o (case-preserving), and the double-vowel
    * transcriptions collapse — a followed by a/e/o drops the second
    * char, o followed by e/o likewise (the aggressive
    * blåbærsyltetøj == blaabaarsyltetoej == blabarsyltetoj member). */
  def scandinavianFolding(term: String): String = {
    val b = new StringBuilder(term)
    var i = 0
    while (i < b.length) {
      val c = b.charAt(i)
      if (c == 'å' || c == 'ä' || c == 'æ') b.setCharAt(i, 'a')
      else if (c == 'Å' || c == 'Ä' || c == 'Æ') b.setCharAt(i, 'A')
      else if (c == 'ø' || c == 'ö') b.setCharAt(i, 'o')
      else if (c == 'Ø' || c == 'Ö') b.setCharAt(i, 'O')
      else if (i < b.length - 1) {
        val n = b.charAt(i + 1)
        if ((c == 'a' || c == 'A') &&
            (n == 'a' || n == 'A' || n == 'e' || n == 'E' || n == 'o' || n == 'O'))
          b.deleteCharAt(i + 1)
        else if ((c == 'o' || c == 'O') &&
                 (n == 'e' || n == 'E' || n == 'o' || n == 'O'))
          b.deleteCharAt(i + 1)
      }
      i += 1
    }
    b.toString
  }

  /** ScandinavianNormalizationFilter (:55-130): the conservative member
    * — ä→æ, ö→ø (case-preserving), and transcriptions RESTORE the
    * national letters: aa/ao→å, ae→æ, oe/oo→ø. */
  def scandinavianNormalization(term: String): String = {
    val b = new StringBuilder(term)
    var i = 0
    while (i < b.length) {
      val c = b.charAt(i)
      if (c == 'ä') b.setCharAt(i, 'æ')
      else if (c == 'Ä') b.setCharAt(i, 'Æ')
      else if (c == 'ö') b.setCharAt(i, 'ø')
      else if (c == 'Ö') b.setCharAt(i, 'Ø')
      else if (i < b.length - 1) {
        val n = b.charAt(i + 1)
        def rep(ch: Char): Unit = { b.deleteCharAt(i + 1); b.setCharAt(i, ch) }
        if (c == 'a' && (n == 'a' || n == 'o' || n == 'A' || n == 'O')) rep('å')
        else if (c == 'A' && (n == 'a' || n == 'A' || n == 'o' || n == 'O')) rep('Å')
        else if (c == 'a' && (n == 'e' || n == 'E')) rep('æ')
        else if (c == 'A' && (n == 'e' || n == 'E')) rep('Æ')
        else if (c == 'o' && (n == 'e' || n == 'E' || n == 'o' || n == 'O')) rep('ø')
        else if (c == 'O' && (n == 'e' || n == 'E' || n == 'o' || n == 'O')) rep('Ø')
      }
      i += 1
    }
    b.toString
  }

  /** GermanNormalizationFilter (De/GermanNormalizationFilter.cs:57-120):
    * the Snowball german2 accent rules as the reference's 3-state
    * machine — ä/ö/ü fold to a/o/u, ß→ss, and 'e' is DELETED after a
    * u/o that itself follows a non-vowel context (ue→u, oe→o as in
    * "loewe"→"lowe") while qu/vowel contexts keep it ("quelle",
    * "fuer"→"fur" but "queue" keeps). States: N initial, U after a/o/u,
    * V after e/i/q/y/folded umlauts. */
  def germanNormalization(term: String): String = {
    val N = 0; val U = 1; val V = 2
    var state = N
    val b = new StringBuilder(term)
    var i = 0
    while (i < b.length) {
      b.charAt(i) match {
        case 'a' | 'o' => state = U
        case 'u' => state = if (state == N) U else V
        case 'e' =>
          if (state == U) { b.deleteCharAt(i); i -= 1 }
          state = V
        case 'i' | 'q' | 'y' => state = V
        case 'ä' => b.setCharAt(i, 'a'); state = V
        case 'ö' => b.setCharAt(i, 'o'); state = V
        case 'ü' => b.setCharAt(i, 'u'); state = V
        case 'ß' =>
          b.setCharAt(i, 's'); b.insert(i + 1, 's'); i += 1; state = N
        case _ => state = N
      }
      i += 1
    }
    b.toString
  }

  /** ArabicNormalizer (Ar/ArabicNormalizer.cs:66-101): hamza-carrying
    * alefs → bare alef, dotless yeh → yeh, teh marbuta → heh, and
    * tatweel + the eight harakat/shadda/sukun diacritics deleted. */
  def arabicNormalize(term: String): String = {
    val b = new StringBuilder
    for (c <- term) c match {
      case 'آ' | 'أ' | 'إ' => b.append('ا') // alefs
      case 'ى' => b.append('ي') // dotless yeh -> yeh
      case 'ة' => b.append('ه') // teh marbuta -> heh
      case 'ـ' | 'ً' | 'ٌ' | 'ٍ' | 'َ'
         | 'ُ' | 'ِ' | 'ّ' | 'ْ' => // tatweel+diacritics
      case other => b.append(other)
    }
    b.toString
  }

  /** PersianNormalizer (Fa/PersianNormalizer.cs:60-95): farsi yeh and
    * yeh barree → arabic yeh, keheh → kaf, heh+yeh / heh goal → heh,
    * hamza above deleted. */
  def persianNormalize(term: String): String = {
    val b = new StringBuilder
    for (c <- term) c match {
      case 'ی' | 'ے' => b.append('ي') // yeh forms
      case 'ک' => b.append('ك') // keheh -> kaf
      case 'ۀ' | 'ہ' => b.append('ه') // heh forms
      case 'ٔ' => // hamza above deleted
      case other => b.append(other)
    }
    b.toString
  }

  /** HyphenatedWordsFilter (Miscellaneous/HyphenatedWordsFilter.cs:
    * 78-130): tokens ending in '-' accumulate (hyphens dropped) until a
    * non-hyphen-ended token completes the word; the joined token takes
    * the FIRST part's start offset and position and the LAST part's end
    * offset; a stream ending mid-accumulation restores the trailing
    * hyphen. Meant after a whitespace-style tokenizer that keeps '-'. */
  def hyphenatedWords(ts: Array[Token]): Array[Token] = {
    val out = ArrayBuffer.empty[Token]
    var acc: StringBuilder = null
    var first: Token = null
    var lastEnd = 0
    for (t <- ts) {
      if (t.term.nonEmpty && t.term.last == '-') {
        if (acc == null) { acc = new StringBuilder; first = t }
        acc.append(t.term.dropRight(1))
        lastEnd = t.endOff
      } else if (acc == null) {
        out += t
      } else {
        acc.append(t.term)
        out += Token(acc.toString, first.position, first.startOff, t.endOff)
        acc = null
      }
    }
    if (acc != null) // stream ended with a hyphen: restore it (:115-121)
      out += Token(acc.toString + "-", first.position, first.startOff, lastEnd)
    out.toArray
  }

  /** ThaiTokenizer (Th/ThaiTokenizer.cs): dictionary-based Thai word
    * segmentation via the platform break iterator (the JDK ships the
    * Thai word dictionary the reference gets from ICU); non-word
    * segments (spaces, punctuation) are skipped. */
  def thaiTokenize(s: String): Array[Token] = {
    val bi = java.text.BreakIterator.getWordInstance(new java.util.Locale("th"))
    bi.setText(s)
    val out = ArrayBuffer.empty[Token]
    var start = bi.first()
    var end = bi.next()
    var pos = -1
    while (end != java.text.BreakIterator.DONE) {
      val w = s.substring(start, end)
      if (w.exists(c => Character.isLetterOrDigit(c))) {
        pos += 1
        out += Token(w, pos, start, end)
      }
      start = end
      end = bi.next()
    }
    out.toArray
  }
}
