package graft.analysis

/** The original GermanStemFilter stemmer — Caumanns' algorithm
  * (reference: /root/reference/src/Lucene.Net.Analysis.Common/Analysis/
  * De/GermanStemmer.cs:48-307, the still-supported non-Snowball German
  * option; Jörg Caumanns, "A Fast and Simple Stemming Algorithm for
  * German Words", 1999). Restated phase-by-phase with the reference's
  * quirks preserved:
  *
  *  - Substitute marks doubled letters '*', folds umlauts/ß, and encodes
  *    multi-char sounds (sch→$, ch→§, ei→%, ie→&, ig→#, st→!) so Strip
  *    can't split them; the "sch" branch ASSIGNS substCount = 2 instead
  *    of adding (the reference's `substCount = +2`);
  *  - Strip repeatedly removes nd/em/er (length+substCount-gated) and
  *    single e/s/n/t while length > 3;
  *  - Optimize re-strips after dropping the '*' of a trailing "erin*"
  *    and rewrites a trailing z→x;
  *  - Resubstitute undoes the encodings ('*' duplicates its left
  *    neighbor);
  *  - RemoveParticleDenotion deletes the first "ge" of an interior
  *    "gege" sequence.
  *
  * Reference vectors (TestGermanAnalyzer.cs:33-70): tisch/tische/tischen
  * → tisch, schaltflächen → schaltflach. */
object GermanStemmer {

  def stem(term0: String): String = {
    val term = term0.toLowerCase(java.util.Locale.GERMAN)
    if (!term.forall(Character.isLetter)) return term
    val sb = new java.lang.StringBuilder(term)
    var substCount = 0

    def strip(): Unit = {
      var doMore = true
      while (doMore && sb.length > 3) {
        val len = sb.length
        def endsWith2(s: String) =
          len >= 2 && sb.charAt(len - 2) == s.charAt(0) && sb.charAt(len - 1) == s.charAt(1)
        if (len + substCount > 5 && endsWith2("nd")) sb.delete(len - 2, len)
        else if (len + substCount > 4 && endsWith2("em")) sb.delete(len - 2, len)
        else if (len + substCount > 4 && endsWith2("er")) sb.delete(len - 2, len)
        else if (sb.charAt(len - 1) == 'e') sb.deleteCharAt(len - 1)
        else if (sb.charAt(len - 1) == 's') sb.deleteCharAt(len - 1)
        else if (sb.charAt(len - 1) == 'n') sb.deleteCharAt(len - 1)
        else if (sb.charAt(len - 1) == 't') sb.deleteCharAt(len - 1)
        else doMore = false
      }
    }

    // Substitute
    var c = 0
    while (c < sb.length) {
      if (c > 0 && sb.charAt(c) == sb.charAt(c - 1)) sb.setCharAt(c, '*')
      else sb.charAt(c) match {
        case 'ä' => sb.setCharAt(c, 'a')
        case 'ö' => sb.setCharAt(c, 'o')
        case 'ü' => sb.setCharAt(c, 'u')
        case 'ß' => sb.setCharAt(c, 's'); sb.insert(c + 1, 's'); substCount += 1
        case _ =>
      }
      if (c < sb.length - 1) {
        if (c < sb.length - 2 && sb.charAt(c) == 's' && sb.charAt(c + 1) == 'c' &&
            sb.charAt(c + 2) == 'h') {
          sb.setCharAt(c, '$'); sb.delete(c + 1, c + 3)
          substCount = 2 // the reference's `substCount = +2` assignment
        } else if (sb.charAt(c) == 'c' && sb.charAt(c + 1) == 'h') {
          sb.setCharAt(c, '§'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 'e' && sb.charAt(c + 1) == 'i') {
          sb.setCharAt(c, '%'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 'i' && sb.charAt(c + 1) == 'e') {
          sb.setCharAt(c, '&'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 'i' && sb.charAt(c + 1) == 'g') {
          sb.setCharAt(c, '#'); sb.deleteCharAt(c + 1); substCount += 1
        } else if (sb.charAt(c) == 's' && sb.charAt(c + 1) == 't') {
          sb.setCharAt(c, '!'); sb.deleteCharAt(c + 1); substCount += 1
        }
      }
      c += 1
    }

    strip()

    // Optimize
    if (sb.length > 5 && sb.substring(sb.length - 5) == "erin*") {
      sb.deleteCharAt(sb.length - 1)
      strip()
    }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == 'z')
      sb.setCharAt(sb.length - 1, 'x')

    // Resubstitute
    c = 0
    while (c < sb.length) {
      sb.charAt(c) match {
        case '*' => sb.setCharAt(c, sb.charAt(c - 1))
        case '$' => sb.setCharAt(c, 's'); sb.insert(c + 1, "ch")
        case '§' => sb.setCharAt(c, 'c'); sb.insert(c + 1, 'h')
        case '%' => sb.setCharAt(c, 'e'); sb.insert(c + 1, 'i')
        case '&' => sb.setCharAt(c, 'i'); sb.insert(c + 1, 'e')
        case '#' => sb.setCharAt(c, 'i'); sb.insert(c + 1, 'g')
        case '!' => sb.setCharAt(c, 's'); sb.insert(c + 1, 't')
        case _ =>
      }
      c += 1
    }

    // RemoveParticleDenotion: first interior "gege" loses its first "ge"
    if (sb.length > 4) {
      var i = 0
      var done = false
      while (!done && i < sb.length - 3) {
        if (sb.substring(i, i + 4) == "gege") { sb.delete(i, i + 2); done = true }
        i += 1
      }
    }
    sb.toString
  }
}
