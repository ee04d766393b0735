package graft.analysis

/** Krovetz stemmer (KStem) — the reference's dictionary-validated English
  * stemmer: `Analysis/En/KStemmer.cs` (rule engine, 2072 lines) wrapped by
  * `Analysis/En/KStemFilter.cs`. Unlike Porter, every transformation is
  * checked against a lexicon and accepted only when it lands on a known
  * word (or is a "very productive" ending the algorithm accepts blind);
  * un-derivable words fall back to documented default rewrites.
  *
  * The rule cascade below restates the reference engine EXACTLY — the
  * same 17 ending routines in the same order, the same retained-default
  * rewrites on lookup failure, the same exception-word and un-prefix
  * quirks, including the reference's own oddities (the `// ERROR`-marked
  * extra lookup in the -ical branch of AlEndings, KStemmer.cs:1725-1732,
  * and the stale-buffer reuse in ErAndOrEndings, KStemmer.cs:1550-1555,
  * which our length-only truncation reproduces).
  *
  * Dictionary: the reference inlines an English lexicon of ~30k entries
  * as eight generated data files (`Analysis/En/KStemData1.cs`..`8`). As
  * with Hunspell/Kuromoji in this engine, the bulk lexicon is
  * CALLER-SUPPLIED (any Iterable[String]); the algorithm's own small
  * constant tables — exception words (KStemmer.cs:79-85), direct
  * conflations (:87-128), country/nationality map (:130-281), supplement
  * words (:283-286) and proper nouns (:288-330) — are built in, because
  * they are part of the published algorithm, not corpus data. A lexicon
  * word that collides with a built-in keeps the built-in entry (the
  * reference's fixed dictionary would have thrown at init; with a
  * user-supplied lexicon the built-in simply wins).
  *
  * Instances are cheap after construction but NOT thread-safe (the spec's
  * mutable j/k/buffer state); use one per task/thread.
  */
final class KStemmer(lexicon: Iterable[String]) extends Serializable {
  import KStemmer._

  private val dict: java.util.HashMap[String, Entry] = {
    val d = new java.util.HashMap[String, Entry](4096)
    for (wd <- ExceptionWords) d.put(wd, new Entry(wd, true))
    for ((v, root) <- DirectConflations) d.put(v, new Entry(root, false))
    for ((nat, country) <- CountryNationality) d.put(nat, new Entry(country, false))
    val default = new Entry(null, false)
    for (wd <- SupplementDict) if (!d.containsKey(wd)) d.put(wd, default)
    for (wd <- ProperNouns) if (!d.containsKey(wd)) d.put(wd, default)
    val it = lexicon.iterator
    while (it.hasNext) { val wd = it.next(); if (!d.containsKey(wd)) d.put(wd, default) }
    d
  }

  // OpenStringBuilder analog: truncation via `len` only, so chars past the
  // length survive — ErAndOrEndings reads one of them back (see Scaladoc).
  @transient private var w: Array[Char] = _
  @transient private var len: Int = 0
  @transient private var j: Int = 0 // index of final letter in stem
  @transient private var k: Int = 0 // index of final letter in word
  @transient private var matched: Entry = _

  private def str: String = new String(w, 0, len)
  private def write(c: Char): Unit = { w(len) = c; len += 1 }
  private def append(s: String): Unit = { var i = 0; while (i < s.length) { write(s.charAt(i)); i += 1 } }
  /** replace the suffix after j with s (KStemmer.cs SetSuff) */
  private def setSuffix(s: String): Unit = { len = j + 1; append(s); k = j + s.length }

  private def lookup(): Boolean = { matched = dict.get(str); matched != null }

  /** KStemmer.cs WordInDict: cached; caches only non-exception hits. */
  private def wordInDict(): Entry = {
    if (matched != null) return matched
    val e = dict.get(str)
    if (e != null && !e.exception) matched = e
    e
  }

  private def isCons(i: Int): Boolean = {
    val ch = w(i)
    if (ch == 'a' || ch == 'e' || ch == 'i' || ch == 'o' || ch == 'u') false
    else if (ch != 'y' || i == 0) true
    else !isCons(i - 1)
  }
  private def isVowel(i: Int): Boolean = !isCons(i)
  private def vowelInStem(): Boolean = {
    var i = 0
    while (i <= j) { if (isVowel(i)) return true; i += 1 }
    false
  }
  private def doubleC(i: Int): Boolean =
    i >= 1 && w(i) == w(i - 1) && isCons(i)

  /** char[] overload: sets j = k on entry even when the match fails. */
  private def endsIn(s: String): Boolean = {
    if (s.length > k) return false
    val r = len - s.length
    j = k
    var i = 0
    while (i < s.length) { if (s.charAt(i) != w(r + i)) return false; i += 1 }
    j = r - 1
    true
  }
  private def endsIn(a: Char, b: Char): Boolean = {
    if (2 > k) return false
    if (w(k - 1) == a && w(k) == b) { j = k - 2; true } else false
  }
  private def endsIn(a: Char, b: Char, c: Char): Boolean = {
    if (3 > k) return false
    if (w(k - 2) == a && w(k - 1) == b && w(k) == c) { j = k - 3; true } else false
  }
  private def endsIn(a: Char, b: Char, c: Char, d: Char): Boolean = {
    if (4 > k) return false
    if (w(k - 3) == a && w(k - 2) == b && w(k - 1) == c && w(k) == d) { j = k - 4; true } else false
  }

  /** plurals → singular, -ies → y (KStemmer.cs Plural) */
  private def plural(): Unit = {
    if (w(k) != 's') return
    if (endsIn('i', 'e', 's')) {
      len = j + 3; k -= 1
      if (lookup()) return // calories -> calorie
      k += 1; write('s')
      setSuffix("y"); lookup(); ()
    } else if (endsIn('e', 's')) {
      len = j + 2; k -= 1
      // aides -> aide but aided -> aid; double-s guard keeps crosses -> cross
      val tryE = j > 0 && !(w(j) == 's' && w(j - 1) == 's')
      if (tryE && lookup()) return
      len = j + 1; k -= 1
      if (lookup()) return
      write('e'); k += 1 // default: retain the "e"
      if (!tryE) { lookup(); () }
    } else if (len > 3 && w(k - 1) != 's' && !endsIn('o', 'u', 's')) {
      len = k; k -= 1; lookup(); ()
    }
  }

  /** -ed → present, -ied → y (KStemmer.cs PastTense) */
  private def pastTense(): Unit = {
    if (len <= 4) return // fled stays (direct conflations handle short words)
    if (endsIn('i', 'e', 'd')) {
      len = j + 3; k -= 1
      if (lookup()) return
      k += 1; write('d')
      setSuffix("y"); lookup(); return
    }
    if (endsIn('e', 'd') && vowelInStem()) {
      len = j + 2; k = j + 1
      val entry = wordInDict()
      if (entry != null && !entry.exception) return
      len = j + 1; k = j
      if (lookup()) return
      if (doubleC(k)) { // backfilled -> backfill, not backfille
        len = k; k -= 1
        if (lookup()) return
        write(w(k)); k += 1 // default: leave it doubled
        lookup(); return
      }
      if (w(0) == 'u' && w(1) == 'n') { // un- prefixed: leave the word alone
        write('e'); write('d'); k += 2
        return
      }
      len = j + 1; write('e'); k = j + 1 // microcoded -> microcode
    }
  }

  /** -ing endings (KStemmer.cs Aspect) */
  private def aspect(): Unit = {
    if (len <= 5) return
    if (endsIn('i', 'n', 'g') && vowelInStem()) {
      w(j + 1) = 'e'; len = j + 2; k = j + 1
      val entry = wordInDict()
      if (entry != null && !entry.exception) return
      len = k; k -= 1
      if (lookup()) return
      if (doubleC(k)) {
        k -= 1; len = k + 1
        if (lookup()) return
        write(w(k)); k += 1 // default: leave doubled (fingerspelling -> fingerspell)
        lookup(); return
      }
      if (j > 0 && isCons(j) && isCons(j - 1)) { // two consonants: no trailing e
        k = j; len = k + 1
        return
      }
      len = j + 1; write('e'); k = j + 1 // microcoding -> microcode
    }
  }

  /** -ity/-ability/-ibility/-ality/-ivity (KStemmer.cs ItyEndings) */
  private def ityEndings(): Unit = {
    val oldK = k
    if (endsIn('i', 't', 'y')) {
      len = j + 1; k = j
      if (lookup()) return
      write('e'); k = j + 1 // immunity -> immune
      if (lookup()) return
      w(j + 1) = 'i'; append("ty"); k = oldK
      if (j > 0 && w(j - 1) == 'i' && w(j) == 'l') { // -ability/-ibility -> -ble, blind
        len = j - 1; append("le"); k = j; lookup(); return
      }
      if (j > 0 && w(j - 1) == 'i' && w(j) == 'v') { // -ivity -> -ive
        len = j + 1; write('e'); k = j + 1; lookup(); return
      }
      if (j > 0 && w(j - 1) == 'a' && w(j) == 'l') { // -ality -> -al
        len = j + 1; k = j; lookup(); return
      }
      if (lookup()) return // variant itself in dict beats capac
      len = j + 1; k = j // default: drop -ity
    }
  }

  /** -ness (KStemmer.cs NessEndings) */
  private def nessEndings(): Unit = {
    if (endsIn('n', 'e', 's', 's')) {
      len = j + 1; k = j
      if (w(j) == 'i') w(j) = 'y'
      lookup(); ()
    }
  }

  /** -ism (KStemmer.cs IsmEndings) */
  private def ismEndings(): Unit = {
    if (endsIn('i', 's', 'm')) { len = j + 1; k = j; lookup(); () }
  }

  /** -ment (KStemmer.cs MentEndings) */
  private def mentEndings(): Unit = {
    val oldK = k
    if (endsIn('m', 'e', 'n', 't')) {
      len = j + 1; k = j
      if (lookup()) return
      append("ment"); k = oldK
    }
  }

  /** -ize (KStemmer.cs IzeEndings) */
  private def izeEndings(): Unit = {
    val oldK = k
    if (endsIn('i', 'z', 'e')) {
      len = j + 1; k = j
      if (lookup()) return
      write('i')
      if (doubleC(j)) {
        len = j; k = j - 1
        if (lookup()) return
        write(w(j - 1))
      }
      len = j + 1; write('e'); k = j + 1
      if (lookup()) return
      len = j + 1; append("ize"); k = oldK
    }
  }

  /** -ency/-ancy → -ent or -ence (KStemmer.cs NcyEndings) */
  private def ncyEndings(): Unit = {
    if (endsIn('n', 'c', 'y')) {
      if (!(w(j) == 'e' || w(j) == 'a')) return
      w(j + 2) = 't'; len = j + 3; k = j + 2 // -ncy -> -nt
      if (lookup()) return
      w(j + 2) = 'c'; write('e'); k = j + 3 // default -nce
      lookup(); ()
    }
  }

  /** -ence/-ance (KStemmer.cs NceEndings) */
  private def nceEndings(): Unit = {
    val oldK = k
    if (endsIn('n', 'c', 'e')) {
      val wc = w(j)
      if (!(wc == 'e' || wc == 'a')) return
      len = j; write('e'); k = j // adherance -> adhere
      if (lookup()) return
      len = j; k = j - 1 // disappearance -> disappear
      if (lookup()) return
      write(wc); append("nce"); k = oldK
    }
  }

  /** -able/-ible (KStemmer.cs BleEndings) */
  private def bleEndings(): Unit = {
    val oldK = k
    if (endsIn('b', 'l', 'e')) {
      if (!(w(j) == 'a' || w(j) == 'i')) return
      val wc = w(j)
      len = j; k = j - 1
      if (lookup()) return
      if (doubleC(k)) {
        len = k; k -= 1
        if (lookup()) return
        k += 1; write(w(k - 1))
      }
      len = j; write('e'); k = j
      if (lookup()) return
      len = j; append("ate"); k = j + 2 // compensable -> compensate
      if (lookup()) return
      len = j; write(wc); append("ble"); k = oldK
    }
  }

  /** -ic, incl. the one EXPANDING rewrite -ic → -ical (KStemmer.cs IcEndings) */
  private def icEndings(): Unit = {
    if (endsIn('i', 'c')) {
      len = j + 3; append("al"); k = j + 4 // canonic -> canonical
      if (lookup()) return
      w(j + 1) = 'y'; len = j + 2; k = j + 1
      if (lookup()) return
      w(j + 1) = 'e'
      if (lookup()) return
      len = j + 1; k = j
      if (lookup()) return
      append("ic"); k = j + 2
    }
  }

  /** -ion/-ition/-ation/-ization/-ication (KStemmer.cs IonEndings) */
  private def ionEndings(): Unit = {
    val oldK = k
    if (!endsIn('i', 'o', 'n')) return
    if (endsIn("ization")) { // -ize is productive: accept blind
      len = j + 3; write('e'); k = j + 3; lookup(); return
    }
    if (endsIn("ition")) {
      len = j + 1; write('e'); k = j + 1
      if (lookup()) return // definition -> define
      len = j + 1; append("ition"); k = oldK
    } else if (endsIn("ation")) {
      len = j + 3; write('e'); k = j + 3
      if (lookup()) return // elimination -> eliminate
      len = j + 1; write('e'); k = j + 1
      if (lookup()) return
      len = j + 1; k = j
      if (lookup()) return // resignation -> resign
      len = j + 1; append("ation"); k = oldK
    }
    // -ication AFTER -ation so complication -> complicate, not comply
    if (endsIn("ication")) {
      len = j + 1; write('y'); k = j + 1
      if (lookup()) return // amplification -> amplify
      len = j + 1; append("ication"); k = oldK
    }
    // plain -ion (the reference resets j explicitly: the EndsIn calls above moved it)
    j = k - 3
    len = j + 1; write('e'); k = j + 1
    if (lookup()) return
    len = j + 1; k = j
    if (lookup()) return
    len = j + 1; append("ion"); k = oldK
  }

  /** -er/-or/-ier/-eer, -izer → -ize (KStemmer.cs ErAndOrEndings) */
  private def erAndOrEndings(): Unit = {
    val oldK = k
    if (w(k) != 'r') return
    if (endsIn('i', 'z', 'e', 'r')) {
      len = j + 4; k = j + 3; lookup(); return
    }
    if (endsIn('e', 'r') || endsIn('o', 'r')) {
      val wc = w(j + 1) // remember -er vs -or
      if (doubleC(j)) {
        len = j; k = j - 1
        if (lookup()) return
        write(w(j - 1)) // restore the doubled consonant
      }
      if (w(j) == 'i') { // -ier: happier -> happy
        w(j) = 'y'; len = j + 1; k = j
        if (lookup()) return
        w(j) = 'i'; write('e')
      }
      if (w(j) == 'e') { // -eer
        len = j; k = j - 1
        if (lookup()) return
        write('e')
      }
      len = j + 2; k = j + 1 // remove just the -r
      if (lookup()) return
      len = j + 1; k = j // remove -er/-or
      if (lookup()) return
      write('e'); k = j + 1 // remove -or, add -e
      if (lookup()) return
      len = j + 1; write(wc); write('r'); k = oldK
    }
  }

  /** -ly, -ally → -al, -ably → -able, -ily → -y (KStemmer.cs LyEndings) */
  private def lyEndings(): Unit = {
    val oldK = k
    if (endsIn('l', 'y')) {
      w(j + 2) = 'e' // -ly -> -le
      if (lookup()) return
      w(j + 2) = 'y'
      len = j + 1; k = j
      if (lookup()) return
      if (j > 0 && w(j - 1) == 'a' && w(j) == 'l') return // always -ally -> -al
      append("ly"); k = oldK
      if (j > 0 && w(j - 1) == 'a' && w(j) == 'b') { // always -ably -> -able
        w(j + 2) = 'e'; k = j + 2
        return
      }
      if (w(j) == 'i') { // militarily -> military
        len = j; write('y'); k = j
        if (lookup()) return
        len = j; append("ily"); k = oldK
      }
      len = j + 1; k = j // default: drop -ly
    }
  }

  /** -al, -ical, -ial (KStemmer.cs AlEndings) */
  private def alEndings(): Unit = {
    val oldK = k
    if (len < 4) return
    if (endsIn('a', 'l')) {
      len = j + 1; k = j
      if (lookup()) return
      if (doubleC(j)) {
        len = j; k = j - 1
        if (lookup()) return
        write(w(j - 1))
      }
      len = j + 1; write('e'); k = j + 1
      if (lookup()) return
      len = j + 1; append("um"); k = j + 2 // optimal -> optimum
      if (lookup()) return
      len = j + 1; append("al"); k = oldK
      if (j > 0 && w(j - 1) == 'i' && w(j) == 'c') {
        len = j - 1; k = j - 2 // drop -ical
        if (lookup()) return
        len = j - 1; write('y'); k = j - 1 // bibliographical -> bibliography
        if (lookup()) return
        len = j - 1; append("ic"); k = j // default -ical -> -ic
        lookup() // the reference's own "// ERROR" extra lookup — kept for parity
        return
      }
      if (w(j) == 'i') { // -ial
        len = j; k = j - 1
        if (lookup()) return
        append("ial"); k = oldK; lookup(); ()
      }
    }
  }

  /** -ive/-ative, -ive → -ion (KStemmer.cs IveEndings) */
  private def iveEndings(): Unit = {
    val oldK = k
    if (endsIn('i', 'v', 'e')) {
      len = j + 1; k = j
      if (lookup()) return
      write('e'); k = j + 1
      if (lookup()) return
      len = j + 1; append("ive")
      if (j > 0 && w(j - 1) == 'a' && w(j) == 't') {
        w(j - 1) = 'e'; len = j; k = j - 1 // determinative -> determine
        if (lookup()) return
        len = j - 1 // just drop -ative
        if (lookup()) return
        append("ative"); k = oldK
      }
      w(j + 2) = 'o'; w(j + 3) = 'n' // injunctive -> injunction
      if (lookup()) return
      w(j + 2) = 'v'; w(j + 3) = 'e'; k = oldK
    }
  }

  /** Stem one (already-lowercased) term. Returns the term itself when the
    * stemmer declines (too short/long, non-alpha, dictionary no-change). */
  // Owner-thread guard: the j/k/buffer state corrupts SILENTLY under
  // concurrent use, so the first stem() pins the instance to its thread
  // and any other thread fails loudly. Deserialized task copies re-pin
  // (transient), so the construct-per-partition idiom is unaffected;
  // genuinely shared use goes through [[KStemmer.threadLocal]].
  @transient private var ownerThread: Long = 0L

  def stem(term: String): String = {
    val t = Thread.currentThread().getId
    if (ownerThread == 0L) ownerThread = t
    else if (ownerThread != t)
      throw new IllegalStateException(
        s"KStemmer is not thread-safe: owned by thread $ownerThread, " +
          s"called from $t — construct per task or use KStemmer.threadLocal")
    k = term.length - 1
    if (k <= 1 || k >= MaxWordLen - 1) return term
    val e0 = dict.get(term)
    if (e0 != null) return if (e0.root != null) e0.root else term
    var i = 0
    while (i < term.length) {
      val ch = term.charAt(i)
      if (ch < 'a' || ch > 'z') return term // don't stem non-alpha
      i += 1
    }
    if (w == null || w.length < term.length + 10) w = new Array[Char](term.length + 10)
    len = 0
    i = 0
    while (i < term.length) { write(term.charAt(i)); i += 1 }
    matched = null

    val done =
      { plural(); matched != null } ||
      { pastTense(); matched != null } ||
      { aspect(); matched != null } ||
      { ityEndings(); matched != null } ||
      { nessEndings(); matched != null } ||
      { ionEndings(); matched != null } ||
      { erAndOrEndings(); matched != null } ||
      { lyEndings(); matched != null } ||
      { alEndings(); matched != null } ||
      { wordInDict(); iveEndings(); matched != null } ||
      { izeEndings(); matched != null } ||
      { mentEndings(); matched != null } ||
      { bleEndings(); matched != null } ||
      { ismEndings(); matched != null } ||
      { icEndings(); matched != null } ||
      { ncyEndings(); matched != null } ||
      { nceEndings(); true }
    val _ = done

    // direct mapping at the end: Italians -> Italian entry -> italy
    if (matched != null && matched.root != null) matched.root else str
  }
}

object KStemmer {
  private[analysis] val MaxWordLen = 50

  /** A share-safe stem function: one [[KStemmer]] per calling thread
    * (lazily built), so a single reference can cross thread boundaries —
    * e.g. captured by a long-lived service — without tripping the
    * owner-thread guard or corrupting buffer state. */
  def threadLocal(lexicon: Iterable[String]): String => String = {
    val tl = new ThreadLocal[KStemmer] {
      override def initialValue(): KStemmer = new KStemmer(lexicon)
    }
    term => tl.get().stem(term)
  }

  final class Entry(val root: String, val exception: Boolean) extends Serializable

  /** KStemmer.cs:79-85 exceptionWords — in-dictionary words that must NOT
    * be accepted as the root of a longer derivation (aided→aid, not aide). */
  private[analysis] val ExceptionWords: Array[String] = Array(
    "aide", "bathe", "caste", "cute", "dame", "dime", "doge", "done", "dune",
    "envelope", "gage", "grille", "grippe", "lobe", "mane", "mare", "nape",
    "node", "pane", "pate", "plane", "pope", "programme", "quite", "ripe",
    "rote", "rune", "sage", "severe", "shoppe", "sine", "slime", "snipe",
    "steppe", "suite", "swinge", "tare", "tine", "tope", "tripe", "twine")

  /** KStemmer.cs:87-128 directConflations — irregular variant → root. */
  private[analysis] val DirectConflations: Array[(String, String)] = Array(
    "aging" -> "age", "going" -> "go", "goes" -> "go", "lying" -> "lie",
    "using" -> "use", "owing" -> "owe", "suing" -> "sue", "dying" -> "die",
    "tying" -> "tie", "vying" -> "vie", "aged" -> "age", "used" -> "use",
    "vied" -> "vie", "cued" -> "cue", "died" -> "die", "eyed" -> "eye",
    "hued" -> "hue", "iced" -> "ice", "lied" -> "lie", "owed" -> "owe",
    "sued" -> "sue", "toed" -> "toe", "tied" -> "tie", "does" -> "do",
    "doing" -> "do", "aeronautical" -> "aeronautics",
    "mathematical" -> "mathematics", "political" -> "politics",
    "metaphysical" -> "metaphysics", "cylindrical" -> "cylinder",
    "nazism" -> "nazi", "ambiguity" -> "ambiguous", "barbarity" -> "barbarous",
    "credulity" -> "credulous", "generosity" -> "generous",
    "spontaneity" -> "spontaneous", "unanimity" -> "unanimous",
    "voracity" -> "voracious", "fled" -> "flee", "miscarriage" -> "miscarry")

  /** KStemmer.cs:130-281 countryNationality — nationality → country. */
  private[analysis] val CountryNationality: Array[(String, String)] = Array(
    "afghan" -> "afghanistan", "african" -> "africa", "albanian" -> "albania",
    "algerian" -> "algeria", "american" -> "america", "andorran" -> "andorra",
    "angolan" -> "angola", "arabian" -> "arabia", "argentine" -> "argentina",
    "armenian" -> "armenia", "asian" -> "asia", "australian" -> "australia",
    "austrian" -> "austria", "azerbaijani" -> "azerbaijan",
    "azeri" -> "azerbaijan", "bangladeshi" -> "bangladesh",
    "belgian" -> "belgium", "bermudan" -> "bermuda", "bolivian" -> "bolivia",
    "bosnian" -> "bosnia", "botswanan" -> "botswana", "brazilian" -> "brazil",
    "british" -> "britain", "bulgarian" -> "bulgaria", "burmese" -> "burma",
    "californian" -> "california", "cambodian" -> "cambodia",
    "canadian" -> "canada", "chadian" -> "chad", "chilean" -> "chile",
    "chinese" -> "china", "colombian" -> "colombia", "croat" -> "croatia",
    "croatian" -> "croatia", "cuban" -> "cuba", "cypriot" -> "cyprus",
    "czechoslovakian" -> "czechoslovakia", "danish" -> "denmark",
    "egyptian" -> "egypt", "equadorian" -> "equador", "eritrean" -> "eritrea",
    "estonian" -> "estonia", "ethiopian" -> "ethiopia",
    "european" -> "europe", "fijian" -> "fiji", "filipino" -> "philippines",
    "finnish" -> "finland", "french" -> "france", "gambian" -> "gambia",
    "georgian" -> "georgia", "german" -> "germany", "ghanian" -> "ghana",
    "greek" -> "greece", "grenadan" -> "grenada", "guamian" -> "guam",
    "guatemalan" -> "guatemala", "guinean" -> "guinea", "guyanan" -> "guyana",
    "haitian" -> "haiti", "hawaiian" -> "hawaii", "holland" -> "dutch",
    "honduran" -> "honduras", "hungarian" -> "hungary",
    "icelandic" -> "iceland", "indonesian" -> "indonesia",
    "iranian" -> "iran", "iraqi" -> "iraq", "iraqui" -> "iraq",
    "irish" -> "ireland", "israeli" -> "israel", "italian" -> "italy",
    "jamaican" -> "jamaica", "japanese" -> "japan", "jordanian" -> "jordan",
    "kampuchean" -> "cambodia", "kenyan" -> "kenya", "korean" -> "korea",
    "kuwaiti" -> "kuwait", "lankan" -> "lanka", "laotian" -> "laos",
    "latvian" -> "latvia", "lebanese" -> "lebanon", "liberian" -> "liberia",
    "libyan" -> "libya", "lithuanian" -> "lithuania",
    "macedonian" -> "macedonia", "madagascan" -> "madagascar",
    "malaysian" -> "malaysia", "maltese" -> "malta",
    "mauritanian" -> "mauritania", "mexican" -> "mexico",
    "micronesian" -> "micronesia", "moldovan" -> "moldova",
    "monacan" -> "monaco", "mongolian" -> "mongolia",
    "montenegran" -> "montenegro", "moroccan" -> "morocco",
    "myanmar" -> "burma", "namibian" -> "namibia", "nepalese" -> "nepal",
    "nicaraguan" -> "nicaragua", "nigerian" -> "nigeria",
    "norwegian" -> "norway", "omani" -> "oman", "pakistani" -> "pakistan",
    "panamanian" -> "panama", "papuan" -> "papua",
    "paraguayan" -> "paraguay", "peruvian" -> "peru",
    "portuguese" -> "portugal", "romanian" -> "romania",
    "rumania" -> "romania", "rumanian" -> "romania", "russian" -> "russia",
    "rwandan" -> "rwanda", "samoan" -> "samoa", "scottish" -> "scotland",
    "serb" -> "serbia", "serbian" -> "serbia", "siam" -> "thailand",
    "siamese" -> "thailand", "slovakia" -> "slovak", "slovakian" -> "slovak",
    "slovenian" -> "slovenia", "somali" -> "somalia",
    "somalian" -> "somalia", "spanish" -> "spain", "swedish" -> "sweden",
    "swiss" -> "switzerland", "syrian" -> "syria", "taiwanese" -> "taiwan",
    "tanzanian" -> "tanzania", "texan" -> "texas", "thai" -> "thailand",
    "tunisian" -> "tunisia", "turkish" -> "turkey", "ugandan" -> "uganda",
    "ukrainian" -> "ukraine", "uruguayan" -> "uruguay",
    "uzbek" -> "uzbekistan", "venezuelan" -> "venezuela",
    "vietnamese" -> "viet", "virginian" -> "virginia", "yemeni" -> "yemen",
    "yugoslav" -> "yugoslavia", "yugoslavian" -> "yugoslavia",
    "zambian" -> "zambia", "zealander" -> "zealand",
    "zimbabwean" -> "zimbabwe")

  /** KStemmer.cs:283-286 supplementDict. */
  private[analysis] val SupplementDict: Array[String] = Array(
    "aids", "applicator", "capacitor", "digitize", "electromagnet",
    "ellipsoid", "exosphere", "extensible", "ferromagnet", "graphics",
    "hydromagnet", "polygraph", "toroid", "superconduct", "backscatter",
    "connectionism")

  /** KStemmer.cs:288-330 properNouns — names that must not be stemmed
    * (their final "s" is not a plural). Stored as default entries. */
  private[analysis] val ProperNouns: Array[String] = Array(
    "abrams", "achilles", "acropolis", "adams", "agnes", "aires",
    "alexander", "alexis", "alfred", "algiers", "alps", "amadeus", "ames",
    "amos", "andes", "angeles", "annapolis", "antilles", "aquarius",
    "archimedes", "arkansas", "asher", "ashly", "athens", "atkins",
    "atlantis", "avis", "bahamas", "bangor", "barbados", "barger", "bering",
    "brahms", "brandeis", "brussels", "bruxelles", "cairns", "camoros",
    "camus", "carlos", "celts", "chalker", "charles", "cheops", "ching",
    "christmas", "cocos", "collins", "columbus", "confucius", "conners",
    "connolly", "copernicus", "cramer", "cyclops", "cygnus", "cyprus",
    "dallas", "damascus", "daniels", "davies", "davis", "decker", "denning",
    "dennis", "descartes", "dickens", "doris", "douglas", "downs",
    "dreyfus", "dukakis", "dulles", "dumfries", "ecclesiastes", "edwards",
    "emily", "erasmus", "euphrates", "evans", "everglades", "fairbanks",
    "federales", "fisher", "fitzsimmons", "fleming", "forbes", "fowler",
    "france", "francis", "goering", "goodling", "goths", "grenadines",
    "guiness", "hades", "harding", "harris", "hastings", "hawkes",
    "hawking", "hayes", "heights", "hercules", "himalayas", "hippocrates",
    "hobbs", "holmes", "honduras", "hopkins", "hughes", "humphreys",
    "illinois", "indianapolis", "inverness", "iris", "iroquois", "irving",
    "isaacs", "italy", "james", "jarvis", "jeffreys", "jesus", "jones",
    "josephus", "judas", "julius", "kansas", "keynes", "kipling",
    "kiwanis", "lansing", "laos", "leeds", "levis", "leviticus", "lewis",
    "louis", "maccabees", "madras", "maimonides", "maldive",
    "massachusetts", "matthews", "mauritius", "memphis", "mercedes",
    "midas", "mingus", "minneapolis", "mohammed", "moines", "morris",
    "moses", "myers", "myknos", "nablus", "nanjing", "nantes", "naples",
    "neal", "netherlands", "nevis", "nostradamus", "oedipus", "olympus",
    "orleans", "orly", "papas", "paris", "parker", "pauling", "peking",
    "pershing", "peter", "peters", "philippines", "phineas", "pisces",
    "pryor", "pythagoras", "queens", "rabelais", "ramses", "reynolds",
    "rhesus", "rhodes", "richards", "robins", "rodgers", "rogers",
    "rubens", "sagittarius", "seychelles", "socrates", "texas", "thames",
    "thomas", "tiberias", "tunis", "venus", "vilnius", "wales", "warner",
    "wilkins", "williams", "wyoming", "xmas", "yonkers", "zeus", "frances",
    "aarhus", "adonis", "andrews", "angus", "antares", "aquinas",
    "arcturus", "ares", "artemis", "augustus", "ayers", "barnabas",
    "barnes", "becker", "bejing", "biggs", "billings", "boeing", "boris",
    "borroughs", "briggs", "buenos", "calais", "caracas", "cassius",
    "cerberus", "ceres", "cervantes", "chantilly", "chartres", "chester",
    "connally", "conner", "coors", "cummings", "curtis", "daedalus",
    "dionysus", "dobbs", "dolores", "edmonds")
}
