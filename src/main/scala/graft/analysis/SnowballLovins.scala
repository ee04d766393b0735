package graft.analysis

/** Lovins stemmer (J.B. Lovins, 1968, "Development of a stemming algorithm",
  * Mechanical Translation and Computational Linguistics 11) as standardised by
  * the Snowball project's `lovins` algorithm — the variant the reference ships
  * (reference: Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/LovinsStemmer.cs,
  * exercised by Lucene.Net.Tests.Analysis.Common/Analysis/Snowball/TestSnowballVocab.cs
  * over the official lovins voc.txt/output.txt pair).
  *
  * Three passes over the word, longest-match first:
  *   1. endings — remove the longest of 294 endings whose context condition
  *      (A..CC, below) holds on the remaining stem; conditions that fail
  *      backtrack to the next-longest matching ending (Snowball `among`
  *      semantics).
  *   2. undouble — drop one letter of a terminal bb dd gg ll mm nn pp rr ss tt.
  *   3. respell — 34 partial-match recoding rules (uad→uas, iev→ief, …), a few
  *      guarded by the letter immediately before the matched tail.
  *
  * Data tables are the published 1968 appendix (ending → condition); the
  * engine below is ours. Validated against all ~8.7k distinct vector pairs of
  * the official lovins vocabulary in StemmerSpec.
  */
object SnowballLovins {

  // Condition id → predicate over the candidate stem (word minus ending).
  // "ends" checks run on the stem; hop-N = minimum stem length N.
  private def cond(id: String, s: String): Boolean = {
    val n = s.length
    def ends(t: String) = s.endsWith(t)
    id match {
      case "A" => n >= 2
      case "B" => n >= 3
      case "C" => n >= 4
      case "D" => n >= 5
      case "E" => n >= 2 && !ends("e")
      case "F" => n >= 3 && !ends("e")
      case "G" => n >= 3 && ends("f")
      case "H" => n >= 2 && (ends("t") || ends("ll"))
      case "I" => n >= 2 && !ends("o") && !ends("e")
      case "J" => n >= 2 && !ends("a") && !ends("e")
      case "K" => n >= 3 && (ends("l") || ends("i") || (ends("e") && s.charAt(n - 3) == 'u'))
      case "L" => n >= 2 && !ends("u") && !ends("x") && !(ends("s") && !(n >= 2 && s.charAt(n - 2) == 'o'))
      case "M" => n >= 2 && !ends("a") && !ends("c") && !ends("e") && !ends("m")
      case "N" => n >= 3 && (s.charAt(n - 3) != 's' || n >= 4)
      case "O" => n >= 2 && (ends("l") || ends("i"))
      case "P" => n >= 2 && !ends("c")
      case "Q" => n >= 3 && !ends("l") && !ends("n")
      case "R" => n >= 2 && (ends("n") || ends("r"))
      case "S" => n >= 2 && (ends("dr") || (ends("t") && !ends("tt")))
      case "T" => n >= 2 && (ends("s") || (ends("t") && !(n >= 2 && s.charAt(n - 2) == 'o')))
      case "U" => n >= 2 && (ends("l") || ends("m") || ends("n") || ends("r"))
      case "V" => n >= 2 && ends("c")
      case "W" => n >= 2 && !ends("s") && !ends("u")
      case "X" => n >= 2 && (ends("l") || ends("i") || (n >= 3 && ends("e") && s.charAt(n - 3) == 'u'))
      case "Y" => n >= 2 && ends("in")
      case "Z" => n >= 2 && !ends("f")
      case "AA" => n >= 2 && (ends("d") || ends("f") || ends("ph") || ends("th") ||
        ends("l") || ends("er") || ends("or") || ends("es") || ends("t"))
      case "BB" => n >= 3 && !ends("met") && !ends("ryst")
      case "CC" => n >= 2 && ends("l")
      case _ => false
    }
  }

  // The 294 endings of the 1968 appendix, longest first (max 11 chars).
  private val endings: Array[(String, String)] = Array(
    ("alistically", "B"),
    ("arizability", "A"),
    ("izationally", "B"),
    ("antialness", "A"),
    ("arisations", "A"),
    ("arizations", "A"),
    ("entialness", "A"),
    ("allically", "C"),
    ("antaneous", "A"),
    ("antiality", "A"),
    ("arisation", "A"),
    ("arization", "A"),
    ("ationally", "B"),
    ("ativeness", "A"),
    ("eableness", "E"),
    ("entations", "A"),
    ("entiality", "A"),
    ("entialize", "A"),
    ("entiation", "A"),
    ("ionalness", "A"),
    ("istically", "A"),
    ("itousness", "A"),
    ("izability", "A"),
    ("izational", "A"),
    ("ableness", "A"),
    ("arizable", "A"),
    ("entation", "A"),
    ("entially", "A"),
    ("eousness", "A"),
    ("ibleness", "A"),
    ("icalness", "A"),
    ("ionalism", "A"),
    ("ionality", "A"),
    ("ionalize", "A"),
    ("iousness", "A"),
    ("izations", "A"),
    ("lessness", "A"),
    ("ability", "A"),
    ("aically", "A"),
    ("alistic", "B"),
    ("alities", "A"),
    ("ariness", "E"),
    ("aristic", "A"),
    ("arizing", "A"),
    ("ateness", "A"),
    ("atingly", "A"),
    ("ational", "B"),
    ("atively", "A"),
    ("ativism", "A"),
    ("elihood", "E"),
    ("encible", "A"),
    ("entally", "A"),
    ("entials", "A"),
    ("entiate", "A"),
    ("entness", "A"),
    ("fulness", "A"),
    ("ibility", "A"),
    ("icalism", "A"),
    ("icalist", "A"),
    ("icality", "A"),
    ("icalize", "A"),
    ("ication", "G"),
    ("icianry", "A"),
    ("ination", "A"),
    ("ingness", "A"),
    ("ionally", "A"),
    ("isation", "A"),
    ("ishness", "A"),
    ("istical", "A"),
    ("iteness", "A"),
    ("iveness", "A"),
    ("ivistic", "A"),
    ("ivities", "A"),
    ("ization", "F"),
    ("izement", "A"),
    ("oidally", "A"),
    ("ousness", "A"),
    ("aceous", "A"),
    ("acious", "B"),
    ("action", "G"),
    ("alness", "A"),
    ("ancial", "A"),
    ("ancies", "A"),
    ("ancing", "B"),
    ("ariser", "A"),
    ("arized", "A"),
    ("arizer", "A"),
    ("atable", "A"),
    ("ations", "B"),
    ("atives", "A"),
    ("eature", "Z"),
    ("efully", "A"),
    ("encies", "A"),
    ("encing", "A"),
    ("ential", "A"),
    ("enting", "C"),
    ("entist", "A"),
    ("eously", "A"),
    ("ialist", "A"),
    ("iality", "A"),
    ("ialize", "A"),
    ("ically", "A"),
    ("icance", "A"),
    ("icians", "A"),
    ("icists", "A"),
    ("ifully", "A"),
    ("ionals", "A"),
    ("ionate", "D"),
    ("ioning", "A"),
    ("ionist", "A"),
    ("iously", "A"),
    ("istics", "A"),
    ("izable", "E"),
    ("lessly", "A"),
    ("nesses", "A"),
    ("oidism", "A"),
    ("acies", "A"),
    ("acity", "A"),
    ("aging", "B"),
    ("aical", "A"),
    ("alism", "B"),
    ("alist", "A"),
    ("ality", "A"),
    ("alize", "A"),
    ("allic", "BB"),
    ("anced", "B"),
    ("ances", "B"),
    ("antic", "C"),
    ("arial", "A"),
    ("aries", "A"),
    ("arily", "A"),
    ("arity", "B"),
    ("arize", "A"),
    ("aroid", "A"),
    ("ately", "A"),
    ("ating", "I"),
    ("ation", "B"),
    ("ative", "A"),
    ("ators", "A"),
    ("atory", "A"),
    ("ature", "E"),
    ("early", "Y"),
    ("ehood", "A"),
    ("eless", "A"),
    ("elity", "A"),
    ("ement", "A"),
    ("enced", "A"),
    ("ences", "A"),
    ("eness", "E"),
    ("ening", "E"),
    ("ental", "A"),
    ("ented", "C"),
    ("ently", "A"),
    ("fully", "A"),
    ("ially", "A"),
    ("icant", "A"),
    ("ician", "A"),
    ("icide", "A"),
    ("icism", "A"),
    ("icist", "A"),
    ("icity", "A"),
    ("idine", "I"),
    ("iedly", "A"),
    ("ihood", "A"),
    ("inate", "A"),
    ("iness", "A"),
    ("ingly", "B"),
    ("inism", "J"),
    ("inity", "CC"),
    ("ional", "A"),
    ("ioned", "A"),
    ("ished", "A"),
    ("istic", "A"),
    ("ities", "A"),
    ("itous", "A"),
    ("ively", "A"),
    ("ivity", "A"),
    ("izers", "F"),
    ("izing", "F"),
    ("oidal", "A"),
    ("oides", "A"),
    ("otide", "A"),
    ("ously", "A"),
    ("able", "A"),
    ("ably", "A"),
    ("ages", "B"),
    ("ally", "B"),
    ("ance", "B"),
    ("ancy", "B"),
    ("ants", "B"),
    ("aric", "A"),
    ("arly", "K"),
    ("ated", "I"),
    ("ates", "A"),
    ("atic", "B"),
    ("ator", "A"),
    ("ealy", "Y"),
    ("edly", "E"),
    ("eful", "A"),
    ("eity", "A"),
    ("ence", "A"),
    ("ency", "A"),
    ("ened", "E"),
    ("enly", "E"),
    ("eous", "A"),
    ("hood", "A"),
    ("ials", "A"),
    ("ians", "A"),
    ("ible", "A"),
    ("ibly", "A"),
    ("ical", "A"),
    ("ides", "L"),
    ("iers", "A"),
    ("iful", "A"),
    ("ines", "M"),
    ("ings", "N"),
    ("ions", "B"),
    ("ious", "A"),
    ("isms", "B"),
    ("ists", "A"),
    ("itic", "H"),
    ("ized", "F"),
    ("izer", "F"),
    ("less", "A"),
    ("lily", "A"),
    ("ness", "A"),
    ("ogen", "A"),
    ("ward", "A"),
    ("wise", "A"),
    ("ying", "B"),
    ("yish", "A"),
    ("acy", "A"),
    ("age", "B"),
    ("aic", "A"),
    ("als", "BB"),
    ("ant", "B"),
    ("ars", "O"),
    ("ary", "F"),
    ("ata", "A"),
    ("ate", "A"),
    ("eal", "Y"),
    ("ear", "Y"),
    ("ely", "E"),
    ("ene", "E"),
    ("ent", "C"),
    ("ery", "E"),
    ("ese", "A"),
    ("ful", "A"),
    ("ial", "A"),
    ("ian", "A"),
    ("ics", "A"),
    ("ide", "L"),
    ("ied", "A"),
    ("ier", "A"),
    ("ies", "P"),
    ("ily", "A"),
    ("ine", "M"),
    ("ing", "N"),
    ("ion", "Q"),
    ("ish", "C"),
    ("ism", "B"),
    ("ist", "A"),
    ("ite", "AA"),
    ("ity", "A"),
    ("ium", "A"),
    ("ive", "A"),
    ("ize", "F"),
    ("oid", "A"),
    ("one", "R"),
    ("ous", "A"),
    ("'s", "A"),
    ("ae", "A"),
    ("al", "BB"),
    ("ar", "X"),
    ("as", "B"),
    ("ed", "E"),
    ("en", "F"),
    ("es", "E"),
    ("ia", "A"),
    ("ic", "A"),
    ("is", "A"),
    ("ly", "B"),
    ("on", "S"),
    ("or", "T"),
    ("s'", "A"),
    ("um", "U"),
    ("us", "V"),
    ("yl", "R"),
    ("a", "A"),
    ("e", "A"),
    ("i", "A"),
    ("o", "A"),
    ("s", "W"),
    ("y", "B"))

  private val doubles = Set("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")

  // respell tail → (replacement, disallowed immediately-preceding letters)
  private val respellRules: Array[(String, String, String)] = Array(
    ("erid", "eris", ""), ("metr", "meter", ""), ("istr", "ister", ""), ("umpt", "um", ""),
    ("uad", "uas", ""), ("vad", "vas", ""), ("cid", "cis", ""), ("lid", "lis", ""),
    ("pand", "pans", ""), ("end", "ens", "s"), ("ond", "ons", ""), ("lud", "lus", ""),
    ("rud", "rus", ""), ("her", "hes", "pt"), ("urs", "ur", ""), ("uct", "uc", ""),
    ("mit", "mis", ""), ("ent", "ens", "m"), ("rpt", "rb", ""), ("ert", "ers", ""),
    ("iev", "ief", ""), ("olv", "olut", ""), ("bex", "bic", ""), ("dex", "dic", ""),
    ("pex", "pic", ""), ("tex", "tic", ""), ("lux", "luc", ""),
    ("ul", "l", "aio"), ("et", "es", "n"), ("yt", "ys", ""),
    ("ax", "ac", ""), ("ex", "ec", ""), ("ix", "ic", ""), ("yz", "ys", "")
  ).sortBy(r => -r._1.length)

  def stem(word: String): String = {
    var w = word
    // 1. longest ending whose condition holds on the stem
    var i = 0
    var done = false
    while (i < endings.length && !done) {
      val (e, c) = endings(i)
      if (w.length > e.length && w.endsWith(e) && cond(c, w.substring(0, w.length - e.length))) {
        w = w.substring(0, w.length - e.length)
        done = true
      }
      i += 1
    }
    // 2. undouble
    if (w.length >= 2 && doubles.contains(w.substring(w.length - 2))) w = w.substring(0, w.length - 1)
    // 3. respell (longest matching tail; guard = letter before the tail)
    var j = 0
    var resp = false
    while (j < respellRules.length && !resp) {
      val (tail, repl, notBefore) = respellRules(j)
      if (w.endsWith(tail)) {
        resp = true
        val pre = w.length - tail.length - 1
        val ok = notBefore.isEmpty || pre < 0 || !notBefore.contains(w.charAt(pre))
        if (ok) w = w.substring(0, w.length - tail.length) + repl
      }
      j += 1
    }
    w
  }
}
