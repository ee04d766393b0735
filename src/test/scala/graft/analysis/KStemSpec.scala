package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** KStem (Krovetz) vectors, each hand-traced through the reference rule
  * cascade (Analysis/En/KStemmer.cs) against the fixed test lexicon below —
  * exercising every ending routine, the exception-word contract, the
  * un-prefix quirk, retained defaults on lookup failure, and the built-in
  * conflation/nationality/proper-noun tables. */
class KStemSpec extends AnyFunSuite {

  // the ONE shared lexicon: the gate's oracle truth table is hand-traced
  // against exactly these words, so the spec and the gate cannot drift
  private val lexicon = graft.ops.VerifyQueries.kstemGateLexicon

  private val st = new KStemmer(lexicon)

  private def check(pairs: (String, String)*): Unit =
    for ((in, out) <- pairs)
      assert(st.stem(in) === out, s"stem($in)")

  test("plural: -s / -es / -ies / double-s guard") {
    check(
      "merges" -> "merge", "tables" -> "table", "indexes" -> "index",
      "rows" -> "row", "governs" -> "govern",
      "queries" -> "query",   // -ies -> y after the -ie lookup misses
      "crosses" -> "cross")   // double-s guard skips the -e form
  }

  test("past tense: -ed, doubled consonant, exception word, un- prefix") {
    check(
      "sorted" -> "sort",
      "planned" -> "plan",          // doubled consonant undoubles
      "backfilled" -> "backfill",
      "microcoded" -> "microcode",  // default keeps the e
      "aided" -> "aid",             // "aide" is an exception word: not a root
      "suited" -> "suite",          // default e-restore lands on the exception
      "unsorted" -> "unsorted",     // un- prefix: leave alone
      "decoupled" -> "decouple")    // default e-restore off-dictionary
  }

  test("aspect: -ing with dictionary confirmation and defaults") {
    check(
      "sorting" -> "sort", "governing" -> "govern",
      "committing" -> "commit",            // undouble confirmed by dict
      "creating" -> "create",              // +e confirmed by dict
      "microcoding" -> "microcode",
      "fingerspelling" -> "fingerspell")   // default keeps the doubled l
  }

  test("derivational endings: ity/ness/ion/er/ly/al/ble/izer") {
    check(
      "immunity" -> "immune",              // -ity +e
      "capacity" -> "capacity",            // in dictionary: early return
      "happiness" -> "happy",              // -ness then i->y
      "boldness" -> "bold",                // -ness accepted blind
      "organization" -> "organize",        // -ization always -> -ize
      "organizer" -> "organize",           // -izer always -> -ize
      "amplification" -> "amplify",        // -ication -> y
      "definition" -> "define",            // -ition -> e
      "oppositions" -> "oppose",           // plural default feeds IonEndings
      "resignation" -> "resign",           // -ation removed entirely
      "bigger" -> "big",                   // -er with undoubling
      "happier" -> "happy",                // -ier -> y
      "happily" -> "happy",                // -ily -> y
      "militarily" -> "military",
      "heuristically" -> "heuristic",      // -ally -> -al (ly), then -al (al)
      "optimal" -> "optimum",              // -al -> -um
      "mergeable" -> "merge",              // -able removed
      "mergeability" -> "merge")           // -ability -> -able -> (ble) merge
  }

  test("built-in tables: conflations, nationalities, proper nouns") {
    check(
      "aging" -> "age", "doing" -> "do", "fled" -> "flee", // directConflations
      "italian" -> "italy",                                // countryNationality
      "italians" -> "italy",  // plural s-removal lands on the nationality entry
      "athens" -> "athens", "dallas" -> "dallas")          // properNouns: final s kept
  }

  test("guards: short words, non-alpha, max length") {
    check(
      "ab" -> "ab",
      "log4j" -> "log4j",
      "under_scores" -> "under_scores",
      ("a" * 55) -> ("a" * 55))
  }

  test("stemmer plugs into the keyword-marker contract") {
    val f = TokenFilters.keywordMarker(st.stem, keywords = Set("sorted"))
    assert(f("sorted") === "sorted") // protected
    assert(f("merges") === "merge")
  }

  test("owner-thread guard: a shared instance fails LOUDLY from a second thread") {
    val shared = new KStemmer(Nil)
    assert(shared.stem("merges") === "merge") // pins the owner thread
    @volatile var caught: Throwable = null
    val t = new Thread(() =>
      try shared.stem("indexes") catch { case e: Throwable => caught = e })
    t.start(); t.join()
    assert(caught != null, "cross-thread use must throw, not corrupt silently")
    assert(caught.isInstanceOf[IllegalStateException])
  }

  test("threadLocal factory: one function reference safe across threads") {
    val stemFn = KStemmer.threadLocal(lexicon)
    assert(stemFn("merges") === "merge")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 4).map(_ => new Thread(() =>
      (1 to 50).foreach(_ => results.add(stemFn("indexing")))))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(results.size === 200)
    results.forEach(r => assert(r === "index"))
  }
}
