package graft.analysis

/** Kraaij–Pohlmann Dutch stemmer (W. Kraaij & R. Pohlmann, 1994, "Porter's
  * stemming algorithm for Dutch") as standardised by the Snowball project's
  * `kp` algorithm — the second Dutch variant the reference ships
  * (reference: Lucene.Net.Analysis.Common/Tartarus/Snowball/Ext/KpStemmer.cs,
  * exercised by TestSnowballVocab.cs over the official kraaij_pohlmann
  * voc.txt/output.txt pair).
  *
  * Shape of the algorithm (quite different from the plain Snowball Dutch
  * stemmer): post-vocalic and word-initial `y` are consonantised to `Y`;
  * regions p1/p2 are measured; four backward suffix steps run (plurals,
  * e-suffixes, derivational suffixes, ig/achtig/erig family), several of
  * which re-lengthen a now-final stressed vowel (`lengthen_V`: loop→lop→loop);
  * the verbal prefix/infix `ge` is removed when a vowel+consonant follows,
  * re-measuring afterwards and allowing one more d/t strip (`Step_1c`);
  * finally ft/kt/pt lose the t and a trailing double consonant (or v/z)
  * singles (Step_6) — but only if some earlier step actually fired.
  *
  * This is a faithful re-expression of the published program as plain
  * functions over an (s, cursor, limit) machine; each routine below is
  * named and ordered as in the published kp algorithm. Validated against
  * all official kraaij_pohlmann vectors in StemmerSpec.
  */
object SnowballKp {

  private val v = Set('a', 'e', 'i', 'o', 'u', 'y')
  private val vWX = v ++ Set('w', 'x')
  private val AOU = Set('a', 'o', 'u')
  private val AIOU = Set('a', 'i', 'o', 'u')

  // among tables, longest-first; (suffix, case id)
  private val a0 = Array(("nde", 7), ("ies", 3), ("aus", 5), ("'s", 1), ("en", 6), ("es", 4), ("s", 2))
  private val a1 = Array(("ische", 4), ("lijke", 3), ("ieve", 11), ("ene", 10),
    ("de", 5), ("ge", 2), ("je", 1), ("le", 9), ("re", 8), ("se", 7), ("te", 6))
  private val a2 = Array(("iteit", 2), ("heid", 3), ("atie", 1), ("isme", 5), ("arij", 6), ("erij", 5),
    ("rder", 4), ("ster", 3), ("fie", 7), ("gie", 8), ("ing", 5), ("sel", 3), ("dst", 10), ("tst", 9))
  private val a3 = Array(("achtiger", 9), ("achtigst", 9), ("eriger", 10), ("erigst", 10),
    ("achtig", 9), ("ioneel", 1), ("lijker", 8), ("lijkst", 8), ("atief", 2),
    ("baar", 3), ("laar", 5), ("naar", 4), ("raar", 6), ("tant", 7), ("erig", 10), ("end", 10))
  private val a4 = Array(("iger", 1), ("igst", 1), ("ig", 1))
  private val a5 = Array(("ft", 2), ("kt", 1), ("pt", 3))
  private val a6 = Array(("bb", 1), ("cc", 2), ("dd", 3), ("ff", 4), ("gg", 5), ("hh", 6), ("jj", 7),
    ("kk", 8), ("ll", 9), ("mm", 10), ("nn", 11), ("pp", 12), ("qq", 13), ("rr", 14), ("ss", 15),
    ("tt", 16), ("vv", 17), ("ww", 18), ("xx", 19), ("zz", 20), ("v", 21), ("z", 22))
  private val a6To = Array("", "b", "c", "d", "f", "g", "h", "j", "k", "l", "m", "n", "p", "q",
    "r", "s", "t", "v", "w", "x", "z", "f", "s")
  private val a7 = Array(("d", 1), ("t", 2))

  /** The Snowball string machine: word + cursor/limit + slice registers. */
  private final class M(var s: String) {
    var cursor = 0
    var limit: Int = s.length
    var limitBackward = 0
    var bra = 0
    var ket = 0
    var p1: Int = s.length
    var p2: Int = s.length
    var yFound = false
    var stemmed = false
    var geRemoved = false

    // backward-mode save/restore keep the distance from the (moving) end
    def markB: Int = limit - cursor
    def restoreB(m: Int): Unit = cursor = limit - m

    def eqSB(t: String): Boolean =
      cursor - limitBackward >= t.length && s.regionMatches(cursor - t.length, t, 0, t.length) && {
        cursor -= t.length; true
      }
    def eqSF(t: String): Boolean =
      limit - cursor >= t.length && s.regionMatches(cursor, t, 0, t.length) && {
        cursor += t.length; true
      }
    def inB(g: Set[Char]): Boolean =
      cursor > limitBackward && g(s.charAt(cursor - 1)) && { cursor -= 1; true }
    def outB(g: Set[Char]): Boolean =
      cursor > limitBackward && !g(s.charAt(cursor - 1)) && { cursor -= 1; true }
    def inF(g: Set[Char]): Boolean =
      cursor < limit && g(s.charAt(cursor)) && { cursor += 1; true }
    def outF(g: Set[Char]): Boolean =
      cursor < limit && !g(s.charAt(cursor)) && { cursor += 1; true }

    private def replaceS(rb: Int, rk: Int, t: String): Int = {
      val adj = t.length - (rk - rb)
      s = s.substring(0, rb) + t + s.substring(rk)
      limit += adj
      if (cursor >= rk) cursor += adj
      else if (cursor > rb) cursor = rb
      adj
    }
    def sliceFrom(t: String): Unit = replaceS(bra, ket, t)
    def sliceDel(): Unit = sliceFrom("")
    def insert(at: Int, t: String): Unit = {
      val adj = replaceS(at, at, t)
      if (at <= bra) bra += adj
      if (at <= ket) ket += adj
    }
    def sliceTo(): String = s.substring(bra, ket)

    def amongB(entries: Array[(String, Int)]): Int = {
      var i = 0
      while (i < entries.length) {
        val (t, code) = entries(i)
        if (cursor - limitBackward >= t.length && s.regionMatches(cursor - t.length, t, 0, t.length)) {
          cursor -= t.length
          return code
        }
        i += 1
      }
      0
    }

    // --- conditions -------------------------------------------------------
    def R1: Boolean = cursor >= p1
    def R2: Boolean = cursor >= p2
    /** preceding char is a vowel, or preceding two chars are "ij" (test). */
    def V: Boolean = { val c = cursor; val r = inB(v) || eqSB("ij"); cursor = c; r }
    /** one char further back: vowel or "ij" (test). */
    def VX: Boolean = {
      val c = cursor
      val r = cursor > limitBackward && { cursor -= 1; inB(v) || eqSB("ij") }
      cursor = c; r
    }
    /** preceding char is a consonant and not part of "ij" (test). */
    def C: Boolean = {
      val c = cursor
      val r = !{ val t = cursor; val e = eqSB("ij"); cursor = t; e } && outB(v)
      cursor = c; r
    }

    // --- lengthen_V: re-double a now-final stressed vowel -----------------
    // non-v_WX [ (AOU test(non-v or atlimit)) or
    //            ('e' test((non-v or atlimit) not AIOU not(next AIOU non-v))) ]
    // -> ch insert ch        (all inside `do`: never fails)
    def lengthenV(): Boolean = {
      val m0 = markB
      var ok = outB(vWX)
      if (ok) {
        ket = cursor
        val mOr = markB
        var matched = false
        // AOU branch
        if (inB(AOU)) {
          bra = cursor
          val mt = markB
          if (outB(v) || cursor == limitBackward) { restoreB(mt); matched = true }
          else restoreB(mOr)
        } else restoreB(mOr)
        if (!matched) {
          // 'e' branch
          if (eqSB("e")) {
            bra = cursor
            val mt = markB
            var good = outB(v) || cursor == limitBackward
            if (good) {
              // not AIOU (at the position after the or-branch)
              val mn1 = markB
              if (inB(AIOU)) good = false
              restoreB(mn1)
            }
            if (good) {
              // not (next AIOU non-v)
              val mn2 = markB
              if (cursor > limitBackward) {
                cursor -= 1
                if (inB(AIOU) && outB(v)) good = false
              }
              restoreB(mn2)
            }
            if (good) { restoreB(mt); matched = true }
          }
        }
        if (matched) {
          val ch = sliceTo()
          val c = cursor
          insert(cursor, ch)
          cursor = c
        }
      }
      restoreB(m0)
      true
    }

    // --- Step_1: plural/past suffixes s/'s/ies/es/aus/en/nde ---------------
    def step1(): Boolean = {
      ket = cursor
      val code = amongB(a0)
      if (code == 0) return false
      bra = cursor
      code match {
        case 1 => sliceDel(); true // 's
        case 2 => // s: R1 not('t' R1) C delete
          if (!R1) return false
          val m = markB
          if (eqSB("t") && R1) return false
          restoreB(m)
          if (!C) return false
          sliceDel(); true
        case 3 => // ies: R1 <- ie
          if (!R1) return false
          sliceFrom("ie"); true
        case 4 => // es
          val m = markB
          if (eqSB("ar") && R1 && C) {
            bra = cursor; sliceDel(); lengthenV(); true
          } else {
            restoreB(m)
            if (eqSB("er") && R1 && C) { bra = cursor; sliceDel(); true }
            else {
              restoreB(m)
              if (!R1 || !C) return false
              sliceFrom("e"); true
            }
          }
        case 5 => // aus: R1 V <- au
          if (!R1 || !V) return false
          sliceFrom("au"); true
        case 6 => // en
          val m = markB
          if (eqSB("hed") && R1) { bra = cursor; sliceFrom("heid"); true }
          else {
            restoreB(m)
            if (eqSB("nd")) { sliceDel(); true }
            else {
              restoreB(m)
              if (eqSB("d") && R1 && C) { bra = cursor; sliceDel(); true }
              else {
                restoreB(m)
                if ((eqSB("i") || { restoreB(m); eqSB("j") }) && V) { sliceDel(); true }
                else {
                  restoreB(m)
                  if (!R1 || !C) return false
                  sliceDel(); lengthenV(); true
                }
              }
            }
          }
        case 7 => sliceFrom("nd"); true // nde
        case _ => false
      }
    }

    // --- Step_2: e-suffixes je/ge/lijke/ische/de/te/se/re/le/ene/ieve ------
    def step2(): Boolean = {
      ket = cursor
      val code = amongB(a1)
      if (code == 0) return false
      bra = cursor
      code match {
        case 1 => // je
          val m = markB
          if (eqSB("'t")) { bra = cursor; sliceDel(); true }
          else {
            restoreB(m)
            if (eqSB("et") && { bra = cursor; R1 && C }) { sliceDel(); true }
            else {
              restoreB(m)
              if (eqSB("rnt")) { bra = cursor; sliceFrom("rn"); true }
              else {
                restoreB(m)
                if (eqSB("t") && { bra = cursor; R1 && VX }) { sliceDel(); true }
                else {
                  restoreB(m)
                  if (eqSB("ink")) { bra = cursor; sliceFrom("ing"); true }
                  else {
                    restoreB(m)
                    if (eqSB("mp")) { bra = cursor; sliceFrom("m"); true }
                    else {
                      restoreB(m)
                      if (eqSB("'") && { bra = cursor; R1 }) { sliceDel(); true }
                      else {
                        restoreB(m)
                        bra = cursor
                        if (!R1 || !C) return false
                        sliceDel(); true
                      }
                    }
                  }
                }
              }
            }
          }
        case 2 => if (!R1) false else { sliceFrom("g"); true }
        case 3 => if (!R1) false else { sliceFrom("lijk"); true }
        case 4 => if (!R1) false else { sliceFrom("isch"); true }
        case 5 => if (!R1 || !C) false else { sliceDel(); true }
        case 6 => if (!R1) false else { sliceFrom("t"); true }
        case 7 => if (!R1) false else { sliceFrom("s"); true }
        case 8 => if (!R1) false else { sliceFrom("r"); true }
        case 9 => // le: R1 delete attach l lengthen_V
          if (!R1) return false
          sliceDel(); insert(cursor, "l"); lengthenV(); true
        case 10 => // ene: R1 C delete attach en lengthen_V
          if (!R1 || !C) return false
          sliceDel(); insert(cursor, "en"); lengthenV(); true
        case 11 => if (!R1 || !C) false else { sliceFrom("ief"); true }
        case _ => false
      }
    }

    // --- Step_3: derivational suffixes -------------------------------------
    def step3(): Boolean = {
      ket = cursor
      val code = amongB(a2)
      if (code == 0) return false
      bra = cursor
      code match {
        case 1 => if (!R1) false else { sliceFrom("eer"); true } // atie
        case 2 => if (!R1) false else { sliceDel(); lengthenV(); true } // iteit
        case 3 => if (!R1) false else { sliceDel(); true } // heid/sel/ster
        case 4 => sliceFrom("r"); true // rder
        case 5 => if (!R1) false else { sliceDel(); lengthenV(); true } // isme/ing/erij
        case 6 => if (!R1 || !C) false else { sliceFrom("aar"); true } // arij
        case 7 => // fie: R2 delete attach f lengthen_V
          if (!R2) return false
          sliceDel(); insert(cursor, "f"); lengthenV(); true
        case 8 => // gie: R2 delete attach g lengthen_V
          if (!R2) return false
          sliceDel(); insert(cursor, "g"); lengthenV(); true
        case 9 => if (!R1 || !C) false else { sliceFrom("t"); true } // tst
        case 10 => if (!R1 || !C) false else { sliceFrom("d"); true } // dst
        case _ => false
      }
    }

    // --- Step_4: ioneel/atief/baar/naar/laar/raar/tant/lijk*/achtig*/erig*/end,
    //             falling back to ig/iger/igst ------------------------------
    def step4(): Boolean = {
      val m0 = markB
      ket = cursor
      val code = amongB(a3)
      var done = false
      if (code != 0) {
        bra = cursor
        done = code match {
          case 1 => R1 && { sliceFrom("ie"); true }
          case 2 => R1 && { sliceFrom("eer"); true }
          case 3 => R1 && { sliceDel(); true }
          case 4 => R1 && V && { sliceFrom("n"); true }
          case 5 => R1 && V && { sliceFrom("l"); true }
          case 6 => R1 && V && { sliceFrom("r"); true }
          case 7 => R1 && { sliceFrom("teer"); true }
          case 8 => R1 && { sliceFrom("lijk"); true }
          case 9 => R1 && { sliceDel(); true }
          case 10 => R1 && C && { sliceDel(); lengthenV(); true }
          case _ => false
        }
      }
      if (done) true
      else {
        restoreB(m0)
        ket = cursor
        if (amongB(a4) == 0) return false
        bra = cursor
        if (!R1 || !C) return false
        sliceDel(); lengthenV(); true
      }
    }

    // --- Step_7: ft/kt/pt lose the t ---------------------------------------
    def step7(): Boolean = {
      ket = cursor
      val code = amongB(a5)
      if (code == 0) return false
      bra = cursor
      code match {
        case 1 => sliceFrom("k"); true
        case 2 => sliceFrom("f"); true
        case 3 => sliceFrom("p"); true
        case _ => false
      }
    }

    // --- Step_6: undouble final consonant; v→f, z→s ------------------------
    def step6(): Boolean = {
      ket = cursor
      val code = amongB(a6)
      if (code == 0) return false
      bra = cursor
      sliceFrom(a6To(code)); true
    }

    // --- Step_1c: one more d/t strip after ge-removal ----------------------
    def step1c(): Boolean = {
      ket = cursor
      val code = amongB(a7)
      if (code == 0) return false
      bra = cursor
      if (!R1 || !C) return false
      code match {
        case 1 => // d: not('n' R1) delete
          val m = markB
          if (eqSB("n") && R1) return false
          restoreB(m)
          sliceDel(); true
        case 2 => // t: not('h' R1) delete
          val m = markB
          if (eqSB("h") && R1) return false
          restoreB(m)
          sliceDel(); true
        case _ => false
      }
    }

    // --- ge prefix/infix removal (forward mode) ----------------------------
    private def gotoInF(g: Set[Char]): Boolean = {
      while (cursor < limit && !g(s.charAt(cursor))) cursor += 1
      cursor < limit
    }
    private def gotoOutF(g: Set[Char]): Boolean = {
      while (cursor < limit && g(s.charAt(cursor))) cursor += 1
      cursor < limit
    }

    def losePrefix(): Boolean = {
      bra = cursor
      if (!eqSF("ge")) return false
      ket = cursor
      if (cursor + 3 > limit) return false // test hop 3
      if (!gotoInF(v)) return false
      if (!gotoOutF(v)) return false
      geRemoved = true
      sliceDel(); true
    }

    def loseInfix(): Boolean = {
      if (cursor >= limit) return false
      cursor += 1
      // gopast ['ge']
      var found = false
      while (!found) {
        bra = cursor
        if (eqSF("ge")) { ket = cursor; found = true }
        else if (cursor >= limit) return false
        else cursor += 1
      }
      if (cursor + 3 > limit) return false
      if (!gotoInF(v)) return false
      if (!gotoOutF(v)) return false
      geRemoved = true
      sliceDel(); true
    }

    // --- measure: mark p1/p2 (forward mode, from the word start) ----------
    def measure(): Boolean = {
      val c0 = cursor
      cursor = limit; p1 = cursor; p2 = cursor
      cursor = c0
      val c1 = cursor
      var ok = true
      while (outF(v)) {} // repeat non-v
      var n = 0
      var more = true
      while (more) {
        val m = markF
        if (eqSF("ij") || { restoreF(m); inF(v) }) n += 1 else { restoreF(m); more = false }
      }
      if (n < 1 || !outF(v)) ok = false
      if (ok) {
        p1 = cursor
        while (outF(v)) {}
        n = 0; more = true
        while (more) {
          val m = markF
          if (eqSF("ij") || { restoreF(m); inF(v) }) n += 1 else { restoreF(m); more = false }
        }
        if (n >= 1 && outF(v)) p2 = cursor
      }
      cursor = c1
      true
    }
    private def markF: Int = cursor
    private def restoreF(m: Int): Unit = cursor = m
  }

  def stem(word: String): String = {
    val m = new M(word)
    import m._
    // consonantise word-initial y and post-vocalic y to Y
    run {
      bra = cursor
      if (eqSF("y")) { ket = cursor; sliceFrom("Y"); yFound = true }
      cursor = 0
    }
    run {
      var scanning = true
      while (scanning) {
        // goto (v ['y'])
        var found = false
        while (!found && cursor < limit) {
          val c = cursor
          if (inF(v) && { bra = cursor; eqSF("y") } && { ket = cursor; true }) { cursor = c; found = true }
          else { cursor = c + 1 }
        }
        if (found) { sliceFrom("Y"); yFound = true } else scanning = false
      }
      cursor = 0
    }
    measure()
    // backward suffix steps
    limitBackward = 0
    cursor = limit; if (step1()) stemmed = true
    cursor = limit; if (step2()) stemmed = true
    cursor = limit; if (step3()) stemmed = true
    cursor = limit; if (step4()) stemmed = true
    cursor = 0
    geRemoved = false
    run { val c = cursor; if (losePrefix()) { cursor = c; measure() }; cursor = 0 }
    cursor = limit
    if (geRemoved) step1c()
    cursor = 0
    geRemoved = false
    run { val c = cursor; if (loseInfix()) { cursor = c; measure() }; cursor = 0 }
    cursor = limit
    if (geRemoved) step1c()
    cursor = limit
    if (step7()) stemmed = true
    cursor = limit
    if (stemmed || geRemoved) step6()
    // restore Y → y
    if (yFound) {
      cursor = 0
      var scanning = true
      while (scanning) {
        var found = false
        while (!found && cursor < limit) {
          bra = cursor
          if (eqSF("Y")) { ket = cursor; found = true }
          else cursor += 1
        }
        if (found) { sliceFrom("y"); cursor = bra } else scanning = false
      }
    }
    m.s
  }

  @inline private def run(body: => Unit): Unit = body
}
