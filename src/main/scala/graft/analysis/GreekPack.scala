package graft.analysis

/** Greek analysis: case/diacritic folding and the Ntais stemmer
  * ("Development of a Stemmer for the Greek Language", G. Ntais, KTH 2006;
  * refined by Saroukos 2008) — 22 suffix-rule families with
  * exception-stem add-backs, plus a comparative/superlative tail rule.
  * Reference behavior: Analysis/El/GreekLowerCaseFilter.cs,
  * Analysis/El/GreekStemmer.cs (including its two documented operator-
  * precedence quirks, preserved bit-for-bit — see rule0/rule8).
  * Input to [[stem]] must already be [[lowerFold]]ed (final sigma → σ,
  * tonos/dialytika stripped). */
object GreekStem {
  import StemBuf.Buf

  /** Greek-aware lowercasing: per-codepoint lowercase, final sigma ς → σ,
    * and tonos/dialytika-carrying vowels to their base letters. */
  def lowerFold(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val lowered = Character.toLowerCase(cp) match {
        case 'ς' => 'σ'
        case 'ά' => 'α'
        case 'έ' => 'ε'
        case 'ή' => 'η'
        case 'ί' | 'ϊ' | 'ΐ' => 'ι'
        case 'ό' => 'ο'
        case 'ύ' | 'ϋ' | 'ΰ' => 'υ'
        case 'ώ' => 'ω'
        case c => c
      }
      sb.appendCodePoint(lowered)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  private def vowel(c: Char): Boolean = c match {
    case 'α' | 'ε' | 'η' | 'ι' | 'ο' | 'υ' | 'ω' => true
    case _ => false
  }
  private def vowelNoY(c: Char): Boolean = c match {
    case 'α' | 'ε' | 'η' | 'ι' | 'ο' | 'ω' => true
    case _ => false
  }

  private val exc4 = Set("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ")
  private val exc6 = Set("αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ",
    "αντιδ", "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ",
    "μουλ", "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ",
    "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
    "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ", "χασ")
  private val exc7 = Set("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
    "πεθ", "πικρ", "ποτ", "σιχ", "χ")
  private val exc8a = Set("τρ", "τσ")
  private val exc8b = Set("βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
    "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ",
    "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ",
    "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ",
    "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ",
    "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ",
    "μελ", "σιγ", "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ",
    "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ",
    "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ",
    "θυσ", "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ",
    "μεγλοβιομηχ", "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ",
    "ολογαλ", "πενταρφ", "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ",
    "στεφ", "ταβ", "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ")
  private val exc9 = Set("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
    "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
    "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ")
  private val exc12a = Set("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ")
  private val exc12b = Set("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ", "προ", "νισ")
  private val exc13 = Set("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ")
  private val exc14 = Set("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ",
    "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ", "αιθ",
    "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε", "τσα")
  private val exc15a = Set("αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ", "συμπ",
    "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
    "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ", "ναυ",
    "ουλαμ", "ουρ", "π", "τρ", "μ")
  private val exc15b = Set("ψοφ", "ναυλοχ")
  private val exc16 = Set("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον", "επταν")
  private val exc17 = Set("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ", "ευχρ",
    "κοινοχρ", "παλιμψ")
  private val exc18 = Set("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων")
  private val exc19 = Set("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ", "ασουσ")

  def stem(word: String): String = {
    if (word.length < 4) return word
    val b = new Buf(word)
    val origLen = b.len
    def ew(s: String) = b.endsWith(s)
    def stemStr = new String(b.s, 0, b.len)
    def endsVowel = b.len > 0 && vowel(b.s(b.len - 1))
    def endsVowelNoY = b.len > 0 && vowelNoY(b.s(b.len - 1))

    // rule 0: irregular neuter nouns (φωσ, κρεασ, γεγονοσ, καθεστωσ, -λογια …)
    def rule0(): Boolean = {
      val n = b.len
      val cut =
        if (n > 9 && (ew("καθεστωτοσ") || ew("καθεστωτων"))) 4
        else if (n > 8 && (ew("γεγονοτοσ") || ew("γεγονοτων"))) 4
        else if (n > 8 && ew("καθεστωτα")) 3
        else if (n > 7 && (ew("τατογιου") || ew("τατογιων"))) 4
        else if (n > 7 && ew("γεγονοτα")) 3
        else if (n > 7 && ew("καθεστωσ")) 2
        // preserved C# precedence quirk: the n>6 guard binds only to the
        // first suffix; all are 7 chars so EndsWith implies n≥7 anyway
        else if ((n > 6 && ew("σκαγιου")) || ew("σκαγιων") || ew("ολογιου") ||
          ew("ολογιων") || ew("κρεατοσ") || ew("κρεατων") || ew("περατοσ") ||
          ew("περατων") || ew("τερατοσ") || ew("τερατων")) 4
        else if (n > 6 && ew("τατογια")) 3
        else if (n > 6 && ew("γεγονοσ")) 2
        else if (n > 5 && (ew("φαγιου") || ew("φαγιων") || ew("σογιου") || ew("σογιων"))) 4
        else if (n > 5 && (ew("σκαγια") || ew("ολογια") || ew("κρεατα") || ew("περατα") ||
          ew("τερατα"))) 3
        else if (n > 4 && (ew("φαγια") || ew("σογια") || ew("φωτοσ") || ew("φωτων"))) 3
        else if (n > 4 && (ew("κρεασ") || ew("περασ") || ew("τερασ"))) 2
        else if (n > 3 && ew("φωτα")) 2
        else if (n > 2 && ew("φωσ")) 1
        else 0
      b.len -= cut
      cut > 0
    }

    def rule1(): Unit = if (b.len > 4 && (ew("αδεσ") || ew("αδων"))) {
      b.len -= 4
      if (!(ew("οκ") || ew("μαμ") || ew("μαν") || ew("μπαμπ") || ew("πατερ") ||
        ew("γιαγι") || ew("νταντ") || ew("κυρ") || ew("θει") || ew("πεθερ")))
        b.len += 2 // add back -αδ
    }

    def rule2(): Unit = if (b.len > 4 && (ew("εδεσ") || ew("εδων"))) {
      b.len -= 4
      if (ew("οπ") || ew("ιπ") || ew("εμπ") || ew("υπ") || ew("γηπ") || ew("δαπ") ||
        ew("κρασπ") || ew("μιλ")) b.len += 2 // add back -εδ
    }

    def rule3(): Unit = if (b.len > 5 && (ew("ουδεσ") || ew("ουδων"))) {
      b.len -= 5
      if (ew("αρκ") || ew("καλιακ") || ew("πεταλ") || ew("λιχ") || ew("πλεξ") ||
        ew("σκ") || ew("σ") || ew("φλ") || ew("φρ") || ew("βελ") || ew("λουλ") ||
        ew("χν") || ew("σπ") || ew("τραγ") || ew("φε")) b.len += 3 // add back -ουδ
    }

    def rule4(): Unit = if (b.len > 3 && (ew("εωσ") || ew("εων"))) {
      b.len -= 3
      if (exc4.contains(stemStr)) b.len += 1 // add back -ε
    }

    def rule5(): Unit = {
      if (b.len > 2 && ew("ια")) {
        b.len -= 2
        if (endsVowel) b.len += 1 // add back -ι
      } else if (b.len > 3 && (ew("ιου") || ew("ιων"))) {
        b.len -= 3
        if (endsVowel) b.len += 1
      }
    }

    def rule6(): Unit = {
      var removed = false
      if (b.len > 3 && (ew("ικα") || ew("ικο"))) { b.len -= 3; removed = true }
      else if (b.len > 4 && (ew("ικου") || ew("ικων"))) { b.len -= 4; removed = true }
      if (removed && (endsVowel || exc6.contains(stemStr))) b.len += 2 // add back -ικ
    }

    def rule7(): Unit = {
      if (b.len == 5 && ew("αγαμε")) { b.len -= 1; return }
      if (b.len > 7 && ew("ηθηκαμε")) b.len -= 7
      else if (b.len > 6 && ew("ουσαμε")) b.len -= 6
      else if (b.len > 5 && (ew("αγαμε") || ew("ησαμε") || ew("ηκαμε"))) b.len -= 5
      if (b.len > 3 && ew("αμε")) {
        b.len -= 3
        if (exc7.contains(stemStr)) b.len += 2 // add back -αμ
      }
    }

    def rule8(): Unit = {
      var removed = false
      // C# precedence preserved: only the first suffix in each group takes
      // the length guard; the rest fire whenever they match
      if (b.len > 8 && ew("ιουντανε")) { b.len -= 8; removed = true }
      else if ((b.len > 7 && ew("ιοντανε")) || ew("ουντανε") || ew("ηθηκανε")) {
        b.len -= 7; removed = true
      } else if ((b.len > 6 && ew("ιοτανε")) || ew("οντανε") || ew("ουσανε")) {
        b.len -= 6; removed = true
      } else if ((b.len > 5 && ew("αγανε")) || ew("ησανε") || ew("οτανε") || ew("ηκανε")) {
        b.len -= 5; removed = true
      }
      if (removed && exc8a.contains(stemStr)) {
        b.len += 4 // add back -αγαν (≥4 chars were removed, so this is safe)
        b.s(b.len - 4) = 'α'; b.s(b.len - 3) = 'γ'; b.s(b.len - 2) = 'α'; b.s(b.len - 1) = 'ν'
      }
      if (b.len > 3 && ew("ανε")) {
        b.len -= 3
        if (endsVowelNoY || exc8b.contains(stemStr)) b.len += 2 // add back -αν
      }
    }

    def rule9(): Unit = {
      if (b.len > 5 && ew("ησετε")) b.len -= 5
      if (b.len > 3 && ew("ετε")) {
        b.len -= 3
        if (exc9.contains(stemStr) || endsVowelNoY || ew("οδ") || ew("αιρ") ||
          ew("φορ") || ew("ταθ") || ew("διαθ") || ew("σχ") || ew("ενδ") ||
          ew("ευρ") || ew("τιθ") || ew("υπερθ") || ew("ραθ") || ew("ενθ") ||
          ew("ροθ") || ew("σθ") || ew("πυρ") || ew("αιν") || ew("συνδ") ||
          ew("συν") || ew("συνθ") || ew("χωρ") || ew("πον") || ew("βρ") ||
          ew("καθ") || ew("ευθ") || ew("εκθ") || ew("νετ") || ew("ρον") ||
          ew("αρκ") || ew("βαρ") || ew("βολ") || ew("ωφελ"))
          b.len += 2 // add back -ετ
      }
    }

    def rule10(): Unit = if (b.len > 5 && (ew("οντασ") || ew("ωντασ"))) {
      b.len -= 5
      if (b.len == 3 && ew("αρχ")) { b.len += 3; b.s(b.len - 3) = 'ο' } // αρχοντ-
      if (ew("κρε")) { b.len += 3; b.s(b.len - 3) = 'ω' }               // κρεωντ-
    }

    def rule11(): Unit = {
      if (b.len > 6 && ew("ομαστε")) {
        b.len -= 6
        if (b.len == 2 && ew("ον")) b.len += 5 // add back -ομαστ
      } else if (b.len > 7 && ew("ιομαστε")) {
        b.len -= 7
        if (b.len == 2 && ew("ον")) {
          b.len += 5
          b.s(b.len - 5) = 'ο'; b.s(b.len - 4) = 'μ'; b.s(b.len - 3) = 'α'
          b.s(b.len - 2) = 'σ'; b.s(b.len - 1) = 'τ'
        }
      }
    }

    def rule12(): Unit = {
      if (b.len > 5 && ew("ιεστε")) {
        b.len -= 5
        if (exc12a.contains(stemStr)) b.len += 4 // add back -ιεστ
      }
      if (b.len > 4 && ew("εστε")) {
        b.len -= 4
        if (exc12b.contains(stemStr)) b.len += 3 // add back -εστ
      }
    }

    def rule13(): Unit = {
      if (b.len > 6 && ew("ηθηκεσ")) b.len -= 6
      else if (b.len > 5 && (ew("ηθηκα") || ew("ηθηκε"))) b.len -= 5
      var removed = false
      if (b.len > 4 && ew("ηκεσ")) { b.len -= 4; removed = true }
      else if (b.len > 3 && (ew("ηκα") || ew("ηκε"))) { b.len -= 3; removed = true }
      if (removed && (exc13.contains(stemStr) || ew("σκωλ") || ew("σκουλ") ||
        ew("ναρθ") || ew("σφ") || ew("οθ") || ew("πιθ"))) b.len += 2 // add back -ηκ
    }

    def rule14(): Unit = {
      var removed = false
      if (b.len > 5 && ew("ουσεσ")) { b.len -= 5; removed = true }
      else if (b.len > 4 && (ew("ουσα") || ew("ουσε"))) { b.len -= 4; removed = true }
      if (removed && (exc14.contains(stemStr) || endsVowel || ew("ποδαρ") ||
        ew("βλεπ") || ew("πανταχ") || ew("φρυδ") || ew("μαντιλ") || ew("μαλλ") ||
        ew("κυματ") || ew("λαχ") || ew("ληγ") || ew("φαγ") || ew("ομ") || ew("πρωτ")))
        b.len += 3 // add back -ουσ
    }

    def rule15(): Unit = {
      var removed = false
      if (b.len > 4 && ew("αγεσ")) { b.len -= 4; removed = true }
      else if (b.len > 3 && (ew("αγα") || ew("αγε"))) { b.len -= 3; removed = true }
      if (removed) {
        val cond1 = exc15a.contains(stemStr) || ew("οφ") || ew("πελ") || ew("χορτ") ||
          ew("λλ") || ew("σφ") || ew("ρπ") || ew("φρ") || ew("πρ") || ew("λοχ") ||
          ew("σμην")
        val cond2 = exc15b.contains(stemStr) || ew("κολλ")
        if (cond1 && !cond2) b.len += 2 // add back -αγ
      }
    }

    def rule16(): Unit = {
      var removed = false
      if (b.len > 4 && ew("ησου")) { b.len -= 4; removed = true }
      else if (b.len > 3 && (ew("ησε") || ew("ησα"))) { b.len -= 3; removed = true }
      if (removed && exc16.contains(stemStr)) b.len += 2 // add back -ησ
    }

    def rule17(): Unit = if (b.len > 4 && ew("ηστε")) {
      b.len -= 4
      if (exc17.contains(stemStr)) b.len += 3 // add back -ηστ
    }

    def rule18(): Unit = {
      var removed = false
      if (b.len > 6 && (ew("ησουνε") || ew("ηθουνε"))) { b.len -= 6; removed = true }
      else if (b.len > 4 && ew("ουνε")) { b.len -= 4; removed = true }
      if (removed && exc18.contains(stemStr)) {
        b.len += 3
        b.s(b.len - 3) = 'ο'; b.s(b.len - 2) = 'υ'; b.s(b.len - 1) = 'ν'
      }
    }

    def rule19(): Unit = {
      var removed = false
      if (b.len > 6 && (ew("ησουμε") || ew("ηθουμε"))) { b.len -= 6; removed = true }
      else if (b.len > 4 && ew("ουμε")) { b.len -= 4; removed = true }
      if (removed && exc19.contains(stemStr)) {
        b.len += 3
        b.s(b.len - 3) = 'ο'; b.s(b.len - 2) = 'υ'; b.s(b.len - 1) = 'μ'
      }
    }

    def rule20(): Unit = {
      if (b.len > 5 && (ew("ματων") || ew("ματοσ"))) b.len -= 3
      else if (b.len > 4 && ew("ματα")) b.len -= 2
    }

    def rule21(): Unit = {
      val n = b.len
      val cut =
        if (n > 9 && ew("ιοντουσαν")) 9
        else if (n > 8 && (ew("ιομασταν") || ew("ιοσασταν") || ew("ιουμαστε") ||
          ew("οντουσαν"))) 8
        else if (n > 7 && (ew("ιεμαστε") || ew("ιεσαστε") || ew("ιομουνα") ||
          ew("ιοσαστε") || ew("ιοσουνα") || ew("ιουνται") || ew("ιουνταν") ||
          ew("ηθηκατε") || ew("ομασταν") || ew("οσασταν") || ew("ουμαστε"))) 7
        else if (n > 6 && (ew("ιομουν") || ew("ιονταν") || ew("ιοσουν") ||
          ew("ηθειτε") || ew("ηθηκαν") || ew("ομουνα") || ew("οσαστε") ||
          ew("οσουνα") || ew("ουνται") || ew("ουνταν") || ew("ουσατε"))) 6
        else if (n > 5 && (ew("αγατε") || ew("ιεμαι") || ew("ιεται") || ew("ιεσαι") ||
          ew("ιοταν") || ew("ιουμα") || ew("ηθεισ") || ew("ηθουν") || ew("ηκατε") ||
          ew("ησατε") || ew("ησουν") || ew("ομουν") || ew("ονται") || ew("ονταν") ||
          ew("οσουν") || ew("ουμαι") || ew("ουσαν"))) 5
        else if (n > 4 && (ew("αγαν") || ew("αμαι") || ew("ασαι") || ew("αται") ||
          ew("ειτε") || ew("εσαι") || ew("εται") || ew("ηδεσ") || ew("ηδων") ||
          ew("ηθει") || ew("ηκαν") || ew("ησαν") || ew("ησει") || ew("ησεσ") ||
          ew("ομαι") || ew("οταν"))) 4
        else if (n > 3 && (ew("αει") || ew("εισ") || ew("ηθω") || ew("ησω") ||
          ew("ουν") || ew("ουσ"))) 3
        else if (n > 2 && (ew("αν") || ew("ασ") || ew("αω") || ew("ει") || ew("εσ") ||
          ew("ησ") || ew("οι") || ew("οσ") || ew("ου") || ew("υσ") || ew("ων"))) 2
        else if (n > 1 && endsVowel) 1
        else 0
      b.len -= cut
    }

    def rule22(): Unit = {
      if (ew("εστερ") || ew("εστατ")) b.len -= 5
      else if (ew("οτερ") || ew("οτατ") || ew("υτερ") || ew("υτατ") ||
        ew("ωτερ") || ew("ωτατ")) b.len -= 4
    }

    rule0()
    rule1(); rule2(); rule3(); rule4(); rule5(); rule6(); rule7(); rule8()
    rule9(); rule10(); rule11(); rule12(); rule13(); rule14(); rule15()
    rule16(); rule17(); rule18(); rule19(); rule20()
    if (b.len == origLen) rule21()
    rule22()
    b.result
  }

  /** Full chain helper: Greek casefold then stem. */
  def foldStem(word: String): String = stem(lowerFold(word))
}
