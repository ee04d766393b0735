package graft.search

import graft.analysis.Analyzer

/** Error-tolerant "human friendly" query syntax (reference:
  * /root/reference/src/Lucene.Net.QueryParser/Simple/SimpleQueryParser.cs
  * — a fresh implementation of the documented character-level state
  * machine; each operator is gated by a flag bit exactly like the
  * reference's `Operator` bitmask):
  *
  *   - `+`       AND           (`token1+token2`)
  *   - `|`       OR            (`token1|token2`)
  *   - `-`       NOT, prefix   (`-token`; `--token` cancels)
  *   - `"..."`   phrase, `"..."~N` sloppy/NEAR phrase
  *   - `term*`   prefix query (only a trailing unescaped `*`)
  *   - `term~N`  fuzzy query  (N capped at 2; `~0`/garbage → plain term)
  *   - `( )`     precedence groups
  *   - `\`       escapes the next character
  *   - whitespace delimits tokens
  *
  * Syntax errors NEVER throw — the parser keeps whatever it can decipher
  * (unbalanced `(`/`"` are treated as ordinary characters, stray
  * operators are ignored), the reference's stated contract. The result
  * is None when the input reduces to nothing.
  *
  * Tree-building reproduces the reference's BuildQueryTree
  * (SimpleQueryParser.cs:494-546): clauses accumulate left-to-right
  * under the current operator; an operator CHANGE wraps the accumulated
  * tree as the first clause of a fresh boolean node, so
  * `star wars | empire` (default MUST) parses as
  * `SHOULD( MUST(star, wars), empire )`. A negated clause becomes
  * `BoolQ(should = MatchAll, mustNot = clause)` (ibid:499-505).
  */
final class SimpleQueryParser(
    analyzer: Analyzer = Analyzer.standard,
    defaultOperator: SimpleQueryParser.Op = SimpleQueryParser.Should,
    flags: Int = SimpleQueryParser.AllFlags) {
  import SimpleQueryParser._

  private def has(f: Int): Boolean = (flags & f) != 0

  /** Mutable cursor over one (sub)query's character range — ≙ the
    * reference's State object (SimpleQueryParser.cs State). */
  private final class State(val data: Array[Char], var index: Int, val length: Int) {
    var top: Query = null
    var currentOp: Op = null // null = not set
    var previousOp: Op = null
    var not: Int = 0
  }

  def parse(input: String): Option[Query] = {
    val data = input.toCharArray
    val st = new State(data, 0, data.length)
    parseSubQuery(st)
    Option(st.top)
  }

  private def parseSubQuery(st: State): Unit = {
    while (st.index < st.length) {
      val c = st.data(st.index)
      if (c == '-' && has(Not)) {
        // the ONLY branch that preserves the pending `not` count — even
        // whitespace between `-` and its token cancels the negation
        st.not += 1; st.index += 1
      } else {
        if (c == '(' && has(Precedence)) consumeSubQuery(st)
        else if (c == ')' && has(Precedence)) st.index += 1 // extraneous
        else if (c == '"' && has(Phrase)) consumePhrase(st)
        else if (c == '+' && has(And)) {
          // ignored if an op is already pending or nothing precedes it
          if (st.currentOp == null && st.top != null) st.currentOp = Must
          st.index += 1
        } else if (c == '|' && has(Or)) {
          if (st.currentOp == null && st.top != null) st.currentOp = Should
          st.index += 1
        } else if ((c == ' ' || c == '\t' || c == '\n' || c == '\r') && has(Whitespace)) {
          st.index += 1
        } else consumeToken(st)
        st.not = 0
      }
    }
  }

  /** Balanced-parenthesis group → recursive sub-parse
    * (SimpleQueryParser.cs ConsumeSubQuery). */
  private def consumeSubQuery(st: State): Unit = {
    st.index += 1
    val start = st.index
    var precedence = 1
    var escaped = false
    var done = false
    while (!done && st.index < st.length) {
      val c = st.data(st.index)
      if (!escaped) {
        if (c == '\\' && has(Escape)) { escaped = true; st.index += 1 }
        else {
          if (c == '(') precedence += 1
          else if (c == ')') {
            precedence -= 1
            if (precedence == 0) done = true
          }
          if (!done) { escaped = false; st.index += 1 }
        }
      } else { escaped = false; st.index += 1 }
    }
    if (st.index == st.length) st.index = start // unbalanced: '(' extraneous
    else if (st.index == start) { st.currentOp = null; st.index += 1 } // "()"
    else {
      val sub = new State(st.data, start, st.index)
      parseSubQuery(sub)
      buildQueryTree(st, sub.top)
      st.index += 1
    }
  }

  /** `"..."` with optional `~N` (SimpleQueryParser.cs ConsumePhrase). */
  private def consumePhrase(st: State): Unit = {
    st.index += 1
    val start = st.index
    val buf = new StringBuilder
    var escaped = false
    var hasSlop = false
    var done = false
    while (!done && st.index < st.length) {
      val c = st.data(st.index)
      if (!escaped) {
        if (c == '\\' && has(Escape)) { escaped = true; st.index += 1 }
        else if (c == '"') {
          if (st.length > st.index + 1 && st.data(st.index + 1) == '~' && has(Near)) {
            st.index += 1
            if (st.length > st.index + 1) hasSlop = true
            done = true
          } else done = true
        } else { buf.append(c); st.index += 1 }
      } else { escaped = false; buf.append(c); st.index += 1 }
    }
    if (st.index == st.length) st.index = start // unterminated: '"' extraneous
    else if (st.index == start) { st.currentOp = null; st.index += 1 } // ""
    else {
      val slop = if (hasSlop) parseFuzziness(st) else 0
      buildQueryTree(st, newPhraseQuery(buf.toString, slop))
      st.index += 1
    }
  }

  /** One bare token: term / trailing-`*` prefix / `~N` fuzzy
    * (SimpleQueryParser.cs ConsumeToken). */
  private def consumeToken(st: State): Unit = {
    val buf = new StringBuilder
    var escaped = false
    var prefix = false
    var fuzzy = false
    var done = false
    while (!done && st.index < st.length) {
      val c = st.data(st.index)
      if (!escaped) {
        if (c == '\\' && has(Escape)) { escaped = true; prefix = false; st.index += 1 }
        else if (tokenFinished(c)) done = true
        else if (buf.nonEmpty && c == '~' && has(Fuzzy)) { fuzzy = true; done = true }
        else {
          prefix = buf.nonEmpty && c == '*' && has(Prefix)
          buf.append(c); st.index += 1
        }
      } else { escaped = false; buf.append(c); st.index += 1 }
    }
    if (buf.nonEmpty) {
      val branch =
        if (fuzzy) {
          val edits = math.min(parseFuzziness(st), MaxEdits)
          if (edits == 0) newDefaultQuery(buf.toString)
          else FuzzyQ(Analyzer.lowerCase(buf.toString), edits)
        } else if (prefix) PrefixQ(Analyzer.lowerCase(buf.toString.dropRight(1)))
        else newDefaultQuery(buf.toString)
      buildQueryTree(st, branch)
    }
  }

  private def tokenFinished(c: Char): Boolean =
    (c == '"' && has(Phrase)) || (c == '|' && has(Or)) || (c == '+' && has(And)) ||
      ((c == '(' || c == ')') && has(Precedence)) ||
      ((c == ' ' || c == '\t' || c == '\n' || c == '\r') && has(Whitespace))

  /** `~N` suffix → non-negative int, 0 on garbage
    * (SimpleQueryParser.cs ParseFuzziness). Consumes through token end. */
  private def parseFuzziness(st: State): Int = {
    if (st.index >= st.length || st.data(st.index) != '~') return 0
    val buf = new StringBuilder
    st.index += 1
    var done = false
    while (!done && st.index < st.length) {
      if (tokenFinished(st.data(st.index))) done = true
      else { buf.append(st.data(st.index)); st.index += 1 }
    }
    val n = buf.toString.toIntOption.getOrElse(0)
    math.max(n, 0)
  }

  /** Analyzed text → term / default-operator boolean
    * (QueryBuilder.CreateBooleanQuery semantics). */
  private def newDefaultQuery(text: String): Query =
    analyzer.analyzeTerms(text).toSeq match {
      case Seq() => null
      case Seq(one) => TermQ(one)
      case many =>
        if (defaultOperator == Must) BoolQ(must = many.map(TermQ(_)))
        else BoolQ(should = many.map(TermQ(_)))
    }

  private def newPhraseQuery(text: String, slop: Int): Query =
    analyzer.analyzeTerms(text).toSeq match {
      case Seq() => null
      case Seq(one) => TermQ(one)
      case many => PhraseQ(many, slop)
    }

  /** ≙ SimpleQueryParser.cs BuildQueryTree. */
  private def buildQueryTree(st: State, branch0: Query): Unit = {
    if (branch0 == null) return
    val branch =
      if (st.not % 2 == 1)
        BoolQ(should = Seq(MatchAllQ()), mustNot = Seq(branch0))
      else branch0
    if (st.top == null) st.top = branch
    else {
      val op = if (st.currentOp != null) st.currentOp else defaultOperator
      if (st.previousOp != op) {
        // operator change: the accumulated tree becomes the first clause
        // of a fresh boolean node under the NEW operator
        st.top =
          if (op == Must) BoolQ(must = Seq(st.top))
          else BoolQ(should = Seq(st.top))
      }
      val bq = st.top.asInstanceOf[BoolQ]
      st.top =
        if (op == Must) bq.copy(must = bq.must :+ branch)
        else bq.copy(should = bq.should :+ branch)
      st.previousOp = op
    }
    st.currentOp = null
  }
}

object SimpleQueryParser {
  sealed trait Op
  case object Must extends Op
  case object Should extends Op

  /** Flag bits ≙ the reference's `Operator` enum. */
  val And = 1 << 0
  val Not = 1 << 1
  val Or = 1 << 2
  val Prefix = 1 << 3
  val Phrase = 1 << 4
  val Precedence = 1 << 5
  val Escape = 1 << 6
  val Whitespace = 1 << 7
  val Fuzzy = 1 << 8
  val Near = 1 << 9
  val AllFlags: Int = And | Not | Or | Prefix | Phrase | Precedence |
    Escape | Whitespace | Fuzzy | Near

  /** ≙ LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE. */
  val MaxEdits = 2
}
