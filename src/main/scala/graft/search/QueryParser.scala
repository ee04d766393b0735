package graft.search

import graft.analysis.Analyzer
import scala.collection.mutable.ArrayBuffer

/** Classic query-syntax parser (reference:
  * /root/reference/src/Lucene.Net.QueryParser/Classic/QueryParser.cs:267-420,
  * fresh recursive-descent implementation of the public syntax):
  *
  *   - terms: `foo`, fielded `content:foo` (single-field engine — the
  *     field prefix is accepted and ignored)
  *   - boolean: `AND`/`&&`, `OR`/`||`, `NOT`/`!`, `+required`, `-prohibited`
  *   - phrases: `"a b"` with optional slop `"a b"~2`
  *   - wildcards `wi?ld*`, prefix `pre*`, regexp `/re.gex/`
  *   - fuzzy `term~` (2 edits) / `term~1`
  *   - ranges `[a TO b]` (inclusive) / `{a TO b}` (exclusive), mixable
  *   - boosts `term^2.5`, group boosts `(a b)^2`
  *   - grouping `( ... )`
  *
  * Query-side text runs through the same Analyzer as the index
  * (index/query token parity — reference: Util/QueryBuilder.cs:73-105):
  * a term that analyzes to nothing (stopword) vanishes; to several tokens
  * becomes a SHOULD group (CreateBooleanQuery semantics); quoted text
  * becomes a PhraseQ over its analyzed tokens.
  *
  * Occur semantics match the classic parser's default-OR behavior:
  * bare clauses are SHOULD, `AND` upgrades both neighbors to MUST,
  * `NOT`/`-` marks MUST_NOT, `+` marks MUST.
  */
/** An extension-point query fragment (reference:
  * QueryParser/Ext/ExtensionQuery.cs): the index field in play (the
  * default text field when the extension key stood alone) and the raw,
  * unanalyzed query text after the key. */
final case class ExtensionQuery(field: String, rawQueryString: String)

final class QueryParser(analyzer: Analyzer = Analyzer.standard,
    keywordFields: Set[String] = Set("repo", "path", "commit", "lang"),
    /** ExtendableQueryParser hook (reference: QueryParser/Ext/
      * ExtendableQueryParser.cs:72-105 + Extensions.cs:114-122): a field
      * token `field:key:raw` (or `key:raw` on the default field) whose
      * `key` is registered here parses as
      * `extensions(key)(ExtensionQuery(field, raw))` instead of a term;
      * unregistered keys fall back to classic behavior, exactly the
      * reference's resolve-or-super contract. The default ':' delimiter
      * is the reference's DEFAULT_EXTENSION_FIELD_DELIMITER. */
    extensions: Map[String, ExtensionQuery => Query] = Map.empty,
    defaultFieldName: String = "content",
    /** AnalyzingQueryParser mode (reference: QueryParser/Analyzing/
      * AnalyzingQueryParser.cs:67-180): when true, the non-wildcard
      * chunks of wildcard terms and the whole term of prefix/fuzzy
      * queries are passed through the analyzer (each chunk must yield
      * exactly ONE token — none or several is a parse error, the
      * reference's ParseException contract) instead of the classic
      * parser's bare lowercasing. */
    analyzeMultiTerm: Boolean = false) {

  private sealed trait Occur
  private case object Should extends Occur
  private case object Must extends Occur
  private case object MustNot extends Occur

  def parse(input: String): Query = {
    val (q, rest) = parseQuery(new Lexer(input))
    require(rest.peek.isEmpty, s"dangling input at '${rest.remaining}'")
    q
  }

  /** PrecedenceQueryParser mode (reference:
    * QueryParser/Flexible/Precedence/PrecedenceQueryParser.cs +
    * BooleanModifiersQueryNodeProcessor.cs): same token syntax as
    * [[parse]], but AND binds TIGHTER than OR instead of the classic
    * parser's upgrade-the-neighbors behavior — `a AND b OR c` parses as
    * `(+a +b) c`, `((a OR b) AND NOT c) OR d` as `(+(a b) -c) d`
    * (TestPrecedenceQueryParser.cs:222-271). Explicit `+`/`-`/`NOT`
    * modifiers override the AND-group default. */
  def parsePrecedence(input: String): Query = {
    val (q, rest) = precOr(new Lexer(input))
    require(rest.peek.isEmpty, s"dangling input at '${rest.remaining}'")
    q.getOrElse(BoolQ(Nil, Nil, Nil))
  }

  private def combineClauses(cl: Seq[(Occur, Query)]): Query = {
    val must = cl.collect { case (Must, q) => q }
    val should = cl.collect { case (Should, q) => q }
    val mustNot = cl.collect { case (MustNot, q) => q }
    (must, should, mustNot) match {
      case (Seq(one), Nil, Nil) => one
      case (Nil, Seq(one), Nil) => one
      case _ => BoolQ(must, should, mustNot)
    }
  }

  private def precOr(lx: Lexer): (Option[Query], Lexer) = {
    val groups = ArrayBuffer.empty[(Occur, Query)]
    var cur = lx
    var done = false
    while (!done && cur.peek.exists(_ != ")")) {
      val (m, nx) = precAnd(cur)
      m.foreach(groups += _)
      cur = nx
      if (cur.peek.exists(t => t == "OR" || t == "||")) cur = cur.advance
      else if (!cur.peek.exists(_ != ")")) done = true
      // bare adjacency = default OR: just loop
    }
    if (groups.isEmpty) (None, cur)
    else (Some(combineClauses(groups.toSeq)), cur)
  }

  /** One AND-bound group; returns its occur at the enclosing OR level
    * (a lone clause carries its own modifier up; a multi-clause AND
    * group is itself an unmodified SHOULD member). */
  private def precAnd(lx: Lexer): (Option[(Occur, Query)], Lexer) = {
    val members = ArrayBuffer.empty[(Occur, Query)]
    var cur = lx
    val (m0, nx0) = precMod(cur)
    m0.foreach(members += _)
    cur = nx0
    while (cur.peek.exists(t => t == "AND" || t == "&&")) {
      cur = cur.advance
      val (m, nx) = precMod(cur)
      m.foreach(members += _)
      cur = nx
    }
    if (members.isEmpty) (None, cur)
    else if (members.length == 1) (Some(members(0)), cur)
    else {
      // AND group: unmodified members become MUST, explicit -/NOT stay out
      val upgraded = members.toSeq.map {
        case (Should, q) => (Must: Occur, q)
        case other => other
      }
      (Some((Should, combineClauses(upgraded))), cur)
    }
  }

  private def precMod(lx: Lexer): (Option[(Occur, Query)], Lexer) = {
    var cur = lx
    var occ: Occur = Should
    cur.peek match {
      case Some("NOT") | Some("!") => occ = MustNot; cur = cur.advance
      case Some("+") => occ = Must; cur = cur.advance
      case Some("-") => occ = MustNot; cur = cur.advance
      case _ =>
    }
    if (cur.peek.contains("(")) {
      val (q, nx) = precOr(cur.advance)
      require(nx.peek.contains(")"), "unbalanced parenthesis")
      var cur2 = nx.advance
      var q2 = q
      if (cur2.peek.exists(_.startsWith("^"))) {
        val boost = cur2.peek.get.drop(1).toFloat
        q2 = q2.map(applyBoost(_, boost))
        cur2 = cur2.advance
      }
      (q2.map(qq => (occ, qq)), cur2)
    } else {
      val (q, nx) = parseClause(cur)
      (q.map(qq => (occ, qq)), nx)
    }
  }

  // ------------------------------------------------------------- grammar

  private def parseQuery(lx: Lexer): (Query, Lexer) = {
    val clauses = ArrayBuffer.empty[(Occur, Query)]
    var cur = lx
    var pendingOp: Option[String] = None
    while (cur.peek.exists(_ != ")")) {
      val tok = cur.peek.get
      tok match {
        case "AND" | "&&" =>
          pendingOp = Some("AND"); cur = cur.advance
        case "OR" | "||" =>
          pendingOp = Some("OR"); cur = cur.advance
        case "NOT" | "!" =>
          cur = cur.advance
          val (q, nx) = parseClause(cur)
          q.foreach(qq => clauses += ((MustNot, qq)))
          cur = nx
          pendingOp = None
        case _ =>
          val (occur0, cur2) = tok match {
            case "+" => (Must: Occur, cur.advance)
            case "-" => (MustNot: Occur, cur.advance)
            case _ => (Should: Occur, cur)
          }
          val (q, nx) = parseClause(cur2)
          q.foreach { qq =>
            val occur =
              if (occur0 != Should) occur0
              else if (pendingOp.contains("AND")) {
                // AND upgrades the previous scoring clause too
                if (clauses.nonEmpty && clauses.last._1 == Should)
                  clauses(clauses.length - 1) = (Must, clauses.last._2)
                Must
              } else Should
            clauses += ((occur, qq))
          }
          cur = nx
          pendingOp = None
      }
    }
    val must = clauses.collect { case (Must, q) => q }.toSeq
    val should = clauses.collect { case (Should, q) => q }.toSeq
    val mustNot = clauses.collect { case (MustNot, q) => q }.toSeq
    val q = (must, should, mustNot) match {
      case (Seq(one), Nil, Nil) => one
      case (Nil, Seq(one), Nil) => one
      case _ => BoolQ(must, should, mustNot)
    }
    (q, cur)
  }

  /** One clause: optional field prefix, then a primary, then ^boost.
    * A KEYWORD field prefix (`path:`, `lang:`, …) takes the next token
    * verbatim as an exact StringField term — reference: StringField is
    * indexed untokenized, so query text must not be analyzed either; any
    * other prefix (`content:`, unknown) selects the default text field. */
  private def parseClause(lx: Lexer): (Option[Query], Lexer) = {
    var cur = lx
    var field: Option[String] = None
    if (cur.peek.exists(t => t.endsWith(":") && t.length > 1)) {
      field = Some(cur.peek.get.dropRight(1))
      cur = cur.advance
    }
    field match {
      case Some(f) if keywordFields(f) =>
        val tok = cur.peek.getOrElse(
          throw new IllegalArgumentException(s"missing term after '$f:'"))
        var q: Query = TermQ(s"$f:$tok")
        var cur2 = cur.advance
        if (cur2.peek.exists(_.startsWith("^"))) {
          q = applyBoost(q, cur2.peek.get.drop(1).toFloat)
          cur2 = cur2.advance
        }
        return (Some(q), cur2)
      case Some(key) if extensions.contains(key) =>
        // `key:raw` — extension on the default field
        val raw = cur.peek.getOrElse(
          throw new IllegalArgumentException(s"missing text after '$key:'"))
        return withBoost(
          extensions(key)(ExtensionQuery(defaultFieldName, raw)), cur.advance)
      case Some(f) if cur.peek.exists(_.contains(':')) =>
        // `field:key:raw` — the lexer split the field off; the remainder
        // carries key:raw
        val tok = cur.peek.get
        val idx = tok.indexOf(':')
        val key = tok.substring(0, idx)
        if (extensions.contains(key))
          return withBoost(
            extensions(key)(ExtensionQuery(f, tok.substring(idx + 1))),
            cur.advance)
      case _ => // default text field
    }
    val (q0, nx) = parsePrimary(cur)
    var cur2 = nx
    var q = q0
    if (cur2.peek.exists(_.startsWith("^"))) {
      val boost = cur2.peek.get.drop(1).toFloat
      q = q.map(applyBoost(_, boost))
      cur2 = cur2.advance
    }
    (q, cur2)
  }

  private def withBoost(q0: Query, lx: Lexer): (Option[Query], Lexer) = {
    var q = q0
    var cur = lx
    if (cur.peek.exists(_.startsWith("^"))) {
      q = applyBoost(q, cur.peek.get.drop(1).toFloat)
      cur = cur.advance
    }
    (Some(q), cur)
  }

  private def parsePrimary(lx: Lexer): (Option[Query], Lexer) = {
    val tok = lx.peek.getOrElse(throw new IllegalArgumentException("unexpected end of query"))
    tok match {
      case "(" =>
        val (q, nx) = parseQuery(lx.advance)
        require(nx.peek.contains(")"), "unbalanced parenthesis")
        (Some(q), nx.advance)
      case t if t.startsWith("\"") =>
        val inner = t.stripPrefix("\"").stripSuffix("\"")
        var cur = lx.advance
        var slop = 0
        if (cur.peek.exists(p => p.startsWith("~"))) {
          slop = cur.peek.get.drop(1).toInt
          cur = cur.advance
        }
        val words = inner.split("\\s+").filter(_.nonEmpty).toSeq
        if (words.exists(w => w.contains("*") || w.contains("?") || w.contains("~"))) {
          // complex phrase (ComplexPhraseQueryParser syntax): wildcard /
          // prefix / fuzzy parts expand into multi-phrase slots at rewrite
          val parts = words.flatMap(w => wordToQuery(w).toSeq.flatMap {
            case BoolQ(_, should, _, _, _) => should // multi-token word → one slot each
            case q => Seq(q)
          })
          (if (parts.isEmpty) None else Some(ComplexPhraseQ(parts, slop)), cur)
        } else {
          val terms = analyzer.analyzeTerms(inner).toSeq
          (if (terms.isEmpty) None else Some(PhraseQ(terms, slop, raw = Some(inner))), cur)
        }
      case t if t.startsWith("[") || t.startsWith("{") =>
        // range token is pre-assembled by the lexer: [lo TO hi] / {lo TO hi}
        val inclLo = t.startsWith("[")
        val inclHi = t.endsWith("]")
        val body = t.substring(1, t.length - 1)
        val parts = body.split("\\s+TO\\s+")
        require(parts.length == 2, s"bad range: $t")
        def side(s: String): String =
          if (s == "*") null else Analyzer.lowerCase(s)
        (Some(TermRangeQ(side(parts(0)), side(parts(1)), inclLo, inclHi)), lx.advance)
      case t if t.startsWith("/") && t.endsWith("/") && t.length >= 2 =>
        (Some(RegexpQ(t.substring(1, t.length - 1))), lx.advance)
      case t => (wordToQuery(t), lx.advance)
    }
  }

  /** `~N` / `~` / classic `~0.8` fuzzy suffix → edit budget (the classic
    * parser's float-similarity syntax maps into the modern 0-2 edit
    * range; a malformed suffix is rejected with a parse error instead of
    * a raw NumberFormatException). */
  private def fuzzyEdits(tail: String): Int =
    if (tail.isEmpty) 2
    else tail.toIntOption.getOrElse {
      val f = tail.toFloatOption.getOrElse(
        throw new IllegalArgumentException(s"bad fuzzy suffix '~$tail'"))
      require(f >= 0f && f < 1f, s"fuzzy similarity out of range: $f")
      if (f >= 0.5f) 1 else 2
    }

  /** One bare word → its query: fuzzy suffix, prefix/wildcard syntax, or
    * analyzed term(s). Shared by the clause and complex-phrase grammars. */
  /** AnalyzingQueryParser.AnalyzeSingleChunk (:134-180): the chunk must
    * analyze to exactly one token. */
  private def analyzeChunk(term: String, chunk: String): String =
    analyzer.analyzeTerms(chunk).toSeq match {
      case Seq(one) => one
      case Seq() => throw new IllegalArgumentException(
        s"analyzer returned no output for '$chunk' in '$term'")
      case many => throw new IllegalArgumentException(
        s"analyzer returned several terms ${many.mkString("\"", "\",\"", "\"")} " +
          s"for '$chunk' in '$term' — cannot build a multi-term query")
    }

  private def multiTermText(t: String): String =
    if (!analyzeMultiTerm) Analyzer.lowerCase(t)
    else {
      // analyze between wildcard runs (the (\\.)|([?*]+) walk, :80-115;
      // this grammar has no escape syntax, so only the wildcard branch)
      val sb = new StringBuilder
      var i = 0
      while (i < t.length) {
        var j = i
        while (j < t.length && t.charAt(j) != '*' && t.charAt(j) != '?') j += 1
        if (j > i) sb.append(analyzeChunk(t, t.substring(i, j)))
        i = j
        while (i < t.length && (t.charAt(i) == '*' || t.charAt(i) == '?')) {
          sb.append(t.charAt(i)); i += 1
        }
      }
      sb.toString
    }

  private def wordToQuery(t: String): Option[Query] = t.lastIndexOf('~') match {
    case i if i >= 0 =>
      val base = t.substring(0, i)
      Some(FuzzyQ(
        if (analyzeMultiTerm) analyzeChunk(t, base) else Analyzer.lowerCase(base),
        fuzzyEdits(t.substring(i + 1))))
    case _ if t.contains("*") || t.contains("?") =>
      val text = multiTermText(t)
      if (text.endsWith("*") && !text.dropRight(1).exists(c => c == '*' || c == '?'))
        Some(PrefixQ(text.dropRight(1)))
      else Some(WildcardQ(text))
    case _ => analyzer.analyzeTerms(t).toSeq match {
      case Seq() => None // stopword-only clause vanishes
      case Seq(one) => Some(TermQ(one))
      case many => Some(BoolQ(should = many.map(TermQ(_))))
    }
  }

  private def applyBoost(q: Query, boost: Float): Query = q match {
    case t: TermQ => t.copy(boost = t.boost * boost)
    case b: BoolQ => b.copy(boost = b.boost * boost)
    case p: PhraseQ => p.copy(boost = p.boost * boost)
    case m: MultiPhraseQ => m.copy(boost = m.boost * boost)
    case c: ComplexPhraseQ => c.copy(boost = c.boost * boost)
    case p: PrefixQ => p.copy(boost = p.boost * boost)
    case w: WildcardQ => w.copy(boost = w.boost * boost)
    case r: RegexpQ => r.copy(boost = r.boost * boost)
    case f: FuzzyQ => f.copy(boost = f.boost * boost)
    case r: TermRangeQ => r.copy(boost = r.boost * boost)
    case c: ConstantScoreQ => c.copy(boost = c.boost * boost)
    case m: MatchAllQ => m.copy(boost = m.boost * boost)
    case d: DisMaxQ => ConstantScoreQ(d, boost) // no boost field; wrap
    // function-query nodes: a boost is score × const — fold it into the
    // expression (FunctionScoreQ) or wrap (BoostingQ keeps its semantics)
    case fq: FunctionScoreQ =>
      fq.copy(expr = ScoreExpr.Mul(ScoreExpr.Const(boost), fq.expr))
    case bq: BoostingQ =>
      FunctionScoreQ(bq, ScoreExpr.Mul(ScoreExpr.Const(boost), ScoreExpr.SubScore))
  }

  // -------------------------------------------------------------- lexer

  /** Immutable cursor over the token stream. Tokens: ( ) + - ! "..." ~n
    * ^n [..TO..] {..TO..} /regex/ field: words. */
  private final class Lexer private (tokens: Vector[String], pos: Int) {
    def this(input: String) = this(Lexer.tokenize(input), 0)
    def peek: Option[String] = if (pos < tokens.length) Some(tokens(pos)) else None
    def advance: Lexer = new Lexer(tokens, pos + 1)
    def remaining: String = tokens.drop(pos).mkString(" ")
  }

  private object Lexer {
    def tokenize(in: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      val n = in.length
      def isWordChar(c: Char): Boolean =
        !c.isWhitespace && !"()+^\"[]{}!".contains(c)
      while (i < n) {
        val c = in(i)
        if (c.isWhitespace) i += 1
        else if (c == '(' || c == ')' || c == '+' || c == '!') { out += c.toString; i += 1 }
        else if (c == '-') { out += "-"; i += 1 }
        else if (c == '^' || c == '~') {
          var k = i + 1
          while (k < n && (in(k).isDigit || in(k) == '.')) k += 1
          out += in.substring(i, k); i = k
        } else if (c == '"') {
          var k = i + 1
          while (k < n && in(k) != '"') k += 1
          require(k < n, "unterminated phrase")
          out += in.substring(i, k + 1); i = k + 1
        } else if (c == '/') {
          var k = i + 1
          while (k < n && in(k) != '/') k += 1
          require(k < n, "unterminated regexp")
          out += in.substring(i, k + 1); i = k + 1
        } else if (c == '[' || c == '{') {
          val close = if (in.indexOf(']', i) >= 0 && (in.indexOf('}', i) < 0 || in.indexOf(']', i) < in.indexOf('}', i))) in.indexOf(']', i) else in.indexOf('}', i)
          require(close > i, "unterminated range")
          out += in.substring(i, close + 1); i = close + 1
        } else {
          var k = i
          while (k < n && isWordChar(in(k)) && in(k) != '~') k += 1
          var tok = in.substring(i, k)
          // attach field prefix as its own token
          if (tok.endsWith(":")) { out += tok; i = k }
          else if (tok.contains(":")) {
            val idx = tok.indexOf(':')
            out += tok.substring(0, idx + 1)
            tok = tok.substring(idx + 1)
            if (k < n && in(k) == '~') {
              var m = k + 1
              while (m < n && (in(m).isDigit || in(m) == '.')) m += 1
              tok += in.substring(k, m); k = m
            }
            out += tok; i = k
          } else {
            if (k < n && in(k) == '~') {
              var m = k + 1
              while (m < n && (in(m).isDigit || in(m) == '.')) m += 1
              tok += in.substring(k, m); k = m
            }
            out += tok; i = k
          }
        }
      }
      out.result()
    }
  }
}
