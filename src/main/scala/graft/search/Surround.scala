package graft.search

import org.apache.spark.sql.Dataset

/** Surround query language — proximity-first front-end over the span
  * algebra (reference:
  * /root/reference/src/Lucene.Net.QueryParser/Surround/Parser/QueryParser.cs,
  * a JavaCC grammar re-expressed as recursive descent, and
  * Surround/Query/DistanceQuery.cs):
  *
  *   - infix, precedence low→high: `OR` < `AND` < `NOT` < `N` < `W`
  *   - distance ops: `a 3W b` (ordered, within 3), `a 5N b` (unordered);
  *     bare `W`/`N` mean distance 1; slop = distance − 1
  *     (DistanceQuery.cs:108: `new SpanNearQuery(clauses, OpDistance-1,
  *     ordered)`); W is ordered, N unordered (QueryParser.cs:391,360 —
  *     the file's summary comment says the opposite of its own code)
  *   - prefix (functional) forms: `AND(a, b, …)`, `OR(…)`, `3W(…)`,
  *     `N(…)` — n-ary versions of the same operators
  *   - operators are case-insensitive (`and`, `3w`, …)
  *   - terms: bare words; truncation `app*` (prefix) and embedded
  *     `*`/`?` wildcards (SrndTruncQuery); `^f` weights are parsed and
  *     carried (they do not change doc sets)
  *   - `field:` prefixes are accepted and ignored (single-text-field
  *     engine, same convention as the classic parser here)
  *
  * Execution ([[Surround.docs]]): distance subtrees compile to the
  * [[SpanQuery]] algebra (terms → SpanTermQ, truncations →
  * SpanMultiTermQ, OR → SpanOrQ, nested distance → SpanNearQ) and run
  * through [[Searcher.spanCount]]; boolean levels above them are doc-set
  * algebra (union / intersect / except of docId datasets — distributed,
  * no driver materialization). AND/NOT directly under a distance op is
  * rejected exactly like the reference
  * (DistanceQuery.cs DistanceSubQueryNotAllowed).
  */
object Surround {

  sealed trait SrndQuery
  final case class SrndTerm(text: String, weight: Float = 1f) extends SrndQuery
  /** `app*` — pure prefix truncation (SrndPrefixQuery.cs). */
  final case class SrndPrefix(prefix: String, weight: Float = 1f) extends SrndQuery
  /** embedded `*` / `?` (SrndTruncQuery.cs). */
  final case class SrndTrunc(pattern: String, weight: Float = 1f) extends SrndQuery
  final case class SrndOr(qs: Seq[SrndQuery], weight: Float = 1f) extends SrndQuery
  final case class SrndAnd(qs: Seq[SrndQuery], weight: Float = 1f) extends SrndQuery
  /** `a NOT b NOT c` — keep `pos`, subtract every `nots` (NotQuery.cs). */
  final case class SrndNot(pos: SrndQuery, nots: Seq[SrndQuery],
                           weight: Float = 1f) extends SrndQuery
  final case class SrndDistance(qs: Seq[SrndQuery], distance: Int,
                                ordered: Boolean, weight: Float = 1f) extends SrndQuery

  // ------------------------------------------------------------- parser

  def parse(input: String): SrndQuery = {
    val lx = new Lexer(input)
    val q = orQuery(lx)
    require(lx.peek.isEmpty, s"dangling input at '${lx.remaining}'")
    q
  }

  private def orQuery(lx: Lexer): SrndQuery = {
    var q = andQuery(lx)
    val more = Seq.newBuilder[SrndQuery]
    var n = 0
    while (lx.peek.exists(_.equalsIgnoreCase("or"))) {
      lx.next(); more += andQuery(lx); n += 1
    }
    if (n == 0) q else SrndOr(q +: more.result())
  }

  private def andQuery(lx: Lexer): SrndQuery = {
    val q = notQuery(lx)
    val more = Seq.newBuilder[SrndQuery]
    var n = 0
    while (lx.peek.exists(_.equalsIgnoreCase("and"))) {
      lx.next(); more += notQuery(lx); n += 1
    }
    if (n == 0) q else SrndAnd(q +: more.result())
  }

  private def notQuery(lx: Lexer): SrndQuery = {
    val q = nQuery(lx)
    val nots = Seq.newBuilder[SrndQuery]
    var n = 0
    while (lx.peek.exists(_.equalsIgnoreCase("not"))) {
      lx.next(); nots += nQuery(lx); n += 1
    }
    if (n == 0) q else SrndNot(q, nots.result())
  }

  private def isDistOp(t: String, op: Char): Boolean = {
    val l = t.toLowerCase
    l.nonEmpty && l.last == op && l.dropRight(1).forall(_.isDigit)
  }
  private def opDistance(t: String): Int =
    if (t.length == 1) 1 else t.dropRight(1).toInt

  /** `N` — unordered; left-associative binary like the reference
    * (QueryParser.cs NQuery). */
  private def nQuery(lx: Lexer): SrndQuery = {
    var q = wQuery(lx)
    while (lx.peek.exists(isDistOp(_, 'n'))) {
      val d = opDistance(lx.next())
      q = SrndDistance(Seq(q, wQuery(lx)), d, ordered = false)
    }
    q
  }

  /** `W` — ordered (QueryParser.cs WQuery). */
  private def wQuery(lx: Lexer): SrndQuery = {
    var q = primary(lx)
    while (lx.peek.exists(isDistOp(_, 'w'))) {
      val d = opDistance(lx.next())
      q = SrndDistance(Seq(q, primary(lx)), d, ordered = true)
    }
    q
  }

  private def primary(lx: Lexer): SrndQuery = {
    val tok = lx.peek.getOrElse(throw new IllegalArgumentException("unexpected end of query"))
    // prefix operator forms: OR( ), AND( ), NOT is infix-only, 3W( ), N( )
    def prefixList(): Seq[SrndQuery] = {
      require(lx.next() == "(", s"expected '(' after prefix operator")
      val qs = Seq.newBuilder[SrndQuery]
      qs += orQuery(lx)
      while (lx.peek.contains(",")) { lx.next(); qs += orQuery(lx) }
      require(lx.next() == ")", "expected ')'")
      qs.result()
    }
    tok match {
      case t if t.equalsIgnoreCase("or") && lx.peekAhead(1).contains("(") =>
        lx.next(); weighted(lx, SrndOr(prefixList()))
      case t if t.equalsIgnoreCase("and") && lx.peekAhead(1).contains("(") =>
        lx.next(); weighted(lx, SrndAnd(prefixList()))
      case t if isDistOp(t, 'w') && lx.peekAhead(1).contains("(") =>
        lx.next(); weighted(lx, SrndDistance(prefixList(), opDistance(t), ordered = true))
      case t if isDistOp(t, 'n') && lx.peekAhead(1).contains("(") =>
        lx.next(); weighted(lx, SrndDistance(prefixList(), opDistance(t), ordered = false))
      case "(" =>
        lx.next()
        val q = orQuery(lx)
        require(lx.next() == ")", "unbalanced parenthesis")
        weighted(lx, q)
      case _ =>
        lx.next()
        if (lx.peek.contains(":")) {
          // field prefix accepted & dropped (single positioned text
          // field). Recurse into a full primary like the reference's
          // FieldsQuery production, so `title:(a 3w b)` and chained
          // `a:b:term` parse; a trailing `field:` is a parse error,
          // not an index crash
          lx.next()
          if (lx.peek.isEmpty)
            throw new IllegalArgumentException(s"expected a query after '$tok:'")
          primary(lx)
        } else {
          val w = tok.toLowerCase
          val q =
            if (w.endsWith("*") && !w.dropRight(1).exists(c => c == '*' || c == '?'))
              SrndPrefix(w.dropRight(1))
            else if (w.exists(c => c == '*' || c == '?')) SrndTrunc(w)
            else SrndTerm(w)
          weighted(lx, q)
        }
    }
  }

  private def weighted(lx: Lexer, q: SrndQuery): SrndQuery =
    lx.peek.filter(_.startsWith("^")) match {
      case Some(t) =>
        lx.next()
        val w = t.drop(1).toFloat
        q match {
          case x: SrndTerm => x.copy(weight = x.weight * w)
          case x: SrndPrefix => x.copy(weight = x.weight * w)
          case x: SrndTrunc => x.copy(weight = x.weight * w)
          case x: SrndOr => x.copy(weight = x.weight * w)
          case x: SrndAnd => x.copy(weight = x.weight * w)
          case x: SrndNot => x.copy(weight = x.weight * w)
          case x: SrndDistance => x.copy(weight = x.weight * w)
        }
      case None => q
    }

  private final class Lexer(input: String) {
    private val tokens: Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      val n = input.length
      while (i < n) {
        val c = input(i)
        if (c.isWhitespace) i += 1
        else if (c == '(' || c == ')' || c == ',' || c == ':') { out += c.toString; i += 1 }
        else if (c == '^') {
          var k = i + 1
          while (k < n && (input(k).isDigit || input(k) == '.')) k += 1
          out += input.substring(i, k); i = k
        } else {
          var k = i
          while (k < n && !input(k).isWhitespace &&
            !"(),^:".contains(input(k))) k += 1
          out += input.substring(i, k); i = k
        }
      }
      out.result()
    }
    private var pos = 0
    def peek: Option[String] = if (pos < tokens.length) Some(tokens(pos)) else None
    def peekAhead(k: Int): Option[String] =
      if (pos + k < tokens.length) Some(tokens(pos + k)) else None
    def next(): String = { val t = tokens(pos); pos += 1; t }
    def remaining: String = tokens.drop(pos).mkString(" ")
  }

  // ----------------------------------------------------------- executor

  /** Distance subtree → span algebra. AND/NOT below a distance op is
    * structurally meaningless (which positions would it have?) and the
    * reference rejects it the same way (DistanceQuery.cs
    * DistanceSubQueryNotAllowed). */
  def toSpan(q: SrndQuery): SpanQuery = q match {
    case SrndTerm(t, _) => SpanTermQ(t)
    case SrndPrefix(p, _) => SpanMultiTermQ(PrefixQ(p))
    case SrndTrunc(p, _) => SpanMultiTermQ(WildcardQ(p))
    case SrndOr(qs, _) => SpanOrQ(qs.map(toSpan))
    case SrndDistance(qs, d, ordered, _) => SpanNearQ(qs.map(toSpan), d - 1, ordered)
    case other => throw new IllegalArgumentException(
      s"AND/NOT not allowed inside a distance operator: $other")
  }

  /** Pure-boolean subtree → the engine Query ADT (terms, truncations,
    * AND/OR/NOT with no distance op anywhere below). */
  private def toBool(q: SrndQuery): Option[Query] = q match {
    case SrndTerm(t, w) => Some(TermQ(t, w))
    case SrndPrefix(p, w) => Some(PrefixQ(p, w))
    case SrndTrunc(p, w) => Some(WildcardQ(p, w))
    case SrndOr(qs, _) =>
      val subs = qs.map(toBool)
      if (subs.forall(_.isDefined)) Some(BoolQ(should = subs.flatten)) else None
    case SrndAnd(qs, _) =>
      val subs = qs.map(toBool)
      if (subs.forall(_.isDefined)) Some(BoolQ(must = subs.flatten)) else None
    case SrndNot(pos, nots, _) =>
      val p = toBool(pos)
      val ns = nots.map(toBool)
      if (p.isDefined && ns.forall(_.isDefined))
        Some(BoolQ(must = p.toSeq, mustNot = ns.flatten)) else None
    case _: SrndDistance => None
  }

  /** Matching doc set of a surround query. Boolean subtrees with no
    * distance op run as ONE engine boolean (single plan, postings-pruned);
    * distance subtrees run through the span algebra; the levels above
    * them compose by distributed doc-set algebra. */
  def docs(searcher: Searcher, q: SrndQuery): Dataset[Long] = {
    val spark = searcher.reader.spark
    import spark.implicits._
    def setOf(sq: SrndQuery): Dataset[Long] = toBool(sq) match {
      case Some(bq) =>
        searcher.scored(bq).map(_.docId).distinct()
      case None => sq match {
        case d: SrndDistance =>
          searcher.spanCount(toSpan(d)).map(_._1)
        case SrndOr(qs, _) => qs.map(setOf).reduce(_ union _).distinct()
        case SrndAnd(qs, _) => qs.map(setOf).reduce(_ intersect _)
        case SrndNot(pos, nots, _) =>
          nots.map(setOf).foldLeft(setOf(pos))(_ except _)
        case other => // terms/truncs are always Some(toBool)
          throw new IllegalStateException(s"unreachable: $other")
      }
    }
    setOf(q)
  }
}
