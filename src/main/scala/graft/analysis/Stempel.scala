package graft.analysis

import scala.collection.mutable

/** Stempel algorithmic stemmer: the Egothor 2.0 patch-trie machinery the
  * reference wraps for Polish (reference:
  * /root/reference/src/Lucene.Net.Analysis.Stempel/ — Egothor.Stemmer/
  * Diff.cs, Trie.cs, Stempel/StempelStemmer.cs, Stempel/StempelFilter.cs).
  * The shipped stemmer_2000.tbl is a trained table derived from a Polish
  * lexicon; as with Hunspell/Kuromoji/SmartCn, the algorithm over a
  * user-supplied table IS the contract:
  *
  *  - A patch string is a sequence of 2-char (command, parameter) pairs
  *    applied RIGHT-TO-LEFT over the word, cursor starting on the last
  *    char and moving one left after every command (Diff.cs:113-168):
  *    `-x` skips (param-'a'+1) matching chars, `Rc` replaces the cursor
  *    char with c, `Dx` deletes (param-'a'+1) chars ending at the
  *    cursor, `Ic` inserts c after the cursor. Out-of-range access
  *    aborts the patch, keeping what was applied so far (the
  *    reference's swallowed IndexOutOfRange, :160-167).
  *  - Diff.Exec (:177-330) GENERATES the patch between two strings: an
  *    edit-distance DP (insert/delete/replace cost 1, match 0; the
  *    tie-break order is D then X>= then Y> then R>, preserved exactly)
  *    whose backtrace from the (|a|,|b|) corner emits the commands
  *    end-first — this is the Compile trainer's core, letting users
  *    build tables from (inflected, lemma) pairs.
  *  - The table is a trie over REVERSED words (stempel tables store
  *    suffix patterns; Trie.cs StrEnum with forward=false) and lookup is
  *    GetLastOnPath (Trie.cs:298-340): the command stored deepest along
  *    the reversed-word path — equivalently, the longest stored key that
  *    prefixes the reversed word (every stored key materializes its own
  *    edge path, and the walk stops at the first missing edge, so no
  *    deeper disconnected key can be reached).
  *  - StempelStemmer.Stem (StempelStemmer.cs:87-103): apply the
  *    last-on-path patch; empty result => null (unstemmable).
  *  - StempelFilter (StempelFilter.cs:42-85): only terms LONGER than
  *    minLength (default 3) are stemmed; a null stem keeps the original
  *    term.
  */
object Stempel {

  /** Diff.Apply (Diff.cs:113-168). */
  def applyPatch(word: String, diff: String): String = {
    if (diff == null) return word
    val dest = new StringBuilder(word)
    var pos = dest.length - 1
    if (pos < 0) return word
    var i = 0
    while (i < diff.length / 2) {
      val cmd = diff.charAt(2 * i)
      val param = diff.charAt(2 * i + 1)
      val parNum = param - 'a' + 1
      cmd match {
        case '-' => pos = pos - parNum + 1
        case 'R' =>
          if (pos < 0 || pos >= dest.length) return dest.toString
          dest.setCharAt(pos, param)
        case 'D' =>
          val o = pos
          pos -= parNum - 1
          if (pos < 0 || o + 1 > dest.length) return dest.toString
          dest.delete(pos, o + 1)
        case 'I' =>
          pos += 1
          if (pos < 0 || pos > dest.length) return dest.toString
          dest.insert(pos, param)
      }
      pos -= 1
      i += 1
    }
    dest.toString
  }

  /** Diff.Exec (Diff.cs:177-330), costs (ins, del, rep, noop) =
    * (1, 1, 1, 0): the patch transforming `a` into `b`. */
  def diff(a: String, b: String): String = {
    val X = 1; val Y = 2; val R = 3; val D = 0
    val maxx = a.length + 1; val maxy = b.length + 1
    val net = Array.ofDim[Int](maxx, maxy)
    val way = Array.ofDim[Int](maxx, maxy)
    for (x <- 1 until maxx) { net(x)(0) = x; way(x)(0) = X }
    for (y <- 1 until maxy) { net(0)(y) = y; way(0)(y) = Y }
    val go = new Array[Int](4)
    for (x <- 1 until maxx; y <- 1 until maxy) {
      go(X) = net(x - 1)(y) + 1
      go(Y) = net(x)(y - 1) + 1
      go(R) = net(x - 1)(y - 1) + 1
      go(D) = net(x - 1)(y - 1) + (if (a.charAt(x - 1) == b.charAt(y - 1)) 0 else 100)
      var min = D
      if (go(min) >= go(X)) min = X   // the reference's exact tie-break
      if (go(min) > go(Y)) min = Y
      if (go(min) > go(R)) min = R
      way(x)(y) = min
      net(x)(y) = go(min)
    }
    val result = new StringBuilder
    val base = ('a' - 1).toChar
    var deletes = base
    var equals = base
    var x = maxx - 1; var y = maxy - 1
    def flushDeletes(): Unit =
      if (deletes != base) { result.append('D').append(deletes); deletes = base }
    def flushEquals(): Unit =
      if (equals != base) { result.append('-').append(equals); equals = base }
    while (x + y != 0) {
      way(x)(y) match {
        case X => flushEquals(); deletes = (deletes + 1).toChar; x -= 1
        case Y =>
          flushDeletes(); flushEquals()
          y -= 1; result.append('I').append(b.charAt(y))
        case R =>
          flushDeletes(); flushEquals()
          y -= 1; result.append('R').append(b.charAt(y)); x -= 1
        case D => flushDeletes(); equals = (equals + 1).toChar; x -= 1; y -= 1
      }
    }
    flushDeletes()
    result.toString
  }

  /** The reversed-key patch trie with last-on-path lookup
    * (Trie.cs:298-340; stempel tables use forward=false, so keys here
    * are stored and matched over the REVERSED word). */
  final class Trie(forward: Boolean = false) extends Serializable {
    // keys kept in WALK order: the word itself when forward, the
    // reversed word otherwise (StrEnum's direction, Trie.cs:448-480)
    private val cmds = mutable.Map.empty[String, String]
    private var maxKeyLen = 0
    private def walkOrder(k: String): String = if (forward) k else k.reverse

    /** Store a patch under a key given in READING order (a suffix
      * pattern when forward=false, e.g. add("ing", "Dc")). */
    def add(key: String, cmd: String): this.type = {
      cmds(walkOrder(key)) = cmd
      maxKeyLen = math.max(maxKeyLen, key.length)
      this
    }

    /** Longest stored key prefixing the walk-order word. */
    def getLastOnPath(word: String): String = {
      val w = walkOrder(word)
      var n = math.min(maxKeyLen, w.length)
      while (n > 0) {
        cmds.get(w.substring(0, n)) match {
          case Some(c) => return c
          case None => n -= 1
        }
      }
      null
    }
  }

  /** StempelStemmer.Stem (StempelStemmer.cs:87-103). */
  def stem(trie: Trie, word: String): String = {
    val cmd = trie.getLastOnPath(word)
    if (cmd == null) return null
    val out = applyPatch(word, cmd)
    if (out.nonEmpty) out else null
  }

  /** StempelFilter semantics over one term (StempelFilter.cs:71-85). */
  def filterTerm(trie: Trie, term: String, minLength: Int = 3): String =
    if (term.length <= minLength) term
    else {
      val s = stem(trie, term)
      if (s == null) term else s
    }

  /** Build a table from (inflected, lemma) training pairs keyed by the
    * inflected word itself — the Compile trainer's essential move
    * (Compile.cs builds exactly diff(word, lemma) per entry before the
    * Gener/Lift size optimizations, which don't change lookups). */
  def train(pairs: Seq[(String, String)], forward: Boolean = false): Trie = {
    val t = new Trie(forward)
    for ((w, l) <- pairs) t.add(w, diff(w, l))
    t
  }
}
