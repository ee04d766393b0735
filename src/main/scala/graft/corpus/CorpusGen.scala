package graft.corpus

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, SparkSession}

/** One row of the input corpus table — the `input_hint` shape:
  * (repo, path, commit, lang, content) + the sha256(content) per-row
  * invariant carried through every stage. */
final case class SourceFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    sha256: String)

/** Integer → English words, deterministic (the reference's corpus trick —
  * doc i's text is a pure function of i, so expected tf/df/doc-length are
  * computable in tests without indexing; reference pattern:
  * /root/reference/src/Lucene.Net.TestFramework/Util/English.cs:224).
  * Fresh implementation; spellings are our own fixture contract. */
object English {
  private val small = Array("zero", "one", "two", "three", "four", "five",
    "six", "seven", "eight", "nine", "ten", "eleven", "twelve", "thirteen",
    "fourteen", "fifteen", "sixteen", "seventeen", "eighteen", "nineteen")
  private val tens = Array("", "", "twenty", "thirty", "forty", "fifty",
    "sixty", "seventy", "eighty", "ninety")

  def spell(n: Long): String = {
    require(n >= 0)
    if (n < 20) small(n.toInt)
    else if (n < 100) {
      val t = tens((n / 10).toInt)
      if (n % 10 == 0) t else s"$t ${small((n % 10).toInt)}"
    } else if (n < 1000) {
      val h = s"${small((n / 100).toInt)} hundred"
      if (n % 100 == 0) h else s"$h ${spell(n % 100)}"
    } else if (n < 1000000L) {
      val th = s"${spell(n / 1000)} thousand"
      if (n % 1000 == 0) th else s"$th ${spell(n % 1000)}"
    } else {
      val m = s"${spell(n / 1000000L)} million"
      if (n % 1000000L == 0) m else s"$m ${spell(n % 1000000L)}"
    }
  }
}

/** Deterministic synthetic source-code corpus (FIXTURES.md §1): everything
  * is a pure function of the doc index, seed-free, so closed-form facts hold:
  * df("def") == numDocs, tf("def", doc i) == 1 + i % 40.
  */
object CorpusGen {
  private val langs = Array("scala", "java", "cs", "py", "txt")
  private val exts = Map("scala" -> "scala", "java" -> "java", "cs" -> "cs",
    "py" -> "py", "txt" -> "txt")
  val Repos = 7

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }

  def content(i: Long): String = {
    val lang = langs((i % langs.length).toInt)
    val sb = new StringBuilder
    sb ++= s"// $lang sample ${English.spell(i)}\n"
    val lines = 1 + (i % 40).toInt
    var j = 0
    while (j < lines) {
      sb ++= s"def f$j(x$j: Int) = x$j + ${English.spell((i * 31 + j) % 1000)}\n"
      j += 1
    }
    sb.toString
  }

  def doc(i: Long): SourceFile = {
    val lang = langs((i % langs.length).toInt)
    val c = content(i)
    SourceFile(
      repo = s"repo-${i % Repos}",
      path = s"src/$lang/f${i / Repos}.${exts(lang)}",
      commit = f"${i % 3}%040x",
      lang = lang,
      content = c,
      sha256 = sha256Hex(c))
  }

  /** Local (driver-side) corpus for unit tests. */
  def local(numDocs: Int): Seq[SourceFile] = (0L until numDocs.toLong).map(doc)

  /** Distributed corpus: generated on executors (no driver materialization),
    * `parallelism` generation tasks — at real scale this is the
    * Iceberg-table scan; here it stands in for it. */
  def dataset(spark: SparkSession, numDocs: Long, parallelism: Int = 32): Dataset[SourceFile] = {
    import spark.implicits._
    spark.range(0, numDocs, 1, parallelism).map(r => doc(r))
  }

  /** The 6-doc micro scoring fixture (FIXTURES.md §3, TestTermScorer
    * pattern — reference: Lucene.Net.Tests/Search/TestTermScorer.cs:44). */
  def microFixture: Seq[SourceFile] = {
    val values = Seq("all", "dogs dogs", "like", "playing", "fetch", "all")
    values.zipWithIndex.map { case (v, i) =>
      SourceFile("repo-0", s"f$i", "0" * 40, "txt", v, sha256Hex(v))
    }
  }
}
