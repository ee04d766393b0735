package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE trainer: hand-computed merge sequences on the Sennrich-style toy
  * corpus, greedy-leftmost merge semantics, deterministic tie-breaks,
  * and encode == training-time segmentation. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** The classic fixture family: low/lower/newest/widest with skewed
    * frequencies (each doc_id repeats its word). */
  private lazy val docs = Seq(
    (0L, "low low low low low"),
    (1L, "lower lower"),
    (2L, "newest newest newest newest newest newest"),
    (3L, "widest widest widest")).toDF("doc_id", "text")

  test("pair census: weighted counts match hand arithmetic") {
    val census = Bpe.initialPairCensus(docs)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // 'lo': 5 (low) + 2 (lower) = 7; 'es': 6 (newest) + 3 (widest) = 9
    assert(census(("l", "o")) === 7L)
    assert(census(("e", "s")) === 9L)
    assert(census(("s", "t")) === 9L)
    assert(census(("w", "e")) === 2L + 6L) // lower, newest
  }

  test("training learns es/est first (count 9), ties broken lexicographically") {
    val merges = Bpe.train(docs, nMerges = 3)
    // round 1: (e,s) and (s,t) both 9 -> (e,s) wins lexicographically
    assert(merges.head === (("e", "s")))
    // round 2: (es,t) now 9 — beats everything else
    assert(merges(1) === (("es", "t")))
    // round 3: 'lo' at 7 is next ((l,o)=7 vs (n,e)=6, (w,i)=3...)
    assert(merges(2) === (("l", "o")))
  }

  test("greedy leftmost non-overlapping merge: aaaa + (a,a) -> [aa, aa]") {
    val df = Seq("aaaa", "aaa", "baab").toDF("w")
    val enc = Bpe.encode(df, "w", Seq(("a", "a")))
      .select($"w", $"bpe").as[(String, Seq[String])].collect().toMap
    assert(enc("aaaa") === Seq("aa", "aa"))
    assert(enc("aaa") === Seq("aa", "a"))
    assert(enc("baab") === Seq("b", "aa", "b"))
  }

  test("encode applies merges in training order and reproduces training segmentation") {
    val merges = Bpe.train(docs, nMerges = 4)
    val enc = Bpe.encode(Seq("newest", "lowest", "low").toDF("w"), "w", merges)
      .select($"w", $"bpe").as[(String, Seq[String])].collect().toMap
    // after es, est, lo, (low or n-e...): 'newest' ends with the est unit
    assert(enc("newest").last === "est")
    assert(enc("low").head.startsWith("lo"))
    // unseen word still segments with learned units
    assert(enc("lowest").contains("est") ||
      enc("lowest").exists(_.endsWith("est")))
  }

  test("censusAfter: round-2 counts reflect the applied first merge") {
    val c = Bpe.censusAfter(docs, nMerges = 1)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // merge 1 is (e,s): newest -> n,e,w,es,t and widest -> w,i,d,es,t
    assert(c(("es", "t")) === 9L)
    assert(c(("w", "es")) === 6L)
    assert(c(("d", "es")) === 3L)
    assert(!c.contains(("e", "s"))) // the merged pair is gone
    assert(c(("l", "o")) === 7L)    // untouched words keep their counts
  }

  test("train stops early when words are fully fused") {
    val tiny = Seq((0L, "ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(tiny, nMerges = 10)
    assert(merges === Seq(("a", "b"))) // after one merge no pairs remain
  }
}
