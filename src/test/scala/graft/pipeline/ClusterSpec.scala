package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connected components / duplicate clusters, exact span dedup,
  * decontamination, and mixture sampling — the post-pair-generation half
  * of the dedup pipeline plus the corpus-recipe ops. */
class ClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap

  test("connected components: transitive chain collapses to one min label") {
    // A~B, B~C, C~D — never all in one pair; a per-pair keeper rule would
    // keep 1 and 3 while dropping 2 and 4's only links. CC must label all
    // four with 1.
    val labels = cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("connected components: disjoint components keep separate labels") {
    val labels = cc(Seq(5L -> 9L, 9L -> 7L, 20L -> 30L, 40L -> 41L, 41L -> 40L))
    assert(labels === Map(5L -> 5L, 9L -> 5L, 7L -> 5L,
      20L -> 20L, 30L -> 20L, 40L -> 40L, 41L -> 40L))
  }

  test("connected components: long path converges (star contraction, O(log n))") {
    // path 10-9-8-...-1 with labels propagating from the far end — the
    // worst case for min-label propagation at this size.
    val path = (1L until 10L).map(i => i -> (i + 1))
    val labels = cc(path)
    assert(labels.values.toSet === Set(1L))
    assert(labels.keySet === (1L to 10L).toSet)
  }

  test("connected components: 1001-node chain (diameter 1000 >> maxIter) converges") {
    // The adversarial shape that made min-label propagation throw: a
    // path graph needs diameter rounds under label propagation but only
    // O(log n) large-star/small-star rounds. 1001 nodes, diameter 1000,
    // default maxIter 50 — converges with room to spare, all labeled 1.
    val path = (1L until 1001L).map(i => i -> (i + 1))
    val labels = cc(path)
    assert(labels.values.toSet === Set(1L))
    assert(labels.keySet === (1L to 1001L).toSet)
  }

  test("connected components: self-loops and isolated pair nodes keep their label") {
    val labels = cc(Seq(7L -> 7L, 3L -> 4L))
    assert(labels === Map(7L -> 7L, 3L -> 3L, 4L -> 3L))
  }

  test("connected components: maxIter exhaustion throws instead of lying") {
    // maxIter=0 can never observe a stable round on a non-empty graph
    intercept[IllegalStateException] {
      Dedup.connectedComponents(Seq(1L -> 2L).toDF("a", "b"), maxIter = 0).collect()
    }
  }

  test("minhash clusters: exact+near copies form one cluster, keeper = min doc_id") {
    val docs = Seq(
      0L -> "the quick brown fox jumps over the lazy dog again and again",
      1L -> "spark builds inverted index postings with delta encoded blocks",
      100L -> "the quick brown fox jumps over the lazy dog again and again",
      101L -> "spark builds inverted index postings with gamma encoded blocks",
      102L -> "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"
    ).toDF("doc_id", "text")
    val out = Dedup.minhashClusters(docs, minJaccard = 0.3)
      .as[(Long, Long, Boolean)].collect().toSet
    // the exact copy (0,100) and the near copy (1,101) — the two pair
    // families PipelineSpec already proves LSH finds — become two
    // clusters rooted at their min doc_ids; 102 is in no pair → absent.
    assert(out === Set((0L, 0L, true), (100L, 0L, false),
      (1L, 1L, true), (101L, 1L, false)))
  }

  test("incremental minhash: batch-vs-corpus pairs == full-run pairs touching the batch") {
    val docs = Seq(
      0L -> "the quick brown fox jumps over the lazy dog again and again",
      1L -> "spark builds inverted index postings with delta encoded blocks",
      2L -> "bm25 scoring ranks documents by term frequency and length",
      100L -> "the quick brown fox jumps over the lazy dog again and again",
      101L -> "spark builds inverted index postings with gamma encoded blocks",
      102L -> "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"
    ).toDF("doc_id", "text")
    val full = Dedup.minhashNearDups(docs, minJaccard = 0.3)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val inc = Dedup.minhashNearDupsIncremental(
      docs.where($"doc_id" < 100), docs.where($"doc_id" >= 100), minJaccard = 0.3)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(full.nonEmpty)
    assert(inc === full.filter(p => p._1 >= 100 || p._2 >= 100))
  }

  test("span dup stats: copied windows counted against the earlier doc only") {
    val ten = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = Seq(
      1L -> s"$ten b1 b2 b3",        // owns every window it has
      2L -> s"c1 c2 $ten",           // its one exact 10-token copy window
      3L -> "d1 d2 d3 d4 d5"         // too short for any window
    ).toDF("doc_id", "text")
    val rows = Dedup.spanDupStats(docs, w = 10)
      .select($"doc_id", $"n_windows", $"n_dup").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 2 has 3 windows (positions 0,1,2); only position 2 equals doc
    // 1's position-0 window.
    assert(!rows.keySet.contains(1L), "first owner has no dup windows")
    assert(Dedup.spanDupStats(docs, w = 10).where($"doc_id" === 2L)
      .select($"n_windows", $"n_dup").as[(Long, Long)].head() === ((3L, 1L)))
  }

  test("contamination: eval members' shingles flag overlapping corpus docs") {
    val corpus = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",   // shares a 3-gram run with eval
      2L -> "one two three four five six seven"      // disjoint
    ).toDF("doc_id", "text")
    val eval = Seq(
      900L -> "alpha beta gamma delta nothing else here"
    ).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(corpus, eval, w = 3)
      .select($"doc_id", $"n_shingles", $"n_hit").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1 has 4 distinct 3-grams; "alpha beta gamma" and "beta gamma
    // delta" occur in the eval doc.
    assert(out(1L) === ((4L, 2L)))
    assert(!out.contains(2L))
  }

  test("mixture sample: rate 0 drops a domain, rate 1e6 keeps everything, stable") {
    val docs = (0L until 300L).map(i => (i, s"text $i",
      if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("doc_id", "text", "source")
    val kept = Packing.mixtureSample(docs, "source",
      Map("a" -> 0L, "b" -> 1000000L), defaultPpm = 500000L)
      .groupBy($"source").agg(count("*").as("n"))
      .as[(String, Long)].collect().toMap
    assert(!kept.contains("a"))
    assert(kept("b") === 100L)
    assert(kept.getOrElse("c", 0L) > 20L && kept("c") < 80L,
      s"~half of c expected, got ${kept.get("c")}")
    // determinism: the same call keeps the same rows
    val ids1 = Packing.mixtureSample(docs, "source", Map("a" -> 0L),
      defaultPpm = 500000L).select($"doc_id").as[Long].collect().toSet
    val ids2 = Packing.mixtureSample(docs.orderBy(rand(42)), "source",
      Map("a" -> 0L), defaultPpm = 500000L)
      .select($"doc_id").as[Long].collect().toSet
    assert(ids1 === ids2, "sampling must be content-stable, not order-dependent")
  }
}
