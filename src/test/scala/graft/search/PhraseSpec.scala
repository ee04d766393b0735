package graft.search

import graft.SparkTestSession
import graft.bm25.BM25
import graft.build.IndexBuilder
import graft.corpus.{CorpusGen, SourceFile}
import org.scalatest.funsuite.AnyFunSuite

/** PhraseQuery semantics (ExactPhraseScorer analog, reference:
  * /root/reference/src/Lucene.Net/Search/ExactPhraseScorer.cs): the
  * QUERY_FIRST strategy — index-pruned candidate conjunction +
  * re-analysis position verification. Stopword position gaps must break
  * exact phrases (the reference's FilteringTokenFilter position-increment
  * contract). */
class PhraseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk(i: Int, text: String) =
    SourceFile("r", f"f$i%02d", "0" * 40, "txt", text, CorpusGen.sha256Hex(text))

  // docIds = index order (paths sort f00..f05)
  private val fixture = Seq(
    mk(0, "state machine runs"),          // exact "state machine"
    mk(1, "machine state runs"),          // reversed — no exact match
    mk(2, "state of machine"),            // "of" is a stopword: positions 0,_,2 → gap
    mk(3, "state machine state machine"), // phrase tf = 2
    mk(4, "state alpha machine"),         // 1 token between → slop 1
    mk(5, "nothing here"))

  private lazy val (searcher, dir) = {
    import spark.implicits._
    val d = SparkTestSession.tmpDir("graft-phrase-")
    IndexBuilder.build(spark, spark.createDataset(fixture), d, numPartitions = 2)
    (new Searcher(new IndexReader(spark, d)), d)
  }

  test("exact phrase: adjacency required, order required, stop gap breaks it") {
    val freqs = searcher.phraseFreqs(Seq("state", "machine"))
      .collect().map(t => t._1 -> t._2).toMap
    assert(freqs === Map(0L -> 1, 3L -> 2))
  }

  test("sloppy phrase: slop 1 admits one interposed token; slop 2 admits the stop gap") {
    val s1 = searcher.phraseFreqs(Seq("state", "machine"), slop = 1)
      .collect().map(t => t._1 -> t._2).toMap
    assert(s1.keySet === Set(0L, 2L, 3L, 4L)) // doc2: "of" dropped but position advances
    val s0 = searcher.phraseFreqs(Seq("state", "machine"), slop = 0)
      .collect().map(t => t._1 -> t._2).toMap
    assert(!s0.contains(2L) && !s0.contains(4L))
  }

  test("phrase scoring: BM25 with phraseFreq as tf, weight = sum of term idfs") {
    val hits = searcher.search(PhraseQ(Seq("state", "machine")), 10)
    assert(hits.map(_.docId).toSeq === Seq(3L, 0L)) // tf=2 beats tf=1
    val maxDoc = 6L
    val sumTtf = fixture.map(f =>
      graft.analysis.Analyzer.standard.analyze(f.content).bm25DocLen).sum.toLong
    val w = BM25.weightValue(
      BM25.idf(5, maxDoc) + BM25.idf(5, maxDoc), 1f) // df(state)=df(machine)=5 (docs 0-4)
    val cache = BM25.normCache(BM25.avgFieldLength(sumTtf, maxDoc))
    assert(hits(0).score === BM25.score(2f, BM25.encodeNorm(4), w, cache))
    assert(hits(1).score === BM25.score(1f, BM25.encodeNorm(3), w, cache))
  }

  test("spanNear: ordered vs unordered proximity pairs") {
    // doc0 "state machine runs": state@0, machine@1; doc1 "machine state
    // runs": machine@0, state@1; doc4 "state alpha machine": gap 2
    val un = searcher.spanNearFreqs("state", "machine", maxGap = 2, ordered = false)
      .collect().map(t => t._1 -> t._2).toMap
    assert(un.contains(0L) && un.contains(1L) && un.contains(4L))
    val ord = searcher.spanNearFreqs("state", "machine", maxGap = 2, ordered = true)
      .collect().map(t => t._1 -> t._2).toMap
    assert(ord.contains(0L) && ord.contains(4L) && !ord.contains(1L),
      s"ordered must reject reversed doc1: $ord")
    // doc3 "state machine state machine": pairs within gap 2 (unordered):
    // (s0,m1),(s2,m1),(s2,m3) = 3; ordered: (s0,m1),(s2,m3) = 2... plus (s0? m3 d=3 no)
    assert(un(3L) === 3 && ord(3L) === 2)
  }

  test("multiPhrase: per-slot alternatives") {
    // slot1 = state|machine, slot2 = machine|runs:
    // doc0 "state machine runs": state+machine@0-1, machine+runs@1-2 -> 2
    // doc1 "machine state runs": state+runs@1-2 -> 1 (machine+state not in slots)
    val f = searcher.multiPhraseFreqs(Seq(Seq("state", "machine"), Seq("machine", "runs")))
      .collect().map(t => t._1 -> t._2).toMap
    assert(f(0L) === 2)
    assert(f(1L) === 1)
    assert(f(3L) === 2) // s m s m: sm@0, sm@2 (m@1 followed by s -> not in slot2)
    // slot with only unknown terms matches nothing
    assert(searcher.multiPhraseFreqs(Seq(Seq("state"), Seq("zzzz"))).isEmpty)
  }

  test("single-term phrase rewrites to TermQuery; absent term matches nothing") {
    val p1 = searcher.search(PhraseQ(Seq("state")), 10)
    val t1 = searcher.search(TermQ("state"), 10)
    assert(p1.toSeq === t1.toSeq)
    assert(searcher.search(PhraseQ(Seq("state", "zzzz")), 10).isEmpty)
  }
}
