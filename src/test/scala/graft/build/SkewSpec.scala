package graft.build

import graft.SparkTestSession
import graft.corpus.SourceFile
import graft.search.{IndexReader, Searcher, TermQ}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-term (Zipfian) skew: the north rule's salted-repartition concern.
  * The postings "merge" range-partitions on the COMPOSITE key
  * (term, firstDocId), so one term's blocks split at firstDocId
  * boundaries across many partitions — no reducer ever owns a whole hot
  * posting list. This spec builds a worst case (every doc contains the
  * same term) and asserts the hot list physically spreads, stays
  * correct, and stays queryable. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a term present in EVERY doc spreads across partitions and scores correctly") {
    import spark.implicits._
    val nDocs = 4000
    val corpus = spark.range(nDocs).map { i =>
      // Zipf extreme: the hot term IS the corpus (its posting list must
      // dominate the block-row distribution for the composite range key
      // to need splitting it); a few docs carry unique terms
      val text =
        if (i % 200 == 0) ("hot " * (1 + (i % 3).toInt)) + s"unique$i"
        else "hot " * (1 + (i % 3).toInt)
      SourceFile("r", f"f$i%06d", "0" * 40, "txt", text,
        graft.corpus.CorpusGen.sha256Hex(text))
    }
    val dir = SparkTestSession.tmpDir("graft-skew-")
    IndexBuilder.build(spark, corpus, dir, numPartitions = 4)

    // the hot list is split into self-contained 128-doc blocks...
    val hot = spark.read.parquet(IndexPaths.postings(dir)).where($"term" === "hot")
    val nBlocks = hot.count()
    assert(nBlocks >= nDocs / graft.postings.PostingsCodec.BlockSize,
      s"expected ~${nDocs / 128} blocks, got $nBlocks")
    // ...physically spread over >1 output partition (files), because the
    // range key is (term, firstDocId), not term alone
    val nFiles = hot.select(input_file_name()).distinct().count()
    assert(nFiles > 1, s"hot term's blocks all landed in one file/partition")

    // dictionary stats survive the split-merge
    val dict = spark.read.parquet(IndexPaths.termDict(dir))
      .where($"term" === "hot").as[TermDictRow].head()
    assert(dict.df === nDocs)

    // and the query path handles the full-corpus posting list
    val searcher = new Searcher(new IndexReader(spark, dir))
    val hits = searcher.search(TermQ("hot"), 10)
    assert(hits.length === 10)
    // tf=3 docs (i%3==2) outrank tf=1 docs despite equal doc lengths varying
    val report = CheckIndex.check(spark, dir)
    assert(report.ok, report.problems.mkString("; "))
  }

  test("n-gram dedup: hot-shingle df cap bounds the candidate join") {
    import spark.implicits._
    import graft.pipeline.Dedup
    // every doc shares one boilerplate line (a stop-shingle with df = n);
    // two docs are genuine near-dups via rare shingles
    val boiler = "this file is part of the build"
    val n = 60
    val docs = (0 until n).map { i =>
      val body =
        if (i == 1) "alpha beta gamma delta epsilon zeta"
        else if (i == 2) "alpha beta gamma delta epsilon eta"
        else s"unique$i phrase number $i only here"
      (i.toLong, s"$boiler $body")
    }.toDF("doc_id", "text")
    // cap below the boilerplate df: the stop-shingles are excluded from
    // candidate generation, so candidates stay O(near-dup clusters), not
    // O(n^2) over the boilerplate
    val ds = Dedup.docShingles(docs)
    val eligible = ds.groupBy($"s").agg(count("*").as("df")).where($"df" <= 10)
    val capped = ds.join(eligible.select("s"), Seq("s"), "left_semi")
    val cands = capped.select($"doc_id".as("a"), $"s")
      .join(capped.select($"doc_id".as("b"), $"s"), "s")
      .where($"a" < $"b").select("a", "b").distinct()
    assert(cands.count() < n.toLong * (n - 1) / 4,
      "candidate pairs must not explode quadratically on the stop-shingle")
    // the real near-dup pair survives the cap
    val pairs = Dedup.ngramJaccardPairs(docs, w = 3, minJaccard = 0.3,
      maxShingleDf = 10).select("a", "b").as[(Long, Long)].collect()
    assert(pairs.contains((1L, 2L)))
    // and with the default (high) cap results are unchanged vs uncapped
    val withDefault = Dedup.ngramJaccardPairs(docs, w = 3, minJaccard = 0.3)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val uncapped = Dedup.ngramJaccardPairs(docs, w = 3, minJaccard = 0.3,
      maxShingleDf = Long.MaxValue).select("a", "b").as[(Long, Long)].collect().toSet
    assert(withDefault === uncapped)
  }
}
