package graft.postings

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/** One encoded posting block: up to 128 (docId, tf, normByte) triples,
  * self-contained (decodes independently of sibling blocks — unlike the
  * reference's file-sequential format, so Spark partitions/tasks can decode
  * any block without its neighbors). The per-block metadata doubles as
  * block-max WAND data (maxTf + maxNorm bound the block's best BM25
  * contribution) and as a skip structure (firstDocId/lastDocId prune blocks
  * in doc-range intersections) — replacing the reference's multi-level skip
  * lists (reference: /root/reference/src/Lucene.Net/Codecs/Lucene41/
  * Lucene41SkipWriter.cs:25-42).
  *
  * The norm byte is denormalized into each posting (the reference reads it
  * from a per-doc sidecar at score time — NormsConsumerPerField.cs); paying
  * ~1 packed byte per posting at build removes the docId join against the
  * doc-stats table from the query path entirely, which at 10^12 docs is the
  * difference between a map-only scoring scan and a giant shuffle.
  */
final case class EncodedBlock(
    blockId: Int,
    numDocs: Int,
    firstDocId: Long,
    lastDocId: Long,
    maxTf: Int,
    maxNorm: Int, // unsigned byte value 0..255 with the highest NORM_TABLE rank
    bytes: Array[Byte])

/** Posting-list block codec following the reference's Lucene41 scheme
  * (reference: /root/reference/src/Lucene.Net/Codecs/Lucene41/
  * Lucene41PostingsWriter.cs:293-345,438-540 and ForUtil.cs):
  *
  *  - full blocks of 128 postings: doc-gap deltas FOR-bit-packed (bit width
  *    = width of the block max; all-equal block → width marker + one VLong,
  *    the ForUtil all-same special case at ForUtil.cs:35), then tfs, then
  *    norm bytes packed the same way;
  *  - tail (<128 postings): VLong-encoded with freq folding —
  *    `(delta<<1)|1` when tf==1 else `delta<<1` followed by VInt(tf)
  *    (Lucene41PostingsWriter.cs:474-483) — then one raw norm byte each.
  *
  * DocIds are Long (the reference is int32-bound per segment; at 10^12 docs
  * a 64-bit doc space is required).
  */
object PostingsCodec {
  val BlockSize = 128

  private final val KindFor: Byte = 0
  private final val KindVInt: Byte = 1
  private final val AllEqualWidth: Int = 0xFF

  // ---- varint helpers ----
  private def writeVLong(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private final class Reader(val bytes: Array[Byte]) {
    var pos = 0
    def readByte(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def readVLong(): Long = {
      var shift = 0; var result = 0L; var b = 0
      do {
        b = readByte()
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }
  }

  // ---- FOR bit packing ----
  private def bitsRequired(maxValue: Long): Int =
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(maxValue))

  private def packFor(out: ByteArrayOutputStream, values: Array[Long]): Unit = {
    val max = values.max
    val allEqual = values.forall(_ == values(0))
    if (allEqual) {
      out.write(AllEqualWidth)
      writeVLong(out, values(0))
      return
    }
    val width = bitsRequired(max)
    out.write(width)
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < values.length) {
      var v = values(i)
      var rem = width
      while (rem > 0) {
        val take = math.min(rem, 64 - accBits)
        val chunk = if (take == 64) v else v & ((1L << take) - 1)
        acc |= chunk << accBits
        accBits += take
        v = if (take == 64) 0L else v >>> take
        rem -= take
        while (accBits >= 8) {
          out.write((acc & 0xff).toInt)
          acc >>>= 8
          accBits -= 8
        }
      }
      i += 1
    }
    if (accBits > 0) out.write((acc & 0xff).toInt)
  }

  private def unpackFor(r: Reader, count: Int): Array[Long] = {
    val width = r.readByte()
    val out = new Array[Long](count)
    if (width == AllEqualWidth) {
      val v = r.readVLong()
      java.util.Arrays.fill(out, v)
      return out
    }
    var acc = 0L // holds < 8 unconsumed bits at all times
    var accBits = 0
    var i = 0
    while (i < count) {
      var got = 0
      var value = 0L
      while (got < width) {
        if (accBits == 0) { acc = r.readByte().toLong; accBits = 8 }
        val take = math.min(width - got, accBits)
        value |= (acc & ((1L << take) - 1)) << got
        acc >>>= take
        accBits -= take
        got += take
      }
      out(i) = value
      i += 1
    }
    out
  }

  /** Encode one term's postings (docIds strictly ascending, tfs >= 1,
    * norms unsigned byte values 0..255) into independent blocks. */
  def encodeBlocks(docIds: Array[Long], tfs: Array[Int], norms: Array[Int]): Seq[EncodedBlock] = {
    require(docIds.length == tfs.length && docIds.length == norms.length,
      "docIds/tfs/norms length mismatch")
    val blocks = new ArrayBuffer[EncodedBlock]()
    var start = 0
    var blockId = 0
    while (start < docIds.length) {
      val len = math.min(BlockSize, docIds.length - start)
      val first = docIds(start)
      val last = docIds(start + len - 1)
      var maxTf = 0
      var maxNorm = 0
      val gaps = new Array[Long](len)
      var prev = first
      var i = 0
      while (i < len) {
        val d = docIds(start + i)
        require(if (i == 0) d == prev else d > prev,
          s"docIds must be strictly ascending (got $d after $prev)")
        gaps(i) = d - prev
        prev = d
        if (tfs(start + i) > maxTf) maxTf = tfs(start + i)
        if (norms(start + i) > maxNorm) maxNorm = norms(start + i)
        i += 1
      }
      val out = new ByteArrayOutputStream(len * 2)
      if (len == BlockSize) {
        out.write(KindFor.toInt)
        // gaps(0) is always 0 (firstDocId lives in block metadata) — pack
        // only the informative 127 gaps so constant-stride blocks hit the
        // all-equal 0-bit case.
        packFor(out, gaps.drop(1))
        packFor(out, Array.tabulate(len)(j => tfs(start + j).toLong))
        packFor(out, Array.tabulate(len)(j => norms(start + j).toLong))
      } else {
        out.write(KindVInt.toInt)
        var j = 0
        while (j < len) {
          val tf = tfs(start + j)
          if (tf == 1) writeVLong(out, (gaps(j) << 1) | 1)
          else { writeVLong(out, gaps(j) << 1); writeVLong(out, tf.toLong) }
          out.write(norms(start + j))
          j += 1
        }
      }
      blocks += EncodedBlock(blockId, len, first, last, maxTf, maxNorm, out.toByteArray)
      start += len
      blockId += 1
    }
    blocks.toSeq
  }

  /** Encode the per-posting position lists of one block (the
    * DOCS_AND_FREQS_AND_POSITIONS payload — reference:
    * Lucene41PostingsWriter's .pos stream, restated as a per-block
    * self-contained blob): per posting, VInt(count) then delta-coded
    * positions. `posLists.length` must equal the block's numDocs. */
  def encodePositionsBlock(posLists: Array[Array[Int]]): Array[Byte] = {
    val out = new ByteArrayOutputStream(posLists.length * 4)
    var i = 0
    while (i < posLists.length) {
      val ps = posLists(i)
      writeVLong(out, ps.length.toLong)
      var prev = 0
      var j = 0
      while (j < ps.length) {
        writeVLong(out, (ps(j) - prev).toLong)
        prev = ps(j)
        j += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Decode a positions blob back to per-posting position arrays. */
  def decodePositionsBlock(numDocs: Int, bytes: Array[Byte]): Array[Array[Int]] = {
    val r = new Reader(bytes)
    val out = new Array[Array[Int]](numDocs)
    var i = 0
    while (i < numDocs) {
      val n = r.readVLong().toInt
      val ps = new Array[Int](n)
      var prev = 0
      var j = 0
      while (j < n) {
        prev += r.readVLong().toInt
        ps(j) = prev
        j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Encode the per-posting character-offset pairs of one block (the
    * ..._AND_OFFSETS payload — reference: FieldInfo.IndexOptions
    * DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS, Index/FieldInfo.cs:373-397;
    * Lucene41PostingsWriter interleaves startOffset deltas + lengths in
    * the .pos stream): `offLists(i)` is the flattened
    * [s0, e0, s1, e1, …] for posting i; encoded as VInt(pairs), then per
    * pair VInt(start - prevStart) and VInt(end - start). */
  def encodeOffsetsBlock(offLists: Array[Array[Int]]): Array[Byte] = {
    val out = new ByteArrayOutputStream(offLists.length * 6)
    var i = 0
    while (i < offLists.length) {
      val os = offLists(i)
      require(os.length % 2 == 0, "offsets must be (start,end) pairs")
      writeVLong(out, (os.length / 2).toLong)
      var prevStart = 0
      var j = 0
      while (j < os.length) {
        writeVLong(out, (os(j) - prevStart).toLong)
        writeVLong(out, (os(j + 1) - os(j)).toLong)
        prevStart = os(j)
        j += 2
      }
      i += 1
    }
    out.toByteArray
  }

  /** Decode an offsets blob back to flattened per-posting pair arrays. */
  def decodeOffsetsBlock(numDocs: Int, bytes: Array[Byte]): Array[Array[Int]] = {
    val r = new Reader(bytes)
    val out = new Array[Array[Int]](numDocs)
    var i = 0
    while (i < numDocs) {
      val n = r.readVLong().toInt
      val os = new Array[Int](n * 2)
      var prevStart = 0
      var j = 0
      while (j < n) {
        prevStart += r.readVLong().toInt
        os(2 * j) = prevStart
        os(2 * j + 1) = prevStart + r.readVLong().toInt
        j += 1
      }
      out(i) = os
      i += 1
    }
    out
  }

  /** Encode the per-posting, per-position payload bytes of one block
    * (the reference's .pay stream idea — payloads are per-position opaque
    * byte arrays, Index/Payload semantics): per posting VInt(count), then
    * per position VInt(len) + raw bytes. `payLists(i)` holds posting i's
    * payloads aligned with its positions; a null entry inside a list
    * encodes as length 0. */
  def encodePayloadsBlock(payLists: Array[Array[Array[Byte]]]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payLists.length * 8)
    var i = 0
    while (i < payLists.length) {
      val ps = payLists(i)
      writeVLong(out, ps.length.toLong)
      var j = 0
      while (j < ps.length) {
        val b = if (ps(j) == null) Array.emptyByteArray else ps(j)
        writeVLong(out, b.length.toLong)
        out.write(b, 0, b.length)
        j += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Decode a payloads blob back to per-posting payload arrays. */
  def decodePayloadsBlock(numDocs: Int, bytes: Array[Byte]): Array[Array[Array[Byte]]] = {
    val r = new Reader(bytes)
    val out = new Array[Array[Array[Byte]]](numDocs)
    var i = 0
    while (i < numDocs) {
      val n = r.readVLong().toInt
      val ps = new Array[Array[Byte]](n)
      var j = 0
      while (j < n) {
        val len = r.readVLong().toInt
        val b = new Array[Byte](len)
        var k = 0
        while (k < len) { b(k) = r.readByte().toByte; k += 1 }
        ps(j) = b
        j += 1
      }
      out(i) = ps
      i += 1
    }
    out
  }

  /** Decode a block back to (docIds, tfs, norms). */
  def decodeBlock(firstDocId: Long, numDocs: Int, bytes: Array[Byte])
      : (Array[Long], Array[Int], Array[Int]) = {
    val r = new Reader(bytes)
    val kind = r.readByte()
    val docIds = new Array[Long](numDocs)
    val tfs = new Array[Int](numDocs)
    val norms = new Array[Int](numDocs)
    if (kind == KindFor) {
      val gaps = unpackFor(r, numDocs - 1)
      val tfl = unpackFor(r, numDocs)
      val nrm = unpackFor(r, numDocs)
      var prev = firstDocId
      var i = 0
      while (i < numDocs) {
        if (i > 0) prev += gaps(i - 1)
        docIds(i) = prev
        tfs(i) = tfl(i).toInt
        norms(i) = nrm(i).toInt
        i += 1
      }
    } else {
      var prev = firstDocId
      var i = 0
      while (i < numDocs) {
        val code = r.readVLong()
        prev += code >>> 1
        docIds(i) = prev
        tfs(i) = if ((code & 1) == 1) 1 else r.readVLong().toInt
        norms(i) = r.readByte()
        i += 1
      }
    }
    (docIds, tfs, norms)
  }
}
