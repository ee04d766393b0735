package graft.util

/** Lossy float↔byte encoding with 3 mantissa bits / zero-exponent 15 — the
  * "byte315" scheme Lucene uses for length norms (reference:
  * /root/reference/src/Lucene.Net/Util/SmallFloat.cs:148-191). Reimplemented
  * from the published bit layout: truncate the IEEE-754 binary32 mantissa to
  * 3 bits and rebias the exponent so that the byte spans
  * [5.82e-10, 7.52e9], epsilon 0.125.
  */
object SmallFloat {
  private final val Fzero = (63 - 15) << 3

  /** floatToByte315: encode; <=0 → 0, subnormal → 1, overflow → 0xFF. */
  def floatToByte315(f: Float): Byte = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val smallfloat = bits >> (24 - 3)
    if (smallfloat <= Fzero) { if (bits <= 0) 0 else 1 }
    else if (smallfloat >= Fzero + 0x100) -1
    else (smallfloat - Fzero).toByte
  }

  /** byte315ToFloat: decode (0 → 0f). */
  def byte315ToFloat(b: Byte): Float = {
    if (b == 0) return 0.0f
    var bits = (b & 0xff) << (24 - 3)
    bits += (63 - 15) << 24
    java.lang.Float.intBitsToFloat(bits)
  }
}
