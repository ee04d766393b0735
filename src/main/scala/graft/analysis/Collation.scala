package graft.analysis

import java.text.{CollationKey, Collator}
import java.util.Locale

/** Locale-aware collation keys for sorting and range queries (reference:
  * /root/reference/src/Lucene.Net.Analysis.ICU/Collation/
  * ICUCollationKeyAnalyzer.cs and ICUCollationKeyFilter.cs): a term is
  * replaced by an opaque, binary-comparable sort key so that plain
  * byte/string ordering — the only ordering a term dictionary, a parquet
  * min/max index, or a range partitioner understands — realizes the
  * LOCALE's ordering. That is what makes locale-correct TermRangeQuery
  * and index-order sorts work without a custom comparator anywhere in
  * the distributed path (the reference makes the same trade:
  * "index-time sort key generation" over per-comparison collation).
  *
  * Keys come from the JDK's RuleBasedCollator (same CLDR lineage the
  * reference's icu.net binding wraps) and are hex-encoded so they stay
  * printable dictionary terms; hex preserves unsigned byte order, so
  * `key(a) < key(b)  ⇔  collator.compare(a, b) < 0` (tertiary default).
  * A [[keyAnalyzer]] drops the encoding into the analyzer chain's
  * stemmer slot, exactly where ICUCollationKeyFilter sits. */
object Collation {

  def collator(locale: Locale, strength: Int = Collator.TERTIARY): Collator = {
    val c = Collator.getInstance(locale)
    c.setStrength(strength)
    c
  }

  private val Hex = "0123456789abcdef".toCharArray

  /** Hex-encoded CollationKey bytes — order-preserving and printable. */
  def keyFor(c: Collator, term: String): String = {
    val k: CollationKey = c.getCollationKey(term)
    val bytes = k.toByteArray
    val sb = new StringBuilder(bytes.length * 2)
    for (b <- bytes) { sb += Hex((b >> 4) & 0xf); sb += Hex(b & 0xf) }
    sb.toString
  }

  /** Analyzer whose terms are collation keys for `locale` — index and
    * query sides must use the same locale, like the reference warns.
    * The stemmer closure ships into the distributed indexing flatMap, so
    * it must serialize: `java.text.Collator` is NOT Serializable (and
    * `getCollationKey` is synchronized), so the closure carries only the
    * locale's language tag and rebuilds a per-THREAD collator on the
    * executor — serializable and lock-free. */
  def keyAnalyzer(locale: Locale): Analyzer = {
    val tag = locale.toLanguageTag
    val stem = new (String => String) with Serializable {
      @transient private lazy val tl = new ThreadLocal[Collator] {
        override def initialValue(): Collator =
          collator(Locale.forLanguageTag(tag))
      }
      def apply(t: String): String = keyFor(tl.get(), t)
    }
    new Analyzer(Set.empty, 255, UAX29Tokenizer.tokenize, Some(stem))
  }
}
