package graft.build

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Reversed-term dictionary sidecar — the leading-wildcard accelerator
  * (reference idea: Analysis/Reverse/ReverseStringFilter.cs, whose
  * documented use is indexing reversed tokens so `*suffix` queries
  * become prefix automata; Solr ships it as ReversedWildcardFilter).
  *
  * The reference pays for this with a second full postings field; here
  * the POSTINGS are shared — only the DICTIONARY is mirrored: a
  * (rterm, term, df) table sorted and range-partitioned by the reversed
  * term, so parquet min/max stats prune a `rterm` prefix range exactly
  * like the forward dictionary prunes a forward prefix. A leading
  * wildcard expands on this sidecar (term names come back forward) and
  * then reads the ordinary postings — dictionary-sized extra storage,
  * zero postings duplication.
  *
  * Build: ONE map-only projection of term_dict + a range shuffle by
  * rterm. At 10^9 terms this is the term_dict build's shape again. */
object ReversedDict {

  def build(spark: SparkSession, dir: String, numPartitions: Int = 8): Unit = {
    import spark.implicits._
    spark.read.parquet(IndexPaths.termDict(dir))
      .select($"term", $"df").as[(String, Long)]
      .map { case (t, df) => (graft.analysis.TokenFilters.reverse(t), t, df) }
      .toDF("rterm", "term", "df")
      .repartitionByRange(numPartitions, $"rterm")
      .sortWithinPartitions($"rterm")
      .write.mode(SaveMode.Overwrite).parquet(IndexPaths.termDictRev(dir))
  }
}
