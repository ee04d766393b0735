package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchical (taxonomy) facets (reference:
  * Lucene.Net.Facet/Taxonomy/TaxonomyFacetCounts.cs + FacetLabel.cs —
  * re-thought relationally): the reference walks a taxonomy tree of
  * ordinals and accumulates counts per node; here every row's path
  * contributes one count at EVERY prefix depth via a generated prefix
  * array, and ONE map-side-combinable groupBy produces the whole rollup.
  * No tree, no ordinal dictionary — the prefix explosion is a codegen'd
  * projection and the aggregation partial-aggregates before the shuffle,
  * so the plan holds at any corpus size (cardinality of the shuffle is
  * the number of distinct taxonomy nodes, not rows). */
object Facets {

  /** Counts at every path depth: a row with path `a/b/c` counts toward
    * `a`, `a/b`, and `a/b/c`. */
  def taxonomyCounts(df: DataFrame, pathCol: String, sep: String = "/"): DataFrame =
    df.select(explode(prefixPaths(pathCol, sep)).as("path"))
      .groupBy(col("path")).agg(count("*").as("hits"))

  /** All prefix paths of `pathCol` as an array column. Pure Column API:
    * the separator is regex-QUOTED for the split (split() takes a regex —
    * a '.' separator would otherwise split on every character) and a
    * literal for the rejoin, and nothing is interpolated into SQL text
    * (a quote in the separator or column name can't break the plan). */
  private def prefixPaths(pathCol: String, sep: String): Column = {
    val parts = split(col(pathCol), java.util.regex.Pattern.quote(sep))
    transform(sequence(lit(1), size(parts)),
      i => array_join(slice(parts, lit(1), i), sep))
  }

  /** Drill-down: the immediate children of `parent` in a counts rollup
    * produced by [[taxonomyCounts]]. */
  def children(counts: DataFrame, parent: String, sep: String = "/"): DataFrame = {
    val childDepth = parent.split(java.util.regex.Pattern.quote(sep)).length + 1
    counts
      .where(col("path").startsWith(parent + sep) &&
        size(split(col("path"), java.util.regex.Pattern.quote(sep))) === childDepth)
  }

  /** Sampled facet counts with amortized correction (reference:
    * Lucene.Net.Facet/RandomSamplingFacetsCollector.cs): when the hit set
    * is larger than `sampleSize`, count facets over a ~sampleSize sample
    * and extrapolate, capping each label's estimate at its TRUE document
    * frequency (AmortizeFacetCounts caps at `reader.DocFreq(dim/label)`).
    *
    * Scale restatement: the reference walks the hit bitset picking one
    * doc per consecutive bin of `binSize = floor(totalHits/sampleSize)`
    * docs (XORShift-seeded position within the bin); a global walk order
    * is exactly what a distributed plan must avoid, so the sampler here
    * is the residue class `doc_id % binSize == 0` — map-only, shuffle-
    * free, the same expected rate (1/binSize), and deterministic so an
    * independent engine can reproduce it (swap in `xxhash64(doc_id)` for
    * adversarial id layouts at production). The correction multiplies by
    * the sampler's REALIZED inverse rate (binSize) in exact integer
    * arithmetic, where the reference divides by the ideal rate in
    * floating point — same intent, no float divergence.
    *
    * Cost shape at 100 TB: one metadata-count of the hits, one map-only
    * filter (keeps 1/binSize of the rows), one map-side-combinable
    * groupBy on the label, and a broadcast-able join against the label
    * dictionary (distinct labels, not rows) for the df cap.
    *
    * @param hits   matching docs, a `doc_id` column
    * @param labels (doc_id, label) — the facet field, one row per value
    * @return (label, hits_est) — exact when totalHits <= sampleSize
    */
  def sampledCounts(hits: DataFrame, labels: DataFrame, sampleSize: Int): DataFrame = {
    require(sampleSize > 0, "sampleSize must be positive")
    val totalHits = hits.count()
    val labeled = hits.join(labels, "doc_id")
    if (totalHits <= sampleSize) {
      labeled.groupBy(col("label")).agg(count("*").as("hits_est"))
    } else {
      val binSize = totalHits / sampleSize
      val globalDf = labels.groupBy(col("label")).agg(count("*").as("label_df"))
      labeled.where(pmod(col("doc_id"), lit(binSize)) === 0)
        .groupBy(col("label")).agg(count("*").as("sampled"))
        .join(globalDf, "label")
        .select(col("label"),
          least(col("sampled") * lit(binSize), col("label_df")).as("hits_est"))
    }
  }

  /** Association facet sums with taxonomy rollup (reference:
    * Lucene.Net.Facet/Taxonomy/TaxonomyFacetSumIntAssociations.cs /
    * TaxonomyFacetSumFloatAssociations.cs / TaxonomyFacetSumValueSource.cs):
    * instead of counting hits per category, SUM an association value —
    * a stored per-(doc, category) weight, or any computed expression (the
    * ValueSource case: pass a [[graft.expressions.Javascript]]-compiled
    * column). The reference decodes (ordinal, value) pairs from a binary
    * docvalue and accumulates into per-ordinal arrays; here the value
    * rides the same prefix-explode as [[taxonomyCounts]] and ONE
    * map-side-combinable groupBy sums the whole rollup. */
  def associationSums(df: DataFrame, pathCol: String, value: Column,
      sep: String = "/"): DataFrame =
    df.select(explode(prefixPaths(pathCol, sep)).as("path"), value.as("v"))
      .groupBy(col("path")).agg(sum(col("v")).as("sum_value"))

  /** One facet range, bounds normalized to inclusive exactly as the
    * reference constructor does (Facet/Range/LongRange.cs:71-93: an
    * exclusive min becomes min+1, an exclusive max becomes max-1 — and
    * an exclusive bound AT the type's extremum is rejected like the
    * reference's FailNoMatch, instead of silently WRAPPING into a
    * match-everything range). */
  final case class LongFacetRange(label: String, min: Long, minInclusive: Boolean,
      max: Long, maxInclusive: Boolean) {
    require(minInclusive || min != Long.MaxValue,
      s"range $label: exclusive min at Long.MaxValue matches nothing")
    require(maxInclusive || max != Long.MinValue,
      s"range $label: exclusive max at Long.MinValue matches nothing")
    val minIncl: Long = if (minInclusive) min else min + 1
    val maxIncl: Long = if (maxInclusive) max else max - 1
    require(minIncl <= maxIncl, s"range $label is empty")
  }

  /** Range facet counts over POSSIBLY-OVERLAPPING ranges (reference:
    * Lucene.Net.Facet/Range/LongRangeFacetCounts.cs): each range is
    * counted independently, so a doc in two ranges counts toward both —
    * which is why this is NOT a groupBy on a bucket key (that would
    * force disjoint buckets). One pass, R conditional-count aggregates
    * (map-side combined, a single reduce row), then unpivoted to
    * (label, hits) rows in range-declaration order. R is the number of
    * UI ranges (tiny); the scan is one projection of the value column —
    * the plan at 100 TB is a column scan + a scalar aggregate. */
  def rangeCounts(df: DataFrame, value: Column, ranges: Seq[LongFacetRange]): DataFrame = {
    require(ranges.nonEmpty, "no ranges")
    val aggs = ranges.zipWithIndex.map { case (r, i) =>
      count(when(value >= r.minIncl && value <= r.maxIncl, 1)).as(s"__r$i")
    }
    unpivotRanges(df.agg(aggs.head, aggs.tail: _*), ranges.map(_.label))
  }

  /** (label, hits) rows in declaration order from the one-row aggregate —
    * labels ride as typed literals, never interpolated into SQL text (a
    * quote in a UI-supplied label must not break the plan). */
  private def unpivotRanges(one: DataFrame, labels: Seq[String]): DataFrame = {
    val rows = labels.zipWithIndex.map { case (l, i) =>
      struct(lit(l).as("label"), col(s"__r$i").as("hits"))
    }
    one.select(explode(array(rows: _*)).as("lr"))
      .select(col("lr.label").as("label"), col("lr.hits").as("hits"))
  }

  /** Double twin of [[LongFacetRange]] (Facet/Range/DoubleRange.cs:60-105):
    * exclusive bounds normalize to the adjacent representable double
    * (`Math.nextUp`/`nextAfter(-∞)` — the reference's NumericUtils step);
    * NaN bounds rejected. */
  final case class DoubleFacetRange(label: String, min: Double, minInclusive: Boolean,
      max: Double, maxInclusive: Boolean) {
    require(!min.isNaN && !max.isNaN, "range bound cannot be NaN")
    // nextUp(+Inf) == +Inf, so an exclusive bound at the infinity has no
    // adjacent representable — the reference FailNoMatch-es (DoubleRange.cs)
    require(minInclusive || min != Double.PositiveInfinity,
      s"range $label: exclusive min at +Infinity matches nothing")
    require(maxInclusive || max != Double.NegativeInfinity,
      s"range $label: exclusive max at -Infinity matches nothing")
    val minIncl: Double = if (minInclusive) min else Math.nextUp(min)
    val maxIncl: Double =
      if (maxInclusive) max else Math.nextAfter(max, Double.NegativeInfinity)
    require(minIncl <= maxIncl, s"range $label is empty")
  }

  /** DoubleRangeFacetCounts (Facet/Range/DoubleRangeFacetCounts.cs):
    * identical one-pass overlapping-range shape over a double value —
    * typically a computed ValueSource column. NaN values match no range
    * (`value >= lo` is false), the reference's missing-doc behavior. */
  def rangeCountsDouble(df: DataFrame, value: Column,
      ranges: Seq[DoubleFacetRange]): DataFrame = {
    require(ranges.nonEmpty, "no ranges")
    val aggs = ranges.zipWithIndex.map { case (r, i) =>
      count(when(value >= r.minIncl && value <= r.maxIncl, 1)).as(s"__r$i")
    }
    unpivotRanges(df.agg(aggs.head, aggs.tail: _*), ranges.map(_.label))
  }


  /** PrintTaxonomyStats analog (reference:
    * Lucene.Net.Facet/Taxonomy/PrintTaxonomyStats.cs:38-90): per
    * top-level DIMENSION, the ordinal count (distinct paths beneath it,
    * the dimension itself included) and the total label occurrences —
    * the summary the reference tool prints per top-level category. One
    * aggregation over [[taxonomyCounts]]' prefix-exploded frame. */
  def taxonomyStats(df: DataFrame, pathCol: String, sep: String = "/"): DataFrame = {
    val counts = taxonomyCounts(df, pathCol, sep)
    counts
      .withColumn("dimension",
        substring_index(col("path"), sep, 1))
      .groupBy(col("dimension"))
      .agg(count("*").as("ords"), sum(col("hits")).as("occurrences"))
  }
}
