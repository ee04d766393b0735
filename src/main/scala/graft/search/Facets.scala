package graft.search

import org.apache.spark.sql.DataFrame
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
  def taxonomyCounts(df: DataFrame, pathCol: String, sep: String = "/"): DataFrame = {
    val parts = s"split($pathCol, '$sep')"
    df.select(explode(expr(
      s"transform(sequence(1, size($parts)), i -> array_join(slice($parts, 1, i), '$sep'))"
    )).as("path"))
      .groupBy(col("path")).agg(count("*").as("hits"))
  }

  /** Drill-down: the immediate children of `parent` in a counts rollup
    * produced by [[taxonomyCounts]]. */
  def children(counts: DataFrame, parent: String, sep: String = "/"): DataFrame = {
    val childDepth = parent.split(java.util.regex.Pattern.quote(sep)).length + 1
    counts
      .where(col("path").startsWith(parent + sep) &&
        size(split(col("path"), java.util.regex.Pattern.quote(sep))) === childDepth)
  }
}
