package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouping collectors beyond top-k-per-group (reference:
  * Lucene.Net.Grouping — TermAllGroupsCollector.cs,
  * AllGroupsCollector.cs, AbstractGroupFacetCollector.cs /
  * TermGroupFacetCollector.cs). The reference accumulates these in
  * per-segment hash collectors; on Spark each is a native aggregation
  * over the (hit ⋈ group-value) frame — map-side combinable, no custom
  * state. Top-k-per-group itself lives in VerifyQueries.qGroupTop2 (a
  * partitioned window). */
object Grouping {

  /** The distinct group values among the hits (AllGroupsCollector's
    * group set). `hits` must carry `groupCol`. */
  def allGroups(hits: DataFrame, groupCol: String): DataFrame =
    hits.select(col(groupCol)).distinct()

  /** |allGroups| as a 1-row frame (AllGroupsCollector.GroupCount —
    * the usual companion number to a grouped result page). */
  def allGroupsCount(hits: DataFrame, groupCol: String): DataFrame =
    hits.agg(countDistinct(col(groupCol)).as("groups"))

  /** Facet counts WITHIN each group (GroupFacetCollector): for every
    * (group, facet) pair among the hits, the hit count. One shuffle,
    * map-side combined. */
  def groupFacets(hits: DataFrame, groupCol: String, facetCol: String): DataFrame =
    hits.groupBy(col(groupCol), col(facetCol)).agg(count("*").as("hits"))
}
