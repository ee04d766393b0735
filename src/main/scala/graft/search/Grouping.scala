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

  /** AllGroupHeadsCollector (AbstractAllGroupHeadsCollector.cs /
    * Term/TermAllGroupHeadsCollector.cs): for every group among the
    * hits, the single doc that wins the within-group sort — the "group
    * head". The reference keeps one mutable GroupHead per group and
    * challenges it doc-by-doc, ties keeping the earlier (lower) docId;
    * here the same contract is ONE combinable aggregation:
    * `min(struct(sortKeys…, doc_id))` — struct comparison is
    * lexicographic, so the minimum IS the head under (sortKeys asc,
    * docId asc). Descending keys are passed negated (score desc →
    * `-score`), exactly how the reference flips comparator sign via
    * m_reversed. No window, no per-group state: map-side partial heads
    * combine associatively, so the op is one shuffle of |groups| rows
    * at any corpus size. Result: (group, doc_id) — the RetrieveGroupHeads
    * set, keyed by group. */
  def allGroupHeads(hits: DataFrame, groupCol: String,
                    sortKeys: Seq[org.apache.spark.sql.Column]): DataFrame =
    hits.groupBy(col(groupCol))
      .agg(min(struct((sortKeys :+ col("doc_id")): _*)).as("head"))
      .select(col(groupCol), col("head.doc_id").as("doc_id"))

  // --- Function* collectors (ValueSource-keyed grouping) ---------------

  /** The Function*Collector family (reference:
    * Lucene.Net.Grouping/Function/{FunctionAllGroupsCollector,
    * FunctionAllGroupHeadsCollector,FunctionDistinctValuesCollector,
    * FunctionFirstPassGroupingCollector}.cs): identical collectors keyed
    * by a COMPUTED ValueSource instead of a field. On Spark a ValueSource
    * is just a Column expression, so each is the same aggregation over
    * `expr` — `groupBy(expr)` is as combinable as `groupBy(col)`. */
  def allGroupsBy(hits: DataFrame, groupExpr: org.apache.spark.sql.Column): DataFrame =
    hits.select(groupExpr.as("group")).distinct()

  def allGroupHeadsBy(hits: DataFrame, groupExpr: org.apache.spark.sql.Column,
                      sortKeys: Seq[org.apache.spark.sql.Column]): DataFrame =
    hits.groupBy(groupExpr.as("group"))
      .agg(min(struct((sortKeys :+ col("doc_id")): _*)).as("head"))
      .select(col("group"), col("head.doc_id").as("doc_id"))

  /** DistinctValuesCollector (Term/TermDistinctValuesCollector.cs,
    * Function/FunctionDistinctValuesCollector.cs): for each group among
    * the hits, the set of distinct values of a second field/expression —
    * `collect_set` is the reference's per-group HashSet, map-side
    * combined; the sorted array makes the result deterministic. */
  def distinctValues(hits: DataFrame, groupExpr: org.apache.spark.sql.Column,
                     valueExpr: org.apache.spark.sql.Column): DataFrame =
    hits.groupBy(groupExpr.as("group"))
      .agg(array_sort(collect_set(valueExpr)).as("values"),
           countDistinct(valueExpr).as("distinct_count"))
}
