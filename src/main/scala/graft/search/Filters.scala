package graft.search

import org.apache.spark.sql.DataFrame

/** Filter set algebra (reference: /root/reference/src/Lucene.Net.Queries/
  * ChainedFilter.cs, BooleanFilter.cs, TermsFilter.cs): filters in the
  * reference produce per-segment doc bitsets combined bit-wise; here a
  * filter result is simply a DataFrame with a `doc_id` column and the
  * chain folds with relational set operations. AND/OR/ANDNOT map to the
  * joins the engine already uses everywhere (`q_bool_*`, `q_join_*`);
  * XOR is the one genuinely new combinator (ChainedFilter.cs:45,221,252 —
  * `result.Xor(dis)`), the symmetric difference.
  *
  * Scale: each fold step is an equi-join or union-distinct on doc_id —
  * the same shuffle shape as the boolean planner; nothing materializes a
  * bitset of corpus size on the driver. BooleanFilter is the same algebra
  * with MUST=AND, SHOULD=OR, MUST_NOT=ANDNOT grouped first; TermsFilter
  * is the OR of per-term postings reads (Searcher `hits`).
  */
object Filters {

  /** Chain logic ops (ChainedFilter.cs:42-45; DEFAULT = OR). */
  sealed trait ChainOp
  case object And extends ChainOp
  case object Or extends ChainOp
  case object AndNot extends ChainOp
  case object Xor extends ChainOp

  /** Distinct symmetric difference of two doc_id sets. */
  private def xor(a: DataFrame, b: DataFrame): DataFrame =
    a.except(b).union(b.except(a))

  /** Fold the chain left-to-right: the running result starts as the
    * first filter's doc set (InitialResult, ChainedFilter.cs:128-152),
    * then each (op, filter) step combines bit-wise — here set-wise over
    * deduplicated doc_id frames. */
  def chained(first: DataFrame, rest: Seq[(ChainOp, DataFrame)]): DataFrame =
    rest.foldLeft(first.select("doc_id").distinct()) { case (acc, (op, f)) =>
      val s = f.select("doc_id").distinct()
      op match {
        case And => acc.intersect(s)
        case Or => acc.union(s).distinct()
        case AndNot => acc.except(s)
        case Xor => xor(acc, s)
      }
    }


  /** TermsFilter (reference: Lucene.Net.Queries/TermsFilter.cs:38-60):
    * docs containing ANY of a term set, constant-score — as a Query node
    * it is the SHOULD union wrapped constant-score (the reference's
    * bitset OR); keyword-field terms pass as `field:value` strings like
    * everywhere else. */
  def termsFilter(terms: Seq[String]): Query = {
    require(terms.nonEmpty, "TermsFilter needs at least one term")
    ConstantScoreQ(BoolQ(Nil, terms.distinct.map(TermQ(_)), Nil))
  }
}
