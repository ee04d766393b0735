package graft.search

import graft.analysis.Analyzer

/** FuzzyLikeThisQuery (reference: /root/reference/src/Lucene.Net.Sandbox/
  * Queries/FuzzyLikeThisQuery.cs): "fuzzy MoreLikeThis" — analyze free
  * text, fuzzy-expand EACH resulting term against the dictionary, score
  * the variant union. The reference's per-variant ranking (idf-weighted
  * top variants, clamped so no single source term dominates) is exactly
  * what this engine's FuzzyQ rewrite already does — TOP_TERMS(50) ranked
  * in-job by (edit distance, df), banded dictionary SEEK instead of a
  * scan — so the sandbox class reduces to a composition over the ADT. */
object FuzzyLikeThis {

  /** Build the query: one fuzzy clause per distinct analyzed term. */
  def query(text: String, analyzer: Analyzer, maxEdits: Int = 1): Query =
    BoolQ(should =
      analyzer.analyzeTerms(text).distinct.toSeq.map(t => FuzzyQ(t, maxEdits)))
}
