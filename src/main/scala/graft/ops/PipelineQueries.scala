package graft.ops

import graft.pipeline.{Bpe, Classify, Dedup, Dsir, Multimodal, Packing, Similarity, TextAnalysis, Unigram}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing verification queries for the training-data pipeline ops
  * (dedup / similarity / text analysis / multimodal), each with a DuckDB
  * oracle that recomputes the same answer from the raw `documents` /
  * `embeddings` parquet. Hashing in the oracled paths is dictionary-based
  * (see Dedup parity note) so both engines agree bit-for-bit; the
  * xxhash64 production variants are exercised by ScalaTest instead. */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  private def docs(spark: SparkSession, sf: String): DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")
  private def vecs(spark: SparkSession, sf: String): DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")

  /** Shared tokenization CTE (same regex as the Spark side). */
  private val TokCte =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
      |  FROM documents
      |)""".stripMargin

  // ----------------------------------------------------------- dedup

  def qDedupExact(spark: SparkSession, sf: String): DataFrame =
    Dedup.exactGroups(docs(spark, sf)).orderBy(col("h"))
  val oDedupExact: String =
    """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin

  def qDedupMinhash(spark: SparkSession, sf: String): DataFrame =
    Dedup.minhashNearDups(docs(spark, sf), minJaccard = 0.35)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jac"))
      .orderBy(col("a"), col("b"))

  /** Shared CTE chain ending in `pairs(a, b, jac)` — the MinHash-LSH
    * near-dup pairs at jac >= 0.35 (used by both the pair gate and the
    * cluster gate's recursive-CTE oracle). */
  private val MinhashPairsCtes: String = {
    val sigCols = (0 until 16).map { k =>
      s"min((sid*${Dedup.MinHashA(k)}+${Dedup.MinHashB(k)})%${Dedup.MinHashP}) AS h$k"
    }.mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"h${b * 4 + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(',', $cols) AS key FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""$TokCte, sh AS (
       |  SELECT doc_id, CASE WHEN len(ts) >= 3 THEN
       |    list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] FOR i IN range(1, len(ts)-1)])
       |    ELSE [] END AS shingles FROM tok
       |), ds AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), dict AS (
       |  SELECT s, CAST(dense_rank() OVER (ORDER BY s) AS BIGINT) AS sid
       |  FROM (SELECT DISTINCT s FROM ds)
       |), dsi AS (
       |  SELECT doc_id, sid FROM ds JOIN dict USING (s)
       |), sig AS (
       |  SELECT doc_id, $sigCols FROM dsi GROUP BY doc_id
       |), buckets AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM buckets x
       |  JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
       |), sizes AS (
       |  SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id
       |), com AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common FROM ds x
       |  JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2
       |), pairs AS (
       |  SELECT c.a AS a, c.b AS b,
       |    com.common * 1.0e0 / (sa.sz + sb.sz - com.common) AS jac
       |  FROM cand c JOIN com ON com.a = c.a AND com.b = c.b
       |  JOIN sizes sa ON sa.doc_id = c.a JOIN sizes sb ON sb.doc_id = c.b
       |  WHERE com.common * 1.0e0 / (sa.sz + sb.sz - com.common) >= 0.35e0
       |)""".stripMargin
  }
  val oDedupMinhash: String =
    s"""$MinhashPairsCtes
       |SELECT a, b, round(jac, 6) AS jac FROM pairs ORDER BY 1, 2""".stripMargin

  /** Unigram-LM tokenizer seed census (Kudo 2018 / SentencePiece): the
    * frequency-weighted substring census over word types — the trainer's
    * one corpus-shaped stage and the only one an independent engine can
    * disagree on (EM lattice math + Viterbi tie-breaks are pinned by
    * hand-traced UnigramSpec fixtures — the q_bpe_pairs precedent).
    * Top-50 pieces by (count desc, piece asc). */
  def qUnigramSeed(spark: SparkSession, sf: String): DataFrame =
    Unigram.seedCensus(docs(spark, sf))
      .orderBy(col("n").desc, col("piece")).limit(50)
  val oUnigramSeed: String =
    s"""$TokCte, wt AS (
       |  SELECT u AS w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT unnest(ts) AS u FROM tok) GROUP BY u
       |)
       |SELECT piece, CAST(sum(n) AS BIGINT) AS n FROM (
       |  SELECT unnest(flatten([[substr(w, i, l)
       |    FOR l IN range(1, least(${Unigram.MaxPieceLen}, len(w) - i + 1) + 1)]
       |    FOR i IN range(1, len(w) + 1)])) AS piece, n
       |  FROM wt
       |)
       |GROUP BY piece ORDER BY n DESC, piece LIMIT 50""".stripMargin

  /** ExactSubstr span REMOVAL (Lee et al. 2021): per-doc token counts
    * after deleting every position covered by a 10-token window first
    * seen in an earlier doc — the dedup ACTION the q_span_dups measure
    * feeds. Integer counts only. */
  def qSpanRemoval(spark: SparkSession, sf: String): DataFrame =
    Dedup.spanRemovalStats(docs(spark, sf)).orderBy(col("doc_id"))
  val oSpanRemoval: String = {
    val terms = (0 until 10).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
    s"""$TokCte, win AS (
       |  SELECT doc_id, u.pos AS pos, u.s AS s FROM (
       |    SELECT doc_id, unnest([{'pos': i - 1, 's': $terms}
       |      FOR i IN range(1, len(ts) - 8)]) AS u
       |    FROM tok WHERE len(ts) >= 10)
       |), fo AS (
       |  SELECT s, min(doc_id) AS fd FROM win GROUP BY s
       |), cov AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed FROM (
       |    SELECT DISTINCT w.doc_id AS doc_id, p FROM win w
       |    JOIN fo USING (s), unnest(range(w.pos, w.pos + 10)) AS r(p)
       |    WHERE fo.fd < w.doc_id)
       |  GROUP BY doc_id
       |)
       |SELECT t.doc_id AS doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
       |  coalesce(c.n_removed, 0) AS n_removed,
       |  CAST(len(t.ts) AS BIGINT) - coalesce(c.n_removed, 0) AS n_kept
       |FROM tok t LEFT JOIN cov c ON c.doc_id = t.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared synthetic multi-line page for the named filter-pack gates:
    * sentences/bullets/lorem/curly/ellipsis vary by doc_id residues, a
    * real-text slice varies the word statistics. */
  private def synthPage(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val d = col("doc_id")
    concat(
      lit("The words be of and that have with more filler here. "),
      when(d % 2 === 0,
        lit("Second sentence grows! Third thing here? Fourth one lands. "))
        .otherwise(lit("")),
      lit("\n- bullet item line\n"),
      when(d % 4 === 0, lit("lorem ipsum dolor sit\n")).otherwise(lit("")),
      when(d % 5 === 0, lit("object { nested }\n")).otherwise(lit("")),
      when(d % 3 === 0, lit("this trails off and so on...\n")).otherwise(lit("")),
      substring(text, 1, 120), lit(" tail words end here.\n"),
      lit("no terminal punct line"))
  }
  // single line: it embeds inside stripMargin-processed oracle strings,
  // where a leading "||" would be eaten as a margin marker
  private val SynthPageSql: String =
    "'The words be of and that have with more filler here. '" +
      " || CASE WHEN doc_id % 2 = 0 THEN 'Second sentence grows! Third thing here? Fourth one lands. ' ELSE '' END" +
      " || chr(10) || '- bullet item line' || chr(10)" +
      " || CASE WHEN doc_id % 4 = 0 THEN 'lorem ipsum dolor sit' || chr(10) ELSE '' END" +
      " || CASE WHEN doc_id % 5 = 0 THEN 'object { nested }' || chr(10) ELSE '' END" +
      " || CASE WHEN doc_id % 3 = 0 THEN 'this trails off and so on...' || chr(10) ELSE '' END" +
      " || substr(text, 1, 120) || ' tail words end here.' || chr(10)" +
      " || 'no terminal punct line'"

  /** Gopher quality rules (Rae et al. 2021 A1.1, published thresholds,
    * all comparisons integer-exact). */
  def qGopherRules(spark: SparkSession, sf: String): DataFrame = {
    val d = docs(spark, sf)
    TextAnalysis.gopherRules(d, synthPage(col("text"))).orderBy(col("doc_id"))
  }
  /** Gopher rule CTE chain ending in `gm(doc_id, nw, tot_chars, symbols,
    * n_lines, bullets, ells, alphas, stophits)` — shared by the rule gate
    * and the curation funnel. */
  private val GopherCtes: String =
    s"""pg AS (
       |  SELECT doc_id, $SynthPageSql AS page FROM documents
       |), f AS (
       |  SELECT doc_id,
       |    list_filter(regexp_split_to_array(trim(page), '\\s+'), w -> len(w) > 0) AS words,
       |    list_filter(string_split(page, chr(10)), l -> len(trim(l)) > 0) AS lines,
       |    CAST(len(regexp_extract_all(page, '#')) AS BIGINT) AS hashes,
       |    CAST(len(regexp_extract_all(page, '\\.\\.\\.')) AS BIGINT) AS ellsym
       |  FROM pg
       |), gm AS (
       |  SELECT doc_id, hashes, ellsym,
       |    CAST(len(words) AS BIGINT) AS nw,
       |    CAST(coalesce(list_sum(list_transform(words, w -> len(w))), 0) AS BIGINT) AS tot_chars,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS BIGINT) AS bullets,
       |    CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$$'))) AS BIGINT) AS ells,
       |    CAST(len(list_filter(words, w -> regexp_matches(w, '[a-zA-Z]'))) AS BIGINT) AS alphas,
       |    CAST(len(list_filter(words, w -> list_contains(
       |      ['the','be','to','of','and','that','have','with'], lower(w)))) AS BIGINT) AS stophits
       |  FROM f
       |)""".stripMargin
  private val GopherKeepSql: String =
    """((nw >= 50 AND nw <= 100000) AND (tot_chars >= nw * 3 AND tot_chars <= nw * 10)
      | AND (hashes * 10 <= nw AND ellsym * 10 <= nw) AND (bullets * 10 <= n_lines * 9)
      | AND (ells * 10 <= n_lines * 3) AND (alphas * 10 >= nw * 8)
      | AND (stophits >= 2))""".stripMargin.replace("\n", " ")
  val oGopherRules: String =
    s"""WITH $GopherCtes
       |SELECT doc_id, nw AS n_words,
       |  (nw >= 50 AND nw <= 100000) AS r_word_count,
       |  (tot_chars >= nw * 3 AND tot_chars <= nw * 10) AS r_mean_len,
       |  (hashes * 10 <= nw AND ellsym * 10 <= nw) AS r_symbol,
       |  (bullets * 10 <= n_lines * 9) AS r_bullet,
       |  (ells * 10 <= n_lines * 3) AS r_ellipsis,
       |  (alphas * 10 >= nw * 8) AS r_alpha,
       |  (stophits >= 2) AS r_stops,
       |  $GopherKeepSql AS keep
       |FROM gm ORDER BY doc_id""".stripMargin

  /** C4 cleaning rules (Raffel et al. 2020 §2.2, minus the blocklist). */
  def qC4Rules(spark: SparkSession, sf: String): DataFrame = {
    val d = docs(spark, sf)
    TextAnalysis.c4Rules(d, synthPage(col("text"))).orderBy(col("doc_id"))
  }
  /** C4 rule CTE chain ending in `cm(doc_id, n_lines, n_kept_lines,
    * n_sentences, has_lorem, has_curly)` — shared with the funnel. */
  private val C4Ctes: String =
    s"""pg2 AS (
       |  SELECT doc_id, $SynthPageSql AS page FROM documents
       |), cm AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(page, chr(10)), l -> len(trim(l)) > 0)) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(string_split(page, chr(10)), l ->
       |      len(trim(l)) > 0
       |      AND regexp_matches(rtrim(l), '[.!?"]$$')
       |      AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'), w -> len(w) > 0)) >= 3
       |      AND NOT contains(lower(l), 'javascript'))) AS BIGINT) AS n_kept_lines,
       |    CAST(len(regexp_extract_all(page, '[.!?]')) AS BIGINT) AS n_sentences,
       |    contains(lower(page), 'lorem ipsum') AS has_lorem,
       |    contains(page, '{') AS has_curly
       |  FROM pg2
       |)""".stripMargin
  private val C4KeepSql: String =
    "(n_sentences >= 5 AND NOT has_lorem AND NOT has_curly AND n_kept_lines > 0)"
  val oC4Rules: String =
    s"""WITH $C4Ctes
       |SELECT doc_id, n_lines, n_kept_lines, n_sentences, has_lorem, has_curly,
       |  $C4KeepSql AS keep
       |FROM cm ORDER BY doc_id""".stripMargin

  /** Curation funnel: the gated stages COMPOSED into one survivorship
    * report — total docs → Gopher pass → C4 pass → both → both ∧
    * exact-dedup keeper. One row of integer counts; the evidence that
    * the rule packs and the dedup keeper compose into the one-pass
    * filter a production pipeline runs. */
  def qCurationFunnel(spark: SparkSession, sf: String): DataFrame = {
    val d = docs(spark, sf)
    val g = TextAnalysis.gopherRules(d, synthPage(col("text")))
      .select(col("doc_id"), col("keep").as("gk"))
    val c = TextAnalysis.c4Rules(d, synthPage(col("text")))
      .select(col("doc_id"), col("keep").as("ck"))
    val keeper = d.groupBy(md5(col("text")).as("h")).agg(min(col("doc_id")).as("kp"))
    val dk = d.select(col("doc_id"), md5(col("text")).as("h")).join(keeper, "h")
      .select(col("doc_id"), (col("doc_id") === col("kp")).as("dk"))
    g.join(c, "doc_id").join(dk, "doc_id")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("gk"), 1L).otherwise(0L)).as("n_gopher"),
        sum(when(col("ck"), 1L).otherwise(0L)).as("n_c4"),
        sum(when(col("gk") && col("ck"), 1L).otherwise(0L)).as("n_both"),
        sum(when(col("gk") && col("ck") && col("dk"), 1L).otherwise(0L)).as("n_final"))
  }
  val oCurationFunnel: String =
    s"""WITH $GopherCtes, $C4Ctes, ded AS (
       |  SELECT doc_id,
       |    (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS dk
       |  FROM documents
       |), flags AS (
       |  SELECT gg.doc_id, gg.gk, cc.ck, d.dk
       |  FROM (SELECT doc_id, $GopherKeepSql AS gk FROM gm) gg
       |  JOIN (SELECT doc_id, $C4KeepSql AS ck FROM cm) cc ON cc.doc_id = gg.doc_id
       |  JOIN ded d ON d.doc_id = gg.doc_id
       |)
       |SELECT CAST(count(*) AS BIGINT) AS n_total,
       |  CAST(sum(CASE WHEN gk THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher,
       |  CAST(sum(CASE WHEN ck THEN 1 ELSE 0 END) AS BIGINT) AS n_c4,
       |  CAST(sum(CASE WHEN gk AND ck THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
       |  CAST(sum(CASE WHEN gk AND ck AND dk THEN 1 ELSE 0 END) AS BIGINT) AS n_final
       |FROM flags""".stripMargin

  /** URL canonicalization + dedup: messy URL variants synthesized
    * deterministically from doc_id (mixed case, default ports, double
    * slashes, trailing slash, tracking params in scrambled order,
    * fragments) canonicalize to a shared key; the dup groups are the
    * gate — both engines must produce identical canonical strings AND
    * identical group membership. */
  def qUrlCanon(spark: SparkSession, sf: String): DataFrame = {
    val d = col("doc_id")
    val url = concat(
      lit("HTTP"), when(d % 2 === 0, lit("")).otherwise(lit("S")),
      lit("://WWW.Example"), (d % 7).cast("string"), lit(".COM"),
      when(d % 3 === 0,
        when(d % 2 === 0, lit(":80")).otherwise(lit(":443"))).otherwise(lit("")),
      lit("//Dir"), (d % 4).cast("string"), lit("/Page"), (d % 11).cast("string"),
      when(d % 5 === 0, lit("/")).otherwise(lit("")),
      when(d % 2 === 0, lit("?utm_source=x&b=2&a=1")).otherwise(lit("")),
      when(d % 6 === 0, lit("#frag")).otherwise(lit("")))
    docs(spark, sf)
      .select(TextAnalysis.canonicalUrl(url).as("canonical"), col("doc_id"))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
      .orderBy(col("canonical"))
  }
  val oUrlCanon: String =
    s"""WITH urls AS (
       |  SELECT doc_id,
       |    'HTTP' || CASE WHEN doc_id % 2 = 0 THEN '' ELSE 'S' END
       |    || '://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM'
       |    || CASE WHEN doc_id % 3 = 0 THEN
       |         CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END ELSE '' END
       |    || '//Dir' || CAST(doc_id % 4 AS VARCHAR)
       |    || '/Page' || CAST(doc_id % 11 AS VARCHAR)
       |    || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
       |    || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=x&b=2&a=1' ELSE '' END
       |    || CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END AS url
       |  FROM documents
       |), c1 AS (
       |  SELECT doc_id, regexp_replace(url, '#.*$$', '', 'g') AS nofrag FROM urls
       |), c2 AS (
       |  SELECT doc_id, nofrag,
       |    regexp_extract(nofrag, '^([^/?]*://[^/?#]*)', 1) AS preraw FROM c1
       |), c3 AS (
       |  SELECT doc_id, lower(preraw) AS pre,
       |    substr(nofrag, len(preraw) + 1) AS rest FROM c2
       |), c4 AS (
       |  SELECT doc_id,
       |    CASE WHEN pre LIKE 'http://%' AND pre LIKE '%:80'
       |           THEN substr(pre, 1, len(pre) - 3)
       |         WHEN pre LIKE 'https://%' AND pre LIKE '%:443'
       |           THEN substr(pre, 1, len(pre) - 4)
       |         ELSE pre END AS pre2, rest FROM c3
       |), c5 AS (
       |  SELECT doc_id, pre2, regexp_extract(rest, '^([^?]*)', 1) AS path0, rest FROM c4
       |), c6 AS (
       |  SELECT doc_id, pre2, path0,
       |    CASE WHEN len(rest) > len(path0) THEN substr(rest, len(path0) + 2)
       |         ELSE '' END AS query0 FROM c5
       |), c7 AS (
       |  SELECT doc_id, pre2,
       |    regexp_replace(path0, '/{2,}', '/', 'g') AS path1, query0 FROM c6
       |), c8 AS (
       |  SELECT doc_id, pre2,
       |    CASE WHEN len(path1) = 0 THEN '/'
       |         WHEN len(path1) > 1 AND path1 LIKE '%/'
       |           THEN substr(path1, 1, len(path1) - 1)
       |         ELSE path1 END AS path2,
       |    array_to_string(list_sort(list_filter(string_split(query0, '&'),
       |      x -> x <> '' AND NOT regexp_matches(x, '^(utm_|fbclid=|gclid=|ref=)'))),
       |      '&') AS qs
       |  FROM c7
       |), canon AS (
       |  SELECT doc_id, pre2 || path2 ||
       |    CASE WHEN len(qs) > 0 THEN '?' || qs ELSE '' END AS canonical
       |  FROM c8
       |)
       |SELECT canonical, count(*) AS n, min(doc_id) AS keeper
       |FROM canon GROUP BY canonical ORDER BY canonical""".stripMargin

  /** b-bit minwise (Li & König 2010, b=1): every LSH candidate pair
    * scored by the low-bit agreement fraction of its 16 minhash
    * components, Ĵ = 2A − 1 — integer agreement counts + one closed-form
    * double expression, bit-reproducible across engines. */
  def qDedupMinhashBbit(spark: SparkSession, sf: String): DataFrame =
    Dedup.minhashBbitPairs(docs(spark, sf)).orderBy(col("a"), col("b"))
  val oDedupMinhashBbit: String = {
    val parCols = (0 until 16).map(k => s"h$k % 2 AS p$k").mkString(", ")
    val agreeSum = (0 until 16)
      .map(k => s"CASE WHEN x.p$k = y.p$k THEN 1 ELSE 0 END").mkString(" + ")
    s"""$MinhashPairsCtes, par AS (
       |  SELECT doc_id, $parCols FROM sig
       |), agr AS (
       |  SELECT c.a AS a, c.b AS b, ($agreeSum) AS agree
       |  FROM cand c JOIN par x ON x.doc_id = c.a JOIN par y ON y.doc_id = c.b
       |)
       |SELECT a, b, CAST(agree AS INT) AS agree,
       |  round(agree * 2.0e0 / 16.0e0 - 1.0e0, 6) AS jhat
       |FROM agr ORDER BY a, b""".stripMargin
  }

  /** Incremental dedup: the batch doc_id % 5 == 0 arrives against the
    * existing corpus (the rest); only pairs touching the new batch are
    * produced, old×old is never re-paired. Oracle: the full pair set
    * filtered to new-batch endpoints (provably identical). */
  def qDedupIncremental(spark: SparkSession, sf: String): DataFrame = {
    val all = docs(spark, sf)
    Dedup.minhashNearDupsIncremental(
      all.where(col("doc_id") % 5 =!= 0), all.where(col("doc_id") % 5 === 0),
      minJaccard = 0.35)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jac"))
      .orderBy(col("a"), col("b"))
  }
  val oDedupIncremental: String =
    s"""$MinhashPairsCtes
       |SELECT a, b, round(jac, 6) AS jac FROM pairs
       |WHERE a % 5 = 0 OR b % 5 = 0 ORDER BY 1, 2""".stripMargin

  /** Duplicate clusters: connected components over the near-dup pairs
    * (iterative min-label propagation on the Spark side; the oracle walks
    * reachability with a recursive CTE — min reachable id ≡ component
    * min because the edge list is symmetric). */
  def qDedupClusters(spark: SparkSession, sf: String): DataFrame =
    Dedup.minhashClusters(docs(spark, sf), minJaccard = 0.35)
      .orderBy(col("doc_id"))
  val oDedupClusters: String =
    s"""${MinhashPairsCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")}, edges AS (
       |  SELECT a AS u, b AS v FROM pairs UNION SELECT b AS u, a AS v FROM pairs
       |), reach(u, lab) AS (
       |  SELECT u, u AS lab FROM edges
       |  UNION
       |  SELECT e.u, r.lab FROM edges e JOIN reach r ON r.u = e.v
       |)
       |SELECT u AS doc_id, min(lab) AS cluster, (u = min(lab)) AS is_keeper
       |FROM reach GROUP BY u ORDER BY doc_id""".stripMargin

  def qDedupSimhash(spark: SparkSession, sf: String): DataFrame =
    Dedup.simhash(docs(spark, sf)).orderBy(col("doc_id"))
  val oDedupSimhash: String =
    s"""$TokCte, t AS (
       |  SELECT doc_id, unnest(ts) AS t FROM tok
       |), tf AS (
       |  SELECT doc_id, t, count(*) AS tf FROM t GROUP BY 1, 2
       |), dict AS (
       |  SELECT t, CAST(dense_rank() OVER (ORDER BY t) AS BIGINT) AS tid
       |  FROM (SELECT DISTINCT t FROM t)
       |), m AS (
       |  SELECT doc_id, tf, (tid * 2654435761) % 4294967296 AS m
       |  FROM tf JOIN dict USING (t)
       |), bits AS (
       |  SELECT doc_id, bb.b AS b, tf * (((m >> CAST(bb.b AS INT)) & 1) * 2 - 1) AS c
       |  FROM m, (SELECT unnest(range(32)) AS b) bb
       |), s AS (
       |  SELECT doc_id, b, sum(c) AS s FROM bits GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(sum(CASE WHEN s > 0
       |  THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS simhash
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def qDedupNgram(spark: SparkSession, sf: String): DataFrame =
    Dedup.ngramJaccardPairs(docs(spark, sf), w = 3, minJaccard = 0.35)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jac"))
      .orderBy(col("a"), col("b"))
  val oDedupNgram: String =
    s"""$TokCte, sh AS (
       |  SELECT doc_id, CASE WHEN len(ts) >= 3 THEN
       |    list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] FOR i IN range(1, len(ts)-1)])
       |    ELSE [] END AS shingles FROM tok
       |), ds AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), sizes AS (
       |  SELECT doc_id, count(*) AS sz FROM ds GROUP BY doc_id
       |), com AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common FROM ds x
       |  JOIN ds y ON x.s = y.s AND x.doc_id < y.doc_id GROUP BY 1, 2
       |)
       |SELECT com.a, com.b,
       |  round(com.common * 1.0e0 / (sa.sz + sb.sz - com.common), 6) AS jac
       |FROM com JOIN sizes sa ON sa.doc_id = com.a JOIN sizes sb ON sb.doc_id = com.b
       |WHERE com.common * 1.0e0 / (sa.sz + sb.sz - com.common) >= 0.35e0
       |ORDER BY a, b""".stripMargin

  /** Embedding-cosine near-dup: top-20 pairs by cosine. */
  def qDedupEmbedding(spark: SparkSession, sf: String): DataFrame =
    Similarity.cosinePairs(vecs(spark, sf), topN = 20)
  private val DimsCte =
    s"dims AS (SELECT CAST(unnest(range(1, ${Similarity.Dims + 1})) AS INT) AS i)"
  private val NormsCte =
    """norms AS (
      |  SELECT vec_id, sqrt(sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) AS nrm
      |  FROM embeddings, dims GROUP BY vec_id
      |)""".stripMargin
  val oDedupEmbedding: String =
    s"""WITH $DimsCte, $NormsCte, prod AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    sum(CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)) AS dot
       |  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id, dims
       |  GROUP BY 1, 2
       |)
       |SELECT p.a, p.b, round(p.dot / (na.nrm * nb.nrm), 6) AS cos
       |FROM prod p JOIN norms na ON na.vec_id = p.a JOIN norms nb ON nb.vec_id = p.b
       |ORDER BY cos DESC, a, b LIMIT 20""".stripMargin

  /** Embedding near-dup, bucketed scale path: candidates only within a
    * sign-LSH bucket (the linear-ish plan for 10^9 vectors), exact cosine
    * confirm. Threshold 0.405 sits in a gap of the fixture's cosine
    * distribution, so the float-vs-double filter edge can't flip rows. */
  def qDedupEmbeddingLsh(spark: SparkSession, sf: String): DataFrame =
    Similarity.cosinePairsBucketed(vecs(spark, sf), minCos = 0.405)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
      .orderBy(col("a"), col("b"))
  val oDedupEmbeddingLsh: String =
    s"""WITH $DimsCte, $NormsCte, planes AS (
       |  SELECT CAST(unnest(range(${Similarity.NumPlanes})) AS INT) AS b
       |), signs AS (
       |  SELECT b, i, CASE WHEN (i*37 + b*89) % 103 % 2 = 0 THEN 1.0e0 ELSE -1.0e0 END AS sgn
       |  FROM planes, dims
       |), bdots AS (
       |  SELECT e.vec_id, s.b, sum(CAST(e.embedding[s.i] AS DOUBLE) * s.sgn) AS d
       |  FROM embeddings e, signs s GROUP BY 1, 2
       |), buckets AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN d >= 0
       |    THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM bdots GROUP BY vec_id
       |), prod AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    sum(CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)) AS dot
       |  FROM embeddings x
       |  JOIN buckets bx ON bx.vec_id = x.vec_id
       |  JOIN embeddings y ON x.vec_id < y.vec_id
       |  JOIN buckets byy ON byy.vec_id = y.vec_id AND byy.bucket = bx.bucket, dims
       |  GROUP BY 1, 2
       |)
       |SELECT p.a, p.b, round(p.dot / (na.nrm * nb.nrm), 6) AS cos
       |FROM prod p JOIN norms na ON na.vec_id = p.a JOIN norms nb ON nb.vec_id = p.b
       |WHERE p.dot / (na.nrm * nb.nrm) >= 0.405e0
       |ORDER BY a, b""".stripMargin

  // ------------------------------------------------------ similarity search

  private def queryVec(spark: SparkSession, sf: String): Seq[Float] =
    vecs(spark, sf).where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)

  /** Brute-force cosine top-20 for the vec_id=0 query vector. */
  def qAnnBrute(spark: SparkSession, sf: String): DataFrame = {
    val q = queryVec(spark, sf)
    vecs(spark, sf)
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"),
          typedLit(q.map(_.toDouble))), 6).as("cos"))
      .where(col("vec_id") =!= 0)
      .orderBy(col("cos").desc, col("vec_id")).limit(20)
  }
  val oAnnBrute: String =
    s"""WITH $DimsCte, $NormsCte, q AS (
       |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
       |), dots AS (
       |  SELECT e.vec_id, sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)) AS dot
       |  FROM embeddings e, q, dims WHERE e.vec_id <> 0 GROUP BY e.vec_id
       |)
       |SELECT d.vec_id AS vec_id, round(d.dot / (n.nrm * (SELECT nrm FROM norms WHERE vec_id = 0)), 6) AS cos
       |FROM dots d JOIN norms n ON n.vec_id = d.vec_id
       |ORDER BY cos DESC, 1 LIMIT 20""".stripMargin

  /** Sign-LSH bucketed top-10: prune to the query vector's bucket. */
  def qAnnLsh(spark: SparkSession, sf: String): DataFrame = {
    val q = queryVec(spark, sf)
    val qd = typedLit(q.map(_.toDouble))
    vecs(spark, sf)
      .withColumn("bucket", Similarity.lshBucket(col("embedding")))
      .where(col("bucket") === Similarity.lshBucket(qd) && col("vec_id") =!= 0)
      .select(col("vec_id"), col("bucket"),
        round(Similarity.cosine(col("embedding"), qd), 6).as("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(10)
  }
  val oAnnLsh: String =
    s"""WITH $DimsCte, $NormsCte, planes AS (
       |  SELECT CAST(unnest(range(${Similarity.NumPlanes})) AS INT) AS b
       |), signs AS (
       |  SELECT b, i, CASE WHEN (i*37 + b*89) % 103 % 2 = 0 THEN 1.0e0 ELSE -1.0e0 END AS sgn
       |  FROM planes, dims
       |), bdots AS (
       |  SELECT e.vec_id, s.b, sum(CAST(e.embedding[s.i] AS DOUBLE) * s.sgn) AS d
       |  FROM embeddings e, signs s GROUP BY 1, 2
       |), buckets AS (
       |  SELECT vec_id, CAST(sum(CASE WHEN d >= 0
       |    THEN CAST(1 AS BIGINT) << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM bdots GROUP BY vec_id
       |), q AS (
       |  SELECT e.embedding AS qv, b.bucket AS qb FROM embeddings e
       |  JOIN buckets b ON b.vec_id = e.vec_id WHERE e.vec_id = 0
       |), dots AS (
       |  SELECT e.vec_id, sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)) AS dot
       |  FROM embeddings e, q, dims WHERE e.vec_id <> 0 GROUP BY e.vec_id
       |)
       |SELECT d.vec_id AS vec_id, b.bucket AS bucket,
       |  round(d.dot / (n.nrm * (SELECT nrm FROM norms WHERE vec_id = 0)), 6) AS cos
       |FROM dots d JOIN norms n ON n.vec_id = d.vec_id
       |JOIN buckets b ON b.vec_id = d.vec_id
       |WHERE b.bucket = (SELECT qb FROM q)
       |ORDER BY cos DESC, 1 LIMIT 10""".stripMargin

  /** IVF-probed top-10: per-label centroid codebook, nearest-2 cells
    * probed (query vector itself included, cos=1 sanity row). */
  def qAnnIvf(spark: SparkSession, sf: String): DataFrame =
    Similarity.ivfTopK(vecs(spark, sf), queryVec(spark, sf), k = 10, nProbe = 2)
  val oAnnIvf: String =
    s"""WITH $DimsCte, $NormsCte, q AS (
       |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
       |), ex AS (
       |  SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, dims
       |), cent AS (
       |  SELECT label, i, avg(x) AS m FROM ex GROUP BY 1, 2
       |), d2 AS (
       |  SELECT e.vec_id AS vec_id, c.label AS cell,
       |    sum((CAST(e.embedding[c.i] AS DOUBLE) - c.m) * (CAST(e.embedding[c.i] AS DOUBLE) - c.m)) AS d2
       |  FROM embeddings e, cent c GROUP BY 1, 2
       |), assign AS (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |  FROM d2
       |), qd2 AS (
       |  SELECT c.label AS cell,
       |    sum((CAST(q.qv[c.i] AS DOUBLE) - c.m) * (CAST(q.qv[c.i] AS DOUBLE) - c.m)) AS d2
       |  FROM q, cent c GROUP BY 1
       |), probe AS (
       |  SELECT cell FROM qd2 ORDER BY d2, cell LIMIT 2
       |), dots AS (
       |  SELECT e.vec_id AS vec_id, sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)) AS dot
       |  FROM embeddings e, q, dims GROUP BY 1
       |)
       |SELECT a.vec_id AS vec_id, a.cell AS cell,
       |  round(d.dot / (n.nrm * (SELECT nrm FROM norms WHERE vec_id = 0)), 6) AS cos
       |FROM assign a JOIN dots d ON d.vec_id = a.vec_id
       |JOIN norms n ON n.vec_id = a.vec_id
       |WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM probe)
       |ORDER BY cos DESC, 1 LIMIT 10""".stripMargin

  // --------------------------------------------------------- text analysis

  def qLangId(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.langId(docs(spark, sf)).orderBy(col("doc_id"))
  val oLangId: String = {
    val ratioCols = TextAnalysis.LangMarkers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString(", ")
      s"""CASE WHEN len(ts) > 0 THEN round(
         |    len(list_filter(ts, x -> list_contains([$lst], x))) * 1.0e0 / len(ts), 6)
         |  ELSE 0.0e0 END AS r_$lang""".stripMargin
    }.mkString(",\n  ")
    val langs = TextAnalysis.LangMarkers.keys.toSeq.sorted
    val maxExpr = s"greatest(${langs.map(l => s"r_$l").mkString(", ")})"
    val caseArms = langs.map(l => s"WHEN r_$l = $maxExpr THEN '$l'").mkString(" ")
    s"""$TokCte, r AS (
       |  SELECT t.doc_id, d.lang, $ratioCols
       |  FROM tok t JOIN documents d USING (doc_id)
       |)
       |SELECT doc_id, lang, ${langs.map(l => s"r_$l").mkString(", ")},
       |  CASE WHEN $maxExpr > 0 THEN (CASE $caseArms END) ELSE 'und' END AS predicted
       |FROM r ORDER BY doc_id""".stripMargin
  }

  def qQuality(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.qualityScore(docs(spark, sf)).orderBy(col("doc_id"))
  val oQuality: String = {
    val stops = TextAnalysis.EnglishStops.map(s => s"'$s'").mkString(", ")
    s"""$TokCte, f AS (
       |  SELECT t.doc_id,
       |    len(ts) AS n_tok,
       |    CAST(length(d.text) AS DOUBLE) AS n_char,
       |    CASE WHEN len(ts) > 0 THEN
       |      list_sum([CAST(length(x) AS DOUBLE) FOR x IN ts]) / (len(ts) * 1.0e0)
       |      ELSE 0.0e0 END AS mean_tok_len,
       |    CASE WHEN len(ts) > 0 THEN
       |      len(list_filter(ts, x -> list_contains([$stops], x))) * 1.0e0 / len(ts)
       |      ELSE 0.0e0 END AS stop_ratio,
       |    CASE WHEN length(d.text) > 0 THEN
       |      len(regexp_extract_all(d.text, '[.,;:!?]')) * 1.0e0 / length(d.text)
       |      ELSE 0.0e0 END AS punct_ratio,
       |    CASE WHEN length(d.text) > 0 THEN
       |      len(regexp_extract_all(d.text, '[0-9]')) * 1.0e0 / length(d.text)
       |      ELSE 0.0e0 END AS digit_ratio
       |  FROM tok t JOIN documents d USING (doc_id)
       |)
       |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
       |  round(mean_tok_len, 6) AS mean_tok_len,
       |  round(stop_ratio, 6) AS stop_ratio,
       |  round(punct_ratio, 6) AS punct_ratio,
       |  round(digit_ratio, 6) AS digit_ratio,
       |  round(CASE WHEN n_tok < 5 THEN 0.0e0 ELSE
       |    0.4e0 * least(stop_ratio * 4, 1.0e0) +
       |    0.3e0 * (CASE WHEN mean_tok_len >= 3 AND mean_tok_len <= 10 THEN 1.0e0 ELSE 0.0e0 END) +
       |    0.2e0 * (1.0e0 - least(digit_ratio * 10, 1.0e0)) +
       |    0.1e0 * least(punct_ratio * 20, 1.0e0) END, 6) AS quality
       |FROM f ORDER BY doc_id""".stripMargin
  }

  def qTokenCounts(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.tokenCounts(docs(spark, sf)).orderBy(col("doc_id"))
  val oTokenCounts: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[^ \t\n\r]+')) AS BIGINT) AS ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) AS word_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 \t\n\r]')) AS BIGINT) AS bpeish_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Intra-doc repetition signals (Gopher/MassiveText quality filters):
    * duplicate-line / duplicate-token fractions as pure array
    * expressions, top-bigram fraction via one map-side-combinable
    * groupBy — the boilerplate/spam detectors a pre-training corpus
    * runs before quality filtering. */
  def qRepetition(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.repetitionSignals(docs(spark, sf)).orderBy(col("doc_id"))
  val oRepetition: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    len(string_split(text, chr(10))) AS nl,
      |    len(list_distinct(string_split(text, chr(10)))) AS dlx,
      |    regexp_extract_all(lower(text), '[a-z0-9_]+') AS ts
      |  FROM documents
      |), fr AS (
      |  SELECT doc_id,
      |    round(CASE WHEN nl > 0 THEN (nl - dlx) * 1.0e0 / nl ELSE 0.0e0 END, 6) AS dup_line_frac,
      |    round(CASE WHEN len(ts) > 0
      |      THEN (len(ts) - len(list_distinct(ts))) * 1.0e0 / len(ts)
      |      ELSE 0.0e0 END, 6) AS dup_token_frac,
      |    ts
      |  FROM base
      |), pos AS (
      |  SELECT doc_id, CAST(generate_subscripts(ts, 1) AS BIGINT) AS p, unnest(ts) AS t
      |  FROM fr
      |), bg AS (
      |  SELECT a.doc_id, a.t || ' ' || b.t AS bg, count(*) AS c
      |  FROM pos a JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1
      |  GROUP BY 1, 2
      |), tb AS (
      |  SELECT doc_id, round(max(c) * 1.0e0 / sum(c), 6) AS top_bigram_frac
      |  FROM bg GROUP BY doc_id
      |)
      |SELECT fr.doc_id, fr.dup_line_frac, fr.dup_token_frac,
      |       coalesce(tb.top_bigram_frac, 0.0e0) AS top_bigram_frac
      |FROM fr LEFT JOIN tb USING (doc_id) ORDER BY fr.doc_id""".stripMargin

  /** PII scrub (training-pipeline redaction pass): the corpus text is
    * salted with DETERMINISTIC synthetic PII (email + SSN-shaped + IPv4,
    * derived from doc_id with integer arithmetic — the identical string
    * is built in both engines), then redacted by the library's
    * lookaround-free pattern chain; per-category counts audit what was
    * scrubbed. Equality proves the regex dialects agree end-to-end. */
  def qRedact(spark: SparkSession, sf: String): DataFrame = {
    val salted = docs(spark, sf).where(col("doc_id") < 200).select(
      col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") * 7 % 256).cast("string"), lit(" ssn 123-45-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("text"))
    TextAnalysis.redact(salted).orderBy(col("doc_id"))
  }
  val oRedact: String =
    """WITH salted AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR)
      |      || '@mail.example.com from 10.0.'
      |      || CAST(doc_id % 256 AS VARCHAR) || '.'
      |      || CAST(doc_id * 7 % 256 AS VARCHAR) || ' ssn 123-45-'
      |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      |  FROM documents WHERE doc_id < 200
      |), s1 AS (
      |  SELECT doc_id, text,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      |  FROM salted
      |), s2 AS (
      |  SELECT doc_id, n_email,
      |    CAST(len(regexp_extract_all(t1, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn,
      |    regexp_replace(t1, '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g') AS t2
      |  FROM s1
      |)
      |SELECT doc_id,
      |  regexp_replace(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted,
      |  n_email, n_ssn,
      |  CAST(len(regexp_extract_all(t2, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ip
      |FROM s2 ORDER BY doc_id""".stripMargin

  def qFingerprint(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.fingerprints(docs(spark, sf)).orderBy(col("doc_id"))
  val oFingerprint: String =
    s"""$TokCte, pos AS (
       |  SELECT doc_id, CAST(generate_subscripts(ts, 1) AS BIGINT) AS p, unnest(ts) AS t
       |  FROM tok
       |), dict AS (
       |  SELECT t, CAST(dense_rank() OVER (ORDER BY t) AS BIGINT) AS tid
       |  FROM (SELECT DISTINCT t FROM pos)
       |)
       |SELECT doc_id, CAST(sum(p * ((tid * 131 + 7) % 1000003)) AS BIGINT) AS fingerprint
       |FROM pos JOIN dict USING (t) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Naive Bayes per-label log-likelihoods for a fixed query (the
    * Classification module's scoring surface, relational form). */
  def qNbScores(spark: SparkSession, sf: String): DataFrame = {
    // one-shot: the model tables feed exactly one job — don't cache (leak)
    val model = Classify.trainNaiveBayes(docs(spark, sf), labelCol = "lang",
      cache = false)
    Classify.naiveBayesScores(model, Map("merge" -> 1, "vector" -> 1, "scan" -> 1))
      .orderBy(col("label"))
  }
  val oNbScores: String =
    s"""$TokCte, lt AS (
       |  SELECT d.lang AS label, x.t AS t, count(*) AS c
       |  FROM (SELECT doc_id, unnest(ts) AS t FROM tok) x
       |  JOIN documents d USING (doc_id) GROUP BY 1, 2
       |), totals AS (
       |  SELECT label, CAST(sum(c) AS BIGINT) AS total FROM lt GROUP BY 1
       |), vocab AS (
       |  SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM tok)
       |), dpl AS (
       |  SELECT lang AS label, count(*) AS docs FROM documents GROUP BY 1
       |), nd AS (SELECT count(*) AS n FROM documents
       |), q(t, qtf) AS (VALUES ('merge', 1), ('vector', 1), ('scan', 1)
       |), ll AS (
       |  SELECT tt.label AS label,
       |    sum(q.qtf * ln((coalesce(lt.c, 0) + 1.0e0) / (tt.total + vocab.v * 1.0e0))) AS ll
       |  FROM totals tt CROSS JOIN q CROSS JOIN vocab
       |  LEFT JOIN lt ON lt.label = tt.label AND lt.t = q.t
       |  GROUP BY 1
       |)
       |SELECT ll.label AS label, round(ln(dpl.docs * 1.0e0 / nd.n) + ll.ll, 6) AS loglik
       |FROM ll JOIN dpl ON dpl.label = ll.label CROSS JOIN nd
       |ORDER BY 1""".stripMargin

  // ------------------------------------------------------------ multimodal

  def qMultimodalMeta(spark: SparkSession, sf: String): DataFrame =
    Multimodal.assetMeta(Multimodal.assets(docs(spark, sf))).orderBy(col("doc_id"))
  val oMultimodalMeta: String =
    """WITH a AS (
      |  SELECT doc_id,
      |    ['image','audio','video','text'][CAST(doc_id % 4 + 1 AS INT)] AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |    lower(hex(encode(text))) AS hx
      |  FROM documents
      |)
      |SELECT doc_id, modality, byte_len,
      |  substring(hx, 1, 16) AS magic,
      |  substring(hx, 1, 2)
      |    || substring(hx, CAST((byte_len // 4) * 2 AS INT) + 1, 2)
      |    || substring(hx, CAST((byte_len // 2) * 2 AS INT) + 1, 2)
      |    || substring(hx, CAST((byte_len * 3 // 4) * 2 AS INT) + 1, 2) AS sample
      |FROM a ORDER BY doc_id""".stripMargin

  /** Batched stub feature extraction — no SQL oracle (mapPartitions
    * plumbing; driver records the rows-only check). Only the FLOAT
    * feature moments stay rows-only; the integer half of the stub is
    * oracled by [[qMultimodalFrames]]. */
  def qMultimodalStats(spark: SparkSession, sf: String): DataFrame =
    Multimodal.modalityStats(spark, docs(spark, sf))

  /** The SQL-expressible half of the stub decoder: the stub's
    * `n_frames = 1 + byte_len % 7` is exact integer arithmetic, so the
    * per-modality (n, frames) counts CAN be oracled even while the float
    * features stay rows-only — and the oracle still exercises the full
    * batched mapPartitions decode path (it aggregates the decoder's
    * OUTPUT, not a SQL shortcut). */
  def qMultimodalFrames(spark: SparkSession, sf: String): DataFrame =
    Multimodal.extractFeatures(spark, Multimodal.assets(docs(spark, sf))).toDF()
      .groupBy(col("modality"))
      .agg(count("*").as("n"), sum(col("n_frames")).cast("long").as("frames"))
      .orderBy(col("modality"))
  val oMultimodalFrames: String =
    """WITH a AS (
      |  SELECT doc_id,
      |    ['image','audio','video','text'][CAST(doc_id % 4 + 1 AS INT)] AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
      |  FROM documents
      |)
      |SELECT modality, count(*) AS n,
      |  CAST(sum(1 + byte_len % 7) AS BIGINT) AS frames
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  /** Production-hash MinHash LSH (xxhash64) — no SQL oracle (Spark-only
    * hash); correctness vs the parity path is asserted in ScalaTest. */
  def qDedupMinhashProd(spark: SparkSession, sf: String): DataFrame =
    Dedup.minhashNearDupsProd(docs(spark, sf), minJaccard = 0.35)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jac"))
      .orderBy(col("a"), col("b"))

  /** Production-hash SimHash (xxhash64 mix, no dictionary) — no SQL
    * oracle; parity-path agreement on duplicate grouping is asserted in
    * ScalaTest. */
  def qDedupSimhashProd(spark: SparkSession, sf: String): DataFrame =
    Dedup.simhashProd(docs(spark, sf)).orderBy(col("doc_id"))

  /** Production-hash fingerprints (xxhash64, map+agg only) — no SQL
    * oracle; duplicate-grouping agreement asserted in ScalaTest. */
  def qFingerprintProd(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.fingerprintsProd(docs(spark, sf)).orderBy(col("doc_id"))

  // ------------------------------------------------------------- registry

  // --------------------------------------------- dataset assembly

  /** Deterministic content-hash train/val split (leakage-safe: identical
    * content always lands on the same side; first md5 hex digit in
    * {0,1} => 'val', 2/16 of the corpus in expectation). */
  def qSplit(spark: SparkSession, sf: String): DataFrame =
    Packing.deterministicSplit(docs(spark, sf)).orderBy(col("doc_id"))
  val oSplit: String =
    """SELECT doc_id,
      |  CASE WHEN substr(md5(text), 1, 1) IN ('0', '1') THEN 'val' ELSE 'train' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Token-budget window packing: window_id = exclusive-prefix-sum of
    * token counts in doc_id order, integer-divided by the budget. The
    * engine computes the prefix sum scale-shaped (range partitions +
    * partitioned running sum + driver-rebased offsets, no global
    * window); the oracle is the literal global window SQL. */
  def qPackWindows(spark: SparkSession, sf: String): DataFrame =
    Packing.packIntoWindows(docs(spark, sf), budgetTokens = 2048L)
      .orderBy(col("doc_id"))
  val oPackWindows: String =
    """WITH n AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |)
      |SELECT doc_id, n_tokens,
      |  CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS BIGINT) AS window_id
      |FROM n ORDER BY doc_id""".stripMargin

  // ------------------------------------- span dedup / decontam / mixture

  /** Exact duplicated-span stats (Lee et al. 2021 ExactSubstr analog):
    * per doc, how many of its 10-token windows also occur in an earlier
    * doc. */
  def qSpanDups(spark: SparkSession, sf: String): DataFrame =
    Dedup.spanDupStats(docs(spark, sf), w = 10)
      .select(col("doc_id"), col("n_windows"), col("n_dup"),
        round(col("dup_frac"), 6).as("dup_frac"))
      .orderBy(col("doc_id"))
  val oSpanDups: String = {
    val terms = (0 until 10).map(j => s"ts[i+$j]").mkString(" || ' ' || ")
    s"""$TokCte, win AS (
       |  SELECT doc_id, unnest([$terms FOR i IN range(1, len(ts)-8)]) AS s
       |  FROM tok WHERE len(ts) >= 10
       |), fo AS (
       |  SELECT s, min(doc_id) AS fd FROM win GROUP BY s
       |)
       |SELECT w.doc_id AS doc_id, count(*) AS n_windows,
       |  CAST(sum(CASE WHEN fo.fd < w.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  round(CAST(sum(CASE WHEN fo.fd < w.doc_id THEN 1 ELSE 0 END) AS BIGINT)
       |        * 1.0e0 / count(*), 6) AS dup_frac
       |FROM win w JOIN fo USING (s)
       |GROUP BY w.doc_id
       |HAVING sum(CASE WHEN fo.fd < w.doc_id THEN 1 ELSE 0 END) > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** Benchmark decontamination: eval set = doc_id % 11 == 0, corpus = the
    * rest; per corpus doc, distinct 3-gram collisions with the eval set
    * and the overlap fraction a pipeline thresholds on. */
  def qDecontaminate(spark: SparkSession, sf: String): DataFrame = {
    val all = docs(spark, sf)
    TextAnalysis.contamination(
      all.where(col("doc_id") % 11 =!= 0), all.where(col("doc_id") % 11 === 0), w = 3)
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        round(col("overlap"), 6).as("overlap"))
      .orderBy(col("doc_id"))
  }
  val oDecontaminate: String =
    s"""$TokCte, sh AS (
       |  SELECT doc_id, CASE WHEN len(ts) >= 3 THEN
       |    list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] FOR i IN range(1, len(ts)-1)])
       |    ELSE [] END AS shingles FROM tok
       |), ds AS (
       |  SELECT doc_id, unnest(shingles) AS s FROM sh
       |), cs AS (
       |  SELECT doc_id, s FROM ds WHERE doc_id % 11 <> 0
       |), hits AS (
       |  SELECT doc_id, count(*) AS n_hit FROM cs
       |  WHERE s IN (SELECT DISTINCT s FROM ds WHERE doc_id % 11 = 0)
       |  GROUP BY doc_id
       |), tot AS (
       |  SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY doc_id
       |)
       |SELECT t.doc_id AS doc_id, t.n_shingles AS n_shingles, h.n_hit AS n_hit,
       |  round(h.n_hit * 1.0e0 / t.n_shingles, 6) AS overlap
       |FROM tot t JOIN hits h USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Deterministic domain-mixture sampling: per-source keep rates in ppm
    * (src0 20%, src1 50%, src2 dropped, default 80%), realized by the
    * doc-stable residue test; reports per-source in/kept counts. */
  def qSampleMixture(spark: SparkSession, sf: String): DataFrame = {
    val all = docs(spark, sf)
    val kept = Packing.mixtureSample(all, "source",
      Map("src0" -> 200000L, "src1" -> 500000L, "src2" -> 0L),
      defaultPpm = 800000L)
      .groupBy(col("source")).agg(count("*").as("n_kept"))
    all.groupBy(col("source")).agg(count("*").as("n_in"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_in"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }
  val oSampleMixture: String =
    """WITH keep AS (
      |  SELECT source FROM documents
      |  WHERE ((doc_id % 1000003) * 2654435761) % 1000000 <
      |    (CASE source WHEN 'src0' THEN 200000 WHEN 'src1' THEN 500000
      |                 WHEN 'src2' THEN 0 ELSE 800000 END)
      |), tot AS (
      |  SELECT source, count(*) AS n_in FROM documents GROUP BY source
      |), k AS (
      |  SELECT source, count(*) AS n_kept FROM keep GROUP BY source
      |)
      |SELECT t.source AS source, t.n_in AS n_in,
      |  coalesce(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
      |FROM tot t LEFT JOIN k USING (source) ORDER BY source""".stripMargin

  /** Bigram-LM cross-entropy quality scoring (the CCNet-style perplexity
    * filter): add-0.5 smoothed bigram model trained on the corpus itself,
    * every doc scored by mean −ln p(v|u) over its token transitions. */
  def qLmScore(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.bigramCrossEntropy(docs(spark, sf))
      .select(col("doc_id"), col("n_bigrams"), round(col("ce"), 6).as("ce"))
      .orderBy(col("doc_id"))
  val oLmScore: String =
    s"""$TokCte, bg AS (
       |  SELECT doc_id, unnest(ts[1:len(ts)-1]) AS u, unnest(ts[2:len(ts)]) AS v
       |  FROM tok WHERE len(ts) >= 2
       |), cuv AS (
       |  SELECT u, v, count(*) AS cuv FROM bg GROUP BY u, v
       |), cu AS (
       |  SELECT u, CAST(sum(cuv) AS BIGINT) AS cu FROM cuv GROUP BY u
       |), voc AS (
       |  SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM tok)
       |), nlp AS (
       |  SELECT bg.doc_id, -ln((cuv.cuv + 0.5e0) / (cu.cu + 0.5e0 * voc.v)) AS nlp
       |  FROM bg JOIN cuv USING (u, v) JOIN cu USING (u) CROSS JOIN voc
       |)
       |SELECT doc_id, count(*) AS n_bigrams, round(sum(nlp) / count(*), 6) AS ce
       |FROM nlp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Lloyd's k-means over the embeddings (k=4 seeded by vec_ids 0-3, two
    * assign+update rounds, then a final assignment): per-cluster size and
    * mean label (the purity signal — labels never feed the trainer). The
    * oracle unrolls the two rounds as explicit CTEs with the same
    * deterministic lowest-cell tie-break. */
  def qKmeans(spark: SparkSession, sf: String): DataFrame = {
    val v = vecs(spark, sf)
    val cb = Similarity.kmeansCodebook(v, k = 4, iters = 2)
    Similarity.ivfAssign(v, cb)
      .join(v.select(col("vec_id"), col("label")), Seq("vec_id"))
      .groupBy(col("cell").cast("long").as("cluster"))
      .agg(count(lit(1)).as("n"), round(avg(col("label")), 6).as("avg_label"))
      .orderBy(col("cluster"))
  }
  /** k-means CTE chain ending in `a2(vec_id, cell)` — two unrolled
    * Lloyd's rounds from the vec_id<4 seeds with the deterministic
    * lowest-cell tie-break. Shared by the kmeans gate and the SemDeDup
    * gate (whose clusters must match the Spark trainer's exactly). */
  /** Two-round Lloyd's chain over dims [lo, hi] with CTE names suffixed
    * `t` (empty for the full-width chain), ending in the assignment
    * `a2$t(vec_id, cell)` AND the round-2 centroids `c2$t(cell, i, m)` —
    * the per-subspace building block the PQ oracle instantiates once per
    * subspace. Requires an `e(vec_id, embedding, …)` CTE in scope. */
  private def kmeansSubCtes(lo: Int, hi: Int, k: Int, t: String): String = {
    // one assignment round against a (cell, i, m) centroid table
    def assign(cent: String, name: String): String =
      s"""d_$name AS (
         |  SELECT e.vec_id, c.cell,
         |    sum((CAST(e.embedding[c.i] AS DOUBLE) - c.m)
         |      * (CAST(e.embedding[c.i] AS DOUBLE) - c.m)) AS d2
         |  FROM e, $cent c GROUP BY e.vec_id, c.cell
         |), $name AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
         |    FROM d_$name) WHERE rn = 1
         |)""".stripMargin
    def update(asgn: String, name: String): String =
      s"""$name AS (
         |  SELECT a.cell, g.i, avg(CAST(e.embedding[g.i] AS DOUBLE)) AS m
         |  FROM $asgn a JOIN e USING (vec_id), generate_series($lo, $hi) AS g(i)
         |  GROUP BY a.cell, g.i
         |)""".stripMargin
    s"""c0$t AS (
       |  SELECT CAST(vec_id AS INT) AS cell, g.i,
       |         CAST(embedding[g.i] AS DOUBLE) AS m
       |  FROM embeddings, generate_series($lo, $hi) AS g(i) WHERE vec_id < $k
       |), ${assign(s"c0$t", s"a0$t")}, ${update(s"a0$t", s"c1$t")},
       |${assign(s"c1$t", s"a1$t")}, ${update(s"a1$t", s"c2$t")},
       |${assign(s"c2$t", s"a2$t")}""".stripMargin
  }
  private val EmbCte = "e AS (\n  SELECT vec_id, embedding, label FROM embeddings\n)"
  private val KmeansA2Ctes: String =
    s"$EmbCte, ${kmeansSubCtes(1, Similarity.Dims, 4, "")}"
  val oKmeans: String =
    s"""WITH $KmeansA2Ctes
       |SELECT CAST(a2.cell AS BIGINT) AS cluster, count(*) AS n,
       |       round(avg(e.label), 6) AS avg_label
       |FROM a2 JOIN e USING (vec_id) GROUP BY a2.cell ORDER BY cluster""".stripMargin

  /** PQ asymmetric-distance top-10 (Jégou et al. 2011): m=2 subspaces
    * of 32 dims, each quantized by the gated two-round k=4 trainer;
    * query = vec 0 un-quantized, score = LUT-summed approximate squared
    * L2 from the codes alone. The oracle re-derives both sub-codebooks
    * with the per-subspace CTE chain and recomputes the same LUT sums. */
  def qAnnPq(spark: SparkSession, sf: String): DataFrame =
    Similarity.pqTopK(vecs(spark, sf), queryVec(spark, sf),
      m = 2, k = 4, iters = 2, topK = 10)
  val oAnnPq: String = {
    val half = Similarity.Dims / 2
    s"""WITH $EmbCte, ${kmeansSubCtes(1, half, 4, "_s0")},
       |${kmeansSubCtes(half + 1, Similarity.Dims, 4, "_s1")}, qd AS (
       |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
       |), lut0 AS (
       |  SELECT c.cell, sum((CAST(q.qv[c.i] AS DOUBLE) - c.m)
       |                   * (CAST(q.qv[c.i] AS DOUBLE) - c.m)) AS d
       |  FROM c2_s0 c, qd q GROUP BY c.cell
       |), lut1 AS (
       |  SELECT c.cell, sum((CAST(q.qv[c.i] AS DOUBLE) - c.m)
       |                   * (CAST(q.qv[c.i] AS DOUBLE) - c.m)) AS d
       |  FROM c2_s1 c, qd q GROUP BY c.cell
       |)
       |SELECT a0.vec_id, round(l0.d + l1.d, 6) AS adc
       |FROM a2_s0 a0 JOIN a2_s1 a1 USING (vec_id)
       |JOIN lut0 l0 ON l0.cell = a0.cell
       |JOIN lut1 l1 ON l1.cell = a1.cell
       |ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  /** IVF-PQ top-10 (faiss IVFADC, by_residual=false): coarse label-
    * centroid quantizer prunes to the query's 2 nearest cells, PQ ADC
    * (m=2, k=4, two-round trainers over the full set) scores the
    * survivors from codes alone. The oracle composes the gated IVF CTEs
    * with both per-subspace k-means chains and the LUT sums. */
  def qAnnIvfPq(spark: SparkSession, sf: String): DataFrame =
    Similarity.ivfPqTopK(vecs(spark, sf), queryVec(spark, sf),
      m = 2, k = 4, iters = 2, nProbe = 2, topK = 10)
  val oAnnIvfPq: String = {
    val half = Similarity.Dims / 2
    s"""WITH $DimsCte, $EmbCte, ${kmeansSubCtes(1, half, 4, "_s0")},
       |${kmeansSubCtes(half + 1, Similarity.Dims, 4, "_s1")}, q AS (
       |  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
       |), ex AS (
       |  SELECT vec_id, label, i, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, dims
       |), cent AS (
       |  SELECT label, i, avg(x) AS m FROM ex GROUP BY 1, 2
       |), cd2 AS (
       |  SELECT e2.vec_id AS vec_id, c.label AS cell,
       |    sum((CAST(e2.embedding[c.i] AS DOUBLE) - c.m) * (CAST(e2.embedding[c.i] AS DOUBLE) - c.m)) AS d2
       |  FROM embeddings e2, cent c GROUP BY 1, 2
       |), coarse AS (
       |  SELECT vec_id, cell,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
       |  FROM cd2
       |), qd2 AS (
       |  SELECT c.label AS cell,
       |    sum((CAST(q.qv[c.i] AS DOUBLE) - c.m) * (CAST(q.qv[c.i] AS DOUBLE) - c.m)) AS d2
       |  FROM q, cent c GROUP BY 1
       |), probe AS (
       |  SELECT cell FROM qd2 ORDER BY d2, cell LIMIT 2
       |), lut0 AS (
       |  SELECT c.cell, sum((CAST(q.qv[c.i] AS DOUBLE) - c.m)
       |                   * (CAST(q.qv[c.i] AS DOUBLE) - c.m)) AS d
       |  FROM c2_s0 c, q GROUP BY c.cell
       |), lut1 AS (
       |  SELECT c.cell, sum((CAST(q.qv[c.i] AS DOUBLE) - c.m)
       |                   * (CAST(q.qv[c.i] AS DOUBLE) - c.m)) AS d
       |  FROM c2_s1 c, q GROUP BY c.cell
       |)
       |SELECT a.vec_id AS vec_id, a.cell AS cell, round(l0.d + l1.d, 6) AS adc
       |FROM coarse a
       |JOIN a2_s0 p0 ON p0.vec_id = a.vec_id
       |JOIN a2_s1 p1 ON p1.vec_id = a.vec_id
       |JOIN lut0 l0 ON l0.cell = p0.cell
       |JOIN lut1 l1 ON l1.cell = p1.cell
       |WHERE a.rn = 1 AND a.cell IN (SELECT cell FROM probe)
       |ORDER BY adc, vec_id LIMIT 10""".stripMargin
  }

  /** SemDeDup (Abbas et al. 2023): k-means clusters (k=4, two rounds —
    * the exact trainer the kmeans gate verifies), then within each
    * cluster drop every vector with a lower-id duplicate at cosine >=
    * 0.405 (the same boundary-safe threshold the LSH dedup gate uses).
    * Candidate pairs exist only inside a cluster — the paper's scale
    * argument — so the oracle's pair join is also cell-gated. */
  def qSemDedup(spark: SparkSession, sf: String): DataFrame =
    Similarity.semDedup(vecs(spark, sf), k = 4, iters = 2, minCos = 0.405)
      .orderBy(col("vec_id"))
  val oSemDedup: String =
    s"""WITH $KmeansA2Ctes, $DimsCte, $NormsCte, prod AS (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    sum(CAST(ex.embedding[i] AS DOUBLE) * CAST(ey.embedding[i] AS DOUBLE)) AS dot
       |  FROM a2 x JOIN a2 y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN embeddings ex ON ex.vec_id = x.vec_id
       |  JOIN embeddings ey ON ey.vec_id = y.vec_id, dims
       |  GROUP BY 1, 2
       |), dropped AS (
       |  SELECT DISTINCT p.b AS vec_id FROM prod p
       |  JOIN norms na ON na.vec_id = p.a JOIN norms nb ON nb.vec_id = p.b
       |  WHERE p.dot / (na.nrm * nb.nrm) >= 0.405e0
       |)
       |SELECT a2.vec_id, CAST(a2.cell AS BIGINT) AS cluster,
       |       (d.vec_id IS NULL) AS kept
       |FROM a2 LEFT JOIN dropped d ON d.vec_id = a2.vec_id
       |ORDER BY a2.vec_id""".stripMargin

  /** DSIR importance weights (Xie et al. 2023): every doc scored by
    * Σ c_f · [ln p̂_target(f) − ln p̂_raw(f)] over 64 hashed unigram+bigram
    * buckets, add-0.5 smoothing; target sample = doc_id % 3 == 0, raw =
    * the whole corpus. Buckets ride the dense parity dictionary
    * ((sid·131+7) mod 64 — the fingerprint hash family) so both engines
    * agree bit-for-bit. */
  def qDsir(spark: SparkSession, sf: String): DataFrame =
    Dsir.importanceWeights(docs(spark, sf), col("doc_id") % 3 === 0)
      .orderBy(col("doc_id"))
  val oDsir: String =
    s"""$TokCte, fe AS (
       |  SELECT doc_id, unnest(ts) AS f FROM tok
       |  UNION ALL
       |  SELECT doc_id, u || ' ' || v AS f FROM (
       |    SELECT doc_id, unnest(ts[1:len(ts)-1]) AS u, unnest(ts[2:len(ts)]) AS v
       |    FROM tok WHERE len(ts) >= 2)
       |), dict AS (
       |  SELECT f, CAST(dense_rank() OVER (ORDER BY f) AS BIGINT) AS sid
       |  FROM (SELECT DISTINCT f FROM fe)
       |), fb AS (
       |  SELECT doc_id, (sid*131 + 7) % 64 AS b FROM fe JOIN dict USING (f)
       |), cen AS (
       |  SELECT b, count(*) AS cr,
       |    CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |  FROM fb GROUP BY b
       |), tot AS (
       |  SELECT CAST(sum(cr) AS BIGINT) AS tr, CAST(sum(ct) AS BIGINT) AS tt FROM cen
       |), ratio AS (
       |  SELECT b, ln((ct + 0.5e0) / (tt + 0.5e0*64))
       |          - ln((cr + 0.5e0) / (tr + 0.5e0*64)) AS lr
       |  FROM cen, tot
       |), pd AS (
       |  SELECT doc_id, b, count(*) AS c FROM fb GROUP BY 1, 2
       |)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
       |       round(sum(c * lr), 6) AS dsir_w
       |FROM pd JOIN ratio USING (b) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Sliding-window chunking stats: 8-token windows every 6 tokens —
    * per doc the window count and the summed window lengths (the overlap
    * duplication factor). All-integer outputs, map-only plan. */
  def qChunkWindows(spark: SparkSession, sf: String): DataFrame =
    Packing.chunkStats(docs(spark, sf), w = 8, stride = 6)
      .orderBy(col("doc_id"))
  val oChunkWindows: String =
    s"""$TokCte, st AS (
       |  SELECT doc_id, len(ts) AS dl, unnest(range(0, len(ts), 6)) AS s
       |  FROM tok WHERE len(ts) > 0
       |)
       |SELECT doc_id, dl, count(*) AS n_chunks,
       |  CAST(sum(least(8, dl - s)) AS BIGINT) AS covered
       |FROM st GROUP BY doc_id, dl ORDER BY doc_id""".stripMargin

  /** TF-IDF keyword extraction: top-3 most characteristic terms per doc,
    * tf · ln(N/df), rounded before ranking so both engines break ties on
    * identical values (then term asc). */
  def qKeywords(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.tfidfKeywords(docs(spark, sf), k = 3)
      .orderBy(col("doc_id"), col("rank"))
  val oKeywords: String =
    s"""$TokCte, tfx AS (
       |  SELECT doc_id, unnest(ts) AS t FROM tok
       |), tf AS (
       |  SELECT doc_id, t, count(*) AS tf FROM tfx GROUP BY doc_id, t
       |), dfx AS (
       |  SELECT t, count(*) AS df
       |  FROM (SELECT DISTINCT doc_id, t FROM tfx) GROUP BY t
       |), nn AS (SELECT count(*) AS n FROM documents
       |), ranked AS (
       |  SELECT tf.doc_id, tf.t, round(tf.tf * ln(nn.n * 1.0e0 / dfx.df), 6) AS tfidf,
       |    row_number() OVER (PARTITION BY tf.doc_id
       |      ORDER BY round(tf.tf * ln(nn.n * 1.0e0 / dfx.df), 6) DESC, tf.t) AS rank
       |  FROM tf JOIN dfx USING (t) CROSS JOIN nn
       |)
       |SELECT doc_id, CAST(rank AS BIGINT) AS rank, t AS term, tfidf
       |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Corpus heavy-hitter bigrams (count >= 30) — the exact census; the
    * CMS scale path is spec-verified against it (SketchSpec). */
  def qHeavyHitters(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.heavyHitterBigrams(docs(spark, sf), minCount = 30L)
      .orderBy(col("bigram"))
  val oHeavyHitters: String =
    s"""$TokCte, bg AS (
       |  SELECT unnest([ts[i] || ' ' || ts[i + 1] FOR i IN range(1, len(ts))]) AS bigram
       |  FROM tok WHERE len(ts) >= 2
       |)
       |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
       |HAVING count(*) >= 30 ORDER BY bigram""".stripMargin

  /** Per-source boilerplate segments (segLen=2 so the toy vocabulary
    * actually collides; production default is 8). */
  def qBoilerplate(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.boilerplateSegments(docs(spark, sf), segLen = 2, minDocs = 2)
      .orderBy(col("doc_id"))
  val oBoilerplate: String =
    s"""$TokCte, segs AS (
       |  SELECT d.doc_id, d.source,
       |    unnest([array_to_string(t.ts[i * 2 + 1 : i * 2 + 2], ' ')
       |            FOR i IN range(0, greatest(len(t.ts) // 2, 1))]) AS seg
       |  FROM tok t JOIN documents d USING (doc_id)
       |), nz AS (SELECT * FROM segs WHERE len(seg) > 0
       |), sd AS (
       |  SELECT source, seg, count(DISTINCT doc_id) AS n_docs
       |  FROM nz GROUP BY source, seg
       |)
       |SELECT nz.doc_id, count(*) AS n_segments,
       |  CAST(sum(CASE WHEN sd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  round(sum(CASE WHEN sd.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0e0 / count(*), 6)
       |    AS boiler_frac
       |FROM nz JOIN sd USING (source, seg)
       |GROUP BY nz.doc_id ORDER BY doc_id""".stripMargin

  /** Domain-balanced sample: every source capped at 10 docs in
    * expectation via the deterministic Lehmer residue. */
  def qSampleBalance(spark: SparkSession, sf: String): DataFrame =
    TextAnalysis.balancedSample(docs(spark, sf), cap = 10L)
      .orderBy(col("doc_id"))
  val oSampleBalance: String =
    """WITH counts AS (
      |  SELECT source, count(*) AS n_src FROM documents GROUP BY source
      |), rates AS (
      |  SELECT source, least(1.0e0, 10.0e0 / n_src) AS rate FROM counts
      |)
      |SELECT d.doc_id, d.source FROM documents d JOIN rates r USING (source)
      |WHERE CAST((d.doc_id * 48271 + 11) % 1048573 AS DOUBLE) < r.rate * 1048573.0e0
      |ORDER BY d.doc_id""".stripMargin

  /** Int8 scalar-quantized brute-force top-10 for the vec_id=0 query:
    * integer code dot products (exact in both engines) + quantized
    * norms — the SQ8 memory-bound ANN path, oracle-reproducible because
    * quantization is floor-half-up IEEE arithmetic. */
  def qAnnInt8(spark: SparkSession, sf: String): DataFrame =
    Similarity.int8TopK(
      vecs(spark, sf).where(col("vec_id") =!= 0), queryVec(spark, sf), k = 10)
  val oAnnInt8: String =
    s"""WITH $DimsCte, sc AS (
       |  SELECT vec_id,
       |    list_max([abs(CAST(x AS DOUBLE)) FOR x IN embedding]) / 127 AS scale
       |  FROM embeddings
       |), qc AS (
       |  SELECT e.vec_id, dims.i,
       |    floor(CAST(e.embedding[dims.i] AS DOUBLE) / sc.scale + 0.5e0) AS q
       |  FROM embeddings e JOIN sc USING (vec_id), dims
       |  WHERE sc.scale > 0
       |), qn AS (
       |  SELECT vec_id, sqrt(sum(q * q)) AS nrm FROM qc GROUP BY vec_id
       |), dots AS (
       |  SELECT a.vec_id, sum(a.q * b.q) AS dot
       |  FROM qc a JOIN qc b ON a.i = b.i AND b.vec_id = 0
       |  WHERE a.vec_id <> 0 GROUP BY a.vec_id
       |)
       |SELECT d.vec_id,
       |  round(d.dot / (na.nrm * (SELECT nrm FROM qn WHERE vec_id = 0)), 6) AS qcos
       |FROM dots d JOIN qn na USING (vec_id)
       |ORDER BY qcos DESC, vec_id LIMIT 10""".stripMargin

  /** BPE vocabulary induction, round-0 surface: the word-frequency-
    * weighted adjacent character-pair census (the table the first merge
    * argmaxes over) — top-20 pairs, count desc then (a, b) asc. The
    * iterative trainer itself (argmax → greedy-leftmost merge fold →
    * recount over word TYPES only) is BpeSpec-verified with hand-computed
    * merge sequences. */
  def qBpePairs(spark: SparkSession, sf: String): DataFrame =
    Bpe.initialPairCensus(docs(spark, sf))
      .orderBy(col("n").desc, col("a"), col("b")).limit(20)
  val oBpePairs: String =
    s"""$TokCte, words AS (SELECT unnest(ts) AS w FROM tok
       |), wc AS (SELECT w, count(*) AS n FROM words GROUP BY w
       |), pairs AS (
       |  SELECT unnest([struct_pack(a := w[i], b := w[i + 1])
       |                 FOR i IN range(1, length(w))]) AS p, n
       |  FROM wc WHERE length(w) >= 2
       |)
       |SELECT p.a AS a, p.b AS b, CAST(sum(n) AS BIGINT) AS n
       |FROM pairs GROUP BY p.a, p.b ORDER BY n DESC, a, b LIMIT 20""".stripMargin

  /** Batch perceptron, 2 epochs, label = text contains 'merge' (a
    * learnable-by-construction target so the update dynamics are
    * exercised): per-doc final score + thresholded prediction. The oracle
    * unrolls both epochs as CTEs — epoch 1 from zero weights updates on
    * every doc (y·0 ≤ 0), epoch 2 on the still-misclassified set.
    * All-integer arithmetic end to end. */
  def qPerceptron(spark: SparkSession, sf: String): DataFrame = {
    val d = docs(spark, sf)
    val label = when(col("text").contains("merge"), 1L).otherwise(-1L)
    val w = Classify.trainPerceptron(d, label, epochs = 2)
    Classify.perceptronScores(d, w).orderBy(col("doc_id"))
  }
  val oPerceptron: String =
    s"""$TokCte, tfx AS (SELECT doc_id, unnest(ts) AS t FROM tok
       |), tf AS (SELECT doc_id, t, count(*) AS tf FROM tfx GROUP BY doc_id, t
       |), lab AS (
       |  SELECT doc_id, CASE WHEN text LIKE '%merge%' THEN 1 ELSE -1 END AS y
       |  FROM documents
       |), w1 AS (
       |  SELECT tf.t, CAST(sum(lab.y * tf.tf) AS BIGINT) AS w
       |  FROM tf JOIN lab USING (doc_id) GROUP BY tf.t
       |), s1 AS (
       |  SELECT tf.doc_id, CAST(sum(tf.tf * w1.w) AS BIGINT) AS s
       |  FROM tf JOIN w1 USING (t) GROUP BY tf.doc_id
       |), mis AS (
       |  SELECT lab.doc_id, lab.y FROM lab JOIN s1 USING (doc_id)
       |  WHERE lab.y * s1.s <= 0
       |), dw AS (
       |  SELECT tf.t, CAST(sum(mis.y * tf.tf) AS BIGINT) AS dw
       |  FROM tf JOIN mis USING (doc_id) GROUP BY tf.t
       |), w2 AS (
       |  SELECT w1.t, w1.w + coalesce(dw.dw, 0) AS w
       |  FROM w1 LEFT JOIN dw USING (t)
       |), s2 AS (
       |  SELECT tf.doc_id, CAST(sum(tf.tf * w2.w) AS BIGINT) AS s
       |  FROM tf JOIN w2 USING (t) GROUP BY tf.doc_id
       |)
       |SELECT doc_id, s,
       |  CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END AS pred
       |FROM s2 ORDER BY doc_id""".stripMargin

  /** HTML strip over the documents wrapped in synthetic markup inside the
    * query (deterministic; the raw table has no markup): script + comment
    * blocks, tags, entities, whitespace collapse — both engines run the
    * IDENTICAL lookaround-free pattern chain. */
  def qStripHtml(spark: SparkSession, sf: String): DataFrame =
    docs(spark, sf).select(col("doc_id"),
      TextAnalysis.stripHtml(concat(
        lit("""<div class="doc"><!-- c --><script>var x = 1 < 2;</script><p>"""),
        col("text"),
        lit("""</p>&amp;amp; A&nbsp;&lt;tail&gt;<br/></div>""")))
        .as("clean"))
      .orderBy(col("doc_id"))
  val oStripHtml: String = {
    val wrapped = """'<div class="doc"><!-- c --><script>var x = 1 < 2;</script><p>' || text || '</p>&amp;amp; A&nbsp;&lt;tail&gt;<br/></div>'"""
    val inner = TextAnalysis.HtmlStripSteps.foldLeft(wrapped) { case (e, (p, r)) =>
      s"regexp_replace($e, '${p.replace("'", "''")}', '${r.replace("'", "''")}', 'g')"
    }
    s"SELECT doc_id, trim($inner) AS clean FROM documents ORDER BY doc_id"
  }

  /** MediaWiki strip as a corpus-scale column op (the wiki-dump
    * preprocessing twin of q_strip_html): documents wrapped in literal
    * wiki markup exercising templates (incl. one nested), a table, a
    * citation, piped + plain + external links, bold/italic, a heading
    * and list markers; the oracle re-applies the SAME step chain under
    * DuckDB's RE2 (group refs translated $1→\\1), so equality proves the
    * chain is dialect-portable and the strip deterministic. */
  def qStripWiki(spark: SparkSession, sf: String): DataFrame =
    docs(spark, sf).select(col("doc_id"),
      TextAnalysis.stripWiki(concat(
        lit("== Heading ==\n{{infobox|a={{nested}}|b=2}}\n* item one\n" +
          "'''bold''' and ''italic'' [[target|shown]] [[plain]] " +
          "[https://x.org label] [https://y.org]<ref>cite</ref>\n{| table |}\n"),
        col("text"),
        lit("\n# numbered {{stub}}")))
        .as("clean"))
      .orderBy(col("doc_id"))
  val oStripWiki: String = {
    val pre = "== Heading ==\n{{infobox|a={{nested}}|b=2}}\n* item one\n" +
      "'''bold''' and ''italic'' [[target|shown]] [[plain]] " +
      "[https://x.org label] [https://y.org]<ref>cite</ref>\n{| table |}\n"
    val post = "\n# numbered {{stub}}"
    def lit(s: String) = "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
    val wrapped = s"${lit(pre)} || text || ${lit(post)}"
    val inner = TextAnalysis.WikiStripSteps.foldLeft(wrapped) { case (e, (p, r)) =>
      val rr = r.replace("$1", "\\1")
      s"regexp_replace($e, '${p.replace("'", "''")}', '${rr.replace("'", "''")}', 'g')"
    }
    s"SELECT doc_id, trim($inner) AS clean FROM documents ORDER BY doc_id"
  }

  /** BPE round-2 surface: the pair census AFTER the first learned merge —
    * exercises the trainer's full argmax → greedy-leftmost merge →
    * recount loop against an oracle that derives merge 1 itself and
    * applies it via SQL `replace` (leftmost-nonoverlapping — exactly the
    * greedy fold when round-1 symbols are single chars), sentinel '#'
    * (outside the token alphabet) standing in for the merged symbol and
    * decoded back before the tie-break ordering. */
  def qBpeMerge(spark: SparkSession, sf: String): DataFrame =
    Bpe.censusAfter(docs(spark, sf), nMerges = 1)
      .orderBy(col("n").desc, col("a"), col("b")).limit(20)
  val oBpeMerge: String =
    s"""$TokCte, words AS (SELECT unnest(ts) AS w FROM tok
       |), wc AS (SELECT w, count(*) AS n FROM words GROUP BY w
       |), c1 AS (
       |  SELECT unnest([struct_pack(a := w[i], b := w[i + 1])
       |                 FOR i IN range(1, length(w))]) AS p, n
       |  FROM wc WHERE length(w) >= 2
       |), census1 AS (
       |  SELECT p.a AS a, p.b AS b, sum(n) AS n FROM c1 GROUP BY p.a, p.b
       |), m1 AS (
       |  SELECT a || b AS m FROM census1 ORDER BY n DESC, a, b LIMIT 1
       |), w2 AS (
       |  SELECT replace(wc.w, m1.m, '#') AS w, wc.n AS n FROM wc, m1
       |), c2 AS (
       |  SELECT unnest([struct_pack(a := w[i], b := w[i + 1])
       |                 FOR i IN range(1, length(w))]) AS p, n
       |  FROM w2 WHERE length(w) >= 2
       |)
       |SELECT replace(p.a, '#', (SELECT m FROM m1)) AS a,
       |       replace(p.b, '#', (SELECT m FROM m1)) AS b,
       |       CAST(sum(n) AS BIGINT) AS n
       |FROM c2 GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 20""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_bpe_merge" -> qBpeMerge _,
    "q_strip_html" -> qStripHtml _,
    "q_strip_wiki" -> qStripWiki _,
    "q_perceptron" -> qPerceptron _,
    "q_bpe_pairs" -> qBpePairs _,
    "q_keywords" -> qKeywords _,
    "q_heavy_hitters" -> qHeavyHitters _,
    "q_boilerplate" -> qBoilerplate _,
    "q_sample_balance" -> qSampleBalance _,
    "q_ann_int8" -> qAnnInt8 _,
    "q_lm_score" -> qLmScore _,
    "q_kmeans" -> qKmeans _,
    "q_dedup_minhash_bbit" -> qDedupMinhashBbit _,
    "q_url_canon" -> qUrlCanon _,
    "q_span_removal" -> qSpanRemoval _,
    "q_curation_funnel" -> qCurationFunnel _,
    "q_gopher_rules" -> qGopherRules _,
    "q_c4_rules" -> qC4Rules _,
    "q_unigram_seed" -> qUnigramSeed _,
    "q_ann_pq" -> qAnnPq _,
    "q_ann_ivfpq" -> qAnnIvfPq _,
    "q_semdedup" -> qSemDedup _,
    "q_dsir" -> qDsir _,
    "q_chunk_windows" -> qChunkWindows _,
    "q_dedup_incremental" -> qDedupIncremental _,
    "q_dedup_clusters" -> qDedupClusters _,
    "q_span_dups" -> qSpanDups _,
    "q_decontaminate" -> qDecontaminate _,
    "q_sample_mixture" -> qSampleMixture _,
    "q_split" -> qSplit _,
    "q_pack_windows" -> qPackWindows _,
    "q_dedup_exact" -> qDedupExact _,
    "q_dedup_minhash" -> qDedupMinhash _,
    "q_dedup_minhash_prod" -> qDedupMinhashProd _,
    "q_dedup_simhash" -> qDedupSimhash _,
    "q_dedup_simhash_prod" -> qDedupSimhashProd _,
    "q_fingerprint_prod" -> qFingerprintProd _,
    "q_dedup_ngram" -> qDedupNgram _,
    "q_dedup_embedding" -> qDedupEmbedding _,
    "q_dedup_embedding_lsh" -> qDedupEmbeddingLsh _,
    "q_ann_brute" -> qAnnBrute _,
    "q_ann_lsh" -> qAnnLsh _,
    "q_ann_ivf" -> qAnnIvf _,
    "q_lang_id" -> qLangId _,
    "q_nb_scores" -> qNbScores _,
    "q_quality" -> qQuality _,
    "q_token_counts" -> qTokenCounts _,
    "q_redact" -> qRedact _,
    "q_repetition" -> qRepetition _,
    "q_fingerprint" -> qFingerprint _,
    "q_multimodal_meta" -> qMultimodalMeta _,
    "q_multimodal_stats" -> qMultimodalStats _,
    "q_multimodal_frames" -> qMultimodalFrames _)

  val oracles: Map[String, String] = Map(
    "q_bpe_merge" -> oBpeMerge,
    "q_strip_html" -> oStripHtml,
    "q_strip_wiki" -> oStripWiki,
    "q_perceptron" -> oPerceptron,
    "q_bpe_pairs" -> oBpePairs,
    "q_keywords" -> oKeywords,
    "q_heavy_hitters" -> oHeavyHitters,
    "q_boilerplate" -> oBoilerplate,
    "q_sample_balance" -> oSampleBalance,
    "q_ann_int8" -> oAnnInt8,
    "q_lm_score" -> oLmScore,
    "q_kmeans" -> oKmeans,
    "q_dedup_minhash_bbit" -> oDedupMinhashBbit,
    "q_url_canon" -> oUrlCanon,
    "q_span_removal" -> oSpanRemoval,
    "q_curation_funnel" -> oCurationFunnel,
    "q_gopher_rules" -> oGopherRules,
    "q_c4_rules" -> oC4Rules,
    "q_unigram_seed" -> oUnigramSeed,
    "q_ann_pq" -> oAnnPq,
    "q_ann_ivfpq" -> oAnnIvfPq,
    "q_semdedup" -> oSemDedup,
    "q_dsir" -> oDsir,
    "q_chunk_windows" -> oChunkWindows,
    "q_dedup_incremental" -> oDedupIncremental,
    "q_dedup_clusters" -> oDedupClusters,
    "q_span_dups" -> oSpanDups,
    "q_decontaminate" -> oDecontaminate,
    "q_sample_mixture" -> oSampleMixture,
    "q_split" -> oSplit,
    "q_pack_windows" -> oPackWindows,
    "q_dedup_exact" -> oDedupExact,
    "q_dedup_minhash" -> oDedupMinhash,
    "q_dedup_simhash" -> oDedupSimhash,
    "q_dedup_ngram" -> oDedupNgram,
    "q_dedup_embedding" -> oDedupEmbedding,
    "q_dedup_embedding_lsh" -> oDedupEmbeddingLsh,
    "q_ann_brute" -> oAnnBrute,
    "q_ann_lsh" -> oAnnLsh,
    "q_ann_ivf" -> oAnnIvf,
    "q_lang_id" -> oLangId,
    "q_nb_scores" -> oNbScores,
    "q_quality" -> oQuality,
    "q_token_counts" -> oTokenCounts,
    "q_redact" -> oRedact,
    "q_repetition" -> oRepetition,
    "q_fingerprint" -> oFingerprint,
    "q_multimodal_meta" -> oMultimodalMeta,
    "q_multimodal_frames" -> oMultimodalFrames)
}
