package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** c1: the END-TO-END corpus-prep pipeline — the composition a
  * training-data user actually runs, chaining four tiers this library
  * provides separately: t6's Gopher repetition gate, d1's exact-dedup
  * canonical election, t5's deterministic train/val/test split and
  * t10's BPE token count, emitting one row per KEPT canonical
  * document with its split assignment and model-token count. Proves
  * the operators compose (same expressions, same thresholds — the
  * spec cross-checks against the standalone tiers) and that the
  * composition collapses into a minimal plan.
  *
  * 100 TB shape — this is the point: every tier except dedup is a
  * NARROW per-row expression, so the whole pipeline is ONE projection
  * followed by ONE shuffle (the fp window for canonical election,
  * carrying doc_id + 32-char digest + a handful of small columns,
  * never re-shuffling text downstream) and a filter. Running the
  * tiers as separate passes would scan the corpus four times and
  * shuffle twice; composed, it is one scan + one shuffle. Dedup
  * before/after the quality gate is order-independent here: exact
  * dups have identical text, hence identical keep flags. */
object CorpusPrep {

  /** t6's keep signal as a pure expression over `text` — the same
    * formulas and thresholds as [[TextOps.repetitionColumns]]
    * (spec-pinned equal per document).
    *
    * The word and bigram arrays are bound ONCE via lambda scoping
    * (`transform(array(x), ws -> …)` evaluates x once and names it):
    * without this, PushPredicateThroughNonJoin inlines the keep alias
    * into the pushed-down Filter and substitutes the split/transform
    * sub-expressions PER REFERENCE — the first c1 build re-split each
    * document ~16 times and re-ran the mode-count aggregates in the
    * filter, 12.3 s at sf0.1 against ~1.5 s for the tiers it
    * composes. With the binding, the pushed predicate is one
    * single-evaluation expression (0.9 s). */
  private def t6Keep: Column = {
    // One native RepStats pass (graft.functions.TextHash) replaces
    // the nested word/bigram array bindings — the kernel computes all
    // five integral stats itself, so only the STRUCT needs the
    // evaluate-once lambda binding against predicate-pushdown
    // re-substitution (the original hazard: the pushed Filter inlined
    // the stat sub-expressions per reference, re-splitting each doc
    // ~16×).
    val stExpr = graft.functions.TextHash.repStats(split(trim(col("text")), "\\s+"))
    element_at(transform(array(stExpr), st => {
      val nWords = st.getField("n_words")
      val meanWordLen =
        st.getField("sum_word_len").cast("double") / nWords.cast("double")
      val ttr = st.getField("n_distinct").cast("double") / nWords.cast("double")
      val topWordFrac =
        st.getField("top_word_n").cast("double") / nWords.cast("double")
      val topBigramFrac = st.getField("top_bigram_n").cast("double") /
        greatest(nWords - 1, lit(1L)).cast("double")
      meanWordLen.between(3.0, 10.0) && ttr >= 0.10 &&
        topWordFrac <= 0.20 && topBigramFrac <= 0.20
    }), 1)
  }

  /** The narrow three-tier projection (quality gate + split + token
    * count), source-agnostic: pure stateless expressions, so the same
    * code runs on the batch frame and on a `readStream` of documents.
    * Quality-filtering BEFORE canonical election is equivalent (exact
    * dups share text, hence the keep flag) and keeps dropped docs out
    * of the dedup shuffle/state. */
  private def prepColumns(docs: DataFrame, salt: String): DataFrame = {
    val h = Dedup.portableHash(concat_ws(":", lit(salt), col("doc_id"))) % 100
    val splitCol =
      when(h < 80, "train").when(h < 90, "val").otherwise("test")
    docs
      .select(col("doc_id"), col("lang"), md5(col("text")).as("fp"),
        t6Keep.as("keep"), splitCol.as("split"),
        TextOps.bpeDocTokens.as("n_bpe_tokens"))
      .filter(col("keep"))
  }

  def cleanCorpus(spark: SparkSession, dir: String,
                  salt: String = "graft_v1"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("fp"))
    prepColumns(t(spark, dir, "documents"), salt)
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id"))
      .select(col("doc_id"), col("lang"), col("split"), col("n_bpe_tokens"))
  }

  /** Streaming twin of [[cleanCorpus]]: the three narrow tiers run
    * unchanged on the document stream; canonical election becomes
    * `dropDuplicates(fp)` — FIRST-SEEN canonical, the convention a
    * streaming ingest actually uses (it cannot wait for a lower
    * doc_id that may never arrive; same contract as d7's twin). State
    * is one 32-char fingerprint per distinct kept document. Which
    * group member survives is an ARRIVAL-ORDER artifact (the dedup
    * shuffle does not preserve source row order across >1 input
    * partition), so StreamingSpec asserts equality on the
    * canonical-independent projection — group count and each group's
    * shared (lang, token count) — not on doc_id. */
  def streamingCleanCorpus(spark: SparkSession, dir: String,
                           salt: String = "graft_v1"): DataFrame = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
    prepColumns(stream, salt)
      .dropDuplicates("fp")
      .select(col("doc_id"), col("lang"), col("split"), col("n_bpe_tokens"))
  }

  def cleanCorpusOracleSql(salt: String): String = {
    // t10's per-word fold, replayed through the SHARED wx/tc CTE pair
    // (nested-lambda capture avoided the same way as the t10 oracle)
    s"""WITH ${TextOps.bpeTokensCteSql},
       |sig AS (
       |  SELECT doc_id, lang, md5(text) AS fp,
       |    ('0x' || substr(md5('$salt' || ':' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS hb,
       |    string_split_regex(trim(text), '\\s+') AS ws
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, lang, fp, hb, ws,
       |    CASE WHEN len(ws) >= 2 THEN
       |      list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])
       |    ELSE [] END AS bgs
       |  FROM sig),
       |c AS (
       |  SELECT doc_id, lang, fp, hb,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
       |    CAST(list_max(list_transform(list_distinct(ws),
       |      x -> len(list_filter(ws, y -> y = x)))) AS BIGINT) AS top_word_n,
       |    CAST(CASE WHEN len(bgs) > 0 THEN
       |      list_max(list_transform(list_distinct(bgs),
       |        x -> len(list_filter(bgs, y -> y = x))))
       |    ELSE 0 END AS BIGINT) AS top_bigram_n,
       |    CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS sum_word_len
       |  FROM bg),
       |k AS (
       |  SELECT doc_id, lang, fp, hb,
       |    (CAST(sum_word_len AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
       |      AND CAST(n_distinct AS DOUBLE) / n_words >= 0.10
       |      AND CAST(top_word_n AS DOUBLE) / n_words <= 0.20
       |      AND CAST(top_bigram_n AS DOUBLE) / greatest(n_words - 1, 1) <= 0.20 AS keep,
       |    min(doc_id) OVER (PARTITION BY fp) AS keep_id
       |  FROM c)
       |SELECT k.doc_id, k.lang,
       |  CASE WHEN hb < 80 THEN 'train' WHEN hb < 90 THEN 'val' ELSE 'test' END AS split,
       |  CAST(coalesce(tc.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
       |FROM k LEFT JOIN tc ON k.doc_id = tc.doc_id
       |WHERE k.keep AND k.doc_id = k.keep_id""".stripMargin
  }
}
