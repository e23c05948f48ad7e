package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-facade registry for the LLM-pipeline operator library.
  *
  * The reference's ethos is "everything through `execute(sql)`"
  * (reference glue/mod.rs:161-187: one text entry point dispatches
  * every capability); this registry extends that contract to the
  * beyond-reference operators, so a SQL-surface user can invoke
  * dedup/ANN/corpus ops without touching Scala:
  *
  * {{{
  * EXECUTE OPERATOR exact_dedup(source = 'documents')
  * EXECUTE OPERATOR minhash_lsh(source = 'docs_db.crawl', min_sim = 0.5)
  * EXECUTE OPERATOR brute_topk(source = 'embeddings', qid = 7, k = 20)
  * }}}
  *
  * Statement shape: `EXECUTE OPERATOR name(arg = value, …)` — string
  * values quoted with single quotes, numbers bare. Every `source`
  * argument names a table the engine can resolve (temp view, current
  * database, or `db.tbl`); the operator runs over that frame exactly
  * as the Scala entry point would, so results are byte-identical to
  * the battery path (CORRECTNESS routes d1/d3/t5/p1 through here).
  * Unknown operators, unknown argument names, missing required
  * arguments and malformed pairs all raise [[EngineException]]s that
  * name what was expected (EngineSpec pins each).
  */
object Operators {

  /** One declared argument: `default = None` marks it required. */
  final case class Param(name: String, default: Option[String], doc: String)

  /** `run(spark, resolveTable, args)`: `args` is fully defaulted by
    * the engine before the call; `resolveTable` maps a table name to
    * a DataFrame with the engine's resolution rules. */
  final case class Op(name: String, doc: String, params: Seq[Param],
      run: (SparkSession, String => DataFrame, Map[String, String]) => DataFrame)

  private def p(n: String, d: String, doc: String) = Param(n, Some(d), doc)
  private def req(n: String, doc: String) = Param(n, None, doc)
  private def src(d: String) = p("source", d, s"input table (default $d)")

  import graft.operators.{Dedup, Pii, Similarity, TextOps}

  val all: Map[String, Op] = Seq(
    Op("exact_dedup", "exact dedup by content fingerprint (d1)",
      Seq(src("documents")),
      (_, rt, a) => Dedup.exactDedupOn(rt(a("source")))),
    Op("minhash_lsh", "MinHash+LSH near-dup pairs (d3)",
      Seq(src("documents"),
        p("min_sim", "0.25", "minimum estimated similarity"),
        p("max_bucket", Dedup.MaxBandBucket.toString, "band-bucket size cap")),
      (_, rt, a) => Dedup.minhashLshOn(rt(a("source")),
        a("min_sim").toDouble, a("max_bucket").toInt)),
    Op("dup_groups", "connected components over LSH near-dup pairs (d6)",
      Seq(src("documents"),
        p("min_sim", "0.25", "minimum estimated similarity")),
      (_, rt, a) => Dedup.dupGroupsOn(rt(a("source")), a("min_sim").toDouble)),
    Op("exact_substring", "exact shared-substring runs, Lee et al. 2022 (d14)",
      Seq(src("documents"),
        p("min_tokens", Dedup.SpanWords.toString, "minimum overlap run in tokens"),
        p("posting_cap", Dedup.ExactSubstrPostingCap.toString, "gram posting-list cap")),
      (_, rt, a) => Dedup.exactSubstringOn(
        rt(a("source")).select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")),
        a("min_tokens").toInt, a("posting_cap").toInt)),
    Op("split_assign", "deterministic train/val/test split (t5)",
      Seq(src("documents"), p("salt", "graft_v1", "hash salt")),
      (_, rt, a) => TextOps.splitAssignOn(rt(a("source")), a("salt"))),
    Op("shuffle_shard", "deterministic shard + in-shard order (t13)",
      Seq(src("documents"),
        p("shards", "64", "shard count"),
        p("salt", "graft_sh1", "hash salt")),
      (_, rt, a) => TextOps.shuffleShardOn(rt(a("source")),
        a("shards").toInt, a("salt"))),
    Op("bpe_learn", "learn a BPE merge table, Sennrich et al. 2016 (t18)",
      Seq(src("documents"),
        p("rounds", TextOps.BpeLearnRounds.toString, "merge rounds to learn")),
      (_, rt, a) => TextOps.bpeLearnOn(rt(a("source")), a("rounds").toInt)),
    Op("pii_scan", "PII detect + redacted digest (p1)",
      Seq(src("documents")),
      (_, rt, a) => Pii.piiScanOn(rt(a("source")))),
    Op("brute_topk", "exact cosine top-k (s1)",
      Seq(src("embeddings"),
        p("qid", "0", "query vec_id"),
        p("k", "10", "result count")),
      (_, rt, a) => Similarity.bruteTopKOn(rt(a("source")),
        a("qid").toLong, a("k").toInt)),
    // ivf_topk reads the MATERIALIZED cid-partitioned index, which is
    // keyed by the corpus directory (the index lives beside the data,
    // like any database's index files) — so its argument is the dir,
    // not a table name.
    Op("ivf_topk", "ANN over the materialized IVF index (s4)",
      Seq(req("dir", "corpus data directory (holds the IVF index)"),
        p("qid", "0", "query vec_id"),
        p("k", "10", "result count")),
      (s, _, a) => Similarity.ivfTopK(s, a("dir"), a("qid").toLong, a("k").toInt)),
    // ---- round 12: the rest of the library surface ----
    Op("ngram_jaccard", "word-3-gram Jaccard near-dup pairs (d2)",
      Seq(src("documents"),
        p("threshold", "0.5", "minimum Jaccard similarity"),
        p("max_df", Dedup.MaxShingleDf.toString, "shingle posting-list cap")),
      (_, rt, a) => Dedup.ngramJaccardOn(rt(a("source")),
        a("threshold").toDouble, a("max_df").toInt)),
    Op("simhash_dups", "SimHash bucket duplicate groups (d4)",
      Seq(src("documents")),
      (_, rt, a) => Dedup.simhashDupsOn(rt(a("source")))),
    Op("embedding_dup", "embedding-cosine near-dup pairs via LSH buckets (d5)",
      Seq(src("embeddings"),
        p("threshold", "0.98", "minimum cosine similarity")),
      (_, rt, a) => Dedup.embeddingDupOn(rt(a("source")), a("threshold").toDouble)),
    Op("incremental_dedup", "dedup a new source batch against the corpus (d7)",
      Seq(req("dir", "corpus data directory"),
        p("new_source", "src19", "source tag of the incoming batch"),
        p("min_sim", "0.25", "near-dup similarity floor")),
      (s, _, a) => Dedup.incrementalDedup(s, a("dir"), a("new_source"),
        a("min_sim").toDouble)),
    Op("contamination", "train→test n-gram contamination audit (d8)",
      Seq(src("documents"), p("salt", "graft_v1", "split hash salt")),
      (_, rt, a) => Dedup.contaminationOn(rt(a("source")), a("salt"))),
    Op("canonical_select", "elect one representative per dup group (d9)",
      Seq(src("documents"),
        p("min_sim", "0.25", "near-dup similarity floor")),
      (_, rt, a) => Dedup.canonicalSelectOn(rt(a("source")), a("min_sim").toDouble)),
    Op("semantic_dedup", "embedding-cluster near-dup pairs over the IVF index (d10)",
      Seq(req("dir", "corpus data directory (holds the IVF index)"),
        p("threshold", "0.4", "minimum cosine similarity")),
      (s, _, a) => Similarity.semanticDedup(s, a("dir"), a("threshold").toDouble)),
    Op("paragraph_dedup", "paragraph-level exact dedup (d11)",
      Seq(src("documents")),
      (_, rt, a) => Dedup.paragraphDedupOn(rt(a("source")))),
    Op("winnow_dups", "winnowing fingerprint matches, Schleimer et al. 2003 (d12)",
      Seq(src("documents"),
        p("min_shared", "2", "minimum shared fingerprints"),
        p("max_df", Dedup.MaxShingleDf.toString, "fingerprint posting-list cap")),
      (_, rt, a) => Dedup.winnowDupsOn(rt(a("source")),
        a("min_shared").toLong, a("max_df").toInt)),
    Op("span_minhash", "span-level MinHash near-dup detection (d13)",
      Seq(src("documents"),
        p("min_eq", (Dedup.NumHashes / 2).toString, "minimum equal signature components"),
        p("max_bucket", Dedup.MaxBandBucket.toString, "band-bucket size cap")),
      (_, rt, a) => Dedup.spanMinhashDupsOn(rt(a("source")),
        a("min_eq").toInt, a("max_bucket").toInt)),
    Op("ann_lsh", "ANN top-k via hyperplane-LSH bucket (s2)",
      Seq(src("embeddings"), p("qid", "0", "query vec_id"),
        p("k", "10", "result count")),
      (_, rt, a) => Similarity.annLshOn(rt(a("source")),
        a("qid").toLong, a("k").toInt)),
    Op("lsh_buckets", "LSH bucket occupancy stats (s3)",
      Seq(src("embeddings")),
      (_, rt, a) => Similarity.lshBucketStatsOn(rt(a("source")))),
    Op("ann_multiprobe", "multi-probe LSH ANN top-k (s5)",
      Seq(src("embeddings"), p("qid", "0", "query vec_id"),
        p("k", "10", "result count")),
      (_, rt, a) => Similarity.annMultiProbeOn(rt(a("source")),
        a("qid").toLong, a("k").toInt)),
    Op("batch_knn", "batch kNN join: query set vs corpus in one bucket join (s6)",
      Seq(src("embeddings"), p("n_queries", "8", "query vector count"),
        p("k", "5", "neighbors per query")),
      (_, rt, a) => Similarity.batchKnnOn(rt(a("source")),
        a("n_queries").toInt, a("k").toInt)),
    Op("ivf_batch_knn", "batch kNN over the materialized IVF index (s7)",
      Seq(req("dir", "corpus data directory (holds the IVF index)"),
        p("n_queries", "8", "query vector count"),
        p("k", "5", "neighbors per query")),
      (s, _, a) => Similarity.ivfBatchKnn(s, a("dir"),
        a("n_queries").toInt, a("k").toInt)),
    Op("pq_topk", "product-quantized ADC top-k (s8)",
      Seq(req("dir", "corpus data directory"),
        p("qid", "0", "query vec_id"), p("k", "10", "result count")),
      (s, _, a) => Similarity.pqTopK(s, a("dir"), a("qid").toLong, a("k").toInt)),
    Op("pq_rerank", "PQ candidates re-ranked by exact cosine (s9)",
      Seq(req("dir", "corpus data directory"),
        p("qid", "0", "query vec_id"), p("k", "10", "result count"),
        p("candidates", "50", "stage-1 candidate count")),
      (s, _, a) => Similarity.pqRerank(s, a("dir"), a("qid").toLong,
        a("k").toInt, a("candidates").toInt)),
    Op("sq_topk", "scalar-quantized top-k (s10)",
      Seq(src("embeddings"), p("qid", "0", "query vec_id"),
        p("k", "10", "result count")),
      (_, rt, a) => Similarity.sqTopKOn(rt(a("source")),
        a("qid").toLong, a("k").toInt)),
    Op("ivfpq_topk", "IVF-pruned product-quantized top-k (s11)",
      Seq(req("dir", "corpus data directory (holds the IVF index)"),
        p("qid", "0", "query vec_id"), p("k", "10", "result count")),
      (s, _, a) => Similarity.ivfPqTopK(s, a("dir"), a("qid").toLong, a("k").toInt)),
    Op("token_stats", "per-document token/char counts (t1)",
      Seq(src("documents")),
      (_, rt, a) => TextOps.tokenStatsOn(rt(a("source")))),
    Op("fingerprint", "normalized content fingerprint (t4)",
      Seq(src("documents")),
      (_, rt, a) => TextOps.fingerprintOn(rt(a("source")))),
    Op("bpe_tokens", "BPE model-token counts, canned merge table (t10)",
      Seq(src("documents")),
      (_, rt, a) => TextOps.bpeTokenCountsOn(rt(a("source")))),
    Op("learned_tokens", "token counts under a vocabulary learned from the source (t19)",
      Seq(src("documents"),
        p("rounds", TextOps.BpeLearnRounds.toString, "merge rounds to learn")),
      (_, rt, a) => TextOps.bpeLearnedTokensOn(rt(a("source")), a("rounds").toInt)),
    Op("corpus_card", "per-(lang, source) dataset-release summary (t15)",
      Seq(src("documents")),
      (_, rt, a) => TextOps.corpusCardOn(rt(a("source"))))
  ).map(o => o.name -> o).toMap
}
