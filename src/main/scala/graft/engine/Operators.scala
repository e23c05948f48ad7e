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
      (s, _, a) => Similarity.ivfTopK(s, a("dir"), a("qid").toLong, a("k").toInt))
  ).map(o => o.name -> o).toMap
}
