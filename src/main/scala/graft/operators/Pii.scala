package graft.operators

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub stage every public-corpus
  * training pipeline runs before anything else touches the text
  * (emails, IPv4 addresses, phone numbers → typed placeholder
  * tokens). The reference engine has no equivalent; this is
  * LLM-pipeline extension surface, same tier as TextOps.
  *
  * Plan shape: a single narrow projection of codegen'd
  * `regexp_count` / `regexp_replace` expressions — zero shuffle, zero
  * UDFs, embarrassingly parallel at 100 TB, and the scan prunes to
  * (doc_id, text). The battery output carries `md5(redacted)` rather
  * than the redacted text so the correctness gate doesn't ship
  * corpus-sized strings; callers wanting the text use `redact` on
  * any string column directly.
  *
  * Pattern language is the intersection of Java regex (Spark) and
  * RE2 (DuckDB oracle): character classes, bounded quantifiers,
  * non-capturing groups, `\b` — no backrefs, no lookaround. Patterns
  * are STRUCTURAL (an IPv4 "shape" like 999.999.999.999 still
  * redacts): recall over precision, the standard scrub trade.
  *
  * Redaction order is fixed (email → IP → phone) and identical in
  * both engines; email first so a digits-in-local-part address is
  * consumed whole before the narrower numeric patterns see its
  * fragments.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Redact all three PII classes from a string column, in the fixed
    * email → IP → phone order. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))

  /** The p1 scan as a reusable transform over ANY (doc_id, text)
    * frame — batch or STREAMING: the scrub is a pure narrow
    * projection with no aggregation state, so the same code serves
    * the ingest path in append mode (StreamingSpec pins set-equality
    * with batch p1 on the corpus stream). */
  def piiColumns(src: DataFrame): DataFrame =
    piiFrame(src, col("doc_id"), col("text"))

  private def piiFrame(src: DataFrame, id: Column, text: Column): DataFrame = {
    // Candidate prefilter — NECESSARY condition for any pattern:
    // email needs '@', IPv4/phone need digits (and an email's
    // local-part digits still ride with its '@'). CASE short-circuits
    // in codegen, so a clean document pays one contains + one
    // first-digit probe instead of six full regex passes — the
    // standard scrub-stage shape (cheap prefilter before the
    // expensive automaton), and most prose is clean. Semantics are
    // IDENTICAL across all three cases (PiiSpec pins each, the
    // p1/p2 oracles pin the first two): candidate → full regex
    // chain; non-candidate non-NULL → 0 counts + untouched text
    // (what the chain would return); NULL text → NULL counts + NULL
    // digest (regexp_count is null-propagating, so the second WHEN's
    // missing-otherwise NULL matches the unfiltered chain and the
    // DuckDB oracle exactly).
    val cand = text.contains("@") || text.rlike("[0-9]")
    def counted(re: String): Column =
      when(cand, regexp_count(text, lit(re)).cast("long"))
        .when(text.isNotNull, lit(0L))
    src.select(
      id.as("doc_id"),
      counted(EmailRe).as("n_emails"),
      counted(Ipv4Re).as("n_ips"),
      counted(PhoneRe).as("n_phones"),
      md5(when(cand, redact(text)).otherwise(text)).as("redacted_md5"))
  }

  /** p1: PII scan over the documents corpus. The synthetic corpus is
    * PII-free word prose, so every count is 0 and redacted_md5 equals
    * md5(text) — which is exactly what the oracle hash pins: the
    * patterns produce NO false positives over 500 docs of natural
    * text, and the md5 proves the redactor leaves clean text
    * byte-identical. Positive-match coverage lives in p2 (oracle,
    * constructed PII) and PiiSpec (crafted edge cases). */
  def piiScan(spark: SparkSession, dir: String): DataFrame =
    piiScanOn(t(spark, dir, "documents"))

  /** Source-parameterized form (SQL facade: `EXECUTE OPERATOR
    * pii_scan(source = …)`). */
  def piiScanOn(docs: DataFrame): DataFrame =
    piiFrame(docs, col("doc_id"), col("text"))

  val piiScanOracleSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM documents""".stripMargin

  /** p2: positive-match PII coverage with the SAME detector, over
    * text CONSTRUCTED deterministically from lineitem's numeric
    * columns (no synthesized inputs — both engines derive identical
    * strings from the shared parquet, then must agree on every count
    * and on the redacted bytes). Each row embeds one email, one IPv4
    * and one phone built from (l_orderkey, l_partkey, l_suppkey,
    * l_linenumber), plus prose that must NOT match. */
  def piiPositive(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 1000)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"))
    val text = concat(
      lit("order note: contact u"), col("l_orderkey"),
      lit("@host"), pmod(col("l_partkey"), lit(10)), lit(".example.com from "),
      pmod(col("l_partkey"), lit(256)), lit("."), pmod(col("l_suppkey"), lit(256)),
      lit("."), pmod(col("l_orderkey"), lit(256)), lit("."), pmod(col("l_linenumber"), lit(256)),
      lit(" or call "), lpad(pmod(col("l_orderkey"), lit(1000)).cast("string"), 3, "0"),
      lit("-"), lpad(pmod(col("l_partkey"), lit(1000)).cast("string"), 3, "0"),
      lit("-"), lpad(pmod(col("l_suppkey"), lit(10000)).cast("string"), 4, "0"),
      lit(" re item 1.5 of 3"))
    piiFrame(
      li.withColumn("txt", text),
      concat_ws("-", col("l_orderkey"), col("l_linenumber")),
      col("txt"))
  }

  val piiPositiveOracleSql: String =
    s"""WITH src AS (
       |  SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       |    'order note: contact u' || l_orderkey || '@host' || (l_partkey % 10)
       |      || '.example.com from '
       |      || (l_partkey % 256) || '.' || (l_suppkey % 256) || '.'
       |      || (l_orderkey % 256) || '.' || (l_linenumber % 256)
       |      || ' or call ' || lpad(CAST(l_orderkey % 1000 AS VARCHAR), 3, '0')
       |      || '-' || lpad(CAST(l_partkey % 1000 AS VARCHAR), 3, '0')
       |      || '-' || lpad(CAST(l_suppkey % 10000 AS VARCHAR), 4, '0')
       |      || ' re item 1.5 of 3' AS txt
       |  FROM lineitem WHERE l_orderkey <= 1000)
       |SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS doc_id,
       |  CAST(len(regexp_extract_all(txt, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(txt, '$Ipv4Re')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(txt, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(regexp_replace(regexp_replace(regexp_replace(txt,
       |    '$EmailRe', '<EMAIL>', 'g'),
       |    '$Ipv4Re', '<IP>', 'g'),
       |    '$PhoneRe', '<PHONE>', 'g')) AS redacted_md5
       |FROM src""".stripMargin

  // ---------------------------------------------------------------- p3

  /** Credit-card (PAN) candidate shape: four groups of four digits
    * with optional single `-`/space separators. Pure regex
    * over-matches (any 16-digit run); p3's point is the CHECKSUM
    * step regex cannot express. */
  val CcRe = "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b"

  /** Luhn checksum of a digits-only string: from the rightmost digit,
    * every second digit is doubled (minus 9 when the double exceeds
    * 9); a real PAN sums to 0 mod 10. Expressed as a higher-order
    * `aggregate` over the character positions — a native Catalyst
    * expression tree, no UDF, evaluated row-local with zero shuffle. */
  private def luhnSum(ds: Column): Column =
    aggregate(
      sequence(lit(1), length(ds)),
      lit(0),
      (acc, i) => {
        val d = ds.substr(i, lit(1)).cast("int")
        val dbl = d * lit(2)
        val dblAdj = when(dbl > 9, dbl - 9).otherwise(dbl)
        acc + when(((length(ds) - i) % 2) === 1, dblAdj).otherwise(d)
      })

  def luhnValid(candidate: Column): Column =
    luhnSum(regexp_replace(candidate, lit("[- ]"), lit(""))) % 10 === 0

  /** Replace every Luhn-valid PAN candidate in a string column with
    * `<CC>`; candidates that fail the checksum are left untouched. */
  def ccRedact(text: Column): Column =
    aggregate(
      filter(regexp_extract_all(text, lit(CcRe), lit(0)), c => luhnValid(c)),
      text,
      (acc, c) => replace(acc, c, lit("<CC>")))

  /** p3: Luhn-validated credit-card detection and redaction — the
    * precision stage a pure-regex scrubber lacks. Candidates come
    * from [[CcRe]]; only candidates whose digits pass the Luhn
    * checksum are counted as PANs and replaced with `<CC>` (a random
    * 16-digit string survives untouched, so invoices/ids are not
    * mangled). Detection is validated POSITIVELY the p2 way: each
    * lineitem row deterministically yields one VALID card (check
    * digit computed by the same Luhn arithmetic in both engines) and
    * one INVALID near-miss (check digit shifted by 5, which can
    * never re-validate), so both engines must agree that
    * n_candidates = 2, n_valid = 1, and on every byte of the
    * redacted text.
    *
    * Plan shape: one narrow projection over the scan — candidate
    * extraction, per-candidate checksum, and the redaction fold are
    * all row-local array expressions. Zero shuffle, zero UDFs,
    * embarrassingly parallel at 100 TB. */
  def ccScrub(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 1000)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"))
    val pan15 = concat(
      lit("4"),
      lpad(pmod(col("l_orderkey"), lit(1000000)).cast("string"), 6, "0"),
      lpad(pmod(col("l_partkey"), lit(10000)).cast("string"), 4, "0"),
      lpad(pmod(col("l_suppkey"), lit(10000)).cast("string"), 4, "0"))
    // Check digit for position 16: append a zero so the generic sum
    // applies the 16-length doubling pattern to the first 15 digits.
    val check = pmod(lit(10) - luhnSum(concat(pan15, lit("0"))) % 10, lit(10))
    val valid16 = concat(pan15, check.cast("string"))
    val invalid16 = concat(pan15, pmod(check + 5, lit(10)).cast("string"))
    val validDashed = concat_ws("-",
      valid16.substr(1, 4), valid16.substr(5, 4),
      valid16.substr(9, 4), valid16.substr(13, 4))
    val text = concat(
      lit("invoice paid with card "), validDashed,
      lit(" declined fallback "), invalid16,
      lit(" total 118.50 ref "), col("l_orderkey"))
    val withTxt = li.withColumn("txt", text)
    val cands = regexp_extract_all(col("txt"), lit(CcRe), lit(0))
    withTxt.select(
      concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("doc_id"),
      size(cands).cast("long").as("n_candidates"),
      size(filter(cands, c => luhnValid(c))).cast("long").as("n_valid"),
      md5(ccRedact(col("txt"))).as("redacted_md5"))
  }

  /** DuckDB replay: same Luhn arithmetic via list lambdas; the
    * redaction fold is `list_reduce` seeded by prepending the text. */
  val ccScrubOracleSql: String = {
    def luhn(ds: String): String =
      s"""list_sum(list_transform(generate_series(1, len($ds)), i ->
         |  CASE WHEN (len($ds) - i) % 2 = 1
         |       THEN CASE WHEN 2*CAST(substr($ds,i,1) AS INT) > 9
         |                 THEN 2*CAST(substr($ds,i,1) AS INT) - 9
         |                 ELSE 2*CAST(substr($ds,i,1) AS INT) END
         |       ELSE CAST(substr($ds,i,1) AS INT) END))""".stripMargin
    s"""WITH base AS (
       |  SELECT l_orderkey, l_linenumber,
       |    '4' || lpad(CAST(l_orderkey % 1000000 AS VARCHAR), 6, '0')
       |        || lpad(CAST(l_partkey % 10000 AS VARCHAR), 4, '0')
       |        || lpad(CAST(l_suppkey % 10000 AS VARCHAR), 4, '0') AS pan15
       |  FROM lineitem WHERE l_orderkey <= 1000),
       |carded AS (
       |  SELECT l_orderkey, l_linenumber, pan15,
       |    (10 - ${luhn("(pan15 || '0')")} % 10) % 10 AS chk
       |  FROM base),
       |txts AS (
       |  SELECT l_orderkey, l_linenumber,
       |    'invoice paid with card '
       |      || substr(pan15 || chk, 1, 4) || '-' || substr(pan15 || chk, 5, 4)
       |      || '-' || substr(pan15 || chk, 9, 4) || '-' || substr(pan15 || chk, 13, 4)
       |      || ' declined fallback ' || pan15 || ((chk + 5) % 10)
       |      || ' total 118.50 ref ' || l_orderkey AS txt
       |  FROM carded),
       |scanned AS (
       |  SELECT l_orderkey, l_linenumber, txt,
       |    regexp_extract_all(txt, '$CcRe') AS cands
       |  FROM txts),
       |validated AS (
       |  SELECT l_orderkey, l_linenumber, txt, cands,
       |    list_filter(cands, c ->
       |      ${luhn("regexp_replace(c, '[- ]', '', 'g')")} % 10 = 0) AS valids
       |  FROM scanned)
       |SELECT
       |  CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS doc_id,
       |  CAST(len(cands) AS BIGINT) AS n_candidates,
       |  CAST(len(valids) AS BIGINT) AS n_valid,
       |  md5(list_reduce(list_prepend(txt, valids),
       |      (acc, c) -> replace(acc, c, '<CC>'))) AS redacted_md5
       |FROM validated""".stripMargin
  }
}
