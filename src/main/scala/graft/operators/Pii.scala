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

  private def piiFrame(src: DataFrame, id: Column, text: Column): DataFrame =
    src.select(
      id.as("doc_id"),
      regexp_count(text, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(text, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(text, lit(PhoneRe)).cast("long").as("n_phones"),
      md5(redact(text)).as("redacted_md5"))

  /** p1: PII scan over the documents corpus. The synthetic corpus is
    * PII-free word prose, so every count is 0 and redacted_md5 equals
    * md5(text) — which is exactly what the oracle hash pins: the
    * patterns produce NO false positives over 500 docs of natural
    * text, and the md5 proves the redactor leaves clean text
    * byte-identical. Positive-match coverage lives in p2 (oracle,
    * constructed PII) and PiiSpec (crafted edge cases). */
  def piiScan(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    piiFrame(docs, col("doc_id"), col("text"))
  }

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
}
