package graft.operators

import graft.SparkFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Positive-match coverage for the PII detector/redactor. The p1
  * battery entry proves no-false-positives over natural prose and
  * byte-identical pass-through; p2 proves engine agreement on
  * constructed PII; this spec pins the DETECTION semantics on
  * crafted edge cases the corpus can't contain. */
class PiiSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private val dir = SparkFixture.Sf0001

  private def redactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Pii.redact(col("t"))).head().getString(0)
  }

  test("emails, IPs and phones are each detected and redacted") {
    assert(redactOne("mail a.b+c@ex-1.co or x@y.io now") ==
      "mail <EMAIL> or <EMAIL> now")
    assert(redactOne("ping 10.0.255.1 and 1.2.3.4.") ==
      "ping <IP> and <IP>.")
    assert(redactOne("call 555-123-4567 or 555.111.2222") ==
      "call <PHONE> or <PHONE>")
  }

  test("mixed text redacts in email -> IP -> phone order") {
    assert(redactOne("u9@h.example.com from 1.2.3.4 call 800-555-0100") ==
      "<EMAIL> from <IP> call <PHONE>")
  }

  test("near-misses survive: bare @, short TLD, decimals, 5-digit runs") {
    for (s <- Seq("a@b no tld", "version 1.2 and 3.4", "zip 12345-6789",
                  "ratio 1.5 of 3", "at 12.34.56 sharp"))
      assert(redactOne(s) == s, s"false positive on: $s")
  }

  test("structural recall: out-of-range IPv4 shape still redacts") {
    assert(redactOne("odd 999.999.999.999 addr") == "odd <IP> addr")
  }

  test("NULL text yields NULL counts and a NULL digest (prefilter preserves NULL propagation)") {
    // pii_scan is a public facade over arbitrary frames (source = ...),
    // so nullable text must behave exactly like the unfiltered
    // regexp_count chain and the DuckDB oracle: NULL in, NULL out —
    // the candidate prefilter may not coerce the counts to 0.
    import spark.implicits._
    val src = Seq((1L, null: String), (2L, "mail x@y.io now"), (3L, "clean prose"))
      .toDF("doc_id", "text")
    val rows = Pii.piiColumns(src).orderBy("doc_id").collect()
    val nullRow = rows(0)
    for (i <- 1 to 4)
      assert(nullRow.isNullAt(i), s"NULL text must yield NULL in field $i, got ${nullRow.get(i)}")
    assert(rows(1).getLong(1) == 1L && rows(1).getString(4) != null)
    assert(rows(2).getLong(1) == 0L && rows(2).getLong(2) == 0L && rows(2).getLong(3) == 0L)
  }

  test("p2 constructed rows all carry exactly one of each PII class") {
    val agg = Pii.piiPositive(spark, dir)
      .agg(min("n_emails"), max("n_emails"), min("n_ips"), max("n_ips"),
        min("n_phones"), max("n_phones"), count(lit(1)))
      .head()
    assert(agg.getLong(6) > 0)
    for (i <- 0 until 6)
      assert(agg.getLong(i) == 1L, s"field $i expected exactly 1 match per row")
  }

  test("p1 over the prose corpus: zero matches, text byte-identical") {
    val joined = Pii.piiScan(spark, dir)
      .join(graft.Tables.t(spark, dir, "documents"), "doc_id")
    val bad = joined.filter(
      col("n_emails") =!= 0 || col("n_ips") =!= 0 || col("n_phones") =!= 0 ||
        col("redacted_md5") =!= md5(col("text"))).count()
    assert(bad == 0L)
  }

  private def ccRedactOne(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Pii.ccRedact(col("t"))).head().getString(0)
  }

  test("p3: Luhn-valid PANs redact in all separator formats") {
    // 4539148803436467 is Luhn-valid (classic test PAN shape).
    assert(ccRedactOne("pay 4539148803436467 now") == "pay <CC> now")
    assert(ccRedactOne("pay 4539-1488-0343-6467 now") == "pay <CC> now")
    assert(ccRedactOne("pay 4539 1488 0343 6467 now") == "pay <CC> now")
  }

  test("p3: checksum-failing 16-digit runs survive untouched") {
    for (s <- Seq("ref 4539148803436468 id", "ref 1234-5678-9012-3456 id",
                  "run 0000111122223333 x"))
      assert(ccRedactOne(s) == s, s"false positive on: $s")
  }

  test("p3: shorter/longer digit runs are not candidates") {
    for (s <- Seq("id 453914880343646 x", "id 45391488034364679 x",
                  "tel 555-123-4567 x"))
      assert(ccRedactOne(s) == s, s"non-PAN shape matched: $s")
  }

  test("p3 constructed rows: 2 candidates, exactly 1 valid, every row") {
    val agg = Pii.ccScrub(spark, dir)
      .agg(min("n_candidates"), max("n_candidates"),
        min("n_valid"), max("n_valid"), count(lit(1)))
      .head()
    assert(agg.getLong(4) > 0)
    assert(agg.getLong(0) == 2L && agg.getLong(1) == 2L)
    assert(agg.getLong(2) == 1L && agg.getLong(3) == 1L)
  }
}
