package graft.engine

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The swap repair must be ERROR-STRICT (round-17 verdict task 2).
  *
  * `repairCompactSwap` decides roll-forward vs roll-back from "is
  * every staged file present?". With the lenient `exists` (errors →
  * false), a transient remote-FS blip during that check flipped a
  * roll-FORWARD state — where some originals are already deleted and
  * the staged files are the ONLY copy of their rows — into a
  * roll-BACK that deleted them: permanent row loss, on exactly the
  * remote filesystems where network blips are the normal failure
  * mode. This spec mounts a database on `flakyfs://` (a
  * RawLocalFileSystem wrapper whose `getFileStatus` can be armed to
  * throw once — see [[FlakyGraftFs]]), constructs the dangerous torn
  * state on disk (all staged renamed in, HALF the originals already
  * deleted), arms the fault on a staged file, and pins:
  *  1. the mutation ABORTS loudly (the injected error propagates),
  *  2. nothing was deleted — manifest and every staged file intact,
  *  3. a clean retry converges to exact row parity.
  */
class CompactRepairStrictSpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.session
  private lazy val g = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.flakyfs.impl", classOf[FlakyGraftFs].getName)
    val e = new Engine(spark)
    e.execute("DROP DATABASE IF EXISTS flk")
    val local = java.nio.file.Files.createTempDirectory("flk").toFile.getAbsolutePath
    e.execute(s"CREATE DATABASE flk LOCATION 'flakyfs://$local'")
    e
  }

  /** Local directory behind the flakyfs table (flakyfs maps paths
    * 1:1 onto local disk, so the torn state can be built with nio). */
  private def tdir(tbl: String): java.nio.file.Path = {
    val uri = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tbl, Some("flk"))).location
    java.nio.file.Paths.get(uri.getPath)
  }

  private def rowsOf(tbl: String): Seq[Seq[Any]] =
    spark.table(s"flk.$tbl").collect().map(_.toSeq).toSeq

  private def listNames(tbl: String): Set[String] = {
    val s = java.nio.file.Files.list(tdir(tbl))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toSet
    } finally s.close()
  }

  test("FS error during repair: abort, manifest stays, staged files survive; clean retry converges") {
    g.execute("CREATE TABLE flk.t (k INTEGER, v INTEGER)")
    for (i <- 0 until 4)
      g.execute(s"INSERT INTO flk.t SELECT id + ${i * 250}, (id * 3) % 41 FROM range(250)")
    val origRows = rowsOf("t").sortBy(_.mkString(","))
    import scala.jdk.CollectionConverters._
    val origFiles = listNames("t").filter(n => !n.startsWith(".") && !n.startsWith("_"))
    assert(origFiles.size >= 4)
    // Stage a full-table rewrite outside the table dir, then construct
    // the ROLL-FORWARD crash state: manifest written, ALL staged files
    // renamed in, HALF the originals already deleted — the staged
    // files are now the only copy of the deleted originals' rows.
    val stage = java.nio.file.Files.createTempDirectory("flk_stage")
    spark.table("flk.t").repartition(2).write.mode("overwrite").parquet(stage.toString)
    val stagedFiles = {
      val s = java.nio.file.Files.list(stage)
      try s.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        !n.startsWith(".") && !n.startsWith("_")
      }.toList finally s.close()
    }
    assert(stagedFiles.size == 2)
    val manifest = (stagedFiles.map(f => s"staged\t${f.getFileName}") ++
      origFiles.map(n => s"orig\t$n")).mkString("\n")
    java.nio.file.Files.write(tdir("t").resolve(Engine.SwapManifestName),
      manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    stagedFiles.foreach(f =>
      java.nio.file.Files.move(f, tdir("t").resolve(f.getFileName.toString)))
    origFiles.take(origFiles.size / 2).foreach(n =>
      java.nio.file.Files.delete(tdir("t").resolve(n)))
    spark.catalog.refreshTable("flk.t")
    val stagedNames = stagedFiles.map(_.getFileName.toString).toSet

    // Arm ONE transient stat failure on a staged file, then mutate:
    // the lenient repair would read exists=false → roll back → delete
    // the staged files → the half-deleted originals' rows are gone.
    FlakyGraftFs.failOnceOn = stagedNames.head
    val err = intercept[Exception](g.execute("UPDATE flk.t SET v = 0 WHERE k < 0"))
    assert(err.getMessage != null)
    val after = listNames("t")
    assert(after.contains(Engine.SwapManifestName),
      "the manifest must survive an aborted repair — it is the retry's evidence")
    assert(stagedNames.subsetOf(after),
      s"no staged file may be deleted on an FS error: $after")

    // Clean retry: the fault is disarmed; the repair rolls FORWARD.
    assert(FlakyGraftFs.failOnceOn == null, "the injected fault must have fired")
    val Payload.Update(n) = g.execute("UPDATE flk.t SET v = 0 WHERE k < 0"): @unchecked
    assert(n == 0L)
    spark.catalog.refreshTable("flk.t")
    assert(rowsOf("t").sortBy(_.mkString(",")) == origRows,
      "the healthy repair must converge to exact row parity")
    assert(!listNames("t").contains(Engine.SwapManifestName))
  }
}
