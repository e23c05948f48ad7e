package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** CSV schema inference with the reference's policy
  * (/root/reference/src/databases/csv/discern.rs:15-96):
  *  - header row detected iff NO first-row cell parses as a
  *    non-string (number/bool) — a numeric first row means data;
  *  - per column, sample up to `sampleRows` rows; the column's type is
  *    the unanimous sampled type, else Any (string). Spark's own
  *    inference is more eager (promotes mixed int/str to string per
  *    value at read); this mirrors the reference exactly.
  */
object CsvInference {

  final case class Inferred(hasHeader: Boolean, columns: Seq[ColumnMeta])

  private def isBool(s: String) =
    s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false")
  private def isLong(s: String) = s.nonEmpty && scala.util.Try(s.toLong).isSuccess
  private def isDouble(s: String) = s.nonEmpty && scala.util.Try(s.toDouble).isSuccess

  def infer(spark: SparkSession, path: String, sampleRows: Int = 100): Inferred = {
    // All-string read: inference decisions are ours, not Spark's.
    val raw = spark.read
      .option("header", "false")
      .option("inferSchema", "false")
      .csv(path)
    val sample = raw.limit(sampleRows + 1).collect()
      .map(_.toSeq.map(v => Option(v).map(_.toString).getOrElse("")))
    if (sample.isEmpty)
      throw new EngineException(s"empty CSV: $path")
    inferFromRows(sample.toIndexedSeq, sampleRows)
  }

  /** Shared policy core, also used by the XLSX mount: header detect on
    * the first row, unanimous type per column over the sample. */
  def inferFromRows(sample: Seq[Seq[String]], sampleRows: Int = 100): Inferred = {
    val first = sample.head
    val hasHeader = !first.exists(c => isBool(c) || isLong(c) || isDouble(c))
    val names =
      if (hasHeader) first.map(_.trim)
      else first.indices.map(i => s"column_$i")
    val dataRows = (if (hasHeader) sample.tail else sample).take(sampleRows)

    val columns = names.zipWithIndex.map { case (name, i) =>
      val cells = dataRows.map(r => if (i < r.length) r(i) else "").filter(_.nonEmpty)
      val dt: DataType =
        if (cells.isEmpty) StringType
        else if (cells.forall(isBool)) BooleanType
        else if (cells.forall(isLong)) LongType
        else if (cells.forall(isDouble)) DoubleType
        else StringType
      ColumnMeta(name, dt)
    }
    Inferred(hasHeader, columns.toSeq)
  }
}
