package graft.engine

import scala.jdk.CollectionConverters._

/** Driver-side parquet FOOTER statistics — the metadata the
  * index-aware COMPACT TABLE uses to decide whether an
  * at-or-above-target file's key range overlaps the small-file span
  * it is rewriting (global range-disjointness across mixed-size
  * compaction; see `Engine.overlappingAtTarget`).
  *
  * Why footers and not a scan: per-file min/max via a Spark
  * aggregation would read the index column of every large file —
  * O(column bytes), real money at 100 TB. A footer read is an O(KB)
  * metadata round trip per file, the same cost class as the file
  * listing itself, so the neighbor-overlap check adds nothing
  * observable to COMPACT's bill.
  */
private[engine] object ParquetStats {

  /** [min, max] of `column` across the file's populated row groups,
    * as parquet's own Comparable statistics values (the types agree
    * across files of one table, so compareTo between results is
    * well-defined). None when the file has no populated row group
    * with usable stats for the column, when the column holds only
    * nulls, or on any read error — callers treat None as "range
    * unknown, leave the file alone": results never depend on this
    * (parquet pruning is stats-based either way), only layout
    * quality does. */
  def footerRange(hadoopConf: org.apache.hadoop.conf.Configuration,
                  uri: String, column: String): Option[(Comparable[Any], Comparable[Any])] =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(uri), hadoopConf)
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val perBlock = rd.getFooter.getBlocks.asScala.filter(_.getRowCount > 0).map { b =>
          b.getColumns.asScala
            .find(_.getPath.toDotString.equalsIgnoreCase(column))
            .map(_.getStatistics).orNull
        }
        // A populated row group with absent stats makes the file's
        // range unknowable — bail to None rather than under-report.
        if (perBlock.isEmpty || perBlock.exists(s =>
            s == null || (!s.hasNonNullValue && s.getNumNulls == 0)))
          None
        else {
          val withValues = perBlock.filter(_.hasNonNullValue)
          if (withValues.isEmpty) None // all-null column: no range
          else {
            val mins = withValues.map(_.genericGetMin.asInstanceOf[Comparable[Any]])
            val maxs = withValues.map(_.genericGetMax.asInstanceOf[Comparable[Any]])
            Some((
              mins.reduce((a, b) => if (a.compareTo(b) <= 0) a else b),
              maxs.reduce((a, b) => if (a.compareTo(b) >= 0) a else b)))
          }
        }
      } finally rd.close()
    } catch { case _: Exception => None }
}
