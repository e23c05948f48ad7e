package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregates over LOW-CARDINALITY partition keys.
  *
  * `Window.partitionBy(lang).orderBy(...)` executes each group in ONE
  * task — for a per-language corpus operator (token budgets, sequence
  * packing, per-language sampling) that is one task sorting an entire
  * language's documents at any cluster size, the same inherent bound
  * the exact-percentile query had before its range-partitioned
  * selection rewrite ([[CoreQueries.q30Percentiles]]).
  *
  * The fix is the textbook two-level scan: `repartitionByRange` over
  * (part, order...) spreads each group across ALL shuffle partitions
  * in sorted partition order, a tiny per-(partition, group) aggregate
  * turns into per-partition global OFFSETS via a window over P×|g|
  * rows, each partition then ranks/sums only its own slice, and
  * global = offset + local. The range exchange is shared by the
  * offset and main branches (ReuseExchange), so the data is shuffled
  * once, plus one balanced (pid, part) exchange for the slice window —
  * every core sorts ~|data|/P rows whatever the group cardinality.
  *
  * All arithmetic is integer (LONG counts/sums), so results are
  * EXACTLY the rows the single-window form produces — the DuckDB
  * oracles of the converted operators are unchanged and still
  * hash-exact.
  */
object DistributedPrefix {

  private val Pid = "__dp_pid"

  private def parted(df: DataFrame, part: String, order: Seq[String]) =
    df.repartitionByRange((part +: order).map(col): _*)
      .withColumn(Pid, spark_partition_id())

  /** Per-partition-slice global offsets for `agg` of each (pid, part)
    * cell: offset = total of all EARLIER partitions' cells of the
    * same group. P×|groups| rows — broadcast-sized at any data size. */
  private def offsets(p: DataFrame, part: String, cell: Column): DataFrame = {
    val wo = Window.partitionBy(col(part)).orderBy(col(Pid))
    p.groupBy(col(Pid), col(part)).agg(cell.as("__dp_c"))
      .withColumn("__dp_off",
        coalesce(sum(col("__dp_c")).over(wo), lit(0L)) - col("__dp_c"))
      .select(col(Pid), col(part), col("__dp_off"))
  }

  /** `out` = sum of `value` over all rows STRICTLY BEFORE this row in
    * (order...) order within its `part` group — the running-budget
    * frame (`ROWS UNBOUNDED PRECEDING AND 1 PRECEDING`), distributed. */
  def sumBefore(df: DataFrame, part: String, order: Seq[String],
                value: String, out: String): DataFrame = {
    val p = parted(df, part, order)
    val off = offsets(p, part, sum(col(value)))
    val wl = Window.partitionBy(col(Pid), col(part))
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    p.withColumn("__dp_local", coalesce(sum(col(value)).over(wl), lit(0L)))
      .join(broadcast(off), Seq(Pid, part))
      .withColumn(out, col("__dp_off") + col("__dp_local"))
      .select((df.columns :+ out).map(col): _*)
  }

  /** `out` = 1-based row_number() in (order...) order within its
    * `part` group, distributed. */
  def rowNumber(df: DataFrame, part: String, order: Seq[String],
                out: String): DataFrame = {
    val p = parted(df, part, order)
    val off = offsets(p, part, count(lit(1)))
    val wl = Window.partitionBy(col(Pid), col(part))
      .orderBy(order.map(col): _*)
    p.withColumn("__dp_local", row_number().over(wl).cast("long"))
      .join(broadcast(off), Seq(Pid, part))
      .withColumn(out, col("__dp_off") + col("__dp_local"))
      .select((df.columns :+ out).map(col): _*)
  }

  /** ADVANCED primitive for derived window functions: the range-split
    * slices with their bookkeeping EXPOSED, so a caller can rebuild
    * rank-family functions (ntile, percent_rank, cume_dist via
    * rank/n), frame lookups (nth_value via a rank-k broadcast) and
    * neighbor functions (lag/lead via slice-local shift + a
    * boundary-row broadcast) without any per-group global sort —
    * see [[CoreQueries.q35WindowSuite]] for the full worked set.
    *
    * Adds to `df`:
    *   - `pid`   — the range-split partition id of the row's slice
    *   - `local` — 1-based row_number within the (pid, part) slice
    *   - `cnt`   — the slice's row count
    *   - `rank`  — 1-based global row_number within the part group
    *   - `total` — the part group's total row count
    * The slice window orders by (order...); the same ordering must be
    * a total order (unique tiebreak) for `rank` to be deterministic. */
  def rankedSlices(df: DataFrame, part: String, order: Seq[String],
                   pid: String, local: String, cnt: String,
                   rank: String, total: String): DataFrame = {
    val p = parted(df, part, order)
    val wo = Window.partitionBy(col(part)).orderBy(col(Pid))
    val off = p.groupBy(col(Pid), col(part)).agg(count(lit(1)).as("__dp_c"))
      .withColumn("__dp_off",
        coalesce(sum(col("__dp_c")).over(wo), lit(0L)) - col("__dp_c"))
      .withColumn("__dp_n", sum(col("__dp_c")).over(
        Window.partitionBy(col(part))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col(Pid), col(part), col("__dp_c"), col("__dp_off"), col("__dp_n"))
    val wl = Window.partitionBy(col(Pid), col(part))
      .orderBy(order.map(col): _*)
    p.withColumn("__dp_local", row_number().over(wl).cast("long"))
      .join(broadcast(off), Seq(Pid, part))
      .withColumn(rank, col("__dp_off") + col("__dp_local"))
      .withColumnRenamed(Pid, pid)
      .withColumnRenamed("__dp_local", local)
      .withColumnRenamed("__dp_c", cnt)
      .withColumnRenamed("__dp_off", "__dp_drop_off")
      .withColumnRenamed("__dp_n", total)
      .drop("__dp_drop_off")
  }
}
