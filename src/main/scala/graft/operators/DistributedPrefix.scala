package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregates over LOW-CARDINALITY partition keys.
  *
  * `Window.partitionBy(lang).orderBy(...)` executes each group in ONE
  * task — for a per-language corpus operator (token budgets, sequence
  * packing, per-language sampling) or a 3-value TPC-H group key
  * (q30's percentiles, q35's window suite) that is one task sorting
  * an entire group's data at any cluster size.
  *
  * The fix is the textbook two-level scan, with the slice id DERIVED
  * FROM THE ORDER KEY'S VALUE so that NO range partitioner (and no
  * sampling pass — range sampling re-executes the child plan, a
  * measured 2.6× slowdown when the child computes BPE token counts)
  * is ever involved:
  *
  *  - order keys led by the salted 60-bit PORTABLE HASH (uniform by
  *    construction) slice by the hash's top [[HashSliceBits]] bits;
  *  - POSITIVE DOUBLE order keys (prices, scores) slice by
  *    [[logSlice]] — `floor(log(v)·64)`, weakly monotone because
  *    `Math.log` is documented semi-monotonic, 64 slices per e-fold
  *    (~44 per octave) of value range.
  *
  * Slice-major order equals global order, so: a tiny per-(slice,
  * group) aggregate becomes global rank/sum OFFSETS through a window
  * over the ≤slices×|groups|-row table, each slice ranks/sums only
  * its own rows, and global = offset + local. The offsets join is
  * left to AQE: at sane group counts it broadcasts (plan-pinned in
  * the battery); with pathological |groups| (a 100k-shard t13) it
  * degrades to a shuffle join instead of an over-limit broadcast
  * collapse. ONE full-data
  * hash exchange on (slice, group) serves the offset aggregate and
  * the slice window alike (ReuseExchange, plan-pinned).
  *
  * All bookkeeping is integer (LONG counts/sums), so results are
  * EXACTLY the single-window rows — the converted operators' DuckDB
  * oracles are unchanged and still hash-exact.
  */
object DistributedPrefix {

  /** 2^12 hash slices bound a slice to corpus/4096 rows while the
    * offsets table stays broadcast-sized (≤ 4096×|groups| rows). */
  val HashSliceBits = 12

  /** Gate for the sliced plan: inputs whose OPTIMIZER-ESTIMATED size
    * (`optimizedPlan.stats.sizeInBytes` — file bytes scaled by the
    * projection's column-width ratio, no job run) is under this many
    * bytes take the plain single-window plan instead. At that size a
    * whole group fits ONE task comfortably and the slice machinery's
    * fixed cost (offsets aggregate + join, localCheckpoint) is pure
    * overhead — a measured few hundred ms per call at sf0.1. Results
    * are EXACTLY equal either way (the ordering is total); only the
    * physical shape differs, so the oracle contract is
    * branch-independent. Default-estimate inflation (joins multiply,
    * filters don't shrink) only ever errs toward the sliced branch —
    * the safe direction. Set to 0 to force slicing everywhere (the
    * plan-shape specs do), or raise it to keep small-cluster jobs on
    * the single-window plan longer. */
  val SmallInputBytesKey = "graft.prefix.smallInputBytes"
  val SmallInputBytesDefault: Long = 4L << 20

  private def isSmall(df: DataFrame): Boolean = {
    val thr = df.sparkSession.conf
      .get(SmallInputBytesKey, SmallInputBytesDefault.toString).toLong
    thr > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
  }

  /** The size gate, exposed for operators that carry their own
    * distributed shape next to a plain small-input one (q15's salted
    * two-stage top-k): same threshold, same conf key, so one knob
    * moves every gated plan together. */
  def isSmallInput(df: DataFrame): Boolean = isSmall(df)

  /** ONE exchange on (slice, part), then a lazy localCheckpoint so the
    * offset aggregate and the slice window read the SAME materialized
    * rows: the input projection — possibly expensive (BPE counts) —
    * computes once, and neither consumer re-shuffles (the checkpoint
    * preserves the hash partitioning). Optimizer-level ReuseExchange
    * cannot dedup the two branches here (column pruning diverges
    * their exchange subtrees — verified on the executed plan), and
    * the Engine's staging path already established the lazy
    * localCheckpoint pattern (Engine.scala DML staging): the RDD is
    * ContextCleaner-tracked and released when unreferenced.
    *
    * DISK-only storage, deliberately. The blocks outlive the query
    * (released on the next driver GC, not at query end), and
    * checkpoint blocks in the MEMORY tier squat the unified pool's
    * protected storage half until then — measured at sf10: a
    * memory-tier checkpoint here made every LATER query in the
    * session pay spill (q33's join: 5.5 s alone → 21.8 s after q30,
    * same JVM). Disk blocks cost zero execution memory, the
    * double-read rides the OS page cache, and a corpus-scale
    * side-materialization has no business pinned in executor memory
    * at 100 TB anyway. Measured cost at sf10: negative — q30 alone
    * 25.7 s memory-tier → 23.0 s disk, and the q30+q33 session total
    * 51.6 → 36.8 s. */
  private def shared(sliced: DataFrame, part: String,
                     sliceCol: String = "__dp_s"): DataFrame =
    sliced.repartition(col(sliceCol), col(part))
      // 2-replica storage: localCheckpoint truncates lineage, so an
      // un-replicated block lost with its executor would abort the
      // query instead of recomputing; one replica survives single
      // executor loss (local mode: replication is a no-op)
      .localCheckpoint(eager = false,
        org.apache.spark.storage.StorageLevel.DISK_ONLY_2)

  /** Input frame the offset aggregate and the slice window both read.
    *
    * `recomputeInput = true` skips the checkpoint and lets each branch
    * recompute the input from source — the right trade when the input
    * is a narrow scan projection (q30: two parquet columns): the
    * offset aggregate then runs as a map-side partial aggregate on
    * the scan (its corpus-sized exchange disappears — only slice
    * counts shuffle) and the window branch keeps the one big
    * exchange, instead of materializing a corpus-scale checkpoint
    * that both branches must write and re-read. Only sound for
    * DETERMINISTIC inputs (both branches re-derive the rows; a
    * nondeterministic projection would diverge the slice counts from
    * the slice contents and corrupt every rank) — ENFORCED below, not
    * comment-only: an analyzed plan carrying a nondeterministic
    * expression (rand salts, fresh monotonically_increasing_id,
    * un-checkpointed sample) silently takes the CHECKPOINT path
    * instead, which is correct for every input because the rows
    * materialize once and both consumers read the same blocks. A
    * graceful downgrade rather than an exception, deliberately: the
    * operators above hardcode recomputeInput at their call sites
    * (q30's scan projection), so a facade user handing percentilesOn
    * a rand()-salted frame has no lever to flip — the correct-but-
    * slightly-slower plan is strictly better for them than an
    * unrecoverable error (DistributedPrefixSpec pins both the
    * downgrade's plan shape and the recompute branch's parity).
    * Default false: expensive projections (BPE token counts) pay the
    * checkpoint once rather than computing twice. */
  private def sharedOrRecompute(sliced: DataFrame, part: String,
                                sliceCol: String,
                                recomputeInput: Boolean): DataFrame =
    if (recomputeInput && isDeterministic(sliced)) sliced
    else shared(sliced, part, sliceCol)

  /** True iff recomputing the plan twice is guaranteed to yield the
    * same row SET — the recompute branch's soundness condition (two
    * recomputations that diverge would silently corrupt every rank,
    * so callers failing this check are downgraded to the checkpoint
    * path). Two distinct hazards are checked:
    *  - expression nondeterminism (rand salts, fresh
    *    monotonically_increasing_id);
    *  - plan-level SET nondeterminism: a LIMIT/TAIL above a shuffle
    *    (or a Sample) has all-deterministic expressions yet may keep
    *    a DIFFERENT subset of rows on each recomputation, because
    *    which rows arrive first is a race. Expressions alone would
    *    pass such a plan straight through the guard. */
  private def isDeterministic(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sample, Tail}
    df.queryExecution.analyzed.collectFirst {
      case p if !p.expressions.forall(_.deterministic) => p
      case p: GlobalLimit => p
      case p: LocalLimit  => p
      case p: Sample      => p
      case p: Tail        => p
    }.isEmpty
  }

  private def hashSlice(hashCol: String): Column =
    expr(s"$hashCol div ${1L << (60 - HashSliceBits)}")

  /** Order-preserving slice id for a POSITIVE double order key:
    * `floor(log(v)·64)` — 64 slices per e-fold (~44 per octave;
    * natural log), weakly monotone in
    * v (semi-monotonic log, exact positive-constant multiply, floor).
    * Ties share a slice; the slice window breaks them locally. */
  def logSlice(v: Column): Column =
    // NaN sorts LAST under Spark/DuckDB ascending order → top slice
    // (floor(NaN).cast(long) would otherwise land it in slice 0 and
    // silently corrupt ranks); negatives/zero collapse into the
    // MIN_NORMAL floor slice — balance degrades, order does not
    when(isnan(v), lit(Long.MaxValue)).otherwise(
      floor(log(greatest(v, lit(java.lang.Double.MIN_NORMAL))) * 64.0)
        .cast("long"))

  private def offsets(p: DataFrame, part: String, slice: String,
                      cell: Column): DataFrame = {
    val wo = Window.partitionBy(col(part)).orderBy(col(slice))
    // coalesce: a cell whose values are ALL NULL must contribute 0,
    // not NULL-poison every later slice's offset (the single-window
    // frame this replicates skips NULLs)
    p.groupBy(col(slice), col(part)).agg(coalesce(cell, lit(0L)).as("__dp_c"))
      .withColumn("__dp_off",
        coalesce(sum(col("__dp_c")).over(wo), lit(0L)) - col("__dp_c"))
      .select(col(slice), col(part), col("__dp_c"), col("__dp_off"))
  }

  /** `out` = sum of `value` over all rows STRICTLY BEFORE this row in
    * (hashCol, tie) order within its `part` group — the running-
    * budget frame, hash-bit-sliced.
    *
    * `recomputeInput = true` trades the shared checkpoint for
    * recomputing `df` in both internal branches — sound ONLY for a
    * deterministic `df`, and ENFORCED: a plan carrying a
    * nondeterministic expression silently downgrades to the
    * checkpoint path (correct for every input — rows materialize
    * once), since divergent recomputations would corrupt every
    * result and callers above this API often cannot flip the flag. */
  def sumBeforeHashOrdered(df: DataFrame, part: String, hashCol: String,
                           tie: String, value: String, out: String,
                           recomputeInput: Boolean = false): DataFrame = {
    if (isSmall(df)) {
      val w = Window.partitionBy(col(part)).orderBy(col(hashCol), col(tie))
        .rowsBetween(Window.unboundedPreceding, -1)
      return df.withColumn(out, coalesce(sum(col(value)).over(w), lit(0L)))
    }
    val p = sharedOrRecompute(
      df.withColumn("__dp_s", hashSlice(hashCol)), part, "__dp_s",
      recomputeInput)
    val off = offsets(p, part, "__dp_s", sum(col(value)))
      .drop("__dp_c")
    val wl = Window.partitionBy(col("__dp_s"), col(part))
      .orderBy(col(hashCol), col(tie))
      .rowsBetween(Window.unboundedPreceding, -1)
    p.withColumn("__dp_local", coalesce(sum(col(value)).over(wl), lit(0L)))
      .join(off, Seq("__dp_s", part))
      .withColumn(out, col("__dp_off") + col("__dp_local"))
      .select((df.columns :+ out).map(col): _*)
  }

  /** `out` = 1-based row_number() in (hashCol, tie) order within its
    * `part` group, hash-bit-sliced. `recomputeInput` carries the same
    * determinism contract as [[sumBeforeHashOrdered]] (enforced by
    * checkpoint downgrade). */
  def rowNumberHashOrdered(df: DataFrame, part: String, hashCol: String,
                           tie: String, out: String,
                           recomputeInput: Boolean = false): DataFrame = {
    if (isSmall(df)) {
      val w = Window.partitionBy(col(part)).orderBy(col(hashCol), col(tie))
      return df.withColumn(out, row_number().over(w).cast("long"))
    }
    val p = sharedOrRecompute(
      df.withColumn("__dp_s", hashSlice(hashCol)), part, "__dp_s",
      recomputeInput)
    val off = offsets(p, part, "__dp_s", count(lit(1))).drop("__dp_c")
    val wl = Window.partitionBy(col("__dp_s"), col(part))
      .orderBy(col(hashCol), col(tie))
    p.withColumn("__dp_local", row_number().over(wl).cast("long"))
      .join(off, Seq("__dp_s", part))
      .withColumn(out, col("__dp_off") + col("__dp_local"))
      .select((df.columns :+ out).map(col): _*)
  }

  /** ADVANCED primitive for derived window functions: the slices with
    * their bookkeeping EXPOSED, so a caller can rebuild rank-family
    * functions (ntile, percent_rank, cume_dist via rank/n), frame
    * lookups (nth_value via a rank-k broadcast) and neighbor
    * functions (lag/lead via slice-local shift + a boundary-row
    * broadcast) without any per-group global sort — see
    * [[CoreQueries.q30Percentiles]] (rank selection) and
    * [[CoreQueries.q35WindowSuite]] (the full worked set).
    *
    * `slice` must be weakly monotone in the leading order key
    * ([[logSlice]] for positive doubles). Adds to `df`:
    *   - `sliceCol` — the row's slice id
    *   - `local`    — 1-based row_number within the (slice, part) slice
    *   - `cnt`      — the slice's row count
    *   - `rank`     — 1-based global row_number within the part group
    *   - `total`    — the part group's total row count
    *
    * `recomputeInput` carries the same determinism contract as
    * [[sumBeforeHashOrdered]] (enforced by checkpoint downgrade). */
  def rankedSlices(df: DataFrame, part: String, order: Seq[Column],
                   slice: Column, sliceCol: String, local: String,
                   cnt: String, rank: String, total: String,
                   recomputeInput: Boolean = false): DataFrame = {
    if (isSmall(df)) {
      // Degenerate one-slice form: the whole group is slice 0, so
      // local == rank and cnt == total — every consumer identity
      // (boundary rows, loc==1/loc==cnt edges) holds unchanged.
      val w = Window.partitionBy(col(part)).orderBy(order: _*)
      val wp = Window.partitionBy(col(part))
      return df.withColumn(sliceCol, lit(0L))
        .withColumn(rank, row_number().over(w).cast("long"))
        .withColumn(local, col(rank))
        .withColumn(total, count(lit(1)).over(wp))
        .withColumn(cnt, col(total))
    }
    val p = sharedOrRecompute(df.withColumn(sliceCol, slice), part,
      sliceCol, recomputeInput)
    val off = offsets(p, part, sliceCol, count(lit(1)))
      .withColumn("__dp_n", sum(col("__dp_c")).over(
        Window.partitionBy(col(part))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val wl = Window.partitionBy(col(sliceCol), col(part)).orderBy(order: _*)
    p.withColumn("__dp_local", row_number().over(wl).cast("long"))
      .join(off, Seq(sliceCol, part))
      .withColumn(rank, col("__dp_off") + col("__dp_local"))
      .withColumnRenamed("__dp_local", local)
      .withColumnRenamed("__dp_c", cnt)
      .withColumnRenamed("__dp_n", total)
      .drop("__dp_off")
  }
}
