package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.storage.RDDBlockId

/** Package-private escape hatch used ONLY by the executor-loss fault
  * witness (graft.engine.ProfileFault): the block-manager master's
  * replica map is the ground truth for "this checkpoint block really
  * has two executor replicas", and the public API doesn't expose it.
  * Same pattern as org.apache.spark.sql.graft.Shims — a read-only
  * peek, no behavior change. */
object FaultShims {

  /** Executor ids currently holding each cached block of `rddId`,
    * straight from the BlockManagerMaster (driver-side, authoritative
    * after a put/remove settles). */
  def blockExecutors(sc: SparkContext, rddId: Int, parts: Int): Map[Int, Seq[String]] =
    (0 until parts).map { p =>
      p -> sc.env.blockManager.master
        .getLocations(RDDBlockId(rddId, p)).map(_.executorId)
    }.toMap

  /** Registered non-driver executor ids, from the same source. */
  def liveExecutors(sc: SparkContext): Seq[String] =
    sc.env.blockManager.master.getStorageStatus
      .map(_.blockManagerId.executorId).filterNot(_ == "driver").toSeq
}
