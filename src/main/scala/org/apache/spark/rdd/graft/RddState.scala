package org.apache.spark.rdd.graft

import org.apache.spark.rdd.RDD

/** Whether an RDD was MARKED for local checkpointing — true from the
  * `localCheckpoint()` call onward, i.e. BEFORE the first
  * materialization, when `isCheckpointed` still reports false
  * (ADVICE r16: an unpersist sweep that only skips `isCheckpointed`
  * can destroy a lazily-marked RDD's promised checkpoint — the exact
  * CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND class the skip exists for). The
  * accessor is `private[rdd]`, hence this shim in the rdd package —
  * the same access trick as [[org.apache.spark.sql.graft.ListenerBus]].
  */
object RddState {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
