package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo persists (the QueryDef cache contract) with a
  * conf-selectable storage level.
  *
  * Default MEMORY_AND_DISK — byte-identical to bare `.persist()`, so
  * the bench/driver envelope is unchanged unless the conf is set.
  *
  * Why the knob exists (round 13, 32-thread variance investigation):
  * deserialized cache blocks are live object graphs on the driver-JVM
  * heap; in `local[32]` every re-materialization (the bench clears the
  * cache before each timed pass) allocates them across 32 threads at
  * once, and the old-gen churn from the PREVIOUS pass's dropped blocks
  * is collected DURING the next timed pass — GC pressure that shows up
  * as multi-x wall-clock spikes on whichever query is running when the
  * collector runs (guide §5). MEMORY_AND_DISK_SER stores one compact
  * byte buffer per block instead (more CPU per read, far less heap),
  * the standard trade for corpus-sized caches at production scale.
  */
object Memo {
  val LevelKey = "spark.graft.memoStorageLevel"

  def level(df: DataFrame): StorageLevel =
    StorageLevel.fromString(df.sparkSession.conf.get(LevelKey, "MEMORY_AND_DISK"))

  implicit class MemoOps(private val df: DataFrame) extends AnyVal {
    /** `persist()` at the session-configured memo storage level. */
    def memo(): DataFrame = df.persist(Memo.level(df))
  }
}
