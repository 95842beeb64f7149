package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Borrow-don't-own discipline for TRANSIENT persists.
  *
  * Spark's CacheManager dedups cache entries by canonicalized plan:
  * `df.persist()` on a plan that is already cached is a no-op, and
  * `df.unpersist()` removes the SHARED entry — whoever created it.
  * That is exactly the dedup the QueryDef cache contract relies on
  * (model.scala), and exactly what makes a naive
  * `persist(); try ... finally unpersist()` pair destructive in a
  * long-lived session: a training pass whose working frame happens to
  * canonicalize equal to a plan some earlier query persisted as a
  * session memo (e.g. AnnIndex.build's identity-at-small-n training
  * sample ≡ the `emb` frame sim_ann holds) silently evicts that
  * memo's entry. The next consumer recomputes — a cache-discipline
  * break the CacheHygieneSpec contract forbids, even though results
  * stay correct.
  *
  * [[borrowCached]] makes the pair non-destructive: it persists only
  * when the plan is NOT already cached (checked via the public
  * `Dataset.storageLevel`, which consults the CacheManager by
  * canonicalized plan) and unpersists only what it persisted. A frame
  * that aliases a live memo entry is BORROWED — used in place, left
  * cached for its owner.
  *
  * Single-writer caveat (documented, not locked): between the
  * storage-level probe and the persist another thread could cache the
  * same plan, making `owned` stale. Registry builds and trainings run
  * one-at-a-time per session (the Bench/Verify/spec harnesses), and
  * the worst case is the pre-fix behavior, never corruption. */
object TransientCache {

  /** Run `f` with `df` cached, persisting and unpersisting ONLY if the
    * plan was not already cached by someone else. Returns `f`'s value. */
  def borrowCached[T](df: DataFrame)(f: => T): T = {
    val owned = df.storageLevel == StorageLevel.NONE
    if (owned) df.persist()
    try f
    finally if (owned) df.unpersist()
  }
}
