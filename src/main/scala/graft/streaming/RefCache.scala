package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Static-side reference frames for the admission streams
  * ([[StreamingClean]]/[[StreamingEmbed]]), cached once per index
  * GENERATION instead of once per invocation.
  *
  * The admission marker legs join every micro-batch against frames
  * derived from the certified index (banded signatures, SRP band
  * rows). Re-deriving those per batch would make admission O(corpus)
  * per batch; persisting them per INVOCATION (the round-6 shape) leaked
  * two cached frames per [[StreamingClean.batchVerdicts]] call in a
  * long-lived session (the nightly re-admission pass). This memo keys
  * the cache by (session, indexDir, index meta fingerprint) — the same
  * discipline as the k-means / content-proof memos — so:
  *
  *  - repeated batch passes against an unchanged index reuse one cached
  *    generation (no leak, no rebuild);
  *  - an index APPEND or REBUILD changes the meta fingerprint, which
  *    re-keys the cache: the superseded generation for the same
  *    (session, dir) is unpersisted and dropped, and the new one is
  *    derived fresh — the admission loop's "batch N+1 must see batch
  *    N's admissions" contract falls out of the keying;
  *  - at most one generation per (session, index) is ever held.
  */
private[graft] object RefCache {

  private val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()

  /** Cache builds — the memo's observable (spec-pinned). */
  private[graft] val buildCount = new java.util.concurrent.atomic.AtomicLong()

  /** The cached frames for this index generation, building + persisting
    * on first use and retiring any superseded generation of the same
    * (session, dir). `fingerprint` must change whenever the index's
    * served content changes (the meta case-class rendering does). */
  def get(session: SparkSession, dir: String, fingerprint: String)
         (build: => Seq[DataFrame]): Seq[DataFrame] = {
    val prefix = s"${System.identityHashCode(session)}:$dir:"
    val key = prefix + fingerprint
    import scala.jdk.CollectionConverters._
    val stale = memo.keySet().asScala.filter(k => k.startsWith(prefix) && k != key).toList
    stale.foreach(k => Option(memo.remove(k)).foreach(_.foreach(_.unpersist())))
    memo.computeIfAbsent(key, _ => { buildCount.incrementAndGet(); build.map(_.persist()) })
  }
}
