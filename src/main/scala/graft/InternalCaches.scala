package graft

import org.apache.spark.sql.Dataset

/** Registry of the library's internally persisted intermediates.
  *
  * Several operators persist mid-pipeline frames on purpose — MinHash
  * shingles/signatures and SimHash signatures (consumed by two branches
  * AND an optimizer barrier against CollapseProject re-expansion), IVF
  * centroids (broadcast to assign + probe). Those frames live in the
  * session cache until someone releases them; `spark.catalog.clearCache()`
  * works but also evicts the CALLER's own cached tables.
  *
  * [[releaseAll]] unpersists exactly the library's intermediates and
  * nothing else — call it after consuming the results of a dedup/ANN
  * operation in a long-lived session. Calling it early is safe for
  * correctness (every tracked frame is a pure deterministic function of
  * its input), it only costs recomputation on later actions. Frames
  * whose persistence is load-bearing for CORRECTNESS (the surrogate-key
  * id assignment freezes nondeterministic sampling) are deliberately
  * NOT tracked here.
  *
  * `localCheckpoint` blocks (k-means centroids per round) are not in
  * this registry: they are freed by Spark's ContextCleaner as soon as
  * the checkpointed frame becomes unreachable, and they are k×d-row
  * metadata, not data-scale.
  */
object InternalCaches {

  private val live =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Dataset[_]]()

  /** Register a frame the library just persisted. */
  private[graft] def track[T](ds: Dataset[T]): Dataset[T] = {
    live.add(ds)
    ds
  }

  /** Unpersist every tracked intermediate (non-blocking) and empty the
    * registry. Safe to call at any time; idempotent. */
  def releaseAll(): Unit = {
    live.forEach { ds =>
      try ds.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
    live.clear()
  }

  /** Number of currently tracked intermediates (for tests/monitoring). */
  def liveCount: Int = live.size()
}
