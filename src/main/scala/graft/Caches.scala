package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Ownership registry for operator-internal persisted intermediates.
  *
  * A few operators genuinely need a MEMORY_AND_DISK intermediate — the
  * MinHash verify joins re-read the shingle sets, the LM scorers take
  * a scalar action off the vocabulary histogram they then join — but a
  * bare `.persist` inside an operator that returns a lazy DataFrame
  * has no release point: the caller finishes its action and the cached
  * partitions stay resident for the life of the session (the round-3
  * cache-lifecycle leak). Routing every such persist through [[own]]
  * gives the CALLER ownership: after consuming the returned frame,
  * `Caches.release(spark)` drops everything the engine pinned in that
  * session. Released frames stay correct — unpersist only removes the
  * cache, recompute still works — so releasing early costs time, never
  * results.
  *
  * Long-lived sessions (notebooks, servers) call `release` between
  * logical jobs; `Verify` releases after every query, `Bench` between
  * passes. Operators whose reuse is WITHIN one plan tree only were
  * restructured to not persist at all (see `Dedup.pairCounts`).
  */
object Caches {

  private val owned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[DataFrame]()

  private val lastPruneNanos = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Persist `df` (MEMORY_AND_DISK) and register it for [[release]]. */
  private[graft] def own(df: DataFrame): DataFrame = {
    pruneStopped()
    df.persist(StorageLevel.MEMORY_AND_DISK)
    owned.add(df)
    df
  }

  /** Drop entries whose SparkContext has stopped: their cached blocks
    * are gone with the executors, and holding the DataFrame would pin
    * the whole dead-session object graph for the JVM's lifetime (a
    * long-lived server creating sessions per job would otherwise
    * accumulate one leaked session per job that skipped release).
    * Throttled to once per 10 s — the scan is O(owned) and own() can
    * sit on an operator's per-query path; dead sessions only need to
    * be reclaimed eventually, not on every persist.
    */
  private def pruneStopped(): Unit = {
    val now = System.nanoTime()
    val last = lastPruneNanos.get()
    if (now - last < 10L * 1000 * 1000 * 1000) return
    if (!lastPruneNanos.compareAndSet(last, now)) return
    val it = owned.iterator()
    while (it.hasNext) {
      // NonFatal only: an OOME or interrupt during the liveness probe
      // must propagate, not be misread as "context stopped"
      val alive =
        try !it.next().sparkSession.sparkContext.isStopped
        catch { case scala.util.control.NonFatal(_) => false }
      if (!alive) it.remove()
    }
  }

  /** Number of registry entries pinned for `spark` (test observability). */
  private[graft] def ownedCount(spark: SparkSession): Int = {
    var n = 0
    val it = owned.iterator()
    while (it.hasNext) if (it.next().sparkSession eq spark) n += 1
    n
  }

  /** Unpersist every engine-pinned intermediate of `spark`'s session. */
  def release(spark: SparkSession): Unit = {
    val it = owned.iterator()
    while (it.hasNext) {
      val df = it.next()
      if (df.sparkSession eq spark) {
        try df.unpersist(blocking = false)
        catch { case scala.util.control.NonFatal(_) => () }
        it.remove()
      }
    }
  }

  /** [[release]] across all sessions (test teardown / shutdown). */
  def releaseAll(): Unit = {
    val it = owned.iterator()
    while (it.hasNext) {
      try it.next().unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      it.remove()
    }
  }
}
