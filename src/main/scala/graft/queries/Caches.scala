package graft.queries

import org.apache.spark.sql.DataFrame

/**
 * Registry for DataFrames persisted while *constructing* a query.
 *
 * Query builders (rankBy, q25, q27) must persist intermediates that are
 * consumed by several downstream branches, but a builder cannot unpersist
 * them itself — the terminal action runs later, in the caller. Consumers
 * (Bench, Verify, specs) call [[releaseAll]] after each query's terminal
 * action so cached partitions never accrue across queries in a long-lived
 * session (they previously leaked until LRU eviction; the bench logged
 * "Asked to cache already cached data" on every repeat).
 */
object Caches {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and remember it for the next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    live.add(p)
    p
  }

  /** Unpersist every registered DataFrame (non-blocking). */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }
}
