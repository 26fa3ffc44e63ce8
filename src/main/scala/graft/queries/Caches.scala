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
 *
 * Two registration modes:
 *  - the GLOBAL queue + [[releaseAll]], for the strictly sequential
 *    single-consumer protocol above — build one query, run its terminal
 *    action, release, repeat. Overlapping query lifecycles (parallel
 *    benching, suites sharing the session) must not interleave
 *    releaseAll calls, or one consumer frees another's caches;
 *  - a [[scoped]] bracket, for builds whose persists are NOT needed past
 *    construction (plan inspection): they release at bracket exit and
 *    never touch the global queue.
 */
object Caches {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val liveViews =
    new java.util.concurrent.ConcurrentLinkedQueue[(org.apache.spark.sql.SparkSession, String)]()
  private val scope = new ThreadLocal[java.util.ArrayDeque[DataFrame]]()

  /** Register a temp view (e.g. a streaming memory-sink table, whose rows
    * live on the DRIVER) to be dropped at the next [[releaseAll]] — after
    * the consumer's terminal action has read it. Without this, a bench or
    * verify session accumulates every streaming query's full result set in
    * driver memory for the life of the JVM (measured: the r4 streaming
    * pack ran 20-35% slower late in a 56-query bench session than in
    * isolation; the queries themselves were unchanged). */
  def registerView(s: org.apache.spark.sql.SparkSession, name: String): Unit =
    liveViews.add((s, name))

  /** Persist `df` and remember it: inside a [[scoped]] bracket it belongs
    * to that bracket (released at exit); otherwise it joins the global
    * queue for the next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    val s = scope.get()
    if (s != null) s.add(p) else live.add(p)
    p
  }

  /** Bracket a query BUILD whose persisted intermediates are not needed
    * after `f` returns (e.g. `.queryExecution` plan audits): everything
    * this thread persists inside `f` is unpersisted on exit, leaving other
    * consumers' registrations alone. Not for builds whose DataFrame is
    * executed later — those need their caches alive until the terminal
    * action, i.e. the global queue + releaseAll protocol. */
  def scoped[A](f: => A): A = {
    val prev = scope.get()
    val mine = new java.util.ArrayDeque[DataFrame]()
    scope.set(mine)
    try f
    finally {
      scope.set(prev)
      mine.forEach(_.unpersist(blocking = false))
    }
  }

  /** Unpersist every globally-registered DataFrame (non-blocking) and drop
    * every registered memory-sink view. */
  def releaseAll(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
    var view = liveViews.poll()
    while (view != null) {
      view._1.catalog.dropTempView(view._2)
      view = liveViews.poll()
    }
  }
}
