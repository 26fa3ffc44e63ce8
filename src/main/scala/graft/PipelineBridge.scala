package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Py4J-friendly facade over the pipeline operators for the Python wrapper
 * (python/graft_iforest/pipeline.py). The Scala query surface is a
 * `Map[String, (SparkSession, String) => DataFrame]` — idiomatic from
 * Scala, but Scala function values and Maps are awkward through a Py4J
 * gateway, so this object exposes plain methods with JVM-native
 * signatures. Returned DataFrames are handed back as their Java peers and
 * re-wrapped on the Python side; execution stays entirely in the JVM.
 */
object PipelineBridge {

  /** Run any named query from [[SparkEntry.queries]] against a data dir;
    * throws with the known names on a typo instead of a bare None.get. */
  def query(s: SparkSession, name: String, dir: String): DataFrame =
    SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name' — known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    )(s, dir)

  def queryNames(): Array[String] = SparkEntry.queries.keys.toSeq.sorted.toArray

  // Explicit ANN entry points (the knobs matter more than for the fixed
  // queries map, and Python callers shouldn't need the defaults baked
  // into q31/q49).
  def annLshTopK(s: SparkSession, dir: String, numProbes: Int, k: Int): DataFrame =
    similarity.AnnLsh.annTopK(s, dir, numProbes = numProbes, k = k)

  def annIvfTopK(s: SparkSession, dir: String, numProbes: Int, k: Int): DataFrame =
    similarity.AnnIvf.annTopK(s, dir, numProbes = numProbes, k = k)

  /** Unpersist every cache a query build registered — the same consumer
    * contract Bench/Verify follow after each terminal action
    * ([[graft.queries.Caches]]); long-lived Python sessions must call this
    * between queries or cached partitions accrue. */
  def releaseCaches(): Unit = queries.Caches.releaseAll()
}
