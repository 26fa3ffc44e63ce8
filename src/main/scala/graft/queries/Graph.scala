package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics on a DERIVED graph — the missing shape
 * between one-shot joins and the ConnectedComponents closure: a
 * fixed-iteration PageRank (Brin & Page 1998) over the nation-level
 * trade graph (edge c_nation → s_nation weighted by how many lineitems
 * that customer-nation bought from that supplier-nation).
 *
 * Scale split: the EXPENSIVE part is building the edge list — a full
 * lineitem ⋈ orders ⋈ customer ⋈ supplier chain that shuffles on its
 * join keys and aggregates down to at most |nation|² rows. The
 * iteration then runs on that bounded aggregate: rank and contribution
 * tables are |nation|-sized, explicitly broadcast, so five iterations
 * add ZERO corpus-scale exchanges — the plan is one heavy
 * aggregation followed by driver-cheap broadcast loops. (For graphs
 * whose node set scales with the data, the iteration becomes the
 * checkpointed self-join loop ConnectedComponents already implements;
 * this operator is the bounded-node-set regime.)
 *
 * Cross-engine determinism: PageRank in doubles would diverge across
 * engines on aggregation order, so the whole computation is FIXED-POINT
 * integer — ranks in units of 1e-12 (S = 1e12), edge weights normalized
 * to per-million fractions with integer division, per-edge contributions
 * divided down BEFORE the sum (integer sums are order-independent),
 * damping 85/100. The DuckDB oracle chains five generated CTEs through
 * the same arithmetic, so all 25 ranks hash-match exactly. Truncation
 * loss from the integer divisions stays in the dropped remainders
 * (bounded by #edges per node, ~1e-6 relative) — the same loss on both
 * engines, by construction.
 */
object Graph {

  private val S = 1000000000000L // rank scale: 1.0 == 1e12
  private val iterations = 5

  /** c_nation → s_nation edge list with per-million out-weight
    * fractions. Bounded by |nation|² regardless of data scale. */
  private def edgeFractions(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("ow"))
      .select(col("src").as("o_src"), col("ow"))
    edges.join(broadcast(outw), col("src") === col("o_src"))
      .selectExpr("src", "dst", "(w * 1000000L) div ow AS wfrac")
  }

  /** The fixed-point iteration over arbitrary bounded (node) /
    * (src, dst, wfrac) frames — `nNodes` must equal the node count (the
    * caller's one bounded-dimension driver action). */
  def pagerankOf(nodes: DataFrame, edgeFracs: DataFrame, nNodes: Long,
      iters: Int = iterations): DataFrame = {
    val base = S / nNodes
    val tp = 15L * base / 100L
    val ef = Caches.persist(edgeFracs)
    var pr = nodes.select(col("node"), lit(base).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ef
        .join(broadcast(pr.select(col("node").as("p_node"), col("pr"))),
          col("src") === col("p_node"))
        .selectExpr("dst", "(pr * wfrac) div 1000000L AS c")
        .groupBy(col("dst")).agg(sum(col("c")).as("contrib"))
      pr = nodes.select(col("node"))
        .join(broadcast(contrib), col("node") === col("dst"), "left")
        .selectExpr("node", s"${tp}L + (85L * coalesce(contrib, 0L)) div 100L AS pr")
    }
    pr
  }

  def pagerank(s: SparkSession, dir: String): DataFrame = {
    val nation = Tables.t(s, dir, "nation")
      .select(col("n_nationkey").as("node"), col("n_name"))
    // |nation| is a bounded dimension (25 at every SF) — the one driver
    // action here reads a 25-row table, not the corpus.
    val nn = nation.count()
    pagerankOf(nation, edgeFractions(s, dir), nn)
      .join(broadcast(nation), Seq("node"))
      .select(col("node"), col("n_name"), col("pr"))
      .orderBy(col("node"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_pagerank" -> ((s, dir) => pagerank(s, dir))
  )

  // The oracle chains pr0..pr5 CTEs generated from the same constants —
  // one source of truth for the damping/scale arithmetic.
  private lazy val pagerankOracle: String = {
    val iterCtes = (1 to iterations).map { k =>
      s"""pr$k AS (SELECT n.node, b.tp + (85 * coalesce(s.c, 0)) // 100 AS pr
         |  FROM nodes n CROSS JOIN b
         |  LEFT JOIN (SELECT ef.dst, sum((p.pr * ef.wfrac) // 1000000)::BIGINT AS c
         |             FROM ef JOIN pr${k - 1} p ON p.node = ef.src
         |             GROUP BY ef.dst) s ON s.dst = n.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT c_nationkey AS src, s_nationkey AS dst,
       |    count(*)::BIGINT AS w
       |  FROM lineitem
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  GROUP BY src, dst),
       |outw AS (SELECT src, sum(w)::BIGINT AS ow FROM e GROUP BY src),
       |ef AS (SELECT e.src, e.dst, (e.w * 1000000) // o.ow AS wfrac
       |  FROM e JOIN outw o ON o.src = e.src),
       |nodes AS (SELECT n_nationkey AS node FROM nation),
       |b AS (SELECT (1000000000000 // count(*)) AS base,
       |    ((15 * (1000000000000 // count(*))) // 100) AS tp
       |  FROM nation),
       |pr0 AS (SELECT node, b.base AS pr FROM nodes CROSS JOIN b),
       |$iterCtes
       |SELECT p.node, n.n_name, p.pr::BIGINT AS pr
       |FROM pr$iterations p JOIN nation n ON n.n_nationkey = p.node
       |ORDER BY p.node""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q106_pagerank" -> pagerankOracle
  )
}
