"""pyspark access to the graft training-data pipeline operators.

The JVM peer is ``graft.PipelineBridge`` (the Scala library on the driver
classpath). Unlike the estimator wrapper in :mod:`graft_iforest.iforest`,
these are plain functions: each call crosses the Py4J gateway once, the
whole query plans and executes in the JVM, and the returned handle is a
normal pyspark DataFrame over the JVM result — no rows move through Python.

Queries that persist intermediates during their build (near-dup pairs,
clustering) register them with the library's cache registry; call
:func:`release_caches` after each query's terminal action in a long-lived
session, exactly as the Scala consumers (Bench/Verify) do.
"""

from pyspark.sql import DataFrame

__all__ = [
    "run_query", "query_names", "exact_dedup", "minhash_near_dup",
    "dedup_clusters", "split_assign", "ann_topk_lsh", "ann_topk_ivf",
    "release_caches",
]


def _bridge(spark):
    return spark._jvm.graft.PipelineBridge


def run_query(spark, name, data_dir):
    """Run any named query from the library's query surface (see
    :func:`query_names`) against the parquet tables under ``data_dir``."""
    jdf = _bridge(spark).query(spark._jsparkSession, name, data_dir)
    return DataFrame(jdf, spark)


def query_names(spark):
    """All query names :func:`run_query` accepts."""
    return sorted(_bridge(spark).queryNames())


def exact_dedup(spark, data_dir):
    """Exact content dedup: (keeper, n_copies) per distinct document text."""
    return run_query(spark, "q20_exact_dedup", data_dir)


def minhash_near_dup(spark, data_dir):
    """MinHash-LSH near-duplicate pairs (a_id, b_id, jaccard >= 0.5)."""
    return run_query(spark, "q25_minhash_neardup", data_dir)


def dedup_clusters(spark, data_dir):
    """Near-dup clustering: (doc_id, cluster_id, is_canonical) for every
    document — rows with is_canonical = 0 are the drop list."""
    return run_query(spark, "q66_dedup_clusters", data_dir)


def split_assign(spark, data_dir):
    """Deterministic 90/5/5 train/val/test assignment per doc_id."""
    return run_query(spark, "q65_split_assign", data_dir)


def ann_topk_lsh(spark, data_dir, num_probes=5, k=5):
    """LSH approximate top-k cosine neighbors for vec_id < num_probes."""
    jdf = _bridge(spark).annLshTopK(
        spark._jsparkSession, data_dir, int(num_probes), int(k))
    return DataFrame(jdf, spark)


def ann_topk_ivf(spark, data_dir, num_probes=5, k=5):
    """IVF approximate top-k cosine neighbors for vec_id < num_probes."""
    jdf = _bridge(spark).annIvfTopK(
        spark._jsparkSession, data_dir, int(num_probes), int(k))
    return DataFrame(jdf, spark)


def release_caches(spark):
    """Unpersist every cache a query build registered (the consumer side
    of the library's cache protocol) — call after each terminal action."""
    _bridge(spark).releaseCaches()
