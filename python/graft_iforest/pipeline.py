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
    # query surface
    "run_query", "query_names",
    # dedup one-shots + mix shaping
    "exact_dedup", "minhash_near_dup", "dedup_clusters", "split_assign",
    "mix_pipeline", "weighted_take", "mix_take",
    # ANN: live and persisted tiers
    "ann_topk_lsh", "ann_topk_ivf", "ann_topk_pq", "ann_topk_ivfpq",
    "build_ann_index", "append_ann_index", "ann_index_current",
    "persisted_topk_lsh", "persisted_topk_ivf", "persisted_topk_pq",
    "persisted_topk_ivfpq", "compact_ann_index",
    # text scrubbing
    "scrub",
    # incremental dedup store
    "build_dedup_index", "build_dedup_index_if_stale", "dedup_index_current",
    "dedup_delta_verdicts", "absorb_dedup_delta",
    "dedup_stream_delta_verdicts", "compact_dedup_index",
    # stats store (flat + epoch-tagged)
    "build_stats_store", "build_stats_store_if_stale", "stats_store_current",
    "merged_stats", "absorb_stats_delta", "stored_stats",
    "compact_stats_store", "build_tagged_stats_store", "absorb_stats_epoch",
    "expire_stats_epochs", "tagged_stored_stats", "stats_as_of",
    "stats_changes",
    # transactional cross-store commits
    "tx_reset", "tx_ensure_bases", "tx_absorb_delta", "tx_keeper_ids",
    "tx_stored_stats", "tx_vocab_coverage", "tx_stats_as_of",
    "tx_checkpoint", "tx_vacuum", "tx_ensure_ingest_bases",
    "tx_absorb_ingest", "tx_merged_edges", "tx_judge_embed_batch2",
    "tx_ensure_ann_base", "tx_absorb_ingest_tick", "tx_ann_topk",
    # vocabulary store
    "build_vocab_store_if_stale", "absorb_vocab_delta", "vocab_coverage",
    "vocab_words", "vocab_oov_rates", "compact_vocab_store",
    # embedding-dedup store
    "build_embed_index_if_stale", "embed_delta_verdicts", "embed_batch1",
    "embed_batch2", "embed_judge", "absorb_embed_batch",
    "compact_embed_index",
    # inverted-index search store
    "build_search_store_if_stale", "absorb_search_delta", "search_bm25",
    "search_phrase", "proximity_search", "compact_search_store",
    "tx_ensure_search_base", "tx_absorb_search", "tx_search_bm25",
    # zone-map data-skipping store
    "build_zonemap_store_if_stale", "absorb_zonemap_delta",
    "zonemap_range_aggregate", "recluster_zonemap",
    # transactional table
    "tx_ensure_zone_base", "tx_absorb_table_append",
    "tx_absorb_table_delete", "tx_table_range_aggregate",
    "tx_table_range_aggregate_as_of", "tx_vacuum_table",
    "tx_absorb_table_upsert", "tx_table_changelog", "tx_search_bm25_as_of",
    "tx_absorb_table_replace", "tx_mat_view",
    # data-governance audits
    "audit_expectations", "audit_k_anonymity", "audit_fk",
    # verified-ML family + cluster-profile store
    "ml_kmeans", "ml_perceptron", "ml_knn_classify", "ml_dbscan",
    "ml_knn_ann", "ml_ann_recall", "ml_ivf_recall", "ml_pq_recall",
    "ml_ivfpq_recall", "ml_sem_dedup",
    "ml_proto_prune",
    "build_cluster_store_if_stale", "absorb_cluster_delta",
    "cluster_profile", "cluster_drift", "compact_cluster_store",
    # mergeable sketch store
    "build_cms_if_stale", "absorb_cms_delta", "cms_heavy_hitters",
    "build_kmv_store", "absorb_kmv_delta", "kmv_sample",
    # graph-edge store
    "build_graph_store_if_stale", "absorb_graph_delta", "graph_store_edges",
    "compact_graph_store", "pagerank",
    # distinct-count store
    "build_distinct_store_if_stale", "absorb_distinct_delta",
    "distinct_occupancy",
    # decontamination store
    "build_decontam_index_if_stale", "absorb_decontam_bench",
    "decontam_judge",
    # session upkeep
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


def mix_pipeline(spark, data_dir, min_quality_e4=6100, rep_threshold=0.10,
                 cap_k=5):
    """The end-to-end training-mix pipeline (q73): exact dedup, quality +
    repetition gates, per-(lang, source) cap, deterministic split, and BPE
    token count — (doc_id, lang, source, split, n_tokens) for kept docs.

    The gates are deployment-tunable: ``min_quality_e4`` is the quality
    floor in quality_e4 units, ``rep_threshold`` the repetition gate's
    char-coverage fraction, ``cap_k`` the per-(lang, source) document cap.
    The defaults are the oracled constants, so the default call computes
    exactly the hash-checked ``q73_mix_pipeline`` result."""
    jdf = _bridge(spark).mixPipeline(
        spark._jsparkSession, data_dir, int(min_quality_e4),
        float(rep_threshold), int(cap_k))
    return DataFrame(jdf, spark)


def weighted_take(spark, data_dir, total_budget=15000):
    """The temperature-weighted token take (q76): a total token budget is
    split per language by the alpha=1/2 sampling weights, then each
    language's documents are taken in deterministic md5-hash order while
    its running token total fits its budget — (doc_id, lang, n_tokens,
    cum_tokens, budget). The default budget is the oracled 15,000."""
    jdf = _bridge(spark).weightedTake(
        spark._jsparkSession, data_dir, int(total_budget))
    return DataFrame(jdf, spark)


def mix_take(spark, data_dir, min_quality_e4=6100, rep_threshold=0.10,
             cap_k=5, total_budget=15000):
    """The full mixture materialization (q78): :func:`mix_pipeline`'s
    cleaned, gated, capped survivors fed into the temperature-weighted
    budgeted take — (doc_id, lang, source, split, n_tokens, cum_tokens,
    budget) for the sampled mix. The alpha=1/2 weights are computed over
    the SURVIVORS' language counts and the budget is denominated in BPE
    tokens. Defaults are the oracled constants, so the default call
    computes exactly the hash-checked ``q78_mix_take`` result."""
    jdf = _bridge(spark).mixTake(
        spark._jsparkSession, data_dir, int(min_quality_e4),
        float(rep_threshold), int(cap_k), int(total_budget))
    return DataFrame(jdf, spark)


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


def ann_topk_pq(spark, data_dir, num_probes=5, k=5, rerank=0):
    """Product-quantization top-k (q130): compressed ADC scan over 16-byte
    codes, exact re-rank of the top pool. ``rerank<=0`` uses the
    corpus-adaptive n/16 depth."""
    jdf = _bridge(spark).annPqTopK(
        spark._jsparkSession, data_dir, int(num_probes), int(k), int(rerank))
    return DataFrame(jdf, spark)


def build_ann_index(spark, data_dir, index_path, method="lsh"):
    """Build (or rebuild) a persisted ANN index for ``data_dir``'s
    embeddings at ``index_path`` — the deployment shape where the index
    lives next to the data and query sessions load instead of rebuilding.
    ``method`` is ``"lsh"``, ``"ivf"``, ``"pq"``, or ``"ivfpq"`` (all but LSH record
    the training corpus size for their append drift bounds)."""
    b = _bridge(spark)
    if method == "lsh":
        b.buildLshIndex(spark._jsparkSession, data_dir, index_path)
    elif method == "ivf":
        b.buildIvfIndex(spark._jsparkSession, data_dir, index_path)
    elif method == "pq":
        b.buildPqIndex(spark._jsparkSession, data_dir, index_path)
    elif method == "ivfpq":
        b.buildIvfPqIndex(spark._jsparkSession, data_dir, index_path)
    else:
        raise ValueError(f"unknown ANN index method {method!r}")


def append_ann_index(spark, data_dir, index_path, method="lsh"):
    """Incrementally index only the rows added since the last
    build/append (cost proportional to the added data). Raises when the
    corpus change was not a pure add — or, for IVF/PQ, when the corpus
    has outgrown the frozen geometry's measured drift bound — rebuild
    with :func:`build_ann_index` in that case."""
    b = _bridge(spark)
    if method == "lsh":
        b.appendLshIndex(spark._jsparkSession, data_dir, index_path)
    elif method == "ivf":
        b.appendIvfIndex(spark._jsparkSession, data_dir, index_path)
    elif method == "pq":
        b.appendPqIndex(spark._jsparkSession, data_dir, index_path)
    elif method == "ivfpq":
        b.appendIvfPqIndex(spark._jsparkSession, data_dir, index_path)
    else:
        raise ValueError(f"unknown ANN index method {method!r}")


def ann_index_current(spark, data_dir, index_path):
    """True iff the index exists, is fully committed, and its persisted
    corpus fingerprint matches ``data_dir``'s current contents."""
    return bool(_bridge(spark).isIndexCurrent(
        spark._jsparkSession, data_dir, index_path))


def persisted_topk_lsh(spark, data_dir, index_path, num_probes=5, k=5):
    """Top-k cosine neighbors from the persisted LSH index with
    build-if-absent-or-stale semantics: a missing or stale index heals
    (append first when the corpus merely grew, full rebuild otherwise)
    before the probe runs."""
    jdf = _bridge(spark).persistedLshTopK(
        spark._jsparkSession, data_dir, index_path, int(num_probes), int(k))
    return DataFrame(jdf, spark)


def persisted_topk_ivf(spark, data_dir, index_path, num_probes=5, k=5):
    """IVF twin of :func:`persisted_topk_lsh`."""
    jdf = _bridge(spark).persistedIvfTopK(
        spark._jsparkSession, data_dir, index_path, int(num_probes), int(k))
    return DataFrame(jdf, spark)


def ann_topk_ivfpq(spark, data_dir, num_probes=5, k=5):
    """Composed IVF-PQ top-k (q137): coarse inverted lists prune the scan,
    16-byte residual codes score survivors via ADC, exact cosine re-ranks
    the pool."""
    jdf = _bridge(spark).annIvfPqTopK(
        spark._jsparkSession, data_dir, int(num_probes), int(k))
    return DataFrame(jdf, spark)


def persisted_topk_pq(spark, data_dir, index_path, num_probes=5, k=5):
    """PQ twin of :func:`persisted_topk_lsh` (q133): the compressed scan
    reads the persisted 16-byte codes — no float column on the scan path
    — and only the re-rank pool rehydrates exact vectors."""
    jdf = _bridge(spark).persistedPqTopK(
        spark._jsparkSession, data_dir, index_path, int(num_probes), int(k))
    return DataFrame(jdf, spark)


def persisted_topk_ivfpq(spark, data_dir, index_path, num_probes=5, k=5):
    """IVF-PQ twin of :func:`persisted_topk_lsh` (q138): list-pruned scan
    over persisted 16-byte residual codes, both geometries loaded from
    the index."""
    jdf = _bridge(spark).persistedIvfPqTopK(
        spark._jsparkSession, data_dir, index_path, int(num_probes), int(k))
    return DataFrame(jdf, spark)


def scrub(spark, data_dir, categories):
    """Parameterized PII/pattern redaction over the documents table.

    ``categories`` is an ordered list of ``(name, java_regex,
    replacement)`` triples, applied in order (each category's matches are
    counted on the text as it stands when that pass runs). Returns one
    row per doc with per-category ``n_<name>`` counts, a ``residual_pii``
    re-scan across all patterns, and the ``clean_text``.
    """
    sc = spark.sparkContext
    gw = sc._gateway
    def jarray(vals):
        arr = gw.new_array(gw.jvm.java.lang.String, len(vals))
        for i, v in enumerate(vals):
            arr[i] = v
        return arr
    jdf = _bridge(spark).scrub(
        spark._jsparkSession, data_dir,
        jarray([c[0] for c in categories]),
        jarray([c[1] for c in categories]),
        jarray([c[2] for c in categories]))
    return DataFrame(jdf, spark)


def build_dedup_index(spark, data_dir):
    """Fingerprint the corpus slice into the persisted incremental-dedup
    index (exact md5 table, MinHash band keys, shingle sets); returns the
    index path."""
    return _bridge(spark).buildDedupIndex(spark._jsparkSession, data_dir)


def dedup_delta_verdicts(spark, data_dir):
    """Judge the delta slice against the store: one row per delta doc
    with verdict 'exact' | 'near' | 'unique' and the matching evidence
    (exact keeper, near-dup count, best near match). Pure read of the
    store — never rebuilds."""
    jdf = _bridge(spark).dedupDeltaVerdicts(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def absorb_dedup_delta(spark, data_dir):
    """Append the judged delta's kept ('unique') docs into the store so
    the next batch is judged against them. Append-only."""
    _bridge(spark).absorbDedupDelta(spark._jsparkSession, data_dir)


def dedup_stream_delta_verdicts(spark, data_dir):
    """The same judge run as a stream over the delta (stream-static joins
    against the store) — bit-equal to :func:`dedup_delta_verdicts`."""
    jdf = _bridge(spark).dedupStreamDeltaVerdicts(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def dedup_index_current(spark, data_dir):
    """True iff the dedup store exists, matches the live corpus content,
    and has not been extended by an absorb."""
    return bool(_bridge(spark).isDedupIndexCurrent(spark._jsparkSession, data_dir))


def build_dedup_index_if_stale(spark, data_dir):
    """Build the dedup store only when missing, stale, or absorbed-into;
    returns the index path."""
    return _bridge(spark).buildDedupIndexIfStale(spark._jsparkSession, data_dir)


def build_stats_store(spark, data_dir):
    """Aggregate the corpus slice into persisted per-(lang, source)
    moment-sum partials (q107's store); returns the store path."""
    return _bridge(spark).buildStatsStore(spark._jsparkSession, data_dir)


def stats_store_current(spark, data_dir):
    """True iff the stats store exists and matches the live corpus."""
    return bool(_bridge(spark).isStatsStoreCurrent(spark._jsparkSession, data_dir))


def build_stats_store_if_stale(spark, data_dir):
    """Build the stats store only when missing or stale; returns path."""
    return _bridge(spark).buildStatsStoreIfStale(spark._jsparkSession, data_dir)


def merged_stats(spark, data_dir):
    """Persisted corpus partials merged with the live delta's partials —
    finalized per-(lang, source) stats, exactly a full recompute."""
    jdf = _bridge(spark).mergedStats(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def absorb_stats_delta(spark, data_dir):
    """Append the delta's partials into the stats store permanently; the
    store then covers corpus + delta on its own."""
    _bridge(spark).absorbStatsDelta(spark._jsparkSession, data_dir)


def stored_stats(spark, data_dir):
    """Finalized stats from the store alone (no live delta read)."""
    jdf = _bridge(spark).storedStats(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def pagerank(spark, data_dir):
    """Fixed-point integer PageRank over the nation trade graph (q106)."""
    jdf = _bridge(spark).pagerank(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def compact_dedup_index(spark, data_dir):
    """Rewrite the dedup store's absorb layers into one coalesced file set
    per table (exact/shingles/bands). Semantics-preserving — the judge's
    answers are bit-identical before and after (q143's oracled contract)."""
    _bridge(spark).compactDedupIndex(spark._jsparkSession, data_dir)


def compact_stats_store(spark, data_dir):
    """Collapse the stats store's absorb layers to one row per group; the
    stored stats are unchanged (q145's oracled contract)."""
    _bridge(spark).compactStatsStore(spark._jsparkSession, data_dir)


def build_tagged_stats_store(spark, data_dir):
    """Corpus partials tagged as epoch 0 (the retention store's base
    layer, q146); returns the store path."""
    return _bridge(spark).buildTaggedStatsStore(spark._jsparkSession, data_dir)


def absorb_stats_epoch(spark, data_dir, epoch):
    """Absorb the delta slice's partials as the given epoch layer."""
    _bridge(spark).absorbStatsEpoch(spark._jsparkSession, data_dir, int(epoch))


def expire_stats_epochs(spark, data_dir, keep_from):
    """Drop every layer with epoch < keep_from — retention-window deletion
    as a pure layer drop, O(|store|) work."""
    _bridge(spark).expireStatsEpochs(spark._jsparkSession, data_dir, int(keep_from))


def tagged_stored_stats(spark, data_dir):
    """Finalized stats from the tagged store's surviving epochs."""
    jdf = _bridge(spark).taggedStoredStats(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def stats_as_of(spark, data_dir, epoch):
    """Stats as they stood after `epoch` — time travel over the tagged
    store's layers (q148); a layer filter, no snapshot copies."""
    jdf = _bridge(spark).statsAsOf(spark._jsparkSession, data_dir, int(epoch))
    return DataFrame(jdf, spark)


def stats_changes(spark, data_dir, from_epoch, to_epoch):
    """The stats contribution of epochs (from, to] alone — the changelog
    read (q149)."""
    jdf = _bridge(spark).statsChanges(
        spark._jsparkSession, data_dir, int(from_epoch), int(to_epoch))
    return DataFrame(jdf, spark)


def tx_reset(spark, data_dir):
    """Drop all cross-store transactions (layers + commit log)."""
    _bridge(spark).txReset(spark._jsparkSession, data_dir)


def tx_ensure_bases(spark, data_dir):
    """Build the transactional protocol's immutable base stores if
    missing or stale."""
    _bridge(spark).txEnsureBases(spark._jsparkSession, data_dir)


def tx_absorb_delta(spark, data_dir):
    """ATOMICALLY absorb the delta into both the dedup and stats stores:
    stage both layer sets, then the one-row commit (q147). Returns the
    transaction id."""
    return _bridge(spark).txAbsorbDelta(spark._jsparkSession, data_dir)


def tx_keeper_ids(spark, data_dir):
    """Kept-document ids from base + committed transaction layers."""
    jdf = _bridge(spark).txKeeperIds(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def tx_stored_stats(spark, data_dir):
    """Finalized stats from base + committed transaction layers."""
    jdf = _bridge(spark).txStoredStats(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def tx_vocab_coverage(spark, data_dir):
    """Top-25 vocabulary coverage from base + committed transaction
    layers (the three-store transaction's vocab read, q155)."""
    jdf = _bridge(spark).txVocabCoverage(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def tx_stats_as_of(spark, data_dir, max_txn):
    """Stats as of a transaction id — time travel over the commit-log
    prefix (q156); cross-store consistent by construction."""
    jdf = _bridge(spark).txStatsAsOf(
        spark._jsparkSession, data_dir, int(max_txn))
    return DataFrame(jdf, spark)


def tx_checkpoint(spark, data_dir):
    """Fold every committed transaction layer into the base stores and
    truncate the commit log — the protocol's compaction verb. Readers
    refuse loudly during (or after a crashed) publish; rerunning heals."""
    _bridge(spark).txCheckpoint(spark._jsparkSession, data_dir)


def tx_vacuum(spark, data_dir):
    """Reclaim orphaned transaction staging: uncommitted t<id> dirs left
    by crashed-and-abandoned absorbs, plus checkpoint staging that died
    before raising its marker. Refuses while a checkpoint publish is in
    flight. Returns the reclaimed transaction ids, ascending."""
    return list(_bridge(spark).txVacuum(spark._jsparkSession, data_dir))


def compact_graph_store(spark, data_dir):
    """Collapse the edge store's layers to one row per pair; reads are
    unchanged (q152's oracled contract)."""
    _bridge(spark).compactGraphStore(spark._jsparkSession, data_dir)


def build_graph_store_if_stale(spark, data_dir):
    """Build the corpus co-purchase edge store if missing/stale (q150);
    returns the store path."""
    return _bridge(spark).buildGraphStoreIfStale(spark._jsparkSession, data_dir)


def absorb_graph_delta(spark, data_dir):
    """Absorb the delta orders' pair aggregation as an edge layer."""
    _bridge(spark).absorbGraphDelta(spark._jsparkSession, data_dir)


def graph_store_edges(spark, data_dir):
    """The merged (a, b, w) co-purchase edge list from the store alone —
    equals the full-table aggregation exactly (additive weights)."""
    jdf = _bridge(spark).graphStoreEdges(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def build_distinct_store_if_stale(spark, data_dir):
    """Build the bitmap-occupancy distinct-count store (q154) if missing
    or stale; returns the store path."""
    return _bridge(spark).buildDistinctStoreIfStale(spark._jsparkSession, data_dir)


def absorb_distinct_delta(spark, data_dir):
    """Absorb the delta events' occupied buckets (union-merged layer —
    cross-batch user overlap dedups structurally)."""
    _bridge(spark).absorbDistinctDelta(spark._jsparkSession, data_dir)


def distinct_occupancy(spark, data_dir):
    """Per-event-type bucket occupancy from the store alone; the linear-
    counting estimate is -m*ln(1 - V/m) with m=4096."""
    jdf = _bridge(spark).distinctOccupancy(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def build_decontam_index_if_stale(spark, data_dir):
    """Build the persisted benchmark winnow-fingerprint store (q153) if
    missing or stale; returns the store path."""
    return _bridge(spark).buildDecontamIndexIfStale(spark._jsparkSession, data_dir)


def absorb_decontam_bench(spark, data_dir):
    """Absorb a newly-shipped benchmark tranche's fingerprints."""
    _bridge(spark).absorbDecontamBench(spark._jsparkSession, data_dir)


def decontam_judge(spark, data_dir, batch_df):
    """Judge a (doc_id, text) DataFrame against the persisted benchmark
    fingerprints; a row flags when it contains some benchmark doc (shared
    distinct fps >= half that bench doc's fingerprint set)."""
    jdf = _bridge(spark).decontamJudge(
        spark._jsparkSession, data_dir, batch_df._jdf)
    return DataFrame(jdf, spark)


def build_cms_if_stale(spark, data_dir):
    """Build the count-min + heavy-hitter-candidate store (q170) from the
    corpus slice if missing or stale; returns the store root."""
    return _bridge(spark).buildCmsIfStale(spark._jsparkSession, data_dir)


def absorb_cms_delta(spark, data_dir):
    """Append the delta's 4x1024 counter layer + top-50 candidate layer
    (counters merge by addition, candidates by union)."""
    _bridge(spark).absorbCmsDelta(spark._jsparkSession, data_dir)


def cms_heavy_hitters(spark, data_dir):
    """Top-20 heavy-hitter estimates (min over sketch rows) from the
    store alone — one-sided: est >= true count."""
    jdf = _bridge(spark).cmsHeavyHitters(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def build_kmv_store(spark, data_dir):
    """Rebuild the bottom-k (KMV) sample store's corpus layer (q171)."""
    _bridge(spark).buildKmvStore(spark._jsparkSession, data_dir)


def absorb_kmv_delta(spark, data_dir):
    """Append the delta's bottom-64 md5-priority layer."""
    _bridge(spark).absorbKmvDelta(spark._jsparkSession, data_dir)


def kmv_sample(spark, data_dir):
    """The merged bottom-64 sample — exactly the full table's bottom-k
    (batches partition the corpus), with integer KMV priorities."""
    jdf = _bridge(spark).kmvSample(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def compact_ann_index(spark, data_dir, index_path, method="lsh"):
    """Collapse a persisted ANN index's append layers under assignments/
    into a few coalesced files — geometry and metadata untouched, answers
    bit-identical before/after. ``method`` in {lsh, ivf, pq, ivfpq} must
    name the tier the index was built as (mismatch throws)."""
    b, js = _bridge(spark), spark._jsparkSession
    verbs = {"lsh": b.compactLshIndex, "ivf": b.compactIvfIndex,
             "pq": b.compactPqIndex, "ivfpq": b.compactIvfPqIndex}
    if method not in verbs:
        raise ValueError(f"unknown ANN method '{method}' — expected one of {sorted(verbs)}")
    verbs[method](js, data_dir, index_path)


def build_vocab_store_if_stale(spark, data_dir):
    """Build the corpus word-count partials store (q83/q140) if missing
    or stale; returns the store path."""
    return _bridge(spark).buildVocabStoreIfStale(spark._jsparkSession, data_dir)


def absorb_vocab_delta(spark, data_dir):
    """Absorb the delta's word counts as an additive layer."""
    _bridge(spark).absorbVocabDelta(spark._jsparkSession, data_dir)


def vocab_coverage(spark, data_dir):
    """q83's top-25 coverage read from the store alone."""
    jdf = _bridge(spark).vocabCoverage(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def vocab_words(spark, data_dir, k=24):
    """The frozen top-``k`` tokenizer vocabulary from the store."""
    jdf = _bridge(spark).vocabWords(spark._jsparkSession, data_dir, k)
    return DataFrame(jdf, spark)


def vocab_oov_rates(spark, data_dir):
    """q144's per-language OOV drift gate of the delta against the frozen
    corpus vocabulary."""
    jdf = _bridge(spark).vocabOovRates(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def compact_vocab_store(spark, data_dir):
    """Collapse the vocab store's layers to one row per word."""
    _bridge(spark).compactVocabStore(spark._jsparkSession, data_dir)


def build_embed_index_if_stale(spark, data_dir):
    """Build the corpus sign-bucket embedding-dedup index (q141) if
    missing or stale; returns the store path."""
    return _bridge(spark).buildEmbedIndexIfStale(spark._jsparkSession, data_dir)


def embed_delta_verdicts(spark, data_dir):
    """Judge the canonical delta slice against the persisted index."""
    jdf = _bridge(spark).embedDeltaVerdicts(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def embed_batch1(spark, data_dir):
    """Batch 1 of the q142 lifecycle as a (vec_id, e, bucket) DataFrame."""
    jdf = _bridge(spark).embedBatch1(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def embed_batch2(spark, data_dir):
    """Batch 2 of the q142 lifecycle (planted against batch-1 vectors)."""
    jdf = _bridge(spark).embedBatch2(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def embed_judge(spark, data_dir, batch_df):
    """Judge an arbitrary (vec_id, e, bucket) DataFrame against the
    persisted index (exact cosine on bucket-mates; verdicts
    exact/near/unique)."""
    jdf = _bridge(spark).embedJudge(
        spark._jsparkSession, data_dir, batch_df._jdf)
    return DataFrame(jdf, spark)


def absorb_embed_batch(spark, data_dir, batch_df):
    """Absorb a judged batch's 'unique' survivors into the index."""
    _bridge(spark).absorbEmbedBatch(
        spark._jsparkSession, data_dir, batch_df._jdf)


def compact_embed_index(spark, data_dir):
    """Collapse the bucket index's absorb layers (judge-invisible)."""
    _bridge(spark).compactEmbedIndex(spark._jsparkSession, data_dir)


def tx_ensure_ingest_bases(spark, data_dir):
    """Build/guard the ingest pair's immutable tx bases (graph edges +
    embed buckets) — required before the first :func:`tx_absorb_ingest`."""
    _bridge(spark).txEnsureIngestBases(spark._jsparkSession, data_dir)


def tx_absorb_ingest(spark, data_dir):
    """Atomically absorb the delta orders' graph pairs and embed batch 1's
    unique survivors as ONE transaction (q162/q163); returns the txn id."""
    return _bridge(spark).txAbsorbIngest(spark._jsparkSession, data_dir)


def tx_merged_edges(spark, data_dir):
    """The merged co-purchase edge list over the transactional state."""
    jdf = _bridge(spark).txMergedEdges(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def tx_judge_embed_batch2(spark, data_dir):
    """Judge embed batch 2 against the transactional index (base plus
    committed layers) — q142's verdicts when batch 1 rode a transaction."""
    jdf = _bridge(spark).txJudgeEmbedBatch2(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def tx_ensure_ann_base(spark, data_dir):
    """Build/guard the transactional ANN tier's base (q169) — required
    before the first ``with_ann`` ingest absorb."""
    _bridge(spark).txEnsureAnnBase(spark._jsparkSession, data_dir)


def tx_absorb_ingest_tick(spark, data_dir, tick, with_ann=False):
    """Atomically absorb ingest tick 1 or 2 (embed batch + its order
    tranche's graph pairs), optionally landing the tick's survivors in
    the transactional ANN index too; returns the txn id."""
    return _bridge(spark).txAbsorbIngestTick(
        spark._jsparkSession, data_dir, tick, with_ann)


def tx_ann_topk(spark, data_dir):
    """Fixed-geometry top-k probes against the transactional ANN index
    (base plus committed layers) — q169's terminal read."""
    jdf = _bridge(spark).txAnnTopK(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def build_search_store_if_stale(spark, data_dir):
    """Build the positional postings index (q181) if missing or stale;
    returns the store path."""
    return _bridge(spark).buildSearchStoreIfStale(spark._jsparkSession, data_dir)


def absorb_search_delta(spark, data_dir):
    """Append the delta's postings + stat partial (union merge)."""
    _bridge(spark).absorbSearchDelta(spark._jsparkSession, data_dir)


def search_bm25(spark, data_dir):
    """q99's BM25 top-10 answered from the index alone."""
    jdf = _bridge(spark).searchBm25(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def search_phrase(spark, data_dir, a="merge", b="window"):
    """Positional phrase search: docs where ``a`` is immediately
    followed by ``b``, ranked by occurrence count (q182)."""
    jdf = _bridge(spark).searchPhrase(spark._jsparkSession, data_dir, a, b)
    return DataFrame(jdf, spark)


def proximity_search(spark, data_dir):
    """Proximity-boosted composed ranking (q213): BM25 OR-candidates
    re-ranked by the exact-bigram adjacency boost BEFORE the top-10 cut
    — both legs answered from one pruned postings scan."""
    jdf = _bridge(spark).proximitySearch(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def compact_search_store(spark, data_dir):
    """Fold appended posting layers, one file per term bucket."""
    _bridge(spark).compactSearchStore(spark._jsparkSession, data_dir)


def tx_ensure_search_base(spark, data_dir):
    """Build/guard the search tier's immutable transactional base."""
    _bridge(spark).txEnsureSearchBase(spark._jsparkSession, data_dir)


def tx_absorb_search(spark, data_dir, tranche_pred):
    """Atomically absorb one doc tranche's postings + stats as a
    transaction (q185); returns the txn id."""
    return _bridge(spark).txAbsorbSearch(
        spark._jsparkSession, data_dir, tranche_pred)


def tx_search_bm25(spark, data_dir):
    """BM25 off the transactional index (base + committed layers)."""
    jdf = _bridge(spark).txSearchBm25(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def build_zonemap_store_if_stale(spark, data_dir):
    """Cluster + zone the base slice (q183) if missing or stale;
    returns the store path."""
    return _bridge(spark).buildZoneMapStoreIfStale(spark._jsparkSession, data_dir)


def absorb_zonemap_delta(spark, data_dir):
    """Append the delta's files and zone only the new ones."""
    _bridge(spark).absorbZoneMapDelta(spark._jsparkSession, data_dir)


def zonemap_range_aggregate(spark, data_dir):
    """The zone-pruned range aggregate (q183's read)."""
    jdf = _bridge(spark).zoneMapRangeAggregate(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def recluster_zonemap(spark, data_dir):
    """Re-range overlapping absorbed files back to disjoint zones
    (q188's OPTIMIZE pass)."""
    _bridge(spark).reclusterZoneMap(spark._jsparkSession, data_dir)


def tx_ensure_zone_base(spark, data_dir):
    """Build/guard the table tier's clustered transactional base."""
    _bridge(spark).txEnsureZoneBase(spark._jsparkSession, data_dir)


def tx_absorb_table_append(spark, data_dir, tranche_pred):
    """Atomically append one order tranche — data files + manifest rows
    behind one commit row (q191); returns the txn id."""
    return _bridge(spark).txAbsorbTableAppend(
        spark._jsparkSession, data_dir, tranche_pred)


def tx_absorb_table_delete(spark, data_dir, pred):
    """Atomically retire a key slice as a delete-vector commit (q193)."""
    return _bridge(spark).txAbsorbTableDelete(
        spark._jsparkSession, data_dir, pred)


def tx_table_range_aggregate(spark, data_dir):
    """The range aggregate over the committed manifest minus the
    committed delete vector."""
    jdf = _bridge(spark).txTableRangeAggregate(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def tx_table_range_aggregate_as_of(spark, data_dir, max_txn):
    """The same read as of transaction ``max_txn`` (q192 time travel)."""
    jdf = _bridge(spark).txTableRangeAggregateAsOf(
        spark._jsparkSession, data_dir, max_txn)
    return DataFrame(jdf, spark)


def tx_vacuum_table(spark, data_dir):
    """Reclaim layout files no manifest references; returns their paths."""
    return list(_bridge(spark).txVacuumTable(spark._jsparkSession, data_dir))


def tx_absorb_table_upsert(spark, data_dir, pred, set_expr):
    """MERGE INTO as one transaction (q195): delete the matching keys
    and append the replacing rows (``set_expr`` rewrites o_totalprice)
    at the same sequence number; returns the txn id."""
    return _bridge(spark).txAbsorbTableUpsert(
        spark._jsparkSession, data_dir, pred, set_expr)


def tx_table_changelog(spark, data_dir):
    """Per-transaction rows-added / keys-deleted from the log (q196)."""
    jdf = _bridge(spark).txTableChangelog(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def tx_search_bm25_as_of(spark, data_dir, max_txn):
    """BM25 as of transaction ``max_txn`` (q197 search time travel)."""
    jdf = _bridge(spark).txSearchBm25AsOf(
        spark._jsparkSession, data_dir, max_txn)
    return DataFrame(jdf, spark)


def tx_absorb_table_replace(spark, data_dir, tranche_pred):
    """INSERT OVERWRITE: atomically swap the table content for the
    tranche (q198); returns the txn id."""
    return _bridge(spark).txAbsorbTableReplace(
        spark._jsparkSession, data_dir, tranche_pred)


def tx_mat_view(spark, data_dir):
    """The incremental materialized view's read (q203) — merged
    per-commit partials, the table itself never opened."""
    jdf = _bridge(spark).txMatView(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def audit_expectations(spark, data_dir):
    """The one-scan expectations contract report (q199)."""
    jdf = _bridge(spark).auditExpectations(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def audit_k_anonymity(spark, data_dir, k=6):
    """Quasi-identifier groups below the anonymity threshold (q200)."""
    jdf = _bridge(spark).auditKAnonymity(spark._jsparkSession, data_dir, k)
    return DataFrame(jdf, spark)


def audit_fk(spark, data_dir):
    """Orphan-foreign-key counts across the star schema (q201)."""
    jdf = _bridge(spark).auditFk(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_kmeans(spark, data_dir):
    """Two exactly-replayable Lloyd's rounds over the embeddings (q207):
    (cid, n_members, cent_sum) per cluster."""
    jdf = _bridge(spark).mlKmeans(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_perceptron(spark, data_dir):
    """Three batch-perceptron rounds (q208): per-round misclassification
    counts and model checksums."""
    jdf = _bridge(spark).mlPerceptron(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_knn_classify(spark, data_dir):
    """5-NN majority-vote confusion matrix over the bounded md5-rank
    eval set (q209)."""
    jdf = _bridge(spark).mlKnnClassify(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_dbscan(spark, data_dir):
    """DBSCAN over the embedding slice (q210): (cluster_id, n_core,
    n_border) plus the -1 noise row."""
    jdf = _bridge(spark).mlDbscan(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_knn_ann(spark, data_dir):
    """q214's production kNN: 5-NN vote over fixed-hyperplane bucket
    candidates, exact integer re-rank — the oracled approximate path."""
    jdf = _bridge(spark).mlKnnAnn(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_ann_recall(spark, data_dir):
    """q215's oracled recall audit: overlap@5 histogram between the
    exact and bucket-pruned 5-NN (hash-checked recall measurement)."""
    jdf = _bridge(spark).mlAnnRecall(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_ivf_recall(spark, data_dir):
    """q219's oracled IVF recall audit: overlap@5 histogram between the
    exact 5-NN and the nprobe=2 inverted-list candidates."""
    jdf = _bridge(spark).mlIvfRecall(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_pq_recall(spark, data_dir):
    """q220's oracled PQ recall audit: overlap@5 histogram between the
    exact 5-NN and the reconstruction-ADC ranking (hash-checked)."""
    jdf = _bridge(spark).mlPqRecall(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_ivfpq_recall(spark, data_dir):
    """q221's oracled IVF-PQ recall audit: overlap@5 under list pruning
    plus residual-code quantization (the IVFADC composition)."""
    jdf = _bridge(spark).mlIvfPqRecall(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_sem_dedup(spark, data_dir):
    """q217's SemDeDup pass: deterministic k-means blocking, then
    within-cluster near-dup drops (smaller-id keeper rule)."""
    jdf = _bridge(spark).mlSemDedup(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def ml_proto_prune(spark, data_dir):
    """q218's D4-style prototype pruning: drop the closest-to-centroid
    quarter of each cluster, keep the diverse tail."""
    jdf = _bridge(spark).mlProtoPrune(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def build_cluster_store_if_stale(spark, data_dir):
    """Train + freeze the cluster-profile store's centroids if missing,
    stale, or torn (q211); returns the store root."""
    return _bridge(spark).buildClusterStoreIfStale(
        spark._jsparkSession, data_dir)


def absorb_cluster_delta(spark, data_dir):
    """Assign the delta against the frozen geometry and append its
    k-sized partial — idempotent for an unchanged absorbed batch."""
    _bridge(spark).absorbClusterDelta(spark._jsparkSession, data_dir)


def cluster_profile(spark, data_dir):
    """The merged cluster profile (q211) — k rows with e6 shares, read
    from the store alone."""
    jdf = _bridge(spark).clusterProfile(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def cluster_drift(spark, data_dir):
    """Corpus-vs-delta cluster shares and absolute drift (q212)."""
    jdf = _bridge(spark).clusterDrift(spark._jsparkSession, data_dir)
    return DataFrame(jdf, spark)


def compact_cluster_store(spark, data_dir):
    """Fold the batch partials to one row per (cid, batch) — reads are
    invariant."""
    _bridge(spark).compactClusterStore(spark._jsparkSession, data_dir)


def release_caches(spark):
    """Unpersist every cache a query build registered (the consumer side
    of the library's cache protocol) — call after each terminal action."""
    _bridge(spark).releaseCaches()
