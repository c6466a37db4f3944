"""HNSW approximate nearest-neighbor search, sharded the way
OpenSearch actually runs it (SURVEY §2.7 knn row; §2.10 E3).

OpenSearch's k-NN plugin default method is ``hnsw`` — every shard
holds its own Hierarchical Navigable Small World graph, a query fans
out to all shards, each searches its local graph, and the coordinator
merges the per-shard top-k (the same scatter-gather the reference's
index writes feed via the OSIS pipeline, custom_resource.py:343-383).
This module reproduces that exact topology on Spark:

- **build**: vectors hash-partition into ``n_shards`` shards
  (``xxhash64(id) % n_shards`` — deterministic, rendezvous-stable
  under refresh); one ``applyInPandas`` group per shard constructs the
  graph (Malkov & Yashunin, "Efficient and robust approximate nearest
  neighbor search using Hierarchical Navigable Small World graphs",
  arXiv:1603.09320) and emits it as plain rows — one row per node
  carrying its level, per-layer adjacency and normalized vector. The
  index is therefore a normal DataFrame: parquet-materializable,
  partition-prunable by shard, and publishable through the same
  atomic-version machinery as the LSH/IVF indexes.
- **query**: the query vector broadcasts in the task closure; each
  shard group reconstructs its graph from the rows and beam-searches
  (``ef_search``), emitting its local top-k; a global
  TakeOrderedAndProject merges — exactly the coordinator step. The
  corpus never shuffles at query time.
- **determinism**: insertion order is vec_id-sorted and level
  assignment derives from splitmix64(vec_id) instead of an RNG, so
  the same corpus always builds the same graph — which is what makes
  ``refresh_hnsw_index`` (rebuild only the shards a CDC delta
  touches) bit-identical to a full rebuild, and what keeps the
  recall property tests stable.

Scale shape: each shard's graph must fit one executor (pick
``n_shards`` ≈ corpus_rows / 1M at 100 TB); build is ONE shuffle by
shard hash then embarrassingly-parallel Python-graph construction per
group; queries are a scan of the (pruned) index partitions + k rows
per shard to the merge. Unlike IVF, recall does not depend on the
query landing in the right cell — every shard is searched, so the
only approximation is the graph's (tunable via m / ef_search).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_INDEX_SCHEMA = (
    "_shard int, node int, vec_id long, level int, "
    "neighbors array<array<int>>, _emb array<double>"
)


def _splitmix64(x: int) -> int:
    """Deterministic 64-bit mix (public splitmix64 finalizer) — level
    assignment must not depend on an RNG or the build is unstable."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _level_of(vec_id: int, m: int, cap: int = 8) -> int:
    """HNSW level draw l = floor(-ln(u) · mL), mL = 1/ln(m), with u
    derived from the id hash — same geometric distribution as the
    paper's RNG draw, but reproducible."""
    u = (_splitmix64(int(vec_id)) >> 11) / float(1 << 53)  # (0,1)
    u = max(u, 1e-18)
    return min(int(-math.log(u) / math.log(m)), cap)


def _search_layer(vn, adj, q, entries, ef, level):
    """Beam search one layer (alg. 2 of the paper). ``vn`` is the
    (n, dim) normalized-vector matrix, similarity = dot (cosine).
    Returns a list of (sim, node), unordered, len ≤ ef."""
    import heapq

    import numpy as np

    visited = set(entries)
    result = []  # min-heap of (sim, node) — worst kept on top
    cand = []  # max-heap via (-sim, node)
    for e in entries:
        s = float(vn[e] @ q)
        heapq.heappush(result, (s, e))
        heapq.heappush(cand, (-s, e))
    while cand:
        neg, u = heapq.heappop(cand)
        if len(result) >= ef and -neg < result[0][0]:
            break
        fresh = [v for v in adj[u][level] if v not in visited]
        if not fresh:
            continue
        visited.update(fresh)
        sims = np.asarray(vn[fresh] @ q, dtype="float64")
        for v, s in zip(fresh, sims):
            s = float(s)
            if len(result) < ef or s > result[0][0]:
                heapq.heappush(cand, (-s, v))
                heapq.heappush(result, (s, v))
                if len(result) > ef:
                    heapq.heappop(result)
    return result


def _greedy_descent(vn, adj, q, entry, level):
    """ef=1 upper-layer descent: follow the best neighbor until no
    neighbor improves (alg. 1's zoom-in phase)."""
    best, best_s = entry, float(vn[entry] @ q)
    improved = True
    while improved:
        improved = False
        neigh = adj[best][level]
        if not neigh:
            break
        sims = vn[neigh] @ q
        j = int(sims.argmax())
        if float(sims[j]) > best_s:
            best, best_s, improved = neigh[j], float(sims[j]), True
    return best


def _build_graph(vn, levels, m, ef_construction):
    """Insert nodes 0..n-1 (already vec_id-sorted) into a fresh graph.
    Neighbor selection is the simple top-m heuristic; back-links prune
    to m (2m at layer 0) keeping the closest. Returns adjacency:
    adj[node][layer] -> list of node ids."""
    import numpy as np

    n = len(levels)
    adj: list[list[list[int]]] = []
    entry, max_l = 0, levels[0] if n else 0
    for i in range(n):
        li = levels[i]
        adj.append([[] for _ in range(li + 1)])
        if i == 0:
            continue
        q = vn[i]
        ep = entry
        for lev in range(max_l, li, -1):
            ep = _greedy_descent(vn, adj, q, ep, lev)
        for lev in range(min(li, max_l), -1, -1):
            found = _search_layer(vn, adj, q, [ep], ef_construction, lev)
            found.sort(reverse=True)
            neigh = [v for _, v in found[:m]]
            adj[i][lev] = list(neigh)
            m_max = 2 * m if lev == 0 else m
            for v in neigh:
                links = adj[v][lev]
                links.append(i)
                if len(links) > m_max:
                    sims = vn[links] @ vn[v]
                    order = np.argsort(-sims)[:m_max]
                    adj[v][lev] = [links[j] for j in order]
            if neigh:
                ep = neigh[0]
        if li > max_l:
            entry, max_l = i, li
    return adj


def _graph_entry(levels):
    """Query-side entry point: the max-level node, smallest node id on
    ties — recomputable from the rows, so it needs no extra column.
    (Build-side insertion promotes the FIRST node to reach each new
    max level, which under vec_id-sorted insertion is the same node.)"""
    best, best_l = 0, -1
    for i, l in enumerate(levels):
        if l > best_l:
            best, best_l = i, l
    return best, best_l


def build_hnsw_index(
    df: DataFrame,
    n_shards: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 64,
) -> DataFrame:
    """Build per-shard HNSW graphs; returns the index as rows
    (``_shard, node, vec_id, level, neighbors, _emb``). ``node`` is
    the vec_id-sorted position within the shard; ``neighbors[layer]``
    lists node ids; ``_emb`` is the L2-normalized vector (doubles), so
    query scoring is a pure dot product. One shuffle (by shard hash),
    then per-group numpy construction."""
    mm, efc = int(m), int(ef_construction)

    def build(pdf):
        import numpy as np
        import pandas as pd

        if pdf.empty:
            return pd.DataFrame(
                {c: [] for c in ("_shard", "node", "vec_id", "level", "neighbors", "_emb")}
            )
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        vecs = np.asarray([np.asarray(v, dtype="float64") for v in pdf["_v"]])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        vn = vecs / norms
        ids = pdf["vec_id"].tolist()
        levels = [_level_of(i, mm) for i in ids]
        adj = _build_graph(vn, levels, mm, efc)
        return pd.DataFrame(
            {
                "_shard": pdf["_shard"],
                "node": range(len(ids)),
                "vec_id": ids,
                "level": levels,
                "neighbors": [
                    [[int(x) for x in layer] for layer in node_adj]
                    for node_adj in adj
                ],
                "_emb": [row.tolist() for row in vn],
            }
        )

    prepared = df.select(
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("_shard"),
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    return prepared.groupBy("_shard").applyInPandas(build, _INDEX_SCHEMA)


def _searcher(queries, k, ef_search):
    """Grouped-map search fn over one shard's index rows for all
    queries (broadcast in the closure as [(qid, normalized vec)])."""

    def search(pdf):
        import numpy as np
        import pandas as pd

        if pdf.empty:
            return pd.DataFrame({"_qid": [], "vec_id": [], "_score": []})
        pdf = pdf.sort_values("node").reset_index(drop=True)
        vn = np.asarray([np.asarray(v, dtype="float64") for v in pdf["_emb"]])
        adj = [
            [list(layer) for layer in node_adj] for node_adj in pdf["neighbors"]
        ]
        levels = pdf["level"].tolist()
        ids = pdf["vec_id"].to_numpy()
        entry, max_l = _graph_entry(levels)
        out_q, out_id, out_s = [], [], []
        for qid, q in queries:
            q = np.asarray(q, dtype="float64")
            ep = entry
            for lev in range(max_l, 0, -1):
                ep = _greedy_descent(vn, adj, q, ep, lev)
            found = _search_layer(vn, adj, q, [ep], max(ef_search, k), 0)
            found.sort(key=lambda t: (-t[0], ids[t[1]]))
            for s, node in found[:k]:
                out_q.append(qid)
                out_id.append(int(ids[node]))
                out_s.append(s)
        return pd.DataFrame({"_qid": out_q, "vec_id": out_id, "_score": out_s})

    return search


def _normalized(vec):
    n = math.sqrt(sum(x * x for x in vec))
    return [float(x) / n for x in vec] if n else [float(x) for x in vec]


def query_hnsw_topk(
    index: DataFrame,
    query_vec: list[float],
    k: int = 10,
    ef_search: int = 50,
) -> DataFrame:
    """Scatter-gather one query: every shard beam-searches its graph
    (ef_search), k rows per shard reach the global top-k merge
    (TakeOrderedAndProject — the OpenSearch coordinator step).
    Returns (vec_id, _score) with _score = exact cosine."""
    search = _searcher([(0, _normalized(query_vec))], int(k), int(ef_search))
    hits = index.groupBy("_shard").applyInPandas(
        search, "_qid int, vec_id long, _score double"
    )
    return (
        hits.select("vec_id", "_score")
        .orderBy(F.desc("_score"), F.asc("vec_id"))
        .limit(int(k))
    )


def query_hnsw_topk_multi(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    ef_search: int = 50,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
) -> DataFrame:
    """Batch variant: the (small) query set collects once into the
    task closure, every shard searches all queries in one pass over
    its graph, and a per-query window keeps the global top-k. Shards ×
    queries × k rows shuffle — never the corpus."""
    # bounded: the query set is the small side by contract (it rides the
    # task closure to every shard); |queries| rows, never the corpus
    qrows = queries.select(qid_col, qvec_col).collect()
    qs = [(int(r[0]), _normalized(list(r[1]))) for r in qrows]
    search = _searcher(qs, int(k), int(ef_search))
    hits = index.groupBy("_shard").applyInPandas(
        search, "_qid int, vec_id long, _score double"
    )
    win = W.partitionBy("_qid").orderBy(F.desc("_score"), F.asc("vec_id"))
    return (
        hits.withColumn("_rank", F.row_number().over(win))
        .filter(F.col("_rank") <= int(k))
        .select(F.col("_qid").alias(qid_col), "vec_id", "_score", "_rank")
    )


def hnsw_ann_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_shards: int = 4,
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-shot HNSW ANN: build the sharded graphs, scatter-gather the
    query. For repeated queries materialize :func:`build_hnsw_index`
    once (parquet partitioned by ``_shard``) and call
    :func:`query_hnsw_topk` — the materialize-once design the LSH/IVF
    indexes share (custom_resource.py:343-383)."""
    index = build_hnsw_index(df, n_shards, id_col, vec_col, m, ef_construction)
    return query_hnsw_topk(index, query_vec, k, ef_search)


def refresh_hnsw_index(
    index: DataFrame,
    corpus: DataFrame,
    changed_or_deleted_ids: DataFrame,
    n_shards: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 64,
) -> DataFrame:
    """Delta maintenance under CDC: a graph cannot absorb per-row edits
    the way the LSH/IVF row-indexes can (links are global within a
    shard), but shards are independent — so rebuild ONLY the shards the
    delta touches, from the already-updated ``corpus``, and keep every
    untouched shard's rows as-is. Deterministic construction makes the
    result bit-identical to a full rebuild. Cost: |touched shards| /
    n_shards of a build; a micro-batch delta typically touches few."""
    touched = (
        changed_or_deleted_ids.select(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards))
            .cast("int")
            .alias("_shard")
        )
        .distinct()
    )
    kept = index.join(F.broadcast(touched), on="_shard", how="left_anti")
    delta_corpus = corpus.join(
        F.broadcast(touched),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)).cast("int")
        == touched["_shard"],
        how="left_semi",
    )
    rebuilt = build_hnsw_index(
        delta_corpus, n_shards, id_col, vec_col, m, ef_construction
    )
    return kept.unionByName(rebuilt)
