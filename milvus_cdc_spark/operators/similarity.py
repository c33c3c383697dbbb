"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. The join is
  queries x corpus; with a small query set Spark broadcasts it and the
  scan streams the corpus once — the right exact plan at any corpus size.
- ``lsh_topk``: sign-random-projection LSH. Corpus and queries are
  bucketed by ``n_planes`` hyperplane sign bits (deterministic md5-seeded
  planes); candidates = same bucket (multi-probe: exact bucket plus all
  1-bit-flip neighbors), then exact cosine rank within candidates. At
  scale the shuffle keys on bucket ids — never O(n·m).
- ``ivf_topk``: IVF-style two-stage search with k-means-free centroids
  (deterministic hash-sampled corpus rows as centroids): assign corpus
  to nearest centroid (nprobe=1 build), probe the ``nprobe`` nearest
  centroids per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from milvus_cdc_spark.functions.vectors import cosine_milli, dot


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, rank, cosine_micro).

    Self-matches excluded. Ties broken by neighbor id — fully
    deterministic output (integers only), so SQL-oracle-checkable.
    """
    from milvus_cdc_spark.functions.vectors import dot, norm

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        # spread the streamed corpus: a single-file corpus would otherwise
        # run the whole queries x corpus scoring loop as one task
    ).repartition(2 * corpus.sparkSession.sparkContext.defaultParallelism)
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.floor(dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")) * 1e6)
            .cast("bigint")
            .alias("cosine_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_micro"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_micro")
    )


def _plane(dim: int, p: int, j: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1)."""
    import hashlib

    h = int(hashlib.md5(f"plane:{p}:{j}".encode()).hexdigest()[:15], 16)
    return (h % 2000003) / 1000001.5 - 1.0


def _bucket_expr(vec_col, dim: int, n_planes: int, plane_offset: int = 0):
    """Sign-random-projection bucket id (``plane_offset`` selects an
    independent plane family so multiple hash tables can coexist)."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(_plane(dim, plane_offset + p, j)) for j in range(dim)])
        bits.append(
            F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank within same-or-adjacent LSH bucket."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _bucket_expr(vec_col, dim, n_planes).alias("bucket"),
    )
    # multi-probe: query probes its bucket and every 1-bit-flip neighbor
    probes = F.array(
        F.col("qb"), *[F.col("qb").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)]
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            _bucket_expr(vec_col, dim, n_planes).alias("qb"),
        )
        .select("query_id", "qv", F.explode(probes).alias("bucket"))
    )
    scored = (
        F.broadcast(q)
        .join(c, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_milli(F.col("qv"), F.col("cv")).alias("cosine_micro"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_micro"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_micro")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: centroids = deterministic corpus sample; corpus rows
    assigned to nearest centroid; each query probes ``nprobe`` centroids."""
    # centroid sample = first n by md5(id): order-stable under ANY file
    # layout / partitioning (a bare limit() takes whatever partition
    # happens to be scanned first), cheap at scale (TakeOrdered keeps
    # n_centroids rows per partition), and SQL-mirrorable for the oracle
    cent = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_centroids)
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    # assign corpus rows to nearest centroid (broadcast centroids)
    w_assign = Window.partitionBy("neighbor_id").orderBy(
        F.desc("sim"), F.asc("cid")
    )
    assigned = (
        c.join(F.broadcast(cent))
        .select("neighbor_id", "cv", "cid", cosine_milli(F.col("cv"), F.col("cvec")).alias("sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cv", F.col("cid").alias("cell"))
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        F.broadcast(q)
        .join(F.broadcast(cent))
        .select("query_id", "qv", "cid", cosine_milli(F.col("qv"), F.col("cvec")).alias("sim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("cid").alias("cell"))
    )
    scored = probes.join(assigned, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        cosine_milli(F.col("qv"), F.col("cv")).alias("cosine_micro"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_micro"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_micro")
    )


# ---------------------------------------------------------------------------
# Maintained IVF index: the 100 TB search path. `ivf_topk` above rebuilds
# its cell assignments per call — fine for one-shot analytics, wrong for a
# corpus that a CDC task keeps changing. A real IVF index (Milvus IVF_FLAT
# — the index type the reference's e2e suite creates on the target before
# searching it, tests/base/client_base.py) fixes its centroids at build
# time and maintains per-cell posting lists as rows arrive; rebuilds are
# occasional maintenance, not per-query work. Mirrored here: centroids
# FROZEN at bootstrap, the (vec_id, cell, v) index advanced per
# `changes()` diff at cost ∝ |diff| (assignment touches only moved
# vectors), searches probing nprobe cells via an equi-join against the
# maintained index — never a corpus re-assignment.
# ---------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Freeze an IVF centroid set: the md5-order-stable first
    ``n_centroids`` corpus rows (same deterministic sample rule as
    ``ivf_topk``, so the choice is SQL-mirrorable and independent of file
    layout). Returns (cid, cvec) — small enough to broadcast always."""
    return (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
        .limit(n_centroids)
    )


def _assign_cells(
    vecs: DataFrame, centroids: DataFrame
) -> DataFrame:
    """Assign (doc_key, v) rows to their nearest centroid (broadcast
    centroids, one map-side pass over the vectors — no shuffle of the
    corpus side). Ties break toward the smaller cid."""
    w = Window.partitionBy("doc_key").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        vecs.join(F.broadcast(centroids))
        .select(
            "doc_key", "v", "cid",
            cosine_milli(F.col("v"), F.col("cvec")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_key", F.col("cid").alias("cell"), "v")
    )


def ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bootstrap the maintained IVF index over an initial corpus:
    (doc_key, cell, v). Run ONCE per centroid set; afterwards
    :func:`ivf_index_incremental` advances it by CDC diffs."""
    return _assign_cells(
        corpus.select(F.col(id_col).alias("doc_key"), F.col(vec_col).alias("v")),
        centroids,
    )


def ivf_index_incremental(
    index: DataFrame,
    centroids: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_key",
    vec_col: str = "embedding",
) -> DataFrame:
    """Advance a maintained IVF index by a ``changes()`` diff: deleted and
    updated keys leave via one anti-join, fresh post-images are assigned
    to their nearest (frozen) centroid — assignment cost ∝ |diff|, never
    a corpus re-read. Rounds chain; the invariant (oracle-checked by
    ``ann_ivf_incremental``) is bootstrap + N rounds ≡ a fresh
    :func:`ivf_index` over the final corpus with the SAME centroids —
    exact equality, because a cell id is a pure function of (vector,
    centroid set) and the centroid set never moves between rebuilds."""
    ct = F.col("change_type")
    retired = changes.filter(ct.isin("delete", "update")).select(
        F.col(key_col).alias("doc_key")
    )
    fresh = changes.filter(ct.isin("insert", "update")).select(
        F.col(key_col).alias("doc_key"), F.col(vec_col).alias("v")
    )
    return (
        # retired is diff-sized — hinted so the posting table is never
        # shuffled even when the diff arrives without size stats
        index.join(F.broadcast(retired), "doc_key", "left_anti")
        .unionByName(_assign_cells(fresh, centroids))
    )


def ivf_search(
    index: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a maintained IVF index: per query, rank the (broadcast)
    centroids, probe the ``nprobe`` nearest cells via an equi-join on the
    index's cell column, exact-cosine rank within the candidates. Same
    output contract and scoring as ``ivf_topk`` — (query_id, neighbor_id,
    rank, cosine_micro), self-matches excluded, integer-deterministic."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (
        F.broadcast(q)
        .join(F.broadcast(centroids))
        .select(
            "query_id", "qv", "cid",
            cosine_milli(F.col("qv"), F.col("cvec")).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("cid").alias("cell"))
    )
    scored = (
        probes.join(index, "cell")
        .filter(F.col("query_id") != F.col("doc_key"))
        .select(
            "query_id",
            F.col("doc_key").alias("neighbor_id"),
            cosine_milli(F.col("qv"), F.col("v")).alias("cosine_micro"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_micro"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_micro")
    )
