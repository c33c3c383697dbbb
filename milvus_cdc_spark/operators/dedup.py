"""Document deduplication family for training-data pipelines.

Four strategies with different scale profiles, all DataFrame-native:

- exact        one hash-aggregate; the 100 TB workhorse (shuffle on an
               md5 group key, map-side combine)
- minhash_lsh  shingle → minhash signature → band buckets → candidate
               pairs via bucket self-join → exact-jaccard verify. The
               self-join touches only same-bucket pairs: at scale the
               shuffle is on band-hash keys, never the O(n²) cross join.
- simhash      32-bit simhash, candidates = identical band of the hash
               (hamming-ball via 4x8-bit bands), verify by hamming dist.
- ngram_jaccard  brute-force pairwise verify — quadratic; kept as the
               correctness baseline and for small partitions only.

Hashing is md5-based (functions.text.portable_hash64) so every strategy
is reproducible in ANSI SQL for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from milvus_cdc_spark.caching import CacheScope, default_scope
from milvus_cdc_spark.functions import text as TXT

# pairwise baselines broadcast the corpus side only below this row count —
# above it the 8GB broadcast limit / driver memory becomes the failure mode
_BROADCAST_ROW_CAP = 200_000

# quadratic correctness baselines warn above this input size: they stay
# runnable (degrading to a shuffle join) but the LSH siblings are the
# production path
_QUADRATIC_WARN_ROWS = 100_000


def _warn_quadratic(n_rows: int, op: str, sibling: str) -> None:
    if n_rows > _QUADRATIC_WARN_ROWS:
        import warnings

        warnings.warn(
            f"{op} is a quadratic correctness baseline "
            f"({n_rows:,} rows -> {n_rows * (n_rows - 1) // 2:,} pairs); "
            f"use {sibling} at scale",
            RuntimeWarning,
            stacklevel=3,
        )


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Keeper per exact (normalized) text group: min id. Returns
    (doc_id, keep) for every doc — keep=false marks removable dups.

    The skinny (id, fp) projection is persisted so the keeper aggregate
    and the join side read ONE scan of the source (at 100 TB the second
    full-table read would dominate the md5)."""
    fp = TXT.fingerprint(F.col(text_col))
    ids = (scope or default_scope()).persist(
        df.select(F.col(id_col), fp.alias("fp"))
    )
    keeper = ids.groupBy("fp").agg(
        F.min(id_col).alias("keeper_id"), F.count("*").alias("group_size")
    )
    return (
        ids.join(keeper, "fp")
        .select(
            F.col(id_col),
            (F.col(id_col) == F.col("keeper_id")).alias("keep"),
            F.col("group_size"),
        )
    )


def _shingle_df(
    df: DataFrame, k: int, text_col: str, id_col: str, scope: CacheScope
) -> DataFrame:
    """(id, sh) with tokens and shingles STAGED through persisted
    projections — each stage reads the previous as a plain attribute, so
    the regex split and shingle assembly run exactly once per row (see
    functions.text.shingles_from_tokens for why inlining is 25x slower).
    Persists are registered on ``scope`` (see caching.CacheScope)."""
    toks = scope.persist(
        df.select(F.col(id_col).alias("id"), TXT.tokens(F.col(text_col)).alias("toks"))
    )
    return scope.persist(
        toks.select(
            "id",
            F.array_distinct(TXT.shingles_from_tokens(F.col("toks"), k)).alias("sh"),
        )
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    threshold_milli: int = 500,
    k: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over ALL pairs (quadratic — baseline only).

    Output: (doc_a, doc_b, jaccard_milli) for pairs with jaccard*1000 >=
    threshold, a < b. Integer jaccard_milli keeps the oracle float-free.
    """
    sh = _shingle_df(df, k, text_col, id_col, scope or default_scope())
    par = 2 * df.sparkSession.sparkContext.defaultParallelism
    a, b = sh.repartition(par).alias("a"), sh.alias("b")
    # broadcast only when the build side is safely small — this operator is
    # the quadratic correctness baseline, but it must not OOM the driver
    # when someone points it at a large corpus (the repartitioned stream
    # side alone already fixes single-file-input parallelism). The count
    # runs on the INPUT df (one shingle row per doc), so a parquet source
    # answers it from footer stats without materializing the shingle cache.
    n = df.count()
    _warn_quadratic(n, "shingle_jaccard_pairs", "minhash_lsh_pairs")
    b_side = F.broadcast(b) if n <= _BROADCAST_ROW_CAP else b
    pairs = a.join(b_side, F.col("a.id") < F.col("b.id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = (inter * 1000 / union).cast("bigint")
    return (
        pairs.select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            jac.alias("jaccard_milli"),
        )
        .filter(F.col("jaccard_milli") >= threshold_milli)
    )


def _banded(df: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """(id, band, bucket) LSH-band projection of a signature frame
    (id, sig). Pure JVM expressions: md5 over the band's signature slice,
    exactly mirrored by the DuckDB oracle SQL."""
    rows_per_band = n_hashes // bands
    return df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig").getItem(bi * rows_per_band + r)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold_milli: int = 500,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified by exact jaccard.

    Candidate generation: signature split into ``bands`` bands of
    ``n_hashes/bands`` rows; docs sharing any band bucket are candidates.
    The self-join keys on (band_idx, band_hash) — the only shuffle that
    matters at scale; no O(n²) stage. Verification recomputes exact
    shingle jaccard on candidates only.
    """
    rows_per_band = n_hashes // bands
    scope = scope or default_scope()
    # staged + persisted: each level reads attributes, never re-inlined
    # expressions (tokens/shingles/signature each computed once per row)
    base = scope.persist(
        _shingle_df(df, k, text_col, id_col, scope).select(
            "id", "sh", TXT.minhash_from_shingles(F.col("sh"), n_hashes).alias("sig")
        )
    )
    # candidate generation on IDS ONLY: carrying the shingle arrays
    # through the banded self-join would replicate every array `bands`
    # times through the join + pair-dedup shuffles; instead the skinny
    # (id, band, bucket) rows shuffle, and the arrays are fetched back
    # with two id-keyed joins against the (persisted) base — one array
    # copy per side, independent of band count
    banded = _banded(base, n_hashes, bands)

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sh = base.select("id", "sh")
    pairs = (
        cand.join(sh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = (inter * 1000 / union).cast("bigint")
    return pairs.select(
        "doc_a", "doc_b", jac.alias("jaccard_milli")
    ).filter(F.col("jaccard_milli") >= threshold_milli)


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 32,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: candidates share >=1 of ``bands`` hash bands
    (pigeonhole: hamming<=bands-1 guarantees a shared band), verified by
    exact hamming distance <= max_hamming."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    scope = scope or default_scope()
    th = scope.persist(
        df.select(
            F.col(id_col).alias("id"),
            F.transform(TXT.tokens(F.col(text_col)), lambda t: TXT.portable_hash64(t)).alias("th"),
        )
    )
    base = scope.persist(  # staged: token hashes computed once, then 32 bit-votes read them
        th.select("id", TXT.simhash_from_hashes(F.col("th"), bits).alias("sim"))
    )
    banded = base.select(
        "id",
        "sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("sim"), bi * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sim", "bb.band", "bb.bucket")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"),
            F.col("a.sim").alias("sim_a"), F.col("b.sim").alias("sim_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def embedding_neardup_lsh_pairs(
    df: DataFrame,
    threshold_micro: int = 950000,
    n_planes: int = 4,
    n_tables: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Embedding near-dup pairs at scale: candidates = rows sharing a
    sign-random-projection bucket in ANY of ``n_tables`` independent hash
    tables (each ``n_planes`` hyperplanes), verified by exact cosine.

    The self-join keys on (table, bucket) — the only shuffle at scale is
    on bucket ids, never O(n²); this is the 100 TB path next to the
    quadratic ``embedding_neardup_pairs`` correctness baseline (same
    output contract: (doc_a, doc_b, cosine_micro), a < b, pairs missed by
    every table are approximation loss by design).
    """
    from milvus_cdc_spark.operators.similarity import _bucket_expr

    base = (scope or default_scope()).persist(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    )
    # ids-only candidate generation (same rationale as minhash_lsh_pairs:
    # never replicate the vectors through the per-table bucket join)
    banded = None
    for t in range(n_tables):
        tab = base.select(
            "id",
            F.lit(t).alias("tab"),
            _bucket_expr("v", dim, n_planes, plane_offset=t * n_planes).alias("bucket"),
        )
        banded = tab if banded is None else banded.unionByName(tab)
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tab") == F.col("b.tab"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    from milvus_cdc_spark.functions.vectors import cosine_milli

    pairs = (
        cand.join(base.select(F.col("id").alias("doc_a"), F.col("v").alias("v_a")), "doc_a")
        .join(base.select(F.col("id").alias("doc_b"), F.col("v").alias("v_b")), "doc_b")
    )
    return (
        pairs.select(
            "doc_a", "doc_b", cosine_milli(F.col("v_a"), F.col("v_b")).alias("cosine_micro")
        )
        .filter(F.col("cosine_micro") >= threshold_micro)
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold_micro: int = 950000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine*1e6 >= threshold, a<b).

    Brute-force O(n²) verify — correctness baseline; the scale path is
    operators/similarity.py's LSH-bucketed variant.
    """
    from milvus_cdc_spark.functions.vectors import dot, norm

    # norms computed ONCE per row (cached), not per pair — turns the O(n²)
    # stage from 3 vector reductions per pair into 1
    base = (scope or default_scope()).persist(
        df.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            norm(F.col(vec_col)).alias("nrm"),
        )
    )
    # the streamed side is spread across the cluster: embedding tables are
    # often a single small file, and without this the whole O(n²) scoring
    # loop runs as ONE task regardless of core count
    par = 2 * df.sparkSession.sparkContext.defaultParallelism
    a = base.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("nrm").alias("n_a")
    ).repartition(par)
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("nrm").alias("n_b"))
    n = df.count()
    _warn_quadratic(n, "embedding_neardup_pairs", "embedding_neardup_lsh_pairs")
    b_side = F.broadcast(b) if n <= _BROADCAST_ROW_CAP else b
    pairs = a.join(b_side, F.col("id_a") < F.col("id_b"))
    cm = F.floor(dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")) * 1e6).cast("bigint")
    return (
        pairs.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"),
            cm.alias("cosine_micro"),
        )
        .filter(F.col("cosine_micro") >= threshold_micro)
    )


def dedup_store(
    df: DataFrame,
    key_col: str = "doc_key",
    text_col: str = "text",
) -> DataFrame:
    """Bootstrap a signature store — the skinny (key, fp) projection of a
    corpus that :func:`dedup_exact_incremental` advances by CDC diffs.
    Run ONCE over the initial corpus; afterwards only changed rows are
    ever fingerprinted again."""
    return df.select(
        F.col(key_col).alias("doc_key"),
        TXT.fingerprint(F.col(text_col)).alias("fp"),
    )


def dedup_exact_incremental(
    store: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_key",
    text_col: str = "text",
) -> DataFrame:
    """Advance an exact-dedup signature store by a CDC diff — the
    100 TB incremental story: ``SnapshotTable.changes()`` emits the rows
    that moved between two snapshots, fingerprints are computed for the
    INSERTED/UPDATED rows ONLY (the expensive text hashing costs
    ∝ |changes|, never a corpus re-hash), deleted/updated keys retire
    from the store, and keepers are recomputed over the skinny (key, fp)
    store — a single HashAggregate over two thin columns, the only part
    that still touches the full corpus width⁰.

    ⁰ and deliberately so: a keeper choice can flip when ANY member of
    its group appears/disappears, so keeper recomputation is global —
    but over ~40 bytes/doc, not documents.

    ``store``: (doc_key, fp) from :func:`dedup_store` or a previous round
    (extra columns like keep/group_size are ignored, so rounds chain).
    ``changes``: rows with ``change_type`` ∈ insert|update|delete plus
    ``key_col`` and ``text_col`` (the changes() contract: update rows
    carry the post-image, delete rows the pre-image).

    Returns the advanced store with keep flags:
    (doc_key, fp, keep, group_size). Invariant (oracle-checked by
    ``doc_dedup_incremental``): bootstrap + N incremental rounds ≡ one
    full-corpus :func:`dedup_exact` over the final snapshot.
    """
    retired = changes.filter(
        F.col("change_type").isin("delete", "update")
    ).select(F.col(key_col).alias("doc_key"))
    fresh = changes.filter(
        F.col("change_type").isin("insert", "update")
    ).select(
        F.col(key_col).alias("doc_key"),
        TXT.fingerprint(F.col(text_col)).alias("fp"),
    )
    new_store = (
        store.select("doc_key", "fp")
        # retired is diff-sized (the same contract under which the
        # sibling LSH rounds broadcast their fresh band rows), so the
        # store side must stream map-side — hint it so a missing-stats
        # diff (e.g. read back from disk) can't flip the anti-join into
        # a full shuffle of the corpus store
        .join(F.broadcast(retired), "doc_key", "left_anti")
        .unionByName(fresh)
    )
    keeper = new_store.groupBy("fp").agg(
        F.min("doc_key").alias("keeper_key"), F.count("*").alias("group_size")
    )
    return new_store.join(keeper, "fp").select(
        "doc_key",
        "fp",
        (F.col("doc_key") == F.col("keeper_key")).alias("keep"),
        "group_size",
    )


def passage_store(
    df: DataFrame,
    key_col: str = "doc_key",
    text_col: str = "text",
    window: int = 32,
) -> DataFrame:
    """Bootstrap a passage-fingerprint store: one row per (doc, distinct
    full ``window``-token non-overlapping passage) with its in-doc
    occurrence count — the state :func:`passage_dedup_incremental`
    advances by CDC diffs and :func:`passage_report` folds into the
    cross-doc duplicate-passage report. Partial tail windows are dropped
    (they'd alias prefixes of full windows). One explode + one
    map-side-combinable HashAggregate; rows out ≈ tokens/window."""
    ch = df.select(
        F.col(key_col).alias("doc_key"),
        F.explode(
            TXT.chunks(F.col(text_col), window=window, stride=window)
        ).alias("c"),
    )
    return (
        ch.filter(F.col("c.n_tokens") == window)
        .select("doc_key", F.md5(F.col("c.chunk_text")).alias("passage_fp"))
        .groupBy("doc_key", "passage_fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )


def passage_dedup_incremental(
    store: DataFrame,
    changes: DataFrame,
    key_col: str = "doc_key",
    text_col: str = "text",
    window: int = 32,
) -> DataFrame:
    """Advance a passage store by a CDC diff — the incremental sibling of
    the full-corpus duplicate-passage scan: only the changed documents
    are ever re-chunked (cost ∝ |changes|), retired/updated keys' rows
    leave the store via a broadcast anti-join (the store streams
    map-side, mirroring the dedup/minhash/decontaminate rounds), and
    fresh passages append. Passage fingerprints are pure per-document
    functions, so unlike exact-dedup keepers there is NO global
    recompute step. Invariant (oracle-checked by
    ``doc_passage_incremental``): bootstrap + N rounds ≡
    :func:`passage_store` over the final snapshot, hence the folded
    :func:`passage_report` matches the full recompute too.

    ``changes``: rows with ``change_type`` ∈ insert|update|delete plus
    ``key_col``/``text_col`` (the changes() contract: update rows carry
    the post-image, delete rows the pre-image)."""
    retired = changes.filter(
        F.col("change_type").isin("delete", "update")
    ).select(F.col(key_col).alias("doc_key"))
    fresh = passage_store(
        changes.filter(F.col("change_type").isin("insert", "update")),
        key_col,
        text_col,
        window,
    )
    return (
        store.select("doc_key", "passage_fp", "n_occ")
        .join(F.broadcast(retired), "doc_key", "left_anti")
        .unionByName(fresh)
    )


def passage_report(store: DataFrame) -> DataFrame:
    """Fold a passage store into the duplicate-passage report:
    fingerprints appearing in ≥2 DISTINCT docs, with doc and total
    occurrence counts — the memorization/boilerplate screen doc-level
    MinHash can't see. Single HashAggregate over the skinny store."""
    return (
        store.groupBy("passage_fp")
        .agg(
            F.countDistinct("doc_key").cast("bigint").alias("n_docs"),
            F.sum("n_occ").cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def _sig_frame(
    df: DataFrame,
    n_hashes: int,
    k: int,
    text_col: str,
    id_col: str,
    scope: CacheScope,
) -> DataFrame:
    """(id, sh, sig) minhash-signature projection of a (id, text) frame —
    the per-document unit of work both the batch and incremental LSH
    paths share. Staged through persisted projections like _shingle_df."""
    return scope.persist(
        _shingle_df(df, k, text_col, id_col, scope).select(
            "id", "sh", TXT.minhash_from_shingles(F.col("sh"), n_hashes).alias("sig")
        )
    )


def minhash_store(
    df: DataFrame,
    n_hashes: int = 16,
    k: int = 2,
    text_col: str = "text",
    key_col: str = "doc_key",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Bootstrap a MinHash signature store: (doc_key, sh, sig) for the
    initial corpus. Run ONCE; afterwards :func:`minhash_lsh_incremental`
    advances it by CDC diffs, shingling/hashing only changed rows.

    The store carries the shingle sets alongside the signatures because
    exact-jaccard verification of future candidates needs the OLD side's
    shingles — keeping them is what makes every later round cost
    ∝ |changes|, never a corpus re-tokenization."""
    scope = scope or default_scope()
    return _sig_frame(
        df.select(F.col(key_col).alias("doc_key"), F.col(text_col)),
        n_hashes, k, text_col, "doc_key", scope,
    ).withColumnRenamed("id", "doc_key")


def minhash_lsh_incremental(
    store: DataFrame,
    pairs: DataFrame,
    changes: DataFrame,
    threshold_milli: int = 500,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 2,
    text_col: str = "text",
    key_col: str = "doc_key",
    scope: CacheScope | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Advance a MinHash-LSH near-dup state by a CDC diff — the 100 TB
    incremental near-dup story, the LSH sibling of
    :func:`dedup_exact_incremental`: ``SnapshotTable.changes()`` emits
    the rows that moved between two snapshots; only those rows are
    shingled/hashed; candidate discovery joins the (skinny, broadcast)
    fresh band buckets against the store's band projection — a map-side
    hash join, so the big side is SCANNED once but never SHUFFLED; pairs
    touching retired keys leave the pair set, re-verified pairs enter it.

    ``store``/``pairs``: from :func:`minhash_store` +
    :func:`minhash_lsh_pairs` (bootstrap) or a previous round.
    ``changes``: the changes() contract — ``change_type`` ∈
    insert|update|delete, update rows carry the post-image, delete rows
    the pre-image.

    Returns ``(store', pairs')``. Invariant (oracle-checked by
    ``doc_minhash_incremental``): bootstrap + N incremental rounds ≡ one
    full-corpus :func:`minhash_lsh_pairs` over the final snapshot —
    exact equality, not approximation, because band buckets and jaccard
    are pure functions of the two documents, and every pair has a round
    in which at least one member is fresh.
    """
    scope = scope or default_scope()
    retired = changes.filter(
        F.col("change_type").isin("delete", "update")
    ).select(F.col(key_col).alias("doc_key"))
    fresh = minhash_store(
        changes.filter(F.col("change_type").isin("insert", "update")),
        n_hashes, k, text_col, key_col, scope,
    )
    new_store = scope.persist(
        store.select("doc_key", "sh", "sig")
        # diff-sized build side — hinted so the corpus store is never
        # shuffled even when the diff arrives without size stats
        .join(F.broadcast(retired), "doc_key", "left_anti")
        .unionByName(fresh)
    )

    # candidates = store'-side band rows ⋈ broadcast(fresh band rows):
    # the store side streams map-side (no shuffle of the corpus), the
    # fresh side is |changes|-sized. Pair key is canonicalized so a
    # fresh-fresh pair found from both sides dedupes.
    sb = _banded(new_store.withColumnRenamed("doc_key", "id"), n_hashes, bands)
    fb = _banded(fresh.withColumnRenamed("doc_key", "id"), n_hashes, bands)
    cand = (
        sb.alias("s")
        .join(
            F.broadcast(fb.alias("f")),
            (F.col("s.band") == F.col("f.band"))
            & (F.col("s.bucket") == F.col("f.bucket"))
            & (F.col("s.id") != F.col("f.id")),
        )
        .select(
            F.least("s.id", "f.id").alias("doc_a"),
            F.greatest("s.id", "f.id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # shingle fetch-back: candidates are diff-sized, the store is the
    # corpus — broadcast the candidate side (and the still-diff-sized
    # first-join result) so the store streams map-side through BOTH
    # joins instead of shuffling O(corpus) per round
    sh = new_store.select(F.col("doc_key").alias("id"), "sh")
    with_a = F.broadcast(cand).join(
        sh.select(F.col("id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a"
    )
    verified = F.broadcast(with_a).join(
        sh.select(F.col("id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b"
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = (inter * 1000 / union).cast("bigint")
    fresh_pairs = verified.select(
        "doc_a", "doc_b", jac.alias("jaccard_milli")
    ).filter(F.col("jaccard_milli") >= threshold_milli)

    surviving = (
        pairs.join(
            F.broadcast(retired.withColumnRenamed("doc_key", "doc_a")),
            "doc_a", "left_anti",
        )
        .join(
            F.broadcast(retired.withColumnRenamed("doc_key", "doc_b")),
            "doc_b", "left_anti",
        )
        .select("doc_a", "doc_b", "jaccard_milli")
    )
    # disjoint by construction (every fresh pair touches a fresh key;
    # no surviving pair does — updates were retired above), but a pair
    # rediscovered through an insert-over-existing-key anomaly would
    # carry the same jaccard either way, so dedup is safe
    new_pairs = surviving.unionByName(fresh_pairs).dropDuplicates(
        ["doc_a", "doc_b"]
    )
    return new_store, new_pairs


def embedding_store(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bootstrap an embedding near-dup store: the (doc_key, v) projection
    of the initial corpus. Run ONCE; afterwards
    :func:`embedding_neardup_incremental` advances it by CDC diffs.
    The store carries the vectors themselves (like :func:`minhash_store`
    carries shingle sets) because exact-cosine verification of future
    candidates needs the OLD side's vector — keeping it is what makes
    every later round cost ∝ |changes|, never a corpus re-read."""
    return df.select(
        F.col(id_col).alias("doc_key"), F.col(vec_col).alias("v")
    )


def embedding_neardup_incremental(
    store: DataFrame,
    pairs: DataFrame,
    changes: DataFrame,
    threshold_micro: int = 950000,
    n_planes: int = 4,
    n_tables: int = 2,
    dim: int = 64,
    key_col: str = "doc_key",
    vec_col: str = "embedding",
    scope: CacheScope | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Advance an embedding near-dup state by a CDC diff — the VECTOR
    sibling of :func:`minhash_lsh_incremental`, closing the milvus-shaped
    loop: the replicated table carries FLOAT_VECTOR payloads
    (manifest `array<float>` columns), ``SnapshotTable.changes()`` emits
    the rows that moved, and only those vectors are ever re-bucketed.
    Candidates = the store's sign-random-projection bucket rows ⋈
    broadcast(fresh bucket rows) per hash table — the corpus side is
    SCANNED map-side, never shuffled; candidates verify by exact cosine;
    pairs touching retired keys leave the set.

    ``store``/``pairs``: from :func:`embedding_store` +
    :func:`embedding_neardup_lsh_pairs` (bootstrap) or a previous round.
    ``changes``: the changes() contract — ``change_type`` ∈
    insert|update|delete, update rows carry the post-image, delete rows
    the pre-image.

    Returns ``(store', pairs')``. Invariant (oracle-checked by
    ``emb_neardup_incremental``): bootstrap + N incremental rounds ≡ one
    full-corpus :func:`embedding_neardup_lsh_pairs` over the final
    snapshot — exact equality, because bucket ids and cosine are pure
    functions of the two vectors and every pair has a round in which at
    least one member is fresh."""
    from milvus_cdc_spark.functions.vectors import cosine_milli
    from milvus_cdc_spark.operators.similarity import _bucket_expr

    scope = scope or default_scope()
    retired = changes.filter(
        F.col("change_type").isin("delete", "update")
    ).select(F.col(key_col).alias("doc_key"))
    fresh = embedding_store(
        changes.filter(F.col("change_type").isin("insert", "update")),
        key_col, vec_col,
    )
    new_store = scope.persist(
        store.select("doc_key", "v")
        # diff-sized build side — hinted so the vector store is never
        # shuffled even when the diff arrives without size stats
        .join(F.broadcast(retired), "doc_key", "left_anti")
        .unionByName(fresh)
    )

    def _banded_vec(d: DataFrame) -> DataFrame:
        out = None
        for t in range(n_tables):
            tab = d.select(
                F.col("doc_key").alias("id"),
                F.lit(t).alias("tab"),
                _bucket_expr("v", dim, n_planes, plane_offset=t * n_planes)
                .alias("bucket"),
            )
            out = tab if out is None else out.unionByName(tab)
        return out

    sb, fb = _banded_vec(new_store), _banded_vec(fresh)
    cand = (
        sb.alias("s")
        .join(
            F.broadcast(fb.alias("f")),
            (F.col("s.tab") == F.col("f.tab"))
            & (F.col("s.bucket") == F.col("f.bucket"))
            & (F.col("s.id") != F.col("f.id")),
        )
        .select(
            F.least("s.id", "f.id").alias("doc_a"),
            F.greatest("s.id", "f.id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # vector fetch-back: candidates are diff-sized, the store is the
    # corpus — broadcast the candidate side (and the still-diff-sized
    # first-join result) so the store streams map-side through BOTH
    # joins instead of shuffling O(corpus) per round
    vs = new_store.select(F.col("doc_key").alias("id"), "v")
    with_a = F.broadcast(cand).join(
        vs.select(F.col("id").alias("doc_a"), F.col("v").alias("v_a")), "doc_a"
    )
    fresh_pairs = (
        F.broadcast(with_a)
        .join(vs.select(F.col("id").alias("doc_b"), F.col("v").alias("v_b")), "doc_b")
        .select(
            "doc_a", "doc_b",
            cosine_milli(F.col("v_a"), F.col("v_b")).alias("cosine_micro"),
        )
        .filter(F.col("cosine_micro") >= threshold_micro)
    )
    surviving = (
        pairs.join(
            F.broadcast(retired.withColumnRenamed("doc_key", "doc_a")),
            "doc_a", "left_anti",
        )
        .join(
            F.broadcast(retired.withColumnRenamed("doc_key", "doc_b")),
            "doc_b", "left_anti",
        )
        .select("doc_a", "doc_b", "cosine_micro")
    )
    return new_store, surviving.unionByName(fresh_pairs).dropDuplicates(
        ["doc_a", "doc_b"]
    )


def duplicate_clusters(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over near-dup candidate pairs → canonical
    cluster per document: ``cluster_id`` = min id in the component,
    ``is_keeper`` marks the canonical survivor. This is the step every
    dedup pipeline needs AFTER pair generation (pairs → clusters → keep
    one per cluster): pairwise output alone cannot answer "which rows do
    I drop" once duplicates chain (a~b, b~c ⇒ {a,b,c} is one group even
    though (a,c) was never emitted).

    Scale design: the iterative min-label propagation runs ONLY over the
    candidate subgraph (docs appearing in ≥1 pair) — orders of magnitude
    smaller than the corpus — and singletons join back in one final pass,
    so the loop cost is O(dup_edges × diameter), independent of corpus
    size. Each round is one edge⋈label shuffle + one min-aggregate;
    near-dup components are band-clique dense, so the diameter (= round
    count) is small in practice. Exact and deterministic: min-label
    propagation converges to the same fixpoint under any execution order,
    which is what lets the DuckDB oracle check it with a recursive CTE.

    ``pairs``: (doc_a, doc_b [, score…]) — any verified pair output from
    this module. ``docs``: optional full corpus; when given, every doc
    gets a row (singletons form size-1 clusters of themselves).
    Returns (doc_id, cluster_id, cluster_size, is_keeper).

    Iteration mechanics: every round's labels are ``localCheckpoint``ed —
    the MANDATORY move for iterative DataFrame algorithms. The round
    recurrence references the previous labels twice (once in the
    neighbor-min aggregate, once in the rebind join), so without plan
    truncation the logical plan DOUBLES per round (a diameter-9 chain
    overflowed Spark's 2 GB plan-string cap in testing); with it each
    round plans against materialized blocks and stays O(1).

    FRONTIER propagation: round k only propagates FROM nodes whose label
    changed in round k−1 (round 0: all) — sound because labels only
    decrease, so an unchanged neighbor's value was already folded into
    the previous round's min. Late rounds therefore join only the edges
    incident to the shrinking frontier instead of re-walking every edge
    (the long tail of a high-diameter component costs ∝ frontier, not
    ∝ |edges|); the per-round convergence count runs over the already-
    checkpointed blocks, so it adds no recompute.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .persist()
    )
    try:
        labels = (
            edges.select(F.col("src").alias("id")).distinct()
            .select("id", F.col("id").alias("lab"))
            .localCheckpoint(eager=True)
        )
        frontier = labels  # round 0: every node is newly labelled
        for _ in range(max_iters):
            # one round: nodes adjacent to the frontier adopt
            # min(own label, changed neighbors' labels)
            nmin = (
                edges.join(frontier.withColumnRenamed("id", "src"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("lab").alias("nlab"))
            )
            # F.least skips nulls, so no-neighbor-update rows keep lab
            nxt = (
                labels.join(nmin, "id", "left")
                .select(
                    "id",
                    F.least("lab", "nlab").alias("lab"),
                    (F.col("nlab") < F.col("lab")).alias("chg"),
                )
                .localCheckpoint(eager=True)
            )
            n_changed = nxt.filter(F.col("chg")).count()
            labels = nxt.select("id", "lab")
            frontier = nxt.filter(F.col("chg")).select("id", "lab")
            if n_changed == 0:
                break
        else:
            raise RuntimeError(
                f"duplicate_clusters did not converge in {max_iters} rounds "
                "(component diameter exceeds the bound — raise max_iters)"
            )
        final = labels
    finally:
        edges.unpersist()

    if docs is not None:
        final = (
            docs.select(F.col(id_col).alias("id"))
            .join(final, "id", "left")
            .select("id", F.coalesce("lab", F.col("id")).alias("lab"))
        )
    sizes = final.groupBy("lab").agg(F.count("*").alias("cluster_size"))
    return final.join(sizes, "lab").select(
        F.col("id").alias(id_col),
        F.col("lab").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("lab")).alias("is_keeper"),
    )


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag every TRAINING document that shares
    at least one k-token shingle with any document of an eval/benchmark
    set — the standard pre-training hygiene step (the reference has no
    text ops; this is the training-pipeline operator the build brief
    requires, spec'd for an exact DuckDB mirror).

    Returns ``(doc_id, n_hits)`` for contaminated training docs only,
    where ``n_hits`` counts the DISTINCT training-doc shingles that also
    occur anywhere in the benchmark (per-doc shingles are deduped, so the
    count is insensitive to in-document repetition).

    100 TB shape: the benchmark side is eval-set-sized (thousands of
    docs), so its distinct shingle set broadcast-hash-joins against ONE
    streaming scan of the corpus; the only shuffle carries the already
    partially-aggregated (doc_id, hits) pairs of contaminated docs. Pass
    ``broadcast_bench=False`` for an unusually large benchmark and the
    plan degrades to a shuffle join, never a cartesian. ``k=3`` keeps the
    probe meaningful on short synthetic docs; production decontamination
    typically runs k=8..13 over the same plan.
    """
    scope = scope or default_scope()
    tsh = _shingle_df(train, k, text_col, id_col, scope)
    bsh = _shingle_df(bench, k, text_col, id_col, scope)
    bench_shingles = (
        bsh.select(F.explode("sh").alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )
    if broadcast_bench:
        bench_shingles = F.broadcast(bench_shingles)
    return (
        tsh.select("id", F.explode("sh").alias("shingle"))
        .filter(F.col("shingle") != "")
        .join(bench_shingles, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("id").alias(id_col), "n_hits")
    )


def bench_shingle_store(
    bench: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    scope: CacheScope | None = None,
) -> DataFrame:
    """The eval set's distinct k-shingles — materialize ONCE (eval sets
    are static by definition; re-shingling them per round would be the
    only corpus-independent cost, so hoist it)."""
    scope = scope or default_scope()
    bsh = _shingle_df(bench, k, text_col, id_col, scope)
    return (
        bsh.select(F.explode("sh").alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def decontaminate_incremental(
    contam_store: DataFrame,
    bench_shingles: DataFrame,
    changes: DataFrame,
    k: int = 3,
    key_col: str = "doc_key",
    text_col: str = "text",
    scope: CacheScope | None = None,
) -> DataFrame:
    """Advance a contamination store by a CDC diff — the incremental
    sibling of :func:`decontaminate`, wired to ``SnapshotTable.changes()``
    like the dedup family: only the rows the diff reports are ever
    shingled, joined against the (static, broadcast) benchmark shingle
    set; deleted/updated keys retire from the store. Contamination is a
    pure per-document function of (doc, bench) — unlike dedup keepers
    there is NO global recompute step, so a round costs ∝ |changes|
    with the store itself only anti-joined on the diff-sized retired set.

    ``contam_store``: (doc_key, n_hits) from a bootstrap
    :func:`decontaminate` (or a previous round — rounds chain).
    ``changes``: the changes() contract (change_type ∈
    insert|update|delete; update rows carry the post-image).

    Invariant (oracle-checked by ``doc_decontaminate_incremental``):
    bootstrap + N rounds ≡ one full :func:`decontaminate` recomputed
    from scratch over the final snapshot against the same benchmark.
    """
    scope = scope or default_scope()
    retired = changes.filter(
        F.col("change_type").isin("delete", "update")
    ).select(F.col(key_col).alias("doc_key"))
    fresh = changes.filter(
        F.col("change_type").isin("insert", "update")
    ).select(F.col(key_col).alias("doc_key"), F.col(text_col))
    fresh_sh = _shingle_df(fresh, k, text_col, "doc_key", scope)
    fresh_hits = (
        fresh_sh.select("id", F.explode("sh").alias("shingle"))
        .filter(F.col("shingle") != "")
        .join(F.broadcast(bench_shingles), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .select(F.col("id").alias("doc_key"), "n_hits")
    )
    return (
        contam_store.select("doc_key", "n_hits")
        # retired is diff-sized (same broadcast contract as the sibling
        # incremental stores) — the store streams map-side
        .join(F.broadcast(retired), "doc_key", "left_anti")
        .unionByName(fresh_hits)
    )
