"""Seeded fuzz of the incremental operator family vs full recompute.

The contract every ``*_incremental`` operator documents is: bootstrap +
N ``changes()``-shaped rounds ≡ one full-corpus recompute over the final
snapshot. The single-scenario tests pin hand-picked flips; these cases
draw multi-round random change streams (deletes, post-image updates,
fresh inserts, AND re-inserts of previously deleted keys — a shape no
hand-written scenario covered) from one ``random.Random(seed)`` and
assert exact equality for every family: exact dedup, MinHash LSH,
embedding near-dup, and the maintained IVF index.

Values are drawn from small pools (8-word vocab, 5 vector classes) so
duplicate groups genuinely form and retire across rounds.
"""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

SEEDS = [11, 22, 33]
ROUNDS = 3


def _evolve(rng, corpus, graveyard, rnd, value_fn):
    """Mutate ``corpus`` in place; return one round of changes() rows.

    Each key appears at most once per round (the changes() contract);
    update rows carry the post-image, delete rows the pre-image."""
    changes = []
    for k in rng.sample(sorted(corpus), min(len(corpus), rng.randrange(1, 5))):
        if rng.random() < 0.35 and len(corpus) > 3:
            changes.append(("delete", k, corpus.pop(k)))
            graveyard.append(k)
        else:
            corpus[k] = value_fn(rng)
            changes.append(("update", k, corpus[k]))
    for j in range(rng.randrange(1, 4)):
        if graveyard and rng.random() < 0.3:
            nk = graveyard.pop(rng.randrange(len(graveyard)))
        else:
            nk = f"n{rnd}_{j}"
        corpus[nk] = value_fn(rng)
        changes.append(("insert", nk, corpus[nk]))
    return changes


def _text(rng):
    return " ".join(f"w{rng.randrange(8)}" for _ in range(6))


def _text_changes_df(spark, changes):
    return spark.createDataFrame(
        changes, "change_type string, doc_key string, text string"
    )


def _seed_corpus(rng, value_fn, lo=12, hi=25):
    return {f"d{i}": value_fn(rng) for i in range(rng.randrange(lo, hi))}


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_dedup_exact_incremental(spark, seed):
    from milvus_cdc_spark.operators.dedup import (
        dedup_exact,
        dedup_exact_incremental,
        dedup_store,
    )

    rng = random.Random(seed)
    corpus, graveyard = _seed_corpus(rng, _text), []
    store = dedup_store(
        spark.createDataFrame(sorted(corpus.items()), "doc_key string, text string")
    )
    for rnd in range(ROUNDS):
        changes = _evolve(rng, corpus, graveyard, rnd, _text)
        store = dedup_exact_incremental(
            store, _text_changes_df(spark, changes)
        ).localCheckpoint()
    got = {(r["doc_key"], r["keep"], r["group_size"]) for r in store.collect()}
    final = spark.createDataFrame(
        sorted(corpus.items()), "doc_key string, text string"
    )
    want = {
        (r["doc_key"], r["keep"], r["group_size"])
        for r in dedup_exact(final, id_col="doc_key").collect()
    }
    assert got == want, f"seed={seed}"
    assert {k for k, *_ in got} == set(corpus)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_minhash_incremental(spark, seed):
    from milvus_cdc_spark.operators.dedup import (
        minhash_lsh_incremental,
        minhash_lsh_pairs,
        minhash_store,
    )

    rng = random.Random(seed)
    corpus, graveyard = _seed_corpus(rng, _text), []
    boot = spark.createDataFrame(
        sorted(corpus.items()), "doc_key string, text string"
    )
    store = minhash_store(boot).localCheckpoint()
    pairs = minhash_lsh_pairs(boot, id_col="doc_key").localCheckpoint()
    for rnd in range(ROUNDS):
        changes = _evolve(rng, corpus, graveyard, rnd, _text)
        store, pairs = minhash_lsh_incremental(
            store, pairs, _text_changes_df(spark, changes)
        )
        store, pairs = store.localCheckpoint(), pairs.localCheckpoint()
    got = {(r["doc_a"], r["doc_b"], r["jaccard_milli"]) for r in pairs.collect()}
    final = spark.createDataFrame(
        sorted(corpus.items()), "doc_key string, text string"
    )
    want = {
        (r["doc_a"], r["doc_b"], r["jaccard_milli"])
        for r in minhash_lsh_pairs(final, id_col="doc_key").collect()
    }
    assert got == want, f"seed={seed}"


DIM = 4


def _vec(rng):
    g = rng.randrange(5)
    return [float(((g % 5) * (i + 3)) % 7 - 3) for i in range(DIM)]


def _vec_changes_df(spark, changes):
    return spark.createDataFrame(
        changes, "change_type string, doc_key string, embedding array<float>"
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_embedding_incremental(spark, seed):
    from milvus_cdc_spark.operators.dedup import (
        embedding_neardup_incremental,
        embedding_neardup_lsh_pairs,
        embedding_store,
    )

    rng = random.Random(seed)
    kw = dict(threshold_micro=900000, n_planes=2, n_tables=2, dim=DIM)
    corpus, graveyard = _seed_corpus(rng, _vec), []
    boot = spark.createDataFrame(
        sorted(corpus.items()), f"doc_key string, embedding array<float>"
    )
    store = embedding_store(boot, id_col="doc_key").localCheckpoint()
    pairs = embedding_neardup_lsh_pairs(
        boot, id_col="doc_key", **kw
    ).localCheckpoint()
    for rnd in range(ROUNDS):
        changes = _evolve(rng, corpus, graveyard, rnd, _vec)
        store, pairs = embedding_neardup_incremental(
            store, pairs, _vec_changes_df(spark, changes), key_col="doc_key", **kw
        )
        store, pairs = store.localCheckpoint(), pairs.localCheckpoint()
    got = {(r["doc_a"], r["doc_b"], r["cosine_micro"]) for r in pairs.collect()}
    final = spark.createDataFrame(
        sorted(corpus.items()), "doc_key string, embedding array<float>"
    )
    want = {
        (r["doc_a"], r["doc_b"], r["cosine_micro"])
        for r in embedding_neardup_lsh_pairs(
            final, id_col="doc_key", **kw
        ).collect()
    }
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_ivf_index_incremental(spark, seed):
    from milvus_cdc_spark.operators.similarity import (
        ivf_centroids,
        ivf_index,
        ivf_index_incremental,
    )

    rng = random.Random(seed)
    corpus, graveyard = _seed_corpus(rng, _vec), []
    boot = spark.createDataFrame(
        sorted(corpus.items()), "vec_id string, embedding array<float>"
    )
    cent = ivf_centroids(boot, n_centroids=3).localCheckpoint()
    index = ivf_index(boot, cent).localCheckpoint()
    for rnd in range(ROUNDS):
        changes = _evolve(rng, corpus, graveyard, rnd, _vec)
        index = ivf_index_incremental(
            index, cent, _vec_changes_df(spark, changes)
        ).localCheckpoint()
    got = {(r["doc_key"], r["cell"]) for r in index.select("doc_key", "cell").collect()}
    final = spark.createDataFrame(
        sorted(corpus.items()), "vec_id string, embedding array<float>"
    )
    want = {
        (r["doc_key"], r["cell"])
        for r in ivf_index(final, cent).select("doc_key", "cell").collect()
    }
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_passage_incremental(spark, seed):
    from milvus_cdc_spark.operators.dedup import (
        passage_dedup_incremental,
        passage_report,
        passage_store,
    )

    rng = random.Random(seed)
    corpus, graveyard = _seed_corpus(rng, _text), []
    store = passage_store(
        spark.createDataFrame(sorted(corpus.items()), "doc_key string, text string"),
        window=3,
    )
    for rnd in range(ROUNDS):
        changes = _evolve(rng, corpus, graveyard, rnd, _text)
        store = passage_dedup_incremental(
            store, _text_changes_df(spark, changes), window=3
        ).localCheckpoint()
    final = spark.createDataFrame(
        sorted(corpus.items()), "doc_key string, text string"
    )
    want_store = passage_store(final, window=3)

    def skey(r):
        return (r["doc_key"], r["passage_fp"], r["n_occ"])

    assert sorted(map(skey, store.collect())) == sorted(
        map(skey, want_store.collect())
    ), f"seed={seed}"

    def rkey(r):
        return (r["passage_fp"], r["n_docs"], r["n_occurrences"])

    assert sorted(map(rkey, passage_report(store).collect())) == sorted(
        map(rkey, passage_report(want_store).collect())
    ), f"seed={seed}"
