"""Text functions, dedup family, similarity search — unit + oracle checks.

The cross-engine portable-hash contract (md5-based) is verified here
directly against DuckDB so the driver's per-round oracle comparison can't
be surprised.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark.functions import text as TXT
from milvus_cdc_spark.functions.vectors import cosine_milli
from milvus_cdc_spark.operators import dedup as DD
from milvus_cdc_spark.operators.similarity import brute_force_topk, ivf_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_portable_hash_matches_duckdb(spark):
    vals = ["hello", "the quick brown fox", "日本語", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", TXT.portable_hash64(F.col("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        want = con.sql(
            "SELECT ('0x' || substr(md5(?),1,15))::BIGINT", params=[v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_token_and_quality_functions(spark):
    df = spark.createDataFrame(
        [("The quick, brown fox! It is fast.",), ("",), ("  a  b  ",)], ["text"]
    )
    rows = df.select(
        TXT.token_count(F.col("text")).alias("tc"),
        TXT.punct_count(F.col("text")).alias("pc"),
        TXT.stopword_count(F.col("text")).alias("sw"),
        TXT.fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert rows[0]["tc"] == 7 and rows[0]["pc"] == 3 and rows[0]["sw"] == 3
    assert rows[1]["tc"] == 0
    assert rows[2]["tc"] == 2
    assert len(rows[0]["fp"]) == 32


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog in a house",),
            ("der hund und die katze ist nicht da",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    got = [r[0] for r in df.select(TXT.lang_id(F.col("text"))).collect()]
    assert got == ["en", "de", "und"]


def test_dedup_exact_finds_planted_dups(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"],
    )
    res = {r["doc_id"]: r["keep"] for r in DD.dedup_exact(df).collect()}
    assert res == {1: True, 2: False, 3: True}  # normalization unifies 1 and 2


def test_minhash_lsh_vs_bruteforce_jaccard(spark):
    # planted near-dups: same sentence with small edits
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base.replace("delta", "delta2")),  # high jaccard
        (3, "completely different words entirely unrelated content here now"),
        (4, base + " lambda"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in DD.shingle_jaccard_pairs(df, threshold_milli=400).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_pairs(df, threshold_milli=400).collect()
    }
    assert (1, 4) in brute
    # LSH returns a subset of brute-force (no false positives after verify)
    assert lsh <= brute
    assert (1, 4) in lsh  # high-sim pair must survive banding


def test_simhash_close_texts_low_hamming(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " mu"), (3, "zzz yyy xxx www vvv uuu")],
        ["doc_id", "text"],
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in DD.simhash_pairs(df, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_brute_force_topk_sane(spark, embs):
    q = embs.filter(F.col("vec_id") < 3)
    res = brute_force_topk(q, embs, k=5)
    rows = res.collect()
    assert len(rows) == 15  # 3 queries x 5
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine_micro"]))
    for q_id, rr in by_q.items():
        rr.sort()
        sims = [s for _, s in rr]
        assert sims == sorted(sims, reverse=True)  # rank order == cosine order


def test_lsh_and_ivf_recall_vs_exact(spark, embs):
    q = embs.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(q, embs, k=3)
    approx = lsh_topk(q, embs, k=3, n_planes=3)
    ivf = ivf_topk(q, embs, k=3, n_centroids=8, nprobe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    i = {(r["query_id"], r["neighbor_id"]) for r in ivf.collect()}
    # approximate methods must achieve reasonable recall on 500 vectors
    assert len(a & e) / len(e) >= 0.5, f"LSH recall too low: {len(a & e)}/{len(e)}"
    assert len(i & e) / len(e) >= 0.5, f"IVF recall too low: {len(i & e)}/{len(e)}"


def test_embedding_neardup_pairs_symmetric_threshold(spark, embs):
    sub = embs.filter(F.col("vec_id") < 50)
    pairs = DD.embedding_neardup_pairs(sub, threshold_micro=-1000000).collect()
    assert len(pairs) == 50 * 49 // 2  # cosine >= -1 keeps all a<b pairs once


def test_duplicate_clusters_chain_and_singletons(spark):
    """pairs → connected components: chained dups collapse into ONE
    cluster even though the transitive pair was never emitted; docs with
    no pairs form size-1 clusters of themselves."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["doc_a", "doc_b"]
    )
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]], ["doc_id"])
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_keeper"])
        for r in DD.duplicate_clusters(pairs, docs=docs).collect()
    }
    assert got == {
        1: (1, 3, True), 2: (1, 3, False), 3: (1, 3, False),
        10: (10, 2, True), 11: (10, 2, False),
        99: (99, 1, True),
    }
    # without a corpus: only subgraph nodes appear
    sub = {
        r["doc_id"]: r["cluster_id"]
        for r in DD.duplicate_clusters(pairs).collect()
    }
    assert sub == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_duplicate_clusters_long_chain_converges(spark):
    """A diameter-9 chain needs multiple propagation rounds; every node
    must still land on the global min label."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 10)], ["doc_a", "doc_b"]
    )
    rows = DD.duplicate_clusters(pairs).collect()
    assert {r["cluster_id"] for r in rows} == {1}
    assert {r["cluster_size"] for r in rows} == {10}
    assert sorted(r["doc_id"] for r in rows) == list(range(1, 11))
    with pytest.raises(RuntimeError, match="did not converge"):
        DD.duplicate_clusters(pairs, max_iters=2)


def test_duplicate_clusters_matches_recursive_oracle(spark, docs):
    """End-to-end vs DuckDB: minhash pairs → clusters must equal the
    recursive-CTE transitive closure over the SAME pair SQL."""
    import __spark_entry__ as e

    got = sorted(
        (r["doc_id"], r["cluster_id"], r["cluster_size"], r["is_keeper"])
        for r in e.queries()["doc_dup_clusters"](spark, SF).collect()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = sorted(map(tuple, con.sql(e.oracle_sql()["doc_dup_clusters"]).fetchall()))
    assert got == want


def test_ivf_maintained_index_matches_full_rebuild(spark, embs):
    """The maintained-IVF invariant: bootstrap over half the corpus +
    incremental rounds (inserts, updates, deletes) lands on EXACTLY the
    index a fresh ivf_index over the final corpus builds with the same
    frozen centroids — and ivf_search over the maintained index equals
    ivf_topk-style search over the rebuilt one."""
    from milvus_cdc_spark.operators.similarity import (
        ivf_centroids, ivf_index, ivf_index_incremental, ivf_search,
    )

    e = embs.select("vec_id", "embedding").filter(F.col("vec_id") < 400)
    half = e.filter(F.col("vec_id") % 2 == 0)
    cent = ivf_centroids(half, n_centroids=8).localCheckpoint()
    index = ivf_index(half, cent)

    # round 1: insert the odd half
    ins = e.filter(F.col("vec_id") % 2 == 1).select(
        "vec_id", "embedding", F.lit("insert").alias("change_type"))
    index = ivf_index_incremental(index, cent, ins, key_col="vec_id")
    # round 2: delete one stripe, update another (post-image = reversed id
    # mapping inside the stripe so the vector genuinely changes)
    dels = e.filter(F.col("vec_id") % 10 == 3).select(
        "vec_id", F.col("embedding"), F.lit("delete").alias("change_type"))
    upds = e.filter(F.col("vec_id") % 10 == 7).select(
        "vec_id",
        F.reverse(F.col("embedding")).alias("embedding"),
        F.lit("update").alias("change_type"))
    index = ivf_index_incremental(
        index, cent, dels.unionByName(upds), key_col="vec_id")

    final = (
        e.filter(F.col("vec_id") % 10 != 3)
        .withColumn(
            "embedding",
            F.when(F.col("vec_id") % 10 == 7, F.reverse(F.col("embedding")))
            .otherwise(F.col("embedding")),
        )
    )
    rebuilt = ivf_index(final, cent)
    got = {(r["doc_key"], r["cell"]) for r in index.collect()}
    want = {(r["doc_key"], r["cell"]) for r in rebuilt.collect()}
    assert got == want and len(got) == final.count()

    q = e.filter(F.col("vec_id") < 3)
    s1 = ivf_search(index, cent, q, k=4, nprobe=3)
    s2 = ivf_search(rebuilt, cent, q, k=4, nprobe=3)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
