"""Training-data hygiene operators: benchmark decontamination
(operators/dedup.py::decontaminate), PII redaction, and repetition
stats (functions/text.py). The reference has no text ops — these are
the LLM-pipeline operators the build brief requires, each with a
planted-signal unit test here and a full DuckDB oracle in
__spark_entry__.py (doc_decontaminate / doc_pii_redact /
doc_repetition_stats)."""

import pytest
from pyspark.sql import functions as F

from milvus_cdc_spark.functions import text as TXT
from milvus_cdc_spark.operators import dedup as DD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_decontaminate_flags_shared_shingles(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps high")])
    train = _docs(spark, [
        # contains "the quick brown" and "quick brown fox" → 2+ hits
        (1, "she saw the quick brown fox yesterday"),
        # no 3-shingle overlap
        (2, "completely different words entirely here"),
        # exact copy of the benchmark doc → every shingle hits
        (3, "the quick brown fox jumps high"),
    ])
    got = {r.doc_id: r.n_hits for r in
           DD.decontaminate(train, bench, k=3).collect()}
    assert 2 not in got
    # doc 1 shares: "the quick brown", "quick brown fox" = 2 shingles
    assert got[1] == 2
    # doc 3: 6 tokens → 4 distinct shingles, all shared
    assert got[3] == 4


def test_decontaminate_counts_distinct_shingles_once(spark):
    # repeated phrase in a training doc must count once (per-doc distinct)
    bench = _docs(spark, [(9, "alpha beta gamma")])
    train = _docs(spark, [(1, "alpha beta gamma alpha beta gamma")])
    got = DD.decontaminate(train, bench, k=3).collect()
    # shingles of train doc: {alpha beta gamma, beta gamma alpha,
    # gamma alpha beta} — only "alpha beta gamma" is in the bench set
    assert [(r.doc_id, r.n_hits) for r in got] == [(1, 1)]


def test_decontaminate_empty_and_short_docs(spark):
    # empty docs produce no shingles ('' filtered); docs shorter than k
    # fall back to whole-text shingles which only match identical docs
    bench = _docs(spark, [(9, "tiny doc")])
    train = _docs(spark, [(1, ""), (2, "tiny doc"), (3, "tiny")])
    got = {r.doc_id: r.n_hits for r in
           DD.decontaminate(train, bench, k=3).collect()}
    assert got == {2: 1}


def test_redact_pii_all_categories(spark):
    df = spark.createDataFrame(
        [("mail a.b+c@x-corp.io or 192.168.0.1 tel 555-0199 end",)],
        "text string",
    )
    row = df.select(
        TXT.redact_pii(F.col("text")).alias("clean"),
        *TXT.pii_counts(F.col("text")),
    ).collect()[0]
    assert row.clean == "mail <EMAIL> or <IP> tel <PHONE> end"
    assert (row.n_email, row.n_ip, row.n_phone) == (1, 1, 1)


def test_redact_pii_sequential_counts_no_double_count(spark):
    # an IP-shaped span inside an email's host must not also count as an
    # IP (counts are taken AFTER the previous category's redaction; on
    # the raw text the IP regex WOULD match "1.2.3.4" here)
    df = spark.createDataFrame(
        [("reach me at ops@1.2.3.4.example.com please",)], "text string"
    )
    row = df.select(
        TXT.redact_pii(F.col("text")).alias("clean"),
        *TXT.pii_counts(F.col("text")),
    ).collect()[0]
    assert row.n_email == 1 and row.n_ip == 0 and row.n_phone == 0
    assert "<EMAIL>" in row.clean and "<IP>" not in row.clean
    # sanity: unredacted, the embedded span IS IP-shaped
    raw_ip = df.select(
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(TXT.PII_PATTERNS[1][1]), F.lit(0)
            )
        ).alias("n")
    ).collect()[0].n
    assert raw_ip == 1


def test_redact_pii_clean_text_unchanged(spark):
    df = spark.createDataFrame([("nothing sensitive here",)], "text string")
    row = df.select(
        TXT.redact_pii(F.col("text")).alias("clean"),
        *TXT.pii_counts(F.col("text")),
    ).collect()[0]
    assert row.clean == "nothing sensitive here"
    assert (row.n_email, row.n_ip, row.n_phone) == (0, 0, 0)


@pytest.mark.parametrize(
    "text,want_milli",
    [
        ("a b c d", 0),               # all distinct
        ("a a a a", 750),             # 3 of 4 duplicated
        ("a b a b", 500),
        ("", 0),                      # empty → 0, not a division error
        ("word", 0),
    ],
)
def test_dup_token_ratio(spark, text, want_milli):
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(
        TXT.dup_token_ratio_milli(F.col("text")).alias("m")
    ).collect()[0].m
    assert got == want_milli


def test_decontaminate_incremental_matches_full_recompute(spark):
    """bootstrap + 2 diff rounds == full decontaminate over final state,
    across every transition: insert-contaminated, insert-clean,
    update contaminated→clean, update clean→contaminated, delete."""
    from milvus_cdc_spark.operators.dedup import (
        bench_shingle_store,
        decontaminate,
        decontaminate_incremental,
    )

    bench = spark.createDataFrame(
        [("b1", "the quick brown fox")], "doc_key string, text string"
    )
    bench_sh = bench_shingle_store(bench, k=3, id_col="doc_key")

    def df(rows):
        return spark.createDataFrame(rows, "doc_key string, text string")

    def ch(rows):
        return spark.createDataFrame(
            rows, "change_type string, doc_key string, text string"
        )

    t0 = [("d1", "saw the quick brown fox"), ("d2", "nothing shared here at all")]
    store = decontaminate(df(t0), bench, k=3, id_col="doc_key")
    # round 1: d2 turns contaminated; d3 arrives clean; d4 contaminated
    r1 = ch([
        ("update", "d2", "it was the quick brown fox"),
        ("insert", "d3", "totally unrelated clean words"),
        ("insert", "d4", "quick brown fox spotted"),
    ])
    store = decontaminate_incremental(store, bench_sh, r1, k=3)
    # round 2: d1 deleted; d4 scrubbed clean
    r2 = ch([
        ("delete", "d1", "saw the quick brown fox"),
        ("update", "d4", "now a completely clean doc"),
    ])
    store = decontaminate_incremental(store, bench_sh, r2, k=3)

    final = [
        ("d2", "it was the quick brown fox"),
        ("d3", "totally unrelated clean words"),
        ("d4", "now a completely clean doc"),
    ]
    want = sorted(
        (r.doc_key, r.n_hits)
        for r in decontaminate(df(final), bench, k=3, id_col="doc_key").collect()
    )
    got = sorted((r.doc_key, r.n_hits) for r in store.collect())
    assert got == want
    assert [k for k, _ in got] == ["d2"]  # only d2 still contaminated
