"""Vectorized text-analysis columns for training-data pipelines.

All pure `pyspark.sql.functions` compositions — JVM-side, whole-stage
codegen, zero Python in the hot path. Each function returns a Column.

Cross-engine determinism: ``portable_hash64`` is md5-based so a DuckDB
oracle can reproduce the exact same 64-bit values
(``('0x' || substr(md5(s),1,15))::bigint``) — used by the dedup family so
its results are SQL-checkable, unlike engine-specific xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# frozen stopword lists for the language-ID heuristic (tiny n-gram/stopword
# scorer; the fixed lists ARE the spec so the oracle can mirror them)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "en", "por", "que"],
}


def normalize(c: Column) -> Column:
    """Lowercase + collapse whitespace — the canonical form for dedup."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(c: Column) -> Column:
    """Lowercased alphanumeric tokens (empty strings filtered)."""
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def token_count(c: Column) -> Column:
    return F.size(tokens(c))


# GPT-2-style pretokenizer, restricted to the Java∩RE2 regex subset (no
# lookahead, so the trailing-space variant folds into plain \s+):
# contractions, space-prefixed letter/digit/punctuation runs, residual
# whitespace. Both engines use ordered (leftmost-first) alternation, so
# counts agree exactly — the probe hash-checks that.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(c: Column) -> Column:
    """Count of BPE-style pretokens — the sequence-length estimate a
    training pipeline budgets with (a GPT-2-family tokenizer merges
    WITHIN pretokens, so the pretoken count is the upper bound on merge
    inputs and tracks real token counts closely). JVM-side regexp_count,
    zero Python."""
    return F.regexp_count(c, F.lit(BPE_PRETOKEN_RE))


def chunks(c: Column, window: int = 64, stride: int = 48) -> Column:
    """Fixed token-window chunking with overlap — the pretokenization
    split every training pipeline runs before packing sequences.

    Returns ``array<struct<chunk_idx:int, chunk_text:string,
    n_tokens:int>>`` over the normalized token stream: chunk ``i`` covers
    tokens ``[i*stride, i*stride + window)``; the last chunk is the
    (possibly short) remainder; empty documents produce no chunks. Pure
    JVM higher-order functions (split/sequence/transform/slice) — no
    Python in the hot path, and arithmetic simple enough for an exact
    DuckDB mirror (see ``doc_chunk`` in __spark_entry__.py).

    Validated driver-side (free): window/stride must be positive and
    stride ≤ window — stride 0 divides by zero inside the chunk-count
    ceil, and stride > window would silently drop the tokens between
    windows."""
    if window <= 0 or stride <= 0:
        raise ValueError(
            f"chunks(): window and stride must be positive, got "
            f"window={window}, stride={stride}"
        )
    if stride > window:
        raise ValueError(
            f"chunks(): stride ({stride}) > window ({window}) would drop "
            "tokens between consecutive windows"
        )
    toks = tokens(c)
    n = F.size(toks)
    n_chunks = F.when(
        n > window,
        (F.ceil((n - window) / F.lit(float(stride)))).cast("int") + 1,
    ).otherwise(F.lit(1))
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_idx"),
                F.array_join(
                    F.slice(toks, i * stride + 1, window), " "
                ).alias("chunk_text"),
                F.least(F.lit(window), n - i * stride)
                .cast("int")
                .alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:int,chunk_text:string,n_tokens:int>>"
    ))


def char_count(c: Column) -> Column:
    return F.length(c)


def punct_count(c: Column) -> Column:
    """Count of punctuation chars [,.!?;:]."""
    return F.length(c) - F.length(F.regexp_replace(c, r"[,.!?;:]", ""))


def stopword_count(c: Column, lang: str = "en") -> Column:
    toks = tokens(c)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_score_milli(c: Column) -> Column:
    """Integer quality score x1000: stopword ratio + length band + punct.

    Integer-valued on purpose: floats hash differently across engines.
    score = 1000 * stopword_hits / tokens + 10 * clamp(tokens, 0, 50)
            - 5 * punct_count, floor-divided arithmetic only.
    """
    tc = token_count(c)
    sw = stopword_count(c, "en")
    band = F.least(tc, F.lit(50))
    return (
        F.when(tc > 0, F.floor(sw * 1000 / tc)).otherwise(F.lit(0)).cast("bigint")
        + band.cast("bigint") * 10
        - punct_count(c).cast("bigint") * 5
    )


def lang_id(c: Column) -> Column:
    """Stopword-voting language guess over the frozen lists (ties → 'und').

    The reference has no text ops; this is the training-pipeline n-gram
    heuristic required by the build brief, spec'd exactly for the oracle.
    """
    toks = tokens(c)

    def _score(sw: list[str]) -> Column:
        arr = F.array(*[F.lit(w) for w in sw])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = {lang: _score(sw) for lang, sw in STOPWORDS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic priority order on ties: en > de > fr > es handled by
    # checking in reverse priority so earlier langs overwrite later ones
    for lang in ["es", "fr", "de", "en"]:
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def fingerprint(c: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (stable everywhere)."""
    return F.md5(normalize(c))


def portable_hash64(c: Column) -> Column:
    """Deterministic 60-bit integer hash reproducible in ANSI SQL / DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Word k-shingles from an ALREADY-MATERIALIZED token array column.

    IMPORTANT: pass an attribute reference (a column that physically exists
    on the row, e.g. via a persisted projection), NOT ``tokens(text)``
    inline — Catalyst has no common-subexpression elimination across
    nested lambdas, so an inline expression would re-run the regex split
    for every element_at (measured 25x slowdown at 5k docs).
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.when(n >= k, F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(k)])
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles(c: Column, k: int = 3) -> Column:
    """Word k-shingles of the text. Convenience form — fine for one-shot
    expressions; for pipelines use shingles_from_tokens on a staged column."""
    return shingles_from_tokens(tokens(c), k)


def minhash_from_shingles(sh: Column, n_hashes: int = 16) -> Column:
    """MinHash signature from a MATERIALIZED shingle-array column (see
    shingles_from_tokens note): per hash i, min over shingles of
    h(shingle||'#'||i)."""

    # one nested higher-order expression over a literal index array rather
    # than n_hashes copies of the tree: identical values, but codegen/JIT
    # compiles ONE expression instead of 16 (measured 4x on first run)
    idx = F.array(*[F.lit(i) for i in range(n_hashes)])
    return F.transform(
        idx,
        lambda i: F.array_min(
            F.transform(
                sh,
                lambda s: F.conv(
                    F.substring(
                        F.md5(F.concat(s, F.lit("#"), i.cast("string"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("bigint"),
            )
        ),
    )


def minhash_signature(c: Column, n_hashes: int = 16, k: int = 3) -> Column:
    """MinHash signature of raw text (one-shot convenience form)."""
    return minhash_from_shingles(shingles(c, k), n_hashes)


def simhash_from_hashes(th: Column, bits: int = 32) -> Column:
    """SimHash from a MATERIALIZED token-hash array column: bit b set iff
    sum over tokens of (+1 if bit b of h else -1) > 0."""
    out = F.lit(0).cast("bigint")

    def _vote(b: int) -> Column:
        return F.aggregate(
            th,
            F.lit(0).cast("bigint"),
            lambda acc, h: acc
            + F.when(
                F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    for b in range(bits):
        out = out + F.when(_vote(b) > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0))
    return out


def simhash64(c: Column, bits: int = 32) -> Column:
    """SimHash of raw text (one-shot convenience form; 32 bits keeps the
    oracle SQL tractable and fits a bigint)."""
    return simhash_from_hashes(
        F.transform(tokens(c), lambda t: portable_hash64(t)), bits
    )


# ---- PII redaction ---------------------------------------------------------
# (category, pattern, replacement) — applied IN ORDER, each category's
# match count taken on the text as it stands after the previous category's
# redaction (so an address inside an already-redacted span never double
# counts). Patterns restricted to the regex subset Java (Spark) and RE2
# (DuckDB) implement identically: no backrefs, no lookaround.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{4}\b", "<PHONE>"),
]


def redact_pii(c: Column) -> Column:
    """Replace email / IPv4 / phone-shaped spans with typed placeholders —
    the pre-training privacy scrub. Pure ``regexp_replace`` chain: JVM
    regex in whole-stage codegen, zero Python, and the pattern subset is
    chosen for bit-identical behavior in the DuckDB (RE2) oracle."""
    out = c
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(c: Column) -> list[Column]:
    """Per-category redaction counts as ``n_<category>`` int columns,
    counted sequentially on the progressively-redacted text (mirrors
    redact_pii exactly)."""
    cols = []
    cur = c
    for name, pat, repl in PII_PATTERNS:
        cols.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
            .cast("int")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, repl)
    return cols


def dup_token_ratio_milli(c: Column) -> Column:
    """Within-document token repetition, x1000 (integer so the oracle
    hash is exact): ``floor((n_tokens - n_distinct_tokens) * 1000 /
    n_tokens)``; 0 for empty documents. The Gopher-style repetition
    signal used to drop boilerplate/spam before training."""
    toks = tokens(c)
    n = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    return (
        F.when(n > 0, F.floor((n - nd) * 1000 / n))
        .otherwise(F.lit(0))
        .cast("bigint")
    )
