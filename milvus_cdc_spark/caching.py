"""Cache lifetime management for operators that stage persisted projections.

The dedup/similarity operators persist intermediate projections (tokens,
shingles, signatures) so both sides of a self-join read a computed
attribute instead of re-evaluating the expression tree (measured 25x for
the inlined regex path). Those persists must OUTLIVE the returned lazy
DataFrame — the caller decides when the result has been consumed — so the
operators cannot unpersist internally. A long-lived session (a notebook, a
streaming driver) would otherwise accumulate dead cache entries.

``CacheScope`` is the explicit lifetime: operators register every persisted
frame on the scope passed to them (or a process-wide default scope), and
the owner releases them all once results are materialized::

    with CacheScope() as scope:
        pairs = minhash_lsh_pairs(docs, scope=scope)
        pairs.write.parquet(out)
    # caches freed here

Callers that skip the scope keep today's behavior (caches live until
session end), but `release_default_scope()` lets a long-lived process
reclaim them between queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        self._frames.append(df.persist())
        return df

    def release(self) -> None:
        for df in self._frames:
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped
        self._frames.clear()

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


_DEFAULT = CacheScope()


def default_scope() -> CacheScope:
    return _DEFAULT


def release_default_scope() -> None:
    """Free every cache persisted by operators called without a scope."""
    _DEFAULT.release()
