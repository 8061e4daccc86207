"""Cache-lifecycle plumbing for operators that persist intermediates.

Iterative operators (pagerank, copurchase_lift) persist small frames
that every unrolled iteration references; without cleanup those cache
entries pin executor memory for the session lifetime. Eagerly
checkpointing instead was measured 1.9–2.6× slower at sf0.1 (the extra
materialization dwarfs the cache it frees), so the contract here is:

- the operator stays a LAZY DataFrame — full speed, caches hit at the
  caller's terminal action;
- the persisted handles ride on the result; ``release_caches(df)``
  frees them explicitly once the caller is done;
- a ``weakref.finalize`` releases them AUTOMATICALLY when the result
  DataFrame is garbage-collected, so even callers that never heard of
  the handle don't leak past the result's lifetime. (Unpersist on an
  already-stopped session is swallowed — finalizers can run at
  interpreter shutdown.)

CALLER CONTRACT (review note): hold the RETURNED DataFrame alive until
your terminal action. A chained temporary — ``pagerank(e).select(...)
.count()`` — drops the result object mid-expression, the finalizer
fires, and the derived plan recomputes every unpersisted intermediate.
Bind it first (``pr = pagerank(e); pr.select(...).count()``), or call
``release_caches(pr)`` yourself when done. Unpersist is lazy-safe
(plans stay CORRECT either way — this is a performance contract, not a
correctness one), which is why GC-tie is an acceptable default for the
leak it prevents.
"""

from __future__ import annotations

import weakref
from collections.abc import Iterable

from pyspark.sql import DataFrame


def attach_cache_release(result: DataFrame, handles: Iterable[DataFrame]) -> DataFrame:
    """Tie the lifetime of persisted ``handles`` to ``result``."""
    hs = tuple(handles)

    def _release() -> None:
        for h in hs:
            try:
                h.unpersist()
            except Exception:
                pass  # session already stopped / JVM gone

    result._cache_release = _release
    weakref.finalize(result, _release)
    return result


def release_caches(df: DataFrame) -> None:
    """Explicitly free intermediates persisted by the operator that
    produced ``df`` (no-op for frames without attached caches). The
    result itself stays valid — Spark recomputes if it is acted on
    again."""
    fn = getattr(df, "_cache_release", None)
    if fn is not None:
        fn()
