"""Per-fixture memo for relations/artifacts that are pure functions of
the registered model.

Two classes of cached values:

* **Driver-collected STATIC dimension data** — the benchmark shingle
  set (contamination family), the fixed probe vectors (ANN family):
  small constants a production job broadcasts once, re-collected here
  per query invocation only because the bench/gate re-enters the query
  function.
* **Pretrained artifacts** — the perplexity LM relations, the BM25
  inverted index, the BPE merge table, the exact ground-truth ranking
  the ANN scoreboards grade against.  In production these are trained/
  built ONCE and served to every query (the reference memoizes its
  meta-scan the same way — MetaTableHolder.needUpdate,
  hbase-tools-api/.../meta/MetaTableHolder.java); retraining per query
  would be the wrong production shape, so the query-path cost we
  measure is scoring/serving, not training.  Training stays fully
  in-plan (a DataFrame build, never a driver loop) and IS measured on
  the first build.

Keying: ``sf_cached`` keys on (sf_dir, key) and assumes the fixture
files are immutable for the life of the process (true for
/root/testdata).  ``model_cached`` additionally fingerprints the
ANALYZED PLAN of the dependency views (semanticHash), so a test that
re-registers ``documents`` with different content under the same
sf_dir gets a rebuild, not a stale artifact — the staleness class the
round-5 advice flagged for the served BM25 index.  Entries for a
superseded fingerprint are evicted eagerly so their checkpoint blocks
become collectable.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}

#: Monotone counter of memo LOOKUPS (hit or miss).  bench.py diffs it
#: around each query run to annotate which queries serve from memoized
#: artifacts (round-6 verdict: the artifact must separate build cost
#: from warm serving instead of hiding the build in run 1 of 5).
_TOUCHES = 0


def touches() -> int:
    return _TOUCHES


def sf_cached(sf_dir: str, key: str, builder: Callable[[], Any]) -> Any:
    """Return the memoized value for (sf_dir, key), building it once."""
    global _TOUCHES
    _TOUCHES += 1
    k = (sf_dir, key)
    if k not in _CACHE:
        _CACHE[k] = builder()
    return _CACHE[k]


def _dep_fingerprint(spark, deps: tuple[str, ...]) -> str:
    """Semantic hash of each dependency view's analyzed plan.

    Stable across re-reads of the same parquet path; changes whenever a
    view is re-registered over different content (a fresh LogicalRDD /
    LocalRelation canonicalizes to a different hash).  Analysis-only —
    no job runs.

    The Spark application id is part of the fingerprint: cached values
    may be DataFrames holding localCheckpoint blocks, which die with
    their session — a restarted session in the same process must
    rebuild rather than be served a dead handle (parquet-backed views
    would otherwise fingerprint identically across sessions)."""
    parts = [spark.sparkContext.applicationId]
    for dep in deps:
        df = spark.table(dep)
        parts.append(str(df._jdf.queryExecution().analyzed().semanticHash()))
    return "|".join(parts)


def model_cached(
    m,
    key: str,
    builder: Callable[[], Any],
    deps: tuple[str, ...] = ("documents",),
) -> Any:
    """Memoize ``builder()`` per (sf_dir, key, content-of-deps).

    ``m`` is a catalog.Model.  Use for anything derived from the
    registered views (pretrained artifacts, checkpointed relations);
    use plain ``sf_cached`` only for values derived from the immutable
    fixture files themselves."""
    global _TOUCHES
    _TOUCHES += 1
    fp = _dep_fingerprint(m.spark, deps)
    k = (m.sf_dir, key, fp)
    if k not in _CACHE:
        # evict superseded fingerprints so localCheckpoint blocks held
        # by old entries become collectable
        for old in [c for c in _CACHE if c[:2] == (m.sf_dir, key)]:
            del _CACHE[old]
        _CACHE[k] = builder()
    return _CACHE[k]


def checkpointed(
    m,
    key: str,
    builder: Callable[[], Any],
    deps: tuple[str, ...] = ("documents",),
):
    """``model_cached`` specialization for DataFrames: eagerly
    localCheckpoints the built relation so every consumer reuses the
    materialized blocks instead of re-running the training lineage.
    At 100 TB this is a persisted table (Delta/parquet artifact); the
    serving-path twins (``materialize_ppl_lm``, the inverted index)
    are that shape — this is the in-session equivalent."""
    return model_cached(
        m, key, lambda: builder().localCheckpoint(eager=True), deps
    )


def clear() -> None:
    _CACHE.clear()
