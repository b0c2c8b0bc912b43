"""Per-corpus-snapshot artifact cache.

A curation pipeline reuses a handful of expensive intermediates far more
often than it computes them — the near-dup pair graph feeds clustering,
canonical-doc selection, PageRank, degree diagnostics, slice attribution
and the curation funnel (r2 rebuilt it from raw text in all six). The
persisted-index pattern (`similarity.build_ivf_index`) is the answer:
materialize ONCE per corpus snapshot, keyed by the CONTENT identity of
the input files, and let every consumer read the parquet artifact.

At 100 TB the artifact would live next to the corpus snapshot in the
warehouse (keyed by snapshot id); here it lives in a temp dir keyed by
(path, size, mtime) of the input files — same lifecycle, same invariant:
one build per snapshot, consumers pay only the read.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession


def corpus_key(df: DataFrame) -> tuple | None:
    """Identity of a file-backed frame's CONTENT: (path, size, mtime) of
    every input file PLUS the frame's canonicalized-plan semantic hash.
    The plan component matters: a FILTERED view of a table reads the same
    files as the whole table, and keying on files alone would silently
    serve the full-corpus artifact for the subset (or vice versa).
    `semanticHash()` canonicalizes Catalyst expression ids (which differ
    per invocation of the same expression) while keeping every literal
    intact — unlike a textual `#\\d+` strip, two plans that differ only
    in a string literal like 'a#1' vs 'a#2' hash differently.
    None for non-file sources -> caller memoizes a persisted frame."""
    try:
        files = sorted(df.inputFiles())
        plan_id = df.semanticHash()
    except Exception:
        return None
    if not files:
        return None
    key: list = [plan_id]
    for f in files:
        p = f.removeprefix("file:")
        try:
            st = os.stat(p)
            key.append((f, st.st_size, st.st_mtime_ns))
        except OSError:
            key.append((f, -1, -1))
    return tuple(key)


# committed artifacts: (kind, *corpus_key) -> parquet dir. Publication
# into this dict IS the commit point — a path appears here only after
# its write fully succeeded, so readers never see a partial artifact.
_ARTIFACTS: dict[tuple, str] = {}
# in-memory fallback memo for sources with no stable content identity:
# (kind, id(source)) -> (source_ref, persisted frame). The source
# reference is held ON PURPOSE: it keeps id(source) from being recycled
# by a new object while the memo entry lives.
_FALLBACKS: dict[tuple, tuple[DataFrame, DataFrame]] = {}
_LOCK = threading.Lock()


def build_count() -> int:
    """How many artifact builds this process has paid (test seam: the
    amortization tests assert a second consumer/threshold does NOT
    increment this)."""
    return _BUILDS[0]


_BUILDS = [0]


def clear_caches(spark: SparkSession | None = None) -> None:
    """Release every in-memory frame the artifact layer is holding: the
    memoized non-file fallbacks here, plus (when a session is passed)
    every frame the bounded-round operators lazily `.persist()`-ed
    (dedup.dedup_clusters, similarity.semantic_dedup, curation paths —
    their per-round frames stay cached until explicitly evicted). This
    is the library-level eviction seam; bench/verify call it between
    queries, and a long-lived embedding service would call it per
    corpus snapshot. File-backed artifacts are NOT touched — they are
    disk-bounded (one per (kind, snapshot)) and removed at process exit.

    The memoized fallbacks are unpersisted explicitly (not just dropped
    from the dict): without a session argument there is no clearCache()
    sweep, and dropping the only reference would strand their cached
    blocks in Spark's CacheManager until LRU pressure."""
    with _LOCK:
        dropped = list(_FALLBACKS.values())
        _FALLBACKS.clear()
    for _src, frame in dropped:
        try:
            frame.unpersist()
        except Exception:  # session already stopped: nothing to release
            pass
    if spark is not None:
        spark.catalog.clearCache()


def materialize(source: DataFrame, kind: str, build_fn, schema: str) -> DataFrame:
    """A DataFrame over the materialized artifact for (kind, snapshot of
    `source`), building it on first use. `build_fn()` must return the
    artifact frame; `schema` pins the read so consumers are immune to
    inference drift.

    Retention: artifact directories are removed at PROCESS EXIT (atexit,
    registered BEFORE the write so a failed build never leaks the dir),
    never mid-process — a lazy frame returned earlier may hold the path
    in its lineage, and deleting under it would fail that frame's next
    action (an in-flight LRU cannot see outstanding references). Disk
    bound: one artifact per (kind, snapshot) seen by the process; at
    warehouse scale the artifact would live next to the corpus snapshot
    with the warehouse's own retention, and this temp-dir lifecycle is
    the local stand-in.

    Concurrency: publication into the registry is the commit point. Two
    racing builders for the same key each write a private staging dir;
    the first to publish wins, the loser's dir is removed immediately.

    Falls back to a process-memoized PERSISTED frame — multi-consumer
    reuse is the whole point of the artifact — when `source` has no
    stable content identity to key on; `clear_caches()` is the eviction
    seam for those."""
    spark = source.sparkSession
    key = corpus_key(source)
    if key is None:
        fk = (kind, id(source))
        with _LOCK:
            hit = _FALLBACKS.get(fk)
        if hit is not None:
            return hit[1]
        _BUILDS[0] += 1
        frame = build_fn().persist()
        with _LOCK:
            # re-check under the lock (ADVICE r4): a racing builder may
            # have published while we built. The loser must unpersist
            # its frame (it is registered nowhere — clear_caches could
            # never evict it) and share the registered one, so all
            # consumers see ONE frame.
            hit = _FALLBACKS.get(fk)
            if hit is None:
                _FALLBACKS[fk] = (source, frame)
                return frame
        try:
            frame.unpersist()
        except Exception:
            pass
        return hit[1]
    k = (kind,) + key
    with _LOCK:
        path = _ARTIFACTS.get(k)
    if path is None:
        staging = tempfile.mkdtemp(prefix=f"artifact_{kind}_")
        atexit.register(shutil.rmtree, staging, ignore_errors=True)
        try:
            _BUILDS[0] += 1
            build_fn().write.mode("overwrite").parquet(staging)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        with _LOCK:
            if k not in _ARTIFACTS:
                _ARTIFACTS[k] = staging
            else:
                shutil.rmtree(staging, ignore_errors=True)
            path = _ARTIFACTS[k]
    return spark.read.schema(schema).parquet(path)


_INDEX_DIRS: dict[tuple, str] = {}


def materialize_dir(source: DataFrame, kind: str, build_fn) -> str:
    """Directory-artifact twin of `materialize`, for index builders that
    write a DIRECTORY TREE by side effect (IVF/PQ codebooks + cell-
    partitioned codes): one build per (kind, corpus snapshot), every
    later call returns the already-built path, so repeated registered-
    query invocations in a long-lived session pay probe cost only (and
    never accumulate orphan temp dirs). `build_fn(path)` must fully
    populate `path`; publication into the registry is the commit point,
    a failed build removes its staging dir and re-raises. Non-file
    sources fall back to a fresh build per call (still exit-cleaned)."""
    key = corpus_key(source)
    if key is None:
        path = scratch_dir(f"{kind}_")
        _BUILDS[0] += 1
        build_fn(path)
        return path
    k = (kind,) + key
    with _LOCK:
        path = _INDEX_DIRS.get(k)
    if path is None:
        staging = scratch_dir(f"{kind}_")
        try:
            _BUILDS[0] += 1
            build_fn(staging)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        with _LOCK:
            if k not in _INDEX_DIRS:
                _INDEX_DIRS[k] = staging
            else:
                shutil.rmtree(staging, ignore_errors=True)
            path = _INDEX_DIRS[k]
    return path


def scratch_dir(prefix: str) -> str:
    """A temp directory with the artifact lifecycle (removed at process
    exit) for roundtrip queries that write an index/stream/table and
    read it back in the same invocation. Registered-query runs in a
    long-lived session previously mkdtemp'd and never cleaned these."""
    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path
