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

import os
import re
import tempfile

from pyspark.sql import DataFrame


def corpus_key(df: DataFrame) -> tuple | None:
    """Identity of a file-backed frame's CONTENT: (path, size, mtime) of
    every input file PLUS the frame's normalized logical plan (expression
    ids stripped — they differ per invocation of the same expression).
    The plan component matters: a FILTERED view of a table reads the same
    files as the whole table, and keying on files alone would silently
    serve the full-corpus artifact for the subset (or vice versa).
    None for non-file sources -> caller computes inline."""
    try:
        files = sorted(df.inputFiles())
        plan = re.sub(
            r"#\d+", "#", df._jdf.queryExecution().analyzed().toString()
        )
    except Exception:
        return None
    if not files:
        return None
    key: list = [plan]
    for f in files:
        p = f.removeprefix("file:")
        try:
            st = os.stat(p)
            key.append((f, st.st_size, st.st_mtime_ns))
        except OSError:
            key.append((f, -1, -1))
    return tuple(key)


_ARTIFACTS: dict[tuple, str] = {}


def materialize(source: DataFrame, kind: str, build_fn, schema: str) -> DataFrame:
    """A DataFrame over the materialized artifact for (kind, snapshot of
    `source`), building it on first use. `build_fn()` must return the
    artifact frame; `schema` pins the read so consumers are immune to
    inference drift.

    Retention: artifact directories are removed at PROCESS EXIT (atexit),
    never mid-process — a lazy frame returned earlier may hold the path
    in its lineage, and deleting under it would fail that frame's next
    action (an in-flight LRU cannot see outstanding references). Disk
    bound: one artifact per (kind, snapshot) seen by the process; at
    warehouse scale the artifact would live next to the corpus snapshot
    with the warehouse's own retention, and this temp-dir lifecycle is
    the local stand-in. Falls back to computing inline — lazily
    PERSISTED, since multi-consumer reuse is the whole point of the
    artifact — when `source` has no stable content identity to key on."""
    import atexit
    import shutil

    spark = source.sparkSession
    key = corpus_key(source)
    if key is None:
        return build_fn().persist()
    k = (kind,) + key
    if k not in _ARTIFACTS:
        path = tempfile.mkdtemp(prefix=f"artifact_{kind}_")
        build_fn().write.mode("overwrite").parquet(path)
        _ARTIFACTS[k] = path
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return spark.read.schema(schema).parquet(_ARTIFACTS[k])
