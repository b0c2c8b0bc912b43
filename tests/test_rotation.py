"""Sample-head rotation unit tests (VERDICT r7 directive 1): the driver
samples a ~50-query prefix of `queries()`, so the ordering logic in
registry._sample_head decides which rows get re-verified each round.
These tests drive it with a FAKE coverage map — no Spark needed."""

from __future__ import annotations

from trail_condition_etl_spark import registry


def _fake_coverage(last_rounds: dict[str, int]) -> dict[str, dict[str, int]]:
    return {n: {"first": 1, "last": r} for n, r in last_rounds.items()}


def test_pinned_head_first_then_never_green():
    """Pinned head leads; never-covered registered queries come before
    any covered query outside the pinned/changed sets."""
    registered = list(registry._QUERIES)
    covered = _fake_coverage(
        {n: 7 for n in registered if n not in registered[:3]}
    )
    head = registry._sample_head(covered)
    pinned = [n for n in registry._PINNED_HEAD]
    assert head[: len(pinned)] == pinned
    never = [
        n
        for n in registered[:3]
        if n not in covered and n not in pinned
        and n not in registry._CHANGED_TAIL
    ]
    tail_after_pins = head[len(pinned):]
    for n in never:
        covered_later = [
            m for m in tail_after_pins
            if m in covered and m not in registry._CHANGED_TAIL
        ]
        assert tail_after_pins.index(n) < tail_after_pins.index(
            covered_later[0]
        ), f"never-green {n} must precede all covered queries"


def test_covered_remainder_is_stalest_first():
    """Covered queries outside pinned/changed/never-green blocks are
    ordered by oldest LAST-green round first: a query re-greened last
    round sorts after one whose evidence is five rounds old, regardless
    of first-green round."""
    registered = list(registry._QUERIES)
    skip = set(registry._PINNED_HEAD) | set(registry._CHANGED_TAIL)
    pool = [n for n in registered if n not in skip]
    assert len(pool) >= 6, "registry too small for this test"
    # alternate staleness so registration order alone can't pass
    last = {n: (2 if i % 2 == 0 else 7) for i, n in enumerate(pool)}
    covered = _fake_coverage(last)
    # pinned/changed queries covered too (fresh) so they don't enter
    # the never-green block
    for n in skip:
        if n in registry._QUERIES:
            covered[n] = {"first": 1, "last": 7}
    head = registry._sample_head(covered)
    remainder = [n for n in head if n in pool]
    lasts = [last[n] for n in remainder]
    assert lasts == sorted(lasts), (
        "covered remainder must be ordered oldest-last-green first"
    )
    # every registered query appears exactly once
    assert sorted(head) == sorted(
        set(head)
    ) and set(registered) <= set(head)


def test_flat_legacy_coverage_format_accepted():
    """Pre-r8 coverage files mapped name -> first-green int; the loader
    must normalize them so the rotation never crashes on an old file."""
    raw = {"a": 3, "b": {"first": 2, "last": 6}}
    norm = {
        n: (v if isinstance(v, dict) else {"first": v, "last": v})
        for n, v in raw.items()
    }
    assert norm["a"] == {"first": 3, "last": 3}
    assert norm["b"]["last"] == 6


def test_shipping_coverage_file_is_complete_and_fresh():
    """The checked-in driver_coverage.json must hold an entry for every
    registered query (the r7 milestone: total driver coverage) in the
    {"first", "last"} form."""
    cov = registry._driver_coverage()
    missing = [n for n in registry._QUERIES if n not in cov]
    # queries registered THIS round legitimately have no row yet
    assert len(missing) <= len(registry._PINNED_HEAD), (
        f"stale driver_coverage.json — run tools/update_driver_coverage.py "
        f"(missing: {missing[:10]})"
    )
    for n, ent in cov.items():
        assert set(ent) == {"first", "last"} and ent["first"] <= ent["last"], n


def test_coverage_file_matches_correctness_records_exactly():
    """The ingest gate (VERDICT r8 directive 2): driver_coverage.json
    must equal a fresh recomputation from the CORRECTNESS_r*.json
    records on disk — if a new round's record landed without
    tools/update_driver_coverage.py running, this fails, so the
    coverage lag can never silently exceed the current session."""
    import os
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "tools"))
    try:
        from update_driver_coverage import green_rounds
    finally:
        sys.path.pop(0)
    recomputed = green_rounds()
    shipped = registry._driver_coverage()
    assert shipped == recomputed, (
        "driver_coverage.json is stale vs CORRECTNESS_r*.json — run "
        "tools/update_driver_coverage.py (differing keys: "
        f"{sorted(set(shipped) ^ set(recomputed))[:10]}; first value "
        f"drift: "
        f"{[(k, shipped[k], recomputed[k]) for k in sorted(set(shipped) & set(recomputed)) if shipped[k] != recomputed[k]][:5]})"
    )


def test_doc_query_counts_match_registry():
    """The registered-query count stated in README.md and the verify
    skill must equal len(registry) — the count drifted by one in three
    consecutive rounds (r7-r9) because docs were hand-updated before
    the round's last registration landed (VERDICT r9 directive 6)."""
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = len(registry._QUERIES)
    for rel, pattern in [
        ("README.md", r"across all (\d+) registered queries"),
        ("README.md", r"`queries\(\)` — (\d+) named queries"),
        (
            os.path.join(".claude", "skills", "verify", "SKILL.md"),
            r"With (\d+) registered queries",
        ),
        (
            os.path.join(".claude", "skills", "verify", "SKILL.md"),
            r"at (\d+) queries",
        ),
    ]:
        path = os.path.join(repo, rel)
        with open(path) as f:
            text = f.read()
        stated = [int(m) for m in re.findall(pattern, text)]
        assert stated, f"{rel}: pattern {pattern!r} not found"
        assert all(s == n for s in stated), (
            f"{rel} states query count {stated} but the registry has "
            f"{n} — update the doc alongside the registration"
        )
