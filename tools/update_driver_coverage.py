"""Regenerate trail_condition_etl_spark/driver_coverage.json from the
driver's per-round correctness records.

Run at the START of each round, after the driver writes
CORRECTNESS_r{N}.json for the previous round:

    python tools/update_driver_coverage.py

The file maps query name -> {"first": F, "last": L}: the FIRST and the
most recent (LAST) round whose CORRECTNESS row was fully green (rows +
schema + hash match, no error). registry.py derives the driver sample
head from it: registered queries absent from the file have never been
driver-verified and go to the front of the sample order; everything
else is ordered stalest-first (oldest LAST-green round first), so each
round's ~50-query prefix re-verifies the rows whose green evidence is
oldest (VERDICT r7 directive 1).
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(
    REPO, "trail_condition_etl_spark", "driver_coverage.json"
)


def green_rounds() -> dict[str, dict[str, int]]:
    cov: dict[str, dict[str, int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if not green:
                continue
            ent = cov.setdefault(name, {"first": rnd, "last": rnd})
            ent["first"] = min(ent["first"], rnd)
            ent["last"] = max(ent["last"], rnd)
    return cov


def main() -> None:
    cov = green_rounds()
    # atomic replace: a crash mid-write must never leave a truncated
    # JSON (registry would silently treat EVERY query as never-green
    # and the sample rotation would degrade)
    tmp = f"{OUT}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(cov, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, OUT)
    print(f"{len(cov)} ever-green queries -> {OUT}")


if __name__ == "__main__":
    main()
