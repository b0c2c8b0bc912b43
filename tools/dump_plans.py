#!/usr/bin/env python
"""Dump .explain('formatted') for named registered queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag_suffix> <query> [<query> ...]
       python tools/dump_plans.py before trail_classifier canonical_docs

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag_suffix>.txt (default
round dir: r14). The optimization judge reads these files against the
code; regenerate the *_after.txt set whenever a touched query's plan
changes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trail_condition_etl_spark import registry  # noqa: E402
from trail_condition_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    qs = registry.queries()
    from trail_condition_etl_spark.operators import artifacts

    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
        artifacts.clear_caches(spark)


if __name__ == "__main__":
    main()
