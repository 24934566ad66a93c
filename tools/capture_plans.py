"""Capture `.explain("formatted")` for named queries into plans/<tag>/.

Round-13 deliverable plumbing: the optimization round commits
plans/r13/<query>_before.txt and _after.txt for every query it touches,
so plan-shape claims (Exchange counts, join strategy, PushedFilters)
are checkable without running Spark.

Usage: python tools/capture_plans.py <tag_dir> <suffix> name [name ...]
       python tools/capture_plans.py plans/r13 before q1_pricing_summary l2_minhash_neardup
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lens_warehouse_spark import registry
from lens_warehouse_spark.session import get_spark


def main() -> None:
    tag_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, tag_dir)
    os.makedirs(out_dir, exist_ok=True)
    registry.load_all()
    spark = get_spark("capture_plans")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
