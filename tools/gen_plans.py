#!/usr/bin/env python
"""Regenerate PLANS.md: `explain("formatted")` of every bench query at
sf0.1 (AQE initial plans). Run after any plan-affecting change."""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADER = """# PLANS — physical plans of the headline (bench) queries

Auto-generated (`python tools/gen_plans.py`) with
`df.explain("formatted")` at sf0.1, AQE initial plans. What to look for,
per the 100 TB posture: `PushedFilters`/`ReadSchema` on every scan
(pushdown + pruning), `BroadcastHashJoin` for dim sides,
`partial_…/…` then final hash aggregates (map-side combine), and
`WholeStageCodegen` spans over the expression work. `tests/test_plans.py`
pins the load-bearing properties; this file is the human-readable dump.
Presentation sorts were removed from most bench queries (order-
insensitive compare), so final Sort/Exchange pairs only appear where
ordering is semantic (top-k).
"""


def main() -> None:
    from finance_data_ingestion_pipeline_with_kafka_spark.registry import load_all
    from finance_data_ingestion_pipeline_with_kafka_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gen-plans")
    out = [HEADER]
    for name, spec in sorted(load_all().items()):
        if not spec.bench:
            continue
        df = spec.fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        out.append(f"\n## {name}\n\n```\n{buf.getvalue().rstrip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
