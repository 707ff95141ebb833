"""Dump ``.explain("formatted")`` for registry queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
With no query names, dumps every registry query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scientific_papers_ocr_spark import queries as Q  # noqa: E402
from scientific_papers_ocr_spark.session import build_session  # noqa: E402


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(Q.REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session(
        app_name="dump-plans",
        cores=8,
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # the pruned probes need their ingest layouts materialised to plan
    Q.ensure_ann_ingest(spark, sf_dir, n_planes=6)
    Q.ensure_ivf_ingest(spark, sf_dir)
    for name in names:
        fn, _sql = Q.REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
