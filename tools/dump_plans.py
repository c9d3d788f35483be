#!/usr/bin/env python
"""Dump `.explain("formatted")` physical plans for named queries to
files — the round-16 optimization evidence trail
(`plans/r16/<q>_{before,after}.txt`). Usage:

    python tools/dump_plans.py <outdir> <suffix> <query> [<query> ...]

writes `<outdir>/<query>_<suffix>.txt` for each query, built at sf0.01
(plan SHAPE is scale-invariant for these heads; sf only changes
statistics, and the cheap tier keeps the dump fast)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    from parallelutilities_jl_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark(app_name="pu_dump_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
