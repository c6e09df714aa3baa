"""Per-query isolation bench (guide §1.4): noop-sink timing + plan dump.

NOT part of the driver contract — bench.py is frozen for measurement; this
file exists so the optimization loop can time individual queries quickly and
capture `.explain("formatted")` before/after plans into plans/r06/.

Usage:
    python bench_extra.py q1 q2 ...           # time the named queries
    python bench_extra.py --plans-to DIR --suffix _before q1 q2
    python bench_extra.py --all               # every registered query
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... as in bench.py

Prints one line per query: name, min/all seconds (min-of-N like bench.py,
rebuild-per-repeat like the EXTRA block so construction-time work counts).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))


def _noop_run(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans-to", default=None, help="dump explain(formatted) here")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--repeats", type=int, default=REPEATS)
    args = ap.parse_args()

    import __spark_entry__ as entry

    from job_crawler_spark.operators.checkpoints import release_checkpoints
    from job_crawler_spark.session import get_spark

    spark = get_spark("jcs-bench-extra", cores=CPUS)
    queries = entry.queries()
    names = list(queries) if args.all else args.names
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    results: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        df = queries[name](spark, SF_DIR)
        if args.plans_to:
            os.makedirs(args.plans_to, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_to, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        if args.repeats > 0:
            _noop_run(df)  # warm
        release_checkpoints(df)
        reps = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = queries[name](spark, SF_DIR)
            _noop_run(df)
            reps.append(round(time.perf_counter() - t0, 3))
            release_checkpoints(df)
        results[name] = reps
        if reps:
            print(f"{name}: min={min(reps)} all={reps}", flush=True)
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({n: min(r) for n, r in results.items() if r}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
