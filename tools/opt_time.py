"""Round-16 optimization harness: isolate one query's cost with the noop sink.

Usage:
    python tools/opt_time.py [--sf DIR] [--repeat N] [--plan OUTDIR] \
        [--action noop|count] query_name ...

Per the optimization guide §1.4 the timed action is a noop-format write
(computes every column of every row, discards the result) so the number is
the computation, not the sink or an optimizer-pruned count. §1.5: each run
is labelled with setJobDescription. Protocol mirrors bench.py: one warmup
pass at sf0.001 (JIT/codegen), cache cleared before each timed run, the
reported value is the median with [min, max] spread.

``--plan plans/r16`` additionally dumps ``<name>_before.txt`` (or
``_after.txt`` with ``--tag after``) containing explain("formatted").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import oe_batch_processing_spark.operators  # noqa: F401
from oe_batch_processing_spark import registry
from oe_batch_processing_spark.plans.progress import formatted_plan
from oe_batch_processing_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    warm_dir = "/root/testdata/sf0.001"
    repeat = 3
    plan_dir = None
    tag = "before"
    action = "noop"
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif a == "--repeat":
            repeat = int(args[i + 1]); i += 2
        elif a == "--plan":
            plan_dir = args[i + 1]; i += 2
        elif a == "--tag":
            tag = args[i + 1]; i += 2
        elif a == "--action":
            action = args[i + 1]; i += 2
        else:
            names.append(a); i += 1

    spark = get_spark("opt-time")
    spark.range(1).count()
    from oe_batch_processing_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    spark.range(0, 1000, 1, 8).mapInPandas(lambda it: it, schema="id long").count()

    out: dict[str, object] = {}
    for name in names:
        fn = registry.QUERIES[name]
        try:
            fn(spark, warm_dir).count()  # JIT warmup at the tiny SF
        except Exception as exc:  # noqa: BLE001
            out[name] = {"warmup_error": str(exc)[:200]}
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(formatted_plan(fn(spark, sf_dir)))
        runs = []
        for r in range(repeat):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"opt:{name} run{r}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        runs_s = sorted(runs)
        out[name] = {
            "median": runs_s[len(runs_s) // 2],
            "spread": [runs_s[0], runs_s[-1]],
            "runs": runs,
            "action": action,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
