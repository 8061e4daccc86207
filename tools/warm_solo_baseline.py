"""Measure warm-solo sf0.1 baselines for NEW queries and patch them
into .benchmarks/baseline_sf0.1.json — the protocol every round's new
additions use (NOTES_r9 item 1): one warm session (all tables
counted), best of 3 runs per query with spark.catalog.clearCache()
between queries, noop sink like bench.py.

Usage: python tools/warm_solo_baseline.py q201_... [q202_... ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    names = sys.argv[1:]
    if not names:
        print("usage: warm_solo_baseline.py <query> [...]")
        return 1
    import __spark_entry__ as entrymod
    from big_data_project_datapipeline_spark.session import get_spark
    from big_data_project_datapipeline_spark.tables import (
        TABLE_NAMES,
        load_table,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="warm_solo_baseline")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    queries = entrymod.queries()
    best: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            el = time.perf_counter() - t0
            best[name] = round(min(best.get(name, el), el), 3)
        print(f"{name}: {best[name]}s", flush=True)
    path = os.path.join(REPO, ".benchmarks", "baseline_sf0.1.json")
    with open(path) as fh:
        doc = json.load(fh)
    doc["queries"].update(best)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"patched {len(best)} baselines into {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
