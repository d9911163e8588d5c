"""Per-query driver-job counts + wall time (round 12 probe).

The r11 driver data showed every slowest-set query running FASTER on
8 cores than 32 at sf0.1 — the measured cost is scheduler barriers
(driver jobs of tiny tasks), not compute. This probe counts the
actual jobs each query submits (setJobGroup + statusTracker) so
barrier-cut optimizations have a direct, noise-free metric: job count
is deterministic, unlike wall time on this host.

Usage: python tools/probe_job_counts.py sf0.1 out.json [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402


def main() -> None:
    sf = sys.argv[1]
    out_path = sys.argv[2]
    sf_dir = os.path.join("/root/testdata", sf)
    spark = get_spark(app_name=f"job_counts_{sf}")
    sc = spark.sparkContext
    reg = q.queries()
    names = sys.argv[3:] or sorted(reg)
    out: dict[str, dict] = {}
    for name in names:
        group = f"probe_{name}"
        sc.setJobGroup(group, name)
        t0 = time.monotonic()
        try:
            df = reg[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.monotonic() - t0
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            out[name] = {"jobs": jobs, "wall_s": round(wall, 3)}
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": f"{type(ex).__name__}: {ex}"[:300]}
        finally:
            sc.setJobGroup(None, None)
        print(f"[jobs] {name}: {out[name]}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
