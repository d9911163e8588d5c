"""Order-insensitive per-query value fingerprints: sum(xxhash64(all
columns)) + row count per registered query, at one scale factor.

Written for optimization rounds: capture BEFORE hashes, change code,
re-run, diff — equal sums at every tier prove the optimization did not
move a single output bit (stricter than the driver's rounded-value
oracle compare). Usage:

    python tools/value_hashes.py sf0.001 out.json [name ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402


def main() -> None:
    sf = sys.argv[1]
    out_path = sys.argv[2]
    sf_dir = os.path.join("/root/testdata", sf)
    spark = get_spark(app_name=f"value_hashes_{sf}")
    from pyspark.sql import functions as F

    reg = q.queries()
    names = sys.argv[3:] or sorted(reg)
    out: dict[str, dict] = {}
    for name in names:
        try:
            df = reg[name](spark, sf_dir)
            [(h, n)] = df.select(
                F.sum(F.xxhash64(*[F.col(c) for c in df.columns])),
                F.count(F.lit(1)),
            ).collect()
            out[name] = {"hash": h, "rows": n}
        except Exception as ex:  # noqa: BLE001
            out[name] = {"error": f"{type(ex).__name__}: {ex}"[:300]}
        print(f"[hash] {name}: {out[name]}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    spark.stop()


if __name__ == "__main__":
    main()
