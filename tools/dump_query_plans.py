"""Dump .explain('formatted') for named queries into a directory.

Usage: python tools/dump_query_plans.py <sf> <outdir> <suffix> [name ...]
Writes <outdir>/<name>_<suffix>.txt per query. Used by optimization
rounds to commit before/after plan evidence (plans/rNN/).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tugas_2_big_data_spark.session import get_spark  # noqa: E402
from tugas_2_big_data_spark import queries as q  # noqa: E402


def main() -> None:
    sf, outdir, suffix = sys.argv[1:4]
    names = sys.argv[4:]
    sf_dir = os.path.join("/root/testdata", sf)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_{suffix}")
    reg = q.queries()
    for name in names:
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        try:
            df = reg[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            plan = f"ERROR: {type(ex).__name__}: {ex}"
        with open(path, "w") as f:
            f.write(plan)
        print(f"[plan] {name} -> {path} ({len(plan)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
