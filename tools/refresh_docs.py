"""Rewrite the README's registry-derived surface counts in place.

The counts are enforced by tests/test_docs.py; this is the one place
that edits them. Run after registering queries:
    python tools/refresh_docs.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tugas_2_big_data_spark import queries as q  # noqa: E402

README = os.path.join(REPO, "README.md")


def main() -> None:
    text = open(README).read()
    n = len(q.queries())
    n_stream = sum(1 for name in q.queries() if name.startswith("stream_"))
    text = re.sub(r"\d+ registered queries", f"{n} registered queries", text)
    text = re.sub(
        r"\d+ Structured Streaming drains",
        f"{n_stream} Structured Streaming drains",
        text,
    )
    with open(README, "w") as f:
        f.write(text)
    print(f"README refreshed: {n} queries, {n_stream} streaming drains")


if __name__ == "__main__":
    main()
