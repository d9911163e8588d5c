"""Docs-vs-registry sync: the README's surface counts are generated
claims, not prose — they must equal what the registry actually
exposes. Hand-edited counts drifted twice (rounds 3 and 4); this pins
them so a query added without a doc refresh fails the suite instead
of shipping a stale number. Refresh with: python tools/refresh_docs.py
"""

from __future__ import annotations

import os
import re

from tugas_2_big_data_spark import queries as q

README = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"
)


def test_readme_query_count_matches_registry():
    text = open(README).read()
    m = re.search(r"(\d+) registered queries", text)
    assert m, "README lost its query-count sentence"
    assert int(m.group(1)) == len(q.queries()), (
        f"README says {m.group(1)} queries, registry has "
        f"{len(q.queries())} — run tools/refresh_docs.py"
    )


def test_readme_streaming_count_matches_registry():
    text = open(README).read()
    m = re.search(r"(\d+) Structured Streaming drains", text)
    assert m, "README lost its streaming-count sentence"
    n_stream = sum(1 for n in q.queries() if n.startswith("stream_"))
    assert int(m.group(1)) == n_stream, (
        f"README says {m.group(1)} streaming drains, registry has "
        f"{n_stream} — run tools/refresh_docs.py"
    )


def test_every_registered_query_has_a_value_oracle():
    """The engine's standing claim: zero rows-only checks. A new query
    registered with oracle=None must be a deliberate, documented
    exception — there are none today."""
    assert set(q.queries()) == set(q.oracle_sql())
