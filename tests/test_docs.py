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


def _load_refresh_docs():
    import importlib.util

    path = os.path.join(
        os.path.dirname(README), "tools", "refresh_docs.py"
    )
    spec = importlib.util.spec_from_file_location("refresh_docs", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_round_notes_stamped_block_is_current():
    """The newest ROUND*_NOTES.md carries a generated summary block
    (registry count, bench totals, flag count, correctness rows)
    between stamp markers; regenerating it from the artifacts must
    reproduce the committed text byte-for-byte. Round 5's notes drifted
    twice on hand-typed numbers — this makes the notes' headline claims
    enforced, like the README counts. Refresh: python
    tools/refresh_docs.py"""
    rd = _load_refresh_docs()
    notes = rd.latest_round_notes()
    assert notes is not None, "no ROUND*_NOTES.md found"
    text = open(notes).read()
    m = re.search(
        re.escape(rd.STAMP_BEGIN) + r"\n(.*?)\n" + re.escape(rd.STAMP_END),
        text,
        re.DOTALL,
    )
    assert m, (
        f"{os.path.basename(notes)} has no stamped summary block — add "
        f"the markers and run tools/refresh_docs.py"
    )
    assert m.group(1) == rd.stamped_block(), (
        f"{os.path.basename(notes)} stamped block is stale — run "
        f"tools/refresh_docs.py"
    )


def test_coverage_md_mentions_every_registered_query():
    """The COVERAGE.md crosswalk lagged the registry in round 7 (four
    late queries registered without doc rows) — every name in
    queries() must appear in the crosswalk so a new query forces a
    coverage row, not a silent omission."""
    coverage = os.path.join(os.path.dirname(README), "COVERAGE.md")
    text = open(coverage).read()
    missing = [n for n in q.queries() if n not in text]
    assert not missing, (
        f"registered queries absent from COVERAGE.md: {missing} — add "
        f"crosswalk rows"
    )
