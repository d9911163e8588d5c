"""Unit tests: as-of join edge semantics; skew salting equivalences."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from tugas_2_big_data_spark.operators import asof, skew


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts("2024-01-01T10:00:00")),  # before any right -> NULL
            (2, "u1", _ts("2024-01-01T11:00:00")),  # exactly at right -> match
            (3, "u1", _ts("2024-01-01T12:30:00")),  # between -> 11:00 row
            (4, "u2", _ts("2024-01-01T12:00:00")),  # other key
            (5, "u3", _ts("2024-01-01T12:00:00")),  # key with no right rows
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T11:00:00"), 10.0),
            ("u1", _ts("2024-01-01T13:00:00"), 20.0),
            ("u2", _ts("2024-01-01T09:00:00"), 30.0),
        ],
        ["user_id", "ts", "value"],
    )
    out = {
        r.event_id: (r.value_r, r.ts_r)
        for r in asof.asof_join(left, right).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (10.0, _ts("2024-01-01T11:00:00"))  # inclusive boundary
    assert out[3] == (10.0, _ts("2024-01-01T11:00:00"))
    assert out[4] == (30.0, _ts("2024-01-01T09:00:00"))
    assert out[5] == (None, None)
    assert len(out) == 5  # no row duplication or loss


def test_asof_duplicate_right_ts_tiebreak(spark):
    """With duplicate right-side (by, on), the tiebreak column makes the
    carried row deterministic: greatest tiebreak wins."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T12:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T11:00:00"), 10.0, 100),
            ("u1", _ts("2024-01-01T11:00:00"), 20.0, 300),  # max rid -> carried
            ("u1", _ts("2024-01-01T11:00:00"), 15.0, 200),
        ],
        ["user_id", "ts", "value", "rid"],
    )
    out = asof.asof_join(left, right, tiebreak="rid").collect()
    assert len(out) == 1
    assert out[0].value_r == 20.0
    assert "rid" not in out[0].asDict() and "_tb" not in out[0].asDict()
    # tiebreak on the query's own path: equal left/right ts stays inclusive
    left2 = spark.createDataFrame(
        [(9, "u1", _ts("2024-01-01T11:00:00"))], ["event_id", "user_id", "ts"]
    )
    out2 = asof.asof_join(left2, right, tiebreak="rid").collect()
    assert out2[0].value_r == 20.0


def test_asof_preserves_left_columns(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T12:00:00"), "extra")],
        ["event_id", "user_id", "ts", "note"],
    )
    right = spark.createDataFrame(
        [("u1", _ts("2024-01-01T11:00:00"), 1.5)], ["user_id", "ts", "value"]
    )
    row = asof.asof_join(left, right).collect()[0]
    assert row.note == "extra" and row.value_r == 1.5


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [("hot", float(i)) for i in range(1000)]
        + [(f"k{i}", float(i)) for i in range(50)],
        ["k", "value"],
    )
    plain = {
        r.k: (r.n, r.total, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.k: (r.n, r.total, r.mx)
        for r in skew.salted_agg(
            df,
            ["k"],
            {
                "n": (F.count(F.lit(1)), F.sum("n")),
                "total": (F.sum("value"), F.sum("total")),
                "mx": (F.max("value"), F.max("mx")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_broadcast_join_matches_plain(spark):
    stream = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        ["k", "v"],
    )
    build = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "name"])
    plain = sorted(
        (r.k, r.v, r.name) for r in stream.join(build, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.name)
        for r in skew.salted_broadcast_left(stream, build, "k", n_salts=4).collect()
    )
    assert salted == plain


def test_salted_semi_join_matches_plain(spark):
    """Shuffled (non-broadcast) salted semi-join: identical membership
    to the plain left-semi, with a hot key that dominates the left."""
    left = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"cold{i}") for i in range(600)],
        ["rid", "k"],
    )
    keys = spark.createDataFrame(
        [("hot",), ("cold3",), ("absent",)], ["k"]
    )
    plain = sorted(
        r.rid for r in left.join(keys, "k", "left_semi").collect()
    )
    salted = sorted(
        r.rid
        for r in skew.salted_semi_join(
            left, keys, "k", F.xxhash64("rid"), n_salts=4
        ).collect()
    )
    assert salted == plain
    # n_salts <= 1 must fall back to the plain join
    off = sorted(
        r.rid
        for r in skew.salted_semi_join(
            left, keys, "k", F.xxhash64("rid"), n_salts=1
        ).collect()
    )
    assert off == plain


def test_hot_split_semi_join_matches_plain(spark):
    """Hot/cold split: membership identical to the plain left-semi,
    with hot_top smaller than the key count so BOTH legs are
    exercised (hot keys via broadcast, cold via shuffle)."""
    left = spark.createDataFrame(
        [(i, "hot" if i % 3 else f"cold{i % 11}") for i in range(600)],
        ["rid", "k"],
    )
    keys = spark.createDataFrame(
        [("hot", 400), ("cold3", 18), ("cold7", 18), ("absent", 5)],
        ["k", "n"],
    )
    plain = sorted(
        r.rid for r in left.join(keys.select("k"), "k", "left_semi").collect()
    )
    split = sorted(
        r.rid
        for r in skew.hot_split_semi_join(
            left, keys, "k", "n", hot_top=2
        ).collect()
    )
    assert split == plain
    # hot_top <= 0 must fall back to the plain join
    off = sorted(
        r.rid
        for r in skew.hot_split_semi_join(
            left, keys, "k", "n", hot_top=0
        ).collect()
    )
    assert off == plain


def test_hot_split_inner_join_matches_plain(spark):
    left = spark.createDataFrame(
        [(i, "hot" if i % 2 else f"c{i % 7}") for i in range(400)],
        ["rid", "k"],
    )
    right = spark.createDataFrame(
        [("hot", 200, 1), ("c1", 29, 2), ("c3", 29, 3)],
        ["k", "n", "payload"],
    )
    plain = sorted(
        (r.rid, r.payload)
        for r in left.join(right.drop("n"), "k").collect()
    )
    split = sorted(
        (r.rid, r.payload)
        for r in skew.hot_split_inner_join(
            left, right, "k", "n", hot_top=1
        ).collect()
    )
    assert split == plain


def test_repeated_spans_hot_split_matches_unsplit(spark):
    """hot_grams is a pure execution knob: the span list is identical
    with the hot/cold split on (hot_top forced below the duplicated-
    gram count so both legs run) and off (0), on a corpus with a hot
    boilerplate gram present in every doc."""
    from tugas_2_big_data_spark.operators import dedup

    boiler = "all rights reserved contact the site administrator for details"
    docs = spark.createDataFrame(
        [
            (i, f"{boiler} unique words number {i} " + " ".join(
                f"w{i}x{j}" for j in range(10)
            ))
            for i in range(30)
        ],
        ["doc_id", "text"],
    )
    unsplit = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup.repeated_spans(docs, k=8, hot_grams=0).collect()
    )
    split = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup.repeated_spans(docs, k=8, hot_grams=1).collect()
    )
    assert split == unsplit
    assert len(split) == 30  # every doc carries the boilerplate span
    first_unsplit = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup.repeated_spans(
            docs, k=8, keep="first", hot_grams=0
        ).collect()
    )
    first_split = sorted(
        (r.doc_id, r.span_start, r.span_len)
        for r in dedup.repeated_spans(
            docs, k=8, keep="first", hot_grams=1
        ).collect()
    )
    assert first_split == first_unsplit


def test_asof_null_payload_field_carried_atomically(spark):
    """The winning right row travels as one struct: a NULL field in the
    matched row stays NULL — it is NOT backfilled from an older right
    row (ADVICE r2: per-column last() emitted rows that never existed)."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T12:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T10:00:00"), 10.0, "older"),
            ("u1", _ts("2024-01-01T11:00:00"), None, "winner"),
        ],
        ["user_id", "ts", "value", "tag"],
    )
    row = asof.asof_join(left, right).collect()[0]
    assert row.tag_r == "winner"
    assert row.value_r is None  # not backfilled from the 10:00 row
    assert row.ts_r == _ts("2024-01-01T11:00:00")


def test_asof_null_payload_with_tiebreak_atomic(spark):
    """Same atomicity under tiebreak: max-tiebreak row with a NULL field
    wins whole, never mixed with lower-tiebreak fields."""
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T12:00:00"))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01T11:00:00"), 10.0, "lo", 100),
            ("u1", _ts("2024-01-01T11:00:00"), None, "hi", 300),
        ],
        ["user_id", "ts", "value", "tag", "rid"],
    )
    row = asof.asof_join(left, right, tiebreak="rid").collect()[0]
    assert row.tag_r == "hi"
    assert row.value_r is None
