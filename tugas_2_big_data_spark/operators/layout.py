"""Data-layout operators: Z-order (Morton) clustering audit.

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan optimization is FILE SKIPPING: parquet footers carry
per-file min/max, so a predicate prunes every file whose range
excludes it — but only if the write LAYOUT made those ranges tight.
Sorting by one column makes that column's ranges tight and every other
column's ranges full-width; interleaving the bits of two columns into
a Morton (Z-order) code and range-partitioning on the code bounds BOTH
columns per file (each bucket is a quadrant-ish region of the 2-D key
space). This module computes the code and audits the trade, the
decision behind `OPTIMIZE ... ZORDER BY` in lakehouse engines.

Scale shape: the code is a map-only bit expression (whole-stage
codegen); bucketing is equal-width on the code against a one-row
global extent aggregate that broadcasts — no global sort, no window,
no single-partition Exchange anywhere. The production WRITE path is
`df.repartitionByRange(n, morton).write...`; the audit here uses the
deterministic equal-width form so the DuckDB oracle can replay the
bucket assignment bit-for-bit (range partitioning samples and is not
value-reproducible).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MORTON_BITS = 21  # 2*21 = 42 interleaved bits — fits a BIGINT


def morton_code(x: Column, y: Column, bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: x occupies even bit positions, y odd. Adjacent codes are
    adjacent in BOTH dimensions, which is the whole point — a
    contiguous code range is a bounded 2-D region."""
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
        )
        terms.append(
            F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return reduce(lambda a, b: a + b, terms).cast("long")


def morton_sql(x: str, y: str, bits: int = MORTON_BITS) -> str:
    """The identical interleave as SQL text, for the DuckDB oracle."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((({y}) >> {i}) & 1) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def equal_width_bucket(col: Column, lo: Column, hi: Column, n: int) -> Column:
    """Deterministic equal-width bucket id in [0, n): floor of the
    rescaled position. Exact in float64 for values below 2^53/n, which
    a 42-bit Morton code with n <= 2048 satisfies."""
    return F.floor(
        (col - lo).cast("double") * float(n) / ((hi - lo + 1).cast("double"))
    ).cast("long")


def layout_audit(
    pts: DataFrame, n_buckets: int = 64, bits: int = MORTON_BITS
) -> DataFrame:
    """Compare the Z-order layout against a linear (sort-by-x) layout
    on the same points. ``pts`` must have integer columns (x, y) in
    [0, 2^bits).

    For each layout: bucket the rows, take per-bucket [min,max] of
    both dimensions (exactly what a parquet footer would carry), and
    report (a) the average per-bucket span of each dimension as a
    fraction of its domain — tight spans = skippable files — and (b)
    how many buckets a mid-domain point predicate on x alone / y alone
    would have to scan. Linear wins x slightly, serves y not at all
    (every bucket spans the full y domain); Z-order bounds both.

    Plan: one extent aggregate (one row, broadcast back), one
    union-of-two-projections over the points, one (layout, bucket)
    aggregate, one |2·n_buckets|-row final aggregate. No windows."""
    z = morton_code(F.col("x"), F.col("y"), bits)
    m = pts.select("x", "y", z.alias("z"))
    ext = m.agg(
        F.min("x").alias("minx"), F.max("x").alias("maxx"),
        F.min("y").alias("miny"), F.max("y").alias("maxy"),
        F.min("z").alias("minz"), F.max("z").alias("maxz"),
    )
    with_ext = m.crossJoin(F.broadcast(ext))
    zb = with_ext.select(
        F.lit("zorder").alias("layout"),
        equal_width_bucket(
            F.col("z"), F.col("minz"), F.col("maxz"), n_buckets
        ).alias("bucket"),
        "x", "y",
    )
    lb = with_ext.select(
        F.lit("linear").alias("layout"),
        equal_width_bucket(
            F.col("x"), F.col("minx"), F.col("maxx"), n_buckets
        ).alias("bucket"),
        "x", "y",
    )
    stats = (
        zb.unionByName(lb)
        .groupBy("layout", "bucket")
        .agg(
            F.min("x").alias("bminx"), F.max("x").alias("bmaxx"),
            F.min("y").alias("bminy"), F.max("y").alias("bmaxy"),
        )
    )
    probed = stats.crossJoin(F.broadcast(ext)).select(
        "layout", "bminx", "bmaxx", "bminy", "bmaxy",
        "minx", "maxx", "miny", "maxy",
        F.floor((F.col("minx") + F.col("maxx")) / 2).alias("x0"),
        F.floor((F.col("miny") + F.col("maxy")) / 2).alias("y0"),
    )
    xspan = (F.col("bmaxx") - F.col("bminx") + 1).cast("double") / (
        F.col("maxx") - F.col("minx") + 1
    ).cast("double")
    yspan = (F.col("bmaxy") - F.col("bminy") + 1).cast("double") / (
        F.col("maxy") - F.col("miny") + 1
    ).cast("double")
    xhit = F.col("x0").between(F.col("bminx"), F.col("bmaxx"))
    yhit = F.col("y0").between(F.col("bminy"), F.col("bmaxy"))
    return probed.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.round(F.avg(xspan), 6).alias("avg_x_span_frac"),
        F.round(F.avg(yspan), 6).alias("avg_y_span_frac"),
        F.sum(xhit.cast("long")).cast("long").alias("x_probe_buckets"),
        F.sum(yhit.cast("long")).cast("long").alias("y_probe_buckets"),
    )
