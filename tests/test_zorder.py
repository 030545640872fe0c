"""Z-order clustering expressions (operators/zorder.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cumulus_etl_spark.operators.zorder import interleave_bits, zorder_key


def test_interleave_known_bits(spark):
    """bit i of column j lands at position i*n + j."""
    df = spark.createDataFrame([(0b1010, 0b0101)], "x long, y long")
    out = df.select(
        interleave_bits([F.col("x"), F.col("y")]).alias("z")
    ).collect()[0]["z"]
    # x bits {1,3} → positions {2,6}; y bits {0,2} → positions {1,5}
    assert out == (1 << 2) | (1 << 6) | (1 << 1) | (1 << 5)


def test_interleave_single_column_is_identity(spark):
    df = spark.createDataFrame([(12345,)], "x long")
    assert df.select(interleave_bits([F.col("x")]).alias("z")).collect()[0]["z"] == 12345


def test_zorder_key_orders_like_morton_curve(spark):
    """Quadrant test: all four corners of a 2D grid must sort in Morton
    order (low-low, high-low, low-high, high-high)."""
    rows = [(0, 0, "ll"), (100, 0, "hl"), (0, 100, "lh"), (100, 100, "hh")]
    df = spark.createDataFrame(rows, "a long, b long, tag string")
    z = zorder_key(df, ["a", "b"])
    ordered = [r["tag"] for r in df.select("tag", z.alias("z")).orderBy("z").collect()]
    assert ordered == ["ll", "hl", "lh", "hh"]


def test_zorder_constant_column_degrades_gracefully(spark):
    """max == min must not divide by zero; the constant column simply
    contributes zero bits."""
    df = spark.createDataFrame([(i, 7) for i in range(8)], "a long, b long")
    z = df.select(zorder_key(df, ["a", "b"]).alias("z")).collect()
    assert len({r["z"] for r in z}) == 8  # still fully ordered by a


def test_zorder_bounds_extents_on_both_columns(spark):
    """The point of Z-order: chunking the sorted data into files bounds
    the min/max extent of EVERY clustered column, where a lexicographic
    sort bounds only the leading one."""
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")

    def avg_b_extent(ordered_rows, files=16):
        per_file = len(ordered_rows) // files
        extents = []
        for i in range(files):
            chunk = ordered_rows[i * per_file : (i + 1) * per_file]
            bs = [r["b"] for r in chunk]
            extents.append(max(bs) - min(bs))
        return sum(extents) / files

    z_sorted = df.select("a", "b", zorder_key(df, ["a", "b"]).alias("z")).orderBy("z").collect()
    a_sorted = df.orderBy("a", "b").collect()
    # lexicographic by a: every file spans the full b range (31)
    assert avg_b_extent(a_sorted) > 25
    # z-order: files cover compact tiles — b extent collapses
    assert avg_b_extent(z_sorted) < 12


def test_interleave_monotonic_per_axis(spark):
    """With the other coordinates fixed, a larger cell value must give a
    strictly larger Morton key — the invariant that makes file min/max
    ranges meaningful per clustered column."""
    import random

    from cumulus_etl_spark.operators.zorder import interleave_bits

    rng = random.Random(11)
    rows = []
    for _ in range(300):
        b = rng.randrange(0, 1 << 16)
        a1 = rng.randrange(0, (1 << 16) - 1)
        a2 = rng.randrange(a1 + 1, 1 << 16)
        rows.append((a1, a2, b))
    df = spark.createDataFrame(rows, "a1 long, a2 long, b long")
    bad = df.select(
        (
            interleave_bits([F.col("a1"), F.col("b")])
            < interleave_bits([F.col("a2"), F.col("b")])
        ).alias("mono_first"),
        (
            interleave_bits([F.col("b"), F.col("a1")])
            < interleave_bits([F.col("b"), F.col("a2")])
        ).alias("mono_second"),
    ).filter(~F.col("mono_first") | ~F.col("mono_second")).count()
    assert bad == 0


def test_zorder_rewrite_preserves_rows_and_clusters_files(spark, tmp_path):
    """The OPTIMIZE-ZORDER rewrite: row multiset unchanged, and every
    output file owns a NARROW range of BOTH clustered columns (the
    property parquet footer min/max pruning feeds on), unlike the
    scattered input layout."""
    import json

    from pyspark.sql import functions as F

    from cumulus_etl_spark.operators.zorder import zorder_rewrite

    n = 4096
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 1000).alias("x"),   # scattered
        (F.col("id") * 40503 % 1000).alias("y"),
    )
    src = str(tmp_path / "src")
    df.repartition(8).write.parquet(src)
    out = str(tmp_path / "zo")
    zorder_rewrite(spark.read.parquet(src), ["x", "y"], num_files=8).write.parquet(out)

    zo = spark.read.parquet(out)
    assert zo.count() == n
    assert (
        zo.agg(F.sum("x"), F.sum("y")).collect()[0]
        == df.agg(F.sum("x"), F.sum("y")).collect()[0]
    )

    def mean_file_span(path, col):
        per = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg((F.max(col) - F.min(col)).alias("span"))
            .collect()
        )
        return sum(r["span"] for r in per) / len(per)

    # clustered files each cover a fraction of the global [0,1000) span
    # on BOTH dimensions; the hash-scattered input covers ~all of it
    for col in ("x", "y"):
        assert mean_file_span(out, col) < 0.62 * mean_file_span(src, col), col

    # CLI e2e
    from cumulus_etl_spark.cli import main

    out2 = str(tmp_path / "zo2")
    assert main(["zorder", src, out2, "--by", "x,y", "--files", "8"]) == 0
    import pytest

    with pytest.raises(SystemExit):
        main(["zorder", src, str(tmp_path / "zo3"), "--by", "nope"])
