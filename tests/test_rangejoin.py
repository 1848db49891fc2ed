"""interval_overlap_join: binned range join vs brute-force ground truth."""

from __future__ import annotations

import pytest


def test_interval_overlap_join_semantics(spark):
    """Hand-built edges: multi-bin pairs appear exactly once (first-bin
    dedup), touching half-open intervals ([0,10) vs [10,20)) do NOT
    match, empty/inverted intervals are dropped, and bin-boundary
    instants land in the right bin (integer div, no float rounding)."""
    from entitymatch_spark.operators.rangejoin import interval_overlap_join

    L = spark.createDataFrame(
        [
            (1, 0, 100),    # spans 10 bins; overlaps rid 10, 13
            (2, 95, 105),   # straddles a bin boundary
            (3, 200, 210),
            (4, 50, 50),    # empty — dropped
            (5, 300, 250),  # inverted — dropped
            (6, 0, 10),     # touches rid 14 ([10, 20)) — no match
        ],
        "lid int, ls long, le long",
    )
    R = spark.createDataFrame(
        [
            (10, 90, 96),
            (11, 100, 150),
            (12, 205, 206),
            (13, 0, 1000),  # covers everything — shares many bins
            (14, 10, 20),
        ],
        "rid int, rs long, re long",
    )
    rows = interval_overlap_join(L, R, "ls", "le", "rs", "re", 10).collect()
    got = sorted((r["lid"], r["rid"]) for r in rows)
    want = sorted(
        (l[0], r[0])
        for l in [(1, 0, 100), (2, 95, 105), (3, 200, 210), (6, 0, 10)]
        for r in [(10, 90, 96), (11, 100, 150), (12, 205, 206),
                  (13, 0, 1000), (14, 10, 20)]
        if l[1] < r[2] and r[1] < l[2]
    )
    assert got == want
    assert len(got) == len(set(got))  # duplicate-free without distinct
    assert (6, 14) not in got         # half-open: touching != overlap

    with pytest.raises(ValueError, match="bin_width must be positive"):
        interval_overlap_join(L, R, "ls", "le", "rs", "re", 0)
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(L, L, "ls", "le", "ls", "le", 10)


def test_reserved_and_awkward_column_names(spark):
    """__bin is reserved (raises instead of silently corrupting a user
    column of that name), and names that need backtick quoting — or
    that collide with a niladic SQL function like current_date — still
    resolve as columns, not as function calls."""
    from entitymatch_spark.operators.rangejoin import interval_overlap_join

    L = spark.createDataFrame(
        [(1, 0, 100)], "lid int, `s start` long, `current_date` long"
    )
    R = spark.createDataFrame([(10, 50, 60)], "rid int, rs long, re long")
    rows = interval_overlap_join(
        L, R, "s start", "current_date", "rs", "re", 10
    ).collect()
    assert [(r["lid"], r["rid"]) for r in rows] == [(1, 10)]
    assert rows[0]["s start"] == 0 and rows[0]["current_date"] == 100

    bad = L.withColumnRenamed("lid", "__bin")
    with pytest.raises(ValueError, match="__bin.*reserved"):
        interval_overlap_join(bad, R, "s start", "current_date", "rs", "re", 10)
    with pytest.raises(ValueError, match="reserved"):
        interval_overlap_join(
            R, bad, "rs", "re", "s start", "current_date", 10
        )


def test_interval_overlap_join_matches_brute_force(spark):
    """One-job fuzz: seeded random intervals (lengths from sub-bin to
    many-bin, starts across a wide axis) through the binned join vs a
    driver-side brute-force O(n^2) overlap scan. Catches off-by-one in
    the end-exclusive bin range, first-bin dedup misses, and boundary
    misbinning — across a bin width that divides nothing evenly."""
    import random

    from entitymatch_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(99)
    W = 37  # deliberately awkward bin width
    Lr = []
    for i in range(120):
        s = rng.randrange(0, 2000)
        Lr.append((i, s, s + rng.randrange(1, 200)))
    Rr = []
    for j in range(120):
        s = rng.randrange(0, 2000)
        Rr.append((j, s, s + rng.choice([1, 5, 36, 37, 38, 150])))

    L = spark.createDataFrame(Lr, "lid int, ls long, le long")
    R = spark.createDataFrame(Rr, "rid int, rs long, re long")
    rows = interval_overlap_join(L, R, "ls", "le", "rs", "re", W).collect()
    got = sorted((r["lid"], r["rid"]) for r in rows)
    want = sorted(
        (l[0], r[0])
        for l in Lr
        for r in Rr
        if l[1] < r[2] and r[1] < l[2]
    )
    assert got == want
    assert len(got) == len(set(got))
    assert len(want) > 500  # the fuzz exercised real overlap density

def test_interval_overlap_join_negative_axis(spark):
    """Axis values below zero: Spark's `div` truncates toward zero
    rather than flooring, which reshapes bin 0 to (-w, w) — still a
    monotonic step function of the axis, so overlapping intervals
    still share the bin of their overlap start and the first-bin dedup
    still fires exactly once. Locked in with a brute-force compare on
    a seeded corpus straddling zero."""
    import random

    from entitymatch_spark.operators.rangejoin import interval_overlap_join

    rng = random.Random(7)
    W = 13
    Lr, Rr = [], []
    for i in range(80):
        s = rng.randrange(-500, 500)
        Lr.append((i, s, s + rng.randrange(1, 60)))
        s = rng.randrange(-500, 500)
        Rr.append((i, s, s + rng.choice([1, 12, 13, 14, 50])))
    L = spark.createDataFrame(Lr, "lid int, ls long, le long")
    R = spark.createDataFrame(Rr, "rid int, rs long, re long")
    rows = interval_overlap_join(L, R, "ls", "le", "rs", "re", W).collect()
    got = sorted((r["lid"], r["rid"]) for r in rows)
    want = sorted(
        (l[0], r[0]) for l in Lr for r in Rr if l[1] < r[2] and r[1] < l[2]
    )
    assert got == want
    assert len(got) == len(set(got))
    assert len(want) > 100
