"""Interval-overlap (range) join as a binned equi-join.

Spark has no native range-join operator: a theta-join on the overlap
predicate alone plans as BroadcastNestedLoopJoin (O(|L|·|R|) work, and
only when one side fits in memory). The scalable pattern — the same
one other engines' range-join hints implement — adds an equi-join
prefix Catalyst CAN hash-partition on: bucket the time axis into
fixed-width bins, explode each interval into every bin it covers,
equi-join on the bin, then filter the exact half-open overlap
predicate ``l_start < r_end AND r_start < l_end``.

A pair overlapping across k shared bins would emit k duplicate rows;
instead of paying a ``distinct`` (a second full-output shuffle), each
pair is kept only in its FIRST overlapping bin —
``max(l_start, r_start) div bin_width`` — which both intervals
provably cover (it is the bin of the overlap region's first instant).
Duplicate-free by construction, zero extra shuffle.

At scale: the explode factor is ceil(interval_length / bin_width) + 1
rows per interval, so ``bin_width`` trades shuffle volume (small bins
= more replicas) against join fan-in (large bins = more non-matching
pairs to filter per bin). Pick it near the typical interval length.
Hot bins (many intervals alive at once) are ordinary join-key skew —
AQE skew-join splits them like any other hash join.

ref: the reference engine has no temporal joins (it is a text-query
engine); this operator is the task brief's range-join extension,
expressed Spark-first (no UDF, no driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
) -> DataFrame:
    """Inner-join rows whose half-open intervals [start, end) overlap.

    Start/end columns are integers on a shared axis (epoch micros for
    timestamps — integer ``div`` binning, never float division, which
    loses ULPs near 2^53 and misbins boundary instants). Column names
    must be disjoint between the two sides; empty or inverted
    intervals (end <= start) cannot overlap anything and are dropped.
    Output columns: all of ``left``'s then all of ``right``'s.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive (got {bin_width})")
    overlap_cols = set(left.columns) & set(right.columns)
    if overlap_cols:
        raise ValueError(
            f"left/right column names must be disjoint; both have "
            f"{sorted(overlap_cols)} — alias one side first"
        )
    if "__bin" in left.columns or "__bin" in right.columns:
        raise ValueError(
            "'__bin' is reserved by interval_overlap_join; rename it"
        )

    # identifiers go through F.expr — backtick-quote them so dotted /
    # spaced names parse as columns, and a name that collides with a
    # niladic SQL function (e.g. a column called current_date) cannot
    # silently resolve to the function instead
    def q(name: str) -> str:
        return "`" + name.replace("`", "``") + "`"

    def binned(df: DataFrame, start: str, end: str) -> DataFrame:
        # df[name] resolves the literal name (F.col would read '.' as
        # struct access)
        return df.filter(df[end] > df[start]).withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.expr(f"{q(start)} div {bin_width}"),
                    F.expr(f"({q(end)} - 1) div {bin_width}"),
                )
            ),
        )

    lb = binned(left, l_start, l_end)
    rb = binned(right, r_start, r_end)
    first_bin = F.expr(
        f"greatest({q(l_start)}, {q(r_start)}) div {bin_width}"
    )
    return (
        lb.join(rb, "__bin")
        .filter(
            (lb[l_start] < rb[r_end])
            & (rb[r_start] < lb[l_end])
            & (F.col("__bin") == first_bin)
        )
        .select(*[lb[c] for c in left.columns], *[rb[c] for c in right.columns])
    )
