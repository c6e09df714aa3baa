"""As-of (point-in-time) join — the temporal operator Spark's DataFrame
API lacks as a built-in.

For each LEFT row, find the single RIGHT row with the greatest
``right_ts <= left_ts`` (direction="backward", inclusive — the
last-touch-attribution / latest-quote-before-trade semantics; DuckDB's
``ASOF JOIN`` default) within the same key group, or the smallest
``right_ts >= left_ts`` (direction="forward").

The naive formulation is a range join (``l.key = r.key AND r.ts <= l.ts``
+ a per-row max), which Spark executes as an equi-join with an inequality
residual — O(|l| x |r|) comparisons per key group and a combinatorial
intermediate before the per-row argmax collapses it. This implementation
is JOIN-FREE, the merge-sorted-streams shape kdb/DuckDB use internally,
expressed in one window pass:

1. union-tag: right rows carry their payload in a struct column plus a
   tiebreak sort column; left rows carry NULLs for both;
2. ONE window over ``partitionBy(keys).orderBy(ts, side, tiebreak)`` with
   ``last(payload, ignoreNulls=True)`` and a ROWS
   unboundedPreceding..currentRow frame: for every left row, the most
   recent right payload at-or-before it in the merged order. Right rows
   sort before left rows at equal ts (side 0 < 1), making the match
   INCLUSIVE; right-side duplicates at the same (key, ts) sort by the
   tiebreak ascending, so ``last`` deterministically sees the greatest
   tiebreak most recently — duplicate resolution costs zero extra
   machinery (a pre-aggregation would add a second, differently-keyed
   shuffle);
3. filter back to left rows and unpack the matched struct.

Cost: exactly ONE hash shuffle on the join keys (the same shuffle any
keyed join pays) + a per-partition sort — no range-join blowup, no
per-key collect_list, memory O(1) per row beyond the sort.

Forward direction reuses the same machinery on negated ordering: sort ts
descending (right still before left at equal ts) and the last-seen
payload is the nearest at-or-after row.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS = "__asof_ts"
_SIDE = "__asof_side"
_PAY = "__asof_payload"
_TIE = "__asof_tie"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    *,
    direction: str = "backward",
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join ``left`` to ``right`` on equality keys ``on`` and the
    temporal inequality ``right_ts <= left_ts`` (backward, inclusive) or
    ``right_ts >= left_ts`` (forward, inclusive).

    Returns every ``left`` row with ``right_cols`` appended (suffixed when
    the name collides with a left column), NULL where no right row
    qualifies. ``tiebreak``: right column deciding among right rows sharing
    (on, right_ts) — the greatest value wins; defaults to the first of
    ``right_cols``. Deterministic for any input.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    on = list(on)
    right_cols = list(right_cols)
    tiebreak = tiebreak or right_cols[0]

    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    pay = F.struct(*[F.col(c).alias(c) for c in right_cols])
    # A NULL right_ts can never satisfy right_ts <= left_ts (or >=): drop
    # those rows up front, otherwise default nulls-first ascending ordering
    # would sort them to the partition head and `last(ignorenulls)` would
    # carry their payload into left rows that have no true match.
    r_side = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.col(tiebreak).alias(_TIE),
        pay.alias(_PAY),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on],
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias(_TIE),
        F.lit(None).cast(r_side.schema[_PAY].dataType).alias(_PAY),
        *[c for c in left.columns if c not in on],
    )
    merged = r_side.unionByName(l_side)

    # backward: ascending merge; right rows precede left rows at equal ts
    # (side 0 < 1) -> inclusive <=; duplicate right rows at equal ts sort
    # tiebreak-ascending so `last` sees the greatest one most recently.
    # forward: ts descending with the SAME side/tie order -> the last-seen
    # right row at-or-after the left row is the nearest one, inclusive >=.
    # Explicit nulls-FIRST in both directions: a left row with NULL ts
    # sorts before every (non-null-ts) right row, sees no prior payload,
    # and matches NULL — identical semantics backward and forward.
    ts_ord = (
        F.col(_TS).asc_nulls_first()
        if direction == "backward"
        else F.col(_TS).desc_nulls_first()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_ord, F.col(_SIDE).asc(), F.col(_TIE).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_PAY, ignorenulls=True).over(w)

    return (
        merged.withColumn(_PAY, matched)
        .filter(F.col(_SIDE) == 1)
        .select(
            *on,
            *[c for c in left.columns if c not in on],
            *[
                F.col(_PAY)[c].alias(out_names[c])
                for c in right_cols
            ],
        )
    )
