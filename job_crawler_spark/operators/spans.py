"""Regex span extraction + redaction — the PII/contact scan every
training-data pipeline ships before text leaves the curation boundary
(emails, phone numbers, URLs extracted as typed span rows; the same kinds
redacted in place).

Output rows follow the span contract of the crawl parser (reference
``scraper.py`` span rows / ``crawl/parser.py:50``): one row per match,
``(id_cols..., kind, text, offset)``, 0-based character offsets,
deterministic for any input.

Spark-first: the whole scan is JVM expression work — ``regexp_extract_all``
for the matches and ``split`` on the same pattern for the BETWEEN-match
segments; the i-th match's offset is the running character length of the
gaps and matches before it (computed with ``slice``+``aggregate`` over the
two arrays). No UDF, no Python worker, narrow (shuffle-free) per-row
transform — the plan is a single projected scan + generate, which is the
shape that rides along a 100 TB corpus pass for free. Patterns must be
portable between Java regex and RE2 (character classes, bounded repeats,
alternation — no lookaround/backrefs) so the DuckDB oracle can run the
same scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Portable (Java regex == RE2) contact-PII patterns. Kept deliberately
# simple — the operator is the machinery; pattern packs are policy.
PII_KINDS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}",
    "url": r"https?://[A-Za-z0-9./_%-]+",
}


def regex_spans(
    df: DataFrame,
    text_col: str,
    id_cols: Sequence[str],
    kinds: Mapping[str, str] = PII_KINDS,
) -> DataFrame:
    """Extract every match of every ``kinds`` pattern from ``text_col`` as
    span rows ``(id_cols..., kind, text, offset)``.

    Offsets are 0-based character positions, exact for the i-th occurrence:
    with ``ms = regexp_extract_all(text, pat)`` and ``gs = split(text,
    pat)`` (n matches -> n+1 gaps, leading/internal empties preserved),
    ``offset(ms[i]) = sum(len(gs[0..i])) + sum(len(ms[0..i-1]))``. Matches
    of DIFFERENT kinds may overlap (each kind scans independently);
    matches of one kind never do (leftmost-greedy regex semantics, shared
    by Java regex and RE2).
    """
    ids = list(id_cols)
    parts = []
    for kind, pat in kinds.items():
        ms = F.regexp_extract_all(text_col, F.lit(pat), F.lit(0))
        gs = F.split(text_col, pat)
        base = df.select(
            *ids, ms.alias("__ms"), gs.alias("__gs")
        ).filter(F.size("__ms") > 0)
        exploded = base.select(
            *ids,
            "__ms",
            "__gs",
            F.posexplode("__ms").alias("__i", "text"),
        )
        clen = lambda col, n: F.aggregate(  # noqa: E731
            F.slice(col, 1, n), F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )
        parts.append(
            exploded.select(
                *ids,
                F.lit(kind).alias("kind"),
                "text",
                (
                    clen(F.col("__gs"), F.col("__i") + 1)
                    + clen(F.col("__ms"), F.col("__i"))
                ).alias("offset"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def redact_text(
    col: F.Column | str,
    kinds: Mapping[str, str] = PII_KINDS,
    token: str = "[{kind}]",
) -> F.Column:
    """Replace every match of every ``kinds`` pattern with a per-kind token
    (default ``[email]``/``[phone]``/``[url]``) — the redaction pass. Kind
    order matters when patterns overlap: earlier kinds win (their token no
    longer matches later patterns)."""
    out = F.col(col) if isinstance(col, str) else col
    for kind, pat in kinds.items():
        out = F.regexp_replace(out, pat, token.format(kind=kind))
    return out
