"""robots.txt parsing: raw robots bodies -> typed politeness rule rows.

The other half of the crawl-control plane: the engine's scheduler consumes
a rules frame (host, crawl_delay, allow[], deny[]) — schemas.ROBOTS_SCHEMA,
enforced by operators/politeness.robots_filter — and this module produces
that frame from fetched robots.txt text, so the politeness pipeline closes
end-to-end: fetch /robots.txt -> parse_robots -> robots_filter ->
schedule_batch. The reference crawler has no robots handling at all
(``main.py`` hits one API host); at 10^8 hosts the robots corpus is itself
a table, so the parser is a narrow no-Python column program over it, the
same design rule as the sitemap source.

Protocol subset (RFC 9309 / the original 1994 REP), parsed per document:

- the ``User-agent: <agent>`` group is located case-insensitively; rules
  are read from the FIRST group whose agent token matches (default
  ``*``). Documents with no matching group yield empty rules and the
  ``default_delay`` — "no robots restrictions", robots_filter's default.
- ``Allow:`` / ``Disallow:`` path prefixes are collected in document
  order (longest-match precedence is the CONSUMER's job —
  politeness._longest_match_len — so order here is informational).
  An EMPTY ``Disallow:`` value means "no restriction" per the protocol
  and is dropped, not kept as a deny-nothing rule.
- ``Crawl-delay: <n>`` takes the group's first integer value; malformed
  values degrade to NULL (try_cast — ANSI-safe, like the sitemap source).
- CRLF is normalized; a ``#`` starts a comment only where whitespace
  separates it from the value token (values are read as the first
  non-space run, which is how real-world robots values behave).

Simplification, documented: a group with CONSECUTIVE ``User-agent`` lines
("User-agent: a" / "User-agent: *" / rules) attaches its rules to the
last-listed agent only — splitting on the UA token leaves earlier agents
of the group with empty bodies. Full multi-agent group semantics need a
stateful line walk; for a ``*``-policy crawler the last-agent read is the
conservative common case and the deviation is test-pinned.

Scale shape: one scan, zero exchanges, zero Python — split/filter/
transform/regexp higher-order functions end to end (plan-pinned in
tests/test_robots_source.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _group_lines(txt: F.Column, agent: str) -> F.Column:
    """Lines of the first User-agent group matching ``agent`` (NULL when
    no group matches)."""
    secs = F.split(F.regexp_replace(txt, "\r", ""), "(?i)User-agent:")
    mine = F.filter(
        secs,
        lambda s: F.lower(F.trim(F.split(s, "\n").getItem(0)))
        == agent.lower(),
    )
    return F.split(F.get(mine, 0), "\n")


def _rule_values(lines: F.Column, tag: str) -> F.Column:
    vals = F.transform(
        lines,
        lambda l: F.regexp_extract(l, f"(?i)^\\s*{tag}:\\s*(\\S*)", 1),
    )
    return F.filter(vals, lambda v: v != "")


def parse_robots(
    df: DataFrame,
    txt_col: str = "robots_txt",
    agent: str = "*",
    default_delay: int = 1,
) -> DataFrame:
    """One ROBOTS_SCHEMA-shaped rule row per robots.txt document.

    Input must carry ``host`` and ``txt_col``. Output columns:
    ``(host, crawl_delay, allow, deny)`` — arrays in document order,
    ``crawl_delay`` = the matching group's first integer Crawl-delay or
    ``default_delay`` when absent/malformed (the scheduler's documented
    default), so the frame is directly consumable by
    operators/politeness.robots_filter + host_budget_col.
    """
    lines = _group_lines(F.col(txt_col), agent)
    delay = F.get(_rule_values(lines, "crawl-delay"), 0).try_cast("int")
    return df.select(
        "host",
        F.coalesce(delay, F.lit(default_delay)).alias("crawl_delay"),
        F.coalesce(
            _rule_values(lines, "allow"), F.array().cast("array<string>")
        ).alias("allow"),
        F.coalesce(
            _rule_values(lines, "disallow"), F.array().cast("array<string>")
        ).alias("deny"),
    )


# ---------------------------------------------------------------------------
# Single-process Python oracle for golden/property tests (the
# urls.py py_canonicalize pattern): same documented semantics, independent
# engine (Python re), so a Java-regex or group-splitting edge can't hide.
# ---------------------------------------------------------------------------

import re as _re


def py_parse_robots(
    txt: str, agent: str = "*", default_delay: int = 1
) -> dict:
    body = None
    for s in _re.split(r"(?i)User-agent:", txt.replace("\r", "")):
        if s.split("\n", 1)[0].strip().lower() == agent.lower():
            body = s
            break
    lines = (body or "").split("\n")

    def vals(tag: str) -> list[str]:
        out = []
        for line in lines:
            m = _re.match(rf"(?i)^\s*{tag}:\s*(\S*)", line)
            if m and m.group(1):
                out.append(m.group(1))
        return out

    delay = default_delay
    dv = vals("crawl-delay")
    if dv:
        try:
            delay = int(dv[0])
        except ValueError:
            delay = default_delay
    return {
        "crawl_delay": delay,
        "allow": vals("allow"),
        "deny": vals("disallow"),
    }
