"""Public-suffix longest-match classification: registrable domains.

Per-host politeness is the wrong granularity for a real crawler:
``jobs.acme.co.uk`` and ``www.acme.co.uk`` are the same site operator
and must share one crawl budget, while ``acme.github.io`` and
``other.github.io`` are DIFFERENT operators despite sharing a suffix.
The public answer is the Mozilla Public Suffix List algorithm
(publicsuffix.org/list/): match the host against a rule set where

- a plain rule (``co.uk``) matches its exact label suffix,
- a wildcard rule (``*.ck``) matches any suffix with the leftmost of
  its labels arbitrary,
- an exception rule (``!www.ck``) overrides wildcards and names a host
  whose public suffix is the rule MINUS its leftmost label,
- among matches, exceptions win, then the rule with the MOST labels,
- no match falls back to the implicit default rule ``*`` (the TLD),

and the *registrable domain* (eTLD+1) is the public suffix plus one
more label — NULL when the host IS a public suffix. The reference
crawler never needs this (single job boards, hand-listed hosts,
reference main.py); a 10^10-URL frontier spanning the open web does —
its politeness keys, seen-filter shards, and mirror detection should
group by registrable domain, not raw host.

Scale shape: hosts explode into their label suffixes — bounded by
label count (<= ~6 for real hosts), NOT corpus size — each suffix
emitting an exact and (when >= 2 labels) a wildcardized lookup form;
the rule table (thousands of rows for the real PSL) is BROADCAST, so
rule matching is a broadcast hash equi-join with zero shuffle of the
host frame; the single hash exchange is the per-host best-match
window, and everything stays JVM-side (no Python, plan-pinned in
tests/test_psl.py). The rule set is a parameter — callers ship the
real PSL as a small DataFrame; tests and the gate use a deterministic
subset exercising every rule type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Deterministic rule subset for tests/gates: every PSL rule type
# (plain TLD, 2-label, 3-label, wildcard, exception, private-style
# suffix). Semantics are the published algorithm; the list itself is
# synthetic-friendly (covers the fixtures' *.example.com hosts via
# 'com').
DEFAULT_RULES: tuple[str, ...] = (
    "com",
    "org",
    "net",
    "io",
    "jp",
    "ac.jp",
    "uk",
    "co.uk",
    "org.uk",
    "github.io",
    "*.ck",
    "!www.ck",
)


def rules_frame(spark, rules=DEFAULT_RULES) -> DataFrame:
    """Rule strings -> (rule, key, is_exception). Exception rules are
    keyed WITHOUT the '!' so they equi-join against exact suffix
    forms; wildcard rules keep their '*.' prefix and join against the
    wildcardized forms."""
    rows = []
    for r in rules:
        exc = r.startswith("!")
        rows.append((r, r[1:] if exc else r, exc))
    return spark.createDataFrame(rows, "rule string, key string, is_exception boolean")


def registrable_domains(
    hosts: DataFrame, rules: DataFrame | None = None, *, host: str = "host"
) -> DataFrame:
    """One row per DISTINCT host: (host, matched_rule, public_suffix,
    registrable_domain). ``matched_rule`` is NULL when only the
    implicit default rule ``*`` applied; ``registrable_domain`` is
    NULL when the host is itself a public suffix."""
    spark = hosts.sparkSession
    if rules is None:
        rules = rules_frame(spark)

    base = (
        hosts.select(F.lower(F.col(host)).alias("host"))
        .where(F.col("host").isNotNull() & (F.col("host") != ""))
        .distinct()
        .select(
            "host",
            F.split(F.col("host"), "\\.").alias("labels"),
            F.size(F.split(F.col("host"), "\\.")).alias("n"),
        )
    )

    # Bounded explode: one row per label-suffix (k = suffix label
    # count). slice() is 1-based; suffix k starts at label n-k+1.
    cand = base.select(
        "host",
        "n",
        "labels",
        F.explode(F.expr("sequence(1, n)")).alias("k"),
    ).select(
        "host",
        "n",
        "k",
        F.array_join(
            F.slice(F.col("labels"), F.col("n") - F.col("k") + 1, F.col("k")), "."
        ).alias("suffix"),
        F.when(
            F.col("k") >= 2,
            F.array_join(
                F.slice(F.col("labels"), F.col("n") - F.col("k") + 2, F.col("k") - 1),
                ".",
            ),
        ).alias("tail"),  # suffix minus its leftmost label
    )
    exact = cand.select(
        "host", "k", "suffix", "tail", F.col("suffix").alias("form"),
        F.lit(False).alias("is_wild"),
    )
    wild = cand.where(F.col("tail").isNotNull()).select(
        "host", "k", "suffix", "tail",
        F.concat(F.lit("*."), F.col("tail")).alias("form"),
        F.lit(True).alias("is_wild"),
    )
    # Exception rules only match literal suffixes, never wildcardized
    # forms; wildcard rule keys start with '*.' so they can only meet
    # wild forms — no extra filter needed for them.
    matches = (
        exact.unionByName(wild)
        .join(F.broadcast(rules), F.col("form") == F.col("key"))
        .where(~(F.col("is_exception") & F.col("is_wild")))
    )

    best = Window.partitionBy("host").orderBy(
        F.col("is_exception").desc(), F.col("k").desc(), F.col("rule")
    )
    winner = (
        matches.withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .select(
            "host",
            F.col("rule").alias("matched_rule"),
            F.when(F.col("is_exception"), F.col("tail"))
            .otherwise(F.col("suffix"))
            .alias("_ps"),
            F.when(F.col("is_exception"), F.col("k") - 1)
            .otherwise(F.col("k"))
            .alias("_psn"),
        )
    )

    out = base.join(winner, "host", "left")
    psn = F.coalesce(F.col("_psn"), F.lit(1))  # default rule '*': the TLD
    return out.select(
        "host",
        "matched_rule",
        F.coalesce(F.col("_ps"), F.element_at(F.col("labels"), -1)).alias(
            "public_suffix"
        ),
        F.when(
            F.col("n") > psn,
            F.array_join(F.slice(F.col("labels"), F.col("n") - psn, psn + 1), "."),
        ).alias("registrable_domain"),
    )


def py_registrable(hostname: str, rules=DEFAULT_RULES):
    """Pure-Python replica of the published algorithm for tests.
    Returns (matched_rule, public_suffix, registrable_domain)."""
    labels = hostname.lower().split(".")
    n = len(labels)

    def rule_matches(rule: str) -> bool:
        rl = rule.lstrip("!").split(".")
        if len(rl) > n:
            return False
        for r, l in zip(reversed(rl), reversed(labels)):
            if r != "*" and r != l:
                return False
        return True

    hits = [r for r in rules if rule_matches(r)]
    exceptions = [r for r in hits if r.startswith("!")]
    # tie-break mirrors the engine: exceptions first, most labels,
    # then lexicographically smallest rule (ties only affect which
    # rule is REPORTED — the matched suffix text is identical)
    if exceptions:
        rule = min(exceptions, key=lambda r: (-len(r.split(".")), r))
        ps_labels = rule[1:].split(".")[1:]
    elif hits:
        rule = min(hits, key=lambda r: (-len(r.split(".")), r))
        ps_labels = labels[n - len(rule.split(".")) :]
    else:
        rule = None
        ps_labels = labels[-1:]
    k = len(ps_labels)
    ps = ".".join(labels[n - k :])
    reg = ".".join(labels[n - k - 1 :]) if n > k else None
    return rule, ps, reg
