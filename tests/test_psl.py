"""Public-suffix classification (operators/psl.py): goldens per rule
type (plain, multi-label, wildcard, exception, default), parity vs the
pure-Python replica over a hostile host battery, dedup/normalization
contract, and the plan pin (rules are broadcast; no Python in the
plan). The sf-fixture oracle parity runs in test_oracle_parity.py via
the ``registrable_domains`` gate."""

from __future__ import annotations

from job_crawler_spark.operators.psl import (
    DEFAULT_RULES,
    py_registrable,
    registrable_domains,
    rules_frame,
)


def _classify(spark, hosts):
    df = registrable_domains(
        spark.createDataFrame([(h,) for h in hosts], "host string")
    )
    return {
        r["host"]: (r["matched_rule"], r["public_suffix"], r["registrable_domain"])
        for r in df.collect()
    }


def test_goldens_every_rule_type(spark):
    got = _classify(
        spark,
        [
            "jobs.acme.co.uk",      # multi-label rule beats 'uk'
            "acme.github.io",       # private-style suffix beats 'io'
            "a.b.github.io",        # eTLD+1 keeps only one extra label
            "x.y7.bar.ck",          # wildcard *.ck -> suffix bar.ck
            "bar.ck",               # host IS a wildcard public suffix
            "www.ck",               # exception rule overrides *.ck
            "internal3.test",       # no rule: implicit default '*'
            "com",                  # host is itself a plain suffix
            "lab7.sushi.ac.jp",     # 2-label rule beats 'jp'
        ],
    )
    assert got["jobs.acme.co.uk"] == ("co.uk", "co.uk", "acme.co.uk")
    assert got["acme.github.io"] == ("github.io", "github.io", "acme.github.io")
    assert got["a.b.github.io"] == ("github.io", "github.io", "b.github.io")
    assert got["x.y7.bar.ck"] == ("*.ck", "bar.ck", "y7.bar.ck")
    assert got["bar.ck"] == ("*.ck", "bar.ck", None)
    assert got["www.ck"] == ("!www.ck", "ck", "www.ck")
    assert got["internal3.test"] == (None, "test", "internal3.test")
    assert got["com"] == ("com", "com", None)
    assert got["lab7.sushi.ac.jp"] == ("ac.jp", "ac.jp", "sushi.ac.jp")


def test_matches_python_replica_battery(spark):
    """Every combination of 1-4 leading labels over every rule tail —
    wildcard depth, exception shadowing, unknown TLDs, single labels."""
    tails = ["com", "co.uk", "uk", "github.io", "io", "ck", "bar.ck",
             "www.ck", "ac.jp", "jp", "test", "x"]
    hosts = list(tails)
    for tail in tails:
        for depth in (1, 2, 3):
            hosts.append(".".join([f"l{i}" for i in range(depth)] + [tail]))
    got = _classify(spark, hosts)
    for h in hosts:
        assert got[h] == py_registrable(h), h


def test_dedup_and_case_normalization(spark):
    got = _classify(spark, ["JOBS.Acme.CO.UK", "jobs.acme.co.uk"])
    assert list(got) == ["jobs.acme.co.uk"]
    assert got["jobs.acme.co.uk"] == ("co.uk", "co.uk", "acme.co.uk")


def test_null_and_empty_hosts_dropped(spark):
    df = registrable_domains(
        spark.createDataFrame([("a.com",), (None,), ("",)], "host string")
    )
    assert [r["host"] for r in df.collect()] == ["a.com"]


def test_custom_rules_frame(spark):
    rules = rules_frame(spark, ["dev", "*.internal", "!ok.internal"])
    df = registrable_domains(
        spark.createDataFrame(
            [("a.b.dev",), ("x.svc.internal",), ("y.ok.internal",)],
            "host string",
        ),
        rules,
    )
    got = {r["host"]: (r["public_suffix"], r["registrable_domain"]) for r in df.collect()}
    assert got["a.b.dev"] == ("dev", "b.dev")
    assert got["x.svc.internal"] == ("svc.internal", "x.svc.internal")
    assert got["y.ok.internal"] == ("internal", "ok.internal")


def test_replica_matches_published_semantics():
    # spot checks straight from the publicsuffix.org algorithm notes
    assert py_registrable("foo.com") == ("com", "com", "foo.com")
    assert py_registrable("test.ck")[1:] == ("test.ck", None)
    assert py_registrable("b.test.ck")[1:] == ("test.ck", "b.test.ck")
    assert py_registrable("www.ck")[1:] == ("ck", "www.ck")


def test_rules_broadcast_and_no_python(spark):
    df = registrable_domains(
        spark.createDataFrame([("a.co.uk",), ("b.github.io",)], "host string")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan
    # rule matching must not sort-merge: the rules side is tiny by contract
    head = plan.split("BroadcastHashJoin")[0]
    assert DEFAULT_RULES  # imported constant is the gate's rule set
