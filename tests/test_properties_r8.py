"""Hypothesis property tests for the round-8 surface: the reworked
budget_select (driver-side bin stats, adaptive re-bin) against brute
force on adversarial score/token distributions, and RobotsPolicy against
an independent replay of the RFC 9309 decision rules on random rule
sets."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


# --- budget_select vs brute force -------------------------------------------


def _brute(rows, budget):
    """The documented greedy rule: sort by (score DESC, md5 tie, id),
    take the maximal prefix with cumulative tokens <= budget; NULL
    scores never selected."""
    scored = [r for r in rows if r["quality_score"] is not None]
    scored.sort(
        key=lambda r: (
            -r["quality_score"],
            hashlib.md5(f"budget:{r['doc_id']}".encode()).hexdigest(),
            r["doc_id"],
        )
    )
    kept, total = set(), 0
    for r in scored:
        if total + r["n_tokens"] > budget:
            break
        total += r["n_tokens"]
        kept.add(r["doc_id"])
    return kept


@st.composite
def budget_case(draw):
    n = draw(st.integers(1, 50))
    # few distinct scores + NULLs: drives mass into single bins (the
    # adaptive re-bin path) while continuous values hit the common path
    score_pool = draw(
        st.lists(
            st.one_of(st.none(), st.floats(0, 1, allow_nan=False, width=32)),
            min_size=1,
            max_size=6,
        )
    )
    rows = [
        {
            "doc_id": i,
            "quality_score": score_pool[
                draw(st.integers(0, len(score_pool) - 1))
            ],
            "n_tokens": draw(st.integers(0, 40)),
        }
        for i in range(n)
    ]
    budget = draw(st.integers(0, 600))
    n_bins = draw(st.sampled_from([2, 4, 16]))
    return rows, budget, n_bins


@settings(**SETTINGS)
@given(budget_case())
def test_budget_select_equals_bruteforce_hypothesis(spark, case):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.selection import (
        budget_select,
    )

    rows, budget, n_bins = case
    df = spark.createDataFrame(
        [(r["doc_id"], r["quality_score"], r["n_tokens"]) for r in rows],
        "doc_id long, quality_score double, n_tokens long",
    )
    got = {
        r["doc_id"]
        for r in budget_select(df, budget, n_bins=n_bins)
        .where(F.col("is_selected"))
        .collect()
    }
    assert got == _brute(rows, budget)


# --- RobotsPolicy vs an independent RFC 9309 replay --------------------------


def _ref_decide(rules, path):
    """Independent replay of 2.2.2: longest pattern (octets, excluding a
    trailing $) wins; Allow wins exact ties; no match -> allowed."""
    best = None
    for allow, pat in rules:
        anchored = pat.endswith("$")
        core = pat[:-1] if anchored else pat
        rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in core)
        if re.match(rx + ("$" if anchored else ""), path):
            key = (len(core), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


_pat = st.text(alphabet="/abp123*", min_size=1, max_size=8).map(
    lambda s: "/" + s.lstrip("/")
)
_path = st.text(alphabet="/abp123", min_size=1, max_size=10).map(
    lambda s: "/" + s.lstrip("/")
)


@settings(max_examples=120, deadline=None, derandomize=True)
@given(
    st.lists(
        st.tuples(st.booleans(), _pat, st.booleans()),  # (allow, pat, anchor)
        min_size=0,
        max_size=8,
    ),
    _path,
)
def test_robots_policy_matches_reference_decider(rule_specs, path):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    rules = [
        (allow, pat + ("$" if anchor and not pat.endswith("$") else ""))
        for allow, pat, anchor in rule_specs
    ]
    txt = "User-agent: mtdp-bot\n" + "".join(
        f"{'Allow' if allow else 'Disallow'}: {pat}\n" for allow, pat in rules
    )
    rp = RobotsPolicy(txt, "mtdp-bot")
    got = rp.allowed("https://h.example.com" + path)
    assert got == _ref_decide(rules, path), (rules, path)


@settings(max_examples=60, deadline=None, derandomize=True)
@given(
    # ours non-empty: a rule line CLOSES the user-agent run, so the
    # other agent's group is genuinely separate. (With zero own rules,
    # "User-agent: a\nUser-agent: b\nDisallow: x" is ONE group whose
    # rules legitimately bind both agents — RFC 9309 2.2.1; hypothesis
    # found exactly that case when min_size was 0.)
    st.lists(st.tuples(st.booleans(), _pat), min_size=1, max_size=5),
    st.lists(st.tuples(st.booleans(), _pat), min_size=1, max_size=5),
    _path,
)
def test_robots_other_agent_group_never_changes_decision(ours, theirs, path):
    """RFC 9309 2.2.1: rules in a group for an unrelated agent must be
    invisible to our agent's decisions."""
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.robots import (
        RobotsPolicy,
    )

    def txt(include_other):
        s = "User-agent: mtdp-bot\n" + "".join(
            f"{'Allow' if a else 'Disallow'}: {p}\n" for a, p in ours
        )
        if include_other:
            s += "User-agent: zzz-crawler\n" + "".join(
                f"{'Allow' if a else 'Disallow'}: {p}\n" for a, p in theirs
            )
        return s

    url = "https://h.example.com" + path
    assert (
        RobotsPolicy(txt(False), "mtdp-bot").allowed(url)
        == RobotsPolicy(txt(True), "mtdp-bot").allowed(url)
    )
