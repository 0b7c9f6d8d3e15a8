"""RouterClient strategies (llm/router.py — L8) and deployment
distribution (A7). Strategy logic is plain Python, so most tests need no
Spark; one end-to-end test drives the router through the full pipeline.
"""

from __future__ import annotations

import sys
from decimal import Decimal

import pytest
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from ondine_spark.llm.client import LLMResult, TransientLLMError
from ondine_spark.llm.router import (
    Deployment,
    RouterClient,
    _md5_60bit,
    deployment_distribution,
)


class FakeClient:
    def __init__(self, label, latency_ms=0.0, fail=False):
        self.label = label
        self.model = label
        self.latency_ms = latency_ms
        self.fail = fail
        self.calls = 0

    def complete(self, prompt, system=None):
        self.calls += 1
        if self.fail:
            raise TransientLLMError("throttled")
        if self.latency_ms:
            import time

            time.sleep(self.latency_ms / 1000.0)
        return LLMResult(
            text=f"from-{self.label}", tokens_in=len(prompt.split()),
            tokens_out=1, model=self.label, cost=Decimal("0"),
        )


def _deps(n=3):
    clients = [FakeClient(f"dep{i}") for i in range(n)]
    deps = [
        Deployment(label=c.label, factory=(lambda c=c: c)) for c in clients
    ]
    return clients, deps


def test_round_robin_even_split():
    clients, deps = _deps(3)
    r = RouterClient(deps, "round-robin")
    for i in range(30):
        res = r.complete(f"p{i}")
        assert res.model == f"dep{i % 3}"
    assert r.distribution() == {"dep0": 10, "dep1": 10, "dep2": 10}


def test_prompt_hash_deterministic_and_md5_contract():
    clients, deps = _deps(3)
    r1 = RouterClient(deps, "prompt-hash")
    r2 = RouterClient([Deployment(f"dep{i}", (lambda i=i: FakeClient(f"dep{i}"))) for i in range(3)], "prompt-hash")
    for i in range(20):
        p = f"prompt number {i}"
        assert r1.complete(p).model == r2.complete(p).model
        assert r1.complete(p).model == f"dep{_md5_60bit(p) % 3}"


def test_failover_skips_throttled_deployment():
    clients, deps = _deps(3)
    clients[0].fail = True
    r = RouterClient(deps, "round-robin")
    out = [r.complete(f"p{i}").model for i in range(12)]
    assert "dep0" not in out
    assert clients[0].calls == 4  # tried every 3rd call, failed over
    dist = r.distribution()
    assert dist["dep0"] == 0 and dist["dep1"] + dist["dep2"] == 12


def test_all_throttled_raises_transient():
    clients, deps = _deps(2)
    for c in clients:
        c.fail = True
    r = RouterClient(deps, "round-robin")
    with pytest.raises(TransientLLMError):
        r.complete("p")


def test_latency_based_prefers_fast_deployment():
    clients, deps = _deps(3)
    clients[0].latency_ms = 30.0
    clients[1].latency_ms = 1.0
    clients[2].latency_ms = 30.0
    r = RouterClient(deps, "latency-based")
    for i in range(20):
        r.complete(f"p{i}")
    dist = r.distribution()
    assert dist["dep1"] > dist["dep0"] and dist["dep1"] > dist["dep2"]


def test_usage_based_balances_tokens():
    clients, deps = _deps(2)
    r = RouterClient(deps, "usage-based")
    # alternating long/short prompts: usage stays balanced
    for i in range(40):
        r.complete(("long prompt " * 10) if i % 2 else "short")
    dist = r.distribution()
    assert abs(dist["dep0"] - dist["dep1"]) <= 6


def test_cost_based_picks_cheapest():
    clients, deps = _deps(3)
    deps[0].cost_per_1k_tokens = 2.0
    deps[1].cost_per_1k_tokens = 0.5
    deps[2].cost_per_1k_tokens = 1.0
    r = RouterClient(deps, "cost-based")
    for i in range(9):
        assert r.complete(f"p{i}").model == "dep1"


def test_weighted_pick_respects_weights():
    clients, deps = _deps(2)
    deps[0].weight = 9.0
    deps[1].weight = 1.0
    r = RouterClient(deps, "weighted-pick", seed=1)
    for i in range(200):
        r.complete(f"p{i}")
    dist = r.distribution()
    assert dist["dep0"] > 140 and dist["dep1"] > 2


def test_unknown_strategy_rejected():
    _, deps = _deps(1)
    with pytest.raises(ValueError):
        RouterClient(deps, "nope")


# ------------------------------------------------------------- end-to-end


def _dep_factory(i):
    from ondine_spark import DeterministicMockClient

    return DeterministicMockClient()


def _router_e2e_factory():
    return RouterClient(
        [Deployment(f"dep{i}", (lambda i=i: _dep_factory(i))) for i in range(3)],
        strategy="prompt-hash",
    )


def test_router_through_pipeline(spark):
    """Full spine with a routed client: every row answered, deployment
    stamped into resp_model, distribution adds up."""
    from ondine_spark import PipelineBuilder

    rows = [(i, f"document body {i} is good") for i in range(60)]
    df = spark.createDataFrame(rows, "id: long, review: string")
    p = (
        PipelineBuilder(spark)
        .from_dataframe(df, ["review"], id_column="id")
        .with_prompt("Label: {review}", ["label"])
        .with_custom_llm_client(_router_e2e_factory)
        .with_concurrency(8)
        .build()
    )
    out = p.result_frame().select("id", "label", "resp_model")
    rows_out = out.collect()
    assert len(rows_out) == 60
    assert all(r.label == "positive" for r in rows_out)
    got = {
        (r.deployment, r.requests)
        for r in deployment_distribution(out).collect()
    }
    want = {}
    for i, text in rows:
        d = f"dep{_md5_60bit(f'Label: {text}') % 3}"
        want[d] = want.get(d, 0) + 1
    assert got == set(want.items())
