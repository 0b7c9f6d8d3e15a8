"""Client-side multi-deployment router (L8) + deployment distribution (A7).

The reference delegates routing to the LiteLLM Router
(reference: ondine/core/router_strategies.py:10-97, init
ondine/adapters/unified_litellm_client.py:553-627) and tracks request
distribution per deployment
(reference: ondine/orchestration/deployment_tracker.py). Here routing is a
plain ``LLMClient`` wrapper, so it composes with the whole engine — retry,
rate limiting, batching, caching, resume — with no changes to the
invocation operator: each Python worker builds one ``RouterClient`` from
the broadcast factory, and every ``complete()`` picks a deployment.

Strategies (reference names where they exist):
- ``round-robin``         per-worker counter — even split, no state.
- ``simple-shuffle``      seeded RNG pick (reference: simple-shuffle).
- ``weighted-pick``       seeded RNG, weighted (reference: weighted-pick).
- ``prompt-hash``         md5(prompt) % n — DETERMINISTIC, the same
                          portable-hash contract as the dedup operators,
                          so routed runs stay oracle-checkable AND repeat
                          runs hit the response cache per-deployment.
- ``latency-based``       lowest EWMA latency (reference: latency-based-
                          routing; local state instead of Redis).
- ``usage-based``         lowest cumulative tokens routed (reference:
                          usage-based-routing).
- ``least-busy``          fewest in-flight calls in this worker
                          (reference: least-busy).
- ``cost-based``          cheapest ``cost_per_1k_tokens`` (reference:
                          cost-based-routing).

Failover: on ``TransientLLMError`` the call moves to the next-preferred
deployment before the invocation layer's backoff retry kicks in — a full
router retry only happens when EVERY deployment is throttled.

The chosen deployment label is stamped into ``LLMResult.model``, so it
lands in the ``resp_model`` response column and the A7 distribution is one
groupBy away (``deployment_distribution``).

Scale note: state (EWMA latency, usage, in-flight) is per-worker, like the
reference's per-process Router. Cross-executor global state would need the
Redis path (llm/redis_bucket.py shows the pattern); per-worker state
already converges to the same split when workers see similar traffic.
"""

from __future__ import annotations

import hashlib
import random
import threading
import time
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ondine_spark.llm.client import LLMResult, TransientLLMError

STRATEGIES = (
    "round-robin",
    "simple-shuffle",
    "weighted-pick",
    "prompt-hash",
    "latency-based",
    "usage-based",
    "least-busy",
    "cost-based",
)


def _md5_60bit(text: str) -> int:
    """First 60 bits of md5 — same contract as functions/similarity.md5_long
    and the DuckDB oracle's ``('0x' || substr(md5(x),1,15))::BIGINT``."""
    return int(hashlib.md5(text.encode("utf-8")).hexdigest()[:15], 16)


@dataclass
class Deployment:
    """One routable deployment: a label plus a zero-arg client factory."""

    label: str
    factory: Callable[[], Any]
    weight: float = 1.0
    cost_per_1k_tokens: float | None = None


@dataclass
class _DepState:
    ewma_latency_ms: float | None = None
    tokens_routed: int = 0
    in_flight: int = 0
    requests: int = 0


class RouterClient:
    """LLMClient that load-balances ``complete()`` across deployments."""

    def __init__(
        self,
        deployments: list[Deployment],
        strategy: str = "round-robin",
        failover: bool = True,
        seed: int = 0,
        ewma_alpha: float = 0.3,
    ):
        if not deployments:
            raise ValueError("router needs at least one deployment")
        if strategy not in STRATEGIES:
            raise ValueError(
                f"unknown strategy {strategy!r}; one of {STRATEGIES}"
            )
        self.deployments = list(deployments)
        self.strategy = strategy
        self.failover = failover
        self.model = f"router[{strategy}]"
        self._clients: list[Any] = [None] * len(deployments)
        self._state = [_DepState() for _ in deployments]
        self._rr = 0
        self._rng = random.Random(seed)
        self._alpha = ewma_alpha
        self._lock = threading.Lock()

    # ------------------------------------------------------------ selection

    def _order(self, prompt: str) -> list[int]:
        """Preference-ordered deployment indexes for one call."""
        n = len(self.deployments)
        with self._lock:
            if self.strategy == "round-robin":
                first = self._rr % n
                self._rr += 1
                return [(first + i) % n for i in range(n)]
            if self.strategy == "prompt-hash":
                first = _md5_60bit(prompt) % n
                return [(first + i) % n for i in range(n)]
            if self.strategy == "simple-shuffle":
                order = list(range(n))
                self._rng.shuffle(order)
                return order
            if self.strategy == "weighted-pick":
                pool = list(range(n))
                order = []
                while pool:
                    ws = [self.deployments[i].weight for i in pool]
                    pick = self._rng.choices(pool, weights=ws, k=1)[0]
                    pool.remove(pick)
                    order.append(pick)
                return order
            if self.strategy == "latency-based":
                # unmeasured deployments sort first so each gets probed
                key = lambda i: (  # noqa: E731
                    self._state[i].ewma_latency_ms is not None,
                    self._state[i].ewma_latency_ms or 0.0,
                    i,
                )
            elif self.strategy == "usage-based":
                key = lambda i: (self._state[i].tokens_routed, i)  # noqa: E731
            elif self.strategy == "least-busy":
                self._rr += 1
                rr = self._rr
                key = lambda i: (self._state[i].in_flight, (i - rr) % n)  # noqa: E731
            else:  # cost-based
                key = lambda i: (  # noqa: E731
                    self.deployments[i].cost_per_1k_tokens
                    if self.deployments[i].cost_per_1k_tokens is not None
                    else float("inf"),
                    i,
                )
            return sorted(range(n), key=key)

    def _client(self, i: int):
        with self._lock:
            if self._clients[i] is None:
                self._clients[i] = self.deployments[i].factory()
            return self._clients[i]

    # ------------------------------------------------------------- complete

    def complete(self, prompt: str, system: str | None = None) -> LLMResult:
        order = self._order(prompt)
        if not self.failover:
            order = order[:1]
        last_exc: Exception | None = None
        for i in order:
            client = self._client(i)
            st = self._state[i]
            with self._lock:
                st.in_flight += 1
            t0 = time.monotonic()
            try:
                res = client.complete(prompt, system)
            except TransientLLMError as e:
                last_exc = e
                continue
            finally:
                with self._lock:
                    st.in_flight -= 1
            ms = (time.monotonic() - t0) * 1000.0
            with self._lock:
                st.requests += 1
                st.tokens_routed += (res.tokens_in or 0) + (res.tokens_out or 0)
                st.ewma_latency_ms = (
                    ms
                    if st.ewma_latency_ms is None
                    else self._alpha * ms + (1 - self._alpha) * st.ewma_latency_ms
                )
            res.model = self.deployments[i].label
            return res
        assert last_exc is not None
        raise last_exc

    def distribution(self) -> dict[str, int]:
        """Requests served per deployment in THIS worker (reference:
        deployment_tracker.get_distribution_summary)."""
        with self._lock:
            return {
                d.label: s.requests
                for d, s in zip(self.deployments, self._state)
            }


def router_factory(
    deployments: list[Deployment],
    strategy: str = "round-robin",
    failover: bool = True,
    seed: int = 0,
) -> Callable[[], RouterClient]:
    """Broadcast-able factory for ``with_custom_llm_client`` — deployment
    factories must themselves be picklable (top-level functions)."""

    def build() -> RouterClient:
        return RouterClient(deployments, strategy, failover, seed)

    return build


def deployment_distribution(
    responses: DataFrame, col: str = "resp_model"
) -> DataFrame:
    """A7: requests per deployment across the whole run — the distributed
    version of the reference's driver-side tracker counts."""
    return (
        responses.groupBy(F.col(col).alias("deployment"))
        .agg(F.count(F.lit(1)).alias("requests"))
    )
