"""Zep-backed claim store (U7 backend; reference:
ondine/context/zep_store.py:69-156).

The parquet ``ClaimStore`` stays the system of record — Zep is an
OPTIONAL side-channel that mirrors claim text into a Zep Cloud knowledge
graph (entity/relationship extraction happens service-side) and answers
semantic searches against it.

Spark placement: Zep's API is a per-item HTTP service, so mirroring is a
driver-side stream over ``toLocalIterator`` — constant memory, bounded by
``max_claims`` as a spend guard (claims frames are the AGGREGATE of a run,
orders of magnitude smaller than the corpus; pushing a 10¹⁰-row corpus
into a graph API is a config error, not a scale path, hence the hard
cap). The client is injectable: tests use a fake recorder; production
builds ``zep_cloud.Zep`` — import-guarded."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame


class ZepClaimStore:
    """Mirror claims into a Zep knowledge graph + search it.

    ``client`` must expose ``graph.add(graph_id=, type=, data=)`` and
    ``graph.search(graph_id=, query=, scope=, limit=)`` (the zep-cloud
    SDK shape the reference drives)."""

    def __init__(self, graph_id: str, client: Any = None,
                 api_key: str | None = None, max_claims: int = 100_000):
        if client is None:  # pragma: no cover - zep sdk not installed here
            try:
                from zep_cloud.client import Zep
            except ImportError as e:
                raise ImportError(
                    "ZepClaimStore needs the zep-cloud SDK "
                    "(pip install zep-cloud) or an injected client"
                ) from e
            client = Zep(api_key=api_key)
        self.client = client
        self.graph_id = graph_id
        self.max_claims = max_claims

    def mirror_claims(self, claims: DataFrame,
                      text_col: str = "output_text") -> int:
        """Stream claim texts into the graph; returns how many were sent.
        Stops at ``max_claims`` (raise the cap deliberately if a run
        really should push more into a per-item HTTP API)."""
        sent = 0
        for row in claims.select(text_col).toLocalIterator():
            if sent >= self.max_claims:
                break
            text = row[text_col]
            if not text:
                continue
            self.client.graph.add(
                graph_id=self.graph_id, type="text", data=str(text)[:10_000]
            )
            sent += 1
        return sent

    def search(self, query: str, limit: int = 5) -> list[dict]:
        """→ [{"text", "score", "source_ref"}] from graph edges + nodes
        (the reference's edge-fact-first ordering)."""
        results = self.client.graph.search(
            graph_id=self.graph_id, query=query[:400], scope="edges",
            limit=limit,
        )
        parsed: list[dict] = []
        for edge in getattr(results, "edges", None) or []:
            parsed.append({
                "text": getattr(edge, "fact", "") or "",
                "score": getattr(edge, "score", 0.0),
                "source_ref": getattr(edge, "name", ""),
            })
        for node in getattr(results, "nodes", None) or []:
            parsed.append({
                "text": getattr(node, "summary", "")
                        or getattr(node, "name", ""),
                "score": getattr(node, "score", 0.0),
                "source_ref": getattr(node, "name", ""),
            })
        return parsed[:limit]
