"""Flow configuration schemas — the reference's TypeBox env surface
(SURVEY.md §1.1; IncomingInput task.ts:13-27, OutgoingInput
task.ts:29-40, EphemeralStore task.ts:42-46) as validated dataclasses.

The reference validates its environment declaratively (defaults,
enums, array-of-KV params) before building the scan spec; our engine
does the same before building a DataFrame plan. ``IncomingConfig``
is literally the logical-plan seed: strategy + pushed predicate +
generic params (task.ts:399-414).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class QueryStrategy(str, Enum):
    """task.ts:16-19 — scan strategy enum (ITER pages the query
    endpoint; TOP_FEATURES_ITER uses top-k-per-group server queries)."""

    ITER = "ITER"
    TOP_FEATURES_ITER = "TOP_FEATURES_ITER"


@dataclass(frozen=True)
class KV:
    """One generic query parameter (task.ts:20-23)."""

    key: str
    value: str


@dataclass
class IncomingConfig:
    """Incoming flow config (task.ts:13-27): source url, SQL-92 where,
    strategy (default ITER, task.ts:18), arbitrary extra params."""

    arcgis_url: str
    query: str = ""
    strategy: QueryStrategy = QueryStrategy.ITER
    params: list[KV] = field(default_factory=list)
    page_size: int = 1000

    def __post_init__(self) -> None:
        if not self.arcgis_url:
            raise ValueError("ARCGIS_URL must be set (task.ts:397)")
        if isinstance(self.strategy, str):
            self.strategy = QueryStrategy(self.strategy)
        if self.page_size <= 0:
            raise ValueError("page_size must be positive")
        for kv in self.params:
            if not kv.key:
                raise ValueError("param Key must be non-empty (task.ts:21)")


@dataclass
class OutgoingConfig:
    """Outgoing flow config (task.ts:29-40): three geometry-routed
    target layers + append-vs-upsert mode (default False ==> upsert,
    task.ts:37)."""

    points_url: str = ""
    lines_url: str = ""
    polys_url: str = ""
    preserve_history: bool = False

    def routed_targets(self) -> dict[str, str]:
        """Route -> target url for configured layers; unconfigured
        geometry types are skipped (task.ts:178-187)."""
        return {
            route: url
            for route, url in (
                ("points", self.points_url),
                ("lines", self.lines_url),
                ("polys", self.polys_url),
            )
            if url
        }


@dataclass
class EphemeralState:
    """Per-flow token cache (task.ts:42-46)."""

    token: str | None = None
    expires_ms: int | None = None
    referer: str | None = None
