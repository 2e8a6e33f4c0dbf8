"""Runtime metrics mirroring the reference's stable v1 metric schema
(reference docs/adr/metric-schema.md:5-13, Metrics.scala:1-150):

| reference metric                     | Spark source                                            |
|--------------------------------------|---------------------------------------------------------|
| ssp_parmap_inflight                  | running tasks (scheduler-owned; exposed via status API) |
| ssp_boundary_queue_depth / _max      | shuffle/admission internals (streaming progress rates)  |
| ssp_boundary_producer_block_ms       | source admission wait ≈ trigger batch durations         |
| ssp_late_event_dropped_total         | stateOperators[].numRowsDroppedByWatermark              |
| ssp_watermark_regression_total       | impossible by construction (always 0)                   |
| ssp_resource_close_fail_total        | counted by lifecycle wrappers (this module)             |
| ssp_unhandled_error_total            | failed actions/queries counted by execution handles     |

Per-execution scoping (reference Metrics.scala:96-111 ThreadLocal
collectors) maps to: one ``Snapshot`` per ExecutionHandle / StreamingQuery,
plus a process-global collector for lifecycle counters. Batch row-level
observability uses ``pyspark.sql.Observation`` (df.observe) — metrics ride
the job, no second pass over the data.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

METRIC_NAMES = (
    "ssp_parmap_inflight",
    "ssp_boundary_queue_depth",
    "ssp_boundary_queue_depth_max",
    "ssp_boundary_producer_block_ms",
    "ssp_late_event_dropped_total",
    "ssp_watermark_regression_total",
    "ssp_resource_close_fail_total",
    "ssp_unhandled_error_total",
)


@dataclass
class Snapshot:
    """Point-in-time metric values (counters monotonic, gauges sampled)."""

    values: dict[str, int] = field(default_factory=lambda: {name: 0 for name in METRIC_NAMES})

    def as_dict(self) -> dict[str, int]:
        return dict(self.values)


class Collector:
    """Thread-safe counter/gauge collector. The process-global instance
    (``GLOBAL``) backs lifecycle counters; execution handles create scoped
    collectors (reference per-execution scoping parity)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._values = {name: 0 for name in METRIC_NAMES}

    def incr(self, name: str, by: int = 1) -> None:
        with self._lock:
            self._values[name] = self._values.get(name, 0) + by

    def gauge(self, name: str, value: int) -> None:
        with self._lock:
            self._values[name] = value
            max_key = f"{name}_max"
            if max_key in self._values:
                self._values[max_key] = max(self._values[max_key], value)

    def snapshot(self) -> Snapshot:
        with self._lock:
            return Snapshot(dict(self._values))

    def reset(self) -> None:
        with self._lock:
            for k in self._values:
                self._values[k] = 0


GLOBAL = Collector()


def snapshot_from_streaming_progress(progress: list[dict]) -> Snapshot:
    """Fold a streaming query's progress events into the reference metric
    schema: late drops from the state operator, watermark regressions
    always 0 (Spark watermarks are monotonic by construction —
    the reference's regression counter exists because its watermarks are
    caller-supplied in-band, reference Node.scala:344-346)."""
    snap = Snapshot()
    late = 0
    for p in progress:
        for op in p.get("stateOperators", []) or []:
            late += int(op.get("numRowsDroppedByWatermark", 0) or 0)
    snap.values["ssp_late_event_dropped_total"] = late
    return snap


def observed_action(df, action, **metric_exprs):
    """Row-level metrics that ride the job (reference per-execution scoped
    Collector, Metrics.scala:96-111; scoping golden
    SimpleStreamProcessorTest.scala:527-546).

    Attaches a ``pyspark.sql.Observation`` with the given aliased aggregate
    expressions, runs ``action(observed_df)``, and returns
    ``(result, metrics_dict)``. The metrics are computed by the SAME job
    that produces the result — no second pass over the data, which is the
    property that makes per-query observability free at 100 TB (a separate
    metrics query would re-scan the input). Each call owns a fresh
    Observation, so concurrent executions are isolated exactly like the
    reference's ThreadLocal collector scopes."""
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[expr.alias(name) for name, expr in metric_exprs.items()])
    result = action(observed)
    return result, obs.get
