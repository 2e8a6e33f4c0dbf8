"""Runtime metrics mirroring the reference's stable v1 metric schema
(reference docs/adr/metric-schema.md:5-13, Metrics.scala:1-150):

| reference metric                     | Spark source                                            |
|--------------------------------------|---------------------------------------------------------|
| ssp_parmap_inflight                  | statusTracker active-task gauge (InflightTracker)       |
| ssp_boundary_queue_depth / _max      | trigger admission: numInputRows per in-flight batch     |
| ssp_boundary_producer_block_ms       | cumulative triggerExecution (drain wait of full queue)  |
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
    caller-supplied in-band, reference Node.scala:344-346).

    Boundary-queue gauges (reference Node.scala:214-274 bounded queue;
    metric schema docs/adr/metric-schema.md:5-13): under micro-batch
    admission control the *trigger batch is the queue* — rows admitted to
    an in-flight trigger sit buffered exactly like the reference's queued
    elements. So ``ssp_boundary_queue_depth`` is the latest trigger's
    ``numInputRows`` (0 for empty triggers), ``_max`` the max over the
    query's life — the harness invariant depth_max <= admission capacity
    (BackpressureStressHarness.scala:53) holds because the source rate
    limit caps numInputRows per trigger. ``ssp_boundary_producer_block_ms``
    is the cumulative triggerExecution time: a producer writing into a full
    queue blocks for exactly the time the consumer needs to drain the
    in-flight batch."""
    snap = Snapshot()
    late = 0
    depth = 0
    depth_max = 0
    block_ms = 0
    for p in progress:
        for op in p.get("stateOperators", []) or []:
            late += int(op.get("numRowsDroppedByWatermark", 0) or 0)
        depth = int(p.get("numInputRows", 0) or 0)
        depth_max = max(depth_max, depth)
        block_ms += int((p.get("durationMs") or {}).get("triggerExecution", 0) or 0)
    snap.values["ssp_late_event_dropped_total"] = late
    snap.values["ssp_boundary_queue_depth"] = depth
    snap.values["ssp_boundary_queue_depth_max"] = depth_max
    snap.values["ssp_boundary_producer_block_ms"] = block_ms
    return snap


class InflightTracker:
    """Samples ``ssp_parmap_inflight`` (reference Metrics.scala gauge: tasks
    currently executing inside parMap's pool) from Spark's public
    ``SparkContext.statusTracker`` while a job runs — the scheduler owns
    task placement, so the gauge is observed, not maintained (the mapping
    documented in this module's header table).

    Use as a context manager around the action::

        with track_inflight(spark) as t:
            df.count()
        assert t.peak > 0

    A daemon thread polls active stages' ``numActiveTasks`` every
    ``interval`` seconds, publishing the current sum to the collector's
    ``ssp_parmap_inflight`` gauge and recording the high-water mark in
    ``peak``. Polling the status API costs O(active stages) py4j calls per
    tick — observability overhead is independent of data volume."""

    def __init__(self, spark, collector: Collector | None = None, interval: float = 0.02) -> None:
        self._spark = spark
        self._collector = collector or GLOBAL
        self._interval = interval
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.peak = 0

    def _sample(self) -> int:
        tracker = self._spark.sparkContext.statusTracker()
        n = 0
        for sid in tracker.getActiveStageIds():
            info = tracker.getStageInfo(sid)
            if info is not None:
                n += int(info.numActiveTasks)
        return n

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                n = self._sample()
            except Exception:  # session shutting down mid-poll — gauge goes quiet
                break
            self.peak = max(self.peak, n)
            self._collector.gauge("ssp_parmap_inflight", n)
            self._stop.wait(self._interval)

    def __enter__(self) -> "InflightTracker":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        # final published value reflects quiescence; peak keeps the high-water
        self._collector.gauge("ssp_parmap_inflight", 0)


def track_inflight(spark, collector: Collector | None = None, interval: float = 0.02) -> InflightTracker:
    return InflightTracker(spark, collector, interval)


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
