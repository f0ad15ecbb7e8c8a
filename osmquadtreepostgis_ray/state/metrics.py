"""Per-stage progress metrics — the engine's G3 (the reference's `Prog`
prints per-stage wait/exec lines, /root/reference/docs/output.txt:16-23).

A named zero-CPU collector actor receives batched records from every
instrumented stage; each worker process accumulates locally and flushes
every `flush_every` batches (fire-and-forget), so the hot path pays one
list-append per batch and an actor call per flush window.

`timed_stage(name, fn)` wraps any map_batches UDF:

    wait_s  — gap since this worker finished its previous batch of the
              stage (upstream starvation / scheduling latency)
    exec_s  — UDF time for the batch
    rows/bytes — output size

`stage_metrics_table()` aggregates the records into the Prog-style
per-stage summary.  Complements (not replaces) the per-partition
lineage rows of state/checkpoint.py.
"""

from __future__ import annotations

import time

import pyarrow as pa
import ray

SINK_NAME = "oqp_metrics_sink"
_LOCAL: dict = {}


@ray.remote(num_cpus=0)
class MetricsSink:
    def __init__(self):
        self.recs: list[tuple] = []

    def record_many(self, recs: list[tuple]) -> None:
        self.recs.extend(recs)

    def drain(self) -> list[tuple]:
        out, self.recs = self.recs, []
        return out

    def snapshot(self) -> list[tuple]:
        return list(self.recs)


def get_sink():
    # Hold the handle in this process's module state: a named
    # NON-detached actor dies when its last handle drops, so a
    # transient `get_sink().foo.remote()` would let Ray reap the sink
    # between calls ("all references to the actor were removed" races
    # against the next get_if_exists).  One handle per process keeps it
    # alive exactly as long as someone can still flush to it.
    h = _LOCAL.get("__sink_handle")
    if h is None:
        h = MetricsSink.options(name=SINK_NAME, get_if_exists=True).remote()
        _LOCAL["__sink_handle"] = h
    return h


def timed_stage(name: str, fn, flush_every: int = 8):
    """Wrap a map_batches UDF with wait/exec/rows/bytes recording."""

    def wrapped(batch):
        st = _LOCAL.setdefault(name, {"last_end": None, "buf": [], "sink": None})
        t0 = time.time()
        wait = (t0 - st["last_end"]) if st["last_end"] is not None else 0.0
        out = fn(batch)
        t1 = time.time()
        nbytes = out.nbytes if hasattr(out, "nbytes") else 0
        nrows = out.num_rows if hasattr(out, "num_rows") else len(out)
        st["buf"].append((name, wait, t1 - t0, int(nrows), int(nbytes)))
        st["last_end"] = t1
        if len(st["buf"]) >= flush_every:
            flush_stage(name)
        return out

    return wrapped


def flush_stage(name: str) -> None:
    st = _LOCAL.get(name)
    if not st or not st["buf"]:
        return
    if st["sink"] is None:
        st["sink"] = get_sink()
    try:
        st["sink"].record_many.remote(st["buf"])
    except Exception:
        # metrics are telemetry: a dead sink actor (node pressure, host
        # steal) must never fail the pipeline — invalidate the cached
        # handle, re-resolve once, drop the buffer if still unreachable
        try:
            _LOCAL.pop("__sink_handle", None)
            st["sink"] = get_sink()
            st["sink"].record_many.remote(st["buf"])
        except Exception:
            pass
    st["buf"] = []


def flush_all() -> None:
    for name in list(_LOCAL):
        flush_stage(name)


STAGE_SCHEMA = pa.schema([
    ("stage", pa.string()),
    ("batches", pa.int64()),
    ("wait_s", pa.float64()),
    ("exec_s", pa.float64()),
    ("rows", pa.int64()),
    ("bytes", pa.int64()),
])


def stage_metrics_table(drain: bool = False, wait_s: float = 5.0) -> pa.Table:
    """Prog-style per-stage summary from the collector actor.

    Worker flushes are fire-and-forget, so records can still be in
    flight when the pipeline's last task returns — poll up to `wait_s`
    for the sink to go non-empty before reading (records arriving after
    that surface on the next call).  Worker-side buffers also flush
    every `flush_every` batches; callers wanting exact totals should run
    with flush_every=1 or accept the (bounded) lag."""
    import pandas as pd
    sink = get_sink()
    deadline = time.time() + wait_s
    while not ray.get(sink.snapshot.remote()) and time.time() < deadline:
        time.sleep(0.1)
    recs = ray.get((sink.drain if drain else sink.snapshot).remote())
    if not recs:
        return STAGE_SCHEMA.empty_table()
    df = pd.DataFrame(recs, columns=["stage", "wait_s", "exec_s", "rows", "bytes"])
    g = df.groupby("stage", sort=True).agg(
        batches=("rows", "size"), wait_s=("wait_s", "sum"), exec_s=("exec_s", "sum"),
        rows=("rows", "sum"), bytes=("bytes", "sum")).reset_index()
    return pa.Table.from_pandas(g[[f.name for f in STAGE_SCHEMA]], preserve_index=False) \
        .cast(STAGE_SCHEMA)
