"""Small runtime utilities."""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd
import ray

_STAGE_CACHE: dict = {}
_STAGE_CACHE_MAX = 32  # LRU bound: see worker_cached

_MIX = np.uint64(0x9E3779B97F4A7C15)


def estimate_bytes(ds: "ray.data.Dataset") -> int | None:
    """Metadata-only size estimate — NEVER executes the plan (Dataset.
    size_bytes() runs the whole chain when metadata is missing, which a
    sizing heuristic must not).  When the head operator can't infer its
    size (any map_batches), walk to the plan's SOURCES (parquet reads
    carry file-metadata sizes) and sum those: an upper-bound proxy that
    scales with the input, which is what shard sizing needs.  None when
    nothing in the plan knows its size."""
    def walk(node) -> int | None:
        try:
            m = node.infer_metadata()
            if m.size_bytes is not None:
                return m.size_bytes
        except Exception:
            pass
        total, known = 0, False
        for dep in getattr(node, "input_dependencies", None) or []:
            s = walk(dep)
            if s is not None:
                total, known = total + s, True
        return total if known else None

    try:
        return walk(ds._logical_plan.dag)
    except Exception:
        return None


SHARD_FLOOR = 256
SHARD_TARGET_BYTES = 64 << 20  # ~64 MB Arrow per shard: pandas-expanded


def scaled_shards(ds: "ray.data.Dataset", floor: int = SHARD_FLOOR,
                  target_bytes: int = SHARD_TARGET_BYTES) -> int:
    """Shard count that grows with the DATA: one shard must fit a worker
    heap at any input size (a fixed 256 means ~400 GB/shard at 100 TB).
    Derived from the metadata-only estimate; the floor keeps small
    inputs at the round-2 constants (bit-compatible outputs — shard ids
    never reach results)."""
    est = estimate_bytes(ds)
    if not est:
        return floor
    return max(floor, -(-est // target_bytes))


def shard_apply(ds: "ray.data.Dataset", keys: list[str], fn,
                shards: int | None = None) -> "ray.data.Dataset":
    """Keyed-group apply without the per-group task tax.

    ``groupby(key).map_groups(fn)`` pays a Python call (and often a
    pandas slice) PER GROUP; on keys whose cardinality scales with the
    data (user ids, doc ids, pair keys) that overhead dwarfs the work —
    measured 112 s -> 3 s on the fuzzy join and 549 s of AggregateMap
    CPU on 262k near-singleton groups at sf0.1.  This shuffles on a
    hash SHARD of the key columns instead (row-pure: pandas hash_array
    with its fixed default hash key — bit-stable across processes and
    parallelism) and applies ``fn`` once per shard.

    ``fn`` receives the WHOLE shard as a pandas DataFrame (column
    ``__shard`` already dropped) and must do its own per-key grouping
    with vectorized kernels (sort + groupby.tail / reduceat / cumsum
    segments).  Rows with equal key values are guaranteed co-located in
    one shard.  ``shards`` bounds the shuffle fan-in; the default is
    DATA-AWARE (scaled_shards: input-size estimate / 64 MB, floor 256)
    so a shard fits a worker heap at any input size (it is a blocks
    knob, not a semantics knob)."""
    import pyarrow as pa

    if shards is None:
        shards = scaled_shards(ds)

    def add_shard(t: "pa.Table") -> "pa.Table":
        if not t.num_rows:
            # zero-row blocks can carry an EMPTY schema (CLAUDE.md) —
            # never touch key columns; an empty block with __shard
            # appended is droppable by the groupby either way
            return t.append_column("__shard", pa.array([], pa.int64()))
        h = np.zeros(len(t), np.uint64)
        for k in keys:
            col = t.column(k)
            vals = col.to_numpy(zero_copy_only=False)
            # the hash path must be a function of the SCHEMA, not the
            # batch contents: an int column with a null in ONE batch
            # comes out float64 there and the same key value would
            # hash differently across batches — silently breaking the
            # co-location contract.  Loud raise instead.
            if pa.types.is_integer(col.type):
                if col.null_count:
                    raise ValueError(
                        f"shard_apply: null in integer key column {k!r} "
                        f"breaks batch-stable hashing; fill or filter "
                        f"nulls before the shuffle")
                hk = vals.astype(np.uint64, copy=False) * _MIX
                hk ^= hk >> np.uint64(29)
            else:
                hk = pd.util.hash_array(vals)  # fixed default key: pure
            h = (h * _MIX) ^ hk
        s = ((h * _MIX) >> np.uint64(32)).astype(np.int64) % shards
        return t.append_column("__shard", pa.array(s, pa.int64()))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.drop(columns="__shard"))

    return (ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("__shard").map_groups(run, batch_format="pandas"))


def sharded_agg(ds: "ray.data.Dataset", keys: list[str], spec: dict,
                shards: int | None = None) -> "ray.data.Dataset":
    """Grouped aggregate for keys whose cardinality scales with the
    data (cells, pixels, (user, hour) pairs, content hashes): one
    hash-shard shuffle + a C-level pandas groupby per shard, instead of
    Dataset.aggregate's per-key reduce.  ``spec`` maps output column ->
    (input column, 'sum'|'min'|'max'|'count'), pandas named-agg style.
    Callers should still pre-combine per batch (map_batches partial)
    so the shuffle carries partials, not rows."""

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False, sort=False).agg(**spec)

    return shard_apply(ds, keys, agg, shards=shards)


PAYLOAD_TARGET_BYTES = 32 << 20  # ~32 MB of decoded payload per batch


def payload_batch_rows(avg_row_bytes: float,
                       target_bytes: int = PAYLOAD_TARGET_BYTES,
                       lo: int = 16, hi: int = 4096) -> int:
    """Memory-aware batch size for stages over opaque binary payloads
    (images/audio/video): rows per batch so batch x concurrency stays
    inside a worker heap at ANY payload width — a hardcoded 512 rows is
    1.5 MB/batch on this synthetic corpus but 512 MB/batch on real
    1-MB images.  Clamped: `lo` keeps vectorized kernels efficient,
    `hi` bounds per-batch Python overhead on tiny payloads."""
    if avg_row_bytes <= 0:
        return hi
    # float division: int(avg_row_bytes) truncates 0 < avg < 1 to zero
    return int(min(hi, max(lo, target_bytes / avg_row_bytes)))


SOLVE_SMALL_BYTES = 1 << 30  # 1 GiB source estimate: one-task-solve cap


def reduce_small_or_shard(ds: "ray.data.Dataset", keys: list[str], fn,
                          max_small_bytes: int = SOLVE_SMALL_BYTES,
                          shards: int | None = None) -> "ray.data.Dataset":
    """Global keyed reduce of a combiner-partial Dataset with a
    size-guarded plan choice (the dim_join/cluster.py admission
    pattern): when the metadata-only input estimate is under
    ``max_small_bytes`` the partials coalesce into ONE worker task
    (repartition(1) — no sort shuffle; measured 0.7 s vs 3.5 s of pure
    sort coordination on a cardinality-bounded table at sf0.1), else
    the sort-based shard_apply handles arbitrary partial volume.

    ``fn`` has the shard_apply contract: pandas in/out, does its own
    per-key grouping, and must be a pure keyed reduce (key co-location
    is all it needs) — both plans then produce identical rows."""
    est = estimate_bytes(ds)
    if est is not None and est <= max_small_bytes:
        import pyarrow as pa

        def solve(t: "pa.Table") -> "pa.Table":
            if not t.num_rows and not t.column_names:
                return t  # fully-empty input: schema unrecoverable
            return pa.Table.from_pandas(fn(t.to_pandas()),
                                        preserve_index=False)

        return ds.repartition(1).map_batches(solve, batch_format="pyarrow",
                                             batch_size=None)
    return shard_apply(ds, keys, fn, shards=shards)


def topk_per_key(partials: "ray.data.Dataset", key: str, by: list[str],
                 ascending: list[bool], k: int, out_cols: list[str],
                 shards: int | None = None) -> "pa.Table | None":
    """Distributed FINAL top-k merge for the ANN/kNN family.
    Returns None when every shard is empty (empty corpus / all
    sentinels) — callers build their own typed empty result.

    Partial candidate volume is n_keys x k x num_blocks — it grows with
    the BLOCK COUNT, so pulling partials to the driver (to_pandas) is a
    driver-memory + Amdahl scale-killer at 10^5-10^6 blocks.  Instead the
    partials shard by ``key`` (every key's candidates co-located — the
    shard assignment is row-pure, see shard_apply) and each shard does
    the vectorized sort + head(k) + rank; the driver receives only
    n_keys x k FINAL rows, independent of block count.  The tiny final
    table is then canonically ordered by (key, rank).  ``shards``
    defaults to DATA-AWARE sizing (shard_apply -> scaled_shards): the
    partial volume grows with block count, so a fixed fan-in would hold
    millions of candidate rows per shard at 10^5-10^6 blocks.  Shard
    ids never reach results, so the output is bit-identical at any
    shard count."""
    import pyarrow as pa

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=ascending, kind="stable")
        g = g.groupby(key, sort=False).head(k).copy()
        g["rank"] = g.groupby(key, sort=False).cumcount() + 1
        return g[out_cols + ["rank"]]

    out = shard_apply(partials, [key], merge, shards=shards)
    tabs = [pa.Table.from_batches([b]) if isinstance(b, pa.RecordBatch) else b
            for b in out.iter_batches(batch_format="pyarrow", batch_size=1 << 20)]
    tabs = [t.select(out_cols + ["rank"]) for t in tabs if t.num_rows > 0]
    if not tabs:
        return None
    return pa.concat_tables(tabs).sort_by([(key, "ascending"), ("rank", "ascending")])


def worker_cached(factory):
    """Wrap a callable-factory as a plain map_batches fn with build-once-
    per-worker-process semantics.

    Ray reuses task worker processes, so a module-level cache gives the
    same amortization as an actor pool's __init__ WITHOUT paying actor
    process spawn (1-2 s each; a 16-actor pool costs more to start than
    most of our stages run).  Reserve real actor pools for state that is
    expensive to build (big indexes, models); use this for broadcast-ref
    lookups and compiled tables.  The factory must be picklable (may
    capture ray.ObjectRefs).

    The per-process cache is LRU-BOUNDED (_STAGE_CACHE_MAX): every
    wrap mints a fresh key, so per-query wrappers (knn builds one per
    call holding a dereferenced query matrix) would otherwise grow
    worker RSS linearly over a long session.  An evicted entry just
    rebuilds on next call."""
    key = uuid.uuid4().hex

    def fn(batch):
        obj = _STAGE_CACHE.get(key)
        if obj is None:
            obj = _STAGE_CACHE[key] = factory()
            while len(_STAGE_CACHE) > _STAGE_CACHE_MAX:
                _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
        else:
            # refresh LRU position (dict preserves insertion order)
            _STAGE_CACHE.pop(key)
            _STAGE_CACHE[key] = obj
        return obj(batch)

    return fn


def pool_size(frac: float = 0.5, lo: int = 1, hi: int = 16) -> int:
    """Actor-pool size leaving headroom for the read/write stages: an
    actor pool that reserves every CPU starves its upstream tasks and
    the pipeline serializes (or deadlocks on tiny clusters)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(lo, min(hi, int(cpus * frac)))
