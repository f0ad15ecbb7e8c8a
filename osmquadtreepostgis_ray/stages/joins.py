"""Join operators.

- broadcast_join: small side shipped once via ray.put, looked up per
  batch with a pandas merge — no shuffle (the A3/A4 parent-tag pattern).
- bucket_hash_join: both sides large — add bucket = hash(key) % B to
  both, co-group by bucket, pandas merge per bucket (an explicit
  partitioned hash join; B and hot-key salting are the scale levers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from osmquadtreepostgis_ray.util import pool_size, worker_cached


def broadcast_join(big: ray.data.Dataset, small, on: str,
                   how: str = "inner") -> ray.data.Dataset:
    """Arrow-native broadcast join: the big side's blocks stay zero-copy
    Arrow end to end (pa.Table.join per batch).

    ``small`` may be a pandas DataFrame (driver-held lookup — ray.put
    once) or a Dataset: then its BLOCKS broadcast via to_arrow_refs()
    and the concatenated table never transits the driver — the right
    form when the small side is itself the output of a distributed
    stage (e.g. the contracted label table in stages/cluster.py)."""
    if isinstance(small, ray.data.Dataset):
        refs = small.to_arrow_refs()        # object-store refs only
    else:
        refs = [ray.put(pa.Table.from_pandas(small, preserve_index=False))]
    arrow_how = {"inner": "inner", "left": "left outer",
                 "right": "right outer", "outer": "full outer"}[how]

    class Join:
        def __init__(self):
            tabs = [t if isinstance(t, pa.Table) else pa.Table.from_pandas(t)
                    for t in ray.get(list(refs))]
            # empty pass-through blocks (e.g. from map_groups) can carry
            # the UPSTREAM schema — drop them before concat
            live = [t for t in tabs if t.num_rows > 0]
            if live:
                self.small = pa.concat_tables(
                    [t.select(live[0].column_names) for t in live]).combine_chunks()
            else:
                self.small = pa.concat_tables(tabs, promote_options="permissive")

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.join(self.small, keys=on, join_type=arrow_how)

    return big.map_batches(worker_cached(Join), batch_format="pyarrow")


BUCKETS = 32
_HASH_MULT = 2654435761


def default_buckets(*sides: ray.data.Dataset) -> int:
    """Join bucket count: max of the cluster floor (~2 groups per CPU,
    single-node floor 32 — keeps every core busy through the merge
    stage) and the DATA-AWARE count (combined input-size estimate /
    64 MB, util.scaled_shards) so one bucket's merged frame fits a
    worker heap at any input size.  Bucket ids never reach outputs, so
    the count is a pure blocks knob."""
    from osmquadtreepostgis_ray.util import estimate_bytes
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    floor = max(BUCKETS, 2 * cpus)
    est = sum(estimate_bytes(s) or 0 for s in sides)
    if est:
        floor = max(floor, -(-est // (64 << 20)))
    return floor


def _bucket(keys: np.ndarray, buckets: int) -> np.ndarray:
    return (np.asarray(keys, dtype=np.int64) * _HASH_MULT) % buckets



def _pin_if_lazy_schema(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Joins below need both sides' schemas up front.  On a lazy
    dataset whose plan contains an all-to-all (groupby/sort output),
    ``Dataset.schema()`` EXECUTES the whole plan to learn the schema —
    and the join then executes it a second time for the data.  When the
    schema is not already known cheaply, materialize once so schema +
    data come from the same execution (measured 62s -> ~20s on the
    triangle pipeline's chained joins)."""
    try:
        known = ds.schema(fetch_if_missing=False)
    except Exception:
        known = None
    return ds if known is not None else ds.materialize()


def bucket_hash_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                     buckets: int | None = None,
                     how: str = "inner") -> ray.data.Dataset:
    """Partitioned hash join on an int64 key.  Each side is tagged with
    its bucket and a side marker, aligned to the TYPED union schema
    (Arrow nulls, never pandas object columns), unioned, grouped by
    bucket once (a single shuffle), and merged per bucket.

    ``how='left'`` keeps unmatched left rows (right columns null; int
    right columns float in the merged frame — callers coalesce + cast,
    the typed-union dtype gotcha).

    Each side's OWN int columns are cast back to their Arrow dtype
    after the per-bucket side split: the union column holds the other
    side's padding nulls, so pandas floats it for the whole group —
    values silently lose exactness past 2^53 and the plan's dtype
    diverges from broadcast_join (caught by the dim_cap scale probe).
    A genuinely-null int cell raises loudly here, like asof_join's
    lint cast."""
    import pyarrow as _pa

    buckets = buckets or default_buckets(left, right)
    left, right = _pin_if_lazy_schema(left), _pin_if_lazy_schema(right)
    lschema = _pa.schema(list(zip(left.schema().names, left.schema().types)))
    rschema = _pa.schema(list(zip(right.schema().names, right.schema().types)))
    union_fields: dict[str, _pa.DataType] = {}
    for sch in (lschema, rschema):
        for f in sch:
            union_fields.setdefault(f.name, f.type)
    names = list(union_fields)
    lcols, rcols = set(lschema.names), set(rschema.names)

    def tag_align(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            b = _bucket(batch.column(on).to_numpy(), buckets)
            arrays = [batch.column(c) if c in batch.column_names
                      else pa.nulls(batch.num_rows, union_fields[c]) for c in names]
            arrays.append(pa.array(b, pa.int64()))
            arrays.append(pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()))
            return pa.Table.from_arrays(arrays, names=names + ["__bucket", "__side"])
        return _t

    u = left.map_batches(tag_align(0), batch_format="pyarrow").union(
        right.map_batches(tag_align(1), batch_format="pyarrow"))

    int_casts = {n: union_fields[n].to_pandas_dtype() for n in names
                 if _pa.types.is_integer(union_fields[n])}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][[c for c in names if c in lcols]]
        rg = g[g["__side"] == 1][[c for c in names if c in rcols]]
        for c, dt in int_casts.items():
            if c in lg.columns and lg[c].dtype != dt:
                lg = lg.assign(**{c: lg[c].astype(dt)})
            if c in rg.columns and rg[c].dtype != dt:
                rg = rg.assign(**{c: rg[c].astype(dt)})
        return lg.merge(rg, on=on, how=how)

    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")


DIM_BROADCAST_CAP = 256 << 20  # bytes: worker-heap comfortable on 4 GiB heaps


def dim_join(big: ray.data.Dataset, small: ray.data.Dataset, on: str,
             how: str = "inner",
             max_broadcast_bytes: int = DIM_BROADCAST_CAP) -> ray.data.Dataset:
    """Size-guarded dimension join: broadcast the small side (Dataset
    blocks via to_arrow_refs — never driver pandas) while it fits a
    worker heap, else fall back to the partitioned bucket_hash_join.

    A 'dimension' table (customer, parent groups) is data-scaled in a
    TPC-H-shaped corpus — an unconditional broadcast becomes a per-task
    OOM at 100 TB.  The small side is pinned once (materialize) so the
    size check and the join read the same execution."""
    small = small.materialize()
    size = small.size_bytes() or 0
    if size <= max_broadcast_bytes:
        return broadcast_join(big, small, on, how=how)
    return bucket_hash_join(big, small, on, how=how)


def multiway_bucket_join(sides: list[ray.data.Dataset], on: str,
                         buckets: int | None = None) -> ray.data.Dataset:
    """Inner-join N datasets on one int64 key in a SINGLE shuffle: the
    N-way generalization of bucket_hash_join.  Chaining two-way joins
    pays a full exchange per side; here every side is null-padded to
    the typed union schema, tagged (bucket, side), unioned and merged
    per bucket with successive vectorized pandas merges.  Non-key
    column names must be disjoint across sides.  Integer columns are
    cast back to int64 after the merge (null padding floats them inside
    mixed buckets — the typed-union dtype gotcha)."""
    import pyarrow as _pa

    buckets = buckets or default_buckets(*sides)
    sides = [_pin_if_lazy_schema(d) for d in sides]
    schemas = [_pa.schema(list(zip(d.schema().names, d.schema().types))) for d in sides]
    union_fields: dict[str, _pa.DataType] = {}
    int_cols: set[str] = set()
    for sch in schemas:
        for f in sch:
            if f.name != on and f.name in union_fields:
                raise ValueError(f"column {f.name!r} appears in two sides")
            union_fields.setdefault(f.name, f.type)
            if _pa.types.is_integer(f.type):
                int_cols.add(f.name)
    names = list(union_fields)
    side_cols = [list(sch.names) for sch in schemas]

    def tag_align(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            b = _bucket(batch.column(on).to_numpy(), buckets)
            arrays = [batch.column(c) if c in batch.column_names
                      else pa.nulls(batch.num_rows, union_fields[c]) for c in names]
            arrays.append(pa.array(b, pa.int64()))
            arrays.append(pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()))
            return pa.Table.from_arrays(arrays, names=names + ["__bucket", "__side"])
        return _t

    u = sides[0].map_batches(tag_align(0), batch_format="pyarrow")
    for i, d in enumerate(sides[1:], start=1):
        u = u.union(d.map_batches(tag_align(i), batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = None
        for i, cols in enumerate(side_cols):
            sg = g[g["__side"] == i][cols]
            out = sg if out is None else out.merge(sg, on=on, how="inner")
        for c in out.columns:
            if c in int_cols:
                out[c] = out[c].astype(np.int64)
        return out

    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")


def salted_bucket_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                       hot_keys: np.ndarray, salt_mod: int = 8,
                       buckets: int = BUCKETS, id_col: str | None = None) -> ray.data.Dataset:
    """Skew-aware hash join: rows of the BIG (left) side whose key is in
    `hot_keys` are spread across `salt_mod` sub-buckets; the small
    (right) side's hot-key rows are REPLICATED into every salt so each
    sub-bucket joins locally.  Bounds any one join group at ~1/salt_mod
    of a hot key's rows — the salted-join treatment of the reference's
    giant-relation bottleneck (docs/output.txt:75).  Output rows
    identical to bucket_hash_join.

    The salt is a pure function of the row (CLAUDE.md bit-stability
    invariant): `id_col` (default: first non-key integer column of the
    left schema) hashed mod salt_mod — never batch position, which would
    make grouping depend on block boundaries."""
    hot = np.sort(np.asarray(hot_keys, dtype=np.int64))
    if id_col is None:
        left = _pin_if_lazy_schema(left)
        sch = left.schema()
        for nm, ty in zip(sch.names, sch.types):
            if nm != on and pa.types.is_integer(ty):
                id_col = nm
                break
        if id_col is None:
            raise ValueError("salted_bucket_join needs an integer id_col on the left side")

    def salt_left(batch: pa.Table) -> pa.Table:
        keys = batch.column(on).to_numpy()
        salt = np.zeros(len(keys), dtype=np.int64)
        m = np.isin(keys, hot)
        if m.any():  # row-intrinsic spread (same form as skew.salt_keys)
            rid = batch.column(id_col).to_numpy().astype(np.int64)[m]
            salt[m] = (rid * _HASH_MULT) % salt_mod
        return batch.append_column("__salt", pa.array(salt, pa.int64()))

    def replicate_right(batch: pa.Table) -> pa.Table:
        keys = batch.column(on).to_numpy()
        m = np.isin(keys, hot)
        cold = batch.filter(pa.array(~m)).append_column(
            "__salt", pa.array(np.zeros(int((~m).sum()), np.int64), pa.int64()))
        if not m.any():
            return cold
        hot_rows = batch.filter(pa.array(m))
        reps = [hot_rows.append_column("__salt", pa.array(
            np.full(hot_rows.num_rows, s, np.int64), pa.int64()))
            for s in range(salt_mod)]
        return pa.concat_tables([cold] + reps)

    lt = left.map_batches(salt_left, batch_format="pyarrow")
    rt = right.map_batches(replicate_right, batch_format="pyarrow")
    return bucket_hash_join_on_cols(lt, rt, on=on, extra_key="__salt", buckets=buckets)


def detect_hot_keys(ds: ray.data.Dataset, on: str,
                    max_rows: int) -> np.ndarray:
    """Keys of `ds[on]` with more than `max_rows` rows, via the combiner
    pattern (per-batch (key, partial count) -> sharded sum): the shuffle
    carries distinct keys per batch, and only the hot set — by
    definition small — reaches the driver.  The input is projected to
    the key column first so the counting pass never carries payload
    bytes (at 100 TB the detect pass touches ~1% of the data)."""
    from osmquadtreepostgis_ray.util import sharded_agg

    ds = ds.select_columns([on])

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column(on).to_numpy(), return_counts=True)
        return pa.table({on: pa.array(u.astype(np.int64), pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    counts = sharded_agg(ds.map_batches(partial, batch_format="pyarrow"),
                         [on], {"n": ("n", "sum")})
    hot = counts.filter(expr=f"n > {int(max_rows)}").select_columns([on]).to_pandas()
    return np.sort(hot[on].to_numpy(np.int64))


def skew_aware_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                    max_rows_per_key: int = 100_000, salt_mod: int = 8,
                    buckets: int | None = None,
                    id_col: str | None = None) -> ray.data.Dataset:
    """Adaptive skew treatment for the partitioned hash join: one cheap
    combiner counting pass over the big side finds keys exceeding
    `max_rows_per_key`; if any exist the join runs salted (hot keys
    spread across salt_mod sub-buckets, small side replicated into
    each), else it is a plain bucket join.  Output identical either way
    — the detection only changes the partitioning.  This is the
    automated form of the reference's giant-relation bottleneck fix
    (serial MultiPolygons on coastline tiles, docs/output.txt:75):
    no caller-supplied hot list required."""
    hot = detect_hot_keys(left, on, max_rows_per_key)
    if not len(hot):
        return bucket_hash_join(left, right, on=on, buckets=buckets)
    return salted_bucket_join(left, right, on=on, hot_keys=hot,
                              salt_mod=salt_mod,
                              buckets=buckets or default_buckets(left, right), id_col=id_col)


def bucket_hash_join_on_cols(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                             extra_key: str, buckets: int = BUCKETS) -> ray.data.Dataset:
    """bucket_hash_join keyed on (on, extra_key) composite; the extra key
    participates in bucketing and the per-group merge."""
    import pyarrow as _pa

    left, right = _pin_if_lazy_schema(left), _pin_if_lazy_schema(right)
    lschema = _pa.schema(list(zip(left.schema().names, left.schema().types)))
    rschema = _pa.schema(list(zip(right.schema().names, right.schema().types)))
    union_fields: dict[str, _pa.DataType] = {}
    for sch in (lschema, rschema):
        for f in sch:
            union_fields.setdefault(f.name, f.type)
    names = list(union_fields)
    lcols, rcols = set(lschema.names), set(rschema.names)

    def tag_align(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            b = _bucket(batch.column(on).to_numpy() * 31
                        + batch.column(extra_key).to_numpy(), buckets)
            arrays = [batch.column(c) if c in batch.column_names
                      else pa.nulls(batch.num_rows, union_fields[c]) for c in names]
            arrays.append(pa.array(b, pa.int64()))
            arrays.append(pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()))
            return pa.Table.from_arrays(arrays, names=names + ["__bucket", "__side"])
        return _t

    u = left.map_batches(tag_align(0), batch_format="pyarrow").union(
        right.map_batches(tag_align(1), batch_format="pyarrow"))

    int_casts = {n: union_fields[n].to_pandas_dtype() for n in names
                 if _pa.types.is_integer(union_fields[n])}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][[c for c in names if c in lcols]]
        rg = g[g["__side"] == 1][[c for c in names if c in rcols]]
        for c, dt in int_casts.items():  # un-float typed-union padding
            if c in lg.columns and lg[c].dtype != dt:
                lg = lg.assign(**{c: lg[c].astype(dt)})
            if c in rg.columns and rg[c].dtype != dt:
                rg = rg.assign(**{c: rg[c].astype(dt)})
        out = lg.merge(rg, on=[on, extra_key], how="inner")
        return out.drop(columns=[extra_key])

    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, key: str,
              ts_col: str, buckets: int | None = None) -> ray.data.Dataset:
    """As-of join (backward, inclusive): each left row matches the
    LATEST right row with the same key and right.ts <= left.ts;
    unmatched left rows drop (inner).  The custom operator Ray Data
    lacks, composed per the brief's recipe: one hash shuffle on the key
    (the same typed-union single-exchange as bucket_hash_join), then a
    per-bucket sort + pandas merge_asof (compiled backward search) —
    no per-row Python.

    Timestamps must be int64 (epoch micros); right rows duplicated on
    (key, ts) are collapsed to one (callers make the payload a pure
    function of (key, ts) or pre-dedupe, keeping the result independent
    of block order — the bit-stability invariant)."""
    buckets = buckets or default_buckets(left, right)
    left, right = _pin_if_lazy_schema(left), _pin_if_lazy_schema(right)
    lnames = list(left.schema().names)
    rnames = [c for c in right.schema().names if c != key]

    def tag(side: int):
        def _t(batch: pa.Table) -> pa.Table:
            b = _bucket(batch.column(key).to_numpy(), buckets)
            batch = batch.append_column("__bucket", pa.array(b, pa.int64()))
            return batch.append_column(
                "__side", pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()))
        return _t

    # typed union schema: left cols + right's ts/payload under __r_ names
    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.rename_columns(
        {c: f"__r_{c}" for c in rnames}).map_batches(tag(1), batch_format="pyarrow")

    def align(names_all, types_all):
        def _a(batch: pa.Table) -> pa.Table:
            arrays = [batch.column(c) if c in batch.column_names
                      else pa.nulls(batch.num_rows, t) for c, t in zip(names_all, types_all)]
            return pa.Table.from_arrays(arrays, names=names_all)
        return _a

    lsch, rsch = lt.schema(), rt.schema()
    fields: dict[str, pa.DataType] = {}
    for sch in (lsch, rsch):
        for nm, ty in zip(sch.names, sch.types):
            fields.setdefault(nm, ty)
    names_all, types_all = list(fields), list(fields.values())
    u = lt.map_batches(align(names_all, types_all), batch_format="pyarrow").union(
        rt.map_batches(align(names_all, types_all), batch_format="pyarrow"))

    lint = {nm for nm, ty in zip(left.schema().names, left.schema().types)
            if pa.types.is_integer(ty)}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][lnames].sort_values(ts_col, kind="stable").copy()
        for c in lnames:  # the union's null padding floats int columns
            if c in lint:
                lg[c] = lg[c].astype(np.int64)
        rg = (g[g["__side"] == 1][[key] + [f"__r_{c}" for c in rnames]]
              .drop_duplicates([key, f"__r_{ts_col}"])
              .sort_values(f"__r_{ts_col}", kind="stable"))
        for c in rnames:
            rg[f"__r_{c}"] = rg[f"__r_{c}"].astype(np.int64)
        rg[key] = rg[key].astype(np.int64)
        if not len(lg) or not len(rg):
            out = lg.iloc[:0].copy()
            for c in rnames:
                out[f"__r_{c}"] = pd.Series([], dtype=np.int64)
            return out
        m = pd.merge_asof(lg, rg, left_on=ts_col, right_on=f"__r_{ts_col}",
                          by=key, direction="backward", allow_exact_matches=True)
        m = m[m[f"__r_{ts_col}"].notna()]
        for c in rnames:
            m[f"__r_{c}"] = m[f"__r_{c}"].astype(np.int64)
        return m[lnames + [f"__r_{c}" for c in rnames]]

    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")


def interval_join(points: ray.data.Dataset, intervals: ray.data.Dataset,
                  val_col: str, lo_col: str, hi_col: str,
                  bin_width: int) -> ray.data.Dataset:
    """1-D range join: every (point, interval) pair with lo <= v < hi —
    the brief's 'range join' custom operator (the 2-D sibling is the
    cell-binned PIP join in stages/pip_join.py, same recipe).

    Binning: intervals replicate to every bin they overlap, points hash
    to their own bin, one typed-union shuffle on the bin co-locates
    them, and the per-bucket pair expansion + exact [lo, hi) mask is
    vectorized pandas.  Pick bin_width ~ the typical interval width:
    replication stays ~2x and per-bin cross products stay bounded (the
    documented partitioning assumption).  ALL of v, lo, hi must be
    non-negative so `//` agrees between numpy (floor) and any SQL twin
    (trunc) — shift inputs by a constant if needed (CLAUDE.md
    invariant)."""
    pnames = list(points.schema().names)
    inames = list(intervals.schema().names)

    def explode_intervals(batch: pa.Table) -> pa.Table:
        lo = batch.column(lo_col).to_numpy().astype(np.int64)
        hi = batch.column(hi_col).to_numpy().astype(np.int64)
        if (lo < 0).any():
            raise ValueError("interval_join requires non-negative bounds")
        b0 = lo // bin_width
        b1 = np.maximum(hi - 1, lo) // bin_width
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(lo)), reps)
        bins = b0[idx] + (np.arange(int(reps.sum()), dtype=np.int64)
                          - np.repeat(np.cumsum(reps) - reps, reps))
        out = batch.take(pa.array(idx))
        return out.append_column("__bin", pa.array(bins, pa.int64()))

    def tag_points(batch: pa.Table) -> pa.Table:
        v = batch.column(val_col).to_numpy().astype(np.int64)
        if (v < 0).any():
            raise ValueError("interval_join requires non-negative values")
        return batch.append_column("__bin", pa.array(v // bin_width, pa.int64()))

    pt = points.map_batches(tag_points, batch_format="pyarrow")
    iv = intervals.map_batches(explode_intervals, batch_format="pyarrow")

    fields: dict[str, pa.DataType] = {}
    for ds_ in (pt, iv):
        for nm, ty in zip(ds_.schema().names, ds_.schema().types):
            fields.setdefault(nm, ty)
    names_all, types_all = list(fields), list(fields.values())

    def side_align(sd: int):
        def _s(batch: pa.Table) -> pa.Table:
            arrays = [batch.column(c) if c in batch.column_names
                      else pa.nulls(batch.num_rows, t)
                      for c, t in zip(names_all, types_all)]
            arrays.append(pa.array(np.full(batch.num_rows, sd, np.int8), pa.int8()))
            return pa.Table.from_arrays(arrays, names=names_all + ["__side"])
        return _s

    u = pt.map_batches(side_align(0), batch_format="pyarrow").union(
        iv.map_batches(side_align(1), batch_format="pyarrow"))

    pint = {nm for nm, ty in zip(points.schema().names, points.schema().types)
            if pa.types.is_integer(ty)}
    iint = {nm for nm, ty in zip(intervals.schema().names, intervals.schema().types)
            if pa.types.is_integer(ty)}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        pg = g[g["__side"] == 0][pnames + ["__bin"]]
        ig = g[g["__side"] == 1][inames + ["__bin"]]
        for c in pnames:
            if c in pint:
                pg[c] = pg[c].astype(np.int64)
        for c in inames:
            if c in iint:
                ig[c] = ig[c].astype(np.int64)
        m = pg.merge(ig, on="__bin")
        m = m[(m[val_col] >= m[lo_col]) & (m[val_col] < m[hi_col])]
        return m[pnames + inames]

    return u.groupby("__bin").map_groups(merge, batch_format="pandas")


def bucket_semi_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                     anti: bool = False, buckets: int | None = None,
                     distinct: bool = False) -> ray.data.Dataset:
    """Semi (rows of left with >= 1 key match in right) / anti (rows
    with none) join — same single typed-union shuffle as
    bucket_hash_join; the per-bucket membership test is a vectorized
    isin, and only LEFT columns come back (no pair expansion).

    ``distinct=True`` additionally dedups left rows by key INSIDE the
    bucket — exact global distinct (equal keys co-locate), saving the
    separate groupby(key) aggregate a set-intersection query would
    otherwise pay; right-side dups never matter (membership keys are
    uniqued in the merge)."""
    buckets = buckets or default_buckets(left, right)
    lnames = list(left.schema().names)
    lint = {nm for nm, ty in zip(left.schema().names, left.schema().types)
            if pa.types.is_integer(ty)}

    def tag(side: int, keep_cols):
        def _t(batch: pa.Table) -> pa.Table:
            b = _bucket(batch.column(on).to_numpy(), buckets)
            cols = {c: batch.column(c) for c in keep_cols if c in batch.column_names}
            t = pa.table(cols)
            t = t.append_column("__bucket", pa.array(b, pa.int64()))
            return t.append_column(
                "__side", pa.array(np.full(batch.num_rows, side, np.int8), pa.int8()))
        return _t

    fields = {nm: ty for nm, ty in zip(left.schema().names, left.schema().types)}

    def align_right(batch: pa.Table) -> pa.Table:
        # right side ships ONLY the key, padded to the left schema
        arrays = [batch.column(c) if c == on
                  else pa.nulls(batch.num_rows, fields[c]) for c in lnames]
        return pa.Table.from_arrays(arrays, names=lnames)

    lt = left.map_batches(tag(0, lnames), batch_format="pyarrow")
    rt = (right.select_columns([on]).map_batches(align_right, batch_format="pyarrow")
          .map_batches(tag(1, lnames), batch_format="pyarrow"))
    u = lt.union(rt)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][lnames]
        if distinct:
            lg = lg.drop_duplicates(on)
        keys = g[g["__side"] == 1][on].unique()
        m = lg[on].isin(keys)
        out = lg[~m if anti else m].copy()
        for c in lnames:
            if c in lint:
                out[c] = out[c].astype(np.int64)
        return out

    return u.groupby("__bucket").map_groups(merge, batch_format="pandas")


# --------------------------------------------------------------- fuzzy join
# FastSS deletion-neighborhood self-join: strings within edit distance 1
# share at least one member of D1(s) = {s} ∪ single-deletions(s)
# (substitution pairs share the deletion at the differing position;
# insert/delete pairs share the shorter string itself), so hashing D1
# to buckets + one groupby(bucket) shuffle finds every candidate; exact
# verification runs inside the (small) buckets.  The variant hashes are
# computed WITHOUT materializing variant strings: prefix/suffix
# polynomial sums give all L deletion hashes of a length-L string in
# one vectorized pass per length group.

_FNV_P = np.uint64(1099511628211)


def _deletion_variant_hashes(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """(bucket_hash, row_index) rows for every distinct member of D1(s)
    per string.  Polynomial hash H(x) = sum x_t * P^(m-1-t) mod 2^64;
    deleting position j of a length-L string splits into the prefix sum
    reweighted to length L-1 plus the suffix sum at original weights."""
    enc = [np.frombuffer(s.encode("utf-8"), np.uint8) for s in names]
    lens = np.array([len(e) for e in enc], dtype=np.int64)
    out_h: list[np.ndarray] = []
    out_r: list[np.ndarray] = []
    for L in np.unique(lens):
        rows = np.flatnonzero(lens == L)
        if L == 0:
            out_h.append(np.zeros(len(rows), np.uint64))
            out_r.append(rows)
            continue
        mat = np.stack([enc[r] for r in rows]).astype(np.uint64)     # (n, L)
        pw = _FNV_P ** np.arange(L, dtype=np.uint64)[::-1]           # P^{L-1-t}
        full = (mat * pw[None, :]).sum(axis=1)                       # H(s)
        # variant j: sum_{t<j} x_t P^{L-2-t} + sum_{t>j} x_t P^{L-1-t}
        wB = mat * pw[None, :]
        cumB = np.cumsum(wB, axis=1)
        sufB = cumB[:, -1:] - cumB                                   # sum_{t>j} wB_t
        wA = mat * (_FNV_P ** (np.arange(L, dtype=np.uint64)[::-1] - np.uint64(1)))[None, :]
        cumA = np.cumsum(wA, axis=1)
        preA = np.concatenate([np.zeros((len(rows), 1), np.uint64), cumA[:, :-1]], axis=1)
        var = preA + sufB                                            # (n, L) wraps mod 2^64
        var.sort(axis=1)
        keep = np.ones(var.shape, dtype=bool)
        keep[:, 1:] = var[:, 1:] != var[:, :-1]                      # dedupe repeated chars
        reps = keep.sum(axis=1)
        out_h.append(np.concatenate([var[keep], full]))
        out_r.append(np.concatenate([np.repeat(rows, reps), rows]))
    return np.concatenate(out_h), np.concatenate(out_r)


def _dist_le1(a: str, b: str) -> int | None:
    la, lb = len(a), len(b)
    if la == lb:
        d = sum(x != y for x, y in zip(a, b))
        return d if d <= 1 else None
    if abs(la - lb) != 1:
        return None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else None


def fuzzy_join_dist1(ds: ray.data.Dataset, key_col: str, name_col: str) -> ray.data.Dataset:
    """Self-join pairs (a_key < b_key) whose `name_col` strings are
    within edit distance 1.  One groupby(bucket) shuffle of (L+1) short
    rows per string; per-bucket exact verification (buckets are
    neighborhoods, bounded by local similarity, not dataset size); a
    final grouped min dedupes pairs that share several variants
    (distance-0 twins).

    The shuffle key is a SHARD of the bucket hash (256 groups), not the
    bucket itself: a corpus yields ~#strings x length buckets, and Ray's
    per-group map_groups overhead on hundreds of thousands of 1-2-row
    groups dwarfs the work (measured 112 s -> ~4 s at sf0.1).  Same
    co-location guarantee — equal buckets land in the same shard — with
    bucket-segmented pair generation inside the shard.

    The final cross-variant dedup is likewise a pair-hash-sharded
    groupby with a vectorized pandas min inside each shard — NOT
    Dataset.aggregate(Min) on (a_key, b_key): pair keys are
    near-all-distinct, and Ray's sort aggregate degrades to per-group
    Python objects on singleton groups (measured 549 s of AggregateMap
    CPU for 262k pairs at sf0.1)."""

    def fan(t: pa.Table) -> pa.Table:
        ids = t.column(key_col).to_numpy()
        names = t.column(name_col).to_pylist()
        h, r = _deletion_variant_hashes(names)
        shard = ((h * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)).astype(np.int64)
        return pa.table({"shard": pa.array(shard, pa.int64()),
                         "bucket": pa.array(h.view(np.int64), pa.int64()),
                         "key": pa.array(ids[r], pa.int64()),
                         "name": pa.array([names[i] for i in r], pa.string())})

    def verify_shard(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "key"], kind="stable")
        b = g["bucket"].to_numpy()
        ids = g["key"].to_numpy()
        names = g["name"].to_numpy()
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        a_out, b_out, d_out = [], [], []
        for s, e in zip(starts, ends):  # only multi-member buckets do work
            for i in range(s, e - 1):
                for j in range(i + 1, e):
                    if ids[i] == ids[j]:
                        continue
                    d = _dist_le1(names[i], names[j])
                    if d is not None:
                        a_out.append(ids[i])
                        b_out.append(ids[j])
                        d_out.append(d)
        out = pd.DataFrame({"a_key": np.array(a_out, np.int64),
                            "b_key": np.array(b_out, np.int64),
                            "dist": np.array(d_out, np.int64)})
        # in-shard dedup (same pair via two variants in one shard)
        return out.groupby(["a_key", "b_key"], as_index=False, sort=False)["dist"].min()

    def pair_shard(t: pa.Table) -> pa.Table:
        a = t.column("a_key").to_numpy().astype(np.uint64)
        b = t.column("b_key").to_numpy().astype(np.uint64)
        ps = (((a * np.uint64(0x9E3779B97F4A7C15)) ^ b) >> np.uint64(56)).astype(np.int64)
        return t.append_column("pshard", pa.array(ps, pa.int64()))

    def dedup_shard(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["a_key", "b_key"], as_index=False, sort=False)["dist"].min()

    return (ds.map_batches(fan, batch_format="pyarrow")
            .groupby("shard").map_groups(verify_shard, batch_format="pandas")
            .map_batches(pair_shard, batch_format="pyarrow")
            .groupby("pshard").map_groups(dedup_shard, batch_format="pandas")
            .select_columns(["a_key", "b_key", "dist"]))


# -------------------------------------------------------------- bloom join

_B1 = np.uint64(0x9E3779B97F4A7C15)
_B2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray, k: int, bits: int) -> np.ndarray:
    """(k, n) bit positions for int keys via double hashing — a pure
    function of the key (bit-stable across parallelism)."""
    x = keys.astype(np.uint64, copy=False)
    h1 = x * _B1
    h1 ^= h1 >> np.uint64(31)
    h2 = ((x ^ (x >> np.uint64(33))) * _B2) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % np.uint64(bits)).astype(np.int64)


def build_bloom_bitmap(right: ray.data.Dataset, on: str,
                       bits_log2: int = 20, k: int = 4) -> np.ndarray:
    """Distributed Bloom-filter build over the right side's keys.

    Each batch emits its DISTINCT bit positions (bounded by the filter
    size, never the batch's row count); one sharded distinct dedups
    across batches; the driver materializes only the <= 2^bits_log2
    surviving positions and packs the bitmap.  Driver memory is the
    FILTER size (128 KiB at the default), independent of data size —
    the build never ships keys, only saturating bit positions."""
    from osmquadtreepostgis_ray.util import sharded_agg

    bits = 1 << bits_log2

    def positions(batch: pa.Table) -> pa.Table:
        keys = batch.column(on).to_numpy()
        pos = np.unique(_bloom_positions(keys, k, bits))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    posds = right.select_columns([on]).map_batches(
        positions, batch_format="pyarrow")
    distinct = sharded_agg(posds, ["pos"], {"n": ("pos", "count")}, shards=64)
    tabs = [t for t in ray.get(distinct.to_arrow_refs()) if t.num_rows]
    bitmap = np.zeros(bits >> 3, np.uint8)
    if tabs:
        pos = pa.concat_tables(
            [t.select(["pos"]) for t in tabs]).column("pos").to_numpy()
        np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bitmap


def bloom_probe(left: ray.data.Dataset, on: str, bitmap: np.ndarray,
                k: int = 4, invert: bool = False) -> ray.data.Dataset:
    """Filter ``left`` to rows whose key MAY be in the bloom set (or,
    with ``invert=True``, rows whose key is DEFINITELY absent — that
    side has no false positives).  The bitmap ships once via ray.put
    and is tested vectorized per batch."""
    bits = int(bitmap.size) << 3
    ref = ray.put(bitmap)

    class Probe:
        def __init__(self):
            self.bm = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(on).to_numpy()
            pos = _bloom_positions(keys, k, bits)
            hit = self.bm[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)
            maybe = (hit != 0).all(axis=0)
            return batch.filter(pa.array(~maybe if invert else maybe))

    return left.map_batches(worker_cached(Probe), batch_format="pyarrow")


def bloom_semi_join(left: ray.data.Dataset, right: ray.data.Dataset, on: str,
                    anti: bool = False, bits_log2: int = 20, k: int = 4,
                    buckets: int | None = None) -> ray.data.Dataset:
    """Bloom-prefiltered semi/anti join — the canonical shuffle-
    reduction pattern for a selective right side: a Bloom filter of the
    right keys (built distributed, broadcast once) drops left rows that
    DEFINITELY have no match before the join shuffle, so the exchange
    carries only candidates.  Bloom false positives are resolved by the
    exact bucket_semi_join on the survivors; false negatives don't
    exist, so the result is EXACTLY the semi (resp. anti) join.

    anti=True short-circuits the other way: definitely-absent rows are
    emitted immediately (no shuffle at all for them); only maybe-
    present rows pay the exact anti check.  At 100 TB with a 1% match
    rate this cuts the join exchange ~99%: the whole left side streams
    through a 128 KiB broadcast bitmap instead of a cluster-wide
    shuffle."""
    bitmap = build_bloom_bitmap(right, on, bits_log2=bits_log2, k=k)
    cand = bloom_probe(left, on, bitmap, k=k)
    exact = bucket_semi_join(cand, right, on, anti=anti, buckets=buckets)
    if not anti:
        return exact
    definite = bloom_probe(left, on, bitmap, k=k, invert=True)
    return exact.union(definite)
