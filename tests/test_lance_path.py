"""Lance read-path coverage without the wheel (VERDICT r3 missing #3):
the dispatch (read_table prefers <name>.lance), the argument plumbing
(read_lance_table -> ray.data.read_lance with pruned columns), and the
sandbox gate (clean NotImplementedError when lance is absent)."""

import sys
import types

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from osmquadtreepostgis_ray.sources import tables as T


def test_read_table_dispatches_to_lance(tmp_path, monkeypatch):
    # both a .parquet and a .lance exist -> the lance path wins
    pq.write_table(pa.table({"doc_id": pa.array([1], pa.int64())}),
                   str(tmp_path / "documents.parquet"))
    (tmp_path / "documents.lance").mkdir()
    seen = {}

    def fake_reader(path, columns=None):
        seen["path"], seen["columns"] = path, columns
        return ray.data.from_arrow(pa.table({"doc_id":
                                             pa.array([7], pa.int64())}))

    monkeypatch.setattr(T, "read_lance_table", fake_reader)
    out = T.read_table(str(tmp_path), "documents", columns=["doc_id"])
    assert seen["path"].endswith("documents.lance")
    assert seen["columns"] == ["doc_id"]
    assert out.to_pandas()["doc_id"].tolist() == [7]


def test_read_lance_table_plumbs_columns(monkeypatch):
    # a stub `lance` module satisfies the import gate; ray.data.read_lance
    # is recorded — read_lance_table must pass path + pruned columns through
    monkeypatch.setitem(sys.modules, "lance", types.ModuleType("lance"))
    seen = {}

    def fake_read_lance(path, columns=None, **kw):
        seen["path"], seen["columns"] = path, columns
        return ray.data.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))

    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance)
    out = T.read_lance_table("/data/t.lance", columns=["a", "b"])
    assert seen == {"path": "/data/t.lance", "columns": ["a", "b"]}
    assert out.count() == 1


def test_read_lance_table_gate_without_wheel(monkeypatch):
    # no lance wheel -> a clear NotImplementedError, not an ImportError
    monkeypatch.setitem(sys.modules, "lance", None)  # forces ImportError
    with pytest.raises(NotImplementedError, match="lance is not installed"):
        T.read_lance_table("/data/t.lance")


def test_no_duplicate_registry_keys():
    """queries()/oracle_sql() dict literals must not contain duplicate
    keys — Python silently keeps the last, shadowing an operator (the
    round-4 sample_stratified collision)."""
    import ast

    src = open("/root/repo/__ray_entry__.py").read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys
                    if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate registry keys: {dupes}"

    import osmquadtreepostgis_ray.oracle as O
    osrc = open(O.__file__).read()
    for node in ast.walk(ast.parse(osrc)):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys
                    if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate oracle keys: {dupes}"


def test_no_duplicate_query_functions():
    """queries.py must not define the same top-level function twice
    (Python keeps the last silently — the shadow that caused the
    registry collision)."""
    import ast

    import osmquadtreepostgis_ray.queries as Q
    src = open(Q.__file__.replace(".pyc", ".py")).read()
    names = [n.name for n in ast.parse(src).body
             if isinstance(n, ast.FunctionDef)]
    dupes = {n for n in names if names.count(n) > 1}
    assert not dupes, f"duplicate function defs: {dupes}"


def test_registry_oracle_coverage():
    """Every queries() entry must carry a full-value oracle, except the
    documented rows-only allowlist (recursive simplify is not
    SQL-expressible; golden-checked in pytest instead)."""
    import __ray_entry__ as E

    q, o = set(E.queries()), set(E.oracle_sql())
    assert q - o == {"simplify_ways"}
    assert not (o - q), f"orphan oracles: {o - q}"
