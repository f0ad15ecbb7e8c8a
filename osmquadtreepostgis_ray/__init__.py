"""osmquadtreepostgis_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the capabilities of
jharris2268/osmquadtreepostgis (reference at /root/reference, GPL-3) on
idiomatic Ray Data: quadtree cell encoding, table routing, column
projection, point-in-polygon joins, kNN via cell-ring expansion,
multi-part geometry assembly, tile pyramids — all as ``Dataset``
pipelines of vectorized ``map_batches`` stages, plus the
training-data-pipeline operators (dedup, ANN, text stats, multimodal
plumbing) a 100 TB image+caption corpus needs.

Nothing here is a port: the reference's thread-callback execution engine
(src/processpostgis.cpp) is replaced by Ray Data's streaming executor;
its CsvBlock byte buffers (src/postgiswriter.hpp:35-81) by Arrow record
batches; its PostGIS COPY sink by partitioned Parquet.
"""

import sys as _sys

from osmquadtreepostgis_ray.config import EngineParams, Style

# Ship the package to Ray workers by value: the driver may import this
# library from a cwd outside the repo (the graft driver does), in which
# case worker processes have no import path to it.  register_pickle_by_value
# makes every stage closure self-contained (covers all submodules).
for _mod in ("cloudpickle", "ray.cloudpickle"):
    try:  # ray serializes with its vendored cloudpickle; register on both
        import importlib as _il
        _il.import_module(_mod).register_pickle_by_value(_sys.modules[__name__])
    except Exception:  # pragma: no cover
        pass

__all__ = ["EngineParams", "Style"]
__version__ = "0.1.0"
