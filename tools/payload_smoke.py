"""Streaming throughput smoke for the binary-payload families: image
ahash and audio features over a repeat-scaled corpus (payload synthesis
+ decode + feature extraction end-to-end, consumed by a count — no
materialization).  Prints one JSON line.

Usage: python tools/payload_smoke.py [repeat] [sf_dir] [num_cpus]
"""
import json
import sys
import time

import ray

repeat = int(sys.argv[1]) if len(sys.argv) > 1 else 20
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ncpu = int(sys.argv[3]) if len(sys.argv) > 3 else 32

ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")

from osmquadtreepostgis_ray.sources.audio import read_audio  # noqa: E402
from osmquadtreepostgis_ray.sources.images import read_images  # noqa: E402
from osmquadtreepostgis_ray.stages.audio import AudioFeatures  # noqa: E402
from osmquadtreepostgis_ray.stages.images import AHash  # noqa: E402
from osmquadtreepostgis_ray.util import worker_cached  # noqa: E402

out = {"repeat": repeat, "sf": sf, "num_cpus": ncpu}

t0 = time.time()
n = read_images(sf, with_bytes=True, repeat=repeat).map_batches(
    worker_cached(AHash), batch_format="pyarrow", batch_size=512).count()
dt = time.time() - t0
out["image_ahash"] = {"rows": n, "sec": round(dt, 2),
                      "rows_per_s": round(n / dt, 1)}

t0 = time.time()
n = read_audio(sf, repeat=repeat).map_batches(
    worker_cached(AudioFeatures), batch_format="pyarrow", batch_size=512).count()
dt = time.time() - t0
out["audio_features"] = {"rows": n, "sec": round(dt, 2),
                         "rows_per_s": round(n / dt, 1)}

print(json.dumps(out))
ray.shutdown()
