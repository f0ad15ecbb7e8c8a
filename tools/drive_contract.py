"""Drive the driver contract exactly as the graft driver does: ray.init
first (cwd anywhere), then import __ray_entry__ and call its surface."""
import sys
import time

import ray

ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import __ray_entry__ as E  # noqa: E402

t0 = time.time()
df = E.entry().to_pandas()
print("entry(): rows =", len(df), "| ncols =", len(df.columns), f"| {time.time()-t0:.1f}s")
df2 = E.entry().to_pandas()
print("second call identical:",
      df.sort_values("osm_id").reset_index(drop=True).equals(
          df2.sort_values("osm_id").reset_index(drop=True)))
qs = E.queries()
osql = E.oracle_sql()
print("queries:", len(qs), "| with oracle:", len(osql), "| subset:", set(osql) <= set(qs))
r = qs["pip_zones"]("/root/testdata/sf0.1").to_pandas()
print("pip_zones @ sf0.1 rows:", len(r))
ray.shutdown()
print("OK")
