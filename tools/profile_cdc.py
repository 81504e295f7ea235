"""Profile the CDC headline under different knob settings.

Usage: python tools/profile_cdc.py <num_cpus> <num_partitions> [batch_size] [val_conc]
Prints stage stats + wall time.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, '.')

ncpu = int(sys.argv[1])
nparts = int(sys.argv[2])
batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16384
vconc = int(sys.argv[4]) if len(sys.argv) > 4 else 0

import ray  # noqa: E402

ray.init(address='local', num_cpus=ncpu, include_dashboard=False,
         ignore_reinit_error=True, logging_level='ERROR')
import logging  # noqa: E402

import ray.data as rd  # noqa: E402
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False
logging.getLogger('ray.data').setLevel(logging.ERROR)

from bench import event_log_path  # noqa: E402
from filters_ray.pipelines.cdc import CDCPipeline  # noqa: E402

events_path = event_log_path(1_000_000)
lake = tempfile.mkdtemp(prefix='prof_lake_')
pipeline = CDCPipeline(
    lake, num_partitions=nparts, batch_size=batch,
    validate_concurrency=(1, vconc) if vconc else None,
)
t0 = time.time()
report = pipeline.run(rd.read_parquet(events_path))
dt = time.time() - t0
print(f'cpus={ncpu} parts={nparts} batch={batch} vconc={vconc}: '
      f'{dt:.2f}s  ({1_000_000 / dt:,.0f} ev/s) applied={report.events_applied}')
shutil.rmtree(lake, ignore_errors=True)
ray.shutdown()
