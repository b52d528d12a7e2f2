"""Multi-host pod scan skeleton.

Run one copy of this per host (the TPU runtime wires the processes
together).  Every process drives its local chips over the global mesh; the
striped tile plan is deterministic, inputs are replicated once, and only
process 0 writes output — communication is O(records).
"""

import sys

import numpy as np

import weightedld_tpu as wld
from weightedld_tpu.parallel.multihost import (
    global_mesh,
    initialize_distributed,
    is_output_process,
)
from weightedld_tpu.runtime.driver import DriverConfig, run_to_tsv

initialize_distributed()  # no-op for single-process runs

res = wld.prepare(sys.argv[1])
n = run_to_tsv(
    res.alignment, res.weights, res.site_map,
    out_path="pairs.tsv" if is_output_process() else "/dev/null",
    cfg=DriverConfig(r2_threshold=0.1, tiles_per_shard_batch=2048),
    mesh=global_mesh(),
    checkpoint=is_output_process(),
)
if is_output_process():
    print(f"{n} records written")
