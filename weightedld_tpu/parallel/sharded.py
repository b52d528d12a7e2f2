"""Multi-chip execution: shard the site-pair triangle across a device mesh.

The TPU-native replacement for the reference's rayon work-stealing pool
(``lib.rs:613-679``): the linearized upper-triangle tile list is striped
across a 1-D ``jax.sharding.Mesh`` axis; the (small) alignment matrix and
weight vector are replicated; each chip evaluates and *compacts* its own
tiles, so cross-device traffic is O(results), not O(pairs).

Communication accounting (SURVEY.md §2.3): inputs are broadcast once;
per-batch outputs are fixed-capacity compacted record buffers gathered
host-side; no collective runs inside the hot loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.ld_tiled import compact_tile_stats, tile_stats_batch

AXIS = "tiles"


def default_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def make_sharded_tile_runner(
    mesh: Mesh,
    *,
    tile: int,
    n_sites: int,
    capacity_per_shard: int,
):
    """Build a jitted sharded function evaluating + compacting tile batches.

    Returned callable signature:
        fn(codes_pad, weights, tile_i, tile_j, emit, r2_threshold)
          -> (counts [D], sites [D, cap, 2], values [D, cap, 3])
    where tile arrays are shard-major: shard d owns slice
    ``[d*k, (d+1)*k)`` of the batch.
    """
    n_dev = mesh.devices.size

    def local_fn(codes_pad, weights, tile_i, tile_j, emit, r2_threshold):
        st = tile_stats_batch(
            codes_pad, weights, tile_i, tile_j, emit, tile=tile, n_sites=n_sites
        )
        cnt, sites, vals = compact_tile_stats(
            st, tile_i, tile_j, r2_threshold, tile=tile, capacity=capacity_per_shard
        )
        return cnt[None], sites[None], vals[None]

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=(P(AXIS), P(AXIS), P(AXIS)),
    )
    fn = jax.jit(sharded)

    def runner(codes_pad, weights, tile_i, tile_j, emit, r2_threshold):
        assert len(tile_i) % n_dev == 0, "batch must divide evenly across mesh"
        return fn(
            codes_pad,
            weights,
            jnp.asarray(tile_i),
            jnp.asarray(tile_j),
            jnp.asarray(emit),
            jnp.float32(r2_threshold),
        )

    runner.mesh = mesh
    runner.n_dev = n_dev
    return runner


def replicate(mesh: Mesh, *arrays):
    """Device_put arrays fully-replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return tuple(jax.device_put(a, sharding) for a in arrays)
