"""Streaming all-pairs driver: batches of triangle tiles -> compacted records.

This is the large-S execution engine (the analog of the reference's
``all_weighted_ld_pairs`` driver, ``lib.rs:578-684``): it walks the
upper-triangle tile list in shard-major batches, evaluates each batch on the
device mesh, compacts surviving records on-device, and streams them to the
caller — device memory stays bounded by the batch size and host traffic is
O(records).

Extras the reference lacks (SURVEY.md §5): block-batch checkpoint/resume
(a pod job can restart mid-triangle) and periodic pairs/s progress
reporting (the reference logs pairs/s only at the end, ``main.rs:196-205``).
"""

from __future__ import annotations

import json
import logging
import time
from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Iterator

import jax
import numpy as np

from ..core.ld_dense import LdRecords
from ..core.ld_tiled import pad_alignment
from ..parallel.sharded import default_mesh, make_sharded_tile_runner, replicate
from ..parallel.triangle import cdiv, plan_tiles, stripe

log = logging.getLogger("weightedld_tpu")


@dataclass
class DriverConfig:
    tile: int = 128                 # site-tile side
    tiles_per_shard_batch: int = 8  # tiles evaluated per device per dispatch
    capacity_per_shard: int | None = None  # compaction buffer; None = dense-safe
    r2_threshold: float | None = None  # None = emit every surviving pair
    progress_every_s: float = 10.0


@dataclass
class Progress:
    pairs_done: int
    pairs_total: int
    elapsed_s: float

    @property
    def pairs_per_s(self) -> float:
        return self.pairs_done / self.elapsed_s if self.elapsed_s > 0 else 0.0


def stream_ld_records(
    alignment: np.ndarray,
    weights: np.ndarray,
    site_map: np.ndarray,
    cfg: DriverConfig | None = None,
    mesh=None,
    start_batch: int = 0,
    on_progress: Callable[[Progress], None] | None = None,
) -> Iterator[tuple[int, LdRecords]]:
    """Yield ``(batch_idx, records)`` for every tile batch of the triangle.

    Args:
        alignment: ``[N, S]`` int8 LD-masked codes.
        weights: ``[N]`` per-sequence weights.
        site_map: ``[S]`` original positions for output records.
        start_batch: resume point (skip batches below this index).
    """
    cfg = cfg or DriverConfig()
    mesh = mesh or default_mesh()
    n_dev = mesh.devices.size
    n, s = alignment.shape
    plan = plan_tiles(s, cfg.tile)

    capacity = cfg.capacity_per_shard
    if capacity is None:
        # Dense-safe: a batch can never overflow (= no-threshold runs).
        capacity = cfg.tiles_per_shard_batch * cfg.tile * cfg.tile

    runner = make_sharded_tile_runner(
        mesh, tile=cfg.tile, n_sites=s, capacity_per_shard=capacity
    )

    codes_pad = pad_alignment(alignment, cfg.tile)
    codes_dev, weights_dev = replicate(
        mesh, codes_pad, np.asarray(weights, dtype=np.float32)
    )

    tile_i, tile_j, emit = stripe(plan, n_dev)
    per_shard = len(tile_i) // n_dev
    k = cfg.tiles_per_shard_batch
    n_batches = cdiv(per_shard, k)
    site_map = np.asarray(site_map)

    t0 = time.monotonic()
    last_report = t0
    pairs_done = 0
    # Count pairs per batch approximately for progress (exact at the end).
    pairs_total = plan.n_pairs

    for b in range(start_batch, n_batches):
        # Gather each shard's slice [b*k, b*k+k) into a shard-major batch.
        sel = []
        for d in range(n_dev):
            lo = d * per_shard + b * k
            hi = min(lo + k, d * per_shard + per_shard)
            sel.append(np.arange(lo, hi))
        sel = np.concatenate(sel)
        bi = np.full(n_dev * k, 0, dtype=np.int32)
        bj = np.full(n_dev * k, 0, dtype=np.int32)
        be = np.zeros(n_dev * k, dtype=bool)
        # Scatter each shard's (possibly short) slice into its fixed block.
        off = 0
        for d in range(n_dev):
            cnt_d = min(k, per_shard - b * k)
            if cnt_d <= 0:
                continue
            blk = sel[off : off + cnt_d]
            bi[d * k : d * k + cnt_d] = tile_i[blk]
            bj[d * k : d * k + cnt_d] = tile_j[blk]
            be[d * k : d * k + cnt_d] = emit[blk]
            off += cnt_d

        thr = -np.inf if cfg.r2_threshold is None else cfg.r2_threshold
        counts, sites, values = jax.block_until_ready(
            runner(codes_dev, weights_dev, bi, bj, be, thr)
        )
        counts = np.asarray(counts)
        sites = np.asarray(sites)
        values = np.asarray(values)

        recs = []
        for d in range(n_dev):
            c = int(counts[d])
            if c > capacity:
                raise RuntimeError(
                    f"compaction overflow on shard {d}: {c} > {capacity}; "
                    "raise capacity_per_shard or r2_threshold"
                )
            recs.append((sites[d, :c], values[d, :c]))
        all_sites = np.concatenate([r[0] for r in recs])
        all_vals = np.concatenate([r[1] for r in recs])

        records = LdRecords(
            pos_a=site_map[all_sites[:, 0]],
            pos_b=site_map[all_sites[:, 1]],
            d=all_vals[:, 0],
            d_prime=all_vals[:, 1],
            r2=all_vals[:, 2],
        )
        pairs_done += len(records)

        now = time.monotonic()
        if on_progress and (now - last_report > cfg.progress_every_s or b == n_batches - 1):
            on_progress(Progress(pairs_done, pairs_total, now - t0))
            last_report = now

        yield b, records


def collect_ld_records(
    alignment: np.ndarray,
    weights: np.ndarray,
    site_map: np.ndarray,
    cfg: DriverConfig | None = None,
    mesh=None,
) -> LdRecords:
    """Run the full triangle and concatenate all records (small/medium S)."""
    parts = [r for _, r in stream_ld_records(alignment, weights, site_map, cfg, mesh)]
    if not parts:
        return LdRecords(*(np.empty(0) for _ in range(5)))
    return LdRecords(
        pos_a=np.concatenate([p.pos_a for p in parts]),
        pos_b=np.concatenate([p.pos_b for p in parts]),
        d=np.concatenate([p.d for p in parts]),
        d_prime=np.concatenate([p.d_prime for p in parts]),
        r2=np.concatenate([p.r2 for p in parts]),
    )


# ---------------------------------------------------------------------------
# Checkpointed TSV writing
# ---------------------------------------------------------------------------


def run_to_tsv(
    alignment: np.ndarray,
    weights: np.ndarray,
    site_map: np.ndarray,
    out_path: str | Path,
    cfg: DriverConfig | None = None,
    mesh=None,
    checkpoint: bool = True,
    ndigits: int = 4,
    on_progress: Callable[[Progress], None] | None = None,
) -> int:
    """Stream the triangle to a TSV file with batch-level resume.

    State file ``<out>.ckpt.json`` records the last completed batch; on
    restart, completed batches are skipped and the TSV is truncated to the
    checkpointed byte offset (torn batches are rewritten).

    Returns the number of records written.
    """
    from ..io.writer import PAIR_HEADER

    out_path = Path(out_path)
    ckpt_path = out_path.with_suffix(out_path.suffix + ".ckpt.json")

    start_batch = 0
    offset = None
    n_written = 0
    if checkpoint and ckpt_path.exists() and out_path.exists():
        state = json.loads(ckpt_path.read_text())
        start_batch = state["next_batch"]
        offset = state["byte_offset"]
        n_written = state["n_records"]
        log.info("resuming at batch %d (%d records already written)",
                 start_batch, n_written)

    if offset is None:
        fh = open(out_path, "w")
        fh.write(PAIR_HEADER + "\n")
    else:
        fh = open(out_path, "r+")
        fh.truncate(offset)
        fh.seek(offset)

    def fmt(x):
        return repr(round(float(x), ndigits))

    with fh:
        for b, rec in stream_ld_records(
            alignment, weights, site_map, cfg, mesh,
            start_batch=start_batch, on_progress=on_progress,
        ):
            lines = [
                f"{pa}\t{pb}\t{fmt(d)}\t{fmt(dp)}\t{fmt(r2)}"
                for pa, pb, d, dp, r2 in zip(
                    rec.pos_a, rec.pos_b, rec.d, rec.d_prime, rec.r2
                )
            ]
            if lines:
                fh.write("\n".join(lines) + "\n")
            n_written += len(lines)
            if checkpoint:
                fh.flush()
                ckpt_path.write_text(json.dumps({
                    "next_batch": b + 1,
                    "byte_offset": fh.tell(),
                    "n_records": n_written,
                }))
    if checkpoint and ckpt_path.exists():
        ckpt_path.unlink()
    return n_written
