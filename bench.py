#!/usr/bin/env python
"""Headline benchmark: weighted-LD site-pairs/s on one TPU chip.

Runs the full streaming engine (LdSession: Pallas fused kernel + sharded
driver + on-device compaction) on a synthetic alignment, and the native C++
SIMD/OpenMP baseline (the reference's Rust-SIMD-equivalent) on the same
distribution, then prints ONE JSON line:

    {"metric": ..., "value": pairs/s, "unit": ..., "vs_baseline": ratio}

vs_baseline = TPU pairs/s : native CPU baseline pairs/s on this host.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:  # robust to being launched from any cwd
    sys.path.insert(0, str(REPO))

N_SEQS = 1000
# S large enough that the scan splits into multiple pipelined batches: each
# batch's [K] count fetch (a ~25 ms TPU-tunnel roundtrip) then overlaps the
# next batch's compute.  A single-batch S=16,384 scan pays that latency
# un-hidden (measured 1.92 G vs 2.80 G pairs/s at S=49,152, same kernel).
S_TPU = 49152
S_CPU = 2048
R2_THRESHOLD = 0.1
TILE = None  # auto: 256 for the p=3 bench distribution on TPU
TILES_PER_BATCH = None  # auto: whole plan in one batch when HBM allows


def synthetic_alignment(rng, n_seqs, n_sites):
    """60% major allele / 30% minor / 10% missing — the reference's criterion
    bench distribution (benches/bench_weighted_pair_ld.rs:8-28)."""
    r = rng.random((n_seqs, n_sites))
    aln = np.where(r < 0.6, 0, np.where(r < 0.9, 3, 4)).astype(np.int8)
    return aln


def bench_tpu() -> tuple[float, int]:
    """One retry, but ONLY for runtime-transport failures the TPU tunnel
    actually produces (JaxRuntimeError from a dropped dispatch, OS-level
    connection errors).  Deterministic Python-side failures — shape or
    assertion bugs, tracer errors — re-raise immediately so they can
    never be papered over by a clean-looking second run."""
    try:
        return _bench_tpu_once()
    except Exception as e:
        from jax.errors import JaxRuntimeError

        transient = (JaxRuntimeError, ConnectionError, TimeoutError)
        if not isinstance(e, transient):
            raise
        print(f"[bench] transient TPU failure ({e!r}); retrying once",
              file=sys.stderr)
        return _bench_tpu_once()


def _bench_tpu_once() -> tuple[float, int]:
    import jax

    from weightedld_tpu.core.henikoff import henikoff_weights
    from weightedld_tpu.runtime.driver import DriverConfig, LdSession

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    n_sites = S_TPU if on_tpu else 1024  # CPU fallback: keep it finishable
    if not on_tpu:
        print("[bench] WARNING: no TPU detected; running the XLA engine on "
              f"CPU with S={n_sites}", file=sys.stderr)

    rng = np.random.default_rng(42)
    aln = synthetic_alignment(rng, N_SEQS, n_sites)
    import jax.numpy as jnp

    weights = np.asarray(henikoff_weights(jnp.asarray(aln)))

    cfg = DriverConfig(
        tile=TILE,
        tiles_per_shard_batch=TILES_PER_BATCH if on_tpu else 4,
        r2_threshold=R2_THRESHOLD,
        engine="auto" if on_tpu else "xla",
    )
    session = LdSession(aln, weights, np.arange(n_sites), cfg)

    # Warm-up pass (compiles everything).
    for _ in session.stream():
        pass

    n_pairs = n_sites * (n_sites - 1) // 2
    # One full scan is ~0.2 s at steady state: short enough that per-batch
    # dispatch jitter through the TPU tunnel dominates a single timing.
    # Each sample therefore times several back-to-back scans.
    scans_per_sample = 3 if on_tpu else 1
    best = 0.0
    for _ in range(3):
        t0 = time.monotonic()
        total = 0
        for _ in range(scans_per_sample):
            for _, rec in session.stream():
                total += len(rec)
        dt = time.monotonic() - t0
        best = max(best, scans_per_sample * n_pairs / dt)
    print(f"[bench] tpu: {best:,.0f} pairs/s "
          f"({total // scans_per_sample} records emitted per scan)",
          file=sys.stderr)
    return best, n_sites


def _native_bench(n_seqs: int, n_sites: int) -> dict | None:
    """Run the native C++ baseline's --bench mode (auto-building it once);
    returns its stats dict or None."""
    exe = REPO / "native" / "weighted_ld_baseline"
    if not exe.exists():
        try:
            # Build only the baseline binary: the default target also links
            # libwldio.so against zlib, which the bench does not need.
            subprocess.run(
                ["make", "-C", str(REPO / "native"), "weighted_ld_baseline"],
                check=True, capture_output=True, timeout=120)
        except Exception as e:
            print(f"[bench] native baseline build failed: {e}", file=sys.stderr)
            return None
    try:
        out = subprocess.run(
            [str(exe), "--bench", str(n_seqs), str(n_sites)],
            capture_output=True, text=True, timeout=600, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])
    except Exception as e:
        print(f"[bench] native baseline run failed: {e}", file=sys.stderr)
        return None


def bench_cpu_baseline() -> float | None:
    # Best of 3: the 2-vCPU host is shared and single runs vary up to
    # ~30% under interference — the TPU side is also best-of-N, so the
    # ratio should compare both at their least-disturbed.
    best = None
    threads = None
    for _ in range(3):
        stats = _native_bench(N_SEQS, S_CPU)
        if stats is None:
            break
        if best is None or stats["pairs_per_s"] > best:
            best = float(stats["pairs_per_s"])
            threads = stats["threads"]
    if best is None:
        return None
    print(f"[bench] cpu baseline: {best:,.0f} pairs/s "
          f"({threads} threads, best of 3)", file=sys.stderr)
    return best


SWEEP_N = (10, 50, 100, 250, 500, 1000)


def bench_sweep() -> int:
    """Criterion-parity sequence-count sweep (reference
    ``benches/bench_weighted_pair_ld.rs:30-53``: n_seqs in {10..1000} on the
    60% major / 30% minor / 10% missing distribution).  The reference
    measures one pair-kernel call; the TPU analog is the full streaming
    session, reported as pairs/s and element-throughput (pairs/s * N, the
    criterion ``Throughput::Elements`` equivalent)."""
    import jax
    import jax.numpy as jnp

    from weightedld_tpu.core.henikoff import henikoff_weights
    from weightedld_tpu.runtime.driver import DriverConfig, LdSession

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    # Headline S: at smaller S (measured at 4,096) every N flatlines at the
    # ~60 ms per-scan dispatch latency of the TPU tunnel, hiding the
    # kernel's N-scaling.
    n_sites = S_TPU if on_tpu else 512
    n_pairs = n_sites * (n_sites - 1) // 2
    rows = []
    for n in SWEEP_N:
        rng = np.random.default_rng(42)
        aln = synthetic_alignment(rng, n, n_sites)
        weights = np.asarray(henikoff_weights(jnp.asarray(aln)))
        session = LdSession(
            aln, weights, np.arange(n_sites),
            DriverConfig(r2_threshold=R2_THRESHOLD,
                         engine="auto" if on_tpu else "xla"),
        )
        session.summarize()  # warm-up/compile
        best = 0.0
        for _ in range(3):
            # Reduction-only scans (the criterion bench measures the pair
            # kernel, not record extraction — small-N noise floods any r2
            # threshold with records).  Loop >= ~0.5 s per sample to
            # amortize per-scan dispatch latency through the TPU tunnel.
            t0 = time.monotonic()
            scans = 0
            while True:
                session.summarize()
                scans += 1
                dt = time.monotonic() - t0
                if dt >= 0.5:
                    break
            best = max(best, scans * n_pairs / dt)
        stats = _native_bench(n, min(n_sites, 2048))
        native = float(stats["pairs_per_s"]) if stats else None
        rows.append({"n_seqs": n, "pairs_per_s": round(best),
                     "elements_per_s": round(best * n),
                     "native_pairs_per_s": round(native) if native else None,
                     "vs_native": round(best / native, 2) if native else None})
        print(f"[sweep] N={n:5d}: {best:14,.0f} pairs/s"
              + (f"  (native {native:12,.0f}, {best / native:7.1f}x)"
                 if native else ""), file=sys.stderr)
    print(json.dumps({"metric": "weighted_ld_pairs_per_s_sweep",
                      "n_sites": n_sites, "rows": rows}))
    return 0


def main() -> int:
    if "--sweep" in sys.argv:
        return bench_sweep()
    tpu, n_sites = bench_tpu()
    cpu = bench_cpu_baseline()
    result = {
        "metric": "weighted_ld_site_pairs_per_s_per_chip",
        "value": round(tpu),
        "unit": "pairs/s",
        "vs_baseline": round(tpu / cpu, 2) if cpu else None,
        "config": {
            "n_seqs": N_SEQS,
            "n_sites": n_sites,
            "r2_threshold": R2_THRESHOLD,
            "tile": TILE or "auto",
            "baseline": "native C++ -march=native -fopenmp (Rust-SIMD-equivalent)"
            if cpu else "unavailable",
            "cpu_baseline_pairs_per_s": round(cpu) if cpu else None,
            # The baseline runs at a smaller S (its per-pair cost is O(N),
            # S-independent; a full S=49k triangle would take ~6 min on 2
            # vCPUs) — recorded so the ratio is traceable.
            "cpu_baseline_n_sites": S_CPU if cpu else None,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
