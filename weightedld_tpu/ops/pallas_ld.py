"""Fused Pallas TPU kernel for the weighted-LD pair tile.

Why a kernel: the XLA path materializes the [K, T, T, P, P] joint allele
tables in HBM between the MXU contraction and the element-wise finalization,
making the whole pipeline HBM-bound (~8 M pairs/s/chip measured).  This
kernel keeps everything for one site-pair tile resident in VMEM: HBM traffic
per tile is two (T x Nc) int8 code blocks per chunk plus the T x T outputs,
so arithmetic intensity is thousands of FLOPs/byte and the kernel is
MXU-bound at large N (measured ~3.8 G pairs/s/chip at the N=1k headline
under the int8x3 default, ~84% of the pass-count roofline at N=10k on
v5e — see PERF.md).

Data layout: the alignment is stored SITE-MAJOR ([S_pad, N_pad] int8) — the
same layout insight as the reference's ``SiteSet`` (``lib.rs:158-197``) —
padded with code 5 (contributes to no one-hot plane) and weight 0.

Grid = (tile_pair, sequence_chunk), chunk axis minor; the P-plane one-hot
matrices X (A-side) and Y (B-side) are built in VMEM per chunk and
contracted on the MXU with joint-table accumulators persisting across the
chunk axis:

  Jw += (X*w_hi) @ Y^T [+ (X*w_lo) @ Y^T]   bf16, f32 accumulation
  Ma += X8 @ v(B)^T ; Mb += v(A) @ Y8^T      int8 -> int32, exact

where ``v(.)`` is the (T x Nc) validity plane (code != UNKNOWN).  The
finalization needs the *unweighted* joint table only through its per-pair
marginal counts (the reference's post-filter allele counts,
``WeightedLD.py:194-211``), and the marginal of the joint over B's alleles
is exactly ``#{A==s and B valid}`` — so two (pT x T) contractions replace
the (pT x pT) joint at ``2/p`` of its FLOPs (exact, bit-identical counts).
The unit-weight kernel still forms the full joint (its 4-cell selection
reads individual joint entries).

``w = w_hi + w_lo`` is the split-bf16 weight decomposition (~2^-17 relative
error); the one-hot planes are exact {0,1} in bf16 so each pass is exact
given its operand.  Static specializations drop passes when possible:
``exact_weights`` (weights bf16-representable) drops the w_lo pass;
``unit_weights`` (--unweighted) drops both bf16 passes (Jw == Ju);
``planes`` restricts the alphabet (binary SNP data: P=3 or 2 instead of 5,
a quadratic FLOP reduction); ``preplaned`` consumes precomputed one-hot
planes from HBM (measured neutral — kept as an experimental variant);
``wquant`` replaces the weighted passes with int8 ones (double MXU rate):
``"lo_int8"`` only the residual pass (~7.7e-6 weight error), ``"int8"``
both passes via ``w ~= a1*q1 + a2*q2`` (~1.6e-5 — 1.0 bf16-pass
equivalents), ``"int8x3"`` three cascaded int8 passes (~6.1e-8 = ONE f32
ulp of max|w|, i.e. numerically equivalent to the f32 weights, at 1.5
bf16-pass equivalents — tighter AND cheaper than split-bf16, see
``pad_weights_int8``).

The finalization — per-pair marginal counts, major/dominant-minor with
smallest-code tie-break, both skip rules, and the D/D'/r2 algebra — is the
same branch-free math as :func:`weightedld_tpu.core.paircore.
finalize_pair_tile` (reference semantics ``WeightedLD.py:183-284``), fused
in-kernel on the VPU.

The tile list arrives via scalar prefetch (``tile_i``, ``tile_j``, ``emit``),
so the grid walks an arbitrary (striped) slice of the upper triangle and
Pallas double-buffers the code-block DMAs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.encode import N_ALLELES, N_CODES, UNKNOWN
from ..core.paircore import PairStats

DEFAULT_SEQ_CHUNK = 512


def pad_alignment_site_major(alignment: np.ndarray, tile: int,
                             seq_chunk: int = DEFAULT_SEQ_CHUNK) -> np.ndarray:
    """``[N, S]`` sequence-major codes -> ``[S_pad, N_pad]`` site-major,
    padded with UNKNOWN (code 5) on both axes.

    Large matrices route through the native blocked OpenMP transpose
    (``wldio_transpose_pad_i8``): numpy's strided ``out[:s, :n] = a.T``
    measured 16 s on the 1 GB pod-scale matrix vs ~2 s native — the
    dominant deterministic host cost of session setup.  The numpy path
    below doubles as the parity oracle (tests/test_native_io.py)."""
    n, s = alignment.shape
    s_pad = -(-s // tile) * tile
    n_pad = -(-n // seq_chunk) * seq_chunk
    if alignment.size >= (1 << 24) and alignment.dtype == np.int8:
        from ..io import native

        if native.available():
            return native.transpose_pad_i8(alignment, s_pad, n_pad, UNKNOWN)
    out = np.full((s_pad, n_pad), UNKNOWN, dtype=np.int8)
    out[:s, :n] = alignment.T
    return out


def pad_weights(weights: np.ndarray, seq_chunk: int = DEFAULT_SEQ_CHUNK) -> np.ndarray:
    n = weights.shape[0]
    n_pad = -(-n // seq_chunk) * seq_chunk
    out = np.zeros((1, n_pad), dtype=np.float32)
    out[0, :n] = weights
    return out


def pad_weights_lo_int8(
    weights: np.ndarray, seq_chunk: int = DEFAULT_SEQ_CHUNK
) -> np.ndarray:
    """Weights packed for the ``lo_int8`` kernel variant: ``[3, N_pad]`` f32
    with row 0 = w, row 1 = q (the int8-quantized bf16 residual, stored as
    f32 and cast in-kernel), row 2 = alpha (the residual scale, broadcast).

    ``w ~= bf16(w) + alpha * q`` with per-weight absolute error
    ``<= max|w - bf16(w)| / 254 <= 2^-9/254 ~= 7.7e-6`` for max-normalized
    weights — far below the reference's 4-dp output rounding.  The residual
    MXU pass then runs int8 (double bf16 rate), cutting the weighted
    kernel from 2.5 to 2.0 bf16-pass equivalents.
    """
    import ml_dtypes

    n = weights.shape[0]
    n_pad = -(-n // seq_chunk) * seq_chunk
    w32 = np.zeros(n_pad, dtype=np.float32)
    w32[:n] = np.asarray(weights, dtype=np.float32)
    w_hi = w32.astype(ml_dtypes.bfloat16).astype(np.float32)
    w_lo = w32 - w_hi
    s = float(np.abs(w_lo).max())
    out = np.zeros((3, n_pad), dtype=np.float32)
    out[0] = w32
    if s > 0.0:
        out[1] = np.round(w_lo / s * 127.0).clip(-127, 127)
        out[2] = s / 127.0
    return out


def pad_weights_int8(
    weights: np.ndarray, seq_chunk: int = DEFAULT_SEQ_CHUNK,
    levels: int = 2,
) -> np.ndarray:
    """Weights packed for the multi-level-int8 kernel variants (ALL weight
    passes quantized): ``[2*levels, N_pad]`` f32 with rows q1..qL /
    a1..aL (the scales broadcast), where ``w ~= sum_l a_l * q_l``.

    Cascaded int8 quantization: ``a1 = max|w|/127``, ``q1 = round(w/a1)``;
    each residual ``r_l = r_{l-1} - a_l*q_l`` (``|r_l| <= a_l/2``) is
    re-quantized at the next level.  Per-weight ABSOLUTE error bounds for
    max-normalized weights:

    - ``levels=2`` (``wquant="int8"``): ``<= max|w|/64516 ~= 1.6e-5`` —
      1.0 bf16-pass equivalents.  When weights span orders of magnitude
      (t7-style VCFs, Henikoff weights 0.001..1.0) small weights lose
      relative accuracy (~1.6% at w=0.001) and 4-dp outputs can shift by
      one rounding ulp.
    - ``levels=3`` (``wquant="int8x3"``): ``<= max|w| * 2^-23.97 ~=
      6.1e-8`` — ONE f32 ulp of the max weight, i.e. at or below the f32
      representation error of the weights themselves, and ~60x tighter in
      absolute terms than split-bf16's ``2^-18 * |w|`` relative bound.
      1.5 bf16-pass equivalents (vs split-bf16's 2.0) with BETTER summed
      accuracy: the integer joints accumulate exactly and only 3 f32
      scale-combines round, vs an N-deep f32 accumulation per bf16 pass.
    """
    n = weights.shape[0]
    n_pad = -(-n // seq_chunk) * seq_chunk
    w32 = np.zeros(n_pad, dtype=np.float32)
    w32[:n] = np.asarray(weights, dtype=np.float32)
    out = np.zeros((2 * levels, n_pad), dtype=np.float32)
    r = w32.astype(np.float64)  # exact residual cascade
    for lv in range(levels):
        s = float(np.abs(r).max())
        if s <= 0.0:
            break
        # The kernel recombines with the f32-rounded scale: cascade the
        # residual against THAT value so the bound holds end-to-end.
        a = np.float32(s / 127.0)
        q = np.round(r / float(a)).clip(-127, 127)
        out[lv] = q
        out[levels + lv] = a
        r = r - float(a) * q
    return out


def _ld_kernel(tile: int, n_sites: int, planes: tuple,
               exact_weights: bool, preplaned: bool, wquant: str,
               row_pass: bool, single_chunk: bool,
               ti_ref, tj_ref, em_ref,
               a_ref, b_ref, w_ref,
               d_ref, dp_ref, r2_ref, keep_ref,
               acc_ref, ma_ref, mb_ref):
    t = tile
    p = len(planes)
    k = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    em = em_ref[k]

    # Padding tile pairs (emit == 0: shard balance / batch
    # fill / the hybrid phase layout) skip the whole body —
    # only their keep block is zeroed, so a mostly-padded
    # batch costs ~nothing instead of a full kernel pass.
    @pl.when((em == 0) & (c == n_chunks - 1))
    def _skip_keep():
        keep_ref[:, :] = jnp.zeros_like(keep_ref)

    @pl.when(em != 0)
    def _compute():
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        # Grid is (tile_pair, seq_chunk) with the chunk axis minor: the joint
        # accumulators persist across chunk steps and reset at chunk 0.  Pallas
        # streams the code/plane blocks chunk by chunk (double-buffered), so
        # VMEM use is independent of the total sequence count.
        # ``single_chunk`` (one chunk covers N_pad — the common case under the
        # auto chunk policy): store the contractions directly instead of
        # zero-init + read-modify-write accumulate, saving ~2 (pT)^2-sized VPU
        # sweeps per tile.
        if not single_chunk:
            @pl.when(c == 0)
            def _():
                acc_ref[:, :] = jnp.zeros_like(acc_ref)
                ma_ref[:, :] = jnp.zeros_like(ma_ref)
                mb_ref[:, :] = jnp.zeros_like(mb_ref)

        def dot16(x, y):
            # bf16 x bf16 -> f32-accumulated MXU contraction over the chunk axis.
            return jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

        # Validity = union of the one-hot planes, NOT (code != UNKNOWN): the
        # two coincide under detect_planes' covering invariant, but a
        # caller-restricted `planes` must exclude out-of-plane codes from the
        # per-pair counts, and identically in both input layouts.  (Mosaic has
        # no int8 vector add, so the union is bool-OR / int32-summed.)
        if preplaned:
            # One-hot planes precomputed in HBM (tile-contiguous layout): the
            # per-tile compare/widen/concat chain — about half the kernel time
            # at default sizes — disappears; only casts and weight muls remain.
            xu8 = a_ref[:, :]                  # (PT, Nc) int8
            yu8 = b_ref[:, :]

            def union(u8):
                acc = u8[0 * t:1 * t, :].astype(jnp.int32)
                for s in range(1, p):
                    acc = acc | u8[s * t:(s + 1) * t, :].astype(jnp.int32)
                return acc.astype(jnp.int8)    # (T, Nc) {0, 1}

            xv8 = union(xu8)
            yv8 = union(yu8)
        else:
            # Widen int8 codes to int32: v5e Mosaic has no int8 vector compare.
            a = a_ref[:, :].astype(jnp.int32)  # (T, Nc)
            b = b_ref[:, :].astype(jnp.int32)
            xu8 = jnp.concatenate(
                [(a == s).astype(jnp.int8) for s in planes], axis=0
            )                                  # (PT, Nc) int8
            yu8 = jnp.concatenate(
                [(b == s).astype(jnp.int8) for s in planes], axis=0
            )

            def union(v):
                acc = v == planes[0]
                for s in planes[1:]:
                    acc = acc | (v == s)
                return acc.astype(jnp.int8)    # (T, Nc) {0, 1}

            xv8 = union(a)
            yv8 = union(b)

        def dot8(x, y):
            # int8 x int8 -> int32 MXU contraction (double the bf16 rate), exact.
            return jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )

        # Weighted joint-table passes.  Three static variants (see module
        # docstring): split-bf16 (default, w = w_hi + w_lo to ~2^-17 relative
        # error — both operands exact in bf16 so each pass is exact given its
        # operand), ``lo_int8`` (residual pass int8-quantized at double MXU
        # rate), ``int8`` (BOTH passes int8: w ~= a1*q1 + a2*q2, the two integer
        # joints are exact and combine in f32 — 1.0 bf16-pass equivalents).
        # ``exact_weights`` (bf16-representable weights) drops the residual pass.
        #
        # ``row_pass`` computes and accumulates the joint one A-plane row at a
        # time — identical math and FLOPs, but peak temporaries are (T, pT)
        # instead of (pT, pT), which is what lets p>=4 alphabets fit T=256 in
        # scoped VMEM (the full-joint temporary alone is 6.55 MB at p=5).
        if wquant in ("int8", "int8x3") and not exact_weights:
            nlev = 2 if wquant == "int8" else 3
            qs = [w_ref[i:i + 1, :].astype(jnp.int32) for i in range(nlev)]
            scales = [w_ref[nlev + i, 0] for i in range(nlev)]

            def jw_rows(xs8):                     # (rows, Nc) int8 one-hot slice
                xi = xs8.astype(jnp.int32)
                acc = None
                for q, a in zip(qs, scales):
                    xq = (xi * q).astype(jnp.int8)  # one-hot * q fits int8 exactly
                    term = a * dot8(xq, yu8).astype(f32)
                    acc = term if acc is None else acc + term
                return acc
        else:
            w = w_ref[0:1, :]                     # (1, Nc) f32
            w_hi = w.astype(bf16)
            yu = yu8.astype(bf16)
            if wquant == "lo_int8" and not exact_weights:
                q8 = w_ref[1:2, :].astype(jnp.int32)      # (1, Nc) quantized w_lo
                alpha = w_ref[2, 0]

                def jw_rows(xs8):
                    xs = xs8.astype(bf16)
                    xq = (xs8.astype(jnp.int32) * q8).astype(jnp.int8)
                    return (dot16(xs * w_hi, yu)
                            + alpha * dot8(xq, yu8).astype(f32))
            elif not exact_weights:
                w_lo = (w - w_hi.astype(f32)).astype(bf16)

                def jw_rows(xs8):
                    xs = xs8.astype(bf16)
                    return dot16(xs * w_hi, yu) + dot16(xs * w_lo, yu)
            else:

                def jw_rows(xs8):
                    return dot16(xs8.astype(bf16) * w_hi, yu)

        def store(ref, idx, value):
            # single_chunk: direct store (no zero-init happened); else accumulate.
            if single_chunk:
                ref[idx] = value
            else:
                ref[idx] += value

        if row_pass:
            for s in range(p):
                store(acc_ref, np.s_[s * t:(s + 1) * t, :],
                      jw_rows(xu8[s * t:(s + 1) * t, :]))
        else:
            store(acc_ref, np.s_[:, :], jw_rows(xu8))
        # Unweighted per-pair marginal counts: two int8 contractions against the
        # validity plane at 2/p the FLOPs of the full (pT x pT) joint, exact
        # (int8 x int8 -> int32, double MXU rate).
        store(ma_ref, np.s_[:, :], dot8(xu8, yv8))  # (PT, T): #{A==s, B valid}
        store(mb_ref, np.s_[:, :], dot8(xv8, yu8))  # (T, PT): #{A valid, B==u}

        ti = ti_ref[k]
        tj = tj_ref[k]
        em = em_ref[k]

        @pl.when(c == n_chunks - 1)
        def _finalize():
            load_jw = lambda s, u, lo, hi: acc_ref[s * t + lo:s * t + hi,
                                                   u * t:(u + 1) * t]
            load_cnt_a = lambda s, lo, hi: ma_ref[s * t + lo:s * t + hi, :]
            load_cnt_b = lambda u, lo, hi: mb_ref[lo:hi, u * t:(u + 1) * t]
            _ld_finalize(tile, n_sites, planes, ti, tj, em,
                         d_ref, dp_ref, r2_ref, keep_ref, load_jw,
                         load_cnt_a, load_cnt_b)


def _ld_kernel_unit(tile: int, n_sites: int, planes: tuple, preplaned: bool,
                    single_chunk: bool,
                    ti_ref, tj_ref, em_ref,
                    a_ref, b_ref, w_ref,
                    d_ref, dp_ref, r2_ref, keep_ref,
                    acci_ref):
    """Unit-weight variant (--unweighted): the weighted joint table equals
    the unweighted one, so the bf16 passes vanish — a single int8 MXU pass
    per chunk."""
    t = tile
    p = len(planes)
    k = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    em = em_ref[k]

    # Padding tile pairs (emit == 0: shard balance / batch
    # fill / the hybrid phase layout) skip the whole body —
    # only their keep block is zeroed, so a mostly-padded
    # batch costs ~nothing instead of a full kernel pass.
    @pl.when((em == 0) & (c == n_chunks - 1))
    def _skip_keep():
        keep_ref[:, :] = jnp.zeros_like(keep_ref)

    @pl.when(em != 0)
    def _compute():

        if not single_chunk:
            @pl.when(c == 0)
            def _():
                acci_ref[:, :] = jnp.zeros_like(acci_ref)

        if preplaned:
            xu8 = a_ref[:, :]
            yu8 = b_ref[:, :]
        else:
            a = a_ref[:, :].astype(jnp.int32)
            b = b_ref[:, :].astype(jnp.int32)
            xu8 = jnp.concatenate(
                [(a == s).astype(jnp.int8) for s in planes], axis=0
            )
            yu8 = jnp.concatenate(
                [(b == s).astype(jnp.int8) for s in planes], axis=0
            )
        joint = jax.lax.dot_general(
            xu8, yu8, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        if single_chunk:
            acci_ref[:, :] = joint
        else:
            acci_ref[:, :] += joint

        ti = ti_ref[k]
        tj = tj_ref[k]
        em = em_ref[k]

        @pl.when(c == n_chunks - 1)
        def _finalize():
            load_ju = lambda s, u, lo, hi: acci_ref[s * t + lo:s * t + hi,
                                                    u * t:(u + 1) * t]
            load_jw = lambda s, u, lo, hi: load_ju(s, u, lo, hi).astype(
                jnp.float32)
            # Counts = marginals of the (already materialized) full joint.
            load_cnt_a = lambda s, lo, hi: sum(
                load_ju(s, u, lo, hi) for u in range(p))
            load_cnt_b = lambda u, lo, hi: sum(
                load_ju(s, u, lo, hi) for s in range(p))
            _ld_finalize(tile, n_sites, planes, ti, tj, em,
                         d_ref, dp_ref, r2_ref, keep_ref, load_jw,
                         load_cnt_a, load_cnt_b)


def _pair_algebra(n_mm, n_md, n_dm, n_dd, keep):
    """Branch-free D/D'/r2 from the four weighted {maj,dmin} x {maj,dmin}
    haplotype cells, plus the reference's frequency-based skip rules —
    element-wise over a pair block.  Shared by every kernel finalize
    (reference semantics ``WeightedLD.py:227-284``)."""
    total_w = n_mm + n_md + n_dm + n_dd
    keep = keep & (total_w > 0)
    safe_w = jnp.where(total_w > 0, total_w, 1.0)
    inv_w = 1.0 / safe_w

    pa_major = (n_mm + n_md) * inv_w
    pb_major = (n_mm + n_dm) * inv_w
    pa_minor = (n_dm + n_dd) * inv_w
    pb_minor = (n_md + n_dd) * inv_w
    # round(P,1)==1.0 <=> P >= double(0.95): the reference rounds a
    # np.float64, whose __round__ scales by 10 and half-evens UP at the
    # boundary — the PA == 19/20 pair is SKIPPED (see paircore).
    keep = keep & (pa_major < 0.95) & (pb_major < 0.95)
    # Zero-major-weight pairs: the reference crashes there (masked PA /
    # PB at WeightedLD.py:227-235), so they are skipped — see
    # paircore.finalize_pair_tile.  Keeps kept-pair r2 NaN-free.
    keep = keep & (n_mm + n_md > 0) & (n_mm + n_dm > 0)

    obs_mm = n_mm * inv_w
    obs_md = n_md * inv_w
    obs_dm = n_dm * inv_w
    obs_dd = n_dd * inv_w

    t0 = pa_major * pb_major - obs_mm
    t1 = pa_minor * pb_minor - obs_dd
    t2 = -(pa_major * pb_minor - obs_md)
    t3 = -(pa_minor * pb_major - obs_dm)
    d = (t0 + t1 + t2 + t3) * 0.25

    neg = jnp.maximum(-obs_dd, -obs_mm)
    neg = jnp.where(neg == 0, jnp.minimum(-obs_dd, -obs_mm), neg)
    pos = jnp.minimum(obs_dm, obs_md)
    pos = jnp.where(pos == 0, jnp.maximum(obs_dm, obs_md), pos)
    denom = jnp.where(d < 0, neg, pos)
    d_prime = d / denom

    r2 = d * d / (pa_major * pa_minor * pb_major * pb_minor)
    return d, d_prime, r2, keep


def _ld_finalize(tile: int, n_sites: int, planes: tuple,
                 ti, tj, em,
                 d_ref, dp_ref, r2_ref, keep_ref,
                 load_jw, load_cnt_a, load_cnt_b, row_chunk: int = 128):
    """Branch-free per-pair finalization, processed in row chunks of the
    tile so peak VPU temporaries stay bounded for large T (every quantity
    here is element-wise per site pair, so row slicing is exact)."""
    t = tile
    p = len(planes)
    f32 = jnp.float32
    rc = min(row_chunk, t)

    for lo in range(0, t, rc):
        hi = lo + rc
        jw = [[load_jw(s, u, lo, hi) for u in range(p)] for s in range(p)]

        # Per-pair post-filter allele counts (the reference recomputes them
        # per pair via np.unique, WeightedLD.py:194-211): cnt_a[s] =
        # #{A==planes[s], B valid}, cnt_b[u] = #{A valid, B==planes[u]} —
        # the marginals of the unweighted joint over the other site's
        # alleles, delivered by the loaders as (rc, t) int32 planes.
        cnt_a = [load_cnt_a(s, lo, hi) for s in range(p)]  # int32
        cnt_b = [load_cnt_b(u, lo, hi) for u in range(p)]

        def major_dmin(cnt):
            # integer score = 8*count + (5 - symbol code): ties -> lower
            # code (WeightedLD.py:203-209).
            best = jnp.full((rc, t), -1, jnp.int32)
            best_idx = jnp.zeros((rc, t), jnp.int32)
            for s in range(p):
                score = cnt[s] * 8 + (N_ALLELES - planes[s])
                better = score > best
                best = jnp.where(better, score, best)
                best_idx = jnp.where(better, s, best_idx)
            second = jnp.full((rc, t), -1, jnp.int32)
            second_idx = jnp.zeros((rc, t), jnp.int32)
            for s in range(p):
                score = cnt[s] * 8 + (N_ALLELES - planes[s])
                not_best = best_idx != s
                better = (score > second) & not_best
                second = jnp.where(better, score, second)
                second_idx = jnp.where(better, s, second_idx)
            return best_idx, second_idx

        maj_a, dmin_a = major_dmin(cnt_a)
        maj_b, dmin_b = major_dmin(cnt_b)

        distinct_a = sum((cnt_a[s] > 0).astype(jnp.int32) for s in range(p))
        distinct_b = sum((cnt_b[s] > 0).astype(jnp.int32) for s in range(p))
        keep = (distinct_a > 1) & (distinct_b > 1)  # WeightedLD.py:196-201

        # Select the four {maj,dmin} x {maj,dmin} cells of the weighted joint.
        zero = jnp.zeros((rc, t), f32)
        row_maj = [zero] * p
        row_dmin = [zero] * p
        for u in range(p):
            rm, rd = zero, zero
            for s in range(p):
                rm = rm + jw[s][u] * (maj_a == s).astype(f32)
                rd = rd + jw[s][u] * (dmin_a == s).astype(f32)
            row_maj[u] = rm
            row_dmin[u] = rd
        n_mm = n_md = n_dm = n_dd = zero
        for u in range(p):
            selb_m = (maj_b == u).astype(f32)
            selb_d = (dmin_b == u).astype(f32)
            n_mm = n_mm + row_maj[u] * selb_m
            n_md = n_md + row_maj[u] * selb_d
            n_dm = n_dm + row_dmin[u] * selb_m
            n_dd = n_dd + row_dmin[u] * selb_d

        d, d_prime, r2, keep = _pair_algebra(n_mm, n_md, n_dm, n_dd, keep)

        # Pair validity: strict upper triangle of true sites + emit flag.
        gi = ti * t + lo + jax.lax.broadcasted_iota(jnp.int32, (rc, t), 0)
        gj = tj * t + jax.lax.broadcasted_iota(jnp.int32, (rc, t), 1)
        keep = keep & (gi < gj) & (gj < n_sites) & (em != 0)

        d_ref[0, lo:hi, :] = d
        dp_ref[0, lo:hi, :] = d_prime
        r2_ref[0, lo:hi, :] = r2
        keep_ref[0, lo:hi, :] = keep.astype(jnp.int8)


ALL_PLANES = (0, 1, 2, 3, 4)


def vmem_capable() -> bool:
    """True when the attached device can take the 64 MB per-kernel
    scoped-VMEM raise and the large auto tile/chunk rules built on it.

    TPU v4 and later (v4/v5e/v5p/v6e, and the v5e behind the axon tunnel)
    have 128 MiB physical VMEM per core; v2/v3 have only 16 MiB, where the
    raised limit exceeds hardware and Mosaic compilation can fail with no
    fallback — those generations keep the conservative defaults
    (T=128, seq_chunk <= 512, no limit raise).  Non-TPU backends run the
    kernel in interpret mode, where no Mosaic VMEM constraint exists."""
    d = jax.devices()[0]
    if d.platform not in ("tpu", "axon"):
        return True
    kind = d.device_kind.lower()
    return not ("v2" in kind or "v3" in kind)


def detect_planes_unknown(alignment: np.ndarray) -> tuple:
    """``(planes, has_unknown)``: the allele planes actually present (codes
    0..4) and whether any UNKNOWN (code 5) cell exists.

    SNP matrices from VCFs are usually {0, 1, 4}: dropping absent planes
    shrinks the contraction quadratically (3 planes = 36% of the 5-plane
    FLOPs) with bit-identical results, since absent alleles have zero counts
    everywhere and can never be selected as major/dominant-minor.

    ``has_unknown`` gates the factorized major/dmin kernel
    (:func:`pallas_tile_stats_majmin`): with no UNKNOWN anywhere, the
    reference's per-pair allele recomputation (``WeightedLD.py:183-211``)
    degenerates to per-site quantities — see that kernel's docstring.
    """
    # Presence scan, chunked with early exit once every code is seen.
    # Measured on the 1 GB pod-scale matrix this runs on at session setup:
    # ~0.1-2 s, vs 17 s for np.bincount (which expands int8 to int64
    # internally) and ~60 s+ for sort-based np.unique.
    n_rows = alignment.shape[0]
    row_bytes = max(1, alignment.shape[1] if alignment.ndim > 1 else 1)
    step = max(1, (1 << 24) // row_bytes)          # ~16 MB row chunks
    found = [False] * N_CODES
    for lo in range(0, n_rows, step):
        chunk = alignment[lo:lo + step]
        for c in range(N_CODES):
            if not found[c] and (chunk == c).any():
                found[c] = True
        if all(found):
            break
    planes = tuple(c for c in range(N_ALLELES) if found[c])
    if len(planes) < 2:
        planes = ALL_PLANES  # degenerate input; keep the general kernel
    return planes, found[UNKNOWN]


def detect_planes(alignment: np.ndarray) -> tuple:
    """Allele planes actually present (codes 0..4) — see
    :func:`detect_planes_unknown`."""
    return detect_planes_unknown(alignment)[0]


def weights_bf16_exact(weights: np.ndarray) -> bool:
    """True when every weight is exactly representable in bf16 (unit weights,
    simple fractions): enables the 2-pass kernel variant."""
    w = np.asarray(weights, dtype=np.float32)
    import ml_dtypes

    return bool((w.astype(ml_dtypes.bfloat16).astype(np.float32) == w).all())


@partial(jax.jit, static_argnames=("tile", "planes"))
def build_planes_tiled(codes_sm: jnp.ndarray, *, tile: int,
                       planes: tuple = ALL_PLANES) -> jnp.ndarray:
    """Precompute one-hot planes in the kernel's tile-contiguous layout.

    ``[S_pad, N_pad]`` int8 codes -> ``[grid * P * T, N_pad]`` int8 where
    rows ``[g*P*T + s*T + i]`` hold ``codes[g*T+i] == planes[s]`` — so the
    (P*T, Nc) X/Y matrix of any site tile is one contiguous block.
    Costs P x the code memory; built once per session on device.
    """
    s_pad, n_pad = codes_sm.shape
    grid = s_pad // tile
    p = len(planes)
    oh = jnp.stack(
        [(codes_sm == codes_sm.dtype.type(s)).astype(jnp.int8) for s in planes],
        axis=1,
    )                                     # [S_pad, P, N_pad]
    return oh.reshape(grid, tile, p, n_pad).transpose(0, 2, 1, 3).reshape(
        grid * p * tile, n_pad
    )


@partial(jax.jit, static_argnames=("tile", "n_sites", "seq_chunk", "planes",
                                   "exact_weights", "unit_weights",
                                   "preplaned", "wquant", "interpret"))
def pallas_tile_stats(
    codes_sm: jnp.ndarray,     # [S_pad, N_pad] int8 site-major codes, or
                               # [grid*P*T, N_pad] planes when preplaned=True
    weights_row: jnp.ndarray,  # [1, N_pad] f32 ([3, N_pad] when wquant=
                               # "lo_int8": rows w / q / alpha; [4, N_pad]
                               # when wquant="int8": rows q1 / q2 / a1 / a2;
                               # [6, N_pad] when wquant="int8x3": rows
                               # q1..q3 / a1..a3, from
                               # pad_weights_int8(levels=3))
    tile_i: jnp.ndarray,       # [K] int32
    tile_j: jnp.ndarray,       # [K] int32
    emit: jnp.ndarray,         # [K] int32 (0/1)
    *,
    tile: int,
    n_sites: int,
    seq_chunk: int = DEFAULT_SEQ_CHUNK,
    planes: tuple = ALL_PLANES,
    exact_weights: bool = False,
    unit_weights: bool = False,
    preplaned: bool = False,
    wquant: str = "",
    interpret: bool = False,
) -> PairStats:
    """Fused-kernel equivalent of ``tile_stats_batch`` (same contract).

    ``wquant`` selects the weighted-pass arithmetic: ``""`` = split-bf16,
    ``"lo_int8"`` = int8 residual pass, ``"int8"`` = both passes int8,
    ``"int8x3"`` = the 3-level cascade (full accuracy, what the driver
    uses by default; see the ``pad_weights*`` packers for layouts and
    error bounds)."""
    k = tile_i.shape[0]
    n_pad = codes_sm.shape[1]
    t = tile
    p = len(planes)
    assert n_pad % seq_chunk == 0
    n_chunks = n_pad // seq_chunk

    in_rows = p * t if preplaned else t
    w_rows = weights_row.shape[0]
    expect_rows = 1
    if not unit_weights and not exact_weights:
        expect_rows = {"": 1, "lo_int8": 3, "int8": 4, "int8x3": 6}[wquant]
    assert w_rows == expect_rows, (
        "weights layout does not match the wquant mode"
    )
    out_block = pl.BlockSpec((1, t, t), lambda g, c, ti, tj, em: (g, 0, 0))
    single_chunk = n_chunks == 1
    if unit_weights:
        kernel = partial(_ld_kernel_unit, t, n_sites, planes, preplaned,
                         single_chunk)
        scratch = [pltpu.VMEM((p * t, p * t), jnp.int32)]
    else:
        # Row-pass accumulation once the full-joint temporary would be
        # large: p*T > 768 keeps peak temporaries at (T, pT) for p>=4
        # alphabets at T=256.
        row_pass = p * t > 768
        kernel = partial(_ld_kernel, t, n_sites, planes, exact_weights,
                         preplaned, wquant, row_pass, single_chunk)
        scratch = [
            pltpu.VMEM((p * t, p * t), jnp.float32),   # weighted joint acc
            pltpu.VMEM((p * t, t), jnp.int32),  # count marginal #{A==s,B valid}
            pltpu.VMEM((t, p * t), jnp.int32),  # count marginal #{A valid,B==u}
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k, n_chunks),
        in_specs=[
            pl.BlockSpec((in_rows, seq_chunk),
                         lambda g, c, ti, tj, em: (ti[g], c)),
            pl.BlockSpec((in_rows, seq_chunk),
                         lambda g, c, ti, tj, em: (tj[g], c)),
            pl.BlockSpec((w_rows, seq_chunk), lambda g, c, ti, tj, em: (0, c)),
        ],
        out_specs=[out_block, out_block, out_block, out_block],
        scratch_shapes=scratch,
    )

    out_shape = [
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.int8),
    ]

    # The default scoped-VMEM budget is 16 MB (soft; v4+ have 128 MB
    # physical).  Wide sequence chunks (the auto policy's main win) push
    # the working set past it — raise the per-kernel limit with headroom.
    # (Kept well under physical so Mosaic's DMA pipelining still has
    # space.)  Gated on device generation: on v2/v3 (16 MiB physical) the
    # raise would exceed hardware, so those keep the Mosaic default (and
    # the auto tile/chunk rules keep their working sets under it — see
    # resolve_tile / resolve_seq_chunk).
    params = None
    if not interpret and vmem_capable():
        # jax renamed TPUCompilerParams -> CompilerParams (~0.6); support
        # the declared jax floor by taking whichever exists.
        cp = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
        params = cp(vmem_limit_bytes=64 * 1024 * 1024)
    d, dp, r2, keep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(tile_i, tile_j, emit, codes_sm, codes_sm, weights_row)

    return PairStats(d=d, d_prime=dp, r2=r2, keep=keep.astype(bool))


# ---------------------------------------------------------------------------
# Factorized major/dmin kernel (inputs with no UNKNOWN code anywhere)
# ---------------------------------------------------------------------------


def majmin_safe_with_unknown(alignment: np.ndarray | None,
                             counts: np.ndarray | None = None,
                             n_seqs: int | None = None) -> bool:
    """True when the factorized kernel is exact DESPITE UNKNOWN cells.

    For a pair (i, j) the reference drops sequences with UNKNOWN at either
    site before recomputing major/dmin (``WeightedLD.py:183-211``).  Site
    i's per-pair counts therefore differ from its global counts by at most
    ``U_max = max_j #UNKNOWN(site j)`` decrements spread over its codes.
    The per-site major/dmin identities — and the distinct>1 verdict — are
    stable under ANY such removal when, per site, with descending counts
    ``c1 >= c2 >= c3`` over codes 0..4:

    * ``c2 == 0``: the site is monomorphic and every pair touching it is
      skipped either way (removals cannot create new alleles); or
    * ``c1 - c2 > U_max`` (major cannot be overtaken, nor tie) and
      ``c2 - c3 > U_max`` (the dominant minor cannot be overtaken; it also
      keeps ``c2' > 0``, preserving distinct > 1).

    The weighted {maj,dmin} cells are exact automatically: the maj/dmin
    indicator of a site already excludes that site's UNKNOWNs, and a
    sequence UNKNOWN at the other site fails that side's indicator — so
    given stable maj/dmin the factorized cells equal the general kernel's
    selected cells bit-for-bit.
    """
    from ..core.sites import site_histogram_host

    if counts is None:
        counts = site_histogram_host(alignment)
    counts = counts.astype(np.int64)
    if n_seqs is None:
        n_seqs = alignment.shape[0]  # counts-only callers pass it explicitly
    u_max = int((n_seqs - counts.sum(axis=1)).max())
    if u_max == 0:
        return True  # no UNKNOWN anywhere: nothing is ever removed
    top = np.sort(counts, axis=1)[:, ::-1]                      # desc
    c1, c2, c3 = top[:, 0], top[:, 1], top[:, 2]
    safe = (c2 == 0) | ((c1 - c2 > u_max) & (c2 - c3 > u_max))
    return bool(safe.all())


def majmin_site_aux(alignment: np.ndarray, s_pad: int,
                    counts: np.ndarray | None = None,
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Per-site (major, dominant-minor, distinct) triples for the
    factorized kernel, from the host alignment.

    Semantics are exactly the in-kernel ``major_dmin`` rule: integer score
    ``8 * count + (5 - code)`` over codes 0..4, argmax for major, argmax
    excluding it for the dominant minor — count ties break to the SMALLER
    code (the deterministic rule of this framework; the reference's
    per-pair pick at ties is unspecified, SURVEY §2.4.11).

    Returns ``(auxc [s_pad, 3] int32, auxr [3, s_pad] int32)`` — the same
    data in column layout (per-row broadcast for the one-hot builds) and
    row layout (per-column broadcast for the B-side finalize tests).
    Padded sites carry distinct == 0, so every pair touching them is
    dropped in-kernel."""
    if counts is None:
        from ..core.sites import site_histogram_host

        counts = site_histogram_host(alignment)
    counts = counts.astype(np.int64)                            # [S, 5]
    s = counts.shape[0]
    score = counts * 8 + (N_ALLELES - np.arange(N_ALLELES))[None, :]
    maj = score.argmax(axis=1)
    score[np.arange(s), maj] = -1
    dmin = score.argmax(axis=1)
    auxc = np.zeros((s_pad, 3), dtype=np.int32)
    auxc[:s, 0] = maj
    auxc[:s, 1] = dmin
    auxc[:s, 2] = (counts > 0).sum(axis=1)
    return auxc, np.ascontiguousarray(auxc.T)


def _ld_kernel_mm(tile: int, n_sites: int, exact_weights: bool, wquant: str,
                  unit_weights: bool, single_chunk: bool,
                  ti_ref, tj_ref, em_ref,
                  a_ref, b_ref, w_ref, auxa_ref, auxb_ref, auxr_ref,
                  d_ref, dp_ref, r2_ref, keep_ref,
                  acc_ref):
    t = tile
    k = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    em = em_ref[k]

    # Padding tile pairs (emit == 0: shard balance / batch
    # fill / the hybrid phase layout) skip the whole body —
    # only their keep block is zeroed, so a mostly-padded
    # batch costs ~nothing instead of a full kernel pass.
    @pl.when((em == 0) & (c == n_chunks - 1))
    def _skip_keep():
        keep_ref[:, :] = jnp.zeros_like(keep_ref)

    @pl.when(em != 0)
    def _compute():
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        if not single_chunk:
            @pl.when(c == 0)
            def _():
                acc_ref[:, :] = jnp.zeros_like(acc_ref)

        # Build the PER-SITE-selected one-hot planes: row i of xcat's top half
        # is the major-allele indicator of site i, bottom half the
        # dominant-minor indicator (one broadcast compare each — no P-plane
        # sweep, no validity union).  The int32 widen is load-bearing:
        # Mosaic on v5e rejects int8 vector compares ("Target does not
        # support this comparison", measured round 3 — PERF.md dead ends).
        a = a_ref[:, :].astype(jnp.int32)          # (T, Nc)
        b = b_ref[:, :].astype(jnp.int32)
        xcat = jnp.concatenate([
            (a == auxa_ref[:, 0:1]).astype(jnp.int8),
            (a == auxa_ref[:, 1:2]).astype(jnp.int8),
        ], axis=0)                                  # (2T, Nc)
        ycat = jnp.concatenate([
            (b == auxb_ref[:, 0:1]).astype(jnp.int8),
            (b == auxb_ref[:, 1:2]).astype(jnp.int8),
        ], axis=0)

        def dot8(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
            )

        def dot16(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

        # ONE (2T x 2T) contraction block per weight pass delivers all four
        # {maj,dmin} x {maj,dmin} weighted haplotype cells — the same static
        # weight-arithmetic variants as the general kernel (module docstring),
        # with identical per-cell values (same integer joints / bf16 products,
        # same f32 combine order).
        if unit_weights:
            # Counts <= N < 2^24: exact in the f32 accumulator.
            cells = dot8(xcat, ycat).astype(f32)
        elif wquant in ("int8", "int8x3") and not exact_weights:
            nlev = 2 if wquant == "int8" else 3
            xi = xcat.astype(jnp.int32)
            cells = None
            for i in range(nlev):
                q = w_ref[i:i + 1, :].astype(jnp.int32)
                xq = (xi * q).astype(jnp.int8)      # one-hot * q fits int8
                term = w_ref[nlev + i, 0] * dot8(xq, ycat).astype(f32)
                cells = term if cells is None else cells + term
        else:
            w = w_ref[0:1, :]                       # (1, Nc) f32
            w_hi = w.astype(bf16)
            xs = xcat.astype(bf16)
            yu = ycat.astype(bf16)
            if wquant == "lo_int8" and not exact_weights:
                q8 = w_ref[1:2, :].astype(jnp.int32)
                xq = (xcat.astype(jnp.int32) * q8).astype(jnp.int8)
                cells = (dot16(xs * w_hi, yu)
                         + w_ref[2, 0] * dot8(xq, ycat).astype(f32))
            elif not exact_weights:
                w_lo = (w - w_hi.astype(f32)).astype(bf16)
                cells = dot16(xs * w_hi, yu) + dot16(xs * w_lo, yu)
            else:
                cells = dot16(xs * w_hi, yu)

        if single_chunk:
            acc_ref[:, :] = cells
        else:
            acc_ref[:, :] += cells

        ti = ti_ref[k]
        tj = tj_ref[k]
        em = em_ref[k]

        @pl.when(c == n_chunks - 1)
        def _finalize():
            rc = min(128, t)
            dist_b = auxr_ref[2:3, :] > 1           # (1, T)
            for lo in range(0, t, rc):
                hi = lo + rc
                n_mm = acc_ref[lo:hi, 0:t]
                n_md = acc_ref[lo:hi, t:2 * t]
                n_dm = acc_ref[t + lo:t + hi, 0:t]
                n_dd = acc_ref[t + lo:t + hi, t:2 * t]
                # The monomorphic-pair skip (WeightedLD.py:196-201) is per-site
                # here (precondition: no UNKNOWN -> per-pair counts == per-site
                # counts); padded sites carry distinct == 0.
                keep = (auxa_ref[lo:hi, 2:3] > 1) & dist_b
                d, d_prime, r2, keep = _pair_algebra(n_mm, n_md, n_dm, n_dd,
                                                     keep)
                gi = (ti * t + lo
                      + jax.lax.broadcasted_iota(jnp.int32, (rc, t), 0))
                gj = tj * t + jax.lax.broadcasted_iota(jnp.int32, (rc, t), 1)
                keep = keep & (gi < gj) & (gj < n_sites) & (em != 0)
                d_ref[0, lo:hi, :] = d
                dp_ref[0, lo:hi, :] = d_prime
                r2_ref[0, lo:hi, :] = r2
                keep_ref[0, lo:hi, :] = keep.astype(jnp.int8)


@partial(jax.jit, static_argnames=("tile", "n_sites", "seq_chunk",
                                   "exact_weights", "unit_weights",
                                   "wquant", "interpret"))
def pallas_tile_stats_majmin(
    codes_sm: jnp.ndarray,     # [S_pad, N_pad] int8 site-major codes
    weights_row: jnp.ndarray,  # same wquant-dependent layout as
                               # pallas_tile_stats
    auxc: jnp.ndarray,         # [S_pad, 3] int32 (major, dmin, distinct)
    auxr: jnp.ndarray,         # [3, S_pad] int32 — the same, row layout
    tile_i: jnp.ndarray,       # [K] int32
    tile_j: jnp.ndarray,       # [K] int32
    emit: jnp.ndarray,         # [K] int32 (0/1)
    *,
    tile: int,
    n_sites: int,
    seq_chunk: int = DEFAULT_SEQ_CHUNK,
    exact_weights: bool = False,
    unit_weights: bool = False,
    wquant: str = "",
    interpret: bool = False,
) -> PairStats:
    """Factorized major/dmin kernel: same contract as
    :func:`pallas_tile_stats`.  Precondition: either the alignment has no
    UNKNOWN (code 5) anywhere — true for every VCF-derived matrix (codes
    0..4 by construction) and for FASTA alignments without ambiguity
    characters — or every dispatched tile pair's UNKNOWN removals provably
    cannot change any pair's major/dmin/distinct (the hybrid path's
    per-site :func:`majmin_safe_with_unknown` / per-tile
    :func:`majmin_tile_margins` proofs).

    Why it exists: the reference recomputes each pair's major/dominant-
    minor alleles after dropping sequences with UNKNOWN at either site
    (``WeightedLD.py:183-211``).  With no UNKNOWN anywhere, nothing is
    ever dropped, so the per-pair counts equal the per-site counts and
    major/dmin become PER-SITE properties (precomputed once by
    :func:`majmin_site_aux`).  The D/D'/r2 algebra needs the weighted
    joint only at the four {maj,dmin} x {maj,dmin} cells, which then
    factor into ONE (2T x 2T) MXU contraction per weight pass —
    independent of the alphabet size — instead of the general kernel's
    (pT x pT) joint plus two count-marginal passes and a P^2 VPU
    selection sweep.  At p=5 that is a 6.25x MXU FLOP reduction (12.5/2
    vs 37.5+5 bf16-pass cell-units under int8x3); at the p=3 SNP
    distribution still ~2.6x.  Cell values are bit-identical to the
    general kernel's selected cells (same integer joints / bf16 products,
    same f32 combine order).
    """
    k = tile_i.shape[0]
    n_pad = codes_sm.shape[1]
    t = tile
    assert n_pad % seq_chunk == 0
    n_chunks = n_pad // seq_chunk

    w_rows = weights_row.shape[0]
    expect_rows = 1
    if not unit_weights and not exact_weights:
        expect_rows = {"": 1, "lo_int8": 3, "int8": 4, "int8x3": 6}[wquant]
    assert w_rows == expect_rows, (
        "weights layout does not match the wquant mode"
    )
    out_block = pl.BlockSpec((1, t, t), lambda g, c, ti, tj, em: (g, 0, 0))
    single_chunk = n_chunks == 1
    kernel = partial(_ld_kernel_mm, t, n_sites, exact_weights, wquant,
                     unit_weights, single_chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k, n_chunks),
        in_specs=[
            pl.BlockSpec((t, seq_chunk), lambda g, c, ti, tj, em: (ti[g], c)),
            pl.BlockSpec((t, seq_chunk), lambda g, c, ti, tj, em: (tj[g], c)),
            pl.BlockSpec((w_rows, seq_chunk), lambda g, c, ti, tj, em: (0, c)),
            pl.BlockSpec((t, 3), lambda g, c, ti, tj, em: (ti[g], 0)),
            pl.BlockSpec((t, 3), lambda g, c, ti, tj, em: (tj[g], 0)),
            pl.BlockSpec((3, t), lambda g, c, ti, tj, em: (0, tj[g])),
        ],
        out_specs=[out_block, out_block, out_block, out_block],
        scratch_shapes=[pltpu.VMEM((2 * t, 2 * t), jnp.float32)],
    )

    out_shape = [
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.int8),
    ]

    params = None
    if not interpret and vmem_capable():
        cp = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
        params = cp(vmem_limit_bytes=64 * 1024 * 1024)
    d, dp, r2, keep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(tile_i, tile_j, emit, codes_sm, codes_sm, weights_row,
      auxc, auxc, auxr)

    return PairStats(d=d, d_prime=dp, r2=r2, keep=keep.astype(bool))


@partial(jax.jit, static_argnames=("tile",))
def build_majmin_planes(codes_sm: jnp.ndarray, auxc: jnp.ndarray, *,
                        tile: int) -> jnp.ndarray:
    """Precompute the factorized kernel's maj/dmin indicator planes in its
    tile-contiguous layout (the majmin analog of :func:`build_planes_tiled`).

    ``[S_pad, N_pad]`` int8 codes + ``[S_pad, 3]`` aux -> ``[2*S_pad,
    N_pad]`` int8 where rows ``[g*2T + i]`` hold ``codes[g*T+i] ==
    major(site)`` and rows ``[g*2T + T + i]`` the dominant-minor
    indicator — the (2T, Nc) X/Y matrix of any site tile is one
    contiguous block.  2x the code memory; built once per session on
    device."""
    s_pad, n_pad = codes_sm.shape
    grid = s_pad // tile
    c32 = codes_sm.astype(jnp.int32)
    cat = jnp.stack([
        (c32 == auxc[:, 0:1]).astype(jnp.int8),
        (c32 == auxc[:, 1:2]).astype(jnp.int8),
    ], axis=1)                                    # [S_pad, 2, N_pad]
    return cat.reshape(grid, tile, 2, n_pad).transpose(0, 2, 1, 3).reshape(
        grid * 2 * tile, n_pad)


@partial(jax.jit, static_argnames=("nlev",))
def build_majmin_xq(planes: jnp.ndarray, weights_row: jnp.ndarray,
                    nlev: int) -> tuple:
    """Pre-scale the maj/dmin planes by the int8 cascade's quantized
    weight rows: ``xq_i = planes * q_i`` (int8 — one-hot times int8 q
    fits), one ``[2*S_pad, N_pad]`` array per level.  With these in HBM
    the int8x3 kernel's per-grid-step work is pure MXU dots."""
    p32 = planes.astype(jnp.int32)
    return tuple(
        (p32 * weights_row[i:i + 1, :].astype(jnp.int32)).astype(jnp.int8)
        for i in range(nlev)
    )


def _ld_kernel_mm_pre(tile: int, n_sites: int, exact_weights: bool,
                      wquant: str, unit_weights: bool, single_chunk: bool,
                      nlev: int,
                      ti_ref, tj_ref, em_ref,
                      *refs):
    """Preplaned twin of :func:`_ld_kernel_mm`: the maj/dmin indicator
    planes (and, for the int8 cascades, the weight-scaled xq planes) are
    HBM inputs instead of per-step VPU builds — each grid step is the MXU
    pass(es) plus the finalize algebra only.  Measured rationale: at
    N<=1k the factorized kernel's per-step fixed VPU costs (compare /
    concat / xq build) do not amortize over one short sequence chunk
    (PERF.md round-3 MFU table, 46-50%% of roofline)."""
    # refs: nlev x xq (int8 cascades) OR 1 x planes (unit/bf16 paths),
    # then yplanes, w, auxa, auxr, d, dp, r2, keep, acc.
    n_a = nlev if (wquant in ("int8", "int8x3") and not exact_weights
                   and not unit_weights) else 1
    a_refs = refs[:n_a]
    (yb_ref, w_ref, auxa_ref, auxr_ref,
     d_ref, dp_ref, r2_ref, keep_ref, acc_ref) = refs[n_a:]
    t = tile
    k = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    em = em_ref[k]

    @pl.when((em == 0) & (c == n_chunks - 1))
    def _skip_keep():
        keep_ref[:, :] = jnp.zeros_like(keep_ref)

    @pl.when(em != 0)
    def _compute():
        f32 = jnp.float32
        bf16 = jnp.bfloat16

        if not single_chunk:
            @pl.when(c == 0)
            def _():
                acc_ref[:, :] = jnp.zeros_like(acc_ref)

        def dot8(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        def dot16(x, y):
            return jax.lax.dot_general(
                x, y, (((1,), (1,)), ((), ())), preferred_element_type=f32)

        ycat = yb_ref[:, :]                          # (2T, Nc) int8
        if unit_weights:
            cells = dot8(a_refs[0][:, :], ycat).astype(f32)
        elif wquant in ("int8", "int8x3") and not exact_weights:
            cells = None
            for i in range(nlev):
                term = w_ref[nlev + i, 0] * dot8(a_refs[i][:, :],
                                                 ycat).astype(f32)
                cells = term if cells is None else cells + term
        else:
            xcat = a_refs[0][:, :]
            w = w_ref[0:1, :]
            w_hi = w.astype(bf16)
            xs = xcat.astype(bf16)
            yu = ycat.astype(bf16)
            if wquant == "lo_int8" and not exact_weights:
                q8 = w_ref[1:2, :].astype(jnp.int32)
                xq = (xcat.astype(jnp.int32) * q8).astype(jnp.int8)
                cells = (dot16(xs * w_hi, yu)
                         + w_ref[2, 0] * dot8(xq, ycat).astype(f32))
            elif not exact_weights:
                w_lo = (w - w_hi.astype(f32)).astype(bf16)
                cells = dot16(xs * w_hi, yu) + dot16(xs * w_lo, yu)
            else:
                cells = dot16(xs * w_hi, yu)

        if single_chunk:
            acc_ref[:, :] = cells
        else:
            acc_ref[:, :] += cells

        ti = ti_ref[k]
        tj = tj_ref[k]
        em_ = em_ref[k]

        @pl.when(c == n_chunks - 1)
        def _finalize():
            rc = min(128, t)
            dist_b = auxr_ref[2:3, :] > 1           # (1, T)
            for lo in range(0, t, rc):
                hi = lo + rc
                n_mm = acc_ref[lo:hi, 0:t]
                n_md = acc_ref[lo:hi, t:2 * t]
                n_dm = acc_ref[t + lo:t + hi, 0:t]
                n_dd = acc_ref[t + lo:t + hi, t:2 * t]
                keep = (auxa_ref[lo:hi, 2:3] > 1) & dist_b
                d, d_prime, r2, keep = _pair_algebra(n_mm, n_md, n_dm, n_dd,
                                                     keep)
                gi = (ti * t + lo
                      + jax.lax.broadcasted_iota(jnp.int32, (rc, t), 0))
                gj = tj * t + jax.lax.broadcasted_iota(jnp.int32, (rc, t), 1)
                keep = keep & (gi < gj) & (gj < n_sites) & (em_ != 0)
                d_ref[0, lo:hi, :] = d
                dp_ref[0, lo:hi, :] = d_prime
                r2_ref[0, lo:hi, :] = r2
                keep_ref[0, lo:hi, :] = keep.astype(jnp.int8)


@partial(jax.jit, static_argnames=("tile", "n_sites", "seq_chunk",
                                   "exact_weights", "unit_weights",
                                   "wquant", "interpret"))
def pallas_tile_stats_majmin_pre(
    planes: jnp.ndarray,       # [2*S_pad, N_pad] int8 (build_majmin_planes)
    xq: tuple,                 # nlev x [2*S_pad, N_pad] int8
                               # (build_majmin_xq) for int8/int8x3, else ()
    weights_row: jnp.ndarray,
    auxc: jnp.ndarray,
    auxr: jnp.ndarray,
    tile_i: jnp.ndarray,
    tile_j: jnp.ndarray,
    emit: jnp.ndarray,
    *,
    tile: int,
    n_sites: int,
    seq_chunk: int = DEFAULT_SEQ_CHUNK,
    exact_weights: bool = False,
    unit_weights: bool = False,
    wquant: str = "",
    interpret: bool = False,
) -> PairStats:
    """Preplaned variant of :func:`pallas_tile_stats_majmin` — identical
    contract and bit-identical outputs (the dots consume the same int8
    operand VALUES; only where they are built differs).  Costs 2x code
    memory for the planes (plus 2x per cascade level), so the session
    gates it to small-N shapes where the per-step build is the measured
    limiter."""
    k = tile_i.shape[0]
    n_pad = planes.shape[1]
    t = tile
    assert n_pad % seq_chunk == 0
    n_chunks = n_pad // seq_chunk

    w_rows = weights_row.shape[0]
    expect_rows = 1
    if not unit_weights and not exact_weights:
        expect_rows = {"": 1, "lo_int8": 3, "int8": 4, "int8x3": 6}[wquant]
    assert w_rows == expect_rows, (
        "weights layout does not match the wquant mode"
    )
    nlev = {"int8": 2, "int8x3": 3}.get(wquant, 0)
    int8_path = (nlev > 0 and not exact_weights and not unit_weights)
    if int8_path:
        assert len(xq) == nlev
        a_arrays = tuple(xq)
    else:
        a_arrays = (planes,)
    out_block = pl.BlockSpec((1, t, t), lambda g, c, ti, tj, em: (g, 0, 0))
    single_chunk = n_chunks == 1
    kernel = partial(_ld_kernel_mm_pre, t, n_sites, exact_weights, wquant,
                     unit_weights, single_chunk, nlev)
    a_spec = pl.BlockSpec((2 * t, seq_chunk),
                          lambda g, c, ti, tj, em: (ti[g], c))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k, n_chunks),
        in_specs=(
            [a_spec] * len(a_arrays)
            + [
                pl.BlockSpec((2 * t, seq_chunk),
                             lambda g, c, ti, tj, em: (tj[g], c)),
                pl.BlockSpec((w_rows, seq_chunk),
                             lambda g, c, ti, tj, em: (0, c)),
                pl.BlockSpec((t, 3), lambda g, c, ti, tj, em: (ti[g], 0)),
                pl.BlockSpec((3, t), lambda g, c, ti, tj, em: (0, tj[g])),
            ]
        ),
        out_specs=[out_block, out_block, out_block, out_block],
        scratch_shapes=[pltpu.VMEM((2 * t, 2 * t), jnp.float32)],
    )

    out_shape = [
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.float32),
        jax.ShapeDtypeStruct((k, t, t), jnp.int8),
    ]

    params = None
    if not interpret and vmem_capable():
        cp = getattr(pltpu, "CompilerParams", None) or pltpu.TPUCompilerParams
        params = cp(vmem_limit_bytes=64 * 1024 * 1024)
    d, dp, r2, keep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=params,
    )(tile_i, tile_j, emit, *a_arrays, planes, weights_row, auxc, auxr)

    return PairStats(d=d, d_prime=dp, r2=r2, keep=keep.astype(bool))


_MARGIN_INF = np.int64(1) << 62


def majmin_tile_margins(counts: np.ndarray, n_seqs: int, tile: int,
                        grid: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-site-TILE ``(stability_margin, unknown_max)`` for the hybrid
    safe/unsafe tile-pair partition (the per-tile refinement of
    :func:`majmin_safe_with_unknown`).

    For a pair (a, b) the reference drops sequences UNKNOWN at either site
    before recomputing major/dmin (``WeightedLD.py:183-211``), so site a's
    per-pair counts differ from its global counts by at most ``u(b)``
    decrements (``u(x)`` = UNKNOWN count at site x) — NOT the global
    ``U_max``.  Site a's maj/dmin identities and its distinct>1 verdict are
    stable under any ``m`` removals when ``c2 == 0`` (monomorphic: every
    pair touching it is skipped either way) or
    ``min(c1-c2, c2-c3) > m`` with descending counts; and trivially exact
    when ``m == 0`` (nothing is removed — even count TIES are fine, both
    kernels then see identical counts).

    Tile granularity makes this a cheap static test the plan can consume:
    with ``stab(T) = min`` site margin and ``umax(T) = max`` site u over a
    tile's real sites, the tile pair (Ti, Tj) is factorized-exact iff

        (umax(Tj) == 0  or  stab(Ti) > umax(Tj)) and
        (umax(Ti) == 0  or  stab(Tj) > umax(Ti))

    — in particular clean x clean tile pairs (no UNKNOWN on either side,
    the overwhelming majority for real FASTA with sparse ambiguity codes)
    are ALWAYS exact.  Padded tail sites carry margin = +inf / u = 0 (their
    pairs are dropped in-kernel via distinct == 0 anyway).

    Returns ``(stab [grid] int64, umax [grid] int64)``; monomorphic and
    padded sites contribute margin ``_MARGIN_INF``.
    """
    margin, u = majmin_site_margins(counts, n_seqs)
    s = counts.shape[0]
    s_pad = grid * tile
    mpad = np.full(s_pad, _MARGIN_INF, dtype=np.int64)
    mpad[:s] = margin
    upad = np.zeros(s_pad, dtype=np.int64)
    upad[:s] = u
    return (mpad.reshape(grid, tile).min(axis=1),
            upad.reshape(grid, tile).max(axis=1))


def majmin_site_margins(counts: np.ndarray, n_seqs: int,
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Per-SITE ``(stability_margin, unknown_count)`` — the site-granular
    quantities :func:`majmin_tile_margins` folds per tile, exposed for the
    driver's unsafe-site PACKING permutation: sites with ``u > 0`` are the
    only ones that can poison a partner tile, so grouping them into the
    trailing tiles makes every clean x clean tile pair (the bulk of the
    triangle) trivially factorized-exact regardless of margins."""
    counts = counts.astype(np.int64)
    u = n_seqs - counts.sum(axis=1)
    top = np.sort(counts, axis=1)[:, ::-1]
    c1, c2, c3 = top[:, 0], top[:, 1], top[:, 2]
    margin = np.where(c2 == 0, _MARGIN_INF, np.minimum(c1 - c2, c2 - c3))
    return margin, u
