"""Dense-stratum preparation + phase driver (pairs with
mfx/kernels/dense_pallas.py; see its docstring for the math and layout).

Split: once per training run, strata with density ≥ ``chi_min`` whose item
window lies inside the VMEM-resident head are carved out of the COO; their
ratings are densified on device into the decimated (ND, 4·sup, sip) tensor
(duplicated (u, i) pairs stay in the sparse set so per-rating semantics are
preserved). Each epoch then runs: dense phase (this module) → sparse phase
(the regular sweep kernel on the remaining ratings).

Note: dense strata are only useful when popular items cluster in the first
item windows. The seeded synthetic datasets are popularity-sorted by
construction; for raw MovieLens/Netflix ids, relabel items by frequency
first (planned; see STATUS.md).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mfx.kernels.dense_pallas import aux_width, dense_sgd_phase_pallas
from mfx.kernels.sgd_pallas import BIAS_ROWS

__all__ = ["DenseSplit", "split_dense_strata", "build_dense_tensors",
           "prepare_dense_device", "prepare_dense_full",
           "prepare_dense_ring", "prepare_dense_ring_full",
           "run_dense_phase", "auto_dense_threshold"]

# Chip-calibrated cost constants for dense_chi < 0 ("auto"): pick the
# dense/sparse boundary from the per-stratum occupancy histogram instead
# of a hand-swept chi. Per-stratum dense cost decomposes into the R
# stream (su·si·slot bytes at the chip's TRUE chained-read rate —
# STATUS.md r4 ceiling probes: ~122 GB/s) plus a per-STRATUM fixed cost
# (~4.5 µs at 1024² — measured to be per-CELL VPU work (int4 decode +
# E elementwise), NOT per-grid-step overhead: the r5 spg A/B showed
# grid-step batching does not amortize it, and dividing it by spg
# over-carves — su=1024 spg=2 carved 3,077 strata and ran 79 ms vs the
# spg-independent model's 2,299/71.8 ms within-job). The sparse one-hot
# path replaces carved-out strata at its per-rating cost, and ANY
# sparse phase pays a fixed plan/dispatch cost. Calibration: at the
# r4 preset geometry (1024² int4, spg=1) the decomposed model gives
# breakeven ≈ 1257 ratings/stratum — the same boundary the r4 chi sweep
# measured optimal (1000-1500; the old single-constant 60 GB/s model
# encoded stream+fixed together and mis-extrapolated to other block
# sizes). AUTO_SPARSE_NS is the MARGINAL cost of strata near the
# boundary — they pack efficiently, so it sits below the sparse path's
# ~12 ns average. On spec-bandwidth hardware recalibrate
# AUTO_STREAM_GBPS/AUTO_FIXED_US and the boundary adapts.
AUTO_STREAM_GBPS = 122.0
AUTO_FIXED_US = 4.5
AUTO_SPARSE_NS = 7.0
AUTO_SPARSE_FIXED_MS = 6.5
_SLOT_BYTES = {"int4": 0.5, "int8": 1.0}


def auto_dense_threshold(
    counts: np.ndarray, su: int, si: int, rfmt: str, spg: int = 1
) -> float:
    """Cost-model stratum eligibility threshold (ratings/stratum).

    A stratum streams densely iff its rating count exceeds the
    breakeven ``t_dense / t_sparse_per_rating``, where t_dense = R-image
    stream + the per-stratum fixed cost (spg-INDEPENDENT — it is
    per-cell VPU work, see the constants note); if the ratings below
    breakeven would save less than the sparse phase's fixed cost, the
    whole epoch goes dense (threshold 1.0 = every non-empty stratum).
    This is what the hand-swept chi converged to on the flat iid-user
    synthetic (chi→0, 100% dense); with 2-D activity skew (generator
    v6) the cold region drops below breakeven and auto carves it out.
    """
    del spg  # measured: grid-step batching does NOT amortize the fixed
    # term (it is per-cell VPU work); kept in the signature so carving
    # stays geometry-aware if a future kernel changes that
    slot = _SLOT_BYTES.get(rfmt, 4.0)
    t_dense = (
        su * si * slot / (AUTO_STREAM_GBPS * 1e9)
        + AUTO_FIXED_US * 1e-6
    )
    t_sparse = AUTO_SPARSE_NS * 1e-9
    breakeven = t_dense / t_sparse
    nz = counts[counts > 0]
    below = nz[nz < breakeven]
    savings = float((t_dense - below * t_sparse).sum())
    if savings <= AUTO_SPARSE_FIXED_MS * 1e-3:
        return 1.0
    return float(breakeven)


def _dense_thresh(chi_min: float, counts, su, si, rfmt, spg: int = 1) -> float:
    if chi_min < 0:
        return auto_dense_threshold(counts, su, si, rfmt, spg=spg)
    return max(1.0, chi_min * su * si)


@dataclasses.dataclass
class DenseSplit:
    """Host-side split result."""

    sparse_idx: np.ndarray  # rating indices staying on the sparse path
    dense_idx: np.ndarray  # rating indices handled densely (deduped (u,i))
    sa: np.ndarray  # (ND,) user block per dense stratum, sorted by (a, c)
    sc: np.ndarray  # (ND,) head window per dense stratum
    flat_pos: np.ndarray  # (len(dense_idx),) position in the R tensor
    deg_us: np.ndarray  # (ND, su) per-stratum user-row degree (factor reg)
    deg_is: np.ndarray  # (ND, si) per-stratum item-row degree
    deg_u: np.ndarray  # (A, su) dense-phase TOTAL degree (bias reg)
    deg_i: np.ndarray  # (nwin_head, si)
    nwin_head: int

    @property
    def num_strata(self) -> int:
        return int(self.sa.shape[0])


def split_dense_strata(
    user: np.ndarray,
    item: np.ndarray,
    num_users: int,
    num_items: int,
    su: int,
    si: int,
    chi_min: float,
    nwin_head: int,
    pack: int,
) -> DenseSplit:
    if su != si:
        raise ValueError("dense path requires su == si")
    A = -(-num_users // su)
    C = -(-num_items // si)
    nwin_head = min(nwin_head, C)
    a = (user // su).astype(np.int64)
    c = (item // si).astype(np.int64)
    strat = a * C + c
    counts = np.bincount(strat, minlength=A * C)
    thresh = max(1.0, chi_min * su * si)
    eligible = (counts >= thresh).reshape(A, C)
    eligible[:, nwin_head:] = False
    eligible = eligible.reshape(-1)

    # duplicate (u, i) pairs inside a dense cell are merged by AVERAGING
    # device-side (build_dense_tensors): exact for real rating data (no
    # duplicate pairs) and a documented ~0.1% approximation for the iid
    # synthetic generators. An exact host-side dedup needs a 25M-key sort,
    # which costs minutes on this throttled host.
    dense_mask = eligible[strat]
    dense_idx = np.flatnonzero(dense_mask)
    sparse_idx = np.flatnonzero(~dense_mask)

    dense_strata = np.flatnonzero(eligible)  # sorted by (a, c) already
    remap = np.full(A * C, -1, np.int64)
    remap[dense_strata] = np.arange(len(dense_strata))
    sa = (dense_strata // C).astype(np.int32)
    sc = (dense_strata % C).astype(np.int32)

    sup, sip = su // pack, si // pack
    st = remap[strat[dense_idx]]
    lu = (user[dense_idx] % su).astype(np.int64)
    li = (item[dense_idx] % si).astype(np.int64)
    parity = (lu % pack) * pack + (li % pack)  # pack² parity blocks
    flat_pos = (
        st * (pack * pack * sup * sip)
        + parity * (sup * sip)
        + (lu // pack) * sip
        + (li // pack)
    )

    # degrees (raw rating counts; bincount — np.add.at is a slow scalar
    # loop on this single-core host)
    nds = len(dense_strata)
    deg_us = np.bincount(st * su + lu, minlength=nds * su).reshape(
        nds, su
    ).astype(np.int32)
    deg_is = np.bincount(st * si + li, minlength=nds * si).reshape(
        nds, si
    ).astype(np.int32)
    deg_u = np.bincount(
        a[dense_idx] * su + lu, minlength=A * su
    ).reshape(A, su).astype(np.int32)
    deg_i = np.bincount(
        c[dense_idx] * si + li, minlength=nwin_head * si
    ).reshape(nwin_head, si).astype(np.int32)
    if flat_pos.size and int(flat_pos.max()) >= 2**31:
        raise NotImplementedError(
            "dense tensor exceeds int32 addressing; lower nwin_head"
        )
    return DenseSplit(
        sparse_idx=sparse_idx,
        dense_idx=dense_idx,
        sa=sa,
        sc=sc,
        flat_pos=flat_pos.astype(np.int32),
        deg_us=deg_us,
        deg_is=deg_is,
        deg_u=deg_u,
        deg_i=deg_i,
        nwin_head=nwin_head,
    )




def _quantize_chunk(ravg, rfmt):
    from mfx.kernels.dense_pallas import R4_SCALE, R_SCALE

    if rfmt == "int8":
        return (
            jnp.clip(jnp.round(ravg * R_SCALE), 0.0, 127.0).astype(jnp.int8)
        )
    # int4: exact for star-scale ratings (r*2 integral); duplicates that
    # averaged off-grid round to the nearest half-star (same documented
    # approximation class as int8's 0.04 grid)
    return jnp.clip(jnp.round(ravg * R4_SCALE), 0.0, 15.0).astype(jnp.int8)


def _pack_nibbles(R, nd, pack, sup, sip):
    """(nd, pack²·sup, sip) int4-valued bytes -> parity-pair nibble-packed
    (nd, (pack²/2)·sup, sip): low nibble = even parity block, high = odd.
    All arithmetic stays int8 (values are 0..15, and the << 4 wrap-around
    preserves the bit pattern) — an int32 intermediate would cost 4 bytes
    per cell, which OOMs at full-span scale."""
    p2 = pack * pack
    R = R.reshape(nd, p2, sup, sip)
    packed = (R[:, 0::2] & jnp.int8(15)) | (
        (R[:, 1::2] & jnp.int8(15)) << jnp.int8(4)
    )
    return packed.astype(jnp.int8).reshape(nd, (p2 // 2) * sup, sip)


def build_dense_tensors(split: DenseSplit, rating: np.ndarray, su, si, pack,
                        rfmt: str = "int8"):
    """Device tensors for the dense phase (built once per run)."""
    sup, sip = su // pack, si // pack
    nd = split.num_strata
    p2 = pack * pack
    # int8 quantized ratings (see dense_pallas.R_SCALE): half the bf16
    # stream the dense phase is bound by. Duplicate (u, i) pairs (absent
    # in real data) merge by averaging: sum / count per cell. Built in
    # strata chunks: the f32 sum/count scratch for the full tensor would
    # be ~8 bytes/cell (>9 GB at ML-25M scale, chi 0.0025) — chunking
    # bounds scratch at ~1 GB while the int8 result is 1 byte/cell.
    cells = p2 * sup * sip
    chunk_nd = max(1, (128 << 20) // cells)  # ~128M cells of f32 scratch
    order = np.argsort(split.flat_pos, kind="stable")
    fp = split.flat_pos[order]
    rv = rating[split.dense_idx][order]
    parts = []
    for lo in range(0, nd, chunk_nd):
        hi = min(lo + chunk_nd, nd)
        s0, s1 = np.searchsorted(fp, [lo * cells, hi * cells])
        pos = jnp.asarray(fp[s0:s1] - lo * cells)
        size = (hi - lo) * cells
        rsum = jnp.zeros((size,), jnp.float32).at[pos].add(
            jnp.asarray(rv[s0:s1])
        )
        cnt = jnp.zeros((size,), jnp.float32).at[pos].add(1.0)
        ravg = jnp.where(cnt > 0, rsum / jnp.maximum(cnt, 1.0), 0.0)
        parts.append(
            _quantize_chunk(ravg, rfmt).reshape(hi - lo, p2 * sup, sip)
        )
    R = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
    if rfmt == "int4":
        R = _pack_nibbles(R, nd, pack, sup, sip)
    # degree columns, decimated: per-stratum (factor reg) + totals (bias reg)
    def dec(deg, blocks, size):  # (blocks, size) -> (blocks, size/pack, pack)
        return jnp.asarray(deg, jnp.float32).reshape(blocks, size // pack, pack)

    return {
        "sa": jnp.asarray(split.sa),
        "sc": jnp.asarray(split.sc),
        "R": R,
        "du_s": dec(split.deg_us, nd, su),  # (ND, sup, 2)
        "di_s": dec(split.deg_is, nd, si),  # (ND, sip, 2)
        "du_tot": dec(split.deg_u, split.deg_u.shape[0], su),  # (A, sup, 2)
        "di_tot": dec(split.deg_i, split.nwin_head, si),  # (nwin, sip, 2)
    }


def _build_r_tensor(st, inner, rd, n_strata, cells, pack, sup, sip, rfmt,
                    bounds_nd=None):
    """Dedup-average R build over a device position stream — shared by
    the single-chip and ring device preps (identical algorithm; a fix
    here reaches both). Duplicate (u, i) cells merge by averaging.

    The averaging runs as a sorted SEGMENT mean over the n occupied
    cells, not a scatter into full-density f32 sum/count scratch: the
    scratch form costs ~8 bytes/cell of HBM traffic per pass (hundreds
    of seconds at full-span ML-25M scale where cells outnumber ratings
    200:1); here only the final int8 image is cell-sized. ``st``
    (stratum id) and ``inner`` (cell offset inside the stratum) address
    each rating separately so scatter positions are computed
    CHUNK-LOCAL — ``n_strata * cells`` may exceed int32 (billion-scale
    dense sets) as long as one chunk does not. Returns the
    (n_strata, rows, sip) int8 tensor (nibble-packed for rfmt='int4');
    for int4 the nibble image is scattered directly (low nibble = even
    parity block, high = odd; disjoint bits compose by add).

    ``bounds_nd`` (optional, ascending stratum boundaries starting at 0
    and ending at n_strata): return a LIST of per-interval tensors
    instead of one concatenated image. prepare_dense_full passes its
    group boundaries so each group's R is built directly — slicing
    groups out of a monolithic R would briefly hold TWO copies of the
    multi-GB image, which OOMs this 16 GB chip at chi<=0.0003."""
    i32 = jnp.int32
    n = int(st.shape[0])
    # sort by (st, inner) via two stable passes (a composite key would
    # overflow int32); duplicates land adjacent in input order, so the
    # segment sums add them in the same order as the host build
    o1 = jnp.argsort(inner, stable=True)
    st1, in1, rv1 = st[o1], inner[o1], rd[o1]
    o2 = jnp.argsort(st1, stable=True)
    st_s, in_s, rv = st1[o2], in1[o2], rv1[o2]
    first = jnp.concatenate([
        jnp.ones((1,), bool),
        (st_s[1:] != st_s[:-1]) | (in_s[1:] != in_s[:-1]),
    ])
    seg = jnp.cumsum(first.astype(i32)) - 1  # 0-based cell-segment ids
    rsum = jax.ops.segment_sum(rv, seg, num_segments=n)
    cnt = jax.ops.segment_sum(jnp.ones_like(rv), seg, num_segments=n)
    q = _quantize_chunk(rsum / jnp.maximum(cnt, 1.0), rfmt)  # (n,) int8
    # one representative (st, inner) per segment; pad segments (cnt=0)
    # get st = n_strata so the array stays sorted and chunk slicing
    # naturally excludes them
    st_seg = jnp.where(cnt > 0,
                       jax.ops.segment_max(st_s, seg, num_segments=n),
                       n_strata)
    in_seg = jnp.where(cnt > 0,
                       jax.ops.segment_max(in_s, seg, num_segments=n), 0)

    nibble = rfmt == "int4"
    if nibble:
        # packed layout: parity pair p -> byte row p // 2, nibble p % 2
        sxs = sup * sip
        parity = in_seg // sxs
        pos_in = (parity // 2) * sxs + in_seg % sxs
        q = jnp.where(parity % 2 == 1, q << jnp.int8(4), q)
        cells_out = (pack * pack // 2) * sup * sip
        rows = (pack * pack // 2) * sup
    else:
        pos_in = in_seg
        cells_out = cells
        rows = pack * pack * sup
    chunk_nd = max(1, (256 << 20) // cells_out)
    outer = (np.asarray(bounds_nd, np.int64) if bounds_nd is not None
             else np.array([0, n_strata], np.int64))

    def build_interval(b0, b1):
        bounds = np.arange(b0, b1 + chunk_nd, chunk_nd).clip(max=b1)
        cuts = np.asarray(jnp.searchsorted(st_seg, jnp.asarray(bounds)))
        parts = []
        for ci in range(len(bounds) - 1):
            lo_s, hi_s = int(cuts[ci]), int(cuts[ci + 1])
            lo_nd = int(bounds[ci])
            size = (int(bounds[ci + 1]) - lo_nd) * cells_out
            if size == 0:
                continue
            m = hi_s - lo_s
            mp = 1 << max(0, (m - 1)).bit_length()  # pow2: few jit variants
            pos = jnp.full((mp,), size, i32)  # pad -> out of range, dropped
            val = jnp.zeros((mp,), jnp.int8)
            pos = pos.at[:m].set(
                (st_seg[lo_s:hi_s] - lo_nd) * cells_out + pos_in[lo_s:hi_s]
            )
            val = val.at[:m].set(q[lo_s:hi_s])
            # cells are unique per segment, so add == set (and for int4
            # the two nibbles of a byte arrive as disjoint bit patterns)
            parts.append(
                jnp.zeros((size,), jnp.int8)
                .at[pos].add(val, mode="drop")
                .reshape(-1, rows, sip)
            )
        if not parts:
            return jnp.zeros((b1 - b0, rows, sip), jnp.int8)
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    out = [build_interval(int(outer[k]), int(outer[k + 1]))
           for k in range(len(outer) - 1)]
    return out if bounds_nd is not None else out[0]


def prepare_dense_device(
    u_dev: jax.Array,
    i_dev: jax.Array,
    r_dev: jax.Array,
    num_users: int,
    num_items: int,
    su: int,
    si: int,
    chi_min: float,
    nwin_head: int,
    pack: int,
    rfmt: str = "int8",
):
    """Device-side dense/sparse split + dense tensor build.

    The host version (`split_dense_strata` + `build_dense_tensors`) costs
    100-160 s of 1-core host time at ML-25M scale (bincounts, masks, and
    an argsort over the dense subset). Everything here except the
    O(strata) eligibility arithmetic runs on the accelerator: one
    segment_sum for the stratum histogram, one stable argsort to
    partition dense/sparse, device bincounts for the degree tables, and
    the chunked int8 R scatter over a device-sorted position stream.

    Returns ``(tensors | None, (u_sp, i_sp, r_sp), info)`` where the
    sparse triple is device-resident (feeds plan_device directly) and
    ``tensors`` plugs into ``run_dense_phase``.
    """
    if su != si:
        raise ValueError("dense path requires su == si")
    A = -(-num_users // su)
    C = -(-num_items // si)
    nwin_head = min(nwin_head, C)
    i32 = jnp.int32
    strat = (u_dev // su).astype(i32) * C + (i_dev // si).astype(i32)
    counts = np.asarray(
        jax.ops.segment_sum(
            jnp.ones_like(strat), strat, num_segments=A * C
        )
    )
    thresh = max(1.0, chi_min * su * si)
    eligible = (counts >= thresh).reshape(A, C)
    eligible[:, nwin_head:] = False
    dense_strata = np.flatnonzero(eligible.reshape(-1))
    nd = len(dense_strata)
    if nd == 0:
        return None, (u_dev, i_dev, r_dev), {"dense_frac": 0.0}
    sup, sip = su // pack, si // pack
    cells = pack * pack * sup * sip
    remap = np.full(A * C, -1, np.int32)
    remap[dense_strata] = np.arange(nd, dtype=np.int32)
    sa = (dense_strata // C).astype(np.int32)
    sc = (dense_strata % C).astype(np.int32)

    st_full = jnp.asarray(remap)[strat]
    dense_mask = st_full >= 0
    n_dense = int(dense_mask.sum())  # one D2H scalar; fixes shapes below
    order = jnp.argsort(~dense_mask, stable=True)  # dense first
    dpos, spos = order[:n_dense], order[n_dense:]
    u_sp, i_sp, r_sp = u_dev[spos], i_dev[spos], r_dev[spos]

    ud, idn, rd = u_dev[dpos], i_dev[dpos], r_dev[dpos]
    st = st_full[dpos]
    lu = (ud % su).astype(i32)
    li = (idn % si).astype(i32)
    parity = (lu % pack) * pack + (li % pack)
    inner = parity * (sup * sip) + (lu // pack) * sip + (li // pack)

    def seg(ids, n):
        return jax.ops.segment_sum(
            jnp.ones_like(ids, jnp.float32), ids, num_segments=n
        )

    deg_us = seg(st * su + lu, nd * su).reshape(nd, su)
    deg_is = seg(st * si + li, nd * si).reshape(nd, si)
    deg_u = seg((ud // su).astype(i32) * su + lu, A * su).reshape(A, su)
    deg_i = seg(
        (idn // si).astype(i32) * si + li, nwin_head * si
    ).reshape(nwin_head, si)

    # chunked dedup-average R build (shared helper)
    R = _build_r_tensor(st, inner, rd, nd, cells, pack, sup, sip, rfmt)

    def dec(deg, blocks, size):
        return deg.reshape(blocks, size // pack, pack)

    tensors = {
        "sa": jnp.asarray(sa),
        "sc": jnp.asarray(sc),
        "R": R,
        "du_s": dec(deg_us, nd, su),
        "di_s": dec(deg_is, nd, si),
        "du_tot": dec(deg_u, A, su),
        "di_tot": dec(deg_i, nwin_head, si),
    }
    info = {"dense_frac": n_dense / max(1, int(u_dev.shape[0])),
            "num_strata": nd,
            "r_stream_bytes": int(R.nbytes)}
    return tensors, (u_sp, i_sp, r_sp), info


def prepare_dense_full(
    u_dev: jax.Array,
    i_dev: jax.Array,
    r_dev: jax.Array,
    num_users: int,
    num_items: int,
    su: int,
    si: int,
    chi_min: float,
    nwd: int,
    pack: int,
    rfmt: str = "int8",
    spg: int = 1,
):
    """Full-item-span dense split (sgd.dense_span='full').

    The head-only split leaves dense-eligible mass on the table: at the
    ML-25M shape with chi=0.0025 measured on chip, HALF the sparse
    remainder (3.7M of 7.4M ratings) sits in strata with >= 768 ratings
    whose item window lies OUTSIDE the 8k-item head — each costing
    ~8.3 ns/rating on the sparse path vs ~6.4 us/stratum streamed
    densely (breakeven ~770 ratings/stratum, i.e. chi ~0.00075 at
    1024-blocks). This prep selects eligible strata ANYWHERE in the item
    span and groups them by segments of ``nwd`` item windows; the epoch
    then runs one dense phase per group on a VMEM-resident Q segment
    (``nwd`` is sized so the segment fits next to the dense kernel's R
    pipeline buffers — 43-window segments measured a 21.5 MB scoped-VMEM
    bust, 16-window groups fit) before the sparse sweeps. Measured:
    57.1 ms vs 68.6 ms/epoch (+20% upd/s) at ML-25M shape, rank 64.

    Returns ``(dense_meta, dense_groups, (u_sp, i_sp, r_sp), info)``:
    ``dense_meta`` a static tuple of (win0, nwin) per non-empty group,
    ``dense_groups`` the matching tensors dicts (window-local ``sc`` and
    ``di_tot``; per-group ``du_tot`` for the bias trust update).
    """
    if su != si:
        raise ValueError("dense path requires su == si")
    A = -(-num_users // su)
    C = -(-num_items // si)
    i32 = jnp.int32
    strat = (u_dev // su).astype(i32) * C + (i_dev // si).astype(i32)
    counts = np.asarray(
        jax.ops.segment_sum(
            jnp.ones_like(strat), strat, num_segments=A * C
        )
    )
    thresh = _dense_thresh(chi_min, counts, su, si, rfmt, spg=spg)
    idx = np.flatnonzero(counts >= thresh)
    if idx.size == 0:
        return (), (), (u_dev, i_dev, r_dev), {"dense_frac": 0.0}
    a_s, c_s = idx // C, idx % C
    g_s = c_s // nwd
    order = np.lexsort((c_s, a_s, g_s))  # groups contiguous, (a, c) inside
    idx, a_s, c_s, g_s = idx[order], a_s[order], c_s[order], g_s[order]
    nd = len(idx)
    ngr = -(-C // nwd)

    # spg > 1: the dense kernel batches spg strata per grid step (one
    # R/aux DMA, one pipeline step — amortizes the measured per-grid-step
    # fixed cost). A grid step must stay within ONE user block (the P
    # block is a per-step pipelined input), so every (group, user-block)
    # run of strata pads to a multiple of spg with NULL strata: no
    # ratings scatter into them, so their R rows and degree columns stay
    # zero and the kernel computes an exact no-op (E = 0 everywhere,
    # reg·deg = 0, bias sums 0). ``pos`` maps each real stratum to its
    # padded slot; everything downstream (rating remap, degrees, R
    # build, group bounds) indexes padded slots.
    run_key = g_s * A + a_s  # unique, ascending per (group, user block)
    run_start = np.concatenate(
        [[0], np.flatnonzero(np.diff(run_key)) + 1]
    )
    run_len = np.diff(np.concatenate([run_start, [nd]]))
    pad_len = -(-run_len // spg) * spg
    new_start = np.concatenate([[0], np.cumsum(pad_len)])
    ndp = int(new_start[-1])
    pos = (
        np.arange(nd)
        - np.repeat(run_start, run_len)
        + np.repeat(new_start[:-1], run_len)
    ).astype(np.int64)
    sa_pad = np.repeat(a_s[run_start], pad_len).astype(np.int32)
    g_pad = np.repeat(g_s[run_start], pad_len).astype(np.int32)
    sc_pad = np.zeros(ndp, np.int32)  # null strata hit window 0 (no-op)
    sc_pad[pos] = (c_s - g_s * nwd).astype(np.int32)
    gb = np.searchsorted(g_pad, np.arange(ngr + 1))

    sup, sip = su // pack, si // pack
    cells = pack * pack * sup * sip
    remap = np.full(A * C, -1, np.int32)
    remap[idx] = pos.astype(np.int32)

    st_full = jnp.asarray(remap)[strat]
    dense_mask = st_full >= 0
    n_dense = int(dense_mask.sum())  # one D2H scalar; fixes shapes below
    order_d = jnp.argsort(~dense_mask, stable=True)  # dense first
    dpos, spos = order_d[:n_dense], order_d[n_dense:]
    u_sp, i_sp, r_sp = u_dev[spos], i_dev[spos], r_dev[spos]

    ud, idn, rd = u_dev[dpos], i_dev[dpos], r_dev[dpos]
    st = st_full[dpos]
    lu = (ud % su).astype(i32)
    li = (idn % si).astype(i32)
    parity = (lu % pack) * pack + (li % pack)
    inner = parity * (sup * sip) + (lu // pack) * sip + (li // pack)

    def seg(ids, n):
        return jax.ops.segment_sum(
            jnp.ones_like(ids, jnp.float32), ids, num_segments=n
        )

    deg_us = seg(st * su + lu, ndp * su).reshape(ndp, su)
    deg_is = seg(st * si + li, ndp * si).reshape(ndp, si)
    # per-group totals for the batched bias trust scaling: a group's
    # phase must see exactly the degrees of the ratings it processes
    g_r = jnp.asarray(g_pad)[st]
    du_tot = seg(
        g_r * (A * su) + (ud // su).astype(i32) * su + lu, ngr * A * su
    ).reshape(ngr, A, su)
    # item windows belong to exactly one group: slice per group below
    di_full = seg((idn // si).astype(i32) * si + li, C * si).reshape(C, si)

    # R built per group (bounds_nd): a monolithic image sliced per group
    # would transiently double the multi-GB R footprint
    R_parts = _build_r_tensor(st, inner, rd, ndp, cells, pack, sup, sip,
                              rfmt, bounds_nd=gb)

    def dec(deg, blocks, size):
        return deg.reshape(blocks, size // pack, pack)

    sa_all = jnp.asarray(sa_pad)
    sc_loc = jnp.asarray(sc_pad)
    dense_meta = []
    dense_groups = []
    for g in range(ngr):
        lo, hi = int(gb[g]), int(gb[g + 1])
        if hi == lo:
            continue
        win0 = g * nwd
        nw = min(nwd, C - win0)
        dense_meta.append((win0, nw))
        dense_groups.append({
            "sa": sa_all[lo:hi],
            "sc": sc_loc[lo:hi],
            "R": R_parts[g],
            "du_s": dec(deg_us[lo:hi], hi - lo, su),
            "di_s": dec(deg_is[lo:hi], hi - lo, si),
            "du_tot": dec(du_tot[g], A, su),
            "di_tot": dec(di_full[win0 : win0 + nw], nw, si),
        })
    info = {
        "dense_frac": n_dense / max(1, int(u_dev.shape[0])),
        "num_strata": nd,
        # padded slot count (spg > 1: includes the no-op null strata the
        # per-run padding adds — they stream zero R blocks, so the pad
        # overhead is visible as r_stream_bytes / strata_padded)
        "strata_padded": ndp,
        "spg": spg,
        "num_groups": len(dense_groups),
        # the eligibility boundary actually applied (ratings/stratum) —
        # with dense_chi < 0 this is the auto cost-model breakeven
        "thresh_ratings": float(thresh),
        "chi_effective": float(thresh) / (su * si),
        # the epoch's dominant HBM traffic: the R image streamed once per
        # epoch (factor-block traffic is ~10x smaller at the preset
        # geometry — P blocks load once per (group, user-block) pair)
        "r_stream_bytes": int(sum(g["R"].nbytes for g in dense_groups)),
    }
    return tuple(dense_meta), tuple(dense_groups), (u_sp, i_sp, r_sp), info


def prepare_dense_ring(
    u_dev: jax.Array,
    ir_dev: jax.Array,  # block-cyclic ring item ids (parallel/ring_blocked)
    r_dev: jax.Array,
    S: int,
    ublock: int,
    iblock: int,
    su: int,
    si: int,
    chi_min: float,
    head_items: int,
    pack: int,
    rfmt: str = "int8",
):
    """Per-cell dense Zipf-head split for the DSGD ring (VERDICT round 2,
    directive #5 — round 2 rejected dense_chi>0 for sharded modes).

    A rating's cell is (sub-step t = (block - shard) mod S, shard s);
    within it, strata are (local user block a, local item window c).
    Thanks to the block-cyclic item mapping every held block carries its
    own frequency-sorted local head (global head item i sits at local id
    i // S), so eligibility is the same chi test as single-chip against
    the first ceil(ceil(head_items/S)/si) local windows.

    Returns ``(tensors | None, (u_sp, ir_sp, r_sp), info)``. Tensors are
    uniform [S, S, NDmax, ...] slabs (cells padded with zero strata —
    exact no-ops in the dense kernel: R=0 masks every cell, degrees 0):
    ``sa``/``sc`` local block/window ids, ``R`` int8 decimated ratings,
    ``du_s``/``di_s`` per-stratum degrees, ``du_tot``/``di_tot`` per-cell
    totals for the bias trust scaling.
    """
    if su != si:
        raise ValueError("dense path requires su == si")
    A = ublock // su
    C = iblock // si
    nwh = min(C, -(-(-(-head_items // S)) // si))
    i32 = jnp.int32
    ns = S * S * A * C
    s_of = (u_dev // ublock).astype(i32)
    b_of = (ir_dev // iblock).astype(i32)
    t_of = (b_of - s_of) % S
    a_of = ((u_dev % ublock) // su).astype(i32)
    c_of = ((ir_dev % iblock) // si).astype(i32)
    cell = t_of * S + s_of
    sid = (cell * A + a_of) * C + c_of
    counts = np.asarray(
        jax.ops.segment_sum(jnp.ones_like(sid), sid, num_segments=ns)
    )
    thresh = max(1.0, chi_min * su * si)
    eligible = (counts >= thresh).reshape(S * S, A, C)
    eligible[:, :, nwh:] = False
    nd_cell = eligible.reshape(S * S, -1).sum(axis=1)
    ndmax = int(nd_cell.max())
    if ndmax == 0:
        return None, (u_dev, ir_dev, r_dev), {"dense_frac": 0.0}
    sup, sip = su // pack, si // pack
    cells_sz = pack * pack * sup * sip
    # slab slot per eligible stratum: cell * NDmax + rank within cell,
    # strata ordered (a, c) inside the cell (kernel grid is a-contiguous)
    remap = np.full(ns, -1, np.int32)
    sa_d = np.zeros((S * S, ndmax), np.int32)
    sc_d = np.zeros((S * S, ndmax), np.int32)
    for q in range(S * S):
        el = np.flatnonzero(eligible[q].reshape(-1))  # sorted by (a, c)
        nd = el.shape[0]
        remap[q * A * C + el] = q * ndmax + np.arange(nd, dtype=np.int32)
        sa_d[q, :nd] = el // C
        sc_d[q, :nd] = el % C
        if nd and nd < ndmax:
            sa_d[q, nd:] = sa_d[q, nd - 1]  # pad keeps a-runs contiguous

    st_full = jnp.asarray(remap)[sid]
    dense_mask = st_full >= 0
    n_dense = int(dense_mask.sum())  # one D2H scalar; fixes shapes below
    order = jnp.argsort(~dense_mask, stable=True)  # dense first
    dpos, spos = order[:n_dense], order[n_dense:]
    u_sp, ir_sp, r_sp = u_dev[spos], ir_dev[spos], r_dev[spos]

    ud, ird, rd = u_dev[dpos], ir_dev[dpos], r_dev[dpos]
    st = st_full[dpos]
    lu = (ud % su).astype(i32)
    li = (ird % si).astype(i32)
    parity = (lu % pack) * pack + (li % pack)
    inner = (
        parity * (sup * sip) + (lu // pack) * sip + (li // pack)
    )

    def seg(ids, n):
        return jax.ops.segment_sum(
            jnp.ones_like(ids, jnp.float32), ids, num_segments=n
        )

    nd_slab = S * S * ndmax
    deg_us = seg(st * su + lu, nd_slab * su).reshape(nd_slab, su)
    deg_is = seg(st * si + li, nd_slab * si).reshape(nd_slab, si)
    cell_d = (cell * A + a_of)[dpos]
    du_tot = seg(cell_d * su + lu, S * S * A * su).reshape(S * S * A, su)
    cell_w = (cell[dpos] * nwh + c_of[dpos])
    di_tot = seg(cell_w * si + li, S * S * nwh * si).reshape(S * S * nwh, si)

    # chunked dedup-average R build over the padded slab positions
    # (shared helper; padded strata have no positions and stay zero)
    R = _build_r_tensor(st, inner, rd, nd_slab, cells_sz, pack, sup, sip,
                        rfmt)

    def dec(x, lead, size):
        return x.reshape(lead + (size // pack, pack))

    tensors = {
        "sa": jnp.asarray(sa_d).reshape(S, S, ndmax),
        "sc": jnp.asarray(sc_d).reshape(S, S, ndmax),
        "R": R.reshape(
            S, S, ndmax,
            (pack * pack // (2 if rfmt == "int4" else 1)) * sup, sip,
        ),
        "du_s": dec(deg_us, (S, S, ndmax), su),
        "di_s": dec(deg_is, (S, S, ndmax), si),
        "du_tot": dec(du_tot, (S, S, A), su),
        "di_tot": dec(di_tot, (S, S, nwh), si),
    }
    info = {
        "dense_frac": n_dense / max(1, int(u_dev.shape[0])),
        "num_strata": int(nd_cell.sum()),
        "ndmax": ndmax,
    }
    return tensors, (u_sp, ir_sp, r_sp), info


def prepare_dense_ring_full(
    u_dev: jax.Array,
    ir_dev: jax.Array,  # block-cyclic ring item ids (parallel/ring_blocked)
    r_dev: jax.Array,
    S: int,
    ublock: int,
    iblock: int,
    su: int,
    si: int,
    chi_min: float,
    nwd: int,
    pack: int,
    rfmt: str = "int8",
):
    """Full-span grouped dense split for the DSGD ring — the multi-chip
    counterpart of ``prepare_dense_full`` (single-chip measured 1.5-1.7x
    over the head-only split at ML-25M shape; the ring carves the same
    strata per (sub-step, shard) cell).

    Strata are eligible ANYWHERE in the held block's item windows and
    group by segments of ``nwd`` windows; each group becomes one uniform
    [S, S, NDmax_g, ...] slab (cells padded with zero strata — exact
    no-ops in the dense kernel). The sub-step then runs one dense phase
    per group on the held block's matching Q segment before the sparse
    segments, mirroring the single-chip fused epoch.

    Returns ``(dense_meta, dense_groups, (u_sp, ir_sp, r_sp), info)``
    with ``dense_meta`` the static ((win0, nwin), ...) tuple; empty
    groups are dropped.
    """
    if su != si:
        raise ValueError("dense path requires su == si")
    A = ublock // su
    C = iblock // si
    i32 = jnp.int32
    ns = S * S * A * C
    s_of = (u_dev // ublock).astype(i32)
    b_of = (ir_dev // iblock).astype(i32)
    t_of = (b_of - s_of) % S
    a_of = ((u_dev % ublock) // su).astype(i32)
    c_of = ((ir_dev % iblock) // si).astype(i32)
    cell = t_of * S + s_of
    sid = (cell * A + a_of) * C + c_of
    counts = np.asarray(
        jax.ops.segment_sum(jnp.ones_like(sid), sid, num_segments=ns)
    )
    thresh = _dense_thresh(chi_min, counts, su, si, rfmt)
    eligible = (counts >= thresh).reshape(S * S, A, C)
    ngr = -(-C // nwd)
    nd_qg = np.array([
        eligible[:, :, g * nwd : (g + 1) * nwd].reshape(S * S, -1).sum(1)
        for g in range(ngr)
    ])  # (ngr, S*S)
    ndmax_g = nd_qg.max(axis=1)
    kept = [g for g in range(ngr) if ndmax_g[g] > 0]
    if not kept:
        return (), (), (u_dev, ir_dev, r_dev), {"dense_frac": 0.0}
    sup, sip = su // pack, si // pack
    cells_sz = pack * pack * sup * sip
    offs = np.concatenate(
        [[0], np.cumsum([S * S * int(ndmax_g[g]) for g in kept])]
    ).astype(np.int64)
    total_slab = int(offs[-1])
    if total_slab >= 2**31:
        raise NotImplementedError(
            "ring dense slab count exceeds int32 stratum ids"
        )
    # group-major slab slots: offs[gi] + cell * NDmax_g + rank-in-cell,
    # strata ordered (a, c) inside each (cell, group)
    remap = np.full(ns, -1, np.int32)
    sa_d, sc_d = [], []
    for gi, g in enumerate(kept):
        wlo = g * nwd
        whi = min(wlo + nwd, C)
        nm = int(ndmax_g[g])
        sa_g = np.zeros((S * S, nm), np.int32)
        sc_g = np.zeros((S * S, nm), np.int32)
        for q in range(S * S):
            eq = np.zeros((A, C), bool)
            eq[:, wlo:whi] = eligible[q][:, wlo:whi]
            el = np.flatnonzero(eq.reshape(-1))  # sorted by (a, c)
            nd = el.shape[0]
            remap[q * A * C + el] = (
                offs[gi] + q * nm + np.arange(nd, dtype=np.int64)
            )
            sa_g[q, :nd] = el // C
            sc_g[q, :nd] = el % C - wlo
            if nd and nd < nm:
                sa_g[q, nd:] = sa_g[q, nd - 1]  # pad keeps a-runs contiguous
        sa_d.append(sa_g)
        sc_d.append(sc_g)

    st_full = jnp.asarray(remap)[sid]
    dense_mask = st_full >= 0
    n_dense = int(dense_mask.sum())  # one D2H scalar; fixes shapes below
    order = jnp.argsort(~dense_mask, stable=True)  # dense first
    dpos, spos = order[:n_dense], order[n_dense:]
    u_sp, ir_sp, r_sp = u_dev[spos], ir_dev[spos], r_dev[spos]

    ud, ird, rd = u_dev[dpos], ir_dev[dpos], r_dev[dpos]
    st = st_full[dpos]
    lu = (ud % su).astype(i32)
    li = (ird % si).astype(i32)
    parity = (lu % pack) * pack + (li % pack)
    inner = parity * (sup * sip) + (lu // pack) * sip + (li // pack)

    def seg(ids, n):
        return jax.ops.segment_sum(
            jnp.ones_like(ids, jnp.float32), ids, num_segments=n
        )

    deg_us = seg(st * su + lu, total_slab * su).reshape(total_slab, su)
    deg_is = seg(st * si + li, total_slab * si).reshape(total_slab, si)
    # per-(group, cell, user-block) totals: each group's phase must see
    # exactly the degrees of the ratings it processes
    g_of_slot = np.zeros(total_slab, np.int32)
    for gi in range(len(kept)):
        g_of_slot[offs[gi] : offs[gi + 1]] = gi
    g_r = jnp.asarray(g_of_slot)[st]
    cell_d = (cell * A + a_of)[dpos]
    ngk = len(kept)
    du_tot = seg(
        (g_r * (S * S * A) + cell_d) * su + lu, ngk * S * S * A * su
    ).reshape(ngk, S * S * A, su)
    # item windows belong to exactly one group: slice per group below
    di_all = seg(
        (cell[dpos] * C + c_of[dpos]) * si + li, S * S * C * si
    ).reshape(S * S, C, si)

    R_parts = _build_r_tensor(st, inner, rd, total_slab, cells_sz, pack,
                              sup, sip, rfmt, bounds_nd=offs)
    rows_r = (pack * pack // (2 if rfmt == "int4" else 1)) * sup

    dense_meta = []
    dense_groups = []
    for gi, g in enumerate(kept):
        nm = int(ndmax_g[g])
        wlo = g * nwd
        nw = min(nwd, C - wlo)
        dense_meta.append((wlo, nw))
        dense_groups.append({
            "sa": jnp.asarray(sa_d[gi]).reshape(S, S, nm),
            "sc": jnp.asarray(sc_d[gi]).reshape(S, S, nm),
            "R": R_parts[gi].reshape(S, S, nm, rows_r, sip),
            "du_s": deg_us[offs[gi] : offs[gi + 1]].reshape(
                S, S, nm, sup, pack
            ),
            "di_s": deg_is[offs[gi] : offs[gi + 1]].reshape(
                S, S, nm, sip, pack
            ),
            "du_tot": du_tot[gi].reshape(S, S, A, sup, pack),
            "di_tot": di_all[:, wlo : wlo + nw].reshape(
                S, S, nw, sip, pack
            ),
        })
    info = {
        "dense_frac": n_dense / max(1, int(u_dev.shape[0])),
        "num_strata": int(nd_qg.sum()),
        "num_groups": ngk,
    }
    return tuple(dense_meta), tuple(dense_groups), (u_sp, ir_sp, r_sp), info


def _bias_from_merged(T, stride, sup, size):
    """(blocks*stride, 128) merged table -> (blocks, size) bias vectors."""
    blocks = T.shape[0] // stride
    rows = T.reshape(blocks, stride, 128)[:, sup : sup + BIAS_ROWS, :]
    return rows.reshape(blocks, BIAS_ROWS * 128)[:, :size]


def _bias_to_merged(T, stride, sup, size, new_bias):
    blocks = T.shape[0] // stride
    padded = jnp.zeros((blocks, BIAS_ROWS * 128), T.dtype)
    padded = padded.at[:, :size].set(new_bias)
    Tr = T.reshape(blocks, stride, 128)
    Tr = Tr.at[:, sup : sup + BIAS_ROWS, :].set(
        padded.reshape(blocks, BIAS_ROWS, 128)
    )
    return Tr.reshape(blocks * stride, 128)


import functools


@functools.partial(
    jax.jit,
    static_argnames=("su", "si", "rank", "use_bias", "exact", "interpret",
                     "rfmt", "lane", "echo", "spg"),
    donate_argnums=(0, 1),
)
def run_dense_phase(
    Pm, Qm, tensors, lr, reg, mu, *, su, si, rank, use_bias,
    exact=False, interpret=False, rfmt="int8", lane=False, echo=1, spg=1,
):
    """One dense phase over all dense strata. Qm is the FULL merged item
    table, donated; the kernel addresses only its head rows. Returns
    (Pm, Qm, sse). Fully jitted: aux assembly, the Pallas phase, and the
    batched bias update compile into one program.

    The body is `dense_phase_core`, which the DSGD ring calls directly
    inside its shard_map sub-step (per-cell dense strata on the held
    block; mfx/parallel/ring_blocked.py) — there the jit/donation comes
    from the enclosing epoch program.
    """
    return dense_phase_core(
        Pm, Qm, tensors, lr, reg, mu, su=su, si=si, rank=rank,
        use_bias=use_bias, exact=exact, interpret=interpret, rfmt=rfmt,
        lane=lane, echo=echo, spg=spg,
    )


def dense_phase_core(
    Pm, Qm, tensors, lr, reg, mu, *, su, si, rank, use_bias,
    exact=False, interpret=False, rfmt="int8", lane=False, echo=1, spg=1,
):
    # lane (sgd.bias_mode='lane'): biases ride in the factor lanes —
    # the aux bias columns stay zero, the kernel's S carries bu+bi, the
    # bias lanes update inside the factor writes, and the post-phase
    # batched bias update below is skipped.
    pack = 128 // rank
    auxw = aux_width(pack)
    sup, sip = su // pack, si // pack
    pstride, qstride = sup + BIAS_ROWS, sip + BIAS_ROWS
    nwin = tensors["di_tot"].shape[0]
    Qh = Qm  # the kernel only touches rows [0, nwin*qstride)
    sa, sc = tensors["sa"], tensors["sc"]
    nd = sa.shape[0]

    # per-stratum aux arrays from the CURRENT biases (frozen for the phase)
    frozen_bias = use_bias and not lane
    bu_full = _bias_from_merged(Pm, pstride, sup, su)  # (A, su)
    bu_dec = bu_full.reshape(-1, sup, pack)
    if not frozen_bias:
        bu_dec = jnp.zeros_like(bu_dec)
    aux_u = jnp.concatenate(
        [
            bu_dec[sa],  # cols [0, p): frozen user biases
            tensors["du_s"],  # cols [p, 2p): per-stratum user degrees
            tensors["di_s"],  # cols [2p, 3p): item degrees (su == si)
            jnp.zeros((nd, sup, auxw - 3 * pack), jnp.float32),
        ],
        axis=2,
    )
    dense = {"sa": sa, "sc": sc, "R": tensors["R"], "aux_u": aux_u}
    if frozen_bias:
        # aux_i exists only on the frozen-bias path — with lane-carried
        # biases (or use_bias=False) it is an all-zero stream the kernel
        # no longer takes (dense_pallas: has_bi)
        bi_full = _bias_from_merged(
            Qh[: nwin * qstride], qstride, sip, si
        )  # (nwin, si)
        bi_dec = bi_full.reshape(-1, sip, pack)
        bi_rows = jnp.swapaxes(bi_dec[sc], 1, 2)  # (ND, pack, sip)
        dense["aux_i"] = jnp.concatenate(
            [bi_rows, jnp.zeros((nd, auxw - pack, sip), jnp.float32)],
            axis=1,
        )
    Pm, Qh, dbu, dbi, sse = dense_sgd_phase_pallas(
        Pm, Qh, dense, lr, reg, mu,
        su=su, si=si, rank=rank, nwin=nwin,
        use_bias=use_bias and not lane,
        exact=exact, interpret=interpret, rfmt=rfmt, lane=lane, echo=echo,
        spg=spg,
    )

    if use_bias and not lane:
        # post-phase batched bias update: Δb = lr (ΣE − reg · deg · b)
        lrf = jnp.asarray(lr, jnp.float32)
        regf = jnp.asarray(reg, jnp.float32)
        esum_u = (
            jnp.zeros((bu_dec.shape[0], sup, pack), jnp.float32)
            .at[sa]
            .add(dbu[:, :, :pack])
            .reshape(-1, su)
        )
        esum_i = (
            jnp.zeros((nwin, sip, pack), jnp.float32)
            .at[sc]
            .add(jnp.swapaxes(dbi[:, :pack, :], 1, 2))
            .reshape(nwin, si)
        )
        deg_u = tensors["du_tot"].reshape(-1, su)
        deg_i = tensors["di_tot"].reshape(nwin, si)
        # same per-row trust scaling as the factor updates (the bias GD
        # step has curvature lr·deg, unstable for heavy rows otherwise)
        from mfx.kernels.dense_pallas import DSTAR

        s_u = jnp.minimum(1.0, DSTAR / jnp.maximum(deg_u, 1.0))
        s_i = jnp.minimum(1.0, DSTAR / jnp.maximum(deg_i, 1.0))
        new_bu = bu_full + lrf * s_u * (esum_u - regf * deg_u * bu_full)
        new_bi = bi_full + lrf * s_i * (esum_i - regf * deg_i * bi_full)
        Pm = _bias_to_merged(Pm, pstride, sup, su, new_bu)
        Qh = jax.lax.dynamic_update_slice(
            Qh,
            _bias_to_merged(Qh[: nwin * qstride], qstride, sip, si, new_bi),
            (0, 0),
        )

    return Pm, Qh, sse[0, 0]