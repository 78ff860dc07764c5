"""Pin the documented dense-path dedup semantics (VERDICT round 2, Weak
#6): duplicate (u, i) pairs inside a dense stratum merge by AVERAGING —
exact on real rating data (no duplicate pairs) and a bounded approximation
on the iid synthetic. Both the host and device prep paths must produce
round(mean * R_SCALE) for duplicated cells."""

import numpy as np
import jax.numpy as jnp

from mfx.data.coo import RatingsCOO
from mfx.kernels.dense_pallas import R_SCALE
from mfx.solvers import dense_prep as dp

SU = SI = 128
PACK = 2  # rank 64


def _coo_with_dups():
    # one dense stratum (block (0, 0)) with every cell rated once, plus
    # hand-placed duplicates with different ratings
    u, i, r = [], [], []
    rng = np.random.default_rng(0)
    for uu in range(SU):
        for ii in range(SI):
            u.append(uu)
            i.append(ii)
            r.append(float(rng.integers(1, 10)) * 0.5)
    # duplicates: cell (3, 5) three times, cell (100, 17) twice
    dups = [(3, 5, 1.0), (3, 5, 4.0), (100, 17, 5.0)]
    base = {(3, 5): r[3 * SI + 5], (100, 17): r[100 * SI + 17]}
    for uu, ii, rr in dups:
        u.append(uu)
        i.append(ii)
        r.append(rr)
    coo = RatingsCOO(
        np.array(u, np.int32), np.array(i, np.int32),
        np.array(r, np.float32), SU, SI, synthetic=True,
    )
    expect = {
        (3, 5): (base[(3, 5)] + 1.0 + 4.0) / 3.0,
        (100, 17): (base[(100, 17)] + 5.0) / 2.0,
    }
    return coo, expect


def _cell(R, lu, li):
    """Value of local cell (lu, li) in the decimated int8 R tensor."""
    sup, sip = SU // PACK, SI // PACK
    parity = (lu % PACK) * PACK + (li % PACK)
    return float(R[0, parity * sup + lu // PACK, li // PACK])


def test_host_prep_averages_duplicates():
    coo, expect = _coo_with_dups()
    split = dp.split_dense_strata(
        coo.user, coo.item, SU, SI, SU, SI, chi_min=0.01, nwin_head=1,
        pack=PACK,
    )
    assert split.num_strata == 1
    tensors = dp.build_dense_tensors(split, coo.rating, SU, SI, PACK)
    R = np.asarray(tensors["R"])
    for (lu, li), mean in expect.items():
        assert _cell(R, lu, li) == round(mean * R_SCALE)
    # degrees count RAW ratings (per-occurrence L2 semantics preserved)
    du = np.asarray(tensors["du_s"]).reshape(1, SU)
    assert du[0, 3] == SI + 2  # two extra occurrences for user 3


def test_device_prep_averages_duplicates():
    coo, expect = _coo_with_dups()
    tensors, (u_sp, i_sp, r_sp), info = dp.prepare_dense_device(
        jnp.asarray(coo.user), jnp.asarray(coo.item),
        jnp.asarray(coo.rating), SU, SI, SU, SI,
        chi_min=0.01, nwin_head=1, pack=PACK,
    )
    assert info["num_strata"] == 1
    assert int(u_sp.shape[0]) == 0  # everything landed dense
    R = np.asarray(tensors["R"])
    for (lu, li), mean in expect.items():
        assert _cell(R, lu, li) == round(mean * R_SCALE)


def test_int4_nibble_pack_roundtrip_exact_on_half_stars():
    """int4 dense ratings (VERDICT round 2, directive #10): on half-star
    data the 4-bit encoding is LOSSLESS — unpack the nibble-paired tensor
    and recover every rating bit-exactly (int8's round(r*25)/25 grid has
    ~0.012 std error on the same data)."""
    rng = np.random.default_rng(3)
    n = 4000
    u = rng.integers(0, SU, n).astype(np.int32)
    i = rng.integers(0, SI, n).astype(np.int32)
    r = (rng.integers(1, 11, n) * 0.5).astype(np.float32)  # half-stars
    coo = RatingsCOO(u, i, r, SU, SI, synthetic=True)
    split = dp.split_dense_strata(
        coo.user, coo.item, SU, SI, SU, SI, chi_min=0.01, nwin_head=1,
        pack=PACK,
    )
    assert split.num_strata == 1
    t8 = dp.build_dense_tensors(split, coo.rating, SU, SI, PACK, rfmt="int8")
    t4 = dp.build_dense_tensors(split, coo.rating, SU, SI, PACK, rfmt="int4")
    sup = SU // PACK
    p2 = PACK * PACK
    R4 = np.asarray(t4["R"]).astype(np.int32) & 255
    assert R4.shape == (1, (p2 // 2) * sup, SI // PACK)
    # unpack nibbles back to the pack^2 parity blocks
    lo = (R4 & 15).reshape(1, p2 // 2, sup, -1)
    hi = (R4 >> 4).reshape(1, p2 // 2, sup, -1)
    un = np.empty((1, p2, sup, lo.shape[-1]), np.int32)
    un[:, 0::2] = lo
    un[:, 1::2] = hi
    # exact where a single rating landed (dup cells round the average)
    cnt = np.zeros((SU, SI), np.int64)
    np.add.at(cnt, (u, i), 1)
    first = np.zeros((SU, SI), np.float32)
    first[u, i] = r  # any representative; all equal where cnt == 1
    for lu in range(SU):
        for li in range(SI):
            if cnt[lu, li] == 1:
                parity = (lu % PACK) * PACK + (li % PACK)
                v = un[0, parity, lu // PACK, li // PACK]
                assert v * 0.5 == first[lu, li]
    # int8 on the same data is NOT exact (grid mismatch exists somewhere)
    R8 = np.asarray(t8["R"]).astype(np.float32) / 25.0
    mism = 0
    for lu in range(SU):
        for li in range(SI):
            if cnt[lu, li] == 1:
                parity = (lu % PACK) * PACK + (li % PACK)
                if R8[0, parity * (SU // PACK) + lu // PACK, li // PACK] != first[lu, li]:
                    mism += 1
    assert mism > 0
