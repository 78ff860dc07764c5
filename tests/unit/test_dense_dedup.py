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
