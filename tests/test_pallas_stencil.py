"""Fused flat-layout stencil kernels vs the XLA pad/shift formulation.

The pallas kernels (``ops/pallas_kernels.stencil_flat_apply[_const]``)
are the measured-and-rejected alternative to the XLA pad/shift stencil
(opt-in via ``FST_PALLAS_STENCIL=1`` / ``BENCH_PALLAS_MATVEC=1`` — XLA
already runs the apply at the HBM roofline on v5e, see ``la/gmg.py
_flat_stencil_ok``); here they run in interpret mode on CPU against the
reference ``la/gmg.stencil_apply`` on operands that are zero on the
boundary shell (the flat-shift exactness condition).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fenicssolver_tpu.la import gmg
from fenicssolver_tpu.ops.pallas_kernels import (
    STENCIL_BLOCK,
    _flat_deltas,
    stencil_flat_apply,
    stencil_flat_apply_const,
)
from fenicssolver_tpu.ops.structured import OFFSETS


def _masked_random(shape3, seed):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape3)
    x[0] = x[-1] = 0.0
    x[:, 0] = x[:, -1] = 0.0
    x[:, :, 0] = x[:, :, -1] = 0.0
    return x


def _interior_mask(shape3):
    m = np.zeros(shape3)
    m[1:-1, 1:-1, 1:-1] = 1.0
    return m


def _xla_var_apply(x3, coef):
    y = coef[gmg.CENTER_IDX] * x3
    for oi, d in enumerate(gmg.OFFSETS_T):
        if oi != gmg.CENTER_IDX:
            y = y + coef[oi] * gmg._shift(x3, d)
    return y


@pytest.mark.parametrize("shape3", [(17, 13, 21), (41, 41, 41)])
def test_flat_apply_variable_matches_xla(shape3):
    # (41,41,41) spans two kernel blocks; (17,13,21) checks non-cubic
    # delta linearization inside one block
    x = _masked_random(shape3, 0)
    coef = np.random.default_rng(1).standard_normal((15,) + shape3)
    y_ref = np.asarray(_xla_var_apply(jnp.asarray(x), jnp.asarray(coef)))
    y = np.asarray(
        stencil_flat_apply(jnp.asarray(x), jnp.asarray(coef),
                           interpret=True)
    )
    m = _interior_mask(shape3)
    err = np.linalg.norm(m * (y - y_ref)) / np.linalg.norm(m * y_ref)
    assert err < 1e-12, err


def test_flat_apply_const_matches_stencil_apply():
    shape3 = (41, 41, 41)
    x = _masked_random(shape3, 2)
    coefs = gmg.p1_box_stencil(0.1, 0.15, 0.08)
    y_ref = np.asarray(gmg.stencil_apply(jnp.asarray(x),
                                         jnp.asarray(coefs)))
    y = np.asarray(
        stencil_flat_apply_const(jnp.asarray(x), coefs, interpret=True)
    )
    m = _interior_mask(shape3)
    err = np.linalg.norm(m * (y - y_ref)) / np.linalg.norm(m * y_ref)
    assert err < 1e-12, err


def test_flat_deltas_fit_default_block():
    # the bench upgrade size (n=128 -> N=129) must fit the block window
    assert max(abs(d) for d in _flat_deltas((129, 129, 129))) \
        < STENCIL_BLOCK * 128
    assert len(OFFSETS) == 15


def test_flat_stencil_gate_requires_zero_shell():
    # _flat_stencil_ok must refuse a mask with free dofs on the shell
    # (flat shifts would wrap j/k edges onto REAL values)
    free3 = np.ones((60, 60, 60))  # e.g. all-Neumann
    lv = gmg.GMGLevel(
        coefs=np.ones(15), free3=free3, inv_diag=np.ones(())
    )
    assert not gmg._flat_stencil_ok(lv)
