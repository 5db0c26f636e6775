"""Checkpointed exact traceback == greedy traceback over full arrows.

The greedy walk over the full arrow table is itself verified (golden
order + enumeration-set membership) in test_traceback.py; here the
block-checkpointed re-fill walk must reproduce it bit-for-bit while only
ever materializing C diagonals of arrows.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nw_tpu.ops import traceback
from nw_tpu.ops.checkpoint_traceback import traceback_checkpointed
from nw_tpu.ops.encode import encode
from nw_tpu.ops.fill_scan import fill_diag


def _check(s1: str, s2: str, m, k, d, C):
    top, side = encode(s1.encode()), encode(s2.encode())
    out = fill_diag(top, side, m, k, d)
    ops_ref, n_ref = traceback.traceback_greedy(
        out["arrows"], len(s1), len(s2), max_steps=len(s1) + len(s2)
    )
    ops, n = traceback_checkpointed(
        jnp.asarray(top), jnp.asarray(side), m, k, d,
        block_diagonals=C, interpret=True,
    )
    assert int(n) == int(n_ref)
    nn = int(n)
    np.testing.assert_array_equal(np.asarray(ops)[:nn], np.asarray(ops_ref)[:nn])
    # and the rendered strings match
    X, Y = traceback.ops_to_strings(ops, n, s1.encode(), s2.encode())
    Xr, Yr = traceback.ops_to_strings(ops_ref, n_ref, s1.encode(), s2.encode())
    assert (X, Y) == (Xr, Yr)


@pytest.mark.parametrize("m,k,d", [(2, 1, 1), (1, 1, 1), (0, 0, 0), (-1, 2, -2)])
def test_checkpointed_matches_greedy(m, k, d):
    rng = np.random.default_rng(17)
    for _ in range(6):
        s1 = "".join(rng.choice(list("ACGT"), int(rng.integers(1, 90))))
        s2 = "".join(rng.choice(list("ACGT"), int(rng.integers(1, 90))))
        _check(s1, s2, m, k, d, C=32)


def test_checkpointed_block_boundary_sizes():
    rng = np.random.default_rng(18)
    s1 = "".join(rng.choice(list("ACGT"), 100))
    s2 = "".join(rng.choice(list("ACGT"), 67))
    for C in (32, 64, 128, 256):
        _check(s1, s2, 2, 1, 1, C)


def test_checkpointed_degenerate():
    _check("A", "A", 1, 1, 1, 32)
    _check("ACGT", "", 1, 1, 1, 32)
    _check("", "ACGT", 1, 1, 1, 32)


def test_align_huge_matches_first_emission():
    """NWAligner.align_huge == the reference DFS's first alignment."""
    from nw_tpu.config import AlignConfig, ScoringParams
    from nw_tpu.models.needleman_wunsch import NWAligner

    rng = np.random.default_rng(19)
    al = NWAligner(AlignConfig(scoring=ScoringParams(2, 1, 1)))
    for _ in range(3):
        s1 = "".join(rng.choice(list("ACGT"), int(rng.integers(30, 120))))
        s2 = "".join(rng.choice(list("ACGT"), int(rng.integers(30, 120))))
        full = al.align(s1, s2)
        X_ref, Y_ref = full.best_alignment()
        r = al.align_huge(s1, s2, block_diagonals=64)
        assert (r.X, r.Y) == (X_ref, Y_ref)
        assert r.score == full.score
