"""Strips-in-slots single-pair score kernel vs the scan oracle
(interpret mode).

Covers the relay timings that bit the first implementation: the W == 1
edge-capture-before-read ordering, the two-phase-delayed E[0] plane,
chunk-0's row-0 boundary, and multi-sub-chunk (K > 1) phases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nw_tpu.ops import encode as enc
from nw_tpu.ops.fill_scan import fill_scores_batch
from nw_tpu.ops.fill_strips import strips_score


def _case(rng, la, lb):
    a = rng.integers(65, 69, la).astype(np.uint8).tobytes()
    b = rng.integers(65, 69, lb).astype(np.uint8).tobytes()
    return a, b


@pytest.mark.parametrize(
    "la,lb,R,K,mkd",
    [
        (2, 2, 2, 2, (2, 1, 1)),      # W=1: capture/read same step
        (3, 3, 2, 1, (1, 1, 1)),
        (9, 5, 2, 3, (2, 1, 1)),      # multi-sub-chunk phases
        (17, 1024, 4, 1, (1, 1, 1)),  # exact W=1 slot-count boundary
        (33, 2100, 4, 2, (3, 2, 2)),  # W=3, interior corner
        (40, 1025, 4, 1, (2, 1, 1)),  # corner at local column 0
        (8, 999, 4, 4, (2, 1, 1)),    # len1 < K*R (single chunk)
        (1, 50, 4, 1, (2, 1, 1)),
        (25, 3000, 4, 1, (0, 0, 0)),  # degenerate scoring params
    ],
)
def test_strips_vs_oracle(la, lb, R, K, mkd):
    m, k, d = mkd
    rng = np.random.default_rng(la * 31 + lb)
    a, b = _case(rng, la, lb)
    t, s = jnp.asarray(enc.encode(a)), jnp.asarray(enc.encode(b))
    want = int(
        fill_scores_batch(
            t[None], s[None], m, k, d,
            jnp.asarray([la]), jnp.asarray([lb]),
        )[0]
    )
    got = int(
        strips_score(t, s, m, k, d, rows=R, chunks=K, interpret=True)
    )
    assert got == want


def test_strips_ragged_lengths():
    """True lengths below the padded shapes (padding must decay)."""
    rng = np.random.default_rng(5)
    a, b = _case(rng, 30, 1500)
    t, s = jnp.asarray(enc.encode(a)), jnp.asarray(enc.encode(b))
    for la, lb in [(30, 1500), (23, 1499), (1, 1), (17, 700)]:
        want = int(
            fill_scores_batch(
                t[None], s[None], 2, 1, 1,
                jnp.asarray([la]), jnp.asarray([lb]),
            )[0]
        )
        got = int(
            strips_score(
                t, s, 2, 1, 1, la, lb, rows=4, interpret=True
            )
        )
        assert got == want, (la, lb)


def test_strips_empty_sides():
    t = jnp.asarray(enc.encode(b"ACGT"))
    s = jnp.asarray(enc.encode(b"AC"))
    assert int(strips_score(t, s, 2, 1, 3, 0, 2, rows=2,
                            interpret=True)) == -6
    assert int(strips_score(t, s, 2, 1, 3, 4, 0, rows=2,
                            interpret=True)) == -12
