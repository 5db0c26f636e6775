"""Banded (row-tiled) Pallas fill vs the lax.scan oracle.

Runs in interpret mode on CPU; tiny band/chunk/unroll geometries force
the multi-band boundary handoff at test sizes (the compiled kernels are
swept on hardware by scripts/tpu_validate.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nw_tpu.ops import encode as enc
from nw_tpu.ops.fill_scan import fill_scores_batch

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _pairs(rng, n, lo, hi):
    return [
        (
            "".join(rng.choice(list("ACGTN"), int(rng.integers(lo, hi)))).encode(),
            "".join(rng.choice(list("ACGTN"), int(rng.integers(lo, hi)))).encode(),
        )
        for _ in range(n)
    ]


@pytest.mark.parametrize(
    "geometry,mkd,lo,hi",
    [
        ((8, 8, 4), (2, 1, 1), 1, 40),    # many tiny bands
        ((16, 8, 8), (1, 1, 1), 1, 40),   # RB > C (lag0 > 0)
        ((8, 16, 2), (2, 1, 1), 5, 60),   # C > RB
        ((24, 8, 8), (0, 0, 0), 1, 90),   # degenerate scoring
        ((32, 32, 16), (3, -1, 2), 1, 90),  # negative mismatch penalty
        ((96, 480, 24), (2, 1, 1), 1, 90),  # production geometry, 1 band
    ],
)
def test_banded_scores_vs_oracle(geometry, mkd, lo, hi):
    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    RB, C, U = geometry
    rng = np.random.default_rng(hash(geometry) % 2**32)
    ps = _pairs(rng, 6, lo, hi)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    ref = np.asarray(
        fill_scores_batch(tops, sides, *mkd, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_banded_batch(
            tops, sides, l1, l2, *mkd,
            interpret=True, band_rows=RB, chunk=C, unroll=U,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_banded_scores_degenerate_lengths():
    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    ps = [(b"", b""), (b"ACGT", b""), (b"", b"ACGT"), (b"A", b"ACGTACGTACG")]
    tops, sides, l1, l2 = enc.encode_batch(ps, 8, 12)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_banded_batch(
            tops, sides, l1, l2, 2, 1, 1,
            interpret=True, band_rows=8, chunk=8, unroll=2,
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_banded_scores_band_boundary_lengths():
    """Pairs whose side length sits exactly on band boundaries."""
    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    rng = np.random.default_rng(7)
    RB = 8
    ps = []
    for L2 in (7, 8, 9, 15, 16, 17, 24):
        s1 = "".join(rng.choice(list("ACGT"), 20)).encode()
        s2 = "".join(rng.choice(list("ACGT"), L2)).encode()
        ps.append((s1, s2))
    tops, sides, l1, l2 = enc.encode_batch(ps)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_banded_batch(
            tops, sides, l1, l2, 2, 1, 1,
            interpret=True, band_rows=RB, chunk=8, unroll=4,
        )
    )
    np.testing.assert_array_equal(got, ref)
