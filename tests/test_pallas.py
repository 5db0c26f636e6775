"""Pallas wavefront kernel vs the lax.scan fill (interpret mode on CPU;
the same kernel is verified on real TPU hardware by bench.py runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nw_tpu.ops.encode import encode_batch
from nw_tpu.ops.fill_pallas import fill_scores_pallas_batch
from nw_tpu.ops.fill_scan import fill_scores_batch


def _random_pairs(rng, n, lo, hi):
    return [
        (
            "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
            "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
        )
        for _ in range(n)
    ]


@pytest.mark.parametrize("m,k,d", [(2, 1, 1), (1, 1, 1), (-1, 2, -2), (0, 0, 0)])
def test_pallas_scores_match_scan(m, k, d):
    rng = np.random.default_rng(0)
    pairs = _random_pairs(rng, 12, 1, 19)
    tops, sides, l1, l2 = encode_batch(pairs, 20, 18)
    ref = np.asarray(
        fill_scores_batch(tops, sides, m, k, d, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_pallas_batch(tops, sides, l1, l2, m, k, d, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_pallas_multi_block():
    """More pairs than one 128-lane block."""
    rng = np.random.default_rng(1)
    pairs = _random_pairs(rng, 150, 5, 12)
    tops, sides, l1, l2 = encode_batch(pairs, 12, 12)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_pallas_batch(tops, sides, l1, l2, 2, 1, 1, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_pallas_asymmetric_buckets():
    rng = np.random.default_rng(2)
    pairs = [("ACGTACGTACGTACG", "AC"), ("A", "ACGTACGTACG"), ("GATTACA", "GCATGCU")]
    tops, sides, l1, l2 = encode_batch(pairs, 15, 11)
    ref = np.asarray(
        fill_scores_batch(tops, sides, 1, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    )
    got = np.asarray(
        fill_scores_pallas_batch(tops, sides, l1, l2, 1, 1, 1, interpret=True)
    )
    np.testing.assert_array_equal(ref, got)


def test_arrows_fold_kernel_interpret():
    """Long-pair fold-layout arrows kernel vs scan (interpret mode)."""
    import jax.numpy as jnp

    from nw_tpu.ops.fill_pallas_single import fill_arrows_fold_batch
    from nw_tpu.ops.fill_scan import fill_diag_batch

    rng = np.random.default_rng(4)
    pairs = _random_pairs(rng, 5, 1, 24)
    tops, sides, l1, l2 = encode_batch(pairs, 24, 24)
    ref = fill_diag_batch(tops, sides, 2, 1, 1, jnp.asarray(l1), jnp.asarray(l2))
    arr, sc = fill_arrows_fold_batch(tops, sides, l1, l2, 2, 1, 1, interpret=True)
    arr, sc = np.asarray(arr), np.asarray(sc)
    np.testing.assert_array_equal(sc, np.asarray(ref["score"]))
    ra = np.asarray(ref["arrows"])
    for b, (a, bs) in enumerate(pairs):
        A, B = len(a), len(bs)
        jj, ii = np.mgrid[0 : B + 1, 0 : A + 1]
        np.testing.assert_array_equal(arr[b][ii + jj, jj], ra[b][ii + jj, jj])
