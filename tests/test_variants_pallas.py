"""Variant Pallas kernels (SW local, affine Gotoh) vs the scan engines."""

import jax.numpy as jnp
import numpy as np
import pytest

from nw_tpu.models.affine import affine_score
from nw_tpu.models.smith_waterman import sw_fill_diag
from nw_tpu.ops.encode import encode, encode_batch
from nw_tpu.ops.variants_pallas import (
    affine_scores_pallas_batch,
    sw_scores_pallas_batch,
)


def _pairs(rng, n, lo, hi):
    return [
        (
            "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
            "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
        )
        for _ in range(n)
    ]


@pytest.mark.parametrize("m,k,d", [(2, 1, 1), (1, 1, 1), (3, 2, 5), (2, 3, 1)])
def test_sw_batch_matches_scan(m, k, d):
    rng = np.random.default_rng(7)
    pairs = _pairs(rng, 10, 1, 40) + [("A", "A"), ("AC", "GT")]
    tops, sides, l1, l2 = encode_batch(pairs, 40, 40)
    got = np.asarray(
        sw_scores_pallas_batch(tops, sides, l1, l2, m, k, d, interpret=True)
    )
    for b, (a, s) in enumerate(pairs):
        ref = int(
            sw_fill_diag(
                jnp.asarray(encode(a.encode())),
                jnp.asarray(encode(s.encode())),
                m, k, d, with_arrows=False,
            )["score"]
        )
        assert got[b] == ref, (b, a, s, got[b], ref)


@pytest.mark.parametrize(
    "m,k,op,ex", [(2, 1, 3, 1), (1, 1, 1, 1), (2, 3, 5, 2), (3, 1, 4, 0)]
)
def test_affine_batch_matches_scan(m, k, op, ex):
    rng = np.random.default_rng(8)
    pairs = _pairs(rng, 10, 1, 40) + [("A", "A"), ("", "ACG"), ("ACG", "")]
    tops, sides, l1, l2 = encode_batch(pairs, 40, 40)
    got = np.asarray(
        affine_scores_pallas_batch(
            tops, sides, l1, l2, m, k, op, ex, interpret=True
        )
    )
    for b, (a, s) in enumerate(pairs):
        ref = int(
            affine_score(
                jnp.asarray(encode(a.encode())),
                jnp.asarray(encode(s.encode())),
                m, k, op, ex,
            )
        )
        assert got[b] == ref, (b, a, s, got[b], ref)


def test_model_batch_apis():
    """Model-level ragged batch scoring == per-pair scan engines."""
    from nw_tpu.models.affine import affine_score_pairs
    from nw_tpu.models.smith_waterman import sw_score_batch

    rng = np.random.default_rng(9)
    pairs = _pairs(rng, 8, 1, 50)
    sw = sw_score_batch(pairs, 2, 1, 1)
    af = affine_score_pairs(pairs, 2, 1, 3, 1)
    for b, (a, s) in enumerate(pairs):
        t, si = jnp.asarray(encode(a.encode())), jnp.asarray(encode(s.encode()))
        assert sw[b] == int(sw_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"])
        assert af[b] == int(affine_score(t, si, 2, 1, 3, 1))


def test_sw_align_batch_matches_single():
    """Batched SW alignment (kernel argmax + device walk) == sw_align."""
    from nw_tpu.models.smith_waterman import sw_align, sw_align_batch

    rng = np.random.default_rng(31)
    pairs = _pairs(rng, 10, 1, 45) + [("AAAA", "TTTT"), ("A", "A"), ("AC", "CA")]
    for m, k, d in [(2, 1, 1), (3, 2, 2), (1, 1, 1)]:
        got = sw_align_batch(pairs, m, k, d)
        for b, (a, s) in enumerate(pairs):
            want = sw_align(a, s, m, k, d)
            assert got[b] == want, (b, a, s, m, k, d, got[b], want)


def test_affine_align_batch_matches_single():
    """Batched affine alignment (Gotoh arrows kernel + device walk)
    == per-pair affine_align."""
    from nw_tpu.models.affine import affine_align, affine_align_batch

    rng = np.random.default_rng(41)
    pairs = _pairs(rng, 9, 1, 45) + [("A", "A"), ("", "ACG"), ("ACG", "")]
    for m, k, op, ex in [(2, 1, 3, 1), (1, 1, 1, 1), (3, 1, 4, 0)]:
        got = affine_align_batch(pairs, m, k, op, ex)
        for b, (a, s) in enumerate(pairs):
            want = affine_align(a, s, m, k, op, ex)
            assert got[b] == want, (b, a, s, m, k, op, ex, got[b], want)


def test_variant_batch_long_side_fallback():
    """Sides beyond the kernels' VMEM bounds fall back to the scan
    engines with identical results."""
    import numpy as np

    from nw_tpu.models.affine import affine_align, affine_align_batch
    from nw_tpu.models.smith_waterman import sw_align, sw_align_batch

    rng = np.random.default_rng(53)
    long_b = "".join(rng.choice(list("ACGT"), 2100))
    pairs = [("ACGTAC", long_b), ("GATTACA", "GCATGCU")]
    got = sw_align_batch(pairs, 2, 1, 1)
    assert got[0] == sw_align(*pairs[0], 2, 1, 1)
    assert got[1] == sw_align(*pairs[1], 2, 1, 1)
    long_b2 = "".join(rng.choice(list("ACGT"), 1100))
    pairs2 = [("ACGTAC", long_b2), ("GATTACA", "GCATGCU")]
    got2 = affine_align_batch(pairs2, 2, 1, 3, 1)
    assert got2[0] == affine_align(*pairs2[0], 2, 1, 3, 1)
    assert got2[1] == affine_align(*pairs2[1], 2, 1, 3, 1)


def test_variant_score_long_side_fallback():
    """Score APIs beyond the kernels' VMEM bounds fall back to scan."""
    import numpy as np

    from nw_tpu.models.affine import affine_score_pairs
    from nw_tpu.models.smith_waterman import sw_score_batch

    rng = np.random.default_rng(57)
    long_b = "".join(rng.choice(list("ACGT"), 4200))
    sw = sw_score_batch([("ACGTAC", long_b)], 2, 1, 1)
    assert sw.shape == (1,) and sw[0] >= 0
    long_b2 = "".join(rng.choice(list("ACGT"), 3200))
    af = affine_score_pairs([("ACGTAC", long_b2)], 2, 1, 3, 1)
    assert af.shape == (1,)
