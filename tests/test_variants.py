"""Smith-Waterman and affine-gap variants vs naive DPs."""

import numpy as np
import pytest

from nw_tpu.models.affine import affine_score
from nw_tpu.models.smith_waterman import sw_align, sw_fill_diag
from nw_tpu.ops.encode import encode
from nw_tpu.ops.fill_scan import fill_diag


def naive_sw(s1, s2, m, k, d):
    A, B = len(s1), len(s2)
    H = np.zeros((B + 1, A + 1), np.int64)
    for j in range(1, B + 1):
        for i in range(1, A + 1):
            sub = m if s1[i - 1] == s2[j - 1] else -k
            H[j, i] = max(0, H[j - 1, i - 1] + sub, H[j - 1, i] - d, H[j, i - 1] - d)
    return H


def naive_affine(s1, s2, m, k, op, ex):
    A, B = len(s1), len(s2)
    NEG = -(10**9)
    M = np.full((B + 1, A + 1), NEG, np.int64)
    IX = np.full((B + 1, A + 1), NEG, np.int64)
    IY = np.full((B + 1, A + 1), NEG, np.int64)
    M[0, 0] = 0
    for i in range(1, A + 1):
        IX[0, i] = -(op + (i - 1) * ex)
    for j in range(1, B + 1):
        IY[j, 0] = -(op + (j - 1) * ex)
    for j in range(1, B + 1):
        for i in range(1, A + 1):
            sub = m if s1[i - 1] == s2[j - 1] else -k
            M[j, i] = max(M[j - 1, i - 1], IX[j - 1, i - 1], IY[j - 1, i - 1]) + sub
            IX[j, i] = max(M[j, i - 1] - op, IX[j, i - 1] - ex)
            IY[j, i] = max(M[j - 1, i] - op, IY[j - 1, i] - ex)
    return max(M[B, A], IX[B, A], IY[B, A])


def test_sw_matches_naive():
    rng = np.random.default_rng(0)
    for _ in range(12):
        s1 = "".join(rng.choice(list("ACGT"), 12))
        s2 = "".join(rng.choice(list("ACGT"), 10))
        m, k, d = (int(x) for x in rng.integers(1, 4, 3))
        He = naive_sw(s1, s2, m, k, d)
        out = sw_fill_diag(encode(s1), encode(s2), m, k, d)
        assert int(out["score"]) == He.max(), (s1, s2, m, k, d)
        j, i = (int(x) for x in np.asarray(out["argmax"]))
        assert He[j, i] == He.max()


def test_sw_traceback_is_valid_local_alignment():
    score, X, Y, start = sw_align("TACGGGCCCGCTAC", "TAGCCCTATCGGTCA", 2, 1, 2)
    assert score > 0 and len(X) == len(Y)
    # re-score the returned alignment
    s = 0
    for c1, c2 in zip(X, Y):
        if c1 == c2:
            s += 2
        elif c1 == ord("-") or c2 == ord("-"):
            s -= 2
        else:
            s -= 1
    assert s == score


def test_affine_matches_naive():
    rng = np.random.default_rng(1)
    for _ in range(10):
        s1 = "".join(rng.choice(list("ACGT"), 11))
        s2 = "".join(rng.choice(list("ACGT"), 9))
        m, k = (int(x) for x in rng.integers(1, 4, 2))
        op = int(rng.integers(2, 6))
        ex = int(rng.integers(1, 4))
        ref = naive_affine(s1, s2, m, k, op, ex)
        got = int(affine_score(encode(s1), encode(s2), m, k, op, ex))
        assert got == ref, (s1, s2, m, k, op, ex)


def test_affine_linear_equivalence():
    """open == extend == d reproduces the linear-gap score."""
    rng = np.random.default_rng(2)
    for _ in range(6):
        s1 = "".join(rng.choice(list("ACGT"), 10))
        s2 = "".join(rng.choice(list("ACGT"), 10))
        lin = int(
            fill_diag(encode(s1), encode(s2), 2, 1, 3, with_arrows=False)["score"]
        )
        aff = int(affine_score(encode(s1), encode(s2), 2, 1, 3, 3))
        assert lin == aff


def test_affine_align_is_optimal():
    """affine_align produces a valid alignment achieving affine_score."""
    import numpy as np

    from nw_tpu.models.affine import affine_align, affine_score
    from nw_tpu.ops.encode import encode
    import jax.numpy as jnp

    def affine_cost(X, Y, m, k, op, ex):
        total, run_x, run_y = 0, 0, 0
        for x, y in zip(X, Y):
            if x == ord("-"):
                total += -(op if run_y == 0 else ex)
                run_y += 1
                run_x = 0
            elif y == ord("-"):
                total += -(op if run_x == 0 else ex)
                run_x += 1
                run_y = 0
            else:
                total += m if x == y else -k
                run_x = run_y = 0
        return total

    rng = np.random.default_rng(12)
    cases = [("GCATGCU", "GATTACA"), ("A", "A"), ("", "ACG"), ("ACG", ""), ("", "")]
    cases += [
        (
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 60)))),
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 60)))),
        )
        for _ in range(8)
    ]
    for m, k, op, ex in [(2, 1, 3, 1), (1, 1, 1, 1), (2, 3, 5, 2), (3, 1, 4, 0)]:
        for s1, s2 in cases:
            sc, X, Y = affine_align(s1, s2, m, k, op, ex)
            ref = int(
                affine_score(
                    jnp.asarray(encode(s1.encode())),
                    jnp.asarray(encode(s2.encode())),
                    m, k, op, ex,
                )
            )
            assert sc == ref, (s1, s2, sc, ref)
            assert bytes(c for c in X if c != ord("-")) == s1.encode()
            assert bytes(c for c in Y if c != ord("-")) == s2.encode()
            assert affine_cost(X, Y, m, k, op, ex) == ref, (s1, s2, X, Y)
