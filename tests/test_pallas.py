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


@pytest.mark.parametrize("m,k,d", [(2, 1, 1), (1, 1, 1), (0, 0, 0)])
def test_arrows_batch_kernel_interpret(m, k, d):
    """Batch-in-lanes arrows kernel vs scan (valid cells + scores)."""
    import jax.numpy as jnp

    from nw_tpu.ops.fill_pallas import fill_arrows_pallas_batch, unpack_arrows32
    from nw_tpu.ops.fill_scan import fill_diag_batch

    rng = np.random.default_rng(3)
    pairs = _random_pairs(rng, 9, 1, 23)
    pairs += [("A", "A"), ("", "ACG"), ("ACG", "")]
    tops, sides, l1, l2 = encode_batch(pairs, 23, 23)
    ref = fill_diag_batch(tops, sides, m, k, d, jnp.asarray(l1), jnp.asarray(l2))
    arr, sc = fill_arrows_pallas_batch(tops, sides, l1, l2, m, k, d, interpret=True)
    arr, sc = np.asarray(arr), np.asarray(sc)
    np.testing.assert_array_equal(sc, np.asarray(ref["score"]))
    ra = np.asarray(ref["arrows"])
    for b, (a, bs) in enumerate(pairs):
        A, B = len(a), len(bs)
        jj, ii = np.mgrid[0 : B + 1, 0 : A + 1]
        np.testing.assert_array_equal(
            arr[ii + jj, jj, b], ra[b][ii + jj, jj], err_msg=f"pair {b}"
        )
    # packed layout agrees with its unpacking helper
    words, sc2 = fill_arrows_pallas_batch(
        tops, sides, l1, l2, m, k, d, interpret=True, packed=True
    )
    np.testing.assert_array_equal(np.asarray(sc2), sc)
    np.testing.assert_array_equal(np.asarray(unpack_arrows32(words)), arr)

    # dtype-dispatched consumers: packed == unpacked results
    import jax

    from nw_tpu.ops import pathcount, traceback

    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    cnt_u8 = jax.vmap(pathcount.count_paths, in_axes=(2, 0, 0))(
        jnp.asarray(arr), l1j, l2j
    )
    cnt_pk = jax.vmap(pathcount.count_paths, in_axes=(2, 0, 0))(
        words, l1j, l2j
    )
    np.testing.assert_array_equal(np.asarray(cnt_u8), np.asarray(cnt_pk))
    tb = lambda a, a1, a2: traceback.traceback_greedy(a, a1, a2, max_steps=46)
    ops_u8, n_u8 = jax.vmap(tb, in_axes=(2, 0, 0))(jnp.asarray(arr), l1j, l2j)
    ops_pk, n_pk = jax.vmap(tb, in_axes=(2, 0, 0))(words, l1j, l2j)
    np.testing.assert_array_equal(np.asarray(n_u8), np.asarray(n_pk))
    np.testing.assert_array_equal(np.asarray(ops_u8), np.asarray(ops_pk))

    # with_counts: fused counts == count_paths, arrows/scores unchanged
    words3, sc3, cnt3 = fill_arrows_pallas_batch(
        tops, sides, l1, l2, m, k, d,
        interpret=True, packed=True, with_counts=True,
    )
    np.testing.assert_array_equal(np.asarray(sc3), sc)
    np.testing.assert_array_equal(np.asarray(cnt3), np.asarray(cnt_u8))
    np.testing.assert_array_equal(np.asarray(unpack_arrows32(words3)), arr)


@pytest.mark.parametrize("m,k,d", [(2, 1, 1), (1, 1, 1), (0, 0, 0)])
def test_scores_counts_batch_interpret(m, k, d):
    """Fused batched score+count == scan fill + count_paths."""
    import jax
    import jax.numpy as jnp

    from nw_tpu.ops import pathcount
    from nw_tpu.ops.fill_pallas import fill_scores_counts_pallas_batch
    from nw_tpu.ops.fill_scan import fill_diag_batch

    rng = np.random.default_rng(5)
    pairs = _random_pairs(rng, 9, 1, 30) + [("A", "A"), ("", "ACG"), ("ACG", "")]
    tops, sides, l1, l2 = encode_batch(pairs, 30, 30)
    ref = fill_diag_batch(tops, sides, m, k, d, jnp.asarray(l1), jnp.asarray(l2))
    cnt_ref = jax.vmap(pathcount.count_paths)(
        ref["arrows"], jnp.asarray(l1), jnp.asarray(l2)
    )
    sc, cnt = fill_scores_counts_pallas_batch(
        tops, sides, l1, l2, m, k, d, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(sc), np.asarray(ref["score"]))
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(cnt_ref))


@pytest.mark.parametrize("m,k,d", [(2, 1, 1), (1, 1, 1), (0, 0, 0)])
def test_score_count_fold_interpret(m, k, d):
    """Fused single-pass score+count == full fill + count_paths."""
    import jax.numpy as jnp

    from nw_tpu.ops import pathcount
    from nw_tpu.ops.encode import encode
    from nw_tpu.ops.fill_pallas_single import score_count_fold
    from nw_tpu.ops.fill_scan import fill_diag

    rng = np.random.default_rng(6)
    cases = [
        ("GCATGCU", "GATTACA"),
        ("A", "A"),
        ("", "ACG"),
        ("ACG", ""),
    ] + [
        (
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 70)))),
            "".join(rng.choice(list("ACGT"), int(rng.integers(1, 70)))),
        )
        for _ in range(5)
    ]
    for s1, s2 in cases:
        top, side = encode(s1.encode()), encode(s2.encode())
        out = fill_diag(top, side, m, k, d)
        cnt_ref = int(pathcount.count_paths(out["arrows"], len(s1), len(s2)))
        sc, cnt = score_count_fold(
            jnp.asarray(top), jnp.asarray(side), m, k, d, interpret=True
        )
        assert int(sc) == int(out["score"]), (s1, s2)
        assert int(cnt) == cnt_ref, (s1, s2, int(cnt), cnt_ref)


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
    # packed layout: per-pair words feed the dtype-dispatching consumers
    import jax

    from nw_tpu.ops import pathcount

    words, sc2 = fill_arrows_fold_batch(
        tops, sides, l1, l2, 2, 1, 1, interpret=True, packed=True
    )
    np.testing.assert_array_equal(np.asarray(sc2), sc)
    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    cnt_u8 = jax.vmap(pathcount.count_paths)(jnp.asarray(arr), l1j, l2j)
    cnt_pk = jax.vmap(pathcount.count_paths)(words, l1j, l2j)
    np.testing.assert_array_equal(np.asarray(cnt_u8), np.asarray(cnt_pk))


def test_count_packed_kernel_interpret():
    """Pallas count-from-arrows kernel == count_paths (packed scan)."""
    import jax
    import jax.numpy as jnp

    from nw_tpu.ops import pathcount
    from nw_tpu.ops.fill_pallas import (
        count_packed_pallas_batch,
        fill_arrows_pallas_batch,
    )

    rng = np.random.default_rng(15)
    pairs = _random_pairs(rng, 10, 1, 35) + [("A", "A"), ("", "ACG"), ("ACG", "")]
    for m, k, d in [(2, 1, 1), (0, 0, 0)]:
        tops, sides, l1, l2 = encode_batch(pairs, 35, 35)
        words, sc = fill_arrows_pallas_batch(
            tops, sides, l1, l2, m, k, d, interpret=True, packed=True
        )
        ref = jax.vmap(pathcount.count_paths, in_axes=(2, 0, 0))(
            words, jnp.asarray(l1), jnp.asarray(l2)
        )
        got = count_packed_pallas_batch(words, l1, l2, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
