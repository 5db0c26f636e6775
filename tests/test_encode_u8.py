"""uint8 sequence encoding (0-pad) vs the sentinel int32 encoding.

``encode_batch_u8`` exists to shrink the host->device sequence upload
4x (the measurement host's ~27 ms tunnel moves ~85 MB/s; see
``ops/encode.py``).  Its 0-pad is only sound because every consumer
extracts lens-masked, true-rectangle outputs — these tests pin that
equivalence on the real pipelines (ADVICE r3 item 1), including
mixed-length batches and NUL bytes (a real byte that COLLIDES with the
0 pad), before the model layer routes uploads through it.
"""

import numpy as np
import pytest

from nw_tpu.ops import encode as enc

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _mixed_pairs(rng, n, lo, hi, nul_every=3):
    """Random byte pairs with mixed lengths; every ``nul_every``-th pair
    gets NUL bytes spliced in (the 0-pad collision case)."""
    ps = []
    for i in range(n):
        a = bytes(rng.integers(1, 255, int(rng.integers(lo, hi))).astype(np.uint8))
        b = bytes(rng.integers(1, 255, int(rng.integers(lo, hi))).astype(np.uint8))
        if nul_every and i % nul_every == 0:
            a = b"\x00" + a + b"\x00"
            b = b[: len(b) // 2] + b"\x00" + b[len(b) // 2 :]
        ps.append((a, b))
    return ps


def test_u8_matches_int32_on_true_region():
    rng = np.random.default_rng(7)
    ps = _mixed_pairs(rng, 9, 1, 30)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    tops8, sides8, l1b, l2b = enc.encode_batch_u8(ps)
    assert tops8.dtype == np.uint8 and sides8.dtype == np.uint8
    np.testing.assert_array_equal(l1, l1b)
    np.testing.assert_array_equal(l2, l2b)
    assert tops8.shape == tops.shape and sides8.shape == sides.shape
    for i in range(len(ps)):
        np.testing.assert_array_equal(
            tops8[i, : l1[i]].astype(np.int32), tops[i, : l1[i]]
        )
        np.testing.assert_array_equal(
            sides8[i, : l2[i]].astype(np.int32), sides[i, : l2[i]]
        )
        # pad region: 0 bytes (uint8) vs the sentinels (int32)
        assert (tops8[i, l1[i] :] == 0).all()
        assert (tops[i, l1[i] :] == enc.PAD_TOP).all()
        assert (sides8[i, l2[i] :] == 0).all()
        assert (sides[i, l2[i] :] == enc.PAD_SIDE).all()


def test_u8_empty_and_bucket():
    tops8, sides8, l1, l2 = enc.encode_batch_u8([])
    assert tops8.shape == (0, 0) and l1.shape == (0,)
    tops8, sides8, l1, l2 = enc.encode_batch_u8([(b"AB", b"C")], 5, 4)
    assert tops8.shape == (1, 5) and sides8.shape == (1, 4)
    with pytest.raises(ValueError):
        enc.encode_batch_u8([(b"ABCDEF", b"C")], 5, 4)


def test_u8_banded_traceback_equivalence():
    """Full banded two-pass pipeline (the config-3 engine) on uint8 vs
    sentinel-int32 inputs: identical scores, counts, and walks."""
    from nw_tpu.ops.banded_traceback import traceback_banded_batch

    rng = np.random.default_rng(11)
    ps = _mixed_pairs(rng, 6, 1, 50)
    kw = dict(interpret=True, band_rows=16, chunk=8, unroll=8)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    ref = traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 1, with_counts=True, **kw
    )
    tops8, sides8, _, _ = enc.encode_batch_u8(ps)
    got = traceback_banded_batch(
        tops8, sides8, l1, l2, 2, 1, 1, with_counts=True, **kw
    )
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_u8_banded_scores_equivalence():
    from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

    rng = np.random.default_rng(13)
    ps = _mixed_pairs(rng, 6, 1, 60)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    tops8, sides8, _, _ = enc.encode_batch_u8(ps)
    kw = dict(interpret=True, band_rows=16, chunk=8, unroll=8)
    ref = np.asarray(
        fill_scores_banded_batch(tops, sides, l1, l2, 3, -1, 2, **kw)
    )
    got = np.asarray(
        fill_scores_banded_batch(tops8, sides8, l1, l2, 3, -1, 2, **kw)
    )
    np.testing.assert_array_equal(got, ref)


def test_u8_rowsweep_equivalence():
    """Row-sweep score/counts/greedy-arrows engines (the short-read
    production route) on uint8 vs sentinel inputs."""
    from nw_tpu.ops.arrows_rowsweep import fill_greedy_rowsweep_batch
    from nw_tpu.ops.fill_rowsweep import (
        fill_scores_counts_rowsweep_batch,
        fill_scores_rowsweep_batch,
    )

    rng = np.random.default_rng(17)
    ps = _mixed_pairs(rng, 8, 1, 24)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    tops8, sides8, _, _ = enc.encode_batch_u8(ps)
    kw = dict(rows=4, interpret=True)

    ref = np.asarray(fill_scores_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1, **kw))
    got = np.asarray(fill_scores_rowsweep_batch(tops8, sides8, l1, l2, 2, 1, 1, **kw))
    np.testing.assert_array_equal(got, ref)

    rs, rc = fill_scores_counts_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1, **kw)
    gs, gc = fill_scores_counts_rowsweep_batch(tops8, sides8, l1, l2, 2, 1, 1, **kw)
    np.testing.assert_array_equal(np.asarray(gs), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(gc), np.asarray(rc))

    rw, rsc = fill_greedy_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1, **kw)
    gw, gsc = fill_greedy_rowsweep_batch(tops8, sides8, l1, l2, 2, 1, 1, **kw)
    np.testing.assert_array_equal(np.asarray(gsc), np.asarray(rsc))
    B = len(ps)
    # walk words beyond the true rectangle may differ (pad-region cells);
    # compare the decoded greedy walks instead, which read only true cells
    from nw_tpu.ops.traceback import traceback_greedy2_rowmajor

    max_steps = int(l1.max() + l2.max())
    for i in range(B):
        r_ops, r_n = traceback_greedy2_rowmajor(
            np.asarray(rw)[..., i], int(l1[i]), int(l2[i]), max_steps
        )
        g_ops, g_n = traceback_greedy2_rowmajor(
            np.asarray(gw)[..., i], int(l1[i]), int(l2[i]), max_steps
        )
        assert int(g_n) == int(r_n)
        np.testing.assert_array_equal(np.asarray(g_ops), np.asarray(r_ops))


def test_u8_variant_banded_traceback_equivalence():
    """SW / Gotoh / overlap banded full-alignment engines on uint8 vs
    sentinel inputs (their best/argmax updates are in_rect-masked, so
    the 0-pad must be invisible)."""
    from nw_tpu.ops.variants_banded import (
        affine_traceback_banded_batch,
        overlap_traceback_banded_batch,
        sw_traceback_banded_batch,
    )

    rng = np.random.default_rng(19)
    ps = _mixed_pairs(rng, 5, 1, 40)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    tops8, sides8, _, _ = enc.encode_batch_u8(ps)
    kw = dict(interpret=True, band_rows=16, chunk=8, unroll=8, group_bands=2)

    for fn, params in (
        (sw_traceback_banded_batch, (2, 1, 1)),
        (overlap_traceback_banded_batch, (2, 1, 1)),
        (affine_traceback_banded_batch, (2, 1, 3, 1)),
    ):
        ref = fn(tops, sides, l1, l2, *params, **kw)
        got = fn(tops8, sides8, l1, l2, *params, **kw)
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_u8_variant_rowsweep_equivalence():
    from nw_tpu.ops.variants_rowsweep import (
        affine_scores_rowsweep_batch,
        overlap_scores_rowsweep_batch,
        sw_scores_rowsweep_batch,
    )

    rng = np.random.default_rng(23)
    ps = _mixed_pairs(rng, 8, 1, 24)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    tops8, sides8, _, _ = enc.encode_batch_u8(ps)
    kw = dict(rows=4, interpret=True)

    for fn, params in (
        (sw_scores_rowsweep_batch, (2, 1, 1)),
        (overlap_scores_rowsweep_batch, (2, 1, 1)),
        (affine_scores_rowsweep_batch, (2, 1, 3, 1)),
    ):
        ref = np.asarray(fn(tops, sides, l1, l2, *params, **kw))
        got = np.asarray(fn(tops8, sides8, l1, l2, *params, **kw))
        np.testing.assert_array_equal(got, ref)
