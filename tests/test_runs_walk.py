"""Walk-engine equivalence: runs / hoststitch vs the per-cell walk.

The ``runs`` engine re-fills ``[run << 2 | code]`` bytes
(fill_pallas_banded ``with_runs``) and walks whole same-code runs per
gather (banded_traceback._make_runs_walk_loop); its record stream IS
the run-length-encoded op string, expanded host-side.  These tests
pin bit-exactness against the established two-pass engine — i.e.
against the reference's first-emitted alignment
(needleman-wunsch.c:209-331) — across run lengths that straddle the
63-cap, band boundaries, and group boundaries, gap-heavy paths where
runs degenerate, and the record-cap overflow fallback.
"""

import numpy as np
import pytest

from nw_tpu.ops import encode as enc
from nw_tpu.ops.banded_traceback import traceback_banded_batch

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")


def _compare(ps, mkd, kw, count=True, engines=("runs", "hoststitch")):
    tops, sides, l1, l2 = enc.encode_batch(ps)
    ref = traceback_banded_batch(
        tops, sides, l1, l2, *mkd, with_counts=count,
        engine="twopass", **kw
    )
    for engine in engines:
        got = traceback_banded_batch(
            tops, sides, l1, l2, *mkd, with_counts=count,
            engine=engine, **kw
        )
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def _rand_pairs(rng, n, lo, hi, alpha=b"ACGT"):
    return [
        (
            bytes(rng.choice(list(alpha), int(rng.integers(lo, hi)))),
            bytes(rng.choice(list(alpha), int(rng.integers(lo, hi)))),
        )
        for _ in range(n)
    ]


@pytest.mark.parametrize(
    "geometry,mkd,lo,hi",
    [
        ((8, 8, 4, 2), (2, 1, 1), 1, 40),    # tiny bands, tiny groups
        ((16, 16, 8, 2), (1, 1, 1), 1, 60),  # run cap straddles bands
        ((8, 16, 8, 4), (3, -1, 2), 1, 90),  # negative mismatch penalty
        ((24, 48, 8, 3), (0, 0, 0), 1, 90),  # degenerate scoring
    ],
)
def test_runs_engine_fuzz(geometry, mkd, lo, hi):
    RB, C, U, S = geometry
    rng = np.random.default_rng(hash((geometry, mkd)) % 2**32)
    ps = _rand_pairs(rng, 6, lo, hi)
    kw = dict(
        interpret=True, band_rows=RB, chunk=C, unroll=U, group_bands=S
    )
    _compare(ps, mkd, kw)


def test_runs_engine_long_runs_and_cap():
    """Pure-diag paths longer than the 63 run cap and than a band:
    the capped/band-split jumps must still land exactly."""
    rng = np.random.default_rng(3)
    base = bytes(rng.choice(list(b"ACGT"), 200))
    ps = [
        (base, base),                       # 200-diag run (3x the cap)
        (base, base[:150]),                 # mixed: diag run + lefts
        (base[:150], base),                 # diag run + ups
        (base[:64], base[:64]),             # run == cap + 1
        (base[:63], base[:63]),             # run == cap
    ]
    kw = dict(interpret=True, band_rows=16, chunk=16, unroll=8,
              group_bands=2)
    _compare(ps, (2, 1, 1), kw)


def test_runs_engine_gap_heavy():
    """Worst cases for run-skipping: paths that are mostly gaps
    (single-step records) and length-0 sides."""
    ps = [
        (b"A" * 90, b"T"),          # ~all lefts (left runs)
        (b"T", b"A" * 90),          # ~all ups (single-step)
        (b"A" * 50, b"A" * 2),
        (b"", b""),
        (b"", b"ACGT"),
        (b"ACGT", b""),
        (b"\x00" * 30, b"\x00" * 7),  # NUL bytes
    ]
    kw = dict(interpret=True, band_rows=8, chunk=8, unroll=8,
              group_bands=2)
    _compare(ps, (2, 1, 1), kw)


def test_runs_engine_vs_scan_oracle():
    """Independent oracle: the runs engine must equal the plain greedy
    traceback over full scan-filled arrows (not just the sibling
    engine)."""
    import jax.numpy as jnp

    from nw_tpu.ops import traceback as tb
    from nw_tpu.ops.fill_scan import fill_diag

    rng = np.random.default_rng(9)
    ps = _rand_pairs(rng, 5, 1, 50)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    sc, ops, n = traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 1, engine="runs",
        interpret=True, band_rows=16, chunk=8, unroll=8, group_bands=2,
    )
    for b, (a, s) in enumerate(ps):
        out = fill_diag(
            jnp.asarray(enc.encode(a)), jnp.asarray(enc.encode(s)),
            2, 1, 1,
        )
        ops_ref, n_ref = tb.traceback_greedy(
            out["arrows"], len(a), len(s), max_steps=len(a) + len(s)
        )
        assert int(n[b]) == int(n_ref)
        nn = int(n_ref)
        np.testing.assert_array_equal(
            np.asarray(ops)[b, :nn], np.asarray(ops_ref)[:nn]
        )


def test_runs_record_cap_overflow_falls_back(monkeypatch):
    """A record stream denser than the static cap must raise through
    the finalize and the batch wrapper must redo the work on the
    per-cell engine — bit-identically."""
    import nw_tpu.ops.banded_traceback as bt

    rng = np.random.default_rng(31)
    ps = _rand_pairs(rng, 4, 30, 60)
    tops, sides, l1, l2 = enc.encode_batch(ps)
    kw = dict(interpret=True, band_rows=8, chunk=8, unroll=8,
              group_bands=2)
    want = bt.traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 1, with_counts=True,
        engine="twopass", **kw
    )

    # force the cap below any real record count
    monkeypatch.setattr(bt, "_runs_record_cap", lambda A, S, RB: 4)
    # the raw finalize must refuse truncated records...
    out = bt.traceback_banded_dispatch(
        tops, sides, l1, l2, 2, 1, 1, with_counts=True, engine="runs",
        **kw
    )
    with pytest.raises(bt.RunsRecordOverflow):
        bt.traceback_banded_finalize(
            out, tops.shape[1], sides.shape[1], with_counts=True,
            engine="runs",
        )
    # ...and the batch wrapper must fall back and still be exact
    got = bt.traceback_banded_batch(
        tops, sides, l1, l2, 2, 1, 1, with_counts=True, engine="runs",
        **kw
    )
    for r, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
