"""On-hardware validation sweep: every Pallas path vs the scan oracles.

The pytest suite runs on CPU (interpret mode) by design; this script
exercises the COMPILED kernels on the real TPU and cross-checks them
against the lax.scan reference implementations.  Run on a TPU host:

    python scripts/tpu_validate.py

Prints one PASS/FAIL line per path and exits nonzero on any failure.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

FAILED = []


def check(name, fn):
    try:
        fn()
        print(f"PASS {name}")
    except Exception as e:  # noqa: BLE001
        FAILED.append(name)
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        import os
        import traceback
        if os.environ.get("NW_TPU_VALIDATE_TRACE"):
            traceback.print_exc()


def main() -> int:
    from nw_tpu.cli import enable_default_compile_cache

    enable_default_compile_cache()
    if jax.devices()[0].platform != "tpu":
        print("not a TPU host; nothing to validate", file=sys.stderr)
        return 1

    rng = np.random.default_rng(0)

    def pairs(n, lo, hi):
        return [
            (
                "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
                "".join(rng.choice(list("ACGT"), int(rng.integers(lo, hi)))),
            )
            for _ in range(n)
        ]

    from nw_tpu.ops import encode as enc
    from nw_tpu.ops import pathcount, traceback
    from nw_tpu.ops.fill_scan import fill_diag_batch, fill_scores_batch

    ps = pairs(140, 1, 120)
    tops, sides, l1, l2 = enc.encode_batch(
        [(a.encode(), b.encode()) for a, b in ps], 120, 120
    )
    l1j, l2j = jnp.asarray(l1), jnp.asarray(l2)
    ref = fill_diag_batch(tops, sides, 2, 1, 1, l1j, l2j)
    ref_scores = np.asarray(ref["score"])
    ref_counts = np.asarray(jax.vmap(pathcount.count_paths)(ref["arrows"], l1j, l2j))

    def scores():
        from nw_tpu.ops.fill_pallas import fill_scores_pallas_batch

        got = np.asarray(fill_scores_pallas_batch(tops, sides, l1, l2, 2, 1, 1))
        assert (got == ref_scores).all()

    def arrows():
        from nw_tpu.ops.fill_pallas import fill_arrows_pallas_batch

        w, s = fill_arrows_pallas_batch(tops, sides, l1, l2, 2, 1, 1, packed=True)
        assert (np.asarray(s) == ref_scores).all()
        c = jax.vmap(pathcount.count_paths, in_axes=(2, 0, 0))(w, l1j, l2j)
        assert (np.asarray(c) == ref_counts).all()
        tb = lambda a, a1, a2: traceback.traceback_greedy(a, a1, a2, max_steps=240)
        o1, n1 = jax.vmap(tb)(ref["arrows"], l1j, l2j)
        o2, n2 = jax.vmap(tb, in_axes=(2, 0, 0))(w, l1j, l2j)
        assert (np.asarray(n1) == np.asarray(n2)).all()
        assert (np.asarray(o1) == np.asarray(o2)).all()

    def arrows_counts_fused():
        from nw_tpu.ops.fill_pallas import fill_arrows_pallas_batch

        _, s, c = fill_arrows_pallas_batch(
            tops, sides, l1, l2, 2, 1, 1, packed=True, with_counts=True
        )
        assert (np.asarray(s) == ref_scores).all()
        assert (np.asarray(c) == ref_counts).all()

    def scores_counts_fused():
        from nw_tpu.ops.fill_pallas import fill_scores_counts_pallas_batch

        s, c = fill_scores_counts_pallas_batch(tops, sides, l1, l2, 2, 1, 1)
        assert (np.asarray(s) == ref_scores).all()
        assert (np.asarray(c) == ref_counts).all()

    def count_kernel():
        from nw_tpu.ops.fill_pallas import (
            count_packed_pallas_batch,
            fill_arrows_pallas_batch,
        )

        w, _ = fill_arrows_pallas_batch(tops, sides, l1, l2, 2, 1, 1, packed=True)
        c = count_packed_pallas_batch(w, l1, l2)
        assert (np.asarray(c) == ref_counts).all()

    def fold_arrows():
        from nw_tpu.ops.fill_pallas_single import fill_arrows_fold_batch

        w, s = fill_arrows_fold_batch(
            tops[:6], sides[:6], l1[:6], l2[:6], 2, 1, 1, packed=True
        )
        assert (np.asarray(s) == ref_scores[:6]).all()
        c = jax.vmap(pathcount.count_paths)(w, l1j[:6], l2j[:6])
        assert (np.asarray(c) == ref_counts[:6]).all()

    def fold_scalar():
        from nw_tpu.ops.fill_pallas_single import last_row_pallas, score_count_fold

        for b in (0, 3):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            row = last_row_pallas(t, si, 2, 1, 1)
            assert int(row[-1]) == ref_scores[b]
            sc, cnt = score_count_fold(t, si, 2, 1, 1)
            assert int(sc) == ref_scores[b] and int(cnt) == ref_counts[b]

    def checkpoint_walk():
        from nw_tpu.ops.checkpoint_traceback import traceback_checkpointed

        for b in (0, 5):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            ops, n = traceback_checkpointed(t, si, 2, 1, 1, block_diagonals=64)
            opsr, nr = traceback.traceback_greedy(
                jnp.asarray(ref["arrows"])[b], len(a), len(s2),
                max_steps=len(a) + len(s2),
            )
            assert int(n) == int(nr)
            assert (np.asarray(ops)[: int(n)] == np.asarray(opsr)[: int(n)]).all()

    def variants():
        from nw_tpu.models.affine import affine_score
        from nw_tpu.models.smith_waterman import sw_fill_diag
        from nw_tpu.ops.variants_pallas import (
            affine_scores_pallas_batch,
            sw_scores_pallas_batch,
        )

        sw = np.asarray(sw_scores_pallas_batch(tops, sides, l1, l2, 2, 1, 1))
        af = np.asarray(affine_scores_pallas_batch(tops, sides, l1, l2, 2, 1, 3, 1))
        for b in range(0, len(ps), 23):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            assert sw[b] == int(
                sw_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            )
            assert af[b] == int(affine_score(t, si, 2, 1, 3, 1))

    def long_side_scores():
        from nw_tpu.ops.fill_auto import fill_scores_auto
        from nw_tpu.ops.fill_pallas_single import score_pallas_single

        L = 6000
        t6 = jnp.asarray(rng.integers(65, 69, (8, L)), jnp.int32)
        s6 = jnp.asarray(rng.integers(65, 69, (8, L)), jnp.int32)
        lv = np.full((8,), L, np.int32)
        got = np.asarray(fill_scores_auto(t6, s6, lv, lv, 2, 1, 1, platform="tpu"))
        for b in (0, 7):
            ref = int(score_pallas_single(t6[b], s6[b], 2, 1, 1))
            assert got[b] == ref

    def variant_alignments():
        from nw_tpu.models.affine import affine_align, affine_align_batch
        from nw_tpu.models.smith_waterman import sw_align, sw_align_batch

        sub = ps[:24]
        sw = sw_align_batch(sub, 2, 1, 1)
        af = affine_align_batch(sub, 2, 1, 3, 1)
        for b, (a, s2) in enumerate(sub):
            assert sw[b] == sw_align(a, s2, 2, 1, 1), b
            assert af[b] == affine_align(a, s2, 2, 1, 3, 1), b

    def banded_scores():
        from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch
        from nw_tpu.ops.fill_pallas_single import score_pallas_single

        # small geometry: multi-band boundary handoff on mixed lengths
        got = np.asarray(
            fill_scores_banded_batch(
                tops, sides, l1, l2, 2, 1, 1,
                band_rows=24, chunk=24, unroll=8,
            )
        )
        assert (got == ref_scores).all()
        # production geometry at 10 kb (the VERDICT r1 tiled-kernel check)
        L = 10240
        t10 = jnp.asarray(rng.integers(65, 69, (32, L)), jnp.int32)
        s10 = jnp.asarray(rng.integers(65, 69, (32, L)), jnp.int32)
        lv = np.full((32,), L, np.int32)
        got10 = np.asarray(fill_scores_banded_batch(t10, s10, lv, lv, 2, 1, 1))
        for b in (0, 31):
            assert int(got10[b]) == int(score_pallas_single(t10[b], s10[b], 2, 1, 1))

    def banded_single_arrows():
        from nw_tpu.ops.fill_pallas_banded import fill_arrows_banded_single

        w, s, cts = fill_arrows_banded_single(
            tops, sides, l1, l2, 2, 1, 1, with_counts=True
        )
        assert (np.asarray(s) == ref_scores).all()
        assert (np.asarray(cts) == ref_counts).all()
        # flat packed layout: the dtype-dispatching consumers read it
        c = jax.vmap(pathcount.count_paths, in_axes=(2, 0, 0))(w, l1j, l2j)
        assert (np.asarray(c) == ref_counts).all()
        tb = lambda a, a1, a2: traceback.traceback_greedy(a, a1, a2, max_steps=240)
        o1, n1 = jax.vmap(tb)(ref["arrows"], l1j, l2j)
        o2, n2 = jax.vmap(tb, in_axes=(2, 0, 0))(w, l1j, l2j)
        assert (np.asarray(n1) == np.asarray(n2)).all()
        assert (np.asarray(o1) == np.asarray(o2)).all()

    def greedy2_arrows():
        from nw_tpu.ops.fill_pallas_banded import fill_greedy_banded_single
        from nw_tpu.ops.traceback import traceback_greedy2_batch

        w2, s = fill_greedy_banded_single(tops, sides, l1, l2, 2, 1, 1)
        assert (np.asarray(s) == ref_scores).all()
        o2, n2 = traceback_greedy2_batch(w2, l1j, l2j, max_steps=240)
        tb = lambda a, a1, a2: traceback.traceback_greedy(a, a1, a2, max_steps=240)
        o1, n1 = jax.vmap(tb)(ref["arrows"], l1j, l2j)
        assert (np.asarray(n1) == np.asarray(n2)).all()
        o1, o2, n1 = np.asarray(o1), np.asarray(o2), np.asarray(n1)
        for b in range(len(ps)):
            assert (o1[b, : n1[b]] == o2[b, : n1[b]]).all(), b

    def rowsweep_scores():
        from nw_tpu.ops.fill_rowsweep import fill_scores_rowsweep_batch

        got = np.asarray(
            fill_scores_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1)
        )
        assert (got == ref_scores).all()

    def rowsweep_groups():
        from nw_tpu.ops.fill_rowsweep import fill_scores_rowsweep_batch

        got = np.asarray(
            fill_scores_rowsweep_batch(
                tops, sides, l1, l2, 2, 1, 1, rows=8, groups=2
            )
        )
        assert (got == ref_scores).all()

    def rowsweep_groups_family():
        """groups=2 geometry (SL=16 blocks) for every other compiled
        row-sweep engine — rowsweep_tune.py's sweep configs must have a
        correctness cross-check (CLAUDE.md: anything compiled is
        covered here)."""
        from nw_tpu.models.affine import affine_score
        from nw_tpu.models.smith_waterman import sw_fill_diag
        from nw_tpu.ops.arrows_rowsweep import fill_greedy_rowsweep_batch
        from nw_tpu.ops.fill_rowsweep import (
            fill_scores_counts_rowsweep_batch,
        )
        from nw_tpu.ops.variants_rowsweep import (
            affine_scores_rowsweep_batch,
            sw_scores_rowsweep_batch,
        )

        w, s = fill_greedy_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, groups=2
        )
        assert (np.asarray(s) == ref_scores).all()
        o2, n2 = traceback.traceback_greedy2_rowmajor_batch(
            w[:, :, : len(ps)], l1j, l2j, max_steps=240
        )
        tb = lambda a, a1, a2: traceback.traceback_greedy(
            a, a1, a2, max_steps=240
        )
        o1, n1 = jax.vmap(tb)(ref["arrows"], l1j, l2j)
        assert (np.asarray(n1) == np.asarray(n2)).all()
        sc, ct = fill_scores_counts_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, groups=2
        )
        assert (np.asarray(sc) == ref_scores).all()
        assert (np.asarray(ct) == ref_counts.astype(np.uint32)).all()
        sw = np.asarray(
            sw_scores_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1, groups=2)
        )
        af = np.asarray(
            affine_scores_rowsweep_batch(
                tops, sides, l1, l2, 2, 1, 3, 1, groups=2
            )
        )
        for b in range(0, len(ps), 37):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            assert sw[b] == int(
                sw_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            )
            assert af[b] == int(affine_score(t, si, 2, 1, 3, 1))

    def rowsweep_greedy():
        from nw_tpu.ops.arrows_rowsweep import fill_greedy_rowsweep_batch
        from nw_tpu.ops.traceback import traceback_greedy2_rowmajor_batch

        w, s = fill_greedy_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1)
        assert (np.asarray(s) == ref_scores).all()
        o2, n2 = traceback_greedy2_rowmajor_batch(
            w[:, :, : len(ps)], l1j, l2j, max_steps=240
        )
        tb = lambda a, a1, a2: traceback.traceback_greedy(a, a1, a2, max_steps=240)
        o1, n1 = jax.vmap(tb)(ref["arrows"], l1j, l2j)
        assert (np.asarray(n1) == np.asarray(n2)).all()
        o1, o2, n1 = np.asarray(o1), np.asarray(o2), np.asarray(n1)
        for b in range(len(ps)):
            assert (o1[b, : n1[b]] == o2[b, : n1[b]]).all(), b

    def rowsweep_counts():
        from nw_tpu.ops.fill_rowsweep import (
            fill_scores_counts_rowsweep_batch,
        )

        s, c = fill_scores_counts_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1)
        assert (np.asarray(s) == ref_scores).all()
        assert (np.asarray(c) == ref_counts.astype(np.uint32)).all()

    def rowsweep_tuned():
        """Every row-sweep engine at its ROWSWEEP_TUNED production
        knobs — the exact (rows, groups) geometries align_batch and
        the variant models dispatch (fill_auto.rowsweep_pick)."""
        from nw_tpu.models.affine import affine_score
        from nw_tpu.models.overlap import overlap_fill_diag
        from nw_tpu.models.smith_waterman import sw_fill_diag
        from nw_tpu.ops.arrows_rowsweep import fill_greedy_rowsweep_batch
        from nw_tpu.ops.fill_auto import rowsweep_knobs
        from nw_tpu.ops.fill_rowsweep import (
            fill_scores_counts_rowsweep_batch,
            fill_scores_rowsweep_batch,
        )
        from nw_tpu.ops.variants_rowsweep import (
            affine_scores_rowsweep_batch,
            overlap_scores_rowsweep_batch,
            sw_scores_rowsweep_batch,
        )

        r, g = rowsweep_knobs("score")
        got = np.asarray(fill_scores_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=r, groups=g))
        assert (got == ref_scores).all(), ("score", r, g)

        r, g = rowsweep_knobs("greedy")
        w, s = fill_greedy_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=r, groups=g)
        assert (np.asarray(s) == ref_scores).all(), ("greedy", r, g)
        # the (16, 2) padding-free geometry rowsweep_pick takes at
        # NB % 4096 != 0 (e.g. the 10240-pair bench batch)
        w, s = fill_greedy_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=r, groups=max(g // 2, 1))
        assert (np.asarray(s) == ref_scores).all(), ("greedy", r, g // 2)

        r, g = rowsweep_knobs("counts")
        sc, ct = fill_scores_counts_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=r, groups=g)
        assert (np.asarray(sc) == ref_scores).all(), ("counts", r, g)
        assert (np.asarray(ct) == ref_counts.astype(np.uint32)).all()

        r, g = rowsweep_knobs("sw")
        sw = np.asarray(sw_scores_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=r, groups=g))
        r, g = rowsweep_knobs("affine")
        af = np.asarray(affine_scores_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 3, 1, rows=r, groups=g))
        r, g = rowsweep_knobs("overlap")
        ov = np.asarray(overlap_scores_rowsweep_batch(
            tops, sides, l1, l2, 2, 1, 1, rows=r, groups=g))
        for b in range(0, len(ps), 29):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            assert sw[b] == int(
                sw_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            ), ("sw", b)
            assert af[b] == int(affine_score(t, si, 2, 1, 3, 1)), ("af", b)
            assert ov[b] == int(
                overlap_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            ), ("ov", b)

    def rowsweep_overlap():
        from nw_tpu.models.overlap import overlap_fill_diag
        from nw_tpu.ops.variants_rowsweep import (
            overlap_scores_rowsweep_batch,
        )

        got = np.asarray(
            overlap_scores_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1)
        )
        for b in range(0, len(ps), 23):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            want = int(
                overlap_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            )
            assert got[b] == want, b

    def banded_overlap():
        from nw_tpu.models.overlap import overlap_fill_diag
        from nw_tpu.ops.variants_banded import overlap_scores_banded_batch

        got = np.asarray(
            overlap_scores_banded_batch(tops, sides, l1, l2, 2, 1, 1)
        )
        for b in range(0, len(ps), 23):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            want = int(
                overlap_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            )
            assert got[b] == want, b
        # long-side production geometry
        rngl = np.random.default_rng(97)
        L = 4000
        psl = [
            (rngl.integers(65, 69, L).astype(np.uint8).tobytes(),
             rngl.integers(65, 69, L - 63).astype(np.uint8).tobytes())
            for _ in range(3)
        ]
        tl, sl, a1, a2 = enc.encode_batch(psl)
        gl = np.asarray(
            overlap_scores_banded_batch(tl, sl, a1, a2, 2, 1, 1)
        )
        for b, (a, s2) in enumerate(psl):
            t = jnp.asarray(enc.encode(a))
            si = jnp.asarray(enc.encode(s2))
            assert gl[b] == int(
                overlap_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            ), b

    def banded_overlap_traceback():
        from nw_tpu.models.overlap import overlap_align
        from nw_tpu.ops.traceback import ops_to_strings
        from nw_tpu.ops.variants_banded import (
            overlap_traceback_banded_batch,
        )

        rngo = np.random.default_rng(113)
        pso = [
            (rngo.integers(65, 69, 2500).astype(np.uint8).tobytes(),
             rngo.integers(65, 69, 2400 + 61 * b).astype(np.uint8).tobytes())
            for b in range(3)
        ]
        t2, s2_, a1, a2 = enc.encode_batch(pso)
        best, jst, ist, j_end, i_end, ops_o, n_o = (
            overlap_traceback_banded_batch(t2, s2_, a1, a2, 2, 1, 1)
        )
        # every pair: the ragged lengths cross different band/group
        # boundaries, and a compiled-only defect may hit only one
        for b, (a, s2) in enumerate(pso):
            sc, X, Y, start, end = overlap_align(a, s2, 2, 1, 1)
            assert best[b] == sc, b
            assert (int(jst[b]), int(ist[b])) == end, b
            assert (int(j_end[b]), int(i_end[b])) == start, b
            gX, gY = ops_to_strings(
                ops_o[b], int(n_o[b]), a[: int(ist[b])], s2[: int(jst[b])]
            )
            assert (gX, gY) == (X, Y), b

    def rowsweep_variants():
        from nw_tpu.models.affine import affine_score
        from nw_tpu.models.smith_waterman import sw_fill_diag
        from nw_tpu.ops.variants_rowsweep import (
            affine_scores_rowsweep_batch,
            sw_scores_rowsweep_batch,
        )

        sw = np.asarray(
            sw_scores_rowsweep_batch(tops, sides, l1, l2, 2, 1, 1)
        )
        af = np.asarray(
            affine_scores_rowsweep_batch(tops, sides, l1, l2, 2, 1, 3, 1)
        )
        for b in range(0, len(ps), 23):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            assert sw[b] == int(
                sw_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            )
            assert af[b] == int(affine_score(t, si, 2, 1, 3, 1))

    def banded_variants():
        from nw_tpu.models.affine import affine_score
        from nw_tpu.models.smith_waterman import sw_fill_diag
        from nw_tpu.ops.variants_banded import (
            affine_scores_banded_batch,
            sw_scores_banded_batch,
        )

        # small geometry on the mixed-length set
        sw = np.asarray(
            sw_scores_banded_batch(
                tops, sides, l1, l2, 2, 1, 1,
                band_rows=24, chunk=24, unroll=8,
            )
        )
        af = np.asarray(
            affine_scores_banded_batch(
                tops, sides, l1, l2, 2, 1, 3, 1,
                band_rows=24, chunk=24, unroll=8,
            )
        )
        for b in range(0, len(ps), 23):
            a, s2 = ps[b]
            t = jnp.asarray(enc.encode(a.encode()))
            si = jnp.asarray(enc.encode(s2.encode()))
            assert sw[b] == int(
                sw_fill_diag(t, si, 2, 1, 1, with_arrows=False)["score"]
            )
            assert af[b] == int(affine_score(t, si, 2, 1, 3, 1))
        # long-side (the VERDICT r1 item-7 check): production geometry
        L = 6000
        t6 = jnp.asarray(rng.integers(65, 69, (32, L)), jnp.int32)
        s6 = jnp.asarray(rng.integers(65, 69, (32, L)), jnp.int32)
        lv = np.full((32,), L, np.int32)
        sw6 = np.asarray(sw_scores_banded_batch(t6, s6, lv, lv, 2, 1, 1))
        af6 = np.asarray(affine_scores_banded_batch(t6, s6, lv, lv, 2, 1, 3, 1))
        for b in (0, 31):
            assert sw6[b] == int(
                sw_fill_diag(t6[b], s6[b], 2, 1, 1, with_arrows=False)["score"]
            )
            assert af6[b] == int(affine_score(t6[b], s6[b], 2, 1, 3, 1))

    def banded_variant_tracebacks():
        from nw_tpu.models.affine import affine_align
        from nw_tpu.models.smith_waterman import sw_align
        from nw_tpu.ops.traceback import ops_to_strings
        from nw_tpu.ops.variants_banded import (
            affine_traceback_banded_batch,
            sw_traceback_banded_batch,
        )

        best, jst, ist, j_end, i_end, ops, n = sw_traceback_banded_batch(
            tops, sides, l1, l2, 2, 1, 1,
            band_rows=24, chunk=24, unroll=8, group_bands=2,
        )
        afs, aops, an = affine_traceback_banded_batch(
            tops, sides, l1, l2, 2, 1, 3, 1,
            band_rows=24, chunk=24, unroll=8, group_bands=2,
        )
        for b in range(0, len(ps), 31):
            a, s2 = ps[b]
            wb, wX, wY, wstart = sw_align(a, s2, 2, 1, 1)
            X, Y = ops_to_strings(
                ops[b], int(n[b]), a.encode()[: int(ist[b])],
                s2.encode()[: int(jst[b])],
            )
            assert int(best[b]) == wb and (X, Y) == (wX, wY)
            assert (int(j_end[b]), int(i_end[b])) == wstart
            wa = affine_align(a, s2, 2, 1, 3, 1)
            aX, aY = ops_to_strings(aops[b], int(an[b]), a.encode(), s2.encode())
            assert int(afs[b]) == wa[0] and (aX, aY) == (wa[1], wa[2])

    def small_batch_long_variants():
        # 8 x 3kb FULL alignments must take the banded engines (a few
        # seconds) — not the per-pair scan engines (was ~12 s/pair: the
        # <24-pair capability cliff, VERDICT r2 item 5)
        import time

        from nw_tpu.models.affine import affine_align, affine_align_batch
        from nw_tpu.models.smith_waterman import sw_align, sw_align_batch

        ps3 = [
            (
                "".join(rng.choice(list("ACGT"), 3000)),
                "".join(rng.choice(list("ACGT"), 3000)),
            )
            for _ in range(8)
        ]
        t0 = time.perf_counter()
        sw = sw_align_batch(ps3, 2, 1, 1)
        af = affine_align_batch(ps3, 2, 1, 3, 1)
        wall = time.perf_counter() - t0
        assert sw[0] == sw_align(*ps3[0], 2, 1, 1)
        assert af[0] == affine_align(*ps3[0], 2, 1, 3, 1)
        assert wall < 120, f"small-batch long-side cliff: {wall:.0f}s"

    def banded_traceback():
        from nw_tpu.ops.banded_traceback import traceback_banded_batch

        sc, cnt, ops, n = traceback_banded_batch(
            tops, sides, l1, l2, 2, 1, 1,
            band_rows=24, chunk=24, unroll=8, group_bands=2,
            with_counts=True,
        )
        assert (sc == ref_scores).all()
        assert (cnt == ref_counts).all()
        tb = lambda a, a1, a2: traceback.traceback_greedy(a, a1, a2, max_steps=240)
        opsr, nr = jax.vmap(tb)(ref["arrows"], l1j, l2j)
        opsr, nr = np.asarray(opsr), np.asarray(nr)
        assert (n == nr).all()
        for b in range(len(ps)):
            assert (ops[b, : n[b]] == opsr[b, : n[b]]).all()

    def banded_traceback_runs():
        # the run-skip engine compiled on hardware must be
        # bit-identical to the per-cell engine (codes AND run jumps)
        from nw_tpu.ops.banded_traceback import traceback_banded_batch

        kw = dict(band_rows=24, chunk=24, unroll=8, group_bands=2,
                  with_counts=True)
        want = traceback_banded_batch(
            tops, sides, l1, l2, 2, 1, 1, engine="twopass", **kw
        )
        got = traceback_banded_batch(
            tops, sides, l1, l2, 2, 1, 1, engine="runs", **kw
        )
        for a, b in zip(got, want):
            assert (np.asarray(a) == np.asarray(b)).all()

    def banded_traceback_onepass_production():
        # the one-pass fused engine at PRODUCTION geometry (RB=64,
        # chunk=192, auto groups, kilobase sides, 128-lane block) must
        # match the two-pass engine bit-for-bit on hardware — the tiny
        # geometries above don't exercise the register-fit kernel or
        # the multi-group word-stack walk
        from nw_tpu.ops.banded_traceback import traceback_banded_batch

        rng2 = np.random.default_rng(77)
        big = [
            (
                bytes(rng2.choice(list(b"ACGT"), int(rng2.integers(1, 2049)))),
                bytes(rng2.choice(list(b"ACGT"), int(rng2.integers(1, 2049)))),
            )
            for _ in range(32)
        ] + [(b"A" * 2048, b"A" * 2048), (b"A" * 2000, b"T" * 600)]
        from nw_tpu.ops.encode import encode_batch_u8

        t2, s2, a1, a2 = encode_batch_u8(big)
        want = traceback_banded_batch(
            t2, s2, a1, a2, 2, 1, 1, with_counts=True, engine="twopass"
        )
        got = traceback_banded_batch(
            t2, s2, a1, a2, 2, 1, 1, with_counts=True, engine="onepass"
        )
        for a, b in zip(got, want):
            assert (np.asarray(a) == np.asarray(b)).all()

    def align_batch_greedy2_route():
        # the model's strings-only route (2-bit greedy fill + walker)
        # must produce the same alignments as the counts route (3-bit
        # arrows + byte walker) end-to-end through align_batch
        from nw_tpu.models.needleman_wunsch import align_batch

        sub = [(a.encode(), b.encode()) for a, b in ps[:64]]
        r1 = align_batch(sub, 2, 1, 1, traceback_strings=True)
        r2 = align_batch(sub, 2, 1, 1, traceback_strings=True, count=True)
        assert (r1.scores == r2.scores).all()
        assert r1.alignment_strings() == r2.alignment_strings()

    def resumable_walk():
        # the resumable config-3 runner's own jitted span programs,
        # compiled on hardware: kill mid-run, resume, compare to the
        # monolithic engine
        import tempfile

        from nw_tpu.ops.banded_traceback import traceback_banded_batch
        from nw_tpu.runtime.checkpoint import ResumableBandedTraceback

        sub = 24
        t, s2, a1, a2 = tops[:sub], sides[:sub], l1[:sub], l2[:sub]
        kw = dict(with_counts=True, band_rows=24, chunk=48, unroll=8,
                  group_bands=2)
        want = traceback_banded_batch(t, s2, a1, a2, 2, 1, 1, **kw)
        with tempfile.TemporaryDirectory() as d:
            runner = ResumableBandedTraceback(d, save_every=1)
            try:
                runner.run(t, s2, a1, a2, 2, 1, 1,
                           _abort_after_spans=2, **kw)
            except KeyboardInterrupt:
                pass
            got = ResumableBandedTraceback(d, save_every=1).run(
                t, s2, a1, a2, 2, 1, 1, **kw
            )
        for a, b in zip(got, want):
            assert (np.asarray(a) == np.asarray(b)).all()

    def strips_engine():
        """Strips-in-slots single-pair score pipeline (fill_strips)
        vs the fold engine, and the fill_scores_auto long-pair route
        that dispatches it (sides >= STRIPS_MIN_SIDE, small batch)."""
        from nw_tpu.ops.fill_auto import STRIPS_MIN_SIDE, fill_scores_auto
        from nw_tpu.ops.fill_pallas_single import score_count_fold
        from nw_tpu.ops.fill_strips import strips_score

        srng = np.random.default_rng(23)
        L = 60_000
        t6 = jnp.asarray(srng.integers(65, 69, L), jnp.int32)
        s6 = jnp.asarray(srng.integers(65, 69, L), jnp.int32)
        want, _ = score_count_fold(t6, s6, 2, 1, 1)
        got = strips_score(t6, s6, 2, 1, 1)
        assert int(got) == int(want), (int(got), int(want))
        # ragged true lengths under the padded shapes
        want2, _ = score_count_fold(
            t6, s6, 2, 1, 1, len1=L - 7, len2=L - 1
        )
        got2 = strips_score(t6, s6, 2, 1, 1, L - 7, L - 1)
        assert int(got2) == int(want2)
        # the production route (3-pair batch of >=STRIPS_MIN_SIDE sides)
        assert L >= STRIPS_MIN_SIDE
        tops3 = jnp.stack([t6, t6, t6])
        sides3 = jnp.stack([s6, s6, s6])
        l3 = jnp.asarray([L, L - 7, L], jnp.int32)
        l4 = jnp.asarray([L, L - 1, L - 3], jnp.int32)
        auto = fill_scores_auto(tops3, sides3, l3, l4, 2, 1, 1,
                                platform="tpu")
        want3, _ = score_count_fold(t6, s6, 2, 1, 1, len1=L, len2=L - 3)
        assert int(auto[0]) == int(want)
        assert int(auto[1]) == int(want2)
        assert int(auto[2]) == int(want3)

    def huge_pair_engine():
        from jax.sharding import Mesh

        from nw_tpu.ops.fill_pallas_single import score_pallas_single
        from nw_tpu.parallel.huge_pair import (
            huge_pair_align_sharded,
            huge_pair_score_sharded,
        )

        mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
        t7 = jnp.asarray(rng.integers(65, 69, 700), jnp.int32)
        s7 = jnp.asarray(rng.integers(65, 69, 800), jnp.int32)
        want7 = int(score_pallas_single(t7, s7, 2, 1, 1))
        got = huge_pair_score_sharded(
            t7, s7, 2, 1, 1, mesh, chunk=512, engine="pallas"
        )
        assert got == want7
        # register-blocked score engine (the config-5 TPU default),
        # compiled, incl. a multi-block (nb > 1) geometry
        got_b = huge_pair_score_sharded(
            t7, s7, 2, 1, 1, mesh, chunk=512, engine="pallasb"
        )
        assert got_b == want7, (got_b, want7)
        t8 = jnp.asarray(rng.integers(65, 69, 900), jnp.int32)
        s8 = jnp.asarray(rng.integers(65, 69, 30_000), jnp.int32)
        from nw_tpu.ops.fill_pallas_banded import fill_scores_banded_batch

        want8 = int(
            fill_scores_banded_batch(
                t8[None], s8[None],
                np.array([900], np.int32), np.array([30_000], np.int32),
                2, 1, 1,
            )[0]
        )
        got8 = huge_pair_score_sharded(
            t8, s8, 2, 1, 1, mesh, chunk=512, engine="pallasb"
        )
        assert got8 == want8, (got8, want8)
        # small walk vs the packed traceback oracle
        from nw_tpu.ops.fill_scan import fill_diag

        a, s2 = ps[3]
        tt = jnp.asarray(enc.encode(a.encode()))
        ss = jnp.asarray(enc.encode(s2.encode()))
        refd = fill_diag(tt, ss, 2, 1, 1)
        opsr, nr = traceback.traceback_greedy(
            refd["arrows"], len(a), len(s2), max_steps=len(a) + len(s2)
        )
        r = huge_pair_align_sharded(
            tt, ss, 2, 1, 1, mesh, chunk=128, engine="pallas"
        )
        assert r.score == int(refd["score"])
        assert r.n == int(nr)
        assert (r.ops == np.asarray(opsr)[: int(nr)]).all()
        # the 2-bit greedy-word walk (the TPU walk default): exact
        # same alignment from the register-blocked engine, at a
        # long-pair geometry the monolithic kernel's VMEM-resident
        # word stack could not hold
        rb = huge_pair_align_sharded(
            tt, ss, 2, 1, 1, mesh, chunk=128, engine="pallasb"
        )
        assert (rb.score, rb.n) == (r.score, r.n)
        assert (rb.ops == r.ops).all()
        t9 = jnp.asarray(rng.integers(65, 69, 8_000), jnp.int32)
        s9 = jnp.asarray(rng.integers(65, 69, 9_000), jnp.int32)
        from nw_tpu.ops.banded_traceback import traceback_banded_batch

        sc9, ops9, n9 = traceback_banded_batch(
            t9[None], s9[None],
            np.array([8_000], np.int32), np.array([9_000], np.int32),
            2, 1, 1,
        )
        r9 = huge_pair_align_sharded(
            t9, s9, 2, 1, 1, mesh, engine="pallasb"
        )
        assert r9.score == int(sc9[0]), (r9.score, int(sc9[0]))
        assert r9.n == int(n9[0])
        assert (r9.ops == ops9[0, : int(n9[0])]).all()
        # the align_huge production route (config-5 engine when the
        # walk words fit HBM) == the checkpointed re-fill traceback
        import os

        from nw_tpu.models.needleman_wunsch import NWAligner

        al = NWAligner()
        s1w = bytes(np.asarray(t9, np.uint8)[:4000])
        s2w = bytes(np.asarray(s9, np.uint8)[:5000])
        rf = al.align_huge(s1w, s2w)
        os.environ["NW_TPU_HUGE_WALK_HBM"] = "1"
        try:
            rs = al.align_huge(s1w, s2w)
        finally:
            del os.environ["NW_TPU_HUGE_WALK_HBM"]
        assert (rf.score, rf.X, rf.Y) == (rs.score, rs.X, rs.Y)
        # small-batch huge-side dispatch (per-pair huge engines; a
        # 2x100kb strings batch used to OOM on full arrows) vs the
        # banded traceback engine on the same pairs
        import nw_tpu.ops.fill_auto as fa

        al2 = NWAligner(match=2, mismatch=1, indel=1)
        ps_h = [
            (bytes(np.asarray(t9, np.uint8)[:2000]),
             bytes(np.asarray(s9, np.uint8)[:2300])),
            (bytes(np.asarray(s9, np.uint8)[:1700]),
             bytes(np.asarray(t9, np.uint8)[:2100])),
        ]
        old_min = fa.HUGE_PAIR_MIN_SIDE
        fa.HUGE_PAIR_MIN_SIDE = 1024
        try:
            rb2 = al2.align_batch(
                ps_h, traceback_strings=True, count=True
            )
        finally:
            fa.HUGE_PAIR_MIN_SIDE = old_min
        tops_h, sides_h, l1h, l2h = enc.encode_batch(ps_h)
        sc_h, cnt_h, ops_h, n_h = traceback_banded_batch(
            tops_h, sides_h, l1h, l2h, 2, 1, 1, with_counts=True
        )
        assert (np.asarray(rb2.scores) == np.asarray(sc_h)).all()
        assert (np.asarray(rb2.counts) == np.asarray(cnt_h)).all()
        for b in range(2):
            nn = int(n_h[b])
            assert int(rb2.ops_len[b]) == nn
            assert (rb2.ops[b, :nn] == ops_h[b, :nn]).all()

    def sharded():
        from jax.sharding import Mesh

        from nw_tpu.parallel.data_parallel import align_batch_sharded

        mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
        sc, stats = align_batch_sharded(
            jnp.asarray(tops)[:128], jnp.asarray(sides)[:128],
            l1j[:128], l2j[:128],
            m=2, k=1, d=1, mesh=mesh, with_counts=True,
        )
        assert (np.asarray(sc) == ref_scores[:128]).all()

    check("score kernel", scores)
    check("arrows kernel + packed consumers", arrows)
    check("arrows + fused counts", arrows_counts_fused)
    check("fused score+count", scores_counts_fused)
    check("count-from-arrows kernel", count_kernel)
    check("fold arrows kernel", fold_arrows)
    check("fold last-row + score_count", fold_scalar)
    check("checkpointed traceback", checkpoint_walk)
    check("SW + affine kernels", variants)
    check("SW + affine batched alignments", variant_alignments)
    check("long-side score routing (lax.map fold)", long_side_scores)
    check("banded score kernel (multi-band + 10kb)", banded_scores)
    check("single-band arrows (flat layout) + consumers", banded_single_arrows)
    check("2-bit greedy arrows + walk", greedy2_arrows)
    check("row-sweep score kernel", rowsweep_scores)
    check("row-sweep score kernel groups=2", rowsweep_groups)
    check("row-sweep groups=2 family (greedy/counts/SW/affine)",
          rowsweep_groups_family)
    check("row-sweep greedy arrows + row-major walk", rowsweep_greedy)
    check("row-sweep fused score+count", rowsweep_counts)
    check("row-sweep SW + affine kernels", rowsweep_variants)
    def batch_vs_reference():
        """align_batch through the COMPILED production routes (row-sweep
        greedy strings + fused counts) vs per-pair reference runs:
        score, uint32-wrapped solution count, first-emitted alignment.
        The CPU twin lives in tests/test_differential.py
        (test_differential_batch_api); this one covers the TPU routes."""
        import re
        import subprocess
        from pathlib import Path

        ref = Path("/root/build-ref/needleman-wunsch")
        if not ref.exists():
            print("  (reference binary missing; building)", flush=True)
            import shutil

            bld = Path("/tmp/nw-ref-build-validate")
            bld.mkdir(exist_ok=True)
            for f in Path("/root/reference").iterdir():
                if f.suffix in (".c", ".h") or f.name == "Makefile":
                    shutil.copy(f, bld / f.name)
            subprocess.run(
                ["make", "CFLAGS=-std=gnu99 -O2 -fcommon -DNDEBUG"],
                cwd=bld, capture_output=True, check=True,
            )
            ref = bld / "needleman-wunsch"

        from nw_tpu.models.needleman_wunsch import align_batch

        def ref_run(args, stdin):
            r = subprocess.run(
                [str(ref)] + args, input=stdin, capture_output=True,
                timeout=30,
            )
            assert r.returncode == 0, r.stderr
            return r.stdout, r.stderr

        prng = np.random.default_rng(17)
        # >= 1024 pairs so the row-sweep routes engage; reference-check
        # a stratified sample of them
        bps = []
        # min length 1: the reference's whitespace-delimited stdin
        # cannot express an empty sequence (it reads the next token)
        for _ in range(1100):
            la, lb = int(prng.integers(1, 61)), int(prng.integers(1, 61))
            bps.append((
                "".join(prng.choice(list("ACGT"), la)),
                "".join(prng.choice(list("ACGT"), lb)),
            ))
        res = align_batch(bps, 2, 1, 1, traceback_strings=True, count=True)
        strs = res.alignment_strings()
        for b in range(0, len(bps), 13):
            s1, s2 = bps[b]
            out, err = ref_run(
                ["-q", "-s", "2", "1", "1"], f"{s1} {s2}".encode()
            )
            count = int(re.search(rb"(\d+) optimal alignment", err).group(1))
            score = int(re.search(rb"Optimal score is (-?\d+)", err).group(1))
            assert res.scores[b] == score, (b, s1, s2)
            assert int(res.counts[b]) == count % 2**32, (b, s1, s2)
            if 1 <= count <= 32:
                out, _ = ref_run(["2", "1", "1"], f"{s1} {s2}".encode())
                lines = out.split(b"\n")
                assert strs[b] == (lines[0], lines[1]), (b, s1, s2)

    check("row-sweep overlap (semi-global) kernel", rowsweep_overlap)
    check("row-sweep tuned production knobs (all engines)", rowsweep_tuned)
    check("align_batch vs reference binary (compiled routes)",
          batch_vs_reference)
    check("banded overlap kernel (incl. 4kb long-side)", banded_overlap)
    check("banded overlap FULL tracebacks", banded_overlap_traceback)
    check("banded SW + affine kernels (incl. 6kb long-side)", banded_variants)
    check("banded SW + affine FULL tracebacks", banded_variant_tracebacks)
    check("small-batch long-side SW/Gotoh alignments", small_batch_long_variants)
    check("banded checkpointed traceback + counts", banded_traceback)
    check("run-skip walk engine == per-cell engine", banded_traceback_runs)
    check("one-pass fused engine @ production geometry",
          banded_traceback_onepass_production)
    check("align_batch greedy2 strings route", align_batch_greedy2_route)
    check("resumable walk kill/resume (compiled)", resumable_walk)
    check("strips-in-slots single-pair engine + route", strips_engine)
    check("huge-pair fold-chunk engine (config 5)", huge_pair_engine)
    check("sharded pallas path", sharded)
    return 1 if FAILED else 0


if __name__ == "__main__":
    sys.exit(main())
