"""Row-sweep Pallas fill: inter-pair vectorization with zero wavefront
overhead.

The flat batch-in-lanes kernel (fill_pallas.py) puts the anti-diagonal
in sublanes, so an A x B table costs a (A+B) x (B+1) rhombus of vector
slots — 2.04x cell-slot overhead at A = B, the dominant loss at short
read lengths (PERF.md roofline item 1).  This engine removes it: the
*batch* fills the whole (8, 128) vreg (1024 pairs per grid block) and
cells are visited row-major, one cell per pair per vector op — slot
overhead is just the skew margin, ``1 + R/B``.

Recurrence order (the reference's column-major ``score_cell`` loop,
needleman-wunsch.c:418-510, transposed to row-major): cell (i, j)
needs (i-1, j) [up], (i, j-1) [left], (i-1, j-1) [diag].  ``R`` rows
advance together, row r one column behind row r-1, so every value a
row needs from the row above was computed 1-2 steps earlier and is
still in a register; only the bottom row of the pass stores to the
(single, in-place) VMEM row buffer, and only the top row loads from
it.  Per cell that is ~6 VPU ops + 3/R memory ops — against the
wavefront kernel's ~10 ops x 2.04 slots — for a ~2x higher ceiling at
150 bp.

Boundaries (computation.c:96-120) need no selects:

* row 0 is the initial content of the row buffer (``-j*d``);
* the left column emerges by induction: each pass computes column 0
  like any cell with its left/diag registers initialized to NEG_INF,
  so ``max(up, NEG_INF) - d`` reproduces ``-i*d`` from the row above
  (same trick as the wavefront kernels' natural boundaries);
* cells left of column 0 (the skew warm-up) decay from NEG_INF and
  can never win a max against a real path.

The true corner (len1, len2) is captured with a masked select, but the
compare/select only runs in passes whose row range contains some
pair's len1 — a host-computed per-pass gate rides the scalar prefetch,
so uniform-length batches pay ~R/L1, not 4 ops/cell (the same idea as
the wavefront kernel's min-corner gate).

VMEM per block: 3 x (L+1, 8, 128) int32 (row buffer + double-buffered
sequence blocks) ~ 3 MB at 150 bp — the engine serves sides up to
~1 kb; beyond that the banded kernel (fill_pallas_banded.py) owns the
problem.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.encode import PAD_SIDE, PAD_TOP

NEG_INF = -(2**30)
_SL, _LN = 8, 128
_PB = _SL * _LN  # pairs per grid block: one full vreg


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _natc(anchor, val):
    """Constant vreg with the anchor's natural vector layout.

    A plain ``jnp.full`` carries a *replicated* Mosaic layout; using it
    as a ``fori_loop`` carry init makes the back-edge join relayout
    natural->replicated, which v5e Mosaic rejects ("Non-singleton
    logical dimension is replicated in destination but not in
    source").  ``anchor`` is any loaded vector that is always >= 0
    (the length vectors), so the where never picks the false branch.
    The two branches MUST differ: MLIR's canonicalizer folds
    ``select(p, splat(v), splat(v))`` back into the replicated splat
    (observed: ``_natc(len1, 0)`` re-broke the SW/overlap kernels).
    """
    return jnp.where(anchor < 0, jnp.int32(val) - 1, jnp.int32(val))


def _make_rowsweep_kernel(L1p: int, L2p: int, R: int, npass: int, SL: int = _SL):
    def kernel(s_ref, tops_ref, sides_ref, lens_ref, out_ref, row_ref):
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]

        len1 = lens_ref[0]  # (8, 128)
        len2 = lens_ref[1]

        # DP row 0: score -j*d with a LEFT arrow (computation.c:104-110)
        jj = jax.lax.broadcasted_iota(jnp.int32, (L2p + 1, SL, _LN), 0)
        row_ref[...] = jj * (-d)

        # pairs with len1 == 0 never enter a pass: their corner is the
        # row-0 cell (0, len2) = -len2*d
        cap0 = jnp.where(len1 == 0, -len2 * d, jnp.int32(NEG_INF))

        neg = _natc(len1, NEG_INF)
        chz = _natc(len1, -5)

        def one_pass(p, cap):
            i0 = p * R  # DP rows i0+1 .. i0+R this pass

            t_ch = [
                tops_ref[pl.ds(jnp.minimum(i0 + r, L1p - 1), 1)][0]
                for r in range(R)
            ]
            hit_row = [len1 == (i0 + r + 1) for r in range(R)]
            gate = s_ref[3 + p] != 0

            def step(s, carry):
                scores, prevs, win, ld_prev, cap = carry
                ld = row_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                ch_new = sides_ref[pl.ds(jnp.clip(s - 1, 0, L2p - 1), 1)][0]
                win = (ch_new,) + win[:-1]

                new = []
                for r in range(R):
                    up = ld if r == 0 else scores[r - 1]
                    diag = ld_prev if r == 0 else prevs[r - 1]
                    sub = jnp.where(t_ch[r] == win[r], m, -kmis)
                    # fused max-then-subtract (one -d, not two)
                    new.append(
                        jnp.maximum(
                            diag + sub, jnp.maximum(up, scores[r]) - d
                        )
                    )

                @pl.when(s >= R - 1)
                def _():
                    row_ref[pl.ds(s - (R - 1), 1)] = new[R - 1][None]

                def capture(cap):
                    for r in range(R):
                        hit = hit_row[r] & (len2 == (s - r))
                        cap = jnp.where(hit, new[r], cap)
                    return cap

                cap = jax.lax.cond(gate, capture, lambda c: c, cap)
                return tuple(new), tuple(scores), win, ld, cap

            carry = (
                (neg,) * R, (neg,) * R, (chz,) * R, neg, cap,
            )
            carry = jax.lax.fori_loop(0, L2p + R, step, carry)
            return carry[4]

        out_ref[...] = jax.lax.fori_loop(0, npass, one_pass, cap0)

    return kernel


def _make_rowsweep_counts_kernel(
    L1p: int, L2p: int, R: int, npass: int, SL: int = _SL
):
    """Fused score+count row-sweep kernel (the -q -s path).

    Count DP rides the fill: count(i,j) = sum of counts over the
    equal-to-max predecessors (pathcount.count_paths semantics —
    uint32 wraparound, exactly the reference's ``unsigned int
    solution_count`` overflow, computation.h:65; int32 adds wrap
    bit-identically).  Row 0 counts are 1 (the single boundary path),
    and the NEG_INF-decayed warm-up columns can never fake an
    equal-to-max flag against a real score.
    """

    def kernel(
        s_ref, tops_ref, sides_ref, lens_ref, out_ref, cout_ref,
        row_ref, crow_ref,
    ):
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]
        len1 = lens_ref[0]
        len2 = lens_ref[1]

        jj = jax.lax.broadcasted_iota(jnp.int32, (L2p + 1, SL, _LN), 0)
        row_ref[...] = jj * (-d)
        crow_ref[...] = jnp.ones((L2p + 1, SL, _LN), jnp.int32)

        cap0 = jnp.where(len1 == 0, -len2 * d, jnp.int32(NEG_INF))
        ccap0 = jnp.where(len1 == 0, jnp.int32(1), jnp.int32(0))

        neg = _natc(len1, NEG_INF)
        one = _natc(len1, 1)
        chz = _natc(len1, -5)

        def one_pass(p, caps):
            i0 = p * R
            t_ch = [
                tops_ref[pl.ds(jnp.minimum(i0 + r, L1p - 1), 1)][0]
                for r in range(R)
            ]
            hit_row = [len1 == (i0 + r + 1) for r in range(R)]
            gate = s_ref[3 + p] != 0

            def step(s, carry):
                (scores, prevs, cnts, cprevs, win, ld_prev, cld_prev,
                 cap, ccap) = carry
                ld = row_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                cld = crow_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                ch_new = sides_ref[pl.ds(jnp.clip(s - 1, 0, L2p - 1), 1)][0]
                win = (ch_new,) + win[:-1]

                new, cnew = [], []
                for r in range(R):
                    up = ld if r == 0 else scores[r - 1]
                    diag = ld_prev if r == 0 else prevs[r - 1]
                    c_up = cld if r == 0 else cnts[r - 1]
                    c_diag = cld_prev if r == 0 else cprevs[r - 1]
                    left = scores[r]
                    c_left = cnts[r]
                    sub = jnp.where(t_ch[r] == win[r], m, -kmis)
                    cand_d = diag + sub
                    h = jnp.maximum(cand_d, jnp.maximum(up, left) - d)
                    hd = h + d
                    cnt = (
                        jnp.where(cand_d == h, c_diag, 0)
                        + jnp.where(up == hd, c_up, 0)
                        + jnp.where(left == hd, c_left, 0)
                    )
                    new.append(h)
                    cnew.append(cnt)

                @pl.when((s >= R - 1) & (s - (R - 1) <= L2p))
                def _():
                    row_ref[pl.ds(s - (R - 1), 1)] = new[R - 1][None]
                    crow_ref[pl.ds(s - (R - 1), 1)] = cnew[R - 1][None]

                def capture(caps):
                    cap, ccap = caps
                    for r in range(R):
                        hit = hit_row[r] & (len2 == (s - r))
                        cap = jnp.where(hit, new[r], cap)
                        ccap = jnp.where(hit, cnew[r], ccap)
                    return cap, ccap

                cap, ccap = jax.lax.cond(
                    gate, capture, lambda c: c, (cap, ccap)
                )
                return (
                    tuple(new), tuple(scores), tuple(cnew), tuple(cnts),
                    win, ld, cld, cap, ccap,
                )

            carry = (
                (neg,) * R, (neg,) * R, (one,) * R, (one,) * R,
                (chz,) * R, neg, one, caps[0], caps[1],
            )
            out = jax.lax.fori_loop(0, L2p + R, step, carry)
            return out[7], out[8]

        cap, ccap = jax.lax.fori_loop(0, npass, one_pass, (cap0, ccap0))
        out_ref[...] = cap
        cout_ref[...] = ccap

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "groups", "interpret")
)
def fill_scores_counts_rowsweep_batch(
    tops, sides, lens1, lens2, m, k, d, *, rows: int = 8,
    groups: int = 1, interpret: bool = False,
):
    """Batched (scores int32[nb], counts uint32[nb]) — fused, no arrows."""
    nb, L1 = tops.shape
    _, L2 = sides.shape
    R = rows
    SL = _SL * groups
    PB = SL * _LN
    L1p = max(L1, 1)
    L2p = max(L2, 1)
    nbp = _round_up(max(nb, 1), PB)
    nblk = nbp // PB
    npass = -(-L1p // R)

    tops = jnp.pad(
        tops, ((0, nbp - nb), (0, L1p - L1)), constant_values=PAD_TOP
    ).astype(jnp.int32)
    sides = jnp.pad(
        sides, ((0, nbp - nb), (0, L2p - L2)), constant_values=PAD_SIDE
    ).astype(jnp.int32)
    l1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nbp - nb))
    l2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nbp - nb))

    tops_r = tops.T.reshape(L1p, nblk * SL, _LN)
    sides_r = sides.T.reshape(L2p, nblk * SL, _LN)
    lens_r = jnp.stack([l1, l2]).reshape(2, nblk * SL, _LN)

    pid = np.arange(npass, dtype=np.int32) * R
    hit = jnp.any(
        (l1[None, :] > jnp.asarray(pid)[:, None])
        & (l1[None, :] <= jnp.asarray(pid)[:, None] + R),
        axis=1,
    ).astype(jnp.int32)
    scalars = jnp.concatenate([jnp.asarray([m, k, d], jnp.int32), hit])

    sc, ct = pl.pallas_call(
        _make_rowsweep_counts_kernel(L1p, L2p, R, npass, SL),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((L1p, SL, _LN), lambda b, s: (0, b, 0)),
                pl.BlockSpec((L2p, SL, _LN), lambda b, s: (0, b, 0)),
                pl.BlockSpec((2, SL, _LN), lambda b, s: (0, b, 0)),
            ],
            out_specs=[
                pl.BlockSpec((SL, _LN), lambda b, s: (b, 0)),
                pl.BlockSpec((SL, _LN), lambda b, s: (b, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((L2p + 1, SL, _LN), jnp.int32),
                pltpu.VMEM((L2p + 1, SL, _LN), jnp.int32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((nblk * SL, _LN), jnp.int32),
            jax.ShapeDtypeStruct((nblk * SL, _LN), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, tops_r, sides_r, lens_r)
    return sc.reshape(nbp)[:nb], ct.reshape(nbp)[:nb].astype(jnp.uint32)


@functools.partial(
    jax.jit, static_argnames=("rows", "groups", "interpret")
)
def fill_scores_rowsweep_batch(
    tops, sides, lens1, lens2, m, k, d, *, rows: int = 8,
    groups: int = 1, interpret: bool = False,
):
    """Batched NW corner scores, row-sweep engine (short sides).

    Same contract as ``fill_scores_pallas_batch``: int32[nb] corner
    scores for scoring params m/k/d (needleman-wunsch.c:654-689).
    ``rows`` = R, the skewed rows in flight per pass, and ``groups``
    = G vregs per vector op (block = G*1024 pairs): both are ILP
    knobs, but G does not extend the R/B skew margin.
    """
    nb, L1 = tops.shape
    _, L2 = sides.shape
    R = rows
    SL = _SL * groups
    PB = SL * _LN
    L1p = max(L1, 1)
    L2p = max(L2, 1)
    nbp = _round_up(max(nb, 1), PB)
    nblk = nbp // PB
    npass = -(-L1p // R)

    tops = jnp.pad(
        tops, ((0, nbp - nb), (0, L1p - L1)), constant_values=PAD_TOP
    ).astype(jnp.int32)
    sides = jnp.pad(
        sides, ((0, nbp - nb), (0, L2p - L2)), constant_values=PAD_SIDE
    ).astype(jnp.int32)
    l1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nbp - nb))
    l2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nbp - nb))

    # pair p -> (block, sublane, lane): plain C-order reshape
    tops_r = tops.T.reshape(L1p, nblk * SL, _LN)
    sides_r = sides.T.reshape(L2p, nblk * SL, _LN)
    lens_r = jnp.stack([l1, l2]).reshape(2, nblk * SL, _LN)

    # per-pass corner gate: pass p covers DP rows p*R+1 .. p*R+R
    pid = np.arange(npass, dtype=np.int32) * R
    hit = jnp.any(
        (l1[None, :nbp] > jnp.asarray(pid)[:, None])
        & (l1[None, :nbp] <= jnp.asarray(pid)[:, None] + R),
        axis=1,
    ).astype(jnp.int32)
    scalars = jnp.concatenate(
        [jnp.asarray([m, k, d], jnp.int32), hit]
    )

    out = pl.pallas_call(
        _make_rowsweep_kernel(L1p, L2p, R, npass, SL),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((L1p, SL, _LN), lambda b, s: (0, b, 0)),
                pl.BlockSpec((L2p, SL, _LN), lambda b, s: (0, b, 0)),
                pl.BlockSpec((2, SL, _LN), lambda b, s: (0, b, 0)),
            ],
            out_specs=pl.BlockSpec((SL, _LN), lambda b, s: (b, 0)),
            scratch_shapes=[pltpu.VMEM((L2p + 1, SL, _LN), jnp.int32)],
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * SL, _LN), jnp.int32),
        interpret=interpret,
    )(scalars, tops_r, sides_r, lens_r)
    return out.reshape(nbp)[:nb]
