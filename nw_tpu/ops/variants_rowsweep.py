"""Row-sweep score kernels for the model variants (SW, Gotoh).

Same inter-pair row-sweep engine as fill_rowsweep.py — the batch fills
the (8, 128) vreg, R skewed rows advance per pass over a single
in-place VMEM row buffer — applied to:

* **Smith-Waterman** best local score (reference FUTURE WORK,
  README:179-186): the linear recurrence clamped at zero with a
  running best.  SW's zero clamp keeps the skew warm-up columns
  (jj < 0) from decaying like NW's NEG_INF garbage, and they sit
  UPSTREAM of the real cells here (unlike the wavefront layout where
  out-of-rectangle cells only feed out-of-rectangle cells), so column
  0 is pinned to its true boundary value 0 with a scalar select and
  the best-update is masked to the true rectangle.
* **Gotoh affine-gap global score** (README:187-193): the
  three-matrix recurrence of models/affine.affine_score.  All
  boundaries emerge by induction — M(0,0) = 0 seeds the IX chain down
  column 0 (max(M - op, IX - ex) reproduces -(op + (i-1)ex)), the row
  0 IY boundary is the initial row-buffer content, and the NEG-valued
  warm-up columns decay harmlessly.  Three row buffers (H, M, IX)
  carry the inter-pass state; IY is row-local and never leaves
  registers.

Wavefront counterparts: variants_pallas.py (flat), variants_banded.py
(long sides).  At 150 bp these kernels replace a 2.04x slot overhead
with ~1 + R/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.encode import PAD_SIDE, PAD_TOP
from nw_tpu.ops.fill_rowsweep import _natc

NEG = -(2**29)  # headroom: NEG - open - extend must not wrap
_SL, _LN = 8, 128
_PB = _SL * _LN


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prep(tops, sides, lens1, lens2, R, SL=_SL):
    nb, L1 = tops.shape
    _, L2 = sides.shape
    L1p = max(L1, 1)
    L2p = max(L2, 1)
    PB = SL * _LN
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
    return tops_r, sides_r, lens_r, l1, nb, nbp, nblk, L1p, L2p, npass


def _corner_gates(l1, npass, R):
    pid = np.arange(npass, dtype=np.int32) * R
    return jnp.any(
        (l1[None, :] > jnp.asarray(pid)[:, None])
        & (l1[None, :] <= jnp.asarray(pid)[:, None] + R),
        axis=1,
    ).astype(jnp.int32)


def _make_sw_kernel(L1p: int, L2p: int, R: int, npass: int, SL: int = _SL):
    def kernel(s_ref, tops_ref, sides_ref, lens_ref, out_ref, row_ref):
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]
        len1 = lens_ref[0]
        len2 = lens_ref[1]

        # SW row 0 boundary: all zeros (variants_pallas._sw_kernel)
        row_ref[...] = jnp.zeros((L2p + 1, SL, _LN), jnp.int32)

        zero = _natc(len1, 0)
        chz = _natc(len1, -5)

        def one_pass(p, best):
            i0 = p * R
            t_ch = [
                tops_ref[pl.ds(jnp.minimum(i0 + r, L1p - 1), 1)][0]
                for r in range(R)
            ]
            # best-update mask: rows beyond len1 are garbage
            rv = [len1 >= (i0 + r + 1) for r in range(R)]

            def step(s, carry):
                scores, prevs, win, ld_prev, best = carry
                ld = row_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                ch_new = sides_ref[pl.ds(jnp.clip(s - 1, 0, L2p - 1), 1)][0]
                win = (ch_new,) + win[:-1]

                new = []
                for r in range(R):
                    up = ld if r == 0 else scores[r - 1]
                    diag = ld_prev if r == 0 else prevs[r - 1]
                    sub = jnp.where(t_ch[r] == win[r], m, -kmis)
                    h = jnp.maximum(
                        jnp.maximum(
                            diag + sub, jnp.maximum(up, scores[r]) - d
                        ),
                        0,
                    )
                    # column 0 is a true zero boundary; the skew
                    # warm-up (jj < 0) sits upstream and the zero
                    # clamp would keep its garbage alive — pin it
                    h = jnp.where(s - r <= 0, zero, h)
                    new.append(h)
                    # masked running best over the true rectangle
                    best = jnp.maximum(
                        best, jnp.where(rv[r] & (len2 >= s - r), h, 0)
                    )

                @pl.when((s >= R - 1) & (s - (R - 1) <= L2p))
                def _():
                    row_ref[pl.ds(s - (R - 1), 1)] = new[R - 1][None]

                return tuple(new), tuple(scores), win, ld, best

            carry = (
                (zero,) * R, (zero,) * R, (chz,) * R, zero, best,
            )
            return jax.lax.fori_loop(0, L2p + R, step, carry)[4]

        out_ref[...] = jax.lax.fori_loop(0, npass, one_pass, zero)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "groups", "interpret")
)
def sw_scores_rowsweep_batch(
    tops, sides, lens1, lens2, m, k, d, *, rows: int = 8,
    groups: int = 1, interpret: bool = False,
):
    """Best local-alignment score per pair (int32[nb], >= 0)."""
    SL = _SL * groups
    (tops_r, sides_r, lens_r, _l1, nb, nbp, nblk, L1p, L2p,
     npass) = _prep(tops, sides, lens1, lens2, rows, SL)
    scalars = jnp.asarray([m, k, d], jnp.int32)

    out = pl.pallas_call(
        _make_sw_kernel(L1p, L2p, rows, npass, SL),
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


def _make_overlap_kernel(L1p: int, L2p: int, R: int, npass: int, SL: int = _SL):
    """Overlap (semi-global) score kernel: free end gaps.

    The SW kernel's zero boundaries (row 0 / column 0 / warm-up pinned
    to 0 — here they are TRUE free boundaries, not clamp artifacts)
    with NW's unclamped interior recurrence; the running best is masked
    to the END boundary (i == len1 or j == len2) inside the true
    rectangle (models/overlap.py semantics; reference FUTURE WORK,
    README:182-187).
    """

    def kernel(s_ref, tops_ref, sides_ref, lens_ref, out_ref, row_ref):
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]
        len1 = lens_ref[0]
        len2 = lens_ref[1]

        row_ref[...] = jnp.zeros((L2p + 1, SL, _LN), jnp.int32)

        zero = _natc(len1, 0)
        chz = _natc(len1, -5)

        def one_pass(p, best):
            i0 = p * R
            t_ch = [
                tops_ref[pl.ds(jnp.minimum(i0 + r, L1p - 1), 1)][0]
                for r in range(R)
            ]
            hit_i = [len1 == (i0 + r + 1) for r in range(R)]
            in_i = [len1 >= (i0 + r + 1) for r in range(R)]

            def step(s, carry):
                scores, prevs, win, ld_prev, best = carry
                ld = row_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                ch_new = sides_ref[pl.ds(jnp.clip(s - 1, 0, L2p - 1), 1)][0]
                win = (ch_new,) + win[:-1]

                new = []
                for r in range(R):
                    up = ld if r == 0 else scores[r - 1]
                    diag = ld_prev if r == 0 else prevs[r - 1]
                    sub = jnp.where(t_ch[r] == win[r], m, -kmis)
                    h = jnp.maximum(
                        diag + sub, jnp.maximum(up, scores[r]) - d
                    )
                    # column 0 is a true zero boundary (free leading
                    # gaps); the warm-up (jj < 0) pins to 0 too and
                    # only ever feeds column 0
                    h = jnp.where(s - r <= 0, zero, h)
                    new.append(h)
                    # best over the end boundary of the true rectangle
                    j = s - r
                    on_end = (
                        (hit_i[r] | (len2 == j))
                        & in_i[r]
                        & (len2 >= j)
                    )
                    best = jnp.maximum(best, jnp.where(on_end, h, 0))

                @pl.when((s >= R - 1) & (s - (R - 1) <= L2p))
                def _():
                    row_ref[pl.ds(s - (R - 1), 1)] = new[R - 1][None]

                return tuple(new), tuple(scores), win, ld, best

            carry = (
                (zero,) * R, (zero,) * R, (chz,) * R, zero, best,
            )
            return jax.lax.fori_loop(0, L2p + R, step, carry)[4]

        out_ref[...] = jax.lax.fori_loop(0, npass, one_pass, zero)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "groups", "interpret")
)
def overlap_scores_rowsweep_batch(
    tops, sides, lens1, lens2, m, k, d, *, rows: int = 8,
    groups: int = 1, interpret: bool = False,
):
    """Best overlap (end-gap-free) score per pair (int32[nb], >= 0)."""
    SL = _SL * groups
    (tops_r, sides_r, lens_r, _l1, nb, nbp, nblk, L1p, L2p,
     npass) = _prep(tops, sides, lens1, lens2, rows, SL)
    scalars = jnp.asarray([m, k, d], jnp.int32)

    out = pl.pallas_call(
        _make_overlap_kernel(L1p, L2p, rows, npass, SL),
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


def _make_affine_kernel(L1p: int, L2p: int, R: int, npass: int, SL: int = _SL):
    def kernel(
        s_ref, tops_ref, sides_ref, lens_ref, out_ref,
        hrow_ref, mrow_ref, xrow_ref,
    ):
        m = s_ref[0]
        kmis = s_ref[1]
        op = s_ref[2]
        ex = s_ref[3]
        len1 = lens_ref[0]
        len2 = lens_ref[1]

        # DP row 0: H = the IY boundary -(op + (jj-1)ex) (jj >= 1),
        # H(0,0) = 0; M only exists at (0,0); IX is NEG everywhere
        jj = jax.lax.broadcasted_iota(jnp.int32, (L2p + 1, SL, _LN), 0)
        hrow_ref[...] = jnp.where(
            jj == 0, jnp.int32(0), -(op + (jj - 1) * ex)
        )
        mrow_ref[...] = jnp.where(jj == 0, jnp.int32(0), jnp.int32(NEG))
        xrow_ref[...] = jnp.full((L2p + 1, SL, _LN), NEG, jnp.int32)

        neg = _natc(len1, NEG)
        chz = _natc(len1, -5)
        cap0 = jnp.where(
            len1 == 0,
            jnp.where(len2 == 0, jnp.int32(0), -(op + (len2 - 1) * ex)),
            jnp.int32(NEG),
        )

        def one_pass(p, cap):
            i0 = p * R
            t_ch = [
                tops_ref[pl.ds(jnp.minimum(i0 + r, L1p - 1), 1)][0]
                for r in range(R)
            ]
            hit_row = [len1 == (i0 + r + 1) for r in range(R)]
            gate = s_ref[4 + p] != 0

            def step(s, carry):
                hs, ms, xs, ys, hprevs, ldh_prev, win, cap = carry
                ldh = hrow_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                ldm = mrow_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                ldx = xrow_ref[pl.ds(jnp.minimum(s, L2p), 1)][0]
                ch_new = sides_ref[pl.ds(jnp.clip(s - 1, 0, L2p - 1), 1)][0]
                win = (ch_new,) + win[:-1]

                nh, nm, nx, ny = [], [], [], []
                for r in range(R):
                    m_up = ldm if r == 0 else ms[r - 1]
                    x_up = ldx if r == 0 else xs[r - 1]
                    h_diag = ldh_prev if r == 0 else hprevs[r - 1]
                    sub = jnp.where(t_ch[r] == win[r], m, -kmis)
                    M = h_diag + sub
                    # gaps open from M only (models/affine.affine_score)
                    IX = jnp.maximum(m_up - op, x_up - ex)
                    IY = jnp.maximum(ms[r] - op, ys[r] - ex)
                    H = jnp.maximum(jnp.maximum(M, IX), IY)
                    nm.append(M)
                    nx.append(IX)
                    ny.append(IY)
                    nh.append(H)

                @pl.when((s >= R - 1) & (s - (R - 1) <= L2p))
                def _():
                    hrow_ref[pl.ds(s - (R - 1), 1)] = nh[R - 1][None]
                    mrow_ref[pl.ds(s - (R - 1), 1)] = nm[R - 1][None]
                    xrow_ref[pl.ds(s - (R - 1), 1)] = nx[R - 1][None]

                def capture(cap):
                    for r in range(R):
                        hit = hit_row[r] & (len2 == (s - r))
                        cap = jnp.where(hit, nh[r], cap)
                    return cap

                cap = jax.lax.cond(gate, capture, lambda c: c, cap)
                return (
                    tuple(nh), tuple(nm), tuple(nx), tuple(ny),
                    tuple(hs), ldh, win, cap,
                )

            carry = (
                (neg,) * R, (neg,) * R, (neg,) * R, (neg,) * R,
                (neg,) * R, neg, (chz,) * R, cap,
            )
            return jax.lax.fori_loop(0, L2p + R, step, carry)[7]

        out_ref[...] = jax.lax.fori_loop(0, npass, one_pass, cap0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rows", "groups", "interpret")
)
def affine_scores_rowsweep_batch(
    tops, sides, lens1, lens2, m, k, open_, extend, *, rows: int = 8,
    groups: int = 1, interpret: bool = False,
):
    """Gotoh affine-gap global score per pair (int32[nb])."""
    SL = _SL * groups
    (tops_r, sides_r, lens_r, l1, nb, nbp, nblk, L1p, L2p,
     npass) = _prep(tops, sides, lens1, lens2, rows, SL)
    scalars = jnp.concatenate(
        [
            jnp.asarray([m, k, open_, extend], jnp.int32),
            _corner_gates(l1, npass, rows),
        ]
    )

    out = pl.pallas_call(
        _make_affine_kernel(L1p, L2p, rows, npass, SL),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((L1p, SL, _LN), lambda b, s: (0, b, 0)),
                pl.BlockSpec((L2p, SL, _LN), lambda b, s: (0, b, 0)),
                pl.BlockSpec((2, SL, _LN), lambda b, s: (0, b, 0)),
            ],
            out_specs=pl.BlockSpec((SL, _LN), lambda b, s: (b, 0)),
            scratch_shapes=[
                pltpu.VMEM((L2p + 1, SL, _LN), jnp.int32)
            ] * 3,
        ),
        out_shape=jax.ShapeDtypeStruct((nblk * SL, _LN), jnp.int32),
        interpret=interpret,
    )(scalars, tops_r, sides_r, lens_r)
    return out.reshape(nbp)[:nb]
