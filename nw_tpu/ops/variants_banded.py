"""Banded (row-tiled) score kernels for the model variants.

Long-side Smith-Waterman and Gotoh affine batches, using the same
band/boundary machinery as :mod:`nw_tpu.ops.fill_pallas_banded`
(register-resident unrolled hot loop, boundary rows streamed between
band sweeps by producer step) — closing the variants' ~2k side-length
VMEM bound (VERDICT r1 item 7; reference FUTURE WORK README:179-193).

Variant-specific handoff details:

* **SW**: one boundary stream (the clamped last-row scores).  The zero
  floor makes every boundary natural — row/column 0 are zeros by clamp,
  and the best-score tracking is masked to each pair's true rectangle
  so clamped pad cells can't contribute.  No seed patch is needed:
  cell (0,0) = 0 falls out of the clamp.
* **Gotoh**: two boundary streams.  The IY chain consumes the parent's
  pre-combined ``max(M - (open-extend), IY)`` last row (staged by the
  producer, so one stream covers both IY dependencies), and the M
  diagonal consumes the parent's ``best`` last row through the carried
  best-shift register.  Band 0 patches the M/best seed (0,0) = 0 after
  the t = 0 substep, as the NW kernel does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.fill_pallas_banded import (
    DEFAULT_BAND_ROWS,
    DEFAULT_CHUNK,
    DEFAULT_UNROLL,
    LANES,
    _geometry,
    _prep_banded,
)

BIG = 2**30
# headroom for the affine chains: NEG - open - extend must not wrap
NEG = -(2**29)


def _make_banded_sw_kernel(RB: int, C: int, off: int, unroll: int):
    """SW banded kernel; grid (batch_blocks, T_pad // C).

    s_ref: scalar prefetch int32[8] — m, k, d, band r, (unused), j0.
    Out: best (1, BT) c-invariant accumulator; bndout (C, BT) by step.
    """

    def kernel(
        s_ref, tops_ref, sides_ref, lens_ref, bnda_ref, bndb_ref,
        best_ref, bndout_ref, prev_ref, prev2sh_ref, ch_ref, bscr_ref,
        stage_ref, brow_ref,
    ):
        BT = lens_ref.shape[1]
        c = pl.program_id(1)
        m = s_ref[0]
        kmis = s_ref[1]
        d = s_ref[2]
        j0 = s_ref[5]

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, BT), 0)
        jg = j_iota + j0
        len1 = lens_ref[0:1, :]
        len2 = lens_ref[1:2, :]

        @pl.when(c == 0)
        def _init():
            prev_ref[...] = jnp.full((RB, BT), NEG, jnp.int32)
            prev2sh_ref[...] = jnp.full((RB, BT), NEG, jnp.int32)
            ch_ref[...] = jnp.full((RB, BT), -4, jnp.int32)
            brow_ref[...] = jnp.zeros((RB, BT), jnp.int32)
            best_ref[...] = jnp.zeros((1, BT), jnp.int32)

        bscr_ref[0 : C - off, :] = bnda_ref[off:C, :]
        if off:
            bscr_ref[C - off : C, :] = bndb_ref[0:off, :]

        side_ch = sides_ref[...]

        def substep(t, tl, prev, prev2sh, ch):
            new_top = tops_ref[pl.ds(tl, 1), :]
            ch = jnp.concatenate([new_top, ch[:-1, :]], axis=0)
            sub = jnp.where(ch == side_ch, m, -kmis)

            inj = bscr_ref[pl.ds(tl, 1), :]
            prev_sh = jnp.concatenate([inj, prev[:-1, :]], axis=0)
            score = jnp.maximum(
                jnp.maximum(prev2sh + sub, jnp.maximum(prev_sh, prev) - d),
                0,
            )

            r8 = jnp.bitwise_and(tl, 7)
            stage_ref[pl.ds(r8, 1), :] = score[RB - 1 : RB, :]

            @pl.when(r8 == 7)
            def _():
                bndout_ref[pl.ds(tl - 7, 8), :] = stage_ref[...]

            i_val = t - j_iota  # column index (local diag t = i + jj)
            in_rect = (
                (jg >= 1) & (jg <= len2) & (i_val >= 1) & (i_val <= len1)
            )
            brow_ref[...] = jnp.maximum(
                brow_ref[...], jnp.where(in_rect, score, 0)
            )
            return score, prev_sh, ch

        def step(i, _):
            tl0 = i * unroll
            prev = prev_ref[...]
            prev2sh = prev2sh_ref[...]
            ch = ch_ref[...]
            for u in range(unroll):
                tl = tl0 + u
                prev, prev2sh, ch = substep(c * C + tl, tl, prev, prev2sh, ch)
            prev_ref[...] = prev
            prev2sh_ref[...] = prev2sh
            ch_ref[...] = ch
            return 0

        jax.lax.fori_loop(0, C // unroll, step, 0)

        @pl.when(c == pl.num_programs(1) - 1)
        def _finish():
            best_ref[...] = jnp.max(brow_ref[...], axis=0, keepdims=True)

    return kernel


def _variant_scalars(p0, p1, p2, p3, r, RB, lens, nb):
    """[p0, p1, p2, p3, r(band), j0, first, tcap] — the variant kernels'
    scalar-prefetch vector (band index drives the sides block)."""
    r = jnp.asarray(r, jnp.int32)
    j0 = r * RB
    l1 = lens[0, :nb]
    l2 = lens[1, :nb]
    in_band = (l2 >= j0) & (l2 < j0 + RB)
    tcap = jnp.min(jnp.where(in_band, l1 + l2 - j0, BIG))
    return jnp.stack(
        [
            jnp.asarray(p0, jnp.int32),
            jnp.asarray(p1, jnp.int32),
            jnp.asarray(p2, jnp.int32),
            jnp.asarray(p3, jnp.int32),
            r,
            j0,
            (r == 0).astype(jnp.int32),
            tcap.astype(jnp.int32),
        ]
    )


def _banded_specs(RB, C, lag0, BT, n_streams):
    """Shared in/out spec plumbing: tops chunk, sides band, lens, and
    ``n_streams`` boundary (a, b) block pairs; score out + bndout per
    stream."""
    in_specs = [
        pl.BlockSpec((C, BT), lambda b, c, s: (c, b), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (RB, BT), lambda b, c, s: (s[4], b), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((2, BT), lambda b, c, s: (0, b), memory_space=pltpu.VMEM),
    ]
    for _ in range(n_streams):
        in_specs += [
            pl.BlockSpec(
                (C, BT), lambda b, c, s: (c + lag0, b),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, BT), lambda b, c, s: (c + lag0 + 1, b),
                memory_space=pltpu.VMEM,
            ),
        ]
    out_specs = [
        pl.BlockSpec((1, BT), lambda b, c, s: (0, b), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec((C, BT), lambda b, c, s: (c, b), memory_space=pltpu.VMEM)
    ] * n_streams
    return in_specs, out_specs


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_pairs", "band_rows", "chunk", "unroll"),
)
def sw_scores_banded_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    band_rows: int = DEFAULT_BAND_ROWS,
    chunk: int = DEFAULT_CHUNK,
    unroll: int = DEFAULT_UNROLL,
):
    """Best local-alignment score per pair at ANY side length."""
    nb, A = tops.shape
    _, Bs = sides.shape
    if nb == 0:
        return jnp.zeros((0,), jnp.int32)
    BT = block_pairs
    N = Bs + 1
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, unroll
    )
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )
    in_specs, out_specs = _banded_specs(RB, C, lag0, BT, 1)
    call = pl.pallas_call(
        _make_banded_sw_kernel(RB, C, off, unroll),
        out_shape=(
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, nb_pad), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb_pad // BT, T_pad // C),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((RB, BT), jnp.int32),  # prev
                pltpu.VMEM((RB, BT), jnp.int32),  # shift(prev2)
                pltpu.VMEM((RB, BT), jnp.int32),  # rolling top chars
                pltpu.VMEM((C, BT), jnp.int32),   # boundary window
                pltpu.VMEM((8, BT), jnp.int32),   # boundary staging
                pltpu.VMEM((RB, BT), jnp.int32),  # per-row best
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )

    # SW boundary rows are 0 (and out-of-table NEG decays under the
    # clamp); the dummy parent is all-NEG so row 0 emerges as zeros
    bnd0 = jnp.full((U_pad, nb_pad), NEG, jnp.int32)
    best0 = jnp.zeros((1, nb_pad), jnp.int32)

    def band_body(carry, r):
        best, bnd = carry
        s = _variant_scalars(m, k, d, 0, r, RB, lens, nb)
        part, bnd = call(s, tops_sh, sides_sh, lens, bnd, bnd)
        return (jnp.maximum(best, part), bnd), None

    (best, _), _ = jax.lax.scan(
        band_body, (best0, bnd0), jnp.arange(nbands, dtype=jnp.int32)
    )
    return best[0, :nb]


def _make_banded_affine_kernel(RB: int, C: int, off: int, unroll: int):
    """Gotoh banded kernel; two boundary streams (iy-chain, best).

    s_ref: [m, k, open, extend, band r, j0, first, tcap].
    """

    def kernel(
        s_ref, tops_ref, sides_ref, lens_ref,
        ya_ref, yb_ref, ba_ref, bb_ref,
        score_ref, ybndout_ref, bbndout_ref,
        mp_ref, ixp_ref, iyp_ref, bprev_ref, b2sh_ref, ch_ref,
        yscr_ref, bscr_ref, ystage_ref, bstage_ref,
    ):
        BT = lens_ref.shape[1]
        c = pl.program_id(1)
        m = s_ref[0]
        kmis = s_ref[1]
        op = s_ref[2]
        ex = s_ref[3]
        j0 = s_ref[5]
        first = s_ref[6]
        tcap = s_ref[7]

        j_iota = jax.lax.broadcasted_iota(jnp.int32, (RB, BT), 0)
        len1 = lens_ref[0:1, :]
        len2 = lens_ref[1:2, :]
        t_corner = len1 + len2 - j0
        tgt_row = len2 - j0

        @pl.when(c == 0)
        def _init():
            mp_ref[...] = jnp.full((RB, BT), NEG, jnp.int32)
            ixp_ref[...] = jnp.full((RB, BT), NEG, jnp.int32)
            iyp_ref[...] = jnp.full((RB, BT), NEG, jnp.int32)
            bprev_ref[...] = jnp.full((RB, BT), NEG, jnp.int32)
            b2sh_ref[...] = jnp.full((RB, BT), NEG, jnp.int32)
            ch_ref[...] = jnp.full((RB, BT), -4, jnp.int32)
            score_ref[...] = jnp.where(
                (first == 1) & (len1 + len2 == 0),
                jnp.int32(0), jnp.int32(NEG),
            )

        yscr_ref[0 : C - off, :] = ya_ref[off:C, :]
        bscr_ref[0 : C - off, :] = ba_ref[off:C, :]
        if off:
            yscr_ref[C - off : C, :] = yb_ref[0:off, :]
            bscr_ref[C - off : C, :] = bb_ref[0:off, :]

        side_ch = sides_ref[...]

        def substep(t, tl, st):
            Mp, IXp, IYp, bprev, b2sh, ch = st
            new_top = tops_ref[pl.ds(tl, 1), :]
            ch = jnp.concatenate([new_top, ch[:-1, :]], axis=0)
            sub = jnp.where(ch == side_ch, m, -kmis)

            M = b2sh + sub
            IX = jnp.maximum(Mp - op, IXp - ex)
            # fused row-shift with the parent's pre-combined last row
            # entering at row 0
            yinj = yscr_ref[pl.ds(tl, 1), :]
            IY = (
                jnp.concatenate(
                    [yinj, jnp.maximum(Mp - (op - ex), IYp)[:-1, :]], axis=0
                )
                - ex
            )
            best = jnp.maximum(jnp.maximum(M, IX), IY)

            binj = bscr_ref[pl.ds(tl, 1), :]
            b2sh = jnp.concatenate([binj, bprev[:-1, :]], axis=0)

            r8 = jnp.bitwise_and(tl, 7)
            ystage_ref[pl.ds(r8, 1), :] = jnp.maximum(
                M[RB - 1 : RB, :] - (op - ex), IY[RB - 1 : RB, :]
            )
            bstage_ref[pl.ds(r8, 1), :] = best[RB - 1 : RB, :]

            @pl.when(r8 == 7)
            def _():
                ybndout_ref[pl.ds(tl - 7, 8), :] = ystage_ref[...]
                bbndout_ref[pl.ds(tl - 7, 8), :] = bstage_ref[...]

            @pl.when(t >= tcap)
            def _():
                hit = (t_corner == t) & (j_iota == tgt_row)
                score_ref[...] = jnp.maximum(
                    score_ref[...],
                    jnp.max(jnp.where(hit, best, NEG), axis=0, keepdims=True),
                )
            return (M, IX, IY, best, b2sh, ch)

        def step(i, _):
            tl0 = i * unroll
            st = (
                mp_ref[...], ixp_ref[...], iyp_ref[...],
                bprev_ref[...], b2sh_ref[...], ch_ref[...],
            )
            for u in range(unroll):
                tl = tl0 + u
                st = substep(c * C + tl, tl, st)
                if u == 0:
                    seed_now = (c == 0) & (i == 0) & (first == 1)
                    mask = seed_now & (j_iota == 0)
                    st = (
                        jnp.where(mask, jnp.int32(0), st[0]),  # M(0,0) = 0
                        st[1], st[2],
                        jnp.where(mask, jnp.int32(0), st[3]),  # best(0,0)
                    ) + st[4:]
            mp_ref[...], ixp_ref[...], iyp_ref[...] = st[0], st[1], st[2]
            bprev_ref[...], b2sh_ref[...], ch_ref[...] = st[3], st[4], st[5]
            return 0

        jax.lax.fori_loop(0, C // unroll, step, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("interpret", "block_pairs", "band_rows", "chunk", "unroll"),
)
def affine_scores_banded_batch(
    tops, sides, lens1, lens2, m, k, open_, extend,
    interpret: bool = False,
    block_pairs: int = LANES,
    band_rows: int = DEFAULT_BAND_ROWS,
    chunk: int = DEFAULT_CHUNK,
    unroll: int = DEFAULT_UNROLL,
):
    """Optimal affine-gap global score per pair at ANY side length."""
    nb, A = tops.shape
    _, Bs = sides.shape
    if nb == 0:
        return jnp.zeros((0,), jnp.int32)
    BT = block_pairs
    N = Bs + 1
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, unroll
    )
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )
    in_specs, out_specs = _banded_specs(RB, C, lag0, BT, 2)
    call = pl.pallas_call(
        _make_banded_affine_kernel(RB, C, off, unroll),
        out_shape=(
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((U_pad, nb_pad), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb_pad // BT, T_pad // C),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[pltpu.VMEM((RB, BT), jnp.int32)] * 6
            + [
                pltpu.VMEM((C, BT), jnp.int32),  # iy-chain window
                pltpu.VMEM((C, BT), jnp.int32),  # best window
                pltpu.VMEM((8, BT), jnp.int32),  # iy-chain staging
                pltpu.VMEM((8, BT), jnp.int32),  # best staging
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )

    ybnd0 = jnp.full((U_pad, nb_pad), NEG, jnp.int32)
    bbnd0 = jnp.full((U_pad, nb_pad), NEG, jnp.int32)
    scores0 = jnp.full((1, nb_pad), NEG, jnp.int32)

    def band_body(carry, r):
        scores, ybnd, bbnd = carry
        s = _variant_scalars(m, k, open_, extend, r, RB, lens, nb)
        part, ybnd, bbnd = call(
            s, tops_sh, sides_sh, lens, ybnd, ybnd, bbnd, bbnd
        )
        return (jnp.maximum(scores, part), ybnd, bbnd), None

    (scores, _, _), _ = jax.lax.scan(
        band_body, (scores0, ybnd0, bbnd0),
        jnp.arange(nbands, dtype=jnp.int32),
    )
    return scores[0, :nb]
