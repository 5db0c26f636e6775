"""Pallas TPU kernels for the model variants (reference FUTURE WORK).

Batch-in-lanes wavefront kernels — same layout and hot-loop economies
as :mod:`nw_tpu.ops.fill_pallas` — for:

* **Smith-Waterman local alignment** (README:179-186): the linear-gap
  recurrence clamped at zero, best score tracked over every cell of the
  true rectangle.  Boundaries are naturally zero (all candidates arrive
  as NEG_INF and the clamp wins).
* **Gotoh affine-gap global alignment** (README:187-193): the
  three-matrix recurrence.  The M matrix needs ``shift(best(k-2))``
  (carried, like the linear kernel's prev2), and the IY row-shift is
  fused: ``IY = shift(max(M - (open-extend), IY)) - extend`` — one
  sublane shift instead of two.  Boundary gap costs
  ``-(open + (L-1)*extend)`` emerge naturally from the IX/IY chains.

Score kernels plus arrows+argmax/state kernels for full batched
tracebacks (models/smith_waterman.sw_align_batch,
models/affine.affine_align_batch walk the packed words on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


from nw_tpu.ops.fill_pallas import LANES, _round_up, prep_batch

# headroom for the affine chains: NEG - open - extend must not wrap
NEG = -(2**29)


def _sw_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, out_ref, prev_ref, prev2sh_ref,
    ch_ref, best_ref
):
    """Smith-Waterman best-local-score kernel.

    Refs as in fill_pallas._scores_kernel; out (1, BT) = best local
    score per pair (>= 0).  The best-update is masked to the pair's
    true rectangle so pad/garbage cells (clamped to >= 0) can never
    contribute.
    """
    N, BT = sides_ref.shape
    A_pad = tops_ref.shape[0]
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    d = mkd_ref[0, 2]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]

    prev_ref[...] = jnp.zeros((N, BT), jnp.int32)  # row/col 0 = 0 in SW
    prev2sh_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
    ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)
    best_ref[...] = jnp.zeros((N, BT), jnp.int32)

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG, jnp.int32)

    def body(kk, _):
        prev = prev_ref[...]

        new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
        ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
        ch_ref[...] = ch_top
        sub = jnp.where(ch_top == side_ch, m, -kmis)

        prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
        score = jnp.maximum(
            jnp.maximum(prev2sh_ref[...] + sub, jnp.maximum(prev_sh, prev) - d),
            0,
        )
        prev2sh_ref[...] = prev_sh
        prev_ref[...] = score

        i_val = kk - j_iota
        in_rect = (
            (j_iota >= 1) & (j_iota <= len2) & (i_val >= 1) & (i_val <= len1)
        )
        best_ref[...] = jnp.maximum(
            best_ref[...], jnp.where(in_rect, score, 0)
        )
        return 0

    K = (A_pad - 1) + (N - 1)
    jax.lax.fori_loop(1, K + 1, body, 0)
    out_ref[...] = jnp.max(best_ref[...], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "block_pairs"))
def sw_scores_pallas_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False, block_pairs: int = LANES,
):
    """Best local-alignment score per pair (int32[B], >= 0)."""
    tops_t, sides_sh, lens, _, (nb, nb_pad, A_pad, N) = prep_batch(
        tops, sides, lens1, lens2, block_pairs
    )
    BT = block_pairs
    mkd = jnp.array([[m, k, d]], jnp.int32)

    out = pl.pallas_call(
        _sw_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb_pad // BT,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_pad, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, BT), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((N, BT), jnp.int32)] * 4,
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    return out[0, :nb]


def _affine_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, out_ref,
    mprev_ref, ixprev_ref, iyprev_ref, b2sh_ref, bprev_ref, ch_ref, cap_ref
):
    """Gotoh three-matrix kernel.

    State per diagonal: M/IX/IY on k-1, best(k-1) (for the carried
    shift), shift(best(k-2)), rolling top chars, and the corner capture
    accumulator.  out (1, BT) = global affine score per pair.
    """
    N, BT = sides_ref.shape
    A_pad = tops_ref.shape[0]
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    op = mkd_ref[0, 2]
    ex = mkd_ref[0, 3]
    min_corner = mkd_ref[0, 4]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2

    # diagonal 0: M(0,0) = 0; IX/IY undefined
    mprev_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG))
    ixprev_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
    iyprev_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
    bprev_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG))
    b2sh_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
    ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)
    cap_ref[...] = jnp.where(
        (k_corner == 0) & (j_iota == 0), jnp.int32(0), jnp.int32(NEG)
    )

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG, jnp.int32)

    def shift(x):
        return jnp.concatenate([neg_row, x[:-1, :]], axis=0)

    def body(kk, _):
        new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
        ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
        ch_ref[...] = ch_top
        sub = jnp.where(ch_top == side_ch, m, -kmis)

        mp = mprev_ref[...]
        M = b2sh_ref[...] + sub
        IX = jnp.maximum(mp - op, ixprev_ref[...] - ex)
        # fused row-shift: shift(max(Mp - (op-ex), IYp)) - ex
        IY = shift(jnp.maximum(mp - (op - ex), iyprev_ref[...])) - ex

        best = jnp.maximum(jnp.maximum(M, IX), IY)
        b2sh_ref[...] = shift(bprev_ref[...])
        bprev_ref[...] = best
        mprev_ref[...] = M
        ixprev_ref[...] = IX
        iyprev_ref[...] = IY

        @pl.when(kk >= min_corner)
        def _():
            hit = (k_corner == kk) & (j_iota == len2)
            cap_ref[...] = jnp.where(hit, best, cap_ref[...])

        return 0

    K = (A_pad - 1) + (N - 1)
    jax.lax.fori_loop(1, K + 1, body, 0)
    out_ref[...] = jnp.max(cap_ref[...], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret", "block_pairs"))
def affine_scores_pallas_batch(
    tops, sides, lens1, lens2, m, k, open_, extend,
    interpret: bool = False, block_pairs: int = LANES,
):
    """Optimal affine-gap global score per pair (int32[B])."""
    tops_t, sides_sh, lens, min_corner, (nb, nb_pad, A_pad, N) = prep_batch(
        tops, sides, lens1, lens2, block_pairs
    )
    BT = block_pairs
    mkd = jnp.concatenate(
        [jnp.array([m, k, open_, extend], jnp.int32), min_corner[None]]
    )[None]

    out = pl.pallas_call(
        _affine_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb_pad // BT,),
            in_specs=[
                pl.BlockSpec((1, 5), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_pad, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, BT), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((N, BT), jnp.int32)] * 7,
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    return out[0, :nb]


# ---------------------------------------------------------------------------
# SW arrows + argmax kernel (batched local-alignment traceback)
# ---------------------------------------------------------------------------
#
# Emits the same packed 4-diagonals-per-int32 arrow words as the NW
# kernels (bits additionally zeroed where score == 0 — a local-alignment
# start point has no arrows, models/smith_waterman.py) plus each pair's
# argmax cell with the scan engine's exact tie rule: first diagonal
# achieving the global max wins, then the lowest row within it.  The
# rule is tracked O(1)/step with per-row (bestrow, first-kk) registers
# and decoded in the epilogue via a packed min-key reduce.

ARROW_CHUNK = 8  # diagonals per grid step (2 packed int32 sublanes)


def _sw_arrows_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, packed_ref, best_ref, arg_ref,
    prev_ref, prev2sh_ref, ch_ref, pack_ref, bestrow_ref, bestk_ref
):
    """Grid (batch_blocks, K_pad // ARROW_CHUNK).

    Outputs (c-invariant accumulators except the slab):
      packed_ref: (ARROW_CHUNK//4, N, BT) int32 arrow words
      best_ref:   (1, BT) int32 best local score (>= 0)
      arg_ref:    (1, BT) int32 packed argmax key = kk * N + j
    """
    _, N, BT = packed_ref.shape
    CHUNK = packed_ref.shape[0] * 4
    A_pad = tops_ref.shape[0]
    c = pl.program_id(1)
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    d = mkd_ref[0, 2]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]

    @pl.when(c == 0)
    def _init():
        prev_ref[...] = jnp.zeros((N, BT), jnp.int32)
        prev2sh_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
        ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)
        bestrow_ref[...] = jnp.zeros((N, BT), jnp.int32)
        bestk_ref[...] = jnp.zeros((N, BT), jnp.int32)
        best_ref[...] = jnp.zeros((1, BT), jnp.int32)
        arg_ref[...] = jnp.zeros((1, BT), jnp.int32)

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG, jnp.int32)

    def step(t, _):
        kk = c * CHUNK + t

        @pl.when(kk >= 1)
        def _():
            prev = prev_ref[...]
            new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
            ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
            ch_ref[...] = ch_top
            sub = jnp.where(ch_top == side_ch, m, -kmis)

            prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
            cand_d = prev2sh_ref[...] + sub
            score = jnp.maximum(
                jnp.maximum(cand_d, jnp.maximum(prev_sh, prev) - d), 0
            )
            prev2sh_ref[...] = prev_sh
            prev_ref[...] = score

            score_d = score + d
            arrows = (
                (cand_d == score).astype(jnp.int32)
                + (prev == score_d).astype(jnp.int32) * 2
                + (prev_sh == score_d).astype(jnp.int32) * 4
            )
            arrows = jnp.where(score > 0, arrows, 0)  # clamp cells: no arrows
            r = jnp.bitwise_and(t, 3)
            word = arrows << (r * 8)

            @pl.when(r == 0)
            def _():
                pack_ref[...] = word

            @pl.when(r != 0)
            def _():
                pack_ref[...] = pack_ref[...] | word

            @pl.when(r == 3)
            def _():
                packed_ref[pl.ds(t // 4, 1), :, :] = pack_ref[...][None]

            # per-row running max + first diagonal achieving it, masked
            # to each pair's true rectangle
            i_val = kk - j_iota
            in_rect = (
                (j_iota >= 1) & (j_iota <= len2)
                & (i_val >= 1) & (i_val <= len1)
            )
            sc = jnp.where(in_rect, score, 0)
            u = sc > bestrow_ref[...]
            bestrow_ref[...] = jnp.where(u, sc, bestrow_ref[...])
            bestk_ref[...] = jnp.where(u, kk, bestk_ref[...])

        @pl.when(kk == 0)
        def _():
            pack_ref[...] = jnp.zeros((N, BT), jnp.int32)

        return 0

    jax.lax.fori_loop(0, CHUNK, step, 0)

    @pl.when(c == pl.num_programs(1) - 1)
    def _finish():
        best = jnp.max(bestrow_ref[...], axis=0, keepdims=True)
        big = jnp.int32(2**30)
        key = jnp.where(
            bestrow_ref[...] == best,
            bestk_ref[...] * N + j_iota,
            big,
        )
        arg = jnp.min(key, axis=0, keepdims=True)
        best_ref[...] = best
        # best == 0 (no positive cell): scan semantics give argmax (0,0)
        arg_ref[...] = jnp.where(best > 0, arg, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_pairs"))
def sw_arrows_pallas_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False, block_pairs: int = LANES,
):
    """Batched SW fill: (words int32[K_pad//4, N, B], best int32[B],
    arg_j int32[B], arg_i int32[B]) — packed arrows + per-pair best
    local score and argmax cell (scan tie rule)."""
    tops_t, sides_sh, lens, _, (nb, nb_pad, A_pad, N) = prep_batch(
        tops, sides, lens1, lens2, block_pairs
    )
    BT = block_pairs
    K_pad = _round_up(A_pad + (N - 1) + 1, ARROW_CHUNK)
    mkd = jnp.array([[m, k, d]], jnp.int32)

    words, best, arg = pl.pallas_call(
        _sw_arrows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K_pad // 4, N, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb_pad // BT, K_pad // ARROW_CHUNK),
            in_specs=[
                pl.BlockSpec((1, 3), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_pad, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (ARROW_CHUNK // 4, N, BT),
                    lambda b, c: (c, 0, b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((N, BT), jnp.int32)] * 6,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    arg = arg[0, :nb]
    return words[:, :, :nb], best[0, :nb], arg % N, arg // N - arg % N


# ---------------------------------------------------------------------------
# Affine (Gotoh) arrows kernel — batched affine traceback
# ---------------------------------------------------------------------------
#
# Per-cell state bits as models/affine.affine_fill_arrows (bits 0-1 the
# M cell's predecessor matrix, bit 2 IX extends, bit 3 IY opens/extends),
# packed 4 cells per int32 word.  Register schedule: the recurrence
# needs the k-1 matrices both unshifted (IX) and shifted (IY), and the
# k-2 matrices shifted (M + the mpred bits), so the kernel carries
# (Mp, IXp) unshifted, (m1sh, iy1sh) = shift(k-1), and
# (m2sh, ix2sh, iy2sh) = shift(k-2) — 4 sublane shifts per step.


def _affine_arrows_kernel(
    mkd_ref, tops_ref, sides_ref, lens_ref, packed_ref, best_ref, state_ref,
    mp_ref, ixp_ref, m1sh_ref, iy1sh_ref, m2sh_ref, ix2sh_ref, iy2sh_ref,
    ch_ref, pack_ref
):
    _, N, BT = packed_ref.shape
    CHUNK = packed_ref.shape[0] * 4
    A_pad = tops_ref.shape[0]
    c = pl.program_id(1)
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    op = mkd_ref[0, 2]
    ex = mkd_ref[0, 3]
    min_corner = mkd_ref[0, 4]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2

    @pl.when(c == 0)
    def _init():
        # diagonal 0: M(0,0) = 0, IX/IY undefined
        mp_ref[...] = jnp.where(j_iota == 0, jnp.int32(0), jnp.int32(NEG))
        ixp_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
        m1sh_ref[...] = jnp.where(j_iota == 1, jnp.int32(0), jnp.int32(NEG))
        iy1sh_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
        m2sh_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
        ix2sh_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
        iy2sh_ref[...] = jnp.full((N, BT), NEG, jnp.int32)
        ch_ref[...] = jnp.full((N, BT), -4, jnp.int32)
        best_ref[...] = jnp.where(
            k_corner == 0, jnp.int32(0), jnp.int32(NEG)
        )
        state_ref[...] = jnp.zeros((1, BT), jnp.int32)

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG, jnp.int32)

    def shift(x):
        return jnp.concatenate([neg_row, x[:-1, :]], axis=0)

    def step(t, _):
        kk = c * CHUNK + t

        @pl.when(kk >= 1)
        def _():
            new_top = tops_ref[pl.ds(jnp.minimum(kk - 1, A_pad - 1), 1), :]
            ch_top = jnp.concatenate([new_top, ch_ref[:-1, :]], axis=0)
            ch_ref[...] = ch_top
            sub = jnp.where(ch_top == side_ch, m, -kmis)

            Mp, IXp = mp_ref[...], ixp_ref[...]
            m1sh, iy1sh = m1sh_ref[...], iy1sh_ref[...]
            m2sh, ix2sh, iy2sh = m2sh_ref[...], ix2sh_ref[...], iy2sh_ref[...]

            best_p2 = jnp.maximum(jnp.maximum(m2sh, ix2sh), iy2sh)
            M = best_p2 + sub
            mpred = jnp.where(
                m2sh >= best_p2, 0, jnp.where(ix2sh >= iy2sh, 1, 2)
            )
            cand_open_x = Mp - op
            cand_ext_x = IXp - ex
            IX = jnp.maximum(cand_open_x, cand_ext_x)
            ixext = cand_ext_x > cand_open_x
            cand_open_y = m1sh - op
            cand_ext_y = iy1sh - ex
            IY = jnp.maximum(cand_open_y, cand_ext_y)
            iyext = cand_ext_y > cand_open_y

            bits = (
                mpred
                + (ixext.astype(jnp.int32) << 2)
                + (iyext.astype(jnp.int32) << 3)
            )
            r = jnp.bitwise_and(t, 3)
            word = bits << (r * 8)

            @pl.when(r == 0)
            def _():
                pack_ref[...] = word

            @pl.when(r != 0)
            def _():
                pack_ref[...] = pack_ref[...] | word

            @pl.when(r == 3)
            def _():
                packed_ref[pl.ds(t // 4, 1), :, :] = pack_ref[...][None]

            # register rollover (order matters: 2-step shadows first)
            m2sh_ref[...] = m1sh
            iy2sh_ref[...] = iy1sh
            ix2sh_ref[...] = shift(IXp)
            m1sh_ref[...] = shift(M)
            iy1sh_ref[...] = shift(IY)
            mp_ref[...] = M
            ixp_ref[...] = IX

            @pl.when(kk >= min_corner)
            def _():
                best = jnp.maximum(jnp.maximum(M, IX), IY)
                st = jnp.where(M >= best, 0, jnp.where(IX >= IY, 1, 2))
                hit = (k_corner == kk) & (j_iota == len2)
                hb = jnp.max(jnp.where(hit, best, NEG), axis=0, keepdims=True)
                hs = jnp.sum(jnp.where(hit, st, 0), axis=0, keepdims=True)
                upd = hb > jnp.int32(NEG)
                best_ref[...] = jnp.where(upd, hb, best_ref[...])
                state_ref[...] = jnp.where(upd, hs, state_ref[...])

        @pl.when(kk == 0)
        def _():
            pack_ref[...] = jnp.zeros((N, BT), jnp.int32)

        return 0

    jax.lax.fori_loop(0, CHUNK, step, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_pairs"))
def affine_arrows_pallas_batch(
    tops, sides, lens1, lens2, m, k, open_, extend,
    interpret: bool = False, block_pairs: int = LANES,
):
    """Batched Gotoh fill emitting packed traceback bits + corner state.

    Returns (words int32[K_pad//4, N, B], scores int32[B],
    states int32[B]) — bit semantics as affine_fill_arrows; ``states``
    is the corner cell's best matrix (0=M, 1=IX, 2=IY), the walk start.
    """
    tops_t, sides_sh, lens, min_corner, (nb, nb_pad, A_pad, N) = prep_batch(
        tops, sides, lens1, lens2, block_pairs
    )
    BT = block_pairs
    K_pad = _round_up(A_pad + (N - 1) + 1, ARROW_CHUNK)
    mkd = jnp.concatenate(
        [jnp.array([m, k, open_, extend], jnp.int32), min_corner[None]]
    )[None]

    words, best, states = pl.pallas_call(
        _affine_arrows_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K_pad // 4, N, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nb_pad // BT, K_pad // ARROW_CHUNK),
            in_specs=[
                pl.BlockSpec((1, 5), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_pad, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (ARROW_CHUNK // 4, N, BT),
                    lambda b, c: (c, 0, b),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((1, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BT), lambda b, c: (0, b), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((N, BT), jnp.int32)] * 9,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(mkd, tops_t, sides_sh, lens)
    return words[:, :, :nb], best[0, :nb], states[0, :nb]
