"""Single-pair Pallas wavefront kernel (fold layout) for huge pairs.

The batched kernels in :mod:`nw_tpu.ops.fill_pallas` put the batch in the
128 vector lanes — useless for ONE huge pair.  Here the anti-diagonal
itself fills the whole vector unit: the diagonal's row index ``j`` folds
into a (R, 128) block, ``j = r * 128 + lane``.  The shift-by-one-row the
NW recurrence needs becomes a lane-rotate plus a lane-0 fix-up from the
previous sublane row:

    sh[j] = x[j-1]  ==  where(lane == 0, rotate(x)[r-1 row], rotate(x))

The per-step top character ``top[kk-1]`` enters the rolling character
register at position j = 0; it is extracted from the folded top-char
block by a sublane-dynamic row slice + lane-masked reduce (Mosaic
forbids lane-dynamic slicing, so a direct gather is not expressible).

The kernel emits the wavefront's value at a *fixed* row ``j = B`` every
step — one scalar into an SMEM output block — which reconstructs the DP
row ``H[B, :]`` in O(A+B) memory: exactly the building block Hirschberg
(ops/hirschberg.py) needs for linear-space traceback of 100kb+ pairs,
and the corner score is ``H[B, A]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -(2**30)
LANES = 128
ROW_CHUNK = 512  # emitted scalars per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fold_shift_j(x, fill, l_iota, j_glob):
    """sh[j] = x[j-1] in the (R, 128) fold layout; sh[0] = fill.

    A lane-rotate plus a lane-0 fix-up from the previous sublane row
    (Mosaic has no cross-lane shift with carry).
    """
    R = x.shape[0]
    y = pltpu.roll(x, 1, axis=1)  # lane rotate within each row
    if R > 1:
        y_down = jnp.concatenate(
            [jnp.full((1, LANES), NEG_INF, jnp.int32), y[:-1, :]], axis=0
        )
    else:  # R == 1: the row above is outside the table
        y_down = jnp.full((1, LANES), NEG_INF, jnp.int32)
    z = jnp.where(l_iota == 0, y_down, y)
    return jnp.where(j_glob == 0, fill, z)


def fold_pair(top, side, R: int, A_r: int):
    """Fold one pair's encoded sequences into the (R, 128) layouts.

    side_fold row r, lane l = side[j-1] for j = r*128+l (j = 0 is the
    -3 sentinel, tail padded -5); top_fold row r, lane l = top[r*128+l]
    (tail padded -1).
    """
    B = side.shape[0]
    A = top.shape[0]
    side_fold = jnp.concatenate(
        [
            jnp.full((1,), -3, jnp.int32),
            side.astype(jnp.int32),
            jnp.full((R * LANES - B - 1,), -5, jnp.int32),
        ]
    ).reshape(R, LANES)
    top_fold = jnp.concatenate(
        [top.astype(jnp.int32), jnp.full((A_r * LANES - A,), -1, jnp.int32)]
    ).reshape(A_r, LANES)
    return top_fold, side_fold



def _make_kernel(A: int, B: int, R: int):
    A_r = _round_up(max(A, 1), LANES) // LANES

    def kernel(mkd_ref, tops_ref, sides_ref, out_ref, prev_ref, prev2sh_ref, ch_ref):
        """Grid (K_pad // ROW_CHUNK,).

        Hot-loop economies as in fill_pallas._scores_kernel: natural
        boundaries (no boundary select) and the carried pre-shifted
        prev2 diagonal (one shift_j saved per step — shift_j costs a
        lane-rotate plus two selects here, so this is the larger win).

        mkd_ref:   SMEM (1, 4) int32 — m, k, d, l2 (emission row; the
                   true side length when the side is bucket-padded)
        tops_ref:  VMEM (A_r, 128) int32 — folded top chars
        sides_ref: VMEM (R, 128) int32 — folded side chars (j=0 sentinel)
        out_ref:   SMEM (1, ROW_CHUNK) int32 — H[l2, kk-l2] stream
        prev/prev2sh/ch: VMEM (R, 128) int32 scratch (persist across grid)
        """
        c = pl.program_id(0)
        m = mkd_ref[0, 0]
        kmis = mkd_ref[0, 1]
        d = mkd_ref[0, 2]
        l2 = mkd_ref[0, 3]
        r2 = jnp.minimum(l2 // LANES, R - 1)

        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        j_glob = r_iota * LANES + l_iota
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        @pl.when(c == 0)
        def _init():
            prev_ref[...] = jnp.where(j_glob == 0, jnp.int32(0), jnp.int32(NEG_INF))
            prev2sh_ref[...] = jnp.full((R, LANES), NEG_INF, jnp.int32)
            ch_ref[...] = jnp.full((R, LANES), -4, jnp.int32)

        side_ch = sides_ref[...]

        def shift_j(x, fill):
            return fold_shift_j(x, fill, l_iota, j_glob)

        def step(t, _):
            kk = c * ROW_CHUNK + t

            @pl.when(kk >= 1)
            def _():
                prev = prev_ref[...]

                # top[kk-1]: sublane-dynamic row slice + lane-masked reduce
                x = kk - 1
                xr = jnp.minimum(x // LANES, A_r - 1)
                row = tops_ref[pl.ds(xr, 1), :]
                new_ch = jnp.sum(
                    jnp.where(lane_row == x % LANES, row, 0)
                )
                ch = shift_j(ch_ref[...], new_ch)
                ch_ref[...] = ch
                sub = jnp.where(ch == side_ch, m, -kmis)

                prev_sh = shift_j(prev, jnp.int32(NEG_INF))
                score = jnp.maximum(
                    prev2sh_ref[...] + sub, jnp.maximum(prev_sh, prev) - d
                )

                prev2sh_ref[...] = prev_sh
                prev_ref[...] = score
                # emission row value: sublane-dynamic row slice +
                # lane-masked reduce (lane-dynamic gathers are not
                # expressible in Mosaic)
                emit_row = prev_ref[pl.ds(r2, 1), :]
                out_ref[0, t] = jnp.sum(
                    jnp.where(lane_row == l2 % LANES, emit_row, 0)
                )

            @pl.when(kk == 0)
            def _():
                out_ref[0, t] = 0  # H[0, 0] when l2 == 0

            return 0

        jax.lax.fori_loop(0, ROW_CHUNK, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def last_row_pallas(top, side, m, k, d, len2=None, interpret: bool = False):
    """H[len2, 0..A] of the DP table for ONE pair.

    top: int32[A]; side: int32[B] (bucket-padded OK — pass the true side
    length as ``len2``; row ``len2`` never depends on pad rows/cols).
    Returns int32[A+1] (entries beyond the true top length reflect pad
    chars; slice them off on the host).
    """
    A = top.shape[0]
    B = side.shape[0]
    if len2 is None:
        len2 = B
    len2 = jnp.asarray(len2, jnp.int32)
    N_pad = _round_up(B + 1, LANES)
    R = N_pad // LANES
    A_r = _round_up(max(A, 1), LANES) // LANES
    K_true = A + B
    K_pad = _round_up(K_true + 1, ROW_CHUNK)

    top_fold, side_fold = fold_pair(top, side, R, A_r)
    mkd = jnp.stack(
        [
            jnp.asarray(m, jnp.int32),
            jnp.asarray(k, jnp.int32),
            jnp.asarray(d, jnp.int32),
            len2,
        ]
    )[None, :]

    out = pl.pallas_call(
        _make_kernel(A, B, R),
        out_shape=jax.ShapeDtypeStruct((1, K_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(K_pad // ROW_CHUNK,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_r, LANES), lambda c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, LANES), lambda c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, ROW_CHUNK), lambda c: (0, c), memory_space=pltpu.SMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((R, LANES), jnp.int32),
                pltpu.VMEM((R, LANES), jnp.int32),
                pltpu.VMEM((R, LANES), jnp.int32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(mkd, top_fold, side_fold)

    # H[len2, i] sits at out[len2 + i] (emitted at step kk = len2 + i)
    row_tail = (
        jax.lax.dynamic_slice(out[0], (len2 + 1,), (A,)) if A > 0 else out[0][:0]
    )
    row0 = (-len2 * jnp.asarray(d, jnp.int32))[None]
    return jnp.concatenate([row0, row_tail])


def score_pallas_single(top, side, m, k, d, interpret: bool = False):
    """Optimal score of one pair via the fold-layout kernel."""
    return last_row_pallas(top, side, m, k, d, interpret=interpret)[-1]


# ---------------------------------------------------------------------------
# Fused score + solution-count kernel (huge-pair `-s` summary)
# ---------------------------------------------------------------------------
#
# The optimal-alignment count is itself a wavefront DP (pathcount.py):
# cnt[c] = sum of counts over optimal predecessors.  Carrying the count
# diagonals alongside the score diagonals computes the reference's
# summary (solution count + optimal score, computation.c:271-281) for
# pairs whose arrow table could never be materialized — one pass, O(N)
# memory.  Count arithmetic is int32 with wraparound — bit-identical to
# the reference's unsigned overflow (computation.h:65).


def _make_score_count_kernel(R: int, A_r: int, C: int):
    def kernel(
        mkd_ref, lens_ref, tops_ref, sides_ref, out_ref,
        prev_ref, prev2sh_ref, ch_ref, cprev_ref, cprev2sh_ref
    ):
        """Grid (K_pad // C,).  out: SMEM (1, 2) = score, count.

        lens_ref: SMEM (1, 2) = len1, len2.  Natural boundaries: the
        count recurrence needs no boundary handling either — boundary
        cells have exactly one optimal predecessor by construction, and
        the shifted-in count rows are 0.
        """
        c = pl.program_id(0)
        m = mkd_ref[0, 0]
        kmis = mkd_ref[0, 1]
        d = mkd_ref[0, 2]
        l1 = lens_ref[0, 0]
        l2 = lens_ref[0, 1]
        k_corner = l1 + l2

        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        j_glob = r_iota * LANES + l_iota
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        @pl.when(c == 0)
        def _init():
            prev_ref[...] = jnp.where(j_glob == 0, jnp.int32(0), jnp.int32(NEG_INF))
            prev2sh_ref[...] = jnp.full((R, LANES), NEG_INF, jnp.int32)
            ch_ref[...] = jnp.full((R, LANES), -4, jnp.int32)
            cprev_ref[...] = jnp.where(j_glob == 0, jnp.int32(1), jnp.int32(0))
            cprev2sh_ref[...] = jnp.zeros((R, LANES), jnp.int32)
            # len-0+0 pair: corner at diagonal 0 (score 0, count 1)
            out_ref[0, 0] = jnp.where(k_corner == 0, 0, NEG_INF)
            out_ref[0, 1] = jnp.where(k_corner == 0, 1, 0)

        side_ch = sides_ref[...]

        def step(t, _):
            kk = c * C + t

            @pl.when(kk >= 1)
            def _():
                prev = prev_ref[...]
                cprev = cprev_ref[...]

                x = kk - 1
                xr = jnp.minimum(x // LANES, A_r - 1)
                row = tops_ref[pl.ds(xr, 1), :]
                new_ch = jnp.sum(jnp.where(lane_row == x % LANES, row, 0))
                ch = fold_shift_j(ch_ref[...], new_ch, l_iota, j_glob)
                ch_ref[...] = ch
                sub = jnp.where(ch == side_ch, m, -kmis)

                prev_sh = fold_shift_j(prev, jnp.int32(NEG_INF), l_iota, j_glob)
                cand_d = prev2sh_ref[...] + sub
                score = jnp.maximum(cand_d, jnp.maximum(prev_sh, prev) - d)
                prev2sh_ref[...] = prev_sh
                prev_ref[...] = score

                # count: sum of predecessor counts over optimal arrows
                cprev_sh = fold_shift_j(cprev, jnp.int32(0), l_iota, j_glob)
                score_d = score + d
                cnt = (
                    jnp.where(cand_d == score, cprev2sh_ref[...], 0)
                    + jnp.where(prev == score_d, cprev, 0)
                    + jnp.where(prev_sh == score_d, cprev_sh, 0)
                )
                cprev2sh_ref[...] = cprev_sh
                cprev_ref[...] = cnt

                @pl.when(kk == k_corner)
                def _():
                    hit = j_glob == l2
                    out_ref[0, 0] = jnp.max(jnp.where(hit, score, NEG_INF))
                    out_ref[0, 1] = jnp.sum(jnp.where(hit, cnt, 0))

            return 0

        jax.lax.fori_loop(0, C, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_count_fold(top, side, m, k, d, len1=None, len2=None, interpret=False):
    """(optimal score, solution count mod 2^32) of ONE pair, O(N) memory.

    The count is what the reference's ``-s`` summary prints
    (computation.c:277, %d of an overflowing unsigned counter).
    """
    A = top.shape[0]
    B = side.shape[0]
    l1 = jnp.asarray(A if len1 is None else len1, jnp.int32)
    l2 = jnp.asarray(B if len2 is None else len2, jnp.int32)
    N_pad = _round_up(B + 1, LANES)
    R = N_pad // LANES
    A_r = _round_up(max(A, 1), LANES) // LANES
    C = ROW_CHUNK
    K_pad = _round_up(A + B + 1, C)

    top_fold, side_fold = fold_pair(top, side, R, A_r)
    mkd = jnp.array([[m, k, d]], jnp.int32)
    lens = jnp.stack([l1, l2])[None, :]

    out = pl.pallas_call(
        _make_score_count_kernel(R, A_r, C),
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(K_pad // C,),
            in_specs=[
                pl.BlockSpec((1, 3), lambda c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 2), lambda c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((A_r, LANES), lambda c: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, LANES), lambda c: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 2), lambda c: (0, 0), memory_space=pltpu.SMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((R, LANES), jnp.int32),  # prev score diagonal
                pltpu.VMEM((R, LANES), jnp.int32),  # shift(prev2) score
                pltpu.VMEM((R, LANES), jnp.int32),  # rolling top chars
                pltpu.VMEM((R, LANES), jnp.int32),  # prev count diagonal
                pltpu.VMEM((R, LANES), jnp.int32),  # shift(prev2) count
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(mkd, lens, top_fold, side_fold)
    return out[0, 0], out[0, 1].astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Arrows-emitting fold kernel (long-pair traceback batches)
# ---------------------------------------------------------------------------
#
# Same fold layout, plus a packed-arrow slab streamed to HBM per
# ARROW_CHUNK diagonals.  The folded (R, 128) arrow block for diagonal kk
# IS the diagonal-major row: reshaping the output (K_pad//4, R, 128) to
# (K_pad//4, R*128) yields exactly the packed words_diag[q, j] layout the
# dtype-dispatching traceback and counting ops consume (4 diagonals per
# int32 word, little-endian, as in fill_pallas._arrows_kernel).
# Grid: (pair, K chunk).
#
# Hot-loop economies mirror fill_pallas._arrows_kernel: natural
# boundaries (no boundary/interior selects — cells outside the table
# rhombus hold unspecified garbage no consumer reads), carried
# pre-shifted prev2, fused max-then-subtract, packed int32 stores, and a
# scalar-gated corner capture (lens are SMEM scalars here, so the
# capture runs on exactly one diagonal).
#
# HBM bounds this to K_pad * N_pad / 4 words ~ a few GB per sub-batch
# (e.g. 10 kb pairs: ~200 MB/pair); 100 kb+ pairs use Hirschberg.

def _fold_chunk_for(R: int) -> int:
    """Diagonals per refill grid step: bigger amortizes grid overhead;
    the double-buffered (chunk//4, R, 128) int32 slab plus 4 scratch
    diagonals must stay well inside VMEM."""
    for chunk in (128, 64, 32, 16):
        slab = 2 * (chunk // 4) * R * LANES * 4
        if slab + 6 * R * LANES * 4 < 12 * 1024 * 1024:
            return chunk
    return 8


ARROW_CHUNK = 128  # upper bound; _fold_chunk_for picks per shape


def _make_arrows_kernel(R: int, A_r: int):
    def kernel(
        mkd_ref, lens_ref, tops_ref, sides_ref, packed_ref, score_ref,
        prev_ref, prev2sh_ref, ch_ref, pack_ref
    ):
        """Grid (nb, K_pad // ARROW_CHUNK).

        mkd_ref:    SMEM (1, 3) int32 — m, k, d
        lens_ref:   SMEM (1, 2) int32 — len1, len2 of this pair
        tops_ref:   VMEM (A_r, 128) int32 — folded top chars
        sides_ref:  VMEM (R, 128) int32 — folded side chars (j=0 sentinel)
        packed_ref: VMEM (ARROW_CHUNK//4, R, 128) int32 out slab
        score_ref:  VMEM (1, 128) int32 out — corner score (broadcast)
        prev/prev2sh/ch/pack: VMEM (R, 128) int32 scratch (persist across c)
        """
        ARROW_CHUNK = packed_ref.shape[0] * 4
        c = pl.program_id(1)
        m = mkd_ref[0, 0]
        kmis = mkd_ref[0, 1]
        d = mkd_ref[0, 2]
        l1 = lens_ref[0, 0]
        l2 = lens_ref[0, 1]
        k_corner = l1 + l2

        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        j_glob = r_iota * LANES + l_iota
        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)

        @pl.when(c == 0)
        def _init():
            prev_ref[...] = jnp.where(j_glob == 0, jnp.int32(0), jnp.int32(NEG_INF))
            prev2sh_ref[...] = jnp.full((R, LANES), NEG_INF, jnp.int32)
            ch_ref[...] = jnp.full((R, LANES), -4, jnp.int32)
            # len-0+0 pairs have their corner at diagonal 0 = score 0
            score_ref[...] = jnp.where(
                k_corner == 0, jnp.int32(0), jnp.int32(NEG_INF)
            ) + jnp.zeros((1, LANES), jnp.int32)

        side_ch = sides_ref[...]

        def shift_j(x, fill):
            return fold_shift_j(x, fill, l_iota, j_glob)

        def step(t, _):
            kk = c * ARROW_CHUNK + t

            @pl.when(kk >= 1)
            def _():
                prev = prev_ref[...]

                x = kk - 1
                xr = jnp.minimum(x // LANES, A_r - 1)
                row = tops_ref[pl.ds(xr, 1), :]
                new_ch = jnp.sum(jnp.where(lane_row == x % LANES, row, 0))
                ch = shift_j(ch_ref[...], new_ch)
                ch_ref[...] = ch
                sub = jnp.where(ch == side_ch, m, -kmis)

                prev_sh = shift_j(prev, jnp.int32(NEG_INF))
                cand_d = prev2sh_ref[...] + sub
                score = jnp.maximum(cand_d, jnp.maximum(prev_sh, prev) - d)

                prev2sh_ref[...] = prev_sh
                prev_ref[...] = score

                score_d = score + d
                arrows = (
                    (cand_d == score).astype(jnp.int32)
                    + (prev == score_d).astype(jnp.int32) * 2
                    + (prev_sh == score_d).astype(jnp.int32) * 4
                )
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

                @pl.when(kk == k_corner)
                def _():
                    corner = jnp.max(
                        jnp.where(j_glob == l2, score, NEG_INF)
                    )
                    score_ref[...] = corner[None, None] + jnp.zeros(
                        (1, LANES), jnp.int32
                    )

            @pl.when(kk == 0)
            def _():
                pack_ref[...] = jnp.zeros((R, LANES), jnp.int32)

            return 0

        jax.lax.fori_loop(0, ARROW_CHUNK, step, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "packed"))
def fill_arrows_fold_batch(
    tops, sides, lens1, lens2, m, k, d, interpret=False, packed=False
):
    """Long-pair batched fill emitting diagonal-major packed arrows.

    tops: int32[B, A]; sides: int32[B, Bs]; lens1/lens2: int32[B].
    Returns ``packed=False``: (arrows uint8[B, K_pad, N_pad],
    scores int32[B]) where ``arrows[b, i+j, j]`` is cell (j, i) of pair
    b (N_pad = Bs+1 rounded to 128); ``packed=True``: (words
    int32[B, K_pad//4, N_pad], scores) — the same cell is byte
    ``(i+j) & 3`` of ``words[b, (i+j) >> 2, j]``.  Cells outside the
    table rhombus are unspecified.
    """
    nb, A = tops.shape
    _, Bs = sides.shape
    N_pad = _round_up(Bs + 1, LANES)
    R = N_pad // LANES
    A_r = _round_up(max(A, 1), LANES) // LANES
    ARROW_CHUNK = _fold_chunk_for(R)
    K_true = A + Bs
    K_pad = _round_up(K_true + 1, ARROW_CHUNK)

    top_fold, side_fold = jax.vmap(
        lambda t, sd: fold_pair(t, sd, R, A_r)
    )(tops, sides)
    lens = jnp.stack(
        [jnp.asarray(lens1, jnp.int32), jnp.asarray(lens2, jnp.int32)], axis=1
    )[:, None, :]  # (nb, 1, 2)
    mkd = jnp.array([[m, k, d]], jnp.int32)

    grid = (nb, K_pad // ARROW_CHUNK)
    words, scores = pl.pallas_call(
        _make_arrows_kernel(R, A_r),
        out_shape=(
            jax.ShapeDtypeStruct((nb, K_pad // 4, R, LANES), jnp.int32),
            jax.ShapeDtypeStruct((nb, 1, LANES), jnp.int32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3), lambda b, c: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((None, 1, 2), lambda b, c: (b, 0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (None, A_r, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (None, R, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=(
                pl.BlockSpec(
                    (None, ARROW_CHUNK // 4, R, LANES),
                    lambda b, c: (b, c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (None, 1, LANES), lambda b, c: (b, 0, 0), memory_space=pltpu.VMEM
                ),
            ),
            scratch_shapes=[
                pltpu.VMEM((R, LANES), jnp.int32),  # prev diagonal
                pltpu.VMEM((R, LANES), jnp.int32),  # shift(prev2) diagonal
                pltpu.VMEM((R, LANES), jnp.int32),  # rolling top chars
                pltpu.VMEM((R, LANES), jnp.int32),  # 4-diagonal packing word
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(mkd, lens, top_fold, side_fold)
    words = words.reshape(nb, K_pad // 4, N_pad)
    if packed:
        return words, scores[:, 0, 0]
    from nw_tpu.ops.fill_pallas import unpack_arrows32

    return unpack_arrows32(words.swapaxes(0, 1)).swapaxes(0, 1), scores[:, 0, 0]
