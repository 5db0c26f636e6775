"""Pallas TPU wavefront fill kernels.

The production fill for batched pairs.  Where the reference parallelizes
one pair across pthreads with per-cell mutexes (needleman-wunsch.c:444-475),
this kernel parallelizes across *pairs* — the batch dimension sits in the
128 vector lanes, the anti-diagonal sits in sublanes — and sequences the
wavefront with a plain ``fori_loop``: the dependency order is the loop
order, so there is nothing to lock.

Memory behavior (the whole point of the design):

* the two rolling diagonals live in a VMEM ping-pong buffer
  ``(2, N, BT)`` — scores never touch HBM during the fill;
* the encoded sequences are loaded once per batch block into VMEM;
* for score-only fills (reference ``-q`` mode) the only HBM write is the
  final ``(1, BT)`` score row per block.

Layout per batch block (BT = 128 pairs wide):

* ``sides_sh``: int32[N, BT] — side char per row j (row 0 = sentinel);
* ``tops_ext``: int32[2N+A, BT] — reversed, padded top strings such that
  the chars needed by diagonal ``kk`` are rows ``N+A-kk .. N+A-kk+N`` —
  one dynamic sublane slice per step (same trick as
  :mod:`nw_tpu.ops.fill_scan`);
* per step: compare, three adds, two maxes, arrowless (score-only);
  the true-corner score is captured by a masked reduce when the
  wavefront crosses each pair's ``len1+len2`` diagonal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.encode import PAD_SIDE, PAD_TOP

NEG_INF = jnp.int32(-(2**30))
LANES = 128


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _scores_kernel(mkd_ref, tops_ref, sides_ref, lens_ref, out_ref, buf, cap):
    """One grid step = one block of BT pairs, full wavefront in VMEM.

    Refs:
      mkd_ref:   SMEM (1, 3) int32 — m, k, d
      tops_ref:  VMEM (T, BT) int32 — reversed/padded top chars
      sides_ref: VMEM (N, BT) int32 — shifted side chars (row 0 sentinel)
      lens_ref:  VMEM (2, BT) int32 — row 0 = len1, row 1 = len2
      out_ref:   VMEM (1, BT) int32 — true-corner scores
      buf:       VMEM scratch (2, N, BT) int32 — diagonal ping-pong
      cap:       VMEM scratch (1, BT) int32 — captured corner scores
    """
    N, BT = sides_ref.shape
    T = tops_ref.shape[0]
    A = T - 2 * N  # top bucket length
    m = mkd_ref[0, 0]
    kmis = mkd_ref[0, 1]
    d = mkd_ref[0, 2]

    j_iota = jax.lax.broadcasted_iota(jnp.int32, (N, BT), 0)
    len1 = lens_ref[0:1, :]  # (1, BT)
    len2 = lens_ref[1:2, :]
    k_corner = len1 + len2  # (1, BT)

    # diagonal 0: cell (0,0) = 0, everything else outside the table
    buf[0] = jnp.where(j_iota == 0, jnp.int32(0), NEG_INF)
    buf[1] = jnp.full((N, BT), NEG_INF, jnp.int32)
    cap[...] = jnp.where(k_corner == 0, jnp.int32(0), NEG_INF)

    side_ch = sides_ref[...]
    neg_row = jnp.full((1, BT), NEG_INF, jnp.int32)

    def body(kk, _):
        slot = kk % 2  # prev2 lives here; new diagonal overwrites it
        prev = buf[1 - slot]
        prev2 = buf[slot]

        ch_top = tops_ref[pl.ds(N + A - kk, N), :]
        sub = jnp.where(ch_top == side_ch, m, -kmis)

        prev_sh = jnp.concatenate([neg_row, prev[:-1, :]], axis=0)
        prev2_sh = jnp.concatenate([neg_row, prev2[:-1, :]], axis=0)

        score = jnp.maximum(
            jnp.maximum(prev2_sh + sub, prev_sh - d), prev - d
        )

        # boundary row 0 (j == 0) and column 0 (i == 0 -> j == kk):
        # score = -kk * d (computation.c:104-120; both boundaries share
        # the same value on diagonal kk).
        boundary = (j_iota == 0) | (j_iota == kk)
        score = jnp.where(boundary, -kk * d, score)

        # capture the true-corner score as the wavefront crosses it
        hit = (k_corner == kk) & (j_iota == len2)  # (N, BT), <=1 hit/lane
        cap[...] = jnp.where(
            jnp.any(hit, axis=0, keepdims=True),
            jnp.sum(jnp.where(hit, score, 0), axis=0, keepdims=True),
            cap[...],
        )

        buf[slot] = score
        return 0

    K = A + (N - 1)  # last diagonal index
    jax.lax.fori_loop(1, K + 1, body, 0, unroll=False)
    out_ref[...] = cap[...]


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_pairs")
)
def fill_scores_pallas_batch(
    tops,
    sides,
    lens1,
    lens2,
    m,
    k,
    d,
    interpret: bool = False,
    block_pairs: int = LANES,
):
    """Score a batch of pairs with the Pallas wavefront kernel.

    Args:
      tops: int32[B, A] encoded top strings (PAD_TOP padded).
      sides: int32[B, Bs] encoded side strings (PAD_SIDE padded).
      lens1, lens2: int32[B] true lengths.
      m, k, d: scoring params.
    Returns:
      int32[B] optimal scores (true corner per pair).
    """
    nb, A = tops.shape
    _, Bs = sides.shape

    # pad the side bucket so N = Bs+1 is a sublane multiple, and the
    # batch to a lane multiple (extra lanes are dummy pairs)
    N = _round_up(Bs + 1, 8)
    Bs_pad = N - 1
    BT = block_pairs
    nb_pad = _round_up(max(nb, 1), BT)

    tops = jnp.pad(tops, ((0, nb_pad - nb), (0, 0)), constant_values=PAD_TOP)
    sides = jnp.pad(
        sides, ((0, nb_pad - nb), (0, Bs_pad - Bs)), constant_values=PAD_SIDE
    )
    lens1 = jnp.pad(jnp.asarray(lens1, jnp.int32), (0, nb_pad - nb))
    lens2 = jnp.pad(jnp.asarray(lens2, jnp.int32), (0, nb_pad - nb))

    # (N, nb) side chars, shifted: row j holds side[j-1]
    sides_sh = jnp.concatenate(
        [jnp.full((nb_pad, 1), -3, jnp.int32), sides.astype(jnp.int32)], axis=1
    ).T
    # (2N+A, nb) reversed/padded top chars
    pad_blk = jnp.full((nb_pad, N), -4, jnp.int32)
    tops_ext = jnp.concatenate(
        [pad_blk, tops[:, ::-1].astype(jnp.int32), pad_blk], axis=1
    ).T
    lens = jnp.stack([lens1, lens2], axis=0)  # (2, nb)
    mkd = jnp.array([[m, k, d]], jnp.int32)

    T = 2 * N + A
    grid = (nb_pad // BT,)
    out = pl.pallas_call(
        _scores_kernel,
        out_shape=jax.ShapeDtypeStruct((1, nb_pad), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 3), lambda b: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((T, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((N, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, BT), lambda b: (0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, BT), lambda b: (0, b), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, N, BT), jnp.int32),
                pltpu.VMEM((1, BT), jnp.int32),
            ],
        ),
        interpret=interpret,
    )(mkd, tops_ext, sides_sh, lens, )
    return out[0, :nb]
