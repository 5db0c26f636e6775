"""Checkpointed banded traceback: exact greedy walks at any scale.

Materializing full arrow tables for a 128-pair batch of 10 kb pairs
needs ~14 GB of HBM; 100 kb pairs are hopeless.  This module trades one
extra fill pass for O(sqrt)-ish live memory, batching the reference's
walk (needleman-wunsch.c:209-331, first-emission greedy order
diag > left > up) across the whole batch:

1. **Checkpoint pass** — the banded score sweep
   (ops/fill_pallas_banded.py) runs bottom-up, keeping the boundary row
   at the entry of every *group* of ``S`` bands (the checkpoints; a few
   hundred KB per group vs GBs of arrows).
2. **Walk pass** — groups are revisited top row last: for group ``g``
   the arrows of its ``S`` bands are re-filled from checkpoint ``g`` as
   2-bit GREEDY direction codes (16 cells per int32 word — the walk
   never reads tie masks, so the 3-bit mask would be 4x wasted traffic),
   and a batched backward walk advances every pair whose current row
   lies inside the group.  Within one group each pair's active
   iterations form a prefix of the loop counter (rows only decrease), so
   per-group op buffers are compact; the per-pair op strings are
   stitched ON DEVICE (one small accumulation + flat gather) and cross
   the host link 2-bit packed — the host's only work is unpacking.

The result is bit-identical to ``traceback.traceback_greedy`` on a full
arrow table — i.e. to the first alignment the reference DFS emits —
with peak memory ``O(A * S * RB)`` per group instead of ``O(A * B)``.

This is also the mid-fill checkpoint structure (SURVEY §5 checkpoint
row): the per-group boundary rows are exactly the state a preempted
fill needs to resume (see runtime.checkpoint).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nw_tpu.ops.fill_pallas_banded import (
    DEFAULT_UNROLL,
    LANES,
    NEG_INF,
    _band_scalars,
    _geometry,
    _prep_banded,
    _round_up,
    build_arrows_call,
    build_scores_call,
)
from nw_tpu.ops.traceback import OP_DIAG, OP_LEFT, OP_NONE, OP_UP


def _make_group_fns(
    score_call, arrows_call, tops_sh, sides_sh, lens,
    m, k, d, A, S, RB, T_pad, nb, nb_pad, with_counts,
):
    """Per-group building blocks shared by the monolithic scan
    (:func:`_banded_walk_device`) and the resumable runner
    (:class:`nw_tpu.runtime.checkpoint.ResumableBandedTraceback`):

    * ``group_fwd((scores, counts, bnd, cbnd), g) -> (state', cp)`` —
      one pass-1 group sweep; ``cp`` is the boundary entering group g
      (the checkpoint pass 2 refills from).
    * ``group_walk(i, j, cp, g) -> (i, j, ops_g, ng)`` — pass-2 arrows
      re-fill of group g plus the batched backward walk of every pair
      whose cursor lies inside it; ``ops_g`` is int8[cap, nb] with each
      pair's ops in loop-counter prefix positions [0, ng).

    Returns (group_fwd, group_walk, cap).
    """
    WU = 16  # walk steps per while-loop iteration (amortizes overhead)
    # max in-group walk steps (all-horizontal worst case), WU-aligned
    cap = -(-(A + S * RB + 1) // WU) * WU

    def group_fwd(carry, g):
        scores, counts, bnd, cbnd = carry
        cp = bnd  # boundary entering group g

        def band_fwd(c2, rr):
            scores2, counts2, bnd2, cbnd2 = c2
            s = _band_scalars(m, k, d, g * S + rr, RB, lens, nb)
            if with_counts:
                part, bnd2, cpart, cbnd2 = score_call(
                    s, tops_sh, sides_sh, lens, bnd2, bnd2, cbnd2, cbnd2
                )
                counts2 = counts2 + cpart
            else:
                part, bnd2 = score_call(s, tops_sh, sides_sh, lens, bnd2, bnd2)
            return (jnp.maximum(scores2, part), counts2, bnd2, cbnd2), None

        (scores, counts, bnd, cbnd), _ = jax.lax.scan(
            band_fwd, (scores, counts, bnd, cbnd),
            jnp.arange(S, dtype=jnp.int32),
        )
        return (scores, counts, bnd, cbnd), cp

    walk_loop = _make_walk_loop(S, RB, T_pad, nb, nb_pad, cap)

    def group_walk(i, j, cp, g):
        def band_refill(bnd2, rr):
            s = _band_scalars(m, k, d, g * S + rr, RB, lens, nb)
            words, _, bnd2 = arrows_call(s, tops_sh, sides_sh, lens, bnd2, bnd2)
            return bnd2, words[0]

        _, words = jax.lax.scan(
            band_refill, cp, jnp.arange(S, dtype=jnp.int32)
        )  # (S, T_pad//16, RB, nb_pad)
        return walk_loop(i, j, words, g)

    return group_fwd, group_walk, cap


def _make_walk_loop(S, RB, T_pad, nb, nb_pad, cap, global_bands=False):
    """The batched backward walk over one group's 2-bit word planes
    (``words`` = (S, T_pad//16, RB, nb_pad)); shared by the two-pass
    (re-fill) and one-pass (materialized-words) engines.
    Returns ``walk(i, j, words, g) -> (i, j, ops_g, ng)``.

    ``global_bands``: ``words`` covers ALL bands (the one-pass
    engine's stack) and the walk indexes band ``j // RB`` directly —
    dynamic-slicing the group out of a multi-GB stack first would
    materialize a ~0.5 GB tiled-layout copy per group."""
    WU = 16
    b_ar = jnp.arange(nb, dtype=jnp.int32)

    def walk(i, j, words, g):
        g0 = g * S * RB
        nrows = words.shape[0] * RB if global_bands else S * RB

        def cond(st):
            i, j, tl, _, _ = st
            active = ((i > 0) | (j > 0)) & (j >= g0)
            return jnp.any(active) & (tl < cap)

        def body(st):
            i, j, tl, ops_g, ng = st
            op_rows = []
            for _ in range(WU):
                active = ((i > 0) | (j > 0)) & (j >= g0)
                base = 0 if global_bands else g0
                jl = jnp.clip(j - base, 0, nrows - 1)
                rr = jl // RB
                jj = jl - rr * RB
                t = jnp.clip(i + jj, 0, T_pad - 1)
                # 4-D gather — flattening first forces a tiled-layout
                # copy of the whole group slab (see _make_runs_walk_loop)
                w = words[rr, t >> 4, jj, b_ar]
                # 2-bit greedy code: 0 diag, 1 left, 2 up — exactly the
                # OP_* encoding, so the op IS the field
                a = (w >> ((t & 15) * 2)) & 3
                op_rows.append(
                    jnp.where(active, a, jnp.int32(OP_NONE)).astype(jnp.int8)
                )
                di = jnp.where(active & (a != OP_UP), 1, 0)
                dj = jnp.where(active & (a != OP_LEFT), 1, 0)
                i = i - di
                j = j - dj
                ng = ng + active
            ops_g = jax.lax.dynamic_update_slice(
                ops_g, jnp.stack(op_rows), (tl, 0)
            )
            return (i, j, tl + WU, ops_g, ng)

        ops_g0 = jnp.full((cap, nb), OP_NONE, jnp.int8)
        ng0 = jnp.zeros((nb,), jnp.int32)
        i, j, _, ops_g, ng = jax.lax.while_loop(
            cond, body, (i, j, jnp.int32(0), ops_g0, ng0)
        )
        return i, j, ops_g, ng

    return walk


def _runs_record_cap(A: int, S: int, RB: int) -> int:
    """Static record-buffer height per group.  Records per group =
    number of same-code runs the walk crosses (~2x the gap events on
    the in-group path segment); the cap covers every path whose mean
    run length is >= 6 cells, with a measured ~6x margin for random
    DNA (930 observed at 256 x 10kb).  Paths below that (adversarial
    alternating indels) overflow and fall back to the per-cell engine
    — exactness never depends on the cap."""
    return max(1024, -(-(A + S * RB) // 6) // 128 * 128)


def _make_runs_walk_loop(S, RB, T_pad, nb, nb_pad, A, cap_rec):
    """Run-skip walk over one group's run-byte planes (``words`` =
    (S, T_pad//4, RB, nb_pad) from the ``with_runs`` kernel mode).

    Each gathered byte is ``run << 2 | code``; the walk consumes the
    WHOLE run per iteration — one dependent gather per run instead of
    per cell (~3-60x shorter sequential chain depending on gap
    density; scripts/probe_gather.py measured TPU gathers
    element-serial, so fewer sequential elements is the only lever).

    Emission is the gathered byte itself: the record stream in
    iteration order IS the op string run-length encoded (K x code per
    record), written at loop-counter rows — a ~1 us dynamic slice vs
    the ~16 us/iteration a row-indexed scatter costs (probed; flat in
    target size).  Inactive lanes record OP_NONE in the code bits.

    Returns ``walk(i, j, words, g, recs) -> (i, j, recs, max_it)``
    with ``recs`` int8[cap_rec, nb] (byte patterns; reinterpret uint8
    on host) and ``max_it`` the iteration count — if it exceeds
    cap_rec the caller must fall back to the per-cell engine.
    """
    b_ar = jnp.arange(nb, dtype=jnp.int32)
    cap_it = A + S * RB + 2  # all-single-step worst case (safety bound)

    def walk(i, j, words, g, recs):
        g0 = g * S * RB

        def cond(st):
            i, j, it, _ = st
            active = ((i > 0) | (j > 0)) & (j >= g0)
            return jnp.any(active) & (it < cap_it)

        def body(st):
            i, j, it, recs = st
            active = ((i > 0) | (j > 0)) & (j >= g0)
            jl = jnp.clip(j - g0, 0, S * RB - 1)
            rr = jl // RB
            jj = jl - rr * RB
            t = jnp.clip(i + jj, 0, T_pad - 1)
            # 4-D gather: flattening ``words`` first LOOKS free but a
            # TPU tiled-layout reshape materializes a full copy of the
            # multi-GB group slab (~110 ms/group measured — 30x the
            # whole walk)
            w = words[rr, t >> 2, jj, b_ar]
            v = (w >> ((t & 3) * 8)) & 0xFF
            a = v & 3
            K = jnp.maximum(v >> 2, 1)  # up stores run = 0
            di = jnp.where(a == OP_UP, 0, K)
            dj = jnp.where(a == OP_DIAG, K, jnp.where(a == OP_UP, 1, 0))
            rec = jnp.where(active, v, jnp.int32(OP_NONE))
            recs = jax.lax.dynamic_update_slice(
                recs,
                rec.astype(jnp.int8)[None, :],
                (jnp.minimum(it, cap_rec - 1), 0),
            )
            i = jnp.where(active, i - di, i)
            j = jnp.where(active, j - dj, j)
            return (i, j, it + 1, recs)

        i, j, it, recs = jax.lax.while_loop(
            cond, body, (i, j, jnp.int32(0), recs)
        )
        return i, j, recs, it

    return walk


def _walk_setup(
    tops, sides, lens1, lens2, m, k, d, interpret, block_pairs,
    band_rows, chunk, unroll, group_bands, with_counts,
):
    """Geometry + layouts + compiled calls + per-group fns for the
    checkpointed banded traceback — shared by the monolithic scan
    (:func:`_banded_walk_device`) and the resumable runner.

    Returns (ngroups, U_pad, nb_pad, group_fwd, group_walk, cap)."""
    import math

    nb, A = tops.shape
    _, Bs = sides.shape
    BT = block_pairs
    N = Bs + 1
    S = group_bands
    # the pass-2 refill packs 16 greedy codes per int32 word, so the
    # chunk must be a multiple of lcm(unroll, 16) (the pack register
    # cannot cross a grid step); pass 1 only needs C % lcm(unroll, 8)
    q = unroll * 16 // math.gcd(unroll, 16)
    chunk = -(-chunk // q) * q
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, unroll
    )
    ngroups = -(-nbands // S)
    nbands = ngroups * S  # pad to whole groups (extra bands fill pad rows)
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )

    if with_counts:
        score_call = build_arrows_call(
            RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret,
            with_counts=True, with_words=False,
        )
    else:
        score_call = build_scores_call(
            RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret
        )
    # pass-2 refill emits 2-bit GREEDY direction codes (16 cells/word):
    # the walk never reads tie masks, and the 4x-smaller word slab cuts
    # both the kernel's store traffic and its VMEM footprint
    # (VERDICT r2 item 3)
    WALK_UNROLL = 16  # pack period of the 2-bit words
    arrows_call = build_arrows_call(
        RB, C, off, lag0, WALK_UNROLL, T_pad, U_pad, nb_pad, BT, interpret,
        with_counts=False, pack_bits=2,
    )

    group_fwd, group_walk, cap = _make_group_fns(
        score_call, arrows_call, tops_sh, sides_sh, lens,
        m, k, d, A, S, RB, T_pad, nb, nb_pad, with_counts,
    )
    return ngroups, U_pad, nb_pad, group_fwd, group_walk, cap


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_pairs", "band_rows", "chunk", "unroll",
        "group_bands", "with_counts", "host_stitch",
    ),
)
def _banded_walk_device(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool,
    block_pairs: int,
    band_rows: int,
    chunk: int,
    unroll: int,
    group_bands: int,
    with_counts: bool,
    host_stitch: bool = False,
):
    """Device part: (scores int32[nb], counts, ops4 (stitched, packed),
    total int32[nb]).  ``counts`` rides the checkpoint pass for free
    when ``with_counts`` (None otherwise).

    ``host_stitch`` skips :func:`device_stitch_pack` (its position ->
    group accumulation + (A+Bs, nb)-element gather) and instead ships
    the per-group op prefixes 2-bit packed, (ngroups, cap//4, nb) —
    the host stitches with :func:`_compact_group_ops`, hidden behind
    the dispatch pipeline."""
    nb, A = tops.shape
    _, Bs = sides.shape
    (
        ngroups, U_pad, nb_pad, group_fwd, group_walk, cap
    ) = _walk_setup(
        tops, sides, lens1, lens2, m, k, d, interpret, block_pairs,
        band_rows, chunk, unroll, group_bands, with_counts,
    )

    # ---- pass 1: score sweep, checkpoint = boundary at each group entry
    # (solution counts ride along when asked — one pass serves -s too)
    bnd0 = jnp.full((U_pad, nb_pad), NEG_INF, jnp.int32)
    scores0 = jnp.full((1, nb_pad), NEG_INF, jnp.int32)
    cbnd0 = jnp.zeros((U_pad, nb_pad), jnp.int32)
    counts0 = jnp.zeros((1, nb_pad), jnp.int32)

    (scores, counts, _, _), cps = jax.lax.scan(
        group_fwd, (scores0, counts0, bnd0, cbnd0),
        jnp.arange(ngroups, dtype=jnp.int32),
    )

    # ---- pass 2: per group (descending): arrows re-fill + batched walk
    def walk_body(carry, idx):
        i, j = carry
        g = ngroups - 1 - idx
        i, j, ops_g, ng = group_walk(i, j, cps[g], g)
        return (i, j), (ops_g, ng)

    i0 = jnp.asarray(lens1, jnp.int32)
    j0v = jnp.asarray(lens2, jnp.int32)
    (_, _), (ops_stack, ng_stack) = jax.lax.scan(
        walk_body, (i0, j0v), jnp.arange(ngroups, dtype=jnp.int32)
    )
    counts_out = (
        counts[0, :nb].astype(jnp.uint32) if with_counts else None
    )
    if host_stitch:
        o = ops_stack.astype(jnp.uint8)  # (ngroups, cap, nb); cap % 4 == 0
        ops4g = (
            (o[:, 0::4] & 3)
            | ((o[:, 1::4] & 3) << 2)
            | ((o[:, 2::4] & 3) << 4)
            | ((o[:, 3::4] & 3) << 6)
        )
        return scores[0, :nb], counts_out, ops4g, ng_stack
    ops4, total = device_stitch_pack(ops_stack, ng_stack, A + Bs, cap, nb)
    return scores[0, :nb], counts_out, ops4, total


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_pairs", "band_rows", "chunk", "unroll",
        "group_bands", "with_counts",
    ),
)
def _banded_walk_runs_device(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool,
    block_pairs: int,
    band_rows: int,
    chunk: int,
    unroll: int,
    group_bands: int,
    with_counts: bool,
):
    """Run-skip engine (device part): same checkpoint pass 1 as
    :func:`_banded_walk_device`, but pass 2 re-fills RUN BYTES
    (fill_pallas_banded ``with_runs``) and walks whole runs per gather
    (:func:`_make_runs_walk_loop`).  Returns (scores int32[nb], counts,
    recs int8[ngroups, cap_rec, nb], max_its int32[ngroups]) — ``recs``
    is the run-length-encoded op stream, expanded host-side
    (:func:`traceback_banded_finalize`, engine="runs"); ``max_its``
    flags record-cap overflow (fall back to the per-cell engine)."""
    import math

    nb, A = tops.shape
    _, Bs = sides.shape
    BT = block_pairs
    N = Bs + 1
    S = group_bands
    RUNS_UNROLL = 16  # multiple of the byte pack period (4) and 8
    # chunk quantum: pass 1 needs lcm(unroll, 8); the byte-packed
    # refill needs lcm(RUNS_UNROLL, 4) — align to both
    q1 = unroll * 8 // math.gcd(unroll, 8)
    q = q1 * 16 // math.gcd(q1, 16)
    chunk = -(-chunk // q) * q
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, unroll
    )
    ngroups = -(-nbands // S)
    nbands = ngroups * S
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )

    if with_counts:
        score_call = build_arrows_call(
            RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret,
            with_counts=True, with_words=False,
        )
    else:
        score_call = build_scores_call(
            RB, C, off, lag0, unroll, T_pad, U_pad, nb_pad, BT, interpret
        )
    runs_call = build_arrows_call(
        RB, C, off, lag0, RUNS_UNROLL, T_pad, U_pad, nb_pad, BT, interpret,
        with_counts=False, pack_bits=8, with_runs=True,
    )
    group_fwd, _, _ = _make_group_fns(
        score_call, runs_call, tops_sh, sides_sh, lens,
        m, k, d, A, S, RB, T_pad, nb, nb_pad, with_counts,
    )
    cap_rec = _runs_record_cap(A, S, RB)
    walk_loop = _make_runs_walk_loop(S, RB, T_pad, nb, nb_pad, A, cap_rec)

    # ---- pass 1: identical checkpoint sweep
    bnd0 = jnp.full((U_pad, nb_pad), NEG_INF, jnp.int32)
    scores0 = jnp.full((1, nb_pad), NEG_INF, jnp.int32)
    cbnd0 = jnp.zeros((U_pad, nb_pad), jnp.int32)
    counts0 = jnp.zeros((1, nb_pad), jnp.int32)
    (scores, counts, _, _), cps = jax.lax.scan(
        group_fwd, (scores0, counts0, bnd0, cbnd0),
        jnp.arange(ngroups, dtype=jnp.int32),
    )

    # ---- pass 2: run-byte re-fill + run-skip walk, groups descending
    def group_walk(i, j, cp, g):
        def band_refill(bnd2, rr):
            s = _band_scalars(m, k, d, g * S + rr, RB, lens, nb)
            words, _, bnd2 = runs_call(
                s, tops_sh, sides_sh, lens, bnd2, bnd2
            )
            return bnd2, words[0]

        _, words = jax.lax.scan(
            band_refill, cp, jnp.arange(S, dtype=jnp.int32)
        )  # (S, T_pad//4, RB, nb_pad)
        recs0 = jnp.full((cap_rec, nb), OP_NONE, jnp.int8)
        return walk_loop(i, j, words, g, recs0)

    def walk_body(carry, idx):
        i, j = carry
        g = ngroups - 1 - idx
        i, j, recs, max_it = group_walk(i, j, cps[g], g)
        return (i, j), (recs, max_it)

    i0 = jnp.asarray(lens1, jnp.int32)
    j0v = jnp.asarray(lens2, jnp.int32)
    (_, _), (recs, max_its) = jax.lax.scan(
        walk_body, (i0, j0v), jnp.arange(ngroups, dtype=jnp.int32)
    )
    counts_out = (
        counts[0, :nb].astype(jnp.uint32) if with_counts else None
    )
    return scores[0, :nb], counts_out, recs, max_its


class RunsRecordOverflow(Exception):
    """A walk group produced more run records than the static cap —
    the caller must redo the batch with the per-cell engine."""


def _finalize_runs(out, with_counts: bool, s_total: int = None):
    """Host half of the run-skip engine: expand the run-length-encoded
    record stream into the op-string format of
    :func:`traceback_banded_finalize`.

    Each record byte is ``run << 2 | code`` in walk (corner -> origin)
    order with groups already ordered; a pair's records within a group
    form a prefix terminated by OP_NONE codes.  One ``np.repeat`` per
    pair expands runs to ops.
    """
    scores, counts, recs, max_its = jax.device_get(out)
    recs = np.asarray(recs).astype(np.uint8)  # (ngroups, cap_rec, nb)
    max_its = np.asarray(max_its)
    cap_rec = recs.shape[1]
    if (max_its > cap_rec).any():
        raise RunsRecordOverflow(
            f"run records exceeded cap {cap_rec} "
            f"(max {int(max_its.max())})"
        )
    ngroups, _, nb = recs.shape
    flat = recs.reshape(ngroups * cap_rec, nb)
    codes = flat & 3
    valid = codes != OP_NONE
    K = np.where(
        codes == OP_UP, 1, np.maximum(flat.astype(np.int64) >> 2, 1)
    )
    K = np.where(valid, K, 0)
    n = K.sum(axis=0).astype(np.int32)
    if s_total is None:  # callers that concatenate pass a fixed width
        s_total = max(int(n.max(initial=1)), 1)
    ops = np.full((nb, s_total), OP_NONE, np.int8)
    for b in range(nb):
        vb = valid[:, b]
        seq = np.repeat(codes[vb, b].astype(np.int8), K[vb, b])
        ops[b, : seq.shape[0]] = seq
    if with_counts:
        return np.asarray(scores), np.asarray(counts), ops, n
    return np.asarray(scores), ops, n


def device_stitch_pack(ops_stack, ng_stack, s_total, cap, nb):
    """Device-side stitch (VERDICT r2 item 4): per-group op prefixes
    concatenate into per-pair op strings ON DEVICE (the host numpy
    stitch loop + the multi-MB ops4 transfer were half the e2e time).

    ``out[p, b] = ops_stack[g, p - starts[g], b]`` for the group g
    whose cursor interval contains p — found by an ngroups-step
    accumulation (ngroups is small), then one flat gather.  Returns
    (ops4 uint8[ceil(L/4), nb] 2-bit packed — 4x less host-link
    transfer — and total int32[nb]); unpack with :func:`unpack_ops4`.
    Shared by the NW, SW, and Gotoh banded walk engines.
    """
    ngroups = ops_stack.shape[0]
    L = s_total if s_total > 0 else 1
    b_ar = jnp.arange(nb, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1, nb), jnp.int32), jnp.cumsum(ng_stack, axis=0)], axis=0
    )  # (ngroups+1, nb)
    total = starts[ngroups]
    p_col = jnp.arange(L, dtype=jnp.int32)[:, None]  # (L, 1)

    def acc(gi, carry):
        g_of, start_of = carry
        sg = jax.lax.dynamic_slice_in_dim(starts, gi + 1, 1, axis=0)
        adv = p_col >= sg
        return (
            jnp.where(adv, gi + 1, g_of),
            jnp.where(adv, sg, start_of),
        )

    g_of, start_of = jax.lax.fori_loop(
        0, ngroups - 1, acc,
        (jnp.zeros((L, nb), jnp.int32), jnp.zeros((L, nb), jnp.int32)),
    )
    local = jnp.clip(p_col - start_of, 0, cap - 1)
    lin = (g_of * cap + local) * nb + b_ar[None, :]
    vals = jnp.take(ops_stack.reshape(-1), lin.reshape(-1)).reshape(L, nb)
    ops = jnp.where(p_col < total[None, :], vals, OP_NONE)
    L4 = -(-L // 4)
    o = jnp.pad(ops, ((0, L4 * 4 - L), (0, 0)), constant_values=3).astype(
        jnp.uint8
    )
    ops4 = (
        (o[0::4] & 3)
        | ((o[1::4] & 3) << 2)
        | ((o[2::4] & 3) << 4)
        | ((o[3::4] & 3) << 6)
    )
    return ops4, total


def unpack_ops4(ops4, s_total):
    """Host: (L4, nb) packed 2-bit ops -> (nb, s_total) int8 op codes."""
    ops4 = np.asarray(ops4)
    L4, nbp = ops4.shape
    ops = np.empty((L4 * 4, nbp), np.int8)
    for r in range(4):
        ops[r::4] = (ops4 >> (2 * r)) & 3
    return np.ascontiguousarray(ops[: max(s_total, 1)].T)


@functools.partial(
    jax.jit,
    static_argnames=(
        "interpret", "block_pairs", "band_rows", "chunk", "group_bands",
        "with_counts", "host_stitch",
    ),
)
def _banded_walk_onepass_device(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool,
    block_pairs: int,
    band_rows: int,
    chunk: int,
    group_bands: int,
    with_counts: bool,
    host_stitch: bool = False,
):
    """One-pass engine: a single fused band sweep emits score
    (+counts) AND the full-table 2-bit walk words; the walk runs over
    the materialized word stack — no checkpoint pass, no re-fill.

    At 2 bits/cell a 128 x 10kb batch's whole word stack is ~3.4 GB:
    within the single-chip HBM budget that the two-pass engine's
    "never materialize arrows" rule was designed around (that rule
    still governs beyond the budget — see traceback_banded_dispatch).
    Same outputs as :func:`_banded_walk_device`.
    """
    nb, A = tops.shape
    _, Bs = sides.shape
    BT = block_pairs
    N = Bs + 1
    S = group_bands
    UN = 16  # fused-kernel unroll = the 2-bit pack period
    chunk = -(-chunk // 16) * 16
    RB, nbands, C, T_pad, lag0, off, U_pad = _geometry(
        A, N, band_rows, chunk, UN
    )
    ngroups = -(-nbands // S)
    nbands = ngroups * S
    N_pad = nbands * RB
    tops_sh, sides_sh, lens, nb_pad = _prep_banded(
        tops, sides, lens1, lens2, BT, T_pad, N_pad
    )
    fused_call = build_arrows_call(
        RB, C, off, lag0, UN, T_pad, U_pad, nb_pad, BT, interpret,
        with_counts=with_counts, with_words=True, pack_bits=2,
    )

    bnd0 = jnp.full((U_pad, nb_pad), NEG_INF, jnp.int32)
    scores0 = jnp.full((1, nb_pad), NEG_INF, jnp.int32)
    cbnd0 = jnp.zeros((U_pad, nb_pad), jnp.int32)
    counts0 = jnp.zeros((1, nb_pad), jnp.int32)

    def band_body(carry, r):
        s = _band_scalars(m, k, d, r, RB, lens, nb)
        if with_counts:
            scores, counts, bnd, cbnd = carry
            words, part, bnd, cpart, cbnd = fused_call(
                s, tops_sh, sides_sh, lens, bnd, bnd, cbnd, cbnd
            )
            return (
                jnp.maximum(scores, part), counts + cpart, bnd, cbnd
            ), words[0]
        scores, bnd = carry
        words, part, bnd = fused_call(s, tops_sh, sides_sh, lens, bnd, bnd)
        return (jnp.maximum(scores, part), bnd), words[0]

    init = (
        (scores0, counts0, bnd0, cbnd0) if with_counts else (scores0, bnd0)
    )
    carry, w_all = jax.lax.scan(
        band_body, init, jnp.arange(nbands, dtype=jnp.int32)
    )  # w_all: (nbands, T_pad//16, RB, nb_pad)
    scores = carry[0]
    counts_out = (
        carry[1][0, :nb].astype(jnp.uint32) if with_counts else None
    )

    WU = 16
    cap = -(-(A + S * RB + 1) // WU) * WU
    walk_loop = _make_walk_loop(
        S, RB, T_pad, nb, nb_pad, cap, global_bands=True
    )

    def walk_body(carry2, idx):
        i, j = carry2
        g = ngroups - 1 - idx
        i, j, ops_g, ng = walk_loop(i, j, w_all, g)
        return (i, j), (ops_g, ng)

    i0 = jnp.asarray(lens1, jnp.int32)
    j0v = jnp.asarray(lens2, jnp.int32)
    (_, _), (ops_stack, ng_stack) = jax.lax.scan(
        walk_body, (i0, j0v), jnp.arange(ngroups, dtype=jnp.int32)
    )
    if host_stitch:
        o = ops_stack.astype(jnp.uint8)
        ops4g = (
            (o[:, 0::4] & 3)
            | ((o[:, 1::4] & 3) << 2)
            | ((o[:, 2::4] & 3) << 4)
            | ((o[:, 3::4] & 3) << 6)
        )
        return scores[0, :nb], counts_out, ops4g, ng_stack
    ops4, total = device_stitch_pack(ops_stack, ng_stack, A + Bs, cap, nb)
    return scores[0, :nb], counts_out, ops4, total


def _onepass_word_bytes(A, Bs, band_rows, group_bands):
    """HBM bytes of the full-table 2-bit word stack the one-pass engine
    materializes (whole groups of band planes)."""
    RB = min(band_rows, _round_up(Bs + 1, 8))
    nbands = -(-(Bs + 1) // RB)
    nbands = -(-nbands // group_bands) * group_bands
    T16 = _round_up(A + RB, 16) // 16
    return nbands * T16 * RB * 4 * 128  # production sub-batch = 128 lanes


def _onepass_word_bytes_nb(A, Bs, band_rows, group_bands, nb):
    """Like :func:`_onepass_word_bytes` with the actual lane count."""
    return (
        _onepass_word_bytes(A, Bs, band_rows, group_bands)
        * max(_round_up(max(nb, 1), 128), 128) // 128
    )


def onepass_auto(
    A, Bs, band_rows, group_bands, nb, interpret, bits: int = 2
) -> bool:
    """True when a full-table walk-word stack (``bits`` per cell) fits
    the one-pass HBM budget (``NW_TPU_ONEPASS_HBM``, default 6 GB on
    compiled paths, opt-in under interpret) — shared by the NW
    dispatch and the variant traceback engines."""
    import os

    env = os.environ.get("NW_TPU_ONEPASS_HBM")
    budget = int(env) if env is not None else (0 if interpret else 6 << 30)
    return (
        _onepass_word_bytes_nb(A, Bs, band_rows, group_bands, nb)
        * (bits // 2)
        <= budget
    )


def _auto_group_bands(A: int, band_rows: int) -> int:
    """Walk-group height: 16 bands per group measured ~3% faster than 8
    at 10 kb (fewer sequential walk stages), but the band count pads to
    whole groups — at ~2 kb (22 bands) 16 would pad 45%.  Use 16 only
    when the pad cost is negligible."""
    nbands = -(-(A + 1) // band_rows)
    return 16 if nbands >= 48 else 8


def default_walk_engine() -> str:
    """Walk-engine choice (``NW_TPU_WALK_ENGINE`` overrides):

    * ``auto`` (default): the one-pass fused engine when the word
      stack fits the HBM budget (compiled path), else two-pass.
    * ``twopass``: pin the checkpointed re-fill engine.
    * ``onepass``: pin the fused engine (test use; budget ignored).
    * ``hoststitch``: two-pass shape with per-group 2-bit records
      stitched on host — measured SLOWER here (452 vs 490; the device
      stitch is cheaper than +2-4 MB/sub-batch through this host
      link) but the right trade for PCIe-attached hosts.
    * ``runs``: run-skip walk — a measured negative on v5e (gathers
      are only ~4 us so the per-cell walk is ~15% of the program,
      while byte-granularity word emission costs the re-fill 2.3x the
      2-bit mode); maintained bit-exact for gather-latency-dominated
      topologies.  Decompositions in PERF.md."""
    import os

    return os.environ.get("NW_TPU_WALK_ENGINE", "auto")


def traceback_banded_dispatch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    band_rows: int = None,
    chunk: int = 192,
    unroll: int = DEFAULT_UNROLL,
    group_bands: int = None,
    with_counts: bool = False,
    engine: str = None,
):
    """Enqueue one sub-batch's walk on device WITHOUT fetching.

    JAX dispatch is asynchronous: callers that split a large batch into
    sub-batches dispatch them all first and then finalize in order, so
    the host-side unpack/strings work of sub-batch i overlaps the
    device compute of sub-batch i+1 (VERDICT r2 item 4's overlap).

    Engine choice: compiled batches whose full-table 2-bit word stack
    fits the ``NW_TPU_ONEPASS_HBM`` byte budget (default 6 GB; two
    sub-batches ride in flight under the dispatch pipeline, so the
    budget stays under half the 16 GB v5e HBM) take the one-pass
    engine: ONE fused sweep emits score (+counts) AND the walk words —
    no re-fill pass.  Round-4 measurement at config 3 (256 x 10kb,
    counts): 576 pairs/s e2e vs 490 two-pass, once the walk gathers
    from the word stack in place (dynamic-slicing a group out of the
    multi-GB stack materializes a ~0.5 GB tiled-layout copy per group
    — the very trap fixed in the walk loops).  XLA takes ~300 s to
    compile the multi-GB-output band scan the first time (persistent
    compile cache amortizes it); interpret mode therefore keeps the
    engine opt-in via the env var so CPU test/dryrun coverage of the
    two-pass default stays deliberate.
    """
    nb, A = tops.shape
    # one-pass route defaults to RB = 64: the fused score+counts+words
    # kernel carries 6 rolling (RB, BT) buffers, and 64 rows (8 vregs
    # each) keeps them inside the vector register file (~3% measured);
    # the two-pass kernels keep the 96-row sweet spot
    rb_two = 96 if band_rows is None else band_rows
    rb_one = 64 if band_rows is None else band_rows
    if group_bands is None:
        group_bands = _auto_group_bands(A, rb_two)
    _, Bs = sides.shape
    if engine is None:
        engine = default_walk_engine()
    if engine == "runs":
        return _banded_walk_runs_device(
            tops, sides, lens1, lens2, m, k, d,
            interpret=interpret, block_pairs=block_pairs,
            band_rows=rb_two, chunk=chunk, unroll=unroll,
            group_bands=group_bands, with_counts=with_counts,
        )
    host_stitch = engine == "hoststitch"
    if engine == "onepass" or (
        engine == "auto"
        and onepass_auto(A, Bs, rb_one, group_bands, nb, interpret)
    ):
        return _banded_walk_onepass_device(
            tops, sides, lens1, lens2, m, k, d,
            interpret=interpret, block_pairs=block_pairs,
            band_rows=rb_one, chunk=chunk, group_bands=group_bands,
            with_counts=with_counts, host_stitch=host_stitch,
        )
    return _banded_walk_device(
        tops, sides, lens1, lens2, m, k, d,
        interpret=interpret, block_pairs=block_pairs, band_rows=rb_two,
        chunk=chunk, unroll=unroll, group_bands=group_bands,
        with_counts=with_counts, host_stitch=host_stitch,
    )


def traceback_banded_finalize(
    out, A, Bs, with_counts: bool = False, engine: str = None,
    lens2=None,
):
    """Fetch + unpack one dispatched sub-batch's results.

    ``engine`` must match the dispatch's.  The run-skip engine raises
    :class:`RunsRecordOverflow` when a group's record stream overran
    its static cap — redo the batch with ``engine="twopass"``
    (``lens2`` is accepted for signature stability; unused)."""
    if engine is None:
        engine = default_walk_engine()
    if engine == "runs":
        return _finalize_runs(out, with_counts, s_total=A + Bs)
    if engine == "hoststitch":
        scores, counts, ops4g, ng_stack = jax.device_get(out)
        ops4g = np.asarray(ops4g)  # (ngroups, cap//4, nb)
        ngroups, cap4, nb = ops4g.shape
        ops_stack = np.empty((ngroups, cap4 * 4, nb), np.int8)
        for r in range(4):
            ops_stack[:, r::4] = (ops4g >> (2 * r)) & 3
        ops, total = _compact_group_ops(ops_stack, ng_stack, A + Bs)
        if with_counts:
            return np.asarray(scores), np.asarray(counts), ops, total
        return np.asarray(scores), ops, total
    scores, counts, ops4, n = jax.device_get(out)
    ops = unpack_ops4(ops4, A + Bs)  # already stitched on device
    n = np.asarray(n, np.int32)
    if with_counts:
        return np.asarray(scores), np.asarray(counts), ops, n
    return np.asarray(scores), ops, n


def traceback_banded_batch(
    tops, sides, lens1, lens2, m, k, d,
    interpret: bool = False,
    block_pairs: int = LANES,
    band_rows: int = None,
    chunk: int = 192,
    unroll: int = DEFAULT_UNROLL,
    group_bands: int = None,
    with_counts: bool = False,
    engine: str = None,
):
    """Exact greedy traceback of a batch at any side length.

    Returns (scores int32[B], ops int8[B, S_total], n int32[B]) — or
    (scores, counts uint32[B], ops, n) with ``with_counts`` — with the
    same op-code semantics as :func:`nw_tpu.ops.traceback.traceback_greedy`
    (corner -> origin, diag > left > up priority — the reference's
    first-emitted alignment).
    """
    nb, A = tops.shape
    _, Bs = sides.shape
    if engine is None:
        engine = default_walk_engine()
    if nb == 0:
        empty = (
            np.zeros((0,), np.int32),
            np.zeros((0, 1), np.int8),
            np.zeros((0,), np.int32),
        )
        return empty[:1] + (np.zeros((0,), np.uint32),) + empty[1:] \
            if with_counts else empty
    out = traceback_banded_dispatch(
        tops, sides, lens1, lens2, m, k, d,
        interpret=interpret, block_pairs=block_pairs, band_rows=band_rows,
        chunk=chunk, unroll=unroll, group_bands=group_bands,
        with_counts=with_counts, engine=engine,
    )
    try:
        return traceback_banded_finalize(
            out, A, Bs, with_counts, engine=engine
        )
    except RunsRecordOverflow:
        # gap-dense path overran the run-record cap: redo with the
        # per-cell walk (exactness first; the cap covers every
        # mean-run >= 6 path so this is the rare tail)
        return traceback_banded_batch(
            tops, sides, lens1, lens2, m, k, d,
            interpret=interpret, block_pairs=block_pairs,
            band_rows=band_rows, chunk=chunk, unroll=unroll,
            group_bands=group_bands, with_counts=with_counts,
            engine="twopass",
        )


def _compact_group_ops(ops_stack, ng_stack, s_total):
    """Stitch per-group op prefixes into per-pair op strings.

    ops_stack: int8[ngroups, cap, nb] in walk order; within each group a
    pair's real ops occupy loop-counter positions [0, ng).
    """
    ops_stack = np.asarray(ops_stack)
    ng = np.asarray(ng_stack)
    ngroups, cap, nb = ops_stack.shape
    out = np.full((nb, max(s_total, 1)), OP_NONE, np.int8)
    cursor = np.zeros(nb, np.int64)
    steps = np.arange(cap)
    rows = np.broadcast_to(np.arange(nb)[None, :], (cap, nb))
    for gi in range(ngroups):
        n = ng[gi]
        if not n.any():
            continue
        mask = steps[:, None] < n[None, :]
        pos = cursor[None, :] + steps[:, None]
        out[rows[mask], pos[mask]] = ops_stack[gi][mask]
        cursor += n
    return out, cursor.astype(np.int32)
