"""Cross-device huge-pair mode: one DP matrix tiled over a device mesh.

BASELINE config 5: pairs too large for one device's HBM (or one host's
patience) — the matrix's *rows* are sharded over the ``seq`` mesh axis
and the fill runs as a **2-D block wavefront** over (device-row x
diagonal-chunk) tiles:

* device ``p`` owns rows ``[p*H, (p+1)*H)``;
* the sweep is pipelined with a skew: at phase ``s``, device ``p``
  processes diagonal chunk ``c = s - p`` (``C`` diagonals).  Once the
  pipeline fills, every device computes a different chunk concurrently —
  the reference's condvar handoff (needleman-wunsch.c:444-475) becomes
  ONE ``ppermute`` of ``C`` boundary values per phase, not one element
  per diagonal (the latency wall of parallel/wavefront.py r1);
* the halo is the owner's **last-row values by diagonal** — decisions
  (arrow bits) are recomputed locally from exchanged *values*, so tie
  flags are deterministic across tile boundaries (SURVEY §7 hard part);
* each device stores its own rows' arrows diagonal-major in local HBM
  ("tiled HBM arrow storage": a 100 kb pair is ~20 GB of arrows total,
  ~2.5 GB per device on an 8-device mesh);
* the exact greedy traceback (reference first-emission order) runs as a
  **segment relay**: the device owning the walk head walks through its
  rows in a local loop (no collectives), then the head state moves down
  the mesh with one ``psum`` per device crossing; segments are stitched
  on the host.

The per-chunk compute is the same natural-boundary anti-diagonal
recurrence as the Pallas kernels (fill_pallas.py docstring), expressed
in plain ``lax.scan`` vector ops so the same program runs on CPU test
meshes and TPU meshes.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nw_tpu.ops.fill_scan import NEG_INF
from nw_tpu.ops.traceback import OP_DIAG, OP_LEFT, OP_NONE, OP_UP

LANES = 128

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_fold_chunk_kernel(R: int, C: int, traceback: bool):
    """One device's C-diagonal chunk of the tiled fill, fold layout.

    The device's H = R*128 rows fold as ``j_local = r*128 + lane``; per
    step the halo (parent last-row value) and the entering top char are
    SMEM scalars, so the hot loop is pure (R, 128) vector ops with the
    same carried-pre-shifted-prev2 economy as the batch kernels (the
    halo injected into prev's shift one step earlier IS next step's
    diagonal dependency).

    Refs:
      s_ref:    SMEM (1, 8) int32 — m, k, d, base (c*C), k_corner,
                corner_jl (local fold index of the corner row, -1 if
                not owned), seed flag (device 0), unused
      ts_ref:   SMEM (1, C) int32 — top char entering at local row 0
                per step
      inj_ref:  SMEM (1, C) int32 — parent halo per step
      side_ref: VMEM (R, 128) int32 — folded side chars
      prev/prev2sh/ch (in), cap_ref (SMEM (1,1)): carried state
      outs: prev/prev2sh/ch (out), emit SMEM (1, C) — last-row stream,
            cap out, [words VMEM (C//4, R, 128) packed arrows]
      pack_ref: VMEM (R, 128) scratch (arrow word accumulator)
    """

    def kernel(*refs):
        it = iter(refs)
        s_ref = next(it)
        ts_ref = next(it)
        inj_ref = next(it)
        side_ref = next(it)
        prev_in = next(it)
        prev2sh_in = next(it)
        ch_in = next(it)
        cap_in = next(it)
        prev_out = next(it)
        prev2sh_out = next(it)
        ch_out = next(it)
        cap_out = next(it)
        emit_ref = next(it)
        words_ref = next(it) if traceback else None
        pack_ref = next(it) if traceback else None

        m = s_ref[0, 0]
        kmis = s_ref[0, 1]
        d = s_ref[0, 2]
        base = s_ref[0, 3]
        k_corner = s_ref[0, 4]
        corner_jl = s_ref[0, 5]
        seed = s_ref[0, 6]

        r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        at0 = (r_iota == 0) & (l_iota == 0)

        def shift_local(x, fill):
            # sh[j] = x[j-1] in the fold layout; sh[0] = fill (scalar)
            y = pltpu.roll(x, 1, axis=1)
            if R > 1:
                y_down = jnp.concatenate([y[-1:, :], y[:-1, :]], axis=0)
                z = jnp.where(l_iota == 0, y_down, y)
            else:
                z = y  # single row: lane 0 is always the fill position
            return jnp.where(at0, fill, z)

        prev_out[...] = prev_in[...]
        prev2sh_out[...] = prev2sh_in[...]
        ch_out[...] = ch_in[...]
        cap_out[0, 0] = cap_in[0, 0]

        side_ch = side_ref[...]

        def step(t, _):
            kk = base + t
            prev = prev_out[...]

            ch = shift_local(ch_out[...], ts_ref[0, t])
            ch_out[...] = ch
            sub = jnp.where(ch == side_ch, m, -kmis)

            prev_sh = shift_local(prev, inj_ref[0, t])
            cand_d = prev2sh_out[...] + sub
            score = jnp.maximum(cand_d, jnp.maximum(prev_sh, prev) - d)

            # diagonal 0: the DP seed emerges at device 0's cell (0,0)
            @pl.when((kk == 0) & (seed == 1))
            def _():
                prev_out[...] = jnp.where(at0, jnp.int32(0), score)

            @pl.when((kk != 0) | (seed != 1))
            def _():
                prev_out[...] = score

            prev2sh_out[...] = prev_sh

            if traceback:
                score_d = score + d
                arrows = (
                    (cand_d == score).astype(jnp.int32)
                    + (prev == score_d).astype(jnp.int32) * 2
                    + (prev_sh == score_d).astype(jnp.int32) * 4
                )
                r4 = jnp.bitwise_and(t, 3)
                word = arrows << (r4 * 8)

                @pl.when(r4 == 0)
                def _():
                    pack_ref[...] = word

                @pl.when(r4 != 0)
                def _():
                    pack_ref[...] = pack_ref[...] | word

                @pl.when(r4 == 3)
                def _():
                    words_ref[pl.ds(t // 4, 1), :, :] = pack_ref[...][None]

            emit_ref[0, t] = prev_out[R - 1, LANES - 1]

            @pl.when((kk == k_corner) & (corner_jl >= 0))
            def _():
                hit = (r_iota == corner_jl // LANES) & (
                    l_iota == corner_jl % LANES
                )
                cap_out[0, 0] = jnp.sum(
                    jnp.where(hit, prev_out[...], 0)
                )

            return 0

        jax.lax.fori_loop(0, C, step, 0)

    return kernel


def _build_fold_chunk_call(R: int, C: int, traceback: bool, interpret: bool):
    out_shapes = [
        jax.ShapeDtypeStruct((R, LANES), jnp.int32),  # prev
        jax.ShapeDtypeStruct((R, LANES), jnp.int32),  # prev2sh
        jax.ShapeDtypeStruct((R, LANES), jnp.int32),  # ch
        jax.ShapeDtypeStruct((1, 1), jnp.int32),      # cap
        jax.ShapeDtypeStruct((1, C), jnp.int32),      # emits
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    scratch = []
    if traceback:
        out_shapes.append(
            jax.ShapeDtypeStruct((C // 4, R, LANES), jnp.int32)
        )
        out_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        scratch.append(pltpu.VMEM((R, LANES), jnp.int32))
    return pl.pallas_call(
        _make_fold_chunk_kernel(R, C, traceback),
        out_shape=tuple(out_shapes),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # s
            pl.BlockSpec(memory_space=pltpu.SMEM),   # ts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # inj
            pl.BlockSpec(memory_space=pltpu.VMEM),   # side fold
            pl.BlockSpec(memory_space=pltpu.VMEM),   # prev
            pl.BlockSpec(memory_space=pltpu.VMEM),   # prev2sh
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ch
            pl.BlockSpec(memory_space=pltpu.SMEM),   # cap
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        input_output_aliases={4: 0, 5: 1, 6: 2},
        interpret=interpret,
    )


def _tile_geometry(A, B, nseq, C, engine):
    """(N_pad, H, R, nch, nphases) for the 2-D block-wavefront tiling."""
    row_quantum = nseq * LANES if engine == "pallas" else nseq
    N_pad = _round_up(B + 1, row_quantum)
    H = N_pad // nseq
    R = H // LANES if engine == "pallas" else 0
    K_pad = _round_up(A + N_pad, C)
    nch = K_pad // C
    return N_pad, H, R, nch, nch + nseq - 1


def _tile_inputs(top, side, N_pad):
    """(side_sh, top_ext): sentinel-framed global inputs of the tiling."""
    B = side.shape[0]
    side_sh = jnp.concatenate(
        [
            jnp.full((1,), -3, jnp.int32),
            side.astype(jnp.int32),
            jnp.full((N_pad - B - 1,), -5, jnp.int32),
        ]
    )
    top_rev = top[::-1].astype(jnp.int32)
    pad = jnp.full((N_pad,), -4, jnp.int32)
    top_ext = jnp.concatenate([pad, top_rev, pad])
    return side_sh, top_ext


def _make_pallas_phase(
    p, side_fold, top_ext, fold_call, m, k, d, C, nch, A, B, H, N_pad,
    axis, perm_down, corner_jl, seed,
):
    """Pallas-engine phase body (fold-chunk kernel per phase); shared by
    the monolithic fill and the span-wise resumable fill."""

    def phase(st, s):
        c = s - p
        active = (c >= 0) & (c < nch)
        cc = jnp.clip(c, 0, nch - 1)
        base = cc * C

        inj = jnp.concatenate([st["tail"][None], st["recv"][:-1]])
        inj = jnp.where(p == 0, NEG_INF, inj)
        # top char entering local row 0 at step t: index decreases with
        # t, so slice once and reverse
        ts = jax.lax.dynamic_slice(
            top_ext, (N_pad + A - base - (C - 1) + p * H,), (C,)
        )[::-1]

        sv = jnp.stack(
            [
                jnp.int32(m), jnp.int32(k), jnp.int32(d), base,
                jnp.int32(A + B), corner_jl, seed, jnp.int32(0),
            ]
        )[None]
        outs = fold_call(
            sv, ts[None], inj[None], side_fold,
            st["prev"], st["prev2sh"], st["ch"], st["cap"],
        )
        prev_n, prev2sh_n, ch_n, cap_n, emits_n = outs[:5]
        emits = emits_n[0]

        def keep(new, old):
            return jnp.where(active, new, old)

        new_st = dict(
            prev=keep(prev_n, st["prev"]),
            prev2sh=keep(prev2sh_n, st["prev2sh"]),
            ch=keep(ch_n, st["ch"]),
            cap=keep(cap_n, st["cap"]),
            recv=jax.lax.ppermute(
                jnp.where(active, emits, NEG_INF), axis, perm_down
            ),
            tail=keep(st["recv"][-1], st["tail"]),
        )
        return new_st, (outs[5] if len(outs) > 5 else None)

    return phase


def _make_scan_phase(
    p, jg, side_local, top_ext, m, k, d, C, nch, A, B, H, N_pad,
    axis, perm_down, traceback,
):
    """Scan-engine phase body (pure lax.scan recurrence); shared by the
    monolithic fill and the span-wise resumable fill."""

    def phase(st, s):
        c = s - p
        active = (c >= 0) & (c < nch)
        cc = jnp.clip(c, 0, nch - 1)

        # parent's last-row values for diags [c*C - 1, c*C + C - 1)
        inj = jnp.concatenate([st["tail"][None], st["recv"][:-1]])
        inj = jnp.where(p == 0, NEG_INF, inj)

        def step(carry, t):
            prev, prev2, hprev, cap = carry
            kk = cc * C + t
            halo = inj[t]
            prev_sh = jnp.concatenate([halo[None], prev[:-1]])
            prev2_sh = jnp.concatenate([hprev[None], prev2[:-1]])
            ch_top = jax.lax.dynamic_slice(
                top_ext, (N_pad + A - kk + p * H,), (H,)
            )
            sub = jnp.where(ch_top == side_local, m, -k)
            cand_d = prev2_sh + sub
            score = jnp.maximum(
                cand_d, jnp.maximum(prev_sh, prev) - d
            )
            # diagonal 0 is the DP seed, not a recurrence result
            score = jnp.where(
                kk == 0, jnp.where(jg == 0, jnp.int32(0), NEG_INF), score
            )
            score_d = score + d
            arrows = (
                (cand_d == score).astype(jnp.uint8)
                | ((prev == score_d).astype(jnp.uint8) << 1)
                | ((prev_sh == score_d).astype(jnp.uint8) << 2)
            )
            hit = (kk == A + B) & (jg == B)
            cap = jnp.where(
                jnp.any(hit), jnp.where(hit, score, NEG_INF).max(), cap
            )
            emit = score[-1]
            return (score, prev, halo, cap), (emit, arrows)

        (prev, prev2, hprev, cap), (emits, arr) = jax.lax.scan(
            step,
            (st["prev"], st["prev2"], st["hprev"], st["cap"]),
            jnp.arange(C, dtype=jnp.int32),
        )

        # inactive phases must not advance state
        def keep(new, old):
            return jnp.where(active, new, old)

        new_st = dict(
            prev=keep(prev, st["prev"]),
            prev2=keep(prev2, st["prev2"]),
            hprev=keep(hprev, st["hprev"]),
            cap=keep(cap, st["cap"]),
            # child consumes my emits next phase; send even when
            # inactive (garbage chunks are never marked active there)
            recv=jax.lax.ppermute(
                jnp.where(active, emits, NEG_INF), axis, perm_down
            ),
            tail=keep(st["recv"][-1], st["tail"]),
        )
        arr = jnp.where(active, arr, jnp.uint8(0))
        return new_st, arr if traceback else None

    return phase


def _make_relay_walk(p, axis, A, H, nseq, vary0):
    """Segment-relay exact greedy walk over the tiled arrows: the owner
    of the walk head runs a local loop; one psum per device crossing;
    tiny per-round segments are all_gathered so every process can
    stitch them (real multi-host meshes cannot address remote
    shards)."""
    cap_seg = A + H + 8  # one device's worst-case path segment

    def relay_walk(B, score, arrow_at):
        def seg_round(carry, _):
            i, j = carry
            mine = (j // H == p) & ((i > 0) | (j > 0))

            def cond(stw):
                i2, j2, n2, _ = stw
                return (
                    ((i2 > 0) | (j2 > 0))
                    & (j2 // H == p)
                    & (n2 < cap_seg)
                )

            def body(stw):
                i2, j2, n2, ops = stw
                a = arrow_at(i2, j2)
                take_diag = (a & 1) != 0
                take_left = (~take_diag) & ((a & 2) != 0)
                take_up = ~(take_diag | take_left)
                op = jnp.where(
                    take_diag, OP_DIAG,
                    jnp.where(take_left, OP_LEFT, OP_UP),
                ).astype(jnp.int8)
                ops = ops.at[n2].set(op)
                di = jnp.where(take_diag | take_left, 1, 0)
                dj = jnp.where(take_diag | take_up, 1, 0)
                return (i2 - di, j2 - dj, n2 + 1, ops)

            ops0 = (
                jnp.full((cap_seg,), OP_NONE, jnp.int8)
                + vary0.astype(jnp.int8)
            )
            iw, jw, nw, ops = jax.lax.while_loop(
                cond,
                body,
                (
                    jnp.where(mine, i, 0) + vary0,
                    jnp.where(mine, j, 0) + vary0,
                    jnp.int32(0) + vary0,
                    ops0,
                ),
            )
            # the owner's new head replaces the replicated shared head
            any_mine = jax.lax.psum(mine.astype(jnp.int32), axis) > 0
            i = jnp.where(
                any_mine, jax.lax.psum(jnp.where(mine, iw, 0), axis), i
            )
            j = jnp.where(
                any_mine, jax.lax.psum(jnp.where(mine, jw, 0), axis), j
            )
            return (i, j), (ops, jnp.where(mine, nw, 0))

        _, (segs, seg_ns) = jax.lax.scan(
            seg_round,
            (jnp.int32(A) + vary0, jnp.int32(B) + vary0),
            None,
            length=nseq,
        )
        segs_all = jax.lax.all_gather(segs, axis)  # (ndev, nround, cap)
        ns_all = jax.lax.all_gather(seg_ns, axis)
        return score, segs_all, ns_all

    return relay_walk


def _make_arrow_at_pallas(arr_phases, p, C, R):
    """Cell reader over the pallas engine's packed per-phase arrows
    ((nphases, C//4, R, 128) int32; chunk c sits at phase c + p)."""

    def arrow_at(i2, j2, H):
        jloc = j2 - p * H
        kk = i2 + j2
        c = kk // C
        t = kk - c * C
        # multi-dim index: flattening first materializes a tiled-layout
        # copy of the arrow stack (banded_traceback._make_runs_walk_loop)
        w = arr_phases[c + p, t // 4, jloc // LANES, jloc % LANES]
        return (w >> ((t % 4) * 8)) & 0xFF

    return arrow_at


def _make_arrow_at_scan(arr_phases, p, C, H):
    """Cell reader over the scan engine's per-phase arrows
    ((nphases, C, H) uint8; chunk c sits at phase c + p)."""

    def arrow_at(i2, j2, _H):
        jloc = j2 - p * H
        kk = i2 + j2
        c = kk // C
        return arr_phases[c + p, kk - c * C, jloc]

    return arrow_at


@functools.partial(
    jax.jit,
    static_argnames=(
        "m", "k", "d", "mesh", "axis", "chunk", "traceback", "engine",
        "interpret",
    ),
)
def _huge_pair_device(
    top, side, *, m: int, k: int, d: int, mesh: Mesh, axis: str,
    chunk: int, traceback: bool, engine: str = "scan",
    interpret: bool = False,
):
    A = top.shape[0]
    B = side.shape[0]
    nseq = mesh.shape[axis]
    C = chunk
    if engine == "pallas" and traceback and (C < 4 or C % 4):
        # the fold-chunk kernel packs 4 diagonals per int32 word and
        # stores only at t % 4 == 3: a chunk that isn't 4-aligned would
        # silently drop the last C % 4 diagonals' arrows from every
        # chunk and corrupt the walk
        raise ValueError(f"traceback chunk must be a multiple of 4, got {C}")

    N_pad, H, R, nch, nphases = _tile_geometry(A, B, nseq, C, engine)
    side_sh, top_ext = _tile_inputs(top, side, N_pad)

    perm_down = [(i, (i + 1) % nseq) for i in range(nseq)]  # p -> p+1

    fold_call = (
        _build_fold_chunk_call(R, C, traceback, interpret)
        if engine == "pallas"
        else None
    )

    def local(side_local, top_ext):
        p = jax.lax.axis_index(axis)
        jl = jnp.arange(H, dtype=jnp.int32)
        jg = p * H + jl
        vary0 = side_local.sum() * 0  # shard_map varying-type anchor
        relay_walk = _make_relay_walk(p, axis, A, H, nseq, vary0)

        # diag 0 (the DP seed) is produced by the kk == 0 step override;
        # the registers start one diagonal EARLIER (all out-of-table)
        if engine == "pallas":
            state0 = dict(
                prev=jnp.full((R, LANES), NEG_INF, jnp.int32) + vary0,
                prev2sh=jnp.full((R, LANES), NEG_INF, jnp.int32) + vary0,
                ch=jnp.full((R, LANES), -4, jnp.int32) + vary0,
                cap=jnp.full((1, 1), NEG_INF, jnp.int32) + vary0,
                recv=jnp.full((C,), NEG_INF, jnp.int32) + vary0,
                tail=jnp.int32(NEG_INF) + vary0,
            )
            side_fold = side_local.reshape(R, LANES)
            corner_jl = jnp.where(B // H == p, B - p * H, -1)
            seed = (p == 0).astype(jnp.int32)
            phase = _make_pallas_phase(
                p, side_fold, top_ext, fold_call, m, k, d, C, nch,
                A, B, H, N_pad, axis, perm_down, corner_jl, seed,
            )
            st, arr_phases = jax.lax.scan(
                phase, state0, jnp.arange(nphases, dtype=jnp.int32)
            )
            score = jax.lax.pmax(st["cap"][0, 0], axis)
            if not traceback:
                return score
            arrow_at = _make_arrow_at_pallas(arr_phases, p, C, R)
            return relay_walk(B, score, lambda i2, j2: arrow_at(i2, j2, H))

        state0 = dict(
            prev=jnp.full((H,), NEG_INF, jnp.int32) + vary0,
            prev2=jnp.full((H,), NEG_INF, jnp.int32) + vary0,
            hprev=jnp.int32(NEG_INF) + vary0,  # diag-halo carry (kk-2)
            cap=jnp.int32(NEG_INF) + vary0,
            recv=jnp.full((C,), NEG_INF, jnp.int32) + vary0,
            tail=jnp.int32(NEG_INF) + vary0,  # parent chunk c-1 last diag
        )
        phase = _make_scan_phase(
            p, jg, side_local, top_ext, m, k, d, C, nch, A, B, H, N_pad,
            axis, perm_down, traceback,
        )
        st, arr_phases = jax.lax.scan(
            phase, state0, jnp.arange(nphases, dtype=jnp.int32)
        )
        score = jax.lax.pmax(st["cap"], axis)
        if not traceback:
            return score
        arrow_at = _make_arrow_at_scan(arr_phases, p, C, H)
        return relay_walk(B, score, lambda i2, j2: arrow_at(i2, j2, H))

    if traceback:
        out_specs = (P(), P(), P())
    else:
        out_specs = P()
    try:
        mapped = shard_map(
            local, mesh=mesh, in_specs=(P(axis), P()),
            out_specs=out_specs, check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax spelling
        mapped = shard_map(
            local, mesh=mesh, in_specs=(P(axis), P()),
            out_specs=out_specs, check_rep=False,
        )
    return mapped(side_sh, top_ext)


def _shard_mapped(fn, mesh, in_specs, out_specs):
    try:
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax spelling
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "A", "B", "m", "k", "d", "mesh", "axis", "chunk", "span",
        "traceback", "engine", "interpret",
    ),
)
def _huge_span_device(
    side_sh, top_ext, state, s0, *, A, B, m, k, d, mesh, axis,
    chunk, span, traceback, engine, interpret,
):
    """Phases [s0, s0 + span) of the tiled fill, state in/out.

    The resumable building block: ``state`` is the per-device carry of
    the phase scan with a leading device axis (sharded over ``axis``),
    so a host loop can persist it between spans — the carry IS the
    fill's only cross-phase state.  Returns (state', arr_span) with
    ``arr_span`` leading-device-axis sharded ((nseq, span, ...));
    ``None`` when not tracing arrows."""
    nseq = mesh.shape[axis]
    C = chunk
    N_pad, H, R, nch, _ = _tile_geometry(A, B, nseq, C, engine)
    perm_down = [(i, (i + 1) % nseq) for i in range(nseq)]
    fold_call = (
        _build_fold_chunk_call(R, C, traceback, interpret)
        if engine == "pallas"
        else None
    )

    def local(side_local, top_ext, st_local, s0):
        p = jax.lax.axis_index(axis)
        st = jax.tree.map(lambda x: x[0], st_local)
        if engine == "pallas":
            side_fold = side_local.reshape(R, LANES)
            corner_jl = jnp.where(B // H == p, B - p * H, -1)
            seed = (p == 0).astype(jnp.int32)
            phase = _make_pallas_phase(
                p, side_fold, top_ext, fold_call, m, k, d, C, nch,
                A, B, H, N_pad, axis, perm_down, corner_jl, seed,
            )
        else:
            jg = p * H + jnp.arange(H, dtype=jnp.int32)
            phase = _make_scan_phase(
                p, jg, side_local, top_ext, m, k, d, C, nch, A, B, H,
                N_pad, axis, perm_down, traceback,
            )
        st, arr = jax.lax.scan(
            phase, st, s0 + jnp.arange(span, dtype=jnp.int32)
        )
        out_st = jax.tree.map(lambda x: x[None], st)
        return (out_st, arr[None]) if traceback else (out_st, None)

    state_specs = jax.tree.map(lambda _: P(axis), state)
    out_specs = (state_specs, P(axis) if traceback else None)
    mapped = _shard_mapped(
        local, mesh, (P(axis), P(), state_specs, P()), out_specs
    )
    return mapped(side_sh, top_ext, state, jnp.asarray(s0, jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("A", "B", "mesh", "axis", "chunk", "engine"),
)
def _huge_walk_sharded(arr_all, score, *, A, B, mesh, axis, chunk, engine):
    """Standalone segment-relay walk over fully-materialized tiled
    arrows ((nseq, nphases, ...) leading-device-axis sharded) — the
    pass a resumed config-5 run executes after its fill completes."""
    nseq = mesh.shape[axis]
    C = chunk
    N_pad, H, R, _, _ = _tile_geometry(A, B, nseq, C, engine)

    def local(arr_local):
        p = jax.lax.axis_index(axis)
        vary0 = (arr_local.reshape(-1)[0] * 0).astype(jnp.int32)
        arr = arr_local[0]
        if engine == "pallas":
            arrow_at = _make_arrow_at_pallas(arr, p, C, R)
        else:
            arrow_at = _make_arrow_at_scan(arr, p, C, H)
        relay_walk = _make_relay_walk(p, axis, A, H, nseq, vary0)
        _, segs, ns = relay_walk(
            B, jnp.int32(0), lambda i2, j2: arrow_at(i2, j2, H)
        )
        return segs, ns

    mapped = _shard_mapped(local, mesh, (P(axis),), (P(), P()))
    return mapped(arr_all)


def _stitch_segments(segs, seg_ns, nseq) -> np.ndarray:
    """Per-device relay segments -> one op string (walk order)."""
    segs = np.asarray(segs)  # (nseq devices, nseq rounds, cap_seg)
    seg_ns = np.asarray(seg_ns)
    parts = []
    for r in range(nseq):  # rounds in walk order
        for pdev in range(nseq):
            nn = int(seg_ns[pdev, r])
            if nn:
                parts.append(segs[pdev, r, :nn])
    return np.concatenate(parts) if parts else np.zeros((0,), np.int8)


def huge_state_init(A, B, mesh, axis, chunk, engine):
    """Global (leading-device-axis) initial carry for the span fill."""
    nseq = mesh.shape[axis]
    N_pad, H, R, _, _ = _tile_geometry(A, B, nseq, chunk, engine)
    if engine == "pallas":
        return dict(
            prev=np.full((nseq, R, LANES), NEG_INF, np.int32),
            prev2sh=np.full((nseq, R, LANES), NEG_INF, np.int32),
            ch=np.full((nseq, R, LANES), -4, np.int32),
            cap=np.full((nseq, 1, 1), NEG_INF, np.int32),
            recv=np.full((nseq, chunk), NEG_INF, np.int32),
            tail=np.full((nseq,), NEG_INF, np.int32),
        )
    return dict(
        prev=np.full((nseq, H), NEG_INF, np.int32),
        prev2=np.full((nseq, H), NEG_INF, np.int32),
        hprev=np.full((nseq,), NEG_INF, np.int32),
        cap=np.full((nseq,), NEG_INF, np.int32),
        recv=np.full((nseq, chunk), NEG_INF, np.int32),
        tail=np.full((nseq,), NEG_INF, np.int32),
    )


@dataclasses.dataclass
class HugeShardedResult:
    score: int
    ops: np.ndarray  # int8[n] op codes, corner -> origin
    n: int


def auto_chunk(
    A: int, B: int, nseq: int, engine: str = "pallas",
    target_eff: float = 0.875, c_min: int = 128, c_max: int = 2048,
) -> int:
    """Pick the halo-chunk size C for the tiled fill.

    The pipeline runs ``nphases = nch + nseq - 1`` phases for ``nch``
    chunks of useful work: efficiency ``nch / nphases``; the fill/drain
    bubble is ``(nseq - 1) / nphases``.  Smaller C means more chunks
    and less bubble but more per-phase dispatch + ppermute overhead, so
    C is chosen as the LARGEST value that still meets ``target_eff``,
    clamped to [c_min, c_max] and the kernel's 4-diagonal word quantum
    (SURVEY §5.7 / VERDICT r2 item 8).
    """
    N_pad = _round_up(B + 1, nseq * LANES if engine == "pallas" else nseq)
    if nseq <= 1:
        return max(4, min(c_max, A + N_pad) // 4 * 4)
    # nch >= need  <=>  eff = nch / (nch + nseq - 1) >= target_eff
    need = int(np.ceil((nseq - 1) * target_eff / (1.0 - target_eff)))
    C = max(c_min, min(c_max, (A + N_pad) // max(need, 1)))
    # the per-phase top-char slice reads C entries of the framed top
    # (len 2*N_pad + A): clamp to the table for small pairs
    C = min(C, A + N_pad)
    return max(4, C // 4 * 4)


def pipeline_efficiency(A: int, B: int, nseq: int, chunk: int,
                        engine: str = "pallas") -> float:
    """Useful-phase fraction ``nch / nphases`` of the tiled fill."""
    _, _, _, nch, nphases = _tile_geometry(A, B, nseq, chunk, engine)
    return nch / nphases


def _pick_engine(engine):
    if engine is not None:
        return engine
    try:
        return "pallas" if jax.devices()[0].platform == "tpu" else "scan"
    except Exception:  # pragma: no cover
        return "scan"


def huge_pair_score_sharded(
    top, side, m, k, d, mesh: Mesh, axis: str = "seq",
    chunk: int | None = None,
    engine: str | None = None, interpret: bool = False,
) -> int:
    """Score of ONE huge pair, rows sharded over ``axis``, chunked halo.

    ``chunk=None`` auto-picks C for >= 87.5% pipeline efficiency
    (:func:`auto_chunk`).  ``engine``: "pallas" (fold-layout chunk
    kernel per phase — the TPU default) or "scan" (pure lax.scan — the
    CPU default and the cross-checked reference formulation)."""
    engine = _pick_engine(engine)
    if chunk is None:
        chunk = auto_chunk(top.shape[0], side.shape[0], mesh.shape[axis], engine)
    return int(
        _huge_pair_device(
            jnp.asarray(top), jnp.asarray(side),
            m=int(m), k=int(k), d=int(d), mesh=mesh, axis=axis,
            chunk=chunk, traceback=False, engine=engine,
            interpret=interpret,
        )
    )


def huge_pair_align_sharded(
    top, side, m, k, d, mesh: Mesh, axis: str = "seq",
    chunk: int | None = None,
    engine: str | None = None, interpret: bool = False,
) -> HugeShardedResult:
    """Exact first-emission alignment of ONE huge pair across the mesh.

    The fill is the tiled block wavefront; arrows live sharded in each
    device's HBM; the walk relays across devices.  Returns op codes with
    :mod:`nw_tpu.ops.traceback` semantics (use ``ops_to_strings``).
    """
    engine = _pick_engine(engine)
    if chunk is None:
        chunk = auto_chunk(top.shape[0], side.shape[0], mesh.shape[axis], engine)
    score, segs, seg_ns = _huge_pair_device(
        jnp.asarray(top), jnp.asarray(side),
        m=int(m), k=int(k), d=int(d), mesh=mesh, axis=axis,
        chunk=chunk, traceback=True, engine=engine,
        interpret=interpret,
    )
    ops = _stitch_segments(segs, seg_ns, mesh.shape[axis])
    return HugeShardedResult(score=int(score), ops=ops, n=len(ops))
