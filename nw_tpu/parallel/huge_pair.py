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

from nw_tpu.ops.fill_scan import NEG_INF
from nw_tpu.ops.traceback import OP_DIAG, OP_LEFT, OP_NONE, OP_UP

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("m", "k", "d", "mesh", "axis", "chunk", "traceback"),
)
def _huge_pair_device(
    top, side, *, m: int, k: int, d: int, mesh: Mesh, axis: str,
    chunk: int, traceback: bool,
):
    A = top.shape[0]
    B = side.shape[0]
    nseq = mesh.shape[axis]
    C = chunk

    N_pad = _round_up(B + 1, nseq)
    H = N_pad // nseq
    K_pad = _round_up(A + N_pad, C)
    nch = K_pad // C
    nphases = nch + nseq - 1

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

    perm_down = [(i, (i + 1) % nseq) for i in range(nseq)]  # p -> p+1

    def local(side_local, top_ext):
        p = jax.lax.axis_index(axis)
        jl = jnp.arange(H, dtype=jnp.int32)
        jg = p * H + jl
        vary0 = side_local.sum() * 0  # shard_map varying-type anchor

        # diag 0 (the DP seed) is produced by the kk == 0 step override;
        # the registers start one diagonal EARLIER (all out-of-table)
        state0 = dict(
            prev=jnp.full((H,), NEG_INF, jnp.int32) + vary0,
            prev2=jnp.full((H,), NEG_INF, jnp.int32) + vary0,
            hprev=jnp.int32(NEG_INF) + vary0,  # diag-halo carry (kk-2)
            cap=jnp.int32(NEG_INF) + vary0,
            recv=jnp.full((C,), NEG_INF, jnp.int32) + vary0,
            tail=jnp.int32(NEG_INF) + vary0,  # parent chunk c-1 last diag
        )

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

        st, arr_phases = jax.lax.scan(
            phase, state0, jnp.arange(nphases, dtype=jnp.int32)
        )
        score = jax.lax.pmax(st["cap"], axis)
        if not traceback:
            return score

        # ---- segment-relay exact greedy walk over the tiled arrows ----
        # arr_phases: (nphases, C, H); my chunk c sits at phase c + p
        cap_seg = A + H + 8  # one device's worst-case path segment
        arr_flat = arr_phases.reshape(-1)

        def seg_round(carry, _):
            i, j = carry
            mine = (j // H == p) & ((i > 0) | (j > 0))

            def cond(stw):
                i2, j2, n2, _ = stw
                return ((i2 > 0) | (j2 > 0)) & (j2 // H == p) & (n2 < cap_seg)

            def body(stw):
                i2, j2, n2, ops = stw
                jloc = j2 - p * H
                kk = i2 + j2
                c = kk // C
                idx = ((c + p) * C + (kk - c * C)) * H + jloc
                a = arr_flat[idx]
                take_diag = (a & 1) != 0
                take_left = (~take_diag) & ((a & 2) != 0)
                take_up = ~(take_diag | take_left)
                op = jnp.where(
                    take_diag, OP_DIAG, jnp.where(take_left, OP_LEFT, OP_UP)
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
            # the owner's new head replaces the (replicated) shared head
            any_mine = jax.lax.psum(mine.astype(jnp.int32), axis) > 0
            i = jnp.where(
                any_mine, jax.lax.psum(jnp.where(mine, iw, 0), axis), i
            )
            j = jnp.where(
                any_mine, jax.lax.psum(jnp.where(mine, jw, 0), axis), j
            )
            return (i, j), (ops, jnp.where(mine, nw, 0))

        (fi, fj), (segs, seg_ns) = jax.lax.scan(
            seg_round,
            (jnp.int32(A) + vary0, jnp.int32(B) + vary0),
            None,
            length=nseq,
        )
        # replicate the (tiny) segments so every process can stitch
        # them — required on real multi-host meshes where remote
        # shards are not addressable
        segs_all = jax.lax.all_gather(segs, axis)      # (ndev, nround, cap)
        ns_all = jax.lax.all_gather(seg_ns, axis)      # (ndev, nround)
        return score, segs_all, ns_all

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


@dataclasses.dataclass
class HugeShardedResult:
    score: int
    ops: np.ndarray  # int8[n] op codes, corner -> origin
    n: int


def huge_pair_score_sharded(
    top, side, m, k, d, mesh: Mesh, axis: str = "seq", chunk: int = 512
) -> int:
    """Score of ONE huge pair, rows sharded over ``axis``, chunked halo."""
    return int(
        _huge_pair_device(
            jnp.asarray(top), jnp.asarray(side),
            m=int(m), k=int(k), d=int(d), mesh=mesh, axis=axis,
            chunk=chunk, traceback=False,
        )
    )


def huge_pair_align_sharded(
    top, side, m, k, d, mesh: Mesh, axis: str = "seq", chunk: int = 512
) -> HugeShardedResult:
    """Exact first-emission alignment of ONE huge pair across the mesh.

    The fill is the tiled block wavefront; arrows live sharded in each
    device's HBM; the walk relays across devices.  Returns op codes with
    :mod:`nw_tpu.ops.traceback` semantics (use ``ops_to_strings``).
    """
    score, segs, seg_ns = _huge_pair_device(
        jnp.asarray(top), jnp.asarray(side),
        m=int(m), k=int(k), d=int(d), mesh=mesh, axis=axis,
        chunk=chunk, traceback=True,
    )
    segs = np.asarray(segs)  # (nseq devices, nseq rounds, cap_seg)
    seg_ns = np.asarray(seg_ns)
    nseq = mesh.shape[axis]
    parts = []
    for r in range(nseq):  # rounds in walk order
        for pdev in range(nseq):
            nn = int(seg_ns[pdev, r])
            if nn:
                parts.append(segs[pdev, r, :nn])
    ops = (
        np.concatenate(parts) if parts else np.zeros((0,), np.int8)
    )
    return HugeShardedResult(score=int(score), ops=ops, n=len(ops))
