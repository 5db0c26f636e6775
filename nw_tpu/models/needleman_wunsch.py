"""The flagship model: batched global alignment with linear gap penalties.

Library equivalent of the reference driver ``needleman_wunsch()``
(needleman-wunsch.c:654-689), re-shaped for TPU execution:

* one call aligns a *batch* of pairs (the reference: one pair per
  process); pairs are padded into length buckets so compiled shapes are
  reused;
* the fill runs on device (Pallas wavefront kernel on TPU, ``lax.scan``
  elsewhere), emitting packed arrows;
* traceback is a device walk for first-optimal alignments, or a host
  enumeration (native C++ fast path) for *all* optimal alignments;
* counting / optimal-path marking are O(M*N) device scans
  (:mod:`nw_tpu.ops.pathcount`) instead of the reference's exponential
  DFS (needleman-wunsch.c:231-331).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nw_tpu.config import AlignConfig, ScoringParams
from nw_tpu.ops import encode as enc
from nw_tpu.ops import enumerate_walk, pathcount, traceback
from nw_tpu.ops.fill_scan import diag_to_matrix, fill_diag


def _as_bytes(s: str | bytes) -> bytes:
    return s.encode() if isinstance(s, str) else bytes(s)


@functools.lru_cache(maxsize=None)
def _count_vmapped(arrows_axis: int):
    """Cached jitted batched path-count (a fresh jax.jit wrapper per
    call would recompile every align_batch invocation)."""
    return jax.jit(
        jax.vmap(pathcount.count_paths, in_axes=(arrows_axis, 0, 0))
    )


@functools.lru_cache(maxsize=None)
def _traceback_vmapped(arrows_axis: int, max_steps: int):
    return jax.jit(
        jax.vmap(
            lambda a, a1, a2: traceback.traceback_greedy(
                a, a1, a2, max_steps=max_steps
            ),
            in_axes=(arrows_axis, 0, 0),
        )
    )


@dataclasses.dataclass
class AlignmentResult:
    """Result for a single pair."""

    s1: bytes
    s2: bytes
    score: int
    solution_count: int
    arrows_diag: Optional[np.ndarray] = None  # uint8[K, N] diagonal-major
    scores_diag: Optional[np.ndarray] = None  # int32[K, N]

    @property
    def arrows(self) -> np.ndarray:
        """Rectangular uint8[N, M] arrow matrix."""
        return diag_to_matrix(self.arrows_diag, len(self.s1), len(self.s2))

    @property
    def score_matrix(self) -> np.ndarray:
        return diag_to_matrix(self.scores_diag, len(self.s1), len(self.s2))

    def alignments(
        self, max_alignments: Optional[int] = None
    ) -> Iterator[Tuple[bytes, bytes]]:
        """All optimal alignments in reference DFS order (diag>left>up)."""
        return enumerate_walk.iter_alignments(
            self.arrows, self.s1, self.s2, max_alignments
        )

    def best_alignment(self) -> Tuple[bytes, bytes]:
        """First optimal alignment (== the reference's first-emitted one)."""
        for a in self.alignments(max_alignments=1):
            return a
        return b"", b""


@dataclasses.dataclass
class BatchResult:
    """Result for a batch of pairs."""

    scores: np.ndarray  # int32[B] optimal scores
    counts: Optional[np.ndarray] = None  # uint32[B] optimal-alignment counts
    ops: Optional[np.ndarray] = None  # int8[B, S] greedy traceback op codes
    ops_len: Optional[np.ndarray] = None  # int32[B]
    status: Optional[np.ndarray] = None  # uint8[B]: 0 = ok, 1 = rejected
    _pairs: Optional[Sequence[Tuple[bytes, bytes]]] = None

    STATUS_OK = 0
    STATUS_TOO_LONG = 1

    def alignment_strings(self) -> List[Tuple[bytes, bytes]]:
        """One (first-)optimal aligned pair of byte strings per input."""
        assert self.ops is not None, "batch was run without traceback"
        return traceback.ops_to_strings_batch(self.ops, self.ops_len, self._pairs)


@dataclasses.dataclass
class HugeAlignmentResult:
    """Result of :meth:`NWAligner.align_huge` — the first-optimal
    alignment without any per-cell table state."""

    s1: bytes
    s2: bytes
    score: int
    X: bytes  # aligned top string (with '-' gaps)
    Y: bytes  # aligned side string


class NWAligner:
    """Needleman-Wunsch aligner configured once, applied to many inputs."""

    def __init__(self, config: AlignConfig | None = None, **scoring_kwargs):
        if config is None:
            config = AlignConfig(scoring=ScoringParams(**scoring_kwargs))
        self.config = config

    # ---------------- single pair (CLI / exploratory path) ----------------

    def align(self, s1: str | bytes, s2: str | bytes) -> AlignmentResult:
        """Align one pair, returning full arrows + scores for enumeration
        and table rendering.

        Mirrors init_computation + compute_table_scores
        (computation.c:145-191, needleman-wunsch.c:583-626) followed by
        the O(M*N) solution count.
        """
        s1b, s2b = _as_bytes(s1), _as_bytes(s2)
        m, k, d = self.config.scoring.as_tuple()
        top = enc.encode(s1b)
        side = enc.encode(s2b)
        out = fill_diag(top, side, m, k, d, with_scores=True)
        if len(s1b) == 0 and len(s2b) == 0:
            count = 0  # reference DFS emits nothing on a 1x1 table
        else:
            count = int(pathcount.count_paths(out["arrows"], len(s1b), len(s2b)))
        return AlignmentResult(
            s1=s1b,
            s2=s2b,
            score=int(out["score"]),
            solution_count=count,
            arrows_diag=np.asarray(out["arrows"]),
            scores_diag=np.asarray(out["scores"]),
        )

    def align_huge(
        self,
        s1: str | bytes,
        s2: str | bytes,
        block_diagonals: Optional[int] = None,
    ) -> "HugeAlignmentResult":
        """Exact first-optimal alignment of ONE huge pair (100kb+).

        The alignment is byte-identical to the reference DFS's
        *first-emitted* one (needleman-wunsch.c:305-324) — unlike
        Hirschberg (:func:`nw_tpu.ops.hirschberg.hirschberg_align`),
        which returns an arbitrary optimal alignment.  The reference
        itself cannot trace back pairs at this scale at all (136 B/cell
        of table state, SURVEY.md §6: 13.6 GB at 10k x 10k).

        Route: on TPU, when the register-blocked engine's 2-bit walk
        words for the whole pair fit the HBM budget
        (``NW_TPU_HUGE_WALK_HBM``, default 8 GB — a 1x100kb pair is
        ~2.6 GB and aligns in ~0.4 s), the fill+walk runs as the
        config-5 tiled engine on a one-device mesh
        (:func:`nw_tpu.parallel.huge_pair.huge_pair_align_sharded`,
        ~3x the checkpointed path).  Beyond the budget (or off-TPU,
        or with an explicit ``block_diagonals``) it uses the
        checkpointed re-fill traceback
        (:mod:`nw_tpu.ops.checkpoint_traceback`): two fill passes,
        only ``O(K*N/C + C*N)`` memory, any length.
        """
        s1b, s2b = _as_bytes(s1), _as_bytes(s2)
        m, k, d = self.config.scoring.as_tuple()
        top = jnp.asarray(enc.encode(s1b))
        side = jnp.asarray(enc.encode(s2b))
        ops, n, score = self._huge_ops(top, side, block_diagonals)
        X, Y = traceback.ops_to_strings(ops, n, s1b, s2b)
        if score is None:
            score = 0
            for x, y in zip(X, Y):
                if x == ord("-") or y == ord("-"):
                    score -= d
                elif x == y:
                    score += m
                else:
                    score -= k
        return HugeAlignmentResult(s1=s1b, s2=s2b, score=score, X=X, Y=Y)

    def _huge_ops(self, top, side, block_diagonals=None):
        """(ops int8[n], n, score | None) for ONE huge pair — the
        align_huge route selection: config-5 pallasb fill+walk when the
        2-bit word stack fits ``NW_TPU_HUGE_WALK_HBM`` (score comes
        from the exact corner capture), else the checkpointed re-fill
        traceback (score None — derive it from the alignment)."""
        m, k, d = self.config.scoring.as_tuple()
        if pallas_supported() and block_diagonals is None:
            from nw_tpu.parallel.huge_pair import (
                _tile_geometry,
                auto_chunk,
            )

            A, B = top.shape[0], side.shape[0]
            C = auto_chunk(A, B, 1, "pallasb", traceback=True)
            _, _, R, _, nphases = _tile_geometry(A, B, 1, C, "pallasb")
            words = nphases * (C // 16) * R * 128 * 4
            budget = int(os.environ.get("NW_TPU_HUGE_WALK_HBM", 8 << 30))
            if words <= budget:
                from jax.sharding import Mesh

                from nw_tpu.parallel.huge_pair import (
                    huge_pair_align_sharded,
                )

                mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
                r = huge_pair_align_sharded(
                    top, side, m, k, d, mesh, chunk=C, engine="pallasb"
                )
                return np.asarray(r.ops), r.n, r.score
        from nw_tpu.ops.checkpoint_traceback import traceback_checkpointed

        ops, n = traceback_checkpointed(
            top, side, m, k, d,
            block_diagonals=block_diagonals,
            interpret=not pallas_supported(),
        )
        return np.asarray(ops), int(n), None

    def align_huge_sharded(
        self,
        s1: str | bytes,
        s2: str | bytes,
        mesh,
        axis: str = "seq",
        chunk: Optional[int] = None,
    ) -> "HugeAlignmentResult":
        """Exact first-optimal alignment of ONE pair too large for a
        single device: the DP matrix is tiled over ``mesh``'s ``axis``
        (BASELINE config 5 — 2-D block wavefront, chunked halo
        collectives, per-device arrow storage, segment-relay walk; see
        :mod:`nw_tpu.parallel.huge_pair`).  Byte-identical to the
        reference DFS's first-emitted alignment."""
        from nw_tpu.parallel.huge_pair import huge_pair_align_sharded

        s1b, s2b = _as_bytes(s1), _as_bytes(s2)
        m, k, d = self.config.scoring.as_tuple()
        r = huge_pair_align_sharded(
            jnp.asarray(enc.encode(s1b)), jnp.asarray(enc.encode(s2b)),
            m, k, d, mesh, axis=axis, chunk=chunk,
        )
        X, Y = traceback.ops_to_strings(r.ops, r.n, s1b, s2b)
        return HugeAlignmentResult(s1=s1b, s2=s2b, score=r.score, X=X, Y=Y)

    def summary_huge(
        self, s1: str | bytes, s2: str | bytes
    ) -> Tuple[int, int]:
        """(optimal score, solution count mod 2^32) of ONE huge pair in
        a single O(N)-memory pass (fused score+count fold kernel) — the
        reference ``-s`` summary (computation.c:271-281) at scales
        where no table can be materialized."""
        from nw_tpu.ops.fill_pallas_single import score_count_fold

        s1b, s2b = _as_bytes(s1), _as_bytes(s2)
        m, k, d = self.config.scoring.as_tuple()
        sc, cnt = score_count_fold(
            jnp.asarray(enc.encode(s1b)),
            jnp.asarray(enc.encode(s2b)),
            m, k, d, interpret=not pallas_supported(),
        )
        count = 0 if not s1b and not s2b else int(cnt)
        return int(sc), count

    def _align_batch_huge_pairs(
        self, norm, status, traceback_strings, count
    ) -> "BatchResult":
        """A small batch of HUGE pairs, one pair at a time through the
        huge-pair engines (see the dispatch comment in align_batch).
        Strings ride :meth:`_huge_ops` (config-5 walk words or
        checkpointed re-fill — first-emission exact); counts ride the
        fused O(N)-memory score+count fold (:meth:`summary_huge`)."""
        m, k, d = self.config.scoring.as_tuple()
        nb = len(norm)
        scores = np.zeros(nb, np.int32)
        counts = np.zeros(nb, np.uint32) if count else None
        ops_rows: List[np.ndarray] = []
        ns = np.zeros(nb, np.int32)
        for i, (a, b) in enumerate(norm):
            score = None
            if traceback_strings:
                top = jnp.asarray(enc.encode(a))
                side = jnp.asarray(enc.encode(b))
                ops, n, score = self._huge_ops(top, side)
                ops_rows.append(ops[:n])
                ns[i] = n
            if count:
                sc, cnt = self.summary_huge(a, b)
                scores[i] = sc
                counts[i] = cnt
            elif score is not None:
                scores[i] = score
            else:
                # checkpointed route carries no score: derive it from
                # the alignment (exactly align_huge's rule)
                X, Y = traceback.ops_to_strings(
                    ops_rows[-1], int(ns[i]), a, b
                )
                for x, y in zip(X, Y):
                    if x == ord("-") or y == ord("-"):
                        scores[i] -= d
                    elif x == y:
                        scores[i] += m
                    else:
                        scores[i] -= k
        result = BatchResult(scores=scores, status=status, _pairs=norm)
        if count:
            result.counts = counts
        if traceback_strings:
            S = max((len(a) + len(b) for a, b in norm), default=1)
            ops_arr = np.zeros((nb, max(S, 1)), np.int8)
            for i, row in enumerate(ops_rows):
                ops_arr[i, : len(row)] = row
            result.ops = ops_arr
            result.ops_len = ns
        return result

    # ---------------- batched (production path) ----------------

    def _align_batch_banded_pipelined(
        self, norm, m, k, d, chunk, count
    ) -> "BatchResult":
        """Banded-traceback batches larger than one 128-lane chunk:
        see :func:`_pipelined_banded_walk`."""
        scores_l, counts_l, ops_l, n_l = _pipelined_banded_walk(
            norm, m, k, d, chunk, count, self.config.bucket_for
        )
        result = BatchResult(
            scores=np.concatenate(scores_l),
            status=np.zeros((len(norm),), np.uint8),
            _pairs=norm,
        )
        if count:
            result.counts = np.concatenate(counts_l)
        result.ops = np.concatenate(ops_l)
        result.ops_len = np.concatenate(n_l)
        return result

    def align_batch(
        self,
        pairs: Sequence[Tuple[str | bytes, str | bytes]],
        traceback_strings: bool = False,
        count: bool = False,
        max_length: Optional[int] = None,
        on_error: str = "raise",
    ) -> BatchResult:
        """Score a batch of pairs on device (one wavefront per pair,
        batch across vector lanes).

        Score-only batches use the Pallas TPU kernel when available;
        batches needing arrows use the scan fill.

        Failure isolation (reference equivalent: none — every error is a
        fatal ``check()`` exit, dbg.h:96-100): with ``on_error="mask"``,
        pairs longer than ``max_length`` are masked out of the batch and
        reported per-pair in ``result.status`` instead of failing the
        whole run.

        Arrow-emitting batches are auto-split into HBM-sized sub-batches
        (a 10kb pair's packed arrows are ~200 MB; the whole batch need
        not fit at once).
        """
        m, k, d = self.config.scoring.as_tuple()
        norm = [(_as_bytes(a), _as_bytes(b)) for a, b in pairs]

        # HBM-aware auto-chunking for arrow-emitting runs
        if (traceback_strings or count) and len(norm) > 1:
            from nw_tpu.ops.fill_auto import (
                BANDED_MIN_BATCH,
                LANES_ARROWS_MAX_SIDE,
            )

            L1 = self.config.bucket_for(max((len(a) for a, _ in norm), default=1))
            L2 = self.config.bucket_for(max((len(b) for _, b in norm), default=1))
            use_pallas = self.config.use_pallas and pallas_supported()
            if (
                use_pallas
                and L2 > LANES_ARROWS_MAX_SIDE
                and len(norm) >= BANDED_MIN_BATCH
            ):
                # banded checkpointed route: arrows are never fully
                # materialized; live memory is one group of bands per
                # 128-lane block, so chunk only to keep lanes full
                chunk = int(os.environ.get("NW_TPU_BANDED_TB_PAIRS", "128"))
                if (
                    traceback_strings
                    and chunk < len(norm)
                    and max_length is None
                ):
                    # pipelined multi-chunk path: dispatch every chunk
                    # before fetching any, so host unpack of chunk i
                    # overlaps device compute of chunk i+1
                    return self._align_batch_banded_pipelined(
                        norm, m, k, d, chunk, count
                    )
            else:
                arrow_bytes = (L1 + L2 + 2) * (L2 + 1)  # packed words/pair
                budget = int(os.environ.get("NW_TPU_ARROW_HBM", str(4 << 30)))
                chunk = max(1, budget // max(arrow_bytes, 1))
            if chunk < len(norm):
                parts = [
                    self.align_batch(
                        norm[i : i + chunk],
                        traceback_strings=traceback_strings,
                        count=count,
                        max_length=max_length,
                        on_error=on_error,
                    )
                    for i in range(0, len(norm), chunk)
                ]
                merged = BatchResult(
                    scores=np.concatenate([p.scores for p in parts]),
                    status=np.concatenate([p.status for p in parts]),
                    _pairs=norm,
                )
                if count:
                    merged.counts = np.concatenate([p.counts for p in parts])
                if traceback_strings:
                    S = max(p.ops.shape[1] for p in parts)
                    merged.ops = np.concatenate(
                        [
                            np.pad(
                                p.ops, ((0, 0), (0, S - p.ops.shape[1])),
                                constant_values=3,  # OP_NONE
                            )
                            for p in parts
                        ]
                    )
                    merged.ops_len = np.concatenate([p.ops_len for p in parts])
                return merged
        status = np.zeros((len(norm),), np.uint8)
        if max_length is not None:
            bad = [
                i
                for i, (a, b) in enumerate(norm)
                if len(a) > max_length or len(b) > max_length
            ]
            if bad and on_error == "raise":
                raise ValueError(
                    f"{len(bad)} pair(s) exceed max_length={max_length} "
                    f"(first: index {bad[0]}); pass on_error='mask' to "
                    "isolate them"
                )
            for i in bad:
                status[i] = BatchResult.STATUS_TOO_LONG
                norm[i] = (b"", b"")
        len1 = self.config.bucket_for(max((len(a) for a, _ in norm), default=1))
        len2 = self.config.bucket_for(max((len(b) for _, b in norm), default=1))

        from nw_tpu.ops.fill_auto import (
            BANDED_MIN_BATCH,
            HUGE_PAIR_MIN_SIDE,
            LANES_ARROWS_MAX_SIDE,
            fill_arrows_auto,
            fill_scores_auto,
        )

        need_arrows = traceback_strings or count
        use_pallas = self.config.use_pallas and pallas_supported()
        platform = "tpu" if use_pallas else "cpu"
        # uint8 upload on device paths: 4x smaller host->device transfer
        # (~27 ms tunnel, see ops/encode.py); every batch output is
        # lens-gated so the 0-pad is equivalent (tests/test_encode_u8.py)
        encode = enc.encode_batch_u8 if use_pallas else enc.encode_batch
        tops, sides, lens1, lens2 = encode(norm, len1, len2)
        l1j, l2j = jnp.asarray(lens1), jnp.asarray(lens2)
        if not need_arrows:
            scores = fill_scores_auto(
                tops, sides, lens1, lens2, m, k, d, platform=platform
            )
            return BatchResult(scores=np.asarray(scores), status=status, _pairs=norm)

        if len2 > HUGE_PAIR_MIN_SIDE and len(norm) < BANDED_MIN_BATCH:
            # a SMALL batch of HUGE pairs: the banded engine would pad
            # to 128 lanes (128x the cell work at 2 pairs), and the
            # full-arrow fallback cannot even allocate (~20 GB of 3-bit
            # arrows for ONE 100 kb pair).  Run each pair through the
            # huge-pair routes instead — the config-5 walk-word engine
            # (or checkpointed re-fill) for strings, the fused O(N)-
            # memory score+count fold for counts; per-pair arrows never
            # exist.  ~0.45 s/pair at 1x100kb vs an OOM before.
            return self._align_batch_huge_pairs(
                norm, status, traceback_strings, count
            )
        if (
            use_pallas
            and len2 > LANES_ARROWS_MAX_SIDE
            and len(norm) >= BANDED_MIN_BATCH
        ):
            # long-side batches: the banded checkpointed engine —
            # fused score(+count) checkpoint pass, then per-group arrow
            # re-fill + batched walk; full arrows never exist in HBM
            if traceback_strings:
                from nw_tpu.ops.banded_traceback import traceback_banded_batch

                out = traceback_banded_batch(
                    tops, sides, lens1, lens2, m, k, d, with_counts=count
                )
                if count:
                    scores, counts, ops, n = out
                else:
                    (scores, ops, n), counts = out, None
                result = BatchResult(scores=scores, status=status, _pairs=norm)
                if count:
                    result.counts = counts
                result.ops = ops
                result.ops_len = n
                return result
            from nw_tpu.ops.fill_pallas_banded import (
                fill_scores_counts_banded_batch,
            )

            scores, counts = fill_scores_counts_banded_batch(
                tops, sides, lens1, lens2, m, k, d
            )
            result = BatchResult(
                scores=np.asarray(scores), status=status, _pairs=norm
            )
            result.counts = np.asarray(counts)
            return result

        if count and not traceback_strings and use_pallas:
            # fused score+count wavefront: no arrows materialized at all
            # (row-sweep at short sides when enabled, else banded —
            # any side length)
            from nw_tpu.ops.fill_auto import rowsweep_pick

            rs = rowsweep_pick(
                "counts", tops.shape[1], sides.shape[1], len(norm)
            )
            if rs is not None:
                from nw_tpu.ops.fill_rowsweep import (
                    fill_scores_counts_rowsweep_batch,
                )

                scores, counts = fill_scores_counts_rowsweep_batch(
                    tops, sides, lens1, lens2, m, k, d,
                    rows=rs[0], groups=rs[1],
                )
            else:
                from nw_tpu.ops.fill_pallas_banded import (
                    fill_scores_counts_banded_batch,
                )

                scores, counts = fill_scores_counts_banded_batch(
                    tops, sides, lens1, lens2, m, k, d
                )
            result = BatchResult(
                scores=np.asarray(scores), status=status, _pairs=norm
            )
            result.counts = np.asarray(counts)
            return result

        if (
            traceback_strings
            and not count
            and use_pallas
            and len2 <= LANES_ARROWS_MAX_SIDE
        ):
            # greedy-strings-only: the walk never reads tie masks, so
            # fill 2-bit greedy-direction words (16 cells/word — 1/4 the
            # slab and store traffic of the 3-bit arrows) and walk them
            from nw_tpu.ops.fill_auto import rowsweep_pick

            rs = rowsweep_pick("greedy", len1, len2, len(norm))
            if rs is not None:
                from nw_tpu.ops.arrows_rowsweep import (
                    fill_greedy_rowsweep_batch,
                )

                words2, scores = fill_greedy_rowsweep_batch(
                    tops, sides, lens1, lens2, m, k, d,
                    rows=rs[0], groups=rs[1],
                )
                ops, n = traceback.traceback_greedy2_rowmajor_batch(
                    words2[:, :, : len(norm)], l1j, l2j,
                    max_steps=len1 + len2,
                )
            else:
                from nw_tpu.ops.fill_pallas_banded import (
                    fill_greedy_banded_single,
                )

                words2, scores = fill_greedy_banded_single(
                    tops, sides, lens1, lens2, m, k, d
                )
                ops, n = traceback.traceback_greedy2_batch(
                    words2, l1j, l2j, max_steps=len1 + len2
                )
            scores, ops, n = jax.device_get((scores, ops, n))
            return BatchResult(
                scores=scores, status=status, ops=ops, ops_len=n,
                _pairs=norm,
            )

        # arrow-emitting fill: batch-in-lanes Pallas kernel for short
        # sides, fold-layout kernel for long sides (both TPU, packed
        # 4-diagonals-per-word layout — pathcount and traceback dispatch
        # on dtype), lax.scan fill otherwise
        counts = None
        if count and use_pallas and len2 <= 1024:
            # fused: counts ride the arrow fill, no second DP pass
            # (VMEM bounds the extra count diagonals to ~1k sides; longer
            # batches take the two-pass arrows + count_paths route)
            from nw_tpu.ops.fill_pallas_banded import (
                fill_arrows_banded_single,
            )

            arrows3, scores, counts = fill_arrows_banded_single(
                tops, sides, lens1, lens2, m, k, d, with_counts=True
            )
            arrows_axis = 2
        else:
            arrows3, arrows_axis, scores = fill_arrows_auto(
                tops, sides, lens1, lens2, m, k, d, platform=platform
            )
        if count:
            if counts is None and arrows_axis == 2 and use_pallas:
                # second pass over the stored packed slabs, at fill speed
                from nw_tpu.ops.fill_pallas import count_packed_pallas_batch

                counts = count_packed_pallas_batch(arrows3, lens1, lens2)
            elif counts is None:
                counts = _count_vmapped(arrows_axis)(arrows3, l1j, l2j)
        ops = n = None
        if traceback_strings:
            ops, n = _traceback_vmapped(arrows_axis, len1 + len2)(
                arrows3, l1j, l2j
            )
        # one device round-trip for all outputs (each np.asarray pays a
        # full host<->device latency; batching matters on remote links)
        scores, counts, ops, n = jax.device_get((scores, counts, ops, n))
        result = BatchResult(scores=scores, status=status, _pairs=norm)
        if count:
            result.counts = counts
        if traceback_strings:
            result.ops = ops
            result.ops_len = n
        return result


def _pipelined_banded_walk(
    norm, m, k, d, chunk, count, bucket_for, interpret: bool = False
):
    """Dispatch-all-then-finalize banded tracebacks over sub-batches.

    One compiled program serves every sub-batch (the tail pads to the
    chunk quantum with empty pairs); JAX's async dispatch keeps the
    device running sub-batch i+1 while the host unpacks sub-batch i —
    large-batch e2e tracks the device engine rate instead of
    device + host serialized (VERDICT r2 item 4).
    """
    from nw_tpu.ops.banded_traceback import (
        RunsRecordOverflow,
        traceback_banded_dispatch,
        traceback_banded_finalize,
    )

    L1 = bucket_for(max((len(a) for a, _ in norm), default=1))
    L2 = bucket_for(max((len(b) for _, b in norm), default=1))
    subs = [norm[i : i + chunk] for i in range(0, len(norm), chunk)]
    handles = []
    for sub in subs:
        padded = sub + [(b"", b"")] * (chunk - len(sub))
        # uint8 upload: the 256x10kb sub-batch's sequence transfer drops
        # ~21 MB -> ~5 MB through the tunnel (probe_pass_split.py item 1);
        # _prep_banded casts to int32 on device
        tops, sides, l1, l2 = enc.encode_batch_u8(padded, L1, L2)
        handles.append(
            (
                traceback_banded_dispatch(
                    tops, sides, l1, l2, m, k, d, with_counts=count,
                    interpret=interpret,
                ),
                (tops, sides, l1, l2),
            )
        )
    scores_l, counts_l, ops_l, n_l = [], [], [], []
    for sub, (h, enc_sub) in zip(subs, handles):
        try:
            outs = traceback_banded_finalize(h, L1, L2, with_counts=count)
        except RunsRecordOverflow:
            # rare gap-dense sub-batch: redo on the per-cell engine
            from nw_tpu.ops.banded_traceback import traceback_banded_batch

            outs = traceback_banded_batch(
                *enc_sub, m, k, d, with_counts=count,
                interpret=interpret, engine="twopass",
            )
        if count:
            sc, ct, ops, n = outs
            counts_l.append(ct[: len(sub)])
        else:
            sc, ops, n = outs
        scores_l.append(sc[: len(sub)])
        ops_l.append(ops[: len(sub)])
        n_l.append(n[: len(sub)])
    return scores_l, counts_l, ops_l, n_l


_PALLAS_OK: Optional[bool] = None


def pallas_supported() -> bool:
    """True when the default backend can run the Pallas TPU kernels."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            _PALLAS_OK = jax.devices()[0].platform == "tpu"
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK


def align(s1, s2, m: int = 1, k: int = 1, d: int = 1) -> AlignmentResult:
    """One-shot single-pair alignment (reference CLI semantics)."""
    return NWAligner(AlignConfig(scoring=ScoringParams(m, k, d))).align(s1, s2)


def align_batch(pairs, m: int = 1, k: int = 1, d: int = 1, **kw) -> BatchResult:
    """One-shot batched alignment."""
    return NWAligner(AlignConfig(scoring=ScoringParams(m, k, d))).align_batch(
        pairs, **kw
    )
