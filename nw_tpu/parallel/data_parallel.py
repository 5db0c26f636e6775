"""Data-parallel batched alignment over a device mesh.

Pair batches shard along the ``data`` mesh axis (one shard of pairs per
device); each device runs the wavefront fill on its shard, and run-level
statistics merge with XLA collectives.  The merged counters are the
TPU-native replacement for the reference's rwlock-protected globals
(``solution_count``, computation.c:223-260; ``branch_count``,
walk-table.c:108-147): instead of threads serializing on a lock, every
device owns its partial sums and one ``psum`` combines them.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from nw_tpu.ops.fill_auto import fill_arrows_auto, fill_scores_auto

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis", "with_counts", "m", "k", "d")
)
def align_batch_sharded(
    tops,
    sides,
    lens1,
    lens2,
    *,
    m: int,
    k: int,
    d: int,
    mesh: Mesh,
    axis: str = "data",
    with_counts: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Shard a pair batch over ``axis``, fill, and psum-merge run stats.

    Args:
      tops: int32[B, A]; sides: int32[B, Bs]; lens1/lens2: int32[B].
        B must divide evenly by the mesh axis size (pad with dummy pairs
        of length 0 and drop them from stats via ``lens1 > 0`` masking
        upstream if needed).
    Returns:
      (scores int32[B] — sharded over ``axis``,
       stats dict of replicated scalars: ``pairs``, ``score_sum``,
       ``score_min``, ``score_max``, ``cells`` and, with
       ``with_counts``, ``solutions`` — the psum of per-pair optimal
       alignment counts, uint32-wrapping like the reference's global
       counter.)
    """

    # per-device kernel choice follows the mesh's platform (TPU shards
    # run the Pallas kernels; CPU/virtual meshes the lax.scan fill)
    platform = mesh.devices.flat[0].platform

    def shardfn(tops, sides, lens1, lens2):
        if with_counts:
            from nw_tpu.ops.pathcount import count_paths

            arrows, arrows_axis, scores = fill_arrows_auto(
                tops, sides, lens1, lens2, m, k, d, platform=platform
            )
            counts = jax.vmap(count_paths, in_axes=(arrows_axis, 0, 0))(
                arrows, lens1, lens2
            )
            solutions = jax.lax.psum(counts.sum().astype(jnp.uint32), axis)
        else:
            scores = fill_scores_auto(
                tops, sides, lens1, lens2, m, k, d, platform=platform
            )
            solutions = None

        real = (lens1 > 0) | (lens2 > 0)
        stats = {
            "pairs": jax.lax.psum(real.sum(), axis),
            "score_sum": jax.lax.psum(
                jnp.where(real, scores, 0).astype(jnp.int64).sum(), axis
            ),
            "score_min": jax.lax.pmin(
                jnp.where(real, scores, jnp.int32(2**31 - 1)).min(), axis
            ),
            "score_max": jax.lax.pmax(
                jnp.where(real, scores, jnp.int32(-(2**31))).max(), axis
            ),
            "cells": jax.lax.psum(
                (lens1.astype(jnp.int64) * lens2.astype(jnp.int64)).sum(), axis
            ),
        }
        if solutions is not None:
            stats["solutions"] = solutions
        return scores, stats

    spec = P(axis)
    mapped = shard_map(
        shardfn,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=(spec, P()),
        # pallas_call outputs carry no varying-mesh-axes metadata; the
        # explicit in/out specs above are the contract
        check_vma=False,
    )
    return mapped(tops, sides, jnp.asarray(lens1), jnp.asarray(lens2))


def shard_batch(mesh: Mesh, axis: str, *arrays):
    """Place host arrays with a batch-sharded layout on the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return tuple(jax.device_put(a, sharding) for a in arrays)
