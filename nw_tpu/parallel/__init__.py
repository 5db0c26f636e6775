"""Multi-device execution: mesh helpers, data-parallel batch sharding,
and sequence-parallel single-pair wavefront.

The reference's only parallelism is a pthreads column-pipeline with
per-cell mutexes (needleman-wunsch.c:444-475, SURVEY.md §2.1).  Here:

* **data parallel** (:mod:`nw_tpu.parallel.data_parallel`): pair batches
  shard over a mesh axis; per-shard statistics merge with ``psum`` — the
  direct replacement of the reference's rwlock-guarded global counters
  (computation.c:223-260).
* **sequence parallel** (:mod:`nw_tpu.parallel.wavefront`): one huge
  pair's anti-diagonal state vector shards across devices; each step
  exchanges a one-element halo with the left neighbor via ``ppermute`` —
  the cross-chip analogue of the reference's thread handoff on the left
  cell, with the condvar replaced by the collective's data dependency.
"""

from nw_tpu.parallel.mesh import make_mesh

__all__ = ["make_mesh"]
