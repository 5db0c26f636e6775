"""Native (C++) host runtime components.

The reference's entire runtime is native C; here the device compute path
is JAX/Pallas, and the host-side hot paths that remain inherently
sequential are native C++:

* :mod:`nw_tpu.runtime.native` — the all-optimal-alignments DFS walker
  (the reference's construct_alignments_for_subtable,
  needleman-wunsch.c:209-331), compiled on first use with g++ and loaded
  via ctypes.  Pure-Python fallback in :mod:`nw_tpu.ops.enumerate_walk`.
"""
