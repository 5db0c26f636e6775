"""Packed direction-arrow encoding.

The reference stores walk state as eight ``int`` fields per cell — 32
bytes (``walk-table.h:48-57``).  Here the complete walk information is a
single ``uint8`` bit mask per cell (4x less than even one of those ints,
32x less than the struct):

* bit 0 (``ARROW_DIAG``): the diagonal predecessor is optimal
  (reference ``walk_table_cell_t.diag``, set at needleman-wunsch.c:486-488)
* bit 1 (``ARROW_LEFT``): the left predecessor is optimal (``.left``, :498-500)
* bit 2 (``ARROW_UP``): the up predecessor is optimal (``.up``, :492-494)

Boundary cells carry exactly the reference's seeded arrows
(computation.c:96-120): row 0 cells (i>=1) = ``ARROW_LEFT``, column 0
cells (j>=1) = ``ARROW_UP``, cell (0,0) = 0.

The ``*_done`` bookkeeping flags and ``src_direction`` of the reference are
DFS traversal state, not table state — they live in the enumerator's stack
(:mod:`nw_tpu.ops.enumerate_walk`), not in device memory.
"""

import numpy as np

ARROW_DIAG = np.uint8(1)
ARROW_LEFT = np.uint8(2)
ARROW_UP = np.uint8(4)

ARROW_DTYPE = np.uint8
