"""Alignment models.

* :mod:`nw_tpu.models.needleman_wunsch` — global alignment with linear gap
  penalties (the reference's algorithm; the flagship model).
* :mod:`nw_tpu.models.smith_waterman` — local alignment (listed as future
  work in the reference README:179-186; first-class here).
"""

from nw_tpu.models.needleman_wunsch import NWAligner, align, align_batch

__all__ = ["NWAligner", "align", "align_batch"]
