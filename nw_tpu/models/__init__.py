"""Alignment models.

* :mod:`nw_tpu.models.needleman_wunsch` — global alignment with linear gap
  penalties (the reference's algorithm; the flagship model).
* :mod:`nw_tpu.models.smith_waterman` — local alignment (listed as future
  work in the reference README:179-186; first-class here).
* :mod:`nw_tpu.models.overlap` — overlap / semi-global alignment with free
  end gaps (the third classic algorithm of the reference's FUTURE WORK
  "align" tool, README:182-187).
* :mod:`nw_tpu.models.affine` — Gotoh affine-gap global alignment
  (README:189-191's d0/d1 wishlist).
"""

from nw_tpu.models.needleman_wunsch import NWAligner, align, align_batch

__all__ = ["NWAligner", "align", "align_batch"]
