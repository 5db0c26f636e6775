"""Host-side sequence encoding, padding, and length bucketing.

The reference operates on raw C strings of arbitrary non-whitespace bytes
(``read-sequences.c:56-86``).  For the device kernels, sequences become
fixed-shape integer arrays:

* characters are encoded as their byte value (0..255) in ``int32``;
* the two sequences of a pair are padded with *distinct* sentinels
  (``PAD_TOP = -1``, ``PAD_SIDE = -2``) so a padded "top" character can
  never spuriously match a padded "side" character.  Because the NW
  recurrence for cell (j, i) only ever reads cells with smaller row and
  column indices, the scores and arrows inside the true (len2+1, len1+1)
  rectangle are unaffected by padding — traceback starts at the true
  corner and never enters the pad region.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

PAD_TOP = -1
PAD_SIDE = -2


def encode(seq: str | bytes) -> np.ndarray:
    """Encode one sequence as an int32 vector of byte values."""
    if isinstance(seq, str):
        seq = seq.encode("utf-8")
    return np.frombuffer(bytes(seq), dtype=np.uint8).astype(np.int32)


def decode(arr: np.ndarray) -> str:
    """Inverse of :func:`encode` (drops pad sentinels)."""
    arr = np.asarray(arr)
    return bytes(int(c) for c in arr if c >= 0).decode("utf-8")


def pad_to(arr: np.ndarray, length: int, fill: int) -> np.ndarray:
    if arr.shape[0] > length:
        raise ValueError(f"sequence length {arr.shape[0]} exceeds bucket {length}")
    out = np.full((length,), fill, dtype=np.int32)
    out[: arr.shape[0]] = arr
    return out


def encode_pair(
    s1: str | bytes, s2: str | bytes, len1: int | None = None, len2: int | None = None
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Encode a (top, side) pair, padded to (len1, len2).

    Returns (top_codes, side_codes, true_len1, true_len2).
    """
    a = encode(s1)
    b = encode(s2)
    n1, n2 = a.shape[0], b.shape[0]
    if len1 is None:
        len1 = n1
    if len2 is None:
        len2 = n2
    return pad_to(a, len1, PAD_TOP), pad_to(b, len2, PAD_SIDE), n1, n2


def encode_batch(
    pairs: Sequence[Tuple[str | bytes, str | bytes]],
    len1: int | None = None,
    len2: int | None = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Encode a batch of pairs into stacked (B, len1) / (B, len2) arrays.

    Returns (tops, sides, lens1, lens2).  ``len1``/``len2`` default to the
    batch maxima.
    """
    enc = [(encode(a), encode(b)) for a, b in pairs]
    if len1 is None:
        len1 = max((a.shape[0] for a, _ in enc), default=0)
    if len2 is None:
        len2 = max((b.shape[0] for _, b in enc), default=0)
    tops = np.stack([pad_to(a, len1, PAD_TOP) for a, _ in enc]) if enc else np.zeros((0, len1), np.int32)
    sides = np.stack([pad_to(b, len2, PAD_SIDE) for _, b in enc]) if enc else np.zeros((0, len2), np.int32)
    lens1 = np.array([a.shape[0] for a, _ in enc], dtype=np.int32)
    lens2 = np.array([b.shape[0] for _, b in enc], dtype=np.int32)
    return tops, sides, lens1, lens2
