"""Byte-exact input parsing: sequence reading and C ``atoi`` semantics.

Mirrors ``read-sequences.c`` and the reference's unvalidated
``atoi``-based operand parsing (needleman-wunsch.c:783-785).
"""

from __future__ import annotations

from typing import BinaryIO, Tuple

# C isspace() set in the default locale (ctype.h)
C_WHITESPACE = b" \t\n\v\f\r"


class EarlyEOFError(Exception):
    """Raised where the reference dies with
    "got EOF too early when reading input strings"
    (read-sequences.c:50-53)."""


def _read_sequence(stream: BinaryIO, eof_ok: bool) -> bytes:
    """Read bytes until whitespace or EOF (read-sequences.c:56-86).

    The terminating whitespace byte is consumed.  EOF terminates the
    sequence but is an error unless ``eof_ok`` — note the reference
    errors even if characters were read (a first sequence not followed by
    any whitespace is fatal).
    """
    out = bytearray()
    while True:
        c = stream.read(1)
        if c == b"":  # EOF
            if not eof_ok:
                raise EarlyEOFError()
            break
        if c in C_WHITESPACE:
            break
        out += c
    return bytes(out)


def read_two_sequences(stream: BinaryIO) -> Tuple[bytes, bytes]:
    """Read two whitespace-separated sequences
    (read_two_sequences_from_stream, read-sequences.c:102-122).

    EOF before the second sequence begins is fatal; EOF terminating the
    second sequence is fine.  Anything after the second sequence's
    terminating whitespace is never read.
    """
    s1 = _read_sequence(stream, eof_ok=False)
    # discard whitespace until the first byte of sequence 2
    # (discard_whitespace_in_stream, read-sequences.c:92-100)
    while True:
        c = stream.read(1)
        if c == b"":
            raise EarlyEOFError()
        if c not in C_WHITESPACE:
            break
    s2 = bytearray(c)
    while True:
        c = stream.read(1)
        if c == b"" or c in C_WHITESPACE:
            break
        s2 += c
    return s1, bytes(s2)


_LONG_MAX = 2**63 - 1
_LONG_MIN = -(2**63)


def c_atoi(s: str | bytes) -> int:
    """C ``atoi(3)`` semantics, including silent garbage -> 0.

    The reference never validates operands (needleman-wunsch.c:783-785):
    ``atoi("x") == 0`` silently.  glibc atoi is ``(int)strtol(s, 0, 10)``:
    leading C whitespace skipped, optional sign, digits until the first
    non-digit; saturates at long range then truncates to int.
    """
    if isinstance(s, str):
        s = s.encode("utf-8", "surrogateescape")
    i = 0
    while i < len(s) and s[i : i + 1] in C_WHITESPACE:
        i += 1
    sign = 1
    if i < len(s) and s[i] in b"+-":
        if s[i] == ord("-"):
            sign = -1
        i += 1
    v = 0
    while i < len(s) and 0x30 <= s[i] <= 0x39:
        v = v * 10 + (s[i] - 0x30)
        i += 1
    v *= sign
    v = max(_LONG_MIN, min(_LONG_MAX, v))  # strtol saturation
    return ((v + 2**31) % 2**32) - 2**31  # (int) truncation
