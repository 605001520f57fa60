"""Phonetic encoding — soundex blocking keys, cross-engine.

Spark ships American Soundex as a JVM builtin (``F.soundex``,
UTF8String.soundex — the Commons/NARA variant where H and W are
transparent: codes separated only by H/W still collapse, e.g.
``Ashcraft → A261`` not A226). DuckDB has no soundex, so the oracle twin
is GENERATED SQL implementing the identical algorithm from portable
primitives:

1. strip non-letters, uppercase (non-letters are transparent, matching
   Spark: ``O'Brien → O165``);
2. ``translate`` every letter to its digit code (vowels+Y → 0), deleting
   H and W outright — deleting BEFORE the run collapse is exactly what
   makes them transparent;
3. collapse same-digit runs with a fixed number of pairwise-replace
   passes (each pass halves a run, so ceil(log2(maxlen)) passes suffice —
   RE2 has no backreferences, so ``(\\d)\\1+`` is not available);
4. drop the first code (it belongs to the retained first letter) —
   UNLESS the first letter is H or W, which carries no code, so nothing
   of its own to drop (differentially discovered: ``HBkRv → H126``, the
   B's code survives); then drop the zeros and pad to ``X000`` shape.

Pinned bit-for-bit against ``F.soundex`` over a battery + random words in
``tests/test_phonetic.py``; the driver query ``phonetic_blocks`` hash-checks
it end-to-end.
"""

from __future__ import annotations

# letter -> digit, H/W appended with no counterpart so translate deletes them
_FROM = "ABCDEFGIJKLMNOPQRSTUVXYZHW"
_TO = "012301202245501262301202"
assert len(_FROM) == 26 and len(_TO) == 24


def dd_soundex(expr: str, max_len: int = 64) -> str:
    """DuckDB SQL computing Spark-compatible soundex of ``expr`` (a string
    expression containing at least one letter, letters-first — the shape
    Spark's 'first char must be a letter' precondition implies)."""
    clean = f"regexp_replace(upper({expr}), '[^A-Z]', '', 'g')"
    coded = f"translate({clean}, '{_FROM}', '{_TO}')"
    passes = max(1, (max_len - 1).bit_length())  # ceil(log2(max_len))
    collapsed = coded
    for _ in range(passes):
        for d in "0123456":
            collapsed = f"replace({collapsed}, '{d}{d}', '{d}')"
    first = f"substr({clean}, 1, 1)"
    tail = (
        f"CASE WHEN {first} IN ('H', 'W') THEN {collapsed} "
        f"ELSE substr({collapsed}, 2) END"
    )
    return f"substr({first} || replace({tail}, '0', '') || '000', 1, 4)"
