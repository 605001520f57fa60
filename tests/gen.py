"""Seeded edit-operation generators for differential tests and fixtures.

Shape mirrors the reference's randomized harness
(``tests/edit_operations.cpp:19-27`` English letter-frequency table,
``:60-130`` word generation, ``:194-219`` apply_random_edits;
``tests/comparetests.cpp:212-214`` MAX_DISTANCE/MAX_EDITS_MADE = 5) —
re-implemented, not copied: plain NumPy Generator instead of C++ <random>.
"""

from __future__ import annotations

import numpy as np

# English letter relative frequencies (public-domain table, as used by the
# reference's weighted word generator).
_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_FREQ = np.array(
    [8.17, 1.49, 2.78, 4.25, 12.70, 2.23, 2.02, 6.09, 6.97, 0.15, 0.77, 4.03,
     2.41, 6.75, 7.51, 1.93, 0.10, 5.99, 6.33, 9.06, 2.76, 0.98, 2.36, 0.15,
     1.97, 0.07]
)
_FREQ = _FREQ / _FREQ.sum()

EDIT_TYPES = ("transpose", "delete", "insert", "substitute")


def random_word(rng: np.random.Generator, length: int) -> str:
    return "".join(rng.choice(list(_LETTERS), size=length, p=_FREQ))


def apply_edits(rng: np.random.Generator, word: str, n_edits: int, kind: str) -> str:
    """Apply ``n_edits`` edits of one kind (reference apply_random_edits shape)."""
    chars = list(word)
    for _ in range(n_edits):
        if not chars:
            kind_eff = "insert"
        else:
            kind_eff = kind
        if kind_eff == "transpose" and len(chars) >= 2:
            i = int(rng.integers(0, len(chars) - 1))
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
        elif kind_eff == "delete" and chars:
            i = int(rng.integers(0, len(chars)))
            del chars[i]
        elif kind_eff == "insert":
            i = int(rng.integers(0, len(chars) + 1))
            chars.insert(i, _LETTERS[int(rng.integers(0, 26))])
        elif chars:  # substitute
            i = int(rng.integers(0, len(chars)))
            chars[i] = _LETTERS[int(rng.integers(0, 26))]
    return "".join(chars)


def random_affixed_pair(
    rng: np.random.Generator,
    word_len: int = 20,
    max_edits: int = 5,
    kind: str | None = None,
    affix_max: int = 10,
) -> tuple[str, str]:
    """Base word + edited copy, optionally sharing a random prefix/suffix
    (mirrors tests/unittests.cpp:219-250)."""
    base = random_word(rng, word_len)
    k = kind or EDIT_TYPES[int(rng.integers(0, len(EDIT_TYPES)))]
    edited = apply_edits(rng, base, int(rng.integers(1, max_edits + 1)), k)
    if rng.random() < 0.5:
        pre = random_word(rng, int(rng.integers(1, affix_max + 1)))
        base, edited = pre + base, pre + edited
    if rng.random() < 0.5:
        suf = random_word(rng, int(rng.integers(1, affix_max + 1)))
        base, edited = base + suf, edited + suf
    return base, edited


def binomial_corpus(rng: np.random.Generator, n: int) -> list[bytes]:
    """Taxanames-style binomial names ('Genus species'), letter-frequency
    letters like the reference's generator (tests/taxanames is a 111,065-name
    corpus of this shape) — vectorized for speed."""
    g_len = rng.integers(5, 13, n)
    s_len = rng.integers(4, 15, n)
    total = int((g_len + s_len).sum())
    letters = rng.choice(26, size=total, p=_FREQ)
    lookup = np.frombuffer(_LETTERS.encode(), np.uint8)
    buf = lookup[letters]
    names = []
    pos = 0
    for i in range(n):
        g = buf[pos : pos + g_len[i]].tobytes()
        pos += int(g_len[i])
        s = buf[pos : pos + s_len[i]].tobytes()
        pos += int(s_len[i])
        names.append((g[:1].upper() + g[1:]) + b" " + s)
    return names
