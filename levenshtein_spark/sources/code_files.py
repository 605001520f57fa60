"""Deterministic synthetic ``code_files`` table — the pipeline's input.

Schema is exactly BASELINE.json ``input_hint``::

    repo:string, path:string, commit:string, lang:string, content:string

Generation is a pure function of ``(seed, cluster_id)`` so the table is
reproducible at any scale and **distributed**: the Spark wrapper fans a
``spark.range(num_clusters)`` out through ``mapInPandas`` and each task
generates its own clusters — no driver-side materialization, which is what
lets the same generator feed both the 300-row pytest fixture and the
multi-million-row bench corpus.

Workload shape mirrors the reference benchmark generator
(``tests/edit_operations.cpp:60-130``, ``tests/benchmark.cpp:208-220``:
mangled copies of base words) re-imagined for source files, with the
fixture properties FIXTURES.md §2 requires: variant rows within OSA
distance <= 5 of their base, ~10% exact duplicates (sha256 short-circuit),
~30% distractor singletons (hard negatives), and one hot repo holding ~30%
of rows (skew for salted repartitioning).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SCHEMA = "repo string, path string, commit string, lang string, content string"

_LANGS = ["python", "java", "cpp", "js"]
_EXT = {"python": ".py", "java": ".java", "cpp": ".cc", "js": ".js"}
_LETTERS = "abcdefghijklmnopqrstuvwxyz"
_KEYWORDS = {
    "python": ["def", "return", "import", "class", "self", "for", "in", "if"],
    "java": ["public", "class", "void", "return", "new", "static", "final", "int"],
    "cpp": ["include", "void", "return", "const", "int", "auto", "namespace", "template"],
    "js": ["function", "const", "return", "let", "var", "export", "import", "async"],
}

HOT_REPO = "repo-hot/monolith"


def _word(rng: np.random.Generator, lo: int = 3, hi: int = 9) -> str:
    n = int(rng.integers(lo, hi))
    return "".join(_LETTERS[i] for i in rng.integers(0, 26, n))


def _hexid(*parts) -> str:
    return hashlib.sha256("|".join(str(p) for p in parts).encode()).hexdigest()[:12]


def _content(rng: np.random.Generator, lang: str, n_tokens: int) -> str:
    kw = _KEYWORDS[lang]
    toks = []
    for _ in range(n_tokens):
        if rng.random() < 0.3:
            toks.append(kw[int(rng.integers(0, len(kw)))])
        else:
            toks.append(_word(rng))
        if rng.random() < 0.12:
            toks.append("\n")
    return " ".join(toks)


def _apply_edits(rng: np.random.Generator, s: str, n_edits: int) -> str:
    """1..5 random single-char edits (transpose/delete/insert/substitute) —
    the mangle step of the reference benchmark (edit_operations.cpp:194-219)."""
    chars = list(s)
    for _ in range(n_edits):
        op = int(rng.integers(0, 4))
        if not chars:
            op = 2
        if op == 0 and len(chars) >= 2:  # transpose
            i = int(rng.integers(0, len(chars) - 1))
            chars[i], chars[i + 1] = chars[i + 1], chars[i]
        elif op == 1 and chars:  # delete
            del chars[int(rng.integers(0, len(chars)))]
        elif op == 2:  # insert
            chars.insert(int(rng.integers(0, len(chars) + 1)), _LETTERS[int(rng.integers(0, 26))])
        elif chars:  # substitute
            chars[int(rng.integers(0, len(chars)))] = _LETTERS[int(rng.integers(0, 26))]
    return "".join(chars)


def generate_cluster_rows(cluster_id: int, seed: int = 42) -> list[dict]:
    """All rows of one cluster — pure function of (seed, cluster_id)."""
    rng = np.random.default_rng([seed, cluster_id])
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]
    is_distractor = rng.random() < 0.30

    hot = rng.random() < 0.30
    repo = HOT_REPO if hot else f"repo-{_word(rng, 4, 8)}/{_word(rng, 4, 10)}"

    dirs = "/".join(_word(rng, 3, 8) for _ in range(int(rng.integers(1, 4))))
    base_name = _word(rng, 5, 12)
    path = f"{dirs}/{base_name}{_EXT[lang]}"
    content = _content(rng, lang, int(rng.integers(40, 400)))
    rows = [
        {
            "repo": repo,
            "path": path,
            "commit": _hexid(seed, cluster_id, 0),
            "lang": lang,
            "content": content,
        }
    ]
    if is_distractor:
        return rows  # singleton, possibly sharing lang/length band with clusters

    n_variants = int(rng.integers(1, 7))
    for v in range(1, n_variants + 1):
        r = dict(rows[0])
        r["commit"] = _hexid(seed, cluster_id, v)
        if rng.random() < 0.20:  # some variants live in another repo
            r["repo"] = f"repo-{_word(rng, 4, 8)}/{_word(rng, 4, 10)}"
        if rng.random() < 0.25:
            # exact duplicate: identical content, different path/commit
            r["path"] = f"{dirs}/{_apply_edits(rng, base_name, 1)}{_EXT[lang]}"
        else:
            n_edits = int(rng.integers(1, 6))
            new_name = _apply_edits(rng, base_name, n_edits)
            r["path"] = f"{dirs}/{new_name}{_EXT[lang]}"
            # edit the content head too (prefix is what gets scored)
            head, tail = content[:80], content[80:]
            r["content"] = _apply_edits(rng, head, n_edits) + tail
        rows.append(r)
    return rows


def code_files_df(
    spark: SparkSession, num_clusters: int = 60, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic code_files table of ~num_clusters*3.2 rows."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for cid in pdf["id"].tolist():
                out.extend(generate_cluster_rows(int(cid), seed))
            yield pd.DataFrame(out, columns=["repo", "path", "commit", "lang", "content"])

    rng_parts = partitions or max(2, num_clusters // 200)
    return spark.range(num_clusters, numPartitions=rng_parts).mapInPandas(gen, SCHEMA)
