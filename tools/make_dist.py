"""Build dist/levenshtein_spark.zip for spark-submit --py-files.

    python tools/make_dist.py [--out dist/levenshtein_spark.zip]

The zip contains the package sources only (no tests, no caches), laid out so
executors can `import levenshtein_spark` — the cluster deployment path the
jobs/ entry points document (north_rule: run via spark-submit --py-files).
The archive is deterministic (fixed timestamps, sorted entries) so re-builds
of identical sources are byte-identical — CI artifact caching and checksum
pinning both work.
"""

from __future__ import annotations

import argparse
import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str) -> int:
    pkg = os.path.join(REPO, "levenshtein_spark")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    entries = []
    for base, dirs, files in os.walk(pkg):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(base, f)
                entries.append((full, os.path.relpath(full, REPO)))
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for full, rel in entries:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            with open(full, "rb") as fh:
                z.writestr(info, fh.read())
    return len(entries)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "levenshtein_spark.zip"))
    args = ap.parse_args()
    n = build(args.out)
    print(f"{args.out}: {n} files")
    return 0


if __name__ == "__main__":
    sys.exit(main())
