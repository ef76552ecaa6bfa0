"""Build dist/html_parser_spark.zip for spark-submit --py-files.

Pure-stdlib (zipfile) so it runs anywhere the repo does::

    python tools/make_pyfiles.py [out_zip]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip: str) -> int:
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    n = 0
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "html_parser_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
                    n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "html_parser_spark.zip")
    n = build(out)
    print(f"{out}: {n} files")
