#!/usr/bin/env python3
"""Build dist/engine.zip for ``spark-submit --py-files``."""

from __future__ import annotations

import os
import sys
import zipfile


def main() -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "pytorch_bert_bilstm_crf_ner_spark")
    dist = os.path.join(repo, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "engine.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, repo))
    print(zpath)
    return zpath


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
