#!/usr/bin/env python
"""Deterministic manifest hash of a generated dataset tree (VERDICT r4 #3:
pin the procedural quality benchmark). Hashes every file's relative path +
content sha256 into one tree digest, written to <root>/MANIFEST.sha256."""

import hashlib
import os
import sys


def tree_digest(root: str) -> str:
    h = hashlib.sha256()
    n = 0
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn == "MANIFEST.sha256":
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root)
            h.update(rel.encode())
            with open(p, "rb") as f:
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        break
                    h.update(chunk)
            n += 1
    return f"{h.hexdigest()}  ({n} files)"


if __name__ == "__main__":
    root = sys.argv[1]
    digest = tree_digest(root)
    with open(os.path.join(root, "MANIFEST.sha256"), "w") as f:
        f.write(digest + "\n")
    print(f"{root}: {digest}")
