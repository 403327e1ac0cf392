#!/usr/bin/env python
"""Difflib contiguous-block sweep of repo .py files vs every reference
.py file (incl. _legacy/): reports the longest identical block of
substantive lines per (repo file, ref file) pair.  Mirrors the judge's
de-copy criterion (VERDICT r3 item 5: max block must be <8 for every
non-schema file)."""
import difflib
import os
import re
import sys

REPO = "/root/repo/bionumpy_tpu"
REF = "/root/reference/bionumpy"

# schema-constrained files the judge rules category (b): skip
SKIP = {
    "datatypes/__init__.py", "datatypes/gtf.py",
    "encodings/alphabet_encoding.py", "io/jaspar.py",
}


def substantive(path):
    out = []
    for line in open(path, encoding="utf-8", errors="replace"):
        s = line.strip()
        if not s or s.startswith("#"):
            continue
        out.append(s)
    return out


def pyfiles(root):
    for dp, _, fns in os.walk(root):
        for fn in fns:
            if fn.endswith(".py"):
                yield os.path.join(dp, fn)


def main(min_block=8):
    refs = {p: substantive(p) for p in pyfiles(REF)}
    flagged = []
    for rp in sorted(pyfiles(REPO)):
        rel = os.path.relpath(rp, REPO)
        if rel in SKIP:
            continue
        mine = substantive(rp)
        if not mine:
            continue
        best = (0, None)
        for fp, theirs in refs.items():
            if not theirs:
                continue
            sm = difflib.SequenceMatcher(None, mine, theirs, autojunk=False)
            for m in sm.get_matching_blocks():
                if m.size > best[0]:
                    best = (m.size, (fp, m.a, m.b))
        if best[0] >= min_block:
            fp, a, b = best[1]
            flagged.append((best[0], rel, os.path.relpath(fp, REF), a + 1))
    flagged.sort(reverse=True)
    for size, rel, refrel, lineno in flagged:
        print(f"{size:3d}  {rel}  <-  {refrel}  (around substantive "
              f"line {lineno})")
    if not flagged:
        print(f"clean: no identical block >= {min_block} substantive lines")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 8))
