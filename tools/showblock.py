#!/usr/bin/env python
"""Show all identical substantive-line blocks >= N between a repo file
and a reference file (usage: showblock.py repo_rel ref_rel [N])."""
import difflib
import sys

sys.path.insert(0, "/root/repo/tools")
from copysweep import REF, REPO, substantive  # noqa: E402


def main():
    rp = f"{REPO}/{sys.argv[1]}"
    fp = f"{REF}/{sys.argv[2]}"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    mine, theirs = substantive(rp), substantive(fp)
    sm = difflib.SequenceMatcher(None, mine, theirs, autojunk=False)
    for m in sm.get_matching_blocks():
        if m.size >= n:
            print(f"--- block size {m.size} (repo subst line {m.a + 1}, "
                  f"ref subst line {m.b + 1}) ---")
            for line in mine[m.a: m.a + m.size]:
                print("   ", line)


if __name__ == "__main__":
    main()
