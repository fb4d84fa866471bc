#!/usr/bin/env python3
"""Citation hygiene check (CLAUDE.md invariant 5).

Every `somefile.py:N` or `somefile.py:N-M` cited in Scaladoc/comments under
src/ must resolve to a real file under /root/reference whose line count
covers the cited range. Basenames are resolved anywhere in the reference
tree (the repo cites by basename); an explicit path prefix, when present,
must match a suffix of some reference file's path.

Exit 0 = all citations resolve; exit 1 lists failures.
"""
import os
import re
import sys

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
SRC = sys.argv[2] if len(sys.argv) > 2 else "src"

# index reference .py files: basename -> [(relpath, line_count)]
ref_index = {}
for root, _dirs, files in os.walk(REF):
    for fn in files:
        if not fn.endswith(".py"):
            continue
        p = os.path.join(root, fn)
        with open(p, "rb") as fh:
            n = sum(1 for _ in fh)
        ref_index.setdefault(fn, []).append((os.path.relpath(p, REF), n))

# path[/...]basename.py[:N[-M]]  — path prefix optional
CITE = re.compile(r"([A-Za-z0-9_./-]*?([A-Za-z0-9_]+\.py))(?::(\d+)(?:-(\d+))?)?")

failures = []
checked = 0
for root, _dirs, files in os.walk(SRC):
    for fn in files:
        if not fn.endswith(".scala"):
            continue
        path = os.path.join(root, fn)
        with open(path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                for m in CITE.finditer(line):
                    full, base, a, b = m.group(1), m.group(2), m.group(3), m.group(4)
                    checked += 1
                    where = f"{path}:{lineno}"
                    cands = ref_index.get(base)
                    if not cands:
                        failures.append(f"{where}: `{m.group(0)}` — no file named {base} in {REF}")
                        continue
                    # explicit path prefix must suffix-match a real reference path
                    prefix = full[: -len(base)].strip("/")
                    if prefix:
                        want = prefix + "/" + base
                        cands = [c for c in cands if c[0].endswith(want) or want.endswith(c[0])]
                        if not cands:
                            failures.append(f"{where}: `{m.group(0)}` — path prefix matches no reference file")
                            continue
                    if a is not None:
                        lo, hi = int(a), int(b) if b else int(a)
                        if lo > hi:
                            failures.append(f"{where}: `{m.group(0)}` — inverted range")
                        elif not any(n >= hi for _p, n in cands):
                            longest = max(n for _p, n in cands)
                            failures.append(
                                f"{where}: `{m.group(0)}` — range ends past EOF "
                                f"(longest candidate {longest} lines)")

print(f"{checked} citations checked, {len(failures)} failures")
for f in failures:
    print("FAIL " + f)
sys.exit(1 if failures else 0)
