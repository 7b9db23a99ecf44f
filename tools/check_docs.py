"""Guard status docs against drifting from the canonical bench JSON
(VERDICT r4 weak #1 / task #4).

Headline numbers quoted in the markdown status docs carry invisible
HTML-comment markers; this checker re-reads BENCH_DETAIL.json and fails
when a quoted number no longer matches. Marker grammar (the marker
immediately precedes the quoted number, optional markdown ** bold):

  <!-- bench:flagship.value -->277.0            exact-ish match (default 15%)
  <!-- bench:flagship.vs_baseline:25% -->6.52x  explicit tolerance
  <!-- bench-range:flagship.apsol_pct -->45.7-57%   current value must lie
      in [lo - 3, hi + 3] (the % varies with the per-run gather
      calibration; the range quotes both endpoints)

Paths are keys into BENCH_DETAIL.json: <family>.<field>.

Run: python -m tools.check_docs   (exit 1 on any mismatch)
Wired into the suite via tests/test_docs_consistency.py.
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MARKER = re.compile(
    r"<!--\s*(bench|bench-range):([\w.]+)(?::(\d+(?:\.\d+)?)%)?\s*-->"
    r"\s*\*{0,2}\s*"
    r"(-?\d+(?:\.\d+)?)(?:\s*-\s*(-?\d+(?:\.\d+)?))?"
)

DOC_GLOBS = ["*.md", "docs/*.md"]


def lookup(detail, path):
    cur = detail
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def check(detail_path=None, verbose=True):
    detail_path = detail_path or os.path.join(REPO, "BENCH_DETAIL.json")
    with open(detail_path) as f:
        detail = json.load(f)
    failures = []
    n_markers = 0
    for pattern in DOC_GLOBS:
        for path in sorted(glob.glob(os.path.join(REPO, pattern))):
            text = open(path).read()
            rel = os.path.relpath(path, REPO)
            for m in MARKER.finditer(text):
                kind, key, tol, lo, hi = m.groups()
                n_markers += 1
                actual = lookup(detail, key)
                if actual is None:
                    failures.append(
                        f"{rel}: marker '{key}' not found in BENCH_DETAIL.json"
                    )
                    continue
                actual = float(actual)
                if kind == "bench-range" and hi is not None:
                    lo_v, hi_v = float(lo), float(hi)
                    ok = lo_v - 3.0 <= actual <= hi_v + 3.0
                    desc = f"range {lo_v}-{hi_v} (±3 slack)"
                else:
                    quoted = float(lo)
                    tol_f = float(tol) / 100.0 if tol else 0.15
                    ok = abs(actual - quoted) <= tol_f * max(
                        abs(actual), 1e-9
                    )
                    desc = f"quoted {quoted} (tol {tol_f:.0%})"
                status = "ok " if ok else "FAIL"
                if verbose:
                    print(f"{status} {rel}: {key} = {actual} vs {desc}")
                if not ok:
                    failures.append(
                        f"{rel}: {key} = {actual}, doc has {desc}"
                    )
    if n_markers == 0:
        failures.append("no bench markers found in any status doc — the "
                        "drift guard has been disabled")
    return failures, n_markers


def main():
    failures, n = check()
    print(f"\n{n} marker(s) checked")
    if failures:
        print("DOC DRIFT DETECTED:")
        for f in failures:
            print(" -", f)
        sys.exit(1)
    print("status docs agree with BENCH_DETAIL.json")


if __name__ == "__main__":
    main()
