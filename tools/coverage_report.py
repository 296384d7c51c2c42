"""Line-coverage harness over the test suite (reference bar: >= 95%
line coverage enforced with cargo-llvm-cov, /root/reference/README.md:82,
zscripts/coverage.bash).

pytest-cov/coverage.py are not installed in this image, so this uses
CPython 3.12's ``sys.monitoring`` (PEP 669) directly: each (code, line)
pair fires ONE event and is then disabled (the callback returns
``sys.monitoring.DISABLE``), so the steady-state overhead is near zero
and the full suite runs at normal speed.

"Possible" lines are taken from the compiled code objects' line tables
(``co_lines`` over the module code and every nested code object) — the
same universe the monitor reports against, excluding blanks/comments/
docstring-only lines just as coverage.py does.

Usage:
    python tools/coverage_report.py [pytest args...]
    COVERAGE_FLOOR=80 python tools/coverage_report.py tests/ -q

Writes data/logs/coverage.json and exits non-zero when total coverage
is below COVERAGE_FLOOR (default 88% — the enforced CI gate, VERDICT r4
item 8; ratcheting toward the reference's 95%,
/root/reference/README.md:82).
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "russell_tpu")
sys.path.insert(0, ROOT)

hits: dict = {}


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        hits.setdefault(fn, set()).add(lineno)
    return sys.monitoring.DISABLE


def _possible_lines(path: str) -> set:
    with open(path) as fh:
        src = fh.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _start, _end, line in code.co_lines():
            if line is not None:
                lines.add(line)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def main() -> int:
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "russell-tpu-cov")
    mon.register_callback(tool, mon.events.LINE, _on_line)
    mon.set_events(tool, mon.events.LINE)

    import pytest
    args = sys.argv[1:] or ["tests/", "-q"]
    rc = pytest.main(args)

    mon.set_events(tool, 0)
    mon.free_tool_id(tool)

    per_file = {}
    tot_hit = tot_all = 0
    for dirpath, _dirs, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.join(dirpath, f)
            possible = _possible_lines(path)
            if not possible:
                continue
            got = hits.get(path, set()) & possible
            rel = os.path.relpath(path, ROOT)
            per_file[rel] = {
                "lines": len(possible), "covered": len(got),
                "pct": round(100.0 * len(got) / len(possible), 1),
            }
            tot_hit += len(got)
            tot_all += len(possible)

    total_pct = round(100.0 * tot_hit / max(tot_all, 1), 2)
    out = {"total_pct": total_pct, "covered": tot_hit, "lines": tot_all,
           "pytest_exit": int(rc), "files": per_file}
    os.makedirs(os.path.join(ROOT, "data", "logs"), exist_ok=True)
    with open(os.path.join(ROOT, "data", "logs", "coverage.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)
    width = max(len(k) for k in per_file)
    for rel, rec in sorted(per_file.items(), key=lambda kv: kv[1]["pct"]):
        print(f"{rel:<{width}} {rec['covered']:>5}/{rec['lines']:<5} "
              f"{rec['pct']:>5.1f}%")
    print(f"TOTAL {tot_hit}/{tot_all} = {total_pct}%")
    floor = float(os.environ.get("COVERAGE_FLOOR", "88"))
    if int(rc) != 0:
        return int(rc)
    if total_pct < floor:
        print(f"coverage {total_pct}% below floor {floor}%",
              file=sys.stderr)
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
