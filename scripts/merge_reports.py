"""Merge per-case entries from one battery report into another.

Used when battery cases run as parallel partial invocations writing to
separate report files (avoiding concurrent read-modify-write races on
results/report.json): the source file's cases overwrite the target's.

  python scripts/merge_reports.py <source.json> [target.json]
"""

import json
import os
import sys


def main():
    src_path = sys.argv[1]
    dst_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "results",
        "report.json")
    with open(src_path) as f:
        src = json.load(f)
    if not isinstance(src, dict) or not isinstance(src.get("cases"), dict):
        raise SystemExit(f"{src_path} is not a battery report "
                         "(expected a dict with a 'cases' dict)")
    dst = {"quick": src.get("quick", False), "cases": {}}
    if os.path.exists(dst_path):
        with open(dst_path) as f:
            dst = json.load(f)
        if not isinstance(dst, dict):
            raise SystemExit(f"{dst_path} is not a battery report dict; "
                             "refusing to clobber it — fix or remove it")
        dst.setdefault("cases", {})
        if not isinstance(dst["cases"], dict):
            raise SystemExit(f"{dst_path} has a malformed 'cases' entry")
    if bool(dst.get("quick")) != bool(src.get("quick")):
        raise SystemExit("refusing to merge quick and full reports")
    dst["cases"].update(src.get("cases", {}))
    tmp = dst_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(dst, f, indent=1)
    os.replace(tmp, dst_path)
    n_pass = sum(1 for c in dst["cases"].values() if c.get("passed"))
    print(f"merged {len(src.get('cases', {}))} case(s) from {src_path}; "
          f"{dst_path}: {n_pass}/{len(dst['cases'])} passing")


if __name__ == "__main__":
    main()
