"""Summarize a full-matrix JSONL into a markdown table + parity counts.

Usage: python benchmarks/summarize_matrix.py benchmarks/full_matrix_r5.jsonl
"""

import json
import sys


def main(path):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    ops, sets = [], []
    cell = {}
    for r in rows:
        s, o = r.get("set"), r.get("op")
        if o in ("__aborted__", "__truncated__", "__setup__"):
            print(f"# WARNING {s} {o}: {r.get('detail')}")
            continue
        if o not in ops:
            ops.append(o)
        if s not in sets:
            sets.append(s)
        cell[(s, o)] = r
    order = [s for s in ("SET_1", "SET_2", "SET_3", "TFHEPP_L2")
             if s in sets] + [s for s in sets
                              if s not in ("SET_1", "SET_2", "SET_3",
                                           "TFHEPP_L2")]
    print("| op | " + " | ".join(order) + " |")
    print("|---|" + "---|" * len(order))
    counts = {}
    for o in ops:
        line = [o]
        for s in order:
            r = cell.get((s, o))
            if r is None:
                line.append("—")
                continue
            m = r.get("match")
            counts[m] = counts.get(m, 0) + 1
            tag = "pass" if r["ok"] else "fail"
            line.append(f"{tag} ({r.get('detail','')}; match={m})")
        print("| " + " | ".join(line) + " |")
    print()
    print("match counts:", json.dumps(counts))
    infra = [k for k, v in cell.items() if v.get("match") == "infra"]
    no = [k for k, v in cell.items() if v.get("match") == "NO"]
    print(f"infra failures: {infra}")
    print(f"unexplained divergences: {no}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "benchmarks/full_matrix_r5.jsonl")
