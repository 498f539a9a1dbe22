"""Compose the N-vs-4N scaling-efficiency estimate from bench runs.

Reads hunter/bench JSON-lines logs (one bench result per line, each with
``arm_cpus``, ``phases`` {analyze, postings} seconds, ``phase_steal``
busy-normalized steal %, and whole-run ``steal_busy_pct``) and reports:

- whole-run estimator: median build wall of runs whose RUN steal is
  under the gate, per arm;
- phase-composed estimator: per PHASE, the median of samples whose
  PHASE steal is under the gate — a run crushed by a steal burst in one
  phase still contributes a clean measurement of the other. Build walls
  are the sums of the phase medians (the build is two sequential
  phases; glue between them is <2 s and counted into neither).

This is the sandbox stand-in protocol for the north_rule's two-cluster
criterion on a host with multi-minute noisy-neighbor bursts (see
BASELINE.md). Usage:

    python tools/scaling_report.py /tmp/scaling_hunt.log [more.log ...] \
        [--gate 3.0] [--pair 4,16]
"""

from __future__ import annotations

import json
import statistics
import sys


def load(paths: list[str]) -> list[dict]:
    rows = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "error" not in r and "arm_cpus" in r:
                    rows.append(r)
    return rows


def main() -> None:
    args = [a for a in sys.argv[1:]]
    gate = 3.0
    pair = (4, 16)
    paths = []
    it = iter(args)
    for a in it:
        if a == "--gate":
            gate = float(next(it))
        elif a == "--pair":
            pair = tuple(int(x) for x in next(it).split(","))
        else:
            paths.append(a)
    rows = load(paths)
    lo_n, hi_n = pair
    out: dict = {
        "metric": f"scaling_efficiency_{lo_n}_to_{hi_n}_cpus",
        "steal_gate_pct": gate,
        "runs_per_arm": {},
    }
    arms: dict[int, dict] = {}
    for n in pair:
        # load_max (recorded by the hunter since session 7) taints runs
        # that overlapped the agent's own work — same-host load is
        # invisible to /proc/stat steal
        sel = [r for r in rows if r.get("arm_cpus") == n
               and r.get("load_max", 0) <= n + 3]
        out["runs_per_arm"][str(n)] = len(sel)
        clean = [r for r in sel if r.get("steal_busy_pct", 99) <= gate]
        arm: dict = {}
        if clean:
            walls = [r["queries"]["index_build"] for r in clean]
            arm["whole_run_clean"] = {
                "n": len(clean),
                "median_sec": round(statistics.median(walls), 2),
                "docs_per_sec": round(
                    clean[0]["bench_docs"] / statistics.median(walls), 1
                ),
                "steals": [r["steal_busy_pct"] for r in clean],
            }
        # phase-composed: per-phase clean samples
        composed = {}
        for ph in ("analyze", "postings"):
            samples = [
                r["phases"][ph]
                for r in sel
                if r.get("phase_steal", {}).get(ph, 99) <= gate
                and ph in r.get("phases", {})
            ]
            if samples:
                composed[ph] = {
                    "n": len(samples),
                    "median_sec": round(statistics.median(samples), 2),
                }
        if len(composed) == 2:
            total = sum(v["median_sec"] for v in composed.values())
            arm["phase_composed"] = {
                **composed,
                "build_sec": round(total, 2),
                "docs_per_sec": round(sel[0]["bench_docs"] / total, 1),
            }
        elif composed:
            arm["phase_composed_partial"] = composed
        arms[n] = arm
    out["arms"] = {str(n): arms[n] for n in pair}
    factor = hi_n / lo_n
    for est in ("whole_run_clean", "phase_composed"):
        lo, hi = arms[lo_n].get(est), arms[hi_n].get(est)
        if lo and hi:
            lo_t = lo.get("median_sec") or lo.get("build_sec")
            hi_t = hi.get("median_sec") or hi.get("build_sec")
            out[f"efficiency_{est}"] = round((lo_t / hi_t) / factor, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
