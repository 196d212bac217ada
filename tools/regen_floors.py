#!/usr/bin/env python3
"""Regenerate bench_local/FLOORS.json from full Bench dumps (dev tool;
the engine itself has no Python dependency).

Usage: regen_floors.py <out.json> <bench1.json> [bench2.json ...]

FLOORS.json is Bench's storm detector: the per-query minimum across the
named session runs. Regenerating it is a TOOL RUN over named artifacts,
not a hand edit — the inputs are recorded in the output header so a floor
can always be traced to the run that set it. Rows reported as -1 (errors)
and rows absent from a run are ignored; a query present in no input is
absent from the output (Bench skips the check and the next regeneration
seeds it).
"""
import json, re, sys, os


def main(out, paths):
    floors, src, cpus = {}, {}, set()
    for p in paths:
        with open(p) as f:
            d = json.loads(f.read().strip().splitlines()[0])
        m = re.match(r"local\[(\d+)\]", d.get("master", ""))
        cpus.add(int(m.group(1)) if m else 32)
        for q, v in d.get("queries", {}).items():
            if not isinstance(v, (int, float)) or v <= 0:
                continue
            if q not in floors or v < floors[q]:
                floors[q] = v
                src[q] = os.path.basename(p)
    if len(cpus) > 1:
        sys.exit(f"refusing to mix runs at different core counts: {sorted(cpus)}")
    body = ",\n".join(f'  "{q}": {floors[q]}' for q in sorted(floors))
    hdr = ", ".join(os.path.basename(p) for p in paths)
    # "_cpus" records the core count the minima were measured at; Bench
    # scales its thresholds by (floorCpus/cpus) when run at fewer cores
    # (the driver's scaling pass), so healthy slower rows are not flagged.
    with open(out, "w") as f:
        f.write('{\n  "_inputs": "%s",\n  "_cpus": %d,\n%s\n}\n'
                % (hdr, cpus.pop() if cpus else 32, body))
    print(f"{out}: {len(floors)} floors from {len(paths)} runs")
    worst = sorted(floors, key=floors.get, reverse=True)[:8]
    for q in worst:
        print(f"  {q}: {floors[q]} ({src[q]})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
