#!/usr/bin/env python3
"""Convert tools/check_oracle.py stdout into the committed verify-soak
JSONL artifact format (dev tool, driver-independent).

Usage: python3 tools/verify_soak_to_jsonl.py <check_oracle_stdout> <out.jsonl> <header_json>
"""
import json, re, sys

def main(inp, out, header):
    lines = [json.loads(header)]
    ok = bad = 0
    for ln in open(inp):
        m = re.match(r"OK\s+(\S+) \((\d+) rows\)", ln)
        if m:
            lines.append({"q": m.group(1), "hash_match": True, "rows": int(m.group(2))})
            ok += 1
            continue
        m = re.match(r"(MISMATCH|SHAPE|COLUMNS|MISSING|ORACLE-ERR|DTYPE)\s+(\S+?):?\s", ln)
        if m:
            lines.append({"q": m.group(2), "hash_match": False,
                          "kind": m.group(1), "detail": ln.strip()[:300]})
            bad += 1
    lines.append({"summary": {"ok": ok, "bad": bad}})
    with open(out, "w") as f:
        for d in lines:
            f.write(json.dumps(d) + "\n")
    print(f"{out}: {ok} ok, {bad} bad")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
