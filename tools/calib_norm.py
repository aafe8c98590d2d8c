#!/usr/bin/env python3
"""Calibration-normalized round-over-round bench deltas (VERDICT r14 #8).

The bench emits `calib_sec`: wall times of a fixed-cost CPU-only probe
(bit_xor(xxhash64) over a 256M range) measured once per pass. The probe
moves only with host conditions, never with engine code, so the ratio
min(calib_prev)/min(calib_now) estimates how much of a raw speedup is
host, not code.

Usage: tools/calib_norm.py PREV_BENCH.json NOW_BENCH.json

Emits one JSON object: raw and calib-normalized totals + per-query
speedups for queries present in both files. Normalization model:
normalized_now = now_sec * (calib_prev_min / calib_now_min) — i.e. we
re-express "now" as if it had run under the previous round's host
conditions before computing speedups. When either file lacks calib_sec
(pre-r14 records), normalized fields are null and only raw is emitted.
"""
import json
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    prev, now = load(sys.argv[1]), load(sys.argv[2])
    cp = min(prev["calib_sec"]) if prev.get("calib_sec") else None
    cn = min(now["calib_sec"]) if now.get("calib_sec") else None
    # host factor > 1 means "now" ran on a quieter host than "prev"
    host = (cp / cn) if (cp and cn) else None
    qp, qn = prev.get("queries", {}), now.get("queries", {})
    common = sorted(set(qp) & set(qn))
    per = {}
    for q in common:
        raw = qp[q] / qn[q] if qn[q] else None
        per[q] = {
            "prev_sec": qp[q],
            "now_sec": qn[q],
            "speedup_raw": round(raw, 3) if raw else None,
            "speedup_calib_norm": round(raw / host, 3) if (raw and host) else None,
        }
    tot_raw = prev["value"] / now["value"] if now.get("value") else None
    out = {
        "calib_prev_min": cp,
        "calib_now_min": cn,
        "host_factor_prev_over_now": round(host, 3) if host else None,
        "total_speedup_raw": round(tot_raw, 3) if tot_raw else None,
        "total_speedup_calib_norm":
            round(tot_raw / host, 3) if (tot_raw and host) else None,
        "note": "speedup_calib_norm = raw speedup divided by the host factor; "
                "values near 1.0 after normalization mean the raw delta was "
                "host conditions, not code",
        "per_query": per,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
