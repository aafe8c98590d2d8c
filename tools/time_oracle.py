#!/usr/bin/env python3
"""Time the DuckDB oracles at a given scale factor — the honest
denominator for the bench ratio. Materializes every result fully
(fetchall), mirroring the engine side's noop-sink write which evaluates
every output column. Two passes after a warmup; per-query MIN summed.

Usage: python3 tools/time_oracle.py [sf_dir] [oracle_sql.json] [threads]
"""
import json, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
    threads = sys.argv[3] if len(sys.argv) > 3 else "32"
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))

    def run_pass():
        times = {}
        for name, sql in sorted(oracle.items()):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
                times[name] = time.time() - t0
            except Exception as e:
                times[name] = float("nan")
                print(f"[oracle-time] {name} FAILED: {e}", file=sys.stderr)
        return times

    run_pass()  # warmup
    p1, p2 = run_pass(), run_pass()
    best = {k: min(p1[k], p2[k]) for k in p1}
    total = sum(v for v in best.values() if v == v)
    top = sorted(best.items(), key=lambda kv: -kv[1])[:20]
    print(json.dumps({"total_sec": round(total, 3), "n": len(best),
                      "sf": sf_dir,
                      "top": {k: round(v, 3) for k, v in top},
                      "queries": {k: round(v, 4) for k, v in best.items()}}))


if __name__ == "__main__":
    main()
