#!/usr/bin/env python3
"""sf1 oracle replay runner (VERDICT r18 item 6): run the DuckDB
oracle compare per query with a wall-clock budget, emit
REPLAY_sf1_<round>.json with per-query pass/fail, the Spark-side
completion count, and the documented exclusion lists.

Usage: python3 tools/replay_sf1.py <sfdir> <verify_outdir> <out.json>
         [--budget SECONDS]

Spark-side exclusions (not even dumped): quality gates whose SPARK
side embeds an all-pairs exact truth (quadratic by design, bounded to
the sf0.01 driver gate): q_dedup_embed, q_dedup_semantic,
q_sql_dedup_semantic.

DuckDB-side exclusions are DISCOVERED, not assumed: any oracle whose
compare exceeds the per-query budget (the all-pairs truth recomputes)
is recorded under "duckdb_excluded_timeout" with its elapsed time.
"""
import sys, json, os, subprocess, time

def main():
    sfdir, outdir, outjson = sys.argv[1], sys.argv[2], sys.argv[3]
    budget = 300
    if "--budget" in sys.argv:
        budget = int(sys.argv[sys.argv.index("--budget") + 1])
    qdirs = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    errors = json.load(open(os.path.join(outdir, "errors.json")))
    passed, failed, timed_out = [], {}, {}
    for q in qdirs:
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "tools/check_oracle.py", sfdir, outdir, q],
                capture_output=True, text=True, timeout=budget)
            el = round(time.time() - t0, 1)
            tail = (r.stdout.strip().splitlines() or [""])[-1]
            if f"PASS {q}" in r.stdout:
                passed.append(q)
            else:
                failed[q] = f"{tail[:160]} ({el}s)"
            print(f"{'PASS' if q in passed else 'FAIL'} {q} ({el}s)",
                  flush=True)
        except subprocess.TimeoutExpired:
            el = round(time.time() - t0, 1)
            timed_out[q] = el
            print(f"TIMEOUT {q} ({el}s)", flush=True)
    out = {
        "sf_dir": sfdir,
        "budget_sec_per_query": budget,
        "spark_side": {"ran": len(qdirs), "failed": errors,
                       "excluded_quadratic_gates":
                           ["q_dedup_embed", "q_dedup_semantic",
                            "q_sql_dedup_semantic"]},
        "duckdb_pass": len(passed),
        "duckdb_fail": failed,
        "duckdb_excluded_timeout": timed_out,
    }
    with open(outjson, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"== replay: spark {len(qdirs)} ran / {len(errors)} failed; "
          f"duckdb {len(passed)} pass / {len(failed)} fail / "
          f"{len(timed_out)} over-budget ==")
    sys.exit(1 if (failed or errors) else 0)

if __name__ == "__main__":
    main()
