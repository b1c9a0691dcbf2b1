#!/usr/bin/env python3
"""parity.py with per-query wall timing, a per-query timeout, and
unbuffered progress — for the sf0.1 gate, where a DuckDB oracle (not the
engine) can be the bottleneck and a silent multi-hour run tells nobody
anything.

Usage: python3 tools/parity_timed.py <sfDir> <verifyOutDir> [timeoutSec] [only,names]

Each oracle runs in a fresh worker process killed at the timeout; a
timeout is reported as ORACLE-TIMEOUT (a statement about the DuckDB
mirror's cost, not about engine correctness).
"""
import sys, os, json, glob, time
import multiprocessing as mp

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_oracle(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    df = con.execute(sql).df()
    q.put(df)


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir, out_dir, timeout, only):
    import pandas as pd
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_to = 0
    for name in sorted(os.listdir(out_dir)):
        d = f"{out_dir}/{name}"
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows", flush=True)
            continue
        t0 = time.time()
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sf_dir, oracle[name], q))
        p.start()
        exp = None
        try:
            exp = q.get(timeout=timeout)
        except Exception:
            pass
        p.join(1)
        if p.is_alive():
            p.terminate()
            p.join()
        dt = time.time() - t0
        if exp is None:
            print(f"ORACLE-TIMEOUT {name} after {dt:.0f}s (engine rows: {len(got)})", flush=True)
            n_to += 1
            continue
        g, e = canon(got), canon(exp)
        ok = list(g.columns) == list(e.columns) and len(g) == len(e)
        if ok:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            except AssertionError:
                ok = False
        if ok:
            print(f"PASS {name} ({len(g)} rows, {dt:.1f}s oracle)", flush=True)
            n_pass += 1
        else:
            print(f"FAIL {name}: engine {len(g)}x{list(g.columns)} vs oracle {len(e)}x{list(e.columns)} ({dt:.1f}s)", flush=True)
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_to} oracle-timeout ==", flush=True)


if __name__ == "__main__":
    sf, out = sys.argv[1], sys.argv[2]
    to = int(sys.argv[3]) if len(sys.argv) > 3 else 900
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    main(sf, out, to, only)
