#!/usr/bin/env python3
"""Third-engine validation of the DSIR integer log law (dev tooling
only — NOT part of the engine).

The law's cross-engine guarantee is BY CONSTRUCTION: Spark's IlogMicro
expression and the DuckDB twins evaluate the same integer recurrence
over the same interpolated constants. This script closes the remaining
trust gap — "is the emitted recurrence actually the recurrence, and is
it actually a log?" — by re-implementing it in a third engine (pure
Python bignum integers) with the constants extracted VERBATIM from a
Verify-dumped oracle_sql.json, then asserting:

  1. accuracy: |ilog(n)/1e6 - ln(n)| <= 1e-6 over a dense + random +
     edge-case domain sample (the IlogMicroSpec contract, re-proven
     with an independent libm and an independent implementation);
  2. DuckDB agreement: evaluating the emitted SQL fragment in DuckDB
     equals the Python recurrence bit-for-bit on the same sample.

Usage: python3 tools/ilog_check.py <verify_out_dir>
  (a dir written by `runMain graft.Verify ... <dir>` — it must contain
   oracle_sql.json with a dsir entry)
Exit 0 only if both checks pass.
"""
import json
import math
import os
import random
import re
import sys


def extract_constants(sql):
    """Pull (LN2_Q40, table[256]) out of the first ilog emission in the
    oracle SQL — the literals both engines consume."""
    m = re.search(r"ev \* (\d+) \+ \(\[([-0-9, ]+)\]\)", sql)
    if not m:
        raise SystemExit("no ilog emission found in the oracle SQL")
    ln2 = int(m.group(1))
    tab = [int(x) for x in m.group(2).split(",")]
    if len(tab) != 256:
        raise SystemExit(f"ilog table has {len(tab)} entries, want 256")
    return ln2, tab


def make_ilog(ln2, tab):
    def ilog(n):
        assert 1 <= n < (1 << 62), n
        e = n.bit_length() - 1
        mq = n << (61 - e)
        hi = mq >> 53
        d = mq - (hi << 53)
        zq = d // (hi << 13)
        zh = zq >> 6
        total = e * ln2 + tab[hi - 256] + zq - ((zh * zh) >> 29)
        return ((total >> 14) * 1000000 + (1 << 25)) >> 26
    return ilog


def sample_domain():
    rnd = random.Random(7)
    xs = list(range(1, 20000))
    xs += [1 << k for k in range(62)]
    xs += [(1 << k) - 1 for k in range(1, 62)]
    xs += [(1 << k) + 1 for k in range(1, 61)]
    xs += [rnd.randrange(1, (1 << 62) - 1) for _ in range(20000)]
    xs += [2 * rnd.randrange(0, 1 << 60) + 1 for _ in range(5000)]
    return xs


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    src = oracle.get("d_dsir_weights") or oracle.get("d_dsir_kl")
    if not src:
        raise SystemExit("oracle_sql.json has no dsir entry")
    ln2, tab = extract_constants(src)
    ilog = make_ilog(ln2, tab)

    xs = sample_domain()
    worst = 0.0
    for n in xs:
        err = abs(ilog(n) - math.log(n) * 1e6)
        worst = max(worst, err)
        if err > 1.0:
            print(f"[ilog-check] FAIL accuracy: n={n} err={err}")
            return 1
    print(f"[ilog-check] accuracy ok: worst |ilog - ln*1e6| = {worst:.4f} "
          f"over {len(xs)} samples")

    import duckdb
    con = duckdb.connect()
    frag_m = re.search(r"CAST\(list_transform.*?\)\[1\] AS BIGINT\)",
                       src, re.S)
    if not frag_m:
        raise SystemExit("could not isolate the ilog SQL fragment")
    frag = frag_m.group(0)
    inner = re.search(r"list_transform\(\[CAST\(\((.*?)\) AS BIGINT\)\]",
                      frag, re.S).group(1)
    duck_sample = [int(x) for x in random.Random(11).sample(xs, 2000)]
    con.execute(
        "CREATE TABLE t AS SELECT CAST(n AS BIGINT) AS n "
        "FROM (SELECT unnest(?) AS n)", [duck_sample])
    frag_n = frag.replace(inner, "n")
    rows = con.execute(f"SELECT n, {frag_n} FROM t").fetchall()
    bad = [(n, got, ilog(n)) for n, got in rows if got != ilog(n)]
    if bad:
        print(f"[ilog-check] FAIL duckdb agreement: {bad[:3]}")
        return 1
    print(f"[ilog-check] duckdb agreement ok over {len(rows)} samples "
          "(emitted fragment == python recurrence, bit-for-bit)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
