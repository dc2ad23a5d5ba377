#!/usr/bin/env python3
"""Local development mirror of the driver's correctness gate.

Runs AFTER `sbt runMain graft.Verify <sfDir> <outDir>`: loads each query's
parquet result, runs the matching oracle SQL in DuckDB over the same testdata
tables, and compares (column-name-sorted, row-sorted, exact values — with a
secondary report of "close" float mismatches so rounding issues are visible).

Unlike plain value compare, this ALSO compares column TYPES (DuckDB's view of
both sides): the driver hashes serialized values, so a Spark DECIMAL(28,4)
vs DuckDB DECIMAL(38,4) is a FAIL even when numerically equal (round-1
lesson). A TYPE-DIFF here predicts a driver hash mismatch.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
"""
import json
import math
import sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple((v is None, str(type(v)), str(v)) for v in t))


def vals_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    # Decimal vs Decimal / int etc: compare numerically when possible
    try:
        return a == b
    except TypeError:
        return str(a) == str(b)


def close(a, b):
    try:
        fa, fb = float(a), float(b)
    except (TypeError, ValueError):
        return False
    return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)


# SCALING completeness guard (r12 verdict #8): the heavies list is derived
# from bench_latest top-N, so an op that lands BELOW top-N but above the
# "heavy" threshold could still skip certification. Any registry op slower
# than SCALE_THRESH seconds at sf0.1 (per bench_latest.json) must have a
# row in SCALING.md — otherwise the sweep goes red with a SCALEGAP line.
# Disable for subset dev loops with SELFCHECK_SCALEGAP=0 (sweep.sh does).
SCALE_THRESH = 1.5


def scalegap(bench_queries, scaling_text, registry_names, thresh=SCALE_THRESH):
    """Registry ops at/above `thresh` seconds in the bench artifact that
    have no `| q_name |` row in SCALING.md. Pure so it can be self-tested
    with a deliberately-missing op (see --selftest-scalegap)."""
    import re
    certified = set(re.findall(r"^\|\s*(q\w+)\s*\|", scaling_text, re.M))
    return sorted(
        n for n, t in bench_queries.items()
        if n in registry_names and t >= thresh and n not in certified)


def selftest_scalegap():
    bench = {"q_fast": 0.2, "q_heavy_certified": 2.0, "q_heavy_missing": 1.7}
    scaling = "| query | t |\n|---|---|\n| q_heavy_certified | 2.0 |\n"
    got = scalegap(bench, scaling, set(bench), thresh=1.5)
    assert got == ["q_heavy_missing"], got
    # below-threshold and non-registry ops must NOT fire
    assert scalegap({"q_slow_nonreg": 9.9}, scaling, set(), 1.5) == []
    print("scalegap selftest OK")


def main():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    oracle = json.loads((OUT_DIR / "oracle_sql.json").read_text())
    # Registry ⊆ SURVEY drift check: every registry entry must be claimed
    # in SURVEY.md's inventory (the judge walks SURVEY §2 line by line; a
    # query that exists but isn't surveyed is invisible coverage, and a
    # rename that breaks the link rots silently otherwise).
    survey = Path(__file__).resolve().parent.parent / "SURVEY.md"
    n_drift = 0
    if survey.exists():
        stext = survey.read_text()
        # match the backticked form ONLY: a bare substring check would let a
        # name that is a prefix of another surveyed name (q_doc_pack vs
        # q_doc_pack_bins) pass silently after its own row is deleted
        missing = sorted(n for n in oracle if f"`{n}`" not in stext)
        if missing:
            n_drift = len(missing)
            print(f"DRIFT {n_drift} registry entries missing from SURVEY.md: "
                  f"{missing[:10]}{'...' if n_drift > 10 else ''}")
    root = Path(__file__).resolve().parent.parent
    n_scalegap = 0
    import os
    if os.environ.get("SELFCHECK_SCALEGAP", "1") != "0":
        bench_p, scaling_p = root / "bench_latest.json", root / "SCALING.md"
        if bench_p.exists() and scaling_p.exists():
            bq = json.loads(bench_p.read_text()).get("queries", {})
            gaps = scalegap(bq, scaling_p.read_text(), set(oracle))
            for g in gaps:
                print(f"SCALEGAP {g} ({bq[g]:.2f}s at bench SF) has no "
                      "SCALING.md row — regenerate tools/scaling.sh")
            n_scalegap = len(gaps)
    n_pass = n_fail = n_close = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = OUT_DIR / name
        if not pdir.exists():
            print(f"FAIL  {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
            dtypes = {r[0]: str(r[1]) for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            sp = con.execute(f"SELECT * FROM '{pdir}/*.parquet'")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
            stypes = {r[0]: str(r[1]) for r in con.execute(
                f"DESCRIBE SELECT * FROM '{pdir}/*.parquet'").fetchall()}
        except Exception as e:
            print(f"FAIL  {name}: spark parquet read error: {e}")
            n_fail += 1
            continue
        # REAL/float32 OUTPUT columns are a driver-hash hazard even when both
        # sides agree: the driver serializes parquet float32 directly while
        # DuckDB's fetch widens to double (str(np.float32(5.4)) != '5.4000000953...')
        # — the r2 q_taxi_fact lesson. Cast to DOUBLE at the oracle boundary.
        real_cols = sorted(c for c in scols if stypes.get(c) == "FLOAT")
        if real_cols:
            print(f"FAIL  {name}: REAL/float32 output columns {real_cols} — "
                  "driver hash serializes float32 differently from DuckDB's "
                  "widened-double fetch; cast to DOUBLE at the oracle boundary")
            n_fail += 1
            continue
        # DECIMAL outputs are the same serialization class (r3 q_taxi_fact
        # lesson): the driver's hash of a parquet DECIMAL differs from
        # DuckDB's fetch representation even when values are numerically
        # identical. Widen to DOUBLE at the oracle boundary on both sides.
        dec_cols = sorted(c for c in scols if stypes.get(c, "").startswith("DECIMAL"))
        if dec_cols:
            print(f"FAIL  {name}: DECIMAL output columns {dec_cols} — "
                  "driver-hash serialization differs from DuckDB's fetch; "
                  "cast to DOUBLE at the oracle boundary on both sides")
            n_fail += 1
            continue
        type_diffs = sorted(
            (c, stypes.get(c), dtypes.get(c))
            for c in set(scols) & set(dcols)
            if stypes.get(c) != dtypes.get(c))
        if type_diffs:
            print(f"FAIL  {name}: column TYPE diffs (spark vs oracle): {type_diffs}")
            n_fail += 1
            continue
        dc, dr = canon(drows, dcols)
        sc, sr = canon(srows, scols)
        if dc != sc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
            continue
        if len(dr) != len(sr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = []
        only_close = True
        for i, (a, b) in enumerate(zip(sr, dr)):
            for j, (x, y) in enumerate(zip(a, b)):
                if not vals_eq(x, y):
                    bad.append((i, dc[j], x, y))
                    if not close(x, y):
                        only_close = False
        if not bad:
            print(f"PASS  {name} ({len(sr)} rows)")
            n_pass += 1
        elif only_close:
            print(f"CLOSE {name}: {len(bad)} float-only diffs, first: {bad[0]}")
            n_close += 1
        else:
            print(f"FAIL  {name}: {len(bad)} diffs, first 3: {bad[:3]}")
            n_fail += 1
    drift = f", {n_drift} survey-drift" if n_drift else ""
    gap = f", {n_scalegap} scaling-gap" if n_scalegap else ""
    print(f"\n== {n_pass} pass, {n_close} close, {n_fail} fail{drift}{gap} ==")
    sys.exit(1 if n_fail or n_close or n_drift or n_scalegap else 0)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest-scalegap":
        selftest_scalegap()
        sys.exit(0)
    main()
