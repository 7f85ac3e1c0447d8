#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Dev tooling only (not part of the shipped Scala library). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/verify_out

Strict compare: columns sorted by name, rows sorted by all columns,
cell-by-cell exact equality (floats must match bit-for-bit after the
rounding discipline in the queries). Any mismatch is a future driver
CORRECTNESS failure — fix before committing.
"""
import sys, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# (query name -> column names) allowed to diverge in arrow type between the
# DuckDB oracle and the Spark dump. Empty on purpose: the driver's hash is
# type-sensitive, so every opt-out here is a bet that the driver normalizes
# that divergence. Justify any addition in a comment beside it.
TYPE_OPT_OUT = {}


def canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    def key(t):
        return tuple((v is None, str(type(v)), str(v)) for v in t)
    return sorted(out, key=key), [cols[i] for i in idx]


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    skipped = []
    import os as _os
    # A missing dump dir is only legitimate under Verify's dev-only query
    # filter (opt in with GRAFT_VERIFY_PARTIAL=1); otherwise it means the
    # Spark-side dump failed and must count as a FAIL, not a silent skip.
    allow_partial = _os.environ.get("GRAFT_VERIFY_PARTIAL") == "1"
    for name, sql in sorted(oracle.items()):
        if not _os.path.isdir(f"{out_dir}/{name}"):
            if allow_partial:
                skipped.append(name)
                continue
            print(f"FAIL {name}: no dump dir (Spark-side write failed?)")
            n_fail += 1
            continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
            sp = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if sorted(dcols) != sorted(scols):
            print(f"FAIL {name}: columns duck={sorted(dcols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        # Arrow-level type parity. The driver's hash is TYPE-SENSITIVE:
        # round 8's q118 passed values cell-for-cell but failed the driver
        # on an un-cast HUGEINT, after this gate printed only a WARN. Any
        # type divergence is now a FAIL, except:
        #  - int32 vs int64 and timestamp-unit differences, which the
        #    driver has normalized away across 8 rounds of green runs;
        #  - (query, column) pairs in TYPE_OPT_OUT (currently empty) —
        #    add an entry ONLY with a written justification beside it.
        type_fail = None
        try:
            import pyarrow.parquet as _pq
            import glob as _glob
            dt = {f.name: str(f.type) for f in con.execute(sql).arrow().schema}
            sfile = _glob.glob(f"{out_dir}/{name}/*.parquet")[0]
            st = {f.name: str(f.type) for f in _pq.read_schema(sfile)}
            for c in dt:
                a, b = dt[c], st.get(c, "?")
                if a == b or {a, b} == {"int64", "int32"}:
                    continue
                if a.startswith("timestamp") and b.startswith("timestamp"):
                    continue
                if c in TYPE_OPT_OUT.get(name, ()):
                    print(f"  OPTOUT {name}.{c}: duck={a} spark={b}")
                    continue
                type_fail = (c, a, b)
                break
        except Exception as e:
            print(f"FAIL {name}: type check failed to run: {e}")
            n_fail += 1
            continue
        if type_fail:
            c, a, b = type_fail
            print(f"FAIL {name}: column type col {c}: duck={a} spark={b}")
            n_fail += 1
            continue
        da, cols = canon(drows, dcols)
        sa, _ = canon(srows, scols)
        if len(da) != len(sa):
            print(f"FAIL {name}: rowcount duck={len(da)} spark={len(sa)}")
            n_fail += 1
            continue
        bad = None
        for i, (dr, sr) in enumerate(zip(da, sa)):
            for j, (dv, sv) in enumerate(zip(dr, sr)):
                if not cells_equal(dv, sv):
                    bad = (i, cols[j], dv, sv)
                    break
            if bad:
                break
        if bad:
            i, c, dv, sv = bad
            print(f"FAIL {name}: row {i} col {c}: duck={dv!r} spark={sv!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sa)} rows)")
            n_pass += 1
    # queries without an oracle: rows-only check
    import os
    for d in sorted(os.listdir(out_dir)):
        if d == "oracle_sql.json" or d in oracle:
            continue
        if os.path.isdir(f"{out_dir}/{d}"):
            n = con.execute(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {d}: {n} rows (no oracle)")
    tail = f", {len(skipped)} skipped (partial dump: {', '.join(skipped)})" \
        if skipped else ""
    print(f"\n{n_pass} pass, {n_fail} fail{tail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
