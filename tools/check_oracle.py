#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev feedback loop only;
the library itself has no Python dependency).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (engine result) + oracle_sql.json,
runs each oracle in DuckDB over the sfDir parquet tables, normalizes both
sides per SURVEY.md §2.13 (columns sorted by name, floats %.4f half-even,
decimals as fixed-point strings, timestamps UTC ISO-8601, rows sorted) and
compares.
"""
import sys, os, json, glob, datetime, decimal, re
import duckdb

def norm_cell(v):
    # Strict rendering — no %.4f flattening (the r1/r2 local gate hid the
    # driver's decimal-representation hash failures behind it). Floats use
    # shortest round-trip repr; decimals keep their exact scale, so a
    # trailing-zero or last-ulp difference between engines fails HERE the
    # way it fails at the driver.
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)

def decimal_render_hazards(cols, rows):
    """Cells the driver may hash differently even when both local sides
    agree byte-for-byte: DECIMAL values whose exact-scale rendering
    differs from the float shortest-repr of the same value (trailing-zero
    decimals like 5.00 -> "5.0", or >17-significant-digit scales). The
    driver's q51 red tracked exactly one such cell across rounds 4-5
    (VERDICT r5 #1) while the strict compare here passed."""
    out = []
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, decimal.Decimal):
                try:
                    f = repr(float(v))
                except (ValueError, OverflowError):
                    f = None
                if str(v) != f:
                    out.append((cols[i], str(v)))
    return sorted(set(out))

def norm_result(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

# The driver's hasher tolerates int-width differences (r1: q20 int32 rn vs
# DuckDB BIGINT passed) but renders HUGEINT and differing DECIMAL(p,s)
# differently (r1: q10/q12/q19/q25/q26/q27/q30 all value-equal yet
# hash-failed). Mirror that: exact (p,s) for decimals, one family for all
# plain ints, HUGEINT its own family.
def type_family(t):
    t = t.upper()
    if t.startswith("DECIMAL"):
        return t
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "INT"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "FLOAT"
    return t

def norm_types(cols, typs):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [type_family(typs[i]) for i in order]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: engine result missing"); n_fail += 1; continue
        try:
            etyp = [r[1] for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{res_dir}/*.parquet')"
            ).fetchall()]
            eng = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            ecols = [d[0] for d in eng.description]
            erows = eng.fetchall()
            # multi-statement DML-replay oracles (Q1-Q8): run the prologue,
            # DESCRIBE only the final SELECT (semicolons never appear inside
            # string literals in our declared oracle set)
            stmts = [s for s in oracles[name].split(";") if s.strip()]
            for s in stmts[:-1]:
                con.execute(s)
            otyp = [r[1] for r in con.execute(
                f"DESCRIBE {stmts[-1]}").fetchall()]
            ora = con.execute(stmts[-1])
            ocols = [d[0] for d in ora.description]
            orows = ora.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ec, er = norm_result(ecols, erows)
        oc, orr = norm_result(ocols, orows)
        etf, otf = norm_types(ecols, etyp), norm_types(ocols, otyp)
        # r2 hard lesson: int128-backed outputs (DECIMAL(p>18) / HUGEINT)
        # hash-fail at the driver even when BOTH sides declare the same
        # type and every cell is byte-identical. Fail them here.
        # regex, not split: a parenless "DECIMAL" (or malformed DESCRIBE
        # output) must classify as non-wide, not crash the whole gate
        def _decimal_precision(t):
            m = re.match(r"DECIMAL\((\d+)", t)
            return int(m.group(1)) if m else 0
        wide = [t for t in etf + otf
                if t == "HUGEINT" or (t.startswith("DECIMAL")
                    and _decimal_precision(t) > 18)]
        if wide:
            print(f"FAIL {name}: wide int128-backed output type(s) {set(wide)} "
                  "— driver hash rejects these even when value-equal; "
                  "emit DOUBLE / BIGINT / DECIMAL(<=18) instead")
            n_fail += 1
        elif ec != oc:
            print(f"FAIL {name}: columns differ engine={ec} oracle={oc}")
            n_fail += 1
        elif etf != otf:
            print(f"FAIL {name}: column types differ (driver hash would "
                  f"mismatch)\n   engine: {list(zip(ec, etf))}\n"
                  f"   oracle: {list(zip(oc, otf))}")
            n_fail += 1
        elif er != orr:
            n_fail += 1
            print(f"FAIL {name}: rows differ (engine {len(er)} vs oracle {len(orr)})")
            eset, oset = set(er), set(orr)
            for r in list(eset - oset)[:3]:
                print(f"   engine-only: {r}")
            for r in list(oset - eset)[:3]:
                print(f"   oracle-only: {r}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(er)} rows)")
            hazards = decimal_render_hazards(ecols, erows)
            if hazards:
                print(f"   WARN {name}: decimal cell(s) whose rendering "
                      f"differs from float shortest-repr — the driver may "
                      f"hash these divergently even though this gate "
                      f"passed: {hazards[:5]}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
