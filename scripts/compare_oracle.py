#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 scripts/compare_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the raw tables in <sfDir>,
sorts columns by name and rows by all columns, and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def load_result(con, path):
    files = glob.glob(os.path.join(path, "*.parquet"))
    if not files:
        return None
    return con.execute(
        "SELECT * FROM read_parquet([" + ",".join(f"'{f}'" for f in files) + "])"
    ).fetchdf()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats so int32-vs-int64 and f32-vs-f64 don't flag
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted(set(d for d in os.listdir(out_dir)
                       if os.path.isdir(os.path.join(out_dir, d))) | set(oracle))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        ours = load_result(con, os.path.join(out_dir, name))
        if ours is None:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(ours)} (no oracle)"); n_rowsonly += 1
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        raw_kinds = {c: (ours[c].dtype.kind if c in ours else "?",
                         ref[c].dtype.kind if c in ref else "?")
                     for c in set(ours.columns) | set(ref.columns)}
        a, b = norm(ours), norm(ref)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs oracle {list(b.columns)}")
            n_fail += 1; continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs oracle {len(b)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            # strict pass 2: mimic the driver's value HASH, which is dtype- and
            # bit-sensitive. Catches (a) DuckDB HUGEINT sums surfacing as
            # float64 against Spark's int64, (b) IEEE -0.0 vs +0.0 in rounded
            # doubles — both invisible to value equality but red on the driver.
            strict = []
            for c in a.columns:
                # kinds from the RAW frames: norm()'s int64/float64
                # coercion would otherwise hide the very mismatches the
                # driver's hash sees (e.g. DuckDB HUGEINT -> float64 vs
                # Spark int64)
                ka, kb = raw_kinds[c]
                if ka != kb:
                    strict.append(f"{c}: dtype kind {ka} vs {kb}")
                elif ka == "f" and a[c].values.tobytes() != b[c].values.tobytes():
                    strict.append(f"{c}: float bit pattern (e.g. -0.0 vs 0.0)")
            if strict:
                print(f"STRICT-FAIL  {name}: {'; '.join(strict)}")
                n_fail += 1
            else:
                print(f"PASS  {name}: rows={len(a)}"); n_pass += 1
        except AssertionError as e:
            diffs = (a != b) & ~(a.isna() & b.isna())
            cols = [c for c in a.columns if diffs[c].any()]
            print(f"FAIL  {name}: value mismatch in {cols}")
            for c in cols[:3]:
                idx = diffs[c].idxmax()
                print(f"      first diff col={c} row={idx}: ours={a[c][idx]!r} oracle={b[c][idx]!r}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
