#!/usr/bin/env python3
"""Local correctness self-check mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query parquet under verifyOutDir, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the sfDir tables and compares in TWO
modes, both reported per query; the exit code gates on BOTH:

 - tolerant: the historical mode (frames aligned, floats compared with
   atol=1e-6, dtypes coerced). Catches wrong answers.
 - exact: the driver-equivalent mode. Every cell is stringified (floats
   first rounded to 6dp — the driver's observable behavior: r9 passed
   ULP-level float deltas but failed q133's ~1e-6-absolute avg delta,
   so its canonical hash quantizes floats at ~6dp; ints and floats
   stringify DIFFERENTLY, so a DuckDB HUGEINT->float64 150.0 against
   Spark's BIGINT 150 fails here exactly as it failed the driver on
   q158), rows sorted lexicographically, and the string matrices must
   be identical. Catches oracle-convention defects the tolerant mode
   masks (the round-9 lesson: a 1e-6-tolerant local gate passed two
   queries the driver's exact hash failed).
"""
import datetime
import decimal
import json
import os
import sys

import duckdb
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # bytes (e.g. parquet binary) → hex; list/array cells →
            # their canonical cell string (raw ndarrays are unsortable
            # and would crash sort_values with an ambiguous-truth-value
            # error, aborting the whole run)
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray))
                else cell_str(v) if isinstance(v, (list, np.ndarray))
                else v)
        if str(df[c].dtype).startswith("datetime"):
            # tz-aware first: a bare astype to a naive unit RAISES on
            # datetime64[ns, UTC] (verified pandas 2.2.2), which would
            # blanket-FAIL every timestamp query as a "canonicalization
            # error" the moment either engine emits tz-annotated
            # parquet (r15 gate-tooling review)
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
    # Row alignment: sort on NON-float columns first (these are exact
    # cross-engine: ids, strings, ints), floats last and coarsely
    # rounded (4dp); values then compare RAW with an abs tolerance
    # below. Float keys only break ties after all exact keys agree, so
    # misalignment requires rows identical in every exact column.
    keys = df.copy()
    float_cols = [c for c in keys.columns if str(keys[c].dtype).startswith("float")]
    for c in float_cols:
        keys[c] = keys[c].round(4)
        # high-precision copy as the FINAL tie-break: makes the order
        # deterministic PER SIDE when floats straddle a 4dp boundary.
        # Honest limitation (r15 gate-tooling review): it cannot align
        # CROSS-ENGINE noise — rows tied in every exact column whose
        # floats differ within noise (up to 1e-4 inside one 4dp bucket)
        # can order oppositely on the two sides, cross-pair, and
        # produce a spurious FAIL(tol) that the exact mode passes. That
        # residual false-RED (never a false pass) needs duplicate exact
        # keys AND near-tied floats; the authoritative gate is the
        # exact mode, whose row sort uses the stringified cells
        # themselves.
        keys[f"__hp_{c}"] = df[c].round(9)
    cols = list(df.columns)
    order_cols = [c for c in cols if c not in float_cols] + float_cols + \
        [f"__hp_{c}" for c in float_cols]
    order = keys.sort_values(by=order_cols).index
    return df.loc[order].reset_index(drop=True)


def cell_str(v) -> str:
    """Driver-equivalent canonical cell string: floats rounded to 6dp
    (then repr'd, so 150.0 stays '150.0' and never equals int 150),
    ints as plain digits, NULL/NaN/NaT/NA unified, bools as
    'true'/'false' regardless of Python-vs-numpy representation, bytes
    hexed, timestamps at microsecond ISO."""
    if v is None:
        return "NULL"
    # NaT / pd.NA / float NaN (scalar check only — arrays are handled
    # below). ADJUDICATED (r13 gate-instrument review): this unifies a
    # float NaN with SQL NULL, which is a real cross-engine semantic
    # difference — but the distinction is UNOBSERVABLE on this path:
    # pandas materializes a parquet NULL in a float64 column AS np.nan
    # (both for our read_parquet and for DuckDB's .df()), so by the
    # time a cell reaches here the two cases are the same object, for
    # this checker and for the driver's pandas-based hash alike. A
    # query whose correctness hinges on NaN-vs-NULL must surface the
    # distinction as its own boolean/int column (isnan(x), x IS NULL)
    # rather than rely on the float cell.
    if not isinstance(v, (list, np.ndarray)) and pd.isna(v):
        return "NULL"
    # BEFORE the int branch: bool is a subclass of int, so a Python
    # True would stringify as '1' while np.bool_ True falls through to
    # str -> 'True' — the same logical value diverging by representation
    if isinstance(v, (bool, np.bool_)):
        return "true" if bool(v) else "false"
    if isinstance(v, float) or isinstance(v, np.floating):
        r = round(float(v), 6)
        if r == 0.0:
            r = 0.0  # collapse -0.0
        return repr(r)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    # DECIMAL cells: a Spark DecimalType reaches pandas as object
    # decimal.Decimal (str -> '150.00') while DuckDB's .df() renders
    # DECIMAL as float64 ('150.0' via the float branch) — equal values
    # would fail the exact gate on representation; route Decimal
    # through the SAME 6dp float path (r15 gate-tooling review).
    # DOCUMENTED PRECISION CEILING (r16, from r15 ADVICE): the float64
    # round-trip is exact only below 2^53 ≈ 9.0e15 — two DECIMAL sums
    # differing by cents at ~1e16 collapse to the same repr and
    # false-PASS this gate. The float path is forced by DuckDB's .df()
    # rendering DECIMAL as float64 (there is no lossless oracle-side
    # representation to compare against without rewriting every oracle
    # to CAST to VARCHAR); no gated query aggregates to that magnitude
    # at sf<=0.1. A query whose correctness hinges on >2^53 exactness
    # must surface the value as a string/HUGEINT-cents column instead.
    if isinstance(v, decimal.Decimal):
        return repr(round(float(v), 6))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, np.datetime64):
        return pd.Timestamp(v).isoformat()
    # plain datetime.datetime (e.g. inside a struct/list cell, where
    # pandas does not lift to Timestamp): same isoformat as the
    # Timestamp branch, not str()'s space-separated form. Ordered
    # AFTER pd.Timestamp (its subclass).
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(cell_str(x) for x in v) + "]"
    return str(v)


def exact_rows(df: pd.DataFrame):
    """Stringified rows (columns in sorted name order), sorted — the
    canonical form whose equality is the driver-exact gate."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(cell_str(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows)


def exact_compare(got: pd.DataFrame, exp: pd.DataFrame):
    """Returns None on match, else a short diff description."""
    g, e = exact_rows(got), exact_rows(exp)
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}"
    for i, (rg, re_) in enumerate(zip(g, e)):
        if rg != re_:
            return f"row {i}: spark={rg} duck={re_}"
    return None


def mode_disagreement_note(tol_err, exact_err):
    """Self-explaining diagnostic when the two modes disagree (r15
    VERDICT task 3: the next tie-heavy query must fail with an
    explanation, not an adjudication session). Returns a note string,
    or None when the modes agree (both pass or both fail).

    tolerant-only failure: canon()'s row alignment sorts floats by
    (4dp bucket, then 9dp tie-break) — rows duplicated in every exact
    column whose floats carry cross-engine noise can order oppositely
    on the two sides, cross-pair, and fail positionally even though a
    correct pairing exists (the documented residual false-RED at
    canon()). The exact mode sorts the stringified cells themselves,
    so it is immune; it is also the driver-equivalent gate, hence
    authoritative. The exit code still gates on both modes — this note
    is the adjudication, not a waiver.

    exact-only failure: usually an int-vs-float or representation
    convention the tolerant mode coerces away (the round-9 lesson);
    the driver WILL fail it — fix the query/oracle aliasing or types.
    """
    if tol_err is not None and exact_err is None:
        return ("  NOTE: exact mode (authoritative, driver-equivalent) PASSES; "
                "this tolerant failure matches the documented float-tie "
                "cross-pairing residual (duplicate exact keys + near-tied "
                "floats ordering oppositely per side — see canon()). If the "
                "diagnostic rows above show the same value multiset on both "
                "sides, the answer is right and the row ALIGNMENT is what "
                "failed.")
    if exact_err is not None and tol_err is None:
        return ("  NOTE: tolerant mode passes but the driver-equivalent exact "
                "mode FAILS — a representation/convention defect (int vs "
                "float, alias, rounding), not a wrong answer; the driver "
                "will fail it too.")
    return None


def normalize_ints(df: pd.DataFrame) -> pd.DataFrame:
    for c in df.columns:
        if str(df[c].dtype) in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "uint64":
            # astype('int64') would silently WRAP values >= 2^63 (e.g.
            # DuckDB hash() UBIGINTs), making the tolerant mode pass on
            # a wrapped bit pattern the exact mode fails. Python ints
            # are exact at any width; both modes then agree.
            df[c] = df[c].map(int).astype(object)
        elif str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    # table list from the fixture dir itself — a second hand-maintained
    # copy of Views.tables here once meant a new fixture table would
    # FAIL every oracle referencing it with a misdirecting 'table does
    # not exist' (r15 gate-tooling review)
    tables = sorted(f[:-len(".parquet")] for f in os.listdir(sf_dir)
                    if f.endswith(".parquet"))
    if not tables:
        print(f"FAIL: no *.parquet tables under {sf_dir} — wrong sfDir?")
        return 1
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    # A query that failed in Verify has its stale output dir REMOVED, so
    # iterating only existing dirs would silently skip it and the gate
    # would pass with the query ungraded. Every declared oracle key must
    # have an output directory. (Queries with no oracle SQL get the
    # rows-only check when present; Verify's own non-zero exit covers
    # them when absent.)
    for name in sorted(set(oracles) - set(names)):
        print(f"FAIL {name}: no spark output directory (query failed in Verify?)")
        n_fail += 1
    # Stale-dir gate (r15 gate-tooling review): a dir left in a REUSED
    # outDir by a previous dump is NOT a rows-only query — without this
    # check it would be graded 'pass rows-only', silently downgrading an
    # oracle-gated query (or resurrecting a removed one). Verify dumps
    # the attempted-name sidecar since r15; older dumps without it keep
    # the pre-r15 behavior.
    attempted_path = f"{out_dir}/queries.json"
    if os.path.exists(attempted_path):
        attempted = set(json.load(open(attempted_path)))
        for name in sorted(set(names) - attempted):
            print(f"FAIL {name}: stale output dir (not in this dump's queries.json)")
            n_fail += 1
        names = [n for n in names if n in attempted]
    for name in names:
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(got) > 0
            print(f"{'pass' if ok else 'FAIL'} {name}: rows-only ({len(got)} rows)")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            g, e = canon(normalize_ints(got)), canon(normalize_ints(exp))
        except Exception as ex:
            # e.g. sort_values on an array-valued column: fail THIS
            # query instead of aborting the whole run (which would
            # leave every later query ungraded)
            print(f"FAIL {name}: canonicalization error: {ex}")
            n_fail += 1
            continue
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        tol_err = None
        try:
            # abs-diff tolerance for floats (cross-engine ULP noise);
            # int/string columns still compare exactly
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=0, atol=1e-6)
        except AssertionError as ex:
            tol_err = str(ex).splitlines()[-1] if str(ex) else "diff"
        except Exception as ex:
            tol_err = f"compare error: {ex}"
        try:
            exact_err = exact_compare(got, exp)
        except Exception as ex:
            exact_err = f"compare error: {ex}"
        if tol_err is None and exact_err is None:
            print(f"pass {name} ({len(g)} rows)")
            n_pass += 1
        else:
            if tol_err is not None:
                print(f"FAIL(tol) {name}: {tol_err}")
                try:
                    # pick the first row that fails the TOLERANT compare,
                    # not the first raw inequality — a benign 1e-12 float
                    # delta on row 0 would otherwise misdirect the
                    # diagnostic to a passing row
                    neq = pd.DataFrame(index=g.index)
                    for c in g.columns:
                        if str(g[c].dtype).startswith("float") and \
                                str(e[c].dtype).startswith("float"):
                            neq[c] = ~(np.isclose(g[c], e[c], rtol=0, atol=1e-6) |
                                       (g[c].isna() & e[c].isna()))
                        else:
                            neq[c] = (g[c] != e[c]) & ~(g[c].isna() & e[c].isna())
                    bad = neq.any(axis=1)
                    if bad.any():
                        i = bad.idxmax()
                        print("  spark:", g.loc[i].to_dict())
                        print("  duck :", e.loc[i].to_dict())
                except Exception:
                    pass  # diagnostics must never mask the FAIL itself
            if exact_err is not None:
                print(f"FAIL(exact) {name}: {exact_err[:400]}")
            note = mode_disagreement_note(tol_err, exact_err)
            if note is not None:
                print(note)
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
