#!/usr/bin/env python3
"""Spec for tools/check.py — the gate tooling's own gate (r15 VERDICT
task 3). Run standalone (`python3 tools/test_check.py`), exits non-zero
on any failure; close.sh runs it before the oracle gates.

Covers, red-provably (each case was first verified to FAIL on the
pre-fix/pre-feature code):

 1. The documented tolerant-mode false-RED residual: duplicate exact
    keys + near-tied floats that cross-pair under canon()'s
    (4dp, 9dp) sort. The fixture must (a) FAIL the tolerant compare,
    (b) PASS the exact compare, and (c) produce a self-explaining
    mode-disagreement note. If a future canon() change actually FIXES
    the cross-pairing, case (a) flips and this spec fails loudly —
    then delete the residual's documentation along with this case.
 2. The inverse disagreement (exact-only failure) also gets a note.
 3. Agreeing modes get no note.
 4. cell_str Decimal ceiling: exact below 2^53, documented collapse
    above it (falsifiable both ways).
 5. cell_str conventions that once bit: bool-vs-int, -0.0, int/float
    distinctness.
"""
import decimal
import importlib.util
import os
import sys

import pandas as pd

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location("check", os.path.join(_here, "check.py"))
check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check)

failures = []


def case(name, cond, detail=""):
    status = "pass" if cond else "FAIL"
    print(f"{status} {name}" + (f": {detail}" if detail and not cond else ""))
    if not cond:
        failures.append(name)


def tolerant_err(g, e):
    cg = check.canon(check.normalize_ints(g.copy()))
    ce = check.canon(check.normalize_ints(e.copy()))
    try:
        pd.testing.assert_frame_equal(cg, ce, check_dtype=False,
                                      check_exact=False, rtol=0, atol=1e-6)
        return None
    except AssertionError as ex:
        return str(ex).splitlines()[-1] if str(ex) else "diff"


# --- 1. the cross-pairing residual fixture -------------------------------
# Two rows sharing every exact column. Column x ties at 4dp and carries
# ~3e-9 cross-engine noise that flips the 9dp tie-break order between
# the sides; column y ties at 4dp but its two ROWS differ by 4e-5 (far
# above atol) while matching exactly per true pair. canon() sorts each
# side independently -> the sides cross-pair on x's flipped order and
# the positional compare sees y off by 4e-5. The exact mode sorts
# 6dp-stringified rows, where both sides are the identical multiset.
g = pd.DataFrame({"k": ["a", "a"],
                  "x": [0.123451000, 0.123451002],
                  "y": [1.000100, 1.000140]})
e = pd.DataFrame({"k": ["a", "a"],
                  "x": [0.123451003, 0.123451001],
                  "y": [1.000100, 1.000140]})
tol = tolerant_err(g, e)
exact = check.exact_compare(g, e)
case("residual: tolerant mode false-REDs the cross-pairing fixture",
     tol is not None,
     "tolerant PASSED — canon() now aligns cross-engine ties; the "
     "documented residual is gone, update canon()'s comment and retire "
     "this case")
case("residual: exact mode passes the same fixture",
     exact is None, f"exact said: {exact}")
note = check.mode_disagreement_note(tol, exact)
case("residual: disagreement note names the cross-pairing limitation",
     note is not None and "cross-pairing" in note and "authoritative" in note,
     f"note was: {note!r}")

# --- 2. exact-only failure notes the driver convention ------------------
# int 150 vs float 150.0: tolerant coerces, exact (and the driver)
# distinguishes — the q158 shape.
g2 = pd.DataFrame({"k": ["a"], "v": [150]})
e2 = pd.DataFrame({"k": ["a"], "v": [150.0]})
tol2 = tolerant_err(g2, e2)
exact2 = check.exact_compare(g2, e2)
case("exact-only: int-vs-float fails exact, passes tolerant",
     tol2 is None and exact2 is not None,
     f"tol={tol2!r} exact={exact2!r}")
note2 = check.mode_disagreement_note(tol2, exact2)
case("exact-only: note says the driver will fail it",
     note2 is not None and "driver" in note2, f"note was: {note2!r}")

# --- 3. agreeing modes -> no note ----------------------------------------
case("agree-pass: no note", check.mode_disagreement_note(None, None) is None)
case("agree-fail: no note", check.mode_disagreement_note("d", "d") is None)

# --- 4. Decimal precision ceiling ----------------------------------------
D = decimal.Decimal
case("decimal: cents differ below 2^53",
     check.cell_str(D("150.00")) != check.cell_str(D("150.01")))
case("decimal: exact integer round-trip below 2^53",
     check.cell_str(D("9007199254740992.00")) ==
     check.cell_str(D("9007199254740992")))
# the DOCUMENTED collapse: cents at ~1e16 are beyond float64 — if this
# ever starts distinguishing, the ceiling comment at cell_str is stale
case("decimal: documented collapse of cents above 2^53",
     check.cell_str(D("10000000000000000.00")) ==
     check.cell_str(D("10000000000000000.25")))

# --- 5. cell_str conventions ---------------------------------------------
import numpy as np  # noqa: E402
case("bool is true/false, not 1/0",
     check.cell_str(True) == "true" and check.cell_str(np.bool_(False)) == "false")
case("-0.0 collapses to 0.0", check.cell_str(-0.0) == check.cell_str(0.0))
case("int and float stringify differently",
     check.cell_str(150) != check.cell_str(150.0))

print(f"== {len(failures)} failing case(s)" if failures else "== all cases pass")
sys.exit(1 if failures else 0)
