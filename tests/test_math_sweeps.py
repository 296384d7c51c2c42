"""Accuracy sweeps for the special math functions against the
Abramowitz & Stegun reference tables, mirroring the reference's
integration tests (russell_lab/tests/more_tests_bessel_functions.rs and
more_tests_elliptic_functions.rs). The tables are read from the
reference's data/reference/*.cmp files (data fixtures = the oracle
contract, same policy as the bad_*.mtx fixtures)."""

import math
import os

import numpy as np
import pytest

from russell_tpu.core import read_table
from russell_tpu import math as rmath

REF = "/root/reference/russell_lab/data/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tables not available")


def _sweep(fn, xx, expect, tol, skip=None):
    got = np.asarray(fn(np.asarray(xx)))
    for i, (g, e) in enumerate(zip(got, expect)):
        if skip is not None and skip(i, xx[i]):
            continue
        if math.isinf(e) or math.isnan(e):
            continue
        assert abs(g - e) <= tol, (i, xx[i], g, e)


def test_bessel_jy_small_table():
    dat = read_table(f"{REF}/as-9-bessel-integer-sml.cmp",
                     ["x", "J0", "J1", "J2", "Y0", "Y1", "Y2"])
    xx = dat["x"]
    _sweep(rmath.bessel_j0, xx, dat["J0"], 1e-15)
    _sweep(rmath.bessel_j1, xx, dat["J1"], 1e-15)
    _sweep(lambda x: rmath.bessel_jn(2, x), xx, dat["J2"], 1e-15)
    # x = 0: Y diverges to -inf
    assert np.isneginf(float(rmath.bessel_y0(0.0)))
    assert np.isneginf(float(rmath.bessel_y1(0.0)))
    assert np.isneginf(float(rmath.bessel_yn(2, 0.0)))
    nz = slice(1, None)
    _sweep(rmath.bessel_y0, xx[nz], dat["Y0"][nz], 1e-15)
    _sweep(rmath.bessel_y1, xx[nz], dat["Y1"][nz], 1e-15)
    _sweep(lambda x: rmath.bessel_yn(2, x), xx[nz], dat["Y2"][nz], 1e-15)


def test_bessel_jy_big_table():
    dat = read_table(f"{REF}/as-9-bessel-integer-big.cmp",
                     ["x", "J0", "J1", "J2", "Y0", "Y1", "Y2"])
    xx = dat["x"]
    _sweep(rmath.bessel_j0, xx, dat["J0"], 1e-15)
    _sweep(rmath.bessel_j1, xx, dat["J1"], 1e-15)
    _sweep(lambda x: rmath.bessel_jn(2, x), xx, dat["J2"], 1e-14)
    nz = xx > 0
    _sweep(rmath.bessel_y0, xx[nz], dat["Y0"][nz], 2e-15)
    _sweep(rmath.bessel_y1, xx[nz], dat["Y1"][nz], 1e-15)
    _sweep(lambda x: rmath.bessel_yn(2, x), xx[nz], dat["Y2"][nz], 2e-14)


@pytest.mark.parametrize("table,tols", [
    ("as-9-modbessel-integer-sml.cmp", (1e-15, 1e-15, 2e-15, 1e-14)),
    ("as-9-modbessel-integer-big.cmp", (1e-11, 1e-11, 1e-11, 1e-11)),
])
def test_modified_bessel_tables(table, tols):
    dat = read_table(f"{REF}/{table}",
                     ["x", "I0", "I1", "I2", "I3", "K0", "K1", "K2", "K3"])
    xx = dat["x"]
    tI0, tI1, tIn, tK = tols
    # I grows like e^x: compare RELATIVE on the big table
    scale = np.maximum(1.0, np.abs(dat["I0"]))
    got = np.asarray(rmath.bessel_i0(np.asarray(xx)))
    assert np.all(np.abs(got - dat["I0"]) <= tI0 * scale)
    got = np.asarray(rmath.bessel_i1(np.asarray(xx)))
    scale = np.maximum(1.0, np.abs(dat["I1"]))
    assert np.all(np.abs(got - dat["I1"]) <= tI1 * scale)
    for nn in (2, 3):
        ref = dat[f"I{nn}"]
        got = np.asarray(rmath.bessel_in(nn, np.asarray(xx)))
        scale = np.maximum(1.0, np.abs(ref))
        assert np.all(np.abs(got - ref) <= tIn * scale)
    # K at x = 0 diverges (inf / nan in the table); skip the first row
    nz = xx > 0
    for nn, fn in ((0, rmath.bessel_k0), (1, rmath.bessel_k1),
                   (2, lambda x: rmath.bessel_kn(2, x)),
                   (3, lambda x: rmath.bessel_kn(3, x))):
        ref = dat[f"K{nn}"][nz]
        got = np.asarray(fn(np.asarray(xx[nz])))
        scale = np.maximum(1.0, np.abs(ref))
        assert np.all(np.abs(got - ref) <= tK * scale), f"K{nn}"


def test_modified_bessel_negative_arguments():
    dat = read_table(f"{REF}/as-9-modbessel-integer-neg.cmp",
                     ["x", "I0", "I1", "I2", "I3"])
    xx = dat["x"]
    for nn, fn in ((0, rmath.bessel_i0), (1, rmath.bessel_i1),
                   (2, lambda x: rmath.bessel_in(2, x)),
                   (3, lambda x: rmath.bessel_in(3, x))):
        ref = dat[f"I{nn}"]
        got = np.asarray(fn(np.asarray(xx)))
        scale = np.maximum(1.0, np.abs(ref))
        assert np.all(np.abs(got - ref) <= 1e-14 * scale), f"I{nn}"


def _elliptic_sweep(table, cols, fn, tol, singular=True):
    dat = read_table(f"{REF}/{table}", cols)
    phi = dat["phi"]
    k = dat["k"]
    # snap small noise on pi/2 (reference tests do the same)
    p = np.where(np.abs(phi - math.pi / 2) < 1e-15, math.pi / 2, phi)
    if "n" in cols:
        got = np.asarray(fn(dat["n"], p, k ** 2))
    else:
        got = np.asarray(fn(p, k ** 2))
    ref = dat[cols[-1]]
    if singular:
        # k·sinφ == 1 (or n·sinφ == 1): the integral diverges
        sing = np.abs(np.sin(phi) * k - 1.0) < np.finfo(float).eps
        if "n" in cols:
            sing |= (np.abs(np.sin(phi) * dat["n"] - 1.0)
                     < np.finfo(float).eps)
        assert np.all(np.isinf(got[sing]))
    else:
        sing = np.zeros(len(phi), dtype=bool)   # E is finite everywhere
    with np.errstate(invalid="ignore"):
        bad = ~sing & ~(np.abs(got - ref) <= tol)
    assert not bad.any(), list(zip(phi[bad], k[bad], got[bad], ref[bad]))[:5]


@pytest.mark.parametrize("table", [
    "as-17-elliptic-integrals-table17.5-small.cmp",
    "as-17-elliptic-integrals-table17.5-big.cmp",
])
def test_elliptic_f_tables(table):
    _elliptic_sweep(table, ["phi", "k", "F"], rmath.elliptic_f, 1e-13)


@pytest.mark.parametrize("table", [
    "as-17-elliptic-integrals-table17.6-small.cmp",
    "as-17-elliptic-integrals-table17.6-big.cmp",
])
def test_elliptic_e_tables(table):
    _elliptic_sweep(table, ["phi", "k", "E"], rmath.elliptic_e, 1e-14,
                    singular=False)


@pytest.mark.parametrize("table", [
    "as-17-elliptic-integrals-table17.9-small.cmp",
    "as-17-elliptic-integrals-table17.9-big.cmp",
])
def test_elliptic_pi_tables(table):
    _elliptic_sweep(table, ["n", "phi", "k", "PI"], rmath.elliptic_pi, 1e-13)
