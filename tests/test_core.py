import numpy as np
import pytest

from russell_tpu.core import (
    approx_eq, array_approx_eq, assert_alike, complex_approx_eq,
    deriv1_approx_eq, deriv2_approx_eq, Norm, Stopwatch,
    format_fortran, format_scientific, format_nanoseconds,
    linspace, generate2d, generate3d,
)
from russell_tpu.core.enums import vec_norm, mat_norm
from russell_tpu.core.peaks import find_valleys_and_peaks
from russell_tpu.core.sort import sort2, sort3, sort4


def test_approx_eq():
    approx_eq(3.0000001, 3.0, 1e-6)
    with pytest.raises(AssertionError):
        approx_eq(1.0, 2.0, 1e-6)
    with pytest.raises(AssertionError, match="NaN"):
        approx_eq(np.nan, 2.0, 1e-6)
    with pytest.raises(AssertionError, match="Inf"):
        approx_eq(np.inf, 2.0, 1e-6)


def test_array_approx_eq():
    array_approx_eq([1.0, 2.0], [1.0, 2.0 + 1e-12], 1e-10)
    with pytest.raises(AssertionError):
        array_approx_eq([1.0], [1.1], 1e-6)
    with pytest.raises(AssertionError, match="shapes"):
        array_approx_eq([1.0], [1.0, 2.0], 1e-6)


def test_complex_approx_eq():
    complex_approx_eq(1 + 2j, 1 + 2j + 1e-14, 1e-10)
    with pytest.raises(AssertionError):
        complex_approx_eq(1 + 2j, 1 + 3j, 1e-6)


def test_assert_alike():
    assert_alike(np.nan, np.nan)
    assert_alike(np.inf, np.inf)
    assert_alike(1.0, 1.0 + 1e-16)
    with pytest.raises(AssertionError):
        assert_alike(1.0, 2.0)


def test_deriv_checks():
    deriv1_approx_eq(np.cos(0.7), 0.7, 1e-9, np.sin)
    deriv2_approx_eq(-np.sin(0.7), 0.7, 1e-8, np.sin)
    with pytest.raises(AssertionError):
        deriv1_approx_eq(1.5, 0.7, 1e-9, np.sin)


def test_norms():
    v = np.array([-3.0, 4.0])
    approx_eq(vec_norm(v, Norm.ONE), 7.0, 1e-15)
    approx_eq(vec_norm(v, Norm.EUC), 5.0, 1e-15)
    approx_eq(vec_norm(v, Norm.MAX), 4.0, 1e-15)
    m = np.array([[1.0, -2.0], [3.0, 4.0]])
    approx_eq(mat_norm(m, Norm.ONE), 6.0, 1e-15)
    approx_eq(mat_norm(m, Norm.INF), 7.0, 1e-15)
    approx_eq(mat_norm(m, Norm.FRO), np.sqrt(30.0), 1e-13)
    approx_eq(mat_norm(m, Norm.MAX), 4.0, 1e-15)


def test_formatters():
    assert format_fortran(3723000.0) == "  3.723000000000000E+06"
    assert format_scientific(-1.5, 10, 2) == " -1.50E+00"
    assert format_scientific(0.0, 8, 1) == " 0.0E+00"
    assert format_nanoseconds(0) == "0ns"
    assert format_nanoseconds(800) == "800ns"
    assert "ms" in format_nanoseconds(123_450_000)
    assert format_nanoseconds(62_300_000_000).startswith("1m")


def test_stopwatch():
    sw = Stopwatch()
    ns = sw.stop()
    assert ns >= 0
    sw.reset()
    assert sw.elapsed() == 0


def test_linspace_generate():
    x = np.asarray(linspace(0.0, 1.0, 5))
    array_approx_eq(x, [0.0, 0.25, 0.5, 0.75, 1.0], 1e-15)
    assert len(np.asarray(linspace(0, 1, 0))) == 0
    assert np.asarray(linspace(3.0, 9.0, 1))[0] == 3.0
    X, Y = generate2d(0, 1, 0, 2, 3, 2)
    assert X.shape == (2, 3) and Y.shape == (2, 3)
    approx_eq(np.asarray(X)[0, 2], 1.0, 1e-15)
    approx_eq(np.asarray(Y)[1, 0], 2.0, 1e-15)
    X3, Y3, Z3 = generate3d(0, 1, 0, 1, 0, 1, 2, 2, 2)
    assert X3.shape == (2, 2, 2)


def test_peaks_and_sort():
    valleys, peaks = find_valleys_and_peaks([0, 2, 1, 3, 0.5])
    assert peaks == [1, 3] and valleys == [2]
    assert sort2(2, 1) == (1, 2)
    assert sort3(3, 1, 2) == (1, 2, 3)
    assert sort4(4, 3, 2, 1) == (1, 2, 3, 4)


def test_checkpoint_resume(tmp_path):
    """Save mid-run via Output callback, then resume from the snapshot
    (SURVEY.md §5.4 semantics: resume = re-run solve from saved (x, y))."""
    import numpy as np
    from russell_tpu.ode import Method, OdeSolver, Output, Params, samples
    from russell_tpu.utils import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "run.npz"))
    system, x0, y0, args, y_fn = samples.hairer_wanner_eq1()
    sol = OdeSolver(Params(Method.RADAU5), system)
    out = Output().set_step_callback(ckpt.as_step_callback(every_n=2))

    # stop partway by running to an interior point
    sol.solve(y0, x0, 0.7, args=args, output=out)
    assert ckpt.exists()
    x_r, y_r, h_r, meta = ckpt.load()
    assert x0 < x_r <= 0.7
    assert meta["n_accepted"] >= 1

    # resume to the end from the snapshot
    params = Params(Method.RADAU5)
    params.step.h_ini = max(h_r, 1e-8)
    sol2 = OdeSolver(params, system)
    y_end = sol2.solve(y_r, x_r, 1.5, args=args)
    assert abs(float(y_end[0]) - float(y_fn(1.5, None)[0])) < 5e-4


def test_profiling_trace_noop(tmp_path):
    from russell_tpu.utils import trace
    import jax.numpy as jnp
    with trace(str(tmp_path / "prof")):
        (jnp.ones(8) * 2).block_until_ready()
