"""Core utilities: check assertions, enums, stopwatch, formatters, generators.

TPU-native analog of ``russell_lab``'s ``base`` + ``check`` modules
(reference: russell_lab/src/base, russell_lab/src/check).
"""

from russell_tpu.core.check import (
    approx_eq,
    array_approx_eq,
    assert_alike,
    complex_approx_eq,
    complex_array_approx_eq,
    deriv1_approx_eq,
    deriv1_approx_eq_fw,
    deriv1_approx_eq_bw,
    deriv2_approx_eq,
    deriv1_central5,
    deriv1_forward4,
    deriv1_backward4,
    deriv2_central5,
)
from russell_tpu.core.enums import Norm
from russell_tpu.core.stopwatch import Stopwatch, format_nanoseconds
from russell_tpu.core.formatters import (
    format_fortran,
    format_scientific,
)
from russell_tpu.core.generators import linspace, generate2d, generate3d
from russell_tpu.core.sort import sort2, sort3, sort4
from russell_tpu.core.read_table import read_table, read_data
from russell_tpu.core.peaks import find_valleys_and_peaks


def fetch_host(x):
    """Device array -> numpy, safe for complex dtypes on backends without
    complex device-to-host transfers (the attached TPU): real and
    imaginary parts are fetched separately and recombined."""
    import numpy as _np
    import jax.numpy as _jnp
    x = _jnp.asarray(x)
    if _jnp.iscomplexobj(x):
        return (_np.asarray(_jnp.real(x)).astype(_np.float64)
                + 1j * _np.asarray(_jnp.imag(x)).astype(_np.float64))
    return _np.asarray(x)
