"""Uniform distribution (mirrors russell_stat/examples/distribution_uniform.rs)."""
import _prelude  # noqa: F401
import numpy as np
import jax
from russell_tpu.stat import DistributionUniform, Statistics

a, b = 2.0, 5.0
d = DistributionUniform(a, b)
assert float(d.pdf(3.0)) == 1.0 / (b - a)
assert float(d.pdf(1.0)) == 0.0
assert abs(float(d.cdf(3.5)) - 0.5) < 1e-12
assert float(d.mean()) == 3.5
assert abs(float(d.variance()) - (b - a) ** 2 / 12.0) < 1e-12
s = np.asarray(d.sample(jax.random.PRNGKey(3), (20000,)))
st = Statistics(s)
print(f"sampled: min {st.min:.3f} max {st.max:.3f} mean {st.mean:.3f}")
assert st.min >= a and st.max <= b and abs(st.mean - 3.5) < 0.03
print("uniform OK")
