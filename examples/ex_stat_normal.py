"""Normal distribution (mirrors russell_stat/examples/distribution_normal.rs)."""
import _prelude  # noqa: F401
import math
import numpy as np
import jax
from russell_tpu.stat import DistributionNormal, Histogram, Statistics

d = DistributionNormal(1.0, 0.5)
assert abs(float(d.pdf(1.0)) - 1.0 / (0.5 * math.sqrt(2 * math.pi))) < 1e-12
assert abs(float(d.cdf(1.0)) - 0.5) < 1e-12
s = np.asarray(d.sample(jax.random.PRNGKey(7), (30000,)))
st = Statistics(s)
print(f"sampled mean {st.mean:.4f} std {st.std_dev:.4f}")
assert abs(st.mean - 1.0) < 0.02 and abs(st.std_dev - 0.5) < 0.02
h = Histogram(np.linspace(-1.0, 3.0, 17))
h.count(s)
h.set_bar_max_len(40)
print(h.draw())
print("normal OK")
