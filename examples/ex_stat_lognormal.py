"""Lognormal distribution: pdf/cdf/moments + sampling (mirrors
russell_stat/examples/distribution_lognormal.rs)."""
import _prelude  # noqa: F401
import math
import numpy as np
import jax
from russell_tpu.stat import DistributionLognormal, Statistics

d = DistributionLognormal(0.0, 0.25)
xs = np.linspace(0.2, 3.0, 8)
print(f"{'x':>6} {'pdf':>12} {'cdf':>12}")
for x in xs:
    p, c = float(d.pdf(x)), float(d.cdf(x))
    print(f"{x:6.2f} {p:12.6f} {c:12.6f}")
    # oracle: scipy lognorm with s=0.25, scale=e^0
    from scipy.stats import lognorm
    assert abs(p - lognorm.pdf(x, 0.25)) < 1e-12
    assert abs(c - lognorm.cdf(x, 0.25)) < 1e-12
mu, var = float(d.mean()), float(d.variance())
assert abs(mu - math.exp(0.25 ** 2 / 2)) < 1e-12
s = np.asarray(d.sample(jax.random.PRNGKey(1), (20000,)))
st = Statistics(s)
print(f"mean {mu:.4f} sampled {st.mean:.4f}; std {math.sqrt(var):.4f} "
      f"sampled {st.std_dev:.4f}")
assert abs(st.mean - mu) < 0.02
print("lognormal OK")
