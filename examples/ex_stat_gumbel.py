"""Gumbel distribution: pdf/cdf/moments + sampling histogram (mirrors
russell_stat/examples/distribution_gumbel.rs)."""
import _prelude  # noqa: F401
import numpy as np
from russell_tpu.stat import DistributionGumbel, Histogram, Statistics

d = DistributionGumbel(8.782275, 11.938204)
xs = np.linspace(-20.0, 60.0, 9)
print(f"{'x':>8} {'pdf':>12} {'cdf':>12}")
for x in xs:
    print(f"{x:8.2f} {float(d.pdf(x)):12.6f} {float(d.cdf(x)):12.6f}")
mu, var = float(d.mean()), float(d.variance())
import jax
samples = np.asarray(d.sample(jax.random.PRNGKey(4), (20000,)))
st = Statistics(samples)
print(f"mean {mu:.3f} (sampled {st.mean:.3f}), std {np.sqrt(var):.3f} "
      f"(sampled {st.std_dev:.3f})")
assert abs(st.mean - mu) < 0.5
assert abs(st.std_dev - np.sqrt(var)) < 0.5
h = Histogram(np.linspace(-20, 80, 11))
h.count(samples)
h.set_bar_max_len(30)
print(h.draw())
print("gumbel OK")
