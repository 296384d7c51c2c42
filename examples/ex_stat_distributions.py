"""Probability distributions: pdf/cdf oracles, TPU-native sampling via
jax.random keys, Statistics, and an ASCII Histogram
(mirrors russell_stat examples/stat_distribution_*.rs + histogram usage)."""
import os as _os
import jax
jax.config.update("jax_platforms", _os.environ.get("JAX_PLATFORMS", "cpu"))
import _prelude  # noqa: F401
import math
import numpy as np
from jax import random
from russell_tpu.stat import (DistributionGumbel, DistributionLognormal,
                              DistributionNormal, DistributionUniform,
                              Histogram, Statistics)

# Gumbel from (mu, sigma) like the reference's new_from_mu_sig
g = DistributionGumbel.new_from_mu_sig(2.0, 1.5)
assert abs(g.mean() - 2.0) < 1e-12
assert abs(math.sqrt(g.variance()) - 1.5) < 1e-12

# normal pdf/cdf point oracles
nrm = DistributionNormal(0.0, 1.0)
assert abs(float(nrm.pdf(0.0)) - 1.0 / math.sqrt(2 * math.pi)) < 1e-12
assert abs(float(nrm.cdf(0.0)) - 0.5) < 1e-12

# sampling is a pure function of a jax PRNG key (vectorized on device)
key = random.PRNGKey(42)
ks = random.split(key, 4)
samples = {
    "uniform": np.asarray(DistributionUniform(0.0, 1.0).sample(ks[0], (20000,))),
    "normal": np.asarray(nrm.sample(ks[1], (20000,))),
    "gumbel": np.asarray(g.sample(ks[2], (20000,))),
    "lognormal": np.asarray(
        DistributionLognormal.new_from_mu_sig(3.0, 1.0).sample(ks[3], (20000,))),
}
for name, xs in samples.items():
    st = Statistics(xs.tolist())
    print(f"{name:10s} mean={st.mean:8.4f} std={st.std_dev:7.4f}")
assert abs(np.mean(samples["uniform"]) - 0.5) < 0.02
assert abs(np.mean(samples["normal"])) < 0.05
assert abs(np.mean(samples["gumbel"]) - 2.0) < 0.1
assert abs(np.mean(samples["lognormal"]) - 3.0) < 0.1

# ASCII histogram of the normal sample (stat_gumbel histogram style)
edges = np.linspace(-4.0, 4.0, 17).tolist()
h = Histogram(edges)
h.count(samples["normal"].tolist())
print(h)
counts = np.asarray(h.get_counts())
assert counts.sum() > 19000               # nearly all samples inside
assert counts.argmax() in (7, 8)          # mode at the center bins
print("ok")
