"""Statistics and probability distributions, TPU-first.

Re-designs ``russell_stat`` (reference: russell_stat/src/): distributions
over the ProbabilityDistribution contract (pdf/cdf/mean/variance/sample)
with jax.random samplers (vmappable, key-based — replacing rand_distr),
descriptive statistics, quantiles/quartiles/IQR/outliers, and the text
histogram.
"""

from russell_tpu.stat.distributions import (
    ProbabilityDistribution, DistributionFrechet, DistributionGumbel,
    DistributionLognormal, DistributionNormal, DistributionUniform)
from russell_tpu.stat.statistics import (Statistics, quantile, quartiles,
                                         inter_quartile_range, outliers)
from russell_tpu.stat.histogram import Histogram

__all__ = [
    "ProbabilityDistribution", "DistributionFrechet", "DistributionGumbel",
    "DistributionLognormal", "DistributionNormal", "DistributionUniform",
    "Statistics", "quantile", "quartiles", "inter_quartile_range",
    "outliers", "Histogram",
]
