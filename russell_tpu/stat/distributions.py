"""Probability distributions (reference: russell_stat/src/distribution_*.rs
over the trait probability_distribution.rs:4).

TPU-first: pdf/cdf are vmappable jnp functions; ``sample`` takes a
jax.random key and an optional shape (key-based functional sampling
replaces the reference's rand_distr thread-rng)."""

from __future__ import annotations

import math
from abc import ABC, abstractmethod

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erf as _erf

from russell_tpu.math.basic import gamma as _gamma

__all__ = ["ProbabilityDistribution", "DistributionFrechet",
           "DistributionGumbel", "DistributionLognormal",
           "DistributionNormal", "DistributionUniform"]

EULER = 0.5772156649015328606
FRECHET_MIN_DELTA_X = 1e-15
SQRT2 = math.sqrt(2.0)


class ProbabilityDistribution(ABC):
    """pdf/cdf/mean/variance/sample contract
    (probability_distribution.rs:4)."""

    @abstractmethod
    def pdf(self, x):
        ...

    @abstractmethod
    def cdf(self, x):
        ...

    @abstractmethod
    def mean(self) -> float:
        ...

    @abstractmethod
    def variance(self) -> float:
        ...

    @abstractmethod
    def sample(self, key, shape=()):
        ...


def _f(x):
    return jnp.asarray(x, dtype=jnp.result_type(float))


class DistributionFrechet(ProbabilityDistribution):
    """Frechet (inverse Weibull) (distribution_frechet.rs:15)."""

    def __init__(self, location: float, scale: float, shape: float):
        if scale <= 0.0 or shape <= 0.0:
            raise ValueError("invalid parameters")
        self.location = location
        self.scale = scale
        self.shape = shape

    def pdf(self, x):
        x = _f(x)
        z = (x - self.location) / self.scale
        zs = jnp.maximum(z, 1e-300)
        val = (jnp.exp(-zs ** -self.shape) * zs ** (-1.0 - self.shape)
               * self.shape / self.scale)
        return jnp.where(x - self.location < FRECHET_MIN_DELTA_X, 0.0, val)

    def cdf(self, x):
        x = _f(x)
        z = jnp.maximum((x - self.location) / self.scale, 1e-300)
        val = jnp.exp(-z ** -self.shape)
        return jnp.where(x - self.location < FRECHET_MIN_DELTA_X, 0.0, val)

    def mean(self) -> float:
        if self.shape > 1.0:
            return self.location + self.scale * float(
                _gamma(1.0 - 1.0 / self.shape))
        return math.inf

    def variance(self) -> float:
        if self.shape > 2.0:
            g1 = float(_gamma(1.0 - 1.0 / self.shape))
            g2 = float(_gamma(1.0 - 2.0 / self.shape))
            return self.scale ** 2 * (g2 - g1 * g1)
        return math.inf

    def sample(self, key, shape=()):
        # inverse transform: x = loc + scale (-ln U)^(-1/shape)
        u = jax.random.uniform(key, shape, minval=1e-12, maxval=1.0)
        return self.location + self.scale * (-jnp.log(u)) ** (-1.0
                                                              / self.shape)


class DistributionGumbel(ProbabilityDistribution):
    """Gumbel (type I extreme value) (distribution_gumbel.rs:13)."""

    def __init__(self, location: float, scale: float):
        if scale <= 0.0:
            raise ValueError("invalid parameters")
        self.location = location
        self.scale = scale

    @classmethod
    def new_from_mu_sig(cls, mu: float, sig: float) -> "DistributionGumbel":
        scale = sig * math.sqrt(6.0) / math.pi
        location = mu - EULER * scale
        return cls(location, scale)

    def pdf(self, x):
        mz = (self.location - _f(x)) / self.scale
        return jnp.exp(mz) * jnp.exp(-jnp.exp(mz)) / self.scale

    def cdf(self, x):
        mz = (self.location - _f(x)) / self.scale
        return jnp.exp(-jnp.exp(mz))

    def mean(self) -> float:
        return self.location + EULER * self.scale

    def variance(self) -> float:
        return (math.pi * self.scale) ** 2 / 6.0

    def sample(self, key, shape=()):
        return jax.random.gumbel(key, shape) * self.scale + self.location


class DistributionLognormal(ProbabilityDistribution):
    """Lognormal (distribution_lognormal.rs:13)."""

    def __init__(self, mu_logx: float, sig_logx: float):
        if sig_logx <= 0.0:
            raise ValueError("invalid parameters")
        self.mu = mu_logx
        self.sig = sig_logx

    @classmethod
    def new_from_mu_sig(cls, mu: float, sig: float) -> "DistributionLognormal":
        if mu <= 0.0:
            raise ValueError("mu must be positive")
        cv = sig / mu
        sig_logx = math.sqrt(math.log(1.0 + cv * cv))
        mu_logx = math.log(mu) - sig_logx ** 2 / 2.0
        return cls(mu_logx, sig_logx)

    def pdf(self, x):
        x = jnp.maximum(_f(x), 1e-300)
        z = (jnp.log(x) - self.mu) / self.sig
        val = jnp.exp(-z * z / 2.0) / (x * self.sig * math.sqrt(2 * math.pi))
        return jnp.where(_f(x) <= 0.0, 0.0, val)

    def cdf(self, x):
        x = jnp.maximum(_f(x), 1e-300)
        z = (jnp.log(x) - self.mu) / (self.sig * SQRT2)
        return jnp.where(_f(x) <= 0.0, 0.0, 0.5 * (1.0 + _erf(z)))

    def mean(self) -> float:
        return math.exp(self.mu + self.sig ** 2 / 2.0)

    def variance(self) -> float:
        s2 = self.sig ** 2
        return (math.exp(s2) - 1.0) * math.exp(2.0 * self.mu + s2)

    def sample(self, key, shape=()):
        return jnp.exp(jax.random.normal(key, shape) * self.sig + self.mu)


class DistributionNormal(ProbabilityDistribution):
    """Normal (distribution_normal.rs:11)."""

    def __init__(self, mu: float, sig: float):
        if sig <= 0.0:
            raise ValueError("invalid parameters")
        self.mu = mu
        self.sig = sig

    def pdf(self, x):
        z = (_f(x) - self.mu) / self.sig
        return jnp.exp(-z * z / 2.0) / (self.sig * math.sqrt(2 * math.pi))

    def cdf(self, x):
        z = (_f(x) - self.mu) / (self.sig * SQRT2)
        return 0.5 * (1.0 + _erf(z))

    def mean(self) -> float:
        return self.mu

    def variance(self) -> float:
        return self.sig ** 2

    def sample(self, key, shape=()):
        return jax.random.normal(key, shape) * self.sig + self.mu


class DistributionUniform(ProbabilityDistribution):
    """Uniform on [xmin, xmax] (distribution_uniform.rs:10)."""

    def __init__(self, xmin: float, xmax: float):
        if xmax <= xmin:
            raise ValueError("invalid parameters")
        self.xmin = xmin
        self.xmax = xmax

    def pdf(self, x):
        x = _f(x)
        inside = (x >= self.xmin) & (x <= self.xmax)
        return jnp.where(inside, 1.0 / (self.xmax - self.xmin), 0.0)

    def cdf(self, x):
        x = _f(x)
        return jnp.clip((x - self.xmin) / (self.xmax - self.xmin), 0.0, 1.0)

    def mean(self) -> float:
        return (self.xmin + self.xmax) / 2.0

    def variance(self) -> float:
        return (self.xmax - self.xmin) ** 2 / 12.0

    def sample(self, key, shape=()):
        return jax.random.uniform(key, shape, minval=self.xmin,
                                  maxval=self.xmax)
