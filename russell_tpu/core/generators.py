"""Grid/sequence generators (reference: russell_lab/src/base/generators.rs:39,111
and linspace in vector/num_vector.rs)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["linspace", "generate2d", "generate3d"]


def linspace(start: float, stop: float, count: int, dtype=None):
    """Evenly spaced values including both endpoints; count may be 0 or 1."""
    if count == 0:
        return jnp.zeros((0,), dtype=dtype or jnp.float64)
    if count == 1:
        return jnp.asarray([start], dtype=dtype)
    return jnp.linspace(start, stop, count, dtype=dtype)


def generate2d(xmin, xmax, ymin, ymax, nx: int, ny: int):
    """2D meshgrid matrices (X, Y) of shape (ny, nx) with x varying along
    columns — matches russell's generate2d (base/generators.rs:39)."""
    x = linspace(xmin, xmax, nx)
    y = linspace(ymin, ymax, ny)
    X, Y = jnp.meshgrid(x, y, indexing="xy")
    return X, Y


def generate3d(xmin, xmax, ymin, ymax, zmin, zmax, nx: int, ny: int, nz: int):
    """3D meshgrid (X, Y, Z), each of shape (nz, ny, nx)."""
    x = linspace(xmin, xmax, nx)
    y = linspace(ymin, ymax, ny)
    z = linspace(zmin, zmax, nz)
    X, Y, Z = jnp.meshgrid(x, y, z, indexing="xy")
    # meshgrid xy gives (ny, nx, nz); move z to the front
    return (
        jnp.moveaxis(X, 2, 0),
        jnp.moveaxis(Y, 2, 0),
        jnp.moveaxis(Z, 2, 0),
    )
