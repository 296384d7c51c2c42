"""Row-partitioned distributed sparse mat-vec.

Design (SURVEY.md §5.7/§7.9): the matrix rows are block-partitioned across
the mesh axis; each device owns an equal (padded) slab of rows and the
matching segment of x. To multiply, every device ``all_gather``s the x
segments over ICI and contracts its local slab — one collective, fully
overlapped by XLA with the local compute. This replaces the role MUMPS'
MPI mode / cuDSS hybrid-memory mode plays in the reference for matrices
bigger than one device (interface_mumps.c:153, interface_cudss.cu:351).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

__all__ = ["ShardedCsr", "shard_csr_rows", "dist_mat_vec_mul"]


@dataclass(frozen=True)
class ShardedCsr:
    """Host-planned row partition of a CSR matrix.

    Leading axis of every array is the shard axis (length n_shards); nnz is
    padded per shard so shapes are identical (static shapes for XLA).
    """

    n: int                 # logical dimension
    n_shards: int
    rows_per_shard: int    # padded rows per shard
    local_rows: jnp.ndarray   # (n_shards, nnz_pad) row index local to shard
    cols: jnp.ndarray         # (n_shards, nnz_pad) global col index
    vals: jnp.ndarray         # (n_shards, nnz_pad) entries (0 in padding)

    @property
    def n_pad(self) -> int:
        return self.n_shards * self.rows_per_shard


def shard_csr_rows(csr, n_shards: int) -> ShardedCsr:
    """Partition a CsrMatrix (full storage) into equal padded row slabs."""
    if csr.sym.triangular():
        raise ValueError("shard_csr_rows requires full (non-triangular) storage")
    n = csr.nrow
    rows = np.asarray(csr.row_ids)
    cols = np.asarray(csr.indices)
    vals = np.asarray(csr.data)
    rps = -(-n // n_shards)
    shard_of = rows // rps
    nnz_pad = max(int(np.max(np.bincount(shard_of, minlength=n_shards))), 1)
    lr = np.zeros((n_shards, nnz_pad), dtype=np.int32)
    cc = np.zeros((n_shards, nnz_pad), dtype=np.int32)
    vv = np.zeros((n_shards, nnz_pad), dtype=vals.dtype)
    for s in range(n_shards):
        m = shard_of == s
        k = int(np.sum(m))
        lr[s, :k] = rows[m] - s * rps
        cc[s, :k] = cols[m]
        # padding points at local row `rps` (a scratch row, discarded below)
        lr[s, k:] = rps
        vv[s, :k] = vals[m]
    return ShardedCsr(n=n, n_shards=n_shards, rows_per_shard=rps,
                      local_rows=jnp.asarray(lr), cols=jnp.asarray(cc),
                      vals=jnp.asarray(vv))


def dist_mat_vec_mul(mesh: Mesh, sh: ShardedCsr, x, axis: str = "rows"):
    """y = A x with rows of A and segments of x/y sharded over ``axis``.

    ``x`` must have length ``sh.n_pad`` (pad with zeros); the result has the
    same padded length, sharded the same way.
    """
    rps = sh.rows_per_shard

    def local(lr, cc, vv, xseg):
        xfull = jax.lax.all_gather(xseg, axis, tiled=True)   # ICI collective
        prod = vv[0] * xfull[cc[0]]
        y = jax.ops.segment_sum(prod, lr[0], num_segments=rps + 1)
        return y[:rps]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis)),
        out_specs=P(axis),
    )
    return fn(sh.local_rows, sh.cols, sh.vals, x)
