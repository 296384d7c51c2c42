"""CSC matrix as a frozen JAX pytree (reference: russell_sparse/src/csc_matrix.rs).

Same design as CsrMatrix: static structure, jax.Array values,
duplicate-summing ``from_coo`` (csc_matrix.rs:337).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.sparse.enums import Sym

__all__ = ["CscMatrix"]


@jax.tree_util.register_pytree_node_class
class CscMatrix:
    """Compressed-sparse-column matrix; ``data`` is the only pytree leaf."""

    def __init__(self, nrow, ncol, indptr, indices, data, sym: Sym = Sym.NO,
                 col_ids=None):
        self.nrow = int(nrow)
        self.ncol = int(ncol)
        self.indptr = np.asarray(indptr, dtype=np.int32)   # len ncol+1
        self.indices = np.asarray(indices, dtype=np.int32)  # row indices
        self.data = jnp.asarray(data)
        self.sym = sym
        if col_ids is None:
            col_ids = np.repeat(
                np.arange(self.ncol, dtype=np.int32), np.diff(self.indptr)
            )
        self.col_ids = np.asarray(col_ids, dtype=np.int32)

    def tree_flatten(self):
        aux = (self.nrow, self.ncol, self.indptr, self.indices, self.sym,
               self.col_ids)
        return (self.data,), aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        nrow, ncol, indptr, indices, sym, col_ids = aux
        return cls(nrow, ncol, indptr, indices, leaves[0], sym, col_ids=col_ids)

    @classmethod
    def from_coo(cls, coo) -> "CscMatrix":
        ii, jj, vv = coo.triplets()
        order = np.lexsort((ii, jj))
        si, sj = ii[order], jj[order]
        newgrp = np.ones(len(si), dtype=bool)
        if len(si) > 1:
            newgrp[1:] = (si[1:] != si[:-1]) | (sj[1:] != sj[:-1])
        seg = np.cumsum(newgrp) - 1
        nnz = int(seg[-1]) + 1 if len(seg) else 0
        ui = si[newgrp]
        uj = sj[newgrp]
        counts = np.bincount(uj, minlength=coo.ncol)
        indptr = np.zeros(coo.ncol + 1, dtype=np.int32)
        np.cumsum(counts, out=indptr[1:])
        data = np.zeros(nnz, dtype=coo.dtype)
        np.add.at(data, seg, vv[order])
        return cls(coo.nrow, coo.ncol, indptr, ui, data, coo.sym)

    @classmethod
    def from_csr(cls, csr) -> "CscMatrix":
        order = np.lexsort((csr.row_ids, csr.indices))
        counts = np.bincount(csr.indices, minlength=csr.ncol)
        indptr = np.zeros(csr.ncol + 1, dtype=np.int32)
        np.cumsum(counts, out=indptr[1:])
        return cls(csr.nrow, csr.ncol, indptr, csr.row_ids[order],
                   jnp.asarray(csr.data)[order], csr.sym)

    def mat_vec_mul(self, u) -> jax.Array:
        """v = A @ u, jittable (csc_matrix.rs:735 analog)."""
        u = jnp.asarray(u)
        vals = self.data * u[self.col_ids]
        v = jax.ops.segment_sum(vals, jnp.asarray(self.indices),
                                num_segments=self.nrow)
        if self.sym.triangular():
            off = self.indices != self.col_ids
            vals_t = self.data * u[self.indices]
            v = v + jax.ops.segment_sum(
                jnp.where(jnp.asarray(off), vals_t, 0.0 * vals_t),
                jnp.asarray(self.col_ids), num_segments=self.nrow)
        return v

    def to_dense(self) -> np.ndarray:
        a = np.zeros((self.nrow, self.ncol), dtype=np.asarray(self.data).dtype)
        d = np.asarray(self.data)
        a[self.indices, self.col_ids] = d
        if self.sym.triangular():
            off = self.indices != self.col_ids
            a[self.col_ids[off], self.indices[off]] = d[off]
        return a

    @property
    def nnz(self) -> int:
        return len(self.indices)

    def get_info(self):
        return self.nrow, self.ncol, self.nnz, self.sym

    def __repr__(self) -> str:
        return (f"CscMatrix(nrow={self.nrow}, ncol={self.ncol}, nnz={self.nnz}, "
                f"sym={self.sym.name}, dtype={self.data.dtype})")
