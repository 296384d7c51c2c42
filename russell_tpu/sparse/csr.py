"""CSR matrix as a frozen JAX pytree.

Reference contract: russell_sparse/src/csr_matrix.rs — ``from_coo`` sums
duplicate triplets (csr_matrix.rs:332, same semantics as csc_matrix.rs:337),
``mat_vec_mul`` honors triangular symmetric storage.

TPU-first design: the *structure* (indptr/indices + helper index arrays) is
static host NumPy — it defines the compiled program — while the *values* are a
``jax.Array`` leaf. For a frozen structure, new values can be produced inside
jit from new COO values via the precomputed (perm, seg) map
(``values_from_coo``), which is how implicit ODE steppers re-factorize a
Jacobian with changing entries at zero host cost.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.sparse.enums import Sym

__all__ = ["CsrMatrix"]


@jax.tree_util.register_pytree_node_class
class CsrMatrix:
    """Compressed-sparse-row matrix; ``data`` is the only pytree leaf."""

    def __init__(self, nrow, ncol, indptr, indices, data, sym: Sym = Sym.NO,
                 row_ids=None, coo_perm=None, coo_seg=None, coo_nnz=None):
        self.nrow = int(nrow)
        self.ncol = int(ncol)
        self.indptr = np.asarray(indptr, dtype=np.int32)
        self.indices = np.asarray(indices, dtype=np.int32)
        self.data = jnp.asarray(data)
        self.sym = sym
        if row_ids is None:
            row_ids = np.repeat(
                np.arange(self.nrow, dtype=np.int32), np.diff(self.indptr)
            )
        self.row_ids = np.asarray(row_ids, dtype=np.int32)
        # optional COO->CSR value map (set by from_coo)
        self.coo_perm = coo_perm
        self.coo_seg = coo_seg
        self.coo_nnz = coo_nnz

    # -- pytree protocol -----------------------------------------------------

    def tree_flatten(self):
        aux = (self.nrow, self.ncol, self.indptr, self.indices, self.sym,
               self.row_ids, self.coo_perm, self.coo_seg, self.coo_nnz)
        return (self.data,), aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        nrow, ncol, indptr, indices, sym, row_ids, perm, seg, coo_nnz = aux
        return cls(nrow, ncol, indptr, indices, leaves[0], sym,
                   row_ids=row_ids, coo_perm=perm, coo_seg=seg, coo_nnz=coo_nnz)

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_coo(cls, coo) -> "CsrMatrix":
        """Build CSR from a CooMatrix, summing duplicates (csr_matrix.rs:332).

        Also records the (perm, seg) map so future value arrays laid out in
        the same COO order can be converted inside jit (values_from_coo).
        """
        ii, jj, vv = coo.triplets()
        order = np.lexsort((jj, ii))
        si, sj = ii[order], jj[order]
        # unique structural positions
        newgrp = np.ones(len(si), dtype=bool)
        if len(si) > 1:
            newgrp[1:] = (si[1:] != si[:-1]) | (sj[1:] != sj[:-1])
        seg = np.cumsum(newgrp) - 1
        nnz = int(seg[-1]) + 1 if len(seg) else 0
        ui = si[newgrp]
        uj = sj[newgrp]
        counts = np.bincount(ui, minlength=coo.nrow)
        indptr = np.zeros(coo.nrow + 1, dtype=np.int32)
        np.cumsum(counts, out=indptr[1:])
        data = np.zeros(nnz, dtype=coo.dtype)
        np.add.at(data, seg, vv[order])
        return cls(coo.nrow, coo.ncol, indptr, uj, data, coo.sym,
                   coo_perm=order.astype(np.int32), coo_seg=seg.astype(np.int32),
                   coo_nnz=len(si))

    @classmethod
    def from_dense(cls, a, sym: Sym = Sym.NO):
        from russell_tpu.sparse.coo import CooMatrix

        return cls.from_coo(CooMatrix.from_dense(np.asarray(a), sym))

    def values_from_coo(self, coo_values) -> jax.Array:
        """Map a COO-ordered value array onto this structure inside jit.

        ``coo_values`` must follow the same triplet order used by from_coo.
        Duplicates are summed (segment_sum on device).
        """
        if self.coo_perm is None:
            raise ValueError("this CSR was not built via from_coo")
        vals = jnp.asarray(coo_values)
        return jax.ops.segment_sum(
            vals[self.coo_perm], jnp.asarray(self.coo_seg),
            num_segments=len(self.indices),
        )

    def with_values(self, data) -> "CsrMatrix":
        """Same structure, new values (jit-friendly)."""
        return CsrMatrix(self.nrow, self.ncol, self.indptr, self.indices, data,
                         self.sym, row_ids=self.row_ids, coo_perm=self.coo_perm,
                         coo_seg=self.coo_seg, coo_nnz=self.coo_nnz)

    # -- linear algebra --------------------------------------------------------

    def mat_vec_mul(self, u) -> jax.Array:
        """v = A @ u, jittable (gather + segment-sum; mirrors csr_matrix.rs:735).

        Triangular symmetric storage adds the transposed off-diagonal part.
        """
        u = jnp.asarray(u)
        vals = self.data * u[self.indices]
        v = jax.ops.segment_sum(vals, jnp.asarray(self.row_ids),
                                num_segments=self.nrow)
        if self.sym.triangular():
            off = self.row_ids != self.indices  # static numpy mask
            vals_t = self.data * u[self.row_ids]
            v = v + jax.ops.segment_sum(
                jnp.where(jnp.asarray(off), vals_t, 0.0 * vals_t),
                jnp.asarray(self.indices), num_segments=self.nrow)
        return v

    def mat_t_vec_mul(self, u) -> jax.Array:
        u = jnp.asarray(u)
        vals = self.data * u[self.row_ids]
        v = jax.ops.segment_sum(vals, jnp.asarray(self.indices),
                                num_segments=self.ncol)
        if self.sym.triangular():
            off = self.row_ids != self.indices
            vals_t = self.data * u[self.indices]
            v = v + jax.ops.segment_sum(
                jnp.where(jnp.asarray(off), vals_t, 0.0 * vals_t),
                jnp.asarray(self.row_ids), num_segments=self.nrow)
        return v

    def to_dense(self) -> np.ndarray:
        a = np.zeros((self.nrow, self.ncol), dtype=np.asarray(self.data).dtype)
        d = np.asarray(self.data)
        a[self.row_ids, self.indices] = d
        if self.sym.triangular():
            off = self.row_ids != self.indices
            a[self.indices[off], self.row_ids[off]] = d[off]
        return a

    # -- info -------------------------------------------------------------------

    @property
    def nnz(self) -> int:
        return len(self.indices)

    def get_info(self):
        return self.nrow, self.ncol, self.nnz, self.sym

    def __repr__(self) -> str:
        return (f"CsrMatrix(nrow={self.nrow}, ncol={self.ncol}, nnz={self.nnz}, "
                f"sym={self.sym.name}, dtype={self.data.dtype})")
