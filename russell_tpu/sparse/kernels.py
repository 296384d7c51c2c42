"""Pallas TPU kernels for sparse products: BSR SpMV / SpMM, plus SpGEMM.

Reference role: the SpMV of russell_sparse (coo_matrix.rs:547,
csr_matrix.rs:735) executed by the vendor backends. TPU-first design
(BASELINE.json): the matrix is converted once (host) to **block-sparse
rows (BSR)** with MXU-aligned blocks; the kernel walks each block row with
the block-column indices *scalar-prefetched* (pltpu.PrefetchScalarGridSpec)
so the x-panel for each block arrives via async DMA-friendly dynamic
slices — the canonical TPU block-sparse pattern. Padding blocks multiply
zeros (index 0 slice, masked).

SpGEMM keeps the symbolic/numeric split: host computes the product
pattern; the numeric phase is one batched gather-GEMM (MXU) + scatter-add.

All public functions fall back to a segment-sum implementation on
non-TPU backends (tested in interpret mode on CPU).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["BsrMatrix", "bsr_from_coo", "bsr_matvec", "bsr_matmat",
           "spgemm_plan", "spgemm"]


@dataclass(frozen=True)
class BsrMatrix:
    """Block-sparse-row matrix with uniform (bm x bn) blocks.

    blocks[k] is the k-th stored block; rows are padded to ``blocks_per_row``
    with index 0 + mask 0 (slot 0 is a real block; masking handles reuse).
    """

    n_rows: int
    n_cols: int
    bm: int
    bn: int
    nbr: int                     # number of block rows
    blocks_per_row: int          # padded count
    blocks: jnp.ndarray          # (nbr * blocks_per_row, bm, bn)
    col_ids: jnp.ndarray         # (nbr, blocks_per_row) block-col index
    mask: jnp.ndarray            # (nbr, blocks_per_row) 1.0 valid, 0.0 pad

    @property
    def n_rows_pad(self) -> int:
        return self.nbr * self.bm

    @property
    def n_cols_pad(self) -> int:
        return int(self.col_ids.max() + 1) * self.bn if self.col_ids.size \
            else self.bn


def bsr_from_coo(coo, bm: int = 8, bn: int = 128) -> BsrMatrix:
    """Host conversion COO -> BSR with duplicate summation.

    Fully vectorized (sort + unique + scatter-add); no per-entry Python
    loop, so conversion stays O(nnz log nnz) C time at the matrix sizes
    the baseline targets (10^5..10^6 rows)."""
    if coo.sym.triangular():
        raise ValueError("bsr_from_coo requires full (non-triangular) "
                         "storage")
    ii, jj, vv = coo.triplets()
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    vv = np.asarray(vv)
    nbr = -(-coo.nrow // bm)
    nbc = -(-coo.ncol // bn)
    bi = (ii // bm).astype(np.int64)
    bj = (jj // bn).astype(np.int64)
    key = bi * nbc + bj
    ukeys, inv = np.unique(key, return_inverse=True)
    ubi = ukeys // nbc                            # sorted by (bi, bj)
    counts = np.bincount(ubi, minlength=nbr)
    bpr = max(int(counts.max()) if len(ukeys) else 0, 1)
    row_start = np.searchsorted(ubi, np.arange(nbr))
    slot = np.arange(len(ukeys)) - row_start[ubi]  # rank within block row
    storage = ubi * bpr + slot                     # storage id per unique
    blocks = np.zeros((nbr * bpr, bm, bn), dtype=vv.dtype)
    np.add.at(blocks, (storage[inv], ii - bi * bm, jj - bj * bn), vv)
    col_ids = np.zeros((nbr, bpr), dtype=np.int32)
    mask = np.zeros((nbr, bpr), dtype=vv.dtype)
    col_ids.reshape(-1)[storage] = (ukeys % nbc).astype(np.int32)
    mask.reshape(-1)[storage] = 1.0
    return BsrMatrix(coo.nrow, coo.ncol, bm, bn, nbr, bpr,
                     jnp.asarray(blocks), jnp.asarray(col_ids),
                     jnp.asarray(mask))


def _pad_x(bsr: BsrMatrix, x):
    x = jnp.asarray(x)
    ncp = (int(jnp.max(bsr.col_ids)) + 1) * bsr.bn
    ncp = max(ncp, -(-bsr.n_cols // bsr.bn) * bsr.bn)
    if x.ndim == 1:
        return jnp.zeros(ncp, dtype=x.dtype).at[: bsr.n_cols].set(x)
    return jnp.zeros((ncp,) + x.shape[1:], dtype=x.dtype).at[
        : bsr.n_cols].set(x)


def _bsr_matvec_pallas(bsr: BsrMatrix, xp, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm, bn, bpr = bsr.bm, bsr.bn, bsr.blocks_per_row
    nbr = bsr.nbr
    x2 = xp.reshape(-1, bn)
    mask = bsr.mask

    def kernel(cols_ref, blocks_ref, x_ref, mask_ref, out_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        m = mask_ref[0]
        out_ref[:] += (blocks_ref[0] * m) @ x_ref[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, bpr),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda i, s, cols: (i * bpr + s, 0, 0)),
            pl.BlockSpec((1, bn), lambda i, s, cols: (cols[i, s], 0)),
            pl.BlockSpec((1, 1), lambda i, s, cols: (i, s)),
        ],
        out_specs=pl.BlockSpec((bm,), lambda i, s, cols: (i,)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr * bm,), xp.dtype),
        interpret=interpret,
    )(bsr.col_ids, bsr.blocks, x2, mask)
    return out


_pallas_fallback_logged = set()


def _note_pallas_fallback(where: str, e: Exception):
    """Loud Pallas fallback: log once per site; RUSSELL_TPU_STRICT_PALLAS=1
    re-raises so a TPU kernel regression cannot hide behind the XLA path."""
    import os
    if os.environ.get("RUSSELL_TPU_STRICT_PALLAS", "0") not in (
            "0", "", "off", "false"):
        raise e
    if where not in _pallas_fallback_logged:
        _pallas_fallback_logged.add(where)
        import logging
        logging.getLogger(__name__).warning(
            "%s Pallas kernel failed (%s: %s); falling back to the XLA "
            "path. Set RUSSELL_TPU_STRICT_PALLAS=1 to raise instead.",
            where, type(e).__name__, e)


def bsr_matvec(bsr: BsrMatrix, x, use_pallas: bool = True):
    """y = A x through the BSR blocks. Jittable.

    A Pallas kernel failure falls back to the einsum path, but LOUDLY:
    it is logged once, and ``RUSSELL_TPU_STRICT_PALLAS=1`` re-raises
    instead (so a kernel regression on TPU cannot hide behind the
    fallback)."""
    xp = _pad_x(bsr, x)
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas:
        try:
            y = _bsr_matvec_pallas(bsr, xp, interpret=not on_tpu)
            return y[: bsr.n_rows]
        except Exception as e:
            _note_pallas_fallback("bsr_matvec", e)
    x2 = xp.reshape(-1, bsr.bn)
    gathered = x2[bsr.col_ids.reshape(-1)]              # (nbr*bpr, bn)
    prods = jnp.einsum("kij,kj->ki", bsr.blocks
                       * bsr.mask.reshape(-1, 1, 1), gathered)
    y = prods.reshape(bsr.nbr, bsr.blocks_per_row, bsr.bm).sum(axis=1)
    return y.reshape(-1)[: bsr.n_rows]


def _bsr_matmat_pallas(bsr: BsrMatrix, X3, m, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm, bn, bpr = bsr.bm, bsr.bn, bsr.blocks_per_row
    nbr = bsr.nbr

    def kernel(cols_ref, blocks_ref, x_ref, mask_ref, out_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[0] += (blocks_ref[0] * mask_ref[0, 0]) @ x_ref[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbr, bpr),
        in_specs=[
            pl.BlockSpec((1, bm, bn), lambda i, s, cols: (i * bpr + s, 0, 0)),
            pl.BlockSpec((1, bn, m), lambda i, s, cols: (cols[i, s], 0, 0)),
            pl.BlockSpec((1, 1), lambda i, s, cols: (i, s)),
        ],
        out_specs=pl.BlockSpec((1, bm, m), lambda i, s, cols: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nbr, bm, m), X3.dtype),
        interpret=interpret,
    )(bsr.col_ids, bsr.blocks, X3, bsr.mask)
    return out.reshape(nbr * bm, m)


def bsr_matmat(bsr: BsrMatrix, X, use_pallas: bool = True):
    """Y = A X for dense X (n_cols, m) — SpMM. Jittable.

    Pallas block-row kernel on TPU (same scalar-prefetch pattern as
    :func:`bsr_matvec` with (bn, m) x-panels); loud einsum fallback."""
    X = jnp.asarray(X)
    m = X.shape[1]
    Xp = _pad_x(bsr, X)
    X3 = Xp.reshape(-1, bsr.bn, m)
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas:
        try:
            Y = _bsr_matmat_pallas(bsr, X3, m, interpret=not on_tpu)
            return Y[: bsr.n_rows]
        except Exception as e:
            _note_pallas_fallback("bsr_matmat", e)
    gathered = X3[bsr.col_ids.reshape(-1)]              # (nbr*bpr, bn, m)
    prods = jnp.einsum("kij,kjm->kim", bsr.blocks
                       * bsr.mask.reshape(-1, 1, 1), gathered,
                       preferred_element_type=X.dtype)
    Y = prods.reshape(bsr.nbr, bsr.blocks_per_row, bsr.bm, m).sum(axis=1)
    return Y.reshape(-1, m)[: bsr.n_rows]


# ---------------------------------------------------------------------------
# SpGEMM: C = A B with host symbolic pattern + device batched block GEMM
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SpgemmPlan:
    n: int
    b: int
    a_idx: np.ndarray     # (n_ops,) index into A block storage
    b_idx: np.ndarray     # (n_ops,) index into B block storage
    c_idx: np.ndarray     # (n_ops,) destination C block (sorted)
    c_first: np.ndarray   # (n_ops,) 1 at the first op of each C block
    c_blocks: int
    c_block_ij: np.ndarray  # (c_blocks, 2) block coordinates of C


def spgemm_plan(a: BsrMatrix, b: BsrMatrix) -> SpgemmPlan:
    """Symbolic product pattern (host). Fully vectorized: ops are the
    expansion (A block, matching B block) via repeat/searchsorted; C
    blocks come from np.unique of the (i, j) keys. Ops are sorted by
    destination so the numeric phase can stream (segment-sum or the
    Pallas accumulate kernel)."""
    if a.bn != b.bm:
        raise ValueError("inner block dims must agree")
    a_cols = np.asarray(a.col_ids)
    a_mask = np.asarray(a.mask)
    b_cols = np.asarray(b.col_ids)
    b_mask = np.asarray(b.mask)
    ai, as_ = np.nonzero((a_mask > 0) & (a_cols < b.nbr))
    k = a_cols[ai, as_].astype(np.int64)
    bk_idx, bt_idx = np.nonzero(b_mask > 0)       # sorted by B block row
    bcnt = np.bincount(bk_idx, minlength=b.nbr)
    bstart = np.concatenate([[0], np.cumsum(bcnt)])[:-1]
    rep = bcnt[k]
    n_ops = int(rep.sum())
    if n_ops:
        i_op = np.repeat(ai.astype(np.int64), rep)
        a_op = np.repeat(ai * a.blocks_per_row + as_, rep).astype(np.int64)
        offs = np.arange(n_ops) - np.repeat(np.cumsum(rep) - rep, rep)
        sel = np.repeat(bstart[k], rep) + offs
        b_op = (bk_idx[sel] * b.blocks_per_row + bt_idx[sel]).astype(
            np.int64)
        j_op = b_cols[bk_idx[sel], bt_idx[sel]].astype(np.int64)
        nbc_out = max(int(j_op.max()) + 1, 1)
        ckey = i_op * nbc_out + j_op
        ukeys, c_op = np.unique(ckey, return_inverse=True)
        order = np.argsort(c_op, kind="stable")   # stream by destination
        a_op, b_op, c_op = a_op[order], b_op[order], c_op[order]
        first = np.zeros(n_ops, dtype=np.int32)
        first[np.searchsorted(c_op, np.arange(len(ukeys)))] = 1
        cij = np.stack([ukeys // nbc_out, ukeys % nbc_out], axis=1)
    else:
        a_op = b_op = c_op = np.zeros(0, dtype=np.int64)
        first = np.zeros(0, dtype=np.int32)
        cij = np.zeros((1, 2), dtype=np.int64)
    return SpgemmPlan(n=a.n_rows, b=a.bm, a_idx=a_op, b_idx=b_op,
                      c_idx=c_op, c_first=first,
                      c_blocks=max(cij.shape[0], 1), c_block_ij=cij)


def _spgemm_pallas(plan: SpgemmPlan, a: BsrMatrix, b: BsrMatrix,
                   interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bm, bk, bn = a.bm, a.bn, b.bn
    n_ops = len(plan.a_idx)

    def kernel(ai_ref, bi_ref, ci_ref, fr_ref, A_ref, B_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(fr_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[0] += jnp.dot(A_ref[0], B_ref[0],
                              preferred_element_type=out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_ops,),
        in_specs=[
            pl.BlockSpec((1, bm, bk),
                         lambda i, ai, bi, ci, fr: (ai[i], 0, 0)),
            pl.BlockSpec((1, bk, bn),
                         lambda i, ai, bi, ci, fr: (bi[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bm, bn),
                               lambda i, ai, bi, ci, fr: (ci[i], 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.c_blocks, bm, bn),
                                       a.blocks.dtype),
        interpret=interpret,
    )(jnp.asarray(plan.a_idx, jnp.int32), jnp.asarray(plan.b_idx, jnp.int32),
      jnp.asarray(plan.c_idx, jnp.int32), jnp.asarray(plan.c_first),
      a.blocks, b.blocks)


def spgemm(plan: SpgemmPlan, a: BsrMatrix, b: BsrMatrix,
           use_pallas: bool = True):
    """Numeric SpGEMM. Jittable.

    Pallas accumulate kernel on TPU: ops are sorted by destination block,
    so each C block is revisited consecutively — one grid step per block
    product, output block selected by scalar-prefetched ``c_idx``,
    initialized at ``c_first`` (same pattern as the SPLU pair kernel).
    Loud fallback: batched block GEMM + scatter-add.

    Returns (c_blocks_array, c_block_ij) — a BSR-like block list.
    """
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas and len(plan.a_idx):
        try:
            C = _spgemm_pallas(plan, a, b, interpret=not on_tpu)
            return C, plan.c_block_ij
        except Exception as e:
            _note_pallas_fallback("spgemm", e)
    A = a.blocks[jnp.asarray(plan.a_idx)]
    B = b.blocks[jnp.asarray(plan.b_idx)]
    prods = jnp.einsum("kij,kjl->kil", A, B,
                       preferred_element_type=a.blocks.dtype)
    C = jnp.zeros((plan.c_blocks, a.bm, b.bn), dtype=a.blocks.dtype)
    C = C.at[jnp.asarray(plan.c_idx)].add(prods)
    return C, plan.c_block_ij
