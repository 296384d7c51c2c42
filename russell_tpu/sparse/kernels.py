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
    """Host conversion COO -> BSR with duplicate summation."""
    if coo.sym.triangular():
        raise ValueError("bsr_from_coo requires full (non-triangular) "
                         "storage")
    ii, jj, vv = coo.triplets()
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    vv = np.asarray(vv)
    nbr = -(-coo.nrow // bm)
    nbc = -(-coo.ncol // bn)
    bi = ii // bm
    bj = jj // bn
    pairs = {}
    for k in range(len(ii)):
        key = (int(bi[k]), int(bj[k]))
        blk = pairs.get(key)
        if blk is None:
            blk = np.zeros((bm, bn), dtype=vv.dtype)
            pairs[key] = blk
        blk[ii[k] - bi[k] * bm, jj[k] - bj[k] * bn] += vv[k]
    per_row = [[] for _ in range(nbr)]
    for (i, j) in sorted(pairs):
        per_row[i].append(j)
    bpr = max((len(v) for v in per_row), default=1) or 1
    blocks = np.zeros((nbr * bpr, bm, bn), dtype=vv.dtype)
    col_ids = np.zeros((nbr, bpr), dtype=np.int32)
    mask = np.zeros((nbr, bpr), dtype=vv.dtype)
    for i in range(nbr):
        for s, j in enumerate(per_row[i]):
            blocks[i * bpr + s] = pairs[(i, j)]
            col_ids[i, s] = j
            mask[i, s] = 1.0
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


_pallas_fallback_logged = False


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
            import os
            if os.environ.get("RUSSELL_TPU_STRICT_PALLAS", "0") not in (
                    "0", "", "off", "false"):
                raise
            global _pallas_fallback_logged
            if not _pallas_fallback_logged:
                _pallas_fallback_logged = True
                import logging
                logging.getLogger(__name__).warning(
                    "bsr_matvec Pallas kernel failed (%s: %s); falling "
                    "back to the XLA einsum path. Set "
                    "RUSSELL_TPU_STRICT_PALLAS=1 to raise instead.",
                    type(e).__name__, e)
    x2 = xp.reshape(-1, bsr.bn)
    gathered = x2[bsr.col_ids.reshape(-1)]              # (nbr*bpr, bn)
    prods = jnp.einsum("kij,kj->ki", bsr.blocks
                       * bsr.mask.reshape(-1, 1, 1), gathered)
    y = prods.reshape(bsr.nbr, bsr.blocks_per_row, bsr.bm).sum(axis=1)
    return y.reshape(-1)[: bsr.n_rows]


def bsr_matmat(bsr: BsrMatrix, X, use_pallas: bool = True):
    """Y = A X for dense X (n_cols, m) — SpMM. Jittable."""
    X = jnp.asarray(X)
    m = X.shape[1]
    Xp = _pad_x(bsr, X)
    X3 = Xp.reshape(-1, bsr.bn, m)
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
    c_idx: np.ndarray     # (n_ops,) destination C block
    c_blocks: int
    c_block_ij: np.ndarray  # (c_blocks, 2) block coordinates of C


def spgemm_plan(a: BsrMatrix, b: BsrMatrix) -> SpgemmPlan:
    """Symbolic product pattern (host)."""
    if a.bn != b.bm:
        raise ValueError("inner block dims must agree")
    a_cols = np.asarray(a.col_ids)
    a_mask = np.asarray(a.mask)
    b_cols = np.asarray(b.col_ids)
    b_mask = np.asarray(b.mask)
    # map (block row of B) -> list of (slot, block col)
    c_index = {}
    ops = []
    for i in range(a.nbr):
        for s in range(a.blocks_per_row):
            if a_mask[i, s] == 0.0:
                continue
            k = int(a_cols[i, s])
            if k >= b.nbr:
                continue
            for t in range(b.blocks_per_row):
                if b_mask[k, t] == 0.0:
                    continue
                j = int(b_cols[k, t])
                key = (i, j)
                if key not in c_index:
                    c_index[key] = len(c_index)
                ops.append((i * a.blocks_per_row + s,
                            k * b.blocks_per_row + t, c_index[key]))
    ops = np.asarray(ops, dtype=np.int64) if ops else \
        np.zeros((0, 3), dtype=np.int64)
    cij = np.zeros((max(len(c_index), 1), 2), dtype=np.int64)
    for (i, j), q in c_index.items():
        cij[q] = (i, j)
    return SpgemmPlan(n=a.n_rows, b=a.bm, a_idx=ops[:, 0], b_idx=ops[:, 1],
                      c_idx=ops[:, 2], c_blocks=max(len(c_index), 1),
                      c_block_ij=cij)


def spgemm(plan: SpgemmPlan, a: BsrMatrix, b: BsrMatrix):
    """Numeric SpGEMM: batched block GEMM + scatter-add. Jittable.

    Returns (c_blocks_array, c_block_ij) — a BSR-like block list.
    """
    A = a.blocks[jnp.asarray(plan.a_idx)]
    B = b.blocks[jnp.asarray(plan.b_idx)]
    prods = jnp.einsum("kij,kjl->kil", A, B,
                       preferred_element_type=a.blocks.dtype)
    C = jnp.zeros((plan.c_blocks, a.bm, b.bn), dtype=a.blocks.dtype)
    C = C.at[jnp.asarray(plan.c_idx)].add(prods)
    return C, plan.c_block_ij
