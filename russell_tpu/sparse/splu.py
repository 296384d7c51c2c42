"""General sparse LU: block right-looking factorization with host symbolic
analysis — the TPU-native replacement for MUMPS/UMFPACK on general
(non-banded) matrices.

Reference role: the JOB_ANALYZE / JOB_FACTORIZE split of
russell_sparse/c_code/interface_mumps.c and the symbolic/numeric phases of
interface_umfpack.c. Design (SURVEY.md §7 step 4):

- **symbolic (host)**: fill-reducing ordering — nested dissection
  (region-aligned blocks -> wide elimination-tree levels) or minimum
  degree — uniform b x b block partition, symbolic block fill, and a
  fully static PACKED numeric schedule: compact per-row work lists for
  diagonal inversions / L-panel GEMMs / segment-summed Schur updates,
  plus packed substitution schedules for the solves.
- **numeric (device, jittable)**: one ``lax.scan`` over schedule rows
  with a single BRANCH-FREE row body (a whole elimination-tree level is
  usually ONE row); every hot op is a batched MXU GEMM.
  Diagonal blocks are INVERTED (recursive Schur splitting down to a
  Gauss-Jordan base with MUMPS-style static pivot clamping — no XLA LU
  custom call, no pivot vectors); L panels become A_ik @ Dinv_k; Schur
  contributions are combined with a sorted segment_sum and ONE
  in-bounds-unique scatter-add per row (XLA:TPU's scatter fast path).
- **solve (device)**: packed forward/backward block substitution — rows
  of gathered couplings, segment-summed, with a Dinv GEMV on the way
  back; no triangular solves anywhere on the device.

Accuracy on unsymmetric benchmark matrices is recovered with equilibration
plus iterative refinement (factor.py applies both), following the
MUMPS/cuDSS static-pivoting strategy (interface_cudss.cu:288-351).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from russell_tpu.sparse.ordering import mindeg_ordering, symmetrize_pattern
from russell_tpu.sparse.ordering import idx32 as _idx32

__all__ = ["SpluPlan", "splu_analyze", "splu_factorize",
           "splu_factorize_multi", "splu_solve", "splu_solve_multi"]


@dataclass
class SpluPlan:
    """Static description of a block-sparse LU (symbolic output)."""

    n: int
    b: int                      # block size
    nb: int                     # number of block rows/cols
    nblk: int                   # number of stored blocks (+1 scratch at 0)
    perm: np.ndarray            # symmetric permutation (new = perm position)
    scatter_idx: np.ndarray     # flat position per matrix entry
    pad_idx: np.ndarray         # unit-diagonal positions for padding rows
    diag_idx: np.ndarray        # (nb,) storage index of diagonal blocks
    pivot_epsilon: float = 1e-14
    fill_blocks: int = 0
    # elimination-tree level sets (diagnostics: tree depth/width; the
    # numeric schedule below is built from them). lvl_cols[t] lists the
    # block columns of level t, padded with nb (dummy).
    lvl_cols: Optional[np.ndarray] = None   # (nlev, max_w)
    # packed numeric schedule: COMPACT per-row work lists (no per-column
    # padding) — three row types executed by one lax.switch inside one
    # lax.scan. Built by _build_packed_schedule.
    packed: Optional[dict] = None


def splu_analyze(n: int, rows: np.ndarray, cols: np.ndarray,
                 block_size: int = 32, use_amd: bool = True,
                 pivot_epsilon: float = 1e-14,
                 ordering: Optional[str] = None) -> SpluPlan:
    """Symbolic phase: ordering + block pattern + static schedules.

    ``ordering``: "amd" (fill-minimizing, default), "nd" (nested
    dissection: low-depth elimination tree -> wide level-batched numeric
    phase), or "natural"."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    if ordering is None:
        ordering = "amd" if use_amd else "natural"
    b = max(8, int(block_size))
    if ordering == "nd":
        # region-ALIGNED slots: every ND region (leaf/separator) starts at
        # a block boundary, so no block straddles two independent regions
        # — this is what makes the elimination-tree levels WIDE (leaves of
        # disjoint subtrees share no block) and the batched numeric phase
        # effective. Unused slots get a unit diagonal.
        from russell_tpu.sparse.ordering import nd_ordering
        order, sizes = nd_ordering(n, rows, cols, leaf=2 * b,
                                   with_regions=True)
        sizes = np.asarray(sizes, dtype=np.int64)
        starts = np.concatenate(
            [[0], np.cumsum(-(-sizes // b) * b)])
        total_slots = int(starts[-1])
        region_id = np.repeat(np.arange(len(sizes)), sizes)
        region_pos0 = np.concatenate([[0], np.cumsum(sizes)])[:-1]
        slot = starts[region_id] + (np.arange(n) - region_pos0[region_id])
        perm_old2new = np.empty(n, dtype=np.int64)
        perm_old2new[order] = slot
        nb = total_slots // b
        used = np.zeros(nb * b, dtype=bool)
        used[slot] = True
    elif ordering == "amd":
        perm_old2new = np.empty(n, dtype=np.int64)
        order = mindeg_ordering(n, rows, cols)  # order[i] = old index
        perm_old2new[order] = np.arange(n)
        nb = -(-n // b)
        used = np.zeros(nb * b, dtype=bool)
        used[:n] = True
    else:
        perm_old2new = np.arange(n, dtype=np.int64)
        nb = -(-n // b)
        used = np.zeros(nb * b, dtype=bool)
        used[:n] = True

    r = perm_old2new[rows]
    c = perm_old2new[cols]
    bi = r // b
    bj = c // b

    # block pattern + symbolic fill; native C++ path when available
    base_pat = set(zip(bi.tolist(), bj.tolist()))
    from russell_tpu import native
    filled = native.block_fill(nb, bi, bj)
    if filled is not None:
        pat = set(map(tuple, filled.tolist()))
        lower = [[] for _ in range(nb)]
        upper = [[] for _ in range(nb)]
        for (i, j) in pat:
            if i > j:
                lower[j].append(i)
            elif i < j:
                upper[i].append(j)
        for k in range(nb):
            lower[k] = sorted(set(lower[k]))
            upper[k] = sorted(set(upper[k]))
    else:
        pat = set(base_pat)
        for k in range(nb):
            pat.add((k, k))  # diagonal blocks always present
        # symbolic block fill (right-looking)
        lower = [[] for _ in range(nb)]   # lower[k] = [i > k with (i,k)]
        upper = [[] for _ in range(nb)]
        for (i, j) in pat:
            if i > j:
                lower[j].append(i)
            elif i < j:
                upper[i].append(j)
        for k in range(nb):
            Ls = sorted(set(lower[k]))
            Us = sorted(set(upper[k]))
            lower[k] = Ls
            upper[k] = Us
            for i in Ls:
                for j in Us:
                    if (i, j) not in pat:
                        pat.add((i, j))
                        if i > j:
                            lower[j].append(i)
                        elif i < j:
                            upper[i].append(j)
    fill_blocks = len(pat) - len(base_pat)

    # ---- storage assignment: LEFT-LOOKING, level-ordered -------------
    # Block (i, j) is FINALIZED when column k = min(i, j) is eliminated.
    # Storage is ordered by (elimination level of k, section, k, other)
    # with sections diag -> L -> U, so every level's writes form
    # CONTIGUOUS storage ranges: the numeric phase writes with
    # dynamic_update_slice instead of scatter (XLA:TPU scatters are
    # ~1 us per updated row — they dominated the factorization).
    if filled is not None:
        codes = np.sort(filled[:, 0].astype(np.int64) * nb + filled[:, 1])
    else:
        codes = np.sort(np.fromiter((i * nb + j for (i, j) in pat),
                                    dtype=np.int64, count=len(pat)))
    nblk = len(codes) + 1
    ci = codes // nb
    cj = codes % nb
    ar = np.arange(nb, dtype=np.int64)

    # position-space boundaries (codes sorted by (i, j))
    rowptr = np.searchsorted(ci, np.arange(nb + 1))
    dpos = np.searchsorted(codes, ar * nb + ar)            # row-left end
    upos = np.searchsorted(codes, ar * nb + ar + 1)        # row-right start
    col_order = np.lexsort((ci, cj))
    ci_c = ci[col_order]
    keys_c = cj[col_order] * nb + ci_c
    colptr = np.searchsorted(keys_c, ar * nb)
    colptr = np.append(colptr, len(codes))
    ls_ = np.searchsorted(keys_c, ar * nb + ar + 1)        # col-lower start
    dc_ = np.searchsorted(keys_c, ar * nb + ar)            # col-upper end
    nl = colptr[1:] - ls_                                   # lower sizes
    nu = rowptr[1:] - upos                                  # upper sizes
    max_l = max(int(nl.max()) if nb else 1, 1)
    max_u = max(int(nu.max()) if nb else 1, 1)

    # elimination-tree levels: k depends on every j < k with (k,j) or
    # (j,k) present; deps all point backwards so one sweep suffices
    level = np.zeros(nb, dtype=np.int64)
    for k in range(nb):
        m1 = cj[rowptr[k]:dpos[k]]              # (k, j), j < k
        m2 = ci_c[colptr[k]:dc_[k]]             # (j, k), j < k
        lv = 0
        if len(m1):
            lv = int(level[m1].max()) + 1
        if len(m2):
            lv = max(lv, int(level[m2].max()) + 1)
        level[k] = lv
    nlev = int(level.max()) + 1 if nb else 1
    order_lv = np.argsort(level, kind="stable")
    bptr = np.searchsorted(level[order_lv], np.arange(nlev + 1))
    buckets = [order_lv[bptr[t]:bptr[t + 1]] for t in range(nlev)]

    # storage permutation: position -> level-ordered storage id (1-based)
    own_k = np.minimum(ci, cj)
    other = np.maximum(ci, cj)
    section = np.where(ci == cj, 0, np.where(ci > cj, 1, 2))
    blk_lvl = level[own_k]
    ord_st = np.lexsort((other, own_k, section, blk_lvl))
    st_perm = np.empty(len(codes), dtype=np.int64)
    st_perm[ord_st] = np.arange(1, len(codes) + 1)

    def store(ii_, jj_):
        posq = np.searchsorted(codes, np.asarray(ii_) * nb
                               + np.asarray(jj_))
        return st_perm[posq]

    # storage-space boundaries of every (level, section) run
    sec_key = (blk_lvl * 3 + section)[ord_st]
    sec_bounds = np.searchsorted(sec_key, np.arange(3 * nlev + 1)) + 1

    st_c = st_perm[col_order]                  # column-major storages

    scatter_idx = (store(bi, bj) * b * b + (r - bi * b) * b
                   + (c - bj * b)).astype(np.int64)
    pad = np.flatnonzero(~used).astype(np.int64)
    if len(pad):
        pad_bi = pad // b
        pad_loc = pad - pad_bi * b
        pad_idx = (store(pad_bi, pad_bi) * b * b + pad_loc * b
                   + pad_loc).astype(np.int64)
    else:
        pad_idx = np.zeros(0, dtype=np.int64)
    diag_idx = store(ar, ar)

    # level columns, padded (tree-depth/width diagnostics)
    max_w = max((len(bk) for bk in buckets), default=1) or 1
    lvl_cols = np.full((max(len(buckets), 1), max_w), nb, dtype=np.int64)
    for t, bk in enumerate(buckets):
        lvl_cols[t, :len(bk)] = bk

    packed = _build_packed_left(
        nb, nblk, nlev, buckets, b, store, diag_idx, sec_bounds,
        st_c, ci_c, ls_, colptr, cj, upos, rowptr, nl, nu,
        st_perm, ord_st, ci, section, blk_lvl, own_k, other)
    packed["fwd"] = _build_packed_solve(nb, buckets, b, rowptr[:-1],
                                        dpos, cj, st_perm)
    packed["bwd"] = _build_packed_solve(nb, list(reversed(buckets)), b,
                                        upos, rowptr[1:], cj, st_perm)

    return SpluPlan(
        n=n, b=b, nb=nb, nblk=nblk, perm=perm_old2new,
        scatter_idx=scatter_idx, pad_idx=pad_idx, diag_idx=diag_idx,
        pivot_epsilon=pivot_epsilon, fill_blocks=fill_blocks,
        lvl_cols=lvl_cols, packed=packed)


def _build_packed_left(nb, nblk, nlev, buckets, bsz, store, diag_idx,
                       sec_bounds, st_c, ci_c, ls_, colptr, cj, upos,
                       rowptr, nl, nu, st_perm, ord_st, ci, section,
                       blk_lvl, own_k, other):
    """LEFT-LOOKING packed schedule (vectorized construction).

    Contributions Lhat(i,m) @ U(m,j) are grouped by their TARGET block
    (i, j); storage is ordered by the target's finalization level and
    section, so every scan row finalizes one CONTIGUOUS storage range
    [t0, t0+len): gather pairs, segment-sum, subtract from the assembled
    values, post-process by section (invert diagonals / right-multiply
    L panels by Dinv / keep U panels), and write back with ONE
    dynamic_update_slice. No scatters anywhere.

    Row types: 0 = diagonal range, 1 = L range, 2 = U range."""
    bb = bsz * bsz
    TL = max(64, min(1024, 4_000_000 // bb))       # target slots per row
    # pairs per row: every row pays the FULL padded gather (~Ccap * bb
    # floats x3), so a tight cap beats fewer-but-padded rows
    Ccap = max(256, 2_097_152 // bb)

    # enumerate ALL contribution pairs, grouped per SOURCE column m
    l_parts, u_parts, t_parts = [], [], []
    for cols in buckets:
        cols = np.asarray(cols, dtype=np.int64)
        if not len(cols) or not int((nl[cols] * nu[cols]).sum()):
            continue
        i_all = np.concatenate(
            [np.repeat(ci_c[ls_[m]:colptr[m + 1]], nu[m]) for m in cols])
        l_all = np.concatenate(
            [np.repeat(st_c[ls_[m]:colptr[m + 1]], nu[m]) for m in cols])
        j_all = np.concatenate(
            [np.tile(cj[upos[m]:rowptr[m + 1]], nl[m]) for m in cols])
        u_all = np.concatenate(
            [np.tile(st_perm[np.arange(upos[m], rowptr[m + 1])], nl[m])
             for m in cols])
        l_parts.append(l_all)
        u_parts.append(u_all)
        t_parts.append(store(i_all, j_all))
    if t_parts:
        l_glob = np.concatenate(l_parts)
        u_glob = np.concatenate(u_parts)
        t_glob = np.concatenate(t_parts)
        srt = np.argsort(t_glob, kind="stable")
        l_glob, u_glob, t_glob = l_glob[srt], u_glob[srt], t_glob[srt]
    else:
        l_glob = u_glob = t_glob = np.zeros(0, dtype=np.int64)
    # pairs-per-storage-slot prefix (storage ids 1..nblk-1)
    pair_ptr = np.searchsorted(t_glob, np.arange(1, nblk + 1))
    Ccap = int(max(Ccap, np.diff(np.concatenate([[0], pair_ptr])).max()
                   if nblk > 1 else 1))

    # per-L-block diagonal storage (for the Dinv right-multiply),
    # indexed by storage id
    dinv_of_storage = np.zeros(nblk, dtype=np.int64)
    lmask = section[ord_st] == 1                 # storage-ordered sections
    lstor = np.arange(1, nblk)[lmask]
    lcols = own_k[ord_st][lmask]
    dinv_of_storage[lstor] = diag_idx[lcols]

    # ---- row emission -----------------------------------------------
    # Row types: 0 = diag range (invert), 1 = panel range (merged L+U:
    # L lanes multiply by the ALREADY-WRITTEN Dinv from block storage, U
    # lanes by a dedicated IDENTITY block — one einsum serves both),
    # 2 = MERGED level (diag + L + U in ONE row: the L lanes use the
    # Dinv computed in-row, so a whole elimination-tree level costs one
    # scan step). A level falls back to 0+1 rows only when it exceeds
    # the TL/Ccap caps. Pair arrays carry NO dummy lanes (the XLA
    # segment-sum path never needed them; the optional Pallas kernel
    # augments lazily via _pallas_aug).
    id_slot = nblk + TL          # identity block appended by _init_states
    # diag lanes are a PREFIX of every row; capping them (NDcap << TL)
    # bounds the per-row batched-inversion cost, which every row pays in
    # the branch-free body
    ND_EMIT = min(TL, 256)
    rows = []   # (rtype, t0, ln, nd, p0, p1)

    def emit(sec, s0, s1, cap):
        pos = s0
        while pos < s1:
            ln = min(cap, s1 - pos)
            p0 = pair_ptr[pos - 1] if pos > 1 else 0
            # shrink ln so the pair count fits Ccap
            while ln > 1 and (pair_ptr[pos + ln - 1] - p0) > Ccap:
                ln -= 1
            p1 = pair_ptr[pos + ln - 1]
            rows.append((sec, pos, ln, ln if sec == 0 else 0, p0, p1))
            pos += ln

    for t in range(nlev):
        d0 = int(sec_bounds[t * 3])
        d1 = int(sec_bounds[t * 3 + 1])
        u1 = int(sec_bounds[t * 3 + 3])
        total = u1 - d0
        if total <= 0:
            continue
        nd = d1 - d0
        p0 = pair_ptr[d0 - 1] if d0 > 1 else 0
        p1 = pair_ptr[u1 - 1] if u1 > 1 else 0
        if total <= TL and nd <= ND_EMIT and (p1 - p0) <= Ccap:
            rows.append((2, d0, total, nd, p0, p1))
        else:
            emit(0, d0, d1, ND_EMIT)
            emit(1, d1, u1, TL)

    nrows = max(len(rows), 1)
    NDcap = max(8, max((r[3] for r in rows), default=8))
    r_type = np.zeros(nrows, dtype=np.int32)
    r_t0 = np.zeros(nrows, dtype=np.int32)
    r_len = np.zeros(nrows, dtype=np.int32)
    r_nd = np.zeros(nrows, dtype=np.int32)
    pair_l = np.zeros((nrows, Ccap), dtype=np.int32)
    pair_u = np.zeros((nrows, Ccap), dtype=np.int32)
    pair_seg = np.full((nrows, Ccap), TL, dtype=np.int32)
    dinv_a = np.full((nrows, TL), id_slot, dtype=np.int32)
    dloc_a = np.full((nrows, TL), NDcap, dtype=np.int32)
    for rr, (sec, t0, ln, nd, p0, p1) in enumerate(rows):
        r_type[rr] = sec
        r_t0[rr] = t0
        r_len[rr] = ln
        r_nd[rr] = nd
        npair = p1 - p0
        pair_l[rr, :npair] = l_glob[p0:p1]
        pair_u[rr, :npair] = u_glob[p0:p1]
        pair_seg[rr, :npair] = t_glob[p0:p1] - t0
        if sec == 1:
            dv = dinv_of_storage[t0:t0 + ln]
            dinv_a[rr, :ln] = np.where(dv > 0, dv, id_slot)
        elif sec == 2:
            dv = dinv_of_storage[t0:t0 + ln]
            # in-row lane index of the freshly inverted diagonal (NDcap
            # = identity lane for diag/U slots)
            dloc_a[rr, :ln] = np.where(dv > 0, dv - t0, NDcap)
    return {
        "r_type": r_type, "t0": r_t0, "len": r_len, "nd": r_nd,
        "pair_l": pair_l, "pair_u": pair_u, "pair_seg": pair_seg,
        "dinv": dinv_a, "dloc": dloc_a, "TL": TL, "Ccap": Ccap,
        "NDcap": NDcap,
    }


def _build_packed_solve(nb, buckets, bsz, start_arr, end_arr, cj,
                        st_perm):
    """Packed substitution schedule for one direction (vectorized).

    Row k's couplings live at row-major positions [start_arr[k],
    end_arr[k]) — storage = position + 1, source column = cj[position].
    Groups stay COMPLETE within a row (targets are written with set)."""
    cap_items = max(256, 4_000_000 // (bsz * bsz))
    sizes_all = (end_arr - start_arr).astype(np.int64)
    # bound caps by the LARGEST level's real needs (padding is work)
    max_lvl = 1
    max_row = 1
    max_w = 1
    for cols in buckets:
        cols = np.asarray(cols, dtype=np.int64)
        if len(cols):
            sz = sizes_all[cols]
            max_lvl = max(max_lvl, int(sz.sum()))
            max_row = max(max_row, int(sz.max()))
            max_w = max(max_w, len(cols))
    Ccap = int(max(min(cap_items, max(64, max_lvl)), max_row))
    Ucap = int(min(max(1024, cap_items // 8), max(32, max_w)))

    rows = []
    for cols in buckets:
        cols = np.asarray(cols, dtype=np.int64)
        if not len(cols):
            continue
        sz = sizes_all[cols]
        csum = np.cumsum(sz)
        g0 = 0
        G = len(cols)
        while g0 < G:
            base = csum[g0 - 1] if g0 else 0
            gi = int(np.searchsorted(csum, base + Ccap, side="right"))
            gi = max(min(gi, g0 + Ucap, G), g0 + 1)
            ck = cols[g0:gi]
            src = np.concatenate(
                [st_perm[np.arange(start_arr[k], end_arr[k])]
                            for k in ck])                 if sz[g0:gi].sum() else np.zeros(0, dtype=np.int64)
            col = np.concatenate(
                [cj[start_arr[k]:end_arr[k]] for k in ck])                 if sz[g0:gi].sum() else np.zeros(0, dtype=np.int64)
            seg = np.repeat(np.arange(gi - g0, dtype=np.int64), sz[g0:gi])
            rows.append((ck, src, col, seg))
            g0 = gi

    nrows = max(len(rows), 1)
    s_src = np.zeros((nrows, Ccap), dtype=np.int32)
    s_col = np.zeros((nrows, Ccap), dtype=np.int32)
    s_seg = np.full((nrows, Ccap), Ucap, dtype=np.int32)
    s_tgt_g = np.zeros((nrows, Ucap), dtype=np.int32)
    s_tgt_s = np.tile(nb + np.arange(Ucap, dtype=np.int32), (nrows, 1))
    for rr, (ck, src, col, seg) in enumerate(rows):
        s_tgt_g[rr, :len(ck)] = ck
        s_tgt_s[rr, :len(ck)] = ck
        s_src[rr, :len(src)] = src
        s_col[rr, :len(col)] = col
        s_seg[rr, :len(seg)] = seg
    return {"src": s_src, "col": s_col, "seg": s_seg,
            "tgt_g": s_tgt_g, "tgt_s": s_tgt_s, "Ucap": Ucap}


def _gj_inv(D, delta):
    """Batched Gauss-Jordan inverse with MUMPS-style static pivot clamping
    (no row interchanges; tiny pivots replaced by ±delta, counted and
    reported — interface_cudss.cu:288-351 strategy). Elementwise-only, so
    it avoids XLA:TPU's sequential LU custom call.

    Returns (Dinv, log|det|, min|pivot|, n_perturbed, phase) per batch
    lane; ``phase`` is the product of pivot signs (sign of the
    determinant, the MUMPS ICNTL(33) sign; unit-modulus complex phase
    for complex dtypes)."""
    w, m = D.shape[0], D.shape[-1]
    dtype = D.dtype
    rdt = jnp.zeros((), dtype=dtype).real.dtype
    # augmented [D | I] so each elimination step is ONE fused rank-1 update
    W = jnp.concatenate(
        [D, jnp.broadcast_to(jnp.eye(m, dtype=dtype), D.shape)], axis=-1)
    ld = jnp.zeros(w, dtype=rdt)
    mp = jnp.full(w, jnp.inf, dtype=rdt)
    npert = jnp.zeros(w, dtype=jnp.int32)
    ph = jnp.ones(w, dtype=dtype)
    d = delta.astype(rdt)
    for j in range(m):
        pj = W[:, j, j]
        ap = jnp.abs(pj)
        mp = jnp.minimum(mp, ap)
        bad = ap <= d
        npert = npert + bad.astype(jnp.int32)
        unit = jnp.where(ap > 0, pj / jnp.maximum(ap, 1e-300).astype(dtype),
                         jnp.ones((), dtype=dtype))
        pj = jnp.where(bad, unit * d.astype(dtype), pj)
        apj = jnp.abs(pj)
        ph = ph * jnp.where(apj > 0, pj / jnp.maximum(apj, 1e-300)
                            .astype(dtype), jnp.ones((), dtype=dtype))
        ld = ld + jnp.log(jnp.maximum(apj, 1e-300))
        row = W[:, j, :] / pj[:, None]
        f = W[:, :, j].at[:, j].set(0)
        W = (W - f[:, :, None] * row[:, None, :]).at[:, j, :].set(row)
    return W[:, :, m:], ld, mp, npert, ph


def _inv_block(D, delta):
    """Batched inverse of (w, m, m) via recursive 2x2 Schur splitting down
    to a Gauss-Jordan base — the hot path is MXU matmuls.
    log|det D| = log|det A| + log|det S|."""
    m = D.shape[-1]
    if m <= 32:
        return _gj_inv(D, delta)
    h = m // 2
    A, B = D[:, :h, :h], D[:, :h, h:]
    C, Dd = D[:, h:, :h], D[:, h:, h:]
    Ai, ld1, mp1, np1, ph1 = _inv_block(A, delta)
    AiB = Ai @ B
    CAi = C @ Ai
    S = Dd - C @ AiB
    Si, ld2, mp2, np2, ph2 = _inv_block(S, delta)
    SiCAi = Si @ CAi
    X11 = Ai + AiB @ SiCAi
    X12 = -AiB @ Si
    X21 = -SiCAi
    top = jnp.concatenate([X11, X12], axis=-1)
    bot = jnp.concatenate([X21, Si], axis=-1)
    return (jnp.concatenate([top, bot], axis=-2), ld1 + ld2,
            jnp.minimum(mp1, mp2), np1 + np2, ph1 * ph2)


def splu_factorize(plan: SpluPlan, data):
    """Numeric block elimination over the PACKED schedule; ``data`` are the
    entry values in the original entry order. Jittable for a fixed plan.

    TPU-first design — inverse-based elimination where every hot op is a
    batched MXU GEMM and every scatter is compact, in-bounds-unique, and
    (for the Schur combine) a sorted segment_sum:

    - INV rows:  Dinv_k = D_k^{-1} (recursive Schur/Gauss-Jordan, static
      pivot clamping — no XLA LU custom call, no pivot vectors),
    - PAN rows:  Lhat_ik = A_ik @ Dinv_k,
    - CTR rows:  segment-summed  -Lhat_ik @ A_kj  scatter-added into the
      target blocks.

    Independent block columns of each elimination-tree level run
    concurrently (multifrontal tree parallelism on the MXU); U panels are
    the updated A_kj and are never rewritten."""
    return splu_factorize_multi(plan, (data,))[0]


def _pairs_pallas(blocks, pl_idx, pu_idx, seg, first, TL, be,
                  interpret):
    """Segment-summed block pair products via a Pallas TPU kernel.

    One grid step per pair: the pair's two storage blocks stream in via
    scalar-prefetch-indexed DMA, the (be x be) product runs on the MXU,
    and the result accumulates into the output block selected by the
    pair's segment (revisited consecutively — segments are sorted). A
    per-lane dummy pair (first=1, l=u=0 -> scratch zeros) initializes
    each output block. XLA's gather/scatter row ops cost ~300 ns each on
    this TPU; this kernel streams at DMA rate instead.

    ``be`` is the EFFECTIVE block size: b for real matrices, 2b for
    complex ones (stored as the real embedding K = [[R,-I],[I,R]], so
    the product is a plain real matmul). Blocks are viewed as
    (N, be, be); the (1, be, be) pair blocks equal the trailing array
    dims, satisfying the TPU block-shape rule."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = blocks.shape[0]
    b3 = blocks.reshape(N, be, be)
    n_pairs = pl_idx.shape[0]

    def kernel(pl_ref, pu_ref, seg_ref, first_ref, bl_ref, bu_ref,
               out_ref):
        i = pl.program_id(0)

        @pl.when(first_ref[i] == 1)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        out_ref[0] += jnp.dot(bl_ref[0], bu_ref[0],
                              preferred_element_type=out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_pairs,),
        in_specs=[
            pl.BlockSpec((1, be, be),
                         lambda i, pl_, pu_, sg_, fr_: (pl_[i], 0, 0)),
            pl.BlockSpec((1, be, be),
                         lambda i, pl_, pu_, sg_, fr_: (pu_[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, be, be),
                               lambda i, pl_, pu_, sg_, fr_:
                               (sg_[i], 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TL, be, be), blocks.dtype),
        interpret=interpret,
    )(pl_idx, pu_idx, seg, first, b3, b3)
    return out.reshape(TL, be * be)


def _gather_mode():
    """(enabled, interpret) for the Pallas row-gather kernel (DMA-issued
    block gathers). Measured on the attached v5e: XLA's row gather costs
    ~300 ns per 4 KB row (the factorize scan is gather-count bound), but
    one-block-per-DMA issue costs ~780 ns regardless of loop unrolling —
    the DMA descriptor + semaphore machinery dominates — so the kernel
    LOSES to XLA's gather and stays opt-in (RUSSELL_TPU_SPLU_GATHER =
    pallas | xla; default xla). "pallas" off-TPU runs in interpret mode
    so CPU CI exercises the kernel."""
    import os as _os
    mode = _os.environ.get("RUSSELL_TPU_SPLU_GATHER", "xla")
    if mode in ("xla", "auto"):
        return False, False
    return True, jax.default_backend() != "tpu"


def _gather_rows(blocks, idx, interpret=False):
    """``blocks[idx]`` via a Pallas kernel: one async DMA per gathered
    row, issued in chunks of P with a single completion semaphore
    (issue-all / wait-all — the copies overlap each other, and Pallas
    pipelines the output block write-back across grid steps). Rows are
    viewed as (8, W/8) tiles — a free relayout of the row-major storage
    — because Mosaic requires HBM slices 8-row aligned; hence W must be
    a multiple of 1024 (callers guard). ``idx`` length must be a
    multiple of the chunk; schedule widths are powers of two so the
    factorize scan needs no runtime padding."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W = blocks.shape[1]
    C = idx.shape[0]
    P = 128 if W > 4096 else 256
    while C % P:
        P //= 2
    grid = C // P
    b8 = blocks.reshape(blocks.shape[0], 8, W // 8)

    def kernel(idx_ref, blocks_ref, out_ref, sem):
        i = pl.program_id(0)

        def dma(k):
            return pltpu.make_async_copy(
                blocks_ref.at[idx_ref[i * P + k]], out_ref.at[k], sem)

        def issue(k, _):
            dma(k).start()
            return _

        def wait(k, _):
            dma(k).wait()
            return _

        # FULL unroll (Mosaic supports only unroll=1 or =num_steps):
        # straight-line DMA issues — the dynamic loop's per-iteration
        # scalar-core overhead (~700ns) would dominate the copies
        lax.fori_loop(0, P, issue, None, unroll=P)
        lax.fori_loop(0, P, wait, None, unroll=P)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((P, 8, W // 8), lambda i, idx_: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((C, 8, W // 8), blocks.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), b8)
    return out.reshape(C, W)


def _kform_indices(plan: SpluPlan):
    """Map each entry's real-layout position (st*b*b + r*b + c) to its
    FOUR positions in the [[R,-I],[I,R]] real-embedding block (2b x 2b,
    row-major): Re at (r, c) and (r+b, c+b); Im at (r+b, c) and -Im at
    (r, c+b). Host-side numpy (plan arrays are host)."""
    b = plan.b
    bb = b * b
    b2 = 2 * b
    idx = np.asarray(plan.scatter_idx)
    st = idx // bb
    rem = idx - st * bb
    r = rem // b
    c = rem - r * b
    base = st * (4 * bb)
    return (base + r * b2 + c,                # +Re
            base + (r + b) * b2 + (c + b),    # +Re
            base + (r + b) * b2 + c,          # +Im
            base + r * b2 + (c + b))          # -Im


def _init_states(plan: SpluPlan, datas):
    """Assemble entry values into padded block storage. COMPLEX matrices
    are stored as their REAL EMBEDDING K = [[R,-I],[I,R]] per block
    (2b x 2b row-major, flat width 4*b*b): K is closed under add /
    multiply / inverse, so the complex elimination IS the real
    elimination at block size 2b — one einsum per row on bigger (better
    MXU-tiled) blocks instead of 4 plane einsums plus layout shuffles.
    Storage row ``nblk + TL`` holds an IDENTITY block (``id_slot``): the
    branch-free scan row multiplies every non-diagonal lane by a gathered
    per-lane block, and U lanes point here. Returns (states, deltas,
    cplxs); each state is the scan carry (blocks, log|det|, min|pivot|,
    n_perturbed, phase)."""
    b, nblk = plan.b, plan.nblk
    bb = b * b
    TL = plan.packed["TL"]
    nrow_store = nblk + TL + 1
    states, deltas, cplxs = [], [], []
    for data in datas:
        data = jnp.asarray(data)
        cplx = jnp.iscomplexobj(data)
        cplxs.append(cplx)
        if cplx:
            rdt = jnp.real(data).dtype
            i_re1, i_re2, i_im1, i_im2 = _kform_indices(plan)
            flat = jnp.zeros(nrow_store * 4 * bb, dtype=rdt)
            b2 = 2 * b
            ide = (nblk + TL) * 4 * bb + np.arange(b2) * b2 + np.arange(b2)
            flat = flat.at[jnp.asarray(_idx32(ide))].set(1.0)
            if len(plan.pad_idx):
                pidx = np.asarray(plan.pad_idx)
                pst = pidx // bb
                pl_ = (pidx - pst * bb) // b       # diagonal local index
                pbase = pst * (4 * bb)
                flat = flat.at[jnp.asarray(
                    np.concatenate([pbase + pl_ * b2 + pl_,
                                    pbase + (pl_ + b) * b2
                                    + (pl_ + b)]))].set(1.0)
            dre = jnp.real(data)
            dim = jnp.imag(data)
            flat = (flat.at[jnp.asarray(i_re1)].add(dre)
                        .at[jnp.asarray(i_re2)].add(dre)
                        .at[jnp.asarray(i_im1)].add(dim)
                        .at[jnp.asarray(i_im2)].add(-dim))
            blocks = flat.reshape(nrow_store, 4 * bb)
        else:
            rdt = data.dtype
            flat = jnp.zeros(nrow_store * bb, dtype=rdt)
            ide = (nblk + TL) * bb + np.arange(b) * b + np.arange(b)
            flat = flat.at[jnp.asarray(_idx32(ide))].set(1.0)
            if len(plan.pad_idx):
                flat = flat.at[jnp.asarray(_idx32(plan.pad_idx))].set(1.0)
            flat = flat.at[jnp.asarray(_idx32(plan.scatter_idx))].add(data)
            blocks = flat.reshape(nrow_store, bb)
        deltas.append(plan.pivot_epsilon * (1.0 + jnp.max(jnp.abs(data))))
        states.append((blocks, jnp.zeros((), rdt),
                       jnp.asarray(jnp.inf, rdt),
                       jnp.zeros((), jnp.int32),
                       jnp.ones((), rdt)))
    return states, deltas, cplxs


def _pallas_mode():
    """(enabled, interpret) for the pair-contraction Pallas kernel.
    Default OFF: on this TPU the XLA gather + segment-sum path beats the
    per-pair DMA kernel (measured on the brusselator schedules), so the
    kernel is opt-in via RUSSELL_TPU_SPLU_PALLAS=1 — which runs it in
    interpret mode off-TPU so CPU CI exercises the same code path."""
    import os as _os
    use_pallas = _os.environ.get("RUSSELL_TPU_SPLU_PALLAS", "0")
    on = use_pallas not in ("0", "off", "false", "auto")
    return on, on and jax.default_backend() != "tpu"


def _pallas_aug(packed):
    """Pallas-kernel view of the pair schedule: the kernel initializes
    each output block at its segment's FIRST pair, so every lane gets one
    zero dummy pair (l = u = 0 -> scratch block, zero product) merged in
    segment order. Built lazily (numpy) and cached on the plan dict —
    the XLA segment-sum path never needs the dummies."""
    cached = packed.get("_aug")
    if cached is None:
        TL = packed["TL"]
        pl0, pu0, ps0 = (packed["pair_l"], packed["pair_u"],
                         packed["pair_seg"])
        nrows, C = pl0.shape
        lane = np.tile(np.arange(TL, dtype=np.int32), (nrows, 1))
        zs = np.zeros((nrows, TL), dtype=np.int32)
        seg_all = np.concatenate([lane, ps0], axis=1)
        l_all = np.concatenate([zs, pl0], axis=1)
        u_all = np.concatenate([zs, pu0], axis=1)
        first = np.concatenate(
            [np.ones((nrows, TL), dtype=np.int32),
             np.zeros((nrows, C), dtype=np.int32)], axis=1)
        o = np.argsort(seg_all, axis=1, kind="stable")
        take = np.take_along_axis
        cached = {"pair_l": take(l_all, o, 1), "pair_u": take(u_all, o, 1),
                  "pair_seg": take(seg_all, o, 1),
                  "pair_first": take(first, o, 1)}
        packed["_aug"] = cached
    return cached


def _scan_packed(plan: SpluPlan, states, deltas, cplxs, xs,
                 psum_axis=None):
    """Run the packed left-looking elimination scan over schedule rows
    ``xs`` with ONE BRANCH-FREE row body: subtract the segment-summed
    contributions, invert the (prefix) diag lanes, and right-multiply
    every other lane by a per-lane gathered block — the freshly inverted
    in-row diagonal for L lanes of MERGED rows (``dloc``), the
    already-stored Dinv for L lanes of split panel rows (``dinv``), and
    the identity slot for U/diag lanes. No ``lax.switch``: a switch
    closing over (or fed) the factor array made XLA layout-copy it every
    scan row, so the per-row cost scaled with the factor size.

    With ``psum_axis`` (inside shard_map) the pair arrays are the
    per-device slices of the contribution pairs and the segment sums are
    psum-combined — a TRUE sum split over devices, numerically the
    single-chip sum up to float reassociation (safe in f32, unlike
    delta-add combines). Returns the final carries."""
    b = plan.b
    TL = plan.packed["TL"]
    NDcap = plan.packed["NDcap"]
    pallas_on, interpret = _pallas_mode()
    gather_on, g_interp = _gather_mode()
    if psum_axis is not None:
        # the accumulate kernel's per-lane dummy pairs assume the full
        # pair set on one device; the sharded path uses segment_sum+psum
        pallas_on = False
    C = plan.packed["pair_l"].shape[1]
    # the DMA gather needs 8-row-aligned (8, W/8) tiles and chunked
    # index lists (see _gather_rows)
    if gather_on and (C % 64 or TL % 64 or (b * b) % 1024):
        gather_on = False

    def row_step(sts, x):
        lane = jnp.arange(TL, dtype=jnp.int32)
        live = lane < x["len"]
        is_d = lane < x["nd"]            # diag lanes are a row PREFIX
        t0 = x["t0"]
        z0 = jnp.zeros((), dtype=t0.dtype)
        out_states = []
        for (blocks, ld, mp, npert, ph), delta, cplx in zip(
                sts, deltas, cplxs):
            width = blocks.shape[1]
            # complex matrices live as their real embedding K=[[R,-I],
            # [I,R]] (width 4*b*b): the elimination below is the REAL
            # one at effective block size 2b (see _init_states)
            be = 2 * b if cplx else b
            cur = lax.dynamic_slice(blocks, (t0, z0), (TL, width))
            if pallas_on:
                acc = _pairs_pallas(blocks, x["pair_l"], x["pair_u"],
                                    x["pair_seg"], x["pair_first"],
                                    TL, be, interpret=interpret)
                vals = cur - acc
                gd = blocks[x["dinv"]]
            else:
                if gather_on:
                    # ONE DMA-gather per state per row: pair operands
                    # plus the per-lane Dinv multipliers (``dinv``)
                    gall = _gather_rows(
                        blocks,
                        jnp.concatenate([x["pair_l"], x["pair_u"],
                                         x["dinv"]]),
                        interpret=g_interp)
                    gl, gu, gd = gall[:C], gall[C:2 * C], gall[2 * C:]
                else:
                    gl = blocks[x["pair_l"]]
                    gu = blocks[x["pair_u"]]
                    gd = blocks[x["dinv"]]
                Ls = gl.reshape(-1, be, be)
                Us = gu.reshape(-1, be, be)
                prod = jnp.einsum("cij,cjk->cik", Ls, Us,
                                  preferred_element_type=Ls.dtype)
                pr = prod.reshape(-1, width)
                summed = jax.ops.segment_sum(pr, x["pair_seg"],
                                             num_segments=TL + 1,
                                             indices_are_sorted=True)
                if psum_axis is not None:
                    summed = lax.psum(summed, psum_axis)
                vals = cur - summed[:TL]

            v3 = vals.reshape(TL, be, be)
            eye = jnp.eye(be, dtype=blocks.dtype)
            # invert the diag prefix (identity in dead lanes keeps the
            # batch well-conditioned; their stats are masked out)
            Db = jnp.where(is_d[:NDcap, None, None], v3[:NDcap], eye)
            Dinv, ldw, mpw, npw, phw = _inv_block(Db, delta)
            # per-lane right-multiplier: fresh in-row inverse (merged
            # rows), stored Dinv, or the identity slot
            Dtab = jnp.concatenate([Dinv, eye[None]], axis=0)
            Dl = Dtab[x["dloc"]]
            Dg = gd.reshape(TL, be, be)
            Dv = jnp.where((x["dloc"] < NDcap)[:, None, None], Dl, Dg)
            pan = jnp.einsum("cij,cjk->cik", v3, Dv,
                             preferred_element_type=v3.dtype)
            head = jnp.where(is_d[:NDcap, None, None], Dinv, pan[:NDcap])
            newv = jnp.concatenate([head, pan[NDcap:]],
                                   axis=0).reshape(TL, width)
            outv = jnp.where(live[:, None], newv, cur)
            blocks = lax.dynamic_update_slice(blocks, outv, (t0, z0))

            md = is_d[:NDcap]
            ldd = jnp.sum(jnp.where(md, ldw, 0.0))
            mpd = jnp.min(jnp.where(md, mpw, jnp.inf))
            npd = jnp.sum(jnp.where(md, npw, 0)).astype(jnp.int32)
            if cplx:
                # K embedding: det K = |det M|^2 -> halve log|det|; the
                # complex phase of det M is not recoverable (phase 1)
                ldd = 0.5 * ldd
                phd = jnp.ones((), ld.dtype)
            else:
                phd = jnp.prod(jnp.where(md, phw, jnp.ones_like(phw)))
            out_states.append((blocks, ld + ldd, jnp.minimum(mp, mpd),
                               npert + npd, ph * phd))
        return tuple(out_states), None

    out_states, _ = lax.scan(row_step, tuple(states), xs)
    return out_states


def splu_factorize_multi(plan: SpluPlan, datas):
    """Factorize SEVERAL matrices with the same sparsity in ONE scan over
    the packed left-looking schedule (the Radau5 real/complex pair shares
    every scan-step's fixed cost — P5). Scatter-free: each row gathers
    its contribution pairs, segment-sums them, post-processes one
    contiguous storage range, and writes back with dynamic_update_slice.

    COMPLEX matrices are stored block-wise as their REAL EMBEDDING
    K = [[R,-I],[I,R]] (flat width 4*b*b): on this TPU backend complex
    indexed ops (gather / dynamic_update_slice) are four orders of
    magnitude slower than f32, and the earlier split-planes layout paid
    4 small einsums plus layout shuffles per row — the K embedding is
    closed under add/multiply/inverse, so the complex elimination IS
    the real one at effective block size 2b (one bigger, better
    MXU-tiled einsum per row). log|det K| = 2 log|det M|; the embedding
    yields |det M| but not its complex phase, so ``phase`` is exact
    (±1, ICNTL(33)-style sign) for REAL matrices and 1 for complex
    ones."""
    states, deltas, cplxs = _init_states(plan, datas)
    xs = {k: jnp.asarray(_idx32(plan.packed[k])) for k in
          ("t0", "len", "nd", "dinv", "dloc")}
    if _pallas_mode()[0]:
        xs.update({k: jnp.asarray(_idx32(v))
                   for k, v in _pallas_aug(plan.packed).items()})
    else:
        xs.update({k: jnp.asarray(_idx32(plan.packed[k])) for k in
                   ("pair_l", "pair_u", "pair_seg")})
    out_states = _scan_packed(plan, states, deltas, cplxs, xs)
    facs = []
    for (blocks, ld, mp, npert, ph), cplx in zip(out_states, cplxs):
        facs.append({
            "blocks": blocks,            # K-embedding layout iff complex
            "logdet": ld,
            "phase": ph,
            "min_pivot": mp,
            "n_perturbed": npert,
        })
    return facs


def splu_det_phase(plan: SpluPlan, fac):
    """Recover the COMPLEX determinant phase of a K-embedded
    factorization (MUMPS ICNTL(33) full complex determinant contract,
    interface_mumps.c:203-206). Post-pass: runs only when the
    determinant is requested, so the factorization hot loop stays
    phase-free.

    The K = [[R,-I],[I,R]] embedding is closed under add / multiply /
    inverse, so each stored diagonal block is exactly the embedding of
    the complex INVERSE pivot block Minv_k of the complex block LU.
    det(P A P^T) = det(A) for the symmetric fill-reducing permutation
    (sign(P)^2 = 1) and static pivoting does no row interchanges, so

        phase(det A) = conj( prod_k phase(det Minv_k) ).

    Each small complex det phase comes from an unpivoted batched Gauss
    elimination on M = R + i I assembled IN-TRACE with lax.complex
    (complex host<->device transfers are unimplemented on this backend;
    in-trace complex arithmetic is fine). Jittable; returns a real
    (2,) array (re, im) so nothing complex crosses the transfer layer.
    """
    b = plan.b
    bl = fac["blocks"]
    if bl.shape[1] != 4 * b * b:          # real layout: phase is exact
        ph = fac["phase"]
        return jnp.stack([ph.astype(jnp.float64
                                    if bl.dtype == jnp.float64
                                    else jnp.float32),
                          jnp.zeros((), bl.dtype)])
    b2 = 2 * b
    D = bl[jnp.asarray(_idx32(plan.diag_idx))].reshape(-1, b2, b2)
    M = lax.complex(D[:, :b, :b], D[:, b:, :b])
    tot = jnp.conj(jnp.prod(phase_eliminate(M)))
    return jnp.stack([jnp.real(tot), jnp.imag(tot)])


def phase_eliminate(M):
    """Per-lane phase of det(M) for a batched (w, m, m) COMPLEX array via
    unpivoted Gauss-Jordan (after column-j elimination the remaining
    diagonal equals the LU pivot sequence, so the product of pivot
    phases is the determinant phase). Static pivoting upstream means no
    row-interchange signs to track. Jittable; all complex arithmetic
    stays in-trace."""
    w, m = M.shape[0], M.shape[-1]
    ph = jnp.ones(w, dtype=M.dtype)
    tiny = jnp.asarray(1e-300 if M.real.dtype == jnp.float64 else 1e-30,
                       M.real.dtype)
    for j in range(m):
        pj = M[:, j, j]
        ap = jnp.abs(pj)
        unit = jnp.where(ap > tiny, pj / jnp.maximum(ap, tiny)
                         .astype(M.dtype), jnp.ones((), M.dtype))
        ph = ph * unit
        safe = jnp.where(ap > tiny, pj, jnp.ones((), M.dtype))
        row = M[:, j, :] / safe[:, None]
        f = M[:, :, j].at[:, j].set(0)
        M = M - f[:, :, None] * row[:, None, :]
    return ph


def splu_solve(plan: SpluPlan, fac, bvec):
    """x = A^{-1} b via packed block substitution. Jittable.

    Forward: z_k = b_k - sum_{j<k} Lhat_kj z_j (tree levels ascending).
    Backward: x_k = Dinv_k (z_k - sum_{j>k} A_kj x_j) (descending).
    Each scan row combines a compact gather of couplings with a sorted
    segment_sum and one in-bounds-unique scatter — all GEMV/GEMM, no
    triangular solves on device."""
    return splu_solve_multi(plan, (fac,), (bvec,))[0]


def splu_solve_multi(plan: SpluPlan, facs, bvecs):
    """Solve SEVERAL systems (their own factors and right-hand sides, same
    sparsity plan) in ONE pass — the scan-step fixed costs are shared
    (Radau5 solves its real and complex Newton systems together).
    Complex systems run on the real K embedding end to end (see
    splu_factorize_multi): the substitution is the real one at width
    2b on stacked [re; im] vector blocks."""
    b, nb = plan.b, plan.nb
    bb = b * b
    perm = jnp.asarray(_idx32(plan.perm))
    diag_g = jnp.asarray(np.append(plan.diag_idx, 0).astype(np.int32))

    blks = []
    cplxs = []
    bps = []
    for fac, bvec in zip(facs, bvecs):
        bl = fac["blocks"]
        cplx = bl.shape[1] == 4 * bb   # K-embedding layout (static shape)
        blks.append(bl)
        cplxs.append(cplx)
        bvec = jnp.asarray(bvec)
        if cplx:
            # K = [[R,-I],[I,R]] acts on stacked [re; im] vector blocks:
            # K @ [re; im] = [Re(Mx); Im(Mx)] — the complex substitution
            # is the real one at width 2b
            rdt = bl.dtype
            bpr = jnp.zeros(nb * b, dtype=rdt).at[perm].set(
                jnp.real(bvec).astype(rdt))
            bpi = jnp.zeros(nb * b, dtype=rdt).at[perm].set(
                jnp.imag(bvec).astype(rdt))
            bp = jnp.concatenate(
                [bpr.reshape(nb, 1, b), bpi.reshape(nb, 1, b)],
                axis=1).reshape(nb, 2 * b)
        else:
            bp = jnp.zeros(nb * b, dtype=bl.dtype).at[perm].set(
                bvec.astype(bl.dtype)).reshape(nb, b)
        bps.append(bp)

    def run(direction, rhs_list, apply_dinv):
        pk = plan.packed[direction]
        Ucap = pk["Ucap"]
        xs = {k: jnp.asarray(_idx32(pk[k])) for k in
              ("src", "col", "seg", "tgt_g", "tgt_s")}

        def row(vs, x):
            out = []
            for v, bl, rhs_rows, cplx in zip(vs, blks, rhs_list, cplxs):
                be = 2 * b if cplx else b
                S = bl[x["src"]].reshape(-1, be, be)
                vj = v[x["col"]]
                prod = jnp.einsum("cij,cj->ci", S, vj,
                                  preferred_element_type=bl.dtype)
                summed = jax.ops.segment_sum(
                    prod, x["seg"], num_segments=Ucap + 1,
                    indices_are_sorted=True)
                rr = rhs_rows[x["tgt_g"]] - summed[:Ucap]
                if apply_dinv:
                    Dv = bl[diag_g[x["tgt_g"]]].reshape(-1, be, be)
                    rr = jnp.einsum("cij,cj->ci", Dv, rr,
                                    preferred_element_type=bl.dtype)
                out.append(v.at[x["tgt_s"]].set(rr, mode="drop",
                                                unique_indices=True))
            return tuple(out), None

        v0 = tuple(jnp.zeros((nb, (2 if c else 1) * b), dtype=bl.dtype)
                   for bl, c in zip(blks, cplxs))
        vs, _ = lax.scan(row, v0, xs)
        return vs

    zs = run("fwd", bps, False)
    xs_out = run("bwd", zs, True)
    outs = []
    for x, cplx in zip(xs_out, cplxs):
        if cplx:
            cdt = (jnp.complex64 if x.dtype == jnp.float32
                   else jnp.complex128)
            v = x.reshape(nb, 2, b)
            xc = (v[:, 0].astype(cdt)
                  + 1j * v[:, 1].astype(cdt)).reshape(nb * b)
            outs.append(xc[perm])
        else:
            outs.append(x.reshape(nb * b)[perm])
    return outs
