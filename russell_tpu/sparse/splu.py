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
  dispatched with ``lax.switch``; every hot op is a batched MXU GEMM.
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
    # factorization schedule (padded; 0 = scratch block)
    l_idx: np.ndarray           # (nb, max_l) L-panel storage indices
    u_idx: np.ndarray           # (nb, max_u) U-panel storage indices
    upd_idx: np.ndarray         # (nb, max_l, max_u) Schur targets
    lrow_idx: np.ndarray        # (nb, max_lrow) L blocks left of diagonal
    # solve schedule
    fwd_idx: np.ndarray         # (nb, max_lrow) L_kj storage index (j < k)
    fwd_col: np.ndarray         # (nb, max_lrow) source block column j
    bwd_idx: np.ndarray         # (nb, max_urow) U_kj storage index (j > k)
    bwd_col: np.ndarray         # (nb, max_urow)
    pivot_epsilon: float = 1e-14
    fill_blocks: int = 0
    # level schedule: independent block columns eliminated concurrently
    # (elimination-tree level sets; the supernodal-parallelism analog of
    # MUMPS' multifrontal tree parallelism, here batched onto the MXU).
    # lvl_cols[t] lists the columns of level t, padded with nb (dummy).
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

    # ---- storage assignment as SORTED BLOCK CODES --------------------
    # storage of block (i, j) = position of code i*nb+j in the sorted
    # code list + 1 (0 is the scratch block). All downstream schedule
    # construction is vectorized numpy over these arrays — required to
    # analyze 500k-unknown problems in seconds.
    if filled is not None:
        codes = np.sort(filled[:, 0].astype(np.int64) * nb + filled[:, 1])
    else:
        codes = np.sort(np.fromiter((i * nb + j for (i, j) in pat),
                                    dtype=np.int64, count=len(pat)))
    nblk = len(codes) + 1
    ci = codes // nb
    cj = codes % nb

    def store(ii_, jj_):
        return (np.searchsorted(codes, np.asarray(ii_) * nb
                                + np.asarray(jj_)) + 1).astype(np.int64)

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
    ar = np.arange(nb, dtype=np.int64)
    diag_idx = store(ar, ar)

    # row-major boundaries (codes are sorted by (i, j)); diagonal splits
    rowptr = np.searchsorted(ci, np.arange(nb + 1))
    dpos = np.searchsorted(codes, ar * nb + ar)            # row-left end
    upos = np.searchsorted(codes, ar * nb + ar + 1)        # row-right start
    # column-major view; within a column entries sort by row index
    col_order = np.lexsort((ci, cj))
    ci_c = ci[col_order]
    keys_c = cj[col_order] * nb + ci_c
    st_c = (col_order + 1).astype(np.int64)
    colptr = np.searchsorted(keys_c, ar * nb)
    colptr = np.append(colptr, len(codes))
    ls_ = np.searchsorted(keys_c, ar * nb + ar + 1)        # col-lower start
    dc_ = np.searchsorted(keys_c, ar * nb + ar)            # col-upper end
    nl = colptr[1:] - ls_                                   # lower sizes
    nu = rowptr[1:] - upos                                  # upper sizes
    max_l = int(nl.max()) if nb else 1
    max_u = int(nu.max()) if nb else 1
    max_l = max(max_l, 1)
    max_u = max(max_u, 1)

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

    # legacy padded schedules (used by parallel.dist_splu) — only built
    # at demo scale; the packed schedule below is the real numeric path
    small = nb <= 4096 and nb * max_l * max_u <= 50_000_000
    if small:
        l_idx = np.zeros((nb, max_l), dtype=np.int64)
        u_idx = np.zeros((nb, max_u), dtype=np.int64)
        upd_idx = np.zeros((nb, max_l, max_u), dtype=np.int64)
        lrow_idx = np.zeros(
            (nb, max(int((dpos - rowptr[:-1]).max()) if nb else 1, 1)),
            dtype=np.int64)
        for k in range(nb):
            lk = st_c[ls_[k]:colptr[k + 1]]
            uk = np.arange(upos[k] + 1, rowptr[k + 1] + 1, dtype=np.int64)
            l_idx[k, :nl[k]] = lk
            u_idx[k, :nu[k]] = uk
            if nl[k] and nu[k]:
                ii_ = np.repeat(ci_c[ls_[k]:colptr[k + 1]], nu[k])
                jj_ = np.tile(cj[upos[k]:rowptr[k + 1]], nl[k])
                upd_idx[k, :nl[k], :nu[k]] = store(ii_, jj_).reshape(
                    nl[k], nu[k])
            nlr = dpos[k] - rowptr[k]
            lrow_idx[k, :nlr] = np.arange(rowptr[k] + 1, dpos[k] + 1)
    else:
        l_idx = np.zeros((1, 1), dtype=np.int64)
        u_idx = np.zeros((1, 1), dtype=np.int64)
        upd_idx = np.zeros((1, 1, 1), dtype=np.int64)
        lrow_idx = np.zeros((1, 1), dtype=np.int64)
    fwd_idx = np.zeros((1, 1), dtype=np.int64)   # superseded by packed
    fwd_col = np.zeros((1, 1), dtype=np.int64)
    bwd_idx = np.zeros((1, 1), dtype=np.int64)
    bwd_col = np.zeros((1, 1), dtype=np.int64)

    # chunked level columns (dist_splu + diagnostics)
    W = 32
    while W > 4 and W * max_l * max_u * b * b > 128_000_000:
        W //= 2
    chunks = []
    for bk in buckets:
        for sch in range(0, len(bk), W):
            chunks.append(bk[sch:sch + W])
    chunks = chunks or [np.zeros(0, dtype=np.int64)]
    max_w = max((len(ck) for ck in chunks), default=1) or 1
    lvl_cols = np.full((len(chunks), max_w), nb, dtype=np.int64)
    for t, ck in enumerate(chunks):
        lvl_cols[t, :len(ck)] = ck

    packed = _build_packed_schedule(
        nb, nblk, buckets, b, store, diag_idx,
        st_c, ci_c, ls_, colptr, cj, upos, rowptr, nl, nu)
    packed["fwd"] = _build_packed_solve(nb, buckets, b, rowptr[:-1],
                                        dpos, cj)
    packed["bwd"] = _build_packed_solve(nb, list(reversed(buckets)), b,
                                        upos, rowptr[1:], cj)

    return SpluPlan(
        n=n, b=b, nb=nb, nblk=nblk, perm=perm_old2new,
        scatter_idx=scatter_idx, pad_idx=pad_idx, diag_idx=diag_idx,
        l_idx=l_idx, u_idx=u_idx, upd_idx=upd_idx, lrow_idx=lrow_idx,
        fwd_idx=fwd_idx, fwd_col=fwd_col, bwd_idx=bwd_idx, bwd_col=bwd_col,
        pivot_epsilon=pivot_epsilon, fill_blocks=fill_blocks,
        lvl_cols=lvl_cols, packed=packed)


def _build_packed_schedule(nb, nblk, buckets, bsz, store, diag_idx,
                           st_c, ci_c, ls_, colptr, cj, upos, rowptr,
                           nl, nu):
    """COMPACT static numeric schedule (fully vectorized construction).

    Three row types (dispatched with lax.switch at run time):
      0 INV — invert up to Winv diagonal blocks of one level
      1 PAN — form up to Lcap L-panels  Lhat_ik = A_ik @ Dinv_k
      2 CTR — up to Ccap Schur contributions Lhat_ik @ A_kj, combined by
              a sorted segment_sum and ONE duplicate-free scatter-add

    Every index list holds only REAL work items (plus bounded row
    padding): scatters are in-bounds-unique (pads use distinct
    out-of-bounds ids, mode="drop") and segment ids are sorted — the
    combination XLA:TPU lowers to its fast scatter path."""
    per_row_elems = 4_000_000  # ~16 MB f32 per gathered operand — larger
    # single scatters/segment-sums have crashed the TPU runtime
    cap_items = max(256, per_row_elems // (bsz * bsz))
    Winv = int(min(max(64, 65536 // bsz), max(8, nb)))
    # bound caps by the LARGEST level's real needs — rows of small
    # problems must stay small (padding is processed work)
    max_pan = 1
    max_ctr = 1
    for cols in buckets:
        cols = np.asarray(cols, dtype=np.int64)
        if len(cols):
            max_pan = max(max_pan, int(nl[cols].sum()))
            max_ctr = max(max_ctr, int((nl[cols] * nu[cols]).sum()))
    Lcap = int(min(cap_items, max(32, max_pan)))
    Ccap = int(min(cap_items, max(64, max_ctr)))
    Ucap = int(min(max(64, cap_items // 2), max(64, max_ctr)))

    empty = np.zeros(0, dtype=np.int64)
    rows = []  # (type, payload)
    for cols in buckets:
        cols = np.asarray(cols, dtype=np.int64)
        if not len(cols):
            continue
        inv_chunks = [cols[sch:sch + Winv]
                      for sch in range(0, len(cols), Winv)]
        # panels: src storage (column-lower slices), dinv storage
        pan_src = (np.concatenate([st_c[ls_[k]:colptr[k + 1]]
                                   for k in cols]) if nl[cols].sum()
                   else empty)
        pan_dv = np.repeat(diag_idx[cols], nl[cols])
        pan_chunks = [(pan_src[sch:sch + Lcap], pan_dv[sch:sch + Lcap])
                      for sch in range(0, len(pan_src), Lcap)]
        # contributions: cross products lower x upper per column
        ctr_chunks = []
        ctr_srt = None
        tot = int((nl[cols] * nu[cols]).sum())
        if tot:
            i_all = np.concatenate(
                [np.repeat(ci_c[ls_[k]:colptr[k + 1]], nu[k])
                 for k in cols])
            l_all = np.concatenate(
                [np.repeat(st_c[ls_[k]:colptr[k + 1]], nu[k])
                 for k in cols])
            j_all = np.concatenate(
                [np.tile(cj[upos[k]:rowptr[k + 1]], nl[k]) for k in cols])
            u_all = np.concatenate(
                [np.tile(np.arange(upos[k] + 1, rowptr[k + 1] + 1,
                                   dtype=np.int64), nl[k]) for k in cols])
            t_all = store(i_all, j_all)
            srt = np.argsort(t_all, kind="stable")
            ctr_srt = srt
            t_s, l_s, u_s = t_all[srt], l_all[srt], u_all[srt]
            uniq = np.empty(len(t_s), dtype=bool)
            uniq[0] = True
            uniq[1:] = t_s[1:] != t_s[:-1]
            ucum = np.cumsum(uniq)
            start = 0
            N = len(t_s)
            while start < N:
                e_u = int(np.searchsorted(ucum, ucum[start] + Ucap - 1,
                                          side="right"))
                end = max(min(start + Ccap, e_u, N), start + 1)
                seg = (ucum[start:end] - ucum[start]).astype(np.int64)
                tflags = np.empty(end - start, dtype=bool)
                tflags[0] = True
                tflags[1:] = t_s[start + 1:end] != t_s[start:end - 1]
                ctr_chunks.append((l_s[start:end], u_s[start:end], seg,
                                   t_s[start:end][tflags]))
                start = end
        if (len(inv_chunks) <= 1 and len(pan_chunks) <= 1
                and len(ctr_chunks) <= 1):
            # whole level fits in ONE combined scan row (type 3) — the
            # common case; scan-step count ~= tree depth. Lane arrays
            # let panels read Dinv (and contributions read Lhat) from
            # the row's BATCHES instead of scattered-then-gathered
            # storage, so the row needs exactly ONE scatter.
            pan_lane = np.repeat(np.arange(len(cols), dtype=np.int64),
                                 nl[cols])
            pan_off = np.concatenate(
                [[0], np.cumsum(nl[cols])])[:-1]
            if ctr_chunks:
                lane_parts = [
                    np.repeat(pan_off[a] + np.arange(nl[k],
                                                     dtype=np.int64),
                              nu[k])
                    for a, k in enumerate(cols)]
                c_lane_all = (np.concatenate(lane_parts)
                              if lane_parts else empty)
                c_lane = c_lane_all[ctr_srt]
            else:
                c_lane = empty
            rows.append((3, (inv_chunks[0] if inv_chunks else empty,
                             pan_chunks[0] if pan_chunks else (empty,
                                                               empty),
                             ctr_chunks[0] if ctr_chunks else
                             (empty, empty, empty, empty),
                             pan_lane, c_lane)))
        else:
            for cc in inv_chunks:
                rows.append((0, (cc,)))
            for pc in pan_chunks:
                rows.append((1, pc))
            for tc in ctr_chunks:
                rows.append((2, tc))

    nrows = max(len(rows), 1)
    r_type = np.zeros(nrows, dtype=np.int32)
    # pad columns get DISTINCT ids >= nb so the diagonal scatter's dropped
    # indices stay unique (unique_indices=True contract)
    inv_cols = np.tile(nb + np.arange(Winv, dtype=np.int32), (nrows, 1))
    pan_src_a = np.zeros((nrows, Lcap), dtype=np.int32)
    pan_dinv_a = np.zeros((nrows, Lcap), dtype=np.int32)
    pan_dst_a = np.tile(nblk + Winv + np.arange(Lcap, dtype=np.int32),
                        (nrows, 1))
    c_l = np.zeros((nrows, Ccap), dtype=np.int32)
    c_u = np.zeros((nrows, Ccap), dtype=np.int32)
    c_seg = np.full((nrows, Ccap), Ucap, dtype=np.int32)
    # pad ranges are DISJOINT across sections so a combined scatter's
    # dropped indices stay globally unique
    c_tgt = np.tile(nblk + Winv + Lcap + np.arange(Ucap, dtype=np.int32),
                    (nrows, 1))
    pan_lane_a = np.zeros((nrows, Lcap), dtype=np.int32)
    c_lane_a = np.zeros((nrows, Ccap), dtype=np.int32)
    def put_inv(rr, cc):
        inv_cols[rr, :len(cc)] = cc

    def put_pan(rr, payload):
        src, dv = payload
        pan_src_a[rr, :len(src)] = src
        pan_dinv_a[rr, :len(src)] = dv
        pan_dst_a[rr, :len(src)] = src

    def put_ctr(rr, payload):
        ls2, us2, seg, tg = payload
        c_l[rr, :len(ls2)] = ls2
        c_u[rr, :len(us2)] = us2
        c_seg[rr, :len(seg)] = seg
        c_tgt[rr, :len(tg)] = tg

    for rr, (rt, payload) in enumerate(rows):
        r_type[rr] = rt
        if rt == 0:
            put_inv(rr, payload[0])
        elif rt == 1:
            put_pan(rr, payload)
        elif rt == 2:
            put_ctr(rr, payload)
        else:
            put_inv(rr, payload[0])
            put_pan(rr, payload[1])
            put_ctr(rr, payload[2])
            pan_lane_a[rr, :len(payload[3])] = payload[3]
            c_lane_a[rr, :len(payload[4])] = payload[4]
    return {
        "r_type": r_type, "inv_cols": inv_cols,
        "pan_src": pan_src_a, "pan_dinv": pan_dinv_a, "pan_dst": pan_dst_a,
        "pan_lane": pan_lane_a, "c_lane": c_lane_a,
        "c_l": c_l, "c_u": c_u, "c_seg": c_seg, "c_tgt": c_tgt,
        "Winv": Winv, "Lcap": Lcap, "Ccap": Ccap, "Ucap": Ucap,
    }


def _build_packed_solve(nb, buckets, bsz, start_arr, end_arr, cj):
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
                [np.arange(start_arr[k] + 1, end_arr[k] + 1,
                           dtype=np.int64) for k in ck])                 if sz[g0:gi].sum() else np.zeros(0, dtype=np.int64)
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

    Returns (Dinv, log|det|, min|pivot|, n_perturbed) per batch lane."""
    w, m = D.shape[0], D.shape[-1]
    dtype = D.dtype
    rdt = jnp.zeros((), dtype=dtype).real.dtype
    # augmented [D | I] so each elimination step is ONE fused rank-1 update
    W = jnp.concatenate(
        [D, jnp.broadcast_to(jnp.eye(m, dtype=dtype), D.shape)], axis=-1)
    ld = jnp.zeros(w, dtype=rdt)
    mp = jnp.full(w, jnp.inf, dtype=rdt)
    npert = jnp.zeros(w, dtype=jnp.int32)
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
        ld = ld + jnp.log(jnp.maximum(jnp.abs(pj), 1e-300))
        row = W[:, j, :] / pj[:, None]
        f = W[:, :, j].at[:, j].set(0)
        W = (W - f[:, :, None] * row[:, None, :]).at[:, j, :].set(row)
    return W[:, :, m:], ld, mp, npert


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
    Ai, ld1, mp1, np1 = _inv_block(A, delta)
    AiB = Ai @ B
    CAi = C @ Ai
    S = Dd - C @ AiB
    Si, ld2, mp2, np2 = _inv_block(S, delta)
    SiCAi = Si @ CAi
    X11 = Ai + AiB @ SiCAi
    X12 = -AiB @ Si
    X21 = -SiCAi
    top = jnp.concatenate([X11, X12], axis=-1)
    bot = jnp.concatenate([X21, Si], axis=-1)
    return (jnp.concatenate([top, bot], axis=-2), ld1 + ld2,
            jnp.minimum(mp1, mp2), np1 + np2)


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


def splu_factorize_multi(plan: SpluPlan, datas):
    """Factorize SEVERAL matrices with the same sparsity in ONE scan over
    the packed schedule — the Radau5 real/complex pair shares every
    scan-step's fixed cost (the TPU analog of the reference's 2-thread
    concurrent factorization, P5). dtypes may differ per matrix."""
    b, nb, nblk = plan.b, plan.nb, plan.nblk
    pk = plan.packed

    states = []
    deltas = []
    for data in datas:
        data = jnp.asarray(data)
        dtype = data.dtype
        flat = jnp.zeros(nblk * b * b, dtype=dtype)
        if len(plan.pad_idx):
            flat = flat.at[jnp.asarray(plan.pad_idx)].set(1.0)
        flat = flat.at[jnp.asarray(plan.scatter_idx)].add(data)
        # FLAT block-row storage: gathers and scatters then share one
        # layout (3-D block storage made XLA ping-pong the whole array
        # between a gather layout and a scatter layout EVERY scan row —
        # hundreds of MB of copies per row, seen in the optimized HLO)
        blocks = flat.reshape(nblk, b * b)
        rdt = jnp.zeros((), dtype=dtype).real.dtype
        deltas.append(plan.pivot_epsilon * (1.0 + jnp.max(jnp.abs(data))))
        states.append((blocks, jnp.zeros((), rdt),
                       jnp.asarray(jnp.inf, rdt),
                       jnp.zeros((), jnp.int32)))

    Winv = pk["Winv"]
    diag_g = jnp.asarray(np.concatenate(
        [plan.diag_idx, np.zeros(Winv, dtype=np.int64)]).astype(np.int32))
    diag_s = jnp.asarray(np.concatenate(
        [plan.diag_idx,
         nblk + np.arange(Winv, dtype=np.int64)]).astype(np.int32))
    Ucap = pk["Ucap"]

    xs = {k: jnp.asarray(pk[k]) for k in
          ("r_type", "inv_cols", "pan_src", "pan_dinv", "pan_dst",
           "pan_lane", "c_lane", "c_l", "c_u", "c_seg", "c_tgt")}

    def _g(blocks, idx):
        return blocks[idx].reshape(idx.shape[0], b, b)

    def _v(mats):
        return mats.reshape(mats.shape[0], b * b)

    def do_inv(carry):
        sts, x = carry
        cols = x["inv_cols"]
        live = cols < nb
        out = []
        for (blocks, ld, mp, npert), delta in zip(sts, deltas):
            D = _g(blocks, diag_g[cols])
            Dinv, ldw, mpw, npw = _inv_block(D, delta)
            blocks = blocks.at[diag_s[cols]].set(
                _v(Dinv), mode="drop", unique_indices=True)
            ld = ld + jnp.sum(jnp.where(live, ldw, 0.0))
            mp = jnp.minimum(mp, jnp.min(jnp.where(live, mpw, jnp.inf)))
            npert = npert + jnp.sum(
                jnp.where(live, npw, 0)).astype(jnp.int32)
            out.append((blocks, ld, mp, npert))
        return tuple(out), x

    def do_pan(carry):
        sts, x = carry
        out = []
        for (blocks, ld, mp, npert) in sts:
            A = _g(blocks, x["pan_src"])
            Dv = _g(blocks, x["pan_dinv"])
            Lh = jnp.einsum("cij,cjk->cik", A, Dv,
                            preferred_element_type=blocks.dtype)
            blocks = blocks.at[x["pan_dst"]].set(
                _v(Lh), mode="drop", unique_indices=True)
            out.append((blocks, ld, mp, npert))
        return tuple(out), x

    def do_ctr(carry):
        sts, x = carry
        out = []
        for (blocks, ld, mp, npert) in sts:
            Ls = _g(blocks, x["c_l"])
            Us = _g(blocks, x["c_u"])
            prod = jnp.einsum("cij,cjk->cik", Ls, Us,
                              preferred_element_type=blocks.dtype)
            summed = jax.ops.segment_sum(_v(prod), x["c_seg"],
                                         num_segments=Ucap + 1,
                                         indices_are_sorted=True)
            blocks = blocks.at[x["c_tgt"]].add(
                -summed[:Ucap], mode="drop", unique_indices=True)
            out.append((blocks, ld, mp, npert))
        return tuple(out), x

    def do_all(carry):
        """Merged level row: all three phases with ONE combined scatter.
        Panels read Dinv from the inversion batch (pan_lane) and
        contributions read Lhat from the panel batch (c_lane), so no
        intermediate storage round-trips happen within the row."""
        sts, x = carry
        cols = x["inv_cols"]
        live = cols < nb
        out = []
        for (blocks, ld, mp, npert), delta in zip(sts, deltas):
            D = _g(blocks, diag_g[cols])
            Dinv, ldw, mpw, npw = _inv_block(D, delta)
            A = _g(blocks, x["pan_src"])
            Dv = Dinv[x["pan_lane"]]
            Lh = jnp.einsum("cij,cjk->cik", A, Dv,
                            preferred_element_type=blocks.dtype)
            Ls = Lh[x["c_lane"]]
            Us = _g(blocks, x["c_u"])
            prod = jnp.einsum("cij,cjk->cik", Ls, Us,
                              preferred_element_type=blocks.dtype)
            summed = jax.ops.segment_sum(_v(prod), x["c_seg"],
                                         num_segments=Ucap + 1,
                                         indices_are_sorted=True)
            # SET for the new diagonal inverses + panels (an add of
            # new-old would round at |old|*eps and poison the factors),
            # one ADD for the Schur contributions
            idx_set = jnp.concatenate([diag_s[cols], x["pan_dst"]])
            vals_set = jnp.concatenate([_v(Dinv), _v(Lh)])
            blocks = blocks.at[idx_set].set(vals_set, mode="drop",
                                            unique_indices=True)
            blocks = blocks.at[x["c_tgt"]].add(-summed[:Ucap],
                                               mode="drop",
                                               unique_indices=True)
            ld = ld + jnp.sum(jnp.where(live, ldw, 0.0))
            mp = jnp.minimum(mp, jnp.min(jnp.where(live, mpw, jnp.inf)))
            npert = npert + jnp.sum(
                jnp.where(live, npw, 0)).astype(jnp.int32)
            out.append((blocks, ld, mp, npert))
        return tuple(out), x

    import os as _os
    if _os.environ.get("RUSSELL_TPU_SPLU_NOSWITCH"):
        # storage-based sections are no-ops when padded, so running all
        # three on every row is semantically identical to the dispatch
        # (do_all's lane indexing is only valid on merged rows, so use
        # the storage-based composition here)
        def row_step(sts, x):
            sts, _ = do_ctr(do_pan(do_inv((sts, x))))
            return sts, None
    else:
        def row_step(sts, x):
            sts, _ = lax.switch(x["r_type"],
                                [do_inv, do_pan, do_ctr, do_all],
                                (sts, x))
            return sts, None

    out_states, _ = lax.scan(row_step, tuple(states), xs)
    facs = []
    for (blocks, ld, mp, npert) in out_states:
        facs.append({
            "blocks": blocks,
            "logdet": ld,
            "phase": jnp.ones((), dtype=blocks.dtype),
            "min_pivot": mp,
            "n_perturbed": npert,
        })
    return facs


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
    (Radau5 solves its real and complex Newton systems together)."""
    b, nb = plan.b, plan.nb
    perm = jnp.asarray(plan.perm)
    diag_g = jnp.asarray(np.append(plan.diag_idx, 0).astype(np.int32))

    # flat (nblk, b*b) storage; accept legacy 3-D (e.g. dist_splu)
    blks = []
    for fac in facs:
        bl = fac["blocks"]
        if bl.ndim == 3:
            bl = bl.reshape(bl.shape[0], b * b)
        blks.append(bl)
    bps = []
    for fac, bvec in zip(facs, bvecs):
        dtype = fac["blocks"].dtype
        bp = jnp.zeros(nb * b, dtype=dtype)
        bp = bp.at[perm].set(jnp.asarray(bvec).astype(dtype))
        bps.append(bp.reshape(nb, b))

    def run(direction, rhs_list, apply_dinv):
        pk = plan.packed[direction]
        Ucap = pk["Ucap"]
        xs = {k: jnp.asarray(pk[k]) for k in
              ("src", "col", "seg", "tgt_g", "tgt_s")}

        def row(vs, x):
            out = []
            for v, blocks, rhs_rows in zip(vs, blks, rhs_list):
                dtype = blocks.dtype
                S = blocks[x["src"]].reshape(-1, b, b)  # pad -> zeros
                vj = v[x["col"]]               # (C, b)
                prod = jnp.einsum("cij,cj->ci", S, vj,
                                  preferred_element_type=dtype)
                summed = jax.ops.segment_sum(prod, x["seg"],
                                             num_segments=Ucap + 1,
                                             indices_are_sorted=True)
                rr = rhs_rows[x["tgt_g"]] - summed[:Ucap]
                if apply_dinv:
                    Dv = blocks[diag_g[x["tgt_g"]]].reshape(-1, b, b)
                    rr = jnp.einsum("cij,cj->ci", Dv, rr,
                                    preferred_element_type=dtype)
                out.append(v.at[x["tgt_s"]].set(rr, mode="drop",
                                                unique_indices=True))
            return tuple(out), None

        v0 = tuple(jnp.zeros((nb, b), dtype=bl.dtype) for bl in blks)
        vs, _ = lax.scan(row, v0, xs)
        return vs

    zs = run("fwd", bps, False)
    xs_out = run("bwd", zs, True)
    return [x.reshape(nb * b)[perm] for x in xs_out]
