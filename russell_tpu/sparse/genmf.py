"""General-matrix nested-dissection multifrontal solver (GENMF).

Extends GRIDMF's winning idea — congruent dense fronts processed as one
batched MXU pipeline per stage — to ARBITRARY sparse patterns (the role
of MUMPS/UMFPACK on irregular matrices, e.g. the reference's Raj1 /
ASIC_680k benchmark logs, russell_sparse/data/logs/Raj1_MUMPS.json).
Where GRIDMF exploits exact congruence of a regular grid's separators,
GENMF builds a nested-dissection tree on the general adjacency graph and
*manufactures* congruence by bucketing fronts into padded size classes:

- **host symbolic**: recursive vertex bisection (George–Liu: pseudo-
  peripheral BFS, median level-set separator, trimmed to vertices that
  actually face the far side). Each tree node eliminates its separator
  (or leaf remainder) and keeps the boundary ``N(subtree) \\ subtree``
  — by the separator property that boundary is contained in the
  parent's ``elim ∪ keep``, which makes the child→parent extend-add a
  position map. Nodes are grouped into (depth, e_pad, r_pad) classes
  with geometric padding, so every class runs one batched dense
  pipeline; padded pivot slots get a unit diagonal (logdet 0), padded
  keep slots stay identically zero end to end.
- **device numeric**: per class (deepest first): assemble entries (one
  pre-summed scatter-add), extend-add children Schur complements (two
  ``take_along_axis`` gathers per child-class link + one leading-axis
  scatter-add), invert the pivot block (``splu._inv_block``: recursive
  Schur, MUMPS-style static pivot clamping), panel + Schur complement
  as batched MXU einsums. Complex runs as real/imag PLANES (Karatsuba
  matmuls) exactly like GRIDMF — complex64 host transfers are
  unimplemented on the attached backend.

Unlike GRIDMF's per-depth CONSTANT embedding (a compile-time one-hot),
the per-node maps here are data gathers — the price of generality.
Everything else (the flop-dominant pivot inversion and Schur GEMMs)
stays batched dense on the MXU, which is what removes SPLU's ~300 ns
per-row gather bound on this backend (see sparse/splu.py notes).

Reference role: analyze/factorize/solve of MUMPS on general matrices
(interface_mumps.c JOB_ANALYZE/FACTORIZE/SOLVE); orderings analog:
enums.rs Ordering::Metis (nested dissection).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from russell_tpu.sparse.splu import _inv_block
from russell_tpu.sparse.gridmf import _mm, _inv_planes, _idx32

__all__ = ["GenMfPlan", "genmf_analyze", "genmf_factorize", "genmf_solve",
           "genmf_factorize_steps", "genmf_solve_steps"]


# ---------------------------------------------------------------------------
# host symbolic phase
# ---------------------------------------------------------------------------


def _adjacency(n: int, rows: np.ndarray, cols: np.ndarray):
    """Symmetrized, dedup'd CSR adjacency of the pattern, no diagonal."""
    m = rows != cols
    r = np.concatenate([rows[m], cols[m]])
    c = np.concatenate([cols[m], rows[m]])
    key = np.unique(r * np.int64(n) + c)
    r = (key // n).astype(np.int64)
    c = (key % n).astype(np.int64)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(r, minlength=n), out=indptr[1:])
    return indptr, c


def _neighbors(indptr, adj, verts):
    """All neighbors of ``verts`` (with duplicates)."""
    starts = indptr[verts]
    counts = indptr[verts + 1] - starts
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    idx = np.repeat(starts, counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(counts) - counts, counts))
    return adj[idx]


def _bfs_levels(indptr, adj, inset, start, level):
    """BFS level structure within ``inset`` from ``start``; fills
    ``level`` (callers pre-reset their region to -1). Returns
    (levels list of vertex arrays, last frontier's last vertex)."""
    level[start] = 0
    frontier = np.array([start], dtype=np.int64)
    levels = [frontier]
    while True:
        nbr = _neighbors(indptr, adj, frontier)
        nbr = nbr[inset[nbr] & (level[nbr] < 0)]
        if len(nbr) == 0:
            break
        nbr = np.unique(nbr)
        level[nbr] = len(levels)
        levels.append(nbr)
        frontier = nbr
    return levels


@dataclass
class _Node:
    elim: np.ndarray      # eliminated vars (separator or leaf), sorted
    keep: np.ndarray      # boundary N(subtree)\subtree, sorted
    parent: int           # node index or -1
    depth: int


def _build_tree(n, indptr, adj, leaf_target) -> List[_Node]:
    """Nested-dissection tree by recursive level-set bisection."""
    nodes: List[_Node] = []
    level = np.full(n, -1, dtype=np.int64)
    inset = np.zeros(n, dtype=bool)
    all_verts = np.arange(n, dtype=np.int64)
    # task: (verts, keep, parent, depth)
    stack = [(all_verts, np.zeros(0, dtype=np.int64), -1, 0)]
    while stack:
        verts, keep, parent, depth = stack.pop()
        if len(verts) <= leaf_target:
            nodes.append(_Node(np.sort(verts), keep, parent, depth))
            continue
        inset[verts] = True
        level[verts] = -1
        # pseudo-peripheral start: min-degree seed, two BFS sweeps
        degs = indptr[verts + 1] - indptr[verts]
        start = verts[int(np.argmin(degs))]
        levels = _bfs_levels(indptr, adj, inset, start, level)
        if len(levels[-1]):
            level[verts] = -1
            levels = _bfs_levels(indptr, adj, inset, levels[-1][-1], level)
        nreach = sum(len(lv) for lv in levels)
        if nreach < len(verts):
            # disconnected: recurse per piece (no separator between them)
            inset[verts] = False
            reached = np.concatenate(levels)
            um = np.ones(n, dtype=bool)
            um[reached] = False
            unreached = verts[um[verts]]
            for piece in (reached, unreached):
                # pieces are unions of components of the induced
                # subgraph, so N(piece)\piece never touches verts: it is
                # a subset of keep(V)
                pk = np.setdiff1d(np.unique(_neighbors(indptr, adj, piece)),
                                  piece, assume_unique=False)
                stack.append((piece, np.sort(pk), parent, depth))
            continue
        if len(levels) < 3:
            # connected, diameter < 2: cannot bisect — emit as one node
            inset[verts] = False
            nodes.append(_Node(np.sort(verts), keep, parent, depth))
            continue
        # median level split
        sizes = np.array([len(lv) for lv in levels])
        cum = np.cumsum(sizes)
        half = int(np.searchsorted(cum, nreach // 2))
        half = min(max(half, 1), len(levels) - 2)
        sep0 = levels[half]
        # trim: separator members with no neighbor beyond the split line
        # belong to the near side (George–Liu minimal separator step)
        nbrs = _neighbors(indptr, adj, sep0)
        counts = indptr[sep0 + 1] - indptr[sep0]
        far = inset[nbrs] & (level[nbrs] > half)
        seg = np.repeat(np.arange(len(sep0)), counts)
        faces_far = np.bincount(seg[far], minlength=len(sep0)) > 0
        sep = sep0[faces_far]
        if len(sep) == 0:
            sep = sep0
            faces_far = np.ones(len(sep0), dtype=bool)
        a_side = np.concatenate(levels[:half] + [sep0[~faces_far]])
        b_side = np.concatenate(levels[half + 1:])
        inset[verts] = False
        me = len(nodes)
        nodes.append(_Node(np.sort(sep), keep, parent, depth))
        for side in (a_side, b_side):
            if len(side) == 0:
                continue
            sk = np.setdiff1d(np.unique(_neighbors(indptr, adj, side)),
                              side, assume_unique=False)
            stack.append((side, np.sort(sk), me, depth + 1))
    return nodes


_BUCKETS = np.array(
    [1, 2, 4, 8, 16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512, 768,
     1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288, 16384, 24576, 32768],
    dtype=np.int64)


def _bucket(v: int) -> int:
    i = int(np.searchsorted(_BUCKETS, max(v, 1)))
    if i < len(_BUCKETS):
        return int(_BUCKETS[i])
    return int(-(-v // 1024) * 1024)


@dataclass
class _GLink:
    """Extend-add of one child class's Schur into one parent class."""

    src: int                   # child class index
    parent_slot: np.ndarray    # (m,) rows in the parent class batch
    child_slot: np.ndarray     # (m,) rows in the child class batch
    inv: np.ndarray            # (m, F_parent): child keep pos or r_src(=0)
    fwd: np.ndarray            # (m, r_src): parent front pos or F_parent(=0)


@dataclass
class _GClass:
    """One (depth, e_pad, r_pad) congruence class (host arrays)."""

    depth: int
    e: int
    r: int
    n_nodes: int
    elim_var: np.ndarray = None     # (n_nodes, e) global var or n (pad)
    pad_diag: np.ndarray = None     # flat idx into (n_nodes*F*F): +1.0
    asm_idx: np.ndarray = None
    asm_off: int = 0
    asm_len: int = 0
    links: List[_GLink] = field(default_factory=list)

    @property
    def F(self):
        return self.e + self.r


@dataclass
class GenMfPlan:
    """Symbolic output. ``classes`` is ordered deepest-first (the device
    elimination order); links always point from a later (deeper) class
    to an earlier one."""

    n: int
    classes: List[_GClass] = field(default_factory=list)
    entry_perm: np.ndarray = None
    entry_seg: np.ndarray = None
    n_uniq: int = 0
    pivot_epsilon: float = 1e-14
    flops: int = 0                   # factorization flop estimate
    store_f32_gb: float = 0.0        # per-plane factor storage

    def stats_dict(self):
        return {"n_classes": len(self.classes),
                "n_fronts": int(sum(c.n_nodes for c in self.classes)),
                "flops": int(self.flops),
                "store_f32_gb": round(self.store_f32_gb, 3)}


def genmf_analyze(n: int, rows, cols, leaf_target: int = 96,
                  pivot_epsilon: float = 1e-14) -> GenMfPlan:
    """Symbolic phase for a general pattern (no grid hint needed)."""
    rows = np.asarray(rows, dtype=np.int64)
    cols = np.asarray(cols, dtype=np.int64)
    indptr, adj = _adjacency(n, rows, cols)
    nodes = _build_tree(n, indptr, adj, leaf_target)

    # var -> (home node, elim position)
    home = np.full(n, -1, dtype=np.int64)
    epos = np.full(n, -1, dtype=np.int64)
    for t, nd in enumerate(nodes):
        home[nd.elim] = t
        epos[nd.elim] = np.arange(len(nd.elim))
    assert np.all(home >= 0), "every var must be eliminated exactly once"

    # classes
    cls_of: Dict[Tuple[int, int, int], int] = {}
    classes: List[_GClass] = []
    node_cls = np.zeros(len(nodes), dtype=np.int64)
    node_slot = np.zeros(len(nodes), dtype=np.int64)
    for t, nd in enumerate(nodes):
        key = (nd.depth, _bucket(len(nd.elim)), _bucket(len(nd.keep))
               if len(nd.keep) else 0)
        if key not in cls_of:
            cls_of[key] = len(classes)
            classes.append(_GClass(depth=key[0], e=key[1], r=key[2],
                                   n_nodes=0))
        ci = cls_of[key]
        node_cls[t] = ci
        node_slot[t] = classes[ci].n_nodes
        classes[ci].n_nodes += 1

    # order classes deepest-first; links then always point backwards
    order = sorted(range(len(classes)),
                   key=lambda i: (-classes[i].depth, i))
    rank = np.zeros(len(classes), dtype=np.int64)
    for newi, oldi in enumerate(order):
        rank[oldi] = newi
    classes = [classes[i] for i in order]
    node_cls = rank[node_cls]

    # per-class buffers
    for c in classes:
        c.elim_var = np.full((c.n_nodes, c.e), n, dtype=np.int64)
        c._pd = []
    for t, nd in enumerate(nodes):
        c = classes[node_cls[t]]
        sl = node_slot[t]
        e_real = len(nd.elim)
        c.elim_var[sl, :e_real] = nd.elim
        if e_real < c.e:
            F = c.F
            pd = (sl * F + np.arange(e_real, c.e)) * F \
                + np.arange(e_real, c.e)
            c._pd.append(pd)
    for c in classes:
        c.pad_diag = (np.concatenate(c._pd).astype(np.int64)
                      if c._pd else np.zeros(0, dtype=np.int64))
        del c._pd

    # entry assembly: home node of an entry is the DEEPER endpoint's node
    depth_of = np.array([nd.depth for nd in nodes], dtype=np.int64)
    di = depth_of[home[rows]]
    dj = depth_of[home[cols]]
    hn = np.where(di >= dj, home[rows], home[cols])
    # keep slots start at the CLASS-PADDED e, not the node's real e
    epad_of = np.array([classes[node_cls[t]].e for t in range(len(nodes))],
                       dtype=np.int64)
    keep_off = np.zeros(len(nodes) + 1, dtype=np.int64)
    keep_off[1:] = np.cumsum([len(nd.keep) for nd in nodes])
    keep_cat = (np.concatenate([nd.keep for nd in nodes])
                if keep_off[-1] else np.zeros(0, dtype=np.int64))

    def pos_in(vals, hn):
        """Front position of each var within its (padded) home front;
        vectorized per-segment binary search over concatenated keeps."""
        pos = np.empty(len(vals), dtype=np.int64)
        is_elim = home[vals] == hn
        pos[is_elim] = epos[vals[is_elim]]
        rest = np.nonzero(~is_elim)[0]
        if len(rest):
            h = hn[rest]
            v = vals[rest]
            lo = keep_off[h]
            hi = keep_off[h + 1]
            l, r = lo.copy(), hi.copy()
            while np.any(l < r):
                mid = (l + r) // 2
                go_r = keep_cat[np.minimum(mid, len(keep_cat) - 1)] < v
                l = np.where((l < r) & go_r, mid + 1, l)
                r = np.where((l < r) & ~go_r, mid, r)
            found = (l < hi) & (keep_cat[np.minimum(
                l, max(len(keep_cat) - 1, 0))] == v)
            assert np.all(found), "entry endpoint outside home front"
            pos[rest] = epad_of[h] + (l - lo)
        return pos

    pi = pos_in(rows, hn)
    pj = pos_in(cols, hn)

    # global flat key: (class rank, slot, pi, pj)
    Fs = np.array([c.F for c in classes], dtype=np.int64)
    cls_e = node_cls[hn]
    F_e = Fs[cls_e]
    flat = (node_slot[hn] * F_e + pi) * F_e + pj
    stride = int(flat.max()) + 2 if len(flat) else 2
    key = cls_e * stride + flat
    order_e = np.argsort(key, kind="stable")
    uk, seg = np.unique(key[order_e], return_inverse=True)
    ud = uk // stride
    uflat = uk % stride
    for ci, c in enumerate(classes):
        sel = ud == ci
        c.asm_idx = uflat[sel].astype(np.int64)
        c.asm_off = int(np.searchsorted(ud, ci, side="left"))
        c.asm_len = int(sel.sum())

    # child -> parent links grouped by (parent class, child class)
    groups: Dict[Tuple[int, int], list] = {}
    for t, nd in enumerate(nodes):
        if nd.parent < 0 or len(nd.keep) == 0:
            continue
        p = nd.parent
        pc, cc = int(node_cls[p]), int(node_cls[t])
        groups.setdefault((pc, cc), []).append((p, t))
    for (pc, cc), pairs in groups.items():
        P, C = classes[pc], classes[cc]
        m = len(pairs)
        inv = np.full((m, P.F), C.r, dtype=np.int64)
        fwd = np.full((m, C.r), P.F, dtype=np.int64)
        pslot = np.empty(m, dtype=np.int64)
        cslot = np.empty(m, dtype=np.int64)
        for i, (p, t) in enumerate(pairs):
            pn, cn = nodes[p], nodes[t]
            pslot[i] = node_slot[p]
            cslot[i] = node_slot[t]
            # map child keep vars into the parent's (elim ++ keep) front
            kv = cn.keep
            in_elim = home[kv] == p
            ppos = np.empty(len(kv), dtype=np.int64)
            ppos[in_elim] = epos[kv[in_elim]]
            if np.any(~in_elim):
                j = np.searchsorted(pn.keep, kv[~in_elim])
                assert np.all((j < len(pn.keep))
                              & (pn.keep[np.minimum(j, len(pn.keep) - 1)]
                                 == kv[~in_elim])), \
                    "child keep var outside parent front"
                ppos[~in_elim] = P.e + j  # keep slots start at padded e
            inv[i, ppos] = np.arange(len(kv))
            fwd[i, :len(kv)] = ppos
        P.links.append(_GLink(src=cc, parent_slot=pslot, child_slot=cslot,
                              inv=inv, fwd=fwd))

    flops = 0
    store = 0
    for c in classes:
        e, r, m = c.e, c.r, c.n_nodes
        flops += m * (2 * e ** 3 + 2 * r * e * e + 2 * r * e * r)
        store += m * (e * e + 2 * r * e)
    plan = GenMfPlan(n=n, classes=classes,
                     entry_perm=order_e.astype(np.int64),
                     entry_seg=seg.astype(np.int64), n_uniq=len(uk),
                     pivot_epsilon=pivot_epsilon, flops=int(flops),
                     store_f32_gb=store * 4 / 2 ** 30)
    return plan


# ---------------------------------------------------------------------------
# device numeric phase
# ---------------------------------------------------------------------------


def _presum(plan: GenMfPlan, data, params=None):
    P = _mk_P(params)
    d = data[P("eperm", lambda: plan.entry_perm)]
    return jax.ops.segment_sum(d, P("eseg", lambda: plan.entry_seg),
                               num_segments=plan.n_uniq,
                               indices_are_sorted=True)


def _mk_P(params):
    """Index-array accessor: embedded constants (params=None, the
    stepped/per-group form) or traced ARGUMENTS from a whole_params()
    pytree — embedding every index vector as a literal blows the
    one-graph program past what the remote server compiler accepts at
    ~10^5 fronts (tens of MB of constants), while as plain inputs the
    same graph compiles. whole_params() is SIZE-GATED: small index
    vectors stay constants (constant-index gathers compile to faster
    device code than runtime-index ones), only the big ones ride as
    arguments — a key absent from the pytree falls back to the
    constant form."""
    if params is None:
        return lambda key, build: jnp.asarray(_idx32(build()))

    def P(key, build):
        v = params.get(key)
        return jnp.asarray(_idx32(build())) if v is None else v
    return P


def _assemble(c: _GClass, uniq, dtype, ghost=True, params=None, ci=None):
    P = _mk_P(params)
    F = c.F
    flat = jnp.zeros(c.n_nodes * F * F, dtype=dtype)
    if ghost and len(c.pad_diag):
        flat = flat.at[P(f"pd{ci}", lambda: c.pad_diag)].add(1.0)
    if c.asm_len:
        vals = jax.lax.dynamic_slice(uniq, (c.asm_off,), (c.asm_len,))
        flat = flat.at[P(f"asm{ci}", lambda: c.asm_idx)].add(
            vals.astype(dtype))
    return flat.reshape(c.n_nodes, F, F)


def _schur_idx(link: _GLink, r):
    r1 = r + 1
    return (link.child_slot[:, None, None] * (r1 * r1)
            + link.inv[:, :, None] * r1
            + link.inv[:, None, :]).reshape(-1)


def _gather_schur(link: _GLink, S, idx=None):
    """(m, F_p, F_p) block of one child class's padded Schur.

    ONE flat dim-0 gather: any multi-dim take_along_axis (minor axis or
    not) aborts the attached backend's compiler
    (fusion_emitter GatherType::kSublaneGather check, observed
    2026-08-19 at 30k fronts); flat dim-0 gathers are the pattern the
    GRIDMF/SPLU engines already run on-chip successfully."""
    m, Fp = link.inv.shape
    Spad = jnp.pad(S, ((0, 0), (0, 1), (0, 1))).reshape(-1)
    # the FLAT index is host-precomputed: a jaxpr constant in the
    # stepped form, a traced input in the whole-program form
    if idx is None:
        idx = jnp.asarray(_idx32(_schur_idx(link, S.shape[-1])))
    return Spad[idx].reshape(m, Fp, Fp)


def _vec_idx(link: _GLink, r):
    return (link.child_slot[:, None] * (r + 1) + link.inv).reshape(-1)


def _gather_vec(link: _GLink, v, idx=None):
    # flat dim-0 gather (see _gather_schur)
    m, Fp = link.inv.shape
    vpad = jnp.pad(v, ((0, 0), (0, 1))).reshape(-1)
    if idx is None:
        idx = jnp.asarray(_idx32(_vec_idx(link, v.shape[-1])))
    return vpad[idx].reshape(m, Fp)


def whole_params(plan: GenMfPlan, min_elems: int = 65536) -> dict:
    """Host pytree of the LARGE index arrays the whole-program factorize
    and solve graphs take as ARGUMENTS (see _mk_P). Ship once with
    jnp.asarray per leaf and pass to genmf_factorize/genmf_solve
    (params=...). Arrays under ``min_elems`` stay jaxpr constants:
    constant-index gathers compile to faster device code, and only the
    big vectors (entry permutation/segments, the widest extend-add
    index maps) push the serialized program past what the server
    accepts."""
    out = {}

    def put(key, arr):
        if arr.size >= min_elems:
            out[key] = _idx32(arr)

    put("eperm", plan.entry_perm)
    put("eseg", plan.entry_seg)
    for ci, c in enumerate(plan.classes):
        if len(c.pad_diag):
            put(f"pd{ci}", c.pad_diag)
        if c.asm_len:
            put(f"asm{ci}", c.asm_idx)
        put(f"ev{ci}", c.elim_var)
        for k, link in enumerate(c.links):
            src = plan.classes[link.src]
            put(f"ls{ci}_{k}", _schur_idx(link, src.r))
            put(f"lv{ci}_{k}", _vec_idx(link, src.r))
            put(f"ps{ci}_{k}", link.parent_slot)
            put(f"cs{ci}_{k}", link.child_slot)
            F1 = c.F + 1
            put(f"fw{ci}_{k}", (link.parent_slot[:, None] * F1
                                + link.fwd).reshape(-1))
    return out


def genmf_factorize(plan: GenMfPlan, data, shard=None, params=None):
    """Batched multifrontal factorization over the size classes.
    Jittable for a fixed plan; SPLU/GRIDMF-compatible fac surface.
    ``params``: optional whole_params() pytree passed as traced inputs
    (see _mk_P)."""
    if shard is None:
        shard = lambda a: a
    P = _mk_P(params)
    data = jnp.asarray(data)
    cplx = jnp.iscomplexobj(data)
    rdt = jnp.real(data).dtype
    if cplx:
        uniq_re = _presum(plan, jnp.real(data), params)
        uniq_im = _presum(plan, jnp.imag(data), params)
    else:
        uniq_re = _presum(plan, data, params)
        uniq_im = None
    delta = (plan.pivot_epsilon * (1.0 + jnp.max(jnp.abs(data)))).astype(rdt)

    store = [None] * len(plan.classes)
    schur_re: Dict[int, jnp.ndarray] = {}
    schur_im: Dict[int, jnp.ndarray] = {}
    ld = jnp.zeros((), rdt)
    mp = jnp.asarray(jnp.inf, rdt)
    npc = jnp.zeros((), jnp.int32)
    ph = jnp.ones((), rdt)
    for ci, c in enumerate(plan.classes):
        fr = shard(_assemble(c, uniq_re, rdt, params=params, ci=ci))
        fi = shard(_assemble(c, uniq_im, rdt, ghost=False, params=params,
                             ci=ci)) if cplx else None
        for k, link in enumerate(c.links):
            # index (don't pop): a child class may feed parents in
            # SEVERAL classes; under tracing, liveness is dataflow-based
            # optimization_barrier: fusing these gathers into their
            # scatter/slice consumers aborts the attached backend's
            # server compiler (kSublaneGather fusion CHECK) — same
            # guard as the stepped drivers
            ps = P(f"ps{ci}_{k}", lambda: link.parent_slot)
            li = (params.get(f"ls{ci}_{k}") if params is not None
                  else None)
            fr = fr.at[ps].add(jax.lax.optimization_barrier(
                _gather_schur(link, schur_re[link.src], li)))
            if cplx:
                fi = fi.at[ps].add(jax.lax.optimization_barrier(
                    _gather_schur(link, schur_im[link.src], li)))
        e = c.e
        Sr, Si = fr[:, :e, :e], (fi[:, :e, :e] if cplx else None)
        Br, Bi = fr[:, :e, e:], (fi[:, :e, e:] if cplx else None)
        Cr, Ci = fr[:, e:, :e], (fi[:, e:, :e] if cplx else None)
        Rr, Ri = fr[:, e:, e:], (fi[:, e:, e:] if cplx else None)
        SIr, SIi, ld_d, mp_d, np_d, ph_d = _inv_planes(Sr, Si, delta)
        SIr = shard(SIr)
        SIi = shard(SIi) if SIi is not None else None
        if c.r:
            Lr, Li = _mm(Cr, Ci, SIr, SIi)
            Ur, Ui = _mm(Lr, Li, Br, Bi)
            schur_re[ci] = shard(Rr - Ur)
            if cplx:
                schur_im[ci] = shard(Ri - Ui)
        else:
            Lr = Li = None
        store[ci] = {"sir": SIr, "sii": SIi, "lr": Lr, "li": Li,
                     "br": Br if c.r else None, "bi": Bi if c.r else None}
        ld = ld + ld_d
        mp = jnp.minimum(mp, mp_d)
        npc = npc + np_d
        ph = ph * ph_d.astype(rdt) if not cplx else ph
    return {"classes": store, "logdet": ld, "phase": ph, "min_pivot": mp,
            "n_perturbed": npc}


def _ob(x):
    """Solve-side optimization barrier, removable via env: the barriers
    keep gathers out of fusions the server compiler aborts on
    (kSublaneGather CHECK, bisected on the FACT extend-add Schur
    gathers), but they also stop XLA from fusing the solve sweeps'
    tiny vector ops — measured 1.06 s device time for ~500 unfused
    kernels at geometric_264k. RUSSELL_TPU_GENMF_SOLVE_BARRIER=0 drops
    them from the solve bodies only (probe before production use)."""
    import os as _os
    if int(_os.environ.get("RUSSELL_TPU_GENMF_SOLVE_BARRIER", "1")):
        return jax.lax.optimization_barrier(x)
    return x


def genmf_solve(plan: GenMfPlan, fac, bvec, shard=None, params=None):
    """x = A^{-1} b: up-sweep (rhs elimination, deepest classes first)
    then down-sweep (back-substitution). Jittable. ``params``: optional
    whole_params() pytree passed as traced inputs (see _mk_P)."""
    if shard is None:
        shard = lambda a: a
    P = _mk_P(params)
    bvec = jnp.asarray(bvec)
    first = next(st for st in fac["classes"] if st["sir"] is not None)
    cplx = first["sii"] is not None
    rdt = first["sir"].dtype
    if cplx:
        bp_re = jnp.concatenate([jnp.real(bvec).astype(rdt),
                                 jnp.zeros(1, rdt)])
        bp_im = jnp.concatenate([jnp.imag(bvec).astype(rdt),
                                 jnp.zeros(1, rdt)])
    else:
        bp_re = jnp.concatenate([bvec.astype(rdt), jnp.zeros(1, rdt)])
        bp_im = None

    fe_st = [None] * len(plan.classes)
    fk_re: Dict[int, jnp.ndarray] = {}
    fk_im: Dict[int, jnp.ndarray] = {}
    for ci, c in enumerate(plan.classes):
        st = fac["classes"][ci]
        e = c.e
        fr = jnp.zeros((c.n_nodes, c.F), rdt)
        fi = jnp.zeros((c.n_nodes, c.F), rdt) if cplx else None
        for k, link in enumerate(c.links):
            # optimization_barrier: see genmf_factorize (kSublaneGather)
            ps = P(f"ps{ci}_{k}", lambda: link.parent_slot)
            li = (params.get(f"lv{ci}_{k}") if params is not None
                  else None)
            fr = fr.at[ps].add(_ob(
                _gather_vec(link, fk_re[link.src], li)))
            if cplx:
                fi = fi.at[ps].add(_ob(
                    _gather_vec(link, fk_im[link.src], li)))
        ev = P(f"ev{ci}", lambda: c.elim_var)
        fr = fr.at[:, :e].add(bp_re[ev])
        if cplx:
            fi = fi.at[:, :e].add(bp_im[ev])
        fer, fei = fr[:, :e], (fi[:, :e] if cplx else None)
        fe_st[ci] = (fer, fei)
        if c.r:
            ur, ui = _mm(st["lr"], st["li"], fer[:, :, None],
                         fei[:, :, None] if cplx else None)
            fk_re[ci] = shard(fr[:, e:] - ur[:, :, 0])
            if cplx:
                fk_im[ci] = shard(fi[:, e:] - ui[:, :, 0])

    x_re = jnp.zeros(plan.n + 1, rdt)
    x_im = jnp.zeros(plan.n + 1, rdt) if cplx else None
    xk_re: Dict[int, jnp.ndarray] = {}
    xk_im: Dict[int, jnp.ndarray] = {}
    for ci in range(len(plan.classes) - 1, -1, -1):
        c = plan.classes[ci]
        st = fac["classes"][ci]
        e = c.e
        xkr = xk_re.pop(ci, None)
        if xkr is None:
            xkr = jnp.zeros((c.n_nodes, c.r), rdt)
            xki = jnp.zeros((c.n_nodes, c.r), rdt) if cplx else None
        else:
            xki = xk_im.pop(ci) if cplx else None
        fer, fei = fe_st[ci]
        if c.r:
            br_, bi_ = _mm(st["br"], st["bi"], xkr[:, :, None],
                           xki[:, :, None] if cplx else None)
            rr = fer - br_[:, :, 0]
            ri = (fei - bi_[:, :, 0]) if cplx else None
        else:
            rr, ri = fer, fei
        xer, xei = _mm(st["sir"], st["sii"], rr[:, :, None],
                       ri[:, :, None] if cplx else None)
        xer = xer[:, :, 0]
        xei = xei[:, :, 0] if cplx else None
        ev = P(f"ev{ci}", lambda: c.elim_var)
        x_re = x_re.at[ev.reshape(-1)].set(xer.reshape(-1), mode="drop")
        if cplx:
            x_im = x_im.at[ev.reshape(-1)].set(xei.reshape(-1), mode="drop")
        # distribute this class's front solution to its children's keeps
        if c.links:
            xf_re = jnp.pad(jnp.concatenate([xer, xkr], axis=1),
                            ((0, 0), (0, 1)))
            xf_im = (jnp.pad(jnp.concatenate([xei, xki], axis=1),
                             ((0, 0), (0, 1))) if cplx else None)
            F1 = xf_re.shape[-1]
            xfr_flat = xf_re.reshape(-1)
            xfi_flat = xf_im.reshape(-1) if cplx else None
            for k, link in enumerate(c.links):
                # flat dim-0 gather (kSublaneGather workaround,
                # see _gather_schur)
                m_l, r_l = link.fwd.shape
                flat_idx = P(f"fw{ci}_{k}", lambda: (
                    link.parent_slot[:, None] * F1 + link.fwd
                ).reshape(-1))
                cs = P(f"cs{ci}_{k}", lambda: link.child_slot)
                src = plan.classes[link.src]
                vals = _ob(
                    xfr_flat[flat_idx].reshape(m_l, r_l))
                tgt = xk_re.get(link.src)
                if tgt is None:
                    tgt = jnp.zeros((src.n_nodes, src.r), rdt)
                xk_re[link.src] = tgt.at[cs].set(vals)
                if cplx:
                    vi = _ob(
                        xfi_flat[flat_idx].reshape(m_l, r_l))
                    ti_ = xk_im.get(link.src)
                    if ti_ is None:
                        ti_ = jnp.zeros((src.n_nodes, src.r), rdt)
                    xk_im[link.src] = ti_.at[cs].set(vi)
    if cplx:
        cdt = jnp.complex64 if rdt == jnp.float32 else jnp.complex128
        return (x_re[:plan.n].astype(cdt) + 1j * x_im[:plan.n].astype(cdt))
    return x_re[:plan.n]


# ---------------------------------------------------------------------------
# stepped (per-class jit) drivers — the attached backend's fusion emitter
# aborts on the WHOLE-program GENMF graph (kSublaneGather check in
# fusion_emitter.cc; every stage compiles and runs fine in isolation,
# bisected on-chip 2026-08-19), so these keep class boundaries as jit
# boundaries. Real-only (the MM benchmark class); complex stays on the
# single-program path (CPU/virtual meshes compile it fine).
# ---------------------------------------------------------------------------

_step_cache: Dict = {}


def _plan_steps(plan) -> Dict:
    """Per-plan jitted-step cache, attached to the plan object (an
    id(plan)-keyed module dict would poison a NEW plan when the garbage
    collector recycles the id — observed as shape TypeErrors when many
    plans are created and dropped in one process)."""
    st = getattr(plan, "_steps", None)
    if st is None:
        st = plan._steps = {}
    return st


def _depth_groups(plan: GenMfPlan, order=None, cap=None):
    """Consecutive runs of equal-depth classes in processing order.

    Classes within one tree depth never link to each other (child ->
    parent links strictly cross depths), so a whole depth can run as
    ONE jitted step: at geometric_264k's 453 classes the per-class
    dispatch over the remote tunnel dominated wall time (warm
    factorize 3.3 s / solve 63.9 s measured 2026-08-20 — ~8 ms per
    dispatch x thousands of dispatches across refinement rounds);
    grouping cuts the dispatch count to the tree depth (~25)."""
    idx = list(range(len(plan.classes))) if order is None else list(order)
    # cap the classes per jitted step: an UNCAPPED depth group (200+
    # class bodies in one program at geometric_264k) crashes the remote
    # server compiler ("response body closed before all bytes were
    # read", observed 2026-08-20) — the same large-program fragility as
    # the whole-program kSublaneGather abort. 16 keeps programs small
    # while still cutting dispatches ~13x.
    import os as _os
    if cap is None:
        cap = int(_os.environ.get("RUSSELL_TPU_GENMF_GROUP", "16"))
    groups = []
    cur = []
    for ci in idx:
        if cur and (plan.classes[cur[0]].depth != plan.classes[ci].depth
                    or len(cur) >= cap):
            groups.append(cur)
            cur = []
        cur.append(ci)
    if cur:
        groups.append(cur)
    return groups


def genmf_factorize_steps(plan: GenMfPlan, data):
    """Host-driven numeric phase: one cached jitted step per tree DEPTH
    (see _depth_groups). Numerics identical to ``genmf_factorize``
    (same ops, same order); the fac pytree is interchangeable."""
    data = jnp.asarray(data)
    if jnp.iscomplexobj(data):
        # complex runs as real/imag Karatsuba planes (same math as
        # genmf_factorize): jnp.real/imag are DEVICE ops, so no complex
        # host<->device transfer ever happens (unimplemented on the
        # attached axon backend in both directions)
        return _genmf_factorize_steps_planes(plan, jnp.real(data),
                                             jnp.imag(data))
    rdt = data.dtype
    steps = _plan_steps(plan).setdefault(("factg", str(rdt)), {})
    uniq = _presum(plan, data)
    delta = (plan.pivot_epsilon * (1.0 + jnp.max(jnp.abs(data)))).astype(rdt)

    store = [None] * len(plan.classes)
    schur: Dict[int, jnp.ndarray] = {}
    ld = jnp.zeros((), rdt)
    mp = jnp.asarray(jnp.inf, rdt)
    npc = jnp.zeros((), jnp.int32)
    ph = jnp.ones((), rdt)
    for gi, group in enumerate(_depth_groups(plan)):
        step = steps.get(gi)
        if step is None:
            def make(group):
                def body(uniq, delta, *schur_srcs):
                    outs = []
                    ofs = 0
                    g_ld = jnp.zeros((), rdt)
                    g_mp = jnp.asarray(jnp.inf, rdt)
                    g_np = jnp.zeros((), jnp.int32)
                    g_ph = jnp.ones((), rdt)
                    for ci in group:
                        c = plan.classes[ci]
                        fr = _assemble(c, uniq, rdt)
                        for link in c.links:
                            # optimization_barrier: keeps the gathers
                            # out of fusions the server compiler aborts
                            # on (kSublaneGather check)
                            g = jax.lax.optimization_barrier(
                                _gather_schur(link, schur_srcs[ofs]))
                            ofs += 1
                            fr = fr.at[jnp.asarray(_idx32(
                                link.parent_slot))].add(g)
                        e = c.e
                        SIr, _, ld_d, mp_d, np_d, ph_d = _inv_planes(
                            fr[:, :e, :e], None, delta)
                        Br = fr[:, :e, e:]
                        if c.r:
                            Lr, _ = _mm(fr[:, e:, :e], None, SIr, None)
                            Ur, _ = _mm(Lr, None, Br, None)
                            new_sch = fr[:, e:, e:] - Ur
                        else:
                            Lr = new_sch = jnp.zeros((c.n_nodes, 0, 0),
                                                     rdt)
                        outs.extend((SIr, Lr, Br, new_sch))
                        g_ld = g_ld + ld_d
                        g_mp = jnp.minimum(g_mp, mp_d)
                        g_np = g_np + np_d
                        g_ph = g_ph * ph_d.astype(rdt)
                    return (*outs, g_ld, g_mp, g_np, g_ph)
                return jax.jit(body)
            step = steps[gi] = make(group)
        srcs = [schur[link.src] for ci in group
                for link in plan.classes[ci].links]
        outs = step(uniq, delta, *srcs)
        for k, ci in enumerate(group):
            c = plan.classes[ci]
            SIr, Lr, Br, new_sch = outs[4 * k:4 * k + 4]
            if c.r:
                schur[ci] = new_sch
            store[ci] = {"sir": SIr, "sii": None,
                         "lr": Lr if c.r else None, "li": None,
                         "br": Br if c.r else None, "bi": None}
        g_ld, g_mp, g_np, g_ph = outs[4 * len(group):]
        ld = ld + g_ld
        mp = jnp.minimum(mp, g_mp)
        npc = npc + g_np
        ph = ph * g_ph
    return {"classes": store, "logdet": ld, "phase": ph, "min_pivot": mp,
            "n_perturbed": npc}


def _genmf_factorize_steps_planes(plan: GenMfPlan, dre, dim):
    """Complex stepped numeric phase: per-class jitted steps over
    real/imag planes (Karatsuba _mm, real-embedding _inv_planes —
    identical math to the whole-program genmf_factorize complex path,
    which the attached TPU backend cannot compile as one graph:
    kSublaneGather fusion abort). VERDICT r3 item 7: gives irregular
    COMPLEX systems (complex_lin_solver.rs role) a TPU path."""
    dre = jnp.asarray(dre)
    dim = jnp.asarray(dim)
    rdt = dre.dtype
    steps = _plan_steps(plan).setdefault(("factc", str(rdt)), {})
    uniq_re = _presum(plan, dre)
    uniq_im = _presum(plan, dim)
    delta = (plan.pivot_epsilon
             * (1.0 + jnp.max(jnp.hypot(dre, dim)))).astype(rdt)

    store = [None] * len(plan.classes)
    schur_re: Dict[int, jnp.ndarray] = {}
    schur_im: Dict[int, jnp.ndarray] = {}
    ld = jnp.zeros((), rdt)
    mp = jnp.asarray(jnp.inf, rdt)
    npc = jnp.zeros((), jnp.int32)
    for ci, c in enumerate(plan.classes):
        step = steps.get(ci)
        if step is None:
            def make(ci, c):
                def body(uniq_re, uniq_im, delta, *schur_srcs):
                    fr = _assemble(c, uniq_re, rdt)
                    fi = _assemble(c, uniq_im, rdt, ghost=False)
                    for k, link in enumerate(c.links):
                        ps = jnp.asarray(_idx32(link.parent_slot))
                        # optimization_barrier: see genmf_solve_steps —
                        # keeps the gathers out of fusions the server
                        # compiler aborts on (kSublaneGather check)
                        gr = jax.lax.optimization_barrier(
                            _gather_schur(link, schur_srcs[2 * k]))
                        gi = jax.lax.optimization_barrier(
                            _gather_schur(link, schur_srcs[2 * k + 1]))
                        fr = fr.at[ps].add(gr)
                        fi = fi.at[ps].add(gi)
                    e = c.e
                    SIr, SIi, ld_d, mp_d, np_d, _ph = _inv_planes(
                        fr[:, :e, :e], fi[:, :e, :e], delta)
                    Br, Bi = fr[:, :e, e:], fi[:, :e, e:]
                    if c.r:
                        Lr, Li = _mm(fr[:, e:, :e], fi[:, e:, :e],
                                     SIr, SIi)
                        Ur, Ui = _mm(Lr, Li, Br, Bi)
                        sr = fr[:, e:, e:] - Ur
                        si = fi[:, e:, e:] - Ui
                    else:
                        z = jnp.zeros((c.n_nodes, 0, 0), rdt)
                        Lr = Li = sr = si = z
                    return (SIr, SIi, Lr, Li, Br, Bi, sr, si,
                            ld_d, mp_d, np_d)
                return jax.jit(body)
            step = steps[ci] = make(ci, c)
        srcs = []
        for link in c.links:
            srcs.extend((schur_re[link.src], schur_im[link.src]))
        (SIr, SIi, Lr, Li, Br, Bi, sr, si,
         ld_d, mp_d, np_d) = step(uniq_re, uniq_im, delta, *srcs)
        if c.r:
            schur_re[ci] = sr
            schur_im[ci] = si
        store[ci] = {"sir": SIr, "sii": SIi,
                     "lr": Lr if c.r else None,
                     "li": Li if c.r else None,
                     "br": Br if c.r else None,
                     "bi": Bi if c.r else None}
        ld = ld + ld_d
        mp = jnp.minimum(mp, mp_d)
        npc = npc + np_d
    # real-embedding determinant: |det| only (phase unrecoverable), as
    # in the whole-program complex path
    return {"classes": store, "logdet": ld, "phase": jnp.ones((), rdt),
            "min_pivot": mp, "n_perturbed": npc}


def genmf_solve_steps(plan: GenMfPlan, fac, bvec):
    """Host-driven solve: per-class jitted up/down steps (see
    genmf_factorize_steps). Complex rhs runs as real/imag planes;
    numerics identical to genmf_solve."""
    first = next(st for st in fac["classes"] if st["sir"] is not None)
    if first["sii"] is not None:
        return _genmf_solve_steps_planes(plan, fac, bvec)
    rdt = first["sir"].dtype
    steps = _plan_steps(plan).setdefault(("solveg", str(rdt)), {})
    bp = jnp.concatenate([jnp.asarray(bvec).astype(rdt),
                          jnp.zeros(1, rdt)])

    import os as _os
    scap = int(_os.environ.get("RUSSELL_TPU_GENMF_GROUP_SOLVE", "48"))
    fe_st = [None] * len(plan.classes)
    fk: Dict[int, jnp.ndarray] = {}
    for gi, group in enumerate(_depth_groups(plan, cap=scap)):
        key = ("up", gi)
        step = steps.get(key)
        if step is None:
            def make_up(group):
                def body(bp, *args):
                    # args = [lr per class] + [fk srcs in group order]
                    nl = len(group)
                    lrs = args[:nl]
                    srcs = args[nl:]
                    ofs = 0
                    outs = []
                    for k, ci in enumerate(group):
                        c = plan.classes[ci]
                        fr = jnp.zeros((c.n_nodes, c.F), rdt)
                        for link in c.links:
                            # optimization_barrier: fusing these gathers
                            # into scatter/slice consumers aborts the
                            # server compiler (kSublaneGather check)
                            g = _ob(
                                _gather_vec(link, srcs[ofs]))
                            ofs += 1
                            fr = fr.at[jnp.asarray(_idx32(
                                link.parent_slot))].add(g)
                        e = c.e
                        ev_flat = jnp.asarray(_idx32(
                            c.elim_var.reshape(-1)))
                        gb = _ob(
                            bp[ev_flat].reshape(c.n_nodes, e))
                        fr = fr.at[:, :e].add(gb)
                        fer = fr[:, :e]
                        if c.r:
                            ur, _ = _mm(lrs[k], None, fer[:, :, None],
                                        None)
                            outs.extend((fer, fr[:, e:] - ur[:, :, 0]))
                        else:
                            outs.extend((fer,
                                         jnp.zeros((c.n_nodes, 0), rdt)))
                    return tuple(outs)
                return jax.jit(body)
            step = steps[key] = make_up(group)
        args = [fac["classes"][ci]["lr"] for ci in group]
        args += [fk[link.src] for ci in group
                 for link in plan.classes[ci].links]
        outs = step(bp, *args)
        for k, ci in enumerate(group):
            fe_st[ci] = outs[2 * k]
            if plan.classes[ci].r:
                fk[ci] = outs[2 * k + 1]

    x = jnp.zeros(plan.n + 1, rdt)
    xk: Dict[int, jnp.ndarray] = {}
    rev = range(len(plan.classes) - 1, -1, -1)
    for gi, group in enumerate(_depth_groups(plan, order=rev,
                                              cap=scap)):
        key = ("down", gi)
        step = steps.get(key)
        if step is None:
            def make_down(group):
                def body(x, *args):
                    # args = per class (fer, xkr, sir, br)
                    outs = []
                    for k, ci in enumerate(group):
                        c = plan.classes[ci]
                        fer, xkr, sir, br = args[4 * k:4 * k + 4]
                        if c.r:
                            br_, _ = _mm(br, None, xkr[:, :, None], None)
                            rr = fer - br_[:, :, 0]
                        else:
                            rr = fer
                        xer, _ = _mm(sir, None, rr[:, :, None], None)
                        xer = xer[:, :, 0]
                        ev = jnp.asarray(_idx32(c.elim_var))
                        x = x.at[ev.reshape(-1)].set(xer.reshape(-1),
                                                     mode="drop")
                        if c.links:
                            xf = jnp.pad(
                                jnp.concatenate([xer, xkr], axis=1),
                                ((0, 0), (0, 1)))
                            xf_flat = xf.reshape(-1)
                            F1 = xf.shape[-1]
                            for link in c.links:
                                m_l, r_l = link.fwd.shape
                                flat_idx = jnp.asarray(_idx32(
                                    (link.parent_slot[:, None] * F1
                                     + link.fwd).reshape(-1)))
                                outs.append(_ob(
                                    xf_flat[flat_idx].reshape(m_l, r_l)))
                    return (x, *outs)
                return jax.jit(body, donate_argnums=(0,))
            step = steps[key] = make_down(group)
        args = []
        for ci in group:
            c = plan.classes[ci]
            xkr = xk.pop(ci, None)
            if xkr is None:
                xkr = jnp.zeros((c.n_nodes, c.r), rdt)
            args.extend((fe_st[ci], xkr, fac["classes"][ci]["sir"],
                         fac["classes"][ci]["br"]))
        out = step(x, *args)
        x = out[0]
        rest = out[1:]
        ofs = 0
        for ci in group:
            for link in plan.classes[ci].links:
                src = plan.classes[link.src]
                tgt = xk.get(link.src)
                if tgt is None:
                    tgt = jnp.zeros((src.n_nodes, src.r), rdt)
                xk[link.src] = tgt.at[jnp.asarray(_idx32(
                    link.child_slot))].set(rest[ofs])
                ofs += 1
    return x[:plan.n]


def _genmf_solve_steps_planes(plan: GenMfPlan, fac, bvec):
    """Complex stepped solve over real/imag planes (see
    _genmf_factorize_steps_planes). ``bvec`` may be a device complex
    array (split with device ops) or a host numpy complex array (split
    on host — the axon backend cannot transfer complex either way).
    Returns a DEVICE complex array built in-trace via lax.complex."""
    first = next(st for st in fac["classes"] if st["sir"] is not None)
    rdt = first["sir"].dtype
    steps = _plan_steps(plan).setdefault(("solvec", str(rdt)), {})
    if isinstance(bvec, np.ndarray) and np.iscomplexobj(bvec):
        b_re = jnp.asarray(np.ascontiguousarray(bvec.real))
        b_im = jnp.asarray(np.ascontiguousarray(bvec.imag))
    else:
        bvec = jnp.asarray(bvec)
        b_re, b_im = jnp.real(bvec), jnp.imag(bvec)
    bp_re = jnp.concatenate([b_re.astype(rdt), jnp.zeros(1, rdt)])
    bp_im = jnp.concatenate([b_im.astype(rdt), jnp.zeros(1, rdt)])

    fe_st = [None] * len(plan.classes)
    fk_re: Dict[int, jnp.ndarray] = {}
    fk_im: Dict[int, jnp.ndarray] = {}
    for ci, c in enumerate(plan.classes):
        key = ("up", ci)
        step = steps.get(key)
        if step is None:
            def make_up(ci, c):
                def body(bp_re, bp_im, lr, li, *fk_srcs):
                    fr = jnp.zeros((c.n_nodes, c.F), rdt)
                    fi = jnp.zeros((c.n_nodes, c.F), rdt)
                    for k, link in enumerate(c.links):
                        ps = jnp.asarray(_idx32(link.parent_slot))
                        gr = _ob(
                            _gather_vec(link, fk_srcs[2 * k]))
                        gi = _ob(
                            _gather_vec(link, fk_srcs[2 * k + 1]))
                        fr = fr.at[ps].add(gr)
                        fi = fi.at[ps].add(gi)
                    e = c.e
                    ev_flat = jnp.asarray(_idx32(
                        c.elim_var.reshape(-1)))
                    gbr = _ob(
                        bp_re[ev_flat].reshape(c.n_nodes, e))
                    gbi = _ob(
                        bp_im[ev_flat].reshape(c.n_nodes, e))
                    fr = fr.at[:, :e].add(gbr)
                    fi = fi.at[:, :e].add(gbi)
                    fer, fei = fr[:, :e], fi[:, :e]
                    if c.r:
                        ur, ui = _mm(lr, li, fer[:, :, None],
                                     fei[:, :, None])
                        return (fer, fei, fr[:, e:] - ur[:, :, 0],
                                fi[:, e:] - ui[:, :, 0])
                    z = jnp.zeros((c.n_nodes, 0), rdt)
                    return fer, fei, z, z
                return jax.jit(body)
            step = steps[key] = make_up(ci, c)
        srcs = []
        for link in c.links:
            srcs.extend((fk_re[link.src], fk_im[link.src]))
        st = fac["classes"][ci]
        fer, fei, fkr, fki = step(bp_re, bp_im, st["lr"], st["li"], *srcs)
        fe_st[ci] = (fer, fei)
        if c.r:
            fk_re[ci] = fkr
            fk_im[ci] = fki

    x_re = jnp.zeros(plan.n + 1, rdt)
    x_im = jnp.zeros(plan.n + 1, rdt)
    xk_re: Dict[int, jnp.ndarray] = {}
    xk_im: Dict[int, jnp.ndarray] = {}
    for ci in range(len(plan.classes) - 1, -1, -1):
        c = plan.classes[ci]
        key = ("down", ci)
        step = steps.get(key)
        if step is None:
            def make_down(ci, c):
                def body(x_re, x_im, fer, fei, xkr, xki, sir, sii,
                         br, bi):
                    if c.r:
                        br_, bi_ = _mm(br, bi, xkr[:, :, None],
                                       xki[:, :, None])
                        rr = fer - br_[:, :, 0]
                        ri = fei - bi_[:, :, 0]
                    else:
                        rr, ri = fer, fei
                    xer, xei = _mm(sir, sii, rr[:, :, None],
                                   ri[:, :, None])
                    xer, xei = xer[:, :, 0], xei[:, :, 0]
                    ev = jnp.asarray(_idx32(c.elim_var))
                    x_re = x_re.at[ev.reshape(-1)].set(
                        xer.reshape(-1), mode="drop")
                    x_im = x_im.at[ev.reshape(-1)].set(
                        xei.reshape(-1), mode="drop")
                    if c.links:
                        xfr = jnp.pad(jnp.concatenate([xer, xkr], axis=1),
                                      ((0, 0), (0, 1)))
                        xfi = jnp.pad(jnp.concatenate([xei, xki], axis=1),
                                      ((0, 0), (0, 1)))
                        F1 = xfr.shape[-1]
                        xfr_flat = xfr.reshape(-1)
                        xfi_flat = xfi.reshape(-1)
                        outs = []
                        for link in c.links:
                            m_l, r_l = link.fwd.shape
                            flat_idx = jnp.asarray(_idx32(
                                (link.parent_slot[:, None] * F1
                                 + link.fwd).reshape(-1)))
                            outs.append(_ob(
                                xfr_flat[flat_idx].reshape(m_l, r_l)))
                            outs.append(_ob(
                                xfi_flat[flat_idx].reshape(m_l, r_l)))
                        return (x_re, x_im, *outs)
                    return (x_re, x_im)
                return jax.jit(body, donate_argnums=(0, 1))
            step = steps[key] = make_down(ci, c)
        xkr = xk_re.pop(ci, None)
        if xkr is None:
            xkr = jnp.zeros((c.n_nodes, c.r), rdt)
            xki = jnp.zeros((c.n_nodes, c.r), rdt)
        else:
            xki = xk_im.pop(ci)
        st = fac["classes"][ci]
        fer, fei = fe_st[ci]
        out = step(x_re, x_im, fer, fei, xkr, xki, st["sir"], st["sii"],
                   st["br"], st["bi"])
        x_re, x_im = out[0], out[1]
        rest = out[2:]
        for k, link in enumerate(c.links):
            src = plan.classes[link.src]
            cs = jnp.asarray(_idx32(link.child_slot))
            tr = xk_re.get(link.src)
            ti = xk_im.get(link.src)
            if tr is None:
                tr = jnp.zeros((src.n_nodes, src.r), rdt)
                ti = jnp.zeros((src.n_nodes, src.r), rdt)
            xk_re[link.src] = tr.at[cs].set(rest[2 * k])
            xk_im[link.src] = ti.at[cs].set(rest[2 * k + 1])
    combine = _step_cache.get("combine")
    if combine is None:
        combine = _step_cache["combine"] = jax.jit(
            lambda r, i: jax.lax.complex(r, i))
    return combine(x_re[:plan.n], x_im[:plan.n])
