"""Matrix (BLAS L3 / LAPACK-class) operations.

Reference: russell_lab/src/matrix/ (49 files; dgemm/dpotrf/dsyev/dgeev/dgesvd/
dgetrf+i through c_code/interface_blas.c). TPU-native: XLA linalg kernels,
dtype-polymorphic (complex twins included), everything jittable except the
noted host-only exporters.

Notes on XLA:TPU coverage: symmetric/hermitian eigendecomposition, SVD,
Cholesky, LU and triangular solves lower natively to TPU. The *general*
(nonsymmetric) eigendecomposition is a CPU-only lowering in XLA — same
situation as the reference where dgeev runs on the host CPU via LAPACK
(matrix/mat_eigen.rs:7); call it outside jit or on the CPU backend.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from russell_tpu.core.enums import Norm, mat_norm  # re-export

__all__ = [
    "mat_add", "mat_copy", "mat_scale", "mat_update", "mat_mat_mul",
    "mat_t_mat_mul", "mat_cholesky", "mat_eigen", "mat_eigenvalues",
    "mat_eigen_sym", "mat_eigen_sym_jacobi", "mat_gen_eigen", "mat_svd",
    "mat_inverse", "mat_pseudo_inverse", "mat_norm", "mat_max_abs_diff",
    "mat_sym_rank_op", "mat_convert_to_blas_band", "mat_to_numpy",
    "mat_to_mathematica", "complex_mat_zip", "complex_mat_unzip",
    "mat_eigen_herm",
]


# -- elementwise / BLAS3 ------------------------------------------------------


def mat_add(alpha, a, beta, b):
    """C = alpha*A + beta*B (matrix/mat_add.rs)."""
    return alpha * jnp.asarray(a) + beta * jnp.asarray(b)


def mat_copy(a):
    return jnp.array(a, copy=True)


def mat_scale(alpha, a):
    return alpha * jnp.asarray(a)


def mat_update(alpha, a, b):
    """B += alpha*A (matrix/mat_update.rs)."""
    return jnp.asarray(b) + alpha * jnp.asarray(a)


def mat_mat_mul(alpha, a, b):
    """C = alpha * A @ B (matrix/mat_mat_mul.rs, dgemm)."""
    a = jnp.asarray(a)
    return alpha * jnp.matmul(a, jnp.asarray(b), preferred_element_type=a.dtype)


def mat_t_mat_mul(alpha, a, b):
    """C = alpha * A^T @ B (matrix/mat_t_mat_mul.rs)."""
    a = jnp.asarray(a)
    return alpha * jnp.matmul(a.T, jnp.asarray(b), preferred_element_type=a.dtype)


def mat_sym_rank_op(alpha, a, beta, c, transposed=False):
    """C = alpha*A@A^T + beta*C (or A^T@A) — dsyrk (matrix/mat_sym_rank_op.rs)."""
    a = jnp.asarray(a)
    aat = a.T @ a if transposed else a @ a.T
    return alpha * aat + beta * jnp.asarray(c)


def mat_max_abs_diff(a, b):
    return jnp.max(jnp.abs(jnp.asarray(a) - jnp.asarray(b)))


# -- factorizations / decompositions -----------------------------------------


def mat_cholesky(a, lower: bool = True):
    """Cholesky factor (matrix/mat_cholesky.rs, dpotrf/zpotrf). Jittable."""
    c = jnp.linalg.cholesky(jnp.asarray(a))
    return c if lower else c.T.conj()


def mat_eigen(a):
    """General eigendecomposition (matrix/mat_eigen.rs, dgeev).

    Returns (l_real, l_imag, v_real, v_imag) — the unpacked form the
    reference produces from LAPACK's compact conjugate-pair representation
    (internal/dgeev_data.rs).

    EXPLICIT HOST CALLBACK: the nonsymmetric eigenproblem has no XLA
    lowering on TPU (XLA lowers ``eig`` on CPU only — the same LAPACK
    dgeev the reference binds in interface_blas.c). It runs through
    ``jax.pure_callback`` so the op is *traceable/jittable* and its host
    placement is explicit in the jaxpr, not a silent device hop; results
    come back as REAL planes (complex device->host transfer is
    unimplemented on some TPU backends).
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    rdt = jnp.zeros((), a.dtype).real.dtype
    out_shapes = (
        jax.ShapeDtypeStruct(a.shape[:-2] + (n,), rdt),
        jax.ShapeDtypeStruct(a.shape[:-2] + (n,), rdt),
        jax.ShapeDtypeStruct(a.shape, rdt),
        jax.ShapeDtypeStruct(a.shape, rdt),
    )
    return jax.pure_callback(_eig_host, out_shapes, a,
                             vmap_method="expand_dims")


def _eig_host(a):
    """LAPACK dgeev/zgeev on host via numpy (batched)."""
    w, v = np.linalg.eig(a)
    rdt = np.asarray(a).real.dtype
    return (np.ascontiguousarray(w.real, rdt),
            np.ascontiguousarray(w.imag, rdt),
            np.ascontiguousarray(v.real, rdt),
            np.ascontiguousarray(v.imag, rdt))


def mat_eigenvalues(a):
    """Eigenvalues only (matrix/mat_eigenvalues.rs); complex array
    (device-resident; built on device from the callback's real planes)."""
    lr, li, _, _ = mat_eigen(a)
    return jax.lax.complex(lr, li)


def mat_eigen_sym(a):
    """Symmetric/hermitian eigendecomposition (matrix/mat_eigen_sym.rs, dsyev).

    Returns (eigenvalues ascending, eigenvectors as columns). Jittable and
    TPU-lowering (XLA eigh).
    """
    w, v = jnp.linalg.eigh(jnp.asarray(a))
    return w, v


def mat_eigen_herm(a):
    """Hermitian eigendecomposition (complex_mat_eigen_herm.rs, zheev)."""
    return mat_eigen_sym(a)


def mat_eigen_sym_jacobi(a, max_sweeps: int = 30):
    """Symmetric eigendecomposition via cyclic Jacobi rotations.

    Native reimplementation mirroring matrix/mat_eigen_sym_jacobi.rs (the
    reference keeps a LAPACK-free Jacobi for cross-checking; we keep a
    jittable one for the same dual-implementation testing and as a
    VPU-friendly kernel for small batched problems). Returns (w, V) with
    A = V diag(w) V^T. Jittable: fixed sweep count with convergence masking.
    """
    a = jnp.asarray(a)
    n = a.shape[0]
    if n == 1:
        return a[0], jnp.ones((1, 1), a.dtype)

    idx_p, idx_q = np.triu_indices(n, k=1)
    idx_p = jnp.asarray(idx_p)
    idx_q = jnp.asarray(idx_q)

    def rotate(carry, pq):
        A, V = carry
        p, q = pq
        apq = A[p, q]
        app = A[p, p]
        aqq = A[q, q]
        # Rutishauser rotation
        theta = (aqq - app) / (2.0 * jnp.where(apq == 0, 1.0, apq))
        # sign convention: theta=0 (equal diagonal) must give t=1 (45 deg)
        sgn = jnp.where(theta >= 0, 1.0, -1.0)
        t = sgn / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
        t = jnp.where(apq == 0, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # G = identity with [c s; -s c] in (p, q)
        rowp = A[p, :] * c - A[q, :] * s
        rowq = A[p, :] * s + A[q, :] * c
        A = A.at[p, :].set(rowp).at[q, :].set(rowq)
        colp = A[:, p] * c - A[:, q] * s
        colq = A[:, p] * s + A[:, q] * c
        A = A.at[:, p].set(colp).at[:, q].set(colq)
        vp = V[:, p] * c - V[:, q] * s
        vq = V[:, p] * s + V[:, q] * c
        V = V.at[:, p].set(vp).at[:, q].set(vq)
        return (A, V), None

    def sweep(carry, _):
        (A, V) = carry
        (A, V), _ = lax.scan(rotate, (A, V), (idx_p, idx_q))
        return (A, V), jnp.sum(jnp.abs(A - jnp.diagonal(A) * jnp.eye(n, dtype=A.dtype)))

    (A, V), _ = lax.scan(sweep, (a, jnp.eye(n, dtype=a.dtype)),
                         None, length=max_sweeps)
    w = jnp.diagonal(A)
    order = jnp.argsort(w)
    return w[order], V[:, order]


def mat_gen_eigen(a, b):
    """Generalized eigenproblem A v = lambda B v (matrix/mat_gen_eigen.rs,
    dggev). Jittable: B^{-1} A is formed on DEVICE (XLA solve), then the
    nonsymmetric eig goes through the same explicit host callback as
    :func:`mat_eigen`; requires B nonsingular (the reference's QZ handles
    singular B — flagged for a native QZ later)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return mat_eigen(jnp.linalg.solve(b, a))


def mat_svd(a):
    """SVD (matrix/mat_svd.rs, dgesvd): returns (s, u, vt). Jittable/TPU."""
    u, s, vt = jnp.linalg.svd(jnp.asarray(a), full_matrices=True)
    return s, u, vt


def mat_inverse(a):
    """Inverse + determinant (matrix/mat_inverse.rs, dgetrf/i; closed form
    for n<=3 like the reference). Returns (inv, det). Jittable."""
    a = jnp.asarray(a)
    n = a.shape[0]
    if n == 1:
        det = a[0, 0]
        return jnp.asarray([[1.0]], a.dtype) / det, det
    if n == 2:
        det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
        inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
        return inv, det
    if n == 3:
        det = (
            a[0, 0] * (a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1])
            - a[0, 1] * (a[1, 0] * a[2, 2] - a[1, 2] * a[2, 0])
            + a[0, 2] * (a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0])
        )
        adj = jnp.array([
            [a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1],
             a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2],
             a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1]],
            [a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2],
             a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0],
             a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2]],
            [a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0],
             a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1],
             a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]],
        ])
        return adj / det, det
    return jnp.linalg.inv(a), jnp.linalg.det(a)


def mat_pseudo_inverse(a, rcond: float = 1e-15):
    """Moore-Penrose pseudo-inverse via SVD (matrix/mat_pseudo_inverse.rs)."""
    return jnp.linalg.pinv(jnp.asarray(a), rtol=rcond)


# -- band/exporters/zip --------------------------------------------------------


def mat_convert_to_blas_band(a, kl: int, ku: int):
    """Dense -> LAPACK banded storage (matrix/mat_convert_to_blas_band.rs):
    band[ku + i - j, j] = a[i, j] for max(0, j-ku) <= i <= min(m-1, j+kl)."""
    a = np.asarray(a)
    m, n = a.shape
    band = np.zeros((kl + ku + 1, n), dtype=a.dtype)
    for j in range(n):
        for i in range(max(0, j - ku), min(m, j + kl + 1)):
            band[ku + i - j, j] = a[i, j]
    return jnp.asarray(band)


def mat_to_numpy(a, name: str = "a") -> str:
    """Python/NumPy source text exporter (matrix/mat_to_numpy.rs)."""
    a = np.asarray(a)
    rows = ",\n    ".join(
        "[" + ", ".join(f"{v!r}" for v in row) + "]" for row in a
    )
    return f"{name} = np.array([\n    {rows},\n])"


def mat_to_mathematica(a) -> str:
    """Mathematica source text exporter (matrix/mat_to_mathematica.rs)."""
    a = np.asarray(a)

    def fmt(v):
        return f"{v:.17g}".replace("e", "*^")

    rows = ",".join("{" + ",".join(fmt(v) for v in row) + "}" for row in a)
    return "{" + rows + "}"


def complex_mat_zip(real, imag):
    """Complex matrix from (real, imag) (complex_mat_zip.rs)."""
    return jnp.asarray(real) + 1j * jnp.asarray(imag)


def complex_mat_unzip(z):
    z = jnp.asarray(z)
    return jnp.real(z), jnp.imag(z)
