"""Two-view epipolar geometry: essential-matrix estimation, pose recovery,
DLT triangulation, and the keyframe-gating metrics.

TPU-native replacement for the reference's OpenCV calls:

* ``cv::findEssentialMat`` / ``cv::recoverPose``
  (reference main.cpp:568-618 ``estimateRelativePoseFromEssential``)
  -> :func:`essential_eight_point`, :func:`decompose_essential`,
  :func:`recover_pose` (RANSAC itself lives in :mod:`.ransac`).
* ``cv::triangulatePoints`` (main.cpp:1249-1250) -> :func:`triangulate_dlt`.
* ``computeMedianDisplacement`` (main.cpp:171-189) -> :func:`median_displacement`
  — note the reference's median is the *upper* median ``sorted[n/2]``
  (main.cpp:188,251-256); we reproduce that exactly, mask-aware.
* ``computeParallaxAngle`` (main.cpp:200-222) -> :func:`parallax_angle_deg`.

Everything works on fixed-size padded point arrays with boolean validity
masks, in *normalized camera coordinates* (pixels divided through K), which is
also how OpenCV's essential-matrix RANSAC operates internally. Dtype is
float32 throughout (TPU-native); the small 9x9 / 4x4 eigenproblems are well
conditioned in f32 because normalized coordinates are O(1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# masked statistics
# ---------------------------------------------------------------------------

def masked_upper_median(values: jax.Array, mask: jax.Array) -> jax.Array:
    """``sorted(values[mask])[count // 2]`` — the reference's median
    (main.cpp:251-256). Returns 0.0 for an empty mask (main.cpp:176)."""
    count = jnp.sum(mask.astype(jnp.int32))
    big = jnp.asarray(jnp.finfo(values.dtype).max, values.dtype)
    filled = jnp.where(mask, values, big)
    s = jnp.sort(filled)
    idx = jnp.clip(count // 2, 0, values.shape[0] - 1)
    return jnp.where(count > 0, s[idx], jnp.zeros((), values.dtype))


def median_displacement(pts1: jax.Array, pts2: jax.Array,
                        mask: jax.Array) -> jax.Array:
    """Upper-median pixel displacement of matched pairs (main.cpp:171-189)."""
    d = jnp.linalg.norm(pts2 - pts1, axis=-1)
    return masked_upper_median(d, mask)


# ---------------------------------------------------------------------------
# essential matrix
# ---------------------------------------------------------------------------

def epipolar_design(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """The 8-point design matrix: rows ``[u2u1, u2v1, u2, v2u1, v2v1, v2,
    u1, v1, 1]`` so that ``A @ vec(E) = 0`` for ``x2h^T E x1h = 0``.
    Batched over any leading axes; x1/x2 are [..., N, 2] -> [..., N, 9]."""
    one = jnp.ones_like(x1[..., 0])
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    return jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one],
                     axis=-1)


def nullspace_8x9(A: jax.Array) -> jax.Array:
    """Unit nullspace vector of a batch of [..., 8, 9] design matrices via
    Householder QR of ``A^T`` — the RANSAC minimal-sample solver.

    For a full-rank 8x9 minimal sample the nullspace is *exact* (dimension
    one), so no SVD is needed: the last column of the complete-QR ``Q`` of
    ``A^T`` spans it. Householder QR is backward stable and, unlike an
    ``A^T A`` eigen-solve, does not square the condition number — measured
    residuals ``|A e|`` are ~3e-7 in float32, matching the SVD solver, at
    ~2.6x less device time (the 8-step reflector recurrence is pure
    elementwise/matvec work that XLA fuses, vs. iterative Jacobi SVD).
    Rank-deficient (degenerate) samples return a vector in the larger
    nullspace; RANSAC scores such hypotheses low and discards them.
    """
    M = jnp.swapaxes(A, -1, -2)  # [..., 9, 8]
    idx = jnp.arange(9)
    vs, betas = [], []
    for k in range(8):
        x = jnp.where(idx >= k, M[..., :, k], 0.0)
        alpha = jnp.sqrt(jnp.sum(x * x, axis=-1))
        sign = jnp.where(x[..., k] >= 0, 1.0, -1.0)
        ek = (idx == k).astype(A.dtype)
        v = x + (sign * alpha)[..., None] * ek
        vn2 = jnp.sum(v * v, axis=-1)
        beta = jnp.where(vn2 > 1e-30, 2.0 / vn2, 0.0)
        w = jnp.einsum('...i,...ij->...j', v, M) * beta[..., None]
        M = M - v[..., :, None] * w[..., None, :]
        vs.append(v)
        betas.append(beta)
    # q = Q e_9 = H_1 (H_2 (... (H_8 e_9))) — only the last column of Q.
    q = jnp.broadcast_to((idx == 8).astype(A.dtype), A.shape[:-2] + (9,))
    for k in reversed(range(8)):
        v, beta = vs[k], betas[k]
        q = q - v * (beta * jnp.sum(v * q, axis=-1))[..., None]
    return q


def project_to_essential(E: jax.Array) -> jax.Array:
    """Nearest essential matrix: singular values -> (s, s, 0) with
    s = (s1 + s2) / 2. Batched over leading axes."""
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) * 0.5
    z = jnp.zeros_like(s)
    return (U * jnp.stack([s, s, z], axis=-1)[..., None, :]) @ Vt


def essential_eight_point(x1: jax.Array, x2: jax.Array,
                          weights: jax.Array) -> jax.Array:
    """Weighted 8-point essential-matrix solve on normalized coordinates.

    ``x1``, ``x2``: [N, 2] normalized coords with the epipolar constraint
    ``x2h^T E x1h = 0``; ``weights``: [N] (0/1 mask for a minimal sample, or
    inlier weights for a refit). Solves ``min ||W A e||`` by first QR-
    reducing the tall design (``min ||Av|| = min ||Rv||`` since Q is
    orthogonal) and taking the smallest right singular vector of the 9x9
    R — numerically identical to the SVD of A (NO A^T A conditioning
    squaring, unlike the ``_fast`` variant below) at a fraction of the
    cost: the [N, 9] SVD was a dominant LO-RANSAC refit cost at N = 4000.
    Then projects onto the essential manifold (singular values ->
    (s, s, 0)).
    """
    Aw = epipolar_design(x1, x2) * weights[:, None]
    R = jnp.linalg.qr(Aw, mode="r")                  # [9, 9]
    _, _, Vt9 = jnp.linalg.svd(R, full_matrices=True)
    e = Vt9[-1]  # right singular vector of the smallest singular value
    return project_to_essential(e.reshape(3, 3))


def essential_eight_point_fast(x1: jax.Array, x2: jax.Array,
                               weights: jax.Array) -> jax.Array:
    """8-point solve via the smallest eigenvector of the 9x9 normal matrix
    A^T A (symmetric eigh) instead of the SVD of A — faster, but squares the
    condition number: in float32 the resulting models lose ~half the inliers
    at a 1 px threshold (measured). RANSAC uses :func:`nullspace_8x9` for
    minimal samples and the SVD solver for refits. Kept for callers with
    looser thresholds or float64 inputs."""
    Aw = epipolar_design(x1, x2) * weights[:, None]
    M = Aw.T @ Aw
    _, vecs = jnp.linalg.eigh(M)   # ascending eigenvalues
    return project_to_essential(vecs[:, 0].reshape(3, 3))


def sampson_error(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order (Sampson) squared epipolar error, [N], normalized coords."""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)  # [N,3]
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)
    Ex1 = x1h @ E.T      # [N,3] = (E @ x1h^T)^T
    Etx2 = x2h @ E       # [N,3] = (E^T @ x2h^T)^T
    num = jnp.sum(x2h * Ex1, axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def decompose_essential(E: jax.Array):
    """E -> the four (R, t) candidates (R1,t), (R1,-t), (R2,t), (R2,-t).

    Mirrors cv::decomposeEssentialMat: R1 = U W V^T, R2 = U W^T V^T, t = u3,
    with determinant sign fixes so R are proper rotations.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Make U, Vt proper (det +1) so R below are rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def triangulate_dlt(R1: jax.Array, t1: jax.Array, R2: jax.Array, t2: jax.Array,
                    x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Batched two-view DLT triangulation (cv::triangulatePoints equivalent,
    reference main.cpp:1249-1250), normalized coords.

    Builds the 4x4 DLT system per correspondence and takes its smallest right
    singular vector (batched 4x4 SVD — direct, not via ``A^T A``, to keep
    float32 accuracy). Returns [N, 3] world points (homogeneous division
    guarded; callers must gate on depth/parallax as the reference does).
    """
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)  # [3,4]
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)

    def one(a1, a2):
        rows = jnp.stack([
            a1[0] * P1[2] - P1[0],
            a1[1] * P1[2] - P1[1],
            a2[0] * P2[2] - P2[0],
            a2[1] * P2[2] - P2[1],
        ])  # [4,4]
        _, _, Vt = jnp.linalg.svd(rows)
        Xh = Vt[-1]
        w = Xh[3]
        w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
        return Xh[:3] / w_safe

    return jax.vmap(one)(x1, x2)


def triangulate_linear(R1: jax.Array, t1: jax.Array, R2: jax.Array,
                       t2: jax.Array, x1: jax.Array, x2: jax.Array
                       ) -> jax.Array:
    """Inhomogeneous two-view triangulation: the same DLT rows as
    :func:`triangulate_dlt` but solved as ``B X = -c`` (B = A[:, :3],
    c = A[:, 3]) via closed-form 3x3 normal equations instead of a batched
    4x4 SVD. ~10x faster on TPU (small-matrix SVD is iterative Jacobi);
    equivalent except for points at infinity — use for cheirality votes and
    anywhere only a finite-point estimate is needed."""
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)  # [3,4]
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
    rows = jnp.stack([
        x1[:, 0:1] * P1[2] - P1[0],
        x1[:, 1:2] * P1[2] - P1[1],
        x2[:, 0:1] * P2[2] - P2[0],
        x2[:, 1:2] * P2[2] - P2[1],
    ], axis=1)                                       # [N, 4, 4]
    B = rows[..., :3]
    c = rows[..., 3]
    H = jnp.einsum("nij,nik->njk", B, B)
    g = jnp.einsum("nij,ni->nj", B, c)
    H = H + 1e-12 * jnp.eye(3, dtype=H.dtype)[None]
    return -_solve3x3(H, g)


def _solve3x3(H: jax.Array, g: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 solve (Cramer / adjugate): pure elementwise
    VPU arithmetic instead of the batched-LU custom call that
    ``jnp.linalg.solve`` lowers to — the LU is the dominant cost of
    triangulation inside the per-frame SfM scan. H must be invertible (the
    caller's Tikhonov epsilon guarantees it for degenerate rays)."""
    a, b, c = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    d, e, f = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    p, q, r = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    A00 = e * r - f * q
    A01 = c * q - b * r
    A02 = b * f - c * e
    A10 = f * p - d * r
    A11 = a * r - c * p
    A12 = c * d - a * f
    A20 = d * q - e * p
    A21 = b * p - a * q
    A22 = a * e - b * d
    det = a * A00 + b * A10 + c * A20
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    x0 = (A00 * g[..., 0] + A01 * g[..., 1] + A02 * g[..., 2]) * inv_det
    x1 = (A10 * g[..., 0] + A11 * g[..., 1] + A12 * g[..., 2]) * inv_det
    x2 = (A20 * g[..., 0] + A21 * g[..., 1] + A22 * g[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def depths(R: jax.Array, t: jax.Array, X: jax.Array) -> jax.Array:
    """Per-point camera-frame depth z, [N]."""
    return X @ R[2].T + t[2]


def cheirality_counts(Rs: jax.Array, ts: jax.Array, x1: jax.Array,
                      x2: jax.Array, mask: jax.Array) -> jax.Array:
    """For each of the 4 (R, t) candidates, the number of masked points that
    triangulate in front of BOTH cameras (cv::recoverPose's vote)."""
    eye = jnp.eye(3, dtype=Rs.dtype)
    zero = jnp.zeros(3, dtype=Rs.dtype)

    def count(R, t):
        X = triangulate_linear(eye, zero, R, t, x1, x2)
        z1 = depths(eye, zero, X)
        z2 = depths(R, t, X)
        ok = (z1 > 0) & (z2 > 0) & mask
        return jnp.sum(ok.astype(jnp.int32))

    return jax.vmap(count)(Rs, ts)


def recover_pose(E: jax.Array, x1: jax.Array, x2: jax.Array,
                 mask: jax.Array):
    """cv::recoverPose equivalent (reference main.cpp:596-601): choose the
    (R, t) candidate with the best cheirality vote among masked inliers.

    Returns (R, t, pose_inlier_mask, num_pose_inliers) where the pose-inlier
    mask keeps inliers in front of both cameras under the winning pose.
    """
    Rs, ts = decompose_essential(E)
    votes = cheirality_counts(Rs, ts, x1, x2, mask)
    best = jnp.argmax(votes)
    R, t = Rs[best], ts[best]
    eye = jnp.eye(3, dtype=E.dtype)
    zero = jnp.zeros(3, dtype=E.dtype)
    X = triangulate_linear(eye, zero, R, t, x1, x2)
    pose_mask = (depths(eye, zero, X) > 0) & (depths(R, t, X) > 0) & mask
    return R, t, pose_mask, jnp.sum(pose_mask.astype(jnp.int32))


# ---------------------------------------------------------------------------
# gating metrics
# ---------------------------------------------------------------------------

def parallax_angle_deg(C1: jax.Array, C2: jax.Array, X: jax.Array) -> jax.Array:
    """Angle (degrees) between rays C1->X and C2->X, clamped acos
    (reference main.cpp:200-222). Batched over points [N, 3]."""
    ray1 = X - C1[None, :]
    ray2 = X - C2[None, :]
    n1 = jnp.linalg.norm(ray1, axis=-1)
    n2 = jnp.linalg.norm(ray2, axis=-1)
    cosang = jnp.sum(ray1 * ray2, axis=-1) / jnp.maximum(n1 * n2, 1e-18)
    cosang = jnp.clip(cosang, -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cosang))
    return jnp.where((n1 < 1e-9) | (n2 < 1e-9), 0.0, ang)
