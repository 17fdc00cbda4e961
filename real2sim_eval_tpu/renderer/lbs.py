"""Linear-blend-skinning motion interpolation (sim particles -> Gaussians).

JAX port of the reference's ``interpolate_motions``
(sim/utils/gs/transform_utils.py:58-212) and its kNN weight builders
(gs_renderer.py:195-211, 286-300):

  - per-bone rigid fit of the local neighborhood motion via batched
    Procrustes. The reference's chain of rank-2/rank-1/ipdb fallbacks
    (transform_utils.py:85-161) collapses into the branch-free Kabsch
    correction R = U diag(1,1,det(UV^T)) V^T, which returns the nearest
    rotation for ALL ranks (for rank-1 neighborhoods the answer is not
    unique; Kabsch picks a valid representative, where the reference
    hand-constructs one).
  - distance-weighted blend of per-bone SE(3)s over each particle's
    k nearest bones.

Weights/relations are precomputed once per episode on frozen rest bones
(cfg.physics.precompute_relations, gs_renderer.py:733-739) so the hot loop
is pure gathers + small matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils import transforms as tf

K_REL = 8       # bone-graph neighbours (gs_renderer.py:34)
K_WGT = 16      # bones blended per particle (gs_renderer.py:35)
K_REL_SIMPLE = 16


def knn_relations(bones: jax.Array, k: int = K_REL) -> jax.Array:
    """(n_bones, k) nearest-neighbour indices, excluding self."""
    d = jnp.linalg.norm(bones[:, None] - bones[None], axis=-1)
    d = d + jnp.eye(bones.shape[0], dtype=d.dtype) * jnp.inf
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def knn_weights(bones: jax.Array, pts: jax.Array, k: int = K_WGT,
                chunk: int = 4096):
    """Per-particle inverse-distance weights over the k nearest bones
    (gs_renderer.py:202-211). Chunked over particles to bound the
    (chunk, n_bones) distance matrix.
    Returns (weights (N, k), indices (N, k))."""
    n = pts.shape[0]
    n_pad = -(-n // chunk) * chunk
    pts_p = jnp.pad(pts, ((0, n_pad - n), (0, 0)))

    def one_chunk(p):
        d = jnp.linalg.norm(p[:, None] - bones[None], axis=-1)
        negd, idx = jax.lax.top_k(-d, k)
        w = 1.0 / (-negd + 1e-6)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        return w, idx.astype(jnp.int32)

    w, idx = jax.lax.map(one_chunk, pts_p.reshape(-1, chunk, 3))
    return w.reshape(n_pad, k)[:n], idx.reshape(n_pad, k)[:n]


def _det3(X):
    return jnp.sum(X[..., :, 0] * jnp.cross(X[..., :, 1], X[..., :, 2],
                                            axis=-1), axis=-1)


def fit_bone_rotations(bones, motions, relations):
    """Per-bone rotation from neighborhood displacement (Procrustes).

    TPU note: batched 3x3 ``jnp.linalg.svd`` costs ~45 ms per compose at
    B=8 on a v5e (iterative, scalar-heavy); the orthogonal Procrustes
    factor is instead extracted by Newton's polar iteration
    X <- (X + X^-T)/2 with the 3x3 inverse written as cross-product
    cofactors — pure elementwise math, ~1.6 ms, quadratically convergent.
    A small identity bias regularizes rank-deficient neighborhoods (e.g. a
    straight rope segment, where the rotation about the chain axis is
    unobservable and the reference's own SVD fallback chain is effectively
    arbitrary — PARITY.md deviation 6)."""
    adj = bones[relations] - bones[:, None]                     # (B, k, 3)
    adj_new = adj + (motions[relations] - motions[:, None])     # (B, k, 3)
    # highest: TPU default rounds the ~1e-2 m displacement operands to
    # bf16 on the MXU; the rotation fit feeds every LBS'd splat pose
    F = jnp.einsum("bki,bkj->bij", adj_new, adj,
                   precision="highest")                         # (B, 3, 3)

    s = jnp.sqrt(jnp.sum(F * F, axis=(-2, -1), keepdims=True)) + 1e-12
    eye = jnp.eye(3, dtype=F.dtype)
    X = F / s + 1e-3 * eye      # negligible bias; defines the completion of
    # rank-deficient neighborhoods (unobservable rotation -> identity-ish)
    # guarantee det > 0 (proper rotation branch) for near-reflective fits:
    # eigenvalues of F/s are bounded by 1, so +1.5 I forces positivity
    d0 = _det3(X)
    X = X + jnp.where(d0 < 1e-6, 1.5, 0.0)[:, None, None] * eye

    # structure-of-arrays Newton: ops on (B, 3, 3) tensors tile as 3-lane
    # vectors on TPU (~3% lane utilization — 21.5 ms/step at B=64x1000
    # bones); in component-major (3, 3, B) layout every op runs full-lane
    # (same formulas element-for-element, so results are bitwise equal).
    # The iteration is a lax loop, NOT unrolled: 8 unrolled trips of the
    # nested cofactor products send XLA:CPU's algebraic simplifier into
    # minutes-long compiles (TPU compiled fine, but tests run on CPU)
    def body(_, x):
        # determinant scaling accelerates Newton across the huge singular
        # -value spread the 1e-3 bias creates (converges in ~6 iterations)
        def col_cross(a, b):
            return jnp.stack([x[1, a] * x[2, b] - x[2, a] * x[1, b],
                              x[2, a] * x[0, b] - x[0, a] * x[2, b],
                              x[0, a] * x[1, b] - x[1, a] * x[0, b]])

        c0 = col_cross(1, 2)
        det = x[0, 0] * c0[0] + x[1, 0] * c0[1] + x[2, 0] * c0[2]
        g = jnp.abs(det) ** (-1.0 / 3.0)
        x = x * g
        cof = jnp.stack([col_cross(1, 2), col_cross(2, 0),
                         col_cross(0, 1)])          # cof[j][i] = cofactor
        det = (x[0, 0] * cof[0, 0] + x[1, 0] * cof[0, 1]
               + x[2, 0] * cof[0, 2])
        # X <- (X + X^-T)/2; (X^-T)[i, j] = cof[j][i] / det
        inv_t = jnp.swapaxes(cof, 0, 1) / det
        return 0.5 * (x + inv_t)

    x0 = jnp.transpose(X, (1, 2, 0))                # (3, 3, B)
    xf = jax.lax.fori_loop(0, 8, body, x0)
    return jnp.transpose(xf, (2, 0, 1))


def interpolate_motions(bones, motions, relations, weights, weights_indices,
                        xyz, quat=None):
    """Move gaussians by blended per-bone rigid transforms.

    Args:
      bones: (B, 3) rest bone (sim particle) positions.
      motions: (B, 3) bone displacements this frame.
      relations: (B, k_rel) bone-graph neighbours.
      weights/weights_indices: (N, k_wgt) blend weights + bone ids.
      xyz: (N, 3) gaussian centers; quat: optional (N, 4) wxyz.
    Returns (xyz_new, quat_new_or_None).
    """
    R = fit_bone_rotations(bones, motions, relations)           # (B, 3, 3)

    # ONE packed row-gather instead of four: per-bone lanes
    # [bone(3) | motion(3) | R(9) | quat(4)] gather together by
    # weights_indices — TPU gathers serialize per ROW, so four separate
    # fancy-index gathers of the same rows cost ~4x one 19-lane gather
    # (same lesson as binning v3's packed pair tables). Values are
    # bitwise identical to the per-array gathers.
    n, k = weights_indices.shape
    lanes = [bones, motions, R.reshape(-1, 9)]
    if quat is not None:
        lanes.append(tf.rot_to_quat(R))                         # (B, 4)
    table = jnp.concatenate(lanes, axis=-1)                     # (B, 15|19)
    sel = table[weights_indices]                                # (N, k, L)
    b_sel = sel[..., 0:3]
    m_sel = sel[..., 3:6]
    R_sel = sel[..., 6:15].reshape(n, k, 3, 3)
    local = xyz[:, None] - b_sel                                # (N, k, 3)
    # broadcast-multiply-reduce (fuses) rather than einsum (standalone
    # dot_general kernel); the contraction is the same 3-term sum
    moved = (jnp.sum(R_sel * local[:, :, None, :], axis=-1)
             + b_sel + m_sel)
    xyz_new = jnp.sum(moved * weights[..., None], axis=1)

    if quat is None:
        return xyz_new, None
    q_sel = sel[..., 15:19]                                     # (N, k, 4)
    q_blend = tf.quat_normalize(jnp.sum(q_sel * weights[..., None], axis=1))
    quat_new = tf.quat_multiply(q_blend, quat)
    return xyz_new, quat_new


def simple_weights(bones: jax.Array, pts: jax.Array, k: int = K_REL_SIMPLE,
                   chunk: int = 4096):
    """The non-LBS path (gs_renderer.py:286-300): pure inverse-distance
    blend of bone positions (no rotations). Same (weights, indices) layout."""
    return knn_weights(bones, pts, k=k, chunk=chunk)


def simple_apply(weights, indices, bones_pred):
    """xyz = sum_k w_k * bones_pred[idx_k] (gs_renderer.py:757)."""
    return jnp.sum(weights[..., None] * bones_pred[indices], axis=1)
