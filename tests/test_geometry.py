import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from vegs_tpu import geometry, sh


def test_quat_rotmat_roundtrip(rng):
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = geometry.quat_to_rotmat(jnp.asarray(q))
    # scipy uses (x,y,z,w)
    R_ref = Rotation.from_quat(np.roll(q, -1, axis=1)).as_matrix()
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    q_back = geometry.rotmat_to_quat(R)
    q_std = np.where(q[:, :1] < 0, -q, q)
    np.testing.assert_allclose(np.asarray(q_back), q_std, atol=1e-5)


def test_quat_multiply_matches_matrix_product(rng):
    a = rng.normal(size=(8, 4)).astype(np.float32)
    b = rng.normal(size=(8, 4)).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    ab = geometry.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    R = geometry.quat_to_rotmat(ab)
    R_ref = np.asarray(geometry.quat_to_rotmat(jnp.asarray(a))) @ np.asarray(
        geometry.quat_to_rotmat(jnp.asarray(b))
    )
    np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)


def test_covariance_strip_roundtrip(rng):
    scales = rng.uniform(0.1, 2.0, (16, 3)).astype(np.float32)
    quats = rng.normal(size=(16, 4)).astype(np.float32)
    cov = geometry.covariance_from_scaling_rotation(
        jnp.asarray(scales), jnp.asarray(quats)
    )
    six = geometry.strip_symmetric(cov)
    back = geometry.unstrip_symmetric(six)
    np.testing.assert_allclose(np.asarray(back), np.asarray(cov), atol=1e-6)
    # covariance is PSD with det = prod(scales^2)
    det = np.linalg.det(np.asarray(cov))
    np.testing.assert_allclose(det, np.prod(scales**2, axis=1), rtol=2e-2)


def test_decompose_compose_T(rng):
    q = rng.normal(size=(4,)).astype(np.float32)
    R = np.asarray(geometry.quat_to_rotmat(jnp.asarray(q)))
    S = rng.uniform(0.5, 2.0, 3).astype(np.float32)
    t = rng.normal(size=3).astype(np.float32)
    T = np.asarray(geometry.compose_T(jnp.asarray(R), jnp.asarray(S), jnp.asarray(t)))
    R2, S2, t2 = geometry.decompose_T_to_RS(jnp.asarray(T))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(S2), S, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-6)


def test_slerp_endpoints(rng):
    q0 = rng.normal(size=4).astype(np.float32)
    q1 = rng.normal(size=4).astype(np.float32)
    q0 /= np.linalg.norm(q0)
    q1 /= np.linalg.norm(q1)
    s0 = np.asarray(geometry.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0))
    s1 = np.asarray(geometry.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0))
    np.testing.assert_allclose(s0, q0, atol=1e-6)
    np.testing.assert_allclose(np.abs(s1 @ q1), 1.0, atol=1e-5)


def test_normal_to_rot_first_column(rng):
    n = rng.normal(size=(32, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    R = np.asarray(geometry.normal_to_rot(jnp.asarray(n)))
    np.testing.assert_allclose(R[..., :, 0], n, atol=1e-5)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-4)


def test_sh_eval_matches_basis(rng):
    coeffs = rng.normal(size=(10, 3, 16)).astype(np.float32)
    dirs = rng.normal(size=(10, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    for deg in range(4):
        k = (deg + 1) ** 2
        a = sh.eval_sh(deg, jnp.asarray(coeffs[..., :k]), jnp.asarray(dirs))
        basis = sh.sh_basis(deg, jnp.asarray(dirs))
        b = jnp.einsum("nck,nk->nc", jnp.asarray(coeffs[..., :k]), basis)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sh_degree0_constant(rng):
    c = rng.normal(size=(5, 3, 1)).astype(np.float32)
    d1 = jnp.asarray([[0.0, 0.0, 1.0]] * 5)
    d2 = jnp.asarray([[1.0, 0.0, 0.0]] * 5)
    a = sh.eval_sh(0, jnp.asarray(c), d1)
    b = sh.eval_sh(0, jnp.asarray(c), d2)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh.sh_to_rgb(sh.rgb_to_sh(jnp.asarray([0.25, 0.5, 1.0])))),
        [0.25, 0.5, 1.0],
        atol=1e-6,
    )


def test_projection_matrix_center():
    # A point on the optical axis at z projects to NDC (0, 0).
    P = geometry.projection_matrix(0.01, 100.0, 1.0, 0.8)
    p = P @ np.array([0, 0, 5.0, 1.0])
    np.testing.assert_allclose(p[:2] / p[3], [0, 0], atol=1e-6)
    # Principal point offset shifts NDC.
    P2 = geometry.projection_matrix(0.01, 100.0, 1.0, 0.8, cx_offset=0.5)
    p2 = P2 @ np.array([0, 0, 5.0, 1.0])
    assert abs(p2[0] / p2[3] - 0.5) < 1e-6
