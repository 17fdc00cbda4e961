import numpy as np
import pytest

from real2sim_eval_tpu.utils import mesh as meshlib
from real2sim_eval_tpu.utils import ply as plylib


def make_params(rng, n=100, n_rest=45):
    return {
        "means3D": rng.normal(size=(n, 3)).astype(np.float32),
        "sh_colors": rng.normal(size=(n, 3 + n_rest)).astype(np.float32),
        "log_scales": rng.normal(size=(n, 3)).astype(np.float32),
        "unnorm_rotations": rng.normal(size=(n, 4)).astype(np.float32),
        "logit_opacities": rng.normal(size=(n, 1)).astype(np.float32),
    }


def test_ply_roundtrip(tmp_path, rng):
    params = make_params(rng)
    plylib.save_gaussian_ply(params, tmp_path / "test.ply")
    loaded = plylib.load_gaussian_ply(tmp_path / "test.ply")
    for k in params:
        np.testing.assert_allclose(loaded[k], params[k], atol=1e-6)


def test_sh_layout_roundtrip(rng):
    sh = rng.normal(size=(10, 48)).astype(np.float32)
    coeffs = plylib.sh_colors_to_coeffs(sh)
    assert coeffs.shape == (10, 16, 3)
    np.testing.assert_allclose(coeffs[:, 0], sh[:, :3])
    back = plylib.coeffs_to_sh_colors(coeffs)
    np.testing.assert_allclose(back, sh)


def test_splat_export(tmp_path, rng):
    params = make_params(rng, n=7)
    plylib.save_splat(params, tmp_path / "a.splat")
    data = (tmp_path / "a.splat").read_bytes()
    assert len(data) == 7 * (12 + 12 + 4 + 4)


def test_box_mesh_geometry():
    box = meshlib.make_box((2.0, 2.0, 2.0))
    assert box.vertices.shape == (8, 3)
    assert box.faces.shape == (12, 3)
    np.testing.assert_allclose(box.face_areas().sum(), 24.0, atol=1e-5)
    # outward normals: dot(normal, centroid) > 0 for a centered box
    centroids = box.vertices[box.faces].mean(axis=1)
    dots = (box.face_normals() * centroids).sum(-1)
    assert (dots > 0).all()


def test_sphere_mesh():
    sph = meshlib.make_sphere(radius=1.0)
    r = np.linalg.norm(sph.vertices, axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=1e-5)
    # surface area approaches 4*pi
    assert abs(sph.face_areas().sum() - 4 * np.pi) < 0.5


def test_surface_sampling(rng):
    box = meshlib.make_box((1.0, 1.0, 1.0))
    pts, normals = box.sample_surface(500, rng, return_normals=True)
    assert pts.shape == (500, 3)
    assert np.abs(pts).max() <= 0.5 + 1e-5
    # every sample lies on a face: one coordinate at +-0.5
    on_face = (np.abs(np.abs(pts) - 0.5) < 1e-5).any(axis=-1)
    assert on_face.all()
    assert np.allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-5)


def test_poisson_sampling_spread(rng):
    box = meshlib.make_box((1.0, 1.0, 1.0))
    pts = box.sample_surface_poisson(200, rng)
    assert 50 <= len(pts) <= 200
    # min pairwise distance should be meaningfully large for spread points
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() > 0.01


def test_obj_roundtrip(tmp_path):
    box = meshlib.make_box()
    meshlib.save_obj(box, tmp_path / "box.obj")
    loaded = meshlib.load_obj(tmp_path / "box.obj")
    np.testing.assert_allclose(loaded.vertices, box.vertices, atol=1e-6)
    np.testing.assert_array_equal(loaded.faces, box.faces)


def test_mesh_transform():
    box = meshlib.make_box()
    T = np.eye(4)
    T[:3, 3] = [1, 2, 3]
    box.transform(T)
    np.testing.assert_allclose(box.vertices.mean(0), [1, 2, 3], atol=1e-6)


def test_reference_obj_loads():
    import pathlib
    p = pathlib.Path("/root/reference/assets/robots/xarm/xarm_gripper/meshes")
    if not p.exists():
        pytest.skip("reference assets unavailable")
    objs = sorted(p.glob("*.obj")) + sorted(p.glob("**/*.obj"))
    stls = sorted(p.glob("**/*.stl"))
    files = (objs + stls)[:2]
    if not files:
        pytest.skip("no mesh files")
    for f in files:
        m = meshlib.load_mesh(f)
        assert len(m.vertices) > 0 and len(m.faces) > 0
        assert np.isfinite(m.vertices).all()


def test_load_phystwin_ply(tmp_path):
    """PhysTwin-exported gaussians: single isotropic scale column and the
    reference's exact (dc-then-rest-overwrite) feature layout
    (gs_processor.py:19-57)."""
    import struct

    from real2sim_eval_tpu.utils.gs_processor import GSProcessor

    n = 5
    rng = np.random.default_rng(0)
    props = (["x", "y", "z"] + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(45)] + ["opacity", "scale_0"]
             + [f"rot_{i}" for i in range(4)])
    data = rng.normal(size=(n, len(props))).astype("<f4")
    path = tmp_path / "phystwin.ply"
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n"
              + "".join(f"property float {p}\n" for p in props)
              + "end_header\n")
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(data.tobytes())

    params = GSProcessor().load_phystwin(path)
    np.testing.assert_allclose(params["means3D"], data[:, :3], atol=1e-6)
    # feature layout: f_rest overwrites from column 0 (reference :29-33)
    feats = params["sh_colors"]
    assert feats.shape == (n, 48)
    np.testing.assert_allclose(feats[:, :45], data[:, 6:51], atol=1e-6)
    np.testing.assert_allclose(feats[:, 45:], 0.0)
    # single scale column expands isotropically (:51)
    ls = params["log_scales"]
    assert ls.shape == (n, 3)
    np.testing.assert_allclose(ls[:, 0], data[:, 52], atol=1e-6)
    np.testing.assert_allclose(ls[:, 1], data[:, 52], atol=1e-6)
    assert params["unnorm_rotations"].shape == (n, 4)
    assert params["logit_opacities"].shape == (n, 1)
