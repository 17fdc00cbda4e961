"""Rasterizer tests: analytic single-Gaussian goldens (forward.cu semantics)
and cross-backend equivalence (dense reference vs Pallas-interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real2sim_eval_tpu.renderer import Camera, RasterConfig, rasterize
from real2sim_eval_tpu.renderer.preprocess import preprocess_gaussians
from real2sim_eval_tpu.utils.sh import rgb_to_sh_dc


def simple_cam(w=128, h=64, f=60.0):
    return Camera(width=w, height=h, fx=f, fy=f, cx=w / 2, cy=h / 2,
                  z_threshold=0.05)


def lookdown_w2c():
    return np.eye(4, dtype=np.float32)  # camera at origin looking +z


def single_gaussian(pos=(0.0, 0.0, 1.0), scale=0.05, opacity=0.9,
                    rgb=(1.0, 0.0, 0.0)):
    means = jnp.asarray([pos], jnp.float32)
    scales = jnp.full((1, 3), scale, jnp.float32)
    quats = jnp.asarray([[1.0, 0, 0, 0]], jnp.float32)
    opac = jnp.asarray([opacity], jnp.float32)
    shs = jnp.zeros((1, 1, 3)).at[0, 0].set(rgb_to_sh_dc(jnp.asarray(rgb)))
    return means, scales, quats, opac, shs


class TestPreprocess:
    def test_projection_center(self):
        cam = simple_cam()
        means, scales, quats, opac, shs = single_gaussian((0.0, 0.0, 2.0))
        pre = preprocess_gaussians(cam, jnp.eye(4), means, scales, quats,
                                   opac, shs, 0)
        # on-axis point projects to principal point (ndc2Pix convention:
        # pixel center = (v+1)*S/2 - 0.5)
        np.testing.assert_allclose(pre["xy"][0], [cam.cx - 0.5, cam.cy - 0.5],
                                   atol=1e-4)
        np.testing.assert_allclose(pre["depth"][0], 2.0, atol=1e-6)
        assert bool(pre["valid"][0])

    def test_z_threshold_cull(self):
        cam = simple_cam()
        means, scales, quats, opac, shs = single_gaussian((0.0, 0.0, 0.04))
        pre = preprocess_gaussians(cam, jnp.eye(4), means, scales, quats,
                                   opac, shs, 0)
        assert not bool(pre["valid"][0])
        assert float(pre["radius"][0]) == 0.0

    def test_behind_camera_cull(self):
        cam = simple_cam()
        means, scales, quats, opac, shs = single_gaussian((0.0, 0.0, -1.0))
        pre = preprocess_gaussians(cam, jnp.eye(4), means, scales, quats,
                                   opac, shs, 0)
        assert not bool(pre["valid"][0])

    def test_isotropic_cov2d_radius(self):
        cam = simple_cam(f=100.0)
        s, z = 0.1, 2.0
        means, scales, quats, opac, shs = single_gaussian((0, 0, z), scale=s)
        pre = preprocess_gaussians(cam, jnp.eye(4), means, scales, quats,
                                   opac, shs, 0)
        # isotropic on-axis: cov2d = (f*s/z)^2 + 0.3 in both axes
        var = (cam.fx * s / z) ** 2 + 0.3
        expected_radius = np.ceil(3 * np.sqrt(var))
        np.testing.assert_allclose(pre["radius"][0], expected_radius)
        # conic = 1/var on the diagonal
        np.testing.assert_allclose(pre["conic"][0, 0], 1 / var, rtol=1e-4)
        np.testing.assert_allclose(pre["conic"][0, 1], 0.0, atol=1e-6)

    def test_offcenter_principal_point(self):
        cam = Camera(width=100, height=80, fx=50, fy=50, cx=30, cy=50)
        means, scales, quats, opac, shs = single_gaussian((0.0, 0.0, 1.0))
        pre = preprocess_gaussians(cam, jnp.eye(4), means, scales, quats,
                                   opac, shs, 0)
        np.testing.assert_allclose(pre["xy"][0], [29.5, 49.5], atol=1e-4)


@pytest.mark.slow
class TestReferenceCompositor:
    def test_single_gaussian_center_alpha(self):
        cam = simple_cam()
        means, scales, quats, opac, shs = single_gaussian(
            (0.0, 0.0, 1.0), scale=0.2, opacity=0.8, rgb=(1.0, 0.5, 0.25))
        rgb, depth = rasterize(cam, jnp.eye(4), means, scales, quats, opac,
                               shs, 0, config=RasterConfig(backend="reference"))
        # at the splat center alpha = opacity (exp(0)=1), color = alpha*rgb
        cy, cx = cam.height // 2, cam.width // 2
        np.testing.assert_allclose(rgb[:, cy, cx], 0.8 * np.array([1.0, 0.5, 0.25]),
                                   atol=0.02)
        # median depth crosses T=0.5 at the center -> splat depth
        np.testing.assert_allclose(depth[cy, cx], 1.0, atol=1e-5)

    def test_empty_scene_is_background(self):
        cam = simple_cam()
        means, scales, quats, opac, shs = single_gaussian((0, 0, -5.0))
        rgb, depth = rasterize(cam, jnp.eye(4), means, scales, quats, opac,
                               shs, 0, bg=(0.2, 0.3, 0.4),
                               config=RasterConfig(backend="reference"))
        np.testing.assert_allclose(rgb[0], 0.2, atol=1e-6)
        np.testing.assert_allclose(rgb[1], 0.3, atol=1e-6)
        np.testing.assert_allclose(depth, 15.0)  # forward.cu:309 default

    def test_front_to_back_occlusion(self):
        cam = simple_cam()
        means = jnp.asarray([[0, 0, 1.0], [0, 0, 2.0]], jnp.float32)
        scales = jnp.full((2, 3), 0.3, jnp.float32)
        quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
        opac = jnp.asarray([0.99, 0.99], jnp.float32)
        shs = jnp.zeros((2, 1, 3))
        shs = shs.at[0, 0].set(rgb_to_sh_dc(jnp.asarray([1.0, 0.0, 0.0])))
        shs = shs.at[1, 0].set(rgb_to_sh_dc(jnp.asarray([0.0, 1.0, 0.0])))
        rgb, depth = rasterize(cam, jnp.eye(4), means, scales, quats, opac,
                               shs, 0, config=RasterConfig(backend="reference"))
        cy, cx = cam.height // 2, cam.width // 2
        assert float(rgb[0, cy, cx]) > 0.95          # front red dominates
        assert float(rgb[1, cy, cx]) < 0.05
        np.testing.assert_allclose(depth[cy, cx], 1.0, atol=1e-5)

    def test_median_depth_semantics(self):
        """Low-alpha front splat: T crosses 0.5 only at the second splat."""
        cam = simple_cam()
        means = jnp.asarray([[0, 0, 1.0], [0, 0, 2.0]], jnp.float32)
        scales = jnp.full((2, 3), 0.5, jnp.float32)
        quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1))
        opac = jnp.asarray([0.3, 0.95], jnp.float32)  # front translucent
        shs = jnp.zeros((2, 1, 3))
        rgb, depth = rasterize(cam, jnp.eye(4), means, scales, quats, opac,
                               shs, 0, config=RasterConfig(backend="reference"))
        cy, cx = cam.height // 2, cam.width // 2
        np.testing.assert_allclose(depth[cy, cx], 2.0, atol=1e-5)


@pytest.mark.slow
class TestPallasBackendEquivalence:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_scene_matches_reference(self, seed):
        rng = np.random.default_rng(seed)
        n = 60
        cam = simple_cam(w=256, h=64, f=80.0)
        means = jnp.asarray(np.stack([
            rng.uniform(-1.0, 1.0, n),
            rng.uniform(-0.4, 0.4, n),
            rng.uniform(0.5, 3.0, n)], -1), jnp.float32)
        scales = jnp.asarray(rng.uniform(0.01, 0.08, (n, 3)), jnp.float32)
        q = rng.normal(size=(n, 4))
        quats = jnp.asarray(q / np.linalg.norm(q, axis=-1, keepdims=True),
                            jnp.float32)
        opac = jnp.asarray(rng.uniform(0.1, 1.0, n), jnp.float32)
        shs = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 1, 3)), jnp.float32)

        ref_rgb, ref_depth = rasterize(
            cam, jnp.eye(4), means, scales, quats, opac, shs, 0,
            bg=(0.1, 0.2, 0.3), config=RasterConfig(backend="reference"))
        pal_rgb, pal_depth = rasterize(
            cam, jnp.eye(4), means, scales, quats, opac, shs, 0,
            bg=(0.1, 0.2, 0.3),
            config=RasterConfig(backend="pallas", interpret=True,
                                max_pairs_factor=8.0,
                                max_tiles_per_gaussian=16,
                                pack_payloads=False))
        np.testing.assert_allclose(np.asarray(pal_rgb), np.asarray(ref_rgb),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(pal_depth), np.asarray(ref_depth),
                                   atol=1e-3)

    @pytest.mark.parametrize("kernel,groups", [("wide", 1), ("fine", 8)])
    def test_batched_instances_match_reference(self, kernel, groups):
        """rasterize_batch (one kernel over env x cam x tile) must agree
        with per-instance dense rendering — for the wide (8,128)
        compositor and the MXU-assembled fine compositor
        (fine_kernel.py)."""
        from real2sim_eval_tpu.renderer.raster import rasterize_batch

        rng = np.random.default_rng(7)
        B, n = 2, 50
        cam_a = simple_cam(w=256, h=64, f=80.0)
        cam_b = Camera(width=256, height=64, fx=95.0, fy=95.0, cx=120.0,
                       cy=30.0, z_threshold=0.05)
        w2c_b = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        w2c_b[1, 0, 3] = 0.15    # second env: shifted camera
        scenes = {
            "means3D": jnp.asarray(np.stack([np.stack([
                rng.uniform(-1, 1, n), rng.uniform(-0.4, 0.4, n),
                rng.uniform(0.5, 3.0, n)], -1) for _ in range(B)]),
                jnp.float32),
            "scales": jnp.asarray(rng.uniform(0.01, 0.08, (B, n, 3)),
                                  jnp.float32),
            "rotations": jnp.asarray(np.tile([1.0, 0, 0, 0], (B, n, 1)),
                                     jnp.float32),
            "opacities": jnp.asarray(rng.uniform(0.1, 1.0, (B, n)),
                                     jnp.float32),
            "shs": jnp.asarray(rng.uniform(-0.5, 0.5, (B, n, 1, 3)),
                               jnp.float32),
        }
        cfg = RasterConfig(backend="pallas", interpret=True,
                           max_pairs_factor=8.0, max_tiles_per_gaussian=16,
                           kernel=kernel,
                           pack_payloads=False,
                           # fine budgets sized so nothing clamps (clamped
                           # rects are budget drops the dense reference
                           # doesn't model)
                           fine_max_tiles=128, fine_pairs_factor=80.0)
        rgb, depth = rasterize_batch(
            [(cam_a, jnp.asarray(w2c_b)), (cam_b, jnp.asarray(w2c_b))],
            scenes, 0, config=cfg)
        assert rgb.shape == (2, B, 3, 64, 256)
        for ci, cam in enumerate((cam_a, cam_b)):
            for b in range(B):
                ref_rgb, ref_depth = rasterize(
                    cam, jnp.asarray(w2c_b[b]), scenes["means3D"][b],
                    scenes["scales"][b], scenes["rotations"][b],
                    scenes["opacities"][b], scenes["shs"][b], 0,
                    config=RasterConfig(backend="reference",
                                        kernel=kernel))
                np.testing.assert_allclose(
                    np.asarray(rgb[ci, b]),
                    np.asarray(jnp.clip(ref_rgb, 0.0, 1.0)), atol=2e-3)
                np.testing.assert_allclose(np.asarray(depth[ci, b]),
                                           np.asarray(ref_depth), atol=1e-3)

    @pytest.mark.parametrize("kernel", ["wide", "fine"])
    def test_packed_payloads_within_tolerance(self, kernel):
        """f16-packed sort payloads (VERDICT round-2 item 2): quantized
        conic/opacity/rgb/depth must stay within the documented golden
        tolerance (<= 1/255 rgb, <= 1e-2 depth) of the unpacked pipeline."""
        from real2sim_eval_tpu.renderer.raster import rasterize_batch

        rng = np.random.default_rng(11)
        B, n = 2, 120
        cam = simple_cam(w=256, h=64, f=80.0)
        w2c_b = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        scenes = {
            "means3D": jnp.asarray(np.stack([np.stack([
                rng.uniform(-1, 1, n), rng.uniform(-0.4, 0.4, n),
                rng.uniform(0.5, 3.0, n)], -1) for _ in range(B)]),
                jnp.float32),
            "scales": jnp.asarray(rng.uniform(0.01, 0.06, (B, n, 3)),
                                  jnp.float32),
            "rotations": jnp.asarray(np.tile([1.0, 0, 0, 0], (B, n, 1)),
                                     jnp.float32),
            "opacities": jnp.asarray(rng.uniform(0.1, 1.0, (B, n)),
                                     jnp.float32),
            "shs": jnp.asarray(rng.uniform(-0.5, 0.5, (B, n, 1, 3)),
                               jnp.float32),
        }
        outs = {}
        for packed in (False, True):
            cfg = RasterConfig(backend="pallas", interpret=True,
                               max_pairs_factor=10.0,
                               max_tiles_per_gaussian=16, kernel=kernel,
                               fine_max_tiles=128, fine_pairs_factor=80.0,
                               pack_payloads=packed)
            outs[packed] = rasterize_batch(
                [(cam, jnp.asarray(w2c_b))], scenes, 0, config=cfg)
        d_rgb = float(jnp.abs(outs[True][0] - outs[False][0]).max())
        d_dep = np.abs(np.asarray(outs[True][1] - outs[False][1]))
        assert d_rgb <= 1.0 / 255.0, d_rgb
        # median depth is DISCONTINUOUS in alpha: a pixel whose
        # transmittance lands exactly at the T=0.5 crossing can flip
        # between a recorded depth and the 15.0 default under any
        # quantization. Allow rare threshold flips; the bulk must hold
        # the documented 1e-2 tolerance.
        n_flip = int((d_dep > 1e-2).sum())
        assert n_flip <= max(5, int(2e-4 * d_dep.size)), \
            (n_flip, float(d_dep.max()))

    def test_fine_batch_env_chunking_exact(self):
        """The memory-bounded env chunking of the full fine pipeline
        (raster._rasterize_batch_fine, merge_mem_budget) must be
        invisible: per-env pipelines are independent, lax.map only
        serializes them (round-5: the unchunked wrist-fine table OOM'd
        at headline scale). Tolerance is f32-ulp scale, not bitwise —
        XLA fuses the vmapped preprocess differently at batch 5 vs
        batch 1, reassociating a few adds (~1e-7 observed)."""
        from real2sim_eval_tpu.renderer.raster import rasterize_batch

        rng = np.random.default_rng(13)
        B, n = 5, 60
        cam = simple_cam(w=256, h=64, f=80.0)
        w2c_b = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        w2c_b[:, 0, 3] = np.linspace(-0.1, 0.1, B)
        scenes = {
            "means3D": jnp.asarray(np.stack([np.stack([
                rng.uniform(-1, 1, n), rng.uniform(-0.4, 0.4, n),
                rng.uniform(0.5, 3.0, n)], -1) for _ in range(B)]),
                jnp.float32),
            "scales": jnp.asarray(rng.uniform(0.01, 0.08, (B, n, 3)),
                                  jnp.float32),
            "rotations": jnp.asarray(np.tile([1.0, 0, 0, 0], (B, n, 1)),
                                     jnp.float32),
            "opacities": jnp.asarray(rng.uniform(0.1, 1.0, (B, n)),
                                     jnp.float32),
            "shs": jnp.asarray(rng.uniform(-0.5, 0.5, (B, n, 1, 3)),
                               jnp.float32),
        }
        base = dict(backend="pallas", interpret=True, kernel="fine",
                    pack_payloads=False, fine_max_tiles=128,
                    fine_pairs_factor=80.0)
        full = rasterize_batch([(cam, jnp.asarray(w2c_b))], scenes, 0,
                               config=RasterConfig(**base), return_drops=True)
        # a 1-byte budget forces chunk_b=1 (B chunks incl. a padded tail
        # when B isn't divisible)
        chunked = rasterize_batch([(cam, jnp.asarray(w2c_b))], scenes, 0,
                                  config=RasterConfig(**base,
                                                      merge_mem_budget=1),
                                  return_drops=True)
        for a, b in zip(full, chunked):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_wide_image_padding_cropped(self):
        cam = simple_cam(w=200, h=50)  # not multiples of tile dims
        means, scales, quats, opac, shs = single_gaussian((0, 0, 1.0), 0.1)
        rgb, depth = rasterize(cam, jnp.eye(4), means, scales, quats, opac,
                               shs, 0,
                               config=RasterConfig(backend="pallas",
                                                   interpret=True))
        assert rgb.shape == (3, 50, 200)
        assert depth.shape == (50, 200)
