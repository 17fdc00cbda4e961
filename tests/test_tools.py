"""Tests for the asset/analysis tooling: ICP registration, color-transform
fitting, scene segmentation."""

from pathlib import Path

import numpy as np
import pytest

from real2sim_eval_tpu.utils.icp import (global_registration, icp,
                                         registration_error)


def rigid(aa, t):
    import jax.numpy as jnp

    from real2sim_eval_tpu.utils import transforms as tf

    T = np.eye(4)
    T[:3, :3] = np.asarray(tf.axis_angle_to_rot(jnp.asarray(aa, jnp.float32)))
    T[:3, 3] = t
    return T


class TestICP:
    def make_cloud(self, rng, n=800):
        # an L-shaped slab: asymmetric so registration is well-posed
        a = rng.random((n // 2, 3)) * [0.4, 0.1, 0.05]
        b = rng.random((n // 2, 3)) * [0.1, 0.3, 0.05] + [0.0, 0.1, 0.0]
        return np.concatenate([a, b])

    def test_icp_recovers_small_transform(self, rng):
        src = self.make_cloud(rng)
        T_true = rigid([0.0, 0.0, 0.2], [0.03, -0.02, 0.01])
        tgt = src @ T_true[:3, :3].T + T_true[:3, 3]
        T = icp(src, tgt, thresholds=(0.1, 0.02))
        np.testing.assert_allclose(T, T_true, atol=5e-3)

    def test_global_plus_icp_large_transform(self, rng):
        src = self.make_cloud(rng)
        T_true = rigid([0.0, 0.0, 2.0], [0.5, 0.3, -0.2])
        tgt = src @ T_true[:3, :3].T + T_true[:3, 3]
        T0 = global_registration(src, tgt)
        T = icp(src, tgt, init=T0, thresholds=(0.1, 0.02))
        err = registration_error(src, tgt, T, trunc=0.5)
        assert err < 2e-3

    def test_icp_with_outliers(self, rng):
        src = self.make_cloud(rng)
        T_true = rigid([0.0, 0.0, 0.1], [0.02, 0.0, 0.0])
        tgt = src @ T_true[:3, :3].T + T_true[:3, 3]
        tgt = np.concatenate([tgt, rng.random((200, 3)) * 2.0])  # clutter
        T = icp(src, tgt, thresholds=(0.05, 0.01))
        np.testing.assert_allclose(T, T_true, atol=2e-2)


class TestColorAlignment:
    def test_recovers_linear_transform(self, rng):
        from real2sim_eval_tpu.experiments.utils.color_alignment import (
            apply_color_transform, solve_color_transform)

        A_true = np.array([[0.9, 0.05, 0.0], [0.0, 0.85, 0.05], [0.0, 0.0, 0.8]])
        b_true = np.array([0.05, 0.02, 0.01])
        sim = rng.random((5000, 3))
        real = sim @ A_true.T + b_true
        A, b = solve_color_transform(sim, real, quadratic=False)
        np.testing.assert_allclose(A, A_true, atol=1e-6)
        np.testing.assert_allclose(b, b_true, atol=1e-6)

    def test_recovers_quadratic_transform(self, rng):
        from real2sim_eval_tpu.experiments.utils.color_alignment import (
            apply_color_transform, solve_color_transform)

        A2 = np.diag([0.2, -0.1, 0.15])
        A1 = np.diag([0.8, 0.9, 0.7])
        b_true = np.array([0.05, 0.0, 0.03])
        sim = rng.random((8000, 3))
        real = sim ** 2 @ A2.T + sim @ A1.T + b_true
        A, b = solve_color_transform(sim, real, quadratic=True)
        fitted = apply_color_transform(sim, A, b)
        assert np.abs(fitted - real).max() < 1e-5

    def test_robust_to_outliers(self, rng):
        from real2sim_eval_tpu.experiments.utils.color_alignment import (
            apply_color_transform, solve_color_transform)

        A1 = np.diag([0.9, 0.9, 0.9])
        sim = rng.random((5000, 3))
        real = sim @ A1.T
        # corrupt 10% of the pairs badly
        idx = rng.choice(5000, 500, replace=False)
        real[idx] = rng.random((500, 3))
        A, b = solve_color_transform(sim, real, quadratic=False)
        clean = np.setdiff1d(np.arange(5000), idx)
        fitted = apply_color_transform(sim[clean], A, b)
        assert np.abs(fitted - real[clean]).max() < 0.02


XARM_URDF = Path("/root/reference/assets/robots/xarm/xarm7_with_gripper.urdf")


@pytest.mark.skipif(not XARM_URDF.exists(), reason="reference assets unavailable")
class TestConstructScene:
    def test_segment_robot_mask_ids(self, rng):
        from real2sim_eval_tpu.experiments.utils.construct_scene import (
            GRIPPER_LINKS, sample_robot_points, segment_robot)

        robot_pts, robot = sample_robot_points(str(XARM_URDF), GRIPPER_LINKS)
        # synthetic scan: noisy robot surface + a table plane
        scan_robot = robot_pts[::4] + rng.normal(scale=0.002,
                                                 size=robot_pts[::4].shape)
        nt = 500
        table = np.stack([rng.uniform(-0.5, 1.0, nt),
                          rng.uniform(-0.8, 0.8, nt),
                          np.full(nt, -0.02)], -1)
        scan = np.concatenate([scan_robot, table])
        params = {"means3D": scan}
        mask, is_robot = segment_robot(params, robot_pts, GRIPPER_LINKS)

        # table points are not robot
        assert (mask[len(scan_robot):] == -1).mean() > 0.95
        # robot points got plausible document-order link ids (points under
        # the base z-cut legitimately stay -1, reference :191-194)
        robot_ids = mask[:len(scan_robot)]
        assert (robot_ids >= 0).mean() > 0.9
        robot_ids = robot_ids[robot_ids >= 0]
        assert robot_ids.min() >= 2
        assert 9 not in robot_ids  # link_eef skipped (reference :231-232)
        assert robot_ids.max() <= 16
        # arm link1 points (sampled first) map to id 2
        assert (robot_ids[:100] == 2).mean() > 0.9

    def test_alignment_recovers_scan_pose(self, rng):
        from real2sim_eval_tpu.experiments.utils.construct_scene import (
            GRIPPER_LINKS, align_scan_to_robot, sample_robot_points)

        robot_pts, _ = sample_robot_points(str(XARM_URDF), GRIPPER_LINKS)
        T_true = rigid([0.0, 0.0, 0.4], [0.2, -0.1, 0.05])
        scan = robot_pts @ np.linalg.inv(T_true)[:3, :3].T \
            + np.linalg.inv(T_true)[:3, 3]
        T = align_scan_to_robot(scan, robot_pts)
        err = registration_error(scan, robot_pts, T)
        assert err < 5e-3


def test_colormap():
    from real2sim_eval_tpu.utils.colormap import colorize_mask

    colors = colorize_mask(np.array([-1, 0, 1, 2, 30]))
    assert colors.shape == (5, 3)
    np.testing.assert_allclose(colors[0], [0.3, 0.3, 0.3])


def test_launch_scripts_mirror_reference():
    """scripts/ captures the reference's task x policy launch configs
    (experiments/scripts/*), incl. the sloth duration override."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1] / "scripts"
    ref = Path("/root/reference/experiments/scripts")
    # launch mirrors live in subdirectories (eval_policy/, replay/, ...);
    # top-level scripts/*.sh are session infrastructure (chip banking),
    # not launch configs, and need not invoke an experiments module
    scripts = sorted(p for p in root.rglob("*.sh") if p.parent != root)
    assert len(scripts) >= 15
    if ref.exists():
        ref_names = {p.relative_to(ref).as_posix() for p in ref.rglob("*.sh")}
        our_names = {p.relative_to(root).as_posix() for p in scripts}
        assert ref_names <= our_names, ref_names - our_names
    sloth = (root / "eval_policy" / "sloth_act.sh").read_text()
    assert "env.sim.duration=15" in sloth      # the paper's sloth override
    assert "gs=sloth" in sloth
    t_push = (root / "eval_policy" / "T_act.sh").read_text()
    assert "env=xarm_pusher" in t_push
    for p in scripts:
        s = p.read_text()
        m = re.search(r"python -m (real2sim_eval_tpu\.experiments\.\w+)", s)
        assert m, p
        import importlib.util
        assert importlib.util.find_spec(m.group(1)) is not None, m.group(1)
