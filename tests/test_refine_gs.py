"""Gaussian refinement tool (experiments/utils/refine_gs.py): gradient
descent through the differentiable rasterizer recovers perturbed splat
attributes from posed target images."""

import json

import numpy as np
import pytest

from real2sim_eval_tpu.utils.ply import (load_gaussian_ply,
                                         save_gaussian_ply)


def make_raw_params(rng, n=30):
    means = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    means[:, 2] = rng.uniform(1.2, 2.5, n)
    return {
        "means3D": means,
        "sh_colors": (rng.normal(size=(n, 3)) * 0.4).astype(np.float32),
        "log_scales": np.log(rng.uniform(0.04, 0.12, (n, 3))
                             ).astype(np.float32),
        "unnorm_rotations": np.tile(np.asarray([1, 0, 0, 0], np.float32),
                                    (n, 1)),
        "logit_opacities": rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32),
    }


def make_views(params, h=16, w=256):
    import jax.numpy as jnp

    from real2sim_eval_tpu.renderer import Camera, RasterConfig, rasterize
    from real2sim_eval_tpu.utils.ply import sh_colors_to_coeffs

    k = np.asarray([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                   np.float32)
    w2c1 = np.eye(4, dtype=np.float32)
    w2c2 = np.eye(4, dtype=np.float32)
    w2c2[0, 3] = 0.15                       # shifted second view
    ims = []
    for w2c in (w2c1, w2c2):
        rgb, _ = rasterize(
            Camera(width=w, height=h, fx=40.0, fy=40.0, cx=w / 2, cy=h / 2),
            jnp.asarray(w2c), jnp.asarray(params["means3D"]),
            jnp.exp(jnp.asarray(params["log_scales"])),
            jnp.asarray(params["unnorm_rotations"]),
            1.0 / (1.0 + np.exp(-params["logit_opacities"])).reshape(-1),
            jnp.asarray(sh_colors_to_coeffs(params["sh_colors"])), 0,
            config=RasterConfig(backend="reference"))
        ims.append(np.moveaxis(np.asarray(rgb), 0, -1))
    return (np.stack([k, k]), np.stack([w2c1, w2c2]),
            np.stack(ims).astype(np.float32))


@pytest.mark.slow
def test_refine_recovers_colors(rng):
    from real2sim_eval_tpu.experiments.utils.refine_gs import refine

    true = make_raw_params(rng)
    ks, w2cs, images = make_views(true)
    start = dict(true)
    start["sh_colors"] = (true["sh_colors"]
                          + rng.normal(size=true["sh_colors"].shape)
                          .astype(np.float32) * 0.3)
    refined, hist = refine(start, ks, w2cs, images,
                           attrs=("colors",), iters=40, lr=2e-2,
                           interpret=True, log_every=39)
    assert hist[-1] < 0.25 * hist[0], hist
    # geometry untouched
    np.testing.assert_array_equal(refined["means3D"], true["means3D"])


@pytest.mark.slow
def test_refine_recovers_geometry(rng):
    """VERDICT round-3 item 7: a misplaced-splat scene recovers positions
    through the means/scales/rotations gradient surface (the reference's
    backward.cu:347-656 gradient set, exercised end-to-end through the
    CLI-facing refine())."""
    from real2sim_eval_tpu.experiments.utils.refine_gs import refine

    true = make_raw_params(rng, n=12)
    ks, w2cs, images = make_views(true, h=32, w=256)
    start = dict(true)
    shift = rng.normal(size=true["means3D"].shape).astype(np.float32) * 0.03
    start["means3D"] = true["means3D"] + shift
    start["log_scales"] = (true["log_scales"]
                           + rng.normal(size=true["log_scales"].shape)
                           .astype(np.float32) * 0.2)
    refined, hist = refine(start, ks, w2cs, images,
                           attrs=("means", "scales", "rotations"),
                           iters=150, lr=2e-2, interpret=True,
                           log_every=50)
    assert hist[-1] < 0.3 * hist[0], hist
    err0 = np.linalg.norm(start["means3D"] - true["means3D"], axis=1).mean()
    err1 = np.linalg.norm(refined["means3D"] - true["means3D"],
                          axis=1).mean()
    assert err1 < 0.5 * err0, (err0, err1)
    # appearance untouched
    np.testing.assert_array_equal(refined["sh_colors"], true["sh_colors"])


def test_refine_rejects_saturated_budget(rng):
    from real2sim_eval_tpu.experiments.utils.refine_gs import refine

    true = make_raw_params(rng)
    ks, w2cs, images = make_views(true)
    with pytest.raises(RuntimeError, match="binning dropped"):
        refine(true, ks, w2cs, images, iters=1, interpret=True,
               max_pairs_factor=0.02)


@pytest.mark.slow
def test_refine_cli_roundtrip(rng, tmp_path):
    from real2sim_eval_tpu.experiments.utils.refine_gs import main

    true = make_raw_params(rng)
    ks, w2cs, images = make_views(true)
    start = dict(true)
    start["logit_opacities"] = (true["logit_opacities"] - 1.0)
    save_gaussian_ply(start, tmp_path / "start.ply")
    np.savez(tmp_path / "views.npz", k=ks, w2c=w2cs, images=images)
    main(["--ply", str(tmp_path / "start.ply"),
          "--views", str(tmp_path / "views.npz"),
          "--out", str(tmp_path / "refined.ply"),
          "--attrs", "opacities", "--iters", "30", "--lr", "5e-2",
          "--interpret"])
    out = load_gaussian_ply(tmp_path / "refined.ply")
    err0 = np.abs(start["logit_opacities"] - true["logit_opacities"]).mean()
    err1 = np.abs(out["logit_opacities"] - true["logit_opacities"]).mean()
    assert err1 < 0.6 * err0, (err0, err1)
