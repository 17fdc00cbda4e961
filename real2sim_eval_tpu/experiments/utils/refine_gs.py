"""Per-gaussian scene refinement against target images.

Fits selected splat attributes of a 3DGS PLY to a set of posed target
images by gradient descent through the differentiable rasterizer
(renderer/diff.py). This is the per-gaussian extension of the
reference's global color alignment (assets/scans/color_alignment.py
fits ONE quadratic RGB transform for the whole scene,
:36-83): when a scan's colors/opacities don't match the real camera,
refine the gaussians themselves instead of post-multiplying frames.
The reference carries the machinery for this (its rasterizer backward,
cuda_rasterizer/backward.cu:347-656) but ships no tool on top; this CLI
closes that loop TPU-natively.

Views file (npz):
  k      (C, 3, 3) float  camera intrinsics
  w2c    (C, 4, 4) float  world->camera extrinsics
  images (C, H, W, 3) uint8 or float in [0,1]  target frames

Usage:
  python -m real2sim_eval_tpu.experiments.utils.refine_gs \
      --ply scan.ply --views views.npz --out refined.ply \
      --attrs colors,opacities --iters 200 --lr 5e-3

Optimization runs in RAW parameter space (logit opacities, log scales,
SH coefficients, unnormalized quats) so activations keep gradients
bounded; the refined PLY is written back in the standard 3DGS layout.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

ATTR_KEYS = {
    "colors": "sh_colors",
    "opacities": "logit_opacities",
    "means": "means3D",
    "scales": "log_scales",
    "rotations": "unnorm_rotations",
}
# raw-space step scale per attribute (3DGS-style: geometry moves slower
# than appearance)
LR_SCALE = {"sh_colors": 1.0, "logit_opacities": 1.0, "means3D": 0.1,
            "log_scales": 0.2, "unnorm_rotations": 0.2}


def load_views(path):
    d = np.load(path)
    imgs = np.asarray(d["images"])
    if imgs.dtype == np.uint8:
        imgs = imgs.astype(np.float32) / 255.0
    return (np.asarray(d["k"], np.float32), np.asarray(d["w2c"], np.float32),
            imgs.astype(np.float32))


def refine(params: dict, ks, w2cs, images, attrs=("colors", "opacities"),
           iters: int = 200, lr: float = 5e-3, bg=(0.0, 0.0, 0.0),
           interpret: bool = False, max_pairs_factor: float = 6.0,
           log_every: int = 25, z_threshold: float = 0.05):
    """Optimize ``attrs`` of raw splat ``params`` against target views.

    Returns (refined raw params dict, list of per-log losses). Pure
    function over numpy inputs; everything jax happens inside.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from ...renderer.camera import Camera
    from ...renderer.diff import rasterize_diff, rasterize_diff_views
    from ...renderer.raster import RasterConfig

    def sh_colors_to_coeffs(sh):
        # traceable version of utils.ply.sh_colors_to_coeffs (same layout,
        # reference gs_renderer.py:414-418)
        n = sh.shape[0]
        dc = sh[:, :3][:, None, :]
        rest = jnp.transpose(sh[:, 3:].reshape(n, 3, -1), (0, 2, 1))
        return jnp.concatenate([dc, rest], axis=1)

    n_sh = params["sh_colors"].shape[1] // 3
    sh_degree = int(round(np.sqrt(n_sh))) - 1
    assert (sh_degree + 1) ** 2 == n_sh, \
        f"sh_colors width {params['sh_colors'].shape[1]} is not 3*(D+1)^2"
    cams = [Camera(width=int(images.shape[2]), height=int(images.shape[1]),
                   fx=float(k[0, 0]), fy=float(k[1, 1]),
                   cx=float(k[0, 2]), cy=float(k[1, 2]),
                   z_threshold=z_threshold) for k in ks]
    cfg = RasterConfig(interpret=interpret,
                       max_pairs_factor=max_pairs_factor)
    targets = jnp.asarray(np.moveaxis(images, -1, 1))      # (C, 3, H, W)
    w2cs = jnp.asarray(w2cs)

    train_keys = [ATTR_KEYS[a] for a in attrs]
    trainable = {k: jnp.asarray(params[k]) for k in train_keys}
    frozen = {k: jnp.asarray(v) for k, v in params.items()
              if k not in train_keys}

    # scans come from ONE physical camera, so views almost always share
    # intrinsics — then all C views ride a single compositor launch
    # (rasterize_diff_views); per-view intrinsics fall back to a loop
    shared_cam = all(c == cams[0] for c in cams[1:])

    def render_all(tr):
        p = {**frozen, **tr}
        means = p["means3D"]
        scales = jnp.exp(p["log_scales"])
        quats = p["unnorm_rotations"]
        opac = jax.nn.sigmoid(p["logit_opacities"]).reshape(-1)
        shs = sh_colors_to_coeffs(p["sh_colors"])
        if shared_cam:
            rgb, _, drops = rasterize_diff_views(
                cams[0], w2cs, means, scales, quats, opac, shs, sh_degree,
                bg=bg, config=cfg, return_drops=True)
            return jnp.clip(rgb, 0.0, 1.0), jnp.sum(drops)  # per-view (C,)
        outs, drops = [], jnp.zeros((), jnp.int32)
        for cam, w2c in zip(cams, w2cs):
            rgb, _, d = rasterize_diff(cam, w2c, means, scales, quats, opac,
                                       shs, sh_degree, bg=bg, config=cfg,
                                       return_drops=True)
            outs.append(jnp.clip(rgb, 0.0, 1.0))
            drops = drops + d
        return jnp.stack(outs), drops

    def loss_fn(tr):
        rgb, drops = render_all(tr)
        return jnp.mean((rgb - targets) ** 2), drops

    scale_tree = {k: LR_SCALE[k] for k in trainable}
    opt = optax.adam(lr)

    @jax.jit
    def step(tr, opt_state):
        # drops ride every iteration as grad aux: binning is RECOMPUTED
        # from the current geometry each call, so optimizing means/scales/
        # rotations can outgrow a budget that covered the initial scene —
        # truncated pairs silently truncate gradients, so any nonzero
        # count aborts the run (checked host-side at each log point; the
        # running max below makes intermediate iterations loud too)
        (val, drops), grads = jax.value_and_grad(loss_fn, has_aux=True)(tr)
        updates, opt_state = opt.update(grads, opt_state, tr)
        updates = {k: u * scale_tree[k] for k, u in updates.items()}
        tr = jax.tree_util.tree_map(lambda p, u: p + u, tr, updates)
        return tr, opt_state, val, drops

    opt_state = opt.init(trainable)
    history = []
    drop_max = None
    for i in range(iters):
        trainable, opt_state, val, drops = step(trainable, opt_state)
        drop_max = drops if drop_max is None else jnp.maximum(drop_max,
                                                              drops)
        if i % log_every == 0 or i == iters - 1:
            v = float(val)
            nd = int(drop_max)
            if nd:
                raise RuntimeError(
                    f"binning dropped {nd} pairs by iter {i} at "
                    f"max_pairs_factor={max_pairs_factor}; raise "
                    f"--max-pairs-factor (gradients would be silently "
                    f"truncated)")
            history.append(v)
            print(f"iter {i:5d}  loss {v:.6f}", flush=True)
    out = dict(params)
    out.update({k: np.asarray(v) for k, v in trainable.items()})
    return out, history


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Refine splat attributes against posed target images")
    ap.add_argument("--ply", required=True)
    ap.add_argument("--views", required=True, help="npz with k/w2c/images")
    ap.add_argument("--out", required=True)
    ap.add_argument("--attrs", default="colors,opacities",
                    help=f"comma list from {sorted(ATTR_KEYS)}")
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--bg", default="0,0,0")
    ap.add_argument("--max-pairs-factor", type=float, default=6.0)
    ap.add_argument("--interpret", action="store_true",
                    help="interpreted Pallas kernels (CPU debugging)")
    args = ap.parse_args(argv)

    from ...utils.ply import load_gaussian_ply, save_gaussian_ply

    params = dict(load_gaussian_ply(args.ply))
    ks, w2cs, images = load_views(args.views)
    attrs = [a.strip() for a in args.attrs.split(",") if a.strip()]
    for a in attrs:
        assert a in ATTR_KEYS, f"unknown attr {a!r}"
    bg = tuple(float(v) for v in args.bg.split(","))
    refined, history = refine(params, ks, w2cs, images, attrs=attrs,
                              iters=args.iters, lr=args.lr, bg=bg,
                              interpret=args.interpret,
                              max_pairs_factor=args.max_pairs_factor)
    save_gaussian_ply(refined, args.out)
    print(json.dumps({"out": str(Path(args.out).resolve()),
                      "loss_first": history[0], "loss_last": history[-1]}))


if __name__ == "__main__":
    main()
