"""Client-side splat viewer (utils/splat_viewer.py): file outputs.

Parity surface: the reference's visualize_gs (gs_processor.py:249-289)
exports .splat files and renders them client-side in the browser; this
checks our exporter+page writer produces a loadable bundle (the WebGL
rendering itself is exercised manually / via the WebBrowser smoke in the
round notes — no GL context in CI).
"""

import json
import re

import numpy as np

from real2sim_eval_tpu.utils.ply import save_gaussian_ply
from real2sim_eval_tpu.utils.splat_viewer import visualize_gs


def _params(n=50, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "means3D": rng.normal(size=(n, 3)).astype(np.float32),
        "sh_colors": rng.normal(size=(n, 3)).astype(np.float32) * 0.3,
        "log_scales": np.log(rng.uniform(0.01, 0.05, (n, 3))
                             ).astype(np.float32),
        "unnorm_rotations": np.tile(
            np.asarray([1, 0, 0, 0], np.float32), (n, 1)),
        "logit_opacities": rng.uniform(0.5, 2.0, (n, 1)).astype(np.float32),
    }


def test_viewer_bundle(tmp_path):
    save_gaussian_ply(_params(40, 0), tmp_path / "a.ply")
    save_gaussian_ply(_params(60, 1), tmp_path / "b.ply")
    root = visualize_gs([tmp_path / "a.ply", tmp_path / "b.ply"],
                        out_dir=tmp_path / "view", serve=False)
    html = (root / "index.html").read_text()
    files = json.loads(re.search(r"const FILES = (\[.*?\]);", html).group(1))
    assert files == ["a.splat", "b.splat"]
    for f, n in zip(files, (40, 60)):
        data = (root / f).read_bytes()
        assert len(data) == n * 32          # 32-byte .splat records
    assert "webgl2" in html


def test_viewer_merged_axis(tmp_path):
    save_gaussian_ply(_params(40, 0), tmp_path / "a.ply")
    root = visualize_gs([tmp_path / "a.ply"], merged=True, axis_on=True,
                        transform=True, out_dir=tmp_path / "view",
                        serve=False)
    data = (root / "merged.splat").read_bytes()
    assert len(data) % 32 == 0
    assert len(data) // 32 > 40             # axis splats appended
