"""Per-family compositor choice: RasterConfig.wrist_kernel lets the wrist
camera's full pipeline run a different kernel than the fixed cameras'
incremental path (the on-chip A/B picks per family). The fine kernel
crops splats at their 3-sigma fine rects (PARITY deviation 16), so wrist
frames match the wide-kernel run within the documented fringe bound."""

import numpy as np
import pytest

from real2sim_eval_tpu.renderer.raster import RasterConfig

pytestmark = pytest.mark.slow


def test_evaluator_wrist_kernel_override(tmp_path):
    from real2sim_eval_tpu.parallel import BatchedEvaluator
    from real2sim_eval_tpu.testing import (TEST_CAMERAS, full_cfg,
                                           make_rope_points,
                                           make_synthetic_scene,
                                           write_fixture_checkpoint)

    rope = make_rope_points(n=60, length=0.3)
    write_fixture_checkpoint(tmp_path, "rope_test", rope, spring_Y=2e3)
    gs = make_synthetic_scene(tmp_path / "scans", rope_pts=rope,
                              ik_urdf=None, n_table=1500)
    cfg = full_cfg(tmp_path, "rope_test", gs=gs, cameras=TEST_CAMERAS,
                   physics_over=dict(dt=2e-4, self_collision=False))
    outs = {}
    for wk in ("fine", "inherit"):
        ev = BatchedEvaluator(
            cfg, episode_ids=[0, 1],
            raster_config=RasterConfig(backend="pallas", interpret=True,
                                       incremental="on",
                                       pack_payloads=False,
                                       wrist_precull="off",
                                       wrist_kernel=wk))
        rw = ev.calibrated["rcfg_wrist"]
        assert rw.kernel == ("fine" if wk == "fine" else "wide")
        ims, _, wims, wdeps = ev.render()
        outs[wk] = (np.asarray(ims), np.asarray(wims), np.asarray(wdeps))
        assert sum(ev.render_drops().values()) == 0
    # fixed cameras identical (same kernel both runs)
    np.testing.assert_array_equal(outs["fine"][0], outs["inherit"][0])
    # wrist within the documented inter-kernel fringe bound
    d_rgb = np.abs(outs["fine"][1] - outs["inherit"][1]).max()
    d_dep = np.abs(outs["fine"][2] - outs["inherit"][2]).max()
    assert d_rgb < 2e-2 and d_dep < 1e-2, (d_rgb, d_dep)
