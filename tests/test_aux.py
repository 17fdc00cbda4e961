"""Aux subsystem tests: live viewer, profiling, config node copying."""

import copy
import pickle
import time
import urllib.request

import numpy as np

from real2sim_eval_tpu.config import ConfigNode


def test_viser_viewer_serves_mjpeg():
    from real2sim_eval_tpu.utils.viser_gui import ViserViewer

    v = ViserViewer(port=0)  # pick a free port
    try:
        frame = np.zeros((32, 48, 3), np.uint8)
        frame[:, :, 0] = 255
        v.set_output({"image": frame})
        v.set_fps(30.0)
        with urllib.request.urlopen(f"http://127.0.0.1:{v.port}/", timeout=5) as r:
            body = r.read()
        assert b"real2sim" in body
        req = urllib.request.urlopen(f"http://127.0.0.1:{v.port}/stream", timeout=5)
        chunk = req.read(2000)
        assert b"image/jpeg" in chunk
        assert b"\xff\xd8" in chunk  # JPEG SOI marker
        req.close()
    finally:
        v.close()


def test_viser_viewer_camera_control():
    """The /camera endpoint drives the orbit camera the renderer reads per
    frame via get_metadata (restores the reference's per-client camera
    loop, viser_gui.py:40-169 -> gs_renderer.py:1018-1048)."""
    from real2sim_eval_tpu.utils.viser_gui import ViserViewer

    v = ViserViewer(port=0)
    try:
        k = np.diag([400.0, 400.0, 1.0])
        w2c0 = np.eye(4, dtype=np.float32)
        v.set_metadata(64, 48, k, w2c0)
        urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/camera?az=1.2&el=0.4&dist=0.8",
            timeout=5).close()
        meta = v.get_metadata()
        w2c = np.asarray(meta["w2c"])
        assert not np.allclose(w2c, w2c0)
        R = w2c[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)  # SE(3)
        # camera sits `dist` from the target (initial look-at: 0.7 m on +z)
        eye = -R.T @ w2c[:3, 3]
        np.testing.assert_allclose(np.linalg.norm(eye - [0, 0, 0.7]), 0.8,
                                   atol=1e-5)
        # intrinsics / size preserved for the rasterizer
        assert meta["w"] == 64 and meta["h"] == 48
        # a second request orbits again (live control)
        urllib.request.urlopen(
            f"http://127.0.0.1:{v.port}/camera?az=0.0&el=0.0&dist=1.5",
            timeout=5).close()
        assert not np.allclose(np.asarray(v.get_metadata()["w2c"]), w2c)
    finally:
        v.close()


def test_serve_orbit_arbitrary_ply():
    """`visualize_scan --serve`: browser-orbit any splat scan with no
    episode running (closes the reference's visualize_gs delta,
    sim/utils/gs/gs_processor.py:249-289)."""
    import threading

    from real2sim_eval_tpu.experiments.utils.visualize_scan import serve_orbit

    rng = np.random.default_rng(0)
    n = 50
    params = {
        "means3D": rng.normal(scale=0.2, size=(n, 3)).astype(np.float32),
        "sh_colors": rng.normal(scale=0.3, size=(n, 3)).astype(np.float32),
        "unnorm_rotations": rng.normal(size=(n, 4)).astype(np.float32),
        "log_scales": np.full((n, 3), np.log(0.02), np.float32),
        "logit_opacities": np.full((n, 1), 2.0, np.float32),
    }
    box = {}

    def run():
        box["viewer"] = serve_orbit(params, port=0, w=64, h=48, duration=6.0)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):                     # wait for the server + 1 frame
        time.sleep(0.1)
        v = box.get("viewer")
        if v is not None:
            break
    t.join(timeout=30)
    v = box["viewer"]
    try:
        assert v._frame is not None, "serve loop must render a frame"
        assert v._frame.shape == (48, 64, 3)
        # orbiting via /camera changes the pose the next frame renders with
        w2c0 = np.asarray(v.get_metadata()["w2c"])
        v.set_orbit(1.0, 0.3, 1.0)
        assert not np.allclose(np.asarray(v.get_metadata()["w2c"]), w2c0)
    finally:
        v.close()


def test_scoped_timer_accumulates():
    from real2sim_eval_tpu.utils.profiling import ScopedTimer

    ScopedTimer.reset()
    ScopedTimer.enabled = False
    with ScopedTimer("off"):
        pass
    assert "off" not in ScopedTimer.totals  # disabled by default (parity)

    ScopedTimer.enabled = True
    try:
        for _ in range(3):
            with ScopedTimer("work"):
                time.sleep(0.002)
        assert ScopedTimer.counts["work"] == 3
        assert ScopedTimer.totals["work"] >= 0.006
        assert "work" in ScopedTimer.report()
    finally:
        ScopedTimer.enabled = False
        ScopedTimer.reset()


def test_step_timer():
    from real2sim_eval_tpu.utils.profiling import StepTimer

    t = StepTimer(sync=False)
    t.start()
    time.sleep(0.005)
    dt, fps = t.stop()
    assert dt >= 0.005
    assert fps <= 200


def test_confignode_pickle_and_deepcopy():
    node = ConfigNode({"a": {"b": [1, 2, {"c": 3}]}})
    assert pickle.loads(pickle.dumps(node)) == node
    dup = copy.deepcopy(node)
    dup.a.b[2]["c"] = 99
    assert node.a.b[2]["c"] == 3  # deep copy is independent
