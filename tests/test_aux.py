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
