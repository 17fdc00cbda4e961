"""bench.py golden-frame machinery: path naming + write/check round-trip.

The headline bench number is hard-gated on these (a FAIL or a missing
headline golden exits nonzero) — so the naming and the read/write logic
get CPU coverage even though the bench itself only runs on the chip.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import bench


class _FakeEv:
    """Just enough of BatchedEvaluator for golden_frame_check."""

    def __init__(self, seed=0):
        rng = np.random.default_rng(seed)
        self._ims = rng.uniform(size=(1, 1, 3, 64, 128)).astype(np.float32)
        self._wims = rng.uniform(size=(1, 1, 3, 64, 128)).astype(np.float32)
        self.state = "cur"
        self._bench_init_state = "init"
        self.rendered_at = []

    def render(self):
        self.rendered_at.append(self.state)
        return self._ims, None, self._wims, None


def test_golden_path_naming():
    gp = bench.golden_path
    small, big = bench.N_TABLE_SMALL, bench.N_TABLE_BIG
    assert bench.KERNEL == "wide"
    assert gp(small).name == "bench_frames.npz"        # legacy recording
    assert gp(big).name == f"bench_frames_{big}.npz"
    assert gp(big, 30000).name == f"bench_frames_d30000_{big}.npz"
    try:
        bench.KERNEL = "fine"
        assert gp(small).name == f"bench_frames_fine_{small}.npz"
        assert gp(big, 30000).name == f"bench_frames_fine_d30000_{big}.npz"
    finally:
        bench.KERNEL = "wide"


def test_golden_write_check_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(
        bench, "golden_path",
        lambda n_table, n_obj_dense=0: tmp_path / f"g_{n_table}.npz")
    ev = _FakeEv()
    assert bench.golden_frame_check(ev, write=False, n_table=123) \
        == "no-golden"
    assert bench.golden_frame_check(ev, write=True, n_table=123) == "written"
    res = bench.golden_frame_check(ev, write=False, n_table=123)
    assert res.startswith("ok("), res
    # renders happen from the BUILD-TIME state, and state is restored
    assert set(ev.rendered_at) == {"init"} and ev.state == "cur"
    # a perturbed frame beyond tolerance must FAIL
    ev._ims = ev._ims + 0.1
    res = bench.golden_frame_check(ev, write=False, n_table=123)
    assert res.startswith("FAIL("), res
    # and within tolerance stays ok
    ev._ims = ev._ims - 0.1 + 1e-4
    res = bench.golden_frame_check(ev, write=False, n_table=123)
    assert res.startswith("ok("), res
