"""Test fixtures: re-export the package's synthetic generators."""

from real2sim_eval_tpu.testing import (  # noqa: F401
    TEST_CAMERAS,
    env_cfg,
    full_cfg,
    make_box_points,
    make_rope_points,
    make_synthetic_scene,
    physics_cfg,
    write_fixture_checkpoint,
)
