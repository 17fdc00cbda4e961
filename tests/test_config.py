import textwrap

import pytest

from real2sim_eval_tpu.config import ConfigNode, load_config


@pytest.fixture
def cfg_tree(tmp_path):
    (tmp_path / "env").mkdir()
    (tmp_path / "gs").mkdir()
    (tmp_path / "main.yaml").write_text(textwrap.dedent("""
        defaults:
          - env: robot_a
          - gs: scene_a
          - _self_
          - override hydra/job_logging: disabled
        hydra:
          output_subdir: null
        seed: 0
        exp_root: log/experiments
        duration: 30
        total: ${eval:'${duration} * 2'}
        nested:
          ref: ${seed}
    """))
    (tmp_path / "env" / "robot_a.yaml").write_text(textwrap.dedent("""
        robot:
          type: xarm
          n_grippers: 1
        cameras:
          - type: side
            h: 480
            w: 848
    """))
    (tmp_path / "gs" / "scene_a.yaml").write_text("use_shs: false\nname: a\n")
    (tmp_path / "gs" / "scene_b.yaml").write_text("use_shs: true\nname: b\n")
    return tmp_path


def test_compose_groups(cfg_tree):
    cfg = load_config(cfg_tree, "main")
    assert cfg.seed == 0
    assert cfg.env.robot.type == "xarm"
    assert cfg.env["robot"]["n_grippers"] == 1
    assert cfg.gs.name == "a"
    assert cfg.env.cameras[0].type == "side"
    assert "hydra" not in cfg


def test_interpolation_and_eval(cfg_tree):
    cfg = load_config(cfg_tree, "main")
    assert cfg.total == 60
    assert cfg.nested.ref == 0


def test_dotted_override(cfg_tree):
    cfg = load_config(cfg_tree, "main", overrides=["env.robot.type=ur5", "seed=7"])
    assert cfg.env.robot.type == "ur5"
    assert cfg.seed == 7


def test_group_override(cfg_tree):
    cfg = load_config(cfg_tree, "main", overrides=["gs=scene_b"])
    assert cfg.gs.name == "b"
    assert cfg.gs.use_shs is True


def test_plus_override_creates(cfg_tree):
    cfg = load_config(cfg_tree, "main", overrides=["+extra.flag=true"])
    assert cfg.extra.flag is True


def test_value_parsing(cfg_tree):
    cfg = load_config(
        cfg_tree, "main",
        overrides=["a=null", "b=1e-3", "c=[1,2]", "d=text", "e=false"],
    )
    assert cfg.a is None
    assert cfg.b == 1e-3
    assert cfg.c == [1, 2]
    assert cfg.d == "text"
    assert cfg.e is False


def test_confignode_contains_and_get():
    node = ConfigNode({"a": {"b": 1}, "lst": [1, {"x": 2}]})
    assert "a" in node
    assert "b" in node.a
    assert node.select("a.b") == 1
    assert node.select("lst.1.x") == 2
    assert node.get("missing", 5) == 5
    assert node.to_dict() == {"a": {"b": 1}, "lst": [1, {"x": 2}]}


def test_merge_deep():
    a = ConfigNode({"x": {"y": 1, "z": 2}})
    a.merge({"x": {"y": 10}, "w": 3})
    assert a.x.y == 10 and a.x.z == 2 and a.w == 3


def test_reference_cfg_tree_loads():
    """The reference's own hydra cfg tree must compose unchanged."""
    import pathlib
    ref = pathlib.Path("/root/reference/cfg")
    if not ref.exists():
        pytest.skip("reference tree unavailable")
    cfg = load_config(ref, "eval_policy")
    assert cfg.physics.fps == 30
    assert cfg.physics.dt == 5e-5
    assert cfg.env.robot.type == "xarm"
    assert cfg.gs.object.path.endswith("rope.ply")
    assert len(cfg.env.cameras) == 2
    cfg2 = load_config(ref, "eval_policy", overrides=["gs=sloth", "physics.fps=60"])
    assert cfg2.physics.fps == 60
    assert "sloth" in cfg2.gs.object.path
