"""Per-episode artifact writing shared by the eval/replay entry points.

Reproduces the reference's on-disk episode layout so its analysis tools
(success calculators, visualize_rollouts) consume our runs unchanged
(reference: experiments/eval_policy.py:69-132,140-213,261-267):

  <run>/episode_XXXX/camera_K/rgb/NNNNNN.jpg
  <run>/episode_XXXX/calibration/{rvecs,tvecs,intrinsics}.npy
  <run>/episode_XXXX/robot/NNNNNN.json
  <run>/episode_XXXX/state/NNNNNN.pkl
  <run>/episode_XXXX/random_variables.json
  <run>/{start,final}_images/episode_XXXX_camera_K.jpg
"""

from __future__ import annotations

import json
import os
import pickle
from pathlib import Path

import numpy as np


class EpisodeWriter:
    def __init__(self, run_dir: str | Path, episode_id: int, cameras_cfg,
                 save_state: bool = True):
        self.run_dir = Path(run_dir)
        self.episode_id = episode_id
        self.ep_dir = self.run_dir / f"episode_{episode_id:04d}"
        self.cameras_cfg = list(cameras_cfg)
        self.save_state = save_state
        for cam_id in range(len(self.cameras_cfg)):
            (self.ep_dir / f"camera_{cam_id}" / "rgb").mkdir(parents=True,
                                                             exist_ok=True)
        for sub in ("calibration", "robot", "state"):
            (self.ep_dir / sub).mkdir(parents=True, exist_ok=True)
        (self.run_dir / "start_images").mkdir(parents=True, exist_ok=True)
        (self.run_dir / "final_images").mkdir(parents=True, exist_ok=True)

    # -- calibration ----------------------------------------------------

    def write_calibration(self):
        from scipy.spatial.transform import Rotation as R

        rvecs, tvecs, intrs = [], [], []
        for camera in self.cameras_cfg:
            if "c2w" in camera:
                w2c = np.linalg.inv(
                    np.array(camera["c2w"], np.float32).reshape(4, 4))
            else:
                w2c = np.array(camera["w2c"], np.float32).reshape(4, 4)
            rvecs.append(R.from_matrix(w2c[:3, :3]).as_rotvec())
            tvecs.append(w2c[:3, 3])
            intrs.append(np.array(camera["intr"], np.float32).reshape(3, 3))
        cal = self.ep_dir / "calibration"
        np.save(cal / "rvecs.npy", np.stack(rvecs).reshape(-1, 3, 1))
        np.save(cal / "tvecs.npy", np.stack(tvecs).reshape(-1, 3, 1))
        np.save(cal / "intrinsics.npy", np.stack(intrs).reshape(-1, 3, 3))

    def write_random_variables(self, random_variables):
        with open(self.ep_dir / "random_variables.json", "w") as f:
            json.dump({"value": random_variables}, f, indent=4)

    # -- per-step -------------------------------------------------------

    def write_images(self, obs, step: int, overlay_fn=None,
                     start_final: str | None = None):
        """Save each camera's RGB (cfg order: side cameras consume
        image_list, wrist cameras image_wrist_list, eval_policy.py:145-163)."""
        import cv2

        idx_side = idx_wrist = 0
        for cam_id, camera in enumerate(self.cameras_cfg):
            if camera["type"] == "side":
                image = obs["image_list"][idx_side]
                if overlay_fn is not None:
                    image = overlay_fn(image)
                idx_side += 1
            else:
                image = obs["image_wrist_list"][idx_wrist]
                idx_wrist += 1
            img = (np.asarray(image).transpose(1, 2, 0) * 255).astype(np.uint8)
            img = img[:, :, ::-1]  # RGB -> BGR
            cv2.imwrite(str(self.ep_dir / f"camera_{cam_id}" / "rgb"
                            / f"{step:06d}.jpg"), img)
            if start_final is not None:
                cv2.imwrite(str(self.run_dir / f"{start_final}_images"
                                / f"episode_{self.episode_id:04d}_camera_{cam_id}.jpg"),
                            img)

    def write_robot(self, step: int, obs_pos, obs_quat, obs_gripper,
                    act_pos, act_quat, act_gripper):
        record = {
            "obs.ee_pos": np.asarray(obs_pos).reshape(-1).tolist(),
            "obs.ee_quat": np.asarray(obs_quat).reshape(-1).tolist(),
            "obs.gripper_qpos": np.asarray(obs_gripper).reshape(-1).tolist(),
            "action.ee_pos": np.asarray(act_pos).reshape(-1).tolist(),
            "action.ee_quat": np.asarray(act_quat).reshape(-1).tolist(),
            "action.gripper_qpos": np.asarray(act_gripper).reshape(-1).tolist(),
        }
        with open(self.ep_dir / "robot" / f"{step:06d}.json", "w") as f:
            json.dump(record, f, indent=4)

    def write_state(self, step: int, state: dict):
        if not self.save_state:
            return
        if step != 0 and "physics" in state:
            state = {k: v for k, v in state.items() if k != "physics"}
        # the reference's dumps hold torch tensors and its success
        # calculators call `.cpu().numpy()` on them unconditionally
        # (calculate_success_rope.py:149-150, calculate_success_T.py:21-22),
        # so byte-compatible artifacts must pickle torch tensors when torch
        # is available (tests/test_reference_interop.py executes the
        # reference scripts over these files)
        state = _to_state_tree(state)
        with open(self.ep_dir / "state" / f"{step:06d}.pkl", "wb") as f:
            pickle.dump(state, f)

    def finalize_videos(self, frame_rate: int = 30):
        from .utils.ffmpeg import make_video

        for cam_id in range(len(self.cameras_cfg)):
            make_video(self.ep_dir / f"camera_{cam_id}" / "rgb",
                       self.ep_dir / f"vis_camera_{cam_id}.mp4",
                       "%06d.jpg", frame_rate=frame_rate)


try:
    import torch as _torch
except Exception:  # pragma: no cover - torch is baked into the image
    _torch = None


def _to_state_tree(x):
    """Array leaves -> cpu torch tensors (reference dump schema); numpy
    fallback when torch is unavailable."""
    if isinstance(x, dict):
        return {k: _to_state_tree(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(_to_state_tree(v) for v in x)
    if hasattr(x, "shape"):
        arr = np.asarray(x)
        # torch.from_numpy supports float/int/bool but of the uints ONLY
        # uint8 — a uint32 leaf (PRNG key, index array) must stay numpy
        # or write_state crashes mid-episode
        convertible = (arr.dtype.kind in "fib"
                       or arr.dtype == np.uint8)
        if _torch is not None and convertible:
            return _torch.from_numpy(np.ascontiguousarray(arr))
        return arr
    return x
