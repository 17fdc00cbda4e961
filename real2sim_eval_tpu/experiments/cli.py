"""Hydra-style CLI entry-point helper.

Gives every experiment script the reference's invocation surface
(``python script.py gs=sloth physics.fps=60 ...``, reference README.md:120-127)
without hydra: composes ``cfg/<name>.yaml`` with group and dotted overrides
via the built-in config loader.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from ..config import load_config, parse_overrides

DEFAULT_CFG_DIR = Path(__file__).resolve().parents[2] / "cfg"


def hydra_like_main(config_name: str, config_path: str | Path | None = None):
    """Decorator: ``@hydra_like_main('replay')`` wraps ``main(cfg)``."""

    def decorator(fn):
        def wrapper(argv=None):
            argv = list(sys.argv[1:] if argv is None else argv)
            parser = argparse.ArgumentParser(add_help=False)
            parser.add_argument("--config-path", default=None)
            parser.add_argument("--config-name", default=config_name)
            parser.add_argument("-h", "--help", action="store_true")
            args, rest = parser.parse_known_args(argv)
            if args.help:
                print(f"usage: {fn.__module__} [--config-path DIR] "
                      f"[--config-name NAME] [key=value ...]")
                return None
            cfg_dir = Path(args.config_path or config_path or DEFAULT_CFG_DIR)
            overrides = parse_overrides(rest)
            unknown = [a for a in rest if a not in overrides]
            if unknown:
                raise SystemExit(f"unrecognized arguments: {unknown}")
            cfg = load_config(cfg_dir, args.config_name, overrides)
            return fn(cfg)

        wrapper.__wrapped__ = fn
        return wrapper

    return decorator


def run_name_for(cfg) -> str:
    from datetime import datetime

    ts = cfg.get("timestamp")
    return ts if ts else datetime.now().strftime("%Y%m%d-%H%M%S")


def raster_config_from(cfg):
    from ..renderer import RasterConfig

    return RasterConfig(backend=str(cfg.get("raster_backend", "auto")))
