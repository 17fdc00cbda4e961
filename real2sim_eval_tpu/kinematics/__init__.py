from .chain import KinematicChain
from .ik import ik_damped_ls, make_ik_fn, KinHelper

__all__ = ["KinematicChain", "ik_damped_ls", "make_ik_fn", "KinHelper"]
