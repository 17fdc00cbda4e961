from .spring_mass import (
    PhysicsOptions,
    SpringMassParams,
    SpringMassState,
    MeshColliderSet,
    SubstepControls,
    make_step_fn,
)
from .topology import connect_springs, build_incidence, build_neighbor_tables
from .sdf import SdfGrid, build_sdf_grid, sdf_query
from .dynamics import PhysTwinDynamics

__all__ = [
    "PhysicsOptions",
    "SpringMassParams",
    "SpringMassState",
    "MeshColliderSet",
    "SubstepControls",
    "make_step_fn",
    "connect_springs",
    "build_incidence",
    "build_neighbor_tables",
    "SdfGrid",
    "build_sdf_grid",
    "sdf_query",
    "PhysTwinDynamics",
]
