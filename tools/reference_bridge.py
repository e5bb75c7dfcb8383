"""Import the reference's pure-numpy control modules for parity testing.

The reference (/root/reference, read-only) is CUDA/C++/torch-era Python,
but its MPC numerics — waypoint construction, spatial-bicycle transforms,
QP matrix assembly (spatial_mpc.py, dynamics.py, solvers/*.py, paths.py) —
are plain numpy + scipy.sparse. This bridge imports them with the two
missing third-party modules stubbed:

* ``osqp``  -> tools/cpu_osqp.py (first-party fp64 implementation of the
  public OSQP algorithm);
* ``loguru`` -> a no-op logger.

``ace.SteeringGeometry`` is only referenced as a postponed annotation in the
modules we import, so a duck-typed stub (:class:`SteeringGeometryStub`)
carrying the repo's VehicleParams values is enough.

Used by tests/test_reference_parity.py (element-wise formula + QP-solution
parity) and tools/measure_cpu_baseline.py (the solves/s denominator). The
reference code is exercised in place; nothing is copied into this repo.
"""

from __future__ import annotations

import pathlib
import sys
import types
from types import SimpleNamespace

REFERENCE_SRC = pathlib.Path("/root/reference/src")


def reference_available() -> bool:
    return (REFERENCE_SRC / "acmpc" / "control" / "spatial_mpc.py").exists()


def _install_stubs():
    if "loguru" not in sys.modules:
        logger = SimpleNamespace(
            warning=lambda *a, **k: None,
            info=lambda *a, **k: None,
            error=lambda *a, **k: None,
            debug=lambda *a, **k: None,
        )
        mod = types.ModuleType("loguru")
        mod.logger = logger
        sys.modules["loguru"] = mod
    if "osqp" not in sys.modules:
        tools_dir = str(pathlib.Path(__file__).resolve().parent)
        if tools_dir not in sys.path:
            sys.path.insert(0, tools_dir)
        import cpu_osqp

        mod = types.ModuleType("osqp")
        mod.OSQP = cpu_osqp.OSQP
        sys.modules["osqp"] = mod


def load_reference_control():
    """Returns a namespace with the reference's control modules:
    paths, dynamics, spatial_mpc, control_solver, speed_profile_solver."""
    if not reference_available():
        raise RuntimeError(f"reference not mounted at {REFERENCE_SRC}")
    _install_stubs()
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    import acmpc.control.dynamics as ref_dynamics
    import acmpc.control.paths as ref_paths
    import acmpc.control.solvers.control as ref_control_solver
    import acmpc.control.solvers.speed_profile as ref_speed_solver
    import acmpc.control.spatial_mpc as ref_spatial_mpc

    return SimpleNamespace(
        paths=ref_paths,
        dynamics=ref_dynamics,
        spatial_mpc=ref_spatial_mpc,
        control_solver=ref_control_solver,
        speed_profile_solver=ref_speed_solver,
    )


class SteeringGeometryStub:
    """Duck-typed stand-in for the external ``ace.SteeringGeometry``
    (reference usage: control/dynamics.py:11-13) carrying the repo's
    VehicleParams geometry so both stacks see identical vehicle data."""

    def __init__(self, vehicle):
        self.vehicle_data = SimpleNamespace(
            wheelbase=vehicle.wheelbase, width=vehicle.width
        )
        self._max_steering_angle = vehicle.max_steering_angle

    def max_steering_angle(self) -> float:
        return self._max_steering_angle


def build_reference_mpc(control_cfg, vehicle):
    """Instantiate the reference's SpatialMPC from the repo's typed
    MPCConfig + VehicleParams (same value surface as the shipped YAMLs)."""
    ref = load_reference_control()
    c = control_cfg.constraints
    constraints = {
        "v_min": c.v_min,
        "v_max": c.v_max,
        "a_min": c.a_min,
        "a_max": c.a_max,
        "ay_max": c.ay_max,
        "ki_min": c.ki_min,
        "end_velocity": c.end_velocity,
    }
    config = {
        "horizon": control_cfg.horizon,
        "speed_profile_constraints": constraints,
        "step_cost": list(control_cfg.step_cost),
        "r_term": list(control_cfg.r_term),
        "final_cost": list(control_cfg.final_cost),
    }
    geometry = SteeringGeometryStub(vehicle)
    model = ref.dynamics.SpatialBicycleModel(
        geometry, {"min": c.v_min, "max": c.v_max}
    )
    return ref.spatial_mpc.SpatialMPC(config, model), ref
