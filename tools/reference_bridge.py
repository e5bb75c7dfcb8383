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


def _install_localisation_stubs(vehicle):
    """Stub the three external packages the reference localiser imports
    (ace vehicle data, aci system monitor, ruamel yaml) so its particle
    filter runs IN PLACE on this host. The SteeringGeometry stub carries
    this repo's VehicleParams steering map, so both filters integrate
    identical motion from the same recorded controls."""
    if "ruamel" not in sys.modules:
        ruamel = types.ModuleType("ruamel")
        yaml_mod = types.ModuleType("ruamel.yaml")

        class _YAML:  # only imported, never used on .npy map replays
            def load(self, f):
                raise NotImplementedError

        yaml_mod.YAML = _YAML
        ruamel.yaml = yaml_mod
        sys.modules["ruamel"] = ruamel
        sys.modules["ruamel.yaml"] = yaml_mod
    if "aci" not in sys.modules:
        aci = types.ModuleType("aci")
        aci_utils = types.ModuleType("aci.utils")
        monitor = types.ModuleType("aci.utils.system_monitor")

        class SystemMonitor:
            def __init__(self, *a, **k):
                pass

            def maybe_log_function_itterations_per_second(self):
                pass

        def track_runtime(_monitor):
            return lambda fn: fn

        monitor.SystemMonitor = SystemMonitor
        monitor.track_runtime = track_runtime
        aci_utils.system_monitor = monitor
        aci.utils = aci_utils
        sys.modules["aci"] = aci
        sys.modules["aci.utils"] = aci_utils
        sys.modules["aci.utils.system_monitor"] = monitor

    # (re)install ace with THIS vehicle's steering map — the reference
    # converts normalised steering to road-wheel angle through it
    # (localiser.py:148-151)
    ace = types.ModuleType("ace")
    steering = types.ModuleType("ace.steering")

    class SteeringGeometry:
        def __init__(self, data_path=None):
            self.vehicle_data = SimpleNamespace(
                wheelbase=vehicle.wheelbase, width=vehicle.width
            )

        def max_steering_angle(self):
            return vehicle.max_steering_angle

        def steering_angle(self, normalised_input):
            return vehicle.steering_angle(float(normalised_input))

    steering.SteeringGeometry = SteeringGeometry
    ace.steering = steering
    sys.modules["ace"] = ace
    sys.modules["ace.steering"] = steering


def export_reference_map(map_path, out_path) -> str:
    """Write this repo's .npz track map in the reference's pickled-dict
    .npy layout (utils/load.py:9-27: outside_track/inside_track/
    centre_track, with outside->left, inside->right)."""
    import numpy as np

    ROOT = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(ROOT))
    from acmpc_tpu.localise.track_map import load_track_map

    tm = load_track_map(str(map_path))
    out = {
        "outside_track": np.asarray(tm.left, np.float64),
        "inside_track": np.asarray(tm.right, np.float64),
        "centre_track": np.asarray(tm.centre, np.float64),
    }
    np.save(out_path, out, allow_pickle=True)
    return str(out_path)


def build_reference_localiser(loc_raw: dict, ref_map_path: str, vehicle):
    """The reference's particle filter, synchronous, on recorded time.

    Imports /root/reference/src/acmpc/localisation/localiser.py and
    constructs its Localiser/LocalisationProcess pair with the process
    machinery stripped — the same two-subclass shim its own offline
    benchmark uses (benchmarking/test_localiser.py:8-60: __init__ skips
    mp.Process, _dt comes from recorded timestamps instead of wall
    time). ``loc_raw`` is the raw ``localisation:`` dict of a benchmark
    yaml (the schema matches the reference's config surface 1:1)."""
    if not reference_available():
        raise RuntimeError(f"reference not mounted at {REFERENCE_SRC}")
    _install_stubs()
    _install_localisation_stubs(vehicle)
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    import acmpc.localisation.localiser as ref_loc

    cfg = {
        "experiment_name": "bridge",
        "vehicle": {"data_path": "unused-stubbed"},
        "mapping": {"map_path": str(ref_map_path)},
        "localisation": dict(
            loc_raw,
            collect_benchmark_observations=False,
            benchmark_observations_save_location="/tmp",
        ),
    }

    class _SyncProcess(ref_loc.LocalisationProcess):
        # test_localiser.py:52-53 — skip mp.Process.__init__
        def __init__(self, cfg):
            self._setup(cfg)

        def _score_particles(self, observation):
            observation = self._downsample_observations(observation)
            particles = self._update_particles(observation)
            self._resample_particles(particles)
            self._update_is_converged_flag()

    class _SyncLocaliser(ref_loc.Localiser):
        # test_localiser.py:8-48 — recorded-timestamp dt
        def __init__(self, cfg):
            self._localiser = _SyncProcess(cfg)
            self._last_timestamp = None
            self.dt = 0.0

        @property
        def _dt(self):
            return self.dt

        def step_particles(self, record):
            t = record["time"]
            if self._last_timestamp is None:
                self._last_timestamp = t
            self.dt = t - self._last_timestamp
            self._last_timestamp = t
            self.step(record["control_command"])

        def score_particles(self, observation):
            self._localiser._score_particles(observation)

    return _SyncLocaliser(cfg)


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
