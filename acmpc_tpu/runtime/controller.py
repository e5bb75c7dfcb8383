"""Controller facade + free-running control thread.

Counterpart of the reference Controller/ControlProcess
(/root/reference/src/acmpc/control/controller.py:32-311). The reference
runs the MPC re-solve loop in a separate OS process spinning on shared-
memory staleness flags; here it is a thread (JAX device dispatch releases
the GIL) consuming a centreline mailbox and publishing command sets to a
mailbox — same free-running latest-wins semantics, no busy-wait.

Dual MPCs (mapping horizon / racing horizon) are pre-built and pre-warmed;
the active one is switched by ``is_mapping`` exactly like the reference's
model_predictive_controller property (controller.py:222-224).
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from acmpc_tpu.config.schema import AgentConfig
from acmpc_tpu.geometry.path import ReferencePath
from acmpc_tpu.mpc.spatial_mpc import SpatialMPC, build_mpc
from acmpc_tpu.runtime.commands import TemporalCommandSelector
from acmpc_tpu.runtime.mailbox import Mailbox


@dataclasses.dataclass
class CommandSet:
    timestamp: float
    controls: np.ndarray  # (n, 2): [velocity, delta] rows
    cum_time: np.ndarray  # (n,)
    prediction: np.ndarray  # (n, 2)


class Controller:
    def __init__(self, cfg: AgentConfig, dtype=jnp.float32, clock=None):
        """``clock``: time source used to stamp command sets and to
        compute the elapsed time for temporal command selection. Defaults
        to wall clock (``time.monotonic`` — correct against a real-time
        game); a discrete-time simulator passes its own sim clock so the
        selection stays correct however fast or slow the host runs the
        loop (wall-clock selection under a loaded machine applies
        commands planned for the wrong stages)."""
        self._cfg = cfg
        self._clock = clock or time.monotonic
        self.mapping_mpc = build_mpc(
            _control_dict(cfg.mapping_control), cfg.vehicle, dtype
        )
        self.racing_mpc = build_mpc(
            _control_dict(cfg.racing_control), cfg.vehicle, dtype
        )
        self._centreline_box = Mailbox()
        self._command_box = Mailbox()
        self._selector = TemporalCommandSelector()
        self._thread: Optional[_ControlThread] = None

        self.is_mapping = cfg.create_map
        self.is_localised = False
        self.reference_speed = (
            cfg.racing_control.unlocalised_max_speed
            or cfg.racing_control.constraints.v_max
        )

    # -- facade API (reference controller.py:36-91) ----------------------
    @property
    def mpc(self) -> SpatialMPC:
        return self.mapping_mpc if self.is_mapping else self.racing_mpc

    @property
    def delta_max(self) -> float:
        return self.racing_mpc.delta_max

    @property
    def a_max(self) -> float:
        return self.racing_mpc.config.constraints.a_max

    @property
    def desired_state(self):
        """(velocity, delta) active now — elapsed-time command selection
        (reference controller.py:110-116, commands.py:20-38)."""
        cmds, version, _ = self._command_box.read()
        if cmds is None:
            return 0.0, 0.0
        elapsed = self._clock() - cmds.timestamp
        v, delta = self._selector(cmds.cum_time, cmds.controls, elapsed)
        return float(v), float(delta)

    @property
    def predicted_locations(self) -> Optional[np.ndarray]:
        cmds, _, _ = self._command_box.read()
        return None if cmds is None else cmds.prediction

    def submit_centreline(self, centreline: np.ndarray):
        """Fresh centreline from perception -> wake the control thread.
        The submission clock reading rides along: the solved plan's
        cum_time is relative to THIS observation, so command sets are
        stamped with it (stamping at publish — what the reference does,
        controller.py:279 — shifts every command late by the solve
        latency)."""
        self._centreline_box.post((np.asarray(centreline), self._clock()))

    def compute_track_speed_profile(self, track_xyw: np.ndarray) -> ReferencePath:
        """Full-map speed profile with the map-specific constraint
        overrides (reference controller.py:49-57)."""
        mpc = self.racing_mpc
        path = mpc.construct_waypoints(jnp.asarray(track_xyw, jnp.float32))
        return mpc.compute_map_speed_profile(
            path,
            ay_max=self._cfg.map_speed_profile.ay_max,
            a_min=self._cfg.map_speed_profile.a_min,
        )

    def start(self):
        if self._thread is None:
            self._thread = _ControlThread(self)
            self._thread.start()

    def wait_for_first_command(self, timeout: float = 120.0) -> bool:
        """Block until the control thread has published its first command
        set (covers jit compilation of the solve on the first frame)."""
        _, version, _ = self._command_box.read_fresh(0, timeout=timeout)
        return version > 0

    @property
    def command_version(self) -> int:
        """Monotonic counter of published command sets."""
        return self._command_box.version

    def wait_for_command_newer_than(
        self, version: int, timeout: float = 30.0
    ) -> int:
        """Block until a command set newer than ``version`` exists; returns
        the version seen. Lockstep pacing for deterministic closed-loop
        tests: a discrete-time sim can outrun the free-running solve
        thread on a loaded host, leaving the car tracking a plan solved
        for a pose hundreds of metres behind — pacing the sim on solve
        freshness makes the e2e behaviour load-independent."""
        _, v, _ = self._command_box.read_fresh(version, timeout=timeout)
        return v

    def shutdown(self):
        if self._thread is not None:
            self._thread.stop()
            self._thread.join(timeout=5)
            self._thread = None

    # -- used by the control thread --------------------------------------
    def _publish(self, commands: CommandSet):
        self._command_box.post(commands)


def _control_dict(mpc_cfg) -> dict:
    c = mpc_cfg.constraints
    return {
        "horizon": mpc_cfg.horizon,
        "step_cost": list(mpc_cfg.step_cost),
        "r_term": list(mpc_cfg.r_term),
        "final_cost": list(mpc_cfg.final_cost),
        "unlocalised_max_speed": mpc_cfg.unlocalised_max_speed,
        "speed_profile_constraints": {
            "v_min": c.v_min,
            "v_max": c.v_max,
            "a_min": c.a_min,
            "a_max": c.a_max,
            "ay_max": c.ay_max,
            "ki_min": c.ki_min,
            "end_velocity": c.end_velocity,
        },
    }


class _ControlThread(threading.Thread):
    """Free-running MPC re-solve loop (reference ControlProcess.run,
    controller.py:226-231): wake on fresh centreline, solve, publish."""

    def __init__(self, controller: Controller):
        super().__init__(daemon=True, name="acmpc-control")
        self._c = controller
        self._stop_event = threading.Event()
        self._states = {
            id(controller.mapping_mpc): controller.mapping_mpc.initial_state(),
            id(controller.racing_mpc): controller.racing_mpc.initial_state(),
        }
        self._version = 0

    def stop(self):
        self._stop_event.set()
        self._c._centreline_box.post(None)  # wake the wait

    def run(self):
        while not self._stop_event.is_set():
            item, version, _ = self._c._centreline_box.read_fresh(
                self._version, timeout=0.5
            )
            if version == self._version or item is None:
                continue
            self._version = version
            centreline, stamp = item
            try:
                self._solve(np.asarray(centreline), stamp)
            except Exception:  # pragma: no cover - keep the loop alive
                import traceback

                traceback.print_exc()

    def _solve(self, centreline: np.ndarray, stamp: float):
        mpc = self._c.mpc
        horizon = mpc.horizon
        # downsample to the horizon with tapered widths
        # (reference controller.py:256-267)
        ds = max(1, int(len(centreline) / horizon))
        pts = centreline[::ds][:horizon]
        if len(pts) < horizon:  # pad by repeating the last point
            pad = np.repeat(pts[-1:], horizon - len(pts), axis=0)
            pts = np.concatenate([pts, pad])
        widths = np.linspace(10.0, 6.0, horizon)
        ref = np.stack([pts[:, 0], pts[:, 1], widths]).T

        state = self._states[id(mpc)]
        new_state, diags = mpc.jitted_get_control(
            state,
            jnp.asarray(ref, mpc.dtype),
            jnp.asarray(self._c.reference_speed, mpc.dtype),
            jnp.asarray(bool(self._c.is_localised)),
        )
        self._states[id(mpc)] = new_state
        if bool(new_state.solved):
            self._c._publish(
                CommandSet(
                    timestamp=stamp,
                    controls=np.asarray(new_state.projected_control).T,
                    cum_time=np.asarray(new_state.cum_time),
                    prediction=np.asarray(new_state.prediction),
                )
            )
