"""Generate the 7 per-track YAML configs.

Numeric values mirror the reference's shipped track configs
(/root/reference/configs/*.yaml) — they are the parity fixtures — but the
schema is this framework's own (typed, nested, no game-engine passthrough).
Run: python tools/gen_configs.py
"""

import copy
import pathlib

import yaml

BASE = {
    "experiment": None,
    "seed": 0,
    "vehicle": {"name": "audi_r8_lms_2016"},
    "perception": {
        "model_path": None,
        "precision": "bf16",
        "image_width": 1280,
        "image_height": 736,
        "n_polyfit_points": 500,
        "n_rows_to_remove_bonnet": 600,
        "centerline_from_track_limits": False,
        "vertical_fov_deg": 60,
        "camera_position": [0.0, 1.45, 0.56],
        "camera_pitch_deg": 2.889419,
    },
    "mapping": {
        "map_path": None,
        "create_map": False,
        "n_mapping_laps": 2,
        "control": {
            "horizon": 100,
            "speed_profile_constraints": {
                "v_min": 5.0, "v_max": 20.0, "a_min": -3.0, "a_max": 6.0,
                "ay_max": 2.0, "ki_min": 0.0, "end_velocity": 10.0,
            },
            "step_cost": [1.0e-1, 1.0e-1, 0.0],
            "r_term": [1.0e-6, 1.0e1],
            "final_cost": [0.0, 0.0, 1.0e-2],
        },
    },
    "localisation": {
        "use_localisation": True,
        "collect_benchmark_observations": False,
        "benchmark_observations_save_location": "data/localisation",
        "n_particles": 500,
        "n_converged_particles": 500,
        "sampling_noise": {"x": 1.1, "y": 1.1, "yaw": 3.0},
        "control_noise": {"velocity": 0.25, "yaw": 2.0},
        "thresholds": {
            "offset": 10, "rotation": 90,
            "minimum_particles": 20, "track_limit": 20.0,
        },
        "score_distribution": {"mean": 0, "sigma": 10},
        # maximum_fit_error (round-5 addition over the reference schema):
        # the localised flag also requires the population's achieved
        # pairing error under 2.5 m — correct locks measure p90 <= 2.26
        # (oracle p99 <= 1.18), displaced along-track locks measure
        # p50 >= 2.77, so the bound separates them cleanly
        # (particle_filter.PFConfig.localised_max_error)
        "convergence_criteria": {
            "maximum_distance": 50,
            "maximum_angle": 90,
            "maximum_fit_error": 2.5,
        },
    },
    "racing": {
        "control": {
            "horizon": 50,
            "unlocalised_max_speed": 28,
            "speed_profile_constraints": {
                "v_min": 8.0, "v_max": 84.0, "a_min": -1.3, "a_max": 1.0,
                "ay_max": 5.5, "ki_min": 0.005, "end_velocity": 14.0,
            },
            "step_cost": [4.0e-3, 5.0e-2, 0.0],
            "r_term": [1.0e-2, 10.0],
            "final_cost": [1.0, 0.0, 0.1],
        },
        "map_speed_profile_constraints": {"ay_max": 7.0, "a_min": -0.15},
    },
    "pids": {
        "throttle": {"proportional": 0.05, "integral": 0.5,
                     "derivative": -0.01, "sampling_interval_s": 0.01},
        "brake": {"proportional": 0.26, "integral": 0.2,
                  "derivative": 0.0, "sampling_interval_s": 0.01},
        "steering": {"proportional": 1.0, "integral": 0.0,
                     "derivative": 0.0, "sampling_interval_s": 0.01},
    },
}

# per-track overrides, mirrored from the reference config diffs
ALT_MAPPING_COSTS = {
    "control.step_cost": [5.0e-3, 5.0e-2, 0.0],
    "control.r_term": [1.0e-2, 1.0e1],
    "control.final_cost": [0.0, 0.0, 1.0e-6],
}

TRACKS = {
    "monza": {},
    "spa": {
        "mapping": {
            "control.speed_profile_constraints.v_max": 30.0,
            "control.speed_profile_constraints.ay_max": 1.0,
            **ALT_MAPPING_COSTS,
        },
        "localisation": {
            "thresholds.rotation": 45, "thresholds.track_limit": 30,
        },
        "racing": {
            "control.unlocalised_max_speed": 8.0,
            "control.speed_profile_constraints.v_min": 5.0,
            "control.speed_profile_constraints.a_min": -1.0,
            "control.speed_profile_constraints.ay_max": 4.0,
            "control.speed_profile_constraints.ki_min": 0.003,
            "control.speed_profile_constraints.end_velocity": 20.0,
            "control.step_cost": [1.0e-3, 0.0, 0.0],
            "map_speed_profile_constraints.ay_max": 6.5,
        },
    },
    "silverstone": {
        "localisation": {
            "thresholds.rotation": 45, "thresholds.track_limit": 15.0,
        },
        "racing": {
            "control.unlocalised_max_speed": 32.0,
            "control.speed_profile_constraints.a_min": -1.0,
            "control.speed_profile_constraints.ay_max": 5.0,
            "control.speed_profile_constraints.ki_min": 0.003,
            "control.speed_profile_constraints.end_velocity": 20.0,
            "control.step_cost": [2.0e-3, 5.0e-2, 0.0],
            "map_speed_profile_constraints.ay_max": 8.0,
            "map_speed_profile_constraints.a_min": -0.1,
        },
    },
    "nordschleife": {
        "mapping": {
            "control.speed_profile_constraints.ay_max": 1.0,
            **ALT_MAPPING_COSTS,
        },
        "racing": {
            "control.unlocalised_max_speed": 20,
            "control.speed_profile_constraints.v_min": 12.0,
            "control.speed_profile_constraints.a_min": -1.0,
            "control.speed_profile_constraints.ay_max": 3.0,
            "control.speed_profile_constraints.ki_min": 0.0,
            "control.step_cost": [2.0e-4, 0.0, 0.0],
            "map_speed_profile_constraints.ay_max": 2.0,
        },
    },
    "vallelunga": {
        "mapping": {
            "control.horizon": 50,
            "control.step_cost": [1.0e-3, 1.0e-1, 0.0],
        },
        "localisation": {
            "thresholds.rotation": 45, "thresholds.track_limit": 28,
        },
        "racing": {
            "control.unlocalised_max_speed": 26,
            "control.speed_profile_constraints.a_min": -1.0,
            "control.speed_profile_constraints.ay_max": 3.5,
            "control.speed_profile_constraints.ki_min": 0.003,
            "control.speed_profile_constraints.end_velocity": None,
            "control.step_cost": [8.0e-3, 5.0e-3, 0.0],
            "map_speed_profile_constraints.ay_max": 5.0,
        },
    },
    "bathurst": {
        "mapping": {
            "control.speed_profile_constraints.v_min": 2.0,
            "control.speed_profile_constraints.v_max": 12.0,
            "control.speed_profile_constraints.ay_max": 1.0,
            "control.speed_profile_constraints.end_velocity": 6.0,
            **ALT_MAPPING_COSTS,
        },
        "racing": {
            "control.unlocalised_max_speed": 20,
            "control.speed_profile_constraints.a_min": -1.0,
            "control.speed_profile_constraints.ay_max": 3.0,
            "control.speed_profile_constraints.ki_min": 0.0,
            "control.step_cost": [1.0e-3, 2.0e-2, 0.0],
            "map_speed_profile_constraints.ay_max": 2.0,
        },
    },
    "yas_marina": {
        "mapping": {
            "control.speed_profile_constraints.ay_max": 1.0,
            **ALT_MAPPING_COSTS,
        },
        "localisation": {
            "thresholds.rotation": 180,
            "convergence_criteria.maximum_angle": 180,
        },
        "racing": {
            "control.unlocalised_max_speed": 20,
            "control.speed_profile_constraints.a_min": -1.0,
            "control.speed_profile_constraints.ay_max": 3.0,
            "control.speed_profile_constraints.ki_min": 0.0,
            "control.step_cost": [2.0e-3, 2.0e-2, 0.0],
            "map_speed_profile_constraints.ay_max": 2.0,
        },
    },
}


def set_path(d, dotted, value):
    keys = dotted.split(".")
    for k in keys[:-1]:
        d = d[k]
    d[keys[-1]] = value


def main():
    out_dir = pathlib.Path(__file__).resolve().parent.parent / "configs"
    out_dir.mkdir(exist_ok=True)
    for track, overrides in TRACKS.items():
        cfg = copy.deepcopy(BASE)
        cfg["experiment"] = f"{track}_audi"
        # the SHIPPED trained checkpoint (tools/train_segmenter.py) — one
        # synthetic-texture model shared across tracks. (A stale per-track
        # path here once regenerated configs pointing at nonexistent
        # files; the segmenter then silently fell back to random weights.)
        cfg["perception"]["model_path"] = (
            "data/models/segmentation/synthetic_fpn.msgpack"
        )
        cfg["mapping"]["map_path"] = f"data/maps/{track}.npz"
        for section, entries in overrides.items():
            for dotted, value in entries.items():
                set_path(cfg[section], dotted, value)
        path = out_dir / f"{track}.yaml"
        path.write_text(yaml.safe_dump(cfg, sort_keys=False))
        print("wrote", path)


if __name__ == "__main__":
    main()
