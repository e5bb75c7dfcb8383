import pathlib

import pytest

from acmpc_tpu.config import load_config

CONFIG_DIR = pathlib.Path(__file__).resolve().parent.parent / "configs"
TRACKS = [
    "monza", "spa", "silverstone", "nordschleife",
    "vallelunga", "bathurst", "yas_marina",
]


@pytest.mark.parametrize("track", TRACKS)
def test_load_all_track_configs(track):
    cfg = load_config(CONFIG_DIR / f"{track}.yaml")
    assert cfg.experiment == f"{track}_audi"
    assert cfg.racing_control.horizon == 50
    assert cfg.mapping_control.horizon in (50, 100)
    assert cfg.racing_control.constraints.v_max == 84.0
    assert cfg.vehicle.wheelbase > 0
    assert cfg.localisation.n_particles == 500


def test_monza_values_match_reference():
    cfg = load_config(CONFIG_DIR / "monza.yaml")
    rc = cfg.racing_control
    assert rc.step_cost == (4.0e-3, 5.0e-2, 0.0)
    assert rc.r_term == (1.0e-2, 10.0)
    assert rc.final_cost == (1.0, 0.0, 0.1)
    assert rc.constraints.ay_max == 5.5
    assert rc.unlocalised_max_speed == 28
    assert cfg.map_speed_profile.ay_max == 7.0
    assert cfg.map_speed_profile.a_min == -0.15
    mc = cfg.mapping_control
    assert mc.horizon == 100
    assert mc.constraints.v_max == 20.0


def test_vallelunga_no_end_velocity():
    cfg = load_config(CONFIG_DIR / "vallelunga.yaml")
    assert cfg.racing_control.constraints.end_velocity is None
    assert cfg.mapping_control.horizon == 50


def test_benchmark_configs_parse():
    """Per-track localisation benchmark configs (counterpart of reference
    localisation/benchmarking/configs/*.yaml) parse into a valid
    LocalisationConfig and name a data path + map."""
    from acmpc_tpu.config.schema import LocalisationConfig, load_raw

    bench_dir = CONFIG_DIR / "benchmarks"
    tracks = sorted(p.stem for p in bench_dir.glob("*.yaml"))
    # the reference's 5 benchmark tracks plus the round-5 extension to
    # all 7 shipped maps
    assert tracks == [
        "bathurst", "monza", "nordschleife", "silverstone", "spa",
        "vallelunga", "yas_marina",
    ]
    for t in tracks:
        raw = load_raw(bench_dir / f"{t}.yaml")
        assert raw["experiment_name"].startswith(t)
        assert raw["data_path"]
        assert raw["map_path"]
        loc = LocalisationConfig.from_config(raw["localisation"])
        assert loc.n_particles == 500
        assert loc.threshold_track_limit == 25.0
