"""CLI surface tests: reference-compatible flags -> Config."""

import pytest

from acr_tpu.config import Config, make_config, parse_args


def test_all_demo_modes_parse():
    for mode in ("image", "video", "folder", "webcam"):
        assert parse_args(["--demo_mode", mode]).demo_mode == mode


def test_reference_short_flags():
    cfg = parse_args(["-t", "-s", "-v"])
    assert cfg.temporal_optimization is True
    assert cfg.save_dict_results is True
    assert cfg.save_visualization_on_img is False   # -v disables rendering


def test_long_flags():
    cfg = parse_args([
        "--inputs", "/x/y.jpg", "--output_dir", "/out/",
        "--renderer", "native", "--render_size", "2048",
        "--centermap_conf_thresh", "0.5", "--smooth_coeff", "2.5",
        "--model_precision", "bf16", "--data_parallel", "4",
        "--show_items", "mesh", "pj2d", "--kernel_sizes", "3", "5",
    ])
    assert cfg.inputs == "/x/y.jpg"
    assert cfg.renderer == "native" and cfg.render_size == 2048
    assert cfg.centermap_conf_thresh == 0.5 and cfg.smooth_coeff == 2.5
    assert cfg.model_precision == "bf16" and cfg.data_parallel == 4
    assert cfg.show_items == ("mesh", "pj2d")
    assert cfg.kernel_sizes == (3, 5)


def test_bool_with_value():
    cfg = parse_args(["--temporal_optimization"])
    assert cfg.temporal_optimization is True
    # default-True bools accept explicit values
    cfg = parse_args(["--mano_mesh_root_align", "false"])
    assert cfg.mano_mesh_root_align is False
    cfg = parse_args(["--inter_prior", "true"])
    assert cfg.inter_prior is True


def test_params_num_contract():
    cfg = Config()
    assert cfg.params_num == 109      # cam3 + 16x6D + betas10
    assert cfg.map_channels == 106


def test_yaml_cli_precedence(tmp_path):
    yml = tmp_path / "c.yml"
    yml.write_text("ARGS:\n focal_length: 900\n renderer: native\n")
    cfg = make_config(str(yml), {"focal_length": 1265.0})
    assert cfg.focal_length == 1265.0     # CLI wins
    assert cfg.renderer == "native"       # YAML beats default
