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


def test_legacy_renderer_values_remapped(caplog):
    """The reference's own renderer names must be accepted, not crash
    (reference: acr/config.py:37 choices pyrender|pytorch3d; its
    demo.yml ships renderer:'pyrender')."""
    import logging
    with caplog.at_level(logging.WARNING, logger="acr_tpu"):
        cfg = Config(renderer="pyrender")
    assert cfg.renderer == "tpu"
    assert cfg.camera_model == "intrinsics"   # pyrender's camera model
    assert any("remapped" in r.getMessage() for r in caplog.records)

    cfg = Config(renderer="pytorch3d")
    assert cfg.renderer == "tpu"
    assert cfg.camera_model == "pt3d"         # the pt3d FoV/ortho rule
    # an explicit camera_model survives the remap
    cfg = Config(renderer="pytorch3d", camera_model="ortho")
    assert cfg.camera_model == "ortho"
    # still-invalid values still raise
    with pytest.raises(ValueError):
        Config(renderer="opengl")


def test_reference_verbatim_demo_yml():
    """The reference's shipped configs/demo.yml parses end-to-end with
    unknown (train-era) keys routed to extras and renderer remapped."""
    import os
    ref_yml = "/root/reference/configs/demo.yml"
    if not os.path.exists(ref_yml):
        pytest.skip("reference tree unavailable")
    cfg = make_config(ref_yml)
    assert cfg.renderer == "tpu"              # 'pyrender' remapped
    assert cfg.model_precision == "fp32"
    assert cfg.focal_length == 1265.0 and cfg.FOV == 22.5
    assert cfg.val_batch_size == 1
    assert cfg.extras.get("backbone") == "hrnet"
    assert "mesh_cloth" in cfg.extras and "GPUS" in cfg.extras


def test_reference_readme_invocations_parse():
    """Every README.md:46-58 demo invocation's flag set parses
    (reference: README 'Demo' section)."""
    for argv in (["--demo_mode", "webcam", "-t"],
                 ["--demo_mode", "image", "--inputs", "/x.jpg"],
                 ["--demo_mode", "folder", "-t", "--inputs", "/d"],
                 ["--demo_mode", "video", "-t", "--inputs", "/v.mp4"]):
        cfg = parse_args(argv)
        assert cfg.demo_mode == argv[1]
