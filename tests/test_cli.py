"""CLI flag surface (reference driver.c:420-508)."""

from raytracing_c_tpu.cli import parse_args


def test_reference_flags():
    cfg = parse_args(
        ["-W", "640", "-H", "480", "-S", "4", "-T", "3", "-B", "2",
         "model.obj", "-O", "out.qoi", "-V", "-D"]
    )
    assert cfg["width"] == 640 and cfg["height"] == 480
    assert cfg["samples"] == 4 and cfg["max_bounces"] == 2
    assert cfg["n_threads"] == 3
    assert cfg["model"] == "model.obj"
    assert cfg["output"] == "out.qoi"
    assert cfg["verbose"] and cfg["denoise"]


def test_defaults_match_reference():
    cfg = parse_args(["m.glb"])
    # driver.c:733-742
    assert cfg["width"] == 1024 and cfg["height"] == 1024
    assert cfg["samples"] == 16 and cfg["max_bounces"] == 8
    assert cfg["n_threads"] == 1
    assert cfg["output"] == "output.png"
    assert not cfg["verbose"] and not cfg["denoise"]


def test_usage_errors():
    assert parse_args([]) is None  # no model
    assert parse_args(["-W"]) is None  # missing value
    assert parse_args(["a.obj", "b.obj"]) is None  # two models
    assert parse_args(["-X", "1", "a.obj"]) is None  # unknown flag


def test_extended_flags():
    cfg = parse_args(
        ["--seed", "7", "--no-bg", "--brute-force", "a.obj",
         "--batch-pixels", "4096", "--tonemap", "aces"]
    )
    assert cfg["seed"] == 7
    assert cfg["background"] is None
    assert cfg["brute_force"]
    assert cfg["batch_pixels"] == 4096
    assert cfg["tonemap"] == "aces"


def test_nearest_filter_flag():
    cfg = parse_args(["--nearest", "a.obj"])
    assert cfg["texture_mode"] == "nearest"
    assert parse_args(["a.obj"])["texture_mode"] == "bilinear"


def test_load_scene_without_model_ok():
    cfg = parse_args(["--load-scene", "cache.npz"])
    assert cfg is not None and cfg["load_scene"] == "cache.npz"
