import os
from pathlib import Path

# CI/tests run on the CPU backend with 8 virtual devices so sharding tests
# exercise a multi-chip mesh without TPU hardware (SURVEY.md section 4).
# Note: this environment pins JAX_PLATFORMS=axon via sitecustomize, so the
# env var alone is not enough — override the config after import too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

DATA_DIR = Path(__file__).resolve().parent / "data"

# Golden tag counts from the reference integration suite
# (reference: tests/test_detector.rs:25-33).
GOLDEN_COUNTS = {
    "calib_sample": 36,  # bundled data/ frame (BASELINE config 1)
    "iphone": 66,
    "EuRoC": 36,
    "TUM_VI": 36,
    "right": 36,
    "r45": 36,
    "top": 36,
    # bundled upstream but absent from its test macro; count pinned by
    # our oracle (reference algorithm) so the hybrid suite covers all
    # 8 bundled images (round-2 verdict, "What's missing" #5)
    "top_right": 36,
    "two_boards": 72,
}


@pytest.fixture(scope="session")
def data_dir() -> Path:
    return DATA_DIR


def make_stress_scene(seed: int):
    """Randomized synthetic chart scene (rotation/scale/offset/noise);
    shared by the stress-parity and xla-mode suites."""
    import numpy as np
    from PIL import Image

    from aprilgrid_tpu.boards.generator import AprilGridBoard, render_png

    rng = np.random.default_rng(seed)
    board = AprilGridBoard(
        size_x=4, size_y=4, tag_family="t36h11",
        page_width_meter=0.5, page_height_meter=0.5,
    )
    chart = render_png(board, pixels_per_mm=1.0)
    im = Image.fromarray(chart)
    angle = float(rng.uniform(-40, 40))
    scale = float(rng.uniform(0.6, 0.9))
    im = im.rotate(angle, resample=Image.BILINEAR, expand=True, fillcolor=160)
    im = im.resize(
        (int(im.width * scale), int(im.height * scale)), Image.BILINEAR
    )
    canvas = np.full((820, 820), 160, np.uint8)
    arr = np.asarray(im)
    oy = int(rng.integers(0, 820 - arr.shape[0]))
    ox = int(rng.integers(0, 820 - arr.shape[1]))
    canvas[oy : oy + arr.shape[0], ox : ox + arr.shape[1]] = arr
    noise = rng.normal(0, 3, canvas.shape)
    return np.clip(canvas.astype(np.float32) + noise, 0, 255).astype(np.uint8)
