"""Input adapters (kornia-adapter equivalent) + multi-camera streaming."""

import numpy as np
import pytest

from aprilgrid_tpu.adapters import detect_adapted, to_detector_input
from aprilgrid_tpu.detector import TagDetector
from aprilgrid_tpu.oracle.numpy_ref import load_image
from aprilgrid_tpu.parallel.sharding import make_mesh
from aprilgrid_tpu.parallel.streaming import MultiCameraDetector


@pytest.fixture(scope="module")
def detector():
    return TagDetector("t36h11")


@pytest.fixture(scope="module")
def euroc(data_dir):
    return load_image(str(data_dir / "EuRoC.png"))


def test_torch_adapter(detector, euroc):
    torch = pytest.importorskip("torch")
    assert len(detect_adapted(detector, torch.from_numpy(euroc.copy()))) == 36
    rgb = np.stack([euroc] * 3, -1)
    chw = torch.from_numpy(rgb).permute(2, 0, 1)
    assert len(detect_adapted(detector, chw)) == 36


def test_layout_normalization():
    hw = np.zeros((10, 12), np.uint8)
    assert to_detector_input(hw[None]).shape == (10, 12)     # 1HW
    assert to_detector_input(hw[..., None]).shape == (10, 12)  # HW1
    chw = np.zeros((3, 10, 12), np.uint8)
    assert to_detector_input(chw).shape == (10, 12, 3)
    # round-5: RGBA/f32 are part of the widened DynamicImage contract
    # (tests/test_input_modes.py); only truly unsupported layouts raise
    assert to_detector_input(np.zeros((10, 12, 4), np.uint8)).shape == (
        10, 12, 4,
    )
    assert to_detector_input(np.zeros((10, 12), np.float32)).dtype == (
        np.float32
    )
    with pytest.raises(ValueError):
        to_detector_input(np.zeros((10, 12, 5), np.uint8))
    with pytest.raises(TypeError):
        to_detector_input(np.zeros((10, 12), np.int64))


def test_multicamera_sharded(detector, euroc):
    mesh = make_mesh({"camera": 2})
    mc = MultiCameraDetector(detector, mesh)
    frames = np.stack(
        [np.stack([euroc, euroc]), np.stack([euroc, np.zeros_like(euroc)])]
    )
    res = mc.detect(frames)
    assert [[len(t) for t in cam] for cam in res] == [[36, 36], [36, 0]]


def test_multicamera_requires_camera_axis(detector):
    with pytest.raises(ValueError):
        MultiCameraDetector(detector, make_mesh({"data": 2}))


def test_detect_stream_pipelined(detector, data_dir):
    """detect_stream yields per-batch results in order while prefetching
    uploads; results must match plain detect_batch exactly."""
    import numpy as np

    from aprilgrid_tpu.oracle.numpy_ref import load_image
    from aprilgrid_tpu.parallel.streaming import detect_stream

    img = load_image(str(data_dir / "two_boards.png"))
    batches = [np.broadcast_to(img, (2,) + img.shape) for _ in range(3)]
    got = list(detect_stream(detector, iter(batches), prefetch=2))
    assert len(got) == 3
    ref = detector.detect_batch(batches[0])
    for res in got:
        assert [set(r) for r in res] == [set(r) for r in ref]
        assert all(len(r) == 72 for r in res)
