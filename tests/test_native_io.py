"""Native threaded frame codec vs the Python reference I/O."""

import numpy as np
import pytest

from ntsc_crt_tpu.utils import imageio, native_io


@pytest.fixture(scope="module")
def have_native():
    if not native_io.available():
        pytest.skip("native toolchain unavailable")


def test_native_read_matches_python(tmp_path, have_native):
    rng = np.random.RandomState(0)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.randint(0, 256, (48, 64, 3), np.uint8)
        p = tmp_path / (f"{i}.ppm" if i % 2 else f"{i}.bmp")
        imageio.write_image(p, img)
        paths.append(str(p))
        imgs.append(img)
    got = native_io.read_batch(paths, 48, 64)
    np.testing.assert_array_equal(got, np.stack(imgs))


def test_native_write_matches_python(tmp_path, have_native):
    rng = np.random.RandomState(1)
    rgb = rng.randint(0, 256, (4, 33, 21, 3), np.uint8)
    paths = [str(tmp_path / f"o{i}.bmp") for i in range(4)]
    native_io.write_batch(paths, rgb)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(imageio.bmp_read(p), rgb[i])
