"""Native C++ data-loader: decode parity vs cv2, npy reads, prefetch order."""

import os

import numpy as np
import pytest

pytest.importorskip("cv2")

try:
    from speech2lip_tpu.data import native_loader as nl
    nl._load()
except ImportError:
    pytest.skip("native loader unavailable (no toolchain)",
                allow_module_level=True)


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    import cv2
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    jpgs, npys, raw_imgs, raw_arrays = [], [], [], []
    for i in range(6):
        img = (rng.uniform(0, 255, (32, 40, 3))).astype(np.uint8)
        p = str(d / f"{i:05d}.jpg")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        jpgs.append(p)
        raw_imgs.append(img)
        arr = rng.standard_normal((8, 5, 2)).astype(np.float32)
        pn = str(d / f"{i:05d}.npy")
        np.save(pn, arr)
        npys.append(pn)
        raw_arrays.append(arr)
    return jpgs, npys, raw_imgs, raw_arrays


def test_decode_jpeg_batch_matches_cv2(files):
    import cv2
    jpgs, _, raw_imgs, _ = files
    out = nl.decode_jpeg_batch(jpgs, 32, 40, n_threads=3)
    assert out.shape == (6, 32, 40, 3)
    for i, p in enumerate(jpgs):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB) / 255.0
        # libjpeg vs cv2's bundled decoder: same IDCT within 2/255
        assert np.abs(out[i] - ref).max() < 2.5 / 255.0


def test_read_npy_batch(files):
    _, npys, _, raw_arrays = files
    out = nl.read_npy_batch(npys, (8, 5, 2), n_threads=2)
    np.testing.assert_array_equal(out, np.stack(raw_arrays))


def test_prefetcher_order_and_content(files):
    jpgs, npys, raw_imgs, raw_arrays = files
    samples = [[jpgs[i], npys[i]] for i in range(6)]
    pf = nl.SamplePrefetcher(samples,
                             [("jpeg", (32, 40)), ("npy", (8, 5, 2))],
                             n_slots=3, n_threads=2)
    import cv2
    order = [3, 0, 5, 1]
    pf.start_epoch(order)
    for expect in order:
        idx, (img, arr) = pf.pop()
        assert idx == expect
        np.testing.assert_allclose(arr, raw_arrays[expect])
        # compare against a decode of the same file (JPEG is lossy on noise)
        ref = cv2.cvtColor(cv2.imread(jpgs[expect]), cv2.COLOR_BGR2RGB) / 255.0
        assert np.abs(img - ref).max() < 2.5 / 255.0
    assert pf.pop() is None
    assert pf.errors == 0
    # second epoch reuses the loader
    pf.start_epoch([2, 4])
    idx, _ = pf.pop()
    assert idx == 2
    pf.close()
