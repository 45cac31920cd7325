"""Tests for the C++ decode runtime (vs imageio golden)."""

import os
import tempfile

import numpy as np
import pytest

from dynibar_tpu.data.native_loader import NativeImageLoader


@pytest.fixture(scope="module")
def image_files():
  import imageio.v2 as imageio
  rng = np.random.RandomState(0)
  tmp = tempfile.mkdtemp()
  paths = []
  for i in range(4):
    img = (rng.rand(40, 56, 3) * 255).astype(np.uint8)
    p = os.path.join(tmp, f"img{i}.png")
    imageio.imwrite(p, img)
    paths.append((p, img))
  jp = os.path.join(tmp, "img_j.jpg")
  imageio.imwrite(jp, (rng.rand(40, 56, 3) * 255).astype(np.uint8),
                  quality=95)
  return paths, jp


def test_native_loader_builds_and_matches_png(image_files):
  paths, _ = image_files
  loader = NativeImageLoader(num_threads=2)
  assert loader.native, "native runtime should build in this image"
  out = loader.decode([p for p, _ in paths])
  assert out.shape == (4, 40, 56, 3)
  for i, (_, img) in enumerate(paths):
    np.testing.assert_allclose(out[i], img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_native_loader_jpeg_and_size(image_files):
  _, jp = image_files
  loader = NativeImageLoader(num_threads=2)
  h, w = loader.image_size(jp)
  assert (h, w) == (40, 56)
  out = loader.decode([jp])
  assert out.shape == (1, 40, 56, 3)
  import imageio.v2 as imageio
  want = imageio.imread(jp).astype(np.float32) / 255.0
  np.testing.assert_allclose(out[0], want, atol=2e-2)  # jpeg lossy


def test_native_loader_resize(image_files):
  paths, _ = image_files
  loader = NativeImageLoader(num_threads=2)
  out = loader.decode([paths[0][0]], out_h=20, out_w=28)
  assert out.shape == (1, 20, 28, 3)
  assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_native_loader_missing_file_raises(image_files):
  loader = NativeImageLoader(num_threads=1)
  if not loader.native:
    pytest.skip("no native runtime")
  with pytest.raises(IOError):
    loader.decode(["/nonexistent/file.png"], out_h=8, out_w=8)
