"""ctypes bindings for the C++ image-decode runtime (runtime/image_loader.cc).

Replaces the reference's torch-DataLoader worker *processes*
(train.py:82-90) with an in-process libpng/libjpeg thread pool: decode +
resize happen in native threads with the GIL released, writing straight
into the caller's float32 NHWC buffer.  Falls back to imageio when the
shared library isn't built (``make -C runtime``) so nothing hard-depends
on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_SO_PATH = os.path.join(_RUNTIME_DIR, "libdyn_loader.so")


def _ensure_built() -> Optional[str]:
  if os.path.exists(_SO_PATH):
    return _SO_PATH
  try:
    subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                   capture_output=True, timeout=120)
  except Exception:
    return None
  return _SO_PATH if os.path.exists(_SO_PATH) else None


class NativeImageLoader:
  """Threaded native decoder; ``decode(paths, h, w) -> [N, h, w, 3] f32``."""

  def __init__(self, num_threads: int = 4):
    self._lib = None
    self._handle = None
    so = _ensure_built()
    if so is not None:
      try:
        lib = ctypes.CDLL(so)
        lib.dyn_loader_create.restype = ctypes.c_void_p
        lib.dyn_loader_create.argtypes = [ctypes.c_int]
        lib.dyn_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.dyn_loader_decode_batch.restype = ctypes.c_int
        lib.dyn_loader_decode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.dyn_loader_image_size.restype = ctypes.c_int
        lib.dyn_loader_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        self._lib = lib
        self._handle = lib.dyn_loader_create(num_threads)
      except OSError:
        self._lib = None

  @property
  def native(self) -> bool:
    return self._lib is not None

  def image_size(self, path: str) -> Tuple[int, int]:
    if self.native:
      h = ctypes.c_int()
      w = ctypes.c_int()
      rc = self._lib.dyn_loader_image_size(path.encode(), ctypes.byref(h),
                                           ctypes.byref(w))
      if rc == 0:
        return h.value, w.value
    import imageio.v2 as imageio
    sh = imageio.imread(path).shape
    return sh[0], sh[1]

  def decode(self, paths: List[str], out_h: int = 0, out_w: int = 0
             ) -> np.ndarray:
    """Decode (and resize, if out_h/out_w > 0) a batch of image files."""
    n = len(paths)
    if not self.native:
      return self._decode_fallback(paths, out_h, out_w)
    if out_h == 0 or out_w == 0:
      out_h, out_w = self.image_size(paths[0])
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = self._lib.dyn_loader_decode_batch(
        self._handle, arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_h, out_w)
    if rc != 0:
      raise IOError(f"native decode failed for {paths[-rc - 1]}")
    return out

  @staticmethod
  def _decode_fallback(paths, out_h, out_w):
    import imageio.v2 as imageio
    imgs = []
    for p in paths:
      img = imageio.imread(p).astype(np.float32) / 255.0
      if img.ndim == 2:
        img = np.stack([img] * 3, -1)
      img = img[..., :3]
      if out_h and out_w and img.shape[:2] != (out_h, out_w):
        import cv2
        img = cv2.resize(img, (out_w, out_h),
                         interpolation=cv2.INTER_LINEAR)
      imgs.append(img)
    return np.stack(imgs)

  def __del__(self):
    if self._lib is not None and self._handle:
      try:
        self._lib.dyn_loader_destroy(self._handle)
      except Exception:
        pass
