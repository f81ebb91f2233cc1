"""ctypes bindings for the native host-side hot loops.

Builds ``hbtpu_native.cc`` with the system compiler on first import
(cached next to the source; rebuilt when the source changes) and exposes
typed wrappers. Everything degrades to NumPy when no compiler is
available — the native path is a performance fast-path, never a
correctness dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

LOG = logging.getLogger('hybridbackend_tpu')

_SRC = os.path.join(os.path.dirname(__file__), 'hbtpu_native.cc')
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
  global _LIB, _TRIED
  if _LIB is not None or _TRIED:
    return _LIB
  _TRIED = True
  if os.environ.get('HB_NATIVE_DISABLED', '').lower() in ('1', 'true'):
    return None
  try:
    with open(_SRC, 'rb') as f:
      digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache_dir = os.environ.get(
        'HB_NATIVE_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'hbtpu_native'))
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f'hbtpu_native_{digest}.so')
    if not os.path.exists(so_path):
      tmp = so_path + '.tmp'
      subprocess.run(
          ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-pthread',
           '-o', tmp, _SRC],
          check=True, capture_output=True)
      os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)
    lib.ragged_take_rows.restype = ctypes.c_int64
    lib.hb_idmap_new.restype = ctypes.c_void_p
    lib.hb_idmap_new.argtypes = [ctypes.c_int64]
    lib.hb_idmap_free.argtypes = [ctypes.c_void_p]
    lib.hb_idmap_size.restype = ctypes.c_int64
    lib.hb_idmap_size.argtypes = [ctypes.c_void_p]
    lib.hb_idmap_lookup.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int32, ctypes.c_int32]
    lib.hb_idmap_train_lookup.restype = ctypes.c_int64
    lib.hb_idmap_train_lookup.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int32]
    lib.hb_idmap_set.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.hb_idmap_erase.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.hb_idmap_items.restype = ctypes.c_int64
    lib.hb_idmap_items.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.hb_idmap_items_all.restype = ctypes.c_int64
    lib.hb_idmap_items_all.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    _LIB = lib
  except (OSError, subprocess.CalledProcessError) as e:
    LOG.warning('native module unavailable, using NumPy fallbacks: %s', e)
    _LIB = None
  return _LIB


def available() -> bool:
  return _build_and_load() is not None


def _ptr(a: np.ndarray):
  return a.ctypes.data_as(ctypes.c_void_p)


_PAD_FNS = {'float32': 'ragged_to_padded_f32',
            'int64': 'ragged_to_padded_i64',
            'int32': 'ragged_to_padded_i32'}


def ragged_to_padded(values: np.ndarray, splits: np.ndarray,
                     max_len: int, pad_value) -> Optional[
                         Tuple[np.ndarray, np.ndarray]]:
  """Native ragged→padded; returns None if unsupported (caller falls
  back to NumPy)."""
  lib = _build_and_load()
  fname = _PAD_FNS.get(values.dtype.name)
  if lib is None or fname is None or not values.flags.c_contiguous:
    return None
  n = len(splits) - 1
  inner = int(np.prod(values.shape[1:], dtype=np.int64))
  out = np.full((n, max_len) + values.shape[1:], pad_value, values.dtype)
  mask = np.zeros((n, max_len), np.uint8)
  splits = np.ascontiguousarray(splits, np.int64)
  getattr(lib, fname)(
      _ptr(values), _ptr(splits), ctypes.c_int64(n),
      ctypes.c_int64(max_len), ctypes.c_int64(max(inner, 1)),
      _ptr(out), _ptr(mask))
  return out, mask.astype(bool)


def ragged_take_rows(values: np.ndarray, splits: np.ndarray,
                     indices: np.ndarray) -> Optional[
                         Tuple[np.ndarray, np.ndarray]]:
  lib = _build_and_load()
  if lib is None or not values.flags.c_contiguous or values.ndim != 1 \
      or values.dtype == object:
    return None
  splits = np.ascontiguousarray(splits, np.int64)
  indices = np.ascontiguousarray(indices, np.int64)
  lengths = np.diff(splits)[indices]
  total = int(lengths.sum())
  out_values = np.empty((total,), values.dtype)
  out_splits = np.empty((len(indices) + 1,), np.int64)
  lib.ragged_take_rows(
      _ptr(values), _ptr(splits), _ptr(indices),
      ctypes.c_int64(len(indices)), ctypes.c_int64(values.itemsize),
      _ptr(out_values), _ptr(out_splits))
  return out_values, out_splits


def take_rows_dense(values: np.ndarray,
                    indices: np.ndarray) -> Optional[np.ndarray]:
  lib = _build_and_load()
  if lib is None or not values.flags.c_contiguous or \
      values.dtype == object:
    return None
  indices = np.ascontiguousarray(indices, np.int64)
  row_bytes = int(values.itemsize * np.prod(values.shape[1:],
                                            dtype=np.int64))
  out = np.empty((len(indices),) + values.shape[1:], values.dtype)
  lib.take_rows_dense(_ptr(values), _ptr(indices),
                      ctypes.c_int64(len(indices)),
                      ctypes.c_int64(max(row_bytes, values.itemsize)),
                      _ptr(out))
  return out


def murmur3_mix64(ids: np.ndarray, modulo: int = 0) -> Optional[np.ndarray]:
  lib = _build_and_load()
  if lib is None:
    return None
  ids = np.ascontiguousarray(ids, np.int64)
  out = np.empty_like(ids)
  lib.murmur3_mix64(_ptr(ids), ctypes.c_int64(len(ids)),
                    ctypes.c_uint64(modulo), _ptr(out))
  return out


__all__ = ['available', 'ragged_to_padded', 'ragged_take_rows',
           'take_rows_dense', 'murmur3_mix64', 'NativeIdMap',
           'native_idmap']


class NativeIdMap:
  """Open-addressing int64→int32 map over the C ABI (host analogue of
  the reference's device slab hash, ``lookup_functors.cu.cc:40-170``).
  Returns None from :func:`native_idmap` when the native lib is
  unavailable; callers fall back to a NumPy/dict path."""

  def __init__(self, capacity_hint: int = 1024):
    self._lib = _build_and_load()
    if self._lib is None:
      raise RuntimeError('native lib unavailable')
    self._h = self._lib.hb_idmap_new(ctypes.c_int64(int(capacity_hint)))

  def __del__(self):
    try:
      if getattr(self, '_h', None):
        self._lib.hb_idmap_free(self._h)
        self._h = None
    except Exception:
      pass

  def __len__(self) -> int:
    return int(self._lib.hb_idmap_size(self._h))

  def lookup(self, ids: np.ndarray, missing: int = -1,
             nthreads: int = 0) -> np.ndarray:
    """Read-only parallel probe; unadmitted/absent ids → ``missing``."""
    ids = np.ascontiguousarray(ids, np.int64)
    out = np.empty(ids.shape, np.int32)
    if nthreads <= 0:
      nthreads = min(8, os.cpu_count() or 1)
    self._lib.hb_idmap_lookup(self._h, _ptr(ids),
                              ctypes.c_int64(ids.size), _ptr(out),
                              ctypes.c_int32(missing),
                              ctypes.c_int32(nthreads))
    return out

  def train_lookup(self, ids: np.ndarray, max_rows: int, next_row: int,
                   min_count: int = 1):
    """Lookup-or-assign: returns ``(rows, new_next_row)``."""
    ids = np.ascontiguousarray(ids, np.int64)
    out = np.empty(ids.shape, np.int32)
    nxt = self._lib.hb_idmap_train_lookup(
        self._h, _ptr(ids), ctypes.c_int64(ids.size), _ptr(out),
        ctypes.c_int64(int(max_rows)), ctypes.c_int64(int(next_row)),
        ctypes.c_int32(int(min_count)))
    return out, int(nxt)

  def set(self, ids: np.ndarray, rows: np.ndarray) -> None:
    ids = np.ascontiguousarray(ids, np.int64)
    rows = np.ascontiguousarray(rows, np.int32)
    self._lib.hb_idmap_set(self._h, _ptr(ids), _ptr(rows),
                           ctypes.c_int64(ids.size))

  def erase(self, ids: np.ndarray) -> None:
    ids = np.ascontiguousarray(ids, np.int64)
    self._lib.hb_idmap_erase(self._h, _ptr(ids), ctypes.c_int64(ids.size))

  def items(self):
    """Admitted (id, row) pairs, unordered."""
    n = len(self)
    ids = np.empty((n,), np.int64)
    rows = np.empty((n,), np.int32)
    cnt = int(self._lib.hb_idmap_items(self._h, _ptr(ids), _ptr(rows)))
    return ids[:cnt], rows[:cnt]

  def items_all(self):
    """Every live (id, raw value) pair, unordered: admitted rows >= 0,
    pending min_count admission encoded as ``val = -1 - count``."""
    n = len(self)
    ids = np.empty((n,), np.int64)
    vals = np.empty((n,), np.int32)
    cnt = int(self._lib.hb_idmap_items_all(self._h, _ptr(ids), _ptr(vals)))
    return ids[:cnt], vals[:cnt]


def native_idmap(capacity_hint: int = 1024):
  """NativeIdMap or None when the native lib is unavailable."""
  if _build_and_load() is None:
    return None
  return NativeIdMap(capacity_hint)
