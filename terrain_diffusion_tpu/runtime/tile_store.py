"""Tile stores: per-window output caches for the infinite-tensor runtime.

Two backends mirroring the reference's external library surface
(`world_pipeline.py:666-674`):

- ``MemoryTileStore(cache_size_bytes)`` — in-RAM LRU keyed by
  (tensor_id, window_index).
- ``HDF5TileStore(path, mode, compression, ...)`` — persistent world cache;
  one dataset per window under ``/{tensor_id}/{i}_{j}_...``, with a small
  in-RAM LRU in front.  File attrs carry pipeline params for the
  reconcile-on-open flow (`world_pipeline.py:625-663`).
"""
from __future__ import annotations

import collections
import json
import threading
from typing import Optional

import numpy as np


class MemoryTileStore:
    """Byte-budgeted LRU of window outputs."""

    def __init__(self, cache_size_bytes: Optional[int] = None):
        self.cache_size_bytes = cache_size_bytes
        self._data: "collections.OrderedDict[tuple, np.ndarray]" = collections.OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()

    def _key(self, tensor_id: str, idx: tuple) -> tuple:
        return (tensor_id, tuple(int(i) for i in idx))

    def get(self, tensor_id: str, idx: tuple):
        k = self._key(tensor_id, idx)
        with self._lock:
            arr = self._data.get(k)
            if arr is not None:
                self._data.move_to_end(k)
            return arr

    def contains(self, tensor_id: str, idx: tuple) -> bool:
        with self._lock:
            return self._key(tensor_id, idx) in self._data

    def put(self, tensor_id: str, idx: tuple, arr: np.ndarray):
        k = self._key(tensor_id, idx)
        with self._lock:
            if k in self._data:
                self._bytes -= self._data[k].nbytes
            self._data[k] = arr
            self._data.move_to_end(k)
            self._bytes += arr.nbytes
            if self.cache_size_bytes is not None:
                while self._bytes > self.cache_size_bytes and len(self._data) > 1:
                    _, old = self._data.popitem(last=False)
                    self._bytes -= old.nbytes

    def clear(self, tensor_id: Optional[str] = None):
        with self._lock:
            if tensor_id is None:
                self._data.clear()
                self._bytes = 0
            else:
                for k in [k for k in self._data if k[0] == tensor_id]:
                    self._bytes -= self._data[k].nbytes
                    del self._data[k]

    def close(self):
        self.clear()


class HDF5TileStore:
    """Persistent tile store over HDF5 with an LRU read cache."""

    PARAMS_ATTR = "WORLD_PIPELINE_PARAMS"

    def __init__(self, path: str, mode: str = "a", compression: Optional[str] = "gzip",
                 compression_opts: Optional[int] = 4, cache_size_tiles: int = 100):
        import h5py

        self._h5py = h5py
        self.path = path
        self.file = h5py.File(path, mode)
        self.compression = compression
        self.compression_opts = compression_opts
        self._cache: "collections.OrderedDict[tuple, np.ndarray]" = collections.OrderedDict()
        self._cache_size = cache_size_tiles
        self._lock = threading.Lock()

    def _name(self, tensor_id: str, idx: tuple) -> str:
        return f"{tensor_id}/" + "_".join(str(int(i)) for i in idx)

    def get(self, tensor_id: str, idx: tuple):
        k = (tensor_id, tuple(int(i) for i in idx))
        with self._lock:
            if k in self._cache:
                self._cache.move_to_end(k)
                return self._cache[k]
            name = self._name(tensor_id, idx)
            if name not in self.file:
                return None
            arr = np.asarray(self.file[name])
            self._cache[k] = arr
            while len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)
            return arr

    def contains(self, tensor_id: str, idx: tuple) -> bool:
        k = (tensor_id, tuple(int(i) for i in idx))
        with self._lock:
            return k in self._cache or self._name(tensor_id, idx) in self.file

    def put(self, tensor_id: str, idx: tuple, arr: np.ndarray):
        name = self._name(tensor_id, idx)
        with self._lock:
            if name in self.file:
                del self.file[name]
            kwargs = {}
            if self.compression is not None:
                kwargs = dict(compression=self.compression,
                              compression_opts=self.compression_opts)
            self.file.create_dataset(name, data=arr, **kwargs)
            k = (tensor_id, tuple(int(i) for i in idx))
            self._cache[k] = arr
            self._cache.move_to_end(k)  # a rewrite is the hottest entry
            while len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)

    def clear(self, tensor_id: Optional[str] = None):
        with self._lock:
            if tensor_id is None:
                for key in list(self.file.keys()):
                    del self.file[key]
                self._cache.clear()
            else:
                if tensor_id in self.file:
                    del self.file[tensor_id]
                for k in [k for k in self._cache if k[0] == tensor_id]:
                    del self._cache[k]

    # -- pipeline params attr -------------------------------------------
    def get_params(self):
        raw = self.file.attrs.get(self.PARAMS_ATTR)
        return json.loads(raw) if raw is not None else None

    def set_params(self, params: dict):
        self.file.attrs[self.PARAMS_ATTR] = json.dumps(params, sort_keys=True)
        self.file.flush()

    def flush(self):
        self.file.flush()

    def close(self):
        try:
            self.file.close()
        except Exception:
            pass
