"""Native (C++) runtime components.

``stepper.cpp`` is the thread-pool batched MuJoCo stepper — the in-process
native replacement for the reference's fork-based parallel env executors
(reference envs/parallel_vec_env_executor.py:78-176, rllab singleton_pool
behind samplers/batch_sampler.py:16-41).  It is compiled on first use with
g++ against the headers and ``libmujoco`` shipped inside the installed
``mujoco`` wheel, cached under ``_build/`` keyed by the source hash, and is
strictly optional: any failure (no compiler, no mujoco, env var
``METRPO_NATIVE=0``) degrades to the pure-python per-env loop in
``envs/base.VecHostEnv`` with identical semantics (tests/test_native.py
proves bitwise-equal physics).
"""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "stepper.cpp")
_BUILD_DIR = os.path.join(_DIR, "_build")

_lib = None
_lib_error: Optional[str] = None
_lock = threading.Lock()


def _mujoco_paths():
    import mujoco
    pkg = os.path.dirname(os.path.abspath(mujoco.__file__))
    include = os.path.join(pkg, "include")
    libs = sorted(glob.glob(os.path.join(pkg, "libmujoco.so*")))
    if not os.path.isdir(include) or not libs:
        raise FileNotFoundError(f"mujoco wheel lacks headers/lib under {pkg}")
    return include, libs[0]


def _build_library() -> str:
    include, libpath = _mujoco_paths()
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read() + libpath.encode()).hexdigest()[:16]
    out = os.path.join(_BUILD_DIR, f"stepper_{digest}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_BUILD_DIR, exist_ok=True)
    libdir, libname = os.path.split(libpath)
    tmp = out + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        f"-I{include}", _SRC, f"-L{libdir}", f"-l:{libname}",
        f"-Wl,-rpath,{libdir}", "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(tmp, out)  # atomic vs. concurrent builders
    return out


def _load():
    global _lib, _lib_error
    with _lock:
        if _lib is not None or _lib_error is not None:
            return _lib
        if os.environ.get("METRPO_NATIVE", "1") == "0":
            _lib_error = "disabled via METRPO_NATIVE=0"
            return None
        try:
            path = _build_library()
            lib = ctypes.CDLL(path)
            lib.metrpo_pool_create.argtypes = [ctypes.c_int]
            lib.metrpo_pool_create.restype = ctypes.c_void_p
            lib.metrpo_pool_destroy.argtypes = [ctypes.c_void_p]
            lib.metrpo_pool_destroy.restype = None
            u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
            f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            lib.metrpo_step_batch.argtypes = [
                ctypes.c_void_p, u64p, u64p, ctypes.c_int, f64p,
                ctypes.c_int, i32p,
            ]
            lib.metrpo_step_batch.restype = None
            lib.metrpo_step_batch_extract.argtypes = [
                ctypes.c_void_p, u64p, u64p, ctypes.c_int, f64p,
                ctypes.c_int, i32p, i32p, ctypes.c_int, ctypes.c_int,
                f64p, f64p, f64p, f64p,
            ]
            lib.metrpo_step_batch_extract.restype = None
            lib.metrpo_mujoco_version.restype = ctypes.c_int
            lib.metrpo_mujoco_version()  # smoke: resolves libmujoco symbols
            _lib = lib
        except Exception as exc:  # noqa: BLE001 — any failure => fallback
            _lib_error = f"{type(exc).__name__}: {exc}"
        return _lib


def native_available() -> bool:
    return _load() is not None


def native_error() -> Optional[str]:
    _load()
    return _lib_error


class NativeStepper:
    """Persistent thread pool stepping a fixed batch of MuJoCo envs.

    ``envs`` must each expose ``model``/``data`` (python ``mujoco`` binding
    objects) and ``FRAME_SKIP``; the pointer/frame-skip arrays are captured
    once at construction (the env set of a VecHostEnv is immutable).
    """

    def __init__(self, envs: List, n_threads: Optional[int] = None):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native stepper unavailable: {_lib_error}")
        self._lib = lib
        self._envs = list(envs)
        self._models = np.array([e.model._address for e in envs], np.uint64)
        self._datas = np.array([e.data._address for e in envs], np.uint64)
        self._frame_skip = np.array([e.FRAME_SKIP for e in envs], np.int32)
        nus = {int(e.model.nu) for e in envs}
        if len(nus) != 1:
            raise ValueError(f"heterogeneous action dims in pool: {nus}")
        self._nu = nus.pop()
        if n_threads is None:
            n_threads = max(1, min(len(envs), (os.cpu_count() or 1)))
        self._pool = lib.metrpo_pool_create(int(n_threads))

    def step_batch(self, actions: np.ndarray) -> None:
        """Advance all envs' physics by one env step (releases the GIL)."""
        acts = np.ascontiguousarray(actions, dtype=np.float64)
        if acts.shape != (len(self._envs), self._nu):
            raise ValueError(
                f"actions shape {acts.shape} != {(len(self._envs), self._nu)}")
        self._lib.metrpo_step_batch(
            self._pool, self._models, self._datas, len(self._envs), acts,
            self._nu, self._frame_skip)

    def step_batch_extract(self, actions: np.ndarray):
        """Step + batched state extraction: returns (qpos, qvel, com,
        comvel) as (B, nq), (B, nv), (B, 3), (B, 3) float64 views into
        buffers refreshed by the C++ workers (no per-env python MjData
        access). Copy if retaining across steps."""
        acts = np.ascontiguousarray(actions, dtype=np.float64)
        B = len(self._envs)
        if acts.shape != (B, self._nu):
            raise ValueError(
                f"actions shape {acts.shape} != {(B, self._nu)}")
        if not hasattr(self, "_qpos_buf"):
            e0 = self._envs[0]
            nqs = {int(e.model.nq) for e in self._envs}
            nvs = {int(e.model.nv) for e in self._envs}
            if len(nqs) != 1 or len(nvs) != 1:
                raise ValueError("heterogeneous state dims in pool")
            self._nq, self._nv = nqs.pop(), nvs.pop()
            self._torso_ids = np.array(
                [getattr(e, "_torso_id", 0) for e in self._envs], np.int32)
            self._qpos_buf = np.empty((B, self._nq), np.float64)
            self._qvel_buf = np.empty((B, self._nv), np.float64)
            self._com_buf = np.empty((B, 3), np.float64)
            self._comvel_buf = np.empty((B, 3), np.float64)
        self._lib.metrpo_step_batch_extract(
            self._pool, self._models, self._datas, B, acts, self._nu,
            self._frame_skip, self._torso_ids, self._nq, self._nv,
            self._qpos_buf, self._qvel_buf, self._com_buf, self._comvel_buf)
        return self._qpos_buf, self._qvel_buf, self._com_buf, self._comvel_buf

    def close(self):
        if getattr(self, "_pool", None):
            self._lib.metrpo_pool_destroy(self._pool)
            self._pool = None

    def __del__(self):  # best-effort; process teardown also reclaims
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
