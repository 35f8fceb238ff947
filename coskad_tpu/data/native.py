"""Native (C++) data-plane: build-on-demand loader + Python shim.

`parse_clip_json_native` is a drop-in replacement for the json.load-based
ingestion path (data/alphapose.py): the C++ extension single-passes the clip
JSON into per-person flat keypoint buffers; this shim reproduces the exact
ordering/merging semantics of the pure-Python path (lexicographic frame-key
row order, numeric frame-key window order, person-list merging where later
duplicate frame keys win, kp_threshold masking).

The extension is compiled on first use with g++ (no pip involved) into
native/_coskad_native.so and cached; everything degrades gracefully to the
pure-Python parser when no toolchain is available.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
import threading
from typing import List, Optional

import numpy as np

from .windows import PersonTrajectory

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "coskad_native.cpp")
_SO = os.path.join(_NATIVE_DIR, "_coskad_native.so")
_lock = threading.Lock()
_module = None
_build_failed = False


def _load_native():
    global _module, _build_failed
    if _module is not None or _build_failed:
        return _module
    with _lock:
        if _module is not None or _build_failed:
            return _module
        try:
            if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
            ):
                include = sysconfig.get_paths()["include"]
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     f"-I{include}", _SRC, "-o", _SO],
                    check=True, capture_output=True, text=True,
                )
            spec = importlib.util.spec_from_file_location("_coskad_native", _SO)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _module = mod
        except Exception as e:  # toolchain missing / build error
            print(f"[coskad] native parser unavailable ({e}); "
                  f"falling back to json.load", file=sys.stderr)
            _build_failed = True
    return _module


def native_available() -> bool:
    return _load_native() is not None


def parse_clip_json_native(
    path: str, kp_threshold: float = 0.0
) -> Optional[List[PersonTrajectory]]:
    """Parse a clip JSON with the C++ extension; None if unavailable."""
    mod = _load_native()
    if mod is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    persons = mod.parse_clip(raw)

    # Group buffers per person id. A duplicate TOP-LEVEL person key must
    # follow json.load semantics (the last occurrence wins entirely), while
    # the list-of-dicts form (already concatenated in file order by C++)
    # merges frames with later duplicates winning (dict.update).
    by_id = {}
    for pid, keys, kp_bytes, off_bytes, cnt_bytes in persons:
        kps = np.frombuffer(kp_bytes, dtype=np.float64)
        offsets = np.frombuffer(off_bytes, dtype=np.uint64)
        counts = np.frombuffer(cnt_bytes, dtype=np.uint64)
        entry = {}
        for key, off, cnt in zip(keys, offsets, counts):
            entry[key] = kps[int(off) : int(off) + int(cnt)]
        by_id[pid] = entry  # replace: last duplicate top-level key wins

    trajectories = []
    for pid in sorted(by_id.keys(), key=lambda x: int(x)):
        entry = by_id[pid]
        if not entry:  # zero-detection person: no windows; skip, like the
            continue   # Python path (tests/test_data_fuzz.py)
        lex_keys = sorted(entry.keys())  # lexicographic row order
        rows = []
        for key in lex_keys:
            kp = entry[key].reshape(-1, 3).copy()
            if kp_threshold > 0:
                low = kp[:, 2] < kp_threshold
                kp[low, :2] = 0.0
            rows.append(kp)
        keypoints = np.stack(rows, axis=0)
        numeric_keys = sorted(int(k) for k in lex_keys)
        trajectories.append(
            PersonTrajectory(
                person_id=int(pid), frame_keys=numeric_keys, keypoints=keypoints
            )
        )
    return trajectories


def load_csv_native(path: str):
    """Parse a Morais trajectory CSV into [rows, cols] float64 via the C++
    extension; None when unavailable."""
    mod = _load_native()
    if mod is None:
        return None
    with open(path, "rb") as f:
        raw = f.read()
    n_rows, n_cols, buf = mod.parse_csv(raw)
    if n_rows == 0:
        return np.empty((0, 0))
    return np.frombuffer(buf, dtype=np.float64).reshape(n_rows, n_cols)


def load_csv_files_native(paths: List[str], n_threads: int = 0):
    """Read + parse many Morais trajectory CSVs with IO and parsing off the
    GIL on a C++ thread pool; returns [rows, cols] float64 arrays aligned
    with `paths` (caller keeps its own enumeration order), or None when the
    extension is unavailable. n_threads<=0 means hardware concurrency."""
    mod = _load_native()
    if mod is None or not hasattr(mod, "parse_csv_files"):
        return None
    out = []
    for n_rows, n_cols, buf in mod.parse_csv_files(list(paths), n_threads):
        if n_rows == 0:
            out.append(np.empty((0, 0)))
        else:
            out.append(np.frombuffer(buf, dtype=np.float64).reshape(
                n_rows, n_cols))
    return out
