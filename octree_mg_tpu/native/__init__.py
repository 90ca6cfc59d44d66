"""ctypes loader for the native tree-construction kernels.

Builds ``treebuild.cpp`` into a shared object on first use (g++ -O2) and
caches it next to the source.  All entry points degrade gracefully: if
the toolchain or library is unavailable, core/tree.py falls back to its
NumPy implementation.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "treebuild.cpp")
_SO = os.path.join(_HERE, "libtreebuild.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.omg_abi_version.restype = ctypes.c_int
        lib.omg_add_children_bulk.restype = ctypes.c_int64
        lib.omg_add_children_bulk.argtypes = [
            ctypes.c_int, ctypes.c_int64, i64p, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p, i64p]
        lib.omg_set_neighbors_lvl.restype = None
        lib.omg_set_neighbors_lvl.argtypes = [
            ctypes.c_int, i64p, ctypes.c_int64,
            i64p, i64p, i64p, i64p, i64p, i64p]
        lib.omg_ref_bnds.restype = ctypes.c_int64
        lib.omg_ref_bnds.argtypes = [
            ctypes.c_int, i64p, ctypes.c_int64, i64p, i64p, i64p]
        lib.omg_balance_simple.restype = None
        lib.omg_balance_simple.argtypes = [i64p, ctypes.c_int64,
                                           ctypes.c_int64, i64p]
        if lib.omg_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def _ptr(a: np.ndarray):
    assert a.dtype == np.int64 and a.flags["C_CONTIGUOUS"]
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def add_children_bulk(tree, parent_ids: np.ndarray) -> bool:
    """Native bulk mg_add_children over a list of parents; returns False
    if the native path is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    n_new = len(parent_ids) * (1 << tree.ndim)
    tree._reserve(tree.n_boxes + n_new)
    pid = np.ascontiguousarray(parent_ids, dtype=np.int64)
    tree.n_boxes = int(lib.omg_add_children_bulk(
        tree.ndim, tree.n_boxes, _ptr(pid), len(pid),
        _ptr(tree.ix), _ptr(tree.lvl), _ptr(tree.parent),
        _ptr(tree.children), _ptr(tree.neighbors), _ptr(tree.rank)))
    return True


def set_neighbors_lvl(tree, ids: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    lib.omg_set_neighbors_lvl(
        tree.ndim, _ptr(ids), len(ids),
        _ptr(tree.ix), _ptr(tree.lvl), _ptr(tree.parent),
        _ptr(tree.children), _ptr(tree.neighbors), _ptr(tree.rank))
    return True


def ref_bnds(tree, leaves: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    leaves = np.ascontiguousarray(leaves, dtype=np.int64)
    out = np.empty(len(leaves), dtype=np.int64)
    k = int(lib.omg_ref_bnds(tree.ndim, _ptr(leaves), len(leaves),
                             _ptr(tree.children), _ptr(tree.neighbors),
                             _ptr(out)))
    return out[:k].copy()


def balance_simple(ids: np.ndarray, n_ranks: int, rank_arr: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    lib.omg_balance_simple(_ptr(ids), len(ids), n_ranks, _ptr(rank_arr))
    return True
