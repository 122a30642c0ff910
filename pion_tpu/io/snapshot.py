"""Snapshot / checkpoint I/O.

Equivalent of the reference's Silo/FITS snapshot stack
(reference: source/dataIO/dataio_base.h:23-67; every snapshot is a full
restart file: header parameters + all prognostic fields, and restart
auto-detects the format — main.cpp:99-112).  Here a snapshot is a single
``.npz`` holding the primitive field array plus a JSON-encoded header with
the full SimConfig, so a restart reconstructs the identical run; sharded
arrays are gathered on save and re-sharded by the caller on load.
"""
from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Optional, Tuple

import numpy as np

from ..config import SimConfig

FORMAT_VERSION = 1


def _cfg_to_json(cfg: SimConfig) -> str:
    d = dataclasses.asdict(cfg)
    for k, v in d.items():
        if isinstance(v, enum.Enum):
            d[k] = v.value
        elif isinstance(v, tuple):
            d[k] = [
                [e.value if isinstance(e, enum.Enum) else e for e in x]
                if isinstance(x, tuple) else x
                for x in v
            ]
    return json.dumps(d)


def _cfg_from_json(s: str) -> SimConfig:
    d = json.loads(s)
    d["bcs"] = tuple(tuple(x) for x in d["bcs"])
    for k in ("shape", "xmin", "xmax"):
        d[k] = tuple(d[k])
    if d.get("ng_centre") is not None:
        d["ng_centre"] = tuple(d["ng_centre"])
    return SimConfig(**d)


_MAGIC = b"PTSNAP2\x00"


def save_snapshot(path: str, P, cfg: SimConfig, t: float, step: int = 0,
                  extra: Optional[dict] = None) -> str:
    """Write one snapshot; returns the final path.

    Fast path: the native multithreaded compressor (pion_tpu.native,
    libsnapio.so — the PMPIO-writer equivalent); falls back to
    numpy's savez_compressed when the native library is unavailable.
    """
    header = {
        "format_version": FORMAT_VERSION,
        "config": _cfg_to_json(cfg),
        "t": float(t),
        "step": int(step),
    }
    if extra:
        header["extra"] = extra
    P = np.asarray(P)
    expect = (cfg.nvar,) + cfg.shape
    if cfg.nlevels > 1:
        expect = (cfg.nlevels,) + expect
    if P.shape != expect:
        raise ValueError(
            f"snapshot state shape {P.shape} does not match the config "
            f"(nvar={cfg.nvar}, shape={cfg.shape}, nlevels={cfg.nlevels}; "
            f"expected {expect}) — the IC generator and SimConfig disagree")

    from .. import native

    blob = native.compress(P)
    if blob is not None:
        if not path.endswith(".snap"):
            path = path + ".snap"
        header["dtype"] = str(P.dtype)
        header["shape"] = list(P.shape)
        hj = json.dumps(header).encode()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(_MAGIC)
            f.write(len(hj).to_bytes(8, "little"))
            f.write(hj)
            f.write(blob)
        os.replace(tmp, path)  # atomic, like the checkpoint rotation
        return path

    if not path.endswith(".npz"):
        path = path + ".npz"
    arrays = {"P": P, "header": np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)}
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez_compressed(f, **arrays)
    os.replace(tmp, path)
    return path


class AsyncSnapshotWriter:
    """Background snapshot writer.

    The reference hides checkpoint latency behind PMPIO's grouped parallel
    writes (reference: dataIO/dataio_silo_MPI.cpp:7-17); here the same role
    is a host worker thread: the step loop hands off the already-fetched
    host array and keeps stepping while compression + disk I/O run behind
    it.  A bounded queue (default depth 2, matching the two rolling
    checkpoint files of sim_init.cpp:681-700) applies back-pressure when
    the disk cannot keep up.  Worker exceptions are re-raised on the next
    ``submit``/``wait``.
    """

    def __init__(self, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                save_snapshot(*item)
            except BaseException as e:  # surfaced on submit/wait
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, path: str, P, cfg: SimConfig, t: float,
               step: int = 0, extra: Optional[dict] = None):
        self._check()
        # materialize on the host NOW so the caller may mutate/rebind P
        self._q.put((path, np.asarray(P), cfg, float(t), int(step), extra))

    def wait(self):
        """Block until all submitted snapshots are on disk."""
        self._q.join()
        self._check()

    def close(self):
        self.wait()
        self._q.put(None)
        self._thread.join()


def load_snapshot(path: str) -> Tuple[SimConfig, np.ndarray, float, int]:
    """Back-compat loader: (cfg, P, t, step)."""
    cfg, P, t, step, _extra = load_snapshot_raw(path)
    return cfg, P, t, step


def load_snapshot_raw(
        path: str) -> Tuple[SimConfig, np.ndarray, float, int, Optional[dict]]:
    for suffix in ("", ".snap", ".npz"):
        if os.path.exists(path + suffix):
            path = path + suffix
            break
    with open(path, "rb") as f:
        magic = f.read(8)
    if magic == _MAGIC:
        from .. import native

        with open(path, "rb") as f:
            f.read(8)
            hlen = int.from_bytes(f.read(8), "little")
            header = json.loads(f.read(hlen).decode())
            blob = f.read()
        dtype = np.dtype(header["dtype"])
        shape = tuple(header["shape"])
        nbytes = dtype.itemsize * int(np.prod(shape))
        raw = native.decompress(blob, nbytes)
        if raw is None:
            raise IOError(f"native decompress failed for {path}")
        P = raw.view(dtype).reshape(shape)
    else:
        with np.load(path) as z:
            header = json.loads(bytes(z["header"]).decode())
            P = z["P"]
    cfg = _cfg_from_json(header["config"])
    return cfg, P, header["t"], header["step"], header.get("extra")
