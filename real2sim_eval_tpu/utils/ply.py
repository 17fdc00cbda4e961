"""PLY / .splat I/O for Gaussian-splat scans, numpy-native.

Replaces the reference's ``plyfile``-based GSProcessor load/save
(reference: sim/utils/gs/gs_processor.py:59-100,139-207). Instead of
per-property python loops we parse the header once and map the whole binary
payload as a structured numpy array in a single read; an optional C++ loader
(native/ply_loader.cpp) accelerates huge scans further via ctypes.

The on-disk layout is the standard 3DGS checkpoint: per-vertex
``x y z [nx ny nz] f_dc_0..2 f_rest_0..44 opacity scale_0..2 rot_0..3``.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

_PLY_TO_NP = {
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
}


def read_ply_vertex_table(path: str | Path) -> dict[str, np.ndarray]:
    """Read the ``vertex`` element of a PLY file into {property: (N,) array}."""
    with open(path, "rb") as f:
        magic = f.readline().strip()
        if magic != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements: list[tuple[str, int, list[tuple[str, str]]]] = []
        cur_props: list[tuple[str, str]] = []
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: unexpected EOF in header")
            tokens = line.decode("ascii", "replace").strip().split()
            if not tokens:
                continue
            if tokens[0] == "format":
                fmt = tokens[1]
            elif tokens[0] == "comment":
                continue
            elif tokens[0] == "element":
                cur_props = []
                elements.append((tokens[1], int(tokens[2]), cur_props))
            elif tokens[0] == "property":
                if tokens[1] == "list":
                    cur_props.append((tokens[-1], f"list:{tokens[2]}:{tokens[3]}"))
                else:
                    cur_props.append((tokens[2], _PLY_TO_NP[tokens[1]]))
            elif tokens[0] == "end_header":
                break
        if fmt is None:
            raise ValueError(f"{path}: missing format line")

        out: dict[str, np.ndarray] = {}
        for name, count, props in elements:
            has_list = any(t.startswith("list:") for _, t in props)
            if name == "vertex":
                if has_list:
                    raise ValueError("list properties unsupported on vertex element")
                if fmt == "ascii":
                    data = np.loadtxt(f, max_rows=count, dtype=np.float64)
                    data = np.atleast_2d(data)
                    for i, (pname, _) in enumerate(props):
                        out[pname] = data[:, i]
                else:
                    endian = "<" if "little" in fmt else ">"
                    dtype = np.dtype([(p, endian + t) for p, t in props])
                    buf = f.read(dtype.itemsize * count)
                    table = np.frombuffer(buf, dtype=dtype, count=count)
                    for pname, _ in props:
                        out[pname] = np.ascontiguousarray(table[pname])
                return out
            else:
                # skip non-vertex elements preceding vertex
                if fmt == "ascii":
                    for _ in range(count):
                        f.readline()
                elif has_list:
                    raise ValueError("cannot skip binary list element before vertex")
                else:
                    endian = "<" if "little" in fmt else ">"
                    dtype = np.dtype([(p, endian + t) for p, t in props])
                    f.seek(dtype.itemsize * count, 1)
    raise ValueError(f"{path}: no vertex element found")


_LOAD_CACHE: dict = {}

# ---------------------------------------------------------------------------
# optional native fast path (native/ply_loader.cpp via ctypes)
# ---------------------------------------------------------------------------

_NATIVE = None


def _native_lib():
    """Load (and lazily build) the C++ loader; None if unavailable."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE or None
    import ctypes
    import os
    import subprocess

    if os.environ.get("R2S_NATIVE", "1") == "0":
        _NATIVE = False
        return None
    so = Path(__file__).resolve().parents[2] / "native" / "libr2s_native.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(so.parent)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _NATIVE = False
            return None
    try:
        lib = ctypes.CDLL(str(so))
        lib.ply_probe.restype = ctypes.c_int
        lib.ply_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_long),
                                  ctypes.POINTER(ctypes.c_int),
                                  ctypes.c_char_p, ctypes.c_long]
        lib.ply_read.restype = ctypes.c_int
        lib.ply_read.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_float)]
        _NATIVE = lib
        return lib
    except OSError:
        _NATIVE = False
        return None


def _read_vertex_table_native(path) -> dict[str, np.ndarray] | None:
    import ctypes

    lib = _native_lib()
    if lib is None:
        return None
    n_verts = ctypes.c_long()
    n_props = ctypes.c_int()
    names_buf = ctypes.create_string_buffer(16384)
    p = str(path).encode()
    if lib.ply_probe(p, ctypes.byref(n_verts), ctypes.byref(n_props),
                     names_buf, len(names_buf)):
        return None
    out = np.empty((n_verts.value, n_props.value), np.float32)
    if lib.ply_read(p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))):
        return None
    names = names_buf.value.decode().split(",")
    return {name: out[:, i] for i, name in enumerate(names)}


def read_ply_table(path: str | Path) -> tuple[dict[str, np.ndarray], int]:
    """Raw vertex property table of a PLY (native reader with Python
    fallback). Returns (name -> (N,) float32 column, N)."""
    t = _read_vertex_table_native(path)
    if t is None:
        t = read_ply_vertex_table(path)
    return t, len(t["x"])


def load_gaussian_ply(path: str | Path, max_sh_degree: int = 3) -> dict[str, np.ndarray]:
    """Load a 3DGS PLY into raw (pre-activation) splat parameters.

    Returns the same keys the reference's ``GSProcessor.load`` produces
    (gs_processor.py:93-100): means3D (N,3), sh_colors (N, 3*(D+1)^2 laid out
    dc0..2 then f_rest row-major), log_scales (N,3), unnorm_rotations (N,4),
    logit_opacities (N,1). All float32.

    Results are cached by (path, mtime) — scans are re-read every episode
    reset (gs_renderer.py:336-337) and are large; callers must not mutate
    the returned arrays (the pipeline copies on transform).
    """
    key = (str(path), Path(path).stat().st_mtime_ns)
    if key in _LOAD_CACHE:
        return _LOAD_CACHE[key]
    t = _read_vertex_table_native(path)
    if t is None:
        t = read_ply_vertex_table(path)
    n = len(t["x"])
    means = np.stack([t["x"], t["y"], t["z"]], axis=-1).astype(np.float32)

    n_rest = len([k for k in t if k.startswith("f_rest_")])
    sh = np.zeros((n, 3 + n_rest), dtype=np.float32)
    sh[:, 0] = t["f_dc_0"]
    sh[:, 1] = t["f_dc_1"]
    sh[:, 2] = t["f_dc_2"]
    for i in range(n_rest):
        sh[:, 3 + i] = t[f"f_rest_{i}"]

    n_scale = len([k for k in t if k.startswith("scale_")])
    scales = np.stack([t[f"scale_{i}"] for i in range(n_scale)], axis=-1).astype(np.float32)
    if n_scale == 1:
        scales = np.repeat(scales, 3, axis=-1)

    rots = np.stack([t[f"rot_{i}"] for i in range(4)], axis=-1).astype(np.float32)
    opac = np.asarray(t["opacity"], dtype=np.float32)[:, None]

    out = {
        "means3D": means,
        "sh_colors": sh,
        "log_scales": scales,
        "unnorm_rotations": rots,
        "logit_opacities": opac,
    }
    _LOAD_CACHE[key] = out
    return out


def sh_colors_to_coeffs(sh_colors: np.ndarray) -> np.ndarray:
    """(N, 3*(D+1)^2) flat layout -> (N, (D+1)^2, 3) coefficient tensor.

    Mirrors the reshape at reference gs_renderer.py:414-418: the first 3
    entries are the DC color, the remaining 3*K entries are stored as
    (3, K) and transposed to (K, 3).
    """
    n, total = sh_colors.shape
    dc = sh_colors[:, :3][:, None, :]
    rest = sh_colors[:, 3:].reshape(n, 3, -1).transpose(0, 2, 1)
    return np.concatenate([dc, rest], axis=1).astype(np.float32)


def coeffs_to_sh_colors(coeffs: np.ndarray) -> np.ndarray:
    n, k, _ = coeffs.shape
    dc = coeffs[:, 0, :]
    rest = coeffs[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    return np.concatenate([dc, rest], axis=1).astype(np.float32)


def save_gaussian_ply(params: dict[str, np.ndarray], path: str | Path) -> None:
    """Write raw splat params back to a binary-little-endian 3DGS PLY."""
    means = np.asarray(params["means3D"], np.float32)
    sh = np.asarray(params["sh_colors"], np.float32)
    if sh.ndim == 3:
        sh = coeffs_to_sh_colors(sh)
    log_scales = np.asarray(params["log_scales"], np.float32)
    rots = np.asarray(params["unnorm_rotations"], np.float32)
    opac = np.asarray(params["logit_opacities"], np.float32).reshape(-1, 1)

    n = means.shape[0]
    n_rest = sh.shape[1] - 3
    names = (
        ["x", "y", "z", "f_dc_0", "f_dc_1", "f_dc_2"]
        + [f"f_rest_{i}" for i in range(n_rest)]
        + ["opacity", "scale_0", "scale_1", "scale_2", "rot_0", "rot_1", "rot_2", "rot_3"]
    )
    dtype = np.dtype([(nm, "<f4") for nm in names])
    table = np.empty(n, dtype=dtype)
    cols = np.concatenate([means, sh, opac, log_scales, rots], axis=1)
    for i, nm in enumerate(names):
        table[nm] = cols[:, i]

    header = "ply\nformat binary_little_endian 1.0\n"
    header += f"element vertex {n}\n"
    header += "".join(f"property float {nm}\n" for nm in names)
    header += "end_header\n"
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(table.tobytes())


def save_splat(params: dict[str, np.ndarray], path: str | Path,
               center: bool = True, rotate: bool = True) -> None:
    """Export to the antimatter15 ``.splat`` byte format
    (reference: gs_processor.py:173-207)."""
    from .sh import C0

    pts = np.asarray(params["means3D"], np.float32).copy()
    sh = np.asarray(params["sh_colors"], np.float32)
    if sh.ndim == 3:
        sh = coeffs_to_sh_colors(sh)
    scales = np.exp(np.asarray(params["log_scales"], np.float32))
    rots = np.asarray(params["unnorm_rotations"], np.float32)
    rots = rots / np.maximum(np.linalg.norm(rots, axis=-1, keepdims=True), 1e-12)
    opac = 1.0 / (1.0 + np.exp(-np.asarray(params["logit_opacities"], np.float32)))
    opac = opac.reshape(-1, 1)

    if center:
        pts -= pts.mean(axis=0)
    if rotate:
        # undo the z-up convention for web viewers (y-up)
        rot_x = np.linalg.inv(np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32))
        pts = pts @ rot_x.T
        w = np.sqrt(np.maximum(1 + rot_x[0, 0] + rot_x[1, 1] + rot_x[2, 2], 1e-12)) / 2
        rq = np.array([w,
                       (rot_x[2, 1] - rot_x[1, 2]) / (4 * w),
                       (rot_x[0, 2] - rot_x[2, 0]) / (4 * w),
                       (rot_x[1, 0] - rot_x[0, 1]) / (4 * w)], np.float32)
        w1, x1, y1, z1 = rq
        w2, x2, y2, z2 = rots[:, 0], rots[:, 1], rots[:, 2], rots[:, 3]
        rots = np.stack([
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ], axis=-1)

    color = np.concatenate([0.5 + C0 * sh[:, :3], opac], axis=1)
    color_u8 = np.clip(color * 255, 0, 255).astype(np.uint8)
    rot_u8 = np.clip(
        rots / np.maximum(np.linalg.norm(rots, axis=-1, keepdims=True), 1e-12) * 128 + 128,
        0, 255).astype(np.uint8)

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        for i in range(pts.shape[0]):
            f.write(struct.pack("<3f", *pts[i]))
            f.write(struct.pack("<3f", *scales[i]))
            f.write(color_u8[i].tobytes())
            f.write(rot_u8[i].tobytes())
