"""3DGS PLY scene IO.

Replaces the reference's vendored happly reader + host-side activation loop
(app/gaussians.cpp:75-171, app/happly.h). The hot path — binary PLY — is
parsed with a zero-copy numpy structured-dtype view (and optionally the
native C++ loader in native/, when built); activations are applied
vectorised exactly as the reference does element-wise at load:
sigmoid(opacity), exp(scale), normalize(rotation) (gaussians.cpp:137-168).

Property schema (gaussians.cpp:84-90): x y z [nx ny nz] f_dc_0..2
f_rest_0..(3*((d+1)^2-1)-1) opacity scale_0..2 rot_0..3, with rot stored
(w, x, y, z). f_rest is channel-major: f_rest[c*(K-1) + k] is coefficient
k+1 of channel c (gaussians.cpp:124-135).
"""

from __future__ import annotations

import io
import os
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianScene

_PLY_TO_NP = {
    "float": "<f4",
    "float32": "<f4",
    "double": "<f8",
    "float64": "<f8",
    "int": "<i4",
    "int32": "<i4",
    "uint": "<u4",
    "uint32": "<u4",
    "short": "<i2",
    "ushort": "<u2",
    "char": "i1",
    "int8": "i1",
    "uchar": "u1",
    "uint8": "u1",
}


def _parse_header(f) -> Tuple[str, int, List[Tuple[str, str]], int]:
    """Returns (format, vertex_count, [(name, np_dtype)], data_offset)."""
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    count = 0
    props: List[Tuple[str, str]] = []
    in_vertex = False
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unexpected EOF in PLY header")
        tok = line.strip().split()
        if not tok:
            continue
        if tok[0] == b"format":
            fmt = tok[1].decode()
        elif tok[0] == b"element":
            in_vertex = tok[1] == b"vertex"
            if in_vertex:
                count = int(tok[2])
        elif tok[0] == b"property" and in_vertex:
            if tok[1] == b"list":
                raise ValueError("list properties unsupported in vertex element")
            props.append((tok[2].decode(), _PLY_TO_NP[tok[1].decode()]))
        elif tok[0] == b"end_header":
            break
    if fmt is None:
        raise ValueError("PLY missing format line")
    return fmt, count, props, f.tell()


def _read_vertex_table(path: str) -> Tuple[Dict[str, np.ndarray], int]:
    with open(path, "rb") as f:
        fmt, count, props, offset = _parse_header(f)
        names = [n for n, _ in props]
        if fmt == "binary_little_endian":
            dtype = np.dtype([(n, d) for n, d in props])
            raw = np.fromfile(f, dtype=dtype, count=count)
            cols = {n: np.ascontiguousarray(raw[n]) for n in names}
        elif fmt == "ascii":
            data = np.loadtxt(f, dtype=np.float64, max_rows=count, ndmin=2)
            cols = {n: data[:, i].astype(np.float32) for i, n in enumerate(names)}
        elif fmt == "binary_big_endian":
            dtype = np.dtype([(n, d.replace("<", ">")) for n, d in props])
            raw = np.fromfile(f, dtype=dtype, count=count)
            cols = {n: np.ascontiguousarray(raw[n]) for n in names}
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    return cols, count


def load_ply(
    path: str | os.PathLike,
    apply_activations: bool = True,
    use_native: bool = True,
) -> GaussianScene:
    """Load a 3DGS checkpoint PLY into an activated GaussianScene.

    With apply_activations=False the raw stored values are returned in the
    same container (useful to build GaussianParams for fine-tuning).

    The native C++ loader (native/ply_loader.cpp) handles the standard
    binary schema; anything else takes the numpy path below.
    """
    path = os.fspath(path)
    if use_native:
        from .native import load_gsply_native

        out = load_gsply_native(path, apply_activations)
        if out is not None:
            means, sh, opacity, scales, quats = out
            return GaussianScene(
                means=jnp.asarray(means),
                scales=jnp.asarray(scales),
                quats=jnp.asarray(quats),
                opacities=jnp.asarray(opacity),
                sh=jnp.asarray(sh),
            )

    cols, n = _read_vertex_table(path)

    def grab(names):
        return np.stack([cols[x].astype(np.float32) for x in names], axis=1)

    means = grab(["x", "y", "z"])
    dc = grab(["f_dc_0", "f_dc_1", "f_dc_2"])[:, None, :]  # (N, 1, 3)

    n_rest = len([k for k in cols if k.startswith("f_rest_")])
    if n_rest % 3 != 0:
        raise ValueError(f"f_rest count {n_rest} not divisible by 3")
    k_rest = n_rest // 3
    if n_rest:
        rest = grab([f"f_rest_{i}" for i in range(n_rest)])  # (N, 3*(K-1))
        # channel-major storage -> (N, K-1, 3)
        rest = rest.reshape(n, 3, k_rest).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    sh = np.concatenate([dc, rest], axis=1)

    opacity = cols["opacity"].astype(np.float32)
    scales = grab(["scale_0", "scale_1", "scale_2"])
    quat_wxyz = grab(["rot_0", "rot_1", "rot_2", "rot_3"])
    quats = quat_wxyz[:, [1, 2, 3, 0]]  # -> (x, y, z, w)

    if apply_activations:
        opacity = 1.0 / (1.0 + np.exp(-opacity))
        scales = np.exp(scales)
        quats = quats / np.linalg.norm(quats, axis=1, keepdims=True)

    return GaussianScene(
        means=jnp.asarray(means),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        opacities=jnp.asarray(opacity),
        sh=jnp.asarray(sh),
    )


def save_ply(
    scene: GaussianScene,
    path: str | os.PathLike,
    invert_activations: bool = True,
    fmt: str = "binary",
):
    """Write a GaussianScene as a graphdeco-compatible PLY.

    With invert_activations=True (default) the stored values are
    pre-activation (log scale, logit opacity, raw quats), so the file
    round-trips through load_ply and is readable by standard 3DGS viewers.

    fmt: "binary" (little-endian, the hot path) or "ascii" — both sides
    of the vendored happly writer the reference app links
    (app/happly.h; gaussians.cpp writes no PLY, but happly supports both).
    """
    n = scene.num_gaussians
    means = np.asarray(scene.means, np.float32)
    sh = np.asarray(scene.sh, np.float32)
    k = sh.shape[1]
    dc = sh[:, 0, :]
    rest = sh[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)  # channel-major
    opacity = np.asarray(scene.opacities, np.float32)
    scales = np.asarray(scene.scales, np.float32)
    quats = np.asarray(scene.quats, np.float32)

    if invert_activations:
        op = np.clip(opacity, 1e-6, 1 - 1e-6)
        opacity = np.log(op) - np.log1p(-op)
        scales = np.log(np.maximum(scales, 1e-12))
    quat_wxyz = quats[:, [3, 0, 1, 2]]

    names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(3 * (k - 1))]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    table = np.concatenate(
        [
            means,
            np.zeros((n, 3), np.float32),
            dc,
            rest,
            opacity[:, None],
            scales,
            quat_wxyz,
        ],
        axis=1,
    ).astype("<f4")

    if fmt not in ("binary", "ascii"):
        raise ValueError(f"unsupported PLY write format {fmt!r}")
    header = io.BytesIO()
    header.write(b"ply\n")
    header.write(
        b"format binary_little_endian 1.0\n"
        if fmt == "binary"
        else b"format ascii 1.0\n"
    )
    header.write(f"element vertex {n}\n".encode())
    for name in names:
        header.write(f"property float {name}\n".encode())
    header.write(b"end_header\n")
    with open(os.fspath(path), "wb") as f:
        f.write(header.getvalue())
        if fmt == "binary":
            table.tofile(f)
        else:
            np.savetxt(f, table, fmt="%.9g")
