"""Independent numpy oracle: a literal, loop-based re-statement of the
reference renderer's per-frame semantics (citations into /root/reference),
used to cross-check the vectorised/Pallas implementations.

Deliberately written with explicit per-gaussian / per-pixel loops and no
code shared with the package under test.
"""

from __future__ import annotations

import math

import numpy as np

TILE = 16


def quat_to_rot(q):
    """(x, y, z, w) -> 3x3 row-major rotation (transform.hpp:188-212)."""
    x, y, z, w = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def sh_color(sh, direction, deg):
    """SH -> RGB per sh.hpp:30-138 + sh_preprocessor.cpp:150-153."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
          -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
          0.3731763325901154, -0.4570457994644658, 1.445305721320277,
          -0.5900435899266435]
    x, y, z = direction
    res = C0 * sh[0]
    if deg > 0:
        res = res - C1 * y * sh[1] + C1 * z * sh[2] - C1 * x * sh[3]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, zx = x * y, y * z, z * x
        res = (res + C2[0] * xy * sh[4] + C2[1] * yz * sh[5]
               + C2[2] * (2 * zz - xx - yy) * sh[6]
               + C2[3] * zx * sh[7] + C2[4] * (xx - yy) * sh[8])
    if deg > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        res = (res + C3[0] * y * (3 * xx - yy) * sh[9]
               + C3[1] * xy * z * sh[10]
               + C3[2] * y * (4 * zz - xx - yy) * sh[11]
               + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
               + C3[4] * x * (4 * zz - xx - yy) * sh[13]
               + C3[5] * z * (xx - yy) * sh[14]
               + C3[6] * x * (xx - 3 * yy) * sh[15])
    return np.clip(res + 0.5, 0.0, 1.0)


def camera_mats(cam):
    """view 4x4 + derived quantities from a package Camera object."""
    r, u, f = np.array(cam.right), np.array(cam.up), np.array(cam.front)
    p = np.array(cam.position)
    view = np.eye(4)
    view[0, :3], view[1, :3], view[2, :3] = r, u, f
    view[:3, 3] = -view[:3, :3] @ p
    tanfovy = math.tan(math.radians(cam.fov) * 0.5)
    tanfovx = tanfovy * cam.width / cam.height
    return view, tanfovx, tanfovy


def project_one(mean, scale, quat_xyzw, view, tanfovx, tanfovy, W, H,
                ewa_mode="inria", near=0.2, lowpass=0.3, use_focal=True):
    """Project a single gaussian; returns None if culled.

    Follows gs_projector/shader.cpp:82-139 (focal variant) and the
    conic/radius part of gs_tile_splatter/shader.cpp:102-163. With
    use_focal=False it ports shad_project_gs (shader.cpp:18-80): a
    unit-focal Jacobian rescaled by 1/tanfov^2, then allocate_tiles'
    res^2/4 rescale (shader.cpp:132-138) — keeping the reference's
    cov.z factor of H*W/4 rather than H^2/4.
    """
    p_view = view[:3, :3] @ mean + view[:3, 3]
    if p_view[2] < near:
        return None
    fx = W / (2 * tanfovx)
    fy = H / (2 * tanfovy)
    inv_w = 1.0 / (p_view[2] + 1e-6)
    ndc = np.array([p_view[0] / tanfovx * inv_w, p_view[1] / tanfovy * inv_w])
    pix = ((ndc + 1) * np.array([W, H]) - 1) / 2

    R = quat_to_rot(quat_xyzw)
    M = R @ np.diag(scale)
    cov3d = M @ M.T

    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tz = p_view[2]
    tx = np.clip(p_view[0] / tz, -limx, limx) * tz
    ty = np.clip(p_view[1] / tz, -limy, limy) * tz

    jx, jy = (fx, fy) if use_focal else (1.0, 1.0)
    J = np.array(
        [
            [jx / tz, 0, -jx * tx / (tz * tz)],
            [0, jy / tz, -jy * ty / (tz * tz)],
            [0, 0, 0],
        ]
    )
    V3 = view[:3, :3]
    if ewa_mode == "inria":
        cov = J @ V3 @ cov3d @ V3.T @ J.T
    else:  # "lcgs": reference gaussian.hpp:52-70 after unfolding col-major
        cov = J @ V3.T @ cov3d @ V3 @ J.T
    a, b, c = cov[0, 0], cov[0, 1], cov[1, 1]
    if not use_focal:
        # projector rescale to NDC units (shader.cpp:73-76) ...
        a, b, c = a / (tanfovx * tanfovx), b / (tanfovx * tanfovy), c / (tanfovy * tanfovy)
        # ... then allocate_tiles' pixel rescale (shader.cpp:132-138);
        # note c uses res.y*res.x = H*W/4 in the reference.
        a, b, c = a * W * W * 0.25, b * W * H * 0.25, c * H * W * 0.25
    a, c = a + lowpass, c + lowpass
    det = a * c - b * b
    conic = np.array([c, -b, a]) / (det + 1e-6)
    mid = 0.5 * (a + c)
    lam = mid + math.sqrt(max(0.1, mid * mid - det))
    radius = math.ceil(3.0 * math.sqrt(lam))
    return dict(pix=pix, depth=p_view[2], conic=conic, radius=radius)


def tile_rect(pix, radius, grid_x, grid_y, mode="inria"):
    """[min, max) tile rect (module.cpp:29-35 / graphdeco variant)."""
    lo_x = int(math.floor((pix[0] - radius) / TILE))
    lo_y = int(math.floor((pix[1] - radius) / TILE))
    hi_x = int(math.floor((pix[0] + radius + TILE - 1) / TILE))
    hi_y = int(math.floor((pix[1] + radius + TILE - 1) / TILE))
    if mode == "lcgs":
        mx_hi, my_hi = grid_x - 1, grid_y - 1
    else:
        mx_hi, my_hi = grid_x, grid_y
    return (
        (min(max(lo_x, 0), grid_x - 1), min(max(lo_y, 0), grid_y - 1)),
        (min(max(hi_x, 0), mx_hi), min(max(hi_y, 0), my_hi)),
    )


def oracle_render(scene, cam, bg=(0.0, 0.0, 0.0), sh_degree=3,
                  ewa_mode="inria", rect_mode="inria"):
    """Full-frame render with sequential per-pixel blending
    (gs_tile_splatter/shader.cpp:167-289 semantics).

    Returns (image (3, H, W), transmittance (H, W)).
    """
    means = np.asarray(scene.means, np.float64)
    scales = np.asarray(scene.scales, np.float64)
    quats = np.asarray(scene.quats, np.float64)
    opac = np.asarray(scene.opacities, np.float64)
    sh = np.asarray(scene.sh, np.float64)
    W, H = cam.width, cam.height
    view, tanfovx, tanfovy = camera_mats(cam)
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE

    cam_pos = np.array(cam.position)
    splats = []
    for i in range(means.shape[0]):
        p = project_one(means[i], scales[i], quats[i], view, tanfovx,
                        tanfovy, W, H, ewa_mode)
        if p is None:
            continue
        d = means[i] - cam_pos
        d = d / np.linalg.norm(d)
        color = sh_color(sh[i], d, sh_degree)
        p.update(color=color, idx=i, opacity=opac[i])
        splats.append(p)

    # bin: per tile, entries sorted by (depth, emission order); emission
    # order is gaussian index (stable radix sort over per-gaussian offsets)
    tiles = {}
    for order, s in enumerate(splats):
        (x0, y0), (x1, y1) = tile_rect(s["pix"], s["radius"], grid_x, grid_y,
                                       rect_mode)
        for ty in range(y0, y1):
            for tx in range(x0, x1):
                tiles.setdefault((tx, ty), []).append(order)
    for key in tiles:
        tiles[key].sort(key=lambda o: (np.float32(splats[o]["depth"]), o))

    img = np.zeros((3, H, W))
    trans = np.ones((H, W))
    bg = np.asarray(bg, np.float64)
    for (tx, ty), entry in tiles.items():
        for py in range(ty * TILE, min((ty + 1) * TILE, H)):
            for px in range(tx * TILE, min((tx + 1) * TILE, W)):
                T = 1.0
                C = np.zeros(3)
                for o in entry:
                    s = splats[o]
                    d = s["pix"] - np.array([px, py], np.float64)
                    A, B, Cc = s["conic"]
                    power = -0.5 * (A * d[0] * d[0] + Cc * d[1] * d[1]) - B * d[0] * d[1]
                    if power > 0:
                        continue
                    alpha = min(0.99, s["opacity"] * math.exp(power))
                    if alpha < 1.0 / 255.0:
                        continue
                    test_T = T * (1 - alpha)
                    if test_T < 1e-4:
                        break
                    C += T * alpha * s["color"]
                    T = test_T
                img[:, py, px] = C
                trans[py, px] = T
    img += bg[:, None, None] * trans[None]
    return img, trans
