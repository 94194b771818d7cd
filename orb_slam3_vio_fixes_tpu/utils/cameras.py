"""Camera models: pin-hole and Kannala-Brandt8 equidistant fisheye.

TPU-native replacement for the reference's GeometricCamera hierarchy
(reference: include/CameraModels/GeometricCamera.h:61-89,
src/CameraModels/Pinhole.cpp, src/CameraModels/KannalaBrandt8.cpp:28-98 for
the theta-polynomial projection and the Newton unprojection at :111+).

Instead of virtual dispatch on a camera object, a camera is a plain pytree
(`Camera` NamedTuple) with a `kind` static field; all math is batched and
jittable over arbitrary leading dims. `project`/`unproject`/`project_jac`
cover the abstract interface; two-view reconstruction and matched-ray
triangulation live in ops/ (twoview.py, triangulate.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PINHOLE = 0
KB8 = 1  # Kannala-Brandt 8-parameter (fx fy cx cy k1 k2 k3 k4)


class Camera(NamedTuple):
    """Camera intrinsics as a pytree.

    fx, fy, cx, cy: scalars (jnp).  dist: (4,) KB8 coefficients k1..k4
    (zeros for pinhole).  kind: python int (static — selects the model at
    trace time, so each jitted pipeline specializes to its camera model the
    way the reference specializes via virtual dispatch).
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    dist: jax.Array
    kind: int = PINHOLE

    @staticmethod
    def pinhole(fx, fy, cx, cy) -> "Camera":
        f32 = jnp.float32
        return Camera(f32(fx), f32(fy), f32(cx), f32(cy), jnp.zeros(4, f32), PINHOLE)

    @staticmethod
    def kb8(fx, fy, cx, cy, k1, k2, k3, k4) -> "Camera":
        f32 = jnp.float32
        return Camera(
            f32(fx), f32(fy), f32(cx), f32(cy), jnp.array([k1, k2, k3, k4], f32), KB8
        )

    @property
    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx]),
                jnp.stack([z, self.fy, self.cy]),
                jnp.stack([z, z, o]),
            ]
        )


jax.tree_util.register_pytree_node(
    Camera,
    lambda c: ((c.fx, c.fy, c.cx, c.cy, c.dist), c.kind),
    lambda kind, leaves: Camera(*leaves, kind=kind),
)


def _kb8_theta_d(theta: jax.Array, dist: jax.Array) -> jax.Array:
    """d(theta) = theta + k1 th^3 + k2 th^5 + k3 th^7 + k4 th^9
    (reference semantics: src/CameraModels/KannalaBrandt8.cpp:40-47)."""
    t2 = theta * theta
    return theta * (1.0 + t2 * (dist[0] + t2 * (dist[1] + t2 * (dist[2] + t2 * dist[3]))))


def project(cam: Camera, pc: jax.Array) -> jax.Array:
    """Camera-frame 3D points (..., 3) -> pixels (..., 2).

    Pinhole: standard perspective.  KB8: equidistant theta-polynomial.
    Points behind the camera still produce finite values (callers gate on
    depth separately, as the reference does via isInFrustum checks).
    """
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    if cam.kind == PINHOLE:
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = cam.fx * x * inv_z + cam.cx
        v = cam.fy * y * inv_z + cam.cy
        return jnp.stack([u, v], axis=-1)
    # KB8
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    d = _kb8_theta_d(theta, cam.dist)
    scale = d / jnp.maximum(r, 1e-9)
    u = cam.fx * x * scale + cam.cx
    v = cam.fy * y * scale + cam.cy
    # Degenerate r -> 0 (optical axis): project to principal point.
    on_axis = r < 1e-9
    u = jnp.where(on_axis, cam.cx + jnp.zeros_like(u), u)
    v = jnp.where(on_axis, cam.cy + jnp.zeros_like(v), v)
    return jnp.stack([u, v], axis=-1)


def unproject(cam: Camera, uv: jax.Array) -> jax.Array:
    """Pixels (..., 2) -> unit-depth bearing (..., 3) with z normalized to 1
    for pinhole, and unit-norm ray direction scaled so z=1-equivalent for KB8
    via fixed-iteration Newton inversion of d(theta)
    (reference semantics: src/CameraModels/KannalaBrandt8.cpp:111+ which also
    uses an iterative theta solve)."""
    mx = (uv[..., 0] - cam.cx) / cam.fx
    my = (uv[..., 1] - cam.cy) / cam.fy
    if cam.kind == PINHOLE:
        return jnp.stack([mx, my, jnp.ones_like(mx)], axis=-1)
    # KB8: radial distance in normalized plane equals d(theta).
    d = jnp.sqrt(mx * mx + my * my)
    d = jnp.minimum(d, jnp.pi)  # clamp like the reference's theta_d clamp
    theta = d  # initial guess

    def newton(theta, _):
        t2 = theta * theta
        k = cam.dist
        f = theta * (1.0 + t2 * (k[0] + t2 * (k[1] + t2 * (k[2] + t2 * k[3])))) - d
        df = 1.0 + t2 * (3 * k[0] + t2 * (5 * k[1] + t2 * (7 * k[2] + t2 * 9 * k[3])))
        return theta - f / jnp.maximum(jnp.abs(df), 1e-9) * jnp.sign(df), None

    theta, _ = jax.lax.scan(newton, theta, None, length=10)
    scale = jnp.where(d > 1e-8, jnp.tan(theta) / jnp.maximum(d, 1e-8), 1.0)
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def project_jac(cam: Camera, pc: jax.Array) -> jax.Array:
    """Jacobian of `project` wrt the camera-frame point: (..., 2, 3).

    Closed form for pinhole (matches reference Pinhole::projectJac);
    autodiff via jax.jacfwd composition for KB8 (the reference hand-derives
    it — autodiff is exact and fuses fine under jit).
    """
    if cam.kind == PINHOLE:
        x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z2 = inv_z * inv_z
        zeros = jnp.zeros_like(x)
        row_u = jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1)
        row_v = jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1)
        return jnp.stack([row_u, row_v], axis=-2)

    flat = pc.reshape(-1, 3)
    jac = jax.vmap(jax.jacfwd(lambda p: project(cam, p)))(flat)
    return jac.reshape(pc.shape[:-1] + (2, 3))


def stereo_project(cam: Camera, bf: jax.Array, pc: jax.Array) -> jax.Array:
    """Rectified-stereo projection (u_l, v_l, u_r): u_r = u_l - bf/z
    (reference semantics: the 3-dim stereo reprojection residual in
    EdgeStereo, include/G2oTypes.h:425)."""
    uv = project(cam, pc)
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1)


def in_image(uv: jax.Array, width: int, height: int, margin: float = 0.0) -> jax.Array:
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < height - margin)
    )
