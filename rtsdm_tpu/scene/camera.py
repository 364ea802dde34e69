"""Camera pytree mirroring Falcor's CameraData
(reference Source/Falcor/Scene/Camera/CameraData.slang:35-69) so the
UVToViewSpace / ViewSpaceToUV / computeRayPinhole math transfers verbatim
(reference Source/RenderPasses/SVAO/Common.slang:139-153,
 Source/Falcor/Scene/Camera/Camera.slang:46-90).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import look_at, normalize, perspective
from ..utils.structs import pytree_dataclass, replace


@pytree_dataclass
class Camera:
    # matrices
    view_mat: jnp.ndarray            # [4,4]
    prev_view_mat: jnp.ndarray       # [4,4]
    proj_mat: jnp.ndarray            # [4,4] (jittered — jitter applied at raster)
    view_proj_mat: jnp.ndarray       # [4,4]
    inv_view_proj: jnp.ndarray       # [4,4]
    view_proj_no_jitter: jnp.ndarray # [4,4]
    prev_view_proj_no_jitter: jnp.ndarray  # [4,4]
    # vectors / scalars (all jnp scalars so they can animate under jit)
    pos_w: jnp.ndarray               # [3]
    prev_pos_w: jnp.ndarray          # [3]
    up: jnp.ndarray                  # [3]
    target: jnp.ndarray              # [3]
    camera_u: jnp.ndarray            # [3] right image-plane basis (len ~ tan fov)
    camera_v: jnp.ndarray            # [3] up image-plane basis
    camera_w: jnp.ndarray            # [3] forward, length = focal distance
    focal_length: jnp.ndarray        # mm
    frame_height: jnp.ndarray        # mm (24 = 35mm film)
    frame_width: jnp.ndarray         # mm
    aspect: jnp.ndarray
    near_z: jnp.ndarray
    far_z: jnp.ndarray
    jitter_x: jnp.ndarray            # subpixel offset / width  (+ shifts image right)
    jitter_y: jnp.ndarray            # subpixel offset / height (+ shifts image up)

    # ------------------------------------------------------------------
    @staticmethod
    def create(position=(0.0, 0.0, 3.0), target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0),
               focal_length=21.0, frame_height=24.0, aspect=1.0,
               near_z=0.1, far_z=1000.0, jitter=(0.0, 0.0), prev=None) -> "Camera":
        """Build a camera the way Falcor's Camera::calculateCameraParameters does.

        fovY = 2*atan(frameHeight / (2*focalLength)); cameraU/V/W are the image
        plane basis used by computeRayPinhole (Camera.slang:68-78).
        """
        pos = jnp.asarray(position, jnp.float32)
        tgt = jnp.asarray(target, jnp.float32)
        upv = jnp.asarray(up, jnp.float32)
        focal_length = jnp.asarray(focal_length, jnp.float32)
        frame_height = jnp.asarray(frame_height, jnp.float32)
        aspect = jnp.asarray(aspect, jnp.float32)
        near_z = jnp.asarray(near_z, jnp.float32)
        far_z = jnp.asarray(far_z, jnp.float32)
        jx = jnp.asarray(jitter[0], jnp.float32)
        jy = jnp.asarray(jitter[1], jnp.float32)

        fov_y = 2.0 * jnp.arctan(0.5 * frame_height / focal_length)
        w = normalize(tgt - pos)                       # focal distance 1 (cancels in ray dir)
        u = normalize(jnp.cross(w, upv)) * jnp.tan(fov_y * 0.5) * aspect
        v = normalize(jnp.cross(u, w)) * jnp.tan(fov_y * 0.5)

        view = look_at(pos, tgt, upv)
        proj = perspective(fov_y, aspect, near_z, far_z)
        vp = proj @ view

        cam = Camera(
            view_mat=view, prev_view_mat=view,
            proj_mat=proj, view_proj_mat=vp,
            inv_view_proj=jnp.linalg.inv(vp),
            view_proj_no_jitter=vp, prev_view_proj_no_jitter=vp,
            pos_w=pos, prev_pos_w=pos, up=upv, target=tgt,
            camera_u=u, camera_v=v, camera_w=w,
            focal_length=focal_length, frame_height=frame_height,
            frame_width=frame_height * aspect, aspect=aspect,
            near_z=near_z, far_z=far_z, jitter_x=jx, jitter_y=jy,
        )
        if prev is not None:
            cam = replace(cam, prev_view_mat=prev.view_mat,
                          prev_view_proj_no_jitter=prev.view_proj_no_jitter,
                          prev_pos_w=prev.pos_w)
        return cam

    # ------------------------------------------------------------------
    # the shared view<->uv math of the AO shaders
    # ------------------------------------------------------------------
    def image_scale(self):
        """0.5 * (frameWidth, frameHeight) / focalLength — SVAO/Common.slang:142."""
        return 0.5 * jnp.stack([self.frame_width / self.focal_length,
                                self.frame_height / self.focal_length])

    def uv_to_view_space(self, uv, view_depth):
        """uv [...,2] in [0,1], view_depth [...] positive -> view pos [...,3]
        with negative z (SVAO/Common.slang:139-144)."""
        ndc = jnp.stack([uv[..., 0], 1.0 - uv[..., 1]], axis=-1) * 2.0 - 1.0
        s = self.image_scale()
        xy = ndc * view_depth[..., None] * s
        return jnp.concatenate([xy, -view_depth[..., None]], axis=-1)

    def view_space_to_uv(self, pos_v):
        """view pos (neg z) -> uv (SVAO/Common.slang:148-153)."""
        s = self.image_scale()
        ndc = pos_v[..., :2] / (s * pos_v[..., 2:3])
        return ndc * jnp.array([-0.5, 0.5]) + 0.5

    def view_space_radius_to_uv_radius(self, z, r):
        """positive view depth z, world radius r -> uv radius [...,2]
        (SVAO/Common.slang:247-253)."""
        fw = jnp.stack([self.frame_width, self.frame_height])
        return (r * self.focal_length)[..., None] / (fw * z[..., None])

    def compute_ray_pinhole(self, pixel_xy, frame_dim, jitter=None):
        """Camera ray through pixel centers (Camera.slang:46-90).

        pixel_xy: [...,2] float/int pixel coords (origin top-left),
        frame_dim: (W, H). jitter: None -> use camera jitter;
        otherwise explicit [...,2] in [0,1] (subtexel position, 0.5 = center).
        Returns (origin [3], dir [...,3] normalized).
        """
        wh = jnp.asarray(frame_dim, jnp.float32)
        if jitter is None:
            p = (pixel_xy + 0.5) / wh + jnp.stack([-self.jitter_x, self.jitter_y])
        else:
            p = (pixel_xy + jitter) / wh
        ndc = jnp.stack([2.0 * p[..., 0] - 1.0, -2.0 * p[..., 1] + 1.0], axis=-1)
        d = (ndc[..., 0:1] * self.camera_u + ndc[..., 1:2] * self.camera_v + self.camera_w)
        return self.pos_w, normalize(d)

    def linearize_depth(self, nonlinear):
        """D3D [0,1] depth -> positive linear view depth
        (reference LinearizeDepth/Linearize.ps.slang:14)."""
        return self.near_z * self.far_z / (self.far_z + nonlinear * (self.near_z - self.far_z))

    def screen_space_pixel_spread_angle(self, frame_height_px):
        """Camera::computeScreenSpacePixelSpreadAngle — ray-cone spread used by
        alpha-test LOD (SVAO.cpp:234)."""
        fov_y = 2.0 * jnp.arctan(0.5 * self.frame_height / self.focal_length)
        return jnp.arctan(2.0 * jnp.tan(fov_y * 0.5) / frame_height_px)
