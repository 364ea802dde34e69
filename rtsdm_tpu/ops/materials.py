"""Gather-free material-property fetch.

The reference reads StandardMaterial parameters through bindless material
buffers per pixel (Scene/Material/MaterialSystem.cpp). The straight JAX
translation — ``scene.mat_base_color[mid]`` per property — is a per-pixel
gather from a tiny [M,*] table, which TPU executes at ~1e8 elem/s AND
rematerializes into every consumer fusion (CLAUDE.md measured ~20 ms per
2M-pixel gather). Shading reads six properties: ~120 ms/frame at 1080p.

TPU-native re-design: stack ALL shading properties into one [M, K] matrix
and fetch every property for every pixel with a single one-hot
[P, M] @ [M, K] matmul (MXU). M is small (<= 9 in the shipped tiers, bounded
at ONE_HOT_MAX_M for imported scenes), so the one-hot operand is a cheap
fused compare and the matmul streams at full MXU rate; properties come back
as planar column slices (the [k,H,W]-front rule applies to the MINOR dim).
"""
from __future__ import annotations

import jax.numpy as jnp

# above this many materials the [P, M] one-hot operand outweighs the gather
# cost — fall back to plain indexing (imported scenes with huge palettes)
ONE_HOT_MAX_M = 128


def fetch_shading_materials(scene, mid):
    """All StandardMaterial shading properties for an int32 material-id
    field `mid` of any shape: returns a dict with base_color/emissive [...,3],
    roughness/metallic/ior [...], tex [...] int32 page index.

    One one-hot MXU matmul replaces six per-pixel table gathers."""
    m = scene.mat_base_color.shape[0]
    if m > ONE_HOT_MAX_M:
        return dict(base_color=scene.mat_base_color[mid],
                    emissive=scene.mat_emissive[mid],
                    roughness=scene.mat_roughness[mid],
                    metallic=scene.mat_metallic[mid],
                    ior=scene.mat_ior[mid],
                    tex=scene.mat_tex[mid])
    shape = mid.shape
    p = mid.reshape(-1)
    # [M, 10] property matrix; ids stay exact in f32 (pages < 2^24)
    table = jnp.concatenate(
        [scene.mat_base_color, scene.mat_emissive,
         scene.mat_roughness[:, None], scene.mat_metallic[:, None],
         scene.mat_ior[:, None],
         scene.mat_tex[:, None].astype(jnp.float32)], axis=1)
    onehot = (p[:, None] == jnp.arange(m, dtype=p.dtype)
              ).astype(jnp.float32)                       # fused compare
    props = onehot @ table                                # [P, 10] on MXU
    return dict(base_color=props[:, 0:3].reshape(shape + (3,)),
                emissive=props[:, 3:6].reshape(shape + (3,)),
                roughness=props[:, 6].reshape(shape),
                metallic=props[:, 7].reshape(shape),
                ior=props[:, 8].reshape(shape),
                tex=jnp.round(props[:, 9]).astype(jnp.int32).reshape(shape))


def fetch_material_scalar(table_1d, mid):
    """One scalar property (e.g. double-sided flag) for an id field, as a
    one-hot dot — same rationale, single column."""
    m = table_1d.shape[0]
    if m > ONE_HOT_MAX_M:
        return table_1d[mid]
    shape = mid.shape
    p = mid.reshape(-1)
    onehot = (p[:, None] == jnp.arange(m, dtype=p.dtype)).astype(jnp.float32)
    return (onehot @ table_1d.astype(jnp.float32)[:, None])[:, 0] \
        .reshape(shape).astype(table_1d.dtype)
