"""High-level differentiable mesh rendering: camera → rasterize → texture →
SG shade.

TPU-native analog of reference ``kaolin/render/easy_render/mesh.py``
(render_mesh :53, mesh_rasterize_interpolate :141, texture_sample_materials
:278, sg_shade :427). The nvdiffrast backend collapses into the one XLA
rasterizer. Boolean pixel indexing is replaced by masked whole-image math
(static shapes).
"""

import enum

import jax.numpy as jnp

from kaolin_tpu.ops.mesh import face_normals as compute_face_normals
from kaolin_tpu.ops.mesh import index_vertices_by_faces
from kaolin_tpu.render.camera.raygen import (
    generate_centered_custom_resolution_pixel_coords,
    generate_pinhole_rays,
)
from kaolin_tpu.render.easy_render.common import default_lighting, default_material
from kaolin_tpu.render.lighting import (
    sg_diffuse_inner_product,
    sg_warp_specular_term,
)
from kaolin_tpu.render.mesh.rasterization import rasterize
from kaolin_tpu.render.mesh.utils import texture_mapping

__all__ = ["RenderPass", "render_mesh", "mesh_rasterize_interpolate"]


class RenderPass(str, enum.Enum):
    """Ref :39."""
    face_idx = "face_idx"
    uvs = "uvs"
    albedo = "albedo"
    normals = "normals"
    roughness = "roughness"
    diffuse = "diffuse"
    specular = "specular"
    features = "features"
    render = "render"
    alpha = "alpha"


def mesh_rasterize_interpolate(mesh, camera, normals_required=True,
                               uvs_required=True, tangents_required=True,
                               features_required=True):
    """Rasterize + interpolate available mesh attributes →
    (face_idx, im_normals, im_tangents, im_uvs, im_features). Ref :141."""
    vertices_camera = camera.extrinsics.transform(mesh.vertices[None]
                                                  if mesh.vertices.ndim == 2
                                                  else mesh.vertices)
    vertices_image = camera.intrinsics.transform(vertices_camera)
    face_vertices_camera = index_vertices_by_faces(vertices_camera, mesh.faces)
    face_vertices_image = index_vertices_by_faces(vertices_image,
                                                  mesh.faces)[..., :2]

    feats = []
    idx_normals = idx_uvs = idx_tangents = idx_features = -1
    cur = 0
    if normals_required and mesh.has_or_can_compute_attribute("face_normals"):
        fn = mesh.face_normals
        feats.append(fn[None] if fn.ndim == 3 else fn)
        idx_normals = cur
        cur += 3
    if uvs_required and mesh.has_or_can_compute_attribute("face_uvs"):
        fu = mesh.face_uvs
        feats.append(fu[None] if fu.ndim == 3 else fu)
        idx_uvs = cur
        cur += 2
    if tangents_required and mesh.has_or_can_compute_attribute("face_tangents"):
        ft = mesh.face_tangents
        feats.append(ft[None] if ft.ndim == 3 else ft)
        idx_tangents = cur
        cur += 3
    if features_required and mesh.has_or_can_compute_attribute("face_features"):
        ff = mesh.face_features
        feats.append(ff[None] if ff.ndim == 3 else ff)
        idx_features = cur
        cur += ff.shape[-1]
    if not feats:
        feats = [jnp.zeros(face_vertices_camera.shape[:-1] + (1,))]
    in_face_features = jnp.concatenate(feats, axis=-1)

    face_features, face_idx = rasterize(
        camera.height, camera.width,
        face_vertices_z=face_vertices_camera[..., -1],
        face_vertices_image=face_vertices_image,
        face_features=in_face_features)

    im_normals = im_uvs = im_tangents = im_features = None
    if idx_normals >= 0:
        im_normals = face_features[..., idx_normals:idx_normals + 3]
    if idx_uvs >= 0:
        im_uvs = face_features[..., idx_uvs:idx_uvs + 2] % 1.0
    if idx_tangents >= 0:
        im_tangents = face_features[..., idx_tangents:idx_tangents + 3]
    if idx_features >= 0:
        im_features = face_features[..., idx_features:]
    return face_idx, im_normals, im_tangents, im_uvs, im_features


def texture_sample_materials(face_idx, im_base_normals, materials=None,
                             uv_map=None, material_assignments=None,
                             im_tangents=None):
    """Sample per-material textures/values into image-space maps
    (albedo, spec_albedo, world normals, roughness). Ref :278 — per-material
    masked blending instead of boolean scatter."""
    b, height, width = face_idx.shape
    if materials is None or len(materials) == 0:
        materials = [default_material()]
    if material_assignments is not None:
        safe = jnp.clip(face_idx, 0, None)
        im_material_idx = jnp.where(
            face_idx >= 0, material_assignments[safe.reshape(-1)].reshape(
                face_idx.shape).astype(jnp.int32), -1)
    else:
        im_material_idx = jnp.where(face_idx >= 0, 0, -1)

    albedo = jnp.zeros((b, height, width, 3))
    spec_albedo = jnp.zeros((b, height, width, 3))
    im_roughness = jnp.full((b, height, width, 1), 0.5)
    im_world_normals = (im_base_normals if im_base_normals is not None
                        else jnp.zeros((b, height, width, 3)))

    im_bitangents = None
    if im_tangents is not None and im_base_normals is not None:
        bt = jnp.cross(im_tangents, im_base_normals)
        im_bitangents = bt / jnp.clip(
            jnp.linalg.norm(bt, axis=-1, keepdims=True), 1e-12, None)

    # texture_mapping's ogl-y-up convention handles the v flip internally;
    # empirically matches the reference goldens (net texel row = (1-v)*H)
    flipped_uv = uv_map

    for i, mat in enumerate(materials):
        mask = (im_material_idx == i)[..., None]

        def tex_sample(tex):
            if tex is None or flipped_uv is None:
                return None
            return texture_mapping(flipped_uv, tex[None].astype(jnp.float32),
                                   mode="bilinear")

        mapped_normal = tex_sample(mat.normals_texture)
        mapped_albedo = tex_sample(mat.diffuse_texture)
        mapped_spec = tex_sample(mat.specular_texture)
        mapped_metallic = tex_sample(mat.metallic_texture)
        mapped_roughness = tex_sample(mat.roughness_texture)

        # shading normals with normal-map perturbation (:324-333)
        if (mapped_normal is not None and im_tangents is not None
                and im_bitangents is not None):
            sn = (im_tangents * mapped_normal[..., :1]
                  - im_bitangents * mapped_normal[..., 1:2]
                  + im_base_normals * mapped_normal[..., 2:3])
            sn = sn / jnp.clip(jnp.linalg.norm(sn, axis=-1, keepdims=True),
                               1e-12, None)
            im_world_normals = jnp.where(mask, sn, im_world_normals)

        # albedo
        cur_albedo = None
        if mapped_albedo is not None:
            cur_albedo = mapped_albedo[..., :3]
        elif mat.diffuse_color is not None:
            cur_albedo = jnp.broadcast_to(mat.diffuse_color,
                                          (b, height, width, 3))
        if cur_albedo is not None:
            albedo = jnp.where(mask, cur_albedo, albedo)

        # specular vs metallic workflow (:341-351)
        if mat.is_specular_workflow:
            cur_spec = None
            if mapped_spec is not None:
                cur_spec = mapped_spec
            elif mat.specular_color is not None:
                cur_spec = jnp.broadcast_to(mat.specular_color,
                                            (b, height, width, 3))
            if cur_spec is not None:
                spec_albedo = jnp.where(mask, cur_spec, spec_albedo)
        else:
            metallic = (mapped_metallic if mapped_metallic is not None
                        else mat.metallic_value)
            if metallic is not None:
                m = jnp.asarray(metallic)
                spec_albedo = jnp.where(
                    mask, (1.0 - m) * 0.04 + albedo * m, spec_albedo)
                albedo = jnp.where(mask, albedo * (1.0 - m), albedo)

        min_roughness = 1e-3
        cur_rough = None
        if mapped_roughness is not None:
            cur_rough = jnp.clip(mapped_roughness, min_roughness, None)
        elif mat.roughness_value is not None:
            cur_rough = jnp.broadcast_to(
                jnp.clip(mat.roughness_value, min_roughness, None),
                (b, height, width, 1))
        if cur_rough is not None:
            im_roughness = jnp.where(mask, cur_rough, im_roughness)

    return albedo, spec_albedo, im_world_normals, im_roughness


def sg_shade(camera, face_idx, albedo, spec_albedo, im_roughness,
             im_world_normals, amplitude, direction, sharpness):
    """Diffuse + Cook-Torrance specular under SG lights. Ref :427."""
    b, height, width = face_idx.shape
    hard_mask = (face_idx >= 0).reshape(-1)

    normals = im_world_normals.reshape(-1, 3)
    normals = normals / jnp.clip(
        jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12, None)
    alb = albedo.reshape(-1, 3)
    spec = spec_albedo.reshape(-1, 3)
    rough = im_roughness.reshape(-1)

    diffuse = sg_diffuse_inner_product(amplitude, direction, sharpness,
                                       normals, alb)
    pixel_grid = generate_centered_custom_resolution_pixel_coords(
        camera.width, camera.height, width, height)
    # dispatch on lens type (the reference hardcodes pinhole rays and cannot
    # easy-render ortho cameras; ortho view rays are the camera forward axis)
    if camera.lens_type == "pinhole":
        _, rays_d = generate_pinhole_rays(camera, pixel_grid)
    else:
        _, rays_d = camera.generate_rays(pixel_grid)
    specular = sg_warp_specular_term(
        amplitude, direction, sharpness, normals, rough,
        -rays_d.reshape(-1, 3), spec)

    mask = hard_mask[:, None]
    diffuse = jnp.where(mask, diffuse, 0.0).reshape(b, height, width, 3)
    specular = jnp.where(mask, specular, 0.0).reshape(b, height, width, 3)
    return diffuse, specular, diffuse + specular


def render_mesh(camera, mesh, lighting=None, custom_materials=None,
                custom_material_assignments=None, backend=None,
                nvdiffrast_context=None):
    """Render a mesh with materials + SG lighting → dict of render passes
    (always contains 'render'). Ref :53."""
    assert len(camera) == 1, "render_mesh supports a single camera"
    materials = custom_materials or mesh.materials
    assignments = (custom_material_assignments
                   if custom_material_assignments is not None
                   else mesh.material_assignments)
    if lighting is None:
        lighting = default_lighting()

    face_idx, im_normals, im_tangents, uv_map, im_features = \
        mesh_rasterize_interpolate(mesh, camera)

    if im_normals is not None:
        # orient normals toward the camera using NDC face-normal sign (:125)
        verts = mesh.vertices[None] if mesh.vertices.ndim == 2 else mesh.vertices
        fv_ndc = index_vertices_by_faces(camera.transform(verts), mesh.faces)
        sign = jnp.sign(compute_face_normals(fv_ndc)[..., 2])
        safe = jnp.clip(face_idx, 0, None)
        im_sign = jnp.where(face_idx >= 0,
                            sign[0][safe.reshape(-1)].reshape(face_idx.shape),
                            0.0)
        im_normals = im_normals * im_sign[..., None]

    albedo, spec_albedo, im_world_normals, im_roughness = \
        texture_sample_materials(face_idx, im_normals, materials,
                                 uv_map=uv_map,
                                 material_assignments=assignments,
                                 im_tangents=im_tangents)
    diffuse_img, specular_img, img = sg_shade(
        camera, face_idx, albedo, spec_albedo, im_roughness,
        im_world_normals, lighting.amplitude, lighting.direction,
        lighting.sharpness)

    res = {
        RenderPass.face_idx.name: face_idx,
        RenderPass.render.name: img,
        RenderPass.albedo.name: albedo,
        RenderPass.normals.name: im_world_normals,
        RenderPass.roughness.name: im_roughness,
        RenderPass.diffuse.name: diffuse_img,
        RenderPass.specular.name: specular_img,
        RenderPass.uvs.name: uv_map,
        RenderPass.features.name: im_features,
        RenderPass.alpha.name: (face_idx >= 0).astype(jnp.float32)[..., None],
    }
    return {k: v for k, v in res.items() if v is not None}


# single XLA backend; reference exports per-backend rasterizers
mesh_rasterize_interpolate_cuda = mesh_rasterize_interpolate
mesh_rasterize_interpolate_nvdiffrast = mesh_rasterize_interpolate
