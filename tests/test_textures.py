"""mesh_attribute (vertex colors) + volume textures (reference
src/textures/{mesh_attribute,volume}.cpp)."""
import numpy as np

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.scene import shape as shp


def _base(shape):
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "obj": shape,
    }


def test_vertex_color_texture():
    """A plane with red-left / blue-right vertex colors renders a
    left-right color gradient."""
    mesh = shp.make_rectangle()
    colors = np.zeros((len(mesh.vertices), 3), np.float32)
    colors[:, 0] = (1.0 - (mesh.vertices[:, 0] + 1) / 2)  # red on the left
    colors[:, 2] = (mesh.vertices[:, 0] + 1) / 2          # blue on the right
    mesh = shp.HostMesh(
        vertices=mesh.vertices, faces=mesh.faces, normals=mesh.normals,
        uvs=mesh.uvs, colors=colors,
    )
    scene, _ = mi.load_dict(_base({
        "type": "mesh", "mesh": mesh,
        "bsdf": {"type": "diffuse",
                 "reflectance": {"type": "mesh_attribute",
                                 "name": "vertex_color"}},
    }))
    img = np.asarray(mi.render(scene, spp=32, seed=0))
    # world x = -1 (red vertices) lands on the image LEFT (measured);
    # compare R-B balance to ignore env dilution
    wneg = img[:, :6]
    wpos = img[:, 10:]
    assert wneg[..., 0].mean() - wneg[..., 2].mean() > 0.1, "x<0 not red"
    assert wpos[..., 2].mean() - wpos[..., 0].mean() > 0.1, "x>0 not blue"


def test_ply_vertex_colors(tmp_path):
    """PLY with uchar vertex colors loads them (mesh_attribute source)."""
    import os

    ply = (
        b"ply\nformat binary_little_endian 1.0\n"
        b"element vertex 3\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"property uchar red\nproperty uchar green\nproperty uchar blue\n"
        b"element face 1\n"
        b"property list uchar int vertex_indices\n"
        b"end_header\n"
    )
    body = b""
    verts = [(0, 0, 0, 255, 0, 0), (1, 0, 0, 0, 255, 0), (0, 1, 0, 0, 0, 255)]
    import struct

    for x, y, z, r, g, b in verts:
        body += struct.pack("<fffBBB", x, y, z, r, g, b)
    body += struct.pack("<Biii", 3, 0, 1, 2)
    path = os.path.join(tmp_path, "c.ply")
    with open(path, "wb") as f:
        f.write(ply + body)
    mesh = shp.load_ply(path)
    assert mesh.colors is not None
    np.testing.assert_allclose(mesh.colors[0], [1, 0, 0], atol=1e-3)
    np.testing.assert_allclose(mesh.colors[2], [0, 0, 1], atol=1e-3)


def test_volume_texture():
    """A 3D grid texture colors the plane by world position."""
    # grid: red for x<0.5 (grid coords), green above
    g = np.zeros((2, 2, 2, 3), np.float32)
    g[:, :, 0] = [1.0, 0.0, 0.0]
    g[:, :, 1] = [0.0, 1.0, 0.0]
    scene, _ = mi.load_dict(_base({
        "type": "rectangle",
        "to_world": np.asarray(tf.scale(1.0), np.float32),
        "bsdf": {"type": "diffuse",
                 "reflectance": {"type": "volume", "grid": g}},
    }))
    img = np.asarray(mi.render(scene, spp=32, seed=0))
    # default vtex box is [0,1]^3; plane spans [-1,1] so x<0 clamps to red
    # (world -x = image left, as measured in test_vertex_color_texture)
    wleft = img[:, :6]    # world x < 0
    wright = img[:, 10:]  # world x > 0
    assert wleft[..., 0].mean() - wleft[..., 1].mean() > 0.05, "x<0 not red"
    assert wright[..., 1].mean() - wright[..., 0].mean() > 0.05, "x>0 not green"
