"""serialized mesh IO + shapegroup/instance flattening (reference
src/shapes/{serialized,shapegroup,instance}.cpp)."""
import os

import numpy as np

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.scene import shape as shp


def test_serialized_roundtrip(tmp_path):
    mesh = shp.make_cube()
    path = os.path.join(tmp_path, "cube.serialized")
    shp.save_serialized(path, mesh)
    back = shp.load_serialized(path)
    np.testing.assert_allclose(back.vertices, mesh.vertices, rtol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    if mesh.normals is not None:
        np.testing.assert_allclose(back.normals, mesh.normals, rtol=1e-6)


def test_serialized_xml_scene(tmp_path):
    mesh = shp.make_rectangle()
    mpath = os.path.join(tmp_path, "plane.serialized")
    shp.save_serialized(mpath, mesh)
    xml = f"""<scene version="3.0.0">
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="to_world">
          <lookat origin="0 0 4" target="0 0 0" up="0 1 0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="16"/>
          <integer name="height" value="16"/>
        </film>
      </sensor>
      <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
      <shape type="serialized">
        <string name="filename" value="plane.serialized"/>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.8"/></bsdf>
      </shape>
    </scene>"""
    spath = os.path.join(tmp_path, "scene.xml")
    with open(spath, "w") as f:
        f.write(xml)
    scene, meta = mi.load_file(spath)
    img = np.asarray(mi.render((scene, meta), spp=8))
    assert np.all(np.isfinite(img)) and img.mean() > 0.1


def test_shapegroup_instances(tmp_path):
    """Three instances of a group -> flattened triangle soup with 3 copies,
    each at its instance transform."""
    xml = """<scene version="3.0.0">
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="to_world">
          <lookat origin="0 0 8" target="0 0 0" up="0 1 0"/>
        </transform>
        <film type="hdrfilm">
          <integer name="width" value="24"/>
          <integer name="height" value="24"/>
        </film>
      </sensor>
      <emitter type="constant"><rgb name="radiance" value="1"/></emitter>
      <shape type="shapegroup" id="grp">
        <shape type="cube">
          <transform name="to_world"><scale value="0.4"/></transform>
          <bsdf type="diffuse"><rgb name="reflectance" value="0.9 0.2 0.2"/></bsdf>
        </shape>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="to_world"><translate x="-2"/></transform>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="to_world"><translate x="0"/></transform>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="to_world"><translate x="2"/></transform>
      </shape>
    </scene>"""
    spath = os.path.join(tmp_path, "inst.xml")
    with open(spath, "w") as f:
        f.write(xml)
    scene, meta = mi.load_file(spath)
    # 3 cubes x 12 faces
    assert scene.geo.n_faces == 36, scene.geo.n_faces
    img = np.asarray(mi.render((scene, meta), spp=16))
    assert np.all(np.isfinite(img))
    # three red blobs: left, center, right columns all show the cubes
    red = img[..., 0] - img[..., 2]
    cols = red.max(axis=0)
    third = 24 // 3
    assert cols[:third].max() > 0.05
    assert cols[third:2 * third].max() > 0.05
    assert cols[2 * third:].max() > 0.05
