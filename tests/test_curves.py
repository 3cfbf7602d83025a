"""bspline/linear curve shapes (reference src/shapes/{bsplinecurve,
linearcurve}.cpp) — tessellated sweep tubes."""
import os

import numpy as np

import mitsuba3_plt_tpu as mi
from mitsuba3_plt_tpu.core import transform as tf
from mitsuba3_plt_tpu.scene import shape as shp


CURVE_TXT = """\
-1.0 0.0 0.0 0.1
-0.3 0.4 0.0 0.1
 0.3 -0.4 0.0 0.1
 1.0 0.0 0.0 0.1

-1.0 0.0 1.0 0.05
-0.3 0.0 1.0 0.05
 0.3 0.0 1.0 0.05
 1.0 0.0 1.0 0.05
"""


def test_curve_parsing(tmp_path):
    path = os.path.join(tmp_path, "c.txt")
    with open(path, "w") as f:
        f.write(CURVE_TXT)
    curves = shp.load_curves(path)
    assert len(curves) == 2
    assert curves[0].shape == (4, 4)
    np.testing.assert_allclose(curves[1][:, 3], 0.05)


def test_bspline_interpolation_properties(tmp_path):
    # a straight control polygon must produce a straight curve with the
    # right radius everywhere
    cp = np.asarray(
        [[0, 0, 0, 0.2], [1, 0, 0, 0.2], [2, 0, 0, 0.2], [3, 0, 0, 0.2]],
        np.float32,
    )
    mesh = shp.tessellate_curve(cp, bspline=True, seg_per_span=4, n_phi=8)
    # all vertices at distance 0.2 from the x-axis
    d = np.linalg.norm(mesh.vertices[:, 1:], axis=-1)
    np.testing.assert_allclose(d, 0.2, atol=1e-5)
    assert len(mesh.faces) > 0


def test_curve_scene_renders(tmp_path):
    path = os.path.join(tmp_path, "c.txt")
    with open(path, "w") as f:
        f.write(CURVE_TXT)
    scene, _ = mi.load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 60,
            "to_world": tf.look_at([0, 0, 4], [0, 0, 0.5], [0, 1, 0]),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "hair": {
            "type": "bsplinecurve", "filename": path,
            "bsdf": {"type": "diffuse", "reflectance": [0.6, 0.4, 0.2]},
        },
    })
    assert scene.geo.n_faces > 100
    img = np.asarray(mi.render(scene, spp=8, seed=0))
    assert np.all(np.isfinite(img)) and img.mean() > 0.1
