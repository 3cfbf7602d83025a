"""Golden-image regression tests (the reference's test_renders.py z-test
scheme, SURVEY §4): small fixed-seed renders compared against stored
references with a per-pixel z-test at Sidak-corrected significance.

References live in tests/golden/*.npz (mean + variance over spp). Regenerate
after INTENDED changes with:
    JAX_PLATFORMS=cpu python tests/test_golden.py
"""
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _configs():
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.path import PathIntegrator
    from mitsuba3_plt_tpu.integrators.plt import PLTIntegrator
    from mitsuba3_plt_tpu.integrators.stokes import StokesIntegrator
    from mitsuba3_plt_tpu.scene.presets import cornell_box, grating_scene

    def _cbox_xml():
        import mitsuba3_plt_tpu as mi

        return mi.load_file("/root/reference/scenes/cbox/cbox.xml",
                            resx=48, resy=48)[0]

    def _mesh20k():
        import mitsuba3_plt_tpu as mi
        from mitsuba3_plt_tpu.core import transform as tf
        from mitsuba3_plt_tpu.scene import shape as shp

        mesh = shp.make_sphere(subdiv=5)  # 20480 faces: above the brute cap
        return mi.load_dict({
            "type": "scene",
            "sensor": {
                "type": "perspective", "fov": 45,
                "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                "film": {"type": "hdrfilm", "width": 32, "height": 32},
            },
            "light": {"type": "point", "position": [2, 2, 3],
                      "intensity": [40, 40, 40]},
            "ball": {"type": "mesh", "mesh": mesh,
                     "bsdf": {"type": "diffuse", "reflectance": 0.7}},
        })[0]

    return {
        "cbox_path": dict(
            scene=lambda: cornell_box(32, 32)[0],
            integ=lambda: PathIntegrator(max_depth=4, rr_depth=9),
            spp=64, ch=3,
        ),
        # the REFERENCE's actual cbox.xml (2892 faces, dielectric glass +
        # conductor + twosided diffuse through the XML loader): covers the
        # mid-size cond(clu2,q) routing regime and the full material stack
        "cbox_xml": dict(
            scene=_cbox_xml,
            integ=lambda: PathIntegrator(max_depth=4, rr_depth=9),
            spp=32, ch=3,
        ),
        # 20k-face mesh: the big-mesh clu2/XLA-walk regime
        "mesh20k_path": dict(
            scene=_mesh20k,
            integ=lambda: PathIntegrator(max_depth=3, rr_depth=9),
            spp=32, ch=3,
        ),
        "cbox_stokes": dict(
            scene=lambda: cornell_box(24, 24, box_material="dielectric")[0],
            integ=lambda: StokesIntegrator(),
            spp=48, ch=15,
        ),
        "grating_plt": dict(
            scene=lambda: grating_scene(24, 24, coherence=1e3)[0],
            integ=lambda: PLTIntegrator(max_depth=3, rr_depth=9),
            spp=48, ch=3,
        ),
    }


def _render_mean_var(cfg_entry, n_runs=4):
    """Render n_runs independent-seed images; return per-pixel mean + var."""
    from mitsuba3_plt_tpu.config import RGB
    from mitsuba3_plt_tpu.integrators.common import render

    scene = cfg_entry["scene"]()
    integ = cfg_entry["integ"]()
    imgs = []
    for seed in range(n_runs):
        imgs.append(
            np.asarray(
                render(scene, integ.sample, seed=seed,
                       spp=cfg_entry["spp"] // n_runs, cfg=RGB,
                       n_out_channels=cfg_entry["ch"])
            )
        )
    imgs = np.stack(imgs)
    return imgs.mean(0), imgs.var(0, ddof=1)


@pytest.mark.parametrize("name", list(_configs().keys()))
def test_golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden reference missing: run tests/test_golden.py")
    ref = np.load(path)
    mean, var = _render_mean_var(_configs()[name])
    ref_mean, ref_var = ref["mean"], ref["var"]

    # z-test per pixel: difference of two noisy estimates
    sigma = np.sqrt((var + ref_var) / 4 + 1e-8)  # 4 runs each
    z = np.abs(mean - ref_mean) / sigma
    n_pix = z.size
    # Sidak-corrected threshold at alpha = 0.01
    alpha = 1.0 - (1.0 - 0.01) ** (1.0 / n_pix)
    from scipy.stats import norm

    thresh = norm.isf(alpha / 2)
    n_fail = int((z > thresh).sum())
    assert n_fail == 0, (
        f"{name}: {n_fail}/{n_pix} pixels fail the z-test "
        f"(max z = {z.max():.1f}, thresh = {thresh:.1f})"
    )


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, entry in _configs().items():
        mean, var = _render_mean_var(entry)
        np.savez_compressed(
            os.path.join(GOLDEN_DIR, f"{name}.npz"), mean=mean, var=var
        )
        print(f"wrote {name}: mean {mean.mean():.4f}")


def test_intersect_routing_tripwire():
    """Assert which intersection kernel each bench-scene class selects on
    TPU (round-3 VERDICT: a routing regression was invisible to CI — the
    cluster kernel silently served incoherent bounce rays at 2-6x the q
    kernel's cost). intersect_route IS the dispatch (ray_intersect and
    ray_test both call it), so these assertions pin production routing."""
    import mitsuba3_plt_tpu as mi
    from mitsuba3_plt_tpu.scene.presets import cornell_box

    # tiny preset (36 tris, no ctab2): always q brute
    tiny = cornell_box(16, 16)[0]
    assert tiny.ctab2 is None
    assert tiny.intersect_route(coherent=False, on_tpu=True) == "brute"
    assert tiny.intersect_route(coherent=True, on_tpu=True) == "brute"

    # cbox.xml (2892 faces): clu2 for coherent camera tiles, q for
    # incoherent bounce rays, lax.cond for the traced scan predicate
    cbox = mi.load_file("/root/reference/scenes/cbox/cbox.xml",
                        resx=32, resy=32)[0]
    assert cbox.ctab2 is not None
    assert cbox.intersect_route(coherent=True, on_tpu=True) == "clu2"
    assert cbox.intersect_route(coherent=False, on_tpu=True) == "brute"
    assert cbox.intersect_route(coherent="pred",
                                on_tpu=True) == "cond(clu2,q)"
    assert cbox.intersect_route(brute_force=True, on_tpu=True) == "brute"
    # ANY-HIT routing matches closest-hit: the round-5 sorted-clu2 any-hit
    # experiment won its microbenchmark but regressed the full render
    # (see intersect_route docstring) — pin that it stays OFF
    assert cbox.intersect_route(coherent=False, on_tpu=True,
                                anyhit=True) == "brute"
    assert cbox.intersect_route(coherent="pred", on_tpu=True,
                                anyhit=True) == "cond(clu2,q)"

    # big mesh (> brute cap): clu2 for every ray class on TPU; the CPU
    # fallback is the XLA skip-link walk
    from mitsuba3_plt_tpu.core import transform as tf
    from mitsuba3_plt_tpu.scene import shape as shp

    big = mi.load_dict({
        "type": "scene",
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0]),
                   "film": {"type": "hdrfilm", "width": 16, "height": 16}},
        "light": {"type": "point", "position": [2, 2, 3],
                  "intensity": [1, 1, 1]},
        "ball": {"type": "mesh", "mesh": shp.make_sphere(subdiv=5),
                 "bsdf": {"type": "diffuse", "reflectance": 0.5}},
    })[0]
    assert big.ctab2 is not None
    assert big.intersect_route(coherent=False, on_tpu=True) == "clu2"
    assert big.intersect_route(coherent=True, on_tpu=True) == "clu2"
    assert big.intersect_route(coherent=False, on_tpu=False) == "xla-walk"


def test_filtered_splat_paths_agree():
    """put_ordered_filtered (segment-sum, the TPU split-jit path) must
    match the scatter splat `put` to float precision."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba3_plt_tpu.librender.film import ImageBlock, FILTER_NAMES

    W, H, spp = 64, 48, 4
    n = W * H * spp
    rng = np.random.default_rng(0)
    lane = np.arange(n) // spp
    px = lane % W
    py = lane // W
    uv = np.stack(
        [(px + rng.random(n)) / W, (py + rng.random(n)) / H], -1
    ).astype(np.float32)
    vals = rng.random((n, 3)).astype(np.float32)
    ok = rng.random(n) > 0.1
    for fname in ("gaussian", "mitchell", "tent"):
        rf = FILTER_NAMES[fname]
        b0 = ImageBlock.create(W, H, 3, rf)
        a = b0.put_ordered_filtered(
            jnp.asarray(uv), jnp.asarray(vals), jnp.asarray(ok), spp
        )
        b = b0.put(jnp.asarray(uv), jnp.asarray(vals), jnp.asarray(ok))
        np.testing.assert_allclose(
            np.asarray(a.develop()), np.asarray(b.develop()), atol=5e-5,
            err_msg=fname,
        )
