import numpy as np
import jax.numpy as jnp

from mitsuba3_plt_tpu.librender import mueller, fresnel
from mitsuba3_plt_tpu.core import frame as fr


def test_rotator_composition():
    a = mueller.rotator(jnp.asarray(0.3))
    b = mueller.rotator(jnp.asarray(0.5))
    ab = np.asarray(a @ b)
    c = np.asarray(mueller.rotator(jnp.asarray(0.8)))
    assert np.abs(ab - c).max() < 1e-5


def test_rotator_45deg_example():
    # Collett: horizontal linear polarized light through +45deg rotator
    s1 = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    R = mueller.rotator(jnp.asarray(np.pi / 4))
    s2 = np.asarray(R @ s1)
    assert np.allclose(s2, [1.0, 0.0, -1.0, 0.0], atol=1e-6)


def test_linear_polarizer_malus():
    # Malus' law: intensity through a rotated polarizer ~ cos^2(theta)
    for theta in [0.0, 0.3, 0.9, 1.4]:
        M = mueller.rotated_element(
            jnp.asarray(theta), mueller.linear_polarizer(jnp.asarray(1.0))
        )
        s_in = jnp.asarray([1.0, 1.0, 0.0, 0.0])  # horizontally polarized
        s_out = np.asarray(M @ s_in)
        assert abs(s_out[0] - np.cos(theta) ** 2) < 1e-5


def test_specular_reflection_matches_unpolarized_fresnel():
    # M[0,0] of the reflection Mueller matrix equals the unpolarized
    # Fresnel reflectance for unpolarized incident light.
    cos_ti = jnp.asarray(np.linspace(0.05, 1.0, 32), jnp.float32)
    M = mueller.specular_reflection_dielectric(cos_ti, 1.5)
    F, _, _, _ = fresnel.fresnel_dielectric(cos_ti, 1.5)
    assert np.abs(np.asarray(M[..., 0, 0]) - np.asarray(F)).max() < 1e-5

    eta_re = jnp.asarray(0.2)
    eta_im = jnp.asarray(3.9)
    Mc = mueller.specular_reflection_conductor(cos_ti, eta_re, eta_im)
    Fc = fresnel.fresnel_conductor(cos_ti, eta_re, eta_im)
    assert np.abs(np.asarray(Mc[..., 0, 0]) - np.asarray(Fc)).max() < 1e-4


def test_fresnel_dielectric_basics():
    # normal incidence: F = ((eta-1)/(eta+1))^2
    F, cos_t, eta_it, eta_ti = fresnel.fresnel_dielectric(jnp.asarray(1.0), 1.5)
    assert abs(float(F) - ((0.5 / 2.5) ** 2)) < 1e-6
    assert abs(float(cos_t) + 1.0) < 1e-6
    # TIR from inside beyond critical angle
    F2, cos_t2, _, _ = fresnel.fresnel_dielectric(jnp.asarray(-0.2), 1.5)
    assert float(F2) == 1.0 and float(cos_t2) == 0.0
    # Brewster angle: a_p amplitude vanishes
    brewster = np.arctan(1.5)
    a_s, a_p, _, _, _ = fresnel.fresnel_polarized_dielectric(
        jnp.asarray(np.cos(brewster), jnp.float32), 1.5
    )
    assert abs(float(a_p[0])) < 1e-4 and abs(float(a_p[1])) < 1e-6


def test_stokes_basis_orthogonal():
    d = jnp.asarray(
        np.random.default_rng(1).normal(size=(64, 3)).astype(np.float32)
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    b = mueller.stokes_basis(d)
    assert np.abs(np.asarray(fr.dot(b, d))).max() < 1e-5


def test_rotate_stokes_basis_roundtrip():
    fwd = jnp.asarray([0.0, 0.0, 1.0])
    b0 = mueller.stokes_basis(fwd)
    b1 = jnp.asarray([0.0, 1.0, 0.0])
    R01 = mueller.rotate_stokes_basis(fwd, b0, b1)
    R10 = mueller.rotate_stokes_basis(fwd, b1, b0)
    assert np.abs(np.asarray(R01 @ R10) - np.eye(4)).max() < 1e-5


def test_specular_transmission_energy():
    # At normal incidence the Mueller M00 of specular transmission equals the
    # power transmittance 1 - F: amplitudes t_s = 1 + r_s = 0.8,
    # t_p = (1 + r_p) * eta_ti = 0.8, factor = eta_it * |cos_t/cos_i| = 1.5,
    # M00 = 0.5 * 1.5 * (0.64 + 0.64) = 0.96 = 1 - F.  (Solid-angle
    # compression 1/eta^2 is applied separately by the BSDF, as in the
    # reference mueller.h:238 convention.)
    eta = 1.5
    M = mueller.specular_transmission(jnp.asarray(1.0), eta)
    F, _, _, _ = fresnel.fresnel_dielectric(jnp.asarray(1.0), eta)
    assert float(M[0, 0]) > 0
    assert abs(float(M[0, 0]) - (1.0 - float(F))) < 1e-5
