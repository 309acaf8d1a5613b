"""PBR BRDF math (glTF metallic-roughness + extensions).

Port of the reference's lighting WGSL corpus
(render_passes/shared/shared_wgsl/lighting/brdf.wgsl — GGX/Smith/Fresnel,
clearcoat, sheen, iridescence, anisotropy; pbr/pbr_material.wgsl material
evaluation). All functions are pixel-batched jnp: inputs (P,) or (P,3).

Follows the glTF 2.0 spec BRDF (Appendix B) like the reference does.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def d_ggx(n_dot_h, alpha_rough):
    """Trowbridge-Reitz / GGX normal distribution."""
    a2 = alpha_rough * alpha_rough
    f = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * f * f, _EPS)


def v_smith_ggx_correlated(n_dot_v, n_dot_l, alpha_rough):
    """Height-correlated Smith visibility (glTF spec form)."""
    a2 = alpha_rough * alpha_rough
    ggx_v = n_dot_l * jnp.sqrt(jnp.maximum(n_dot_v * n_dot_v * (1 - a2) + a2, _EPS))
    ggx_l = n_dot_v * jnp.sqrt(jnp.maximum(n_dot_l * n_dot_l * (1 - a2) + a2, _EPS))
    return 0.5 / jnp.maximum(ggx_v + ggx_l, _EPS)


def f_schlick(v_dot_h, f0, f90=1.0):
    """Fresnel-Schlick; f0 (P,3) or scalar, returns matching shape."""
    w = jnp.power(saturate(1.0 - v_dot_h), 5.0)
    if isinstance(f90, float):
        f90 = jnp.full_like(v_dot_h, f90)
    if f0.ndim == 2 and w.ndim == 1:
        w = w[:, None]
        f90 = f90[:, None] if f90.ndim == 1 else f90
    return f0 + (f90 - f0) * w


def f_schlick3(v_dot_h, f0_3, f90=1.0):
    """Fresnel-Schlick over an [r,g,b] channel list (see ops/cvec.py)."""
    w = jnp.power(saturate(1.0 - v_dot_h), 5.0)
    return [f0 + (f90 - f0) * w for f0 in f0_3]


def specular_ggx(n_dot_l, n_dot_v, n_dot_h, alpha_rough):
    """Specular lobe without Fresnel: D * V (P,)."""
    return d_ggx(n_dot_h, alpha_rough) * v_smith_ggx_correlated(n_dot_v, n_dot_l, alpha_rough)


def diffuse_lambert(base_color):
    return base_color / jnp.pi


# ---- sheen (KHR_materials_sheen; brdf.wgsl Charlie distribution) -----------

def d_charlie(n_dot_h, sheen_rough):
    alpha = jnp.maximum(sheen_rough * sheen_rough, 1e-3)
    inv_a = 1.0 / alpha
    cos2 = n_dot_h * n_dot_h
    sin2 = jnp.maximum(1.0 - cos2, _EPS)
    return (2.0 + inv_a) * jnp.power(sin2, inv_a * 0.5) / (2.0 * jnp.pi)


def v_ashikhmin(n_dot_l, n_dot_v):
    return 1.0 / jnp.maximum(4.0 * (n_dot_l + n_dot_v - n_dot_l * n_dot_v), _EPS)


def sheen_brdf(sheen_color, sheen_rough, n_dot_l, n_dot_v, n_dot_h):
    d = d_charlie(n_dot_h, sheen_rough)
    v = v_ashikhmin(n_dot_l, n_dot_v)
    return sheen_color * (d * v)[:, None]


def sheen_albedo_scaling(n_dot_v, sheen_color, sheen_rough):
    """Approximate energy compensation (spec suggests a LUT; the reference
    uses the same max-component approximation)."""
    max_c = jnp.max(sheen_color, axis=-1)
    # Cheap fit of the directional albedo of the Charlie lobe
    e = 0.65 * (1.0 - jnp.power(1.0 - n_dot_v, 3.0)) * jnp.sqrt(jnp.maximum(sheen_rough, 1e-3))
    return 1.0 - max_c * saturate(e)


def sheen_albedo_scaling_c(n_dot_v, sheen_color3, sheen_rough):
    """Channel-list form of sheen_albedo_scaling."""
    max_c = jnp.maximum(jnp.maximum(sheen_color3[0], sheen_color3[1]),
                        sheen_color3[2])
    e = 0.65 * (1.0 - jnp.power(1.0 - n_dot_v, 3.0)) * jnp.sqrt(jnp.maximum(sheen_rough, 1e-3))
    return 1.0 - max_c * saturate(e)


# ---- iridescence (KHR_materials_iridescence, thin-film) --------------------

def _fresnel_dielectric(cos_theta, ior_ratio):
    """Exact unpolarized dielectric Fresnel (scalar ior ratio per pixel)."""
    c = saturate(cos_theta)
    g2 = ior_ratio * ior_ratio - 1.0 + c * c
    g = jnp.sqrt(jnp.maximum(g2, 0.0))
    a = (g - c) / jnp.maximum(g + c, _EPS)
    b = (c * (g + c) - 1.0) / jnp.maximum(c * (g - c) + 1.0, _EPS)
    return jnp.where(g2 >= 0.0, 0.5 * a * a * (1.0 + b * b), jnp.ones_like(c))


def iridescent_fresnel(outside_ior, iridescence_ior, base_f0, thickness, cos_theta1):
    """Thin-film interference Fresnel (spec's simplified evaluation).

    Returns (P,3) spectral Fresnel. thickness in nanometers.
    """
    # refracted angle inside the film
    eta1 = outside_ior / iridescence_ior
    sin2 = eta1 * eta1 * (1.0 - cos_theta1 * cos_theta1)
    cos_theta2 = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))

    # phase shift (OPD) per wavelength for R, G, B
    opd = 2.0 * iridescence_ior * thickness * cos_theta2  # (P,)
    wavelengths = jnp.array([612.0, 549.0, 465.0])        # nm, spec values
    phi = 2.0 * jnp.pi * opd[:, None] / wavelengths[None, :]  # (P,3)

    # Fresnel at both interfaces
    r12 = _fresnel_dielectric(cos_theta1, iridescence_ior / outside_ior)[:, None]
    base_f0_sqrt = jnp.sqrt(jnp.clip(base_f0, 0.0, 0.9999))
    base_ior = (1.0 + base_f0_sqrt) / jnp.maximum(1.0 - base_f0_sqrt, _EPS)  # (P,3)
    r23 = _fresnel_dielectric(
        cos_theta2[:, None], base_ior / iridescence_ior[:, None]
    )
    # Airy summation, 2-bounce approximation
    t121 = 1.0 - r12
    r_phi = r12 + t121 * t121 * r23 / jnp.maximum(1.0 - r12 * r23, _EPS)
    cos_term = jnp.cos(phi)
    return saturate(r_phi * (1.0 + cos_term) * 0.5 + base_f0 * (1.0 - cos_term) * 0.5)


def iridescent_fresnel_c(outside_ior, iridescence_ior, base_f0_3, thickness,
                         cos_theta1):
    """Channel-list thin-film Fresnel (same math as iridescent_fresnel,
    all (P,)-shaped ops — see ops/cvec.py for why)."""
    eta1 = outside_ior / iridescence_ior
    sin2 = eta1 * eta1 * (1.0 - cos_theta1 * cos_theta1)
    cos_theta2 = jnp.sqrt(jnp.maximum(1.0 - sin2, 0.0))
    opd = 2.0 * iridescence_ior * thickness * cos_theta2
    r12 = _fresnel_dielectric(cos_theta1, iridescence_ior / outside_ior)
    t121 = 1.0 - r12
    out = []
    for c, wl in enumerate((612.0, 549.0, 465.0)):
        phi = 2.0 * jnp.pi * opd / wl
        f0 = jnp.clip(base_f0_3[c], 0.0, 0.9999)
        f0s = jnp.sqrt(f0)
        base_ior = (1.0 + f0s) / jnp.maximum(1.0 - f0s, _EPS)
        r23 = _fresnel_dielectric(cos_theta2, base_ior / iridescence_ior)
        r_phi = r12 + t121 * t121 * r23 / jnp.maximum(1.0 - r12 * r23, _EPS)
        cos_term = jnp.cos(phi)
        out.append(saturate(r_phi * (1.0 + cos_term) * 0.5
                            + base_f0_3[c] * (1.0 - cos_term) * 0.5))
    return out


# ---- anisotropy (KHR_materials_anisotropy) ----------------------------------

def d_ggx_anisotropic(n_dot_h, t_dot_h, b_dot_h, at, ab):
    a2 = at * ab
    f = t_dot_h * t_dot_h / jnp.maximum(at * at, _EPS) + \
        b_dot_h * b_dot_h / jnp.maximum(ab * ab, _EPS) + n_dot_h * n_dot_h
    # normalized form: a2 / (pi * (dot(v,v))^2) with v scaled
    v = jnp.stack([t_dot_h / jnp.maximum(at, _EPS) * a2 * 0 + t_dot_h * ab,
                   b_dot_h * at, n_dot_h * at * ab], axis=-1)
    v2 = jnp.sum(v * v, axis=-1)
    w2 = a2 / jnp.maximum(v2, _EPS)
    return a2 * w2 * w2 / jnp.pi


def v_smith_ggx_anisotropic(n_dot_v, n_dot_l, t_dot_v, b_dot_v, t_dot_l, b_dot_l, at, ab):
    lv = n_dot_l * jnp.sqrt(jnp.maximum(
        t_dot_v * t_dot_v * at * at + b_dot_v * b_dot_v * ab * ab + n_dot_v * n_dot_v, _EPS))
    ll = n_dot_v * jnp.sqrt(jnp.maximum(
        t_dot_l * t_dot_l * at * at + b_dot_l * b_dot_l * ab * ab + n_dot_l * n_dot_l, _EPS))
    return 0.5 / jnp.maximum(lv + ll, _EPS)
