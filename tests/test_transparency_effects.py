"""Transparent pass (depth peeling), HUD, and effects chain tests."""

import numpy as np

from awsm_renderer_tpu import (
    AlphaMode, AntiAliasing, AwsmRendererTpu, PbrMaterial, PostProcessing,
    RendererConfig, ToneMapping, Transform, UnlitMaterial,
)
from awsm_renderer_tpu.geometry import box, plane, triangle
from awsm_renderer_tpu.utils import math3d as m3

W, H = 128, 32
F = np.float32


def make_renderer(**cfg_kw):
    cfg_kw.setdefault("width", W)
    cfg_kw.setdefault("height", H)
    cfg_kw.setdefault("post_processing", PostProcessing(tonemapping=ToneMapping.NONE))
    r = AwsmRendererTpu(RendererConfig(**cfg_kw))
    view = m3.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])
    proj = m3.perspective(np.pi / 3, W / H, 0.1, 100.0)
    r.camera.update(view, proj)
    return r


def test_blend_over_opaque():
    r = make_renderer()
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    glass = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0, 0, 1, 0.5], F), alpha_mode=AlphaMode.BLEND))
    r.add_mesh(box(), red)
    r.add_mesh(box(0.5), glass, transform=Transform(translation=np.array([0, 0, 1.0], F)))
    img = r.render()
    c = img[H // 2, W // 2, :3]
    # 50% blue over red, but the glass box has 2 layers (front+back face of
    # a closed box -> back face culled, single layer): 0.5*blue + 0.5*red
    lin = np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)
    np.testing.assert_allclose(lin, [0.5, 0, 0.5], atol=0.02)


def test_transparent_behind_opaque_hidden():
    r = make_renderer()
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    glass = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0, 0, 1, 0.8], F), alpha_mode=AlphaMode.BLEND))
    r.add_mesh(box(), red)
    r.add_mesh(box(0.5), glass, transform=Transform(translation=np.array([0, 0, -1.0], F)))
    img = r.render()
    c = img[H // 2, W // 2, :3]
    np.testing.assert_allclose(c, [1, 0, 0], atol=1e-4)  # depth-tested away


def test_two_transparent_layers_composite():
    r = make_renderer()
    g1 = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0, 0, 1, 0.5], F), alpha_mode=AlphaMode.BLEND))
    g2 = r.materials.insert(UnlitMaterial(
        base_color_factor=np.array([0, 1, 0, 0.5], F), alpha_mode=AlphaMode.BLEND))
    tri = triangle()
    r.add_mesh(tri, g1, transform=Transform(translation=np.array([-0.5, -0.5, 0.5], F)))
    r.add_mesh(tri, g2, transform=Transform(translation=np.array([-0.5, -0.5, 0.0], F)))
    img = r.render()
    # probe 3 px inside the triangles: the exact center sits ON the
    # hypotenuse, where coverage legitimately jitters by ~1e-5 px with
    # the raster's f32 edge arithmetic
    c = img[H // 2 + 3, W // 2 - 3, :3]
    lin = np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)
    # back-to-front over the default sky (0.1, 0.1, 0.12): green(0.5) over
    # sky, then blue(0.5) over that — blue contributes 0.5, green 0.25,
    # and the sky transmits through both layers at 0.25
    np.testing.assert_allclose(lin, [0.25 * 0.1, 0.25 + 0.25 * 0.1,
                                     0.5 + 0.25 * 0.12], atol=0.005)


def test_transmission_routes_and_renders():
    r = make_renderer()
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    glass = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([1, 1, 1, 1], F),
        transmission_factor=1.0, roughness_factor=0.05, metallic_factor=0.0))
    r.add_mesh(box(), red)
    r.add_mesh(plane(1.5), glass, transform=Transform(
        translation=np.array([0, 0, 1.2], F),
        rotation=m3.quat_from_axis_angle([1, 0, 0], np.pi / 2)))
    img = r.render()
    c = img[H // 2, W // 2, :3]
    # transmitted red must dominate (background visible through glass)
    assert c[0] > 0.3 and c[0] > c[2]


def test_hud_renders_on_top():
    r = make_renderer()
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    hud_mat = r.materials.insert(UnlitMaterial(base_color_factor=np.array([0, 1, 0, 1], F)))
    r.add_mesh(box(), red)
    # HUD box in front of camera (no frustum cull for HUD)
    r.add_mesh(box(0.4), hud_mat, transform=Transform(translation=np.array([0, 0, 2.0], F)), hud=True)
    img = r.render()
    c = img[H // 2, W // 2, :3]
    np.testing.assert_allclose(c, [0, 1, 0], atol=1e-4)


def test_pick_prefers_hud():
    r = make_renderer()
    red = r.materials.insert(UnlitMaterial())
    hud_mat = r.materials.insert(UnlitMaterial())
    k1 = r.add_mesh(box(), red)
    k2 = r.add_mesh(box(0.4), hud_mat, transform=Transform(translation=np.array([0, 0, 2.0], F)), hud=True)
    r.render()
    assert r.pick(W // 2, H // 2) == k2


def test_bloom_spreads_highlight():
    r = make_renderer(post_processing=PostProcessing(tonemapping=ToneMapping.NONE, bloom=True))
    bright = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([0, 0, 0, 1], F),
        emissive_factor=np.array([1, 1, 1], F), emissive_strength=20.0))
    r.add_mesh(box(0.3), bright)
    r.environment.skybox *= 0.0
    r.environment.gpu_dirty = True
    img = r.render()
    # pixels adjacent to (but outside) the box glow
    col = img[H // 2, :, 0]
    box_cols = np.where(col > 0.9)[0]
    assert len(box_cols) > 0
    left = box_cols.min() - 4
    assert img[H // 2, left, 0] > 0.02


def test_dof_blurs_off_focus():
    r = make_renderer(post_processing=PostProcessing(tonemapping=ToneMapping.NONE, dof=True))
    r.camera.dof.focus_distance = 50.0  # focus far away -> near box blurred
    r.camera.dof.aperture = 0.1  # wide open: CoC ~1.8 px at this tiny frame
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r.add_mesh(box(), red)
    img_dof = r.render()
    r2 = make_renderer()
    red2 = r2.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r2.add_mesh(box(), red2)
    img_sharp = r2.render()
    # edge transition is softer with DoF: compare horizontal gradient maxima
    g_dof = np.abs(np.diff(img_dof[H // 2, :, 0])).max()
    g_sharp = np.abs(np.diff(img_sharp[H // 2, :, 0])).max()
    assert g_dof < g_sharp


def test_smaa_softens_edges():
    r = make_renderer(anti_aliasing=AntiAliasing(smaa=True))
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    r.add_mesh(triangle(), red, transform=Transform(
        translation=np.array([-0.5, -0.5, 0], F),
        rotation=m3.quat_from_axis_angle([0, 0, 1], 0.3)))
    img = r.render()
    reds = img[..., 0]
    partial = (reds > 0.1) & (reds < 0.85)
    assert partial.sum() > 3  # blended edge pixels exist


def _refraction_scene(thickness: float):
    """Left-red / right-blue backdrop, a 45°-tilted refractive slab in
    front (ior 1.5). Reference behavior: material_transparent
    fragment.wgsl sample_transmission_background projects the refracted
    exit point and samples the opaque buffer there."""
    r = make_renderer()
    red = r.materials.insert(UnlitMaterial(base_color_factor=np.array([1, 0, 0, 1], F)))
    blue = r.materials.insert(UnlitMaterial(base_color_factor=np.array([0, 0, 1, 1], F)))
    glass = r.materials.insert(PbrMaterial(
        base_color_factor=np.array([1, 1, 1, 1], F),
        transmission_factor=1.0, thickness=thickness, ior=1.5,
        roughness_factor=0.05, metallic_factor=0.0))
    # backdrop: two large quads at z=-1 meeting at x=0
    for mat, cx in ((red, -4.0), (blue, 4.0)):
        r.add_mesh(plane(8.0), mat, transform=Transform(
            translation=np.array([cx, 0, -1], F),
            rotation=m3.quat_from_axis_angle([1, 0, 0], np.pi / 2)))
    # tilted slab in front of the boundary (normal leans +x)
    q = m3.quat_mul(m3.quat_from_axis_angle([0, 1, 0], np.pi / 4),
                    m3.quat_from_axis_angle([1, 0, 0], np.pi / 2))
    r.add_mesh(plane(2.0), glass, transform=Transform(
        translation=np.array([0, 0, 1.0], F), rotation=q))
    return r


def test_screen_space_refraction_displaces_background():
    img0 = _refraction_scene(0.0).render()
    img4 = _refraction_scene(4.0).render()
    cx = W // 2
    # just right of the red/blue boundary, behind the slab: the un-refracted
    # background is blue; the 45°-tilt + 4-unit march samples to the LEFT
    # (refraction bends toward the inverted normal), which is red
    c0 = img0[H // 2, cx + 4, :3]
    c4 = img4[H // 2, cx + 4, :3]
    assert c0[2] > c0[0], f"thickness=0 must transmit the same-pixel blue, got {c0}"
    assert c4[0] > c4[2], f"refraction must displace sampling into the red half, got {c4}"
    # outside the slab the backdrop is unchanged
    np.testing.assert_allclose(img0[H // 2, 5], img4[H // 2, 5], atol=1e-3)


def test_refraction_offscreen_falls_back_to_ibl():
    """A refracted ray leaving the screen samples the prefiltered env
    (fragment.wgsl falls back to IBL instead of clamping)."""
    r = _refraction_scene(60.0)   # huge march: exit point far off screen
    r.environment.prefiltered = r.environment.prefiltered * 0.0 + np.array(
        [4.0, 0.0, 4.0, 1.0], F)  # magenta env, distinctive
    r.environment.gpu_dirty = True
    img = r.render()
    c = img[H // 2, W // 2 + 4, :3]
    assert np.isfinite(img).all()
    # magenta fallback: red+blue transmitted, green stays low
    assert c[0] > 0.3 and c[2] > 0.3 and c[1] < min(c[0], c[2])


class TestSmaaAlgorithm:
    """Direct parity probes of the smaa.wgsl apply_smaa logic."""

    def _run(self, rgb):
        import jax.numpy as jnp

        from awsm_renderer_tpu.ops.effects import smaa

        img = np.concatenate([rgb, np.ones((*rgb.shape[:2], 1), F)], axis=-1)
        return np.asarray(smaa(jnp.asarray(img)))[..., :3]

    def test_flat_region_untouched(self):
        rgb = np.full((16, 16, 3), 0.5, F)
        out = self._run(rgb)
        np.testing.assert_array_equal(out, rgb)

    def test_below_threshold_untouched(self):
        rgb = np.full((16, 16, 3), 0.5, F)
        rgb[:, 8:] += 0.01          # delta-luma < SMAA_THRESHOLD (0.03)
        out = self._run(rgb)
        np.testing.assert_array_equal(out, rgb)

    def test_binary_step_preserved(self):
        """Inverse-contrast weighting pulls from the SIMILAR side, so a
        clean binary step stays essentially a step (the reference's
        design: SMAA targets shading/texture aliasing, not resolved
        geometry edges)."""
        rgb = np.zeros((16, 16, 3), F)
        rgb[:, 8:] = 1.0
        out = self._run(rgb)
        assert out[8, 7, 0] < 0.05 and out[8, 8, 0] > 0.95
        # vertical edge → horizontal blend only: rows stay identical
        np.testing.assert_allclose(out[4], out[12], atol=1e-6)

    def test_noisy_region_smoothed_within_bounds(self):
        """2-D high-frequency content (shading/texture aliasing — SMAA's
        actual target) gets blended, and every output stays inside its
        3x3 neighborhood's value range (it is a convex combination)."""
        rng = np.random.default_rng(3)
        rgb = rng.random((16, 16, 3)).astype(F)
        out = self._run(rgb)
        changed = np.abs(out - rgb).max(axis=-1) > 1e-4
        assert changed.mean() > 0.2
        lo = rgb.copy()
        hi = rgb.copy()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                n = np.roll(rgb, (dy, dx), axis=(0, 1))
                lo = np.minimum(lo, n)
                hi = np.maximum(hi, n)
        assert (out >= lo - 1e-5).all() and (out <= hi + 1e-5).all()

    def test_matches_reference_formula(self):
        """Pixel-exact parity with a scalar reimplementation of
        smaa.wgsl apply_smaa (threshold 0.03, blend strength 0.6,
        Rec.709 luma, wrap-around neighbors like jnp.roll)."""
        rng = np.random.default_rng(7)
        rgb = rng.random((12, 14, 3)).astype(F)
        out = self._run(rgb)

        TH, BS = 0.03, 0.6
        luma = rgb @ np.array([0.2126, 0.7152, 0.0722], F)
        H, W = luma.shape
        exp = rgb.copy()
        for y in range(H):
            for x in range(W):
                def L(dy, dx):
                    return luma[(y + dy) % H, (x + dx) % W]

                def C(dy, dx):
                    return rgb[(y + dy) % H, (x + dx) % W]

                c = luma[y, x]
                d = {k: abs(c - L(*o)) for k, o in {
                    "w": (0, -1), "e": (0, 1), "n": (-1, 0), "s": (1, 0),
                    "nw": (-1, -1), "ne": (-1, 1),
                    "sw": (1, -1), "se": (1, 1)}.items()}
                mh = max(d["w"], d["e"])
                mv = max(d["n"], d["s"])
                md = max(d["nw"], d["ne"], d["sw"], d["se"])
                if max(mh, mv, md) < TH:
                    continue
                if md > max(mh, mv):
                    ws = {k: 1.0 / (d[k] + 1e-3)
                          for k in ("nw", "ne", "sw", "se")}
                    tot = sum(ws.values())
                    nb = sum(C(*{"nw": (-1, -1), "ne": (-1, 1),
                                 "sw": (1, -1), "se": (1, 1)}[k])
                             * (w / tot) for k, w in ws.items())
                    exp[y, x] = rgb[y, x] * (1 - BS) + nb * BS
                elif mh > mv:
                    wt = 1.0 / (d["n"] + 1e-3)
                    wb = 1.0 / (d["s"] + 1e-3)
                    t = wt + wb
                    wt, wb = wt / t * BS, wb / t * BS
                    r = rgb[y, x] * (1 - wt) + C(-1, 0) * wt
                    exp[y, x] = r * (1 - wb) + C(1, 0) * wb
                else:
                    wl = 1.0 / (d["w"] + 1e-3)
                    wr = 1.0 / (d["e"] + 1e-3)
                    t = wl + wr
                    wl, wr = wl / t * BS, wr / t * BS
                    r = rgb[y, x] * (1 - wl) + C(0, -1) * wl
                    exp[y, x] = r * (1 - wr) + C(0, 1) * wr
        np.testing.assert_allclose(out, exp, atol=2e-6)


class TestBloomAlgorithm:
    """Parity probes of the bloom.wgsl pipeline (soft-knee extract,
    circular gaussian, 1 extract + N blur + 1 blend passes)."""

    def _run(self, rgb):
        import jax.numpy as jnp

        from awsm_renderer_tpu.ops.effects import bloom

        img = np.concatenate([rgb, np.ones((*rgb.shape[:2], 1), F)], axis=-1)
        return np.asarray(bloom(jnp.asarray(img)))[..., :3]

    def test_dark_image_untouched(self):
        rgb = np.full((16, 16, 3), 0.3, F)   # below soft threshold 0.64
        out = self._run(rgb)
        np.testing.assert_allclose(out, rgb, atol=1e-6)

    def test_bright_spot_spreads(self):
        rgb = np.zeros((24, 24, 3), F)
        rgb[12, 12] = 8.0
        out = self._run(rgb)
        added = out - rgb
        # energy leaks to pixels several taps away (5 blur applications
        # of radius 2 reach ~10 px), decaying with distance
        assert added[12, 12, 0] > 0
        assert added[12, 16, 0] > 0
        assert added[12, 16, 0] > added[12, 20, 0] >= 0
        # far corner untouched
        assert added[0, 0, 0] < 1e-4

    def test_matches_reference_formula_small(self):
        """Pixel-exact vs a scalar reimplementation of bloom.wgsl
        (threshold 0.8 soft knee, circular r=2 gaussian, clamp borders,
        1 extract + 3 blur + 1 blend)."""
        rng = np.random.default_rng(11)
        rgb = (rng.random((10, 12, 3)) * 2.0).astype(F)
        out = self._run(rgb)

        TH, INT, RAD = 0.8, 0.5, 2.0
        H, W = rgb.shape[:2]

        def thresh(c):
            b = c @ np.array([0.2126, 0.7152, 0.0722])
            contribution = max(b - TH, 0.0)
            softt = TH * 0.8
            knee = TH - softt
            soft = min(max((b - softt) / knee, 0.0), 1.0)
            return c * (contribution / max(b, 1e-4) * soft)

        taps = [(dy, dx, np.exp(-(dy * dy + dx * dx) / (2 * RAD * RAD)))
                for dy in range(-2, 3) for dx in range(-2, 3)
                if dy * dy + dx * dx <= RAD * RAD + 0.5]
        tot = sum(w for _, _, w in taps)

        def blur(img):
            o = np.zeros_like(img)
            for y in range(H):
                for x in range(W):
                    acc = np.zeros(3)
                    for dy, dx, w in taps:
                        yy = min(max(y + dy, 0), H - 1)
                        xx = min(max(x + dx, 0), W - 1)
                        acc += img[yy, xx] * w
                    o[y, x] = acc / tot
            return o

        ext = np.stack([np.stack([thresh(rgb[y, x]) for x in range(W)])
                        for y in range(H)])
        b = blur(ext)
        for _ in range(3):
            b = blur(b)
        exp = rgb + blur(b) * INT
        np.testing.assert_allclose(out, exp.astype(F), atol=3e-5)


def test_dof_matches_numpy_wgsl_loop():
    """depth_of_field_c == a per-pixel numpy transcription of the WGSL
    apply_dof loop (dof.wgsl:78-123) under the static-tap adaptation
    documented in ops/effects.py: taps at full DOF_MAX_BLUR radius, the
    falloff term 1-smoothstep(coc/2, coc, dist_i) acting as the per-pixel
    radius mask, plus a weight-1 center tap."""
    import jax.numpy as jnp

    from awsm_renderer_tpu.ops.effects import (
        DOF_MAX_BLUR, DOF_RING_SCALES, depth_of_field_c, dof_coc_c,
        dof_disk_offsets, dof_ring_weight, linearize_depth,
    )

    rng = np.random.default_rng(7)
    Ht, Wt = 24, 40
    rgb = rng.random((Ht, Wt, 3)).astype(F) * 2.0
    depth = rng.random((Ht, Wt)).astype(F)
    proj = m3.perspective(np.pi / 3, Wt / Ht, 0.1, 100.0)
    camera = {"proj": jnp.asarray(proj),
              "dof": jnp.asarray([3.0, 1.2, 0, 0], F)}

    out = depth_of_field_c([jnp.asarray(rgb[..., c]) for c in range(3)],
                           jnp.asarray(depth), camera)
    out = np.stack([np.asarray(o) for o in out], axis=-1)

    # --- numpy reference: the WGSL loop, per pixel, per static ring ---
    D = np.asarray(linearize_depth(jnp.asarray(depth), jnp.asarray(proj)))
    D = np.maximum(D, 1e-4)
    coc = np.asarray(dof_coc_c(jnp.asarray(depth), camera))
    rings = [(s, dof_disk_offsets(s)) for s in DOF_RING_SCALES]

    def smoothstep(e0, e1, x):
        t = min(max((x - e0) / max(e1 - e0, 1e-8), 0.0), 1.0)
        return t * t * (3.0 - 2.0 * t)

    def ring_w(c_coc, s):
        R = s * DOF_MAX_BLUR
        t = np.log2(max(c_coc, 1e-6)) - np.log2(R)
        up = 1.0 if s >= max(DOF_RING_SCALES) else min(max(1.0 - t, 0.0), 1.0)
        dn = 1.0 if s <= min(DOF_RING_SCALES) else min(max(1.0 + t, 0.0), 1.0)
        return min(up, dn)

    exp = np.zeros_like(rgb)
    for y in range(Ht):
        for x in range(Wt):
            c_coc = coc[y, x]
            c_D = D[y, x]
            blur = rgb[y, x].copy()        # center tap, weight 1
            total_w = 1.0
            for s, taps in rings:
                rw_ = ring_w(c_coc, s)
                for dx, dy, dist in taps:
                    yy = min(max(y + dy, 0), Ht - 1)
                    xx = min(max(x + dx, 0), Wt - 1)
                    w = 1.0
                    # background bleed guard (dof.wgsl:104-107)
                    if D[yy, xx] > c_D and coc[yy, xx] < c_coc:
                        w = coc[yy, xx] / max(c_coc, 0.01)
                    w *= 1.0 - smoothstep(c_coc * 0.5, c_coc, dist)
                    w = max(w, 0.01) * rw_   # dof.wgsl:116 tap floor
                    blur += rgb[yy, xx] * w
                    total_w += w
            blur /= max(total_w, 0.01)
            blend = smoothstep(0.0, 2.0, c_coc)
            exp[y, x] = rgb[y, x] * (1.0 - blend) + blur * blend

    np.testing.assert_allclose(out, exp, atol=2e-5, rtol=1e-4)
    # the scene must actually exercise both blurred and sharp pixels
    assert (coc > 2.0).any() and (coc < 0.5).any()


def test_dof_sharp_in_focus_blurred_off_focus():
    """A pixel exactly at the focus distance is untouched; a far pixel
    surrounded by contrasting neighbors is averaged toward them."""
    import jax.numpy as jnp

    from awsm_renderer_tpu.ops.effects import depth_of_field_c

    Ht, Wt = 33, 33
    proj = m3.perspective(np.pi / 3, 1.0, 0.1, 100.0)
    camera = {"proj": jnp.asarray(proj),
              "dof": jnp.asarray([1.0, 0.1, 0, 0], F)}

    # depth plane exactly at focus: CoC == 0 everywhere -> identity
    A, B = proj[2, 2], proj[2, 3]
    # solve linearize_depth(d) == 1: z = B/(A+d) -> d = B/1 - A
    d_focus = float(B / 1.0 - A)
    rgb = [jnp.asarray(np.random.default_rng(3).random((Ht, Wt)).astype(F))
           for _ in range(3)]
    depth = jnp.full((Ht, Wt), d_focus, F)
    out = depth_of_field_c(rgb, depth, camera)
    for o, c in zip(out, rgb):
        np.testing.assert_allclose(np.asarray(o), np.asarray(c), atol=1e-6)

    # far plane: bright center pixel bleeds into the blur average
    d_far = float(B / 40.0 - A)
    img = [jnp.zeros((Ht, Wt), F) for _ in range(3)]
    img[0] = img[0].at[16, 16].set(10.0)
    depth_far = jnp.full((Ht, Wt), d_far, F)
    out = depth_of_field_c(img, depth_far, camera)
    assert float(out[0][16, 16]) < 10.0          # center spread out
    assert float(np.asarray(out[0]).sum()) > 0.0
    # energy appears at tap positions away from the center
    off_center = np.asarray(out[0]).copy()
    off_center[16, 16] = 0.0
    assert off_center.max() > 0.0
