"""Visual-perception augmentation — fully on-device, jittable.

Rebuilds the reference's twin CPU/CUDA augmentation engine
(visual_perception_augmentation.cpp:163-438, .cu:282-544) as one JAX
function, designed to run *inside* the sharded train step (vmapped over
the batch) so one-template training never synthesizes data on the host.

Operation order (identical to the reference):
  1. downsample x/y/z (down-and-back low-pass)       (.cpp:205-220)
  2. cropping (random box hole, label zeroed)        (.cpp:222-230)
  3. truncation z (zero top/bottom slabs)            (.cpp:231-250)
  4. additive uniform noise                          (.cpp:252-258)
  5. lighting: ambient / diffuse / specular          (.cpp:260-277)
  6. ONE fused displacement-field pass: lens distortion + N sinusoidal
     distortion foci + perspective + rigid affine; image sampled
     trilinearly, label by majority vote              (.cpp:281-335)
  7. clamp >= 0 + normalize per channel              (.cpp:339-343)
  8. background synthesis (label mode): zero_background OR
     rubber-stamping + Perlin texture                (.cpp:345-426)

Probability gates: option 0 = off, 1..3 = 25/50/75%, >= 4 = always
(.cpp:182-190).  Gates with value 0 or >=4 are resolved at trace time
(options are static), so disabled ops compile out entirely.

RNG contract: a single jax.random key per sample; subkeys are drawn in a
fixed documented order.  This reproduces the reference's *distributions*,
not its sequential RNG stream (SURVEY.md §7, hard part #1).

Known deviation: the reference passes an absolute radius where
``random_location`` expects a fraction when drawing the cropping center
(.cpp:224-227), which places the crop outside the volume almost always.
We implement the evident intent (center inside the volume with a margin
of the crop radius).

Layout: image (D, H, W, C) float32; label (D, H, W) float32.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .perlin import perlin_octaves
from .resample import (
    SupercellLinearSampler,
    _supercell_geometry,
    affine_matrix,
    meshgrid_xyz,
    sample_linear,
    sample_warp_image_label,
    sample_warp_image_label_supercell,
    supercell_warp_shape_ok,
    warp_native_active,
)


# ---------------------------------------------------------------------------
# options (defaults = options.txt; same ids as the reference CLI flags)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AugOptions:
    cropping: int = 0
    cropping_size_min: float = 0.1
    cropping_size_max: float = 0.2
    truncation_z: int = 1
    downsample_x: int = 2
    downsample_x_ratio: float = 0.5
    downsample_y: int = 2
    downsample_y_ratio: float = 0.5
    downsample_z: int = 2
    downsample_z_ratio: float = 0.5
    noise: int = 2
    noise_mag: float = 0.2
    ambient: int = 2
    ambient_mag: float = 2.0
    diffuse: int = 2
    diffuse_mag: float = 2.0
    specular: int = 2
    specular_freq: float = 2.0
    specular_mag: float = 0.5
    translocation_ratio: float = 0.2
    rotation_x: float = 0.2
    rotation_y: float = 0.2
    rotation_z: float = 0.2
    scaling_up: float = 1.25
    scaling_down: float = 0.8
    aspect_ratio: float = 1.25
    perspective: float = 0.1
    lens_distortion: float = 0.1
    distortion: int = 1
    distortion_count: int = 3
    distortion_radius_min: float = 0.1
    distortion_radius_max: float = 0.5
    distortion_mag_min: float = 0.05
    distortion_mag_max: float = 0.1
    zero_background: int = 1
    rubber_stamping: int = 2
    rubber_stamping_mag: float = 0.5
    perlin_texture: int = 2
    perlin_texture_mag: float = 0.5

    @classmethod
    def from_dict(cls, d: dict) -> "AugOptions":
        names = {f.name: f.type for f in fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k in names:
                kwargs[k] = int(float(v)) if names[k] is int else float(v)
        return cls(**kwargs)

    def to_dict(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}


class _KeyFeed:
    """Deterministic named subkey dispenser (fixed fold-in order)."""

    def __init__(self, key):
        self._key = key
        self._n = 0

    def __call__(self):
        k = jax.random.fold_in(self._key, self._n)
        self._n += 1
        return k


def _uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, minval=lo, maxval=hi)


def _gate(opt_value: int, feed: _KeyFeed):
    """Returns Python bool for static gates, traced bool otherwise
    (.cpp:182-190)."""
    v = int(opt_value)
    if v == 0:
        return False
    if v >= 4:
        return True
    return jax.random.uniform(feed()) < 0.25 * v


def _where_tree(gate, a, b):
    return jax.tree.map(lambda x, y: jnp.where(gate, x, y), a, b)


def _apply(gate, fn, *args):
    """Run fn when gate fires.  Static gates resolve at trace time; traced
    gates become a real lax.cond branch — the train step scans items
    sequentially per device (no vmap), so a 25-75% gate really skips its op
    most steps instead of paying for both sides of a select."""
    if gate is False:
        return args if len(args) > 1 else args[0]
    if gate is True:
        return fn(*args)
    if len(args) > 1:
        return jax.lax.cond(gate, fn, lambda *a: a, *args)
    return jax.lax.cond(gate, fn, lambda a: a, args[0])


def _supercell_warp_ok(opt: AugOptions, shape_dhw) -> bool:
    """Static routing gate for the supercell warp (trace-time decision).

    The supercell sampler is exact while the warp's local Jacobian
    row-sums stay <= ~2 (see sample_warp_image_label_supercell); beyond
    that it clamps taps to the 6-wide window.  Option values bound the
    worst possible random draw, so gate on them: the worst-draw affine
    row-sum (zoom x aspect x rotation) must be moderate and the nonlinear
    terms (lens, foci, perspective) near their defaults.  Defaults give
    an affine bound ~2.1 -> supercell used; extreme settings fall back to
    the exact corner-cell sampler."""
    if os.environ.get("UNET_TPU_NO_SUPERCELL"):
        return False
    if not supercell_warp_shape_ok(shape_dhw):
        return False
    s_max = float(opt.aspect_ratio) / float(opt.scaling_down)

    def rot(ax_, ay_, az_):
        cx, sx = np.cos(ax_), np.sin(ax_)
        cy, sy = np.cos(ay_), np.sin(ay_)
        cz, sz = np.cos(az_), np.sin(az_)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return rx @ ry @ rz

    # |R| row-sums are NON-monotone in the angles (each peaks near pi/4),
    # so scan a grid over the draw range rather than just its corners
    def axis_grid(m):
        return np.unique(np.concatenate([np.linspace(-m, m, 9), [0.0]]))

    rs = max(
        np.max(np.sum(np.abs(rot(a, b, c)), axis=1))
        for a in axis_grid(opt.rotation_x)
        for b in axis_grid(opt.rotation_y)
        for c in axis_grid(opt.rotation_z)
    )
    return (
        s_max * float(rs) <= 2.6
        and float(opt.lens_distortion) <= 0.2
        and float(opt.distortion_mag_max) <= 0.2
        and float(opt.perspective) <= 0.2
    )


def _normalize(img):
    mx = jnp.max(img)
    return jnp.where(mx > 0, img / mx, img)


def _normalize_to(img, target):
    mx = jnp.max(img)
    return jnp.where(mx > 0, img * (target / mx), img)


def _roundtrip_matrix(n: int, ratio: float) -> np.ndarray:
    """n x n matrix for downsample-to-int(n*ratio)-and-back along one axis
    with corner-anchored linear interpolation (tipl::scale semantics)."""
    nl = max(int(n * ratio), 1)

    def interp_matrix(n_out, n_in):
        m = np.zeros((n_out, n_in), np.float32)
        if n_out == 1:
            m[0, 0] = 1.0
            return m
        scale = (n_in - 1) / (n_out - 1)
        for i in range(n_out):
            p = i * scale
            j = min(int(np.floor(p)), n_in - 1)
            f = p - j
            m[i, j] += 1.0 - f
            if j + 1 < n_in:
                m[i, j + 1] += f
        return m

    return interp_matrix(n, nl) @ interp_matrix(nl, n)


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("options", "is_label"))
def visual_perception_augmentation(
    image: jnp.ndarray,
    label: jnp.ndarray,
    key,
    options: AugOptions = AugOptions(),
    is_label: bool = True,
):
    """Augment one sample.  image (D,H,W,C) f32 in [0,1]; label (D,H,W) f32.

    Returns (image', label').
    """
    feed = _KeyFeed(key)
    d, h, w = label.shape
    shape_dhw = (d, h, w)
    max_dim = float(max(d, h, w))
    opt = options

    # -- 1. downsample-and-back low-pass (.cpp:205-220) ---------------------
    for axis_name, axis, opt_gate, ratio in (
        ("x", 2, opt.downsample_x, opt.downsample_x_ratio),
        ("y", 1, opt.downsample_y, opt.downsample_y_ratio),
        ("z", 0, opt.downsample_z, opt.downsample_z_ratio),
    ):
        g = _gate(opt_gate, feed)
        if g is False:
            continue
        m = jnp.asarray(_roundtrip_matrix(label.shape[axis], ratio))

        def blur(img, m=m, axis=axis):
            return jnp.moveaxis(
                jnp.tensordot(m, jnp.moveaxis(img, axis, 0), axes=([1], [0])),
                0,
                axis,
            )

        image = _apply(g, blur, image)

    # -- 2. cropping (.cpp:222-230; see deviation note above) ---------------
    g = _gate(opt.cropping, feed)
    if g is not False:
        k_size, k_val, k_loc = feed(), feed(), feed()

        def crop(img, lab):
            r = (
                _uniform(k_size, opt.cropping_size_min, opt.cropping_size_max)
                * w
            )
            value = _uniform(k_val, 0.0, 2.0)
            frac = jax.random.uniform(k_loc, (3,))
            dims = jnp.asarray([w - 1, h - 1, d - 1], jnp.float32)
            lo = r
            hi = dims - r
            center = lo + frac * jnp.maximum(hi - lo, 0.0)  # (x,y,z)
            grid = meshgrid_xyz(shape_dhw)
            inside = jnp.all(jnp.abs(grid - center) <= r, axis=-1)
            hole = inside & (lab != 0)
            img = jnp.where(hole[..., None], value, img)
            lab = jnp.where(hole, 0.0, lab)
            return img, lab

        image, label = _apply(g, crop, image, label)

    # -- 3. truncation z (.cpp:231-250) --------------------------------------
    g = _gate(opt.truncation_z, feed)
    if g is not False:
        k_top, k_bot = feed(), feed()

        def trunc(img, lab):
            n_top = jnp.floor(jnp.abs(_uniform(k_top, -1, 1)) * 0.5 * d)
            n_bot = jnp.floor(jnp.abs(_uniform(k_bot, -1, 1)) * 0.5 * d)
            zi = jax.lax.broadcasted_iota(jnp.float32, (d, 1, 1), 0)
            keep = (zi < d - n_top) & (zi >= n_bot)
            return img * keep[..., None], lab * keep

        image, label = _apply(g, trunc, image, label)

    # -- 4. noise (.cpp:252-258): uniform [0, mag) additive -----------------
    g = _gate(opt.noise, feed)
    if g is not False:
        k_noise = feed()
        image = _apply(
            g,
            lambda img: img + _uniform(k_noise, 0.0, opt.noise_mag, img.shape),
            image,
        )

    # -- 5. lighting (.cpp:260-277) -----------------------------------------
    center = (
        jnp.asarray([w, h, d], jnp.float32) * 0.5
    )  # tipl uses shape*0.5 (not (shape-1)/2) here
    grid = None

    g = _gate(opt.ambient, feed)
    if g is not False:
        k_amb = feed()
        image = _apply(
            g, lambda img: img + _uniform(k_amb, 0.0, 1.0) * opt.ambient_mag, image
        )

    g = _gate(opt.diffuse, feed)
    if g is not False:
        k_dir = feed()
        grid = meshgrid_xyz(shape_dhw) if grid is None else grid

        def diffuse(img):
            f = _uniform(k_dir, -0.5, 0.5, (3,))
            f = f / jnp.maximum(jnp.linalg.norm(f), 1e-12)
            f = f * (opt.diffuse_mag / max_dim)
            gain = jnp.maximum(0.0, 1.0 + jnp.einsum("...i,i->...", grid - center, f))
            return img * gain[..., None]

        image = _apply(g, diffuse, image)

    g = _gate(opt.specular, feed)
    if g is not False:
        k_loc = feed()
        grid = meshgrid_xyz(shape_dhw) if grid is None else grid

        def specular(img):
            frac = _uniform(k_loc, 0.4, 0.6, (3,))
            c = frac * jnp.asarray([w - 1, h - 1, d - 1], jnp.float32)
            freq = opt.specular_freq * (np.pi * 0.5) / max_dim
            mag = opt.specular_mag
            dist = jnp.linalg.norm(grid - c, axis=-1)
            gain = (jnp.cos(dist * freq) + 1.0) * mag + (1.0 - 2.0 * mag)
            return img * gain[..., None]

        image = _apply(g, specular, image)

    # -- 6. fused geometry pass (.cpp:281-335) --------------------------------
    # rigid affine + zoom + aspect
    k_res, k_trans, k_rot, k_aspect, k_persp = feed(), feed(), feed(), feed(), feed()
    resolution = _uniform(k_res, 1.0 / opt.scaling_up, 1.0 / opt.scaling_down)
    translation = _uniform(k_trans, -1.0, 1.0, (3,)) * (
        opt.translocation_ratio * jnp.asarray([w, h, d], jnp.float32)
    )
    rotation = _uniform(k_rot, -1.0, 1.0, (3,)) * jnp.asarray(
        [opt.rotation_x, opt.rotation_y, opt.rotation_z], jnp.float32
    )
    aspect = _uniform(k_aspect, 1.0 / opt.aspect_ratio, opt.aspect_ratio, (3,))
    scaling = resolution * aspect
    trans34 = affine_matrix(
        translation=tuple(translation[i] for i in range(3)),
        rotation=tuple(rotation[i] for i in range(3)),
        scaling=tuple(scaling[i] for i in range(3)),
        shape_dhw=shape_dhw,
    )

    pos = meshgrid_xyz(shape_dhw)

    # lens distortion (always applied when the option is > 0, .cpp:304-305)
    if opt.lens_distortion > 0.0:
        k_lens = feed()
        mag = _uniform(k_lens, 0.0, 1.0) * opt.lens_distortion
        radius = max_dim / 2.0
        c_int = jnp.asarray([w // 2, h // 2, d // 2], jnp.float32)
        dirv = pos - c_int
        len2 = jnp.sum(dirv * dirv, axis=-1, keepdims=True)
        pos = pos + dirv * (-(mag / (radius * radius)) * len2)

    # N sinusoidal distortion foci (.cpp:306-317)
    g_dist = _gate(opt.distortion, feed)
    if g_dist is not False:
        k_num = feed()
        max_foci = int(opt.distortion_count)
        foci_keys = [(feed(), feed(), feed()) for _ in range(max_foci)]

        def add_foci(pos):
            num = jnp.floor(_uniform(k_num, 1.0, opt.distortion_count + 1.0))
            base = meshgrid_xyz(shape_dhw)
            disp = jnp.zeros_like(pos)
            for i, (k_c, k_r, k_m) in enumerate(foci_keys):
                frac = _uniform(k_c, 0.3, 0.7, (3,))
                c = frac * jnp.asarray([w - 1, h - 1, d - 1], jnp.float32)
                radius = w * _uniform(
                    k_r, opt.distortion_radius_min, opt.distortion_radius_max
                )
                mag = _uniform(k_m, opt.distortion_mag_min, opt.distortion_mag_max)
                active = (jnp.float32(i) < num).astype(jnp.float32)
                dirv = base - c
                length = jnp.linalg.norm(dirv, axis=-1, keepdims=True)
                inside = (length <= radius) & (length > 1e-6)
                coef = jnp.where(
                    inside,
                    -radius * mag * jnp.sin(length * (np.pi / radius)) / length,
                    0.0,
                )
                disp = disp + dirv * coef * active
            return pos + disp

        pos = _apply(g_dist, add_foci, pos)

    # perspective (.cpp:297-301,320)
    if opt.perspective > 0.0:
        persp = _uniform(k_persp, -0.5, 0.5, (3,)) * (
            opt.perspective / jnp.asarray([w, h, d], jnp.float32)
        )
        denom = jnp.einsum("...i,i->...", pos - center, persp) + 1.0
        pos = pos / denom[..., None]

    # rigid motion (.cpp:320)
    coords = pos @ trans34[:, :3].T + trans34[:, 3]

    # warp is gather-bound on TPU: fuse image ch0 + label into one packed
    # 8-corner fetch (sample_warp_image_label) when labels are categorical;
    # with moderate option bounds, the supercell variant cuts the gather
    # transactions 8x (one row per 2x2x2 output block)
    if is_label:
        use_sc_warp = _supercell_warp_ok(opt, shape_dhw)
        if use_sc_warp:
            # geometry depends only on coords + volume shape: compute it
            # once and share it across the packed warp and any extra
            # per-channel samplers (it is ~20% of the supercell cost)
            anchors = (d // 2, h // 2, w // 2)
            # native (unblockified) geometry when the native-layout tail
            # will consume it; extra-channel samplers blockify on use
            geom = _supercell_geometry(
                coords, shape_dhw, anchors,
                blockify=not warp_native_active(),
            )
            ch0, out_label = sample_warp_image_label_supercell(
                image[..., 0], label, coords, geometry=geom
            )
        else:
            geom = None
            ch0, out_label = sample_warp_image_label(image[..., 0], label, coords)
        if image.shape[-1] == 1:
            out_image = ch0[..., None]
        elif use_sc_warp and image.shape[-1] <= 2:
            # each extra channel needs its own 27x-volume window table
            # (~890 MB at the flagship grid), so cap the supercell route
            # at one extra channel; wider inputs keep the 8x-volume
            # corner-cell gather to bound transient HBM
            rest = jnp.stack(
                [
                    SupercellLinearSampler(image[..., c]).sample(
                        coords, geometry=geom
                    )
                    for c in range(1, image.shape[-1])
                ],
                axis=-1,
            )
            out_image = jnp.concatenate([ch0[..., None], rest], axis=-1)
        else:
            rest = sample_linear(image[..., 1:], coords)
            out_image = jnp.concatenate([ch0[..., None], rest], axis=-1)
    elif image.shape[-1] == 1 and _supercell_warp_ok(opt, shape_dhw):
        # subject mode warps image AND (continuous) label linearly through
        # the same field: two supercell samplers cut the gather
        # transactions 8x each (both exact under the same option gate),
        # sharing one geometry pass
        anchors = (d // 2, h // 2, w // 2)
        geom = _supercell_geometry(coords, shape_dhw, anchors)
        out_image = SupercellLinearSampler(image[..., 0]).sample(
            coords, geometry=geom
        )[..., None]
        out_label = SupercellLinearSampler(label).sample(coords, geometry=geom)
    else:
        out_image = sample_linear(image, coords)
        out_label = sample_linear(label, coords)

    # -- 7. clamp + normalize per channel (.cpp:339-343) ---------------------
    out_image = jnp.maximum(out_image, 0.0)
    out_image = jax.vmap(_normalize, in_axes=-1, out_axes=-1)(out_image)

    # -- 8. background synthesis (label mode only, .cpp:345-426) -------------
    if is_label:
        bg_mask = out_label == 0

        # draw all gates/keys up front (key-feed order is trace-static)
        g_zero = _gate(opt.zero_background, feed)
        g_stamp = _gate(opt.rubber_stamping, feed)
        k_args = feed()
        g_perlin = _gate(opt.perlin_texture, feed)
        k_zoom, k_mag, k_seed = feed(), feed(), feed()

        def blend(src, b):
            return src + b * jnp.maximum(0.1, 1.0 - src)

        def zero_fn(img):
            return jnp.where(bg_mask[..., None], 0.0, img)

        def stamp(img):
            # stamps are smooth background clutter: render them at QUARTER
            # resolution (1/64 the gather traffic) and nearest-upsample —
            # the stamp warps were the augmentation's largest tail term
            # (+55 ms/item measured at half-res on chip, round-3 notes);
            # documented deviation vs the reference's full-res stamps
            # (.cpp:345-426), distribution-tested.  With a single channel,
            # one supercell table (built once) serves all 5 stamp warps at
            # a further 1/8 of the gather transactions each.
            masked = image * (label != 0)[..., None]
            r = 4 if all(s % 4 == 0 for s in shape_dhw) else (
                2 if all(s % 2 == 0 for s in shape_dhw) else 1
            )
            low = (d // r, h // r, w // r)
            grid_low = meshgrid_xyz(low) * float(r)
            use_sc = (
                r > 1
                and image.shape[-1] == 1
                and not os.environ.get("UNET_TPU_NO_SUPERCELL")
                and supercell_warp_shape_ok(low)
            )
            if use_sc:
                # sample from an rx-mean-pooled source in LOW-RES voxel
                # units: the low-res output grid strides r source voxels
                # per step, which would blow the per-block spread past
                # the supercell window; in low-res units the Jacobian is
                # back to the stamp affine's own scale (<= ~2.2).  Mip-
                # consistent with the low-res stamp rendering (documented
                # deviation); the table is 1/r^3 the full-res one.
                mlow = masked[..., 0].reshape(
                    d // r, r, h // r, r, w // r, r
                ).mean(axis=(1, 3, 5))
                sampler = SupercellLinearSampler(mlow)
            else:
                sampler = None
            out = img
            for it in range(5):
                ks = jax.random.split(jax.random.fold_in(k_args, it), 4)
                t = _uniform(ks[0], -0.5, 0.5, (3,)) * jnp.asarray(
                    [w, h, d], jnp.float32
                )
                rot = _uniform(ks[1], -2 * np.pi, 2 * np.pi, (3,))
                sc = _uniform(ks[2], 0.8, 1.25, (3,))
                m34 = affine_matrix(
                    tuple(t[i] for i in range(3)),
                    tuple(rot[i] for i in range(3)),
                    tuple(sc[i] for i in range(3)),
                    shape_dhw,
                )
                coords = grid_low @ m34[:, :3].T + m34[:, 3]
                if use_sc:
                    bg = sampler.sample(coords * (1.0 / r))[..., None]
                else:
                    bg = sample_linear(masked, coords)
                bg = jnp.maximum(bg, 0.0)
                targets = (
                    _uniform(ks[3], 0.0, 1.0, (bg.shape[-1],))
                    * opt.rubber_stamping_mag
                )
                bg = jax.vmap(_normalize_to, in_axes=(-1, 0), out_axes=-1)(bg, targets)
                if r > 1:
                    bg = jnp.repeat(
                        jnp.repeat(jnp.repeat(bg, r, 0), r, 1), r, 2
                    )[: img.shape[0], : img.shape[1], : img.shape[2]]
                out = jnp.where(bg_mask[..., None], blend(out, bg), out)
            return out

        def perlin(img):
            # half-res noise field, nearest-upsampled: the fractal field's
            # shortest default wavelength (~20 voxels at zoom 0.05, octave
            # x8) is far above half-res Nyquist, so the texture statistics
            # are unchanged while the ALU cost (4 octaves x 8 corner
            # hashes per voxel) drops 8x (+19.7 -> ~2.5 ms/item measured).
            # Sampling at even full-res coordinates (zoom x2 per half-res
            # step) keeps the field anchored to the same lattice.
            zoom = _uniform(k_zoom, 0.005, 0.05)
            seed = jax.random.randint(k_seed, (), 0, 2**31 - 1)
            hd, hh, hw = (d + 1) // 2, (h + 1) // 2, (w + 1) // 2
            bg = perlin_octaves((hd, hh, hw), zoom * 2.0, seed)
            bg = _normalize_to(bg, _uniform(k_mag, 0.0, 1.0) * opt.perlin_texture_mag)
            bg = jnp.repeat(jnp.repeat(jnp.repeat(bg, 2, 0), 2, 1), 2, 2)[
                :d, :h, :w
            ]
            return jnp.where(bg_mask[..., None], blend(img, bg[..., None]), img)

        def synth_fn(img):
            img = _apply(g_stamp, stamp, img)
            img = _apply(g_perlin, perlin, img)
            img = jnp.maximum(img, 0.0)
            return jax.vmap(_normalize, in_axes=-1, out_axes=-1)(img)

        if g_zero is True:
            out_image = zero_fn(out_image)
        elif g_zero is False:
            out_image = synth_fn(out_image)
        else:
            out_image = jax.lax.cond(g_zero, zero_fn, synth_fn, out_image)

    return out_image, out_label
