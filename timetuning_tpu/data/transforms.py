"""Clip-consistent augmentations as ONE fused on-device kernel.

The reference augments on the host, frame by frame, through a chain of
PIL/cv2 transform objects that sample one parameter set per clip and apply it
to every frame plus (nearest-neighbor) to the aligned annotation clip
(reference video_transformations.py; training pipeline assembled at
time_tuning.py:587-593: ColorJitter(0.8,0.8,0.8,0.2)@p0.8 → RandomGrayscale
→ RandomGaussianBlur, then Resize → RandomResizedCrop(scale 0.4-1, ratio
3/4-4/3) → RandomHorizontalFlip → ClipToTensor(mean, std=[.228,.224,.225])).

Here the whole chain compiles into a single jitted, vmapped XLA program:
uint8 clips go in, normalized float clips (and co-transformed annotations)
come out, with every random parameter drawn from a `jax.random` key — so
augmentation runs on TPU at HBM bandwidth and is exactly reproducible.

Host-side precondition: frames are decoded and resized to a fixed square
``decode_size`` (static shapes). Reference train-time semantics are restored
on top of that square buffer by passing the clip's NATIVE size
(``src_sizes``):
(1) aspect ratio — the RRC box is sampled in the geometry of the
reference's short-side ``Resize(out_size)`` image (``get_resize_sizes``,
video_transformations.py:96-103) and then mapped affinely onto the square
buffer, so the crop-parameter distribution matches torchvision RRC on the
aspect-preserved image exactly (tested vs torchvision on non-square
inputs); the cropped content equals the reference's up to resampling-chain
interpolation.
(2) blur scale — the reference blurs at NATIVE resolution with a fresh PIL
radius per frame (video_transformations.py:640); here the per-frame sigma
is scaled per-axis by buffer/native so the blur footprint in image units
matches (blur⇄resize commute up to the Gaussian/bilinear approximation).
(3) contrast mean — the reference's ColorJitter runs on the NATIVE frame,
so its contrast blend target is PIL's rounded grayscale mean of the
aspect-correct image; the loader computes that mean at decode time (the
only place the native frame exists) and threads it in as ``gray_means``,
and the kernel reproduces PIL's integer semantics exactly
(:func:`_pil_gray_mean`). Without ``src_sizes``/``gray_means`` the old
square-geometry behavior is preserved (the mean then comes from the
decode buffer — same PIL integer formula, resampling-level difference
only).

Geometric ops use ``scale_and_translate`` (bilinear, frames) and nearest
gather (annotations); photometric ops follow torchvision formulas, applied in
a random order like torchvision ColorJitter.
"""

from __future__ import annotations

import dataclasses
import functools


import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
# The reference's (typo'd) ImageNet std — kept for checkpoint-parity
# (time_tuning.py:592; leoloader uses the canonical 0.229 — see pascal.py).
REFERENCE_STD = (0.228, 0.224, 0.225)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    out_size: int = 224
    crop_scale: tuple[float, float] = (0.4, 1.0)
    crop_ratio: tuple[float, float] = (3.0 / 4.0, 4.0 / 3.0)
    hflip_p: float = 0.5
    jitter_p: float = 0.8
    brightness: float = 0.8
    contrast: float = 0.8
    saturation: float = 0.8
    hue: float = 0.2
    grayscale_p: float = 0.2
    blur_p: float = 0.5
    blur_sigma: tuple[float, float] = (0.1, 2.0)
    blur_ksize: int = 23
    mean: tuple[float, float, float] = IMAGENET_MEAN
    std: tuple[float, float, float] = REFERENCE_STD


# --------------------------------------------------------------------- #
# photometric ops (torchvision functional semantics, [F, H, W, 3] in [0,1])

def _blend(a, b, factor):
    return jnp.clip(a * factor + b * (1.0 - factor), 0.0, 1.0)


def _grayscale(x):
    g = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    return g[..., None]


def _adj_brightness(x, f):
    return jnp.clip(x * f, 0.0, 1.0)


def _pil_gray_mean(x):
    """Per-frame grayscale mean in PIL's exact integer semantics, [0, 255].

    PIL ``convert("L")`` computes ``(19595 R + 38470 G + 7471 B + 0x8000)
    >> 16`` per pixel (ITU-R 601-2 in 16.16 fixed point, rounded);
    ``ImageEnhance.Contrast`` then averages those integers. All the
    intermediate integers stay below 2^24, so float32 reproduces them
    exactly. x: [..., H, W, 3] floats that are exactly uint8/255."""
    u = jnp.round(x * 255.0)
    l = jnp.floor(
        (19595.0 * u[..., 0] + 38470.0 * u[..., 1] + 7471.0 * u[..., 2]
         + 32768.0) / 65536.0
    )
    return jnp.mean(l, axis=(-2, -1))


def _adj_contrast(x, f, mean255=None):
    """PIL/torchvision ``adjust_contrast``: blend toward a solid gray of
    the frame's ROUNDED grayscale mean (``int(mean + 0.5)``,
    PIL.ImageEnhance.Contrast). ``mean255``: optional per-frame means in
    [0, 255] computed on the NATIVE aspect-correct frame at decode time —
    the reference applies ColorJitter before its short-side Resize
    (data_loader.py:657-661), so the mean it sees is the native frame's;
    without it the mean comes from the decode buffer (same PIL integer
    semantics; differs only by the decode resize's resampling)."""
    if mean255 is None:
        mean255 = _pil_gray_mean(x)
    else:
        # NaN marks "native mean unavailable" (e.g. a legacy pack): fall
        # back to the buffer mean without changing the traced program
        mean255 = jnp.where(
            jnp.isnan(mean255), _pil_gray_mean(x), jnp.asarray(mean255)
        )
    target = jnp.floor(mean255 + 0.5) / 255.0
    target = jnp.broadcast_to(target[..., None, None, None], x.shape)
    return _blend(x, target, f)


def _adj_saturation(x, f):
    g = jnp.broadcast_to(_grayscale(x), x.shape)
    return _blend(x, g, f)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe = jnp.where(d == 0, 1.0, d)
    h = jnp.where(
        mx == r, (g - b) / safe,
        jnp.where(mx == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(d == 0, 0.0, h) / 6.0
    h = jnp.mod(h, 1.0)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    # select_n (elementwise case select) — jnp.choose lowers to gathers and
    # measured 518 ms for a [32, 4, 256, 256, 3] batch on v5e; select_n is
    # ~10 ms like the other photometric ops
    r = jax.lax.select_n(i, v, q, p, p, t, v)
    g = jax.lax.select_n(i, t, v, v, q, p, p)
    b = jax.lax.select_n(i, p, p, t, v, v, q)
    return jnp.stack([r, g, b], axis=-1)


def _adj_hue(x, shift):
    h, s, v = _rgb_to_hsv(x)
    return _hsv_to_rgb(jnp.mod(h + shift, 1.0), s, v)


def _color_jitter(key, x, cfg: AugmentConfig, gray_means=None):
    """One sampled parameter set per clip, ONE op applied.

    Reference quirk (video_transformations.py:768-780): the shuffled
    transform list is applied as ``jittered_img = func(img)`` — each func
    reads the ORIGINAL frame and overwrites the result, so only the LAST
    op of the shuffled order takes effect. The last element of a uniform
    shuffle is uniform over the four ops, so the faithful semantics are:
    sample all four factors, apply exactly one uniformly-chosen op.
    (Also ~100× cheaper on TPU than the scan-of-switch a do-all-four
    pipeline needs — the vmapped scan+switch measured 1.8 s at B=32.)
    """
    kb, kc, ks, kh, kop, kapply = jax.random.split(key, 6)
    fb = jax.random.uniform(kb, (), minval=max(0.0, 1 - cfg.brightness), maxval=1 + cfg.brightness)
    fc = jax.random.uniform(kc, (), minval=max(0.0, 1 - cfg.contrast), maxval=1 + cfg.contrast)
    fs = jax.random.uniform(ks, (), minval=max(0.0, 1 - cfg.saturation), maxval=1 + cfg.saturation)
    fh = jax.random.uniform(kh, (), minval=-cfg.hue, maxval=cfg.hue)
    op_idx = jax.random.randint(kop, (), 0, 4)

    jittered = jax.lax.switch(
        op_idx,
        [
            lambda y: _adj_brightness(y, fb),
            lambda y: _adj_contrast(y, fc, gray_means),
            lambda y: _adj_saturation(y, fs),
            lambda y: _adj_hue(y, fh),
        ],
        x,
    )
    do = jax.random.uniform(kapply) < cfg.jitter_p
    return jnp.where(do, jittered, x)


def _gaussian_blur(key, x, cfg: AugmentConfig, scale_y=None, scale_x=None):
    """Clip-probability blur with a fresh sigma PER FRAME (the reference's
    PIL branch samples a new radius for every frame of the clip,
    video_transformations.py:640). ``scale_y``/``scale_x`` convert a
    native-resolution sigma into buffer-pixel units (buffer/native)."""
    kp, ksig = jax.random.split(key)
    F, H, W, C = x.shape
    sigma = jax.random.uniform(
        ksig, (F,), minval=cfg.blur_sigma[0], maxval=cfg.blur_sigma[1]
    )
    sy = sigma if scale_y is None else sigma * scale_y
    sx = sigma if scale_x is None else sigma * scale_x
    ks = cfg.blur_ksize
    r = jnp.arange(ks, dtype=jnp.float32) - (ks - 1) / 2
    ky = jnp.exp(-(r[None, :] ** 2) / (2.0 * sy[:, None] ** 2))
    ky = ky / jnp.sum(ky, axis=-1, keepdims=True)              # [F, ks]
    kx = jnp.exp(-(r[None, :] ** 2) / (2.0 * sx[:, None] ** 2))
    kx = kx / jnp.sum(kx, axis=-1, keepdims=True)
    # depthwise separable conv with a distinct kernel per frame: channels
    # laid out as F*C groups, one grouped conv per axis
    xc = jnp.transpose(x, (0, 3, 1, 2)).reshape(1, F * C, H, W)
    pad = ks // 2
    xc = jnp.pad(xc, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
    dn = jax.lax.conv_dimension_numbers(
        xc.shape, (F * C, 1, ks, 1), ("NCHW", "OIHW", "NCHW")
    )
    wy = jnp.repeat(ky, C, axis=0).reshape(F * C, 1, ks, 1)
    xc = jax.lax.conv_general_dilated(
        xc, wy, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=F * C,
    )
    wx = jnp.repeat(kx, C, axis=0).reshape(F * C, 1, 1, ks)
    xc = jax.lax.conv_general_dilated(
        xc, wx, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=F * C,
    )
    blurred = jnp.transpose(xc.reshape(F, C, H, W), (0, 2, 3, 1))
    do = jax.random.uniform(kp) < cfg.blur_p
    return jnp.where(do, blurred, x)


# --------------------------------------------------------------------- #
# geometric: random resized crop (torchvision sampling), flips

def _sample_rrc_box(key, h, w, cfg: AugmentConfig):
    """torchvision RandomResizedCrop.get_params: 10 rejection-sampling tries,
    fallback to a ratio-clamped center crop. Returns (i, j, ch, cw) floats.
    ``h``/``w`` may be traced (the short-side-resize geometry varies per
    clip)."""
    h = jnp.asarray(h, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    area = h * w
    keys = jax.random.split(key, 4)
    scale = jax.random.uniform(keys[0], (10,), minval=cfg.crop_scale[0], maxval=cfg.crop_scale[1])
    log_r = jax.random.uniform(
        keys[1], (10,),
        minval=np.log(cfg.crop_ratio[0]), maxval=np.log(cfg.crop_ratio[1]),
    )
    target_area = scale * area
    ratio = jnp.exp(log_r)
    cw = jnp.sqrt(target_area * ratio)
    ch = jnp.sqrt(target_area / ratio)
    valid = (cw <= w) & (ch <= h) & (cw > 0) & (ch > 0)
    pick = jnp.argmax(valid)           # first valid try
    any_valid = jnp.any(valid)
    cw_s, ch_s = cw[pick], ch[pick]
    iu = jax.random.uniform(keys[2], (), minval=0.0, maxval=1.0)
    ju = jax.random.uniform(keys[3], (), minval=0.0, maxval=1.0)
    i = iu * (h - ch_s)
    j = ju * (w - cw_s)
    # fallback: center crop of the full (clamped-ratio) image
    in_ratio = w / h
    fw = jnp.where(in_ratio < cfg.crop_ratio[0], w, jnp.where(in_ratio > cfg.crop_ratio[1], h * cfg.crop_ratio[1], w))
    fh = jnp.where(in_ratio < cfg.crop_ratio[0], w / cfg.crop_ratio[0], h)
    fi, fj = (h - fh) / 2.0, (w - fw) / 2.0
    i = jnp.where(any_valid, i, fi)
    j = jnp.where(any_valid, j, fj)
    ch_s = jnp.where(any_valid, ch_s, fh)
    cw_s = jnp.where(any_valid, cw_s, fw)
    return i, j, ch_s, cw_s


def _crop_resize_frames(x, i, j, ch, cw, out: int):
    """Bilinear crop+resize via scale_and_translate. x: [F, H, W, C]."""
    scale_y = out / ch
    scale_x = out / cw
    # output pixel p maps to input i + p/scale; scale_and_translate computes
    # in terms of translation t: in = (p - t)/scale → t = -i*scale
    return jax.image.scale_and_translate(
        x,
        x.shape[:1] + (out, out) + x.shape[3:],
        spatial_dims=(1, 2),
        scale=jnp.array([scale_y, scale_x]),
        translation=jnp.array([-i * scale_y, -j * scale_x]),
        method="bilinear",
    )


def _crop_resize_nearest(x, i, j, ch, cw, out: int):
    """Nearest gather for integer annotation maps. x: [F, H, W]."""
    F, H, W = x.shape
    ys = i + (jnp.arange(out) + 0.5) * (ch / out) - 0.5
    xs = j + (jnp.arange(out) + 0.5) * (cw / out) - 0.5
    yi = jnp.clip(jnp.round(ys), 0, H - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(xs), 0, W - 1).astype(jnp.int32)
    return x[:, yi][:, :, xi]


# --------------------------------------------------------------------- #

def reference_resize_geometry(h0, w0, size: int):
    """The reference's short-side ``Resize`` output dims (``get_resize_sizes``,
    video_transformations.py:96-103, incl. the int() truncation): returns
    (rh, rw) with min(rh, rw) == size and aspect preserved."""
    h0 = jnp.asarray(h0, jnp.float32)
    w0 = jnp.asarray(w0, jnp.float32)
    size = jnp.float32(size)
    rh = jnp.where(w0 < h0, jnp.floor(size * h0 / w0), size)
    rw = jnp.where(w0 < h0, size, jnp.floor(size * w0 / h0))
    return rh, rw


def augment_clip(key, frames, annotations, cfg: AugmentConfig, src_size=None,
                 gray_means=None):
    """frames: [F, H, W, 3] uint8; annotations: [F, H, W] uint8 or None;
    src_size: optional [2] (native H0, W0 before the square decode resize);
    gray_means: optional [F] native-frame PIL grayscale means (contrast
    jitter blends toward these — see :func:`_adj_contrast`).
    Returns (normalized float32 [F, out, out, 3], annotations [F, out, out]).

    With ``src_size`` the geometric pipeline reproduces the reference's
    train-time chain Resize(out, short-side) → RandomResizedCrop(out)
    (time_tuning.py:592): the RRC box is sampled in the aspect-preserved
    post-Resize geometry and mapped affinely onto the square decode buffer;
    blur sigma is rescaled into buffer units per axis."""
    kphoto1, kphoto2, kphoto3, kgeo, kflip = jax.random.split(key, 5)
    x = frames.astype(jnp.float32) / 255.0
    H, W = x.shape[1:3]

    if src_size is None:
        blur_scale_y = blur_scale_x = None
        geo_h, geo_w = jnp.float32(H), jnp.float32(W)
        box_y, box_x = jnp.float32(1.0), jnp.float32(1.0)
    else:
        h0 = jnp.asarray(src_size[0], jnp.float32)
        w0 = jnp.asarray(src_size[1], jnp.float32)
        blur_scale_y = H / h0
        blur_scale_x = W / w0
        geo_h, geo_w = reference_resize_geometry(h0, w0, cfg.out_size)
        box_y = H / geo_h
        box_x = W / geo_w

    # photometric (frame_transform chain, clip-consistent)
    x = _color_jitter(kphoto1, x, cfg, gray_means)
    do_gray = jax.random.uniform(kphoto2) < cfg.grayscale_p
    x = jnp.where(do_gray, jnp.broadcast_to(_grayscale(x), x.shape), x)
    x = _gaussian_blur(kphoto3, x, cfg, blur_scale_y, blur_scale_x)

    # geometric (video_transform chain, joint with annotations)
    i, j, ch, cw = _sample_rrc_box(kgeo, geo_h, geo_w, cfg)
    i, j, ch, cw = i * box_y, j * box_x, ch * box_y, cw * box_x
    x = _crop_resize_frames(x, i, j, ch, cw, cfg.out_size)
    do_flip = jax.random.uniform(kflip) < cfg.hflip_p
    x = jnp.where(do_flip, x[:, :, ::-1], x)

    mean = jnp.asarray(cfg.mean)
    std = jnp.asarray(cfg.std)
    x = (jnp.clip(x, 0.0, 1.0) - mean) / std

    ann_out = None
    if annotations is not None:
        a = _crop_resize_nearest(annotations, i, j, ch, cw, cfg.out_size)
        a = jnp.where(do_flip, a[:, :, ::-1], a)
        ann_out = a
    return x, ann_out


@functools.partial(jax.jit, static_argnames=("cfg", "with_annotations"))
def augment_batch(key, frames, annotations, cfg: AugmentConfig,
                  with_annotations: bool = True, src_sizes=None,
                  gray_means=None):
    """Batched fused augmentation. frames: [B, F, H, W, 3] uint8;
    src_sizes: optional [B, 2] native (H0, W0) per clip; gray_means:
    optional [B, F] native-frame PIL grayscale means."""
    B = frames.shape[0]
    keys = jax.random.split(key, B)
    ann = annotations if (with_annotations and annotations is not None) else None
    out, ann_out = jax.vmap(
        lambda k, f, a, s, g: augment_clip(k, f, a, cfg, s, g),
        in_axes=(0, 0,
                 0 if ann is not None else None,
                 0 if src_sizes is not None else None,
                 0 if gray_means is not None else None),
    )(keys, frames, ann, src_sizes, gray_means)
    return out, ann_out


# ------------------------------------------------------------------ #
# functional geometric helpers — API parity with the reference's transform
# classes that the training pipeline doesn't use (video_transformations.py:
# RandomVerticalFlip :199-237, CenterCrop :559-601, RandomCrop :373-419,
# RandomResize :322-349, RandomRotation :517-556). All clip-consistent
# ([F, H, W, C] or [F, H, W]) and jittable.


def vertical_flip(clip):
    return clip[:, ::-1]


def horizontal_flip(clip):
    return clip[:, :, ::-1]


def center_crop(clip, size: int):
    H, W = clip.shape[1:3]
    y0 = (H - size) // 2
    x0 = (W - size) // 2
    return clip[:, y0 : y0 + size, x0 : x0 + size]


def random_crop(key, clip, size: int):
    H, W = clip.shape[1:3]
    ky, kx = jax.random.split(key)
    y0 = jax.random.randint(ky, (), 0, H - size + 1)
    x0 = jax.random.randint(kx, (), 0, W - size + 1)
    idx_y = y0 + jnp.arange(size)
    idx_x = x0 + jnp.arange(size)
    return clip[:, idx_y][:, :, idx_x]


def random_resize(key, clip, ratio: tuple[float, float], out_size: int | None = None):
    """The reference ``RandomResize`` (video_transformations.py:322-349):
    one scale sampled uniformly from ``ratio`` per clip, bilinear resize of
    every frame to ``(round(H·s), round(W·s))``.

    The output shape depends on the sampled scale, so this exact form is
    host-eager (not jittable) — it syncs the scale to pick the shape. The
    fused training pipeline instead composes the scale into its
    RandomResizedCrop (static shapes); pass ``out_size`` to append the fixed
    resize that makes the composition shape-static.
    """
    lead = clip.shape[:1]
    tail = clip.shape[3:]
    s = float(jax.random.uniform(key, (), minval=ratio[0], maxval=ratio[1]))
    H, W = clip.shape[1:3]
    new_h, new_w = max(int(round(H * s)), 1), max(int(round(W * s)), 1)
    out = jax.image.resize(clip, lead + (new_h, new_w) + tail, method="bilinear")
    if out_size is not None:
        out = jax.image.resize(
            out, lead + (out_size, out_size) + tail, method="bilinear"
        )
    return out


def rotate90(clip, k: int = 1):
    """Right-angle rotation (jnp.rot90 fast path; see ``random_rotation``
    for the reference's arbitrary-angle transform)."""
    return jnp.rot90(clip, k=k, axes=(1, 2))


def _rotate_one(img, angle_rad, order: int):
    """Rotate one [H, W] plane by ``angle_rad`` (CCW, skimage/scipy
    convention), constant-0 fill, shape preserved (expand=False)."""
    H, W = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    yo, xo = yy - cy, xx - cx
    c, s = jnp.cos(-angle_rad), jnp.sin(-angle_rad)  # inverse map out→in
    yin = cy + c * yo - s * xo
    xin = cx + s * yo + c * xo
    return jax.scipy.ndimage.map_coordinates(
        img.astype(jnp.float32), [yin, xin], order=order, mode="constant"
    )


def random_rotation(key, clip, degrees, annotations=None):
    """The reference ``RandomRotation`` (video_transformations.py:517-556):
    ONE angle sampled uniformly from ``degrees`` (a scalar means
    ``(-d, +d)``) applied to every frame of the clip — bilinear for frames
    (the skimage.transform.rotate path), nearest for the annotation
    co-transform, constant-0 fill, shape preserved. Fully jittable (static
    shapes; the resampling is a gather).

    clip: [F, H, W, C]; annotations: optional [F, h, w] integer maps.
    Returns clip or (clip, annotations).
    """
    if isinstance(degrees, (int, float)):
        degrees = (-float(degrees), float(degrees))
    angle = jax.random.uniform(
        key, (), minval=degrees[0], maxval=degrees[1]
    ) * (jnp.pi / 180.0)

    frames = jax.vmap(
        jax.vmap(lambda p: _rotate_one(p, angle, order=1), in_axes=-1,
                 out_axes=-1)
    )(clip.astype(jnp.float32))
    if annotations is None:
        return frames
    ann = jax.vmap(lambda p: _rotate_one(p, angle, order=0))(
        annotations.astype(jnp.float32)
    ).astype(annotations.dtype)
    return frames, ann


@functools.partial(
    jax.jit, static_argnames=("out_size", "std", "compute_dtype")
)
def eval_preprocess_batch(frames, out_size: int = 224,
                          std: tuple = REFERENCE_STD, compute_dtype=None):
    """Deterministic eval path: resize + normalize
    (the reference eval pipeline: Resize → ClipToTensor → Normalize).

    ``compute_dtype`` (default f32 — bit-faithful to the reference's float
    resize) selects the cast/resize dtype: the bf16 perf path halves the
    dominant HBM traffic of high-res eval batches (a 480p frame is 4.9 MB
    in f32 before the resize reads it; measured the binding stage of the
    propagation-eval pipeline at clip_batch ≥ 8). Same contract as the
    fused-block dispatch: f32 = faithful, bf16 = perf at bf16 rounding."""
    dt = jnp.float32 if compute_dtype is None else compute_dtype
    x = frames.astype(dt) / jnp.asarray(255.0, dt)
    lead = x.shape[:-3]
    x = jax.image.resize(x, lead + (out_size, out_size, 3), method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN, dt)
    return (x - mean) / jnp.asarray(std, dt)


def eval_preprocess_flat(frames_flat, src_hw: tuple, out_size: int = 224,
                         std: tuple = REFERENCE_STD, compute_dtype=None):
    """`eval_preprocess_batch` over channel-interleaved-flat frames:
    ``[..., H, W*3]`` uint8 (a FREE numpy view of ``[..., H, W, 3]`` —
    same bytes) → ``[..., S, S, 3]``.

    This is the perf entry for high-res eval pipelines: on TPU with
    ``compute_dtype=bfloat16`` it routes to the fused Pallas kernel
    (ops/preprocess_pallas — resize+normalize in one pass per frame, raw
    bytes straight to the int8 MXU). Feeding the flat layout from the host
    matters: a live ``[.., H, W, 3]`` device array reshaped to
    ``[.., H, W*3]`` costs a measured ~1.3 ms/200-frame relayout on TPU,
    while the host-side ``np.reshape`` is free. Anywhere the kernel is
    unavailable (CPU, f32 faithful path, upscale, non-u8) this unflattens
    and runs the standard XLA path — same values at the path's dtype."""
    h, w = src_hw
    assert frames_flat.shape[-1] == w * 3, (frames_flat.shape, src_hw)
    lead = frames_flat.shape[:-2]
    frames4 = frames_flat.reshape(lead + (h, w, 3))
    dt = jnp.float32 if compute_dtype is None else compute_dtype
    from timetuning_tpu.ops.preprocess_pallas import (
        eval_preprocess_pallas,
        preprocess_pallas_available,
    )
    if preprocess_pallas_available(h, w, out_size, frames_flat.dtype, dt):
        return eval_preprocess_pallas(
            frames4, out_size, IMAGENET_MEAN, std, out_dtype=dt)
    return eval_preprocess_batch(
        frames4, out_size=out_size, std=std, compute_dtype=compute_dtype)
