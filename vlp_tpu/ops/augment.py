"""On-device batch augmentation + normalization (fused XLA program).

TPU-native replacement for the reference's per-sample CPU MONAI train
transforms (reference DownstreamDataModule.py:182-194 /
PretrainDataModule.py:186-198):

    RandAffined(p=.3, translate ±20px[, shear 5°], bilinear, border)
    RandRotated(p=.3, ±30°)  RandFlipd(p=.3, axis 0)
    RandZoomd(p=.3, 1.1–1.3)  RandGaussianNoised(p=.5, σ≤.01)
    then NormalizeIntensityd(mean,std) | ScaleIntensityRanged(0..255→−1024..1024)
    and channel repeat to 3.

Design: the three geometric transforms (translate, rotate, zoom[, shear])
are composed into ONE inverse affine map per sample and applied with a
single bilinear gather (border/clamp padding) — one memory pass instead of
three sequential warps. Each transform still fires independently with its
reference probability, so the distribution over applied ops matches; only
the interpolation error differs (one resampling instead of up to three,
which is strictly more accurate). Flip is exact and applied after the warp
(reference order: affine → rotate → flip → zoom; flip commutes with the
centered zoom up to the center-pixel convention). Everything runs under one
``jit`` on uint8 inputs so HBM traffic is 1 byte/pixel until the warp.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugmentConfig(NamedTuple):
    translate_px: float = 20.0
    translate_prob: float = 0.3
    rotate_rad: float = jnp.pi / 6
    rotate_prob: float = 0.3
    zoom_min: float = 1.1
    zoom_max: float = 1.3
    zoom_prob: float = 0.3
    flip_prob: float = 0.3
    noise_std: float = 0.01
    noise_prob: float = 0.5
    shear_deg: float = 0.0  # pretrain uses 5 (PretrainDataModule.py:186-198)
    enabled: bool = True
    # "shear": 3-shear + matmul-zoom warp (TPU-fast, vlp_tpu.ops.warp);
    # "gather": per-pixel bilinear gather (reference semantics, fine on CPU,
    # ~30x slower on TPU — kept as the numerical reference).
    method: str = "shear"


def _sample_params(key: jax.Array, cfg: AugmentConfig, batch: int):
    """Independent keys per (gate, magnitude) draw: sharing a key would make
    the magnitude conditional on firing (bernoulli(k,p) == uniform(k) < p, so
    the applied value lands in the bottom p-quantile). Shear fires on the
    SAME Bernoulli as translate: the reference applies both under one
    RandAffined p=0.3 draw (PretrainDataModule.py:186-198)."""
    ks = jax.random.split(key, 11)
    u = lambda k, lo, hi: jax.random.uniform(
        k, (batch,), minval=float(lo), maxval=float(hi))
    b = lambda k, p: jax.random.bernoulli(k, float(p), (batch,))
    apply_affine = b(ks[0], cfg.translate_prob)
    tx = jnp.where(apply_affine,
                   u(ks[1], -cfg.translate_px, cfg.translate_px), 0.0)
    ty = jnp.where(apply_affine,
                   u(ks[2], -cfg.translate_px, cfg.translate_px), 0.0)
    shear = jnp.where(
        apply_affine & (cfg.shear_deg > 0),
        u(ks[3], -cfg.shear_deg, cfg.shear_deg) * jnp.pi / 180.0, 0.0)
    theta = jnp.where(b(ks[4], cfg.rotate_prob),
                      u(ks[5], -cfg.rotate_rad, cfg.rotate_rad), 0.0)
    zoom = jnp.where(b(ks[6], cfg.zoom_prob),
                     u(ks[7], cfg.zoom_min, cfg.zoom_max), 1.0)
    flip = b(ks[8], cfg.flip_prob)
    noise_std = jnp.where(b(ks[9], cfg.noise_prob),
                          u(ks[10], 0.0, cfg.noise_std), 0.0)
    return tx, ty, theta, zoom, shear, flip, noise_std


def _bilinear_warp(img: jax.Array, src_y: jax.Array, src_x: jax.Array) -> jax.Array:
    """Sample img[H,W] at float coords (border/clamp padding)."""
    h, w = img.shape
    sy = jnp.clip(src_y, 0.0, h - 1.0)
    sx = jnp.clip(src_x, 0.0, w - 1.0)
    y0 = jnp.floor(sy).astype(jnp.int32)
    x0 = jnp.floor(sx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = sy - y0
    wx = sx - x0
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _warp_one(img: jax.Array, tx, ty, theta, zoom, shear) -> jax.Array:
    """Apply composed inverse affine to one [H,W] image.

    Forward order (reference): translate -> rotate -> [shear] -> zoom, all
    about the image center. Inverse map for output pixel p (centered):
      src = R(-θ) · Sh(-s) · p/z + c - t
    """
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    # zoom (magnify by z => src coords shrink)
    ys, xs = yy / zoom, xx / zoom
    # shear (x' = x + s*y forward => inverse x = x' - s*y')
    xs = xs - jnp.tan(shear) * ys
    # rotation by -theta
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    yr = cos_t * ys + sin_t * xs
    xr = -sin_t * ys + cos_t * xs
    # translation (content moved by +t => sample at -t)
    src_y = yr + cy - ty
    src_x = xr + cx - tx
    return _bilinear_warp(img, src_y, src_x)


def augment_and_normalize(
    images_u8: jax.Array,  # [B, H, W] uint8
    rng: jax.Array,
    mean: jax.Array,  # scalar fold mean (0..255 scale)
    std: jax.Array,  # scalar fold std
    cfg: AugmentConfig = AugmentConfig(),
    out_channels: int = 3,
    dtype: jnp.dtype = jnp.bfloat16,
    scale_intensity: bool = False,
) -> jax.Array:
    """uint8 batch -> augmented, normalized [B, H, W, C] in compute dtype.

    scale_intensity=True selects the torchxrayvision path
    0..255 -> −1024..1024 (reference DownstreamDataModule.py:274).

    Thin dispatcher: the jitted body consults the kernel gate at TRACE
    time, so the gate's process-global state rides in as the static
    ``dispatch_key`` — registering a mesh (or toggling VLP_DISABLE_PALLAS)
    forces a retrace instead of silently reusing a stale-dispatch jaxpr.
    """
    from vlp_tpu.ops.kernel_gate import kernel_dispatch_key

    return _augment_and_normalize_jit(
        images_u8, rng, mean, std, cfg=cfg, out_channels=out_channels,
        dtype=dtype, scale_intensity=scale_intensity,
        dispatch_key=kernel_dispatch_key())


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "out_channels", "dtype", "scale_intensity",
                     "dispatch_key"),
)
def _augment_and_normalize_jit(
    images_u8: jax.Array,
    rng: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    cfg: AugmentConfig,
    out_channels: int,
    dtype: jnp.dtype,
    scale_intensity: bool,
    dispatch_key=None,
) -> jax.Array:
    from vlp_tpu.ops.kernel_gate import mosaic_ok, shard_wrap

    x = images_u8.astype(jnp.float32)
    b = x.shape[0]
    if cfg.enabled:
        pkey, nkey = jax.random.split(rng)
        tx, ty, theta, zoom, shear, flip, noise_std = _sample_params(pkey, cfg, b)
        # under a multi-device mesh the Pallas shear/noise kernels are
        # shard_map-wrapped like every other kernel (a raw pallas_call
        # cannot be GSPMD-partitioned); indivisible batches fall back
        shear_ok = jax.default_backend() != "tpu" or mosaic_ok()
        warp_call = None
        if cfg.method == "shear" and shear_ok:
            from vlp_tpu.ops.warp import affine_warp_shear

            warp_call = shard_wrap(affine_warp_shear, b,
                                   in_batched=(True,) * 6,
                                   out_batched=True)
        if warp_call is not None:
            x = warp_call(x, theta, zoom, tx, ty, shear)
        else:
            x = jax.vmap(_warp_one)(x, tx, ty, theta, zoom, shear)
        x = jnp.where(flip[:, None, None], x[:, ::-1, :], x)
        # σ in raw intensity units, matching MONAI RandGaussianNoised which
        # adds N(0, σ≤0.01) to the unnormalized 0..255 image.
        noise_call = None
        if mosaic_ok() and x.shape[-1] % 2 == 0:
            # hardware-PRNG Box-Muller kernel: the threefry normal draw
            # alone costs ~4.1 ms/batch (~12% of the VLP step); same
            # distribution, different deterministic stream
            from vlp_tpu.ops.pallas_noise import add_gaussian_noise

            noise_call = shard_wrap(add_gaussian_noise, b,
                                    in_batched=(True, True, True),
                                    out_batched=True)
        if noise_call is not None:
            seeds = jax.random.randint(
                nkey, (b, 2), jnp.iinfo(jnp.int32).min,
                jnp.iinfo(jnp.int32).max)  # 2 words: no birthday collisions
            x = noise_call(x, seeds, noise_std)
        else:
            noise = jax.random.normal(nkey, x.shape) * noise_std[:, None, None]
            x = x + noise
    if scale_intensity:
        x = x * (2048.0 / 255.0) - 1024.0
    else:
        x = (x - mean) / std
    x = x[..., None]
    if out_channels > 1:
        x = jnp.repeat(x, out_channels, axis=-1)
    return x.astype(dtype)


# test/bench compat: the old jitted entry exposed clear_cache()
augment_and_normalize.clear_cache = _augment_and_normalize_jit.clear_cache


# dispatch-free (no kernel-gate consultation): a plain module-level jit
# cache is safe here
@functools.partial(
    jax.jit, static_argnames=("out_channels", "dtype", "scale_intensity")
)
def normalize_only(
    images_u8: jax.Array,
    mean: jax.Array,
    std: jax.Array,
    out_channels: int = 3,
    dtype: jnp.dtype = jnp.bfloat16,
    scale_intensity: bool = False,
) -> jax.Array:
    """Deterministic val/test path: normalize + channel repeat only."""
    x = images_u8.astype(jnp.float32)
    if scale_intensity:
        x = x * (2048.0 / 255.0) - 1024.0
    else:
        x = (x - mean) / std
    x = x[..., None]
    if out_channels > 1:
        x = jnp.repeat(x, out_channels, axis=-1)
    return x.astype(dtype)
