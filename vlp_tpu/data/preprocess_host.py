"""Host-side deterministic image preprocessing + memory-mapped cache.

TPU-native redesign of the reference's per-sample MONAI CPU pipeline
(reference DownstreamDataModule.py:152-180):

    LoadImaged -> EnsureChannelFirstd -> DropChanneld(alpha) -> Grayscale ->
    HistogramNormalized -> (repeat 3ch) -> CropLargerDimension(5%) ->
    PadToSquaredEdgeAverage -> Resized(224,224)

The reference re-runs this in DataLoader workers for every sample every
epoch. Here the deterministic part runs ONCE per dataset into a memory-mapped
uint8 array (the channel repeat is deferred to the device); per-epoch work
(random augmentations + normalization) happens on-device in a fused XLA
program (vlp_tpu.ops.augment). This is the main throughput lever vs. the
reference.

Semantics notes (all verified against reference code):
- Grayscale uses ITU-R 601 luma weights like torchvision's Grayscale.
- HistogramNormalized == MONAI equalize_hist(num_bins=256, min=0, max=255):
  histogram of the flat image, cumulative sum rescaled to [0,255], then
  linear interp of pixel values against bin centers.
- CropLargerDimension: symmetric crop of the larger spatial dim by
  <= max_ratio, never below the smaller dim; crop_size_each = crop//2 on BOTH
  ends (so an odd crop removes one pixel less, exactly like
  reference CropLargerDimension.py:40-53).
- PadToSquaredEdgeAverage: pad shorter dim to square; fill = mean of the
  nearest edge row/col, distinct values for the two sides
  (reference PadToSquaredEdgeAverage.py:40-76).
- Resize: cv2 INTER_AREA (matches MONAI Resized's default 'area' mode).
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from vlp_tpu.data.splits import hash_list_of_strings
from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)

try:  # cv2 is present in the image; PIL is the fallback decoder.
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def decode_image(path: str) -> np.ndarray:
    """Decode to HWC uint8 (1 or 3 channels; alpha dropped)."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(f"Failed to decode image {path}")
        if img.ndim == 3 and img.shape[2] == 4:
            img = img[:, :, :3]  # DropChanneld(channel 3): strip alpha
        if img.ndim == 3 and img.shape[2] == 3:
            img = img[:, :, ::-1]  # BGR -> RGB
    else:  # pragma: no cover
        from PIL import Image

        pil = Image.open(path)
        if pil.mode == "RGBA":
            pil = pil.convert("RGB")
        img = np.asarray(pil)
    if img.ndim == 2:
        img = img[:, :, None]
    return np.ascontiguousarray(img, dtype=np.uint8)


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """HWC uint8 -> HW float32, luma weights (torchvision Grayscale)."""
    img = img.astype(np.float32)
    if img.shape[2] == 1:
        return img[:, :, 0]
    return img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114


def equalize_hist(
    img: np.ndarray, num_bins: int = 256, vmin: float = 0.0, vmax: float = 255.0
) -> np.ndarray:
    """MONAI HistogramNormalized semantics: cumulative histogram rescaled to
    [vmin, vmax], pixel values interpolated against bin centers."""
    flat = img.reshape(-1)
    hist, edges = np.histogram(flat, bins=num_bins)
    centers = (edges[:-1] + edges[1:]) / 2.0
    cum = hist.cumsum().astype(np.float64)
    lo, hi = cum.min(), cum.max()
    if hi > lo:
        cum = (cum - lo) / (hi - lo) * (vmax - vmin) + vmin
    else:  # constant image
        cum = np.full_like(cum, vmin)
    return np.interp(flat, centers, cum).reshape(img.shape).astype(np.float32)


def crop_larger_dimension(img: np.ndarray, maximum_crop_ratio: float = 0.05) -> np.ndarray:
    """HW float. Symmetric crop of the larger dim by <= ratio, never past
    square (reference CropLargerDimension.py:40-53)."""
    h, w = img.shape
    if h == w:
        return img
    if h > w:
        crop = int(h * maximum_crop_ratio)
        if h - crop < w:
            crop = h - w
        each = crop // 2
        return img[each : h - each, :]
    crop = int(w * maximum_crop_ratio)
    if w - crop < h:
        crop = w - h
    each = crop // 2
    return img[:, each : w - each]


def pad_to_square_edge_average(img: np.ndarray) -> np.ndarray:
    """HW float. Pad shorter dim to square with per-side edge-average fill
    (reference PadToSquaredEdgeAverage.py:40-76)."""
    h, w = img.shape
    if h == w:
        return img
    diff = abs(h - w)
    if h > w:
        left, right = diff // 2, diff - diff // 2
        lval = float(img[:, 0].mean())
        rval = float(img[:, -1].mean())
        return np.concatenate(
            [np.full((h, left), lval, np.float32), img,
             np.full((h, right), rval, np.float32)], axis=1)
    top, bottom = diff // 2, diff - diff // 2
    tval = float(img[0, :].mean())
    bval = float(img[-1, :].mean())
    return np.concatenate(
        [np.full((top, w), tval, np.float32), img,
         np.full((bottom, w), bval, np.float32)], axis=0)


def resize(img: np.ndarray, size: int) -> np.ndarray:
    if img.shape == (size, size):
        return img
    if _HAS_CV2:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_AREA).astype(
            np.float32
        )
    from PIL import Image  # pragma: no cover

    return np.asarray(
        Image.fromarray(img).resize((size, size), Image.BILINEAR), dtype=np.float32
    )


def preprocess_image(
    path_or_array,
    image_size: int = 224,
    crop: bool = False,
    maximum_crop_ratio: float = 0.05,
    equalize: bool = True,
    use_native: bool = False,
) -> np.ndarray:
    """Full deterministic pipeline -> [image_size, image_size] uint8.

    ``use_native=True`` routes through the C++ library
    (vlp_tpu/native/preprocess.cpp; ~6x faster per core, parity within 1
    uint8 LSB) and falls back to this NumPy reference implementation when
    the library is unavailable."""
    if isinstance(path_or_array, str):
        img = decode_image(path_or_array)
    else:
        img = np.asarray(path_or_array)
        if img.ndim == 2:
            img = img[:, :, None]
    if use_native:
        from vlp_tpu.native import preprocess_image_native

        out = preprocess_image_native(img, image_size, crop,
                                      maximum_crop_ratio, equalize)
        if out is not None:
            return out
    gray = to_grayscale(img)
    if equalize:
        gray = equalize_hist(gray)
    if crop:
        gray = crop_larger_dimension(gray, maximum_crop_ratio)
    gray = pad_to_square_edge_average(gray)
    gray = resize(gray, image_size)
    return np.clip(np.rint(gray), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Memory-mapped cache
# --------------------------------------------------------------------------

class ImageCache:
    """A [N, S, S] uint8 memmap of deterministically-preprocessed images.

    Keyed by sha256 of (image paths + preprocessing options) like the
    reference's datacache protocol (DownstreamDataModule.py:203-253). Built
    once; training epochs read straight out of the mmap into device batches.
    """

    def __init__(self, data: np.ndarray, paths: Sequence[str],
                 options_key: Optional[str] = None) -> None:
        self.data = data  # [N, S, S] uint8 (possibly a memmap)
        self.paths = list(paths)
        # preprocessing-config fingerprint, carried so downstream caches
        # (fold mean/std) can key on it; falls back to the image size
        self.options_key = options_key or f"size={data.shape[1]}"

    @property
    def image_size(self) -> int:
        return self.data.shape[1]

    def __len__(self) -> int:
        return self.data.shape[0]

    def gather(self, indices: Sequence[int]) -> np.ndarray:
        return self.data[np.asarray(indices, dtype=np.int64)]

    @classmethod
    def build(
        cls,
        paths: Sequence[str],
        cache_dir: str,
        image_size: int = 224,
        crop: bool = False,
        maximum_crop_ratio: float = 0.05,
        equalize: bool = True,
        num_workers: int = 0,
        use_native: bool = True,
    ) -> "ImageCache":
        os.makedirs(cache_dir, exist_ok=True)
        if use_native:
            from vlp_tpu.native import get_lib

            use_native = get_lib() is not None
        opts = (f"size={image_size}|crop={crop}"
                f"|ratio={maximum_crop_ratio}|eq={equalize}")
        key_parts = [opts, f"native={bool(use_native)}"] + list(paths)
        key = hash_list_of_strings(key_parts)
        npy = os.path.join(cache_dir, f"imgcache_{key}.npy")
        meta = os.path.join(cache_dir, f"imgcache_{key}.json")
        if os.path.exists(npy) and os.path.exists(meta):
            logger.info("ImageCache: hit %s (%d images)", npy, len(paths))
            data = np.load(npy, mmap_mode="r")
            return cls(data, paths, options_key=opts)
        logger.info("ImageCache: building %s (%d images)", npy, len(paths))
        n = len(paths)
        arr = np.lib.format.open_memmap(
            npy + ".tmp.npy", mode="w+", dtype=np.uint8,
            shape=(n, image_size, image_size))

        def _work(i_path):
            i, p = i_path
            return i, preprocess_image(
                p, image_size=image_size, crop=crop,
                maximum_crop_ratio=maximum_crop_ratio, equalize=equalize,
                use_native=use_native)

        if num_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(num_workers) as ex:
                for i, out in ex.map(_work, enumerate(paths)):
                    arr[i] = out
        else:
            for i, p in enumerate(paths):
                arr[i] = _work((i, p))[1]
        arr.flush()
        os.replace(npy + ".tmp.npy", npy)
        with open(meta, "w") as fh:
            json.dump({"num_images": n, "image_size": image_size,
                       "crop": crop, "equalize": equalize}, fh)
        return cls(np.load(npy, mmap_mode="r"), paths, options_key=opts)

    @classmethod
    def from_arrays(cls, images: np.ndarray, paths: Optional[Sequence[str]] = None
                    ) -> "ImageCache":
        """In-memory cache (synthetic fixtures / tests)."""
        images = np.asarray(images, dtype=np.uint8)
        if paths is None:
            paths = [f"synthetic://{i}" for i in range(len(images))]
        return cls(images, paths)


def fold_mean_std(
    cache: ImageCache,
    indices: Sequence[int],
    cache_dir: Optional[str] = None,
) -> Tuple[float, float]:
    """Scalar mean/std over ALL fold-train images on the raw 0..255 scale
    (reference DownstreamDataModule.py:203-253, cached to
    datacache/<sha256(paths)>.json). Computed exactly via streaming sums —
    no per-epoch MONAI pass needed."""
    idx = list(int(i) for i in indices)
    if cache_dir is not None:
        # key includes the preprocessing-options fingerprint: statistics
        # computed under one image_size/crop/equalize config must not be
        # reused for another (the paths alone do not identify the pixels)
        key = hash_list_of_strings(
            [cache.options_key] + [cache.paths[i] for i in idx])
        stat_path = os.path.join(cache_dir, f"{key}.json")
        if os.path.exists(stat_path):
            with open(stat_path) as fh:
                d = json.load(fh)
            return float(d["mean"]), float(d["std"])
    total = 0.0
    total_sq = 0.0
    count = 0
    for i in idx:
        x = cache.data[i].astype(np.float64)
        total += x.sum()
        total_sq += (x * x).sum()
        count += x.size
    mean = total / count
    var = max(total_sq / count - mean * mean, 0.0)
    std = float(np.sqrt(var))
    if cache_dir is not None:
        os.makedirs(cache_dir, exist_ok=True)
        with open(stat_path, "w") as fh:
            json.dump({"mean": mean, "std": std}, fh)
    return float(mean), std
