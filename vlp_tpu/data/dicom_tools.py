"""Offline DICOM tooling: DICOM->PNG conversion + x-ray modality filter.

Reference scripts/dicom_to_png.py:22-58 (dicom2jpg+cv2 batch conversion with
warning/failure accounting) and src/helper_scripts/filter_out_x_rays.py:9-53
(keep only Modality=='CR' studies). pydicom is not baked into this image, so
both entry points gate on importability and degrade with a clear message —
the conversion math itself (windowing -> uint8) is implemented here and unit
-tested against synthetic pixel arrays so the pipeline logic is verified
without DICOM files.
"""
from __future__ import annotations

import os
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from vlp_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def window_to_uint8(pixels: np.ndarray,
                    window_center: Optional[float] = None,
                    window_width: Optional[float] = None,
                    photometric: str = "MONOCHROME2") -> np.ndarray:
    """DICOM windowing -> uint8 grayscale.

    With no window given, min/max scaling is used (dicom2jpg's default
    behavior for projection radiographs). MONOCHROME1 inverts.
    """
    x = np.asarray(pixels, np.float64)
    if window_center is not None and window_width is not None and window_width > 0:
        lo = window_center - window_width / 2.0
        hi = window_center + window_width / 2.0
    else:
        lo, hi = float(x.min()), float(x.max())
    if hi <= lo:
        out = np.zeros_like(x)
    else:
        out = (np.clip(x, lo, hi) - lo) / (hi - lo) * 255.0
    if photometric == "MONOCHROME1":
        out = 255.0 - out
    return np.rint(out).astype(np.uint8)


def convert_dicom_dir(input_dir: str, output_dir: str) -> Dict[str, int]:
    """Convert every readable DICOM under input_dir to PNG; returns
    {'converted': n, 'failed': m} accounting like the reference."""
    try:
        import pydicom
    except ImportError as e:
        raise RuntimeError(
            "pydicom is not installed in this image; DICOM conversion is "
            "gated (reference uses dicom2jpg+pydicom offline)") from e
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    stats = {"converted": 0, "failed": 0}
    for root, _, files in os.walk(input_dir):
        for fname in files:
            path = os.path.join(root, fname)
            try:
                ds = pydicom.dcmread(path)
                wc = getattr(ds, "WindowCenter", None)
                ww = getattr(ds, "WindowWidth", None)
                if isinstance(wc, pydicom.multival.MultiValue):
                    wc, ww = float(wc[0]), float(ww[0])
                img = window_to_uint8(
                    ds.pixel_array,
                    float(wc) if wc is not None else None,
                    float(ww) if ww is not None else None,
                    str(getattr(ds, "PhotometricInterpretation",
                                "MONOCHROME2")))
                rel = os.path.relpath(path, input_dir)
                out = os.path.join(output_dir,
                                   os.path.splitext(rel)[0] + ".png")
                os.makedirs(os.path.dirname(out), exist_ok=True)
                cv2.imwrite(out, img)
                stats["converted"] += 1
            except Exception as e:
                logger.warning("failed to convert %s: %s", path, e)
                stats["failed"] += 1
    logger.info("DICOM conversion: %s", stats)
    return stats


def filter_xray_modality(input_dir: str, keep_modalities: Tuple[str, ...] = ("CR",)
                         ) -> Iterable[str]:
    """Yield paths whose DICOM Modality is in keep_modalities (reference
    filter keeps Modality=='CR' conventional radiographs)."""
    try:
        import pydicom
    except ImportError as e:
        raise RuntimeError("pydicom is not installed in this image") from e
    for root, _, files in os.walk(input_dir):
        for fname in files:
            path = os.path.join(root, fname)
            try:
                ds = pydicom.dcmread(path, stop_before_pixels=True)
                if str(getattr(ds, "Modality", "")) in keep_modalities:
                    yield path
            except Exception:
                continue


def main(argv=None) -> int:
    import argparse
    import sys

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])
    convert_dicom_dir(args.input_dir, args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
