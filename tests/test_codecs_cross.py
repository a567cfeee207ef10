"""Cross-codec consistency: the same pixels through every LOSSLESS
image container must decode identically through the one dispatcher —
a drift guard across six independent from-scratch codecs."""
from __future__ import annotations

import numpy as np

from nidaba_ray.stages.multimodal import decode_image


def _encoders(px: np.ndarray) -> dict[str, bytes]:
    from nidaba_ray.algorithms.gif import encode_gif
    from nidaba_ray.algorithms.png import encode_bmp, encode_png
    from nidaba_ray.algorithms.tiff import encode_tiff
    from nidaba_ray.algorithms.webp import encode_webp

    rgb = np.stack([px] * 3, axis=2)  # BMP encode is RGB-only
    return {
        "png": encode_png(px),
        "png_paeth": encode_png(px, filter_type=4),
        "bmp": encode_bmp(rgb),
        "tiff_packbits": encode_tiff(px, compression="packbits"),
        "tiff_lzw": encode_tiff(px, compression="lzw", predictor=2),
        "tiff_deflate": encode_tiff(px, compression="deflate"),
        "gif": encode_gif(px),
        "webp": encode_webp(px, use_palette=False),
        "webp_palette": encode_webp(px),
        "webp_pred": encode_webp(px, use_palette=False, predictor_mode=11),
    }


def test_all_lossless_codecs_agree_grayscale():
    rng = np.random.default_rng(66)
    for shape in ((24, 31), (8, 8), (17, 40)):
        px = rng.integers(0, 256, size=shape).astype(np.uint8)
        decoded = {name: decode_image(data)
                   for name, data in _encoders(px).items()}
        for name, out in decoded.items():
            assert out.shape == px.shape, name
            assert np.array_equal(out, px), name


def test_all_lossless_codecs_agree_structured():
    # gradients + runs: exercises predictors, RLE and LZW paths with
    # compressible structure rather than noise
    px = (np.add.outer(np.arange(30), np.arange(45)) % 256).astype(np.uint8)
    for name, data in _encoders(px).items():
        assert np.array_equal(decode_image(data), px), name
