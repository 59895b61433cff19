"""Golden-image regression corpus (VERDICT r2 #6): six deterministic renders
spanning SPC raytrace, DefTet, rasterize, DIB-R soft mask, ortho
easy_render, and SG diffuse shading, compared against frozen PNGs in
tests/render/goldens/ (regenerate with `python tests/render/golden_corpus.py`
and review the diff when a change is intentional)."""

import os

import numpy as np
import pytest

from kaolin_tpu.utils.testing import assert_images_close

from tests.render.golden_corpus import GOLDEN_DIR, RENDERS


def _load(name):
    from PIL import Image
    arr = np.asarray(Image.open(os.path.join(GOLDEN_DIR, f"{name}.png")),
                     dtype=np.float32) / 255.0
    return arr


@pytest.mark.parametrize("name", sorted(RENDERS))
def test_golden(name):
    img = np.clip(RENDERS[name](), 0.0, 1.0)
    if img.shape[-1] == 1:
        img = img[..., 0]
    elif img.shape[-1] == 2:
        img = np.concatenate([img, np.zeros_like(img[..., :1])], -1)
    gold = _load(name)
    assert img.shape == gold.shape, (img.shape, gold.shape)
    assert_images_close(gold, img, pixel_disagreement_threshold=0.1,
                        max_percent_disagreeing_pixels=1.0)
