"""Real-world media interop: decode GENUINE files shipped with the host
OS (written by real encoders — libpng, libjpeg/PIL, matplotlib — not by
this repo's fixture builders) through the pure-Python codecs, and prove
the privacy strip is pixel-preserving on them. Complements the
spec-literal fixtures the same way the r7 real-world MP3 test does:
fixtures pin the math, these files pin interop with the wild.

Every test skips cleanly when the host file is absent (different image/
distro) — presence is environmental, the assertions are not.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
    parse_exif,
    strip_metadata,
    strip_png_metadata,
)
from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.multimodal import (
    average_hash,
    decode_image,
    perceptual_hash,
)

_PNG = "/usr/share/doc/python3-pip/html/topics/deps.png"
_PNG2 = "/usr/share/doc/nodejs/osx_installer_logo.png"
_JPG = "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/requests/ext/flower-of-life.jpg"
_JPG2 = "/usr/share/doc/nodejs/thin-white-stripe.jpg"

#: sha256 prefixes of the EXACT file generations the dimension pins
#: below were taken from — a package upgrade that regenerates a file
#: must SKIP (environmental change), not fail the suite
_KNOWN = {
    _PNG: "42ee50088b6a4872",
    _PNG2: "17e6289cb45a094d",
    _JPG: "1b155652b7a20734",
    _JPG2: "a584e74203bcf974",
}


def _need(path: str) -> bytes:
    if not os.path.exists(path):
        pytest.skip(f"host file absent: {path}")
    data = open(path, "rb").read()
    import hashlib

    digest = hashlib.sha256(data).hexdigest()[:16]
    if digest != _KNOWN[path]:
        pytest.skip(f"host file changed generation: {path} ({digest})")
    return data


def test_realworld_png_decodes_and_strip_is_pixel_exact():
    data = _need(_PNG)
    px, w, h = decode_image(data)
    assert (w, h) == (556, 376) and px.shape == (376, 556, 3)
    assert px.dtype == np.uint8
    # strip is byte-level: decoded pixels must be IDENTICAL afterwards
    stripped = strip_png_metadata(data)
    px2, w2, h2 = decode_image(stripped)
    assert (w2, h2) == (w, h) and np.array_equal(px, px2)
    # idempotent
    assert strip_png_metadata(stripped) == stripped


def test_realworld_png_second_encoder():
    data = _need(_PNG2)
    px, w, h = decode_image(data)
    assert (w, h) == (180, 361) and px.shape == (361, 180, 3)


def test_realworld_jpeg_decodes_and_hashes_survive_strip():
    data = _need(_JPG)
    px, w, h = decode_image(data)
    assert (w, h) == (161, 161) and px.shape == (161, 161, 3)
    stripped = strip_metadata(data)
    px2, _, _ = decode_image(stripped)
    # APPn/COM removal never touches scan data: pixels identical,
    # so both perceptual hashes are identical too
    assert np.array_equal(px, px2)
    assert average_hash(data) == average_hash(stripped)
    assert perceptual_hash(data) == perceptual_hash(stripped)
    # EXIF parse must terminate cleanly on a real file (has_exif either
    # way, no exception other than the declared ValueError contract)
    try:
        info = parse_exif(data)
        assert isinstance(info.get("has_exif"), bool)
    except ValueError:
        pass  # torn/odd APP1 structure is a declared outcome


def test_realworld_jpeg_second_encoder():
    data = _need(_JPG2)
    px, w, h = decode_image(data)
    assert (w, h) == (493, 58) and px.shape == (58, 493, 3)
    # a near-uniform white stripe: decoded pixels must actually be bright
    assert px.mean() > 200
