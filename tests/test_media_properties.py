"""Property-based tests for the round-7 media/metadata operators:
archive roundtrips under arbitrary member lists and all three formats,
EXIF and ID3 tag build->parse->strip roundtrips under randomized field
values, and MP3 spectral roundtrips under random quantized spectra —
each against the plain construction, no Spark needed (the Spark
plumbing is covered by the operator and oracle tests)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

SETTINGS = dict(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)

_name = st.text(
    alphabet=st.sampled_from("abcdefghijklmnopqrstuvwxyz0123456789_-"),
    min_size=1,
    max_size=12,
)
_members = st.lists(
    st.tuples(_name, st.binary(min_size=0, max_size=200)),
    min_size=0,
    max_size=6,
    unique_by=lambda m: m[0],
)


@settings(**SETTINGS)
@given(_members, st.sampled_from(["zip", "tar", "tgz"]))
def test_archive_member_roundtrip(members, fmt):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.archives import (
        build_tar,
        build_zip,
        iter_archive_members,
        sniff_archive_format,
    )

    if fmt == "zip":
        payload = build_zip(members)
    else:
        payload = build_tar(members, gz=(fmt == "tgz"))
    assert sniff_archive_format(payload) == fmt
    assert list(iter_archive_members(payload)) == members


_ascii = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=24,
)


@settings(**SETTINGS)
@given(
    _ascii,
    st.integers(1, 8),
    st.tuples(st.integers(0, 89), st.integers(0, 59), st.integers(0, 59)),
    st.sampled_from(["II", "MM"]),
)
def test_exif_roundtrip_and_strip(make, orientation, gps, bo):
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.exif import (
        build_exif_app1,
        insert_app1,
        parse_exif,
        strip_metadata,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.jpeg import (
        encode_jpeg,
    )

    jpeg = encode_jpeg(np.full((8, 8, 3), 128, dtype=np.uint8))
    app1 = build_exif_app1(
        {"make": make, "orientation": orientation}, gps_dms=gps, byte_order=bo
    )
    tagged = insert_app1(jpeg, app1)
    info = parse_exif(tagged)
    assert info["byte_order"] == bo
    assert info.get("make", "") == make.rstrip("\x00")
    assert info["orientation"] == orientation
    assert info["gps_lat"] == [(gps[0], 1), (gps[1], 1), (gps[2], 1)]
    assert strip_metadata(tagged) == jpeg


_latin = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0xFF),
    min_size=0,
    max_size=24,
).map(lambda s: s.rstrip("\x00"))


@settings(**SETTINGS)
@given(_latin, _latin, st.sampled_from([3, 4]))
def test_id3_roundtrip_and_strip(title, artist, ver):
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.id3 import (
        build_id3v2,
        parse_id3,
        strip_id3,
    )
    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp3 import (
        build_mp3_frame_l3,
    )

    audio = build_mp3_frame_l3([[1, 1] + [0] * 574, [0] * 576])
    tagged = build_id3v2({"title": title, "artist": artist}, version=ver) + audio
    info = parse_id3(tagged)
    assert info["id3_version"] == f"2.{ver}"
    assert info.get("title", "") == title
    assert info.get("artist", "") == artist
    assert strip_id3(tagged) == audio


@settings(**SETTINGS)
@given(
    st.lists(st.integers(-7, 7), min_size=0, max_size=40),
    st.lists(st.integers(-1, 1), min_size=0, max_size=24),
    st.integers(200, 230),
)
def test_mp3_spectral_roundtrip(gr0, gr1, gg):
    import numpy as np

    from aws_saas_factory_multi_tenant_data_pipeline_spark.operators.mp3 import (
        build_mp3_frame_l3,
        decode_mp3_spectra,
    )

    frame = build_mp3_frame_l3(
        [gr0 + [0] * (576 - len(gr0)), gr1 + [0] * (576 - len(gr1))],
        global_gain=gg,
    )
    spectra = decode_mp3_spectra(frame)
    assert len(spectra) == 2
    for (_fi, gi, _c, xr), ix in zip(spectra, [gr0, gr1]):
        exp = np.zeros(576)
        exp[: len(ix)] = (
            np.sign(ix)
            * np.abs(np.asarray(ix, float)) ** (4.0 / 3.0)
            * 2.0 ** ((gg - 210) / 4.0)
        )
        assert np.allclose(xr, exp, rtol=0, atol=1e-10), gi
