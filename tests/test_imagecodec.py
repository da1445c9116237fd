"""Real pure-Python BMP/PNG codecs (r3 VERDICT #7): spec-level roundtrips,
error paths, and the decoder= injection point exercised with allow_fake=False
— the stub guard's production example."""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_extractor_spark.operators.imagecodec import (
    _PNG_SIG,
    decode_bmp24,
    decode_png_rgb,
    encode_bmp24,
    encode_png_rgb,
    pixel_features,
    real_media_decoder,
    synth_media_real,
    synth_pixels,
)

dims = st.tuples(st.integers(1, 19), st.integers(1, 14))


@settings(max_examples=60, deadline=None)
@given(dims, st.randoms(use_true_random=False), st.booleans())
def test_bmp_roundtrip_exact(wh, rnd, top_down):
    w, h = wh
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    assert decode_bmp24(encode_bmp24(w, h, rgb, top_down=top_down)) == (w, h, rgb)


@settings(max_examples=60, deadline=None)
@given(dims, st.randoms(use_true_random=False), st.booleans())
def test_png_roundtrip_exact(wh, rnd, filter_per_row):
    w, h = wh
    rgb = bytes(rnd.randrange(256) for _ in range(w * h * 3))
    assert decode_png_rgb(encode_png_rgb(w, h, rgb, filter_per_row=filter_per_row)) == (
        w,
        h,
        rgb,
    )


def test_png_every_filter_type_exercised():
    # 7 rows with filter_per_row=True walks filters 0,1,2,3,4,0,1
    w, h = 9, 7
    rgb = synth_pixels(11, w, h)
    payload = encode_png_rgb(w, h, rgb, filter_per_row=True)
    raw = zlib.decompress(
        payload[8 + 25 + 8 : -(12 + 4)]  # IDAT data: skip sig+IHDR+len/type, drop IEND+crc
    )
    filters = [raw[y * (w * 3 + 1)] for y in range(h)]
    assert filters == [0, 1, 2, 3, 4, 0, 1]
    assert decode_png_rgb(payload) == (w, h, rgb)


def test_bmp_padding_and_both_row_orders():
    # widths 1..4 cover every stride-padding residue
    for w in (1, 2, 3, 4, 5):
        rgb = synth_pixels(w, w, 3)
        up = encode_bmp24(w, 3, rgb, top_down=False)
        dn = encode_bmp24(w, 3, rgb, top_down=True)
        assert up != dn
        assert decode_bmp24(up) == decode_bmp24(dn) == (w, 3, rgb)


def test_bmp_honors_pixel_offset_gap():
    # insert 16 gap bytes between headers and pixel array; decoder must
    # follow the file-header offset, not assume 54
    w, h = 5, 4
    rgb = synth_pixels(3, w, h)
    payload = bytearray(encode_bmp24(w, h, rgb))
    body = bytes(payload[54:])
    patched = payload[:54] + b"\xaa" * 16 + body
    patched[10:14] = struct.pack("<I", 54 + 16)
    patched[2:6] = struct.pack("<I", len(patched))
    assert decode_bmp24(bytes(patched)) == (w, h, rgb)


def test_png_crc_corruption_rejected():
    payload = bytearray(encode_png_rgb(6, 5, synth_pixels(2, 6, 5)))
    payload[len(payload) - 20] ^= 0x01  # inside IDAT data
    with pytest.raises(ValueError, match="CRC"):
        decode_png_rgb(bytes(payload))


def test_unsupported_variants_rejected():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp24(b"XX" + b"\x00" * 60)
    bmp = bytearray(encode_bmp24(4, 4, synth_pixels(1, 4, 4)))
    bmp[28] = 32  # bitcount -> 32bpp
    with pytest.raises(ValueError, match="unsupported BMP"):
        decode_bmp24(bytes(bmp))
    png = bytearray(encode_png_rgb(4, 4, synth_pixels(1, 4, 4)))
    # IHDR colortype byte (sig 8 + len 4 + type 4 + w 4 + h 4 + depth 1)
    png[8 + 8 + 9] = 6  # RGBA
    ihdr = bytes(png[8 + 4 : 8 + 8 + 13])
    png[8 + 8 + 13 : 8 + 8 + 17] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png_rgb(bytes(png))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp24(encode_bmp24(4, 4, synth_pixels(1, 4, 4))[:-8])
    with pytest.raises(ValueError, match="unsupported media magic"):
        real_media_decoder(b"GIF89a..........", "image")


def test_real_decoder_features_match_formula():
    for k in range(8):
        w, h = 8 + k % 9, 6 + k % 7
        rgb = synth_pixels(k, w, h)
        expected = pixel_features(w, h, rgb)
        enc = (
            encode_bmp24(w, h, rgb, top_down=(k // 2) % 2 == 1)
            if k % 2 == 0
            else encode_png_rgb(w, h, rgb)
        )
        assert real_media_decoder(enc, "image") == expected


def test_injection_point_spark_path(spark):
    """extract_media_features(decoder=real_media_decoder, allow_fake=False)
    over genuinely-encoded payloads: the NotImplementedError guard is
    bypassed by a REAL decoder, and values match the pixel formula."""
    from pdf_extractor_spark.operators.multimodal import extract_media_features

    feats = (
        extract_media_features(
            synth_media_real(spark, 14, partitions=3),
            decoder=real_media_decoder,
            allow_fake=False,
        )
        .orderBy("media_id")
        .collect()
    )
    assert len(feats) == 14
    for row in feats:
        k = row.media_id
        w, h = 8 + k % 9, 6 + k % 7
        assert row.features == pixel_features(w, h, synth_pixels(k, w, h))
        assert row.kind == "image"
