"""Multimodal header decode (stdlib-only): container sniffing + metadata
parse for png/gif/bmp/jpeg/wav, and the media_decode E2E actor-pool stage."""

import struct

import pytest

from lucene_plugin_ray.pipelines.training import (
    _bmp_payload,
    _wav_payload,
    decode_media_header,
)


def test_png():
    payload = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00"
    )
    assert decode_media_header(payload) == {"kind": "png", "width": 640, "height": 480}


def test_gif():
    payload = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert decode_media_header(payload) == {"kind": "gif", "width": 320, "height": 200}


def test_jpeg_sof():
    # SOI + APP0 (minimal) + SOF0 with dims 100x50
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 50, 100) + b"\x03"
    payload = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert decode_media_header(payload) == {"kind": "jpeg", "width": 100, "height": 50}


def test_bmp_wav_roundtrip():
    for d in (0, 1, 63, 64, 65, 1000, 4095):
        bmp = decode_media_header(_bmp_payload(d))
        assert bmp["kind"] == "bmp"
        assert bmp["width"] == 1 + d % 64
        assert bmp["height"] == 1 + (d // 64) % 64
        wav = decode_media_header(_wav_payload(d))
        assert wav["kind"] == "wav"
        assert wav["sample_rate"] == 8000 + (d % 8) * 1000
        assert wav["data_bytes"] == 2 * (1 + d % 100)
        assert wav["channels"] == 1


def test_unknown_container_rejected():
    with pytest.raises(ValueError):
        decode_media_header(b"\x00\x01\x02\x03garbage")


def test_media_decode_pipeline(ray_session):
    from lucene_plugin_ray.pipelines import training

    out = training.media_decode("/root/testdata/sf0.001")
    assert out.num_rows == 500
    rows = out.to_pylist()
    for r in rows[:50]:
        d = r["doc_id"]
        if d % 2 == 0:
            assert r["kind"] == "bmp" and r["width"] == 1 + d % 64
            assert r["sample_rate"] is None
        else:
            assert r["kind"] == "wav" and r["sample_rate"] == 8000 + (d % 8) * 1000
            assert r["width"] is None


def test_hex_encode_column_edges():
    """Vectorized hex encode: nulls, empties, slices, chunked and large
    binary all round-trip against bytes.hex()."""
    import pyarrow as pa

    from lucene_plugin_ray.functions.hashing import hex_encode_column

    a = pa.array([b"\x00\xff\x10", b"", None, b"abc"], type=pa.binary())
    assert hex_encode_column(a).to_pylist() == ["00ff10", "", None, "616263"]
    assert hex_encode_column(a.slice(1, 3)).to_pylist() == ["", None, "616263"]
    ca = pa.chunked_array([a, pa.array([b"\xde\xad"], type=pa.binary())])
    assert hex_encode_column(ca).to_pylist() == [
        "00ff10", "", None, "616263", "dead",
    ]
    assert hex_encode_column(pa.array([], type=pa.binary())).to_pylist() == []
    lb = pa.array([b"\x01", b"\x02\x03"], type=pa.large_binary())
    assert hex_encode_column(lb).to_pylist() == ["01", "0203"]
    import os

    blobs = [os.urandom(i % 37) for i in range(200)]
    assert hex_encode_column(pa.array(blobs, type=pa.binary())).to_pylist() == [
        b.hex() for b in blobs
    ]


def test_hex_encode_column_large_offsets(monkeypatch):
    """When the hex output would overflow int32 offsets the function must
    emit large_string (int64 offsets), not corrupt strings (ADVICE r2).
    Exercised by shrinking the threshold — same code path, tiny data."""
    import pyarrow as pa

    from lucene_plugin_ray.functions import hashing

    monkeypatch.setattr(hashing, "_HEX_SMALL_MAX", 8)
    a = pa.array([b"\x00\xff\x10", b"", None, b"abcd"], type=pa.binary())
    out = hashing.hex_encode_column(a)
    assert pa.types.is_large_string(out.type)
    assert out.to_pylist() == ["00ff10", "", None, "61626364"]
